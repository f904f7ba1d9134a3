"""Turtle import — the parse half of the reference's Turtle interop
(trustgraph-cli/trustgraph/cli/load_turtle.py:40-76 and
load_knowledge.py:37-76 parse Turtle files with rdflib and stream the
triples / entity-contexts in; graph_to_turtle.py is the export twin this
repo already has in serialize.triples_to_turtle).

A hand-written tokenizer + recursive-descent parser covering the
practical W3C Turtle grammar: @prefix/@base and SPARQL-style
PREFIX/BASE directives, ``a``, predicate (``;``) and object (``,``)
lists, short and long (triple-quoted) strings with ECHAR + \\uXXXX /
\\UXXXXXXXX escapes, ``@lang`` and ``^^`` datatypes, numeric
(xsd:integer / xsd:decimal / xsd:double) and boolean shorthand
literals, labeled and anonymous blank nodes, ``[ ... ]`` property
lists, ``( ... )`` RDF collections (expanded to rdf:first/rest/nil),
comments, and RDF-star ``<< s p o >>`` quoted triples in the object
position (mapped to this repo's provenance JSON dialect — the inverse
of serialize.triples_to_turtle's ``<< >>`` rendering).  Quoted triples
in the subject position and nested quoted triples have no column
representation and are skipped (the export side's skip philosophy).

Spark-first shape: one document = one independent parse inside a
``mapInPandas`` seam — the sanctioned ingest-time class (a Turtle body
is an opaque blob only a real tokenizer can split; the reference runs
rdflib per file the same way).  A 100 TB corpus of Turtle documents
parses embarrassingly parallel with no shuffle; everything downstream
(entity contexts, joins into the quad store) stays native columns.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import OTYPE_LITERAL, OTYPE_TRIPLE, OTYPE_URI

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

PARSED_SCHEMA = ("doc_id long, s string, p string, o string, "
                 "otype string, dtype string, lang string")


class TurtleError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<LONG_STR>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"
      |'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<STR>"(?:[^"\\\n\r]|\\.)*"|'(?:[^'\\\n\r]|\\.)*')
  | (?P<IRI><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<QT_OPEN><<)
  | (?P<QT_CLOSE>>>)
  | (?P<BLANK>_:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)
  | (?P<DIRECTIVE>@prefix\b|@base\b)
  | (?P<LANG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<DOUBLE>[+-]?(?:[0-9]+\.[0-9]*|\.?[0-9]+)[eE][+-]?[0-9]+)
  | (?P<DECIMAL>[+-]?[0-9]*\.[0-9]+)
  | (?P<INTEGER>[+-]?[0-9]+)
  | (?P<DTYPE>\^\^)
  | (?P<PUNCT>[.;,\[\]()])
  | (?P<PNAME>(?:[A-Za-z][A-Za-z0-9_.-]*)?:
      (?:[A-Za-z0-9_%](?:(?:[A-Za-z0-9_.%~-]|\\[_~.!$&'()*+,;=/?\#@%-])*
         (?:[A-Za-z0-9_%~-]|\\[_~.!$&'()*+,;=/?\#@%-]))?)?)
  | (?P<KEYWORD>\b(?:a|true|false|PREFIX|BASE|prefix|base)\b)
""", re.VERBOSE)

_ECHAR = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
          '"': '"', "'": "'", "\\": "\\"}


def _unescape(body: str) -> str:
    out = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        e = body[i + 1]
        if e in _ECHAR:
            out.append(_ECHAR[e])
            i += 2
        elif e == "u":
            out.append(chr(int(body[i + 2:i + 6], 16)))
            i += 6
        elif e == "U":
            out.append(chr(int(body[i + 2:i + 10], 16)))
            i += 10
        else:
            raise TurtleError(f"bad escape \\{e}")
    return "".join(out)


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens = []
    pos, n = 0, len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if m is None or m.end() == pos:
            raise TurtleError(f"cannot tokenize at offset {pos}: "
                              f"{text[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "WS":
            tokens.append((kind, m.group()))
    return tokens


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_IRI_TERM = "u"


class _Parser:
    """Terms are (value, otype, dtype, lang) tuples; otype 'u' covers
    IRIs and ``_:`` blank nodes, 'l' literals, 't' the RDF-star JSON."""

    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.triples: list[tuple] = []
        self.skipped = 0
        self._genid = 0

    # -- token plumbing --

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        tok = self._peek()
        self.i += 1
        return tok

    def _expect(self, kind: str, value: str | None = None):
        k, v = self._next()
        if k != kind or (value is not None and v != value):
            raise TurtleError(f"expected {value or kind}, got {v!r}")
        return v

    # -- term builders --

    def _fresh_blank(self) -> tuple:
        self._genid += 1
        return (f"_:genid{self._genid}", _IRI_TERM, "", "")

    def _resolve_iri(self, raw: str) -> str:
        iri = _unescape(raw[1:-1])
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return self.base + iri
        return iri

    def _resolve_pname(self, raw: str) -> str:
        pfx, _, local = raw.partition(":")
        if pfx not in self.prefixes:
            raise TurtleError(f"undefined prefix {pfx!r}:")
        return self.prefixes[pfx] + re.sub(r"\\(.)", r"\1", local)

    # -- grammar --

    def parse(self) -> None:
        while self._peek()[0] is not None:
            k, v = self._peek()
            if k == "DIRECTIVE" or (k == "KEYWORD"
                                    and v in ("PREFIX", "BASE",
                                              "prefix", "base")):
                self._directive()
            else:
                self._statement()

    def _directive(self) -> None:
        k, v = self._next()
        word = v.lstrip("@").lower()
        if word == "prefix":
            pname = self._expect("PNAME")
            iri = self._expect("IRI")
            self.prefixes[pname[:-1]] = self._resolve_iri(iri)
        else:
            self.base = self._resolve_iri(self._expect("IRI"))
        if v in ("@prefix", "@base"):
            self._expect("PUNCT", ".")
        # SPARQL-style PREFIX/BASE take no dot

    def _statement(self) -> None:
        was_bnpl = self._peek() == ("PUNCT", "[")
        subject = self._term(position="subject")
        # a bare blankNodePropertyList statement `[ p o ] .` is legal
        if not (was_bnpl and self._peek() == ("PUNCT", ".")):
            self._predicate_object_list(subject)
        self._expect("PUNCT", ".")

    def _predicate_object_list(self, subject: tuple) -> None:
        while True:
            predicate = self._term(position="predicate")
            while True:
                obj = self._term(position="object")
                self._emit(subject, predicate, obj)
                if self._peek() == ("PUNCT", ","):
                    self._next()
                    continue
                break
            if self._peek() == ("PUNCT", ";"):
                self._next()
                # trailing ; before . or ] is legal
                if self._peek()[0] in ("PUNCT", None) and \
                        self._peek()[1] in (".", "]", None):
                    return
                continue
            return

    def _emit(self, s: tuple, p: tuple, o: tuple) -> None:
        # quoted triples have a column representation only as objects
        if s[1] == OTYPE_TRIPLE or p[1] == OTYPE_TRIPLE:
            self.skipped += 1
            return
        self.triples.append((s[0], p[0], o[0], o[1], o[2], o[3]))

    def _term(self, position: str) -> tuple:
        k, v = self._next()
        if k == "KEYWORD" and v == "a":
            return (RDF_NS + "type", _IRI_TERM, "", "")
        if position == "predicate":
            if k == "IRI":
                return (self._resolve_iri(v), _IRI_TERM, "", "")
            if k == "PNAME":
                return (self._resolve_pname(v), _IRI_TERM, "", "")
            raise TurtleError(f"bad predicate token {v!r}")
        if k == "IRI":
            return (self._resolve_iri(v), _IRI_TERM, "", "")
        if k == "PNAME":
            return (self._resolve_pname(v), _IRI_TERM, "", "")
        if k == "BLANK":
            return (v, _IRI_TERM, "", "")
        if k in ("STR", "LONG_STR"):
            return self._literal_tail(v, long=(k == "LONG_STR"))
        if k == "INTEGER":
            return (v, OTYPE_LITERAL, XSD_NS + "integer", "")
        if k == "DECIMAL":
            return (v, OTYPE_LITERAL, XSD_NS + "decimal", "")
        if k == "DOUBLE":
            return (v, OTYPE_LITERAL, XSD_NS + "double", "")
        if k == "KEYWORD" and v in ("true", "false"):
            return (v, OTYPE_LITERAL, XSD_NS + "boolean", "")
        if k == "PUNCT" and v == "[":
            node = self._fresh_blank()
            if self._peek() != ("PUNCT", "]"):
                self._predicate_object_list(node)
            self._expect("PUNCT", "]")
            return node
        if k == "PUNCT" and v == "(":
            return self._collection()
        if k == "QT_OPEN":
            return self._quoted_triple()
        raise TurtleError(f"unexpected token {v!r} in {position}")

    def _literal_tail(self, raw: str, long: bool) -> tuple:
        body = raw[3:-3] if long else raw[1:-1]
        value = _unescape(body)
        k, v = self._peek()
        if k == "LANG":
            self._next()
            return (value, OTYPE_LITERAL, "", v[1:])
        if k == "DTYPE":
            self._next()
            dk, dv = self._next()
            if dk == "IRI":
                dt = self._resolve_iri(dv)
            elif dk == "PNAME":
                dt = self._resolve_pname(dv)
            else:
                raise TurtleError(f"bad datatype token {dv!r}")
            return (value, OTYPE_LITERAL, dt, "")
        return (value, OTYPE_LITERAL, "", "")

    def _collection(self) -> tuple:
        items = []
        while self._peek() != ("PUNCT", ")"):
            if self._peek()[0] is None:
                raise TurtleError("unterminated collection")
            items.append(self._term(position="object"))
        self._next()
        if not items:
            return (RDF_NS + "nil", _IRI_TERM, "", "")
        head = self._fresh_blank()
        node = head
        for idx, item in enumerate(items):
            self._emit(node, (RDF_NS + "first", _IRI_TERM, "", ""), item)
            nxt = (self._fresh_blank() if idx + 1 < len(items)
                   else (RDF_NS + "nil", _IRI_TERM, "", ""))
            self._emit(node, (RDF_NS + "rest", _IRI_TERM, "", ""), nxt)
            node = nxt
        return head

    def _quoted_triple(self) -> tuple:
        s = self._term(position="subject")
        p = self._term(position="predicate")
        o = self._term(position="object")
        self._expect("QT_CLOSE")
        if o[1] == OTYPE_TRIPLE:
            # nested quoted triple: one level only in the JSON dialect
            self.skipped += 1
            return self._fresh_blank()

        def leg(term: tuple) -> dict:
            if term[1] == _IRI_TERM:
                return {"type": "i", "iri": term[0]}
            out = {"type": "l", "value": term[0]}
            if term[2]:
                out["datatype"] = term[2]
            if term[3]:
                out["language"] = term[3]
            return out

        star = {"s": leg(s), "p": leg(p), "o": leg(o)}
        return (json.dumps(star, separators=(",", ":")),
                OTYPE_TRIPLE, "", "")


def parse_turtle_py(text: str) -> tuple[list[tuple], int]:
    """One Turtle document -> ([(s, p, o, otype, dtype, lang)], skipped)."""
    parser = _Parser(_tokenize(text))
    parser.parse()
    return parser.triples, parser.skipped


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def parse_turtle(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strict: bool = False,
) -> DataFrame:
    """Documents of Turtle text -> (doc_id, s, p, o, otype, dtype, lang)
    rows.  ``strict=False`` drops unparseable documents (the corpus-scale
    analog of the reference's per-file failure); ``strict=True`` raises
    with the document id.  Blank-node labels are document-scoped, as an
    rdflib per-file parse scopes them."""

    def gen(it: Iterator) -> Iterator:
        import pandas as pd
        cols = ["doc_id", "s", "p", "o", "otype", "dtype", "lang"]
        for pdf in it:
            rows = []
            for did, raw in zip(pdf[id_col], pdf[text_col]):
                try:
                    triples, _ = parse_turtle_py(raw or "")
                except TurtleError as e:
                    if strict:
                        raise TurtleError(f"doc {did}: {e}") from e
                    continue
                rows.extend((int(did),) + t for t in triples)
            yield (pd.DataFrame(rows, columns=cols) if rows
                   else pd.DataFrame(columns=cols))

    return documents.select(id_col, text_col).mapInPandas(gen, PARSED_SCHEMA)


def turtle_entity_contexts(parsed: DataFrame) -> DataFrame:
    """load_knowledge.py:63-76 semantics: every (subject, object) pair
    whose object is NOT an IRI becomes an (entity, context) row — which
    in rdflib terms admits literals AND blank nodes (the reference's
    ``isinstance(o, URIRef)`` guard passes BNodes through; kept)."""
    return parsed.where(
        (F.col("otype") == OTYPE_LITERAL)
        | ((F.col("otype") == OTYPE_URI) & F.col("s").isNotNull()
           & F.col("o").startswith("_:"))
    ).select(
        F.col("s").alias("entity"),
        F.col("o").alias("context"),
    )
