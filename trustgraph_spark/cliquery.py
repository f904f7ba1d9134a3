"""Graph-query CLI kernel — term parsing and display formatting for the
``tg-query-graph`` front door (trustgraph-cli/cli/query_graph.py).

Pure-Python mirrors (exact semantics, CLI-arg side):
- ``parse_inline_quoted_triple`` (:31-88) — Turtle-style ``<<s p o>>``
  with quote-aware whitespace splitting.
- ``build_term`` (:91-146) — auto-detection (``<<…>>`` triple,
  ``<…>`` angle-wrapped IRI, http/https/urn IRI, else literal) plus
  explicit type/datatype/language.
- ``build_quoted_triple_term`` (:149-183).
- ``format_term`` (:186-251) — short/long wire forms, ``"v"@lang`` /
  ``"v"^^dt`` literals, ``<<s p o>>`` quoted triples including the
  backend quirk of a stringified triple inside an IRI slot.
- ``format_triples`` — the space/pipe/json/jsonl output builders
  (:254-284), returned as strings.

Spark-native side (the display path a 100 TB store actually needs):
``format_term_col`` lowers format_term to one CASE expression over the
flat (value, otype, dtype, lang) columns — RDF-star objects decode
their one-level quoted-triple JSON with from_json, literals take the
``@lang``-before-``^^dt`` precedence — and ``cli_query_graph`` wires
CLI-style term strings through build_term into the Q1 pattern dispatch
(operators/triples_query.match_triples) and formats the result, so the
whole CLI round-trip is a pushdown-filtered scan plus a codegen'd
projection."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trustgraph_spark.operators.provenance import (
    QT_SCHEMA as _QT_SCHEMA,  # the one shared RDF-star wire schema
)


def parse_inline_quoted_triple(value: str) -> dict:
    """Parse ``<<subject predicate object>>`` (query_graph.py:31-88)."""
    inner = value[2:-2].strip()
    parts: list[str] = []
    current = ""
    in_quotes = False
    quote_char = None
    for char in inner:
        if char in ('"', "'") and not in_quotes:
            in_quotes = True
            quote_char = char
            current += char
        elif char == quote_char and in_quotes:
            in_quotes = False
            quote_char = None
            current += char
        elif char.isspace() and not in_quotes:
            if current:
                parts.append(current)
                current = ""
        else:
            current += char
    if current:
        parts.append(current)
    if len(parts) != 3:
        raise ValueError(
            "Quoted triple must have exactly 3 parts (s p o), "
            f"got {len(parts)}: {parts}")
    s_val, p_val, o_val = parts
    return {"t": "t", "tr": {"s": build_term(s_val),
                             "p": build_term(p_val),
                             "o": build_term(o_val)}}


def build_term(value, term_type=None, datatype=None, language=None):
    """Wire-format Term from CLI input (query_graph.py:91-146)."""
    if value is None:
        return None
    if term_type is None:
        if value.startswith("<<") and value.endswith(">>"):
            term_type = "triple"
        elif value.startswith("<") and value.endswith(">") \
                and not value.startswith("<<"):
            value = value[1:-1]
            term_type = "iri"
        elif value.startswith(("http://", "https://", "urn:")):
            term_type = "iri"
        else:
            term_type = "literal"
    if term_type == "iri":
        if value.startswith("<") and value.endswith(">"):
            value = value[1:-1]
        return {"t": "i", "i": value}
    if term_type == "literal":
        result = {"t": "l", "v": value}
        if datatype:
            result["dt"] = datatype
        if language:
            result["ln"] = language
        return result
    if term_type == "triple":
        if value.startswith("<<") and value.endswith(">>"):
            return parse_inline_quoted_triple(value)
        return {"t": "t", "tr": json.loads(value)}
    raise ValueError(f"Unknown term type: {term_type}")


def build_quoted_triple_term(qt_subject, qt_subject_type, qt_predicate,
                             qt_object, qt_object_type,
                             qt_object_datatype, qt_object_language):
    """--qt-* argument assembly (query_graph.py:149-183)."""
    if not any([qt_subject, qt_predicate, qt_object]):
        return None
    return {"t": "t", "tr": {
        "s": build_term(qt_subject, term_type=qt_subject_type),
        "p": build_term(qt_predicate, term_type="iri"),
        "o": build_term(qt_object, term_type=qt_object_type,
                        datatype=qt_object_datatype,
                        language=qt_object_language),
    }}


def format_term(term_dict) -> str:
    """Display form of a wire term (query_graph.py:186-251): IRIs bare,
    literals quoted with ``@lang`` (datatype only when no language),
    quoted triples as ``<<s p o>>``; tolerates short/long key forms,
    raw s/p/o dicts, and the stringified-triple-in-IRI backend quirk."""
    if not term_dict:
        return ""
    t = term_dict.get("t") or term_dict.get("type")
    if t == "i":
        iri_value = term_dict.get("i") or term_dict.get("iri", "")
        if iri_value.startswith('{"s":'):
            try:
                parsed = json.loads(iri_value)
                if "s" in parsed and "p" in parsed and "o" in parsed:
                    return (f"<<{format_term(parsed.get('s', {}))} "
                            f"{format_term(parsed.get('p', {}))} "
                            f"{format_term(parsed.get('o', {}))}>>")
            except json.JSONDecodeError:
                pass
        return iri_value
    if t == "l":
        value = term_dict.get("v") or term_dict.get("value", "")
        result = f'"{value}"'
        lang = term_dict.get("ln") or term_dict.get("language")
        if lang:
            return result + f"@{lang}"
        dt = term_dict.get("dt") or term_dict.get("datatype")
        if dt:
            return result + f"^^{dt}"
        return result
    if t == "t":
        tr = term_dict.get("tr") or term_dict.get("triple", {})
        return (f"<<{format_term(tr.get('s', {}))} "
                f"{format_term(tr.get('p', {}))} "
                f"{format_term(tr.get('o', {}))}>>")
    if t is None and "s" in term_dict and "p" in term_dict \
            and "o" in term_dict:
        return (f"<<{format_term(term_dict.get('s', {}))} "
                f"{format_term(term_dict.get('p', {}))} "
                f"{format_term(term_dict.get('o', {}))}>>")
    return str(term_dict)


def format_triples(triples: list[dict], output_format: str = "space",
                   headers: bool = False) -> str:
    """The four output writers (query_graph.py:254-284), as one
    returned string instead of prints."""
    if output_format == "json":
        return json.dumps(triples, indent=2)
    if output_format == "jsonl":
        return "\n".join(json.dumps(t) for t in triples)
    sep = "|" if output_format == "pipe" else " "
    lines = []
    if headers:
        lines.append(sep.join(("subject", "predicate", "object")))
    for triple in triples:
        lines.append(sep.join((
            format_term(triple.get("s", {})),
            format_term(triple.get("p", {})),
            format_term(triple.get("o", {})))))
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Native display path
# ---------------------------------------------------------------------------

def _fmt_inner(term):
    return F.when(term.getField("type") == "i",
                  F.coalesce(term.getField("iri"), F.lit(""))) \
        .otherwise(F.concat(F.lit('"'),
                            F.coalesce(term.getField("value"), F.lit("")),
                            F.lit('"')))


def format_term_col(value, otype, dtype=None, lang=None):
    """format_term over the flat store columns as ONE CASE expression:
    IRIs bare; literals quoted with the reference's language-beats-
    datatype precedence; RDF-star objects (otype 't', the byte-exact
    JSON form) decoded with from_json and rendered ``<<s p o>>``
    (stores hold one quoting level, so no recursion is needed)."""
    dtype = F.lit("") if dtype is None else dtype
    lang = F.lit("") if lang is None else lang
    qt = F.from_json(value, _QT_SCHEMA)
    return (
        F.when(otype == "u", value)
        .when(otype == "t", F.concat(
            F.lit("<<"), _fmt_inner(qt.getField("s")), F.lit(" "),
            _fmt_inner(qt.getField("p")), F.lit(" "),
            _fmt_inner(qt.getField("o")), F.lit(">>")))
        .otherwise(F.concat(
            F.lit('"'), value, F.lit('"'),
            F.when(lang != "", F.concat(F.lit("@"), lang))
            .when(dtype != "", F.concat(F.lit("^^"), dtype))
            .otherwise("")))
    )


def cli_query_graph(
    edges: DataFrame,
    s: str | None = None,
    p: str | None = None,
    o: str | None = None,
    g: str | None = None,
    limit: int | None = None,
    output_format: str = "space",
) -> DataFrame:
    """The tg-query-graph round trip (query_graph.py:287-337) on the
    store: CLI-style term strings parse through build_term (so
    ``<http://x>`` angle forms and bare literals behave exactly as the
    CLI), the extracted values feed the Q1 pattern dispatch —
    pushdown-filtered scan — and the result renders with the native
    term formatter into a ``line`` column (space or pipe separated).
    Quoted-triple patterns route through the explain-module containment
    join instead (see edge_source_provenance); the CLI's JSON formats
    are driver-side (format_triples)."""
    from .operators.triples_query import match_triples

    def val(x):
        t = build_term(x)
        if t is None:
            return None
        if t["t"] == "t":
            raise ValueError(
                "quoted-triple patterns match via "
                "explain.edge_source_provenance")
        return t.get("i") or t.get("v")

    out = match_triples(edges, s=val(s), p=val(p), o=val(o), g=val(g),
                        limit=limit)
    sep = "|" if output_format == "pipe" else " "
    s_fmt = format_term_col(F.col("s"), F.lit("u"))
    p_fmt = format_term_col(F.col("p"), F.lit("u"))
    o_fmt = format_term_col(F.col("o"), F.col("otype"),
                            F.col("dtype"), F.col("lang"))
    return out.select(
        s_fmt.alias("s_fmt"), p_fmt.alias("p_fmt"), o_fmt.alias("o_fmt"),
        F.concat_ws(sep, s_fmt, p_fmt, o_fmt).alias("line"),
    )


class StreamingWordWrapper:
    """Incremental word-wrap for streamed agent tokens — the
    tg-invoke-agent Outputter (cli/invoke_agent.py:32-102) with the
    print stream replaced by an accumulated buffer, byte-for-byte
    including its quirks: the word buffer flushes on whitespace with a
    width check that counts word+space, a wrap suppresses the NEXT
    literal newline (just_wrapped), tabs behave as spaces, and close()
    flushes the tail word and terminates a non-empty line. Feed it the
    arbitrary chunk boundaries of a token stream — output is invariant
    to chunking (pytest property). Driver-side display shaping by
    design, like every renderer here."""

    def __init__(self, width: int = 75, prefix: str = "> "):
        self.width = width
        self.prefix = prefix
        self._out: list[str] = [prefix]
        self.column = len(prefix)
        self.word_buffer = ""
        self.just_wrapped = False
        self._closed = False

    def output(self, text: str) -> None:
        for char in text:
            if char in (" ", "\t"):
                if self.word_buffer:
                    if self.column + len(self.word_buffer) + 1 > self.width:
                        self._out.append("\n" + self.prefix)
                        self.column = len(self.prefix)
                        self.just_wrapped = True
                    self._out.append(self.word_buffer)
                    self.column += len(self.word_buffer)
                    self.word_buffer = ""
                self._out.append(char)
                self.column += 1
                self.just_wrapped = False
            elif char == "\n":
                if self.just_wrapped:
                    self.just_wrapped = False
                else:
                    if self.word_buffer:
                        self._out.append(self.word_buffer)
                        self.word_buffer = ""
                    self._out.append("\n" + self.prefix)
                    self.column = len(self.prefix)
                    self.just_wrapped = False
            else:
                self.word_buffer += char
                self.just_wrapped = False

    def close(self) -> str:
        if not self._closed:
            self._closed = True
            if self.word_buffer:
                self._out.append(self.word_buffer)
                self.column += len(self.word_buffer)
                self.word_buffer = ""
            if self.column > 0:
                self._out.append("\n")
                self.column = 0
        return "".join(self._out)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.close()
