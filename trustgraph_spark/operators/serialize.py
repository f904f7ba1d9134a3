"""N-Quads / N-Triples serialization of the triple store (reference:
trustgraph-cli/trustgraph/cli/nquads.py:1-137 — hand-rolled term encoding
to the N-Triples grammar because rdflib's n3() emits Turtle-style forms
invalid in line-oriented N-Quads; graph_to_turtle.py term mapping).

Spark-first: encoding is pure column expressions — the ECHAR escape chain,
the IRIREF forbidden-character scan, language/datatype tagging — so an
export of 10^12 triples is a narrow projection writing text partitions;
nothing ever holds a graph in memory (the property the reference's
line-streaming exporter is built around). RDF-star quoted triples have no
standard N-Quads encoding and are skipped with an observable flag, as the
reference skips-and-counts.

The parser is the inverse grammar as regexp extraction plus a
sentinel-free unescape: the literal is split on escaped-backslash pairs,
short escapes are restored inside each segment, and the segments rejoin
with single backslashes — exact for every input (hypothesis-verified
roundtrip in test_serialize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import OTYPE_LITERAL, OTYPE_URI

# IRIREF production forbidden characters (nquads.py:33-37): controls,
# space, <>"{}|^` and backslash
_BAD_IRI_RE = r'[\x00-\x20<>"{}|^`\\]'


def _escape_literal(col):
    # ECHAR escapes, backslash first (nquads.py:22-28)
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return c


def _iri_ok(col):
    return col.isNotNull() & (col != "") & ~col.rlike(_BAD_IRI_RE)


def _encode_object(o, otype, dtype, lang):
    lit = F.concat(F.lit('"'), _escape_literal(o), F.lit('"'))
    lit = F.when(
        lang.isNotNull() & (lang != ""),
        F.concat(lit, F.lit("@"), lang),
    ).when(
        dtype.isNotNull() & (dtype != ""),
        F.concat(lit, F.lit("^^<"), dtype, F.lit(">")),
    ).otherwise(lit)
    return F.when(otype == OTYPE_URI, F.concat(F.lit("<"), o, F.lit(">"))) \
        .when(otype == OTYPE_LITERAL, lit)


def triples_to_nquads(
    triples: DataFrame, graph_iri: str | None = None
) -> DataFrame:
    """(s,p,o,otype,dtype,lang[,g]) -> (line, encodable) rows.

    ``line`` is the N-Quads line (no trailing newline; the writer adds
    it) or NULL when the triple cannot be represented; ``encodable``
    makes the skip observable so callers can surface the count
    (nquads.py:96-119 written/skipped contract). The graph term comes
    from ``graph_iri`` when given, else the row's ``g`` column; an empty
    graph emits a plain N-Triples line. Subjects/predicates must be
    IRIs; literals are object-only; RDF-star rows are skipped."""
    s, p, o = F.col("s"), F.col("p"), F.col("o")
    otype = F.col("otype")
    dtype = F.col("dtype") if "dtype" in triples.columns else F.lit("")
    lang = F.col("lang") if "lang" in triples.columns else F.lit("")

    if graph_iri is not None:
        g = F.lit(graph_iri)
    elif "g" in triples.columns:
        g = F.coalesce(F.col("g"), F.lit(""))
    else:
        g = F.lit("")

    obj = _encode_object(o, otype, dtype, lang)
    obj_ok = F.when(otype == OTYPE_URI, _iri_ok(o)) \
        .when(otype == OTYPE_LITERAL, F.lit(True)).otherwise(F.lit(False))
    dt_ok = F.when(
        (otype == OTYPE_LITERAL) & dtype.isNotNull() & (dtype != "")
        & (lang.isNull() | (lang == "")),
        _iri_ok(dtype),
    ).otherwise(F.lit(True))
    g_ok = (g == "") | _iri_ok(g)
    ok = _iri_ok(s) & _iri_ok(p) & obj_ok & dt_ok & g_ok

    line = F.concat(
        F.lit("<"), s, F.lit("> <"), p, F.lit("> "), obj,
        F.when(g != "", F.concat(F.lit(" <"), g, F.lit(">")))
        .otherwise(F.lit("")),
        F.lit(" ."),
    )
    return triples.select(
        F.when(ok, line).alias("line"), ok.alias("encodable")
    )


# line grammar: <s> <p> (<o> | "lit"(@lang | ^^<dt>)?) (<g>)? .
_NQ_IRI_OBJ = r'^<([^>]*)> <([^>]*)> <([^>]*)>(?: <([^>]*)>)? \.$'
_NQ_LIT_OBJ = (r'^<([^>]*)> <([^>]*)> '
               r'"((?:[^"\\]|\\.)*)"'
               r'(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?'
               r'(?: <([^>]*)>)? \.$')


def _unescape_literal(col):
    # order-safe inverse of _escape_literal with NO sentinel character
    # (a sentinel can collide with raw data — any codepoint except
    # 0x22 0x5C 0x0A 0x0D may appear unescaped in the grammar): split
    # on escaped-backslash pairs, restore the short escapes inside each
    # segment (no segment can contain a backslash pair), rejoin with
    # single backslashes
    def _short(x):
        x = F.regexp_replace(x, r"\\n", "\n")
        x = F.regexp_replace(x, r"\\r", "\r")
        x = F.regexp_replace(x, r"\\t", "\t")
        return F.regexp_replace(x, '\\\\"', '"')

    # -1 keeps trailing empty segments so a literal ending in an escaped
    # backslash round-trips
    segs = F.split(col, r"\\\\", -1)
    return F.array_join(F.transform(segs, _short), "\\")


def parse_nquads(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """N-Quads lines -> (g, s, p, o, otype, dtype, lang) rows; lines that
    match neither object production are dropped (the resilient-read
    analog of the reference's skip counting). Pure regexp extraction."""
    c = F.trim(F.col(line_col))
    iri = [F.regexp_extract(c, _NQ_IRI_OBJ, i) for i in range(1, 5)]
    lit = [F.regexp_extract(c, _NQ_LIT_OBJ, i) for i in range(1, 7)]
    is_iri = c.rlike(_NQ_IRI_OBJ)
    is_lit = ~is_iri & c.rlike(_NQ_LIT_OBJ)
    return lines.select(
        F.when(is_iri, iri[3]).when(is_lit, lit[5]).alias("g"),
        F.when(is_iri, iri[0]).when(is_lit, lit[0]).alias("s"),
        F.when(is_iri, iri[1]).when(is_lit, lit[1]).alias("p"),
        F.when(is_iri, iri[2]).when(is_lit, _unescape_literal(lit[2]))
        .alias("o"),
        F.when(is_iri, F.lit(OTYPE_URI)).when(is_lit, F.lit(OTYPE_LITERAL))
        .alias("otype"),
        F.when(is_lit, lit[4]).otherwise(
            F.when(is_iri, F.lit(""))).alias("dtype"),
        F.when(is_lit, lit[3]).otherwise(
            F.when(is_iri, F.lit(""))).alias("lang"),
    ).where(F.col("otype").isNotNull())


# ---------------------------------------------------------------------------
# Turtle export with RDF-star (graph_to_turtle.py:21-120)
# ---------------------------------------------------------------------------
#
# The reference dumps the store through rdflib's Turtle serializer with
# RDF-star quoted-triple support and skips malformed IRIs. rdflib's exact
# byte layout is not the contract (it depends on its serializer version);
# this writer defines a DETERMINISTIC single-line-block Turtle dialect —
# sorted @prefix header, one `s p1 o1 ; p2 o2 .` block per subject with
# sorted predicate-object pairs, longest-prefix qname compression, and
# `<< s p o >>` for RDF-star rows (which N-Quads must skip) — all as
# native columns plus ONE subject-keyed aggregation (the same scale shape
# as the quads-by-entity store).

_STAR_SCHEMA = (
    "struct<s:struct<type:string,iri:string,value:string>,"
    "p:struct<type:string,iri:string,value:string>,"
    "o:struct<type:string,iri:string,value:string>>"
)

_PN_LOCAL = r"^[A-Za-z_][A-Za-z0-9_-]*$"


def _qname(col, prefixes: dict):
    """Longest-namespace-first qname compression; falls back to <iri>."""
    expr = F.concat(F.lit("<"), col, F.lit(">"))
    for k, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        local = F.substring(col, len(ns) + 1, 2 ** 24)
        cond = col.startswith(ns) & local.rlike(_PN_LOCAL)
        expr = F.when(cond, F.concat(F.lit(k + ":"), local)).otherwise(expr)
    return expr


def _ttl_literal(val, dtype, lang, prefixes):
    lit = F.concat(F.lit('"'), _escape_literal(val), F.lit('"'))
    return F.when(
        lang.isNotNull() & (lang != ""), F.concat(lit, F.lit("@"), lang)
    ).when(
        dtype.isNotNull() & (dtype != ""),
        F.concat(lit, F.lit("^^"), _qname(dtype, prefixes)),
    ).otherwise(lit)


def triples_to_turtle(
    triples: DataFrame, prefixes: dict[str, str]
) -> DataFrame:
    """(s,p,o,otype,dtype,lang) -> Turtle lines: sorted ``@prefix`` rows
    followed by one single-line block per subject. RDF-star rows (otype
    't', the provenance JSON term encoding) render as ``<< s p o >>``
    objects; rows whose IRIs the grammar cannot carry are skipped, as the
    reference's term mapper skips them (graph_to_turtle.py:28-31)."""
    s, p, o = F.col("s"), F.col("p"), F.col("o")
    otype = F.col("otype")
    dtype = F.col("dtype") if "dtype" in triples.columns else F.lit("")
    lang = F.col("lang") if "lang" in triples.columns else F.lit("")

    star = F.from_json(o, _STAR_SCHEMA)
    star_ok = (
        _iri_ok(star["s"]["iri"]) & _iri_ok(star["p"]["iri"])
        & (
            ((star["o"]["type"] == "i") & _iri_ok(star["o"]["iri"]))
            | (star["o"]["type"] == "l")
        )
    )
    star_obj = F.when(star["o"]["type"] == "i",
                      _qname(star["o"]["iri"], prefixes)).otherwise(
        F.concat(F.lit('"'), _escape_literal(star["o"]["value"]), F.lit('"')))
    star_term = F.concat(
        F.lit("<< "), _qname(star["s"]["iri"], prefixes), F.lit(" "),
        _qname(star["p"]["iri"], prefixes), F.lit(" "), star_obj,
        F.lit(" >>"),
    )

    obj = (
        F.when(otype == OTYPE_URI, _qname(o, prefixes))
        .when(otype == OTYPE_LITERAL, _ttl_literal(o, dtype, lang, prefixes))
        .when(otype == "t", star_term)
    )
    obj_ok = (
        F.when(otype == OTYPE_URI, _iri_ok(o))
        .when(otype == OTYPE_LITERAL, F.lit(True))
        .when(otype == "t", star.isNotNull() & star_ok)
        .otherwise(F.lit(False))
    )
    dt_ok = F.when(
        (otype == OTYPE_LITERAL) & dtype.isNotNull() & (dtype != "")
        & (lang.isNull() | (lang == "")),
        _iri_ok(dtype),
    ).otherwise(F.lit(True))
    ok = _iri_ok(s) & _iri_ok(p) & obj_ok & dt_ok

    po = F.concat(_qname(p, prefixes), F.lit(" "), obj)
    blocks = (
        triples.where(ok)
        .groupBy(s.alias("_s"))
        .agg(F.sort_array(F.collect_list(po)).alias("_pos"))
        .select(
            F.concat(
                _qname(F.col("_s"), prefixes), F.lit(" "),
                F.array_join(F.col("_pos"), " ; "), F.lit(" ."),
            ).alias("line")
        )
    )
    spark = triples.sparkSession
    header = spark.createDataFrame(
        [(f"@prefix {k}: <{ns}> .",) for k, ns in sorted(prefixes.items())],
        "line string",
    )
    return header.unionByName(blocks)
