"""SPARQL-algebra operators as DataFrame combinators (A1-A16, SURVEY.md §2.5).

The reference evaluates rdflib's SPARQL 1.1 algebra tree with per-pattern
triple-store RPCs and in-memory joins (query/sparql/algebra.py:37-759).
Here the same algebra is a library of DataFrame combinators over the edges
table: a solution set is a DataFrame with one TERM STRUCT column per
variable (value, otype, dtype, lang), and every algebra node maps to a
native Spark operator — one Catalyst plan instead of per-pattern round
trips, with join reordering / predicate pushdown / broadcast decided by the
optimizer (the reference's hand-rolled selectivity ordering and bind-join,
algebra.py:91-96/:158-203, fall out for free — SURVEY.md §4).

No SPARQL string parser (rdflib is not in this image): queries are built
programmatically with Var/patterns, which is the idiomatic Spark surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import DEFAULT_GRAPH, OTYPE_URI


@dataclass(frozen=True)
class Var:
    name: str


def _const_term(value: str, otype: str = OTYPE_URI) -> Column:
    return F.struct(
        F.lit(value).alias("value"),
        F.lit(otype).alias("otype"),
        F.lit("").alias("dtype"),
        F.lit("").alias("lang"),
    )


def _term_from(value_col, otype_col, dtype_col, lang_col) -> Column:
    return F.struct(
        value_col.alias("value"),
        otype_col.alias("otype"),
        dtype_col.alias("dtype"),
        lang_col.alias("lang"),
    )


def scan_pattern(
    edges: DataFrame,
    s,
    p,
    o,
    g: str | None = DEFAULT_GRAPH,
    collection: str | None = None,
) -> DataFrame:
    """One triple pattern -> solution DataFrame with a term-struct column
    per Var. Constants become pushed-down equality filters on the scan;
    a repeated Var within the pattern becomes an equality filter."""
    df = edges
    if collection is not None:
        df = df.where(F.col("collection") == collection)
    if isinstance(g, Var):
        # GRAPH ?g ranges over NAMED graphs only (SPARQL 1.1 §13.3); the
        # graph name binds like any other variable below
        df = df.where(F.col("g") != "")
    elif g is not None:
        df = df.where(F.col("g") == g)

    uri_term = lambda c: _term_from(F.col(c), F.lit(OTYPE_URI), F.lit(""), F.lit(""))
    o_term = _term_from(F.col("o"), F.col("otype"), F.col("dtype"), F.col("lang"))

    out_cols: dict[str, Column] = {}
    for pos, val, term in (
        ("g", g if isinstance(g, Var) else None, uri_term("g")),
        ("s", s, uri_term("s")),
        ("p", p, uri_term("p")),
        ("o", o, o_term),
    ):
        if isinstance(val, Var):
            if val.name in out_cols:
                # repeated variable: equality across positions
                df = df.where(term == out_cols[val.name])
            else:
                out_cols[val.name] = term
        elif val is not None:
            df = df.where(F.col(pos) == val)
    return df.select([c.alias(n) for n, c in out_cols.items()])


def bgp(
    edges: DataFrame,
    patterns: list[tuple],
    g: str | None = DEFAULT_GRAPH,
    collection: str | None = None,
) -> DataFrame:
    """A1 Basic Graph Pattern: natural join of pattern scans on shared
    variables. Catalyst's CBO/AQE reorders the joins (the reference orders
    by bound-position count manually, algebra.py:91-96)."""
    sols = [scan_pattern(edges, *pat, g=g, collection=collection) for pat in patterns]
    return reduce(join, sols)


# --- property paths ---------------------------------------------------------
# SPARQL 1.1 path operators: link, ^inverse, /sequence, |alternative and
# the closures * + ?.  BEYOND the reference — its evaluator has no path
# handlers (query/sparql/algebra.py dispatches no Path* nodes) — but a
# natural fit here: closures are the same iterate-to-fixpoint DataFrame
# pattern as connected_components (semi-naive frontier expansion with
# localCheckpoint per round), so rdfs:subClassOf* costs O(diameter)
# broadcast-frontier joins, never a full closure materialization up front.


def _path_scan_base(
    edges: DataFrame, g: str | None, collection: str | None
) -> DataFrame:
    """Edge frame for path evaluation, tagged with the active-graph key
    ``_pg``: a CONSTANT '' for a fixed graph (single active graph after
    the filter), or the edge's own graph for GRAPH ?g — every downstream
    join/closure keys on ``_pg`` too, so a variable-graph path never
    chains edges across graphs (the closure effectively runs per named
    graph in one job)."""
    df = edges
    if collection is not None:
        df = df.where(F.col("collection") == collection)
    if isinstance(g, Var):
        df = df.where(F.col("g") != "")  # named graphs only (§13.3)
        tag = F.col("g")
    elif g is not None:
        df = df.where(F.col("g") == g)
        tag = F.lit("")
    else:
        tag = F.lit("")
    return df.select(
        tag.alias("_pg"), "s", "p", "o", "otype", "dtype", "lang"
    )


def _identity_pairs(df: DataFrame) -> DataFrame:
    """Zero-length path endpoints: every term occurring in the active
    graph paired with itself, PER graph key (the standard engine
    approximation of the spec's all-RDF-terms zero-length match)."""
    s_term = _term_from(F.col("s"), F.lit(OTYPE_URI), F.lit(""), F.lit(""))
    o_term = _term_from(F.col("o"), F.col("otype"), F.col("dtype"), F.col("lang"))
    terms = (
        df.select("_pg", s_term.alias("t"))
        .union(df.select("_pg", o_term.alias("t")))
        .distinct()
    )
    return terms.select("_pg", F.col("t").alias("_ps"), F.col("t").alias("_po"))


def _path_closure(pairs: DataFrame) -> DataFrame:
    """Transitive closure by semi-naive iteration: each round extends only
    the previous round's NEW pairs against the base relation and
    anti-joins the accumulated set, so work per round is proportional to
    the frontier, with localCheckpoint truncating lineage (the CC loop's
    discipline).  Rounds = path diameter."""
    base = pairs.distinct().localCheckpoint()
    # renamed copy for the extension join (avoids self-join ambiguity);
    # the graph key participates so closures never cross graphs
    right = base.select(
        "_pg", F.col("_ps").alias("_mid"), F.col("_po").alias("_po2")
    )
    acc = base
    delta = base
    while True:
        delta = (
            delta.select("_pg", "_ps", F.col("_po").alias("_mid"))
            .join(right, ["_pg", "_mid"])
            .select("_pg", "_ps", F.col("_po2").alias("_po"))
            .distinct()
            .join(acc, ["_pg", "_ps", "_po"], "left_anti")
            .localCheckpoint()
        )
        if delta.isEmpty():
            return acc
        acc = acc.union(delta).localCheckpoint()


def path_pairs(
    edges: DataFrame,
    path,
    g: str | None = DEFAULT_GRAPH,
    collection: str | None = None,
) -> DataFrame:
    """Evaluate a path expression to its endpoint-pair solution set
    (_pg graph key, _ps, _po term structs).  Path AST: ('link', iri)
    ('inv', p) ('seq', [ps]) ('alt', [ps]) ('plus', p) ('star', p)
    ('opt', p) ('nps', fwd, inv).  seq keeps multiplicities (join), alt
    keeps them (union); the closure forms are DISTINCT per the SPARQL
    spec."""
    df = _path_scan_base(edges, g, collection)
    return _path_pairs(df, path)


def _path_pairs(df: DataFrame, path) -> DataFrame:
    kind = path[0]
    if kind == "link":
        sel = df.where(F.col("p") == path[1])
        s_term = _term_from(F.col("s"), F.lit(OTYPE_URI), F.lit(""), F.lit(""))
        o_term = _term_from(
            F.col("o"), F.col("otype"), F.col("dtype"), F.col("lang")
        )
        return sel.select("_pg", s_term.alias("_ps"), o_term.alias("_po"))
    if kind == "inv":
        inner = _path_pairs(df, path[1])
        return inner.select(
            "_pg", F.col("_po").alias("_ps"), F.col("_ps").alias("_po")
        )
    if kind == "seq":
        acc = _path_pairs(df, path[1][0])
        for sub in path[1][1:]:
            nxt = _path_pairs(df, sub)
            acc = (
                acc.alias("a")
                .join(
                    nxt.alias("b"),
                    (F.col("a._pg") == F.col("b._pg"))
                    & (F.col("a._po") == F.col("b._ps")),
                )
                .select(
                    F.col("a._pg").alias("_pg"),
                    F.col("a._ps").alias("_ps"),
                    F.col("b._po").alias("_po"),
                )
            )
        return acc
    if kind == "alt":
        return reduce(
            lambda a, b: a.union(b), [_path_pairs(df, s) for s in path[1]]
        )
    if kind == "plus":
        return _path_closure(_path_pairs(df, path[1]))
    if kind == "star":
        return (
            _path_closure(_path_pairs(df, path[1]))
            .union(_identity_pairs(df))
            .distinct()
        )
    if kind == "opt":
        return _path_pairs(df, path[1]).union(_identity_pairs(df)).distinct()
    if kind == "nps":
        # negated property set (grammar [89]): forward edges whose
        # predicate is outside the forward set, union reversed edges
        # whose predicate is outside the inverse set (SPARQL 1.1 §9.1)
        fwd_iris, inv_iris = path[1], path[2]
        s_term = _term_from(F.col("s"), F.lit(OTYPE_URI), F.lit(""), F.lit(""))
        o_term = _term_from(
            F.col("o"), F.col("otype"), F.col("dtype"), F.col("lang")
        )
        parts = []
        if fwd_iris or not inv_iris:
            sel = df.where(~F.col("p").isin(fwd_iris)) if fwd_iris else df
            parts.append(
                sel.select("_pg", s_term.alias("_ps"), o_term.alias("_po"))
            )
        if inv_iris:
            sel = df.where(~F.col("p").isin(inv_iris))
            parts.append(
                sel.select("_pg", o_term.alias("_ps"), s_term.alias("_po"))
            )
        return reduce(lambda a, b: a.union(b), parts)
    raise ValueError(f"unknown path node {kind!r}")


def scan_path(
    edges: DataFrame,
    s,
    path,
    o,
    g: str | None = DEFAULT_GRAPH,
    collection: str | None = None,
) -> DataFrame:
    """One path triple pattern -> solution DataFrame, the scan_pattern
    analog: Var endpoints project term-struct columns, constants filter on
    the term value, a repeated Var forces endpoint equality."""
    df = path_pairs(edges, path, g=g, collection=collection)
    out_cols: dict[str, Column] = {}
    if isinstance(g, Var):
        out_cols[g.name] = _term_from(
            F.col("_pg"), F.lit(OTYPE_URI), F.lit(""), F.lit("")
        )
    for col, val in (("_ps", s), ("_po", o)):
        if isinstance(val, Var):
            if val.name in out_cols:
                df = df.where(F.col(col) == out_cols[val.name])
            else:
                out_cols[val.name] = F.col(col)
        elif val is not None:
            df = df.where(F.col(col)["value"] == val)
    return df.select([c.alias(n) for n, c in out_cols.items()])


def _shared(l: DataFrame, r: DataFrame) -> list[str]:
    return [c for c in l.columns if c in set(r.columns)]


def join(l: DataFrame, r: DataFrame) -> DataFrame:
    """A2 Join: natural inner join on shared variables (hash join; Spark
    broadcasts the small side — the reference's bind-join optimization)."""
    on = _shared(l, r)
    return l.join(r, on, "inner") if on else l.crossJoin(r)


def left_join(l: DataFrame, r: DataFrame, condition: Column | None = None) -> DataFrame:
    """A3 LeftJoin (OPTIONAL), with optional filter expression."""
    on = _shared(l, r)
    if condition is not None:
        rr = r.where(condition)
    else:
        rr = r
    return l.join(rr, on, "left") if on else l.crossJoin(rr)


def minus(l: DataFrame, r: DataFrame) -> DataFrame:
    """A4 Minus: anti-join on compatible bindings."""
    on = _shared(l, r)
    if not on:
        return l
    return l.join(r, on, "left_anti")


def union(l: DataFrame, r: DataFrame) -> DataFrame:
    """A5 Union (bindings with disjoint vars null-padded)."""
    return l.unionByName(r, allowMissingColumns=True)


def filter_(sol: DataFrame, condition: Column) -> DataFrame:
    """A6 Filter."""
    return sol.where(condition)


def exists(sol: DataFrame, other: DataFrame, negate: bool = False) -> DataFrame:
    """A6 EXISTS / NOT EXISTS as semi/anti join (reference pre-evaluates and
    caches per solution, algebra.py:397-432)."""
    on = _shared(sol, other)
    how = "left_anti" if negate else "left_semi"
    return sol.join(other, on, how) if on else (sol.limit(0) if negate else sol)


def distinct(sol: DataFrame) -> DataFrame:
    """A7 Distinct (Reduced aliases to Distinct in the reference)."""
    return sol.dropDuplicates()


def order_by(sol: DataFrame, *keys) -> DataFrame:
    """A8 OrderBy: keys are (var, 'asc'|'desc') or var names."""
    cols = []
    for k in keys:
        if isinstance(k, tuple):
            v, d = k
            c = F.col(f"{v}.value")
            cols.append(c.desc() if d == "desc" else c.asc())
        else:
            cols.append(F.col(f"{k}.value").asc())
    return sol.orderBy(*cols)


def slice_(sol: DataFrame, limit: int | None = None, offset: int = 0) -> DataFrame:
    """A9 Slice (LIMIT/OFFSET)."""
    out = sol.offset(offset) if offset else sol
    return out.limit(limit) if limit is not None else out


def project(sol: DataFrame, vars: list[str]) -> DataFrame:
    """A10 Project."""
    return sol.select(*vars)


def extend(
    sol: DataFrame,
    var: str,
    expr: Column,
    otype: str = "l",
    dtype: Column | str = "",
    lang: Column | str = "",
) -> DataFrame:
    """A10 Extend (BIND): computed column coerced to a term struct. otype
    'l' for computed literals (default); 'u' for IRI/URI constructor
    results; dtype/lang for STRDT/STRLANG semantics."""
    d = F.lit(dtype) if isinstance(dtype, str) else dtype
    g = F.lit(lang) if isinstance(lang, str) else lang
    return sol.withColumn(
        var,
        _term_from(expr.cast("string"), F.lit(otype), d, g),
    )


def values(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """A13 VALUES: inline solution rows {var: (value, otype)} or {var: value}."""
    vars = sorted({v for row in rows for v in row})
    data = []
    for row in rows:
        rec = []
        for v in vars:
            cell = row.get(v)
            if cell is None:
                rec.append(None)
            elif isinstance(cell, tuple):
                rec.append({"value": cell[0], "otype": cell[1], "dtype": "", "lang": ""})
            else:
                rec.append({"value": cell, "otype": "u", "dtype": "", "lang": ""})
        data.append(rec)
    schema = ", ".join(
        f"{v} struct<value:string,otype:string,dtype:string,lang:string>" for v in vars
    )
    return spark.createDataFrame(data, schema)


# --- A11/A12: Group + aggregates -------------------------------------------

AGGREGATES = {"count", "count_distinct", "sum", "avg", "min", "max",
              "group_concat", "sample"}


def group_agg(
    sol: DataFrame,
    group_vars: list[str],
    aggs: dict[str, tuple],
) -> DataFrame:
    """A11 Group + A12 aggregates. aggs: out_name -> (fn, var[, separator]).
    Numeric aggregates cast the term value to double (SPARQL numeric
    semantics); outputs are plain columns. Hash aggregation with map-side
    partial combine — the reference materializes groups in driver memory
    (algebra.py:480-525)."""
    exprs = []
    for out, spec in aggs.items():
        fn, var = spec[0], spec[1]
        v = F.col(f"{var}.value") if var != "*" else None
        if fn == "count":
            e = F.count("*") if var == "*" else F.count(v)
        elif fn == "count_distinct":
            e = F.countDistinct(v)
        elif fn == "sum":
            e = F.sum(v.cast("double"))
        elif fn == "avg":
            e = F.avg(v.cast("double"))
        elif fn == "min":
            e = F.min(v)
        elif fn == "max":
            e = F.max(v)
        elif fn == "group_concat":
            sep = spec[2] if len(spec) > 2 else " "
            e = F.concat_ws(sep, F.collect_list(v))
        elif fn == "sample":
            e = F.first(v)
        else:
            raise ValueError(f"unknown aggregate {fn}")
        exprs.append(e.alias(out))
    if group_vars:
        return sol.groupBy(*group_vars).agg(*exprs)
    return sol.agg(*exprs)


# --- A15: scalar builtins ----------------------------------------------------


def v(var: str) -> Column:
    """Term value accessor for expressions."""
    return F.col(f"{var}.value")


BUILTINS: dict = {}


def _builtin(name):
    def reg(fn):
        BUILTINS[name] = fn
        return fn

    return reg


@_builtin("BOUND")
def bound(var: str) -> Column:
    return F.col(var).isNotNull()


@_builtin("isIRI")
def is_iri(var: str) -> Column:
    return F.col(f"{var}.otype") == "u"


@_builtin("isLITERAL")
def is_literal(var: str) -> Column:
    return F.col(f"{var}.otype") == "l"


@_builtin("STR")
def str_(var: str) -> Column:
    return v(var)


@_builtin("LANG")
def lang(var: str) -> Column:
    return F.col(f"{var}.lang")


@_builtin("DATATYPE")
def datatype(var: str) -> Column:
    return F.col(f"{var}.dtype")


@_builtin("sameTerm")
def same_term(a: str, b: str) -> Column:
    return F.col(a) == F.col(b)


@_builtin("isBLANK")
def is_blank(var: str) -> Column:
    # blank nodes carry otype 'b' (this engine mints none, so this is
    # normally constant-false — matches the reference's isBlank check)
    return F.col(f"{var}.otype") == "b"


@_builtin("isNUMERIC")
def is_numeric(var: str) -> Column:
    # SPARQL isNumeric: literal whose value parses as a number.
    # try_cast keeps ANSI mode happy (cast of 'abc' would throw).
    return (F.col(f"{var}.otype") == "l") & v(var).try_cast("double").isNotNull()


def _as_col(x) -> Column:
    return F.lit(x) if isinstance(x, str) else x


def _strbefore(c: Column, s) -> Column:
    """SPARQL STRBEFORE: substring before the FIRST occurrence; '' when the
    needle is absent (expressions.py STRBEFORE semantics — substring_index
    wrongly returns the whole string on absence)."""
    s = _as_col(s)
    pos = F.position(s, c)
    return F.when(pos > 0, c.substr(F.lit(1), pos - 1)).otherwise(F.lit(""))


def _strafter(c: Column, s) -> Column:
    """SPARQL STRAFTER: substring after the FIRST occurrence; '' when absent;
    STRAFTER(x, '') = x."""
    s = _as_col(s)
    pos = F.position(s, c)
    return F.when(pos > 0, c.substr(pos + F.length(s), F.length(c))).otherwise(
        F.lit("")
    )


def _langmatches(lang_col: Column, rng) -> Column:
    """RFC 4647 basic filtering: '*' matches any non-empty tag; otherwise
    case-insensitive exact tag or prefix-followed-by-'-' match.  The '*'
    wildcard is handled in column space so it also works when the range
    arrives as a compiled Column from the SPARQL front-end (not just a
    Python str)."""
    if isinstance(rng, str) and rng == "*":
        return lang_col != ""
    r = F.lower(_as_col(rng))
    low = F.lower(lang_col)
    basic = (low == r) | low.startswith(F.concat(r, F.lit("-")))
    return F.when(r == "*", lang_col != "").otherwise(basic)


# direct 1:1 mappings to pyspark.sql.functions (reference dispatch table
# expressions.py:257-560); string-arg builtins take a term value Column
SCALAR_MAP = {
    "REGEX": lambda c, pat: c.rlike(pat),
    "STRLEN": F.length,
    "UCASE": F.upper,
    "LCASE": F.lower,
    "CONTAINS": lambda c, s: c.contains(s),
    "STRSTARTS": lambda c, s: c.startswith(s),
    "STRENDS": lambda c, s: c.endswith(s),
    "CONCAT": F.concat,
    "COALESCE": F.coalesce,
    "IF": lambda cond, a, b: F.when(cond, a).otherwise(b),
    "IN": lambda c, vals: c.isin(*vals),
    "NOT IN": lambda c, vals: ~c.isin(*vals),
    "LANGMATCHES": _langmatches,
    "YEAR": F.year,
    "MONTH": F.month,
    "DAY": F.day,
    "HOURS": F.hour,
    "MINUTES": F.minute,
    "SECONDS": F.second,
    "NOW": F.current_timestamp,
    "TZ": lambda c: F.regexp_extract(c, r"(Z|[+-]\d{2}:\d{2})$", 1),
    "FLOOR": F.floor,
    "CEIL": F.ceil,
    "ABS": F.abs,
    "ROUND": F.round,
    "STRBEFORE": _strbefore,
    "STRAFTER": _strafter,
    "REPLACE": F.regexp_replace,
    "SUBSTR": F.substring,
    "MD5": F.md5,
    "SHA1": F.sha1,
    "SHA256": lambda c: F.sha2(c, 256),
    "SHA512": lambda c: F.sha2(c, 512),
    "RAND": F.rand,
    "UUID": lambda: F.concat(F.lit("urn:uuid:"), F.expr("uuid()")),
    "STRUUID": lambda: F.expr("uuid()"),
    "BNODE": lambda: F.concat(F.lit("_:b"), F.expr("uuid()")),
    # IRI/URI constructor: returns the value unchanged — bind with
    # extend(..., otype='u') so the result term is an IRI
    "IRI": lambda c: c,
    "URI": lambda c: c,
}


def encode_for_uri(col: Column) -> Column:
    """ENCODE_FOR_URI: percent-encode everything but unreserved chars —
    urllib.parse.quote(safe='') parity via the URI pandas-UDF seam."""
    import urllib.parse

    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _enc(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None else urllib.parse.quote(x, safe=""))

    return _enc(col)


SCALAR_MAP["ENCODE_FOR_URI"] = encode_for_uri
