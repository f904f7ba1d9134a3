"""SPARQL-algebra combinators (A1-A16) over a small graph."""

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.constants import RDF_LABEL, RDF_TYPE
from trustgraph_spark.operators.algebra import (
    BUILTINS,
    Var,
    bgp,
    distinct,
    exists,
    extend,
    filter_,
    group_agg,
    join,
    left_join,
    minus,
    order_by,
    project,
    scan_pattern,
    slice_,
    union,
    v,
    values,
)

TRIPLES_DDL = (
    "collection string, g string, s string, p string, o string, "
    "otype string, dtype string, lang string"
)

E = "http://e/"


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        ("default", "", E + "alice", RDF_TYPE, E + "Person", "u", "", ""),
        ("default", "", E + "bob", RDF_TYPE, E + "Person", "u", "", ""),
        ("default", "", E + "carol", RDF_TYPE, E + "Robot", "u", "", ""),
        ("default", "", E + "alice", E + "knows", E + "bob", "u", "", ""),
        ("default", "", E + "bob", E + "knows", E + "carol", "u", "", ""),
        ("default", "", E + "alice", RDF_LABEL, "Alice", "l", "", "en"),
        ("default", "", E + "bob", RDF_LABEL, "Bob", "l", "", ""),
        ("default", "", E + "alice", E + "age", "42", "l", "http://www.w3.org/2001/XMLSchema#integer", ""),
        ("default", "", E + "bob", E + "age", "37", "l", "http://www.w3.org/2001/XMLSchema#integer", ""),
        ("default", "urn:g:x", E + "alice", E + "secret", "s3", "l", "", ""),
    ]
    df = spark.createDataFrame(rows, TRIPLES_DDL).cache()
    df.count()
    return df


def test_scan_pattern_constants_and_vars(edges):
    sol = scan_pattern(edges, Var("who"), RDF_TYPE, E + "Person")
    got = {r.who.value for r in sol.collect()}
    assert got == {E + "alice", E + "bob"}


def test_scan_pattern_graph_filter(edges):
    assert scan_pattern(edges, Var("s"), E + "secret", Var("o")).count() == 0
    assert scan_pattern(edges, Var("s"), E + "secret", Var("o"), g="urn:g:x").count() == 1
    assert scan_pattern(edges, Var("s"), E + "secret", Var("o"), g=None).count() == 1


def test_bgp_join_on_shared_vars(edges):
    # ?x knows ?y . ?y rdf:type Person
    sol = bgp(edges, [(Var("x"), E + "knows", Var("y")), (Var("y"), RDF_TYPE, E + "Person")])
    got = {(r.x.value, r.y.value) for r in sol.collect()}
    assert got == {(E + "alice", E + "bob")}


def test_bgp_three_patterns(edges):
    sol = bgp(
        edges,
        [
            (Var("x"), E + "knows", Var("y")),
            (Var("x"), RDF_LABEL, Var("lx")),
            (Var("x"), E + "age", Var("ax")),
        ],
    )
    rows = {(r.x.value, r.lx.value, r.ax.value) for r in sol.collect()}
    assert rows == {(E + "alice", "Alice", "42"), (E + "bob", "Bob", "37")}


def test_optional(edges):
    people = scan_pattern(edges, Var("x"), RDF_TYPE, Var("t"))
    labels = scan_pattern(edges, Var("x"), RDF_LABEL, Var("l"))
    sol = left_join(people, labels)
    by_x = {r.x.value: r.l for r in sol.collect()}
    assert by_x[E + "alice"].value == "Alice"
    assert by_x[E + "carol"] is None  # OPTIONAL unbound


def test_minus(edges):
    people = scan_pattern(edges, Var("x"), RDF_TYPE, E + "Person")
    knowers = scan_pattern(edges, Var("x"), E + "knows", Var("y")).select("x")
    sol = minus(people, knowers)
    assert {r.x.value for r in sol.collect()} == set()  # alice and bob both know
    robots = scan_pattern(edges, Var("x"), RDF_TYPE, E + "Robot")
    assert {r.x.value for r in minus(robots, knowers).collect()} == {E + "carol"}


def test_union_and_distinct(edges):
    a = scan_pattern(edges, Var("x"), RDF_TYPE, E + "Person")
    b = scan_pattern(edges, Var("x"), E + "knows", Var("y")).select("x")
    u = union(a, b)
    assert u.count() == 4
    assert distinct(u.select("x")).count() == 2


def test_filter_builtins(edges):
    labels = scan_pattern(edges, Var("x"), RDF_LABEL, Var("l"))
    sol = filter_(labels, v("l").startswith("A"))
    assert {r.l.value for r in sol.collect()} == {"Alice"}
    # LANG builtin
    en = filter_(labels, BUILTINS["LANG"]("l") == "en")
    assert {r.l.value for r in en.collect()} == {"Alice"}
    # isIRI / isLITERAL
    typed = scan_pattern(edges, Var("x"), E + "age", Var("a"))
    assert filter_(typed, BUILTINS["isLITERAL"]("a")).count() == 2
    assert filter_(typed, BUILTINS["isIRI"]("a")).count() == 0
    assert {r.a.dtype for r in typed.collect()} == {
        "http://www.w3.org/2001/XMLSchema#integer"
    }


def test_exists(edges):
    people = scan_pattern(edges, Var("x"), RDF_TYPE, E + "Person")
    aged = scan_pattern(edges, Var("x"), E + "age", Var("a")).select("x")
    assert exists(people, aged).count() == 2
    assert exists(people, aged, negate=True).count() == 0


def test_order_slice_project(edges):
    ages = scan_pattern(edges, Var("x"), E + "age", Var("a"))
    ordered = order_by(ages, ("a", "desc"))
    top = slice_(ordered, limit=1).collect()
    assert top[0].a.value == "42"
    assert project(ages, ["x"]).columns == ["x"]


def test_extend_bind(edges):
    ages = scan_pattern(edges, Var("x"), E + "age", Var("a"))
    sol = extend(ages, "a2", v("a").cast("int") * 2)
    got = {r.a2.value for r in sol.collect()}
    assert got == {"84", "74"}


def test_values_and_bind_join(spark, edges):
    vals = values(spark, [{"x": E + "alice"}])
    people = scan_pattern(edges, Var("x"), RDF_TYPE, Var("t"))
    sol = join(vals, people)
    assert {r.t.value for r in sol.collect()} == {E + "Person"}


def test_group_agg(edges):
    # count entities per type; avg age overall
    typed = scan_pattern(edges, Var("x"), RDF_TYPE, Var("t"))
    out = group_agg(typed, ["t"], {"n": ("count", "x")})
    got = {r.t.value: r.n for r in out.collect()}
    assert got == {E + "Person": 2, E + "Robot": 1}

    ages = scan_pattern(edges, Var("x"), E + "age", Var("a"))
    agg = group_agg(ages, [], {
        "avg_age": ("avg", "a"),
        "max_age": ("max", "a"),
        "names": ("group_concat", "a", ","),
        "n": ("count", "*"),
    }).collect()[0]
    assert agg.avg_age == pytest.approx(39.5)
    assert agg.n == 2
    assert set(agg.names.split(",")) == {"42", "37"}


def test_repeated_var_in_pattern(spark):
    rows = [
        ("default", "", E + "n1", E + "self", E + "n1", "u", "", ""),
        ("default", "", E + "n1", E + "self", E + "n2", "u", "", ""),
    ]
    df = spark.createDataFrame(rows, TRIPLES_DDL)
    sol = scan_pattern(df, Var("x"), E + "self", Var("x"))
    assert {r.x.value for r in sol.collect()} == {E + "n1"}


def test_strbefore_strafter_semantics(spark):
    from trustgraph_spark.operators.algebra import SCALAR_MAP

    df = spark.createDataFrame([("abc-def-ghi",)], "s string")
    c = F.col("s")
    row = df.select(
        SCALAR_MAP["STRBEFORE"](c, "-").alias("before"),
        SCALAR_MAP["STRAFTER"](c, "-").alias("after"),
        SCALAR_MAP["STRBEFORE"](c, "@").alias("before_absent"),
        SCALAR_MAP["STRAFTER"](c, "@").alias("after_absent"),
        SCALAR_MAP["STRAFTER"](c, "").alias("after_empty"),
        SCALAR_MAP["STRBEFORE"](c, "").alias("before_empty"),
    ).collect()[0]
    # SPARQL: first occurrence; '' when the needle is absent
    assert row.before == "abc"
    assert row.after == "def-ghi"
    assert row.before_absent == ""
    assert row.after_absent == ""
    assert row.after_empty == "abc-def-ghi"
    assert row.before_empty == ""


def test_if_in_langmatches_tz(spark):
    from trustgraph_spark.operators.algebra import SCALAR_MAP

    df = spark.createDataFrame(
        [(5, "en-US", "2024-01-01T00:00:00Z"), (1, "fr", "2024-01-01T00:00:00+05:00")],
        "n int, lang string, dt string",
    )
    rows = df.select(
        SCALAR_MAP["IF"](F.col("n") > 3, F.lit("big"), F.lit("small")).alias("sz"),
        SCALAR_MAP["IN"](F.col("lang"), ["en-US", "de"]).alias("inn"),
        SCALAR_MAP["NOT IN"](F.col("lang"), ["en-US", "de"]).alias("notin"),
        SCALAR_MAP["LANGMATCHES"](F.col("lang"), "en").alias("lm_en"),
        SCALAR_MAP["LANGMATCHES"](F.col("lang"), "*").alias("lm_star"),
        SCALAR_MAP["TZ"](F.col("dt")).alias("tz"),
    ).orderBy(F.desc("n")).collect()
    big, small = rows
    assert (big.sz, small.sz) == ("big", "small")
    assert big.inn and not small.inn
    assert small.notin and not big.notin
    assert big.lm_en and not small.lm_en  # en-US matches 'en'; fr doesn't
    assert big.lm_star and small.lm_star
    assert big.tz == "Z" and small.tz == "+05:00"


def test_is_numeric_is_blank(spark, edges):
    sol = scan_pattern(edges, E + "alice", E + "age", Var("a"))
    assert filter_(sol, BUILTINS["isNUMERIC"]("a")).count() == 1
    assert filter_(sol, BUILTINS["isBLANK"]("a")).count() == 0
    lbl = scan_pattern(edges, E + "alice", RDF_LABEL, Var("l"))
    assert filter_(lbl, BUILTINS["isNUMERIC"]("l")).count() == 0


def test_iri_constructor_and_extend_otype(spark, edges):
    from trustgraph_spark.operators.algebra import SCALAR_MAP

    sol = scan_pattern(edges, Var("x"), RDF_TYPE, E + "Person")
    bound_ = extend(
        sol, "u", SCALAR_MAP["IRI"](F.concat(F.lit(E), F.lit("made-up"))), otype="u"
    )
    r = bound_.collect()[0]
    assert r.u.value == E + "made-up" and r.u.otype == "u"


def test_struuid_bnode_shapes(spark):
    from trustgraph_spark.operators.algebra import SCALAR_MAP

    df = spark.range(1)
    r = df.select(
        SCALAR_MAP["UUID"]().alias("uuid"),
        SCALAR_MAP["STRUUID"]().alias("struuid"),
        SCALAR_MAP["BNODE"]().alias("bnode"),
    ).collect()[0]
    assert r.uuid.startswith("urn:uuid:")
    assert len(r.struuid) == 36 and r.struuid.count("-") == 4
    assert r.bnode.startswith("_:b")
