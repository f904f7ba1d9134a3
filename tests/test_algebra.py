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
