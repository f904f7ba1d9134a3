"""SPARQL string front-end: parser behavior mirrors the reference's
tests/unit/test_query/test_sparql_parser.py; evaluation parity with the
algebra combinators mirrors test_sparql_algebra.py scenarios."""

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.constants import RDF_LABEL, RDF_TYPE
from trustgraph_spark.sparql import ParseError, parse_sparql, sparql_select

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
        ("default", "", E + "alice", E + "age", "42", "l",
         "http://www.w3.org/2001/XMLSchema#integer", ""),
        ("default", "", E + "bob", E + "age", "37", "l",
         "http://www.w3.org/2001/XMLSchema#integer", ""),
        ("default", "urn:g:x", E + "alice", E + "secret", "s3", "l", "", ""),
    ]
    df = spark.createDataFrame(rows, TRIPLES_DDL).cache()
    df.count()
    return df


# --- parser behavior (reference test_sparql_parser.py parity) ---------------


def test_select_query_type_and_variables():
    q = parse_sparql("SELECT ?s ?p ?o WHERE { ?s ?p ?o }")
    assert q.query_type == "select"
    assert q.variables == ["s", "p", "o"]


def test_select_subset_variables():
    q = parse_sparql("SELECT ?s ?o WHERE { ?s ?p ?o }")
    assert q.variables == ["s", "o"]


def test_ask_query_type_no_variables():
    q = parse_sparql("ASK { ?s ?p ?o }")
    assert q.query_type == "ask"
    assert q.variables == []


def test_construct_describe_detected():
    assert parse_sparql(
        "CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }"
    ).query_type == "construct"
    assert parse_sparql("DESCRIBE <http://x>").query_type == "describe"


def test_limit_distinct_parse():
    q = parse_sparql("SELECT DISTINCT ?s WHERE { ?s ?p ?o } LIMIT 10")
    assert q.distinct and q.limit == 10


def test_prefix_expansion():
    q = parse_sparql(
        "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> "
        "SELECT ?s ?label WHERE { ?s rdfs:label ?label }"
    )
    tp = q.where.elements[0][1][0]
    assert tp.p == RDF_LABEL


def test_parse_errors():
    with pytest.raises(ParseError):
        parse_sparql("NOT A QUERY")
    with pytest.raises(ParseError):
        parse_sparql("SELECT ?s WHERE {")
    with pytest.raises(ParseError):
        parse_sparql("SELECT ?s WHERE { ?s foo:bar ?o }")  # unknown prefix


# --- evaluation --------------------------------------------------------------


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_single_pattern_all_variables(edges):
    out = sparql_select(edges, "SELECT ?s ?p ?o WHERE { ?s ?p ?o }")
    assert out.count() == 9  # named-graph row excluded (default graph only)
    assert set(out.columns) == {"s", "p", "o"}


def test_bound_subject_and_a_shortcut(edges):
    out = sparql_select(
        edges, f"SELECT ?t WHERE {{ <{E}alice> a ?t }}"
    )
    assert _rows(out) == {(E + "Person",)}


def test_predicate_object_list_shortcuts(edges):
    out = sparql_select(
        edges,
        f"SELECT ?x ?n WHERE {{ ?x a <{E}Person> ; <{E}age> ?n }}",
    )
    assert _rows(out) == {(E + "alice", "42"), (E + "bob", "37")}


def test_join_two_patterns(edges):
    out = sparql_select(
        edges,
        f"SELECT ?x ?y WHERE {{ ?x <{E}knows> ?y . ?y <{E}knows> ?z }}",
    )
    assert _rows(out) == {(E + "alice", E + "bob")}


def test_filter_numeric_comparison(edges):
    out = sparql_select(
        edges,
        f"SELECT ?x WHERE {{ ?x <{E}age> ?n FILTER (?n > 40) }}",
    )
    assert _rows(out) == {(E + "alice",)}


def test_filter_regex_and_str(edges):
    out = sparql_select(
        edges,
        'SELECT ?x WHERE { ?x <%slabel> ?l FILTER regex(?l, "^ali", "i") }' % E.replace(E, "http://www.w3.org/2000/01/rdf-schema#"),
    )
    assert _rows(out) == {(E + "alice",)}


def test_optional(edges):
    out = sparql_select(
        edges,
        f"SELECT ?x ?l WHERE {{ ?x a <{E}Person> OPTIONAL {{ ?x "
        f"<{RDF_LABEL}> ?l }} }}",
    )
    got = dict(_rows(out))
    assert got[E + "alice"] == "Alice" and got[E + "bob"] == "Bob"


def test_optional_unmatched_is_null(edges):
    out = sparql_select(
        edges,
        f"SELECT ?x ?l WHERE {{ ?x a <{E}Robot> OPTIONAL {{ ?x "
        f"<{RDF_LABEL}> ?l }} }}",
    )
    assert _rows(out) == {(E + "carol", None)}


def test_union(edges):
    out = sparql_select(
        edges,
        f"SELECT ?x WHERE {{ {{ ?x a <{E}Robot> }} UNION {{ ?x a <{E}Person> }} }}",
    )
    assert _rows(out) == {(E + "alice",), (E + "bob",), (E + "carol",)}


def test_minus(edges):
    out = sparql_select(
        edges,
        f"SELECT ?x WHERE {{ ?x a <{E}Person> MINUS {{ ?x <{E}knows> <{E}carol> }} }}",
    )
    assert _rows(out) == {(E + "alice",)}


def test_filter_exists_and_not_exists(edges):
    q = f"SELECT ?x WHERE {{ ?x a <{E}Person> FILTER EXISTS {{ ?x <{E}knows> ?y }} }}"
    assert _rows(sparql_select(edges, q)) == {(E + "alice",), (E + "bob",)}
    q2 = f"SELECT ?x WHERE {{ ?x a ?t FILTER NOT EXISTS {{ ?x <{E}knows> ?y }} }}"
    assert _rows(sparql_select(edges, q2)) == {(E + "carol",)}


def test_order_limit_offset(edges):
    out = sparql_select(
        edges,
        f"SELECT ?x ?n WHERE {{ ?x <{E}age> ?n }} ORDER BY DESC(?n) LIMIT 1",
    )
    assert _rows(out) == {(E + "alice", "42")}
    out2 = sparql_select(
        edges,
        f"SELECT ?x WHERE {{ ?x <{E}age> ?n }} ORDER BY ?n LIMIT 1 OFFSET 1",
    )
    assert _rows(out2) == {(E + "alice",)}


def test_distinct(edges):
    out = sparql_select(edges, "SELECT DISTINCT ?p WHERE { ?s ?p ?o }")
    assert out.count() == 4


def test_bind_and_arithmetic(edges):
    out = sparql_select(
        edges,
        f"SELECT ?x ?m WHERE {{ ?x <{E}age> ?n BIND (?n + 1 AS ?m) }}",
    )
    got = dict(_rows(out))
    assert got[E + "alice"] == "43.0"


def test_values_inline(edges):
    out = sparql_select(
        edges,
        f'SELECT ?x ?n WHERE {{ VALUES ?x {{ <{E}alice> }} ?x <{E}age> ?n }}',
    )
    assert _rows(out) == {(E + "alice", "42")}


def test_group_by_count(edges):
    out = sparql_select(
        edges,
        "SELECT ?t (COUNT(?x) AS ?n) WHERE { ?x a ?t } GROUP BY ?t",
    )
    got = dict(_rows(out))
    assert got[E + "Person"] == 2 and got[E + "Robot"] == 1


def test_group_by_having_and_avg(edges):
    out = sparql_select(
        edges,
        f"SELECT ?t (AVG(?n) AS ?avg) WHERE {{ ?x a ?t . ?x <{E}age> ?n }} "
        "GROUP BY ?t HAVING (COUNT(?x) >= 2)",
    )
    assert _rows(out) == {(E + "Person", 39.5)}


def test_graph_clause(edges):
    out = sparql_select(
        edges,
        f"SELECT ?o WHERE {{ GRAPH <urn:g:x> {{ <{E}alice> <{E}secret> ?o }} }}",
    )
    assert _rows(out) == {("s3",)}


def test_ask_true_false(edges):
    assert sparql_select(edges, f"ASK {{ <{E}alice> ?p ?o }}").collect()[0].ask
    assert not sparql_select(edges, f"ASK {{ <{E}nobody> ?p ?o }}").collect()[0].ask


def test_select_star(edges):
    out = sparql_select(edges, f"SELECT * WHERE {{ ?x <{E}knows> ?y }}")
    assert set(out.columns) == {"x", "y"}
    assert out.count() == 2


def test_in_and_lang(edges):
    out = sparql_select(
        edges,
        f"SELECT ?x WHERE {{ ?x <{RDF_LABEL}> ?l FILTER (LANG(?l) IN (\"en\")) }}",
    )
    assert _rows(out) == {(E + "alice",)}


def test_sparql_plan_is_single_catalyst_plan(edges):
    out = sparql_select(
        edges,
        f"SELECT ?x ?y WHERE {{ ?x <{E}knows> ?y . ?y a <{E}Person> }}",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_construct_basic(edges):
    out = sparql_select(
        edges,
        f"CONSTRUCT {{ ?x <{E}friendOf> ?y . ?x a <{E}Social> }} "
        f"WHERE {{ ?x <{E}knows> ?y }}",
    )
    got = {(r.s, r.p, r.o, r.otype) for r in out.collect()}
    assert got == {
        (E + "alice", E + "friendOf", E + "bob", "u"),
        (E + "bob", E + "friendOf", E + "carol", "u"),
        (E + "alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", E + "Social", "u"),
        (E + "bob", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", E + "Social", "u"),
    }


def test_construct_skips_unbound_optional_vars(edges):
    out = sparql_select(
        edges,
        f"CONSTRUCT {{ ?x <{E}hasLabel> ?l }} "
        f"WHERE {{ ?x a ?t OPTIONAL {{ ?x <{RDF_LABEL}> ?l }} }}",
    )
    got = {(r.s, r.o, r.otype) for r in out.collect()}
    # carol has no label -> her template row is omitted, not null
    assert got == {(E + "alice", "Alice", "l"), (E + "bob", "Bob", "l")}


def test_construct_literal_object_constant(edges):
    out = sparql_select(
        edges,
        f'CONSTRUCT {{ ?x <{E}flag> "seen" }} WHERE {{ ?x a <{E}Robot> }}',
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].o == "seen" and rows[0].otype == "l"


def test_describe_constant_iri(edges):
    out = sparql_select(edges, f"DESCRIBE <{E}bob>")
    got = {(r.s, r.p, r.o) for r in out.collect()}
    # bob as subject (3 triples) + bob as URI object (alice knows bob)
    assert (E + "bob", RDF_TYPE, E + "Person") in got
    assert (E + "alice", E + "knows", E + "bob") in got
    assert (E + "bob", RDF_LABEL, "Bob") in got
    assert not any(s == E + "carol" for (s, _, _) in got)


def test_describe_var_with_where(edges):
    out = sparql_select(
        edges, f"DESCRIBE ?x WHERE {{ ?x a <{E}Robot> }}"
    )
    got = {(r.s, r.p, r.o) for r in out.collect()}
    assert (E + "carol", RDF_TYPE, E + "Robot") in got
    assert (E + "bob", E + "knows", E + "carol") in got  # carol as object
    assert not any(s == E + "alice" for (s, _, _) in got)


def test_distinct_order_limit_returns_sorted_top_n(spark):
    """DISTINCT must not destroy ORDER BY: the sort lands after the dedup
    so LIMIT slices the sorted distinct rows."""
    rows = []
    for i, v in enumerate([5, 3, 9, 1, 5, 3, 9, 1]):  # each value twice
        rows.append(("default", "", f"{E}e{i}", f"{E}score", str(v), "l", "", ""))
    df = spark.createDataFrame(rows, TRIPLES_DDL)
    out = sparql_select(
        df,
        f"SELECT DISTINCT ?n WHERE {{ ?x <{E}score> ?n }} "
        f"ORDER BY DESC(?n) LIMIT 2",
    )
    assert [r.n for r in out.collect()] == ["9", "5"]


def test_unquote_escaped_backslash_before_n(edges):
    # '\\\\n' in the query = backslash + n, NOT newline
    out = sparql_select(
        edges, 'SELECT ?s WHERE { ?s ?p ?o FILTER(?o = "a\\\\n") }'
    )
    assert out.count() == 0  # parses; no value matches


def test_unspaced_less_than_is_not_irireF(spark):
    rows = [
        ("default", "", f"{E}e{i}", f"{E}v", str(i), "l", "", "")
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, TRIPLES_DDL)
    out = sparql_select(
        df,
        f"SELECT ?a ?b WHERE {{ ?x <{E}v> ?a . ?y <{E}v> ?b "
        f"FILTER(?a<?b) }}",  # unspaced '<' must lex as an operator
    )
    assert out.count() == 6  # pairs with a < b among 0..3


def test_unicode_escape_and_unknown_escape_preserved(spark):
    rows = [
        ("default", "", f"{E}a", f"{E}v", "café", "l", "", ""),
        ("default", "", f"{E}b", f"{E}v", "\\x", "l", "", ""),
    ]
    df = spark.createDataFrame(rows, TRIPLES_DDL)
    # é decodes to é
    out = sparql_select(
        df, f'SELECT ?s WHERE {{ ?s <{E}v> "caf\\u00e9" }}'
    )
    assert [r.s for r in out.collect()] == [f"{E}a"]
    # unknown escape \x keeps its backslash verbatim
    out2 = sparql_select(df, f'SELECT ?s WHERE {{ ?s <{E}v> "\\x" }}')
    assert [r.s for r in out2.collect()] == [f"{E}b"]


def test_unspaced_less_than_number_not_iriref(spark):
    rows = [
        ("default", "", f"{E}e{i}", f"{E}v", str(i), "l", "", "")
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, TRIPLES_DDL)
    out = sparql_select(
        df,
        f"SELECT ?a ?b WHERE {{ ?x <{E}v> ?a . ?y <{E}v> ?b "
        f"FILTER(?a<2&&?b>2) }}",  # '<2&&?b>' must NOT lex as an IRI
    )
    assert out.count() == 2  # a in {0,1} x b in {3}


def test_order_by_numeric_values_not_lexical(spark):
    rows = [
        ("default", "", f"{E}e{i}", f"{E}score", str(v), "l", "", "")
        for i, v in enumerate([100, 37, 9, 42])
    ]
    df = spark.createDataFrame(rows, TRIPLES_DDL)
    out = sparql_select(
        df, f"SELECT ?n WHERE {{ ?x <{E}score> ?n }} ORDER BY DESC(?n)"
    )
    assert [r.n for r in out.collect()] == ["100", "42", "37", "9"]


def test_filter_var_var_numeric_not_lexical(spark):
    """FILTER(?a < ?b) between two variables holding numeric literals must
    compare numerically ('9' < '37'), falling back to lexical only when a
    side does not parse as a number (ADVICE r2)."""
    rows = [
        ("default", "", f"{E}e{i}", f"{E}v", str(v), "l", "", "")
        for i, v in enumerate([9, 37])
    ]
    df = spark.createDataFrame(rows, TRIPLES_DDL)
    out = sparql_select(
        df,
        f"SELECT ?a ?b WHERE {{ ?x <{E}v> ?a . ?y <{E}v> ?b "
        f"FILTER(?a < ?b) }}",
    )
    assert [(r.a, r.b) for r in out.collect()] == [("9", "37")]
    # non-numeric side: lexical fallback still works
    rows2 = [
        ("default", "", f"{E}e{i}", f"{E}v", v, "l", "", "")
        for i, v in enumerate(["apple", "banana"])
    ]
    df2 = spark.createDataFrame(rows2, TRIPLES_DDL)
    out2 = sparql_select(
        df2,
        f"SELECT ?a ?b WHERE {{ ?x <{E}v> ?a . ?y <{E}v> ?b "
        f"FILTER(?a < ?b) }}",
    )
    assert [(r.a, r.b) for r in out2.collect()] == [("apple", "banana")]


def test_langmatches_star_through_front_end(edges):
    """LANGMATCHES(LANG(?l), "*") via the string front-end (range arrives
    as a compiled Column, not a Python str) matches any non-empty tag
    (ADVICE r2)."""
    out = sparql_select(
        edges,
        "SELECT ?s WHERE { ?s <http://www.w3.org/2000/01/rdf-schema#label>"
        ' ?l FILTER(LANGMATCHES(LANG(?l), "*")) }',
    )
    assert [r.s for r in out.collect()] == [f"{E}alice"]


# --- property paths ---------------------------------------------------------


@pytest.fixture(scope="module")
def hierarchy(spark):
    """subClassOf chain a->b->c->d plus a knows edge and labels."""
    SC = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
    rows = [
        ("default", "", E + "a", SC, E + "b", "u", "", ""),
        ("default", "", E + "b", SC, E + "c", "u", "", ""),
        ("default", "", E + "c", SC, E + "d", "u", "", ""),
        ("default", "", E + "x", E + "knows", E + "y", "u", "", ""),
        ("default", "", E + "y", E + "knows", E + "z", "u", "", ""),
        ("default", "", E + "y", RDF_LABEL, "Why", "l", "", ""),
        ("default", "", E + "z", RDF_LABEL, "Zed", "l", "", ""),
    ]
    df = spark.createDataFrame(rows, TRIPLES_DDL).cache()
    df.count()
    return df


def test_path_plus_transitive_closure(hierarchy):
    out = sparql_select(
        hierarchy,
        f"SELECT ?x WHERE {{ <{E}a> "
        "<http://www.w3.org/2000/01/rdf-schema#subClassOf>+ ?x } ORDER BY ?x",
    )
    assert [r.x for r in out.collect()] == [E + "b", E + "c", E + "d"]


def test_path_star_includes_zero_length(hierarchy):
    out = sparql_select(
        hierarchy,
        f"SELECT ?x WHERE {{ <{E}a> "
        "<http://www.w3.org/2000/01/rdf-schema#subClassOf>* ?x } ORDER BY ?x",
    )
    assert [r.x for r in out.collect()] == [E + "a", E + "b", E + "c", E + "d"]


def test_path_opt_zero_or_one(hierarchy):
    out = sparql_select(
        hierarchy,
        f"SELECT ?x WHERE {{ <{E}a> "
        "<http://www.w3.org/2000/01/rdf-schema#subClassOf>? ?x } ORDER BY ?x",
    )
    assert [r.x for r in out.collect()] == [E + "a", E + "b"]


def test_path_inverse(hierarchy):
    out = sparql_select(
        hierarchy,
        f"SELECT ?x WHERE {{ <{E}c> "
        "^<http://www.w3.org/2000/01/rdf-schema#subClassOf> ?x }",
    )
    assert [r.x for r in out.collect()] == [E + "b"]


def test_path_sequence_and_join_with_bgp(hierarchy):
    # knows/label: two-step path ending at a literal, joined with a plain
    # pattern in the same group
    out = sparql_select(
        hierarchy,
        f"SELECT ?n WHERE {{ <{E}x> <{E}knows>/"
        "<http://www.w3.org/2000/01/rdf-schema#label> ?n }",
    )
    assert [r.n for r in out.collect()] == ["Why"]


def test_path_alternative(hierarchy):
    out = sparql_select(
        hierarchy,
        f"SELECT ?o WHERE {{ <{E}y> (<{E}knows>|"
        "<http://www.w3.org/2000/01/rdf-schema#label>) ?o } ORDER BY ?o",
    )
    assert [r.o for r in out.collect()] == ["Why", E + "z"]


def test_path_plus_on_cycle_terminates(spark):
    rows = [
        ("default", "", E + "n1", E + "p", E + "n2", "u", "", ""),
        ("default", "", E + "n2", E + "p", E + "n3", "u", "", ""),
        ("default", "", E + "n3", E + "p", E + "n1", "u", "", ""),
    ]
    df = spark.createDataFrame(rows, TRIPLES_DDL)
    out = sparql_select(
        df, f"SELECT ?a ?b WHERE {{ ?a <{E}p>+ ?b }}"
    )
    # closure of a 3-cycle: all 9 ordered pairs
    assert out.count() == 9


def test_path_inverse_sequence_combo(hierarchy):
    # ^knows/knows: nodes sharing a knower with ?x... y: ^knows -> x,
    # then knows -> y. So (y, y).
    out = sparql_select(
        hierarchy,
        f"SELECT ?v WHERE {{ <{E}y> ^<{E}knows>/<{E}knows> ?v }}",
    )
    assert [r.v for r in out.collect()] == [E + "y"]


def test_path_var_with_modifier_rejected():
    with pytest.raises(ParseError):
        parse_sparql("SELECT ?s WHERE { ?s ?p+ ?o }")


def test_graph_variable_binds_named_graphs(edges):
    """GRAPH ?g ranges over NAMED graphs only and binds the graph IRI
    (the reference's parser accepts this but its evaluator does not)."""
    out = sparql_select(
        edges, "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s ?p ?o } }"
    )
    rows = out.collect()
    # only the one named-graph triple (urn:g:x); default-graph rows excluded
    assert len(rows) == 1
    assert rows[0].g == "urn:g:x" and rows[0].o == "s3"


def test_graph_variable_joins_with_default(edges):
    out = sparql_select(
        edges,
        "SELECT ?g ?name WHERE { GRAPH ?g { ?s ?p ?o } . "
        "?s <http://www.w3.org/2000/01/rdf-schema#label> ?name }",
    )
    rows = out.collect()
    assert [(r.g, r.name) for r in rows] == [("urn:g:x", "Alice")]


# --- subqueries -------------------------------------------------------------


def test_subquery_aggregate_join(edges):
    """{ SELECT (COUNT AS ?n) GROUP BY } joined with an outer pattern on
    the shared variable (term-struct join, not value-string join)."""
    out = sparql_select(
        edges,
        "SELECT ?name ?n WHERE { "
        "  ?p <http://www.w3.org/2000/01/rdf-schema#label> ?name . "
        f" {{ SELECT ?p (COUNT(?o) AS ?n) WHERE {{ ?p <{E}knows> ?o }} "
        "    GROUP BY ?p } }",
    )
    got = {(r.name, int(r.n)) for r in out.collect()}
    assert got == {("Alice", 1), ("Bob", 1)}


def test_subquery_order_limit(edges):
    """ORDER BY + LIMIT inside the subquery: top-1 by numeric age, outer
    pattern resolves the label."""
    out = sparql_select(
        edges,
        "SELECT ?name WHERE { "
        "  ?p <http://www.w3.org/2000/01/rdf-schema#label> ?name . "
        f" {{ SELECT ?p WHERE {{ ?p <{E}age> ?a }} ORDER BY DESC(?a) "
        "    LIMIT 1 } }",
    )
    assert [r.name for r in out.collect()] == ["Alice"]  # age 42 > 37


def test_subquery_projection_scoping(edges):
    """Variables not projected by the subquery are invisible outside —
    ?o below must be unbound (null), not leak from the inner scope."""
    out = sparql_select(
        edges,
        f"SELECT ?p ?o WHERE {{ {{ SELECT ?p WHERE {{ ?p <{E}knows> ?o }} }} }}",
    )
    rows = out.collect()
    assert len(rows) == 2
    assert all(r.o is None for r in rows)


def test_path_var_in_sequence_rejected():
    """A variable inside a path sequence/alternative is a ParseError, not
    a TypeError deep in evaluation (review r3)."""
    with pytest.raises(ParseError):
        parse_sparql(f"SELECT ?s ?o WHERE {{ ?s ?p/<{E}x> ?o }}")
    with pytest.raises(ParseError):
        parse_sparql(f"SELECT ?s ?o WHERE {{ ?s ?p|<{E}x> ?o }}")


def test_path_negated_property_set(hierarchy):
    """!iri and !(iri|^iri) — grammar [89] (completes the path grammar
    except {n,m} ranges)."""
    SC = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
    # everything EXCEPT subClassOf and label out of y: only knows
    out = sparql_select(
        hierarchy,
        f"SELECT ?o WHERE {{ <{E}y> !(<{SC}>|"
        "<http://www.w3.org/2000/01/rdf-schema#label>) ?o }",
    )
    assert [r.o for r in out.collect()] == [E + "z"]
    # single-IRI form: x's non-label edges
    out2 = sparql_select(
        hierarchy,
        "SELECT ?o WHERE { <http://e/x> "
        "!<http://www.w3.org/2000/01/rdf-schema#label> ?o }",
    )
    assert [r.o for r in out2.collect()] == [E + "y"]
    # only-inverse members: !(^p) == ^(!(p)) (SPARQL 1.1 §9.1) — pure
    # reverse traversal; y's only incoming edge IS knows, so nothing
    # survives the exclusion
    out3 = sparql_select(
        hierarchy,
        f"SELECT ?x WHERE {{ <{E}y> !(^<{E}knows>) ?x }}",
    )
    assert out3.count() == 0
    # mixed set: forward non-label edges of y UNION reverse non-subClassOf
    # arrivals at y
    out4 = sparql_select(
        hierarchy,
        "SELECT ?x WHERE { <http://e/y> "
        "!(<http://www.w3.org/2000/01/rdf-schema#label>|"
        "^<http://www.w3.org/2000/01/rdf-schema#subClassOf>) ?x } ORDER BY ?x",
    )
    # forward: knows->z; reverse: x knows y -> x
    assert [r.x for r in out4.collect()] == [E + "x", E + "z"]


def test_path_inside_graph_variable(spark):
    """A closure inside GRAPH ?g runs per named graph: chains never cross
    graphs, and ?g binds alongside the path endpoints."""
    P = E + "next"
    rows = [
        # graph g1: a -> b -> c
        ("default", "urn:g:1", E + "a", P, E + "b", "u", "", ""),
        ("default", "urn:g:1", E + "b", P, E + "c", "u", "", ""),
        # graph g2: c -> d (must NOT extend g1's chain)
        ("default", "urn:g:2", E + "c", P, E + "d", "u", "", ""),
        # default graph: x -> y (invisible to GRAPH ?g)
        ("default", "", E + "x", P, E + "y", "u", "", ""),
    ]
    df = spark.createDataFrame(rows, TRIPLES_DDL)
    out = sparql_select(
        df,
        f"SELECT ?g ?x WHERE {{ GRAPH ?g {{ <{E}a> <{P}>+ ?x }} }} ORDER BY ?x",
    )
    got = [(r.g, r.x) for r in out.collect()]
    # reachable from a only inside g1: b, c — never d (lives in g2)
    assert got == [("urn:g:1", E + "b"), ("urn:g:1", E + "c")]

    # constant-graph path still works through the same machinery
    out2 = sparql_select(
        df,
        f"SELECT ?x WHERE {{ GRAPH <urn:g:2> {{ ?s <{P}>* ?x }} }} ORDER BY ?x",
    )
    assert {r.x for r in out2.collect()} == {E + "c", E + "d"}


def test_subquery_inside_graph_var_per_graph(spark):
    """Graph(?g, {subquery}): the subquery evaluates PER named graph —
    aggregates group per graph and ?g binds (review r3 #2)."""
    P = E + "knows"
    rows = [
        ("default", "urn:g:1", E + "a", P, E + "b", "u", "", ""),
        ("default", "urn:g:1", E + "b", P, E + "c", "u", "", ""),
        ("default", "urn:g:2", E + "x", P, E + "y", "u", "", ""),
    ]
    df = spark.createDataFrame(rows, TRIPLES_DDL)
    out = sparql_select(
        df,
        "SELECT ?g ?n WHERE { GRAPH ?g { { SELECT (COUNT(?o) AS ?n) "
        f"WHERE {{ ?s <{P}> ?o }} }} }} }}".replace("} } }", "} } }"),
    )
    got = sorted((r.g, int(r.n)) for r in out.collect())
    assert got == [("urn:g:1", 2), ("urn:g:2", 1)]
    # per-graph LIMIT: top-1 subject per graph, not a global single row
    out2 = sparql_select(
        df,
        "SELECT ?g ?s WHERE { GRAPH ?g { { SELECT ?s WHERE "
        f"{{ ?s <{P}> ?o }} ORDER BY ?s LIMIT 1 }} }} }}",
    )
    got2 = sorted((r.g, r.s) for r in out2.collect())
    assert got2 == [("urn:g:1", E + "a"), ("urn:g:2", E + "x")]


def test_subquery_unbound_projected_var_is_compatible(edges):
    """A projected-but-never-bound subquery variable joins as UNBOUND
    (compatible with any outer binding), not as a NULL that kills the
    join (review r3 #4)."""
    out = sparql_select(
        edges,
        "SELECT ?p ?name WHERE { "
        f"?p <{RDF_LABEL}> ?name . "
        f"{{ SELECT ?p ?name WHERE {{ ?p <{E}knows> ?o }} }} }}",
    )
    got = {(r.p, r.name) for r in out.collect()}
    assert got == {(E + "alice", "Alice"), (E + "bob", "Bob")}
