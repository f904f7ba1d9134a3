"""GraphQL query surface over the rows store: parser + where-clause
flattening (reference query/graphql/filters.py semantics) + compilation to
rows_query plans (query/rows service.py execute_graphql_query)."""

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.graphql import (
    GraphQLError,
    flatten_where,
    graphql_rows_query,
    parse_graphql,
)
from trustgraph_spark.operators.extract_extras import validate_rows
from trustgraph_spark.operators.rows import rows_store

FIELDS = [
    {"name": "sku", "type": "string", "primary": True},
    {"name": "name", "type": "string", "indexed": True},
    {"name": "price", "type": "float"},
    {"name": "qty", "type": "integer"},
]
SCHEMAS = {"product": FIELDS}

ROWS = [
    '{"sku": "s1", "name": "hammer", "price": "9.5", "qty": "3"}',
    '{"sku": "s2", "name": "drill", "price": "120", "qty": "1"}',
    '{"sku": "s3", "name": "saw", "price": "15", "qty": "7"}',
    '{"sku": "s4", "name": "sander", "price": "80", "qty": "2"}',
]


@pytest.fixture(scope="module")
def store(spark):
    objs = spark.createDataFrame([(r,) for r in ROWS], "obj_json string")
    st = rows_store(validate_rows(objs, FIELDS), FIELDS, "product").cache()
    st.count()
    return st


# --- where flattening (filters.py parse_where_clause parity) ----------------


def test_flatten_where_reference_mapping():
    assert flatten_where({"email": {"eq": "a@b"}}) == {"email": "a@b"}
    assert flatten_where({"age": {"gt": 21}}) == {"age_gt": 21}
    assert flatten_where(
        {"name": {"contains": "x", "startsWith": "y"}, "age": {"gte": 1, "lt": 9}}
    ) == {"name_contains": "x", "name_startsWith": "y", "age_gte": 1, "age_lt": 9}
    assert flatten_where({"t": {"in": ["a"], "not": "b", "not_in": ["c"]}}) == {
        "t_in": ["a"], "t_not": "b", "t_not_in": ["c"]
    }
    assert flatten_where(None) == {}
    with pytest.raises(GraphQLError):
        flatten_where({"x": {"like": "nope"}})


# --- parser -----------------------------------------------------------------


def test_parse_anonymous_shorthand():
    q = parse_graphql("{ customers { id name } }")
    assert len(q.selections) == 1
    s = q.selections[0]
    assert s.name == "customers" and s.fields == ["id", "name"]


def test_parse_args_and_variables():
    q = parse_graphql(
        'query GetP($st: String, $lim: Int) { product(where: {name: '
        '{eq: $st}}, limit: $lim, order_by: "price", direction: DESC) '
        "{ sku price } }",
        variables={"st": "drill", "lim": 7},
    )
    s = q.selections[0]
    assert s.args["where"] == {"name": {"eq": "drill"}}
    assert s.args["limit"] == 7
    assert s.args["direction"] == "DESC"
    assert s.fields == ["sku", "price"]


def test_parse_aliases_numbers_lists():
    q = parse_graphql(
        '{ a: product(where: {price: {gte: 1.5, in: [1, 2.5]}, qty: '
        "{not: 3}}) { sku } }"
    )
    s = q.selections[0]
    assert s.alias == "a" and s.name == "product"
    assert s.args["where"]["price"] == {"gte": 1.5, "in": [1, 2.5]}
    assert s.args["where"]["qty"] == {"not": 3}


def test_parse_errors():
    for bad in [
        "mutation { x { y } }",
        "{ product { sku } } trailing",
        "{ product }",  # root field without selection set
        '{ product(where: {name: {eq: $nope}}) { sku } }',
    ]:
        with pytest.raises(GraphQLError):
            parse_graphql(bad)


# --- execution --------------------------------------------------------------


def test_execute_basic_where(store):
    out = graphql_rows_query(
        store, SCHEMAS,
        '{ product(where: {price: {gt: 10}}, order_by: "sku") { sku name price } }',
    )
    rows = out["product"].collect()
    assert [r.sku for r in rows] == ["s2", "s3", "s4"]
    # declared float type -> double column
    assert dict(out["product"].dtypes)["price"] == "double"
    assert rows[0].price == 120.0


def test_execute_indexed_eq_and_selection_pruning(store):
    out = graphql_rows_query(
        store, SCHEMAS, '{ product(where: {sku: {eq: "s3"}}) { name qty } }'
    )
    df = out["product"]
    assert df.columns == ["name", "qty"]
    r = df.collect()
    assert len(r) == 1 and r[0].name == "saw" and r[0].qty == 7
    assert dict(df.dtypes)["qty"] == "bigint"


def test_execute_string_ops_and_limit(store):
    out = graphql_rows_query(
        store, SCHEMAS,
        '{ product(where: {name: {startsWith: "sa"}}) { sku } '
        '  top2: product(limit: 2) { sku } }',
    )
    assert sorted(r.sku for r in out["product"].collect()) == ["s3", "s4"]
    assert sorted(r.sku for r in out["top2"].collect()) == ["s1", "s2"]


def test_execute_variables(store):
    out = graphql_rows_query(
        store, SCHEMAS,
        "query Q($n: String) { product(where: {name: {contains: $n}}) { sku } }",
        variables={"n": "r"},
    )
    assert sorted(r.sku for r in out["product"].collect()) == ["s1", "s2", "s4"]


def test_execute_unknown_schema_or_field(store):
    with pytest.raises(GraphQLError):
        graphql_rows_query(store, SCHEMAS, "{ nope { x } }")
    with pytest.raises(GraphQLError):
        graphql_rows_query(store, SCHEMAS, "{ product { bogus } }")
    with pytest.raises(GraphQLError):
        graphql_rows_query(
            store, SCHEMAS, '{ product(order_by: "bogus") { sku } }'
        )


def test_structured_query_orchestration(store):
    """question -> translator (LLM seam) -> GraphQL -> rows store
    (retrieval/structured_query service.py flow), with the reference's
    error shaping."""
    from trustgraph_spark.graphql import structured_query

    def translator(q):
        # deterministic stand-in for the nlp_query two-pass LLM
        assert "cheap" in q
        return (
            "query Q($m: Float) { product(where: {price: {lt: $m}}) { sku price } }",
            {"m": 50},  # non-string variable -> stringified by transport
        )

    out = structured_query(store, SCHEMAS, "cheap products", translator)
    assert out["errors"] == []
    assert sorted(r.sku for r in out["data"]["product"].collect()) == ["s1", "s3"]

    # empty translation raises (service.py:95-96)
    with pytest.raises(ValueError):
        structured_query(store, SCHEMAS, "q", lambda q: ("", {}))

    # execution errors -> errors list, data None
    bad = structured_query(
        store, SCHEMAS, "q", lambda q: ("{ nope { x } }", {})
    )
    assert bad["data"] is None and len(bad["errors"]) == 1


def test_stringified_limit_variable_coerced(store):
    """Variables arrive stringified through the transport; a string limit
    must coerce to int, not crash in DataFrame.limit (review r3)."""
    from trustgraph_spark.graphql import structured_query

    out = structured_query(
        store, SCHEMAS, "q",
        lambda q: ("query Q($n: Int) { product(limit: $n) { sku } }", {"n": 2}),
    )
    assert out["errors"] == [] and out["data"]["product"].count() == 2
    bad = structured_query(
        store, SCHEMAS, "q",
        lambda q: ("query Q($n: Int) { product(limit: $n) { sku } }", {"n": "x"}),
    )
    assert bad["data"] is None and "limit" in bad["errors"][0]


def test_unicode_escape_in_string_value(store):
    """\\uXXXX escapes decode per the GraphQL spec (review r3)."""
    q = parse_graphql('{ product(where: {name: {eq: "caf\\u00e9"}}) { sku } }')
    assert q.selections[0].args["where"]["name"]["eq"] == "café"


def test_nonnumeric_filter_value_shapes_as_empty(store):
    """A non-numeric value on a numeric operator excludes all rows (the
    reference's per-row float() ValueError path), never crashes plan
    build (review r3)."""
    from trustgraph_spark.graphql import structured_query

    out = structured_query(
        store, SCHEMAS, "q",
        lambda q: ('{ product(where: {price: {gt: "abc"}}) { sku } }', {}),
    )
    assert out["errors"] == [] and out["data"]["product"].count() == 0


def test_surrogate_pair_escape_decodes(store):
    q = parse_graphql('{ product(where: {name: {eq: "\\ud83d\\ude00"}}) { sku } }')
    v = q.selections[0].args["where"]["name"]["eq"]
    assert v == "😀" and v.encode("utf-8")  # encodable, no lone surrogates


def test_fractional_limit_rejected(store):
    with pytest.raises(GraphQLError):
        graphql_rows_query(store, SCHEMAS, "{ product(limit: 2.9) { sku } }")
    # integral float is fine (GraphQL Int coercion accepts 3.0)
    out = graphql_rows_query(store, SCHEMAS, "{ product(limit: 3.0) { sku } }")
    assert out["product"].count() == 3


# --- fragments (strawberry/graphql-core behavior) ---------------------------


def test_fragment_spread_parses_and_merges():
    q = parse_graphql(
        """
        query { product { ...ids name } }
        fragment ids on Product { sku name }
        """
    )
    # field merging: first-occurrence order, duplicate 'name' collapsed
    assert q.selections[0].fields == ["sku", "name"]


def test_fragment_defined_before_operation_and_nested():
    q = parse_graphql(
        """
        fragment core on product { sku ...more }
        fragment more on PRODUCT { price qty }
        { product { ...core } }
        """
    )
    assert q.selections[0].fields == ["sku", "price", "qty"]


def test_inline_fragment():
    q = parse_graphql("{ product { ... on Product { sku price } name } }")
    assert q.selections[0].fields == ["sku", "price", "name"]


def test_fragment_validation_errors():
    with pytest.raises(GraphQLError, match="unknown fragment"):
        parse_graphql("{ product { ...nope } }")
    with pytest.raises(GraphQLError, match="never used"):
        parse_graphql(
            "{ product { sku } } fragment unused on Product { name }"
        )
    with pytest.raises(GraphQLError, match="cycle"):
        parse_graphql(
            """
            { product { ...a } }
            fragment a on Product { ...b }
            fragment b on Product { ...a }
            """
        )
    with pytest.raises(GraphQLError, match="duplicate fragment"):
        parse_graphql(
            """
            { product { ...a } }
            fragment a on Product { sku }
            fragment a on Product { name }
            """
        )
    # type condition must match the enclosing root field's schema
    with pytest.raises(GraphQLError, match="cannot be spread"):
        parse_graphql(
            "{ product { ...c } } fragment c on Customer { sku }"
        )
    with pytest.raises(GraphQLError, match="not supported at the root"):
        parse_graphql(
            "{ ...r } fragment r on Query { product { sku } }"
        )


def test_fragment_execution_against_store(store):
    out = graphql_rows_query(
        store,
        SCHEMAS,
        """
        query {
          product(where: {price: {gt: 50}}, order_by: "name") {
            ...cols
          }
        }
        fragment cols on Product { sku price }
        """,
    )
    rows = out["product"].collect()
    assert [(r.sku, r.price) for r in rows] == [("s2", 120.0), ("s4", 80.0)]
