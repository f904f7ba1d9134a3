"""Structured rows store/query vs the reference's unified-table semantics
(storage/rows/cassandra/write.py, query/rows/cassandra/service.py)."""

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.extract_extras import validate_rows
from trustgraph_spark.operators.rows import (
    index_names_for,
    rows_query,
    rows_store,
)

FIELDS = [
    {"name": "sku", "type": "string", "primary": True},
    {"name": "name", "type": "string", "indexed": True},
    {"name": "price", "type": "string"},
    {"name": "category", "type": "string", "indexed": True,
     "enum_values": ["tool", "toy"]},
]

ROWS = [
    '{"sku": "s1", "name": "hammer", "price": "9.5", "category": "tool"}',
    '{"sku": "s2", "name": "drill", "price": "120", "category": "tool"}',
    '{"sku": "s3", "name": "yo-yo", "price": "3", "category": "toy"}',
    '{"sku": "s4", "name": "saw", "price": "15", "category": "tool"}',
    '{"sku": "", "name": "invalid", "price": "1", "category": "tool"}',
    '{"sku": "s5", "name": "kite", "price": "bad", "category": "toy"}',
    '{"sku": "s6", "name": null, "price": "7", "category": "tool"}',
]


@pytest.fixture(scope="module")
def store(spark):
    objs = spark.createDataFrame([(r,) for r in ROWS], "obj_json string")
    validated = validate_rows(objs, FIELDS)
    st = rows_store(
        validated, FIELDS, schema_name="product", collection="shop"
    ).cache()
    st.count()
    return st


def test_index_names_order():
    assert index_names_for(FIELDS) == ["sku", "name", "category"]


def test_store_layout_one_copy_per_index(store):
    rows = store.collect()
    # 6 valid logical rows; s6 has null name -> its 'name' index entry is
    # skipped (all-empty index_value) => 6*3 - 1 = 17
    assert len(rows) == 17
    by_idx = {}
    for r in rows:
        by_idx.setdefault(r.index_name, []).append(r)
    assert sorted(by_idx) == ["category", "name", "sku"]
    assert len(by_idx["sku"]) == 6 and len(by_idx["name"]) == 5
    # row_id is the primary field's value; data map drops null fields
    h = next(r for r in by_idx["sku"] if r.index_value == ["s1"])
    assert h.row_id == "s1" and h.collection == "shop"
    assert h.data == {"sku": "s1", "name": "hammer", "price": "9.5",
                      "category": "tool"}
    s6 = next(r for r in by_idx["sku"] if r.index_value == ["s6"])
    assert "name" not in s6.data


def test_store_requires_an_index(spark):
    objs = spark.createDataFrame([(ROWS[0],)], "obj_json string")
    v = validate_rows(objs, [{"name": "x", "type": "string"}])
    with pytest.raises(ValueError):
        rows_store(v, [{"name": "x", "type": "string"}], "s")


def test_query_point_lookup_on_index(store):
    out = rows_query(
        store, FIELDS, "product", {"sku": "s2"}, collection="shop"
    ).collect()
    assert len(out) == 1 and out[0].name == "drill"
    # second indexed field works too
    out2 = rows_query(
        store, FIELDS, "product", {"name": "saw"}, collection="shop"
    ).collect()
    assert [r.sku for r in out2] == ["s4"]


def test_query_scan_with_operator_filters(store):
    got = rows_query(
        store, FIELDS, "product", {"price_gt": 5, "price_lte": 120},
        collection="shop",
    ).collect()
    # numeric filters: s1 9.5, s2 120, s4 15, s6 7 qualify; 'bad' float
    # parse fails -> excluded (reference ValueError path)
    assert sorted(r.sku for r in got) == ["s1", "s2", "s4", "s6"]


def test_query_string_operators(store):
    assert sorted(
        r.sku
        for r in rows_query(
            store, FIELDS, "product", {"name_contains": "r"}, collection="shop"
        ).collect()
    ) == ["s1", "s2"]
    assert [
        r.sku
        for r in rows_query(
            store, FIELDS, "product", {"name_startsWith": "dr"},
            collection="shop",
        ).collect()
    ] == ["s2"]
    assert sorted(
        r.sku
        for r in rows_query(
            store, FIELDS, "product",
            {"category": "tool", "name_not": "hammer"}, collection="shop",
        ).collect()
    ) == ["s2", "s4"]  # s6 has no name -> excluded (service.py:387-389)
    assert sorted(
        r.sku
        for r in rows_query(
            store, FIELDS, "product", {"sku_in": ["s1", "s3", "nope"]},
            collection="shop",
        ).collect()
    ) == ["s1", "s3"]
    assert sorted(
        r.sku
        for r in rows_query(
            store, FIELDS, "product",
            {"category": "toy", "sku_not_in": ["s3"]}, collection="shop",
        ).collect()
    ) == ["s5"]


def test_query_missing_field_excludes_row(store):
    # s6 has no 'name' in its data map -> excluded by any name filter
    got = rows_query(
        store, FIELDS, "product", {"name_contains": ""}, collection="shop"
    ).collect()
    assert "s6" not in {r.sku for r in got}


def test_query_order_and_limit(store):
    got = rows_query(
        store, FIELDS, "product", {"category": "tool"}, collection="shop",
        order_by="price", direction="desc",
    ).collect()
    # string sort (reference sorts str values): '9.5' > '7' > '15' > '120'
    assert [r.sku for r in got] == ["s1", "s6", "s4", "s2"]
    lim = rows_query(
        store, FIELDS, "product", {}, collection="shop", limit=2
    ).collect()
    # limit applies in clustering order (index_value, row_id) on the
    # first index (sku): s1, s2
    assert sorted(r.sku for r in lim) == ["s1", "s2"]


def test_query_wrong_collection_empty(store):
    assert (
        rows_query(store, FIELDS, "product", {"sku": "s1"},
                   collection="other").count() == 0
    )


def test_partition_pruned_scan(spark, store, tmp_path):
    """The parquet layout prunes to one (collection, schema_name,
    index_name) directory for a point lookup — the Cassandra partition-key
    analog (PartitionFilters in the scan, not a post-scan filter)."""
    path = str(tmp_path / "rows_store")
    store.write.mode("overwrite").partitionBy(
        "collection", "schema_name", "index_name"
    ).parquet(path)
    df = spark.read.parquet(path)
    q = rows_query(df, FIELDS, "product", {"sku": "s2"}, collection="shop")
    phys = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in phys
    pf = phys.split("PartitionFilters")[1][:400]
    for col in ("collection", "schema_name", "index_name"):
        assert col in pf, f"partition filter on {col} missing: {pf}"
    assert [r.name for r in q.collect()] == ["drill"]


def test_upsert_last_write_wins(spark):
    """Two rows landing on the same PK (index_value, row_id) keep only the
    last write per upsert_order_col — the Cassandra PRIMARY KEY upsert."""
    objs = spark.createDataFrame(
        [
            (1, '{"sku": "s1", "name": "old", "price": "1", "category": "tool"}'),
            (2, '{"sku": "s1", "name": "new", "price": "2", "category": "tool"}'),
            (3, '{"sku": "s2", "name": "x", "price": "5", "category": "toy"}'),
        ],
        "seq long, obj_json string",
    )
    v = validate_rows(objs, FIELDS)
    st = rows_store(v, FIELDS, "product", upsert_order_col="seq")
    sku_idx = {
        tuple(r.index_value): r.data
        for r in st.where(F.col("index_name") == "sku").collect()
    }
    assert sku_idx[("s1",)]["name"] == "new"
    assert sku_idx[("s1",)]["price"] == "2"
    # the 'name' index keys on (name, row_id) -> 'old' and 'new' are
    # DIFFERENT keys there, both survive (exactly Cassandra's behavior:
    # stale index copies linger under their old index_value)
    names = {tuple(r.index_value) for r in st.where(F.col("index_name") == "name").collect()}
    assert {("old",), ("new",)} <= names


def test_row_embeddings_store_and_query(spark):
    """Row-embeddings family: one embedding per DISTINCT index text
    (embeddings.py:203-218 dedup), indexed-only fields, all-empty values
    skipped; query returns (index_name, index_value) matches with an
    optional index_name payload filter."""
    from trustgraph_spark.operators.embeddings import HashEmbedder
    from trustgraph_spark.operators.rows import (
        row_embeddings_query,
        row_embeddings_store,
    )
    import pandas as pd

    objs = spark.createDataFrame(
        [
            ('{"sku": "s1", "name": "hammer", "price": "1", "category": "tool"}',),
            ('{"sku": "s2", "name": "hammer", "price": "2", "category": "tool"}',),
            ('{"sku": "s3", "name": "drill", "price": "3", "category": "toy"}',),
            ('{"sku": "s4", "name": null, "price": "4", "category": "toy"}',),
        ],
        "obj_json string",
    )
    v = validate_rows(objs, FIELDS)
    st = row_embeddings_store(v, FIELDS, "product", embedder=HashEmbedder(dim=16)).cache()
    rows = st.collect()
    # indexed fields are name + category (sku is primary-only -> excluded
    # here, unlike the rows store); distinct texts: hammer, drill, tool, toy
    assert sorted(r.text for r in rows) == ["drill", "hammer", "tool", "toy"]
    by_text = {r.text: r for r in rows}
    assert by_text["hammer"].index_name == "name"
    assert by_text["hammer"].index_value == ["hammer"]
    assert by_text["tool"].index_name == "category"

    emb = HashEmbedder(dim=16)
    qv = emb.embed(pd.Series(["drill", "tool"]))
    queries = spark.createDataFrame(
        [("q0", [float(x) for x in qv[0]]), ("q1", [float(x) for x in qv[1]])],
        "query_id string, query_vector array<float>",
    )
    out = row_embeddings_query(st, queries, limit=1, schema_name="product")
    got = {r.query_id: (r.index_name, r.index_value, round(r.score, 4))
           for r in out.collect()}
    assert got["q0"] == ("name", ["drill"], 1.0)
    assert got["q1"] == ("category", ["tool"], 1.0)

    # index_name payload filter restricts the search space
    only_cat = row_embeddings_query(
        st, queries, limit=1, schema_name="product", index_name="category"
    ).collect()
    assert all(r.index_name == "category" for r in only_cat)

    # no indexed fields -> error
    with pytest.raises(ValueError):
        row_embeddings_store(v, [{"name": "x", "primary": True}], "s")
