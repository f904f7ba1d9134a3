"""Structured rows store + query (the reference's `storage/rows` /
`query/rows` pair re-expressed as DataFrame programs).

Reference behavior reproduced (not code):
- storage/rows/cassandra/write.py:268-279 — the unified rows layout
  (collection, schema_name, index_name, index_value list<text>, row_id,
  data map<text,text>, source) with PRIMARY KEY ((collection,
  schema_name, index_name), index_value, row_id): each logical row is
  written ONCE PER INDEX so any indexed field can serve as the partition
  key of a point lookup.
- write.py:307-323 — index names = primary fields + indexed fields in
  schema order; :364-370 row_id = first primary field's value ('' when
  absent); :372-385 index_value = per-field stringified values ('' for
  null), rows with all-empty index values skipped for that index;
  :446-460 data map keeps only non-null fields, stringified.
- query/rows/cassandra/service.py:224-247 — index selection: the FIRST
  indexed field carrying a non-empty exact-match filter; :273-344 direct
  partition lookup when an index matches, full scan of the first index
  otherwise; :363-434 post-filter operators parsed from `field_op` key
  suffixes (eq gt gte lt lte contains in not startsWith endsWith not_in;
  numeric ops compare as floats, everything else as strings; a row
  missing the field, or failing the float parse, is excluded);
  :350-358 sort AFTER fetch by the field's string value.

Spark mapping: the Cassandra partition key becomes a parquet PARTITION
layout — store with Warehouse.write(df, "rows", partition_by=
["collection", "schema_name", "index_name"]) and a point query prunes to
one directory then filters index_value, the same I/O shape as a Cassandra
partition read.  The per-index write amplification is the reference's own
denormalization (one copy per index) — at 100 TB that's a deliberate
trade: storage x n_indexes buys partition-pruned point lookups with no
secondary-index infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: filter-key operator suffixes (service.py:377-380)
_OPS = (
    "gt", "gte", "lt", "lte", "contains", "in", "not", "startsWith",
    "endsWith", "not_in",
)


def index_names_for(fields: list[dict]) -> list[str]:
    """primary + indexed fields in schema order (write.py:307-323)."""
    out = []
    for f in fields:
        if f.get("primary") or f.get("indexed"):
            out.append(f["name"])
    return out


def rows_store(
    validated: DataFrame,
    fields: list[dict],
    schema_name: str,
    collection: str = "default",
    source_col: str | None = None,
    upsert_order_col: str | None = None,
) -> DataFrame:
    """validate_rows output -> the unified rows store layout, one output
    row per (logical row x index).  Input: one string column per schema
    field plus _valid (operators/extract_extras.validate_rows); invalid
    rows are dropped (the reference never reaches the writer with them).

    upsert_order_col: when given, reproduce the Cassandra PRIMARY-KEY
    upsert — two writes landing on the same (collection, schema_name,
    index_name, index_value, row_id) keep only the LAST one, where "last"
    is the max of this column (batch needs an explicit write order; the
    reference's is insertion time).  None keeps every copy (append log).

    Pure column program: the data map, row_id, and the per-index explode
    are all built-in expressions — no UDF, one narrow pass; the optional
    upsert adds one shuffle on the PK.
    """
    idx_names = index_names_for(fields)
    if not idx_names:
        raise ValueError(
            f"schema {schema_name} has no indexed fields - rows would not "
            f"be queryable (write.py:434-437 warns and drops)"
        )
    primary = next((f["name"] for f in fields if f.get("primary")), None)

    # data map: only non-null values (write.py:448-452)
    kv = []
    for f in fields:
        kv.append(
            F.when(
                F.col(f["name"]).isNotNull(),
                F.struct(
                    F.lit(f["name"]).alias("key"),
                    F.col(f["name"]).alias("value"),
                ),
            )
        )
    data_map = F.map_from_entries(
        F.filter(F.array(*kv), lambda e: e.isNotNull())
    )

    # one entry per index; index_value '' for null (build_index_value),
    # all-empty index values skipped (write.py:460-466)
    idx_entries = F.array(
        *[
            F.struct(
                F.lit(n).alias("index_name"),
                F.array(F.coalesce(F.col(n), F.lit(""))).alias("index_value"),
            )
            for n in idx_names
        ]
    )

    base = validated.where(F.col("_valid")).select(
        F.lit(collection).alias("collection"),
        F.lit(schema_name).alias("schema_name"),
        data_map.alias("data"),
        (
            F.coalesce(F.col(primary), F.lit(""))
            if primary
            else F.lit("")
        ).alias("row_id"),
        (F.col(source_col) if source_col else F.lit("")).alias("source"),
        *([F.col(upsert_order_col).alias("_ord")] if upsert_order_col else []),
        F.explode(idx_entries).alias("idx"),
    )
    out = base.select(
        "collection",
        "schema_name",
        F.col("idx.index_name").alias("index_name"),
        F.col("idx.index_value").alias("index_value"),
        "row_id",
        "data",
        "source",
        *(["_ord"] if upsert_order_col else []),
    ).where(F.exists("index_value", lambda v: v != ""))
    if upsert_order_col:
        from pyspark.sql import Window

        w = Window.partitionBy(
            "collection", "schema_name", "index_name", "index_value", "row_id"
        ).orderBy(F.desc("_ord"))
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_ord")
        )
    return out


def row_embeddings_store(
    validated: DataFrame,
    fields: list[dict],
    schema_name: str,
    collection: str = "default",
    embedder=None,
) -> DataFrame:
    """Row embeddings, stages 1+2 (embeddings/row_embeddings/
    embeddings.py:145-218 + storage/row_embeddings/qdrant/write.py):
    for each INDEXED field (primary alone does not qualify here, unlike
    the rows store — get_index_names at embeddings.py:145-151 checks only
    field.indexed), build the index_value list per row, skip all-empty
    values, embed the space-joined text — ONE embedding per DISTINCT text
    (the reference dedupes texts before calling the embedder; the
    first-seen (index_name, index_value) is kept — reproduced
    deterministically as the min struct).  Output: (collection,
    schema_name, index_name, index_value, text, vector)."""
    idx_names = [f["name"] for f in fields if f.get("indexed")]
    if not idx_names:
        raise ValueError(
            f"schema {schema_name} has no indexed fields - nothing to embed"
        )
    entries = F.array(
        *[
            F.struct(
                F.lit(n).alias("index_name"),
                F.array(F.coalesce(F.col(n), F.lit(""))).alias("index_value"),
            )
            for n in idx_names
        ]
    )
    exploded = (
        validated.where(F.col("_valid"))
        .select(F.explode(entries).alias("e"))
        .select("e.index_name", "e.index_value")
        .where(F.exists("index_value", lambda v: v != ""))
        .withColumn("text", F.array_join("index_value", " "))
    )
    deduped = exploded.groupBy("text").agg(
        F.min(F.struct("index_name", "index_value")).alias("m")
    )
    from .embeddings import embed_texts

    emb = embed_texts(deduped, text_col="text", out_col="vector", embedder=embedder)
    return emb.select(
        F.lit(collection).alias("collection"),
        F.lit(schema_name).alias("schema_name"),
        F.col("m.index_name").alias("index_name"),
        F.col("m.index_value").alias("index_value"),
        "text",
        "vector",
    )


def row_embeddings_query(
    store: DataFrame,
    queries: DataFrame,
    limit: int = 10,
    schema_name: str | None = None,
    collection: str | None = "default",
    index_name: str | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
) -> DataFrame:
    """Semantic row-index lookup (query/row_embeddings/qdrant/
    service.py:103-150): per query vector, the ``limit`` closest embedded
    index texts, optionally restricted to one index_name (the reference's
    Qdrant payload filter), returning (index_name, index_value, text,
    score) for the subsequent rows-store point lookups.  Same
    batch-broadcast shape as the chunk-embeddings query."""
    from pyspark.sql import Window

    from .embeddings import _cosine_expr

    src = store
    if collection is not None and "collection" in store.columns:
        src = src.where(F.col("collection") == collection)
    if schema_name is not None and "schema_name" in store.columns:
        src = src.where(F.col("schema_name") == schema_name)
    if index_name is not None:
        src = src.where(F.col("index_name") == index_name)
    joined = src.alias("v").join(
        F.broadcast(queries.select(query_id_col, query_vec_col).alias("q"))
    )
    scored = joined.select(
        F.col(f"q.{query_id_col}").alias("query_id"),
        F.col("v.index_name").alias("index_name"),
        F.col("v.index_value").alias("index_value"),
        F.col("v.text").alias("text"),
        _cosine_expr(F.col("v.vector"), F.col(f"q.{query_vec_col}")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("text"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= limit)
    )


def _parse_filter_key(key: str) -> tuple[str, str]:
    """'price_gt' -> ('price', 'gt'); bare key -> eq (service.py:374-385).
    '_not_in' is matched before the single-token rsplit — the reference's
    rsplit('_', 1) can never produce 'not_in' (it yields field 'x_not' op
    'in'), a latent bug its own operator list contradicts; we implement
    the documented intent."""
    if key.endswith("_not_in"):
        return key[: -len("_not_in")], "not_in"
    if "_" in key:
        field, op = key.rsplit("_", 1)
        if op in _OPS:
            return field, op
    return key, "eq"


def _filter_cond(field: str, op: str, val) -> F.Column:
    """One post-filter predicate over the data map (service.py:390-427).
    Numeric ops mirror the reference's float() comparison — try_cast
    yields NULL on a non-numeric value, which (like the reference's
    ValueError path) excludes the row.  A row missing the field is
    excluded by the isNotNull guard."""
    c = F.col("data").getItem(field)
    if op == "eq":
        cond = c == str(val)
    elif op in ("gt", "gte", "lt", "lte"):
        n = c.try_cast("double")  # ANSI-safe: malformed -> NULL -> excluded
        try:
            v = F.lit(float(val))
        except (TypeError, ValueError):
            # non-numeric FILTER VALUE: the reference's per-row float()
            # raises and excludes every row (service.py:394-427) — the
            # plan-time equivalent is a constant-false predicate, not a
            # crash at plan build
            return F.lit(False)
        cond = {"gt": n > v, "gte": n >= v, "lt": n < v, "lte": n <= v}[op]
    elif op == "contains":
        cond = c.contains(str(val))
    elif op == "in":
        cond = c.isin([str(v) for v in val])
    elif op == "not":
        cond = c != str(val)
    elif op == "startsWith":
        cond = c.startswith(str(val))
    elif op == "endsWith":
        cond = c.endswith(str(val))
    elif op == "not_in":
        cond = ~c.isin([str(v) for v in val])
    else:
        raise ValueError(f"unknown filter operator {op!r}")
    return c.isNotNull() & cond


def rows_query(
    store: DataFrame,
    fields: list[dict],
    schema_name: str,
    filters: dict | None = None,
    collection: str = "default",
    limit: int = 100,
    order_by: str | None = None,
    direction: str = "asc",
) -> DataFrame:
    """Query the unified rows store (service.py query_cassandra):

    1. index selection — the first indexed field with a non-empty exact
       eq filter becomes the partition: collection/schema_name/index_name
       pruned at the scan plus an index_value equality (the Cassandra
       point-lookup analog).  No match -> scan the FIRST index (each
       logical row appears once per index, so one index covers all rows).
    2. post-filter — every filter re-checked against the data map with
       the `field_op` suffix operators.
    3. limit in clustering order (index_value, row_id — the Cassandra
       page order; a content tiebreaker — source + key-sorted data JSON —
       keeps the cut deterministic even in append-log mode, where
       duplicate (index_value, row_id) rows exist because the store was
       built without upsert_order_col), THEN sort by the order_by field's
       string value (service.py:350-358 sorts after fetch).

    Returns one string column per schema field (the reference's row_dict)
    plus source."""
    filters = filters or {}
    idx_names = index_names_for(fields)
    if not idx_names:
        return store.sparkSession.createDataFrame(
            [], "source string"
        ).limit(0)

    # index selection considers only bare eq filters on indexed fields
    index_match = None
    for n in idx_names:
        if n in filters and filters[n] not in (None, ""):
            index_match = (n, [str(filters[n])])
            break

    if index_match:
        iname, ival = index_match
        scan = store.where(
            (F.col("collection") == collection)
            & (F.col("schema_name") == schema_name)
            & (F.col("index_name") == iname)
            & (F.col("index_value") == F.array(*[F.lit(v) for v in ival]))
        )
    else:
        scan = store.where(
            (F.col("collection") == collection)
            & (F.col("schema_name") == schema_name)
            & (F.col("index_name") == idx_names[0])
        )

    cond = F.lit(True)
    for key, val in filters.items():
        if val is None:
            continue
        fld, op = _parse_filter_key(key)
        cond = cond & _filter_cond(fld, op, val)
    matched = scan.where(cond)

    if limit:
        # (index_value, row_id) is unique only in upsert mode; append-log
        # stores keep duplicate PK rows, so break ties on content (sorted
        # map entries — map iteration order itself is not deterministic)
        # to make the limit cut stable across runs
        matched = matched.orderBy(
            "index_value",
            "row_id",
            "source",
            F.to_json(F.array_sort(F.map_entries("data"))),
        ).limit(limit)

    out = matched.select(
        *[F.col("data").getItem(f["name"]).alias(f["name"]) for f in fields],
        "source",
    )
    if order_by:
        key = F.coalesce(F.col(order_by), F.lit(""))
        out = out.orderBy(key.desc() if direction == "desc" else key.asc())
    return out
