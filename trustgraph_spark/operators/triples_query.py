"""Triple-pattern queries over the materialized graph (Q1-Q3, SURVEY.md §2.4).

The reference dispatches 8 ways on (s?, p?, o?) presence to per-pattern
Cassandra reads (query/triples/cassandra/service.py:203-314,
direct/cassandra_kg.py:810-1000). In Spark all 16 quad patterns are the
SAME function: a filtered scan of the edges table — Catalyst pushes the
predicates into the parquet/Iceberg scan and prunes partitions; the
entity-centric quads_by_entity layout serves the "all quads touching X"
access path without a 3-way OR scan.

Graph filter semantics (service.py): g=None -> all graphs; g="" -> default
graph only; g=<uri> -> that named graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import DEFAULT_GRAPH


def match_triples(
    edges: DataFrame,
    s: str | None = None,
    p: str | None = None,
    o: str | None = None,
    g: str | None = None,
    collection: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """The 8-way (16 with g) pattern dispatch collapsed to one declarative
    filter; LIMIT propagates into the scan (limit pushdown)."""
    df = edges
    if collection is not None:
        df = df.where(F.col("collection") == collection)
    if g is not None:
        df = df.where(F.col("g") == g)
    if s is not None:
        df = df.where(F.col("s") == s)
    if p is not None:
        df = df.where(F.col("p") == p)
    if o is not None:
        df = df.where(F.col("o") == o)
    if limit is not None:
        df = df.limit(limit)
    return df


def quads_for_entity(
    quads_by_entity: DataFrame,
    entity: str,
    role: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """All quads touching an entity in any role (the reference's
    entity-centric single-partition read, cassandra_kg.py:810-860) —
    one partition-prunable equality filter on the role-exploded table."""
    df = quads_by_entity.where(F.col("entity") == entity)
    if role is not None:
        df = df.where(F.col("role") == role)
    if limit is not None:
        df = df.limit(limit)
    return df


def reconstruct_term(value_col, otype_col, dtype_col=None, lang_col=None):
    """Term reconstruction heuristics (Q3, service.py:73-151): otype drives
    the tag; bare strings starting http(s):// are treated as IRIs in
    fallback paths. Returns a struct column (type, value, datatype, language).
    """
    dtype = dtype_col if dtype_col is not None else F.lit("")
    lang = lang_col if lang_col is not None else F.lit("")
    is_uri = (otype_col == "u") | (
        (otype_col.isNull()) & value_col.rlike("^https?://")
    )
    term_type = (
        F.when(is_uri, F.lit("i"))
        .when(otype_col == "t", F.lit("t"))
        .otherwise(F.lit("l"))
    )
    return F.struct(
        term_type.alias("type"),
        value_col.alias("value"),
        dtype.alias("datatype"),
        lang.alias("language"),
    )
