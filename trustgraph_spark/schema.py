"""Table schemas for the KG-construction engine.

Derived from the reference message dataclasses
(trustgraph-base/trustgraph/schema/core/primitives.py:17-54,
schema/knowledge/document.py:32-39, schema/knowledge/graph.py:10-30,
schema/knowledge/embeddings.py:10-21) and the Cassandra quad-store layout
(trustgraph-flow/trustgraph/direct/cassandra_kg.py:531-650), re-expressed
as flat columnar StructTypes. The flattened storage form (value + otype +
dtype + lang) follows storage/triples/cassandra/write.py:57-110.
"""

from pyspark.sql import types as T

# Input: Iceberg/parquet table of multi-turn transcripts (BASELINE input_hint).
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Turn assembly output; 1 turn = 1 chunk (per-turn text equality invariant).
# Mirrors reference Chunk + Metadata envelope.
CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("root_id", T.StringType(), False),
        T.StructField("collection", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

# Flattened triple/quad rows, pre-dedup (with chunk provenance columns).
TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("collection", T.StringType(), False),
        T.StructField("g", T.StringType(), False),  # "" = default graph
        T.StructField("s", T.StringType(), False),
        T.StructField("p", T.StringType(), False),
        T.StructField("o", T.StringType(), False),
        T.StructField("otype", T.StringType(), False),  # u / l / t
        T.StructField("dtype", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("chunk_id", T.StringType(), True),
        T.StructField("root_id", T.StringType(), True),
    ]
)

# Deduped quad store (the "collection manifest" analog, cassandra_kg.py:627-639).
EDGES_SCHEMA = T.StructType([f for f in TRIPLES_SCHEMA.fields if f.name not in ("chunk_id", "root_id")])

# Entity-centric role index (cassandra_kg.py:744-802 write amplification).
QUADS_BY_ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("collection", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("role", T.StringType(), False),  # S / P / O / G
        T.StructField("g", T.StringType(), False),
        T.StructField("s", T.StringType(), False),
        T.StructField("p", T.StringType(), False),
        T.StructField("o", T.StringType(), False),
        T.StructField("otype", T.StringType(), False),
        T.StructField("dtype", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

# EntityContext rows (schema/knowledge/graph.py:10-21).
ENTITY_CONTEXTS_SCHEMA = T.StructType(
    [
        T.StructField("collection", T.StringType(), False),
        T.StructField("entity_uri", T.StringType(), False),
        T.StructField("context", T.StringType(), False),
        T.StructField("chunk_id", T.StringType(), False),
    ]
)

# GraphEmbeddings rows (schema/knowledge/embeddings.py:10-21).
ENTITY_EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("collection", T.StringType(), False),
        T.StructField("entity_uri", T.StringType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
        T.StructField("chunk_id", T.StringType(), False),
    ]
)

NODES_SCHEMA = T.StructType(
    [
        T.StructField("collection", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("degree", T.LongType(), False),
    ]
)

# Per-stage lineage/metrics rows (north_rule resumability requirement).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("input_fingerprint", T.StringType(), False),
        T.StructField("output_rows", T.LongType(), False),
        T.StructField("num_partitions", T.IntegerType(), False),
        T.StructField("wall_sec", T.DoubleType(), False),
        T.StructField("extra", T.StringType(), True),  # JSON metrics blob
    ]
)
