"""Incremental / streaming ingestion.

The reference's "streaming" is pub/sub transport (Pulsar/Kafka), not
event-time processing — there are no watermarks or windows anywhere in it
(SURVEY.md §2.8). The Spark-native equivalent of its at-least-once queue
consumption is Structured Streaming over an append-only transcripts source
with ``foreachBatch`` running the SAME batch pipeline per micro-batch —
one code path for batch and streaming, checkpointed offsets for resume
(the analog of consumer offsets + librarian document state).

On a real deployment the source is Kafka (`readStream.format("kafka")`) or
an Iceberg streaming read; here a file/parquet directory source with
``availableNow`` demonstrates the identical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.chunking import assemble_turn_chunks
from .operators.extract import (
    RuleExtractor,
    definitions_to_triples,
    extract_all,
    relationships_to_triples,
    split_extractions,
)
from .operators.materialize import QUAD_KEY, materialize_edges
from .schema import TRANSCRIPTS_SCHEMA


def read_transcript_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """Append-only parquet directory as a stream (files-per-trigger bounds
    micro-batch size; swap for kafka/iceberg source in production)."""
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )


def start_ingest(
    stream: DataFrame,
    edges_path: str,
    checkpoint_dir: str,
    extractor=None,
    collection: str = "default",
):
    """transcripts stream -> per-micro-batch KG construction appended to the
    edges table. foreachBatch = exactly-once per micro-batch against a
    transactional sink (Iceberg append in production; parquet append here).
    Global dedup across batches stays an owned compaction concern (the
    reference's Cassandra PK dedups on write; on Iceberg this is a MERGE)."""
    ex = extractor or RuleExtractor()

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        chunks = assemble_turn_chunks(batch_df, collection)
        defs, rels = split_extractions(extract_all(chunks, ex))
        content = definitions_to_triples(defs).unionByName(
            relationships_to_triples(rels)
        )
        edges = materialize_edges(content)
        edges.write.mode("append").parquet(edges_path)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_edges(spark: SparkSession, edges_path: str, out_path: str) -> DataFrame:
    """Cross-batch dedup compaction (the Cassandra-PK-upsert analog for an
    append-only file sink): read all appended batches, dropDuplicates on the
    quad key, rewrite."""
    edges = spark.read.parquet(edges_path).dropDuplicates(QUAD_KEY)
    edges.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
