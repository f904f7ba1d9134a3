"""Structured Streaming ingest: incremental micro-batch KG construction with
checkpointed resume, equivalent output to the batch pipeline."""

import os

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.chunking import assemble_turn_chunks
from trustgraph_spark.operators.extract import (
    RuleExtractor,
    definitions_to_triples,
    extract_all,
    relationships_to_triples,
    split_extractions,
)
from trustgraph_spark.operators.materialize import materialize_edges
from trustgraph_spark.streaming import (
    compact_edges,
    read_transcript_stream,
    start_ingest,
)
from trustgraph_spark.synth import SynthSpec, synth_transcripts


def _write_source(spark, tmp, n_convs, offset=0):
    tr = synth_transcripts(spark, SynthSpec(n_convs=n_convs, turns_per_conv=6, hot_factor=2))
    tr.write.mode("append").parquet(f"{tmp}/src")
    return tr


def test_streaming_matches_batch(spark, tmp_path):
    tmp = str(tmp_path)
    tr = _write_source(spark, tmp, n_convs=10)

    stream = read_transcript_stream(spark, f"{tmp}/src")
    q = start_ingest(stream, f"{tmp}/edges", f"{tmp}/ckpt")
    q.awaitTermination(120)

    streamed = compact_edges(spark, f"{tmp}/edges", f"{tmp}/edges_compact")

    # batch reference over the same input
    src = spark.read.parquet(f"{tmp}/src")
    defs, rels = split_extractions(extract_all(assemble_turn_chunks(src), RuleExtractor()))
    batch_edges = materialize_edges(
        definitions_to_triples(defs).unionByName(relationships_to_triples(rels))
    )

    assert streamed.exceptAll(batch_edges).count() == 0
    assert batch_edges.exceptAll(streamed).count() == 0


def test_streaming_resume_processes_only_new_files(spark, tmp_path):
    tmp = str(tmp_path)
    _write_source(spark, tmp, n_convs=5)
    stream = read_transcript_stream(spark, f"{tmp}/src")
    q = start_ingest(stream, f"{tmp}/edges", f"{tmp}/ckpt")
    q.awaitTermination(120)
    n1 = spark.read.parquet(f"{tmp}/edges").count()

    # restart with the same checkpoint: no new input files -> no new rows
    stream2 = read_transcript_stream(spark, f"{tmp}/src")
    q2 = start_ingest(stream2, f"{tmp}/edges", f"{tmp}/ckpt")
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{tmp}/edges").count() == n1
