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


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: closed sessions across
    micro-batches equal the batch sessionization of the same events
    (minus each user's final, still-open session)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from trustgraph_spark.streaming import sessionize_stream

    # two users, sessions separated by > gap; files delivered in ts order
    rows = []
    t0 = 1_700_000_000
    for u, base in (("u1", t0), ("u2", t0 + 17)):
        for s in range(3):  # 3 sessions; the 3rd stays open
            start = base + s * 10_000
            for i in range(4):
                rows.append((u, start + i * 60, 1.5))
    src = str(tmp_path / "events_src")
    import os

    os.makedirs(src)
    # write in 3 time-ordered files so micro-batches respect event order
    rows.sort(key=lambda r: r[1])
    per = len(rows) // 3
    for i in range(3):
        chunk = rows[i * per : (i + 1) * per if i < 2 else len(rows)]
        spark.createDataFrame(
            [(u, ts, v) for (u, ts, v) in chunk], "user_id string, epoch long, value double"
        ).select(
            "user_id", F.timestamp_seconds("epoch").alias("ts"), "value"
        ).coalesce(1).write.mode("append" if i else "overwrite").parquet(src)

    stream = (
        spark.readStream.schema("user_id string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_sec=1800)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    # expected: per user, sessions 1 and 2 closed (4 events, 6.0 value each)
    expected = set()
    for u, base in (("u1", t0), ("u2", t0 + 17)):
        for s in range(2):
            expected.add((u, base + s * 10_000, 4, 6.0))
    assert got == expected
