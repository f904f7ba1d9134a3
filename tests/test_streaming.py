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


def test_watermarked_window_agg_matches_batch(spark, tmp_path):
    """Append-mode watermarked windowed agg: windows closed by the
    watermark match the batch groupBy; a late-but-inside-watermark event
    is counted, and windows the watermark hasn't passed are not emitted."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from trustgraph_spark.streaming import window_agg_stream

    t0 = 1_700_000_000 - (1_700_000_000 % 3600)  # hour-aligned
    # file 1: hour-0 events + one hour-1 event; file 2: a LATE hour-0 event
    # (inside the 2h watermark) + hour-4 events that advance the watermark
    # past hours 0 and 1
    f1 = [(t0 + 60, "click", 1.0), (t0 + 120, "click", 2.0),
          (t0 + 300, "view", 1.5), (t0 + 3660, "click", 4.0)]
    f2 = [(t0 + 600, "click", 8.0),  # late: hour 0, watermark still open
          (t0 + 4 * 3600 + 60, "view", 1.0),
          (t0 + 4 * 3600 + 120, "view", 2.0)]
    src = str(tmp_path / "wsrc")
    os.makedirs(src)
    for i, rows in enumerate([f1, f2]):
        spark.createDataFrame(rows, "epoch long, event_type string, value double").select(
            F.timestamp_seconds("epoch").alias("ts"), "event_type", "value"
        ).coalesce(1).write.mode("append" if i else "overwrite").parquet(src)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        window_agg_stream(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type, r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    # hours 0 and 1 are closed (watermark = t0+4h+2m - 2h); hour 4 is open
    expected = {
        (t0, "click", 3, 11.0),   # incl. the late event
        (t0, "view", 1, 1.5),
        (t0 + 3600, "click", 1, 4.0),
    }
    assert got == expected


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
    out_rows = spark.sql("SELECT * FROM closed_sessions").collect()
    got = {
        (r.user_id, r.session_start, r.n_events, r.total_value)
        for r in out_rows
    }
    # expected: per user, sessions 1 and 2 closed (4 events, 6.0 value each)
    expected = set()
    for u, base in (("u1", t0), ("u2", t0 + 17)):
        for s in range(2):
            expected.add((u, base + s * 10_000, 4, 6.0))
    assert got == expected
    # time-ordered delivery -> the straggler counter reads zero everywhere
    assert all(r.n_dropped == 0 for r in out_rows)


def test_sessionize_stream_counts_dropped_stragglers(spark, tmp_path):
    """A cross-batch straggler (older than the state's last_ts) is dropped
    from the session math — and the drop is OBSERVABLE via the n_dropped
    column on the next closed session, not silent."""
    from pyspark.sql import functions as F

    from trustgraph_spark.streaming import sessionize_stream

    t0 = 1_700_000_000
    # batch 1: two in-session events; batch 2 leads with a straggler older
    # than last_ts, then a gap-crossing event that closes session 1
    batches = [
        [("u1", t0), ("u1", t0 + 60)],
        [("u1", t0 + 30), ("u1", t0 + 60 + 10_000)],
    ]
    src = str(tmp_path / "events_src")
    for i, chunk in enumerate(batches):
        spark.createDataFrame(
            [(u, ts, 1.0) for (u, ts) in chunk],
            "user_id string, epoch long, value double",
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
        .queryName("straggler_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM straggler_sessions").collect()
    assert [
        (r.user_id, r.session_start, r.session_end, r.n_events, r.n_dropped)
        for r in rows
    ] == [("u1", t0, t0 + 60, 2, 1)]


def test_streaming_chunk_embeddings_matches_batch(spark, tmp_path):
    """Chunk stream -> incrementally appended doc-embeddings store equals
    the one-shot batch store over the same chunks; a query against the
    streamed store returns the batch answer."""
    from trustgraph_spark.operators.docrag import (
        query_chunk_embeddings,
        store_chunk_embeddings,
    )
    from trustgraph_spark.operators.embeddings import HashEmbedder
    from trustgraph_spark.streaming import start_chunk_embeddings_ingest

    tmp = str(tmp_path)
    rows = [(f"c{i:02d}", f"alpha w{i} beta gamma") for i in range(20)]
    df = spark.createDataFrame(rows, "chunk_id string, text string")
    df.repartition(4).write.parquet(f"{tmp}/chunks_src")

    stream = (
        spark.readStream.schema("chunk_id string, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{tmp}/chunks_src")
    )
    q = start_chunk_embeddings_ingest(
        stream, f"{tmp}/store", f"{tmp}/ckpt", embedder=HashEmbedder(dim=16)
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(f"{tmp}/store")
    batch = store_chunk_embeddings(df, embedder=HashEmbedder(dim=16))
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0

    import pandas as pd

    qv = HashEmbedder(dim=16).embed(pd.Series(["alpha w3"]))
    queries = spark.createDataFrame(
        [("q0", [float(x) for x in qv[0]])],
        "query_id string, query_vector array<float>",
    )
    top = query_chunk_embeddings(streamed, queries, limit=1).collect()
    assert top[0].chunk_id == "c03"
