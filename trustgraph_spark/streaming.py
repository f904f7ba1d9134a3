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


def start_chunk_embeddings_ingest(
    chunk_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    embedder=None,
    collection: str = "default",
):
    """Chunk stream -> doc-embeddings store maintained incrementally: each
    micro-batch runs the SAME store_chunk_embeddings batch operator and
    appends to the store (the streaming analog of the reference's
    chunk-consuming doc-embeddings writer, storage/doc_embeddings — it
    consumes the ingestion stream one message at a time; here one
    micro-batch at a time with checkpointed offsets).  Queries read the
    store as-of the last committed append; re-ingesting a chunk_id appends
    a second copy, deduplicated at query time or by compaction (Iceberg
    MERGE in production), matching start_ingest's stance."""
    from .operators.docrag import store_chunk_embeddings

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        store = store_chunk_embeddings(
            batch_df, embedder=embedder, collection=collection
        )
        store.write.mode("append").parquet(store_path)

    return (
        chunk_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


SESSION_OUT_SCHEMA = (
    "user_id string, session_start bigint, session_end bigint, "
    "n_events bigint, total_value double, n_dropped bigint"
)
_SESSION_STATE_SCHEMA = (
    "last_ts bigint, session_start bigint, n_events bigint, "
    "total_value double, n_dropped bigint"
)


def sessionize_stream(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user session tracking with gap-based closure. A session CLOSES (and
    is emitted) when a later event for the same user arrives more than
    ``gap_sec`` after the previous one; the open session survives in group
    state across micro-batches. Complements the batch sessionizer
    (events_sessionize) with the incremental path — same gap semantics,
    closed sessions match the batch result (asserted in test_streaming).

    Ordering: events are sorted within each micro-batch, and events that
    arrive OLDER than the state's last seen timestamp (cross-batch
    stragglers) are dropped rather than allowed to move ``last_ts``
    backwards and mis-close sessions.  "Closed sessions match the batch
    result" therefore holds for time-ordered delivery across batches;
    late stragglers are discarded — the same bounded-lateness stance as
    a watermark of zero — but counted: each closed-session row carries
    ``n_dropped``, the stragglers discarded for that user since the
    previous emission, so divergence surfaces with the next session
    close instead of appearing only as missing value/counts.  Caveat:
    stragglers arriving after a user's FINAL session close accumulate in
    state and are never emitted (NoTimeout state has no flush path) —
    sum(n_dropped) is a lower bound on total drops, exact for any user
    whose stream keeps closing sessions.  For a real lateness bound,
    feed the stream through a watermark upstream.

    events: a STREAMING DataFrame with (user_id, ts timestamp, value).
    Returns the stream of closed sessions."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    prepped = events.select(
        "user_id",
        F.unix_timestamp("ts").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_ts, start, n, tot, dropped = state.get
        else:
            last_ts = None
            start = n = 0
            tot = 0.0
            dropped = 0
        closed = []
        # one global sort over the group's whole micro-batch: events can
        # arrive split across multiple Arrow chunks in shuffle order, and
        # sorting each chunk independently would close sessions at wrong
        # boundaries whenever a later chunk carries earlier timestamps.
        # (Correctness needs the full group batch in hand anyway; a hot key
        # with millions of events per micro-batch should be rate-bounded at
        # the trigger, e.g. maxFilesPerTrigger / maxOffsetsPerTrigger.)
        chunks = list(pdfs)  # may be empty on a timeout invocation
        batch = pd.concat(chunks, ignore_index=True) if chunks else None
        if batch is not None and len(batch):
            batch = batch.sort_values("ts")
            if last_ts is not None:
                # clamp cross-batch stragglers: an event older than the
                # state's last_ts would move the session clock backwards
                # and mis-close/miscount; drop it (watermark-zero stance)
                # but COUNT it so the divergence surfaces in n_dropped
                before = len(batch)
                batch = batch[batch["ts"] >= last_ts]
                dropped += before - len(batch)
            for ts, val in zip(batch["ts"], batch["value"]):
                ts = int(ts)
                if last_ts is not None and ts - last_ts > gap_sec:
                    closed.append(
                        (user_id, start, last_ts, n, round(tot, 2), dropped)
                    )
                    start, n, tot, dropped = ts, 0, 0.0, 0
                elif last_ts is None:
                    start = ts
                n += 1
                tot += float(val)
                last_ts = ts
        state.update((last_ts, start, n, tot, dropped))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end",
                         "n_events", "total_value", "n_dropped"],
            )

    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def window_agg_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed aggregation with a late-data watermark: per
    (window, event_type) counts and value sums. Append mode emits a window
    only once the watermark passes its end — late events inside the
    watermark still count; older ones are dropped (bounded state). The
    streaming counterpart of the batch events_window_agg driver query —
    emitted windows match the batch aggregate (test_streaming).

    events: STREAMING DataFrame with (ts timestamp, event_type, value)."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


def compact_edges(spark: SparkSession, edges_path: str, out_path: str) -> DataFrame:
    """Cross-batch dedup compaction (the Cassandra-PK-upsert analog for an
    append-only file sink): read all appended batches, dropDuplicates on the
    quad key, rewrite."""
    edges = spark.read.parquet(edges_path).dropDuplicates(QUAD_KEY)
    edges.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def hygiene_stream(docs: DataFrame) -> DataFrame:
    """Streaming corpus hygiene: the batch scrub operators compose
    UNCHANGED on a streaming DataFrame.  Exact dedup runs on Structured
    Streaming's native dropDuplicates state keyed by the normalized
    content hash (the streaming twin of dedup.exact_dedup_groups; JVM-
    managed state, no Python seam — on an event-time source switch to
    dropDuplicatesWithinWatermark to bound state growth), and the
    stateless projections (pii.redact_col chain, quality.gopher_pass_col
    verdict) ride the same select.  One code path, batch == stream."""
    from pyspark.sql import functions as F

    from .operators.dedup import normalize_text_col
    from .operators.pii import redact_col
    from .operators.quality import gopher_pass_col

    hashed = docs.withColumn(
        "text_hash", F.md5(normalize_text_col(F.col("text"))))
    deduped = hashed.dropDuplicates(["text_hash"])
    return deduped.select(
        "doc_id", "text_hash",
        redact_col(F.col("text")).alias("redacted"),
        gopher_pass_col(F.col("text")).alias("gopher_pass"),
    )


def start_wire_query_service(
    request_stream: DataFrame,
    edges: DataFrame,
    results_path: str,
    checkpoint_dir: str,
):
    """The gateway's triples-query service as a stream: wire-JSON
    requests (columns req_id, request) arrive continuously, each
    micro-batch decodes natively and executes the SAME mask-grouped
    batch dispatch (operators/wire.py) against the static store, and
    wire-encoded responses append to the results table. The reference
    gateway holds one websocket per request (gateway/dispatch); here a
    request BATCH is the unit and exactly-once comes from foreachBatch
    + the transactional sink. Stream==batch is pytest-gated."""
    from .operators.wire import (
        decode_triples_requests,
        encode_triples_responses,
        execute_triples_requests,
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = encode_triples_responses(
            execute_triples_requests(
                decode_triples_requests(batch_df), edges))
        out.write.mode("append").parquet(results_path)

    return (
        request_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
