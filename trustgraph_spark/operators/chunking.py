"""Turn assembly and chunking.

Reference: trustgraph-flow/trustgraph/chunking/recursive/chunker.py:30-195
(S2 in SURVEY.md §2.1). The reference mints uuid4 chunk URIs
(provenance/uris.py) — nondeterministic — so we mint deterministic
hash-based chunk URIs instead (FIXTURES.md §2), which keeps reruns
idempotent and makes checkpoint resume content-addressed.

For the transcript graft, 1 turn = 1 chunk (per-turn text equality
invariant, BASELINE.json input_hint): a narrow, shuffle-free transform.
Per-conversation document assembly — the only operation that groups by
conv_id — uses two-phase salted aggregation so a hot conversation with
millions of turns never lands on one task (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import DEFAULT_COLLECTION

CHUNK_URI_PREFIX = "urn:chunk:"


def chunk_uri_col(conv_id, turn_idx):
    """Deterministic chunk URI: urn:chunk:sha256(conv_id ':' turn_idx)."""
    return F.concat(
        F.lit(CHUNK_URI_PREFIX),
        F.sha2(F.concat(conv_id, F.lit(":"), turn_idx.cast("string")), 256),
    )


def assemble_turn_chunks(
    transcripts: DataFrame, collection: str = DEFAULT_COLLECTION
) -> DataFrame:
    """1 turn = 1 chunk. Narrow (no shuffle); text passes through unchanged
    so per-turn text equality holds by construction and is asserted in tests.
    """
    return transcripts.select(
        chunk_uri_col(F.col("conv_id"), F.col("turn_idx")).alias("chunk_id"),
        F.col("conv_id").alias("root_id"),
        F.lit(collection).alias("collection"),
        F.col("turn_idx"),
        F.col("text"),
    )


def assemble_conversation_documents(
    transcripts: DataFrame,
    salt_buckets: int = 64,
    turns_per_bucket: int = 1024,
    separator: str = "\n",
) -> DataFrame:
    """Concatenate each conversation's turns in stable (conv_id, turn_idx)
    order into one document row (conv_id, text, n_turns).

    Two-phase salted aggregation: phase 1 groups by (conv_id,
    turn_idx div turns_per_bucket) so a 10^7-turn hot conversation spreads
    over many tasks; phase 2 merges the per-bucket segments (at most
    n_turns/turns_per_bucket rows per conversation — small). groupBy does
    map-side partial aggregation, and AQE handles residual skew.
    """
    bucket = (F.col("turn_idx") / turns_per_bucket).cast("long").alias("bucket")
    seg = (
        transcripts.select("conv_id", "turn_idx", "text", bucket)
        .groupBy("conv_id", "bucket")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s["text"],
                ),
                separator,
            ).alias("segment"),
            F.count("*").alias("n_turns"),
        )
    )
    return (
        seg.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "segment"))),
                    lambda s: s["segment"],
                ),
                separator,
            ).alias("text"),
            F.sum("n_turns").alias("n_turns"),
        )
    )


def recursive_chunker(
    documents: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "text",
    chunk_size: int = 2000,
    chunk_overlap: int = 100,
    collection: str = DEFAULT_COLLECTION,
) -> DataFrame:
    """Fixed-size overlapping character chunker (reference defaults
    2000/100, chunking/recursive/chunker.py:35-36), as pure column
    expressions: offsets = sequence(0, len-1, size-overlap); chunk =
    substr(text, off+1, size). No UDF, fully codegen'd.
    """
    step = chunk_size - chunk_overlap
    if step <= 0:
        raise ValueError("chunk_size must exceed chunk_overlap")
    tlen = F.length(F.col(text_col))
    offs = F.sequence(
        F.lit(0),
        F.greatest(tlen - 1, F.lit(0)),
        F.lit(step),
    )
    # a chunk is emitted only when it adds uncovered characters: the
    # previous chunk already covers [off, off+overlap), so off > 0 requires
    # off + overlap < len (the reference chunker stops once the text is
    # covered); empty text emits nothing
    offs = F.filter(
        offs,
        lambda off: (tlen > 0)
        & ((off == 0) | (off + F.lit(chunk_overlap) < tlen)),
    )
    exploded = documents.select(
        F.col(id_col).alias("root_id"),
        F.col(text_col),
        F.posexplode(offs).alias("chunk_index", "off"),
    )
    return exploded.select(
        chunk_uri_col(F.col("root_id"), F.col("chunk_index")).alias("chunk_id"),
        "root_id",
        F.lit(collection).alias("collection"),
        F.col("chunk_index").alias("turn_idx"),
        F.substring(F.col(text_col), F.col("off") + 1, chunk_size).alias("text"),
    )


def token_chunker(
    documents: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "text",
    tokens_per_chunk: int = 400,
    token_overlap: int = 20,
    collection: str = DEFAULT_COLLECTION,
) -> DataFrame:
    """Whitespace-token chunker (reference S3, chunking/token/). Tokens =
    split on whitespace; chunks of ``tokens_per_chunk`` with overlap, joined
    back with single spaces. Pure column expressions (sequence + slice).
    """
    step = tokens_per_chunk - token_overlap
    if step <= 0:
        raise ValueError("tokens_per_chunk must exceed token_overlap")
    toks = F.split(F.col(text_col), r"\s+")
    ntok = F.size(toks)
    offs = F.sequence(F.lit(0), F.greatest(ntok - 1, F.lit(0)), F.lit(step))
    # same covered-text rule as recursive_chunker, in token space; blank
    # text (split yields ['']) emits nothing
    offs = F.filter(
        offs,
        lambda off: (F.length(F.trim(F.col(text_col))) > 0)
        & ((off == 0) | (off + F.lit(token_overlap) < ntok)),
    )
    exploded = documents.select(
        F.col(id_col).alias("root_id"),
        toks.alias("toks"),
        F.posexplode(offs).alias("chunk_index", "off"),
    )
    return exploded.select(
        chunk_uri_col(F.col("root_id"), F.col("chunk_index")).alias("chunk_id"),
        "root_id",
        F.lit(collection).alias("collection"),
        F.col("chunk_index").alias("turn_idx"),
        F.array_join(
            F.slice(F.col("toks"), F.col("off") + 1, tokens_per_chunk), " "
        ).alias("text"),
    )
