"""Sequence packing — the preprocessing step that turns a curated
corpus into fixed-length training blocks: concatenate every document's
token stream in a deterministic order and split at ``seq_len``
boundaries (GPT-style concat-split; documents may straddle blocks).
The per-doc output (absolute token offset, first/last block id) is
exactly what a sharded tokenizer worker needs to emit its blocks
independently.

Pinned semantics (mirrored by the DuckDB oracle):

* order = ascending doc_id, which must be a UNIQUE integer key (any
  64-bit range is fine — bucket math runs in monotone double space);
  tokens = lowercased whitespace tokens.
* ``start_tok`` = exclusive prefix sum of token counts;
  ``start_block`` = start_tok // seq_len;
  ``end_block`` = (start_tok + n_tokens - 1) // seq_len for non-empty
  docs, else start_block (empty docs occupy no tokens).

Scale shape — the naive formulation is a window over a GLOBAL order,
which Spark executes on a single partition (the whole corpus through
one task).  This module does the textbook two-phase prefix sum
instead:

1. range-bucket docs by doc_id into ``n_buckets`` contiguous ranges
   (bounds from one tiny min/max aggregate),
2. cumsum WITHIN each bucket (window partitioned by bucket — runs
   parallel),
3. per-bucket totals (n_buckets rows) prefix-summed on the driver and
   broadcast-joined back as offsets.

Only n_buckets scalars ever leave the executors; the corpus is
scanned once and shuffled once (the bucket window sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trustgraph_spark.operators.quality import _words


def pack_blocks(documents: DataFrame, seq_len: int = 2048,
                n_buckets: int = 64, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-doc packed-block assignment under deterministic doc_id-order
    concatenation: (doc_id, n_tokens, start_tok, start_block,
    end_block)."""
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(_words(F.col(text_col))).cast("long").alias("n_tokens"))
    if toks.schema["doc_id"].dataType.simpleString() not in (
            "bigint", "int", "smallint", "tinyint"):
        raise TypeError(
            "pack_blocks requires an integer doc_id (the concatenation "
            f"order key); got {toks.schema['doc_id'].dataType}")

    lo, hi = toks.agg(F.min("doc_id"), F.max("doc_id")).first()
    if lo is None:
        return toks.select(
            "doc_id", "n_tokens",
            F.lit(0).cast("long").alias("start_tok"),
            F.lit(0).cast("long").alias("start_block"),
            F.lit(0).cast("long").alias("end_block"))
    # bucket math in DOUBLE: span for full-range 64-bit ids would
    # overflow long arithmetic (Python ints here don't), and the double
    # conversion stays monotonic in doc_id — any monotone contiguous
    # split is a correct bucketing, exactness is not required
    span = float(max(hi - lo + 1, 1))
    bucket = F.least(
        F.floor((F.col("doc_id").cast("double") - float(lo))
                / span * n_buckets),
        F.lit(n_buckets - 1)).cast("long")
    b = toks.withColumn("bucket", bucket)

    # ROWS frame, not the default RANGE: duplicate doc_ids under a
    # RANGE frame would all receive the same cumsum (overlapping
    # start_tok ranges); with ROWS, ties order arbitrarily but offsets
    # stay disjoint — still, a unique doc_id is the documented contract
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = b.withColumn(
        "local_cum",
        F.sum("n_tokens").over(w) - F.col("n_tokens"))

    # per-bucket totals -> exclusive prefix offsets (n_buckets scalars
    # through the driver, never corpus rows)
    totals = {r["bucket"]: r["t"] for r in
              b.groupBy("bucket").agg(F.sum("n_tokens").alias("t"))
              .collect()}
    run, offsets = 0, {}
    for k in sorted(totals):
        offsets[k] = run
        run += totals[k]
    off = F.create_map(*[
        F.lit(x) for kv in offsets.items() for x in kv])

    out = local.withColumn(
        "start_tok", (F.col("local_cum") + off[F.col("bucket")])
        .cast("long"))
    return out.select(
        "doc_id", "n_tokens", "start_tok",
        (F.col("start_tok") / seq_len).cast("long").alias("start_block"),
        F.when(F.col("n_tokens") > 0,
               ((F.col("start_tok") + F.col("n_tokens") - 1) / seq_len)
               .cast("long"))
        .otherwise((F.col("start_tok") / seq_len).cast("long"))
        .alias("end_block"))


def packing_summary(packed: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Corpus-level packing stats: total tokens/blocks, straddling-doc
    count, and the fill fraction of the final partial block."""
    return packed.agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.ceil(F.sum("n_tokens") / seq_len)).cast("long")
        .alias("n_blocks"),
        F.sum(F.when(F.col("end_block") > F.col("start_block"), 1)
              .otherwise(0)).cast("long").alias("n_straddling"),
        F.round(
            F.when(F.sum("n_tokens") % seq_len == 0, F.lit(1.0))
            .otherwise((F.sum("n_tokens") % seq_len) / F.lit(seq_len)),
            6).alias("last_block_fill"))
