"""Exact-substring span deduplication — remove REPEATED SPANS from
documents while keeping the first copy (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better": their
ExactSubstr tool drops any ≥50-token substring that appears elsewhere
in the corpus, keeping one occurrence).  The reference implementation
is a suffix-array over the concatenated corpus; the distributed
re-expression below gets the same token-level verdict from n-gram
anchors without ever materializing a global suffix structure.

Pinned semantics (mirrored by the DuckDB oracle):

* tokens = lowercased whitespace tokens, positions 0-based per doc.
* an OCCURRENCE is an n-token window (doc, start); occurrences of the
  same gram are duplicated when the corpus-wide count >=
  ``min_count``.  Gram identity travels as the 62-bit polynomial key
  from quality.ngram_hash_folds — for n=50 the earlier form built a
  ~300-char gram string through 49 quadratic concat passes and md5'd
  it, and shuffled 32-char hex keys; the fold is 49 multiply-add
  passes over longs and shuffles 8-byte keys (wall parity at sf0.1,
  where the shuffle is tiny; the key-width win is the 100 TB
  argument).  The DuckDB oracle groups by md5 of the actual gram
  string; both keyings are injective on any real corpus (62-bit
  birthday math in ngram_hash_folds), so the verdicts agree.
* the globally-first occurrence of each duplicated gram — minimum
  (doc_id, start) — is the KEPT copy; every other occurrence marks
  its n covered token positions for removal.
* a token survives iff NO non-first duplicated occurrence covers it;
  output text re-joins surviving tokens with single spaces (the
  suffix-array tool also re-flows around cuts).

Scale shape: gram counting is one map-side-combinable aggregate on
the gram key; the duplicated-gram table (count >= 2 only) joins back
as the build side; covered positions amplify ONLY duplicated
occurrences (n rows each — proportional to the duplicated volume,
which is the thing being removed, not the corpus); the final
anti-join and per-doc reassembly group on doc_id.  At 100 TB nothing
all-pairs, nothing suffix-global; the worst case (everything
duplicated) degenerates to n x corpus rows, the same write
amplification the suffix tool's output pass pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trustgraph_spark.operators.quality import (
    _words,
    ngram_digests,
    ngram_hash_folds,
    ngram_lanes_from_digests,
)


def exact_substring_dedup(documents: DataFrame, n: int = 50,
                          min_count: int = 2, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Per-doc span-dedup'd text: (doc_id, text, n_tokens_kept,
    n_tokens_removed)."""
    base = documents.select(
        F.col(id_col).alias("doc_id"),
        _words(F.col(text_col)).alias("w"))

    toks = base.select(
        "doc_id", F.posexplode_outer("w").alias("idx", "token"))

    # digests bound in their own stage: unbound, the md5 transform
    # would re-run once per lane (quality.ngram_digests)
    dg = base.select("doc_id", ngram_digests(F.col("w")).alias("_dg"))
    x1, x2 = ngram_lanes_from_digests(F.col("_dg"))
    lanes = dg.select("doc_id", x1.alias("_x1"), x2.alias("_x2"))
    [(_, gram_keys, _)] = ngram_hash_folds(
        F.col("_x1"), F.col("_x2"), (n,))
    # posexplode_OUTER + null filter: an inner explode lets
    # InferFiltersFromGenerate push a size()>0 filter below the lane
    # projection, inlining the 49-step fold into a per-row Filter
    # (see quality.ngram_repetition).
    occ = (lanes
           .select("doc_id",
                   F.posexplode_outer(gram_keys).alias("start", "h"))
           .where(F.col("h").isNotNull()))

    dup = (occ.groupBy("h")
           .agg(F.count(F.lit(1)).alias("cnt"),
                F.min(F.struct("doc_id", "start")).alias("first"))
           .where(F.col("cnt") >= min_count)
           .select(F.col("h").alias("dh"),
                   F.col("first.doc_id").alias("fdoc"),
                   F.col("first.start").alias("fstart")))

    covered = (occ.join(dup, F.col("h") == F.col("dh"))
               .where(~((F.col("doc_id") == F.col("fdoc"))
                        & (F.col("start") == F.col("fstart"))))
               .select("doc_id",
                       F.explode(F.sequence(
                           F.col("start"),
                           F.col("start") + F.lit(n - 1))).alias("idx"))
               .distinct())

    kept = toks.join(covered, ["doc_id", "idx"], "left_anti")
    kept_agg = (kept
                .groupBy("doc_id")
                .agg(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(F.when(
                                F.col("token").isNotNull(),
                                F.struct("idx", "token")))),
                            lambda s: s["token"]),
                        " ").alias("text"),
                    F.count("token").cast("long").alias("n_tokens_kept")))
    # per-doc token totals come straight off the word array — the
    # earlier totals-side explode + groupBy re-counted what size()
    # already knows, a full extra pass over the token stream
    totals = base.select(
        "doc_id",
        F.coalesce(F.size("w"), F.lit(0)).cast("long").alias("n_total"))
    # fully-scrubbed docs have no surviving rows — restore them from
    # the totals side with empty text
    return (totals.join(kept_agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("text", F.lit("")).alias("text"),
                    F.coalesce("n_tokens_kept", F.lit(0)).cast("long")
                    .alias("n_tokens_kept"),
                    (F.col("n_total")
                     - F.coalesce("n_tokens_kept", F.lit(0)))
                    .cast("long").alias("n_tokens_removed")))
