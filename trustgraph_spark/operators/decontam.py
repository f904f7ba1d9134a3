"""Eval-set decontamination — flag training documents that share long
n-gram spans with a benchmark/eval corpus (the published practice:
GPT-3's appendix-C 13-gram collision rule, since standard in dataset
cards).  Distinct from operators/dedup.py (train-train duplicates) and
operators/linededup.py (boilerplate): this is a train-vs-EVAL check
where the right-hand corpus is tiny and curated.

Semantics (pinned, mirrored by the DuckDB oracle):

* words = lowercased whitespace tokens (same normalization as
  operators/quality.py).
* grams = the document's distinct space-joined n-grams (default
  n = 13), carried as md5 hex digests — md5, not xxhash64, so the
  oracle computes identical keys, and 128 bits makes collisions a
  non-issue at any corpus size.
* a doc is contaminated when ANY of its grams appears in any eval
  text's gram set.
* outputs per doc: distinct-gram total, overlapping-gram count,
  overlap fraction, distinct eval docs hit, contaminated flag.  Docs
  with fewer than n words have zero grams and are clean by
  definition (but still appear in the output).

Scale shape: the eval side is exploded, deduped, and BROADCAST (an
eval suite is thousands of documents; its 13-gram set is millions of
rows — comfortably broadcastable, and the broadcast is what makes the
train side a pure map pass: scan → explode → broadcast-hash lookup →
partial-agg rollup on doc_id, no corpus-side shuffle of gram rows.
n-gram construction reuses quality.ngram_array (the zip_with chain,
not per-gram slicing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trustgraph_spark.operators.quality import _words, ngram_array


def _gram_hashes(text_col, n: int):
    return F.array_distinct(
        F.transform(ngram_array(_words(text_col), n), F.md5))


def ngram_contamination(documents: DataFrame, eval_docs: DataFrame,
                        n: int = 13, id_col: str = "doc_id",
                        text_col: str = "text",
                        eval_id_col: str = "eval_id",
                        eval_text_col: str = "text") -> DataFrame:
    """Per-training-doc contamination report against the eval corpus."""
    doc_grams = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_gram_hashes(F.col(text_col), n)).alias("h"))
    eval_grams = (eval_docs
                  .select(F.col(eval_id_col).alias("eval_id"),
                          F.explode(_gram_hashes(F.col(eval_text_col), n))
                          .alias("eh"))
                  .dropDuplicates(["eval_id", "eh"]))

    joined = doc_grams.join(
        F.broadcast(eval_grams), F.col("h") == F.col("eh"), "left")
    return (joined
            .groupBy("doc_id")
            .agg(
                F.count_distinct(F.col("h")).cast("long")
                .alias("n_grams"),
                F.count_distinct(
                    F.when(F.col("eh").isNotNull(), F.col("h")))
                .cast("long").alias("n_overlap"),
                F.count_distinct(F.col("eval_id")).cast("long")
                .alias("n_eval_docs"))
            .select(
                "doc_id", "n_grams", "n_overlap",
                F.round(F.when(F.col("n_grams") > 0,
                               F.col("n_overlap")
                               / F.col("n_grams").cast("double"))
                        .otherwise(F.lit(0.0)), 6)
                .alias("overlap_frac"),
                "n_eval_docs",
                (F.col("n_overlap") > 0).alias("contaminated")))
