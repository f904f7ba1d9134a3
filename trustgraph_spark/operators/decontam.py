"""Eval-set decontamination — flag training documents that share long
n-gram spans with a benchmark/eval corpus (the published practice:
GPT-3's appendix-C 13-gram collision rule, since standard in dataset
cards).  Distinct from operators/dedup.py (train-train duplicates) and
operators/linededup.py (boilerplate): this is a train-vs-EVAL check
where the right-hand corpus is tiny and curated.

Semantics (pinned, mirrored by the DuckDB oracle):

* words = lowercased whitespace tokens (same normalization as
  operators/quality.py).
* grams = the document's distinct n-grams (default n = 13), carried
  as the 62-bit polynomial keys from quality.ngram_hash_folds — gram
  strings are never built (one md5 per WORD instead of one per gram;
  ~1.3x faster at sf0.1 and the broadcast eval set carries 8-byte
  keys instead of 32-char digests).
  62 bits keeps expected cross-corpus false hits ~2e-5 even at
  10M x 10M gram sets; the DuckDB oracle groups by the actual gram
  strings, so any collision would surface as a gate mismatch.
* a doc is contaminated when ANY of its grams appears in any eval
  text's gram set.
* input contract: one row per doc_id / eval_id.  The rollup counts
  one pre-deduped gram array per input row (the documented plain-count
  shape below), so duplicate id rows would inflate n_grams/n_overlap —
  dedupe upstream, as every pipeline entry point here does.
* outputs per doc: distinct-gram total, overlapping-gram count,
  overlap fraction, distinct eval docs hit, contaminated flag.  Docs
  with fewer than n words have zero grams and are clean by
  definition (but still appear in the output).

Scale shape: the eval side is exploded, deduped, and grouped to ONE
row per gram key (eval-doc ids as a small array) before BROADCAST
(an eval suite is thousands of documents; its 13-gram set is millions
of rows — comfortably broadcastable).  The broadcast join is then
1-to-at-most-1, so the train side is a pure map pass — scan → explode
→ broadcast-hash lookup → partial-agg rollup on doc_id with plain
counts, no count_distinct expand and no corpus-side shuffle of gram
rows.
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


def _doc_grams(df: DataFrame, id_col: str, out_id: str,
               text_col: str, n: int, outer: bool) -> DataFrame:
    """(out_id, gram-key) rows — digests then lanes bound in their own
    select stages (quality.ngram_digests: an unbound digest transform
    runs the md5 pass once per lane), distinct per doc, one explode.
    Always explode_outer (an inner explode of the bound gram-key
    attribute would let InferFiltersFromGenerate inline the fold into
    a pushed-down Filter — see quality.ngram_repetition); ``outer``
    controls whether zero-gram docs keep their null row."""
    dg = df.select(F.col(id_col).alias(out_id),
                   ngram_digests(_words(F.col(text_col))).alias("_dg"))
    x1, x2 = ngram_lanes_from_digests(F.col("_dg"))
    lanes = dg.select(F.col(out_id),
                      x1.alias("_x1"), x2.alias("_x2"))
    [(_n, keys, _)] = ngram_hash_folds(
        F.col("_x1"), F.col("_x2"), (n,))
    out = lanes.select(F.col(out_id),
                       F.explode_outer(F.array_distinct(keys)).alias("h"))
    return out if outer else out.where(F.col("h").isNotNull())


def ngram_contamination(documents: DataFrame, eval_docs: DataFrame,
                        n: int = 13, id_col: str = "doc_id",
                        text_col: str = "text",
                        eval_id_col: str = "eval_id",
                        eval_text_col: str = "text") -> DataFrame:
    """Per-training-doc contamination report against the eval corpus."""
    doc_grams = _doc_grams(documents, id_col, "doc_id", text_col, n,
                           outer=True)
    eval_grams = (_doc_grams(eval_docs, eval_id_col, "eval_id",
                             eval_text_col, n, outer=False)
                  .withColumnRenamed("h", "eh")
                  .groupBy("eh")
                  .agg(F.collect_set("eval_id").alias("eval_ids")))

    # doc grams are distinct per doc (array_distinct) and the eval side
    # is unique on eh, so the left join never multiplies rows: plain
    # counts replace the three count_distincts (each of which would
    # expand the aggregate input 3x).
    joined = doc_grams.join(
        F.broadcast(eval_grams), F.col("h") == F.col("eh"), "left")
    return (joined
            .groupBy("doc_id")
            .agg(
                F.count(F.col("h")).cast("long").alias("n_grams"),
                F.count(F.col("eh")).cast("long").alias("n_overlap"),
                # collect_SET, not collect_list: the worst-contamination
                # doc (one that embeds a whole eval doc) hits thousands
                # of grams that all carry the SAME eval_ids array —
                # the set dedups them in the partial aggregate, so the
                # per-doc buffer is bounded by the number of DISTINCT
                # eval-doc combinations, not by overlapping-gram count.
                F.size(F.array_distinct(F.flatten(
                    F.collect_set("eval_ids")))).cast("long")
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
