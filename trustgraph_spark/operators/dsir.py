"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents that look like a small
target corpus by importance weighting in a hashed n-gram feature
space.  The published recipe behind "select web data that looks like
Wikipedia/books" pre-training pipelines; complements operators/
mixing.py (which realizes KNOWN per-source proportions — DSIR derives
the selection itself from data).

Semantics (pinned, mirrored by the DuckDB oracle):

* features = unigrams + bigrams of lowercased whitespace words (the
  paper's hashed n-gram parameterization), each gram hashed into
  ``n_buckets`` via the first 8 md5 hex digits — md5, not xxhash64,
  so the oracle computes identical bucket ids.
* two bucket-unigram models are fitted — target corpus vs raw corpus
  — with Laplace smoothing: ``p(b) = (count(b) + 1) / (total + B)``.
  Buckets unseen in a corpus get the ``1 / (total + B)`` floor.
* per-doc importance log-weight = sum over gram OCCURRENCES of
  ``ln p_target(bucket) - ln p_raw(bucket)`` (the paper's
  log-likelihood ratio under the bag-of-grams models).
* resampling is Gumbel-top-k on the log-weights (the paper's
  "sample without replacement proportional to importance"):
  ``key = weight + g`` where ``g = -ln(-ln(u))`` and
  ``u = (int(md5(salt||doc_id)[:8]) + 0.5) / 2^32`` — deterministic,
  partitioning-proof, replayable in SQL (the +0.5 keeps u strictly
  inside (0,1) so neither ln can hit 0).  Keys are rounded to 6dp
  before ranking with a doc_id tie-break, so float last-ulp
  differences between engines cannot reorder the selection.

Scale shape: both model fits are ONE map-side-combinable groupBy on
the bucket id (B is a constant — 8k..1M rows out regardless of corpus
size); the fitted models are tiny (bucket, logp) tables joined back
via BROADCAST, so scoring is scan -> explode -> broadcast lookup ->
partial-agg rollup on doc_id — no corpus-side shuffle of gram rows.
``dsir_sample`` takes the top-k by orderBy+limit, which Spark executes
as TakeOrderedAndProject (per-partition heap + driver merge of k rows,
never a global sort shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trustgraph_spark.operators.quality import _words, ngram_array


def _grams(text: Column) -> Column:
    """Unigrams + bigrams (space-joined) of lowercased ws words."""
    w = _words(text)
    return F.concat(w, ngram_array(w, 2))


def _bucket(gram: Column, n_buckets: int) -> Column:
    """md5-prefix hash bucket in [0, n_buckets) — oracle-replayable."""
    h = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(int(n_buckets)))


def fit_hashed_lm(documents: DataFrame, n_buckets: int = 8192,
                  text_col: str = "text",
                  prefix: str = "") -> tuple[DataFrame, DataFrame]:
    """Laplace-smoothed bucket-unigram model.  Returns
    ``(model, floor)``: *model* is (bucket, {prefix}logp) for every
    OBSERVED bucket (<= n_buckets rows — broadcast it); *floor* is the
    1-row ({prefix}floor) table carrying ``ln(1/(total+B))`` for
    unseen buckets — ALWAYS one row, even for an empty corpus, so the
    downstream cross-join never drops documents."""
    counts = (documents
              .select(F.explode(_grams(F.col(text_col))).alias("g"))
              .select(_bucket(F.col("g"), n_buckets).alias("bucket"))
              .groupBy("bucket")
              .agg(F.count(F.lit(1)).alias("cnt")))
    b = F.lit(float(n_buckets))
    # global agg: exactly one row even when counts is empty (total 0)
    tot = counts.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("double").alias("total"))
    model = (counts.join(F.broadcast(tot))
             .select("bucket",
                     F.log((F.col("cnt") + F.lit(1.0))
                           / (F.col("total") + b))
                     .alias(f"{prefix}logp")))
    floor = tot.select(
        F.log(F.lit(1.0) / (F.col("total") + b)).alias(f"{prefix}floor"))
    return model, floor


def dsir_weights(raw: DataFrame, target: DataFrame,
                 n_buckets: int = 8192, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-raw-doc importance log-weight under target-vs-raw hashed
    n-gram models: (doc_id, n_grams, weight).  Docs with no words get
    weight 0 (nothing to weigh) but still appear."""
    tgt, tfloor = fit_hashed_lm(target, n_buckets, text_col, prefix="t_")
    bg, bfloor = fit_hashed_lm(raw, n_buckets, text_col, prefix="b_")

    grams = raw.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_grams(F.col(text_col))).alias("g"))
    grams = grams.select(
        "doc_id",
        F.when(F.col("g").isNotNull(),
               _bucket(F.col("g"), n_buckets)).alias("bucket"))

    scored = (grams
              .join(F.broadcast(tgt), "bucket", "left")
              .join(F.broadcast(bg), "bucket", "left")
              .join(F.broadcast(tfloor))
              .join(F.broadcast(bfloor))
              .select(
                  "doc_id",
                  F.when(F.col("bucket").isNull(), F.lit(0.0))
                  .otherwise(F.coalesce("t_logp", "t_floor")
                             - F.coalesce("b_logp", "b_floor"))
                  .alias("llr"),
                  F.when(F.col("bucket").isNull(), 0)
                  .otherwise(1).alias("is_gram")))
    return (scored
            .groupBy("doc_id")
            .agg(F.sum("is_gram").cast("long").alias("n_grams"),
                 F.round(F.sum("llr"), 6).alias("weight")))


def dsir_sample(raw: DataFrame, target: DataFrame, k: int,
                n_buckets: int = 8192, salt: str = "dsir",
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Gumbel-top-k importance resample: the k raw docs to keep,
    with their weights and selection keys.  orderBy+limit lowers to
    TakeOrderedAndProject — scale-safe."""
    w = dsir_weights(raw, target, n_buckets, id_col, text_col)
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    keyed = w.withColumn(
        "key", F.round(F.col("weight") - F.log(-F.log(u)), 6))
    return (keyed
            .orderBy(F.col("key").desc(), F.col("doc_id").asc())
            .limit(int(k))
            .select("doc_id", "n_grams", "weight", "key"))
