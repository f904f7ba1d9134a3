"""Corpus-trained unigram LM quality scoring — the cheap standalone
analog of CCNet's KenLM perplexity filter (Wenzek et al. 2020): score
every document by the mean log-probability of its tokens under a
unigram model fitted on the corpus itself, then keep/bucket by score.
Real pipelines bucket into head/middle/tail; this module emits the raw
score and leaves thresholds to the caller (quantile choice is a policy,
not an operator).

Pinned semantics (mirrored by the DuckDB oracle):

* tokens = lowercased whitespace tokens (quality.py normalization).
* model: p(t) = count(t) / total over the WHOLE corpus; only the
  ``vocab_size`` most frequent tokens are kept in the model (ties
  broken by token string so the vocabulary is deterministic); any
  other token scores as an out-of-vocabulary floor
  ``ln(alpha / total)`` with alpha = 0.5.
* doc score = mean ln p over the doc's tokens, rounded to 6 dp;
  empty docs score 0.0 with n_tokens = 0.

Scale shape: the frequency table is ONE map-side-combinable aggregate;
the top-V cut is a tiny sort-limit (V rows); scoring is a broadcast
lookup — the corpus is scanned twice (fit + score) and never shuffled.
That is exactly how a 100 TB CCNet pass runs: the model is small by
construction (vocab_size caps it), the data never moves.  For an
uncapped vocabulary you would swap the broadcast for a shuffled join
on token — same semantics, one extra exchange.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trustgraph_spark.operators.quality import _words

OOV_ALPHA = 0.5


def token_frequencies(documents: DataFrame, vocab_size: int | None = None,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Corpus token counts (one map-side-combinable aggregate), top-V
    by (count desc, token asc) when vocab_size is given."""
    toks = documents.select(
        F.explode(_words(F.col(text_col))).alias("token"))
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    if vocab_size is not None:
        freq = (freq.orderBy(F.col("cnt").desc(), F.col("token"))
                .limit(vocab_size))
    return freq


def unigram_logprob_score(documents: DataFrame,
                          vocab_size: int = 65536,
                          alpha: float = OOV_ALPHA,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Per-doc mean unigram log-probability under the corpus-fitted
    top-V model; OOV tokens take the ln(alpha/total) floor."""
    # total = sum over the UN-limited frequency table (a tiny aggregate
    # over vocab rows), so fit and total share one corpus scan — the
    # corpus is read exactly twice: fit, then score
    freq_full = token_frequencies(documents, None, id_col, text_col)
    freq = (freq_full.orderBy(F.col("cnt").desc(), F.col("token"))
            .limit(vocab_size))
    total = freq_full.agg(F.sum("cnt").cast("double").alias("total"))

    doc_toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_words(F.col(text_col))).alias("token"))
    scored = (doc_toks
              .join(F.broadcast(freq), "token", "left")
              .join(F.broadcast(total))
              .withColumn(
                  "logp",
                  F.when(F.col("token").isNull(), F.lit(None))
                  .when(F.col("cnt").isNotNull(),
                        F.log(F.col("cnt") / F.col("total")))
                  .otherwise(F.log(F.lit(float(alpha)) / F.col("total")))))
    return (scored
            .groupBy("doc_id")
            .agg(F.count(F.col("token")).cast("long").alias("n_tokens"),
                 F.sum(F.when(F.col("cnt").isNull()
                              & F.col("token").isNotNull(), 1)
                       .otherwise(0)).cast("long").alias("n_oov"),
                 F.round(F.coalesce(F.avg("logp"), F.lit(0.0)), 6)
                 .alias("mean_logprob")))


def py_unigram_scores(docs, vocab_size=65536, alpha=OOV_ALPHA):
    """Pure-Python replay of the pinned semantics (test oracle).
    Tokenization uses an ASCII-only ``\\s+`` split to match Java
    regex semantics (``str.split()`` would also split on Unicode
    whitespace like NBSP, which Spark's ``split(text, '\\s+')``
    does not)."""
    import re

    counts: dict[str, int] = {}
    total = 0
    toks = {}
    for doc_id, text in docs:
        ws = [w for w in re.split(r"\s+", text.lower(), flags=re.ASCII)
              if w]
        toks[doc_id] = ws
        total += len(ws)
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    vocab = dict(sorted(counts.items(),
                        key=lambda kv: (-kv[1], kv[0]))[:vocab_size])
    out = {}
    for doc_id, ws in toks.items():
        if not ws:
            out[doc_id] = (0, 0, 0.0)
            continue
        lps, oov = [], 0
        for w in ws:
            if w in vocab:
                lps.append(math.log(vocab[w] / total))
            else:
                oov += 1
                lps.append(math.log(alpha / total))
        out[doc_id] = (len(ws), oov, round(sum(lps) / len(lps), 6))
    return out
