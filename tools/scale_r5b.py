"""Scale-up evidence for the corpus-hygiene family added late in round
5: Gopher doc metrics, n-gram repetition, PII profile/redact, and
corpus-level line dedup, at sf0.1 documents and at a 10x frame built
as 10 doc_id-shifted copies of the same corpus (content statistics are
preserved EXACTLY; cross-doc duplicate multiplicity grows 10x, which
is the stress case for line dedup's duplicated-key build side).

Expectations at 10x docs:
* gopher/ngram/pii are per-document scans — rows 10x, wall far below
  10x at this absolute size (fixed scheduling amortizes).
* line dedup has the one corpus-wide shuffle (the line-key count);
  its duplicated-key table KEEPS the same number of distinct keys
  (same content, higher counts), so the broadcast build side must NOT
  grow 10x — that's the scale claim worth printing.

Usage: python tools/scale_r5b.py   (prints a markdown table to paste
into BENCH/BASELINE.md).  Warm best-of-2, like tools/scale_r5.py.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def _wall(fn):
    best, n = None, None
    for _ in range(2):
        t0 = time.monotonic()
        n = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), n


def main():
    from trustgraph_spark.session import get_spark
    import __spark_entry__ as entry
    from trustgraph_spark.operators.linededup import (
        corpus_line_dedup, corpus_line_stats)
    from trustgraph_spark.operators.decontam import ngram_contamination
    from trustgraph_spark.operators.dedup import resolve_duplicates
    from trustgraph_spark.operators.lmquality import unigram_logprob_score
    from trustgraph_spark.operators.packing import pack_blocks
    from trustgraph_spark.operators.pii import pii_profile, pii_redact
    from trustgraph_spark.operators.quality import (
        _words, gopher_doc_metrics, ngram_repetition)

    def _decontam(d):
        evals = (d.where(F.col("doc_id") % 25 == 0)
                 .select((F.col("doc_id") / 25).cast("long")
                         .alias("eval_id"),
                         F.array_join(
                             F.slice(_words(F.col("text")), 6, 20), " ")
                         .alias("text")))
        return ngram_contamination(d, evals).count()

    spark = get_spark(cores=32)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = base.count()
    tenx = None
    for k in range(10):
        shifted = base.select(
            (F.col("doc_id") + k * n_docs).alias("doc_id"), "text")
        tenx = shifted if tenx is None else tenx.unionByName(shifted)
    frames = {"1x": base.select("doc_id", "text"), "10x": tenx}

    ops = {
        "gopher_metrics": lambda d: gopher_doc_metrics(d).count(),
        "ngram_repetition": lambda d: ngram_repetition(d).count(),
        "pii_profile": lambda d: pii_profile(entry._pii_plant(d)).count(),
        "pii_redact": lambda d: pii_redact(entry._pii_plant(d)).count(),
        "line_dedup_clean": lambda d: corpus_line_dedup(
            entry._lined_plant(d)).count(),
        "line_dedup_dupkeys": lambda d: corpus_line_stats(
            entry._lined_plant(d)).count(),
        "decontam_13gram": lambda d: _decontam(d),
        "lm_quality": lambda d: unigram_logprob_score(
            d, vocab_size=30).count(),
        "pack_blocks": lambda d: pack_blocks(d, seq_len=2048).count(),
        "dedup_resolve": lambda d: resolve_duplicates(
            d.select("doc_id"),
            d.select("doc_id").where((F.col("doc_id") % 10).isin(1, 2, 3, 4))
            .select(F.col("doc_id").alias("a"),
                    (F.col("doc_id") - 1).alias("b"))).count(),
    }

    rows = {}
    for name, op in ops.items():
        for tag, df in frames.items():
            wall, n = _wall(lambda: op(df))
            rows.setdefault(name, {})[tag] = (wall, n)
            print(f"{name} {tag}: rows={n} wall={wall}s", flush=True)

    print("\n| operator | docs 1x/10x | rows 1x/10x | row growth "
          "| wall 1x/10x (s) | wall growth |")
    print("|---|---|---|---|---|---|")
    for name, r in rows.items():
        (w1, n1), (w10, n10) = r["1x"], r["10x"]
        print(f"| {name} | {n_docs}/{n_docs * 10} | {n1}/{n10} "
              f"| {n10 / max(n1, 1):.1f}x | {w1}/{w10} "
              f"| {w10 / max(w1, 1e-9):.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
