"""Two-decade scale ladder (1x / 10x / 100x of sf0.1 documents) for the
dedup + textstats flagships: the strongest local falsification we can
run of the 'this survives 100 TB' claim — two orders of magnitude on
the same 32 cores, watching the growth EXPONENT rather than a single
ratio.

Replication preserves structure the same way tools/scale_family.py
does: replica k suffixes every token with k, so each replica carries
the sf0.1 shingle/df distribution in a disjoint shingle space — no
cross-replica near-dups, so duplicate-cluster sizes stay constant and
candidate counts are expected LINEAR in N (a naive all-pairs join
would be quadratic: 10,000x at the top rung).  Input prep
(replication + localCheckpoint) is excluded from measured walls.

Measured per rung, warm best-of-2 on local[32]:
- minhash_lsh: signature+banding+candidate-pair count (the full
  MinHash kernel after the affine-family rewrite)
- exact dedup: duplicate-group count (one map-side-combinable shuffle)
- language_id + quality_score: pure-scan ops (establish the scan rate)

Usage: taskset -c 0-31 python tools/scale_ladder.py [--max 100]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _wall(fn, reps: int = 2):
    best, out = float("inf"), None
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return best, out


def docs_at(spark, mult: int):
    """mult replicas with per-replica token suffixes (disjoint shingle
    spaces, identical df structure per replica)."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    if mult == 1:
        return d
    n = 5000
    parts = [d]
    for k in range(1, mult):
        parts.append(d.select(
            (F.col("doc_id") + k * n).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1{k}").alias("text")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main():
    from trustgraph_spark.operators.dedup import (
        exact_dedup_groups,
        minhash_lsh_candidates,
    )
    from trustgraph_spark.operators.textstats import (
        language_id,
        quality_score,
    )
    from trustgraph_spark.session import get_spark

    max_mult = 100
    if "--max" in sys.argv:
        max_mult = int(sys.argv[sys.argv.index("--max") + 1])

    spark = get_spark(cores=32)
    rungs = [m for m in (1, 10, 100) if m <= max_mult]

    print(f"rungs: {rungs} (docs = 5,000 x mult)")
    for mult in rungs:
        docs = docs_at(spark, mult).localCheckpoint()  # prep excluded
        n_docs = docs.count()

        w_lsh, cand = _wall(
            lambda d=docs: minhash_lsh_candidates(d).count())
        w_exact, groups = _wall(
            lambda d=docs: exact_dedup_groups(d).count())
        w_scan, _ = _wall(
            lambda d=docs: (
                language_id(d).where(F.col("lang_pred") == "en").count(),
                quality_score(d).agg(F.avg("stopword_ratio")).collect()))

        print(f"mult={mult}x docs={n_docs}: "
              f"lsh {w_lsh:.1f}s cand={cand} | "
              f"exact {w_exact:.1f}s dup_groups={groups} | "
              f"scan {w_scan:.1f}s")
        docs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
