"""Scale-up evidence for the round-5 data-selection additions:
SemDedup (operators/semdedup.py) and DSIR (operators/dsir.py), at
sf0.1 and at a 10x frame.

SemDedup's published cost model says n_clusters must grow with N so
expected cluster size stays constant — then the within-cluster pair
join is linear overall.  The 10x frame therefore runs with 10x the
centroids (32 -> 320), and the claim worth printing is that the
PAIR-JOIN INPUT (sum of cluster_size^2) grows ~10x, not 100x — the
cluster-size histogram is what an all-pairs join cannot have.  The
10x embeddings are vec_id-shifted copies nudged by k*0.002 per copy
so vectors stay distinct while the cluster geometry is preserved.

DSIR's two model fits land in a CONSTANT number of bucket rows (256
here) regardless of corpus size, and scoring is a broadcast lookup —
wall should grow far below 10x and the selection stays k rows.

Usage: python tools/scale_r5c.py   (prints a markdown table to paste
into BENCH/BASELINE.md).  Warm best-of-2, like tools/scale_r5b.py.
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
    from trustgraph_spark.operators.dsir import dsir_sample, dsir_weights
    from trustgraph_spark.operators.embeddings import ivf_centroids
    from trustgraph_spark.operators.semdedup import semdedup

    spark = get_spark(cores=32)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", "embedding")
    n_vec = emb.count()
    tenx_e = None
    for k in range(10):
        shifted = emb.select(
            (F.col("vec_id") + k * n_vec).alias("vec_id"),
            F.transform("embedding",
                        lambda x: x + F.lit(k * 0.002)).alias("embedding"))
        tenx_e = shifted if tenx_e is None else tenx_e.unionByName(shifted)
    eframes = {"1x": (emb, 32), "10x": (tenx_e.localCheckpoint(), 320)}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text", "lang")
    n_docs = docs.count()
    tenx_d = None
    for k in range(10):
        shifted = docs.select(
            (F.col("doc_id") + k * n_docs).alias("doc_id"), "text", "lang")
        tenx_d = shifted if tenx_d is None else tenx_d.unionByName(shifted)
    dframes = {"1x": docs, "10x": tenx_d.localCheckpoint()}

    target = docs.where((F.col("lang") == "en") & (F.col("doc_id") % 7 == 0))

    print("== semdedup (k grows with N: 32 -> 320) ==", flush=True)
    sem_rows = {}
    for tag, (df, k) in eframes.items():
        cents = ivf_centroids(df, n_lists=k, id_col="vec_id",
                              vec_col="embedding")

        def run(df=df, cents=cents):
            out = semdedup(df, cents, eps=0.95)
            return out.where(~F.col("kept")).count()

        wall, n_drop = _wall(run)
        # pair-join input: sum over clusters of size^2 (the quantity
        # that must grow ~10x, not 100x).  Diagnostic only — computed
        # OUTSIDE the timed closure so the wall column measures
        # semdedup itself, not an extra assignment pass.
        from trustgraph_spark.operators.embeddings import ivf_assign
        pairs = (ivf_assign(df.select("vec_id",
                                      F.col("embedding").alias("v")),
                            cents, vec_col="v")
                 .groupBy("list_id").count()
                 .agg(F.sum(F.col("count") * F.col("count")))
                 .collect()[0][0])
        sem_rows[tag] = (wall, n_drop, pairs)
        print(f"semdedup {tag}: dropped={n_drop} pair_input={pairs} "
              f"wall={wall}s", flush=True)

    print("== dsir (256 buckets, fixed target slice) ==", flush=True)
    dsir_rows = {}
    for tag, df in dframes.items():
        def run_w(df=df):
            return dsir_weights(df, target, n_buckets=256).count()

        def run_s(df=df):
            return dsir_sample(df, target, k=40, n_buckets=256).count()

        w_wall, n_w = _wall(run_w)
        s_wall, n_s = _wall(run_s)
        dsir_rows[tag] = (w_wall, n_w, s_wall, n_s)
        print(f"dsir {tag}: weights={n_w} wall={w_wall}s "
              f"sample={n_s} wall={s_wall}s", flush=True)

    print("\n| operator | input 1x/10x | key quantity 1x/10x | growth "
          "| wall 1x/10x (s) | wall growth |")
    print("|---|---|---|---|---|---|")
    (w1, d1, p1), (w10, d10, p10) = sem_rows["1x"], sem_rows["10x"]
    print(f"| semdedup (k prop. N) | {n_vec}/{n_vec * 10} vecs "
          f"| pair-join input {p1}/{p10} | {p10 / max(p1, 1):.1f}x "
          f"| {w1}/{w10} | {w10 / max(w1, 1e-9):.1f}x |")
    (ww1, nw1, sw1, _), (ww10, nw10, sw10, _) = (
        dsir_rows["1x"], dsir_rows["10x"])
    print(f"| dsir_weights | {n_docs}/{n_docs * 10} docs "
          f"| weight rows {nw1}/{nw10} | {nw10 / max(nw1, 1):.1f}x "
          f"| {ww1}/{ww10} | {ww10 / max(ww1, 1e-9):.1f}x |")
    print(f"| dsir_sample (k=40) | {n_docs}/{n_docs * 10} docs "
          f"| 40/40 selected | 1.0x "
          f"| {sw1}/{sw10} | {sw10 / max(sw1, 1e-9):.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
