"""spark-submit entry point for the corpus-hygiene pipeline.

Usage (local sandbox):

    python jobs/package.py   # builds dist/trustgraph_spark.zip
    spark-submit --master local[32] \
        --py-files dist/trustgraph_spark.zip \
        jobs/run_hygiene.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/hygiene_out \
        [--span-n 50] [--seq-len 2048] [--no-gopher-filter] \
        [--mix web=0.5,code=0.3,wiki=0.2] \
        [--embeddings emb.parquet]       # (doc_id, embedding): SemDedup \
        [--dsir-target tgt.parquet --dsir-keep 1000]   # DSIR selection

Writes <output>/cleaned, <output>/packed, <output>/report as parquet
(plus <output>/sharded + <output>/shard_manifest with --shards N: the
seeded export permutation, one directory per shard) and prints a
one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `python jobs/run_hygiene.py` puts jobs/ (not the repo root) on
# sys.path; under spark-submit --py-files the zip supplies the package
# and this prepend is a harmless no-op.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--span-n", type=int, default=50)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--lm-vocab", type=int, default=65536)
    ap.add_argument("--no-gopher-filter", action="store_true")
    ap.add_argument("--mix", default="",
                    help="source=frac,... target token shares")
    ap.add_argument("--embeddings", default="",
                    help="(doc_id, embedding) parquet: enables SemDedup")
    ap.add_argument("--dsir-target", default="",
                    help="(doc_id, text) parquet: enables DSIR selection")
    ap.add_argument("--dsir-keep", type=int, default=0)
    ap.add_argument("--shards", type=int, default=0,
                    help="write <output>/sharded: seeded export "
                         "permutation of the cleaned corpus in N shards")
    ap.add_argument("--shard-seed", default="s0")
    args = ap.parse_args()
    # DSIR needs both halves: the target corpus defines the
    # distribution, the keep count sizes the selection.  Half a pair
    # would silently skip the stage (or crash later) — fail fast.
    if bool(args.dsir_target) != (args.dsir_keep > 0):
        ap.error("--dsir-target and --dsir-keep > 0 must be given "
                 "together (got target=%r keep=%d)"
                 % (args.dsir_target, args.dsir_keep))

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("trustgraph-hygiene").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from trustgraph_spark.hygiene import HygieneConfig, run_hygiene

    targets = {}
    if args.mix:
        for kv in args.mix.split(","):
            k, v = kv.split("=")
            targets[k] = float(v)

    cfg = HygieneConfig(
        span_n=args.span_n, seq_len=args.seq_len,
        lm_vocab_size=args.lm_vocab,
        apply_gopher_filter=not args.no_gopher_filter,
        mix_targets=targets, dsir_keep=args.dsir_keep)

    t0 = time.monotonic()
    docs = spark.read.parquet(args.input)
    emb = spark.read.parquet(args.embeddings) if args.embeddings else None
    tgt = (spark.read.parquet(args.dsir_target)
           if args.dsir_target else None)
    out = run_hygiene(docs, cfg, embeddings=emb, dsir_target=tgt)
    for name in ("cleaned", "packed", "report"):
        out[name].write.mode("overwrite").parquet(
            f"{args.output}/{name}")
    if args.shards > 0:
        # export permutation: order_key/shard_id are one md5 projection,
        # the layout is a single hash exchange, partitionBy emits one
        # directory per shard (mixing.shuffle_shards docstring).
        # Read back the just-written cleaned parquet — out["cleaned"]'s
        # lineage (LM-score fit + joins) would otherwise re-execute for
        # the sharded write and again for the manifest.
        from trustgraph_spark.operators.mixing import (
            shard_layout, shard_stats, shuffle_shards)
        cleaned = spark.read.parquet(f"{args.output}/cleaned")
        # a mixed corpus has one row per (doc_id, epoch): the epoch must
        # join the shuffle key or repeats share an order_key
        key_cols = (["doc_id", "epoch"] if "epoch" in cleaned.columns
                    else None)
        sharded = shuffle_shards(
            cleaned, n_shards=args.shards, seed=args.shard_seed,
            key_cols=key_cols)
        (shard_layout(sharded, args.shards)
         .write.mode("overwrite").partitionBy("shard_id")
         .parquet(f"{args.output}/sharded"))
        shard_stats(sharded).write.mode("overwrite").parquet(
            f"{args.output}/shard_manifest")
    wall = round(time.monotonic() - t0, 2)

    report = {r["stage"]: r["n_docs"]
              for r in spark.read.parquet(f"{args.output}/report").collect()}
    print(json.dumps({"wall_sec": wall, "report": report,
                      "output": args.output}))
    spark.stop()


if __name__ == "__main__":
    main()
