"""spark-submit entry point for the KG-construction pipeline.

Usage (local sandbox):

    python jobs/package.py   # builds dist/trustgraph_spark.zip
    spark-submit --master local[32] \
        --py-files dist/trustgraph_spark.zip \
        jobs/run_pipeline.py \
        --input /path/to/transcripts_parquet \
        --warehouse /path/to/warehouse \
        [--synth-turns 100000] [--no-provenance] [--no-linking]

On a real cluster the same command with --master yarn/k8s and executor
sizing; the input is the Iceberg transcripts table. With --synth-turns the
job generates the deterministic synthetic corpus instead of reading input
(no external data needed for benchmarking).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `python jobs/run_pipeline.py` puts jobs/ (not the repo root) on
# sys.path; under spark-submit --py-files the zip supplies the package
# and this prepend is a harmless no-op.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet/Iceberg path")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--synth-turns", type=int, default=0)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--collection", default="default")
    ap.add_argument("--no-provenance", action="store_true")
    ap.add_argument("--no-linking", action="store_true")
    ap.add_argument("--no-checkpointing", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("trustgraph-spark-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from trustgraph_spark.pipeline import Pipeline, PipelineConfig

    if args.synth_turns:
        from trustgraph_spark.synth import SynthSpec, synth_transcripts

        n_convs = max(10, args.synth_turns // 60)
        transcripts = synth_transcripts(
            spark, SynthSpec(n_convs=n_convs, turns_per_conv=50, hot_factor=100)
        )
    elif args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        ap.error("need --input or --synth-turns")

    n_turns = transcripts.count()
    t0 = time.monotonic()
    pipe = Pipeline(
        spark,
        PipelineConfig(
            warehouse=args.warehouse,
            collection=args.collection,
            with_provenance=not args.no_provenance,
            with_linking=not args.no_linking,
            checkpointing=not args.no_checkpointing,
        ),
    )
    out = pipe.run(transcripts, run_id=args.run_id)
    wall = time.monotonic() - t0

    summary = {
        "turns": n_turns,
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_turns / wall, 1),
        "edges": pipe.metrics.get("edges", {}).get("rows"),
        "stages": pipe.metrics,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
