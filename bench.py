"""Benchmark harness.

Default: runs the headline KG pipeline + representative queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE JSON line.

--scaling: runs the SAME pipeline at local[8] and local[32] on identical
input and writes throughput + scaling efficiency to BENCH/BASELINE.md
(the sandbox evidence for the north_rule's N->4N executor criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def synth_spec_for(sf: float):
    from trustgraph_spark.synth import SynthSpec

    # ~1M turns/sf-unit: sf0.1 -> ~100k turns incl. a hot conversation
    n_convs = max(20, int(20000 * sf))
    return SynthSpec(n_convs=n_convs, turns_per_conv=50, hot_factor=100)


def run_pipeline_bench(spark, sf: float) -> tuple[float, int]:
    """Full transcripts KG pipeline wall time; returns (sec, n_turns)."""
    from trustgraph_spark.pipeline import Pipeline, PipelineConfig
    from trustgraph_spark.synth import synth_transcripts

    tr = synth_transcripts(spark, synth_spec_for(sf))
    n_turns = tr.count()
    wh = tempfile.mkdtemp(prefix="tg_bench_wh_")
    try:
        t0 = time.monotonic()
        pipe = Pipeline(spark, PipelineConfig(warehouse=wh, with_linking=True))
        out = pipe.run(tr, run_id="bench")
        out["edges"].count()  # materialization is inside run(); this is a no-op read
        wall = time.monotonic() - t0
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    return wall, n_turns


BENCH_QUERIES = [
    "kg_mentions",
    "kg_cooccur_edges",
    "kg_quads_by_entity",
    "kg_nodes_degree",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "doc_fingerprint",
    "quality_score",
    "language_id",
    "ann_cosine_topk",
    "events_sessionize",
    "events_window_agg",
    "pricing_summary",
]


def run_query_bench(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times = {}
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.monotonic() - t0, 3)
    return times


def main():
    from trustgraph_spark.session import get_spark

    sf = _sf_of(SF_DIR)

    if "--scaling" in sys.argv:
        results = {}
        for cores in (8, 32):
            spark = get_spark(app_name=f"tg-bench-{cores}", cores=cores)
            wall, n_turns = run_pipeline_bench(spark, sf)
            spark.stop()
            results[cores] = {
                "wall_sec": round(wall, 2),
                "turns": n_turns,
                "turns_per_sec": round(n_turns / wall, 1),
            }
        eff = (results[32]["turns_per_sec"] / results[8]["turns_per_sec"]) / (32 / 8)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write(
                "# Scaling evidence (sandbox stand-in for N -> 4N executors)\n\n"
                "Same input, same full KG pipeline (synth transcripts -> chunks ->\n"
                "extract -> provenance -> link -> materialize), two parallelism\n"
                f"levels. Input: {results[8]['turns']} turns (sf={sf}).\n\n"
                "| parallelism | wall (s) | turns/sec |\n|---|---|---|\n"
                f"| local[8] | {results[8]['wall_sec']} | {results[8]['turns_per_sec']} |\n"
                f"| local[32] | {results[32]['wall_sec']} | {results[32]['turns_per_sec']} |\n\n"
                f"**Scaling efficiency (8 -> 32 cores): {eff:.3f}** "
                "(target >= 0.8 per BASELINE.json)\n"
            )
        print(json.dumps({"scaling_efficiency": round(eff, 3), **{f"c{k}": v for k, v in results.items()}}))
        return

    spark = get_spark(app_name="tg-bench", cores=CPUS)
    pipeline_wall, n_turns = run_pipeline_bench(spark, sf)
    qtimes = run_query_bench(spark, SF_DIR)
    spark.stop()

    total = round(pipeline_wall + sum(qtimes.values()), 3)
    out = {
        "metric": "kg_pipeline_plus_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": {"kg_pipeline": round(pipeline_wall, 3), **qtimes},
        "sf": sf,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / pipeline_wall, 1),
        "cpus": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
