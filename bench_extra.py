"""Per-query isolation bench (guide §1.4): noop-sink timing of selected
declared queries at a chosen SF, warm best-of-N, optional plan dump.

This file is NOT the driver contract — bench.py stays frozen.  Usage:

    python bench_extra.py --sf /root/testdata/sf1.0 q1 q2 ...
    python bench_extra.py --sf /root/testdata/sf1.0 --runs 3 --plans plans/r06 q1

With no query names: runs the full bench.BENCH_QUERIES list.
Prints one JSON line {"queries": {...}, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>.txt explain output")
    ap.add_argument("--suffix", default="",
                    help="suffix for plan filenames, e.g. _before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES
    from trustgraph_spark.session import get_spark

    names = args.names or BENCH_QUERIES
    spark = get_spark(app_name="tg-bench-extra", cores=args.cpus)
    qs = entrymod.queries()
    times = {}
    for name in names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, args.sf)
            with open(os.path.join(
                    args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        print(f"  {name}: {times[name]}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"queries": times, "sf_dir": args.sf,
                      "cpus": args.cpus, "runs": args.runs}))


if __name__ == "__main__":
    main()
