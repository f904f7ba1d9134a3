"""Pinned interleaved A/B for single registry queries: current tree vs
a pre-change checkout, with the single-query discipline from
BENCH/BASELINE.md (taskset-pinned subprocess, warm best-of-3, arms
interleaved in fresh subprocesses so JVM/JIT state never crosses).
Generalizes tools/bench_minhash_ab.py (r5 session-3) to any query
list.

Usage:
  python tools/bench_ab.py --child <repo_root> <query>     # one arm
  python tools/bench_ab.py <pre_change_worktree> <q1> [q2 ...]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

SF_DIR = "/root/testdata/sf0.1"


def child(repo: str, query: str) -> None:
    sys.path.insert(0, repo)
    from trustgraph_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark(cores=32)
    fn = e.queries()[query]
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        fn(spark, SF_DIR).count()
        best = min(best, time.monotonic() - t0)
    print(json.dumps({"query": query, "best": round(best, 2)}))
    spark.stop()


def run_arm(repo: str, query: str) -> float:
    out = subprocess.run(
        ["taskset", "-c", "0-31", sys.executable, __file__,
         "--child", repo, query],
        capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["best"]


def main() -> None:
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1], sys.argv[-1])
        return
    pre = sys.argv[1]
    for q in sys.argv[2:]:
        walls = {"head": [], "pre": []}
        for _ in range(2):  # interleave: head, pre, head, pre
            walls["head"].append(run_arm("/root/repo", q))
            walls["pre"].append(run_arm(pre, q))
        print(f"{q}: HEAD {walls['head']}  PRE {walls['pre']}")


if __name__ == "__main__":
    main()
