"""Flagship throughput A/B: r10 binary vs HEAD (VERDICT r11 item 2).

agg_running_stats read 331k rows/s in the round-10 quiet-window bench
but never above 222k in any round-11-era run, with an unchanged
kernel. This script separates VM class from code: it runs the SAME
measurement against two checkouts of the repo, interleaved A B A B ...
within one quiet window, so ambient drift hits both sides equally.

Each rep is a fresh subprocess (own SparkSession, fully cold JVM) that
loads the target checkout's ``__spark_entry__``, runs 2 warmups then
``--reps`` timed runs of the flagship + 2 controls from the same
events-table tier, and prints one JSON line of per-query best/median
walls. Pairs are then compared rep-by-rep.

Usage:
    python scripts/flagship_ab.py [repoA repoB] [--pairs N] [--reps N]
Defaults: repoA=/tmp/r10ab (a `git worktree add /tmp/r10ab 4134cae`),
repoB=this repo, pairs=3, reps=6, sf dir $SPARK_GRAFT_SF_DIR or sf0.1.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Default: the flagship + 2 same-tier controls (r12 adjudication set).
# Override per investigation with --queries=a,b,c — round 13 adds
# fn_bloom_portable (the one r11->r12 drift outside the ±10% same-code
# band, kernel unchanged per the rotation manifest; VERDICT r12 item 4).
QUERIES = ["agg_running_stats", "agg_naive_variance", "fn_welford_update"]

_CHILD = r"""
import importlib.util, json, os, sys, time
repo = sys.argv[1]; sf = sys.argv[2]; reps = int(sys.argv[3])
queries = json.loads(sys.argv[4])
sys.path.insert(0, repo)
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(repo, "__spark_entry__.py"))
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
# the checkout's own session conf — identical builder to its bench.py,
# so readings are comparable to that round's recorded bench numbers
from spark_streaming_stream_analyzer_spark.session import get_spark
spark = get_spark("flagship-ab")
spark.sparkContext.setLogLevel("ERROR")
qs = m.queries()
out = {}
for name in queries:
    fn = qs[name]
    for _ in range(2):  # warm: JIT, parquet footer cache, shuffle dirs
        fn(spark, sf).write.format("noop").mode("overwrite").save()
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    out[name] = walls
print("ABRESULT " + json.dumps(out), flush=True)
"""


def run_side(repo: str, sf: str, reps: int) -> dict[str, list[float]]:
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, sf, str(reps),
         json.dumps(QUERIES)],
        capture_output=True, text=True, timeout=1200,
    )
    for line in r.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"no result from {repo}: {r.stdout[-500:]} {r.stderr[-2000:]}"
    )


def main() -> int:
    global QUERIES
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repo_a = args[0] if len(args) > 0 else "/tmp/r10ab"
    repo_b = args[1] if len(args) > 1 else HERE
    pairs = 3
    reps = 6
    for a in sys.argv[1:]:
        if a.startswith("--pairs"):
            pairs = int(a.split("=")[1])
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
        if a.startswith("--queries"):
            QUERIES = a.split("=", 1)[1].split(",")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load = os.getloadavg()[0]
    print(f"A={repo_a}  B={repo_b}  sf={sf}  pairs={pairs} reps={reps}"
          f"  start loadavg={load:.2f}", flush=True)
    acc: dict[str, dict[str, list[float]]] = {
        "A": {q: [] for q in QUERIES}, "B": {q: [] for q in QUERIES}}
    for i in range(pairs):
        for side, repo in (("A", repo_a), ("B", repo_b)):
            res = run_side(repo, sf, reps)
            for q, walls in res.items():
                acc[side][q].extend(walls)
            print(f"pair {i + 1} side {side}: " + " ".join(
                f"{q}={min(w):.3f}s(min)/{statistics.median(w):.3f}s(med)"
                for q, w in res.items()), flush=True)
    print("\n== summary (all reps pooled) ==")
    for q in QUERIES:
        a, b = acc["A"][q], acc["B"][q]
        ratio = statistics.median(b) / statistics.median(a)
        print(f"{q}: A min={min(a):.3f} med={statistics.median(a):.3f}"
              f" | B min={min(b):.3f} med={statistics.median(b):.3f}"
              f" | B/A med ratio={ratio:.3f}", flush=True)
    print(f"end loadavg={os.getloadavg()[0]:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
