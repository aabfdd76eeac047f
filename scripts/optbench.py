"""Warmed per-query A/B timer for optimization work (round 13).

Times named registry queries in ONE session: 2 warmup passes then
``--reps`` timed noop-sink runs each, reporting min/median. Unlike
bench.py (cold, one pass, full headline set) this isolates a single
kernel's steady-state cost so a before/after edit can be compared
without paying the whole bench's wall clock. Numbers here are NOT
comparable to bench.py rows (warm vs cold); use them only for A/B
deltas of the same query on the same host.

Usage: python scripts/optbench.py q1 q2 ... [--reps N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_stream_analyzer_spark import registry  # noqa: E402
from spark_streaming_stream_analyzer_spark.session import get_spark  # noqa: E402


def main() -> int:
    # argparse (round-14 ADVICE fix): the hand-rolled loop silently
    # ignored misspelled '--' flags and crashed on the space-separated
    # forms its own usage string advertised.
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("names", nargs="+", metavar="query")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        dest="sf_dir",
    )
    args = p.parse_args()
    names, reps, sf_dir = args.names, args.reps, args.sf_dir
    spark = get_spark("optbench")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"optbench:{name}")
        for _ in range(2):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {
            "min": min(walls),
            "median": round(statistics.median(walls), 3),
            "walls": walls,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "loadavg_1m": round(os.getloadavg()[0], 2),
                      "summary": {k: v["median"] for k, v in out.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
