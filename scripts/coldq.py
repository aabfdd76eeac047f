"""Cold-regime single-query timer: one fresh session per invocation.

Replicates bench.py's per-query regime for a NAMED subset: fresh
SparkSession, a warmup pass of each named query at sf0.001 (JIT/codegen
paid outside the window, exactly like bench.py's warmup loop), then ONE
timed noop-sink pass per query at the bench sf. Run it in a fresh
subprocess per rep and interleave variants to A/B a kernel under the
driver's own cold regime (bench.py itself costs the whole 72-query wall
per datapoint).

Usage: python scripts/coldq.py [--sf=DIR] [--tag=LABEL] QUERY [QUERY ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_stream_analyzer_spark import registry  # noqa: E402
from spark_streaming_stream_analyzer_spark.session import get_spark  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("queries", nargs="+")
    p.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    p.add_argument("--tag", default="", help="free label echoed in the output")
    args = p.parse_args()

    spark = get_spark("coldq")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"coldq-warm:{name}")
        force(registry.QUERIES[name](spark, warm_dir))
        spark.catalog.clearCache()

    out = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"coldq:{name}")
        t0 = time.time()
        force(registry.QUERIES[name](spark, args.sf))
        out[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "tag": args.tag,
                "queries": out,
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
