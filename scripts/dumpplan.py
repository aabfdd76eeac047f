"""Dump .explain("formatted") for named queries to plans/<dir>/<q>_<suffix>.txt.

Usage: python scripts/dumpplan.py --dir=plans/r14 --suffix=after Q [Q ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_stream_analyzer_spark import registry  # noqa: E402
from spark_streaming_stream_analyzer_spark.session import get_spark  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("names", nargs="+", metavar="query")
    p.add_argument("--dir", default="plans/r14", dest="out_dir")
    p.add_argument("--suffix", default="after")
    p.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_spark("dumpplan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.names:
        df = registry.QUERIES[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
