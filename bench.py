"""Benchmark harness: runs the headline query set and prints ONE JSON line.

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Each query is forced with the noop sink (full execution, no driver-side
collect skew). First query absorbs JVM/session warmup; a `_warmup`
pass over tiny data runs first so measured numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_streaming_stream_analyzer_spark import registry  # noqa: E402
from spark_streaming_stream_analyzer_spark.session import get_spark  # noqa: E402

#: The headline set — updated as operator coverage widens.
HEADLINE = [
    "agg_running_stats",
    "agg_running_stats_by_type",
    "agg_naive_variance",
    "agg_batch_wordcount",
    "proj_json_extract_pair",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "text_quality_score",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    queries = {k: v for k, v in registry.QUERIES.items() if k in HEADLINE}
    # warmup: run the first available query once at the bench sf to pay
    # JVM/codegen/parquet-footer costs outside the measured window
    if queries:
        force(next(iter(queries.values()))(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.time()
        force(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
