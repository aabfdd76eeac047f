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
    "q6_forecast_revenue",
    "agg_grouping_sets",
    "agg_session_window",
    "agg_corr_covar",
    "join_range_price_band",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_topk_cosine",
    "text_quality_score",
    "doc_fingerprint",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "q11_important_values",
    "q12_late_priority_counts",
    "q21_waiting_suppliers",
    "anomaly_zscore",
    "text_tfidf_topk",
    "join_bloom_prefilter",
    "sim_srp_topk",
    "approx_cms_topk",
    "cohort_retention",
    "sql_recursive",
    "text_repetition_metrics",
    "text_decontaminate",
    "ts_rollup_hierarchy",
    "pack_token_budget",
    "fn_event_time_pack",
    "ts_gap_stats",
    "ts_rolling_window_1h",
]

#: Throughput probes: query → fixture table whose full scan dominates
#: its input. rows/s = table rows ÷ measured wall; tracked per round so
#: the scaling trend (same machine, growing sf) is gradeable, not just
#: total wall time.
THROUGHPUT_TABLES = {
    "agg_running_stats": "events",
    "q1_pricing_summary": "lineitem",
    "agg_batch_wordcount": "documents",
    "dedup_minhash_lsh": "documents",
    "ts_rolling_window_1h": "events",
}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    queries = {k: v for k, v in registry.QUERIES.items() if k in HEADLINE}
    # warmup: run every headline query once at the smallest sf to pay
    # JVM/codegen/JIT costs outside the measured window — the plans are
    # shape-identical, so janino/JIT caches are hot when the timed pass
    # runs. Measured numbers then reflect steady-state throughput (what
    # a long-lived cluster session sees), not one-off class compiles.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for fn in queries.values():
        force(fn(spark, warm_dir))
        spark.catalog.clearCache()
    # absorb first-touch costs at the bench sf (page cache, parquet
    # footers) outside the measured window
    if queries:
        force(next(iter(queries.values()))(spark, sf_dir))
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.time()
        force(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        # drop any cache the query built so queries are independent
        # (un-timed: cache lifecycle is not part of the measured work)
        spark.catalog.clearCache()

    throughput: dict[str, float] = {}
    for name, table in THROUGHPUT_TABLES.items():
        if name not in timings or timings[name] <= 0:
            continue
        n = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet")).count()
        throughput[f"{name}_rows_per_sec"] = round(n / timings[name], 1)

    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "throughput": throughput,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
