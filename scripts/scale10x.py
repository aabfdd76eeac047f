"""10x scale validation: replicate the sf0.1 fixtures 10x with shifted
keys, then time a headline-query subset at both scales and print the
ratios. The point is the TREND (would the plan survive another 10x?),
not absolute numbers: overhead-dominated queries should ratio ~1x,
scan-bound ones ~=10x/32 cores, and nothing should blow up
super-linearly.

Key shifts keep join and dedup cardinalities honest: every replica
gets disjoint event/user/doc/vec/order/customer keys, so per-key group
sizes stay constant while key cardinality grows 10x; document TEXT is
replicated unchanged, so every doc gains 9 exact near-dup copies and
the LSH candidate load scales 45x-per-dup-set (bucket caps must hold).

Usage: python scripts/scale10x.py [n_replicas] [query ...]
Writes replicas to /tmp/sgs_scale10x/ (reused if present).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/sgs_scale10x"
SHIFT = 100_000_000  # beyond every fixture key range

#: table -> columns to shift per replica (disjoint key spaces per copy)
SHIFTS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
}
PASSTHROUGH = ["region", "nation", "supplier", "part"]

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "agg_running_stats",
    "agg_corr_covar",
    "agg_session_window",
    "ts_rolling_window_1h",
    "fn_event_time_pack",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_cosine",
    "approx_distinct_portable",
]


def build(n: int) -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t, cols in SHIFTS.items():
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        shifted = ", ".join(
            [f"{c} + i * {SHIFT} AS {c}" for c in cols]
            + [f"t.{c}" for c in _other_cols(con, t, cols)]
        )
        con.execute(
            f"COPY (SELECT {shifted} "
            f"FROM read_parquet('{SRC}/{t}.parquet') t, range({n}) r(i)) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
        print(f"built {t} x{n}")
    for t in PASSTHROUGH:
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(SRC, f"{t}.parquet"), dst)


def _other_cols(con, t: str, shifted: list[str]) -> list[str]:
    rows = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
    ).fetchall()
    return [r[0] for r in rows if r[0] not in shifted]


def _library_op(name: str):
    """Resolve library-only operators (tested but not registered as
    queries — e.g. scale-safe variants awaiting a rotation slot) so
    they can be probed before registration."""
    from spark_streaming_stream_analyzer_spark.operators import graph, similarity

    return {
        "graph_jaccard_capped": graph.graph_jaccard_capped,
        "emb_knn_srp_graph": similarity.emb_knn_srp_graph,
    }[name]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2:]
    names = only or DEFAULT_QUERIES
    build(n)

    from spark_streaming_stream_analyzer_spark import registry
    from spark_streaming_stream_analyzer_spark.session import get_spark

    spark = get_spark("scale10x")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    print(f"| query | sf0.1 s | {n}x s | ratio |")
    print("|---|---|---|---|")
    for name in names:
        fn = registry.QUERIES.get(name) or _library_op(name)
        force(fn(spark, SRC))  # warm (codegen, page cache)
        t0 = time.time()
        force(fn(spark, SRC))
        base = time.time() - t0
        spark.catalog.clearCache()
        force(fn(spark, OUT))  # warm at scale
        t0 = time.time()
        force(fn(spark, OUT))
        big = time.time() - t0
        spark.catalog.clearCache()
        print(f"| {name} | {base:.1f} | {big:.1f} | {big / base:.1f}x |")


if __name__ == "__main__":
    main()
