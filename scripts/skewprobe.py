"""Skew-stress probe (VERDICT r7 item 7).

The 10x probes replicate data UNIFORMLY — they witness linear scaling
but never the condition the hot-bucket caps and AQE skew-join handling
exist for. This probe builds a deliberately skewed twin of sf0.01
(same cardinalities, same schemas) and times the most expensive
headline queries on both:

- events: one hot user owns 20% of all events;
- lineitem: one hot part appears in 20% of all lineitems (a hub node
  of huge degree for the graph ops);
- documents: one mega-document 200x the average length, plus one hot
  source owning 20% of docs;
- embeddings: 20% of vectors are byte-identical (one hot LSH/SRP
  bucket — exactly the regime the band caps quarantine).

A healthy plan reads within ~2x of base; a super-linear blowup means a
cap is not binding or a shuffle is collapsing onto the hot key.

Usage: python scripts/skewprobe.py [base_sf_dir]
Prints one table row per query: base_s, skew_s, ratio.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

PROBES = [
    # the top-5 expensive headline queries (BENCH_FULL_LATEST) + the
    # two round-8 scale-safe twins whose caps exist FOR skew
    "graph_kcore",
    "pipeline_doc_scorecard",
    "dedup_minhash_lsh",
    "dq_column_profile",
    "sim_srp_topk",
    "graph_jaccard_capped",
    "emb_knn_srp_graph",
]

SKEW_DIR = "/tmp/sgs_sf_skew"


def build_skew_fixture(src: str, dst: str) -> None:
    from spark_streaming_stream_analyzer_spark.sources.tables import TABLE_NAMES

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    spec = {
        "events": (
            "event_id, ts, CASE WHEN event_id % 5 = 0 THEN 1 ELSE user_id"
            " END AS user_id, event_type, value, props"
        ),
        "lineitem": (
            "* REPLACE (CASE WHEN l_orderkey % 5 = 0 THEN 1 ELSE l_partkey"
            " END AS l_partkey)"
        ),
        "documents": (
            "doc_id, CASE WHEN doc_id = (SELECT MIN(doc_id) FROM "
            f"read_parquet('{src}/documents.parquet')) THEN repeat(text, 200)"
            " ELSE text END AS text, lang, CASE WHEN doc_id % 5 = 0 THEN"
            " 'hot_source' ELSE source END AS source, CASE WHEN doc_id ="
            f" (SELECT MIN(doc_id) FROM read_parquet('{src}/documents.parquet'))"
            " THEN n_chars * 200 ELSE n_chars END AS n_chars"
        ),
        "embeddings": (
            "vec_id, CASE WHEN vec_id % 5 = 0 THEN (SELECT embedding FROM "
            f"read_parquet('{src}/embeddings.parquet') ORDER BY vec_id LIMIT 1)"
            " ELSE embedding END AS embedding, label"
        ),
    }
    for t in TABLE_NAMES:
        sel = spec.get(t, "*")
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from spark_streaming_stream_analyzer_spark import registry
    from spark_streaming_stream_analyzer_spark.session import get_spark

    build_skew_fixture(base, SKEW_DIR)
    spark = get_spark("skewprobe")
    # warm the session off the probe clock with a NON-probed query —
    # warming with a probe member gave that probe a uniquely hot base
    # timing and biased its skew/base ratio upward (round-8 review)
    registry.QUERIES["agg_running_stats"](spark, base).collect()

    print(f"{'query':28s} {'base_s':>8s} {'skew_s':>8s} {'ratio':>6s}  rows(b/s)")
    worst = 0.0
    for name in PROBES:
        fn = registry.QUERIES[name]
        t0 = time.time()
        nb = len(fn(spark, base).collect())
        tb = time.time() - t0
        t0 = time.time()
        ns = len(fn(spark, SKEW_DIR).collect())
        tsk = time.time() - t0
        ratio = tsk / tb if tb > 0 else float("inf")
        worst = max(worst, ratio)
        print(f"{name:28s} {tb:8.2f} {tsk:8.2f} {ratio:6.2f}  {nb}/{ns}")
    print(f"\nworst skew ratio: {worst:.2f}x (super-linear threshold ~3x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
