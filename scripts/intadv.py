"""INTADV witness (round 13, fourth probe): hostile integer domains
through the relational key/width columns — the join-graph axis.

USERKEY (round 12) attacked ``events.user_id``; DOCKEY/VECKEY pinned
the document/embedding identities. The TPC-H tier's OWN integer
columns have only ever carried dense generator ranges, yet 63
registered queries consume them: every join in the TPC-H pack, the
whole graph family (co-purchase edges minted from l_partkey ×
o_custkey), the rec pack, asof joins and window partitions keyed on
o_custkey, set ops on nationkeys, zorder bit-interleave on custkey,
and q16/q19's p_size arithmetic.

Primary-key columns stay INTACT (uniqueness is a pinned precondition —
the DOCKEY/VECKEY doctrine); the hostility goes on FOREIGN keys and
non-key integer attributes, where NULL/orphan/negative/huge are
legitimate data-quality states a 100 TB lake WILL contain:

- **NULL FKs**: l_partkey / l_suppkey / o_custkey / c_nationkey —
  inner joins must drop them IDENTICALLY, outer joins must keep them,
  graph edge-mint must not fabricate a NULL node, window partitions
  get a NULL group.
- **orphan FKs**: negated keys and no-match nationkeys (999999) — FK
  integrity is an assumption the engines must fail the same way
  (dq_relationship_profile exists to REPORT it, not crash on it).
- **near-2^63 longs**: 2^62-offset custkeys/partkeys through hash
  partitioning, pmod salting, the zorder ``% 2^16`` fold, and graph
  node ids (any kernel that adds/multiplies a key overflows ANSI-ly).
- **int32 extremes**: p_size / l_linenumber / c_nationkey at
  INT32_MAX / INT32_MIN / 0 / negative — width-promotion parity
  (Spark int vs DuckDB INTEGER arithmetic) and group-key extremes.

Money/date/text columns stay CLEAN (TPCHADV/STRADV own those axes);
the relational ingest contract is an identity here.

Usage: python scripts/intadv.py [queries...]
Fixture at /tmp/sgs_intadv/ (delete to rebuild). Full-registry
attestation: python scripts/selfcheck.py /tmp/sgs_intadv
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from scripts.selfcheck import compare
from spark_streaming_stream_analyzer_spark.session import get_spark
from spark_streaming_stream_analyzer_spark.sources.tables import TABLE_NAMES

SRC = "/root/testdata/sf0.001"
OUT = "/tmp/sgs_intadv"

SPEC = {
    "lineitem": (
        "l_orderkey,"
        " CASE WHEN l_orderkey % 181 = 0 THEN NULL"
        " WHEN l_orderkey % 191 = 0 THEN -l_partkey"
        " WHEN l_orderkey % 193 = 0 THEN 4611686018427387904 + l_partkey"
        " ELSE l_partkey END AS l_partkey,"
        " CASE WHEN l_orderkey % 197 = 0 THEN NULL"
        " WHEN l_orderkey % 199 = 0 THEN -l_suppkey"
        " ELSE l_suppkey END AS l_suppkey,"
        " CASE WHEN l_orderkey % 211 = 0 THEN 2147483647"
        " WHEN l_orderkey % 223 = 0 THEN -7"
        " WHEN l_orderkey % 227 = 0 THEN 0"
        " ELSE l_linenumber END AS l_linenumber,"
        " l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate"
    ),
    "orders": (
        "o_orderkey,"
        " CASE WHEN o_orderkey % 137 = 0 THEN NULL"
        " WHEN o_orderkey % 139 = 0 THEN -o_custkey"
        " WHEN o_orderkey % 149 = 0 THEN 4611686018427387904 + o_custkey"
        " ELSE o_custkey END AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
    ),
    "customer": (
        "c_custkey, c_name,"
        " CASE WHEN c_custkey % 23 = 0 THEN NULL"
        " WHEN c_custkey % 29 = 0 THEN 2147483647"
        " WHEN c_custkey % 31 = 0 THEN -1"
        " ELSE c_nationkey END AS c_nationkey,"
        " c_acctbal, c_mktsegment"
    ),
    "supplier": (
        "s_suppkey, s_name,"
        " CASE WHEN s_suppkey % 5 = 0 THEN 999999"
        " ELSE s_nationkey END AS s_nationkey,"
        " s_acctbal"
    ),
    "part": (
        "p_partkey, p_name, p_brand, p_type,"
        " CASE WHEN p_partkey % 53 = 0 THEN NULL"
        " WHEN p_partkey % 59 = 0 THEN 2147483647"
        " WHEN p_partkey % 61 = 0 THEN -2147483648"
        " WHEN p_partkey % 67 = 0 THEN 0"
        " ELSE p_size END AS p_size,"
        " p_retailprice"
    ),
}

DEFAULT_QUERIES = [
    # TPC-H joins over hostile FKs
    "q2_min_cost_supplier", "q3_shipping_priority", "q5_local_supplier_volume",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_values", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_part_supplier_counts",
    "q17_small_quantity_revenue", "q18_large_volume_customer",
    "q19_disjunctive_filter", "q20_part_promotion_suppliers",
    "q21_waiting_suppliers", "q22_idle_customers",
    # join pack
    "join_semi", "join_anti", "join_full_outer", "join_broadcast_agg",
    "join_asof_latest_order", "join_asof_forward", "join_asof_nearest",
    "join_pit_training_assembly", "join_salted_skew", "join_bloom_prefilter",
    # graph family: co-purchase edges minted from hostile keys
    "graph_pagerank_exact", "graph_connected_components",
    "graph_triangle_count", "graph_kcore", "graph_bfs_distances",
    "graph_degree_histogram", "graph_degree_assortativity",
    "graph_jaccard_neighbors", "graph_jaccard_capped",
    # rec pack
    "rec_copurchase_topk", "rec_popularity_baseline", "rec_eval_metrics",
    # windows / asof partitions on o_custkey, distinct counts, audits
    "window_analytics", "window_rank_funcs", "window_range_frame",
    "window_first_last", "window_topk_per_group", "sort_limit_topk",
    "agg_multi_distinct", "count_distinct_exact", "approx_distinct_merge",
    "approx_distinct_portable", "approx_aggs", "assoc_rules_pairs",
    "dq_relationship_profile", "dq_constraint_audit", "dq_checksum_buckets",
    "dq_pipeline_fingerprint", "skew_key_profile", "sample_split_hash",
    "layout_zorder_stats", "set_ops", "set_ops_all", "sql_lateral",
    "sql_surface",
]


def build() -> str:
    if os.path.isdir(OUT) and os.path.exists(os.path.join(OUT, "lineitem.parquet")):
        return OUT
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        sel = SPEC.get(t, "*")
        con.execute(
            f"COPY (SELECT {sel} FROM {src}) TO '{OUT}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
    print("fixture built", flush=True)
    return OUT


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    d = build()
    spark = get_spark("intadv")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(d, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    fails = 0
    for name in names:
        print(f"run  {name} ...", flush=True)
        t0 = time.time()
        try:
            sdf = qs[name](spark, d).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}", flush=True)
            fails += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"rows {name}: {len(sdf)} [{t1 - t0:.1f}s]", flush=True)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}", flush=True)
            fails += 1
            continue
        t2 = time.time()
        problems = compare(name, sdf, odf)
        timing = f"[spark {t1 - t0:.1f}s oracle {t2 - t1:.1f}s]"
        if problems:
            fails += 1
            print(
                f"FAIL {name}: " + "; ".join(p[:200] for p in problems)
                + f" {timing}",
                flush=True,
            )
        else:
            print(f"ok   {name}: {len(sdf)} rows {timing}", flush=True)
    print(f"\n{fails} failures / {len(names)}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
