"""TPCHADV witness (round 13, second probe): hostile money/quantity
magnitudes and date extremes through the relational tier — the tables
that, unlike ``events``, carry NO ingest contract.

The events table earned its two-clause contract from the round-8/9
finds (one NaN or one ±2^63/100 value ANSI-kills every exact-cents
job; one 2200-dated row inflates a calendar grid 60,000×). The TPC-H
tier has the same exposure classes and none of the armor:

- **money/quantity overflow**: ``round(v*100)::BIGINT`` on
  l_extendedprice / l_quantity / o_totalprice / *_acctbal with
  v ~ 1e300 overflows in BOTH engines (ANSI CAST_OVERFLOW vs DuckDB
  conversion error) — one absurd row kills q1 and every
  exact-cents aggregate downstream.
- **NaN/Inf measurements**: same class, NaN poisons where it doesn't
  crash.
- **date extremes**: l_shipdate / o_orderdate at 0001-01-01 /
  9999-12-31 / NULL — comparisons must agree (they should: both
  engines order timestamps totally), date arithmetic on the columns
  (datediff grids, interval adds) may explode or overflow, and the
  as-of/graph/rec kernels keyed on order rows inherit whatever falls
  out.

Classes are keyed on row mods of the table's own key so every class
lands in several groups. Usage: python scripts/tpchadv.py [queries...]
Fixture at /tmp/sgs_tpchadv/ (delete to rebuild). Full-registry
attestation: python scripts/selfcheck.py /tmp/sgs_tpchadv
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
OUT = "/tmp/sgs_tpchadv"

#: per-table projection overrides (DuckDB SQL against the sf0.001 files)
SPEC = {
    "lineitem": (
        "l_orderkey, l_partkey, l_suppkey, l_linenumber,"
        # quantity: NaN / +Inf / near-2^63/100 / negative
        " CASE WHEN l_orderkey % 101 = 0 THEN 'nan'::DOUBLE"
        " WHEN l_orderkey % 103 = 0 THEN 'inf'::DOUBLE"
        " WHEN l_orderkey % 107 = 0 THEN 9.3e16"
        " WHEN l_orderkey % 109 = 0 THEN -5.0"
        " ELSE l_quantity END AS l_quantity,"
        # price: 1e300 overflow / negative / NULL
        " CASE WHEN l_orderkey % 113 = 0 THEN 1e300"
        " WHEN l_orderkey % 127 = 0 THEN -l_extendedprice"
        " WHEN l_orderkey % 131 = 0 THEN NULL"
        " ELSE l_extendedprice END AS l_extendedprice,"
        # discount/tax: out-of-domain but small
        " CASE WHEN l_orderkey % 137 = 0 THEN 1.5"
        " WHEN l_orderkey % 139 = 0 THEN -0.25"
        " ELSE l_discount END AS l_discount, l_tax,"
        " l_returnflag, l_linestatus,"
        # shipdate: min/max representable-ish, NULL
        " CASE WHEN l_orderkey % 149 = 0 THEN TIMESTAMP '0001-01-01 00:00:00'"
        " WHEN l_orderkey % 151 = 0 THEN TIMESTAMP '9999-12-31 23:59:59.999999'"
        " WHEN l_orderkey % 157 = 0 THEN NULL"
        " ELSE l_shipdate END AS l_shipdate"
    ),
    "orders": (
        "o_orderkey, o_custkey, o_orderstatus,"
        " CASE WHEN o_orderkey % 101 = 0 THEN 1e300"
        " WHEN o_orderkey % 103 = 0 THEN 'nan'::DOUBLE"
        " WHEN o_orderkey % 107 = 0 THEN NULL"
        " ELSE o_totalprice END AS o_totalprice,"
        " CASE WHEN o_orderkey % 109 = 0 THEN TIMESTAMP '0001-01-01 00:00:00'"
        " WHEN o_orderkey % 113 = 0 THEN TIMESTAMP '9999-12-31 23:59:59.999999'"
        " WHEN o_orderkey % 127 = 0 THEN NULL"
        " ELSE o_orderdate END AS o_orderdate, o_orderpriority"
    ),
    "customer": (
        "c_custkey, c_name, c_nationkey,"
        " CASE WHEN c_custkey % 53 = 0 THEN 1e300"
        " WHEN c_custkey % 59 = 0 THEN 'nan'::DOUBLE"
        " ELSE c_acctbal END AS c_acctbal, c_mktsegment"
    ),
    "supplier": (
        "s_suppkey, s_name, s_nationkey,"
        " CASE WHEN s_suppkey % 13 = 0 THEN -1e300"
        " ELSE s_acctbal END AS s_acctbal"
    ),
    "part": (
        "p_partkey, p_name, p_brand, p_type, p_size,"
        " CASE WHEN p_partkey % 53 = 0 THEN 1e300"
        " WHEN p_partkey % 59 = 0 THEN 'inf'::DOUBLE"
        " ELSE p_retailprice END AS p_retailprice"
    ),
}

DEFAULT_QUERIES = [
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_values",
    "q12_late_priority_counts", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_part_supplier_counts",
    "q17_small_quantity_revenue", "q18_large_volume_customer",
    "q19_disjunctive_filter", "q20_part_promotion_suppliers",
    "q21_waiting_suppliers", "q22_idle_customers",
    "agg_value_deciles", "agg_weighted_median", "agg_mode_qty",
    "agg_corr_covar", "window_range_frame", "window_topk_per_group",
    "join_range_price_band", "join_asof_latest_order",
    "join_pit_training_assembly", "sort_pareto_front",
    "percentile_exact", "date_funcs", "dq_benford", "dq_checksum_buckets",
    "feature_quantile_bins", "layout_zorder_stats", "sample_split_hash",
    "target_encode_oof", "skew_key_profile", "sql_surface",
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
    spark = get_spark("tpchadv")
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
