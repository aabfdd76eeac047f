"""STRADV witness (round 13, third probe): hostile TEXT through the
relational string surface — the one fixture axis the text probes never
attacked.

UNIADV/GIANTDOC/DOCKEY hammered ``documents.text``; the TPC-H tier's
string columns (p_name/p_brand/p_type, o_orderpriority/o_orderstatus,
l_returnflag/l_linestatus, c_name/c_mktsegment, s_name, n_name) have
only ever carried their generator vocabulary. 51 registered queries
read them — as GROUP BY keys, IN-list filters, LIKE/regexp subjects,
md5 fingerprint input, join keys, and levenshtein arguments
(string_funcs). Classes, keyed on row mods of each table's own key so
every class lands in several groups:

- **NULL / empty text**: NULL group keys (Spark NULLS FIRST vs DuckDB
  NULLS LAST only matters for ORDER BY, but NULL groups, NULL in
  concat-then-hash chains, and NULL LIKE/NOT-LIKE filter semantics
  all get exercised), '' as a distinct-from-NULL key.
- **metacharacters as data**: '%'/'_' in LIKE subjects, unbalanced
  '(' in the regexp_extract subject, newline/tab/CR inside group
  keys (multiline rows through every groupBy and the md5 digest).
- **NUL byte**: 'ab\\x00cd' in p_name — length-prefixed strings in
  both engines, but any C-string shortcut in a hash/concat path
  truncates at the NUL and diverges.
- **unicode traps**: ẞ / non-final Σ / combining mark / astral plane
  in p_name (hits lower()), uppercase-Greek/CJK in o_orderstatus
  group keys. Turkish İ and word-final Σ are EXCLUDED by design:
  Java lower() emits i+U+0307 / context-sensitive ς where DuckDB's
  utf8proc simple mapping emits i / σ — an engine-native divergence,
  pinned as knowledge in tests/test_edge_divergence.py
  (test_lower_casemap_divergence). string_funcs is the repo's only
  raw lower()/upper() exposure; every other case-fold immediately
  ASCII-gates (regexp_replace [^a-z0-9 ]), which is why the UNIADV
  İ/ς fixture attested clean.
- **long strings**: 50 KB p_name, 10 KB p_brand/p_type/o_orderpriority
  /c_name — group-by on wide keys, lpad truncation parity, and the
  quadratic probe: one row where BOTH levenshtein args are 10 KB
  (1e8 DP cells — measurable, extrapolates to the 100 KB job-killer).
- **numeric-looking text**: 'Brand#999999999999999999999' through
  regexp_extract's digit capture (stays TEXT; any int-cast shortcut
  overflows).

Money/date columns stay CLEAN (unlike TPCHADV) to isolate the text
axis; the relational ingest contract is an identity here.

Usage: python scripts/stradv.py [queries...]
Fixture at /tmp/sgs_stradv/ (delete to rebuild). Full-registry
attestation: python scripts/selfcheck.py /tmp/sgs_stradv
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
OUT = "/tmp/sgs_stradv"

SPEC = {
    "part": (
        "p_partkey,"
        " CASE WHEN p_partkey % 53 = 0 THEN NULL"
        " WHEN p_partkey % 59 = 0 THEN ''"
        " WHEN p_partkey % 61 = 0 THEN 'line1' || chr(10) || 'line2' || chr(9) || 'tab' || chr(13) || 'cr end'"
        " WHEN p_partkey % 67 = 0 THEN 'Ünïcòdé ẞtraße ΣΟΦΙΑ x' || chr(803) || ' 𝕏𝟘'"
        " WHEN p_partkey % 71 = 0 THEN 'ab' || chr(0) || 'cd'"
        " WHEN p_partkey % 73 = 0 THEN repeat('PROMO ANODIZED ', 3334)"
        " ELSE p_name END AS p_name,"
        " CASE WHEN p_partkey % 23 = 0 THEN 'Brand#%_'"
        " WHEN p_partkey % 29 = 0 THEN 'Brand#(12'"
        " WHEN p_partkey % 31 = 0 THEN NULL"
        " WHEN p_partkey % 37 = 0 THEN ''"
        " WHEN p_partkey % 41 = 0 THEN 'Brand#999999999999999999999'"
        " WHEN p_partkey % 43 = 0 THEN repeat('Brand#42', 1250)"
        " WHEN p_partkey % 199 = 0 THEN repeat('Brand#4243', 1000)"
        " ELSE p_brand END AS p_brand,"
        " CASE WHEN p_partkey % 79 = 0 THEN NULL"
        " WHEN p_partkey % 83 = 0 THEN '%BRASS'"
        " WHEN p_partkey % 89 = 0 THEN ''"
        " WHEN p_partkey % 97 = 0 OR p_partkey % 199 = 0"
        "   THEN repeat('MEDIUM POLISHED TIN ', 500)"
        " ELSE p_type END AS p_type,"
        " p_size, p_retailprice"
    ),
    "orders": (
        "o_orderkey, o_custkey,"
        " CASE WHEN o_orderkey % 79 = 0 THEN NULL"
        " WHEN o_orderkey % 83 = 0 THEN 'ΩЯ中'"
        " ELSE o_orderstatus END AS o_orderstatus,"
        " o_totalprice, o_orderdate,"
        " CASE WHEN o_orderkey % 61 = 0 THEN NULL"
        " WHEN o_orderkey % 67 = 0 THEN ''"
        " WHEN o_orderkey % 71 = 0 THEN repeat('1-URGENT', 1250)"
        " WHEN o_orderkey % 73 = 0 THEN '1-URGENT' || chr(10) || '2-HIGH'"
        " ELSE o_orderpriority END AS o_orderpriority"
    ),
    "lineitem": (
        "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,"
        " l_extendedprice, l_discount, l_tax,"
        " CASE WHEN l_orderkey % 163 = 0 THEN NULL"
        " WHEN l_orderkey % 167 = 0 THEN 'R' || chr(10)"
        " ELSE l_returnflag END AS l_returnflag,"
        " CASE WHEN l_orderkey % 173 = 0 THEN ''"
        " WHEN l_orderkey % 179 = 0 THEN NULL"
        " ELSE l_linestatus END AS l_linestatus,"
        " l_shipdate"
    ),
    "customer": (
        "c_custkey,"
        " CASE WHEN c_custkey % 19 = 0 THEN NULL"
        " WHEN c_custkey % 29 = 0 THEN repeat('Customer#', 1111)"
        " ELSE c_name END AS c_name,"
        " c_nationkey, c_acctbal,"
        " CASE WHEN c_custkey % 13 = 0 THEN NULL"
        " WHEN c_custkey % 17 = 0 THEN ''"
        " ELSE c_mktsegment END AS c_mktsegment"
    ),
    "supplier": (
        "s_suppkey,"
        " CASE WHEN s_suppkey % 7 = 0 THEN NULL"
        " ELSE s_name END AS s_name,"
        " s_nationkey, s_acctbal"
    ),
    "nation": (
        "n_nationkey,"
        " CASE WHEN n_nationkey % 23 = 0 THEN NULL"
        " ELSE n_name END AS n_name,"
        " n_regionkey"
    ),
}

DEFAULT_QUERIES = [
    # TPC-H shapes whose filters/joins/groups touch text
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q12_late_priority_counts", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_part_supplier_counts",
    "q17_small_quantity_revenue", "q18_large_volume_customer",
    "q19_disjunctive_filter", "q20_part_promotion_suppliers",
    "q21_waiting_suppliers", "q22_idle_customers",
    # text group keys / distinct / approx
    "agg_boolean_pack", "agg_collect_ordered", "agg_corr_covar",
    "agg_cube", "agg_grouping_sets", "agg_mode_qty", "agg_multi_distinct",
    "agg_rollup", "agg_value_deciles", "agg_weighted_median",
    "approx_aggs", "approx_distinct_merge", "approx_distinct_portable",
    "count_distinct_exact", "distinct_dedup", "percentile_exact",
    "feature_quantile_bins", "sample_split_hash", "target_encode_oof",
    # joins keyed/filtered on text
    "join_anti", "join_semi", "join_bloom_prefilter", "join_broadcast_agg",
    "join_pit_training_assembly", "join_salted_skew",
    # string surface proper + hashing + misc
    "string_funcs", "dq_pipeline_fingerprint", "dq_checksum_buckets",
    "sql_exists_subquery", "sql_surface", "window_topk_per_group",
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
    spark = get_spark("stradv")
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
