"""Extended relational surface (SURVEY.md §2.2 / build plan M4).

The reference implements none of these (it has no filter, join, window,
sort, or set operation anywhere — SURVEY.md §2.2 table); they are part
of the "same query capabilities" north star and arrive almost entirely
from Catalyst. This module defines the query shapes Spark-first and
scale-first:

 - **joins**: small dimensions are broadcast (`F.broadcast`) so the
   fact-table scan never shuffles for them; the big fact-fact join
   (lineitem ⋈ orders) is a shuffle hash/sort-merge join on the key
   both sides need anyway. At 100 TB the same plan holds: broadcasting
   region/nation/supplier/part is O(MB); only orders⋈lineitem shuffles.
 - **aggregations** are partial+final HashAggregate (map-side combine)
   — only |groups| rows cross the shuffle.
 - **top-k** is computed with a deterministic total order (explicit
   tiebreak column) so LIMIT selection is stable under any parallelism.
 - money arithmetic routes through ``functions/exact.py`` for
   bit-deterministic results (see that module's rationale).

TPC-H-shaped queries are adapted to the fixture schema (no
l_shipmode/p_container etc.; see FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import avg_money, cents, cents_dec, sum_money
from ..sources.tables import load_table, ts_micros, ts_timestamp


def _disc_price_cents2(ext, disc):
    """(l_extendedprice * (1 - l_discount)) in exact 1e-4 units:
    ext_cents * (100 - disc_cents), DECIMAL(38,0)-safe."""
    return cents_dec(ext) * (F.lit(100).cast("decimal(18,0)") - cents_dec(disc))


DISC_PRICE_SQL = (
    "CAST(round(l_extendedprice*100) AS DECIMAL(18,0))"
    " * (CAST(100 AS DECIMAL(18,0)) - CAST(round(l_discount*100) AS DECIMAL(18,0)))"
)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy aggregate with map-side combine.

    Filter (l_shipdate <= cutoff) is pushed to the parquet scan;
    the aggregate shuffles only |R|x|L| = 6 group rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    charge = _disc_price_cents2("l_extendedprice", "l_discount") * (
        F.lit(100).cast("decimal(18,0)") + cents_dec("l_tax")
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_money("l_quantity").alias("sum_qty"),
            sum_money("l_extendedprice").alias("sum_base_price"),
            (
                F.sum(_disc_price_cents2("l_extendedprice", "l_discount")).cast("double")
                / F.lit(10000.0)
            ).alias("sum_disc_price"),
            (F.sum(charge).cast("double") / F.lit(1000000.0)).alias("sum_charge"),
            avg_money("l_quantity").alias("avg_qty"),
            avg_money("l_extendedprice").alias("avg_price"),
            avg_money("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
  CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE)/10000.0 AS sum_disc_price,
  CAST(SUM({DISC_PRICE_SQL}
        * (CAST(100 AS DECIMAL(18,0)) + CAST(round(l_tax*100) AS DECIMAL(18,0)))) AS DOUBLE)/1000000.0 AS sum_charge,
  (CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0)/CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
  (CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0)/CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
  (CAST(SUM(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/100.0)/CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter → fact join → top-k.

    customer is small → broadcast into orders; orders⋈lineitem is the
    one shuffle join (both sides keyed on orderkey). Top-10 uses a
    deterministic tiebreak (revenue desc, l_orderkey asc) so the LIMIT
    is stable under any partitioning — required for the oracle and for
    reproducibility at scale.
    """
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01")
    )
    return (
        li.join(
            od.join(F.broadcast(cu), od.o_custkey == cu.c_custkey),
            li.l_orderkey == od.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (
                F.sum(_disc_price_cents2("l_extendedprice", "l_discount")).cast(
                    "double"
                )
                / F.lit(10000.0)
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate, o_orderpriority,
       CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE)/10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, all dimensions broadcast.

    Only orders⋈lineitem shuffles; region/nation/customer/supplier ride
    along as broadcast hash joins. The c_nationkey = s_nationkey
    "local supplier" condition is applied post-join as a filter.
    """
    re_ = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    na = load_table(spark, sf_dir, "nation")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .filter(cu.c_nationkey == su.s_nationkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re_), na.n_regionkey == re_.r_regionkey)
        .groupBy("n_name")
        .agg(
            (
                F.sum(_disc_price_cents2("l_extendedprice", "l_discount")).cast(
                    "double"
                )
                / F.lit(10000.0)
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )


Q5_SQL = f"""
SELECT n_name, CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE)/10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC
"""


def join_broadcast_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-join: lineitem ⋈ part (dimension), revenue per brand."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand")
        .agg(
            sum_money("l_extendedprice").alias("brand_revenue"),
            F.count("*").alias("n_items"),
        )
    )


JOIN_BROADCAST_SQL = """
SELECT p_brand,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS brand_revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers that placed a >4500-value order."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 4500.0)
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 4500.0)
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no 'F'-status order."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select(
        "c_custkey", "c_nationkey"
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_nationkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def join_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the user's most recent order at or
    before the event time (Spark lacks a native ASOF join — composed as
    range join + max-by-struct reduction; DuckDB oracle uses a
    correlated window form).

    Scale path: the join keys on user_id (the range bound is a join-side
    predicate), orders per user are bounded, so the fan-out is modest and
    the max(struct) aggregation collapses it back with map-side combine.
    Tiebreak on o_orderkey makes ties deterministic.
    `ts` arrives as bigint nanos (parquet NANOS) → convert to seconds.
    """
    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "event_id",
        "user_id",
        ts_timestamp(ev_raw).alias("ev_ts"),
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    # equi-key + range predicate: no broadcast hint — the join keys on
    # user_id/o_custkey, so Catalyst shuffles both sides on the key (or
    # broadcasts orders when its size stats allow, as at fixture scale);
    # force-broadcasting a fact-sized orders table would be a scale cliff
    joined = ev.join(
        od,
        (ev.user_id == od.o_custkey) & (od.o_orderdate <= ev.ev_ts),
        "inner",
    )
    picked = joined.groupBy("event_id").agg(
        F.max(
            F.struct("o_orderdate", "o_orderkey", "o_totalprice")
        ).alias("best")
    )
    return picked.select(
        "event_id",
        F.col("best.o_orderkey").alias("o_orderkey"),
        F.col("best.o_orderdate").cast("date").cast("string").alias("o_orderdate"),
        F.col("best.o_totalprice").alias("o_totalprice"),
    )


JOIN_ASOF_SQL = """
WITH ev AS (
  SELECT event_id, user_id, ts FROM events
), ranked AS (
  SELECT ev.event_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         row_number() OVER (PARTITION BY ev.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM ev JOIN orders o
    ON ev.user_id = o.o_custkey AND o.o_orderdate <= ev.ts
)
SELECT event_id, o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate, o_totalprice
FROM ranked WHERE rn = 1
"""


def join_pit_training_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time training-example assembly — the feature-store
    join discipline: for every purchase event (the label row), attach
    (a) temporal features from the user's latest order STRICTLY AT OR
    BEFORE the event time (as-of semantics — later orders would be
    label leakage) and (b) static profile features (market segment).
    Events with no prior order keep the row with null order features
    (left join): a training pipeline imputes, it does not drop.

    Scale: the as-of reduction is the keyed range join +
    max-by-struct collapse of ``join_asof_latest_order``; the static
    enrich is a broadcast hash join.
    """
    ev_raw = load_table(spark, sf_dir, "events")
    labels = ev_raw.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        ts_timestamp(ev_raw).alias("ev_ts"),
        F.round(F.col("value") * 100).cast("long").alias("label_cents"),
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    # same no-hint discipline as join_asof_latest_order: orders grows
    # with the fact data, so the planner (not a hard-coded hint) decides
    # broadcast vs shuffle from its size stats
    joined = labels.join(
        od,
        (labels.user_id == od.o_custkey) & (od.o_orderdate <= labels.ev_ts),
        "left",
    )
    picked = joined.groupBy(
        "event_id", "user_id", "label_cents"
    ).agg(F.max(F.struct("o_orderdate", "o_orderkey", "o_totalprice")).alias("b"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return (
        picked.join(F.broadcast(cust), picked.user_id == cust.c_custkey, "left")
        .select(
            "event_id",
            "user_id",
            (F.col("label_cents").cast("double") / F.lit(100.0)).alias("label"),
            F.col("b.o_orderkey").alias("feat_last_orderkey"),
            F.col("b.o_totalprice").alias("feat_last_totalprice"),
            "c_mktsegment",
            "c_acctbal",
        )
    )


JOIN_PIT_SQL = """
WITH labels AS (
  SELECT event_id, user_id, ts AS ev_ts,
         CAST(round(value*100) AS BIGINT) AS label_cents
  FROM events WHERE event_type = 'purchase'
),
ranked AS (
  SELECT l.event_id, l.user_id, l.label_cents,
         o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC,
                                     o.o_totalprice DESC) AS rn
  FROM labels l LEFT JOIN orders o
    ON l.user_id = o.o_custkey AND o.o_orderdate <= l.ev_ts
)
SELECT r.event_id, r.user_id,
       CAST(r.label_cents AS DOUBLE) / 100.0 AS label,
       r.o_orderkey AS feat_last_orderkey,
       r.o_totalprice AS feat_last_totalprice,
       c.c_mktsegment, c.c_acctbal
FROM ranked r LEFT JOIN customer c ON r.user_id = c.c_custkey
WHERE r.rn = 1
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(returnflag, linestatus) with grouping_id.

    Empty-input divergence vs ANSI closed oracle-side — see
    ``agg_grouping_sets``."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        sum_money("l_quantity").alias("sum_qty"),
        F.count("*").alias("n"),
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
       COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
HAVING COUNT(*) > 0
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(orderstatus, orderpriority) over order totals.

    Empty-input divergence vs ANSI closed oracle-side — see
    ``agg_grouping_sets``."""
    od = load_table(spark, sf_dir, "orders")
    return od.cube("o_orderstatus", "o_orderpriority").agg(
        sum_money("o_totalprice").alias("sum_total"),
        F.count("*").alias("n"),
    )


AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_total,
       COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
HAVING COUNT(*) > 0
"""


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand — row_number over a
    deterministic order (price desc, partkey asc)."""
    pa = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        pa.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


WINDOW_TOPK_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rn FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) t WHERE rn <= 3
"""


def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window pack over each customer's order history:
    rank, lag, lead, running exact sum, moving count (3-row frame)."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    mov = w.rowsBetween(-2, 0)
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.lag("o_totalprice", 1).over(w).alias("prev_total"),
        F.lead("o_totalprice", 1).over(w).alias("next_total"),
        (F.sum(cents("o_totalprice")).over(run).cast("double") / F.lit(100.0)).alias(
            "running_total"
        ),
        F.count("*").over(mov).alias("moving_n"),
    )


WINDOW_ANALYTICS_SQL = """
SELECT o_custkey, o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate, o_totalprice,
  rank() OVER w AS rnk,
  lag(o_totalprice, 1) OVER w AS prev_total,
  lead(o_totalprice, 1) OVER w AS next_total,
  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
    AS running_total,
  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_n
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 orders by total price (deterministic tiebreak).
    Catalyst plans this as TakeOrderedAndProject — per-partition top-k
    then a driver-side merge of k·p rows, no full sort at scale."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(20)
    )


SORT_LIMIT_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer vs supplier nations,
    tagged by which set-op produced the row."""
    cu = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    su = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    union = cu.union(su).distinct().withColumn("op", F.lit("union"))
    inter = cu.intersect(su).withColumn("op", F.lit("intersect"))
    exc = cu.subtract(su).withColumn("op", F.lit("except"))
    return union.union(inter).union(exc)


SET_OPS_SQL = """
SELECT nationkey, 'union' AS op FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'intersect' AS op FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'except' AS op FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer
  EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
"""


def distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT on a compound key (dropDuplicates)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function pack over part names."""
    pa = load_table(spark, sf_dir, "part")
    return pa.select(
        "p_partkey",
        F.lower("p_name").alias("lower_name"),
        F.upper("p_brand").alias("upper_brand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        # NULL-propagating concat, matching the oracle's `||`: a NULL
        # brand or type yields NULL, not a one-sided string (concat_ws
        # silently skips NULLs — round-13 STRADV find, latent until a
        # NULL text fixture)
        F.concat(F.col("p_brand"), F.lit("|"), F.col("p_type")).alias(
            "brand_type"
        ),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.replace(F.col("p_type"), F.lit("A"), F.lit("_")).alias("type_repl"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.levenshtein("p_brand", "p_type").alias("lev"),
    )


STRING_FUNCS_SQL = """
SELECT p_partkey,
  lower(p_name) AS lower_name,
  upper(p_brand) AS upper_brand,
  CAST(length(p_name) AS INT) AS name_len,
  substr(p_name, 1, 5) AS name_pre,
  p_brand || '|' || p_type AS brand_type,
  regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
  replace(p_type, 'A', '_') AS type_repl,
  lpad(p_brand, 12, '*') AS brand_pad,
  trim('  x  ') AS trimmed,
  levenshtein(p_brand, p_type) AS lev
FROM part
"""


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar-function pack over orders."""
    od = load_table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("string").alias("due_date"),
        F.quarter("o_orderdate").alias("qtr"),
    )


DATE_FUNCS_SQL = """
SELECT o_orderkey,
  CAST(year(o_orderdate) AS INT) AS yr,
  CAST(month(o_orderdate) AS INT) AS mo,
  CAST(day(o_orderdate) AS INT) AS dom,
  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
  CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date,
  CAST(quarter(o_orderdate) AS INT) AS qtr
FROM orders
"""


# Oracle vintage note (applies to EVENT_TIME_PACK_SQL, TS_GAP_STATS_SQL,
# TS_ROLLING_1H_SQL, JOIN_PIT_SQL, DQ_DOD_SQL and any other oracle using
# epoch_us(ts)/hour(ts)/date_trunc on ts directly): these assume the
# CURRENT fixture vintage, where events.ts is a native parquet
# timestamp[us] column DuckDB reads as TIMESTAMP. On the older
# bigint-nanos fixture vintage only the SPARK side is adaptive
# (ts_timestamp/ts_micros branch on dtype); the DuckDB oracles would
# see a BIGINT ts and error. If the fixture ever reverts, mirror the
# adaptivity by swapping epoch_us(ts) for an epoch-us macro chosen per
# vintage (ts DIV 1000 on the nanos form) — see NOTES_r4.md §1.
def fn_event_time_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time scalar-function pack over the events stream's native
    timestamp column (the fixture's ts is parquet timestamp[us]; the
    vintage-adaptive ``ts_timestamp`` keeps the bigint-nanos form
    working too). Extract + truncate + format, rolled into a per
    (event_type, hour-of-day) profile — the arrival-time histogram a
    stream-freshness dashboard reads.

    One partial/final hash aggregate over a 2-column scan; every
    expression is a codegen'd JVM intrinsic, no Python anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    t = ts_timestamp(ev)
    return (
        ev.select(
            "event_type",
            F.hour(t).alias("hh"),
            F.to_date(t).cast("string").alias("day"),
            F.date_format(t, "yyyy-MM").alias("ym"),
        )
        .groupBy("event_type", "hh")
        .agg(
            F.count("*").alias("n"),
            F.min("day").alias("first_day"),
            F.max("ym").alias("last_month"),
        )
    )


EVENT_TIME_PACK_SQL = """
SELECT event_type, CAST(hour(ts) AS INT) AS hh, COUNT(*) AS n,
       CAST(MIN(CAST(date_trunc('day', ts) AS DATE)) AS VARCHAR) AS first_day,
       MAX(strftime(ts, '%Y-%m')) AS last_month
FROM events GROUP BY 1, 2
"""


def ts_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-gap statistics: the lag-difference of
    consecutive event times in exact epoch-microseconds. The
    sessionization-threshold diagnostic (what gap cutoff would split
    sessions) and a stream-health metric at any scale.

    One window shuffle on user_id (ts, event_id in-partition sort —
    event_id tiebreak makes equal-timestamp gaps deterministic), then
    a per-user hash aggregate. Gap mean is an int64 sum with one final
    double divide — identical on any partitioning and on DuckDB.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        ev.select("user_id", ts_micros(ev).alias("us"), "event_id")
        .withColumn("gap", F.col("us") - F.lag("us").over(w))
        .filter(F.col("gap").isNotNull())
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.min("gap").alias("min_gap_us"),
        F.max("gap").alias("max_gap_us"),
        (F.sum("gap").cast("double") / F.count("*").cast("double")).alias(
            "mean_gap_us"
        ),
    )


TS_GAP_STATS_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
  FROM events
)
SELECT user_id, COUNT(*) AS n_gaps,
       CAST(MIN(gap) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap) AS BIGINT) AS max_gap_us,
       CAST(CAST(SUM(gap) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS mean_gap_us
FROM g WHERE gap IS NOT NULL GROUP BY user_id
"""


def fn_crypto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crypto-function surface: AES-GCM encrypt/decrypt roundtrip plus
    digest functions over document text. Ciphertexts are random-IV'd
    (not oracle-comparable) — the portable contract is the IDENTITY:
    decrypt(encrypt(x)) == x for every row, counted per language; the
    sha2/md5 digests of the plaintext are directly comparable.

    At scale this is the column-level-encryption pattern (KMS-held
    key, encrypt at ingest, decrypt on authorized read) — all JVM
    intrinsics, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.lit("0123456789abcdef")  # 16-byte demo key; prod: KMS
    dec = F.aes_decrypt(
        F.aes_encrypt(F.col("text").cast("binary"), key), key
    ).cast("string")
    # NULL text (or a decrypt failure yielding NULL) must surface as a
    # visible n_null_roundtrip count, not as an opaque oracle mismatch:
    # count_if skips NULL predicate rows while the oracle's COUNT(*)
    # counts every row, so the decidable claim is
    # n_roundtrip_ok + n_null_roundtrip == n_docs with n_null == 0.
    ok = dec == F.col("text")
    return (
        docs.select(
            "lang",
            ok.alias("roundtrip_ok"),
            F.sha2(F.col("text"), 256).alias("sha"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(F.col("roundtrip_ok")).alias("n_roundtrip_ok"),
            F.count_if(F.isnull("roundtrip_ok")).alias("n_null_roundtrip"),
            F.min("sha").alias("min_sha256"),
        )
    )


FN_CRYPTO_SQL = """
-- COUNT(text) counts non-NULL plaintexts: every one roundtrips (the
-- identity the op asserts); NULL texts are exactly the NULL-verdict
-- rows the op surfaces in n_null_roundtrip (was hardcoded COUNT(*)/0,
-- which only held on fully-populated corpora — NULL-payload sweep r7)
SELECT lang, COUNT(*) AS n_docs, COUNT(text) AS n_roundtrip_ok,
       COUNT(*) - COUNT(text) AS n_null_roundtrip,
       MIN(sha256(text)) AS min_sha256
FROM documents GROUP BY lang
"""


def agg_boolean_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate pack: count_if, bool_and (every),
    bool_or (any), and a deterministic any_value (min stands in — the
    engine's any_value is non-deterministic by contract, so the
    portable form pins the choice). One partial/final aggregate; the
    predicates fold into the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_big_discount"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.min("l_linestatus").alias("first_status"),
    )


AGG_BOOLEAN_SQL = """
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_big_discount,
       BOOL_AND(l_quantity > 0) AS all_positive_qty,
       BOOL_OR(l_tax > 0.07) AS any_high_tax,
       MIN(l_linestatus) AS first_status
FROM lineitem GROUP BY l_returnflag
"""


def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface via Spark 4's VARIANT type: the events
    ``props`` JSON parsed once into a variant column, fields extracted
    with ``try_variant_get`` — the open-schema path for JSON-heavy
    pipelines (parse once, extract many, no per-field re-parse; the
    binary variant encoding scans far faster than JSON text at
    100 TB). Extracted values are plain columns, so the DuckDB oracle
    is its ordinary JSON extraction."""
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json: malformed props is a NULL variant (bare
    # parse_json THROWS — one truncated record killed the whole job;
    # round-8 JSON sweep), matching the oracle's json_valid guard
    v = F.try_parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


FN_VARIANT_SQL = """
WITH RECURSIVE nodes(event_id, node) AS (
  -- recursive dup-key walk (round 10): the VARIANT spec makes Spark's
  -- try_parse_json reject a duplicate key at ANY depth (probed:
  -- top-level, nested-object, inside-array, array-of-array all NULL),
  -- so the oracle walks every object/array node. json_keys preserves
  -- duplicates; '$.*' / '$[*]' enumerate children losslessly.
  SELECT event_id, props::JSON FROM events WHERE json_valid(props)
  UNION ALL
  SELECT event_id, kid FROM (
    SELECT event_id,
           unnest(CASE WHEN json_type(node) = 'OBJECT'
                       THEN json_extract(node, '$.*')
                       ELSE json_extract(node, '$[*]') END) AS kid
    FROM nodes WHERE json_type(node) IN ('OBJECT', 'ARRAY')
  ) u
),
dup(event_id) AS (
  SELECT DISTINCT event_id FROM nodes
  WHERE json_type(node) = 'OBJECT'
    AND len(json_keys(node)) > len(list_distinct(json_keys(node)))
),
j AS (
  -- variant INT coercion mirror (round-12 JSONNEST matrix): Spark's
  -- try_variant_get(v, '$.k', 'int') semantics per JSON type —
  --   string: ANSI integral-string cast only (trimmed [+-]digits;
  --     "2.25" / "2e1" / "0x10" are NULL — DuckDB's bare TRY_CAST
  --     would round/parse all three),
  --   number: truncate toward zero (2.75 -> 2, -2.5 -> -2 — DuckDB's
  --     TRY_CAST rounds half-away: 3 / -3),
  --   boolean: true=1 false=0 (DuckDB string-casts 'true' to NULL),
  --   object/array/null/missing: NULL (the ELSE double-cast NULLs
  --     container text naturally). A plain TRY_CAST was exact only
  --     while every fixture k was an integral string.
  SELECT event_type,
         CASE WHEN json_valid(props) AND d.event_id IS NULL THEN
           CASE json_type(props, '$.k')
             WHEN 'VARCHAR' THEN
               CASE WHEN regexp_matches(
                        trim(json_extract_string(props, '$.k')),
                        '^[+-]?[0-9]+$')
                    THEN TRY_CAST(
                        trim(json_extract_string(props, '$.k')) AS INT)
               END
             WHEN 'BOOLEAN' THEN
               CASE json_extract_string(props, '$.k')
                 WHEN 'true' THEN 1 ELSE 0 END
             ELSE TRY_CAST(trunc(TRY_CAST(
                    json_extract_string(props, '$.k') AS DOUBLE)) AS INT)
           END
         END AS k
  FROM events e LEFT JOIN dup d USING (event_id)
)
SELECT event_type,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k
FROM j GROUP BY event_type
"""


def fn_bitwise_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate surface: per event_type the AND/OR/
    XOR folds of the event ids and a shifted mask column — the pack a
    bitmap-index or feature-flag pipeline leans on. All JVM
    intrinsics; one partial/final aggregate (bit ops are associative,
    so partials merge exactly like sums)."""
    ev = load_table(spark, sf_dir, "events")
    masked = ev.select(
        "event_type",
        "event_id",
        F.expr("shiftleft(event_id & 255, 8) | (user_id & 255)").alias("mask"),
    )
    return masked.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.bit_and("event_id").alias("ids_and"),
        F.bit_or("event_id").alias("ids_or"),
        F.bit_xor("mask").alias("mask_xor"),
    )


BITWISE_PACK_SQL = """
SELECT event_type, COUNT(*) AS n,
       BIT_AND(event_id) AS ids_and,
       BIT_OR(event_id) AS ids_or,
       BIT_XOR(((event_id & 255) << 8) | (user_id & 255)) AS mask_xor
FROM events GROUP BY event_type
"""


def agg_mode_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode with deterministic tiebreak (highest count,
    then lowest value) — built from count + row_number instead of the
    engine's mode() whose tie semantics differ across engines. Two
    aggregates sharing one shuffle key prefix; the heavy count is
    partial/final."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = (
        li.select("l_returnflag", F.col("l_quantity").alias("qty"))
        .groupBy("l_returnflag", "qty")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("qty")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("qty").alias("mode_qty"), "cnt")
    )


AGG_MODE_QTY_SQL = """
SELECT l_returnflag, qty AS mode_qty, cnt FROM (
  SELECT l_returnflag, qty, cnt,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, qty) AS rn
  FROM (
    SELECT l_returnflag, l_quantity AS qty, COUNT(*) AS cnt
    FROM lineitem GROUP BY 1, 2
  ) c
) t WHERE rn = 1
"""


def ts_rolling_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing event-time range frame: for every event, the count and
    exact-cents sum of the same user's events in the preceding hour
    (RANGE BETWEEN 1h PRECEDING AND CURRENT ROW over epoch-µs) — the
    rolling-feature shape a training pipeline computes per example.

    RANGE frames over the integer microsecond timeline are engine-
    portable (identical peer-inclusion semantics in Spark and DuckDB,
    no interval-type quirks) and vintage-proof via ``ts_micros``. One
    window shuffle on user_id; the frame scan is incremental within
    each partition, never quadratic.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        ts_micros(ev).alias("us"),
        cents("value").alias("c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return base.select(
        "user_id",
        "event_id",
        "us",
        F.count("*").over(w).alias("n_1h"),
        (F.sum("c").over(w).cast("double") / F.lit(100.0)).alias(
            "sum_value_1h"
        ),
    )


TS_ROLLING_1H_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS us,
       COUNT(*) OVER w AS n_1h,
       CAST(CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT)
            AS DOUBLE) / 100.0 AS sum_value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar-function pack over embeddings (size / element_at /
    slice / higher-order transform + ordered fold).

    The fold mirrors DuckDB ``list_reduce`` element order exactly
    (left fold, 0.0 seed is an IEEE no-op) so sums are bit-equal.
    """
    em = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x).alias("vec_sum"),
        F.aggregate(
            F.transform(as_double, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        ).alias("vec_sumsq"),
        F.size(F.filter(as_double, lambda x: x > 0)).alias("n_positive"),
    )


ARRAY_FUNCS_SQL = """
SELECT vec_id,
  CAST(len(embedding) AS INT) AS dim,
  CAST(embedding[1] AS DOUBLE) AS first_val,
  -- CASE guards: DuckDB's list_prepend(0.0, NULL) is [0.0] (fold = 0.0
  -- on a NULL array) where Spark's aggregate propagates NULL — a NULL
  -- array has no sum (NULL-payload corpus sweep, round 7)
  CASE WHEN embedding IS NOT NULL THEN
    list_reduce(list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE))),
                (a, x) -> a + x) END AS vec_sum,
  CASE WHEN embedding IS NOT NULL THEN
    list_reduce(list_prepend(0.0, list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, x) -> a + x) END
    AS vec_sumsq,
  CAST(len(list_filter(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       x -> x > 0)) AS INT) AS n_positive
FROM embeddings
"""


def count_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group (expand-based two-phase agg)."""
    od = load_table(spark, sf_dir, "orders")
    return od.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count("*").alias("n_orders"),
    )


COUNT_DISTINCT_SQL = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


def approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — HLL++ count-distinct and quantile
    sketch — with a DECIDABLE contract. Raw sketch estimates differ by
    engine, so instead of emitting them as bare numbers (which would
    force a rows-only check), the query emits the exact answers plus
    integer-exact boolean flags asserting the sketch estimates land
    within their documented error bounds:

    - ``parts_within_5pct``: HLL++ (default rsd 5%) estimate within
      5% relative error of the exact distinct count (the estimator is
      deterministic for fixed input, so this is a stable fact of the
      data, not a coin flip);
    - ``median_rank_ok``: the approx median's rank is within 5% of the
      true middle, with a +2-rank slack that keeps the contract
      ATTAINABLE at tiny n (a 1-row group can only realize rank
      fractions 0% or 100%; the old hard [45%,55%] band was
      unsatisfiable there — 1-row-corpus sweep, round 7). Pure integer
      verdict: 10·|2·n_le − n| ≤ n + 20.

    The DuckDB oracle computes the exact columns and asserts the flags
    TRUE — so the sketches stay engine-private while the query is
    fully hash-checkable. ``tests/test_relational_ext.py`` keeps the
    tighter numeric error gate on the raw estimates."""
    li = load_table(spark, sf_dir, "lineitem")
    # Deliberately NOT materialized (round-13 rescan audit, then
    # reverted on measurement): the group table is recomputed by both
    # consumers (3 lineitem scans in the final plan), but the scans
    # are cheap codegen'd agg passes under AQE — localCheckpoint
    # measured 5x slower and cache() 9x slower than recomputation at
    # sf0.1 (both drop the subtree out of the AQE/codegen path). The
    # bloom-prefilter rule does not transfer: materialize only when
    # the repeated subtree carries an expensive DISTINCT/shuffle, not
    # a cheap aggregate.
    g = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median"),
        F.count("*").alias("n"),
    )
    # null-safe group rejoins: the NULL l_returnflag group is a real
    # group in both engines, and a plain equi-join on the flag silently
    # drops it from the output (round-13 STRADV find). <=> keys still
    # plan as BroadcastHashJoin.
    med = g.select(
        F.col("l_returnflag").alias("_rf_med"), "approx_median"
    )
    ranks = (
        li.join(
            F.broadcast(med), F.col("l_returnflag").eqNullSafe(F.col("_rf_med"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                (F.col("l_extendedprice") <= F.col("approx_median")).cast("long")
            ).alias("n_le")
        )
        .select(F.col("l_returnflag").alias("_rf_rank"), "n_le")
    )
    return (
        g.join(
            F.broadcast(ranks),
            F.col("l_returnflag").eqNullSafe(F.col("_rf_rank")),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts")) * 100
                <= F.col("exact_parts") * 5
            ).alias("parts_within_5pct"),
            (
                F.abs(F.col("n_le") * 2 - F.col("n")) * 10
                <= F.col("n") + 20
            ).alias("median_rank_ok"),
        )
    )


APPROX_AGGS_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS parts_within_5pct,
       TRUE AS median_rank_ok
FROM lineitem GROUP BY l_returnflag
"""


def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median per group (maps to DuckDB
    quantile_cont). l_quantity is integer-valued so the interpolation
    is FP-exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


PERCENTILE_SQL = """
SELECT l_returnflag,
       CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------- q6 / scans --

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins.

    Every predicate (shipdate range, discount band, quantity cap)
    reaches the parquet scan as PushedFilters; the aggregate reduces to
    a single row, so the shuffle is one partial per partition. This is
    the canonical "is pushdown working" probe — at 100 TB it is I/O
    bound or nothing else is right. Discount band compares exact cents
    (5..7) rather than raw doubles.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_quantity") < 24)
        )
        .filter(cents("l_discount").between(5, 7))
        .agg(
            (
                F.sum(cents_dec("l_extendedprice") * cents_dec("l_discount")).cast(
                    "double"
                )
                / F.lit(10000.0)
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q6_SQL = """
SELECT CAST(CAST(SUM(CAST(round(l_extendedprice*100) AS DECIMAL(18,0))
           * CAST(round(l_discount*100) AS DECIMAL(18,0))) AS VARCHAR) AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
  AND l_quantity < 24
  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
"""


# ------------------------------------------------------- grouping sets --

def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((flag, status), (flag), ()) with a grouping-id
    disambiguator — the general form behind rollup/cube. One pass:
    Spark expands the sets into a single Expand+HashAggregate, so the
    input is scanned once regardless of set count.

    Empty-input engine divergence, CLOSED oracle-side in round 9
    (measured, Spark 4.1 DataFrame AND SQL forms): ANSI/DuckDB emit
    the () grouping set's global row over an empty relation; Spark
    emits nothing. The oracle carries ``HAVING COUNT(*) > 0`` — every
    genuine grouping-set row aggregates >= 1 input row, so the guard
    is an identity at any sf > 0 and removes exactly the
    empty-relation global row (n = 0). Applies equally to
    ``agg_rollup`` / ``agg_cube``; parity pinned by
    ``tests/test_empty_corpus.py``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
               COUNT(*) AS n_rows
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


AGG_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
HAVING COUNT(*) > 0
"""


# ----------------------------------------------------------- map funcs --

def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: construct, extract, keys, size.

    The map is built per-row from scalar columns, read back via
    element_at, and introspected — the shapes a metadata/properties
    column needs. Output is flattened to plain columns so the oracle
    compares engine-portably: the key list is rendered via array_join
    (the external driver's canonicalizer cannot hash array cells —
    round-2 red row), keeping every output column scalar.
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "user").alias("user_val"),
        F.array_join(F.map_keys(m), ",").alias("keys_joined"),
        F.size(m).alias("n_entries"),
    )


MAP_FUNCS_SQL = """
SELECT event_id,
       MAP(['type','user'], [event_type, CAST(user_id AS VARCHAR)])['type'][1] AS type_val,
       MAP(['type','user'], [event_type, CAST(user_id AS VARCHAR)])['user'][1] AS user_val,
       array_to_string(map_keys(MAP(['type','user'], [event_type, CAST(user_id AS VARCHAR)])), ',') AS keys_joined,
       CAST(cardinality(MAP(['type','user'], [event_type, CAST(user_id AS VARCHAR)])) AS INT) AS n_entries
FROM events
"""


# ----------------------------------------------------------- range join --

#: Price bands for the non-equi join: [lo, hi) in whole currency units.
PRICE_BANDS = [
    ("low", 0, 50_000),
    ("mid", 50_000, 150_000),
    ("high", 150_000, 300_000),
    ("lux", 300_000, 10_000_000),
]


def join_range_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: classify orders into price bands via
    o_totalprice >= lo AND < hi against a literal band dimension.

    Physical shape is BroadcastNestedLoopJoin — correct here because
    the build side is O(bands). At 100 TB you would precompute the
    band as a scalar CASE (Catalyst folds this literal table to
    exactly that), but the operator demonstrates the general
    interval-join path used when the band table is data-driven.
    """
    bands = spark.createDataFrame(
        PRICE_BANDS, schema="band string, lo bigint, hi bigint"
    )
    od = load_table(spark, sf_dir, "orders")
    return (
        od.join(
            F.broadcast(bands),
            (od.o_totalprice >= bands.lo) & (od.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            sum_money("o_totalprice").alias("sum_price"),
        )
    )


_BANDS_VALUES = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)

JOIN_RANGE_SQL = f"""
WITH bands(band, lo, hi) AS (VALUES {_BANDS_VALUES})
SELECT band, COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_price
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
"""


# ------------------------------------------------------ session window --

SESSION_GAP_MIN = 240  # 4 hours

def agg_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time sessionization: per-user sessions with a 4-hour
    inactivity gap, via Spark's native session_window aggregate.

    Session bounds are emitted as exact epoch-microsecond integers
    (events.ts is parquet TIMESTAMP(NANOS) read as a nanos long) so the
    comparison with the oracle's gaps-and-islands formulation is
    integer-exact. session_end = last event + gap, Spark's definition.

    Scale: session_window is a first-class streaming-state operator —
    the same expression runs incrementally under Structured Streaming
    with watermark-driven state eviction; in batch it is one shuffle
    on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    ts = ts_timestamp(ev)
    return (
        ev.select("user_id", ts.alias("ev_ts"))
        .groupBy("user_id", F.session_window("ev_ts", f"{SESSION_GAP_MIN} minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "n_events",
        )
    )


_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000

AGG_SESSION_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   > {_GAP_US} THEN 1
              WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL THEN 1
              ELSE 0 END AS new_session
  FROM e
),
sessions AS (
  SELECT user_id, us,
         -- RANGE, not ROWS: with TIED timestamps the ROWS frame's
         -- arbitrary tie order is independent of lag()'s, so tied
         -- rows ordered before the flagged first-of-island row fell
         -- into a phantom session (round-10 cap-group sweep, ~23
         -- same-second events per user). RANGE makes peer rows share
         -- the frame: every tied row sees the same island id.
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                                RANGE UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(us) AS session_start_us,
       MAX(us) + {_GAP_US} AS session_end_us,
       COUNT(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""


# ------------------------------------------------------- corr / covar --

def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregates (Pearson correlation, sample covariance)
    from exact integer-cents sums — the same exactness discipline as
    functions/exact.py extended to cross-moments:

        covar = (Sxy - Sx*Sy/n) / (n-1)
        corr  = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2))

    with Sx, Sy, Sxy, Sxx, Syy exact DECIMAL sums of cent-scaled
    operands. Associative integer partials → identical on any
    partitioning and on DuckDB; the float finale is order-fixed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = cents_dec("l_quantity")
    y = cents_dec("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(38,0)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / F.lit(100.0)
    sy = F.col("sy").cast("double") / F.lit(100.0)
    sxy = F.col("sxy").cast("double") / F.lit(10000.0)
    sxx = F.col("sxx").cast("double") / F.lit(10000.0)
    syy = F.col("syy").cast("double") / F.lit(10000.0)
    # try_divide on BOTH: a single-row group zeroes covar's n-1
    # denominator just like a zero-variance group zeroes corr's —
    # NULL (the oracle's double-divide result), not an ANSI error
    covar = F.try_divide(sxy - sx * sy / n, n - F.lit(1.0))
    corr = F.try_divide(
        n * sxy - sx * sy,
        F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
    )
    return agg.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        covar.alias("covar_qty_price"),
        corr.alias("corr_qty_price"),
    )


AGG_CORR_SQL = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(round(l_quantity*100) AS DECIMAL(18,0))) AS sx,
         SUM(CAST(round(l_extendedprice*100) AS DECIMAL(18,0))) AS sy,
         SUM(CAST(CAST(round(l_quantity*100) AS DECIMAL(18,0))
                * CAST(round(l_extendedprice*100) AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS sxy,
         SUM(CAST(CAST(round(l_quantity*100) AS DECIMAL(18,0))
                * CAST(round(l_quantity*100) AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(CAST(round(l_extendedprice*100) AS DECIMAL(18,0))
                * CAST(round(l_extendedprice*100) AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n AS n_rows,
       ((CAST(sxy AS DOUBLE)/10000.0)
         - (CAST(sx AS DOUBLE)/100.0) * (CAST(sy AS DOUBLE)/100.0) / CAST(n AS DOUBLE))
         / (CAST(n AS DOUBLE) - 1.0) AS covar_qty_price,
       (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE)/10000.0)
         - (CAST(sx AS DOUBLE)/100.0) * (CAST(sy AS DOUBLE)/100.0))
         / sqrt((CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE)/10000.0)
                  - (CAST(sx AS DOUBLE)/100.0) * (CAST(sx AS DOUBLE)/100.0))
              * (CAST(n AS DOUBLE) * (CAST(syy AS DOUBLE)/10000.0)
                  - (CAST(sy AS DOUBLE)/100.0) * (CAST(sy AS DOUBLE)/100.0))) AS corr_qty_price
FROM s
"""


# ----------------------------------------------------------- SQL surface --

SQL_SURFACE_TEXT = """
SELECT n.n_name AS nation,
       o.o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0
         AS sum_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name, o.o_orderpriority
HAVING COUNT(*) > 2
"""


def sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-parser/catalog surface (SURVEY.md §2.2): fixture tables
    registered as temp views, the query stated as ANSI SQL text and
    planned by Catalyst exactly like the DataFrame forms. The SAME SQL
    string is the DuckDB oracle — a textual-equivalence check on the
    dialect-portable subset (joins, aggregates, HAVING, exact-cents
    arithmetic)."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(SQL_SURFACE_TEXT)


# ---------------------------------------------------------------- pivot --

PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per user-bucket event counts spread across one column per
    event type. The value set is declared explicitly (PIVOT_TYPES) —
    at scale an undeclared pivot forces an extra distinct-values job
    over the fact table; declaring it keeps the plan a single
    partial+final aggregate with N conditional counts.

    Anonymous traffic (NULL user_id) folds into sentinel bucket -1 in
    BOTH engines — without the sentinel a NULL bucket row makes
    DuckDB's ``.df()`` render the whole int column float64 (7.0 vs
    Spark's 7), a pandas dtype artifact, not a value divergence
    (round-8 NULL-keys sweep). No real sf has NULL user_ids, so the
    sentinel is inert there.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "user_bucket", F.coalesce(F.col("user_id") % 10, F.lit(-1))
        )
        .groupBy("user_bucket")
        .pivot("event_type", PIVOT_TYPES)
        .count()
        .na.fill(0)
    )


AGG_PIVOT_SQL = f"""
SELECT COALESCE(user_id % 10, -1) AS user_bucket,
       {", ".join(
           f"COUNT(*) FILTER (event_type = '{t}') AS {t}" for t in PIVOT_TYPES
       )}
FROM events GROUP BY 1
"""


# ------------------------------------------------------ exists subquery --

SQL_EXISTS_TEXT = """
SELECT o_orderstatus, COUNT(*) AS n_orders
FROM orders
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY o_orderstatus
"""


def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS subquery — Catalyst rewrites it to a left
    anti join (RewritePredicateSubquery), i.e. the declarative form of
    ``join_anti`` arrived at from SQL text. Same string runs on DuckDB.
    """
    from ..sources.tables import register_views

    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(SQL_EXISTS_TEXT)


# -------------------------------------------------------- null handling --

def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics pack: JSON-miss → NULL propagation, coalesce
    defaults, null-safe equality (<=>), and null-aware counts. The
    props column lacks key 'zz' everywhere → k_zz is NULL on every row;
    the aggregate proves count(col) vs count(*) and null-safe compare
    semantics match ANSI exactly."""
    ev = load_table(spark, sf_dir, "events")
    # try_cast: NULL (not ANSI exception) on a valid-JSON non-numeric
    # field — the permissive-extraction contract (round-8 JSON sweep)
    with_nulls = ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.zz").try_cast("double").alias("k_zz"),
        F.get_json_object("props", "$.k").try_cast("double").alias("k_val"),
    )
    return (
        with_nulls.withColumn("k_filled", F.coalesce("k_zz", F.lit(-1.0)))
        .withColumn("zz_eq_val", F.col("k_zz").eqNullSafe(F.col("k_val")))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("k_zz").alias("n_zz_nonnull"),
            F.count("k_val").alias("n_val_nonnull"),
            F.sum(F.col("k_filled")).cast("long").alias("sum_filled"),
            F.sum(F.when(F.col("zz_eq_val"), 1).otherwise(0)).alias("n_nullsafe_eq"),
        )
    )


NULL_HANDLING_SQL = """
WITH w AS (
  SELECT event_id, event_type,
         TRY_CAST(CASE WHEN json_valid(props)
                       THEN json_extract_string(props, '$.zz') END
                  AS DOUBLE) AS k_zz,
         TRY_CAST(CASE WHEN json_valid(props)
                       THEN json_extract_string(props, '$.k') END
                  AS DOUBLE) AS k_val
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_rows,
       COUNT(k_zz) AS n_zz_nonnull,
       COUNT(k_val) AS n_val_nonnull,
       CAST(SUM(COALESCE(k_zz, -1.0)) AS BIGINT) AS sum_filled,
       CAST(SUM(CASE WHEN k_zz IS NOT DISTINCT FROM k_val THEN 1 ELSE 0 END)
         AS BIGINT) AS n_nullsafe_eq
FROM w GROUP BY event_type
"""


# ------------------------------------------------------- range frames --

RANGE_BAND = 10_000


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame — distinct from the ROWS frames
    in ``window_analytics``: for each order, how many of the same
    customer's orders fall within the preceding RANGE_BAND price band.
    The frame boundary moves with the ORDER BY *value*, so peers and
    near-peers are counted regardless of row position — the frame type
    sliding-aggregate pricing/telemetry queries need.
    """
    od = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-RANGE_BAND, 0)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_in_band"),
        (
            F.sum(cents("o_totalprice")).over(w).cast("double") / F.lit(100.0)
        ).alias("band_total"),
    )


WINDOW_RANGE_SQL = f"""
SELECT o_custkey, o_orderkey, o_totalprice,
  COUNT(*) OVER w AS n_in_band,
  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER w AS DOUBLE)/100.0
    AS band_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN {RANGE_BAND} PRECEDING AND CURRENT ROW)
"""


# -------------------------------------------------- resample + ffill --

def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: per-user daily resample over the
    full span of the stream, gaps forward-filled from the last
    observed day (IGNORE NULLS running last).

    The scaffold (users × days) comes from one global min/max
    aggregate broadcast into a generated day sequence — no driver-side
    date math. At 100 TB the scaffold is |users|·|days| rows built by
    explode, partitioned with the join on user_id; the ffill is one
    window pass per user ordered by day. Daily means are exact-cents.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date(ts_timestamp(ev))
    # ev has three consumers (daily means, span scalar, user list) — a
    # localCheckpoint of the projection was tried in the round-13
    # optimization pass and REVERTED on measurement (warmed A/B at
    # sf0.1: 0.88 → 0.99 s): each consumer prunes to a different
    # column subset, so the three pushed-down scans beat one fat
    # materialization. The different-pushdown branch of the rescan
    # rule.
    daily = (
        ev.select("user_id", day.alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(
            (
                F.sum(cents("value")).cast("double")
                / F.lit(100.0)
                / F.count("value").cast("double")
            ).alias("day_mean"),
            F.count("*").alias("n_events"),
        )
    )
    span = ev.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    days = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    users = ev.select("user_id").distinct()
    scaffold = users.crossJoin(F.broadcast(days))
    joined = scaffold.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        F.last("day_mean", ignorenulls=True).over(w).alias("ffill_mean"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


TS_RESAMPLE_SQL = """
WITH ev AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value FROM events
),
daily AS (
  SELECT user_id, day,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0
           / CAST(COUNT(value) AS DOUBLE) AS day_mean,
         COUNT(*) AS n_events
  FROM ev GROUP BY 1, 2
),
days AS (
  SELECT CAST(unnest(generate_series(
           (SELECT MIN(day) FROM ev), (SELECT MAX(day) FROM ev),
           INTERVAL 1 DAY)) AS DATE) AS day
),
scaffold AS (
  SELECT u.user_id, d.day FROM (SELECT DISTINCT user_id FROM ev) u, days d
)
SELECT s.user_id, CAST(s.day AS VARCHAR) AS day,
       last_value(daily.day_mean IGNORE NULLS)
         OVER (PARTITION BY s.user_id ORDER BY s.day
               ROWS UNBOUNDED PRECEDING) AS ffill_mean,
       COALESCE(daily.n_events, 0) AS n_events
FROM scaffold s
LEFT JOIN daily ON s.user_id = daily.user_id AND s.day = daily.day
"""


# ------------------------------------------------------------ q7 shape --

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two independent dimension paths to the same
    table (supplier→nation vs customer→nation), nation-pair filter,
    revenue by (supp_nation, cust_nation, year).

    Both nation copies broadcast under distinct aliases; the only
    shuffle is lineitem⋈orders. The year comes from l_shipdate
    (fixture has no receiptdate), cast via UTC-pinned date parts.
    """
    na_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    na_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem")
    # fixture nations are synthetic NATION_N names
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na_s), su.s_nationkey == na_s.s_nkey)
        .join(F.broadcast(na_c), cu.c_nationkey == na_c.c_nkey)
        .filter(pair | rpair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            (
                F.sum(_disc_price_cents2("l_extendedprice", "l_discount")).cast(
                    "double"
                )
                / F.lit(10000.0)
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE)/10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


# -------------------------------------------------------------- unpivot --

def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the pivoted per-bucket event-type counts turned
    back into long form — (user_bucket, event_type, cnt). Spark's
    native ``unpivot`` generates an Expand (one input pass, no join);
    the oracle mirrors with UNION ALL over the same pivot CTE. Zero
    counts survive the roundtrip (na.fill in the pivot), so
    pivot→unpivot is lossless."""
    wide = agg_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["user_bucket"],
        values=PIVOT_TYPES,
        variableColumnName="event_type",
        valueColumnName="cnt",
    )


AGG_UNPIVOT_SQL = f"""
WITH wide AS ({AGG_PIVOT_SQL})
{" UNION ALL ".join(
    f"SELECT user_bucket, '{t}' AS event_type, {t} AS cnt FROM wide"
    for t in PIVOT_TYPES
)}
"""


# ------------------------------------------------------- ranking funcs --

def window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function pack: dense_rank, percent_rank, cume_dist,
    ntile over each customer's orders by price. The ratio outputs are
    integer-operand divides — bit-identical across engines."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey,
  dense_rank()   OVER w AS drnk,
  percent_rank() OVER w AS prnk,
  cume_dist()    OVER w AS cdist,
  ntile(4)       OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
"""


# --------------------------------------------------------- lateral join --

SQL_LATERAL_TEXT = """
SELECT c.c_custkey, t.o_orderkey AS top_orderkey, t.o_totalprice AS top_price
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 1
) t
"""


def sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-1 order per customer) — the
    SQL-text route to per-group top-k; Catalyst plans it as a
    DomainJoin→window rewrite. Same text runs on DuckDB."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(SQL_LATERAL_TEXT)


# ---------------------------------------------------------- mode/argmax --

def agg_mode_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type (most frequent; ties -> first
    alphabetically) via the min-of-struct argmax idiom — a plain
    aggregate, no window: two partial+final hash aggregates, no sort."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    best = counts.groupBy("user_id").agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("event_type"))).alias("m")
    )
    return best.select(
        "user_id",
        F.col("m.event_type").alias("modal_type"),
        (-F.col("m.neg")).alias("n_occurrences"),
    )


AGG_MODE_SQL = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS cnt FROM events GROUP BY 1, 2
)
SELECT user_id, event_type AS modal_type, cnt AS n_occurrences FROM (
  SELECT user_id, event_type, cnt,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type) AS rn
  FROM counts
) t WHERE rn = 1
"""


# ------------------------------------------------------------ full outer --

def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — both-side null preservation: negative-balance
    customers against high-value orders; unmatched rows survive from
    either side with nulls on the other."""
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400_000)
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "full_outer")
        .select(
            "c_custkey",
            "c_acctbal",
            "o_orderkey",
            "o_totalprice",
        )
    )


JOIN_FULL_OUTER_SQL = """
SELECT c_custkey, c_acctbal, o_orderkey, o_totalprice
FROM (SELECT * FROM customer WHERE c_acctbal < 0) c
FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
  ON c.c_custkey = o.o_custkey
"""


# ------------------------------------------------------- multi distinct --

def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several COUNT(DISTINCT ...) over different columns in ONE
    aggregate — Catalyst plans this with an Expand (one input row per
    distinct-clause) feeding a single aggregation pipeline, not N
    separate jobs; still one scan at 100 TB."""
    od = load_table(spark, sf_dir, "orders")
    return od.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_days"),
        F.count("*").alias("n_orders"),
    )


AGG_MULTI_DISTINCT_SQL = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_custs,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


# ------------------------------------------------------------ q10 shape --

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top 20. Selective lineitem flag filter → shuffle join with orders
    → broadcast customer/nation enrich → top-k with deterministic
    tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            (
                F.sum(_disc_price_cents2("l_extendedprice", "l_discount")).cast(
                    "double"
                )
                / F.lit(10000.0)
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE)/10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------- event funnel --

def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel analysis: per user, earliest view/click/purchase
    times; a user converts when the three first-touches occur in
    funnel order. One conditional-min aggregate per stage in a single
    pass (no joins, no windows), then ordered-comparison flags — the
    standard product-analytics query at any scale."""
    ev = load_table(spark, sf_dir, "events")
    us = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_buy"
        ),
    )
    converted = (
        F.col("t_view").isNotNull()
        & F.col("t_click").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_view") < F.col("t_click"))
        & (F.col("t_click") < F.col("t_buy"))
    )
    return us.select(
        "user_id",
        F.col("t_view").isNotNull().alias("has_view"),
        F.col("t_click").isNotNull().alias("has_click"),
        F.col("t_buy").isNotNull().alias("has_purchase"),
        converted.alias("converted_in_order"),
    )


FUNNEL_SQL = """
WITH us AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
  FROM events GROUP BY user_id
)
SELECT user_id,
       t_view IS NOT NULL AS has_view,
       t_click IS NOT NULL AS has_click,
       t_buy IS NOT NULL AS has_purchase,
       COALESCE(t_view IS NOT NULL AND t_click IS NOT NULL AND t_buy IS NOT NULL
                AND t_view < t_click AND t_click < t_buy, FALSE) AS converted_in_order
FROM us
"""


# ------------------------------------------------------------ histogram --

HIST_BIN = 10.0


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type: bin = floor(v/10).
    One partial+final aggregate — the constant-memory distribution
    profile that replaces exact percentiles at 100 TB dashboards.
    Bin edges from exact cents (floor of an integer divide) so bin
    assignment can't straddle engines."""
    ev = load_table(spark, sf_dir, "events")
    bin_ = F.floor(cents("value") / F.lit(int(HIST_BIN * 100))).cast("long")
    return ev.groupBy("event_type", bin_.alias("bin")).agg(
        F.count("*").alias("n"),
        (F.min(cents("value")).cast("double") / F.lit(100.0)).alias("bin_min"),
        (F.max(cents("value")).cast("double") / F.lit(100.0)).alias("bin_max"),
    )


AGG_HISTOGRAM_SQL = f"""
SELECT event_type,
       CAST(floor(CAST(round(value*100) AS BIGINT) / {int(HIST_BIN*100)}) AS BIGINT) AS bin,
       COUNT(*) AS n,
       CAST(MIN(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS bin_min,
       CAST(MAX(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS bin_max
FROM events GROUP BY 1, 2
"""


# ------------------------------------------------------------- q4 shape --

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts over orders having at
    least one late-shipped line (l_shipdate > o_orderdate + 60 days) —
    a date-correlated EXISTS, planned as a left-semi join; only
    qualifying order keys flow to the count."""
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = od.join(
        li,
        (od.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o.o_orderkey
      AND l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


# ----------------------------------------------------------- q19 shape --

def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive clauses over the
    part⋈lineitem join — brand/size/quantity bands OR'd together. The
    non-join predicates stay attached to their side's scan (the OR of
    brand clauses pushes into the part scan); the join is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
    clause1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity") >= 10)
    )
    clause2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(10, 30))
        & (F.col("l_quantity") < 20)
    )
    return (
        joined.filter(clause1 | clause2)
        .agg(
            (
                F.sum(_disc_price_cents2("l_extendedprice", "l_discount")).cast(
                    "double"
                )
                / F.lit(10000.0)
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q19_SQL = f"""
SELECT CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE)/10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity < 20)
"""


# ------------------------------------------------- collection aggregates --

def agg_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates with deterministic order: per order
    status, the sorted distinct priority set joined to a string, and
    its cardinality. collect_set is shuffle-order-nondeterministic by
    itself — array_sort makes the value stable on any cluster, which
    is the only defensible way to emit collected data. The registered
    output carries the string-joined form only (array cells are
    unhashable in the driver canonicalizer's pandas sort)."""
    od = load_table(spark, sf_dir, "orders")
    prios = F.array_sort(F.collect_set("o_orderpriority"))
    return od.groupBy("o_orderstatus").agg(
        F.array_join(prios, "|").alias("priorities_joined"),
        F.size(prios).alias("n_priorities"),
    )


AGG_COLLECT_SQL = """
SELECT o_orderstatus,
       array_to_string(list_sort(list_distinct(list(o_orderpriority))), '|')
         AS priorities_joined,
       CAST(len(list_distinct(list(o_orderpriority))) AS INT) AS n_priorities
FROM orders GROUP BY o_orderstatus
"""


# ------------------------------------------------------------ q14 shape --

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — ratio of two conditional
    exact sums over one scan+broadcast-join pass (CASE inside SUM, no
    second scan). The month filter pushes to the lineitem scan; part
    rides along broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    pa = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
    disc = _disc_price_cents2("l_extendedprice", "l_discount")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc).otherwise(
            F.lit(0).cast("decimal(38,0)")
        )
    )
    total = F.sum(disc)
    return joined.agg(
        (
            F.lit(100.0)
            * promo.cast("double")
            / total.cast("double")
        ).alias("promo_revenue_pct"),
        (total.cast("double") / F.lit(10000.0)).alias("total_revenue"),
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE_SQL}
                             ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE)
             / CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE) AS promo_revenue_pct,
       CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE)/10000.0 AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


# -------------------------------------------------- first/last/nth value --

def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window values over each customer's order history:
    first, last (full-partition frame), and 2nd order prices. The
    last_value frame must be explicitly unbounded-following — the
    default frame ends at CURRENT ROW, a classic silent-wrong-answer;
    pinning it here keeps both engines on the same definition."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(wfull).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wfull).alias("second_price"),
    )


WINDOW_FIRST_LAST_SQL = """
SELECT o_custkey, o_orderkey,
  first_value(o_totalprice) OVER w AS first_price,
  last_value(o_totalprice)  OVER w AS last_price,
  nth_value(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ===================================== TPC-H multi-level aggregate pack --
# Q2/Q8/Q9/Q13/Q15/Q17/Q18/Q22 shapes adapted to the fixture schema
# (no partsupp/l_shipmode/l_receiptdate/c_phone — substitutions noted
# per query). These exercise the remaining classic plan shapes:
# min-per-group join-back (correlated subquery), conditional-share
# ratios over multi-path dimension joins, left-outer count histograms,
# HAVING over grouped facts, scalar-aggregate views, and decorrelated
# NOT EXISTS anti-joins — each with exact integer-cents arithmetic so
# the DuckDB oracle hashes identically.


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — cheapest supplier per part via min-per-group +
    equality join-back (the decorrelated form of Q2's correlated
    subquery). Fixture has no partsupp: supply cost is each supplier's
    minimum observed sale price for the part (exact column values, no
    FP arithmetic before the comparison).

    Scale: costs/mins are partial+final hash aggregates on the same
    key, the join-back is co-partitioned on l_partkey (no extra
    shuffle under AQE), and part/supplier/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supply_cost")
    )
    mins = costs.groupBy("l_partkey").agg(F.min("supply_cost").alias("min_cost"))
    pa = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size").between(10, 20)) & (F.col("p_type") == "LARGE")
    )
    su = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = costs.alias("c")
    m = mins.alias("m")
    return (
        c.join(
            m,
            (F.col("c.l_partkey") == F.col("m.l_partkey"))
            & (F.col("c.supply_cost") == F.col("m.min_cost")),
        )
        .select(
            F.col("c.l_partkey").alias("l_partkey"),
            F.col("c.l_suppkey").alias("l_suppkey"),
            F.col("c.supply_cost").alias("supply_cost"),
        )
        .join(F.broadcast(pa), F.col("l_partkey") == pa.p_partkey)
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            "supply_cost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(20)
    )


Q2_SQL = """
WITH costs AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
  FROM lineitem GROUP BY 1, 2
),
mins AS (SELECT l_partkey, MIN(supply_cost) AS min_cost FROM costs GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supply_cost
FROM costs
JOIN mins ON costs.l_partkey = mins.l_partkey
         AND costs.supply_cost = mins.min_cost
JOIN part ON costs.l_partkey = p_partkey
JOIN supplier ON costs.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — one nation's share of regional revenue per
    year: two dimension paths into the same fact row (customer→nation→
    region restricts the market, supplier→nation labels the seller),
    then a conditional-share ratio per year. All dimensions broadcast;
    the only shuffle is lineitem⋈orders; numerator and denominator are
    exact DECIMAL sums divided once."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    disc = _disc_price_cents2("l_extendedprice", "l_discount")
    zero = F.lit(0).cast("decimal(38,0)")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na_c), cu.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(re), F.col("cr_key") == re.r_regionkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na_s), su.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", disc).otherwise(zero)).cast("double")
                / F.sum(disc).cast("double")
            ).alias("mkt_share"),
            (F.sum(disc).cast("double") / F.lit(10000.0)).alias("total_revenue"),
        )
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {DISC_PRICE_SQL}
                     ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE)
         / CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE) AS mkt_share,
       CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE)/10000.0 AS total_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
GROUP BY 1
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — profit by (supplier nation, year) over a
    part-name-restricted product line. Fixture has no ps_supplycost:
    cost is p_retailprice·quantity (same multi-table shape, exact
    1e-4-unit DECIMAL arithmetic end to end; quantity is
    integer-valued, asserted by the cents grid check in FIXTURES)."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    pa = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    ).select("p_partkey", "p_retailprice")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _disc_price_cents2("l_extendedprice", "l_discount") - (
        cents_dec("p_retailprice")
        * F.col("l_quantity").cast("decimal(18,0)")
        * F.lit(100).cast("decimal(18,0)")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(amount).cast("double") / F.lit(10000.0)).alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({DISC_PRICE_SQL}
             - CAST(round(p_retailprice*100) AS DECIMAL(18,0))
               * CAST(l_quantity AS DECIMAL(18,0))
               * CAST(100 AS DECIMAL(18,0))) AS DOUBLE)/10000.0 AS sum_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
GROUP BY 1, 2
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 — customer order-count distribution: LEFT OUTER join
    so no-order customers land in the c_count=0 bucket, then a
    histogram of counts-of-counts (two cascaded aggregations; the
    o_orderpriority filter stands in for TPC-H's comment NOT LIKE).
    Pure integer counts — engine-exact by construction."""
    cu = load_table(spark, sf_dir, "customer").select("c_custkey")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 — top supplier by quarterly revenue: a revenue "view"
    (per-supplier exact DECIMAL sum over one shipdate quarter), its
    scalar max, and the equality join-back. The max/equality
    comparison stays on exact integers (DECIMAL 1e-4 units); revenue
    converts to double only in the output projection."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price_cents2("l_extendedprice", "l_discount")).alias("rev_units")
    )
    max_rev = rev.agg(F.max("rev_units").alias("max_units"))
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(max_rev), rev.rev_units == max_rev.max_units)
        .join(F.broadcast(su), rev.supplier_no == su.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_units").cast("double") / F.lit(10000.0)).alias(
                "total_revenue"
            ),
        )
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({DISC_PRICE_SQL}) AS rev_units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(rev_units AS DOUBLE)/10000.0 AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE rev_units = (SELECT MAX(rev_units) FROM revenue)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 — revenue loss if small-quantity orders were dropped:
    per-part average-quantity threshold (correlated scalar subquery,
    decorrelated to an aggregate + join-back) with the comparison kept
    in integers: qty < 0.2·avg(qty) ⟺ 5·qty·n < sum_qty, so both
    engines compare identical longs instead of derived floats."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") | (F.col("p_brand") == "Brand#5")
    ).select("p_partkey")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("l_quantity").alias("n_qty"),
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ap_key"))
        .filter(
            F.lit(5) * F.col("l_quantity").cast("long") * F.col("n_qty")
            < F.col("sum_qty")
        )
        .agg(
            (F.sum(cents("l_extendedprice")).cast("double") / F.lit(100.0) / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_small"),
        )
    )


Q17_SQL = """
WITH avg_q AS (
  SELECT l_partkey AS ap_key, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
         COUNT(l_quantity) AS n_qty
  FROM lineitem GROUP BY 1
)
SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
         / 100.0 / 7.0 AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_q ON l_partkey = ap_key
WHERE p_brand IN ('Brand#4', 'Brand#5')
  AND 5 * CAST(l_quantity AS BIGINT) * n_qty < sum_qty
"""


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 — large-volume orders: HAVING over a grouped fact
    (orders whose total quantity exceeds a threshold), then customer
    enrichment. Quantity sums are integer-exact; the HAVING filter is
    a long comparison. The semi-join-shaped flow aggregates lineitem
    FIRST (map-side combined) so only qualifying order keys join."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 115)
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(od, big.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


Q18_SQL = """
SELECT c_name, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       o_totalprice, total_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 115
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — wealthy customers with no orders: scalar
    average over positive balances (kept as an exact integer cross
    comparison: bal·n > sum ⟺ bal > avg), anti-join against orders,
    grouped by nation (fixture has no c_phone; nation key stands in
    for the phone country code). "No orders" means no orders since
    1999 — every fixture customer has SOME order, as in TPC-H where
    the window is what makes the set non-empty. Anti-join is
    broadcast-able at scale because only distinct o_custkey values of
    the date-filtered side are needed."""
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") < 7
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    pos = cu.filter(F.col("c_acctbal") > 0.0)
    avg_row = pos.agg(
        F.sum(cents("c_acctbal")).alias("sum_pos"),
        F.count("*").alias("n_pos"),
    )
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01")
    ).select("o_custkey")
    return (
        cu.crossJoin(F.broadcast(avg_row))
        .filter(cents("c_acctbal") * F.col("n_pos") > F.col("sum_pos"))
        .join(od, cu.c_custkey == od.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            sum_money("c_acctbal").alias("totacctbal"),
        )
    )


Q22_SQL = """
WITH cu AS (
  SELECT c_custkey, c_nationkey, c_acctbal FROM customer WHERE c_nationkey < 7
),
avg_row AS (
  SELECT SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS sum_pos,
         COUNT(*) AS n_pos
  FROM cu WHERE c_acctbal > 0.0
)
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0
         AS totacctbal
FROM cu, avg_row
WHERE CAST(round(c_acctbal*100) AS BIGINT) * n_pos > sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY 1
"""


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — distinct supplier counts per part attribute
    group with an excluded-supplier list (fixture has no partsupp or
    s_comment: the part↔supplier relation comes from lineitem, and the
    exclusion list is the bottom-decile-balance suppliers). Exercises
    COUNT(DISTINCT) per group after a NOT IN / anti-join filter."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    pa = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") != "PROMO"
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select(F.col("s_suppkey").alias("bad_key"))
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("bad_key"), "left_anti")
        .join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY 1, 2, 3
"""


def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — suppliers holding a meaningful share of a
    product line: nested aggregate (per supplier-part shipped quantity
    in a year) filtered against a threshold, collapsed to a
    semi-join-style DISTINCT supplier list with nation enrichment.
    Quantity sums are integer-exact longs."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    pa = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    qty = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 50)
    )
    su = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        qty.select("l_suppkey")
        .distinct()
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2
  ) t WHERE qty > 50
)
"""


# ------------------------------------------------- recursive CTE --

SQL_RECURSIVE_TEXT = """
WITH RECURSIVE months(m, hi) AS (
  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE),
         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE)
  FROM orders
  UNION ALL
  SELECT CAST(m + INTERVAL '1' MONTH AS DATE), hi FROM months WHERE m < hi
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         COUNT(*) AS n_orders,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders GROUP BY 1
)
SELECT date_format(mo.m, 'yyyy-MM') AS month,
       COALESCE(t.n_orders, 0) AS n_orders,
       COALESCE(t.rev_cents, 0) AS rev_cents
FROM months mo LEFT JOIN monthly t ON mo.m = t.m
"""


def sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.x ``WITH RECURSIVE``): generate the
    complete monthly date spine between the first and last order
    month, then gap-fill per-month order counts/revenue with a LEFT
    JOIN — months with no orders appear as explicit zero rows, the
    shape a reporting layer needs and a plain GROUP BY cannot produce.

    The recursion is driver-cheap (one row per month, bounds carried
    through the recursion to avoid correlated subqueries) and the data
    side is one partial/final aggregate; the spine side is broadcast-
    sized at any scale since it grows with calendar time, not data."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(SQL_RECURSIVE_TEXT)


SQL_RECURSIVE_ORACLE = """
WITH RECURSIVE months(m, hi) AS (
  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE),
         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE)
  FROM orders
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi FROM months WHERE m < hi
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         COUNT(*) AS n_orders,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders GROUP BY 1
)
SELECT strftime(mo.m, '%Y-%m') AS month,
       CAST(COALESCE(t.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(t.rev_cents, 0) AS BIGINT) AS rev_cents
FROM months mo LEFT JOIN monthly t ON mo.m = t.m
"""


# ---------------------------------------------- synthetic generator --

GEN_N = 20_000
GEN_TYPES = ("view", "click", "purchase", "refund", "hold")


def src_synthetic_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed data generator (the dbgen role):
    ``spark.range`` fanned to synthetic rows whose every column is a
    pure function of the row id through the portable hash — no RNG
    state, so any executor can generate any split independently and
    the output is bit-identical at any parallelism (the property that
    lets a 100 TB benchmark dataset be generated in-place, no
    shuffle, no seed files). The oracle generates the same table from
    DuckDB's ``range`` — proving generator portability, not just
    query parity.

    Columns: hash-uniform user bucket, 5-way type from the hash
    tail, integer-cents value — the events-table shape.
    """
    from ..functions.hashing import hash64

    base = spark.range(GEN_N).select(F.col("id").alias("row_id"))
    h1 = hash64(F.concat(F.lit("gen#"), F.col("row_id").cast("string")))
    h2 = hash64(F.concat(F.lit("gv#"), F.col("row_id").cast("string")))
    type_case = "CASE h1 % 5 " + " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(GEN_TYPES)
    ) + " END"
    return (
        base.withColumn("h1", h1)
        .withColumn("h2", h2)
        .select(
            "row_id",
            (F.col("h1") % 1000).alias("user_id"),
            F.expr(type_case).alias("event_type"),
            (F.col("h2") % 1_000_000).alias("value_cents"),
            F.expr(f"row_id DIV {GEN_N // 30}").alias("day"),
        )
    )


def _gen_sql() -> str:
    from ..functions.hashing import hash64_sql

    h1 = hash64_sql("'gen#' || CAST(row_id AS VARCHAR)")
    h2 = hash64_sql("'gv#' || CAST(row_id AS VARCHAR)")
    type_case = "CASE h1 % 5 " + " ".join(
        f"WHEN {i} THEN '{t}'" for i, t in enumerate(GEN_TYPES)
    ) + " END"
    return f"""
WITH base AS (SELECT unnest(range(0, {GEN_N})) AS row_id),
hashed AS (
  SELECT row_id, {h1} AS h1, {h2} AS h2 FROM base
)
SELECT row_id, h1 % 1000 AS user_id, {type_case} AS event_type,
       h2 % 1000000 AS value_cents,
       row_id // {GEN_N // 30} AS day
FROM hashed
"""


SRC_GEN_SQL = _gen_sql()


# --------------------------------------------------- pareto front --


def sort_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto front (skyline) of orders: maximize total price,
    minimize order date — "the biggest order as of each date", the
    multi-criteria top-k that no single ORDER BY expresses. A row is
    dominated when some order is at least as early AND at least as
    expensive (one strictly); survivors form the price/date frontier.

    Window form, not the naive O(n²) self-join: sorted by day, the
    strictly-earlier running price max (RANGE frame) plus a same-day
    max catch the two domination cases in one shuffle. Integer cents
    and epoch days end-to-end.
    """
    od = load_table(spark, sf_dir, "orders")
    base = od.select(
        "o_orderkey",
        cents("o_totalprice").alias("price_c"),
        ts_micros(od, "o_orderdate").alias("us"),
    ).select(
        "o_orderkey", "price_c",
        F.expr("us DIV 86400000000").alias("day"),
    )
    # Two-level skyline: survivors must tie their day's max price, so
    # prune to per-day maxima FIRST (partitioned window — parallel),
    # then run the global earlier-day race on the |days|-sized
    # candidate table. The unavoidable single-partition global window
    # thus sees |days| rows, not |orders| (the 10x probe read 3.9x
    # before this pruning, ~1x after — the local-skyline-then-merge
    # pattern every distributed skyline paper uses).
    w_same = Window.partitionBy("day")
    cands = base.withColumn(
        "max_same", F.max("price_c").over(w_same)
    ).filter(F.col("price_c") >= F.col("max_same"))
    w_before = (
        Window.orderBy("day").rangeBetween(Window.unboundedPreceding, -1)
    )
    flagged = cands.select(
        "o_orderkey",
        "price_c",
        "day",
        F.coalesce(F.max("price_c").over(w_before), F.lit(-1)).alias("max_before"),
    )
    return flagged.filter(F.col("price_c") > F.col("max_before")).select(
        "o_orderkey", "price_c", "day"
    )


SORT_PARETO_SQL = """
WITH base AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
),
flagged AS (
  SELECT o_orderkey, price_c, day,
         COALESCE(MAX(price_c) OVER (ORDER BY day
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
           AS max_before,
         MAX(price_c) OVER (PARTITION BY day) AS max_same
  FROM base
)
SELECT o_orderkey, price_c, CAST(day AS BIGINT) AS day
FROM flagged
WHERE price_c > max_before AND price_c >= max_same
"""


def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset completions of ``set_ops``: INTERSECT ALL / EXCEPT
    ALL keep MULTIPLICITY (min / truncated-difference of per-value
    counts) — the bag semantics reconciliation jobs need (a value
    present 5× on one side and 3× on the other is a 2-row diff, not
    zero). Tagged union of both results, counted per key so the
    output is compact and the multiplicity is visible.
    """
    cu = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    su = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    inter = cu.intersectAll(su).groupBy("nationkey").agg(
        F.count("*").alias("n")
    ).withColumn("op", F.lit("intersect_all"))
    exc = cu.exceptAll(su).groupBy("nationkey").agg(
        F.count("*").alias("n")
    ).withColumn("op", F.lit("except_all"))
    return inter.unionByName(exc).select("op", "nationkey", "n")


SET_OPS_ALL_SQL = """
SELECT 'intersect_all' AS op, nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT ALL SELECT s_nationkey FROM supplier) GROUP BY 2
UNION ALL
SELECT 'except_all' AS op, nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL SELECT s_nationkey FROM supplier) GROUP BY 2
"""


DECILE_PCTS = tuple(range(10, 100, 10))


def agg_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decile table of order values per priority class: the nine
    exact positional cut points (p10..p90) as integer cents — the
    distribution summary a pricing/fraud review reads, computed with
    the ``ts_anomaly_mad`` count-table discipline (cuts are least
    values whose cumulative count reaches ceil(n·p/100); no
    interpolation, no floats, so both engines agree bit-for-bit).

    One scan → per-(priority, cents) count table → one cumulative
    window → nine conditional-min picks in a single aggregate.
    """
    od = load_table(spark, sf_dir, "orders")
    vc = od.select(
        "o_orderpriority", cents("o_totalprice").alias("c")
    ).groupBy("o_orderpriority", "c").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("o_orderpriority")
    wc = wt.orderBy("c").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = vc.select(
        "o_orderpriority", "c", "n",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wt).alias("tot"),
    )
    picks = [F.min("tot").alias("n_orders")] + [
        F.min(
            F.when(F.col("cum") * 100 >= F.col("tot") * p, F.col("c"))
        ).alias(f"p{p}_cents")
        for p in DECILE_PCTS
    ]
    return cum.groupBy("o_orderpriority").agg(*picks)


_DECILE_PICKS_SQL = ",\n       ".join(
    f"CAST(MIN(CASE WHEN cum * 100 >= tot * {p} THEN c END) AS BIGINT)"
    f" AS p{p}_cents"
    for p in DECILE_PCTS
)

AGG_DECILES_SQL = f"""
WITH vc AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
cum AS (
  SELECT o_orderpriority, c, n,
         SUM(n) OVER (PARTITION BY o_orderpriority ORDER BY c
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(n) OVER (PARTITION BY o_orderpriority) AS tot
  FROM vc
)
SELECT o_orderpriority, CAST(MIN(tot) AS BIGINT) AS n_orders,
       {_DECILE_PICKS_SQL}
FROM cum GROUP BY 1
"""
