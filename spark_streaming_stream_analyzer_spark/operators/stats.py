"""Per-key running statistics — the reference's flagship operator.

Reference: ``KafkaStreamAverageCalculator.java:102-171`` maintains a
per-key ``Double[8]`` state ``[sum, count, sumsqr, bestmin, bestmax,
mean, m2, var]`` via ``updateStateByKey``, updated with a hand-rolled
Welford loop (``:134-150``). The rebuild expresses the same aggregate
declaratively — ``groupBy(key).agg(...)`` — and lets Catalyst plan it
as partial+final HashAggregate (map-side combine, one shuffle on the
group key, whole-stage codegen). The streaming form (same body) runs
under ``outputMode("update")`` in ``streaming/pipelines.py``.

Output schema mirrors the reference POJO
(``model/SparkStreamingStatisticsProcessingResult.java:5-14``) minus
the ``delta``/``m2`` internals (bug B4 — internal Welford temporaries
with no aggregate meaning; exact-parity mode in
``streaming/state.py`` still exposes them).

Intentional divergences from reference bugs (SURVEY.md §2.3):
 - B1: no ``-10.0``/``-150.0`` min/max sentinels — true ``min``/``max``.
 - B2: the emitted key is the real group key, not a racy global.
 - Q3: ``var`` is 0.0 (not NULL) when n <= 1, matching the reference's
   explicit n<=1 branch (``KafkaStreamAverageCalculator.java:146-150``).

Numeric policy: sums/mean/variance are computed with exact integer-cent
arithmetic (see ``functions/exact.py``) so results are bit-deterministic
under any partitioning — on local[32] today and on 1000 executors at
100 TB. ``tests/test_stats.py`` property-checks them against Spark's
built-in ``avg``/``var_samp`` within FP tolerance (the reference's own
cross-check idea, ``KafkaStreamAverageCalculator.java:174-182``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import avg_money, cents, cents_dec, sum_money, var_exact

#: Result columns, in reference-POJO order (readTag_id first).
STAT_COLS = ("summer", "counter", "sumsqr", "bestmin", "bestmax", "mean", "var")


def stat_aggs(value: Column | str) -> list[Column]:
    """The seven aggregate expressions over a 2-decimal double column."""
    v = F.col(value) if isinstance(value, str) else value
    return [
        sum_money(v).alias("summer"),
        F.count(v).cast("double").alias("counter"),  # reference stores count as Double
        (F.sum(cents_dec(v) * cents_dec(v)).cast("double") / F.lit(10000.0)).alias(
            "sumsqr"
        ),
        F.min(v).alias("bestmin"),
        F.max(v).alias("bestmax"),
        avg_money(v).alias("mean"),
        var_exact(v).alias("var"),
    ]


def running_stats(df: DataFrame, key: str, value: str) -> DataFrame:
    """events-style input → one row per key with the 7 cumulative stats.

    Batch form of op #5 ``agg_running_stats``; the streaming form in
    ``streaming/pipelines.py`` reuses this exact body (Structured
    Streaming's unified API guarantees the update-mode stream result
    equals this batch query on the stream prefix).
    """
    # The reference's key is a string tag id; cast whatever key column is
    # used so the output schema is (readTag_id: string, ...) in both the
    # Spark result and the DuckDB oracle.
    out = df.groupBy(F.col(key).cast("string").alias("readTag_id")).agg(
        *stat_aggs(value)
    )
    return out


def stats_oracle_sql(table: str, key: str, value: str) -> str:
    """DuckDB mirror of :func:`running_stats` — textually kept in
    lock-step with ``stat_aggs`` (same integer-cents arithmetic, same
    final float op order → bit-equal doubles)."""
    c = f"CAST(round({value}*100) AS BIGINT)"
    cd = f"CAST(round({value}*100) AS DECIMAL(18,0))"
    return f"""
SELECT
  CAST({key} AS VARCHAR) AS readTag_id,
  CAST(SUM({c}) AS DOUBLE) / 100.0 AS summer,
  CAST(COUNT({value}) AS DOUBLE) AS counter,
  CAST(SUM({cd} * {cd}) AS DOUBLE) / 10000.0 AS sumsqr,
  MIN({value}) AS bestmin,
  MAX({value}) AS bestmax,
  (CAST(SUM({c}) AS DOUBLE) / 100.0) / CAST(COUNT({value}) AS DOUBLE) AS mean,
  CASE WHEN COUNT({value}) > 1 THEN
    (CAST(SUM({cd} * {cd}) AS DOUBLE) / 10000.0
      - (CAST(SUM({c}) AS DOUBLE) / 100.0) * (CAST(SUM({c}) AS DOUBLE) / 100.0)
        / CAST(COUNT({value}) AS DOUBLE))
    / CAST(COUNT({value}) - 1 AS DOUBLE)
  ELSE 0.0 END AS var
FROM {table}
GROUP BY 1
""".strip()
