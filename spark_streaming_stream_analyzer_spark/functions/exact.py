"""Exact fixed-point aggregation helpers.

Why this exists: the driver's correctness gate hash-compares the Spark
result against a DuckDB oracle **by value**. Floating-point sums are
order-dependent, and Spark's partition/merge order differs from
DuckDB's, so ``SUM(double)`` can differ in the last ulps between the two
engines — enough to break a value-hash even though both are "correct".

All money-like fixture columns (``l_extendedprice``, ``value``,
``*_acctbal`` …) sit on an exact 2-decimal grid (verified: max deviation
from the grid < 1e-8). So we aggregate in **integer cents**:

    cents(v)  = CAST(round(v * 100) AS BIGINT)        -- exact
    sum(v)    = SUM(cents(v)) / 100.0                 -- exact integer sum
    avg(v)    = (SUM(cents(v)) / 100.0) / count       -- one deterministic
                                                         float divide
    var(v)    = from exact integer sum / sum-of-squares (the reference's
                own cross-check formula, KafkaStreamAverageCalculator.java:174-182)

Integer addition is associative, so the result is bit-identical no
matter how Spark partitions the data — and identical to DuckDB running
the mirrored SQL. The final float operations (one divide, one subtract)
are performed in the *same order* by both engines on *identical*
integers, so IEEE-754 determinism gives bit-equal doubles.

This is also the right call at 100 TB: long-sum aggregation is exactly
associative across 1000 executors (no FP drift between partial and
final aggregation), and `HashAggregateExec` over longs stays inside
whole-stage codegen.

Overflow discipline: BIGINT sum of cents holds ~9.2e18; the largest
fixture sum is ~6e10 cents at sf0.1, safe through sf~1e7. Squared-cents
sums use DECIMAL(38,0) when the operand can exceed ~1e6 cents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Exact integer-cents representation of a 2-decimal double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(100.0), 0).cast("long")


def cents_dec(col: Column | str) -> Column:
    """Cents as DECIMAL(18,0) — for products whose sum may exceed BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(100.0), 0).cast("decimal(18,0)")


def sum_money(col: Column | str) -> Column:
    """Exact SUM of a 2-decimal double, returned as double.

    Mirrors DuckDB: ``CAST(SUM(CAST(round(v*100) AS BIGINT)) AS DOUBLE) / 100.0``.
    """
    return F.sum(cents(col)).cast("double") / F.lit(100.0)


def avg_money(col: Column | str) -> Column:
    """Exact-sum AVG. Mirrors DuckDB:
    ``(CAST(SUM(...cents...) AS DOUBLE) / 100.0) / CAST(COUNT(v) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(cents(c)).cast("double") / F.lit(100.0)) / F.count(c).cast("double")


def sum_product_money(a: Column, b: Column) -> Column:
    """Exact SUM(a*b) for two 2-decimal doubles → double.

    Both operands go to integer cents; the product is exact in
    DECIMAL(38,0); one deterministic divide at the end.
    """
    prod = (cents_dec(a) * cents_dec(b)).cast("decimal(38,0)")
    return F.sum(prod).cast("double") / F.lit(10000.0)


def var_exact(col: Column | str, *, sample: bool = True) -> Column:
    """Sample variance from exact integer sums (naive/cross-check formula).

    The reference documents this exact formula as its own validation
    oracle for the online Welford estimator
    (``KafkaStreamAverageCalculator.java:174-182``):

        var = (sumsqr - sum^2 / n) / (n - 1)

    Numerically this is safe *here* because sum and sumsqr are exact
    integers (no cancellation noise beyond one final subtract). Returns
    0.0 when n <= 1 to match the reference's n<=1 semantics
    (``KafkaStreamAverageCalculator.java:146-150``, SURVEY.md Q3).

    DuckDB mirror (must be kept textually in sync — see oracle_sql()):

        CASE WHEN COUNT(v) > 1 THEN
          (CAST(SUM(c*c) AS DOUBLE)/10000.0
            - (CAST(SUM(c) AS DOUBLE)/100.0)*(CAST(SUM(c) AS DOUBLE)/100.0)
              / CAST(COUNT(v) AS DOUBLE))
          / CAST(COUNT(v) - 1 AS DOUBLE)
        ELSE 0.0 END
        -- with c = CAST(round(v*100) AS DECIMAL(18,0))
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    s = F.sum(cents_dec(c) * cents_dec(c)).cast("double") / F.lit(10000.0)
    m = F.sum(cents(c)).cast("double") / F.lit(100.0)
    naive = (s - m * m / n) / (F.count(c) - F.lit(1)).cast("double")
    return F.when(F.count(c) > 1, naive).otherwise(F.lit(0.0))
