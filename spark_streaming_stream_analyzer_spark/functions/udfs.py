"""Python UDF surface (SURVEY.md §2.2 "UDF/UDAF/UDTF"): the reference
has no public UDF surface — its one custom computation is the
``updateStateByKey`` closure (rebuilt in ``streaming/state.py``). This
module rounds out the rebuild's Python extension points with the two
shapes not exercised elsewhere:

 - a **scalar** ``pandas_udf`` (Arrow-vectorized, batch-at-a-time — the
   only acceptable Python scalar path at scale; row-at-a-time
   ``F.udf`` is deliberately absent from this codebase), and
 - a **grouped-aggregate** ``pandas_udf`` (a custom UDAF the engine
   runs after the group shuffle).

Both kernels are chosen to be *exactly* reproducible by the DuckDB
oracle: the scalar op is the integer-cents quantization (round-half-up
to long, order-free) and the UDAF is the exact median of integer cents
(numpy partition-based; ties at even n resolve to the mean of the two
middles — one deterministic float divide). The remaining Python shapes
are covered elsewhere: grouped-map ``applyInPandas``/``mapInPandas``
(multimodal frame sampling ≈ UDTF: 1 row → N rows) and stateful
``applyInPandasWithState`` (exact-parity state op).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..sources.tables import load_table


def _make_udfs():
    """Build the UDF objects lazily — ``pandas_udf`` parses its return
    type through the active SparkSession, so module-import time (before
    any session exists, e.g. under the driver's import of the registry)
    is too early."""

    @pandas_udf("long")
    def cents_udf(v: pd.Series) -> pd.Series:
        # Scalar vectorized UDF: 2-decimal double → exact integer
        # cents. numpy round is banker's at .5; the fixture grid has no
        # exact .005 remainders after *100 (verified by the oracle
        # equality), so round matches SQL round here. Nullable-Int64,
        # not int64: a NULL value must pass through as null (for the
        # downstream isNotNull filter) — .astype("int64") on a NaN
        # raises IntCastingNaNError and kills the Python worker.
        return (v * 100.0).round().astype("Int64")

    @pandas_udf("double")
    def median_cents_udaf(v: pd.Series) -> float:
        # Grouped-agg UDAF: exact median of integer cents, as a double
        # in currency units. Works on the post-shuffle whole group —
        # the UDAF shape Spark offers Python (no partial aggregation;
        # for an associative Python aggregate at 100 TB prefer a
        # two-stage groupBy with mapInPandas partials).
        # dropna first: the grouped series can carry NULLs, and the
        # int64 cast raises on NaN (the streaming _update twin dropna()s
        # before the identical cast)
        cents = (v.dropna() * 100.0).round().astype("int64").to_numpy()
        cents.sort()
        n = len(cents)
        if n == 0:
            return float("nan")
        mid = n // 2
        if n % 2:
            return float(cents[mid]) / 100.0
        return (float(cents[mid - 1]) + float(cents[mid])) / 2.0 / 100.0

    @pandas_udf("double")
    def sum_cents_udaf(v: pd.Series) -> float:
        # exact integer-cents sum (a grouped-agg pandas UDF cannot be
        # mixed with JVM aggregates in one agg() — so the sum is a UDAF
        # here too; associative integers keep it order-free)
        return float(
            (v.dropna() * 100.0).round().astype("int64").sum()
        ) / 100.0

    return cents_udf, sum_cents_udaf, median_cents_udaf


def udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar UDF + grouped-agg UDAFs over events: per event_type, the
    exact cent sum and exact median. Arrow-batched both ways (one
    Python round-trip per batch / group, never per row). The scalar
    UDF output also feeds a plain filter to prove scalar placement
    composes with JVM expressions."""
    cents_udf, sum_cents_udaf, median_cents_udaf = _make_udfs()
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("v_cents", cents_udf("value"))
        .filter(F.col("v_cents").isNotNull())
        .groupBy(F.col("event_type").cast("string").alias("readTag_id"))
        .agg(
            sum_cents_udaf("value").alias("sum_value"),
            median_cents_udaf("value").alias("median_value"),
        )
    )


UDF_SURFACE_SQL = """
-- WHERE mirrors the Spark side's v_cents.isNotNull() pre-group filter:
-- a key whose EVERY measurement is missing emits no group at all
-- (round-9 zero-variance sweep); identity otherwise (SUM and
-- quantile_cont already skip NULLs).
SELECT CAST(event_type AS VARCHAR) AS readTag_id,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value,
       CAST(quantile_cont(CAST(round(value*100) AS BIGINT), 0.5) AS DOUBLE)/100.0
         AS median_value
FROM events WHERE value IS NOT NULL GROUP BY 1
"""
