"""Batch table sources over the driver-generated parquet fixtures.

The reference's only source is a receiver-based Kafka 0.8 DStream
(``KafkaStreamAverageCalculator.java:66-67``). The rebuild's batch
stand-in (SURVEY.md §2.1 #1 ``src_kafka_stream``) is a parquet scan of
the ``events`` table, whose ``props`` JSON-string column plays the role
of the Kafka record value. Streaming sources live in
``streaming/pipelines.py``.

Parquet scans here are where Catalyst pushdown lands: any filter /
column selection applied by downstream operators reaches the scan as
``PushedFilters`` / pruned ``ReadSchema`` — verified in
``tests/test_plans.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The fixture `events.ts` is parquet TIMESTAMP(NANOS), which Spark
    # rejects unless nanos are read as raw longs. Set it here (it is a
    # runtime-settable session conf) so the operator surface works on
    # any caller-provided SparkSession, not just ours. Likewise pin the
    # session timezone: fixture timestamps are UTC-midnight-aligned and
    # the oracle compares date-cast strings, so a caller session in a
    # non-UTC zone must not shift them.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = clean_measurements(df)
    return df


def clean_measurements(df: DataFrame) -> DataFrame:
    """The finite-measurement contract (round-8 NaN/Inf sweep): a
    non-finite ``value`` reading (NaN / ±Inf — a broken sensor, a
    JSON-decoded "Infinity") is a MISSING reading, i.e. NULL.

    Without this, one NaN in 100 TB kills every exact-cents job in
    both engines (Spark ANSI CAST_OVERFLOW on round(NaN*100)::BIGINT;
    DuckDB the same cast error) — 98 of 327 registered queries crashed
    on a NaN/Inf fixture. NULLing at load converts the whole class to
    the already-hardened NULL-value regime, keeps row counts and event
    sequences intact, and is the one edit point every consumer (batch
    ``load_table``, streaming ``events_file_stream``) shares. The
    DuckDB oracles carry the identical contract via a mechanical
    shadow CTE (``registry._shadow_finite_events``). At every real sf
    the fixture is all-finite, so this is an identity projection.
    """
    if "value" not in df.columns:
        return df
    c = F.col("value")
    finite = (
        ~F.isnan(c)
        & (c != F.lit(float("inf")))
        & (c != F.lit(float("-inf")))
    )
    return df.withColumn("value", F.when(finite, c))


def ts_timestamp(df: DataFrame, col: str = "ts") -> Column:
    """``events.ts`` as a proper TIMESTAMP, whatever the fixture
    vintage: older fixtures carry parquet TIMESTAMP(NANOS) read as a
    bigint of epoch-nanos (``nanosAsLong``), current ones a native
    timestamp[us] (read as TIMESTAMP_NTZ). Integer DIV for the nanos
    branch: ts ≈ 1.7e18 exceeds double's 2^53 mantissa, so a float
    divide would corrupt microseconds. The NTZ branch casts through
    the session timezone, which ``load_table`` pins to UTC."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return F.timestamp_micros(F.expr(f"{col} DIV 1000"))
    return F.col(col).cast("timestamp")


def ts_micros(df: DataFrame, col: str = "ts") -> Column:
    """``events.ts`` as bigint epoch-microseconds (both vintages) —
    the integer form every exact-arithmetic operator and the DuckDB
    oracle's ``epoch_us(ts)`` agree on."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return F.expr(f"{col} DIV 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


def load_table_cpu(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table for a CPU-heavy per-row stage (md5 shingling,
    tokenization, Pandas-UDF decode), guaranteeing the scan has at
    least ``defaultParallelism`` partitions.

    A CPU-bound stage must never have fewer partitions than cores. The
    local fixtures are single parquet files with one row group, which
    the reader cannot split — so e.g. ``documents`` (500 KB) arrives as
    ONE partition and a shingling pass runs on 1 of 32 cores. A
    round-robin repartition of the raw rows is a trivially cheap
    shuffle (input ≪ the per-row compute it unlocks) and is a no-op
    decision on a real 100 TB layout where file count already exceeds
    core count — there the scan arrives with ample partitions and we
    skip the repartition entirely.
    """
    df = load_table(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register fixture tables as temp views for ``spark.sql``."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
