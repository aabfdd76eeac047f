"""SparkSession builder.

Local test profile mirrors the driver environment (``local[N]`` with
``SPARK_GRAFT_CPUS`` threads); the config block is written so the same
settings are what we would ship on a multi-executor cluster: AQE on
(runtime re-planning, skew-join splitting, partition coalescing),
shuffle partitions sized to the parallelism, Arrow enabled for any
Pandas-UDF path, UTC session timezone for deterministic timestamp
semantics against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark_streaming_stream_analyzer_spark",
    *,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # ---- scale-minded defaults (identical on a real cluster) ----
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.ts is parquet TIMESTAMP(NANOS) which Spark refuses by
        # default; read it as a long (ns since epoch) and convert
        # explicitly where event time is needed.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local mode: single JVM — driver memory is the only knob
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # the \r-rewriting console progress bar interleaves with (and
        # silently overwrites) selfcheck/bench per-query lines when
        # stdout is a captured pipe — logs must stay line-oriented
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
