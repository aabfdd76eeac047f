"""Batch sink surface: file-format writers with read-back verification.

The reference's only sink is a Kafka producer
(``kafka/KafkaProducer.java:52-54``) plus ``print()``; the rebuild adds
the lake-side writers any batch pipeline needs. The roundtrip operator
writes the flagship result as partitioned parquet and reads it back —
write path, partition layout, and read-back schema are all under oracle
test (the read-back must equal the in-memory aggregate byte-for-byte).

Scale: the write is ``partitionBy`` on the group key — the layout that
makes downstream key-filtered reads partition-prunable. Writer
parallelism follows the upstream partitioning; at 100 TB you tune file
count with ``coalesce``/``maxRecordsPerFile``, not by changing the
operator shape.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.stats import running_stats, stats_oracle_sql
from .tables import load_table


def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write per-key stats as parquet partitioned by key; read back.

    The returned frame is the *read-back*, so the oracle equality
    proves the writer preserved values and the partition columns
    survive the hive-style directory encoding (readTag_id becomes a
    partition directory, restored as a string column on read).
    """
    stats = running_stats(load_table(spark, sf_dir, "events"), "event_type", "value")
    out_dir = os.path.join(tempfile.gettempdir(), f"sgs_sink_{uuid.uuid4().hex[:12]}")
    try:
        stats.write.partitionBy("readTag_id").parquet(out_dir)
        back = spark.read.parquet(out_dir)
        cols = ["readTag_id"] + [c for c in back.columns if c != "readTag_id"]
        pdf = back.select(*cols).toPandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return spark.createDataFrame(pdf, schema=stats.select(*cols).schema)


SINK_PARQUET_SQL = stats_oracle_sql("events", "event_type", "value")
