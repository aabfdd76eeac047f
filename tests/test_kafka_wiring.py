"""Broker-less witness of the live Kafka wiring (VERDICT r7 item 6).

The container has no Kafka broker, so ``kafka_source``/``kafka_sink``
can never run end-to-end here — but everything that DECIDES whether a
real deployment works is still testable:

- the exact option maps handed to the connector (a drifted option name
  — e.g. ``bootstrap.servers`` without the ``kafka.`` prefix, or
  ``topics`` instead of ``subscribe`` — fails HERE, not at deploy);
- the (key, value) record serialization the sink ships (parsed back
  field-by-field against the stats columns);
- the format string itself: asking Spark for the "kafka" source must
  fail with the connector-missing error naming KAFKA (proving the
  format id is right), or — if a connector jar is ever present —
  yield the canonical 7-column Kafka schema.

Reference surface mapped: ``KafkaStreamAverageCalculator.java:66-67``
(source), ``kafka/KafkaProducer.java:52-54`` (sink).
"""

from __future__ import annotations

import json

import pytest

from spark_streaming_stream_analyzer_spark.streaming.pipelines import (
    kafka_record,
    kafka_sink,
    kafka_sink_options,
    kafka_source_options,
)


def test_source_options_exact():
    opts = kafka_source_options("broker1:9092,broker2:9092", "readings")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "readings",
        "startingOffsets": "latest",
    }


def test_sink_options_exact():
    opts = kafka_sink_options("broker1:9092", "results", "/ckpt/kafka")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092",
        "topic": "results",
        "checkpointLocation": "/ckpt/kafka",
    }


def test_record_serialization_roundtrip(spark, sf_dir):
    """The sink record must be (key string, value JSON-of-stats): key
    equals readTag_id and the value parses back to exactly the stats
    columns — the 10-field result shape the reference produces
    (KafkaStreamAverageCalculator.java:164-168)."""
    from spark_streaming_stream_analyzer_spark.operators import stats
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    s = stats.running_stats(
        load_table(spark, sf_dir, "events"), "event_type", "value"
    )
    rec = kafka_record(s).toPandas()
    assert list(rec.columns) == ["key", "value"]
    assert len(rec) > 0
    stat_cols = set(s.columns)
    for _, row in rec.iterrows():
        payload = json.loads(row["value"])
        assert payload["readTag_id"] == row["key"]
        # to_json drops null fields; every field present must be a
        # stats column, and the tag plus the core accumulators must
        # always be present (non-null by construction on real data)
        assert set(payload) <= stat_cols
        assert {"readTag_id", "summer", "counter"} <= set(payload)


def test_kafka_format_id_resolves_or_names_kafka(spark):
    """`.format("kafka")` must reach the Kafka connector lookup: with
    no connector jar Spark raises the data-source-not-found error that
    NAMES kafka and points at the deployment doc — proving the format
    id is the real connector id, not a typo that would fail the same
    way in production WITH the jar installed."""
    from spark_streaming_stream_analyzer_spark.streaming.pipelines import (
        kafka_source,
    )

    try:
        df = kafka_source(spark, "localhost:9092", "readings")
    except Exception as e:  # connector jar absent (the container norm)
        msg = str(e).upper()
        assert "KAFKA" in msg, f"format id drifted: {e}"
    else:  # jar present: the unstarted frame has the canonical schema
        cols = set(df.columns)
        assert {"key", "value", "topic", "partition", "offset"} <= cols


def test_sink_writer_constructs_without_broker(spark):
    """The unstarted DataStreamWriter must build cleanly from a
    streaming (key, value) frame — wiring errors that surface at
    construction (non-streaming input, malformed option map) fail
    here; only the broker connection itself waits for start()."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    )
    rec = stream.select(
        F.col("value").cast("string").alias("key"),
        F.to_json(F.struct("value", "timestamp")).alias("value"),
    )
    writer = kafka_sink(rec, "localhost:9092", "results", "/tmp/ck")
    assert writer is not None
