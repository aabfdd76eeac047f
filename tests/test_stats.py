"""Flagship running-stats tests: exact arithmetic vs Spark built-ins
(the reference's own cross-check idea,
KafkaStreamAverageCalculator.java:174-182), invariants, and the
intentional bug divergences (SURVEY.md §2.3 B1/B2, Q3)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_streaming_stream_analyzer_spark.operators.stats import running_stats
from spark_streaming_stream_analyzer_spark.sources.tables import load_table


def test_exact_matches_builtin_within_tolerance(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {r["readTag_id"]: r for r in running_stats(ev, "user_id", "value").collect()}
    builtin = {
        str(r["user_id"]): r
        for r in ev.groupBy("user_id")
        .agg(
            F.sum("value").alias("s"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
        .collect()
    }
    assert exact.keys() == builtin.keys()
    for k, e in exact.items():
        b = builtin[k]
        assert math.isclose(e["summer"], b["s"], rel_tol=1e-9)
        assert math.isclose(e["mean"], b["m"], rel_tol=1e-9)
        assert math.isclose(e["var"], b["v"], rel_tol=1e-6)


def test_invariants(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    for r in running_stats(ev, "event_type", "value").collect():
        assert r["bestmin"] <= r["mean"] <= r["bestmax"]
        assert r["var"] >= 0.0
        assert r["counter"] > 0


def test_b1_divergence_no_min_sentinel(spark):
    """Reference seeds bestmin=-10 so positive-only streams report a
    min of -10 (bug B1). We must report the true minimum."""
    df = spark.createDataFrame(
        [Row(k="a", v=5.0), Row(k="a", v=7.5), Row(k="a", v=3.25)]
    )
    row = running_stats(df, "k", "v").collect()[0]
    assert row["bestmin"] == 3.25  # reference would emit -10.0
    assert row["bestmax"] == 7.5


def test_b2_divergence_correct_keys(spark):
    """Reference labels results with a racy global tag (bug B2); every
    key must carry its own stats."""
    df = spark.createDataFrame(
        [Row(k="a", v=1.0), Row(k="b", v=100.0), Row(k="b", v=200.0)]
    )
    out = {r["readTag_id"]: r for r in running_stats(df, "k", "v").collect()}
    assert out["a"]["counter"] == 1.0 and out["a"]["summer"] == 1.0
    assert out["b"]["counter"] == 2.0 and out["b"]["summer"] == 300.0


def test_q3_variance_zero_for_single_sample(spark):
    """Reference emits var=0 (not NULL/NaN) for n<=1
    (KafkaStreamAverageCalculator.java:146-150)."""
    df = spark.createDataFrame([Row(k="solo", v=42.0)])
    row = running_stats(df, "k", "v").collect()[0]
    assert row["var"] == 0.0
