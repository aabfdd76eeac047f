"""Bucketed (pre-shuffled) co-located join — the canonical 100 TB
technique for repeated fact-fact joins: both tables written bucketed by
the join key, so the sort-merge join runs with ZERO Exchange (no
shuffle at query time; the shuffle was paid once at write time).

Kept as a test (not a driver query) because it needs a writable
warehouse + catalog tables, which the driver's environment does not
guarantee."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from spark_streaming_stream_analyzer_spark.sources.tables import load_table

N_BUCKETS = 8


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    wh = tempfile.mkdtemp(prefix="sgs_wh_")
    # disable broadcast so the join is genuinely sort-merge over buckets
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # external tables via path option (warehouse.dir is static conf)
        load_table(spark, sf_dir, "lineitem").write.bucketBy(
            N_BUCKETS, "l_orderkey"
        ).sortBy("l_orderkey").mode("overwrite").option(
            "path", f"{wh}/li"
        ).saveAsTable("li_bucketed")
        load_table(spark, sf_dir, "orders").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        ).write.bucketBy(N_BUCKETS, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).option("path", f"{wh}/od").saveAsTable("od_bucketed")

        joined = (
            spark.table("li_bucketed")
            .join(spark.table("od_bucketed"), "l_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the join itself is exchange-free: the ONLY Exchange in the
        # whole plan is the final tiny groupBy's
        assert plan.count("Exchange") == 1, plan
        # correctness unchanged
        expected = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .count()
            .collect()
        )
        got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
        assert got == {r["o_orderstatus"]: r["count"] for r in expected}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS od_bucketed")
        shutil.rmtree(wh, ignore_errors=True)
