"""Direct equivalence tests for functions/ranking.py.

``global_rank`` / ``global_cumsum`` are the distributed replacement for
unpartitioned ``row_number()/sum() OVER (ORDER BY ...)`` windows
(VERDICT r6 item 5) and are load-bearing under several oracled queries
(vocab ranking, exact-quantile cumsums). Those queries pin them
end-to-end; these tests pin the helpers DIRECTLY against the
single-partition window they replace, across partition counts,
duplicate keys, and sort directions — the regimes where a
range-partition + offset-merge scheme can silently drift (an off-by-one
in the offset join shows up only when partition boundaries move).
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_streaming_stream_analyzer_spark.functions.ranking import (
    global_cumsum,
    global_rank,
)


def _frame(spark, n: int = 500):
    # deterministic values with heavy ties: cnt has ~25 distinct values,
    # w is a unique tiebreaker — the vocab-table shape the helpers rank
    return spark.range(n).select(
        F.col("id").alias("w"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(25))).alias("cnt"),
        (F.pmod(F.col("id") * 13 + 5, F.lit(7)) + 1).alias("v"),
    )


@pytest.mark.parametrize("num_partitions", [None, 1, 3, 16])
def test_global_rank_equals_single_partition_row_number(spark, num_partitions):
    df = _frame(spark)
    sort = [F.desc("cnt"), F.asc("w")]
    got = {
        r["w"]: r["rank"]
        for r in global_rank(
            df, sort, out="rank", num_partitions=num_partitions
        ).collect()
    }
    want = {
        r["w"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*sort))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("num_partitions", [None, 1, 4])
def test_global_cumsum_equals_single_partition_window(spark, num_partitions):
    df = _frame(spark)
    sort = [F.asc("cnt"), F.asc("w")]
    got = {
        r["w"]: r["cum"]
        for r in global_cumsum(
            df, sort, "v", out="cum", num_partitions=num_partitions
        ).collect()
    }
    w = (
        Window.orderBy(*sort)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["w"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_global_rank_is_dense_and_complete(spark):
    # ranks must be exactly 1..n with no gaps or dups regardless of how
    # the range partitioner splits (empty partitions included)
    df = _frame(spark, 113)
    ranks = sorted(
        r["rank"]
        for r in global_rank(df, [F.asc("w")], num_partitions=16).collect()
    )
    assert ranks == list(range(1, 114))


def test_global_rank_single_row_and_empty(spark):
    one = _frame(spark, 1)
    assert global_rank(one, [F.asc("w")]).collect()[0]["rank"] == 1
    empty = _frame(spark, 1).filter("w < 0")
    assert global_rank(empty, [F.asc("w")]).count() == 0
