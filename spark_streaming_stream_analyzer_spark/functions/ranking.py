"""Distributed global ranking.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the
whole input through one task (Spark warns: "No Partition Defined for
Window operation"). Harmless for |days|- or |deciles|-sized inputs,
but the vocabulary tables the text operators rank are 10^5-10^6 rows
for a real tokenizer corpus — at 100 TB that single task is the
bottleneck (VERDICT r6 item 5).

:func:`global_rank` computes the identical rank distributed, the
classic three-step sort-rank:

1. ``repartitionByRange`` on the sort key — partition i holds a
   contiguous slice of the global order (Spark's range partitioner
   samples boundaries, so slices are balanced);
2. ``row_number`` within each partition (PARTITION BY the captured
   partition id — every task sorts only its slice);
3. add per-partition row-count offsets. The offset prefix-sum runs
   over ``#partitions`` rows, not ``|table|``, as a broadcast
   lower-id self-join (no unpartitioned window anywhere — P² pairs
   with P bounded by the shuffle-partition count is driver-trivial).

The input is ``localCheckpoint(eager=False)``-ed so the two consumers
(offset census + within-partition rank) read one materialization and
the nondeterministic ``spark_partition_id`` is captured exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _with_partition_offsets(
    df: DataFrame,
    sort_cols: list[Column],
    agg_col: Column,
    num_partitions: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Range-partition ``df`` on ``sort_cols`` and return
    ``(partitioned_df_with_pid, offsets)`` where ``offsets`` maps each
    partition id to the sum of ``agg_col`` over all LOWER partition
    ids (the prefix the partition's local rank/cumsum sits on top
    of). The offset merge is a broadcast lower-id self-join over
    ``#partitions`` rows — no unpartitioned window anywhere."""
    if num_partitions is not None:
        part = df.repartitionByRange(num_partitions, *sort_cols)
    else:
        part = df.repartitionByRange(*sort_cols)
    part = part.withColumn("_gr_pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    sums = part.groupBy("_gr_pid").agg(agg_col.alias("_gr_n"))
    lower = sums.select(
        F.col("_gr_pid").alias("_gr_pid_b"), F.col("_gr_n").alias("_gr_n_b")
    )
    offsets = (
        sums.join(
            F.broadcast(lower), F.col("_gr_pid_b") < F.col("_gr_pid"), "left"
        )
        .groupBy("_gr_pid")
        .agg(F.coalesce(F.sum("_gr_n_b"), F.lit(0)).alias("_gr_off"))
    )
    return part, offsets


def global_rank(
    df: DataFrame,
    sort_cols: list[Column],
    out: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append column ``out`` = the 1-based global ``row_number`` of each
    row under ``sort_cols`` (pass sort orders, e.g. ``[F.desc("cnt"),
    F.asc("w")]`` — include a unique tiebreaker for a deterministic
    rank), without a single-partition pass over ``df``."""
    part, offsets = _with_partition_offsets(
        df, sort_cols, F.count("*"), num_partitions
    )
    within = F.row_number().over(
        Window.partitionBy("_gr_pid").orderBy(*sort_cols)
    )
    return (
        part.withColumn("_gr_rin", within)
        .join(F.broadcast(offsets), "_gr_pid")
        .withColumn(out, (F.col("_gr_off") + F.col("_gr_rin")).cast("long"))
        .drop("_gr_pid", "_gr_rin", "_gr_off")
    )


def global_cumsum(
    df: DataFrame,
    sort_cols: list[Column],
    value_col: str,
    out: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append column ``out`` = the running total of ``value_col`` under
    the global ``sort_cols`` order (inclusive of the current row),
    distributed the same way as :func:`global_rank`: within-partition
    cumsum + lower-partition sum offsets. The exact-median /
    exact-quantile histograms (e.g. ``funnel_latency_quantiles``) need
    this — their (value, count) tables are converter-sized, not
    decile-sized."""
    part, offsets = _with_partition_offsets(
        df, sort_cols, F.sum(value_col), num_partitions
    )
    within = F.sum(value_col).over(
        Window.partitionBy("_gr_pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        part.withColumn("_gr_c", within)
        .join(F.broadcast(offsets), "_gr_pid")
        .withColumn(out, F.col("_gr_off") + F.col("_gr_c"))
        .drop("_gr_pid", "_gr_c", "_gr_off")
    )
