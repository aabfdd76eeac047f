"""Tokenize + word-count — the reference's second job.

Reference: ``KafkaStreamPropertyAggregator.java`` extracts
``readTag_id`` from each JSON record (``:64-72``), splits it on a
single space (``SPACE = Pattern.compile(" ")``, ``:28``; ``:74-79``),
maps to (word, 1) and ``reduceByKey`` sums per 2-second micro-batch
(``:81-94``).

Rebuild (ops #11, #12, #13): ``explode(split(line, ' '))`` →
``groupBy(word).count()``. Catalyst plans the count as partial+final
HashAggregate — the same map-side-combine structure ``reduceByKey``
gave the reference, but codegen'd and shuffle-efficient (only distinct
words cross the wire). Per-micro-batch scoping (SURVEY.md Q2) is a
streaming concern handled via ``foreachBatch`` in
``streaming/pipelines.py``; the batch form here counts the whole input.

Split semantics: Spark ``split(col, ' ')`` and the reference's
``Pattern.split`` both drop trailing empty strings; the DuckDB oracle
uses ``string_split`` which keeps them, so the oracle filters
``word <> ''`` — fixture texts are single-spaced so the filter is a
no-op recorded for edge-parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """op #12 ``op_flatmap_tokenize``: one output row per word."""
    return df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")


def word_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """op #13 ``agg_batch_wordcount``: (word, cnt) over the whole input."""
    return tokenize(df, text_col).groupBy("word").agg(F.count("*").alias("cnt"))


N_SALTS = 16


def word_count_salted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Skew-resistant two-stage count: pre-aggregate on (word, salt),
    then merge per word.

    At 100 TB a handful of stopwords dominate token streams; a single
    groupBy(word) sends every occurrence of "the" to one reducer. The
    salted form spreads each hot key over N_SALTS partial groups (first
    shuffle is uniform by construction), then merges the tiny partial
    table. Counts are integers, so the two-stage sum is exactly the
    one-stage answer — same oracle as ``word_count``. AQE's skew
    handling covers moderate skew automatically; explicit salting is
    the deterministic heavy-artillery variant worth owning as an
    operator.
    """
    salted = (
        tokenize(df, text_col)
        # deterministic salt: uniform, engine-local (never observable in
        # the result), cheap murmur3 on the word + a row-position nonce
        # is unnecessary — spreading by monotonically_increasing_id's
        # low bits is uniform within partitions and free
        .withColumn("salt", (F.monotonically_increasing_id() % N_SALTS))
        .groupBy("word", "salt")
        .agg(F.count("*").alias("partial_cnt"))
    )
    return salted.groupBy("word").agg(F.sum("partial_cnt").alias("cnt"))
