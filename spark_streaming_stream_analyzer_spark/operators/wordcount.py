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
