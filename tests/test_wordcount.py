"""Tokenize/word-count semantics (ops #12/#13), incl. the reference's
split-on-single-space behavior (KafkaStreamPropertyAggregator.java:28)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_streaming_stream_analyzer_spark.operators.wordcount import tokenize, word_count
from spark_streaming_stream_analyzer_spark.sources.tables import load_table


def test_counts_sum_to_total_words(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    total_words = tokenize(docs, "text").count()
    counted = word_count(docs, "text").agg(F.sum("cnt")).collect()[0][0]
    assert counted == total_words


def test_split_edge_semantics(spark):
    """Double/leading/trailing spaces produce empty tokens in a raw
    split; the pipeline filters them (Java Pattern.split drops only
    trailing empties — we normalize to 'no empty words')."""
    df = spark.createDataFrame([Row(text="a  b"), Row(text=" c"), Row(text="d ")])
    words = [r["word"] for r in tokenize(df, "text").collect()]
    assert sorted(words) == ["a", "b", "c", "d"]


def test_wordcount_values(spark):
    df = spark.createDataFrame([Row(text="x y x"), Row(text="y x")])
    got = {r["word"]: r["cnt"] for r in word_count(df, "text").collect()}
    assert got == {"x": 3, "y": 2}
