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


def test_oov_rate_vs_brute(spark, sf_dir):
    from collections import Counter

    from spark_streaming_stream_analyzer_spark.operators import textstats as ts
    from spark_streaming_stream_analyzer_spark.sources.tables import (
        load_table_cpu,
    )

    docs = load_table_cpu(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    cnt = Counter()
    toks = {}
    for r in docs:
        ws = [w for w in r["text"].split(" ") if w]
        toks[r["doc_id"]] = ws
        cnt.update(ws)
    vocab = {
        w for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            : ts.OOV_VOCAB_K
        ]
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_ppm"])
        for r in ts.text_oov_rate(spark, sf_dir).collect()
    }
    for d, ws in toks.items():
        oov = sum(1 for w in ws if w not in vocab)
        assert got[d] == (len(ws), oov, oov * 1_000_000 // len(ws))
    assert any(v[1] > 0 for v in got.values())  # OOV tokens exist
