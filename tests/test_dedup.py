"""Dedup-tier cross-validation: the probabilistic tiers (MinHash-LSH,
SimHash) against the exact n-gram Jaccard ground truth."""

from __future__ import annotations

from pyspark.sql import Row

from spark_streaming_stream_analyzer_spark import registry
from spark_streaming_stream_analyzer_spark.operators.dedup import simhash_fingerprint


def test_lsh_candidates_are_truly_similar(spark, sf_dir):
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in registry.QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in registry.QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    # no wild false positives: every LSH pair (est>=0.5) has meaningful
    # true overlap
    for pair, est in lsh.items():
        assert pair in exact, f"LSH pair {pair} has true J < 0.4 (est={est})"
    # recall on strong near-dups: every exact pair with J>=0.8 is found
    strong = {p for p, j in exact.items() if j >= 0.8}
    missed = strong - set(lsh)
    assert not missed, f"LSH missed strong near-dups: {missed}"


def test_simhash_identical_docs_equal(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon"),
            Row(doc_id=2, text="alpha beta gamma delta epsilon"),
            Row(doc_id=3, text="totally different words entirely here"),
        ]
    )
    import spark_streaming_stream_analyzer_spark.operators.dedup as dd

    # run the fingerprint body over an inline frame
    orig = dd.load_table_cpu
    try:
        dd.load_table_cpu = lambda s, d, n: df  # noqa: ARG005
        out = {r["doc_id"]: r["simhash"] for r in simhash_fingerprint(spark, "x").collect()}
    finally:
        dd.load_table_cpu = orig
    assert out[1] == out[2]
    assert out[1] != out[3]
