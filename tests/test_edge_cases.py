"""Degenerate-input robustness: empty / whitespace-only / single-word
documents and empty embedding cells through the text and dedup
operators — no crashes, defined outputs."""

from __future__ import annotations

from pyspark.sql import Row

EDGE_DOCS = [
    Row(doc_id=1, text="", lang="en", source="s", n_chars=0),
    Row(doc_id=2, text="   ", lang="en", source="s", n_chars=3),
    Row(doc_id=3, text="word", lang="en", source="s", n_chars=4),
    Row(doc_id=4, text="two words", lang="en", source="s", n_chars=9),
    Row(doc_id=5, text="a normal length document with several words here",
        lang="en", source="s", n_chars=48),
]


def _with_docs(monkey_module, df, fn, spark):
    orig = monkey_module.load_table_cpu
    try:
        monkey_module.load_table_cpu = lambda s, d, n: df  # noqa: ARG005
        return fn(spark, "x").collect()
    finally:
        monkey_module.load_table_cpu = orig


def test_textstats_on_degenerate_docs(spark):
    import spark_streaming_stream_analyzer_spark.operators.textstats as ts

    df = spark.createDataFrame(EDGE_DOCS)
    toks = {r["doc_id"]: r for r in _with_docs(ts, df, ts.token_count, spark)}
    assert toks[1]["n_ws_tokens"] == 0
    assert toks[2]["n_ws_tokens"] == 0
    assert toks[3]["n_ws_tokens"] == 1
    quality = {r["doc_id"]: r for r in _with_docs(ts, df, ts.text_quality_score, spark)}
    # zero-word docs: ratios are NULL (try_divide), never a crash
    assert quality[1]["stopword_ratio"] is None
    assert quality[5]["quality_score"] > 0
    fp = {r["doc_id"]: r for r in _with_docs(ts, df, ts.doc_fingerprint, spark)}
    # fewer than 3 words -> no shingles -> NULL min hash, md5 still set
    assert fp[3]["min_shingle_hash"] is None
    assert fp[1]["content_md5"] is not None


def test_dedup_tiers_on_degenerate_docs(spark):
    import spark_streaming_stream_analyzer_spark.operators.dedup as dd

    df = spark.createDataFrame(EDGE_DOCS)
    orig = dd.load_table_cpu
    try:
        dd.load_table_cpu = lambda s, d, n: df  # noqa: ARG005
        sim = {r["doc_id"]: r["simhash"] for r in dd.simhash_fingerprint(spark, "x").collect()}
        pairs = dd.dedup_minhash_lsh(spark, "x").collect()
        jac = dd.dedup_ngram_jaccard(spark, "x").collect()
    finally:
        dd.load_table_cpu = orig
    # wordless docs emit no simhash row (no signal), worded docs do
    assert set(sim) == {3, 4, 5}
    # no spurious near-dup pairs among unrelated degenerate docs
    assert pairs == [] and jac == []
