"""Multimodal plumbing tests: binary columns, mapInPandas batch path,
and the gated decode stubs."""

from __future__ import annotations

import hashlib

import pytest

from spark_streaming_stream_analyzer_spark.operators.multimodal import (
    FRAME_LEN,
    FRAME_STRIDE,
    decode_image,
    mm_binary_meta,
    mm_frame_sample,
    payloads,
)
from spark_streaming_stream_analyzer_spark.sources.tables import load_table


def test_binary_meta_matches_python(spark, sf_dir):
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, sf_dir, "documents").limit(20).collect()}
    got = {
        r["doc_id"]: r
        for r in mm_binary_meta(spark, sf_dir).filter(
            "doc_id < 20"
        ).collect()
    }
    for doc_id, text in docs.items():
        raw = text.encode("utf-8")
        assert got[doc_id]["n_bytes"] == len(raw)
        assert got[doc_id]["sha256_hex"] == hashlib.sha256(raw).hexdigest()


def test_frame_sample_matches_direct_computation(spark, sf_dir):
    text = load_table(spark, sf_dir, "documents").filter("doc_id = 0").collect()[0][
        "text"
    ]
    frames = {
        r["frame_no"]: r["frame_md5"]
        for r in mm_frame_sample(spark, sf_dir).filter("doc_id = 0").collect()
    }
    data = text.encode("utf-8")
    for i, md5 in frames.items():
        window = data[i * FRAME_STRIDE : i * FRAME_STRIDE + FRAME_LEN]
        assert hashlib.md5(window).hexdigest() == md5


def test_decode_stub_is_gated(spark, sf_dir):
    stub = decode_image(payloads(spark, sf_dir).limit(1))
    # schema plumbing is real even though the kernel is stubbed
    assert [f.name for f in stub.schema.fields] == [
        "doc_id", "width", "height", "embedding",
    ]
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        stub.collect()


def test_decode_stubs_have_real_plumbing(spark, sf_dir):
    """The decode kernels are stubs, but their Spark plumbing (schema,
    Arrow batch wiring) must be real: the plan builds, the schema is
    the declared one, and execution surfaces NotImplementedError."""
    import pytest

    from spark_streaming_stream_analyzer_spark.operators.multimodal import (
        AUDIO_FEATURES_SCHEMA,
        IMAGE_FEATURES_SCHEMA,
        decode_audio,
        decode_image,
        payloads,
    )

    p = payloads(spark, sf_dir).limit(2)
    img = decode_image(p)
    aud = decode_audio(p)
    assert img.schema == IMAGE_FEATURES_SCHEMA
    assert aud.schema == AUDIO_FEATURES_SCHEMA
    for df in (img, aud):
        with pytest.raises(Exception) as ei:
            df.collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )


def test_audio_chunks_cover_payload_exactly(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_streaming_stream_analyzer_spark import registry

    chunks = registry.QUERIES["mm_audio_chunk"](spark, sf_dir)
    per_doc = {
        r["doc_id"]: (r["total"], r["n_chunks"], r["max_chunk"])
        for r in chunks.groupBy("doc_id")
        .agg(
            F.sum("n_bytes").alias("total"),
            F.count("*").alias("n_chunks"),
            F.max("n_bytes").alias("max_chunk"),
        )
        .collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", F.length("text").alias("n")).collect()
    from spark_streaming_stream_analyzer_spark.operators.multimodal import CHUNK_LEN

    for d in docs:
        if d["n"] == 0:
            assert d["doc_id"] not in per_doc
            continue
        total, n_chunks, max_chunk = per_doc[d["doc_id"]]
        assert total == d["n"]
        assert max_chunk <= CHUNK_LEN
        assert n_chunks == (d["n"] + CHUNK_LEN - 1) // CHUNK_LEN


def test_phash_pairs_are_ordered_and_verified(spark, sf_dir):
    from spark_streaming_stream_analyzer_spark import registry
    from spark_streaming_stream_analyzer_spark.operators import multimodal as mm

    rows = registry.QUERIES["mm_phash_dedup"](spark, sf_dir).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["hamming"] <= mm.PHASH_HAM_T
