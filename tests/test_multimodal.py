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


def test_decode_image_gated_without_pil(spark, sf_dir):
    from spark_streaming_stream_analyzer_spark.operators.multimodal import has_pil

    if has_pil():
        pytest.skip("PIL present: real path covered by test_decode_image_real_png")
    stub = decode_image(payloads(spark, sf_dir).limit(1))
    # schema plumbing is real even though the kernel is gated
    assert [f.name for f in stub.schema.fields] == [
        "doc_id", "width", "height", "embedding",
    ]
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        stub.collect()


def test_decode_schemas_are_declared(spark, sf_dir):
    """The decode kernels' Spark plumbing (schema, Arrow batch wiring)
    is real regardless of codec availability: plans build with the
    declared schemas without executing."""
    from spark_streaming_stream_analyzer_spark.operators.multimodal import (
        AUDIO_FEATURES_SCHEMA,
        IMAGE_FEATURES_SCHEMA,
        decode_audio,
        decode_image,
        payloads,
    )

    p = payloads(spark, sf_dir).limit(2)
    assert decode_image(p).schema == IMAGE_FEATURES_SCHEMA
    assert decode_audio(p).schema == AUDIO_FEATURES_SCHEMA


def _wav_bytes(sr: int, nch: int, samples) -> bytes:
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(
            b"".join(struct.pack("<h", int(s)) for s in samples)
        )
    return buf.getvalue()


def test_decode_audio_real_wav(spark):
    """decode_audio is NOT a stub: stdlib-wave + numpy MFCC run in any
    container. A 440 Hz sine and a stereo variant decode to the right
    sample rate and a finite 13-dim feature vector, and the stereo
    channel-mean equals the mono signal's features."""
    import math

    from spark_streaming_stream_analyzer_spark.operators.multimodal import (
        decode_audio,
    )

    sr = 16000
    mono = [12000.0 * math.sin(2 * math.pi * 440 * t / sr) for t in range(sr // 4)]
    stereo = [v for s in mono for v in (s, s)]
    df = spark.createDataFrame(
        [(1, _wav_bytes(sr, 1, mono)), (2, _wav_bytes(sr, 2, stereo))],
        schema="doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert rows[1]["sample_rate"] == sr and rows[2]["sample_rate"] == sr
    for r in rows.values():
        assert len(r["mfcc"]) == 13
        assert all(math.isfinite(v) for v in r["mfcc"])
    # stereo frames average back to the mono signal → identical MFCCs
    assert rows[1]["mfcc"] == pytest.approx(rows[2]["mfcc"], abs=1e-4)


def test_decode_image_real_png(spark):
    """Runs the real PIL decode path wherever PIL exists; skips
    cleanly on codec-less containers so the kernel is not permanently
    dead code."""
    from spark_streaming_stream_analyzer_spark.operators.multimodal import (
        decode_image,
        has_pil,
    )

    if not has_pil():
        pytest.skip("PIL absent in this container")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), color=(200, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(7, buf.getvalue())], schema="doc_id long, payload binary"
    )
    (row,) = decode_image(df).collect()
    assert (row["width"], row["height"]) == (32, 16)
    assert len(row["embedding"]) == 16
    assert all(0.0 <= v <= 1.0 for v in row["embedding"])


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


def test_shard_manifest_packs_contiguously(spark, sf_dir):
    """Shards partition each origin's blobs; byte sums reconstruct
    the origin total; doc ranges of consecutive shards don't overlap."""
    from spark_streaming_stream_analyzer_spark.operators import multimodal as mm
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(
            (r["doc_id"], len(r["text"].encode("utf-8")))
        )
    expect = {}
    for src, docs in by_src.items():
        docs.sort()
        off = 0
        for d, nb in docs:
            sh = off // mm.SHARD_BYTES
            e = expect.setdefault((src, sh), [0, 0, None, None])
            e[0] += 1
            e[1] += nb
            e[2] = d if e[2] is None else min(e[2], d)
            e[3] = d if e[3] is None else max(e[3], d)
            off += nb
    got = {
        (r["origin"], r["shard"]): [
            r["n_blobs"], r["sum_bytes"], r["first_doc"], r["last_doc"]
        ]
        for r in mm.mm_shard_manifest(spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in expect.items()}
    for (src, sh), (_, _, fd, ld) in got.items():
        nxt = got.get((src, sh + 1))
        if nxt:
            assert nxt[2] > ld or nxt[2] == ld  # boundary doc may straddle


def test_byte_histogram_vs_brute(spark, sf_dir):
    from collections import Counter

    from spark_streaming_stream_analyzer_spark.operators import multimodal as mm
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    expect = {}
    for r in rows:
        bs = Counter(r["text"].encode("utf-8"))
        n = sum(bs.values())
        if n == 0:
            continue
        expect[r["doc_id"]] = (
            n, len(bs), (max(bs.values()) * 1_000_000) // n
        )
    got = {
        r["doc_id"]: (r["n_bytes"], r["distinct_bytes"], r["top_byte_ppm"])
        for r in mm.mm_byte_histogram(spark, sf_dir).collect()
    }
    assert got == expect
    # text payloads are heavily skewed: the top byte (space) dominates
    assert all(v[2] > 100_000 for v in got.values())
