"""Multimodal-column operators (build plan M5).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct — the pattern that scales to 100 TB because the
blob never leaves the executor and per-batch work flows through
Arrow-backed Pandas UDFs (``mapInPandas``), not row-at-a-time Python.

The container has no image/audio codecs, so the *decode* kernels are
STUBS (clearly marked, raising ``NotImplementedError``) or
deterministic fakes; the Spark-side plumbing — schema, batch iteration,
partitioning — is real and oracle-tested:

 - ``mm_binary_meta``   — blob length + sha256, pure JVM expressions.
 - ``mm_frame_sample``  — deterministic fake "frame extraction" via
   ``mapInPandas``: fixed-stride 16-byte windows of the payload,
   md5-fingerprinted per frame. The DuckDB oracle reproduces it with
   substr+md5, proving the Pandas path computes exactly what the
   declarative spec says.
 - ``decode_image`` / ``decode_audio`` — gated stubs with the real
   signatures a codec-bearing cluster would use.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table_cpu

FRAME_LEN = 16
N_FRAMES = 4
FRAME_STRIDE = 32


def payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + metadata struct, synthesized from
    documents.text (the container ships no media files; at production
    the blob comes from the lake as-is)."""
    docs = load_table_cpu(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").cast("long").alias("n_bytes_claimed"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob metadata: true byte length + sha256 — JVM-side only."""
    p = payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256_hex"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.origin").alias("origin"),
    )


MM_BINARY_META_SQL = """
SELECT doc_id,
       CAST(length(text) AS INT) AS n_bytes,
       sha256(text) AS sha256_hex,
       'text/plain' AS mime,
       source AS origin
FROM documents
"""

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake frame sampling via ``mapInPandas``.

    Real plumbing: Arrow batches in, a pandas frame of (doc_id,
    frame_no, frame_md5) out, schema declared up front. The "decode"
    is a fixed-stride byte-window md5 — swap the body for a codec call
    on a real cluster and nothing else changes.
    """
    p = payloads(spark, sf_dir).select("doc_id", "payload")

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, str]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for i in range(N_FRAMES):
                    start = i * FRAME_STRIDE
                    window = data[start : start + FRAME_LEN]
                    if not window:
                        break
                    rows.append(
                        (int(doc_id), i, hashlib.md5(window).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_md5"])

    return p.mapInPandas(sample_frames, schema=_FRAME_SCHEMA)


MM_FRAME_SAMPLE_SQL = f"""
SELECT doc_id, CAST(i AS INT) AS frame_no,
       md5(substr(text, 1 + i * {FRAME_STRIDE}, {FRAME_LEN})) AS frame_md5
FROM documents, range({N_FRAMES}) t(i)
WHERE length(substr(text, 1 + i * {FRAME_STRIDE}, {FRAME_LEN})) > 0
"""


# ----------------------------------------------------------- real stubs --

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(df: DataFrame) -> DataFrame:
    """STUB — image decode + feature extraction.

    On a codec-bearing cluster this is a ``mapInPandas`` over Arrow
    batches calling PIL/torchvision per batch; the container has no
    image libraries, so invoking the returned DataFrame raises.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode requires PIL/torchvision, not present in this "
            "container; plumbing (schema/batching) is what is under test"
        )
        yield  # pragma: no cover

    return df.mapInPandas(_decode, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("mfcc", T.ArrayType(T.FloatType())),
    ]
)


def decode_audio(df: DataFrame) -> DataFrame:
    """STUB — audio decode + MFCC features (same contract as
    :func:`decode_image`)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "audio decode requires soundfile/librosa, not present in this "
            "container"
        )
        yield  # pragma: no cover

    return df.mapInPandas(_decode, schema=AUDIO_FEATURES_SCHEMA)


RESIZE_TO = 8


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake "resize": nearest-neighbor downsample of the
    payload byte stream to RESIZE_TO bytes (position i samples byte
    floor(i·len/RESIZE_TO)), fingerprinted with md5 — the byte-domain
    stand-in for image resizing. Same ``mapInPandas`` plumbing as a
    real PIL resize kernel; the DuckDB oracle reproduces the sampled
    bytes with substr arithmetic, pinning the Pandas batch code to the
    declarative spec exactly.
    """
    p = payloads(spark, sf_dir).select("doc_id", "payload")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, str]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n = len(data)
                if n == 0:
                    continue
                sampled = bytes(
                    data[(i * n) // RESIZE_TO] for i in range(RESIZE_TO)
                )
                rows.append(
                    (int(doc_id), n, hashlib.md5(sampled).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "orig_bytes", "resized_md5"]
            )

    return p.mapInPandas(
        resize,
        schema="doc_id long, orig_bytes int, resized_md5 string",
    )


MM_RESIZE_SQL = f"""
SELECT doc_id,
       CAST(length(text) AS INT) AS orig_bytes,
       md5(list_aggregate(list_transform(range({RESIZE_TO}),
             i -> substr(text, 1 + CAST(floor(i * length(text) / {RESIZE_TO}) AS INT), 1)),
           'string_agg', '')) AS resized_md5
FROM documents
WHERE length(text) > 0
"""


_FEAT_DIM = 8

_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dim", T.IntegerType()),
        T.StructField("feat", T.DoubleType()),
    ]
)


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake feature extraction via ``mapInPandas`` — the
    embed-the-blob stage of a multimodal pipeline with the codec/model
    swapped for a hash-derived projection (md5(payload ‖ dim) → [0,1)
    at 3 decimals). Real plumbing: Arrow batches, long-form output
    (doc_id, dim, feat) — long form rather than array<double> so the
    result is canonicalizer-safe and oracle-hashable. Swap the body
    for a model call on a GPU cluster; schema and partitioning stand.
    """
    p = payloads(spark, sf_dir).select("doc_id", "payload")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, float]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for d in range(_FEAT_DIM):
                    h = hashlib.md5(data + str(d).encode()).hexdigest()
                    rows.append(
                        (int(doc_id), d, float(int(h[:8], 16) % 1000) / 1000.0)
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "dim", "feat"])

    return p.mapInPandas(extract, schema=_FEAT_SCHEMA)


MM_FEATURE_SQL = f"""
SELECT doc_id, CAST(d AS INT) AS dim,
       CAST(CAST('0x' || substr(md5(text || CAST(d AS VARCHAR)), 1, 8)
                 AS BIGINT) % 1000 AS DOUBLE) / 1000.0 AS feat
FROM documents, range({_FEAT_DIM}) t(d)
"""


CHUNK_LEN = 24


def mm_audio_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous fixed-size chunking of a binary payload — the audio
    windowing stage of a multimodal pipeline (frame_sample is sparse
    sampling; this covers every byte). Same ``mapInPandas`` plumbing a
    real resample/VAD kernel would use; chunks are md5-fingerprinted
    and the DuckDB oracle reproduces them with substr arithmetic. The
    last chunk may be short; its true length is part of the output."""
    p = payloads(spark, sf_dir).select("doc_id", "payload")

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, int, str]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for i in range((len(data) + CHUNK_LEN - 1) // CHUNK_LEN):
                    w = data[i * CHUNK_LEN : (i + 1) * CHUNK_LEN]
                    rows.append(
                        (int(doc_id), i, len(w), hashlib.md5(w).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_no", "n_bytes", "chunk_md5"]
            )

    return p.mapInPandas(
        chunk, schema="doc_id long, chunk_no int, n_bytes int, chunk_md5 string"
    )


MM_AUDIO_CHUNK_SQL = f"""
WITH c AS (
  SELECT doc_id, text,
         CAST((length(text) + {CHUNK_LEN - 1}) // {CHUNK_LEN} AS INT) AS nch
  FROM documents
),
e AS (SELECT doc_id, text, unnest(range(nch)) AS i FROM c)
SELECT doc_id, CAST(i AS INT) AS chunk_no,
       CAST(length(substr(text, 1 + i * {CHUNK_LEN}, {CHUNK_LEN})) AS INT)
         AS n_bytes,
       md5(substr(text, 1 + i * {CHUNK_LEN}, {CHUNK_LEN})) AS chunk_md5
FROM e
"""
