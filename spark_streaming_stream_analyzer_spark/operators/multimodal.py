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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_documents_keyed, load_table_cpu

FRAME_LEN = 16
N_FRAMES = 4
FRAME_STRIDE = 32


def payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + metadata struct, synthesized from
    documents.text (the container ships no media files; at production
    the blob comes from the lake as-is). doc_id is the blob's KEY —
    a NULL-id row is unaddressable (and ANSI-killed the mapInPandas
    decode tier via ``int(None)`` — round-12 DOCKEY probe), so the
    whole tier reads through the keyed loader; every mm oracle
    carries the matching ``doc_id IS NOT NULL`` shadow."""
    docs = load_documents_keyed(spark, sf_dir)
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
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
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
                if payload is None:
                    continue  # oracle: substr(NULL) drops the row
                data = bytes(payload)
                for i in range(N_FRAMES):
                    start = i * FRAME_STRIDE
                    window = data[start : start + FRAME_LEN]
                    if not window:
                        break
                    # engine-portable digest input: the UPPERCASE hex
                    # spelling of the window bytes — DuckDB v1.0 cannot
                    # hash BLOBs, and a byte window of a UTF-8 payload
                    # may not BE a valid string (round-8 unicode sweep:
                    # char-indexed substr diverged from byte windows on
                    # multibyte text). Byte semantics stay exact; only
                    # the digest's input encoding is hex.
                    rows.append(
                        (
                            int(doc_id),
                            i,
                            hashlib.md5(window.hex().upper().encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_md5"])

    return p.mapInPandas(sample_frames, schema=_FRAME_SCHEMA)


MM_FRAME_SAMPLE_SQL = f"""
WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents)
SELECT doc_id, CAST(i AS INT) AS frame_no,
       md5(substr(h, 1 + i * {2 * FRAME_STRIDE}, {2 * FRAME_LEN})) AS frame_md5
FROM hx, range({N_FRAMES}) t(i)
WHERE length(substr(h, 1 + i * {2 * FRAME_STRIDE}, {2 * FRAME_LEN})) > 0
"""


SCENE_CUT_THRESHOLD = 120  #: |luma delta| above this = scene boundary


def mm_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the sampled frame sequence: each
    frame's "luma" is the exact byte-sum of its window; a cut is a
    jump of more than SCENE_CUT_THRESHOLD between consecutive frames.
    The video-curation primitive (shot segmentation before per-shot
    sampling) with the decode stubbed to the deterministic byte
    windows — swap luma for a real frame statistic on a cluster with
    codecs and nothing else changes.

    Entirely JVM expressions: sequence→transform(ascii)→aggregate for
    the luma, one lag window per doc, a per-doc rollup. Integer sums,
    engine-portable.
    """
    docs = load_documents_keyed(spark, sf_dir)
    frames = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {N_FRAMES - 1}), "
                f"i -> substr(text, 1 + i * {FRAME_STRIDE}, {FRAME_LEN}))"
            )
        ).alias("frame_no", "w"),
    ).filter(F.length("w") > 0)
    luma = F.expr(
        "aggregate(transform(sequence(1, length(w)), "
        "i -> CAST(ascii(substr(w, i, 1)) AS BIGINT)), 0L, (a, x) -> a + x)"
    )
    lagw = Window.partitionBy("doc_id").orderBy("frame_no")
    deltas = (
        frames.select("doc_id", "frame_no", luma.alias("luma"))
        .withColumn("prev", F.lag("luma").over(lagw))
        .withColumn(
            "is_cut",
            F.when(
                F.col("prev").isNotNull()
                & (F.abs(F.col("luma") - F.col("prev")) > SCENE_CUT_THRESHOLD),
                1,
            ).otherwise(0),
        )
    )
    return deltas.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum("is_cut").alias("n_cuts"),
        F.min(F.when(F.col("is_cut") == 1, F.col("frame_no"))).alias(
            "first_cut_frame"
        ),
    )


MM_SCENE_CUT_SQL = f"""
WITH frames AS (
  SELECT doc_id, CAST(i AS INT) AS frame_no,
         substr(text, 1 + CAST(i AS INT) * {FRAME_STRIDE}, {FRAME_LEN}) AS w
  FROM documents, range({N_FRAMES}) t(i)
  WHERE length(substr(text, 1 + CAST(i AS INT) * {FRAME_STRIDE}, {FRAME_LEN})) > 0
),
luma AS (
  SELECT doc_id, frame_no,
         CAST(list_sum(list_transform(range(1, length(w) + 1),
                                      i -> ord(substr(w, CAST(i AS INT), 1))))
              AS BIGINT) AS luma
  FROM frames
),
deltas AS (
  SELECT doc_id, frame_no, luma,
         lag(luma) OVER (PARTITION BY doc_id ORDER BY frame_no) AS prev
  FROM luma
),
cuts AS (
  SELECT doc_id, frame_no,
         CASE WHEN prev IS NOT NULL
                   AND abs(luma - prev) > {SCENE_CUT_THRESHOLD}
              THEN 1 ELSE 0 END AS is_cut
  FROM deltas
)
SELECT doc_id, COUNT(*) AS n_frames,
       CAST(SUM(is_cut) AS BIGINT) AS n_cuts,
       MIN(CASE WHEN is_cut = 1 THEN frame_no END) AS first_cut_frame
FROM cuts GROUP BY doc_id
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


def has_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_decode_gray(payload: bytes):
    """Decode a non-interlaced 8-bit PNG (gray / gray+alpha / RGB /
    RGBA) to a (height, width) uint8 grayscale numpy array using only
    stdlib ``zlib``/``struct`` + numpy — no PIL. This makes the image
    kernel REAL on codec-less containers (VERDICT r5 item 7), the same
    move that made ``decode_audio`` real via stdlib ``wave``.

    Grayscale conversion uses the ITU-R 601-2 luma transform (same
    coefficients as PIL's ``convert("L")``). Unfiltering implements
    all five PNG filter types; Up/None vectorize per-row, Sub/Avg/
    Paeth walk the scanline (sequential by definition).
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    saw_iend = False
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            # A truncated payload would otherwise surface as a
            # struct.error (short IHDR) or an opaque zlib error far
            # from the cause (ADVICE r6).
            raise ValueError("truncated PNG chunk")
        if ctype in (b"IHDR", b"IDAT"):
            crc = payload[pos + 8 + length : pos + 12 + length]
            if len(crc) != 4 or struct.unpack(">I", crc)[0] != (
                zlib.crc32(ctype + data) & 0xFFFFFFFF
            ):
                raise ValueError(f"PNG chunk CRC mismatch ({ctype.decode()})")
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in (0, 2, 4, 6):
                raise NotImplementedError(
                    f"png_decode_gray: unsupported PNG (depth={depth}, "
                    f"color={color}, interlace={interlace}); use the PIL path"
                )
            meta = (w, h, {0: 1, 2: 3, 4: 2, 6: 4}[color])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            saw_iend = True
            break
    if not saw_iend:
        # a payload cut mid-chunk-header (< 8 bytes left) exits the
        # loop without tripping the in-chunk length guard; without
        # this check it would surface as the same opaque zlib error
        # the guard exists to eliminate
        raise ValueError("truncated PNG stream (no IEND)")
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, nch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    img = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:
            pass
        elif f == 2:  # Up
            line += prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            for x in range(stride):
                a = int(line[x - nch]) if x >= nch else 0
                b = int(prev[x])
                if f == 1:
                    line[x] = (int(line[x]) + a) & 0xFF
                elif f == 3:
                    line[x] = (int(line[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - nch]) if x >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        img[y] = line
        prev = line
    px = img.reshape(h, w, nch)
    if nch >= 3:  # RGB(A) → ITU-R 601-2 luma, alpha ignored
        gray = (
            px[:, :, 0].astype("uint32") * 299
            + px[:, :, 1].astype("uint32") * 587
            + px[:, :, 2].astype("uint32") * 114
        ) // 1000
        return gray.astype(np.uint8)
    return px[:, :, 0]  # gray / gray+alpha: first channel is luma


def _avg_pool(gray, k: int = 4):
    """Box-average a (h, w) array down to (k, k) with PIL-free integer
    block boundaries (equivalent to an area/box resize)."""
    import numpy as np

    h, w = gray.shape
    ys = [int(round(i * h / k)) for i in range(k + 1)]
    xs = [int(round(j * w / k)) for j in range(k + 1)]
    out = np.empty((k, k), dtype="float32")
    g = gray.astype("float64")
    for i in range(k):
        for j in range(k):
            # Clamp block bounds into range so images smaller than k in
            # either dimension replicate edge rows/cols instead of
            # slicing an empty block (whose .mean() is NaN): with h=1
            # the naive ys=[0,0,0,1,1] makes block i=3 slice g[1:2] of
            # a 1-row array (ADVICE r6).
            y0 = min(ys[i], h - 1)
            y1 = min(max(ys[i + 1], y0 + 1), h)
            x0 = min(xs[j], w - 1)
            x1 = min(max(xs[j + 1], x0 + 1), w)
            out[i, j] = g[y0:y1, x0:x1].mean()
    return out / 255.0


def decode_image(df: DataFrame) -> DataFrame:
    """Image decode + feature extraction over (doc_id, payload) rows:
    grayscale convert, dimensions, and a 4×4 pooled pixel embedding
    (the torchvision-free stand-in for a vision encoder).

    Two real kernels behind one ``mapInPandas`` plumbing:

    - PIL path (production clusters): any format PIL reads; bicubic
      4×4 resize for the embedding.
    - Pure-stdlib path (this container, PIL absent): 8-bit PNG via
      :func:`png_decode_gray` + box-average pooling. Non-PNG payloads
      on a PIL-less host raise NotImplementedError with the reason —
      the one remaining honest gate, now scoped to exotic codecs
      rather than the whole op.

    The two paths agree on doc_id/width/height exactly; embeddings
    differ only by resampling filter (bicubic vs box), which is fine
    for a feature-extraction stand-in and is documented here rather
    than papered over.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        try:
            from PIL import Image

            pil = True
        except ImportError:
            pil = False
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # missing blob: nothing to decode
                payload = bytes(payload)
                if pil:
                    img = Image.open(io.BytesIO(payload)).convert("L")
                    w, h = img.size
                    import numpy as np

                    pooled = (
                        np.asarray(img.resize((4, 4)), dtype="float32") / 255.0
                    )
                elif payload[:8] == _PNG_SIG:
                    gray = png_decode_gray(payload)
                    h, w = gray.shape
                    pooled = _avg_pool(gray)
                else:
                    raise NotImplementedError(
                        "non-PNG image decode requires PIL, not present in "
                        "this container (PNG decodes via the stdlib path)"
                    )
                out.append((int(doc_id), int(w), int(h), pooled.flatten().tolist()))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "embedding"]
            )

    return df.mapInPandas(_decode, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("mfcc", T.ArrayType(T.FloatType())),
    ]
)


def _mfcc_mean(signal, sr, n_mfcc=13, frame_len=400, hop=160, n_mels=26):
    """Mean-over-frames MFCC vector in pure numpy (no librosa/scipy):
    pre-emphasis → Hamming frames → power spectrum → mel filterbank →
    log → orthonormal DCT-II. Deterministic for fixed input."""
    import numpy as np

    sig = np.asarray(signal, dtype="float64")
    if len(sig) == 0:
        return [0.0] * n_mfcc
    emph = np.append(sig[0], sig[1:] - 0.97 * sig[:-1])
    if len(emph) < frame_len:
        emph = np.pad(emph, (0, frame_len - len(emph)))
    n_frames = 1 + (len(emph) - frame_len) // hop
    frames = np.stack(
        [emph[i * hop : i * hop + frame_len] for i in range(n_frames)]
    )
    frames = frames * np.hamming(frame_len)
    nfft = 512
    pow_spec = np.abs(np.fft.rfft(frames, nfft)) ** 2 / nfft

    def hz2mel(h):
        return 2595.0 * np.log10(1.0 + h / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    hz_pts = mel2hz(np.linspace(hz2mel(0.0), hz2mel(sr / 2.0), n_mels + 2))
    bins = np.floor((nfft + 1) * hz_pts / sr).astype(int)
    fb = np.zeros((n_mels, nfft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, c):
            fb[m - 1, k] = (k - lo) / max(c - lo, 1)
        for k in range(c, hi):
            fb[m - 1, k] = (hi - k) / max(hi - c, 1)
    logmel = np.log(pow_spec @ fb.T + 1e-10)
    # orthonormal DCT-II matrix, first n_mfcc rows
    n = np.arange(n_mels)
    dct = np.cos(np.pi * np.outer(np.arange(n_mfcc), n + 0.5) / n_mels)
    dct *= np.sqrt(2.0 / n_mels)
    dct[0] /= np.sqrt(2.0)
    return (logmel @ dct.T).mean(axis=0).astype("float32").tolist()


def decode_audio(df: DataFrame) -> DataFrame:
    """Audio decode + MFCC features over (doc_id, payload) rows, where
    payload is a PCM WAV blob. Runs EVERYWHERE: the WAV container is
    parsed with the stdlib ``wave`` module and the 13-dim MFCC is
    computed in pure numpy (:func:`_mfcc_mean`) — no soundfile or
    librosa needed, so unlike the image path this op is never a stub.
    ``mapInPandas`` keeps per-batch Python overhead O(batch); swap the
    kernel body for librosa on a codec cluster and the plumbing is
    unchanged."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # missing blob: nothing to decode
                with wave.open(io.BytesIO(payload)) as w:
                    sr = w.getframerate()
                    nch = w.getnchannels()
                    width = w.getsampwidth()
                    raw = w.readframes(w.getnframes())
                dtype = {1: "int8", 2: "int16", 4: "int32"}[width]
                sig = np.frombuffer(raw, dtype=dtype).astype("float64")
                if nch > 1:
                    sig = sig.reshape(-1, nch).mean(axis=1)
                sig /= float(2 ** (8 * width - 1))
                out.append((int(doc_id), int(sr), _mfcc_mean(sig, sr)))
            yield pd.DataFrame(out, columns=["doc_id", "sample_rate", "mfcc"])

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
                if payload is None:
                    continue  # oracle: length(NULL) > 0 is NULL -> drop
                data = bytes(payload)
                n = len(data)
                if n == 0:
                    continue
                sampled = bytes(
                    data[(i * n) // RESIZE_TO] for i in range(RESIZE_TO)
                )
                # hex-spelling digest input (see mm_frame_sample)
                rows.append(
                    (
                        int(doc_id),
                        n,
                        hashlib.md5(sampled.hex().upper().encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "orig_bytes", "resized_md5"]
            )

    return p.mapInPandas(
        resize,
        schema="doc_id long, orig_bytes int, resized_md5 string",
    )


MM_RESIZE_SQL = f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents WHERE octet_length(encode(text)) > 0
)
SELECT doc_id,
       CAST(n AS INT) AS orig_bytes,
       md5(list_aggregate(list_transform(range({RESIZE_TO}),
             i -> substr(h, 1 + 2 * CAST((i * n) // {RESIZE_TO} AS INT), 2)),
           'string_agg', '')) AS resized_md5
FROM hx
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
                if payload is None:
                    continue  # oracle drops NULL-text docs (WHERE)
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
WHERE text IS NOT NULL
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
                if payload is None:
                    continue  # oracle: range(NULL nch) unnests nothing
                data = bytes(payload)
                for i in range((len(data) + CHUNK_LEN - 1) // CHUNK_LEN):
                    w = data[i * CHUNK_LEN : (i + 1) * CHUNK_LEN]
                    # hex-spelling digest input (see mm_frame_sample)
                    rows.append(
                        (
                            int(doc_id),
                            i,
                            len(w),
                            hashlib.md5(w.hex().upper().encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_no", "n_bytes", "chunk_md5"]
            )

    return p.mapInPandas(
        chunk, schema="doc_id long, chunk_no int, n_bytes int, chunk_md5 string"
    )


MM_AUDIO_CHUNK_SQL = f"""
WITH c AS (
  SELECT doc_id, hex(encode(text)) AS h,
         CAST((octet_length(encode(text)) + {CHUNK_LEN - 1}) // {CHUNK_LEN}
              AS INT) AS nch
  FROM documents
),
e AS (SELECT doc_id, h, unnest(range(nch)) AS i FROM c)
SELECT doc_id, CAST(i AS INT) AS chunk_no,
       CAST(length(substr(h, 1 + i * {2 * CHUNK_LEN}, {2 * CHUNK_LEN})) // 2
            AS INT) AS n_bytes,
       md5(substr(h, 1 + i * {2 * CHUNK_LEN}, {2 * CHUNK_LEN})) AS chunk_md5
FROM e
"""


PHASH_PX = 64          # downsampled "pixels" per payload
PHASH_BANDS = 4        # 4 bands × 16 bits
PHASH_BAND_BITS = PHASH_PX // PHASH_BANDS
PHASH_HAM_T = 8        # max hamming distance for a near-dup pair


def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over binary payloads —
    the image-dedup stage of a multimodal pipeline, with the codec
    swapped for the byte-domain average-hash: nearest-neighbor
    downsample to PHASH_PX "pixels" (same sampling as ``mm_resize``),
    bit i = pixel i ≥ mean. The 64-bit hash is carried as 4×16-bit
    band values; candidate pairs share at least one band (pigeonhole —
    complete for hamming ≤ 3, high-recall up to PHASH_HAM_T), then are
    verified with an exact popcount.

    Split of labor mirrors the production shape: the only Python is
    the per-blob kernel (Arrow ``mapInPandas``, swap in a real decoder
    untouched); banding, the self-join, and the xor/popcount verify
    are all JVM DataFrame ops — so at 100 TB the pair generation never
    touches Python and never goes all-pairs."""
    p = payloads(spark, sf_dir).select("doc_id", "payload")

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, int, int, int]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # oracle: length(NULL) > 0 is NULL -> drop
                data = bytes(payload)
                n = len(data)
                if n == 0:
                    continue
                px = [data[(i * n) // PHASH_PX] for i in range(PHASH_PX)]
                mean = sum(px) / float(PHASH_PX)
                bits = [1 if v >= mean else 0 for v in px]
                bands = [
                    sum(
                        bits[PHASH_BAND_BITS * b + j] << j
                        for j in range(PHASH_BAND_BITS)
                    )
                    for b in range(PHASH_BANDS)
                ]
                rows.append((int(doc_id), *bands))
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
            )

    sigs = p.mapInPandas(
        phash, schema="doc_id long, b0 int, b1 int, b2 int, b3 int"
    ).localCheckpoint()
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("bv"))
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "c.band", "c.bv")
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    ham = sum(
        F.bit_count(F.col(f"a.b{i}").bitwiseXOR(F.col(f"b.b{i}")))
        for i in range(PHASH_BANDS)
    )
    return (
        cand.join(a, cand.doc_a == F.col("a.doc_id"))
        .join(b, cand.doc_b == F.col("b.doc_id"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= PHASH_HAM_T)
    )


MM_PHASH_SQL = f"""
WITH hx AS (
  -- byte value at sampled position, decoded from the hex spelling:
  -- DuckDB v1.0 has no BLOB indexing, and char-indexed ord(substr())
  -- reads CODEPOINTS where the kernel samples BYTES (round-8 unicode
  -- sweep: the pair set emptied on multibyte text)
  SELECT doc_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents WHERE octet_length(encode(text)) > 0
),
px AS (
  SELECT doc_id, i,
         (strpos('0123456789ABCDEF',
                 substr(h, 1 + 2 * CAST((i * n) // {PHASH_PX} AS INT), 1)) - 1)
           * 16
         + strpos('0123456789ABCDEF',
                  substr(h, 2 + 2 * CAST((i * n) // {PHASH_PX} AS INT), 1)) - 1
           AS v
  FROM hx, range({PHASH_PX}) t(i)
),
mean AS (
  SELECT doc_id, SUM(v) / {float(PHASH_PX)} AS mu FROM px GROUP BY 1
),
bits AS (
  SELECT px.doc_id, px.i,
         CASE WHEN px.v >= mean.mu THEN 1 ELSE 0 END AS bit
  FROM px JOIN mean ON px.doc_id = mean.doc_id
),
sigs AS (
  SELECT doc_id,
         SUM(CASE WHEN i // {PHASH_BAND_BITS} = 0
             THEN bit << (i % {PHASH_BAND_BITS}) ELSE 0 END) AS b0,
         SUM(CASE WHEN i // {PHASH_BAND_BITS} = 1
             THEN bit << (i % {PHASH_BAND_BITS}) ELSE 0 END) AS b1,
         SUM(CASE WHEN i // {PHASH_BAND_BITS} = 2
             THEN bit << (i % {PHASH_BAND_BITS}) ELSE 0 END) AS b2,
         SUM(CASE WHEN i // {PHASH_BAND_BITS} = 3
             THEN bit << (i % {PHASH_BAND_BITS}) ELSE 0 END) AS b3
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.b AS band,
         CASE b.b WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS bv
  FROM sigs CROSS JOIN (VALUES (0), (1), (2), (3)) b(b)
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT)
         AS hamming
FROM cand c JOIN sigs a ON c.doc_a = a.doc_id
            JOIN sigs b ON c.doc_b = b.doc_id
WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= {PHASH_HAM_T}
"""


# ------------------------------------------------ shard manifest --

SHARD_BYTES = 4096


def mm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard packing manifest for the binary tier:
    per origin, blobs in doc_id order are packed contiguously into
    ~SHARD_BYTES shards (a blob lands in the shard where its first
    byte falls — the byte-budget twin of ``pack_token_budget``); per
    shard the blob count, byte sum, and doc range a loader needs.

    One window (per-origin running byte offset) + one hash-agg, the
    sequence-packing plan shape; the payload itself never moves —
    the manifest is computed from lengths alone, which is what lets
    a 100 TB shard build run as metadata-only until the copy stage.
    """
    p = payloads(spark, sf_dir)
    sized = p.select(
        "doc_id",
        F.col("meta.origin").alias("origin"),
        F.length("payload").cast("long").alias("n_bytes"),
    )
    w = (
        Window.partitionBy("origin")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start_off = F.sum("n_bytes").over(w) - F.col("n_bytes")
    binned = sized.withColumn("_off", start_off).withColumn(
        "shard", F.expr(f"_off DIV {SHARD_BYTES}")
    )
    return binned.groupBy("origin", "shard").agg(
        F.count("*").alias("n_blobs"),
        F.sum("n_bytes").alias("sum_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


MM_SHARD_SQL = f"""
WITH sized AS (
  SELECT doc_id, source AS origin,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
),
binned AS (
  SELECT origin, doc_id, n_bytes,
         (SUM(n_bytes) OVER (PARTITION BY origin ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_bytes)
           // {SHARD_BYTES} AS shard
  FROM sized
)
SELECT origin, CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_blobs,
       CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM binned GROUP BY 1, 2
"""


# ------------------------------------------------ byte histogram --


def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level blob profile per payload: total bytes, distinct
    byte values, and the most-common byte's share in ppm — the
    codec-free corruption/encryption screen (an encrypted or random
    blob runs near 256 distinct values with a flat top share; a
    text or bitmap payload is heavily skewed).

    MAP-ONLY plan: the per-doc profile needs no cross-row state, so
    it is computed inside one Arrow-batched ``mapInPandas`` pass
    (``np.bincount`` per payload) — zero shuffle, zero intermediate
    rows. The previous JVM form (hex → explode one row per byte →
    two-level groupBy) was linear too, but paid one row + one 2-char
    string allocation per payload BYTE plus a shuffle: 9.6x wall at
    10x data vs ~1x for this shape. At 100 TB a byte profile must be
    a pure scan; this is one. The DuckDB oracle keeps the
    hex/unnest spelling — identical output, different engine idiom.
    """
    p = payloads(spark, sf_dir).select("doc_id", "payload")

    def _profile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, nb, db, tp = [], [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                if buf is None:
                    continue  # mirror the oracle: hex(NULL) drops the row
                arr = np.frombuffer(buf, dtype=np.uint8)
                if arr.size == 0:
                    continue  # mirror the oracle: zero-byte blobs drop
                counts = np.bincount(arr, minlength=256)
                ids.append(doc_id)
                nb.append(arr.size)
                db.append(int((counts > 0).sum()))
                tp.append(int(counts.max()) * 1_000_000 // arr.size)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "distinct_bytes": pd.Series(db, dtype="int64"),
                    "top_byte_ppm": pd.Series(tp, dtype="int64"),
                }
            )

    return p.mapInPandas(
        _profile,
        "doc_id long, n_bytes long, distinct_bytes long, top_byte_ppm long",
    )


MM_BYTE_HIST_SQL = """
WITH hexed AS (
  SELECT doc_id, hex(encode(text)) AS hx FROM documents
),
bytes_ AS (
  SELECT doc_id, substr(hx, i * 2 - 1, 2) AS b
  FROM hexed, LATERAL (
    SELECT unnest(range(1, CAST(length(hx) / 2 AS BIGINT) + 1)) AS i
  )
),
per_byte AS (
  SELECT doc_id, b, COUNT(*) AS n FROM bytes_ GROUP BY 1, 2
)
SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bytes,
       COUNT(*) AS distinct_bytes,
       CAST((MAX(n) * 1000000) // SUM(n) AS BIGINT) AS top_byte_ppm
FROM per_byte GROUP BY 1
"""
