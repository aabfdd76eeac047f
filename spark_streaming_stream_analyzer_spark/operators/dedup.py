"""Deduplication operators for large-scale training-data pipelines.

Five tiers, from cheap to semantic (build plan M5; no reference
counterpart — the reference has no dedup of any kind, SURVEY.md §2.2):

 1. exact       — hash-groupBy on the dedup key (one shuffle of
                  distinct keys only, map-side combine).
 2. ngram       — exact n-gram-shingle Jaccard over candidate pairs
                  from a shingle-equality self-join. Quadratic in
                  per-shingle document frequency → small-scale oracle
                  and verification tier.
 3. minhash+LSH — the 100 TB path: constant-size signature per doc
                  (SIG_N portable hashes over shingles), banded into
                  LSH buckets; only bucket-colliding pairs are
                  verified. Cost is linear in corpus + output pairs.
 4. simhash     — 32-bit weighted fingerprint per doc; near-dups have
                  small Hamming distance. Emitted as a per-doc
                  fingerprint (pair search = band the fingerprint).
 5. embedding   — semantic near-dup by cosine within coarse cells
                  (IVF-style): catches dups that share no tokens.

All hash math uses the engine-portable md5-based ``hash64`` so the
DuckDB oracle reproduces results exactly (``functions/hashing.py``).
Jaccard/similarity divisions are integer-operand double divides —
bit-identical across engines.

Scale notes (1000-executor / 100 TB):
 - shingling + signature build is embarrassingly parallel, no shuffle;
 - the only shuffles are groupBy(doc,perm) for signature mins and the
   band-bucket self-join, whose fan-out is controlled by band width
   (wider rows-per-band → fewer false candidates);
 - hot buckets (boilerplate docs) are the skew risk: AQE skew-join
   handles moderate skew, and the implemented caps (``SHINGLE_DF_CAP``
   for the exact tier, ``LSH_BUCKET_CAP`` for the banded tier) bound
   the worst case; both are mirrored in the oracles and inert at
   fixture scale (tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.grams import indexed_kgram_sql, word_kgrams
from ..functions.hashing import hash64, hash64_sql
from ..sources.tables import (
    bcast_gated,
    load_documents_keyed,
    load_table,
    load_table_cpu,
)
from .similarity import _shadow_nonnull_embeddings, load_embeddings

SIG_N = 32          # minhash permutations
BAND_ROWS = 4       # rows per LSH band → 8 bands
SHINGLE_K = 3       # words per shingle

#: Skew guards. Both caps are mirrored verbatim in the DuckDB oracles,
#: so they are part of the operator's *semantics*, not a lossy
#: optimization: a shingle shared by more than SHINGLE_DF_CAP documents
#: is boilerplate (contributes ~df² candidate pairs in the exact tier),
#: and an LSH band-bucket with more than LSH_BUCKET_CAP members would
#: square into a mega-join at 100 TB. Fixtures sit far below both caps
#: (asserted in tests/test_dedup.py), so small-scale results are
#: identical with or without the guard.
#:
#: Degenerate-regime boundary (stated precisely after the round-7
#: emb_knn_srp_graph lesson, where whole-bucket quarantine over a
#: 16-value band space silently emptied the result): minhash buckets
#: live in a ~2^64 key space and membership requires BAND_ROWS
#: matching minhash values, so a bucket over the cap is a REAL
#: near-dup cluster of >LSH_BUCKET_CAP members, not an artifact of a
#: saturated hash space — quarantine loses only those clusters'
#: pairs, never the corpus-wide result. Exact-copy mega-clusters
#: (the common case: boilerplate replicated verbatim) are still
#: caught by the exact content-hash tier; what quarantine forfeits
#: is pair enumeration inside near-dup-but-not-identical clusters
#: larger than the cap. If full mega-cluster recall ever matters
#: more than the skew bound, the post-freeze swap is keep-a-
#: deterministic-top-CAP-sample-per-bucket (the
#: ``emb_knn_srp_graph``/``cap_neighbors`` pattern) rather than
#: drop-the-bucket — same worst-case cost, graceful degradation.
SHINGLE_DF_CAP = 256
LSH_BUCKET_CAP = 64


# ---------------------------------------------------------------- exact --

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of events on (user_id, event_type): keep the lowest
    event_id per group. Hash-aggregate, map-side combined."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("keep_event_id"),
        F.count("*").alias("n_copies"),
    )


DEDUP_EXACT_SQL = """
SELECT user_id, event_type, MIN(event_id) AS keep_event_id, COUNT(*) AS n_copies
FROM events GROUP BY user_id, event_type
"""


# ------------------------------------------------------------- shingles --

def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — distinct word-K-grams per document."""
    docs = load_table_cpu(spark, sf_dir, "documents")
    # drop empty tokens (leading/trailing/double spaces) so the token
    # stream is identical to the minhash tier's and to the oracle CTE
    words = F.filter(F.split("text", " "), lambda w: w != "")
    # zip_with-chained shifted slices, NOT transform(sequence, i ->
    # element_at(words, ...)): element_at on the inline `words` inside
    # a lambda re-runs the split per element — O(L²) in doc length
    # (round-11 GIANTDOC find; _signatures below always used the
    # linear form and documents the same trap). functions/grams.py.
    grams = word_kgrams(words, SHINGLE_K)
    return docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


_SHINGLES_SQL = """
SELECT DISTINCT doc_id, shingle FROM (
  SELECT doc_id,
         unnest(list_transform(range(1, len(words) - 1),
                i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
           AS shingle
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), w -> w <> '') AS words
        FROM documents) d
) t
"""


def _capped_shingle_pairs(spark: SparkSession, sf_dir: str):
    """Shared candidate machinery for the exact set-overlap tiers
    (``dedup_ngram_jaccard`` / ``dedup_containment``): drop shingles
    with document frequency > SHINGLE_DF_CAP via a broadcast anti-join
    (the quadratic-blowup guard — the self-join emits ~df² pairs per
    shingle), cache the capped shingle table once (it feeds the
    per-doc size agg and BOTH self-join sides), and count common
    shingles per (doc_a < doc_b) pair. Returns ``(common, sa, sb)``:
    the pair counts plus the a/b-keyed per-doc set sizes — the one
    definition of the SHINGLE_DF_CAP semantics both operators (and
    both oracles) must agree on."""
    raw = _shingles(spark, sf_dir)
    hot = (
        raw.groupBy("shingle")
        .count()
        .filter(F.col("count") > SHINGLE_DF_CAP)
        .select("shingle")
    )
    # corpus-derived hot list: forced broadcast only under the
    # source-byte gate (tables.BCAST_SRC_CAP_BYTES).
    # Round-14 A/B (VERDICT r13 item 7): the "8 document scans" the
    # rescan census flags here are the TEXTUAL cache-build duplication
    # inside each InMemoryTableScan — at runtime the cache builds once
    # (2 real scans: raw + the hot census). The two-level
    # materialization variant (localCheckpoint sh AND sizes) measured
    # FLAT under a noisy window (ngram 2.68/2.93 vs 2.81/2.73 s,
    # containment 2.72/2.76 vs 2.55/2.25 s warmed, loadavg 11-14) —
    # kept the cache: same runtime shape, and it retains lineage
    # (recomputable on executor loss) where the checkpoint does not.
    sh = raw.join(bcast_gated(hot, sf_dir), "shingle", "left_anti").cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return common, sa, sb


# ------------------------------------------------------- exact jaccard --

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (J >= 0.4), doc_a < doc_b.

    Candidate generation is a self-join on shingle equality; J is
    computed from exact integer set sizes. This is the ground-truth
    tier the probabilistic tiers are validated against.
    """
    common, sa, sb = _capped_shingle_pairs(spark, sf_dir)
    return (
        common.join(bcast_gated(sa, sf_dir), "doc_a")
        .join(bcast_gated(sb, sf_dir), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.4)
    )


DEDUP_NGRAM_SQL = f"""
WITH sh_raw AS ({_SHINGLES_SQL}),
sh AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
    FROM sh_raw) c
  WHERE df <= {SHINGLE_DF_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE)
         / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE)
         / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.4
"""


# --------------------------------------------------------- minhash+LSH --

import hashlib as _hl

#: Carter–Wegman permutations over the 31-bit Mersenne field
#: P31 = 2^31 - 1: h_i(x) = (A[i]·H31(x) + B[i]) mod P31 with
#: H31 = (60-bit md5 hash) mod P31. Everything fits signed 64-bit
#: (A·H31 < 2^62), so both engines evaluate the family in plain BIGINT
#: arithmetic — exact, identical, and whole-stage-codegen fast (the
#: DECIMAL/HUGEINT wide-field variant benched ~7× slower on Spark).
#: 31-bit minhash space is ample: collision probability per shingle
#: set of ~10^2-10^4 is negligible for signature agreement.
P31 = 2_147_483_647
PERM_A = [
    int(_hl.md5(f"a{i}".encode()).hexdigest()[:15], 16) % (P31 - 1) + 1
    for i in range(SIG_N)
]
PERM_B = [
    int(_hl.md5(f"b{i}".encode()).hexdigest()[:15], 16) % P31 for i in range(SIG_N)
]


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-doc signature row: (doc_id, m0..m{SIG_N-1}).

    Per document row, hash each distinct shingle once (md5 → 60-bit H
    inside the Generate), then SIG_N permutation minima in one
    partial+final hash aggregate — only |docs|·SIG_N longs cross the
    shuffle. At 100 TB this stays embarrassingly parallel: signature
    cost is O(shingles·SIG_N) map work with nothing else crossing the
    wire until the (tiny) band join. All arithmetic is signed-64-exact
    ((A·H + B) mod P31 with A·H < 2^62) and mirrored verbatim by the
    DuckDB oracle — identical integers, identical signatures.
    """
    # Expression-sharing discipline: Catalyst's CollapseProject inlines
    # a projected column's *expression* into every downstream
    # reference, so "materialize h0s, then 32 array_min columns" would
    # re-run the md5s 32x per row (measured: ~7x slower). Instead the
    # whole signature is ONE fold over the hashed-shingle array — each
    # subexpression (split, shingling, md5) occurs exactly once in the
    # tree and therefore runs once per row.
    docs = load_table_cpu(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: w != "")
    # shingles via shifted-array zips: `words` is referenced per ROW
    # (slice), never per element — avoids re-splitting text per shingle
    g12 = F.zip_with(
        words,
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    g123 = F.zip_with(
        g12,
        F.slice(words, 3, F.greatest(F.size(words) - 2, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = F.array_distinct(
        F.slice(g123, 1, F.greatest(F.size(g123) - 2, F.lit(0)))
    )
    h0s = F.transform(grams, lambda g: F.pmod(hash64(g), F.lit(P31)))
    # explode the pre-hashed shingles: the Generate node is an
    # optimizer boundary, so the md5 runs exactly once per shingle and
    # the SIG_N permutation mins below are fused long-arithmetic inside
    # a codegen'd partial+final HashAggregate (map-side combine → only
    # |docs|·SIG_N longs cross the shuffle).
    exploded = docs.select("doc_id", F.explode(h0s).alias("h0"))
    wide = exploded.groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(F.lit(PERM_A[i]) * F.col("h0") + F.lit(PERM_B[i]), F.lit(P31))
            ).alias(f"m{i}")
            for i in range(SIG_N)
        ]
    )
    return wide


_A_LIST = "[" + ", ".join(str(x) for x in PERM_A) + "]"
_B_LIST = "[" + ", ".join(str(x) for x in PERM_B) + "]"

_SIG_SQL = f"""
SELECT doc_id, i,
       MIN(({_A_LIST}[i+1]
             * (CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % {P31})
             + {_B_LIST}[i+1]) % {P31}) AS minh
FROM ({_SHINGLES_SQL}) sh, range({SIG_N}) t(i)
GROUP BY doc_id, i
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs with estimated Jaccard >= 0.5.

    Pipeline: signatures → band keys (concat of BAND_ROWS mins in perm
    order) → self-join on (band, key) for candidates → verify by
    signature agreement fraction. Only candidates are verified — the
    all-pairs comparison never happens, which is what makes this the
    100 TB tier.
    """
    # One materialization point: the wide per-doc signature (|docs|
    # rows). Bands, long signatures, and the verification joins are all
    # narrow projections of it — nothing below recomputes the shingle
    # hashing, and the band self-join reads it on both sides.
    # localCheckpoint (eager) rather than cache()+count(): truncates
    # lineage, spills to disk instead of pinning the signature table in
    # executor memory, and needs no separate count action — the same
    # pattern dedup_cluster_keep already uses for its fixpoint rounds.
    # Round-14 eager-vs-lazy A/B: lazy (eager=False) won warmed
    # (medians 2.87 vs 5.02 s — eager's separate materialization job
    # caught 3/5 ambient bursts) but LOST cold fresh-session (4.48/
    # 5.72 vs 3.51/4.02 s). No variant wins both regimes; the
    # driver's bench is cold, so eager stays.
    wide = _signatures(spark, sf_dir).localCheckpoint()
    # Band key = xxhash64 of the band's min-hash columns (JVM-side,
    # codegen), not a concat_ws string: the key exists only to be
    # grouped and self-joined on, and an 8-byte long cuts the shuffled
    # key bytes ~5x vs the ~40-char decimal string (round-10, VERDICT
    # r9 item 5). The DuckDB oracle keeps the string form, so parity
    # doubles as a collision check; tests/test_dedup.py additionally
    # pins per-band distinct(string) == distinct(hash) — a cross-band
    # xxhash64 collision (~2^-64) is the only way the two forms could
    # ever emit different candidate sets, and a spurious candidate
    # still has to survive the exact est_jaccard >= 0.5 verify.
    band_arr = F.array(
        *[
            F.xxhash64(
                *[F.col(f"m{b * BAND_ROWS + r}") for r in range(BAND_ROWS)]
            )
            for b in range(SIG_N // BAND_ROWS)
        ]
    )
    bands_raw = wide.select(
        "doc_id", F.posexplode(band_arr)
    ).withColumnsRenamed({"pos": "band", "col": "band_key"})
    # Hot-bucket cap: a band-bucket with B members yields B·(B-1)/2
    # candidate pairs — boilerplate documents (empty docs, shared
    # headers) form mega-buckets that square the self-join at scale.
    # Quarantine buckets above LSH_BUCKET_CAP before joining. The hot
    # list (buckets with >CAP members) is tiny by construction, so the
    # removal is a map-side-combined count + broadcast anti-join — no
    # per-partition sort, and the band rows project straight off the
    # checkpointed signature table.
    hot_buckets = (
        bands_raw.groupBy("band", "band_key")
        .count()
        .filter(F.col("count") > LSH_BUCKET_CAP)
        .select("band", "band_key")
    )
    bands = bands_raw.join(
        bcast_gated(hot_buckets, sf_dir), ["band", "band_key"], "left_anti"
    )
    ba = bands.alias("ba")
    bb = bands.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.band_key") == F.col("bb.band_key"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify per pair straight off the wide signature rows: two joins
    # pull both signatures onto the candidate row, then agreement is a
    # single 32-term sum in codegen — no 64-rows-per-pair explode, no
    # re-aggregation shuffle (the long form was ~2x the wall time)
    siga = wide.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(SIG_N)],
    )
    sigb = wide.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(SIG_N)],
    )
    agree = sum(
        [
            F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
            for i in range(SIG_N)
        ],
        F.lit(0),
    )
    return (
        cand.join(siga, "doc_a")
        .join(sigb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (agree.cast("double") / F.lit(float(SIG_N))).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= 0.5)
    )


DEDUP_MINHASH_SQL = f"""
WITH sig AS ({_SIG_SQL}),
bands_raw AS (
  SELECT doc_id, CAST(i // {BAND_ROWS} AS INT) AS band,
         string_agg(CAST(minh AS VARCHAR), ',' ORDER BY i) AS band_key
  FROM sig GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, band, band_key FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band, band_key) AS bsz
    FROM bands_raw) c
  WHERE bsz <= {LSH_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT ba.doc_id AS doc_a, bb.doc_id AS doc_b
  FROM bands ba JOIN bands bb
    ON ba.band = bb.band AND ba.band_key = bb.band_key
   AND ba.doc_id < bb.doc_id
)
SELECT doc_a, doc_b,
       CAST(SUM(CASE WHEN sa.minh = sb.minh THEN 1 ELSE 0 END) AS DOUBLE)
         / {float(SIG_N)} AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = doc_a
JOIN sig sb ON sb.doc_id = doc_b AND sb.i = sa.i
GROUP BY doc_a, doc_b
HAVING CAST(SUM(CASE WHEN sa.minh = sb.minh THEN 1 ELSE 0 END) AS DOUBLE)
         / {float(SIG_N)} >= 0.5
"""


# -------------------------------------------------------------- simhash --

SIMHASH_BITS = 32


def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document from word-unigram hashes (with
    multiplicity as the weight). Near-dup docs differ in few bits;
    pair search at scale bands the fingerprint bytes (not done here —
    the fingerprint itself is the oracle-checked output).

    Shape: ONE explode of pre-hashed words (md5 runs inside the
    Generate — exactly once per word, see the CollapseProject note in
    ``_signatures``), then ONE partial+final hash aggregate computing
    all 32 per-bit ±1 sums as separate agg columns. Only |docs|·32
    longs cross the shuffle; the earlier two-shuffle words×32-row
    formulation was ~10× slower and its blowup scales with corpus
    size — this one's network cost scales with |docs| alone.
    """
    docs = load_table_cpu(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: w != "")
    hashed = docs.select(
        "doc_id", F.explode(F.transform(words, lambda w: hash64(w))).alias("h")
    )
    bitsums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fingerprint = sum(
        [
            F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(SIMHASH_BITS)
        ],
        F.lit(0),
    ).cast("long")
    return bitsums.select("doc_id", fingerprint.alias("simhash"))


SIMHASH_SQL = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
hashed AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) AS h
  FROM words WHERE word <> ''
),
contrib AS (
  SELECT doc_id, b,
         (CASE WHEN (h & CAST(power(2, b) AS BIGINT)) <> 0 THEN 1 ELSE 0 END) * 2 - 1 AS w
  FROM hashed, range({SIMHASH_BITS}) t(b)
),
bitvals AS (
  SELECT doc_id,
         CASE WHEN SUM(w) > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END AS bitval
  FROM contrib GROUP BY doc_id, b
)
SELECT doc_id, CAST(SUM(bitval) AS BIGINT) AS simhash FROM bitvals GROUP BY doc_id
"""


# ------------------------------------------------- embedding near-dup --

EMB_DEDUP_TOPN = 3


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-cosine) near-dup candidates: within each
    coarse cell (``label`` — the IVF-style partition a k-means pass
    assigns in production), the top-3 most-similar vector pairs by
    cosine, ranked with deterministic tiebreaks.

    This is the 5th dedup tier (exact → ngram → minhash → simhash →
    semantic): pairs that share no tokens but encode the same content.
    Scoring is confined to intra-cell pairs — the quadratic term is
    bounded by cell size, the cross-cell term is zero, and cells scale
    out by key. At 100 TB: the same plan with a real centroid
    assignment, plus a global cos >= τ filter; the fixture's random
    embeddings have no τ-dups, so the ranked form keeps the operator's
    output non-degenerate (and the recall property is pinned by a
    planted-duplicate pytest instead).

    Norms are computed once per row (linear), not per pair; the fold
    order matches the DuckDB oracle bit-for-bit (see similarity.py).
    """
    from .similarity import _fold_sum, _with_norm

    # cast the float vector to double ONCE per row, pre-join: the
    # scoring lambda below runs per PAIR (quadratic in cell size), so
    # anything liftable to the linear per-row stage must move there
    em = (
        _with_norm(load_embeddings(spark, sf_dir), "embedding", "nrm")
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("emb_d"),
            "nrm",
        )
    )
    a, b = em.alias("a"), em.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    dot = _fold_sum(F.zip_with("a.emb_d", "b.emb_d", lambda x, y: x * y))
    scored = pairs.select(
        F.col("a.label").alias("label"),
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("label").orderBy(
        F.col("cos_sim").desc(), F.col("vec_a"), F.col("vec_b")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= EMB_DEDUP_TOPN)
        .select("label", "vec_a", "vec_b", "rnk", "cos_sim")
    )


_EMB_COS_SQL = """
  list_reduce(list_prepend(0.0, list_transform(
      list_zip(a.embedding, b.embedding),
      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)
  / (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding,
       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, x) -> acc + x))
   * sqrt(list_reduce(list_prepend(0.0, list_transform(b.embedding,
       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, x) -> acc + x)))
"""

DEDUP_EMB_COSINE_SQL = _shadow_nonnull_embeddings(f"""
WITH scored AS (
  SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
         {_EMB_COS_SQL} AS cos_sim
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT label, vec_a, vec_b, rnk, cos_sim FROM (
  SELECT label, vec_a, vec_b, cos_sim,
         row_number() OVER (PARTITION BY label
                            ORDER BY cos_sim DESC, vec_a, vec_b) AS rnk
  FROM scored
) t WHERE rnk <= {EMB_DEDUP_TOPN}
""")


# ------------------------------------------------ simhash pair search --

SIMHASH_BANDS = 4        # 8 bits per band over the 32-bit fingerprint
SIMHASH_MAX_HAMMING = 3  # near-dup threshold


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS — the search stage over the fingerprints
    (:func:`simhash_fingerprint` is the signature stage): band the
    32-bit fingerprint into 4 bytes; by pigeonhole, any pair within
    Hamming distance 3 agrees on at least one whole byte, so candidates
    are byte-band collisions only, then verified with
    popcount(xor) <= 3. Same two-phase shape as MinHash-LSH: linear
    candidate generation, exact verification, no all-pairs pass.
    """
    fp = simhash_fingerprint(spark, sf_dir).cache()
    band_arr = F.array(
        *[
            F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(0xFF))
            for b in range(SIMHASH_BANDS)
        ]
    )
    bands = fp.select(
        "doc_id", F.posexplode(band_arr)
    ).withColumnsRenamed({"pos": "band", "col": "band_key"})
    ba, bb = bands.alias("ba"), bands.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.band_key") == F.col("bb.band_key"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    hamming = F.bit_count(
        F.col("ha").bitwiseXOR(F.col("hb")).bitwiseAND(F.lit(0xFFFFFFFF))
    )
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


DEDUP_SIMHASH_PAIRS_SQL = f"""
WITH fp AS ({SIMHASH_SQL}),
bands AS (
  SELECT doc_id, b AS band, (simhash >> (8 * b)) & 255 AS band_key
  FROM fp, range({SIMHASH_BANDS}) t(b)
),
cand AS (
  SELECT DISTINCT ba.doc_id AS doc_a, bb.doc_id AS doc_b
  FROM bands ba JOIN bands bb
    ON ba.band = bb.band AND ba.band_key = bb.band_key
   AND ba.doc_id < bb.doc_id
)
SELECT doc_a, doc_b,
       bit_count(xor(fa.simhash, fb.simhash) & 4294967295) AS hamming
FROM cand
JOIN fp fa ON fa.doc_id = doc_a
JOIN fp fb ON fb.doc_id = doc_b
WHERE bit_count(xor(fa.simhash, fb.simhash) & 4294967295) <= {SIMHASH_MAX_HAMMING}
"""


# ---------------------------------------------------- cluster keepers --

def dedup_cluster_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION step: near-dup pairs → connected components →
    one canonical keeper (min doc_id) per cluster.

    Iterative min-label propagation on the pair graph, run to fixpoint
    (each round: label := min(own, neighbors'); converges in
    O(cluster diameter) rounds — bounded and tiny for near-dup
    clusters). Each round is one join + aggregate; the frontier is the
    label table (|dup docs| rows, model-sized), checkpointed per round
    so the plan stays flat. DuckDB mirrors with a recursive CTE
    (transitive closure → MIN reachable) — same fixpoint, so the
    iterative DataFrame form is fully value-oracled, unlike most
    iterative algorithms.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).cache()
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("lab", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(20):  # >> any real cluster diameter; breaks at fixpoint
        neigh = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("lab").alias("nlab"))
        )
        new = (
            labels.select("doc_id", F.col("lab").alias("old_lab"))
            .join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                "old_lab",
                F.least(
                    F.col("old_lab"), F.coalesce("nlab", F.col("old_lab"))
                ).alias("lab"),
            )
            .localCheckpoint(eager=True)  # flat plan per round; nothing
            # ever leaves the cluster — the fixpoint test below is a
            # distributed count, not a driver collect
        )
        changed = new.filter(F.col("lab") != F.col("old_lab")).count()
        labels = new.select("doc_id", "lab")
        if changed == 0:
            break
    return labels.select("doc_id", F.col("lab").alias("keep_doc_id"))


DEDUP_CLUSTER_SQL = f"""
WITH RECURSIVE pairs AS ({DEDUP_MINHASH_SQL}),
edges AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(doc_id, lab) AS (
  SELECT DISTINCT doc_a, doc_a FROM edges
  UNION
  SELECT e.doc_a, r.lab FROM edges e JOIN reach r ON e.doc_b = r.doc_id
)
SELECT doc_id, MIN(lab) AS keep_doc_id FROM reach GROUP BY doc_id
"""


def pipeline_dedup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup end product: the corpus with non-canonical near-dups
    REMOVED — signatures → LSH candidates → verify → connected
    components → keep min-id per cluster → anti-join the drop list
    back onto documents. This is the query a training-data pipeline
    actually ships; everything upstream is its building blocks.

    Scale: the drop list is |dup docs − clusters| rows (tiny relative
    to the corpus) so the anti-join broadcasts; the corpus scan reads
    only (doc_id, n_chars).
    """
    clusters = dedup_cluster_keep(spark, sf_dir)
    drop = clusters.filter(F.col("doc_id") != F.col("keep_doc_id")).select(
        "doc_id"
    )
    docs = load_documents_keyed(spark, sf_dir, cpu=False)
    return docs.join(bcast_gated(drop, sf_dir), "doc_id", "left_anti").select(
        "doc_id", "n_chars"
    )


PIPELINE_DEDUP_SQL = f"""
WITH clusters AS ({DEDUP_CLUSTER_SQL})
SELECT doc_id, n_chars FROM documents
WHERE doc_id NOT IN
  (SELECT doc_id FROM clusters WHERE doc_id <> keep_doc_id)
"""


# ------------------------------------------------- estimate quality --

def dedup_minhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit of the MinHash tier: for every LSH-surfaced
    pair, the signature-agreement estimate next to the EXACT shingle
    Jaccard (uncapped sets — the same universe the signatures hash),
    plus the absolute error. The dedup counterpart of
    ``sim_ivf_recall``: it turns "the sketch is probably fine" into a
    driver-checked number. Exact Jaccard is computed only for the
    candidate pairs (never all pairs), so the audit costs |pairs| ·
    avg-shingles — negligible next to the LSH pass itself."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        "doc_a", "doc_b", "est_jaccard"
    )
    sh = _shingles(spark, sf_dir).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        pairs.select("doc_a", "doc_b")
        .join(sha, "doc_a")
        .join(shb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    exact = nc.cast("double") / (F.col("n_a") + F.col("n_b") - nc).cast("double")
    return (
        pairs.join(common, ["doc_a", "doc_b"], "left")
        .join(bcast_gated(sa, sf_dir), "doc_a")
        .join(bcast_gated(sb, sf_dir), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "est_jaccard",
            exact.alias("exact_jaccard"),
            F.abs(F.col("est_jaccard") - exact).alias("abs_err"),
        )
    )


DEDUP_MINHASH_QUALITY_SQL = f"""
WITH pairs AS ({DEDUP_MINHASH_SQL}),
sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.est_jaccard,
       CAST(COALESCE(n_common, 0) AS DOUBLE)
         / CAST(sa.n_sh + sb.n_sh - COALESCE(n_common, 0) AS DOUBLE)
         AS exact_jaccard,
       ABS(p.est_jaccard
           - CAST(COALESCE(n_common, 0) AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - COALESCE(n_common, 0) AS DOUBLE))
         AS abs_err
FROM pairs p
LEFT JOIN common c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
"""


# ---------------------------------------------------- containment --

CONTAIN_TAU = 0.6


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment |A∩B| / |A| — catches a document
    *embedded inside* another (quotes, boilerplate wrappers, partial
    copies) that symmetric Jaccard under-scores: a 50-shingle doc
    wholly contained in a 500-shingle doc has J ≈ 0.1 but containment
    1.0. Pairs where either direction ≥ CONTAIN_TAU are emitted with
    both directional scores.

    Same candidate machinery (and the same SHINGLE_DF_CAP skew guard)
    as ``dedup_ngram_jaccard`` — one extra broadcast-sized projection,
    no new shuffle."""
    common, sa, sb = _capped_shingle_pairs(spark, sf_dir)
    cont_a = F.col("n_common").cast("double") / F.col("n_a").cast("double")
    cont_b = F.col("n_common").cast("double") / F.col("n_b").cast("double")
    return (
        common.join(bcast_gated(sa, sf_dir), "doc_a")
        .join(bcast_gated(sb, sf_dir), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            cont_a.alias("cont_in_b"),
            cont_b.alias("cont_in_a"),
        )
        .filter(
            (F.col("cont_in_b") >= CONTAIN_TAU)
            | (F.col("cont_in_a") >= CONTAIN_TAU)
        )
    )


DEDUP_CONTAIN_SQL = f"""
WITH sh_raw AS ({_SHINGLES_SQL}),
sh AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
    FROM sh_raw) c
  WHERE df <= {SHINGLE_DF_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) AS cont_in_b,
       CAST(n_common AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) AS cont_in_a
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) >= {CONTAIN_TAU}
   OR CAST(n_common AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) >= {CONTAIN_TAU}
"""


# ------------------------------------- winnowing-fingerprint overlap --

FP_DOCFREQ_CAP = 20   # drop boilerplate fingerprints shared by > cap docs
FP_MIN_SHARED = 2     # pair survives with >= this many shared prints


def dedup_fingerprint_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by shared winnowing fingerprints — the
    MOSS/plagiarism-detector pairing built on ``doc_winnowing``'s
    selected hashes (textstats.py). Two docs pair when they share at
    least FP_MIN_SHARED fingerprints; the verdict carries the exact
    overlap count and a containment-style ppm score
    (shared·1e6 DIV (|A| + |B| − shared)).

    Scale: candidates come from a fingerprint equi-self-join — the
    inverted-index shape, |pairs| = Σ_f C(df_f, 2) — and BOILERPLATE
    fingerprints (doc-frequency above FP_DOCFREQ_CAP) are dropped
    before the join, the same quadratic-blowup guard as
    ``dedup_minhash_lsh``'s hot-bucket cap: a header shared by a
    million docs otherwise contributes 5·10^11 candidate pairs by
    itself. On this corpus the cap is a no-op (max doc-freq 7 at
    sf0.01, measured) but the plan carries it by construction.
    """
    from .textstats import doc_winnowing

    fp = doc_winnowing(spark, sf_dir).localCheckpoint(eager=False)
    df = fp.groupBy("fingerprint").agg(F.count("*").alias("nd"))
    # broadcast the OVER-cap hot list and anti-join, never the keep
    # list: the keep side is the near-complete inverted index (corpus-
    # sized at scale), while the hot side is tiny by construction —
    # the dedup_minhash_lsh / dedup_ngram_jaccard quarantine shape
    hot = df.filter(F.col("nd") > FP_DOCFREQ_CAP).select("fingerprint")
    keep = fp.join(bcast_gated(hot, sf_dir), "fingerprint", "left_anti")
    sizes = keep.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a = keep.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = keep.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    pairs = (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= FP_MIN_SHARED)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.expr(
                "n_shared * 1000000 DIV (n_a + n_b - n_shared)"
            ).alias("overlap_ppm"),
        )
    )


def _fp_overlap_sql() -> str:
    from .textstats import DOC_WINNOW_SQL

    return f"""
WITH fp AS ({DOC_WINNOW_SQL.strip()}),
docfreq AS (
  SELECT fingerprint FROM fp GROUP BY 1
  HAVING COUNT(*) <= {FP_DOCFREQ_CAP}
),
keep AS (SELECT fp.* FROM fp JOIN docfreq USING (fingerprint)),
sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM keep GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM keep a JOIN keep b
    ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {FP_MIN_SHARED}
)
SELECT doc_a, doc_b, n_shared,
       n_shared * 1000000 // (sa.n_fp + sb.n_fp - n_shared) AS overlap_ppm
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
"""


FP_OVERLAP_SQL = _fp_overlap_sql()


# -------------------------------------- duplicated n-gram fraction --

DUPG_N = 8  # gram length (words)


def text_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-text exposure: the fraction of a doc's
    word 8-grams that also occur ANYWHERE else in the corpus — the
    dataframe form of the exact-substring memorization screen (Lee et
    al. 2022 dedup the other way round: they drop the repeats; this
    measures how much of each doc is repeat). Emits per doc the gram
    count, duplicated-gram count, and exact ppm fraction.

    Shape: one explode to (gram-hash, doc) pairs, one count per hash,
    and a semi-join-style membership flag folded back per doc — all
    hash-partitioned, the inverted-index discipline again (never
    doc x doc). The gram table is the big intermediate (|tokens| rows);
    at 100 TB it is the same table the suffix-array dedup pipelines
    shard, and the per-hash count is where boilerplate shows up as
    hot keys — counts are map-side combined, so a million-doc
    boilerplate gram is one (hash, n) row after the partial agg.
    """
    docs = load_table_cpu(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: w != "")
    # linear zip_with gram form (round-11 GIANTDOC find: slice(words)
    # inside the lambda re-ran the split per gram — O(L²) in doc
    # length). hash64 maps over lambda-local gram strings.
    grams = F.transform(word_kgrams(words, DUPG_N), lambda g: hash64(g))
    g = docs.select("doc_id", F.explode(grams).alias("gh"))
    # distinct per doc BEFORE the global count so a doc repeating its
    # own gram doesn't count itself as a corpus duplicate
    gd = g.distinct()
    freq = gd.groupBy("gh").agg(F.count("*").alias("nd"))
    flagged = g.join(freq, "gh").select(
        "doc_id", (F.col("nd") >= 2).cast("long").alias("dup")
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum("dup").alias("n_dup_grams"),
        F.expr("sum(dup) * 1000000 DIV count(*)").alias("dup_ppm"),
    )


TEXT_DUP_NGRAM_SQL = f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - {DUPG_N} + 2),
           -- indexed 8-gram, not list_slice: in-lambda list_slice of an
           -- outer list is O(L) per gram in DuckDB (GIANTDOC, round 11)
           i -> {hash64_sql(indexed_kgram_sql(DUPG_N))}
         )) AS gh
  FROM w WHERE len(ws) >= {DUPG_N}
),
freq AS (
  SELECT gh, COUNT(*) AS nd FROM (SELECT DISTINCT doc_id, gh FROM g) d
  GROUP BY 1
)
SELECT doc_id, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_grams,
       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS dup_ppm
FROM g JOIN freq USING (gh)
GROUP BY doc_id
"""


# ------------------------------------------ index tuning report --


def dedup_index_tuning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational tuning view of the fingerprint inverted index: the
    doc-frequency histogram of winnowing fingerprints with each df
    level's candidate-pair mass (n·C(df,2)) and its ppm share — the
    report that justifies (or retunes) ``FP_DOCFREQ_CAP``: pair work
    explodes quadratically at the hot tail, and this shows exactly
    where the mass sits BEFORE a 100 TB pairing job is launched.

    One aggregate over the fingerprint table, then a |distinct-df|-row
    histogram — pure metadata, no pairing executed.
    """
    from .textstats import doc_winnowing

    fp = doc_winnowing(spark, sf_dir)
    df_t = fp.groupBy("fingerprint").agg(F.count("*").alias("df"))
    hist = df_t.groupBy("df").agg(F.count("*").alias("n_fingerprints"))
    mass = hist.select(
        "df",
        "n_fingerprints",
        # integer DIV, not /2-then-cast: the product is even by
        # construction, but a double quotient loses bits past 2^53
        F.expr("(n_fingerprints * df * (df - 1)) DIV 2").alias("pair_mass"),
    )
    tot = mass.agg(F.sum("pair_mass").alias("total_mass"))
    return (
        mass.crossJoin(F.broadcast(tot))
        .select(
            "df",
            "n_fingerprints",
            "pair_mass",
            F.expr(
                "CASE WHEN total_mass > 0"
                " THEN (pair_mass * 1000000) DIV total_mass ELSE 0 END"
            ).alias("mass_ppm"),
            (F.col("df") > FP_DOCFREQ_CAP).cast("int").alias("over_cap"),
        )
    )


def _index_tuning_sql() -> str:
    from .textstats import DOC_WINNOW_SQL

    return f"""
WITH fp AS ({DOC_WINNOW_SQL.strip()}),
df_t AS (SELECT fingerprint, COUNT(*) AS df FROM fp GROUP BY 1),
hist AS (SELECT df, COUNT(*) AS n_fingerprints FROM df_t GROUP BY 1),
mass AS (
  SELECT df, n_fingerprints,
         (n_fingerprints * df * (df - 1)) // 2 AS pair_mass
  FROM hist
),
tot AS (SELECT SUM(pair_mass) AS total_mass FROM mass)
SELECT CAST(df AS BIGINT) AS df,
       CAST(n_fingerprints AS BIGINT) AS n_fingerprints, pair_mass,
       CAST(CASE WHEN total_mass > 0
                 THEN (pair_mass * 1000000) // total_mass
                 ELSE 0 END AS BIGINT) AS mass_ppm,
       CAST(CASE WHEN df > {FP_DOCFREQ_CAP} THEN 1 ELSE 0 END AS INTEGER)
         AS over_cap
FROM mass CROSS JOIN tot
"""


DEDUP_TUNING_SQL = _index_tuning_sql()


# ------------------------------------- cross-source overlap matrix --


def dedup_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level contamination matrix: for every SOURCE pair, the
    Jaccard overlap (ppm) of their distinct word-8-gram sets — the
    crawl-vs-crawl dedup planning view ("these two feeds are 30%
    the same text; dedup them jointly, not independently"), one level
    up from the per-document pairing ops.

    Shape: (source, gram-hash) distinct table → per-gram source list
    via a gram-keyed self-join (wedge on the gram, ≤ C(|sources|,2)
    pairs per gram) → per-pair intersection counts joined against
    per-source set sizes. All integers; |sources|² output.

    Scale: the per-gram pair fan-out is capped by |sources| (20 here,
    maybe thousands at worst in production) — not by corpus size; a
    boilerplate gram shared by every source costs C(|sources|,2)
    rows once, after the distinct.
    """
    docs = load_table_cpu(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: w != "")
    # linear zip_with gram form (GIANTDOC, see text_dup_ngram_fraction)
    grams = F.transform(word_kgrams(words, DUPG_N), lambda g: hash64(g))
    sg = docs.select(
        "source", F.explode(grams).alias("gh")
    ).distinct()
    sizes = sg.groupBy("source").agg(F.count("*").alias("n_grams"))
    a = sg.select(F.col("source").alias("source_a"), "gh")
    b = sg.select(F.col("source").alias("source_b"), "gh")
    inter = (
        a.join(b, "gh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n_grams").alias("ga")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_grams").alias("gb")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.expr(
                "(n_shared * 1000000) DIV (ga + gb - n_shared)"
            ).alias("jaccard_ppm"),
        )
    )


DEDUP_SRC_OVERLAP_SQL = f"""
WITH w AS (
  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
sg AS (
  SELECT DISTINCT source, gh FROM (
    SELECT source,
           unnest(list_transform(range(1, len(ws) - {DUPG_N} + 2),
             -- indexed 8-gram, not list_slice: in-lambda list_slice of an
           -- outer list is O(L) per gram in DuckDB (GIANTDOC, round 11)
           i -> {hash64_sql(indexed_kgram_sql(DUPG_N))}
           )) AS gh
    FROM w WHERE len(ws) >= {DUPG_N}
  )
),
sizes AS (SELECT source, COUNT(*) AS n_grams FROM sg GROUP BY 1),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
  FROM sg a JOIN sg b ON a.gh = b.gh AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, CAST(n_shared AS BIGINT) AS n_shared,
       CAST((n_shared * 1000000) // (sa.n_grams + sb.n_grams - n_shared)
            AS BIGINT) AS jaccard_ppm
FROM inter
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
"""


# ------------------------------------- prefix-filtered τ-join --

PFX_TAU_PCT = 90  # Jaccard threshold τ = 0.90 (the synthetic corpus
#  shares a tiny vocabulary, so token-SET Jaccard runs high: τ=0.6
#  would pass 57% of ALL pairs — measured — and prune nothing)


def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join at τ = 0.9 via prefix filtering
    (AllPairs/PPJoin): each doc's DISTINCT-token set is ordered
    rarest-token-first (global df asc), and only the first
    n − ⌈τ·n⌉ + 1 tokens are indexed — two sets with Jaccard ≥ τ
    MUST share an indexed token (pigeonhole), so the candidate join
    is provably lossless while skipping the frequent-token buckets
    that drive Σdf² blow-up. Candidates are then verified with exact
    intersection counts. The guaranteed-exact complement to the
    minhash/simhash tier (no probability of a missed pair).

    Integer end-to-end: the τ test is 100·|A∩B| ≥ τ%·(|A|+|B|−|A∩B|)
    and the prefix length ⌈τn⌉ uses DIV ceiling. Shapes: wordcount →
    df ranks (broadcast) → per-doc ordered prefix (window) →
    prefix-token equi-join → verification join on the (doc, token)
    table — inverted-index discipline throughout.

    Measured honesty: on THIS fixture the prefix prunes only ~9% of
    all pairs (113k candidates of 125k at τ=0.9) — the synthetic
    corpus draws ~45-token sets from a tiny shared vocabulary, so
    even the rarest-5-token prefixes collide; prefix filtering earns
    its keep on heavy-tailed NATURAL vocabularies where rare tokens
    are nearly unique. The losslessness guarantee (pytest-proven
    equal to the brute τ-scan) is corpus-independent; the speedup is
    not — which is exactly why the LSH tier coexists with it.
    """
    docs = load_table_cpu(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .select("doc_id", "w")
        .distinct()
        .localCheckpoint(eager=False)
    )
    df_rank = toks.groupBy("w").agg(F.count("*").alias("df"))
    # vocab-derived df ranks + |docs|-sized size table: gate the hints
    ordered = toks.join(bcast_gated(df_rank, sf_dir), "w").withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "w")
        ),
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    # prefix length = n - ceil(tau*n) + 1; ceil(a/b) = (a + b - 1) DIV b
    with_n = ordered.join(bcast_gated(sizes, sf_dir), "doc_id").withColumn(
        "pfx_len",
        F.expr(
            f"n - ((n * {PFX_TAU_PCT} + 99) DIV 100) + 1"
        ),
    )
    prefix = with_n.filter(F.col("pos") <= F.col("pfx_len")).select(
        "doc_id", "w"
    )
    pa = prefix.select(F.col("doc_id").alias("a"), "w")
    pb = prefix.select(F.col("doc_id").alias("b"), "w")
    cands = (
        pa.join(pb, "w")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    ta = toks.select(F.col("doc_id").alias("a"), "w")
    tb = toks.select(F.col("doc_id").alias("b"), "w")
    inter = (
        cands.join(ta, "a")
        .join(tb, ["b", "w"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(bcast_gated(sa, sf_dir), "a")
        .join(bcast_gated(sb, sf_dir), "b")
        .filter(
            F.expr(
                f"inter * 100 >= {PFX_TAU_PCT} * (na + nb - inter)"
            )
        )
        .select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            "inter",
            "na",
            "nb",
            F.expr("(inter * 1000000) DIV (na + nb - inter)")
            .alias("jaccard_ppm"),
        )
    )


DEDUP_PFX_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> ''
),
df_rank AS (SELECT w, COUNT(*) AS df FROM toks GROUP BY 1),
ordered AS (
  SELECT t.doc_id, t.w,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.w)
           AS pos
  FROM toks t JOIN df_rank d ON d.w = t.w
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
prefix AS (
  SELECT o.doc_id, o.w
  FROM ordered o JOIN sizes s ON s.doc_id = o.doc_id
  WHERE o.pos <= s.n - ((s.n * {PFX_TAU_PCT} + 99) // 100) + 1
),
cands AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM prefix a JOIN prefix b ON a.w = b.w AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.a, c.b, COUNT(*) AS inter
  FROM cands c
  JOIN toks ta ON ta.doc_id = c.a
  JOIN toks tb ON tb.doc_id = c.b AND tb.w = ta.w
  GROUP BY 1, 2
)
SELECT i.a AS doc_a, i.b AS doc_b, CAST(i.inter AS BIGINT) AS inter,
       CAST(sa.n AS BIGINT) AS na, CAST(sb.n AS BIGINT) AS nb,
       CAST((i.inter * 1000000) // (sa.n + sb.n - i.inter) AS BIGINT)
         AS jaccard_ppm
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE i.inter * 100 >= {PFX_TAU_PCT} * (sa.n + sb.n - i.inter)
"""


# -------------------------------------- method agreement matrix --

_AGREE_METHODS = ("minhash", "simhash", "fingerprint", "prefix")


def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-audit of the near-dup tier: the four document-pair
    methods — minhash-LSH, simhash, winnowing fingerprints, and the
    exact prefix-filtered τ-join — compared pairwise on the pair sets
    they flag: both / only-left / only-right counts and the pair-set
    Jaccard in ppm. The report a dedup owner reads before trusting
    one method's output as THE duplicate list (high agreement between
    an approximate method and the exact τ-join is its working recall
    certificate; low agreement maps where thresholds diverge).

    Each method runs once (its own documented cost); the agreement
    math is set algebra on tagged (a, b) pair tables.
    """
    pair_sets = {
        "minhash": dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b"),
        "simhash": dedup_simhash_pairs(spark, sf_dir).select("doc_a", "doc_b"),
        "fingerprint": dedup_fingerprint_overlap(spark, sf_dir).select(
            "doc_a", "doc_b"
        ),
        "prefix": dedup_prefix_filter_join(spark, sf_dir).select(
            F.col("doc_a"), F.col("doc_b")
        ),
    }
    tagged = None
    for bit, name in enumerate(_AGREE_METHODS):
        t = pair_sets[name].select(
            "doc_a", "doc_b", F.lit(1 << bit).alias("mbit")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    # ONE pass: per pair the method bitmask, then the <=16-row mask
    # census carries every set statistic (the k-means-style tiny
    # collect; no per-method-pair rescan of the tagged table)
    masks = (
        tagged.distinct()  # a method re-emitting a pair must not double its bit
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("mbit")).alias("mask"))
        .groupBy("mask")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    rows = []
    for i, ma in enumerate(_AGREE_METHODS):
        for j in range(i + 1, len(_AGREE_METHODS)):
            mb = _AGREE_METHODS[j]
            na = sum(r["n"] for r in masks if r["mask"] & (1 << i))
            nb = sum(r["n"] for r in masks if r["mask"] & (1 << j))
            both = sum(
                r["n"] for r in masks
                if (r["mask"] & (1 << i)) and (r["mask"] & (1 << j))
            )
            union = na + nb - both
            rows.append(
                (ma, mb, na, nb, both,
                 (both * 1_000_000) // union if union else 0)
            )
    return spark.createDataFrame(
        rows,
        "method_a string, method_b string, n_a long, n_b long,"
        " n_both long, pair_jaccard_ppm long",
    )


def _agreement_sql() -> str:
    pairs_cte = f"""
mh AS (SELECT doc_a, doc_b FROM ({DEDUP_MINHASH_SQL.strip()})),
sh AS (SELECT doc_a, doc_b FROM ({DEDUP_SIMHASH_PAIRS_SQL.strip()})),
fp AS (SELECT doc_a, doc_b FROM ({FP_OVERLAP_SQL.strip()})),
px AS (SELECT doc_a, doc_b FROM ({DEDUP_PFX_SQL.strip()}))"""
    names = {"minhash": "mh", "simhash": "sh",
             "fingerprint": "fp", "prefix": "px"}
    rows = []
    order = list(names)
    for i, ma in enumerate(order):
        for mb in order[i + 1:]:
            ta, tb = names[ma], names[mb]
            rows.append(f"""
  SELECT '{ma}' AS method_a, '{mb}' AS method_b,
         (SELECT COUNT(*) FROM {ta}) AS n_a,
         (SELECT COUNT(*) FROM {tb}) AS n_b,
         (SELECT COUNT(*) FROM {ta} JOIN {tb} USING (doc_a, doc_b))
           AS n_both,
         CASE WHEN (SELECT COUNT(*) FROM {ta}) + (SELECT COUNT(*) FROM {tb})
                   - (SELECT COUNT(*) FROM {ta} JOIN {tb}
                      USING (doc_a, doc_b)) > 0
              THEN ((SELECT COUNT(*) FROM {ta} JOIN {tb}
                     USING (doc_a, doc_b)) * 1000000)
                   // ((SELECT COUNT(*) FROM {ta})
                       + (SELECT COUNT(*) FROM {tb})
                       - (SELECT COUNT(*) FROM {ta} JOIN {tb}
                          USING (doc_a, doc_b)))
              ELSE 0 END AS pair_jaccard_ppm""")
    return f"WITH {pairs_cte}\n" + "\nUNION ALL\n".join(rows)


DEDUP_AGREEMENT_SQL = _agreement_sql()
