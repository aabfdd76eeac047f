"""Corpus-curation operators: the quality / safety / rollup pack a
large-scale training-data pipeline runs after dedup.

Extends the reference's tokenize-and-count surface
(``KafkaStreamPropertyAggregator.java:74-79``) with the curation
steps a 100 TB corpus actually needs: repetition-based quality
metrics (the Gopher-style filters), benchmark decontamination,
PII scan/redaction, multi-granularity time rollups, and the
keep-best-in-cluster dedup decision.

Every ratio is a double divide of exact integers and every regex is
in the Java∩RE2 dialect subset, so the DuckDB oracles match
bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import cents
from ..sources.tables import load_table, load_table_cpu
from .dedup import _SHINGLES_SQL, _shingles
from .textstats import TEXT_QUALITY_SQL, text_quality_score

# ---------------------------------------------------- repetition metrics --


def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition ratios (duplicate-word fraction, top
    word / top bigram mass) — the cheap boilerplate detectors used as
    corpus quality filters before model-based scoring.

    Two two-level aggregates (word tier, bigram tier) joined on
    doc_id: explode → partial (doc, gram) count → per-doc max/sum.
    Both levels combine map-side, so at 100 TB the shuffle carries
    (doc, gram, partial-count) triples, never raw text; the join is
    doc_id-to-doc_id between two already-aggregated (|docs|-row)
    sides."""
    docs = load_table_cpu(spark, sf_dir, "documents")
    words_arr = F.filter(F.split("text", " "), lambda w: w != "")
    words = docs.select("doc_id", F.explode(words_arr).alias("g"))
    wt = (
        words.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_word_cnt"),
        )
    )
    bigrams = F.zip_with(
        words_arr,
        F.slice(words_arr, 2, F.greatest(F.size(words_arr) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bigrams = F.slice(bigrams, 1, F.greatest(F.size(bigrams) - 1, F.lit(0)))
    bt = (
        docs.select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram_cnt"))
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return wt.join(bt, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "n_distinct",
        ((dbl("n_words") - dbl("n_distinct")) / dbl("n_words")).alias(
            "dup_word_frac"
        ),
        "top_word_cnt",
        (dbl("top_word_cnt") / dbl("n_words")).alias("top_word_frac"),
        "n_bigrams",
        "top_bigram_cnt",
        (dbl("top_bigram_cnt") / dbl("n_bigrams")).alias("top_bigram_frac"),
    )


TEXT_REPETITION_SQL = """
WITH words AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS g
  FROM documents
),
wc AS (SELECT doc_id, g, COUNT(*) AS c FROM words GROUP BY 1, 2),
wt AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
         COUNT(*) AS n_distinct, MAX(c) AS top_word_cnt
  FROM wc GROUP BY 1
),
bigrams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents) t
),
bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bigrams GROUP BY 1, 2),
bt AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         MAX(c) AS top_bigram_cnt
  FROM bc GROUP BY 1
)
SELECT wt.doc_id, n_words, n_distinct,
       (CAST(n_words AS DOUBLE) - CAST(n_distinct AS DOUBLE))
         / CAST(n_words AS DOUBLE) AS dup_word_frac,
       top_word_cnt,
       CAST(top_word_cnt AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac,
       n_bigrams, top_bigram_cnt,
       CAST(top_bigram_cnt AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         AS top_bigram_frac
FROM wt LEFT JOIN bt ON wt.doc_id = bt.doc_id
"""


# ----------------------------------------------------- decontamination --

#: documents with doc_id below this are the stand-in "benchmark set";
#: production would broadcast the real eval-suite shingle table instead.
N_BENCH_DOCS = 4


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination scan: flag corpus documents sharing
    word-3-gram shingles with a (stand-in) benchmark set, with hit
    counts and contamination fraction.

    The probe side is tiny (an eval suite, not a corpus), so the join
    is a broadcast hash join — the 100 TB corpus streams through
    map-side with no shuffle; per-doc totals are one hash-agg.
    Production decontamination uses longer n-grams (8-13); the shared
    3-gram tier keeps the fixture universe identical to the dedup
    oracles (``dedup.py:_shingles``)."""
    sh = _shingles(spark, sf_dir)
    bench = sh.filter(F.col("doc_id") < N_BENCH_DOCS).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    corpus = sh.filter(F.col("doc_id") >= N_BENCH_DOCS)
    tot = corpus.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hit_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )
    return hits.join(tot, "doc_id").select(
        "doc_id",
        "n_hit_shingles",
        "n_bench_docs",
        "n_shingles",
        (
            F.col("n_hit_shingles").cast("double")
            / F.col("n_shingles").cast("double")
        ).alias("contamination_frac"),
    )


TEXT_DECONTAM_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
bench AS (
  SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id < {N_BENCH_DOCS}
),
corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= {N_BENCH_DOCS}),
tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY 1),
h AS (
  SELECT c.doc_id,
         COUNT(DISTINCT c.shingle) AS n_hit_shingles,
         COUNT(DISTINCT b.bench_id) AS n_bench_docs
  FROM corpus c JOIN bench b ON c.shingle = b.shingle
  GROUP BY 1
)
SELECT h.doc_id, n_hit_shingles, n_bench_docs, n_shingles,
       CAST(n_hit_shingles AS DOUBLE) / CAST(n_shingles AS DOUBLE)
         AS contamination_frac
FROM h JOIN tot ON h.doc_id = tot.doc_id
"""


# ------------------------------------------------------ PII scan/redact --

#: Java∩RE2 dialect subset — no backrefs, no lookaround, so Spark
#: (java.util.regex) and DuckDB (RE2) match identically.
EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
PHONE_RE = "[0-9]{3}-[0-9]{4}"


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction over a deterministically PII-injected
    corpus (fixture text is synthetic word salad, so the scan targets
    are planted in-query: an email for doc_id % 7 == 0, a phone for
    doc_id % 11 == 0 — same CASE in both engines).

    Detection is `regexp_count`, redaction a global `regexp_replace`
    chain; only the md5 of the redacted text leaves the executor —
    the pattern for a compliance scan that must not move raw text
    across the wire. Pure codegen'd expressions, one scan, no
    shuffle before the (tiny) flagged-rows result."""
    docs = load_table_cpu(spark, sf_dir, "documents")
    aug = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise(F.col("text"))
    aug = F.when(
        F.col("doc_id") % 11 == 0, F.concat(aug, F.lit(" call 555-0142 ext 9"))
    ).otherwise(aug)
    redacted = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return (
        docs.select(
            "doc_id",
            F.regexp_count(aug, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
            F.regexp_count(aug, F.lit(PHONE_RE)).cast("int").alias("n_phones"),
            F.md5(redacted).alias("redacted_md5"),
        )
        .filter((F.col("n_emails") > 0) | (F.col("n_phones") > 0))
    )


TEXT_PII_SQL = f"""
WITH aug1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com now'
              ELSE text END AS t
  FROM documents
),
aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN t || ' call 555-0142 ext 9'
              ELSE t END AS t
  FROM aug1
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM aug
WHERE len(regexp_extract_all(t, '{EMAIL_RE}')) > 0
   OR len(regexp_extract_all(t, '{PHONE_RE}')) > 0
"""


# ------------------------------------------------------ rollup hierarchy --

_NS_PER_MIN = 60 * 1_000_000_000


def ts_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup hierarchy: minute sums from raw
    events, hour sums FROM THE MINUTE TIER, day sums from the hour
    tier — each coarser grain is a merge of the finer one's partials
    (exact integer cents), never a rescan. This is the hypertable /
    materialized-rollup pattern: at 100 TB the raw scan happens once
    and every coarser grain costs |finer-tier rows|, which is
    thousands of times smaller.

    bucket is the integer bucket index in its own grain's units
    (minutes / hours / days since epoch); sums are exact cents
    rendered as double once at the end."""
    ev = load_table(spark, sf_dir, "events")
    minute = (
        ev.select(
            F.expr(f"ts DIV {_NS_PER_MIN}").alias("bucket"),
            cents("value").alias("c"),
        )
        .groupBy("bucket")
        .agg(F.sum("c").alias("sum_cents"), F.count("*").alias("n"))
        # materialize each tier it feeds from (union branch + next
        # grain) — without this Spark re-plans the branch and re-scans
        # the RAW events table once per grain (verified: 3 parquet
        # scans, 0 ReusedExchange). The checkpoint is the in-session
        # stand-in for the persisted rollup table this pattern writes
        # in production; the tier is |minutes| rows, model-sized.
        .localCheckpoint(eager=False)
    )
    hour = (
        minute.select(F.expr("bucket DIV 60").alias("bucket"), "sum_cents", "n")
        .groupBy("bucket")
        .agg(F.sum("sum_cents").alias("sum_cents"), F.sum("n").alias("n"))
        .localCheckpoint(eager=False)
    )
    day = (
        hour.select(F.expr("bucket DIV 24").alias("bucket"), "sum_cents", "n")
        .groupBy("bucket")
        .agg(F.sum("sum_cents").alias("sum_cents"), F.sum("n").alias("n"))
    )
    tiers = (
        minute.select(F.lit("minute").alias("grain"), "bucket", "sum_cents", "n")
        .unionByName(
            hour.select(F.lit("hour").alias("grain"), "bucket", "sum_cents", "n")
        )
        .unionByName(
            day.select(F.lit("day").alias("grain"), "bucket", "sum_cents", "n")
        )
    )
    return tiers.select(
        "grain",
        "bucket",
        (F.col("sum_cents").cast("double") / F.lit(100.0)).alias("sum_value"),
        "n",
    )


TS_ROLLUP_SQL = """
WITH minute AS (
  SELECT epoch_us(ts) // 60000000 AS bucket,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents,
         COUNT(*) AS n
  FROM events GROUP BY 1
),
hour AS (
  SELECT bucket // 60 AS bucket, CAST(SUM(sum_cents) AS BIGINT) AS sum_cents,
         CAST(SUM(n) AS BIGINT) AS n
  FROM minute GROUP BY 1
),
day AS (
  SELECT bucket // 24 AS bucket, CAST(SUM(sum_cents) AS BIGINT) AS sum_cents,
         CAST(SUM(n) AS BIGINT) AS n
  FROM hour GROUP BY 1
)
SELECT 'minute' AS grain, bucket,
       CAST(sum_cents AS DOUBLE) / 100.0 AS sum_value, n FROM minute
UNION ALL
SELECT 'hour' AS grain, bucket,
       CAST(sum_cents AS DOUBLE) / 100.0 AS sum_value, n FROM hour
UNION ALL
SELECT 'day' AS grain, bucket,
       CAST(sum_cents AS DOUBLE) / 100.0 AS sum_value, n FROM day
"""


# -------------------------------------------------- keep-best-in-cluster --


def pipeline_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup decision: within each near-dup cluster
    (MinHash-LSH → connected components, ``dedup.dedup_cluster_keep``)
    keep the HIGHEST-QUALITY member (``textstats.text_quality_score``),
    not the min-id one — what a production pipeline actually does,
    since near-dup clusters mix clean and boilerplate-damaged copies.

    The cluster table is |dup docs| rows (model-sized next to the
    corpus), so it broadcasts into the quality join; the per-cluster
    argmax is one hash-agg over a struct ordering (score desc, doc_id
    asc via negation) — deterministic, no window shuffle."""
    from .dedup import dedup_cluster_keep

    clusters = dedup_cluster_keep(spark, sf_dir).select(
        "doc_id", F.col("keep_doc_id").alias("cluster_id")
    )
    quality = text_quality_score(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    members = quality.join(F.broadcast(clusters), "doc_id")
    best = members.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.max(
            F.struct(
                F.col("quality_score").alias("s"),
                (-F.col("doc_id")).alias("nd"),
            )
        ).alias("m"),
    )
    return best.select(
        "cluster_id",
        (-F.col("m.nd")).alias("best_doc_id"),
        F.col("m.s").alias("best_score"),
        "n_members",
    )


from .dedup import DEDUP_CLUSTER_SQL  # noqa: E402

PIPELINE_KEEP_BEST_SQL = f"""
WITH clusters AS ({DEDUP_CLUSTER_SQL}),
q AS ({TEXT_QUALITY_SQL}),
members AS (
  SELECT c.keep_doc_id AS cluster_id, c.doc_id, q.quality_score
  FROM clusters c JOIN q ON c.doc_id = q.doc_id
),
ranked AS (
  SELECT cluster_id, doc_id, quality_score,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY quality_score DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM members
)
SELECT cluster_id, doc_id AS best_doc_id, quality_score AS best_score,
       n_members
FROM ranked WHERE rn = 1
"""
