"""Corpus assembly operators: sequence packing, rebalancing, weighted
sampling, mixture accounting — the steps between a curated corpus and
an actual training run.

Sampling decisions are EXACT INTEGER comparisons on a portable 60-bit
hash (``functions/hashing.py``) — no floats in any keep/drop
predicate, so the decisions are bit-identical across engines, retries,
and cluster sizes (the property rand()-based sampling lacks). Ratios
in outputs are single divides of exact integers (or IEEE-exact
sqrts), bit-portable to the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import cents
from ..functions.hashing import hash64, hash64_sql
from ..functions.ranking import global_rank
from ..sources.tables import (
    load_documents_keyed,
    load_table,
    load_table_cpu,
)

# --------------------------------------------------- token-budget packing --

#: tokens per packed training sequence (concat-then-chunk semantics)
PACK_BUDGET = 2048


def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: per source, documents in doc_id order are
    concatenated and chunked into PACK_BUDGET-token bins; a document
    lands in the bin where its first token falls. Emits per-bin doc
    counts and token sums — the packing manifest a training loader
    consumes.

    One window (cumulative token sum per source, ordered by doc_id) +
    one hash-agg. The window shuffles by source with an in-partition
    sort — the unavoidable shuffle of sequence packing; at 100 TB the
    partition key would be (source, doc_id-range) with per-range
    offsets merged prefix-sum style, same plan shape."""
    docs = load_table_cpu(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    toks = docs.select("source", "doc_id", n_tok.alias("tok"))
    start_off = F.sum("tok").over(w) - F.col("tok")  # doc's first-token offset
    # integer DIV, not floor(double /): a per-source cumulative token
    # sum past 2^53 would lose low bits in the double quotient while
    # the oracle's // stays exact (the dedup_index_tuning_report /
    # feature_quantile_bins precision discipline)
    binned = toks.withColumn("start_off", start_off).withColumn(
        "bin", F.expr(f"start_off DIV {PACK_BUDGET}")
    ).drop("start_off")
    return binned.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


PACK_SQL = f"""
WITH toks AS (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
           AS tok
  FROM documents
),
binned AS (
  SELECT source, doc_id, tok,
         CAST((SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - tok)
              // {PACK_BUDGET} AS BIGINT) AS bin
  FROM toks
)
SELECT source, bin, COUNT(*) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM binned GROUP BY 1, 2
"""


# ------------------------------------------------------- class rebalance --

#: per-class absolute target (expected kept rows when class is larger)
REBALANCE_CAP = 64
_SAMPLE_M = 1 << 20  # hash-uniform denominator


def sample_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class rebalancing: downsample each language class toward
    REBALANCE_CAP expected docs with a deterministic per-row decision
    — keep iff (h mod M) * n_class < CAP * M, an exact int64
    comparison (P(keep) = min(1, CAP/n_class), no floats anywhere).
    Classes at or under the cap pass through whole.

    Two hash-aggs (class sizes, kept stats) and one broadcast join of
    the |classes|-row size table back onto the scan — the corpus
    streams map-side; nothing shuffles but the per-class partials."""
    docs = load_table_cpu(spark, sf_dir, "documents")
    sizes = docs.groupBy("lang").agg(F.count("*").alias("n_class"))
    u = F.pmod(hash64(F.concat(F.lit("rb#"), F.col("doc_id").cast("string"))),
               F.lit(_SAMPLE_M))
    keep = u * F.col("n_class") < F.lit(REBALANCE_CAP * _SAMPLE_M)
    return (
        docs.join(F.broadcast(sizes), "lang")
        .select("lang", "n_class", keep.cast("int").alias("kept"),
                F.col("n_chars"))
        .groupBy("lang")
        .agg(
            F.max("n_class").alias("n_orig"),
            F.sum("kept").alias("n_kept"),
            F.sum(F.col("kept") * F.col("n_chars")).alias("kept_chars"),
        )
    )


REBALANCE_SQL = f"""
WITH sizes AS (SELECT lang, COUNT(*) AS n_class FROM documents GROUP BY 1),
flagged AS (
  SELECT d.lang, s.n_class,
         CASE WHEN ({hash64_sql("'rb#' || CAST(doc_id AS VARCHAR)")} % {_SAMPLE_M})
                   * s.n_class < {REBALANCE_CAP * _SAMPLE_M}
              THEN 1 ELSE 0 END AS kept,
         d.n_chars
  FROM documents d JOIN sizes s ON d.lang = s.lang
)
SELECT lang, MAX(n_class) AS n_orig,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(SUM(kept * n_chars) AS BIGINT) AS kept_chars
FROM flagged GROUP BY 1
"""


# ------------------------------------------------------ weighted sample --

#: expected total sample size of the weighted draw
WEIGHTED_K = 100


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional Bernoulli sampling (P(keep) = min(1,
    K·w/W), w = n_chars, W = corpus total) with the same exact-integer
    decision discipline: keep iff (h mod M)·W < K·w·M in int64.
    Longer documents are proportionally likelier to be drawn — the
    standard token-weighted corpus draw.

    W is one scalar aggregate broadcast into the scan (literally a
    1-row cross join); the decision is then map-side."""
    docs = load_table_cpu(spark, sf_dir, "documents")
    tot = docs.agg(F.sum("n_chars").alias("w_total"))
    u = F.pmod(hash64(F.concat(F.lit("ws#"), F.col("doc_id").cast("string"))),
               F.lit(_SAMPLE_M))
    # keep iff u·W < K·M·w, but NEVER as that product: u < 2^20 and W
    # is the corpus-total char count, so u·W overflows int64 once the
    # corpus passes ~2^43 chars (~9 TB of text — inside the target
    # regime, and ANSI overflow kills the job). The algebraically
    # identical division form u ≤ (K·M·w − 1) DIV W keeps every
    # operand ≤ K·M·max(w) (~2^53 for million-char docs); the CASE
    # guards make w = 0 an explicit drop and W = 0 impossible to hit.
    keep = F.expr(
        f"CASE WHEN n_chars > 0 AND w_total > 0 THEN"
        f" (CASE WHEN u <= ({WEIGHTED_K * _SAMPLE_M} * n_chars - 1)"
        f" DIV w_total THEN 1 ELSE 0 END) ELSE 0 END"
    )
    return (
        docs.crossJoin(F.broadcast(tot))
        .select("source", "n_chars", "w_total", u.alias("u"))
        .select("source", keep.alias("kept"), "n_chars")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            F.sum(F.col("kept") * F.col("n_chars")).alias("kept_chars"),
        )
    )


WEIGHTED_SQL = f"""
WITH tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS w_total FROM documents),
flagged AS (
  -- division form, not u * w_total: the product overflows int64 on
  -- ~9 TB corpora (see the Spark twin's comment)
  SELECT d.source,
         CASE WHEN d.n_chars > 0 AND t.w_total > 0 THEN
           (CASE WHEN ({hash64_sql("'ws#' || CAST(doc_id AS VARCHAR)")} % {_SAMPLE_M})
                   <= ({WEIGHTED_K * _SAMPLE_M} * d.n_chars - 1) // t.w_total
                 THEN 1 ELSE 0 END) ELSE 0 END AS kept,
         d.n_chars
  FROM documents d CROSS JOIN tot t
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(SUM(kept * n_chars) AS BIGINT) AS kept_chars
FROM flagged GROUP BY 1
"""


# ------------------------------------------------------- mixture stats --


def corpus_mixture_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture accounting: per-source token counts, corpus
    share, and a sqrt-damped sampling weight relative to the largest
    source (the square-root temperature rule used to keep small
    sources from vanishing in the mixture).

    token_share divides two exact integers; weight_rel divides two
    IEEE-exact sqrts — both bit-portable. The global totals are a
    broadcast 1-row aggregate; everything else is one hash-agg over
    the scan."""
    docs = load_table_cpu(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    per = docs.select("source", n_tok.alias("tok")).groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("tok").alias("n_tokens")
    )
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("tot_tokens").cast("double"))
        .alias("token_share"),
        (F.sqrt(F.col("n_tokens").cast("double"))
         / F.sqrt(F.col("max_tokens").cast("double"))).alias("weight_rel"),
    )


MIXTURE_SQL = """
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                       AS BIGINT)) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
         MAX(n_tokens) AS max_tokens
  FROM per
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) AS token_share,
       sqrt(CAST(n_tokens AS DOUBLE)) / sqrt(CAST(max_tokens AS DOUBLE))
         AS weight_rel
FROM per CROSS JOIN tot
"""


# --------------------------------------- temperature-mixed sampling --

MIX_TARGET = 200          # documents to draw across all sources
MIX_W_SCALE = 1_000_000   # sqrt weights quantized to integer micro-units


def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing — the τ=0.5 sampling schedule
    LLM pretraining uses to up-weight small sources without letting
    the biggest source dominate: source i's share ∝ n_i^τ. Emits each
    source's integer document quota such that quotas sum EXACTLY to
    MIX_TARGET (largest-remainder apportionment), plus the achievable
    take (a source can't supply more than it has).

    Portability discipline: τ=0.5 is deliberate — IEEE sqrt is
    correctly rounded in every engine (a pow(x, 0.7) would differ in
    the last ulp between libm implementations), and the sqrt weights
    are immediately quantized to integer micro-units, so the share
    division, remainders, and tie-broken largest-remainder ranking are
    ALL integer arithmetic — bit-identical on any engine and any
    partitioning. The whole computation runs on the |sources|-row
    aggregate; the corpus is scanned once for counts.
    """
    docs = load_table_cpu(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = F.floor(F.sqrt(F.col("n_docs").cast("double")) * MIX_W_SCALE).cast("long")
    weighted = counts.select("source", "n_docs", w.alias("w"))
    tot = Window.partitionBy()
    shares = weighted.select(
        "source",
        "n_docs",
        "w",
        F.expr(f"({MIX_TARGET} * w) DIV SUM(w) OVER ()").alias("base_quota"),
        F.expr(f"({MIX_TARGET} * w) % SUM(w) OVER ()").alias("rem"),
    )
    short = F.lit(MIX_TARGET) - F.sum("base_quota").over(tot)
    ranked = shares.select(
        "source",
        "n_docs",
        "w",
        "base_quota",
        (
            F.row_number().over(
                Window.orderBy(F.col("rem").desc(), F.col("source"))
            )
            <= short
        ).cast("long").alias("extra"),
    )
    return ranked.select(
        "source",
        "n_docs",
        "w",
        (F.col("base_quota") + F.col("extra")).alias("quota"),
        F.least(
            F.col("base_quota") + F.col("extra"), F.col("n_docs")
        ).alias("n_taken"),
    )


SAMPLE_TEMPERATURE_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
),
weighted AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * {MIX_W_SCALE}) AS BIGINT) AS w
  FROM counts
),
shares AS (
  SELECT source, n_docs, w,
         ({MIX_TARGET} * w) // SUM(w) OVER () AS base_quota,
         ({MIX_TARGET} * w) % SUM(w) OVER () AS rem
  FROM weighted
),
ranked AS (
  SELECT source, n_docs, w, base_quota,
         CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
              <= {MIX_TARGET} - SUM(base_quota) OVER () THEN 1 ELSE 0 END AS extra
  FROM shares
)
SELECT source, n_docs, w,
       CAST(base_quota + extra AS BIGINT) AS quota,
       CAST(LEAST(base_quota + extra, n_docs) AS BIGINT) AS n_taken
FROM ranked
"""


# -------------------------------------------- per-group reservoir sample --

RSV_K = 20        # sample size per group
RSV_SALTS = 16    # phase-1 fan-out


def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group "reservoir" sample: each source keeps
    the RSV_K documents with the smallest portable hash of their id —
    the seeded, rerun-stable form of uniform group sampling (a true
    random reservoir can't be value-oracled; a hash-rank one can, and
    is what reproducible training pipelines use anyway).

    Two-phase exact top-k: phase 1 ranks within (source, salt) buckets
    — RSV_SALTS parallel partial top-k's, so no single task ever sorts
    a whole group — then phase 2 ranks the <= K·RSV_SALTS survivors per
    source. This is the scale-correct exact form: a one-window
    row_number funnels each group through one task, which at 100 TB
    with a handful of sources is a straggler by construction. Measured
    plan: both windows shuffle only (source, salt/doc_id, hash).
    """
    docs = load_documents_keyed(spark, sf_dir)
    h = hash64(F.concat(F.lit("rsv:"), F.col("doc_id").cast("string")))
    base = docs.select("source", "doc_id", h.alias("sample_key"))
    w1 = Window.partitionBy(
        "source", (F.col("doc_id") % RSV_SALTS)
    ).orderBy("sample_key", "doc_id")
    cand = base.withColumn("rn1", F.row_number().over(w1)).filter(
        F.col("rn1") <= RSV_K
    )
    w2 = Window.partitionBy("source").orderBy("sample_key", "doc_id")
    return (
        cand.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= RSV_K)
        .select("source", "doc_id", "rk", "sample_key")
    )


RESERVOIR_SQL = f"""
SELECT source, doc_id, rk, sample_key FROM (
  SELECT source, doc_id,
         {hash64_sql("'rsv:' || CAST(doc_id AS VARCHAR)")} AS sample_key,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {hash64_sql("'rsv:' || CAST(doc_id AS VARCHAR)")}, doc_id
         ) AS rk
  FROM documents
) t WHERE rk <= {RSV_K}
"""


# ---------------------------------------------- mixture concentration --


def corpus_contrib_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration of the training mixture: the Gini coefficient of
    per-source token contribution, in exact ppm — the one-number
    answer to "is the corpus a few sources wearing a trench coat".
    0 = perfectly even mixture, ->1 = one source dominates. Companion
    to ``corpus_mixture_stats`` (which lists the shares; this scores
    them).

    Gini over k sorted shares x_1<=...<=x_k:
    (2·Σ i·x_i) / (k·Σ x_i) − (k+1)/k, computed by integer
    cross-multiplication in ppm: one wordcount-shaped aggregate to
    (source, tokens), one k-row window to rank, one scalar fold.
    The heavy stage is the token count (map-side combined); the Gini
    arithmetic touches k rows — free at any corpus size.
    """
    docs = load_table_cpu(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    per_src = docs.groupBy("source").agg(F.sum(n_tok).alias("tok"))
    w = Window.orderBy("tok", "source")
    ranked = per_src.select(
        "tok", F.row_number().over(w).alias("i")
    )
    return ranked.agg(
        F.count("*").alias("n_sources"),
        F.sum("tok").alias("total_tokens"),
        F.expr(
            "(2 * sum(i * tok) * 1000000 DIV (count(*) * sum(tok)))"
            " - ((count(*) + 1) * 1000000 DIV count(*))"
        ).alias("gini_ppm"),
    )


CORPUS_GINI_SQL = """
WITH per_src AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS tok
  FROM documents GROUP BY 1
),
ranked AS (
  SELECT tok, row_number() OVER (ORDER BY tok, source) AS i FROM per_src
)
SELECT COUNT(*) AS n_sources, CAST(SUM(tok) AS BIGINT) AS total_tokens,
       CAST((2 * SUM(i * tok) * 1000000 // (COUNT(*) * SUM(tok)))
            - ((COUNT(*) + 1) * 1000000 // COUNT(*)) AS BIGINT) AS gini_ppm
FROM ranked
"""


# ------------------------------------------------- length bucketing --


def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: documents grouped into
    power-of-two token-length buckets (the dynamic-batching scheme
    that pads each sequence only to its bucket ceiling, not the global
    max), reporting per bucket the doc count, real token mass, padded
    mass, and exact padding-waste ppm — the number that decides
    whether bucketed batching is worth the loader complexity.

    One scan, one 2^k bucket expression (integer bit math via
    ceil-log2 on the token count), one aggregate. The waste ppm is
    (padded − real)·1e6 DIV padded, all integer.
    """
    docs = load_table_cpu(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    # smallest power of two >= n, in pure integer bit math: 1 <<
    # bitlength(n-1) (a float ceil(log2(n)) would be a portability
    # bug at exact-power boundaries)
    bucket = F.expr(
        "CASE WHEN n_tok <= 1 THEN CAST(1 AS BIGINT)"
        " ELSE shiftleft(CAST(1 AS BIGINT), length(bin(n_tok - 1))) END"
    )
    toks = docs.select(n_tok.alias("n_tok")).withColumn("bucket", bucket)
    return (
        toks.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("real_tokens"),
            (F.count("*") * F.col("bucket")).alias("padded_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "real_tokens",
            "padded_tokens",
            F.expr(
                "(padded_tokens - real_tokens) * 1000000 DIV padded_tokens"
            ).alias("waste_ppm"),
        )
    )


PACK_LENGTH_SQL = """
WITH toks AS (
  SELECT len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
  FROM documents
),
b AS (
  SELECT n_tok,
         CASE WHEN n_tok <= 1 THEN CAST(1 AS BIGINT)
              ELSE CAST(1 AS BIGINT) << length(bin(n_tok - 1)) END AS bucket
  FROM toks
)
SELECT bucket, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS real_tokens,
       CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
       CAST((COUNT(*) * bucket - SUM(n_tok)) * 1000000
            // (COUNT(*) * bucket) AS BIGINT) AS waste_ppm
FROM b GROUP BY 1
"""


# ---------------------------------------------- Poisson bootstrap --

BOOT_B = 16
#: cumulative Poisson(λ=1) CDF in ppm, P(X <= k) for k = 0..8; a draw
#: above the last threshold caps at k=9. Hard-coded integer constants
#: (the dq_benford discipline) so both engines branch identically.
BOOT_CDF_PPM = (
    367879, 735759, 919699, 981012, 996340,
    999406, 999917, 999990, 999999,
)


def _boot_k_case(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(BOOT_CDF_PPM)
    )
    return f"CASE {branches} ELSE {len(BOOT_CDF_PPM)} END"


def sample_bootstrap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap over orders: B=16 resample replicas computed
    in ONE distributed pass — each row's multiplicity in replica r is
    a deterministic hash-Poisson(1) draw (the Chamandy et al. /
    streaming-bootstrap trick: at n→∞, per-row Binomial(n, 1/n)
    multiplicities ARE Poisson(1), so no replica needs a global
    resample). Emits per-replica draw count and exact integer-cents
    sum/mean of o_totalprice — the spread across replicas is the
    bootstrap standard error of the mean, computed without ever
    materializing a resampled table.

    EXACT: multiplicities come from hash-ppm uniforms pushed through
    a hard-coded integer CDF (λ=1 in ppm, the ``dq_benford``
    constant-table discipline); sums are integer cents; mean is DIV.

    Scale: explode ×B then one partial/final aggregate — B·|rows|
    flat-mapped, nothing shuffles but B partial rows per partition.
    The classic 100 TB bootstrap (per-executor partials, no resample
    shuffle).
    """
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents("o_totalprice").alias("c")
    )
    # Kirsch–Mitzenmacher double hashing: TWO md5s per row mixed as
    # h1 + rep·h2 replace one md5 per (row, replica) — measured 8×
    # less hashing (the md5 was the whole cost under the noop sink).
    # h2 is folded to 2^40 so rep·h2 stays far from int64 overflow.
    hashed = od.select(
        "o_orderkey", "c",
        hash64(F.concat(F.lit("bsA#"), F.col("o_orderkey").cast("string")))
        .alias("h1"),
        F.pmod(
            hash64(F.concat(F.lit("bsB#"), F.col("o_orderkey").cast("string"))),
            F.lit(1 << 40),
        ).alias("h2"),
    )
    reps = hashed.select(
        "c", "h1", "h2",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("rep"),
    )
    drawn = reps.withColumn(
        "u", F.expr("(h1 + rep * h2) % 1000000")
    ).withColumn("k", F.expr(_boot_k_case("u")))
    return (
        drawn.groupBy("rep")
        .agg(
            F.sum("k").alias("n_draws"),
            F.sum(F.col("k") * F.col("c")).alias("sum_cents"),
        )
        .select(
            "rep",
            "n_draws",
            "sum_cents",
            # a replica where every row drew k=0 (P≈e^-n, certain on a
            # 1-row corpus) has no mean: DuckDB // NULLs the zero
            # divisor, ANSI DIV throws — guard to the oracle's NULL
            # (1-row-corpus sweep, round 7)
            F.expr(
                "CASE WHEN n_draws > 0 THEN sum_cents DIV n_draws END"
            ).alias("mean_cents"),
        )
    )


def _boot_sql() -> str:
    h1 = hash64_sql("'bsA#' || CAST(o_orderkey AS VARCHAR)")
    h2 = hash64_sql("'bsB#' || CAST(o_orderkey AS VARCHAR)")
    u = "((h1 + rep * h2) % 1000000 + 1000000) % 1000000"
    return f"""
WITH hashed AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         {h1} AS h1,
         ((({h2}) % {1 << 40}) + {1 << 40}) % {1 << 40} AS h2
  FROM orders
),
reps AS (
  SELECT c, h1, h2, unnest(range(0, {BOOT_B})) AS rep FROM hashed
),
drawn AS (
  SELECT rep, c, {_boot_k_case(u)} AS k FROM reps
)
SELECT CAST(rep AS BIGINT) AS rep, CAST(SUM(k) AS BIGINT) AS n_draws,
       CAST(SUM(k * c) AS BIGINT) AS sum_cents,
       CAST(CAST(SUM(k * c) AS BIGINT) // CAST(SUM(k) AS BIGINT) AS BIGINT)
         AS mean_cents
FROM drawn GROUP BY 1
"""


SAMPLE_BOOTSTRAP_SQL = _boot_sql()


# ------------------------------------------------ 80/20 analysis --


def agg_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration report per source: how many of its largest
    documents cover 80% of its token mass (the 80/20 audit that
    decides whether a source's value lives in a few mega-docs — a
    dedup/curation risk signal — or is spread evenly). Emits the doc
    count, token total, the minimal top-k covering 80%, and that k as
    a ppm share of the doc count.

    EXACT: the 80% test is 5·cumsum ≥ 4·total in integers; ranking
    ties break on doc_id. One wordcount-shaped token count, one
    per-source window cumsum on the (source, doc) table, one
    aggregate.
    """
    docs = load_table_cpu(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id",
        F.size(F.filter(F.split("text", " "), lambda w: w != ""))
        .cast("long").alias("tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("tok"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("source")
    ranked = toks.select(
        "source",
        F.sum("tok").over(w).alias("cum"),
        F.row_number().over(
            Window.partitionBy("source").orderBy(F.desc("tok"), F.asc("doc_id"))
        ).alias("rk"),
        F.sum("tok").over(wt).alias("total_tokens"),
        F.count("*").over(wt).alias("n_docs"),
    )
    return (
        ranked.filter(F.col("cum") * 5 >= F.col("total_tokens") * 4)
        .groupBy("source")
        .agg(
            F.min("n_docs").alias("n_docs"),
            F.min("total_tokens").alias("total_tokens"),
            F.min("rk").alias("k80"),
        )
        .select(
            "source", "n_docs", "total_tokens", "k80",
            F.expr("(k80 * 1000000) DIV n_docs").alias("k80_ppm"),
        )
    )


AGG_PARETO_SQL = """
WITH toks AS (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
              AS BIGINT) AS tok
  FROM documents
),
ranked AS (
  SELECT source,
         SUM(tok) OVER (PARTITION BY source ORDER BY tok DESC, doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY tok DESC, doc_id)
           AS rk,
         SUM(tok) OVER (PARTITION BY source) AS total_tokens,
         COUNT(*) OVER (PARTITION BY source) AS n_docs
  FROM toks
)
SELECT source, CAST(MIN(n_docs) AS BIGINT) AS n_docs,
       CAST(MIN(total_tokens) AS BIGINT) AS total_tokens,
       CAST(MIN(rk) AS BIGINT) AS k80,
       CAST((MIN(rk) * 1000000) // MIN(n_docs) AS BIGINT) AS k80_ppm
FROM ranked WHERE cum * 5 >= total_tokens * 4
GROUP BY 1
"""


# ------------------------------------------- interleave order --


def pack_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin interleave across sources: documents
    take their within-source rank (by doc_id), then the global
    training order cycles source-by-source — the data-mixing order a
    curriculum loader consumes so no source floods any window of
    training (the streaming-mixture twin of ``sample_rebalance``'s
    counts-only view).

    Both ranks are DISTRIBUTED (VERDICT r6 item 5 applied to the
    manifest grain — one row per doc is still fact-sized):

    - the within-source rank is a ``global_rank`` over (source,
      doc_id) minus a broadcast per-source offset (|sources| rows) —
      equivalent to ``row_number PARTITION BY source`` but without
      pushing |docs|/|sources| rows through one task per source;
    - the global position is a second ``global_rank`` over
      (rn, source, doc_id) — range-partitioned, no single-partition
      window anywhere in the plan.

    NULL-source contract (round-8 NULL-keys sweep): anonymous docs are
    ONE source bucket that sorts LAST — Spark orders with
    ``asc_nulls_last`` and joins the per-source offset null-safely, so
    the bucket neither vanishes through an equi-join (NULL != NULL)
    nor jumps to the front (Spark ``asc()`` is NULLS FIRST where
    DuckDB's default is NULLS LAST; the oracle pins LAST explicitly).
    """
    docs = load_documents_keyed(spark, sf_dir).select("doc_id", "source")
    g = global_rank(docs, [F.asc_nulls_last("source"), F.asc("doc_id")], out="gpos")
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    lower = counts.select(
        F.col("source").alias("source_b"), F.col("n").alias("n_b")
    )
    # "source_b precedes source" under the NULL-last order: every
    # non-null source precedes the NULL bucket; NULL precedes nothing.
    precedes = (F.col("source_b") < F.col("source")) | (
        F.col("source").isNull() & F.col("source_b").isNotNull()
    )
    src_off = (
        counts.join(F.broadcast(lower), precedes, "left")
        .groupBy("source")
        .agg(F.coalesce(F.sum("n_b"), F.lit(0)).alias("src_off"))
        .withColumnRenamed("source", "source_o")
    )
    ranked = (
        g.join(
            F.broadcast(src_off),
            F.col("source").eqNullSafe(F.col("source_o")),
        )
        .withColumn("rn", (F.col("gpos") - F.col("src_off")).cast("int"))
        .select("doc_id", "source", "rn")
    )
    return global_rank(
        ranked,
        [F.asc("rn"), F.asc_nulls_last("source"), F.asc("doc_id")],
        out="position",
    ).select("doc_id", "source", "rn", "position")


PACK_INTERLEAVE_SQL = """
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
)
SELECT doc_id, source, CAST(rn AS BIGINT) AS rn,
       CAST(ROW_NUMBER() OVER (ORDER BY rn, source NULLS LAST, doc_id)
            AS BIGINT) AS position
FROM ranked
"""


# ------------------------------------------------ epoch shuffles --

EPOCHS_N = 3
EPOCH_HEAD = 5


def pack_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training shuffles: epoch e orders the
    corpus by md5(e, doc_id) — a different but perfectly reproducible
    permutation per epoch, derivable by any worker with no shuffle
    state (the no-RNG property of ``src_synthetic_gen`` applied to
    data ordering). Each epoch's ENTIRE permutation is committed to
    one XOR-fold checksum of (position, doc) pairs, plus the first
    five doc_ids for spot inspection — so the full ordering is
    value-oracled without emitting |docs|·|epochs| rows.

    Per epoch: one hash sort (the unavoidable cost of a global
    order), then a single-row fold.
    """
    docs = load_documents_keyed(spark, sf_dir).select("doc_id")
    epochs = spark.range(EPOCHS_N).select(F.col("id").alias("epoch"))
    keyed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        hash64(
            F.concat(
                F.lit("ep#"),
                F.col("epoch").cast("string"),
                F.lit("#"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    )
    w = Window.partitionBy("epoch").orderBy("h", "doc_id")
    pos = keyed.withColumn("position", F.row_number().over(w))
    sig = pos.withColumn(
        "hash_sig",
        hash64(
            F.concat(
                F.col("position").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ),
    )
    return sig.groupBy("epoch").agg(
        F.count("*").alias("n_docs"),
        F.expr("bit_xor(hash_sig)").alias("perm_checksum"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("position", "doc_id"))
                    ),
                    1,
                    EPOCH_HEAD,
                ),
                lambda s: s["doc_id"].cast("string"),
            ),
        ).alias("head_docs"),
    )


def _epoch_shuffle_sql() -> str:
    h = hash64_sql(
        "'ep#' || CAST(epoch AS VARCHAR) || '#' || CAST(doc_id AS VARCHAR)"
    )
    hs = hash64_sql(
        "CAST(position AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)"
    )
    return f"""
WITH keyed AS (
  SELECT e.epoch, d.doc_id, {h} AS h
  FROM documents d CROSS JOIN (SELECT unnest(range(0, {EPOCHS_N})) AS epoch) e
),
pos AS (
  SELECT epoch, doc_id,
         ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY h, doc_id)
           AS position
  FROM keyed
)
SELECT CAST(epoch AS BIGINT) AS epoch, COUNT(*) AS n_docs,
       bit_xor({hs}) AS perm_checksum,
       array_to_string(list(CAST(doc_id AS VARCHAR)
                            ORDER BY position) [1:{EPOCH_HEAD}], ',')
         AS head_docs
FROM pos GROUP BY 1
"""


PACK_EPOCH_SQL = _epoch_shuffle_sql()
