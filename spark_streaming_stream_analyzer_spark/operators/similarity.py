"""Similarity search over embedding columns (build plan M5).

Two tiers:
 - ``sim_topk_cosine`` — brute-force cosine top-k: broadcast the query
   set, score every (query, candidate) pair with JVM-side array
   expressions, keep top-k per query with a deterministic window.
   This is the baseline and the verification oracle.
 - ``sim_ivf_topk`` — IVF-style pruned search: candidates are limited
   to the query's coarse partition (here the fixture's ``label``
   column stands in for a centroid assignment; in production the
   assignment comes from a k-means pass). Same scoring, ~1/|cells| of
   the work. The scale path for 100 TB is exactly this shape: a
   cheap partitioner (IVF cell / LSH hyperplane bytes) keyed into the
   shuffle, then exact scoring inside each cell.

Numeric policy: the dot product and norms are LEFT FOLDS in element
order over float→double casts (``F.aggregate`` with 0.0 seed), exactly
mirrored by DuckDB ``list_reduce(list_prepend(0.0, ...))`` — IEEE adds
in the same order → bit-identical cosine, so rank cutoffs cannot
disagree between engines. A Pandas-UDF (Arrow-vectorized) scorer is the
faster hot path at scale but sums in a different order; it lives in
tests as an equivalence-within-tolerance check
(``tests/test_similarity.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table_cpu

N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 5
DIM = 64


def _fold_sum(arr: Column) -> Column:
    """Left-fold sum with 0.0 seed (order-exact across engines)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _cosine(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = _fold_sum(F.zip_with(ad, bd, lambda x, y: x * y))
    na = _fold_sum(F.transform(ad, lambda x: x * x))
    nb = _fold_sum(F.transform(bd, lambda x: x * x))
    return dot / (F.sqrt(na) * F.sqrt(nb))


_COS_SQL = f"""
  list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}),
      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
      (a, x) -> a + x)
  / (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}),
       i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))),
       (a, x) -> a + x))
     * sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}),
       i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
       (a, x) -> a + x)))
"""


def _with_norm(df: DataFrame, emb: str, out: str) -> DataFrame:
    """L2 norm column; rows with zero norm are DROPPED — a zero vector
    has no direction, cosine against it is 0/0, and under ANSI mode
    that division would kill the task. Exclusion is the standard
    pre-index normalization step (and a no-op on the fixtures)."""
    ad = F.transform(emb, lambda x: x.cast("double"))
    return df.withColumn(
        out, F.sqrt(_fold_sum(F.transform(ad, lambda x: x * x)))
    ).filter(F.col(out) > 0)


def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query vector (vec_id < 8).

    The query side is broadcast; the candidate scan is embarrassingly
    parallel; the per-query top-k window shuffles only |Q|·k survivors
    after AQE — at scale, replace row_number with a bounded
    per-partition heap via mapInPandas if |Q| is large.

    Norms are computed once per row (not per pair) — same arithmetic
    as folding inside the pair, so the oracle value is unchanged, but
    the per-pair work drops to one dot product.
    """
    # double-cast once per row (linear), not per scored pair
    em = _with_norm(
        load_table_cpu(spark, sf_dir, "embeddings"), "embedding", "nrm"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb_d"),
        "nrm",
    )
    q = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb_d").alias("q_emb_d"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = em.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
    dot = _fold_sum(F.zip_with("q_emb_d", "emb_d", lambda x, y: x * y))
    scored = pairs.select(
        "q_id",
        "vec_id",
        (dot / (F.col("q_nrm") * F.col("nrm"))).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", "rank", "cos_sim")
    )


SIM_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.q_id, e.vec_id, {_COS_SQL} AS cos_sim
  FROM embeddings e JOIN q ON e.vec_id <> q.q_id
)
SELECT q_id, vec_id, rank, cos_sim FROM (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rank
  FROM scored
) t WHERE rank <= {TOP_K}
"""


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned cosine top-3: candidates restricted to the query's
    coarse cell (``label``). Scoring identical to the brute tier."""
    em = _with_norm(
        load_table_cpu(spark, sf_dir, "embeddings"), "embedding", "nrm"
    ).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb_d"),
        "nrm",
    )
    q = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("emb_d").alias("q_emb_d"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = em.join(
        F.broadcast(q),
        (F.col("label") == F.col("q_label")) & (F.col("vec_id") != F.col("q_id")),
    )
    dot = _fold_sum(F.zip_with("q_emb_d", "emb_d", lambda x, y: x * y))
    scored = pairs.select(
        "q_id",
        "vec_id",
        (dot / (F.col("q_nrm") * F.col("nrm"))).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_id", "vec_id", "rank", "cos_sim")
    )


SIM_IVF_SQL = f"""
WITH q AS (SELECT vec_id AS q_id, label AS q_label, embedding
           FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.q_id, e.vec_id, {_COS_SQL} AS cos_sim
  FROM embeddings e JOIN q ON e.label = q.q_label AND e.vec_id <> q.q_id
)
SELECT q_id, vec_id, rank, cos_sim FROM (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rank
  FROM scored
) t WHERE rank <= 3
"""


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm + mean component (array-expression pack used
    by normalization pipelines before indexing)."""
    em = load_table_cpu(spark, sf_dir, "embeddings")
    ad = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(_fold_sum(F.transform(ad, lambda x: x * x)))
    return em.select(
        "vec_id",
        "label",
        norm.alias("l2_norm"),
        (_fold_sum(ad) / F.lit(float(DIM))).alias("mean_component"),
    )


EMB_NORMS_SQL = f"""
SELECT vec_id, label,
  sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, x) -> a + x)) AS l2_norm,
  list_reduce(list_prepend(0.0, list_transform(embedding,
       x -> CAST(x AS DOUBLE))), (a, x) -> a + x) / {float(DIM)} AS mean_component
FROM embeddings
"""


# ------------------------------------------------------------- k-means --

KMEANS_K = 8
KMEANS_ITERS = 3


def sim_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mini k-means over the embedding column — the
    production replacement for the fixture's ``label`` as the IVF
    coarse quantizer (see ``sim_ivf_topk``).

    Iterative algorithm expressed natively in DataFrame ops (no RDDs,
    no driver-side data loops): each of the KMEANS_ITERS rounds is
      assign:    points × broadcast(centroids) → argmin distance
                 (min-of-struct with cell tiebreak → deterministic)
      recompute: posexplode to (cell, dim, x) → avg per (cell, dim)
                 → sort_array(collect_list) back to a vector
    Only the K×DIM centroid table moves between rounds (collected to
    the driver as a *model*, re-broadcast next round — model-sized, not
    data-sized). Init is the K lowest vec_ids: fully deterministic, so
    the final assignment is reproducible bit-for-bit. No SQL oracle
    (genuinely iterative — the driver records a rows-only check);
    tests/test_similarity.py asserts monotone inertia descent and
    assignment determinism.

    At 100 TB: assignment is an embarrassingly parallel map over a
    broadcast model; recompute is one partial+final aggregate per
    round. This is exactly MLlib's dataflow; owning it keeps the
    engine self-contained and the quantizer pluggable.
    """
    em = load_table_cpu(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    em = em.cache()
    centroids = (
        em.orderBy("vec_id")
        .limit(KMEANS_K)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("cell"),
            F.col("v").alias("c"),
        )
    )

    def assign(cent: DataFrame) -> DataFrame:
        dist = _fold_sum(
            F.zip_with("v", "c", lambda x, y: (x - y) * (x - y))
        )
        return (
            em.crossJoin(F.broadcast(cent))
            .select("vec_id", "v", "cell", dist.alias("d2"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("d2", "cell", "v")).alias("m"))
            .select(
                "vec_id",
                F.col("m.cell").alias("cell"),
                F.col("m.d2").alias("d2"),
                F.col("m.v").alias("v"),
            )
        )

    cur = centroids
    assigned = None
    for _ in range(KMEANS_ITERS):
        assigned = assign(cur)
        dims = assigned.select(
            "cell", F.posexplode("v").alias("dim", "x")
        )
        cur = (
            dims.groupBy("cell", "dim")
            .agg(F.avg("x").alias("cx"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cx"))),
                    lambda s: s.cx,
                ).alias("c")
            )
        )
        # materialize the model (K rows) so the next round's plan
        # doesn't re-derive all previous rounds lazily
        cur = spark.createDataFrame(cur.collect(), schema="cell int, c array<double>")

    return assigned.select("vec_id", "cell", F.round("d2", 6).alias("d2"))


def sim_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end production ANN: IVF top-3 searched within LEARNED
    k-means cells (``sim_kmeans_cells``) instead of the fixture's
    ``label`` stand-in. Train (iterative) → assign → cell-pruned exact
    scoring — the complete shape a 100 TB vector index runs. Iterative
    upstream ⇒ no SQL oracle (rows-only driver check); determinism of
    the whole chain is pinned by the kmeans tests plus the
    deterministic scoring tiebreaks."""
    cells = sim_kmeans_cells(spark, sf_dir).select("vec_id", "cell")
    em = _with_norm(
        load_table_cpu(spark, sf_dir, "embeddings"), "embedding", "nrm"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb_d"),
        "nrm",
    ).join(cells, "vec_id")
    q = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("cell").alias("q_cell"),
        F.col("emb_d").alias("q_emb_d"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = em.join(
        F.broadcast(q),
        (F.col("cell") == F.col("q_cell")) & (F.col("vec_id") != F.col("q_id")),
    )
    dot = _fold_sum(F.zip_with("q_emb_d", "emb_d", lambda x, y: x * y))
    scored = pairs.select(
        "q_id", "vec_id", (dot / (F.col("q_nrm") * F.col("nrm"))).alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_id", "vec_id", "rank", "cos_sim")
    )


def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality, measured in-engine: recall@3 of the IVF-pruned
    tier against the brute-force ground truth, per query vector. This
    is the metric a pipeline owner watches when tuning cell count vs
    probe cost — here it is a first-class, oracle-checked query (both
    tiers are deterministic, so recall is too).

    Scale: both inputs are |Q|·k rows; everything after the two
    similarity scans is broadcast-sized.
    """
    brute = (
        sim_topk_cosine(spark, sf_dir)
        .filter(F.col("rank") <= 3)
        .select("q_id", "vec_id")
        .alias("b")
    )
    ivf = sim_ivf_topk(spark, sf_dir).select("q_id", "vec_id").alias("i")
    joined = brute.join(
        ivf,
        (F.col("b.q_id") == F.col("i.q_id"))
        & (F.col("b.vec_id") == F.col("i.vec_id")),
        "left",
    )
    return (
        joined.groupBy(F.col("b.q_id").alias("q_id"))
        .agg(
            F.count("*").alias("n_true"),
            F.count(F.col("i.vec_id")).alias("n_hit"),
        )
        .select(
            "q_id",
            "n_true",
            "n_hit",
            (
                F.col("n_hit").cast("double") / F.col("n_true").cast("double")
            ).alias("recall_at_3"),
        )
    )


SIM_RECALL_SQL = f"""
WITH brute AS (
  SELECT q_id, vec_id FROM ({SIM_TOPK_SQL}) b WHERE rank <= 3
),
ivf AS (SELECT q_id, vec_id FROM ({SIM_IVF_SQL}) i)
SELECT b.q_id AS q_id,
       CAST(COUNT(*) AS BIGINT) AS n_true,
       CAST(COUNT(i.vec_id) AS BIGINT) AS n_hit,
       CAST(COUNT(i.vec_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS recall_at_3
FROM brute b LEFT JOIN ivf i
  ON b.q_id = i.q_id AND b.vec_id = i.vec_id
GROUP BY 1
"""


RANGE_TAU = 0.2


def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold (range) similarity search: every candidate with
    cosine ≥ RANGE_TAU per query vector — the "all near neighbors"
    companion to top-k. Structurally the cheapest tier of all: a
    broadcast of the query side, an embarrassingly parallel scored
    scan, and a filter. NO shuffle anywhere — there is no window and
    no aggregate, so at 100 TB this is a single map stage whose output
    streams straight to the sink. The deterministic left-fold scoring
    makes the τ cutoff bit-identical across engines."""
    em = _with_norm(
        load_table_cpu(spark, sf_dir, "embeddings"), "embedding", "nrm"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb_d"),
        "nrm",
    )
    q = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb_d").alias("q_emb_d"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = em.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
    dot = _fold_sum(F.zip_with("q_emb_d", "emb_d", lambda x, y: x * y))
    return pairs.select(
        "q_id",
        "vec_id",
        (dot / (F.col("q_nrm") * F.col("nrm"))).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= RANGE_TAU)


SIM_RANGE_SQL = f"""
WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings
           WHERE vec_id < {N_QUERIES})
SELECT q.q_id, e.vec_id, {_COS_SQL} AS cos_sim
FROM embeddings e JOIN q ON e.vec_id <> q.q_id
WHERE {_COS_SQL} >= {RANGE_TAU}
"""
