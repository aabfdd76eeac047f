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
    ad = F.transform(emb, lambda x: x.cast("double"))
    return df.withColumn(out, F.sqrt(_fold_sum(F.transform(ad, lambda x: x * x))))


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
