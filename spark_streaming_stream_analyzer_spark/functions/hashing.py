"""Portable deterministic hashing — identical in Spark and DuckDB.

Spark's native ``hash()``/``xxhash64()`` are Murmur3/xxHash with Spark's
seeds; DuckDB's ``hash()`` is its own. For operators whose *output*
depends on hash values (MinHash signatures, SimHash fingerprints, LSH
band buckets), the DuckDB oracle can only reproduce the result if both
engines share the hash function. MD5 is bit-identical everywhere, so
the portable 64-ish-bit hash is:

    hash64(s) = CAST(first 15 hex chars of md5(s) AS BIGINT via base-16)

15 hex digits = 60 bits < 2^63, so the value fits a signed BIGINT in
both engines with no sign ambiguity.

Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)`` → string → BIGINT
DuckDB: ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``

Scale note: md5 is slower than xxhash64 but still JVM-side codegen
(no Python round-trip); the production path could swap in xxhash64 once
the oracle no longer needs to mirror it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60
HASH_PRIME = 2305843009213693951  # 2^61 - 1 (Mersenne), > any hash64 output


def hash64(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """The DuckDB-side mirror of :func:`hash64` for an SQL expression."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# ------------------------------------------------------- portable HLL --

HLL_B = 8                      # bucket bits
HLL_M = 1 << HLL_B             # 256 buckets
HLL_REST_BITS = HASH_BITS - HLL_B  # 52 bits of rho-material
#: bias correction for m >= 128 (Flajolet et al. 2007)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_estimate(df, group_cols: list[str], value_col: str):
    """Engine-portable HyperLogLog distinct estimate.

    Unlike ``approx_count_distinct`` (whose sketch is engine-private),
    every step here is exact integer arithmetic both engines reproduce
    bit-for-bit from the shared md5 ``hash64``:

      bucket = h % m;  rest = h // m
      rho    = (REST_BITS + 1) - length(bin(rest))   # 1-based LZ count
      per-bucket max rho → integer weight 2^(REST_BITS + 1 - maxrho)
      SUM(weights) is an exact BIGINT (≤ m · 2^52 < 2^63), and the
      final estimate alpha · m² · 2^(REST_BITS+1) / weightsum is a
      deterministic float expression over identical integers.

    So the *approximate* operator still hash-matches the DuckDB oracle
    exactly — approximation error is a property of the algorithm, not
    of the engines diverging. Standard error ~ 1.04/sqrt(256) ≈ 6.5 %
    (bounded against truth in tests). Small-range/zero-bucket
    corrections are omitted knowingly: fixture cardinalities (~10³-10⁵)
    sit in HLL's raw-estimate sweet spot, and the oracle mirrors the
    same formula.
    """
    from pyspark.sql import functions as F

    bucket, rho = hll_bucket_rho(F.col(value_col))
    per_bucket = df.select(
        *group_cols, bucket.alias("bkt"), rho.alias("rho")
    ).groupBy(*group_cols, "bkt").agg(F.max("rho").alias("max_rho"))
    return hll_estimate_from_sketch(per_bucket, group_cols)


def hll_bucket_rho(value_col):
    """The ONE definition of the sketch's per-row coordinates —
    (bucket, rho) columns from a value column. Shared by the batch
    estimator above and the streaming sketch builder
    (``streaming/pipelines.stream_hll_distinct``), whose merged sketch
    must stay bit-identical to the batch sketch."""
    from pyspark.sql import functions as F

    h = hash64(value_col)
    bucket = F.pmod(h, F.lit(HLL_M))
    rest = (h - bucket) / F.lit(HLL_M)  # exact: h < 2^60 → /256 integral
    rho = F.lit(HLL_REST_BITS + 1) - F.length(F.bin(rest.cast("long")))
    return bucket, rho


def hll_estimate_from_sketch(per_bucket, group_cols: list[str]):
    """Fold a (group, bkt, max_rho) sketch frame into the estimate —
    the ONE definition of the weight/scale arithmetic (same sharing
    contract as :func:`hll_bucket_rho`)."""
    from pyspark.sql import functions as F

    weight = F.pow(F.lit(2.0), F.lit(HLL_REST_BITS + 1) - F.col("max_rho")).cast(
        "long"
    )
    agg = per_bucket.groupBy(*group_cols).agg(
        F.sum(weight).alias("wsum"), F.count("*").alias("n_buckets")
    )
    scale = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_REST_BITS + 1))
    return agg.select(
        *group_cols,
        (F.lit(scale) / F.col("wsum").cast("double")).alias("approx_distinct"),
        "n_buckets",
    )


def hll_oracle_sql(table: str, group_col: str, value_expr: str) -> str:
    h = hash64_sql(value_expr)
    scale = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_REST_BITS + 1))
    return f"""
WITH hashed AS (
  SELECT {group_col}, {h} AS h FROM {table}
),
bucketed AS (
  SELECT {group_col}, h % {HLL_M} AS bkt,
         {HLL_REST_BITS + 1} - length(bin(CAST((h - h % {HLL_M}) / {HLL_M} AS BIGINT))) AS rho
  FROM hashed
),
maxed AS (
  SELECT {group_col}, bkt, MAX(rho) AS max_rho
  FROM bucketed GROUP BY 1, 2
)
SELECT {group_col},
       {scale!r} / CAST(SUM(CAST(power(2.0, {HLL_REST_BITS + 1} - max_rho) AS BIGINT)) AS DOUBLE)
         AS approx_distinct,
       COUNT(*) AS n_buckets
FROM maxed GROUP BY 1
""".strip()


def hll_merge_demo(df, group_col: str, value_col: str):
    """Sketch MERGEABILITY, demonstrated end-to-end: per-group HLL
    bucket maxima are merged (max-of-max per bucket) into a global
    sketch WITHOUT re-reading the data, and both tiers are estimated
    with the same formula. Merging partial sketches instead of
    rescanning is the entire reason sketches matter at 100 TB — a
    1000-executor job computes per-partition sketches map-side and the
    merge is CMS_D·HLL_M integers per group, not data.

    The merged '__ALL__' row is bit-identical to running the HLL
    directly over the ungrouped input (max is associative), which the
    tests assert.
    """
    from pyspark.sql import functions as F

    h = hash64(F.col(value_col))
    bucket = F.pmod(h, F.lit(HLL_M))
    rest = (h - bucket) / F.lit(HLL_M)
    rho = F.lit(HLL_REST_BITS + 1) - F.length(F.bin(rest.cast("long")))
    per_bucket = (
        df.select(F.col(group_col).alias("grp"), bucket.alias("bkt"), rho.alias("rho"))
        .groupBy("grp", "bkt")
        .agg(F.max("rho").alias("max_rho"))
    )
    merged = (
        per_bucket.groupBy("bkt")
        .agg(F.max("max_rho").alias("max_rho"))
        .select(F.lit("__ALL__").alias("grp"), "bkt", "max_rho")
    )
    unioned = per_bucket.unionByName(merged)
    weight = F.pow(
        F.lit(2.0), F.lit(HLL_REST_BITS + 1) - F.col("max_rho")
    ).cast("long")
    agg = unioned.groupBy("grp").agg(
        F.sum(weight).alias("wsum"), F.count("*").alias("n_buckets")
    )
    scale = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_REST_BITS + 1))
    return agg.select(
        F.col("grp").alias(group_col),
        (F.lit(scale) / F.col("wsum").cast("double")).alias("approx_distinct"),
        "n_buckets",
    )


def hll_merge_oracle_sql(table: str, group_col: str, value_expr: str) -> str:
    h = hash64_sql(value_expr)
    scale = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_REST_BITS + 1))
    return f"""
WITH hashed AS (
  SELECT {group_col} AS grp, {h} AS h FROM {table}
),
bucketed AS (
  SELECT grp, h % {HLL_M} AS bkt,
         {HLL_REST_BITS + 1} - length(bin(CAST((h - h % {HLL_M}) / {HLL_M} AS BIGINT))) AS rho
  FROM hashed
),
maxed AS (
  SELECT grp, bkt, MAX(rho) AS max_rho FROM bucketed GROUP BY 1, 2
),
unioned AS (
  SELECT grp, bkt, max_rho FROM maxed
  UNION ALL
  SELECT '__ALL__' AS grp, bkt, MAX(max_rho) AS max_rho
  FROM maxed GROUP BY bkt
)
SELECT grp AS {group_col},
       {scale!r} / CAST(SUM(CAST(power(2.0, {HLL_REST_BITS + 1} - max_rho) AS BIGINT)) AS DOUBLE)
         AS approx_distinct,
       COUNT(*) AS n_buckets
FROM unioned GROUP BY 1
""".strip()
