"""Graph analytics over relational data: the part↔supplier bipartite
graph implied by lineitem, processed with the iterate-as-dataframe
pattern (each round = join + aggregate), the same shape
``dedup.dedup_cluster_keep`` uses for connected components.

PageRank here is EXACT-INTEGER: ranks live in 1e-12 "rank units"
(int64) and every contribution is an integer floor-divide, so a fixed
iteration count is bit-reproducible on any engine — which makes an
iterative algorithm fully value-oracled (the oracle unrolls the same
three iterations as plain CTEs). Classic float PageRank can only ever
be rows-only checked; this is the portable formulation.

Scale: each iteration shuffles (node, contribution) pairs — the
standard PageRank join+agg; degree rides along pre-joined. 100 TB
graphs add nothing structurally new, only more partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

PR_ITERS = 3
PR_UNIT = 1_000_000_000_000          # 1.0 in rank units
PR_BASE = 150_000_000_000            # (1 - 0.85) * PR_UNIT


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected part↔supplier edges, both directions, distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()
    return e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def graph_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration damped PageRank (d = 0.85) in exact int64 rank
    units over the part↔supplier graph. Every node starts at 1.0
    (= 1e12 units); per iteration each node contributes
    floor(rank·85 / (100·outdegree)) along every out-edge and
    collects 0.15 + damped inflow. Undirected construction ⇒ no
    dangling mass."""
    edges = _edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ed = edges.join(deg, "src").localCheckpoint(eager=False)
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(PR_UNIT).cast("long").alias("r")
    )
    for _ in range(PR_ITERS):
        ranks = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", F.expr("(r * 85) DIV (100 * d)").alias("contrib"))
            .groupBy(F.col("dst").alias("node"))
            .agg((F.lit(PR_BASE) + F.sum("contrib")).alias("r"))
        )
    return ranks.select(
        "node",
        F.col("r").alias("rank_units"),
        (F.col("r").cast("double") / F.lit(float(PR_UNIT))).alias("rank"),
    )


_EDGES_SQL = """
e0 AS (
  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM lineitem
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1)
"""

_PR_ITER_SQL = """
{out} AS (
  SELECT e.dst AS node,
         CAST({base} + SUM((r.r * 85) // (100 * d.d)) AS BIGINT) AS r
  FROM edges e
  JOIN {prev} r ON e.src = r.node
  JOIN deg d ON e.src = d.src
  GROUP BY 1
)"""

GRAPH_PAGERANK_SQL = (
    "WITH "
    + _EDGES_SQL.strip()
    + ",\nr0 AS (SELECT src AS node, CAST({u} AS BIGINT) AS r FROM deg)".format(
        u=PR_UNIT
    )
    + ","
    + ",".join(
        _PR_ITER_SQL.format(out=f"it{i + 1}", prev=f"it{i}" if i else "r0",
                            base=PR_BASE)
        for i in range(PR_ITERS)
    )
    + f"""
SELECT node, r AS rank_units, CAST(r AS DOUBLE) / {float(PR_UNIT)} AS rank
FROM it{PR_ITERS}
"""
)


def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part↔supplier graph split by node
    kind — the first diagnostic run on any large graph (hub detection,
    skew planning for the joins above). Two hash-aggs."""
    deg = _edges(spark, sf_dir).groupBy("src").agg(F.count("*").alias("d"))
    return (
        deg.select(F.substring("src", 1, 1).alias("kind"), "d")
        .groupBy("kind", "d")
        .agg(F.count("*").alias("n_nodes"))
    )


GRAPH_DEGREE_SQL = f"""
WITH {_EDGES_SQL.strip()}
SELECT substr(src, 1, 1) AS kind, d, COUNT(*) AS n_nodes
FROM deg GROUP BY 1, 2
"""
