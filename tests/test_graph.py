"""Graph-operator tests (operators/graph.py)."""

from __future__ import annotations

from spark_streaming_stream_analyzer_spark.operators import graph as gr


def _py_pagerank(edges, iters=gr.PR_ITERS):
    """Reference fold of the exact-integer PageRank."""
    und = set()
    for s, d in edges:
        und.add((s, d))
        und.add((d, s))
    deg: dict[str, int] = {}
    for s, _ in und:
        deg[s] = deg.get(s, 0) + 1
    r = {n: gr.PR_UNIT for n in deg}
    for _ in range(iters):
        nxt = {n: gr.PR_BASE for n in deg}
        for s, d in und:
            nxt[d] += (r[s] * 85) // (100 * deg[s])
        r = nxt
    return r


def test_pagerank_planted_graph(spark):
    rows = [(1, 1), (2, 1), (3, 2), (3, 1)]
    df = spark.createDataFrame(rows, "l_partkey long, l_suppkey long")
    orig = gr.load_table
    gr.load_table = lambda *_: df
    try:
        got = {
            r["node"]: r["rank_units"]
            for r in gr.graph_pagerank_exact(spark, "x").collect()
        }
    finally:
        gr.load_table = orig
    edges = [(f"p{p}", f"s{s}") for p, s in rows]
    expect = _py_pagerank(edges)
    assert got == expect  # exact integer equality, node for node
    # hub s1 (degree 3) outranks the leaf suppliers
    assert got["s1"] == max(got.values())


def test_degree_histogram_consistency(spark, sf_dir):
    rows = gr.graph_degree_histogram(spark, sf_dir).collect()
    assert {r["kind"] for r in rows} == {"p", "s"}
    # node-count parity with pagerank output
    n_nodes = sum(r["n_nodes"] for r in rows)
    pr = gr.graph_pagerank_exact(spark, sf_dir).collect()
    assert len(pr) == n_nodes
