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


def _cc_brute(edges):
    """Union-find components of an undirected edge list."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_vs_union_find(spark, sf_dir):
    """The dataframe fixpoint must agree with a driver-side union-find
    over the same edge list, component for component."""
    edges = [
        (r["src"], r["dst"]) for r in gr._cc_edges(spark, sf_dir).collect()
    ]
    comp = _cc_brute(edges)
    expect: dict[int, int] = {}
    for n, c in comp.items():
        expect[c] = expect.get(c, 0) + 1
    got = {
        r["component"]: r["n_nodes"]
        for r in gr.graph_connected_components(spark, sf_dir).collect()
    }
    assert got == expect
    # component label is its minimum member, so every label is a member
    assert all(c in comp and comp[c] == c for c in got)


def test_connected_components_planted(spark):
    # two orders: custs {1,2} share part 7; cust 3 alone on part 9 ->
    # components {2,4,15} and {6,19}
    li = spark.createDataFrame(
        [(100, 7, 50.0), (101, 7, 50.0), (102, 9, 50.0)],
        "l_orderkey long, l_partkey long, l_quantity double",
    )
    od = spark.createDataFrame(
        [(100, 1), (101, 2), (102, 3)], "o_orderkey long, o_custkey long"
    )
    orig = gr.load_table
    gr.load_table = lambda _s, _d, name: {"lineitem": li, "orders": od}[name]
    try:
        rows = {
            r["component"]: (r["n_nodes"], r["n_customers"], r["n_parts"])
            for r in gr.graph_connected_components(spark, "x").collect()
        }
    finally:
        gr.load_table = orig
    assert rows == {2: (3, 2, 1), 6: (2, 1, 1)}


def _tri_brute(pairs):
    und = set()
    for a, b in pairs:
        und.add((a, b))
        und.add((b, a))
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
    tri = 0
    for a, b in und:
        if a < b:
            tri += sum(1 for c in adj[a] & adj[b] if c > b)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    return len(adj), len(und) // 2, wedges, tri


def test_triangle_count_vs_brute(spark, sf_dir):
    pairs = [
        (r["u"], r["v"]) for r in gr._copurchase_edges(spark, sf_dir).collect()
    ]
    n, e, w, t = _tri_brute(pairs)
    row = gr.graph_triangle_count(spark, sf_dir).collect()[0]
    assert (
        row["n_nodes"],
        row["n_edges"],
        row["n_wedges"],
        row["n_triangles"],
    ) == (n, e, w, t)
    assert row["clustering_ppm"] == 3 * t * 1_000_000 // w


def test_bfs_distances_vs_brute(spark, sf_dir):
    from collections import deque

    edges = {}
    for r in gr._cc_edges(spark, sf_dir).collect():
        edges.setdefault(r["src"], []).append(r["dst"])
    comp = _cc_brute(
        [(s, d) for s, ds in edges.items() for d in ds]
    )
    seeds = sorted({c for c in comp.values()})
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        n = q.popleft()
        for m in edges.get(n, []):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    expect = {}
    for n, d in dist.items():
        e = expect.setdefault(d, [0, n, n])
        e[0] += 1
        e[1] = min(e[1], n)
        e[2] = max(e[2], n)
    got = {
        r["dist"]: [r["n_nodes"], r["min_node"], r["max_node"]]
        for r in gr.graph_bfs_distances(spark, sf_dir).collect()
    }
    assert got == {d: list(v) for d, v in expect.items()}
    assert max(got) >= 2  # layered structure, not just seeds+neighbors
