"""Similarity-search tests: the Arrow-vectorized Pandas-UDF scorer (the
production hot path at scale) must agree with the order-exact fold
scorer (the oracle tier) within FP tolerance."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from spark_streaming_stream_analyzer_spark import registry
from spark_streaming_stream_analyzer_spark.sources.tables import load_table


def test_pandas_udf_scorer_agrees_with_fold(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings").limit(50).cache()
    q = em.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    pairs = em.crossJoin(F.broadcast(q))

    @pandas_udf("double")
    def cos_np(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.stack(a.to_numpy()).astype(np.float64)
        bv = np.stack(b.to_numpy()).astype(np.float64)
        dots = (av * bv).sum(axis=1)
        return pd.Series(
            dots / (np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1))
        )

    from spark_streaming_stream_analyzer_spark.operators.similarity import _cosine

    both = pairs.select(
        "vec_id",
        cos_np("embedding", "q_emb").alias("np_sim"),
        _cosine(F.col("embedding"), F.col("q_emb")).alias("fold_sim"),
    ).collect()
    for r in both:
        assert math.isclose(r["np_sim"], r["fold_sim"], rel_tol=1e-9, abs_tol=1e-12)


def test_self_similarity_is_one(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings").limit(5)
    from spark_streaming_stream_analyzer_spark.operators.similarity import _cosine

    rows = em.select(
        _cosine(F.col("embedding"), F.col("embedding")).alias("s")
    ).collect()
    for r in rows:
        assert math.isclose(r["s"], 1.0, rel_tol=1e-12)


def test_topk_ranks_are_dense_and_ordered(spark, sf_dir):
    out = registry.QUERIES["sim_topk_cosine"](spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    for q_id, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_kmeans_inertia_descends_and_is_deterministic(spark, sf_dir):
    import spark_streaming_stream_analyzer_spark.operators.similarity as sim
    from pyspark.sql import functions as F

    out1 = sim.sim_kmeans_cells(spark, sf_dir)
    total1 = out1.agg(F.sum("d2"), F.countDistinct("cell"), F.count("*")).collect()[0]
    # every vector assigned, all K cells used at fixture scale
    n_vecs = sim.load_table_cpu(spark, sf_dir, "embeddings").count()
    assert total1[2] == n_vecs
    assert total1[1] == sim.KMEANS_K
    # determinism: a second full run reproduces assignments exactly
    out2 = sim.sim_kmeans_cells(spark, sf_dir)
    d = out1.select("vec_id", "cell").exceptAll(out2.select("vec_id", "cell"))
    assert d.count() == 0
    # inertia after 3 rounds must beat the 1-round assignment
    orig_iters = sim.KMEANS_ITERS
    try:
        sim.KMEANS_ITERS = 1
        first = sim.sim_kmeans_cells(spark, sf_dir)
        total_first = first.agg(F.sum("d2")).collect()[0][0]
    finally:
        sim.KMEANS_ITERS = orig_iters
    assert total1[0] <= total_first + 1e-6


def test_srp_prunes_and_finds_true_neighbors(spark, sf_dir):
    import spark_streaming_stream_analyzer_spark.operators.similarity as sim

    em = sim.load_table_cpu(spark, sf_dir, "embeddings")
    n = em.count()
    srp = registry.QUERIES["sim_srp_topk"](spark, sf_dir).collect()
    # structure: dense ordered ranks per query
    by_q: dict[int, list] = {}
    for r in srp:
        by_q.setdefault(r["q_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # pruning: the reranked candidate set is far smaller than all-pairs
    brute = registry.QUERIES["sim_topk_cosine"](spark, sf_dir).collect()
    assert len(srp) <= len(brute)
    # quality: banded SRP recovers a nonzero share of true top-5 pairs
    truth = {(r["q_id"], r["vec_id"]) for r in brute}
    hits = sum((r["q_id"], r["vec_id"]) in truth for r in srp)
    assert hits > 0, "SRP buckets recovered no true neighbors"
    assert n > 0


def test_quantization_error_bounded_by_half_step(spark, sf_dir):
    out = registry.QUERIES["emb_quantize_int8"](spark, sf_dir)
    import spark_streaming_stream_analyzer_spark.operators.similarity as sim

    em = sim.load_table_cpu(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb_d"),
    )
    qz = sim._quantized(em).select("vec_id", "s")
    joined = {r["vec_id"]: r for r in out.join(qz, "vec_id").collect()}
    for r in joined.values():
        # per-dim rounding error ≤ s/2 → mse ≤ s²/4
        assert r["recon_mse"] <= (r["s"] ** 2) / 4 + 1e-15
        assert -sim.Q_MAX <= r["q_min"] <= r["q_max"] <= sim.Q_MAX


def test_quantized_scores_track_exact_cosine(spark, sf_dir):
    exact = {
        (r["q_id"], r["vec_id"]): r["cos_sim"]
        for r in registry.QUERIES["sim_topk_cosine"](spark, sf_dir).collect()
    }
    quant = registry.QUERIES["sim_quantized_topk"](spark, sf_dir).collect()
    overlap = [(r, exact[(r["q_id"], r["vec_id"])]) for r in quant
               if (r["q_id"], r["vec_id"]) in exact]
    assert overlap, "no overlap between quantized and exact top-k"
    for r, true_cos in overlap:
        assert abs(r["qcos"] - true_cos) < 0.02


def test_kmeans_exact_cells_partition_all_vectors(spark, sf_dir):
    from spark_streaming_stream_analyzer_spark.operators.similarity import (
        KMEANS_K,
        sim_kmeans_exact_cells,
    )
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    rows = sim_kmeans_exact_cells(spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs
    assert {r["vec_id"] for r in rows} == set(range(n_vecs))
    cells = {r["cell"] for r in rows}
    assert cells <= set(range(1, KMEANS_K + 1))
    for r in rows:
        assert r["d2"] >= 0  # exact int64 squared distance
    # determinism: a second run is bit-identical
    again = sim_kmeans_exact_cells(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ivf_exact_topk_shape_and_rank_order(spark, sf_dir):
    from spark_streaming_stream_analyzer_spark.operators.similarity import (
        sim_ivf_exact_topk,
    )

    rows = sim_ivf_exact_topk(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q_id, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r["vec_id"] != q_id for r in rs)


def test_matryoshka_truncated_top1_matches_numpy(spark, sf_dir):
    """Brute-force numpy cross-check of both the full-dim and the
    MRL_DIM-prefix top-1 neighbors (cosine, smaller-vec_id ties)."""
    import numpy as np

    from spark_streaming_stream_analyzer_spark.operators.similarity import (
        MRL_DIM,
        N_QUERIES,
        emb_matryoshka_recall,
    )
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table_cpu

    pdf = load_table_cpu(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).toPandas()
    ids = pdf["vec_id"].to_numpy()
    M = np.stack(pdf["embedding"].map(np.asarray)).astype("float64")

    def top1(mat, qrow, qid):
        cos = (mat @ qrow) / (
            np.linalg.norm(mat, axis=1) * np.linalg.norm(qrow)
        )
        cos[ids == qid] = -np.inf
        best = cos.max()
        return int(ids[cos == best].min())

    got = {r["q_id"]: r for r in emb_matryoshka_recall(spark, sf_dir).collect()}
    assert set(got) == set(range(N_QUERIES))
    for qid in range(N_QUERIES):
        qrow = M[ids == qid][0]
        assert got[qid]["top1_full"] == top1(M, qrow, qid)
        assert got[qid]["top1_trunc"] == top1(
            M[:, :MRL_DIM], qrow[:MRL_DIM], qid
        )
        assert got[qid]["agree"] == (
            got[qid]["top1_full"] == got[qid]["top1_trunc"]
        )


def test_pq_codebook_invariants(spark, sf_dir):
    """PQ code words are in range, total reconstruction error is the
    exact sum of the subspace errors, and every subspace's error is no
    worse than assigning all vectors to the single seed-0 centroid
    (k-means with k=PQ_K must beat k=1)."""
    from spark_streaming_stream_analyzer_spark.operators.similarity import (
        KMEANS_QSCALE,
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
        emb_pq_codebook,
    )
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table_cpu

    rows = emb_pq_codebook(spark, sf_dir).collect()
    n_vecs = load_table_cpu(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs
    for r in rows:
        assert r["total_d2"] == sum(r[f"d2_{m}"] for m in range(PQ_M))
        for m in range(PQ_M):
            assert 1 <= r[f"code{m}"] <= PQ_K
            assert r[f"d2_{m}"] >= 0
    # multiple codebook entries are actually in use per subspace
    for m in range(PQ_M):
        assert len({r[f"code{m}"] for r in rows}) > 1


def test_pq_adc_ranks_are_coherent(spark, sf_dir):
    from spark_streaming_stream_analyzer_spark.operators.similarity import (
        N_QUERIES,
        PQ_ADC_TOPK,
        sim_pq_adc_topk,
    )

    rows = sim_pq_adc_topk(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["q_id"] != r["vec_id"]
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, PQ_ADC_TOPK + 1))
        # ADC distance non-decreasing in rank; ties broken by vec_id
        for a, b in zip(rs, rs[1:]):
            assert (a["adc_d2"], a["vec_id"]) < (b["adc_d2"], b["vec_id"])


def test_pca_power_exact_and_converged(spark, sf_dir):
    """The dataframe power iteration must (a) equal a literal Python
    replay of the integer algorithm bit-for-bit and (b) align with
    numpy's true top eigenvector of the centered covariance."""
    import numpy as np

    from spark_streaming_stream_analyzer_spark.operators import similarity as sim
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table_cpu

    rows = load_table_cpu(spark, sf_dir, "embeddings").select(
        "embedding"
    ).collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Q = np.floor(X * sim.PCA_Q + 0.5).astype(np.int64)
    n = Q.shape[0]
    s = Q.sum(axis=0)
    mu = np.where(s >= 0, s // n, -((-s) // n))
    C = Q - mu
    A = C.T @ C  # exact int64
    v = np.full(64, sim.PCA_V, dtype=np.int64)
    for _ in range(sim.PCA_ITERS):
        u = A @ v
        m = np.abs(u).max()
        d = (m // sim.PCA_V) + 1
        v = np.where(u >= 0, u // d, -((-u) // d))
    got = {r["dim"]: r["v_scaled"] for r in sim.emb_pca_power(spark, sf_dir).collect()}
    assert got == {i + 1: int(v[i]) for i in range(64)}
    # alignment with true float PCA of the same centered matrix
    w, V = np.linalg.eigh((C.astype(np.float64).T @ C))
    top = V[:, np.argmax(w)]
    cos = abs(np.dot(top, v / np.linalg.norm(v)))
    assert cos > 0.99


def test_knn_graph_mutual_vs_brute(spark, sf_dir):
    """Mutual edges must equal a numpy brute-force mutual-kNN with
    the same (cos desc, id) tie-break, and every edge is mutual."""
    import numpy as np

    from spark_streaming_stream_analyzer_spark.operators import similarity as sim
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = [r["vec_id"] for r in rows]
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(M, axis=1)
    keep = nrm > 0
    ids = [i for i, k in zip(ids, keep) if k]
    M, nrm = M[keep], nrm[keep]
    S = (M @ M.T) / np.outer(nrm, nrm)
    topk = {}
    for a, ia in enumerate(ids):
        order = sorted(
            ((S[a, b], ib) for b, ib in enumerate(ids) if ib != ia),
            key=lambda t: (-t[0], t[1]),
        )
        topk[ia] = {ib: r + 1 for r, (_, ib) in enumerate(order[: sim.KNN_K])}
    expect = set()
    for ia in ids:
        for ib, r_uv in topk[ia].items():
            if ia < ib and ia in topk[ib]:
                expect.add((ia, ib, r_uv, topk[ib][ia]))
    got = {
        (r["u"], r["v"], r["rank_uv"], r["rank_vu"])
        for r in sim.emb_knn_graph(spark, sf_dir).collect()
    }
    assert got == expect
    assert got  # mutual edges exist on the fixture


def test_knn_srp_graph_oracle_and_recall(spark, sf_dir):
    """The SRP-banded mutual-kNN graph (the scale-safe registered form
    of the exact census, VERDICT r6 item 4) matches its DuckDB oracle
    exactly, every edge it emits is a true candidate pair with the
    exact fold-cosine, and its edge recall vs the exact twin clears a
    floor at fixture scale (LSH is lossy by design; 0.5 is the
    quality bar that makes the graph useful, measured 0.70 at
    sf0.001/0.01 with 32 planes x 8 bands)."""
    import duckdb

    from spark_streaming_stream_analyzer_spark.operators import similarity as sim

    sdf = sim.emb_knn_srp_graph(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    odf = con.execute(sim.EMB_KNN_SRP_SQL).df()

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        out = df.copy()
        for c in out.columns:
            out[c] = out[c].map(repr)
        return out.sort_values(by=list(out.columns)).reset_index(drop=True)

    assert canon(sdf).equals(canon(odf))
    exact = sim.emb_knn_graph(spark, sf_dir).toPandas()
    e_edges = set(zip(exact.u, exact.v))
    s_edges = set(zip(sdf.u, sdf.v))
    assert e_edges  # fixture produces mutual edges
    recall = len(e_edges & s_edges) / len(e_edges)
    assert recall >= 0.5, f"SRP kNN edge recall {recall:.3f} below floor"
    # every SRP edge's cosine agrees exactly with the exact twin's
    # score for that pair (the re-rank is exact; only candidate
    # GENERATION is approximate)
    exact_cos = {(u, v): c for u, v, c in zip(exact.u, exact.v, exact.cos_sim)}
    for u, v, c in zip(sdf.u, sdf.v, sdf.cos_sim):
        if (u, v) in exact_cos:
            assert c == exact_cos[(u, v)]


def test_class_centroids_vs_numpy(spark, sf_dir):
    import numpy as np

    from spark_streaming_stream_analyzer_spark.operators import similarity as sim
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").select(
        "label", "embedding"
    ).collect()
    by_l = {}
    for r in rows:
        by_l.setdefault(r["label"], []).append(r["embedding"])
    expect = {}
    for lbl, vecs in by_l.items():
        q = np.array([
            [float(np.sign(x) * np.floor(abs(float(x)) * sim.CENTROID_Q + 0.5))
             for x in v]
            for v in vecs
        ], dtype=np.int64)
        s = q.sum(axis=0)
        n = len(vecs)
        for d in range(q.shape[1]):
            sq = int(s[d])
            cen = sq // n if sq >= 0 else -((-sq) // n)
            expect[(lbl, d)] = (n, sq, cen)
    got = {
        (r["label"], r["dim"]): (r["n_vecs"], r["sum_q"], r["centroid_q"])
        for r in sim.emb_class_centroids(spark, sf_dir).collect()
    }
    assert got == expect


def test_class_outliers_are_farthest(spark, sf_dir):
    """Every reported outlier's quantized distance must match a direct
    recomputation against the op's own centroids, and nothing omitted
    ranks farther."""
    from spark_streaming_stream_analyzer_spark.operators import similarity as sim
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    cen = {}
    for r in sim.emb_class_centroids(spark, sf_dir).collect():
        cen.setdefault(r["label"], {})[r["dim"]] = r["centroid_q"]
    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    dists = {}
    for r in rows:
        c = cen[r["label"]]
        d2 = 0
        import math

        for d, x in enumerate(r["embedding"]):
            xf = float(x) * sim.CENTROID_Q
            q = int(math.copysign(math.floor(abs(xf) + 0.5), xf))
            d2 += (q - c[d]) ** 2
        dists.setdefault(r["label"], []).append((d2, r["vec_id"]))
    expect = set()
    for lbl, ds in dists.items():
        ds.sort(key=lambda t: (-t[0], t[1]))
        for rnk, (d2, vid) in enumerate(ds[: sim.OUTLIER_TOPK], 1):
            expect.add((lbl, vid, d2, rnk))
    got = {
        (r["label"], r["vec_id"], r["dist2_q"], r["rnk"])
        for r in sim.emb_class_outliers(spark, sf_dir).collect()
    }
    assert got == expect


def test_centroid_confusion_vs_brute(spark, sf_dir):
    import math

    from spark_streaming_stream_analyzer_spark.operators import similarity as sim
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    cen = {}
    for r in sim.emb_class_centroids(spark, sf_dir).collect():
        cen.setdefault(r["label"], {})[r["dim"]] = r["centroid_q"]
    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    conf = {}
    for r in rows:
        qv = [
            int(math.copysign(
                math.floor(abs(float(x) * sim.CENTROID_Q) + 0.5), float(x)
            ))
            for x in r["embedding"]
        ]
        best = None
        for lbl in sorted(cen):
            d2 = sum((q - cen[lbl][d]) ** 2 for d, q in enumerate(qv))
            if best is None or d2 < best[0]:
                best = (d2, lbl)
        conf[(r["label"], best[1])] = conf.get((r["label"], best[1]), 0) + 1
    totals = {}
    for (lbl, _), n in conf.items():
        totals[lbl] = totals.get(lbl, 0) + n
    expect = {
        (lbl, p): (n, totals[lbl], (n * 1_000_000) // totals[lbl])
        for (lbl, p), n in conf.items()
    }
    got = {
        (r["label"], r["pred"]): (r["n"], r["label_total"], r["share_ppm"])
        for r in sim.emb_nearest_centroid_confusion(spark, sf_dir).collect()
    }
    assert got == expect
    # the diagonal should carry real mass (prototypes aren't noise)
    diag = sum(n for (l, p), (n, _, _) in got.items() if l == p)
    assert diag >= len(rows) // 4


def test_class_separation_identity(spark, sf_dir):
    """sum_dist2 must equal the direct sum over members against the
    op's own centroids, and mean-pairwise identity bounds hold."""
    from spark_streaming_stream_analyzer_spark.operators import similarity as sim

    coh = {r["label"]: r for r in
           sim.emb_class_separation(spark, sf_dir).collect()}
    outl = sim.emb_class_outliers(spark, sf_dir).collect()
    # outliers' distances are drawn from the same metric: every
    # reported outlier dist2 must be <= its class's total
    for r in outl:
        assert r["dist2_q"] <= coh[r["label"]]["sum_dist2"]
    for lbl, r in coh.items():
        assert r["mean_dist2"] == r["sum_dist2"] // r["n_vecs"]
        assert r["n_vecs"] > 0 and r["sum_dist2"] >= 0


def test_dim_variance_vs_numpy(spark, sf_dir):
    import math

    import numpy as np

    from spark_streaming_stream_analyzer_spark.operators import similarity as sim
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    M = np.array([
        [int(math.copysign(math.floor(abs(float(x) * sim.CENTROID_Q) + 0.5),
                           float(x)))
         for x in r["embedding"]]
        for r in rows
    ], dtype=object)
    n = len(rows)
    expect = {}
    for d in range(M.shape[1]):
        col = [int(v) for v in M[:, d]]
        s = sum(col)
        qq = sum(v * v for v in col)
        expect[d] = n * qq - s * s
    order = sorted(expect, key=lambda d: (-expect[d], d))
    ranks = {d: i + 1 for i, d in enumerate(order)}
    got = {
        r["dim"]: (r["n"], r["var_n2"], r["var_rank"])
        for r in sim.emb_dim_variance(spark, sf_dir).collect()
    }
    assert got == {d: (n, expect[d], ranks[d]) for d in expect}


def test_distance_histogram_vs_numpy(spark, sf_dir):
    import hashlib

    import numpy as np

    from spark_streaming_stream_analyzer_spark.operators import similarity as sim
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = [r["vec_id"] for r in rows]
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(M, axis=1)

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    from collections import Counter

    counts = Counter()
    for i, a in enumerate(ids):
        for j, b in enumerate(ids):
            if a >= b or nrm[i] == 0 or nrm[j] == 0:
                continue
            if h64(f"dh#{a}#{b}") % sim.DIST_SAMPLE_MOD != 0:
                continue
            cos = float(M[i] @ M[j] / (nrm[i] * nrm[j]))
            bucket = min(
                max(int(np.floor((cos + 1.0) * sim.DIST_BUCKETS / 2)), 0),
                sim.DIST_BUCKETS - 1,
            )
            counts[bucket] += 1
    total = sum(counts.values())
    got = {
        r["bucket"]: (r["n_pairs"], r["share_ppm"])
        for r in sim.emb_distance_histogram(spark, sf_dir).collect()
    }
    assert got == {
        b: (n, (n * 1_000_000) // total) for b, n in counts.items()
    }


def test_knn_srp_bucket_cap_samples_not_drops(spark, sf_dir, monkeypatch):
    """The binding regime the whole-bucket quarantine got wrong: with
    only 2^KNNG_BAND_BITS = 16 bucket values per band, every bucket
    outgrows any fixed cap as the corpus grows, so dropping hot
    buckets silently EMPTIED the graph beyond ~4k vectors (measured:
    0 of 128 buckets survived at the 10x replica). The fix samples a
    deterministic hash-ordered top-CAP within each bucket. Forcing
    the cap down to 16 at fixture scale (max bucket 56) exercises the
    sampling path: the graph must stay non-empty and the DuckDB
    oracle (re-capped the same way) must still match bit-for-bit."""
    import re

    import duckdb

    from spark_streaming_stream_analyzer_spark.operators import similarity as sim

    orig_cap = sim.KNNG_BUCKET_CAP  # the value the SQL text embeds
    monkeypatch.setattr(sim, "KNNG_BUCKET_CAP", 16)
    sdf = sim.emb_knn_srp_graph(spark, sf_dir).toPandas()
    assert len(sdf) > 0  # sampled buckets still produce a graph

    sql = re.sub(
        rf"WHERE r <= {orig_cap}\b", "WHERE r <= 16", sim.EMB_KNN_SRP_SQL
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    odf = con.execute(sql).df()

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        out = df.copy()
        for c in out.columns:
            out[c] = out[c].map(repr)
        return out.sort_values(by=list(out.columns)).reset_index(drop=True)

    assert canon(sdf).equals(canon(odf))
