"""Packing / sampling / mixture tests (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_stream_analyzer_spark.operators import packing as pk


def test_pack_bins_planted(spark):
    # 5-token docs, budget 2048 → bins flip every ceil(2048/5)=410 docs
    orig = pk.load_table_cpu
    rows = [(i, "t1 t2 t3 t4 t5", "s") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pk.load_table_cpu = lambda *_: df
    try:
        out = {r["bin"]: r for r in pk.pack_token_budget(spark, "x").collect()}
    finally:
        pk.load_table_cpu = orig
    # 900 docs * 5 tok = 4500 tokens → bins 0,1,2 (offsets 0..4495)
    assert set(out) == {0, 1, 2}
    assert sum(r["n_docs"] for r in out.values()) == 900
    assert sum(r["sum_tokens"] for r in out.values()) == 4500
    # bin 0 holds docs whose start offset < 2048: docs 0..409
    assert out[0]["n_docs"] == 410 and out[0]["first_doc"] == 0
    assert out[0]["last_doc"] == 409
    assert out[1]["first_doc"] == 410  # contiguous, no gaps
    assert out[2]["last_doc"] == 899


def test_rebalance_caps_large_classes(spark, sf_dir):
    rows = pk.sample_rebalance(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_orig"]
        if r["n_orig"] <= pk.REBALANCE_CAP // 2:
            # far under the cap: probability 1 region keeps everything
            assert r["n_kept"] == r["n_orig"]
        if r["n_orig"] >= 4 * pk.REBALANCE_CAP:
            # far over: kept count concentrates near the cap (binomial
            # with mean CAP; 4 sigma slack)
            assert r["n_kept"] < 2 * pk.REBALANCE_CAP


def test_weighted_sample_prefers_long_docs(spark):
    # two equal-count sources, one with 10x longer docs -> its kept
    # count and kept mass must dominate
    orig = pk.load_table_cpu
    rows = [(i, "a", "short", 50) for i in range(500)] + [
        (i + 500, "a", "long", 500) for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    pk.load_table_cpu = lambda *_: df
    try:
        out = {r["source"]: r for r in pk.sample_weighted(spark, "x").collect()}
    finally:
        pk.load_table_cpu = orig
    assert out["long"]["n_kept"] > 3 * max(out["short"]["n_kept"], 1)
    # expected total ~ WEIGHTED_K; allow binomial spread
    total = out["long"]["n_kept"] + out["short"]["n_kept"]
    assert 0.5 * pk.WEIGHTED_K < total < 1.6 * pk.WEIGHTED_K


def test_mixture_shares_sum_to_one(spark, sf_dir):
    rows = pk.corpus_mixture_stats(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-9
    assert max(r["weight_rel"] for r in rows) == 1.0  # largest source
    for r in rows:
        # sqrt damping: rel weight >= raw share ratio for sub-max sources
        assert 0 < r["weight_rel"] <= 1.0


def test_temperature_mixture_quotas_sum_to_target(spark, sf_dir):
    """Largest-remainder apportionment: quotas sum EXACTLY to the
    target, are each within 1 of the ideal real-valued share, and the
    sqrt temperature compresses shares (small sources get more than
    their raw proportion, large sources less)."""
    import math

    from spark_streaming_stream_analyzer_spark.operators.packing import (
        MIX_TARGET,
        sample_temperature_mixture,
    )

    rows = sample_temperature_mixture(spark, sf_dir).collect()
    assert sum(r["quota"] for r in rows) == MIX_TARGET
    W = sum(r["w"] for r in rows)
    n_tot = sum(r["n_docs"] for r in rows)
    for r in rows:
        ideal = MIX_TARGET * r["w"] / W
        assert math.floor(ideal) <= r["quota"] <= math.floor(ideal) + 1
        assert r["n_taken"] == min(r["quota"], r["n_docs"])
        # temperature compression: quota share vs raw doc share
        raw_share = r["n_docs"] / n_tot
        q_share = r["quota"] / MIX_TARGET
        if raw_share < 1 / len(rows):
            assert q_share >= raw_share - 1 / MIX_TARGET


def test_reservoir_group_matches_hash_rank_brute(spark, sf_dir):
    """Two-phase top-k must equal the single-pass hash ranking."""
    import hashlib

    from spark_streaming_stream_analyzer_spark.operators import packing as pk

    docs = pk.load_table_cpu(spark, sf_dir, "documents").select(
        "source", "doc_id"
    ).collect()

    def key(doc_id):
        return int(
            hashlib.md5(f"rsv:{doc_id}".encode()).hexdigest()[:15], 16
        )

    by_src = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    expect = {}
    for s, ids in by_src.items():
        ranked = sorted(ids, key=lambda d: (key(d), d))[: pk.RSV_K]
        for i, d in enumerate(ranked, start=1):
            expect[(s, d)] = i
    got = {
        (r["source"], r["doc_id"]): r["rk"]
        for r in pk.sample_reservoir_group(spark, sf_dir).collect()
    }
    assert got == expect
    # every full group contributes exactly RSV_K rows
    for s, ids in by_src.items():
        assert sum(1 for (src, _) in got if src == s) == min(
            pk.RSV_K, len(ids)
        )


def test_gini_matches_brute_and_bounds(spark, sf_dir):
    from spark_streaming_stream_analyzer_spark.operators import packing as pk

    docs = pk.load_table_cpu(spark, sf_dir, "documents").select(
        "source", "text"
    ).collect()
    per = {}
    for r in docs:
        per[r["source"]] = per.get(r["source"], 0) + len(
            [w for w in r["text"].split(" ") if w]
        )
    toks = sorted(per.items(), key=lambda kv: (kv[1], kv[0]))
    k = len(toks)
    tot = sum(v for _, v in toks)
    gini = (
        2 * sum((i + 1) * v for i, (_, v) in enumerate(toks)) * 1_000_000
        // (k * tot)
    ) - ((k + 1) * 1_000_000 // k)
    row = pk.corpus_contrib_gini(spark, sf_dir).collect()[0]
    assert (row["n_sources"], row["total_tokens"], row["gini_ppm"]) == (
        k, tot, gini,
    )
    assert 0 <= row["gini_ppm"] < 1_000_000


def test_length_buckets_vs_brute(spark, sf_dir):
    from spark_streaming_stream_analyzer_spark.operators import packing as pk

    docs = pk.load_table_cpu(spark, sf_dir, "documents").select(
        "text"
    ).collect()
    buckets = {}
    for r in docs:
        n = len([w for w in r["text"].split(" ") if w])
        b = 1 if n <= 1 else 1 << (n - 1).bit_length()
        c, s = buckets.get(b, (0, 0))
        buckets[b] = (c + 1, s + n)
    got = {
        r["bucket"]: (
            r["n_docs"], r["real_tokens"], r["padded_tokens"], r["waste_ppm"]
        )
        for r in pk.pack_length_buckets(spark, sf_dir).collect()
    }
    for b, (c, s) in buckets.items():
        pad = c * b
        assert got[b] == (c, s, pad, (pad - s) * 1_000_000 // pad)
    assert set(got) == set(buckets)
    # buckets are powers of two
    assert all(b & (b - 1) == 0 for b in got)


def test_pareto_8020_vs_brute(spark, sf_dir):
    from spark_streaming_stream_analyzer_spark.operators import packing as pk
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "text"
    ).collect()
    by_s = {}
    for r in rows:
        tok = len([t for t in r["text"].split(" ") if t])
        by_s.setdefault(r["source"], []).append((tok, r["doc_id"]))
    expect = {}
    for s, docs in by_s.items():
        docs.sort(key=lambda t: (-t[0], t[1]))
        total = sum(t for t, _ in docs)
        cum = 0
        k80 = None
        for i, (t, _) in enumerate(docs, 1):
            cum += t
            if cum * 5 >= total * 4:
                k80 = i
                break
        expect[s] = (
            len(docs), total, k80, (k80 * 1_000_000) // len(docs)
        )
    got = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["k80"], r["k80_ppm"])
        for r in pk.agg_pareto_8020(spark, sf_dir).collect()
    }
    assert got == expect


def test_epoch_shuffle_permutations_differ_and_reproduce(spark, sf_dir):
    from spark_streaming_stream_analyzer_spark.operators import packing as pk

    rows1 = {r["epoch"]: (r["n_docs"], r["perm_checksum"], r["head_docs"])
             for r in pk.pack_epoch_shuffle(spark, sf_dir).collect()}
    rows2 = {r["epoch"]: (r["n_docs"], r["perm_checksum"], r["head_docs"])
             for r in pk.pack_epoch_shuffle(spark, sf_dir).collect()}
    assert rows1 == rows2 and len(rows1) == pk.EPOCHS_N
    # all epochs cover the same corpus but in different orders
    assert len({v[0] for v in rows1.values()}) == 1
    assert len({v[1] for v in rows1.values()}) == pk.EPOCHS_N
    assert len({v[2] for v in rows1.values()}) == pk.EPOCHS_N
