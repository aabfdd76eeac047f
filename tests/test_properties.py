"""Property tests (SURVEY.md §5.2.3): randomized inputs checking the
algebraic contracts the engine depends on at scale — partition
additivity of the exact stats (partial/final merge), and the MinHash
estimator's accuracy envelope against known Jaccard overlap."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_streaming_stream_analyzer_spark.operators.stats import (
    running_stats,
    seeded_stats_merge,
)

two_dec = st.integers(min_value=-10_000_00, max_value=10_000_00).map(
    lambda c: c / 100.0
)


@settings(max_examples=8, deadline=None)
@given(st.lists(two_dec, min_size=1, max_size=40), st.integers(0, 3))
def test_stats_split_additivity(spark, values, salt):
    """Any split of the rows into phases must merge to the single-pass
    answer bit-for-bit (integer-cents associativity)."""
    rows = [
        Row(k="g", v=v, phase=(i + salt) % 3) for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, schema="k string, v double, phase int")
    single = running_stats(df, "k", "v").collect()[0]
    merged = seeded_stats_merge(df, "k", "v", F.col("phase")).collect()[0]
    assert merged["summer"] == single["summer"]          # exact, not approx
    assert merged["counter"] == single["counter"]
    assert merged["sumsqr"] == single["sumsqr"]
    assert merged["bestmin"] == single["bestmin"]
    assert merged["bestmax"] == single["bestmax"]
    assert merged["mean"] == single["mean"]


def _docs_with_overlap(n_shared: int, n_only: int) -> list[Row]:
    shared = [f"shared{i:03d}" for i in range(n_shared)]
    a = shared + [f"aonly{i:03d}" for i in range(n_only)]
    b = shared + [f"bonly{i:03d}" for i in range(n_only)]
    return [
        Row(doc_id=1, text=" ".join(a)),
        Row(doc_id=2, text=" ".join(b)),
    ]


def test_minhash_estimate_tracks_true_jaccard(spark):
    """est_jaccard must sit within ~3 sigma (sigma = sqrt(J(1-J)/32))
    of the true 3-gram Jaccard for strongly overlapping docs. Word
    overlap translates to shingle overlap minus boundary effects, so
    truth is computed on the actual shingle sets."""
    import spark_streaming_stream_analyzer_spark.operators.dedup as dd

    # (shared, distinct) word counts: the first case sits at J ~ 0.9
    # where the 8x4 banding scheme's miss probability is ~(1-J^4)^8
    # ~ 2e-4 -> surfacing is REQUIRED; the second at J ~ 0.65 where a
    # miss is a legitimate LSH outcome (p ~ 0.2) -> accuracy is
    # checked only if the pair surfaces.
    for n_shared, n_only, must_surface in [(60, 2, True), (60, 15, False)]:
        df = spark.createDataFrame(_docs_with_overlap(n_shared, n_only))
        orig = dd.load_table_cpu
        try:
            dd.load_table_cpu = lambda s, d, n: df  # noqa: ARG005
            sh = {
                (r["doc_id"], r["shingle"])
                for r in dd._shingles(spark, "x").collect()
            }
            s1 = {s for d, s in sh if d == 1}
            s2 = {s for d, s in sh if d == 2}
            true_j = len(s1 & s2) / len(s1 | s2)
            pairs = dd.dedup_minhash_lsh(spark, "x").collect()
        finally:
            dd.load_table_cpu = orig
        sigma = math.sqrt(true_j * (1 - true_j) / dd.SIG_N) or 0.05
        if must_surface:
            assert pairs, f"pair with J={true_j:.2f} not surfaced by LSH"
        for r in pairs:
            est = r["est_jaccard"]
            assert abs(est - true_j) <= 3 * sigma + 1e-9, (
                f"est {est:.3f} vs true {true_j:.3f}"
            )


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's core property: documents sharing a contiguous run of
    >= W+2 words share at least one fingerprint, regardless of where
    the run sits in each document."""
    import spark_streaming_stream_analyzer_spark.operators.textstats as ts

    shared = " ".join(f"common{i:02d}" for i in range(ts.WINNOW_W + 2))
    rows = [
        Row(doc_id=1, text=f"alpha beta {shared} gamma delta"),
        Row(doc_id=2, text=f"{shared} zeta eta theta iota kappa"),
        Row(doc_id=3, text="entirely different words with no overlap at all"),
    ]
    df = spark.createDataFrame(rows)
    # doc_winnowing reads via the keyed loader (round-12 DOCKEY
    # identity contract), so that's the symbol to stub
    orig = ts.load_documents_keyed
    try:
        ts.load_documents_keyed = lambda s, d, **_: df  # noqa: ARG005
        fp = ts.doc_winnowing(spark, "x").collect()
    finally:
        ts.load_documents_keyed = orig
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2], "shared run produced no shared fingerprint"
    assert not (by_doc[1] & by_doc[3])


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=60,
    )
)
def test_session_window_matches_manual_islands(spark, rows):
    """Spark's session_window against an independent gaps-and-islands
    fold in plain Python: same sessions, bounds, and counts for
    arbitrary (user, second-offset) event sets. Gap = 300 s."""
    from pyspark.sql import functions as F

    gap = 300
    df = spark.createDataFrame(
        [Row(u=u, ts_us=(s * 1_000_000)) for u, s in rows],
        schema="u int, ts_us long",
    )
    got = {
        (r["u"], r["start_us"], r["end_us"]): r["n"]
        for r in df.select("u", F.timestamp_micros("ts_us").alias("t"))
        .groupBy("u", F.session_window("t", f"{gap} seconds"))
        .agg(F.count("*").alias("n"))
        .select(
            "u",
            F.unix_micros("session_window.start").alias("start_us"),
            F.unix_micros("session_window.end").alias("end_us"),
            F.col("n"),
        )
        .collect()
    }
    # manual islands
    exp = {}
    by_user = {}
    for u, s in rows:
        by_user.setdefault(u, []).append(s * 1_000_000)
    gap_us = gap * 1_000_000
    for u, tss in by_user.items():
        tss.sort()
        start = prev = tss[0]
        n = 0
        for t in tss:
            if t - prev > gap_us:
                exp[(u, start, prev + gap_us)] = n
                start, n = t, 0
            n += 1
            prev = t
        exp[(u, start, prev + gap_us)] = n
    assert got == exp


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
    st.integers(1, 3),
)
def test_pack_binning_matches_python_fold(spark, tok_counts, n_sources):
    """pack_token_budget must equal the sequential concat-then-chunk
    fold for any token-length layout: contiguous doc ranges per bin,
    bins keyed by first-token offset, totals preserved."""
    from spark_streaming_stream_analyzer_spark.operators import packing as pk

    rows = [
        (i, " ".join(f"t{j}" for j in range(n)), f"s{i % n_sources}")
        for i, n in enumerate(tok_counts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    orig = pk.load_table_cpu
    pk.load_table_cpu = lambda *_: df
    try:
        got = {
            (r["source"], r["bin"]): (r["n_docs"], r["sum_tokens"], r["first_doc"], r["last_doc"])
            for r in pk.pack_token_budget(spark, "x").collect()
        }
    finally:
        pk.load_table_cpu = orig
    expect: dict = {}
    per_src: dict = {}
    for i, n in enumerate(tok_counts):
        src = f"s{i % n_sources}"
        off = per_src.get(src, 0)
        b = off // pk.PACK_BUDGET
        nd, tok, fd, ld = expect.get((src, b), (0, 0, i, i))
        expect[(src, b)] = (nd + 1, tok + n, min(fd, i), max(ld, i))
        per_src[src] = off + n
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(min_value=-50_000, max_value=50_000),
                min_size=3, max_size=120))
def test_hist_median_error_bound(spark, cents_vals):
    """approx_median_hist's estimate is within one bin width of the
    true median for arbitrary value layouts (the sketch's contract)."""
    from spark_streaming_stream_analyzer_spark.operators import auditing as au

    rows = [(0, 0, "e", c / 100.0, "{}") for c in cents_vals]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, props string"
    )
    # auditing.load_table serves events; ts column unused by the op?
    # it is not selected, so a ts-less frame is fine
    orig = au.load_table
    au.load_table = lambda *_: df
    try:
        got = au.approx_median_hist(spark, "x").collect()[0]
    finally:
        au.load_table = orig
    svals = sorted(cents_vals)
    true_med = svals[(len(svals) - 1) // 2]  # lower median
    w = (max(cents_vals) - min(cents_vals)) // au.HIST_BINS + 1
    assert abs(got["approx_median"] * 100 - true_med) <= w + 0.51
    assert got["n"] == len(cents_vals)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1,
             max_size=60),
    st.integers(min_value=0, max_value=200),
)
def test_cusum_prefix_min_identity(ds, k):
    """The window identity s_t = cum_t − min(0, min prefix cum) must
    equal Page's recursion s_t = max(0, s_{t-1} + d_t) for ANY
    integer drift sequence — the algebra both ts_cusum_alarm and
    stream_cusum_alarm stand on. (Pure python: no Spark session.)"""
    drifts = [d - k for d in ds]
    s_rec = 0
    cum = 0
    runmin = 0
    for d in drifts:
        s_rec = max(0, s_rec + d)
        cum += d
        runmin = min(runmin, cum)
        s_ident = cum - min(runmin, 0)
        assert s_ident == s_rec


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
             min_size=1, max_size=40),
)
def test_skyline_fold_associativity(pts):
    """pareto(A ∪ B) == pareto(pareto(A) ∪ pareto(B)) for any split —
    the lossless-pruning property stream_pareto_front's per-batch
    local frontiers rely on. Domination: price ≥ & day ≤, one strict."""
    def dominated(p, s):
        return any(
            q[0] >= p[0] and q[1] <= p[1] and q != p
            for q in s
        ) and any(
            (q[0] > p[0] or q[1] < p[1]) and q[0] >= p[0] and q[1] <= p[1]
            for q in s
        )

    def pareto(s):
        s = set(s)
        return {p for p in s if not dominated(p, s)}

    half = len(pts) // 2
    a, b = pts[:half], pts[half:]
    assert pareto(pts) == pareto(pareto(a) | pareto(b))


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(-50, 50), min_size=1, max_size=30),
    st.lists(st.integers(-50, 50), min_size=1, max_size=30),
)
def test_ks_grid_max_is_sufficient(xs, ys):
    """max |F1 − F2| over the merged DISTINCT-value grid equals the
    supremum over all real thresholds (step CDFs attain their sup at
    sample points) — the dq_ks_two_sample reduction."""
    n1, n2 = len(xs), len(ys)
    grid = sorted(set(xs) | set(ys))
    d_grid = max(
        abs(sum(1 for x in xs if x <= t) * n2
            - sum(1 for y in ys if y <= t) * n1)
        for t in grid
    )
    # supremum probe: midpoints and outside points can't beat the grid
    probes = (
        [g - 0.5 for g in grid] + [g + 0.5 for g in grid]
        + [grid[0] - 1, grid[-1] + 1]
    )
    d_probe = max(
        abs(sum(1 for x in xs if x <= t) * n2
            - sum(1 for y in ys if y <= t) * n1)
        for t in probes
    )
    assert d_grid >= d_probe


# ---------------------------------------------------- PNG decode --


@given(
    st.integers(min_value=1, max_value=23),  # width
    st.integers(min_value=1, max_value=17),  # height
    st.sampled_from([1, 2, 3, 4]),           # channels (gray/GA/RGB/RGBA)
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_png_decode_roundtrips_random_images(w, h, nch, rng):
    """The stdlib PNG decoder is exact on arbitrary 8-bit images: for
    every size/channel combination and every scanline filter type the
    encoder emits (cycled 0-4), decode(encode(px)) equals the luma of
    px. Complements the fixed-seed test in test_multimodal.py with
    generative coverage (1-px-wide images, single rows, GA/RGBA)."""
    import numpy as np

    from spark_streaming_stream_analyzer_spark.operators.multimodal import (
        png_decode_gray,
    )
    from tests.test_multimodal import _png_encode

    px = [[rng.randrange(256) for _ in range(w * nch)] for _ in range(h)]
    got = png_decode_gray(_png_encode(px, nch))
    arr = np.array(px, dtype=np.uint8).reshape(h, w, nch)
    if nch >= 3:
        exp = (
            arr[:, :, 0].astype("uint32") * 299
            + arr[:, :, 1].astype("uint32") * 587
            + arr[:, :, 2].astype("uint32") * 114
        ) // 1000
    else:
        exp = arr[:, :, 0].astype("uint32")
    assert got.shape == (h, w)
    assert np.array_equal(got.astype("uint32"), exp)


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=255),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_avg_pool_bounds_and_constant_identity(w, h, c, rng):
    """Box pooling stays inside the image's value range (so in
    particular never NaN, even for images smaller than the 4x4 pool
    grid — ADVICE r6: h or w < 4 used to slice empty blocks), and a
    constant image pools to exactly its value."""
    import numpy as np

    from spark_streaming_stream_analyzer_spark.operators.multimodal import (
        _avg_pool,
    )

    g = np.array(
        [[rng.randrange(256) for _ in range(w)] for _ in range(h)],
        dtype=np.uint8,
    )
    pooled = _avg_pool(g)
    assert pooled.shape == (4, 4)
    assert np.isfinite(pooled).all()
    assert pooled.min() >= g.min() / 255.0 - 1e-6
    assert pooled.max() <= g.max() / 255.0 + 1e-6
    const = _avg_pool(np.full((h, w), c, dtype=np.uint8))
    assert np.allclose(const, c / 255.0)
