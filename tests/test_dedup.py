"""Dedup-tier cross-validation: the probabilistic tiers (MinHash-LSH,
SimHash) against the exact n-gram Jaccard ground truth."""

from __future__ import annotations

from pyspark.sql import Row

from spark_streaming_stream_analyzer_spark import registry
from spark_streaming_stream_analyzer_spark.operators.dedup import simhash_fingerprint


def test_lsh_candidates_are_truly_similar(spark, sf_dir):
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in registry.QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in registry.QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    # no wild false positives: every LSH pair (est>=0.5) has meaningful
    # true overlap
    for pair, est in lsh.items():
        assert pair in exact, f"LSH pair {pair} has true J < 0.4 (est={est})"
    # recall on strong near-dups: every exact pair with J>=0.8 is found
    strong = {p for p, j in exact.items() if j >= 0.8}
    missed = strong - set(lsh)
    assert not missed, f"LSH missed strong near-dups: {missed}"


def test_simhash_identical_docs_equal(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon"),
            Row(doc_id=2, text="alpha beta gamma delta epsilon"),
            Row(doc_id=3, text="totally different words entirely here"),
        ]
    )
    import spark_streaming_stream_analyzer_spark.operators.dedup as dd

    # run the fingerprint body over an inline frame
    orig = dd.load_table_cpu
    try:
        dd.load_table_cpu = lambda s, d, n: df  # noqa: ARG005
        out = {r["doc_id"]: r["simhash"] for r in simhash_fingerprint(spark, "x").collect()}
    finally:
        dd.load_table_cpu = orig
    assert out[1] == out[2]
    assert out[1] != out[3]


def _with_docs(spark, rows, fn):
    """Run a (spark, sf_dir) dedup query body over an inline documents
    frame by patching the loader."""
    import spark_streaming_stream_analyzer_spark.operators.dedup as dd

    df = spark.createDataFrame(rows)
    orig = dd.load_table_cpu
    try:
        dd.load_table_cpu = lambda s, d, n: df  # noqa: ARG005
        return fn(spark, "x").collect()
    finally:
        dd.load_table_cpu = orig


def test_lsh_hot_bucket_cap_quarantines_mega_cluster(spark):
    """A planted boilerplate mega-cluster (> LSH_BUCKET_CAP identical
    docs) must NOT detonate the band self-join: its buckets are
    quarantined, while an ordinary near-dup pair is still found."""
    from spark_streaming_stream_analyzer_spark.operators.dedup import (
        LSH_BUCKET_CAP,
        dedup_minhash_lsh,
    )

    boiler = "terms of service apply to all content on this mirror site"
    rows = [
        Row(doc_id=i, text=boiler) for i in range(LSH_BUCKET_CAP + 20)
    ]
    near_a = "the quick brown fox jumps over the lazy dog near the river bank"
    near_b = "the quick brown fox jumps over the lazy dog near the river shore"
    rows += [Row(doc_id=9001, text=near_a), Row(doc_id=9002, text=near_b)]
    pairs = {(r["doc_a"], r["doc_b"]) for r in _with_docs(spark, rows, dedup_minhash_lsh)}
    # the mega-cluster is quarantined: no pair touches it
    assert all(a == 9001 and b == 9002 for a, b in pairs), pairs
    # the genuine near-dup survives
    assert (9001, 9002) in pairs


def test_ngram_df_cap_drops_boilerplate_shingles(spark):
    """Shingles shared by > SHINGLE_DF_CAP docs are stopword-dropped
    before the quadratic self-join; docs pairing only through
    boilerplate produce no pairs, real near-dups still do."""
    from spark_streaming_stream_analyzer_spark.operators.dedup import (
        SHINGLE_DF_CAP,
        dedup_ngram_jaccard,
    )

    n = SHINGLE_DF_CAP + 10
    rows = [
        Row(doc_id=i, text=f"shared header boilerplate unique{i} tail{i} word{i}")
        for i in range(n)
    ]
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_b = "alpha beta gamma delta epsilon zeta eta theta iota mu"
    rows += [Row(doc_id=9001, text=near_a), Row(doc_id=9002, text=near_b)]
    out = _with_docs(spark, rows, dedup_ngram_jaccard)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (9001, 9002) in pairs
    # boilerplate-only overlap generates zero pairs among the n docs
    assert all(a == 9001 and b == 9002 for a, b in pairs), sorted(pairs)[:5]


def test_fixture_headroom_below_caps(spark, sf_dir):
    """The caps are guards, not behavior, at fixture scale: max shingle
    document-frequency and max LSH bucket size sit below the caps, so
    capped and uncapped results are identical on the test data."""
    from pyspark.sql import functions as F

    from spark_streaming_stream_analyzer_spark.operators.dedup import (
        LSH_BUCKET_CAP,
        SHINGLE_DF_CAP,
        _shingles,
    )

    max_df = (
        _shingles(spark, sf_dir)
        .groupBy("shingle")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_df <= SHINGLE_DF_CAP, max_df
    assert LSH_BUCKET_CAP >= 2  # sanity: cap can never drop a real pair tier


def test_minhash_quality_estimates_track_exact(spark, sf_dir):
    rows = registry.QUERIES["dedup_minhash_quality"](spark, sf_dir).collect()
    assert rows, "fixture contains planted near-dups"
    for r in rows:
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["exact_jaccard"])) < 1e-12
    # 32-hash signatures: estimates concentrate near the true value
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err < 0.25


def test_containment_dominates_jaccard(spark, sf_dir):
    from spark_streaming_stream_analyzer_spark import registry

    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in registry.QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    cont = registry.QUERIES["dedup_containment"](spark, sf_dir).collect()
    assert cont
    seen = 0
    for r in cont:
        assert r["doc_a"] < r["doc_b"]
        assert 0.0 < max(r["cont_in_a"], r["cont_in_b"]) <= 1.0
        j = jac.get((r["doc_a"], r["doc_b"]))
        if j is not None:
            seen += 1
            # containment >= jaccard always: |A∩B|/|A| >= |A∩B|/|A∪B|
            assert r["cont_in_a"] >= j - 1e-12
            assert r["cont_in_b"] >= j - 1e-12
    assert seen > 0


def test_fingerprint_overlap_vs_brute(spark, sf_dir):
    """Pair overlap counts must equal a brute pairing of the winnowing
    output itself (inverted-index join == per-doc set intersection)."""
    from itertools import combinations

    from spark_streaming_stream_analyzer_spark.operators import dedup as dd
    from spark_streaming_stream_analyzer_spark.operators.textstats import (
        doc_winnowing,
    )

    fps = {}
    for r in doc_winnowing(spark, sf_dir).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    docfreq = {}
    for s in fps.values():
        for f in s:
            docfreq[f] = docfreq.get(f, 0) + 1
    kept = {
        d: {f for f in s if docfreq[f] <= dd.FP_DOCFREQ_CAP}
        for d, s in fps.items()
    }
    expect = {}
    for a, b in combinations(sorted(kept), 2):
        n = len(kept[a] & kept[b])
        if n >= dd.FP_MIN_SHARED:
            expect[(a, b)] = (
                n,
                n * 1_000_000 // (len(kept[a]) + len(kept[b]) - n),
            )
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_shared"], r["overlap_ppm"])
        for r in dd.dedup_fingerprint_overlap(spark, sf_dir).collect()
    }
    assert got == expect
    assert got  # the corpus does contain overlapping pairs


def test_dup_ngram_fraction_vs_brute(spark, sf_dir):
    import hashlib

    from spark_streaming_stream_analyzer_spark.operators import dedup as dd
    from spark_streaming_stream_analyzer_spark.sources.tables import (
        load_table_cpu,
    )

    docs = load_table_cpu(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()

    def grams(text):
        ws = [w for w in text.split(" ") if w]
        return [
            " ".join(ws[i : i + dd.DUPG_N])
            for i in range(len(ws) - dd.DUPG_N + 1)
        ]

    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)

    per_doc = {r["doc_id"]: [h(g) for g in grams(r["text"])] for r in docs}
    freq = {}
    for d, gs in per_doc.items():
        for gh in set(gs):
            freq[gh] = freq.get(gh, 0) + 1
    expect = {}
    for d, gs in per_doc.items():
        if not gs:
            continue
        dup = sum(1 for gh in gs if freq[gh] >= 2)
        expect[d] = (len(gs), dup, dup * 1_000_000 // len(gs))
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_ppm"])
        for r in dd.text_dup_ngram_fraction(spark, sf_dir).collect()
    }
    assert got == expect
    assert any(v[1] > 0 for v in got.values())  # corpus has repeats


def test_index_tuning_report_vs_brute(spark, sf_dir):
    from collections import Counter

    from spark_streaming_stream_analyzer_spark.operators import dedup as dd
    from spark_streaming_stream_analyzer_spark.operators.textstats import (
        doc_winnowing,
    )

    dfs = Counter(
        r["df"]
        for r in doc_winnowing(spark, sf_dir)
        .groupBy("fingerprint")
        .count()
        .withColumnRenamed("count", "df")
        .collect()
    )
    mass = {d: n * d * (d - 1) // 2 for d, n in dfs.items()}
    total = sum(mass.values())
    got = {
        r["df"]: (
            r["n_fingerprints"], r["pair_mass"], r["mass_ppm"], r["over_cap"]
        )
        for r in dd.dedup_index_tuning_report(spark, sf_dir).collect()
    }
    assert got == {
        d: (
            n, mass[d],
            (mass[d] * 1_000_000) // total if total else 0,
            int(d > dd.FP_DOCFREQ_CAP),
        )
        for d, n in dfs.items()
    }
    assert sum(v[2] for v in got.values()) <= 1_000_000


def test_source_overlap_vs_brute(spark, sf_dir):
    from spark_streaming_stream_analyzer_spark.operators import dedup as dd
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "documents").select(
        "source", "text"
    ).collect()
    grams = {}
    for r in rows:
        ws = [t for t in r["text"].split(" ") if t]
        gs = grams.setdefault(r["source"], set())
        for i in range(len(ws) - dd.DUPG_N + 1):
            gs.add(" ".join(ws[i: i + dd.DUPG_N]))
    srcs = sorted(grams)
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(grams[a] & grams[b])
            if inter:
                union = len(grams[a]) + len(grams[b]) - inter
                expect[(a, b)] = (inter, (inter * 1_000_000) // union)
    got = {
        (r["source_a"], r["source_b"]): (r["n_shared"], r["jaccard_ppm"])
        for r in dd.dedup_source_overlap_matrix(spark, sf_dir).collect()
    }
    assert got == expect


def test_prefix_filter_join_is_lossless(spark, sf_dir):
    """The prefix-filtered join must return EXACTLY the pairs a brute
    all-pairs tau-scan finds — the pigeonhole guarantee, verified."""
    from spark_streaming_stream_analyzer_spark.operators import dedup as dd
    from spark_streaming_stream_analyzer_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    sets = {
        r["doc_id"]: {t for t in r["text"].split(" ") if t} for r in rows
    }
    sets = {d: s for d, s in sets.items() if s}
    ids = sorted(sets)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if inter * 100 >= dd.PFX_TAU_PCT * union:
                expect.add(
                    (a, b, inter, len(sets[a]), len(sets[b]),
                     (inter * 1_000_000) // union)
                )
    got = {
        (r["doc_a"], r["doc_b"], r["inter"], r["na"], r["nb"],
         r["jaccard_ppm"])
        for r in dd.dedup_prefix_filter_join(spark, sf_dir).collect()
    }
    assert got == expect
    assert got  # threshold pairs exist on the fixture


def test_method_agreement_vs_components(spark, sf_dir):
    from spark_streaming_stream_analyzer_spark.operators import dedup as dd

    sets = {
        "minhash": {(r["doc_a"], r["doc_b"])
                    for r in dd.dedup_minhash_lsh(spark, sf_dir).collect()},
        "simhash": {(r["doc_a"], r["doc_b"])
                    for r in dd.dedup_simhash_pairs(spark, sf_dir).collect()},
        "fingerprint": {
            (r["doc_a"], r["doc_b"])
            for r in dd.dedup_fingerprint_overlap(spark, sf_dir).collect()
        },
        "prefix": {
            (r["doc_a"], r["doc_b"])
            for r in dd.dedup_prefix_filter_join(spark, sf_dir).collect()
        },
    }
    got = {
        (r["method_a"], r["method_b"]): (
            r["n_a"], r["n_b"], r["n_both"], r["pair_jaccard_ppm"]
        )
        for r in dd.dedup_method_agreement(spark, sf_dir).collect()
    }
    order = list(dd._AGREE_METHODS)
    for i, ma in enumerate(order):
        for mb in order[i + 1:]:
            both = len(sets[ma] & sets[mb])
            union = len(sets[ma] | sets[mb])
            assert got[(ma, mb)] == (
                len(sets[ma]), len(sets[mb]), both,
                (both * 1_000_000) // union if union else 0,
            )


def test_lsh_band_hash_collision_free(spark, sf_dir):
    """The xxhash64 band key (round 10) and the injective string form
    must induce the SAME bucket partition: per band, the distinct
    count of (string key) equals the distinct count of (hash key).
    A cross-doc xxhash64 collision inside a band would merge two
    buckets — this is the collision oracle VERDICT r9 item 5 asked to
    keep alongside the hashed production path."""
    import pyspark.sql.functions as F

    from spark_streaming_stream_analyzer_spark.operators.dedup import (
        BAND_ROWS,
        SIG_N,
        _signatures,
    )

    wide = _signatures(spark, sf_dir)
    for b in range(SIG_N // BAND_ROWS):
        cols = [F.col(f"m{b * BAND_ROWS + r}") for r in range(BAND_ROWS)]
        both = wide.select(
            F.concat_ws(",", *[c.cast("string") for c in cols]).alias("s"),
            F.xxhash64(*cols).alias("h"),
        ).agg(
            F.countDistinct("s").alias("ns"), F.countDistinct("h").alias("nh")
        ).collect()[0]
        assert both["ns"] == both["nh"], f"band {b}: xxhash64 collision"
