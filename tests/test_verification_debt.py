"""Registry-growth guard (VERDICT round-5 item 8).

The external driver value-checks 50 ``queries()`` entries per round, so
every registered operator eventually needs a driver CORRECTNESS row —
self-attestation (selfcheck/pytest) is not the brief's bar. Round 5
grew the registry 193 -> 327 in one round and rebuilt a 134-query
never-driver-checked backlog; this test makes that debt a COMMIT-TIME
failure instead of a judge finding.

Rule: the number of registered queries with no row in any
``CORRECTNESS_r*.json`` must not exceed

    max(|FROZEN_BACKLOG not yet checked|, 50)

- Today that ceiling is exactly the frozen round-5 backlog, so adding
  ANY new operator fails until the rotation drains it (the freeze).
- Each round's CORRECTNESS file shrinks the frozen remainder, so the
  ceiling tightens automatically: the test keeps passing only because
  the backlog is shrinking.
- Once the frozen backlog is fully drained (~round 8), the ceiling
  floors at 50 — one driver-round of budget — so future additions are
  bounded by what the very next rotation can verify.

No pyspark import: this is a pure-metadata test and must stay cheap.
"""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The 134 registered-but-never-driver-checked queries as of the
#: round-6 freeze (computed from CORRECTNESS_r01..r05 vs queries();
#: all are round-5 additions — NOTES_r5.md section 8).
FROZEN_BACKLOG = {
    "ab_test_report", "agg_bounce_rate", "agg_gini_impurity", "agg_pareto_8020",
    "agg_regression_trend", "agg_theil_sen", "agg_value_deciles", "agg_weighted_median",
    "agg_winsorized_mean", "approx_distinct_intersect", "approx_kmv_jaccard", "assoc_rules_pairs",
    "attribution_last_touch", "cohort_ltv_matrix", "corpus_contrib_gini", "curation_funnel_report",
    "curation_threshold_sweep", "dedup_fingerprint_overlap", "dedup_index_tuning_report", "dedup_method_agreement",
    "dedup_prefix_filter_join", "dedup_source_overlap_matrix", "dq_benford", "dq_checksum_buckets",
    "dq_column_profile", "dq_distribution_drift", "dq_freshness_sla", "dq_ks_two_sample",
    "dq_pipeline_fingerprint", "dq_relationship_profile", "emb_class_centroids", "emb_class_outliers",
    "emb_class_separation", "emb_dim_variance", "emb_distance_histogram", "emb_knn_graph",
    "emb_matryoshka_recall", "emb_nearest_centroid_confusion", "emb_pca_power", "emb_pq_codebook",
    "feature_chi2_select", "feature_hash_vectorize", "feature_quantile_bins", "fn_bloom_portable",
    "fn_rounding_audit", "funnel_latency_quantiles", "graph_bfs_distances", "graph_connected_components",
    "graph_degree_assortativity", "graph_jaccard_neighbors", "graph_kcore", "graph_triangle_count",
    "join_asof_forward", "join_asof_nearest", "join_interval_grid", "layout_zorder_stats",
    "mart_user_360", "mm_byte_histogram", "mm_shard_manifest", "pack_epoch_shuffle",
    "pack_interleave_order", "pack_length_buckets", "pipeline_anomaly_panel", "pipeline_doc_scorecard",
    "pipeline_pretrain_corpus", "pipeline_text_features_fused", "privacy_kanon_cells", "rec_copurchase_topk",
    "rec_eval_metrics", "rec_popularity_baseline", "sample_bootstrap_stats", "sample_cv_folds",
    "sample_reservoir_group", "sample_temperature_mixture", "sample_word_subsample", "seq_pattern_triples",
    "seq_top_paths", "seq_training_windows", "seq_transition_matrix", "set_ops_all",
    "sim_pq_adc_topk", "sink_python_datasource", "sort_pareto_front", "src_binary_files",
    "src_synthetic_gen", "stream_attribution_last_touch", "stream_cdc_apply", "stream_cms_topk",
    "stream_column_profile", "stream_cusum_alarm", "stream_freshness_watermark", "stream_hll_distinct",
    "stream_kanon_cells", "stream_new_user_monitor", "stream_ohlc_bars", "stream_pareto_front",
    "stream_seq_pattern", "stream_sessionize_custom", "stream_stats_rocksdb", "stream_stats_tws",
    "stream_transition_matrix", "stream_user_360", "target_encode_oof", "text_dup_ngram_fraction",
    "text_gopher_gates", "text_langid_confusion", "text_lexical_diversity", "text_lexical_rarity",
    "text_ngram_novelty", "text_oov_rate", "text_prefix_templates", "text_skipgram_pairs",
    "text_source_similarity", "text_vocab_growth", "text_zipf_profile", "ts_activity_streaks",
    "ts_anomaly_mad", "ts_atr_volatility", "ts_autocorr_lag", "ts_backtest_snaive",
    "ts_changepoint_impact", "ts_cumulative_users", "ts_cusum_alarm", "ts_dayn_retention",
    "ts_dominant_period", "ts_fano_factor", "ts_ohlc_bars", "ts_peak_attribution",
    "ts_peak_prominence", "ts_resample_interp", "ts_rolling_anomaly", "ts_seasonal_profile",
    "ts_sliding_dau", "ts_weekend_lift",
}

ONE_ROUND_BUDGET = 50


def _ever_driver_checked() -> set[str]:
    checked: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                checked |= set(json.load(f))
        except (ValueError, OSError):
            continue
    return checked


def _registered() -> set[str]:
    # Import lazily so collection of other test files never pays for it.
    from spark_streaming_stream_analyzer_spark import registry

    return set(registry.QUERIES)


def test_verification_debt_within_budget():
    checked = _ever_driver_checked()
    registered = _registered()
    debt = registered - checked
    ceiling = max(len(FROZEN_BACKLOG - checked), ONE_ROUND_BUDGET)
    new_unchecked = sorted(debt - FROZEN_BACKLOG)
    assert len(debt) <= ceiling, (
        f"{len(debt)} registered queries have no driver CORRECTNESS row "
        f"(ceiling {ceiling}). New-since-freeze unverified ops: "
        f"{new_unchecked}. The op surface is FROZEN until the rotation "
        f"drains the round-5 backlog (VERDICT r5 item 2) — do not "
        f"register new queries() entries; if an op must land, it waits "
        f"in the library (pytest-only) until a rotation slot opens."
    )


def test_unverified_ops_sit_in_the_driver_window():
    """Post-freeze placement rule (VERDICT r7 item 4), made mechanical.

    The driver verifies the FIRST 50 dict entries of ``queries()`` each
    round. An unverified op registered anywhere past position 50 would
    accrue debt the ceiling test cannot see shrinking — so every
    registered query without a driver CORRECTNESS row must sit inside
    the first-50 window (i.e. new ops go to the FRONT of
    ``_VERIFY_FIRST`` in the round they are registered).
    """
    from spark_streaming_stream_analyzer_spark import registry

    window = set(list(registry.QUERIES)[:ONE_ROUND_BUDGET])
    debt = set(registry.QUERIES) - _ever_driver_checked()
    stranded = sorted(debt - window)
    assert not stranded, (
        f"unverified queries outside the driver's front-50 window: "
        f"{stranded}. Move them to the FRONT of registry._VERIFY_FIRST "
        f"— they cannot earn a CORRECTNESS row from where they sit."
    )


def test_frozen_backlog_names_are_registered():
    # Guards against silently dropping a backlog op instead of
    # verifying it (renames must update the frozen list consciously).
    missing = FROZEN_BACKLOG - _registered()
    assert not missing, f"frozen-backlog queries no longer registered: {sorted(missing)}"
