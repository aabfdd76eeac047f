"""Empty-corpus parity: Spark vs DuckDB on ZERO-row tables.

A full-registry sweep against an all-empty fixture (round 7) surfaced a
class of divergences invisible at any sf > 0: ANSI DIV-by-zero kills on
zero denominators the oracle NULLs, driver-side ``max()``/Observation
access on empty model state, schema inference over empty parquet
writes, and grouped-vs-global aggregate row counts. Each fixed site is
pinned here against its own registered oracle on an empty fixture. The
last engine divergence (Spark emits no global grouping-set row over an
empty relation; ANSI/DuckDB emit one) was closed oracle-side in round 9
with ``HAVING COUNT(*) > 0`` — an identity at any sf > 0 — so the
rollup/cube/grouping-sets trio now sits in EMPTY_PARITY; a separate pin
still notices if Spark ever starts emitting the global row.

Every query exercised here is registered and driver-green on real
data — these tests only add the empty-input edge.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow.parquet as pq
import pytest

from spark_streaming_stream_analyzer_spark import registry
from spark_streaming_stream_analyzer_spark.sources.tables import TABLE_NAMES

SRC = "/root/testdata/sf0.001"


def _build_fixture(tmp_path_factory, tag: str, spec: dict[str, str]) -> str:
    """Copy each fixture table through an optional per-table projection
    (the shared builder behind every degenerate-corpus variant —
    one edit point for the COPY discipline)."""
    d = tmp_path_factory.mktemp(tag)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        sel = spec.get(t, "*")
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def _assert_parity(spark, sf_dir: str, name: str, regime: str) -> None:
    """The one comparison discipline every parity pin shares: columns,
    rowcount, and MULTISET equality (a set compare would miss replay
    double-counting — one side {A,A,B} vs {A,B,B}; round-8 review)."""
    sdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    odf = _oracle(sf_dir, registry.ORACLES[name])
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: spark {len(sdf)} vs oracle {len(odf)}"
    assert _norm(sdf) == _norm(odf), f"{name}: value divergence on {regime}"

#: fixed queries that must agree with their oracle on an empty corpus
EMPTY_PARITY = [
    "ts_dayn_retention",
    "rec_eval_metrics",
    "graph_degree_assortativity",
    "emb_pca_power",
    "sink_parquet_roundtrip",
    "src_file_formats",
    "src_partition_prune",
    "obs_pipeline_metrics",
    "stream_file_sink",
    "stream_progress_metrics",
    # round 9: oracle-side HAVING COUNT(*) > 0 closed the
    # grouping-sets-over-empty engine divergence
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
]


#: fixed queries that must agree with their oracle on a ONE-row corpus
#: (singleton groups, one-sided sample splits, zero-draw replicas —
#: a regime the empty corpus cannot reach because scans stay non-empty
#: while joins/filters empty out downstream)
ONE_ROW_PARITY = [
    "sample_bootstrap_stats",
    "dq_ks_two_sample",
    "approx_aggs",
    "ts_dayn_retention",
    "rec_eval_metrics",
    "graph_degree_assortativity",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLE_NAMES:
        sch = pq.read_schema(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(sch.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def one_row_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_one")
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(SRC, f"{t}.parquet")).slice(0, 1)
        pq.write_table(tb, str(d / f"{t}.parquet"))
    return str(d)


#: fixed queries that must agree with their oracle when a third of the
#: payload columns (props / text / embedding) are NULL — the
#: missing-payload reality of a production corpus. One representative
#: per fixed mechanism: the NULL-free embedding view (load_embeddings +
#: the oracle shadow CTE), kernel None-skips, staging skips, and the
#: NULL-propagation expression alignments.
NULL_PAYLOAD_PARITY = [
    "embedding_norms",       # shadow CTE + load_embeddings
    "emb_ingest_audit",      # drop telemetry: NULL third -> null_embedding
    "sim_topk_cosine",       # candidate tier over the NULL-free view
    "dedup_embedding_cosine",  # dedup.py twin of the shadow
    "mm_frame_sample",       # mapInPandas kernel None-skip
    "mm_phash_dedup",        # kernel skip + JVM band join downstream
    "src_binary_files",      # staging skip + oracle WHERE
    "doc_fingerprint",       # concat_ws NULL-skip guard
    "fn_crypto_roundtrip",   # COUNT(text) oracle alignment
    "array_funcs",           # oracle CASE for list_prepend(0.0, NULL)
]


#: fixed queries that must agree with their oracle when GROUPING/JOIN
#: keys are NULL (every 7th user_id / 11th event_type / 11th source /
#: 7th label) — the anonymous-traffic regime. Round-7 fixes plus the
#: round-8 batch backlog (NOTES_r7 §6 findings 1-3).
NULL_KEYS_PARITY = [
    "seq_top_paths",        # any-NULL-step triples dropped in both
    "ts_peak_attribution",  # NULL-user bucket ranks last on ties
    "pack_interleave_order",  # NULL-source bucket: eqNullSafe + NULLS LAST
    "join_interval_grid",   # anonymous sessions emit n_concurrent=0
    "agg_pivot",            # sentinel bucket -1 kills the dtype artifact
    "agg_unpivot",          # inherits the pivot sentinel
    "stream_cdc_apply",     # NULL event_type is an upsert, not a tombstone
    "stream_transition_matrix",  # NULL-dest pairs skipped; NULL state carried
    "stream_kafka_pipeline",  # untaggable record renders NULL value
]


#: fixed queries that must agree with their oracle when events.value
#: carries NaN / ±Inf doubles (a broken sensor, a JSON "Infinity") —
#: the round-8 finite-measurement contract: non-finite value -> NULL at
#: load (sources/tables.py clean_measurements + the registry's
#: _shadow_finite_events oracle CTE). Representatives per mechanism:
#: the load guard itself, the positional-median censuses, the 3VL
#: outlier verdict, and the three stateful kernels that cast value.
NAN_VALUE_PARITY = [
    "agg_running_stats",     # exact-cents path through the load guard
    "ts_anomaly_mad",        # census excludes NULL measurements
    "agg_winsorized_mean",   # positional picks exclude NULLs
    "approx_median_hist",    # histogram excludes NULLs
    "dq_ks_two_sample",      # sample grids exclude NULLs
    "anomaly_zscore",        # missing value is not an outlier (3VL)
    "stream_cusum_alarm",    # kernel: NULL row carries cum (d=0)
    "stream_sessionize_custom",  # kernel: all-NULL session sums NULL
    "stream_user_360",       # kernel: NULL purchase contributes 0
    "stream_kafka_pipeline",  # doc synthesis keeps tag, null readValue
]


@pytest.fixture(scope="module")
def nan_value_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_nanval", {
        "events": "event_id, ts, user_id, event_type, CASE"
        " WHEN event_id % 13 = 0 THEN 'NaN'::DOUBLE"
        " WHEN event_id % 17 = 0 THEN 'Infinity'::DOUBLE"
        " WHEN event_id % 19 = 0 THEN '-Infinity'::DOUBLE"
        " ELSE value END AS value, props",
    })


@pytest.mark.parametrize("name", NAN_VALUE_PARITY)
def test_nan_value_corpus_parity(spark, nan_value_dir, name):
    _assert_parity(spark, nan_value_dir, name, "NaN/Inf values")


#: fixed queries that must agree with their oracle when EVENTS rows are
#: duplicated (at-least-once replay — full-row dups, so oracles stay
#: deterministic). doc_id duplication is OUT of contract: doc_id is the
#: corpus identity key, enforced by dq_constraint_audit's
#: documents_pk_unique / events_pk_unique rows (round-8 dup-rows sweep).
DUP_EVENTS_PARITY = [
    "stream_dedup",              # exactly-once oracle (DISTINCT event_id)
    "stream_dedup_watermark",    # shares the exactly-once oracle
    "stream_sessionize_custom",  # (user, session_seq)-keyed serving table
                                 # — replay dups mint distinct seqs
    "dq_constraint_audit",       # detects the PK-violation regime itself
]


@pytest.fixture(scope="module")
def dup_events_dir(tmp_path_factory) -> str:
    import duckdb

    d = tmp_path_factory.mktemp("sf_dupev")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        q = (
            f"SELECT * FROM {src} UNION ALL SELECT * FROM {src}"
            " WHERE event_id % 5 = 0"
            if t == "events"
            else f"SELECT * FROM {src}"
        )
        con.execute(f"COPY ({q}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return str(d)


@pytest.mark.parametrize("name", DUP_EVENTS_PARITY)
def test_dup_events_corpus_parity(spark, dup_events_dir, name):
    _assert_parity(spark, dup_events_dir, name, "replay dups")


#: CONFLICTING-payload replays (round 10): the same event_id lands
#: again with a DIFFERENT payload — later ts + shifted value for
#: event_id % 5, same-instant ts + different value for % 7 (the
#: fingerprint tiebreak). stream_dedup's deterministic keep rule
#: (min event-time, then min payload fingerprint) makes its parity
#: unconditional in this regime — no events_pk_unique precondition.
#: Kept a narrow pin, NOT a standing full sweep: bounded
#: arbitrary-keep ops (stream_dedup_watermark) legitimately carry the
#: full-row-replay precondition and would diverge here by design.
DUP_CONFLICT_PARITY = [
    "stream_dedup",          # deterministic keep rule, unconditional
    "dq_constraint_audit",   # detects the PK-violation regime itself
]


@pytest.fixture(scope="module")
def dup_conflict_dir(tmp_path_factory) -> str:
    import duckdb

    d = tmp_path_factory.mktemp("sf_dupconf")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t == "events":
            q = (
                f"SELECT * FROM {src}"
                " UNION ALL "
                "SELECT event_id, ts + INTERVAL 90 MINUTE AS ts, user_id,"
                " event_type, value + 7.25 AS value, props"
                f" FROM {src} WHERE event_id % 5 = 0"
                " UNION ALL "
                "SELECT event_id, ts, user_id, event_type,"
                " value - 3.50 AS value, props"
                f" FROM {src} WHERE event_id % 7 = 0"
            )
        else:
            q = f"SELECT * FROM {src}"
        con.execute(f"COPY ({q}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return str(d)


@pytest.mark.parametrize("name", DUP_CONFLICT_PARITY)
def test_dup_conflict_parity(spark, dup_conflict_dir, name):
    _assert_parity(spark, dup_conflict_dir, name, "conflicting-payload replays")


#: MILLION-ROW CAP GROUPS (round 10, VERDICT r9 item 1): one
#: 2e6-row group pinned at the EVENT_VALUE_ABS_MAX magnitude cap
#: (alternating sign) plus a 1e5-row zero-variance all-cap group.
#: This regime found FOUR latent scale-bug classes on first run
#: (12 queries red): (1) agg_higher_moments' single DECIMAL(38,0)
#: S4 sum overflowed at ~1.7e6 all-cap rows — now three exact limbs
#: (a², 2ab, b² of c2 = a·1e8 + b), bound moved to ~4e11 rows;
#: (2) the streaming stats kernels' PER-BATCH pandas int64 Σcents²
#: wrapped silently at ~920 all-cap rows (state._sumsq_exact);
#: (3) DECIMAL(18,4) fixed-scale renders overflowed (ANSI killed the
#: whole job) — widened to DECIMAL(38,4), same text in-range;
#: (4) two ORACLE bugs: DuckDB's 1-ulp HUGEINT→DOUBLE above 2^64
#: reached by the squared-cents sums (VARCHAR hop, NOTES_r9 §3
#: primitive) and the gaps-and-islands ROWS frame splitting phantom
#: sessions on TIED timestamps (RANGE frame — peers share the
#: island id).
CAP_GROUP_PARITY = [
    "agg_higher_moments",       # S4 limb split
    "agg_running_stats",        # oracle VARCHAR hop
    "agg_naive_variance",       # oracle VARCHAR hop
    "fn_welford_update",        # oracle VARCHAR hop
    "stream_stats_exact_state", # kernel _sumsq_exact
    "stream_stats_tws",         # kernel _sumsq_exact (tws twin)
    "proj_wrap_array",          # DECIMAL(38,4) render
    "sink_kafka_json",          # DECIMAL(38,4) render
    "stream_kafka_pipeline",    # DECIMAL(38,4) render, to_json path
    "agg_session_window",       # RANGE-frame islands on tied ts
    "stream_session_window",    # RANGE-frame islands on tied ts
    "join_interval_overlap",    # inherits session oracle
    "join_interval_grid",       # inherits session oracle
]


@pytest.fixture(scope="module")
def cap_group_dir(tmp_path_factory) -> str:
    import duckdb

    d = tmp_path_factory.mktemp("sf_capgroup")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t == "events":
            q = (
                f"SELECT * FROM {src}"
                " UNION ALL "
                "SELECT 10000000 + i AS event_id,"
                " TIMESTAMP '2024-01-01 00:10:00'"
                "   + INTERVAL (i % 86000) SECOND AS ts,"
                " i % 1000 AS user_id, 'cap_alt' AS event_type,"
                " CASE WHEN i % 2 = 0 THEN 1000000.0"
                "      ELSE -1000000.0 END AS value,"
                " '{\"k\": ' || (i % 100) || '}' AS props"
                " FROM generate_series(1, 2000000) t(i)"
                " UNION ALL "
                "SELECT 20000000 + i,"
                " TIMESTAMP '2024-01-01 00:10:00'"
                "   + INTERVAL (i % 86000) SECOND,"
                " i % 1000, 'cap_pos', 1000000.0,"
                " '{\"k\": ' || (i % 100) || '}'"
                " FROM generate_series(1, 100000) t(i)"
            )
        else:
            q = f"SELECT * FROM {src}"
        con.execute(f"COPY ({q}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return str(d)


@pytest.mark.parametrize("name", CAP_GROUP_PARITY)
def test_cap_group_parity(spark, cap_group_dir, name):
    _assert_parity(spark, cap_group_dir, name, "million-row cap groups")


#: ADVERSARIAL (valid) props JSON (round 10, VERDICT r9 item 6): deep
#: nesting, duplicate keys (top-level AND nested — the recursive
#: oracle walk), array/object values under $.k, unicode
#: escapes, token whitespace, 2 KB padding strings, case-variant and
#: nested-decoy paths, int64-boundary integers, cast-refusing strings.
#: Probed alignments this fixture relies on (round-10 probe): both
#: engines take the FIRST duplicate key, re-serialize non-scalar
#: extracts with identical canonical spacing, unescape \\uXXXX, keep
#: int64-range integers as exact text, and render plain-window
#: doubles identically. The DIVERGENT shapes — doubles that re-render
#: in scientific notation ('1.0E20' vs '100000000000000000000.0'),
#: integers beyond int64, 1e999 overflow — are pinned separately in
#: test_json_render_divergence as a documented ENGINE-RENDER contract
#: (the casted double stays aligned even there; only the raw string
#: extraction differs).
JSON_ADV_PARITY = [
    "fn_json_get_string",     # $.k string extraction
    "fn_cast_string_double",  # extraction + TRY_CAST
    "fn_variant_json",        # try_parse_json variant path
    "null_handling",          # $.zz NULL-on-every-row contract
    "json_corrupt_policy",    # corrupt-policy census over adversarial docs
    "json_key_inventory",     # key inventory sees dup/decoy keys
]


@pytest.fixture(scope="module")
def json_adv_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_jsonadv", {
        "events": "event_id, ts, user_id, event_type, value, CASE"
        """ WHEN event_id % 13 = 0 THEN '{"k": {"a": {"b": {"c": [1, 2, {"d": "x"}]}}}}'"""
        """ WHEN event_id % 17 = 0 THEN '{"k": 1, "k": 2, "j": 3}'"""
        """ WHEN event_id % 19 = 0 THEN '{"k": [1,2,3], "arr": [{"x":1},{"x":2}]}'"""
        """ WHEN event_id % 23 = 0 THEN '{"k": "\\u00e9\\u0301"}'"""
        """ WHEN event_id % 29 = 0 THEN '{ "k" :' || chr(9) || '87 , "pad": "' || repeat('x', 2000) || '"}'"""
        """ WHEN event_id % 31 = 0 THEN '{"K": 5, "outer": {"k": 9}}'"""
        """ WHEN event_id % 37 = 0 THEN '{"k": null, "b": true}'"""
        """ WHEN event_id % 41 = 0 THEN '{"k": 9007199254740992}'"""
        """ WHEN event_id % 43 = 0 THEN '{"k": "12.5abc"}'"""
        """ WHEN event_id % 47 = 0 THEN '{"k": 0.015625}'"""
        # NESTED duplicate keys (round 10, second pass): Spark's
        # try_parse_json rejects dups at ANY depth (VARIANT spec);
        # fn_variant_json's oracle mirrors with a recursive CTE walk
        # over every object/array node — the former top-level-only
        # precondition is gone. Plain extraction of $.k is unaffected
        # (the dup lives below a sibling key).
        """ WHEN event_id % 53 = 0 THEN '{"k": 6, "nest": {"d": 1, "d": 2}}'"""
        """ WHEN event_id % 59 = 0 THEN '{"k": 7, "arr": [[{"q": 1, "q": 2}]]}'"""
        " ELSE props END AS props",
    })


@pytest.mark.parametrize("name", JSON_ADV_PARITY)
def test_json_adv_parity(spark, json_adv_dir, name):
    _assert_parity(spark, json_adv_dir, name, "adversarial props JSON")


#: EVERY ROW ITS OWN KEY (round 10, VERDICT r9 item 2): event_type
#: and user_id unique per event, documents' lang/source unique per
#: doc, embeddings' label unique per vector — the opposite extreme
#: from skew: |rows| groups of size 1. Stresses per-key streaming
#: state (one state entry per row), window partitioning (|rows|
#: partitions), n<=1 aggregate branches at full corpus size (ONEROW
#: only reaches them on a 1-row corpus), and the LSH hot-bucket logic
#: in the no-duplicates direction. Representatives per mechanism:
HIGH_CARD_PARITY = [
    "agg_running_stats",         # 1000 singleton groups, var n<=1
    "agg_higher_moments",        # N2=0 singletons: NULL skew/kurtosis
    "stream_stats_exact_state",  # |rows| state keys
    "stream_sessionize_custom",  # one session per user
    "agg_session_window",        # |users| sessions
    "dedup_minhash_lsh",         # no-dup direction, no hot buckets
    "lang_id_ngram",             # per-lang groups = per-doc groups
]


@pytest.fixture(scope="module")
def high_card_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_highcard", {
        "events": "event_id, ts, event_id AS user_id,"
        " 'k' || CAST(event_id AS VARCHAR) AS event_type, value, props",
        "documents": "doc_id, text,"
        " 'l' || CAST(doc_id AS VARCHAR) AS lang,"
        " 's' || CAST(doc_id AS VARCHAR) AS source, n_chars",
        # label keeps its INTEGER type (the oracle tier casts it);
        # vec_id-as-label = every vector its own class
        "embeddings": "vec_id, embedding,"
        " CAST(vec_id AS INTEGER) AS label",
    })


@pytest.mark.parametrize("name", sorted(set(HIGH_CARD_PARITY)))
def test_high_card_parity(spark, high_card_dir, name):
    _assert_parity(spark, high_card_dir, name, "every-row-its-own-key")


#: SAME-INSTANT corpus (round 10, NOTES_r10 §8 candidate #1): every
#: event carries the SAME timestamp — a batch-loaded backfill whose
#: source system stamped load time, not event time. Stresses every
#: ORDER BY ts tiebreak at once (lag/lead, asof joins, SCD2, OHLC,
#: keep-rules), collapses every session/window/grid to a single
#: bucket, and makes ALL rows RANGE-frame peers. Representatives per
#: mechanism (full sweep: scripts/sweep_all.py TIES):
TIED_CLOCK_PARITY = [
    "ts_gap_stats",          # every gap 0 via (ts, event_id) tiebreak
    "join_asof_forward",     # massive tie-sets resolved by event_id
    "join_asof_nearest",     # |dt| ties resolved deterministically
    "scd2_intervals",        # zero-length validity intervals
    "agg_session_window",    # one session per user, RANGE peers
    "ts_ohlc_bars",          # open=first/close=last by id on full tie
    "ts_resample_interp",    # single-point grid
    "stream_dedup",          # keep-rule (ts, fp) ties -> fp decides
    "seq_pattern_triples",   # path order = id order on tied ts
    "ts_sliding_dau",        # one day bucket, every user active
    # the sweep's ONE find (326/327 first run): same-instant
    # purchase-split sessions share (user, start) AND end, so only
    # the state-carried break count identifies them — session_seq is
    # now the output/serving key in kernel and oracle alike
    "stream_sessionize_custom",
]


@pytest.fixture(scope="module")
def tied_clock_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_ties", {
        "events": "event_id, CASE WHEN event_id IS NOT NULL THEN"
        " TIMESTAMP '2024-01-03 12:00:00' ELSE ts END AS ts,"
        " user_id, event_type, value, props",
    })


@pytest.mark.parametrize("name", TIED_CLOCK_PARITY)
def test_tied_clock_parity(spark, tied_clock_dir, name):
    _assert_parity(spark, tied_clock_dir, name, "same-instant corpus")


#: MULTI-FILE PARQUET LAYOUT (round 10, NOTES_r10 §8 candidate #2):
#: every table is a DIRECTORY of 4 part files, one of them written
#: 0-row where the table is small — the 100 TB reality (no production
#: table is one file; empty parts are routine compaction output).
#: Batch scans must union parts losslessly; the file-stream source
#: must replay parts in name order (events parts are TIME-ORDERED
#: slices so watermark semantics match the single-file corpus).
MULTI_FILE_PARITY = [
    "agg_running_stats",     # plain scan over parts
    "q1_pricing_summary",    # multi-part lineitem scan
    "src_partition_prune",   # pruning over a parts directory
    "stream_stats_exact_state",  # file-stream: one part per micro-batch
    "stream_session_window",     # watermark across time-ordered parts
    "sink_parquet_roundtrip",    # sink reads multi-part input
    # the sweep's 9 first-run finds, one root cause + three staging
    # sites: Spark's FileStreamSource orders batches by MILLISECOND
    # mtime, not name — same-ms parts tie and stream in arbitrary
    # order, so every stateful kernel's time-ordered carry silently
    # corrupted (forced-mtime staging fixes all six); the per-batch
    # ops staged the directory itself as if it were a file
    "stream_sessionize_custom",      # out-of-order carry (946 vs 957)
    "stream_cusum_alarm",            # order-dependent excursion path
    "stream_attribution_last_touch",  # click-before-purchase inverted
    "stream_transition_matrix",      # boundary pairs miscounted
    "stream_new_user_monitor",       # new/returning flipped
    "stream_user_360",               # first/last_us + session counts
    "stream_batch_wordcount",        # dir staged as a file: 0 batches
    "stream_pareto_front",           # dir staged as a file: no store
    "stream_progress_metrics",       # batch_per_pass: 2 rows, not 8
]


@pytest.fixture(scope="module")
def multi_file_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_multifile")
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        if t == "events":
            # time-ordered parts: part file order IS arrival order for
            # the streaming source; an unordered split would let the
            # watermark legitimately drop late rows (semantics, not a
            # bug — same reasoning as the batch-boundary suite)
            tb = tb.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        sub = os.path.join(str(d), f"{t}.parquet")
        os.makedirs(sub)
        per = max(1, -(-tb.num_rows // 4))
        for i in range(4):
            pq.write_table(
                tb.slice(i * per, per),
                os.path.join(sub, f"part-{i:05d}.parquet"),
            )
    return str(d)


@pytest.mark.parametrize("name", MULTI_FILE_PARITY)
def test_multi_file_parity(spark, multi_file_dir, name):
    _assert_parity(spark, multi_file_dir, name, "multi-file layout")


#: ONE GROUP (round 10, second pass): every event the same user AND
#: type, every document the same lang AND source, every vector the
#: same label — the max-skew pole opposite HIGHCARD. One state key
#: holds the whole stream, every keyed window runs in a single
#: partition, per-group branches see n = |corpus|. First full sweep:
#: 0/327 (nothing to fix — commissioned as a regression gate).
ONE_GROUP_PARITY = [
    "agg_running_stats",         # one group of 1000
    "stream_stats_exact_state",  # single state key carries everything
    "stream_sessionize_custom",  # one user's entire history in state
    "seq_transition_matrix",     # single-user chain = global chain
    "lang_id_ngram",             # one lang bucket holds the corpus
    "target_encode_oof",         # single-class label folds
]


@pytest.fixture(scope="module")
def one_group_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_onegroup", {
        "events": "event_id, ts, 7 AS user_id, 'click' AS event_type,"
        " value, props",
        "documents": "doc_id, text, 'en' AS lang, 'web' AS source,"
        " n_chars",
        "embeddings": "vec_id, embedding, 1 AS label",
    })


@pytest.mark.parametrize("name", ONE_GROUP_PARITY)
def test_one_group_parity(spark, one_group_dir, name):
    _assert_parity(spark, one_group_dir, name, "single-group corpus")


def test_json_render_divergence(spark):
    """Documented ENGINE-RENDER divergence (round-10 probe): both
    engines parse JSON numbers and RE-RENDER them, and their numeric
    ladders split at the extremes — Spark (Jackson) renders doubles as
    Double.toString ('1.0E20') and keeps beyond-int64 integers as
    exact BigInteger text; DuckDB renders '100000000000000000000.0' /
    shortest-repr scientific and collapses beyond-int64 to double.
    This pin documents the split so it cannot silently drift into the
    standing fixture, and proves the CAST path stays aligned: the
    extracted value CAST to DOUBLE is identical even where the raw
    string text differs — the props-number contract is therefore
    'int64-range integers and plain-window doubles extract as
    identical text; anything wider must be consumed through the
    double cast'."""
    import pyspark.sql.functions as F

    rows = (
        spark.createDataFrame(
            [('{"k": 1e20}',), ('{"k": 123456789012345678901234567890}',)],
            "props string",
        )
        .select(
            F.get_json_object("props", "$.k").alias("s"),
            F.get_json_object("props", "$.k").try_cast("double").alias("d"),
        )
        .collect()
    )
    assert rows[0]["s"] == "1.0E20"  # Jackson double render
    assert rows[1]["s"] == "123456789012345678901234567890"  # BigInteger
    odf = duckdb.connect().execute(
        "SELECT json_extract_string(j, '$.k') AS s,"
        " TRY_CAST(json_extract_string(j, '$.k') AS DOUBLE) AS d"
        " FROM (VALUES ('{\"k\": 1e20}'),"
        " ('{\"k\": 123456789012345678901234567890}')) t(j)"
    ).df()
    assert odf["s"][0] != rows[0]["s"]  # the render split is REAL
    assert odf["s"][1] != rows[1]["s"]
    assert float(odf["d"][0]) == rows[0]["d"]  # cast path aligned
    assert float(odf["d"][1]) == rows[1]["d"]


#: fixed queries that must agree with their oracle on adversarial
#: unicode text (multibyte, astral plane, RTL, combining chars) — the
#: round-8 unicode sweep: byte-level ops must measure BYTES in both
#: engines (octet_length(encode(..)) oracle-side), byte-window digests
#: hash the uppercase-hex spelling (DuckDB v1.0 cannot hash BLOBs), and
#: the fuzzy verify uses the codepoint-faithful prefix-split identity
#: (DuckDB levenshtein counts bytes).
UNICODE_PARITY = [
    "mm_binary_meta",        # octet_length contract
    "mm_frame_sample",       # hex-spelling digest windows
    "mm_resize",             # hex-spelling digest of sampled bytes
    "mm_audio_chunk",        # hex-window chunking
    "mm_phash_dedup",        # byte values decoded from hex pairs
    "mm_shard_manifest",     # byte-budget packing on octet_length
    "mm_byte_histogram",     # hex(encode()) not CAST(text AS BLOB)
    "fuzzy_pairs_symdelete",  # prefix-split edit-distance-1 verify
]


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_unicode", {
        "documents": "doc_id, CASE doc_id % 9"
        " WHEN 0 THEN 'café ' || text || ' naïve Über'"
        " WHEN 1 THEN '日本語テスト ' || text"
        " WHEN 2 THEN text || ' \U0001F600\U0001F680 astral'"
        " WHEN 3 THEN 'العربية rtl ' || text"
        " WHEN 4 THEN 'combining é à ' || text"
        " WHEN 5 THEN replace(text, ' ', '  ')"
        " WHEN 6 THEN ' ' || text || ' '"
        " WHEN 7 THEN upper(text)"
        " ELSE text END AS text, lang, source, n_chars",
    })


@pytest.mark.parametrize("name", UNICODE_PARITY)
def test_unicode_corpus_parity(spark, unicode_dir, name):
    _assert_parity(spark, unicode_dir, name, "unicode text")


#: fixed queries that must agree with their oracle when events carry
#: corrupt clocks (1969 negative epoch / epoch 0 / year 2200) — the
#: round-8 clock-validity contract: rows outside
#: [EVENT_TS_VALID_MIN_US, EVENT_TS_VALID_MAX_US) are dropped at load
#: in both engines (clean_measurements + the oracle shadow WHERE).
#: Beyond parity this bounds the calendar grids: one 2200-dated row
#: otherwise mints a 2-million-hour resample grid.
TIME_PARITY = [
    "ts_resample_interp",     # the grid op the corrupt clock DoS'd
    "agg_regression_trend",   # giant hour indices pushed OLS into ulps
    "ts_sliding_dau",         # day bucketing over the valid window
    "stream_progress_metrics",  # num_input_rows counts RAW source rows
]


@pytest.fixture(scope="module")
def bad_clock_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_badclock", {
        "events": "event_id, CASE"
        " WHEN event_id % 13 = 0 THEN TIMESTAMP '1969-12-31 23:59:58.5'"
        " WHEN event_id % 17 = 0 THEN TIMESTAMP '1970-01-01 00:00:00'"
        " WHEN event_id % 19 = 0 THEN TIMESTAMP '2200-06-15 12:00:00'"
        " ELSE ts END AS ts, user_id, event_type, value, props",
    })


@pytest.mark.parametrize("name", TIME_PARITY)
def test_bad_clock_corpus_parity(spark, bad_clock_dir, name):
    _assert_parity(spark, bad_clock_dir, name, "corrupt clocks")


#: fixed queries that must agree with their oracle when events.props is
#: malformed JSON (truncated object / wrong top-level type) — the
#: round-8 JSON sweep: extraction is PERMISSIVE (NULL) in both engines
#: (Spark get_json_object already is; oracles gained json_valid guards;
#: the variant path uses try_parse_json instead of the throwing
#: parse_json).
JSON_BAD_PARITY = [
    "fn_json_get_string",
    "fn_cast_string_double",
    "fn_variant_json",
    "null_handling",
]


@pytest.fixture(scope="module")
def bad_json_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_badjson", {
        # % 23: VALID JSON whose k is non-numeric — the permissive
        # TRY_CAST contract (round-8 review: json_valid alone left the
        # class half closed; DuckDB's bare CAST threw on 'abc')
        "events": "event_id, ts, user_id, event_type, value, CASE"
        " WHEN event_id % 13 = 0 THEN '{\"truncated\": '"
        " WHEN event_id % 17 = 0 THEN '[]'"
        " WHEN event_id % 19 = 0 THEN '{}'"
        " WHEN event_id % 23 = 0 THEN '{\"k\": \"abc\"}'"
        " ELSE props END AS props",
    })


@pytest.mark.parametrize("name", JSON_BAD_PARITY)
def test_bad_json_corpus_parity(spark, bad_json_dir, name):
    _assert_parity(spark, bad_json_dir, name, "malformed JSON")


#: fixed queries that must agree with their oracle on ADVERSARIAL
#: FLOATS in events.value: -0.0, subnormals (5e-324 / -2.5e-310),
#: on-grid values at and 1 cent around EVENT_VALUE_ABS_MAX (1e6), and
#: the ±2^63/100 exact-cents CAST-overflow crashers (round 9). Three
#: mechanisms closed: (1) the magnitude clause of the measurement
#: contract (out-of-bound finite value -> NULL at load, both engines —
#: previously ONE such row killed 30+ exact-cents jobs in both
#: engines); (2) double->DECIMAL(38,4) rendering beyond 2^53/1e4 (the
#: oracle now takes Spark's shortest-string path via a VARCHAR hop);
#: (3) agg_higher_moments' N3/N4 combination in double over exact
#: integer sums (the all-HUGEINT form overflowed on 3*s1^4 — a latent
#: sf~10 scale bug — and DuckDB's HUGEINT->DOUBLE cast is off by 1 ulp
#: above 2^64, so its conversions route through VARCHAR/strtod).
ADV_FLOAT_PARITY = [
    "agg_running_stats",    # magnitude clause through the load guard
    "fn_scalar_min_max",    # min/max over -0.0 and subnormals
    "agg_higher_moments",   # double-combined N3/N4 + VARCHAR-hop casts
    "proj_wrap_array",      # DECIMAL(38,4) rendering at sumsqr ~1.2e13
    "sink_kafka_json",      # same class, JSON record form
    "fn_welford_update",    # exact m2 with cap-sized cents
    "ts_anomaly_mad",       # positional census with subnormals present
    "anomaly_zscore",       # 3VL verdict over NULLed out-of-bound rows
]


@pytest.fixture(scope="module")
def adv_float_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_advfloat", {
        "events": "event_id, ts, user_id, event_type, CASE"
        " WHEN event_id % 13 = 0 THEN -0.0"
        " WHEN event_id % 17 = 0 THEN 5e-324"
        " WHEN event_id % 19 = 0 THEN -2.5e-310"
        " WHEN event_id % 23 = 0 THEN 999999.99"
        " WHEN event_id % 29 = 0 THEN 1000000.0"
        " WHEN event_id % 31 = 0 THEN 1000000.01"
        " WHEN event_id % 37 = 0 THEN 92233720368547758.08"
        " WHEN event_id % 41 = 0 THEN -92233720368547758.08"
        " ELSE value END AS value, props",
    })


@pytest.mark.parametrize("name", ADV_FLOAT_PARITY)
def test_adv_float_corpus_parity(spark, adv_float_dir, name):
    _assert_parity(spark, adv_float_dir, name, "adversarial floats")


#: fixed queries that must agree with their oracle on ADVERSARIAL
#: GROUP-KEY STRINGS ('' / ' ' / case variants / trailing space /
#: NFC-vs-NFD 'café') — the round-9 groupkey sweep. Finds were all in
#: the file-format tier: Spark CSV defaults TRIM whitespace on write
#: and conflate '' with NULL on read (src_file_formats now pins the
#: faithful writer/reader option set: trimming off, explicit \\N null
#: sentinel, quoted emptyValue), and a hive-style partition directory
#: cannot represent '' (read back as NULL — oracles mirror with
#: NULLIF(key, '')). Engines byte-compare strings, so NFC/NFD stay
#: distinct keys in both.
GROUP_KEY_PARITY = [
    "src_file_formats",        # faithful CSV option set
    "sink_parquet_roundtrip",  # hive '' -> NULL partition encoding
    "stream_file_sink",        # same encoding on the streaming writer
    "agg_running_stats",       # '' and ' ' are ordinary group keys
    "agg_batch_wordcount",     # tokenizer vs whitespace-keyed text
    # round-10 JSON-metacharacter keys ('"' / '\') — ADVICE r9:
    "stream_kafka_pipeline",   # to_json escapes; oracle mirrors (_JSON_ESC_KEY)
    "sink_kafka_json",         # raw splice BOTH sides -> identical bytes
    "proj_json_extract_pair",  # malformed a1 -> NULL both (json_valid guard)
    "proj_json_extract_single",
]


@pytest.fixture(scope="module")
def group_key_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_groupkey", {
        "events": "event_id, ts, user_id, CASE"
        " WHEN event_id % 13 = 0 THEN ''"
        " WHEN event_id % 17 = 0 THEN ' '"
        " WHEN event_id % 19 = 0 THEN 'Click'"
        " WHEN event_id % 23 = 0 THEN 'click '"
        " WHEN event_id % 29 = 0 THEN 'café'"
        " WHEN event_id % 31 = 0 THEN 'café'"
        # JSON metacharacters (round 10, ADVICE r9): to_json must
        # escape them, the raw-splice oracles must mirror or go NULL
        # in lockstep, and CSV/hive writers must roundtrip them. Raw
        # CONTROL CHARS stay out of THIS fixture: Spark's
        # get_json_object salvages an unescaped tab inside a string
        # where DuckDB's json_valid rejects the doc, so the a1 ops
        # would diverge by engine permissiveness — that contract is
        # pinned separately (JSONKEY_CTL below).
        " WHEN event_id % 37 = 0 THEN 'he said \"hi\"'"
        " WHEN event_id % 41 = 0 THEN 'back\\slash'"
        " ELSE event_type END AS event_type, value, props",
        "documents": "doc_id, text, CASE WHEN doc_id % 7 = 0 THEN ''"
        " WHEN doc_id % 11 = 0 THEN ' ' ELSE lang END AS lang,"
        " source, n_chars",
    })


@pytest.mark.parametrize("name", GROUP_KEY_PARITY)
def test_group_key_corpus_parity(spark, group_key_dir, name):
    _assert_parity(spark, group_key_dir, name, "adversarial group keys")


#: CONTROL-CHAR group keys (tab / newline / backspace). Pinned apart
#: from the groupkey fixture because the a1 JSON-synthesis ops
#: (proj_json_extract_*) hit a genuine ENGINE-PERMISSIVENESS split on
#: raw control chars inside a JSON string: Spark's get_json_object
#: salvages them (Jackson ALLOW_UNESCAPED_CONTROL_CHARS) while
#: DuckDB's json_valid rejects the doc — so those two ops carry a
#: documented no-raw-control-chars key precondition instead of a
#: parity claim. Every ESCAPING or raw-splice-both-sides surface must
#: still agree: to_json renders \t \n \b and _JSON_ESC_KEY mirrors.
JSONKEY_CTL_PARITY = [
    "stream_kafka_pipeline",   # to_json named escapes vs oracle mirror
    "sink_kafka_json",         # raw splice both sides
    "proj_wrap_array",         # key is a bare column
    "agg_running_stats",       # ordinary byte-compared group keys
]


@pytest.fixture(scope="module")
def jsonkey_ctl_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_jsonkeyctl", {
        "events": "event_id, ts, user_id, CASE"
        " WHEN event_id % 13 = 0 THEN 'tab' || chr(9) || 'key'"
        " WHEN event_id % 17 = 0 THEN 'nl' || chr(10) || 'key'"
        " WHEN event_id % 19 = 0 THEN 'bs' || chr(8) || 'key'"
        " ELSE event_type END AS event_type, value, props",
    })


@pytest.mark.parametrize("name", JSONKEY_CTL_PARITY)
def test_jsonkey_ctl_parity(spark, jsonkey_ctl_dir, name):
    _assert_parity(spark, jsonkey_ctl_dir, name, "control-char group keys")


#: fixed queries that must agree with their oracle when groups have
#: ZERO VARIANCE (one constant value per type) and one type's every
#: measurement is MISSING (all-NULL) — the round-9 zerovar sweep.
#: Mechanisms closed: streaming stats kernels emit NULL stats (not 0.0
#: sums / ±inf extrema sentinels) for a no-measurement key
#: (state._stats_fields); the cusum kernel excludes rows before a
#: key's first real measurement from the max census (seen flag);
#: count-shaped aggregates use when/otherwise(0) like the oracle's
#: CASE..ELSE 0; render forms pin array_join's explicit 'null'
#: placeholder and to_json's field-dropping; tiny-magnitude
#: DECIMAL(38,4) renders guard DuckDB's scientific-notation misround.
ZERO_VAR_PARITY = [
    "agg_running_stats_by_type",  # raw doubles incl. exact-0-var group
    "proj_wrap_array",         # array render with 'null' placeholders
    "sink_kafka_json",         # concat-propagates-NULL record
    "stream_kafka_pipeline",   # to_json field-dropping record
    "fn_rounding_audit",       # n_diff counts 0, not NULL
    "ts_cusum_alarm",          # n_alarms counts 0, not NULL
    "stream_cusum_alarm",      # kernel seen-flag max census
    "ts_seasonal_profile",     # no-measurement cells hold no peak
    "udf_surface",             # all-NULL key emits no group (filter)
    "sink_python_datasource",  # writer audit skips NULL sums
    "stream_stats_exact_state",  # kernel NULL stats for missing key
]


@pytest.fixture(scope="module")
def zero_var_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_zerovar", {
        "events": "event_id, ts, user_id, event_type, CASE"
        " WHEN event_type = 'click' THEN 42.42"
        " WHEN event_type = 'view' THEN 0.0"
        " WHEN event_type = 'purchase' THEN -13.13"
        " WHEN event_type = 'signup' THEN NULL"
        " ELSE value END AS value, props",
    })


@pytest.mark.parametrize("name", ZERO_VAR_PARITY)
def test_zero_var_corpus_parity(spark, zero_var_dir, name):
    _assert_parity(spark, zero_var_dir, name, "zero-variance groups")


@pytest.fixture(scope="module")
def null_keys_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_nullkeys", {
        "events": "event_id, ts, CASE WHEN event_id % 7 = 0 THEN NULL ELSE"
        " user_id END AS user_id, CASE WHEN event_id % 11 = 0 THEN NULL"
        " ELSE event_type END AS event_type, value, props",
        "documents": "doc_id, text, lang, CASE WHEN doc_id % 11 = 0 THEN"
        " NULL ELSE source END AS source, n_chars",
        "embeddings": "vec_id, embedding, CASE WHEN vec_id % 7 = 0 THEN"
        " NULL ELSE label END AS label",
    })


@pytest.mark.parametrize("name", NULL_KEYS_PARITY)
def test_null_keys_corpus_parity(spark, null_keys_dir, name):
    _assert_parity(spark, null_keys_dir, name, "NULL keys")


@pytest.fixture(scope="module")
def null_payload_dir(tmp_path_factory) -> str:
    """sf0.001 with every third props/text/embedding NULLed (keys and
    measures intact) — the fixture the round-7 NULL-payload sweep ran;
    full-registry result recorded in NOTES_r7 §6."""
    return _build_fixture(tmp_path_factory, "sf_nulls", {
        "events": "event_id, ts, user_id, event_type, value, "
        "CASE WHEN event_id % 3 = 0 THEN NULL ELSE props END AS props",
        "documents": "doc_id, CASE WHEN doc_id % 3 = 0 THEN NULL ELSE text END"
        " AS text, lang, source, n_chars",
        "embeddings": "vec_id, CASE WHEN vec_id % 3 = 0 THEN NULL ELSE"
        " embedding END AS embedding, label",
    })


def _oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        # multi-file layout: DuckDB needs an explicit glob for a
        # directory of parts (Spark's reader handles both natively)
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    return con.execute(sql).df()


def _norm(df):
    # MULTISET of canonicalized rows (Counter, not set: duplicate rows
    # must count — the dup-events regime's exact failure shape)
    from collections import Counter

    rows = Counter()
    for rec in df.to_dict("records"):
        vals = []
        for c in sorted(rec):
            v = rec[c]
            if v is None or (isinstance(v, float) and v != v):
                vals.append(None)
            elif isinstance(v, float):
                vals.append(round(v, 9))
            else:
                vals.append(int(v) if hasattr(v, "item") or isinstance(v, bool) else v)
        rows[tuple(repr(v) for v in vals)] += 1
    return rows


@pytest.mark.parametrize("name", EMPTY_PARITY)
def test_empty_corpus_parity(spark, empty_dir, name):
    _assert_parity(spark, empty_dir, name, "empty corpus")


@pytest.mark.parametrize("name", ONE_ROW_PARITY)
def test_one_row_corpus_parity(spark, one_row_dir, name):
    _assert_parity(spark, one_row_dir, name, "1-row corpus")


@pytest.mark.parametrize("name", NULL_PAYLOAD_PARITY)
def test_null_payload_corpus_parity(spark, null_payload_dir, name):
    _assert_parity(spark, null_payload_dir, name, "NULL payloads")
    # the NULL third must actually be exercised: the result should not
    # simply equal the fully-populated run for ops that drop rows
    if name == "embedding_norms":
        n = registry.QUERIES[name](spark, null_payload_dir).count()
        assert 0 < n < 500


def test_grouping_sets_empty_spark_behavior_is_pinned(spark, empty_dir):
    # The oracle-side HAVING COUNT(*) > 0 guard (round 9) conforms the
    # oracle to Spark's no-global-row-over-empty behavior. Pin the
    # Spark side separately: if Spark ever starts emitting the ()
    # grouping set's global row over an empty relation, the guard (and
    # this pin) should be removed together.
    for name in ("agg_rollup", "agg_cube", "agg_grouping_sets"):
        sdf = registry.QUERIES[name](spark, empty_dir)
        assert sdf.count() == 0, f"{name}: Spark now emits rows on empty input"


#: GIANT DOCUMENTS (round 11, 18th standing sweep): two megabyte-class
#: docs amid the normal corpus — 100k tokens over a 5k vocabulary
#: (cyclic, so gram dedup stays realistic) and 50k copies of ONE token
#: (degenerate repetition). The regime that found the O(L²) gram class:
#: per-element references to an INLINE array expression inside a
#: higher-order lambda re-evaluate it — Spark-side (element_at/slice on
#: the inline split; CSE does not reach lambda bodies) in SEVEN kernels,
#: and DuckDB-side (in-lambda/per-carried-row list_slice) in FOUR
#: oracles. doc_fingerprint alone ran >10 min on a 500k-token doc; all
#: fixed forms (functions/grams.py zip_with chain, struct-pack chunker,
#: indexed-8-gram / window-min / exploded-membership oracles) are
#: linear. This sweep is the canary: a reintroduced quadratic turns one
#: of these parametrizations from ~2 s into minutes.
GIANT_DOC_PARITY = [
    "doc_fingerprint",            # kernel: zip_with 3-grams
    "dedup_ngram_jaccard",        # kernel: _shingles zip_with
    "dedup_containment",          # kernel: _shingles zip_with
    "dedup_minhash_quality",      # kernel: _shingles zip_with
    "dedup_minhash_lsh",          # _signatures path (always linear) stays so
    "text_dup_ngram_fraction",    # kernel + indexed-8-gram oracle
    "dedup_source_overlap_matrix",  # kernel + indexed-8-gram oracle
    "text_ngram_novelty",         # kernel + indexed-8-gram oracle
    "pipeline_doc_scorecard",     # fused path embeds both fragments
    "text_chunk_overlap",         # struct-pack kernel + exploded oracle
    "doc_winnowing",              # window-min oracle
    "dedup_fingerprint_overlap",  # embeds the winnowing oracle
    "dedup_index_tuning_report",  # embeds the winnowing oracle
    # full-registry attestation find (not the focused list): Spark
    # size() is INT and the ppm multiply wrapped at 2,148 OOV tokens
    "text_oov_rate",
]


@pytest.fixture(scope="module")
def giant_doc_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_giantdoc")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t == "documents":
            q = (
                f"SELECT * FROM {src}"
                " UNION ALL "
                "SELECT 900001 AS doc_id,"
                " (SELECT string_agg('w' || (i % 5000), ' ')"
                "  FROM generate_series(1, 100000) t(i)) AS text,"
                " 'en' AS lang, 'giant' AS source, 688895 AS n_chars"
                " UNION ALL "
                "SELECT 900002,"
                " (SELECT string_agg('spam', ' ')"
                "  FROM generate_series(1, 50000) t(i)),"
                " 'en', 'giant', 249999"
            )
        else:
            q = f"SELECT * FROM {src}"
        con.execute(f"COPY ({q}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return str(d)


@pytest.mark.parametrize("name", GIANT_DOC_PARITY)
def test_giant_doc_parity(spark, giant_doc_dir, name):
    _assert_parity(spark, giant_doc_dir, name, "megabyte documents")


#: ADVERSARIAL EMBEDDINGS (round 11, 19th standing sweep): four
#: non-fixture vectors appended — all-zero (norm 0), 1e10-per-component
#: (the garbage-encoder blow-up), 1e-10-per-component (underflow-
#: adjacent), one-hot, and (round 12) one NaN-component and one
#: NULL-component vector, so every clause of the ingest contract is
#: exercised end-to-end (NaN is the documented engine-divergence
#: hazard: DuckDB's float total order puts NaN above +Inf while
#: Spark's NaN comparisons are false — only an explicit isnan test is
#: portable). The 1e10 vector ANSI-killed all three integer-exact
#: embedding ops on first probe (ARITHMETIC_OVERFLOW in the
#: fixed-point quantize/gram chains — one garbage row DoS'ing the
#: whole job); the fix is the ingest contract, not per-op try_*: a
#: vector with any non-NULL-violating, non-finite, or beyond-
#: ±EMB_COMPONENT_ABS_MAX component is NOT a vector (load_embeddings +
#: the _shadow_nonnull_embeddings oracle CTE — the vector twin of the
#: round-9 events magnitude clause). Zero / tiny / one-hot vectors are
#: VALID and must flow through (zero-norm cosine paths NULL-guard).
EMB_ADV_PARITY = [
    "embedding_norms",          # contract carrier: 503 of 506 kept
    "sim_kmeans_exact_cells",   # fixed-point distance chain
    "sim_ivf_exact_topk",       # fixed-point assignment + rerank
    "emb_pca_power",            # gram x eigenvector product chain
    "sim_topk_cosine",          # zero-norm query/target guard
    "dedup_embedding_cosine",   # zero-norm pair guard
    "emb_quantize_int8",        # per-vector scale with zero range
    "array_funcs",              # raw-table scalar pack: sees ALL 506
    # full-registry attestation finds (not the focused list): the
    # zero-norm exclusion must reach the ORACLES too — the unguarded
    # full cosine ANSI-killed matryoshka, and the histogram's oracle
    # hash-sample admitted the zero vector the kernel excludes
    "emb_matryoshka_recall",
    "emb_distance_histogram",
    # round 12 (ADVICE r11 item 3): the contract's drops are no longer
    # silent — the audit must bucket each adversarial vector into the
    # right reason on BOTH engines
    "emb_ingest_audit",
]


@pytest.fixture(scope="module")
def emb_adv_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_embadv")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t == "embeddings":
            q = (
                f"SELECT * FROM {src}"
                " UNION ALL SELECT 900001,"
                " (SELECT list(CAST(0.0 AS FLOAT))"
                "  FROM generate_series(1,64)), 1"
                " UNION ALL SELECT 900002,"
                " (SELECT list(CAST(1e10 AS FLOAT))"
                "  FROM generate_series(1,64)), 2"
                " UNION ALL SELECT 900003,"
                " (SELECT list(CAST(1e-10 AS FLOAT))"
                "  FROM generate_series(1,64)), 3"
                " UNION ALL SELECT 900004,"
                " (SELECT list(CAST(CASE WHEN j = 1 THEN 1.0 ELSE 0.0 END"
                "   AS FLOAT)) FROM generate_series(1,64) s(j)), 4"
                " UNION ALL SELECT 900005,"
                " (SELECT list(CAST(CASE WHEN j = 1 THEN 'nan' ELSE '1.0'"
                "   END AS FLOAT)) FROM generate_series(1,64) s(j)), 5"
                " UNION ALL SELECT 900006,"
                " (SELECT list(CASE WHEN j = 1 THEN NULL"
                "   ELSE CAST(1.0 AS FLOAT) END)"
                "  FROM generate_series(1,64) s(j)), 6"
            )
        else:
            q = f"SELECT * FROM {src}"
        con.execute(f"COPY ({q}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return str(d)


@pytest.mark.parametrize("name", EMB_ADV_PARITY)
def test_emb_adv_parity(spark, emb_adv_dir, name):
    _assert_parity(spark, emb_adv_dir, name, "adversarial embeddings")
    if name == "embedding_norms":
        # the contract must have filtered EXACTLY the 1e10, NaN, and
        # NULL-component vectors: zero, tiny, and one-hot are valid
        # vectors and must survive
        n = registry.QUERIES[name](spark, emb_adv_dir).count()
        assert n == 503, f"expected 503 kept vectors, got {n}"
    if name == "emb_ingest_audit":
        # each drop lands in its own bucket, and the counts are exact
        got = {
            r["reason"]: r["n_rows"]
            for r in registry.QUERIES[name](spark, emb_adv_dir)
            .toPandas()
            .to_dict("records")
        }
        assert got == {
            "kept": 503,
            "null_vec_id": 0,
            "null_embedding": 0,
            "null_component": 1,
            "nan_component": 1,
            "overcap_component": 1,
        }, got


#: HOSTILE UNICODE (round 12, 20th standing sweep): the mild unicode_dir
#: sweep above covers accents/CJK/one emoji/RTL; this one is the
#: engine-divergence tier the round-11 verdict commissioned — zero-width
#: characters inside and between tokens, Zalgo combining stacks, the
#: Turkish-İ/ß/final-sigma case-mapping traps, bidi controls, C0
#: controls (tab/CR must NOT split: the tokenizer contract is
#: split-on-' ' only), deep astral plane (UTF-16 surrogate territory in
#: Spark's UTF8String), variation-selector/ZWJ emoji sequences, and
#: Unicode spaces (NBSP/EM/IDEOGRAPHIC) as the only separators. First
#: probe (scripts/uniadv.py, round 12): 0 divergences / 29 — recorded
#: so it STAYS that way. Fixture bodies live in scripts/uniadv.py
#: (ADV_DOCS) so the probe and the sweep cannot drift.
UNIADV_PARITY = [
    "text_normalize",          # casefold over İ/ß/ς
    "token_count",             # split-on-' ' byte discipline
    "text_quality_score",      # regex classes over controls
    "lang_id_ngram",           # char n-grams + casefold
    "doc_fingerprint",         # hashing sees identical bytes
    "text_char_ngram_profile", # substr/codepoint semantics
    "text_pii_redact",         # Java regex vs RE2 on \w-ish classes
    "text_oov_rate",           # token-membership over hostile tokens
    "udtf_chunk_docs",         # Python-side slicing of astral text
    "dedup_minhash_quality",   # shingles over zero-width tokens
]


@pytest.fixture(scope="module")
def uniadv_dir(tmp_path_factory) -> str:
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.uniadv import ADV_DOCS

    d = tmp_path_factory.mktemp("sf_uniadv")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE adv_docs (doc_id BIGINT, text VARCHAR,"
        " lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    for doc_id, text, lang, source in ADV_DOCS:
        con.execute(
            "INSERT INTO adv_docs VALUES (?, ?, ?, ?, ?)",
            [doc_id, text, lang, source, len(text)],
        )
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t == "documents":
            q = f"SELECT * FROM {src} UNION ALL SELECT * FROM adv_docs"
        else:
            q = f"SELECT * FROM {src}"
        con.execute(f"COPY ({q}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return str(d)


@pytest.mark.parametrize("name", UNIADV_PARITY)
def test_uniadv_parity(spark, uniadv_dir, name):
    _assert_parity(spark, uniadv_dir, name, "hostile unicode")
    if name == "token_count":
        # pin the tokenizer contract on the two trap documents: ASCII
        # space is the ONLY separator, so 920008 (unicode-space-
        # separated) is ONE token and 920005 (tab/CR-glued) keeps its
        # glued pairs single
        rows = {
            r["doc_id"]: r["n_ws_tokens"]
            for r in registry.QUERIES[name](spark, uniadv_dir)
            .filter("doc_id IN (920005, 920008)")
            .toPandas()
            .to_dict("records")
        }
        assert rows[920008] == 2, rows  # "...end" + the glued blob
        assert rows[920005] == 6, rows  # tab/cr glue, ' ' splits


#: DEEP-NESTED / VARIANT-COERCION PROPS (round 12, 21st standing
#: sweep): the JSONNEST probe's two finds, pinned. (1) DEPTH: Spark's
#: JSON functions inherit Jackson's 1000-container DoS guard — a
#: >1000-deep props document fails the WHOLE parse (healthy top-level
#: keys extract NULL too), while DuckDB's yyjson parses it; the
#: contract (jsonf.PROPS_JSON_MAX_DEPTH) adopts Spark's cap and the
#: five props-parsing oracles carry a string-literal-safe bracket-depth
#: mirror in their events shadow CTE. (2) COERCION: try_variant_get
#: (v, '$.k', 'int') semantics differ from DuckDB TRY_CAST on
#: non-integral strings ("2.25"/"2e1"/"0x10" -> Spark NULL, DuckDB
#: rounds/parses), non-integral numbers (Spark truncates toward zero,
#: DuckDB rounds half-away), and booleans (Spark 1/0, DuckDB NULL);
#: fn_variant_json's oracle now mirrors per-JSON-type. Fixture bodies
#: live in scripts/jsonnest.py (PROPS_BY_MOD) so probe and sweep
#: cannot drift.
JSONNEST_PARITY = [
    "fn_json_get_string",     # depth: extraction NULL past the cap
    "fn_cast_string_double",  # depth + string-double cast
    "fn_variant_json",        # depth + the full coercion matrix
    "json_key_inventory",     # depth: key walk sees no over-deep doc
    "null_handling",          # depth: parse-based non-null counts
    "json_corrupt_policy",    # census semantics agree WITHOUT the
    "dq_column_profile",      # shadow (deliberately unshadowed — a
    "stream_column_profile",  # regression here means their kernels
                              # started parsing props keys)
]


@pytest.fixture(scope="module")
def jsonnest_dir(tmp_path_factory) -> str:
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.jsonnest import PROPS_BY_MOD

    d = tmp_path_factory.mktemp("sf_jsonnest")
    con = duckdb.connect()
    case = "CASE " + " ".join(
        f"WHEN event_id % {m} = 0 THEN ?" for m in PROPS_BY_MOD
    ) + " ELSE props END AS props"
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t == "events":
            con.execute(
                f"COPY (SELECT event_id, ts, user_id, event_type, value,"
                f" {case} FROM {src}) TO '{d}/{t}.parquet'"
                " (FORMAT PARQUET)",
                list(PROPS_BY_MOD.values()),
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM {src}) TO '{d}/{t}.parquet'"
                " (FORMAT PARQUET)"
            )
    return str(d)


@pytest.mark.parametrize("name", JSONNEST_PARITY)
def test_jsonnest_parity(spark, jsonnest_dir, name):
    _assert_parity(spark, jsonnest_dir, name, "deep-nested props")
    if name == "fn_json_get_string":
        # pin the depth contract end-to-end: the 1200-deep rows (%67,
        # %71) extract NULL despite carrying a healthy top-level k;
        # the 901-deep row (%61, under the cap) extracts its k
        rows = {
            r["event_id"]: r["k_str"]
            for r in registry.QUERIES[name](spark, jsonnest_dir)
            .filter("event_id IN (61, 67, 71, 73)")
            .toPandas()
            .to_dict("records")
        }
        assert rows[61] == "2.25" and rows[73] == "3.5", rows
        assert rows[67] is None and rows[71] is None, rows


#: MAXIMAL DUPLICATION (round 12, 22nd standing sweep): every document
#: the same 40-word text, every embedding the same vector — the
#: opposite pole of HIGHCARD. Stresses the hot-bucket quarantine
#: (every LSH band collapses to ONE bucket), ranking under total ties
#: (every cosine identical — a kernel/oracle tie-break mismatch
#: silently diverges the selected set), zero variance (rank-1 PCA
#: gram, zero quantizer range), and the all-pairs dedup censuses.
#: First probe (scripts/maxdup.py, round 12): 0 divergences / 42
#: focused + 0 / 328 full attestation. Fixture bodies in
#: scripts/maxdup.py (build) so probe and sweep cannot drift.
MAXDUP_PARITY = [
    "dedup_minhash_lsh",      # mega-bucket quarantined on BOTH engines
    "dedup_simhash_pairs",    # emits exactly C(n,2) ties
    "dedup_cluster_keep",     # one cluster of size N
    "sim_topk_cosine",        # top-k under total ties
    "emb_knn_graph",          # kNN census under total ties
    "emb_pca_power",          # rank-1 gram, power iteration
    "emb_quantize_int8",      # zero per-vector range
    "sim_kmeans_exact_cells", # all points one cell, empties elsewhere
    "emb_dim_variance",       # exact zero variances
    "doc_winnowing",          # identical fingerprints everywhere
]


@pytest.fixture(scope="module")
def maxdup_dir(tmp_path_factory) -> str:
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import scripts.maxdup as M

    d = tmp_path_factory.mktemp("sf_maxdup")
    orig = M.OUT
    try:
        M.OUT = str(d)
        M.build()
    finally:
        M.OUT = orig
    return str(d)


@pytest.mark.parametrize("name", MAXDUP_PARITY)
def test_maxdup_parity(spark, maxdup_dir, name):
    _assert_parity(spark, maxdup_dir, name, "maximal duplication")
    if name == "dedup_minhash_lsh":
        # the quarantine must actually have fired: the one mega-bucket
        # exceeds the cap, so the op reports NO pairs rather than
        # exploding into C(500,2) — identically on both engines (the
        # oracle parity above proves the DuckDB side agrees)
        n = registry.QUERIES[name](spark, maxdup_dir).count()
        assert n == 0, f"expected quarantined empty result, got {n} rows"
    if name == "dedup_simhash_pairs":
        # the all-pairs census is exact: C(500, 2)
        n = registry.QUERIES[name](spark, maxdup_dir).count()
        assert n == 124750, n


#: ADVERSARIAL DOCUMENT IDENTITY (round 12, 23rd standing sweep). The
#: DOCKEY probe ran NULL / negative / near-int64-max / colliding
#: doc_ids through the full registry: 22 divergences. Outcome — the
#: documents identity contract: (a) NULL doc_id rows are dropped by
#: the identity-KEYED operators (tables.load_documents_keyed + the
#: registry._shadow_keyed_documents oracle mirror on exactly those 18
#: oracles) — a document without identity cannot be deduped,
#: fingerprinted, packed, sampled, manifested, or used as a blob key,
#: and left in it ANSI-killed the mapInPandas decode tier (int(None))
#: and diverged NULLS-ordering shapes; content-keyed ops keep NULL-id
#: docs and their parity is attested by this sweep. (b) Negative and
#: near-max ids are valid identities everywhere (the one bug —
#: src_binary_files' filename regexp missing '-?' — ANSI-killed on a
#: single negative id; fixed below). (c) doc_id UNIQUENESS is a
#: declared PRECONDITION: under collisions the engines disagree on
#: merged-identity semantics (winnowing fingerprint sets, containment
#: denominators, chunk numbering) — pinned by the divergence test so
#: the boundary is honest, like the raw-control-chars JSON key
#: precondition (round 11).
DOCKEY_PARITY = [
    "mm_feature_extract",       # int(doc_id) kill class, fixed
    "mm_frame_sample",
    "mm_byte_histogram",
    "mm_shard_manifest",
    "src_binary_files",         # negative-id regexp fix
    "doc_winnowing",            # keyed: NULL-id docs dropped
    "text_ngram_novelty",       # first-claim MIN(doc_id)
    "text_vocab_growth",        # ordered by doc_id
    "pack_epoch_shuffle",       # hash(doc_id) positions
    "sample_reservoir_group",
    "pipeline_dedup_filter",
    "text_quality_score",       # CONTENT-keyed: NULL-id doc KEPT
    "token_count",              # ditto
    "dedup_exact",              # content-hash dedup: NULL-id kept
]


@pytest.fixture(scope="module")
def dockey_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_dockey", {
        "documents": "CASE"
        " WHEN doc_id % 11 = 0 THEN -doc_id"
        " WHEN doc_id % 13 = 0 THEN 9223372036854775307 + doc_id"
        " WHEN doc_id % 17 = 0 THEN NULL"
        " ELSE doc_id END AS doc_id, text, lang, source, n_chars",
    })


@pytest.mark.parametrize("name", DOCKEY_PARITY)
def test_dockey_parity(spark, dockey_dir, name):
    _assert_parity(spark, dockey_dir, name, "adversarial doc identity")
    if name == "text_quality_score":
        # content-keyed ops must NOT drop the NULL-id documents: all
        # 500 rows scored (the contract is narrow on purpose)
        n = registry.QUERIES[name](spark, dockey_dir).count()
        assert n == 500, n
    if name == "doc_winnowing":
        # keyed ops must have dropped exactly the NULL-id documents:
        # no NULL group in the output
        n = (
            registry.QUERIES[name](spark, dockey_dir)
            .filter("doc_id IS NULL")
            .count()
        )
        assert n == 0, f"{n} NULL-id fingerprints leaked through"


def test_dockey_collision_precondition_is_pinned(spark, tmp_path_factory):
    """doc_id uniqueness is a PRECONDITION, not handled semantics:
    under id collisions the kernel and oracle disagree on merged
    identity (different fingerprint/chunk censuses). This pin keeps
    the boundary honest — if collision support is ever implemented,
    it fails and the precondition note must be retired."""
    d = _build_fixture(tmp_path_factory, "sf_dockey_collide", {
        "documents": "CASE WHEN doc_id % 19 = 0 THEN 42 ELSE doc_id END"
        " AS doc_id, text, lang, source, n_chars",
    })
    sdf = registry.QUERIES["doc_winnowing"](spark, d).toPandas()
    odf = _oracle(d, registry.ORACLES["doc_winnowing"])
    assert len(sdf) != len(odf) or _norm(sdf) != _norm(odf), (
        "collision handling now agrees — retire the precondition"
    )


#: ADVERSARIAL VECTOR IDENTITY (round 12, 24th standing sweep) — the
#: embeddings-table mirror of DOCKEY. NULL / negative / near-int64-max
#: / colliding vec_ids through the embedding tier found 6 divergences:
#: the centroid/codebook SEED picks and top-k tie-breaks are ORDERED BY
#: vec_id, so a NULL id rode the engines' opposite NULLS FIRST/LAST
#: defaults into different k-means/PQ/IVF seeds (silently different
#: clustering), and a colliding id makes the seed/tie order ambiguous
#: by construction. Contract: vec_id IS NOT NULL joined the tier's
#: ingest clause (load_embeddings + the _shadow_nonnull_embeddings
#: oracle CTE — one choke point for the whole tier), with the drop
#: observable as emb_ingest_audit's 'null_vec_id' reason; negative and
#: near-max ids are valid identities (attested); vec_id UNIQUENESS is
#: a declared precondition pinned by the divergence test below.
VECKEY_PARITY = [
    "sim_kmeans_exact_cells",   # vec_id-ordered centroid seeds
    "sim_ivf_exact_topk",       # IVF over the same seeds
    "emb_pq_codebook",          # codebook training sample
    "sim_pq_adc_topk",          # ADC over the codebook
    "sim_srp_topk",             # banded candidates + rerank ties
    "emb_knn_srp_graph",        # kNN edges identified by vec_id
    "embedding_norms",          # contract carrier: NULL-id drop count
    "emb_ingest_audit",         # the drop is observable
    "sim_topk_cosine",          # result identity under hostile ids
    "emb_knn_graph",            # exact census twin
]


@pytest.fixture(scope="module")
def veckey_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_veckey", {
        "embeddings": "CASE"
        " WHEN vec_id % 11 = 0 THEN -vec_id"
        " WHEN vec_id % 13 = 0 THEN 9223372036854775307 + vec_id"
        " WHEN vec_id % 17 = 0 THEN NULL"
        " ELSE vec_id END AS vec_id, embedding, label",
    })


@pytest.mark.parametrize("name", VECKEY_PARITY)
def test_veckey_parity(spark, veckey_dir, name):
    _assert_parity(spark, veckey_dir, name, "adversarial vec identity")
    if name == "emb_ingest_audit":
        got = {
            r["reason"]: r["n_rows"]
            for r in registry.QUERIES[name](spark, veckey_dir)
            .toPandas()
            .to_dict("records")
        }
        # 25 NULL ids dropped AND visible; everything else kept
        assert got["null_vec_id"] == 25 and got["kept"] == 475, got


def test_veckey_collision_precondition_is_pinned(spark, tmp_path_factory):
    """vec_id uniqueness is a PRECONDITION: colliding ids make the
    vec_id-ordered seed picks and tie-breaks ambiguous, and the
    engines disagree. If collision support is ever implemented this
    fails and the precondition note must be retired."""
    d = _build_fixture(tmp_path_factory, "sf_veckey_collide", {
        "embeddings": "CASE WHEN vec_id % 19 = 0 THEN 7 ELSE vec_id END"
        " AS vec_id, embedding, label",
    })
    sdf = registry.QUERIES["sim_kmeans_exact_cells"](spark, d).toPandas()
    odf = _oracle(d, registry.ORACLES["sim_kmeans_exact_cells"])
    assert _norm(sdf) != _norm(odf), (
        "collision handling now agrees — retire the precondition"
    )


#: ADVERSARIAL USER IDENTITY (round 12, 25th standing sweep): NULL /
#: negative / near-int64-max / COLLIDING user_ids through the events
#: tier — the grouping/state key everywhere (stateful streaming keys
#: state per user, sessionizers window by user, salting arithmetic
#: hashes user_id). Unlike doc_id/vec_id, user_id is a GROUPING key,
#: not an identity with uniqueness semantics — collisions are just
#: bigger groups and NULL is the anonymous-traffic bucket — so the
#: whole regime must PASS as-is, no contract. First probe (round 12):
#: **0 divergences / 328 full-registry attestation, first pass** — the
#: round-7/8 NULL-keys alignments (eqNullSafe, NULLS LAST, any-NULL
#: drops) generalize to the hostile-id classes. This sweep keeps it
#: that way.
USERKEY_PARITY = [
    "agg_running_stats",          # flagship: per-user grouping
    "agg_salted_wordcount",       # salting arithmetic over user_id
    "stream_stats_exact_state",   # one state entry per hostile key
    "stream_sessionize_custom",   # sessions under NULL/extreme users
    "agg_session_window",         # session windows per user
    "seq_top_paths",              # per-user event sequences
    "join_interval_grid",         # per-user intervals
    "funnel_conversion",          # per-user funnels
    "ts_sliding_dau",             # distinct-user census
    "mart_user_360",              # the widest per-user rollup
]


@pytest.fixture(scope="module")
def userkey_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_userkey", {
        "events": "event_id, ts, CASE"
        " WHEN event_id % 11 = 0 THEN -user_id - 1"
        " WHEN event_id % 13 = 0 THEN 9223372036854775307 + user_id"
        " WHEN event_id % 17 = 0 THEN NULL"
        " WHEN event_id % 19 = 0 THEN 5"
        " ELSE user_id END AS user_id, event_type, value, props",
    })


@pytest.mark.parametrize("name", USERKEY_PARITY)
def test_userkey_parity(spark, userkey_dir, name):
    _assert_parity(spark, userkey_dir, name, "adversarial user identity")


#: HOSTILE CATEGORY VALUES (round 12, 26th standing sweep): empty
#: string, whitespace-only, case variants, multibyte accents, and a
#: 10,000-char value through every grouping/pivot/partitioned-write
#: surface that keys on event_type / lang / source. Find: the
#: 10k-char value CRASHED all three hive-partitioned writers
#: (TASK_WRITE_FAILED — ``key=<value>`` exceeds the 255-byte
#: directory-segment cap; one hostile row DoS'ing the LAYOUT tier).
#: Contract: a partition value over PARTITION_KEY_MAX_BYTES UTF-8
#: bytes is UNPARTITIONABLE and routes to the hive default (null)
#: partition before the write (tables.partitionable_key), the same
#: observable the format already imposes on '' (round-9); oracles
#: mirror with an octet_length CASE. Everything else (grouping,
#: pivots, case variants, accents) passed first try — the round-9
#: groupkey discipline held.
CATKEY_PARITY = [
    "sink_parquet_roundtrip",   # partitioned write, keys conflated
    "src_partition_prune",      # kernel guard only (IN-filter oracle)
    "stream_file_sink",         # streaming partitioned writer
    "src_file_formats",         # CSV/JSON text keys survive verbatim
    "sink_compaction",          # non-partitioned writer: unaffected
    "agg_running_stats",        # grouping on hostile categories
    "agg_pivot",                # pivot labels
    "lang_id_ngram",            # lang category groups
    "pack_interleave_order",    # source category round-robin
]


@pytest.fixture(scope="module")
def catkey_dir(tmp_path_factory) -> str:
    return _build_fixture(tmp_path_factory, "sf_catkey", {
        "events": "event_id, ts, user_id, CASE"
        " WHEN event_id % 11 = 0 THEN ''"
        " WHEN event_id % 13 = 0 THEN ' '"
        " WHEN event_id % 19 = 0 THEN upper(event_type)"
        " WHEN event_id % 23 = 0 THEN event_type || chr(233)"
        " WHEN event_id % 29 = 0 THEN repeat('k', 10000)"
        " ELSE event_type END AS event_type, value, props",
        "documents": "doc_id, text,"
        " CASE WHEN doc_id % 11 = 0 THEN '' WHEN doc_id % 13 = 0 THEN ' '"
        " WHEN doc_id % 19 = 0 THEN upper(lang) ELSE lang END AS lang,"
        " CASE WHEN doc_id % 17 = 0 THEN '' WHEN doc_id % 23 = 0 THEN"
        " source || chr(233) ELSE source END AS source, n_chars",
    })


@pytest.mark.parametrize("name", CATKEY_PARITY)
def test_catkey_parity(spark, catkey_dir, name):
    _assert_parity(spark, catkey_dir, name, "hostile category values")
    if name == "sink_parquet_roundtrip":
        # the over-long key must have been routed to the default
        # partition (read back NULL), not crashed the write and not
        # silently dropped: its stats row is present with a NULL key
        sdf = registry.QUERIES[name](spark, catkey_dir).toPandas()
        assert sdf["readTag_id"].isna().sum() >= 1, "long key row lost"


#: ADVERSARIAL TIME (round 13, 27th standing sweep — VERDICT r12 item
#: 5): window-edge inclusivity one microsecond each side of the
#: half-open clock-validity boundary, negative-epoch/9999 drops, the
#: int32-wrap instant kept, a ~17-row identical-microsecond tie
#: cohort, DST/leap-day/year-end walls, and NULL ts — through the
#: ordering/bucketing/as-of/sessionize/grid surface. Probe result
#: (scripts/timeadv.py): ZERO semantic divergences over 51 queries +
#: 0/328 full-registry attestation; the one find was a SCALE class —
#: ts_resample_interp's forward-neighbor window used Spark's
#: UnboundedFollowing (shrinking) frame, O(n²) per partition, and the
#: two in-window edge rows (1990 + 2099) stretch the hourly grid to
#: ~964k rows/type: 15+ min of one core. Fixed as a running last over
#: DESCENDING hour (same semantics, O(n log n)); the widest-span grid
#: (4.8M rows) now value-matches DuckDB in seconds. The fixture spec
#: is imported from the probe so they cannot drift.
TIMEADV_PARITY = [
    "ts_resample_interp",     # the find: widest-span grid, exact match
    "ts_resample_ffill",      # daily twin on the same span
    "ts_gap_stats",           # gap stats across 110-year gaps
    "ts_rolling_window_1h",   # half-open hour buckets at the walls
    "join_asof_nearest",      # as-of matching under exact-ts ties
    "join_asof_forward",
    "agg_session_window",     # sessionization: tie cohort, edge spans
    "funnel_conversion",      # step ordering under equal timestamps
    "scd2_intervals",         # interval validity at the extremes
    "seq_top_paths",          # sequence order under ties
    "dq_freshness_sla",       # freshness vs the 2099 edge row
    "attribution_last_touch", # last-touch tie-break at equal ts
    "ts_dayn_retention",      # day grids across the span
    "mart_user_360",          # the wide rollup, all classes at once
]


@pytest.fixture(scope="module")
def timeadv_dir(tmp_path_factory) -> str:
    from scripts.timeadv import ts_case_sql

    return _build_fixture(tmp_path_factory, "sf_timeadv", {
        "events": f"event_id, {ts_case_sql()}, user_id, event_type,"
        " value, props",
    })


@pytest.mark.parametrize("name", TIMEADV_PARITY)
def test_timeadv_parity(spark, timeadv_dir, name):
    _assert_parity(spark, timeadv_dir, name, "adversarial time")


def test_timeadv_contract_pins(spark, timeadv_dir):
    """The fixture's keep/drop arithmetic, pinned: the half-open
    window keeps both in-window edge microseconds and drops the
    out-by-one pair, the epoch extremes, and NULL ts; the tie cohort
    survives intact at one shared microsecond."""
    from spark_streaming_stream_analyzer_spark.sources.tables import (
        load_table,
    )
    import duckdb as _dd

    ev = load_table(spark, timeadv_dir, "events")
    con = _dd.connect()
    raw = f"read_parquet('{timeadv_dir}/events.parquet')"
    # expected keeps, computed from the raw fixture by the contract
    exp = con.execute(
        f"SELECT count(*) FROM {raw} WHERE ts IS NOT NULL"
        " AND epoch_us(ts) >= 631152000000000"
        " AND epoch_us(ts) < 4102444800000000"
    ).fetchone()[0]
    assert ev.count() == exp
    dropped = con.execute(f"SELECT count(*) FROM {raw}").fetchone()[0] - exp
    assert dropped >= 30, "drop classes missing from the fixture"
    # the edge microseconds are KEPT (inclusivity parity is exact)
    kept_edges = ev.filter(
        "ts IN (TIMESTAMP_NTZ '1990-01-01 00:00:00',"
        " TIMESTAMP_NTZ '2099-12-31 23:59:59.999999')"
    ).count()
    assert kept_edges >= 2, "window-edge rows lost"
    # the identical-microsecond tie cohort is intact
    ties = ev.filter("ts = TIMESTAMP_NTZ '2024-01-15 12:00:00'").count()
    assert ties >= 10, f"tie cohort too small: {ties}"


#: HOSTILE RELATIONAL TEXT (round 13, standing sweep): the STRADV
#: probe classes — NULL / '' / newline-tab-CR / NUL-byte / unicode /
#: 10-50 KB strings / LIKE-regexp metacharacters as data — through the
#: 51 queries reading TPC-H text columns. The round's three lockstep
#: fixes live here: string_funcs' NULL-propagating brand_type concat,
#: q21's name-grain regroup after the supplier key join, approx_aggs'
#: null-safe group rejoins. Engine-native lower()/upper() SpecialCasing
#: divergences (İ, final Σ, upper ß) are pinned in
#: test_edge_divergence.py::test_lower_casemap_divergence_pinned and
#: excluded from this fixture by design. Spec imported from the probe
#: so they cannot drift.
STRADV_PARITY = [
    "string_funcs",             # the raw string-scalar pack
    "q21_waiting_suppliers",    # name-grain merge incl. NULL names
    "approx_aggs",              # NULL flag group survives rejoins
    "q1_pricing_summary",       # NULL/newline group keys
    "q14_promo_revenue",        # LIKE over '%BRASS'-class data
    "q16_part_supplier_counts", # NOT-LIKE + NULL p_type filters
    "agg_collect_ordered",      # ordered list agg, hostile priorities
    "distinct_dedup",           # '' vs NULL as distinct keys
    "dq_pipeline_fingerprint",  # md5 over NUL/newline/unicode text
    "sample_split_hash",        # portable hash on NULL flags
    "window_topk_per_group",    # NULL p_brand partitions
    "target_encode_oof",        # NULL priority encode groups
    "join_semi",                # NULL c_name probe side
    "join_broadcast_agg",       # NULL p_brand broadcast group
]


@pytest.fixture(scope="module")
def stradv_dir(tmp_path_factory) -> str:
    from scripts.stradv import SPEC

    return _build_fixture(tmp_path_factory, "sf_stradv", dict(SPEC))


@pytest.mark.parametrize("name", STRADV_PARITY)
def test_stradv_parity(spark, stradv_dir, name):
    _assert_parity(spark, stradv_dir, name, "hostile relational text")


def test_stradv_contract_pins(spark, stradv_dir):
    """Fixture-shape pins: the classes the sweep claims to exercise
    must actually be present, and the two headline lockstep semantics
    hold on hostile rows."""
    import duckdb as _dd

    from spark_streaming_stream_analyzer_spark.sources.tables import (
        load_table,
    )

    con = _dd.connect()
    part = f"read_parquet('{stradv_dir}/part.parquet')"
    # the quadratic-levenshtein row: both args 10k chars
    lens = con.execute(
        f"SELECT length(p_brand), length(p_type) FROM {part}"
        " WHERE p_partkey = 199"
    ).fetchone()
    assert lens == (10000, 10000), f"lev row moved: {lens}"
    # NUL byte survives the parquet round trip into BOTH engines
    nul = con.execute(
        f"SELECT p_name FROM {part} WHERE p_partkey = 71"
    ).fetchone()[0]
    assert nul == "ab\x00cd"
    srow = (
        load_table(spark, stradv_dir, "part")
        .filter("p_partkey = 71")
        .collect()[0]
    )
    assert srow.p_name == "ab\x00cd"
    # >=2 NULL-named suppliers so q21's name-grain merge is exercised
    nn = con.execute(
        f"SELECT count(*) FROM read_parquet('{stradv_dir}/supplier.parquet')"
        " WHERE s_name IS NULL"
    ).fetchone()[0]
    assert nn >= 2, f"NULL-name supplier cohort too small: {nn}"
    # brand_type NULL-propagates on a NULL p_type row (key 79: type
    # NULL, brand present)
    bt = (
        registry.QUERIES["string_funcs"](spark, stradv_dir)
        .filter("p_partkey = 79")
        .collect()[0]
        .brand_type
    )
    assert bt is None, f"brand_type must NULL-propagate: {bt!r}"
    # the NULL l_returnflag group is non-empty and reaches the
    # approx_aggs output
    out = registry.QUERIES["approx_aggs"](spark, stradv_dir).toPandas()
    assert out["l_returnflag"].isna().any(), "NULL flag group dropped"


#: HOSTILE INTEGER DOMAINS (round 13, standing sweep): the INTADV
#: probe classes — NULL / orphan / negated / near-2^62 FOREIGN keys
#: (PKs stay intact: uniqueness is the pinned DOCKEY/VECKEY-style
#: precondition) and int32-extreme p_size / l_linenumber / c_nationkey
#: — through the join graph: TPC-H joins, the graph family's bipartite
#: node encode, asof/window partitions on o_custkey, salting,
#: zorder's % fold. The round's four lockstep fixes live here:
#: join_salted_skew's pmod salt (Java % minted a negative salt and
#: SILENTLY dropped the row from the join), the graph node-encode
#: domain gate (GRAPH_NODE_ABS_MAX — key*2 ANSI-killed both engines at
#: 2^62), the negative-safe & 1 type decode, and the integer-exact
#: wedge halving (the oracle's /2 detoured through DOUBLE and rounded
#: clustering_ppm off by one). Spec imported from the probe.
INTADV_PARITY = [
    "join_salted_skew",           # pmod salt: salted == plain identity
    "graph_connected_components", # encode gate + & 1 decode
    "graph_kcore",                # ditto
    "graph_bfs_distances",        # encode gate via _cc_edges
    "graph_triangle_count",       # integer-exact wedge halving
    "graph_pagerank_exact",       # string-encoded ids, hostile keys
    "graph_degree_assortativity",
    "rec_copurchase_topk",        # raw-key co-purchase under NULL FKs
    "join_full_outer",            # NULL keys must SURVIVE outer joins
    "join_asof_latest_order",     # NULL/huge o_custkey asof partitions
    "window_rank_funcs",          # NULL custkey window partition
    "dq_relationship_profile",    # FK integrity REPORTED, not crashed
    "layout_zorder_stats",        # % 2^16 fold over negative/huge keys
    "q5_local_supplier_volume",   # the deep join chain
]


@pytest.fixture(scope="module")
def intadv_dir(tmp_path_factory) -> str:
    from scripts.intadv import SPEC

    return _build_fixture(tmp_path_factory, "sf_intadv", dict(SPEC))


@pytest.mark.parametrize("name", INTADV_PARITY)
def test_intadv_parity(spark, intadv_dir, name):
    _assert_parity(spark, intadv_dir, name, "hostile integer domains")


def test_intadv_contract_pins(spark, intadv_dir):
    """Fixture-shape + contract pins: the hostile classes are present,
    the node-encode gate drops exactly the out-of-domain edges, and
    the salted join equals the plain join on hostile salt sources."""
    import duckdb as _dd

    con = _dd.connect()
    li = f"read_parquet('{intadv_dir}/lineitem.parquet')"
    od = f"read_parquet('{intadv_dir}/orders.parquet')"
    null_fk, neg_fk, huge_fk = con.execute(
        f"SELECT count(*) FILTER (l_partkey IS NULL),"
        f" count(*) FILTER (l_partkey < 0),"
        f" count(*) FILTER (l_partkey > 4e18) FROM {li}"
    ).fetchone()
    assert null_fk >= 10 and neg_fk >= 10 and huge_fk >= 10, (
        null_fk, neg_fk, huge_fk,
    )
    neg_salt = con.execute(
        f"SELECT count(*) FILTER (l_linenumber < 0) FROM {li}"
    ).fetchone()[0]
    assert neg_salt >= 5, f"negative salt-source cohort missing: {neg_salt}"
    # the salted join's revenue equals the plain-join oracle's (the
    # identity the operator exists to prove — silently broken by a
    # negative salt before the pmod fix)
    sdf = registry.QUERIES["join_salted_skew"](spark, intadv_dir).toPandas()
    odf = _oracle(intadv_dir, registry.ORACLES["join_salted_skew"])
    assert _norm(sdf) == _norm(odf)
    # encode-domain gate: the CC node census excludes the 2^62-keyed
    # and NULL endpoints in BOTH engines (parity is test_intadv_parity;
    # here pin that hostile endpoints exist upstream of a green run)
    hostile_cust = con.execute(
        f"SELECT count(*) FILTER (o_custkey IS NULL OR o_custkey < 0"
        f" OR o_custkey > 4e18) FROM {od}"
    ).fetchone()[0]
    assert hostile_cust >= 20, f"hostile custkey cohort: {hostile_cust}"
