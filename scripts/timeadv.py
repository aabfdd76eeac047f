"""TIMEADV witness (round 13, VERDICT r12 item 5): adversarial time
through the ts-keyed surface — the one fixture axis no prior sweep
attacked (UNIADV/JSONNEST/MAXDUP/DOCKEY/VECKEY/USERKEY/CATKEY covered
text, JSON, duplication, identity keys, and category keys).

Classes, chosen against the events ingest contract
(``sources/tables.py``: clock-validity window [1990-01-01, 2100-01-01)
epoch-us, half-open) and the engines' order/tie semantics:

- **Window-edge inclusivity** (the half-open boundary, one microsecond
  each side): 1990-01-01T00:00:00.000000 KEPT, 1989-12-31
  23:59:59.999999 DROPPED, 2099-12-31T23:59:59.999999 KEPT,
  2100-01-01T00:00:00.000000 DROPPED. A ``>=`` / ``>`` or ``<`` /
  ``<=`` mismatch between ``clean_measurements`` and the
  ``_shadow_finite_events`` CTE shows up as a one-row count skew in
  every events consumer. The two KEPT edges also stretch every
  per-group calendar span to 110 years — the grid-resample family must
  survive (and agree on) the widest span the contract admits.
- **Epoch boundaries**: 1969-12-31 (negative epoch) and 9999-12-31
  DROPPED by the window; 2038-01-19T03:14:08 (int32 wrap) KEPT — no
  32-bit truncation anywhere in either engine.
- **Identical-microsecond ties**: every ``event_id % 59 == 0`` row
  (~17 of 1000, spread over users and event types) is stamped
  2024-01-15T12:00:00.000000 exactly. Ranking, as-of matching,
  sessionization, dedup-by-recency, and sequence ordering all sort on
  ts — any ORDER BY without a full deterministic tie-break diverges
  here. The natural fixture never collides at the microsecond grain,
  so this axis was genuinely unprobed.
- **Calendar walls** (inert by design under TIMESTAMP_NTZ + the
  UTC-pinned session, probed to prove it): the US spring-forward
  instant (2024-03-10T07:00:00Z), leap-day last microsecond
  (2024-02-29T23:59:59.999999), year-end last microsecond, and an
  exact :00:00 hour boundary (half-open bucket edges).
- **NULL ts**: dropped by the contract (round-8 TIME sweep), re-pinned
  here alongside the new classes.

Usage: python scripts/timeadv.py [queries...]
Fixture at /tmp/sgs_timeadv/ (reused if present; delete to rebuild).
Full-registry attestation: python scripts/selfcheck.py /tmp/sgs_timeadv
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from scripts.selfcheck import compare
from spark_streaming_stream_analyzer_spark.session import get_spark
from spark_streaming_stream_analyzer_spark.sources.tables import TABLE_NAMES

SRC = "/root/testdata/sf0.001"
OUT = "/tmp/sgs_timeadv"

#: mod -> (ts literal or None, kept-by-contract?)
TS_BY_MOD = {
    # boundary-inclusivity pairs (half-open window)
    103: ("TIMESTAMP '1989-12-31 23:59:59.999999'", False),
    109: ("TIMESTAMP '2100-01-01 00:00:00'", False),
    101: ("TIMESTAMP '1990-01-01 00:00:00'", True),
    107: ("TIMESTAMP '2099-12-31 23:59:59.999999'", True),
    # epoch extremes
    113: ("TIMESTAMP '1969-12-31 23:59:59.999999'", False),
    131: ("TIMESTAMP '9999-12-31 23:59:59.999999'", False),
    127: ("TIMESTAMP '2038-01-19 03:14:08'", True),
    # NULL clock
    163: ("CAST(NULL AS TIMESTAMP)", False),
    # identical-microsecond tie cohort (~17 rows)
    59: ("TIMESTAMP '2024-01-15 12:00:00'", True),
    # calendar walls
    139: ("TIMESTAMP '2024-03-10 07:00:00'", True),
    149: ("TIMESTAMP '2024-02-29 23:59:59.999999'", True),
    151: ("TIMESTAMP '2024-12-31 23:59:59.999999'", True),
    157: ("TIMESTAMP '2024-01-15 13:00:00'", True),
}

#: the deepest time-semantics surface: ordering/tie-breaks, half-open
#: buckets, as-of/interval matching, sessionization, calendar grids,
#: freshness, and the watermark-twin streaming shapes
DEFAULT_QUERIES = [
    "ts_gap_stats", "ts_rolling_window_1h", "ts_sliding_dau",
    "ts_resample_interp", "ts_resample_ffill", "ts_ewma_recent",
    "ts_activity_streaks", "ts_dayn_retention", "ts_cumulative_users",
    "ts_ohlc_bars", "ts_autocorr_lag", "ts_seasonal_profile",
    "ts_weekend_lift", "ts_changepoint_impact", "ts_peak_attribution",
    "ts_peak_prominence", "ts_dominant_period", "ts_fano_factor",
    "ts_atr_volatility", "ts_backtest_snaive", "ts_anomaly_mad",
    "ts_rolling_anomaly", "ts_cusum_alarm", "ts_rollup_hierarchy",
    "join_asof_forward", "join_asof_latest_order", "join_asof_nearest",
    "join_interval_grid", "join_interval_overlap",
    "join_pit_training_assembly",
    "agg_session_window", "agg_sliding_window", "fn_event_time_pack",
    "funnel_conversion", "funnel_latency_quantiles",
    "cohort_retention", "cohort_ltv_matrix", "scd2_intervals",
    "seq_pattern_triples", "seq_top_paths", "seq_training_windows",
    "seq_transition_matrix", "attribution_last_touch", "mart_user_360",
    "dq_freshness_sla", "dq_day_over_day",
    "stream_minute_rollup", "stream_session_window",
    "stream_sliding_window", "stream_dedup_watermark",
    "stream_ohlc_bars",
]


#: first-match wins: drops first (they must survive overlap with any
#: kept class), then the tie cohort, then walls. The standing sweep
#: (tests/test_empty_corpus.py::test_timeadv_parity) imports
#: ts_case_sql() so probe and sweep cannot drift.
CASE_ORDER = [103, 109, 113, 131, 163, 101, 107, 127, 59, 139, 149, 151, 157]


def ts_case_sql() -> str:
    return (
        "CASE "
        + " ".join(
            f"WHEN event_id % {m} = 0 THEN {TS_BY_MOD[m][0]}"
            for m in CASE_ORDER
        )
        + " ELSE ts END AS ts"
    )


def build() -> str:
    if os.path.isdir(OUT) and os.path.exists(os.path.join(OUT, "events.parquet")):
        return OUT
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    case = ts_case_sql()
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t == "events":
            con.execute(
                f"COPY (SELECT event_id, {case}, user_id, event_type,"
                f" value, props FROM {src}) TO '{OUT}/{t}.parquet'"
                " (FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM {src}) TO '{OUT}/{t}.parquet'"
                " (FORMAT PARQUET)"
            )
    # fixture self-check: each class actually present, drops compute
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/events.parquet')"
    ).fetchone()[0]
    assert n == 1000, n
    print("fixture built", flush=True)
    return OUT


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    d = build()
    spark = get_spark("timeadv")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(d, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    fails = 0
    for name in names:
        print(f"run  {name} ...", flush=True)
        t0 = time.time()
        try:
            sdf = qs[name](spark, d).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}", flush=True)
            fails += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"rows {name}: {len(sdf)} [{t1 - t0:.1f}s]", flush=True)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}", flush=True)
            fails += 1
            continue
        t2 = time.time()
        problems = compare(name, sdf, odf)
        timing = f"[spark {t1 - t0:.1f}s oracle {t2 - t1:.1f}s]"
        if problems:
            fails += 1
            print(
                f"FAIL {name}: " + "; ".join(p[:200] for p in problems)
                + f" {timing}",
                flush=True,
            )
        else:
            print(f"ok   {name}: {len(sdf)} rows {timing}", flush=True)
    print(f"\n{fails} failures / {len(names)}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
