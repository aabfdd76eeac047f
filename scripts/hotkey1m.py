"""HOTKEY-1M witness (round 11): one user with a million events.

The ONEGROUP standing sweep proves single-key semantics at fixture
scale (~1k rows); at 100 TB a hot key (a bot account, a load-test
user) delivers MILLIONS of rows into ONE state-store group — the
entire history arrives as a single pandas group in
applyInPandasWithState, and the per-key kernel logic plus its DuckDB
oracle must both stay loglinear in group size. This probe appends
1,000,000 events for user 7777 (alternating click/purchase, 30-second
spacing so the 30-minute sessionizer gap never fires — one mega
session — plus every 2000th event jumped by 2 hours to mint ~500
sessions) to the sf0.001 corpus and runs the user-keyed stateful tier
against the unchanged oracles.

Usage: python scripts/hotkey1m.py [queries...]
Writes the fixture to /tmp/sgs_hotkey1m/ (reused if present).
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
OUT = "/tmp/sgs_hotkey1m"

#: every registered op whose state (or grain) is keyed by user_id —
#: the surfaces a hot key funnels into one group
DEFAULT_QUERIES = [
    "stream_sessionize_custom",
    "stream_user_360",
    "stream_attribution_last_touch",
    "stream_transition_matrix",
    "stream_new_user_monitor",
    "agg_session_window",
    "mart_user_360",
]


def build() -> str:
    if os.path.isdir(OUT) and os.path.exists(os.path.join(OUT, "events.parquet")):
        return OUT
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t == "events":
            # 30 s spacing + a 2 h jump every 2000 events: ~500
            # sessions of ~2000 rows for the 30-min-gap sessionizer,
            # one colossal state group for everything user-keyed
            q = (
                f"SELECT * FROM {src}"
                " UNION ALL "
                "SELECT 50000000 + i AS event_id,"
                " TIMESTAMP '2024-01-01 00:00:00'"
                "   + INTERVAL (i * 30 + (i // 2000) * 7200) SECOND AS ts,"
                " 7777 AS user_id,"
                " CASE WHEN i % 5 = 0 THEN 'purchase' ELSE 'click' END"
                "   AS event_type,"
                " (i % 1000) / 10.0 AS value,"
                " '{\"k\": ' || (i % 100) || '}' AS props"
                " FROM generate_series(1, 1000000) t(i)"
            )
        else:
            q = f"SELECT * FROM {src}"
        con.execute(f"COPY ({q}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print("fixture built (user 7777: 1,000,000 events)", flush=True)
    return OUT


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    d = build()
    spark = get_spark("hotkey1m")
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
                f"FAIL {name}: "
                + "; ".join(p[:200] for p in problems)
                + f" {timing}",
                flush=True,
            )
        else:
            print(f"ok   {name}: {len(sdf)} rows {timing}", flush=True)
    print(f"\n{fails} failures / {len(names)}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
