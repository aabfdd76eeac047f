"""CAPGROUP-10x witness (round 11, VERDICT r10 item 2).

The round-10 cap-group sweep (tests/test_empty_corpus.py
``cap_group_dir``) proved the limb-split arithmetic at a 2e6-row
all-cap-magnitude group. This probe re-proves the SAME kernels at 10x:
one 2e7-row group whose ``value`` alternates +/-EVENT_VALUE_ABS_MAX
(maximal |Sigma x^2| per row count) plus a 1e6-row zero-variance
all-cap group, against the identical DuckDB oracles. What it witnesses:

- ``operators/stats.py`` three-limb S4 (claimed safe to ~4e11
  rows/group — 2e7 exercises the limbs 10x past where the old single
  DECIMAL(38,0) sum died at ~1.7e6);
- ``streaming/state.py _sumsq_exact`` limb-split per-batch fold
  (claimed int64-safe to 9.2e10 rows/micro-batch — the whole 2e7-row
  group arrives in ONE availableNow batch here, 2e4x past the ~920-row
  wrap point of the pre-r10 pandas fold);
- oracle-side VARCHAR-hop conversions at HUGEINT magnitudes 100x
  beyond 2^64.

Runs BOTH scales (1x = the sweep's own 2e6 shape, 10x = 2e7) so the
wall ratio is printed next to the parity verdict — the claim is
"exact AND ~linear", not just "exact".

Usage: python scripts/capgroup10x.py [queries...]
Writes fixtures to /tmp/sgs_capgroup10x/x{N}/ (reused if present).
Scales default to "1,10"; override with SGS_CAPGROUP_SCALES (e.g.
"1,100" for the 2e8-row batch-kernel witness — the streaming kernels
should stay at <=10x there: a 2e8-row single availableNow micro-batch
is memory-bound on this host long before the arithmetic bound of
9.2e10 rows/batch, so the 100x tier witnesses the BATCH kernels).
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
OUT = "/tmp/sgs_capgroup10x"

#: the limb-split kernel family the round-10 cap-group class fixed —
#: every query whose exact-arithmetic path the 2e6 sweep re-proved
DEFAULT_QUERIES = [
    "agg_higher_moments",        # three-limb S4 in stats.py
    "agg_running_stats",         # S1/S2 DECIMAL + oracle VARCHAR hop
    "agg_naive_variance",        # oracle VARCHAR hop
    "fn_welford_update",         # oracle VARCHAR hop
    "stream_stats_exact_state",  # state._sumsq_exact, one 2e7-row batch
    "stream_stats_tws",          # _sumsq_exact, transformWithState twin
]


def build(scale: int) -> str:
    """Cap-group fixture at ``scale`` x the round-10 sweep shape:
    2e6*scale-row alternating +/-cap group + 1e5*scale zero-variance
    all-cap group, appended to the sf0.001 corpus (same spec as
    tests/test_empty_corpus.py cap_group_dir, parameterized)."""
    d = os.path.join(OUT, f"x{scale}")
    if os.path.isdir(d) and os.path.exists(os.path.join(d, "events.parquet")):
        return d
    os.makedirs(d, exist_ok=True)
    n_alt, n_pos = 2_000_000 * scale, 100_000 * scale
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
                f" FROM generate_series(1, {n_alt}) t(i)"
                " UNION ALL "
                "SELECT 100000000 + i,"
                " TIMESTAMP '2024-01-01 00:10:00'"
                "   + INTERVAL (i % 86000) SECOND,"
                " i % 1000, 'cap_pos', 1000000.0,"
                " '{\"k\": ' || (i % 100) || '}'"
                f" FROM generate_series(1, {n_pos}) t(i)"
            )
        else:
            q = f"SELECT * FROM {src}"
        con.execute(f"COPY ({q}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    print(f"built {d} (cap_alt={n_alt:,}, cap_pos={n_pos:,})")
    return d


def run(spark, sf_dir: str, names: list[str]) -> tuple[int, dict]:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures, walls = 0, {}
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, sf_dir).toPandas()
        walls[name] = time.time() - t0
        odf = con.execute(oracles[name]).df()
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"  FAIL {name}: " + "; ".join(problems))
        else:
            print(f"  ok   {name}: {len(sdf)} rows [{walls[name]:.1f}s]")
    return failures, walls


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    scales = tuple(
        int(s) for s in os.environ.get("SGS_CAPGROUP_SCALES", "1,10").split(",")
    )
    spark = get_spark("capgroup10x")
    total_fail = 0
    scale_walls = {}
    for scale in scales:
        d = build(scale)
        print(f"\n=== scale x{scale} ({d}) ===")
        failures, walls = run(spark, d, names)
        total_fail += failures
        scale_walls[scale] = walls
    lo, hi = scales[0], scales[-1]
    print(
        f"\n=== wall ratios (x{hi} / x{lo}; ~linear expected,"
        f" data grew ~{hi // max(lo, 1)}x) ==="
    )
    for name in names:
        w1, w10 = scale_walls[lo][name], scale_walls[hi][name]
        print(f"  {name}: {w1:.1f}s -> {w10:.1f}s = {w10 / max(w1, 1e-9):.1f}x")
    print(f"\n{total_fail} failures")
    return 1 if total_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
