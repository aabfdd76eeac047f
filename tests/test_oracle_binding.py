"""Every registered oracle must BIND in DuckDB after shadow injection.

The finite-events / nonnull-embeddings shadows rewrite oracle SQL
textually (``registry._shadow_finite_events``); a future oracle that
opens with a ``/* */`` block comment, spells ``WITH<newline>RECURSIVE``,
or defines its own CTE named ``events`` would produce a binder error —
previously only caught by the full correctness driver (ADVICE r8).
``EXPLAIN`` forces DuckDB's full bind + plan without executing, so the
whole 327-oracle surface checks in seconds against the sf0.001 views.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from spark_streaming_stream_analyzer_spark import registry
from spark_streaming_stream_analyzer_spark.sources.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"fixture dir {SF_DIR} not present on this host")
    c = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield c
    c.close()


def test_every_oracle_binds_after_shadow_injection(con):
    failures = []
    for name, sql in registry.ORACLES.items():
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as e:  # binder/parser error — the shadow broke it
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, (
        f"{len(failures)} oracle(s) fail to bind after shadow injection:\n"
        + "\n".join(failures[:10])
    )


def test_shadow_applied_to_every_events_oracle():
    """The mechanical shadow must actually have landed on every oracle
    that references the events table (a silent miss would leave that
    oracle reading raw NaN/corrupt-clock rows the Spark side filters)."""
    import re

    missed = [
        name
        for name, sql in registry.ORACLES.items()
        if re.search(r"\bevents\b", sql)
        and "isfinite(value)" not in sql
        # source-level metrics deliberately read the raw view
        and "main.events" not in sql
    ]
    assert not missed, f"events-referencing oracles without shadow: {missed}"
