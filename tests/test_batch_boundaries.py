"""Batch-boundary invariance for every streaming query (round 10,
VERDICT r9 item 3).

Structured Streaming's prefix-equivalence promise (SURVEY.md §5.2.2):
the final answer of a streaming query over a corpus must not depend on
HOW the corpus was sliced into micro-batches. Each ``stream_*`` query
runs twice — once over the standard single-file fixture (one
micro-batch) and once over the same rows pre-split into five
TIME-ORDERED chunk files (five micro-batches) — and the final results
must be multiset-identical.

Why time-ordered chunks: a row-arbitrary split could place events
older than an already-advanced watermark into a later micro-batch,
and the engine would CORRECTLY drop them as late data — a legitimate
semantic difference, not a boundary bug. A time-ordered replay is
also the realistic shape (a log replays in arrival order). Ties stay
adjacent via the (ts, event_id) total order; a tie straddling a chunk
boundary is never late because every watermark here lags by >= 1 min.

Excluded, with reasons (their outputs are ABOUT batch structure):
 - stream_batch_wordcount: emits PER-MICRO-BATCH counts by design.
 - stream_progress_metrics: reports per-batch progress telemetry.
 - stream_python_datasource: reads the synthetic in-process source,
   not the events fixture — the split cannot reach it.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from spark_streaming_stream_analyzer_spark import registry
from spark_streaming_stream_analyzer_spark.sources.tables import TABLE_NAMES

SRC = "/root/testdata/sf0.001"
N_CHUNKS = 5

BATCH_STRUCTURE_OPS = {
    "stream_batch_wordcount",
    "stream_progress_metrics",
    "stream_python_datasource",
}

STREAM_OPS = sorted(
    name for name in registry.QUERIES if name.startswith("stream_")
    and name not in BATCH_STRUCTURE_OPS
)


@pytest.fixture(scope="module")
def split_dir(tmp_path_factory) -> str:
    """The sf0.001 corpus with ``events.parquet`` as a DIRECTORY of
    five time-ordered chunk files — every other table byte-identical.
    ``events_file_stream`` feeds one file per trigger, so each chunk
    becomes its own micro-batch."""
    d = tmp_path_factory.mktemp("sf_split")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t == "events":
            ev_dir = os.path.join(str(d), "events.parquet")
            os.makedirs(ev_dir)
            con.execute(
                "CREATE TEMP TABLE ev AS SELECT *,"
                f" ntile({N_CHUNKS}) OVER (ORDER BY ts, event_id) AS chunk"
                f" FROM {src}"
            )
            cols = "event_id, ts, user_id, event_type, value, props"
            for i in range(1, N_CHUNKS + 1):
                con.execute(
                    f"COPY (SELECT {cols} FROM ev WHERE chunk = {i}"
                    " ORDER BY ts, event_id)"
                    f" TO '{ev_dir}/part-{i:02d}.parquet' (FORMAT PARQUET)"
                )
            con.execute("DROP TABLE ev")
        else:
            con.execute(
                f"COPY (SELECT * FROM {src})"
                f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    return str(d)


def _norm(df) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False)
    )


@pytest.mark.parametrize("name", STREAM_OPS)
def test_batch_boundary_invariance(spark, split_dir, name):
    one = registry.QUERIES[name](spark, SRC).toPandas()
    many = registry.QUERIES[name](spark, split_dir).toPandas()
    assert sorted(one.columns) == sorted(many.columns), name
    assert _norm(one) == _norm(many), (
        f"{name}: final result depends on micro-batch boundaries "
        f"(1 batch: {len(one)} rows, {N_CHUNKS} batches: {len(many)} rows)"
    )
