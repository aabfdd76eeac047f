"""256-part staging witness (round 11, VERDICT r10 item 5).

The standing MULTIFILE sweep (tests/test_empty_corpus.py
``multi_file_dir``) proves the forced-mtime staging contract at 4
parts per table; a real 100 TB table is 1e4-1e5 parts. This probe
re-proves the contract at 256 time-ordered event parts on sf0.1 —
64x the sweep's part count, 100x its rows — for the staging-sensitive
shapes:

- a stateful carried-state kernel (stream_sessionize_custom): 256
  micro-batches, each one part, order forced by ``_stage_stream_dir``
  mtimes — any ms-tie reorder corrupts the carry (the round-10 bug);
- a watermark aggregate (stream_session_window): late-data discipline
  must hold across 256 time-ordered arrivals exactly as it does in 4;
- a per-pass foreachBatch op (stream_batch_wordcount): parts-aware
  ``maxFilesPerTrigger=len(parts)`` must still mean ONE batch per
  corpus pass at 256 parts;
- a batch scan (agg_running_stats) and the pruning path
  (src_partition_prune) over a 256-part directory.

Usage: python scripts/multipart256.py [queries...]
Writes the fixture to /tmp/sgs_multipart256/ (reused if present).
Prints per-query wall + parity verdict; record the result in
BASELINE.md / NOTES.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow.parquet as pq

import __spark_entry__ as entrymod
from scripts.selfcheck import compare
from spark_streaming_stream_analyzer_spark.session import get_spark
from spark_streaming_stream_analyzer_spark.sources.tables import TABLE_NAMES

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/sgs_multipart256"
N_PARTS = 256

DEFAULT_QUERIES = [
    "agg_running_stats",
    "src_partition_prune",
    "stream_sessionize_custom",
    "stream_session_window",
    "stream_batch_wordcount",
]


def build() -> str:
    if os.path.isdir(OUT) and os.path.isdir(os.path.join(OUT, "events.parquet")):
        return OUT
    os.makedirs(OUT, exist_ok=True)
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        sub = os.path.join(OUT, f"{t}.parquet")
        os.makedirs(sub, exist_ok=True)
        if t == "events":
            # time-ordered parts: part order IS arrival order for the
            # file-stream source (same contract as the MULTIFILE sweep)
            tb = tb.sort_by([("ts", "ascending"), ("event_id", "ascending")])
            n = N_PARTS
        else:
            # non-streamed tables get a modest split; the 256-way blast
            # is aimed at the staging/replay contract, which only the
            # events file-stream exercises
            n = 8
        per = max(1, -(-tb.num_rows // n))
        for i in range(n):
            pq.write_table(
                tb.slice(i * per, per),
                os.path.join(sub, f"part-{i:05d}.parquet"),
            )
        print(f"built {t}: {n} parts, {tb.num_rows:,} rows")
    return OUT


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    d = build()
    spark = get_spark("multipart256")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(d, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, d).toPandas()
        wall = time.time() - t0
        odf = con.execute(oracles[name]).df()
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems) + f" [{wall:.1f}s]")
        else:
            print(f"ok   {name}: {len(sdf)} rows [{wall:.1f}s]")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
