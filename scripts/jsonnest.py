"""JSONNEST witness (round 12, second probe): deeply-NESTED props JSON
through the json scalar pack.

Round 11 probed megabyte-FLAT props (many sibling keys) clean; depth is
the orthogonal axis and has a real engine asymmetry candidate: Spark's
JSON functions parse with Jackson, whose StreamReadConstraints default
caps nesting at 1000 (Jackson >= 2.15 — over-deep input fails the
parse, which Spark's get_json_object/json_tuple surface as NULL and
from_json as a corrupt record), while DuckDB's yyjson has no such
default depth cap (recursion bound is memory). A 1001-deep document is
therefore a plausible NULL-vs-value divergence, and a recursive-CTE
key walk (json_key_inventory's oracle shape) is a stack/时间 hazard.

Fixture: sf0.001 events with four row classes overridden (composite
mods chosen to miss the JSONADV ones so both regimes can coexist):

- ``% 61``: 900-deep object chain ``{"n":{"n":...{"k": 42}}}`` — under
  every limit; the expected keys sit at the BOTTOM. Both engines must
  agree on $.k (NULL — k is not top-level) and key inventories.
- ``% 67``: 1200-deep object chain — PAST Jackson's default cap;
  engines may diverge (Spark parse-fail NULL vs DuckDB success).
- ``% 71``: 1200-deep array nesting ``[[[...42...]]]`` with a valid
  top-level "k" BEFORE it — tests whether one over-deep sibling value
  poisons extraction of a healthy key.
- ``% 73``: 300 levels of alternating object/array with the standard
  props keys at top level — a deep-but-legal mixed shape where all
  extraction must succeed identically.

Usage: python scripts/jsonnest.py [queries...]
Writes the fixture to /tmp/sgs_jsonnest/ (reused if present).
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
OUT = "/tmp/sgs_jsonnest"


def deep_obj(depth: int, leaf: str) -> str:
    return '{"n":' * depth + leaf + "}" * depth


def deep_arr(depth: int, leaf: str) -> str:
    return "[" * depth + leaf + "]" * depth


def mixed(depth: int) -> str:
    # alternating {"n":[ {"n":[ ... ]}]} — depth pairs
    return '{"n":[' * depth + "42" + "]}" * depth


PROPS_BY_MOD = {
    # every row also carries the standard props keys at TOP level, so a
    # parse-capability divergence surfaces in every extraction kernel
    # (not only where the fixture key happens to be present)
    61: '{"readTag_id": "deep61", "readValue": "1.5", "k": "2.25",'
        ' "deep": ' + deep_obj(900, '{"k": 42}') + "}",
    67: '{"readTag_id": "deep67", "readValue": "2.5", "k": "6.25",'
        ' "deep": ' + deep_obj(1200, '{"k": 42}') + "}",
    71: '{"readTag_id": "deep71", "readValue": "4.5", "k": "7.25",'
        ' "deep": ' + deep_arr(1200, "42") + "}",
    73: '{"readTag_id": "deep73", "readValue": "8.5", "k": "3.5",'
        ' "mix": ' + mixed(300) + "}",
    # variant-coercion rows (second find of this probe: try_variant_get
    # INT semantics vs DuckDB TRY_CAST — see the fn_variant_json oracle)
    79: '{"readTag_id": "num79", "readValue": "3.5", "k": 2.75,'
        ' "neg": -2.5}',
    83: '{"readTag_id": "str83", "readValue": "4.5", "k": "2e1",'
        ' "b": true}',
    89: '{"readTag_id": "bool89", "readValue": "5.5", "k": true}',
    97: '{"readTag_id": "hex97", "readValue": "6.5", "k": "0x10"}',
}

#: the json-touching registry surface (kernels using
#: get_json_object/json_tuple/from_json/variant + their oracles)
DEFAULT_QUERIES = [
    "proj_json_extract_pair",
    "proj_json_extract_single",
    "fn_json_get_string",
    "fn_cast_string_double",
    "fn_variant_json",
    "json_corrupt_policy",
    "json_key_inventory",
    "null_handling",
    "dq_column_profile",
    "src_file_formats",
    "src_kafka_stream",
    "stream_column_profile",
]


def build() -> str:
    if os.path.isdir(OUT) and os.path.exists(os.path.join(OUT, "events.parquet")):
        return OUT
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    case = "CASE " + " ".join(
        f"WHEN event_id % {m} = 0 THEN ?" for m in PROPS_BY_MOD
    ) + " ELSE props END AS props"
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t == "events":
            con.execute(
                f"COPY (SELECT event_id, ts, user_id, event_type, value,"
                f" {case} FROM {src}) TO '{OUT}/{t}.parquet'"
                " (FORMAT PARQUET)",
                list(PROPS_BY_MOD.values()),
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM {src}) TO '{OUT}/{t}.parquet'"
                " (FORMAT PARQUET)"
            )
    print("fixture built", flush=True)
    return OUT


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    d = build()
    spark = get_spark("jsonnest")
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
