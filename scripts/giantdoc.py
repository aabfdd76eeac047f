"""GIANTDOC witness (round 11): megabyte documents through the text tier.

Web-scrape corpora routinely contain pathological multi-megabyte
documents; every per-document text kernel must be LINEAR in document
length or one such row stalls its whole task at 100 TB. The fixture is
sf0.001 plus two giants: doc 900001 with 500,000 tokens over a 5,000-
word vocabulary (~3.4 MB — exercises gram construction, hashing,
chunking at length), and doc 900002 with 200,000 copies of ONE token
(~1 MB — zero lexical diversity, maximal gram duplication: the
degenerate repetition shape).

First run of this probe (round 11) found a quadratic class: SEVEN
kernels built word-k-grams as ``transform(sequence, i ->
element_at/slice(words, i))`` where ``words`` is the inline
``filter(split(text))`` — per-element references to an inline array
expression re-evaluate it (Catalyst CSE does not reach lambda bodies),
making gram construction O(L²). doc_fingerprint alone ran >10 minutes
on doc 900001 (vs 1.3 s linear). Fixed via ``functions/grams.py``
(zip_with shifted slices) and the struct-pack chunker in
``curation.text_chunk_overlap``; this probe is the regression witness.

Usage: python scripts/giantdoc.py [queries...]
Writes the fixture to /tmp/sgs_giantdoc/ (reused if present).
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
OUT = "/tmp/sgs_giantdoc"

#: every per-document text/dedup kernel (the fixed seven plus the rest
#: of the family — all must stay linear in L)
DEFAULT_QUERIES = [
    "text_quality_score",
    "token_count",
    "doc_fingerprint",
    "doc_winnowing",
    "text_repetition_metrics",
    "text_lexical_diversity",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_quality",
    "text_dup_ngram_fraction",
    "dedup_source_overlap_matrix",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_fingerprint_overlap",
    "pipeline_doc_scorecard",
    "text_tfidf_topk",
    "text_ngram_novelty",
    "text_chunk_overlap",
    "udtf_chunk_docs",
    "pack_token_budget",
    "lang_id_ngram",
]


def build() -> str:
    if os.path.isdir(OUT) and os.path.exists(os.path.join(OUT, "events.parquet")):
        return OUT
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t == "documents":
            q = (
                f"SELECT * FROM {src}"
                " UNION ALL "
                "SELECT 900001 AS doc_id,"
                " (SELECT string_agg('w' || (i % 5000), ' ')"
                "  FROM generate_series(1, 500000) t(i)) AS text,"
                " 'en' AS lang, 'giant' AS source, 3388895 AS n_chars"
                " UNION ALL "
                "SELECT 900002,"
                " (SELECT string_agg('spam', ' ')"
                "  FROM generate_series(1, 200000) t(i)),"
                " 'en', 'giant', 999999"
            )
        else:
            q = f"SELECT * FROM {src}"
        con.execute(f"COPY ({q}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print("fixture built", flush=True)
    return OUT


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    d = build()
    spark = get_spark("giantdoc")
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
        t3 = time.time()
        timing = f"[spark {t1 - t0:.1f}s oracle {t2 - t1:.1f}s cmp {t3 - t2:.1f}s]"
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
