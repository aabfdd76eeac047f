"""UNIADV witness (round 12): pathological Unicode through the
tokenize / gram / casefold / PII text family.

The round-11 verdict's suggested next degenerate regime: places where
Spark's UTF8String (Java, UTF-16-backed codepoint semantics, java.util
regex, java.lang case mapping) and DuckDB (utf8proc codepoint
semantics, RE2 regex, utf8proc case mapping) can diverge on length /
substring / split / lower / regex classes. The existing UNICODE sweep
(tests/test_empty_corpus.py unicode_dir) covers the mild tier (accents,
CJK, one emoji, RTL text, doubled spaces); this fixture is the hostile
tier, appended as eight extra documents so each shape is isolated:

- 920001 zero-width: ZWSP (U+200B) / ZWNJ (U+200C) / ZWJ (U+200D)
  INSIDE words and BETWEEN words — none are ASCII space, so a
  split-on-' ' tokenizer must keep them word-internal in BOTH engines,
  and hashing must see identical bytes.
- 920002 combining stacks: Zalgo-style base + 5 combining marks per
  letter — length() is codepoints (not graphemes) in both engines;
  any kernel assuming 1 char = 1 column would diverge.
- 920003 case-mapping traps: Turkish İ (U+0130, lowercases to i +
  U+0307 in Java AND utf8proc), dotless ı, German ß (uppercase SS),
  final sigma ς — exercises every lower()/upper() in the tier.
- 920004 bidi controls: RLO/LRO/PDF (U+202E/U+202D/U+202C) wrapping
  latin tokens — invisible, non-space, must ride through tokenize and
  hash identically.
- 920005 C0 controls: \\x01 and \\x07 embedded in words, tab and \\r
  between words — only ' ' (0x20) is the tokenizer's separator; tab
  must NOT split (split-on-space contract), and regex \\s classes in
  quality metrics see them the same way (Java and RE2 both match tab
  with \\s).
- 920006 deep astral: CJK extension B (U+20000+), math alphanumerics
  (U+1D400+) — surrogate-pair territory in UTF-16: Java substring /
  length on UTF8String counts codepoints, but any off-by-surrogate
  kernel bug shows here.
- 920007 variation selectors + keycap/ZWJ emoji sequences — multi-
  codepoint graphemes inside tokens.
- 920008 unicode spaces: NBSP (U+00A0), EM SPACE (U+2003),
  IDEOGRAPHIC SPACE (U+3000) as the ONLY separators — none are ASCII
  space, so the whole line is ONE token for the split-on-' ' family;
  a kernel that silently uses \\s+ or trim() with Unicode semantics
  would diverge from its oracle.

Usage: python scripts/uniadv.py [queries...]
Writes the fixture to /tmp/sgs_uniadv/ (reused if present).
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
OUT = "/tmp/sgs_uniadv"

#: the eight adversarial documents (doc_id, text, lang, source) —
#: built in Python with EXPLICIT escapes (exact codepoints, nothing
#: invisible in this source file) and handed to DuckDB as parameters.
ZWSP, ZWNJ, ZWJ = "\u200b", "\u200c", "\u200d"
#: 5 stacked combining marks (across combining blocks)
CMB = "\u0301\u0316\u0353\u0336\u030d"
RLO, LRO, PDF = "\u202e", "\u202d", "\u202c"
VS16, KEYCAP = "\ufe0f", "\u20e3"
NBSP, EMSP, IDSP = "\u00a0", "\u2003", "\u3000"

ADV_DOCS = [
    (920001,
     f"zero{ZWSP}width words {ZWSP} apart zero{ZWNJ}join"
     f" zero{ZWJ}join plain words here{ZWSP}",
     "en", "uniadv"),
    (920002,
     " ".join("".join(c + CMB for c in w) for w in
              ["zalgo", "marks", "stack", "deep", "zalgo"]),
     "en", "uniadv"),
    (920003,
     "\u0130stanbul \u0131ss\u0131z STRASSE stra\u00dfe"
     " \u03a3\u03bf\u03c6\u03cc\u03c2 \u03c3\u03bf\u03c6\u03cc\u03c2"
     " \u0130\u0130 \u00df\u00df",
     "tr", "uniadv"),
    (920004,
     f"before {RLO}desrever{PDF} middle {LRO}forced{PDF} after"
     f" {RLO}x{PDF}",
     "en", "uniadv"),
    (920005,
     "ctl\x01char bell\x07word tab\tglued cr\rglued plain words",
     "en", "uniadv"),
    (920006,
     "\U00020000\U00020001 deep \U0001d400\U0001d401\U0001d402 math"
     " \U00020002 plane2 \U0001d7d8\U0001d7d9",
     "zh", "uniadv"),
    (920007,
     f"emoji{VS16} tok 1{VS16}{KEYCAP} keycap"
     f" \U0001f468{ZWJ}\U0001f469{ZWJ}\U0001f467 family plain",
     "en", "uniadv"),
    (920008,
     f"nbsp{NBSP}separated{NBSP}words{EMSP}em{EMSP}space"
     f"{IDSP}ideo{IDSP}space end",
     "en", "uniadv"),
]


#: every kernel that tokenizes, builds grams, casefolds, regexes, or
#: measures document text — the surfaces the regime can diverge.
DEFAULT_QUERIES = [
    "text_normalize",
    "token_count",
    "text_quality_score",
    "lang_id_ngram",
    "doc_fingerprint",
    "doc_winnowing",
    "text_bigram_freq",
    "text_char_ngram_profile",
    "text_lexical_diversity",
    "text_repetition_metrics",
    "text_oov_rate",
    "text_ngram_novelty",
    "text_dup_ngram_fraction",
    "text_tfidf_topk",
    "text_pii_redact",
    "text_decontaminate",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_quality",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_fingerprint_overlap",
    "pipeline_doc_scorecard",
    "pipeline_docs_prep",
    "udtf_chunk_docs",
    "pack_token_budget",
    "text_chunk_overlap",
    "split_leakage_audit",
]


def build() -> str:
    if os.path.isdir(OUT) and os.path.exists(os.path.join(OUT, "events.parquet")):
        return OUT
    os.makedirs(OUT, exist_ok=True)
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
        con.execute(f"COPY ({q}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print("fixture built", flush=True)
    return OUT


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    d = build()
    spark = get_spark("uniadv")
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
