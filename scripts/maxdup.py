"""MAXDUP witness (round 12, third probe): maximal duplication.

Every document carries the SAME text and every embedding the SAME
vector — the degenerate-duplication extreme (the opposite pole of the
HIGHCARD every-row-unique sweep). What it stresses:

- LSH banding (dedup_minhash_lsh, sim_srp_topk, mm_phash_dedup): every
  row lands in every band's one bucket — the hot-bucket quarantine /
  candidate-cap logic is the only thing standing between this input
  and an O(n²) pair explosion.
- Ranking under TOTAL ties (sim_topk_cosine, kNN graphs, top-k
  windows): every score identical — if any kernel's tie-break order
  differs from its oracle's, the selected SET diverges silently. This
  is the nondeterminism-at-scale class.
- Zero variance (emb_pca_power: rank-1 gram matrix; emb_quantize_int8:
  zero range; emb_dim_variance: exact zeros; k-means: all points in
  one cell, empty cells elsewhere).
- Degenerate dedup censuses (every pair jaccard=1, containment=1,
  one cluster of size N).

Keys, labels, sources, langs stay UNTOUCHED — only the payloads
collapse, so group-by shapes survive.

Usage:
  python scripts/maxdup.py                # build + run focused list
  python scripts/selfcheck.py /tmp/sgs_maxdup   # full attestation
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
OUT = "/tmp/sgs_maxdup"

DEFAULT_QUERIES = [
    # dedup family under total duplication
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_quality",
    "dedup_fingerprint_overlap",
    "dedup_source_overlap_matrix",
    "dedup_cluster_keep",
    "dedup_prefix_filter_join",
    "dedup_index_tuning_report",
    "text_dup_ngram_fraction",
    "text_ngram_novelty",
    "doc_winnowing",
    "doc_fingerprint",
    # embedding family under a single repeated vector
    "embedding_norms",
    "emb_ingest_audit",
    "sim_topk_cosine",
    "sim_srp_topk",
    "sim_ivf_topk",
    "sim_ivf_exact_topk",
    "sim_ivf_recall",
    "sim_kmeans_exact_cells",
    "sim_range_search",
    "sim_quantized_topk",
    "sim_pq_adc_topk",
    "emb_quantize_int8",
    "emb_pq_codebook",
    "emb_pca_power",
    "emb_knn_graph",
    "emb_knn_srp_graph",
    "emb_dim_variance",
    "emb_dim_minmax",
    "emb_class_centroids",
    "emb_class_outliers",
    "emb_class_separation",
    "emb_nearest_centroid_confusion",
    "emb_distance_histogram",
    "emb_matryoshka_recall",
    "dedup_embedding_cosine",
    "dedup_method_agreement",
]


def build() -> str:
    if os.path.isdir(OUT) and os.path.exists(os.path.join(OUT, "events.parquet")):
        return OUT
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if t == "documents":
            # one fixed 40-word text everywhere (long enough for every
            # gram width in the tier; n_chars kept consistent)
            q = (
                "SELECT doc_id,"
                " (SELECT string_agg('dup' || (i % 8), ' ')"
                "  FROM generate_series(1, 40) s(i)) AS text,"
                " lang, source,"
                " len((SELECT string_agg('dup' || (i % 8), ' ')"
                "  FROM generate_series(1, 40) s(i))) AS n_chars"
                f" FROM {src}"
            )
        elif t == "embeddings":
            # the first row's vector, broadcast to every row
            q = (
                "SELECT vec_id,"
                " (SELECT embedding FROM read_parquet("
                f"'{SRC}/embeddings.parquet') ORDER BY vec_id LIMIT 1)"
                " AS embedding, label"
                f" FROM {src}"
            )
        else:
            q = f"SELECT * FROM {src}"
        con.execute(f"COPY ({q}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print("fixture built", flush=True)
    return OUT


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    d = build()
    spark = get_spark("maxdup")
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
