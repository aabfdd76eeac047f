"""bench.py outlier-guard history: shape and sf-gating.

The rerun guard re-measures any query reading far above its best prior
recorded wall. Two past defects guard-railed here:

- driver BENCH_r*.json files nest per-query timings under "parsed"
  (a top-level "queries" lookup silently yielded NO history, so the
  guard ran on the absolute floor alone through round 5);
- records at a different scale factor must be ignored (an sf0.001
  record would mark every sf0.1 reading a 10x "outlier" and triple
  the bench wall for nothing).

No pyspark import: pure-metadata test.
"""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    # bench.py imports the registry (and thus pyspark) at module load;
    # stub those modules so this stays a metadata-only test.
    import types

    saved = {}
    for name in (
        "spark_streaming_stream_analyzer_spark",
        "spark_streaming_stream_analyzer_spark.registry",
        "spark_streaming_stream_analyzer_spark.session",
    ):
        saved[name] = sys.modules.get(name)
    pkg = types.ModuleType("spark_streaming_stream_analyzer_spark")
    reg = types.ModuleType("spark_streaming_stream_analyzer_spark.registry")
    reg.QUERIES = {}
    ses = types.ModuleType("spark_streaming_stream_analyzer_spark.session")
    ses.get_spark = lambda *a, **k: None
    pkg.registry = reg
    pkg.session = ses
    sys.modules.update(
        {
            "spark_streaming_stream_analyzer_spark": pkg,
            "spark_streaming_stream_analyzer_spark.registry": reg,
            "spark_streaming_stream_analyzer_spark.session": ses,
        }
    )
    try:
        spec = importlib.util.spec_from_file_location(
            "bench_under_test", os.path.join(REPO, "bench.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for name, m in saved.items():
            if m is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = m
    return mod


def test_historical_best_reads_driver_envelope_and_gates_on_sf():
    bench = _load_bench()
    best_sf01 = bench._historical_best(0.1)
    # BENCH_r01/r02/r04 carry parsed sf0.1 records with dozens of
    # queries; the committed BENCH_LOCAL_r06 adds the full 72-query set.
    assert len(best_sf01) >= 70, f"history too thin: {len(best_sf01)}"
    assert all(t > 0 for t in best_sf01.values())
    # A known query present since round 1 must have history.
    assert "q1_pricing_summary" in best_sf01
    # No committed record exists at sf0.005 — gating must yield nothing.
    assert bench._historical_best(0.005) == {}


def test_headline_names_are_registered():
    bench = _load_bench()
    from spark_streaming_stream_analyzer_spark import registry

    missing = [n for n in bench.HEADLINE if n not in registry.QUERIES]
    assert not missing, f"bench headline names not in registry: {missing}"
