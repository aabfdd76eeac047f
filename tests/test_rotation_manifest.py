"""Blast-radius-aware changed-surface rule (VERDICT r11 item 3).

Round 11 edited one shared oracle CTE and silently changed 36 queries'
verification surface; the hand-assembled ``_VERIFY_FIRST`` caught 17.
This test recomputes the changed set mechanically — sha256 of each
query's kernel source + final oracle text vs the committed
``tests/rotation_manifest.json`` — and fails if any changed (or new)
query sits outside BOTH the current driver front and the planned next
front. Regenerate the manifest with
``python scripts/update_rotation_manifest.py`` after fixing the
rotation (the generator enforces the same rule).

No pyspark session: pure-metadata, must stay cheap.
"""

import os

from spark_streaming_stream_analyzer_spark import manifest, registry


def test_manifest_exists_and_covers_registry():
    assert os.path.exists(manifest.MANIFEST_PATH), (
        "tests/rotation_manifest.json missing — run"
        " scripts/update_rotation_manifest.py"
    )
    committed = manifest.load_manifest()
    # stale manifest entries for unregistered queries are fine (a
    # retired query needs no verification); unseen registered queries
    # are handled as changed surface below
    assert committed, "manifest is empty"


def test_changed_surface_is_inside_a_front():
    misplaced = manifest.misplaced_changed_queries()
    assert not misplaced, (
        f"queries with changed kernel/oracle surface outside both"
        f" _VERIFY_FIRST and _PLANNED_NEXT_FRONT: {misplaced} —"
        " rotate them into a front, then regenerate the manifest"
        " (scripts/update_rotation_manifest.py)"
    )


def test_fronts_fit_driver_budget():
    assert len(registry._VERIFY_FIRST) <= registry._VERIFY_FRONT_BUDGET
    assert (
        len(registry._PLANNED_NEXT_FRONT) <= registry._VERIFY_FRONT_BUDGET
    )


def test_front_is_the_dict_prefix():
    # the driver takes the first N dict entries; _reorder must have
    # actually placed the front there
    names = list(registry.QUERIES)
    assert names[: len(registry._VERIFY_FIRST)] == registry._VERIFY_FIRST


# ----------------------------------------------------------------------
# Delegation-closure coverage (ADVICE r12 / VERDICT r12 item 3): the
# round-12 walk anchored relative imports at the package root, so 48 of
# 52 delegating kernels hashed NO helper source — a helper edit could
# ship without flipping any hash. These pin the fixed walk: a helper's
# source being INSIDE surface_sources IS the guarantee that editing it
# flips the committed hash (the hash is computed over exactly these
# texts plus the oracle).
# ----------------------------------------------------------------------


def test_delegated_kernel_hashes_helper_source():
    # stream_batch_wordcount's kernel body imports word_count from
    # operators/wordcount.py (one delegation level, own-package anchor)
    srcs = manifest.surface_sources("stream_batch_wordcount")
    assert len(srcs) > 1, "delegation walk returned no helper sources"
    assert any("def word_count" in s for s in srcs[1:]), (
        "word_count's body is not part of stream_batch_wordcount's"
        " hashed surface — the own-package import anchor regressed"
    )


def test_two_deep_helper_is_inside_surface():
    # kernel -> streaming pipeline helper -> clean_measurements: a
    # depth-2 chain; an edit to the deep helper must flip the hash
    srcs = manifest.surface_sources("stream_stats_exact_state")
    assert any("def clean_measurements" in s for s in srcs[1:]), (
        "depth-2 helper clean_measurements missing from the surface"
    )


def test_every_delegating_kernel_contributes_sources():
    # the r12 bug shape: kernels WITH body-level relative imports whose
    # surface nevertheless contains only the kernel text itself
    import inspect

    silent = []
    for name, fn in registry.QUERIES.items():
        kernel = getattr(fn, "__wrapped__", fn)
        try:
            src = inspect.getsource(kernel)
        except (OSError, TypeError):
            continue
        if not any(True for _ in manifest._body_imports(src)):
            continue
        if len(manifest.surface_sources(name)) <= 1:
            silent.append(name)
    assert not silent, (
        f"kernels with body imports but an empty delegation surface:"
        f" {silent}"
    )


def test_body_imports_parses_paren_multiline_and_alias():
    src = (
        "def k():\n"
        "    from ..sources.tables import (\n"
        "        load_documents,\n"
        "        load_events as ev,\n"
        "    )\n"
        "    from .similarity import _fold_sum, _with_norm\n"
        "    return 1\n"
    )
    got = set(manifest._body_imports(src))
    assert ("..", "sources.tables", "load_documents") in got
    assert ("..", "sources.tables", "load_events") in got, "alias lost"
    assert (".", "similarity", "_fold_sum") in got
    assert (".", "similarity", "_with_norm") in got


def test_constant_imports_join_surface():
    # imported tuning constants steer semantics; their repr is hashed
    srcs = manifest.surface_sources("split_leakage_audit")
    assert any("SHINGLE_DF_CAP = " in s for s in srcs[1:]), (
        "imported constant SHINGLE_DF_CAP not in the hashed surface"
    )
