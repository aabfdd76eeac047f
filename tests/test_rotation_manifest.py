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
