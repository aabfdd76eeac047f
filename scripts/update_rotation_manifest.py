"""Regenerate tests/rotation_manifest.json (see manifest.py docstring).

Refuses to write while a changed query sits outside both
``_VERIFY_FIRST`` and ``_PLANNED_NEXT_FRONT`` — regeneration is the
step that RESETS the changed-surface ledger, so it must only happen
once the rotation accounting is already consistent.

Usage: python scripts/update_rotation_manifest.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_stream_analyzer_spark import manifest


def main() -> int:
    if os.path.exists(manifest.MANIFEST_PATH):
        misplaced = manifest.misplaced_changed_queries()
        if misplaced:
            print(
                "REFUSING to regenerate: changed queries outside both"
                f" fronts: {misplaced}\n"
                "Place them in registry._VERIFY_FIRST or"
                " registry._PLANNED_NEXT_FRONT first."
            )
            return 1
        changed = manifest.changed_queries()
        if changed:
            print(f"resetting {len(changed)} changed entries: {changed}")
    hashes = manifest.current_hashes()
    with open(manifest.MANIFEST_PATH, "w") as f:
        json.dump(hashes, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(hashes)} entries to {manifest.MANIFEST_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
