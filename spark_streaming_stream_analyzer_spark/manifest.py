"""Rotation manifest: a committed hash of every query's verification
surface, so "changed surface" is computed mechanically instead of
hand-assembled (VERDICT r11 item 3).

Round 11's root-cause: a shared oracle CTE edit
(``_shadow_nonnull_embeddings``) changed 36 queries' oracle text at
once, but ``_VERIFY_FIRST`` was assembled by hand and only 17 of them
made the front — the other 19 shipped with changed oracles and no
fresh driver green. The fix is this manifest: each registered query's
surface is hashed as ``sha256(kernel source + "\\0" + oracle text)``,
the hashes are committed to ``tests/rotation_manifest.json``, and
``tests/test_rotation_manifest.py`` fails whenever a query's current
hash differs from the committed one while the query sits outside BOTH
``registry._VERIFY_FIRST`` (this round's driver front) and
``registry._PLANNED_NEXT_FRONT`` (next round's). A shared-helper/CTE
edit now surfaces every affected query at commit time, however many
there are.

Scope note: the kernel hash covers the registered kernel function's
own source (``inspect.getsource``), which is where every round-11-class
divergence lived; an edit to a helper the kernel calls (e.g.
``functions/grams.py``) is NOT hashed per-query — but such edits
change the helper's module, and the standing sweeps (GIANTDOC, EMBADV,
selfcheck) cover behavior; the manifest targets the
rotation-accounting failure mode, not general regression detection.

Regenerate with ``python scripts/update_rotation_manifest.py`` AFTER
placing every changed query in the front or the planned next front —
the generator enforces the same rule and refuses otherwise.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os

MANIFEST_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "rotation_manifest.json",
)


def _delegated_sources(src: str) -> list[str]:
    """One level of delegation (round-12 CATKEY blind-spot fix): many
    registry kernels are thin wrappers whose body does ``from .x
    import y`` and calls ``y`` — an edit to ``y`` changed the query's
    behavior while the wrapper's hash stayed put (src_partition_prune's
    partition-key guard shipped unflagged this way; the probe re-run
    caught it). For each intra-package import inside the kernel body,
    the imported callables' own sources join the hash. Deeper helper
    chains remain out of scope — the standing sweeps cover behavior."""
    import importlib
    import re

    out = []
    for dots, mod, names in re.findall(
        r"^\s*from (\.+)([\w.]*) import ([\w, ]+)$", src, re.M
    ):
        try:
            m = importlib.import_module(
                ("." * len(dots)) + mod, package=__package__
            )
        except ImportError:
            continue
        for n in names.split(","):
            obj = getattr(m, n.strip(), None)
            if callable(obj):
                try:
                    out.append(inspect.getsource(obj))
                except (OSError, TypeError):
                    pass
    return out


def surface_hash(name: str) -> str:
    """sha256 over the query's kernel source, the sources of callables
    the kernel body imports from this package (one delegation level),
    and the final oracle text (the exact SQL the driver runs, all
    shadow CTEs included)."""
    from . import registry

    fn = registry.QUERIES[name]
    kernel = getattr(fn, "__wrapped__", fn)
    try:
        src = inspect.getsource(kernel)
    except (OSError, TypeError):  # builtins / C callables: repr-stable
        src = repr(kernel)
    oracle = registry.ORACLES.get(name, "")
    h = hashlib.sha256()
    h.update(src.encode())
    for extra in _delegated_sources(src):
        h.update(b"\1")
        h.update(extra.encode())
    h.update(b"\0")
    h.update(oracle.encode())
    return h.hexdigest()


def current_hashes() -> dict[str, str]:
    from . import registry

    return {name: surface_hash(name) for name in registry.QUERIES}


def load_manifest() -> dict[str, str]:
    with open(MANIFEST_PATH) as f:
        return json.load(f)


def changed_queries() -> list[str]:
    """Queries whose surface differs from the committed manifest —
    including queries the manifest has never seen (new registrations)."""
    committed = load_manifest()
    return sorted(
        name
        for name, h in current_hashes().items()
        if committed.get(name) != h
    )


def misplaced_changed_queries() -> list[str]:
    """The violation set: changed queries outside both fronts."""
    from . import registry

    allowed = set(registry._VERIFY_FIRST) | set(registry._PLANNED_NEXT_FRONT)
    return [q for q in changed_queries() if q not in allowed]
