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
own source (``inspect.getsource``) PLUS the sources of every callable
its body imports from this package, followed transitively through
those callables' own body imports up to ``_DELEGATION_DEPTH`` levels
(round-13 fix, ADVICE r12: the original one-level walk anchored
relative imports at the package root instead of the kernel's own
subpackage, so 48 of 52 delegating kernels silently hashed nothing).
Module-level helper edits with no import statement in any reachable
body remain out of per-query scope — the standing sweeps cover
behavior; the manifest targets the rotation-accounting failure mode,
not general regression detection.

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


# How many body-import levels to follow from the kernel. Two covers the
# wrapper -> operator-module kernel -> shared helper chain that every
# registry delegation uses today; three adds margin for one more hop.
_DELEGATION_DEPTH = 3

# Single-line and parenthesized (possibly multi-line) relative-import
# forms; names may carry "as alias". Absolute intra-package imports are
# not used in kernel bodies (repo convention is relative).
_IMPORT_SINGLE = r"^\s*from (\.+)([\w.]*) import ([\w, ]+?)\s*$"
_IMPORT_PAREN = r"^\s*from (\.+)([\w.]*) import \(([^)]*)\)"


def _body_imports(src: str):
    """Yield (dots, module, name) for every relative import in a
    function body, covering ``from .x import a, b``, ``from ..p.q
    import (a,\\n b)``, and ``import x as y`` aliasing (the original
    name, which is what ``getattr`` on the module needs)."""
    import re

    for dots, mod, names in re.findall(_IMPORT_SINGLE, src, re.M) + re.findall(
        _IMPORT_PAREN, src, re.M
    ):
        for raw in names.replace("\n", " ").split(","):
            n = raw.strip()
            if " as " in n:
                n = n.split(" as ")[0].strip()
            if n:
                yield dots, mod, n


def _delegated_sources(kernel) -> list[str]:
    """Delegation closure (round-12 CATKEY blind-spot fix, completed in
    round 13 per ADVICE r12): many registry kernels are thin wrappers
    whose body does ``from .x import y`` and calls ``y`` — an edit to
    ``y`` changed the query's behavior while the wrapper's hash stayed
    put (src_partition_prune's partition-key guard shipped unflagged
    this way; the probe re-run caught it).

    Each relative import inside a reachable body is resolved against
    THAT function's own module package (the r12 version anchored at the
    package root, where ``from .pipelines import x`` written inside
    ``streaming/state.py`` resolves to a nonexistent root module and
    ``from ..sources.tables import x`` escapes the top-level package —
    both swallowed by the ImportError guard, making the walk a silent
    no-op for 48 of 52 delegating kernels). The walk is breadth-first,
    textual-order, deduplicated, and bounded by ``_DELEGATION_DEPTH``,
    so a helper edit two calls deep flips the owning queries' hashes."""
    import importlib

    out: list[str] = []
    seen: set[tuple[str, str]] = set()
    queue: list[tuple[object, int]] = [(kernel, 0)]
    i = 0
    while i < len(queue):
        obj, depth = queue[i]
        i += 1
        try:
            src = inspect.getsource(obj)
        except (OSError, TypeError):
            continue
        if depth:
            out.append(src)
        if depth >= _DELEGATION_DEPTH:
            continue
        mod = inspect.getmodule(obj)
        pkg = getattr(mod, "__package__", None) or __package__
        for dots, m, n in _body_imports(src):
            try:
                target = importlib.import_module(
                    ("." * len(dots)) + m, package=pkg
                )
            except ImportError:
                continue
            child = getattr(target, n, None)
            key = (getattr(target, "__name__", m), n)
            if key in seen or child is None:
                continue
            seen.add(key)
            if callable(child):
                queue.append((child, depth + 1))
            elif not inspect.ismodule(child):
                # imported CONSTANTS (caps like SHINGLE_DF_CAP, tuples
                # like STOPWORDS) steer semantics too — hash their repr
                # so a tuning-value edit flips the owning queries
                out.append(f"{key[0]}.{n} = {child!r}")
    return out


def surface_sources(name: str) -> list[str]:
    """The ordered source texts that feed a query's hash: the kernel
    body first, then the delegation closure (breadth-first). Exposed so
    tests can assert a specific helper's source is INSIDE the hashed
    surface — which is exactly the guarantee that an edit to that
    helper flips the hash."""
    from . import registry

    fn = registry.QUERIES[name]
    kernel = getattr(fn, "__wrapped__", fn)
    try:
        src = inspect.getsource(kernel)
    except (OSError, TypeError):  # builtins / C callables: repr-stable
        src = repr(kernel)
    return [src] + _delegated_sources(kernel)


def surface_hash(name: str) -> str:
    """sha256 over the query's kernel source, the sources of callables
    reachable through body-level intra-package imports (the delegation
    closure, ``_DELEGATION_DEPTH`` levels), and the final oracle text
    (the exact SQL the driver runs, all shadow CTEs included)."""
    from . import registry

    sources = surface_sources(name)
    oracle = registry.ORACLES.get(name, "")
    h = hashlib.sha256()
    h.update(sources[0].encode())
    for extra in sources[1:]:
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
