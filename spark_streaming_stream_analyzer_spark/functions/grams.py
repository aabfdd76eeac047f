"""Linear-time word-k-gram construction for array expressions.

The one rule this module encodes (round-11 GIANTDOC find): **never
reference an inline array expression from inside a higher-order-
function lambda**. Catalyst's subexpression elimination does not reach
into lambda bodies, so ``transform(sequence(...), i ->
element_at(words, i))`` — where ``words`` is itself ``filter(split(
text))`` — re-evaluates the full split once per element: O(L²) in
document length. Invisible on fixture-length docs; a single 500k-token
document (3.4 MB — routine in web scrapes) turned doc_fingerprint from
sub-second into hours.

The fix is the shifted-array zip discipline ``dedup._signatures``
already used (its docstring documents the same trap for the
materialize-then-reference alternative, which CollapseProject can
inline right back): every reference to ``words`` is a per-ROW slice,
never per element, so the split runs a constant number of times per
row and gram construction is O(k·L).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_kgrams(words: Column, k: int) -> Column:
    """Array of space-joined word-k-grams of ``words`` (an
    ``array<string>`` expression), in token order, duplicates kept —
    element i (1-based) is ``concat_ws(" ", words[i], ...,
    words[i+k-1])``; empty array when the document has fewer than k
    tokens (``sequence``-based forms must guard that case anyway:
    Spark's ``sequence(1, 0)`` DESCENDS instead of being empty).

    Built as a chain of k-1 ``zip_with``s against shifted slices —
    O(k·L) with ``words`` evaluated O(k) times per row — instead of
    ``transform(sequence, i -> element_at/slice(words, i))``, which is
    O(k·L²) on an inline ``words`` (see module docstring). ``zip_with``
    pads the shorter side with NULL and ``concat_ws`` skips NULLs, so
    the trailing k-1 entries are partial grams; the final slice drops
    them.
    """
    n = F.size(words)
    g = words
    for s in range(2, k + 1):
        g = F.zip_with(
            g,
            F.slice(words, s, F.greatest(n - (s - 1), F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(
        n >= k,
        F.slice(g, 1, F.greatest(n - (k - 1), F.lit(0))),
    ).otherwise(F.array().cast("array<string>"))


def indexed_kgram_sql(k: int, arr: str = "ws", idx: str = "i") -> str:
    """DuckDB expression for the space-joined k-gram of list ``arr``
    starting at (1-based) index ``idx``: ``ws[i] || ' ' || ws[i+1] ||
    ... || ws[i+k-1]``. Plain ``ws[i]`` indexing is DuckDB's linear
    gram form (in-lambda ``list_slice`` of an outer list is O(L) per
    call — round-11 GIANTDOC). Generated from ``k`` so the oracle
    tracks the gram-width constant: three oracles used to hardcode the
    8-term concat next to an interpolated ``{DUPG_N}`` range, and a
    constant change would have silently diverged kernel and oracle
    (ADVICE r11 item 2)."""
    terms = [f"{arr}[{idx}]"] + [
        f"{arr}[{idx}+{j}]" for j in range(1, k)
    ]
    return " || ' ' || ".join(terms)
