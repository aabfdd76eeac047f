"""Portable deterministic hashing — identical in Spark and DuckDB.

Spark's native ``hash()``/``xxhash64()`` are Murmur3/xxHash with Spark's
seeds; DuckDB's ``hash()`` is its own. For operators whose *output*
depends on hash values (MinHash signatures, SimHash fingerprints, LSH
band buckets), the DuckDB oracle can only reproduce the result if both
engines share the hash function. MD5 is bit-identical everywhere, so
the portable 64-ish-bit hash is:

    hash64(s) = CAST(first 15 hex chars of md5(s) AS BIGINT via base-16)

15 hex digits = 60 bits < 2^63, so the value fits a signed BIGINT in
both engines with no sign ambiguity.

Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)`` → string → BIGINT
DuckDB: ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``

Scale note: md5 is slower than xxhash64 but still JVM-side codegen
(no Python round-trip); the production path could swap in xxhash64 once
the oracle no longer needs to mirror it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60
HASH_PRIME = 2305843009213693951  # 2^61 - 1 (Mersenne), > any hash64 output


def hash64(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """The DuckDB-side mirror of :func:`hash64` for an SQL expression."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
