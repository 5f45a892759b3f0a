"""Portable deterministic 64-bit-ish hashes.

Spark's native ``hash()``/``xxhash64()`` are fast but engine-specific; the
correctness oracle (DuckDB) cannot reproduce them. For hash-verified
operators (MinHash signatures, SimHash fingerprints, exact-dup keys) we
instead derive a 60-bit integer from md5, which both engines compute
identically:

    Spark : conv(substring(md5(s), 1, 15), 16, 10)  ->  bigint
    DuckDB: CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)

15 hex chars = 60 bits, always non-negative, fits a signed 64-bit int in
both engines. md5 is ~GB/s/core and JVM-side here — fine for hashing
shingles; hot paths that never leave Spark should prefer ``F.xxhash64``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(s: Column) -> Column:
    """60-bit non-negative integer hash of a string, reproducible in DuckDB."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def portable_hash64_seeded(s: Column, seed: int) -> Column:
    """Seeded variant: one independent hash family member per seed
    (the 'permutations' of MinHash)."""
    return portable_hash64(F.concat(F.lit(f"{seed}\x1f"), s))


def portable_hash64_sql(expr: str) -> str:
    """The DuckDB-side rendering of ``portable_hash64`` for oracle SQL."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


def portable_hash64_seeded_sql(expr: str, seed: int) -> str:
    return portable_hash64_sql(f"'{seed}' || chr(31) || {expr}")
