"""Skew-handling utilities for hot-key joins.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains the tool when one side must be shuffled
on a key whose distribution is pathological (a handful of keys holding a
large share of a 100 TB fact table) and the other side is small enough to
replicate per salt but too large to broadcast outright.

``salted_join``: fact side gets a uniform random-ish salt in [0, n); the
dimension side is exploded n ways; the join key becomes (key, salt) so each
hot key spreads over n reducers. The salt is derived deterministically from
a row fingerprint (not rand()) so retries/replays stay stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, n_salts) from a hash of ``cols`` (defaults
    to all columns) — stable across task retries, unlike F.rand()."""
    src = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("_salt", F.pmod(F.xxhash64(*src), F.lit(n_salts)).cast("int"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: fact.key == dim.key with the shuffle spread
    over (key, salt). The dim side is replicated n_salts times — use only
    when dim is shuffle-joinable but key-skewed; for genuinely small dims
    just broadcast."""
    salted_fact = with_salt(fact, n_salts)
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(salted_dim, on=[key, "_salt"], how=how)
    return out.drop("_salt")
