"""Declarative Bloom-filter semi-join — shuffle-volume reduction for
selective joins.

The 100 TB problem: `big LEFT SEMI JOIN small ON key` shuffles every big-side
row that *might* match. When the small side is too large to broadcast as an
exact key set but its key space is still selective, engines push a Bloom
filter of the small side's keys below the big side's shuffle (Spark's own
runtime-filter optimization does this internally; the expression surface
`bloom_filter_agg`/`might_contain` is not user-registered in PySpark). This
module builds the same structure out of public DataFrame primitives:

- build: k positions per key via ``xxhash64(key, seed)`` mod m bits; the bit
  array is aggregated as a tiny (word, bits) table — ``bit_or`` of
  ``shiftleft(1L, bit)`` grouped by 64-bit word — then densified to a
  driver-side ``list[int]`` of m/64 words (8 KiB at the default m=2^16,
  size chosen, not data-dependent).
- probe: the word list is injected as a LITERAL array expression and each of
  the k bit tests is a pure projection + filter — no join, no exchange, the
  big side stays inside one whole-stage-codegen span. This mirrors how
  engine-native runtime filters reach the scan (a materialized filter
  injected into the plan), not a join against the filter's build plan.
- exact verify: a final ordinary semi-join on the survivors makes the result
  EXACT (false positives are filtered, false negatives are impossible), so
  the operator is oracle-checkable against a plain semi-join.

The win at scale: the big side entering the exact semi-join's shuffle is
already pruned to ~selectivity + FPR of the corpus, and the small side is
scanned ONCE (the build aggregation runs a single job at materialize time,
not once per probe hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_bloom(
    keys: DataFrame,
    key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Aggregate a (word int, bits bigint) Bloom bit-array over the distinct
    values of ``keys[key]``. n_bits/64 rows — driver-materializable at any
    corpus size (the array size is chosen, not data-dependent)."""
    if n_bits % 64 != 0:
        raise ValueError("n_bits must be a multiple of 64")
    seeds = F.explode(F.array(*[F.lit(s) for s in range(n_hashes)])).alias("_seed")
    pos = F.pmod(F.xxhash64(F.col(key), F.col("_seed")), F.lit(n_bits))
    return (
        keys.select(key)
        .distinct()
        .select(F.col(key), seeds)
        .select(pos.alias("_pos"))
        .select(
            (F.col("_pos") / 64).cast("int").alias("word"),
            (F.col("_pos") % 64).alias("_bit"),
        )
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(1L, cast(_bit as int))")).alias("bits"))
    )


def materialize_bloom(bloom: DataFrame, n_bits: int = 1 << 16) -> list[int]:
    """Densify the sparse (word, bits) aggregate into a full m/64-word list
    (absent words = 0). ONE small job — 8 KiB at the default m — after which
    probes are plan-time literals with no dependency on the build plan."""
    words = [0] * (n_bits // 64)
    for row in bloom.collect():
        words[row["word"]] = row["bits"]
    return words


def bloom_prefilter(
    big: DataFrame,
    bloom: DataFrame | list[int],
    key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Keep only big-side rows whose key passes every one of the k bit
    tests against the literal word array. Pure codegen projection+filter;
    the big side is never shuffled and never joined. Guaranteed superset of
    the true matches."""
    if isinstance(bloom, DataFrame):
        bloom = materialize_bloom(bloom, n_bits=n_bits)
    out = big.withColumn("_bloom", F.lit(bloom))
    for s in range(n_hashes):
        pos = f"pmod(xxhash64(`{key}`, {s}), {n_bits})"
        out = out.filter(
            F.expr(
                f"(shiftright(element_at(_bloom, cast({pos} / 64 as int) + 1), "
                f"cast({pos} % 64 as int)) & 1) = 1"
            )
        )
    return out.drop("_bloom")


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """EXACT left-semi join with a Bloom pre-filter: probe the bit array
    (no shuffle, no join), then verify the survivors with an ordinary
    semi-join. Result rows == plain ``big.join(small, key, "left_semi")``;
    the bloom only shrinks what reaches the verify shuffle."""
    keys = small.select(F.col(small_key).alias(big_key))
    bloom = materialize_bloom(
        build_bloom(keys, big_key, n_bits=n_bits, n_hashes=n_hashes), n_bits=n_bits
    )
    pre = bloom_prefilter(big, bloom, big_key, n_bits=n_bits, n_hashes=n_hashes)
    return pre.join(keys.distinct(), big_key, "left_semi")
