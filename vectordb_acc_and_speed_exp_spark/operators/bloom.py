"""Declarative Bloom-filter semi-join — shuffle-volume reduction for
selective joins.

The 100 TB problem: `big LEFT SEMI JOIN small ON key` shuffles every big-side
row that *might* match. When the small side is too large to broadcast as an
exact key set but its key space is still selective, engines push a Bloom
filter of the small side's keys below the big side's shuffle (Spark's own
runtime-filter optimization does this internally; the expression surface
`bloom_filter_agg`/`might_contain` is not user-registered in PySpark). This
module builds the same structure out of public DataFrame primitives, fully
JVM-side:

- build: k positions per key via ``xxhash64(key, seed)`` mod m bits; the bit
  array is a tiny (word, bits) table — ``bit_or`` of ``shiftleft(1L, bit)``
  grouped by 64-bit word. m/64 rows regardless of corpus size.
- probe: k chained broadcast joins on the word index + a bit test — no
  shuffle of the big side, whole-stage-codegen throughout.
- exact verify: a final ordinary semi-join on the survivors makes the result
  EXACT (false positives are filtered, false negatives are impossible), so
  the operator is oracle-checkable against a plain semi-join.

The win at scale: the big side entering the exact semi-join's shuffle is
already pruned to ~selectivity + FPR of the corpus.
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
    values of ``keys[key]``. n_bits/64 rows — broadcastable at any corpus
    size (the array size is chosen, not data-dependent)."""
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


def bloom_prefilter(
    big: DataFrame,
    bloom: DataFrame,
    key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Keep only big-side rows whose key passes every one of the k bit
    tests. k broadcast hash joins + codegen bit math; the big side is never
    shuffled. Guaranteed superset of the true matches."""
    out = big
    for s in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(n_bits))
        probe = bloom.select(
            F.col("word").alias(f"_w{s}"), F.col("bits").alias(f"_bits{s}")
        )
        out = (
            out.withColumn(f"_w{s}", (pos / 64).cast("int"))
            .withColumn(f"_b{s}", pos % 64)
            .join(F.broadcast(probe), f"_w{s}")
            .filter(F.expr(f"(shiftright(_bits{s}, cast(_b{s} as int)) & 1) = 1"))
            .drop(f"_w{s}", f"_b{s}", f"_bits{s}")
        )
    return out


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """EXACT left-semi join with a Bloom pre-filter: probe the bit array
    (no shuffle), then verify the survivors with an ordinary semi-join.
    Result rows == plain ``big.join(small, key, "left_semi")``; the bloom
    only shrinks what reaches the verify shuffle."""
    keys = small.select(F.col(small_key).alias(big_key))
    bloom = build_bloom(keys, big_key, n_bits=n_bits, n_hashes=n_hashes)
    pre = bloom_prefilter(big, bloom, big_key, n_bits=n_bits, n_hashes=n_hashes)
    return pre.join(keys.distinct(), big_key, "left_semi")
