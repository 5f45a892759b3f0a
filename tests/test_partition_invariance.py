"""Direct test of the repo-wide determinism claim: exact-grid queries
return bit-identical results under different partitionings/shuffle
widths (the property the DuckDB hash gate relies on)."""

from __future__ import annotations

import pytest

SENSITIVE = [
    # float-sum-turned-int-grid aggregates
    "embedding_dim_stats",
    "bigram_lm_scores",
    "maxsim_multivector_topk",
    "text_entropy_stats",
    "value_stats_by_type",
    # window/dedup determinism
    "paragraph_dedup",
    "winnowing_fingerprints",
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_repartition(spark, sf_dir, name):
    from vectordb_acc_and_speed_exp_spark.queries import load_all

    fn = load_all()[name].fn
    base = sorted(map(tuple, fn(spark, sf_dir).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt, name
