"""Declarative Bloom semi-join: exactness, superset property, pruning power,
and the no-shuffle probe plan."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bloom_semi_join_equals_plain_semi(spark, sf_dir):
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    premium = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 45)
    got = bloom_semi_join(li, premium, "l_partkey", "p_partkey")
    want = li.join(
        premium.select(F.col("p_partkey").alias("l_partkey")), "l_partkey", "left_semi"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_prefilter_is_superset_and_prunes(spark, sf_dir):
    """The probe alone must never drop a true match (no false negatives)
    and, at ~10% key selectivity with 64k bits / 3 hashes, must prune most
    non-matching rows (FPR << 1)."""
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.bloom import (
        bloom_prefilter,
        build_bloom,
    )

    li = load_table(spark, sf_dir, "lineitem")
    premium = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 45)
    keys = premium.select(F.col("p_partkey").alias("l_partkey"))
    bloom = build_bloom(keys, "l_partkey")
    pre = bloom_prefilter(li, bloom, "l_partkey").cache()

    try:
        true_matches = li.join(keys.distinct(), "l_partkey", "left_semi")
        n_li, n_true, n_pre = li.count(), true_matches.count(), pre.count()
        cols = sorted(li.columns)
        assert true_matches.select(*cols).exceptAll(pre.select(*cols)).count() == 0
        # survivors = true matches + false positives; demand real pruning
        assert n_true <= n_pre < n_true + 0.1 * (n_li - n_true), (
            f"bloom passed {n_pre} of {n_li} rows ({n_true} true)"
        )
    finally:
        # an identical logical plan in a later test would otherwise hit this
        # cache and see an InMemoryTableScan wrapping the cached AQE plan,
        # breaking plan-shape assertions
        pre.unpersist()


def test_disjoint_keys_filtered_near_fully(spark):
    """Keys disjoint from the filter's key set: only FPR-rate survivors."""
    from vectordb_acc_and_speed_exp_spark.operators.bloom import (
        bloom_prefilter,
        build_bloom,
    )

    small = spark.range(0, 1000).select(F.col("id").alias("k"))
    big = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    bloom = build_bloom(small, "k", n_bits=1 << 16, n_hashes=3)
    survivors = bloom_prefilter(big, bloom, "k", n_bits=1 << 16, n_hashes=3).count()
    # theoretical FPR at m=65536, n=1000, k=3 is ~1e-4; allow 100x slack
    assert survivors <= 200, f"FPR too high: {survivors}/20000"


def test_probe_plan_has_no_bigside_shuffle(spark, sf_dir):
    """The bloom probe must be a pure literal-array filter — the big side
    reaches the bit tests with no Exchange and no join of any kind (the
    whole point of the operator: the filter is injected, not joined)."""
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.bloom import (
        bloom_prefilter,
        build_bloom,
    )

    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 45)
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    pre = bloom_prefilter(li, build_bloom(keys, "l_partkey"), "l_partkey")
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]
    # and the filter actually fires: k bit-tests in one codegen filter
    assert plan.count("shiftright") >= 3, plan[:2000]
