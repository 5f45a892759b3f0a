"""Approximate-aggregation sketches (HLL count-distinct, quantile sketch)
vs their exact counterparts — error-bound tests, since sketch internals are
engine-specific and can't be oracle-hashed."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_approx_count_distinct_error_bound(spark, sf_dir):
    from vectordb_acc_and_speed_exp_spark.io import load_table

    e = load_table(spark, sf_dir, "events")
    exact = e.select(F.countDistinct("user_id").alias("n")).first().n
    approx = e.select(
        F.approx_count_distinct("user_id", rsd=0.05).alias("n")
    ).first().n
    assert abs(approx - exact) <= max(1, 0.15 * exact)


def test_percentile_approx_vs_exact(spark, sf_dir):
    from vectordb_acc_and_speed_exp_spark.io import load_table

    e = load_table(spark, sf_dir, "events")
    row = e.select(
        F.percentile("value", F.lit(0.5)).alias("exact"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("approx"),
    ).first()
    spread = (
        e.agg((F.max("value") - F.min("value")).alias("r")).first().r or 1.0
    )
    assert abs(row.approx - row.exact) <= 0.05 * spread
