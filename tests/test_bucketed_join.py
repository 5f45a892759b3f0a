"""Bucketed co-located join: pre-bucketing both fact tables on the join
key removes the shuffle entirely (SCALE.md's 'reuse a partitioning across
stages'). The plan must show zero hashpartitioning exchanges."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    from vectordb_acc_and_speed_exp_spark.io import load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    # at test SF the orders side fits the broadcast threshold, which would
    # bypass the bucketed layout entirely; disable it to exercise the
    # co-located sort-merge path that the 100 TB case would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_bucketed")
        orders = spark.table("ord_bucketed")
        joined = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the join itself must not shuffle either side: the only allowed
    # exchange is the final tiny group-by on o_orderpriority
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert all("orderpriority" in e for e in exchanges), plan
    # and it must actually be a sort-merge join over the bucketed layout
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_bucketed_join_matches_plain_join(warehouse, sf_dir):
    from vectordb_acc_and_speed_exp_spark.io import load_table

    spark = warehouse
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    bucketed = (
        spark.table("li_bucketed")
        .join(
            spark.table("ord_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert plain == bucketed
