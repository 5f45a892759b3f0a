"""asof_join / interval_join vs hand-computed and naive-join answers."""

from pyspark.sql import functions as F

from vectordb_acc_and_speed_exp_spark.operators.temporal import (
    asof_join,
    interval_join,
)


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 205), (3, "A", 50), (4, "B", 100), (5, "C", 10)],
        "trade_id bigint, sym string, tms bigint",
    )
    quotes = spark.createDataFrame(
        [("A", 90, 1.0), ("A", 100, 2.0), ("A", 200, 3.0), ("B", 150, 4.0)],
        "sym string, qms bigint, px double",
    )
    return trades, quotes


def test_asof_join_inner(spark):
    trades, quotes = _trades_quotes(spark)
    got = {
        r.trade_id: (r.qms, r.px)
        for r in asof_join(
            trades, quotes, "sym", "tms", "qms", ["qms", "px"]
        ).collect()
    }
    # trade 2: quote at 200 (not 100); trade 3: nothing <= 50; trade 4:
    # quote 150 > 100 -> no match; trade 5: key C absent.
    # trade 1: tie at exactly 100 matches (<= semantics).
    assert got == {1: (100, 2.0), 2: (200, 3.0)}


def test_asof_join_left_and_tolerance(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(
        trades, quotes, "sym", "tms", "qms", ["px"], tolerance_ms=5, how="left"
    )
    got = {r.trade_id: r.px for r in out.collect()}
    # tolerance 5: trade 1 gap 0 ok; trade 2 gap 5 ok; others unmatched
    assert got == {1: 2.0, 2: 3.0, 3: None, 4: None, 5: None}
    assert out.count() == 5


def test_asof_join_null_payload_field(spark):
    """A null payload FIELD in the true match must not fall back to an
    older row (struct transport, not per-column last)."""
    trades = spark.createDataFrame([(1, "A", 100)], "trade_id bigint, sym string, tms bigint")
    quotes = spark.createDataFrame(
        [("A", 10, 1.0), ("A", 90, None)], "sym string, qms bigint, px double"
    )
    [row] = asof_join(trades, quotes, "sym", "tms", "qms", ["qms", "px"]).collect()
    assert (row.qms, row.px) == (90, None)


def test_interval_join_matches_naive_cross(spark):
    iv = spark.createDataFrame(
        [(1, 95, 210), (2, 300, 310), (3, 0, 50)],
        "iv_id bigint, start_ms bigint, end_ms bigint",
    )
    pts = spark.createDataFrame(
        [(10, 95), (11, 209), (12, 210), (13, 305), (14, 49), (15, 50)],
        "pt_id bigint, ms bigint",
    )
    got = {
        (r.iv_id, r.pt_id)
        for r in interval_join(iv, pts, "start_ms", "end_ms", "ms", 100).collect()
    }
    naive = {
        (r.iv_id, r.pt_id)
        for r in iv.crossJoin(pts)
        .filter((F.col("ms") >= F.col("start_ms")) & (F.col("ms") < F.col("end_ms")))
        .collect()
    }
    assert got == naive == {(1, 10), (1, 11), (2, 13), (3, 14)}


def test_asof_join_single_shuffle_plan(spark):
    """The union+window formulation must cost exactly ONE exchange on the
    join key — the property that makes it an equi-join at scale. A
    regression to a range join would show up as extra exchanges or a
    nested-loop join."""
    trades, quotes = _trades_quotes(spark)
    plan = (
        asof_join(trades, quotes, "sym", "tms", "qms", ["px"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_join_no_duplicate_on_multi_bin(spark):
    """An interval spanning several bins must emit each matching point
    exactly once."""
    iv = spark.createDataFrame([(1, 0, 1000)], "iv_id bigint, s bigint, e bigint")
    pts = spark.createDataFrame(
        [(i, i * 100) for i in range(10)], "pt_id bigint, ms bigint"
    )
    out = interval_join(iv, pts, "s", "e", "ms", 100)
    assert out.count() == 10
    assert out.select("pt_id").distinct().count() == 10


def test_asof_ignores_null_right_timestamps(spark):
    """A right row with NULL ts must never match (<= is unknown for NULL);
    it used to sort nulls-first and shadow-match every left row."""
    from vectordb_acc_and_speed_exp_spark.operators.temporal import asof_join

    left = spark.createDataFrame([("A", 100)], "sym string, tms bigint")
    right = spark.createDataFrame(
        [("A", None, 5.0), ("A", 50, 7.0)], "sym string, qms bigint, px double"
    )
    out = asof_join(
        left, right, on="sym", left_ts="tms", right_ts="qms",
        right_cols=["px"], how="inner",
    ).collect()
    assert [(r.sym, r.px) for r in out] == [("A", 7.0)]
    # and with NO valid right row, inner yields nothing
    right2 = spark.createDataFrame(
        [("A", None, 5.0)], "sym string, qms bigint, px double"
    )
    assert (
        asof_join(
            left, right2, on="sym", left_ts="tms", right_ts="qms",
            right_cols=["px"], how="inner",
        ).count()
        == 0
    )


def test_asof_rejects_unknown_how(spark):
    import pytest as _pytest

    from vectordb_acc_and_speed_exp_spark.operators.temporal import asof_join

    left = spark.createDataFrame([("A", 1)], "sym string, tms bigint")
    with _pytest.raises(ValueError, match="how"):
        asof_join(
            left, left, on="sym", left_ts="tms", right_ts="tms",
            right_cols=[], how="Inner",
        )


def test_interval_join_inverted_interval_yields_nothing(spark):
    """end <= start must produce zero rows, not a descending bin fan-out."""
    from vectordb_acc_and_speed_exp_spark.operators.temporal import (
        interval_join,
    )

    iv = spark.createDataFrame(
        [(1, 5_000_000, 1_000)], "iid bigint, s_ms bigint, e_ms bigint"
    )
    pt = spark.createDataFrame([(9, 2_000)], "pid bigint, p_ms bigint")
    out = interval_join(
        iv, pt, start_col="s_ms", end_col="e_ms", ts_col="p_ms",
        bin_width_ms=1_000,
    )
    assert out.count() == 0
