"""Vector column expressions vs NumPy ground truth."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from vectordb_acc_and_speed_exp_spark.functions.vector import (
    cosine_sim,
    dot,
    l2_dist,
    l2_norm,
    unit_normalize,
)

A = [1.0, -2.0, 3.5, 0.0]
B = [-0.5, 4.0, 2.0, 1.0]


@pytest.fixture(scope="module")
def pair_df(spark):
    return spark.createDataFrame([(A, B)], "a array<double>, b array<double>")


def test_dot(pair_df):
    got = pair_df.select(dot(F.col("a"), F.col("b")).alias("v")).first().v
    assert got == pytest.approx(np.dot(A, B), abs=1e-12)


def test_l2(pair_df):
    got = pair_df.select(l2_dist(F.col("a"), F.col("b")).alias("v")).first().v
    assert got == pytest.approx(np.linalg.norm(np.array(A) - np.array(B)), abs=1e-12)


def test_norm_and_cosine(pair_df):
    row = pair_df.select(
        l2_norm(F.col("a")).alias("na"),
        cosine_sim(F.col("a"), F.col("b")).alias("cs"),
    ).first()
    assert row.na == pytest.approx(np.linalg.norm(A), abs=1e-12)
    expect = np.dot(A, B) / (np.linalg.norm(A) * np.linalg.norm(B))
    assert row.cs == pytest.approx(expect, abs=1e-12)


def test_cosine_zero_vector(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
    )
    assert df.select(cosine_sim(F.col("a"), F.col("b")).alias("v")).first().v == 0.0


def test_unit_normalize(pair_df):
    got = pair_df.select(unit_normalize(F.col("a")).alias("v")).first().v
    assert math.isclose(math.sqrt(sum(x * x for x in got)), 1.0, abs_tol=1e-12)


# ---- unrolled fast path (round 13): explicit dim takes the codegen
# branch; results must be bit-identical to the HOF expression ----------


def test_unrolled_matches_hof_exactly(spark):
    # 64-dim (the default hint) and an explicit dim=4: both unrolled
    # branches must agree bit-for-bit with the HOF (dim=0) expression
    import random

    rng = random.Random(7)
    rows = [
        (
            [rng.uniform(-2, 2) for _ in range(64)],
            [rng.uniform(-2, 2) for _ in range(64)],
        )
        for _ in range(50)
    ]
    df = spark.createDataFrame(rows, "a array<float>, b array<float>")
    mism = df.select(
        dot(F.col("a"), F.col("b"), dim=64).alias("du"),
        dot(F.col("a"), F.col("b"), dim=0).alias("dh"),
        l2_dist(F.col("a"), F.col("b"), dim=64).alias("lu"),
        l2_dist(F.col("a"), F.col("b"), dim=0).alias("lh"),
        cosine_sim(F.col("a"), F.col("b"), dim=64).alias("cu"),
        cosine_sim(F.col("a"), F.col("b"), dim=0).alias("ch"),
    ).filter(
        "du IS DISTINCT FROM dh OR lu IS DISTINCT FROM lh "
        "OR cu IS DISTINCT FROM ch"
    )
    assert mism.count() == 0


def test_unrolled_guard_falls_back_on_other_dims(spark):
    # data is 4-dim but the hint says 64: the size() guard must route to
    # the HOF branch, so results equal the dim=0 (pure HOF) expression —
    # a wrong hint can never change a result
    df = spark.createDataFrame([(A, B)], "a array<double>, b array<double>")
    row = df.select(
        dot(F.col("a"), F.col("b"), dim=64).alias("gu"),
        dot(F.col("a"), F.col("b"), dim=0).alias("h"),
        l2_dist(F.col("a"), F.col("b"), dim=64).alias("lu"),
        l2_dist(F.col("a"), F.col("b"), dim=0).alias("lh"),
    ).first()
    assert row.gu == row.h and row.lu == row.lh


def test_unrolled_null_and_mismatch_semantics(spark):
    # null array -> null either way; mismatched lengths -> zip_with's
    # null-padding (null result) must survive because the guard requires
    # BOTH sizes to equal dim
    df = spark.createDataFrame(
        [
            (None, [1.0, 2.0]),
            ([1.0, 2.0, 3.0], [1.0, 2.0]),
        ],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        dot(F.col("a"), F.col("b"), dim=2).alias("du"),
        dot(F.col("a"), F.col("b"), dim=0).alias("dh"),
    ).collect()
    for r in rows:
        assert r.du == r.dh  # both null
        assert r.du is None
