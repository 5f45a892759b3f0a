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
