"""Salted-join equivalence + hypothesis property tests for the portable
hash, shingles, and the fake encoder (SURVEY.md §5.3 metamorphic checks)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from vectordb_acc_and_speed_exp_spark.functions.hashing import portable_hash64
from vectordb_acc_and_speed_exp_spark.functions.skew import salted_join, with_salt
from vectordb_acc_and_speed_exp_spark.operators.embedding import fake_encode_text


def test_salted_join_matches_plain_join(spark):
    fact = spark.createDataFrame(
        [(k, i) for i in range(200) for k in (["hot"] * 3 + ["cold"])],
        "key string, v int",
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("unused", 3)], "key string, attr int"
    )
    plain = fact.join(dim, "key").groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s")
    )
    salted = salted_join(fact, dim, "key", n_salts=4).groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_is_deterministic_and_bounded(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "k int")
    a = with_salt(df, 8).collect()
    b = with_salt(df, 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r._salt < 8 for r in a)


# -- hypothesis property tests ---------------------------------------------

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    min_size=0,
    max_size=60,
)


@settings(max_examples=30, deadline=None)
@given(_text)
def test_portable_hash_matches_python_md5(spark, s):
    """The Spark expression equals int(md5_hex[:15], 16) — the same number
    DuckDB computes, pinned here against a third implementation."""
    got = (
        spark.range(1)
        .select(portable_hash64(F.lit(s)).alias("h"))
        .first()
        .h
    )
    expect = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    assert got == expect


@settings(max_examples=20, deadline=None)
@given(_text)
def test_fake_encoder_unit_norm_property(s):
    v = fake_encode_text(s, dim=16)
    assert len(v) == 16
    norm = sum(x * x for x in v) ** 0.5
    assert abs(norm - 1.0) < 1e-9
    assert v == fake_encode_text(s, dim=16)
