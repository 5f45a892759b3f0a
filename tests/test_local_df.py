"""local_df (VALUES-literal local relation) == createDataFrame, row for row.

The helper exists purely for the execution-cost difference (JVM
LocalRelation vs a parallelize-backed scan that re-enters Python workers
per execution), so the whole contract is bit-equality with the
createDataFrame twin on the same rows/schema — including adversarial
strings, NULLs, and the empty frame."""

import math

import pytest

from vectordb_acc_and_speed_exp_spark.io.local import local_df

ADVERSARIAL = [
    (1, "plain"),
    (2, "it's quoted"),
    (3, "back\\slash"),
    (4, "both \\' mixed '' \\\\ deep"),
    (5, "new\nline and\ttab"),
    (6, "unicode: héllo wörld — 中文 🚀"),
    (7, ""),
    (8, None),
    (None, "null id"),
    (10, "semi; colon -- comment */ /* tricks"),
    (11, 'double "quotes" too'),
    (12, "percent % underscore _ dollar ${x}"),
]


def _names_types(df):
    return [(f.name, f.dataType) for f in df.schema.fields]


def _sorted_rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_strings_match_createdataframe(spark):
    ddl = "id long, txt string"
    a = local_df(spark, ADVERSARIAL, ddl)
    b = spark.createDataFrame(ADVERSARIAL, ddl)
    assert _names_types(a) == _names_types(b)
    assert _sorted_rows(a) == _sorted_rows(b)


def test_doubles_match_createdataframe(spark):
    rows = [
        (1, 0.1),
        (2, -1.5e-300),
        (3, 1.7976931348623157e308),
        (4, float("inf")),
        (5, float("-inf")),
        (6, None),
        (7, 54.1408),
        (8, 2.0 / 3.0),
    ]
    ddl = "id long, x double"
    a = local_df(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert _names_types(a) == _names_types(b)
    got = {r.id: r.x for r in a.collect()}
    want = {r.id: r.x for r in b.collect()}
    assert set(got) == set(want)
    for k in got:
        if want[k] is None:
            assert got[k] is None
        else:
            # bit-identity, not approx
            assert got[k] == want[k] or (got[k] != got[k] and want[k] != want[k])


def test_nan_roundtrip(spark):
    rows = [(1, float("nan"))]
    r = local_df(spark, rows, "id long, x double").first()
    assert math.isnan(r.x)


def test_empty_frame_schema(spark):
    a = local_df(spark, [], "id long, txt string")
    b = spark.createDataFrame([], "id long, txt string")
    assert _names_types(a) == _names_types(b)
    assert a.count() == 0


def test_int_type_and_nulls(spark):
    rows = [(1, 2), (None, None), (3, -4)]
    ddl = "a int, b long"
    a = local_df(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert _names_types(a) == _names_types(b)
    assert _sorted_rows(a) == _sorted_rows(b)


def test_rejects_unsupported_type(spark):
    with pytest.raises(ValueError, match="local_df supports only"):
        local_df(spark, [({"a": 1},)], "v map<string,int>")


def test_is_local_relation(spark):
    """The whole point: no RDD scan in the plan (no Python re-entry)."""
    plan = (
        local_df(spark, [(1, "x")], "id long, txt string")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Scan ExistingRDD" not in plan

def test_array_float_matches_createdataframe(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(64)]) for i in range(5)
    ] + [(9, []), (10, None), (11, [float("nan"), float("inf"), 0.0])]
    ddl = "query_id bigint, query_vec array<float>"
    a = local_df(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert _names_types(a) == _names_types(b)
    got = {r.query_id: r.query_vec for r in a.collect()}
    want = {r.query_id: r.query_vec for r in b.collect()}
    assert set(got) == set(want)
    for k in got:
        if want[k] is None:
            assert got[k] is None
            continue
        assert len(got[k]) == len(want[k])
        for x, y in zip(got[k], want[k]):
            # float32 bit-identity (NaN-aware)
            assert x == y or (x != x and y != y)


def test_array_int_matches_createdataframe(spark):
    rows = [(1, [3, 1, 2]), (2, []), (3, None), (4, [0])]
    ddl = "query_id bigint, cells array<int>"
    a = local_df(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert _names_types(a) == _names_types(b)
    assert {tuple(r) if r.cells is None else (r.query_id, tuple(r.cells)) for r in a.collect()} == \
           {tuple(r) if r.cells is None else (r.query_id, tuple(r.cells)) for r in b.collect()}


def test_rejects_nested_array(spark):
    with pytest.raises(ValueError, match="local_df supports only"):
        local_df(spark, [([[1.0]],)], "v array<array<double>>")
