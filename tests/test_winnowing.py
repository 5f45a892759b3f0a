"""Winnowing fingerprint properties (queries/textops.py::_winnowing_fp_frame).

The classic guarantee (Schleimer/Wilkerson/Aiken 2003): with window w over
k-gram hashes, any shared token run of length >= w + k - 1 contains a full
window of w shared grams, whose minimum hash both documents select — so
near-copies ALWAYS share a fingerprint. Hypothesis drives random corpora
with planted shared runs."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from vectordb_acc_and_speed_exp_spark.queries.textops import (
    _winnowing_fp_frame,
)

W, K = 4, 3
_VOCAB = [f"w{i}" for i in range(200)]


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {}
    for r in _winnowing_fp_frame(df, w=W, k=K).collect():
        out.setdefault(r.doc_id, set()).add(r.h40)
    return out


@settings(max_examples=12, deadline=None)
@given(st.integers(0, 10**6))
def test_shared_run_guarantees_shared_fingerprint(spark, seed):
    """Two docs with a planted shared run of w + k - 1 = 6 tokens share at
    least one fingerprint hash, whatever surrounds the run."""
    rng = random.Random(seed)
    run = rng.sample(_VOCAB, W + K - 1)
    a = rng.sample(_VOCAB, rng.randint(0, 12)) + run + rng.sample(
        _VOCAB, rng.randint(0, 12)
    )
    b = rng.sample(_VOCAB, rng.randint(0, 12)) + run + rng.sample(
        _VOCAB, rng.randint(0, 12)
    )
    fps = _fps(spark, [(0, " ".join(a)), (1, " ".join(b))])
    assert fps[0] & fps[1], (a, b)


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 10**6))
def test_identical_docs_identical_fingerprints(spark, seed):
    rng = random.Random(seed)
    text = " ".join(rng.choices(_VOCAB, k=rng.randint(K, 40)))
    fps = _fps(spark, [(0, text), (1, text)])
    assert fps[0] == fps[1]


def test_density_bound(spark, documents):
    """Selected fingerprints per doc <= valid window starts (one pick per
    window), and > 0 for every doc with >= k tokens."""
    import pyspark.sql.functions as F

    fp = _winnowing_fp_frame(documents, w=W, k=K)
    per_doc = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    from vectordb_acc_and_speed_exp_spark.functions.text import token_count

    toks = documents.select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    joined = per_doc.join(toks, "doc_id").collect()
    assert len(joined) > 0
    for r in joined:
        n_grams = max(r.n_tok - (K - 1), 1)
        n_windows = max(n_grams - W, 0) + 1
        assert 0 < r.n_fp <= n_windows, r
