"""MMR diversity re-rank: degeneracy to top-k at λ=1, containment,
diversity effect, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn
from vectordb_acc_and_speed_exp_spark.operators.rerank import mmr_rerank


@pytest.fixture(scope="module")
def cand50(query_set, embeddings):
    return (
        exact_knn(query_set, embeddings, k=50, metric="cosine", item_id="vec_id")
        .select("query_id", "item_id", "rank")
        .cache()
    )


@pytest.fixture(scope="module")
def item_vecs(embeddings):
    return embeddings.select(F.col("vec_id").alias("item_id"), "embedding")


def test_lambda_one_is_plain_topk(query_set, cand50, item_vecs):
    """λ=1 removes the redundancy term → MMR must reproduce the cosine
    top-10 in rank order."""
    got = mmr_rerank(cand50, item_vecs, query_set, k=10, lam=1.0).collect()
    want = {
        (r.query_id, r.rank): r.item_id
        for r in cand50.filter(F.col("rank") <= 10).collect()
    }
    assert len(got) == len(want)
    for r in got:
        assert want[(r.query_id, r.mmr_rank)] == r.item_id


def test_selection_contained_and_first_is_top1(query_set, cand50, item_vecs):
    got = mmr_rerank(cand50, item_vecs, query_set, k=10, lam=0.5)
    cand_ids = {
        (r.query_id, r.item_id): r.rank for r in cand50.collect()
    }
    top1 = {q: i for (q, i), rk in cand_ids.items() if rk == 1}
    rows = got.collect()
    for r in rows:
        assert (r.query_id, r.item_id) in cand_ids
    firsts = {r.query_id: r.item_id for r in rows if r.mmr_rank == 1}
    # the first MMR pick maximizes λ·sim alone == the top-1 candidate
    assert firsts == top1


def test_diversity_reduces_pairwise_sim(query_set, cand50, item_vecs, embeddings):
    """Mean pairwise cosine among MMR-selected (λ=0.3) must not exceed the
    plain top-10's — the whole point of the operator."""
    import numpy as np

    vecs = {r.item_id: np.array(r.embedding) for r in item_vecs.collect()}

    def mean_pair_sim(ids):
        X = np.array([vecs[i] for i in ids], dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = Xn @ Xn.T
        n = len(ids)
        return (S.sum() - n) / (n * (n - 1))

    mmr = mmr_rerank(cand50, item_vecs, query_set, k=10, lam=0.3).collect()
    plain = cand50.filter(F.col("rank") <= 10).collect()
    by_q_mmr, by_q_plain = {}, {}
    for r in mmr:
        by_q_mmr.setdefault(r.query_id, []).append(r.item_id)
    for r in plain:
        by_q_plain.setdefault(r.query_id, []).append(r.item_id)
    mmr_sims = [mean_pair_sim(v) for v in by_q_mmr.values()]
    plain_sims = [mean_pair_sim(v) for v in by_q_plain.values()]
    assert sum(mmr_sims) / len(mmr_sims) <= sum(plain_sims) / len(plain_sims) + 1e-12


def test_deterministic(query_set, cand50, item_vecs):
    a = mmr_rerank(cand50, item_vecs, query_set, k=10, lam=0.5).collect()
    b = mmr_rerank(cand50, item_vecs, query_set, k=10, lam=0.5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cross_encoder_fake_and_mock_real_branch(spark, documents):
    """Fake branch: identical text is the top pair; real branch: a mock
    sentence_transformers module exercises load-once + batch predict."""
    import sys
    import types

    import pandas as pd

    from vectordb_acc_and_speed_exp_spark.operators.crossencoder import (
        cross_encoder_rerank,
        fake_pair_score,
        make_pair_score_iter,
    )

    probe = documents.limit(3).collect()
    cand = spark.createDataFrame(
        [
            (q.doc_id, q.text, d.doc_id, d.text)
            for q in probe
            for d in probe
        ],
        "query_id long, query_text string, item_id long, doc_text string",
    )
    res = cross_encoder_rerank(cand, k=3).collect()
    top1 = {r.query_id: r.item_id for r in res if r.ce_rank == 1}
    assert top1 == {q.doc_id: q.doc_id for q in probe}
    # score sanity: identical text maximizes the fake
    assert fake_pair_score("a b c", "a b c") > fake_pair_score("a b c", "a x y")

    # mock real-model branch (torch absent -> inject a fake module)
    calls = []

    class _MockCE:
        def __init__(self, path):
            calls.append(("load", path))

        def predict(self, pairs):
            calls.append(("predict", len(pairs)))
            return [float(len(q) + len(d)) for q, d in pairs]

    mod = types.ModuleType("sentence_transformers")
    mod.CrossEncoder = _MockCE
    old = sys.modules.get("sentence_transformers")
    sys.modules["sentence_transformers"] = mod
    try:
        it = make_pair_score_iter(model_path="mock-model")
        out = list(
            it(iter([(pd.Series(["ab", "c"]), pd.Series(["d", "ef"]))]))
        )
        assert out[0].tolist() == [3.0, 3.0]
        assert calls[0] == ("load", "mock-model")
        assert ("predict", 2) in calls
    finally:
        if old is None:
            del sys.modules["sentence_transformers"]
        else:
            sys.modules["sentence_transformers"] = old


def test_rerank_cross_encoder_gate_entry(spark, sf_dir):
    from vectordb_acc_and_speed_exp_spark.queries.retrieval import (
        rerank_cross_encoder,
    )

    rows = rerank_cross_encoder(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for rows_q in by_q.values():
        rows_q.sort(key=lambda r: r.rank)
        scores = [r.ce_score_r for r in rows_q]
        assert scores == sorted(scores, reverse=True)
        assert len({r.doc_id for r in rows_q}) == len(rows_q)
