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
