"""Binary quantization (operators/bq.py): encode exactness, Hamming
identities, full-shortlist degeneration, recall floor.

The reference has no compressed index (it delegates to hnswlib,
chromadb_acc_experiment.py:622-628); BQ is the [EXT] 1-bit point on the
EP5 bytes/recall ladder. The tests mirror test_sq.py's structure.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectordb_acc_and_speed_exp_spark.operators.bq import (
    bq_encode,
    bq_search_rerank,
    bq_train,
)
from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn


@pytest.fixture(scope="module")
def bq_params(embeddings):
    sums, n = bq_train(embeddings, item_vec="embedding", dim=64)
    return sums, n


def test_train_shape_and_count(bq_params, embeddings):
    sums, n = bq_params
    assert len(sums) == 64
    assert n == embeddings.count()


def test_encode_codes_nonneg_and_deterministic(bq_params, embeddings):
    sums, n = bq_params
    enc1 = bq_encode(embeddings, sums, n, item_id="vec_id").orderBy("item_id")
    enc2 = bq_encode(embeddings, sums, n, item_id="vec_id").orderBy("item_id")
    rows1, rows2 = enc1.collect(), enc2.collect()
    assert rows1 == rows2
    for r in rows1:
        # 32 bits per word, packed without the sign bit => non-negative
        assert 0 <= r.code_lo < 2**32
        assert 0 <= r.code_hi < 2**32


def test_bit_balance_mean_split(bq_params, embeddings):
    """Mean-threshold on a roughly symmetric corpus sets ~half the bits."""
    sums, n = bq_params
    enc = bq_encode(embeddings, sums, n, item_id="vec_id")
    total_bits = enc.select(
        F.sum(F.bit_count("code_lo") + F.bit_count("code_hi")).alias("b")
    ).first()["b"]
    frac = total_bits / (n * 64)
    assert 0.30 < frac < 0.70


def test_self_query_rank1_hamming0(bq_params, embeddings, query_set):
    """A corpus vector queried against the corpus finds itself at Hamming 0
    and L2 0 (codes are a pure function of the vector)."""
    sums, n = bq_params
    res = bq_search_rerank(
        query_set, embeddings, sums, n, k=1, shortlist=10, item_id="vec_id"
    ).collect()
    by_qid = {r.query_id: r for r in res}
    for qid in range(5):
        assert by_qid[qid].item_id == qid
        assert by_qid[qid].hamming == 0
        assert by_qid[qid].dist == 0.0


def test_full_shortlist_equals_exact(bq_params, embeddings, query_set):
    """shortlist >= corpus makes the Hamming stage a no-op filter: the
    re-rank sees every row, so BQ degenerates to exact k-NN."""
    sums, n = bq_params
    corpus_n = embeddings.count()
    bq = bq_search_rerank(
        query_set, embeddings, sums, n, k=10, shortlist=corpus_n,
        item_id="vec_id",
    ).select("query_id", "rank", "item_id")
    exact = exact_knn(query_set, embeddings, k=10, item_id="vec_id").select(
        "query_id", "rank", "item_id"
    )
    assert sorted(map(tuple, bq.collect())) == sorted(map(tuple, exact.collect()))


def test_recall_floor_at_shortlist100(bq_params, embeddings, query_set):
    """1-bit codes + shortlist 100 of 500 should keep recall@10 well above
    random (random 100/500 shortlist => E[recall] ~ 0.2)."""
    sums, n = bq_params
    bq = bq_search_rerank(
        query_set, embeddings, sums, n, k=10, shortlist=100, item_id="vec_id"
    )
    exact = exact_knn(query_set, embeddings, k=10, item_id="vec_id")
    got = {(r.query_id, r.item_id) for r in bq.collect()}
    want = {(r.query_id, r.item_id) for r in exact.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.5, f"BQ recall@10 {recall:.2f} below floor"
