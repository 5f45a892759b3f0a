"""Exact k-NN (V2/V4) + recall evaluator (V5) semantics: the metamorphic
properties from SURVEY.md §5.3."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn
from vectordb_acc_and_speed_exp_spark.operators.recall import mean_recall, recall_at_k


def test_self_is_nearest(query_set, embeddings):
    res = exact_knn(query_set, embeddings, k=5, item_id="vec_id").collect()
    first = {r.query_id: r for r in res if r.rank == 1}
    for qid, row in first.items():
        assert row.item_id == qid
        assert row.dist == 0.0


def test_k_rows_per_query_sorted(query_set, embeddings):
    res = exact_knn(query_set, embeddings, k=10, item_id="vec_id")
    rows = res.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 5
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, 11))
        dists = [r.dist for r in rs]
        assert dists == sorted(dists)


def test_matches_numpy_bruteforce(query_set, embeddings):
    """Exact parity with the reference kernel np.linalg.norm + argsort
    (chromadb_acc_experiment.py:527-534)."""
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in embeddings.collect()}
    ids = sorted(emb)
    mat = np.stack([emb[i] for i in ids])
    got = exact_knn(query_set, embeddings, k=10, item_id="vec_id").collect()
    for q in query_set.collect():
        qv = np.array(q.query_vec, dtype=np.float64)
        d = np.linalg.norm(mat - qv, axis=1)
        order = np.lexsort((ids, d))[:10]
        expect = [ids[i] for i in order]
        mine = [r.item_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == q.query_id]
        assert mine == expect


def test_recall_identity_is_one(query_set, embeddings):
    gt = exact_knn(query_set, embeddings, k=10, item_id="vec_id")
    per_q = recall_at_k(gt, gt, k=10)
    assert all(r.recall == 1.0 for r in per_q.collect())
    assert mean_recall(per_q).first().mean_recall == 1.0


def test_recall_disjoint_is_zero(spark):
    gt = spark.createDataFrame(
        [(1, r, f"a{r}") for r in range(1, 6)], "query_id int, rank int, item_id string"
    )
    ret = spark.createDataFrame(
        [(1, r, f"b{r}") for r in range(1, 6)], "query_id int, rank int, item_id string"
    )
    assert recall_at_k(gt, ret, k=5).first().recall == 0.0


def test_recall_truncates_to_k(spark):
    """Both sides truncated to k before intersecting (ACC:553-562)."""
    gt = spark.createDataFrame(
        [(1, r, f"x{r}") for r in range(1, 11)], "query_id int, rank int, item_id string"
    )
    # retrieved has the true top-5 but at ranks 6-10 (so outside k=5 cut)
    ret = spark.createDataFrame(
        [(1, r, f"y{r}") for r in range(1, 6)]
        + [(1, 5 + i, f"x{i}") for i in range(1, 6)],
        "query_id int, rank int, item_id string",
    )
    assert recall_at_k(gt, ret, k=5).first().recall == 0.0
    assert recall_at_k(gt, ret, k=10).first().recall == 0.5


def test_ip_metric_matches_numpy(query_set, embeddings):
    """MIPS ranking parity: negated-dot ordering == numpy argsort of -dot."""
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in embeddings.collect()
    }
    ids = sorted(emb)
    mat = np.stack([emb[i] for i in ids])
    got = exact_knn(
        query_set, embeddings, k=10, metric="ip", item_id="vec_id"
    ).collect()
    for q in query_set.collect():
        qv = np.array(q.query_vec, dtype=np.float64)
        d = -(mat @ qv)
        order = np.lexsort((ids, d))[:10]
        expect = [ids[i] for i in order]
        mine = [
            r.item_id
            for r in sorted(got, key=lambda r: r.rank)
            if r.query_id == q.query_id
        ]
        assert mine == expect
