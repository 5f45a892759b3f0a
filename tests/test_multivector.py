"""MaxSim late-interaction operator (operators/multivector.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn
from vectordb_acc_and_speed_exp_spark.operators.multivector import (
    GRID,
    maxsim_topk,
)


def _tok(df, idcol, group):
    return df.select(
        F.floor(F.col("vec_id") / group).cast("bigint").alias(idcol),
        F.col("vec_id").alias("qtok" if idcol == "qid" else "dtok"),
        F.col("embedding").alias("qv" if idcol == "qid" else "ev"),
    )


def test_degenerates_to_cosine_knn(embeddings, query_set):
    """1 token per query, 1 token per doc => MaxSim ranking == exact cosine
    k-NN ranking (score = the single pairwise cosine)."""
    qt = query_set.select(
        F.col("query_id").alias("qid"),
        F.col("query_id").alias("qtok"),
        F.col("query_vec").alias("qv"),
    )
    dt = embeddings.select(
        F.col("vec_id").alias("doc_id"),
        F.col("vec_id").alias("dtok"),
        F.col("embedding").alias("ev"),
    )
    ms = maxsim_topk(qt, dt, k=10)
    exact = exact_knn(query_set, embeddings, k=10, metric="cosine", item_id="vec_id")
    got = sorted((r.qid, r.rank, r.doc_id) for r in ms.collect())
    want = sorted((r.query_id, r.rank, r.item_id) for r in exact.collect())
    assert got == want


def test_self_doc_ranks_first(embeddings):
    """A doc containing exactly the query's token vectors is unbeatable:
    every query token maxes out at cosine 1.0 against its own copy."""
    qt = _tok(embeddings.filter(F.col("vec_id") < 8), "qid", 8)
    dt = _tok(embeddings, "doc_id", 8)
    top = maxsim_topk(qt, dt, k=1).collect()
    assert len(top) == 1
    assert top[0].doc_id == 0
    assert top[0].score_s6 == 8 * GRID


def test_duplicate_doc_tokens_do_not_change_score(embeddings):
    """max over doc tokens is idempotent under duplication."""
    qt = _tok(embeddings.filter(F.col("vec_id") < 10), "qid", 5)
    dt = _tok(embeddings, "doc_id", 8)
    base = maxsim_topk(qt, dt, k=10)
    doubled = maxsim_topk(qt, dt.unionAll(dt), k=10)
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, doubled.collect())
    )
