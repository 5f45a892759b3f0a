"""The shared rerank broadcast-hint gate (operators/hints.py, round 14).

The r13 driver read ann_sq_topk at 3.25 s in BOTH its runs with the
unconditional F.broadcast(cand) hint (a fixed, core-count-independent
cost) vs 1.13 s without; mtlsh already gated its hint on the sidecar's
corpus size. These pin the gate's contract: hint exactly when the corpus
is known large, results identical either way.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from vectordb_acc_and_speed_exp_spark.operators.hints import (
    BROADCAST_RERANK_MIN_CORPUS,
    broadcast_if_large,
)


def _has_hint(df) -> bool:
    # the analyzed logical plan keeps the ResolvedHint node
    return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()


def test_gate_fires_only_at_large_corpus(spark):
    df = spark.range(10).withColumnRenamed("id", "item_id")
    assert broadcast_if_large(df, None) is df
    assert broadcast_if_large(df, 0) is df
    assert broadcast_if_large(df, BROADCAST_RERANK_MIN_CORPUS - 1) is df
    assert _has_hint(broadcast_if_large(df, BROADCAST_RERANK_MIN_CORPUS))
    assert _has_hint(broadcast_if_large(df, 10**9))


def test_sq_rerank_results_identical_with_and_without_hint(
    spark, embeddings, query_set
):
    """sq_search_rerank(n_corpus=None) vs n_corpus=10**6 (hint forced):
    a join-strategy hint may never change results."""
    from vectordb_acc_and_speed_exp_spark.operators.sq import (
        sq_encode,
        sq_search_rerank,
        sq_train,
    )

    corpus = embeddings.filter(F.col("vec_id") < 300)
    vmin, scale = sq_train(corpus, item_vec="embedding")
    enc = sq_encode(corpus, vmin, scale, item_id="vec_id")
    a = sq_search_rerank(
        query_set, corpus, enc, vmin, scale, k=5, shortlist=50,
        item_id="vec_id",
    ).collect()
    b = sq_search_rerank(
        query_set, corpus, enc, vmin, scale, k=5, shortlist=50,
        item_id="vec_id", n_corpus=10**6,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
