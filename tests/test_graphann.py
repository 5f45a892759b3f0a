"""Partition-local graph ANN (NSW scatter-gather) — the Spark analogue of
the reference's HNSW index. Evaluated the reference's way: recall vs the
exact oracle; fully deterministic (fixed insertion order, entry point,
id tie-breaks), so floors are regression floors."""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from vectordb_acc_and_speed_exp_spark.operators.graphann import (
    build_graph_index,
    build_nsw,
    graph_ann,
    graph_ann_pruned,
    graph_ann_visited_stats,
    write_graph_index,
)
from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn
from vectordb_acc_and_speed_exp_spark.operators.recall import mean_recall, recall_at_k


@pytest.fixture(scope="module")
def ground_truth(query_set, embeddings):
    return exact_knn(query_set, embeddings, k=10, item_id="vec_id").cache()


@pytest.fixture(scope="module")
def index(embeddings):
    return build_graph_index(embeddings, item_id="vec_id").cache()


def test_build_nsw_graph_shape():
    rng = np.random.default_rng(0)
    V = rng.standard_normal((200, 16))
    adj = build_nsw(V, M=6, ef_build=24)
    assert len(adj) == 200
    assert all(len(a) <= 12 for a in adj)  # degree cap 2*M
    assert all((a >= 0).all() and (a < 200).all() for a in adj if len(a))
    # every node except the seed is connected
    assert sum(len(a) > 0 for a in adj) >= 199


def test_index_is_self_contained(index, embeddings):
    n = embeddings.count()
    assert index.count() == n
    assert index.select("shard").distinct().count() == 8
    # neighbors reference real item ids within the same shard
    bad = (
        index.select("shard", F.explode("neighbors").alias("nbr"))
        .join(
            index.select("shard", F.col("item_id").alias("nbr")),
            ["shard", "nbr"],
            "left_anti",
        )
        .count()
    )
    assert bad == 0


def test_recall_and_self_match(query_set, index, ground_truth):
    """Measured 1.00 at ef=48 on the 500-doc corpus (8 shards); the floor
    is the reference's own 1k-docs HNSW recall (1.00, BASELINE.md)."""
    ann = graph_ann(query_set, index, k=10, ef_search=48)
    r = mean_recall(recall_at_k(ground_truth, ann, k=10)).first().mean_recall
    assert r >= 0.95, f"graph ANN recall@10 too low: {r}"
    top1 = {x.query_id: (x.item_id, x.dist) for x in ann.filter(F.col("rank") == 1).collect()}
    assert all(i == q and d == 0.0 for q, (i, d) in top1.items())


def test_deterministic(query_set, index):
    a = graph_ann(query_set, index, k=10).collect()
    b = graph_ann(query_set, index, k=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_visited_fraction_bounded():
    """The beam must NOT visit the whole graph: visited/size is the graph
    path's scanned fraction and the reason it scales (ef·M·log growth, not
    O(n)). At 62-node test shards the beam saturates, so the property is
    asserted on a 2000-node graph (measured ~0.18 at ef=48)."""
    from vectordb_acc_and_speed_exp_spark.operators.graphann import _nsw_search

    rng = np.random.default_rng(1)
    V = rng.standard_normal((2000, 64))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    adj = build_nsw(V)
    fracs = []
    for qi in range(5):
        found, n_visited = _nsw_search(V, adj, V[qi], 48, 0)
        fracs.append(n_visited / 2000)
        assert found[0][1] == qi  # exact self-match found through the graph
    assert max(fracs) < 0.5, f"beam visited too much: {fracs}"


def test_visited_stats_shape(query_set, index):
    stats = graph_ann_visited_stats(query_set, index, ef_search=16)
    rows = stats.collect()
    assert len(rows) == 40  # 5 queries x 8 shards
    assert all(0 < r.n_visited <= r.shard_size for r in rows)


def test_pruned_storage_matches_inmemory(spark, query_set, index, tmp_path):
    path = str(tmp_path / "graph_idx")
    write_graph_index(index, path)
    mem = graph_ann(query_set, index, k=10)
    disk = graph_ann_pruned(query_set, spark, path, k=10)
    assert sorted((r.query_id, r.rank, r.item_id) for r in mem.collect()) == sorted(
        (r.query_id, r.rank, r.item_id) for r in disk.collect()
    )
    assert len([d for d in os.listdir(path) if d.startswith("shard=")]) == 8
