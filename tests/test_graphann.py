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


@pytest.fixture(scope="module")
def cell_index(spark, embeddings, tmp_path_factory):
    """SPANN-style shards: IVF cells (8) instead of hash shards, written
    cell-partitioned; returns (index_path, centroids)."""
    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_assign,
        kmeans_centroids,
    )

    cents = kmeans_centroids(embeddings, n_cells=8)
    assigned = ivf_assign(embeddings, cents)
    idx = build_graph_index(assigned, item_id="vec_id", shard_col="cell")
    path = str(tmp_path_factory.mktemp("graph") / "cell_idx")
    write_graph_index(idx, path)
    return path, cents


def test_cell_probed_full_probe_matches_scatter(spark, query_set, cell_index):
    """n_probe = n_cells degenerates to the full scatter-gather over the
    same index — the pruning must only ever REMOVE shards, never change
    per-shard results."""
    from vectordb_acc_and_speed_exp_spark.operators.graphann import (
        graph_ann_cell_probed,
    )

    path, cents = cell_index
    full = graph_ann_cell_probed(query_set, spark, path, cents, k=10, n_probe=8)
    scatter = graph_ann(query_set, spark.read.parquet(path), k=10)
    assert sorted((r.query_id, r.rank, r.item_id) for r in full.collect()) == sorted(
        (r.query_id, r.rank, r.item_id) for r in scatter.collect()
    )


def test_cell_probed_recall_and_pruning(spark, query_set, cell_index, ground_truth):
    """Probing 3 of 8 cells: results come only from probed cells; with
    ef=48 saturating 60-node shards the graph is near-exact inside each
    probed cell, so recall == IVF cell-coverage recall — measured 0.84 on
    the weak-structure 500-doc corpus (max pairwise cosine ~0.51 ⇒ true
    neighbors scatter across cells; cf. the plain-IVF floor 0.6 at 4/16).
    On clustered real data coverage, and hence recall, is far higher."""
    from vectordb_acc_and_speed_exp_spark.operators.graphann import (
        graph_ann_cell_probed,
        query_probe_map,
    )

    path, cents = cell_index
    res = graph_ann_cell_probed(query_set, spark, path, cents, k=10, n_probe=3).cache()
    pm = query_probe_map(query_set, cents, n_probe=3)
    assert all(len(v) == 3 for v in pm.values())
    # every result row's item lives in a cell its query probed
    idx = spark.read.parquet(path).select(
        F.col("item_id"), F.col("shard").cast("bigint").alias("shard")
    )
    for r in res.join(idx, "item_id").collect():
        assert r.shard in pm[r.query_id], (r.query_id, r.item_id, r.shard)
    r10 = mean_recall(recall_at_k(ground_truth, res, k=10)).first().mean_recall
    assert r10 >= 0.8, f"cell-probed graph recall@10 too low: {r10}"


def test_pruned_storage_matches_inmemory(spark, query_set, index, tmp_path):
    path = str(tmp_path / "graph_idx")
    write_graph_index(index, path)
    mem = graph_ann(query_set, index, k=10)
    disk = graph_ann_pruned(query_set, spark, path, k=10)
    assert sorted((r.query_id, r.rank, r.item_id) for r in mem.collect()) == sorted(
        (r.query_id, r.rank, r.item_id) for r in disk.collect()
    )
    assert len([d for d in os.listdir(path) if d.startswith("shard=")]) == 8


def _index_rows(df):
    return sorted(
        (int(r.shard), int(r.item_id), tuple(r.neighbors)) for r in df.collect()
    )


def test_upsert_equals_full_rebuild(spark, embeddings, tmp_path):
    """upsert(build(A), B) == build(A ∪ B) bit-for-bit, and shards B never
    touches keep their exact files (dynamic partition overwrite)."""
    from vectordb_acc_and_speed_exp_spark.operators.graphann import (
        graph_index_upsert,
    )

    shard = (F.crc32(F.col("vec_id").cast("string")) % 8).alias("_s")
    tagged = embeddings.select("vec_id", "embedding", shard).cache()
    late = tagged.filter(F.col("_s").isin(1, 3) & (F.col("vec_id") >= 300))
    initial = tagged.join(late.select("vec_id"), "vec_id", "left_anti")

    path = str(tmp_path / "upsert_idx")
    write_graph_index(build_graph_index(initial, item_id="vec_id"), path)
    files_before = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path)
        if d.startswith("shard=")
    }

    rebuilt = graph_index_upsert(spark, path, late, item_id="vec_id")
    assert rebuilt == [1, 3]

    full = build_graph_index(embeddings, item_id="vec_id")
    assert _index_rows(spark.read.parquet(path)) == _index_rows(full)
    # untouched shard directories: identical file listing
    for d, files in files_before.items():
        if d not in ("shard=1", "shard=3"):
            assert sorted(os.listdir(os.path.join(path, d))) == files


def test_upsert_replaces_existing_ids(spark, embeddings, tmp_path):
    from vectordb_acc_and_speed_exp_spark.operators.graphann import (
        graph_index_upsert,
    )

    path = str(tmp_path / "replace_idx")
    write_graph_index(build_graph_index(embeddings, item_id="vec_id"), path)
    n = embeddings.count()
    redo = embeddings.filter(F.col("vec_id") < 20).select("vec_id", "embedding")
    graph_index_upsert(spark, path, redo, item_id="vec_id")
    after = spark.read.parquet(path)
    assert after.count() == n  # replaced, not duplicated
    assert after.select("item_id").distinct().count() == n
