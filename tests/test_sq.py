"""SQ8 scalar quantization: encode fidelity bound, rerank==exact
metamorphic, build/search split, recall floor."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn
from vectordb_acc_and_speed_exp_spark.operators.recall import (
    mean_recall,
    recall_at_k,
)
from vectordb_acc_and_speed_exp_spark.operators.sq import (
    sq_encode,
    sq_search,
    sq_search_rerank,
    sq_train,
)


@pytest.fixture(scope="module")
def sq_params(embeddings):
    return sq_train(embeddings, item_vec="embedding")


@pytest.fixture(scope="module")
def encoded(embeddings, sq_params):
    vmin, scale = sq_params
    return sq_encode(embeddings, vmin, scale, item_id="vec_id").cache()


def test_codes_in_range_and_fidelity(embeddings, encoded, sq_params):
    """Every code in [0,255]; decode error per dim ≤ scale/2 (the SQ8
    guarantee)."""
    vmin, scale = sq_params
    rows = encoded.join(
        embeddings.select(F.col("vec_id").alias("item_id"), "embedding"),
        "item_id",
    ).collect()
    assert rows
    for r in rows[:50]:
        c = np.array(r.codes)
        assert c.min() >= 0 and c.max() <= 255
        xhat = vmin + c * scale
        err = np.abs(np.array(r.embedding, dtype=np.float64) - xhat)
        tol = scale / 2.0 + 1e-9
        assert (err <= tol).all(), float(err.max())


def test_full_shortlist_rerank_is_exact(query_set, embeddings, encoded, sq_params):
    """Short-list covering the whole corpus → rerank output == exact kNN."""
    vmin, scale = sq_params
    n = embeddings.count()
    got = sq_search_rerank(
        query_set, embeddings, encoded, vmin, scale,
        k=10, shortlist=n, item_id="vec_id", item_vec="embedding",
    )
    gt = exact_knn(query_set, embeddings, k=10, item_id="vec_id")
    assert sorted((r.query_id, r.rank, r.item_id) for r in got.collect()) == sorted(
        (r.query_id, r.rank, r.item_id) for r in gt.collect()
    )


def test_sq_scan_recall_without_rerank(query_set, embeddings, encoded, sq_params):
    """The raw compressed scan alone (no exact re-rank) keeps recall@10
    ≥ 0.9 — int8 fidelity is high by design."""
    vmin, scale = sq_params
    ann = sq_search(query_set, encoded, vmin, scale, k=10)
    gt = exact_knn(query_set, embeddings, k=10, item_id="vec_id")
    r = mean_recall(recall_at_k(gt, ann, k=10)).first().mean_recall
    assert r >= 0.9, f"SQ8 raw-scan recall too low: {r}"


def test_constant_dim_handled():
    """A constant dimension (scale=0) must encode to 0 and decode to vmin,
    not divide by zero."""
    from vectordb_acc_and_speed_exp_spark.session import get_spark

    spark = get_spark("tests", cpus=4, shuffle_partitions=8)
    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [2.0, 5.0]), (3, [3.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    vmin, scale = sq_train(df, item_vec="embedding", dim=2)
    assert scale[1] == 0.0
    enc = sq_encode(df, vmin, scale, item_id="vec_id").collect()
    assert all(r.codes[1] == 0 for r in enc)


def test_gate_entry_reuses_built_index(spark, sf_dir):
    import os

    from vectordb_acc_and_speed_exp_spark.queries.pipeline import (
        _index_root,
        ann_sq_topk,
    )

    assert ann_sq_topk(spark, sf_dir).count() == 50
    marker = os.path.join(_index_root(sf_dir), "sq._DONE")
    m1 = os.path.getmtime(marker)
    assert ann_sq_topk(spark, sf_dir).count() == 50
    assert os.path.getmtime(marker) == m1


def test_ivfsq_fullprobe_equals_exact(spark, query_set, embeddings, sq_params, tmp_path):
    """IVF-SQ with every cell probed and a corpus-sized short-list == exact
    kNN (the composed metamorphic identity), and the codes layout is
    really cell-partitioned."""
    import os

    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )
    from vectordb_acc_and_speed_exp_spark.operators.sq import (
        ivfsq_search,
        write_ivfsq_codes,
    )

    vmin, scale = sq_params
    cents = kmeans_centroids(embeddings, n_cells=8)
    assigned = ivf_assign(embeddings, cents)
    corpus_path = str(tmp_path / "ivfsq_corpus")
    codes_path = str(tmp_path / "ivfsq_codes")
    write_ivf_corpus(assigned, corpus_path)
    write_ivfsq_codes(assigned, vmin, scale, codes_path, item_id="vec_id")
    assert len([d for d in os.listdir(codes_path) if d.startswith("cell=")]) >= 2

    n = embeddings.count()
    got = ivfsq_search(
        query_set, spark, codes_path, corpus_path, cents, vmin, scale,
        k=10, n_probe=8, shortlist=n, item_id="vec_id",
    )
    gt = exact_knn(query_set, embeddings, k=10, item_id="vec_id")
    assert sorted((r.query_id, r.rank, r.item_id) for r in got.collect()) == sorted(
        (r.query_id, r.rank, r.item_id) for r in gt.collect()
    )


def test_ivfsq_pruned_recall(spark, query_set, embeddings, sq_params, tmp_path):
    """The production config (4 of 8 cells, shortlist 100) keeps recall@10
    ≥ 0.6 (IVF cell coverage is the binding constraint, not SQ fidelity)."""
    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )
    from vectordb_acc_and_speed_exp_spark.operators.sq import (
        ivfsq_search,
        write_ivfsq_codes,
    )

    vmin, scale = sq_params
    cents = kmeans_centroids(embeddings, n_cells=8)
    assigned = ivf_assign(embeddings, cents)
    corpus_path = str(tmp_path / "p_corpus")
    codes_path = str(tmp_path / "p_codes")
    write_ivf_corpus(assigned, corpus_path)
    write_ivfsq_codes(assigned, vmin, scale, codes_path, item_id="vec_id")
    ann = ivfsq_search(
        query_set, spark, codes_path, corpus_path, cents, vmin, scale,
        k=10, n_probe=4, shortlist=100, item_id="vec_id",
    )
    gt = exact_knn(query_set, embeddings, k=10, item_id="vec_id")
    r = mean_recall(recall_at_k(gt, ann, k=10)).first().mean_recall
    assert r >= 0.6, f"IVF-SQ recall too low: {r}"


def test_sq_search_tolerates_empty_partitions(spark, embeddings, query_set):
    """mapInPandas can hand the kernel empty Arrow batches (empty input
    partitions); the scan must skip them instead of raising a broadcast
    error."""
    from vectordb_acc_and_speed_exp_spark.operators.sq import (
        sq_encode,
        sq_search,
        sq_train,
    )

    tiny = embeddings.limit(3)
    vmin, scale = sq_train(tiny)
    encoded = sq_encode(tiny, vmin, scale, item_id="vec_id").repartition(8)
    out = sq_search(query_set, encoded, vmin, scale, k=2)
    assert out.count() > 0
