"""Composed IVF-PQ: coarse cell pruning + compressed-domain ADC short-list
+ exact re-rank (the FAISS-IVFPQ production configuration re-expressed as
partition-pruned parquet scans)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def ground_truth(query_set, embeddings):
    from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn

    return exact_knn(query_set, embeddings, k=10, item_id="vec_id").cache()


@pytest.fixture(scope="module")
def ivfpq_parts(spark, embeddings, tmp_path_factory):
    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )
    from vectordb_acc_and_speed_exp_spark.operators.pq import (
        pq_train,
        write_ivfpq_codes,
    )

    root = tmp_path_factory.mktemp("ivfpq")
    cents = kmeans_centroids(embeddings, n_cells=8)
    assigned = ivf_assign(embeddings, cents)
    corpus_path = str(root / "corpus")
    codes_path = str(root / "codes")
    write_ivf_corpus(assigned, corpus_path)
    books = pq_train(embeddings, m=8, k=16)
    write_ivfpq_codes(assigned, books, codes_path, item_id="vec_id")
    return corpus_path, codes_path, cents, books


def test_codes_layout_is_cell_partitioned(ivfpq_parts, embeddings):
    corpus_path, codes_path, cents, books = ivfpq_parts
    dirs = [d for d in os.listdir(codes_path) if d.startswith("cell=")]
    assert len(dirs) >= 2, "codes layout must be partitioned by cell"
    spark = embeddings.sparkSession
    codes = spark.read.parquet(codes_path)
    assert codes.count() == embeddings.count()
    row = codes.first()
    assert len(row.codes) == 8 and all(0 <= c < 16 for c in row.codes)


def test_ivfpq_recall_floor_and_strict_cells(
    spark, ivfpq_parts, query_set, embeddings, ground_truth
):
    """Default probing: recall floor, and strict IVF semantics — every
    returned candidate lives in a cell its query actually probed."""
    from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn
    from vectordb_acc_and_speed_exp_spark.operators.pq import ivfpq_search
    from vectordb_acc_and_speed_exp_spark.operators.recall import (
        mean_recall,
        recall_at_k,
    )

    corpus_path, codes_path, cents, books = ivfpq_parts
    res = ivfpq_search(
        query_set, spark, codes_path, corpus_path, cents, books,
        k=10, n_probe=3, shortlist=100, item_id="vec_id",
    ).cache()
    r = mean_recall(recall_at_k(ground_truth, res, k=10)).first().mean_recall
    assert r >= 0.5, f"IVF-PQ recall@10 too low: {r}"

    # strictness: candidate cells ⊆ the query's probed cells
    qcells = exact_knn(
        query_set, cents, k=3, item_id="cell", item_vec="centroid"
    ).select(F.col("query_id"), F.col("item_id").alias("cell"))
    cand_cells = res.join(
        spark.read.parquet(corpus_path).select(
            F.col("vec_id").alias("item_id"), "cell"
        ),
        "item_id",
    ).select("query_id", "cell")
    stray = cand_cells.join(qcells, ["query_id", "cell"], "left_anti").count()
    assert stray == 0, "candidate outside its query's probed cells"


def test_ivfpq_full_probe_full_shortlist_is_exact(
    spark, ivfpq_parts, query_set, embeddings, ground_truth
):
    """n_probe = n_cells and shortlist >= corpus turns IVF-PQ into exact
    brute force (the re-rank sees every row) — metamorphic identity."""
    from vectordb_acc_and_speed_exp_spark.operators.pq import ivfpq_search
    from vectordb_acc_and_speed_exp_spark.operators.recall import (
        mean_recall,
        recall_at_k,
    )

    corpus_path, codes_path, cents, books = ivfpq_parts
    n = embeddings.count()
    res = ivfpq_search(
        query_set, spark, codes_path, corpus_path, cents, books,
        k=10, n_probe=8, shortlist=n, item_id="vec_id",
    )
    r = mean_recall(recall_at_k(ground_truth, res, k=10)).first().mean_recall
    assert r == 1.0
