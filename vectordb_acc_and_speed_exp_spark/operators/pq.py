"""Product quantization (PQ) — compressed-domain approximate search.

The 100 TB story: a 768-dim float32 corpus is ~3 KB/vector; PQ with m=8
sub-spaces and k=16 centroids stores 8 x 4-bit codes (4 bytes + id) — a
~700x reduction of the scanned bytes. Search uses asymmetric distance
computation (ADC): per query, an m x k lookup table of exact
query-subvector-to-centroid distances; a corpus row's approximate distance
is the sum of m table entries selected by its codes. The scan is then
gather+sum over bytes — no float vectors touched until an optional exact
re-rank of the short-list.

Codebooks are trained with seeded MLlib KMeans per sub-space (sampled at
real scale). Everything downstream is numpy inside mapInPandas (one LUT
gather per Arrow batch) with the same partial-top-k + final-merge shape as
operators/simjoin.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pq_train(
    corpus: DataFrame,
    item_vec: str = "embedding",
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Train per-sub-space codebooks. Returns array (m, k, dim//m).

    ``sample_fraction`` trains each sub-space KMeans on a seeded sample:
    codebook quality saturates at ~100k points, so at scale training is a
    build-time job over a sample, never repeated at query time."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(corpus.select(item_vec).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if sample_fraction is not None and sample_fraction < 1.0:
        corpus = corpus.sample(
            withReplacement=False, fraction=sample_fraction, seed=seed
        )
    dsub = dim // m
    books = []
    for s in range(m):
        sub = corpus.select(
            array_to_vector(
                F.slice(F.col(item_vec).cast("array<double>"), s * dsub + 1, dsub)
            ).alias("features")
        )
        model = KMeans(k=k, seed=seed + s, maxIter=max_iter).fit(sub)
        books.append([list(c) for c in model.clusterCenters()])
    return np.array(books, dtype=np.float64)


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    item_id: str = "item_id",
    item_vec: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): nearest centroid per sub-space. One numpy
    argmin per Arrow batch per sub-space."""
    spark = corpus.sparkSession
    b_books = spark.sparkContext.broadcast(codebooks)
    m, k, dsub = codebooks.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = b_books.value
        for pdf in batches:
            X = np.array(pdf["_vec"].tolist(), dtype=np.float64)
            codes = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                sub = X[:, s * dsub : (s + 1) * dsub]
                # (n, k) distances to this sub-space's centroids
                d = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {"item_id": pdf["_id"], "codes": list(codes.tolist())}
            )

    src = corpus.select(F.col(item_id).alias("_id"), F.col(item_vec).alias("_vec"))
    id_type = dict(corpus.dtypes)[item_id]
    return src.mapInPandas(encode, schema=f"item_id {id_type}, codes array<int>")


def pq_search(
    queries: DataFrame,
    encoded: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """ADC search over PQ codes: per (query, batch) one LUT gather+sum.
    Returns (query_id, rank, item_id, adc_dist) — approximate distances;
    re-rank the short-list with exact_knn for production recall."""
    spark = queries.sparkSession
    m, kcent, dsub = codebooks.shape
    qrows = queries.select(
        F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qv")
    ).collect()
    qids = np.array([r._qid for r in qrows])
    Q = np.array([r._qv for r in qrows], dtype=np.float64)
    # LUT[q, s, c] = ||q_sub(s) - centroid(s, c)||^2  (exact, tiny)
    luts = np.empty((len(qids), m, kcent), dtype=np.float64)
    for s in range(m):
        qsub = Q[:, s * dsub : (s + 1) * dsub]
        luts[:, s, :] = ((qsub[:, None, :] - codebooks[s][None, :, :]) ** 2).sum(
            axis=2
        )
    b_luts = spark.sparkContext.broadcast(luts)
    b_qids = spark.sparkContext.broadcast(qids)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        L, Qi = b_luts.value, b_qids.value
        sub_idx = np.arange(m)
        for pdf in batches:
            C = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            ids = pdf["item_id"].to_numpy()
            # D[q, n] = sum_s L[q, s, C[n, s]]
            D = L[:, sub_idx, C].sum(axis=2)  # (nq, n)
            kk = min(k, D.shape[1])
            part = np.argpartition(D, kk - 1, axis=1)[:, :kk]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(Qi, kk),
                    "item_id": ids[part].ravel(),
                    "adc_dist": np.sqrt(np.take_along_axis(D, part, axis=1)).ravel(),
                }
            )

    qid_t = dict(queries.dtypes)[query_id]
    iid_t = dict(encoded.dtypes)["item_id"]
    partial = encoded.mapInPandas(
        scan, schema=f"query_id {qid_t}, item_id {iid_t}, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("item_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "adc_dist")
    )


def pq_search_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    encoded: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    shortlist: int = 100,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    item_id: str = "item_id",
    item_vec: str = "embedding",
) -> DataFrame:
    """Production PQ pattern: ADC short-list over codes (compressed scan),
    then exact re-rank of only the short-listed vectors. Recall equals the
    short-list's coverage of the true top-k; the exact scan touches
    shortlist/n of the corpus."""
    from ..functions.vector import l2_dist

    cand = pq_search(
        queries, encoded, codebooks, k=shortlist, query_id=query_id, query_vec=query_vec
    ).select("query_id", "item_id")
    qv = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qvec")
    )
    vecs = corpus.select(F.col(item_id).alias("item_id"), F.col(item_vec).alias("_cvec"))
    scored = (
        cand.join(vecs, "item_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "item_id", l2_dist(F.col("_qvec"), F.col("_cvec")).alias("dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "dist")
    )
