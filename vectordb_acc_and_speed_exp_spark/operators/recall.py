"""Recall@K evaluator (reference V5, chromadb_acc_experiment.py:539-564).

Reference definition, preserved exactly:
    recall@k = |set(gt[:k]) ∩ set(ret[:k])| / |set(gt[:k])|
with 0.0 when either truncated side is empty (ACC:551-552). Both inputs are
rank tables (query_id, rank, item_id) as produced by ``operators.knn`` /
``operators.ann``, so truncation to k is a rank filter and the set
intersection is a join — fully relational, no driver-side Python sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(ground_truth: DataFrame, retrieved: DataFrame, k: int) -> DataFrame:
    """Per-query recall@k. Inputs: (query_id, rank, item_id) tables.

    Returns (query_id, recall) with recall double in [0, 1]. Queries present
    in ground truth but absent from ``retrieved`` score 0.0 (left join).
    """
    gt = ground_truth.filter(F.col("rank") <= k).select("query_id", "item_id")
    ret = retrieved.filter(F.col("rank") <= k).select("query_id", "item_id")
    hits = (
        gt.alias("g")
        .join(
            ret.alias("r"),
            on=[
                F.col("g.query_id") == F.col("r.query_id"),
                F.col("g.item_id") == F.col("r.item_id"),
            ],
            how="left",
        )
        .groupBy(F.col("g.query_id").alias("query_id"))
        .agg(
            F.count(F.lit(1)).alias("n_gt"),
            F.count(F.col("r.item_id")).alias("n_hit"),
        )
    )
    return hits.select(
        "query_id",
        (F.col("n_hit").cast("double") / F.col("n_gt")).alias("recall"),
    )


def mean_recall(per_query: DataFrame) -> DataFrame:
    """Rollup across queries (reference A3 uses np.mean,
    chromadb_acc_experiment.py:648-653)."""
    return per_query.agg(F.avg("recall").alias("mean_recall"))
