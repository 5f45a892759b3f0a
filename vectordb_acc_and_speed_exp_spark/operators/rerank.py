"""Diversity re-ranking: Maximal Marginal Relevance (MMR) over a top-N
candidate short-list.

MMR (Carbonell & Goldstein 1998) greedily picks
``argmax_d  λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)``
trading query relevance against redundancy with the already-selected set S.
Every vector store exposes it (e.g. as a search_type) because plain top-k
returns near-duplicate neighbourhoods.

Spark shape: the candidate set is tiny (N ≤ ~100 per query) but the greedy
loop is inherently sequential per query — the classic "custom operator
Spark lacks". It runs as ``applyInPandas`` grouped by query_id: each group
is one small numpy problem, queries parallelize across the cluster, and no
corpus-sized data ever reaches the driver. Determinism: ties broken by
item_id, float math in float64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    query_vectors: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    query_id: str = "query_id",
    item_id: str = "item_id",
    item_vec: str = "embedding",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Greedy MMR selection of k items per query from a candidate list.

    candidates: (query_id, item_id) — a top-N short-list (any retriever).
    vectors:    (item_id, embedding) — to compute item-item redundancy.
    query_vectors: (query_id, query_vec).
    Returns (query_id, mmr_rank, item_id, mmr_score) with mmr_rank 1..k in
    selection order; mmr_score is the marginal score at selection time
    (cosine; first pick's score is λ·sim(q,d))."""
    qv = query_vectors.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv")
    )
    cand = (
        candidates.select(F.col(query_id).alias("query_id"), F.col(item_id).alias("item_id"))
        .join(
            vectors.select(F.col(item_id).alias("item_id"), F.col(item_vec).alias("_iv")),
            "item_id",
        )
        .join(F.broadcast(qv), "query_id")
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort for determinism regardless of arrival order
        pdf = pdf.sort_values("item_id").reset_index(drop=True)
        X = np.array(pdf["_iv"].tolist(), dtype=np.float64)
        q = np.array(pdf["_qv"].iloc[0], dtype=np.float64)
        ids = pdf["item_id"].to_numpy()
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        qn = q / max(np.linalg.norm(q), 1e-12)
        rel = Xn @ qn  # cosine(q, d)
        n = len(ids)
        kk = min(k, n)
        selected: list[int] = []
        red = np.full(n, -np.inf)  # max sim to selected set
        out_rank, out_id, out_score = [], [], []
        for rank in range(1, kk + 1):
            if selected:
                score = lam * rel - (1.0 - lam) * red
            else:
                score = lam * rel
            score[selected] = -np.inf
            # argmax with lowest-item_id tie-break: ids are sorted, so the
            # first maximal position wins
            best = int(np.argmax(score))
            selected.append(best)
            out_rank.append(rank)
            out_id.append(ids[best])
            out_score.append(float(score[best]))
            sims = Xn @ Xn[best]
            red = np.maximum(red, sims) if rank > 1 else sims.copy()
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "mmr_rank": np.array(out_rank, dtype=np.int64),
                "item_id": out_id,
                "mmr_score": out_score,
            }
        )

    qid_t = dict(candidates.dtypes)[query_id]
    iid_t = dict(candidates.dtypes)[item_id]
    return cand.groupBy("query_id").applyInPandas(
        pick,
        schema=f"query_id {qid_t}, mmr_rank bigint, item_id {iid_t}, "
        "mmr_score double",
    )
