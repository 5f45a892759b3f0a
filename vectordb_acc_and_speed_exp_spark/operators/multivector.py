"""Multi-vector (late-interaction / ColBERT-style) retrieval — MaxSim.

A document is represented by MANY vectors (one per token/chunk) instead of
one pooled vector, and relevance is the sum over query tokens of the best
match among the document's tokens:

    score(q, d) = Σ_{qt ∈ q}  max_{dt ∈ d}  cos(qt, dt)

This is the late-interaction operator of ColBERT / ColBERTv2 (PLAID), and
the `multivector` mode of production vector stores (Qdrant, Vespa, Milvus).
The reference study pools each page into one SBERT vector
(chromadb_acc_experiment.py:614-628); MaxSim is the [EXT] refinement that
keeps per-token geometry.

Spark-first shape:
- the query token set is tiny → **broadcast**; the doc-token scan computes
  cos(qt, dt) inside whole-stage codegen for each (query token, doc token)
  pair — shuffle-free map work;
- the plan then carries THREE exchanges, each over already-reduced data:
  (qid, qtok, doc_id) for the max (map-side partial max collapses the
  doc-token axis first, so the exchange payload is |q_tokens| rows per
  doc, not |q_tokens|·|doc_tokens|), (qid, doc_id) for the Σ, and (qid)
  for the final top-k window. Pre-partitioning on (qid, doc_id) would
  merge the first two but forces the UNREDUCED pair rows through the
  wire — strictly worse; the partial-agg-first plan is the one you want
  at scale.

Determinism contract: ``max`` is order-independent; the per-token maxima are
rounded onto the repo-wide exact 1e6 integer grid BEFORE the Σ, so the
final score is an exact BIGINT no matter how partitions combine — the whole
operator hash-matches a DuckDB replay (see the
``maxsim_multivector_topk`` gate entry).

At 100 TB: doc tokens dominate (N_docs × tokens/doc rows). The scan is
embarrassingly parallel; every exchange carries at most one row per
(query, doc, qtoken) — |q| × 32ish rows per doc, independent of doc token
count. For huge corpora compose with any ANN family as a first-stage
retriever (this operator then scores only the candidate set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_sim

GRID = 1_000_000


def maxsim_topk(
    query_tokens: DataFrame,
    doc_tokens: DataFrame,
    k: int = 10,
    qid: str = "qid",
    qtok: str = "qtok",
    qvec: str = "qv",
    doc_id: str = "doc_id",
    dvec: str = "ev",
) -> DataFrame:
    """Top-k docs per query under MaxSim late interaction.

    query_tokens: (qid, qtok, qvec) — multiple token vectors per query id
    (``qtok`` distinguishes the tokens; its values never appear in the
    output). doc_tokens needs only (doc_id, dvec) — the doc-token axis is
    collapsed by the max, so no doc-token identifier is required.
    Returns (qid, rank, doc_id, score_s6): score on the 1e6-scaled int grid
    (Σ of per-query-token max cosines, each rounded to the grid), rank 1..k
    by (score desc, doc_id).
    """
    q = query_tokens.select(
        F.col(qid).alias("qid"),
        F.col(qtok).alias("qtok"),
        F.col(qvec).alias("_qv"),
    )
    d = doc_tokens.select(
        F.col(doc_id).alias("doc_id"),
        F.col(dvec).alias("_dv"),
    )
    pair = d.crossJoin(F.broadcast(q)).select(
        "qid",
        "qtok",
        "doc_id",
        cosine_sim(F.col("_qv"), F.col("_dv")).alias("cos"),
    )
    best = pair.groupBy("qid", "qtok", "doc_id").agg(
        F.round(F.max("cos") * GRID).cast("bigint").alias("m")
    )
    score = best.groupBy("qid", "doc_id").agg(
        F.sum("m").cast("bigint").alias("score_s6")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score_s6"), F.asc("doc_id"))
    return (
        score.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score_s6")
    )
