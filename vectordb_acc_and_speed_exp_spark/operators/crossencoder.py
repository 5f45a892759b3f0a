"""Cross-encoder re-ranking — the last stage of a production retrieval
stack (retrieve top-N cheaply → re-score (query, doc) PAIRS with a full
model → keep top-k).

Unlike the bi-encoder (operators/embedding.py) a cross-encoder reads the
query and document TOGETHER, so it cannot be precomputed into an index;
its cost is per-pair, which is why it only ever sees a short-list. That
shape is Spark-friendly: candidates are (query_id, item_id) pairs joined
to their texts, the scorer is an Iterator pandas_udf (model loaded once
per worker, amortized over Arrow batches), and queries parallelize across
the cluster — per-query work is |short-list| model calls, never corpus
work.

Model gating mirrors embedding.py exactly: ``model_path`` selects a real
``sentence_transformers.CrossEncoder`` when importable; otherwise a
deterministic lexical-overlap fake (token-set Jaccard × a log-length
prior) stands in — honest test plumbing with the real distributed shape,
swap point clearly marked.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf


def fake_pair_score(query: str, doc: str) -> float:
    """Deterministic stand-in relevance: token-set Jaccard × log-length
    prior. Pure function of the pair; identical text scores highest.

    Tokenization is ASCII-whitespace (re.ASCII), matching the DuckDB
    oracle's string_split_regex '\\s+' — Python's unicode-aware
    str.split() would split NBSP-class characters the oracle keeps."""
    import re

    q = set(re.split(r"\s+", (query or "").lower(), flags=re.ASCII)) - {""}
    d = set(re.split(r"\s+", (doc or "").lower(), flags=re.ASCII)) - {""}
    if not q or not d:
        return 0.0
    j = len(q & d) / len(q | d)
    return j * math.log1p(min(len(d), 256))


def make_pair_score_iter(model_path: str | None = None):
    """Raw ``Iterator[(qs, ds)] -> Iterator[scores]`` generator, separated
    from the udf wrapper so the real-model branch (load-once, batch
    predict, per-item fallback) is unit-testable with an injected mock
    ``sentence_transformers`` module."""

    def score_iter(
        batches: Iterator[tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        model = None
        if model_path is not None:
            try:
                from sentence_transformers import CrossEncoder

                model = CrossEncoder(model_path)  # once per worker
            except ImportError:
                model = None
        for qs, ds in batches:
            if model is not None:
                try:
                    scores = [
                        float(s)
                        for s in model.predict(
                            list(zip(qs.fillna("").tolist(), ds.fillna("").tolist()))
                        )
                    ]
                except Exception:
                    scores = []
                    for q, d in zip(qs.fillna(""), ds.fillna("")):
                        try:
                            scores.append(float(model.predict([(q, d)])[0]))
                        except Exception:
                            scores.append(0.0)
            else:
                scores = [
                    fake_pair_score(q, d)
                    for q, d in zip(qs.fillna(""), ds.fillna(""))
                ]
            yield pd.Series(scores)

    return score_iter


def cross_encoder_rerank(
    candidates: DataFrame,
    k: int = 10,
    model_path: str | None = None,
    query_id: str = "query_id",
    query_text: str = "query_text",
    item_id: str = "item_id",
    doc_text: str = "doc_text",
) -> DataFrame:
    """Re-rank a candidate short-list by pair score. ``candidates`` carries
    (query_id, query_text, item_id, doc_text) — build it by joining a
    retriever's top-N ids to the document texts. Returns (query_id,
    ce_rank, item_id, ce_score) with rank 1..k by (score desc, item_id).
    Scores are emitted as exact floats of a pure per-pair function, so
    ranking is shuffle-order-independent."""
    scorer = pandas_udf(make_pair_score_iter(model_path), returnType="double")
    scored = candidates.select(
        F.col(query_id).alias("query_id"),
        F.col(item_id).alias("item_id"),
        scorer(F.col(query_text), F.col(doc_text)).alias("ce_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("ce_score"), F.asc("item_id")
    )
    return (
        scored.withColumn("ce_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("ce_rank") <= k)
        .select("query_id", "ce_rank", "item_id", "ce_score")
    )
