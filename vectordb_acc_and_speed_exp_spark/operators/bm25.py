"""Okapi BM25 as a reusable operator (the lexical retrieval channel).

Generalizes queries/retrieval.py's fixed-query-set formulation to an
arbitrary (query_id, term) frame, so the VectorStore facade can serve
user-supplied text queries hybrid (BM25 ⊕ dense RRF) the way production
vector stores do (Weaviate/Qdrant/Elasticsearch hybrid search).

Scale contract (same as the oracled query): only query-term postings pass
the corpus scan — the term filter is a literal ``isin`` (query vocabulary
is user-input-sized, collected once on the driver by design), pushed below
the tf aggregate; dl/avgdl are one narrow groupBy; contributions sum on an
exact 1e6 integer grid so shuffle order cannot change a bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import norm_text, tokens


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    weight_col: str | None = None,
) -> DataFrame:
    """(query_id, doc_id, s6): BM25 score × 1e6 as an exact bigint, for
    every (query, doc) sharing at least one term. ``queries`` is a
    (query_id, term) frame — terms should be pre-normalized (lowercase).

    ``weight_col`` names an optional bigint column on ``queries`` holding a
    per-(query, term) weight on the 1e6 grid (1_000_000 = 1.0): each term's
    contribution becomes ``(c6 * w6) div 1e6`` — integer floor division, so
    weighted sums stay exact and order-free (the RM3 expansion hook)."""
    qt = _qt(queries, query_id, term_col, weight_col)
    terms = sorted({r.term for r in qt.select("term").distinct().collect()})
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(norm_text(F.col(text_col)))).alias("term"),
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    tf_dl = tf.join(dl, "doc_id")
    return _contrib_scores(
        tf_dl, qt, dft, stats, k1, b, weighted=weight_col is not None
    )


def _qt(queries: DataFrame, query_id: str, term_col: str, weight_col) -> DataFrame:
    qcols = [
        F.col(query_id).alias("query_id"), F.col(term_col).alias("term")
    ]
    if weight_col is not None:
        qcols.append(F.col(weight_col).cast("bigint").alias("_w6"))
    return queries.select(*qcols)


def _contrib_scores(
    tf_dl: DataFrame,
    qt: DataFrame,
    dft: DataFrame,
    stats: DataFrame,
    k1: float,
    b: float,
    weighted: bool,
) -> DataFrame:
    """The BM25 scoring core, shared bit-for-bit between the inline
    tokenize path (``bm25_scores``) and the postings-artifact path
    (``bm25_scores_indexed``): tf_dl = (term, doc_id, tf, dl) restricted
    to query terms, dft = (term, df), stats = 1-row (n_docs, avgdl)."""
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfnorm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    base_c6 = F.round(idf * tfnorm * 1_000_000).cast("bigint")
    c6 = (
        F.expr("(_base_c6 * _w6) div 1000000")
        if weighted
        else F.col("_base_c6")
    )
    contrib = (
        tf_dl.join(F.broadcast(qt), "term")
        .join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_base_c6", base_c6)
        .select("query_id", "doc_id", c6.alias("c6"))
    )
    return contrib.groupBy("query_id", "doc_id").agg(F.sum("c6").alias("s6"))


def bm25_scores_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    query_id: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    weight_col: str | None = None,
) -> DataFrame:
    """``bm25_scores`` served from a materialized postings artifact
    (operators/postings.py) instead of tokenizing the corpus: the scan
    prunes to the query terms' buckets, dl rides denormalized on the
    posting rows, df/stats come from the vocab-sized side tables. Scores
    are bit-identical to the inline path (same integers in, same double
    expressions) — hash-proven in tests and by the oracle gate."""
    from .postings import corpus_stats, query_term_postings, term_df

    qt = _qt(queries, query_id, term_col, weight_col)
    terms = sorted({r.term for r in qt.select("term").distinct().collect()})
    tf_dl = query_term_postings(spark, index_path, terms)
    dft = term_df(spark, index_path, terms)
    stats = corpus_stats(spark, index_path)
    return _contrib_scores(
        tf_dl, qt, dft, stats, k1, b, weighted=weight_col is not None
    )


def bm25_scores_indexed_filtered(
    spark,
    index_path: str,
    queries: DataFrame,
    survivors: DataFrame,
    query_id: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    weight_col: str | None = None,
) -> DataFrame:
    """Metadata-filtered BM25 from the postings artifact: every statistic
    (tf/dl rows, df, n_docs, avgdl) is restricted to the surviving doc
    set, so scores are bit-identical to
    ``bm25_scores(corpus.filter(pred), ...)`` — the inline filtered path
    — while the plan reads only the query terms' pruned posting buckets
    plus the O(docs) doclens sidecar (never corpus text).

    ``survivors``: a (doc_id) frame, the eligible set after the caller
    evaluated the predicate over the collection's metadata columns.

    df is re-derived from the survivor-restricted posting rows with the
    inline derivation (rows per term); n_docs/avgdl come from
    postings.filtered_corpus_stats — same integers, same expressions,
    same bits (VERDICT r07 #2: the last corpus-sized serve scan reachable
    from the facade)."""
    from .postings import filtered_corpus_stats, query_term_postings

    qt = _qt(queries, query_id, term_col, weight_col)
    terms = sorted({r.term for r in qt.select("term").distinct().collect()})
    sv = survivors.select("doc_id")
    tf_dl = query_term_postings(spark, index_path, terms).join(
        sv, "doc_id", "left_semi"
    )
    dft = tf_dl.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = filtered_corpus_stats(spark, index_path, sv)
    return _contrib_scores(
        tf_dl, qt, dft, stats, k1, b, weighted=weight_col is not None
    )


def bm25_topk_indexed_filtered(
    spark,
    index_path: str,
    queries: DataFrame,
    survivors: DataFrame,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k over ``bm25_scores_indexed_filtered`` — same ranking window
    as the other bm25_topk variants."""
    return _topk_by_score(
        bm25_scores_indexed_filtered(spark, index_path, queries, survivors, **kwargs),
        k,
    )


def _topk_by_score(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("s6"), F.asc("doc_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= k)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """(query_id, rank, doc_id, s6) — BM25 top-k per query, rank 1..k by
    (score desc, doc_id)."""
    return _topk_by_score(bm25_scores(docs, queries, **kwargs), k)


def bm25_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """``bm25_topk`` served from a materialized postings artifact — same
    ranking window over ``bm25_scores_indexed``, so results are
    bit-identical to the inline path at a bucket-pruned scan's cost (the
    VectorStore facade's hybrid channel)."""
    return _topk_by_score(bm25_scores_indexed(spark, index_path, queries, **kwargs), k)


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of two (query_id, rank, <id>) rank lists:
    score = Σ 1/(rrf_k + rank) over the channels a doc appears in. Exact
    IEEE divisions, deterministic (doc-id tie-break)."""
    ra = a.select("query_id", F.col(id_col), F.col("rank").alias("_ra"))
    rb = b.select("query_id", F.col(id_col), F.col("rank").alias("_rb"))
    fused = ra.join(rb, ["query_id", id_col], "full_outer").select(
        "query_id",
        id_col,
        (
            F.coalesce(1.0 / (rrf_k + F.col("_ra")), F.lit(0.0))
            + F.coalesce(1.0 / (rrf_k + F.col("_rb")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc(id_col))
    return fused.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= k)
