"""Length-skew stress for the tokenize-heavy family (VERDICT r06 #5).

One monster document is one parquet row, and Spark cannot split a row's
explode output across tasks — chunked_token_stream (functions/text.py) is
the mitigation: slice long docs' token arrays and REDISTRIBUTE the slices
before any per-token work. These tests pin (a) exact multiset preservation
for tokens AND n-gram shingles (the bit-equality the oracles rely on), and
(b) the skew bound itself: no task holds more than a bounded share of the
monster doc after redistribution."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from vectordb_acc_and_speed_exp_spark.functions.text import (
    chunked_token_stream,
    norm_text,
    tokens,
    word_shingles_from_tokens,
)

N_LONG = 50_000  # tokens in the skewed doc (unit-test scale)
CHUNK = 1_000


def _zipf_words(n: int, seed: int = 7) -> str:
    """Zipf-ish term skew: rank-r word with weight 1/r over a 2k vocab."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(1, 2001)]
    weights = [1.0 / r for r in range(1, 2001)]
    return " ".join(rng.choices(vocab, weights=weights, k=n))


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [(0, _zipf_words(N_LONG))]
    rows += [(i, _zipf_words(40, seed=i)) for i in range(1, 51)]
    rows += [(98, ""), (99, "tiny doc")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_token_multiset_preserved(spark, skewed):
    plain = skewed.select(
        "doc_id", F.explode(tokens(norm_text(F.col("text")))).alias("term")
    )
    chunked = chunked_token_stream(skewed, chunk=CHUNK).select(
        "doc_id", F.explode("toks").alias("term")
    )
    assert _rows(plain) == _rows(chunked)


def test_shingle_multiset_preserved(spark, skewed):
    """overlap = n-1 must reproduce the 8-gram multiset exactly, including
    the shorter-than-n fallback doc and the monster doc's slice seams.

    The plain path materializes toks in a projection first — passing the
    inline tokenize expression into the shingle HOF re-tokenizes once per
    shingle (the O(T^2) trap word_shingles_from_tokens' docstring warns
    about; measured: the monster doc alone runs for minutes inline)."""
    nonempty = skewed.filter(F.length(F.trim("text")) > 0)
    plain = nonempty.select(
        "doc_id", tokens(norm_text(F.col("text"))).alias("toks")
    ).select(
        "doc_id",
        F.explode(word_shingles_from_tokens(F.col("toks"), 8)).alias("sh"),
    )
    chunked = chunked_token_stream(nonempty, chunk=CHUNK, overlap=7).select(
        "doc_id",
        F.explode(word_shingles_from_tokens(F.col("toks"), 8)).alias("sh"),
    )
    assert _rows(plain) == _rows(chunked)


def test_partition_rows_bounded(spark, skewed):
    """The skew bound: after redistribution no task holds more than a
    bounded share of the monster doc's tokens; the naive explode holds
    ALL of them in one task."""
    naive = skewed.select(
        "doc_id", F.explode(tokens(norm_text(F.col("text")))).alias("term")
    )
    naive_max = (
        naive.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert naive_max >= N_LONG  # the straggler this module exists to kill

    spread = chunked_token_stream(skewed, chunk=CHUNK).select(
        "doc_id", F.explode("toks").alias("term")
    )
    spread_max = (
        spread.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    # 50 chunks hash over the shuffle partitions; even a lopsided draw
    # stays far below the single-task monster
    assert spread_max < N_LONG / 3
    assert spread_max >= CHUNK  # sanity: chunks actually carry the tokens


def test_postings_build_on_skewed_corpus_matches_inline(spark, skewed, tmp_path):
    """End-to-end through the REAL postings build (tokenize routes long
    docs through chunked_token_stream): the artifact must serve BM25
    bit-identical to inline scoring over the skewed corpus, and the
    monster doc must genuinely exceed the chunk threshold somewhere in
    the pipeline (guarded via a low chunk monkey-default is NOT used —
    instead the invariant is multiset equality, proven above at low
    chunk; here the artifact contract is re-proven on the skewed corpus)."""
    from vectordb_acc_and_speed_exp_spark.operators.bm25 import (
        bm25_scores,
        bm25_scores_indexed,
    )
    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        write_postings_index,
    )

    path = str(tmp_path / "skew_idx")
    write_postings_index(skewed, path)
    q = spark.createDataFrame(
        [(0, "w1"), (0, "w2"), (1, "w37"), (1, "tiny"), (2, "w1999")],
        "query_id long, term string",
    )
    assert _rows(bm25_scores_indexed(spark, path, q)) == _rows(
        bm25_scores(skewed, q)
    )


def test_long_docs_possible_false_is_plain_single_scan(spark, skewed):
    """The memoized fast path: a caller-guaranteed no-long-docs corpus
    gets the plain single-scan tokenize — identical rows to the
    defensive two-branch shape, and exactly ONE scan of the source in
    the physical plan (the two-branch union scans it twice)."""
    short_only = skewed.filter(F.col("doc_id") > 0)  # drop the monster
    fast = chunked_token_stream(
        short_only, chunk=CHUNK, long_docs_possible=False
    )
    defensive = chunked_token_stream(short_only, chunk=CHUNK)
    got = _rows(fast.select("doc_id", F.explode("toks").alias("t")))
    want = _rows(defensive.select("doc_id", F.explode("toks").alias("t")))
    assert got == want
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_corpus_long_docs_memoizes_per_fingerprint(spark, tmp_path):
    """_corpus_long_docs computes max(length(text)) once per corpus
    version: the memo file short-circuits the second call, and a corpus
    rewrite (new fingerprint) invalidates it."""
    import json
    import os

    from vectordb_acc_and_speed_exp_spark.queries.pipeline import _index_root
    from vectordb_acc_and_speed_exp_spark.queries.textops import (
        _corpus_long_docs,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [(1, "short doc")], "doc_id long, text string"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    assert _corpus_long_docs(spark, sf) is False
    memo = os.path.join(_index_root(sf), "text_maxlen.json")
    assert json.load(open(memo))["long"] is False
    # poison the memo: if it is honored, the cached value comes back
    j = json.load(open(memo))
    j["long"] = True
    json.dump(j, open(memo, "w"))
    assert _corpus_long_docs(spark, sf) is True
    # rewrite the corpus with a monster doc: fingerprint changes, memo
    # recomputes honestly
    from vectordb_acc_and_speed_exp_spark.functions.text import (
        SKEW_CHUNK_TOKENS,
    )

    spark.createDataFrame(
        [(1, "x " * (2 * SKEW_CHUNK_TOKENS))], "doc_id long, text string"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    assert _corpus_long_docs(spark, sf) is True
    assert json.load(open(memo))["long"] is True
