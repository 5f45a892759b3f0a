"""Text-analysis column expressions (SURVEY.md §2.6 X1-X6 + north-star text
analysis: token counting, quality ratios, shingling).

Everything here is built-in ``pyspark.sql.functions`` (JVM-side, codegen):
regex patterns are kept to the common subset of Java regex and RE2 so the
same logic is expressible in the DuckDB oracle. The reference's only text
ops are strip/concat/split (create_collections.py:42,155; download_arxiv.py:56);
the analysis operators extend that surface for LLM-pipeline workloads.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace-delimited tokenization. `trim` first so leading/trailing blanks
# don't create empty tokens; empty text maps to an empty array, not [''].
_WS = r"\s+"


def tokens(text: Column) -> Column:
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, _WS)
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def norm_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.lower(F.regexp_replace(F.trim(text), _WS, " "))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(text, "[A-Za-z0-9 ]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / F.length(text).cast("double")
    )


def word_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """n-word shingles from an already-materialized token array column.

    For each start offset i in [0, len-n], join tokens[i:i+n] with a space.
    Documents shorter than n tokens produce a single shingle of all tokens
    so every non-empty document has at least one shingle.

    ``toks`` MUST be a resolved column, not an inline tokenization
    expression: Catalyst does not common-subexpression-eliminate inside
    higher-order-function lambdas, so an inline ``split(regexp_replace(...))``
    here re-tokenizes once *per shingle* (measured: 9.4 s → 1 s at sf0.1
    for the shingle table when materialized first).
    """
    nshingles = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), nshingles - 1)
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles of the normalized token stream (convenience form —
    see word_shingles_from_tokens for the hot-path variant and why)."""
    return word_shingles_from_tokens(tokens(norm_text(text)), n)


# A 10M-token document is one parquet row: Spark cannot split a row's
# explode output across tasks, so whichever task holds the monster does
# the whole doc's token/shingle work alone — THE straggler of the
# tokenize-heavy family under length skew (postings build,
# duplicated_ngram_spans, subword_tokenize_counts). 128k tokens per chunk
# keeps any one task's share of a skewed doc bounded while normal corpora
# (every test/bench fixture) stay single-chunk on the zero-shuffle path.
SKEW_CHUNK_TOKENS = 131_072


def chunked_token_stream(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = SKEW_CHUNK_TOKENS,
    overlap: int = 0,
    long_docs_possible: bool | None = None,
):
    """(doc_id, toks) with every row's token array bounded by
    chunk + overlap — the skew-bounded form of "tokenize then explode".

    Documents at or under ``chunk`` tokens pass through untouched (no
    shuffle, no extra explode — the common case costs one size()
    comparison). Longer documents are sliced into chunk-sized pieces and
    REDISTRIBUTED (repartition on (doc_id, chunk_idx)) before any
    per-token work, so a 10M-token doc becomes ~76 tasks' worth of
    bounded slices instead of one straggler. The chunks of one doc
    concatenate to exactly the original token array, so every multiset
    aggregate (tf, dl, word counts) is unchanged.

    ``overlap = n - 1`` preserves n-gram/shingle multisets: slice i
    carries the next n-1 tokens too, so the shingle starts of slice i are
    exactly the global starts [i*chunk + 1, (i+1)*chunk]; tail slices too
    short to hold a full n-gram start are dropped (their starts belong to
    the previous slice). Single-chunk documents keep
    word_shingles_from_tokens' shorter-than-n fallback semantics — a
    multi-chunk document is by construction longer than any n.

    ``long_docs_possible=False`` is a caller-supplied guarantee that no
    document can exceed ``chunk`` tokens (e.g. a memoized
    max(length(text)) over the corpus version — queries/textops.py::
    _corpus_long_docs): the stream then returns the plain single-scan
    tokenize — identical rows, but without the two-branch union, whose
    second source scan doubles the text IO of every query embedding this
    stream (and costs ~0.3 s of extra stages at sf0.1 even with zero
    long docs). None (default) keeps the defensive two-branch shape;
    True behaves like None."""
    if long_docs_possible is False:
        return docs.select(
            F.col(id_col).alias("doc_id"),
            tokens(norm_text(F.col(text_col))).alias("toks"),
        )
    # The small/big split must not cost a second tokenize pass: filtering
    # on size(tokens(...)) from a shared select re-evaluates the
    # tokenize for EVERY row on BOTH sides of the union (two scans of
    # the source per action). Instead pre-split on the raw CHAR length —
    # n whitespace tokens need at least 2n-1 characters, so a doc of
    # <= 2*chunk - 1 chars can never exceed chunk tokens and skips the
    # size check entirely; only the rare over-length candidates pay the
    # tokenize-twice size filter.
    guard = 2 * chunk - 1
    short = docs.filter(F.length(F.col(text_col)) <= guard).select(
        F.col(id_col).alias("doc_id"),
        tokens(norm_text(F.col(text_col))).alias("toks"),
    )
    cand = docs.filter(F.length(F.col(text_col)) > guard).select(
        F.col(id_col).alias("doc_id"),
        tokens(norm_text(F.col(text_col))).alias("_toks"),
    )
    small = cand.filter(F.size("_toks") <= chunk).select(
        "doc_id", F.col("_toks").alias("toks")
    )
    small = short.unionByName(small)
    big = cand.filter(F.size("_toks") > chunk)
    slices = (
        f"transform(sequence(0, CAST(ceil(size(_toks) / {chunk}.0) AS INT) - 1), "
        f"i -> slice(_toks, i * {chunk} + 1, {chunk + overlap}))"
    )
    # EXPLICIT-count round-robin repartition, not repartition(cols): a
    # column repartition without a count is an AQE coalesce target — with
    # few/small chunks AQE merges the shuffle back into one partition and
    # the monster doc re-concentrates (observed in tests). A user-specified
    # count is never coalesced, and round-robin spreads chunks evenly
    # regardless of how their keys would hash.
    sess = docs.sparkSession
    try:
        n_parts = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_parts = sess.sparkContext.defaultParallelism
    spread = (
        big.select("doc_id", F.posexplode(F.expr(slices)).alias("_ci", "toks"))
        .repartition(n_parts)
        .select("doc_id", "toks")
    )
    if overlap:
        # a tail slice of <= overlap tokens holds no full n-gram start
        spread = spread.filter(F.size("toks") > overlap)
    return small.unionByName(spread)


def ngram_shingles(text: Column, n: int = 5) -> Column:
    """Character n-gram shingles over the normalized text (dedup features)."""
    t = norm_text(text)
    nshingles = F.greatest(F.length(t) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), nshingles)
    return F.transform(idx, lambda i: t.substr(i, F.lit(n)))
