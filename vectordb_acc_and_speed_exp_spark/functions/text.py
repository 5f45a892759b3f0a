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


def ngram_shingles(text: Column, n: int = 5) -> Column:
    """Character n-gram shingles over the normalized text (dedup features)."""
    t = norm_text(text)
    nshingles = F.greatest(F.length(t) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), nshingles)
    return F.transform(idx, lambda i: t.substr(i, F.lit(n)))
