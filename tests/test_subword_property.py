"""Property test for the greedy subword tokenizer
(queries/textops.py::subword_tokenize_counts).

The maximal-munch walk (aggregate HOF over a per-word pos→token map) and
the vocab-selection tie-breaks are the kind of logic where an off-by-one
in prefix length or a wrong tie order silently shifts token boundaries.
Hypothesis draws corpora from a 2-letter alphabet (maximal n-gram
collision — many grams tie on weighted count, so the (cnt desc, gram asc)
tie-break is under constant stress) and asserts the Spark query equals the
pure-Python reference of the same algorithm end-to-end, including the
vocab derivation.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# 4-letter alphabet: up to 16+64+256 = 336 distinct grams of length 2-4,
# so the top-200 vocab cutoff (and its (cnt desc, gram asc) tie-break)
# actually BINDS on larger draws — with 2 letters it never would
_word = st.text(alphabet="abcd", min_size=1, max_size=10)
_doc = st.lists(_word, min_size=1, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
@pytest.mark.slow
def test_subword_tokenize_equals_python_reference(spark, texts):
    from tests.test_pipeline_ops import TestSubwordTokenize
    from vectordb_acc_and_speed_exp_spark.queries.textops import (
        subword_tokenize_counts,
    )

    with tempfile.TemporaryDirectory(prefix="subword_prop_") as root:
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        df.coalesce(1).write.parquet(os.path.join(root, "documents.parquet"))
        got = [
            (r.token, r.cnt)
            for r in subword_tokenize_counts(spark, root).collect()
        ]
        assert got == TestSubwordTokenize._python_reference(texts)


def test_subword_vocab_cutoff_binds(spark):
    """Deterministic pin for the top-200 vocab boundary: all 256 words of
    length 4 over {a,b,c,d} yield 336 distinct multi-char grams with heavy
    count ties, so the limit(200) cutoff and its (cnt desc, gram asc)
    tie-break decide which grams tokenize — a wrong tie order shifts token
    boundaries and fails the reference comparison."""
    import itertools

    from tests.test_pipeline_ops import TestSubwordTokenize
    from vectordb_acc_and_speed_exp_spark.queries.textops import (
        subword_tokenize_counts,
    )

    words = ["".join(p) for p in itertools.product("abcd", repeat=4)]
    texts = [" ".join(words[i : i + 16]) for i in range(0, 256, 16)]
    # sanity: the cutoff really binds
    grams = set()
    for w in words:
        for i in range(4):
            for L in (2, 3, 4):
                if i + L <= 4:
                    grams.add(w[i : i + L])
    assert len(grams) > 200

    with tempfile.TemporaryDirectory(prefix="subword_cutoff_") as root:
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        ).coalesce(1).write.parquet(os.path.join(root, "documents.parquet"))
        got = [
            (r.token, r.cnt)
            for r in subword_tokenize_counts(spark, root).collect()
        ]
        assert got == TestSubwordTokenize._python_reference(texts)
