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

_word = st.text(alphabet="ab", min_size=1, max_size=8)
_doc = st.lists(_word, min_size=1, max_size=6).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=5)


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
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
