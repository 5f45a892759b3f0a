"""Property test for the PPJoin prefix/positional/length bound arithmetic
(operators/dedup.py::prefix_jaccard_join).

The integer-exact bounds ((num + den - 1) div den ceilings) are exactly the
kind of code where an off-by-one silently DROPS qualifying pairs — but only
at boundary set sizes where t·|X| lands on an integer.  Hypothesis draws
word-soup corpora from a tiny vocabulary (high overlap, every pair is a
near-candidate) with document lengths covering both the generic and the
boundary sizes, across thresholds whose rationals hit integer boundaries
often (1/4, 1/3, 1/2, 3/5, 3/4), and asserts the prefix-filtered join's
pair set equals the brute-force shingle-set join computed in plain Python.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

VOCAB = [f"w{i}" for i in range(10)]

# docs: 1..24 words from a 10-word vocab; small vocab => shingle sets
# collide constantly, so the prefix index is under maximal stress (the
# adversarial near-uniform-df regime the operator docstring describes)
_doc = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=24)
_corpus = st.lists(_doc, min_size=2, max_size=8)
_threshold = st.sampled_from([0.25, 1.0 / 3.0, 0.5, 0.6, 0.75])


def _py_shingles(words: list[str]) -> frozenset[str]:
    """Replicates _shingle_table for our already-canonical vocab: 3-word
    space-joined shingles, set semantics, whole-doc shingle when < 3."""
    if len(words) < 3:
        return frozenset([" ".join(words)])
    return frozenset(
        " ".join(words[i : i + 3]) for i in range(len(words) - 2)
    )


def _py_brute_force(docs: list[list[str]], threshold: float):
    """(id_a, id_b, jaccard_r) for all qualifying pairs — same arithmetic
    as _attach_jaccard: IEEE-double jaccard, filter on the UNROUNDED value,
    emit HALF_UP 4-dp (Spark's F.round; Python round() is banker's)."""
    sh = {f"d{i:02d}": _py_shingles(w) for i, w in enumerate(docs)}
    out = set()
    for a in sh:
        for b in sh:
            if a >= b:
                continue
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = inter * 1.0 / (len(sh[a]) + len(sh[b]) - inter)
            if j >= threshold:
                jr = float(
                    Decimal(j).quantize(Decimal("0.0001"), ROUND_HALF_UP)
                )
                out.add((a, b, jr))
    return out


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_corpus, threshold=_threshold)
def test_prefix_join_equals_brute_force(spark, docs, threshold):
    from vectordb_acc_and_speed_exp_spark.operators.dedup import (
        prefix_jaccard_join,
    )

    df = spark.createDataFrame(
        [(f"d{i:02d}", " ".join(w)) for i, w in enumerate(docs)],
        "doc_id string, text string",
    )
    got = {
        (r.id_a, r.id_b, r.jaccard_r)
        for r in prefix_jaccard_join(
            df, "doc_id", "text", threshold=threshold
        ).collect()
    }
    assert got == _py_brute_force(docs, threshold)


def test_prefix_join_ceil_boundary_sizes(spark):
    """Deterministic regression pins: pairs engineered so t·|X| is exactly
    integral on both sides — the sizes where a float ceil overshoots and a
    broken integer ceil would drop the pair."""
    # threshold 0.5, both docs 8 shingles (10 words), intersection 6:
    # J = 6/10 >= 0.5; prefix length = 8 - ceil(4) + 1 = 5
    a = [f"w{i}" for i in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]]
    b = [f"w{i}" for i in [0, 1, 2, 3, 4, 5, 6, 7, 8, 5]]
    # threshold 1/3 with sizes 3 and 6 (t*sz integral at 1 and 2)
    c = ["w0", "w1", "w2", "w3", "w4"]  # 3 shingles
    d = ["w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7"]  # 6 shingles
    docs = [a, b, c, d]
    for t in (0.5, 1.0 / 3.0):
        df = spark.createDataFrame(
            [(f"d{i:02d}", " ".join(w)) for i, w in enumerate(docs)],
            "doc_id string, text string",
        )
        from vectordb_acc_and_speed_exp_spark.operators.dedup import (
            prefix_jaccard_join,
        )

        got = {
            (r.id_a, r.id_b, r.jaccard_r)
            for r in prefix_jaccard_join(
                df, "doc_id", "text", threshold=t
            ).collect()
        }
        assert got == _py_brute_force(docs, t)
