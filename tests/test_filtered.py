"""EP8's filtered-search chooser (operators/filtered.py): the decision
boundary is pinned at both measured corpus sizes as a pure function, and
the executing operator is checked branch-by-branch against ground truth."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectordb_acc_and_speed_exp_spark.operators.filtered import (
    EXACT_CROSSOVER_N,
    PRUNE_WIN_FRAC,
    WIDEN_FACTOR,
    choose_filtered_strategy,
    filtered_knn_auto,
    plan_filtered_knn,
)


# --------------------------------------------------------------------------
# The decision boundary, pinned at the two EP8-measured corpus sizes.
# EP8_FILTERED.md table: at 100k every strategy is overhead-dominated and
# exact wins; at 1M/256 cells, 40 probes (15.6%) measured slower than the
# exact scan while 4 probes (1.6%) measured 2x faster — PRUNE_WIN_FRAC
# sits between.
# --------------------------------------------------------------------------
def test_chooser_100k_always_exact():
    # below the measured crossover, every selectivity routes exact
    for surv in (10_000, 1_000, 100):
        assert choose_filtered_strategy(100_000, surv, 64) == ("exact", None)


def test_chooser_1m_sel_01_exact_via_probe_budget():
    # s=0.1 -> widen to 40 of 256 probes = 15.6% of cells, above the
    # measured prune-win budget -> exact (EP8: 4.69 s vs exact 3.61 s)
    assert choose_filtered_strategy(1_000_000, 100_000, 256) == ("exact", None)


def test_chooser_1m_low_selectivity_exact():
    # s=0.01 / 0.001 -> widening caps at all cells -> exact
    assert choose_filtered_strategy(1_000_000, 10_000, 256) == ("exact", None)
    assert choose_filtered_strategy(1_000_000, 1_000, 256) == ("exact", None)


def test_chooser_1m_high_selectivity_ivf():
    # s=0.5 -> 8 of 256 probes = 3.1% of cells: pruning pays
    assert choose_filtered_strategy(1_000_000, 500_000, 256) == (
        "ivf_prefilter",
        8,
    )


def test_chooser_crossover_edge():
    # at the crossover itself: exact; just above it (same s=0.5): IVF
    assert choose_filtered_strategy(EXACT_CROSSOVER_N, 100_000, 256)[0] == "exact"
    strat, probes = choose_filtered_strategy(400_000, 200_000, 256)
    assert strat == "ivf_prefilter" and probes == 8


def test_chooser_probe_budget_edge():
    # exactly at prune_win_frac * n_cells the chooser must fall to exact
    n_cells = 256
    budget = int(PRUNE_WIN_FRAC * n_cells)  # 32
    # s such that ceil(4/s) == budget -> 4/32 = 0.125
    s = WIDEN_FACTOR / budget
    n = 1_000_000
    assert choose_filtered_strategy(n, int(n * s), n_cells) == ("exact", None)
    # one probe below the budget stays on the index
    s_under = WIDEN_FACTOR / (budget - 1)
    strat, probes = choose_filtered_strategy(n, int(n * s_under) + 1, n_cells)
    assert strat == "ivf_prefilter" and probes == budget - 1


def test_chooser_zero_survivors_and_k_coverage():
    assert choose_filtered_strategy(1_000_000, 0, 256) == ("exact", None)
    # k-coverage floor: survivors so sparse the widen dial alone would
    # under-probe is impossible here (widen caps first), but the floor must
    # never LOWER the probe count
    strat, probes = choose_filtered_strategy(
        1_000_000, 800_000, 256, k=10
    )  # widen=5, coverage=1
    assert (strat, probes) == ("ivf_prefilter", 5)


# --------------------------------------------------------------------------
# The executing operator, against a written IVF layout at test scale.
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ivf_corpus(spark, embeddings, tmp_path_factory):
    import os

    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )

    path = str(tmp_path_factory.mktemp("filtered") / "ivf_corpus")
    cents = kmeans_centroids(embeddings, n_cells=8)
    write_ivf_corpus(ivf_assign(embeddings, cents), path)
    assert os.path.isdir(path)
    return path, cents


@pytest.fixture(scope="module")
def qset(embeddings):
    return embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_plan_inputs_are_exact_counts(spark, embeddings, ivf_corpus):
    path, cents = ivf_corpus
    n = embeddings.count()
    n_surv = embeddings.filter("label < 3").count()
    plan = plan_filtered_knn(spark, path, "label < 3", cents.count(), k=10)
    assert plan["n_corpus"] == n and plan["n_survivors"] == n_surv
    assert plan["strategy"] == "exact"  # test corpus is far below crossover


def test_exact_branch_equals_filtered_ground_truth(spark, embeddings, ivf_corpus, qset):
    from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn

    path, cents = ivf_corpus
    got = filtered_knn_auto(
        qset, spark, path, cents, predicate="label < 3", k=10, item_id="vec_id"
    )
    want = exact_knn(
        qset, embeddings.filter("label < 3"), k=10, metric="l2", item_id="vec_id"
    )
    assert _rows(got) == _rows(want)


def test_ivf_branch_full_widen_equals_ground_truth(spark, embeddings, ivf_corpus, qset):
    """Forcing the IVF decision at a selectivity whose widening reaches
    every cell must STILL equal the exact filtered answer — the smooth
    degeneration EP8 measured (R@10 = 1.000 at full probe)."""
    from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn

    path, cents = ivf_corpus
    pred = "label < 1"  # s ~ 0.1 -> widen 40 -> capped at all 8 cells
    plan = plan_filtered_knn(
        spark, path, pred, cents.count(), k=10,
        exact_crossover_n=0, prune_win_frac=1.1,
    )
    assert plan["strategy"] == "ivf_prefilter"
    assert plan["n_probe"] == cents.count()
    got = filtered_knn_auto(
        qset, spark, path, cents, predicate=pred, k=10, item_id="vec_id",
        plan=plan, exact_crossover_n=0, prune_win_frac=1.1,
    )
    want = exact_knn(
        qset, embeddings.filter(pred), k=10, metric="l2", item_id="vec_id"
    )
    assert _rows(got) == _rows(want)


def test_ivf_branch_partial_probe_respects_predicate(spark, ivf_corpus, qset):
    """Partial widening is approximate by design but must keep strict
    pre-filter semantics: k rows per query, every one a survivor."""
    path, cents = ivf_corpus
    pred = "label < 5"  # s ~ 0.5 -> widen 8 of 8... use a bigger grid
    plan = plan_filtered_knn(
        spark, path, pred, cents.count(), k=10,
        exact_crossover_n=0, prune_win_frac=1.1, widen_factor=2.0,
    )
    assert plan["strategy"] == "ivf_prefilter"
    assert plan["n_probe"] < cents.count()  # genuinely partial
    got = filtered_knn_auto(
        qset, spark, path, cents, predicate=pred, k=10, item_id="vec_id",
        plan=plan, exact_crossover_n=0, prune_win_frac=1.1, widen_factor=2.0,
    ).collect()
    assert len(got) == 3 * 10
    surv = {r.vec_id for r in spark.read.parquet(path).filter(pred).collect()}
    assert all(r.item_id in surv for r in got)


def test_plan_estimate_partition_pruned_sample(spark, embeddings, ivf_corpus):
    """estimate=True keeps n_corpus exact (footer-only count) and derives
    the selectivity ratio from a partition-pruned STRIDED sample of cells
    (cell % 8 == 0 — spread across the index ordering, not a contiguous
    embedding-space-localized range; ADVICE r07) — survivors estimate =
    ratio x n_corpus, in [0, n], and the decision at this size is exact
    either way."""
    path, cents = ivf_corpus
    n_cells = cents.count()
    exact = plan_filtered_knn(spark, path, "label < 3", n_cells, k=10)
    est = plan_filtered_knn(
        spark, path, "label < 3", n_cells, k=10, estimate=True
    )
    assert est["n_corpus"] == exact["n_corpus"]
    assert 0 <= est["n_survivors"] <= est["n_corpus"]
    assert est["strategy"] == "exact"


def test_plan_estimate_no_id_low_cardinality_sample(spark, embeddings, tmp_path):
    """ADVICE r11: with no 'id' column and n_cells <= 8 the 1/8 sample
    used to hash the FIRST scalar column — a low-cardinality column
    (boolean label) makes pmod(hash, 8) == 0 select ~0% or ~100% of
    rows, wrecking the selectivity estimate. Hashing ALL scalar columns
    keys the sample on near-unique input, so the estimate lands near the
    true fraction."""
    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )

    # corpus WITHOUT an id column; first scalar column is a 0/1 flag, a
    # second scalar (vid) restores hash cardinality only when combined
    src = embeddings.select(
        (F.col("vec_id") % 2).cast("int").alias("flag"),
        F.col("vec_id").alias("vid"),
        "embedding",
    )
    cents = kmeans_centroids(src, n_cells=4)
    path = str(tmp_path / "noid_corpus")
    write_ivf_corpus(ivf_assign(src, cents), path)
    # predicate ON the low-cardinality column: under the old single-
    # column hash the sample held only the flag values whose hash
    # landed in the pmod bucket — estimating 'flag = 0' at ~0% or
    # ~100% instead of ~50%
    true_frac = src.filter("flag = 0").count() / src.count()
    est = plan_filtered_knn(
        spark, path, "flag = 0", 4, k=10, estimate=True,
        exact_crossover_n=0,  # force the estimate path at fixture size
    )
    got_frac = est["n_survivors"] / est["n_corpus"]
    assert 0.5 * true_frac <= got_frac <= 1.5 * true_frac


def test_filtered_auto_plan_cache(spark, embeddings, ivf_corpus, qset):
    """The decision is memoized per (layout, predicate, k, knobs) under a
    layout fingerprint: a second call reuses the plan without touching
    plan_filtered_knn; rewriting the layout invalidates it."""
    import os
    import time

    import vectordb_acc_and_speed_exp_spark.operators.filtered as filt

    path, cents = ivf_corpus
    filt.clear_plan_cache()
    filtered_knn_auto(
        qset, spark, path, cents, predicate="label < 3", k=10, item_id="vec_id"
    ).count()
    assert len(filt._PLAN_CACHE) == 1
    (key,) = filt._PLAN_CACHE
    fp0 = filt._PLAN_CACHE[key]["fingerprint"]

    calls = {"n": 0}
    orig = filt.plan_filtered_knn

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    filt.plan_filtered_knn = counting
    try:
        filtered_knn_auto(
            qset, spark, path, cents, predicate="label < 3", k=10,
            item_id="vec_id",
        ).count()
        assert calls["n"] == 0  # cache hit — no re-plan
        # a layout touch (what any cell upsert does) bumps the fingerprint
        entry = next(
            e.path for e in os.scandir(path) if e.name.startswith("cell=")
        )
        t = time.time() + 2
        os.utime(entry, (t, t))
        assert filt._layout_fingerprint(path) != fp0
        filtered_knn_auto(
            qset, spark, path, cents, predicate="label < 3", k=10,
            item_id="vec_id",
        ).count()
        assert calls["n"] == 1  # re-planned exactly once
    finally:
        filt.plan_filtered_knn = orig
        filt.clear_plan_cache()
