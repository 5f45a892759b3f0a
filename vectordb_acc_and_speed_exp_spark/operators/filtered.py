"""Selectivity-driven filtered ANN: EP8's measured planner rule as code.

The vector-DB ``where=`` clause (reference: ChromaDB's metadata filter on
``collection.query``, create_collections.py:245-263 exercises it implicitly
via collection scoping) has two physical strategies whose crossover
EP8_FILTERED.md measured against exact filtered ground truth:

- **exact-over-survivors** — predicate pushed into the (cell-partitioned)
  corpus scan, brute-force kNN over survivors. Always exact; cost is one
  full-corpus scan regardless of selectivity.
- **IVF pre-filter with widened probes** — predicate lands in
  ``PushedFilters`` next to the ``cell IN (...)`` partition filter;
  probes widen as selectivity falls (EP8: fixed probes lose recall to
  survivor starvation, 0.14-0.44 measured; widening ~4/s restores it).
  Cost ~ probes/C of the corpus + probe planning overhead.

Post-filter + overfetch is deliberately absent: EP8 measured it dominated
on time at 1M with any k' cap silently dropping rows.

The measured decision boundary (this box, EP8_FILTERED.md table):

1. below ~a few 100k vectors every strategy is fixed-overhead-dominated
   and exact-over-survivors is fastest AND exact → ``EXACT_CROSSOVER_N``;
2. widened probes only pay when they still prune most of the corpus: at
   1M/256 cells, 40/256 probes (15.6%) measured SLOWER than the full
   exact scan (4.69 s vs 3.61 s — probe fan-out overhead), while 4/256
   (1.6%) measured 2x faster → ``PRUNE_WIN_FRAC`` between them;
3. when ceil(WIDEN_FACTOR/s) reaches the prune-win budget, widening has
   eroded the pruning that justified the index — degenerate to
   exact-over-survivors (simpler plan, exact recall, measured faster).

At 100 TB the same rule holds with cheaper inputs: survivor counts come
from column statistics / a seeded sample instead of the column-pruned
count this module runs, and PRUNE_WIN_FRAC rises toward 0.5 as the probe
fan-out overhead amortizes over bigger cells — the constants are knobs,
the structure is the deliverable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Measured on this box (EP8_FILTERED.md): exact-over-survivors wins outright
# below ~a few 100k vectors.
EXACT_CROSSOVER_N = 200_000
# EP8's recall-restoring widening dial: n_probe ~ WIDEN_FACTOR / selectivity
# (fixed probes measured 0.14-0.44 recall; 4/s measured 0.80-1.00).
WIDEN_FACTOR = 4.0
# Probe budget as a fraction of cells: above it the pruned scan no longer
# pays for probe fan-out (measured: 15.6% of cells lost to exact, 1.6% won).
PRUNE_WIN_FRAC = 0.125


def choose_filtered_strategy(
    n_corpus: int,
    n_survivors: int,
    n_cells: int,
    k: int = 10,
    exact_crossover_n: int = EXACT_CROSSOVER_N,
    widen_factor: float = WIDEN_FACTOR,
    prune_win_frac: float = PRUNE_WIN_FRAC,
    min_probe: int | None = None,
) -> tuple[str, int | None]:
    """The planner rule, pure and unit-testable: returns
    ``("exact", None)`` or ``("ivf_prefilter", n_probe)``.

    n_probe = ceil(widen_factor / s) — EP8's recall dial — floored at 4
    and at the k-coverage minimum (probed cells must expect >= k
    survivors: probes >= k * n_cells / n_survivors), capped at n_cells.
    If that lands at or above prune_win_frac * n_cells, pruning no longer
    pays and the exact filtered scan is both faster (measured) and exact.

    ``min_probe`` is the recall-target floor (VectorStore.query(where=,
    target_recall=)): the probe budget the collection's MEASURED
    recall-vs-probes curve demands for the target on the unfiltered
    corpus. The chooser takes the max of that floor and the selectivity
    widening — the floor carries the corpus-level coverage guarantee,
    the widening the survivor-starvation correction — and when the
    combined budget erodes pruning past prune_win_frac the exact branch
    serves (recall 1.0, trivially meeting any target; target >= 1
    passes min_probe = n_cells, which always lands here)."""
    if n_corpus <= exact_crossover_n or n_survivors <= 0:
        return ("exact", None)
    s = n_survivors / n_corpus
    n_probe = max(
        4,
        min_probe or 0,
        math.ceil(widen_factor / s),
        math.ceil(k * n_cells / n_survivors),
    )
    n_probe = min(n_cells, n_probe)
    if n_probe >= prune_win_frac * n_cells:
        return ("exact", None)
    return ("ivf_prefilter", n_probe)


def _pred_col(predicate: Column | str) -> Column:
    return F.expr(predicate) if isinstance(predicate, str) else predicate


def plan_filtered_knn(
    spark: SparkSession,
    corpus_path: str,
    predicate: Column | str,
    n_cells: int,
    k: int = 10,
    estimate: bool = False,
    **knobs,
) -> dict:
    """Resolve the chooser's inputs against a written cell-partitioned
    corpus and return the decision with its evidence:
    {n_corpus, n_survivors, strategy, n_probe}.

    ``estimate=False`` (tests, reporting): both counts are exact
    column-pruned scans.  ``estimate=True`` (the serving path):
    ``n_corpus`` stays exact but costs only a parquet-footer count (no
    column data read), and the SELECTIVITY comes from a
    PARTITION-PRUNED sample — the predicate scans only the strided cell
    subset ``cell % 8 == 0`` (~1/8 of cells, spread across the index
    ordering rather than a contiguous — and therefore
    embedding-space-localized — range); the ratio survivors/rows within
    the sample is robust to cell-size skew (kmeans cells vary wildly)
    and the striding weakens the one modeling assumption (metadata
    correlated with the coarse-quantizer cells biases any fixed cell
    subset; the decision is a planning input, never part of the
    answer).  This is the 100 TB discipline:
    planning cost is a footer scan + a fixed fraction of one probe, not
    two full-corpus data scans per query.  An empty sample falls back
    to the exact counts."""
    corpus = spark.read.parquet(corpus_path)
    n_corpus = corpus.count()  # footer-only: no column data materializes
    crossover = knobs.get("exact_crossover_n", EXACT_CROSSOVER_N)
    if estimate and n_corpus <= crossover:
        # the corpus count alone already decides the branch (exact wins
        # below the crossover regardless of selectivity) — don't burn a
        # sampling scan whose answer the chooser would ignore; the exact
        # survivor count is cheap at this size and keeps the evidence real
        estimate = False
    if estimate and n_cells > 1:
        # STRIDED cell subset (cell % 8 == 0), not the contiguous range
        # cell < n/8: kmeans cells partition embedding space, so metadata
        # correlated with embeddings (common in practice) would bias a
        # contiguous sample — an overestimated selectivity under-widens
        # n_probe and silently erodes recall below the 4/s dial (ADVICE
        # r07). Striding spreads the sample across the index ordering;
        # still a PartitionFilter, so the scan stays pruned. With fewer
        # than ~2 cells per stride step (n_cells <= 8) the stride
        # degenerates to the single contiguous cell 0 — exactly the
        # localized sample the stride exists to avoid — so those layouts
        # sample 1/8 of ROWS by id hash instead: no partition pruning,
        # but cell-independent selectivity on a corpus whose cell count
        # is too small for a spread cell subset anyway.
        if n_cells <= 8:
            # hash SMALL stable columns only (the id if present, else ALL
            # scalar non-cell columns together): hashing the embedding
            # arrays would materialize them for the whole corpus — more
            # IO than the exact count this sample replaces (ADVICE r10).
            # A single arbitrary scalar column is NOT enough (ADVICE
            # r11): if it happens to be low-cardinality (a boolean
            # label), pmod(hash, 8) == 0 selects ~0% or ~100% of rows
            # and the selectivity estimate is garbage — combining every
            # scalar column makes the hash input near-unique wherever
            # rows are distinguishable at all.
            scalar = [
                f.name
                for f in corpus.schema.fields
                if f.name != "cell"
                and f.dataType.typeName() not in ("array", "struct", "map")
            ]
            key = ["id"] if "id" in scalar else scalar
            if key:
                sample = corpus.filter(
                    F.pmod(F.xxhash64(*key), F.lit(8)) == 0
                )
            else:
                # no scalar columns at all: stride on row position —
                # partition-stable within this plan, and the sample is a
                # planning input, never part of any answer
                sample = corpus.withColumn(
                    "_rp", F.monotonically_increasing_id()
                ).filter(F.pmod(F.col("_rp"), F.lit(8)) == 0)
        else:
            sample = corpus.filter(F.col("cell") % 8 == 0)
        n_rows, n_surv = (
            sample.select(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(_pred_col(predicate), 1)).alias("s"),
            ).first()
        )
        if n_rows > 0:
            n_survivors = int(round(n_corpus * n_surv / n_rows))
        else:
            n_survivors = corpus.filter(predicate).count()
    else:
        n_survivors = corpus.filter(predicate).count()
    strategy, n_probe = choose_filtered_strategy(
        n_corpus, n_survivors, n_cells, k=k, **knobs
    )
    return {
        "n_corpus": n_corpus,
        "n_survivors": n_survivors,
        "strategy": strategy,
        "n_probe": n_probe,
    }


# Plan cache: a (layout, predicate shape, k, knobs) -> decision memo with a
# layout fingerprint, exactly the role of a DB's plan/statistics cache.
# Repeated queries with the same filter shape plan once; an upsert to any
# cell directory bumps the fingerprint and forces a re-plan.  Bounded: a
# long-lived service seeing unboundedly many predicate shapes must not
# leak driver memory — oldest entry falls out past the cap (dict preserves
# insertion order).
_PLAN_CACHE: dict = {}
_PLAN_CACHE_MAX = 1024


def _layout_fingerprint(path: str) -> tuple:
    """Cheap change detector: (entry count, max mtime_ns) over the layout's
    top-level entries — cell-partition overwrites touch their cell=N dir,
    full rebuilds touch everything."""
    import os

    try:
        with os.scandir(path) as it:
            mt = [e.stat().st_mtime_ns for e in it]
    except OSError:
        # a path the local stat cannot see (URI-scheme layouts Spark can
        # still read, transient races): returning a CONSTANT here would
        # make every cached plan match forever and serve stale decisions
        # past upserts — None never equals a stored fingerprint, so such
        # layouts re-plan per call instead of caching wrong
        return None
    return (len(mt), max(mt, default=0))


def _predicate_key(predicate: Column | str) -> str:
    # Column repr renders the resolved expression deterministically
    # (e.g. "Column<'(sel_bucket < 100)'>"); strings are themselves.
    return predicate if isinstance(predicate, str) else str(predicate)


def clear_plan_cache() -> None:
    _PLAN_CACHE.clear()


def filtered_knn_auto(
    queries: DataFrame,
    spark: SparkSession,
    corpus_path: str,
    centroids: DataFrame,
    predicate: Column | str,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    item_id: str = "item_id",
    item_vec: str = "embedding",
    plan: dict | None = None,
    **knobs,
) -> DataFrame:
    """Filtered top-k with the strategy chosen by the measured EP8 rule
    (``VectorStore.query(where=..., mode="auto")`` routes here).

    Exact branch: predicate pushed into the full cell-partitioned scan,
    brute-force kNN over survivors (exactly the filtered ground truth).
    IVF branch: ``ivf_ann_pruned`` with the predicate as a pushed data
    filter and the selectivity-widened probe count. Returns
    (query_id, rank, item_id, dist) either way.

    Planning inputs come from the partition-pruned sample estimator and
    the decision is memoized per (layout, predicate shape, k, knobs)
    under a layout fingerprint — repeated queries with the same filter
    shape pay planning once, an upsert forces a re-plan (EP8's auto
    column measures the chosen strategy, not two corpus scans).  Pass a
    resolved ``plan`` (from plan_filtered_knn) to pin the decision — the
    hash-oracled gate degenerations do, so estimator sampling noise can
    never flip a branch the oracle assumes."""
    from .knn import exact_knn

    if plan is None:
        fp = _layout_fingerprint(corpus_path)
        cache_key = (
            corpus_path,
            _predicate_key(predicate),
            k,
            tuple(sorted(knobs.items())),
        )
        cached = _PLAN_CACHE.get(cache_key)
        if cached is not None and fp is not None and cached["fingerprint"] == fp:
            plan = cached
            # LRU, not FIFO: a hit refreshes recency, so the hottest
            # predicate shape is never the first evicted at the cap
            _PLAN_CACHE.pop(cache_key, None)
            _PLAN_CACHE[cache_key] = plan
        else:
            n_cells = centroids.count()
            plan = plan_filtered_knn(
                spark, corpus_path, predicate, n_cells, k=k,
                estimate=True, **knobs
            )
            plan["fingerprint"] = fp
            while len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
                # tolerant pop: concurrent planners can race the eviction
                # of the same oldest key — losing that race must not fail
                # the query
                try:
                    _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)), None)
                except (StopIteration, RuntimeError):
                    break
            if fp is not None:
                _PLAN_CACHE[cache_key] = plan
    if plan["strategy"] == "exact":
        corpus = spark.read.parquet(corpus_path).filter(predicate)
        return exact_knn(
            queries, corpus, k=k, metric="l2",
            query_id=query_id, query_vec=query_vec,
            item_id=item_id, item_vec=item_vec,
        )
    from .ann import ivf_ann_pruned

    return ivf_ann_pruned(
        queries, spark, corpus_path, centroids,
        k=k, n_probe=plan["n_probe"],
        query_id=query_id, query_vec=query_vec,
        item_id=item_id, item_vec=item_vec,
        predicate=predicate,
    )
