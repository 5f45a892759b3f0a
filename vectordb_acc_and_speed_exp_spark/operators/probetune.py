"""Recall-targeted probe budgets: the FAISS-autotune dial, measured.

Every IVF-family serving path takes an ``n_probe`` budget; round 8's
recall artifact showed what a hardcoded budget costs — 4-of-16 probes
is recall 0.48 on the sf0.1 corpus while 8 probes is 0.74. Production
engines tune this against a recall SLO (FAISS ``AutoTuneCriterion``,
Milvus/pgvector probe guidance); this module gives the engine the same
dial from a MEASURED curve instead of a guess.

The whole recall-vs-probes curve costs ONE calibration pass, not one
search per probe count: for each (query, true-neighbor) pair, the
neighbor is reachable at probe budget p iff the rank of the neighbor's
cell in the query's centroid ordering is <= p. So:

    gt            = exact top-k over the corpus for a deterministic
                    hash-sample of corpus vectors as queries
    cell_rank     = rank of each cell in each query's centroid order
    recall(p)     = fraction of gt pairs with cell_rank <= p

— a corpus scan (the exact kNN) + two broadcast joins, and the ENTIRE
curve falls out of one cumulative histogram. The curve is exact for
plain IVF candidate coverage; composed layouts (IVF-PQ/SQ/BQ) add a
short-list quantization loss on top, bounded by their re-rank coverage
(EP5), so the curve is the recall CEILING a probe budget buys — the
right planning number.

Persisted beside the centroids (``_probe_curve.json``, commitproto
publish) at build time; ``choose_n_probe(curve, target)`` picks the
smallest budget whose measured recall meets the target. ``target >= 1``
always returns every cell — sampled calibration can measure 1.0 before
full probe, but only full probe GUARANTEES it (that identity is what
the oracled facade degeneration pins). The curve is a pure function of
the frozen quantizer + corpus snapshot; upserts do not recompute it —
distribution change is the drift tracker's job (operators/drift.py),
and the rebuild it triggers refreshes the curve with everything else.

At 100 TB: calibration cost is one exact kNN of n_sample queries
(n_sample=32 default — the curve estimates a corpus-wide fraction, so
error ~ 1/sqrt(n_sample * k)) amortized into the build; serve-time
choose_n_probe is a dict lookup.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..io.relcache import read_layout
from .knn import exact_knn

CURVE_FILE = "_probe_curve.json"
DEFAULT_N_SAMPLE = 32


def probe_recall_curve(
    spark: SparkSession,
    corpus_path: str,
    centroids: DataFrame,
    k: int = 10,
    n_sample: int = DEFAULT_N_SAMPLE,
    item_id: str = "item_id",
    item_vec: str = "embedding",
) -> dict[int, float]:
    """{n_probe: recall@k ceiling} for every probe count 1..n_cells,
    from one calibration pass (module docstring). Calibration queries
    are a deterministic hash-ordered sample of corpus vectors — stable
    across partitionings and sessions, no RNG state."""
    corpus = read_layout(spark, corpus_path)
    n_cells = centroids.count()
    qs = (
        corpus.select(
            F.col(item_id).alias("query_id"), F.col(item_vec).alias("query_vec")
        )
        .orderBy(
            portable_hash64(F.col("query_id").cast("string")), "query_id"
        )
        .limit(n_sample)
    )
    gt = exact_knn(
        qs, corpus, k=k, item_id=item_id, item_vec=item_vec
    ).select("query_id", "item_id")
    cells = corpus.select(F.col(item_id).alias("item_id"), "cell")
    qcell_rank = exact_knn(
        qs, centroids, k=n_cells, item_id="cell", item_vec="centroid"
    ).select(
        "query_id", F.col("item_id").alias("cell"),
        F.col("rank").alias("cell_rank"),
    )
    hist = (
        gt.join(cells, "item_id")
        .join(qcell_rank, ["query_id", "cell"])
        .groupBy("cell_rank")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r.n for r in hist)
    by_rank = {int(r.cell_rank): int(r.n) for r in hist}
    curve, cum = {}, 0
    for p in range(1, n_cells + 1):
        cum += by_rank.get(p, 0)
        curve[p] = round(cum / total, 4) if total else 1.0
    return curve


def write_probe_curve(
    index_root: str, curve: dict[int, float], k: int, n_sample: int
) -> None:
    from ..io.commitproto import publish_marker

    publish_marker(
        os.path.join(index_root, CURVE_FILE),
        {
            "k": int(k),
            "n_sample": int(n_sample),
            "curve": {str(p): float(r) for p, r in curve.items()},
        },
    )


def read_probe_curve(index_root: str) -> dict[int, float] | None:
    p = os.path.join(index_root, CURVE_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return {int(k): float(v) for k, v in json.load(fh)["curve"].items()}


def choose_n_probe(curve: dict[int, float], target_recall: float) -> int:
    """Smallest measured probe budget meeting the target; ``target >= 1``
    returns every cell (only full probe GUARANTEES exactness — the
    sampled curve may reach 1.0 earlier)."""
    n_cells = max(curve)
    if target_recall >= 1.0:
        return n_cells
    for p in sorted(curve):
        if curve[p] >= target_recall:
            return p
    return n_cells
