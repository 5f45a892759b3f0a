"""Join-strategy hint helpers shared by the ANN serve paths.

One rule, owned in one place (VERDICT r13 #1): the exact re-rank joins a
serving-bounded candidate short-list (queries x shortlist rows) against
the corpus vector payload. Past ~200k indexed vectors the planner's size
estimate for the candidate subtree (window over mapInPandas over parquet
scans) blows past the broadcast threshold and it sort-merge-SHUFFLES the
corpus vectors to attach a tiny id list (measured at the 1M bench
corpus: ~0.5 GB exchange, plans/r13/mtlsh_pruned_1m_5q_before.txt) —
force-broadcast the candidates there. Below that, auto-planning already
broadcasts correctly and forcing the COMPUTED candidate subtree through
a driver collect+rebroadcast is pure added roundtrip (measured on mtlsh
in r13: +0.4 s; the r13 driver run read ann_sq_topk at 3.25 s in BOTH
the 32- and 8-core runs — a fixed, core-count-independent cost — vs
1.13 s without the forced hint). The dial is data-driven (corpus row
count from the caller's sidecar/train metadata), never a local-mode
constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Corpus size above which the planner's estimate for a computed
# candidate subtree has been measured to lose the broadcast choice
# (plans/r13/mtlsh_pruned_1m_5q_before.txt: SortMergeJoin at 1M rows;
# auto-BHJ still chosen at the <=100k bench points).
BROADCAST_RERANK_MIN_CORPUS = 200_000


def broadcast_if_large(cand: DataFrame, n_corpus: int | None) -> DataFrame:
    """Return ``cand`` with a broadcast hint iff the corpus side is known
    to be large (``n_corpus`` >= BROADCAST_RERANK_MIN_CORPUS).

    ``n_corpus=None`` (size unknown) leaves the planner alone — the
    conservative choice: a wrongly-forced broadcast costs a fixed driver
    collect+rebroadcast on every serve, while a missed one is rescued by
    AQE at runtime.
    """
    if n_corpus is not None and int(n_corpus) >= BROADCAST_RERANK_MIN_CORPUS:
        return F.broadcast(cand)
    return cand
