"""Round-stamped ANN recall artifact: every ANN family at its fixed
serving budget vs the exact-kNN oracle — the accuracy half of the
reference's methodology (README.md:28-31: Recall@K of HNSW vs brute
force), regression-tracked per round like the latency bench
(VERDICT r07 #4).

Each family is evaluated through its REGISTRY entry — the same code,
index artifacts, and probe/shortlist budgets the driver benches — so a
recall regression here means the served path regressed, not a harness
twin.  Ground truth is exact L2 top-10 over the same 5-query set
(operators/knn.exact_knn, the reference's brute-force oracle
ACC:508-537).

Usage:
    SPARK_GRAFT_ROUND=8 python tools/recall_report.py            # sf0.1
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/recall_report.py

Writes RECALL_r{N}.json at the repo root (plus RECALL_latest.json) and
prints one JSON line.  tools/close_round.py runs this at every close.
"""

from __future__ import annotations

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

# registry entry -> short family label. Budgets live in the entries
# themselves (k=10 everywhere; probes/shortlists per family docstrings).
FAMILIES = {
    "ann_lsh_topk": "lsh_3bit",
    "mt_lsh_ann_topk": "mtlsh_64probe",
    "ann_ivf_topk": "ivf_4of16",
    "ann_pq_topk": "pq_short100",
    "ann_sq_topk": "sq_short50",
    "ann_ivfsq_topk": "ivfsq_4probe",
    "ann_ivfpq_topk": "ivfpq_4probe",
    "ann_bq_topk": "bq_short100",
    "ann_ivfbq_topk": "ivfbq_4probe",
    "graph_ann_topk": "graph_nsw",
    "graph_ivf_ann_topk": "graph_ivf",
}


def compute_recalls(spark, sf_dir: str) -> dict[str, float]:
    """{registry entry: mean recall@10 vs exact L2} — importable for the
    floor test (tests/test_recall_floors.py)."""
    import pyspark.sql.functions as F

    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn
    from vectordb_acc_and_speed_exp_spark.operators.recall import (
        mean_recall,
        recall_at_k,
    )
    from vectordb_acc_and_speed_exp_spark.queries import load_all

    registry = load_all()
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    gt = (
        exact_knn(qs, emb, k=10, item_id="vec_id")
        .select("query_id", "rank", "item_id")
        .cache()
    )
    gt.count()
    out = {}
    for name in FAMILIES:
        res = registry[name].fn(spark, sf_dir).select(
            "query_id", "rank", "item_id"
        )
        r = mean_recall(recall_at_k(gt, res, k=10)).first().mean_recall
        out[name] = round(float(r), 4)
    gt.unpersist()
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from vectordb_acc_and_speed_exp_spark.session import get_spark

    spark = get_spark("recall_report", cpus=cpus, shuffle_partitions=max(32, cpus))
    spark.sparkContext.setLogLevel("ERROR")

    recalls = compute_recalls(spark, sf_dir)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    env_round = os.environ.get("SPARK_GRAFT_ROUND", "")
    round_no = (
        int(env_round)
        if env_round.isdigit()
        else len(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))) + 1
    )
    payload = {
        "metric": "ann_recall_at_10",
        "k": 10,
        "n_queries": 5,
        "gt": "exact_knn_l2",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "families": {FAMILIES[n]: r for n, r in recalls.items()},
        "entries": recalls,
        # the reference's own HNSW degrades to ~0.70 at 58k docs
        # (BASELINE.md recall table) — the floor every family must beat
        # at matched scan budget
        "reference_hnsw_floor": 0.70,
        "min_family": min(recalls.values()),
    }
    for fname in (f"RECALL_r{round_no:02d}.json", "RECALL_latest.json"):
        try:
            with open(os.path.join(REPO, fname), "w") as fh:
                json.dump(payload, fh, indent=1)
        except OSError:
            pass
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
