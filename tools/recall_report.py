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

# registry entry -> short family label. Since round 9 the probe/shortlist
# budgets are MEASURED serving defaults (queries/pipeline.py
# _ivf_serving/_flat_serving/_composed_serving: each family's persisted
# calibration curve at probetune.DEFAULT_TARGET_RECALL (0.85) — VERDICT r08 #1), so the
# labels carry "tuned", not a literal budget. ann_bq_tuned replaces
# ann_bq_topk here because the latter pins shortlist=100 for its
# cross-engine hash oracle.
FAMILIES = {
    "ann_lsh_topk": "lsh_tuned",
    "mt_lsh_ann_topk": "mtlsh_tuned",
    "ann_ivf_topk": "ivf_tuned",
    "ann_pq_topk": "pq_tuned",
    "ann_sq_topk": "sq_tuned",
    "ann_ivfsq_topk": "ivfsq_tuned",
    "ann_ivfpq_topk": "ivfpq_tuned",
    "ann_bq_tuned": "bq_tuned",
    "ann_ivfbq_topk": "ivfbq_tuned",
    "graph_ann_topk": "graph_nsw",
    "graph_ivf_ann_topk": "graph_ivf_tuned",
}


def _gt_and_queries(spark, sf_dir: str):
    import pyspark.sql.functions as F

    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn

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
    return emb, qs, gt


def _recall_of(gt, res) -> float:
    from vectordb_acc_and_speed_exp_spark.operators.recall import (
        mean_recall,
        recall_at_k,
    )

    r = mean_recall(
        recall_at_k(gt, res.select("query_id", "rank", "item_id"), k=10)
    ).first().mean_recall
    return round(float(r), 4)


def compute_recalls(spark, sf_dir: str) -> dict[str, float]:
    """{registry entry: mean recall@10 vs exact L2} at each family's
    SERVING budget — importable for the floor test
    (tests/test_recall_floors.py)."""
    from vectordb_acc_and_speed_exp_spark.queries import load_all

    registry = load_all()
    _, _, gt = _gt_and_queries(spark, sf_dir)
    out = {}
    for name in FAMILIES:
        out[name] = _recall_of(gt, registry[name].fn(spark, sf_dir))
    gt.unpersist()
    return out


def compute_floor_recalls(spark, sf_dir: str) -> dict[str, float]:
    """Each family at its MATCHED floor budget — the budget an operator
    dials to meet the reference's recall on an unstructured corpus:
    cell-pruned families probe 8 of 16 cells (50% of directories — still
    a pruned scan), short-list families re-rank 400 candidates. The
    serving budgets in `compute_recalls` are the latency-priced points;
    these are the recall-priced points, and the close gate requires
    every family to clear the reference HNSW floor (0.70 @58k,
    BASELINE.md) HERE. On the synthetic corpus recall ≈ scan coverage
    (near-isotropic vectors — harder than the reference's clustered
    text embeddings), so serving-budget recall at 25% coverage sits in
    the 0.4-0.7 band by construction, not by regression; regressions at
    serving budgets are caught by the round-over-round comparison in
    close_round."""
    from vectordb_acc_and_speed_exp_spark.operators.ann import ivf_ann_pruned
    from vectordb_acc_and_speed_exp_spark.operators.bq import (
        bq_search_rerank,
        bq_train,
        ivfbq_search,
    )
    from vectordb_acc_and_speed_exp_spark.operators.graphann import (
        graph_ann_cell_probed,
    )
    from vectordb_acc_and_speed_exp_spark.operators.pq import (
        ivfpq_search,
        pq_search_rerank,
    )
    from vectordb_acc_and_speed_exp_spark.operators.sq import ivfsq_search
    from vectordb_acc_and_speed_exp_spark.queries.pipeline import (
        _get_or_build_cell_graph,
        _get_or_build_ivf,
        _get_or_build_ivfbq,
        _get_or_build_ivfpq,
        _get_or_build_ivfsq,
        _get_or_build_pq,
    )

    emb, qs, gt = _gt_and_queries(spark, sf_dir)
    out = {}

    cp, cents = _get_or_build_ivf(spark, sf_dir)
    out["ivf_8of16"] = _recall_of(
        gt, ivf_ann_pruned(qs, spark, cp, cents, k=10, n_probe=8, item_id="vec_id")
    )
    enc, books = _get_or_build_pq(spark, sf_dir)
    out["pq_short400"] = _recall_of(
        gt, pq_search_rerank(qs, emb, enc, books, k=10, shortlist=400, item_id="vec_id")
    )
    sums, n = bq_train(emb, item_vec="embedding", dim=64)
    out["bq_short400"] = _recall_of(
        gt, bq_search_rerank(qs, emb, sums, n, k=10, shortlist=400, item_id="vec_id")
    )
    codes_path, corpus_path, cents, vmin, scale = _get_or_build_ivfsq(spark, sf_dir)
    out["ivfsq_8probe"] = _recall_of(
        gt,
        ivfsq_search(
            qs, spark, codes_path, corpus_path, cents, vmin, scale,
            k=10, n_probe=8, shortlist=400, item_id="vec_id",
        ),
    )
    codes_path, corpus_path, cents, pbooks = _get_or_build_ivfpq(spark, sf_dir)
    out["ivfpq_8probe"] = _recall_of(
        gt,
        ivfpq_search(
            qs, spark, codes_path, corpus_path, cents, pbooks,
            k=10, n_probe=8, shortlist=400, item_id="vec_id",
        ),
    )
    codes_path, corpus_path, cents, bsums, bn = _get_or_build_ivfbq(spark, sf_dir)
    out["ivfbq_8probe"] = _recall_of(
        gt,
        ivfbq_search(
            qs, spark, codes_path, corpus_path, cents, bsums, bn,
            k=10, n_probe=8, shortlist=400, item_id="vec_id",
        ),
    )
    gpath, gcents = _get_or_build_cell_graph(spark, sf_dir)
    out["graph_ivf_8probe"] = _recall_of(
        gt, graph_ann_cell_probed(qs, spark, gpath, gcents, k=10, n_probe=8)
    )
    gt.unpersist()
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from vectordb_acc_and_speed_exp_spark.session import get_spark

    spark = get_spark("recall_report", cpus=cpus, shuffle_partitions=max(32, cpus))
    spark.sparkContext.setLogLevel("ERROR")

    recalls = compute_recalls(spark, sf_dir)
    floors = compute_floor_recalls(spark, sf_dir)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    env_round = os.environ.get("SPARK_GRAFT_ROUND", "")
    round_no = (
        int(env_round)
        if env_round.isdigit()
        else len(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))) + 1
    )
    serving = {FAMILIES[n]: r for n, r in recalls.items()}
    # gate: every family clears the reference floor AT ITS SERVING
    # BUDGET (VERDICT r08 #1 done-criterion). Until round 9 the gate
    # accepted a matched "floor budget" fallback; now the serving
    # defaults are curve-chosen to clear the floor themselves, so the
    # fallback is gone — floor_budget_families stays in the payload as
    # the fixed-budget reference points on the latency/recall frontier.
    gated = dict(serving)
    # EP13 drift per maintained artifact (VERDICT r08 #5): every drift
    # baseline under the bench fixture root reports its ratio here, and
    # the close FAILS on any retrain_recommended — a silently-drifting
    # artifact trips the close before its recall does. (The fixtures are
    # rebuilt from a fingerprinted corpus, so ratios are None unless a
    # maintenance path upserted into them this round.)
    from vectordb_acc_and_speed_exp_spark.operators.drift import drift_status
    from vectordb_acc_and_speed_exp_spark.queries.pipeline import _index_root

    root = _index_root(sf_dir)
    drift = {}
    for dirpath, _dirs, files in os.walk(root):
        if "_drift.json" in files:
            st = drift_status(dirpath)
            rel = os.path.relpath(dirpath, root)
            drift[rel if rel != "." else "ivf_root"] = {
                "ratio": st.get("ratio"),
                "upsert_n": st.get("upsert_n"),
                "trigger_ratio": st.get("trigger_ratio"),
                "retrain_recommended": st.get("retrain_recommended"),
            }

    payload = {
        "metric": "ann_recall_at_10",
        "k": 10,
        "n_queries": 5,
        "gt": "exact_knn_l2",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "families": serving,
        "floor_budget_families": floors,
        "gated": gated,
        "entries": recalls,
        "drift": drift,
        # the reference's own HNSW degrades to ~0.70 at 58k docs
        # (BASELINE.md recall table) — the floor every family must beat
        # at matched budget
        "reference_hnsw_floor": 0.70,
        "min_family": min(gated.values()),
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
