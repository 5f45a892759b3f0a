"""Filtered-ANN selectivity sweep (EP8): pre-filter vs post-filter.

The vector-DB ``where=`` clause has two classic physical strategies and a
well-known crossover (e.g. the filtered-search discussion in the ANN
benchmarking literature):

- **pre-filter**: push the predicate into the (cell-pruned) scan, compute
  distances only over survivors.  Exact within the probed cells at ANY
  selectivity, cost shrinks with selectivity — but at very low selectivity
  the probed cells may hold < k survivors, so recall vs the globally
  filtered top-k degrades unless probes widen.
- **post-filter with overfetch**: run the UNfiltered search with k' = k/s
  (capped), filter afterwards.  No index interaction, but cost grows as
  1/s and a cap turns missing survivors into recall loss.

This tool measures both against the exact filtered ground truth
(brute-force kNN over the filtered corpus) at 100k and 1M vectors,
selectivities 0.1 / 0.01 / 0.001.  The predicate is a plain comparison on
a materialized metadata column (``sel_bucket = vec_id % 1000``) so it
lands in ``PushedFilters`` next to the partition filter — the same shape a
real metadata filter takes.  Index builds are untimed (per-corpus-version
artifacts, same protocol as bench.py / scale_crossover.py); each search is
warmed once and the second run is timed.

Usage: python tools/filtered_sweep.py [sizes...]   (default: 100000 1000000)
Prints one JSON line per (size, selectivity) plus a markdown table for
EP8_FILTERED.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = 10
OVERFETCH_CAP = 1000
# 0.5 added in round 7: the selectivity where the auto chooser's IVF branch
# engages at 1M (widen 4/s = 8 of 256 probes = 3.1% of cells, inside the
# prune-win budget); the original three all route exact at measured sizes
SELECTIVITIES = [0.5, 0.1, 0.01, 0.001]


def timed(fn) -> float:
    fn()  # warm
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main(sizes: list[int]) -> None:
    import pyspark.sql.functions as F

    from vectordb_acc_and_speed_exp_spark.experiments_scale import (
        expand_embeddings,
    )
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_ann_pruned,
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )
    from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn
    from vectordb_acc_and_speed_exp_spark.operators.recall import (
        mean_recall,
        recall_at_k,
    )
    from vectordb_acc_and_speed_exp_spark.session import get_spark

    spark = get_spark("filtered-sweep", cpus=CPUS, shuffle_partitions=max(32, CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    rows = []
    for target_n in sizes:
        big, _ = expand_embeddings(emb, target_n)
        big = big.withColumn(
            "sel_bucket", F.pmod(F.col("vec_id"), F.lit(1000)).cast("int")
        ).persist()
        n = big.count()

        root = tempfile.mkdtemp(prefix="filtered_sweep_")
        try:
            n_cells = 64 if n <= 200_000 else 256
            cents = kmeans_centroids(big, n_cells=n_cells, sample_fraction=0.1)
            corpus_path = os.path.join(root, "ivf_corpus")
            write_ivf_corpus(ivf_assign(big, cents), corpus_path)

            for s in SELECTIVITIES:
                m = max(1, round(s * 1000))

                # ground truth strategy: brute force over survivors. Timed
                # the same way as the index paths — the DataFrame is
                # rebuilt inside the lambda (no persisted result cache) and
                # reads the SAME cell-partitioned parquet the IVF paths
                # read, predicate pushed into the scan, so storage format
                # and execution are apples-to-apples.
                def exact_filtered():
                    corpus = spark.read.parquet(corpus_path).filter(
                        F.col("sel_bucket") < m
                    )
                    return exact_knn(qs, corpus, k=K, item_id="vec_id")

                sec_exact = timed(lambda: exact_filtered().count())

                # the chooser (operators/filtered.py): timed END-TO-END.
                # The warm call pays the (sampled) planning scans and
                # fills the plan cache; the timed call is the cached-plan
                # serve — the honest repeat-query cost of mode="auto".
                # MUST be timed BEFORE gt is persisted below: the exact
                # branch's logical plan is identical to gt's, and Spark's
                # cache manager substitutes cached data for plan-equal
                # subtrees — timing after the persist times a cache read
                # (0.4 s vs the real 1.2 s at 100k; caught in round 7).
                from vectordb_acc_and_speed_exp_spark.operators.filtered import (
                    filtered_knn_auto,
                    plan_filtered_knn,
                )

                def auto():
                    return filtered_knn_auto(
                        qs, spark, corpus_path, cents,
                        predicate=F.col("sel_bucket") < m,
                        k=K, item_id="vec_id",
                    )

                sec_auto = timed(lambda: auto().count())

                gt = exact_filtered().persist()
                gt.count()  # materialize for the recall joins below

                def prefilter():
                    return ivf_ann_pruned(
                        qs, spark, corpus_path, cents, k=K, n_probe=4,
                        item_id="vec_id", predicate=F.col("sel_bucket") < m,
                    )

                sec_pre = timed(lambda: prefilter().count())
                rec_pre = (
                    mean_recall(recall_at_k(gt, prefilter(), K))
                    .collect()[0][0]
                )

                # the known mitigation: widen probes as selectivity falls
                # (n_probe ~ 1/s, capped at full probe = exact-over-survivors)
                n_probe_adapt = min(n_cells, -(-4 // max(s, 1e-9)).__int__())

                def prefilter_adapt():
                    return ivf_ann_pruned(
                        qs, spark, corpus_path, cents, k=K,
                        n_probe=n_probe_adapt, item_id="vec_id",
                        predicate=F.col("sel_bucket") < m,
                    )

                sec_adapt = timed(lambda: prefilter_adapt().count())
                rec_adapt = (
                    mean_recall(recall_at_k(gt, prefilter_adapt(), K))
                    .collect()[0][0]
                )

                k_over = min(int(K / s), OVERFETCH_CAP)

                def postfilter():
                    raw = ivf_ann_pruned(
                        qs, spark, corpus_path, cents, k=k_over, n_probe=4,
                        item_id="vec_id",
                    )
                    from pyspark.sql import Window

                    surv = raw.filter(F.pmod(F.col("item_id"), F.lit(1000)) < m)
                    w = Window.partitionBy("query_id").orderBy(
                        F.asc("dist"), F.asc("item_id")
                    )
                    return (
                        surv.withColumn(
                            "rank", F.row_number().over(w).cast("bigint")
                        )
                        .filter(F.col("rank") <= K)
                        .select("query_id", "rank", "item_id", "dist")
                    )

                sec_post = timed(lambda: postfilter().count())
                rec_post = (
                    mean_recall(recall_at_k(gt, postfilter(), K))
                    .collect()[0][0]
                )
                n_post = postfilter().count()

                rec_auto = (
                    mean_recall(recall_at_k(gt, auto(), K)).collect()[0][0]
                )
                plan = plan_filtered_knn(
                    spark, corpus_path, F.col("sel_bucket") < m, n_cells, k=K
                )
                gt.unpersist()

                row = {
                    "n_vectors": n,
                    "selectivity": s,
                    "k_overfetch": k_over,
                    "n_probe_adapt": n_probe_adapt,
                    "auto_decision": {
                        "strategy": plan["strategy"],
                        "n_probe": plan["n_probe"],
                    },
                    "sec": {
                        "exact_filtered": sec_exact,
                        "ivf_prefilter": sec_pre,
                        "ivf_prefilter_adapt": sec_adapt,
                        "ivf_postfilter": sec_post,
                        "auto": sec_auto,
                    },
                    "recall_vs_exact": {
                        "ivf_prefilter": round(rec_pre, 4),
                        "ivf_prefilter_adapt": round(rec_adapt, 4),
                        "ivf_postfilter": round(rec_post, 4),
                        "auto": round(rec_auto, 4),
                    },
                    "rows_returned_postfilter": n_post,
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        big.unpersist()

    print("\n| n_vectors | sel | exact s | pre s | adapt s (probes) | post s | auto s (decision) | pre R@10 | adapt R@10 | post R@10 | auto R@10 | post rows/50 |")
    print("|---|---|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        d = r["auto_decision"]
        dec = (
            "exact" if d["strategy"] == "exact" else f"ivf@{d['n_probe']}"
        )
        print(
            f"| {r['n_vectors']:,} | {r['selectivity']} "
            f"| {r['sec']['exact_filtered']:.2f} | {r['sec']['ivf_prefilter']:.2f} "
            f"| {r['sec']['ivf_prefilter_adapt']:.2f} ({r['n_probe_adapt']}) "
            f"| {r['sec']['ivf_postfilter']:.2f} "
            f"| {r['sec']['auto']:.2f} ({dec}) "
            f"| {r['recall_vs_exact']['ivf_prefilter']:.3f} "
            f"| {r['recall_vs_exact']['ivf_prefilter_adapt']:.3f} "
            f"| {r['recall_vs_exact']['ivf_postfilter']:.3f} "
            f"| {r['recall_vs_exact']['auto']:.3f} | {r['rows_returned_postfilter']} |"
        )


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [100_000, 1_000_000])
