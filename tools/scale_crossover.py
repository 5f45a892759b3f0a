"""Scale-crossover measurement: BLAS exact vs codegen exact vs BQ vs
mt-LSH-pruned vs IVF-BQ at 100k AND 1M vectors (VERDICT r04 #5).

The claim under test: "BQ's 32× byte advantage becomes wall-clock advantage
as scans go IO/memory-bound" — asserted in BENCH_NOTES round 4, measured
here.  Index/code builds are untimed (they are per-corpus-version artifacts,
same protocol as bench.py); each search entry is warmed once and the second
run is timed.  5-query batch, top-10, L2/cosine per each operator's
production kernel.

Usage: python tools/scale_crossover.py [sizes...]   (default: 100000 1000000)
Prints one JSON line per (size, kernel) plus a final markdown table for
BENCH_NOTES.md.
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
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )
    from vectordb_acc_and_speed_exp_spark.operators.bq import (
        bq_encode,
        bq_search_rerank,
        bq_train,
        ivfbq_search,
        write_ivfbq_codes,
    )
    from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn
    from vectordb_acc_and_speed_exp_spark.operators.mtlsh import (
        mt_lsh_ann_pruned,
        write_mt_lsh_index,
    )
    from vectordb_acc_and_speed_exp_spark.operators.simjoin import (
        cosine_knn_join,
    )
    from vectordb_acc_and_speed_exp_spark.session import get_spark

    spark = get_spark("scale-crossover", cpus=CPUS, shuffle_partitions=max(32, CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    results: dict[int, dict[str, float]] = {}
    for target_n in sizes:
        big, _ = expand_embeddings(emb, target_n)
        big = big.persist()
        n = big.count()
        row: dict[str, float] = {}

        row["blas"] = timed(
            lambda: cosine_knn_join(
                qs, big, k=10, item_id="vec_id", metric="l2"
            ).count()
        )
        row["codegen"] = timed(
            lambda: exact_knn(qs, big, k=10, item_id="vec_id").count()
        )

        bsums, bn = bq_train(big, item_vec="embedding", dim=64)
        bcodes = bq_encode(big, bsums, bn, item_id="vec_id").persist()
        bcodes.count()  # untimed build
        row["bq_flat"] = timed(
            lambda: bq_search_rerank(
                qs, big, bsums, bn, k=10, shortlist=100, item_id="vec_id",
                encoded=bcodes,
            ).count()
        )
        bcodes.unpersist()

        root = tempfile.mkdtemp(prefix="crossover_")
        try:
            idx_dir = os.path.join(root, "mtlsh")
            write_mt_lsh_index(
                big.select("vec_id", "embedding"), idx_dir, item_id="vec_id"
            )
            row["mtlsh_pruned"] = timed(
                lambda: mt_lsh_ann_pruned(
                    qs, spark, idx_dir, big, k=10, n_probe_buckets=256,
                    item_id="vec_id", item_vec="embedding",
                ).count()
            )

            n_cells = 64 if n <= 200_000 else 256
            cents = kmeans_centroids(big, n_cells=n_cells, sample_fraction=0.1)
            corpus_path = os.path.join(root, "ivf_corpus")
            codes_path = os.path.join(root, "ivfbq_codes")
            write_ivf_corpus(ivf_assign(big, cents), corpus_path)
            write_ivfbq_codes(
                spark.read.parquet(corpus_path), bsums, bn, codes_path,
                item_id="vec_id",
            )
            row["ivfbq"] = timed(
                lambda: ivfbq_search(
                    qs, spark, codes_path, corpus_path, cents, bsums, bn,
                    k=10, n_probe=4, shortlist=100, item_id="vec_id",
                ).count()
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)

        big.unpersist()
        results[n] = row
        print(json.dumps({"n_vectors": n, "sec": row}), flush=True)

    # markdown table for BENCH_NOTES.md
    kernels = ["blas", "codegen", "bq_flat", "mtlsh_pruned", "ivfbq"]
    print("\n| n_vectors | " + " | ".join(kernels) + " |")
    print("|---" * (len(kernels) + 1) + "|")
    for n, row in sorted(results.items()):
        print(
            f"| {n:,} | "
            + " | ".join(f"{row[k]:.2f} s" for k in kernels)
            + " |"
        )


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [100_000, 1_000_000])
