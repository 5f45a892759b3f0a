"""Write-path economics of the incremental mt-LSH signature index
(operators/mtlsh.py::mt_lsh_signatures_upsert — VERDICT r09 #1): what does
absorbing a fixed-size batch cost as the INDEXED corpus grows, versus the
full rebuild every add()/upsert() used to trigger?

Setup: the sf0.1 embeddings table replicated to three corpus sizes (100k /
400k / 800k vectors — CORPUS_SIZES below — deterministic id offsets). For each size the index is
built once (untimed), then a FIXED 2,000-vector batch is appended with
``mt_lsh_signatures_upsert`` (frozen planes from the meta sidecar) and,
for comparison, the whole corpus+batch is re-signed with
``write_mt_lsh_index`` — exactly what the pre-round-10 facade did lazily
after every write.

The structural claim this quantifies: incremental cost is a function of
the BATCH (signing 2k vectors with frozen planes + appending L table
partitions — flat in corpus size); rebuild cost is a function of the
CORPUS (re-signing n vectors), so the ratio grows ~linearly with n and is
unbounded at 100 TB. ``compact_mt_lsh_index`` (the periodic maintenance
job that drops superseded gens and restores within-partition bucket
order) is timed separately — O(index), amortized over many batches, never
on a serve path.

Correctness is NOT re-argued here: tests/test_mtlsh.py pins incremental ==
full-rebuild results bit-for-bit at any probe budget, and the facade
end-to-end add/upsert/compaction/staleness paths.

Usage: python tools/mtlsh_maint_study.py [reps]
Prints a markdown table for EP3_MTLSH.md.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_SIZES = [100_000, 400_000, 800_000]
BATCH = 2_000


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.mtlsh import (
        compact_mt_lsh_index,
        mt_lsh_signatures_upsert,
        write_mt_lsh_index,
    )
    from vectordb_acc_and_speed_exp_spark.session import get_spark

    spark = get_spark("mtlsh_maint_study", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    emb = load_table(spark, sf, "embeddings")

    def replicated(n: int):
        """n vectors by deterministic replication of the 2k-row table:
        item_id = vec_id*k + r is dense and unique in [0, 2000k)."""
        k = (n + 1999) // 2000
        return (
            emb.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
            .select(
                (F.col("vec_id") * k + F.col("r")).alias("item_id"),
                "embedding",
            )
            .filter(F.col("item_id") < n)
        )

    rows = []
    for n in CORPUS_SIZES:
        base = replicated(n).cache()
        base.count()
        # the appended batch: ids disjoint from the base corpus
        batch = (
            emb.limit(BATCH)
            .select(
                (F.col("vec_id") + 10_000_000).alias("item_id"), "embedding"
            )
            .cache()
        )
        batch.count()
        root = tempfile.mkdtemp(prefix="mtlsh_maint_")
        idx = os.path.join(root, "idx")
        write_mt_lsh_index(base, idx, item_id="item_id")  # untimed build

        inc, reb, comp = [], [], []
        for _ in range(reps):
            snap = os.path.join(root, "snap")
            shutil.copytree(idx, snap)
            t0 = time.perf_counter()
            mt_lsh_signatures_upsert(spark, idx, batch, item_id="item_id")
            inc.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            n_dirs = compact_mt_lsh_index(spark, idx)
            comp.append(time.perf_counter() - t0)
            shutil.rmtree(idx)
            os.rename(snap, idx)

            rb = os.path.join(root, "rebuild")
            t0 = time.perf_counter()
            write_mt_lsh_index(
                base.unionByName(batch), rb, item_id="item_id"
            )
            reb.append(time.perf_counter() - t0)
            shutil.rmtree(rb)
        shutil.rmtree(root, ignore_errors=True)
        base.unpersist()
        batch.unpersist()
        mi, mr, mc = (
            statistics.median(inc),
            statistics.median(reb),
            statistics.median(comp),
        )
        rows.append((n, mi, mr, mr / mi, mc, n_dirs))
        print(
            f"[study] n={n}: incremental {mi:.2f}s rebuild {mr:.2f}s "
            f"(x{mr / mi:.1f}) compact {mc:.2f}s ({n_dirs} tables)",
            flush=True,
        )

    print()
    print(
        "| corpus | upsert(2k) s | rebuild s | rebuild/upsert | "
        "compact s |"
    )
    print("|---|---|---|---|---|")
    for n, mi, mr, ratio, mc, _ in rows:
        print(
            f"| {n:,} | {mi:.2f} | {mr:.2f} | {ratio:.1f}x | {mc:.2f} |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
