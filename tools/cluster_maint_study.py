"""Maintenance economics of the incremental cluster artifact
(operators/dedup_clusters.py): what does folding a batch of near-dup
pairs cost as the ACCUMULATED pair graph grows, versus the rebuild the
batch pipeline would do?

Setup: a synthetic pair graph of star-shaped clusters (center c, members
c+1..c+S-1 — the shape real near-dup groups take: shallow, small), built
up to N accumulated pairs as the pre-existing artifact. The measured
batch holds half NEW stars and half MERGE edges joining adjacent
existing clusters — merges are the expensive path (they relabel whole
clusters and rewrite their buckets), so the batch is adversarial, not
cherry-picked.

Measured, median of ``reps`` (pre-state restored from a copy between
reps):
- **incremental**: clusters_upsert(batch) — label lookup pruned to the
  batch's nbuckets, CC on the contracted cluster graph (<= 2x batch
  pairs), touched-bucket rewrite;
- **rebuild**: rebuild_clusters() over the N+batch log — what
  _get_or_build_clusters does today on every fingerprint change, and
  what the incremental path replaces.

The structural claim this quantifies: incremental cost is a function of
the BATCH (plus merged clusters' sizes); rebuild cost is a function of
the ACCUMULATED graph. At 100 TB the accumulated graph is billions of
edges and the ratio is unbounded; the table shows the trend is already
visible at toy scale, and where scheduling overhead (the ~20 small jobs
an upsert issues) still masks it.

Usage: python tools/cluster_maint_study.py [reps]
Prints a markdown table for EP11_CLUSTER_MAINT.md.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/spark_graft_cluster_maint"
STAR = 5          # members per cluster -> STAR-1 pairs per star
BATCH_STARS = 400          # new clusters per measured batch
BATCH_MERGES = 200         # merge edges per measured batch
ACCUMULATED = [20_000, 100_000, 400_000, 1_600_000]


def _star_pairs(spark, n_stars: int, start_center: int, stride: int = 1000):
    """(id_a, id_b) pairs of n_stars star clusters: center k*stride,
    members +1..+STAR-1. id_a < id_b by construction."""
    from pyspark.sql import functions as F

    return (
        spark.range(n_stars)
        .select((F.col("id") * stride + start_center).alias("c"))
        .select(
            "c",
            F.explode(
                F.sequence(F.lit(1), F.lit(STAR - 1))
            ).alias("off"),
        )
        .select(
            F.col("c").alias("id_a"), (F.col("c") + F.col("off")).alias("id_b")
        )
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from vectordb_acc_and_speed_exp_spark.operators.dedup_clusters import (
        clusters_upsert,
        rebuild_clusters,
        serve_clusters,
    )
    from vectordb_acc_and_speed_exp_spark.session import get_spark

    spark = get_spark("cluster-maint-study", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(ROOT, ignore_errors=True)

    pairs_per_star = STAR - 1
    print(
        f"| accumulated pairs | batch pairs | incremental s | rebuild s "
        f"| rebuild/incremental |"
    )
    print("|---|---|---|---|---|")
    for n_acc in ACCUMULATED:
        n_stars = n_acc // pairs_per_star
        base = os.path.join(ROOT, f"acc{n_acc}")
        clusters_upsert(
            spark, base, _star_pairs(spark, n_stars, 0), batch_key="seed"
        )  # first build: rebuild path over the whole synthetic log

        # the measured batch: new stars past the existing id range, plus
        # merge edges chaining adjacent existing clusters pairwise
        new_start = n_stars * 1000 + 500
        merges = (
            spark.range(BATCH_MERGES)
            .select((F.col("id") * 2 * 1000).alias("id_a"),
                    ((F.col("id") * 2 + 1) * 1000).alias("id_b"))
        )
        batch = _star_pairs(spark, BATCH_STARS, new_start).unionByName(merges)
        n_batch = batch.count()

        inc_t, reb_t = [], []
        for r in range(reps):
            work = os.path.join(ROOT, f"acc{n_acc}_rep{r}")
            shutil.copytree(base, work)
            t0 = time.perf_counter()
            out = clusters_upsert(spark, work, batch, batch_key="m")
            inc_t.append(time.perf_counter() - t0)
            assert not out["rebuilt"], "incremental path not taken"
            t0 = time.perf_counter()
            rebuild_clusters(spark, work)
            reb_t.append(time.perf_counter() - t0)
            if r == 0:
                # the two paths must agree — the study is only meaningful
                # if it measures two implementations of the same answer
                inc = os.path.join(ROOT, f"acc{n_acc}_check")
                shutil.copytree(base, inc)
                clusters_upsert(spark, inc, batch, batch_key="m")
                a = sorted(map(tuple, serve_clusters(spark, inc).collect()))
                b = sorted(map(tuple, serve_clusters(spark, work).collect()))
                assert a == b, "incremental != rebuild"
        i, b = statistics.median(inc_t), statistics.median(reb_t)
        print(
            f"| {n_acc:,} | {n_batch:,} | {i:.2f} | {b:.2f} | {b / i:.2f}x |"
        )
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
