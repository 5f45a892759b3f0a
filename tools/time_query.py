"""Time individual registry queries at an SF dir, with repetitions.

Usage:
    python tools/time_query.py jaccard_prefix_pairs [more ...] [--reps 3]
        [--sf /root/testdata/sf0.1]

Prints per-rep seconds plus min/median — the same min/median convention
BENCH_DETAIL carries, so numbers are directly comparable.  Cache is
cleared between reps exactly like bench.py does between entries.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from vectordb_acc_and_speed_exp_spark.queries import load_all
    from vectordb_acc_and_speed_exp_spark.session import get_spark

    spark = get_spark("time_query", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # one untimed warm query for JVM + Python-worker spin-up
    registry["knn_exact_l2"].fn(spark, args.sf).count()
    spark.catalog.clearCache()

    for name in args.names:
        fn = registry[name].fn
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            n = fn(spark, args.sf).count()
            reps.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        print(
            f"{name}: rows={n} reps={reps} min={min(reps):.3f} "
            f"median={statistics.median(reps):.3f}"
        )


if __name__ == "__main__":
    main()
