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

    # steal context (VERDICT r11 #1): bracket each rep with the bench's
    # CPU probe, priced against the committed quiet-box baseline, so an
    # adjudication number carries its own evidence of how contended the
    # box was — the same convention BENCH_DETAIL uses.
    from bench import read_probe_baseline, steal_probe

    baseline, src = read_probe_baseline(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    steal_probe()  # warm
    for name in args.names:
        fn = registry[name].fn
        reps, ratios = [], []
        prev_probe = steal_probe()
        for _ in range(args.reps):
            t0 = time.perf_counter()
            n = fn(spark, args.sf).count()
            reps.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
            p = steal_probe()
            if baseline:
                ratios.append(round(min(prev_probe, p) / baseline, 3))
            prev_probe = p
        norm = (
            [round(r / max(q, 1e-9), 4) for r, q in zip(reps, ratios)]
            if ratios else reps
        )
        print(
            f"{name}: rows={n} reps={reps} min={min(reps):.3f} "
            f"median={statistics.median(reps):.3f} "
            f"probe_ratios={ratios or 'n/a'} "
            f"norm_min={min(norm):.3f}"
        )


if __name__ == "__main__":
    main()
