"""Measure what optimize_layout (io/catalog.py) buys a metadata-filtered
scan: replicate documents@sf0.1 to ~1M rows, write the same data (a) in
an unclustered round-robin layout and (b) range-clustered on
(lang, source) with the SAME file count, then compare

- **bytes admitted by footer stats** for a ``lang = 'de'`` predicate —
  the sum of sizes of files whose [min, max] can contain the value.
  This is the deterministic 100 TB quantity: on object storage it is the
  bytes a cold reader must fetch (and the GET requests it must issue);
  the page cache on this box hides it from wall-clock.
- **row groups admitted** — Spark's reader prunes at row-group
  granularity inside admitted files; same footer arithmetic one level
  down.
- **warm wall-clock** of the filtered rollup on each layout (median of
  5) — reported honestly as a warm-cache lower bound on the win.

Usage: python tools/layout_study.py [replication_factor] [--unique-text]
Appends nothing; prints a markdown table for EP10_LAYOUT.md.

``--unique-text`` suffixes every replica's text with its replica id so no
two rows share a string. Without it the 200x-replicated corpus lets the
clustered layout's small-dictionary row groups compress ~17x better than
the shuffled one (a real locality effect, but amplified by the synthetic
replication); with it the byte totals of the two layouts match and the
admitted-bytes column isolates pure footer-stat pruning.
"""

from __future__ import annotations

import glob
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/spark_graft_layout_study"
PROBE_LANG = "de"


def footer_admission(path: str, column: str, value) -> tuple[int, int, int, int, int, int]:
    """(files_total, files_admitted, bytes_total, bytes_admitted,
    rowgroups_total, rowgroups_admitted) for an equality predicate,
    straight from parquet footers — engine-independent arithmetic."""
    import pyarrow.parquet as pq

    ft = fa = bt = ba = gt = ga = 0
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        size = os.path.getsize(f)
        ft += 1
        bt += size
        admitted_groups = 0
        for rg in range(md.num_row_groups):
            gt += 1
            st = md.row_group(rg).column(idx).statistics
            if st.min <= value <= st.max:
                ga += 1
                admitted_groups += 1
        if admitted_groups:
            fa += 1
            ba += size
    return ft, fa, bt, ba, gt, ga


def timed(df_thunk, reps: int = 5) -> float:
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df_thunk().collect()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rep = int(args[0]) if args else 200
    unique_text = "--unique-text" in sys.argv

    from pyspark.sql import functions as F

    from vectordb_acc_and_speed_exp_spark.io import load_table, optimize_layout
    from vectordb_acc_and_speed_exp_spark.session import get_spark

    spark = get_spark("layout-study", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)
    os.makedirs(ROOT)
    flat = os.path.join(ROOT, "unclustered")
    clus = os.path.join(ROOT, "clustered")

    docs = load_table(spark, SF_DIR, "documents")
    big = (
        docs.crossJoin(spark.range(rep).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") * rep + F.col("rep"))
    )
    if unique_text:
        big = big.withColumn("text", F.concat("text", F.lit(" #"), F.col("rep")))
    big = big.drop("rep")
    n = big.count()
    # round-robin repartition: every output file spans every lang — the
    # layout append-heavy ingestion actually produces
    big.repartition(32).write.mode("overwrite").parquet(flat)
    total = sum(
        os.path.getsize(f) for f in glob.glob(flat + "/*.parquet")
    )
    shutil.copytree(flat, clus)
    optimize_layout(
        spark, clus, ["lang", "source"],
        target_bytes_per_file=max(1, total // 32),
    )

    rows = []
    for label, path in (("unclustered", flat), ("clustered", clus)):
        ft, fa, bt, ba, gt, ga = footer_admission(path, "lang", PROBE_LANG)

        def q(p=path):
            return (
                spark.read.parquet(p)
                .filter(F.col("lang") == PROBE_LANG)
                .groupBy("source")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c"))
            )

        q().collect()  # warm
        sec = timed(q)
        rows.append((label, ft, fa, bt, ba, gt, ga, sec))

    print(f"\ncorpus: {n:,} rows replicated x{rep} from {SF_DIR}, "
          f"predicate lang = '{PROBE_LANG}'\n")
    print("| layout | files | admitted | bytes | admitted bytes | "
          "row groups | admitted | warm median s |")
    print("|---|---|---|---|---|---|---|---|")
    for label, ft, fa, bt, ba, gt, ga, sec in rows:
        print(
            f"| {label} | {ft} | {fa} | {bt/1e6:.1f} MB | {ba/1e6:.1f} MB "
            f"({100*ba/bt:.0f}%) | {gt} | {ga} | {sec:.3f} |"
        )
    shutil.rmtree(ROOT)


if __name__ == "__main__":
    main()
