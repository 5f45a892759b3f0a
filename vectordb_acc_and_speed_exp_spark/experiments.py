"""The reference's three entry points (SURVEY.md §3), Spark-first.

EP1 ``build_corpus``  — ingestion: pdf dir → pages → filter/sanitize →
                        embed → snapshot-partitioned parquet
                        (create_collections.py main, CC:476-514)
EP2 ``speed_experiment`` — per-(snapshot × query) search latency with
                        warm-up + repeated timed runs
                        (chromadb_speed_experiment.py main, SPD:641-711)
EP3 ``recall_experiment`` — ANN vs exact-oracle recall@k per snapshot
                        (chromadb_acc_experiment.py main, ACC:850-909)

The key Spark deviation (SURVEY.md §3 tail note): instead of one driver
loop per (collection × query × run) issuing single-row searches, each
measured unit batches the WHOLE query set in one job; per-query cost is
amortized (BASELINE.md's matched-scale comparison note). Snapshot sweeps
reuse one cached corpus scan rather than 56 materialized collection copies.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table
from .operators.ann import lsh_ann
from .operators.knn import exact_knn
from .operators.recall import recall_at_k
from .operators.snapshots import snapshot_sizes
from .plans.bench_harness import RunStats, save_results_csv, save_results_json


def build_corpus(
    spark: SparkSession,
    pdf_dir: str,
    out_path: str,
    embed_dim: int = 64,
    snapshot_step: int = 1000,
    model_path: str | None = None,
) -> DataFrame:
    """EP1: binaryFile scan → mapInPandas page extraction → filters →
    pandas_udf embedding → snapshot-partitioned parquet."""
    from .operators.embedding import embed_documents
    from .sources.checkpoint import write_documents
    from .sources.pdf import extract_pages, page_records, scan_pdf_dir

    pages = page_records(extract_pages(scan_pdf_dir(spark, pdf_dir)))
    embedded = embed_documents(pages, text_col="text", dim=embed_dim, model_path=model_path)
    write_documents(embedded, out_path, snapshot_step=snapshot_step)
    return spark.read.parquet(out_path)


def _query_set(spark: SparkSession, sf_dir: str, n: int = 5) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def speed_experiment(
    spark: SparkSession,
    sf_dir: str,
    step: int = 500,
    k: int = 5,
    num_runs: int = 5,
    out_prefix: str | None = None,
) -> list[RunStats]:
    """EP2: for each cumulative snapshot (vec_id < size — the embeddings
    table's monotonic id is its page_seq), run the batched exact top-k with
    one warm-up and ``num_runs`` timed repetitions (B1/B2), rolled up
    mean/median/σ (A1). Writes results.json + results_summary.csv
    (S9/S10) when ``out_prefix`` is given."""
    emb = load_table(spark, sf_dir, "embeddings").cache()
    total = emb.count()
    queries = _query_set(spark, sf_dir)
    # phase split (B3, chromadb_speed_experiment.py:469-481): time the query
    # encode stage separately from search — here a one-off on the (tiny)
    # query set with the pluggable encoder, reported as meta
    from .operators.embedding import embed_documents

    qtexts = spark.createDataFrame(
        [(i, f"query {i}") for i in range(5)], "query_id int, text string"
    )
    embed_documents(qtexts, text_col="text", dim=64).count()  # warm
    t0 = time.perf_counter()
    embed_documents(qtexts, text_col="text", dim=64).count()
    embed_sec = time.perf_counter() - t0

    results = []
    for size in snapshot_sizes(total, step):
        snap = emb.filter(F.col("vec_id") < size)
        stats = RunStats(name=f"snapshot_{size:06d}")
        res = exact_knn(queries, snap, k=k, item_id="vec_id")
        stats.n_rows = res.count()  # warm-up (B1)
        for _ in range(num_runs):
            t0 = time.perf_counter()
            exact_knn(queries, snap, k=k, item_id="vec_id").count()
            stats.runs_sec.append(time.perf_counter() - t0)
        results.append(stats)
    if out_prefix:
        save_results_json(
            results, out_prefix + "_results.json",
            meta={
                "sf_dir": sf_dir, "k": k, "num_runs": num_runs, "step": step,
                "query_embed_sec_batch5": round(embed_sec, 4),
            },
        )
        save_results_csv(results, out_prefix + "_summary.csv")
    emb.unpersist()
    return results


def recall_experiment(
    spark: SparkSession,
    sf_dir: str,
    step: int = 500,
    k: int = 10,
    out_prefix: str | None = None,
) -> DataFrame:
    """EP3: per snapshot, exact brute-force ground truth vs LSH-ANN, joined
    into per-query recall@5/@10 and rolled up (A3). Returns the metrics
    DataFrame (snapshot_size, mean_recall_5, mean_recall_10)."""
    emb = load_table(spark, sf_dir, "embeddings").cache()
    total = emb.count()
    queries = _query_set(spark, sf_dir)
    rows = []
    for size in snapshot_sizes(total, step):
        snap = emb.filter(F.col("vec_id") < size)
        gt = exact_knn(queries, snap, k=k, item_id="vec_id").cache()
        ann = lsh_ann(queries, snap, k=k, n_probe_bits=3, item_id="vec_id").cache()
        r5 = recall_at_k(gt, ann, k=5).agg(F.avg("recall")).first()[0]
        r10 = recall_at_k(gt, ann, k=min(10, k)).agg(F.avg("recall")).first()[0]
        rows.append((size, float(r5 or 0.0), float(r10 or 0.0)))
        gt.unpersist()
        ann.unpersist()
    out = spark.createDataFrame(
        rows, "snapshot_size long, mean_recall_5 double, mean_recall_10 double"
    )
    if out_prefix:
        out.toPandas().to_csv(out_prefix + "_recall_summary.csv", index=False)
        out.toPandas().to_json(out_prefix + "_recall_results.json", orient="records")
    emb.unpersist()
    return out


def curation_experiment(
    spark: SparkSession,
    sf_dir: str,
    pack_budget: int = 2048,
    out_prefix: str | None = None,
) -> DataFrame:
    """EP4 (extension beyond the reference): the training-data curation
    funnel end-to-end — raw → quality gate → near-dup removal → hash
    split → sequence packing — with per-stage doc/token counts and
    wall-clock. Every stage is a registered, DuckDB-oracled query; this
    runner just sequences them and persists the funnel as an artifact
    (JSON + CSV + SVG), the way EP2/EP3 persist theirs."""
    from .queries import load_all

    reg = load_all()
    rows: list[tuple[str, int, int, float]] = []

    t = time.time()
    quality = reg["text_quality"].fn(spark, sf_dir).cache()
    raw = quality.agg(
        F.count(F.lit(1)), F.sum("n_tokens")
    ).first()
    rows.append(("raw", int(raw[0]), int(raw[1]), round(time.time() - t, 3)))

    t = time.time()
    passed = quality.filter(F.col("is_quality") == 1).cache()
    qc = passed.agg(F.count(F.lit(1)), F.sum("n_tokens")).first()
    rows.append(("quality", int(qc[0]), int(qc[1]), round(time.time() - t, 3)))

    t = time.time()
    non_canonical = (
        reg["dedup_clusters"].fn(spark, sf_dir)
        .filter(F.col("is_canonical") == 0)
        .select("doc_id")
    )
    curated = passed.join(non_canonical, "doc_id", "left_anti").cache()
    cc = curated.agg(F.count(F.lit(1)), F.sum("n_tokens")).first()
    rows.append(("dedup", int(cc[0]), int(cc[1]), round(time.time() - t, 3)))

    # hash split of the CURATED set (same pure-hash rule as corpus_split)
    from .functions.hashing import portable_hash64_seeded
    from .queries.curation import _SEED

    t = time.time()
    bucket = portable_hash64_seeded(F.col("doc_id").cast("string"), _SEED) % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    split_rows = (
        curated.withColumn("split", split)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok"))
        .collect()
    )
    sec = round(time.time() - t, 3)
    for r in sorted(split_rows, key=lambda r: r.split):
        rows.append((f"split:{r.split}", int(r.n), int(r.tok), sec))

    # pack the curated train split into fixed token bins (per-source windows)
    t = time.time()
    from pyspark.sql import Window

    train = curated.withColumn("split", split).filter(F.col("split") == "train")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        train.join(docs, "doc_id")
        .withColumn(
            "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .withColumn(
            "bin_id", F.floor(F.col("cum_before") / F.lit(pack_budget))
        )
        .groupBy("source", "bin_id")
        .agg(F.sum("n_tokens").alias("bin_tokens"))
    )
    pk = packed.agg(
        F.count(F.lit(1)), F.sum("bin_tokens")
    ).first()
    rows.append(
        (f"packed_bins(train,{pack_budget})", int(pk[0]), int(pk[1]),
         round(time.time() - t, 3))
    )

    out = spark.createDataFrame(
        rows, "stage string, n_docs long, n_tokens long, sec double"
    )
    if out_prefix:
        pdf = out.toPandas()
        pdf.to_csv(out_prefix + "_funnel.csv", index=False)
        pdf.to_json(out_prefix + "_funnel.json", orient="records")
        from .plans.svgplot import bar_chart

        funnel = [r for r in rows if not r[0].startswith(("split:", "packed"))]
        bar_chart(
            [r[0] for r in funnel],
            {"docs": [float(r[1]) for r in funnel],
             "tokens/100": [r[2] / 100.0 for r in funnel]},
            out_prefix + "_funnel.svg",
            title=f"Curation funnel ({sf_dir.rsplit('/', 1)[-1]})",
            ylabel="count",
        )
    quality.unpersist()
    passed.unpersist()
    curated.unpersist()
    return out


def plot_speed_charts(
    results: list[RunStats], out_dir: str, embed_sec: float = 0.0
) -> list[str]:
    """S11 speed charts, mirroring the reference's
    search_speed_by_pages.png (search ms + total ms vs page count,
    SPD:540-569) and search_speed_by_collection.png (per-collection mean,
    SPD:571-588). Emitted as BOTH formats: PNG from the dependency-free
    rasterizer (plans/pngplot — bitmap parity with the reference's
    artifact set; matplotlib is not importable here) and SVG
    (plans/svgplot)."""
    import os

    from .plans import pngplot, svgplot

    os.makedirs(out_dir, exist_ok=True)
    sizes = [int(r.name.rsplit("_", 1)[-1]) for r in results]
    means = [r.mean * 1000 for r in results]
    totals = [m + embed_sec * 1000 for m in means]
    line_args = dict(
        series={"search (batched top-k)": list(zip(sizes, means)),
                "total (embed + search)": list(zip(sizes, totals))},
        title="search latency vs corpus size (5-query batch)",
        xlabel="corpus size (vectors)", ylabel="mean latency (ms)",
    )
    bar_args = dict(
        categories=[r.name.rsplit("_", 1)[-1].lstrip("0") for r in results],
        series={"mean ms": means, "median ms": [r.median * 1000 for r in results]},
        title="search latency by snapshot collection",
        xlabel="collection (vectors)", ylabel="latency (ms)",
    )
    p1 = pngplot.line_chart(
        path=os.path.join(out_dir, "search_speed_by_pages.png"), **line_args
    )
    svgplot.line_chart(
        path=os.path.join(out_dir, "search_speed_by_pages.svg"), **line_args
    )
    p2 = pngplot.bar_chart(
        path=os.path.join(out_dir, "search_speed_by_collection.png"), **bar_args
    )
    svgplot.bar_chart(
        path=os.path.join(out_dir, "search_speed_by_collection.svg"), **bar_args
    )
    return [p1, p2]


def plot_recall_charts(
    rows: list[tuple[int, float, float]], out_dir: str
) -> list[str]:
    """S11 recall charts, mirroring the reference's recall_by_pages.png
    (R@5 and R@10 vs page count, ACC:695-723) and recall_by_collection.png
    (grouped bars per collection, ACC:725-753), emitted as both PNG
    (plans/pngplot) and SVG (plans/svgplot).
    ``rows`` = [(snapshot_size, mean_recall_5, mean_recall_10), ...]."""
    import os

    from .plans import pngplot, svgplot

    os.makedirs(out_dir, exist_ok=True)
    line_args = dict(
        series={"recall@5": [(n, r5) for n, r5, _ in rows],
                "recall@10": [(n, r10) for n, _, r10 in rows]},
        title="ANN recall vs corpus size (exact oracle ground truth)",
        xlabel="corpus size (vectors)", ylabel="mean recall@k",
        y_range=(0.0, 1.05),
    )
    bar_args = dict(
        categories=[str(n) for n, _, _ in rows],
        series={"recall@5": [r5 for _, r5, _ in rows],
                "recall@10": [r10 for _, _, r10 in rows]},
        title="recall@k by snapshot collection (LSH-ANN vs brute force)",
        xlabel="collection (vectors)", ylabel="recall",
    )
    p1 = pngplot.line_chart(
        path=os.path.join(out_dir, "recall_by_pages.png"), **line_args
    )
    svgplot.line_chart(
        path=os.path.join(out_dir, "recall_by_pages.svg"), **line_args
    )
    p2 = pngplot.bar_chart(
        path=os.path.join(out_dir, "recall_by_collection.png"), **bar_args
    )
    svgplot.bar_chart(
        path=os.path.join(out_dir, "recall_by_collection.svg"), **bar_args
    )
    return [p1, p2]


def main(argv: list[str]) -> int:
    """CLI mode switch (reference B5, chromadb_acc_experiment.py:912-921):
    ``create`` / ``speed`` / ``recall``."""
    import argparse

    from .session import get_spark

    p = argparse.ArgumentParser(prog="vectordb_acc_and_speed_exp_spark")
    p.add_argument("mode", choices=["create", "speed", "recall", "curate"])
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--pdf-dir")
    p.add_argument("--out", default="./experiment_out")
    p.add_argument("--step", type=int, default=500)
    p.add_argument("--k", type=int, default=None)
    p.add_argument("--num-runs", type=int, default=5)
    args = p.parse_args(argv)

    spark = get_spark("experiments")
    spark.sparkContext.setLogLevel("ERROR")
    if args.mode == "create":
        if not args.pdf_dir:
            p.error("create mode requires --pdf-dir")
        df = build_corpus(spark, args.pdf_dir, args.out)
        print(f"built corpus: {df.count()} pages at {args.out}")
    elif args.mode == "speed":
        import json
        import os

        results = speed_experiment(
            spark, args.sf_dir, step=args.step, k=args.k or 5,
            num_runs=args.num_runs, out_prefix=args.out,
        )
        with open(args.out + "_results.json") as f:
            embed_sec = json.load(f)["meta"]["query_embed_sec_batch5"]
        charts = plot_speed_charts(
            results, os.path.dirname(args.out) or ".", embed_sec=embed_sec
        )
        print("charts:", ", ".join(charts))
        for r in results:
            print(f"{r.name}: mean={r.mean*1000:.1f}ms median={r.median*1000:.1f}ms")
    elif args.mode == "curate":
        out = curation_experiment(spark, args.sf_dir, out_prefix=args.out)
        out.show(100, False)
    else:
        import os

        out = recall_experiment(
            spark, args.sf_dir, step=args.step, k=args.k or 10, out_prefix=args.out
        )
        rows = [
            (r.snapshot_size, r.mean_recall_5, r.mean_recall_10)
            for r in out.orderBy("snapshot_size").collect()
        ]
        charts = plot_recall_charts(rows, os.path.dirname(args.out) or ".")
        print("charts:", ", ".join(charts))
        out.show(100, False)
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys

    raise SystemExit(main(sys.argv[1:]))
