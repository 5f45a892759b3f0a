"""Benchmark entry point (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Query set: the flagship vector surface (exact kNN both metrics, LSH ANN,
recall eval), the dedup family, text analysis, and the relational/event
analytics — the same operators the correctness gate checks, at 10x the data.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "knn_exact_l2",
    "knn_exact_cosine",
    "recall_cosine_vs_l2",
    "ann_lsh_topk",
    # embedding_neardup_bucketed is gate-checked (equality proof vs brute
    # force) but not benched: at threshold 0.4 on an isotropic corpus ~78%
    # of ALL pairs collide in >=1 of the 96 tables, so the bucketed path
    # can't prune — its value is the driver-free shape (no n x dim matrix
    # on the driver) and high-threshold dedup, not low-threshold speed.
    "mt_lsh_ann_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "graph_ann_topk",
    "graph_ivf_ann_topk",
    "ann_ivfpq_topk",
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_customer",
    "events_hourly",
    "events_sessions",
    "text_quality",
    "lang_profile",
    "dedup_exact",
    "minhash_lsh_dup_pairs",
    "dedup_clusters",
    "curated_corpus",
    "purchase_click_asof",
    "purchase_window_surge",
    "sequence_packing",
    "corpus_split",
    "simhash",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "snapshot_stats",
    "knn_snapshot_sweep",
    "value_stats_by_type",
    "sales_cube",
    "purchase_attribution",
    "events_json_props",
    "label_centroids",
    "embed_documents_fake",
    "char_ngram_stats",
    "repetition_profile",
    "pii_scrub",
    "decontaminate",
    "token_importance_weights",
    "domain_rebalanced_sample",
    "embedding_dim_stats",
    "ann_sq_topk",
    "ann_ivfsq_topk",
    "mmr_rerank_topk",
    "knn_filtered_exact",
    "ann_ivf_filtered",
    "bm25_topk",
    "hybrid_rrf",
    "radius_search",
    "parent_doc_retrieval",
    "rerank_cross_encoder",
    "corpus_version_diff",
    "events_salted_join",
    "knn_graph",
    "events_hourly_anomalies",
    "shipping_priority",
    "top_event_paths",
    "embedding_dedup_clusters",
    # round-4 additions (appended — earlier entries keep their order so
    # round-over-round deltas stay mechanical)
    "eval_contamination_cosine",
    "embed_documents_md5",
    "ann_bq_topk",
    "maxsim_multivector_topk",
    "paragraph_dedup",
    "duplicated_ngram_spans",
    "gopher_quality_filter",
    "ann_ivfbq_topk",
    "jaccard_prefix_pairs",
    # round-5 additions (appended — earlier entries keep their order)
    "large_volume_orders",
    "supplier_part_variety",
    "nation_pair_trade",
    "local_supplier_volume",
    "client_facade_knn",
    "subword_tokenize_counts",
    "streaming_heavy_hitters",
    "frame_sample_manifest",
    "bpe_top_merges",
    "retrieval_eval_metrics",
    "rm3_expanded_search",
    # round-7 additions (appended — earlier entries keep their order)
    "streaming_quantiles",
    "streaming_distinct_users",
    "filtered_auto_exact_branch",
    "layout_clustered_scan",
    # incremental cluster maintenance: timed entry IS the maintenance cost
    # (3-wave fold of the verified pair set into a fresh artifact); the
    # pair MINING is amortized by the dedup_clusters warm-up above
    "dedup_clusters_incremental",
    # round-8 additions (appended — earlier entries keep their order)
    # metadata-filtered BM25 from the postings artifact: survivor
    # semi-join + eligible-set stats via the doclens sidecar (no text scan)
    "bm25_filtered_topk",
    # round-9 additions (appended — earlier entries keep their order)
    # flat BQ at the MEASURED serving shortlist (ann_bq_topk pins 100 for
    # its hash oracle; this is the recall-gated serving twin)
    "ann_bq_tuned",
]


def steal_probe() -> float:
    """Seconds to run a fixed, deterministic, CPU-bound NumPy kernel
    (~0.3 s on a quiet box) — the steal reference (VERDICT r11 #1).

    The host VM suffers intermittent CPU steal that inflates WHOLE bench
    runs 20-45% while load-average stays near zero; steal common to every
    run of a close is invisible to cross-run comparisons (BENCH_NOTES
    round 11). This probe is interleaved between bench entries: its
    wall-clock on a quiet box is a committed constant
    (PROBE_BASELINE.json, tools/calibrate_probe.py), so
    ``probe_sec / baseline`` measures the box's slowdown DURING the
    adjacent entry, and ``raw * baseline / probe_sec`` is the entry's
    steal-normalized time — comparable across runs taken in different
    load windows.

    Kernel choice: argsort + cumsum over a fixed pseudo-random array —
    single-threaded in NumPy (no BLAS threading variance), branchy and
    memory-streaming like real query execution, deterministic input (a
    multiplicative bit-mix, no RNG state)."""
    import numpy as np

    n = 800_000
    a = (np.arange(n, dtype=np.uint64) * np.uint64(2654435761)) % np.uint64(
        1 << 32
    )
    x0 = a.astype(np.float64)
    # two IDENTICAL passes, each timed; report 2x the faster one: steal
    # only ever inflates a pass, so min-of-passes is the lower-variance
    # estimate of the box's current speed (quiet-box spread measured
    # ~±10% on single passes, ~±4% on min-of-two)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        order = np.argsort(x0, kind="stable")
        x = np.cumsum(x0[order]) % 1.0e9
        _sink = float(x[-1])  # fold to a scalar: no dead-code elimination
        best = min(best, time.perf_counter() - t0)
    return 2.0 * best


def read_probe_baseline(repo_dir: str) -> tuple[float | None, str]:
    """(baseline_sec, source). The committed quiet-box constant when
    PROBE_BASELINE.json exists; (None, "absent") otherwise — the caller
    falls back to the run's own minimum probe, which is blind to steal
    common to the whole run (exactly the documented hole the committed
    baseline exists to close)."""
    p = os.path.join(repo_dir, "PROBE_BASELINE.json")
    try:
        with open(p) as fh:
            return float(json.load(fh)["probe_sec"]), "PROBE_BASELINE.json"
    except (OSError, KeyError, ValueError, json.JSONDecodeError):
        return None, "absent"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from vectordb_acc_and_speed_exp_spark.queries import load_all
    from vectordb_acc_and_speed_exp_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=max(32, cpus))
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # Warm-up (reference B1), untimed: JVM/codegen path AND a pandas-UDF
    # query (Python worker + Arrow spin-up costs ~2 s once per session and
    # belongs to neither query), plus the IVF/PQ index builds so the
    # search-only entries time search, not a one-off build.
    registry["knn_exact_l2"].fn(spark, sf_dir).count()
    registry["ann_lsh_topk"].fn(spark, sf_dir).count()
    registry["ivf_build_stats"].fn(spark, sf_dir).count()
    # cluster-table build amortized like the index builds: the timed
    # dedup_clusters entry measures the serving path (artifact read);
    # the one-time mining cost is EP-documented (BENCH_NOTES round 4)
    registry["dedup_clusters"].fn(spark, sf_dir).count()
    registry["pq_build_stats"].fn(spark, sf_dir).count()
    registry["graph_build_stats"].fn(spark, sf_dir).count()
    registry["graph_ivf_ann_topk"].fn(spark, sf_dir).count()
    registry["ivfpq_build_stats"].fn(spark, sf_dir).count()
    # IVF-BQ build (cell-partitioned packed codes) amortized like the rest
    registry["ann_ivfbq_topk"].fn(spark, sf_dir).count()
    # lexical postings build (round-6 artifact) amortized like the rest:
    # the timed bm25/hybrid/rm3/eval entries measure the pruned serving
    # scans; the one-time tokenize+tf build is EP-documented (EP9)
    registry["bm25_topk"].fn(spark, sf_dir).count()
    # chunk-grained postings build (round-12: parent_doc_retrieval now
    # serves from it instead of tokenizing every chunk per execution)
    # amortized identically
    registry["parent_doc_retrieval"].fn(spark, sf_dir).count()
    # serving-budget calibration (round 9: budgets are measured, not
    # guessed) amortized like the index builds — one pass per (corpus,
    # family), persisted beside the artifacts; the timed entries then do
    # a dict lookup
    from vectordb_acc_and_speed_exp_spark.queries.pipeline import (
        _composed_serving,
        _flat_serving,
        _ivf_serving,
        _lsh_serving,
        _mtlsh_serving,
    )

    _ivf_serving(spark, sf_dir)
    _lsh_serving(spark, sf_dir)
    _mtlsh_serving(spark, sf_dir)
    for fam in ("pq", "sq", "bq"):
        _flat_serving(spark, sf_dir, fam)
    for fam in ("ivfpq", "ivfsq", "ivfbq"):
        _composed_serving(spark, sf_dir, fam)

    here = os.path.dirname(os.path.abspath(__file__))
    baseline, baseline_src = read_probe_baseline(here)
    steal_probe()  # untimed warm (page-cache/allocator effects)

    timings: dict[str, float] = {}
    probes: dict[str, float] = {}
    # each entry's steal estimate is the MIN of its two BRACKETING
    # probes (the probe after entry i doubles as the probe before entry
    # i+1 — zero extra cost): a single slow probe sample then taints
    # neither neighbor unless both its brackets are slow, which cuts
    # the quiet-box per-entry ratio tail without weakening the signal
    # (real steal windows span many entries and slow both brackets)
    prev_probe = steal_probe()
    for name in HEADLINE:
        fn = registry[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)
        # each entry is self-contained: drop its internal persists so 60+
        # queries' caches don't accumulate in the single local-mode heap
        # (clearing happens OUTSIDE the timed window)
        spark.catalog.clearCache()
        p = steal_probe()
        probes[name] = round(min(prev_probe, p), 4)
        prev_probe = p

    # Brute-force throughput at BASELINE-comparable corpus size: the
    # embeddings table replicated 50x (deterministic id offsets) -> ~100k
    # vectors; 5-query batch, top-10, both kernels. BASELINE.md's BF column
    # is 4014 ms/query at 58k x 768-dim single-node NumPy.
    import pyspark.sql.functions as F

    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn
    from vectordb_acc_and_speed_exp_spark.operators.simjoin import cosine_knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    big = (
        emb.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(49))))
        .select((F.col("vec_id") * 50 + F.col("r")).alias("vec_id"), "embedding")
        .cache()
    )
    big.count()
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cosine_knn_join(qs, big, k=10, item_id="vec_id", metric="l2").count()  # warm
    t0 = time.perf_counter()
    cosine_knn_join(qs, big, k=10, item_id="vec_id", metric="l2").count()
    timings["bf_replicated100k_5q_blas"] = round(time.perf_counter() - t0, 4)
    p = steal_probe()
    probes["bf_replicated100k_5q_blas"] = round(min(prev_probe, p), 4)
    prev_probe = p
    t0 = time.perf_counter()
    exact_knn(qs, big, k=10, item_id="vec_id").count()
    timings["bf_replicated100k_5q_codegen"] = round(time.perf_counter() - t0, 4)
    p = steal_probe()
    probes["bf_replicated100k_5q_codegen"] = round(min(prev_probe, p), 4)
    prev_probe = p

    # Compressed-scan twin at the same scale: 1-bit codes, codegen Hamming
    # shortlist + exact re-rank — the 32x-fewer-bytes answer to the same
    # 5-query batch (recall ~0.9 at 58k per EP5; exact work is BASELINE's
    # 4014 ms/query single-node).
    from vectordb_acc_and_speed_exp_spark.operators.bq import (
        bq_search_rerank,
        bq_train,
    )

    from vectordb_acc_and_speed_exp_spark.operators.bq import bq_encode

    bsums, bn = bq_train(big, item_vec="embedding", dim=64)
    # serving shape: the code table is a persisted per-corpus-version
    # artifact (16 B/row); encode is untimed like the other index builds
    bcodes = bq_encode(big, bsums, bn, item_id="vec_id").cache()
    bcodes.count()
    bq_search_rerank(
        qs, big, bsums, bn, k=10, shortlist=100, item_id="vec_id",
        encoded=bcodes,
    ).count()  # warm
    t0 = time.perf_counter()
    bq_search_rerank(
        qs, big, bsums, bn, k=10, shortlist=100, item_id="vec_id",
        encoded=bcodes,
    ).count()
    timings["bq_replicated100k_5q"] = round(time.perf_counter() - t0, 4)
    p = steal_probe()
    probes["bq_replicated100k_5q"] = round(min(prev_probe, p), 4)
    prev_probe = p
    bcodes.unpersist()

    # Disk-index serving path at the same 100k scale: write the multi-table
    # LSH index once (untimed build), then time the partition-pruned search
    # — the actual 100 TB query shape (ids-only index scan + candidate-only
    # vector re-rank).
    import shutil
    import tempfile

    from vectordb_acc_and_speed_exp_spark.operators.mtlsh import (
        mt_lsh_ann_pruned,
        write_mt_lsh_index,
    )

    idx_dir = tempfile.mkdtemp(prefix="bench_mtlsh_") + "/idx"
    write_mt_lsh_index(big.select("vec_id", "embedding"), idx_dir, item_id="vec_id")
    args = dict(k=10, n_probe_buckets=256, item_id="vec_id", item_vec="embedding")
    mt_lsh_ann_pruned(qs, spark, idx_dir, big, **args).count()  # warm
    t0 = time.perf_counter()
    mt_lsh_ann_pruned(qs, spark, idx_dir, big, **args).count()
    timings["mtlsh_pruned_100k_5q"] = round(time.perf_counter() - t0, 4)
    p = steal_probe()
    probes["mtlsh_pruned_100k_5q"] = round(min(prev_probe, p), 4)
    prev_probe = p
    shutil.rmtree(os.path.dirname(idx_dir), ignore_errors=True)
    big.unpersist()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Steal normalization (VERDICT r11 #1): with a committed quiet-box
    # baseline, each entry's raw time is divided by the slowdown the
    # adjacent probe measured — steal common to every run of a close
    # (invisible to cross-run comparisons) shows up here as
    # probe_ratio > 1 and is divided OUT of the normalized values.
    # Without the committed file, fall back to this run's own minimum
    # probe (weaker: blind to whole-run steal; "source" says which).
    if baseline is None and probes:
        baseline = min(probes.values())
        baseline_src = "run-min"
    ratios = {
        n: round(p / baseline, 4) for n, p in probes.items()
    } if baseline else {}
    normalized = {
        n: round(t / max(ratios.get(n, 1.0), 1e-9), 4)
        for n, t in timings.items()
    }
    import statistics

    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "probe": {
            "baseline_sec": round(baseline, 4) if baseline else None,
            "source": baseline_src,
            "per_entry_sec": probes,
            "per_entry_ratio": ratios,
            "median_ratio": (
                round(statistics.median(ratios.values()), 4)
                if ratios else None
            ),
        },
        "queries_normalized": normalized,
        "normalized_total": round(sum(normalized.values()), 4),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Self-contained artifact: the driver captures only a byte-bounded tail
    # of stdout, which head-truncated BENCH_r04's metric line (the first
    # three query entries were lost).  Write the full payload to
    # BENCH_DETAIL_r{N}.json alongside the printed line; round number =
    # next driver round, inferred the same way the registry rotation does.
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    # Round number: explicit SPARK_GRAFT_ROUND env wins (the unambiguous
    # path — set it when running by hand); fall back to counting
    # CORRECTNESS files, which is off by one depending on whether the
    # driver already wrote this round's file — so ALSO refresh a
    # fixed-name latest twin; consumers wanting "the most recent bench"
    # read that one unambiguously. (ADVICE round 5)
    env_round = os.environ.get("SPARK_GRAFT_ROUND", "")
    round_no = (
        int(env_round)
        if env_round.isdigit()
        else len(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))) + 1
    )
    detail = os.path.join(here, f"BENCH_DETAIL_r{round_no:02d}.json")
    try:
        with open(detail, "w") as fh:
            json.dump(payload, fh, indent=1)
        with open(os.path.join(here, "BENCH_DETAIL_latest.json"), "w") as fh:
            json.dump(payload, fh, indent=1)
    except OSError:
        pass  # read-only checkout: the printed line is still the contract
    # The driver records only a 2,000-char TAIL of stdout; a full 89-entry
    # queries map is ~2.4k chars, so BENCH_r04..r07 all recorded a
    # head-truncated metric line (parsed: null).  Print a line that is
    # guaranteed to fit: totals + a queries map filled in HEADLINE order
    # only while the serialized line stays under budget, plus a pointer at
    # the detail file holding every entry.  (VERDICT r07 #1.)
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": "sec",
        # the steal-normalized headline (VERDICT r11 #1): what a quiet
        # box would have measured, per the interleaved probe kernel
        "normalized_total": payload["normalized_total"],
        "probe_median_ratio": payload["probe"]["median_ratio"],
        "queries": {},
        "n_queries": len(timings),
        "detail": os.path.basename(detail),
        "sf": payload["sf"],
    }
    budget = 1800  # < 2000-char tail, with margin for driver framing
    for name, secs in timings.items():
        compact["queries"][name] = secs
        if len(json.dumps(compact)) > budget:
            del compact["queries"][name]
            break
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
