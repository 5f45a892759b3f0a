"""EP3 at reference scale: the recall-vs-size degradation study.

The reference's defining result (chromadb_acc_experiment.py:566-665,
experiment_results/recall_results.json) sweeps 56 snapshot collections
from 1k to ~58k pages and measures HNSW recall@10 falling 1.00 -> ~0.70
under fixed index defaults. This module reproduces that axis at the same
corpus scale with the engine's ANN paths and records the sweep artifact
(JSON + CSV + chart) the same way (ACC:758-809).

Corpus: the testdata embeddings table (2k vectors at sf0.1)
deterministically expanded to 58k by jittered replication — copy ``r`` of
vector ``v`` is ``normalize(v̂ + lam * u(id, r))`` with ``u`` a seeded unit
normal, so every derived vector is rooted in the real table and the whole
expansion is reproducible from (seed, lam) alone. At ``lam = 1.5`` sibling
cosine is ~1/sqrt(1+lam²) ≈ 0.55, barely above the corpus' background max
pairwise cosine (~0.51): true neighbours are only slightly closer than
noise, the HARD regime for any ANN index (the reference's real-text
embeddings are far more clustered, i.e. easier).

Three configurations per snapshot size (note a fixed-(b, budget) sign-LSH
scans a CONSTANT fraction budget/2^b regardless of n, so the true analogue
of the reference's "HNSW defaults at every size" — fixed ef ⇒ fixed
absolute work — is auto-sized planes with a frozen bucket budget: bucket
occupancy stays ~8, so scanned ROWS stay constant and the scanned
fraction falls ~1/n):
- ``lsh_3bit``   — single-table 3-bit multiprobe (round-1 path): a fixed
                   42/64 ≈ 66% scan fraction — recall holds but the COST
                   grows linearly with the corpus; not a 100 TB answer.
- ``mtlsh_b64``  — auto planes, 64-bucket budget: constant absolute work,
                   the reference-defaults analogue — expected to DEGRADE
                   with corpus size exactly as the reference's 1.00→0.70.
- ``mtlsh_b256`` / ``mtlsh_b512`` — auto planes, larger budgets: the
                   serving configs — query-directed probing concentrates
                   the budget on the margin-cheapest buckets, so recall
                   holds while the scanned fraction still falls with
                   corpus size.

Measured (sf0.1, lam=1.5, 58k max): lsh_3bit flat 0.90 at a constant 66%
scan; mtlsh_b64 degrades 0.98 → 0.50 (the reference's 1.00 → 0.70 shape);
mtlsh_b256 holds 1.00 → 0.86 with the scan falling 86% → 4.1% — at 58k it
matches the reference's HNSW mean recall (0.844) while scanning 1/16th of
the corpus the single-table path needs. See
experiment_results/mtlsh_sweep_*.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table
from .operators.ann import lsh_ann
from .operators.knn import exact_knn
from .operators.mtlsh import mt_lsh_budget_curve
from .operators.recall import mean_recall, recall_at_k

DEFAULT_SIZES = (1000, 2000, 5000, 10000, 20000, 40000, 58000)
# single-table 3-bit multiprobe scans sum(C(6,j), j=0..3)=42 of 64 buckets
LSH3_NOMINAL_SCAN = 42 / 64


def expand_embeddings(
    emb: DataFrame,
    target_n: int,
    lam: float = 1.5,
    seed: int = 7,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
) -> tuple[DataFrame, int]:
    """Deterministically expand the corpus to >= target_n unit vectors.

    Source vector ``i`` yields ``factor`` copies with ids
    ``i*factor + r``; copy 0 is the (normalized) original, copies r>=1 are
    ``normalize(v̂ + lam*u)`` with ``u = unit(PCG64(seed<<32 | i)[r])`` —
    a pure function of (id, seed), independent of partitioning, so any
    snapshot prefix is bit-reproducible. Returns (expanded, factor)."""
    import numpy as np
    import pandas as pd

    n_src = emb.count()
    factor = math.ceil(target_n / n_src)

    def jitter(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["_id"].to_numpy()
            V = np.array(pdf["_vec"].tolist(), dtype=np.float64)
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            out_id, out_vec = [], []
            for i, v in zip(ids, V):
                rng = np.random.default_rng((seed << 32) | int(i))
                E = rng.standard_normal((factor, v.shape[0]))
                E /= np.linalg.norm(E, axis=1, keepdims=True)
                W = v[None, :] + lam * E
                W[0] = v  # copy 0 = the original
                W /= np.linalg.norm(W, axis=1, keepdims=True)
                out_id.extend(int(i) * factor + r for r in range(factor))
                out_vec.extend(W.tolist())
            yield pd.DataFrame({item_id: out_id, item_vec: out_vec})

    src = emb.select(
        F.col(item_id).alias("_id"), F.col(item_vec).alias("_vec")
    ).repartition(32)
    expanded = src.mapInPandas(
        jitter, schema=f"{item_id} long, {item_vec} array<double>"
    )
    return expanded, factor


def mtlsh_recall_sweep(
    spark: SparkSession,
    sf_dir: str,
    sizes: tuple[int, ...] = DEFAULT_SIZES,
    k: int = 10,
    lam: float = 1.5,
    out_prefix: str | None = None,
) -> DataFrame:
    """Recall@k + scanned fraction per (snapshot size × ANN config).

    Returns (corpus_size, method, recall_10, scan_fraction); writes
    ``{out_prefix}_results.json`` / ``_summary.csv`` / ``_recall.svg`` /
    ``_scan.svg`` when ``out_prefix`` is given (reference ACC:758-809 +
    the recall-by-pages chart of ACC:667-756)."""
    emb = load_table(spark, sf_dir, "embeddings")
    expanded, factor = expand_embeddings(emb, max(sizes), lam=lam)
    expanded = expanded.cache()
    expanded.count()
    queries = (
        expanded.filter(
            (F.col("vec_id") % factor == 0) & (F.col("vec_id") < 5 * factor)
        )
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
    )
    rows: list[tuple[int, str, float, float]] = []
    for size in sizes:
        snap = expanded.filter(F.col("vec_id") < size).cache()
        n = snap.count()
        gt = exact_knn(queries, snap, k=k, item_id="vec_id").cache()
        r_lsh = mean_recall(
            recall_at_k(
                gt, lsh_ann(queries, snap, k=k, n_probe_bits=3, item_id="vec_id"), k=k
            )
        ).first().mean_recall
        rows.append((n, "lsh_3bit", round(float(r_lsh), 4), round(LSH3_NOMINAL_SCAN, 4)))
        # one signature pass serves both budgets (auto planes per snapshot)
        curve = mt_lsh_budget_curve(
            queries, snap, gt, budgets=[64, 256, 512], k=k,
            n_planes=None, item_id="vec_id", item_vec="embedding",
        ).collect()
        for r in curve:
            rows.append(
                (n, f"mtlsh_b{r.budget}", r.mean_recall, r.scan_fraction)
            )
        # partition-local NSW graph (the HNSW analogue): recall + the
        # fraction of nodes the beam actually visits (its "scan")
        from .operators.graphann import (
            build_graph_index,
            graph_ann,
            graph_ann_visited_stats,
        )

        idx = build_graph_index(snap, item_id="vec_id").cache()
        r_g = mean_recall(
            recall_at_k(gt, graph_ann(queries, idx, k=k, ef_search=48), k=k)
        ).first().mean_recall
        vs = graph_ann_visited_stats(queries, idx, ef_search=48).agg(
            F.sum("n_visited").alias("v"), F.sum("shard_size").alias("s")
        ).first()
        rows.append(
            (n, "graph_ef48", round(float(r_g), 4), round(vs.v / (vs.s or 1), 4))
        )
        idx.unpersist()
        # SPANN-style cell-pruned graph: shards = IVF cells, each query
        # probes its 4-of-16 nearest cells only — scan = visited nodes in
        # probed cells over the WHOLE corpus (the full-scatter graph above
        # pays every shard; this path doesn't)
        from .operators.ann import ivf_assign, kmeans_centroids
        from .operators.graphann import query_probe_map

        cents = kmeans_centroids(snap, n_cells=16, sample_fraction=0.5)
        cidx = build_graph_index(
            ivf_assign(snap, cents), item_id="vec_id", shard_col="cell"
        ).cache()
        pm = query_probe_map(queries, cents, n_probe=4)
        r_cg = mean_recall(
            recall_at_k(
                gt, graph_ann(queries, cidx, k=k, ef_search=48, probe_map=pm), k=k
            )
        ).first().mean_recall
        v_cg = graph_ann_visited_stats(
            queries, cidx, ef_search=48, probe_map=pm
        ).agg(F.sum("n_visited").alias("v")).first().v
        rows.append(
            (n, "graph_ivf_p4", round(float(r_cg), 4), round(v_cg / (len(pm) * n), 4))
        )
        cidx.unpersist()
        gt.unpersist()
        snap.unpersist()
    expanded.unpersist()
    out = spark.createDataFrame(
        rows, "corpus_size long, method string, recall_10 double, scan_fraction double"
    )
    if out_prefix:
        os.makedirs(os.path.dirname(out_prefix) or ".", exist_ok=True)
        pdf = out.toPandas()
        pdf.to_json(out_prefix + "_results.json", orient="records", indent=2)
        pdf.to_csv(out_prefix + "_summary.csv", index=False)
        from .plans.svgplot import line_chart

        by_method: dict[str, list[tuple[float, float]]] = {}
        scan_by_method: dict[str, list[tuple[float, float]]] = {}
        for r in rows:
            by_method.setdefault(r[1], []).append((r[0], r[2]))
            scan_by_method.setdefault(r[1], []).append((r[0], r[3]))
        line_chart(
            by_method, out_prefix + "_recall.svg",
            title=f"recall@{k} vs corpus size (jittered lam={lam}, 5-query batch)",
            xlabel="corpus size (vectors)", ylabel=f"mean recall@{k}",
            y_range=(0.0, 1.05),
        )
        line_chart(
            scan_by_method, out_prefix + "_scan.svg",
            title="scanned fraction vs corpus size",
            xlabel="corpus size (vectors)", ylabel="mean scanned fraction",
            y_range=(0.0, 1.05),
        )
    return out


def compression_fidelity_sweep(
    spark: SparkSession,
    sf_dir: str,
    sizes: tuple[int, ...] = (1000, 5000, 20000, 58000),
    k: int = 10,
    lam: float = 1.5,
    out_prefix: str | None = None,
) -> DataFrame:
    """EP5: the compression axis of the reference's degradation study.

    The reference varies corpus SIZE under a fixed index; production
    engines also vary the BYTES each scanned vector costs. This sweep
    measures recall@k per (snapshot size × storage format):

    - ``f32``        — exact scan of raw vectors: 4·dim B/vec, recall 1.
    - ``sq8_scan``   — int8 scan, no re-rank: dim B/vec (4×).
    - ``sq8_rerank`` — int8 short-list(5k) + exact re-rank of it.
    - ``pq_adc``     — PQ(8×16) ADC scan, no re-rank: 4 B/vec (64×).
    - ``pq_rerank``  — ADC short-list(100) + exact re-rank.
    - ``ivfsq_p4``   — the COMPOSED layout (cell-partitioned int8 codes,
      4 of 16 cells probed, shortlist=100 exact re-rank): the scan
      touches scan_fraction × bytes_per_vec of the corpus — both cost
      axes at once.

    The expected result (and what FAISS/Lucene document): SQ8 is
    near-lossless at every size; raw PQ fidelity is poor in the
    hard-regime corpus and the re-rank recovers exactly its short-list
    coverage. Quantizers retrain per snapshot (seeded samples) — the
    honest per-size build, like the reference's per-collection index.
    Artifacts: ``{out_prefix}_results.json`` / ``_summary.csv`` /
    ``_recall.svg`` mirroring ACC:758-809.

    Measured (sf0.1, lam=1.5, 1k→58k, experiment_results/ep5_*): SQ8 is
    LOSSLESS here — recall@10 = 1.0 at every size even without re-rank, at
    4× compression (the hard-regime corpus stresses neighbourhood
    structure, not per-dim precision). PQ ADC alone degrades 0.56 → 0.24
    as the corpus grows — the same falling-fidelity shape as the
    reference's HNSW 1.00 → 0.70 — and the exact re-rank recovers to its
    short-list coverage (1.00 at 1k, 0.74 at 58k with shortlist=100).
    The composed ivfsq_p4 holds 1.00 → 0.72 at 16× fewer effective
    scanned bytes (64 B codes × 25% of directories) — recall bounded by
    cell coverage, not SQ fidelity. BQ (1 bit/dim, 8 B/vec = 32×) with
    shortlist-100 re-rank holds 1.00 → 0.90 at 58k — the best
    bytes-to-recall point past SQ8, with a pure-JVM Hamming kernel
    (bq_raw alone decays 0.56 → 0.42: sign bits lose magnitude; the
    re-rank recovers it, the Qdrant/Weaviate rescoring recipe). The
    engine answer at 100 TB: scan SQ8 hot, BQ or IVF-SQ/IVF-PQ cold,
    re-rank exact, size short-list/probes to the recall target.
    """
    import shutil
    import tempfile

    from .operators.ann import ivf_assign, kmeans_centroids, write_ivf_corpus
    from .operators.bq import bq_search_rerank, bq_train
    from .operators.pq import pq_encode, pq_search, pq_search_rerank, pq_train
    from .operators.sq import (
        ivfsq_search,
        sq_encode,
        sq_search,
        sq_search_rerank,
        sq_train,
        write_ivfsq_codes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    expanded, factor = expand_embeddings(emb, max(sizes), lam=lam)
    expanded = expanded.cache()
    expanded.count()
    queries = expanded.filter(
        (F.col("vec_id") % factor == 0) & (F.col("vec_id") < 5 * factor)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    dim = len(emb.select("embedding").first()[0])
    rows: list[tuple[int, str, float, float, float]] = []
    for size in sizes:
        snap = expanded.filter(F.col("vec_id") < size).cache()
        n = snap.count()
        gt = exact_knn(queries, snap, k=k, item_id="vec_id").cache()
        rows.append((n, "f32", 1.0, float(4 * dim), 1.0))

        vmin, scale = sq_train(snap, item_vec="embedding")
        enc = sq_encode(snap, vmin, scale, item_id="vec_id").cache()
        r_sq = mean_recall(
            recall_at_k(gt, sq_search(queries, enc, vmin, scale, k=k), k=k)
        ).first().mean_recall
        rows.append((n, "sq8_scan", round(float(r_sq), 4), float(dim), 1.0))
        r_sqr = mean_recall(
            recall_at_k(
                gt,
                sq_search_rerank(
                    queries, snap, enc, vmin, scale, k=k,
                    shortlist=min(n, 5000), item_id="vec_id", n_corpus=n,
                ),
                k=k,
            )
        ).first().mean_recall
        rows.append((n, "sq8_rerank", round(float(r_sqr), 4), float(dim), 1.0))
        enc.unpersist()

        # BQ: 1 bit/dim (dim/8 B/vec — 32x). shortlist=k == raw Hamming
        # top-k as a SET (the re-rank only reorders inside it), so bq_raw
        # is the no-rerank fidelity; bq_rerank is the production path.
        bsums, bn = bq_train(snap, item_vec="embedding", dim=dim)
        r_bq = mean_recall(
            recall_at_k(
                gt,
                bq_search_rerank(
                    queries, snap, bsums, bn, k=k, shortlist=k,
                    item_id="vec_id",
                ),
                k=k,
            )
        ).first().mean_recall
        rows.append((n, "bq_raw", round(float(r_bq), 4), dim / 8.0, 1.0))
        r_bqr = mean_recall(
            recall_at_k(
                gt,
                bq_search_rerank(
                    queries, snap, bsums, bn, k=k, shortlist=100,
                    item_id="vec_id",
                ),
                k=k,
            )
        ).first().mean_recall
        rows.append((n, "bq_rerank", round(float(r_bqr), 4), dim / 8.0, 1.0))

        books = pq_train(snap, m=8, k=16, sample_fraction=min(1.0, 20000 / n))
        penc = pq_encode(snap, books, item_id="vec_id").cache()
        r_pq = mean_recall(
            recall_at_k(gt, pq_search(queries, penc, books, k=k), k=k)
        ).first().mean_recall
        rows.append((n, "pq_adc", round(float(r_pq), 4), 4.0, 1.0))
        r_pqr = mean_recall(
            recall_at_k(
                gt,
                pq_search_rerank(
                    queries, snap, penc, books, k=k, shortlist=100,
                    item_id="vec_id", n_corpus=n,
                ),
                k=k,
            )
        ).first().mean_recall
        rows.append((n, "pq_rerank", round(float(r_pqr), 4), 4.0, 1.0))
        penc.unpersist()

        # composed IVF-SQ: 4/16 cells probed over int8 codes — both cost
        # axes at once (scan_fraction x bytes_per_vec)
        n_probe, n_cells = 4, 16
        cents = kmeans_centroids(
            snap, n_cells=n_cells, sample_fraction=min(1.0, 20000 / n)
        )
        assigned = ivf_assign(snap, cents)
        tmp = tempfile.mkdtemp(prefix="ep5_ivfsq_")
        corpus_path = f"{tmp}/corpus"
        codes_path = f"{tmp}/codes"
        write_ivf_corpus(assigned, corpus_path)
        write_ivfsq_codes(assigned, vmin, scale, codes_path, item_id="vec_id")
        r_isq = mean_recall(
            recall_at_k(
                gt,
                ivfsq_search(
                    queries, spark, codes_path, corpus_path, cents,
                    vmin, scale, k=k, n_probe=n_probe, shortlist=100,
                    item_id="vec_id", n_corpus=n,
                ),
                k=k,
            )
        ).first().mean_recall
        rows.append(
            (n, "ivfsq_p4", round(float(r_isq), 4), float(dim),
             round(n_probe / n_cells, 4))
        )
        shutil.rmtree(tmp, ignore_errors=True)
        gt.unpersist()
        snap.unpersist()
    expanded.unpersist()
    out = spark.createDataFrame(
        rows,
        "corpus_size long, method string, recall_10 double, bytes_per_vec double, scan_fraction double",
    )
    if out_prefix:
        os.makedirs(os.path.dirname(out_prefix) or ".", exist_ok=True)
        pdf = out.toPandas()
        pdf.to_json(out_prefix + "_results.json", orient="records", indent=2)
        pdf.to_csv(out_prefix + "_summary.csv", index=False)
        from .plans.svgplot import line_chart

        by_method: dict[str, list[tuple[float, float]]] = {}
        for r in rows:
            by_method.setdefault(r[1], []).append((r[0], r[2]))
        line_chart(
            by_method, out_prefix + "_recall.svg",
            title=f"recall@{k} vs corpus size by storage format "
            f"(f32=256B, sq8=64B, pq=4B per vector)",
            xlabel="corpus size (vectors)", ylabel=f"mean recall@{k}",
            y_range=(0.0, 1.05),
        )
    return out




def multivector_agreement_sweep(
    spark: SparkSession,
    sf_dir: str,
    tokens_per_doc: tuple[int, ...] = (1, 2, 4, 8, 16),
    n_queries: int = 5,
    corpus_vecs: int = 16000,
    k: int = 10,
    lam: float = 1.5,
    out_prefix: str | None = None,
) -> DataFrame:
    """EP7: what single-vector pooling loses vs MaxSim late interaction.

    Fixed expanded token pool (~corpus_vecs vectors, hard regime); sweep
    the tokens-per-doc axis. For each t: docs are consecutive t-token
    groups, queries are n_queries held-out t-token groups; ground truth =
    exact MaxSim top-k; challenger = mean-pooled doc/query vectors ranked
    by exact cosine. Emitted metric = agreement@k (the fraction of the
    MaxSim top-k the pooled ranking retrieves) plus the corpus shape.

    t=1 is the built-in control: MaxSim degenerates to exact cosine kNN,
    so agreement MUST be 1.0 (the test suite pins the same identity).
    As t grows, the pooled centroid averages away per-token structure and
    agreement falls — the quantitative case for shipping a late-
    interaction operator instead of pooling multi-vector docs.

    Measured (sf0.1 pool, lam=1.5, 5 queries, k=10 — see
    EP7_MULTIVECTOR.md): agreement 1.0 at t=1, degrading steadily as t
    grows; artifacts mirror the EP5 layout.
    """
    from .operators.multivector import maxsim_topk

    emb = load_table(spark, sf_dir, "embeddings")
    expanded, factor = expand_embeddings(emb, corpus_vecs, lam=lam)
    expanded = expanded.cache()
    n_pool = expanded.count()
    rows: list[tuple[int, int, int, float]] = []
    for t in tokens_per_doc:
        held_out = n_queries * t
        qt = expanded.filter(F.col("vec_id") < held_out).select(
            F.floor(F.col("vec_id") / t).cast("bigint").alias("qid"),
            F.col("vec_id").alias("qtok"),
            F.col("embedding").alias("qv"),
        )
        dt = expanded.filter(F.col("vec_id") >= held_out).select(
            F.floor(F.col("vec_id") / t).cast("bigint").alias("doc_id"),
            F.col("vec_id").alias("dtok"),
            F.col("embedding").alias("ev"),
        )
        gt = maxsim_topk(qt, dt, k=k).select(
            F.col("qid").alias("query_id"), "rank",
            F.col("doc_id").alias("item_id"),
        )

        def pool(df, id_col, tok_vec):
            e = df.select(
                id_col, F.posexplode(tok_vec).alias("pos", "v")
            ).groupBy(id_col, "pos").agg(F.avg("v").alias("m"))
            return e.groupBy(id_col).agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("vec")
            )

        qpool = pool(qt, F.col("qid"), F.col("qv")).select(
            F.col("qid").alias("query_id"), F.col("vec").alias("query_vec")
        )
        dpool = pool(dt, F.col("doc_id"), F.col("ev")).select(
            F.col("doc_id").alias("item_id"), F.col("vec").alias("embedding")
        )
        pooled = exact_knn(qpool, dpool, k=k, metric="cosine")
        agree = mean_recall(recall_at_k(gt, pooled, k=k)).first().mean_recall
        n_docs = (n_pool - held_out) // t
        rows.append((t, n_docs, k, round(float(agree), 4)))
    expanded.unpersist()
    out = spark.createDataFrame(
        rows, "tokens_per_doc int, n_docs long, k int, agreement double"
    )
    if out_prefix:
        os.makedirs(os.path.dirname(out_prefix) or ".", exist_ok=True)
        pdf = out.toPandas()
        pdf.to_json(out_prefix + "_results.json", orient="records", indent=2)
        pdf.to_csv(out_prefix + "_summary.csv", index=False)
        from .plans.svgplot import line_chart

        line_chart(
            {"pooled_vs_maxsim": [(r[0], r[3]) for r in rows]},
            out_prefix + "_agreement.svg",
            title=f"agreement@{k}: mean-pooled retrieval vs MaxSim ground "
            "truth, by tokens per doc",
            xlabel="tokens per doc", ylabel=f"agreement@{k}",
            y_range=(0.0, 1.05),
        )
    return out


def maintenance_economics(
    spark: SparkSession,
    sf_dir: str,
    corpus_n: int = 100_000,
    batch_fracs: tuple[float, ...] = (0.001, 0.01, 0.1),
    n_cells: int = 64,
    out_prefix: str | None = None,
) -> DataFrame:
    """EP6: serving-index maintenance economics at ~100k vectors.

    The 100 TB claim of streaming/index_maintenance.py is that a
    micro-batch costs ~(touched cells)/n_cells of a full rebuild in the
    base IVF layout and EVERY derived code layout (int8 IVF-SQ and packed
    1-bit IVF-BQ, both kept in lockstep in the timed path) — cost follows
    the TOUCHED-CELL count, not the row count. Two batch shapes make the
    point: RANDOM-id update batches scatter across cells (a 0.1% batch
    already touches most directories — the worst case), while CLUSTERED
    batches (all updates drawn from one cell, the analogue of
    time/topic-local production arrivals) touch 1-2 directories and cost
    a small fixed fraction of the rebuild regardless of corpus size.
    Updates re-jitter existing ids' vectors, so the moved-cell rewrite
    path is exercised throughout; a timed per-cell compaction cycle
    closes the maintenance loop. Row-count conservation is asserted
    after every phase (updates replace, never append). Emits JSON/CSV
    artifacts when ``out_prefix`` is set."""
    import json
    import shutil
    import tempfile
    import time

    import numpy as np
    import pandas as pd

    from .operators.ann import (
        ivf_assign_blas,
        ivf_index_upsert,
        kmeans_centroids,
        write_ivf_corpus,
    )
    from .operators.bq import bq_train, ivfbq_codes_upsert, write_ivfbq_codes
    from .operators.sq import ivfsq_codes_upsert, sq_train, write_ivfsq_codes
    from .io.catalog import compact_table

    emb = load_table(spark, sf_dir, "embeddings")
    big, _ = expand_embeddings(emb, corpus_n)
    big = big.persist()
    n = big.count()

    root = tempfile.mkdtemp(prefix="ep6_maint_")
    corpus_path = os.path.join(root, "corpus")
    codes_path = os.path.join(root, "codes")
    bq_codes_path = os.path.join(root, "bq_codes")
    rows: list[tuple] = []

    t0 = time.perf_counter()
    # kmeans_centroids already returns a driver-local-rows frame with no
    # lineage to `big` — nothing to freeze
    cents = kmeans_centroids(big, n_cells=n_cells, sample_fraction=0.1)
    write_ivf_corpus(ivf_assign_blas(big, cents), corpus_path)
    vmin, scale = sq_train(big, item_vec="embedding")
    write_ivfsq_codes(
        spark.read.parquet(corpus_path), vmin, scale, codes_path, item_id="vec_id"
    )
    bsums, bn_total = bq_train(big, item_vec="embedding")
    write_ivfbq_codes(
        spark.read.parquet(corpus_path), bsums, bn_total, bq_codes_path,
        item_id="vec_id",
    )
    t_build = time.perf_counter() - t0
    rows.append(("full_build", 0.0, round(t_build, 3), n_cells, n_cells, n))

    def update_batch(frac: float) -> DataFrame:
        cap = max(int(n * frac), 1)

        def jitter(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                ids = pdf["vec_id"].to_numpy()
                out = []
                for i, v in zip(ids, V):
                    rng = np.random.default_rng(60000 + int(i))
                    u = rng.standard_normal(v.shape[0])
                    w = v + 0.8 * u / np.linalg.norm(u)
                    out.append((w / np.linalg.norm(w)).tolist())
                yield pd.DataFrame({"vec_id": ids, "embedding": out})

        return (
            big.filter(F.pmod(F.xxhash64("vec_id"), 10_000) < int(frac * 10_000))
            .limit(cap)
            .mapInPandas(jitter, schema="vec_id long, embedding array<double>")
        )

    def timed_upsert(tag: str, frac: float, batch: DataFrame) -> None:
        batch = batch.persist()
        bn = batch.count()
        t0 = time.perf_counter()
        touched = ivf_index_upsert(
            spark, corpus_path, batch, cents, item_id="vec_id"
        )
        ivfsq_codes_upsert(
            spark, corpus_path, codes_path, vmin, scale, touched, item_id="vec_id"
        )
        ivfbq_codes_upsert(
            spark, corpus_path, bq_codes_path, bsums, bn_total, touched,
            item_id="vec_id",
        )
        dt = time.perf_counter() - t0
        assert spark.read.parquet(corpus_path).count() == n  # pure replace
        rows.append((tag, frac, round(dt, 3), len(touched), n_cells, bn))
        batch.unpersist()

    for frac in batch_fracs:
        timed_upsert("upsert_random", frac, update_batch(frac))

    # clustered batches: all updates from ONE cell, tiny jitter (0.05) so
    # nearly all stay in-cell — the time/topic-local arrival shape
    def clustered_batch(frac: float) -> DataFrame:
        cap = max(int(n * frac), 1)

        def jitter(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                ids = pdf["vec_id"].to_numpy()
                out = []
                for i, v in zip(ids, V):
                    rng = np.random.default_rng(70000 + int(i))
                    u = rng.standard_normal(v.shape[0])
                    w = v + 0.05 * u / np.linalg.norm(u)
                    out.append((w / np.linalg.norm(w)).tolist())
                yield pd.DataFrame({"vec_id": ids, "embedding": out})

        return (
            spark.read.parquet(corpus_path)
            .filter(F.col("cell") == 0)
            .select("vec_id", "embedding")
            .limit(cap)
            .mapInPandas(jitter, schema="vec_id long, embedding array<double>")
        )

    for frac in batch_fracs:
        timed_upsert("upsert_clustered", frac, clustered_batch(frac))

    t0 = time.perf_counter()
    import glob as _glob

    for d in sorted(_glob.glob(os.path.join(corpus_path, "cell=*"))):
        compact_table(spark, d)
    dt = time.perf_counter() - t0
    assert spark.read.parquet(corpus_path).count() == n
    rows.append(("compact_all_cells", 1.0, round(dt, 3), n_cells, n_cells, n))

    big.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    out = spark.createDataFrame(
        rows,
        "phase string, batch_frac double, sec double, cells_touched int, "
        "n_cells int, rows long",
    )
    if out_prefix:
        os.makedirs(os.path.dirname(out_prefix) or ".", exist_ok=True)
        pdf = out.toPandas()
        pdf.to_csv(out_prefix + "_summary.csv", index=False)
        with open(out_prefix + "_results.json", "w") as f:
            json.dump(
                {
                    "corpus_n": n,
                    "n_cells": n_cells,
                    "full_build_sec": t_build,
                    "phases": pdf.to_dict(orient="records"),
                },
                f,
                indent=2,
            )
    return out


def main(argv: list[str]) -> int:
    import argparse

    from .session import get_spark

    p = argparse.ArgumentParser(prog="experiments_scale")
    p.add_argument("mode", nargs="?", default="mtlsh",
                   choices=["mtlsh", "compression", "maintenance", "multivector"])
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--out", default=None)
    p.add_argument("--sizes", default=None)
    p.add_argument("--lam", type=float, default=1.5)
    args = p.parse_args(argv)
    spark = get_spark("recall-scale")
    spark.sparkContext.setLogLevel("ERROR")
    if args.mode == "maintenance":
        out = maintenance_economics(
            spark, args.sf_dir,
            out_prefix=args.out or "experiment_results/ep6_maintenance",
        )
        out.orderBy("phase", "batch_frac").show(100, False)
        return 0
    if args.mode == "multivector":
        out = multivector_agreement_sweep(
            spark, args.sf_dir,
            out_prefix=args.out or "experiment_results/ep7_multivector",
        )
        out.orderBy("tokens_per_doc").show(100, False)
        return 0
    if args.mode == "compression":
        sizes = tuple(
            int(s) for s in (args.sizes or "1000,5000,20000,58000").split(",")
        )
        out = compression_fidelity_sweep(
            spark, args.sf_dir, sizes=sizes, lam=args.lam,
            out_prefix=args.out or "experiment_results/ep5_compression",
        )
    else:
        sizes = tuple(
            int(s)
            for s in (args.sizes or ",".join(map(str, DEFAULT_SIZES))).split(",")
        )
        out = mtlsh_recall_sweep(
            spark, args.sf_dir, sizes=sizes, lam=args.lam,
            out_prefix=args.out or "experiment_results/mtlsh_sweep",
        )
    out.orderBy("corpus_size", "method").show(100, False)
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys

    raise SystemExit(main(sys.argv[1:]))
