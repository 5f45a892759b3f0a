"""Similarity joins with a vectorized (BLAS) kernel.

The pure-HOF pair join in queries/vector.py is correct but evaluates one
lambda chain per pair — at 4M pairs x 64 dims that is ~10^9 interpreted
lambda steps (measured 193 s at sf0.1). The same math as a blocked matrix
product is one dgemm per Arrow batch: ``S = A_block @ B.T`` — the reference
itself uses the NumPy-vectorized kernel for its hot loop
(chromadb_acc_experiment.py:527-534); this is its distributed form.

Scale shape (100 TB): the build side B is a *bucket* (LSH band, IVF cell,
or metadata partition), never the whole corpus — bucket it first with
operators/ann.py or operators/dedup.py, then verify pairs here per bucket.
``broadcast_threshold_rows`` guards against silently broadcasting an
unbucketed corpus. The probe side A streams through mapInPandas
Arrow-batched; per batch one BLAS call.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# byte-true driver guard: the collected matrix is float64, so the admissible
# row count depends on the vector dimension — a row cap that ignores dim
# admits ~12 GB at 768-dim while "meaning" 512 MB at 64-dim.
DEFAULT_BROADCAST_CAP_BYTES = 512 << 20  # 512 MiB of float64 matrix


def _check_matrix_bytes(n: int, dim: int, cap_bytes: int, side: str) -> None:
    need = n * dim * 8  # float64
    if need > cap_bytes:
        raise ValueError(
            f"{side} matrix would be {need / 2**20:.0f} MiB "
            f"({n} rows x {dim} dims x 8 B) > cap {cap_bytes / 2**20:.0f} MiB; "
            "bucket it first (LSH/IVF/metadata) and verify per bucket — "
            "see cosine_self_join_bucketed"
        )


def cosine_self_join(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    broadcast_cap_bytes: int = DEFAULT_BROADCAST_CAP_BYTES,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine similarity >= threshold.

    Returns (id_a, id_b, cos_sim) unrounded — callers round with F.round so
    the rounding rule matches the SQL oracle. The corpus is collected once
    into a dense float64 matrix and broadcast (the reference's S6 full-scan
    shape); the cap is checked in BYTES (rows x dim x 8) with a probed dim
    BEFORE collecting, so a high-dim corpus cannot OOM the driver. Beyond
    the cap, use ``cosine_self_join_bucketed`` (fully distributed).
    """
    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    n = src.count()
    dim = len(src.select("_vec").first()[0])
    _check_matrix_bytes(n, dim, broadcast_cap_bytes, "corpus")
    rows = src.collect()
    ids = np.array([r._id for r in rows])
    mat = np.array([r._vec for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B, Bn, Bi = b_mat.value, b_norms.value, b_ids.value
        for pdf in batches:
            A = np.array(pdf["_vec"].tolist(), dtype=np.float64)
            An = np.linalg.norm(A, axis=1)
            An[An == 0.0] = 1.0
            S = (A @ B.T) / An[:, None] / Bn[None, :]
            Ai = pdf["_id"].to_numpy()
            ii, jj = np.nonzero(S >= threshold)
            keep = Ai[ii] < Bi[jj]
            ii, jj = ii[keep], jj[keep]
            yield pd.DataFrame(
                {
                    "id_a": Ai[ii],
                    "id_b": Bi[jj],
                    "cos_sim": S[ii, jj],
                }
            )

    out_schema = f"id_a {_sql_type(df, id_col)}, id_b {_sql_type(df, id_col)}, cos_sim double"
    return src.mapInPandas(block, schema=out_schema)


def cosine_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    item_id: str = "item_id",
    item_vec: str = "embedding",
    metric: str = "l2",
    broadcast_cap_bytes: int = DEFAULT_BROADCAST_CAP_BYTES,
) -> DataFrame:
    """Exact k-NN with the BLAS kernel: queries broadcast as a matrix, the
    corpus streams through mapInPandas; per Arrow batch one gemm + a partial
    top-k; the final top-k merge happens on k*batches rows only.

    Same result contract as operators.knn.exact_knn (query_id, rank,
    item_id, dist) — benchmark alternative for wide query sets where the
    per-row HOF distance becomes compute-bound. The byte cap is checked
    (count + probed dim) BEFORE the query set is collected.
    """
    from pyspark.sql import Window

    spark = queries.sparkSession
    qsel = queries.select(F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qv"))
    n_q = qsel.count()
    qdim = len(qsel.select("_qv").first()[0])
    _check_matrix_bytes(n_q, qdim, broadcast_cap_bytes, "query")
    qrows = qsel.collect()
    qids = np.array([r._qid for r in qrows])
    Q = np.array([r._qv for r in qrows], dtype=np.float64)
    b_qids = spark.sparkContext.broadcast(qids)
    b_Q = spark.sparkContext.broadcast(Q)
    use_l2 = metric == "l2"

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Qm, Qi = b_Q.value, b_qids.value
        qn = np.linalg.norm(Qm, axis=1)
        qn[qn == 0.0] = 1.0
        for pdf in batches:
            C = np.array(pdf["_cvec"].tolist(), dtype=np.float64)
            ids = pdf["_cid"].to_numpy()
            if use_l2:
                # ||c-q||^2 = ||c||^2 - 2 c.q + ||q||^2, computed blockwise
                d2 = (
                    (C * C).sum(axis=1)[None, :]
                    - 2.0 * (Qm @ C.T)
                    + (Qm * Qm).sum(axis=1)[:, None]
                )
                np.maximum(d2, 0.0, out=d2)
                D = np.sqrt(d2)
            else:
                cn = np.linalg.norm(C, axis=1)
                cn[cn == 0.0] = 1.0
                D = 1.0 - (Qm @ C.T) / qn[:, None] / cn[None, :]
            # partial top-k per query within this batch. Deterministic
            # (dist, id) selection via lexsort — a bare argpartition keeps
            # an ARBITRARY subset of distance-tied items at the k-th cut,
            # which contradicts the id tie-break downstream rank windows
            # promise the moment duplicate embeddings exist (the
            # dedup-blocking use case). lexsort's last key is primary.
            kk = min(k, D.shape[1])
            sel = np.empty((D.shape[0], kk), dtype=np.int64)
            for qi_row in range(D.shape[0]):
                order = np.lexsort((ids, D[qi_row]))[:kk]
                sel[qi_row] = order
            out = {
                "query_id": np.repeat(Qi, kk),
                "item_id": ids[sel].ravel(),
                "dist": np.take_along_axis(D, sel, axis=1).ravel(),
            }
            yield pd.DataFrame(out)

    corpus_sel = corpus.select(
        F.col(item_id).alias("_cid"), F.col(item_vec).alias("_cvec")
    )
    qid_t = _sql_type(queries, query_id)
    iid_t = _sql_type(corpus, item_id)
    partial = corpus_sel.mapInPandas(
        block, schema=f"query_id {qid_t}, item_id {iid_t}, dist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("item_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "dist")
    )


def cosine_self_join_bucketed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_planes: int = 6,
    n_tables: int = 96,
    seed: int = 42,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — fully distributed.

    The SCALE.md vector-search composition, wired: sign-LSH signatures over
    ``n_tables`` independent ``n_planes``-bit tables (one gemm per Arrow
    batch, mtlsh.corpus_signatures), candidate pairs from an equi-join on
    (table, bucket) — a narrow-key shuffle, never an all-pairs product —
    then one exact JVM-side cosine per *candidate* pair. Nothing is ever
    collected to the driver, so there is no byte cap: this is the path past
    ``cosine_self_join``'s broadcast guard.

    Recall: a pair at cosine s collides per table w.p. (1-θ/π)^b (θ =
    arccos s), missed by all L tables w.p. (1-p)^L. At the defaults
    (b=6, L=96) a threshold-0.4 pair is missed w.p. ~2e-3 at the 0.4
    boundary and far less above it — the metamorphic test (and the shared
    gate oracle) assert exact equality with the brute-force join on all
    three fixed test corpora. Raise b (and lower L) for higher
    thresholds: near-dup at 0.9 is cheap (b=8, L=16 misses ~4e-3 of
    exactly-boundary pairs).
    """
    from ..functions.vector import cosine_sim
    from .mtlsh import corpus_signatures, mt_planes

    src = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    dim = len(src.select("_vec").first()[0])
    planes = mt_planes(dim, n_planes, n_tables, seed)
    # cache the narrow (id, table, bucket) table: it is self-joined, and
    # recomputing it means two Python-worker signature scans
    sig = corpus_signatures(
        src, planes, n_tables, n_planes, item_id="_id", item_vec="_vec"
    ).cache()
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.item_id") < F.col("b.item_id")),
        )
        .select(F.col("a.item_id").alias("id_a"), F.col("b.item_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = src.select(F.col("_id").alias("id_a"), F.col("_vec").alias("_va"))
    vb = src.select(F.col("_id").alias("id_b"), F.col("_vec").alias("_vb"))
    from .dedup import materialize_and_release

    return materialize_and_release(
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_sim(F.col("_va"), F.col("_vb")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold),
        sig,
    )


def _sql_type(df: DataFrame, col: str) -> str:
    return dict(df.dtypes)[col]
