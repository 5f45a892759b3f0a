"""Streaming dedup-at-ingest: documents arrive as a stream, each
micro-batch is checked for near-duplicates against everything ingested
before it, and the MinHash signature index grows batch by batch.

This is the ingest-time twin of the batch MinHash-LSH pipeline
(operators/dedup.py): at 100 TB you cannot re-mine the whole corpus per
arrival, so the index keeps, per document, only its ``n_hashes`` minhash
slots and its band bucket keys — a few hundred bytes — and a new batch
costs O(batch × colliding buckets), independent of corpus size. The
verify step is the signature-agreement estimator (``signature_estimate``)
rather than exact shingle Jaccard, precisely because signatures are all
an incremental index can afford to retain; the estimator is unbiased with
stderr ≤ 1/(2·sqrt(n_hashes)).

Index layout under ``index_path`` (all parquet):
    bands/ingest_batch=N/   (doc_id, band, sig)      — LSH bucket keys
    sigs/ingest_batch=N/    (doc_id, seed, minhash)  — signatures
    dups/ingest_batch=N/    (id_a, id_b, est_jaccard_r)
                            pairs DISCOVERED when batch N arrived

Exactly-once: every batch writes only under its own ``ingest_batch=N``
directories with overwrite mode, and cross-batch matching reads only
batches STRICTLY BEFORE the current id — so a micro-batch replayed after
a failure sees exactly the index state it saw the first time (even with
later batches already on disk) and recomputes byte-identical outputs
(same argument as index_maintenance.stream_upsert_graph_index).

Completeness: a pair (a, b) with a ingested in batch i ≤ j = batch(b) is
found either by the intra-batch self-join (i == j) or by the new-vs-index
join when batch j arrives (i < j) — so the union over dups/* equals the
batch-mode band-collision pairs over the full corpus (tested in
tests/test_streaming_dedup.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    _band_collisions,
    _band_table,
    minhash_signatures_df,
    signature_estimate,
)

DEFAULT_N_HASHES = 16
DEFAULT_BAND_SIZE = 4
DEFAULT_EST_THRESHOLD = 0.5


def _read_before_batch(
    spark: SparkSession, path: str, batch_id: int
) -> DataFrame | None:
    """Rows ingested STRICTLY BEFORE batch_id. Strictly-before (not just
    "not self") is what makes replay idempotent: a re-delivered batch N
    must see exactly the index state it saw the first time, even though
    batches > N are already on disk."""
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path).filter(F.col("ingest_batch") < batch_id)


def dedup_index_upsert(
    spark: SparkSession,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = DEFAULT_N_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
    est_threshold: float = DEFAULT_EST_THRESHOLD,
    maintain_clusters: bool = False,
) -> None:
    """Fold one document batch into the signature index: signatures and
    band keys land under ``ingest_batch=N``, near-dup pairs are mined
    new-vs-new plus new-vs-(strictly earlier batches) and written to
    ``dups/ingest_batch=N``. Callable from the micro-batch sink AND from
    batch-mode maintainers (the VectorStore facade's add()); the caller
    guarantees batch ids strictly increase, which is what makes a replay
    of batch N see exactly its original index state."""
    if batch_df.isEmpty():
        return
    sig = minhash_signatures_df(
        batch_df, id_col, text_col, n_hashes=n_hashes
    ).localCheckpoint(eager=True)
    bands = _band_table(sig, band_size).localCheckpoint(eager=True)

    # new-vs-new (same batch)
    intra = signature_estimate(
        _band_collisions(bands, bands), sig, sig, n_hashes
    )
    dups = intra
    # new-vs-index (everything ingested in EARLIER batches)
    old_bands = _read_before_batch(spark, f"{index_path}/bands", batch_id)
    if old_bands is not None:
        old_sigs = _read_before_batch(spark, f"{index_path}/sigs", batch_id)
        ob = old_bands.select("doc_id", "band", "sig")
        # one side new, one side old — NEVER old-vs-old (those pairs
        # were already emitted when the later of the two arrived).
        # _band_collisions orders id_a < id_b, so the two directions
        # are disjoint.
        cross = _band_collisions(bands, ob).unionByName(
            _band_collisions(ob, bands)
        )
        all_sigs = sig.unionByName(
            old_sigs.select("doc_id", "seed", "minhash")
        )
        dups = dups.unionByName(
            signature_estimate(cross, all_sigs, all_sigs, n_hashes)
        )

    dups.filter(F.col("est_jaccard_r") >= est_threshold).write.mode(
        "overwrite"
    ).parquet(f"{index_path}/dups/ingest_batch={batch_id}")
    bands.write.mode("overwrite").parquet(
        f"{index_path}/bands/ingest_batch={batch_id}"
    )
    sig.write.mode("overwrite").parquet(
        f"{index_path}/sigs/ingest_batch={batch_id}"
    )
    if maintain_clusters:
        from ..operators.dedup_clusters import clusters_upsert

        # read the batch's pairs back from the just-written parquet:
        # truncated lineage, and the exact rows any replay would see
        clusters_upsert(
            spark,
            f"{index_path}/clusters_inc",
            spark.read.parquet(
                f"{index_path}/dups/ingest_batch={batch_id}"
            ).select("id_a", "id_b"),
            batch_key=str(batch_id),
        )


def next_ingest_batch_id(index_path: str) -> int:
    """1 + the highest ``ingest_batch=N`` already landed (0 when empty) —
    how a batch-mode maintainer keeps the strictly-increasing contract."""
    base = f"{index_path}/bands"
    if not os.path.exists(base):
        return 0
    ids = [
        int(d.split("=", 1)[1])
        for d in os.listdir(base)
        if d.startswith("ingest_batch=")
    ]
    return max(ids) + 1 if ids else 0


def stream_dedup_ingest(
    docs_stream: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = DEFAULT_N_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
    est_threshold: float = DEFAULT_EST_THRESHOLD,
    maintain_clusters: bool = False,
) -> None:
    """Run the document stream to completion (availableNow), maintaining
    the signature index and emitting near-dup pairs per micro-batch.

    With ``maintain_clusters`` the per-batch pairs also fold into the
    incrementally maintained cluster artifact
    (operators/dedup_clusters.py) at ``index_path/clusters_inc`` — the
    batch id keys the pair log, so a replayed micro-batch overwrites its
    own log entry and the label merge is a no-op (exactly-once
    composition of two idempotent steps)."""

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        dedup_index_upsert(
            batch_df.sparkSession,
            index_path,
            batch_df,
            batch_id,
            id_col=id_col,
            text_col=text_col,
            n_hashes=n_hashes,
            band_size=band_size,
            est_threshold=est_threshold,
            maintain_clusters=maintain_clusters,
        )

    ckpt = tempfile.mkdtemp(prefix="ckpt_dedupidx_")
    q = (
        docs_stream.writeStream.foreachBatch(ingest_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ingested_dup_pairs(spark: SparkSession, index_path: str) -> DataFrame:
    """All near-dup pairs discovered across the whole ingest history."""
    return spark.read.parquet(f"{index_path}/dups").select(
        "id_a", "id_b", "est_jaccard_r"
    )
