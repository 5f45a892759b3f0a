"""Streaming ANN-index maintenance: a Structured Streaming source of
(id, embedding) rows keeps a written graph index fresh via foreachBatch →
graph_index_upsert (the streaming twin of the reference's collection.add
loop, create_collections.py:245-263, which re-adds documents to ChromaDB's
per-collection HNSW).

Each micro-batch rebuilds ONLY the shards its rows land in (dynamic
partition overwrite, operators/graphann.py::graph_index_upsert), so the
per-batch cost is O(batch ∪ touched-shard rows), not O(index). Because a
shard rebuild is a pure function of its final row SET (insertion order =
sorted ids) and same-id rows replace, the upsert is IDEMPOTENT: a
micro-batch replayed after a failure converges to the same bytes —
foreachBatch's at-least-once delivery is exactly-once for this sink
without any batch-id bookkeeping.

At 100 TB this is the ingest path: embeddings stream in (Kafka/files),
the coarse structure (hash shards or IVF cells) routes each batch to a
small set of partition directories, and queries keep reading a consistent
index (parquet readers never see half-written files)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

from ..operators.graphann import (
    DEFAULT_EF_BUILD,
    DEFAULT_M,
    DEFAULT_N_SHARDS,
    build_graph_index,
    graph_index_upsert,
    write_graph_index,
)



def _dedup_batch(batch_df: DataFrame, item_id: str) -> DataFrame:
    """Collapse duplicate ids WITHIN one micro-batch to a single row —
    without it, the upserts' anti-join removes only OLD rows and every
    in-batch duplicate lands in the index, breaking the pure-function-of-
    the-final-row-set contract. The keep rule is a deterministic max over
    the non-id columns as a struct (a pure function of the row SET; a
    real CDC feed would order by its sequence column instead — pass the
    stream through dropDuplicates upstream if that exists)."""
    from pyspark.sql import functions as F

    other = [c for c in batch_df.columns if c != item_id]
    return (
        batch_df.groupBy(item_id)
        .agg(F.max(F.struct(*other)).alias("_r"))
        .select(item_id, *[F.col(f"_r.{c}").alias(c) for c in other])
    )


def _run_available_now(
    stream: DataFrame, upsert_batch, checkpoint_dir: str | None, prefix: str
) -> None:
    """Shared foreachBatch runner for every index-maintenance sink.

    ``checkpoint_dir=None`` (the test/bounded-replay shape) uses a fresh
    temp dir: each call reprocesses the whole bounded source, which the
    idempotent upserts absorb. A PRODUCTION caller maintaining a growing
    source must pass a stable directory so each invocation processes only
    new data (O(new batch), not O(source)) and progress survives crashes."""
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix=prefix)
    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert_graph_index(
    embeddings_stream: DataFrame,
    index_path: str,
    n_shards: int = DEFAULT_N_SHARDS,
    M: int = DEFAULT_M,
    ef_build: int = DEFAULT_EF_BUILD,
    item_id: str = "item_id",
    item_vec: str = "embedding",
    checkpoint_dir: str | None = None,
) -> None:
    """Run the stream to completion (availableNow) upserting every
    micro-batch into the graph index at ``index_path``. The first batch
    bootstraps the index if none exists; later batches rebuild only their
    touched shards."""

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = _dedup_batch(batch_df, item_id)
        spark = batch_df.sparkSession
        if not os.path.exists(index_path):
            write_graph_index(
                build_graph_index(
                    batch_df, n_shards=n_shards, M=M, ef_build=ef_build,
                    item_id=item_id, item_vec=item_vec,
                ),
                index_path,
            )
        else:
            graph_index_upsert(
                spark, index_path, batch_df,
                n_shards=n_shards, M=M, ef_build=ef_build,
                item_id=item_id, item_vec=item_vec,
            )

    _run_available_now(
        embeddings_stream, upsert_batch, checkpoint_dir, "ckpt_graphidx_"
    )


def stream_upsert_ivf_index(
    embeddings_stream: DataFrame,
    corpus_path: str,
    centroids: DataFrame,
    item_id: str = "item_id",
    item_vec: str = "embedding",
    checkpoint_dir: str | None = None,
) -> None:
    """Streaming twin for the IVF layout: every micro-batch is assigned
    with the index's FROZEN centroids and rewrites only the cell
    directories it lands in (operators/ann.py::ivf_index_upsert). Same
    idempotence contract as the graph sink — same-id rows replace and the
    layout is a pure function of the final row set, so replayed batches
    converge and at-least-once delivery is exactly-once. Centroid
    re-training stays an offline build job (the FAISS add() model)."""
    from ..operators.ann import ivf_assign, ivf_index_upsert, write_ivf_corpus

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = _dedup_batch(batch_df, item_id)
        spark = batch_df.sparkSession
        if not os.path.exists(corpus_path):
            write_ivf_corpus(
                ivf_assign(batch_df, centroids, item_vec=item_vec),
                corpus_path,
            )
        else:
            ivf_index_upsert(
                spark, corpus_path, batch_df, centroids,
                item_id=item_id, item_vec=item_vec,
            )

    _run_available_now(
        embeddings_stream, upsert_batch, checkpoint_dir, "ckpt_ivfidx_"
    )


def stream_upsert_ivfsq_index(
    embeddings_stream: DataFrame,
    corpus_path: str,
    codes_path: str,
    centroids: DataFrame,
    vmin,
    scale,
    item_id: str = "item_id",
    item_vec: str = "embedding",
    checkpoint_dir: str | None = None,
) -> None:
    """Streaming maintenance for the COMPOSED IVF-SQ index: each
    micro-batch upserts the base cell-partitioned corpus
    (ivf_index_upsert — returns the rewritten cells, including cells an
    updated vector moved OUT of) and then re-encodes exactly those cells'
    int8 codes with the frozen affine params
    (operators/sq.py::ivfsq_codes_upsert). Corpus and code layouts stay
    in lockstep: both are pure functions of the final row set, so the
    exactly-once contract covers the compressed index too — queries via
    ivfsq_search never see a code row whose base row is gone, beyond the
    instant between the two dynamic overwrites (readers of either single
    layout are always consistent; cross-layout readers re-rank against
    the base corpus, which masks a transiently stale short-list entry).

    At 100 TB this is the serving-index ingest path: batch cost is
    O(touched cells) in BOTH layouts, everything else is untouched bytes."""
    from ..operators.ann import ivf_assign, ivf_index_upsert, write_ivf_corpus
    from ..operators.sq import ivfsq_codes_upsert, write_ivfsq_codes

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = _dedup_batch(batch_df, item_id)
        spark = batch_df.sparkSession
        if not os.path.exists(corpus_path):
            assigned = ivf_assign(batch_df, centroids, item_vec=item_vec)
            write_ivf_corpus(assigned, corpus_path)
            write_ivfsq_codes(
                spark.read.parquet(corpus_path), vmin, scale, codes_path,
                item_id=item_id, item_vec=item_vec,
            )
        else:
            touched = ivf_index_upsert(
                spark, corpus_path, batch_df, centroids,
                item_id=item_id, item_vec=item_vec,
            )
            ivfsq_codes_upsert(
                spark, corpus_path, codes_path, vmin, scale, touched,
                item_id=item_id, item_vec=item_vec,
            )

    _run_available_now(
        embeddings_stream, upsert_batch, checkpoint_dir, "ckpt_ivfsqidx_"
    )


def stream_upsert_ivfbq_index(
    embeddings_stream: DataFrame,
    corpus_path: str,
    codes_path: str,
    centroids: DataFrame,
    sums,
    n: int,
    item_id: str = "item_id",
    item_vec: str = "embedding",
    checkpoint_dir: str | None = None,
) -> None:
    """Streaming maintenance for the COMPOSED IVF-BQ index — the binary
    twin of stream_upsert_ivfsq_index with the identical lockstep
    contract: each micro-batch upserts the base cell-partitioned corpus
    (ivf_index_upsert, which returns every rewritten cell including cells
    a moved vector vacated) and re-packs exactly those cells' bit codes
    under the FROZEN thresholds (operators/bq.py::ivfbq_codes_upsert).
    Both layouts stay pure functions of the final row set, so replay is
    idempotent and a streamed index equals a from-scratch build
    byte-for-byte (tested)."""
    from ..operators.ann import ivf_assign, ivf_index_upsert, write_ivf_corpus
    from ..operators.bq import ivfbq_codes_upsert, write_ivfbq_codes

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = _dedup_batch(batch_df, item_id)
        spark = batch_df.sparkSession
        if not os.path.exists(corpus_path):
            assigned = ivf_assign(batch_df, centroids, item_vec=item_vec)
            write_ivf_corpus(assigned, corpus_path)
            write_ivfbq_codes(
                spark.read.parquet(corpus_path), sums, n, codes_path,
                item_id=item_id, item_vec=item_vec,
            )
        else:
            touched = ivf_index_upsert(
                spark, corpus_path, batch_df, centroids,
                item_id=item_id, item_vec=item_vec,
            )
            ivfbq_codes_upsert(
                spark, corpus_path, codes_path, sums, n, touched,
                item_id=item_id, item_vec=item_vec,
            )

    _run_available_now(
        embeddings_stream, upsert_batch, checkpoint_dir, "ckpt_ivfbqidx_"
    )


def stream_upsert_postings_index(
    docs_stream: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
) -> None:
    """Streaming maintenance for the lexical postings artifact
    (operators/postings.py): each micro-batch of documents replaces
    same-id docs and rewrites only the term/doc buckets it touches
    (postings_upsert); the df/stats sidecars are recomputed from those
    same touched buckets — pure functions of the layouts, so a crash
    between writes cannot leave them silently inconsistent (the intent
    marker heals partial upserts on redelivery). The first batch
    bootstraps the artifact. Same idempotence contract as the ANN
    sinks: every layout is a pure function of the final document set,
    so a replayed batch converges and at-least-once delivery is
    exactly-once — and a streamed artifact equals a from-scratch build
    exactly (upsert == rebuild, hash-proven in tests)."""
    from ..operators.postings import postings_upsert, write_postings_index

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = _dedup_batch(batch_df, id_col)
        spark = batch_df.sparkSession
        if not os.path.exists(os.path.join(index_path, "_META.json")):
            write_postings_index(batch_df, index_path, id_col, text_col)
        else:
            postings_upsert(spark, index_path, batch_df, id_col, text_col)

    _run_available_now(
        docs_stream, upsert_batch, checkpoint_dir, "ckpt_postingsidx_"
    )
