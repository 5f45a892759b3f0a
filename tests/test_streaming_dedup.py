"""Streaming dedup-at-ingest: the union of per-batch discovered pairs
must equal the batch-mode band-collision pairs over the full corpus, and
replaying the stream must not duplicate anything."""

from pyspark.sql import functions as F

from vectordb_acc_and_speed_exp_spark.io import load_table
from vectordb_acc_and_speed_exp_spark.operators.dedup import (
    _band_collisions,
    _band_table,
    minhash_signatures_df,
    signature_estimate,
)
from vectordb_acc_and_speed_exp_spark.streaming.dedup_maintenance import (
    DEFAULT_BAND_SIZE,
    DEFAULT_EST_THRESHOLD,
    DEFAULT_N_HASHES,
    ingested_dup_pairs,
    stream_dedup_ingest,
)


def _with_planted_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant exact copies across arrival waves so cross-batch matches exist:
    # copy of doc 3 (batch 0) arrives in batch 1, copy of doc 7 in batch 2
    clones = docs.filter(F.col("doc_id").isin(3, 7)).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return docs.unionByName(clones)


def _batch_truth(docs):
    sig = minhash_signatures_df(docs, "doc_id", "text", n_hashes=DEFAULT_N_HASHES)
    bands = _band_table(sig, DEFAULT_BAND_SIZE)
    est = signature_estimate(
        _band_collisions(bands, bands), sig, sig, DEFAULT_N_HASHES
    )
    return {
        (r.id_a, r.id_b): r.est_jaccard_r
        for r in est.filter(
            F.col("est_jaccard_r") >= DEFAULT_EST_THRESHOLD
        ).collect()
    }


def _stage_waves(docs, src_dir):
    # batch 0: ids < 200; batch 1: 200..100002 (incl. clone 100003);
    # batch 2: the rest (incl. clone 100007)
    waves = [
        docs.filter(F.col("doc_id") < 200),
        docs.filter(F.col("doc_id").between(200, 100003)),
        docs.filter(F.col("doc_id") > 100003),
    ]
    for w in waves:
        w.coalesce(1).write.mode("append").parquet(str(src_dir))


def _run_stream(spark, src_dir, idx_path):
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    stream_dedup_ingest(stream, idx_path)


def test_stream_dedup_equals_batch(spark, sf_dir, tmp_path):
    docs = _with_planted_dups(spark, sf_dir)
    src_dir = tmp_path / "doc_arrivals"
    _stage_waves(docs, src_dir)
    idx_path = str(tmp_path / "dedup_idx")
    _run_stream(spark, src_dir, idx_path)

    got = {
        (r.id_a, r.id_b): r.est_jaccard_r
        for r in ingested_dup_pairs(spark, idx_path).collect()
    }
    want = _batch_truth(docs)
    assert got == want
    # the planted cross-batch clones were discovered (est = 1.0)
    assert got[(3, 100003)] == 1.0
    assert got[(7, 100007)] == 1.0


def test_stream_dedup_replay_idempotent(spark, sf_dir, tmp_path):
    docs = _with_planted_dups(spark, sf_dir)
    src_dir = tmp_path / "doc_arrivals"
    _stage_waves(docs, src_dir)
    idx_path = str(tmp_path / "dedup_idx")
    _run_stream(spark, src_dir, idx_path)
    once = sorted(
        map(tuple, ingested_dup_pairs(spark, idx_path).collect())
    )
    n_sigs_once = spark.read.parquet(f"{idx_path}/sigs").count()

    # replay the whole stream with a FRESH checkpoint (worst-case replay:
    # every batch re-delivered) against the already-populated index
    _run_stream(spark, src_dir, idx_path)
    again = sorted(
        map(tuple, ingested_dup_pairs(spark, idx_path).collect())
    )
    assert again == once
    assert spark.read.parquet(f"{idx_path}/sigs").count() == n_sigs_once
