"""Quantizer drift (EP13, operators/drift.py): the frozen-quantizer
retrain trigger must (a) stay silent under in-distribution upserts,
(b) fire on genuinely drifted batches, and (c) reset — with recall
restored — after the offline rebuild it recommends."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from vectordb_acc_and_speed_exp_spark.operators.drift import (
    MIN_UPSERT_ROWS,
    drift_status,
    record_batch_qerr,
    write_drift_baseline,
)


def test_drift_accumulator_math(tmp_path):
    root = str(tmp_path)
    write_drift_baseline(root, train_mean_qerr=2.0, n_train=1000)
    st = drift_status(root)
    assert st["ratio"] is None and not st["retrain_recommended"]
    # two batches: row-weighted mean = (1.9*60 + 4.1*40) / 100 = 2.78
    record_batch_qerr(root, 1.9, 60)
    st = record_batch_qerr(root, 4.1, 40)
    assert st["upsert_n"] == 100
    assert st["upsert_mean_qerr"] == pytest.approx(2.78)
    assert st["ratio"] == pytest.approx(1.39)
    assert st["retrain_recommended"]  # 1.39 > 1.35 trigger, n >= floor


def test_drift_needs_enough_rows(tmp_path):
    root = str(tmp_path)
    write_drift_baseline(root, train_mean_qerr=1.0, n_train=500)
    st = record_batch_qerr(root, 10.0, MIN_UPSERT_ROWS - 1)
    assert st["ratio"] > 3 and not st["retrain_recommended"]
    st = record_batch_qerr(root, 10.0, 1)  # crosses the row floor
    assert st["retrain_recommended"]


def test_no_baseline_is_a_noop(tmp_path):
    assert record_batch_qerr(str(tmp_path), 9.9, 100) == {}
    assert drift_status(str(tmp_path)) == {}


@pytest.fixture()
def drift_store(spark, embeddings, tmp_path):
    from vectordb_acc_and_speed_exp_spark.api import VectorStore

    dim = len(embeddings.select("embedding").first()[0])
    vs = VectorStore(spark, str(tmp_path / "store"), dim=dim)
    vs.create_collection(
        "c",
        embeddings.select(
            F.col("vec_id").cast("string").alias("id"), "embedding"
        ),
    )
    return vs


def _shifted(embeddings, n, delta, tag):
    """n rows shifted by +delta in every dimension — far outside an
    isotropic training distribution for large delta."""
    return embeddings.limit(n).select(
        F.concat(F.lit(tag), F.col("vec_id").cast("string")).alias("id"),
        F.transform(
            F.col("embedding"), lambda x: (x + F.lit(delta)).cast("float")
        ).alias("embedding"),
    )


@pytest.mark.slow
def test_facade_drift_trigger_and_rebuild_restores_recall(
    drift_store, embeddings, spark
):
    """End-to-end through the facade: the first ivfbq query builds the
    IVF artifact + drift baseline; an in-distribution add() keeps the
    ratio near 1; a drifted add() trips the trigger; retrain_quantizers
    + the next query rebuild on the current corpus, resetting the ratio
    and restoring recall for drifted queries."""
    vs = drift_store
    probe = [[float(x) for x in r.embedding]
             for r in embeddings.limit(3).collect()]
    vs.query("c", query_vecs=probe, k=5, mode="ivfbq")  # build + baseline
    ivf_root = os.path.join(vs.root, ".ivf_index", "c")
    assert os.path.exists(os.path.join(ivf_root, "_drift.json"))

    # in-distribution batch (fresh ids, same distribution): ratio ~ 1
    indist = embeddings.limit(MIN_UPSERT_ROWS + 10).select(
        F.concat(F.lit("a"), F.col("vec_id").cast("string")).alias("id"),
        "embedding",
    )
    vs.add("c", indist)
    st = vs.drift_status("c")
    assert st["upsert_n"] >= MIN_UPSERT_ROWS
    assert st["ratio"] < 1.2 and not st["retrain_recommended"]

    # heavily drifted batch: every dim shifted far outside the corpus
    drifted = _shifted(embeddings, MIN_UPSERT_ROWS + 30, 25.0, "d")
    vs.add("c", drifted)
    st = vs.drift_status("c")
    assert st["ratio"] > st["trigger_ratio"]
    assert st["retrain_recommended"]

    # the recommended rebuild: retrain on the current corpus
    dq = [[float(x) for x in r.embedding]
          for r in drifted.limit(3).collect()]
    vs.retrain_quantizers("c")
    got = {
        (r.query_id, r.item_id)
        for r in vs.query("c", query_vecs=dq, k=5, mode="ivfbq").collect()
    }
    gt = {
        (r.query_id, r.item_id)
        for r in vs.query("c", query_vecs=dq, k=5, mode="exact").collect()
    }
    assert len(gt & got) / len(gt) >= 0.8  # fresh centroids cover the drift
    st = vs.drift_status("c")
    assert st["upsert_n"] == 0 and st["ratio"] is None  # baseline reset


@pytest.mark.slow
def test_flat_pq_drift_trigger_and_rebuild_restores_recall(
    drift_store, embeddings, spark
):
    """VERDICT r08 #2, flat-quantizer half: the first mode='pq' query
    builds the code table + a reconstruction-error baseline; an
    in-distribution add() appends O(batch) codes with the FROZEN
    codebooks (no corpus re-encode) and keeps the ratio near 1; a
    drifted add() trips the flat-PQ trigger; the recommended rebuild
    retrains the codebooks on the current corpus, restores recall for
    drifted queries, and resets the accumulator."""
    vs = drift_store
    probe = [[float(x) for x in r.embedding]
             for r in embeddings.limit(3).collect()]
    vs.query("c", query_vecs=probe, k=5, mode="pq", shortlist=100)
    pq_root = os.path.join(vs.root, ".pq_index", "c")
    assert os.path.exists(os.path.join(pq_root, "_drift.json"))

    # in-distribution append: absorbed incrementally (artifact NOT
    # invalidated), served fresh, ratio ~ 1
    indist = embeddings.limit(MIN_UPSERT_ROWS + 10).select(
        F.concat(F.lit("a"), F.col("vec_id").cast("string")).alias("id"),
        "embedding",
    )
    vs.add("c", indist)
    assert os.path.exists(os.path.join(pq_root, "_meta.json"))  # survived
    st = vs.drift_status("c")["families"]["pq"]
    assert st["upsert_n"] >= MIN_UPSERT_ROWS
    assert st["ratio"] < 1.2 and not st["retrain_recommended"]
    # freshness: an appended row is reachable through the pq serve path
    # (query with its own vector, full re-rank of a wide shortlist)
    a0 = indist.first()
    got = vs.query(
        "c", query_vecs=[[float(x) for x in a0.embedding]], k=5, mode="pq",
        shortlist=10_000,
    ).collect()
    assert any(r.item_id == a0.id for r in got)

    # drifted append: frozen codebooks reconstruct it badly -> trigger
    drifted = _shifted(embeddings, MIN_UPSERT_ROWS + 30, 25.0, "d")
    vs.add("c", drifted)
    st = vs.drift_status("c")["families"]["pq"]
    assert st["ratio"] > st["trigger_ratio"]
    assert st["retrain_recommended"]

    # the recommended rebuild: retrain flat quantizers on current corpus
    dq = [[float(x) for x in r.embedding]
          for r in drifted.limit(3).collect()]
    vs.retrain_quantizers("c", families=["pq"])
    got = {
        (r.query_id, r.item_id)
        for r in vs.query(
            "c", query_vecs=dq, k=5, mode="pq", shortlist=100
        ).collect()
    }
    gt = {
        (r.query_id, r.item_id)
        for r in vs.query("c", query_vecs=dq, k=5, mode="exact").collect()
    }
    assert len(gt & got) / len(gt) >= 0.8  # fresh codebooks cover the drift
    st = vs.drift_status("c")["families"]["pq"]
    assert st["upsert_n"] == 0 and st["ratio"] is None  # baseline reset


@pytest.mark.slow
def test_sq_in_distribution_add_does_not_fire(spark, embeddings, tmp_path):
    """Round-12 regression, surfaced by the per-family live drift rows
    (VERDICT r11 #6): the SQ baseline used to be measured IN-SAMPLE —
    per-dim min/max fit on exactly the training rows never clamp on
    those rows — so an in-distribution add() scored ratio ~3.8 against
    trigger 1.35 and recommended a retrain with zero drift. The holdout
    baseline (operators/sq.sq_holdout_qerr: shadow params on a 7/8
    split, error on the held-out 1/8) prices fresh-row clamp exposure
    in, so in-distribution appends stay silent while genuinely shifted
    batches still fire."""
    from vectordb_acc_and_speed_exp_spark.api import VectorStore

    dim = len(embeddings.select("embedding").first()[0])
    vs = VectorStore(spark, str(tmp_path / "sqdrift"), dim=dim)
    vs.create_collection(
        "c",
        embeddings.filter(F.col("vec_id") < 200).select(
            F.col("vec_id").cast("string").alias("id"), "embedding"
        ),
    )
    probe = [[float(x) for x in r.embedding]
             for r in embeddings.limit(1).collect()]
    for mode in ("sq", "ivfsq"):
        vs.query("c", query_vecs=probe, k=3, mode=mode, shortlist=50,
                 n_probe=2)
    indist = embeddings.filter(
        (F.col("vec_id") >= 200)
        & (F.col("vec_id") < 200 + MIN_UPSERT_ROWS + 10)
    ).select(
        F.concat(F.lit("a"), F.col("vec_id").cast("string")).alias("id"),
        "embedding",
    )
    vs.add("c", indist)
    fams = vs.drift_status("c")["families"]
    for f in ("sq", "ivfsq"):
        assert fams[f]["upsert_n"] > 0 and fams[f]["ratio"] is not None, f
        assert not fams[f]["retrain_recommended"], (f, fams[f])
    # sensitivity intact: a genuinely shifted batch still fires
    vs.add("c", _shifted(embeddings, MIN_UPSERT_ROWS + 30, 25.0, "d"))
    fams = vs.drift_status("c")["families"]
    assert fams["sq"]["retrain_recommended"]
    assert fams["ivfsq"]["retrain_recommended"]


@pytest.mark.slow
def test_drift_status_covers_all_six_families(drift_store, embeddings):
    """drift_status()['families'] reports every quantized family once its
    artifact exists (VERDICT r08 #2 done-criterion, + the ivfsq twin)."""
    vs = drift_store
    probe = [[float(x) for x in r.embedding]
             for r in embeddings.limit(1).collect()]
    for mode in ("ivfbq", "ivfpq", "ivfsq", "bq", "pq", "sq"):
        vs.query("c", query_vecs=probe, k=3, mode=mode, shortlist=50,
                 n_probe=2)
    fams = vs.drift_status("c")["families"]
    assert set(fams) == {"ivf", "ivfbq", "ivfpq", "ivfsq", "bq", "pq", "sq"}
    for f, st in fams.items():
        assert st and st["train_mean_qerr"] >= 0.0, f
        assert not st["retrain_recommended"], f
