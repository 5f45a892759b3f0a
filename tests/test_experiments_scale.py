"""EP3-at-scale sweep plumbing: deterministic corpus expansion + the
recall/scan sweep artifact writer (full-scale numbers live in
EP3_MTLSH.md / experiment_results/, this tests the machinery fast)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from vectordb_acc_and_speed_exp_spark.experiments_scale import (
    expand_embeddings,
    mtlsh_recall_sweep,
)


def test_expand_is_deterministic_and_partition_independent(embeddings):
    src = embeddings.select("vec_id", "embedding")
    a, factor = expand_embeddings(src, 2000, seed=7)
    b, _ = expand_embeddings(src.repartition(7), 2000, seed=7)
    assert factor == 4
    ra = {r.vec_id: r.embedding for r in a.collect()}
    rb = {r.vec_id: r.embedding for r in b.collect()}
    assert ra.keys() == rb.keys() and len(ra) == 2000
    assert all(np.allclose(ra[i], rb[i]) for i in ra)


def test_expand_copy0_is_normalized_original(embeddings):
    src = embeddings.select("vec_id", "embedding")
    expanded, factor = expand_embeddings(src, 1000)
    orig = np.array(embeddings.filter(F.col("vec_id") == 3).first().embedding)
    copy0 = np.array(
        expanded.filter(F.col("vec_id") == 3 * factor).first().embedding
    )
    assert np.allclose(copy0, orig / np.linalg.norm(orig))
    # all expanded vectors are unit-norm
    norms = expanded.select(
        F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x).alias("sq")
    ).agg(F.min("sq"), F.max("sq")).first()
    assert abs(norms[0] - 1.0) < 1e-9 and abs(norms[1] - 1.0) < 1e-9


@pytest.mark.slow
def test_sweep_writes_artifacts_and_monotone_budget(spark, sf_dir, tmp_path):
    prefix = str(tmp_path / "sweep")
    out = mtlsh_recall_sweep(
        spark, sf_dir, sizes=(500, 1000), out_prefix=prefix
    ).collect()
    for suffix in ("_results.json", "_summary.csv", "_recall.svg", "_scan.svg"):
        assert os.path.getsize(prefix + suffix) > 0
    rows = {(r.corpus_size, r.method): r for r in out}
    sizes = {r.corpus_size for r in out}
    assert sizes == {500, 1000}
    for n in sizes:
        # larger budget never scans less or recalls worse
        assert rows[(n, "mtlsh_b256")].scan_fraction >= rows[(n, "mtlsh_b64")].scan_fraction
        assert rows[(n, "mtlsh_b256")].recall_10 >= rows[(n, "mtlsh_b64")].recall_10 - 1e-9
    data = json.load(open(prefix + "_results.json"))
    assert len(data) == len(out)


@pytest.mark.slow
def test_compression_sweep_shapes_and_ordering(spark, sf_dir, tmp_path):
    from vectordb_acc_and_speed_exp_spark.experiments_scale import (
        compression_fidelity_sweep,
    )

    out = compression_fidelity_sweep(
        spark, sf_dir, sizes=(300, 600),
        out_prefix=str(tmp_path / "ep5"),
    )
    rows = {(r.corpus_size, r.method): r for r in out.collect()}
    sizes = sorted({s for s, _ in rows})
    assert len(sizes) == 2
    for n in sizes:
        assert rows[(n, "f32")].recall_10 == 1.0
        # re-rank can only help, and sq8 dominates pq at equal-or-better
        # recall (4 B vs 64 B is the tradeoff)
        assert rows[(n, "pq_rerank")].recall_10 >= rows[(n, "pq_adc")].recall_10 - 1e-9
        assert rows[(n, "sq8_rerank")].recall_10 >= rows[(n, "sq8_scan")].recall_10 - 1e-9
        assert rows[(n, "sq8_scan")].recall_10 >= 0.9
    import os

    for suffix in ("_results.json", "_summary.csv", "_recall.svg"):
        assert os.path.exists(str(tmp_path / "ep5") + suffix)
