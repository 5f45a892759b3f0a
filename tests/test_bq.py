"""Binary quantization (operators/bq.py): encode exactness, Hamming
identities, full-shortlist degeneration, recall floor.

The reference has no compressed index (it delegates to hnswlib,
chromadb_acc_experiment.py:622-628); BQ is the [EXT] 1-bit point on the
EP5 bytes/recall ladder. The tests mirror test_sq.py's structure.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectordb_acc_and_speed_exp_spark.operators.bq import (
    bq_encode,
    bq_search_rerank,
    bq_train,
)
from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn


@pytest.fixture(scope="module")
def bq_params(embeddings):
    sums, n = bq_train(embeddings, item_vec="embedding", dim=64)
    return sums, n


def test_train_shape_and_count(bq_params, embeddings):
    sums, n = bq_params
    assert len(sums) == 64
    assert n == embeddings.count()


def test_encode_codes_nonneg_and_deterministic(bq_params, embeddings):
    sums, n = bq_params
    enc1 = bq_encode(embeddings, sums, n, item_id="vec_id").orderBy("item_id")
    enc2 = bq_encode(embeddings, sums, n, item_id="vec_id").orderBy("item_id")
    rows1, rows2 = enc1.collect(), enc2.collect()
    assert rows1 == rows2
    for r in rows1:
        # 32 bits per word, packed without the sign bit => non-negative
        assert 0 <= r.code_lo < 2**32
        assert 0 <= r.code_hi < 2**32


def test_bit_balance_mean_split(bq_params, embeddings):
    """Mean-threshold on a roughly symmetric corpus sets ~half the bits."""
    sums, n = bq_params
    enc = bq_encode(embeddings, sums, n, item_id="vec_id")
    total_bits = enc.select(
        F.sum(F.bit_count("code_lo") + F.bit_count("code_hi")).alias("b")
    ).first()["b"]
    frac = total_bits / (n * 64)
    assert 0.30 < frac < 0.70


def test_self_query_rank1_hamming0(bq_params, embeddings, query_set):
    """A corpus vector queried against the corpus finds itself at Hamming 0
    and L2 0 (codes are a pure function of the vector)."""
    sums, n = bq_params
    res = bq_search_rerank(
        query_set, embeddings, sums, n, k=1, shortlist=10, item_id="vec_id"
    ).collect()
    by_qid = {r.query_id: r for r in res}
    for qid in range(5):
        assert by_qid[qid].item_id == qid
        assert by_qid[qid].hamming == 0
        assert by_qid[qid].dist == 0.0


def test_full_shortlist_equals_exact(bq_params, embeddings, query_set):
    """shortlist >= corpus makes the Hamming stage a no-op filter: the
    re-rank sees every row, so BQ degenerates to exact k-NN."""
    sums, n = bq_params
    corpus_n = embeddings.count()
    bq = bq_search_rerank(
        query_set, embeddings, sums, n, k=10, shortlist=corpus_n,
        item_id="vec_id",
    ).select("query_id", "rank", "item_id")
    exact = exact_knn(query_set, embeddings, k=10, item_id="vec_id").select(
        "query_id", "rank", "item_id"
    )
    assert sorted(map(tuple, bq.collect())) == sorted(map(tuple, exact.collect()))


def test_recall_floor_at_shortlist100(bq_params, embeddings, query_set):
    """1-bit codes + shortlist 100 of 500 should keep recall@10 well above
    random (random 100/500 shortlist => E[recall] ~ 0.2)."""
    sums, n = bq_params
    bq = bq_search_rerank(
        query_set, embeddings, sums, n, k=10, shortlist=100, item_id="vec_id"
    )
    exact = exact_knn(query_set, embeddings, k=10, item_id="vec_id")
    got = {(r.query_id, r.item_id) for r in bq.collect()}
    want = {(r.query_id, r.item_id) for r in exact.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.5, f"BQ recall@10 {recall:.2f} below floor"


def test_ivfbq_fullprobe_equals_exact(
    spark, query_set, embeddings, bq_params, tmp_path
):
    """IVF-BQ with every cell probed and a corpus-sized short-list == exact
    kNN (the composed metamorphic identity), and the codes layout is
    really cell-partitioned."""
    import os

    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )
    from vectordb_acc_and_speed_exp_spark.operators.bq import (
        ivfbq_search,
        write_ivfbq_codes,
    )

    sums, n = bq_params
    cents = kmeans_centroids(embeddings, n_cells=8)
    assigned = ivf_assign(embeddings, cents)
    corpus_path = str(tmp_path / "ivfbq_corpus")
    codes_path = str(tmp_path / "ivfbq_codes")
    write_ivf_corpus(assigned, corpus_path)
    write_ivfbq_codes(assigned, sums, n, codes_path, item_id="vec_id")
    assert len([d for d in os.listdir(codes_path) if d.startswith("cell=")]) >= 2

    corp_n = embeddings.count()
    got = ivfbq_search(
        query_set, spark, codes_path, corpus_path, cents, sums, n,
        k=10, n_probe=8, shortlist=corp_n, item_id="vec_id",
    )
    gt = exact_knn(query_set, embeddings, k=10, item_id="vec_id")
    assert sorted((r.query_id, r.rank, r.item_id) for r in got.collect()) == sorted(
        (r.query_id, r.rank, r.item_id) for r in gt.collect()
    )


def test_ivfbq_pruned_recall(spark, query_set, embeddings, bq_params, tmp_path):
    """Production config (4 of 8 cells, shortlist 100): recall@10 >= 0.5
    (cell coverage binds first, then sign-bit fidelity)."""
    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )
    from vectordb_acc_and_speed_exp_spark.operators.bq import (
        ivfbq_search,
        write_ivfbq_codes,
    )
    from vectordb_acc_and_speed_exp_spark.operators.recall import (
        mean_recall,
        recall_at_k,
    )

    sums, n = bq_params
    cents = kmeans_centroids(embeddings, n_cells=8)
    assigned = ivf_assign(embeddings, cents)
    corpus_path = str(tmp_path / "pbq_corpus")
    codes_path = str(tmp_path / "pbq_codes")
    write_ivf_corpus(assigned, corpus_path)
    write_ivfbq_codes(assigned, sums, n, codes_path, item_id="vec_id")
    ann = ivfbq_search(
        query_set, spark, codes_path, corpus_path, cents, sums, n,
        k=10, n_probe=4, shortlist=100, item_id="vec_id",
    )
    gt = exact_knn(query_set, embeddings, k=10, item_id="vec_id")
    r = mean_recall(recall_at_k(gt, ann, k=10)).first().mean_recall
    assert r >= 0.5, f"IVF-BQ recall too low: {r}"


def test_ivfbq_codes_upsert_lockstep(
    spark, query_set, embeddings, bq_params, tmp_path
):
    """After rewriting some cells of the base corpus, re-encoding exactly
    those cells with frozen thresholds reproduces the from-scratch code
    table byte-for-byte (the derived-artifact lockstep contract)."""
    import pyspark.sql.functions as F

    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )
    from vectordb_acc_and_speed_exp_spark.operators.bq import (
        ivfbq_codes_upsert,
        write_ivfbq_codes,
    )

    sums, n = bq_params
    cents = kmeans_centroids(embeddings, n_cells=8)
    assigned = ivf_assign(embeddings, cents)
    corpus_path = str(tmp_path / "u_corpus")
    codes_path = str(tmp_path / "u_codes")
    write_ivf_corpus(assigned, corpus_path)
    write_ivfbq_codes(assigned, sums, n, codes_path, item_id="vec_id")

    # pick two cells, pretend their corpus partitions were upserted, and
    # refresh only those code directories
    cells = [r.cell for r in assigned.select("cell").distinct().limit(2).collect()]
    ivfbq_codes_upsert(
        spark, corpus_path, codes_path, sums, n, cells, item_id="vec_id"
    )

    fresh_path = str(tmp_path / "fresh_codes")
    write_ivfbq_codes(
        spark.read.parquet(corpus_path), sums, n, fresh_path, item_id="vec_id"
    )
    got = sorted(
        map(tuple, spark.read.parquet(codes_path)
            .select("item_id", "code_lo", "code_hi", "cell").collect())
    )
    want = sorted(
        map(tuple, spark.read.parquet(fresh_path)
            .select("item_id", "code_lo", "code_hi", "cell").collect())
    )
    assert got == want


def test_bq_scan_is_pure_jvm(bq_params, embeddings, query_set):
    """The BQ Hamming path must stay inside whole-stage codegen: no Python
    evaluation nodes anywhere in the physical plan (the property that
    distinguishes it from the numpy-kernel SQ/PQ scans)."""
    sums, n = bq_params
    res = bq_search_rerank(
        query_set, embeddings, sums, n, k=10, shortlist=100, item_id="vec_id"
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "bit_count" in plan


def test_ivfbq_scan_partition_pruned(
    spark, query_set, embeddings, bq_params, tmp_path
):
    """The composed layout's codes scan carries the cell partition filter
    (probing is parquet directory pruning, not a post-filter)."""
    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )
    from vectordb_acc_and_speed_exp_spark.operators.bq import (
        ivfbq_search,
        write_ivfbq_codes,
    )

    sums, n = bq_params
    cents = kmeans_centroids(embeddings, n_cells=8)
    assigned = ivf_assign(embeddings, cents)
    corpus_path = str(tmp_path / "pp_corpus")
    codes_path = str(tmp_path / "pp_codes")
    write_ivf_corpus(assigned, corpus_path)
    write_ivfbq_codes(assigned, sums, n, codes_path, item_id="vec_id")
    res = ivfbq_search(
        query_set, spark, codes_path, corpus_path, cents, sums, n,
        k=10, n_probe=3, shortlist=50, item_id="vec_id",
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pre_encoded_codes_match_inline(bq_params, embeddings, query_set):
    """The serving shape (persisted code table) returns exactly what the
    inline-encode shape returns."""
    from vectordb_acc_and_speed_exp_spark.operators.bq import bq_encode

    sums, n = bq_params
    inline = bq_search_rerank(
        query_set, embeddings, sums, n, k=10, shortlist=100, item_id="vec_id"
    )
    codes = bq_encode(embeddings, sums, n, item_id="vec_id")
    served = bq_search_rerank(
        query_set, embeddings, sums, n, k=10, shortlist=100,
        item_id="vec_id", encoded=codes,
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, served.collect())
    )


def test_pack_matches_python_replay(bq_params, embeddings):
    """The codegen bit-pack reproduces a plain-python replay of the
    threshold rule bit for bit (independent of the DuckDB oracle)."""
    sums, n = bq_params
    rows = embeddings.select("vec_id", "embedding").collect()
    enc = {
        r.item_id: (r.code_lo, r.code_hi)
        for r in bq_encode(embeddings, sums, n, item_id="vec_id").collect()
    }
    for r in rows[:50]:
        lo = hi = 0
        for i, x in enumerate(r.embedding):
            s = round(float(x) * 1_000_000)
            if s * n > int(sums[i]):
                if i < 32:
                    lo |= 1 << i
                else:
                    hi |= 1 << (i - 32)
        assert enc[r.vec_id] == (lo, hi), r.vec_id
