"""VectorStore facade: the ChromaDB-client-shaped round-trip
(create → add → count → query → delete), every mode agreeing on top-1."""

from __future__ import annotations

import pytest

from vectordb_acc_and_speed_exp_spark.api import VectorStore


@pytest.fixture(scope="module")
def store(spark, documents, tmp_path_factory):
    vs = VectorStore(spark, str(tmp_path_factory.mktemp("store")), dim=16)
    docs = documents.limit(100).selectExpr("cast(doc_id as string) as id", "text")
    vs.create_collection("papers", docs)
    return vs


def test_catalog_roundtrip(store, spark, documents):
    assert store.list_collections() == ["papers"]
    assert store.count("papers") == 100
    extra = documents.limit(120).subtract(documents.limit(100)).selectExpr(
        "cast(doc_id as string) as id", "text"
    )
    store.add("papers", extra)
    assert store.count("papers") == 120
    assert "embedding" in store.get("papers").columns


def test_query_by_text_finds_itself(store, documents):
    probe = documents.limit(3).collect()
    texts = [r.text for r in probe]
    res = store.query("papers", query_texts=texts, k=5, mode="exact").collect()
    top1 = {r.query_id: r for r in res if r.rank == 1}
    for qid, row in top1.items():
        assert row.item_id == str(probe[qid].doc_id)
        assert row.dist < 1e-6  # same text -> same fake embedding


def test_query_modes_agree_on_top1(store, documents):
    texts = [documents.limit(1).first().text]
    tops = {}
    for mode in ("exact", "blas", "lsh", "graph"):
        r = store.query("papers", query_texts=texts, k=3, mode=mode).collect()
        tops[mode] = [x.item_id for x in sorted(r, key=lambda x: x.rank)][0]
    assert len(set(tops.values())) == 1, tops


def test_graph_index_incremental_add(store, documents):
    """The first graph query built the index (test above); add() must keep
    it fresh via shard upsert — a doc added AFTER the build is found as its
    own top-1 without any rebuild-from-scratch."""
    import os

    idx_dir = os.path.join(store.root, ".graph_index", "papers")
    assert os.path.exists(idx_dir)  # built lazily by the graph query
    assert store.list_collections() == ["papers"]  # dot-dir hidden
    extra = documents.limit(140).subtract(documents.limit(120)).selectExpr(
        "cast(doc_id as string) as id", "text"
    )
    store.add("papers", extra)
    assert store.count("papers") == 140
    probe = extra.limit(1).collect()[0]
    r = store.query("papers", query_texts=[probe.text], k=3, mode="graph").collect()
    top1 = [x for x in r if x.rank == 1][0]
    assert top1.item_id == probe.id and top1.dist < 1e-6


def test_query_validation_and_delete(store, spark):
    with pytest.raises(ValueError):
        store.query("papers")
    with pytest.raises(ValueError):
        store.query("papers", query_texts=["a"], query_vecs=[[0.0] * 16])
    with pytest.raises(ValueError):
        store._path("../escape")
    store.delete_collection("papers")
    assert store.list_collections() == []
