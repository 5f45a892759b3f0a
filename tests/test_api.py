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
    for mode in ("exact", "blas", "lsh"):
        r = store.query("papers", query_texts=texts, k=3, mode=mode).collect()
        tops[mode] = [x.item_id for x in sorted(r, key=lambda x: x.rank)][0]
    assert len(set(tops.values())) == 1, tops


def test_query_validation_and_delete(store, spark):
    with pytest.raises(ValueError):
        store.query("papers")
    with pytest.raises(ValueError):
        store.query("papers", query_texts=["a"], query_vecs=[[0.0] * 16])
    with pytest.raises(ValueError):
        store._path("../escape")
    store.delete_collection("papers")
    assert store.list_collections() == []
