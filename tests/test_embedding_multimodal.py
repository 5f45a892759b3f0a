"""Embedding stage (V1) + multimodal plumbing: determinism, dimension,
alignment — the non-SQL-expressible operators' test harness (SURVEY.md §5)."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

from vectordb_acc_and_speed_exp_spark.operators.embedding import (
    embed_documents,
    fake_encode_text,
)
from vectordb_acc_and_speed_exp_spark.operators.multimodal import (
    extract_media_features,
    with_binary_payload,
)


def test_fake_encoder_deterministic_unit_norm():
    a = fake_encode_text("hello world", dim=16)
    b = fake_encode_text("hello world", dim=16)
    c = fake_encode_text("hello worlds", dim=16)
    assert a == b
    assert a != c
    assert len(a) == 16
    assert math.isclose(math.sqrt(sum(x * x for x in a)), 1.0, rel_tol=1e-9)


def test_embed_documents_alignment(documents):
    out = embed_documents(documents.limit(50), text_col="text", dim=16)
    rows = out.select("doc_id", "text", "embedding").collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.embedding) == 16
        expect = fake_encode_text(r.text, 16)
        assert all(
            math.isclose(x, y, rel_tol=1e-6) for x, y in zip(r.embedding, expect)
        )


def test_multimodal_features_schema_and_checksum(documents):
    feats = extract_media_features(with_binary_payload(documents.limit(20)))
    rows = feats.collect()
    assert len(rows) == 20
    src = {r.doc_id: r.text for r in documents.limit(20).collect()}
    for r in rows:
        payload = src[r.doc_id].encode("utf-8")
        assert r.n_bytes == len(payload)
        assert r.checksum == hashlib.md5(payload).hexdigest()
        assert len(r.feature) == 8
        assert 64 <= r.width < 576 and 64 <= r.height < 576
