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


class _MockSBERT:
    """Stands in for sentence_transformers.SentenceTransformer: batch
    encode returns dim-2 vectors; texts containing 'poison' make the BATCH
    call fail (exercising the per-item fallback), and the poison item
    itself fails per-item too (exercising zero-vector alignment)."""

    n_loads = 0

    def __init__(self, path):
        _MockSBERT.n_loads += 1
        self.path = path

    def encode(self, texts):
        import numpy as np

        if any("poison" in t for t in texts):
            if len(texts) > 1:
                raise RuntimeError("batch failed")
            raise RuntimeError("item failed")
        return np.array([[float(len(t)), 1.0] for t in texts])


def test_real_model_branch_with_mock_sbert(monkeypatch):
    """Covers the import-gated SentenceTransformer branch without torch:
    model loads once per iterator (not per batch), healthy batches use the
    batch call, a failing batch falls back per item, and the failing item
    becomes an aligned zero vector (create_collections.py:420-434)."""
    import sys
    import types

    import pandas as pd

    from vectordb_acc_and_speed_exp_spark.operators.embedding import (
        make_encode_iter,
    )

    mod = types.ModuleType("sentence_transformers")
    mod.SentenceTransformer = _MockSBERT
    monkeypatch.setitem(sys.modules, "sentence_transformers", mod)
    _MockSBERT.n_loads = 0

    batches = [
        pd.Series(["ok", "fine"]),
        pd.Series(["good", "has poison inside", "also ok"]),
    ]
    out = list(make_encode_iter(dim=2, model_path="mock-model")(iter(batches)))
    assert _MockSBERT.n_loads == 1  # load-once per worker, not per batch
    assert [len(s) for s in out] == [2, 3]  # alignment preserved
    assert out[0].tolist() == [[2.0, 1.0], [4.0, 1.0]]
    good, poison, also = out[1].tolist()
    assert good == [4.0, 1.0] and also == [7.0, 1.0]
    assert poison == [0.0, 0.0]  # failed item -> zero vector, not dropped


def test_missing_model_package_falls_back_to_fake():
    """model_path set but sentence_transformers unimportable -> the
    deterministic fake encoder, same as model_path=None."""
    import pandas as pd

    from vectordb_acc_and_speed_exp_spark.operators.embedding import (
        fake_encode_text,
        make_encode_iter,
    )

    out = list(
        make_encode_iter(dim=4, model_path="no-such-model")(iter([pd.Series(["x"])]))
    )
    assert out[0].tolist() == [fake_encode_text("x", 4)]


def test_sample_byte_frames_matches_python_slicing(documents):
    """Frame sampling (byte-window stand-in for codec frames): every Spark
    row must equal the pure-Python slicing of the same payload — full
    frames only, stride placement, max_frames cap, hex-digest contents."""
    from vectordb_acc_and_speed_exp_spark.operators.multimodal import (
        sample_byte_frames,
    )

    frame_bytes, stride, max_frames = 32, 24, 8
    docs = documents.limit(40)
    out = sample_byte_frames(
        with_binary_payload(docs),
        frame_bytes=frame_bytes,
        stride=stride,
        max_frames=max_frames,
    ).collect()

    expect: dict[str, list[tuple[int, int, str]]] = {}
    for r in docs.select("doc_id", "text").collect():
        payload = r.text.encode("utf-8")
        frames = []
        for i in range(max_frames):
            chunk = payload[i * stride : i * stride + frame_bytes]
            if len(chunk) < frame_bytes:
                break
            frames.append(
                (i, i * stride + 1, hashlib.md5(chunk.hex().upper().encode()).hexdigest())
            )
        if frames:
            expect[r.doc_id] = frames

    got: dict[str, list[tuple[int, int, str]]] = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.frame_idx, r.frame_off, r.frame_md5))
    for k in got:
        got[k].sort()
    assert got == expect
    # short docs (< frame_bytes) emit nothing rather than a padded frame
    assert all(len(v) >= 1 for v in expect.values())


def test_sample_byte_frames_short_payload_empty(spark):
    from vectordb_acc_and_speed_exp_spark.operators.multimodal import (
        sample_byte_frames,
    )

    df = spark.createDataFrame(
        [("a", bytearray(b"tiny")), ("b", bytearray(b"x" * 32))],
        "doc_id string, payload binary",
    )
    rows = sample_byte_frames(df, frame_bytes=32, stride=24, max_frames=8).collect()
    # "tiny" has no full 32-byte frame; "x"*32 has exactly one
    assert [(r.doc_id, r.frame_idx, r.frame_off) for r in rows] == [("b", 0, 1)]


def test_md5_encoder_deterministic_unit_norm():
    import math

    from vectordb_acc_and_speed_exp_spark.operators.embedding import (
        md5_encode_text,
    )

    v1 = md5_encode_text("hello world", 16)
    v2 = md5_encode_text("hello world", 16)
    assert v1 == v2 and len(v1) == 16
    n = math.sqrt(sum(x * x for x in v1))
    assert abs(n - 1.0) < 1e-4  # unit up to the 1e-6 floor grid
    assert md5_encode_text("other", 16) != v1
