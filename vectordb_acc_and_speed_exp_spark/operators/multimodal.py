"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (north-star [EXT] surface).

The decode libraries (PIL/ffmpeg/etc.) are not in this container, so the
decode kernels are deterministic fakes behind the real Spark plumbing:
``mapInPandas`` with an explicit output schema, Arrow-batched, partition
preserving. Swapping a real decoder in changes only ``_fake_decode``.

The binary test corpus is derived from documents.text (utf-8 bytes) because
the shared testdata has no binary table; schema/plumbing are modality-true.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, checksum string, width int, height int, "
    "n_frames int, feature array<float>"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column + metadata struct (the multimodal data
    model: payload bytes, mime, source)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/fake").alias("mime"),
            F.length(F.col(text_col)).alias("orig_len"),
        ),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for image decode + resize + feature extract.

    A real implementation would raise NotImplementedError without the codec
    libs; the fake derives stable pseudo-features from content bytes so the
    distributed plumbing (schema, batching, skew) is testable.
    """
    digest = hashlib.blake2b(payload, digest_size=16).hexdigest()
    h0 = int(digest[:8], 16)
    return {
        "n_bytes": len(payload),
        "checksum": hashlib.md5(payload).hexdigest(),
        "width": 64 + h0 % 512,
        "height": 64 + (h0 >> 9) % 512,
        "n_frames": 1 + h0 % 16,
        "feature": [((h0 >> s) & 0xFF) / 255.0 for s in range(0, 32, 4)],
    }


def extract_media_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode/feature kernel over binary payloads.

    Arrow-batched; one python worker per partition; output schema is fixed
    so Catalyst can prune/push around the stage."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, "payload").mapInPandas(decode, schema=FEATURE_SCHEMA)
