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


def sample_byte_frames(
    df: DataFrame,
    frame_bytes: int = 32,
    stride: int = 24,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling over opaque binary payloads — the video/audio
    frame-sample plumbing stage (reference: the per-item media loop a
    curation pipeline runs before feature extraction), with fixed-size
    byte windows standing in for codec frames (a real decoder swaps the
    window slicer for frame boundaries; partitioning, schema, and the
    downstream contract are identical).

    Emits (id, frame_idx, frame_off, frame_md5): only FULL frames (short
    tails dropped), frame_off 1-based byte offset, digest of the frame's
    hex encoding (hex, not raw bytes, so external SQL engines that cannot
    digest BLOB slices can replay it — see queries/pipeline.py::
    frame_sample_manifest).

    Scale: pure JVM codegen (substring/hex/md5 HOFs over the binary
    column) — rows never leave their input partition, no shuffle, no
    Python; a 100 TB media corpus maps straight through."""
    n_full = (
        F.floor(
            (F.octet_length(F.col(payload_col)) - F.lit(frame_bytes))
            / F.lit(stride)
        )
        + 1
    )
    n_frames = F.least(
        F.greatest(n_full, F.lit(0)).cast("int"), F.lit(max_frames)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(payload_col).alias("_pl"),
            n_frames.alias("_nf"),
        )
        .filter(F.col("_nf") > 0)
        .select(
            id_col,
            F.posexplode(F.sequence(F.lit(0), F.col("_nf") - 1)).alias(
                "frame_idx", "_i"
            ),
            F.col("_pl"),
        )
        .select(
            id_col,
            F.col("frame_idx").cast("bigint").alias("frame_idx"),
            (F.col("_i") * stride + 1).cast("bigint").alias("frame_off"),
            F.md5(
                F.hex(
                    F.expr(f"substring(_pl, frame_idx * {stride} + 1, {frame_bytes})")
                )
            ).alias("frame_md5"),
        )
    )
