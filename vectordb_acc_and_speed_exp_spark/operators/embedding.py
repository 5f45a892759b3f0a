"""Batch embedding stage (reference V1/V6: SentenceTransformer.encode in
batches of 32 with per-item fallback, create_collections.py:385-449; model
load once per process, create_collections.py:69-71).

Spark-first shape: an ``Iterator[pd.Series] -> Iterator[pd.Series]``
pandas_udf. The iterator form means per-executor one-time model load (the
reference's CC:70 equivalent) amortized over every Arrow batch, and Arrow
batch size replaces the hand-rolled batch-32 loop (SURVEY.md §4).

The real SBERT model (torch) is not available in this container, so the
default encoder is a *deterministic fake*: seeded blake2b of the text drives
a unit-normalized pseudo-random vector. The plumbing — signature, batching,
per-item fallback alignment (CC:420-434), executor-local init — is the real
production shape; swapping in SBERT is changing ``_encode_batch`` only.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_DIM = 64


def fake_encode_text(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Deterministic unit-norm vector from text content (test encoder).
    Pure-python + hashlib so driver, executor, and test processes agree."""
    out: list[float] = []
    i = 0
    while len(out) < dim:
        h = hashlib.blake2b(f"{i}\x1f{text}".encode("utf-8"), digest_size=8).digest()
        (u,) = struct.unpack(">Q", h)
        # map to (-1, 1) uniform; good enough for plumbing tests
        out.append((u / 2**63) - 1.0)
        i += 1
    n = math.sqrt(sum(x * x for x in out)) or 1.0
    return [x / n for x in out]


def md5_encode_text(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Deterministic unit-norm vector whose every arithmetic step is
    reproducible in ANSI SQL (md5 → 60-bit int → double → normalize →
    floor onto a 1e6 grid): the cross-engine-verifiable twin of
    ``fake_encode_text``. Both engines perform the identical IEEE-double
    operation sequence, so the driver's value hash matches bit-for-bit —
    this is what lets the V1 embedding stage (pandas_udf, Arrow batching,
    alignment) be HASH-oracled rather than rows-only checked."""
    comps: list[float] = []
    for i in range(dim):
        h = hashlib.md5(f"{i}\x1f{text}".encode("utf-8")).hexdigest()
        u = int(h[:15], 16)  # 60 bits
        comps.append(u / 2**59 - 1.0)
    n = math.sqrt(sum(x * x for x in comps)) or 1.0
    return [math.floor(x / n * 1e6) / 1e6 for x in comps]


def make_md5_encoder_udf(dim: int = DEFAULT_DIM):
    """Iterator pandas_udf applying :func:`md5_encode_text` per Arrow
    batch — same distributed shape as the production encoder, every step
    SQL-reproducible (see queries/pipeline.py::embed_documents_md5)."""

    def encode_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for b in batches:
            yield pd.Series([md5_encode_text(t or "", dim) for t in b])

    return pandas_udf(encode_iter, returnType="array<double>")


def make_encode_iter(dim: int = DEFAULT_DIM, model_path: str | None = None):
    """The raw ``Iterator[pd.Series] -> Iterator[pd.Series]`` encode
    generator — separated from the pandas_udf wrapper so the real-model
    branch (load-once, batch encode, per-item fallback, zero-vector
    alignment) is unit-testable with an injected mock
    ``sentence_transformers`` module (torch absent in this container)."""

    def encode_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = None
        if model_path is not None:
            try:
                from sentence_transformers import SentenceTransformer

                # load ONCE per worker process (reference CC:69-71),
                # amortized over every Arrow batch this iterator sees
                model = SentenceTransformer(model_path)
            except ImportError:
                model = None
        for batch in batches:
            if model is not None:
                try:
                    vecs = model.encode(batch.fillna("").tolist()).tolist()
                except Exception:
                    # per-item fallback, mirroring create_collections.py:420-434
                    vecs = []
                    for t in batch.fillna(""):
                        try:
                            vecs.append(model.encode([t])[0].tolist())
                        except Exception:
                            vecs.append([0.0] * dim)
            else:
                vecs = [fake_encode_text(t or "", dim) for t in batch]
            yield pd.Series(vecs)

    return encode_iter


def make_encoder_udf(dim: int = DEFAULT_DIM, model_path: str | None = None):
    """Build the encode pandas_udf. ``model_path`` selects a real
    SentenceTransformer when available (import-gated); otherwise the
    deterministic fake is used."""
    return pandas_udf(
        make_encode_iter(dim=dim, model_path=model_path), returnType="array<float>"
    )


def embed_documents(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    model_path: str | None = None,
) -> DataFrame:
    """Attach an embedding column (the reference's _save_collection encode
    stage as one declarative transform)."""
    enc = make_encoder_udf(dim=dim, model_path=model_path)
    return df.withColumn(out_col, enc(F.col(text_col)))


def sanitize_text(col: Column) -> Column:
    """Validity filter + sanitize (reference F4, create_collections.py:349-379):
    drop nulls upstream, strip characters outside the BMP-safe printable set
    (the utf-8 ignore round-trip equivalent; surrogates can't survive this)."""
    return F.regexp_replace(col, r"[\uD800-\uDFFF\x00]", "")
