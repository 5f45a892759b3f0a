"""Vector math as Catalyst column expressions (JVM-side, codegen'd).

The reference's one hot kernel is the NumPy brute-force L2 distance
(chromadb_acc_experiment.py:527-534: ``np.linalg.norm(all_embeddings - q,
axis=1)``). Here the same math is expressed with SQL higher-order functions
(``zip_with`` + ``aggregate``) so it runs inside whole-stage codegen with no
Python boundary — the scale path for a 100 TB scan. A vectorized pandas_udf
variant exists in ``operators.knn`` for benchmarking the Arrow path; the HOF
path is the default.

All math is done in DOUBLE after an explicit element cast so results are
bit-deterministic (left-to-right accumulation over the array) and
reproducible against external oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Inner product: aggregate(zip_with(a, b, *), 0.0, +)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_dist_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance (ordering-equivalent to L2; cheaper — no sqrt)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_dist(a: Column, b: Column) -> Column:
    """L2 distance — the reference metric ("ChromaDB uses L2",
    chromadb_acc_experiment.py:530-531)."""
    return F.sqrt(l2_dist_sq(a, b))


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))


def unit_normalize(a: Column) -> Column:
    """L2-normalize, preserving element type double."""
    n = l2_norm(a)
    return F.when(n == 0, _as_double(a)).otherwise(
        F.transform(_as_double(a), lambda x: x / n)
    )
