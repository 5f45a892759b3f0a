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

Unrolled fast path (round 13, guide §4.1 "prefer built-ins"/§1.2 per-task
work — measured, then scoped down): Spark's higher-order functions are
``CodegenFallback`` — the lambda is interpreted per ROW even inside a
WholeStageCodegen span. For a corpus whose dimension is a known constant,
the same left-fold can be emitted as an explicit
``((0.0 + t0) + t1) + ...`` expression over ``getItem(i)`` projections,
which whole-stage codegen compiles to straight-line arithmetic — measured
2.5-4x faster per 500k-row scan with bit-identical results (same element
casts, same fold order, verified exactly on 2.5M pairs; oracle hashes
unchanged).

BUT the unrolled tree is ~400-1300 Catalyst nodes and costs a measured
1.6-3.2 s of DRIVER planning + ~0.5 s codegen compile PER QUERY (timed on
a one-row frame — pure fixed cost), which swamps small scans: the sf0.1
bench regressed 106 -> 141 s with unrolling applied session-wide, while
the one 500k-row full-scan entry improved. So unrolling is OFF by default
and strictly opt-in per call site (``dim=`` argument, threaded through
``operators.knn.exact_knn``) — the right shape for scans big enough that
per-plan seconds amortize (at 100 TB, any full scan). Genuinely large
exact scans in this engine normally route through the Arrow/BLAS kernel
(``operators.simjoin.cosine_knn_join``) instead; the unroll exists for
the no-Python codegen paths.

The dimension is a *hint*, not a contract: every unrolled expression is
guarded by ``size(a) = dim [AND size(b) = dim]`` with the HOF expression as
the ``otherwise`` branch, so vectors of any other length (or mismatched
lengths, where zip_with's null-padding semantics matter) take the exact
old path. A wrong hint can therefore never change a result — only forfeit
the speedup. $SPARK_GRAFT_VECTOR_UNROLL_DIM overrides the session default
(0 = off, the default).
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F


def _unroll_dim_default() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_VECTOR_UNROLL_DIM", "0"))
    except ValueError:
        return 0


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def _fold(a: Column, b: Column, term, dim: int) -> Column:
    """``((0.0 + t0) + t1) + ...`` — the exact left fold that
    ``aggregate(zip_with(a, b, term), 0.0, +)`` performs, unrolled over a
    statically-known dimension so whole-stage codegen compiles it to
    straight-line arithmetic instead of an interpreted per-row lambda."""
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + term(
            a.getItem(i).cast("double"), b.getItem(i).cast("double")
        )
    return acc


def _resolve_dim(dim: int | None) -> int:
    # env read per call, not at import (ADVICE r13): setting the override
    # after this module is imported (tests, notebooks) must take effect;
    # the getenv cost is nanoseconds against plan construction
    return _unroll_dim_default() if dim is None else int(dim)


def _guarded(a: Column, b: Column, unrolled: Column, hof: Column, dim: int) -> Column:
    # size() = -1/null on null input -> guard false/null -> otherwise (HOF)
    return F.when(
        (F.size(a) == dim) & (F.size(b) == dim), unrolled
    ).otherwise(hof)


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Inner product: aggregate(zip_with(a, b, *), 0.0, +)."""
    hof = F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = _resolve_dim(dim)
    if d <= 0:
        return hof
    return _guarded(a, b, _fold(a, b, lambda x, y: x * y, d), hof, d)


def l2_dist_sq(a: Column, b: Column, dim: int | None = None) -> Column:
    """Squared L2 distance (ordering-equivalent to L2; cheaper — no sqrt)."""
    hof = F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = _resolve_dim(dim)
    if d <= 0:
        return hof
    return _guarded(
        a, b, _fold(a, b, lambda x, y: (x - y) * (x - y), d), hof, d
    )


def l2_dist(a: Column, b: Column, dim: int | None = None) -> Column:
    """L2 distance — the reference metric ("ChromaDB uses L2",
    chromadb_acc_experiment.py:530-531)."""
    return F.sqrt(l2_dist_sq(a, b, dim=dim))


def l2_norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim=dim))


def cosine_sim(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    na, nb = l2_norm(a, dim=dim), l2_norm(b, dim=dim)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        dot(a, b, dim=dim) / (na * nb)
    )


def unit_normalize(a: Column) -> Column:
    """L2-normalize, preserving element type double."""
    n = l2_norm(a)
    return F.when(n == 0, _as_double(a)).otherwise(
        F.transform(_as_double(a), lambda x: x / n)
    )
