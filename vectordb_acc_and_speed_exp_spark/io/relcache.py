"""Session-cached artifact-layout relations.

Every ``spark.read.parquet`` of an index artifact re-runs the
file-listing job and footer reads (~0.12-0.15 s per call measured at
sf0.1), and the serve paths read 2-4 layouts per query — RM3 twice over,
the composed ANN paths (centroids + codes + corpus) three times.
``read_layout`` keeps ONE DataFrame per (applicationId, path), keyed by a
stat signature of the layout (paths + mtimes + sizes — O(artifact file
count) driver-side stats, the same discipline as the builds' source
fingerprints).

Invalidation is correctness, not just speed: an upsert's dynamic
partition overwrite DELETES old bucket/cell files, so a stale FileIndex
would throw on missing files (or silently miss new partitions). Any
write changes the signature, so the next read instantiates a fresh
relation; replays over unchanged files reuse the cached plan. Keyed by
applicationId so a new session never sees a dead session's plans.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

_REL_CACHE: dict = {}
# Bounded (ADVICE r07): a long-lived process cycling sessions or touching
# many artifact paths must not leak driver memory / JVM plan references.
# Dead applications' entries are evicted on insert; past the cap the
# oldest entry falls out (dict preserves insertion order — same idiom as
# operators/filtered.py's _PLAN_CACHE).
_REL_CACHE_MAX = 256


def layout_sig(path: str) -> str:
    """Stat signature over the layout's TOP-LEVEL entries only —
    (name, mtime_ns, size) of each direct child, O(partition dirs), never
    O(files).  Sufficient because every observable change to a layout
    changes top-level state: Spark writes commit a fresh ``_SUCCESS`` at
    the layout root; creating/deleting part files inside a partition dir
    bumps that dir's mtime (POSIX directory semantics — parquet files are
    never modified in place); emptied partition dirs are removed
    (entry-count change).  Replaces the full os.walk per read (VERDICT
    r07: O(artifact file count) driver-side stats were themselves a
    serving floor at 100 TB file counts)."""
    parts = []
    try:
        with os.scandir(path) as it:
            for e in it:
                try:
                    st = e.stat()
                except OSError:
                    continue
                parts.append(f"{e.name}:{st.st_mtime_ns}:{st.st_size}")
    except (FileNotFoundError, NotADirectoryError):
        return "missing"
    return hashlib.md5("|".join(sorted(parts)).encode()).hexdigest()


def read_layout(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet(path)`` with the relation cached per session
    while the layout's files are unchanged (see module docstring)."""
    app = spark.sparkContext.applicationId
    key = (app, path)
    sig = layout_sig(path)
    hit = _REL_CACHE.get(key)
    if hit is not None and hit[0] == sig:
        return hit[1]
    df = spark.read.parquet(path)
    # dead sessions' plans can never be reused — drop them on insert
    for stale in [k for k in _REL_CACHE if k[0] != app]:
        del _REL_CACHE[stale]
    _REL_CACHE[key] = (sig, df)
    while len(_REL_CACHE) > _REL_CACHE_MAX:
        del _REL_CACHE[next(iter(_REL_CACHE))]
    return df
