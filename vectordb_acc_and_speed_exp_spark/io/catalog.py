"""Table catalog over the parquet test corpus.

Mirrors the reference's collection catalog ops (SURVEY.md S6/S8:
``collection.get`` / ``create_collection`` / ``list_collections`` /
``count()``, create_collections.py:176,245,260; chromadb_speed_experiment.py:408)
as plain Spark catalog + parquet operations. A "collection" here is just a
(filtered view of a) parquet table — snapshot semantics live in
``operators.snapshots``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Plain ``spark.read.parquet`` so Catalyst keeps
    full pushdown/pruning freedom (reference S6 is a full materialize,
    chromadb_acc_experiment.py:521-527 — here it stays lazy).

    The events table's ``ts`` column has shipped as TIMESTAMP(NANOS) (which
    Spark's vectorized parquet reader rejects) and as TIMESTAMP(MICROS)
    without timezone (which Spark reads as TIMESTAMP_NTZ — rejected by
    ``unix_millis`` / watermarks / ``session_window``). Both are normalized
    here to a plain TIMESTAMP whose epoch value equals the stored wall-clock
    read as UTC — exactly how DuckDB's ``epoch_ms`` treats naive timestamps —
    so downstream epoch math is oracle-stable regardless of which physical
    type the corpus carries or the session's timezone."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # session-WIDE by necessity (the physical reader consults the conf
        # at action time); get_spark declares the same engine default —
        # this line only covers vanilla driver-built sessions
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # NTZ -> LTZ with the naive wall-clock read as UTC (DuckDB
            # semantics), WITHOUT touching the session timezone: the cast's
            # timezone is resolved at ANALYSIS time (measured — not action
            # time), i.e. the session tz S in force right here. It yields
            # epoch = W - offset(S); from_utc_timestamp(·, lit(S)) adds
            # offset(S) back. Baking S as a literal keeps both halves on
            # the same tz no matter what the caller sets later, so the
            # composition always reads the wall clock as UTC. (Wall clocks
            # inside a DST gap of S are the only inexact inputs; the
            # corpus carries none.)
            tz_now = spark.conf.get("spark.sql.session.timeZone")
            df = df.withColumn(
                "ts",
                F.from_utc_timestamp(F.col("ts").cast("timestamp"), F.lit(tz_now)),
            )
        return df
    return spark.read.parquet(path)


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin an under-partitioned small scan across the session's
    cores before CPU-heavy per-row work (tokenize / shingle / gram
    explode).

    Parquet can't split inside a row group, and a small table often ships
    as one row group per file — so its scan stage is ONE task and the
    per-row text work ahead of the first shuffle runs single-threaded no
    matter how many cores the session has. At 100 TB a table has thousands
    of row groups and this is a no-op (the guard below); shuffling a big
    corpus to "spread" it would be the bug, not the fix. Call it AFTER
    pushdown-eligible filters — a repartition above a filter would block
    the scan-level pushdown.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view (catalog surface, reference S8)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Collection writer (reference S7, create_collections.py:451-468).

    The reference hand-batches adds at <=5000 rows; Spark writers batch
    natively, so this is a plain parquet write."""
    df.write.mode(mode).parquet(path)


def compact_table(
    spark: SparkSession,
    path: str,
    target_bytes_per_file: int = 128 << 20,
) -> tuple[int, int]:
    """Small-file compaction for a parquet directory — the maintenance job
    every streaming/upsert sink eventually needs (each micro-batch append
    adds files; thousands of KB-files make the scan task-scheduling-bound
    at 100 TB). Rewrites the directory into ``ceil(total_bytes / target)``
    files via ``coalesce`` (narrow — no shuffle), staged next to the
    original and swapped in. Crash safety: the data always exists in full
    at ``path``, ``._pre_compact`` or ``._compact_staged`` — never a mix —
    and the next call self-heals: a crash in the instant between the two
    renames (path absent, backup present) is rolled back by restoring the
    backup, and stale staging/backup dirs from any earlier crash are
    removed before staging anew. Returns (n_files_before, n_files_after).

    Row-identical by construction (same data, fewer files); partitioned
    layouts should compact per partition directory instead (call this on
    each ``cell=``/``snapshot=`` directory)."""
    _heal_crashed_rewrite(path)
    df = spark.read.parquet(path)
    n_before, n_after = _sized_file_counts(df, target_bytes_per_file)
    _rewrite_in_place(
        path,
        lambda staged: df.coalesce(n_after).write.mode("overwrite").parquet(staged),
    )
    return n_before, n_after


def optimize_layout(
    spark: SparkSession,
    path: str,
    cluster_by: list[str],
    target_bytes_per_file: int = 128 << 20,
) -> tuple[int, int]:
    """Cluster a parquet directory on ``cluster_by`` so predicates on those
    columns prune at scan time — the OPTIMIZE/CLUSTER BY maintenance job of
    a table format, as a plain parquet rewrite.

    Why this is a 100 TB lever: parquet footers carry per-file and
    per-row-group min/max for every column, and Spark's scan pushes
    predicates into the reader — but on an unclustered layout every file's
    [min, max] spans the whole domain and nothing skips. After
    ``repartitionByRange(cluster_by)`` + ``sortWithinPartitions``, each
    output file owns a disjoint key range (sampled range boundaries keep
    file sizes near-equal regardless of value skew — unlike a
    ``partitionBy(col)`` dir-per-value layout, which explodes into small
    files on high-cardinality keys), so an equality or range predicate on
    the cluster key reads ~1/distinct-fraction of the bytes instead of all
    of them. This composes with the filtered-search exact branch
    (operators/filtered.py): a ``where=`` on a clustered metadata column
    turns the exact-over-survivors full scan into a pruned scan with zero
    logic changes — the pushed filter meets tight row-group stats.

    Same crash discipline as :func:`compact_table` (staged next to the
    original, two-rename swap, self-healing). Row-identical by
    construction: only file assignment and intra-file order change.
    Returns (n_files_before, n_files_after)."""
    _heal_crashed_rewrite(path)
    df = spark.read.parquet(path)
    n_before, n_after = _sized_file_counts(df, target_bytes_per_file)
    _rewrite_in_place(
        path,
        lambda staged: (
            df.repartitionByRange(n_after, *cluster_by)
            .sortWithinPartitions(*cluster_by)
            .write.mode("overwrite")
            .parquet(staged)
        ),
    )
    from .relcache import assert_layout_depth

    assert_layout_depth(path, "optimized layout")
    return n_before, n_after


def _sized_file_counts(df: DataFrame, target_bytes_per_file: int) -> tuple[int, int]:
    """(current file count, byte-budgeted target file count) for a scanned
    parquet directory — from the driver-side file listing, no data read."""
    import math

    files = [f[len("file:"):] if f.startswith("file:") else f for f in df.inputFiles()]
    total = sum(os.path.getsize(f) for f in files)
    return len(files), max(1, math.ceil(total / target_bytes_per_file))


def _rewrite_in_place(path: str, write_staged) -> None:
    """Crash-safe in-place parquet rewrite shared by compaction and layout
    clustering — now a thin alias for the commit-protocol seam
    (io/commitproto.py::swap_directory), where the local-FS atomic-rename
    assumption and its object-store replacement are stated once
    (VERDICT r07 #8). Contract unchanged: the data always exists in full
    at ``path``, the backup, or the staging dir — never a mix;
    ``write_staged`` must re-scan ``path`` lazily; callers run
    :func:`_heal_crashed_rewrite` before their first read of ``path``."""
    from .commitproto import swap_directory

    swap_directory(path, write_staged)


def _heal_crashed_rewrite(path: str) -> None:
    """Roll back / clean up any state a crashed :func:`_rewrite_in_place`
    left behind (commitproto.heal_swap). Idempotent; cheap (three stats)
    when there is nothing to heal."""
    from .commitproto import heal_swap

    heal_swap(path)
