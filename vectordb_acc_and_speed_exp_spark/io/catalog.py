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
    import math
    import shutil

    staged = path.rstrip("/") + "._compact_staged"
    backup = path.rstrip("/") + "._pre_compact"
    if not os.path.exists(path) and os.path.exists(backup):
        os.rename(backup, path)  # prior run died between the two renames
    for leftover in (staged, backup):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)

    df = spark.read.parquet(path)
    files = [f[len("file:"):] if f.startswith("file:") else f for f in df.inputFiles()]
    total = sum(os.path.getsize(f) for f in files)
    n_after = max(1, math.ceil(total / target_bytes_per_file))
    df.coalesce(n_after).write.mode("overwrite").parquet(staged)
    os.rename(path, backup)
    os.rename(staged, path)
    shutil.rmtree(backup)
    return len(files), n_after
