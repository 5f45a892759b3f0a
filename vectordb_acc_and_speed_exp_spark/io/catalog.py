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

    The events table carries TIMESTAMP(NANOS) which Spark's vectorized
    parquet reader rejects; it is read nanos-as-long and rebuilt as a
    microsecond timestamp (floor division — matching how DuckDB/pyarrow
    truncate nanos to micros)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
