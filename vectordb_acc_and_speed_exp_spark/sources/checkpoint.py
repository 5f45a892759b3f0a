"""Extraction checkpoint (reference S5: pickle of {texts, metadatas, ids},
create_collections.py:109-167) → an idempotent parquet stage.

The reference re-loads the pickle to skip re-extraction; here the
``documents`` parquet table IS the checkpoint: ``build_or_load`` re-extracts
only when the table doesn't exist. At 100 TB this stage is the natural
materialization boundary — extraction+embedding run once, every experiment
reads the columnar result with pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_documents(df: DataFrame, path: str, snapshot_step: int | None = None) -> None:
    """Persist the documents table. With ``snapshot_step``, adds a
    ``snapshot`` bucket column (page_seq div step) and partitions by it so
    cumulative-snapshot predicates become partition-pruned scans
    (SURVEY.md §4: snapshot-partitioned layout)."""
    from pyspark.sql import functions as F

    writer = df
    if snapshot_step is not None:
        writer = df.withColumn(
            "snapshot", (F.col("page_seq") / snapshot_step).cast("int")
        )
        writer.write.mode("overwrite").partitionBy("snapshot").parquet(path)
    else:
        writer.write.mode("overwrite").parquet(path)


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def build_or_load(
    spark: SparkSession, pdf_dir: str, checkpoint_path: str, **kwargs
) -> DataFrame:
    """Checkpoint-hit-or-extract (CC:115-123): reuse the parquet when
    present, else run the extract pipeline and persist it."""
    from .pdf import extract_pages, page_records, scan_pdf_dir

    marker = os.path.join(checkpoint_path, "_SUCCESS")
    if os.path.exists(marker):
        return read_documents(spark, checkpoint_path)
    docs = page_records(extract_pages(scan_pdf_dir(spark, pdf_dir)))
    write_documents(docs, checkpoint_path, **kwargs)
    return read_documents(spark, checkpoint_path)
