"""Cumulative snapshot semantics (reference: 56 prefix collections,
collection_{num}_{N}pages ⊇ collection_{num-1}, create_collections.py:237-274).

The reference materializes each prefix as a separate ChromaDB collection —
56 near-duplicate copies of the data. The Spark-native model is ONE table
plus a monotonic ``page_seq``; snapshot N is the predicate ``page_seq <= N``
(SURVEY.md §1.1). Written as a partition/sort column, snapshot queries are
parquet min/max-pruned scans — no duplication, no index rebuilds.

Reference glob order is nondeterministic (create_collections.py:101); here
order is fixed by (source, doc_id) — the documented deviation (SURVEY.md §7
hard part b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_page_seq(df: DataFrame, order_cols: tuple[str, ...] = ("source", "doc_id")) -> DataFrame:
    """Attach the monotonic page_seq (1-based). A global window sort — done
    ONCE at ingest and persisted; never in the query path at scale."""
    w = Window.orderBy(*[F.asc(c) for c in order_cols])
    return df.withColumn("page_seq", F.row_number().over(w))


def snapshot(df_with_seq: DataFrame, n: int) -> DataFrame:
    """Snapshot N = first N rows in page_seq order (prefix semantics,
    create_collections.py:266-268)."""
    return df_with_seq.filter(F.col("page_seq") <= n)


def snapshot_sizes(total: int, step: int) -> list[int]:
    """The reference's cumulative ladder: step, 2*step, ..., plus the
    non-multiple remainder collection (create_collections.py:276-328)."""
    sizes = list(range(step, total + 1, step))
    if not sizes or sizes[-1] != total:
        sizes.append(total)
    return sizes


def snapshot_stats(df_with_seq: DataFrame, sizes: list[int]) -> DataFrame:
    """Per-snapshot rollup in ONE pass: instead of re-scanning the table per
    snapshot (the reference loops collections, chromadb_speed_experiment.py:
    438-442), tag each row with every snapshot it belongs to via a range
    join against the (tiny, broadcast) size ladder and aggregate once."""
    from ..io.local import local_df

    spark = df_with_seq.sparkSession
    ladder = local_df(spark, [(s,) for s in sizes], "snapshot_size int")
    tagged = df_with_seq.join(
        F.broadcast(ladder), F.col("page_seq") <= F.col("snapshot_size")
    )
    return tagged.groupBy("snapshot_size").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
