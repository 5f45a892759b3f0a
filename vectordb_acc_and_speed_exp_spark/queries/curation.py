"""Dataset-curation gate queries: deterministic sampling, hash-based
train/val/test split, and sequence packing — the assembly steps of a
training-data pipeline once cleaning/dedup is done.

All three are pure relational plans (no Python in the hot path) and all
three use the portable md5-derived hash (functions/hashing.py) so DuckDB
computes bit-identical buckets: Spark's own ``hash``/``rand`` would not
cross the engine boundary, and a hash-keyed split is the only split that
stays stable when the corpus is re-partitioned, re-ordered, or appended
to — the property a 100 TB pipeline actually needs (membership of a doc
never depends on what else is in the batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    portable_hash64_seeded,
    portable_hash64_seeded_sql,
)
from ..functions.text import token_count
from ..io import load_table
from . import register

_SEED = 42
_K_PER_STRATUM = 20
_PACK_BUDGET = 2048

_HASH_SQL = portable_hash64_seeded_sql("CAST(doc_id AS VARCHAR)", _SEED)
# identical token-count formulation to textops.text_quality
_NTOK_SQL = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)


@register(
    "stratified_sample",
    oracle=f"""
WITH ranked AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY {_HASH_SQL}, doc_id)
           AS sample_rank
  FROM documents
)
SELECT lang, doc_id, n_chars, sample_rank
FROM ranked WHERE sample_rank <= {_K_PER_STRATUM}
""",
    doc="deterministic stratified sample: top-k docs per lang by seeded "
    "portable hash — reproducible across engines, partitionings, and "
    "re-runs (no rand())",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = portable_hash64_seeded(F.col("doc_id").cast("string"), _SEED)
    w = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    return (
        d.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= _K_PER_STRATUM)
        .select("lang", "doc_id", "n_chars", "sample_rank")
    )


@register(
    "corpus_split",
    oracle=f"""
WITH b AS (
  SELECT lang, n_chars,
         CASE WHEN ({_HASH_SQL}) % 100 < 80 THEN 'train'
              WHEN ({_HASH_SQL}) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY split, lang
""",
    doc="hash-based 80/10/10 train/val/test split: membership is a pure "
    "function of doc_id, so appends never reshuffle existing assignments",
)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = portable_hash64_seeded(F.col("doc_id").cast("string"), _SEED) % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_CHUNK = 500
_STRIDE = 400


@register(
    "chunk_documents",
    oracle=f"""
SELECT doc_id, k AS chunk_id,
       k * {_STRIDE} + 1 AS chunk_start,
       substring(text, CAST(k * {_STRIDE} + 1 AS INT), {_CHUNK}) AS chunk,
       len(substring(text, CAST(k * {_STRIDE} + 1 AS INT), {_CHUNK})) AS chunk_len
FROM documents,
     unnest(generate_series(0,
       CAST(greatest(floor((n_chars - 1) / {_STRIDE}.0), 0) AS BIGINT))) t(k)
""",
    doc="overlapping fixed-window chunking ({}-char chunks, {}-char "
    "stride) with 1-based char offsets — the context-window prep step; "
    "pure explode+substring, rows stay with their doc partition".format(
        _CHUNK, _STRIDE
    ),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # empty docs still yield one (empty) chunk: greatest(..., 0) — DuckDB's
    # generate_series(0,-1) is empty but Spark's sequence(0,-1) DESCENDS
    k_max = F.greatest(
        F.floor((F.col("n_chars") - 1) / F.lit(_STRIDE)), F.lit(0)
    ).cast("bigint")
    return (
        d.withColumn("chunk_id", F.explode(F.sequence(F.lit(0).cast("bigint"), k_max)))
        .withColumn("chunk_start", F.col("chunk_id") * _STRIDE + 1)
        .withColumn(
            "chunk",
            F.expr(f"substring(text, CAST(chunk_start AS INT), {_CHUNK})"),
        )
        .select(
            "doc_id",
            "chunk_id",
            "chunk_start",
            "chunk",
            F.length("chunk").cast("bigint").alias("chunk_len"),
        )
    )


@register(
    "sequence_packing",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id, {_NTOK_SQL} AS n_tokens FROM documents
),
c AS (
  SELECT source, n_tokens,
         COALESCE(sum(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t
)
SELECT source, CAST(floor(cum_before / {_PACK_BUDGET}) AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       round(CAST(sum(n_tokens) AS BIGINT) / {_PACK_BUDGET}.0, 4) AS fill_r
FROM c GROUP BY source, bin_id
""",
    doc="sequence packing (concat-and-chunk): docs stream per source shard "
    "in doc_id order, each starts in the bin where its cumulative token "
    "offset lands; windows are per-source so no global sort at scale",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        c.withColumn(
            "bin_id",
            F.floor(F.col("cum_before") / F.lit(_PACK_BUDGET)).cast("bigint"),
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.round(F.sum("n_tokens") / F.lit(float(_PACK_BUDGET)), 4).alias(
                "fill_r"
            ),
        )
    )
