"""JSONL shard sink/source — the interchange format of training-data
pipelines (every major corpus ships as sharded .jsonl/.jsonl.gz).

Extends the reference's JSON results sink (chromadb_speed_experiment.py's
save_results — a driver-side json.dump of a summary dict) to DATA-plane
JSON: distributed line-delimited writes, size-bounded shards, compression,
and loss-less round-trip of nested columns (arrays/structs serialize as
JSON values).

Scale notes: ``maxRecordsPerFile`` bounds shard size so downstream loaders
stream fixed-size files (the sharding contract of public corpora);
``partition_by`` routes shards into source=/lang= directories so consumers
prune by directory. Writes are one narrow pass — no shuffle beyond an
optional repartition to control shard COUNT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
    partition_by: tuple[str, ...] = (),
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write line-delimited JSON shards. Nested columns (arrays, structs)
    serialize as JSON values and round-trip through read_jsonl."""
    w = df.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if compression is not None:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Read JSONL shards. Pass an explicit ``schema`` DDL string in
    production — schema inference is a full extra pass over the data and
    type-widens (int→bigint, float→double) on dirty shards."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
