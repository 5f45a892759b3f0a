"""Watermark semantics with genuinely late data, asserting only what Spark
GUARANTEES:

- append-mode window aggregation emits a window exactly once, with its
  on-time contents, after the watermark passes the window end;
- dropDuplicates drops rows older than the watermark (and reports them in
  numRowsDroppedByWatermark).

(A very-late row CAN transiently re-create state for an already-emitted
aggregation window — Spark only promises state retention up to the delay,
not guaranteed dropping — so the aggregation assertion checks the on-time
window's single, correct emission rather than absence of the late one.)
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid

import pyspark.sql.functions as F


def _write_batch(spark, path, rows, mtime_offset):
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, value double"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df.coalesce(1).write.parquet(path)
    now = time.time()
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (now + mtime_offset, now + mtime_offset))


def _run(spark, stream_df, mode):
    name = "wm" + uuid.uuid4().hex[:8]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name), q


def test_ontime_window_emits_once_after_watermark(spark, tmp_path):
    src = str(tmp_path / "s1")
    os.makedirs(src)
    _write_batch(
        spark,
        src + "/b1",
        [(1, "2024-01-01 12:00:00", 1.0), (2, "2024-01-01 12:30:00", 1.0)],
        -120,
    )
    # 15:00 advances the watermark to 14:00 > 13:00, closing the noon window
    _write_batch(spark, src + "/b2", [(3, "2024-01-01 15:00:00", 5.0)], 0)
    schema = spark.read.parquet(src + "/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/b*/")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    table, _ = _run(spark, agg, "append")
    rows = [(r.win.start.hour, r.n, r.s) for r in table.collect()]
    # exactly one emission, the closed noon window, with its on-time content
    assert rows == [(12, 2, 2.0)]


def test_dedup_drops_rows_older_than_watermark(spark, tmp_path):
    from vectordb_acc_and_speed_exp_spark.streaming.events import dedup_stream

    src = str(tmp_path / "s2")
    os.makedirs(src)
    _write_batch(spark, src + "/b1", [(1, "2024-01-01 12:00:00", 1.0)], -120)
    _write_batch(spark, src + "/b2", [(2, "2024-01-01 15:00:00", 1.0)], -60)
    # 10:00 is far below the 14:00 watermark -> guaranteed drop
    _write_batch(spark, src + "/b3", [(99, "2024-01-01 10:00:00", 7.0)], 0)
    schema = spark.read.parquet(src + "/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/b*/")
    )
    table, q = _run(spark, dedup_stream(stream, watermark="1 hour"), "append")
    ids = sorted(r.event_id for r in table.collect())
    assert ids == [1, 2], f"late row must be dropped, got {ids}"
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped >= 1
