"""Structured Streaming surface over the events table ([EXT]; the reference
is batch-only — SURVEY.md §2.9 marks streaming absent — but the north-star
pipeline needs event streams).

Patterns: file-source readStream with ``availableNow`` (bounded replay of
the parquet events table as a stream), watermark + tumbling window
aggregation, and stateful sessionization via applyInPandasWithState.

The tumbling aggregation has a batch twin (queries/relational.py::
events_hourly) — identical results on bounded input, which is what the
oracle checks.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (schema pinned from a
    batch peek — required by readStream). Nanosecond timestamps are read
    as long and rebuilt at microsecond precision, as in io.catalog."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # The file stream source requires a directory; stage a symlink dir when
    # the events table is a single parquet file (the shared testdata layout).
    if os.path.isfile(path):
        stage = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(path, os.path.join(stage, "part-0.parquet"))
        path = stage
    stream = spark.readStream.schema(schema).format("parquet").load(path)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Same normalization as io.catalog.load_table: watermarks/windows
        # need TIMESTAMP, and the epoch must equal the stored naive
        # wall-clock read as UTC (DuckDB semantics). The cast's timezone is
        # resolved at analysis time (the session tz S in force here, see
        # io.catalog.load_table): epoch = W - offset(S), and
        # from_utc_timestamp(·, lit(S)) adds offset(S) back — session-tz-
        # independent without conf mutation.
        tz_now = spark.conf.get("spark.sql.session.timeZone")
        stream = stream.withColumn(
            "ts",
            F.from_utc_timestamp(F.col("ts").cast("timestamp"), F.lit(tz_now)),
        )
    return stream


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation (1 hour)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias(
                "sum_value"
            ),
        )
    )


def run_stream_to_batch(result: DataFrame, mode: str = "complete") -> DataFrame:
    """Execute a streaming aggregation with Trigger.AvailableNow into a
    memory sink and return the final table (bounded-stream semantics ==
    batch semantics; used by tests and the oracle-checked entry)."""
    name = "s" + uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(name)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Stateful sessionization with applyInPandasWithState: per-user state
    carries (session_start_ms, last_ms, n_events); a gap > gap_minutes
    closes a session.

    NoTimeout is deliberate: with bounded replay (availableNow) a
    processing-time timeout leaves the final trigger spinning in
    "cleaning up state"; instead every batch emits a ``closed=false``
    snapshot row for each still-open session (dedupe downstream on an
    unbounded stream; exactly one per session on bounded input).

    Batch twin: queries/relational.py::events_sessions (lag + running sum).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000
    out_schema = (
        "user_id bigint, session_start_ms bigint, session_end_ms bigint, "
        "n_events bigint, closed boolean"
    )
    state_schema = "start_ms bigint, last_ms bigint, n bigint"

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        rows = []
        ts_ms: list[int] = []
        for pdf in pdf_iter:
            ts_ms.extend(
                (pdf["ts"].astype("int64") // 1_000_000).tolist()
            )
        ts_ms.sort()
        if state.exists:
            start_ms, last_ms, n = state.get
        else:
            start_ms, last_ms, n = ts_ms[0], ts_ms[0], 0
        for t in ts_ms:
            if t - last_ms > gap_ms:
                rows.append(
                    {
                        "user_id": user_id,
                        "session_start_ms": start_ms,
                        "session_end_ms": last_ms,
                        "n_events": n,
                        "closed": True,
                    }
                )
                start_ms, n = t, 0
            last_ms = t if t > last_ms else last_ms
            n += 1
        state.update((start_ms, last_ms, n))
        rows.append(
            {
                "user_id": user_id,
                "session_start_ms": start_ms,
                "session_end_ms": last_ms,
                "n_events": n,
                "closed": False,
            }
        )
        yield pd.DataFrame(rows)

    return (
        events.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming twin of operators/dedup.py::exact_dedup (state bounded
    by the watermark; duplicate late arrivals beyond it are dropped by
    the watermark itself)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def stream_to_parquet(
    result: DataFrame, out_dir: str, mode: str = "append"
) -> None:
    """foreachBatch parquet writer (streaming form of the collection
    writer S7). Each micro-batch lands in its own ``batch_id=N`` partition
    directory written with overwrite mode, so a batch replayed after a
    failure overwrites its own directory instead of appending duplicates —
    that batch-id keying is what upgrades foreachBatch's at-least-once
    delivery to exactly-once for this sink. Readers see ``batch_id`` as a
    normal partition column on ``spark.read.parquet(out_dir)``."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    ckpt = tempfile.mkdtemp(prefix="ckpt_sink_")
    q = (
        result.writeStream.foreachBatch(write_batch)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def purchase_click_join_stream(
    events: DataFrame, lookback_minutes: int = 60, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's clicks in the preceding ``lookback_minutes`` — the attribution
    join, run ONLINE. Both sides are watermarked and the join condition
    carries the time bound, which is what lets Spark expire buffered state
    (state per side ≈ watermark + lookback of events, independent of
    stream length — the 100 TB/day-safe shape).

    Both sides derive from the same source stream (a self-join of the
    events stream split by event_type). Append-mode output; batch twin =
    the identical DataFrame join on the bounded table
    (test_streaming.py::test_stream_stream_join_matches_batch).
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.withWatermark("click_ts", watermark)
    p = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback_minutes} MINUTES")
        )
    )
    return p.join(c, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "purchase_value",
    )


def shard_col(item_col: str, n_shards: int):
    """THE shard-routing expression of the heavy-hitters stream —
    ``pmod(portable_hash64(cast(item as string)), n_shards)`` — factored
    out so the stream and the exactness-precondition guard in
    queries/pipeline.py (streaming_heavy_hitters) derive shards from one
    definition and can never silently desynchronize: any future change
    (seeded hash, signed hash, non-string items) moves both together."""
    from ..functions.hashing import portable_hash64

    return F.pmod(
        portable_hash64(F.col(item_col).cast("string")), F.lit(n_shards)
    ).cast("bigint")


def heavy_hitters_stream(
    events: DataFrame,
    capacity: int = 32,
    n_shards: int = 4,
    item_col: str = "event_type",
) -> DataFrame:
    """Streaming frequent-items maintenance: space-saving sketches
    (Metwally et al. 2005, "Efficient computation of frequent and top-k
    elements in data streams") kept fresh at ingest via
    applyInPandasWithState — the trending-items / hot-domains monitor a
    training-data ingest pipeline runs next to dedup-at-ingest.

    Items route to shard ``portable_hash64(item) % n_shards`` — each item
    lives in exactly ONE shard, so per-shard sketches never double-count
    and the global answer is the plain union of shard snapshots (no sketch
    merge needed).  Per shard the state is the classic capped counter set:
    a tracked item increments; an untracked item evicts the current
    minimum, inheriting its count as the new item's error bound.
    Guarantees (per shard, n = items seen by the shard): every item with
    true count > n/capacity is tracked, and
    ``est_count - max_err <= true <= est_count``.

    Each batch that touches a shard re-emits the shard's FULL sketch as a
    snapshot tagged with a per-shard batch sequence number (append mode);
    the live sketch is the max-seq snapshot per shard.  With distinct
    items <= capacity nothing is ever evicted and the sketch is EXACT and
    arrival-order-independent — the property the oracled query
    ``streaming_heavy_hitters`` hash-checks end-to-end; the eviction path
    is pinned by unit tests at capacity 2.

    Scale: state is O(capacity) per shard, shards bound parallelism, and
    per-batch work is O(batch + capacity) per touched shard — corpus size
    never enters."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "shard bigint, item string, est_count bigint, max_err bigint, "
        "n_shard bigint, batch_seq bigint"
    )
    state_schema = (
        "items array<string>, counts array<bigint>, errs array<bigint>, "
        "n_total bigint, seq bigint"
    )

    def fn(key, pdf_iter, state: GroupState):
        (shard,) = key
        if state.exists:
            items, counts, errs, n_total, seq = state.get
            sketch = {
                it: [int(c), int(e)] for it, c, e in zip(items, counts, errs)
            }
            n_total, seq = int(n_total), int(seq)
        else:
            sketch, n_total, seq = {}, 0, 0
        for pdf in pdf_iter:
            for it in pdf["item"]:
                n_total += 1
                if it in sketch:
                    sketch[it][0] += 1
                elif len(sketch) < capacity:
                    sketch[it] = [1, 0]
                else:
                    # tie-break ties on min-count by item so eviction (and
                    # hence sketch contents) is reproducible regardless of
                    # dict insertion order / arrival order (ADVICE round 5)
                    victim = min(
                        sketch.items(), key=lambda kv: (kv[1][0], kv[0])
                    )
                    vmin = victim[1][0]
                    del sketch[victim[0]]
                    sketch[it] = [vmin + 1, vmin]
        seq += 1
        state.update(
            (
                list(sketch.keys()),
                [v[0] for v in sketch.values()],
                [v[1] for v in sketch.values()],
                n_total,
                seq,
            )
        )
        yield pd.DataFrame(
            [
                {
                    "shard": shard,
                    "item": it,
                    "est_count": c,
                    "max_err": e,
                    "n_shard": n_total,
                    "batch_seq": seq,
                }
                for it, (c, e) in sketch.items()
            ]
        )

    staged = events.withWatermark("ts", "2 hours").select(
        F.col("ts"),
        F.col(item_col).cast("string").alias("item"),
        shard_col(item_col, n_shards).alias("shard"),
    )
    return staged.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_sketch(snapshots: DataFrame) -> DataFrame:
    """The live sketch from heavy-hitters snapshots: per shard, the rows of
    the highest batch sequence number (shards untouched by late batches
    keep their last emitted snapshot)."""
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(F.desc("batch_seq"))
    return (
        snapshots.withColumn("_r", F.dense_rank().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )
