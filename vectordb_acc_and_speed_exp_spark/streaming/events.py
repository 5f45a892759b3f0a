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


def latest_sketch(snapshots: DataFrame, key: str = "shard") -> DataFrame:
    """The live sketch from per-key snapshot streams (heavy hitters,
    quantile sketches): per key, the rows of the highest batch sequence
    number (keys untouched by late batches keep their last emitted
    snapshot)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.desc("batch_seq"))
    return (
        snapshots.withColumn("_r", F.dense_rank().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )


def gk_insert(vs: list, gs: list, ds: list, x: float) -> None:
    """One Greenwald–Khanna insertion (GK01 §2.3) into the parallel-array
    summary (vs sorted; gs/ds the G and Delta bands): the new interior
    tuple inherits ``d = g_succ + d_succ - 1`` (its rank uncertainty is
    exactly its successor's band), extremes insert with d = 0.  While no
    compression has happened every tuple is (v, 1, 0) and vs IS the
    sorted multiset.  bisect on vs directly — O(log n) search + O(n)
    list insert, no per-insert key-list rebuild."""
    import bisect

    i = bisect.bisect_left(vs, x)
    d = 0 if i == 0 or i == len(vs) else gs[i] + ds[i] - 1
    vs.insert(i, x)
    gs.insert(i, 1)
    ds.insert(i, d)


def gk_compress(vs: list, gs: list, ds: list, n: int, capacity: int) -> None:
    """Merge adjacent GK tuples while the combined band fits in
    ``2n/capacity`` (the GK invariant with eps = 1/capacity), scanning
    right-to-left; min and max tuples are never merged away.  Post-
    condition: every surviving band satisfies g + d <= 2n/capacity, so
    rank queries are within ~n/capacity."""
    threshold = (2 * n) // capacity
    i = len(vs) - 2
    while i >= 1:
        if gs[i] + gs[i + 1] + ds[i + 1] <= threshold:
            gs[i + 1] += gs[i]  # successor absorbs g; its v and d stand
            del vs[i], gs[i], ds[i]
        i -= 1


def gk_query_rank(vs: list, gs: list, ds: list, r: int) -> float:
    """Value at (1-based) target rank r per the GK query rule: the first
    tuple whose max possible rank ``rmin + d`` exceeds ``r + err`` ends
    the walk and the previous value answers.  err = max(g+d)//2 over the
    summary — self-describing, and exactly 0 on the uncompressed path
    (all g=1, d=0), where this walk returns the sorted element at rank r
    bit-for-bit."""
    err = max(g + d for g, d in zip(gs, ds)) // 2
    rmin = 0
    prev_v = vs[0]
    for v, g, d in zip(vs, gs, ds):
        rmin += g
        if rmin + d > r + err:
            return prev_v
        prev_v = v
    return vs[-1]


def quantile_sketch_stream(
    events: DataFrame,
    capacity: int = 32768,
    q_pcts: tuple = (50, 90, 99),
    value_col: str = "value",
    group_col: str = "event_type",
) -> DataFrame:
    """Streaming quantile maintenance: Greenwald–Khanna summaries
    (Greenwald & Khanna 2001, "Space-efficient online computation of
    quantile summaries") kept fresh at ingest via applyInPandasWithState
    — the latency/size-percentile monitor a training-data ingest pipeline
    runs next to dedup-at-ingest and heavy hitters.

    Per group the state is the GK triple list [(v, g, d)] sorted by v:
    inserts are exact (g=1), and only when the summary outgrows
    ``capacity`` does gk_compress merge bands (eps = 1/capacity).  While
    total values <= capacity nothing is ever merged, the summary is the
    sorted multiset, and every emitted quantile is EXACT and arrival-
    order-independent — the property the oracled query
    ``streaming_quantiles`` hash-checks end-to-end (target rank
    ``ceil(p*n)``, the percentile_disc convention, computed with the
    same double expression in both engines); the compression path is
    pinned by unit tests at capacity 8.

    Each batch that touches a group re-emits the group's quantile rows as
    a snapshot tagged with a per-group batch sequence number (append
    mode); the live answer is the max-seq snapshot per group
    (latest_sketch(key="grp")).  ``max_rank_err`` is the summary's
    max(g+d)//2 — 0 on the exact path.

    Scale: state is O(capacity) per group, groups bound parallelism, and
    per-batch work is O(batch log capacity + capacity) per touched group
    — corpus size never enters."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "grp string, q_pct bigint, est_cents bigint, n bigint, "
        "max_rank_err bigint, batch_seq bigint"
    )
    state_schema = (
        "vs array<double>, gs array<bigint>, ds array<bigint>, "
        "n_total bigint, seq bigint"
    )

    def fn(key, pdf_iter, state: GroupState):
        (grp,) = key
        if state.exists:
            svs, sgs, sds, n_total, seq = state.get
            vs, gs, ds = list(svs), [int(g) for g in sgs], [int(d) for d in sds]
            n_total, seq = int(n_total), int(seq)
        else:
            vs, gs, ds, n_total, seq = [], [], [], 0, 0
        vals = [float(x) for pdf in pdf_iter for x in pdf["val"]]
        if n_total == len(vs) and len(vs) + len(vals) <= capacity:
            # exact regime (no band has ever merged: every tuple (v,1,0))
            # and the batch keeps it that way -> the summary is just the
            # sorted multiset, so merge wholesale instead of per-element
            # list inserts (O((n+b) log) vs O(n*b) — the 100k-events
            # bench path)
            vs = sorted(vs + vals)
            gs = [1] * len(vs)
            ds = [0] * len(vs)
            n_total = len(vs)
        else:
            for x in vals:
                gk_insert(vs, gs, ds, x)
                n_total += 1
                if len(vs) > capacity:
                    gk_compress(vs, gs, ds, n_total, capacity)
        seq += 1
        state.update((vs, gs, ds, n_total, seq))
        err = max(g + d for g, d in zip(gs, ds)) // 2 if vs else 0
        yield pd.DataFrame(
            [
                {
                    "grp": grp,
                    "q_pct": q,
                    # same double expressions as the oracle: target rank
                    # ceil((q/100) * n) — percentile_disc's convention —
                    # and cents via floor(v*100 + 0.5), NOT round():
                    # Python round() ties half-to-even while DuckDB
                    # rounds half away from zero, so a value landing on
                    # x.5 cents would diverge; floor(+0.5) is one shared
                    # tie-free double expression in both engines
                    "est_cents": int(
                        math.floor(
                            gk_query_rank(
                                vs, gs, ds, max(1, math.ceil((q / 100.0) * n_total))
                            )
                            * 100
                            + 0.5
                        )
                    ),
                    "n": n_total,
                    "max_rank_err": err,
                    "batch_seq": seq,
                }
                for q in q_pcts
                if vs
            ]
        )

    staged = (
        events.withWatermark("ts", "2 hours")
        # NaN/null would silently break the bisect ordering inside the
        # summary — drop them here, and the oracle filters identically
        .filter(
            F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col))
        )
        .select(
            F.col("ts"),
            F.col(group_col).cast("string").alias("grp_key"),
            F.col(value_col).cast("double").alias("val"),
        )
    )
    return staged.groupBy("grp_key").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_KMV_HASH_RANGE = 1 << 60  # portable_hash64 is a 60-bit non-negative int


def distinct_sketch_stream(
    events: DataFrame,
    capacity: int = 4096,
    item_col: str = "user_id",
    group_col: str = "event_type",
) -> DataFrame:
    """Streaming distinct-count maintenance: KMV (k-minimum-values,
    Bar-Yossef et al. 2002 / Beyer et al. 2007) sketches kept fresh at
    ingest via applyInPandasWithState — the per-source unique-users /
    unique-documents monitor that completes the ingest sketch suite next
    to heavy hitters (frequency) and GK summaries (quantiles).

    Hashing happens JVM-side (portable_hash64 — the repo's engine-
    reproducible 60-bit hash); Python state is only the set of the
    ``capacity`` smallest distinct hashes per group plus a truncation
    flag.  While the group's true distinct count <= capacity nothing is
    ever truncated and the sketch IS the distinct hash set — the emitted
    count is EXACT and arrival-order-independent, the property the
    oracled query ``streaming_distinct_users`` hash-checks end-to-end.
    Past capacity the classic KMV estimator takes over:
    ``(capacity - 1) * 2^60 / kth_min`` (relative error ~1/sqrt(capacity),
    deterministic given the hash family); that path is pinned by unit
    tests at capacity 8.

    Each batch that touches a group re-emits one snapshot row tagged
    with a per-group batch sequence number (append mode); the live
    answer is the max-seq row per group (latest_sketch(key="grp")).

    Scale: state is O(capacity) per group, per-batch work is
    O(batch + capacity · log) per touched group — corpus size never
    enters, and the sketch merges by set-union (the same code path) so
    shard fan-in at 1000 executors is the identical operation."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.hashing import portable_hash64

    out_schema = (
        "grp string, est_distinct bigint, exact int, n_seen bigint, "
        "batch_seq bigint"
    )
    state_schema = (
        "hs array<bigint>, truncated boolean, n_total bigint, seq bigint"
    )

    def fn(key, pdf_iter, state: GroupState):
        (grp,) = key
        if state.exists:
            hs, truncated, n_total, seq = state.get
            mins = set(int(h) for h in hs)
            truncated, n_total, seq = bool(truncated), int(n_total), int(seq)
        else:
            mins, truncated, n_total, seq = set(), False, 0, 0
        for pdf in pdf_iter:
            n_total += len(pdf)
            mins.update(int(h) for h in pdf["h"])
        if len(mins) > capacity:
            truncated = True
            mins = set(sorted(mins)[:capacity])
        seq += 1
        state.update((sorted(mins), truncated, n_total, seq))
        if truncated:
            kth = max(mins)  # the capacity-th smallest distinct hash
            est = (capacity - 1) * _KMV_HASH_RANGE // max(kth, 1)
        else:
            est = len(mins)
        yield pd.DataFrame(
            [
                {
                    "grp": grp,
                    "est_distinct": est,
                    "exact": 0 if truncated else 1,
                    "n_seen": n_total,
                    "batch_seq": seq,
                }
            ]
        )

    staged = (
        events.withWatermark("ts", "2 hours")
        .filter(F.col(item_col).isNotNull())
        .select(
            F.col("ts"),
            F.col(group_col).cast("string").alias("grp_key"),
            portable_hash64(F.col(item_col).cast("string")).alias("h"),
        )
    )
    return staged.groupBy("grp_key").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
