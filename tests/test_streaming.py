"""Streaming surface: bounded stream == batch for the tumbling window;
stateful sessionization consistent with the batch lag/gap sessionizer."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectordb_acc_and_speed_exp_spark.streaming.events import (
    hourly_counts_stream,
    read_events_stream,
    run_stream_to_batch,
    sessionize_stream,
)


def test_streaming_hourly_equals_batch(spark, sf_dir):
    from vectordb_acc_and_speed_exp_spark.io import load_table

    stream = read_events_stream(spark, sf_dir)
    got = run_stream_to_batch(hourly_counts_stream(stream), mode="complete")
    got_rows = {
        (r.win.start, r.event_type): (r.n_events, r.sum_value)
        for r in got.collect()
    }
    e = load_table(spark, sf_dir, "events")
    batch = (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias(
                "sum_value"
            ),
        )
        .collect()
    )
    batch_rows = {
        (r.win.start, r.event_type): (r.n_events, r.sum_value) for r in batch
    }
    assert got_rows == batch_rows


def test_stateful_sessionize_counts(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    sessions = run_stream_to_batch(
        sessionize_stream(stream, gap_minutes=30), mode="append"
    )
    rows = sessions.collect()
    assert len(rows) > 0
    # event conservation: session event counts sum to the table size
    from vectordb_acc_and_speed_exp_spark.io import load_table

    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == total
    # every session well-formed
    for r in rows:
        assert r.session_end_ms >= r.session_start_ms
        assert r.n_events >= 1


def test_streaming_dedup(spark, sf_dir):
    from vectordb_acc_and_speed_exp_spark.streaming.events import dedup_stream

    stream = read_events_stream(spark, sf_dir)
    got = run_stream_to_batch(dedup_stream(stream), mode="append")
    n = got.count()
    from vectordb_acc_and_speed_exp_spark.io import load_table

    expect = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert n == expect


def test_stream_to_parquet_sink(spark, sf_dir, tmp_path):
    from vectordb_acc_and_speed_exp_spark.streaming.events import (
        hourly_counts_stream,
        stream_to_parquet,
    )

    out = str(tmp_path / "hourly_parquet")
    stream = read_events_stream(spark, sf_dir)
    stream_to_parquet(
        hourly_counts_stream(stream), out, mode="complete"
    )
    written = spark.read.parquet(out)
    batch = run_stream_to_batch(
        hourly_counts_stream(read_events_stream(spark, sf_dir)), mode="complete"
    )
    assert written.count() == batch.count()
    # batch_id is the sink's idempotence partition key
    assert set(written.columns) == {
        "win", "event_type", "n_events", "sum_value", "batch_id"
    }


def test_stream_to_parquet_replay_idempotent(spark, sf_dir, tmp_path):
    """A replayed micro-batch (same batch_id, as after a failure/restart)
    overwrites its own partition instead of appending duplicates."""
    from vectordb_acc_and_speed_exp_spark.streaming.events import (
        hourly_counts_stream,
        stream_to_parquet,
    )

    out = str(tmp_path / "hourly_parquet")
    stream_to_parquet(
        hourly_counts_stream(read_events_stream(spark, sf_dir)), out, mode="complete"
    )
    n_once = spark.read.parquet(out).count()
    # simulate the failure-recovery replay: run the same bounded stream again
    # into the same sink dir (availableNow reprocesses everything -> same
    # batch ids -> same partition dirs get overwritten)
    stream_to_parquet(
        hourly_counts_stream(read_events_stream(spark, sf_dir)), out, mode="complete"
    )
    assert spark.read.parquet(out).count() == n_once


def test_stream_maintains_graph_index(spark, tmp_path):
    """Micro-batches of embeddings upsert the graph index shard-by-shard;
    after the stream drains, the index is bit-identical to a from-scratch
    batch build over all rows (the idempotent-rebuild property end-to-end
    through foreachBatch)."""
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.graphann import (
        build_graph_index,
    )
    from vectordb_acc_and_speed_exp_spark.streaming.index_maintenance import (
        stream_upsert_graph_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    # three arrival waves -> three source files -> one micro-batch each
    src_dir = tmp_path / "arrivals"
    for lo, hi in ((0, 150), (150, 300), (300, 10**9)):
        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(str(src_dir))

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    idx_path = str(tmp_path / "stream_graph_idx")
    stream_upsert_graph_index(stream, idx_path, item_id="vec_id")

    got = sorted(
        (int(r.shard), int(r.item_id), tuple(r.neighbors))
        for r in spark.read.parquet(idx_path).collect()
    )
    want = sorted(
        (int(r.shard), int(r.item_id), tuple(r.neighbors))
        for r in build_graph_index(emb, item_id="vec_id").collect()
    )
    assert got == want


def test_stream_maintains_ivf_layout(spark, tmp_path):
    """Micro-batches upsert the IVF layout cell-by-cell; after the stream
    drains, the layout row set equals a from-scratch batch write of all
    rows under the same centroids."""
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )
    from vectordb_acc_and_speed_exp_spark.streaming.index_maintenance import (
        stream_upsert_ivf_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = kmeans_centroids(emb, n_cells=8)
    src_dir = tmp_path / "ivf_arrivals"
    for lo, hi in ((0, 200), (200, 10**9)):
        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(str(src_dir))

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    layout_path = str(tmp_path / "stream_ivf_layout")
    stream_upsert_ivf_index(stream, layout_path, cents, item_id="vec_id")

    got = sorted(
        (int(r.vec_id), int(r.cell))
        for r in spark.read.parquet(layout_path).collect()
    )
    full_path = str(tmp_path / "batch_ivf_layout")
    write_ivf_corpus(ivf_assign(emb, cents), full_path)
    want = sorted(
        (int(r.vec_id), int(r.cell))
        for r in spark.read.parquet(full_path).collect()
    )
    assert got == want


def test_ivf_upsert_then_compact_preserves_search(spark, tmp_path):
    """The nightly maintenance story at scale: a bulk IVF build from a
    many-partition frame leaves several files in every cell directory
    (each input partition writes into each cell it has rows for); stream
    upserts then keep only the touched cells tidy (whole-cell rewrite).
    Per-cell compaction (io.catalog.compact_table on each cell=
    directory) must cut file counts while leaving ivf_ann_pruned results
    bit-identical."""
    import glob
    import os

    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.io.catalog import compact_table
    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_ann_pruned,
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )
    from vectordb_acc_and_speed_exp_spark.streaming.index_maintenance import (
        stream_upsert_ivf_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = kmeans_centroids(emb, n_cells=8)
    layout_path = str(tmp_path / "compact_ivf_layout")
    # bulk build from a 6-partition frame -> ~6 files per cell directory
    write_ivf_corpus(
        ivf_assign(emb.filter(F.col("vec_id") < 300), cents).repartition(6),
        layout_path,
    )

    src_dir = tmp_path / "compact_arrivals"
    # narrow waves: a handful of rows each, so only their landing cells
    # get the whole-cell rewrite and the rest stay fragmented
    bounds = (300, 303, 306)
    for lo, hi in zip(bounds, bounds[1:]):
        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(str(src_dir))

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    stream_upsert_ivf_index(stream, layout_path, cents, item_id="vec_id")

    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def search():
        res = ivf_ann_pruned(
            qs, spark, layout_path, cents, k=10, n_probe=4, item_id="vec_id"
        )
        return sorted(
            (int(r.query_id), int(r.rank), int(r.item_id), round(r.dist, 9))
            for r in res.collect()
        )

    before = search()
    cell_dirs = sorted(glob.glob(os.path.join(layout_path, "cell=*")))
    assert cell_dirs
    files_before = len(glob.glob(os.path.join(layout_path, "cell=*", "*.parquet")))
    shrunk = 0
    for d in cell_dirs:
        n_b, n_a = compact_table(spark, d)
        shrunk += int(n_a < n_b)
    files_after = len(glob.glob(os.path.join(layout_path, "cell=*", "*.parquet")))
    assert shrunk > 0 and files_after < files_before
    assert search() == before


def test_stream_maintains_composed_ivfsq_index(spark, tmp_path):
    """Corpus AND derived int8 code layouts stay in lockstep under
    micro-batch upserts: after the stream drains, the code table is
    row-identical to a from-scratch encode of the final corpus, and a
    full-probe corpus-shortlist ivfsq_search equals exact kNN."""
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.ann import kmeans_centroids
    from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn
    from vectordb_acc_and_speed_exp_spark.operators.sq import (
        ivfsq_search,
        sq_encode,
        sq_train,
    )
    from vectordb_acc_and_speed_exp_spark.streaming.index_maintenance import (
        stream_upsert_ivfsq_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = kmeans_centroids(emb, n_cells=8)
    vmin, scale = sq_train(emb)

    src_dir = tmp_path / "ivfsq_arrivals"
    for lo, hi in ((0, 200), (200, 10**9)):
        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(str(src_dir))
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    corpus_path = str(tmp_path / "ivfsq_corpus")
    codes_path = str(tmp_path / "ivfsq_codes")
    stream_upsert_ivfsq_index(
        stream, corpus_path, codes_path, cents, vmin, scale, item_id="vec_id"
    )

    got_codes = sorted(
        (int(r.item_id), int(r.cell), tuple(r.codes))
        for r in spark.read.parquet(codes_path).collect()
    )
    want_codes = sorted(
        (int(r.item_id), int(r.cell), tuple(r.codes))
        for r in sq_encode(
            spark.read.parquet(corpus_path), vmin, scale,
            item_id="vec_id", passthrough=("cell",),
        ).collect()
    )
    assert got_codes == want_codes

    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    n = emb.count()
    got = sorted(
        (int(r.query_id), int(r.rank), int(r.item_id))
        for r in ivfsq_search(
            qs, spark, codes_path, corpus_path, cents, vmin, scale,
            k=10, n_probe=8, shortlist=n, item_id="vec_id",
        ).collect()
    )
    want = sorted(
        (int(r.query_id), int(r.rank), int(r.item_id))
        for r in exact_knn(qs, emb, k=10, item_id="vec_id").collect()
    )
    assert got == want


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream interval join (purchase x preceding-hour
    clicks per user) on bounded replay == the identical batch join."""
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.streaming.events import (
        purchase_click_join_stream,
        read_events_stream,
        run_stream_to_batch,
    )

    stream = read_events_stream(spark, sf_dir)
    got = run_stream_to_batch(
        purchase_click_join_stream(stream), mode="append"
    )

    ev = load_table(spark, sf_dir, "events")
    import pyspark.sql.functions as F

    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = purchases.join(
        clicks,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 60 MINUTES")),
    ).select("purchase_id", "click_id")

    got_pairs = sorted((r.purchase_id, r.click_id) for r in got.collect())
    want_pairs = sorted((r.purchase_id, r.click_id) for r in batch.collect())
    assert got_pairs == want_pairs
    assert len(got_pairs) > 0


def test_stream_maintains_composed_ivfbq_index(spark, tmp_path):
    """The binary twin of the IVF-SQ lockstep test: after the stream
    drains, the packed-bit code table row-matches a from-scratch encode of
    the final corpus, and full-probe corpus-shortlist ivfbq_search equals
    exact kNN."""
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.ann import kmeans_centroids
    from vectordb_acc_and_speed_exp_spark.operators.bq import (
        bq_encode,
        bq_train,
        ivfbq_search,
    )
    from vectordb_acc_and_speed_exp_spark.operators.knn import exact_knn
    from vectordb_acc_and_speed_exp_spark.streaming.index_maintenance import (
        stream_upsert_ivfbq_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = kmeans_centroids(emb, n_cells=8)
    sums, n = bq_train(emb)

    src_dir = tmp_path / "ivfbq_arrivals"
    for lo, hi in ((0, 200), (200, 10**9)):
        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(str(src_dir))
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    corpus_path = str(tmp_path / "ivfbq_corpus")
    codes_path = str(tmp_path / "ivfbq_codes")
    stream_upsert_ivfbq_index(
        stream, corpus_path, codes_path, cents, sums, n, item_id="vec_id"
    )

    got_codes = sorted(
        (int(r.item_id), int(r.cell), int(r.code_lo), int(r.code_hi))
        for r in spark.read.parquet(codes_path).collect()
    )
    want_codes = sorted(
        (int(r.item_id), int(r.cell), int(r.code_lo), int(r.code_hi))
        for r in bq_encode(
            spark.read.parquet(corpus_path), sums, n,
            item_id="vec_id", passthrough=("cell",),
        ).collect()
    )
    assert got_codes == want_codes

    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corp_n = emb.count()
    got = ivfbq_search(
        qs, spark, codes_path, corpus_path, cents, sums, n,
        k=10, n_probe=8, shortlist=corp_n, item_id="vec_id",
    )
    gt = exact_knn(qs, emb, k=10, item_id="vec_id")
    assert sorted((r.query_id, r.rank, r.item_id) for r in got.collect()) == sorted(
        (r.query_id, r.rank, r.item_id) for r in gt.collect()
    )


def test_stream_upsert_dedups_in_batch_duplicates(spark, tmp_path):
    """A micro-batch carrying two rows for the same id must leave ONE row
    in the index (last-wins collapse), keeping the layout a pure function
    of the final id -> row map."""
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.ann import kmeans_centroids
    from vectordb_acc_and_speed_exp_spark.streaming.index_maintenance import (
        stream_upsert_ivf_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = kmeans_centroids(emb, n_cells=4)
    base = emb.limit(50)
    # duplicate every row of the batch (same ids, twice)
    dup = base.unionAll(base)
    src_dir = tmp_path / "dup_arrivals"
    dup.coalesce(1).write.mode("overwrite").parquet(str(src_dir))
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .parquet(str(src_dir))
    )
    corpus_path = str(tmp_path / "dup_corpus")
    stream_upsert_ivf_index(stream, corpus_path, cents, item_id="vec_id")
    got = spark.read.parquet(corpus_path)
    assert got.count() == 50
    assert got.select("vec_id").distinct().count() == 50


def test_heavy_hitters_exact_when_under_capacity(spark, sf_dir):
    """distinct items <= capacity -> no evictions -> the sketch equals the
    exact batch group-by (order-independent), err == 0, and the per-shard
    totals account for every event."""
    from vectordb_acc_and_speed_exp_spark.functions.hashing import (
        portable_hash64,
    )
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.streaming.events import (
        heavy_hitters_stream,
        latest_sketch,
        read_events_stream,
        run_stream_to_batch,
    )

    stream = read_events_stream(spark, sf_dir)
    snaps = run_stream_to_batch(
        heavy_hitters_stream(stream, capacity=32, n_shards=4), mode="append"
    )
    got = {
        (r.shard, r.item): (r.est_count, r.max_err, r.n_shard)
        for r in latest_sketch(snaps).collect()
    }
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_type").cast("string").alias("item"),
        F.pmod(portable_hash64(F.col("event_type")), F.lit(4)).alias("shard"),
    )
    exact = {
        (r.shard, r.item): r.cnt
        for r in e.groupBy("shard", "item").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert set(got) == set(exact)
    for k, (est, err, _) in got.items():
        assert est == exact[k] and err == 0
    # shard totals conserve events
    shard_totals = {}
    for (shard, _), (_, _, n_shard) in got.items():
        shard_totals[shard] = n_shard
    assert sum(shard_totals.values()) == sum(exact.values())


def test_heavy_hitters_eviction_bounds(spark, tmp_path):
    """capacity 2 with 4 distinct items forces evictions: the space-saving
    guarantees must hold — est >= true >= est - err for every tracked
    item, and any item with true count > n_shard/capacity is tracked."""
    import datetime

    from vectordb_acc_and_speed_exp_spark.streaming.events import (
        heavy_hitters_stream,
        latest_sketch,
        run_stream_to_batch,
    )

    base = datetime.datetime(2024, 1, 1)
    # one shard (n_shards=1): a=6, b=3, c=2, d=1 interleaved
    seq = ["a", "b", "a", "c", "a", "b", "d", "a", "c", "a", "b", "a"]
    rows = [
        (base + datetime.timedelta(minutes=i), it) for i, it in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    src = str(tmp_path / "hh_src")
    df.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    snaps = run_stream_to_batch(
        heavy_hitters_stream(stream, capacity=2, n_shards=1), mode="append"
    )
    sk = {r.item: r for r in latest_sketch(snaps).collect()}
    true = {"a": 6, "b": 3, "c": 2, "d": 1}
    n = len(seq)
    assert len(sk) == 2  # capacity respected
    for it, r in sk.items():
        assert r.n_shard == n
        assert r.est_count >= true[it] >= r.est_count - r.max_err
    # every item with true count > n/capacity must be tracked
    for it, c in true.items():
        if c > n / 2:
            assert it in sk


def test_gk_summary_bounds_pure():
    """GK compression at capacity 8 over 500 pseudo-random distinct
    values: every queried rank lands within the summary's self-described
    error (max(g+d)//2), that error is <= n/capacity, and the summary
    stays far below the raw value count."""
    import math

    from vectordb_acc_and_speed_exp_spark.streaming.events import (
        gk_compress,
        gk_insert,
        gk_query_rank,
    )

    cap = 8
    # deterministic pseudo-random permutation (no RNG): multiplicative walk
    raw = [((i * 2654435761) % 4294967296) / 4294967296 for i in range(500)]
    vs, gs, ds = [], [], []
    for n, x in enumerate(raw, start=1):
        gk_insert(vs, gs, ds, x)
        if len(vs) > cap:
            gk_compress(vs, gs, ds, n, cap)
    n = len(raw)
    assert sum(gs) == n  # bands conserve mass
    err = max(g + d for g, d in zip(gs, ds)) // 2
    assert 0 < err <= n // cap
    assert len(vs) < n // 4  # genuinely compressed
    srt = sorted(raw)
    rank_of = {v: i + 1 for i, v in enumerate(srt)}  # distinct values
    for p in (0.05, 0.25, 0.5, 0.75, 0.9, 0.99):
        r = max(1, math.ceil(p * n))
        ans = gk_query_rank(vs, gs, ds, r)
        assert abs(rank_of[ans] - r) <= err, (p, r, rank_of[ans], err)


def test_gk_exact_path_is_sorted_multiset():
    """Below capacity no band merges: the summary is the sorted multiset
    (dup values included), queries return the exact rank element, and
    the walk is arrival-order independent."""
    from vectordb_acc_and_speed_exp_spark.streaming.events import (
        gk_insert,
        gk_query_rank,
    )

    for order in ([5.0, 1.0, 3.0, 3.0, 2.0], [3.0, 3.0, 2.0, 5.0, 1.0]):
        vs, gs, ds = [], [], []
        for x in order:
            gk_insert(vs, gs, ds, x)
        assert vs == [1.0, 2.0, 3.0, 3.0, 5.0]
        assert gs == [1] * 5 and ds == [0] * 5
        for r, want in [(1, 1.0), (3, 3.0), (4, 3.0), (5, 5.0)]:
            assert gk_query_rank(vs, gs, ds, r) == want


def test_streaming_quantiles_exact_under_capacity(spark, sf_dir):
    """total values per group <= capacity -> no GK merges -> every
    emitted quantile equals the exact rank-ceil(p*n) element of the
    batch sort, err == 0 (the property the oracle gate hash-checks)."""
    import math

    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.streaming.events import (
        latest_sketch,
        quantile_sketch_stream,
        read_events_stream,
        run_stream_to_batch,
    )

    stream = read_events_stream(spark, sf_dir)
    snaps = run_stream_to_batch(
        quantile_sketch_stream(stream, capacity=32768), mode="append"
    )
    got = {
        (r.grp, r.q_pct): (r.est_cents, r.n, r.max_rank_err)
        for r in latest_sketch(snaps, key="grp").collect()
    }
    e = load_table(spark, sf_dir, "events")
    by_grp = {}
    for row in e.select("event_type", "value").collect():
        if row.value is not None:
            by_grp.setdefault(row.event_type, []).append(row.value)
    assert set(g for g, _ in got) == set(by_grp)
    for grp, vals in by_grp.items():
        vals.sort()
        n = len(vals)
        for q in (50, 90, 99):
            r = max(1, math.ceil((q / 100.0) * n))
            est, got_n, err = got[(grp, q)]
            assert got_n == n and err == 0
            assert est == int(round(vals[r - 1] * 100))


def test_streaming_quantiles_compression_bounds(spark, tmp_path):
    """capacity 8 with 64 distinct values forces GK merges in the stream
    itself: emitted err must be positive and <= n/capacity, and each
    estimate's true rank within err of the target."""
    import datetime
    import math

    from vectordb_acc_and_speed_exp_spark.streaming.events import (
        latest_sketch,
        quantile_sketch_stream,
        run_stream_to_batch,
    )

    base = datetime.datetime(2024, 1, 1)
    # x100 so all 64 values stay distinct on the cents grid (verified)
    raw = [
        ((i * 2654435761) % 4294967296) / 4294967296 * 100 for i in range(64)
    ]
    rows = [
        (base + datetime.timedelta(minutes=i), "m", x)
        for i, x in enumerate(raw)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    src = str(tmp_path / "qk_src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(src)
    snaps = run_stream_to_batch(
        quantile_sketch_stream(stream, capacity=8), mode="append"
    )
    got = {r.q_pct: r for r in latest_sketch(snaps, key="grp").collect()}
    n = len(raw)
    srt = sorted(raw)
    rank_of = {int(round(v * 100)): i + 1 for i, v in enumerate(srt)}
    # cents collide on a 64-point unit grid? ensure ranks stay resolvable
    assert len(rank_of) == n
    for q in (50, 90, 99):
        r = got[q]
        assert r.n == n
        assert 0 < r.max_rank_err <= n // 8
        target = max(1, math.ceil((q / 100.0) * n))
        assert abs(rank_of[r.est_cents] - target) <= r.max_rank_err


def test_streaming_distinct_exact_under_capacity(spark, sf_dir):
    """true distinct <= capacity -> no truncation -> the emitted count
    equals the exact batch COUNT(DISTINCT) per group, exact flag set."""
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.streaming.events import (
        distinct_sketch_stream,
        latest_sketch,
        read_events_stream,
        run_stream_to_batch,
    )

    stream = read_events_stream(spark, sf_dir)
    snaps = run_stream_to_batch(
        distinct_sketch_stream(stream, capacity=4096), mode="append"
    )
    got = {
        r.grp: (r.est_distinct, r.exact, r.n_seen)
        for r in latest_sketch(snaps, key="grp").collect()
    }
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    exact = {
        r.event_type: (r.d, r.n)
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for grp, (d, n) in exact.items():
        assert got[grp] == (d, 1, n)


def test_streaming_distinct_kmv_estimator_bounds(spark, tmp_path):
    """capacity 8 with 64 distinct items forces truncation: the KMV
    estimator must flag inexactness and land within its coarse error
    band (k=8 -> ~40% relative error; assert within a factor of 2.5,
    deterministic given the fixed hash family)."""
    import datetime

    from vectordb_acc_and_speed_exp_spark.streaming.events import (
        distinct_sketch_stream,
        latest_sketch,
        run_stream_to_batch,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(minutes=i), "m", i % 64) for i in range(128)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, user_id bigint")
    src = str(tmp_path / "kmv_src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, user_id bigint"
    ).parquet(src)
    snaps = run_stream_to_batch(
        distinct_sketch_stream(stream, capacity=8), mode="append"
    )
    (r,) = latest_sketch(snaps, key="grp").collect()
    assert r.exact == 0 and r.n_seen == 128
    assert 64 / 2.5 <= r.est_distinct <= 64 * 2.5
