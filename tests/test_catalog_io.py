"""io.catalog timestamp normalization: the events table has shipped with
ts as TIMESTAMP(NANOS) and as TIMESTAMP(MICROS)-without-timezone
(TIMESTAMP_NTZ to Spark); load_table must normalize BOTH to a plain
TIMESTAMP whose epoch equals the stored wall-clock read as UTC (DuckDB's
naive-timestamp semantics), independent of the session timezone."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vectordb_acc_and_speed_exp_spark.io import load_table


def _write_events(spark, path, ts_type: str):
    wall = datetime.datetime(2024, 3, 1, 12, 30, 45)
    df = spark.createDataFrame(
        [(1, wall, 7, "click", 1.5, "{}")],
        f"event_id bigint, ts {ts_type}, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(path)
    return wall


def test_ntz_events_normalized_to_utc_timestamp(spark, tmp_path):
    sf_dir = str(tmp_path)
    wall = _write_events(spark, f"{sf_dir}/events.parquet", "timestamp_ntz")
    out = load_table(spark, sf_dir, "events")
    assert dict(out.dtypes)["ts"] == "timestamp"
    ms = out.select(F.unix_millis("ts").alias("ms")).first().ms
    want = int(
        wall.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000
    )
    assert ms == want


def test_ntz_normalization_is_session_tz_independent(spark, tmp_path):
    """Even under a non-UTC session timezone (a driver-provided session),
    the epoch must equal the naive wall-clock read as UTC."""
    sf_dir = str(tmp_path)
    wall = _write_events(spark, f"{sf_dir}/events.parquet", "timestamp_ntz")
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        out = load_table(spark, sf_dir, "events")
        ms = out.select(F.unix_millis("ts").alias("ms")).first().ms
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    want = int(
        wall.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000
    )
    assert ms == want


def test_plain_timestamp_events_pass_through(spark, tmp_path):
    sf_dir = str(tmp_path)
    _write_events(spark, f"{sf_dir}/events.parquet", "timestamp")
    out = load_table(spark, sf_dir, "events")
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.count() == 1


def test_compact_table_preserves_rows(spark, embeddings, tmp_path):
    """Many tiny appended files -> few files, identical rows, staging
    fully cleaned up."""
    import glob
    import os

    from vectordb_acc_and_speed_exp_spark.io.catalog import compact_table

    path = str(tmp_path / "frag")
    src = embeddings.select("vec_id", "label").limit(200)
    # 10 single-partition appends = >= 10 small files
    for i in range(10):
        src.filter((F.col("vec_id") % 10) == i).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    before_rows = sorted(
        map(tuple, spark.read.parquet(path).collect())
    )
    n_before, n_after = compact_table(spark, path)
    assert n_before >= 10 and n_after < n_before
    assert len(glob.glob(path + "/*.parquet")) == n_after
    after_rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after_rows == before_rows
    assert not os.path.exists(path + "._compact_staged")
    assert not os.path.exists(path + "._pre_compact")


def _file_stats(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) footer statistics for one column — the physical
    evidence the scan-time pruning argument rests on."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_optimize_layout_clusters_and_preserves_rows(spark, embeddings, tmp_path):
    """Interleaved appends give every file a full-domain [min, max] on the
    cluster column (nothing can skip); after optimize_layout the per-file
    ranges are disjoint, so an equality predicate's pushed filter prunes to
    a strict subset of files — and the rows are bit-identical."""
    import os

    from vectordb_acc_and_speed_exp_spark.io.catalog import optimize_layout

    path = str(tmp_path / "clust")
    src = embeddings.select("vec_id", "label")
    for i in range(4):
        src.filter((F.col("vec_id") % 4) == i).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    want = sorted(map(tuple, spark.read.parquet(path).collect()))

    before = _file_stats(path, "label")
    lo = min(mn for mn, _ in before)
    hi = max(mx for _, mx in before)
    assert all((mn, mx) == (lo, hi) for mn, mx in before), (
        "fixture must start unclustered (full-domain stats per file)"
    )

    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    n_before, n_after = optimize_layout(
        spark, path, ["label"], target_bytes_per_file=max(1, total // 4)
    )
    assert n_before == 4 and n_after >= 2
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want
    assert not os.path.exists(path + "._compact_staged")
    assert not os.path.exists(path + "._pre_compact")

    after = sorted(_file_stats(path, "label"))
    # range partitioning sends equal keys to one partition: file ranges
    # are pairwise disjoint, not merely touching
    for (_, prev_max), (cur_min, _) in zip(after, after[1:]):
        assert prev_max < cur_min
    probe = after[0][1]  # a real label value
    containing = [1 for mn, mx in after if mn <= probe <= mx]
    assert len(containing) < len(after)


def test_optimize_layout_self_heals_from_crashed_prior_run(
    spark, embeddings, tmp_path
):
    """optimize_layout shares _rewrite_in_place's crash discipline: a crash
    between the two renames (data only at ._pre_compact) must roll back
    BEFORE the initial scan — the directory does not exist until healed."""
    import os

    from vectordb_acc_and_speed_exp_spark.io.catalog import optimize_layout

    path = str(tmp_path / "clust2")
    embeddings.select("vec_id", "label").limit(100).write.mode(
        "overwrite"
    ).parquet(path)
    want = sorted(map(tuple, spark.read.parquet(path).collect()))
    os.rename(path, path + "._pre_compact")
    optimize_layout(spark, path, ["label"])
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want
    assert not os.path.exists(path + "._pre_compact")


def test_ntz_epoch_stable_if_caller_restores_tz_before_action(spark, tmp_path):
    """The normalization must not rely on session-tz state set inside
    load_table: a caller who changes the session timezone AFTER load_table
    but BEFORE the action must still read the naive wall-clock as UTC
    (the cast is lazy — it evaluates under the action-time timezone)."""
    sf_dir = str(tmp_path)
    wall = _write_events(spark, f"{sf_dir}/events.parquet", "timestamp_ntz")
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        out = load_table(spark, sf_dir, "events")
        # tz changes after the (lazy) plan is built, before the action
        spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
        ms = out.select(F.unix_millis("ts").alias("ms")).first().ms
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    want = int(wall.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
    assert ms == want


def test_load_table_does_not_mutate_session_timezone(spark, tmp_path):
    sf_dir = str(tmp_path)
    _write_events(spark, f"{sf_dir}/events.parquet", "timestamp_ntz")
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
        load_table(spark, sf_dir, "events").count()
        assert spark.conf.get("spark.sql.session.timeZone") == "Asia/Seoul"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_compact_table_self_heals_from_crashed_prior_run(spark, embeddings, tmp_path):
    """Leftover staging/backup dirs from a crashed compaction must not fail
    or corrupt the next run; a crash between the two renames (data only at
    ._pre_compact) is rolled back on the next call."""
    import os
    import shutil

    from vectordb_acc_and_speed_exp_spark.io.catalog import compact_table

    path = str(tmp_path / "frag2")
    src = embeddings.select("vec_id", "label").limit(100)
    for i in range(4):
        src.filter((F.col("vec_id") % 4) == i).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    want = sorted(map(tuple, spark.read.parquet(path).collect()))

    # stale staging + backup dirs from a "crashed" earlier run
    os.makedirs(path + "._compact_staged/junk")
    os.makedirs(path + "._pre_compact")
    compact_table(spark, path)
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want
    assert not os.path.exists(path + "._compact_staged")
    assert not os.path.exists(path + "._pre_compact")

    # crash between the two renames: data exists only at ._pre_compact
    os.rename(path, path + "._pre_compact")
    compact_table(spark, path)
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want
    assert not os.path.exists(path + "._pre_compact")
    shutil.rmtree(path)


def test_layout_sig_sees_second_level_changes(tmp_path):
    """ADVICE r08: a two-level partitioned layout changes state two dirs
    deep without touching top-level mtimes — the signature must move."""
    import os
    import time

    from vectordb_acc_and_speed_exp_spark.io.relcache import layout_sig

    root = tmp_path / "lay"
    leaf = root / "a=1" / "b=2"
    leaf.mkdir(parents=True)
    (leaf / "part-0").write_text("x")
    s1 = layout_sig(str(root))
    time.sleep(0.02)  # ensure distinct mtime_ns even on coarse clocks
    (leaf / "part-1").write_text("y")  # bumps b=2 mtime, NOT a=1
    # guard the scenario: the top-level child's mtime really is unchanged
    s2 = layout_sig(str(root))
    assert s1 != s2


def test_read_layout_cache_is_lru(spark, tmp_path):
    """ADVICE r08: a cache hit must refresh recency so eviction targets
    cold entries, not the hot corpus layout inserted first."""
    from vectordb_acc_and_speed_exp_spark.io import relcache

    pa = str(tmp_path / "a")
    pb = str(tmp_path / "b")
    spark.range(3).write.parquet(pa)
    spark.range(3).write.parquet(pb)
    relcache.read_layout(spark, pa)
    relcache.read_layout(spark, pb)
    relcache.read_layout(spark, pa)  # hit → must move to the end
    keys = [k for k in relcache._REL_CACHE if k[1] in (pa, pb)]
    assert keys[-1][1] == pa


def test_assert_layout_depth_enforces_two_level_invariant(tmp_path):
    """VERDICT r09 #7: layout_sig covers exactly two directory levels, so
    every partitioned writer asserts no layout nests partitions deeper —
    a three-level layout must fail FAST at write instead of silently
    breaking relcache invalidation later."""
    import pytest as _pytest

    from vectordb_acc_and_speed_exp_spark.io.relcache import (
        assert_layout_depth,
    )

    root = tmp_path / "layout"
    (root / "cell=1" / "sub=2").mkdir(parents=True)
    (root / "cell=1" / "sub=2" / "part-0.parquet").write_text("x")
    assert_layout_depth(str(root))  # two levels: fine
    # three levels: a dir inside a depth-2 dir
    (root / "cell=1" / "sub=2" / "deep=3").mkdir()
    with _pytest.raises(ValueError, match="three"):
        assert_layout_depth(str(root))
    # missing path is a no-op (writers may assert before first batch)
    assert_layout_depth(str(tmp_path / "nope"))


def test_partitioned_writers_pass_depth_assert(spark, embeddings, tmp_path):
    """The shipped partitioned writers produce <=2-level layouts — the
    assert they now run post-write must hold on real output."""
    from vectordb_acc_and_speed_exp_spark.operators.ann import (
        ivf_assign,
        kmeans_centroids,
        write_ivf_corpus,
    )

    emb = embeddings.select("vec_id", "embedding").limit(200)
    cents = kmeans_centroids(emb, n_cells=4)
    write_ivf_corpus(
        ivf_assign(emb, cents, item_vec="embedding"),
        str(tmp_path / "ivf"),
    )  # raises if the invariant breaks


def test_spread_small_scan_spreads_one_row_group_and_noops_when_wide(spark):
    """A one-row-group scan reads as ONE task, so per-row work ahead of
    the first shuffle is single-threaded; spread_small_scan round-robins
    it across the session's cores. A frame already at (or near) the
    session parallelism must pass through untouched — at scale the scan
    has real partitions and 'spreading' would shuffle the corpus."""
    from vectordb_acc_and_speed_exp_spark.io import spread_small_scan

    narrow = spark.range(1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    spread = spread_small_scan(narrow)
    target = spark.sparkContext.defaultParallelism
    assert spread.rdd.getNumPartitions() == target
    # row multiset unchanged
    assert spread.count() == 1000
    assert spread.agg({"id": "sum"}).first()[0] == 999 * 1000 // 2

    wide = spark.range(1000).repartition(target)
    assert spread_small_scan(wide) is wide
