"""Incrementally maintained cluster artifact (operators/dedup_clusters.py):
the upsert must converge on the one-shot connected-components answer for
ANY arrival order of the pair batches, replay must be a no-op, torn state
must heal from the pair log, and every update must stay inside its
declared touched buckets."""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F
import pytest

from vectordb_acc_and_speed_exp_spark.operators.dedup import (
    connected_components,
)
from vectordb_acc_and_speed_exp_spark.operators.dedup_clusters import (
    cluster_members,
    cluster_of,
    clusters_upsert,
    serve_clusters,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _served(spark, path):
    return sorted(tuple(r) for r in serve_clusters(spark, path).collect())


def _oneshot(spark, all_rows):
    cc = connected_components(_pairs(spark, all_rows))
    return sorted(
        (r.node, r.cluster_id, int(r.node == r.cluster_id))
        for r in cc.collect()
    )


def _layout_listing(path):
    """(relative file path) set for both layouts — the torn/untouched
    comparison primitive."""
    out = set()
    for layout in ("nodes", "members"):
        base = os.path.join(path, layout)
        for root, _, files in os.walk(base):
            for f in files:
                if f.endswith(".parquet"):
                    out.add(os.path.relpath(os.path.join(root, f), path))
    return out


BATCHES = [
    [(1, 2), (10, 11)],          # two independent clusters
    [(3, 4), (12, 10)],          # one new cluster; one grows 10's
    [(2, 3), (20, 21)],          # MERGES {1,2} with {3,4}; one new
    [(21, 1)],                   # mega-merge: {20,21} into {1,2,3,4}
]
ALL = [p for b in BATCHES for p in b]


@pytest.mark.slow
def test_incremental_equals_oneshot_any_order(spark, tmp_path):
    import itertools

    expect = _oneshot(spark, ALL)
    # arrival order must not matter: three representative permutations
    # (identity, reversed, interleaved) — exhaustive 4! would be slow
    for i, order in enumerate(
        [BATCHES, BATCHES[::-1], [BATCHES[2], BATCHES[0], BATCHES[3], BATCHES[1]]]
    ):
        path = str(tmp_path / f"art{i}")
        for j, batch in enumerate(order):
            clusters_upsert(spark, path, _pairs(spark, batch), batch_key=str(j))
        assert _served(spark, path) == expect, f"order {i} diverged"


def test_replay_is_noop(spark, tmp_path):
    path = str(tmp_path / "art")
    for j, batch in enumerate(BATCHES):
        clusters_upsert(spark, path, _pairs(spark, batch), batch_key=str(j))
    before = _served(spark, path)
    # re-deliver batch 2 (the merging one): same batch_key overwrites its
    # own log entry; every label edge self-loops; no layout write happens
    out = clusters_upsert(spark, path, _pairs(spark, BATCHES[2]), batch_key="2")
    assert out["nbuckets"] == [] and out["cbuckets"] == []
    assert _served(spark, path) == before


def test_within_cluster_pair_is_log_only(spark, tmp_path):
    path = str(tmp_path / "art")
    clusters_upsert(spark, path, _pairs(spark, [(1, 2), (2, 3)]), batch_key="0")
    listing = _layout_listing(path)
    out = clusters_upsert(spark, path, _pairs(spark, [(1, 3)]), batch_key="1")
    assert out["nbuckets"] == [] and out["cbuckets"] == []
    assert _layout_listing(path) == listing  # no layout file touched
    assert _served(spark, path) == _oneshot(spark, [(1, 2), (2, 3), (1, 3)])


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    """The pruning contract: an upsert only rewrites partition dirs for
    buckets it declared touched."""
    path = str(tmp_path / "art")
    clusters_upsert(spark, path, _pairs(spark, BATCHES[0]), batch_key="0")
    before = _layout_listing(path)
    out = clusters_upsert(spark, path, _pairs(spark, BATCHES[1]), batch_key="1")
    changed = {
        f for f in before ^ _layout_listing(path)
    }
    for f in changed:
        layout, part = f.split(os.sep)[0], f.split(os.sep)[1]
        col, val = part.split("=")
        touched = out["nbuckets"] if layout == "nodes" else out["cbuckets"]
        assert int(val) in touched, f"{f} rewritten outside touched set"


def test_torn_state_heals_from_pair_log(spark, tmp_path):
    path = str(tmp_path / "art")
    for j, batch in enumerate(BATCHES[:3]):
        clusters_upsert(spark, path, _pairs(spark, batch), batch_key=str(j))
    # simulate a crash mid-overwrite: leftover intent marker + the two
    # layouts torn out of lockstep (members/ wiped entirely)
    with open(os.path.join(path, "_CLUSTERS_INTENT.json"), "w") as fh:
        json.dump({"nbuckets": [0], "cbuckets": [0]}, fh)
    shutil.rmtree(os.path.join(path, "members"))
    clusters_upsert(spark, path, _pairs(spark, BATCHES[3]), batch_key="3")
    assert not os.path.exists(os.path.join(path, "_CLUSTERS_INTENT.json"))
    assert _served(spark, path) == _oneshot(spark, ALL)
    # and the healed members layout serves lookups again
    assert {r.node for r in cluster_members(spark, path, [1]).collect()} == {
        1, 2, 3, 4, 20, 21,
    }


def test_crash_after_pair_log_heals(spark, tmp_path):
    """ADVICE r07 (medium): a crash AFTER the pair log lands but BEFORE
    any layout write used to leave the logged pairs invisible forever —
    no marker meant no heal trigger, and add() has no micro-batch
    redelivery. The intent marker now publishes BEFORE the log, so this
    crash window leaves it behind and the next upsert rebuilds from
    pairs/*, folding the orphan batch in."""
    path = str(tmp_path / "art")
    for j, batch in enumerate(BATCHES[:2]):
        clusters_upsert(spark, path, _pairs(spark, batch), batch_key=str(j))
    # simulate the crash window exactly as clusters_upsert step 1 leaves
    # it: marker published, pair log landed, resolution never ran
    with open(os.path.join(path, "_CLUSTERS_INTENT.json"), "w") as fh:
        json.dump({"stage": "pairs-landing", "batch": "2"}, fh)
    _pairs(spark, BATCHES[2]).write.mode("overwrite").parquet(
        os.path.join(path, "pairs", "batch=2")
    )
    out = clusters_upsert(spark, path, _pairs(spark, BATCHES[3]), batch_key="3")
    assert out["rebuilt"]
    assert not os.path.exists(os.path.join(path, "_CLUSTERS_INTENT.json"))
    assert _served(spark, path) == _oneshot(spark, ALL)


def test_read_paths_raise_on_missing_meta(spark, tmp_path):
    """ADVICE r07 (low): a lost _META.json beside existing layouts must
    raise on read paths, not silently fabricate the default bucket count —
    a wrong count prunes lookups to the wrong partitions (empty/partial
    answers) and a fabricated meta file would cement it."""
    path = str(tmp_path / "art")
    clusters_upsert(
        spark, path, _pairs(spark, BATCHES[0]), batch_key="0", n_buckets=8
    )
    os.remove(os.path.join(path, "_META.json"))
    with pytest.raises(FileNotFoundError, match="_META"):
        cluster_of(spark, path, [1])
    with pytest.raises(FileNotFoundError, match="_META"):
        cluster_members(spark, path, [1])


def test_pruned_lookups(spark, tmp_path):
    path = str(tmp_path / "art")
    for j, batch in enumerate(BATCHES):
        clusters_upsert(spark, path, _pairs(spark, batch), batch_key=str(j))
    got = {(r.node, r.cluster_id) for r in cluster_of(spark, path, [4, 12]).collect()}
    assert got == {(4, 1), (12, 10)}
    plan = cluster_of(spark, path, [4, 12])._jdf.queryExecution().executedPlan().toString()
    assert "nbucket" in plan  # bucket filter reached the scan


def test_stream_ingest_maintains_clusters(spark, documents, tmp_path):
    from vectordb_acc_and_speed_exp_spark.streaming.dedup_maintenance import (
        ingested_dup_pairs,
        stream_dedup_ingest,
    )

    docs = documents.select("doc_id", "text").filter(F.col("doc_id") < 200)
    # plant a CHAIN of exact copies arriving across waves so the cluster
    # artifact must merge across batches: 3 ~ 100003 (wave 2) ~ 200003
    # (wave 3)
    clones = docs.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    clones2 = docs.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    staged = docs.unionByName(clones).unionByName(clones2)
    src = tmp_path / "arrivals"
    for w in (
        staged.filter(F.col("doc_id") < 100),
        staged.filter(F.col("doc_id").between(100, 100003)),
        staged.filter(F.col("doc_id") > 100003),
    ):
        w.coalesce(1).write.mode("append").parquet(str(src))
    idx = str(tmp_path / "dedupidx")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    stream_dedup_ingest(stream, idx, maintain_clusters=True)

    pairs = ingested_dup_pairs(spark, idx).select("id_a", "id_b")
    expect = sorted(
        (r.node, r.cluster_id, int(r.node == r.cluster_id))
        for r in connected_components(pairs).collect()
    )
    assert expect  # the planted chain must actually produce pairs
    assert _served(spark, f"{idx}/clusters_inc") == expect
    # the planted cross-wave chain landed in ONE cluster
    labels = {
        r.node: r.cluster_id
        for r in cluster_of(
            spark, f"{idx}/clusters_inc", [3, 100003, 200003]
        ).collect()
    }
    assert len(labels) == 3 and len(set(labels.values())) == 1
