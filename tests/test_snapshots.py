"""Cumulative snapshot semantics (SURVEY.md §1.4 #2/#3, §5.3):
monotonic prefixes, deterministic order, post-filter counts."""

from __future__ import annotations

import pyspark.sql.functions as F

from vectordb_acc_and_speed_exp_spark.operators.snapshots import (
    snapshot,
    snapshot_sizes,
    snapshot_stats,
    with_page_seq,
)


def test_sizes_ladder_with_remainder():
    assert snapshot_sizes(500, 100) == [100, 200, 300, 400, 500]
    assert snapshot_sizes(530, 100) == [100, 200, 300, 400, 500, 530]
    assert snapshot_sizes(50, 100) == [50]


def test_snapshots_are_monotonic_prefixes(documents):
    seq = with_page_seq(documents).cache()
    s100 = {r.doc_id for r in snapshot(seq, 100).select("doc_id").collect()}
    s200 = {r.doc_id for r in snapshot(seq, 200).select("doc_id").collect()}
    assert len(s100) == 100 and len(s200) == 200
    assert s100 < s200  # strict subset


def test_page_seq_deterministic(documents):
    a = with_page_seq(documents).select("doc_id", "page_seq").collect()
    b = with_page_seq(documents).select("doc_id", "page_seq").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_snapshot_stats_one_pass(documents):
    stats = snapshot_stats(with_page_seq(documents), [100, 300, 500])
    rows = {r.snapshot_size: r for r in stats.collect()}
    assert rows[100].n_docs == 100
    assert rows[300].n_docs == 300
    assert rows[500].n_docs == 500
    assert rows[100].total_chars < rows[300].total_chars < rows[500].total_chars
