"""EP2/EP3 experiment runners: snapshot sweep structure, sinks, rollups."""

from __future__ import annotations

import os
import csv
import json

from vectordb_acc_and_speed_exp_spark.experiments import (
    recall_experiment,
    speed_experiment,
)


def test_speed_experiment_sweep_and_sinks(spark, sf_dir, tmp_path):
    prefix = str(tmp_path / "speed")
    results = speed_experiment(
        spark, sf_dir, step=250, k=5, num_runs=2, out_prefix=prefix
    )
    names = [r.name for r in results]
    assert names == ["snapshot_000250", "snapshot_000500"]
    for r in results:
        assert len(r.runs_sec) == 2
        assert r.n_rows == 25  # 5 queries x k=5
        assert r.stdev >= 0.0
    with open(prefix + "_results.json") as f:
        payload = json.load(f)
    assert payload["meta"]["k"] == 5
    assert len(payload["results"]) == 2
    with open(prefix + "_summary.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0][0] == "name" and len(rows) == 3


def test_recall_experiment_rollup(spark, sf_dir, tmp_path):
    out = recall_experiment(
        spark, sf_dir, step=250, k=10, out_prefix=str(tmp_path / "rec")
    )
    rows = {r.snapshot_size: r for r in out.collect()}
    assert set(rows) == {250, 500}
    for r in rows.values():
        assert 0.0 <= r.mean_recall_10 <= 1.0
        assert 0.0 <= r.mean_recall_5 <= 1.0
    assert (tmp_path / "rec_recall_summary.csv").exists()


def test_plot_sinks_write_all_four_charts(tmp_path):
    """S11 parity: the four reference charts (search_speed_by_pages,
    search_speed_by_collection, recall_by_pages, recall_by_collection)
    are emitted as PNG (the reference's format, returned paths) with
    well-formed SVG twins beside them."""
    import os
    import xml.etree.ElementTree as ET

    from vectordb_acc_and_speed_exp_spark.experiments import (
        plot_recall_charts,
        plot_speed_charts,
    )
    from vectordb_acc_and_speed_exp_spark.plans.bench_harness import RunStats

    results = []
    for size, ms in ((100, 0.4), (200, 0.35)):
        s = RunStats(name=f"snapshot_{size:06d}")
        s.runs_sec = [ms, ms * 1.1]
        results.append(s)
    speed = plot_speed_charts(results, str(tmp_path), embed_sec=0.05)
    recall = plot_recall_charts([(100, 0.7, 0.68), (200, 0.84, 0.8)], str(tmp_path))
    names = {p.rsplit("/", 1)[-1] for p in speed + recall}
    assert names == {
        "search_speed_by_pages.png",
        "search_speed_by_collection.png",
        "recall_by_pages.png",
        "recall_by_collection.png",
    }
    for p in speed + recall:
        with open(p, "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"
        svg = p[:-4] + ".svg"
        assert os.path.exists(svg)
        ET.parse(svg)  # well-formed


def test_curation_experiment_funnel(spark, sf_dir, tmp_path):
    """EP4: funnel stages shrink monotonically, splits partition the
    curated set, packing conserves the train tokens, artifacts written."""
    from vectordb_acc_and_speed_exp_spark.experiments import curation_experiment

    out = str(tmp_path / "ep4")
    rows = {
        r.stage: r
        for r in curation_experiment(spark, sf_dir, out_prefix=out).collect()
    }
    assert (
        rows["raw"].n_docs >= rows["quality"].n_docs >= rows["dedup"].n_docs > 0
    )
    splits = [v for k, v in rows.items() if k.startswith("split:")]
    assert sum(s.n_docs for s in splits) == rows["dedup"].n_docs
    train = rows["split:train"]
    packed = next(v for k, v in rows.items() if k.startswith("packed_bins"))
    assert packed.n_tokens == train.n_tokens
    for suffix in ("_funnel.csv", "_funnel.json", "_funnel.svg"):
        assert os.path.exists(out + suffix)
