"""EP2/EP3 experiment runners: snapshot sweep structure, sinks, rollups."""

from __future__ import annotations

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
