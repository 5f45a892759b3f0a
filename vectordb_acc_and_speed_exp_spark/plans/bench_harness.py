"""Benchmark harness (reference B1-B5, EP2/EP3 shape:
chromadb_speed_experiment.py:420-518, chromadb_acc_experiment.py:566-665).

Reproduces the reference's measurement discipline on Spark:
- warm-up run before timing (B1, SPD:457-462 — JIT/codegen warm-up is real
  on the JVM too);
- ``num_runs`` timed repetitions with perf_counter (B2, SPD:469-481);
- mean/median/stdev rollup (A1, SPD:494-508) — computed driver-side over a
  handful of run timings (tiny data; Spark aggregation would be overhead);
- one results dict → JSON sink (S9) and flat CSV rows (S10).
"""

from __future__ import annotations

import csv
import json
import statistics
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class RunStats:
    name: str
    runs_sec: list[float] = field(default_factory=list)
    n_rows: int = 0

    @property
    def mean(self) -> float:
        return statistics.mean(self.runs_sec)

    @property
    def median(self) -> float:
        return statistics.median(self.runs_sec)

    @property
    def stdev(self) -> float:
        # population σ to match the reference's np.std (SURVEY.md §5 note c)
        return statistics.pstdev(self.runs_sec)

    def as_dict(self) -> dict:
        return {
            "name": self.name,
            "n_rows": self.n_rows,
            "runs_sec": self.runs_sec,
            "mean_sec": self.mean,
            "median_sec": self.median,
            "stdev_sec": self.stdev,
        }


def time_query(
    build: Callable[[], DataFrame],
    num_runs: int = 1,
    warm_up: bool = True,
    name: str = "query",
) -> RunStats:
    """Benchmark one query: build the plan fresh per run, execute to
    completion via a count-style action (the driver-side equivalent of the
    reference's collection.query timing loop)."""
    stats = RunStats(name=name)
    if warm_up:
        stats.n_rows = build().count()
    else:
        stats.n_rows = -1
    for _ in range(num_runs):
        t0 = time.perf_counter()
        n = build().count()
        stats.runs_sec.append(time.perf_counter() - t0)
        if stats.n_rows < 0:
            stats.n_rows = n
    return stats


def save_results_json(results: list[RunStats], path: str, meta: dict | None = None):
    """Nested JSON sink (reference S9, SPD:599-620)."""
    payload = {"meta": meta or {}, "results": [r.as_dict() for r in results]}
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


def save_results_csv(results: list[RunStats], path: str):
    """Flat CSV summary sink (reference S10, SPD:622-638)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "n_rows", "mean_sec", "median_sec", "stdev_sec"])
        for r in results:
            w.writerow([r.name, r.n_rows, r.mean, r.median, r.stdev])
