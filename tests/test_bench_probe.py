"""Steal-probe infrastructure (VERDICT r11 #1): the bench's CPU
reference kernel, the committed quiet-box baseline, and close_round's
probe-drift contention verdict — the pieces that make perf claims
falsifiable on a steal-prone host."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_steal_probe_is_deterministic_work_and_positive():
    from bench import steal_probe

    a = steal_probe()
    b = steal_probe()
    assert a > 0 and b > 0
    # same fixed kernel both times: timings agree within CPU noise
    # (loose 3x band — this must hold even on a contended CI box)
    assert max(a, b) / min(a, b) < 3.0


def test_read_probe_baseline_roundtrip(tmp_path):
    from bench import read_probe_baseline

    v, src = read_probe_baseline(str(tmp_path))
    assert v is None and src == "absent"
    with open(tmp_path / "PROBE_BASELINE.json", "w") as fh:
        json.dump({"probe_sec": 0.25}, fh)
    v, src = read_probe_baseline(str(tmp_path))
    assert v == 0.25 and src == "PROBE_BASELINE.json"
    # torn/invalid file degrades to absent, never raises
    with open(tmp_path / "PROBE_BASELINE.json", "w") as fh:
        fh.write("{nope")
    assert read_probe_baseline(str(tmp_path))[0] is None


def _run(queries, median_ratio=None, source="PROBE_BASELINE.json"):
    r = {"queries": dict(queries)}
    if median_ratio is not None:
        r["probe"] = {"median_ratio": median_ratio, "source": source}
    return r


def test_steal_verdict_probe_drift_catches_common_steal():
    """The r11 hole: steal common to EVERY run is invisible to the
    cross-run composite ratio (both runs inflate together, each looks
    'clean' against their shared minima). With committed-baseline probe
    data, a median probe ratio over PROBE_CONTENTION marks the run
    contended in absolute terms."""
    from close_round import PROBE_CONTENTION, steal_verdict

    q = {"a": 2.0, "b": 3.0}
    runs = [
        ("run1", _run(q, median_ratio=1.3)),
        ("run2", _run(q, median_ratio=1.28)),
    ]
    verdicts, composite = steal_verdict(runs)
    assert composite == 5.0
    # identical totals -> composite ratio 1.0 for both (the blind spot)
    assert all(v[2] == 1.0 for v in verdicts)
    assert PROBE_CONTENTION < 1.28
    assert all(v[4] for v in verdicts)  # ...but probe drift flags both


def test_steal_verdict_quiet_probes_stay_clean_and_fallback_works():
    from close_round import steal_verdict

    runs = [
        ("run1", _run({"a": 2.0, "b": 3.0}, median_ratio=1.02)),
        ("run2", _run({"a": 2.1, "b": 3.1}, median_ratio=1.05)),
    ]
    verdicts, _ = steal_verdict(runs)
    assert not any(v[4] for v in verdicts)
    # an admissible quiet probe EXONERATES a run the min-composite
    # misfires on (3+ noisy runs make the per-entry-minimum composite
    # an unattainable cherry-pick — measured at the r12 close: probe
    # 1.066/1.064 runs rejected at composite x1.117/x1.084)
    runs = [
        ("run1", _run({"a": 2.4, "b": 2.6}, median_ratio=1.06)),
        ("run2", _run({"a": 2.0, "b": 3.2}, median_ratio=1.07)),
        ("run3", _run({"a": 3.2, "b": 2.0}, median_ratio=1.05)),
    ]
    verdicts, composite = steal_verdict(runs)
    assert composite == 4.0  # min-composite below every actual run
    assert all(v[2] > 1.05 for v in verdicts)  # old trigger fires on all
    assert not any(v[4] for v in verdicts)  # probe verdict: all quiet
    # ...but the gross-composite BACKSTOP still catches an in-entry
    # steal burst that both bracketing probes missed (measured at the
    # r12 final close: a x1.540 run carried a 1.08 probe median)
    runs.append(("run4", _run({"a": 3.0, "b": 3.5}, median_ratio=1.08)))
    verdicts, _ = steal_verdict(runs)
    assert verdicts[3][2] > 1.30 and verdicts[3][4]  # backstop fires
    assert not any(v[4] for v in verdicts[:3])
    # run-min probe source is NOT absolute evidence: it must fall back
    # to composite-only judgment (here run2 is 30% over the composite)
    runs = [
        ("run1", _run({"a": 2.0, "b": 3.0}, median_ratio=1.5,
                      source="run-min")),
        ("run2", _run({"a": 2.8, "b": 3.7}, median_ratio=1.5,
                      source="run-min")),
    ]
    verdicts, _ = steal_verdict(runs)
    assert not verdicts[0][4]  # quiet by composite, probe inadmissible
    assert verdicts[1][4]  # contended by composite
    # and runs with no probe block at all (pre-r12 artifacts) still work
    runs = [
        ("run1", _run({"a": 2.0})),
        ("run2", _run({"a": 2.0})),
    ]
    verdicts, _ = steal_verdict(runs)
    assert [v[4] for v in verdicts] == [False, False]
    assert all(v[3] is None for v in verdicts)


# ---- in-entry burst pricing via /proc/stat tick windows (VERDICT r12 #1)


def test_read_cpu_ticks_parses_and_degrades(tmp_path):
    from bench import read_cpu_ticks

    p = tmp_path / "stat"
    #         user nice system idle iowait irq softirq steal guest gnice
    p.write_text(
        "cpu  100 0 50 800 10 0 5 35 7 0\n"
        "cpu0 50 0 25 400 5 0 2 17 3 0\n"
    )
    t = read_cpu_ticks(str(p))
    # guest fields excluded (already inside user); idle = idle+iowait
    assert t == {"steal": 35, "busy": 190, "total": 1000}
    assert read_cpu_ticks(str(tmp_path / "missing")) is None
    p.write_text("intr 12 34\n")
    assert read_cpu_ticks(str(p)) is None
    p.write_text("cpu  banana\n")
    assert read_cpu_ticks(str(p)) is None


def _write_pid(proc, pid, ppid, utime, stime, comm="python"):
    d = proc / str(pid)
    d.mkdir(parents=True, exist_ok=True)
    # proc(5) stat: pid (comm) state ppid pgrp session tty tpgid flags
    # minflt cminflt majflt cmajflt utime stime ...
    (d / "stat").write_text(
        f"{pid} ({comm}) S {ppid} 1 1 0 -1 4194304 0 0 0 0 "
        f"{utime} {stime} 0 0 20 0 1 0 100 0 0\n"
    )


def test_read_tree_ticks_sums_descendants_only(tmp_path):
    from bench import read_tree_ticks

    proc = tmp_path / "proc"
    _write_pid(proc, 100, 1, 10, 5)
    _write_pid(proc, 101, 100, 100, 50, comm="java )(weird) name")
    _write_pid(proc, 102, 101, 7, 3)  # grandchild (pyspark worker)
    _write_pid(proc, 200, 1, 9999, 9999)  # unrelated process
    (proc / "not-a-pid").mkdir()
    assert read_tree_ticks(100, str(proc)) == 10 + 5 + 100 + 50 + 7 + 3
    assert read_tree_ticks(200, str(proc)) == 9999 + 9999
    # a pid with no entry contributes nothing but doesn't raise
    assert read_tree_ticks(999, str(proc)) == 0


def test_cpu_window_fracs_arithmetic_and_clamps():
    from bench import cpu_window_fracs

    c0 = {"steal": 100, "busy": 1000, "total": 10000}
    c1 = {"steal": 150, "busy": 1600, "total": 11000}
    # steal 50/1000; other busy = (600 - 400)/1000
    fr = cpu_window_fracs((c0, 2000), (c1, 2400))
    assert fr == {"steal_frac": 0.05, "other_busy_frac": 0.2}
    # bench tree burned more than measured busy (exited-worker skew,
    # rounding): clamps at 0, never negative
    fr = cpu_window_fracs((c0, 0), (c1, 5000))
    assert fr["other_busy_frac"] == 0.0
    # zero-width window, failed snapshots -> None
    assert cpu_window_fracs((c0, 10), (c0, 10)) is None
    assert cpu_window_fracs((None, 10), (c1, 20)) is None
    assert cpu_window_fracs((c0, None), (c1, 20)) is None


def test_live_cpu_snapshot_window_sane():
    """A real window around a busy loop on this host: fractions exist,
    land in [0, 1], and the bench's own spin does NOT count as other."""
    import time

    from bench import cpu_snapshot, cpu_window_fracs

    s0 = cpu_snapshot()
    t_end = time.perf_counter() + 0.3
    x = 0
    while time.perf_counter() < t_end:
        x += 1
    fr = cpu_window_fracs(s0, cpu_snapshot())
    if fr is None:  # masked procfs host: nothing to assert
        return
    assert 0.0 <= fr["steal_frac"] <= 1.0
    assert 0.0 <= fr["other_busy_frac"] <= 1.0
    # our own single-core spin is ~1/32 of the box and inside our tree;
    # "other" should not have absorbed it wholesale
    assert fr["other_busy_frac"] < 0.9


def _run_with_fracs(queries, median_ratio, steal=None, other=None):
    r = {"queries": dict(queries)}
    r["probe"] = {
        "median_ratio": median_ratio,
        "source": "PROBE_BASELINE.json",
        "per_entry_steal_frac": dict(steal or {}),
        "per_entry_other_busy_frac": dict(other or {}),
    }
    return r


def test_steal_verdict_rejects_in_entry_burst_before_backstop():
    """The r12 exhibit: a burst lands INSIDE one big entry, both
    bracketing probes quiet, run total well UNDER the x1.30 backstop —
    previously only the blunt backstop (or nothing) caught this."""
    from close_round import (
        BURST_TIME_FRAC,
        COMPOSITE_BACKSTOP,
        steal_verdict,
    )

    quiet = {"a": 2.0, "b": 3.0, "c": 5.0}
    bursty = {"a": 2.0, "b": 3.0, "c": 7.0}  # +2 s inside entry c
    runs = [
        ("run1", _run_with_fracs(quiet, 1.02)),
        ("run2", _run_with_fracs(bursty, 1.03, steal={"c": 0.22})),
    ]
    verdicts, _ = steal_verdict(runs)
    assert not verdicts[0][4]
    # run2: ratio 12/10 = 1.2 < backstop, probe quiet -> burst rule only
    assert verdicts[1][2] < COMPOSITE_BACKSTOP
    assert verdicts[1][5] > BURST_TIME_FRAC  # 7/12 of the total is burst
    assert verdicts[1][4], "burst run must be rejected by steal_frac"
    # same via the in-sandbox signal (other_busy_frac)
    runs[1] = ("run2", _run_with_fracs(bursty, 1.03, other={"c": 0.4}))
    verdicts, _ = steal_verdict(runs)
    assert verdicts[1][4]
    # a tiny burst entry (small share of total) does NOT reject the run
    small = {"a": 2.0, "b": 3.0, "c": 5.0, "d": 0.3}
    runs = [
        ("run1", _run_with_fracs({**quiet, "d": 0.2}, 1.02)),
        ("run2", _run_with_fracs(small, 1.03, steal={"d": 0.5})),
    ]
    verdicts, _ = steal_verdict(runs)
    assert not verdicts[1][4]


def test_pick_entry_samples_drops_burst_minima():
    """A burst sample must not become the committed per-entry min when a
    clean sibling exists; an all-burst entry keeps its samples."""
    from close_round import entry_burst, pick_entry_samples

    r_clean = _run_with_fracs({"a": 2.5}, 1.02)
    r_burst = _run_with_fracs({"a": 1.9}, 1.02, steal={"a": 0.3})
    runs = [("run1", r_clean), ("run2", r_burst)]
    assert not entry_burst(r_clean, "a") and entry_burst(r_burst, "a")
    assert pick_entry_samples(runs, "a") == [r_clean]
    both = [("run1", r_burst), ("run2", r_burst)]
    assert pick_entry_samples(both, "a") == [r_burst, r_burst]
    # absent frac data (pre-r13 artifact) = clean
    legacy = {"queries": {"a": 2.0}}
    assert not entry_burst(legacy, "a")


# ---- PROBE_BASELINE staleness protocol (VERDICT r12 #5)


def test_probe_staleness_protocol(tmp_path):
    """Simulated permanently-slower host: three consecutive close
    attempts with elevated min probe ratios on the same baseline version
    trip the recalibrate action; a version bump resets the streak."""
    import close_round as cr

    repo = str(tmp_path)
    with open(tmp_path / "PROBE_BASELINE.json", "w") as fh:
        json.dump({"probe_sec": 0.2, "version": 3}, fh)
    assert cr.read_probe_version(repo) == 3
    assert not cr.probe_baseline_stale(repo)  # no history yet
    cr.record_probe_attempt(1.22, 3, repo)
    cr.record_probe_attempt(1.31, 3, repo)
    assert not cr.probe_baseline_stale(repo)  # streak too short
    cr.record_probe_attempt(1.18, 3, repo)
    assert cr.probe_baseline_stale(repo)
    # one quiet attempt breaks the streak
    cr.record_probe_attempt(1.05, 3, repo)
    assert not cr.probe_baseline_stale(repo)
    # stale streak again, then a recalibration (version bump) resets it
    for _ in range(3):
        cr.record_probe_attempt(1.4, 3, repo)
    assert cr.probe_baseline_stale(repo)
    with open(tmp_path / "PROBE_BASELINE.json", "w") as fh:
        json.dump({"probe_sec": 0.31, "version": 4}, fh)
    assert not cr.probe_baseline_stale(repo)
    # history is trimmed, corrupt history degrades to not-stale
    with open(tmp_path / "PROBE_STALENESS.json") as fh:
        assert len(json.load(fh)) <= 12
    (tmp_path / "PROBE_STALENESS.json").write_text("{broken")
    assert not cr.probe_baseline_stale(repo)
    # versionless legacy baseline reads as version 1
    with open(tmp_path / "PROBE_BASELINE.json", "w") as fh:
        json.dump({"probe_sec": 0.2}, fh)
    assert cr.read_probe_version(repo) == 1


def test_baseline_version_reader(tmp_path):
    from bench import _baseline_version

    assert _baseline_version(str(tmp_path)) is None
    with open(tmp_path / "PROBE_BASELINE.json", "w") as fh:
        json.dump({"probe_sec": 0.2, "version": 2}, fh)
    assert _baseline_version(str(tmp_path)) == 2
    with open(tmp_path / "PROBE_BASELINE.json", "w") as fh:
        json.dump({"probe_sec": 0.2}, fh)
    assert _baseline_version(str(tmp_path)) == 1


def test_scale_recall_gate_and_scale_md(tmp_path, monkeypatch):
    """The close's scale-family quality gate (floor 0.70) and the
    SCALE.md regeneration from a committed payload."""
    import close_round as cr

    payload = {
        "scale": {
            "factor_1m": 500,
            "filter": "item_id % 100 = 0",
            "mtlsh_100k_recall10": 1.0,
            "mtlsh_1m_recall10": 0.95,
            "ivfpq_filtered_100k_recall10": 0.84,
            "ivfpq_filtered_1m_recall10": 1.0,
        },
        "queries_stats": {
            "mtlsh_pruned_100k_5q": {"min": 1.39},
            "mtlsh_pruned_1m_5q": {"min": 3.74},
            "ivfpq_filtered_100k_5q": {"min": 1.05},
            "ivfpq_filtered_1m_5q": {"min": 1.33},
        },
        "builds": {"scale_100k_artifacts": 0.0, "scale_1m_artifacts": 0.0},
    }
    assert cr.scale_recall_failures(payload) == {}
    payload["scale"]["mtlsh_1m_recall10"] = 0.62
    assert cr.scale_recall_failures(payload) == {"mtlsh_1m_recall10": 0.62}
    # None (masked-procfs / absent harness) is not a failure
    payload["scale"]["mtlsh_1m_recall10"] = None
    assert cr.scale_recall_failures(payload) == {}
    # pre-r13 payloads have no scale block at all
    assert cr.scale_recall_failures({"queries": {}}) == {}

    monkeypatch.setattr(cr, "REPO", str(tmp_path))
    payload["scale"]["mtlsh_1m_recall10"] = 0.95
    # cold cost surfaces from WHICHEVER run paid it, not just the chosen
    cr.write_scale_md(
        payload,
        all_runs=[("run1", {"builds": {"scale_1m_artifacts": 98.0}})],
    )
    text = (tmp_path / "SCALE.md").read_text()
    assert "2.69x" in text  # 3.74 / 1.39 time ratio at 10x data
    assert "1.27x" in text
    assert "98.0 s (1M)" in text
    assert "0.95" in text and "0.84" in text
