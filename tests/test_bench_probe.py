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
