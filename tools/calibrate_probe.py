"""Calibrate the steal-probe baseline (VERDICT r11 #1).

Runs bench.py's deterministic CPU kernel N times and commits the MINIMUM
as PROBE_BASELINE.json — the quiet-box constant every bench run divides
its per-entry probe times by to get steal ratios. Run this on a quiet
window (1-min load < 0.1); the tool records the load it saw so a
contended calibration is self-incriminating.

The baseline is hardware-specific by design: it prices THIS box's CPU.
Recalibrate (and re-commit) only if the host changes; a baseline taken
on a stolen window would under-report steal forever after, which is why
the minimum of many reps — not a mean — is committed.

Usage: python tools/calibrate_probe.py [--reps 25]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=25)
    args = ap.parse_args()

    from bench import steal_probe

    # staleness protocol (VERDICT r12 #5): each recalibration BUMPS the
    # version and stamps its context, so close_round can tell "this box
    # permanently changed" (recalibrate) from "this window is stolen"
    # (wait), and cross-version normalized comparisons are flagged
    out = os.path.join(REPO, "PROBE_BASELINE.json")
    prev_version = 1
    try:
        with open(out) as fh:
            prev_version = int(json.load(fh).get("version", 1))
        version = prev_version + 1
    except (OSError, ValueError, TypeError, json.JSONDecodeError):
        version = 1

    load1 = os.getloadavg()[0]
    steal_probe()  # warm (page cache, allocator)
    samples = [round(steal_probe(), 4) for _ in range(args.reps)]
    best = min(samples)
    med = statistics.median(samples)
    import datetime

    payload = {
        "probe_sec": best,
        "version": version,
        "median_sec": round(med, 4),
        "n_reps": args.reps,
        "load1_at_calibration": round(load1, 2),
        "calibrated_at": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "kernel": "argsort+cumsum 800k float64, 2x min-of-passes "
        "(bench.steal_probe)",
        "note": "minimum of n_reps on a quiet window; bench.py divides "
        "each per-entry probe time by probe_sec to get the steal ratio; "
        "version bumps on every recalibration — normalized values are "
        "comparable only within one version",
    }
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    if version > 1:
        # record the discontinuity where round-over-round readers look
        # (VERDICT r12 #5): normalized composites across a version bump
        # are not like-for-like
        try:
            with open(os.path.join(REPO, "BENCH_NOTES.md"), "a") as fh:
                fh.write(
                    f"\n- probe baseline recalibrated v{prev_version} -> "
                    f"v{version} ({payload['calibrated_at']}, min "
                    f"{best:.4f} s, load1 {load1:.2f}): steal-normalized "
                    "values are comparable only within one baseline "
                    "version — treat cross-version normalized deltas as "
                    "unpriced.\n"
                )
        except OSError:
            pass
    spread = med / best if best else 1.0
    print(json.dumps({**payload, "median_over_min": round(spread, 4)}))
    if load1 > 0.2:
        print(
            f"WARNING: 1-min load was {load1:.2f} at calibration — "
            "re-run on a quieter window before committing", file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
