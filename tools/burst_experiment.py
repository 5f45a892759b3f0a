"""Controlled in-entry contention experiment (VERDICT r12 #1 done-bar,
made repeatable — the round-13 8-hog experiment as a tool).

Spawns N single-core CPU hogs OUTSIDE the bench's process tree, runs
bench.py under them, kills the hogs, and reports what the new burst
accounting saw: per-entry ``other_busy_frac`` / ``steal_frac``
distributions, how many entries each bound flagged, and the run-level
verdict close_round's steal gate would hand the run. Expected on a
32-CPU box with 8 hogs: other_busy_frac ~0.25 on every entry, probe
median NEAR 1.0 (the single-threaded probe does not slow while cores
stay free — the blind spot the tick windows close), verdict CONTENDED
via burst_frac, steal_frac unchanged (in-sandbox hogs are not
hypervisor steal).

Side effect: bench.py overwrites BENCH_DETAIL_latest.json (and a
BENCH_DETAIL_r{N}.json) — ``git checkout`` them afterwards; this tool
is for calibration evidence, never for committed artifacts.

Usage:
    python tools/burst_experiment.py [--hogs 8] [--cpus 8] \
        [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hogs", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import close_round as cr

    hogs = []
    try:
        for _ in range(args.hogs):
            # start_new_session: the hog must NOT be a descendant of the
            # bench (read_tree_ticks would count it as bench work) — it
            # is a child of THIS tool, which is outside the bench tree
            hogs.append(
                subprocess.Popen(
                    [sys.executable, "-c", "while True: pass"],
                    start_new_session=True,
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                )
            )
        env = dict(os.environ)
        env["SPARK_GRAFT_SF_DIR"] = args.sf_dir
        env["SPARK_GRAFT_CPUS"] = str(args.cpus)
        env.setdefault("SPARK_GRAFT_ROUND", "99")
        print(
            f"[burst] {args.hogs} hogs up; running bench.py at "
            f"{args.sf_dir} on local[{args.cpus}] ...",
            flush=True,
        )
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, capture_output=True, text=True,
        )
        if p.returncode != 0:
            print("[burst] bench FAILED:")
            print("\n".join(p.stderr.strip().splitlines()[-5:]))
            return 2
    finally:
        for h in hogs:
            try:
                os.killpg(h.pid, signal.SIGKILL)
            except OSError:
                h.kill()

    with open(os.path.join(REPO, "BENCH_DETAIL_latest.json")) as fh:
        d = json.load(fh)
    pr = d["probe"]
    ob = pr.get("per_entry_other_busy_frac") or {}
    sf = pr.get("per_entry_steal_frac") or {}
    flagged = [k for k in d["queries"] if cr.entry_burst(d, k)]
    verdicts, _ = cr.steal_verdict([("hogged", d)])
    tag, tot, ratio, pmed, contended, burst_frac = verdicts[0]
    out = {
        "hogs": args.hogs,
        "total_sec": d["value"],
        "probe_median_ratio": pr.get("median_ratio"),
        "other_busy": {
            "median": round(statistics.median(ob.values()), 4) if ob else None,
            "max": max(ob.values()) if ob else None,
            "n_over_bound": sum(1 for v in ob.values() if v > cr.OTHER_BUSY_MAX),
        },
        "steal": {
            "median": round(statistics.median(sf.values()), 4) if sf else None,
            "max": max(sf.values()) if sf else None,
            "n_over_bound": sum(1 for v in sf.values() if v > cr.STEAL_FRAC_MAX),
        },
        "entries_flagged": len(flagged),
        "n_entries": len(d["queries"]),
        "burst_frac": burst_frac,
        "verdict": "CONTENDED" if contended else "clean",
    }
    print(json.dumps(out, indent=1))
    ok = contended and len(flagged) > 0
    print(
        "[burst] PASS: run rejected via burst accounting"
        if ok
        else "[burst] UNEXPECTED: hogged run was not flagged — "
        "recalibrate bounds (close_round.OTHER_BUSY_MAX) or check "
        "/proc availability"
    )
    print("[burst] reminder: git checkout BENCH_DETAIL_latest.json")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
