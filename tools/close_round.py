"""Round-close runbook as one command: full gate + N bench runs + a
host-steal verdict.

The recurring trap this automates away (BENCH_NOTES rounds 4-7): a
CPU-stolen VM run inflates a contiguous WINDOW of untouched entries
20-80% while load-average stays near zero, and a single contended sample
has repeatedly masqueraded as a regression (r03's bf_codegen 12.2 s,
r07's rm3 5.05 s). Discipline: judge only across >=2 non-adjacent quiet
runs; this script runs the gate once, the bench twice (or --runs N),
compares per-entry times between runs, and flags any run whose entries
collectively diverge from the per-entry minima — the steal-window
signature — so a contended sample never lands as the committed artifact
unexamined.

Usage:
    python tools/close_round.py --round 8 [--runs 2] [--skip-gate]

Exit code 0 = gate green and at least one bench run is clean;
non-zero = gate failures or every bench run looked contended (rerun on a
quieter box before committing artifacts).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# a run is "contended" when its total exceeds the per-entry-minimum
# composite by this factor — the composite is what a fully quiet box
# would have produced, so 5% over it across 80+ entries is systematic
# steal, not per-entry noise.  Tightened 1.12 -> 1.05 (VERDICT r07 #5:
# round 7's "clean" run was 3.4% over composite yet 9% over the driver's
# own quieter measurement) — and the committed artifact is now the
# MINIMUM-total clean run, not the last one, so a mild steal window
# can't become the round's number just by running second.
CONTENTION_FACTOR = 1.05
# VERDICT r11 #1: cross-run ratios are blind to steal common to EVERY
# run of a close (the r11 close was +9% on identical code and passed as
# "clean").  bench.py now interleaves a fixed CPU probe between entries
# and prices each against the committed quiet-box baseline
# (PROBE_BASELINE.json); a run whose MEDIAN probe ratio exceeds this is
# contended in absolute terms, however its siblings look.  Measured
# floors (BENCH_NOTES round-12 controlled experiment): a QUIET bench
# run's in-bench median is ~1.12 (probes sit adjacent to entries and
# see trailing Spark activity the standalone calibration does not), a
# mild +8%-raw load reads ~1.17, and a 2x-steal run reads ~2.06 — so
# 1.25 separates the regimes with margin on both sides.
PROBE_CONTENTION = 1.25
# Backstop for probe-judged runs: bracket-min probes (bench.py) cannot
# see a steal burst that lands INSIDE an entry but is quiet at both
# brackets — measured at the r12 final close, where a 140 s run
# (x1.540 over the composite) carried a 1.08 probe median. A run this
# far over its siblings' minima is not artifact material whatever its
# probes say; 1.30 sits well above the min-composite misfire band
# (x1.08-1.15 on genuinely quiet 3-run closes) and well below burst
# inflation.
COMPOSITE_BACKSTOP = 1.30
# VERDICT r12 #1: price in-entry bursts DIRECTLY instead of leaning on
# the blunt backstop. bench.py brackets every timed entry with
# /proc/stat tick windows and emits two per-entry fractions:
#   steal_frac      — hypervisor steal ticks / total ticks (the exact
#                     signal the bracketing probes miss when a burst
#                     lands inside the entry),
#   other_busy_frac — CPU burned by processes OUTSIDE the bench's own
#                     process tree (in-sandbox contention: another
#                     driver, the session harness under load).
# An entry sample over either bound is a BURST sample: it is excluded
# from the per-entry min/normalized stats when any clean sibling
# sample exists, and a run whose burst samples carry more than
# BURST_TIME_FRAC of its total is contended BEFORE the x1.30 backstop.
# Bounds (BENCH_NOTES round-13 calibration): a quiet bench run's
# steal_frac is ~0.000-0.01 (this VM's background steal) and its
# other_busy_frac envelope is <~0.05 (harness + daemons); 8 induced
# hogs on 32 CPUs read ~0.25.
STEAL_FRAC_MAX = 0.05
OTHER_BUSY_MAX = 0.15
BURST_TIME_FRAC = 0.10
# PROBE_BASELINE staleness protocol (VERDICT r12 #5): the committed
# quiet-box constant prices THIS box; after a permanent host change (VM
# migration, CPU swap) every honest close would read contended (median
# probe ratio > PROBE_CONTENTION) forever, with no exit. Every close
# attempt records its MINIMUM probe ratio to PROBE_STALENESS.json; when
# the last STALE_PROBE_CLOSES attempts under the CURRENT baseline
# version all have min ratio > STALE_PROBE_RATIO, the box provably
# cannot produce a quiet close on this baseline — the close fails with
# an explicit "recalibrate" action (tools/calibrate_probe.py bumps the
# version and BENCH_NOTES records the discontinuity) instead of an
# opaque contended verdict. 1.15 sits below PROBE_CONTENTION (1.25) so
# a borderline-but-passable box never trips it, and above the quiet
# in-bench envelope (~1.12 median, lower minima).
STALE_PROBE_RATIO = 1.15
STALE_PROBE_CLOSES = 3


def read_probe_version(repo: str = REPO) -> int:
    try:
        with open(os.path.join(repo, "PROBE_BASELINE.json")) as fh:
            return int(json.load(fh).get("version", 1))
    except (OSError, ValueError, TypeError, json.JSONDecodeError):
        return 1


def record_probe_attempt(
    min_pmed: float, version: int, repo: str = REPO
) -> None:
    """Append this close attempt's minimum probe ratio to the staleness
    history (kept short — only the trailing window matters)."""
    path = os.path.join(repo, "PROBE_STALENESS.json")
    try:
        with open(path) as fh:
            hist = json.load(fh)
        if not isinstance(hist, list):
            hist = []
    except (OSError, ValueError, json.JSONDecodeError):
        hist = []
    hist.append({"min_probe_ratio": round(min_pmed, 4), "version": version})
    with open(path, "w") as fh:
        json.dump(hist[-12:], fh, indent=1)


def probe_baseline_stale(repo: str = REPO) -> bool:
    """True when the last STALE_PROBE_CLOSES recorded attempts under the
    current baseline version ALL have min probe ratio above
    STALE_PROBE_RATIO — a box on which a quiet close is impossible."""
    version = read_probe_version(repo)
    try:
        with open(os.path.join(repo, "PROBE_STALENESS.json")) as fh:
            hist = json.load(fh)
    except (OSError, ValueError, json.JSONDecodeError):
        return False
    if not isinstance(hist, list):
        return False
    same = [h for h in hist if h.get("version") == version]
    tail = same[-STALE_PROBE_CLOSES:]
    return len(tail) >= STALE_PROBE_CLOSES and all(
        (h.get("min_probe_ratio") or 0) > STALE_PROBE_RATIO for h in tail
    )


def entry_burst(r: dict, k: str) -> bool:
    """True when entry ``k``'s sample in run ``r`` carries an in-entry
    CPU burst per the /proc/stat tick windows (absent data = clean —
    pre-r13 artifacts and masked-procfs hosts degrade to the old
    probe+backstop judgment)."""
    pr = r.get("probe") or {}
    sf = (pr.get("per_entry_steal_frac") or {}).get(k)
    ob = (pr.get("per_entry_other_busy_frac") or {}).get(k)
    return (sf is not None and sf > STEAL_FRAC_MAX) or (
        ob is not None and ob > OTHER_BUSY_MAX
    )


def pick_entry_samples(runs: list[tuple[str, dict]], k: str) -> list[dict]:
    """The runs whose sample of entry ``k`` should feed min/normalized
    stats: burst samples are dropped when at least one clean sample
    exists (all-burst entries keep everything — a number beats a hole,
    and the run-level burst verdict already flags the situation)."""
    rs = [r for _, r in runs]
    clean = [r for r in rs if not entry_burst(r, k)]
    return clean if clean else rs


def run_gate(round_no: int) -> bool:
    env = dict(os.environ)
    env["SPARK_GRAFT_GATE_OUT"] = f"GATE_r{round_no:02d}.json"
    print(f"[close] full oracle gate -> GATE_r{round_no:02d}.json", flush=True)
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "check_oracle.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    tail = "\n".join(p.stdout.strip().splitlines()[-3:])
    print(tail, flush=True)
    return p.returncode == 0 and "0 failed" not in tail and " FAIL " not in tail


def run_recall(round_no: int) -> bool:
    """RECALL_r{N}.json at every close (VERDICT r07 #4): the accuracy
    half of the reference's methodology, round-stamped like the latency
    bench. Untimed — runs before the bench samples."""
    env = dict(os.environ)
    env["SPARK_GRAFT_ROUND"] = str(round_no)
    print(
        f"[close] recall report -> RECALL_r{round_no:02d}.json", flush=True
    )
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "recall_report.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    try:
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        payload = json.loads(line)
    except (IndexError, json.JSONDecodeError):
        print("[close]   recall report FAILED to produce a payload", flush=True)
        print(p.stderr.strip().splitlines()[-5:], flush=True)
        return False
    floor = payload["reference_hnsw_floor"]
    # VERDICT r10 #3: the close GATES on the 32-query calibration-sized
    # eval (families_calib) — the 5-query "entries"/"families" column is
    # known-biased (~0.10-0.14 low at mid-curve budgets, EP14) and is
    # now INFORMATIONAL only: still stamped in the artifact for
    # round-over-round continuity, never a pass/fail input.
    calib = payload.get("families_calib", {})
    if not calib:
        # the gate COLUMN itself is the contract now — a payload without
        # it must fail loudly, not pass vacuously
        print("[close]   families_calib MISSING from recall payload",
              flush=True)
        return False
    low = {f: r for f, r in calib.items() if r < floor}
    # VERDICT r11 #3: the served-recall@25 eval (pq/ivfbq/graph at the
    # 32-query size) is floor-gated exactly like the k=10 column — a
    # k-keyed calibration that under-delivers at 25 fails the close
    calib25 = payload.get("families_calib_k25", {})
    if not calib25:
        print("[close]   families_calib_k25 MISSING from recall payload",
              flush=True)
        return False
    low25 = {f: r for f, r in calib25.items() if r < floor}
    if low25:
        print(f"[close]   BELOW FLOOR (32-query eval @k25): {low25}",
              flush=True)
    print(
        f"[close]   32-query serving recall min "
        f"{min(calib.values()):.2f} @k10 / "
        f"{min(calib25.values()):.2f} @k25 (reference floor {floor}; "
        f"informational 5-query min {payload['min_family']:.2f})",
        flush=True,
    )
    if low:
        print(f"[close]   BELOW FLOOR (32-query eval): {low}", flush=True)
    soft = {f: r for f, r in calib.items() if floor <= r < 0.80}
    if soft:
        # the re-tune watchline (VERDICT r10 #3): above the reference
        # floor but under the 0.80 honest-eval bar — not a close
        # failure, but a named signal to re-tune that family's budget
        print(f"[close]   WATCH (<0.80 on honest eval): {soft}", flush=True)
    # round-over-round regression check, on the SAME honest eval: a
    # family may sit legitimately near the floor (isotropy-priced), but
    # a DROP vs the previous round's artifact means the served path
    # regressed — exactly the blind spot VERDICT r07 #4 named
    prev_path = os.path.join(REPO, f"RECALL_r{round_no - 1:02d}.json")
    dropped = {}
    if os.path.exists(prev_path):
        with open(prev_path) as fh:
            prev_payload = json.load(fh)
        prev = prev_payload.get("families_calib", {})
        if prev_payload.get("calib_version") != payload.get("calib_version"):
            # a calibration-methodology bump legitimately re-prices every
            # budget (e.g. v3's result-side self-pair exclusion shrinks
            # v2's one-rank-conservative budgets toward the target), so a
            # cross-version delta is re-pricing, not a served-path
            # regression — the floor gate above still applies in full
            print(
                f"[close]   calib version changed "
                f"({prev_payload.get('calib_version')} -> "
                f"{payload.get('calib_version')}): cross-version "
                f"regression check skipped (floor gate still binding)",
                flush=True,
            )
            prev = {}
        for fam, r in calib.items():
            if fam in prev and r < prev[fam] - 0.05:
                dropped[fam] = (prev[fam], r)
        # same check on the k=25 column (families first appear in r12;
        # absent-in-prev families simply have nothing to compare)
        prev25 = (
            prev_payload.get("families_calib_k25", {}) if prev else {}
        )
        for fam, r in calib25.items():
            if fam in prev25 and r < prev25[fam] - 0.05:
                dropped[f"{fam}@k25"] = (prev25[fam], r)
        if dropped:
            print(f"[close]   RECALL REGRESSION vs r{round_no - 1} "
                  f"(32-query eval): {dropped}", flush=True)
    # EP13 drift gate (VERDICT r08 #5): any maintained artifact whose
    # upsert-error ratio crossed its trigger fails the close — the
    # silently-drifting artifact is caught before its recall is
    drifting = {
        a: d for a, d in payload.get("drift", {}).items()
        if d.get("retrain_recommended")
    }
    if drifting:
        print(f"[close]   DRIFTED ARTIFACTS past trigger: {drifting}",
              flush=True)
    # VERDICT r10 #2: the committed walk must contain at least one LIVE
    # row (upsert_n > 0, non-null ratio) — a walk where every row is
    # ratio=None would look identical whether baselining works or is
    # silently broken; the canary's in-distribution add() provides the
    # row (recall_report merges it as live_upsert/<family>)
    live_rows = {
        a: d for a, d in payload.get("drift", {}).items()
        if (d.get("upsert_n") or 0) > 0 and d.get("ratio") is not None
    }
    # VERDICT r11 #6: one live row per family WITH a write path, not
    # just >= 1 overall — the canary primes every quantized family's
    # artifact before its in-distribution add, so a missing family
    # means its add()-side drift accumulator silently stopped working
    want_live = {"ivf", "ivfbq", "ivfpq", "ivfsq", "pq", "sq", "bq"}
    have_live = {a.split("/", 1)[1] for a in live_rows
                 if a.startswith("live_upsert/")}
    missing_live = want_live - have_live
    if live_rows:
        print(
            f"[close]   live drift rows (upsert_n > 0): "
            f"{sorted(live_rows)}", flush=True,
        )
    if missing_live:
        print(
            f"[close]   MISSING LIVE DRIFT ROWS for write-path families: "
            f"{sorted(missing_live)} — that family's add()-side "
            "accumulator produced no evidence", flush=True,
        )
    # falsifiable-gate canary (VERDICT r09 #2): the close also proves the
    # trigger CAN fire — a synthetic drifted upsert through the facade
    # must fire it and an in-distribution one must not; a broken trigger
    # fails the close even though the bench fixtures never upsert
    canary = payload.get("drift_canary", {})
    canary_ok = bool(canary.get("ok"))
    print(
        f"[close]   drift canary: in-dist ratio "
        f"{canary.get('in_distribution', {}).get('ratio')} "
        f"(fired={canary.get('in_distribution', {}).get('fired')}), "
        f"drifted ratio {canary.get('drifted', {}).get('ratio')} "
        f"(fired={canary.get('drifted', {}).get('fired')}) -> "
        f"{'OK' if canary_ok else 'BROKEN TRIGGER'}",
        flush=True,
    )
    calib = payload.get("families_calib", {})
    if calib:
        print(
            f"[close]   32-query serving recall: min "
            f"{min(calib.values()):.2f} "
            f"({min(calib, key=calib.get)}), max {max(calib.values()):.2f}",
            flush=True,
        )
    return (
        p.returncode == 0 and not low and not low25 and not dropped
        and not drifting and canary_ok and not missing_live
    )


def run_plans() -> bool:
    """Regenerate PLANS.md at every close (VERDICT r09 #5: the committed
    plan evidence went stale twice — entries landed after the last manual
    regeneration). After the regen, verify every registry entry is named
    in the file's inventory footer: a regen that silently ran against an
    older registry (stale import cache, wrong checkout) fails the close."""
    print("[close] regenerating PLANS.md (tools/dump_plans.py)", flush=True)
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "dump_plans.py")],
        cwd=REPO, capture_output=True, text=True,
    )
    if p.returncode != 0:
        print("[close]   dump_plans FAILED:", flush=True)
        print("\n".join(p.stderr.strip().splitlines()[-5:]), flush=True)
        return False
    sys.path.insert(0, REPO)
    from vectordb_acc_and_speed_exp_spark.queries import load_all

    registry = set(load_all())
    with open(os.path.join(REPO, "PLANS.md")) as fh:
        text = fh.read()
    # parse the inventory FOOTER as a set — a bare substring check passes
    # when a new entry's name happens to be a substring of an existing
    # entry or of any dumped plan text, which is exactly the stale-regen
    # hole this gate exists to close
    inventoried: set[str] = set()
    for line in text.splitlines():
        if line.startswith("Registry at generation:"):
            inventoried = {
                n.strip()
                for n in line.split("—", 1)[-1].split(",")
                if n.strip()
            }
    missing = sorted(registry - inventoried)
    if missing:
        print(f"[close]   PLANS.md regen missed registry entries: "
              f"{missing[:5]}{'...' if len(missing) > 5 else ''}",
              flush=True)
        return False
    print(f"[close]   PLANS.md fresh ({len(registry)} registry entries "
          "inventoried)", flush=True)
    return True


def run_frontier(round_no: int) -> bool:
    """FRONTIER_r{N}.json at every close (VERDICT r08 #8): the
    latency-vs-recall curve per ANN family, with the chosen serving
    defaults marked — the evidence behind the measured budgets."""
    env = dict(os.environ)
    env["SPARK_GRAFT_ROUND"] = str(round_no)
    print(f"[close] frontier report -> FRONTIER_r{round_no:02d}.json",
          flush=True)
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "frontier_report.py")],
        env=env, cwd=REPO, capture_output=True, text=True,
    )
    tail = p.stdout.strip().splitlines()[-1:] or ["<no output>"]
    print(f"[close]   {tail[0]}", flush=True)
    return p.returncode == 0


def append_bench_delta_notes() -> None:
    """One BENCH_NOTES line per round comparing MY close total
    (BENCH_DETAIL_r{R}) to the DRIVER's post-round total (BENCH_r{R}
    parsed.value) — the scoring signal's own error bar (VERDICT r08 #6).
    The driver runs after the close, so each close back-fills every
    earlier round that has both numbers and no note yet."""
    notes = os.path.join(REPO, "BENCH_NOTES.md")
    try:
        with open(notes) as fh:
            existing = fh.read()
    except OSError:
        existing = ""
    lines = []
    for detail in sorted(glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*.json"))):
        rr = detail.rsplit("_r", 1)[-1].split(".")[0]
        marker = f"driver-vs-close r{rr}:"
        if marker in existing:
            continue
        driver_path = os.path.join(REPO, f"BENCH_r{rr}.json")
        if not os.path.exists(driver_path):
            continue
        try:
            with open(detail) as fh:
                d = json.load(fh)
            close_total = float(d["value"])
            composite = d.get("quiet_composite")
            with open(driver_path) as fh:
                parsed = json.load(fh).get("parsed") or {}
            driver_total = float(parsed["value"])
        except (KeyError, TypeError, ValueError, json.JSONDecodeError):
            continue
        delta = (driver_total - close_total) / close_total * 100.0
        comp_note = (
            f" (quiet composite {float(composite):.2f} s)"
            if composite is not None else ""
        )
        lines.append(
            f"- {marker} close {close_total:.2f} s{comp_note} vs driver "
            f"{driver_total:.2f} s ({delta:+.1f}% — same code, different "
            "run environment; treat round-over-round deltas smaller than "
            "this as noise)"
        )
    if lines:
        with open(notes, "a") as fh:
            fh.write(
                "\n## Driver-vs-close environment delta (auto-appended "
                "by close_round.py)\n" if "Driver-vs-close" not in existing
                else "\n"
            )
            fh.write("\n".join(lines) + "\n")
        print(f"[close] BENCH_NOTES: appended {len(lines)} "
              "driver-vs-close delta note(s)", flush=True)


SCALE_RECALL_FLOOR = 0.70  # the reference HNSW floor, same as RECALL


def scale_recall_failures(payload: dict) -> dict:
    """Scale-family serve paths (100k/1M replicated corpora) below the
    recall floor — the quality gate on the VERDICT r12 #2 entries."""
    return {
        k: v
        for k, v in (payload.get("scale") or {}).items()
        if k.endswith("_recall10")
        and v is not None
        and v < SCALE_RECALL_FLOOR
    }


def write_scale_md(payload: dict, all_runs: list | None = None) -> None:
    """SCALE.md (VERDICT r12 #2): the measured 100k -> 1M serve-path
    scaling table, regenerated from the committed close payload so it
    can never go stale against the artifact it summarizes."""
    sc = payload.get("scale") or {}
    qs = payload.get("queries_stats") or {}
    builds = dict(payload.get("builds") or {})
    # the cold build cost lands on whichever run built the cache — take
    # the max across this close's runs so a warm chosen run doesn't
    # report 0 for work a sibling run paid
    for _tag, r in all_runs or []:
        for k, v in (r.get("builds") or {}).items():
            builds[k] = max(builds.get(k, 0.0), float(v))

    def _min(k):
        v = (qs.get(k) or {}).get("min")
        return f"{v:.2f}" if v is not None else "—"

    def _ratio(a, b):
        va = (qs.get(a) or {}).get("min")
        vb = (qs.get(b) or {}).get("min")
        return f"{vb / va:.2f}x" if va and vb else "—"

    def _rec(k):
        v = sc.get(k)
        return f"{v:.2f}" if v is not None else "—"

    if not sc or not qs:
        return
    lines = [
        "# SCALE — measured 100k -> 1M serve-path scaling",
        "",
        "Auto-generated by tools/close_round.py from the committed close",
        "payload (BENCH_DETAIL queries_stats minima + the untimed recall",
        "harness in bench.py's scale section). Corpus: the embeddings",
        "table replicated with deterministic per-replica jitter (distinct",
        "vectors clustered around each base point — real bucket/cell",
        "occupancy, not bit-identical copies). 10x the data; a pruned",
        "serve path should cost well under 10x the time, because its",
        "probed FRACTION shrinks as the index grows (more LSH buckets /",
        "more IVF cells at roughly constant probed rows).",
        "",
        "| serve path | 100k min s | 1M min s | time at 10x data "
        "| recall@10 100k | recall@10 1M |",
        "|---|---|---|---|---|---|",
        "| mt-LSH pruned (256-bucket budget) "
        f"| {_min('mtlsh_pruned_100k_5q')} | {_min('mtlsh_pruned_1m_5q')} "
        f"| {_ratio('mtlsh_pruned_100k_5q', 'mtlsh_pruned_1m_5q')} "
        f"| {_rec('mtlsh_100k_recall10')} | {_rec('mtlsh_1m_recall10')} |",
        "| IVF-PQ filtered (~1% eligible; n_probe 24->48 of 64->256 "
        "cells, shortlist flat at 400, ADC codebook k 16->64 — "
        "precision is build-time, so serve work stays flat) "
        f"| {_min('ivfpq_filtered_100k_5q')} | {_min('ivfpq_filtered_1m_5q')} "
        f"| {_ratio('ivfpq_filtered_100k_5q', 'ivfpq_filtered_1m_5q')} "
        f"| {_rec('ivfpq_filtered_100k_recall10')} "
        f"| {_rec('ivfpq_filtered_1m_recall10')} |",
        "",
        f"Recall floor (gated by close_round): {SCALE_RECALL_FLOOR} — "
        "the reference's own HNSW degrades to ~0.70 at 58k docs "
        "(BASELINE.md).",
        "",
        "One-time build amortization (corpus write, kmeans, PQ encode, "
        "mt-LSH signatures, exact ground truth — fingerprint-cached; "
        "every run's actual cost is in BENCH_DETAIL.builds): this "
        "close's runs paid "
        f"{builds.get('scale_100k_artifacts', 0):.1f} s (100k) / "
        f"{builds.get('scale_1m_artifacts', 0):.1f} s (1M); ~0 means "
        "the cache was already warm — measured cold at sf0.1: ~33 s / "
        "~98 s (BENCH_NOTES round-13).",
        "",
    ]
    with open(os.path.join(REPO, "SCALE.md"), "w") as fh:
        fh.write("\n".join(lines))


def run_bench(round_no: int, tag: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_ROUND"] = str(round_no)
    print(f"[close] bench run {tag} ...", flush=True)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if p.returncode != 0:
        raise RuntimeError(
            f"bench run {tag} failed:\n" + "\n".join(
                p.stderr.strip().splitlines()[-5:]
            )
        )
    # read the FULL payload from the detail file bench.py just wrote —
    # the final stdout line is the driver-tail-sized COMPACT summary
    # (truncated queries map), which must never feed the steal verdict
    # or be re-committed as BENCH_DETAIL
    with open(os.path.join(REPO, "BENCH_DETAIL_latest.json")) as fh:
        payload = json.load(fh)
    print(
        f"[close]   total {payload['value']:.2f} s over "
        f"{len(payload['queries'])} entries",
        flush=True,
    )
    return payload


def steal_verdict(
    runs: list[dict],
) -> tuple[list[tuple[str, float, float, float | None, bool]], float]:
    """(per-run verdicts, quiet composite). Per run: (tag, total,
    ratio_to_composite, median_probe_ratio, contended?, burst_frac).
    Composite = sum
    of per-entry minima across runs — the quiet-box estimate, persisted
    into BENCH_DETAIL so driver-vs-close comparisons carry it (VERDICT
    r10 #8).

    Contention (VERDICT r11 #1): judged by PROBE DRIFT — alone — when
    the run carries probe data priced against the COMMITTED baseline.
    The probe is the absolute signal: it catches steal common to every
    run (which the cross-run composite ratio structurally cannot) AND
    it exonerates a quiet run that the min-composite misfires on (with
    3+ runs and noisy entries, the per-entry-minimum composite is an
    unattainable cherry-pick — the r12 close measured two quiet runs
    at probe 1.066/1.064 rejected by composite ratios 1.117/1.084).
    Runs without committed-baseline probes (pre-r12 artifacts, missing
    PROBE_BASELINE.json) fall back to the composite-only trigger, as
    before."""
    keys = set.intersection(*(set(r["queries"]) for _, r in runs))
    composite = sum(min(r["queries"][k] for _, r in runs) for k in keys)
    out = []
    for tag, r in runs:
        tot = sum(r["queries"][k] for k in keys)
        ratio = tot / composite if composite else 1.0
        probe = r.get("probe") or {}
        pmed = probe.get("median_ratio")
        probe_absolute = (
            pmed is not None and probe.get("source") == "PROBE_BASELINE.json"
        )
        # in-entry burst pricing (VERDICT r12 #1): raw seconds of this
        # run's samples whose /proc/stat window crossed a burst bound,
        # as a fraction of the run total — judged BEFORE the blunt
        # x1.30 composite backstop
        burst_time = sum(
            r["queries"][k] for k in keys if entry_burst(r, k)
        )
        burst_frac = burst_time / tot if tot else 0.0
        contended = (
            pmed > PROBE_CONTENTION
            or burst_frac > BURST_TIME_FRAC
            or ratio > COMPOSITE_BACKSTOP
            if probe_absolute
            else ratio > CONTENTION_FACTOR
        )
        out.append((tag, tot, ratio, pmed, contended, round(burst_frac, 4)))
    return out, composite


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--skip-gate", action="store_true")
    ap.add_argument("--skip-recall", action="store_true")
    ap.add_argument("--skip-frontier", action="store_true")
    ap.add_argument("--skip-plans", action="store_true")
    args = ap.parse_args()

    if not args.skip_gate:
        if not run_gate(args.round):
            print("[close] GATE FAILURES — fix before closing", flush=True)
            return 2

    if not args.skip_recall and not run_recall(args.round):
        print(
            "[close] RECALL below reference floor (or drift past trigger)"
            " — fix before closing",
            flush=True,
        )
        return 4

    if not args.skip_frontier and not run_frontier(args.round):
        print("[close] FRONTIER report failed — fix before closing",
              flush=True)
        return 5

    if not args.skip_plans and not run_plans():
        print("[close] PLANS.md regeneration failed — fix before closing",
              flush=True)
        return 6

    runs = [
        (f"run{i+1}", run_bench(args.round, f"run{i+1}"))
        for i in range(max(2, args.runs))
    ]
    verdicts, composite = steal_verdict(runs)
    clean = [v for v in verdicts if not v[4]]
    print("[close] steal verdict (total / ratio-to-quiet-composite / "
          "median probe ratio / in-entry burst fraction):")
    for tag, tot, ratio, pmed, contended, burst_frac in verdicts:
        mark = "CONTENDED" if contended else "clean"
        pstr = f"probe x{pmed:.3f}" if pmed is not None else "probe n/a"
        print(
            f"[close]   {tag}: {tot:.2f} s  x{ratio:.3f}  {pstr}  "
            f"burst {burst_frac:.1%}  {mark}"
        )
    # staleness bookkeeping (VERDICT r12 #5): record this attempt's
    # minimum probe ratio when committed-baseline probe data exists
    pmeds = [
        v[3] for (t, r), v in zip(runs, verdicts)
        if v[3] is not None
        and (r.get("probe") or {}).get("source") == "PROBE_BASELINE.json"
    ]
    if pmeds:
        record_probe_attempt(min(pmeds), read_probe_version())
    if not clean:
        if pmeds and probe_baseline_stale():
            print(
                f"[close] PROBE BASELINE STALE: the last "
                f"{STALE_PROBE_CLOSES} close attempts on baseline "
                f"v{read_probe_version()} all have min probe ratio > "
                f"{STALE_PROBE_RATIO} — a quiet close is impossible on "
                "this baseline (permanent host change, not a steal "
                "window). ACTION: run tools/calibrate_probe.py --reps 30 "
                "on a 1-min load < 0.15 window; it bumps the baseline "
                "version and records the normalized-comparison "
                "discontinuity in BENCH_NOTES.",
                flush=True,
            )
            return 7
        print(
            "[close] every run looks contended — rerun on a quieter box "
            "before committing BENCH_DETAIL",
            flush=True,
        )
        return 3
    # commit the MINIMUM-TOTAL clean run: bench.py already wrote
    # BENCH_DETAIL on each run, so rewrite it from the chosen payload
    best = min(clean, key=lambda v: v[1])
    payload = dict(runs[[v[0] for v in verdicts].index(best[0])][1])
    # per-entry {min, median} across ALL runs of this close (VERDICT r09
    # #8): round-over-round per-query comparisons carry their own error
    # bar — judge deltas from "min" (the quiet-box estimate the steal
    # gate's composite is built from), read the min-median spread as the
    # entry's contention noise band
    import statistics

    keys = set.intersection(*(set(r["queries"]) for _, r in runs))

    def _norm(r: dict, k: str) -> float:
        # steal-normalized per-entry value: raw / adjacent-probe ratio.
        # bench.py precomputes these; when queries_normalized is absent
        # (pre-r12 artifact) actually RECOMPUTE from per_entry_ratio so a
        # mixed set of runs still yields consistently-constructed stats
        # (ADVICE r12: the old fallback silently mixed raw and normalized
        # minima into normalized_composite). Only a run with NO probe
        # ratios at all degrades to raw — and that run predates the probe
        # entirely, so every sibling in the same close does too.
        pre = (r.get("queries_normalized") or {}).get(k)
        if pre is not None:
            return float(pre)
        ratio = (r.get("probe") or {}).get("per_entry_ratio", {}).get(k)
        raw = float(r["queries"][k])
        if ratio is None:
            return raw
        return raw / max(float(ratio), 1.0)

    def _entry_stats(k: str) -> dict:
        # burst samples (in-entry steal / foreign-CPU windows, VERDICT
        # r12 #1) are dropped from min/normalized when a clean sibling
        # sample exists; the median stays over ALL runs so the
        # min-median spread still shows the burst as the entry's noise
        # band. "burst_excluded" records how many samples were dropped.
        picked = pick_entry_samples(runs, k)
        st = {
            "min": round(min(r["queries"][k] for r in picked), 4),
            "median": round(
                statistics.median(r["queries"][k] for _, r in runs), 4
            ),
            # probe ratio adjacent to this entry, from the run whose RAW
            # time was the minimum (the quietest sample of the entry)
            "probe_ratio": min(
                picked, key=lambda r: r["queries"][k]
            ).get("probe", {}).get("per_entry_ratio", {}).get(k),
            # the steal-corrected quiet estimate: min across runs of
            # (raw / probe ratio) — judge per-entry deltas from THIS
            "normalized": round(min(_norm(r, k) for r in picked), 4),
        }
        dropped = len(runs) - len(picked)
        if dropped:
            st["burst_excluded"] = dropped
        return st

    payload["queries_stats"] = {k: _entry_stats(k) for k in sorted(keys)}
    payload["n_runs"] = len(runs)
    # the quiet-box composite (sum of per-entry minima across this
    # close's runs): the number the steal gate judges against, persisted
    # so BENCH_NOTES' driver-vs-close delta can cite it without re-running
    payload["quiet_composite"] = round(composite, 4)
    # the steal-normalized composite (VERDICT r11 #1): sum of per-entry
    # normalized minima — two closes taken in different load windows
    # should agree on THIS number (done-bar: within ±5%), because steal
    # common to a whole close divides out of it
    payload["normalized_composite"] = round(
        sum(payload["queries_stats"][k]["normalized"] for k in keys), 4
    )
    # scale-family quality gate + SCALE.md regen (VERDICT r12 #2)
    low_scale = scale_recall_failures(payload)
    if low_scale:
        print(
            f"[close] SCALE-FAMILY RECALL below {SCALE_RECALL_FLOOR}: "
            f"{low_scale} — fix before committing BENCH_DETAIL",
            flush=True,
        )
        return 8
    write_scale_md(payload, all_runs=runs)
    detail = os.path.join(REPO, f"BENCH_DETAIL_r{args.round:02d}.json")
    with open(detail, "w") as fh:
        json.dump(payload, fh, indent=1)
    with open(os.path.join(REPO, "BENCH_DETAIL_latest.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(
        f"[close] committed-artifact candidate: {best[0]} "
        f"({best[1]:.2f} s) -> {os.path.basename(detail)}",
        flush=True,
    )
    append_bench_delta_notes()
    print(
        "[close] next: git add GATE_r{0:02d}.json BENCH_DETAIL_r{0:02d}.json "
        "BENCH_DETAIL_latest.json RECALL_r{0:02d}.json RECALL_latest.json "
        "FRONTIER_r{0:02d}.json FRONTIER_latest.json PLANS.md BENCH_NOTES.md "
        "SCALE.md PROBE_STALENESS.json experiment_results && commit".format(
            args.round
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
