"""Per-family ANN recall floors (VERDICT r07 #4): the reference's own
methodology (Recall@K vs the brute-force oracle, README.md:28-31) as a
regression test, through the SAME harness that feeds the round-stamped
RECALL_r{N}.json artifact (tools/recall_report.py).

Two layers:
- here (sf0.001, cheap): per-family floors pinned just under today's
  measured values — a probe-budget or quantizer regression in any
  family trips its floor.
- at the close (sf0.1, matched scale): tools/close_round.py runs the
  report and FAILS the close if any family drops below the reference's
  degraded-HNSW floor of 0.70 (BASELINE.md: HNSW recall@10 at 58k docs)
  AT ITS SERVING BUDGET — since round 9 the serving budgets are chosen
  from each family's measured calibration curve at the 0.80 default
  target (VERDICT r08 #1), so the floor holds by construction unless
  the calibration or the served path regresses.
"""

from __future__ import annotations

REFERENCE_FLOOR = 0.70  # the reference's HNSW recall@10 at 58k docs

# measured at sf0.001 (round 9, MEASURED serving budgets — each family's
# calibration curve at the 0.85 default target): lsh .88, mtlsh .94,
# ivf .82, pq .78, sq 1.0, ivfsq .82, ivfpq .82, bq_tuned .88,
# ivfbq .82, graph 1.0, graph_ivf .82 — floors sit one noise-step
# (~0.04-0.06) under those
FLOORS = {
    "ann_lsh_topk": 0.82,
    "mt_lsh_ann_topk": 0.88,
    "ann_ivf_topk": 0.76,
    "ann_pq_topk": 0.72,
    "ann_sq_topk": 0.95,
    "ann_ivfsq_topk": 0.76,
    "ann_ivfpq_topk": 0.76,
    "ann_bq_tuned": 0.82,
    "ann_ivfbq_topk": 0.76,
    "graph_ann_topk": 0.95,
    "graph_ivf_ann_topk": 0.76,
}


def test_every_family_beats_its_floor(spark, sf_dir):
    from tools.recall_report import compute_recalls

    recalls = compute_recalls(spark, sf_dir)
    assert set(recalls) == set(FLOORS)  # the full family table
    low = {
        n: (r, FLOORS[n]) for n, r in recalls.items() if r < FLOORS[n]
    }
    assert not low, f"families below their pinned floor: {low}"


def test_floor_budgets_clear_reference_floor(spark, sf_dir):
    """The matched floor budgets (8-of-16 probes / shortlist 400 — what
    an operator dials for the reference's recall on an unstructured
    corpus) must clear the reference HNSW floor of 0.70 for every
    cell-pruned and short-list family — the same gate the round close
    applies at sf0.1."""
    from tools.recall_report import compute_floor_recalls

    floors = compute_floor_recalls(spark, sf_dir)
    assert len(floors) == 7
    low = {n: r for n, r in floors.items() if r < REFERENCE_FLOOR}
    assert not low, f"floor budgets below the reference floor: {low}"
