"""EP13: quantizer-drift economics — measure WHEN the offline retrain
is due (VERDICT r07 #3).

Frozen coarse quantizers (IVF centroids, shared by IVF-PQ and IVF-BQ)
assign upserted vectors forever against the training distribution. This
study upserts progressively SHIFTED batches into a facade collection
and measures, after each batch:

- the drift ratio the engine now maintains for free
  (operators/drift.py: batch mean coarse quantization error /
  training-time mean, folded in by ivf_index_upsert), and
- recall@10 vs the exact oracle for queries drawn FROM the drifted
  batch (the realistic serving case: queries drift with the data),
  through the composed facade paths mode="ivfbq" and mode="ivfpq" at
  their serving budgets (n_probe=4).

Why drift erodes recall at fixed probe budget: as the shift grows, every
frozen centroid becomes roughly equidistant from a drifted vector (the
shift dominates the distance), so the argmin assignment is decided by
noise components — cell membership decorrelates from locality, and the
n_probe nearest cells of a drifted query stop containing its true
neighbours. Mean quantization error grows monotonically with the same
shift, which is what makes it the right trigger statistic.

Finally the study retrains (VectorStore.retrain_quantizers -> lazy
rebuild on the current corpus) and shows recall restored and the ratio
reset — the fold-vs-rebuild economics, EP11-style, for quantizers.

Writes experiment_results/ep13_drift.json; EP13_DRIFT.md narrates the
measured table and pins DRIFT_TRIGGER_RATIO.

Usage: python tools/drift_study.py   (sf0.01, ~ a few minutes)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
# shift magnitude as a fraction of the corpus mean vector norm
DELTA_FRACS = [0.25, 0.5, 1.0, 2.0, 4.0]
BATCH_ROWS = 400
K = 10
N_QUERIES = 5


def main() -> int:
    import pyspark.sql.functions as F

    from vectordb_acc_and_speed_exp_spark.api import VectorStore
    from vectordb_acc_and_speed_exp_spark.io import load_table
    from vectordb_acc_and_speed_exp_spark.operators.ann import _hyperplanes
    from vectordb_acc_and_speed_exp_spark.session import get_spark

    spark = get_spark("ep13_drift", cpus=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()[0])
    mean_norm = emb.select(
        F.avg(F.sqrt(F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x),
            F.lit(0.0), lambda a, x: a + x,
        ))).alias("n")
    ).first().n
    # deterministic unit shift direction (the LSH hyperplane generator)
    u = _hyperplanes(dim, 1, seed=1313)[0]

    root = tempfile.mkdtemp(prefix="ep13_")
    store = VectorStore(spark, root, dim=dim)
    store.create_collection(
        "c",
        emb.select(F.col("vec_id").cast("string").alias("id"), "embedding"),
    )

    def shifted_batch(tag: int, delta: float):
        src = emb.limit(BATCH_ROWS)
        ulit = F.lit([float(x) * delta for x in u])
        return src.select(
            F.concat(F.lit(f"d{tag}_"), F.col("vec_id").cast("string")).alias(
                "id"
            ),
            F.zip_with(
                F.col("embedding").cast("array<double>"), ulit,
                lambda x, s: (x + s).cast("float"),
            ).alias("embedding"),
        )

    def recall_for(queries_rows, mode):
        qvecs = [[float(x) for x in r.embedding] for r in queries_rows]
        gt = {
            (r.query_id, r.item_id)
            for r in store.query("c", query_vecs=qvecs, k=K, mode="exact").collect()
        }
        got = {
            (r.query_id, r.item_id)
            for r in store.query("c", query_vecs=qvecs, k=K, mode=mode).collect()
        }
        return len(gt & got) / len(gt)

    # warm the artifacts (builds IVF layout + drift baseline + code twins)
    base_probe = emb.limit(N_QUERIES).collect()
    rows = [{
        "stage": "base",
        "delta_frac": 0.0,
        "ratio": None,
        "recall_ivfbq": recall_for(base_probe, "ivfbq"),
        "recall_ivfpq": recall_for(base_probe, "ivfpq"),
    }]
    print(f"[ep13] base: {rows[-1]}", flush=True)

    last_probe = None
    for i, frac in enumerate(DELTA_FRACS):
        delta = frac * mean_norm
        batch = shifted_batch(i, delta)
        store.add("c", batch)
        st = store.drift_status("c")
        last_probe = batch.limit(N_QUERIES).collect()
        rows.append({
            "stage": f"upsert_{i}",
            "delta_frac": frac,
            "ratio": round(st["ratio"], 4) if st.get("ratio") else None,
            "retrain_recommended": st.get("retrain_recommended"),
            "recall_ivfbq": recall_for(last_probe, "ivfbq"),
            "recall_ivfpq": recall_for(last_probe, "ivfpq"),
        })
        print(f"[ep13] {rows[-1]}", flush=True)

    # the recommended offline rebuild: retrain on the CURRENT corpus
    store.retrain_quantizers("c")
    st = store.drift_status("c")  # empty until rebuilt lazily
    rows.append({
        "stage": "rebuilt",
        "delta_frac": DELTA_FRACS[-1],
        "recall_ivfbq": recall_for(last_probe, "ivfbq"),
        "recall_ivfpq": recall_for(last_probe, "ivfpq"),
        "ratio_after": store.drift_status("c").get("ratio"),
    })
    print(f"[ep13] {rows[-1]}", flush=True)

    out = {
        "sf_dir": SF_DIR,
        "dim": dim,
        "mean_norm": mean_norm,
        "batch_rows": BATCH_ROWS,
        "k": K,
        "n_probe": 4,
        "rows": rows,
    }
    os.makedirs(os.path.join(REPO, "experiment_results"), exist_ok=True)
    with open(os.path.join(REPO, "experiment_results", "ep13_drift.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["rows"][-3:]))
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
