"""Dump ``.explain("formatted")`` for registry queries to plans/r<N>/.

Usage:
    python tools/explain_query.py --round 13 --suffix after [--sf DIR] name [name ...]

Writes plans/r<N>/<name>_<suffix>.txt — the judge-facing evidence files for
optimization rounds (one file per query per before/after capture).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--round", type=int, default=13)
    ap.add_argument("--suffix", default="after")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from vectordb_acc_and_speed_exp_spark.queries import load_all
    from vectordb_acc_and_speed_exp_spark.session import get_spark

    spark = get_spark("explain", cpus=8, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", f"r{args.round}")
    os.makedirs(out_dir, exist_ok=True)
    for name in args.names:
        df = registry[name].fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain(formatted) @ {args.sf}\n\n{plan}")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
