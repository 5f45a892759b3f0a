"""Cross-engine TYPE audit for every oracled query (VERDICT r04 #2).

The driver canonicalizes both result sets via pandas before hashing, so two
classes of type drift break the hash even when values are identical:

1. HUGEINT widening: DuckDB widens sum(INTEGER/BIGINT) to HUGEINT, which
   pandas materializes as float64 ("44706797.0") while Spark returns bigint
   ("44706797").  Every integer-sum oracle column needs an outer
   CAST(... AS BIGINT).
2. Unhashable cells: array/map/struct output columns crash the driver's
   pandas sort_values canonicalizer (``unhashable type: 'list'``).

Cost note: most Spark schemas resolve lazily, but queries whose BUILD step
executes eagerly (streaming replays, the VectorStore facade's collection
round-trip, operators that localCheckpoint their result) run real jobs at
sf0.001 during construction — the audit is a minutes-scale pass, not
free.  Per-query try/except keeps one failure from blocking the rest.
The DuckDB oracles execute at sf0.001.  For each oracled query it flags:
- any Spark output column of Array/Map/Struct type;
- any DuckDB cell that materializes as list/ndarray/dict;
- any column integral on the Spark side but float64 out of DuckDB with all
  integral values (the HUGEINT signature);
- name-set mismatches between the two sides (hash would fail on schema);
- ROUNDING HALF-TIES (VERDICT r06 #7): for every ``round(expr, N) AS col``
  emission found in the oracle SQL, the round() wrapper is STRIPPED and
  the modified SQL re-executed so the proximity test sees PRE-round
  values (a post-round column is always integral at the grid and can
  never sit near a tie — checking it is vacuous); flags any pre-round
  value within 1e-9 of an exact half-tie (…5 at the N+1-th decimal).  Spark rounds the double's exact
  binary expansion HALF_UP via BigDecimal while DuckDB rounds in double
  arithmetic, so a value ON (or within double-noise of) the boundary can
  round apart between engines — today's fixtures may pass while a
  regenerated fixture flips one.  Ties that occur BY CONSTRUCTION (ratios
  of small integers, NDCG-style) must move to the exact 1e6 integer grid
  instead (the convention note in queries/__init__.py).

Usage: python tools/audit_oracle_types.py [sf_dir]
Exit 0 = clean, 1 = findings printed.
"""

from __future__ import annotations

import os
import re
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> int:
    import __spark_entry__ as entrymod
    from pyspark.sql import types as T
    from vectordb_acc_and_speed_exp_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark("oracle-type-audit", cpus=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    findings: list[str] = []
    integral_spark = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    complex_spark = (T.ArrayType, T.MapType, T.StructType)

    for name in sorted(oracles):
        try:
            sdf = qs[name](spark, SF_DIR)
            spark_types = {f.name: f.dataType for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            findings.append(f"{name}: Spark plan failed to resolve: {e!r:.150}")
            continue
        for col, dt in spark_types.items():
            if isinstance(dt, complex_spark):
                findings.append(
                    f"{name}: Spark column {col!r} is {dt.simpleString()} — "
                    "driver canonicalizer cannot hash it"
                )
        try:
            odf: pd.DataFrame = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            findings.append(f"{name}: oracle SQL failed in DuckDB: {e!r:.150}")
            continue
        if set(odf.columns) != set(spark_types):
            findings.append(
                f"{name}: column-name mismatch spark={sorted(spark_types)} "
                f"oracle={sorted(odf.columns)}"
            )
            continue
        # rounded emissions: the tie test MUST see PRE-round values — a
        # post-round column always sits at frac 0, never near .5, making
        # a check on the output vacuous — so every `round(expr, N)`
        # occurrence (see nesting note below, anywhere in the
        # SQL incl. inside CASE arms) is stripped to `(expr)` and the
        # modified SQL re-executed as the probe (up to five nesting
        # levels — covers every oracle in the registry today; a deeper
        # one trips the explicit could-not-parse finding below). Aliases
        # are untouched,
        # so columns line up by name; every float column is then tested
        # at every decimal-precision the query rounds at (conservative:
        # may test a column at a dp it doesn't use — over-flagging is
        # the right failure mode for an audit).
        expr2 = r"[^()]*"
        for _ in range(5):
            expr2 = rf"[^()]*(?:\({expr2}\)[^()]*)*"
        round_rx = re.compile(
            rf"round\(({expr2}),\s*(\d+)\s*\)", re.IGNORECASE
        )
        matches = list(round_rx.finditer(oracles[name]))
        round_dps = sorted({int(m.group(2)) for m in matches})
        pre_round: pd.DataFrame | None = None
        if matches:
            probe_sql = round_rx.sub(r"(\1)", oracles[name])
            try:
                pre_round = con.execute(probe_sql).df()
            except Exception as e:  # noqa: BLE001
                findings.append(
                    f"{name}: pre-round tie probe failed in DuckDB: "
                    f"{e!r:.150}"
                )
        # dp-less `round(expr)` is the sanctioned integer-grid emission
        # (engine-stable: identical double in, half-away-from-zero out in
        # both engines) — strip those too, and flag only a round() that
        # NEITHER pattern consumed (deeper nesting than the probe parses)
        intgrid_rx = re.compile(rf"round\(({expr2})\)", re.IGNORECASE)
        leftover = intgrid_rx.sub(
            r"(\1)", round_rx.sub(r"(\1)", oracles[name])
        )
        if re.search(r"round\s*\(", leftover, re.IGNORECASE):
            findings.append(
                f"{name}: oracle contains a round() the probe pattern "
                "could not parse (>5 paren nesting levels?) — half-tie "
                "exposure unaudited"
            )
        for col in odf.columns:
            s = odf[col]
            if s.dtype == object:
                bad = s.map(
                    lambda v: isinstance(v, (list, tuple, dict, np.ndarray))
                ).any()
                if bad:
                    findings.append(
                        f"{name}: oracle column {col!r} materializes "
                        "list/array cells — unhashable in the driver"
                    )
            elif (
                pre_round is not None
                and col in pre_round.columns
                and pre_round[col].dtype == np.float64
            ):
                # half-tie proximity on the PRE-round values:
                # |frac(v * 10^dp) - 0.5| inside 1e-9 means the emission
                # sits on (or within double-noise of) the rounding
                # boundary — engine-divergence risk. Columns no round()
                # touched have pre == post values; a flag on one means a
                # continuous emission grazes a grid tie, worth a look
                # anyway.
                for dp in round_dps:
                    vals = pre_round[col].dropna().to_numpy()
                    if not len(vals):
                        continue
                    frac = np.abs(np.mod(np.abs(vals) * 10.0 ** dp, 1.0) - 0.5)
                    n_ties = int((frac < 1e-9).sum())
                    if n_ties:
                        findings.append(
                            f"{name}: column {col!r} has {n_ties} value(s) "
                            f"within 1e-9 of a round(_, {dp}) half-tie — "
                            "move the emission to the exact 1e6 integer "
                            "grid (queries/__init__.py conventions)"
                        )
            if s.dtype == np.float64 and isinstance(
                spark_types[col], integral_spark
            ):
                # NULL-containing int64 also comes back float64 from pandas,
                # but that widening hits BOTH engines identically (the driver
                # canonicalizes the Spark side through pandas too) — only a
                # NULL-free float64 is the asymmetric HUGEINT signature.
                vals = s.dropna()
                if len(vals) == len(s) and len(vals) and (vals == vals.round()).all():
                    findings.append(
                        f"{name}: column {col!r} is {spark_types[col].simpleString()} "
                        "on Spark but float64 (all-integral) out of DuckDB — "
                        "HUGEINT widening; wrap the oracle aggregate in "
                        "CAST(... AS BIGINT)"
                    )

    if findings:
        print(f"{len(findings)} finding(s):")
        for f in findings:
            print(" -", f)
        return 1
    print(f"clean: {len(oracles)} oracled queries, no type drift")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
