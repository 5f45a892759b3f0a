"""Query registry: every implemented operator from SURVEY.md §2 exposed as a
(spark_fn, oracle_sql) pair consumed by ``__spark_entry__``.

Conventions (driver contract):
- each spark fn takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased identically in the Spark plan and the
  DuckDB oracle SQL (the driver sorts columns by name before hashing);
- float-valued outputs that cross an engine boundary are rounded (4 dp) on
  BOTH sides; money/aggregate sums are computed on exact scaled integers so
  shuffle order can never change a bit;
- NO array/map/struct columns in oracled outputs: the driver canonicalizer
  hashes cell values via pandas and list cells raise ``unhashable type`` —
  emit a scalar digest instead (md5 of the comma-joined element strings,
  same expression both sides; see embed_documents_md5, embedding_pooling);
- DuckDB widens sum(INTEGER/BIGINT) to HUGEINT, which pandas materializes
  as float64 — every integer-sum output column in an oracle must be wrapped
  ``CAST(sum(...) AS BIGINT)`` so the hash sees bigint on both sides;
- ROUNDING TIES: ``round(x, 4)`` emissions are only engine-stable while no
  value sits ON the half-tie boundary (…00005): Spark rounds the double's
  exact binary expansion HALF_UP via BigDecimal, DuckDB computes in double
  arithmetic — a true tie (or a value within double-noise of one) can round
  apart. Scores that can tie by construction (NDCG-style ratios of small
  integers) must be emitted on an exact integer grid (``CAST(round(x * 1e6)
  AS BIGINT)`` — the 1e6-grid idiom) instead of round(_, 4); for everything
  else tools/audit_oracle_types.py measures each rounded column's distance
  to the nearest half-tie and flags anything inside 1e-9 — run it after
  adding a rounded column or regenerating fixtures;
- oracle=None marks genuinely non-SQL-expressible operators (ANN, model
  inference, streaming state) — the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _driver_green_history() -> tuple[set[str], int]:
    """Scan the repo root for prior CORRECTNESS_r*.json driver reports.

    Returns (names hash-green in any prior round, next round number).  Used
    only to ORDER the registry — the external correctness harness checks the
    first N entries of ``queries()``, so oracled queries that have never
    received a driver-side green row must come first, and previously-green
    ones rotate through the remaining slots so every oracled query re-earns
    a driver row every couple of rounds.
    """
    import glob
    import json
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    green: set[str] = set()
    files = sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")))
    for f in files:
        try:
            with open(f) as fh:
                report = json.load(fh)
            for name, row in report.items():
                if isinstance(row, dict) and row.get("hash_match"):
                    green.add(name)
        except (OSError, ValueError):
            continue
    return green, len(files) + 1


# The external harness hash-checks only the first DRIVER_WINDOW entries of
# queries(); everything after gets at most a rows-only look.
DRIVER_WINDOW = 50


def _ordered(registry: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    """Order the registry so oracled queries fill the driver's check window.

    Priority: (1) oracled + never driver-green, (2) oracled + previously
    green, rotated by round number so the whole oracled set cycles through
    the window across rounds, (3) rows-only entries last.
    """
    green, round_no = _driver_green_history()
    oracled = [k for k, v in registry.items() if v.oracle is not None]
    rows_only = [k for k, v in registry.items() if v.oracle is None]
    never = sorted(k for k in oracled if k not in green)
    prev = sorted(k for k in oracled if k in green)
    if prev:
        slots = max(DRIVER_WINDOW - len(never), 0)
        off = (round_no * max(slots, 1)) % len(prev)
        prev = prev[off:] + prev[:off]
    order = never + prev + sorted(rows_only)
    return {k: registry[k] for k in order}


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY); returns the
    registry ordered oracled-first (see :func:`_ordered`)."""
    from . import (  # noqa: F401
        curation,
        pipeline,
        relational,
        retrieval,
        temporal,
        textops,
        vector,
    )

    return _ordered(REGISTRY)
