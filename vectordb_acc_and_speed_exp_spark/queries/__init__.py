"""Query registry: every implemented operator from SURVEY.md §2 exposed as a
(spark_fn, oracle_sql) pair consumed by ``__spark_entry__``.

Conventions (driver contract):
- each spark fn takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased identically in the Spark plan and the
  DuckDB oracle SQL (the driver sorts columns by name before hashing);
- float-valued outputs that cross an engine boundary are rounded (4 dp) on
  BOTH sides; money/aggregate sums are computed on exact scaled integers so
  shuffle order can never change a bit;
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


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from . import (  # noqa: F401
        curation,
        pipeline,
        relational,
        retrieval,
        temporal,
        textops,
        vector,
    )

    return REGISTRY
