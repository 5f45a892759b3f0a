"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship exact k-NN query (the reference's golden
oracle: brute-force L2 top-k, chromadb_acc_experiment.py:508-537) on
sf0.001. ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 via the registry in
``vectordb_acc_and_speed_exp_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the caller's CWD
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from vectordb_acc_and_speed_exp_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["knn_exact_l2"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    operators (ANN, model inference) are intentionally absent."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
