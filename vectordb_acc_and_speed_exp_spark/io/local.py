"""Driver-local relations that stay JVM-side.

``spark.createDataFrame(rows)`` backs the frame with a pickled
``parallelize`` RDD, so EVERY execution of a plan containing it round-trips
through Python workers — measured ~0.25-0.4 s per execution on the local
scheduling floor, paid again for each pass of a multi-pass query (RM3 runs
two scoring passes plus expansion mining over such frames). A ``VALUES``
literal parses to a Catalyst LocalRelation instead: zero Python-worker
involvement, constant-folded, broadcastable for free.

Only the scalar types the serve paths put in driver-local frames are
supported (bigint/long, int, double, string). Anything fancier (arrays,
timestamps) should stay on ``createDataFrame`` — those frames are built
once per *session*, not once per query, and correctness beats the floor
cost there.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

_TYPES = {
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INT",
    "integer": "INT",
    "double": "DOUBLE",
    "string": "STRING",
}


def _parse_ddl(ddl: str) -> list[tuple[str, str]]:
    cols = []
    for part in ddl.split(","):
        name, typ = part.strip().split()
        t = typ.strip().lower()
        if t not in _TYPES:
            raise ValueError(
                f"local_df supports only {sorted(set(_TYPES))}; got {typ!r} "
                f"for column {name!r} (use createDataFrame for this frame)"
            )
        cols.append((name.strip(), _TYPES[t]))
    return cols


def _esc(s: str) -> str:
    # Spark SQL string literals use backslash escapes (escapedStringLiterals
    # defaults to false); backslash first, then the quote
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _render(v, sql_type: str) -> str:
    if v is None:
        return f"CAST(NULL AS {sql_type})"
    if sql_type == "STRING":
        return f"'{_esc(str(v))}'"
    if sql_type == "DOUBLE":
        f = float(v)
        if math.isnan(f):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(f):
            sign = "-" if f < 0 else ""
            return f"CAST('{sign}Infinity' AS DOUBLE)"
        # repr() is the shortest round-trip decimal; parsing it back yields
        # the identical IEEE double in both engines
        return f"CAST('{f!r}' AS DOUBLE)"
    # BIGINT / INT
    return f"CAST({int(v)} AS {sql_type})"


def local_df(spark: SparkSession, rows, ddl: str) -> DataFrame:
    """A driver-local DataFrame as a JVM LocalRelation (``VALUES`` literal).

    Drop-in for ``spark.createDataFrame(rows, ddl)`` on small driver-side
    row lists in per-query serve paths — same rows, same schema, but the
    plan never re-enters Python at execution time. Values are rendered
    with explicit CASTs (no literal-type inference surprises) and strings
    are escaped, so arbitrary text is safe."""
    cols = _parse_ddl(ddl)
    names = ", ".join(f"`{n}`" for n, _ in cols)
    if not rows:
        nulls = ", ".join(
            f"CAST(NULL AS {t}) AS `{n}`" for n, t in cols
        )
        return _sql_no_subst(spark, f"SELECT {nulls} WHERE 1=0")
    tuples = ",\n".join(
        "(" + ", ".join(_render(v, t) for v, (_, t) in zip(row, cols)) + ")"
        for row in rows
    )
    return _sql_no_subst(
        spark, f"SELECT * FROM VALUES {tuples} AS t({names})"
    )


def _sql_no_subst(spark: SparkSession, sql: str) -> DataFrame:
    """spark.sql with ``${...}`` variable substitution off — user text in
    the string literals must never be rewritten. Parsing happens inside
    the spark.sql call, so restoring the conf afterwards is safe."""
    legacy = "spark.sql.variable.substitute"
    prev = spark.conf.get(legacy, "true")
    spark.conf.set(legacy, "false")
    try:
        return spark.sql(sql)
    finally:
        spark.conf.set(legacy, prev)
