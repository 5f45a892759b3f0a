"""Driver-local relations that stay JVM-side.

``spark.createDataFrame(rows)`` backs the frame with a pickled
``parallelize`` RDD, so EVERY execution of a plan containing it round-trips
through Python workers — measured ~0.25-0.4 s per execution on the local
scheduling floor, paid again for each pass of a multi-pass query (RM3 runs
two scoring passes plus expansion mining over such frames). A ``VALUES``
literal parses to a Catalyst LocalRelation instead: zero Python-worker
involvement, constant-folded, broadcastable for free.

Supported: the scalar types serve paths put in driver-local frames
(bigint/long, int, float, double, string) plus arrays of those (query
vectors, probe cell lists). Anything fancier (maps, structs, timestamps)
should stay on ``createDataFrame`` — those frames are built once per
*session*, not once per query, and correctness beats the floor cost there.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

_SCALARS = {
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INT",
    "integer": "INT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "STRING",
}


def _sql_type(t: str) -> str:
    """DDL type name -> SQL render type; ValueError on anything local_df
    cannot literal-render."""
    t = t.strip().lower()
    if t in _SCALARS:
        return _SCALARS[t]
    if t.startswith("array<") and t.endswith(">"):
        elem = t[len("array<") : -1].strip()
        if elem in _SCALARS:
            return f"ARRAY<{_SCALARS[elem]}>"
    raise ValueError(
        f"local_df supports only {sorted(set(_SCALARS))} and arrays of "
        f"them; got {t!r} (use createDataFrame for this frame)"
    )


def _parse_ddl(ddl: str) -> list[tuple[str, str]]:
    cols = []
    # split on top-level commas only: array<...> of a scalar never
    # contains one, so a simple depth counter suffices
    depth = 0
    part = []
    parts = []
    for ch in ddl:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(part))
            part = []
        else:
            part.append(ch)
    parts.append("".join(part))
    for p in parts:
        name, typ = p.strip().split(None, 1)
        cols.append((name.strip(), _sql_type(typ)))
    return cols


def _esc(s: str) -> str:
    # Spark SQL string literals use backslash escapes (escapedStringLiterals
    # defaults to false); backslash first, then the quote
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _render(v, sql_type: str) -> str:
    if v is None:
        return f"CAST(NULL AS {sql_type})"
    if sql_type.startswith("ARRAY<"):
        elem = sql_type[len("ARRAY<") : -1]
        items = list(v)
        if not items:
            return f"CAST(array() AS {sql_type})"
        return "array(" + ", ".join(_render(e, elem) for e in items) + ")"
    if sql_type == "STRING":
        return f"'{_esc(str(v))}'"
    if sql_type in ("DOUBLE", "FLOAT"):
        f = float(v)
        if math.isnan(f):
            return f"CAST('NaN' AS {sql_type})"
        if math.isinf(f):
            sign = "-" if f < 0 else ""
            return f"CAST('{sign}Infinity' AS {sql_type})"
        # repr() is the shortest round-trip decimal: parsing it back yields
        # the identical IEEE double, and the FLOAT cast then performs the
        # same double->float rounding createDataFrame does
        return f"CAST('{f!r}' AS {sql_type})"
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
