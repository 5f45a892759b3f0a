"""Temporal join operators: as-of join and interval (range) join.

Spark has no native ASOF JOIN (DuckDB/Pandas do) and naive inequality
joins degenerate to per-key cross products. Both operators here are
re-expressions with shuffle-friendly plans:

- ``asof_join``: union-then-window. Tag both inputs, union them, and run
  one ``last(..., ignorenulls)`` window per key ordered by time — the
  match for every left row is the most recent right row at-or-before it.
  Cost = ONE shuffle on the join key (identical to an equi-join), zero
  interval explosion, and skew behaves exactly like a groupBy on the same
  key. This is the standard scalable as-of formulation (same shape as
  Flink's temporal join); a merge-join-based ASOF (DuckDB) is the
  single-node analogue.

- ``interval_join``: bin bucketing. Slice time into fixed bins, explode
  each interval over the bins it covers (≤ ceil(len/bin)+1 rows), tag
  each point with its bin, equi-join on the bin, then post-filter the
  exact range. Turns an inequality join (DuckDB IEJoin territory) into a
  shuffle-keyed equi-join whose fan-out is bounded by bin occupancy.

Reference parity: the reference has no temporal joins (it is a vector
benchmark); these belong to the training-data-pipeline surface
(event-stream attribution / windowed context extraction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAYLOAD = "__asof_r"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_ms: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join: for each left row, attach ``right_cols`` from
    the right row with the greatest ``right_ts`` <= ``left_ts`` sharing
    the ``on`` key (optionally within ``tolerance_ms``).

    ``how``: "inner" keeps only matched left rows; "left" keeps all left
    rows with null payload on no-match. ``right_cols`` must not collide
    with left column names (alias beforehand). Determinism: if the right
    side can hold several rows per (on, right_ts), pre-reduce it — "the
    most recent row" is otherwise ambiguous (DuckDB ASOF has the same
    caveat).

    The right payload travels as ONE struct column so legitimately-null
    payload fields never make the window skip past the true match.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how={how!r} must be 'inner' or 'left'")
    lcols = left.columns
    # the payload always carries the right timestamp (for tolerance);
    # only the caller-requested right_cols survive to the output
    pay_cols = list(right_cols)
    if right_ts not in pay_cols:
        pay_cols.append(right_ts)

    # a NULL right_ts would sort to the partition head (ASC nulls-first)
    # and match left rows that have no true at-or-before row; "<= ts" is
    # unknown for NULL, so such rows can never match (DuckDB ASOF agrees)
    r = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in pay_cols]).alias(_PAYLOAD),
    )
    l = (
        left.withColumn(_TS, F.col(left_ts))
        .withColumn(_SIDE, F.lit(1))
        .withColumn(_PAYLOAD, F.lit(None).cast(r.schema[_PAYLOAD].dataType))
    )
    ltypes = dict(left.dtypes)
    for c in lcols:
        if c != on:
            r = r.withColumn(c, F.lit(None).cast(ltypes[c]))
    unioned = l.unionByName(r.select(*l.columns))

    # right rows (side=0) sort before left rows at equal ts => "<=" match
    w = (
        Window.partitionBy(on)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    if tolerance_ms is not None:
        gap = _ms(F.col(_TS), left.schema[left_ts].dataType) - _ms(
            F.col(_PAYLOAD).getField(right_ts), right.schema[right_ts].dataType
        )
        matched = matched.withColumn(
            _PAYLOAD, F.when(gap <= F.lit(tolerance_ms), F.col(_PAYLOAD))
        )
    if how == "inner":
        matched = matched.filter(F.col(_PAYLOAD).isNotNull())
    return matched.select(
        *lcols,
        *[F.col(_PAYLOAD).getField(c).alias(c) for c in right_cols],
    )


def _ms(col: Column, dtype) -> Column:
    return F.unix_millis(col) if isinstance(dtype, TimestampType) else col


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_width_ms: int,
) -> DataFrame:
    """Inner-join each point (``ts_col``) to every interval with
    ``start <= ts < end`` — NO equi key required. All three columns are
    epoch-ms bigints; column names must not clash across inputs.

    Bin bucketing: an interval of length L explodes into at most
    ``ceil(L / bin_width_ms) + 1`` bin rows, so pick ``bin_width_ms`` of
    the same order as the typical interval length (~2 bins per interval).
    The join key is the bin — calendar-time hotspots (every interval and
    point landing in the same busy hour) are the skew to watch; AQE's
    skew-join split handles moderate cases, salting the bin the extreme
    ones.
    """
    bw = F.lit(bin_width_ms)
    # an inverted/empty interval (end <= start) must produce ZERO rows —
    # F.sequence with stop < start silently emits a DESCENDING sequence,
    # fanning a data bug out into floor((start-end)/bin) bogus bin rows
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bw).cast("bigint"),
                F.floor((F.col(end_col) - 1) / bw).cast("bigint"),
            )
        ),
    )
    pt = points.withColumn(
        "__bin", F.floor(F.col(ts_col) / bw).cast("bigint")
    )
    return (
        iv.join(pt, "__bin")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bin")
    )
