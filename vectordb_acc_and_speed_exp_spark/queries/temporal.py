"""Temporal-join gate queries: as-of attribution and pre-purchase window
context over the events table.

The oracles are deliberately DIFFERENT formulations: DuckDB's native
``ASOF JOIN`` (merge-join) checks the union-window re-expression, and a
plain inequality join checks the bin-bucketed interval join — the two
engines agree only if the Spark rewrites are semantically exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.temporal import asof_join, interval_join
from . import register

_30MIN_MS = 30 * 60 * 1000


@register(
    "purchase_click_asof",
    oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT event_id AS click_id, user_id, ts AS cts
           FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, p.user_id,
       epoch_ms(p.ts) AS purchase_ms,
       c.click_id,
       epoch_ms(c.cts) AS click_ms,
       epoch_ms(p.ts) - epoch_ms(c.cts) AS gap_ms
FROM p ASOF JOIN c ON p.user_id = c.user_id AND c.cts <= p.ts
""",
    doc="two-stream as-of join (purchases <- most recent prior click per "
    "user) via union+window, one shuffle on user_id; oracle is DuckDB's "
    "native ASOF JOIN",
)
def purchase_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("cts"),
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="cts",
        right_cols=["click_id", "cts"],
        how="inner",
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        "click_id",
        F.unix_millis("cts").alias("click_ms"),
        (F.unix_millis("ts") - F.unix_millis("cts")).alias("gap_ms"),
    )


@register(
    "purchase_window_surge",
    oracle=f"""
WITH p AS (SELECT event_id AS purchase_id, epoch_ms(ts) AS purchase_ms
           FROM events WHERE event_type = 'purchase'
           ORDER BY value DESC, event_id LIMIT 100),
     e AS (SELECT epoch_ms(ts) AS tms, user_id, value FROM events)
SELECT purchase_id, purchase_ms,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(CAST(round(e.value * 10000) AS BIGINT)) / 10000.0, 4)
         AS window_value_r
FROM p JOIN e ON e.tms >= p.purchase_ms - {_30MIN_MS} AND e.tms < p.purchase_ms
GROUP BY purchase_id, purchase_ms
""",
    doc="no-equi-key range join: site-wide activity in the 30 minutes "
    "before each of the top-100 purchases, via bin-bucketed interval "
    "join; oracle is a plain inequality join (DuckDB IEJoin)",
)
def purchase_window_surge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # deterministic top-100: TakeOrderedAndProject, value then id tiebreak
    intervals = (
        e.filter(F.col("event_type") == "purchase")
        .orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(100)
        .select(
            F.col("event_id").alias("purchase_id"),
            (F.unix_millis("ts") - F.lit(_30MIN_MS)).alias("start_ms"),
            F.unix_millis("ts").alias("end_ms"),
        )
    )
    points = e.select(
        F.unix_millis("ts").alias("tms"),
        F.col("user_id").alias("ev_user"),
        F.col("value").alias("ev_value"),
    )
    joined = interval_join(
        intervals, points, "start_ms", "end_ms", "tms", bin_width_ms=_30MIN_MS
    )
    return joined.groupBy(
        "purchase_id", F.col("end_ms").alias("purchase_ms")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("ev_user").alias("n_users"),
        F.round(
            F.sum(F.round(F.col("ev_value") * 10000).cast("bigint")) / 10000.0,
            4,
        ).alias("window_value_r"),
    )
