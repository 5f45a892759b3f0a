"""Relational operator coverage: scans, filters, projections, hash
aggregations, multi-way joins, windows, sort/limit, and event-time analytics
(SURVEY.md §2.2 F1-F9, §2.4 A1-A5, §2.5 O1-O4, §2.6 X1-X9).

Determinism strategy for the DuckDB oracle: monetary/metric doubles are
scaled to exact integer cents *before* aggregation (sum of bigints is
shuffle-order independent), then divided back at the end — both engines
perform the identical final double ops, so even unrounded doubles hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..io.local import local_df
from . import register


def _cents(col: str):
    """Exact integer cents for a 2-decimal double column."""
    return F.round(F.col(col) * 100).cast("bigint")


# --------------------------------------------------------------------------
# Pricing-summary aggregation (TPC-H Q1 shape): filter pushdown + grouped
# partial/final hash agg. Reference A1/A2 are the same shape over benchmark
# runs (chromadb_speed_experiment.py:494-508, :540-548).
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
WITH l AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty100,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price100,
         CAST(round(l_discount * 100) AS BIGINT) AS disc100,
         CAST(round(l_tax * 100) AS BIGINT) AS tax100
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       sum(qty100) / 100.0 AS sum_qty,
       sum(price100) / 100.0 AS sum_base_price,
       sum(price100 * (100 - disc100)) / 10000.0 AS sum_disc_price,
       sum(price100 * (100 - disc100) * (100 + tax100)) / 1000000.0 AS sum_charge,
       sum(qty100) / 100.0 / count(*) AS avg_qty,
       sum(price100) / 100.0 / count(*) AS avg_price,
       sum(disc100) / 100.0 / count(*) AS avg_disc,
       count(*) AS count_order
FROM l GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    l = l.select(
        "l_returnflag",
        "l_linestatus",
        _cents("l_quantity").alias("qty100"),
        _cents("l_extendedprice").alias("price100"),
        _cents("l_discount").alias("disc100"),
        _cents("l_tax").alias("tax100"),
    )
    cnt = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum("qty100") / 100.0).alias("sum_qty"),
        (F.sum("price100") / 100.0).alias("sum_base_price"),
        (F.sum(F.col("price100") * (100 - F.col("disc100"))) / 10000.0).alias(
            "sum_disc_price"
        ),
        (
            F.sum(
                F.col("price100") * (100 - F.col("disc100")) * (100 + F.col("tax100"))
            )
            / 1000000.0
        ).alias("sum_charge"),
        (F.sum("qty100") / 100.0 / cnt).alias("avg_qty"),
        (F.sum("price100") / 100.0 / cnt).alias("avg_price"),
        (F.sum("disc100") / 100.0 / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


# --------------------------------------------------------------------------
# Multi-way star join with small-dimension broadcast (TPC-H Q5 shape).
# At 100 TB the fact side streams; every dimension here is broadcast so the
# only shuffle is the final group-by on n_name (25 groups).
# --------------------------------------------------------------------------
@register(
    "revenue_by_nation",
    oracle="""
SELECT n.n_name,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    # orders is a fact table: lineitem⋈orders is a shuffle join on the
    # order key (AQE may still broadcast at small SF); only the true
    # dimensions (customer/nation/region) get explicit broadcast hints.
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return joined.groupBy("n_name").agg(
        (F.sum(rev) / 10000.0).alias("revenue"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# Window top-N per group (reference V4 top-k generalized to relational data;
# same WindowGroupLimit physical shape as exact_knn).
# --------------------------------------------------------------------------
@register(
    "top_orders_per_customer",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT r.o_custkey, c.c_name, r.o_orderkey, r.o_totalprice, r.rn
FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
WHERE r.rn <= 3
""",
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ranked = o.withColumn("rn", F.row_number().over(w).cast("bigint")).filter(F.col("rn") <= 3)
    return ranked.join(F.broadcast(c), ranked.o_custkey == c.c_custkey).select(
        "o_custkey", "c_name", "o_orderkey", "o_totalprice", "rn"
    )


# --------------------------------------------------------------------------
# Anti-join (reference F2/F7: "skip what already exists",
# download_arxiv.py:50-51) — customers with no orders.
# --------------------------------------------------------------------------
@register(
    "customers_without_orders",
    oracle="""
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# Sort + limit (reference O1/O2: sorted collections, head limits).
# TakeOrderedAndProject — no full sort at scale.
# --------------------------------------------------------------------------
@register(
    "largest_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def largest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


# --------------------------------------------------------------------------
# Grouped counters (reference A5: status tallies, download_arxiv.py:94-107).
# --------------------------------------------------------------------------
@register(
    "order_priority_stats",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 / count(*) AS avg_price
FROM orders GROUP BY o_orderpriority
""",
)
def order_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cnt = F.count(F.lit(1))
    return o.groupBy("o_orderpriority").agg(
        cnt.alias("n_orders"),
        (F.sum(_cents("o_totalprice")) / 100.0).alias("total_price"),
        (F.sum(_cents("o_totalprice")) / 100.0 / cnt).alias("avg_price"),
    )


# --------------------------------------------------------------------------
# Event-time tumbling window aggregation (batch form; streaming twin lives
# in streaming/events.py). Hour buckets are emitted as formatted strings so
# both engines render identically.
# --------------------------------------------------------------------------
@register(
    "events_hourly",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
""",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_start"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(_cents("value")) / 100.0).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session. lag + running sum —
# the batch twin of streaming applyInPandasWithState sessionization.
# Millisecond epochs keep the gap math integer-exact in both engines.
# --------------------------------------------------------------------------
@register(
    "events_sessions",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, ts, epoch_ms(ts) AS ts_ms,
         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS is_new
  FROM ordered
), numbered AS (
  SELECT user_id, event_id, ts, ts_ms,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
  FROM flagged
)
SELECT user_id, session_num,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       max(ts_ms) - min(ts_ms) AS duration_ms
FROM numbered GROUP BY user_id, session_num
""",
)
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.unix_millis("ts").alias("ts_ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn("prev_ms", F.lag("ts_ms").over(w)).withColumn(
        "is_new",
        F.when(
            F.col("prev_ms").isNull() | (F.col("ts_ms") - F.col("prev_ms") > 1800000),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_num", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return numbered.groupBy("user_id", "session_num").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
    )


# --------------------------------------------------------------------------
# Exact distribution statistics (reference A1/A3/X9: mean/median/σ of run
# metrics, chromadb_speed_experiment.py:494-508, np.std at ACC:648-653).
# σ and the median are computed from exact scaled-integer sums so the
# doubles are bit-identical in both engines (population σ — the NumPy
# default, SURVEY.md §5 note).
# --------------------------------------------------------------------------
@register(
    "value_stats_by_type",
    oracle="""
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v100 FROM events
)
SELECT event_type,
       count(*) AS n,
       sum(v100) / 100.0 AS total_value,
       sum(v100) / 100.0 / count(*) AS mean_value,
       sqrt(sum(v100 * v100) / count(*) - pow(sum(v100) / count(*), 2)) / 100.0
         AS stddev_pop_value,
       quantile_cont(v100, 0.5) / 100.0 AS median_value,
       min(v100) / 100.0 AS min_value,
       max(v100) / 100.0 AS max_value
FROM v GROUP BY event_type
""",
)
def value_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type", _cents("value").alias("v100")
    )
    cnt = F.count(F.lit(1))
    return e.groupBy("event_type").agg(
        cnt.alias("n"),
        (F.sum("v100") / 100.0).alias("total_value"),
        (F.sum("v100") / 100.0 / cnt).alias("mean_value"),
        (
            F.sqrt(
                F.sum(F.col("v100") * F.col("v100")) / cnt
                - F.pow(F.sum("v100") / cnt, F.lit(2))
            )
            / 100.0
        ).alias("stddev_pop_value"),
        (F.percentile("v100", F.lit(0.5)) / 100.0).alias("median_value"),
        (F.min("v100") / 100.0).alias("min_value"),
        (F.max("v100") / 100.0).alias("max_value"),
    )


# --------------------------------------------------------------------------
# Conversion funnel: ordered step sequencing per user — a user counts for
# step k only if their first occurrence of step k follows their first
# occurrence of step k-1. One scan + one groupBy(user); the step logic is
# a conditional min-timestamp cascade, no joins and no window.
# --------------------------------------------------------------------------
@register(
    "conversion_funnel",
    oracle="""
WITH u AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END) AS t_signup,
         min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS t_view,
         min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS t_purchase
  FROM events GROUP BY user_id
),
f AS (
  SELECT user_id,
         CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END AS s1,
         CASE WHEN t_signup IS NOT NULL AND t_view > t_signup THEN 1 ELSE 0 END AS s2,
         CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
                   AND t_purchase > t_view THEN 1 ELSE 0 END AS s3
  FROM u
)
SELECT CAST(sum(s1) AS BIGINT) AS n_signup,
       CAST(sum(s2) AS BIGINT) AS n_signup_view,
       CAST(sum(s3) AS BIGINT) AS n_signup_view_purchase,
       round(sum(s3) * 1.0 / greatest(sum(s1), 1), 4) AS conversion_r
FROM f
""",
    doc="ordered conversion funnel signup -> view -> purchase per user: "
    "conditional-min cascade, one scan + one groupBy, no joins/windows",
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _funnel_frame(load_table(spark, sf_dir, "events"))


def _funnel_frame(events: DataFrame) -> DataFrame:
    """Core of ``conversion_funnel`` over any (user_id, event_type, ts)
    frame — exposed so tests can pin the ordered-step semantics."""
    e = events.select(
        "user_id", "event_type", F.unix_millis("ts").alias("tms")
    )
    first = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("tms"))
    )
    u = e.groupBy("user_id").agg(
        first("signup").alias("t_signup"),
        first("view").alias("t_view"),
        first("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_view") > F.col("t_signup"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_view"))
    f = u.select(
        s1.cast("int").alias("s1"),
        s2.cast("int").alias("s2"),
        s3.cast("int").alias("s3"),
    )
    return f.agg(
        F.sum("s1").alias("n_signup"),
        F.sum("s2").alias("n_signup_view"),
        F.sum("s3").alias("n_signup_view_purchase"),
        F.round(
            F.sum("s3") * 1.0 / F.greatest(F.sum("s1"), F.lit(1)), 4
        ).alias("conversion_r"),
    )


# --------------------------------------------------------------------------
# Tail-latency-style profiling: exact interpolated percentiles per group.
# Same scaled-integer trick as value_stats_by_type — interpolation runs on
# exact ints, only the final /100.0 + round(4) touches floats, so both
# engines land on the same bits.
# --------------------------------------------------------------------------
@register(
    "value_percentiles",
    oracle="""
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v100 FROM events
)
SELECT event_type, count(*) AS n,
       round(quantile_cont(v100, 0.50) / 100.0, 4) AS p50_r,
       round(quantile_cont(v100, 0.90) / 100.0, 4) AS p90_r,
       round(quantile_cont(v100, 0.95) / 100.0, 4) AS p95_r,
       round(quantile_cont(v100, 0.99) / 100.0, 4) AS p99_r
FROM v GROUP BY event_type
""",
    doc="exact linear-interpolated percentile profile per event type "
    "(data profiling / SLA tails); percentile() on scaled ints matches "
    "DuckDB quantile_cont bit-for-bit after round(4)",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type", _cents("value").alias("v100")
    )
    p = lambda q: F.round(F.percentile("v100", F.lit(q)) / 100.0, 4)  # noqa: E731
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        p(0.50).alias("p50_r"),
        p(0.90).alias("p90_r"),
        p(0.95).alias("p95_r"),
        p(0.99).alias("p99_r"),
    )


# --------------------------------------------------------------------------
# CUBE aggregation ([EXT] — grouping sets are absent from the reference,
# SURVEY.md §2.9; the rollup surface a metrics pipeline needs).
# --------------------------------------------------------------------------
@register(
    "sales_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", _cents("l_extendedprice").alias("p100")
    )
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        (F.sum("p100") / 100.0).alias("total_price"),
    )


# --------------------------------------------------------------------------
# Set operations ([EXT], absent from reference — SURVEY.md §2.9): customer
# retention between two order years via INTERSECT / EXCEPT.
# --------------------------------------------------------------------------
@register(
    "customer_retention",
    oracle="""
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate < TIMESTAMP '1997-01-01'),
y97 AS (SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01')
SELECT 'retained' AS cohort, o_custkey FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
UNION ALL
SELECT 'churned' AS cohort, o_custkey FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
UNION ALL
SELECT 'new' AS cohort, o_custkey FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96)
""",
)
def customer_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def year_keys(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = year_keys(1996), year_keys(1997)
    return (
        y96.intersect(y97).select(F.lit("retained").alias("cohort"), "o_custkey")
        .unionByName(
            y96.subtract(y97).select(F.lit("churned").alias("cohort"), "o_custkey")
        )
        .unionByName(
            y97.subtract(y96).select(F.lit("new").alias("cohort"), "o_custkey")
        )
    )


# --------------------------------------------------------------------------
# JSON property extraction ([EXT] — the reference only writes JSON as a
# sink, SURVEY.md §2.9; pipelines also need it as data).
# --------------------------------------------------------------------------
@register(
    "events_json_props",
    oracle="""
WITH p AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, count(*) AS n, count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k, sum(k) * 1.0 / count(k) AS avg_k
FROM p GROUP BY event_type
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k"),
    )
    cnt = F.count(F.lit(1))
    return e.groupBy("event_type").agg(
        cnt.alias("n"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        (F.sum("k") * 1.0 / F.count("k")).alias("avg_k"),
    )


# --------------------------------------------------------------------------
# As-of join ([EXT]; named in the north star as a custom operator Spark
# lacks): for every purchase event, the most recent click by the same user
# strictly before it. Expressed as a running last-non-null over the
# user-time-ordered event stream — one shuffle on user_id, no range
# explosion; the identical window formulation runs on both engines.
# --------------------------------------------------------------------------
@register(
    "purchase_attribution",
    oracle="""
WITH ordered AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms,
         last_value(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ms
  FROM events
)
SELECT event_id, user_id, ts_ms AS purchase_ms, last_click_ms,
       ts_ms - last_click_ms AS gap_ms
FROM ordered WHERE event_type = 'purchase'
""",
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_millis("ts").alias("ts_ms"), "ts"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("ts_ms")), ignorenulls=True
    ).over(w)
    return (
        e.withColumn("last_click_ms", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts_ms").alias("purchase_ms"),
            "last_click_ms",
            (F.col("ts_ms") - F.col("last_click_ms")).alias("gap_ms"),
        )
    )


# --------------------------------------------------------------------------
# Pure filter-aggregate (TPC-H Q6 shape): the canonical pushdown-everything
# query — one scan, zero joins, one scalar out.
# --------------------------------------------------------------------------
@register(
    "forecast_revenue",
    oracle="""
SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        (
            F.sum(_cents("l_extendedprice") * _cents("l_discount")) / 10000.0
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# Native session_window sessionization ([EXT]): Spark's built-in gap-merge
# session windows, oracled against the explicit lag/cumsum construction.
# Spark's session interval is half-open — a gap of EXACTLY 30 minutes starts
# a new session — so the oracle's new-session predicate is >= 1800000, not >.
# --------------------------------------------------------------------------
@register(
    "events_session_window",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, ts, epoch_ms(ts) AS ts_ms,
         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms >= 1800000 THEN 1 ELSE 0 END AS is_new
  FROM ordered
), numbered AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_num
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_num
""",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # session_window.start == first event ts of the merged session, which is
    # exactly the lag/cumsum oracle's min(ts)
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# Bloom-filter semi-join (operators/bloom.py): the shuffle-volume reducer
# for selective joins. The bloom probe is k broadcast joins + bit tests (no
# shuffle of lineitem); the exact verify semi-join makes the result
# bit-identical to a plain semi-join, which is exactly what the oracle runs.
# --------------------------------------------------------------------------
@register(
    "lineitem_bloom_semi",
    oracle="""
WITH premium AS (
  SELECT p_partkey FROM part WHERE p_size >= 45
)
SELECT l_returnflag,
       count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM premium)
GROUP BY l_returnflag
""",
    doc="bloom-prefiltered semi-join: lineitems of premium parts — bloom "
    "probe (no big-side shuffle) + exact verify; result == plain semi-join",
)
def lineitem_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    premium = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") >= 45
    )
    hits = bloom_semi_join(li, premium, "l_partkey", "p_partkey")
    return hits.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "revenue_cents"
        ),
    )


# --------------------------------------------------------------------------
# Skew-salted join, hash-verified: the events table has FIVE event_type
# keys over the whole fact side — the pathological-skew regime where a
# plain shuffle join puts ~20% of the table on one reducer. salted_join
# spreads each hot key over (key, salt) reducers; the gate proves the
# rewrite is semantics-preserving (same hash as the plain-join oracle).
# At 100 TB this is the documented escape hatch when AQE's runtime skew
# split can't apply (e.g. the skewed side feeds a further aggregation on
# the same key).
# --------------------------------------------------------------------------
@register(
    "events_salted_join",
    oracle="""
WITH dim AS (
  SELECT * FROM (VALUES
    ('click', 'engagement', 1),
    ('view', 'engagement', 0),
    ('purchase', 'revenue', 10),
    ('signup', 'growth', 5),
    ('logout', 'hygiene', 0)
  ) AS v(event_type, category, weight)
)
SELECT d.category,
       count(*) AS n_events,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT) * d.weight) AS BIGINT)
         AS weighted_cents
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY d.category
""",
    doc="skew-salted equi-join (5 hot keys spread over (key, salt) "
    "reducers) — hash-verified against the plain-join oracle, proving "
    "the salting rewrite is semantics-preserving",
)
def events_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_join

    e = load_table(spark, sf_dir, "events")
    dim = local_df(spark, 
        [
            ("click", "engagement", 1),
            ("view", "engagement", 0),
            ("purchase", "revenue", 10),
            ("signup", "growth", 5),
            ("logout", "hygiene", 0),
        ],
        "event_type string, category string, weight int",
    )
    joined = salted_join(e, dim, "event_type", n_salts=8)
    return joined.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.round(F.col("value") * 100).cast("bigint") * F.col("weight")
        ).alias("weighted_cents"),
    )


# --------------------------------------------------------------------------
# Hourly anomaly detection: z-score of each (hour, type) count against the
# type's own history — the observability query every event pipeline runs.
# σ is the exact population form on integer counts (sum/sum-of-squares on
# bigints — shuffle-order-proof); z is emitted rounded, flagged at |z|>=2.
# One pass to hourly counts (narrow), one broadcast-sized stats join.
# --------------------------------------------------------------------------
@register(
    "events_hourly_anomalies",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         count(*) AS n_hours,
         sum(n) AS s1,
         sum(n * n) AS s2
  FROM hourly GROUP BY event_type
),
scored AS (
  SELECT strftime(h.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
         h.event_type, h.n,
         (h.n - s.s1 * 1.0 / s.n_hours)
           / sqrt(greatest(s.s2 * 1.0 / s.n_hours
                           - (s.s1 * 1.0 / s.n_hours) ^ 2, 1e-12)) AS z
  FROM hourly h JOIN stats s ON h.event_type = s.event_type
)
SELECT hour_start, event_type, CAST(n AS BIGINT) AS n_events,
       round(z, 4) AS z_r
FROM scored WHERE abs(z) >= 2.0
""",
    doc="hourly count anomalies per event type: exact-integer population "
    "z-score, flagged at |z|>=2; one narrow aggregate + a broadcast stats "
    "join",
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    mean = F.col("s1") * 1.0 / F.col("n_hours")
    var = F.greatest(
        F.col("s2") * 1.0 / F.col("n_hours") - mean * mean, F.lit(1e-12)
    )
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        # filter on the UNROUNDED z exactly like the oracle (filtering on
        # the rounded value would diverge for z in [1.99995, 2))
        .filter(F.abs(z) >= 2.0)
        .select(
            F.date_format(F.col("h"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.round(z, 4).alias("z_r"),
        )
    )


# --------------------------------------------------------------------------
# Shipping priority (TPC-H Q3 shape): 3-table join with date predicates on
# both fact sides, revenue on exact cents, top-10 by (revenue desc, date).
# Plan shape: both date filters push into the scans; the customer-segment
# side broadcasts; lineitem shuffles once on l_orderkey.
# --------------------------------------------------------------------------
@register(
    "shipping_priority",
    oracle="""
SELECT l.l_orderkey AS orderkey,
       -- outer CAST: DuckDB widens sum(BIGINT) to HUGEINT, which pandas
       -- materializes as float64 and the driver's value-hash then sees
       -- 44706797.0 vs Spark's bigint 44706797.  Cast back down.
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-01-01'
  AND l.l_shipdate > DATE '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cents DESC, orderdate, orderkey
LIMIT 10
""",
    doc="TPC-H Q3 shape: segment filter broadcast, date predicates pushed "
    "into both fact scans, exact-cents revenue, top-10",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(rev).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("orderdate"), F.asc("orderkey"))
        .limit(10)
        .select("orderkey", "revenue_cents", "orderdate", "orderpriority")
    )


# --------------------------------------------------------------------------
# Path analysis: the most common 3-step event sequences (per-user lead
# windows, tie-broken by event_id for determinism when timestamps collide).
# One shuffle on user_id serves both leads; the path rollup is a narrow
# count. The funnel's exploratory twin: funnels test a KNOWN sequence,
# paths DISCOVER them.
# --------------------------------------------------------------------------
@register(
    "top_event_paths",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path
  FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
),
counted AS (
  SELECT path, count(*) AS n_occurrences FROM paths GROUP BY path
),
ranked AS (
  SELECT path, n_occurrences,
         row_number() OVER (ORDER BY n_occurrences DESC, path) AS rank
  FROM counted
)
SELECT CAST(rank AS BIGINT) AS rank, path, n_occurrences
FROM ranked WHERE rank <= 10
""",
    doc="top-10 3-step event paths: per-user lead windows (one user_id "
    "shuffle), narrow path rollup — funnel discovery",
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    counted = (
        seq.select(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    wr = Window.orderBy(F.desc("n_occurrences"), F.asc("path"))
    return (
        counted.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= 10)
        .select("rank", "path", "n_occurrences")
    )


# --------------------------------------------------------------------------
# Small-quantity-order revenue (TPC-H Q17 shape): correlated aggregate
# turned into a per-part average join — the classic decorrelation pattern
# Catalyst gets via a broadcast of the tiny per-part aggregate. Brand
# filter keeps the probe side selective. Exact cents throughout; the 0.2×
# avg threshold compares on cross-multiplied integers (qty100 * 5 * cnt <
# sum_qty100) so no float boundary exists.
# --------------------------------------------------------------------------
@register(
    "small_quantity_revenue",
    oracle="""
WITH pk AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'
),
agg AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS sum_qty100,
         count(*) AS cnt
  FROM lineitem JOIN pk ON l_partkey = p_partkey
  GROUP BY l_partkey
)
SELECT l.l_partkey AS partkey,
       count(*) AS n_small,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l
JOIN agg ON l.l_partkey = agg.l_partkey
WHERE CAST(round(l.l_quantity * 100) AS BIGINT) * 5 * agg.cnt
      < agg.sum_qty100
GROUP BY l.l_partkey
""",
    doc="TPC-H Q17 shape: per-part avg-quantity correlated aggregate "
    "decorrelated into a broadcast join; threshold compared on "
    "cross-multiplied exact ints (qty*5*cnt < sum_qty)",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select(F.col("p_partkey"))
    li = load_table(spark, sf_dir, "lineitem")
    branded = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    )
    agg = branded.groupBy("l_partkey").agg(
        F.sum(_cents("l_quantity")).cast("bigint").alias("sum_qty100"),
        F.count(F.lit(1)).alias("cnt"),
    )
    probe = li.join(F.broadcast(agg), "l_partkey").filter(
        _cents("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty100")
    )
    return probe.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.count(F.lit(1)).alias("n_small"),
        F.sum(_cents("l_extendedprice")).cast("bigint").alias("revenue_cents"),
    )


# --------------------------------------------------------------------------
# Customer spend deciles (window-function variety: ntile). Deterministic
# under ties via the customer-key tie-break in the window order; per-decile
# rollup on exact cents.
# --------------------------------------------------------------------------
@register(
    "customer_spend_deciles",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey, spend_cents,
         ntile(10) OVER (ORDER BY spend_cents DESC, o_custkey) AS decile
  FROM spend
)
SELECT decile,
       count(*) AS n_customers,
       CAST(sum(spend_cents) AS BIGINT) AS total_cents,
       min(spend_cents) AS min_cents,
       max(spend_cents) AS max_cents
FROM tiled GROUP BY decile
""",
    doc="ntile(10) over per-customer spend (desc, custkey tie-break) with "
    "per-decile exact-cents rollup — the whale-curve profile",
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).cast("bigint").alias("spend_cents")
    )
    w = Window.orderBy(F.desc("spend_cents"), F.asc("o_custkey"))
    tiled = spend.withColumn("decile", F.ntile(10).over(w))
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("spend_cents").cast("bigint").alias("total_cents"),
        F.min("spend_cents").alias("min_cents"),
        F.max("spend_cents").alias("max_cents"),
    )


# --------------------------------------------------------------------------
# Disjunctive-predicate revenue (TPC-H Q19 shape): an OR of
# (brand x size-range x quantity-range) conjuncts across a join — the
# optimizer-stress query for boolean pushdown (the common p_size/qty
# bounds factor out and push to both scans; the residual OR evaluates
# post-join in codegen). Exact cents; quantity bounds compared on the
# scaled grid.
# --------------------------------------------------------------------------
@register(
    "disjunctive_revenue",
    oracle="""
WITH l AS (
  SELECT l_partkey,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty100,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price100,
         CAST(round(l_discount * 100) AS BIGINT) AS disc100
  FROM lineitem
)
SELECT count(*) AS n_items,
       CAST(sum(price100 * (100 - disc100)) AS BIGINT) AS revenue_e4
FROM l JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND qty100 BETWEEN 100 AND 1100)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND qty100 BETWEEN 1000 AND 2000)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND qty100 BETWEEN 2000 AND 3000)
""",
    doc="TPC-H Q19 shape: OR of (brand x size x quantity) conjuncts across "
    "the lineitem-part join — boolean-pushdown stress; exact-cents revenue "
    "summed as bigints",
)
def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        _cents("l_quantity").alias("qty100"),
        _cents("l_extendedprice").alias("price100"),
        _cents("l_discount").alias("disc100"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("qty100").between(100, 1100)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("qty100").between(1000, 2000)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("qty100").between(2000, 3000)
        )
    )
    return joined.filter(clause).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("price100") * (100 - F.col("disc100")))
        .cast("bigint")
        .alias("revenue_e4"),
    )


# --------------------------------------------------------------------------
# Sole-late-supplier blame (TPC-H Q21 shape, adapted: the testdata has no
# commit/receipt dates, so "late" = shipped > 90 days after the order
# date): suppliers with a late item on a multi-supplier order where EVERY
# other supplier shipped on time — the EXISTS + NOT EXISTS chain that
# plans as one semi and one anti join over the same per-(order, supplier)
# rollup. Top 10 by (orders blamed desc, name).
# --------------------------------------------------------------------------
@register(
    "late_supplier_blame",
    oracle="""
WITH os AS (
  SELECT l_orderkey AS okey, l_suppkey AS skey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS was_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
),
blamed AS (
  SELECT a.okey, a.skey FROM os a
  WHERE a.was_late = 1
    AND EXISTS (SELECT 1 FROM os b
                WHERE b.okey = a.okey AND b.skey != a.skey)
    AND NOT EXISTS (SELECT 1 FROM os c
                    WHERE c.okey = a.okey AND c.skey != a.skey
                      AND c.was_late = 1)
)
SELECT s_name, count(*) AS n_orders
FROM blamed JOIN supplier ON skey = s_suppkey
GROUP BY s_name
ORDER BY n_orders DESC, s_name
LIMIT 10
""",
    doc="TPC-H Q21 shape: sole late supplier on multi-supplier orders — "
    "EXISTS + NOT EXISTS over one per-(order,supplier) rollup, planned as "
    "a semi + anti join pair; late = shipped >90 days after order date",
)
def late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    os_tbl = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("okey"),
            F.col("l_suppkey").alias("skey"),
        )
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
                ).cast("int")
            ).alias("was_late")
        )
    )
    a = os_tbl.alias("a")
    b = os_tbl.alias("b")
    c = os_tbl.alias("c")
    blamed = (
        a.filter(F.col("a.was_late") == 1)
        .join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.skey") != F.col("b.skey")),
            "left_semi",
        )
        .join(
            c,
            (F.col("a.okey") == F.col("c.okey"))
            & (F.col("a.skey") != F.col("c.skey"))
            & (F.col("c.was_late") == 1),
            "left_anti",
        )
        .select("okey", "skey")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(sup), blamed.skey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("s_name"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Revenue-share threshold (TPC-H Q11 shape): suppliers whose revenue
# exceeds a fixed fraction of GLOBAL revenue — the scalar-subquery
# pattern (one global aggregate broadcast into the HAVING). Exact-cents
# comparison by cross-multiplication: rev * 1000 > total (no division).
# --------------------------------------------------------------------------
@register(
    "supplier_revenue_share",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev100
  FROM lineitem GROUP BY l_suppkey
),
total AS (SELECT CAST(sum(rev100) AS BIGINT) AS t100 FROM rev)
SELECT r.l_suppkey AS suppkey, r.rev100,
       CAST(floor(r.rev100 * 1000000.0 / total.t100) AS BIGINT) AS share_s6
FROM rev r, total
WHERE r.rev100 * 1000 > total.t100
""",
    doc="TPC-H Q11 shape: suppliers above 1/1000 of global revenue — one "
    "scalar aggregate broadcast into the filter, exact-cents "
    "cross-multiplied threshold, share on the 1e6 floor grid",
)
def supplier_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(_cents("l_extendedprice")).cast("bigint").alias("rev100")
    )
    total = rev.agg(F.sum("rev100").cast("bigint").alias("t100"))
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("rev100") * 1000 > F.col("t100"))
        .select(
            "suppkey",
            "rev100",
            F.floor(F.col("rev100") * 1000000.0 / F.col("t100"))
            .cast("bigint")
            .alias("share_s6"),
        )
    )


# --------------------------------------------------------------------------
# Weekly cohort retention triangle ([EXT]: the product-analytics staple):
# users bucketed by first-activity week; for each (cohort week, week age)
# the count of cohort members active that week. Weeks via ms-epoch
# integer division (ms // week_ms — no date_trunc locale/week-start
# ambiguity between engines); the triangle is one distinct + two narrow
# aggregates + a broadcast join back to cohort sizes.
# --------------------------------------------------------------------------
@register(
    "weekly_cohort_retention",
    oracle="""
WITH act AS (
  SELECT DISTINCT user_id,
         epoch_ms(ts) // 604800000 AS wk
  FROM events
),
first_wk AS (
  SELECT user_id, min(wk) AS wk0 FROM act GROUP BY user_id
),
sizes AS (
  SELECT wk0, count(*) AS cohort_n FROM first_wk GROUP BY wk0
),
tri AS (
  SELECT f.wk0, a.wk - f.wk0 AS age, count(*) AS n_active
  FROM act a JOIN first_wk f USING (user_id)
  GROUP BY f.wk0, a.wk - f.wk0
)
SELECT t.wk0 AS cohort_week, CAST(t.age AS BIGINT) AS week_age,
       CAST(t.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_n AS BIGINT) AS cohort_n,
       CAST(floor(t.n_active * 1000000.0 / s.cohort_n) AS BIGINT)
         AS retention_s6
FROM tri t JOIN sizes s USING (wk0)
""",
    doc="weekly cohort retention triangle: cohort = first-activity week "
    "(ms-epoch // week_ms, no week-start ambiguity), cells = distinct "
    "active users per (cohort, age) with the retention fraction on the "
    "1e6 floor grid",
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    act = (
        ev.select(
            "user_id",
            # exact-integer FLOOR division, matching DuckDB's `//`: plain
            # `div` truncates toward zero so pre-1970 timestamps would land
            # one week high; float `/` + floor risks x.9999... boundary
            # rounding in double.  (x - pmod(x, d)) is an exact multiple of
            # d for either sign, so the final div is exact floor division.
            F.expr(
                "(unix_millis(ts) - pmod(unix_millis(ts), 604800000)) "
                "div 604800000"
            ).alias("wk"),
        )
        .distinct()
    )
    first_wk = act.groupBy("user_id").agg(F.min("wk").alias("wk0"))
    sizes = first_wk.groupBy("wk0").agg(F.count(F.lit(1)).alias("cohort_n"))
    tri = (
        act.join(first_wk, "user_id")
        .groupBy("wk0", (F.col("wk") - F.col("wk0")).alias("age"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        tri.join(F.broadcast(sizes), "wk0")
        .select(
            F.col("wk0").alias("cohort_week"),
            F.col("age").cast("bigint").alias("week_age"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("cohort_n").cast("bigint").alias("cohort_n"),
            F.floor(F.col("n_active") * 1000000.0 / F.col("cohort_n"))
            .cast("bigint")
            .alias("retention_s6"),
        )
    )


# --------------------------------------------------------------------------
# Sliding-window event rate ([EXT]: completes the window trio — tumbling
# (events_hourly), session (events_session_window), and now SLIDING:
# 1-hour windows every 15 minutes). Spark emits one row per overlapping
# window via F.window(slide=); the oracle replays the same assignment by
# integer epoch math (each event belongs to the 4 windows whose start lies
# in (ts - 1h, ts], starts on the 15-min grid).
# --------------------------------------------------------------------------
@register(
    "events_sliding_rate",
    oracle="""
WITH e AS (
  SELECT event_type, epoch_ms(ts) AS ms,
         CAST(round(value * 100) AS BIGINT) AS v100
  FROM events
),
assigned AS (
  SELECT event_type, v100,
         (ms // 900000 - off.range) * 900000 AS win_start_ms
  FROM e, range(0, 4) off
  WHERE (ms // 900000 - off.range) * 900000 > ms - 3600000
),
agg AS (
  SELECT win_start_ms, event_type,
         count(*) AS n_events,
         CAST(sum(v100) AS BIGINT) AS sum_v100
  FROM assigned GROUP BY win_start_ms, event_type
)
SELECT CAST(win_start_ms AS BIGINT) AS win_start_ms, event_type,
       n_events, sum_v100
FROM agg
""",
    doc="sliding-window rate (1-hour windows every 15 min): the third "
    "window kind after tumbling and session; Spark F.window(slide=) vs an "
    "integer-epoch window-assignment replay, exact-cents sums",
)
def events_sliding_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents("value")).cast("bigint").alias("sum_v100"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("win_start_ms"),
            "event_type",
            "n_events",
            "sum_v100",
        )
    )


# --------------------------------------------------------------------------
# Six-table chain (join-reordering stress): region -> nation -> customer ->
# orders -> lineitem -> part with selective predicates at both ends — the
# shape where Catalyst's join reordering + broadcast decisions matter
# most. Dims broadcast explicitly; the two fact joins shuffle on their
# keys. Exact-cents revenue per (region, brand).
# --------------------------------------------------------------------------
@register(
    "six_table_chain",
    oracle="""
SELECT r_name, p_brand,
       count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_e4
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN part     ON p_partkey = l_partkey
WHERE r_name = 'ASIA'
  AND p_brand IN ('Brand#12', 'Brand#23')
  AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY r_name, p_brand
""",
    doc="six-table chain with selective predicates at both ends — the "
    "join-reordering / broadcast-decision stress shape; dims broadcast, "
    "facts shuffle on their keys, exact-cents revenue",
)
def six_table_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return joined.groupBy("r_name", "p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(rev).cast("bigint").alias("revenue_e4"),
    )


# --------------------------------------------------------------------------
# Large-volume orders (TPC-H Q18 shape): aggregate-then-filter on a fact
# key (HAVING over sum), joined back to the order/customer detail — the
# "which orders are whales" shape. The having-aggregate shuffles once on
# l_orderkey; orders arrives pre-shuffled on the same key, customer
# broadcasts.
# --------------------------------------------------------------------------
@register(
    "large_volume_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS qty100
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000
)
SELECT c.c_name, o.o_orderkey AS orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       b.qty100
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",
    doc="TPC-H Q18 shape: HAVING sum(quantity) > 300 over lineitem, joined "
    "back to order + customer detail; exact-cents quantities",
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).cast("bigint").alias("qty100"))
        .filter(F.col("qty100") > 30000)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _cents("o_totalprice").alias("totalprice_cents"),
            "qty100",
        )
    )


# --------------------------------------------------------------------------
# Top revenue supplier(s) (TPC-H Q15 shape): aggregate per supplier over a
# quarter, then keep the max-revenue row(s) — the max-over-aggregate
# pattern (scalar subquery vs broadcast-join of a 1-row frame). Exact-cents
# revenue makes the max comparison deterministic; ties are KEPT (Q15
# semantics).
# --------------------------------------------------------------------------
@register(
    "top_revenue_suppliers",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey AS suppkey, s.s_name, r.rev_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev_cents = (SELECT max(rev_cents) FROM rev)
""",
    doc="TPC-H Q15 shape: per-supplier quarterly revenue, keep max-revenue "
    "supplier(s) with ties — scalar max broadcast into the filter",
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
        ).cast("bigint").alias("rev_cents")
    )
    mx = rev.agg(F.max("rev_cents").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev.rev_cents == mx._mx)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(F.col("s_suppkey").alias("suppkey"), "s_name", "rev_cents")
    )


# --------------------------------------------------------------------------
# Supplier variety per part class (TPC-H Q16 shape, partsupp approximated
# by the lineitem part-supplier relation): COUNT(DISTINCT supplier) per
# (brand, type) with exclusion predicates — the distinct-aggregate-after-
# join shape (two-phase: dedup shuffle then count).
# --------------------------------------------------------------------------
@register(
    "supplier_part_variety",
    oracle="""
SELECT p.p_brand, p.p_type,
       count(DISTINCT l.l_suppkey) AS supplier_cnt,
       count(DISTINCT l.l_partkey) AS part_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand != 'Brand#9'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
GROUP BY p.p_brand, p.p_type
""",
    doc="TPC-H Q16 shape over the lineitem part-supplier relation: distinct "
    "supplier/part counts per (brand, type) with exclusion predicates",
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.countDistinct("l_partkey").alias("part_cnt"),
        )
    )


# --------------------------------------------------------------------------
# Min-cost part per type (TPC-H Q2 shape, correlated-min flattened):
# the "cheapest qualifying row per group, ties kept" pattern — Spark
# expresses the correlated subquery as a window min + equality filter
# (no join, one shuffle on the group key).
# --------------------------------------------------------------------------
@register(
    "min_cost_parts",
    oracle="""
WITH m AS (
  SELECT p_type,
         min(CAST(round(p_retailprice * 100) AS BIGINT)) AS min_price100
  FROM part GROUP BY p_type
)
SELECT p.p_partkey AS partkey, p.p_type, m.min_price100
FROM part p
JOIN m ON p.p_type = m.p_type
      AND CAST(round(p.p_retailprice * 100) AS BIGINT) = m.min_price100
""",
    doc="TPC-H Q2 shape (correlated min flattened): cheapest part(s) per "
    "type via window min + exact-cents equality, ties kept",
)
def min_cost_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").withColumn(
        "price100", _cents("p_retailprice")
    )
    w = Window.partitionBy("p_type")
    return (
        p.withColumn("min_price100", F.min("price100").over(w))
        .filter(F.col("price100") == F.col("min_price100"))
        .select(F.col("p_partkey").alias("partkey"), "p_type", "min_price100")
    )


# --------------------------------------------------------------------------
# Promo revenue share (TPC-H Q14 shape): conditional-aggregate ratio over
# one month — the CASE-WHEN-inside-sum pattern; share emitted on the 1e6
# floor grid so the division is bit-identical cross-engine.
# --------------------------------------------------------------------------
@register(
    "promo_revenue_ratio",
    oracle="""
WITH l AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4,
         CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS promo
  FROM lineitem JOIN part p ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
    AND l_shipdate < TIMESTAMP '1996-10-01'
)
SELECT CAST(sum(CASE WHEN promo = 1 THEN rev_e4 ELSE 0 END) AS BIGINT)
         AS promo_rev_e4,
       CAST(sum(rev_e4) AS BIGINT) AS total_rev_e4,
       CAST(floor(sum(CASE WHEN promo = 1 THEN rev_e4 ELSE 0 END)
                  * 1000000.0 / sum(rev_e4)) AS BIGINT) AS promo_share_s6
FROM l
""",
    doc="TPC-H Q14 shape: promo-type revenue share over one month, "
    "conditional aggregates on exact cents, share on the 1e6 floor grid",
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    promo_rev = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    )
    total_rev = F.sum(rev)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            promo_rev.cast("bigint").alias("promo_rev_e4"),
            total_rev.cast("bigint").alias("total_rev_e4"),
            F.floor(promo_rev * 1000000.0 / total_rev)
            .cast("bigint")
            .alias("promo_share_s6"),
        )
    )


# --------------------------------------------------------------------------
# Nation-pair trade volume (TPC-H Q7 shape): revenue flowing from supplier
# nations (region ASIA) to customer nations (region EUROPE) per year —
# the double-dimension-join fact rollup. Supplier and customer nations
# resolve through separate broadcast copies of nation; the two fact joins
# shuffle on their own keys.
# --------------------------------------------------------------------------
@register(
    "nation_pair_trade",
    oracle="""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_e4
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN region rs ON ns.n_regionkey = rs.r_regionkey
JOIN region rc ON nc.n_regionkey = rc.r_regionkey
WHERE rs.r_name = 'ASIA' AND rc.r_name = 'EUROPE'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY ns.n_name, nc.n_name, year(o.o_orderdate)
""",
    doc="TPC-H Q7 shape: supplier-nation x customer-nation x year revenue "
    "matrix between two regions; two broadcast copies of nation, "
    "exact-cents revenue",
)
def nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    ns = (
        nat.join(
            reg.filter(F.col("r_name") == "ASIA"),
            nat.n_regionkey == reg.r_regionkey,
        )
        .select(
            F.col("n_nationkey").alias("s_nkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    nc = (
        nat.join(
            reg.filter(F.col("r_name") == "EUROPE"),
            nat.n_regionkey == reg.r_regionkey,
        )
        .select(
            F.col("n_nationkey").alias("c_nkey"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(rev).cast("bigint").alias("revenue_e4"))
    )


# --------------------------------------------------------------------------
# Nation market share (TPC-H Q8 shape): one nation's share of a region's
# yearly revenue — ratio of a conditional aggregate to the total, per
# group. Shares on the 1e6 floor grid keep the division bit-identical.
# --------------------------------------------------------------------------
@register(
    "nation_market_share",
    oracle="""
WITH base AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_e4,
         CASE WHEN ns.n_name = 'NATION_2' THEN 1 ELSE 0 END AS is_target
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region rc ON nc.n_regionkey = rc.r_regionkey
  WHERE rc.r_name = 'ASIA'
)
SELECT o_year,
       CAST(sum(CASE WHEN is_target = 1 THEN rev_e4 ELSE 0 END) AS BIGINT)
         AS target_rev_e4,
       CAST(sum(rev_e4) AS BIGINT) AS total_rev_e4,
       CAST(floor(sum(CASE WHEN is_target = 1 THEN rev_e4 ELSE 0 END)
                  * 1000000.0 / sum(rev_e4)) AS BIGINT) AS share_s6
FROM base GROUP BY o_year
""",
    doc="TPC-H Q8 shape: NATION_2's share of ASIA-customer revenue per "
    "year; conditional aggregate over exact cents, share on the 1e6 grid",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    ns = nat.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nc = nat.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(reg), F.col("c_rkey") == reg.r_regionkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            rev.alias("rev_e4"),
            F.when(F.col("supp_nation") == "NATION_2", 1)
            .otherwise(0)
            .alias("is_target"),
        )
    )
    target = F.sum(F.when(F.col("is_target") == 1, F.col("rev_e4")).otherwise(0))
    total = F.sum("rev_e4")
    return base.groupBy("o_year").agg(
        target.cast("bigint").alias("target_rev_e4"),
        total.cast("bigint").alias("total_rev_e4"),
        F.floor(target * 1000000.0 / total).cast("bigint").alias("share_s6"),
    )


# --------------------------------------------------------------------------
# Idle rich customers (TPC-H Q22 shape): customers with above-average
# positive balance and no RECENT orders (none since 2000-01-01; the
# synthetic data gives every customer at least one lifetime order, so the
# classic no-orders-ever predicate is empty) — scalar-aggregate comparison
# kept as an exact integer cross-multiply (acctbal_cents * n > sum_cents,
# no engine ever divides) + date-scoped anti join.
# --------------------------------------------------------------------------
@register(
    "idle_rich_customers",
    oracle="""
WITH pos AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s100,
         count(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_custkey AS custkey,
       CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM customer c, pos
WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.s100
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
""",
    doc="TPC-H Q22 shape: above-average balance (exact integer "
    "cross-multiply, no division) + idle-since-2000 anti join",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").withColumn(
        "acctbal_cents", _cents("c_acctbal")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum("acctbal_cents").cast("bigint").alias("s100"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        c.join(F.broadcast(pos), F.col("acctbal_cents") * F.col("n") > F.col("s100"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("custkey"), "acctbal_cents")
    )


# --------------------------------------------------------------------------
# Local supplier volume (TPC-H Q5 shape): revenue where the customer and
# the supplier share a nation — the equal-attribute join condition that
# cannot be expressed as a chain (c_nationkey = s_nationkey closes the
# cycle). Exact-cents revenue per nation for one order-year.
# --------------------------------------------------------------------------
@register(
    "local_supplier_volume",
    oracle="""
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_e4
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
    doc="TPC-H Q5 shape: same-nation customer+supplier revenue per nation "
    "for 1996 — the cycle-closing join condition; exact-cents revenue",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("bigint").alias("revenue_e4"))
    )
