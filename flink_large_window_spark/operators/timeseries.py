"""Time-series operators over the events stream table: gap-filled
resampling (hypertable-rollup shape), funnel conversion, EWMA smoothing.

These are the batch/time-series counterparts of the §2.9 window suite:
a windowed aggregate answers "what happened in each bucket that has
data"; a pipeline also needs "every bucket, zero-filled" (dashboards,
feature grids), ordered funnels, and smoothed trends. All three are
pure DataFrame compositions with exact SQL oracles. No reference-repo
counterpart (snapshot empty per SURVEY §0); [FLINK-API] nearest
analogues are windowed aggregation + CEP patterns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window
from pyspark.sql.dataframe import DataFrame

from ..registry import query
from ..tables import prep, table


@query(
    "ts_resample_gapfill",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ), spans AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ), grid AS (
      SELECT user_id, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM spans
    )
    SELECT g.user_id,
           CAST(g.day AS STRING)    AS day,
           COALESCE(d.n, 0)         AS n_events
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily event counts on a dense calendar grid (each
    user's min..max day), zero-filling days with no events.

    The grid comes from `sequence(min_day, max_day, interval 1 day)`
    exploded per user — rows generated ∝ user-span days, not data rows.
    At 100 TB the left join is the only shuffle and both sides are
    already keyed by (user_id, day); the daily pre-aggregate collapses
    the raw events before anything fans out.
    """
    prep(spark)
    events = table(spark, sf_dir, "events")
    daily = (
        events.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
    )


@query(
    "ts_funnel_conversion",
    oracle="""
    WITH signup AS (
      SELECT user_id, MIN(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), first_purchase AS (
      SELECT s.user_id, MIN(e.ts) AS purchase_ts
      FROM signup s JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'purchase'
       AND e.ts >= s.signup_ts
      GROUP BY s.user_id
    )
    SELECT s.user_id,
           CAST(s.signup_ts AS STRING) AS signup_ts,
           CAST(p.purchase_ts AS STRING) AS first_purchase_ts,
           COALESCE(p.purchase_ts <= s.signup_ts + INTERVAL 7 DAY, FALSE)
             AS converted_7d
    FROM signup s LEFT JOIN first_purchase p ON s.user_id = p.user_id
    """,
)
def ts_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel: per signed-up user, the first purchase
    at/after their first signup and whether it lands within 7 days.

    Ordered-sequence analytics Flink would express as CEP; here both
    stages are min-aggregates so the whole funnel is two shuffles on
    user_id (which AQE plans as broadcast at fixture scale — the signup
    side is users, not events).
    """
    prep(spark)
    events = table(spark, sf_dir, "events")
    signup = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    first_purchase = (
        signup.join(purchases, "user_id")
        .filter(F.col("p_ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("purchase_ts"))
    )
    return signup.join(first_purchase, "user_id", "left").select(
        "user_id",
        F.col("signup_ts").cast("string").alias("signup_ts"),
        F.col("purchase_ts").cast("string").alias("first_purchase_ts"),
        F.coalesce(
            F.col("purchase_ts") <= F.col("signup_ts") + F.expr("interval 7 day"),
            F.lit(False),
        ).alias("converted_7d"),
    )


@query(
    "ts_ewma_daily",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS x
      FROM events GROUP BY date_trunc('day', ts)
    ), idx AS (
      SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) - 1 AS t FROM daily
    )
    SELECT CAST(CAST(a.day AS TIMESTAMP) AS STRING) AS day,
           a.x                   AS n_events,
           ROUND(SUM(
             CASE WHEN b.t = 0 THEN POW(0.5, a.t) * b.x
                  ELSE 0.5 * POW(0.5, a.t - b.t) * b.x END), 4) AS ewma
    FROM idx a JOIN idx b ON b.t <= a.t
    GROUP BY a.day, a.x, a.t
    """,
)
def ts_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.5) of the global
    daily event count.

    The recursion s_t = α·x_t + (1−α)·s_{t−1}, s_0 = x_0 is unrolled
    to its closed form s_t = (1−α)^t·x_0 + Σ_{i≥1} α(1−α)^{t−i}·x_i so
    both engines compute the identical weighted sum (rounded to absorb
    float summation order). The self-join runs on the ~30-row daily
    rollup, never the raw events — at 100 TB the cost is the daily
    pre-aggregate, and the smoothing stays O(days²) tiny.
    """
    prep(spark)
    daily = (
        table(spark, sf_dir, "events")
        .select(F.date_trunc("day", "ts").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    idx = daily.select(
        "day", "x", (F.row_number().over(Window.orderBy("day")) - 1).alias("t")
    )
    a = idx.alias("a")
    b = idx.alias("b")
    weight = (
        F.when(F.col("b.t") == 0, F.pow(F.lit(0.5), F.col("a.t")))
        .otherwise(F.lit(0.5) * F.pow(F.lit(0.5), F.col("a.t") - F.col("b.t")))
    )
    return (
        a.join(b, F.col("b.t") <= F.col("a.t"))
        .groupBy("a.day", "a.x", "a.t")
        .agg(F.round(F.sum(weight * F.col("b.x")), 4).alias("ewma"))
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("x").alias("n_events"),
            "ewma",
        )
    )


@query(
    "ts_retention_cohort",
    oracle="""
    WITH cohort AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
      FROM events
    )
    SELECT CAST(c.cohort_week AS STRING) AS cohort_week,
           CAST(date_diff('day', c.cohort_week, a.active_week) // 7 AS BIGINT)
             AS weeks_since,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM cohort c JOIN activity a ON c.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def ts_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, and
    for each (cohort, weeks-since-cohort) cell the count of users
    still active — the canonical product-analytics rollup.

    Two aggregates and one join, all keyed on user_id (one shuffle key
    end to end until the final small matrix aggregate). DISTINCT
    per (user, week) collapses raw events before the join, so the join
    input is users×weeks, not events.
    """
    prep(spark)
    ev = table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        cohort.join(activity, "user_id")
        .groupBy(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "ts_ohlc_bars",
    oracle="""
    SELECT DISTINCT
           CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS bar_day,
           event_type,
           ROUND(FIRST_VALUE(value) OVER w, 4) AS open,
           ROUND(MAX(value) OVER w, 4)         AS high,
           ROUND(MIN(value) OVER w, 4)         AS low,
           ROUND(LAST_VALUE(value) OVER w, 4)  AS close
    FROM events
    WINDOW w AS (
      PARTITION BY date_trunc('day', ts), event_type
      ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars of `value` per event_type — the market-data /
    metrics downsampling primitive (open = first by event time, close =
    last, high/low = extrema). Open/close need an ORDER within the bar,
    which plain groupBy aggregates cannot express deterministically
    (min_by ties are unspecified), so both engines use the same
    full-frame window formulation with the (ts, event_id) total order.
    One shuffle on the bar key; the DISTINCT collapses the per-row
    window output to one row per bar — at scale this compiles to a
    window + hash-agg over already-partitioned data.
    """
    prep(spark)
    bar = F.date_trunc("day", "ts")
    w = (
        Window.partitionBy(bar, "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        table(spark, sf_dir, "events")
        .select(
            bar.cast("string").alias("bar_day"),
            "event_type",
            F.round(F.first("value").over(w), 4).alias("open"),
            F.round(F.max("value").over(w), 4).alias("high"),
            F.round(F.min("value").over(w), 4).alias("low"),
            F.round(F.last("value").over(w), 4).alias("close"),
        )
        .distinct()
    )


@query(
    "ts_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS day,
             ROUND(SUM(value), 4) AS total
      FROM events GROUP BY 1, 2
    ), scored AS (
      SELECT event_type, day, total,
             ROW_NUMBER() OVER w AS rn,
             AVG(total)    OVER (w ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS mu,
             STDDEV_SAMP(total) OVER (w ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS sd
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, total,
           ROUND((total - mu) / sd, 4) AS z,
           CAST(ABS((total - mu) / sd) > 2.0 AS INTEGER) AS is_anomaly
    FROM scored
    WHERE rn > 7 AND sd > 0
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags: each (event_type, day) total is
    scored against the trailing 7-day mean/stddev EXCLUDING the current
    day (ROWS 7 PRECEDING .. 1 PRECEDING), |z| > 2 flags an anomaly —
    the standard ops-dashboard outlier detector.

    Two-level dataflow: the raw scan aggregates to one row per
    (type, day) — after which the window runs over the TINY daily
    table, partitioned by type. At 100 TB the expensive part is the
    first aggregation (partial-combined, one shuffle); the window
    never sees raw events. The daily total is rounded BEFORE scoring
    so both engines window over identical inputs (float summation
    order differs; z on raw doubles could diverge).
    """
    prep(spark)
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("string").alias("day"),
        )
        .agg(F.round(F.sum("value"), 4).alias("total"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    trail = w.rowsBetween(-7, -1)
    scored = daily.select(
        "event_type",
        "day",
        "total",
        F.row_number().over(w).alias("rn"),
        F.avg("total").over(trail).alias("mu"),
        F.stddev_samp("total").over(trail).alias("sd"),
    )
    z = (F.col("total") - F.col("mu")) / F.col("sd")
    return scored.filter((F.col("rn") > 7) & (F.col("sd") > 0)).select(
        "event_type",
        "day",
        "total",
        F.round(z, 4).alias("z"),
        (F.abs(z) > 2.0).cast("int").alias("is_anomaly"),
    )
