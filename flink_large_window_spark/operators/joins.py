"""Join operators (SURVEY.md §2.3).

Flink analogue: DataStream ``join()`` / Table API joins,
``KeyedStream.intervalJoin`` and window joins (reference snapshot empty
— SURVEY.md §0; anchors are the public Flink API classes per SURVEY
§2.3).

Scale notes (100 TB):
- dimension joins (customer, nation, region) are explicitly
  ``broadcast()`` — no shuffle of the fact side;
- fact-fact joins (lineitem ⋈ orders) shuffle on the join key and AQE
  picks sort-merge + handles skew splitting;
- the interval/as-of joins avoid quadratic fan-out: as-of is a linear
  union + running ``last()`` per key (shuffle once by user_id), not a
  pairwise theta join — the theta form appears only in the DuckDB
  oracle where it is cheap at fixture scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..registry import query
from ..tables import prep, table, table_sql_ref


@query(
    "join_inner_equi",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dimension — no shuffle of orders."""
    prep(spark)
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")


@query(
    "join_sortmerge_large",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice,
           CAST(o_orderdate AS VARCHAR) AS o_orderdate_s
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def join_sortmerge_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi join: both sides shuffle on orderkey → SMJ/AQE."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    return li.join(orders, li.l_orderkey == orders.o_orderkey, "inner").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "o_totalprice",
        F.col("o_orderdate").cast("string").alias("o_orderdate_s"),
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every customer with order count including 0 (COUNT skips nulls)."""
    prep(spark)
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror of join_left_outer via right outer join."""
    prep(spark)
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "right")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT s.s_nationkey, c.c_nationkey,
           COALESCE(s.n_supp, 0) AS n_supp,
           COALESCE(c.n_cust, 0) AS n_cust
    FROM (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
    FULL JOIN (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
      ON s.s_nationkey = c.c_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier/customer rollups, full-outer joined."""
    prep(spark)
    supp = (
        table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    return supp.join(cust, supp.s_nationkey == cust.c_nationkey, "full").select(
        "s_nationkey",
        "c_nationkey",
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cartesian (5×25) — only legal because both sides tiny."""
    prep(spark)
    return (
        table(spark, sf_dir, "region")
        .crossJoin(table(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT o_orderkey, l_linenumber, CAST(l_shipdate AS VARCHAR) AS l_shipdate_s,
           CAST(o_orderdate AS VARCHAR) AS o_orderdate_s
    FROM orders JOIN lineitem
      ON o_orderkey = l_orderkey AND l_shipdate > o_orderdate
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + non-equi range residual (ships after order date)."""
    prep(spark)
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "inner",
    ).select(
        "o_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("string").alias("l_shipdate_s"),
        F.col("o_orderdate").cast("string").alias("o_orderdate_s"),
    )


@query(
    "join_interval",
    oracle="""
    SELECT e1.event_id AS signup_id, e2.event_id AS purchase_id, e1.user_id
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e1.event_type = 'signup' AND e2.event_type = 'purchase'
     AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink ``intervalJoin(...).between(0, 1h)`` semantics, batch form.

    Each signup pairs with purchases of the same user within the
    following hour. Streaming twin: two watermarked streams + the same
    range condition (Spark stream-stream interval join).
    """
    prep(spark)
    ev = table(spark, sf_dir, "events")
    e1 = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id"),
        F.col("ts").alias("ts1"),
    )
    e2 = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id2"),
        F.col("ts").alias("ts2"),
    )
    return e1.join(
        e2,
        (e1.user_id == e2.user_id2)
        & (e2.ts2 >= e1.ts1)
        & (e2.ts2 <= e1.ts1 + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("signup_id", "purchase_id", "user_id")


@query(
    "join_asof",
    oracle="""
    SELECT error_id, click_id FROM (
      SELECT e.event_id AS error_id, c.event_id AS click_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST
             ) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = e.user_id AND c.ts <= e.ts
    ) WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error paired with the nearest prior click.

    Spark form is linear, not pairwise: union clicks+errors, one
    shuffle by user_id, running ``last(click_id, ignorenulls)`` over
    event order. Ties (same ts): click sorts before error (<=
    semantics) and higher event_id wins among clicks. Scales as
    O(n log n) per key vs the oracle's O(clicks × errors) theta join,
    which is only viable at fixture scale.

    Flink analogue: temporal/as-of join via KeyedCoProcessFunction state.

    Single ``spark.sql`` statement since optimization r16 (the
    SCALING.md §12 build-cost remedy, VERDICT r15 item 6): the chained
    build cost 65–69 ms of driver time per call — 27% of the key's
    fixture-scale wall — for the identical plan (all-integer columns,
    zero float-ordering surface). Interleaved A/B: 0.295/0.238 →
    0.219/0.166 s medians, build 69 → 20 ms. Rows identical.
    """
    prep(spark)
    ev = table_sql_ref(spark, sf_dir, "events")
    return spark.sql(
        f"""
        WITH tagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN event_type = 'click' THEN event_id END AS click_id,
                 -- clicks (0) sort before errors (1) at equal ts → inclusive <=
                 CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tie
          FROM {ev} WHERE event_type IN ('click', 'error')
        )
        SELECT event_id AS error_id, last_click AS click_id FROM (
          SELECT event_id, tie,
                 LAST(click_id) IGNORE NULLS OVER (
                   PARTITION BY user_id ORDER BY ts, tie, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS last_click
          FROM tagged
        ) WHERE tie = 1
        """
    )


@query(
    "join_window_tumbling",
    oracle="""
    SELECT e1.event_id AS click_id, e2.event_id AS purchase_id, e1.user_id
    FROM (SELECT * FROM events WHERE event_type = 'click') e1
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') e2
      ON e1.user_id = e2.user_id
     AND date_trunc('hour', e1.ts) = date_trunc('hour', e2.ts)
    """,
)
def join_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink window join, batch form: same user, same 1h tumbling pane.

    Implemented as an equi join on (user_id, hour bucket) — exactly how
    a window join shuffles in Flink (key = join key × window), so both
    engines co-partition instead of fanning out.
    """
    prep(spark)
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.date_trunc("hour", "ts").alias("bucket"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id2"),
        F.date_trunc("hour", "ts").alias("bucket2"),
    )
    return clicks.join(
        purchases,
        (clicks.user_id == purchases.user_id2) & (clicks.bucket == purchases.bucket2),
        "inner",
    ).select("click_id", "purchase_id", "user_id")


@query(
    "join_strategy_hints",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*)                      AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same orders⋈customer under an explicit SHUFFLE_HASH hint,
    with the plan asserted to contain ShuffledHashJoin.

    Strategy hints are the manual override lane when AQE's choice is
    wrong at scale (e.g. a build side that fits memory but exceeds the
    broadcast threshold: shuffle-hash avoids both the broadcast OOM
    and the sort-merge sort). The result is strategy-invariant — the
    oracle proves the hint changed only the plan, not the answer.
    """
    prep(spark)
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer").hint("shuffle_hash")
    joined = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "ShuffledHashJoin" not in plan:
        raise AssertionError("SHUFFLE_HASH hint not honored; plan:\n" + plan)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "join_interval_banded",
    oracle="""
    SELECT e1.event_id AS signup_id, e2.event_id AS purchase_id, e1.user_id
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e1.event_type = 'signup' AND e2.event_type = 'purchase'
     AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    """,
)
def join_interval_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join_interval re-planned as a BANDED equi join — the range-join
    optimization for scale, proven result-identical by sharing
    join_interval's oracle.

    A plain range predicate forces per-key nested-loop comparison; at
    100 TB with hot users that is quadratic. Banding: a 1-hour range
    can only match within the signup's hour bucket or the next one, so
    the left side fans out to exactly 2 (user, bucket) keys, the join
    becomes an EQUI join on (user, bucket) — hash-shuffled, AQE-
    split-table, skew-safe — and the exact range filter runs on the
    (tiny) per-bucket candidates. Cost: 2× left fan-out; win: no
    nested loop. (This is also how Spark's own storage-partitioned
    range joins and Flink's interval join state cleanup bucket time.)
    """
    prep(spark)
    ev = table(spark, sf_dir, "events")
    e1 = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            "user_id",
            F.col("ts").alias("ts1"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.date_trunc("hour", "ts1"),
                    F.date_trunc("hour", "ts1") + F.expr("interval 1 hour"),
                )
            ),
        )
    )
    e2 = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id2"),
        F.col("ts").alias("ts2"),
        F.date_trunc("hour", "ts2").alias("bucket2"),
    )
    return (
        e1.join(
            e2,
            (e1.user_id == e2.user_id2) & (e1.bucket == e2.bucket2),
            "inner",
        )
        .filter(
            (F.col("ts2") >= F.col("ts1"))
            & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 1 HOUR"))
        )
        .select("signup_id", "purchase_id", "user_id")
    )


@query(
    "join_null_safe",
    oracle="""
    WITH c AS (SELECT nullif(c_nationkey, 3) AS k, c_custkey FROM customer),
         s AS (SELECT nullif(s_nationkey, 3) AS k, s_suppkey FROM supplier)
    SELECT c.k, COUNT(*) AS n_pairs
    FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
    GROUP BY c.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — required when a join key
    legitimately encodes "unknown" (here nationkey 3 is nulled to
    simulate it). Still hash-partitionable (NULL hashes to one
    bucket), unlike a general non-equi condition; beware that bucket
    becoming a hot key when NULLs dominate — salt it like any other
    skewed key.
    """
    prep(spark)
    c = table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey"), F.lit(3)).alias("k"), "c_custkey"
    )
    s = table(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey"), F.lit(3)).alias("k2"), "s_suppkey"
    )
    return (
        c.join(s, c["k"].eqNullSafe(s["k2"]))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(o.o_orderdate AS STRING) AS o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-table join, selective filters on every table,
    grouped revenue, global top-10 — the composite query that
    exercises the whole optimizer stack at once: both dim filters push
    into their scans, customer broadcasts, orders⋈lineitem shuffles
    once on orderkey, and the top-10 is TakeOrdered (no global sort).
    Tie-break on orderkey pins the LIMIT under equal revenues.
    """
    prep(spark)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        F.broadcast(c)
        .join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_local_supplier",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join with a cross-table condition
    (customer and supplier in the SAME nation), region filter, per-
    nation revenue. The big fact chain (orders⋈lineitem) shuffles on
    orderkey; every dimension broadcasts; the c↔s nation equality
    rides the supplier join as a second key rather than a post-filter,
    so no oversized intermediate is materialized.
    """
    prep(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "join_asof_forward",
    oracle="""
    SELECT error_id, next_view_id FROM (
      SELECT e.event_id AS error_id, v.event_id AS next_view_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY v.ts ASC NULLS LAST, v.event_id ASC NULLS LAST
             ) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON v.user_id = e.user_id AND v.ts >= e.ts
    ) WHERE rn = 1
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each error paired with the nearest
    FOLLOWING view (did the user recover?) — the mirror of join_asof's
    backward direction, same linear formulation: one user_id shuffle,
    event-time order DESCENDING, running `first`-style pick via
    last(view_id) over the reversed frame. Ties (same ts): view sorts
    before error under >= semantics and the LOWEST view_id wins.
    """
    prep(spark)
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.lit(0).alias("kind"),  # view sorts before error at equal ts (>=)
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.col("event_id").alias("error_id"),
        F.lit(1).alias("kind"),
    )
    unioned = views.select(
        "user_id", "ts", "kind", "view_id", F.lit(None).cast("long").alias("error_id")
    ).unionByName(
        errors.select(
            "user_id", "ts", "kind", F.lit(None).cast("long").alias("view_id"), "error_id"
        )
    )
    # Reverse event-time order: "next view at/after me" = last view seen
    # so far when scanning from the future backwards. At EQUAL ts the
    # views must precede the error in this reversed scan so the error's
    # frame includes them (>= semantics) → kind ASC (view=0 < error=1).
    # Among same-ts views the LOWEST id must win → id DESC so last()
    # lands on it.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("kind").asc(), F.col("view_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(
            "next_view_id", F.last("view_id", ignorenulls=True).over(w)
        )
        .filter(F.col("error_id").isNotNull())
        .select("error_id", "next_view_id")
    )


@query(
    "join_asof_nearest",
    oracle="""
    SELECT error_id, nearest_view_id FROM (
      SELECT e.event_id AS error_id, v.event_id AS nearest_view_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY abs(epoch_us(v.ts) - epoch_us(e.ts)) ASC NULLS LAST,
                        v.ts ASC NULLS LAST, v.event_id ASC NULLS LAST
             ) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON v.user_id = e.user_id
    ) WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional as-of: each error paired with the temporally
    NEAREST view of the same user, either direction — the timeseries
    alignment primitive (sensor fusion, quote-trade matching) that
    completes the backward (join_asof) / forward (join_asof_forward)
    pair. Ties: equal distance prefers the PRIOR view (smaller ts),
    then the lowest view_id — pinned identically in the oracle's
    (abs-diff, ts, event_id) ordering.

    Linear formulation, no range join: two window passes over the
    union of views and errors per user (one ascending scan carrying
    the latest prior view, one descending scan carrying the earliest
    following view — same kind/id tie handling as the two one-sided
    operators), then a row-local CASE picks the closer side. Cost is
    two sorts of the same user_id partition — at 100 TB both passes
    shuffle once on user_id and AQE reuses the exchange.
    """
    prep(spark)
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),  # views sort before errors at equal ts
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        F.lit(None).cast("long").alias("error_id"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("view_id"),
        F.lit(None).cast("timestamp").alias("view_ts"),
        F.col("event_id").alias("error_id"),
    )
    unioned = views.unionByName(errors)

    # Ascending scan: latest prior-or-equal view. Equal ts: views first
    # (kind asc); among them id DESC so last() = lowest id.
    w_prior = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc(), F.col("view_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Descending scan: earliest following-or-equal view (mirror).
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("kind").asc(), F.col("view_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = (
        unioned.withColumn("prior_id", F.last("view_id", ignorenulls=True).over(w_prior))
        .withColumn("prior_ts", F.last("view_ts", ignorenulls=True).over(w_prior))
        .withColumn("next_id", F.last("view_id", ignorenulls=True).over(w_next))
        .withColumn("next_ts", F.last("view_ts", ignorenulls=True).over(w_next))
        .filter(F.col("error_id").isNotNull())
    )
    # cast: events.ts arrives as TIMESTAMP from the ns-long fixture
    # conversion but TIMESTAMP_NTZ from plain timestamp[us] parquet
    # (e.g. the tie-pinning test fixture); unix_micros only accepts the
    # former. Differences cancel any session-tz shift, so the cast is
    # semantics-neutral either way.
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    dp = us("ts") - us("prior_ts")
    dn = us("next_ts") - us("ts")
    nearest = (
        F.when(F.col("prior_id").isNull(), F.col("next_id"))
        .when(F.col("next_id").isNull(), F.col("prior_id"))
        .when(dp <= dn, F.col("prior_id"))  # tie → prior (smaller ts)
        .otherwise(F.col("next_id"))
    )
    return enriched.select("error_id", nearest.alias("nearest_view_id"))


@query(
    "join_asof_tolerance",
    oracle="""
    SELECT error_id, click_id FROM (
      SELECT e.event_id AS error_id, c.event_id AS click_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST
             ) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = e.user_id AND c.ts <= e.ts
       AND c.ts >= e.ts - INTERVAL 30 MINUTE
    ) WHERE rn = 1
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (feature-store semantics):
    each error takes the nearest prior click only if it is at most
    30 minutes old, else NULL — ``merge_asof(tolerance=...)`` /
    point-in-time-correct feature lookup with a max-age guard.

    Same linear single-shuffle shape as join_asof (union, one window
    pass carrying the matched click as a struct so id and ts travel
    together), plus a row-local staleness test. The bound is ALSO what
    makes the streaming form viable at 100 TB: state per key is one
    struct, and the tolerance gives the watermark an eviction horizon
    (a match older than the bound can never be emitted), exactly
    Flink's interval-join state TTL. Oracle is the pairwise theta-join
    form with the tolerance in the ON clause — LEFT JOIN keeps
    out-of-tolerance errors as NULL rows on both sides.
    """
    prep(spark)
    tol_us = 30 * 60 * 1_000_000
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "click",
            F.struct(
                F.unix_micros("ts").alias("cts"), F.col("event_id").alias("cid")
            ),
        ).alias("click"),
        # clicks (0) sort before errors (1) at equal ts → inclusive <=
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)).alias("tie"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tie", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click", F.last("click", ignorenulls=True).over(w))
        .filter(F.col("tie") == 1)
        .select(
            F.col("event_id").alias("error_id"),
            F.when(
                F.unix_micros("ts") - F.col("last_click.cts") <= tol_us,
                F.col("last_click.cid"),
            ).alias("click_id"),
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name, rnk FROM (
      SELECT c.c_custkey, c.c_name, n.n_name,
             CAST(ROW_NUMBER() OVER (
               ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount)) DESC,
                        c.c_custkey ASC
             ) AS BIGINT) AS rnk
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1996-04-01'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    ) WHERE rnk <= 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returns in one quarter. Composite exercising
    selective date pushdown on the fact-adjacent orders table, an 'R'
    flag filter pushed into the lineitem scan, two broadcast dims
    (customer at fixture scale would shuffle at 100 TB — it joins on
    the post-aggregation custkey grain; nation is always broadcast),
    and a global top-k (TakeOrdered, no full sort). Output is rank-only
    per the suite float-hash rule: the first attempt emitted
    ROUND(revenue, 2) and hit the documented cross-engine half-way
    divergence (Spark 307843.6 vs DuckDB 307843.59 from a .595 sum) —
    ranking on the UNROUNDED sum is stable because distinct customers'
    revenues differ by far more than summation-order ulp noise, while
    any fixed rounding can land on a boundary. Tie-break custkey.
    """
    prep(spark)
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return (
        rev.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 20)
        .select("c_custkey", "c_name", "n_name", "rnk")
    )


@query(
    "q18_large_volume",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR)  AS o_orderdate_s,
           ROUND(o.o_totalprice, 2)        AS o_totalprice_r,
           ROUND(SUM(l.l_quantity), 2)     AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    quantity exceeds a threshold, with their customer and quantity
    rollup. The HAVING subquery becomes an aggregate + left-semi join
    on the fact key — Catalyst plans the semi join BEFORE the wide
    join so only qualifying orders reach it. Both lineitem aggregates
    share one shuffle key (l_orderkey), so AQE reuses the exchange.
    """
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 250)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    cust = table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate_s"),
            F.round("o_totalprice", 2).alias("o_totalprice_r"),
            "sum_qty",
        )
    )
