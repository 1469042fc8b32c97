"""Reshape operators: pivot (long→wide) and unpivot (wide→long).

Feature-matrix construction (one row per entity, one column per
category) and metric melting are everyday steps in an analytics /
training-data pipeline. Spark's `groupBy().pivot()` and `unpivot()` are
the idiomatic forms; both oracles are written as the portable
conditional-aggregation / UNION ALL equivalents so DuckDB agrees
column-for-column. No reference-repo counterpart (snapshot empty per
SURVEY §0); Flink Table API has no PIVOT either — this is part of the
beyond-reference surface mandated by BASELINE.json:6.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from pyspark.sql.dataframe import DataFrame

from ..registry import query
from ..tables import prep, table

# events.event_type domain, verified in FIXTURES.md. Pinning the value
# list makes the pivot single-pass (no distinct-values pre-job) and the
# output schema static — both load-bearing at 100 TB.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
           COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS n_error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS n_signup,
           COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type count matrix via `groupBy().pivot()`.

    Passing the explicit value list keeps this one aggregation job
    (Spark otherwise runs a distinct-values job first) and fixes the
    column order. Missing combinations surface as null counts →
    coalesced to 0 to match COUNT(CASE ...)'s semantics.
    """
    prep(spark)
    wide = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


@query(
    "unpivot_part_metrics",
    oracle="""
    WITH long_form AS (
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice      AS val
      FROM part
      UNION ALL
      SELECT p_partkey, 'p_size'        AS metric, CAST(p_size AS DOUBLE) AS val
      FROM part
    )
    SELECT metric,
           COUNT(*)            AS n,
           ROUND(AVG(val), 4)  AS avg_val,
           ROUND(MAX(val), 4)  AS max_val
    FROM long_form
    GROUP BY metric
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt part's numeric metrics to (partkey, metric, val) long form
    via `DataFrame.unpivot`, then summarize per metric.

    Unpivot is a zero-shuffle row-local expansion (each input row emits
    one row per value column); the only shuffle is the final tiny
    2-group aggregate.
    """
    prep(spark)
    long_form = (
        table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.col("p_retailprice").cast("double"),
            F.col("p_size").cast("double"),
        )
        .unpivot(
            ids=["p_partkey"],
            values=["p_retailprice", "p_size"],
            variableColumnName="metric",
            valueColumnName="val",
        )
    )
    return long_form.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("val"), 4).alias("avg_val"),
        F.round(F.max("val"), 4).alias("max_val"),
    )
