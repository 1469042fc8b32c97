"""Aggregation operators (SURVEY.md §2.4).

Flink analogue: ``AggregateFunction`` / Table API GROUP BY (reference
snapshot empty — SURVEY.md §0; capability anchors are the public Flink
API classes cited per-row in SURVEY.md §2.4).

Scale notes (100 TB): every groupBy here compiles to Spark's two-phase
HashAggregate (partial map-side combine → final), which is exactly
Flink's incremental-AggregateFunction pattern — state per group, not
per row. Grouping keys are low-cardinality (returnflag × linestatus,
orderstatus, …) so the shuffle after partial agg carries only
#groups × #partitions rows. No collect(), no Python in the hot path.

Float parity: aggregate doubles are rounded before output — 2 decimals
for money-magnitude sums (~1e9 at scale: decimal grid >> ulp), 4–6 for
small magnitudes — so Spark-vs-DuckDB summation-order ulp noise cannot
flip the driver's value hash. Identical ROUND appears in each oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import prep, table

# Cutoff used by the flagship Q1-shape query (TPC-H uses 1998-12-01 - 90d).
Q1_CUTOFF = "1998-09-02"


@query(
    "agg_hash_grouped",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 4)                                    AS sum_qty,
      ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      ROUND(AVG(l_quantity), 6)                                    AS avg_qty,
      ROUND(AVG(l_extendedprice), 6)                               AS avg_price,
      ROUND(AVG(l_discount), 6)                                    AS avg_disc,
      COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the flagship query (SURVEY §7 M1).

    Filter → grouped 8-aggregate rollup over the largest table. Catalyst
    plans this as parquet scan (shipdate predicate pushed down, 7-column
    read schema) → partial HashAggregate → 2-key shuffle → final
    HashAggregate, all inside whole-stage codegen.
    """
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_hash_global",
    oracle="""
    SELECT
      ROUND(SUM(l_extendedprice), 2) AS sum_price,
      ROUND(AVG(l_quantity), 6)      AS avg_qty,
      ROUND(MIN(l_extendedprice), 2) AS min_price,
      ROUND(MAX(l_extendedprice), 2) AS max_price,
      COUNT(*)                       AS n_rows
    FROM lineitem
    """,
)
def agg_hash_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (keyless) aggregate — single-group two-phase agg."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )
