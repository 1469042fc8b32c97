"""Projection / filter / predicate operators (SURVEY.md §2.2).

Flink analogue: ``MapFunction`` / ``FilterFunction`` (reference
snapshot empty — SURVEY.md §0).

Scale notes: all predicates here are Catalyst-native expressions that
stay inside whole-stage codegen and push down to the parquet scan where
the format supports it (comparisons, IN, LIKE prefix). Per-row derived
columns are pure JVM arithmetic — no Python in the path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import prep, table


@query(
    "project_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_quantity + l_tax                 AS qty_plus_tax
    FROM lineitem
    """,
)
def project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived arithmetic columns (identical IEEE ops both engines →
    bit-exact, no rounding needed)."""
    prep(spark)
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_quantity") + F.col("l_tax")).alias("qty_plus_tax"),
    )


@query(
    "filter_conjunctive",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    )


@query(
    "filter_disjunctive_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') OR o_totalprice > 300000.0
    """,
)
def filter_disjunctive_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    return (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            | (F.col("o_totalprice") > 300000.0)
        )
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )


@query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_type, p_brand
    FROM part
    WHERE p_type LIKE 'PROMO%'
    UNION ALL
    SELECT c_custkey AS p_partkey, c_name AS p_type, 'customer' AS p_brand
    FROM customer
    WHERE c_name LIKE '%12'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE prefix (pushdown-able) + suffix patterns, unioned."""
    prep(spark)
    parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type").like("PROMO%"))
        .select("p_partkey", "p_type", "p_brand")
    )
    custs = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_name").like("%12"))
        .select(
            F.col("c_custkey").alias("p_partkey"),
            F.col("c_name").alias("p_type"),
            F.lit("customer").alias("p_brand"),
        )
    )
    return parts.unionByName(custs)


@query(
    "filter_null_handling",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nn,
           (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL AS is_overdrawn,
           (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END)
               IS NOT DISTINCT FROM 0.0 AS nsafe_zero
    FROM customer
    WHERE c_acctbal < 0 OR c_acctbal IS NOT NULL
    """,
)
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / null-safe equality on a derived nullable."""
    prep(spark)
    bal_nn = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.col("c_acctbal")
    )
    return (
        table(spark, sf_dir, "customer")
        .filter((F.col("c_acctbal") < 0) | F.col("c_acctbal").isNotNull())
        .select(
            "c_custkey",
            bal_nn.alias("bal_nn"),
            bal_nn.isNull().alias("is_overdrawn"),
            bal_nn.eqNullSafe(F.lit(0.0)).alias("nsafe_zero"),
        )
    )
