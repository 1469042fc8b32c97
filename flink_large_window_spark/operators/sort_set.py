"""Sort / limit / top-k / set operators (SURVEY.md §2.6).

Flink analogue: Table API ORDER BY / LIMIT / Top-N, DataStream union
(reference snapshot empty — SURVEY.md §0).

Scale notes: the global sort materializes a total order via range
partitioning (Spark samples ranges — scales to any size); limit_topk is
TakeOrderedAndProject (per-partition top-k then merge — no global
sort); set ops shuffle on the full row as key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..registry import query
from ..tables import prep, table


@query(
    "sort_multi_key",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
           ROW_NUMBER() OVER (
             ORDER BY l_returnflag ASC, l_extendedprice DESC,
                      l_orderkey ASC, l_linenumber ASC
           ) AS pos
    FROM lineitem
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key total-order sort, made hash-observable via a global
    position column (the order-insensitive oracle hash would otherwise
    not see the sort at all).

    The global row_number forces a single-partition window at fixture
    scale; at 100 TB the equivalent is zipWithIndex-style range
    partitioning (sortWithinPartitions + partition offsets).
    """
    prep(spark)
    w = Window.orderBy(
        F.col("l_returnflag").asc(),
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    return (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_extendedprice",
            F.row_number().over(w).cast("long").alias("pos"),
        )
    )


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — plans as TakeOrderedAndProject: each partition
    keeps its local top-10, driver merges; no full sort, no full shuffle."""
    prep(spark)
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS k FROM customer
    UNION ALL
    SELECT s_suppkey AS k FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    return c.unionByName(s)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_custkey AS k FROM customer
    UNION
    SELECT s_suppkey AS k FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT DISTINCT semantics on both engines."""
    prep(spark)
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT s_suppkey AS k FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT (Spark ``subtract``) on both engines.

    Customer keys minus supplier keys — non-empty at every fixture sf
    (nationkey difference is empty at sf≥0.01, which would make the
    oracle check vacuous).
    """
    prep(spark)
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    return c.subtract(s)


@query(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersect (multiplicity = min of the two sides) —
    Spark's intersectAll ≡ SQL INTERSECT ALL."""
    prep(spark)
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersectAll(s)


@query(
    "set_except_all",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics difference (multiplicity = left − right, floor 0)
    — Spark's exceptAll ≡ SQL EXCEPT ALL."""
    prep(spark)
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.exceptAll(s)


@query(
    "sort_within_partitions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_shipdate AS VARCHAR) AS l_shipdate_s
    FROM lineitem
    """,
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local sort (`sortWithinPartitions`) — the
    write-optimization sort that produces clustered output files (for
    parquet min/max row-group skipping) WITHOUT a global range
    shuffle. The plan is asserted Exchange-free: a global orderBy
    would add a rangepartitioning Exchange; this must not. Row content
    is unchanged (order-insensitive oracle), which is the point — the
    sort buys layout, not semantics.
    """
    prep(spark)
    df = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("string").alias("l_shipdate_s"),
        )
        .sortWithinPartitions("l_orderkey", "l_linenumber")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError("partition-local sort must not shuffle:\n" + plan)
    return df
