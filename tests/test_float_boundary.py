"""Executable documentation of the double-summation boundary
(VERDICT r7 item 6; measured in the round-7 scale probe, SCALING.md
§13): ROUND(SUM(double), 2) on money columns is summation-order-
dependent once totals reach ~1e11, so cross-engine hash equality
CANNOT be relied on there — the shipped policy is "sum integer cents
beyond ~1e10 totals, divide once at the end" (the partsupp quartet
and q9 already do).

The test replicates the sf0.001 lineitem 500x (3M rows, total
~1.59e11) and folds the same doubles in ascending vs descending
order inside Spark — both are deterministic sequential folds (one
sorted partition), so the divergence assertion is stable, unlike
comparing two engines whose merge order can coincide by luck.
"""

from __future__ import annotations

import pyspark.sql.functions as F

K = 500  # 6,000 rows x 500 = 3M; total ~1.59e11 — past the boundary


def _replicated(spark):
    from flink_large_window_spark.tables import table

    li = table(spark, "/root/testdata/sf0.001", "lineitem").select("l_extendedprice")
    return li.crossJoin(spark.range(K).select(F.col("id").alias("k"))).select(
        "l_extendedprice"
    )


def _fold(df, col, ascending):
    """Deterministic sequential fold: one partition, sorted, so Spark's
    SUM accumulates rows in exactly this order."""
    one = df.repartition(1).sortWithinPartitions(
        F.col(col).asc() if ascending else F.col(col).desc()
    )
    return one.agg(F.sum(col).alias("s")).collect()[0]["s"]


def test_double_sum_order_divergence_at_1e11(spark):
    """At ~1.6e11 the asc and desc folds of the SAME doubles differ by
    whole cents (measured ~0.25): any two engines (or two shuffle
    orders) may legitimately disagree after ROUND(·, 2). This is the
    boundary SCALING.md §13 documents — 11/12 probed keys hash-equal
    at 10x data, the one divergence being exactly this mechanism."""
    df = _replicated(spark)
    asc = _fold(df, "l_extendedprice", True)
    desc = _fold(df, "l_extendedprice", False)
    assert asc > 1e11, "replication did not reach the boundary scale"
    div = abs(round(asc, 2) - round(desc, 2))
    assert div >= 0.01, (
        f"expected >= 1-cent order divergence at {asc:.0f}, got {div}"
    )


def test_integer_cents_policy_is_order_free(spark):
    """The shipped mitigation: round each money value to integer cents
    per row, SUM the int64s (exact, associative, order-free), divide
    once. Asc and desc folds must agree to the bit at the same scale
    where the double folds diverge — and match DuckDB's integer-cents
    sum on the identically replicated relation."""
    import duckdb

    df = _replicated(spark).select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents")
    )
    asc = _fold(df, "cents", True)
    desc = _fold(df, "cents", False)
    assert asc == desc
    oracle = duckdb.sql(
        "SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) "
        "FROM (SELECT l.l_extendedprice FROM "
        "read_parquet('/root/testdata/sf0.001/lineitem.parquet') l "
        f"CROSS JOIN range({K}))"
    ).fetchone()[0]
    assert int(oracle) == asc


def test_double_sum_stable_at_fixture_scale(spark):
    """Below the boundary (~3.2e8 total at K=1) the fold orders agree
    after ROUND(·, 2) — why the suite's double-sum keys are honestly
    green at their contract scale."""
    from flink_large_window_spark.tables import table

    li = table(spark, "/root/testdata/sf0.001", "lineitem").select("l_extendedprice")
    asc = _fold(li, "l_extendedprice", True)
    desc = _fold(li, "l_extendedprice", False)
    assert round(asc, 2) == round(desc, 2)
