"""Executed-plan inspection helpers (used by tests/test_plans.py and
operator-level plan assertions)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, run: bool = False) -> str:
    """String form of the executed physical plan. ``run=True`` executes
    first so AQE finalizes (codegen spans appear as ``*(n)`` markers)."""
    if run:
        df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def assert_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = executed_plan(df)
    for frag in fragments:
        if frag not in plan:
            raise AssertionError(f"expected {frag!r} in plan:\n{plan}")
