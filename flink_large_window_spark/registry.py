"""Query registry mapping SURVEY.md §2 keys to Spark callables + oracles.

Each operator module registers its queries with the @query decorator:

    @query("agg_hash_grouped", oracle=\"\"\"SELECT ... \"\"\")
    def agg_hash_grouped(spark, sf_dir): ...

Conventions enforced suite-wide (SURVEY.md §2 parity rules):
- every computed column is aliased identically in Spark and oracle SQL;
- aggregate doubles are rounded — 2 decimals for money-magnitude sums,
  4–6 for small magnitudes — so cross-engine float summation-order
  noise cannot flip the driver's value hash. Known residual hazard
  (probed empirically, tests/test_properties.py): Spark rounds a
  double's SHORTEST decimal repr half-up while DuckDB scales-and-
  rounds the binary value, so inputs whose shortest repr terminates
  with a '5' exactly at the cut position diverge (1.005 → 1.01 vs
  1.00). Aggregates of fixture data land on such boundaries with
  negligible probability (verified green at sf0.001/0.01/0.1). When a
  sum DOES land on one (it happened once: q9 at sf0.1), the remedy is
  exact scaled-integer summation — per-row ROUND(x·10^k) AS BIGINT on
  both sides (fixture money is k-decimal-valued, so the per-row round
  is never near .5), SUM integers, divide once; see
  operators/tpch.py::q9_product_profit;
- timestamp/date outputs are emitted as strings (``CAST(.. AS STRING)``
  both sides) so timezone-awareness differences between Spark
  TimestampType (session-tz) and DuckDB naive TIMESTAMP cannot produce
  schema or value mismatches;
- every top-k is made deterministic with a unique-key tie-break.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a SURVEY §2 operator. ``oracle=None`` → rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        REGISTRY[key] = fn
        if oracle is not None:
            ORACLES[key] = textwrap.dedent(oracle).strip()
        return fn

    return deco
