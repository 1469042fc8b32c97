"""Skew mitigation: salted join (SURVEY.md §4 / §7 100 TB notes).

AQE's skew-join split handles most skew at runtime; manual salting is
the deterministic fallback for pathological hot keys (one key holding
a double-digit percent of a 100 TB fact table), and for keyed windowed
aggregations where AQE cannot split a single group.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import prep, table

N_SALTS = 8


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Equi join resistant to hot fact keys.

    The fact side gets a deterministic per-row salt (hash of the whole
    row modulo n_salts), the dim side is replicated n_salts times, and
    the join key becomes (key, salt) — a hot key's rows spread over
    n_salts reducers instead of one. Row-preserving: each fact row
    joins exactly its one salted dim copy.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_dim = dim.select("*", salts)
    cond = (salted_fact[fact_key] == salted_dim[dim_key]) & (
        salted_fact["_salt"] == salted_dim["_salt"]
    )
    return salted_fact.join(salted_dim, cond, "inner").drop("_salt")


@query(
    "join_skew_salted",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted orders ⋈ customer — must produce EXACTLY the plain equi
    join's rows (the oracle is the unsalted join), proving the salting
    transform is row-preserving."""
    prep(spark)
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return salted_equi_join(orders, customer, "o_custkey", "c_custkey").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )
