"""Deterministic sampling operators (training-data-pipeline extras).

A 100 TB corpus pipeline samples constantly — eval splits, ablation
subsets, per-stratum caps. `df.sample()` is seed-dependent across
partitionings and non-portable across engines, so every operator here
uses **hash-mod sampling on a stable key**: row kept iff
``mix(key) % M < t``. That is reproducible run-to-run, stable under
repartitioning, embarrassingly parallel (no shuffle to decide
membership), and expressible identically in Spark and DuckDB — so each
query gets a full SQL oracle, unlike anything built on `rand()`.

The mixer is a Knuth multiplicative hash (odd constant 2654435761,
i.e. floor(2^32/phi)) applied to the key reduced mod a 31-bit prime, so
products stay < 2^63 for ANY int64 key and Spark 4 ANSI mode and DuckDB
agree exactly at every scale. No reference-repo counterpart
(reference snapshot is empty per SURVEY §0); mandated by the
training-pipeline clause of BASELINE.json:6.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window
from pyspark.sql.dataframe import DataFrame

from ..registry import query
from ..tables import prep, table

_MIX = 2654435761  # Knuth multiplicative; odd → bijective mod 2^k
# Reduce keys mod a 31-bit prime BEFORE multiplying: (2^31-2)·_MIX < 2^63,
# so the product can never trip Spark 4's ANSI overflow even for the
# ~6e9-magnitude orderkeys a 100 TB TPC-H run carries (round 1 multiplied
# the raw key; safe for fixtures, a job-killer at scale — ADVICE r1).
# For fixture keys (< 2^31-1) the reduction is the identity, so sampled
# membership — and every oracle — is unchanged.
_P31 = 2147483647


@query(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT COUNT(*)                                   AS n_sampled,
           ROUND(SUM(l_quantity), 2)                  AS sum_qty,
           COUNT(DISTINCT l_orderkey)                 AS n_orders
    FROM lineitem
    WHERE ((l_orderkey % 2147483647) * {_MIX} + l_linenumber * 7919) % 97 < 10
    """,
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10.3% Bernoulli sample of lineitem by key-hash (10/97), with
    summary aggregates.

    Membership depends only on the row's key, so the same rows are
    chosen at every scale factor, on every re-run, under any
    partitioning — the property `df.sample(0.1, seed)` does NOT have
    (its outcome shifts with partition layout). At 100 TB this predicate
    evaluates inside the parquet scan with zero shuffle.
    """
    prep(spark)
    keep = ((F.col("l_orderkey") % _P31) * _MIX + F.col("l_linenumber") * 7919) % 97 < 10
    return (
        table(spark, sf_dir, "lineitem")
        .filter(keep)
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


@query(
    "sample_stratified_hash",
    oracle=f"""
    SELECT lang,
           COUNT(*)                                              AS n_total,
           COUNT(CASE WHEN ((doc_id % 2147483647) * {_MIX}) % 100 < 20 THEN 1 END) AS n_sampled
    FROM documents
    GROUP BY lang
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 20% sample of documents per language stratum.

    Same hash-mod membership rule applied within each stratum; the
    output reports stratum sizes before/after so the rate is auditable.
    Spark's `sampleBy` needs a driver-supplied fraction map and a seed;
    this formulation needs neither and pushes membership into the scan.
    """
    prep(spark)
    sampled = ((F.col("doc_id") % _P31) * _MIX) % 100 < 20
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(sampled, 1)).alias("n_sampled"),
        )
    )


@query(
    "sample_reservoir_hash",
    oracle=f"""
    SELECT event_type, event_id, rnk FROM (
      SELECT event_type, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY ((event_id % 2147483647) * {_MIX}) % 1000000007, event_id
             ) AS rnk
      FROM events
    ) WHERE rnk <= 5
    """,
)
def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k sample (k=5) per event_type: the k rows
    with the smallest key-hash.

    This is the reproducible analogue of per-group reservoir sampling:
    uniform over the group (the hash order is unrelated to any data
    order) but stable across runs and engines. At scale the row_number
    sort is a per-group top-k (TakeOrdered shape), not a full sort, and
    partial top-k folds map-side before the shuffle.
    """
    prep(spark)
    w = Window.partitionBy("event_type").orderBy(
        (((F.col("event_id") % _P31) * _MIX) % 1000000007).asc(), F.col("event_id").asc()
    )
    return (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
    )
