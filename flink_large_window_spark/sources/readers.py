"""Format round-trips: CSV and JSON-lines sources/sinks.

Each key writes a fixture-derived table in the format, re-reads it
with an explicit schema, and returns a result that must hash-match the
oracle computed from the original parquet — proving the format path is
lossless for the covered types, not merely non-empty.

Scale notes: CSV/JSON are ingest-only formats at 100 TB — no column
pruning, no predicate pushdown, no row-group statistics. The pipeline
pattern is: land → convert to parquet once → everything downstream
scans parquet. These round-trips exist to cover the landing step.
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import prep, table


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS rev
    FROM orders GROUP BY o_orderstatus
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → CSV (header) → re-read with explicit schema → aggregate.

    Doubles survive CSV because Spark writes shortest round-trip
    representations; timestamps are ISO-rendered. The aggregate must
    equal the oracle computed straight from parquet.
    """
    prep(spark)
    out = tempfile.mkdtemp(prefix="flws_csv_")
    orders = table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").option("header", "true").csv(out)
    back = (
        spark.read.schema(orders.schema)
        .option("header", "true")
        .csv(out)
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )


@query(
    "source_jsonl_roundtrip",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON-lines → re-read with explicit schema → aggregate
    including a nested-JSON extraction (props stays a JSON string
    through the round-trip)."""
    prep(spark)
    out = tempfile.mkdtemp(prefix="flws_jsonl_")
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(ev.schema).json(out)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.get_json_object("props", "$.k").cast("int"))
            .cast("long")
            .alias("sum_k"),
        )
    )
