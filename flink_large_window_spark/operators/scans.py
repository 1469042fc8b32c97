"""Scan / source / sink operators (SURVEY.md §2.1).

Flink analogue: ``SourceFunction`` / ``SinkFunction`` (reference
snapshot empty — SURVEY.md §0). Capability: ingest a typed, timestamped
table/stream and emit results to durable storage.

Scale notes (100 TB): the parquet scans below rely on Catalyst's column
pruning and predicate pushdown — at scale these turn a full-table read
into a footer-driven row-group skip. `tests/test_plans.py` asserts the
pushdown actually appears in the physical plan (PushedFilters /
ReadSchema), because a scan that reads all columns for a 2-column
projection is wrong at any scale and fatal at 100 TB.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..scratch import scratch_dir
from ..tables import prep, table

# Columns of lineitem with the timestamp rendered as string for
# cross-engine hash stability (see registry.py conventions).
_LINEITEM_STR_TS = """
  l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
  CAST(l_shipdate AS VARCHAR) AS l_shipdate_s
"""


@query(
    "scan_parquet",
    oracle=f"SELECT {_LINEITEM_STR_TS} FROM lineitem",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of the largest table, all columns projected."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        *[c for c in li.columns if c != "l_shipdate"],
        F.col("l_shipdate").cast("string").alias("l_shipdate_s"),
    )


@query(
    "scan_projection_pushdown",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-column projection — ReadSchema must shrink to these columns."""
    prep(spark)
    return table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@query(
    "scan_predicate_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(l_shipdate AS VARCHAR) AS l_shipdate_s
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def scan_predicate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter that reaches the parquet reader as PushedFilters."""
    prep(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.col("l_shipdate").cast("string").alias("l_shipdate_s"),
        )
    )


@query("source_rate_stream")  # rows-only: streaming smoke
def source_rate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate source → tumbling processing-time windowed count (smoke).

    Flink analogue: an unbounded ``SourceFunction`` feeding a windowed
    count. Processing-time output is nondeterministic by nature, so
    this key is rows-only (SURVEY §2.9 gap #4): we drain a couple of
    micro-batches into a memory sink and return the materialized table.
    """
    prep(spark)
    name = "rate_smoke_sink"
    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "100")
        .option("numPartitions", "2")
        .load()
        .groupBy(F.window("timestamp", "1 second"), (F.col("value") % 5).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("bucket"), F.col("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and spark.table(name).count() == 0:
            time.sleep(0.5)
    finally:
        q.stop()
    return spark.table(name)


@query(
    "sink_parquet",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write an aggregate result to parquet, re-read and return it.

    At 100 TB the write side would be partitioned
    (``partitionBy(date)``) with sized output files; the smoke keeps
    the same code path (DataFrameWriter → parquet → schema-on-read).
    """
    prep(spark)
    out = scratch_dir("flws_sink_")
    (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out)


@query(
    "sink_parquet_partitioned",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS STRING) AS day,
           event_type,
           COUNT(*) AS n
    FROM events
    WHERE date_trunc('day', ts) BETWEEN TIMESTAMP '2024-01-10' AND TIMESTAMP '2024-01-12'
    GROUP BY 1, 2
    """,
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-partitioned parquet layout + partition pruning, end to end.

    This is the 100 TB layout SURVEY §7 prescribes for events: write
    partitioned by day, then let a day-range query prune to 3 of ~30
    directories instead of scanning the table. The pruning is asserted
    against the physical plan (PartitionFilters), not assumed, and the
    re-read aggregate is oracle-checked against the unpartitioned
    originals — proving the layout is lossless.

    Hive-style partition values encode as strings; the partition column
    is written as a DATE-truncated string (`day_part`) and the output
    day is re-derived from it, so parquet-vs-directory type quirks
    can't leak into the result.
    """
    prep(spark)
    out = scratch_dir("flws_part_")
    events = table(spark, sf_dir, "events")
    (
        events.withColumn(
            "day_part", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
        )
        .write.mode("overwrite")
        .partitionBy("day_part")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        F.col("day_part").between("2024-01-10", "2024-01-12")
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    if "PartitionFilters: []" in plan or "day_part" not in plan.split(
        "PartitionFilters:"
    )[-1].splitlines()[0]:
        raise AssertionError("day filter not pruned to partitions:\n" + plan)
    return (
        back.groupBy("day_part", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat(F.col("day_part"), F.lit(" 00:00:00")).alias("day"),
            "event_type",
            "n",
        )
    )


@query(
    "scan_file_metadata",
    oracle="""
    SELECT 'lineitem.parquet' AS file_name,
           COUNT(*)           AS n_rows
    FROM lineitem
    """,
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row→file lineage via the hidden `_metadata` struct: rows per
    source file. The oracle pins the expected basename + count (the
    oracle views hide file paths), so the Spark side must really read
    `_metadata.file_name` and attribute every row to the right file.

    At 100 TB this column is how a pipeline audits which of thousands
    of input files produced a bad row and reprocesses exactly those —
    free metadata, no scan-side cost.
    """
    prep(spark)
    return (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(F.col("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "join_dynamic_partition_pruning",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS STRING) AS day,
           COUNT(*) AS n
    FROM events
    WHERE date_trunc('day', ts) IN
          (TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-15', TIMESTAMP '2024-01-25')
    GROUP BY 1
    """,
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is day-partitioned
    parquet, the filter arrives via a JOIN against a 3-day dim table —
    not as a literal predicate — and Spark still prunes the fact scan
    to 3 of ~30 directories by injecting the dim's values as a runtime
    subquery filter (asserted via `dynamicpruning` in the optimized
    plan). At 100 TB this is THE mechanism that keeps star-schema
    fact scans proportional to the dim filter, not the table.
    """
    prep(spark)
    out = scratch_dir("flws_dpp_")
    events = table(spark, sf_dir, "events")
    (
        events.withColumn(
            "day_part", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
        )
        .write.mode("overwrite")
        .partitionBy("day_part")
        .parquet(out)
    )
    fact = spark.read.parquet(out)
    # DPP requires a SELECTIVE predicate on the dim side (the pruning
    # rule inserts the subquery only when filtering the fact is likely
    # to pay); a 3-day dim table written to parquet + filtered provides
    # it. A bare LocalRelation does not trigger the rule.
    dim_path = os.path.join(out, "_dim")
    spark.createDataFrame(
        [("2024-01-05", 1), ("2024-01-15", 1), ("2024-01-25", 1), ("none", 0)],
        ["dim_day", "wanted"],
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("wanted") == 1)
    joined = fact.join(dim, fact["day_part"] == dim["dim_day"])
    plan_txt = (
        joined._jdf.queryExecution().optimizedPlan().toString()
        + joined._jdf.queryExecution().executedPlan().toString()
    )
    if "dynamicpruning" not in plan_txt.lower():
        raise AssertionError("expected DPP filter in plan:\n" + plan_txt)
    return (
        joined.groupBy("day_part")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat(F.col("day_part"), F.lit(" 00:00:00")).alias("day"), "n"
        )
    )


@query(
    "sql_entry_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def sql_entry_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL entry point with a correlated EXISTS subquery — the
    rest of the suite uses the DataFrame API; this key proves the SQL
    front door (including subquery decorrelation: Catalyst rewrites
    the EXISTS into the same left-semi hash join the DataFrame form
    plans). Tables are addressed as ``parquet.`path``` so no temp
    views are registered (they could clobber same-named views owned
    by the calling session).
    """
    prep(spark)
    return spark.sql(
        f"""
        SELECT c_custkey, c_name
        FROM parquet.`{sf_dir}/customer.parquet` c
        WHERE EXISTS (
          SELECT 1 FROM parquet.`{sf_dir}/orders.parquet` o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )
