"""SparkSession builder for tests and bench (driver owns its own session)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .tables import prep


def get_spark(app_name: str = "flink-large-window-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # Arrow speeds up toPandas / pandas UDF exchange (the only
        # Python-side hot paths we allow).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    return prep(builder.getOrCreate())
