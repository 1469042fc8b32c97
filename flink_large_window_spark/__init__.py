"""flink_large_window_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the reference Flink large-window
stream processor (yeweicheng/flink-large-window; snapshot unavailable —
see SURVEY.md §0) idiomatically on Spark: DataFrame/SQL for the batch
relational surface, Structured Streaming for the event-time windowed
core, pandas UDFs only where built-ins cannot express the semantics.

The correctness contract is SURVEY.md §2: every operator key registers a
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) a
DuckDB oracle SQL string, compared by the driver at sf0.01 via
row-count + schema + order-insensitive value-hash.
"""

__version__ = "0.1.0"
