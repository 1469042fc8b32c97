"""Batch relational operators (SURVEY.md §2.1–§2.6).

Importing this package registers every operator module's queries into
``flink_large_window_spark.registry``.
"""

from importlib import import_module

_MODULES = (
    "scans",
    "filters",
    "joins",
    "aggregations",
    "window_functions",
    "cep",
    "sort_set",
    "sampling",
    "reshape",
    "timeseries",
    "tpch",
)

for _m in _MODULES:
    import_module(f"{__name__}.{_m}")
