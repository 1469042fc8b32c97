"""Source/sink format surface beyond parquet (SURVEY.md §2.1 scope).

The reference ingests timestamped streams (Flink SourceFunction /
connectors); capability-equivalent ingestion here = schema-on-read
batch formats + file/rate streaming sources (streaming/streams.py).
"""

from importlib import import_module

for _m in ("readers",):
    import_module(f"{__name__}.{_m}")
