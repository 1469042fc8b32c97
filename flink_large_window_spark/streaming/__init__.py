"""Event-time windowing core: batch forms + Structured Streaming twins
(SURVEY.md §2.9)."""

from importlib import import_module

for _m in ("windows", "streams", "cep_stream"):
    import_module(f"{__name__}.{_m}")
