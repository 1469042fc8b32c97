"""Scalar functions and user-defined function surface (SURVEY.md §2.7–2.8)."""

from importlib import import_module

for _m in ("scalars", "udfs"):
    import_module(f"{__name__}.{_m}")
