"""Physical-plan strategies and inspection (SURVEY.md §4): skew
salting, plan assertions used by tests."""

from importlib import import_module

for _m in ("skew", "bucketing"):
    import_module(f"{__name__}.{_m}")
