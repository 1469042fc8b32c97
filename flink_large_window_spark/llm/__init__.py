"""LLM-data-pipeline operators (SURVEY.md §2.10): dedup, similarity
search, text analysis, multimodal columns — mandated beyond the
reference's own surface (BASELINE.json north star)."""

from importlib import import_module

for _m in ("dedup", "similarity", "text", "multimodal", "corpus"):
    import_module(f"{__name__}.{_m}")
