"""Regenerate OPERATORS.md from the live registry.

Run: python tools/gen_operators.py   (from the repo root)
"""
import sys

sys.path.insert(0, ".")
import __spark_entry__ as entry
from flink_large_window_spark.contract import CONTRACT_KEYS

qs = entry.queries()
oracles = entry.oracle_sql()
contract = set(CONTRACT_KEYS)

lines = [
    "# OPERATORS — every registered query key",
    "",
    "Auto-generated from the registry. One row per key in",
    "driver-checked order: **key** · oracle class · summary (first",
    "docstring line). §2 = SURVEY.md §2 contract row. Regenerate with",
    "`python tools/gen_operators.py`.",
    "",
    "| key | oracle | summary |",
    "| --- | --- | --- |",
]
for k, fn in qs.items():
    doc = (fn.__doc__ or "").strip().splitlines()
    summary = doc[0].strip() if doc else ""
    cls = "SQL" if k in oracles else "rows"
    lines.append(f"| `{k}` | {cls} | {summary} |")
lines += [
    "",
    f"Totals: {len(qs)} keys, {len(oracles)} SQL-oracle, "
    f"{len(qs) - len(oracles)} rows-only; {len(contract)} SURVEY §2 contract rows.",
    "",
]
with open("OPERATORS.md", "w") as f:
    f.write("\n".join(lines))
print(f"wrote OPERATORS.md: {len(qs)} keys, {len(oracles)} SQL")
