"""Sessionless invariants of tools/scale_probe.py's comparator.

The expected-divergence (XDIV) gate must excuse ONLY the documented
ROUND(SUM(double)) last-quantum shape — a real regression at 100×
(schema drift, row-count drift, materially wrong values) must surface
as DIVERGE, not be silently absorbed by the wall marking (review r9:
the bare `not ok and expected` test excused arbitrary failures).
"""

from __future__ import annotations

import os
import sys

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
if _TOOLS not in sys.path:
    sys.path.insert(0, _TOOLS)

from scale_probe import EXPECTED_DIVERGENCE, canon, xdiv_confined


def test_xdiv_accepts_last_quantum_float_diff():
    # the measured wall: 99,849,750 vs 99,849,749.9999 (ROUND(·,4) at
    # ~1e8 magnitude — relative diff ~1e-12, far inside the 1e-9 gate)
    cols = ["month", "total"]
    srows = [("2024-01", "99849750")]
    orows = [("2024-01", "99849749.9999")]
    assert xdiv_confined(cols, cols, srows, orows)


def test_xdiv_rejects_schema_drift():
    assert not xdiv_confined(["a", "b"], ["a", "c"], [], [])


def test_xdiv_rejects_row_count_drift():
    cols = ["a"]
    assert not xdiv_confined(cols, cols, [("1",)], [("1",), ("2",)])


def test_xdiv_rejects_materially_wrong_values():
    cols = ["k", "v"]
    # wrong group sum (0.1% off — far beyond any rounding quantum)
    assert not xdiv_confined(
        cols, cols, [("g1", "1000.0")], [("g1", "1001.0")]
    )


def test_xdiv_rejects_non_numeric_diff():
    cols = ["k", "v"]
    assert not xdiv_confined(
        cols, cols, [("g1", "east")], [("g1", "west")]
    )


def test_xdiv_registry_is_the_round_wall_only():
    # adding a key here means claiming a NEW theoretically-derived
    # divergence class — it needs the same pytest + SCALING.md law the
    # ROUND wall has, so keep the registry's growth deliberate.
    assert set(EXPECTED_DIVERGENCE) == {"window_cascading_rollup"}
    assert EXPECTED_DIVERGENCE["window_cascading_rollup"]["min_k"] == 100


def test_canon_big_ints_verbatim():
    # 62-bit simhash signatures must never take the float path
    a = str((1 << 61) + 12345)
    b = str((1 << 61) + 12346)
    assert canon(a) != canon(b)
    assert canon(a) == a


def test_canon_null_spellings_collapse():
    assert {canon(None), canon("None"), canon("NaT"), canon("<NA>")} == {
        "nan"
    }


def test_every_family_key_list_is_registered_with_oracle():
    # a family battery whose keys drifted from the registry would die
    # at --keys validation; pin it sessionlessly here instead
    import flink_large_window_spark.api as api
    from scale_probe import FAMILIES

    q, o = api.queries(), api.oracle_sql()
    for fam, spec in FAMILIES.items():
        keys = spec["keys"](q)
        unknown = [k for k in keys if k not in q]
        assert not unknown, f"{fam}: keys not registered: {unknown}"
        # every battery key must carry the full value compare
        no_oracle = [k for k in keys if k not in o]
        assert not no_oracle, f"{fam}: keys without SQL oracle: {no_oracle}"


def test_replicate_dispatch_covers_every_family():
    # the FAMILIES dict and the replicate if/elif chain drifted in r9
    # (new family declared, no replica written). Pin via AST: collect
    # the string constants compared against `family` — a plain
    # source-text grep would false-pass on a family named after any
    # table already quoted in another branch (review r9).
    import ast
    import inspect

    import scale_probe

    tree = ast.parse(inspect.getsource(scale_probe._replicate_into))
    handled: set[str] = set()
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Compare)
            and isinstance(node.left, ast.Name)
            and node.left.id == "family"
        ):
            continue
        for comp in node.comparators:
            if isinstance(comp, ast.Constant) and isinstance(comp.value, str):
                handled.add(comp.value)
            elif isinstance(comp, ast.Tuple):
                handled.update(
                    e.value
                    for e in comp.elts
                    if isinstance(e, ast.Constant) and isinstance(e.value, str)
                )
    missing = set(scale_probe.FAMILIES) - handled
    assert not missing, f"families with no dispatch branch: {sorted(missing)}"
