"""No SQL-oracle key may emit a nested-typed result column.

The grading driver canonicalizes each result frame with pandas
``sort_values`` before hashing; list/struct/map-typed cells are
unhashable there, so the check crashes (``TypeError: unhashable type:
'list'``) before comparing anything — the round-5
``multimodal_embed_quantize`` ERR, the suite's first red driver row.
Nested values must be serialized to a scalar (``concat_ws`` /
``array_to_string``, the ``agg_collect`` pattern) or exploded to rows.

Two layers: (1) a registry-wide sweep that DESCRIBEs every oracle in
DuckDB (plans the query without executing it — cheap for all keys) and
fails on any ``[]`` / STRUCT / MAP / LIST output type; a Spark result
whose oracle is scalar is then caught by check_oracle's ordinary schema
compare. (2) a unit test pinning that ``check_oracle.nested_cols``
flags the exact frame shape that crashed the driver, so the local
checker can never again pass a query the driver cannot check.
"""

from __future__ import annotations

import re

import pandas as pd
import pytest

import flink_large_window_spark.api as api
from tests.check_oracle import nested_cols

_NESTED = re.compile(r"\[\]|^STRUCT|^MAP|^LIST|^UNION", re.IGNORECASE)


def test_no_sql_oracle_emits_nested_types(duck):
    offenders = {}
    for key, sql in api.oracle_sql().items():
        cols = duck.execute(f"DESCRIBE {sql}").fetchall()
        bad = [(c[0], c[1]) for c in cols if _NESTED.search(c[1])]
        if bad:
            offenders[key] = bad
    assert not offenders, (
        "SQL-oracle keys emit nested-typed columns the driver "
        f"canonicalizer cannot hash: {offenders} — serialize to string "
        "or explode to rows"
    )


def test_nested_cols_reproduces_driver_crash_class():
    # The pre-fix multimodal_embed_quantize shape: an object column of
    # Python lists. pandas sort_values on it raises — exactly what the
    # driver recorded in round 5 — and nested_cols must flag it.
    frame = pd.DataFrame(
        {"vec_id": [1, 2], "q": [[1, 2, 3], [4, 5, 6]]}
    )
    with pytest.raises(TypeError):
        frame.sort_values(by=list(frame.columns)).apply(hash, axis=1)
    assert nested_cols(frame) == ["q"]


def test_nested_cols_accepts_scalar_frames():
    frame = pd.DataFrame(
        {
            "a": [1, 2],
            "s": ["x,y", None],
            "f": [1.5, float("nan")],
            "t": pd.to_datetime(["2026-01-01", "2026-01-02"]),
        }
    )
    assert nested_cols(frame) == []
