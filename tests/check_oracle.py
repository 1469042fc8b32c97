"""Local replica of the driver's t2 DuckDB-oracle check (SURVEY §5.2).

Runs every registered query's Spark form and DuckDB oracle side by side
and compares row count + schema + order-insensitive values. Stricter
than the driver's value-hash (we diff actual cells), so green here
should imply green there — with one deliberate carve-out: frames with
nested-typed (list/ndarray/dict) columns are REJECTED outright, because
the driver's sort_values canonicalizer crashes on them (round-5
``multimodal_embed_quantize`` ERR) while any stringify-then-sort local
check would silently pass.

Usage:
    python tests/check_oracle.py                    # all keys at sf0.01
    python tests/check_oracle.py --sf /root/testdata/sf0.001 agg_hash_grouped
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from flink_large_window_spark import api  # noqa: E402
from flink_large_window_spark.tables import TABLE_NAMES  # noqa: E402

DEFAULT_SF = "/root/testdata/sf0.01"


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_dtype(dtype) -> str:
    """Canonical dtype label for schema comparison (pandas-level)."""
    s = str(dtype)
    if s.startswith("datetime64"):
        return "timestamp"
    return s


def nested_cols(df: pd.DataFrame) -> list[str]:
    """Columns whose cells are list/ndarray/dict-typed.

    The driver canonicalizes by ``sort_values`` over the whole frame;
    list-typed cells are unhashable there (``TypeError: unhashable
    type: 'list'`` — the round-5 ``multimodal_embed_quantize`` ERR), so
    a SQL-oracle key emitting one can pass a stringifying local check
    while crashing the driver. Detect via the first non-null cell per
    object column (a column is either nested-typed or not).
    """
    bad = []
    for c in df.columns:
        col = df[c]
        if col.dtype != object:
            continue
        nn = col.dropna()
        if not len(nn):
            continue
        v = nn.iloc[0]
        if isinstance(v, (list, tuple, dict, set)) or (
            type(v).__name__ == "ndarray"
        ):
            bad.append(c)
    return bad


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return str(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df[sorted(df.columns)]
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def compare_one(spark, con, key: str, sf_dir: str) -> dict:
    t0 = time.time()
    res: dict = {"key": key, "status": "OK", "details": []}
    fn = api.queries()[key]
    sql = api.oracle_sql().get(key)

    sdf = fn(spark, sf_dir)
    spark_pd = sdf.toPandas()
    if sql is None:
        res["status"] = "ROWS_ONLY"
        res["details"].append(f"rows={len(spark_pd)}")
        if len(spark_pd) == 0:
            res["status"] = "FAIL"
            res["details"].append("rows-only check returned 0 rows")
        res["secs"] = round(time.time() - t0, 2)
        return res
    duck_pd = con.execute(sql).df()

    bad = sorted(set(nested_cols(spark_pd)) | set(nested_cols(duck_pd)))
    if bad:
        res["status"] = "FAIL"
        res["details"].append(
            f"nested-typed column(s) {bad}: unhashable under the "
            "driver's sort_values canonicalizer — serialize to string "
            "(concat_ws / array_to_string) or explode to rows"
        )
        res["secs"] = round(time.time() - t0, 2)
        return res

    if len(spark_pd) != len(duck_pd):
        res["status"] = "FAIL"
        res["details"].append(f"rowcount spark={len(spark_pd)} duck={len(duck_pd)}")

    s_cols = sorted(spark_pd.columns)
    d_cols = sorted(duck_pd.columns)
    if s_cols != d_cols:
        res["status"] = "FAIL"
        res["details"].append(f"columns spark={s_cols} duck={d_cols}")
    else:
        for c in s_cols:
            st, dt = _canon_dtype(spark_pd[c].dtype), _canon_dtype(duck_pd[c].dtype)
            if st != dt:
                res["status"] = "FAIL"
                res["details"].append(f"dtype[{c}] spark={st} duck={dt}")

    if res["status"] == "OK":
        s_rows, d_rows = canon_rows(spark_pd), canon_rows(duck_pd)
        if s_rows != d_rows:
            res["status"] = "FAIL"
            diffs = [
                (a, b) for a, b in zip(s_rows, d_rows) if a != b
            ][:3]
            d_set, s_set = set(d_rows), set(s_rows)
            only_s = [r for r in s_rows if r not in d_set][:2]
            only_d = [r for r in d_rows if r not in s_set][:2]
            res["details"].append(f"value diff; first zips={diffs}")
            if only_s:
                res["details"].append(f"spark-only={only_s}")
            if only_d:
                res["details"].append(f"duck-only={only_d}")
        else:
            res["details"].append(f"rows={len(s_rows)} hash-equal")
    res["secs"] = round(time.time() - t0, 2)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*", help="query keys (default: all)")
    ap.add_argument("--sf", default=DEFAULT_SF)
    args = ap.parse_args()

    from flink_large_window_spark.session import get_spark

    spark = get_spark("check-oracle")
    con = duck_con(args.sf)
    keys = args.keys or sorted(api.queries())
    n_fail = 0
    for key in keys:
        try:
            r = compare_one(spark, con, key, args.sf)
        except Exception as e:  # noqa: BLE001
            r = {"key": key, "status": "ERROR", "details": [f"{type(e).__name__}: {e}"], "secs": 0}
        if r["status"] in ("FAIL", "ERROR"):
            n_fail += 1
        print(f"[{r['status']:9s}] {key:28s} {r['secs']:6.2f}s  {' | '.join(str(d) for d in r['details'])}")
    print(f"\n{len(keys) - n_fail}/{len(keys)} green")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
