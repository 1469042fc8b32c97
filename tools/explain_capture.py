"""Capture .explain("formatted") for a set of declared queries.

Optimization-round tooling: writes one plan file per key under
plans/$SPARK_GRAFT_PLANS_ROUND/ (default ``r15``; set the env var in
later rounds so new captures never overwrite a previous round's
committed evidence) as ``<key>_<tag>.txt``, so plan claims in the
round's OPTIMIZATION doc are auditable without running Spark. Usage:

    python tools/explain_capture.py <tag> [key ...]

With no keys, captures every bench.HEADLINE key. Plans are captured at
$SPARK_GRAFT_SF_DIR (default sf0.1) — the bench scale — with the same
session helper the bench uses, so Exchange counts / join strategies
match what the bench times (AQE initial plans; the final AQE plan can
differ at runtime, noted in the OPTIMIZATION doc where it matters).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(
            "usage: python tools/explain_capture.py <tag> [key ...] "
            "(see module docstring)"
        )
    tag = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        _REPO_ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    )
    os.makedirs(out_dir, exist_ok=True)

    from flink_large_window_spark import api
    from flink_large_window_spark.session import get_spark

    if not keys:
        import bench

        keys = list(bench.HEADLINE)

    spark = get_spark("explain-capture")
    qs = api.queries()
    for key in keys:
        buf = io.StringIO()
        try:
            df = qs[key](spark, sf_dir)
            with redirect_stdout(buf):
                df.explain("formatted")
        except Exception as e:  # capture the failure instead of dying
            buf.write(f"EXPLAIN FAILED: {e!r}\n")
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
