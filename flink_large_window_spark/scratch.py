"""Process-scoped scratch directories for sink/checkpoint round-trips.

Round 1 called ``tempfile.mkdtemp`` at every invocation and never
removed the result, leaking one directory per query run (ADVICE r1).
All scratch space now nests under ONE per-process base that is removed
at interpreter exit, so repeated runs (bench loops, the driver's
correctness sweep, pytest) leave nothing behind. On a cluster these
paths would be per-job locations on shared storage with their own
retention policy; the single-chokepoint helper keeps that swap local.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_BASE: str | None = None


def scratch_dir(prefix: str = "d_") -> str:
    """Create a fresh empty directory under the session scratch base."""
    global _BASE
    if _BASE is None:
        _BASE = tempfile.mkdtemp(prefix="flws_scratch_")
        atexit.register(shutil.rmtree, _BASE, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_BASE)
