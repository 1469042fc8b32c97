"""Seeded randomized sweep for the COMPILED STREAMING CEP automaton:
random event streams replayed through compile_stream's handler in
watermark-stepped micro-batches via a faithful in-process GroupState
emulation, compared against the batch reference matcher filtered to
the documented emission boundary (anchor-run OPEN passed by the final
watermark for default patterns; anchor-run CLOSED for the round-14
run-close shapes). This is the streaming counterpart of
test_cep_fuzz.py — the fixture parity tests pin ONE stream's
emissions; this pins the fold across hundreds of random streams,
batch cuts, and timer re-folds, without paying Spark query startup
per case (pure Python: the handler is an ordinary generator
function).

The emulation mirrors the Structured Streaming contract the handlers
rely on (and nothing more): per-batch watermark = max event time of
PRIOR batches minus the delay (the one-batch lag, SPARK-42376); keys
with data are invoked with hasTimedOut=False; keys without data whose
armed timeout the current watermark has reached fire with
hasTimedOut=True and an empty chunk iterator; the timeout is CLEARED
on every invocation unless the handler re-arms it; after the last
data batch, timers keep firing (watermark frozen at its final value)
until none are armed below it — the availableNow drain. Events are
delivered in event-time order across batches (cuts at random
positions) with arrival order within a batch shuffled: the machine
sorts via split_by_watermark, and cross-batch out-of-order is pinned
separately by the targeted parity tests.

Deterministic: numpy PCG64 with fixed seeds.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd

from flink_large_window_spark.operators.cep import Guard, Pattern, Step
from flink_large_window_spark.streaming.cep_stream import (
    _emit_on_close,
    compile_stream,
    compile_suffix_stream,
)

from tests.test_cep_fuzz import (
    GREEDY_PATTERNS,
    SUFFIX_PATTERNS,
    _canonicalize_ref,
    _random_streams,
    _ref_greedy,
    _ref_suffix,
    _runs,
)

WM_DELAY_MS = 10 * 60 * 1000


class _FakeGroupState:
    """The slice of pyspark's GroupState the compiled handlers use."""

    def __init__(self, store: dict, key, wm_ms: int, timed_out: bool):
        self._store = store
        self._key = key
        self._wm = wm_ms
        self.hasTimedOut = timed_out
        self.timeout_ms = None  # cleared on every invocation

    @property
    def exists(self) -> bool:
        return self._key in self._store

    @property
    def get(self):
        return self._store[self._key]

    def update(self, value) -> None:
        self._store[self._key] = tuple(value)

    def remove(self) -> None:
        self._store.pop(self._key, None)

    def getCurrentWatermarkMs(self) -> int:
        return max(0, self._wm)

    def setTimeoutTimestamp(self, ms: int) -> None:
        self.timeout_ms = ms


def _replay(rows, pat: Pattern, n_batches: int, seed: int,
            compile_fn=compile_stream):
    """Replay `rows` through the compiled handler in n_batches
    event-time-ordered cuts; returns the emitted tuples
    (user, anchor_event, n_<step>..., pattern_start_us,
    pattern_end_us)."""
    handler, out_schema, _ = compile_fn(pat)
    rng = np.random.default_rng(seed)
    ordered = sorted(rows, key=lambda r: (r[1], r[2]))  # global ts order
    cuts = sorted(
        rng.choice(
            range(1, len(ordered)), size=min(n_batches - 1, len(ordered) - 1),
            replace=False,
        )
    ) if n_batches > 1 and len(ordered) > 1 else []
    batches, lo = [], 0
    for c in list(cuts) + [len(ordered)]:
        batches.append(ordered[lo:c])
        lo = c

    store: dict = {}
    timers: dict = {}
    out = []
    wm = -1  # watermark lags one batch

    def invoke(key, events, timed_out):
        st = _FakeGroupState(store, key, wm, timed_out)
        timers.pop(key, None)  # Spark clears the timeout per invocation
        if events:
            ev = list(events)
            rng.shuffle(ev)  # within-batch arrival order is arbitrary
            df = pd.DataFrame(
                {
                    "user_id": [e[0] for e in ev],
                    "ts": [pd.Timestamp(e[1]) for e in ev],
                    "event_id": [e[2] for e in ev],
                    "event_type": [e[3] for e in ev],
                    "value": [e[4] for e in ev],
                }
            )
            chunks = iter([df])
        else:
            chunks = iter([])
        for pdf in handler((key,), chunks, st):
            out.extend(tuple(r) for r in pdf.itertuples(index=False))
        if st.timeout_ms is not None:
            timers[key] = st.timeout_ms

    for batch in batches:
        by_user = defaultdict(list)
        for e in batch:
            by_user[e[0]].append(e)
        for u in list(timers):
            if u not in by_user and timers[u] <= wm:
                invoke(u, [], True)
        for u, evs in by_user.items():
            invoke(u, evs, False)
        if batch:
            batch_max_ms = max(
                int(pd.Timestamp(e[1]).value) // 1_000_000 for e in batch
            )
            wm = max(wm, batch_max_ms - WM_DELAY_MS)
    # availableNow drain: watermark frozen, fire timers to exhaustion
    fired = True
    while fired:
        fired = False
        for u in list(timers):
            if timers[u] <= wm:
                invoke(u, [], True)
                fired = True
    return out, wm


def _expected(rows, pat: Pattern, wm_ms: int):
    """Batch reference filtered to the streaming emission boundary.
    Returns tuples shaped like the handler's rows (key, anchor_event,
    n_<non-final>..., [n_<last> for run-close], start_us, end_us) —
    rebuilt from the runs encoding so the anchor/boundary instants
    are explicit."""
    close = _emit_on_close(pat)
    matches = set(_ref_greedy(rows, pat))
    by_user = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_user[r[0]].append(r)
    out = set()
    for u, evs in by_user.items():
        runs = _runs(evs)
        for i, (_cls, res) in enumerate(runs):
            first_id = res[0][2]
            anchor_us = int(pd.Timestamp(res[0][1]).value) // 1_000
            key_lens = next(
                (m for m in matches
                 if m[0] == u and m[1] == first_id), None,
            )
            if key_lens is None:
                continue
            if close:
                if i + 1 >= len(runs):
                    continue  # never closed — never emits
                close_us = int(
                    pd.Timestamp(runs[i + 1][1][0][1]).value
                ) // 1_000
                if close_us // 1000 > wm_ms:
                    continue
                last = pat.steps[-1]
                n_last = len(res)
                if not last.exact and last.max_count is not None:
                    n_last = min(n_last, last.max_count)
                extra = (n_last,)
            else:
                if anchor_us // 1000 > wm_ms:
                    continue
                extra = ()
            k = len(pat.steps) - 1
            start_us = int(
                pd.Timestamp(runs[i - k][1][0][1]).value
            ) // 1_000 if k else anchor_us
            out.add(
                (u, first_id) + key_lens[2:] + extra
                + (start_us, anchor_us)
            )
    return out


def _strip_guard_cols(pat: Pattern, rows):
    """Drop the g_<name>/g_<name>_ref emission slots so the compare
    is structural (guard VALUES are pinned by the batch fuzz — both
    sides compute them from the same runs — and float canon here
    would just duplicate that)."""
    n_guards = sum(1 for s in pat.steps if s.guard is not None)
    if not n_guards:
        return {tuple(r) for r in rows}
    return {r[: -2 - 2 * n_guards] + r[-2:] for r in rows}


STREAM_FUZZ_PATTERNS = [p for p in GREEDY_PATTERNS if p.skip == "past_last"]


def test_stream_fuzz_matches_boundary_filtered_reference():
    rows = _random_streams(n_users=120, max_len=14, seed=97)
    n_checked = n_close = 0
    for pi, pat in enumerate(STREAM_FUZZ_PATTERNS):
        c_rows, c_pat = _canonicalize_ref(rows, pat)
        for n_batches, seed in ((1, 5), (3, 11), (5, 23)):
            got_raw, wm = _replay(c_rows, c_pat, n_batches, seed + pi)
            got = _strip_guard_cols(c_pat, got_raw)
            want = _expected(c_rows, c_pat, wm)
            assert got == want, (
                f"pattern {pi} ({pat.steps}) batches={n_batches}: "
                f"extra={sorted(got - want)[:3]} "
                f"missing={sorted(want - got)[:3]}"
            )
            n_checked += 1
            if _emit_on_close(c_pat):
                n_close += 1
                assert want, f"close-mode pattern {pi} emitted nothing"
    assert n_checked >= 30
    assert n_close >= 6, "run-close shapes under-represented in sweep"


def test_stream_fuzz_multibatch_differs_from_singlebatch_inputs():
    """Meaningfulness guard: the 3/5-batch replays must actually
    exercise cross-batch state — at least one pattern/user has a run
    straddling a batch cut (checked structurally on the cut
    positions, which are seeded and deterministic)."""
    rows = _random_streams(n_users=120, max_len=14, seed=97)
    ordered = sorted(rows, key=lambda r: (r[1], r[2]))
    rng = np.random.default_rng(11)  # the (3, 11) sweep case
    cuts = sorted(rng.choice(range(1, len(ordered)), size=2, replace=False))
    straddles = 0
    for c in cuts:
        a, b = ordered[c - 1], ordered[c]
        if a[0] == b[0] and a[3] == b[3]:
            straddles += 1  # same user, same class across the cut
    # with 120 users and ~840 events, same-user adjacency across a
    # random cut is not guaranteed — but same-USER state (window,
    # buffer) straddling is near-certain; check the weaker property
    # over a window of 20 events around each cut
    near = 0
    for c in cuts:
        users_before = {e[0] for e in ordered[max(0, c - 20):c]}
        users_after = {e[0] for e in ordered[c:c + 20]}
        near += bool(users_before & users_after)
    assert near, "batch cuts isolate users entirely — sweep too sparse"


def test_suffix_stream_fuzz_matches_anchor_filtered_reference():
    """The per-event suffix automaton (round 14): every fixed-count
    pattern from the batch suffix sweep — including exact boundaries
    and fixed-offset guards — replayed through compile_suffix_stream
    in random batch cuts must emit exactly the reference suffix
    matches whose ANCHOR the final watermark folded (per-event
    anchoring decides at the anchor's own fold; no run-close shift)."""
    rng_rows = _random_streams(n_users=120, max_len=14, seed=11)
    rows = []
    prev_by_user: dict[int, str] = {}
    for u, ts, eid, cls, val in rng_rows:  # the batch sweep's click bias
        if cls == "error" and prev_by_user.get(u) == "click":
            cls = "click"
        rows.append((u, ts, eid, cls, val))
        prev_by_user[u] = cls
    id_ms = {
        (r[0], r[2]): int(pd.Timestamp(r[1]).value) // 1_000_000
        for r in rows
    }
    n_checked = 0
    for pi, pat in enumerate(SUFFIX_PATTERNS):
        for n_batches, seed in ((1, 7), (4, 31)):
            got_raw, wm = _replay(
                rows, pat, n_batches, seed + pi,
                compile_fn=compile_suffix_stream,
            )
            got = {(r[0], r[1]) for r in got_raw}
            want = {
                (u, eid)
                for u, eid in _ref_suffix(rows, pat)
                if id_ms[(u, eid)] <= wm
            }
            assert got == want, (
                f"suffix pattern {pi} ({pat.steps}) batches={n_batches}: "
                f"extra={sorted(got - want)[:3]} "
                f"missing={sorted(want - got)[:3]}"
            )
            assert want, f"degenerate suffix sweep for {pat.steps}"
            n_checked += 1
    assert n_checked == 2 * len(SUFFIX_PATTERNS)


def test_pending_state_machines_fuzz_match_bruteforce():
    """The four pending-state machines (absence, preceding-horizon
    count, followedByAny pairs ± blocker, timed-out partials)
    replayed through the SAME fake-GroupState harness on random
    streams, compared against the O(n²) brute-force references of
    test_cep_fuzz with each machine's documented ms-aligned emission
    boundary. Completes the harness's coverage: every
    applyInPandasWithState CEP machine in the module now has a
    randomized multi-batch handler-level sweep (round 14)."""
    from flink_large_window_spark.streaming.cep_stream import (
        ABSENCE_OUT_SCHEMA,
        ABSENCE_STATE_SCHEMA,
        HORIZON_OUT_SCHEMA,
        HORIZON_STATE_SCHEMA,
        PAIRS_OUT_SCHEMA,
        PAIRS_STATE_SCHEMA,
        PAIRS_STATE_SCHEMA_BLK,
        TIMEOUT_OUT_SCHEMA,
        TIMEOUT_STATE_SCHEMA,
        compile_absence_stream,
        compile_horizon_count_stream,
        compile_pairs_stream,
        compile_timeout_stream,
    )

    from tests.test_cep_fuzz import _ref_pairs, _ref_timeouts

    h = 6 * 3600 * 1_000_000
    pat = Pattern(steps=(Step("x", "click"),))  # _replay cols only
    rows_all = _random_streams(n_users=200, max_len=16, seed=331)
    id_ms = {
        (r[0], r[2]): int(pd.Timestamp(r[1]).value) // 1_000_000
        for r in rows_all
    }
    us_of = {
        (r[0], r[2]): int(pd.Timestamp(r[1]).value) // 1_000
        for r in rows_all
    }

    def keep(classes):
        # the registered keys filter classes BEFORE the keyed shuffle;
        # the machines assume the same
        return [r for r in rows_all if r[3] in classes]

    for n_batches in (1, 4):
        # --- absence: click NOT followed by purchase within 6h ---
        rows = keep({"click", "purchase"})
        got_raw, wm = _replay(
            rows, pat, n_batches, 41,
            compile_fn=lambda _p: (
                compile_absence_stream("click", "purchase", h),
                ABSENCE_OUT_SCHEMA, ABSENCE_STATE_SCHEMA,
            ),
        )
        got = {(r[0], r[1]) for r in got_raw}
        by_user = defaultdict(list)
        for r in rows:
            by_user[r[0]].append(r)
        want = set()
        for u, evs in by_user.items():
            pos = [(us_of[(u, e[2])], e[2], e[3]) for e in evs]
            for a_us, a_id, a_cls in pos:
                if a_cls != "click":
                    continue
                if (a_us + h) // 1000 >= wm:  # horizon not closed
                    continue
                if any(
                    c == "purchase" and a_us <= t_us <= a_us + h
                    for t_us, _i, c in pos
                ):
                    continue
                want.add((u, a_id))
            # NOTE: frame is [anchor, anchor+h] inclusive at µs
        assert got == want and want, (
            f"absence n_batches={n_batches}: "
            f"extra={sorted(got - want)[:3]} "
            f"missing={sorted(want - got)[:3]}"
        )

        # --- preceding-horizon count: >= 2 clicks in [p-6h, p] ---
        got_raw, wm = _replay(
            rows, pat, n_batches, 43,
            compile_fn=lambda _p: (
                compile_horizon_count_stream("purchase", "click", h, 2),
                HORIZON_OUT_SCHEMA, HORIZON_STATE_SCHEMA,
            ),
        )
        got = {(r[0], r[1], r[2]) for r in got_raw}
        want = set()
        for u, evs in by_user.items():
            pos = [(us_of[(u, e[2])], e[2], e[3]) for e in evs]
            for a_us, a_id, a_cls in pos:
                if a_cls != "purchase" or a_us // 1000 >= wm:
                    continue
                n = sum(
                    1 for t_us, _i, c in pos
                    if c == "click" and a_us - h <= t_us <= a_us
                )
                if n >= 2:
                    want.add((u, a_id, n))
        assert got == want and want, f"horizon n_batches={n_batches}"

        # --- pairs (followedByAny), with and without a blocker ---
        rows3 = keep({"click", "purchase", "error"})
        for blocker, st_schema in (
            (None, PAIRS_STATE_SCHEMA),
            ("error", PAIRS_STATE_SCHEMA_BLK),
        ):
            src = rows if blocker is None else rows3
            got_raw, wm = _replay(
                src, pat, n_batches, 47,
                compile_fn=lambda _p, b=blocker, s=st_schema: (
                    compile_pairs_stream("click", "purchase", h,
                                         blocker_cls=b),
                    PAIRS_OUT_SCHEMA, s,
                ),
            )
            got = {tuple(r) for r in got_raw}
            want = {
                (u, a, t, gap)
                for u, a, t, gap in _ref_pairs(
                    src, "click", "purchase", h, blocker=blocker
                )
                if id_ms[(u, t)] < wm  # target settles strictly
            }
            assert got == want and want, (
                f"pairs blocker={blocker} n_batches={n_batches}: "
                f"extra={sorted(got - want)[:2]} "
                f"missing={sorted(want - got)[:2]}"
            )

        # --- timed-out partials: view->click->purchase within 6h ---
        rows4 = keep({"view", "click", "purchase"})
        got_raw, wm = _replay(
            rows4, pat, n_batches, 53,
            compile_fn=lambda _p: (
                compile_timeout_stream("view", "click", "purchase", h),
                TIMEOUT_OUT_SCHEMA, TIMEOUT_STATE_SCHEMA,
            ),
        )
        got = {tuple(r) for r in got_raw}
        want = {
            (u, s, n, d)
            for u, s, n, d in _ref_timeouts(
                rows4, "view", "click", "purchase", h
            )
            if d // 1000 < wm  # deadline passed strictly
        }
        assert got == want and want, (
            f"timeouts n_batches={n_batches}: "
            f"extra={sorted(got - want)[:2]} "
            f"missing={sorted(want - got)[:2]}"
        )


def test_idle_evict_never_changes_emissions_on_random_streams():
    """TTL eviction soundness as a randomized invariant: for every
    within-bounded greedy pattern (including the run-close shapes,
    whose pend flag must block eviction until the closing fold), the
    idle_evict=True replay's emission set must equal the
    idle_evict=False replay's EXACTLY — eviction may only drop state
    no future match can read. The targeted parity battery pins
    crafted divergence scenarios (merged-run suppression, stub
    retention); this sweeps the invariant across random streams,
    batch cuts, and the TTL timer's interleaving with data batches."""
    rows = _random_streams(n_users=150, max_len=16, seed=733)
    n_checked = 0
    for pi, pat in enumerate(STREAM_FUZZ_PATTERNS):
        if pat.within_hours is None:
            continue  # idle_evict requires a within bound
        c_rows, c_pat = _canonicalize_ref(rows, pat)
        for n_batches in (3, 6):
            plain, wm1 = _replay(c_rows, c_pat, n_batches, 61 + pi)
            evict, wm2 = _replay(
                c_rows, c_pat, n_batches, 61 + pi,
                compile_fn=lambda p: compile_stream(p, idle_evict=True),
            )
            assert wm1 == wm2
            got_p = _strip_guard_cols(c_pat, plain)
            got_e = _strip_guard_cols(c_pat, evict)
            assert got_e == got_p, (
                f"pattern {pi} ({pat.steps}) batches={n_batches}: "
                f"evicted-run extra={sorted(got_e - got_p)[:3]} "
                f"missing={sorted(got_p - got_e)[:3]}"
            )
            assert got_p, f"degenerate sweep for {pat.steps}"
            n_checked += 1
    assert n_checked >= 10
