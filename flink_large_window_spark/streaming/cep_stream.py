"""Generic STREAMING CEP: compile any batch ``Pattern`` spec
(operators/cep.py) into an incremental keyed-state automaton —
round 12, VERDICT r11 directive 1.

Flink analogue: CEP's event-time NFA ([FLINK-API] public surface per
SURVEY §0 — the reference snapshot is empty), which detects a pattern
INCREMENTALLY with keyed state. Spark has no built-in operator for
this (window functions are unsupported on streams), so the automaton
runs in ``applyInPandasWithState``. Round 11 shipped ONE hardwired
automaton for ``V+ C{1,3} P+``; this module replaces it with a
compiler driven by the same Step/Pattern structures the batch
strategies use, so the watermark-buffered fold works for any
greedy-strategy pattern — alternation included (the canonical
relabeling is a row-local expression, applied to the stream exactly
as to a batch relation).

How the compiled automaton works (per key):

- **Watermark buffer** (unchanged from the round-11 handler —
  Flink CEP's buffering rule): arriving events are appended to a
  per-key buffer; only events the watermark has passed fold into the
  run structure, in full (ts, order_id) event-time order ACROSS
  batches. An event-time timer at the earliest held event (−1 ms)
  re-folds once a later batch advances the watermark. The residual
  hazard is an exact-millisecond tie across batches (Spark's drop
  contract is ``ts < wm`` while the fold admits ``ts_ms <= wm_ms``)
  — pinned by tests/test_streaming_parity.py::
  test_pattern_stream_exact_watermark_tie_folds_in_arrival_order.
- **Run window**: the last ``len(steps) − 1`` CLOSED maximal runs
  (class, length, start) plus the current open run — the streaming
  image of the batch greedy strategy's runs relation restricted to
  the lag frame it actually reads. NULL classes form their own runs
  (cur_len, not cur_cls, is the open-run flag).
- **Candidacy at anchor-run open**: when a run of the FINAL step's
  class opens, the closed-run window is checked against
  ``steps[:-1]`` (class equality, min ≤ len ≤ max) and the within
  bound — all fixed from that instant, because strict contiguity
  means nothing can extend a closed run. The candidate emits once
  the anchor run reaches ``min_count`` folded events (immediately at
  open for the common ``min_count=1``); the watermark has necessarily
  passed that event, which is the same emission boundary the oracle's
  closed-before-final-watermark filter encodes.

Compilable subset (validated by :func:`compile_stream`): any
greedy-strategy pattern — ranged/unbounded quantifiers, alternation,
NULL-safe runs, within bounds — plus, since round 12, each of the
batch compiler's extensions individually:

- **iterative-condition guards**: non-final guards with any aggregate
  (their runs are CLOSED at candidacy) and final-step guards
  aggregating with ``first`` (the one anchor aggregate fixed the
  instant the run opens). Guarded patterns carry the five per-run
  value aggregates in the extended state schema
  (:data:`STREAM_STATE_SCHEMA_VAL`); unguarded patterns keep the base
  schema byte-identical.
- **optional steps** (``min_count=0``, non-final): no automaton union
  — expand_optional's variants are mutually exclusive per anchor, so
  candidacy tries each variant's step list against the same
  closed-run window suffix (pattern_match_optional_stream).
- **after-match skip strategies** (to_next / no_skip): every
  (start_off, consumed-length) sub-match is fixed by the closed first
  run at anchor open, so the enumeration happens emit-locally — the
  incremental image of compile_greedy's row-local explode
  (pattern_match_afterskip_stream).
- **guards × optional steps** and **guards × skip strategies**
  (round 13 — VERDICT r12 directive 1): guard specs compile
  PER-VARIANT with indices remapped into each variant's own step
  positions (the incremental image of the batch compiler re-running
  compile_greedy per expanded variant); a guard ON a dropped optional
  step leaves that variant matching unguarded with NULL guard
  measures, exactly the batch union's fill-in
  (pattern_match_optional_guard_stream). Skip expansion is emission-
  local and guard aggregates range over maximal runs in both modes
  (the batch contract), so the two compose orthogonally
  (pattern_match_skipguard_stream).

- **final-step guards with any aggregate but 'first'** and
  **exact=True on the final step** (round 14 — the last two
  carve-outs, lifted): both range over the MAXIMAL anchor run, so
  the automaton moves THESE patterns' emission boundary from
  anchor-run OPEN to anchor-run CLOSE (the next different-class
  event on the key), where the run's length and value aggregates are
  settled facts — the deferral the absence machine has always used.
  Candidacy at run open still pins the window (pend blocks eviction);
  the deferred final-step guard and exact bounds are re-checked at
  the closing fold, and the closed anchor's maximal length joins the
  emission as ``n_<last>``. The oracle convention shifts with the
  boundary: batch SQL plus a ms-aligned run-CLOSED-before-final-
  watermark filter on the NEXT run's start
  (pattern_detect_times_exact_stream,
  pattern_match_finalguard_stream). A run never closed by a
  different-class event never emits — mirrored by the oracle's
  closing-run EXISTS.

No semantic rejections remain: every batch-compilable greedy pattern
now compiles for the stream (an optional FIRST step under a skip
strategy is rejected by Pattern itself, for both engines, because
the expansion base would differ per variant).

- **until stop conditions** (round 15 — VERDICT r14 item 5, Flink
  ``oneOrMore().until(cond)``): resolved BEFORE the machine by the
  same row-local relabel the batch compiler uses
  (``operators.cep.apply_until``, called by :func:`pattern_stream`):
  stop events arrive as a private synthetic class that closes the
  open run like any class change, so the automaton itself is
  untouched — zero new state, zero new machinery
  (pattern_detect_until_stream). compile_stream rejects an
  UNRESOLVED until explicitly (it would silently consume stop
  events into runs).

The module's SECOND machine, :func:`compile_suffix_stream` (round
14), streams the batch SUFFIX strategy — per-EVENT anchoring over
fixed-count steps, where the run-fold machine's compression is
exactly wrong (a purchase inside a longer click run matches via its
last-2-clicks suffix; the run window has no per-event positions). A
bounded window of the last W folded events (W = pattern event length
− 1, compile-time constant) decides each anchor at its own fold;
with it, EVERY batch CEP shape has a streaming twin
(pattern_detect_cep_stream closes the last documented residual).

Scale: state per key is O(pattern length) for the run window plus
O(events inside the watermark delay) for the buffer — the same bound
Flink CEP's event-time NFA keeps. No joins, no window state; the one
shuffle is the groupBy(key). Handlers never remove state mid-stream
(a run must survive batches in which its key is silent); a
long-running deployment layers an idle-key TTL on top — demonstrated
by stateful_session_ttl_stream (streams.py, round 12).
"""

from __future__ import annotations

import bisect
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.cep import (
    GUARD_CMPS,
    Guard,
    Pattern,
    Step,
    apply_until,
    canonicalize_alternation,
    expand_optional,
    repeat_group,
)
from ..registry import query
from ..scratch import scratch_dir
from .streams import (
    _events_stream,
    hold_timer_ms,
    ingest_chunk,
    run_to_memory,
    split_by_watermark,
)

#: Generic automaton state: the closed-run window (arrays, most recent
#: last, bounded at len(steps)-1), the current open run, the anchor
#: pending flag, and the watermark buffer. One schema for every
#: compiled pattern — array lengths, not column counts, carry K.
STREAM_STATE_SCHEMA = StructType(
    [
        StructField("win_cls", ArrayType(StringType())),
        StructField("win_nul", ArrayType(LongType())),
        StructField("win_len", ArrayType(LongType())),
        StructField("win_start", ArrayType(LongType())),
        StructField("cur_cls", StringType()),
        StructField("cur_nul", LongType()),
        StructField("cur_len", LongType()),
        StructField("cur_start", LongType()),
        StructField("cur_first", LongType()),
        StructField("cur_pend", LongType()),
        StructField("buf_id", ArrayType(LongType())),
        StructField("buf_us", ArrayType(LongType())),
        StructField("buf_cls", ArrayType(StringType())),
        StructField("buf_nul", ArrayType(LongType())),
    ]
)


#: Extension of STREAM_STATE_SCHEMA for GUARDED patterns: per-run
#: value aggregates (first/last/min/max/sum — the same five
#: runs_relation computes) for the closed-run window, the open run,
#: and the watermark buffer's raw values. NULL values are NaN-encoded
#: inside the double arrays (array elements survive the state store
#: either way; NaN is the unambiguous in-band choice because a real
#: NaN compares false in every guard exactly like SQL NULL).
#: Unguarded patterns keep the base schema byte-identical — the two
#: shipped round-11/12 stream keys' state layout does not change.
STREAM_STATE_SCHEMA_VAL = StructType(
    list(STREAM_STATE_SCHEMA.fields)
    + [
        StructField("win_vf", ArrayType(DoubleType())),
        StructField("win_vl", ArrayType(DoubleType())),
        StructField("win_vmn", ArrayType(DoubleType())),
        StructField("win_vmx", ArrayType(DoubleType())),
        StructField("win_vsm", ArrayType(DoubleType())),
        StructField("cur_vf", DoubleType()),
        StructField("cur_vl", DoubleType()),
        StructField("cur_vmn", DoubleType()),
        StructField("cur_vmx", DoubleType()),
        StructField("cur_vsm", DoubleType()),
        StructField("buf_val", ArrayType(DoubleType())),
    ]
)

#: Guard aggregate -> slot in the per-run value-aggregate tuple.
_VA_SLOT = {"first": 0, "last": 1, "min": 2, "max": 3, "sum": 4}


def _emit_on_close(pat: Pattern) -> bool:
    """True when the pattern's FINAL step carries semantics that range
    over the MAXIMAL anchor run — ``exact`` (the run's total length
    must sit in [min, max]) or a non-``first`` guard aggregate (it
    reads the whole run's values). Both were compile_stream
    rejections through round 13; round 14 lifts them by moving the
    emission boundary from anchor-run OPEN to anchor-run CLOSE (the
    next event of a different class on the key), where the maximal
    run is a settled fact — the same deferral the absence machine has
    always used for its watermark-proved negations (VERDICT r13 item
    4). The oracle convention shifts accordingly: batch SQL plus a
    ms-aligned run-CLOSED-before-final-watermark filter (the closing
    run's start, not the anchor run's)."""
    last = pat.steps[-1]
    # exact with max_count=None is a no-op in the batch compiler
    # (compile_greedy caps the anchor run only when a max exists), so
    # it must not shift the stream's emission boundary either
    # (review r14): the pattern is semantically the non-exact twin.
    return (last.exact and last.max_count is not None) or (
        last.guard is not None and last.guard.agg != "first"
    )


def stream_out_schema(pat: Pattern) -> StructType:
    """Emission schema for a compiled pattern: the key, the anchor
    run's first event id, one consumed-count measure per NON-final
    step (under the default run-OPEN emission the final step's
    maximal length is unknowable at emission time — the batch keys
    built on this twin likewise emit measures for steps[:-1] only;
    run-CLOSE patterns additionally emit ``n_<last>``, which their
    closed anchor run makes exact), for each guarded step the guard's
    two sides as ``g_<name>`` / ``g_<name>_ref`` (mirroring
    compile_greedy's emission), and the pattern's start/end
    timestamps in epoch µs."""
    fields = [
        StructField(pat.key, LongType()),
        StructField("anchor_event", LongType()),
    ]
    fields += [
        StructField(f"n_{s.name}", LongType()) for s in pat.steps[:-1]
    ]
    if _emit_on_close(pat):
        # run-CLOSE emission (round 14): the anchor run is closed by
        # the time the match emits, so its maximal length IS known —
        # emitted like compile_greedy's n_<last> measure
        fields.append(StructField(f"n_{pat.steps[-1].name}", LongType()))
    if pat.skip != "past_last":
        # sub-match expansion: 1-based offset of the sub-match's first
        # consumed event within the first step's run, and n_<first>
        # reinterpreted as the CONSUMED count (compile_greedy's
        # convention). pattern_start_us stays the FULL first run's
        # start — a sub-match's true start ts is not in the run window
        # (the same documented limit the batch runs relation has).
        fields.append(StructField("start_off", LongType()))
    for s in pat.steps:
        if s.guard is not None:
            fields.append(StructField(f"g_{s.name}", DoubleType()))
            fields.append(StructField(f"g_{s.name}_ref", DoubleType()))
    fields += [
        StructField("pattern_start_us", LongType()),
        StructField("pattern_end_us", LongType()),
    ]
    return StructType(fields)


def compile_stream(pat: Pattern, idle_evict: bool = False):
    """Compile a greedy-strategy Pattern into an
    ``applyInPandasWithState`` handler. Returns
    ``(handler, out_schema, STREAM_STATE_SCHEMA)``.

    The caller canonicalizes alternation on the stream FIRST (see
    :func:`pattern_stream`), so every ``Step.cls`` reaching the
    automaton is a single class string.

    ``idle_evict=True`` (round 13 — VERDICT r12 directive 7) layers
    the stateful_session_ttl_stream idle-key eviction onto the
    automaton, with the pattern's ``within`` bound as the TTL:
    requires ``within_hours``, and proves the cep_stream module
    docstring's long-promised "layer a TTL on top" claim. A key whose
    open run's within-deadline the watermark has STRICTLY passed
    (``(cur_start + within) // 1000 < wm_ms``), with no pending
    anchor and no held events, can no longer contribute its retained
    state to any future match — every retained run (the open run is
    the newest; the closed window is older still) would sit at or
    below the step-1 position of a future candidate, whose within
    check then fails by construction. Two eviction grades:

    - the open run's class is NOT a pattern class (or there is no
      open run): the state row is REMOVED outright — a separator run
      only ever occupies window slots it structurally fails, which a
      missing slot fails identically;
    - the open run's class IS a pattern class: the closed-run window
      is dropped but the open run's scalars survive as a STUB,
      because a future same-class event must EXTEND this run (strict
      contiguity has no time gaps) — full removal would restart the
      run with a fresh start timestamp and fabricate matches the
      batch oracle rejects on the merged run's true (old) start. The
      stub keeps exactly the fields that preserve that suppression:
      class, NULL flag, start (+ the value aggregates under guards).

    Eviction never touches a live partial: ``pend == 1`` (an anchor
    run awaiting min_count) blocks it, as does any held event and an
    unexpired within-deadline — pinned by
    tests/test_streaming_parity.py's idle-evict battery.

    **Residual state floor** (ADVICE r13 item 1 — "idle keys evict"
    would overstate; this is what actually remains, and why each
    piece is correctness-forced rather than a TODO):

    - a STUB-bed pattern-class key retains its O(1) scalars FOREVER,
      with no timer re-armed: maximal-run contiguity has no time
      bound, so a same-class event arriving arbitrarily late still
      EXTENDS the stubbed run, and the stub's old start must survive
      to keep merged-run candidates failing ``within`` exactly as the
      batch oracle does. There is no instant at which full removal
      becomes provably safe, hence no follow-up timer to arm.
    - a ``pend == 1`` key retains its FULL window state, also with no
      TTL timer: the pending anchor run can reach ``min_count`` via
      same-class extensions arbitrarily late (``within`` bounds the
      match's START spread, not the anchor run's extension), at which
      point emission reads the closed-run window — so neither removal
      nor a stub downgrade (which drops that window) is ever sound
      while the run stays open. The run closes only when a
      different-class event arrives, and that event re-enters the
      handler anyway — a timer would buy nothing.

    So with eviction on, worst-case retained state is O(1) per idle
    key whose LAST event is pattern-class, plus full O(pattern
    length) windows for keys sitting on a live pending anchor — the
    semantic floor of maximal-run CEP, not an implementation gap.
    Keys whose last run is a separator class (the common idle shape)
    are removed outright.
    """
    last = pat.steps[-1]
    if last.min_count == 0:
        raise ValueError(
            "the final (anchor) step cannot be optional — a pattern "
            "must end on a concrete anchor run"
        )
    # optional x skip composes since round 13: Pattern itself rejects
    # an optional FIRST step under a skip strategy (the expansion
    # base would differ per variant), and with the first step pinned
    # non-optional every variant shares the same expansion step — the
    # emit-local enumeration reads the variant's own run lengths, so
    # nothing else changes (pattern_match_optional_skip_stream).
    # Final-step exact / non-'first' final guards (round 14 — the
    # last two compile_stream carve-outs, rejected r12/r13 with the
    # maximal-anchor-run argument): both become decidable by moving
    # this pattern's emission boundary from anchor-run OPEN to
    # anchor-run CLOSE — see :func:`_emit_on_close`. Everything else
    # (candidacy, window, guards on closed runs) is unchanged; the
    # anchor's own length/aggregates are simply read after the run's
    # closing event folds instead of at its first event.
    emit_on_close = _emit_on_close(pat)
    if any(len(s.clses()) > 1 for s in pat.steps):
        raise ValueError(
            "canonicalize alternation on the stream before compiling "
            "(pattern_stream does this)"
        )
    if any(s.until is not None for s in pat.steps):
        raise ValueError(
            "resolve until stop conditions on the stream before "
            "compiling (apply_until — pattern_stream does this); an "
            "unresolved until would silently consume stop events"
        )
    if idle_evict and pat.within_hours is None:
        raise ValueError(
            "idle_evict uses the pattern's within bound as the state "
            "TTL — without one, retained runs stay matchable forever "
            "and no eviction instant is sound"
        )
    pattern_clses = frozenset(s.cls for s in pat.steps)

    # Plain-python spec (closure must pickle to executors without
    # dragging Pattern/Step class state along). Optional steps
    # (round 12) compile as VARIANTS over the SAME closed-run window:
    # expand_optional's present/absent sub-patterns are mutually
    # exclusive per anchor under maximal-run contiguity (its batch
    # proof), so candidacy tries each variant's non-final step list
    # against the window suffix and at most one matches — no automaton
    # union, no extra state; the window is sized by the FULL step
    # list. A non-optional pattern is the one-variant special case
    # (identical checks to the pre-r12 single-mids path).
    step_names = tuple(s.name for s in pat.steps[:-1])
    # After-match skip strategies (round 12): under to_next / no_skip
    # the FIRST step's max bounds the CONSUMED count, not the run
    # (compile_greedy's exact rule) — candidacy must not reject a
    # longer first run, so its max is lifted from the candidacy spec
    # and re-applied in emit()'s sub-match enumeration.
    skip_mode = pat.skip
    expand = skip_mode != "past_last" and len(pat.steps) > 1
    first = pat.steps[0]
    exp_min, exp_max = first.min_count, first.max_count

    def _mid_spec(v):
        return tuple(
            (
                s.cls,
                s.min_count,
                None if (expand and i == 0) else s.max_count,
            )
            for i, s in enumerate(v.steps[:-1])
        )

    # Guard emission order: one (g_<name>, g_<name>_ref) pair per
    # guarded step of the FULL pattern, in step order — the schema
    # every variant's rows share (a variant that DROPS a guarded
    # optional step emits NULL for its pair, the batch union's
    # convention).
    guard_names = tuple(s.name for s in pat.steps if s.guard is not None)

    def _variant_spec(v, dropped):
        """Per-variant compile: structural mids + VARIANT-LOCAL guard
        indices (round 13 — VERDICT r12 directive 1). Guard
        step-indexing formerly assumed the full step list, which is
        wrong the moment a variant drops an optional step; remapping
        into the variant's own step positions is exactly what the
        batch compiler does by re-running compile_greedy per variant
        (cep.py), expressed here as index translation because the
        automaton shares ONE closed-run window across variants."""
        v_idx = {s.name: i for i, s in enumerate(v.steps)}
        checks = tuple(
            (
                v_idx[s.name],
                _VA_SLOT[s.guard.agg],
                GUARD_CMPS[s.guard.cmp],
                v_idx[s.guard.ref_step],
                _VA_SLOT[s.guard.ref_agg],
                s.guard.factor,
            )
            for s in v.steps
            if s.guard is not None
        )
        # emission slots, aligned to guard_names (None = dropped step)
        emits = tuple(
            None
            if name in dropped
            else next(
                (
                    v_idx[s.name],
                    _VA_SLOT[s.guard.agg],
                    v_idx[s.guard.ref_step],
                    _VA_SLOT[s.guard.ref_agg],
                )
                for s in v.steps
                if s.name == name
            )
            for name in guard_names
        )
        return (
            _mid_spec(v),
            tuple(s.name for s in v.steps[:-1]),
            checks,
            emits,
            len(v.steps) - 1,
        )

    variants = tuple(
        _variant_spec(v, dropped) for v, dropped in expand_optional(pat)
    )
    k_closed = len(pat.steps) - 1
    anchor_cls = last.cls
    anchor_min = last.min_count
    anchor_max = last.max_count
    anchor_exact = last.exact
    within_us = (
        pat.within_hours * 3600 * 1_000_000
        if pat.within_hours is not None
        else None
    )
    out_schema = stream_out_schema(pat)
    out_cols = [f.name for f in out_schema.fields]
    ts_col, id_col, cls_col = pat.ts, pat.order_id, pat.cls_col
    # Iterative conditions (round 12, variant-local since round 13):
    # each variant carries its own plain-python guard spec — (this
    # step index, this agg slot, cmp, ref step index, ref agg slot,
    # factor), all indices into the VARIANT's step list (local index
    # k = its anchor = the open run). Guards are evaluated at
    # candidacy and their sides re-derived at emit from win/cur (NOT
    # cached in state): the closed window cannot shift while the
    # anchor run stays open, so a pend-ing match re-reads identical
    # values even a batch later.
    needs_val = bool(guard_names)
    val_col = pat.val_col
    state_schema = STREAM_STATE_SCHEMA_VAL if needs_val else STREAM_STATE_SCHEMA
    nan = float("nan")

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def dec(v):  # NaN-encoded NULL back to None
            return None if v is None or v != v else float(v)

        if state.exists:
            if needs_val:
                (w_cls, w_nul, w_len, w_start,
                 cc, c_nul, cl, cs, cf, pend,
                 b_id, b_us, b_cls, b_nul,
                 w_vf, w_vl, w_vmn, w_vmx, w_vsm,
                 c_vf, c_vl, c_vmn, c_vmx, c_vsm,
                 b_val) = state.get
                win = [
                    (None if n else c, int(ln), int(st),
                     (dec(vf), dec(vl), dec(mn), dec(mx), dec(sm)))
                    for c, n, ln, st, vf, vl, mn, mx, sm in zip(
                        w_cls, w_nul, w_len, w_start,
                        w_vf, w_vl, w_vmn, w_vmx, w_vsm,
                    )
                ]
                c_va = [dec(c_vf), dec(c_vl), dec(c_vmn),
                        dec(c_vmx), dec(c_vsm)]
                buf = [
                    (int(u), int(i), None if n else c, dec(v))
                    for u, i, c, n, v in zip(
                        b_us, b_id, b_cls, b_nul, b_val
                    )
                ]
            else:
                (w_cls, w_nul, w_len, w_start,
                 cc, c_nul, cl, cs, cf, pend,
                 b_id, b_us, b_cls, b_nul) = state.get
                win = [
                    (None if n else c, int(ln), int(st), None)
                    for c, n, ln, st in zip(w_cls, w_nul, w_len, w_start)
                ]
                c_va = None
                buf = [
                    (int(u), int(i), None if n else c, None)
                    for u, i, c, n in zip(b_us, b_id, b_cls, b_nul)
                ]
            if c_nul:
                cc = None
        else:
            win, buf = [], []
            cc = cl = cs = cf = c_va = None
            pend = 0
        wm_ms = state.getCurrentWatermarkMs()
        if not state.hasTimedOut:
            for chunk in pdfs:
                ingest_chunk(
                    buf, chunk, ts_col, id_col, cls_col,
                    val_col if needs_val else None,
                )
        ready, hold = split_by_watermark(buf, wm_ms)
        out = []

        def run_va(i: int, k: int, closed: bool):
            """Value aggregates of variant-local step i's run (k = the
            variant's non-final step count): closed runs from the
            window suffix; the anchor (i == k) exposes only 'first'
            while its run is still OPEN (fixed at open — the only
            anchor aggregate the open-emission mode admits), and the
            full five once the run is CLOSED (run-close emission,
            round 14)."""
            if i == k:
                if closed:
                    return tuple(c_va)
                return (c_va[0], None, None, None, None)
            return win[-k + i][3]

        def guards_ok(checks, k: int, mode: str) -> bool:
            """mode: 'open' = default open-emission candidacy (anchor
            exposes 'first'); 'defer' = close-emission candidacy at
            anchor-run OPEN (final-step guards skipped — not yet
            decidable, re-checked at close); 'close' = close-emission
            at anchor-run CLOSE (anchor exposes its full closed-run
            aggregates)."""
            for ti, ta, cmp_fn, ri, ra, factor in checks:
                if ti == k and mode == "defer":
                    continue
                lhs = run_va(ti, k, mode == "close")[ta]
                rhs = run_va(ri, k, mode == "close")[ra]
                # None (SQL NULL; NaN-encoded in state) never matches
                if lhs is None or rhs is None:
                    return False
                if not cmp_fn(lhs, rhs * factor):
                    return False
            return True

        def candidate(anchor_start_us: int, mode: str = "open") -> int:
            """Closed-run window vs each variant's non-final steps +
            the within bound + the variant's guards (indices already
            remapped into the variant's step positions) — fully
            determined the instant the anchor run opens, except a
            close-emission pattern's FINAL-step guard, which 'defer'
            skips here and 'close' settles at run close (the window
            cannot shift while the anchor run stays open, so the
            structural verdict is identical at both instants).
            Returns the matched variant index, -1 if none (at most
            one matches: the variants are mutually exclusive per
            anchor, expand_optional's proof — guards cannot break
            that, they only further FILTER a structurally-unique
            variant)."""
            for vi, (v_mids, _names, checks, _emits, k) in enumerate(
                variants
            ):
                if len(win) < k:
                    continue
                ok = True
                for (m_cls, m_min, m_max), (r_cls, r_len, _, _) in zip(
                    v_mids, win[-k:] if k else []
                ):
                    if r_cls != m_cls or r_len < m_min or (
                        m_max is not None and r_len > m_max
                    ):
                        ok = False
                        break
                if not ok:
                    continue
                if within_us is not None and k:
                    if anchor_start_us > win[-k][2] + within_us:
                        continue
                if checks and not guards_ok(checks, k, mode):
                    continue
                return vi
            return -1

        def emit() -> None:
            """Anchor run (cur) qualified: measures come from the
            closed window, which cannot shift while cur stays open —
            so the matched variant is recomputed here (a pend-ing
            match re-derives the same one even a batch later).
            Dropped optional steps emit n_<name> = 0, the batch
            union's convention. Under a non-default skip strategy the
            first run's sub-matches enumerate emit-locally — every
            (start_off, consumed-length) pair is fixed by the closed
            first run, the incremental image of compile_greedy's
            row-local explode. Under run-CLOSE emission (round 14)
            the anchor run is settled too: its final-step guard is
            re-checked here against the FULL run aggregates (the one
            check 'defer' candidacy skipped at open), and its maximal
            length joins the row as n_<last>."""
            mode = "close" if emit_on_close else "open"
            vi = candidate(cs, mode)
            if vi < 0:
                # run-close only: the deferred final-step guard
                # failed against the closed anchor run — no match
                # (structural candidacy already passed at run open,
                # and the window has not shifted since)
                return
            _mids, v_names, _checks, emits, k = variants[vi]
            lens = {
                n: win[-k + j][1] for j, n in enumerate(v_names)
            }
            head = [key[0], int(cf)]
            # run-close: n_<last> = the closed anchor run's length,
            # capped at max_count when non-exact (compile_greedy's
            # least(run_len, max) consumed-measure convention)
            n_last = []
            if emit_on_close:
                n = int(cl)
                if not anchor_exact and anchor_max is not None:
                    n = min(n, anchor_max)
                n_last = [n]
            gvals = []
            for g in emits:
                if g is None:
                    # guard ON a dropped optional step: the variant
                    # matches unguarded, NULL measures (batch union)
                    gvals += [None, None]
                else:
                    ti, ta, ri, ra = g
                    gvals.append(run_va(ti, k, mode == "close")[ta])
                    gvals.append(run_va(ri, k, mode == "close")[ra])
            start = win[-k][2] if k else cs
            tail = [int(start), int(cs)]
            if not expand:
                row = head + [int(lens.get(n, 0)) for n in step_names]
                out.append(tuple(row + n_last + gvals + tail))
                return
            l1 = int(lens[step_names[0]])
            rest = [int(lens.get(n, 0)) for n in step_names[1:]]
            for off in range(1, l1 - exp_min + 2):
                greedy = l1 - off + 1
                if exp_max is not None:
                    greedy = min(greedy, exp_max)
                if skip_mode == "to_next":
                    out.append(
                        tuple(head + [greedy] + rest + n_last + [off]
                              + gvals + tail)
                    )
                else:  # no_skip: every admissible consumed length
                    for n in range(exp_min, greedy + 1):
                        out.append(
                            tuple(head + [n] + rest + n_last + [off]
                                  + gvals + tail)
                        )

        for us, eid, cls, val in ready:
            # cur_len is the open-run flag: a NULL class is a
            # legitimate run of its own, distinct from "no run yet".
            if cl is not None and cls == cc:
                cl += 1
                if needs_val:
                    # last = value of the run's last event (NULL
                    # included — max_by semantics); min/max/sum skip
                    # NULLs like their SQL counterparts
                    c_va[1] = val
                    if val is not None:
                        c_va[2] = val if c_va[2] is None else min(c_va[2], val)
                        c_va[3] = val if c_va[3] is None else max(c_va[3], val)
                        c_va[4] = val if c_va[4] is None else c_va[4] + val
                if pend and cl == anchor_min and not emit_on_close:
                    emit()
                    pend = 0
                continue
            # class change: close the current run, shift the window,
            # open the new run. Run-CLOSE emission fires HERE — the
            # closing event settles the anchor run's maximal length
            # and full value aggregates, so exact bounds and the
            # deferred final-step guard are decidable (round 14); the
            # emission must precede the window shift (candidacy reads
            # the window WITHOUT the anchor run).
            if cl is not None:
                if (
                    emit_on_close
                    and pend
                    and cl >= anchor_min
                    and (
                        not anchor_exact
                        or anchor_max is None
                        or cl <= anchor_max
                    )
                ):
                    emit()
                win.append((cc, cl, cs, tuple(c_va) if needs_val else None))
                del win[: max(0, len(win) - k_closed)]
                pend = 0
            cc, cl, cs, cf = cls, 1, us, eid
            if needs_val:
                c_va = [val, val, val, val, val]
            if cls == anchor_cls and candidate(
                us, "defer" if emit_on_close else "open"
            ) >= 0:
                if emit_on_close:
                    # run-close emission: hold the structurally-valid
                    # candidate as pending regardless of min_count —
                    # the run's closing event (next different-class
                    # event on the key) settles it. pend also blocks
                    # idle eviction, which keeps the window this
                    # match still needs.
                    pend = 1
                elif anchor_min == 1:
                    emit()
                    pend = 0
                else:
                    pend = 1
        ttl_timer = None
        if idle_evict and not hold and not pend:
            if cl is not None and (cs + within_us) // 1000 >= wm_ms:
                # live: arm the TTL timer at the open run's within
                # deadline (clamped like hold_timer_ms) so an idle
                # key re-enters the handler to evict itself
                ttl_timer = max((cs + within_us) // 1000, wm_ms + 1)
            elif cl is None or cc not in pattern_clses:
                # separator (or empty) state: remove outright — see
                # compile_stream's docstring for the safety argument
                if state.exists:
                    state.remove()
                yield pd.DataFrame(
                    {c: [r[i] for r in out]
                     for i, c in enumerate(out_cols)}
                )
                return
            else:
                # pattern-class open run past its deadline: STUB —
                # drop the closed-run window, keep the open run's
                # scalars (a future same-class event extends this
                # run; its old start must survive so merged-run
                # candidates keep failing within, matching batch)
                win = []
        base = (
            ["" if r[0] is None else r[0] for r in win],
            [1 if r[0] is None else 0 for r in win],
            [r[1] for r in win],
            [r[2] for r in win],
            "" if cc is None else cc,
            1 if (cl is not None and cc is None) else 0,
            cl, cs, cf, pend,
            [e[1] for e in hold],
            [e[0] for e in hold],
            ["" if e[2] is None else e[2] for e in hold],
            [1 if e[2] is None else 0 for e in hold],
        )
        if needs_val:
            def enc(v):
                return nan if v is None else float(v)

            cur = c_va if c_va is not None else (None,) * 5
            base = base + tuple(
                [[enc(r[3][k]) for r in win] for k in range(5)]
                + [enc(cur[k]) for k in range(5)]
                + [[enc(e[3]) for e in hold]]
            )
        state.update(base)
        if hold:
            state.setTimeoutTimestamp(hold_timer_ms(hold, wm_ms))
        elif ttl_timer is not None:
            state.setTimeoutTimestamp(ttl_timer)
        yield pd.DataFrame(
            {c: [r[i] for r in out] for i, c in enumerate(out_cols)}
        )

    return handler, out_schema, state_schema


def pattern_stream(
    spark: SparkSession,
    sf_dir: str,
    pat: Pattern,
    watermark: str = "10 minutes",
    checkpoint: str | None = None,
) -> DataFrame:
    """events.parquet as a bounded replay → resolve until stop
    conditions + canonicalize alternation (both row-local projections,
    streaming-safe) → compiled automaton → memory sink.

    ``checkpoint`` passes through to run_to_memory so state-reader
    keys can re-open the finished query's store offline WITHOUT
    copying this launch block (the ADVICE r13 lesson one layer up —
    a hand-rolled copy in stream_state_reader_automaton had already
    dropped the has_until column rule it never knew about; review
    r15)."""
    has_guard = any(s.guard is not None for s in pat.steps)
    has_until = any(s.until is not None for s in pat.steps)
    cols = [pat.key, pat.ts, pat.order_id, pat.cls_col]
    if pat.val_col is not None and (has_guard or has_until):
        cols.append(pat.val_col)
    ev = (
        _events_stream(spark, sf_dir)
        .withWatermark(pat.ts, watermark)
        .select(*cols)
    )
    if has_until:
        # Pure relabel projection (operators/cep.py round 15) — the
        # automaton then sees a plain pattern, with stop events as
        # foreign-class run boundaries; the value column was only
        # needed for the relabel unless guards read it too.
        ev, pat = apply_until(ev, pat)
        if not has_guard:
            ev = ev.drop(pat.val_col)
    if any(len(s.clses()) > 1 for s in pat.steps):
        ev, pat = canonicalize_alternation(ev, pat)
    handler, out_schema, state_schema = compile_stream(pat)
    result = ev.groupBy(pat.key).applyInPandasWithState(
        handler,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return run_to_memory(spark, result, mode="append", checkpoint=checkpoint)


@query(
    "pattern_match_recognize_stream",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM events
    ), runs AS (
      SELECT user_id, event_type,
             MIN(ts) AS run_start, COUNT(*) AS run_len,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_start, run_len, first_id,
             LAG(event_type, 1) OVER w AS c1, LAG(run_len, 1) OVER w AS l1,
             LAG(event_type, 2) OVER w AS c2, LAG(run_len, 2) OVER w AS l2,
             LAG(run_start, 2) OVER w AS s2
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    )
    SELECT user_id,
           first_id AS purchase_event,
           CAST(l2 AS BIGINT) AS n_views,
           CAST(l1 AS BIGINT) AS n_clicks,
           epoch_us(s2) AS pattern_start_us,
           epoch_us(run_start) AS pattern_end_us
    FROM seq
    WHERE event_type = 'purchase'
      AND c1 = 'click' AND l1 BETWEEN 1 AND 3
      AND c2 = 'view'
      AND run_start <= s2 + INTERVAL 24 HOUR
      AND epoch_us(run_start) // 1000
          <= epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000
    """,
)
def pattern_match_recognize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the generic-CEP showcase: the SAME pattern
    spec as pattern_match_recognize (``PATTERN (V+ C{1,3} P+)`` within
    24 h, maximal-run semantics — operators/cep.py) detected
    INCREMENTALLY with keyed state. Since round 12 the automaton is
    COMPILED from the Step/Pattern spec by :func:`compile_stream` (the
    round-11 handler hardwired this one shape — VERDICT r11 directive
    1); the compiled fold is behavior-identical for this pattern
    (watermark buffer, run window, candidacy at anchor-run open,
    emission at the fold that passes the anchor), so the oracle — the
    batch SQL plus the ms-aligned closed-before-final-watermark filter
    — is unchanged from round 11.

    Scale: see the module docstring — O(pattern length) run-window
    state plus O(watermark delay) buffered events per key, one
    shuffle.
    """
    pat = Pattern(
        steps=(
            Step("views", "view", 1, None),
            Step("clicks", "click", 1, 3),
            Step("purchase", "purchase", 1, None),
        ),
        within_hours=24,
    )
    m = pattern_stream(spark, sf_dir, pat)
    return m.select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        "n_views",
        "n_clicks",
        "pattern_start_us",
        "pattern_end_us",
    )


@query(
    "pattern_match_alternation_stream",
    oracle="""
    WITH relabeled AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type IN ('click', 'view')
                  THEN 'click' || chr(31) || 'view'
                  ELSE event_type END AS event_type
      FROM events
    ), ordered AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM relabeled
    ), runs AS (
      SELECT user_id, event_type,
             MIN(ts) AS run_start, COUNT(*) AS run_len,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_start, run_len, first_id,
             LAG(event_type, 1) OVER w AS c1, LAG(run_len, 1) OVER w AS l1,
             LAG(run_start, 1) OVER w AS s1
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    )
    SELECT user_id,
           first_id AS purchase_event,
           CAST(l1 AS BIGINT) AS n_eng,
           epoch_us(s1) AS pattern_start_us,
           epoch_us(run_start) AS pattern_end_us
    FROM seq
    WHERE event_type = 'purchase'
      AND c1 = 'click' || chr(31) || 'view'
      AND run_start <= s1 + INTERVAL 24 HOUR
      AND epoch_us(run_start) // 1000
          <= epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000
    """,
)
def pattern_match_alternation_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_match_alternation —
    ``PATTERN ((V|C)+ P+)`` within 24 h, incremental (round 12,
    VERDICT r11 directive 1's done-criterion). Alternation costs the
    stream NOTHING extra: canonicalize_alternation's relabel is a
    row-local expression applied to the streaming DataFrame before the
    keyed fold (exactly as the batch key fuses it into the scan), so
    the compiled automaton sees single-class runs — a mixed view/click
    run is ONE run whose n_eng spans both classes, and an interleaved
    error still breaks contiguity. The oracle applies the identical
    relabel (the CASE map) plus the same ms-aligned watermark filter
    as pattern_match_recognize_stream; multi-batch parity is pinned by
    tests/test_streaming_parity.py (2- and 3-way time-split replays
    through the real compiled handler).
    """
    pat = Pattern(
        steps=(
            Step("eng", ("view", "click"), 1, None),
            Step("purchase", "purchase", 1, None),
        ),
        within_hours=24,
    )
    m = pattern_stream(spark, sf_dir, pat)
    return m.select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        "n_eng",
        "pattern_start_us",
        "pattern_end_us",
    )


@query(
    "pattern_detect_value_guard_stream",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM events
    ), runs AS (
      SELECT user_id, event_type,
             MIN(ts) AS run_start, COUNT(*) AS run_len,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id,
             ARG_MIN(value, rn) AS val_first, MAX(value) AS val_max
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_start, run_len, first_id, val_first,
             LAG(event_type, 1) OVER w AS c1, LAG(run_len, 1) OVER w AS l1,
             LAG(run_start, 1) OVER w AS s1, LAG(val_max, 1) OVER w AS m1
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    )
    SELECT user_id,
           first_id AS purchase_event,
           CAST(l1 AS BIGINT) AS n_views,
           ROUND(val_first, 4) AS purchase_val,
           ROUND(m1, 4) AS views_max_val,
           epoch_us(s1) AS pattern_start_us,
           epoch_us(run_start) AS pattern_end_us
    FROM seq
    WHERE event_type = 'purchase'
      AND c1 = 'view'
      AND val_first > m1
      AND run_start <= s1 + INTERVAL 24 HOUR
      AND epoch_us(run_start) // 1000
          <= epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000
    """,
)
def pattern_detect_value_guard_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_detect_value_guard — the iterative
    condition ([FLINK-API] ``IterativeCondition``) evaluated
    INCREMENTALLY: ``PATTERN (V+ P+)`` within 24 h where the purchase
    matches only if its value exceeds the max value across the
    preceding view run (round 12, extending VERDICT r11 directives
    1+2 into the compiled automaton).

    Why this is streamable at all: the guard's reference side (max
    over the view run) ranges over a CLOSED run — fixed the moment
    the anchor run opens — and its anchor side aggregates with
    'first', the one aggregate knowable at that same instant
    (compile_stream rejects any other anchor aggregate with the
    maximal-run explanation). The automaton therefore needs only the
    five per-run value aggregates riding the closed-run window state
    (STREAM_STATE_SCHEMA_VAL) — no event values are retained beyond
    the watermark buffer, so per-key state stays O(pattern length +
    watermark delay) exactly as the unguarded automaton.

    Oracle = the batch key's SQL (same runs algebra, same guard
    conjunction) with µs timestamps plus the ms-aligned
    closed-before-final-watermark filter, the convention every
    compiled stream key shares. Guard sides emit as purchase_val /
    views_max_val (rounded 4dp both engines — the float-output rule).
    Multi-batch parity is pinned in tests/test_streaming_parity.py
    (the guard case joined the compiled-handler sweep).
    """
    pat = Pattern(
        steps=(
            Step("views", "view", 1, None),
            Step(
                "purchase",
                "purchase",
                1,
                None,
                guard=Guard("first", ">", "views", "max"),
            ),
        ),
        within_hours=24,
        val_col="value",
    )
    m = pattern_stream(spark, sf_dir, pat)
    return m.select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        "n_views",
        F.round("g_purchase", 4).alias("purchase_val"),
        F.round("g_purchase_ref", 4).alias("views_max_val"),
        "pattern_start_us",
        "pattern_end_us",
    )


@query(
    "pattern_match_optional_stream",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM events
    ), runs AS (
      SELECT user_id, event_type,
             MIN(ts) AS run_start, COUNT(*) AS run_len,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_start, run_len, first_id,
             LAG(event_type, 1) OVER w AS c1, LAG(run_len, 1) OVER w AS l1,
             LAG(run_start, 1) OVER w AS s1,
             LAG(event_type, 2) OVER w AS c2, LAG(run_len, 2) OVER w AS l2,
             LAG(run_start, 2) OVER w AS s2
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    ), wm AS (
      SELECT epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000 AS ms
    )
    SELECT user_id, first_id AS purchase_event,
           CAST(l2 AS BIGINT) AS n_views,
           CAST(1 AS BIGINT) AS n_clicks,
           epoch_us(s2) AS pattern_start_us,
           epoch_us(run_start) AS pattern_end_us
    FROM seq, wm
    WHERE event_type = 'purchase'
      AND c1 = 'click' AND l1 = 1
      AND c2 = 'view'
      AND run_start <= s2 + INTERVAL 24 HOUR
      AND epoch_us(run_start) // 1000 <= wm.ms
    UNION ALL
    SELECT user_id, first_id AS purchase_event,
           CAST(l1 AS BIGINT) AS n_views,
           CAST(0 AS BIGINT) AS n_clicks,
           epoch_us(s1) AS pattern_start_us,
           epoch_us(run_start) AS pattern_end_us
    FROM seq, wm
    WHERE event_type = 'purchase'
      AND c1 = 'view'
      AND run_start <= s1 + INTERVAL 24 HOUR
      AND epoch_us(run_start) // 1000 <= wm.ms
    """,
)
def pattern_match_optional_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_match_optional — ``PATTERN
    (V+ C? P+)`` within 24 h detected incrementally (round 12; closes
    the 'optional steps are expansion-based, out of scope' carve-out
    the module docstring used to declare).

    No automaton union is needed: expand_optional's present/absent
    variants are mutually exclusive PER ANCHOR under maximal-run
    contiguity (its batch proof), so the compiled handler simply tries
    each variant's non-final step list against the suffix of the SAME
    closed-run window at candidacy — one extra tuple comparison per
    anchor open, zero extra state (the window is already sized by the
    full step list). The absent variant emits ``n_clicks = 0``,
    mirroring the batch union's fill-in. Oracle = the batch key's
    two-branch UNION with µs timestamps plus the shared ms-aligned
    watermark filter on both branches.
    """
    pat = Pattern(
        steps=(
            Step("views", "view", 1, None),
            Step("clicks", "click", 0, 1),
            Step("purchase", "purchase", 1, None),
        ),
        within_hours=24,
    )
    m = pattern_stream(spark, sf_dir, pat)
    return m.select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        "n_views",
        "n_clicks",
        "pattern_start_us",
        "pattern_end_us",
    )


@query(
    "pattern_match_afterskip_stream",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM events
    ), runs AS (
      SELECT user_id, event_type, COUNT(*) AS run_len,
             MIN(ts) AS run_start,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_len, run_start, first_id,
             LAG(event_type, 1) OVER w AS c1, LAG(run_len, 1) OVER w AS l1
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    ), matches AS (
      SELECT user_id, first_id, CAST(l1 AS INT) AS l1
      FROM seq
      WHERE event_type = 'purchase' AND c1 = 'click' AND l1 >= 2
        AND epoch_us(run_start) // 1000
            <= epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000
    ), starts AS (
      SELECT user_id, first_id, l1,
             UNNEST(generate_series(1, l1 - 1)) AS start_off
      FROM matches
    )
    SELECT user_id,
           first_id AS purchase_event,
           CAST(start_off AS BIGINT) AS start_off,
           CAST(UNNEST(generate_series(2, LEAST(4, l1 - start_off + 1)))
                AS BIGINT) AS n_clicks
    FROM starts
    """,
)
def pattern_match_afterskip_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_match_afterskip — ``PATTERN (C{2,4}
    P+)`` under ``AfterMatchSkipStrategy.noSkip``, detected
    incrementally (round 12; closes the last composable carve-out in
    the compiled automaton — only maximal-run-dependent semantics,
    final-step exact/non-'first' guards, remain batch-only by
    necessity).

    Every (start_off, consumed-length) sub-match is fixed by the
    CLOSED first run the moment the anchor run opens, so the
    enumeration happens emit-locally inside the handler — the
    incremental image of compile_greedy's row-local
    explode(sequence(..)) — with zero extra state and the same
    one-candidacy-per-anchor cost as past_last; only the emitted rows
    fan out (bounded by the quantifier width × run length, exactly the
    batch fan-out). The first step's ``max_count=4`` bounds CONSUMED
    counts, not the run, so candidacy lifts it and emit re-applies it
    per sub-match — the compile_greedy rule. Oracle = the batch key's
    enumeration SQL with the ms-aligned watermark filter on the anchor
    run's start.
    """
    pat = Pattern(
        steps=(
            Step("clicks", "click", 2, 4),
            Step("purchase", "purchase", 1, None),
        ),
        skip="no_skip",
    )
    m = pattern_stream(spark, sf_dir, pat)
    return m.select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        "start_off",
        F.col("n_clicks").cast("long").alias("n_clicks"),
    )


# ---------------------------------------------------------------------------
# Absence CEP (Flink ``notFollowedBy(..).within(..)``) — round 12.
#
# Negation is the one CEP shape the compiled run-fold automaton above
# cannot express: a match is declared by the ABSENCE of an event, so
# emission must wait until the watermark proves nothing in the horizon
# can still arrive — Flink's NFA keeps such candidates in a pending
# state and resolves them on watermark advance. The automaton below is
# that pending-state machine directly, and it is SIMPLER than the
# run-fold: existence of a purchase inside a click's horizon is
# order-insensitive, so no watermark hold-buffer / re-fold is needed —
# in-watermark out-of-order arrivals just accumulate into the pending
# sets, and a click can only resolve >= horizon after its own event
# time, by which point every in-frame purchase either arrived or is
# watermark-late (dropped upstream by the same ``ts < wm`` contract
# the resolution rule is aligned to).

#: Pending-state schema for the absence automaton: unresolved clicks
#: (µs + event_id, parallel arrays) and the retained purchase
#: timestamps (µs). Purchases older than horizon + watermark-delay
#: can no longer suppress anything and are evicted — state per key is
#: O(events inside horizon + watermark delay), Flink's NFA bound for
#: a within-bounded notFollowedBy.
ABSENCE_STATE_SCHEMA = StructType(
    [
        StructField("click_us", ArrayType(LongType())),
        StructField("click_id", ArrayType(LongType())),
        StructField("purch_us", ArrayType(LongType())),
    ]
)

ABSENCE_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("click_event", LongType()),
    ]
)


def compile_absence_stream(
    anchor_cls: str, absent_cls: str, horizon_us: int
):
    """Build the pending-state handler for ``anchor NOT FOLLOWED BY
    absent WITHIN horizon`` (frame ``[anchor_ts, anchor_ts + horizon]``
    inclusive at µs precision — the batch key's RANGE frame).

    Resolution rule: an anchor emits/suppresses only once
    ``(anchor_us + horizon_us) // 1000 < wm_ms`` (STRICT): any
    not-yet-arrived suppressor has ``ts_ms >= wm_ms`` (Spark admits
    the ``ts == wm`` tie), hence ``ts_us >= wm_ms*1000 >
    anchor_us + horizon_us`` — outside the frame. The matching oracle
    filter is the ms-aligned ``(epoch_us(ts) + horizon) // 1000 <
    final_wm_ms``.
    """

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            c_us, c_id, p_us = state.get
            clicks = [(int(u), int(i)) for u, i in zip(c_us, c_id)]
            purchases = [int(u) for u in p_us]
        else:
            clicks, purchases = [], []
        wm_ms = state.getCurrentWatermarkMs()
        if not state.hasTimedOut:
            for chunk in pdfs:
                for ts, eid, cls in zip(
                    chunk["ts"], chunk["event_id"], chunk["event_type"]
                ):
                    us = int(ts.value) // 1_000
                    if cls == anchor_cls:
                        clicks.append((us, int(eid)))
                    elif cls == absent_cls:
                        purchases.append(us)
        # Resolve every anchor whose horizon the watermark has passed:
        # emit iff no retained suppressor lands inside its frame.
        # Suppressors sort once per invocation and each anchor probes
        # by bisect (ADVICE r12 item 2) — O((A + P)·log P), not
        # O(A·P), under a key-skewed watermark-delay backlog.
        emitted, pending = [], []
        purchases.sort()
        for us, eid in clicks:
            if (us + horizon_us) // 1000 < wm_ms:
                i = bisect.bisect_left(purchases, us)
                if i == len(purchases) or purchases[i] > us + horizon_us:
                    emitted.append((key[0], eid))
            else:
                pending.append((us, eid))
        # Evict suppressors no pending or future anchor can reach:
        # a pending anchor has (us + horizon_us) // 1000 >= wm_ms,
        # which for non-negative ints is exactly us >= wm_ms*1000 −
        # horizon_us; a future anchor folds from the hold buffer
        # (us // 1000 > wm_ms) or a later batch, so its us exceeds
        # wm_ms*1000 outright. Suppression needs p_us >= anchor_us,
        # so the exact floor is sound (ADVICE r13 item 4: the former
        # −999 µs slack was dead conservatism inconsistent with
        # compile_pairs_stream's exact floor).
        floor_us = wm_ms * 1000 - horizon_us
        purchases = [p for p in purchases if p >= floor_us]
        state.update(
            (
                [u for u, _ in pending],
                [i for _, i in pending],
                purchases,
            )
        )
        if pending:
            # shares hold_timer_ms's API-forced clamp residual (the
            # wm_ms + 1 floor) — see its docstring for the boundary
            state.setTimeoutTimestamp(
                max(
                    min((u + horizon_us) // 1000 for u, _ in pending),
                    wm_ms + 1,
                )
            )
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in emitted],
                "click_event": [r[1] for r in emitted],
            }
        )

    return handler


@query(
    "pattern_detect_notfollowedby_stream",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN CURRENT ROW AND INTERVAL 6 HOUR FOLLOWING
             ) AS purchases_6h
      FROM events
    )
    SELECT user_id, event_id AS click_event
    FROM flagged
    WHERE event_type = 'click' AND purchases_6h = 0
      AND (epoch_us(ts) + 21600000000) // 1000
          < epoch_us((SELECT MAX(ts) FROM events
                      WHERE event_type IN ('click', 'purchase'))) // 1000
            - 600000
    """,
)
def pattern_detect_notfollowedby_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_detect_notfollowedby — abandoned
    clicks (no same-user purchase in the following 6 h) detected
    INCREMENTALLY, the Flink ``notFollowedBy(..).within(6h)`` pending
    NFA state (round 12; the one CEP shape the compiled run-fold
    automaton cannot express, because the match is declared by
    ABSENCE and must wait for the watermark to prove it).

    A click becomes a pending candidate on arrival; an event-time
    timer at its horizon (click_ts + 6 h) resolves it once the
    watermark passes — suppressed if any purchase landed inside the
    frame, emitted otherwise. Purchases retain for horizon +
    watermark-delay then evict, so per-key state is O(events in 6 h +
    10 min), Flink's bound for a within-bounded negation. The oracle
    is the batch key's zero-count SQL plus the ms-aligned
    horizon-closed-before-final-watermark filter (a strict ``<``: see
    :func:`compile_absence_stream` for the tie argument — this is the
    absence analogue of the run-fold keys' ``<=`` anchor filter).

    Scale: irrelevant classes are filtered BEFORE the keyed shuffle
    (predicate reaches the file-source scan), so only click/purchase
    rows shuffle — and the watermark is declared AFTER the filter, so
    it advances on the max of the rows the operator actually sees.
    (Declaring it before the filter is NOT equivalent-but-safer:
    Catalyst pushes the class predicate below EventTimeWatermark, so
    the stats node measures filtered rows anyway while the oracle
    would be keyed to the unfiltered MAX(ts) — a 1-row tail mismatch
    observed at sf0.01. Explicit placement makes the semantics the
    oracle mirrors — ``MAX(ts) over click/purchase`` — deterministic
    rather than an optimizer artifact.) One shuffle on user_id, no
    joins, no window state.
    """
    ev = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
        .withWatermark("ts", "10 minutes")
    )
    handler = compile_absence_stream("click", "purchase", 6 * 3600 * 1_000_000)
    result = ev.groupBy("user_id").applyInPandasWithState(
        handler,
        outputStructType=ABSENCE_OUT_SCHEMA,
        stateStructType=ABSENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return run_to_memory(spark, result, mode="append")


#: Horizon-counting state (pattern_detect_followedby_stream): pending
#: anchors (µs + event_id) and retained target timestamps (µs) —
#: the absence machine's schema, reused shape-for-shape.
HORIZON_STATE_SCHEMA = StructType(
    [
        StructField("anchor_us", ArrayType(LongType())),
        StructField("anchor_id", ArrayType(LongType())),
        StructField("target_us", ArrayType(LongType())),
    ]
)

HORIZON_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("purchase_event", LongType()),
        StructField("clicks_6h", LongType()),
    ]
)


def compile_horizon_count_stream(
    anchor_cls: str, target_cls: str, horizon_us: int, at_least: int
):
    """Handler for PRECEDING-horizon counting (Flink ``followedBy``
    with a time bound): each anchor counts targets inside
    ``[anchor_ts − horizon, anchor_ts]`` (inclusive — the batch RANGE
    frame) and emits when the count reaches ``at_least``.

    A PRECEDING horizon resolves faster than the absence machine's
    FOLLOWING one: the anchor settles as soon as ``a_ms < wm_ms`` —
    any unseen target has ``t_ms >= wm_ms > a_ms``, hence
    ``t_us >= wm_ms·1000 > a_us`` — strictly after the anchor,
    outside its frame. Target retention mirrors the absence machine:
    evict below ``wm_ms·1000 − horizon_us`` (nothing pending or
    future can reach further back), so per-key state is O(events in
    horizon + watermark delay)."""

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            a_us, a_id, t_us = state.get
            anchors = [(int(u), int(i)) for u, i in zip(a_us, a_id)]
            targets = [int(u) for u in t_us]
        else:
            anchors, targets = [], []
        wm_ms = state.getCurrentWatermarkMs()
        if not state.hasTimedOut:
            for chunk in pdfs:
                for ts, eid, cls in zip(
                    chunk["ts"], chunk["event_id"], chunk["event_type"]
                ):
                    us = int(ts.value) // 1_000
                    if cls == anchor_cls:
                        anchors.append((us, int(eid)))
                    elif cls == target_cls:
                        targets.append(us)
        # Targets sort once per invocation, each anchor counts its
        # frame by two bisects (ADVICE r12 item 2) — O((A + T)·log T).
        emitted, pending = [], []
        targets.sort()
        for us, eid in anchors:
            if us // 1000 < wm_ms:
                n = bisect.bisect_right(targets, us) - bisect.bisect_left(
                    targets, us - horizon_us
                )
                if n >= at_least:
                    emitted.append((key[0], eid, n))
            else:
                pending.append((us, eid))
        floor_us = wm_ms * 1000 - horizon_us
        targets = [t for t in targets if t >= floor_us]
        state.update(
            (
                [u for u, _ in pending],
                [i for _, i in pending],
                targets,
            )
        )
        if pending:
            # shares hold_timer_ms's API-forced clamp residual (the
            # wm_ms + 1 floor) — see its docstring for the boundary
            state.setTimeoutTimestamp(
                max(min(u for u, _ in pending) // 1000, wm_ms + 1)
            )
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in emitted],
                "purchase_event": [r[1] for r in emitted],
                "clicks_6h": [r[2] for r in emitted],
            }
        )

    return handler


@query(
    "pattern_detect_followedby_stream",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW
             ) AS clicks_6h
      FROM events
    )
    SELECT user_id, event_id AS purchase_event,
           CAST(clicks_6h AS BIGINT) AS clicks_6h
    FROM flagged
    WHERE event_type = 'purchase' AND clicks_6h >= 2
      AND epoch_us(ts) // 1000
          < epoch_us((SELECT MAX(ts) FROM events
                      WHERE event_type IN ('click', 'purchase'))) // 1000
            - 600000
    """,
)
def pattern_detect_followedby_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_detect_followedby — relaxed-
    contiguity CEP (Flink ``followedBy`` with a 6 h bound): purchases
    preceded by ≥2 same-user clicks within 6 hours, detected
    incrementally. Completes the horizon strategy's streaming story:
    the FOLLOWING direction (absence) ships as
    pattern_detect_notfollowedby_stream; this is the PRECEDING
    direction (counting), which settles the moment the watermark
    passes the anchor itself — no horizon wait — because every
    in-frame click is provably already ingested
    (:func:`compile_horizon_count_stream`). Same filtered-stream
    watermark convention (classes filter before the shuffle, the
    oracle's final-watermark term ranges over click/purchase rows);
    ties match the batch RANGE frame (a click at the purchase's exact
    timestamp counts). O(events in 6 h + 10 min) state per key.
    """
    ev = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
        .withWatermark("ts", "10 minutes")
    )
    handler = compile_horizon_count_stream(
        "purchase", "click", 6 * 3600 * 1_000_000, 2
    )
    result = ev.groupBy("user_id").applyInPandasWithState(
        handler,
        outputStructType=HORIZON_OUT_SCHEMA,
        stateStructType=HORIZON_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return run_to_memory(spark, result, mode="append")


@query(
    "pattern_detect_oneormore_stream",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM events
    ), runs AS (
      SELECT user_id, event_type,
             MIN(ts) AS run_start, COUNT(*) AS run_len,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_start, first_id,
             LAG(event_type, 1) OVER w AS c1,
             LAG(run_len, 1)    OVER w AS l1,
             LAG(run_start, 1)  OVER w AS s1
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    )
    SELECT user_id,
           first_id AS purchase_event,
           CAST(l1 AS BIGINT) AS n_clicks,
           epoch_us(s1) AS pattern_start_us,
           epoch_us(run_start) AS pattern_end_us
    FROM seq
    WHERE event_type = 'purchase' AND c1 = 'click'
      AND run_start <= s1 + INTERVAL 6 HOUR
      AND epoch_us(run_start) // 1000
          <= epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000
    """,
)
def pattern_detect_oneormore_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_detect_oneormore — ``C+ P`` within
    6 h (Flink ``oneOrMore().greedy()``), detected incrementally by
    the compiled automaton. Nothing new in the machine: the spec is
    the alternation twin's shape minus the class set, so this key's
    value is COVERAGE — every batch pattern_detect_* key the generic
    compiler serves now has a driver-checkable streaming twin or a
    documented reason it cannot (final-step exact / maximal-anchor
    semantics). Oracle = the batch key's runs algebra re-expressed in
    the runs-lag form the other twins use + the ms-aligned watermark
    filter.
    """
    pat = Pattern(
        steps=(
            Step("clicks", "click", 1, None),
            Step("buy", "purchase", 1, None),
        ),
        within_hours=6,
    )
    m = pattern_stream(spark, sf_dir, pat)
    return m.select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        "n_clicks",
        "pattern_start_us",
        "pattern_end_us",
    )


@query(
    "pattern_detect_times_stream",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM events
    ), runs AS (
      SELECT user_id, event_type,
             MIN(ts) AS run_start, COUNT(*) AS run_len,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_start, first_id,
             LAG(event_type, 1) OVER w AS c1,
             LAG(run_len, 1)    OVER w AS l1,
             LAG(run_start, 1)  OVER w AS s1
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    )
    SELECT user_id,
           first_id AS purchase_event,
           epoch_us(s1) AS pattern_start_us,
           epoch_us(run_start) AS pattern_end_us
    FROM seq
    WHERE event_type = 'purchase' AND c1 = 'click' AND l1 = 2
      AND run_start <= s1 + INTERVAL 6 HOUR
      AND epoch_us(run_start) // 1000
          <= epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000
    """,
)
def pattern_detect_times_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_detect_times — EXACTLY two
    consecutive clicks then a purchase within 6 h (Flink
    ``times(2).consecutive()``). The exactness lives on a NON-final
    step, which the incremental automaton supports (the click run is
    CLOSED at candidacy, so ``run_len == 2`` is checkable — only
    FINAL-step exactness is impossible incrementally, the documented
    carve-out in :func:`compile_stream`). Oracle: the maximal-run
    ``l1 = 2`` IS times(2)-with-exactness in the runs algebra; the
    batch key's lag formulation (prev3-guard) is row-equal.
    """
    pat = Pattern(
        steps=(
            Step("clicks", "click", 2, 2, exact=True),
            Step("buy", "purchase", 1, None),
        ),
        within_hours=6,
    )
    m = pattern_stream(spark, sf_dir, pat)
    return m.select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        "pattern_start_us",
        "pattern_end_us",
    )


@query(
    "pattern_match_optional_guard_stream",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM events
    ), runs AS (
      SELECT user_id, event_type,
             MIN(ts) AS run_start, COUNT(*) AS run_len,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id,
             ARG_MIN(value, rn) AS val_first, MIN(value) AS val_min
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_start, run_len, first_id,
             LAG(event_type, 1) OVER w AS c1, LAG(run_len, 1) OVER w AS l1,
             LAG(run_start, 1) OVER w AS s1, LAG(val_first, 1) OVER w AS f1,
             LAG(event_type, 2) OVER w AS c2, LAG(run_len, 2) OVER w AS l2,
             LAG(run_start, 2) OVER w AS s2, LAG(val_min, 2) OVER w AS m2
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    ), wm AS (
      SELECT epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000 AS ms
    )
    SELECT user_id, first_id AS purchase_event,
           CAST(l2 AS BIGINT) AS n_views,
           CAST(1 AS BIGINT) AS n_clicks,
           ROUND(f1, 4) AS click_val,
           ROUND(m2, 4) AS views_min_val,
           epoch_us(s2) AS pattern_start_us,
           epoch_us(run_start) AS pattern_end_us
    FROM seq, wm
    WHERE event_type = 'purchase'
      AND c1 = 'click' AND l1 = 1
      AND c2 = 'view'
      AND f1 > m2
      AND run_start <= s2 + INTERVAL 24 HOUR
      AND epoch_us(run_start) // 1000 <= wm.ms
    UNION ALL
    SELECT user_id, first_id AS purchase_event,
           CAST(l1 AS BIGINT) AS n_views,
           CAST(0 AS BIGINT) AS n_clicks,
           CAST(NULL AS DOUBLE) AS click_val,
           CAST(NULL AS DOUBLE) AS views_min_val,
           epoch_us(s1) AS pattern_start_us,
           epoch_us(run_start) AS pattern_end_us
    FROM seq, wm
    WHERE event_type = 'purchase'
      AND c1 = 'view'
      AND run_start <= s1 + INTERVAL 24 HOUR
      AND epoch_us(run_start) // 1000 <= wm.ms
    """,
)
def pattern_match_optional_guard_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_match_optional_guard — the guard ×
    optional composition detected INCREMENTALLY (round 13, VERDICT
    r12 directive 1: the last implementable carve-out in
    :func:`compile_stream`, lifted by per-variant guard remapping).

    What the remapping buys: guard specs compile with indices into
    each VARIANT's step positions, so the present variant evaluates
    ``first(click run) > min(view run)`` against the correct window
    slots while the absent variant — whose guard sits ON the dropped
    optional step — matches unguarded and emits NULL guard measures,
    the batch union's fill-in. Both decisions stay fixed at anchor-run
    open (the click and view runs are CLOSED by then), so the
    emission boundary and the oracle's watermark filter are unchanged
    from the unguarded optional twin. Oracle = the batch key's
    two-branch UNION with µs timestamps, the guard conjunct on the
    present branch, and the shared ms-aligned
    closed-before-final-watermark filter.

    Scale: see the module docstring — the guarded state schema adds
    five per-run aggregates to the O(pattern length) window; no event
    values retained beyond the watermark buffer.
    """
    pat = Pattern(
        steps=(
            Step("views", "view", 1, None),
            Step(
                "clicks",
                "click",
                0,
                1,
                guard=Guard("first", ">", "views", "min"),
            ),
            Step("purchase", "purchase", 1, None),
        ),
        within_hours=24,
        val_col="value",
    )
    m = pattern_stream(spark, sf_dir, pat)
    return m.select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        "n_views",
        "n_clicks",
        F.round("g_clicks", 4).alias("click_val"),
        F.round("g_clicks_ref", 4).alias("views_min_val"),
        "pattern_start_us",
        "pattern_end_us",
    )


@query(
    "pattern_match_skipguard_stream",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM events
    ), runs AS (
      SELECT user_id, event_type, COUNT(*) AS run_len,
             MIN(ts) AS run_start,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id,
             ARG_MIN(value, rn) AS val_first, MAX(value) AS val_max
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_len, run_start, first_id, val_first,
             LAG(event_type, 1) OVER w AS c1, LAG(run_len, 1) OVER w AS l1,
             LAG(val_max, 1) OVER w AS x1
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    ), matches AS (
      SELECT user_id, first_id, CAST(l1 AS INT) AS l1,
             ROUND(val_first, 4) AS purchase_val,
             ROUND(x1, 4) AS clicks_max_val
      FROM seq
      WHERE event_type = 'purchase' AND c1 = 'click' AND l1 >= 2
        AND val_first > x1
        AND epoch_us(run_start) // 1000
            <= epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000
    ), starts AS (
      SELECT user_id, first_id, l1, purchase_val, clicks_max_val,
             UNNEST(generate_series(1, l1 - 1)) AS start_off
      FROM matches
    )
    SELECT user_id,
           first_id AS purchase_event,
           CAST(start_off AS BIGINT) AS start_off,
           CAST(LEAST(4, l1 - start_off + 1) AS BIGINT) AS n_clicks,
           purchase_val, clicks_max_val
    FROM starts
    """,
)
def pattern_match_skipguard_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_match_skipguard — guard ×
    skip-strategy composition detected incrementally (round 13,
    VERDICT r12 directive 1's "then do skip×guard the same way").

    The composition is orthogonal in the automaton exactly as in the
    batch compiler: the guard evaluates at candidacy against the
    closed click run's MAXIMAL value aggregates (one decision per
    anchor, fixed at open), and emit() fans the (start_off,
    consumed-count) sub-matches out emission-locally AFTER that
    decision — ``to_next`` emits one greedy sub-match per admissible
    start. Oracle = the batch enumeration SQL with the guard conjunct
    and the ms-aligned watermark filter on the anchor run's start
    (the afterskip_stream convention).
    """
    pat = Pattern(
        steps=(
            Step("clicks", "click", 2, 4),
            Step(
                "purchase",
                "purchase",
                1,
                None,
                guard=Guard("first", ">", "clicks", "max"),
            ),
        ),
        skip="to_next",
        val_col="value",
    )
    m = pattern_stream(spark, sf_dir, pat)
    return m.select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        F.col("start_off").cast("long").alias("start_off"),
        F.col("n_clicks").cast("long").alias("n_clicks"),
        F.round("g_purchase", 4).alias("purchase_val"),
        F.round("g_purchase_ref", 4).alias("clicks_max_val"),
    )


# ---------------------------------------------------------------------------
# Non-deterministic relaxed contiguity (Flink ``followedByAny``) —
# round 13. Pairing is order-insensitive set logic like the horizon
# machines (no hold-buffer fold needed): a target settles once the
# watermark strictly passes it, at which point every in-frame anchor
# has provably arrived (an anchor with a_us < t_us arriving later
# would be watermark-late and dropped upstream by the same ts < wm
# contract the resolution rule aligns to).

#: Pairs-state schema: retained anchors (µs + event_id) and pending
#: targets (µs + event_id). Anchors older than horizon + watermark
#: delay evict — no pending or future target's frame reaches them —
#: so per-key state is O(events inside horizon + watermark delay),
#: Flink's NFA bound for a within-bounded followedByAny.
PAIRS_STATE_SCHEMA = StructType(
    [
        StructField("anchor_us", ArrayType(LongType())),
        StructField("anchor_id", ArrayType(LongType())),
        StructField("target_us", ArrayType(LongType())),
        StructField("target_id", ArrayType(LongType())),
    ]
)

PAIRS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("click_event", LongType()),
        StructField("purchase_event", LongType()),
        StructField("gap_us", LongType()),
    ]
)

#: PAIRS_STATE_SCHEMA + the retained blocker events (middle
#: negation); same eviction floor as anchors — unguarded pair
#: patterns keep the base schema byte-identical.
PAIRS_STATE_SCHEMA_BLK = StructType(
    list(PAIRS_STATE_SCHEMA.fields)
    + [
        StructField("blocker_us", ArrayType(LongType())),
        StructField("blocker_id", ArrayType(LongType())),
    ]
)


def compile_pairs_stream(
    anchor_cls: str,
    target_cls: str,
    horizon_us: int,
    blocker_cls: str | None = None,
):
    """Handler for ``followedByAny`` pairing: each settling target
    emits one row per retained anchor inside ``[t_us − horizon,
    t_us)`` (the strict-below / inclusive-above frame of
    compile_horizon_pairs, seen from the target side).

    Resolution rule: a target settles once ``t_ms < wm_ms`` (STRICT)
    — any unseen anchor has ``a_ms >= wm_ms > t_ms``, hence
    ``a_us >= wm_ms·1000 > t_us``, strictly after the target and
    outside its frame, so the pair set is complete. Anchors sort once
    per invocation and each target takes its frame by two bisects
    (the horizon machines' r13 resolution shape). Anchor eviction
    floor: pending and future targets have ``t_us >= wm_ms·1000``,
    so anchors below ``wm_ms·1000 − horizon_us`` are unreachable.

    ``blocker_cls`` (middle negation — [FLINK-API] ``notFollowedBy``
    BETWEEN steps): a settling target pairs only with anchors that
    have NO blocker strictly between them in (us, id) event order —
    two bisects over the once-sorted blocker buffer per candidate
    pair. An unseen blocker has ``b_ms >= wm_ms > t_ms`` — after the
    target, never between — so settlement stays complete; blockers
    share the anchors' eviction floor. Unblocked patterns keep the
    base state schema byte-identical."""

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            if blocker_cls is not None:
                a_us, a_id, t_us, t_id, b_us, b_id = state.get
                blockers = [
                    (int(u), int(i)) for u, i in zip(b_us, b_id)
                ]
            else:
                a_us, a_id, t_us, t_id = state.get
                blockers = []
            anchors = [(int(u), int(i)) for u, i in zip(a_us, a_id)]
            targets = [(int(u), int(i)) for u, i in zip(t_us, t_id)]
        else:
            anchors, targets, blockers = [], [], []
        wm_ms = state.getCurrentWatermarkMs()
        if not state.hasTimedOut:
            for chunk in pdfs:
                for ts, eid, cls in zip(
                    chunk["ts"], chunk["event_id"], chunk["event_type"]
                ):
                    us = int(ts.value) // 1_000
                    if cls == anchor_cls:
                        anchors.append((us, int(eid)))
                    elif cls == target_cls:
                        targets.append((us, int(eid)))
                    elif cls == blocker_cls:
                        blockers.append((us, int(eid)))
        emitted, pending = [], []
        anchors.sort()
        blockers.sort()
        a_keys = [a[0] for a in anchors]
        for us, eid in targets:
            if us // 1000 < wm_ms:
                lo = bisect.bisect_left(a_keys, us - horizon_us)
                hi = bisect.bisect_left(a_keys, us)
                for a_u, a_i in anchors[lo:hi]:
                    if blocker_cls is not None:
                        # blockers strictly between (a_u, a_i) and
                        # (us, eid) in (us, id) order — the prefix-
                        # equality rule the batch join encodes
                        blo = bisect.bisect_right(blockers, (a_u, a_i))
                        bhi = bisect.bisect_left(blockers, (us, eid))
                        if bhi > blo:
                            continue
                    emitted.append((key[0], a_i, eid, us - a_u))
            else:
                pending.append((us, eid))
        floor_us = wm_ms * 1000 - horizon_us
        anchors = [a for a in anchors if a[0] >= floor_us]
        base = (
            [u for u, _ in anchors],
            [i for _, i in anchors],
            [u for u, _ in pending],
            [i for _, i in pending],
        )
        if blocker_cls is not None:
            blockers = [b for b in blockers if b[0] >= floor_us]
            base = base + (
                [u for u, _ in blockers],
                [i for _, i in blockers],
            )
        state.update(base)
        if pending:
            # shares hold_timer_ms's API-forced clamp residual (the
            # wm_ms + 1 floor) — see its docstring for the boundary
            state.setTimeoutTimestamp(
                max(min(u for u, _ in pending) // 1000, wm_ms + 1)
            )
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in emitted],
                "click_event": [r[1] for r in emitted],
                "purchase_event": [r[2] for r in emitted],
                "gap_us": [r[3] for r in emitted],
            }
        )

    return handler


@query(
    "pattern_detect_followedbyany_stream",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_event,
           p.event_id AS purchase_event,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND epoch_us(p.ts) > epoch_us(c.ts)
     AND epoch_us(p.ts) <= epoch_us(c.ts) + 86400000000
    WHERE epoch_us(p.ts) // 1000
          < epoch_us((SELECT MAX(ts) FROM events
                      WHERE event_type IN ('click', 'purchase'))) // 1000
            - 600000
    """,
)
def pattern_detect_followedbyany_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_detect_followedbyany —
    non-deterministic relaxed contiguity ([FLINK-API]
    ``followedByAny().within(24h)``) detected incrementally: every
    purchase pairs with EVERY same-user click in the preceding 24 h,
    emitted the moment the watermark strictly passes the purchase
    (see :func:`compile_pairs_stream` for why the pair set is
    complete at that instant). Spark's stream-stream self-join could
    express this shape, but the keyed handler keeps the horizon
    machines' single-shuffle layout and their exact state bound —
    and one state row per key, versus the join's two buffered sides.

    Same filtered-stream watermark convention as the other horizon
    twins (classes filter before the shuffle; the oracle's
    final-watermark term ranges over click/purchase rows). Oracle =
    the batch key's pair join + the ms-aligned
    settled-before-final-watermark filter on the purchase side.
    """
    ev = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
        .withWatermark("ts", "10 minutes")
    )
    handler = compile_pairs_stream(
        "click", "purchase", 24 * 3600 * 1_000_000
    )
    result = ev.groupBy("user_id").applyInPandasWithState(
        handler,
        outputStructType=PAIRS_OUT_SCHEMA,
        stateStructType=PAIRS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return run_to_memory(spark, result, mode="append")


# ---------------------------------------------------------------------------
# Timed-out partial-match side output (Flink
# ``TimedOutPartialMatchHandler``) — round 13. The inverse of the
# run-fold automaton's emission rule: a row emits only when the
# watermark proves the match can NO LONGER complete (deadline passed
# with the funnel unfinished), so this is a pending-state machine in
# the absence family — order-insensitive accumulation, resolution
# strictly after the deadline, no hold-buffer fold.

#: Timeout-state schema: pending pattern starts and the retained
#: second/third-class events (µs + event_id parallel arrays each).
#: Events below ``wm − horizon − 1ms`` evict (no pending or future
#: start's frame reaches them), so per-key state is O(events inside
#: horizon + watermark delay) — the NFA bound for a within-bounded
#: three-step pattern.
TIMEOUT_STATE_SCHEMA = StructType(
    [
        StructField("start_us", ArrayType(LongType())),
        StructField("start_id", ArrayType(LongType())),
        StructField("second_us", ArrayType(LongType())),
        StructField("second_id", ArrayType(LongType())),
        StructField("third_us", ArrayType(LongType())),
        StructField("third_id", ArrayType(LongType())),
    ]
)

TIMEOUT_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_event", LongType()),
        StructField("n_matched", LongType()),
        StructField("deadline_us", LongType()),
    ]
)


def compile_timeout_stream(
    first_cls: str, second_cls: str, third_cls: str, horizon_us: int
):
    """Handler for the timed-out-partials side output of ``first
    followedBy second followedBy third within(horizon)``.

    A start resolves once ``(start_us + horizon) // 1000 < wm_ms``
    (STRICT) — any unseen event has ``ts_ms >= wm_ms``, hence
    ``ts_us >= wm_ms·1000 > start_us + horizon``, beyond the
    deadline, so the funnel's fate is fixed: the earliest
    second-class event strictly after the start (in (us, id) total
    order — the batch rn order restricted to these classes) within
    the deadline, then the earliest third-class event strictly after
    THAT one; complete → silent, else emit with n_matched = steps
    matched at expiry. Resolution is deliberately deadline-time only
    (never early on completion): an earlier second-class event can
    still arrive in-watermark and shift the chain, and the event
    buffers are retained for the horizon regardless — pending-start
    state is O(starts in horizon), not the bottleneck. Both sides
    sort once per invocation; each start resolves with two bisects.
    """

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_us, s_id, b_us, b_id, c_us, c_id = state.get
            starts = [(int(u), int(i)) for u, i in zip(s_us, s_id)]
            seconds = [(int(u), int(i)) for u, i in zip(b_us, b_id)]
            thirds = [(int(u), int(i)) for u, i in zip(c_us, c_id)]
        else:
            starts, seconds, thirds = [], [], []
        wm_ms = state.getCurrentWatermarkMs()
        if not state.hasTimedOut:
            for chunk in pdfs:
                for ts, eid, cls in zip(
                    chunk["ts"], chunk["event_id"], chunk["event_type"]
                ):
                    us = int(ts.value) // 1_000
                    if cls == first_cls:
                        starts.append((us, int(eid)))
                    elif cls == second_cls:
                        seconds.append((us, int(eid)))
                    elif cls == third_cls:
                        thirds.append((us, int(eid)))
        emitted, pending = [], []
        seconds.sort()
        thirds.sort()
        for us, eid in starts:
            deadline = us + horizon_us
            if deadline // 1000 >= wm_ms:
                pending.append((us, eid))
                continue
            i = bisect.bisect_right(seconds, (us, eid))
            fc = (
                seconds[i]
                if i < len(seconds) and seconds[i][0] <= deadline
                else None
            )
            if fc is None:
                emitted.append((key[0], eid, 1, deadline))
                continue
            j = bisect.bisect_right(thirds, fc)
            done = j < len(thirds) and thirds[j][0] <= deadline
            if not done:
                emitted.append((key[0], eid, 2, deadline))
        # Exact eviction floor — same derivation as the absence
        # machine's (a pending anchor's deadline // 1000 >= wm_ms is
        # exactly us >= wm_ms*1000 − horizon_us; followers must sort
        # at or after their anchor). ADVICE r13 item 4.
        floor_us = wm_ms * 1000 - horizon_us
        seconds = [e for e in seconds if e[0] >= floor_us]
        thirds = [e for e in thirds if e[0] >= floor_us]
        state.update(
            (
                [u for u, _ in pending],
                [i for _, i in pending],
                [u for u, _ in seconds],
                [i for _, i in seconds],
                [u for u, _ in thirds],
                [i for _, i in thirds],
            )
        )
        if pending:
            # shares hold_timer_ms's API-forced clamp residual (the
            # wm_ms + 1 floor) — see its docstring for the boundary
            state.setTimeoutTimestamp(
                max(
                    min((u + horizon_us) // 1000 for u, _ in pending),
                    wm_ms + 1,
                )
            )
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in emitted],
                "start_event": [r[1] for r in emitted],
                "n_matched": [r[2] for r in emitted],
                "deadline_us": [r[3] for r in emitted],
            }
        )

    return handler


@query(
    "pattern_timeout_partial_stream",
    oracle="""
    WITH f AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ), p1 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase'
                         THEN struct_pack(us := us, id := event_id) END)
                OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                  AS fp
      FROM f
    ), p2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click'
                         THEN struct_pack(us := us, id := event_id,
                                          pus := fp.us, pid := fp.id) END)
                OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                  AS fc
      FROM p1
    )
    SELECT user_id,
           event_id AS start_event,
           CAST(CASE WHEN fc IS NULL OR fc.us > us + 21600000000
                     THEN 1 ELSE 2 END AS BIGINT) AS n_matched,
           us + 21600000000 AS deadline_us
    FROM p2
    WHERE event_type = 'view'
      AND (fc IS NULL OR fc.us > us + 21600000000
           OR fc.pus IS NULL OR fc.pus > us + 21600000000)
      AND (us + 21600000000) // 1000
          < epoch_us((SELECT MAX(ts) FROM events
                      WHERE event_type IN ('view', 'click', 'purchase')
                     )) // 1000 - 600000
    """,
)
def pattern_timeout_partial_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_timeout_partial — Flink's
    ``TimedOutPartialMatchHandler`` side output produced the way
    Flink produces it: pattern starts live in keyed pending state
    with an event-time timer at their deadline; when the watermark
    strictly passes it, the unfinished funnel emits (user_id,
    start_event, n_matched, deadline_us) and completed funnels leave
    silently (see :func:`compile_timeout_stream` for why the fate is
    fixed at that instant). The canonical "cart abandoned within 6 h"
    alert, with n_matched telling WHERE the funnel stalled.

    Same filtered-stream watermark convention as the other pending-
    state twins (the three classes filter before the shuffle; the
    oracle's final-watermark term ranges over view/click/purchase
    rows). Oracle = the batch side-output SQL + the ms-aligned
    deadline-strictly-passed filter (the absence machine's boundary
    polarity — this is a FOLLOWING-horizon resolution).
    """
    ev = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
        .withWatermark("ts", "10 minutes")
    )
    handler = compile_timeout_stream(
        "view", "click", "purchase", 6 * 3600 * 1_000_000
    )
    result = ev.groupBy("user_id").applyInPandasWithState(
        handler,
        outputStructType=TIMEOUT_OUT_SCHEMA,
        stateStructType=TIMEOUT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return run_to_memory(spark, result, mode="append")


@query(
    "pattern_match_optional_skip_stream",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM events
    ), runs AS (
      SELECT user_id, event_type, COUNT(*) AS run_len,
             MIN(ts) AS run_start,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_len, run_start, first_id,
             LAG(event_type, 1) OVER w AS c1, LAG(run_len, 1) OVER w AS l1,
             LAG(event_type, 2) OVER w AS c2, LAG(run_len, 2) OVER w AS l2
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    ), wm AS (
      SELECT epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000 AS ms
    ), present AS (
      SELECT user_id, first_id, CAST(l2 AS INT) AS lv,
             CAST(1 AS BIGINT) AS n_clicks
      FROM seq, wm
      WHERE event_type = 'purchase' AND c1 = 'click' AND l1 = 1
        AND c2 = 'view' AND l2 >= 2
        AND epoch_us(run_start) // 1000 <= wm.ms
    ), absent AS (
      SELECT user_id, first_id, CAST(l1 AS INT) AS lv,
             CAST(0 AS BIGINT) AS n_clicks
      FROM seq, wm
      WHERE event_type = 'purchase' AND c1 = 'view' AND l1 >= 2
        AND epoch_us(run_start) // 1000 <= wm.ms
    ), anchors AS (
      SELECT * FROM present UNION ALL SELECT * FROM absent
    ), starts AS (
      SELECT user_id, first_id, lv, n_clicks,
             UNNEST(generate_series(1, lv - 1)) AS start_off
      FROM anchors
    )
    SELECT user_id,
           first_id AS purchase_event,
           CAST(start_off AS BIGINT) AS start_off,
           CAST(LEAST(4, lv - start_off + 1) AS BIGINT) AS n_views,
           n_clicks
    FROM starts
    """,
)
def pattern_match_optional_skip_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_match_optional_skip — optional × skip
    detected incrementally (round 13; with guard × optional and
    guard × skip shipped this round, the compiled automaton now
    serves every pairwise extension composition whose semantics
    permit incremental emission — only maximal-anchor dependencies,
    final-step exact / non-'first' anchor guards, remain batch-only).

    Nothing new in the machine: Pattern pins the first step
    non-optional under a skip strategy (both engines), so every
    variant shares the expansion step; candidacy picks the variant
    from the closed-run window and emit() enumerates (start_off,
    consumed) over that variant's own first-run length — dropped
    optional steps emit n_<name> = 0 inside each sub-match row.
    Oracle = the batch two-branch UNION + expansion with the
    ms-aligned watermark filter on the anchor run's start.
    """
    pat = Pattern(
        steps=(
            Step("views", "view", 2, 4),
            Step("clicks", "click", 0, 1),
            Step("purchase", "purchase", 1, None),
        ),
        skip="to_next",
    )
    m = pattern_stream(spark, sf_dir, pat)
    return m.select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        F.col("start_off").cast("long").alias("start_off"),
        F.col("n_views").cast("long").alias("n_views"),
        F.col("n_clicks").cast("long").alias("n_clicks"),
    )


@query(
    "pattern_detect_followedby_nobetween_stream",
    oracle="""
    WITH f AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             COUNT(CASE WHEN event_type = 'error' THEN 1 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM events WHERE event_type IN ('click', 'purchase', 'error')
    )
    SELECT c.user_id,
           c.event_id AS click_event,
           p.event_id AS purchase_event,
           p.us - c.us AS gap_us
    FROM f c JOIN f p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.us > c.us AND p.us <= c.us + 86400000000
     AND p.cum = c.cum
    WHERE p.us // 1000
          < epoch_us((SELECT MAX(ts) FROM events
                      WHERE event_type IN ('click', 'purchase', 'error')
                     )) // 1000 - 600000
    """,
)
def pattern_detect_followedby_nobetween_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_detect_followedby_nobetween — middle
    negation ([FLINK-API] ``notFollowedBy`` between steps) detected
    incrementally: every (click, purchase) pair within 24 h with no
    error strictly between, emitted once the watermark strictly
    passes the purchase. The pairs automaton gains a retained blocker
    buffer with the anchors' eviction floor; each candidate pair
    checks the open interval with two bisects — an unseen blocker is
    provably after the settling target, so the negation is final at
    settlement (:func:`compile_pairs_stream`).

    The watermark convention now ranges over THREE classes (the
    blocker participates in the filter before the shuffle, so the
    oracle's final-watermark term includes error rows). Oracle = the
    batch prefix-equality join + the ms-aligned settled filter.
    """
    ev = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "purchase", "error"))
        .select("user_id", "ts", "event_id", "event_type")
        .withWatermark("ts", "10 minutes")
    )
    handler = compile_pairs_stream(
        "click", "purchase", 24 * 3600 * 1_000_000, blocker_cls="error"
    )
    result = ev.groupBy("user_id").applyInPandasWithState(
        handler,
        outputStructType=PAIRS_OUT_SCHEMA,
        stateStructType=PAIRS_STATE_SCHEMA_BLK,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return run_to_memory(spark, result, mode="append")


@query(
    "pattern_detect_times_exact_stream",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM events
    ), runs AS (
      SELECT user_id, event_type,
             MIN(ts) AS run_start, COUNT(*) AS run_len,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_start, run_len, first_id,
             LAG(event_type, 1) OVER w AS c1, LAG(run_len, 1) OVER w AS l1,
             LAG(run_start, 1) OVER w AS s1,
             LEAD(run_start, 1) OVER w AS next_start
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    )
    SELECT user_id,
           first_id AS click_event,
           CAST(l1 AS BIGINT) AS n_views,
           CAST(run_len AS BIGINT) AS n_clicks,
           epoch_us(s1) AS pattern_start_us,
           epoch_us(run_start) AS pattern_end_us
    FROM seq
    WHERE event_type = 'click'
      AND run_len BETWEEN 1 AND 2
      AND c1 = 'view'
      AND run_start <= s1 + INTERVAL 24 HOUR
      AND next_start IS NOT NULL
      AND epoch_us(next_start) // 1000
          <= epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000
    """,
)
def pattern_detect_times_exact_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_detect_times_exact — the FINAL-step
    exact quantifier, the first of the two run-CLOSE emission shapes
    (round 14 — VERDICT r13 item 4 closed): ``PATTERN (V+ C{1,2})``
    within 24 h where the click run must be a maximal run of EXACTLY
    1–2 clicks. Exactness ranges over the MAXIMAL anchor run — the
    r12/r13 rejection argument — so the compiled automaton defers this
    pattern's emission from anchor-run OPEN to anchor-run CLOSE: the
    next different-class event on the key settles the run's length,
    and the match (or its rejection, for a 3-click run) is decided at
    that fold. A run never closed before the final watermark never
    emits, which the oracle mirrors with the run-CLOSED filter — the
    batch SQL plus ``next_start`` (the closing run's start) existing
    and ms-folding before MAX(ts) − 10 min; the ``<=`` boundary is
    split_by_watermark's fold-admission contract, same polarity as
    every run-fold key's anchor filter.

    Scale: see the module docstring — O(pattern length) window per
    key; close-mode adds NO state (pend was already persisted) and no
    timers (the closing event re-enters the handler by itself).
    """
    pat = Pattern(
        steps=(
            Step("views", "view", 1, None),
            Step("clicks", "click", 1, 2, exact=True),
        ),
        within_hours=24,
    )
    return pattern_stream(spark, sf_dir, pat).select(
        "user_id",
        F.col("anchor_event").alias("click_event"),
        "n_views",
        "n_clicks",
        "pattern_start_us",
        "pattern_end_us",
    )


@query(
    "pattern_match_finalguard_stream",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM events
    ), runs AS (
      SELECT user_id, event_type,
             MIN(ts) AS run_start, COUNT(*) AS run_len,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id,
             MAX(value) AS val_max
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_start, run_len, first_id, val_max,
             LAG(event_type, 1) OVER w AS c1, LAG(run_len, 1) OVER w AS l1,
             LAG(run_start, 1) OVER w AS s1, LAG(val_max, 1) OVER w AS m1,
             LEAD(run_start, 1) OVER w AS next_start
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    )
    SELECT user_id,
           first_id AS purchase_event,
           CAST(l1 AS BIGINT) AS n_views,
           CAST(run_len AS BIGINT) AS n_purchases,
           ROUND(val_max, 4) AS purchases_max_val,
           ROUND(m1, 4) AS views_max_val,
           epoch_us(s1) AS pattern_start_us,
           epoch_us(run_start) AS pattern_end_us
    FROM seq
    WHERE event_type = 'purchase'
      AND c1 = 'view'
      AND val_max > m1
      AND run_start <= s1 + INTERVAL 24 HOUR
      AND next_start IS NOT NULL
      AND epoch_us(next_start) // 1000
          <= epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000
    """,
)
def pattern_match_finalguard_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_match_finalguard — the FINAL-step
    guard with a non-``first`` aggregate, the second run-CLOSE
    emission shape (round 14 — VERDICT r13 item 4 closed):
    ``PATTERN (V+ P+)`` within 24 h, match iff MAX(value over the
    WHOLE purchase run) > MAX(value over the view run). The guard's
    left side ranges over the maximal anchor run, so candidacy at run
    open DEFERS it (structure + non-final guards still pin the
    window, pend blocks eviction) and the closing fold re-checks it
    against the settled run aggregates — :func:`compile_stream`'s
    'defer'/'close' candidacy modes. Oracle: the batch SQL plus the
    same run-CLOSED-before-final-watermark filter as
    pattern_detect_times_exact_stream.

    Scale: the guarded state schema's five per-run aggregates already
    carry the anchor run's running MAX — close-mode reads it at the
    closing fold instead of slot 'first' at open; no new state, no
    timers.
    """
    pat = Pattern(
        steps=(
            Step("views", "view", 1, None),
            Step(
                "purchases",
                "purchase",
                1,
                None,
                guard=Guard("max", ">", "views", "max"),
            ),
        ),
        within_hours=24,
        val_col="value",
    )
    return pattern_stream(spark, sf_dir, pat).select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        "n_views",
        "n_purchases",
        F.round("g_purchases", 4).alias("purchases_max_val"),
        F.round("g_purchases_ref", 4).alias("views_max_val"),
        "pattern_start_us",
        "pattern_end_us",
    )


#: Suffix-automaton state (round 14 — per-EVENT anchoring): the last
#: W folded events (W = the pattern's event length − 1, +1 when the
#: earliest step is exact and needs its far-boundary event) plus the
#: watermark hold buffer. Unlike the run-fold machine there is no run
#: compression — per-event anchoring is exactly what compression
#: discards — but W is a compile-time constant, so state stays O(1)
#: per key.
SUFFIX_STATE_SCHEMA = StructType(
    [
        StructField("win_us", ArrayType(LongType())),
        StructField("win_id", ArrayType(LongType())),
        StructField("win_cls", ArrayType(StringType())),
        StructField("win_nul", ArrayType(LongType())),
        StructField("buf_id", ArrayType(LongType())),
        StructField("buf_us", ArrayType(LongType())),
        StructField("buf_cls", ArrayType(StringType())),
        StructField("buf_nul", ArrayType(LongType())),
    ]
)

SUFFIX_STATE_SCHEMA_VAL = StructType(
    list(SUFFIX_STATE_SCHEMA.fields)
    + [
        StructField("win_val", ArrayType(DoubleType())),
        StructField("buf_val", ArrayType(DoubleType())),
    ]
)


def compile_suffix_stream(pat: Pattern):
    """Compile a FIXED-count pattern into a per-EVENT-anchored
    ``applyInPandasWithState`` handler — the streaming image of
    :func:`operators.cep.compile_suffix` (round 14; retires the last
    'does not stream' line in the CEP inventory: the suffix-anchored
    start that the run-fold machine's compression discards, carried
    since round 12 as pattern_detect_cep's documented residual).

    Per-event anchoring is trivially incremental: every predecessor a
    suffix match reads sits at a FIXED lag offset, so a window of the
    last W folded events (W = pattern event length − 1, +1 when the
    earliest step carries ``exact``) decides each anchor the moment
    the anchor itself folds — no deferral, no pend state, no variant
    expansion. A shorter-than-W window means the far events simply do
    not exist (key history shorter than the pattern), which is the
    same NULL-lag semantics the batch plan has; an ``exact`` boundary
    with no event beyond it passes, exactly like the batch plan's
    ``guard.isNull() | ~matches`` disjunct. Guards aggregate over the
    fixed offsets with the suffix route's NULL semantics
    (min/max/sum skip NULL values; all-NULL → NULL → no match).

    Emission boundary: the anchor's own fold (``ts_ms <= wm_ms``,
    split_by_watermark's admission) — the oracle is the batch SQL
    plus the ms-aligned anchor-folded filter, the ORIGINAL run-fold
    convention (no run-close shift: nothing here ranges over an open
    run).

    Returns ``(handler, out_schema, state_schema)``. Out columns:
    key, anchor_event, one (g_<name>, g_<name>_ref) pair per guarded
    step, pattern_start_us, pattern_end_us.
    """
    if not all(s.fixed() for s in pat.steps):
        raise ValueError("suffix strategy requires fixed quantifiers")
    last = pat.steps[-1]
    if last.min_count != 1:
        raise ValueError("suffix strategy anchors on a single final event")
    if last.exact:
        # ADVICE r14 — mirror compile_suffix: the exact_guards walk
        # covers steps[:-1] only, so a strict FINAL boundary (a
        # one-event lookahead past the anchor) would compile silently
        # unchecked; per-event anchoring decides each anchor on its
        # predecessors alone, so reject rather than ignore.
        raise ValueError(
            "suffix streaming cannot enforce exact on the FINAL step "
            "(it would need a one-event lookahead past the anchor); "
            "use a run-anchored form (compile_stream run-close)"
        )
    if pat.skip != "past_last":
        # mirror compile_pattern's routing contract: skip strategies
        # compile through the greedy sub-match expansion, never the
        # suffix path — compiling here would silently drop the
        # start_off enumeration (review r14)
        raise ValueError(
            "suffix streaming supports only skip='past_last'; "
            "skip strategies expand sub-matches through the greedy "
            "strategy (compile_stream)"
        )

    # Offsets from the anchor (0 = the anchor), walking backwards —
    # the same layout compile_suffix builds with lag columns.
    offsets: dict[str, list[int]] = {last.name: [0]}
    checks: list[tuple[tuple[str, ...], int]] = []  # (classes, offset)
    exact_guards: list[tuple[tuple[str, ...], int]] = []
    off = 1
    for s in reversed(pat.steps[:-1]):
        offsets[s.name] = list(range(off, off + s.min_count))
        for _ in range(s.min_count):
            checks.append((s.clses(), off))
            off += 1
        if s.exact:
            exact_guards.append((s.clses(), off))
    total = off  # pattern length in events
    w_len = total - 1 + (1 if exact_guards and max(
        o for _, o in exact_guards) >= total else 0)
    anchor_clses = last.clses()
    within_us = (
        pat.within_hours * 3600 * 1_000_000
        if pat.within_hours is not None
        else None
    )
    guard_specs = [
        (s.name, s.guard) for s in pat.steps if s.guard is not None
    ]
    needs_val = bool(guard_specs)
    state_schema = (
        SUFFIX_STATE_SCHEMA_VAL if needs_val else SUFFIX_STATE_SCHEMA
    )
    fields = [
        StructField(pat.key, LongType()),
        StructField("anchor_event", LongType()),
    ]
    for name, _g in guard_specs:
        fields.append(StructField(f"g_{name}", DoubleType()))
        fields.append(StructField(f"g_{name}_ref", DoubleType()))
    fields += [
        StructField("pattern_start_us", LongType()),
        StructField("pattern_end_us", LongType()),
    ]
    out_schema = StructType(fields)
    out_cols = [f.name for f in out_schema.fields]
    ts_col, id_col, cls_col = pat.ts, pat.order_id, pat.cls_col
    val_col = pat.val_col

    def _agg(vals, agg):
        """Values listed anchor-first (offset asc). Mirrors
        _suffix_val_agg: 'first' = the EARLIEST matched event."""
        if agg == "first":
            return vals[-1]
        if agg == "last":
            return vals[0]
        nn = [v for v in vals if v is not None]
        if not nn:
            return None
        if agg == "min":
            return min(nn)
        if agg == "max":
            return max(nn)
        return sum(nn)

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def dec(v):
            return None if v is None or v != v else float(v)

        if state.exists:
            if needs_val:
                (w_us, w_id, w_cls, w_nul,
                 b_id, b_us, b_cls, b_nul, w_val, b_val) = state.get
            else:
                (w_us, w_id, w_cls, w_nul,
                 b_id, b_us, b_cls, b_nul) = state.get
                w_val = b_val = None
            win = [
                (int(u), int(i), None if n else c,
                 dec(w_val[j]) if needs_val else None)
                for j, (u, i, c, n) in enumerate(
                    zip(w_us, w_id, w_cls, w_nul)
                )
            ]
            buf = [
                (int(u), int(i), None if n else c,
                 dec(b_val[j]) if needs_val else None)
                for j, (u, i, c, n) in enumerate(
                    zip(b_us, b_id, b_cls, b_nul)
                )
            ]
        else:
            win, buf = [], []
        wm_ms = state.getCurrentWatermarkMs()
        if not state.hasTimedOut:
            for chunk in pdfs:
                ingest_chunk(
                    buf, chunk, ts_col, id_col, cls_col,
                    val_col if needs_val else None,
                )
        ready, hold = split_by_watermark(buf, wm_ms)
        out = []
        nan = float("nan")
        for us, eid, cls, val in ready:
            if cls is not None and cls in anchor_clses:
                ok = True
                for clses, o in checks:
                    e = win[-o] if o <= len(win) else None
                    if e is None or e[2] is None or e[2] not in clses:
                        ok = False
                        break
                if ok:
                    for clses, o in exact_guards:
                        e = win[-o] if o <= len(win) else None
                        # absent boundary passes (batch: isNull | ~cls)
                        if e is not None and e[2] is not None \
                                and e[2] in clses:
                            ok = False
                            break
                # checks reference offsets 1..total-1 and fail on a
                # short window, so when ok the lookup is in range
                start_us = (
                    win[-(total - 1)][0] if ok and total > 1 else us
                )
                if ok and within_us is not None and total > 1:
                    ok = us <= start_us + within_us
                gvals = []
                if ok and guard_specs:
                    def at(o):
                        if o == 0:
                            return val
                        return win[-o][3] if o <= len(win) else None

                    for name, g in guard_specs:
                        lhs = _agg([at(o) for o in offsets[name]], g.agg)
                        rhs = _agg(
                            [at(o) for o in offsets[g.ref_step]],
                            g.ref_agg,
                        )
                        if lhs is None or rhs is None or not GUARD_CMPS[
                            g.cmp
                        ](lhs, rhs * g.factor):
                            ok = False
                            break
                        gvals += [lhs, rhs]
                if ok:
                    out.append(
                        tuple([key[0], int(eid)] + gvals
                              + [int(start_us), int(us)])
                    )
            win.append((us, eid, cls, val))
            del win[: max(0, len(win) - w_len)]
        base = (
            [e[0] for e in win],
            [e[1] for e in win],
            ["" if e[2] is None else e[2] for e in win],
            [1 if e[2] is None else 0 for e in win],
            [e[1] for e in hold],
            [e[0] for e in hold],
            ["" if e[2] is None else e[2] for e in hold],
            [1 if e[2] is None else 0 for e in hold],
        )
        if needs_val:
            base = base + (
                [nan if e[3] is None else float(e[3]) for e in win],
                [nan if e[3] is None else float(e[3]) for e in hold],
            )
        state.update(base)
        if hold:
            state.setTimeoutTimestamp(hold_timer_ms(hold, wm_ms))
        yield pd.DataFrame(
            {c: [r[i] for r in out] for i, c in enumerate(out_cols)}
        )

    return handler, out_schema, state_schema


def suffix_pattern_stream(
    spark: SparkSession,
    sf_dir: str,
    pat: Pattern,
    watermark: str = "10 minutes",
) -> DataFrame:
    """events.parquet as a bounded replay → per-event suffix automaton
    → memory sink (the suffix-strategy sibling of pattern_stream)."""
    cols = [pat.key, pat.ts, pat.order_id, pat.cls_col]
    if pat.val_col is not None and any(
        s.guard is not None for s in pat.steps
    ):
        cols.append(pat.val_col)
    ev = (
        _events_stream(spark, sf_dir)
        .withWatermark(pat.ts, watermark)
        .select(*cols)
    )
    handler, out_schema, state_schema = compile_suffix_stream(pat)
    result = ev.groupBy(pat.key).applyInPandasWithState(
        handler,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return run_to_memory(spark, result, mode="append")


@query(
    "pattern_detect_cep_stream",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type, 1) OVER w AS prev1,
             LAG(event_type, 2) OVER w AS prev2,
             LAG(ts, 2)         OVER w AS ts0
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           event_id AS purchase_event,
           epoch_us(ts0) AS pattern_start_us,
           epoch_us(ts)  AS pattern_end_us
    FROM seq
    WHERE event_type = 'purchase'
      AND prev1 = 'click' AND prev2 = 'click'
      AND ts <= ts0 + INTERVAL 6 HOUR
      AND epoch_us(ts) // 1000
          <= epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000
    """,
)
def pattern_detect_cep_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of pattern_detect_cep — per-EVENT anchoring
    (round 14): strictly consecutive click → click → purchase within
    6 h, every qualifying purchase EVENT a match even inside a longer
    click run (the semantics the run-fold automaton's compression
    deliberately discards, documented since round 12 as the one CEP
    key without a stream twin). The suffix machine keeps only the
    last W = 2 folded events per key — per-event anchoring with O(1)
    compile-time-constant state — and decides each anchor the moment
    it folds, so the oracle is the batch SQL plus the ORIGINAL
    ms-aligned anchor-folded filter. With this key every batch CEP
    key streams; no carve-out lines remain.

    Scale: O(pattern length) state per key (smaller than the run-fold
    machine's window — no run lengths, no value slots unguarded), one
    shuffle on user_id, timers only for watermark re-folds.
    """
    pat = Pattern(
        steps=(Step("clicks", "click", 2, 2), Step("buy", "purchase")),
        within_hours=6,
    )
    return suffix_pattern_stream(spark, sf_dir, pat).select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        "pattern_start_us",
        "pattern_end_us",
    )


@query(
    "pattern_detect_until_stream",
    oracle="""
    WITH relabeled AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'view' AND value > 100
                  THEN 'view||stop' ELSE event_type END AS event_type
      FROM events
    ), ordered AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM relabeled
    ), runs AS (
      SELECT user_id, event_type,
             MIN(ts) AS run_start, COUNT(*) AS run_len,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id
      FROM ordered
      GROUP BY user_id, event_type, rn - rn_t
    ), seq AS (
      SELECT user_id, event_type, run_start, first_id,
             LAG(event_type, 1) OVER w AS c1,
             LAG(run_len, 1)    OVER w AS l1,
             LAG(run_start, 1)  OVER w AS s1
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
    )
    SELECT user_id,
           first_id AS purchase_event,
           CAST(l1 AS BIGINT) AS n_views,
           epoch_us(s1) AS pattern_start_us,
           epoch_us(run_start) AS pattern_end_us
    FROM seq
    WHERE event_type = 'purchase' AND c1 = 'view'
      AND run_start <= s1 + INTERVAL 6 HOUR
      AND epoch_us(run_start) // 1000
          <= epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000
    """,
)
def pattern_detect_until_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_detect_until (round 15 — VERDICT r14
    item 5): Flink ``oneOrMore().until(value > 100)`` detected
    incrementally. The stop condition is resolved by the SAME
    row-local relabel the batch compiler uses (``apply_until``,
    applied by :func:`pattern_stream` on the stream BEFORE the
    automaton — streaming-safe, stateless): stop events arrive at the
    run-fold machine as a foreign synthetic class, closing the open
    view run exactly like any class change, so the compiled automaton
    is byte-identical to the oneOrMore twin's. Oracle = the batch
    runs algebra over the relabeled CTE + the ms-aligned anchor-run
    OPEN fold filter (the original run-fold convention — the anchor
    is a plain unguarded run, nothing ranges over it at emission).
    """
    pat = Pattern(
        steps=(
            Step("views", "view", 1, None, until=(">", 100.0)),
            Step("buy", "purchase", 1, None),
        ),
        within_hours=6,
        val_col="value",
    )
    m = pattern_stream(spark, sf_dir, pat)
    return m.select(
        "user_id",
        F.col("anchor_event").alias("purchase_event"),
        "n_views",
        "pattern_start_us",
        "pattern_end_us",
    )


@query(
    "stream_state_reader_automaton",
    oracle="""
    WITH wm AS (
      SELECT epoch_us(MAX(ts)) // 1000 - 600000 AS wm_ms FROM events
    ), folded AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
      FROM events, wm
      WHERE epoch_us(ts) // 1000 <= wm.wm_ms
    ), runs AS (
      SELECT user_id, event_type, COUNT(*) AS run_len,
             MIN(rn) AS start_rn, ARG_MIN(event_id, rn) AS first_id
      FROM folded
      GROUP BY user_id, event_type, rn - rn_t
    ), ranked AS (
      SELECT user_id, event_type, run_len, first_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY start_rn DESC) AS rk,
             COUNT(*) OVER (PARTITION BY user_id) AS n_runs
      FROM runs
    ), cur AS (
      SELECT user_id, event_type AS cur_cls,
             CAST(run_len AS BIGINT) AS cur_len,
             first_id AS cur_first,
             CAST(LEAST(n_runs - 1, 1) AS BIGINT) AS n_win
      FROM ranked WHERE rk = 1
    ), buf AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_buf
      FROM events, wm
      WHERE epoch_us(ts) // 1000 > wm.wm_ms
      GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, b.user_id) AS user_id,
           c.cur_cls, c.cur_len, c.cur_first,
           COALESCE(c.n_win, 0) AS n_win,
           COALESCE(b.n_buf, 0) AS n_buf
    FROM cur c FULL OUTER JOIN buf b ON c.user_id = b.user_id
    """,
)
def stream_state_reader_automaton(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """USER-DEFINED composite state read back from a checkpoint (round
    15 — VERDICT r14 item 6): completes the state-reader trio (flat
    keyed count / windowed built-in aggregate / arbitrary
    applyInPandasWithState blob) with driver-checkable evidence for
    the third member, previously pytest-only
    (test_state_reader_decodes_cep_automaton_state).

    The compiled run-fold CEP automaton (``V+ P+`` within 24 h) runs
    to completion against a fresh checkpoint; the ``statestore``
    source then decodes each key's state blob OFFLINE — nested under
    ``value.groupState.<field>`` beside the operator's
    ``timeoutTimestamp`` (the r14-pinned layout), arrays included.
    Emitted per user: the OPEN run the fold last carried (class /
    length / first event id), the closed-run window depth
    (``n_win``, bounded at pattern length − 1 = 1 here), and the
    held-event count (``n_buf`` — events above the final watermark,
    which the hold-buffer protocol never folds).

    The oracle is the fold semantics in the runs algebra: fold =
    events with ``ts_ms <= final watermark`` (split_by_watermark's
    ms-aligned admission), cur = the LAST maximal run of the folded
    sequence, n_win = LEAST(runs − 1, 1), buf = the unfolded rest —
    a FULL hash-verified SQL oracle, not a rows-only stamp, because a
    run-fold machine's retained state is a pure function of the
    folded prefix (no eviction without idle_evict).

    Scale: the state source reads RocksDB SST files per partition in
    parallel without replaying the stream (the r14 1000× probe read
    a 1.5 M-key store in 27.3 s); auditing a live CEP deployment's
    automata at 100 TB touches only the checkpoint.
    """
    pat = Pattern(
        steps=(
            Step("views", "view", 1, None),
            Step("purchase", "purchase", 1, None),
        ),
        within_hours=24,
    )
    ckpt = scratch_dir("flws_statereader_cep_")
    # the shared launcher owns the column rules / machine wiring —
    # never copy its launch block (review r15)
    pattern_stream(spark, sf_dir, pat, checkpoint=ckpt)
    state = spark.read.format("statestore").option("path", ckpt).load()
    g = "value.groupState"
    return state.select(
        F.col("key.user_id").alias("user_id"),
        # The blob encodes "no open run" as cur_cls='' (cur_len is
        # the open-run flag, module docstring) and a NULL-class run
        # as cur_nul=1 — decode BOTH back to SQL NULL or a user
        # whose every event is held above the final watermark (no
        # folded run) would emit '' where the oracle's outer join
        # yields NULL (review r15).
        F.when(
            F.col(f"{g}.cur_len").isNotNull()
            & (F.col(f"{g}.cur_nul") == 0),
            F.col(f"{g}.cur_cls"),
        ).alias("cur_cls"),
        F.col(f"{g}.cur_len").alias("cur_len"),
        F.col(f"{g}.cur_first").alias("cur_first"),
        F.coalesce(F.size(f"{g}.win_cls"), F.lit(0))
        .cast("long")
        .alias("n_win"),
        F.coalesce(F.size(f"{g}.buf_id"), F.lit(0))
        .cast("long")
        .alias("n_buf"),
    )


@query(
    "pattern_detect_group_times_stream",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type, 1) OVER w AS c1,
             LAG(event_type, 2) OVER w AS c2,
             LAG(event_type, 3) OVER w AS c3,
             LAG(ts, 3)         OVER w AS ts0
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           event_id AS anchor_event,
           epoch_us(ts0) AS pattern_start_us,
           epoch_us(ts)  AS pattern_end_us
    FROM seq
    WHERE event_type = 'click'
      AND c1 = 'view' AND c2 = 'click' AND c3 = 'view'
      AND ts <= ts0 + INTERVAL 72 HOUR
      AND epoch_us(ts) // 1000
          <= epoch_us((SELECT MAX(ts) FROM events)) // 1000 - 600000
    """,
)
def pattern_detect_group_times_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of pattern_detect_group_times: the
    ``(view click){2}`` nested group detected incrementally by the
    per-event suffix machine. :func:`repeat_group` expands the group
    BEFORE compilation, so compile_suffix_stream sees a flat
    four-step fixed pattern — zero machine change (the same
    sugar-not-machinery story as the batch half), W = 3 folded
    predecessors per anchor. Oracle = the batch lag conjunction + the
    ms-aligned anchor-folded filter (per-event anchoring's original
    emission boundary — nothing ranges over an open run).
    """
    pat = Pattern(
        steps=repeat_group((Step("v", "view"), Step("c", "click")), 2),
        within_hours=72,
    )
    return suffix_pattern_stream(spark, sf_dir, pat).select(
        "user_id",
        "anchor_event",
        "pattern_start_us",
        "pattern_end_us",
    )
