"""STREAMING pattern matching — Flink CEP's event-time semantics.

Flink's CEP operator (``CEP.pattern`` / SQL ``MATCH_RECOGNIZE`` on a
stream) buffers each key's out-of-order events, sorts them as the
watermark closes their timestamps, runs the NFA over the closed
prefix, and emits completed matches. The batch twin of the NFA lives
in :mod:`flink_commons_spark.operators.cep`; this module adds the
streaming harness on ``applyInPandasWithState``:

- per key, arriving rows are BUFFERED in state (the same buffering
  Flink's CEP operator does for event time — matching must not run on
  an unsorted open prefix);
- a timer is registered just past the key's newest event; when the
  watermark passes it, the key's data is provably complete up to the
  watermark: the buffer is sorted, the greedy backtracking NFA runs
  (``AFTER MATCH SKIP PAST LAST ROW``), and completed matches emit;
- rows at or beyond the watermark stay buffered for the next firing
  (here: keys whose newest event sits ON the final watermark never
  close — the same "still open" rule the inactivity-session timer
  documents).

State per key is its unmatched buffer (bounded by the watermark
horizon at steady state — emitted/consumed prefixes are dropped);
the shuffle is the one keyed exchange Flink's CEP also does.

The pattern here is the conversion funnel the batch contract query
uses (``view click+ purchase`` with all-integer measures) so the two
formulations are directly comparable; the NFA itself is the shared
:func:`operators.cep._match_at` backtracker.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: output: one row per completed match
MATCH_SCHEMA = "user_id bigint, start_us bigint, end_us bigint, n_clicks bigint"
#: state: the key's buffered (ts, event_type, event_id, value) columns
#: plus the count of leading CONTEXT rows — already-consumed rows kept
#: only so row-navigating DEFINE predicates (PREV) see their true
#: predecessor after a match consumes the prefix; never matched again.
#: Numeric buffers are PACKED binary blobs (``tobytes``/``frombuffer``,
#: the same repacking ``_BUF_TYPES`` documents for the generic
#: harness): an ``array<long>`` state value pays per-element boxing on
#: the Python side plus per-element catalyst array encoding in the
#: state-store commit. Strings stay ``array<string>``. NOTE: a state-
#: SCHEMA change — checkpoints from earlier builds do not restore.
BUFFER_STATE_SCHEMA = (
    "ts binary, et array<string>, eid binary, "
    "val binary, nctx int, presorted int"
)
#: the BUCKETED twin (r15): one state row per KEY BUCKET — every
#: member key's buffers concatenated in key order (same per-column
#: packing), plus the per-key key ids / row offsets / context counts /
#: sorted flags, all little-endian int64 blobs. See
#: :func:`stream_match_pattern`'s ``key_buckets`` docstring for the
#: rationale (per-key-group Arrow framing + state-store row cost
#: dominates the micro-batch at high key cardinality).
BUCKET_BUFFER_STATE_SCHEMA = (
    "ts binary, et array<string>, eid binary, val binary, "
    "bkeys binary, boffs binary, bnctx binary, bsrt binary"
)


def _pack_i64(vals) -> bytes:
    import numpy as np

    # explicit little-endian ('<i8'): ndarray.tobytes() is otherwise
    # platform-native, which would make checkpoints silently corrupt
    # on a different-endian resume host (ADVICE r14)
    return np.asarray(vals, dtype="<i8").tobytes()


def _pack_f64(vals) -> bytes:
    import numpy as np

    return np.asarray(vals, dtype="<f8").tobytes()


def _unpack(val, dtype: str) -> list:
    import numpy as np

    return np.frombuffer(val if val is not None else b"", dtype=dtype).tolist()
_COLS = ["user_id", "start_us", "end_us", "n_clicks"]


#: the conversion-funnel pattern the batch contract query uses
FUNNEL_PATTERN: "list[tuple[str, int, int | None]]" = [
    ("view", 1, 1), ("click", 1, None), ("purchase", 1, 1),
]
#: the QUANTIFIED variant: zero-or-more clicks (greedy ``*``)
QUANTIFIED_PATTERN: "list[tuple[str, int, int | None]]" = [
    ("view", 1, 1), ("click", 0, None), ("purchase", 1, 1),
]


def _run_pattern_nfa(
    key_id: int,
    rows: "list[tuple]",
    pattern: "list[tuple[str, int, int | None]]",
    count_idx: int = 1,
    within_us: "int | None" = None,
    open_end_wm_ms: "int | None" = None,
    after_match: "str | tuple[str, str]" = "past_last",
    defines: "dict[str, Any] | None" = None,
    ctx_n: int = 0,
    emit: "Any | None" = None,
):
    """Greedy pattern matching over sorted rows via the shared batch
    backtracker; returns (matches, consumed_count). ``pattern`` is a
    list of ``(event_type, lo, hi)`` quantified variables (``hi=None``
    unbounded; event_type ``"*"`` matches ANY row) matched
    contiguously, ``AFTER MATCH SKIP PAST LAST ROW``; ``count_idx``
    names the variable whose row count lands in the output's
    ``n_clicks`` measure.

    With ``within_us`` set (Flink's ``PATTERN ... WITHIN interval``),
    a match starting at row ``i`` may only extend over rows whose
    event time is at most ``rows[i].ts + within_us`` — matches are
    contiguous here, so bounding the scan end enforces exactly "the
    match completes within the interval".

    ``open_end_wm_ms`` marks ``rows`` as a CLOSED PREFIX of a live
    stream (value = current watermark ms). Two kinds of attempt are
    then NOT-YET-DECIDED and stop the scan with everything from their
    start kept buffered (emitting or discarding now would diverge
    from the batch semantics once future rows arrive):

    - a COMPLETED match whose greedy final variable ends on the last
      row while still below its upper bound — future rows could
      extend it (Flink likewise holds a greedy trailing quantifier
      open until a non-matching row or the WITHIN window closes);
    - a FAILED attempt that ran out of rows mid-pattern rather than
      failing a predicate (``_match_at_ex``'s touched_end) — future
      rows could complete it, and under the sequential-scan contract
      no later start may resolve before an earlier undecided one.

    Both deferrals are waived once the WITHIN window (if any) is
    closed by the watermark — no admissible future row exists.

    ``after_match`` is the resume strategy — all four of Flink's
    AFTER MATCH SKIP modes: ``"past_last"`` (the default),
    ``"to_next_row"`` (overlapping matches), or
    ``("to_first", var)`` / ``("to_last", var)`` — resume AT the
    first/last row the named pattern variable matched (that row stays
    buffered: it may start the next match). Like the batch matcher
    (and Flink), a skip-to that would not advance the scan, or whose
    variable matched no row, raises. Consumed rows are always those
    strictly before the final scan position, since every future match
    starts at or after it.

    ``defines`` generalizes the masks beyond event-type equality: a
    dict of variable name → ``where(pdf) → boolean Series`` callables
    (the batch :class:`operators.cep.Step` surface) evaluated over a
    pandas frame of the buffered rows (columns ``ts_us, event_type,
    event_id, val``). Predicates must be BACKWARD-looking — the
    current row and ``shift(k>0)`` forms (Flink's PREV): a closed
    row's mask then only reads closed rows, so masks are final the
    moment the watermark closes them. Forward navigation (NEXT) would
    read rows that may not have arrived and is rejected by the SQL
    compiler for streaming use.

    ``ctx_n`` marks the first ``ctx_n`` rows as CONTEXT: already
    consumed, present only so shifts see their true predecessor — the
    scan starts past them and they are never matched again. ``emit``
    overrides the output row builder (``emit(key_id, rows, hit) →
    tuple``; default = the funnel's 4-tuple with ``count_idx``).
    """
    import numpy as np

    from flink_commons_spark.operators.cep import Step

    steps = [
        Step(et, None, quant=(lo, hi)) for et, lo, hi in pattern
    ]
    types = np.array([r[1] for r in rows])
    ts_list = [r[0] for r in rows]
    n = len(rows)
    pdf = None
    if defines:
        import pandas as pd

        pdf = pd.DataFrame({
            "ts_us": pd.array([r[0] for r in rows], dtype="int64"),
            "event_type": [r[1] for r in rows],
            "event_id": pd.array([r[2] for r in rows], dtype="int64"),
            "val": pd.array(
                [r[3] if len(r) > 3 else 0.0 for r in rows], dtype="float64"
            ),
        })
    masks = []
    for s in steps:
        if defines and s.name in defines:
            masks.append(
                defines[s.name](pdf).to_numpy(dtype=bool, na_value=False)
            )
        elif s.name == "*":
            masks.append(np.ones(n, dtype=bool))
        else:
            masks.append(types == s.name)
    out = []

    def on_match(hit, first, last):
        if emit is not None:
            out.append(emit(key_id, rows, hit))
        else:
            out.append(
                (key_id, rows[first][0], rows[last][0], len(hit[count_idx]))
            )

    consumed, _pending = _scan_closed_prefix(
        steps, masks, ts_list, n, on_match,
        within_us=within_us, open_end_wm_ms=open_end_wm_ms,
        after_match=after_match, ctx_n=ctx_n,
    )
    # pending is only needed for the NEXT-frontier expiry cap, which
    # this surface (no forward navigation) never hits: a pure-within
    # deferral implies the pattern window is still open, so the
    # deferred rows survive the window-expiry filter by construction
    return out, consumed


def _scan_closed_prefix(
    steps,
    masks,
    ts_list,
    n: int,
    on_match,
    *,
    within_us: "int | None" = None,
    open_end_wm_ms: "int | None" = None,
    after_match: "str | tuple[str, str]" = "past_last",
    ctx_n: int = 0,
    dctx=None,
    step_bounds=None,
    gout=None,
    max_steps: "int | None" = None,
    pattern_desc: "str | None" = None,
    strict_budget: bool = False,
):
    """The shared sequential scan over one key's sorted closed prefix —
    the streaming twin of the batch matcher's per-key loop, with the
    two deferral rules :func:`_run_pattern_nfa` documents (undecided
    touched-end failures and growable greedy final variables stop the
    scan). ``steps`` are batch :class:`operators.cep.Step` objects,
    ``masks`` their precomputed boolean arrays over ALL ``n`` rows
    (context included), ``on_match(hit, first, last)`` consumes each
    completed match. Returns ``consumed`` — every row strictly before
    it can leave the buffer.

    ``dctx`` (an :class:`operators.cep._DynCtx` over the closed
    prefix's column arrays) enables match-state-dependent ``Step.dyn``
    predicates. They are watermark-sound as-is: a dyn predicate only
    reads rows already mapped in the current attempt — all at or
    before the candidate row, hence closed — so a dyn rejection is a
    permanent predicate failure and the touched-end deferral rules
    apply unchanged.

    ``step_bounds`` (from :func:`operators.cep._step_bounds`) marks
    each forward-navigating step's undecided frontier; a run cut there
    sets ``touched_end`` bit 2 inside the backtracker. DEFERRAL RULE
    (failure and success alike): an attempt whose exploration was cut
    at a frontier (bit 2 — the frontier mask decides when successors
    close, even inside a closed WITHIN window), or at the closed-data
    end while the pattern window is still open (bit 1 + window_open),
    stops the scan with everything from its start kept buffered. For
    COMPLETED matches this matters because every touched branch was
    tried BEFORE the successful one (greedy preference order): once
    the boundary row decides, greedy could prefer that longer branch
    and a different match, so emitting now could be permanently wrong
    — Flink's NFA likewise holds a partial match open at the stream
    edge. A cut at a WITHIN edge strictly inside the closed prefix is
    a DECIDED verdict (no bit, via ``undecided_n``), so WITHIN and
    NEXT frontiers compose soundly.

    Returns ``(consumed, pending)`` — every row strictly before
    ``consumed`` can leave the buffer; ``pending`` is the start
    position of the attempt that deferred (None when the scan ran to
    the end), which callers must NOT expire rows at/after even when
    their WITHIN window has passed (a frontier-deferred match may be
    decided later by successors alone)."""
    import bisect

    import numpy as np

    from flink_commons_spark.operators.cep import _match_at_ex, _run_ends

    skip_idx = None
    if isinstance(after_match, tuple):
        skip_kind, skip_var = after_match
        if skip_kind not in ("to_first", "to_last"):
            raise ValueError(f"unknown after_match {after_match!r}")
        skip_idx = next(
            (k for k, s in enumerate(steps) if s.name == skip_var), None
        )
        if skip_idx is None:
            raise ValueError(f"after_match variable {skip_var!r} not in pattern")
    elif after_match not in ("past_last", "to_next_row"):
        raise ValueError(f"unknown after_match {after_match!r}")
    # a final SEQUENCE-GROUP step is conservatively always growable at
    # the closed-data end: its hit entry counts ROWS while its
    # quantifier bounds REPETITIONS, so the bounded-final shortcut
    # below would mix units — defer instead (never wrong, a later
    # closing row decides)
    final_hi = (
        None if getattr(steps[-1], "group", None) else steps[-1].hi
    )
    run_ends = _run_ends(masks, n)
    # jump between admissible starts when the first variable is
    # required: a skipped position fails its PREDICATE (permanent,
    # decided) — never a touched-end deferral — so the closed-prefix
    # semantics are unchanged. EXCEPT under NEXT frontiers: the first
    # step's mask at positions at/after its frontier is False only
    # because the successor it reads is not closed yet (NaN), NOT a
    # verdict — those positions are UNDECIDED potential starts and
    # must defer, never be skipped (or expired) as failed.
    starts = None
    if steps[0].lo > 0 and getattr(steps[0], "group", None) is None:
        starts = [p for p in np.flatnonzero(masks[0]).tolist() if p >= ctx_n]
    undec0 = n if step_bounds is None else step_bounds[0]
    s_ptr = 0
    consumed = ctx_n
    i = ctx_n
    while i < n:
        if starts is not None:
            while s_ptr < len(starts) and starts[s_ptr] < i:
                s_ptr += 1
            nxt_start = starts[s_ptr] if s_ptr < len(starts) else None
            u0 = max(i, undec0)
            if u0 < n and (nxt_start is None or u0 < nxt_start):
                # an undecided potential start precedes the next
                # decided one — under the sequential-scan contract it
                # must resolve first: defer there
                return consumed, u0
            if nxt_start is None:
                break
            i = nxt_start
        n_i = n
        if within_us is not None:
            # exclusive window edge, matching Flink's NFA pruning rule
            # (timestamp >= start + window aborts the partial match)
            n_i = bisect.bisect_left(ts_list, ts_list[i] + within_us)
        window_open = open_end_wm_ms is not None and (
            within_us is None
            or (ts_list[i] + within_us) // 1000 >= open_end_wm_ms
        )
        # no failure memo here: the streaming scan consumes touched_end
        hit, touched_end = _match_at_ex(
            masks, steps, i, n_i, run_ends, None, dctx, step_bounds,
            undecided_n=n, gout=gout,
            max_steps=max_steps, pattern_desc=pattern_desc,
            strict_budget=strict_budget,
        )
        # bit 2 (frontier cut) always defers; bit 1 (closed-data end)
        # only while the pattern window is still open — a closed
        # window admits no future row, so its end cuts are decided
        undecided = (touched_end & 2) or ((touched_end & 1) and window_open)
        if hit is None or not any(hit):
            if undecided:
                # ran out of decidable rows mid-pattern (or an all-
                # optional pattern completed EMPTY while a quantified
                # extension was cut at an undecided boundary): this
                # start is undecided — stop here, keep its rows
                # buffered
                return consumed, i
            i += 1
            continue
        first = min(seg[0] for seg in hit if seg)
        last = max(seg[-1] for seg in hit if seg)
        if (
            window_open
            and last == n - 1
            and (final_hi is None or len(hit[-1]) < final_hi)
            and n_i == n
        ):
            # the greedy final variable could still grow with future
            # rows: keep everything from here buffered
            return consumed, i
        if undecided:
            # a COMPLETED match whose exploration was cut at an
            # undecided boundary (touched_end on success): every
            # touched branch precedes the success in greedy preference
            # order, so once the boundary row decides, greedy could
            # prefer that LONGER run and a different match — defer the
            # whole attempt rather than emit a possibly-wrong one
            return consumed, i
        on_match(hit, first, last)
        if after_match == "past_last":
            i = last + 1
        elif after_match == "to_next_row":
            i += 1
        else:
            seg = hit[skip_idx]
            if not seg:
                raise ValueError(
                    f"AFTER MATCH SKIP {skip_kind} {skip_var}: variable "
                    "matched no row (Flink raises here too)"
                )
            nxt = seg[0] if skip_kind == "to_first" else seg[-1]
            if nxt <= i:
                raise ValueError(
                    f"AFTER MATCH SKIP {skip_kind} {skip_var} would not "
                    "advance the scan — infinite loop (Flink raises here too)"
                )
            i = nxt
        consumed = i
    return consumed, None


def _run_funnel_nfa(
    key_id: int,
    rows: "list[tuple[int, str, int]]",
    within_us: "int | None" = None,
):
    """The ``view click+ purchase`` funnel through the generic NFA."""
    return _run_pattern_nfa(key_id, rows, FUNNEL_PATTERN, 1, within_us)


def stream_match_conversions(
    sdf: DataFrame,
    key_col: str = "user_id",
    within_us: "int | None" = None,
    pattern: "list[tuple[str, int, int | None]] | None" = None,
    count_idx: int = 1,
    after_match: "str | tuple[str, str]" = "past_last",
    defines: "dict[str, Any] | None" = None,
    value_col: "str | None" = None,
    emit: "Any | None" = None,
    output_schema: "str | None" = None,
    ctx_rows: "int | None" = None,
    key_buckets: "int | None" = None,
) -> DataFrame:
    """Watermark-gated streaming CEP for the conversion funnel (or any
    ``pattern`` of quantified ``(event_type, lo, hi)`` variables —
    the ``n_clicks`` measure counts variable ``count_idx``'s rows;
    ``after_match`` picks the resume strategy, see
    :func:`_run_pattern_nfa`).

    ``sdf`` must carry ``user_id``, ``ts_us`` (bigint event micros,
    with a watermark declared on its timestamp source) and
    ``event_type``/``event_id``; with ``value_col`` set, that numeric
    column is buffered alongside as ``val``.

    ``within_us`` adds Flink's ``PATTERN ... WITHIN interval``
    semantics: a match must complete within the interval of its first
    event, and — the part that matters at scale — buffered rows whose
    window has passed the watermark are EXPIRED from state (they can
    never join a future match), so per-key state is bounded by the
    within horizon instead of the full unmatched history. Without it
    the operator keeps Flink's unbounded-pattern behavior.

    ``defines`` generalizes variable predicates beyond event-type
    equality (see :func:`_run_pattern_nfa`): backward-looking
    callables over the buffered frame, e.g. Flink's canonical
    ``DOWN AS price < PREV(price)`` as
    ``lambda p: p["val"] < p["val"].shift(1)``. When a match consumes
    rows, the last ``ctx_rows`` consumed rows (default 1 when defines
    are present) stay buffered as CONTEXT so the next row's PREV still
    sees its true predecessor — Flink's PREV navigates the input
    stream, not the retained buffer. One documented divergence: when a
    key's buffer drains COMPLETELY (every row matched, nothing open),
    its state — context included — is dropped so idle keys don't live
    forever; a pattern whose FIRST variable navigates PREV would then
    see NULL at the next arrival where Flink would see the pre-drain
    row. Patterns from the SQL front door start with an unconstrained
    variable or an equality, where this cannot change results.
    ``emit``/``output_schema`` override the per-match output row
    (measures beyond the funnel's count triple)."""
    pat = pattern or FUNNEL_PATTERN
    if ctx_rows is None:
        ctx_rows = 1 if defines else 0
    out_schema = output_schema or MATCH_SCHEMA
    out_cols = [f.strip().split()[0] for f in out_schema.split(",")]

    def _make_settle(wm_ms):
        """Build the PURE per-key settle for one micro-batch's
        watermark: ``settle_core(key_id, rows, nctx, presorted) ->
        (matches, keep, cands)`` with ``keep`` a tagged disposition —
        ``("drop",)`` removes the key's buffer, ``("buf", rows, nctx,
        sorted_flag)`` retains one — and ``cands`` the timer-candidate
        milliseconds (callers arm ``min(c for c in cands if c > wm)``).
        Shared verbatim by the per-key and bucketed executors.

        The re-armed timer targets the next watermark horizon at
        which a buffered DECISION can flip — the moment the oldest
        still-open row becomes closed (more prefix to match: this
        is what lets a key holding the stream's final event still
        emit its earlier, decided matches), and under WITHIN the
        earliest pattern-window close among kept rows (a deferred
        attempt decides, and expired rows leave state, exactly when
        their window passes the watermark). Decisions cannot flip
        between those horizons, so firings track watermark
        advances that matter, not buffered-row count — the same
        per-watermark cadence Flink's CEP operator runs at. A
        fully-closed, within-free buffer has no such horizon; it
        simply waits for future data — correctly still open.

        Context rows always sort first: they were closed when
        consumed (ts < the then-watermark), and every later-
        arriving row is at/above that watermark.

        ``presorted`` flags a buffer read back verbatim from state
        (always stored sorted) — its sort is skipped; and a buffer
        with NOTHING closed yet (the availableNow first batch for
        every key: watermark still 0) is kept as-is, skipping
        sort and scan entirely."""

        def settle_core(key_id, rows, nctx, presorted=False):
            if not any(r[0] // 1000 < wm_ms for r in rows):
                if rows:
                    lo = min(r[0] for r in rows)
                    cand = [lo // 1000 + 1]
                    if within_us is not None:
                        cand.append((lo + within_us) // 1000 + 1)
                    return [], ("buf", rows, nctx, int(presorted)), cand
                return [], ("drop",), []
            if not presorted:
                rows = sorted(rows, key=lambda r: (r[0], r[2]))
            closed = [r for r in rows if r[0] // 1000 < wm_ms]
            still_open = [r for r in rows if r[0] // 1000 >= wm_ms]
            matches, consumed = _run_pattern_nfa(
                key_id, closed, pat, count_idx,
                within_us, open_end_wm_ms=wm_ms, after_match=after_match,
                defines=defines, ctx_n=nctx, emit=emit,
            )
            kept = closed[consumed:] + still_open
            if within_us is not None:
                # expire rows whose pattern window has wholly passed
                # the watermark: every closed start that could include
                # them has already been evaluated, and no future match
                # can reach back past its own within window
                kept = [
                    r for r in kept
                    if (r[0] + within_us) // 1000 >= wm_ms
                ]
            if kept:
                # kept is a suffix of the sorted buffer (prefix cut +
                # monotone-in-ts expiry); re-derive the context as the
                # rows immediately preceding the first kept row
                j = len(rows) - len(kept)
                ctx = rows[max(0, j - ctx_rows) : j] if ctx_rows else []
                rest = ctx + kept
                cand = [max(r[0] for r in kept) // 1000 + 1]
                if still_open:
                    cand.append(min(r[0] for r in still_open) // 1000 + 1)
                if within_us is not None:
                    cand.append(
                        min((r[0] + within_us) // 1000 for r in kept) + 1
                    )
                return matches, ("buf", rest, len(ctx), 1), cand
            return matches, ("drop",), []

        return settle_core

    def fn(
        key: tuple[Any, ...],
        batches: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        key_id = int(key[0])
        wm_ms = state.getCurrentWatermarkMs()
        settle_core = _make_settle(wm_ms)

        if state.hasTimedOut:
            ts, et, eid, val, nctx, srt = state.get
            matches, keep, cands = settle_core(
                key_id,
                list(zip(
                    _unpack(ts, "<i8"), et,
                    _unpack(eid, "<i8"), _unpack(val, "<f8"),
                )),
                int(nctx), bool(srt),
            )
        else:
            new = pd.concat(list(batches))
            ts = list(new["ts_us"].astype("int64"))
            et = list(new["event_type"])
            eid = list(new["event_id"].astype("int64"))
            val = (
                list(new[value_col].astype("float64"))
                if value_col else [0.0] * len(ts)
            )
            nctx = 0
            if state.exists:
                pts, pet, peid, pval, pnctx, _srt = state.get
                ts = _unpack(pts, "<i8") + ts
                et = list(pet) + et
                eid = _unpack(peid, "<i8") + eid
                val = _unpack(pval, "<f8") + val
                nctx = int(pnctx)
            matches, keep, cands = settle_core(
                key_id, list(zip(ts, et, eid, val)), nctx
            )
        if keep[0] == "drop":
            if state.exists:
                state.remove()
        else:
            _, rest, nctx2, srt2 = keep
            state.update((
                _pack_i64([r[0] for r in rest]),
                [r[1] for r in rest],
                _pack_i64([r[2] for r in rest]),
                _pack_f64([r[3] if len(r) > 3 else 0.0 for r in rest]),
                nctx2,
                srt2,
            ))
            live = [t for t in cands if t > wm_ms]
            if live:  # Spark rejects timers at/behind the watermark
                state.setTimeoutTimestamp(min(live))
        if matches:
            yield pd.DataFrame(matches, columns=out_cols)

    def fn_bucket(
        _bkey: tuple[Any, ...],
        batches: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        wm_ms = state.getCurrentWatermarkMs()
        settle_core = _make_settle(wm_ms)
        # ---- decode the bucket's multi-key state
        s_keys = np.empty(0, dtype=np.int64)
        s_ts = s_eid = s_val = None
        s_et: list = []
        s_offs = s_nctx = s_srt = None
        if state.exists:
            bts, bet, beid, bval, bkeys, boffs, bnctx, bsrt = state.get
            s_ts = np.frombuffer(bts or b"", dtype="<i8")
            s_et = list(bet or [])
            s_eid = np.frombuffer(beid or b"", dtype="<i8")
            s_val = np.frombuffer(bval or b"", dtype="<f8")
            s_keys = np.frombuffer(bkeys or b"", dtype="<i8")
            s_offs = np.frombuffer(boffs or b"", dtype="<i8")
            s_nctx = np.frombuffer(bnctx or b"", dtype="<i8")
            s_srt = np.frombuffer(bsrt or b"", dtype="<i8")
        nskeys = len(s_keys)
        order_keys = [int(k) for k in s_keys]
        key_index = {k: i for i, k in enumerate(order_keys)}
        # ---- group this batch's rows per key (stable)
        new = None
        new_codes = np.empty(0, dtype=np.int64)
        if not state.hasTimedOut:
            new = pd.concat(list(batches))
            if len(new):
                codes, uniq = pd.factorize(new[key_col])
                remap = np.empty(len(uniq), dtype=np.int64)
                for j, u in enumerate(uniq):
                    k = int(u)
                    i = key_index.get(k)
                    if i is None:
                        i = len(order_keys)
                        key_index[k] = i
                        order_keys.append(k)
                    remap[j] = i
                new_codes = remap[codes]
            else:
                new = None
        nuni = len(order_keys)
        # ---- combined (state rows first, then new rows) columns +
        # per-row key codes; one stable sort; per-key SLICES
        parts_codes = []
        if nskeys:
            parts_codes.append(np.repeat(
                np.arange(nskeys, dtype=np.int64), np.diff(s_offs)
            ))
        if new is not None:
            parts_codes.append(new_codes)
        comb_codes = (
            np.concatenate(parts_codes) if parts_codes
            else np.empty(0, dtype=np.int64)
        )
        if new is not None:
            n_ts = new["ts_us"].to_numpy("int64")
            n_eid = new["event_id"].to_numpy("int64")
            n_val = (
                new[value_col].to_numpy("float64")
                if value_col else np.zeros(len(new))
            )
            n_et = new["event_type"].to_numpy()
        if s_ts is not None and new is not None:
            c_ts = np.concatenate([s_ts, n_ts])
            c_eid = np.concatenate([s_eid, n_eid])
            c_val = np.concatenate([s_val, n_val])
            c_et = np.concatenate([np.asarray(s_et, dtype=object),
                                   n_et.astype(object)])
        elif new is not None:
            c_ts, c_eid, c_val = n_ts, n_eid, n_val
            c_et = n_et.astype(object)
        else:
            c_ts = s_ts if s_ts is not None else np.empty(0, dtype=np.int64)
            c_eid = s_eid if s_eid is not None else np.empty(0, dtype=np.int64)
            c_val = s_val if s_val is not None else np.empty(0)
            c_et = np.asarray(s_et, dtype=object)
        order = np.argsort(comb_codes, kind="stable")
        comb_sorted = comb_codes[order]
        c_ts, c_eid, c_val = c_ts[order], c_eid[order], c_val[order]
        c_et = c_et[order] if len(order) else c_et
        bnds = np.searchsorted(comb_sorted, np.arange(nuni + 1))
        new_counts = (
            np.bincount(new_codes, minlength=nuni) if len(new_codes)
            else np.zeros(nuni, dtype=np.int64)
        )
        # ---- BUCKET-WIDE "nothing closed" fast path (r15): every key
        # would take settle_core's store-as-is branch — skip the
        # per-key row tuples and packs; one pack per column, vectorized
        # metadata and timer candidates (byte-equivalent, see the
        # generic harness's twin)
        lens_all = np.diff(bnds)
        if (
            nuni
            and not bool((lens_all == 0).any())
            and not int((c_ts // 1000 < wm_ms).sum())
        ):
            nctx_out = np.zeros(nuni, dtype="<i8")
            srt_out = np.zeros(nuni, dtype="<i8")
            if nskeys:
                nctx_out[:nskeys] = s_nctx
                srt_out[:nskeys] = s_srt * (new_counts[:nskeys] == 0)
            state.update((
                c_ts.astype("<i8", copy=False).tobytes(),
                list(c_et),
                c_eid.astype("<i8", copy=False).tobytes(),
                c_val.astype("<f8", copy=False).tobytes(),
                _pack_i64(order_keys),
                bnds.astype("<i8").tobytes(),
                nctx_out.tobytes(),
                srt_out.tobytes(),
            ))
            starts = bnds[:-1]
            lo_k = np.minimum.reduceat(c_ts, starts)
            cand = [lo_k // 1000 + 1]
            if within_us is not None:
                cand.append((lo_k + within_us) // 1000 + 1)
            live = np.concatenate(cand)
            live = live[live > wm_ms]
            if len(live):
                state.setTimeoutTimestamp(int(live.min()))
            return
        # ---- settle every key in the bucket (idempotent for keys
        # whose decision horizon has not moved)
        out_all: list = []
        kept: list = []  # (key, rows, nctx, srt)
        all_cands: list = []
        for ki in range(nuni):
            a, b = int(bnds[ki]), int(bnds[ki + 1])
            rows = list(zip(
                c_ts[a:b].tolist(), c_et[a:b],
                c_eid[a:b].tolist(), c_val[a:b].tolist(),
            ))
            if ki < nskeys:
                nctx_k = int(s_nctx[ki])
                srt_k = bool(s_srt[ki]) and not int(new_counts[ki])
            else:
                nctx_k, srt_k = 0, False
            matches, keep, cands = settle_core(
                order_keys[ki], rows, nctx_k, srt_k
            )
            out_all.extend(matches)
            if keep[0] == "buf":
                kept.append((order_keys[ki], keep[1], keep[2], keep[3]))
                all_cands.extend(cands)
        # ---- re-pack the bucket
        if kept:
            flat = [r for e in kept for r in e[1]]
            lens = [len(e[1]) for e in kept]
            offs = np.zeros(len(kept) + 1, dtype="<i8")
            offs[1:] = np.cumsum(lens)
            state.update((
                _pack_i64([r[0] for r in flat]),
                [r[1] for r in flat],
                _pack_i64([r[2] for r in flat]),
                _pack_f64([r[3] if len(r) > 3 else 0.0 for r in flat]),
                _pack_i64([e[0] for e in kept]),
                offs.tobytes(),
                _pack_i64([e[2] for e in kept]),
                _pack_i64([e[3] for e in kept]),
            ))
            live = [t for t in all_cands if t > wm_ms]
            if live:  # Spark rejects timers at/behind the watermark
                state.setTimeoutTimestamp(min(live))
        elif state.exists:
            state.remove()
        if out_all:
            yield pd.DataFrame(out_all, columns=out_cols)

    # ---- bucketed-state resolution — same knob and same rationale as
    # :func:`stream_match_pattern` (see its docstring); the funnel's
    # key must be integer-typed either way (``key_id = int(key[0])``)
    spark = sdf.sparkSession
    if key_buckets is None:
        raw = spark.conf.get("spark.flinkcommons.stream.match.buckets", "")
        if raw:
            key_buckets = int(raw)
        else:
            try:
                key_buckets = 4 * int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                )
            except Exception:
                key_buckets = 64
    key_type = {
        f.name: f.dataType.simpleString() for f in sdf.schema.fields
    }.get(key_col)
    if key_buckets and int(key_buckets) > 0 and key_type in (
        "tinyint", "smallint", "int", "bigint"
    ):
        from pyspark.sql import functions as F

        bucket = F.pmod(F.xxhash64(key_col), F.lit(int(key_buckets)))
        return (
            sdf.withColumn("__mr_bucket", bucket)
            .groupBy("__mr_bucket")
            .applyInPandasWithState(
                fn_bucket,
                out_schema,
                BUCKET_BUFFER_STATE_SCHEMA,
                "append",
                GroupStateTimeout.EventTimeTimeout,
            )
        )
    return sdf.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        BUFFER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


#: Spark SQL column type → (state field type, numpy dtype or None)
#: Numeric buffers live in state as a single PACKED ``binary`` blob
#: (``ndarray.tobytes()`` on store, zero-copy ``np.frombuffer`` on
#: load) — a settle's store/load is then one memcpy per column instead
#: of O(rows) Python boxing through ``tolist()``/``pd.array(list)``,
#: the dominant state-transfer slice in the sf1 settle profile
#: (PERFORMANCE.md §4c). Strings stay ``array<string>`` (variable
#: width; Arrow's string transport already avoids per-row boxing).
#: NOTE: this is a state-SCHEMA change — checkpoints written by
#: earlier builds do not restore across it (Spark validates the state
#: schema); streaming checkpoints are not forward-compatible across
#: engine upgrades that repack state.
_BUF_TYPES = {
    "tinyint": ("binary", "<i8"), "smallint": ("binary", "<i8"),
    "int": ("binary", "<i8"), "bigint": ("binary", "<i8"),
    "float": ("binary", "<f8"), "double": ("binary", "<f8"),
    "string": ("array<string>", None),
}


def _enc_buf(series, spark_type):
    """One state value for a buffered column: packed bytes for numeric
    columns, a plain list for strings. NULLs in an INTEGER buffer are
    rejected loudly — ``to_numpy('int64')`` would silently cast NaN to
    INT64_MIN and corrupt every later predicate/measure read (float
    buffers round-trip NaN faithfully, so they pass through)."""
    np_dt = _BUF_TYPES[spark_type][1]
    if np_dt is None:
        return series.tolist()
    if (
        np_dt == "<i8"
        and series.dtype.kind not in "iu"
        and series.isna().any()
    ):
        raise ValueError(
            f"NULL in integer buffered column {series.name!r} — streaming "
            "MATCH_RECOGNIZE buffers integer columns as packed int64 state "
            "and cannot represent NULL; filter NULL rows out (or cast the "
            "column to double) in the source view"
        )
    return series.to_numpy(np_dt).tobytes()


def _enc_arr(arr, spark_type):
    """Array-level twin of :func:`_enc_buf` for the bucketed fast path
    (one conversion per COLUMN instead of one per key per column), with
    the same loud NULL-in-integer guard."""
    import numpy as np
    import pandas as pd

    np_dt = _BUF_TYPES[spark_type][1]
    if np_dt is None:
        return list(arr)
    a = np.asarray(arr)
    if np_dt == "<i8" and a.dtype.kind not in "iu" and pd.isna(a).any():
        raise ValueError(
            "NULL in integer buffered column — streaming MATCH_RECOGNIZE "
            "buffers integer columns as packed int64 state and cannot "
            "represent NULL; filter NULL rows out (or cast the column to "
            "double) in the source view"
        )
    return a.astype(np_dt, copy=False).tobytes()


def _dec_buf(val, spark_type):
    """Inverse of :func:`_enc_buf` — numeric blobs decode as ZERO-COPY
    (read-only) numpy views; every mutating consumer copies anyway
    (``take``/``concat``)."""
    import numpy as np
    import pandas as pd

    np_dt = _BUF_TYPES[spark_type][1]
    if np_dt is None:
        return pd.array(val if val is not None else [], dtype=None)
    return np.frombuffer(val if val is not None else b"", dtype=np_dt)


def stream_match_pattern(
    sdf: DataFrame,
    key_cols: "list[str]",
    order_cols: "list[str]",
    steps,
    measures,
    output_schema: str,
    buffer_cols: "list[tuple[str, str]]",
    after_match: "str | tuple[str, str]" = "past_last",
    within_us: "int | None" = None,
    ctx_rows: int = 1,
    frame_renames: "dict[str, str] | None" = None,
    all_rows: bool = False,
    number_matches: bool = False,
    durable_match_no: bool = False,
    max_steps: "int | None" = None,
    pattern_desc: "str | None" = None,
    strict_budget: bool = False,
    key_buckets: "int | None" = None,
) -> DataFrame:
    """GENERIC watermark-gated streaming MATCH_RECOGNIZE — the
    streaming twin of :func:`operators.cep.match_pattern` with the
    SAME surface: batch :class:`Step` objects (arbitrary
    backward-looking ``where`` callables over the buffered frame) and
    a ``measures(key, segs)`` callable over zero-copy segment views.
    This is what the SQL front door routes streaming sources to.

    ``key_buckets`` (r15) coarsens the STATE KEY the same way the
    batch executor's ``group_buckets`` coarsens its shuffle key: the
    stateful operator groups on ``pmod(xxhash64(key), buckets)`` and
    each state row holds the PACKED MULTI-KEY buffers of every key in
    the bucket (per-column concatenated blobs + per-key offsets/ctx/
    sort-flag/ordinal arrays), while matching still runs strictly per
    key inside the closure — semantics are identical (per-key timers
    become the bucket's min; an early settle of an unaffected key is a
    no-op by construction because verdicts only depend on the
    watermark, which is bucket-global). Why: the
    ``applyInPandasWithState`` transport pays a per-KEY-GROUP Arrow
    framing + state-store row cost of ~0.9-1.3 s per 100k-row
    micro-batch at 1.5k keys regardless of Python work (r14 profile) —
    with buckets the protocol cost tracks bucket count. Default: the
    ``spark.flinkcommons.stream.match.buckets`` session conf, else
    4 x ``spark.sql.shuffle.partitions`` (scale-adaptive: a real
    cluster raising its parallelism raises the bucket count with it);
    0 disables (one state row per key, the pre-r15 layout). Trade
    documented for 100 TB: a bucket's state is round-tripped whenever
    ANY of its keys sees data, so idle-key buffers ride along — they
    are watermark-bounded, and keys-per-bucket stays
    cardinality/buckets. NOTE: a state-SCHEMA change — checkpoints
    written by the per-key layout do not restore into the bucketed
    one (or vice versa).

    FORWARD navigation (``NEXT(expr, k)`` — ``Step.next_depth > 0``)
    is sound via PER-STEP frontiers: a forward-navigating step's last
    ``next_depth`` closed rows have not-yet-decided masks (they read
    successors that may not have arrived), so the backtracker treats
    them, for that step only, like rows past the data end — attempts
    needing them defer, while a decided match whose rows all sit
    before their steps' frontiers emits even at the buffer tail.
    Within the closed prefix every row's k-th successor is final once
    it exists — a future arrival has event time at/after the
    watermark, hence sorts strictly after every closed row — so a
    pending row becomes decidable exactly when enough later rows close
    behind it. A row whose successor never arrives stays pending —
    Flink's NEXT over an unbounded stream likewise never resolves at
    the stream's edge. NEXT composes with ``within_us``: the
    backtracker classifies every boundary cut (``undecided_n``) — a
    WITHIN-edge cut strictly inside the closed prefix is a DECIDED
    verdict, a frontier or closed-data-end cut defers — and window
    expiry never drops rows at/after a deferred attempt's start.

    ``frame_renames`` (buffered name → reader-visible name) exposes a
    buffered column to the predicate/measure callables under a
    different name — used for watermark columns, which must stay
    timestamp-typed in the plan (the stateful operator requires the
    watermark-tagged attribute) while their epoch-µs twin is what gets
    buffered. State round-trips under the buffered names.

    ``sdf`` must carry ``key_cols``, every ``buffer_cols`` column, and
    a watermark on its event-time source. ``order_cols`` name the
    per-key sort (first one the int64 event-time µs column the
    watermark closes and WITHIN is measured on). ``buffer_cols`` is
    ``[(name, spark_type)]`` for every column the predicates/measures
    read — each key's state is exactly those arrays over its unmatched
    buffer plus up to ``ctx_rows`` context rows (see
    :func:`stream_match_conversions` on the PREV/context rule and the
    drained-buffer divergence).

    Closed-prefix semantics are byte-identical to the funnel harness —
    both run :func:`_scan_closed_prefix`.

    ``all_rows=True`` is the streaming ``ALL ROWS PER MATCH`` mode (a
    flagged SQL:2016 extension — Flink 1.16 rejects the row mode
    entirely): ``measures`` is then called as ``measures(key, segs,
    match_seq)`` and must return a per-match COLUMNAR chunk
    ``(n_rows, {col: array|scalar})``; every chunk of a settle
    assembles into one frame (``operators.cep._assemble_all_rows`` —
    no per-row Python loop). ``match_seq`` is the per-key scan-order
    match ordinal (``MATCH_NUMBER()``), persisted in state across
    settles by an extra ``nmatch`` state field — appended ONLY in this
    mode, so existing one-row checkpoints keep their layout. One
    documented divergence: when a key's buffer fully drains its state
    (counter included) is dropped, so on a genuinely unbounded stream
    a key that re-appears after a complete drain restarts MATCH_NUMBER
    at 1; a bounded replay (availableNow) settles every match before
    the drain, where numbering equals the batch executor's.
    ``durable_match_no=True`` opts out of that divergence: a fully
    drained key keeps a counter-only tombstone (empty buffers + the
    ``nmatch`` bigint — same state layout, no timer), so ordinals
    continue across drains. Because the tombstone sets NO timeout
    timer and ``applyInPandasWithState`` only evicts keys whose own
    timer fires, no idle period — however long — can drop it: the
    ordinal survives arbitrary idleness (pinned by
    ``test_streaming_durable_match_number_survives_long_idle``) and
    restarts only when the state itself is externally cleared (a new
    checkpoint). One bigint per ever-seen key for the checkpoint's
    lifetime is the documented cost of stable ordinals on an
    unbounded keyspace."""
    import numpy as np
    import pandas as pd

    from flink_commons_spark.operators.cep import (
        _DynCtx,
        _Seg,
        _add_alt_segs,
        _add_group_segs,
        _alt_member_masks,
        _assemble_all_rows,
        _group_masks,
        _step_bounds,
    )

    has_dyn = any(getattr(s, "dyn", None) is not None for s in steps)
    has_next = any(getattr(s, "next_depth", 0) for s in steps)
    # MATCH_NUMBER tracking: ALL ROWS always; ONE ROW when the
    # measures read the ordinal (``number_matches``) — the ``nmatch``
    # state field is appended ONLY in these modes, so numbered and
    # plain checkpoints each keep a stable layout
    track_no = all_rows or number_matches
    ts_col = order_cols[0]
    for c, t in buffer_cols:
        if t not in _BUF_TYPES:
            raise ValueError(
                f"streaming MATCH_RECOGNIZE cannot buffer column {c!r} of "
                f"type {t!r} — supported: {sorted(_BUF_TYPES)} (cast "
                "timestamps to epoch micros in the source view)"
            )
    out_cols = [f.strip().split()[0] for f in output_schema.split(",")]
    step_list = list(steps)
    nbuf = len(buffer_cols)

    # ---- bucketed-state resolution (see docstring) -------------------
    spark = sdf.sparkSession
    if key_buckets is None:
        raw = spark.conf.get("spark.flinkcommons.stream.match.buckets", "")
        if raw:
            key_buckets = int(raw)
        else:
            try:
                key_buckets = 4 * int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                )
            except Exception:
                key_buckets = 64
    types_all = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    key_types = [types_all.get(c) for c in key_cols]
    nkf = len(key_types)
    bucketed = (
        bool(key_buckets) and int(key_buckets) > 0
        and all(t in _BUF_TYPES for t in key_types)
    )
    if bucketed:
        # per-BUCKET multi-key state: the per-column buffers of every
        # key in the bucket concatenated in key order, the per-key key
        # values, and the per-key offsets/nctx/sorted-flag (+ ordinal)
        # arrays — all int64 little-endian packed binary
        state_schema = ", ".join(
            [f"{c} {_BUF_TYPES[t][0]}" for c, t in buffer_cols]
            + [f"__mrk{i} {_BUF_TYPES[t][0]}" for i, t in enumerate(key_types)]
            + ["__mro binary", "__mrc binary", "__mrs binary"]
            + (["__mrn binary"] if track_no else [])
        )
    else:
        state_schema = ", ".join(
            [f"{c} {_BUF_TYPES[t][0]}" for c, t in buffer_cols]
            + ["nctx int", "presorted int"]
            + (["nmatch bigint"] if track_no else [])
        )

    def _make_settle(wm_ms):
        """Build the PURE per-key settle for one micro-batch's
        watermark: ``settle_core(key, pdf_all, nctx, presorted,
        nmatch) -> (matches, keep, cands)``. ``keep`` is a tagged
        disposition — ``("drop",)`` removes the key's buffer,
        ``("tomb", n)`` keeps a durable-MATCH_NUMBER counter tombstone,
        ``("buf", rest_pdf, nctx, sorted_flag, nmatch)`` retains a
        buffer; ``cands`` are the timer-candidate milliseconds (the
        caller arms ``min(c for c in cands if c > wm)``). Shared
        verbatim by the per-key and bucketed executors, so their
        closed-prefix semantics are identical by construction."""

        def settle_core(key, pdf_all: "pd.DataFrame", nctx: int,
                        presorted: bool, nmatch: int = 0):
            total = len(pdf_all)
            ts_raw = pdf_all[ts_col].to_numpy("int64")
            if not int((ts_raw // 1000 < wm_ms).sum()):
                # NOTHING closed yet — the availableNow FIRST batch for
                # every key (watermark still 0) and any key whose rows
                # all sit at/after the watermark: matching cannot make
                # progress, so keep the buffer AS-IS (order preserved;
                # context rows, if any, stay leading — new arrivals are
                # at/after the watermark, hence never sort before them)
                # and skip the sort/mask/scan entirely.
                if total:
                    lo = int(ts_raw.min())
                    cands = [int(ts_raw.max()) // 1000 + 1, lo // 1000 + 1]
                    if within_us is not None:
                        cands.append((lo + within_us) // 1000 + 1)
                    return [], ("buf", pdf_all, nctx, int(presorted), nmatch), cands
                if track_no and durable_match_no and nmatch:
                    # counter-only tombstone — MATCH_NUMBER ordinals
                    # survive a full buffer drain (opt-in; no timer)
                    return [], ("tomb", nmatch), []
                return [], ("drop",), []
            if not presorted:
                try:
                    order = np.lexsort(tuple(
                        pdf_all[c].to_numpy() for c in reversed(order_cols)
                    ))
                    pdf_all = pdf_all.take(order).reset_index(drop=True)
                except TypeError:  # non-lexsortable dtype — pandas fallback
                    pdf_all = pdf_all.sort_values(
                        list(order_cols), kind="mergesort"
                    ).reset_index(drop=True)
                ts = pdf_all[ts_col].to_numpy("int64")
            else:
                # state is stored sorted (flagged) — a timer settle
                # re-reads it verbatim, so the lexsort would be a no-op
                ts = ts_raw
            closed_n = int(np.searchsorted(ts // 1000, wm_ms, side="left"))
            pdf_closed = pdf_all.iloc[:closed_n]
            if frame_renames:
                pdf_closed = pdf_closed.rename(columns=frame_renames)
            masks = _group_masks(step_list, pdf_closed)
            alt_masks = _alt_member_masks(step_list, pdf_closed)
            gout: "dict | None" = (
                {} if any(s.group is not None for s in step_list) else None
            )
            cols = {c: pdf_closed[c].to_numpy() for c in pdf_closed.columns}
            out = []
            seq = [nmatch]  # per-key MATCH_NUMBER cursor (track_no modes)

            def on_match(hit, first, last):
                segs = {
                    s.name: _Seg(cols, pos)
                    for s, pos in zip(step_list, hit)
                }
                if alt_masks:
                    _add_alt_segs(step_list, hit, alt_masks, cols, segs)
                if gout is not None:
                    # the scan calls on_match synchronously right after
                    # the successful attempt fills gout
                    _add_group_segs(step_list, gout, cols, segs)
                if all_rows or number_matches:
                    seq[0] += 1
                    out.append(measures(key, segs, seq[0]))
                else:
                    out.append(measures(key, segs))

            consumed, pending = _scan_closed_prefix(
                step_list, masks, ts[:closed_n].tolist(), closed_n, on_match,
                within_us=within_us, open_end_wm_ms=wm_ms,
                after_match=after_match, ctx_n=nctx,
                dctx=_DynCtx(cols) if has_dyn else None,
                step_bounds=(
                    _step_bounds(step_list, closed_n) if has_next else None
                ),
                gout=gout,
                max_steps=max_steps, pattern_desc=pattern_desc,
                strict_budget=strict_budget,
            )
            keep_from = consumed
            if within_us is not None:
                # expired-window drop is a further prefix cut: monotone
                # in ts, and open rows never satisfy the condition.
                # Never expire at/after a deferred attempt's start — a
                # frontier-deferred match (NEXT) may still be decided
                # by successors alone even after its window passed
                exp_stop = total if pending is None else min(total, pending)
                while (
                    keep_from < exp_stop
                    and (int(ts[keep_from]) + within_us) // 1000 < wm_ms
                ):
                    keep_from += 1
            if keep_from < total:
                ctx_start = max(0, keep_from - ctx_rows)
                rest = pdf_all.iloc[ctx_start:]
                cands = [int(ts[total - 1]) // 1000 + 1]
                if closed_n < total:
                    cands.append(int(ts[closed_n]) // 1000 + 1)
                if within_us is not None:
                    cands.append((int(ts[keep_from]) + within_us) // 1000 + 1)
                return out, ("buf", rest, keep_from - ctx_start, 1, seq[0]), cands
            if track_no and durable_match_no and seq[0]:
                return out, ("tomb", seq[0]), []
            return out, ("drop",), []

        return settle_core

    def fn(key, batches, state):
        wm_ms = state.getCurrentWatermarkMs()
        settle_core = _make_settle(wm_ms)
        if state.hasTimedOut:
            vals = state.get
            pdf_all = pd.DataFrame({
                c: _dec_buf(vals[i], t)
                for i, (c, t) in enumerate(buffer_cols)
            })
            matches, keep, cands = settle_core(
                key, pdf_all, int(vals[nbuf]), bool(vals[nbuf + 1]),
                int(vals[nbuf + 2]) if track_no else 0,
            )
        else:
            new = pd.concat(list(batches))[[c for c, _ in buffer_cols]]
            nctx = 0
            nmatch = 0
            if state.exists:
                vals = state.get
                prev = pd.DataFrame({
                    c: _dec_buf(vals[i], t)
                    for i, (c, t) in enumerate(buffer_cols)
                })
                new = pd.concat([prev, new], ignore_index=True)
                nctx = int(vals[nbuf])
                if track_no:
                    nmatch = int(vals[nbuf + 2])
            matches, keep, cands = settle_core(
                key, new.reset_index(drop=True), nctx, False, nmatch
            )
        tag = keep[0]
        if tag == "drop":
            if state.exists:
                state.remove()
        elif tag == "tomb":
            state.update(tuple(
                [(b"" if _BUF_TYPES[t][1] else []) for _, t in buffer_cols]
                + [0, 1, keep[1]]
            ))
        else:
            _, rest, nctx2, srt, nm = keep
            state.update(tuple(
                [_enc_buf(rest[c], t) for c, t in buffer_cols]
                + [nctx2, srt]
                + ([nm] if track_no else [])
            ))
            live = [t for t in cands if t > wm_ms]
            if live:  # Spark rejects timers at/behind the watermark
                state.setTimeoutTimestamp(min(live))
        if matches:
            yield (
                _assemble_all_rows(matches, out_cols) if all_rows
                else pd.DataFrame(matches, columns=out_cols)
            )

    def _key_scalar(v):
        """One grouping-key value as the plain Python scalar Spark's
        per-key grouping would have handed the closure (numpy scalars
        unboxed, NaN/NaT folded to None so state and new-data keys
        unify)."""
        if v is None:
            return None
        try:
            if v != v:  # NaN
                return None
        except Exception:
            pass
        return v.item() if hasattr(v, "item") else v

    def fn_bucket(_bkey, batches, state):
        wm_ms = state.getCurrentWatermarkMs()
        settle_core = _make_settle(wm_ms)
        # ---- decode the bucket's multi-key state
        skeys: "list[tuple]" = []
        s_cols = None
        s_offs = s_nctx = s_srt = s_nmatch = None
        if state.exists:
            vals = state.get
            s_cols = {
                c: _dec_buf(vals[i], t)
                for i, (c, t) in enumerate(buffer_cols)
            }
            karrs = [
                _dec_buf(vals[nbuf + i], kt)
                for i, kt in enumerate(key_types)
            ]
            s_offs = np.frombuffer(vals[nbuf + nkf] or b"", dtype="<i8")
            s_nctx = np.frombuffer(vals[nbuf + nkf + 1] or b"", dtype="<i8")
            s_srt = np.frombuffer(vals[nbuf + nkf + 2] or b"", dtype="<i8")
            if track_no:
                s_nmatch = np.frombuffer(
                    vals[nbuf + nkf + 3] or b"", dtype="<i8"
                )
            skeys = [
                tuple(_key_scalar(karrs[i][j]) for i in range(nkf))
                for j in range(len(s_nctx))
            ]
        nskeys = len(skeys)
        order_keys = list(skeys)
        key_index = {k: i for i, k in enumerate(order_keys)}
        # ---- group this batch's rows per key (stable — arrival order
        # within a key is preserved, exactly the per-key concat order)
        new = None
        new_codes = np.empty(0, dtype=np.int64)
        if not state.hasTimedOut:
            new = pd.concat(list(batches))
            if len(new):
                if nkf == 1:
                    codes, uniq = pd.factorize(
                        new[key_cols[0]], use_na_sentinel=False
                    )
                    uniq_keys = [(_key_scalar(u),) for u in uniq]
                else:
                    codes, uniq = pd.factorize(
                        pd.Series(
                            list(zip(*(new[c] for c in key_cols))),
                            dtype=object,
                        ),
                        use_na_sentinel=False,
                    )
                    uniq_keys = [
                        tuple(_key_scalar(x) for x in u) for u in uniq
                    ]
                remap = np.empty(len(uniq_keys), dtype=np.int64)
                for j, k in enumerate(uniq_keys):
                    i = key_index.get(k)
                    if i is None:
                        i = len(order_keys)
                        key_index[k] = i
                        order_keys.append(k)
                    remap[j] = i
                new_codes = remap[codes]
            else:
                new = None
        nuni = len(order_keys)
        # ---- one combined (state rows first, then new rows) column
        # set + per-row key codes; one stable sort; per-key SLICES
        parts_codes = []
        if nskeys:
            parts_codes.append(np.repeat(
                np.arange(nskeys, dtype=np.int64), np.diff(s_offs)
            ))
        if new is not None:
            parts_codes.append(new_codes)
        comb_codes = (
            np.concatenate(parts_codes) if parts_codes
            else np.empty(0, dtype=np.int64)
        )
        arrs = {}
        for c, t in buffer_cols:
            parts = []
            if s_cols is not None:
                parts.append(np.asarray(s_cols[c]))
            if new is not None:
                parts.append(new[c].to_numpy())
            if not parts:
                np_dt = _BUF_TYPES[t][1]
                a = np.empty(0, dtype=(object if np_dt is None else np_dt))
            elif len(parts) == 1:
                a = parts[0]
            else:
                a = np.concatenate(parts)
            arrs[c] = a
        order = np.argsort(comb_codes, kind="stable")
        comb_sorted = comb_codes[order]
        arrs = {c: a[order] for c, a in arrs.items()}
        bnds = np.searchsorted(comb_sorted, np.arange(nuni + 1))
        new_counts = (
            np.bincount(new_codes, minlength=nuni) if len(new_codes)
            else np.zeros(nuni, dtype=np.int64)
        )
        # ---- BUCKET-WIDE "nothing closed" fast path (r15): the
        # availableNow FIRST batch (watermark 0) hits every bucket with
        # 100 % open rows — every key would take settle_core's
        # store-as-is branch, so skip the per-key frames and per-key
        # encodes entirely: one encode per COLUMN over the already
        # key-grouped arrays, vectorized per-key metadata and timer
        # candidates. Byte-equivalent to the per-key loop by
        # construction (same store-as-is values, same candidate set);
        # zero-row segments (durable-MATCH_NUMBER tombstones) are the
        # one shape the loop treats specially, so their presence falls
        # through to it.
        lens_all = np.diff(bnds)
        ts_all = arrs[ts_col]
        if (
            nuni
            and not bool((lens_all == 0).any())
            and not int((ts_all // 1000 < wm_ms).sum())
        ):
            blobs = [_enc_arr(arrs[c], t) for c, t in buffer_cols]
            for i, kt in enumerate(key_types):
                np_dt = _BUF_TYPES[kt][1]
                vals_i = [k[i] for k in order_keys]
                if np_dt is None:
                    blobs.append(vals_i)
                else:
                    if any(v is None for v in vals_i):
                        raise ValueError(
                            "NULL numeric partition key in bucketed "
                            "streaming MATCH_RECOGNIZE — filter NULL keys "
                            "in the source view or disable bucketing (SET "
                            "'spark.flinkcommons.stream.match.buckets'"
                            "='0')"
                        )
                    blobs.append(np.asarray(vals_i, dtype=np_dt).tobytes())
            nctx_out = np.zeros(nuni, dtype="<i8")
            srt_out = np.zeros(nuni, dtype="<i8")
            nm_out = np.zeros(nuni, dtype="<i8")
            if nskeys:
                nctx_out[:nskeys] = s_nctx
                srt_out[:nskeys] = s_srt * (new_counts[:nskeys] == 0)
                if track_no:
                    nm_out[:nskeys] = s_nmatch
            state.update(tuple(
                blobs
                + [bnds.astype("<i8").tobytes(),
                   nctx_out.tobytes(), srt_out.tobytes()]
                + ([nm_out.tobytes()] if track_no else [])
            ))
            starts = bnds[:-1]
            lo_k = np.minimum.reduceat(ts_all, starts)
            hi_k = np.maximum.reduceat(ts_all, starts)
            cand = [hi_k // 1000 + 1, lo_k // 1000 + 1]
            if within_us is not None:
                cand.append((lo_k + within_us) // 1000 + 1)
            live = np.concatenate(cand)
            live = live[live > wm_ms]
            if len(live):
                state.setTimeoutTimestamp(int(live.min()))
            return
        # ---- settle every key in the bucket (idempotent for keys
        # whose decision horizon has not moved — verdicts only depend
        # on the bucket-global watermark)
        out_all: list = []
        kept: list = []  # (key, rest_pdf | None-for-tombstone, nctx, srt, nm)
        all_cands: list = []
        for ki in range(nuni):
            a, b = int(bnds[ki]), int(bnds[ki + 1])
            pdf_k = pd.DataFrame({c: arr[a:b] for c, arr in arrs.items()})
            if ki < nskeys:
                nctx_k = int(s_nctx[ki])
                nm_k = int(s_nmatch[ki]) if track_no else 0
                srt_k = bool(s_srt[ki]) and not int(new_counts[ki])
            else:
                nctx_k, nm_k, srt_k = 0, 0, False
            matches, keep, cands = settle_core(
                order_keys[ki], pdf_k, nctx_k, srt_k, nm_k
            )
            out_all.extend(matches)
            tag = keep[0]
            if tag == "buf":
                kept.append(
                    (order_keys[ki], keep[1], keep[2], keep[3], keep[4])
                )
                all_cands.extend(cands)
            elif tag == "tomb":
                kept.append((order_keys[ki], None, 0, 1, keep[1]))
        # ---- re-pack the bucket: per-column concatenated blobs +
        # per-key key values / offsets / nctx / sorted-flag (+ ordinal)
        if kept:
            blobs: list = []
            for c, t in buffer_cols:
                if _BUF_TYPES[t][1] is None:
                    lst: list = []
                    for e in kept:
                        if e[1] is not None:
                            lst.extend(_enc_buf(e[1][c], t))
                    blobs.append(lst)
                else:
                    blobs.append(b"".join(
                        _enc_buf(e[1][c], t) for e in kept if e[1] is not None
                    ))
            for i, kt in enumerate(key_types):
                np_dt = _BUF_TYPES[kt][1]
                vals_i = [e[0][i] for e in kept]
                if np_dt is None:
                    blobs.append(vals_i)
                else:
                    if any(v is None for v in vals_i):
                        raise ValueError(
                            "NULL numeric partition key in bucketed "
                            "streaming MATCH_RECOGNIZE — filter NULL keys "
                            "in the source view or disable bucketing (SET "
                            "'spark.flinkcommons.stream.match.buckets'"
                            "='0')"
                        )
                    blobs.append(np.asarray(vals_i, dtype=np_dt).tobytes())
            lens = [(len(e[1]) if e[1] is not None else 0) for e in kept]
            offs = np.zeros(len(kept) + 1, dtype="<i8")
            offs[1:] = np.cumsum(lens)
            state.update(tuple(
                blobs
                + [offs.tobytes(),
                   np.asarray([e[2] for e in kept], dtype="<i8").tobytes(),
                   np.asarray([e[3] for e in kept], dtype="<i8").tobytes()]
                + ([np.asarray([e[4] for e in kept], dtype="<i8").tobytes()]
                   if track_no else [])
            ))
            live = [t for t in all_cands if t > wm_ms]
            if live:  # Spark rejects timers at/behind the watermark
                state.setTimeoutTimestamp(min(live))
        elif state.exists:
            state.remove()
        if out_all:
            yield (
                _assemble_all_rows(out_all, out_cols) if all_rows
                else pd.DataFrame(out_all, columns=out_cols)
            )

    if bucketed:
        from pyspark.sql import functions as F

        bucket = F.pmod(F.xxhash64(*key_cols), F.lit(int(key_buckets)))
        return (
            sdf.withColumn("__mr_bucket", bucket)
            .groupBy("__mr_bucket")
            .applyInPandasWithState(
                fn_bucket,
                output_schema,
                state_schema,
                "append",
                GroupStateTimeout.EventTimeTimeout,
            )
        )
    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn,
        output_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
