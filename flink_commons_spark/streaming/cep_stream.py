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
#: state: the key's buffered (ts, event_type, event_id) columns
BUFFER_STATE_SCHEMA = "ts array<long>, et array<string>, eid array<long>"
_COLS = ["user_id", "start_us", "end_us", "n_clicks"]


def _run_funnel_nfa(
    key_id: int,
    rows: "list[tuple[int, str, int]]",
    within_us: "int | None" = None,
):
    """Greedy ``view click+ purchase`` matching over sorted rows via
    the shared batch backtracker; returns (matches, consumed_count).

    With ``within_us`` set (Flink's ``PATTERN ... WITHIN interval``),
    a match starting at row ``i`` may only extend over rows whose
    event time is at most ``rows[i].ts + within_us`` — matches are
    contiguous here, so bounding the scan end enforces exactly "the
    match completes within the interval"."""
    import bisect

    import numpy as np

    from flink_commons_spark.operators.cep import Step, _match_at

    steps = [
        Step("v", None),
        Step("c", None, plus=True),
        Step("p", None),
    ]
    types = np.array([r[1] for r in rows])
    ts_list = [r[0] for r in rows]
    masks = [types == "view", types == "click", types == "purchase"]
    out = []
    consumed = 0
    i = 0
    n = len(rows)
    while i < n:
        n_i = n
        if within_us is not None:
            n_i = bisect.bisect_right(ts_list, rows[i][0] + within_us)
        hit = _match_at(masks, steps, i, n_i)
        if hit is None:
            i += 1
            continue
        v_pos, c_pos, p_pos = hit[0][0], hit[1], hit[2][0]
        out.append(
            (key_id, rows[v_pos][0], rows[p_pos][0], len(c_pos))
        )
        i = p_pos + 1
        consumed = i
    return out, consumed


def stream_match_conversions(
    sdf: DataFrame, key_col: str = "user_id", within_us: "int | None" = None
) -> DataFrame:
    """Watermark-gated streaming CEP for the conversion funnel.

    ``sdf`` must carry ``user_id``, ``ts_us`` (bigint event micros,
    with a watermark declared on its timestamp source) and
    ``event_type``/``event_id``.

    ``within_us`` adds Flink's ``PATTERN ... WITHIN interval``
    semantics: a match must complete within the interval of its first
    event, and — the part that matters at scale — buffered rows whose
    window has passed the watermark are EXPIRED from state (they can
    never join a future match), so per-key state is bounded by the
    within horizon instead of the full unmatched history. Without it
    the operator keeps Flink's unbounded-pattern behavior.
    """

    def fn(
        key: tuple[Any, ...],
        batches: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        key_id = int(key[0])
        wm_ms = state.getCurrentWatermarkMs()

        def settle(rows):
            """Match the watermark-closed prefix; re-buffer the rest.
            A timer is registered only when it sits strictly past the
            watermark (Spark rejects earlier ones); a buffer whose
            newest row is already closed but unmatched simply waits for
            future data — correctly still open."""
            rows = sorted(rows, key=lambda r: (r[0], r[2]))
            closed = [r for r in rows if r[0] // 1000 < wm_ms]
            still_open = [r for r in rows if r[0] // 1000 >= wm_ms]
            matches, consumed = _run_funnel_nfa(key_id, closed, within_us)
            rest = closed[consumed:] + still_open
            if within_us is not None:
                # expire rows whose pattern window has wholly passed
                # the watermark: every closed start that could include
                # them has already been evaluated, and no future match
                # can reach back past its own within window
                rest = [
                    r for r in rest
                    if (r[0] + within_us) // 1000 >= wm_ms
                ]
            if rest:
                state.update((
                    [r[0] for r in rest],
                    [r[1] for r in rest],
                    [r[2] for r in rest],
                ))
                timer = max(r[0] for r in rest) // 1000 + 1
                if timer > wm_ms:
                    state.setTimeoutTimestamp(timer)
            elif state.exists:
                state.remove()
            return matches

        if state.hasTimedOut:
            ts, et, eid = state.get
            matches = settle(list(zip(ts, et, eid)))
            if matches:
                yield pd.DataFrame(matches, columns=_COLS)
            return

        new = pd.concat(list(batches))
        ts = list(new["ts_us"].astype("int64"))
        et = list(new["event_type"])
        eid = list(new["event_id"].astype("int64"))
        if state.exists:
            pts, pet, peid = state.get
            ts, et, eid = list(pts) + ts, list(pet) + et, list(peid) + eid
        matches = settle(list(zip(ts, et, eid)))
        if matches:
            yield pd.DataFrame(matches, columns=_COLS)

    return sdf.groupBy(key_col).applyInPandasWithState(
        fn,
        MATCH_SCHEMA,
        BUFFER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
