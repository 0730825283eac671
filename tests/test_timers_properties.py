"""Property tests for the inactivity-session fold (``streaming/timers.py``).

``_advance`` is the pure core both timer implementations share; its
key correctness property is BATCH-SPLIT INVARIANCE: folding a sorted
event sequence in one batch must equal folding it across any
contiguous batch split with state carried between calls — that is
exactly what "stateful operator resumes across micro-batches" means.
No Spark session needed; these run in milliseconds.
"""

from __future__ import annotations

from hypothesis import given, strategies as st

from flink_commons_spark.streaming.timers import _advance


def _fold(chunks, gap_us):
    prior = None
    closed = []
    for ch in chunks:
        if not ch:
            continue
        got, prior = _advance(1, ch, prior, gap_us)
        closed.extend(got)
    return closed, prior


@given(
    ts=st.lists(st.integers(0, 10**7), min_size=1, max_size=60),
    gap_us=st.integers(1, 10**6),
    data=st.data(),
)
def test_batch_split_invariance(ts, gap_us, data):
    ts_sorted = sorted(ts)
    one_shot = _fold([ts_sorted], gap_us)

    # split into 1-3 contiguous chunks at arbitrary points
    cut1 = data.draw(st.integers(0, len(ts_sorted)))
    cut2 = data.draw(st.integers(cut1, len(ts_sorted)))
    split = _fold([ts_sorted[:cut1], ts_sorted[cut1:cut2], ts_sorted[cut2:]], gap_us)

    assert split == one_shot


@given(
    ts=st.lists(st.integers(0, 10**7), min_size=1, max_size=60),
    gap_us=st.integers(1, 10**6),
)
def test_session_invariants(ts, gap_us):
    ts_sorted = sorted(ts)
    closed, open_sess = _fold([ts_sorted], gap_us)
    sessions = closed + [(1, *open_sess)]

    # every event is in exactly one session
    assert sum(s[3] for s in sessions) == len(ts_sorted)
    # sessions are ordered, non-overlapping, separated by > gap
    for (_, s1, e1, _), (_, s2, e2, _) in zip(sessions, sessions[1:]):
        assert s1 <= e1 and s2 <= e2
        assert s2 - e1 > gap_us
    # within a session no internal gap exceeds gap_us: verify against
    # the events themselves
    starts = [s[1] for s in sessions]
    for a, b in zip(ts_sorted, ts_sorted[1:]):
        if b - a > gap_us:
            assert b in starts
