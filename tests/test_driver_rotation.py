"""Driver CORRECTNESS-window rotation (churn-aware since r14).

The driver records exact-oracle rows for only the first ~50 entries of
``queries()`` dict order. The rotation must therefore guarantee:

1. never-checked queries (no green row in any CORRECTNESS_r*.json) come
   first — a new query gets its hard signal before anything else;
2. previously-green queries follow, ordered OLDEST green round first, so
   the window continuously re-validates the stalest hard evidence (the
   r13 verdict: rounds 12-13 rewrote the MATCH_RECOGNIZE engine while
   most MR queries' driver rows still dated to r03-r11).

These tests run against the real repo artifacts, so they also assert the
concrete r14 goal: with all 214 queries cumulatively green, the window
must be filled with pre-r12-stale entries.
"""

from flink_commons_spark.catalog import (
    QUERIES,
    ORACLES,
    _DEFER_NEW,
    _driver_green_rounds,
    _driver_order,
)


def test_green_rounds_cover_all_queries():
    rounds = _driver_green_rounds()
    missing = [n for n in QUERIES if n not in rounds]
    # every contract query has had a green driver row at some point
    # (cumulative r01-r13 per the r13 verdict) — EXCEPT queries added
    # this round, which must then sit inside the driver's ~50-row
    # capture window so they get their hard signal immediately. A
    # never-checked query OUTSIDE the window means a CORRECTNESS
    # artifact was lost or a query was renamed.
    window = list(QUERIES)[:50]
    stranded = [n for n in missing if n not in window]
    assert not stranded, f"never-checked queries outside window: {stranded}"


def test_rotation_fronts_never_checked_then_oldest_green():
    names = list(QUERIES)
    rounds = _driver_green_rounds()
    order = _driver_order(sorted(names))  # input order must not matter
    # never-checked (minus the defer head) strictly precede green ones
    seen_green = False
    for n in order:
        if n in rounds and n not in _DEFER_NEW:
            seen_green = True
        elif n not in rounds and n not in _DEFER_NEW:
            assert not seen_green, f"never-checked {n} behind a green entry"
    # green tail is non-decreasing in last-green round
    green_tail = [rounds[n] for n in order if n in rounds]
    assert green_tail == sorted(green_tail)


def test_window_revalidates_stale_rows():
    """The driver's 50-row window must hold >=40 queries whose last green
    row predates r12 (the r13 verdict's done-criterion), as long as that
    many stale queries exist."""
    rounds = _driver_green_rounds()
    names = list(QUERIES)
    stale_total = sum(1 for n in names if rounds.get(n, 99) <= 11)
    window = names[:50]
    stale_in_window = sum(1 for n in window if rounds.get(n, 99) <= 11)
    never = sum(1 for n in window if n not in rounds)
    want = min(40, stale_total)
    assert stale_in_window + never >= want, (
        f"window has only {stale_in_window} stale + {never} never-checked "
        f"of {stale_total} stale total"
    )


def test_queries_and_oracles_share_order():
    qn = list(QUERIES)
    on = list(ORACLES)
    # oracles is a subset in the same relative order (non-SQL ops may
    # legitimately omit an oracle entry)
    it = iter(qn)
    assert all(name in it for name in on)
