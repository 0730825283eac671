"""Property-based differential test for the NFA's match-state-
dependent (``Step.dyn``) protocol.

An INDEPENDENT brute-force scanner re-implements the documented
semantics from scratch — depth-first take-vector enumeration in
greedy/reluctant order, with every dyn predicate re-evaluated from a
freshly built running assignment (candidate row included for its own
variable, SQL NULL → reject) — and must produce the same match set,
per-variable row assignment, and consumed spans as the production
backtracker for random row frames, patterns, and predicates. This
pins exactly the machinery the fast path optimizes: run-extension
truncation (``full[:take]``), per-step asg bookkeeping across
backtracks, static-mask prefilters, and AFTER MATCH resume rules."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from flink_commons_spark.operators.cep import (
    Step,
    _DynCtx,
    _match_at,
    _run_ends,
)

# ---------------------------------------------------------------- ref


def _brute_match_at(vals, steps, start, n, dyn_specs):
    """Independent reference: first admissible assignment in
    greedy/reluctant order. ``dyn_specs[i]`` is None or a spec tuple
    interpreted by :func:`_eval_dyn` against a fresh assignment."""

    def eval_dyn(spec, asg, cur):
        kind, var, c = spec
        rows = asg.get(var, [])
        if kind == "sum_le":  # running SUM(var.val) <= c
            if not rows:
                return None  # empty aggregate → NULL → UNKNOWN
            return sum(int(vals[i]) for i in rows) <= c
        if kind == "gt_last":  # current row val > LAST(var.val)
            if not rows:
                return None
            return int(vals[cur]) > int(vals[rows[-1]])
        if kind == "lt_first":  # current row val < FIRST(var.val) + c
            if not rows:
                return None
            return int(vals[cur]) < int(vals[rows[0]]) + c
        raise AssertionError(kind)

    def rec(pos, si, asg):
        if si == len(steps):
            return []
        s = steps[si]
        mask, spec = s.where, dyn_specs[si]
        # maximal admissible run from pos (row-by-row, fresh asg)
        run = []
        end = pos
        limit = n if s.hi is None else min(n, pos + s.hi)
        while end < limit and mask[end]:
            run.append(end)
            if spec is not None:
                a2 = dict(asg)
                a2[s.name] = list(run)
                v = eval_dyn(spec, a2, end)
                if v is None or not v:
                    run.pop()
                    break
            end += 1
        takes = range(len(run), s.lo - 1, -1)
        if s.reluctant:
            takes = range(s.lo, len(run) + 1)
        for take in takes:
            a2 = dict(asg)
            a2[s.name] = run[:take]
            rest = rec(pos + take, si + 1, a2)
            if rest is not None:
                return [list(range(pos, pos + take))] + rest
        return None

    return rec(start, 0, {})


def _scan(vals, steps, dyn_specs, matcher):
    """SKIP PAST LAST ROW scan shared by both sides; ``matcher``
    returns per-step index lists or None for one start."""
    n = len(vals)
    out = []
    i = 0
    while i < n:
        hit = matcher(i, n)
        if hit is None or not any(hit):
            i += 1
            continue
        out.append([list(seg) for seg in hit])
        i = max(seg[-1] for seg in hit if seg) + 1
    return out


# ------------------------------------------------------------- wiring


def _compile_dyn(spec, vals):
    def fn(d, spec=spec):
        kind, var, c = spec
        rows = d.asg.get(var) or []
        if not rows:
            return None
        if kind == "sum_le":
            return sum(int(vals[i]) for i in rows) <= c
        if kind == "gt_last":
            return int(vals[d.cur]) > int(vals[rows[-1]])
        if kind == "lt_first":
            return int(vals[d.cur]) < int(vals[rows[0]]) + c
        raise AssertionError(kind)

    return fn


step_strategy = st.tuples(
    st.sampled_from([(1, 1), (1, None), (0, None), (0, 1), (2, 3)]),
    st.booleans(),  # reluctant
    st.integers(0, 2),  # mask kind: 0 all-true, 1 even rows, 2 val>=3
    st.sampled_from(
        [None, ("sum_le", 0, 8), ("gt_last", 0, 0), ("lt_first", 1, 3)]
    ),
)


@settings(max_examples=120, deadline=None)
@given(
    vals=st.lists(st.integers(0, 6), min_size=0, max_size=11),
    raw_steps=st.lists(step_strategy, min_size=1, max_size=3),
)
def test_dyn_backtracker_matches_brute_force(vals, raw_steps):
    n = len(vals)
    arr = np.array(vals, dtype=np.int64)
    names = ["A", "B", "C"]
    steps = []
    masks = []
    dyn_specs = []
    for k, ((lo, hi), rel, mk, spec) in enumerate(raw_steps):
        if mk == 0:
            mask = np.ones(n, dtype=bool)
        elif mk == 1:
            mask = (np.arange(n) % 2) == 0
        else:
            mask = arr >= 3
        # dyn var references resolve to an actual step name
        if spec is not None:
            kind, var_idx, c = spec
            spec = (kind, names[var_idx % len(raw_steps)], c)
        masks.append(mask)
        dyn_specs.append(spec)
        steps.append(
            Step(
                names[k],
                None,
                quant=(lo, hi),
                reluctant=rel,
                dyn=_compile_dyn(spec, arr) if spec else None,
            )
        )

    # production side: masks precomputed, run_ends, shared _DynCtx
    cols = {"val": arr}
    dctx = (
        _DynCtx(cols) if any(s.dyn is not None for s in steps) else None
    )
    run_ends = _run_ends(masks, n)

    def fast(i, n_):
        return _match_at(masks, steps, i, n_, run_ends, None, dctx)

    # reference side: fresh dict-based assignments, no sharing
    bsteps = [
        Step(names[k], masks[k], quant=(lo, hi), reluctant=rel)
        for k, ((lo, hi), rel, _mk, _sp) in enumerate(raw_steps)
    ]
    # reuse Step only as a (name, lo, hi, reluctant, mask) record:
    for s, m in zip(bsteps, masks):
        s.where = m

    def brute(i, n_):
        return _brute_match_at(arr, bsteps, i, n_, dyn_specs)

    got = _scan(arr, steps, dyn_specs, fast)
    want = _scan(arr, bsteps, dyn_specs, brute)
    assert got == want
