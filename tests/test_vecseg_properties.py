"""Property tests for the ALL ROWS columnar RUNNING reductions
(``operators/cep.py:_VecSeg``): every vectorized per-row value must
equal the brute-force recomputation over the truncated member prefix —
the semantics the old O(match_len²) per-row loop implemented. Pure
numpy, no Spark session."""

from __future__ import annotations

import random

import numpy as np
import pytest

from flink_commons_spark.operators.cep import _VecSeg


def _brute(mpos, vals, pos_arr, fn):
    """Per output row: fn over member values at positions <= pos."""
    out = []
    for p in pos_arr:
        prefix = [v for mp, v in zip(mpos, vals) if mp <= p]
        out.append(fn(prefix))
    return out


def _sql_reduce(prefix, kind):
    vals = [v for v in prefix if v is not None and v == v]
    if not vals:
        return None
    if kind == "SUM":
        return sum(vals)
    if kind == "MIN":
        return min(vals)
    if kind == "MAX":
        return max(vals)
    return sum(vals) / len(vals)  # AVG


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("dtype", ["int64", "float64", "object"])
def test_vec_reduce_matches_bruteforce(seed, dtype):
    rng = random.Random(seed * 1000 + hash(dtype) % 97)
    n_total = rng.randint(3, 40)
    pos_arr = np.arange(n_total, dtype=np.int64)
    mpos_list = sorted(rng.sample(range(n_total), rng.randint(0, n_total)))
    mpos = np.asarray(mpos_list, dtype=np.int64)
    if dtype == "int64":
        raw = [rng.randint(-50, 50) for _ in mpos_list]
        vals = np.asarray(raw, dtype=np.int64)
    elif dtype == "float64":
        raw = [
            float("nan") if rng.random() < 0.3 else rng.uniform(-5, 5)
            for _ in mpos_list
        ]
        vals = np.asarray(raw, dtype=np.float64)
    else:
        raw = [
            None if rng.random() < 0.3 else rng.randint(-50, 50)
            for _ in mpos_list
        ]
        vals = np.asarray(raw, dtype=object)
    cols = {"x": np.zeros(n_total, dtype=object)}
    cols["x"][mpos] = vals  # only member positions are read
    cols["x"] = cols["x"] if dtype == "object" else _canon_col(
        mpos, vals, n_total, dtype
    )
    seg = _VecSeg(cols, mpos, pos_arr)

    # COUNT
    got = seg.vec_count()
    want = _brute(mpos_list, raw, pos_arr, len)
    assert list(got) == want

    # SUM / MIN / MAX / AVG with SQL NULL-skip
    for kind in ("SUM", "MIN", "MAX", "AVG"):
        got = seg.vec_reduce("x", kind)
        want = _brute(
            mpos_list, raw, pos_arr, lambda p, k=kind: _sql_reduce(p, k)
        )
        for g, w in zip(got, want):
            if w is None:
                assert g is None, (kind, got, want)
            else:
                assert g == pytest.approx(w), (kind, got, want)

    # FIRST / LAST with offsets
    for off in (0, 1, 2):
        got_f = seg.vec_first("x", off)
        want_f = _brute(
            mpos_list, raw, pos_arr,
            lambda p, o=off: p[o] if len(p) > o else None,
        )
        got_l = seg.vec_last("x", off)
        want_l = _brute(
            mpos_list, raw, pos_arr,
            lambda p, o=off: p[len(p) - 1 - o] if len(p) > o else None,
        )
        for g, w in zip(got_f, want_f):
            assert (g is None and w is None) or g == w or (
                g != g and w != w
            ), ("FIRST", off)
        for g, w in zip(got_l, want_l):
            assert (g is None and w is None) or g == w or (
                g != g and w != w
            ), ("LAST", off)


def _canon_col(mpos, vals, n_total, dtype):
    col = np.zeros(n_total, dtype=dtype)
    col[mpos] = vals
    return col
