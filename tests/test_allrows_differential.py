"""Differential check of the ALL ROWS vectorized measures path against
the ONE ROW scalar path (round 14).

The measures compiler has two evaluation contexts: the scalar context
(ONE ROW PER MATCH — plain Python values, true Kleene three-valued
logic) and the vectorized ALL ROWS context (numpy arrays / prefix-scan
``_VecSeg`` views, where the round-14 fix showed UNKNOWN could silently
collapse inside interior nodes). This test makes the SCALAR path the
oracle: for a batch of generated measure expressions, the value of
``FINAL (expr)`` on EVERY output row of an ALL ROWS match must equal
the ONE ROW value of ``expr`` for the same match — FINAL evaluates over
the whole match in both modes, so any divergence is a vector-path bug.

All generated expressions ride in ONE MEASURES list per mode, so the
whole differential costs two MATCH_RECOGNIZE executions per frame.
NULLs are first-class: ``price`` is NULL-riddled and ``note`` carries
NULL strings, so comparisons, CASE, IN/LIKE and aggregates all cross
UNKNOWN territory.
"""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest

from flink_commons_spark.plans.match_recognize import execute_match_recognize

SEED = 1414
N_EXPRS = 36


def _frame(rng: random.Random, n_keys: int = 6, rows_per_key: int = 9):
    rows = []
    types = ["a", "b", "b", "c"]  # A (B+) C pattern fodder
    notes = ["alpha", "beta", "a%b", "", None, "gamma"]
    for k in range(n_keys):
        # per key: a b b c a b c ... deterministic type cycle with
        # enough b-runs for several matches
        seq = (types * ((rows_per_key // len(types)) + 1))[:rows_per_key]
        for i, t in enumerate(seq):
            rows.append({
                "k": k,
                "ts": i + 1,
                "typ": t,
                "price": (
                    None if rng.random() < 0.3
                    else round(rng.uniform(-50, 150), 2)
                ),
                "qty": rng.randint(-5, 20),
                "note": rng.choice(notes),
            })
    return pd.DataFrame(rows)


def _gen_num(rng: random.Random, depth: int) -> str:
    r = rng.random()
    if depth >= 2 or r < 0.35:
        return rng.choice([
            "LAST(a.price)", "FIRST(a.qty)", "LAST(c.price)",
            "SUM(b.qty)", "AVG(b.price)", "MIN(b.price)", "MAX(b.qty)",
            "COUNT(b.*)", "COUNT(*)", "FIRST(b.price, 1)",
            "LAST(b.qty, 1)", str(rng.randint(-9, 9)),
        ])
    a, b = _gen_num(rng, depth + 1), _gen_num(rng, depth + 1)
    r2 = rng.random()
    if r2 < 0.12:
        return f"COALESCE({a}, {b})"
    if r2 < 0.2:
        return f"NULLIF({a}, {b})"
    op = rng.choice(["+", "-", "*", "/"])
    return f"({a} {op} {b})"


def _gen_pred(rng: random.Random, depth: int) -> str:
    r = rng.random()
    if depth >= 2 or r < 0.4:
        kind = rng.choice(["cmp", "between", "in", "like"])
        if kind == "cmp":
            return (
                f"{_gen_num(rng, depth + 1)} "
                f"{rng.choice(['<', '<=', '>', '>=', '=', '<>'])} "
                f"{_gen_num(rng, depth + 1)}"
            )
        if kind == "between":
            neg = rng.choice(["", "NOT "])
            return (
                f"{_gen_num(rng, depth + 1)} {neg}BETWEEN "
                f"{rng.randint(-9, 5)} AND {rng.randint(0, 99)}"
            )
        if kind == "in":
            neg = rng.choice(["", "NOT "])
            return f"FIRST(a.qty) {neg}IN (1, 2, 3, 7, -4)"
        neg = rng.choice(["", "NOT "])
        return f"LAST(a.note) {neg}LIKE '%a%'"
    a, b = _gen_pred(rng, depth + 1), _gen_pred(rng, depth + 1)
    if rng.random() < 0.25:
        return f"NOT ({a})"
    return f"({a} {rng.choice(['AND', 'OR'])} {b})"


def _gen_expr(rng: random.Random) -> str:
    if rng.random() < 0.55:
        return (
            f"CASE WHEN {_gen_pred(rng, 0)} THEN {_gen_num(rng, 1)} "
            f"ELSE {_gen_num(rng, 1)} END"
        )
    return _gen_num(rng, 0)


def _close(a, b) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@pytest.mark.parametrize("seed", [SEED, SEED + 1])
def test_final_all_rows_matches_one_row(spark, seed):
    rng = random.Random(seed)
    pdf = _frame(rng)
    spark.createDataFrame(pdf).createOrReplaceTempView("ar_diff_t")
    exprs = [_gen_expr(rng) for _ in range(N_EXPRS)]
    m_names = [f"m{i}" for i in range(len(exprs))]

    one_meas = ",\n".join(
        f"{e} AS {n}" for e, n in zip(exprs, m_names)
    ) + ",\nFIRST(a.ts) AS m_start"
    fin_meas = ",\n".join(
        f"FINAL ({e}) AS {n}" for e, n in zip(exprs, m_names)
    ) + ",\nFIRST(a.ts) AS m_start"
    body = """
        PARTITION BY k ORDER BY ts
        MEASURES {meas}
        {mode}
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B+ C)
        DEFINE A AS A.typ = 'a', B AS B.typ = 'b', C AS C.typ = 'c'
    """
    one = execute_match_recognize(
        spark,
        "SELECT * FROM ar_diff_t MATCH_RECOGNIZE ("
        + body.format(meas=one_meas, mode="ONE ROW PER MATCH")
        + ")",
    ).toPandas()
    allr = execute_match_recognize(
        spark,
        "SELECT * FROM ar_diff_t MATCH_RECOGNIZE ("
        + body.format(meas=fin_meas, mode="ALL ROWS PER MATCH")
        + ")",
    ).toPandas()
    assert len(one) > 4  # matches actually exist

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if hasattr(v, "item"):
            v = v.item()
        return v

    # ONE ROW emits one row per match; ALL ROWS emits the match's rows
    # with the identical FINAL measure values on each. Both sides carry
    # FIRST(a.ts) AS m_start (the matched A row's ts — constant from
    # the first output row), keying each match as (k, m_start).
    one_by_match = {}
    for _, r in one.iterrows():
        key = (r["k"], r["m_start"])
        assert key not in one_by_match
        one_by_match[key] = r
    allr_groups: dict = {}
    for _, r in allr.iterrows():
        allr_groups.setdefault((r["k"], r["m_start"]), []).append(r)

    assert sorted(one_by_match) == sorted(allr_groups), (
        "match sets differ between ONE ROW and ALL ROWS"
    )
    for key, orow in one_by_match.items():
        grp = allr_groups[key]
        for name, expr in zip(m_names, exprs):
            want = norm(orow[name])
            got = {norm(g[name]) for g in grp}
            assert len(got) == 1, (
                f"FINAL({expr}) not match-constant for {key}: {got}"
            )
            have = next(iter(got))
            assert _close(want, have), (
                f"match {key} measure {name}:\n  expr: {expr}\n"
                f"  ONE ROW: {want!r}\n  ALL ROWS FINAL: {have!r}"
            )
