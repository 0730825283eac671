"""Differential fuzz of the MATCH_RECOGNIZE DEFINE predicate compiler
against Spark SQL itself (r13 verdict #5).

The r13 expression widening ([NOT] BETWEEN / IN / LIKE, searched CASE
WHEN, CAST, MOD, three-valued AND/OR/NOT) hand-implements SQL's
three-valued null semantics twice — a vectorized per-partition mask
and a scalar (define_dyn) evaluator. This test makes the ENGINE the
oracle: it generates hundreds of random predicates from that grammar,
compiles each with the DEFINE compiler over a null-riddled frame, and
compares the resulting match mask row-by-row against Spark evaluating
the IDENTICAL predicate text (``F.expr``) over the identical rows —
DEFINE semantics: a row matches iff the predicate is definitely TRUE
(UNKNOWN rejects), which is exactly what Spark's boolean result being
``true`` means.

The oracle runs with ``spark.sql.ansi.enabled=false`` — the dialect
this engine implements maps division/MOD by zero to NULL (DuckDB
parity, ``_sarith``), which is Spark's non-ANSI behavior; ANSI mode
raises instead.

One Spark job evaluates ALL generated predicates as columns of a
single select, so the fuzz stays fast (~seconds) at hundreds of cases.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from flink_commons_spark.plans.match_recognize import _ExprParser

COL_TYPES = {"x": "bigint", "y": "double", "s": "string"}

N_CASES = 260
SEED = 1404


def _rows():
    """Null-riddled rows: negative dividends (the MOD fix), zeros (the
    divisor-0 path), NULLs in every column, LIKE-metacharacter strings,
    and values on BETWEEN boundaries."""
    rng = random.Random(99)
    xs = [-7, -2, -1, 0, 1, 2, 3, 7, 50, 200, 201, -200, None]
    ys = [-7.5, -1.0, 0.0, 0.5, 2.5, 7.0, 49.999, 200.0, 250.1, None]
    ss = ["view", "verr", "click", "error", "purchase", "a%b", "a_b",
          "", "x.y", None]
    rows = []
    for i in range(64):
        rows.append((rng.choice(xs), rng.choice(ys), rng.choice(ss)))
    # pin the hand-reasoned r13 cases: x < 7 with a NULL BETWEEN bound
    rows += [(5, None, None), (9, None, "v"), (None, None, None)]
    return rows


def _num(rng, depth):
    r = rng.random()
    if r < 0.28:
        return rng.choice(["A.x", "A.y"])
    if r < 0.45:
        return str(rng.choice([-7, -2, 0, 1, 2, 3, 7, 50, 200]))
    if r < 0.53:
        return f"{rng.uniform(-10, 10):.2f}"
    if r < 0.58:
        return "NULL"
    if depth > 2:
        return rng.choice(["A.x", "A.y", "3"])
    if r < 0.66:
        return f"MOD({_num(rng, depth + 1)}, {_num(rng, depth + 1)})"
    if r < 0.72:
        return f"CAST({_num(rng, depth + 1)} AS " \
               f"{rng.choice(['INT', 'BIGINT', 'DOUBLE'])})"
    if r < 0.76:
        k = rng.randint(2, 3)
        return "COALESCE(" + ", ".join(
            _num(rng, depth + 1) for _ in range(k)
        ) + ")"
    if r < 0.80:
        return f"NULLIF({_num(rng, depth + 1)}, {_num(rng, depth + 1)})"
    if r < 0.90:
        op = rng.choice(["+", "-", "*"])
        return f"({_num(rng, depth + 1)} {op} {_num(rng, depth + 1)})"
    return f"({_num(rng, depth + 1)} / {_num(rng, depth + 1)})"


def _str_operand(rng):
    r = rng.random()
    if r < 0.6:
        return "A.s"
    if r < 0.9:
        return "'" + rng.choice(["view", "verr", "click", "a%b", ""]) + "'"
    return "NULL"


def _atom(rng, depth):
    r = rng.random()
    neg = rng.choice(["", "NOT "])
    if r < 0.30:
        op = rng.choice(["=", "<>", "!=", "<", "<=", ">", ">="])
        return f"{_num(rng, depth)} {op} {_num(rng, depth)}"
    if r < 0.48:
        return (f"{_num(rng, depth)} {neg}BETWEEN {_num(rng, depth)} "
                f"AND {_num(rng, depth)}")
    if r < 0.60:
        lits = ", ".join(
            str(rng.choice([-7, 0, 1, 2, 3, 7, 50])) for _ in
            range(rng.randint(1, 3))
        )
        return f"{_num(rng, depth)} {neg}IN ({lits})"
    if r < 0.72:
        lits = ", ".join(
            "'" + rng.choice(["view", "click", "a%b", ""]) + "'"
            for _ in range(rng.randint(1, 3))
        )
        return f"{_str_operand(rng)} {neg}IN ({lits})"
    if r < 0.86:
        pat = rng.choice(["v%", "%r%", "a_b", "a%b", "%", "_", "x.y", ""])
        return f"{_str_operand(rng)} {neg}LIKE '{pat}'"
    # searched CASE WHEN with a numeric comparison on the outside
    return (f"CASE WHEN {_atom(rng, depth + 1)} THEN {_num(rng, depth)} "
            f"WHEN {_atom(rng, depth + 1)} THEN {_num(rng, depth)} "
            f"ELSE {_num(rng, depth)} END "
            f"{rng.choice(['=', '<', '>', '>=', '<='])} {_num(rng, depth)}")


def _pred(rng, depth=0):
    r = rng.random()
    if depth > 2 or r < 0.45:
        return _atom(rng, depth)
    if r < 0.70:
        return f"({_pred(rng, depth + 1)} AND {_pred(rng, depth + 1)})"
    if r < 0.92:
        return f"({_pred(rng, depth + 1)} OR {_pred(rng, depth + 1)})"
    return f"(NOT ({_pred(rng, depth + 1)}))"


def _mask_to_bools(mask, n):
    """Normalize a compiled DEFINE mask (Series/ndarray/bool-with-NA)
    to a plain list of Python bools — UNKNOWN/NA rejects."""
    if np.isscalar(mask) or mask is None:
        return [bool(mask) if mask is not None else False] * n
    s = pd.Series(mask)
    return [(not pd.isna(v)) and bool(v) for v in s]


def test_define_masks_match_spark_sql(spark):
    rng = random.Random(SEED)
    preds = [_pred(rng) for _ in range(N_CASES)]

    rows = _rows()
    sdf = spark.createDataFrame(rows, schema="x long, y double, s string")
    pdf = sdf.toPandas()  # the engine-side frame, Arrow dtype rules
    n = len(pdf)

    compiled = []
    for i, p in enumerate(preds):
        node = _ExprParser(p, "define", COL_TYPES, set(), {"A"}).parse()
        compiled.append(_mask_to_bools(node.fn(pdf), n))

    from pyspark.sql import functions as F

    prev_ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        spark_rows = sdf.select(
            *[
                F.expr(f"({p.replace('A.', '')})").alias(f"p{i}")
                for i, p in enumerate(preds)
            ]
        ).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev_ansi)

    mismatches = []
    for i, p in enumerate(preds):
        oracle = [bool(r[f"p{i}"]) if r[f"p{i}"] is not None else False
                  for r in spark_rows]
        if oracle != compiled[i]:
            bad = [j for j in range(n) if oracle[j] != compiled[i][j]]
            mismatches.append(
                f"case {i}: {p!r}\n  rows {bad[:5]} "
                f"(engine={[compiled[i][j] for j in bad[:5]]} "
                f"spark={[oracle[j] for j in bad[:5]]} "
                f"values={[tuple(pdf.iloc[j]) for j in bad[:5]]})"
            )
    assert not mismatches, (
        f"{len(mismatches)}/{N_CASES} predicates diverge from Spark:\n"
        + "\n".join(mismatches[:8])
    )


def test_define_dyn_scalar_twin_matches_spark_sql(spark):
    """The scalar (define_dyn) evaluator on CONSTANT predicates — the
    same grammar with no column references — against Spark evaluating
    the identical text over a 1-row frame."""
    rng = random.Random(SEED + 1)

    def const_num(depth=0):
        r = rng.random()
        if r < 0.35 or depth > 2:
            return str(rng.choice([-7, -2, 0, 1, 2, 3, 7]))
        if r < 0.45:
            return f"{rng.uniform(-10, 10):.2f}"
        if r < 0.52:
            return "NULL"
        if r < 0.68:
            return f"MOD({const_num(depth + 1)}, {const_num(depth + 1)})"
        if r < 0.78:
            return f"CAST({const_num(depth + 1)} AS " \
                   f"{rng.choice(['INT', 'BIGINT', 'DOUBLE'])})"
        op = rng.choice(["+", "-", "*", "/"])
        return f"({const_num(depth + 1)} {op} {const_num(depth + 1)})"

    def const_pred(depth=0):
        r = rng.random()
        neg = rng.choice(["", "NOT "])
        if depth > 1 or r < 0.4:
            op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
            return f"{const_num()} {op} {const_num()}"
        if r < 0.55:
            return f"{const_num()} {neg}BETWEEN {const_num()} AND {const_num()}"
        if r < 0.7:
            lits = ", ".join(str(rng.choice([-7, 0, 2, 7]))
                             for _ in range(rng.randint(1, 3)))
            return f"{const_num()} {neg}IN ({lits})"
        if r < 0.85:
            return f"({const_pred(depth + 1)} AND {const_pred(depth + 1)})"
        return f"({const_pred(depth + 1)} OR {const_pred(depth + 1)})"

    preds = [const_pred() for _ in range(120)]
    compiled = []
    for p in preds:
        node = _ExprParser(p, "define_dyn", COL_TYPES, set(), {"A"}).parse()
        v = node.fn(None)
        compiled.append(bool(v) if v is not None else False)

    from pyspark.sql import functions as F

    prev_ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        row = spark.range(1).select(
            *[F.expr(f"({p})").alias(f"p{i}") for i, p in enumerate(preds)]
        ).first()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev_ansi)

    mismatches = [
        f"{p!r}: engine={compiled[i]} spark={row[f'p{i}']}"
        for i, p in enumerate(preds)
        if compiled[i] != (bool(row[f"p{i}"]) if row[f"p{i}"] is not None
                           else False)
    ]
    assert not mismatches, "\n".join(mismatches[:10])
