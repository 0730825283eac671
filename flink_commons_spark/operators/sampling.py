"""Deterministic dataset splitting and sampling for training pipelines.

Train/val/test assignment must be a PURE FUNCTION of a stable key —
never ``rand()`` — so that reruns, backfills and incremental additions
land every document in the same split (the classic requirement for
leakage-free evaluation sets). The split here hashes the key with md5
into a 10000-bucket space and cuts it by cumulative fractions; both
sides of the oracle can express it, and adding data never moves an
existing row's split.

Scale posture: a narrow map (one hash per row, whole-stage codegen);
no shuffle, no sampling state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: bucket space for fraction cuts — 1/10000 granularity
BUCKETS = 10_000


def split_bucket(key: Column, salt: str = "split") -> Column:
    """Stable bucket in [0, BUCKETS) from md5 of the salted key."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return h % BUCKETS


def with_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Attach a ``split`` column ('train'/'val'/... per ``fractions``).

    Fractions must sum to 1.0 (±1e-9). Assignment: bucket < 10000·c1 →
    first split, < 10000·(c1+c2) → second, … — insertion order of the
    dict defines the cut order, so spell it deterministically.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    bucket = split_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cut = int(round(acc * BUCKETS))
        cond = bucket < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)
