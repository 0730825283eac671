"""Interval (time-range) join — Flink SQL's interval join, Spark-first.

``SELECT ... FROM l JOIN r ON l.key = r.key AND r.ts BETWEEN l.ts +
lower AND l.ts + upper`` is a core Flink streaming-SQL feature. A naive
batch translation becomes a theta-join (nested loop) — quadratic per
key. The scalable formulation buckets time:

- bucket width W = upper - lower (the window span);
- the RIGHT side lands in exactly one bucket: floor((ts - lower)/W);
- the LEFT side can only match right rows in that bucket value derived
  from its own ts: floor(ts/W) and floor(ts/W)+1 — two candidate
  buckets per left row;
- equi-join on (key, bucket), then apply the exact bounds.

Each (l, r) candidate pair meets in at most one bucket (the right
row's), so no dedup pass is needed. The join is a plain hash equi-join
shuffling on (key, bucket) — linear, AQE-skew-handled, no nested loop.

The STREAMING form needs none of this: Structured Streaming's
stream-stream inner join with watermarks + a time-range condition is
the native analog (state bounded by the watermark and the interval),
used directly by the ``stream_interval_join`` contract query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    payload: list[str] | None = None,
) -> DataFrame:
    """Rows (l, r) with ``l.key = r.key`` and ``r.ts ∈ [l.ts + lower_s,
    l.ts + upper_s]`` (seconds, inclusive).

    Timestamps are compared at microsecond precision. Returns all left
    columns plus ``payload`` columns (default: all non-key right
    columns) and ``r_ts`` (the matched right timestamp).
    """
    if upper_s <= lower_s:
        raise ValueError("interval_join requires upper_s > lower_s")
    w_us = int(round((upper_s - lower_s) * 1_000_000))
    lo_us = int(round(lower_s * 1_000_000))

    def us(col: str) -> Column:
        return F.expr(f"unix_micros(cast({col} as timestamp))")

    pay = payload if payload is not None else [
        c for c in right.columns if c not in (on, right_ts)
    ]

    l = left.withColumn("__lus", us(left_ts))
    r = (
        right.select(
            F.col(on),
            us(right_ts).alias("__rus"),
            *[F.col(c) for c in pay],
        )
        .withColumn("__bucket", F.floor((F.col("__rus") - lo_us) / F.lit(w_us)))
    )
    # left row's two candidate buckets: floor(lts/W) and +1 shifted by
    # the lower bound — derived so that any r with rus ∈ [lts+lo,
    # lts+lo+W] falls in one of them
    cand = l.withColumn(
        "__bucket", F.explode(
            F.array(
                F.floor(F.col("__lus") / F.lit(w_us)),
                F.floor(F.col("__lus") / F.lit(w_us)) + 1,
            )
        )
    )
    joined = cand.join(r, [on, "__bucket"]).where(
        (F.col("__rus") >= F.col("__lus") + F.lit(lo_us))
        & (F.col("__rus") <= F.col("__lus") + F.lit(lo_us) + F.lit(w_us))
    )
    return joined.drop("__bucket").withColumnRenamed("__rus", "r_us").drop("__lus")
