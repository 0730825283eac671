"""Gap-based sessionization of event streams (batch formulation).

Classic two-window construction, one shuffle total (both windows share
``partitionBy(user)`` so Catalyst plans a single exchange + sort):

1. ``lag(ts)`` per user → gap to previous event;
2. a session starts where the gap exceeds the timeout (or is the first
   event); a running sum of session-start flags numbers the sessions;
3. aggregate per (user, session_no).

The streaming analog is Structured Streaming's native
``session_window`` (see ``flink_commons_spark.streaming``); this batch
operator exists because training-data pipelines sessionize historical
logs at rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign ``session_no`` (1-based per user) to every event row."""
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_s = F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double")
    is_new = F.when(
        gap_s.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("__new", is_new).withColumn(
        "session_no",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("__new")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-session aggregate: event count, span seconds, start/end epoch."""
    s = sessionize(df, user_col, ts_col, gap_minutes, order_tiebreak)
    return s.groupBy(user_col, "session_no").agg(
        F.count("*").alias("n_events"),
        F.min(F.col(ts_col)).cast("double").cast("bigint").alias("start_epoch"),
        F.max(F.col(ts_col)).cast("double").cast("bigint").alias("end_epoch"),
        (F.max(F.col(ts_col)).cast("double") - F.min(F.col(ts_col)).cast("double"))
        .cast("bigint")
        .alias("span_s"),
    )
