"""Streaming session windows (gap-based), the native Spark way.

Structured Streaming's ``session_window`` merges events whose gaps are
below the timeout into one growing window — the streaming analog of the
batch :mod:`flink_commons_spark.operators.sessionize` operator (both
produce identical sessions for the same gap, which is what the oracle
checks). Flink's equivalent is ``SESSION(..., INTERVAL ...)`` grouping,
delegated SQL surface in the reference (``SURVEY.md §2.5``).

State: one open session per key, closed and emitted once the watermark
passes ``session end + gap``. Shuffle is on the grouping key — the same
single-exchange shape as the batch formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def session_window_agg(
    sdf: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str = "30 minutes",
    watermark_delay: str = "10 seconds",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Per-session aggregate on a streaming DataFrame (append mode).

    Returns (session_start, session_end, *keys, n_events, *aggs).
    """
    agg_cols = [F.count("*").alias("n_events"), *(aggs or [])]
    agged = (
        sdf.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(F.col(ts_col), gap), *key_cols)
        .agg(*agg_cols)
    )
    return agged.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *[c for c in agged.columns if c != "session_window"],
    )
