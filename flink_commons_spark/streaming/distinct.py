"""Exact COUNT(DISTINCT) under Structured Streaming.

Flink supports exact distinct aggregation on update streams natively
(the reference's demo relies on it — ``test.sql:51``); Spark disallows
``count(distinct ...)`` on streaming DataFrames. This module provides
the standard two-stage exact formulation, possible since Spark 4
allows chaining multiple stateful operators in append mode:

1. ``dropDuplicatesWithinWatermark`` on (group keys, distinct column)
   — stateful dedup whose state is bounded by the watermark delay;
2. windowed aggregation counting the surviving rows — an exact
   distinct count per (window, keys).

State bound: stage 1 holds one record per distinct (keys, value) seen
within the watermark horizon; stage 2 holds one row per open window —
both O(cardinality), spill-backed, no driver state. Scale knobs are the
watermark delay (state horizon) and ``spark.sql.shuffle.partitions``
(state-store parallelism).

The cheap alternative (``approx_count_distinct``, HLL++) is what the
SQL runner substitutes by default (``flink_commons_spark.actions
.sql_submit``); this operator is the exact path for pipelines that
need it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def windowed_exact_distinct(
    sdf: DataFrame,
    ts_col: str,
    window_duration: str,
    keys: list[str],
    distinct_col: str,
    watermark_delay: str = "10 seconds",
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Exact per-window distinct count on a streaming DataFrame.

    Returns (window_start, window_end, *keys, uv) in append mode —
    windows emit once the watermark passes their end.

    ``extra_aggs`` are additional aggregate columns evaluated over the
    *deduplicated* stream (so ``count(*)`` there equals the distinct
    count; aggregate raw measures in a separate branch if needed).
    """
    # The dedup key must include the window bucket: distinctness is per
    # (window, keys, value), not global — without it every value would be
    # counted in its first window only.
    bucketed = sdf.withColumn("__bucket", F.window(F.col(ts_col), window_duration))
    dedup = (
        bucketed.withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["__bucket", *keys, distinct_col])
        .drop("__bucket")
    )
    agg_cols = [F.count(distinct_col).alias("uv"), *(extra_aggs or [])]
    agged = dedup.groupBy(F.window(ts_col, window_duration), *keys).agg(*agg_cols)
    return agged.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in agged.columns if c != "window"],
    )
