"""Skew mitigation: salted two-stage aggregation and salted joins.

At 100 TB a handful of hot keys (one viral document, one bot user) can
put an entire shuffle partition on one executor. The classic fixes:

- **salted aggregation** — aggregate on (key, salt) first so the hot
  key's rows spread over ``buckets`` partitions, then combine the
  partials. Works for any algebraic aggregate (sum/count/min/max).
- **salted broadcast-side replication** for joins — AQE's skew-join
  handling (``spark.sql.adaptive.skewJoin.enabled``, on by default)
  covers sort-merge joins at runtime; :func:`replicated_salt_join`
  is the manual fallback when AQE can't see the skew (e.g. custom
  partitioners).

Salt derivation is deterministic (hash of a row-identity column, not
``rand()``), so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_source: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe ``sum`` + ``count`` per key.

    Stage 1 aggregates on (keys, salt) — the hot key's load spreads over
    ``buckets`` reducers; stage 2 combines the (tiny) partials. The
    value is summed as ``decimal(18,6)`` so the two-stage result is
    bit-identical to a single-stage aggregate regardless of grouping.
    """
    salt = (F.crc32(F.col(salt_source).cast("string")) % buckets).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__psum"),
            F.count("*").alias("__pcnt"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias("__sum"),
        F.sum("__pcnt").alias("n"),
    ).select(
        *keys,
        F.round(F.col("__sum").cast("double"), 4).alias("total"),
        "n",
    )


def replicated_salt_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side, replicate the small
    side across every salt bucket, join on (key, salt).

    The small side grows ``buckets``×, the skewed side's hot key spreads
    over ``buckets`` partitions. Result rows are identical to a plain
    join on ``on``.
    """
    src: Column = F.col(salt_source) if salt_source else F.monotonically_increasing_id()
    left = skewed.withColumn("__salt", (F.crc32(src.cast("string")) % buckets))
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    return left.join(right, [on, "__salt"]).drop("__salt")
