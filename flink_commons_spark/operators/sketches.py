"""Mergeable distinct-count sketches (DataSketches HLL, Spark-native).

Exact COUNT(DISTINCT) across N rollup levels costs N shuffles of the
raw distinct keys. The mergeable-sketch pattern pays ONE pass: build an
HLL sketch per finest-grained group (``hll_sketch_agg``), then derive
every coarser level by UNIONING the sketches (``hll_union_agg``) —
sketch bytes, not raw keys, move in the higher-level shuffles. This is
the standard design for distinct-count cubes over 100 TB (and the
mergeability is exactly what Flink's mini-batched distinct aggregates
exploit internally).

Estimates are approximate (~2% at default lgConfigK=12) — these
operators are unit-tested with tolerance rather than oracle-hash-checked
(the contract's exact distinct paths live in ``q_minute_agg`` /
``stream_exact_uv``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sketch_by_group(
    df: DataFrame, keys: list[str], distinct_col: str, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch per group over ``distinct_col`` (single shuffle)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("sketch")
    )


def rollup_estimates(
    sketches: DataFrame, fine_keys: list[str], coarse_keys: list[str]
) -> DataFrame:
    """Distinct-count estimates at a coarser level by sketch union —
    shuffles sketch bytes, never the raw keys."""
    return (
        sketches.groupBy(*coarse_keys)
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            *coarse_keys,
            F.hll_sketch_estimate("merged").alias("distinct_est"),
        )
    )


def estimate(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Per-group estimates from stored sketches."""
    return sketches.select(
        *keys, F.hll_sketch_estimate("sketch").alias("distinct_est")
    )
