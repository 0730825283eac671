"""Deterministic, engine-portable cardinality sketching.

Spark's ``approx_count_distinct`` is HyperLogLog++, but its hashing is
engine-private — the estimate is not reproducible outside Spark, so an
oracle cannot check it and a mixed-engine lakehouse cannot compare
sketches. This module implements HyperLogLog (Flajolet et al. 2007)
over the repo's portable md5-56bit hash with INTEGER-exact register
aggregation, so the same data yields the bit-identical estimate in any
SQL engine (the DuckDB oracles replay every formula).

Reference analog: the runner's streaming ``COUNT(DISTINCT)`` rewrite
(``flink_commons_spark/catalog.py``/``conf.py``) uses Spark's HLL++;
this is the portable sibling an audit pipeline can verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_commons_spark.operators.dedup import _portable_hash

#: suffix bits left after the bucket index is taken from a 56-bit hash
#: with the default p=6 — rho ranges over 1..SUFFIX_BITS+1
_HASH_BITS = 56


def hll_columns(value_col: str, p: int = 6) -> "tuple[object, object]":
    """The (bucket, rho) column pair for one value column — exposed so
    a STREAMING aggregation can maintain the registers itself
    (``groupBy(window, bucket).agg(max(rho))`` is a plain windowed
    max: per-window state is 2^p integers, the sketch's whole point).
    See :func:`hll_registers` for the arithmetic-portability notes."""
    m = 1 << p
    suffix_bits = _HASH_BITS - p
    h = _portable_hash(F.col(value_col).cast("string"))
    w = F.shiftright(h, p)
    lowbit = w.bitwiseAND(-w)
    rho = (
        F.when(w == 0, F.lit(suffix_bits + 1))
        .otherwise((F.round(F.log2(lowbit), 0) + 1).cast("int"))
    )
    return h.bitwiseAND(F.lit(m - 1)).alias("bucket"), rho.alias("rho")


def hll_registers(
    values: DataFrame, value_col: str, p: int = 6
) -> DataFrame:
    """(bucket, reg) HLL registers over the column's values.

    bucket = low ``p`` hash bits; rho = 1 + trailing-zero count of the
    remaining suffix (trailing rather than leading zeros: the same
    geometric law — P(rho ≥ k) = 2^-k — in pure integer arithmetic:
    ``w & -w`` isolates the lowest set bit as an exact power of two,
    where a leading-zero count would need a float ``log2`` of an
    arbitrary integer, whose rounding is not portable). The exponent
    is read back with ``round(log2(...))``, NOT a truncating cast:
    measured, Spark's ``log2`` returns 29.000000000000004 for 2^29
    (ln-ratio implementation) while DuckDB's is exact — a truncating
    cast silently diverges on 4 of the 51 possible registers, a
    1e-15-rounding error the round() absorbs. One hash-aggregate with
    map-side partial max; at most ``2^p`` rows ever shuffle.
    """
    bucket, rho = hll_columns(value_col, p)
    return (
        values.select(bucket, rho)
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, p: int = 6, group_cols: "tuple[str, ...]" = ()
) -> DataFrame:
    """Fold ``(bucket, reg)`` registers (optionally per group) into the
    round-6 ``hll_est`` — the stateless read side of a streaming
    sketch whose state is the registers. Same integer-exact harmonic
    sum and correction branches as :func:`hll_estimate`."""
    m = 1 << p
    top = _HASH_BITS - p + 1
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {top} - reg)")).alias(
            "__s_present"
        ),
        F.count("*").alias("__n_present"),
    )

    def raw():
        return (
            (F.lit(0.7213 / (1 + 1.079 / m)) * m * m)
            * F.lit(float(1 << top))
            / (
                F.col("__s_present")
                + (F.lit(m) - F.col("__n_present")) * F.lit(1 << top)
            )
        )

    est = F.round(
        F.when(
            (raw() <= 2.5 * m) & (F.col("__n_present") < m),
            F.lit(float(m))
            * F.log(F.lit(float(m)) / (F.lit(m) - F.col("__n_present"))),
        ).otherwise(raw()),
        6,
    ).alias("hll_est")
    return agg.select(*group_cols, est)


def hll_estimate(values: DataFrame, value_col: str, p: int = 6) -> DataFrame:
    """One-row HLL cardinality estimate (column ``hll_est``, round-6).

    The harmonic-mean denominator Σ 2^-reg is computed as the EXACT
    integer Σ 2^(suffix_bits+1-reg) (register ≤ suffix_bits+1, so the
    exponent is a non-negative shift; absent buckets contribute
    reg = 0) — order-independent, so the final double division is
    bit-identical on any engine and any partitioning. Small-range
    branch is Flajolet's linear counting (m·ln(m/V) when the raw
    estimate ≤ 2.5m and empty buckets exist); the 2^32 large-range
    branch is unnecessary against a 56-bit hash space and omitted.

    Driver/shuffle state: the 2^p registers — the whole point of the
    sketch at 100 TB (a COUNT(DISTINCT) shuffles every distinct
    value; this shuffles ≤ 2^p integers with map-side combine, and
    registers from disjoint shards merge by max).
    """
    return hll_estimate_from_registers(hll_registers(values, value_col, p), p)
