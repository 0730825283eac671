"""Distributed global ranking — no single-reducer sort.

A global ``row_number()`` window (no PARTITION BY) funnels the whole
dataset through ONE task; at 100 TB that is the canonical scale
killer. The classic distributed formulation:

1. ``repartitionByRange`` on the order columns (range exchange — every
   partition holds a contiguous, sorted slice);
2. partition-local ``row_number`` (parallel ranking windows keyed on
   the physical partition id);
3. one tiny count-per-partition job (⟶ driver holds #partitions ints,
   nothing else) → cumulative offsets broadcast back as a map literal;
4. global rank = partition offset + local rank.

Exact ``ntile`` then derives arithmetically from (rank, total): the
first ``n mod k`` buckets get ``ceil(n/k)`` rows — the SQL-standard
allocation, reproduced bit-for-bit.
"""

from __future__ import annotations

from itertools import accumulate

from pyspark.sql import Column, DataFrame, Window, functions as F


def _ranked_with_total(
    df: DataFrame, order_cols: list[str], num_partitions: int | None
) -> tuple[DataFrame, int]:
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
    w = Window.partitionBy("__pid").orderBy(*[F.asc(c) for c in order_cols])
    # materialize once: the sizes job and the output both read it, and
    # the partition ids must come from one physical layout
    local = (
        ranged.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrn", F.row_number().over(w))
        .localCheckpoint(eager=True)
    )
    # bounded driver state: one (pid, count) row per partition
    sizes = {r["__pid"]: r["n"] for r in
             local.groupBy("__pid").agg(F.count("*").alias("n")).collect()}
    if not sizes:
        return df.withColumn("rn", F.lit(None).cast("bigint")), 0
    pids = sorted(sizes)
    offsets = dict(zip(pids, accumulate([0] + [sizes[p] for p in pids[:-1]])))
    offset_map = F.create_map(
        *[x for pid in pids for x in (F.lit(pid), F.lit(offsets[pid]))]
    )
    out = (
        local.withColumn(
            "rn", (F.element_at(offset_map, F.col("__pid")) + F.col("__lrn")).cast("bigint")
        )
        .drop("__pid", "__lrn")
    )
    return out, sum(sizes.values())


def global_row_number(
    df: DataFrame, order_cols: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Attach ``rn`` (1-based global rank by ``order_cols``) without a
    global sort: range exchange + parallel local windows + offsets."""
    return _ranked_with_total(df, order_cols, num_partitions)[0]


def _ntile_from_rank(rank: Column, n: int, k: int) -> Column:
    """SQL-standard ntile from a 1-based global rank: the first
    ``n mod k`` buckets take ``n//k + 1`` rows, the rest ``n//k``."""
    big = n // k + 1
    n_big = n % k
    cutoff = big * n_big
    small = max(n // k, 1)
    return F.when(
        rank <= cutoff, ((rank - 1) / big).cast("bigint") + 1
    ).otherwise(
        F.lit(n_big) + ((rank - cutoff - 1) / small).cast("bigint") + 1
    ).cast("int")


def global_ntile(
    df: DataFrame, order_cols: list[str], k: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact distributed ``ntile(k)`` over a total order — identical
    bucket assignment to the single-window SQL form, no global sort.
    The total row count (needed for the SQL-standard uneven-bucket
    allocation) falls out of the partition-sizes job for free."""
    ranked, n = _ranked_with_total(df, order_cols, num_partitions)
    if n == 0:
        return ranked.withColumn("ntile", F.lit(None).cast("int")).drop("rn")
    return ranked.withColumn(
        "ntile", _ntile_from_rank(F.col("rn"), n, k)
    ).drop("rn")
