"""As-of (point-in-time) join — an operator Spark SQL lacks natively.

``asof_join(left, right)`` attaches to every left row the latest right
row with the same key and ``right.time <= left.time``.

Implementation is the *union-sort* formulation, chosen for scale:

1. tag and union both inputs (no join yet);
2. one shuffle: ``Window.partitionBy(key).orderBy(time, side)`` where
   right rows sort before left rows at equal timestamps (inclusive
   match);
3. ``last(value, ignorenulls=True)`` carries the most recent right
   payload forward; filter back to left rows.

Cost: a single hash-partition + per-partition sort — the same plan
shape as a sort-merge join but with **no pairwise matching blow-up**,
no range-condition nested loop, and bounded memory (Spark's window
operator spills). This survives 100 TB where a naive
``left.time >= right.time`` theta-join would explode.

DuckDB expresses the same semantics natively (``ASOF JOIN``), which is
what the correctness oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time join; returns all left columns + ``payload`` columns
    from the latest right row at-or-before the left row's time
    (``direction="backward"``, the default) or the EARLIEST right row
    at-or-after it (``direction="forward"`` — the "next quote/order"
    lookup). Forward is the same union-sort plan scanned in descending
    time order; cost and scale posture are identical.

    ``on`` is the equality key present in both inputs. Right rows that
    tie on (key, time) must be pre-deduplicated by the caller if a
    deterministic winner is required.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_cols = left.columns
    l = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(1))
    for p in payload:
        l = l.withColumn(p, F.lit(None).cast(right.schema[p].dataType))
    r = right.withColumn("__t", F.col(right_time)).withColumn("__side", F.lit(0))
    for c in left_cols:
        if c not in right.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [on, "__t", "__side", *[c for c in left_cols if c != on], *payload]
    unioned = l.select(*cols).unionByName(r.select(*cols))

    # backward scans ascending time (last right seen = latest ≤ t);
    # forward scans DESCENDING (last right seen = earliest ≥ t). Either
    # way right rows (__side 0) sort before left at equal timestamps so
    # the match is inclusive.
    time_order = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(time_order, F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in [on, "__t", "__side", *[c for c in left_cols if c != on]]],
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    return filled.where(F.col("__side") == 1).drop("__t", "__side")
