"""Sequence packing: bin documents into token-budget groups.

Training pipelines pack documents into fixed context-window sequences
(e.g. "fill 4096-token windows"). Exact first-fit packing is inherently
sequential; the scalable formulation packs WITHIN HASH SHARDS: shard by
a stable document hash, order documents within the shard, and cut the
running token sum into budget-sized bins. Each (shard, bin) is one
packed sequence; a bin can overflow by at most one document (the one
that straddles the boundary), the standard greedy bound.

Scale posture: one shuffle on the shard key; the running sum is a
window over (shard, doc order). Shard count is the parallelism knob —
at 100 TB use O(cluster cores × 4) shards so each window sort fits in
an executor. Assignment is a pure function of (doc id, token count),
so reruns produce identical packs (md5-based shard, deterministic
order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_commons_spark.operators.sampling import split_bucket


def pack_into_bins(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Assign each row a (shard, bin) packed-sequence id.

    ``bin`` = floor(exclusive running token sum within the shard /
    budget), rows ordered by ``id_col`` — deterministic, and every bin
    except a shard's last holds ≥ budget - max_doc_tokens + 1 tokens.
    """
    shard = (split_bucket(F.col(id_col), salt) % shards).alias("shard")
    w = Window.partitionBy("shard").orderBy(id_col)
    cum_excl = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.withColumn("shard", shard).withColumn(
        "bin", F.floor(cum_excl / F.lit(budget)).cast("bigint")
    )


def pack_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    shards: int = 8,
) -> DataFrame:
    """Per-packed-sequence stats: doc count and token fill."""
    packed = pack_into_bins(df, id_col, token_col, budget, shards)
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).cast("bigint").alias("sum_tokens"),
        F.min(id_col).alias("first_doc"),
    )
