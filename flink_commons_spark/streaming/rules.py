"""Broadcast-rules pattern — Flink's broadcast state, Spark-native.

Flink's ``BroadcastProcessFunction`` streams a (usually small) rules/
config stream into a broadcast state that every parallel task of the
main stream reads on each element; rules that have ARRIVED by the time
an element is processed are the ones applied to it.

Spark's Structured Streaming equivalent is per-micro-batch rule
refresh: inside ``foreachBatch`` the rules table is RE-READ and
broadcast-joined against the batch, so each micro-batch sees the rule
set current at its own processing time — the same semantics at
micro-batch granularity instead of per-record (the standard Spark
equivalence, identical to how the lookup join treats dim snapshots).

``latest_rules`` is the state-resolution step: given an append-only
versioned rules table (a rules CHANGELOG — new versions of a key are
appended, never updated in place), it returns the newest version of
every key at or below a version horizon. Passing the micro-batch id as
the horizon replays Flink's arrival semantics deterministically, which
is what the ``stream_broadcast_rules`` contract query does; passing
``None`` takes the latest state, which is what a production job does.

Scale posture: the rules table is small by definition (it broadcasts);
resolution is one window over |rules| rows. The main stream is touched
only by a broadcast hash join per batch — no shuffle, no state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_rules(
    rules: DataFrame,
    key_cols: list[str],
    version_col: str = "version",
    upto: int | None = None,
) -> DataFrame:
    """Newest rule per key among versions ``<= upto`` (all if None)."""
    if upto is not None:
        rules = rules.where(F.col(version_col) <= upto)
    w = Window.partitionBy(*key_cols).orderBy(F.desc(version_col))
    return (
        rules.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def broadcast_rules_batch(
    batch_df: DataFrame,
    rules_path: str,
    key_cols: list[str],
    version_col: str = "version",
    upto: int | None = None,
    how: str = "left",
) -> DataFrame:
    """One micro-batch of the pattern: re-read the rules table from
    storage (NEVER cache it across batches — the refresh is the point),
    resolve the current state, broadcast-join it onto the batch."""
    spark = batch_df.sparkSession
    rules = spark.read.parquet(rules_path)
    cur = latest_rules(rules, key_cols, version_col, upto)
    return batch_df.join(F.broadcast(cur), key_cols, how)
