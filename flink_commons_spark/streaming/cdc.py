"""Changelog (CDC) application — Flink's upsert/retract stream → table.

Flink models every updating query result as a changelog of +I/-U/+U/-D
rows and its upsert sinks materialize that changelog into current table
state keyed on the primary key (the reference's sink tables absorb
exactly this stream class). Structured Streaming has no changelog row
kind, so the equivalent is built from parts Spark does have:

1. **per-batch compaction** — inside ``foreachBatch``, reduce the
   micro-batch to its LAST change per key (ranking window over the
   event-order columns). This is the "compact the batch before MERGE"
   pattern every Spark CDC pipeline uses: without it, two updates to
   one key in one batch would land with the same batch id and the
   winner would be arbitrary.
2. **changelog append** — the compacted rows append to a
   :class:`~flink_commons_spark.streaming.upsert.KeyedParquetUpsertSink`
   changelog tagged with the batch id (distributed write, no driver
   state).
3. **tombstone-aware read** — current state is the latest change per
   key with DELETE rows filtered out AFTER the ranking (a delete
   suppresses the key; a later re-insert resurrects it).

Scale posture: the compaction shuffles each micro-batch on the key
(bounded by batch size, not table size); the final read is the sink's
one ranking window over the changelog. On a transactional lakehouse
table swap step 2+3 for ``MERGE INTO ... WHEN MATCHED AND op = 'D'
THEN DELETE`` — the operator surface is unchanged.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flink_commons_spark.streaming.upsert import BATCH_COL, KeyedParquetUpsertSink

#: changelog row-kind column: 'U' upsert (+I/+U collapsed), 'D' delete
OP_COL = "op"


def changelog_writer(
    sink: KeyedParquetUpsertSink, order_cols: list[str]
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` callable applying a changelog batch to the sink.

    ``order_cols`` define the change order WITHIN a batch (event time +
    a unique tie-break); the last change per key wins the batch.
    """
    key_cols = sink.key_cols
    path = sink.path

    def write_batch(bdf: DataFrame, epoch_id: int) -> None:
        w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
        latest = (
            bdf.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        latest.withColumn(BATCH_COL, F.lit(int(epoch_id))).write.mode(
            "append"
        ).parquet(path)

    return write_batch


def read_current_state(sink: KeyedParquetUpsertSink, spark: SparkSession) -> DataFrame:
    """Materialized table state: latest change per key, deletes applied."""
    return sink.read_final(spark).where(F.col(OP_COL) != "D").drop(OP_COL)
