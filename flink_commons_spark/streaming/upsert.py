"""Distributed keyed upsert sink for update-mode streams.

Flink's table sinks absorb retraction/upsert streams natively (the
reference demo's aggregate INSERT, ``test.sql:47-60``, lands on such a
sink). Structured Streaming's file sink is append-only, so update-mode
aggregates need a keyed last-write-wins sink. This module provides the
plain-parquet formulation that scales to a real cluster:

1. **changelog write** — every micro-batch appends its update rows
   tagged with the batch id (``foreachBatch`` → distributed parquet
   append; no driver-side state, no ``collect()``);
2. **compacted read** — the current table state is the latest update
   per key: one ranking window over the changelog
   (``row_number() over (partition by key order by batch desc) = 1``).

Scale posture: the write path is embarrassingly parallel (each executor
writes its partition's files); the read path is one shuffle on the key
— the same cost as the MERGE a Delta/Iceberg sink would run per batch,
paid once at read time instead. Retried batches re-append the same
(key, batch) rows; the compaction dedupes them, making the sink
effectively idempotent. On a lakehouse with a transactional table
format, swap ``writer`` for a per-batch MERGE INTO keyed on the same
columns — the operator surface is unchanged.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

#: changelog metadata column holding the micro-batch id
BATCH_COL = "__batch"


class KeyedParquetUpsertSink:
    """Last-write-wins keyed sink over a parquet changelog directory."""

    def __init__(self, path: str, key_cols: list[str]) -> None:
        self.path = path
        self.key_cols = list(key_cols)

    def writer(self) -> Callable[[DataFrame, int], None]:
        """``foreachBatch`` callable: distributed append of the batch's
        update rows, tagged with the batch id."""
        path = self.path

        def write_batch(bdf: DataFrame, epoch_id: int) -> None:
            bdf.withColumn(BATCH_COL, F.lit(int(epoch_id))).write.mode(
                "append"
            ).parquet(path)

        return write_batch

    def read_final(self, spark: SparkSession) -> DataFrame:
        """Compacted table state: the latest update per key."""
        log = spark.read.parquet(self.path)
        # retry-idempotency: a replayed batch re-appends identical rows
        log = log.dropDuplicates([*self.key_cols, BATCH_COL])
        w = Window.partitionBy(*self.key_cols).orderBy(F.desc(BATCH_COL))
        return (
            log.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", BATCH_COL)
        )
