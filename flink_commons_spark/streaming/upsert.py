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
    """Last-write-wins keyed sink over a parquet changelog directory.

    ``write_partitions`` bounds the files appended per micro-batch: a
    windowed aggregate's update set is (open windows × dims) rows —
    tiny next to the state-store stage's shuffle width — so writing it
    at shuffle parallelism produces N near-empty files per batch whose
    listing/open cost then dominates ``read_final`` (measured ~0.7 s of
    ``stream_exact_uv``'s 2.9 s at sf0.1). The repartition adds a small
    shuffle AFTER the stateful stage (never narrowing the state-store
    stage itself, which must keep its partitioning). Leave ``None``
    for update sets that are actually large — e.g. a per-key CDC
    mirror at full cardinality — the same dial as a lakehouse sink's
    optimized-write setting."""

    def __init__(
        self,
        path: str,
        key_cols: list[str],
        write_partitions: "int | None" = None,
    ) -> None:
        self.path = path
        self.key_cols = list(key_cols)
        self.write_partitions = write_partitions

    def writer(self) -> Callable[[DataFrame, int], None]:
        """``foreachBatch`` callable: distributed append of the batch's
        update rows, tagged with the batch id."""
        path = self.path
        nparts = self.write_partitions

        def write_batch(bdf: DataFrame, epoch_id: int) -> None:
            if nparts is not None:
                bdf = bdf.repartition(nparts)
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

    def compact(self, spark: SparkSession) -> int:
        """Rewrite the changelog to one snapshot row per key.

        Offline maintenance (run with no concurrent writer): the
        compacted state is staged under a hidden directory (Spark
        ignores dot-prefixed paths), the old changelog files are
        removed, and the staged files move in — keeping the highest
        batch id so later streaming batches still supersede the
        snapshot. Returns the number of data files after compaction.
        On HDFS/object stores swap the os-level moves for the
        filesystem's rename API; on a transactional table format this
        whole method is the engine's OPTIMIZE.
        """
        import glob
        import os
        import shutil

        log = spark.read.parquet(self.path)
        top = log.agg(F.max(BATCH_COL)).first()[0]
        if top is None:
            return 0
        staging = os.path.join(self.path, ".compact-staging")
        shutil.rmtree(staging, ignore_errors=True)
        (
            self.read_final(spark)
            .withColumn(BATCH_COL, F.lit(int(top)))
            .write.mode("overwrite")
            .parquet(staging)
        )
        old = set(glob.glob(os.path.join(self.path, "*.parquet"))) | set(
            glob.glob(os.path.join(self.path, "part-*"))
        )
        for f in old:
            os.remove(f)
        moved = 0
        for f in glob.glob(os.path.join(staging, "part-*")):
            shutil.move(f, os.path.join(self.path, os.path.basename(f)))
            moved += 1
        shutil.rmtree(staging, ignore_errors=True)
        return moved
