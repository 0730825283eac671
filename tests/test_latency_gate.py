"""Streaming latency gate vs BASELINE.md's 5 s bound.

BASELINE.md derives "streaming aggregation latency ≤ 5 s" from the
reference demo's ``table.exec.mini-batch.allow-latency = 5s``
(``test.sql:5``). This test runs the demo-SHAPED pipeline — per-(dim,
minute) pv / uv / sum / max / min aggregation — from a rate source at
**10,000 rows/s (1000× the demo's 10 rows/s datagen)** under
``trigger(processingTime='5 seconds')`` and asserts the p95 per-batch
trigger-to-sink latency stays within the 5 s bound, i.e. the engine
keeps up: every micro-batch finishes inside its trigger interval, so
end-to-end staleness is bounded by trigger + batch ≤ 2×5 s, the same
envelope Flink's mini-batch setting promises.

``count(distinct user_id)`` follows the runner's documented streaming
rewrite to ``approx_count_distinct`` (exact streaming COUNT DISTINCT
is a separate contract query; the latency gate measures the demo
shape).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

RATE = 10_000          # rows/s — 1000× the demo datagen
TRIGGER_S = 5
N_BATCHES = 7          # ~35 s of measurement after warmup
WARMUP_BATCHES = 2     # first batches pay codegen/state-store spin-up


@pytest.mark.slow
def test_demo_pipeline_p95_batch_latency_within_5s(spark):
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", RATE)
        .load()
        .withWatermark("timestamp", "5 seconds")
        .select(
            F.chr(F.lit(65) + F.col("value") % 26).alias("dim"),
            (F.col("value") % 100_000).alias("user_id"),
            (F.lit(50.0) + (F.col("value") % 950)).alias("price"),
            "timestamp",
        )
    )
    agg = (
        src.groupBy(
            "dim",
            (F.unix_timestamp("timestamp") / 60).cast("bigint").alias(
                "window_start"
            ),
        )
        .agg(
            F.count("*").alias("pv"),
            F.approx_count_distinct("user_id").alias("uv"),
            F.sum("price").alias("sum_price"),
            F.max("price").alias("max_price"),
            F.min("price").alias("min_price"),
        )
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("noop")
        .trigger(processingTime=f"{TRIGGER_S} seconds")
        .start()
    )
    try:
        deadline = time.time() + (N_BATCHES + WARMUP_BATCHES + 3) * TRIGGER_S
        while time.time() < deadline:
            done = [
                p for p in q.recentProgress if p["numInputRows"] > 0
            ]
            if len(done) >= N_BATCHES + WARMUP_BATCHES:
                break
            time.sleep(1)
        progresses = [p for p in q.recentProgress if p["numInputRows"] > 0]
    finally:
        q.stop()

    assert len(progresses) >= N_BATCHES + WARMUP_BATCHES, (
        f"only {len(progresses)} data batches completed — the engine is "
        f"not keeping up with {RATE} rows/s at a {TRIGGER_S}s trigger"
    )
    measured = progresses[WARMUP_BATCHES:]
    lat_ms = sorted(
        p["durationMs"]["triggerExecution"] for p in measured
    )
    p95 = lat_ms[min(len(lat_ms) - 1, int(len(lat_ms) * 0.95))]
    rows_per_s = [p["processedRowsPerSecond"] for p in measured]
    print(
        f"latency gate: {len(measured)} batches, p95 trigger-to-sink "
        f"{p95} ms, median processed {sorted(rows_per_s)[len(rows_per_s)//2]:.0f} rows/s"
    )
    assert p95 <= TRIGGER_S * 1000, (
        f"p95 batch latency {p95} ms exceeds the {TRIGGER_S}s bound "
        f"(per-batch: {lat_ms})"
    )
    # steady state must actually ingest the offered rate (no backlog
    # growth): every measured batch carries ~TRIGGER_S * RATE rows
    for p in measured:
        assert p["numInputRows"] >= RATE * TRIGGER_S * 0.5, (
            f"batch ingested only {p['numInputRows']} rows — backlog or "
            "source starvation"
        )
