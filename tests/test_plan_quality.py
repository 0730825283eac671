"""Plan-quality regression guard: no contract query may plan a
cartesian product or an unbounded nested-loop join — the two shapes
that silently stop scaling past toy data. Runs every batch entry at
sf0.001 and inspects the executed plan.
"""

from __future__ import annotations

import pytest

from flink_commons_spark import catalog

SF_DIR = "/root/testdata/sf0.001"

#: deliberate exceptions: kNN brute-force broadcasts a BOUNDED probe set
#: against the corpus, and q22 cross-joins a 1-ROW broadcast scalar
#: aggregate (the global average threshold) — nested loops over a
#: bounded broadcast side are those designs (documented in
#: PERFORMANCE.md), not accidents.
ALLOWED_NESTED_LOOP = {
    "knn_brute",
    "q22_sales_opportunity",
    # same 1-row broadcast scalar-aggregate cross join as q22:
    "q11_important_parts",  # global-total threshold
    "q15_top_supplier",  # global-max equality
    "q_python_udfs",  # 1-row unit-norm count joined to the per-lang rows
    "ann_recall",  # 1-row hit count × 1-row truth count
    "ivf_recall",  # same shape
    "ivf_trained_recall",  # same shape, trained centroids
    "ann_pq",  # bounded probe set + distance tables broadcast (knn_brute shape)
    "pq_recall",  # 1-row hit count × 1-row truth count (ann_recall shape)
    "pq_trained_recall",  # same shape, trained codebooks
    "pq_rerank_recall",  # same shape + bounded shortlist broadcast
    "pq_structured_recall",  # pq_trained_recall shape, clustered corpus
    "pq_opq_recall",  # same shape, two bounded-probe ADC legs
    "q_hll_cardinality",  # 1-row sketch estimate × 1-row exact count, ×3
    "emb_matryoshka_recall",  # same shape, truncated dims
    "ann_hamming",  # bounded probe codes broadcast (knn_brute shape)
    # 1-row broadcast scalar totals (ΣW, Σbase) joined onto the
    # |sources|-row allocation table (q22 shape):
    "q_temperature_mixture",
}

BATCH_QUERIES = [
    name for name in catalog.QUERIES
    if not name.startswith("stream_")
]


@pytest.mark.slow
@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_cartesian_or_nested_loop(spark, name):
    df = catalog.QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in ALLOWED_NESTED_LOOP:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join"
        )


@pytest.mark.slow
def test_runtime_bloom_filter_prunes_fact_scan(spark, tmp_path):
    """Runtime filter evidence for the selective-dim join shape every
    TPC-H-style query uses: with a filtered small side, Spark must
    inject a bloom filter built from the dim keys into the fact side
    (`bloom_filter_agg` creation + `might_contain` application), so at
    100 TB the fact scan drops non-qualifying rows before the shuffle
    instead of exchanging them. Thresholds are lowered to test scale;
    the default applicationSideScanSizeThreshold (10 GB) only fires on
    real fact tables."""
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    }
    saved = {}
    for k, v in tuned.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        base = str(tmp_path)
        spark.range(300_000).select(
            (F.col("id") % 1000).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        ).write.parquet(base + "/fact")
        spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        ).write.parquet(base + "/dim")
        fact = spark.read.parquet(base + "/fact")
        dim = spark.read.parquet(base + "/dim").where(F.col("k") % 100 == 0)
        out = fact.join(dim, "k").agg(
            F.count("*").alias("n"), F.sum(F.length("payload")).alias("s")
        )
        assert out.collect()[0]["n"] == 3_000
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, (
            f"no bloom filter built from the dim side:\n{plan}"
        )
        assert "might_contain" in plan, (
            f"bloom filter not applied to the fact side:\n{plan}"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.slow
def test_aqe_splits_skewed_join(spark):
    """The 100 TB failure mode the shape assertions can't see: one hot
    join key owning ~30% of the fact rows. With AQE skew-join enabled
    (the repo's standing config) the sort-merge join must be split at
    runtime — the executed plan carries ``skew=true`` — and the skewed
    run must stay within ~2× of an equal-size unskewed run instead of
    serializing on one straggler partition."""
    import time

    from pyspark.sql import functions as F

    tuned = {
        # force the sort-merge path and make the skew detector's
        # byte thresholds reachable at test scale
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {}
    for k, v in tuned.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        n, keys, hot = 1_000_000, 100_000, 300_000
        dim = spark.range(keys + 1).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("attr")
        )

        def run(fact):
            t0 = time.time()
            # sum(length(payload)) keeps the wide high-entropy payload
            # in the shuffle: a pruned or compressible payload hides
            # the byte skew from the AQE detector (a constant hot key
            # compresses ~perfectly), which is itself a finding this
            # test encodes
            out = fact.join(dim, "k").agg(
                F.sum(F.length("payload")).alias("c"),
                F.sum("attr").alias("s"),
            )
            out.collect()
            plan = out._jdf.queryExecution().executedPlan().toString()
            return time.time() - t0, plan

        skewed = spark.range(n).select(
            F.when(F.col("id") < hot, F.lit(0))
            .otherwise(F.pmod(F.col("id"), keys) + 1)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        uniform = spark.range(n).select(
            (F.pmod(F.col("id"), keys) + 1).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        t_uni, _ = run(uniform)
        t_skew, plan_skew = run(skewed)
        assert "skew=true" in plan_skew, (
            f"AQE did not split the skewed join:\n{plan_skew}"
        )
        # generous 2.5x bound: local[32] timing noise on a ~seconds-long
        # join; without the split the hot partition serializes ~30% of
        # the work on one task and blows far past this
        assert t_skew <= 2.5 * max(t_uni, 0.5), (
            f"skewed join {t_skew:.1f}s vs uniform {t_uni:.1f}s"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
