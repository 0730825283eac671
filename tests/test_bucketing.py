"""Bucketed co-located joins: the shuffle-elimination pattern for
repeated large-table joins at 100 TB.

Writing both join sides bucketed by the join key lets Catalyst plan a
sort-merge join with **no Exchange** on either side — the shuffle is
paid once at write time and amortized over every subsequent join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(autouse=True)
def _no_broadcast(spark):
    """Force the shuffle path (the thing under test) WITHOUT leaking
    the conf into later test modules on the shared session — an
    unrestored ``-1`` turns scalar-broadcast joins elsewhere into
    cartesian products and fails the plan-quality gate."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture()
def warehouse_tables(spark):
    # spark.sql.warehouse.dir is static; tables land in ./spark-warehouse
    # (gitignored) and are dropped (managed → data deleted) on teardown
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (li.write.mode("overwrite").bucketBy(4, "l_orderkey")
       .sortBy("l_orderkey").saveAsTable("b_lineitem"))
    (o.write.mode("overwrite").bucketBy(4, "o_orderkey")
       .sortBy("o_orderkey").saveAsTable("b_orders"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, warehouse_tables):
    joined = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must consume bucketed scans directly: the only
    # exchange allowed is the one feeding the final aggregation
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    rows = {r.o_orderstatus: r.n for r in joined.collect()}
    assert sum(rows.values()) == 6000
    assert join_section is not None  # structure sanity


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join over raw parquet shuffles both sides."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan


def test_partition_pruning_plan(spark, tmp_path):
    """A filter on the partition column must prune at the FileIndex:
    PartitionFilters carries the predicate and the data filters stay
    empty — the scan never opens non-matching directories."""
    from pyspark.sql import functions as F

    src = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("p")
    )
    src.write.partitionBy("p").mode("overwrite").parquet(str(tmp_path / "pt"))
    read = spark.read.parquet(str(tmp_path / "pt")).where("p = '3'")
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in plan and "(p#" in plan
    # the partition predicate must NOT appear as a post-scan data filter
    assert read.count() == 200

def test_bucketed_build_is_sf_dir_scoped(spark):
    """Regression (round-6 advice): a session that builds bucketed
    tables for two scale factors must keep them physically distinct —
    the probe leg for sf A must not silently read sf B's bytes because
    the build memo remembered (app, A) while the shared table names
    now hold B."""
    from flink_commons_spark import catalog as C

    a, b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    li_a, _ = C._build_bucketed_tables(spark, a)
    n_a = spark.table(li_a).count()
    li_b, _ = C._build_bucketed_tables(spark, b)
    n_b = spark.table(li_b).count()
    assert li_a != li_b and n_a != n_b
    # probe leg for A again: memo hit must serve A's row count
    probe = C.q_bucketed_join_probe(spark, a)
    assert sum(r.n_items for r in probe.collect()) == n_a
