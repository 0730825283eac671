"""No contract query may leave the session conf mutated.

Round-2 verdict: catalog stream queries set ``spark.sql.session.timeZone``
and ``spark.sql.legacy.parquet.nanosAsLong`` session-wide without
restoring, so a later non-stream query silently inherited UTC +
nanos-as-long. Every ``catalog.QUERIES`` entry is now wrapped in a
save/restore (the registry's scoped pattern); this test drives a
representative mix — plain batch, the common-loader path, a pandas-UDF
operator, and a real Structured Streaming entry — and asserts the conf
is byte-identical before and after both construction and execution.
"""

from __future__ import annotations

import pytest

from flink_commons_spark import catalog

SF_DIR = "/root/testdata/sf0.001"

KEYS = (
    "spark.sql.session.timeZone",
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.shuffle.partitions",
)


def _snapshot(spark):
    return {k: spark.conf.get(k, None) for k in KEYS}


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "q_minute_agg", "dedup_exact", "stream_minute_agg"],
)
def test_query_leaves_session_conf_untouched(spark, name):
    before = _snapshot(spark)
    df = catalog.QUERIES[name](spark, SF_DIR)
    assert _snapshot(spark) == before, f"{name} mutated conf at construction"
    df.count()
    assert _snapshot(spark) == before, f"{name} mutated conf at execution"


def test_restore_clears_previously_unset_key(spark):
    # nanosAsLong is unset in a fresh session; after a query that needs
    # it, it must be unset again — not left at "true".
    key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    catalog.QUERIES["q_minute_agg"](spark, SF_DIR).count()
    assert spark.conf.get(key, None) is None


def test_stream_shuffle_honors_cluster_parallelism(spark):
    """r15 (verdict item 4): the per-family 8/16 stream shuffle
    constants are LOCAL defaults only — a cluster-provided parallelism
    (``spark.default.parallelism``, where the runner's ``SET
    'parallelism.default'`` lands, or the dedicated
    ``spark.flinkcommons.stream.shuffle.partitions`` override) must win
    inside the scoped region, and the session value must be restored
    afterwards either way."""
    from flink_commons_spark.catalog import _with_stream_shuffle

    seen = {}

    @_with_stream_shuffle(8)
    def probe(sp, _sf):
        seen["n"] = sp.conf.get("spark.sql.shuffle.partitions")
        return None

    before = spark.conf.get("spark.sql.shuffle.partitions")
    probe(spark, SF_DIR)
    assert seen["n"] == "8"  # no cluster conf -> the local default
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    spark.conf.set("spark.default.parallelism", "24")
    try:
        probe(spark, SF_DIR)
        assert seen["n"] == "24"  # runner parallelism wins
        spark.conf.set(
            "spark.flinkcommons.stream.shuffle.partitions", "12"
        )
        probe(spark, SF_DIR)
        assert seen["n"] == "12"  # dedicated override wins over both
        assert spark.conf.get("spark.sql.shuffle.partitions") == before
    finally:
        spark.conf.unset("spark.default.parallelism")
        spark.conf.unset("spark.flinkcommons.stream.shuffle.partitions")
