"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real definitions live in :mod:`flink_commons_spark.catalog`.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the sibling package importable regardless of the driver's cwd
_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from flink_commons_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference demo's aggregation, batch form) on
    /root/testdata/sf0.001."""
    # go through QUERIES (not the bare function) so the session-conf
    # save/restore wrapper applies to the driver's smoke check too
    return catalog.QUERIES["q_minute_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLES)
