"""datagen connector: Flink-option semantics on the Spark rate/range spine."""

from __future__ import annotations

from flink_commons_spark.plans.ddl import parse_create_table
from flink_commons_spark.sources import datagen

_DDL = """
CREATE TABLE t (
    dim STRING,
    user_id BIGINT,
    price DOUBLE,
    seq BIGINT
) WITH (
    'connector' = 'datagen',
    'number-of-rows' = '200',
    'seed' = '42',
    'fields.dim.length' = '3',
    'fields.user_id.min' = '10',
    'fields.user_id.max' = '20',
    'fields.price.min' = '50',
    'fields.price.max' = '60',
    'fields.seq.kind' = 'sequence',
    'fields.seq.start' = '100'
)
"""


def test_batch_datagen_honors_options(spark):
    spec = parse_create_table(_DDL)
    rows = datagen.batch_source(spark, spec).collect()
    assert len(rows) == 200
    assert all(len(r.dim) == 3 for r in rows)
    assert all(10 <= r.user_id <= 20 for r in rows)
    assert all(50 <= r.price <= 60 for r in rows)
    assert sorted(r.seq for r in rows) == list(range(100, 300))


def test_batch_datagen_seed_deterministic(spark):
    spec = parse_create_table(_DDL)
    a = [tuple(r) for r in datagen.batch_source(spark, spec).collect()]
    b = [tuple(r) for r in datagen.batch_source(spark, spec).collect()]
    assert sorted(a) == sorted(b)
