"""upsert-kafka keyed semantics (round-2 advice, medium).

Flink's upsert-kafka connector (flink-connector-kafka
``UpsertKafkaDynamicTableFactory``): the PRIMARY KEY becomes the Kafka
record key, a DELETE becomes a NULL-value tombstone on that key, and
reads normalize the keyed changelog (latest record per key wins;
tombstones suppress the key). No broker or kafka package exists in this
environment, so the record-level transforms are factored as pure
DataFrame functions and exercised here on kafka-shaped frames
(``key``/``value``/``partition``/``offset``) — the same columns Spark's
kafka source yields. The classpath gating itself is covered in
test_ddl.py.
"""

from __future__ import annotations

import pytest

from flink_commons_spark.plans.ddl import parse_create_table
from flink_commons_spark.sources.registry import (
    PermanentConnectorError,
    _CDC_OP_COL,
    build_source,
    upsert_kafka_changelog,
    upsert_kafka_compact,
    upsert_kafka_payload,
)

UPSERT_DDL = """
CREATE TABLE uv (
    user_id BIGINT,
    region STRING,
    clicks BIGINT,
    PRIMARY KEY (user_id) NOT ENFORCED
) WITH (
    'connector' = 'upsert-kafka',
    'topic' = 'uv',
    'properties.bootstrap.servers' = 'localhost:9092',
    'key.format' = 'json',
    'value.format' = 'json'
)
"""


@pytest.fixture(scope="module")
def spec():
    return parse_create_table(UPSERT_DDL)


def test_primary_key_parsed(spec):
    assert spec.primary_key == ["user_id"]
    assert spec.connector == "upsert-kafka"


def test_constraint_form_primary_key_parsed():
    s = parse_create_table(
        """CREATE TABLE t (a BIGINT, b STRING,
           CONSTRAINT pk PRIMARY KEY (a, b) NOT ENFORCED)
           WITH ('connector' = 'upsert-kafka', 'topic' = 't',
                 'properties.bootstrap.servers' = 'x:9092')"""
    )
    assert s.primary_key == ["a", "b"]


def test_missing_primary_key_rejected_at_ddl(spark):
    """No silent degradation to plain kafka: upsert-kafka without a PK
    is a PermanentConnectorError before any classpath probe."""
    s = parse_create_table(
        """CREATE TABLE nopk (a BIGINT, b STRING)
           WITH ('connector' = 'upsert-kafka', 'topic' = 'n',
                 'properties.bootstrap.servers' = 'x:9092')"""
    )
    with pytest.raises(PermanentConnectorError, match="PRIMARY KEY"):
        build_source(spark, s, streaming=False)


def test_pk_must_be_declared_column(spark):
    s = parse_create_table(
        """CREATE TABLE badpk (a BIGINT,
           PRIMARY KEY (zz) NOT ENFORCED)
           WITH ('connector' = 'upsert-kafka', 'topic' = 'n',
                 'properties.bootstrap.servers' = 'x:9092')"""
    )
    with pytest.raises(PermanentConnectorError, match="not declared"):
        build_source(spark, s, streaming=False)


def test_payload_writes_key_and_full_value(spark, spec):
    df = spark.createDataFrame(
        [(1, "eu", 5), (2, "us", 7)], "user_id bigint, region string, clicks bigint"
    )
    rows = {r["key"]: r["value"] for r in upsert_kafka_payload(df, spec).collect()}
    assert rows['{"user_id":1}'] == '{"user_id":1,"region":"eu","clicks":5}'
    assert rows['{"user_id":2}'] == '{"user_id":2,"region":"us","clicks":7}'


def test_payload_delete_becomes_tombstone(spark, spec):
    """op='D' rows (the CDC machinery's row kind) write a NULL value on
    the key — the tombstone compacted topics require."""
    df = spark.createDataFrame(
        [(1, "eu", 5, "U"), (2, "us", 7, "D")],
        f"user_id bigint, region string, clicks bigint, {_CDC_OP_COL} string",
    )
    rows = {r["key"]: r["value"] for r in upsert_kafka_payload(df, spec).collect()}
    assert rows['{"user_id":1}'] is not None
    assert rows['{"user_id":2}'] is None
    # the op column itself never leaks into the value payload
    assert _CDC_OP_COL not in rows['{"user_id":1}']


def _raw(spark, records):
    """kafka-shaped frame: (key, value, partition, offset)."""
    return spark.createDataFrame(
        records, "key string, value string, partition int, offset bigint"
    )


def test_compact_latest_per_key_wins(spark, spec):
    raw = _raw(spark, [
        ('{"user_id":1}', '{"user_id":1,"region":"eu","clicks":1}', 0, 0),
        ('{"user_id":1}', '{"user_id":1,"region":"eu","clicks":9}', 0, 2),
        ('{"user_id":2}', '{"user_id":2,"region":"us","clicks":4}', 1, 0),
    ])
    got = {r.user_id: (r.region, r.clicks)
           for r in upsert_kafka_compact(raw, spec).collect()}
    assert got == {1: ("eu", 9), 2: ("us", 4)}


def test_compact_tombstone_suppresses_and_reinsert_resurrects(spark, spec):
    raw = _raw(spark, [
        ('{"user_id":1}', '{"user_id":1,"region":"eu","clicks":1}', 0, 0),
        ('{"user_id":1}', None, 0, 1),                                  # delete
        ('{"user_id":2}', '{"user_id":2,"region":"us","clicks":4}', 1, 0),
        ('{"user_id":2}', None, 1, 1),                                  # delete
        ('{"user_id":2}', '{"user_id":2,"region":"ap","clicks":8}', 1, 2),  # re-insert
    ])
    got = {r.user_id: (r.region, r.clicks)
           for r in upsert_kafka_compact(raw, spec).collect()}
    assert got == {2: ("ap", 8)}  # key 1 tombstoned; key 2 resurrected


def test_changelog_shape_for_streaming_read(spark, spec):
    """The streaming read exposes the normalized changelog: declared
    columns + op ('U'/'D'), tombstone rows carrying the key columns."""
    raw = _raw(spark, [
        ('{"user_id":1}', '{"user_id":1,"region":"eu","clicks":1}', 0, 0),
        ('{"user_id":1}', None, 0, 1),
    ])
    rows = sorted(
        upsert_kafka_changelog(raw, spec).collect(), key=lambda r: r[_CDC_OP_COL]
    )
    assert [r[_CDC_OP_COL] for r in rows] == ["D", "U"]
    delete, upsert = rows
    assert upsert.user_id == 1 and upsert.region == "eu" and upsert.clicks == 1
    assert delete.user_id == 1 and delete.region is None and delete.clicks is None


def test_op_col_matches_cdc_machinery():
    from flink_commons_spark.streaming.cdc import OP_COL

    assert _CDC_OP_COL == OP_COL
