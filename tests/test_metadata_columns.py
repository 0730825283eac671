"""Flink DDL METADATA columns (``c TYPE METADATA [FROM 'key'] [VIRTUAL]``).

Flink connectors expose per-record metadata as declared columns; the
Spark mapping is native on both wired connectors: the filesystem
connector's ``file.path`` / ``file.name`` / ``file.size`` /
``file.modification-time`` come from Spark's hidden per-file
``_metadata`` struct (batch and streaming file scans), and the kafka
connector's ``topic`` / ``partition`` / ``offset`` / ``timestamp`` /
``timestamp-type`` come from the kafka source's own columns (projected
by the broker-free ``kafka_project`` transform).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_commons_spark.plans.ddl import parse_create_table
from flink_commons_spark.sources.registry import (
    ConnectorError,
    PermanentConnectorError,
    build_source,
    kafka_project,
)


def test_metadata_ddl_parsed():
    spec = parse_create_table(
        """CREATE TABLE t (
            a BIGINT,
            fpath STRING METADATA FROM 'file.path' VIRTUAL,
            offset BIGINT METADATA,
            ts TIMESTAMP(3) METADATA FROM 'timestamp'
        ) WITH ('connector' = 'filesystem', 'path' = '/tmp/x')"""
    )
    assert spec.columns == [("a", "bigint")]
    assert spec.metadata_cols == [
        ("fpath", "string", "file.path", True),
        ("offset", "bigint", "offset", False),  # key defaults to the name
        ("ts", "timestamp", "timestamp", False),
    ]


def test_filesystem_metadata_batch(spark, tmp_path):
    data = tmp_path / "t"
    spark.createDataFrame([(1,), (2,)], "a bigint").coalesce(1).write.parquet(str(data))
    spec = parse_create_table(
        f"""CREATE TABLE t (
            a BIGINT,
            fpath STRING METADATA FROM 'file.path' VIRTUAL,
            fname STRING METADATA FROM 'file.name',
            fsize BIGINT METADATA FROM 'file.size',
            mtime TIMESTAMP(3) METADATA FROM 'file.modification-time'
        ) WITH ('connector' = 'filesystem', 'path' = '{data}', 'format' = 'parquet')"""
    )
    rows = build_source(spark, spec, streaming=False).collect()
    assert {r.a for r in rows} == {1, 2}
    for r in rows:
        assert r.fpath.startswith("file:") and r.fname in r.fpath
        assert r.fname.endswith(".parquet")
        assert r.fsize > 0
        assert r.mtime is not None


def test_filesystem_metadata_streaming(spark, tmp_path):
    data = tmp_path / "t"
    spark.createDataFrame([(7,)], "a bigint").coalesce(1).write.parquet(str(data))
    spec = parse_create_table(
        f"""CREATE TABLE t (
            a BIGINT,
            fname STRING METADATA FROM 'file.name'
        ) WITH ('connector' = 'filesystem', 'path' = '{data}', 'format' = 'parquet')"""
    )
    sdf = build_source(spark, spec, streaming=True)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("fcs_test_md_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("fcs_test_md_stream").collect()
    assert len(rows) == 1 and rows[0].a == 7 and rows[0].fname.endswith(".parquet")


def test_filesystem_metadata_unknown_key(spark, tmp_path):
    spec = parse_create_table(
        f"""CREATE TABLE t (a BIGINT, x STRING METADATA FROM 'nope')
           WITH ('connector' = 'filesystem', 'path' = '{tmp_path}', 'format' = 'parquet')"""
    )
    spark.createDataFrame([(1,)], "a bigint").write.mode("overwrite").parquet(str(tmp_path))
    with pytest.raises(ConnectorError, match="nope"):
        build_source(spark, spec, streaming=False)


KAFKA_DDL = """
CREATE TABLE k (
    user_id BIGINT,
    url STRING,
    part INT METADATA FROM 'partition' VIRTUAL,
    off BIGINT METADATA FROM 'offset',
    topic STRING METADATA,
    ts_type STRING METADATA FROM 'timestamp-type'
) WITH ('connector' = 'kafka', 'topic' = 'clicks',
        'properties.bootstrap.servers' = 'x:9092')
"""


def _kafka_raw(spark):
    """kafka-source-shaped frame (the columns Spark's reader yields)."""
    return spark.createDataFrame(
        [
            ('{"user_id":1,"url":"/a"}', "clicks", 0, 5, 0),
            ('{"user_id":2,"url":"/b"}', "clicks", 1, 9, 0),
        ],
        "value string, topic string, partition int, offset bigint, timestampType int",
    )


def test_kafka_metadata_projection(spark):
    spec = parse_create_table(KAFKA_DDL)
    out = kafka_project(_kafka_raw(spark), spec)
    assert out.columns == ["user_id", "url", "part", "off", "topic", "ts_type"]
    rows = {r.user_id: r for r in out.collect()}
    assert rows[1].url == "/a" and rows[1].part == 0 and rows[1].off == 5
    assert rows[2].part == 1 and rows[2].off == 9
    assert rows[1].topic == "clicks" and rows[1].ts_type == "0"


def test_kafka_metadata_unknown_key(spark):
    spec = parse_create_table(
        """CREATE TABLE k (a BIGINT, h STRING METADATA FROM 'headers')
           WITH ('connector' = 'kafka', 'topic' = 't',
                 'properties.bootstrap.servers' = 'x:9092')"""
    )
    with pytest.raises(PermanentConnectorError, match="headers"):
        kafka_project(_kafka_raw(spark), spec)


def test_upsert_kafka_metadata_rejected(spark):
    """The keyed changelog path doesn't carry metadata columns —
    explicit permanent error, no silent drop."""
    spec = parse_create_table(
        """CREATE TABLE u (a BIGINT, off BIGINT METADATA FROM 'offset',
           PRIMARY KEY (a) NOT ENFORCED)
           WITH ('connector' = 'upsert-kafka', 'topic' = 't',
                 'properties.bootstrap.servers' = 'x:9092')"""
    )
    with pytest.raises(PermanentConnectorError, match="METADATA"):
        build_source(spark, spec, streaming=False)


def test_watermark_on_metadata_column(spark, tmp_path):
    """A WATERMARK declared on a metadata column works: metadata is
    materialized before schema extras apply (Flink allows exactly this
    for kafka's 'timestamp')."""
    data = tmp_path / "t"
    spark.createDataFrame([(1,)], "a bigint").coalesce(1).write.parquet(str(data))
    spec = parse_create_table(
        f"""CREATE TABLE t (
            a BIGINT,
            mtime TIMESTAMP(3) METADATA FROM 'file.modification-time',
            WATERMARK FOR mtime AS mtime - INTERVAL '5' SECOND
        ) WITH ('connector' = 'filesystem', 'path' = '{data}', 'format' = 'parquet')"""
    )
    sdf = build_source(spark, spec, streaming=True)
    assert sdf.isStreaming and "mtime" in sdf.columns
