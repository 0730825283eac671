"""DDL interceptor tests against the reference's actual DDL shapes."""

import pytest

from flink_commons_spark.plans.ddl import (
    DDLParseError,
    is_connector_ddl,
    parse_create_table,
)

# the source table from the reference demo, verbatim shape (test.sql:14-28)
SOURCE_DDL = """create table if not exists `default_catalog`.`default_database`.`tbl_aggregate_source`(
    dim string,
    user_id bigint,
    price double,
    row_time as cast(current_timestamp as timestamp(3)),
    watermark for row_time as row_time - interval '5' second
    ) with (
          'connector' = 'datagen',
          'rows-per-second' = '10',
          'fields.dim.length' = '1',
          'fields.user_id.min' = '1',
          'fields.user_id.max' = '100000',
          'fields.price.min' = '50',
          'fields.price.max' = '1000'
          )"""

SINK_DDL = """create table if not exists `default_catalog`.`default_database`.`tbl_aggregate_sink`(
    dim string, pv bigint, uv bigint, sum_price double,
    max_price double, min_price double, window_start bigint
) with ('connector' = 'print', 'print-identifier' = 'tbl_aggregate_sink')"""


def test_is_connector_ddl():
    assert is_connector_ddl(SOURCE_DDL)
    assert is_connector_ddl(SINK_DDL)
    assert not is_connector_ddl("CREATE TABLE t (a INT) USING parquet")
    assert not is_connector_ddl("SELECT 1")


def test_parse_source_ddl():
    spec = parse_create_table(SOURCE_DDL)
    assert spec.name == "tbl_aggregate_source"
    assert spec.if_not_exists
    assert spec.columns == [("dim", "string"), ("user_id", "bigint"), ("price", "double")]
    assert spec.computed == [("row_time", "cast(current_timestamp as timestamp)")]
    assert spec.watermark == ("row_time", "5 seconds")
    assert spec.connector == "datagen"
    assert spec.options["rows-per-second"] == "10"
    assert spec.options["fields.user_id.max"] == "100000"
    assert "`default_catalog`.`default_database`.`tbl_aggregate_source`" in spec.full_identifiers


def test_parse_sink_ddl():
    spec = parse_create_table(SINK_DDL)
    assert spec.name == "tbl_aggregate_sink"
    assert len(spec.columns) == 7
    assert spec.connector == "print"
    assert spec.options["print-identifier"] == "tbl_aggregate_sink"
    assert spec.watermark is None
    assert spec.computed == []


def test_type_mapping():
    ddl = """CREATE TABLE t (
        a STRING, b VARCHAR(10), c BOOLEAN, d TINYINT, e SMALLINT,
        f INT, g INTEGER, h BIGINT, i FLOAT, j DOUBLE,
        k DECIMAL(10,2), l DATE, m TIMESTAMP(3), n BYTES,
        o ARRAY<FLOAT>, p MAP<STRING, BIGINT>, q ROW<x INT, y STRING>
    ) WITH ('connector' = 'filesystem', 'path' = '/tmp/x')"""
    spec = parse_create_table(ddl)
    types = dict(spec.columns)
    assert types["a"] == "string"
    assert types["b"] == "string"
    assert types["c"] == "boolean"
    assert types["d"] == "tinyint"
    assert types["f"] == "int"
    assert types["g"] == "int"
    assert types["h"] == "bigint"
    assert types["i"] == "float"
    assert types["j"] == "double"
    assert types["k"] == "decimal(10,2)"
    assert types["l"] == "date"
    assert types["m"] == "timestamp"
    assert types["n"] == "binary"
    assert types["o"] == "array<float>"
    assert types["p"] == "map<string,bigint>"
    assert types["q"] == "struct<x:int,y:string>"


def test_watermark_units():
    for unit, expected in [("SECOND", "5 seconds"), ("MINUTE", "5 minutes"), ("HOUR", "5 hours")]:
        ddl = (
            f"CREATE TABLE t (ts TIMESTAMP(3), WATERMARK FOR ts AS ts - INTERVAL '5' {unit}) "
            "WITH ('connector' = 'datagen')"
        )
        assert parse_create_table(ddl).watermark == ("ts", expected)


def test_primary_key_ignored():
    ddl = """CREATE TABLE t (id BIGINT, v STRING, PRIMARY KEY (id) NOT ENFORCED)
             WITH ('connector' = 'print')"""
    spec = parse_create_table(ddl)
    assert spec.columns == [("id", "bigint"), ("v", "string")]


def test_unsupported_type_raises():
    with pytest.raises(DDLParseError):
        parse_create_table("CREATE TABLE t (a GEOMETRY) WITH ('connector'='print')")


def test_single_part_name():
    spec = parse_create_table("CREATE TABLE plain_name (a INT) WITH ('connector'='print')")
    assert spec.name == "plain_name"
    assert not spec.if_not_exists


def test_partitioned_by_parsed():
    ddl = """CREATE TABLE t (dt STRING, ev STRING, n BIGINT)
             PARTITIONED BY (dt, ev)
             WITH ('connector' = 'filesystem', 'path' = '/tmp/x', 'format' = 'parquet')"""
    spec = parse_create_table(ddl)
    assert spec.partitioned_by == ["dt", "ev"]
    assert spec.columns == [("dt", "string"), ("ev", "string"), ("n", "bigint")]
    assert spec.options["path"] == "/tmp/x"


def test_partitioned_by_unknown_column_raises():
    ddl = """CREATE TABLE t (a BIGINT) PARTITIONED BY (nope)
             WITH ('connector' = 'filesystem', 'path' = '/tmp/x')"""
    with pytest.raises(DDLParseError):
        parse_create_table(ddl)


def test_kafka_connector_option_mapping_and_gating(spark):
    """kafka/upsert-kafka DDL is recognized and fully option-mapped;
    in a build without the kafka package the failure is the precise
    'not on classpath' error, never an unknown-connector one."""
    import pytest

    from flink_commons_spark.plans.ddl import parse_create_table
    from flink_commons_spark.sources.registry import ConnectorError, build_source

    spec = parse_create_table(
        """
        CREATE TABLE clicks (
            user_id BIGINT,
            url STRING,
            ts TIMESTAMP(3)
        ) WITH (
            'connector' = 'kafka',
            'topic' = 'clicks',
            'properties.bootstrap.servers' = 'localhost:9092',
            'scan.startup.mode' = 'earliest-offset',
            'value.format' = 'json'
        )
        """
    )
    assert spec.connector == "kafka" and spec.options["topic"] == "clicks"
    try:
        build_source(spark, spec, streaming=False)
        has_kafka = True  # environment ships the package: mapping worked
    except ConnectorError as exc:
        has_kafka = False
        assert "classpath" in str(exc) and "spark-sql-kafka" in str(exc)
    if not has_kafka:
        # missing mandatory options fail BEFORE the classpath gate
        bad = parse_create_table(
            "CREATE TABLE b (x INT) WITH ('connector' = 'kafka')"
        )
        with pytest.raises(ConnectorError, match="requires"):
            build_source(spark, bad, streaming=False)
