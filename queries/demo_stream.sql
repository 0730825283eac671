-- Port of the reference's demo script (test.sql:1-66) to the Spark dialect.
-- datagen source → computed row_time + watermark → per-minute aggregation
-- (pv / uv / sum / max / min) → print sink. Submit with:
--   python -m flink_commons_spark sql-submit --sql-file queries/demo_stream.sql
SET 'pipeline.name' = 'flink-sql-submit-test';
SET 'parallelism.default' = '2';
SET 'table.exec.mini-batch.enabled' = 'true';
SET 'table.exec.mini-batch.allow-latency' = '5s';
SET 'table.exec.mini-batch.size' = '5000';
SET 'execution.runtime-mode' = 'streaming';
SET 'execution.checkpointing.enabled' = 'true';
SET 'execution.checkpointing.interval' = '3s';
-- self-terminate for demo runs; remove for an unbounded pipeline
SET 'flinkcommons.stream.timeout' = '30s';

CREATE TABLE IF NOT EXISTS `default_catalog`.`default_database`.`tbl_order_source` (
    dim STRING,
    user_id BIGINT,
    price DOUBLE,
    row_time AS cast(current_timestamp as timestamp(3)),
    WATERMARK FOR row_time AS row_time - INTERVAL '5' SECOND
) WITH (
    'connector' = 'datagen',
    'rows-per-second' = '10',
    'fields.dim.length' = '1',
    'fields.user_id.min' = '1',
    'fields.user_id.max' = '100000',
    'fields.price.min' = '50',
    'fields.price.max' = '1000'
);

CREATE TABLE IF NOT EXISTS `default_catalog`.`default_database`.`tbl_order_stat` (
    dim STRING,
    pv BIGINT,
    uv BIGINT,
    sum_price DOUBLE,
    max_price DOUBLE,
    min_price DOUBLE,
    window_start BIGINT
) WITH (
    'connector' = 'print',
    'print-identifier' = 'ORDER_STAT'
);

INSERT INTO `default_catalog`.`default_database`.`tbl_order_stat`
SELECT
    dim,
    count(*) AS pv,
    count(distinct user_id) AS uv,
    sum(price) AS sum_price,
    max(price) AS max_price,
    min(price) AS min_price,
    cast(unix_timestamp(cast(row_time as string)) / 60 AS bigint) AS window_start
FROM `default_catalog`.`default_database`.`tbl_order_source`
GROUP BY dim, cast(unix_timestamp(cast(row_time as string)) / 60 AS bigint);
