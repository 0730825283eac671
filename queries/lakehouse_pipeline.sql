-- Lakehouse pipeline demo: partitioned bronze layout -> streamed
-- keyed aggregate -> upsert table -> changelog consumption.
-- Run:
--   python -m flink_commons_spark sql-submit \
--     --sql-file queries/lakehouse_pipeline.sql \
--     --var src=/root/testdata/sf0.001 --var lake=/tmp/fcs-lake

SET 'execution.runtime-mode' = 'batch';

CREATE TABLE events WITH (
    'connector' = 'filesystem',
    'path' = '${src}/events.parquet',
    'format' = 'parquet'
);

-- bronze: hive-partitioned by event_type (partition pruning at read)
CREATE TABLE bronze (user_id BIGINT, value DOUBLE, event_type STRING)
PARTITIONED BY (event_type)
WITH (
    'connector' = 'filesystem',
    'path' = '${lake}/bronze',
    'format' = 'parquet'
);

INSERT INTO bronze SELECT user_id, value, event_type FROM events;

-- silver: keyed current-state table fed by a streaming aggregate
SET 'execution.runtime-mode' = 'streaming';
SET 'flinkcommons.trigger' = 'availableNow';
SET 'flinkcommons.stream.timeout' = '60s';

CREATE TABLE bronze_stream (user_id BIGINT, value DOUBLE, event_type STRING)
WITH (
    'connector' = 'filesystem',
    'path' = '${lake}/bronze',
    'format' = 'parquet'
);

CREATE TABLE silver_state (event_type STRING, pv BIGINT) WITH (
    'connector' = 'upsert-filesystem',
    'path' = '${lake}/silver',
    'key' = 'event_type'
);

INSERT INTO silver_state
SELECT event_type, count(*) FROM bronze_stream GROUP BY event_type;

-- gold: read the compacted current state back in batch
SET 'execution.runtime-mode' = 'batch';

CREATE TABLE silver_read (event_type STRING, pv BIGINT) WITH (
    'connector' = 'upsert-filesystem',
    'path' = '${lake}/silver',
    'key' = 'event_type'
);

SELECT event_type, pv FROM silver_read ORDER BY event_type;
