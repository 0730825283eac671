-- Streaming ETL: file-stream the events table into a parquet sink.
--   python -m flink_commons_spark sql-submit --sql-file queries/events_to_parquet.sql \
--     --var src=/root/testdata/sf0.001 --var out=/tmp/fcs_out
SET 'pipeline.name' = 'events-etl';
SET 'execution.runtime-mode' = 'batch';

CREATE TABLE events WITH (
    'connector' = 'filesystem', 'path' = '${src}/events.parquet', 'format' = 'parquet'
);
CREATE TABLE event_stats (
    event_type STRING,
    n BIGINT,
    total DOUBLE
) WITH (
    'connector' = 'filesystem', 'path' = '${out}/event_stats', 'format' = 'parquet',
    'sink.mode' = 'overwrite'
);

INSERT INTO event_stats
SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
FROM events
GROUP BY event_type;
