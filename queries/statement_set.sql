-- Multi-sink job via EXECUTE STATEMENT SET (Flink syntax; our splitter
-- carries the block intact, the reference's cannot).
--   python -m flink_commons_spark sql-submit --sql-file queries/statement_set.sql \
--     --var data=/root/testdata/sf0.001 --var out=/tmp/fcs_multi
SET 'pipeline.name' = 'multi-sink-demo';
SET 'execution.runtime-mode' = 'batch';

CREATE TABLE events WITH (
    'connector' = 'filesystem', 'path' = '${data}/events.parquet', 'format' = 'parquet'
);
CREATE TABLE stats_by_type (event_type STRING, n BIGINT, total DOUBLE) WITH (
    'connector' = 'filesystem', 'path' = '${out}/by_type', 'format' = 'parquet',
    'sink.mode' = 'overwrite'
);
CREATE TABLE stats_by_user (user_id BIGINT, n BIGINT, total DOUBLE) WITH (
    'connector' = 'filesystem', 'path' = '${out}/by_user', 'format' = 'parquet',
    'sink.mode' = 'overwrite'
);

EXECUTE STATEMENT SET
BEGIN
INSERT INTO stats_by_type
  SELECT event_type, count(*), round(sum(value), 2) FROM events GROUP BY event_type;
INSERT INTO stats_by_user
  SELECT user_id, count(*), round(sum(value), 2) FROM events GROUP BY user_id;
END;
