-- Flink catalog DDL + the Flink-only scalar builtins the dialect
-- bridge translates (FLOOR(ts TO unit), STR_TO_MAP, IS_DIGIT,
-- JSON_EXISTS, TRUNCATE, CONVERT_TZ, SPLIT_INDEX ...).
--   python -m flink_commons_spark sql-submit \
--     --sql-file queries/catalog_dialect_tour.sql --var data=/root/testdata/sf0.001
SET 'pipeline.name' = 'catalog-dialect-tour';
SET 'execution.runtime-mode' = 'batch';

-- a Flink catalog maps onto a session-catalog database
CREATE CATALOG lake WITH ('type' = 'generic_in_memory');
USE CATALOG lake;
SHOW CATALOGS;

CREATE TABLE events WITH (
    'connector' = 'filesystem', 'path' = '${data}/events.parquet', 'format' = 'parquet'
);

-- Flink time-unit rounding, JSON path predicates, literal-delimiter
-- string-to-map, truncation toward zero
SELECT event_type,
       count(*)                                              AS n,
       count(DISTINCT FLOOR(ts TO HOUR))                     AS active_hours,
       sum(CASE WHEN JSON_EXISTS(props, '$.k') THEN 1 ELSE 0 END) AS with_k,
       sum(CASE WHEN IS_DIGIT(JSON_VALUE(props, '$.k')) THEN 1 ELSE 0 END) AS numeric_k,
       round(sum(TRUNCATE(value, 1)), 2)                     AS trunc_sum,
       min(STR_TO_MAP('type=' || event_type)['type'])        AS mapped,
       min(SPLIT_INDEX(CONVERT_TZ(cast(FLOOR(ts TO DAY) as string),
                                  'UTC', 'Asia/Shanghai'), ' ', 0)) AS first_day_cst
FROM events
GROUP BY event_type
ORDER BY event_type;

USE CATALOG default_catalog;
DROP CATALOG lake;
