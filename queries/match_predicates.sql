-- MATCH_RECOGNIZE with the widened DEFINE/MEASURES predicate surface
-- (NOT BETWEEN / LIKE / searched CASE WHEN) through the runner, batch
-- mode — the statement a Flink SQL user writes unmodified (these are
-- plain Calcite expressions Flink 1.16 accepts inside DEFINE, so the
-- same script must also run under --strict-compat). The single-
-- variable pattern with SKIP PAST LAST ROW makes every qualifying row
-- its own match, so the expected output is plain-SQL-computable and
-- the test replays it exactly on DuckDB. Run with:
--   python -m flink_commons_spark sql-submit \
--     --sql-file queries/match_predicates.sql \
--     --var data=/root/testdata/sf0.001 --var out=/tmp/mr_pred

SET 'execution.runtime-mode' = 'batch';

CREATE TABLE events WITH (
    'connector' = 'filesystem',
    'path' = '${data}/events.parquet',
    'format' = 'parquet'
);

CREATE TABLE pred_matches (
    user_id BIGINT,
    ev STRING,
    amt DOUBLE,
    band STRING
) WITH (
    'connector' = 'filesystem',
    'path' = '${out}/pred_matches',
    'format' = 'parquet'
);

INSERT INTO pred_matches
SELECT user_id, ev, amt, band
FROM events
  MATCH_RECOGNIZE (
    PARTITION BY user_id
    ORDER BY ts, event_id
    MEASURES
      a.event_type AS ev,
      a.value      AS amt,
      CASE WHEN a.value > 250 THEN 'hi'
           WHEN a.value > 100 THEN 'mid'
           ELSE 'lo' END AS band
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (a)
    DEFINE
      a AS a.event_type LIKE '%r%'
        AND a.value NOT BETWEEN 50 AND 200
        AND CASE WHEN a.event_type = 'error' THEN 1
                 WHEN a.value > 250 THEN 2
                 ELSE 0 END >= 1
  );

-- display leg: per-band counts of the same matches
SELECT band, COUNT(*) AS n FROM pred_matches GROUP BY band;
