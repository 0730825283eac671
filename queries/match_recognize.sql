-- Row-pattern recognition (Flink SQL MATCH_RECOGNIZE) through the
-- runner — the statement a Flink CEP user writes, unmodified.
-- Batch mode here; the same clause over a streaming connector table
-- routes to the watermark-gated streaming matcher (see
-- plans/match_recognize.py). Run with:
--   python -m flink_commons_spark sql-submit \
--     --sql-file queries/match_recognize.sql --var data=/root/testdata/sf0.001

SET 'execution.runtime-mode' = 'batch';

CREATE TABLE events WITH (
    'connector' = 'filesystem',
    'path' = '${data}/events.parquet',
    'format' = 'parquet'
);

-- 1) the conversion funnel: one row per view -> clicks -> purchase run
SELECT user_id,
       unix_micros(cast(start_ts as timestamp)) AS start_us,
       n_clicks
FROM events
  MATCH_RECOGNIZE (
    PARTITION BY user_id
    ORDER BY ts, event_id
    MEASURES
      FIRST(v.ts) AS start_ts,
      COUNT(c.*)  AS n_clicks
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (v c+ p)
    DEFINE
      v AS v.event_type = 'view',
      c AS c.event_type = 'click',
      p AS p.event_type = 'purchase'
  );

-- 2) Flink's canonical price V-shape: row-navigating DEFINE via PREV,
--    per-variable aggregates in MEASURES
SELECT user_id, n_down, n_up, bottom
FROM events
  MATCH_RECOGNIZE (
    PARTITION BY user_id
    ORDER BY ts, event_id
    MEASURES
      COUNT(down.*)   AS n_down,
      COUNT(up.*)     AS n_up,
      MIN(down.value) AS bottom
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (strt down+ up+)
    DEFINE
      down AS down.value < PREV(down.value),
      up   AS up.value   > PREV(up.value)
  );

-- 3) round-8 surface: MATCH-STATE-DEPENDENT DEFINE — a running
--    aggregate (the purchase must out-price the click-leg average)
--    and a cross-variable comparison, as Flink 1.16 accepts
SELECT user_id, n_clicks, p_value
FROM events
  MATCH_RECOGNIZE (
    PARTITION BY user_id
    ORDER BY ts, event_id
    MEASURES
      COUNT(c.*) AS n_clicks,
      p.value    AS p_value
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (v c+ p)
    DEFINE
      v AS v.event_type = 'view',
      c AS c.event_type = 'click' AND c.value > v.value / 10,
      p AS p.event_type = 'purchase' AND p.value > AVG(c.value)
  );

-- 4) round-10 extensions (SQL:2016 features Flink 1.16 lacks; both
--    rejected under --strict-compat for parity):
--    pattern ALTERNATION — the middle leg accepts clicks OR errors,
--    per-member COUNTs split the run
SELECT user_id, n_clicks, n_errors
FROM events
  MATCH_RECOGNIZE (
    PARTITION BY user_id
    ORDER BY ts, event_id
    MEASURES
      COUNT(c.*) AS n_clicks,
      COUNT(e.*) AS n_errors
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (v (c|e)+ p)
    DEFINE
      v AS v.event_type = 'view',
      c AS c.event_type = 'click',
      e AS e.event_type = 'error',
      p AS p.event_type = 'purchase'
  );

-- 5) ALL ROWS PER MATCH — one output row per matched input row, with
--    the per-row CLASSIFIER() and the per-key MATCH_NUMBER()
SELECT user_id, event_id, cls, match_no, n_clicks
FROM events
  MATCH_RECOGNIZE (
    PARTITION BY user_id
    ORDER BY ts, event_id
    MEASURES
      CLASSIFIER()        AS cls,
      MATCH_NUMBER()      AS match_no,
      FINAL COUNT(c.*)    AS n_clicks
    ALL ROWS PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (v c+ p)
    DEFINE
      v AS v.event_type = 'view',
      c AS c.event_type = 'click',
      p AS p.event_type = 'purchase'
  );

-- 6) RUNNING vs FINAL measure semantics under ALL ROWS PER MATCH
--    (SQL:2016: RUNNING — rows of the match up to the current row —
--    is the all-rows default; FINAL replicates the whole-match value)
SELECT user_id, event_id, cls, run_rows, run_value, fin_value
FROM events
  MATCH_RECOGNIZE (
    PARTITION BY user_id
    ORDER BY ts, event_id
    MEASURES
      CLASSIFIER()             AS cls,
      RUNNING COUNT(*)         AS run_rows,
      SUM(c.value)             AS run_value,
      FINAL SUM(c.value)       AS fin_value
    ALL ROWS PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (v c+ p)
    DEFINE
      v AS v.event_type = 'view',
      c AS c.event_type = 'click',
      p AS p.event_type = 'purchase'
  );

-- 7) round-11 extension: QUANTIFIED SEQUENCE GROUP — one level of
--    SQL:2016 pattern nesting: a view followed by one-or-more
--    (click purchase) PAIRS, greedy over the repetition count
--    (rejected under --strict-compat: Flink 1.16 has no grouping)
SELECT user_id, n_pairs, pair_value
FROM events
  MATCH_RECOGNIZE (
    PARTITION BY user_id
    ORDER BY ts, event_id
    MEASURES
      COUNT(p.*)   AS n_pairs,
      SUM(p.value) AS pair_value
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (v (c p)+)
    DEFINE
      v AS v.event_type = 'view',
      c AS c.event_type = 'click',
      p AS p.event_type = 'purchase'
  );

-- 8) round-11 extension: PERMUTE — click and error in EITHER order
--    between the view and the purchase (orderings tried in the
--    listed lexicographic preference, SQL:2016's expansion order;
--    rejected under --strict-compat: Flink 1.16 has no PERMUTE)
SELECT user_id, click_value, error_value
FROM events
  MATCH_RECOGNIZE (
    PARTITION BY user_id
    ORDER BY ts, event_id
    MEASURES
      LAST(c.value) AS click_value,
      LAST(e.value) AS error_value
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (v PERMUTE(c, e) p)
    DEFINE
      v AS v.event_type = 'view',
      c AS c.event_type = 'click',
      e AS e.event_type = 'error',
      p AS p.event_type = 'purchase'
  );

-- 9) round-11 extension: pattern EXCLUSION {- c+ -} — the click leg
--    matches (FINAL COUNT still sees it) but its rows are omitted
--    from the ALL ROWS output: only the funnel's endpoints emit
--    (rejected under --strict-compat: Flink 1.16 has no exclusion)
SELECT user_id, event_id, cls, n_clicks
FROM events
  MATCH_RECOGNIZE (
    PARTITION BY user_id
    ORDER BY ts, event_id
    MEASURES
      CLASSIFIER()     AS cls,
      FINAL COUNT(c.*) AS n_clicks
    ALL ROWS PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (v {- c+ -} p)
    DEFINE
      v AS v.event_type = 'view',
      c AS c.event_type = 'click',
      p AS p.event_type = 'purchase'
  );
