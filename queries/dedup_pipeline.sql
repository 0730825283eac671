-- End-to-end corpus curation through the runner: exact dedup ->
-- quality gate -> deterministic split -> materialized kept corpus,
-- then the survivor profile. Everything is plain SQL over the
-- built-in fcs_* functions, so the same script a Flink user would
-- hand flink-commons runs here unchanged in spirit.
--   python -m flink_commons_spark sql-submit --sql-file queries/dedup_pipeline.sql \
--     --var data=/root/testdata/sf0.001 --var out=/tmp/dedup_out
SET 'pipeline.name' = 'dedup-pipeline';
SET 'execution.runtime-mode' = 'batch';

CREATE TABLE documents WITH (
    'connector' = 'filesystem', 'path' = '${data}/documents.parquet', 'format' = 'parquet'
);

CREATE TABLE kept_docs (
    doc_id BIGINT,
    lang STRING,
    source STRING,
    n_tokens BIGINT,
    quality DOUBLE,
    split STRING
) WITH (
    'connector' = 'filesystem', 'path' = '${out}/kept_docs', 'format' = 'parquet'
);

-- keep the lowest doc_id per normalized fingerprint, then quality-gate;
-- split assignment is a pure function of the key so backfills never move a row
INSERT INTO kept_docs
WITH keep AS (
    SELECT min(doc_id) AS doc_id
    FROM documents
    GROUP BY fcs_fingerprint(text)
)
SELECT d.doc_id,
       d.lang,
       d.source,
       fcs_token_count(d.text)          AS n_tokens,
       fcs_quality(d.text)              AS quality,
       fcs_split(cast(d.doc_id AS STRING)) AS split
FROM documents d
JOIN keep k ON k.doc_id = d.doc_id
WHERE fcs_quality(d.text) >= 0.5;

-- survivor profile per split
SELECT split,
       count(*)                  AS n_docs,
       sum(n_tokens)             AS total_tokens,
       round(avg(quality), 4)    AS avg_quality
FROM kept_docs
GROUP BY split
ORDER BY split;
