-- LLM-pipeline text analysis via the built-in fcs_* SQL functions.
--   python -m flink_commons_spark sql-submit --sql-file queries/text_analysis.sql \
--     --var data=/root/testdata/sf0.001
SET 'pipeline.name' = 'text-analysis';
SET 'execution.runtime-mode' = 'batch';

CREATE TABLE documents WITH (
    'connector' = 'filesystem', 'path' = '${data}/documents.parquet', 'format' = 'parquet'
);

-- per-language corpus profile
SELECT lang,
       count(*)                                   AS n_docs,
       sum(fcs_token_count(text))                 AS total_tokens,
       round(avg(fcs_quality(text)), 4)           AS avg_quality,
       sum(CASE WHEN fcs_lang_id(text) = lang THEN 1 ELSE 0 END) AS lang_id_hits
FROM documents
GROUP BY lang
ORDER BY lang;

-- exact-duplicate candidates by normalized fingerprint
SELECT fcs_fingerprint(text) AS fp, count(*) AS n, min(doc_id) AS keep_id
FROM documents
GROUP BY fcs_fingerprint(text)
HAVING count(*) > 1
ORDER BY n DESC
LIMIT 10;
