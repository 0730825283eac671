-- Batch analytics over the driver parquet tables.
--   python -m flink_commons_spark sql-submit --sql-file queries/tpch_batch.sql \
--     --var data=/root/testdata/sf0.001
SET 'pipeline.name' = 'tpch-batch';
SET 'execution.runtime-mode' = 'batch';

CREATE TABLE lineitem WITH (
    'connector' = 'filesystem', 'path' = '${data}/lineitem.parquet', 'format' = 'parquet'
);
CREATE TABLE orders WITH (
    'connector' = 'filesystem', 'path' = '${data}/orders.parquet', 'format' = 'parquet'
);
CREATE TABLE customer WITH (
    'connector' = 'filesystem', 'path' = '${data}/customer.parquet', 'format' = 'parquet'
);

-- Q1-style pricing summary
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)      AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(avg(l_discount), 4)      AS avg_disc,
       count(*)                       AS count_order
FROM lineitem
WHERE l_shipdate <= timestamp'1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus;

-- top customers by revenue
SELECT c_name, round(sum(o_totalprice), 2) AS spend
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_name
ORDER BY spend DESC
LIMIT 5;
