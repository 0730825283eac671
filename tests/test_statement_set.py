"""EXECUTE STATEMENT SET: splitter merge + multi-sink dispatch."""

from __future__ import annotations

import pytest

from flink_commons_spark.actions.sql_submit import SqlSubmitAction
from flink_commons_spark.plans.script import split_statements


def test_splitter_reassembles_statement_set():
    script = """
    SET 'a' = 'b';
    EXECUTE STATEMENT SET
    BEGIN
    INSERT INTO t1 SELECT 1;
    INSERT INTO t2 SELECT ';' AS tricky;
    END;
    SELECT 2;
    """
    stmts = split_statements(script)
    assert len(stmts) == 3
    assert stmts[1].upper().startswith("EXECUTE STATEMENT SET")
    assert "INSERT INTO t1" in stmts[1] and "INSERT INTO t2" in stmts[1]
    assert stmts[1].rstrip().upper().endswith("END")
    assert stmts[2] == "SELECT 2"


def test_statement_set_runs_both_inserts(spark, tmp_path):
    script = f"""
    SET 'execution.runtime-mode' = 'batch';
    CREATE TABLE events WITH (
        'connector' = 'filesystem', 'path' = '/root/testdata/sf0.001/events.parquet',
        'format' = 'parquet'
    );
    CREATE TABLE out_a (event_type STRING, n BIGINT) WITH (
        'connector' = 'filesystem', 'path' = '{tmp_path}/a', 'format' = 'parquet'
    );
    CREATE TABLE out_b (user_id BIGINT, n BIGINT) WITH (
        'connector' = 'filesystem', 'path' = '{tmp_path}/b', 'format' = 'parquet'
    );
    EXECUTE STATEMENT SET
    BEGIN
    INSERT INTO out_a SELECT event_type, count(*) FROM events GROUP BY event_type;
    INSERT INTO out_b SELECT user_id, count(*) FROM events GROUP BY user_id;
    END;
    """
    SqlSubmitAction(sql_text=script, spark=spark).run()
    a = spark.read.parquet(f"{tmp_path}/a")
    b = spark.read.parquet(f"{tmp_path}/b")
    assert a.count() == 5 and b.count() == 15
    assert sum(r.n for r in a.collect()) == 1000
    assert sum(r.n for r in b.collect()) == 1000


def test_statement_set_rejects_non_insert(spark):
    script = """
    SET 'execution.runtime-mode' = 'batch';
    EXECUTE STATEMENT SET
    BEGIN
    SELECT 1;
    END;
    """
    with pytest.raises(RuntimeError, match="Error to execute sql"):
        SqlSubmitAction(sql_text=script, spark=spark).run()
