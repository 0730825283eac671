"""Flink→Spark dialect adaptation, unit + end-to-end through the runner."""

from __future__ import annotations

from flink_commons_spark.actions.sql_submit import SqlSubmitAction
from flink_commons_spark.plans.dialect import adapt_sql


def test_tumble_rewrite():
    sql = (
        "SELECT TUMBLE_START(ts, INTERVAL '1' MINUTE) AS ws, count(*) AS n "
        "FROM t GROUP BY TUMBLE(ts, INTERVAL '1' MINUTE)"
    )
    out = adapt_sql(sql)
    assert "window(ts, '1 minutes')" in out
    assert "window.start AS ws" in out
    assert "TUMBLE" not in out


def test_hop_rewrite_swaps_slide_and_size():
    out = adapt_sql("GROUP BY HOP(ts, INTERVAL '30' SECOND, INTERVAL '2' MINUTE)")
    assert "window(ts, '2 minutes', '30 seconds')" in out


def test_session_rewrite():
    out = adapt_sql(
        "SELECT SESSION_END(ts, INTERVAL '10' MINUTE) FROM t "
        "GROUP BY SESSION(ts, INTERVAL '10' MINUTE)"
    )
    assert "session_window(ts, '10 minutes')" in out
    assert "session_window.end" in out


def test_unknown_shapes_left_alone():
    # compound intervals are not rewritten — fail loudly downstream
    sql = "GROUP BY TUMBLE(ts, INTERVAL '1' DAY TO HOUR)"
    assert adapt_sql(sql) == sql


def test_tumble_end_to_end_batch(spark, capsys):
    """A Flink-dialect TUMBLE script over real events parquet through
    the actual runner, batch mode."""
    script = """
    SET 'execution.runtime-mode' = 'batch';
    CREATE TABLE events WITH (
        'connector' = 'filesystem',
        'path' = '${data}/events.parquet',
        'format' = 'parquet'
    );
    SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS window_start,
           count(*) AS n
    FROM events
    GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)
    ORDER BY n DESC
    LIMIT 3;
    """
    SqlSubmitAction(
        sql_text=script, variables={"data": "/root/testdata/sf0.001"}, spark=spark
    ).run()
    out = capsys.readouterr().out
    assert "window_start" in out and "2024-01-" in out


def test_tumble_tvf_rewrite():
    out = adapt_sql(
        "SELECT window_start, count(*) AS n FROM "
        "TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '10' MINUTES)) "
        "GROUP BY window_start, window_end"
    )
    assert "TABLE(" not in out and "DESCRIPTOR" not in out
    assert "window(ts, '10 minutes')" in out
    assert "__fcs_w.start AS window_start" in out
    assert "window_time" in out


def test_hop_tvf_rewrite_swaps_slide_and_size():
    out = adapt_sql(
        "FROM TABLE(HOP(TABLE t, DESCRIPTOR(ts), "
        "INTERVAL '30' SECOND, INTERVAL '2' MINUTE))"
    )
    assert "window(ts, '2 minutes', '30 seconds')" in out


def test_tvf_named_arguments():
    out = adapt_sql(
        "FROM TABLE(TUMBLE(DATA => TABLE bid, TIMECOL => DESCRIPTOR(bidtime), "
        "SIZE => INTERVAL '1' HOUR))"
    )
    assert "window(bidtime, '1 hours')" in out


def test_cumulate_tvf_expands_growing_windows(spark):
    out = adapt_sql(
        "SELECT window_start, window_end, count(*) AS n FROM "
        "TABLE(CUMULATE(TABLE t, DESCRIPTOR(ts), "
        "INTERVAL '1' MINUTE, INTERVAL '4' MINUTE)) "
        "GROUP BY window_start, window_end ORDER BY window_end"
    )
    assert "explode(sequence" in out and "TABLE(" not in out
    # end-to-end: a row at 00:03:30 belongs to the 4-minute-aligned base
    # window [00:00, 00:04) and only its still-open end (00:04);
    # a row at 00:00:10 belongs to ends 00:01..00:04 — four windows
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW t AS "
        "SELECT timestamp'2024-01-01 00:03:30' AS ts "
        "UNION ALL SELECT timestamp'2024-01-01 00:00:10'"
    )
    rows = [(r["window_end"].minute, r["n"]) for r in spark.sql(out).collect()]
    assert rows == [(1, 1), (2, 1), (3, 1), (4, 2)]


def test_session_tvf_left_alone():
    sql = ("FROM TABLE(SESSION(TABLE t PARTITION BY k, DESCRIPTOR(ts), "
           "INTERVAL '5' MINUTE))")
    assert adapt_sql(sql) == sql


def test_tvf_end_to_end_batch(spark):
    """TUMBLE TVF over real events parquet equals the legacy group
    window — batch, through spark.sql after adaptation."""
    from flink_commons_spark.catalog import _t

    _t(spark, "/root/testdata/sf0.001", "events").createOrReplaceTempView("ev_tvf")
    tvf = spark.sql(
        adapt_sql(
            "SELECT window_start, count(*) AS n FROM "
            "TABLE(TUMBLE(TABLE ev_tvf, DESCRIPTOR(ts), INTERVAL '1' HOUR)) "
            "GROUP BY window_start, window_end"
        )
    )
    legacy = spark.sql(
        adapt_sql(
            "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS window_start, "
            "count(*) AS n FROM ev_tvf GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
        )
    )
    assert sorted(map(tuple, tvf.collect())) == sorted(map(tuple, legacy.collect()))


def test_temporal_join_clause_stripped():
    from flink_commons_spark.plans.dialect import adapt_sql

    sql = ("SELECT o.id, c.name FROM orders o JOIN customers "
           "FOR SYSTEM_TIME AS OF o.proc_time AS c ON o.cid = c.id")
    out = adapt_sql(sql)
    assert "SYSTEM_TIME" not in out
    assert "JOIN customers  AS c ON o.cid = c.id" in out or "JOIN customers AS c" in out.replace("  ", " ")

    # proctime() form (converted to current_timestamp() first) also strips
    sql2 = "SELECT * FROM a JOIN dim FOR SYSTEM_TIME AS OF proctime() d ON a.k = d.k"
    out2 = adapt_sql(sql2)
    assert "SYSTEM_TIME" not in out2


def test_options_hint_stripped():
    from flink_commons_spark.plans.dialect import adapt_sql

    sql = ("SELECT * FROM t /*+ OPTIONS('scan.startup.mode'='latest-offset', "
           "'k'='v') */ WHERE x > 1")
    out = adapt_sql(sql)
    assert "OPTIONS" not in out and "WHERE x > 1" in out
    # non-OPTIONS hints (Spark-native broadcast etc.) pass through
    assert "/*+ BROADCAST(t) */" in adapt_sql("SELECT /*+ BROADCAST(t) */ * FROM t")


def test_scalar_fn_rewrites_string_level():
    from flink_commons_spark.plans.dialect import adapt_sql

    assert (
        adapt_sql("SELECT SPLIT_INDEX(s, ',', 0) FROM t")
        == "SELECT try_element_at(split(s, ','), (0) + 1) FROM t"
    )
    assert (
        adapt_sql("SELECT JSON_VALUE(j, '$.k') FROM t")
        == "SELECT get_json_object(j, '$.k') FROM t"
    )
    assert adapt_sql("SELECT TO_TIMESTAMP_LTZ(e, 3) FROM t") == (
        "SELECT timestamp_millis(e) FROM t"
    )
    assert adapt_sql("SELECT TO_TIMESTAMP_LTZ(e, 0) FROM t") == (
        "SELECT timestamp_seconds(e) FROM t"
    )
    # unknown precision left untouched
    assert "TO_TIMESTAMP_LTZ(e, 9)" in adapt_sql("SELECT TO_TIMESTAMP_LTZ(e, 9) FROM t")
    assert adapt_sql("SELECT RAND_INTEGER(10)") == (
        "SELECT cast(floor(rand() * (10)) as int)"
    )
    assert adapt_sql("SELECT RAND_INTEGER(42, 10)") == (
        "SELECT cast(floor(rand(42) * (10)) as int)"
    )
    # nested calls rewrite inside-out; commas inside quotes don't split args
    assert adapt_sql("SELECT SPLIT_INDEX(JSON_VALUE(j, '$.csv'), ',', 1)") == (
        "SELECT try_element_at(split(get_json_object(j, '$.csv'), ','), (1) + 1)"
    )
    # regex metacharacters in a LITERAL delimiter are escaped (Flink's
    # delimiter is literal; Spark's split() is regex)
    assert adapt_sql("SELECT SPLIT_INDEX(s, '.', 0) FROM t") == (
        "SELECT try_element_at(split(s, '\\\\.'), (0) + 1) FROM t"
    )
    # non-literal delimiter expressions pass through untouched
    assert adapt_sql("SELECT SPLIT_INDEX(s, d, 0) FROM t") == (
        "SELECT try_element_at(split(s, d), (0) + 1) FROM t"
    )


def test_scalar_fn_rewrites_execute(spark):
    from flink_commons_spark.plans.dialect import adapt_sql

    row = spark.sql(
        adapt_sql(
            "SELECT SPLIT_INDEX('a,b,c', ',', 1) AS second, "
            "SPLIT_INDEX('a,b,c', ',', 9) AS missing, "
            "SPLIT_INDEX('a.b.c', '.', 1) AS dotsecond, "
            "SPLIT_INDEX('a|b|c', '|', 2) AS pipethird, "
            "JSON_VALUE('{\"k\": {\"v\": 7}}', '$.k.v') AS jv, "
            "TO_TIMESTAMP_LTZ(1700000000, 0) AS ts0, "
            "TO_TIMESTAMP_LTZ(1700000000123, 3) AS ts3, "
            "RAND_INTEGER(10) AS r"
        )
    ).collect()[0]
    assert row.second == "b" and row.missing is None
    assert row.dotsecond == "b" and row.pipethird == "c"
    assert row.jv == "7"
    assert str(row.ts0).startswith("2023-11-14")
    assert str(row.ts3).endswith("0.123000")
    assert 0 <= row.r < 10


def test_new_scalar_fn_rewrites_string_level():
    from flink_commons_spark.plans.dialect import adapt_sql

    # STR_TO_MAP: Flink defaults are (',', '='); delimiters are literal
    assert adapt_sql("SELECT STR_TO_MAP(s) FROM t") == (
        "SELECT str_to_map(s, ',', '=') FROM t"
    )
    assert adapt_sql("SELECT STR_TO_MAP(s, '|', ':') FROM t") == (
        "SELECT str_to_map(s, '\\\\|', ':') FROM t"
    )
    # FLOOR/CEIL time-unit rounding; plain numeric forms untouched
    assert adapt_sql("SELECT FLOOR(ts TO HOUR) FROM t") == (
        "SELECT date_trunc('HOUR', ts) FROM t"
    )
    out = adapt_sql("SELECT CEIL(ts TO DAY) FROM t")
    assert "date_trunc('DAY', ts)" in out and "INTERVAL '1' DAY" in out
    out = adapt_sql("SELECT CEIL(ts TO WEEK) FROM t")
    assert "INTERVAL '7' DAY" in out
    out = adapt_sql("SELECT CEIL(ts TO QUARTER) FROM t")
    assert "add_months(date_trunc('QUARTER', ts), 3)" in out
    assert adapt_sql("SELECT FLOOR(x) FROM t") == "SELECT FLOOR(x) FROM t"
    # Flink built-ins nested inside an unrewritten FLOOR still translate
    assert adapt_sql("SELECT FLOOR(TRUNCATE(x, 0))") == (
        "SELECT FLOOR((sign(x) * floor(abs(x) * pow(10, (0))) / pow(10, (0))))"
    )
    assert "rlike '^[0-9]+$'" in adapt_sql("SELECT IS_DIGIT(s)")
    assert "rlike '^[a-zA-Z]+$'" in adapt_sql("SELECT IS_ALPHA(s)")
    assert "try_cast(s as decimal(38,18)) is not null" in adapt_sql(
        "SELECT IS_DECIMAL(s)"
    )
    assert adapt_sql("SELECT JSON_QUERY(j, '$.a') FROM t") == (
        "SELECT get_json_object(j, '$.a') FROM t"
    )
    assert adapt_sql("SELECT JSON_EXISTS(j, '$.a') FROM t") == (
        "SELECT (get_json_object(j, '$.a') is not null) FROM t"
    )
    assert "convert_timezone('UTC', 'Asia/Shanghai', to_timestamp(s))" in adapt_sql(
        "SELECT CONVERT_TZ(s, 'UTC', 'Asia/Shanghai')"
    )


def test_new_scalar_fn_rewrites_execute(spark):
    from flink_commons_spark.plans.dialect import adapt_sql

    row = spark.sql(
        adapt_sql(
            "SELECT STR_TO_MAP('a=1,b=2')['b'] AS m_default, "
            "STR_TO_MAP('a.1|b.2', '|', '.')['a'] AS m_custom, "
            "FLOOR(timestamp '2024-05-14 13:47:21' TO HOUR) AS fl_hour, "
            "CEIL(timestamp '2024-05-14 13:47:21' TO DAY) AS ce_day, "
            "CEIL(timestamp '2024-05-14 00:00:00' TO DAY) AS ce_aligned, "
            "TRUNCATE(-12.345, 2) AS tr_neg, "
            "TRUNCATE(12.399, 1) AS tr_pos, "
            "IS_DIGIT('0451') AS dig, IS_DIGIT('a1') AS notdig, "
            "IS_ALPHA('abc') AS alpha, IS_DECIMAL('1.5e2') AS dec1, "
            "IS_DECIMAL('x') AS dec0, "
            "JSON_EXISTS('{\"a\": 1}', '$.a') AS je1, "
            "JSON_EXISTS('{\"a\": 1}', '$.b') AS je0, "
            "JSON_QUERY('{\"a\": {\"b\": 2}}', '$.a') AS jq, "
            "CONVERT_TZ('2024-01-01 00:00:00', 'UTC', 'Asia/Shanghai') AS tz"
        )
    ).collect()[0]
    assert row.m_default == "2" and row.m_custom == "1"
    assert str(row.fl_hour) == "2024-05-14 13:00:00"
    assert str(row.ce_day) == "2024-05-15 00:00:00"
    assert str(row.ce_aligned) == "2024-05-14 00:00:00"
    assert abs(row.tr_neg - (-12.34)) < 1e-9
    assert abs(row.tr_pos - 12.3) < 1e-9
    assert row.dig is True and row.notdig is False and row.alpha is True
    assert row.dec1 is True and row.dec0 is False
    assert row.je1 is True and row.je0 is False
    assert row.jq == '{"b":2}'
    assert row.tz == "2024-01-01 08:00:00"


def test_week_and_sha_rewrites(spark):
    from flink_commons_spark.plans.dialect import adapt_sql

    assert adapt_sql("SELECT WEEK(d) FROM t") == "SELECT weekofyear(d) FROM t"
    assert adapt_sql("SELECT SHA256(s)") == "SELECT sha2(s, 256)"
    assert adapt_sql("SELECT SHA512(s)") == "SELECT sha2(s, 512)"
    row = spark.sql(adapt_sql(
        "SELECT WEEK(date '2024-01-15') AS w, SHA256('abc') AS h"
    )).collect()[0]
    assert row.w == 3
    assert row.h == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
