"""Action framework tests: discovery, CLI parsing, multi-value options."""

import pytest

from flink_commons_spark.actions.base import (
    FactoryError,
    MultiParams,
    create_action,
    discover_action_factory,
    parse_key_value_string,
)
from flink_commons_spark.actions.sql_submit import SqlSubmitAction


def test_discover_registered():
    factory = discover_action_factory("sql-submit")
    assert factory.identifier == "sql-submit"


def test_discover_unknown_raises():
    # FactoryUtil.java:23-26 → FactoryException
    with pytest.raises(FactoryError, match="Could not find any factories"):
        discover_action_factory("no-such-action")


def test_create_action_builds_sql_submit(tmp_path):
    p = tmp_path / "x.sql"
    p.write_text("SELECT 1;")
    action = create_action(
        ["sql-submit", "--sql-file", str(p), "--var", "a=1", "--var", "b=2"]
    )
    assert isinstance(action, SqlSubmitAction)
    assert action.sql_file == str(p)
    assert action.variables == {"a": "1", "b": "2"}


def test_create_action_case_insensitive_name(tmp_path):
    p = tmp_path / "x.sql"
    p.write_text("SELECT 1;")
    action = create_action(["SQL-SUBMIT", "--sql-file", str(p)])
    assert isinstance(action, SqlSubmitAction)


def test_help_returns_none(capsys):
    assert create_action(["--help"]) is None
    assert "sql-submit" in capsys.readouterr().out
    assert create_action(["sql-submit", "--help"]) is None
    assert "--sql-file" in capsys.readouterr().out


def test_missing_required_arg():
    with pytest.raises(ValueError, match="--sql-file"):
        create_action(["sql-submit"])


class TestMultiParams:
    def test_multi_values(self):
        p = MultiParams(["--var", "a=1", "--var", "b=2", "--flag"])
        assert p.optional_config_map("var") == {"a": "1", "b": "2"}
        assert p.has("flag")
        assert p.get("flag") is None

    def test_comma_separated(self):
        p = MultiParams(["--conf", "a=1,b=2"])
        assert p.comma_separated_key_values("conf") == {"a": "1", "b": "2"}

    def test_malformed_kv_raises(self):
        # ActionFactory.java:100-107
        target = {}
        with pytest.raises(ValueError, match="Invalid key-value string"):
            parse_key_value_string(target, "novalue")

    def test_kv_splits_on_first_equals(self):
        target = {}
        parse_key_value_string(target, "key=a=b")
        assert target == {"key": "a=b"}

    def test_kv_trims(self):
        target = {}
        parse_key_value_string(target, "  key = value ")
        assert target == {"key": "value"}


def test_set_statement_parsing():
    from flink_commons_spark.conf import parse_set_statement

    assert parse_set_statement("SET pipeline.name = test-sql") == ("pipeline.name", "test-sql")
    assert parse_set_statement("set a.b=c") == ("a.b", "c")
    with pytest.raises(ValueError, match="not a valid SET"):
        parse_set_statement("SET novalue")


def test_duration_parsing():
    from flink_commons_spark.conf import parse_duration_seconds

    assert parse_duration_seconds("5s") == 5
    assert parse_duration_seconds("3 s") == 3
    assert parse_duration_seconds("500ms") == 0.5
    assert parse_duration_seconds("2min") == 120
    assert parse_duration_seconds("10") == 10


def test_load_unload_module(spark):
    """LOAD/UNLOAD MODULE maintain the module registry; unloading an
    absent module errors (per-statement wrapping applies)."""
    from flink_commons_spark.actions.sql_submit import SqlSubmitAction

    script = """
    LOAD MODULE hive;
    UNLOAD MODULE hive;
    LOAD MODULE somethingelse;
    """
    action = SqlSubmitAction(sql_text=script, spark=spark)
    action.run()
    assert "hive" not in action.modules
    assert "somethingelse" in action.modules
    assert action.modules["core"] and action.modules["flinkcommons"]

    bad = SqlSubmitAction(sql_text="UNLOAD MODULE neverloaded;", spark=spark)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="Error to execute sql"):
        bad.run()


def test_compact_action_cli(spark, tmp_path):
    """Second registered action: discovery by name, required-arg errors,
    and the actual compaction through the CLI machinery."""
    from flink_commons_spark.actions.base import create_action, discover_action_factory
    from flink_commons_spark.actions.compact import CompactAction
    from flink_commons_spark.streaming.upsert import KeyedParquetUpsertSink

    assert discover_action_factory("compact").identifier == "compact"

    sink = KeyedParquetUpsertSink(str(tmp_path / "t"), ["k"])
    w = sink.writer()
    for b in range(3):
        w(spark.createDataFrame([(1, b), (2, b)], "k long, v long"), b)

    action = create_action(["compact", "--path", str(tmp_path / "t"), "--key", "k"])
    assert isinstance(action, CompactAction)
    action.spark = spark  # inject the test session
    action.run()
    assert spark.read.parquet(str(tmp_path / "t")).count() == 2
    assert {(r.k, r.v) for r in sink.read_final(spark).collect()} == {(1, 2), (2, 2)}


def test_show_modules(spark, capsys):
    from flink_commons_spark.actions.sql_submit import SqlSubmitAction

    SqlSubmitAction(
        sql_text="LOAD MODULE hive;\nSHOW MODULES;", spark=spark
    ).run()
    out = capsys.readouterr().out.splitlines()
    assert "core" in out and "flinkcommons" in out and "hive" in out


def test_use_catalog_and_alter_table_set(spark, capsys):
    """Flink-only statements handled by the runner: USE CATALOG maps to
    the Spark session catalog; ALTER TABLE SET updates a registered
    connector table's options and rebuilds its view."""
    from flink_commons_spark.actions.sql_submit import SqlSubmitAction

    script = """
    SET 'execution.runtime-mode' = 'batch';
    USE CATALOG default_catalog;
    CREATE TABLE e (event_id BIGINT, event_type STRING) WITH (
        'connector' = 'filesystem', 'path' = '/root/testdata/sf0.001/events.parquet',
        'format' = 'parquet'
    );
    ALTER TABLE e SET ('path' = '/root/testdata/sf0.01/events.parquet');
    SELECT count(*) AS n FROM e;
    """
    action = SqlSubmitAction(sql_text=script, spark=spark)
    action.run()
    out = capsys.readouterr().out
    assert action.tables["e"].options["path"].endswith("sf0.01/events.parquet")
    assert "10000" in out  # sf0.01 row count, not sf0.001's 1000


def test_fcs_split_functions_match_operator(spark):
    """The fcs_split SQL UDFs agree with the DataFrame operator — one
    split definition, two call surfaces."""
    from flink_commons_spark.functions.registry import register_all
    from flink_commons_spark.operators.sampling import with_split

    register_all(spark)
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    via_op = {r.doc_id: r.split for r in
              with_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    df.createOrReplaceTempView("fcs_split_t")
    via_sql = {r.doc_id: r.s for r in
               spark.sql("SELECT doc_id, fcs_split(cast(doc_id as string)) AS s FROM fcs_split_t").collect()}
    assert via_op == via_sql


def test_unset_executes_by_default_and_skips_under_strict():
    from flink_commons_spark.conf import (
        RunnerConfig,
        apply_set,
        apply_unset,
        parse_unset_statement,
    )

    cfg = RunnerConfig()
    apply_set(cfg, None, "pipeline.name", "job1")
    apply_set(cfg, None, "execution.runtime-mode", "batch")
    assert cfg.pipeline_name == "job1" and cfg.runtime_mode == "batch"

    assert parse_unset_statement("UNSET 'pipeline.name'") == "pipeline.name"
    apply_unset(cfg, None, "pipeline.name")
    apply_unset(cfg, None, "execution.runtime-mode")
    assert cfg.pipeline_name is None
    assert cfg.runtime_mode == "streaming"  # back to the Flink default
    assert "pipeline.name" not in cfg.raw

    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_unset_statement("UNSET   ")


def test_explain_executes_by_default(spark, capsys):
    from flink_commons_spark.actions.sql_submit import SqlSubmitAction

    script = """
    SET 'execution.runtime-mode' = 'batch';
    CREATE TABLE li WITH (
        'connector' = 'filesystem',
        'path' = '/root/testdata/sf0.001/lineitem.parquet',
        'format' = 'parquet'
    );
    EXPLAIN SELECT l_returnflag, count(*) FROM li GROUP BY l_returnflag;
    """
    SqlSubmitAction(sql_text=script, spark=spark).run()
    out = capsys.readouterr().out
    assert "Physical Plan" in out or "Aggregate" in out

    # strict mode keeps the reference's skip: no plan printed
    SqlSubmitAction(sql_text=script, spark=spark, strict_compat=True).run()
    out2 = capsys.readouterr().out
    assert "Physical Plan" not in out2


def test_broadcast_threshold_and_timezone_set_mappings(spark):
    from flink_commons_spark.conf import RunnerConfig, apply_set

    cfg = RunnerConfig()
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        apply_set(cfg, spark, "table.optimizer.join.broadcast-threshold", "-1")
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
        apply_set(cfg, spark, "table.local-time-zone", "America/New_York")
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_create_catalog_maps_to_database(spark, capsys):
    """Flink CREATE CATALOG becomes a session-catalog database:
    3-part references through the catalog resolve, USE CATALOG enters
    it, SHOW CATALOGS lists it, DROP CATALOG removes it."""
    from flink_commons_spark.actions.sql_submit import SqlSubmitAction

    script = """
    CREATE CATALOG mycat WITH ('type' = 'generic_in_memory');
    CREATE TABLE mycat.default_database.t1 AS SELECT 7 AS x;
    USE CATALOG mycat;
    SHOW CATALOGS;
    SELECT x FROM t1;
    USE CATALOG default_catalog;
    SELECT x FROM mycat.default.t1;
    DROP CATALOG mycat;
    """
    action = SqlSubmitAction(sql_text=script, spark=spark)
    action.run()
    out = capsys.readouterr().out
    assert "mycat" in out and "default_catalog" in out  # SHOW CATALOGS
    assert out.count("|7  |") + out.count("|7|") >= 1   # both SELECTs printed
    assert "mycat" not in action.catalogs
    assert not spark.catalog.databaseExists("mycat")
    # dropping the catalog we were inside must not strand the session
    # in a nonexistent current database
    assert spark.catalog.currentDatabase() == "default"
    spark.range(1).write.mode("overwrite").saveAsTable("fcs_post_drop_probe")
    spark.sql("DROP TABLE fcs_post_drop_probe")


def test_streaming_select_without_trigger_conf(spark, tmp_path):
    """The reference's most basic streaming flow - no trigger-related
    SET at all - must run: .trigger() with zero kwargs is a PySpark
    error (ONLY_ALLOW_SINGLE_TRIGGER, the pre-fix failure), and a
    global count(*) needs update mode despite having no GROUP BY text
    (the analyzed-plan inference). Console output prints from the JVM
    (not Python-capturable), so completing without error IS the
    assertion - both bugs raised before any batch ran."""
    from flink_commons_spark.actions.sql_submit import SqlSubmitAction

    src = str(tmp_path / "ev")
    spark.range(5).selectExpr("id", "id * 2 AS v").write.parquet(src)
    script = f"""
    SET 'flinkcommons.stream.timeout' = '10s';
    CREATE TABLE ev WITH ('connector'='filesystem','path'='{src}','format'='parquet');
    SELECT count(*) AS n FROM ev;
    """
    action = SqlSubmitAction(sql_text=script, spark=spark)
    action.run()
    assert action._started_queries and not action._started_queries[0].isActive
