"""Front-end tests: comment stripping, splitting, variables, file reading.

Covers the reference's quirks explicitly (``SURVEY.md §7.4`` item 4):
``--`` inside string literals (``SQLSubmitAction.java:107-115``) and
the first-``;`` cut in multi-statement buffers
(``SQLSubmitAction.java:121-124``) — replicated under
``strict_compat=True``, fixed in default mode.
"""

import pytest

from flink_commons_spark.plans.script import (
    ScriptError,
    load_statements,
    read_script,
    split_statements,
    strip_comments,
    substitute_variables,
)
from flink_commons_spark.plans.statements import StatementType


class TestStripComments:
    def test_plain_comment(self):
        assert strip_comments("SELECT 1 -- trailing") == "SELECT 1 "

    def test_whole_line(self):
        assert strip_comments("-- this is a comment") == ""

    def test_dashes_in_string_preserved_default(self):
        line = "SELECT '--not-a-comment' AS x -- real"
        assert strip_comments(line) == "SELECT '--not-a-comment' AS x "

    def test_dashes_in_string_stripped_strict(self):
        # replicates SQLSubmitAction.java:107-115 exactly
        line = "SELECT '--not-a-comment' AS x"
        assert strip_comments(line, strict_compat=True) == "SELECT '"

    def test_dashes_in_backticks_preserved_default(self):
        assert strip_comments("SELECT `a--b` FROM t") == "SELECT `a--b` FROM t"


class TestSplitStatements:
    def test_basic(self):
        stmts = split_statements("SELECT 1;\nSELECT 2;")
        assert stmts == ["SELECT 1", "SELECT 2"]

    def test_multiline_statement(self):
        text = "SELECT a,\n  b\nFROM t;\n"
        assert split_statements(text) == ["SELECT a,\n  b\nFROM t"]

    def test_semicolon_in_literal_default(self):
        stmts = split_statements("SELECT 'a;b' AS x;")
        assert stmts == ["SELECT 'a;b' AS x"]

    def test_two_statements_one_line_default(self):
        assert split_statements("SELECT 1; SELECT 2;") == ["SELECT 1", "SELECT 2"]

    def test_strict_first_semicolon_cut(self):
        # the reference cuts at the FIRST ';' and drops the rest of the
        # buffered line (SQLSubmitAction.java:124)
        assert split_statements("SELECT 1; SELECT 2;", strict_compat=True) == ["SELECT 1"]

    def test_strict_accumulates_until_terminator(self):
        text = "SELECT a,\nb\nFROM t;\nSELECT 2;"
        assert split_statements(text, strict_compat=True) == [
            "SELECT a, b FROM t",
            "SELECT 2",
        ]

    def test_unterminated_tail_kept_default(self):
        assert split_statements("SELECT 1") == ["SELECT 1"]

    def test_unterminated_tail_dropped_strict(self):
        # reference drops a trailing unterminated statement (buffer never
        # flushes without the ';' line ending)
        assert split_statements("SELECT 1", strict_compat=True) == []

    def test_comments_stripped_before_split(self):
        text = "-- header\nSELECT 1; -- done\n"
        assert split_statements(text) == ["SELECT 1"]


class TestSubstituteVariables:
    def test_substitutes(self):
        assert (
            substitute_variables("SELECT * FROM '${dir}/t.parquet'", {"dir": "/data"})
            == "SELECT * FROM '/data/t.parquet'"
        )

    def test_multiple_and_repeated(self):
        out = substitute_variables("${a} ${b} ${a}", {"a": "1", "b": "2"})
        assert out == "1 2 1"

    def test_missing_raises(self):
        # SQLSubmitAction.java:151-155 — hard error on unbound variable
        with pytest.raises(ScriptError, match="no non-empty value"):
            substitute_variables("SELECT ${missing}", {})

    def test_empty_value_raises(self):
        with pytest.raises(ScriptError):
            substitute_variables("SELECT ${x}", {"x": ""})


class TestReadScript:
    def test_local_file(self, tmp_path):
        p = tmp_path / "a.sql"
        p.write_text("SELECT 1;")
        assert read_script(str(p)) == "SELECT 1;"

    def test_file_scheme(self, tmp_path):
        p = tmp_path / "a.sql"
        p.write_text("SELECT 2;")
        assert read_script(f"file://{p}") == "SELECT 2;"

    def test_missing_file(self):
        # SQLSubmitAction.java:179-183
        with pytest.raises(ScriptError, match="does not exist"):
            read_script("/nonexistent/path.sql")

    def test_bad_scheme(self):
        # SQLSubmitAction.java:172-176
        with pytest.raises(ScriptError, match="Unsupported file system scheme"):
            read_script("s3://bucket/a.sql")


class TestLoadStatements:
    def test_full_pipeline(self, tmp_path):
        p = tmp_path / "s.sql"
        p.write_text(
            "-- demo\nSET execution.runtime-mode = batch;\n"
            "SELECT * FROM '${dir}/t.parquet';\n"
        )
        stmts = load_statements(str(p), {"dir": "/data"})
        assert stmts == [
            (StatementType.SET, "SET execution.runtime-mode = batch"),
            (StatementType.SELECT, "SELECT * FROM '/data/t.parquet'"),
        ]

    def test_reference_demo_script_parses(self):
        """The reference's own test.sql front-ends cleanly in strict mode."""
        stmts = load_statements(
            "/root/reference/flink-actions/src/main/resources/test.sql",
            strict_compat=True,
        )
        types = [t.type_name for t, _ in stmts]
        assert types == (
            ["SET"] * 9 + ["CREATE", "CREATE", "INSERT", "UNSET", "UNSET", "SELECT"]
        )


def test_statement_set_missing_end_raises():
    from flink_commons_spark.plans.script import ScriptError, split_statements

    text = """
    EXECUTE STATEMENT SET BEGIN
    INSERT INTO a SELECT 1;
    INSERT INTO b SELECT 2;
    """
    with pytest.raises(ScriptError, match="closing END"):
        split_statements(text)


def test_statement_set_inner_end_token_does_not_close_block():
    from flink_commons_spark.plans.script import split_statements

    # an inner statement legitimately ending with the token END (CASE
    # expression) must not terminate the block early
    text = """
    EXECUTE STATEMENT SET BEGIN
    INSERT INTO a SELECT CASE WHEN x > 0 THEN 1 ELSE 0 END;
    INSERT INTO b SELECT 2;
    END;
    SELECT 1;
    """
    stmts = split_statements(text)
    assert len(stmts) == 2
    assert "INSERT INTO b" in stmts[0]
    assert stmts[1].strip() == "SELECT 1"


def test_read_script_hdfs_via_fake_fs(monkeypatch, tmp_path):
    """R5's hdfs:// leg, exercised against a fake HadoopFileSystem: URI
    host/port dispatch, stream read, utf-8 decode. (The real JNI-backed
    filesystem needs an HDFS cluster; the fake pins the code path.)"""
    from pyarrow import fs as pafs

    from flink_commons_spark.plans import script as script_mod

    calls = {}

    class FakeStream:
        def __init__(self, data: bytes) -> None:
            self._data = data

        def read(self) -> bytes:
            return self._data

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class FakeHadoopFileSystem:
        def __init__(self, host, port):
            calls["host"] = host
            calls["port"] = port

        def open_input_stream(self, path):
            calls["path"] = path
            return FakeStream("SELECT 1;\n-- cômment\n".encode("utf-8"))

    monkeypatch.setattr(pafs, "HadoopFileSystem", FakeHadoopFileSystem)
    text = script_mod.read_script("hdfs://namenode:9000/jobs/q.sql")
    assert text.startswith("SELECT 1;")
    assert calls == {"host": "namenode", "port": 9000, "path": "/jobs/q.sql"}

    # default-authority form: hdfs:///path → 'default' fs, port 0
    script_mod.read_script("hdfs:///jobs/q.sql")
    assert calls["host"] == "default" and calls["port"] == 0


def test_read_script_unknown_scheme_and_missing_file():
    from flink_commons_spark.plans.script import ScriptError, read_script

    with pytest.raises(ScriptError, match="Unsupported file system scheme"):
        read_script("s3://bucket/q.sql")
    with pytest.raises(ScriptError, match="does not exist"):
        read_script("/nonexistent/q.sql")
