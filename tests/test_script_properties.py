"""Property-based tests (hypothesis) for the pure-Python script front-end."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_commons_spark.plans.script import load_statements_from_text
from flink_commons_spark.plans.statements import StatementType, classify

# identifier-ish words that never collide with comment/quote syntax
_WORD = st.text(alphabet="abcdefgXYZ019_", min_size=1, max_size=8)
# literal content may contain the splitter's hazards: ; and --
_LITERAL = st.text(alphabet="ab;- c", min_size=0, max_size=12)


@st.composite
def statement(draw):
    """A single well-formed SELECT statement with a quoted literal."""
    w1, w2 = draw(_WORD), draw(_WORD)
    lit = draw(_LITERAL).replace("'", "")
    return f"SELECT {w1}, '{lit}' AS s FROM {w2}"


@given(st.lists(statement(), min_size=1, max_size=6))
@settings(max_examples=60, deadline=None)
def test_split_preserves_statement_count_and_text(stmts):
    script = ";\n".join(stmts) + ";"
    parsed = load_statements_from_text(script, {}, strict_compat=False)
    assert len(parsed) == len(stmts)
    for (stype, text), original in zip(parsed, stmts):
        assert stype is StatementType.SELECT
        # whitespace-normalized round trip: no content lost or injected
        assert " ".join(text.split()) == " ".join(original.split())


@given(st.lists(statement(), min_size=1, max_size=4))
@settings(max_examples=40, deadline=None)
def test_comments_between_statements_are_stripped(stmts):
    script = ""
    for s in stmts:
        script += f"-- leading comment; with ; and -- inside\n{s};\n"
    parsed = load_statements_from_text(script, {}, strict_compat=False)
    assert len(parsed) == len(stmts)
    for _, text in parsed:
        assert "leading comment" not in text


@given(_WORD, _WORD)
@settings(max_examples=40, deadline=None)
def test_variable_substitution_total(name, value):
    script = f"SELECT '${{{name}}}' AS v FROM t;"
    parsed = load_statements_from_text(script, {name: value}, strict_compat=False)
    assert len(parsed) == 1
    assert value in parsed[0][1]
    assert "${" not in parsed[0][1]


@given(st.sampled_from([
    ("SELECT 1", StatementType.SELECT),
    ("CREATE TABLE t (a int)", StatementType.CREATE),
    ("CREATE TABLE t AS SELECT 1", StatementType.CTAS),
    ("INSERT INTO t SELECT 1", StatementType.INSERT),
    ("SET a = b", StatementType.SET),
    ("DROP TABLE t", StatementType.DROP),
    ("SHOW TABLES", StatementType.SHOW),
    ("EXPLAIN SELECT 1", StatementType.EXPLAIN),
    ("frobnicate", StatementType.UNKNOWN),
]), st.booleans())
@settings(max_examples=60, deadline=None)
def test_classifier_case_invariant(pair, upper):
    # the pipeline hands classify() trimmed statements; case must not matter
    text, expected = pair
    mutated = text.upper() if upper else text.lower()
    assert classify(mutated) is expected


# ------------------------------------------------------------- dialect

_TRIGGERS = re.compile(
    r"unix_timestamp|timestamp\s*\(|proctime|TUMBLE|HOP|SESSION|CUMULATE"
    r"|SYSTEM_TIME|OPTIONS|SPLIT_INDEX|JSON_VALUE|TO_TIMESTAMP_LTZ|RAND_INTEGER",
    re.IGNORECASE,
)


@given(st.text(alphabet="abcdefg XY,()';*=<>0123456789\n_-", max_size=120))
def test_adapt_sql_total_and_identity_without_triggers(sql):
    """adapt_sql never raises on arbitrary input, and leaves SQL with
    none of the Flink trigger constructs byte-identical."""
    from flink_commons_spark.plans.dialect import adapt_sql

    out = adapt_sql(sql)  # must not raise
    if not _TRIGGERS.search(sql):
        assert out == sql


@given(
    inner=st.text(alphabet="abc XY9_", min_size=1, max_size=20).map(str.strip).filter(bool),
    idx=st.integers(0, 9),
)
def test_split_index_rewrite_shape(inner, idx):
    """SPLIT_INDEX rewrites to try_element_at with the 1-based shift,
    whatever the (stripped) first argument expression looks like."""
    from flink_commons_spark.plans.dialect import adapt_sql

    out = adapt_sql(f"SELECT SPLIT_INDEX({inner}, ',', {idx}) FROM t")
    assert out == f"SELECT try_element_at(split({inner}, ','), ({idx}) + 1) FROM t"
