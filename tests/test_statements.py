"""Table-driven tests for statement classification.

Cases mirror the 21 variants of the reference's classifier
(``StatementType.java:6-44``) including the ordering subtleties:
CREATE's negative lookahead so CTAS wins, DESC before DESCRIBE, SET vs
UNSET prefix handling.
"""

import pytest

from flink_commons_spark.plans.statements import StatementType, classify

CASES = [
    ("SELECT * FROM t", StatementType.SELECT),
    ("select\n  dim, count(*)\nfrom t group by dim", StatementType.SELECT),
    ("CREATE TABLE t (a INT)", StatementType.CREATE),
    ("create table if not exists `c`.`d`.`t`(a string) with ('connector'='datagen')", StatementType.CREATE),
    ("DROP TABLE t", StatementType.DROP),
    ("ALTER TABLE t RENAME TO u", StatementType.ALTER),
    ("INSERT INTO t SELECT * FROM s", StatementType.INSERT),
    ("INSERT OVERWRITE t SELECT 1", StatementType.INSERT),
    ("DESC t", StatementType.DESC),
    # DESC pattern is a prefix of DESCRIBE and is declared first → DESC wins
    ("DESCRIBE t", StatementType.DESC),
    ("EXPLAIN SELECT 1", StatementType.EXPLAIN),
    ("USE mydb", StatementType.USE),
    ("SHOW TABLES", StatementType.SHOW),
    ("LOAD MODULE hive", StatementType.LOAD),
    ("UNLOAD MODULE hive", StatementType.UNLOAD),
    ("SET a.b = c", StatementType.SET),
    ("set pipeline.name = test-sql", StatementType.SET),
    # UNSET starts with "UN..." not "SET" → classified UNSET, not SET
    ("UNSET pipeline.name", StatementType.UNSET),
    ("RESET a.b", StatementType.RESET),
    ("EXECUTE STATEMENT SET BEGIN INSERT INTO a SELECT 1 END", StatementType.EXECUTE),
    ("ADD JAR /tmp/x.jar", StatementType.ADD_JAR),
    ("ADD CUSTOMJAR /tmp/x.jar", StatementType.ADD),
    ("PRINT hello", StatementType.PRINT),
    # CREATE ... AS SELECT falls through CREATE's lookahead to CTAS
    ("CREATE TABLE t AS SELECT * FROM s", StatementType.CTAS),
    ("create table t as select 1", StatementType.CTAS),
    ("MERGE INTO t USING s ON 1=1", StatementType.UNKNOWN),
    ("", StatementType.UNKNOWN),
]


@pytest.mark.parametrize("statement,expected", CASES)
def test_classify(statement, expected):
    assert classify(statement) is expected


def test_first_match_wins_order():
    """CREATE with AS SELECT inside a subclause still routes CTAS, matching
    the reference's DOTALL lookahead behavior."""
    assert classify("CREATE TABLE x (a INT) WITH ('k'='v')") is StatementType.CREATE
    assert classify("CREATE VIEW v AS SELECT 1") is StatementType.CTAS
