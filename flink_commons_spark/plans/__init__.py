"""Script-level "IR": statement classification, loading, DDL parsing."""

from flink_commons_spark.plans.statements import StatementType, classify
from flink_commons_spark.plans.script import (
    load_statements,
    read_script,
    split_statements,
    strip_comments,
    substitute_variables,
)
from flink_commons_spark.plans.ddl import TableSpec, parse_create_table, is_connector_ddl

__all__ = [
    "StatementType",
    "classify",
    "load_statements",
    "read_script",
    "split_statements",
    "strip_comments",
    "substitute_variables",
    "TableSpec",
    "parse_create_table",
    "is_connector_ddl",
]
