"""Pluggable CLI action framework + the ``sql-submit`` action."""

from flink_commons_spark.actions.base import (
    Action,
    ActionFactory,
    FactoryError,
    create_action,
    discover_action_factory,
    register_factory,
    registered_factories,
)
from flink_commons_spark.actions.compact import CompactAction, CompactActionFactory
from flink_commons_spark.actions.sql_submit import SqlSubmitAction, SqlSubmitActionFactory

__all__ = [
    "CompactAction",
    "CompactActionFactory",
    "Action",
    "ActionFactory",
    "FactoryError",
    "create_action",
    "discover_action_factory",
    "register_factory",
    "registered_factories",
    "SqlSubmitAction",
    "SqlSubmitActionFactory",
]
