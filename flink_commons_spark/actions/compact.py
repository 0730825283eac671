"""The ``compact`` action: OPTIMIZE an upsert-filesystem table.

Second registered action — the reference's framework is explicitly
pluggable (ServiceLoader SPI, ``FactoryUtil.java:18-58``; ``BaseAction``
shows the intended extension pattern, ``BaseAction.java:13-17``) even
though it ships only ``sql-submit``. This action exercises that
extensibility for the table-maintenance job a lakehouse needs: rewrite
an upsert table's keyed changelog into one snapshot row per key
(``KeyedParquetUpsertSink.compact``).

Usage::

    python -m flink_commons_spark compact --path /lake/silver --key event_type[,k2...]
"""

from __future__ import annotations

import logging

from flink_commons_spark.actions.base import Action, ActionFactory, MultiParams, register_factory

log = logging.getLogger(__name__)


class CompactAction(Action):
    def __init__(self, path: str, keys: list[str], *, spark=None) -> None:
        if not path:
            raise ValueError("compact requires a table path")
        if not keys:
            raise ValueError("compact requires at least one key column")
        self.path = path
        self.keys = keys
        self.spark = spark

    def run(self) -> None:
        from flink_commons_spark.streaming.upsert import KeyedParquetUpsertSink

        if self.spark is None:
            from flink_commons_spark.session import get_session

            self.spark = get_session(app_name="compact")
        sink = KeyedParquetUpsertSink(self.path, self.keys)
        n_files = sink.compact(self.spark)
        log.info("Compacted %s to %d data file(s)", self.path, n_files)
        print(f"compacted {self.path}: {n_files} data file(s)")


class CompactActionFactory(ActionFactory):
    identifier = "compact"

    def create(self, params: MultiParams) -> CompactAction:
        path = params.get_required("path")
        keys = [k.strip() for k in params.get_required("key").split(",") if k.strip()]
        return CompactAction(path, keys)

    def show_help(self) -> None:
        print(
            "Action: compact\n"
            "  Rewrites an upsert-filesystem table's changelog to one\n"
            "  snapshot row per key (offline maintenance; no concurrent\n"
            "  writer).\n\n"
            "Syntax:\n"
            "  python -m flink_commons_spark compact --path <dir> --key k1[,k2...]\n"
        )


register_factory(CompactActionFactory())
