"""Connector registry: builds DataFrames / sinks from :class:`TableSpec`s."""

from flink_commons_spark.sources.registry import (
    ConnectorError,
    build_source,
    is_sink_connector,
    is_source_connector,
)

__all__ = ["ConnectorError", "build_source", "is_sink_connector", "is_source_connector"]
