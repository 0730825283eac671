"""Connector registry: TableSpec → source DataFrame / sink writer.

Connectors covered (reference usage in parens):

- ``datagen``    — random source (``test.sql:21-27``)
- ``print``      — console sink with ``print-identifier`` prefix
  (``test.sql:39-44``)
- ``filesystem`` — path + format source/sink (Flink's filesystem
  connector option names: ``path``, ``format``)
- ``blackhole``  — discard-everything sink (Flink parity)
- ``rate``       — raw Spark rate source passthrough (extension)

Computed columns and watermarks declared in the DDL are applied here so
every reader of the registered view sees them — mirroring how Flink
evaluates computed columns and watermarks at the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_commons_spark.plans.ddl import TableSpec
from flink_commons_spark.sources import datagen

SOURCE_CONNECTORS = {"datagen", "filesystem", "rate"}
SINK_CONNECTORS = {"print", "blackhole", "filesystem"}


class ConnectorError(ValueError):
    """Unknown connector or invalid connector options."""


def is_source_connector(spec: TableSpec) -> bool:
    return spec.connector in SOURCE_CONNECTORS


def is_sink_connector(spec: TableSpec) -> bool:
    return spec.connector in SINK_CONNECTORS


def _apply_schema_extras(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Computed columns (``test.sql:18``) then watermark (``test.sql:19``)."""
    for name, expr in spec.computed:
        df = df.withColumn(name, F.expr(expr))
    if spec.watermark and df.isStreaming:
        col, delay = spec.watermark
        df = df.withWatermark(col, delay)
    return df


def build_source(spark: SparkSession, spec: TableSpec, streaming: bool) -> DataFrame:
    """Build the source DataFrame for a registered connector table."""
    if spec.connector == "datagen":
        base = (
            datagen.stream_source(spark, spec)
            if streaming and "number-of-rows" not in spec.options
            else datagen.batch_source(spark, spec)
        )
    elif spec.connector == "filesystem":
        base = _filesystem_source(spark, spec, streaming)
    elif spec.connector == "rate":
        if not streaming:
            raise ConnectorError("rate connector is streaming-only")
        base = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", spec.options.get("rows-per-second", "1000"))
            .load()
        )
    else:
        raise ConnectorError(
            f"Connector {spec.connector!r} cannot be read as a source "
            f"(table {spec.name!r})."
        )
    return _apply_schema_extras(base, spec)


def _ns_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark cannot read
    them natively (Flink can), so the connector downgrades them to
    microseconds for dialect parity."""
    try:
        import glob
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        f = path if os.path.isfile(path) else next(
            iter(sorted(glob.glob(os.path.join(path, "*.parquet")))), None
        )
        if not f:
            return []
        schema = pq.ParquetFile(f).schema_arrow
        return [
            field.name
            for field in schema
            if pa.types.is_timestamp(field.type) and field.type.unit == "ns"
        ]
    except Exception:
        return []


def _filesystem_source(spark: SparkSession, spec: TableSpec, streaming: bool) -> DataFrame:
    path = spec.options.get("path")
    if not path:
        raise ConnectorError(f"filesystem table {spec.name!r} requires a 'path' option")
    fmt = spec.options.get("format", "parquet")
    ns_cols = _ns_timestamp_cols(path) if fmt == "parquet" else []
    if ns_cols:
        # read NANOS as long, then truncate to microsecond timestamps
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def declared_schema() -> str:
        # ns-timestamp columns must be read as bigint then converted
        return ", ".join(
            f"{name} bigint" if name in ns_cols else f"{name} {typ}"
            for name, typ in spec.columns
        )

    if streaming:
        reader = spark.readStream.format(fmt)
        if spec.columns:
            reader = reader.schema(declared_schema())
        elif fmt == "parquet":
            reader = reader.schema(spark.read.format(fmt).load(path).schema)
        else:
            raise ConnectorError("streaming filesystem source requires a declared schema")
        df = reader.load(path)
    else:
        reader = spark.read.format(fmt)
        if spec.columns:
            reader = reader.schema(declared_schema())
        if fmt == "csv":
            reader = reader.option("header", spec.options.get("csv.include-header", "false"))
        df = reader.load(path)
    for c in ns_cols:
        if not spec.columns or any(name == c for name, _ in spec.columns):
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def print_batch(df: DataFrame, identifier: str | None) -> None:
    """Batch half of the print sink: one prefixed line per row.

    Matches the shape of Flink's print sink output
    (``print-identifier> +I[...]``, options at ``test.sql:40-43``).
    Driver-side by design — printing is inherently a driver/console act;
    at scale one uses a real sink, exactly as with Flink's print
    connector.
    """
    prefix = f"{identifier}> " if identifier else ""
    for row in df.collect():
        values = ", ".join("null" if v is None else str(v) for v in row)
        print(f"{prefix}+I[{values}]")


def write_batch_sink(df: DataFrame, spec: TableSpec) -> None:
    """Route a batch INSERT INTO <sink table>."""
    if spec.connector == "print":
        print_batch(df, spec.options.get("print-identifier"))
    elif spec.connector == "blackhole":
        df.write.format("noop").mode("overwrite").save()
    elif spec.connector == "filesystem":
        path = spec.options.get("path")
        if not path:
            raise ConnectorError(f"filesystem sink {spec.name!r} requires 'path'")
        fmt = spec.options.get("format", "parquet")
        df.write.format(fmt).mode(spec.options.get("sink.mode", "append")).save(path)
    else:
        raise ConnectorError(f"Connector {spec.connector!r} is not writable")


def start_stream_sink(df: DataFrame, spec: TableSpec, *, query_name: str,
                      output_mode: str, trigger: dict, checkpoint: str | None):
    """Route a streaming INSERT INTO <sink table>; returns a StreamingQuery."""
    writer = df.writeStream.queryName(query_name).outputMode(output_mode)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    if spec.connector == "print":
        identifier = spec.options.get("print-identifier")

        def _emit(batch_df: DataFrame, epoch_id: int) -> None:
            print_batch(batch_df, identifier)

        return writer.foreachBatch(_emit).start()
    if spec.connector == "blackhole":
        return writer.format("noop").start()
    if spec.connector == "filesystem":
        path = spec.options.get("path")
        if not path:
            raise ConnectorError(f"filesystem sink {spec.name!r} requires 'path'")
        fmt = spec.options.get("format", "parquet")
        return writer.format(fmt).option("path", path).start()
    raise ConnectorError(f"Connector {spec.connector!r} is not stream-writable")
