"""``datagen`` connector: rate-limited random rows, Flink-option-compatible.

The reference's demo source (``test.sql:21-27``) is Flink's datagen
connector with ``rows-per-second``, ``fields.<f>.min``/``max`` and
``fields.<f>.length`` options. Spark has no datagen source, but its
``rate`` streaming source provides the paced ``(timestamp, value)``
spine; we project randomized typed columns on top with built-in
(JVM-side, codegen'd) expressions — no Python UDFs in the row path, so
the generator scales with executor count like any narrow map.

Supported options (superset of what the reference exercises):

- ``rows-per-second`` (streaming rate; default 10 000 like Flink)
- ``number-of-rows`` (bounded generation; batch mode always needs it,
  default 1 000)
- ``fields.<f>.min`` / ``fields.<f>.max`` (numeric ranges, inclusive)
- ``fields.<f>.length`` (random string length)
- ``fields.<f>.kind`` = ``sequence`` (monotonic ids) — Flink parity
- ``seed`` (extension: deterministic generation for tests)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_commons_spark.plans.ddl import TableSpec

_ALNUM = "abcdefghijklmnopqrstuvwxyz0123456789"


def _rand(seed: int | None, salt: int):
    return F.rand(seed + salt) if seed is not None else F.rand()


def _random_string(length: int, seed: int | None, salt: int):
    """Random lowercase-alnum string of ``length`` chars, JVM-side only.

    Builds from md5(rand) hex; md5 gives 32 hex chars per call, chained
    for longer strings.
    """
    chunks = []
    remaining = length
    i = 0
    while remaining > 0:
        take = min(32, remaining)
        entropy = F.concat(
            F.col("__gen_id").cast("string"),
            F.lit(":"),
            _rand(seed, salt + i).cast("string"),
        )
        chunks.append(F.substring(F.md5(entropy), 1, take))
        remaining -= take
        i += 1
    return F.concat(*chunks) if len(chunks) > 1 else chunks[0]


def _column_expr(name: str, spark_type: str, options: dict[str, str], seed: int | None, idx: int):
    prefix = f"fields.{name}."
    kind = options.get(prefix + "kind", "random")
    if kind == "sequence":
        start = int(options.get(prefix + "start", "1"))
        return (F.col("__gen_id") + F.lit(start)).cast(spark_type)
    if spark_type in ("tinyint", "smallint", "int", "bigint"):
        lo = float(options.get(prefix + "min", "0"))
        hi = float(options.get(prefix + "max", str(2**31 - 1)))
        return F.floor(_rand(seed, idx) * (hi - lo + 1) + lo).cast(spark_type)
    if spark_type in ("float", "double") or spark_type.startswith("decimal"):
        lo = float(options.get(prefix + "min", "0"))
        hi = float(options.get(prefix + "max", "1000"))
        return (_rand(seed, idx) * (hi - lo) + lo).cast(spark_type)
    if spark_type == "string":
        length = int(options.get(prefix + "length", "100"))
        return _random_string(length, seed, idx * 7 + 1)
    if spark_type == "boolean":
        return (_rand(seed, idx) > 0.5)
    if spark_type == "timestamp":
        return F.current_timestamp()
    raise ValueError(f"datagen: unsupported field type {spark_type!r} for {name!r}")


def _project(df: DataFrame, spec: TableSpec, seed: int | None) -> DataFrame:
    cols = [
        _column_expr(name, stype, spec.options, seed, idx).alias(name)
        for idx, (name, stype) in enumerate(spec.columns)
    ]
    return df.select("__gen_id", *cols).drop("__gen_id")


def batch_source(spark: SparkSession, spec: TableSpec) -> DataFrame:
    """Bounded datagen: ``spark.range(n)`` spine + randomized projection."""
    n = int(spec.options.get("number-of-rows", "1000"))
    seed = int(spec.options["seed"]) if "seed" in spec.options else None
    parallelism = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    spine = spark.range(0, n, 1, min(parallelism, max(1, n))).withColumnRenamed("id", "__gen_id")
    return _project(spine, spec, seed)


def stream_source(spark: SparkSession, spec: TableSpec) -> DataFrame:
    """Unbounded datagen: Spark ``rate`` source + randomized projection."""
    rps = int(spec.options.get("rows-per-second", "10000"))
    seed = int(spec.options["seed"]) if "seed" in spec.options else None
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .load()
        .withColumnRenamed("value", "__gen_id")
    )
    return _project(rate, spec, seed)
