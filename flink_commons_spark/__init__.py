"""flink_commons_spark — a PySpark-native SQL-script engine.

A ground-up re-expression of the capabilities of the reference project
``shy1248/flink-commons`` (a Flink SQL script submitter, see
``/root/reference``) on top of Apache Spark: Spark SQL + Catalyst for
batch, Structured Streaming for streams, plus first-class large-scale
data-pipeline operators (deduplication, similarity search, text
analysis, multimodal column plumbing) that the 100 TB north-star
requires.

Layout
------
- ``actions``   — the pluggable CLI action framework + ``sql-submit``
  runner (reference: ``FlinkActions.java``, ``ActionFactory.java``,
  ``SQLSubmitAction.java``).
- ``plans``     — the script "IR": statement classification, script
  loading/splitting, ``${var}`` substitution, Flink-dialect DDL parsing
  (reference: ``StatementType.java``, ``SQLSubmitAction.java:101-161``).
- ``sources``   — connector registry: ``datagen``, ``print``,
  ``filesystem``, ``blackhole`` (reference: ``test.sql`` WITH clauses).
- ``functions`` — scalar/vector/text function helpers built on
  ``pyspark.sql.functions`` (JVM-side, codegen'd).
- ``operators`` — large-scale pipeline operators: dedup family,
  similarity search, multimodal plumbing.
- ``streaming`` — streaming-specific helpers (exact COUNT DISTINCT,
  query orchestration).
"""

__version__ = "0.1.0"
