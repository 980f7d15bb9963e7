"""easy_alterator_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference schema-evolution utility
``guptaakashdeep/easy-alterator`` (see SURVEY.md) as an idiomatic Spark
DataFrame/SQL engine, and extends it with the relational query surface
(SURVEY.md §2.10) plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Layout
------
- ``session``    : tuned SparkSession bootstrap (AQE, Arrow, UTC).
- ``sources``    : parquet table loaders, DDL-corpus reader.
- ``functions``  : reusable Column-expression libraries (vectors, text).
- ``queries``    : the declared query inventory + extension queries,
                   each paired with a DuckDB oracle SQL string.
- ``ddl``        : the schema-diff engine (the reference's core
                   semantics: parse DDL, diff vs catalog, classify,
                   render ALTER statements).
- ``operators``  : dedup / similarity / text-analysis / multimodal ops.
- ``streaming``  : Structured Streaming façade over the events table.
"""

__version__ = "0.1.0"
