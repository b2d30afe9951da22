"""gmall_realtime_ck_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference realtime warehouse
(`chunjianshi/gmall-realtime-ck`, a Flink 1.17 / Kafka / HBase /
ClickHouse stack) on top of Spark DataFrame / Catalyst / Structured
Streaming, plus first-class large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing).

Layout
------
- ``session``    : SparkSession factory tuned for scale (AQE, Arrow).
- ``catalog``    : loaders for the driver's parquet test tables.
- ``schemas``    : the reference's data model as Spark StructTypes
                   (Maxwell CDC envelope, behavior log, config tables).
- ``operators/`` : batch operators — relational (filters, joins,
                   windowed aggregations), stateful batch oracles,
                   dedup family, similarity search, text analysis.
- ``streaming/`` : Structured Streaming pipelines and stateful
                   operators (applyInPandasWithState).
- ``sources/``, ``sinks/`` : connector helpers (Kafka, files, JDBC).
- ``registry``   : the declared query inventory consumed by
                   ``__spark_entry__.py`` (queries + DuckDB oracles).
"""

__version__ = "0.1.0"
