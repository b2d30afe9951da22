"""The gmall realtime-warehouse pipelines, re-expressed Spark-first.

Layer map (reference → here):
- ODS: Kafka topic_db / topic_log → ``sources`` + ``schemas``
- DIM: config-driven dimension sync (DimApp) → ``dim``
- DWD: fact jobs (log split, star joins, status filters) → ``dwd``
- DWS: windowed stateful aggregates + dim enrichment → ``dws``
- serving: publisher SQL → plain Spark SQL over DWS outputs

Batch and streaming share the same transformation functions: each
pipeline is written against DataFrames and works identically under
``spark.read`` and ``spark.readStream`` (tests assert batch ≡ stream).
"""
