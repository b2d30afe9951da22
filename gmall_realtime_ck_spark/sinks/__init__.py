"""Sink connectors: Kafka fixed/dynamic/upsert (K1-K3), OLAP JDBC
(K4-K8), dim store (K9), dirty-data side output (K10)."""
