"""Structured Streaming layer.

- ``state``     : keyed stateful operators (T1-T7) as
                  applyInPandasWithState / dropDuplicatesWithinWatermark.
- ``pipelines`` : runnable streaming pipelines (file/Kafka source →
                  transforms → sink) mirroring the reference's apps,
                  sharing transformation code with the batch layer.
"""
