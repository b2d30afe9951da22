"""The backfill→stream handoff guarantee: for a window-aligned cutoff,
batch(≤cutoff) ∪ stream(>cutoff) is row-identical to one batch pass —
the sign-off check a streaming-warehouse migration runs before
switching traffic (streaming/backfill.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from gmall_realtime_ck_spark.catalog import load_table
from gmall_realtime_ck_spark.operators.quality import value_histogram
from gmall_realtime_ck_spark.operators.timeseries import cumulate_counts, ohlc_hourly
from gmall_realtime_ck_spark.streaming.backfill import backfill_then_stream

SF = "/root/testdata/sf0.001"


def _mid_cutoff_day(spark) -> str:
    """A midnight strictly inside the data range — aligned to hour,
    day, and CUMULATE window edges alike."""
    ev = load_table(spark, SF, "events")
    d0, d1 = ev.agg(F.min(F.to_date("ts")), F.max(F.to_date("ts"))).first()
    mid = d0 + (d1 - d0) / 2
    return f"{mid} 00:00:00"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_backfill_ohlc_equals_single_batch(spark):
    cutoff = _mid_cutoff_day(spark)
    hybrid = backfill_then_stream(spark, SF, ohlc_hourly, cutoff)
    full = ohlc_hourly(load_table(spark, SF, "events"))
    assert _rows(hybrid) == _rows(full)


def test_backfill_cumulate_equals_single_batch(spark):
    cutoff = _mid_cutoff_day(spark)
    hybrid = backfill_then_stream(spark, SF, cumulate_counts, cutoff)
    full = cumulate_counts(load_table(spark, SF, "events"))
    assert _rows(hybrid) == _rows(full)


def test_backfill_misaligned_cutoff_differs_for_histogram_is_false(spark):
    """The histogram has NO time grouping, so ANY cutoff partitions its
    input only if the aggregate itself is keyed per side — union of
    per-leg histograms double-counts keys. This documents the
    contract: backfill_then_stream is exact for cutoff-partitionable
    transforms; a global (non-windowed) aggregate needs re-aggregation
    of the union instead."""
    cutoff = _mid_cutoff_day(spark)
    hybrid = backfill_then_stream(spark, SF, value_histogram, cutoff)
    full = value_histogram(load_table(spark, SF, "events"))
    # the union has (up to) one row per (type, bucket) PER LEG
    assert hybrid.count() > full.count()
    # re-aggregating the partials recovers the exact single-batch result
    merged = (
        hybrid.groupBy("event_type", "bucket")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )
    assert _rows(merged) == _rows(full)
