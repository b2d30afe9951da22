"""Stream-stream join parity: Spark's watermarked interval join (J4)
must produce the batch join's matches on bounded data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_realtime_ck_spark.streaming import pipelines
from tests.conftest import SF_DIR


def _typed(df, event_type):
    return (
        df.filter(F.col("event_type") == event_type)
        .select(
            F.col("event_id").alias(f"{event_type}_id"),
            F.col("user_id").alias(f"{event_type}_user"),
            F.col("ts").alias(f"{event_type}_ts"),
        )
    )


def test_stream_stream_interval_join_matches_batch(spark, tables):
    """J1/J4 streaming — purchases ⋈ views within [-1h, 0] per user,
    both sides watermarked (state bounded like the reference's
    idle-state TTL, DwdTradeOrderDetail.java:22). Inner-join matches
    are emitted as they arrive; on bounded data the match set equals
    the batch join."""
    ev_s = pipelines.events_file_stream(spark, SF_DIR)
    p_s = _typed(ev_s, "purchase").withWatermark("purchase_ts", "10 minutes")
    v_s = _typed(ev_s, "view").withWatermark("view_ts", "10 minutes")
    cond = (
        (F.col("purchase_user") == F.col("view_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
    )
    streamed = pipelines._run_to_memory(
        p_s.join(v_s, cond).select("purchase_id", "view_id"), "append"
    )
    s = {(r["purchase_id"], r["view_id"]) for r in streamed.collect()}

    ev_b = tables["events"]
    p_b = _typed(ev_b, "purchase")
    v_b = _typed(ev_b, "view")
    b = {
        (r["purchase_id"], r["view_id"])
        for r in p_b.join(v_b, cond).select("purchase_id", "view_id").collect()
    }
    assert s == b
    assert len(b) > 0
