"""Multi-batch incremental semantics: update-mode aggregation upserted
per micro-batch converges to the batch answer; watermarks drop
too-late data deterministically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _file_per_batch_source(spark, tmp_path, batches, schema):
    import time

    d = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        if i:
            time.sleep(1.1)  # distinct mtimes → deterministic file→batch order
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").json(d)
    # maxFilesPerTrigger=1 → one micro-batch per file, ordered by mtime
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(d)
    )


def test_update_mode_upsert_converges(spark, tmp_path):
    """The DWS production sink pattern: update-mode windowed agg →
    foreachBatch keyed upsert. After two micro-batches the store equals
    the one-shot batch aggregation (exactly-once upsert semantics, the
    reference's upsert-kafka H4 modeled on a keyed store)."""
    schema = "k string, v long, ts long"
    stream = _file_per_batch_source(
        spark,
        tmp_path,
        [[("a", 1, 100), ("b", 2, 110)], [("a", 10, 120), ("c", 5, 130)]],
        schema,
    )
    agg = stream.groupBy("k").agg(F.sum("v").alias("total"))

    store: dict[str, int] = {}

    def upsert(batch_df, batch_id):
        for r in batch_df.collect():  # tiny test store; production: MERGE
            store[r["k"]] = r["total"]

    q = (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batch = {
        r["k"]: r["total"]
        for r in spark.read.json(str(tmp_path / "src"), schema=schema)
        .groupBy("k")
        .agg(F.sum("v").alias("total"))
        .collect()
    }
    assert store == batch == {"a": 11, "b": 2, "c": 5}


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark semantics: an event older than (max-seen − delay) from
    a LATER micro-batch is dropped from the aggregation — Spark's
    answer to the reference's bounded-out-of-orderness watermarks
    (DwsTrafficVcChArIsNewPageViewWindow.java:110-123); beyond-watermark
    late data has no allowed-lateness path, matching SURVEY §2.10."""
    from datetime import datetime

    schema = "k string, ts timestamp"
    t = lambda m: datetime(2024, 1, 1, 10, m, 0)
    # batch 0 advances event time to 10:30 (watermark 10:25); batch 1
    # triggers the append-mode eviction of the closed 10:00 window;
    # batch 2's event is then late-beyond-watermark and must drop.
    # (Eviction and late-filtering take effect one batch after the
    # watermark-advancing data — verified engine behavior.)
    stream = _file_per_batch_source(
        spark,
        tmp_path,
        [[("w1", t(0)), ("w1", t(1)), ("adv", t(30))], [("mid", t(31))], [("late", t(2))]],
        schema,
    )
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .count()
    )

    results = []

    def sink(batch_df, batch_id):
        results.extend(batch_df.collect())

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    counted = {(r["w"]["start"].minute, r["count"]) for r in results}
    # the 10:00 window closed with 2 events; the late 10:02 event from
    # batch 2 (watermark already at 10:25) was dropped, not re-emitted
    assert (0, 2) in counted
    assert not any(c == 3 for _, c in counted)
