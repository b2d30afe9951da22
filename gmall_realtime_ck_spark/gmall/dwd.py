"""DWD layer: fact-table transforms over the ODS streams.

Every function is a pure DataFrame→DataFrame transform, so the same
code runs in batch (tests, backfills) and Structured Streaming
(readStream + foreachBatch). Reference parity is cited per function.

The gmall zone is Asia/Shanghai: callers render local-date strings with
the ``CST_*`` helpers rather than relying on the session timezone
(which this engine pins to UTC for oracle parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import LOG_EVENT, MAXWELL_ENVELOPE

# UTC+8 rendering, independent of session TZ
# (COMMON/util/DateFormatUtil.java:26-66).
def cst_date(col) -> F.Column:
    return F.date_format(F.from_utc_timestamp(col, "Asia/Shanghai"), "yyyy-MM-dd")


def cst_datetime(col) -> F.Column:
    return F.date_format(F.from_utc_timestamp(col, "Asia/Shanghai"), "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# ODS parsing / ETL
# ---------------------------------------------------------------------------


def parse_topic_db(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Maxwell envelope ETL (P2 — DIM/app/DimApp.java:212-237): parse
    JSON, keep database='gmall' with a usable type and non-empty data;
    add event-time ``et`` from epoch-seconds ts
    (BaseSQLApp.java:61-63). Kafka tombstones (P9) drop at the
    isNotNull gate.
    """
    parsed = raw.filter(F.col(value_col).isNotNull()).select(
        F.from_json(F.col(value_col), MAXWELL_ENVELOPE).alias("e")
    )
    return (
        parsed.select("e.*")
        .filter(
            (F.col("database") == "gmall")
            & F.col("type").isin("insert", "update", "delete", "bootstrap-insert")
            & (F.size("data") > 0)
        )
        .withColumn("et", F.timestamp_seconds("ts"))
    )


def filter_bootstrap(db: DataFrame) -> DataFrame:
    """P3 — drop Maxwell snapshot rows (DwdBaseDb.java:41-57)."""
    return db.filter(~F.col("type").startswith("bootstrap-"))


def split_log(raw: DataFrame, value_col: str = "value") -> dict[str, DataFrame]:
    """P1/X1/K10 — the 5-way log split (DwdBaseLog.java:75-175,231-258):
    unparseable lines → 'dirty'; err/start stripped off; displays[] and
    actions[] exploded into per-element records enriched with
    common+page+ts; page rows remain the main stream.
    """
    parsed = raw.select(
        F.col(value_col).alias("raw"), F.from_json(F.col(value_col), LOG_EVENT).alias("e")
    )
    dirty = parsed.filter(F.col("e").isNull() | F.col("e.ts").isNull()).select("raw")
    ok = parsed.filter(F.col("e").isNotNull() & F.col("e.ts").isNotNull()).select("e.*")

    err = ok.filter(F.col("err").isNotNull()).select("common", "err", "ts")
    start = ok.filter(F.col("start").isNotNull()).select("common", "start", "ts")
    display = (
        ok.filter(F.size("displays") > 0)
        .select("common", "page", "ts", F.explode("displays").alias("display"))
    )
    action = (
        ok.filter(F.size("actions") > 0)
        .select("common", "page", "ts", F.explode("actions").alias("action"))
    )
    page = ok.filter(F.col("page").isNotNull()).select("common", "page", "ts")
    return {
        "dirty": dirty,
        "err": err,
        "start": start,
        "display": display,
        "action": action,
        "page": page,
    }


def repair_is_new(page: DataFrame) -> DataFrame:
    """T3 — new/old-visitor repair (DwdBaseLog.java:177-229), batch
    oracle: is_new stays 1 only on the device's first-visit date (by
    event order); everything else is rewritten to 0. The streaming
    variant (per-mid ValueState) is
    streaming.state.repair_is_new_stream.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("common.mid")
    first_ts = F.min("ts").over(w)
    return page.withColumn(
        "common",
        F.col("common").withField(
            "is_new",
            F.when(
                cst_date(F.timestamp_millis(F.col("ts")))
                == cst_date(F.timestamp_millis(first_ts)),
                F.col("common.is_new"),
            ).otherwise(F.lit("0")),
        ),
    )


# ---------------------------------------------------------------------------
# fact joins
# ---------------------------------------------------------------------------


def order_detail_star(db: DataFrame) -> DataFrame:
    """J1/J2 — the 4-table order-detail star
    (DwdTradeOrderDetail.java:28-98): order_detail ⋈ order_info on
    order_id, LEFT JOIN detail_activity / detail_coupon on
    order_detail_id. Amount arithmetic in DECIMAL(16,2)
    (DwdTradeOrderDetail.java:37). In streaming this runs inside
    foreachBatch per micro-batch (no Flink retraction triple — SURVEY
    §7 H1), joined state bounded by the batch horizon instead of the
    reference's 10 s idle-state TTL (DwdTradeOrderDetail.java:22).
    """
    od = (
        db.filter((F.col("table") == "order_detail") & (F.col("type") == "insert"))
        .select(
            F.col("data")["id"].alias("id"),
            F.col("data")["order_id"].alias("order_id"),
            F.col("data")["sku_id"].alias("sku_id"),
            F.col("data")["sku_name"].alias("sku_name"),
            F.col("data")["create_time"].alias("create_time"),
            F.col("data")["source_id"].alias("source_id"),
            F.col("data")["source_type"].alias("source_type"),
            F.col("data")["sku_num"].alias("sku_num"),
            (
                F.col("data")["sku_num"].cast("decimal(16,2)")
                * F.col("data")["order_price"].cast("decimal(16,2)")
            )
            .cast("string")
            .alias("split_original_amount"),
            F.col("data")["split_total_amount"].alias("split_total_amount"),
            F.col("data")["split_activity_amount"].alias("split_activity_amount"),
            F.col("data")["split_coupon_amount"].alias("split_coupon_amount"),
            F.col("ts"),
        )
    )
    oi = (
        db.filter((F.col("table") == "order_info") & (F.col("type") == "insert"))
        .select(
            F.col("data")["id"].alias("oi_id"),
            F.col("data")["user_id"].alias("user_id"),
            F.col("data")["province_id"].alias("province_id"),
        )
    )
    act = (
        db.filter((F.col("table") == "order_detail_activity") & (F.col("type") == "insert"))
        .select(
            F.col("data")["order_detail_id"].alias("act_od_id"),
            F.col("data")["activity_id"].alias("activity_id"),
            F.col("data")["activity_rule_id"].alias("activity_rule_id"),
        )
    )
    cou = (
        db.filter((F.col("table") == "order_detail_coupon") & (F.col("type") == "insert"))
        .select(
            F.col("data")["order_detail_id"].alias("cou_od_id"),
            F.col("data")["coupon_id"].alias("coupon_id"),
        )
    )
    return (
        od.join(oi, od.order_id == oi.oi_id)
        .join(act, od.id == act.act_od_id, "left")
        .join(cou, od.id == cou.cou_od_id, "left")
        .withColumn("date_id", F.substring("create_time", 1, 10))
        .drop("oi_id", "act_od_id", "cou_od_id")
    )


def cart_add_delta(db: DataFrame) -> DataFrame:
    """P6 — cart-add increments (DwdTradeCartAdd.java:28-40): inserts
    pass whole; updates pass only when sku_num grew, emitting the delta
    sku_num - old.sku_num.
    """
    d = F.col("data")
    o = F.col("old")
    grew = (F.col("type") == "update") & o["sku_num"].isNotNull() & (
        d["sku_num"].cast("int") > o["sku_num"].cast("int")
    )
    return (
        db.filter((F.col("table") == "cart_info") & ((F.col("type") == "insert") | grew))
        .select(
            d["id"].alias("id"),
            d["user_id"].alias("user_id"),
            d["sku_id"].alias("sku_id"),
            F.when(F.col("type") == "insert", d["sku_num"].cast("int"))
            .otherwise(d["sku_num"].cast("int") - o["sku_num"].cast("int"))
            .cast("string")
            .alias("sku_num"),
            F.col("ts"),
        )
    )


def order_cancel(db: DataFrame) -> DataFrame:
    """P7 — cancel detection (DwdTradeOrderCancelDetail.java:50-59):
    update with old.order_status=1001 and data.order_status=1003."""
    d = F.col("data")
    o = F.col("old")
    return db.filter(
        (F.col("table") == "order_info")
        & (F.col("type") == "update")
        & (o["order_status"] == "1001")
        & (d["order_status"] == "1003")
    ).select(
        d["id"].alias("order_id"),
        d["user_id"].alias("user_id"),
        d["province_id"].alias("province_id"),
        d["operate_time"].alias("cancel_time"),
        F.col("ts"),
    )


def pay_success(db: DataFrame) -> DataFrame:
    """P7 — payment success (DwdTradeOrderPaySucDetail.java:51-63):
    payment_info update reaching payment_status=1602."""
    d = F.col("data")
    return db.filter(
        (F.col("table") == "payment_info")
        & (F.col("type") == "update")
        & (d["payment_status"] == "1602")
    ).select(
        d["order_id"].alias("order_id"),
        d["user_id"].alias("user_id"),
        d["payment_type"].alias("payment_type"),
        d["callback_time"].alias("callback_time"),
        d["total_amount"].alias("total_amount"),
        F.col("et").alias("pay_et"),
        F.col("ts"),
    )


def pay_success_detail_interval(pay: DataFrame, od_star: DataFrame) -> DataFrame:
    """J4 — interval join pay ⋈ order_detail: detail event-time within
    [pay_et - 30 min, pay_et + 5 s]
    (DwdTradeOrderPaySucDetail.java:91-94). In streaming both sides get
    withWatermark and the same bounds (state auto-evicted).
    """
    od = od_star.select(
        F.col("id").alias("od_id"),
        F.col("order_id").alias("od_order_id"),
        "sku_id",
        "split_total_amount",
        F.timestamp_seconds(F.col("ts")).alias("od_et"),
    )
    cond = (
        (pay.order_id == od.od_order_id)
        & (od.od_et >= pay.pay_et - F.expr("INTERVAL 30 MINUTES"))
        & (od.od_et <= pay.pay_et + F.expr("INTERVAL 5 SECONDS"))
    )
    return pay.join(od, cond).select(
        "od_id", "order_id", "user_id", "sku_id", "payment_type",
        "callback_time", "split_total_amount", pay.ts.alias("ts"),
    )


def lookup_join_dic(df: DataFrame, base_dic: DataFrame, code_col: str, out_col: str) -> DataFrame:
    """J3 — lookup join against dim_base_dic
    (DwdInteractionCommentInfo.java:50-60): broadcast hash join against
    the current dim snapshot replaces the reference's HBase point
    lookups + partial cache (SQLUtil.java:24-36).
    """
    dic = F.broadcast(base_dic.select(
        F.col("dic_code").alias(f"_{out_col}_code"), F.col("dic_name").alias(out_col)
    ))
    return df.join(dic, F.col(code_col) == F.col(f"_{out_col}_code"), "left").drop(
        f"_{out_col}_code"
    )


def comment_info_enriched(db: DataFrame, base_dic: DataFrame) -> DataFrame:
    """DwdInteractionCommentInfo.java:35-60 — comment facts with the
    appraise dic-code resolved via lookup join."""
    d = F.col("data")
    ci = db.filter((F.col("table") == "comment_info") & (F.col("type") == "insert")).select(
        d["id"].alias("id"),
        d["user_id"].alias("user_id"),
        d["sku_id"].alias("sku_id"),
        d["appraise"].alias("appraise"),
        d["comment_txt"].alias("comment_txt"),
        F.col("ts"),
    )
    return lookup_join_dic(ci, base_dic, "appraise", "appraise_name")


def order_refund(db: DataFrame, base_dic: DataFrame) -> DataFrame:
    """P7/J3 — the refund fact job (DWD:trade-order-refund/db/app/
    DwdTradeOrderRefund.java:30-84): order_refund_info inserts joined to
    order_info updates reaching order_status=1005 (with old.order_status
    set — a real transition, not a snapshot), then the double-aliased
    dictionary lookup — dic1 resolves refund_type, dic2 resolves
    refund_reason_type (DwdTradeOrderRefund.java:79-82). Both lookups
    broadcast the same dim once.
    """
    d = F.col("data")
    o = F.col("old")
    ri = db.filter(
        (F.col("table") == "order_refund_info") & (F.col("type") == "insert")
    ).select(
        d["id"].alias("id"),
        d["user_id"].alias("user_id"),
        d["order_id"].alias("order_id"),
        d["sku_id"].alias("sku_id"),
        d["refund_type"].alias("refund_type_code"),
        d["refund_num"].alias("refund_num"),
        d["refund_amount"].alias("refund_amount"),
        d["refund_reason_type"].alias("refund_reason_type_code"),
        d["refund_reason_txt"].alias("refund_reason_txt"),
        d["create_time"].alias("create_time"),
        F.col("ts"),
    )
    oi = db.filter(
        (F.col("table") == "order_info")
        & (F.col("type") == "update")
        & o["order_status"].isNotNull()
        & (d["order_status"] == "1005")
    ).select(d["id"].alias("oi_id"), d["province_id"].alias("province_id"))
    joined = ri.join(oi, ri.order_id == oi.oi_id).drop("oi_id")
    joined = lookup_join_dic(joined, base_dic, "refund_type_code", "refund_type_name")
    joined = lookup_join_dic(
        joined, base_dic, "refund_reason_type_code", "refund_reason_type_name"
    )
    return joined.withColumn("date_id", F.substring("create_time", 1, 10)).select(
        "id", "user_id", "order_id", "sku_id", "province_id", "date_id",
        "create_time", "refund_type_code", "refund_type_name",
        "refund_reason_type_code", "refund_reason_type_name",
        "refund_reason_txt", "refund_num", "refund_amount", "ts",
    )


def dwd_refund_pay_success(db: DataFrame, base_dic: DataFrame) -> DataFrame:
    """P7/J1/J3 — refund-payment success (DWD:trade-refund-pay-suc-detail/
    db/app/DwdTradeRefundPaySucDetail.java:31-96): the 4-way join of
    refund_payment updates reaching refund_status=1602, order_refund_info
    updates reaching refund_status=0705, order_info updates reaching
    order_status=1006, and the payment_type dictionary lookup. Every leg
    requires old.refund_status/order_status IS NOT NULL (true
    transitions).
    """
    d = F.col("data")
    o = F.col("old")
    rp = db.filter(
        (F.col("table") == "refund_payment")
        & (F.col("type") == "update")
        & o["refund_status"].isNotNull()
        & (d["refund_status"] == "1602")
    ).select(
        d["id"].alias("id"),
        d["order_id"].alias("order_id"),
        d["sku_id"].alias("sku_id"),
        d["payment_type"].alias("payment_type_code"),
        d["callback_time"].alias("callback_time"),
        d["total_amount"].alias("refund_amount"),
        F.col("ts"),
    )
    ori = db.filter(
        (F.col("table") == "order_refund_info")
        & (F.col("type") == "update")
        & o["refund_status"].isNotNull()
        & (d["refund_status"] == "0705")
    ).select(
        d["order_id"].alias("ori_order_id"),
        d["sku_id"].alias("ori_sku_id"),
        d["refund_num"].alias("refund_num"),
    )
    oi = db.filter(
        (F.col("table") == "order_info")
        & (F.col("type") == "update")
        & o["order_status"].isNotNull()
        & (d["order_status"] == "1006")
    ).select(
        d["id"].alias("oi_id"),
        d["user_id"].alias("user_id"),
        d["province_id"].alias("province_id"),
    )
    joined = (
        rp.join(ori, (rp.order_id == ori.ori_order_id) & (rp.sku_id == ori.ori_sku_id))
        .join(oi, rp.order_id == oi.oi_id)
        .drop("ori_order_id", "ori_sku_id", "oi_id")
    )
    joined = lookup_join_dic(joined, base_dic, "payment_type_code", "payment_type_name")
    return joined.withColumn("date_id", F.substring("callback_time", 1, 10)).select(
        "id", "user_id", "order_id", "sku_id", "province_id",
        "payment_type_code", "payment_type_name", "date_id", "callback_time",
        "refund_num", "refund_amount", "ts",
    )


# ---------------------------------------------------------------------------
# config-driven dynamic split (the DwdBaseDb pattern)
# ---------------------------------------------------------------------------


def dynamic_split(db: DataFrame, config: DataFrame) -> DataFrame:
    """J5/P5/X2/K2 — config-driven fact routing (DwdBaseDb.java:92-104
    + BaseDbTableProcessFunction.java:22-116): join the stream with the
    broadcast config on (table, type), prune ``data`` to sink_columns,
    and emit ``topic`` = sink_table so one Kafka writer routes
    per-record (FlinkSinkUtil.java:46-67).
    """
    cfg = F.broadcast(
        config.select(
            "source_table",
            "source_type",
            "sink_table",
            F.split("sink_columns", ",").alias("keep_cols"),
        )
    )
    joined = filter_bootstrap(db).join(
        cfg,
        (F.col("table") == cfg.source_table) & (F.col("type") == cfg.source_type),
    )
    pruned = joined.select(
        F.col("sink_table").alias("topic"),
        F.map_filter("data", lambda k, _: F.array_contains(F.col("keep_cols"), k)).alias("data"),
        "type",
        "ts",
    )
    return pruned.withColumn("value", F.to_json("data"))
