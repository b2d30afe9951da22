"""Serving layer — the publisher REST endpoints as Spark SQL.

The reference serves dashboards from Doris/ClickHouse via Spring Boot +
MyBatis (PUB/controller/TradeStatsController.java:29-88,
TrafficStatsController.java:27-50); here the same three queries run as
Spark SQL over the date-partitioned DWS output tables, with the
controller's default-date behavior (today when unspecified,
TradeStatsController.java:32-35). ``WHERE cur_date = ?`` prunes to one
partition of the DWS store (the reference's PARTITION parYYYYMMDD).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _default_date() -> str:
    """Today in UTC+8, like DateFormatUtil (zone at :28)."""
    return datetime.now(timezone(timedelta(hours=8))).strftime("%Y-%m-%d")


def _norm_date(date) -> str:
    """Accept the controller's yyyyMMdd (?date=20241128,
    TradeStatsController.java:29-35), ISO yyyy-MM-dd, and date objects
    (parquet partition columns read back as DATE)."""
    if not date:
        return _default_date()
    date = date.isoformat() if hasattr(date, "isoformat") else str(date)
    if len(date) == 8 and date.isdigit():
        return f"{date[0:4]}-{date[4:6]}-{date[6:8]}"
    return date


def load_dws(spark: SparkSession, path: str) -> DataFrame:
    """A DWS output table written by sinks.jdbc.parquet_batch_writer
    (date-partitioned parquet)."""
    return spark.read.parquet(path)


def gmv(province_window: DataFrame, date: str | None = None) -> DataFrame:
    """GET /gmv?date=… (TradeStatsMapper.java:27)."""
    d = _norm_date(date)
    return (
        province_window.filter(F.col("cur_date") == d)
        .agg(F.sum("order_amount").alias("gmv"))
    )


def province_amounts(province_window: DataFrame, date: str | None = None) -> DataFrame:
    """GET /province?date=… (TradeStatsMapper.java:31)."""
    d = _norm_date(date)
    return (
        province_window.filter(F.col("cur_date") == d)
        .groupBy("province_name")
        .agg(F.sum("order_amount").alias("total_amount"))
        .orderBy("total_amount")
    )


def channel_uv_topk(traffic_window: DataFrame, date: str | None = None, limit: int = 5) -> DataFrame:
    """GET /ch?date=…&limit=… (TrafficStatsMapper.java:24)."""
    d = _norm_date(date)
    return (
        traffic_window.filter(F.col("cur_date") == d)
        .groupBy("ch")
        .agg(F.sum("uv_ct").alias("uv_ct"))
        .orderBy(F.desc("uv_ct"), F.asc("ch"))
        .limit(limit)
    )


def dp_card_for_day(dp_card: DataFrame, date: str | None = None) -> DataFrame:
    """GET /dp?date=… — the DP-release dashboard card (r11): the
    ``/province`` mapData shape (TradeStatsController.java:54-88)
    rendered from the RELEASED noisy counts (operators.privacy.
    dp_release_card), so the dashboard layer never sees raw counts.
    Same date-pruning posture as the other endpoints: one day's
    release cells."""
    d = _norm_date(date)
    return dp_card.filter(F.col("day") == d).orderBy("rk")


def as_dashboard_json(df: DataFrame) -> list[dict]:
    """The controller's hand-built JSON rows
    (TradeStatsController.java:46-49,73-88) — driver-side only at
    serving time (results are already aggregated/small)."""
    return [row.asDict() for row in df.collect()]
