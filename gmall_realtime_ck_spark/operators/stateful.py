"""Batch oracles for the reference's keyed-state operators (T1-T7).

The reference implements these with Flink ValueState + TTL
(SURVEY.md §2.6). In batch, each has an exact window-function oracle
(row_number / lag / min-over-partition); the true streaming versions
live in ``gmall_realtime_ck_spark.streaming.state`` and are asserted
batch≡stream in tests.

Scale notes: every operator here is a single shuffle on its state key
(user_id / (user_id, day)) followed by a narrow window computation —
the same partitioning a 1000-executor run would want. No driver-side
collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .relational import date_str, ts_str


def dedup_first_per_key(t: dict[str, DataFrame]) -> DataFrame:
    """T1 — dedup keeping the first record per key. The reference
    retracts-and-replaces on duplicate order_detail ids
    (DWS:trade-sku-order-window/app/DwsTradeSkuOrderWindow.java:196-233,
    state TTL 10 s); Spark's batch oracle is row_number()=1 with a full
    deterministic ordering, streaming is dropDuplicatesWithinWatermark.
    """
    ev = t["events"]
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            ts_str("ts").alias("first_ts"),
        )
    )


def traffic_daily_uv(t: dict[str, DataFrame]) -> DataFrame:
    """T4 — daily unique visitors: uvCt=1 iff first record of the key's
    day (DWS:traffic-vc-ch-ar-is_new-page-view-window/app/
    DwsTrafficVcChArIsNewPageViewWindow.java:62-107, state TTL 1 d).
    Batch oracle noted in SURVEY §2.6: row_number over (mid, day) = 1.
    """
    ev = t["events"]
    day = date_str("ts")
    # summing first-of-day flags per day ≡ distinct keys per day — one
    # partial-aggregating shuffle instead of a row_number sort+shuffle
    return ev.groupBy(day.alias("cur_date")).agg(
        F.countDistinct("user_id").alias("uv_ct")
    )


def returning_users(t: dict[str, DataFrame]) -> DataFrame:
    """T6 — unique + returning users per day: uuCt=1 on first event of
    the day; backCt=1 when the gap since the previous active day is
    ≥ 8 days (DWS:user-user-login-window/app/
    DwsUserUserLoginWindow.java:80-124, 8-day rule :108-111). Oracle via
    lag(active_day) per user.
    """
    ev = t["events"]
    active = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    flagged = active.withColumn("prev_d", F.lag("d").over(w)).withColumn(
        "back",
        (F.col("prev_d").isNotNull() & (F.datediff("d", "prev_d") >= 8)).cast("bigint"),
    )
    return flagged.groupBy(F.date_format("d", "yyyy-MM-dd").alias("cur_date")).agg(
        F.count(F.lit(1)).alias("uu_ct"),
        F.sum("back").alias("back_ct"),
    )


def traffic_new_visitor_repair(t: dict[str, DataFrame]) -> DataFrame:
    """T3 — new/old-visitor repair: a record claiming is_new=1 is
    rewritten to 0 unless it falls on the visitor's true first-visit
    date (DWD:base-log/log/split/DwdBaseLog.java:177-229). Here 'signup'
    events claim newness; the repair keeps only those on the user's
    first active day. Outputs per day: claimed vs repaired counts.
    """
    ev = t["events"]
    w = Window.partitionBy("user_id")
    flagged = (
        ev.withColumn("first_ts", F.min("ts").over(w))
        .withColumn("claimed_new", (F.col("event_type") == "signup").cast("bigint"))
        .withColumn(
            "repaired_new",
            (
                (F.col("event_type") == "signup")
                & (F.to_date("ts") == F.to_date("first_ts"))
            ).cast("bigint"),
        )
    )
    return flagged.groupBy(date_str("ts").alias("cur_date")).agg(
        F.sum("claimed_new").alias("claimed_new_ct"),
        F.sum("repaired_new").alias("repaired_new_ct"),
    )


def trade_cart_add_uu(t: dict[str, DataFrame]) -> DataFrame:
    """T7 — per-day first-action unique users for one action type
    (DWS:trade-cart-add-uu-window/app/DwsTradeCartAddUuWindow.java:67-92):
    count each user's first 'purchase' of the day, per day.
    """
    ev = t["events"].filter(F.col("event_type") == "purchase")
    day = date_str("ts")
    return ev.groupBy(day.alias("cur_date")).agg(
        F.countDistinct("user_id").alias("cart_add_uu_ct")
    )


#: per-(user, day) admission cap for the quota operator
USER_DAY_QUOTA = 2


#: prefix-sum bucket width for the quota rank: a day is a FIXED domain
#: (86 400·10⁶ µs), so the width needs no stats pass — 4096 buckets of
#: ~21.1 s each bound the offset pass at ≤ 4096 rows per (user, day)
#: forever, and a within-bucket window holds one user's events from a
#: ~21-second slice instead of their whole day.
_QUOTA_BUCKET_US = 86_400_000_000 // 4096


def user_event_quota(t: dict[str, DataFrame]) -> DataFrame:
    """Per-key rate limiting: admit at most USER_DAY_QUOTA events per
    (user, day) in deterministic (ts, event_id) order and flag the
    rest — the quota/backpressure screen an ingest layer applies
    per producer (and the batch oracle of the custom stateful
    streaming twin ``streaming.state.user_quota_stream``).

    Scale (r10 — the last data-sized rank-window allowlist entry
    retired): the flag labels EVERY row, so there is no ``rn <= k``
    filter for WindowGroupLimit to push down, and the earlier
    ``row_number`` window sorted each (user, day) partition whole —
    a bot producer emitting 10⁸ events/day funneled through ONE
    reducer, exactly the admission-control hot key this operator
    exists to police. The rank is now the exact distributed
    ``prefix_sum_per_key`` rank (running count of 1s bucketed on
    event-time micros with ``event_id`` tie columns — law-pinned equal
    to the window form incl. ties), with the bucket width fixed from
    the DAY DOMAIN (``_QUOTA_BUCKET_US``): no stats pass, ≤ 4096
    offset rows per user-day, and a hot key's sort shrinks to its
    ~21-second slices.
    """
    from .relational import prefix_sum_per_key

    ev = t["events"]
    day = date_str("ts")
    base = ev.select(
        "user_id",
        "event_id",
        day.alias("cur_date"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_ts_us"),
    ).withColumn("_one", F.lit(1).cast("bigint"))
    ranked = prefix_sum_per_key(
        base,
        ["user_id", "cur_date"],
        "_ts_us",
        "_one",
        "rn",
        bucket_size=_QUOTA_BUCKET_US,
        tie_cols=["event_id"],
    )
    return ranked.select(
        "user_id",
        "event_id",
        "cur_date",
        (F.col("rn") <= USER_DAY_QUOTA).cast("bigint").alias("admitted"),
    )


ORACLES: dict[str, str] = {
    "table_user_quota": f"""
        SELECT user_id, event_id,
               strftime(ts, '%Y-%m-%d') AS cur_date,
               (rn <= {USER_DAY_QUOTA})::BIGINT AS admitted
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
                ORDER BY ts, event_id) AS rn
            FROM events
        )
    """,
    "table_dedup_first_per_key": """
        SELECT user_id, event_type,
               event_id AS first_event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "traffic_daily_uv": """
        SELECT cur_date, COUNT(*) AS uv_ct FROM (
            SELECT strftime(ts, '%Y-%m-%d') AS cur_date,
                   row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d') ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1 GROUP BY cur_date
    """,
    "returning_users": """
        WITH active AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), flagged AS (
            SELECT user_id, d,
                   lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
            FROM active
        )
        SELECT strftime(d, '%Y-%m-%d') AS cur_date,
               COUNT(*) AS uu_ct,
               SUM(CASE WHEN prev_d IS NOT NULL AND date_diff('day', prev_d, d) >= 8 THEN 1 ELSE 0 END)::BIGINT AS back_ct
        FROM flagged GROUP BY 1
    """,
    "traffic_new_visitor_repair": """
        WITH flagged AS (
            SELECT *, min(ts) OVER (PARTITION BY user_id) AS first_ts
            FROM events
        )
        SELECT strftime(ts, '%Y-%m-%d') AS cur_date,
               SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS claimed_new_ct,
               SUM(CASE WHEN event_type = 'signup' AND CAST(ts AS DATE) = CAST(first_ts AS DATE) THEN 1 ELSE 0 END)::BIGINT AS repaired_new_ct
        FROM flagged GROUP BY 1
    """,
    "trade_cart_add_uu": """
        SELECT cur_date, COUNT(*) AS cart_add_uu_ct FROM (
            SELECT strftime(ts, '%Y-%m-%d') AS cur_date,
                   row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d') ORDER BY ts, event_id) AS rn
            FROM events WHERE event_type = 'purchase'
        ) WHERE rn = 1 GROUP BY cur_date
    """,
}

BUILDERS = {
    "table_dedup_first_per_key": dedup_first_per_key,
    "traffic_daily_uv": traffic_daily_uv,
    "returning_users": returning_users,
    "traffic_new_visitor_repair": traffic_new_visitor_repair,
    "trade_cart_add_uu": trade_cart_add_uu,
    "table_user_quota": user_event_quota,
}
