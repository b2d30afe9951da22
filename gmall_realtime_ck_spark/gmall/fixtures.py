"""Deterministic gmall-shaped fixture generators (FIXTURES.md).

Builds the Maxwell CDC stream (topic_db), the nested behavior-log
stream (topic_log, with ~1% dirty lines), and the config tables, as
lists of JSON strings / rows — consumable by both batch
(``spark.createDataFrame``) and streaming (file source) paths.

Volumes are test-sized; the generator is seeded and wall-clock-free so
goldens are stable. Timestamps span two days (exercises day-boundary
UV/TTL logic) plus a few ≥8-day backdated events for the
returning-user rule (DwsUserUserLoginWindow.java:108-111).
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone

# All gmall date math is UTC+8 (COMMON/util/DateFormatUtil.java:28).
CST = timezone(timedelta(hours=8))
DAY0 = datetime(2024, 11, 24, 0, 0, 0, tzinfo=CST)

PAGE_IDS = ["home", "good_detail", "search", "login", "cart", "order", "payment", "mine"]
CHANNELS = ["xiaomi", "huawei", "oppo", "vivo", "appstore", "web"]
KEYWORDS = ["图书", "手机", "平板电视", "小米", "苹果", "book phone", "tv"]
DIC_APPRAISE = ["1201", "1202", "1203", "1204"]


def _epoch_ms(dt: datetime) -> int:
    return int(dt.timestamp() * 1000)


def _fmt(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%d %H:%M:%S")


def gen_log_lines(n_events: int = 2000, seed: int = 42, dirty_ratio: float = 0.01) -> list[str]:
    """topic_log JSON lines (F2): nested common/page/start/err/displays/
    actions, ts in epoch ms; ~5% of is_new deliberately mislabeled
    (exercises T3 repair); ~1% garbage lines (K10 dirty side output).
    """
    rng = random.Random(seed)
    first_day: dict[str, int] = {}
    lines: list[str] = []
    for i in range(n_events):
        if rng.random() < dirty_ratio:
            lines.append(f"@@not-json-{i}@@")
            continue
        mid = f"mid_{rng.randrange(120)}"
        # a few devices whose history started >= 8 days ago
        day = rng.choice([0, 0, 0, 1, 1]) if mid not in ("mid_1", "mid_2") else rng.choice([-9, 0, 1])
        ts = DAY0 + timedelta(days=day, seconds=rng.randrange(86400))
        day_idx = (ts - DAY0).days
        seen = first_day.setdefault(mid, day_idx)
        truly_new = day_idx == seen
        is_new = "1" if truly_new else "0"
        if rng.random() < 0.05:  # mislabel
            is_new = "0" if is_new == "1" else "1"
        page_id = rng.choice(PAGE_IDS)
        last = rng.choice([None, "home", "search", "login", "good_detail"])
        ev: dict = {
            "common": {
                "mid": mid,
                "uid": str(rng.randrange(400)) if rng.random() < 0.7 else None,
                "vc": f"v2.1.{rng.randrange(3)}",
                "ch": rng.choice(CHANNELS),
                "ar": str(rng.randrange(1, 35)),
                "is_new": is_new,
                "ba": "phone",
                "md": "model-x",
                "os": "android",
                "sid": f"sid_{i}",
            },
            "page": {
                "page_id": page_id,
                "last_page_id": last,
                "item": rng.choice(KEYWORDS) if page_id == "search" else None,
                "item_type": "keyword" if page_id == "search" else None,
                "during_time": rng.randrange(1000, 20000),
            },
            "ts": _epoch_ms(ts),
        }
        if page_id == "search" and last not in ("search", "home"):
            ev["page"]["last_page_id"] = rng.choice(["search", "home"])
        if rng.random() < 0.1:
            ev["start"] = {"entry": "icon", "loading_time": rng.randrange(500, 3000),
                           "open_ad_id": str(rng.randrange(10)), "open_ad_ms": 100,
                           "open_ad_skip_ms": 0}
        if rng.random() < 0.05:
            ev["err"] = {"error_code": str(rng.randrange(1000, 1010)), "msg": "boom"}
        if rng.random() < 0.3:
            ev["displays"] = [
                {"item": str(rng.randrange(35)), "item_type": "sku_id",
                 "pos_id": str(p), "order": str(p)}
                for p in range(rng.randrange(1, 4))
            ]
        if rng.random() < 0.2:
            ev["actions"] = [
                {"action_id": rng.choice(["cart_add", "favor_add"]),
                 "item": str(rng.randrange(35)), "item_type": "sku_id",
                 "ts": _epoch_ms(ts) + 500}
            ]
        lines.append(json.dumps(ev, ensure_ascii=False))
    return lines


def _env(table: str, typ: str, ts: datetime, data: dict, old: dict | None = None) -> str:
    env = {
        "database": "gmall",
        "table": table,
        "type": typ,
        "ts": int(ts.timestamp()),
        "data": {k: (None if v is None else str(v)) for k, v in data.items()},
    }
    if old is not None:
        env["old"] = {k: str(v) for k, v in old.items()}
    return json.dumps(env, ensure_ascii=False)


def gen_topic_db_lines(n_orders: int = 300, seed: int = 43) -> list[str]:
    """topic_db Maxwell envelopes (F1): order_info lifecycle
    (1001→1002→1003/1004/1005/1006), order_detail (+activity/coupon
    legs), cart_info with sku_num updates (incl. decreases),
    comment_info, payment_info (→1602), plus dim-table inserts and a
    few bootstrap-inserts that must be filtered by DWD (P3).
    """
    rng = random.Random(seed)
    lines: list[str] = []

    for sku in range(35):
        lines.append(_env("sku_info", "bootstrap-insert", DAY0, {
            "id": sku, "spu_id": sku // 3, "price": f"{(sku + 1) * 100}.00",
            "sku_name": f"sku-{sku}", "tm_id": sku % 8, "category3_id": sku % 6 + 1,
        }))
    detail_id = 0
    for oid in range(n_orders):
        t0 = DAY0 + timedelta(days=rng.choice([0, 0, 1]), seconds=rng.randrange(82800))
        user = rng.randrange(400)
        prov = rng.randrange(1, 35)
        n_det = rng.randrange(1, 4)
        total = 0.0
        lines.append(_env("order_info", "insert", t0, {
            "id": oid, "user_id": user, "province_id": prov,
            "order_status": "1001", "create_time": _fmt(t0), "operate_time": None,
            "total_amount": "0",
        }))
        for _ in range(n_det):
            detail_id += 1
            sku = rng.randrange(35)
            num = rng.randrange(1, 5)
            price = (sku + 1) * 100.0
            split_total = price * num * 0.9
            total += split_total
            lines.append(_env("order_detail", "insert", t0, {
                "id": detail_id, "order_id": oid, "sku_id": sku,
                "sku_name": f"sku-{sku}", "create_time": _fmt(t0),
                "source_id": None, "source_type": "2401", "sku_num": num,
                "order_price": f"{price:.2f}",
                "split_total_amount": f"{split_total:.2f}",
                "split_activity_amount": f"{price * num * 0.1:.2f}" if rng.random() < 0.3 else "0.0",
                "split_coupon_amount": f"{price * num * 0.05:.2f}" if rng.random() < 0.2 else "0.0",
            }))
            if rng.random() < 0.3:
                lines.append(_env("order_detail_activity", "insert", t0, {
                    "order_detail_id": detail_id, "order_id": oid,
                    "activity_id": rng.randrange(1, 6), "activity_rule_id": rng.randrange(1, 12),
                }))
            if rng.random() < 0.2:
                lines.append(_env("order_detail_coupon", "insert", t0, {
                    "order_detail_id": detail_id, "order_id": oid,
                    "coupon_id": rng.randrange(1, 8),
                }))
        # lifecycle transitions
        t1 = t0 + timedelta(seconds=rng.randrange(30, 600))
        r = rng.random()
        if r < 0.15:  # cancel (1001→1003)
            lines.append(_env("order_info", "update", t1,
                              {"id": oid, "order_status": "1003", "operate_time": _fmt(t1)},
                              {"order_status": "1001"}))
        elif r < 0.8:  # pay (1001→1002), payment_info success
            lines.append(_env("order_info", "update", t1,
                              {"id": oid, "order_status": "1002", "operate_time": _fmt(t1)},
                              {"order_status": "1001"}))
            lines.append(_env("payment_info", "update", t1, {
                "id": oid, "order_id": oid, "user_id": user,
                "payment_type": rng.choice(["1101", "1102", "1103"]),
                "payment_status": "1602", "callback_time": _fmt(t1),
                "total_amount": f"{total:.2f}",
            }, {"payment_status": "1601"}))
        if rng.random() < 0.1:  # cart activity
            cid = 10000 + oid
            old_num = rng.randrange(1, 4)
            new_num = old_num + rng.choice([-1, 1, 2])
            lines.append(_env("cart_info", "insert", t0, {
                "id": cid, "user_id": user, "sku_id": rng.randrange(35), "sku_num": old_num,
            }))
            lines.append(_env("cart_info", "update", t1, {
                "id": cid, "user_id": user, "sku_id": rng.randrange(35), "sku_num": new_num,
            }, {"sku_num": old_num}))
        if rng.random() < 0.15:
            lines.append(_env("comment_info", "insert", t1, {
                "id": 50000 + oid, "user_id": user, "sku_id": rng.randrange(35),
                "appraise": rng.choice(DIC_APPRAISE), "comment_txt": "不错 good",
                "create_time": _fmt(t1),
            }))
        if rng.random() < 0.05:  # garbage from another database — P2 must drop
            lines.append(json.dumps({"database": "other_db", "table": "order_info",
                                     "type": "insert", "ts": int(t1.timestamp()),
                                     "data": {"id": "x"}}))
    return lines


def gen_refund_lines(n_orders: int = 300, seed: int = 47) -> list[str]:
    """Refund-lifecycle envelopes (DwdTradeOrderRefund.java:30-55,
    DwdTradeRefundPaySucDetail.java:31-75): for a subset of orders,
    order_refund_info insert + order_info 1002→1005; for a sub-subset the
    refund completes — refund_payment 1601→1602, order_refund_info
    0702→0705, order_info 1005→1006. Also emits near-miss rows that the
    DWD predicates must reject: order_status=1005 snapshots with no
    ``old`` (not a transition) and refund_payment stuck at 1601.

    Separate generator (own seed) so the ``gen_topic_db_lines`` golden
    sequence is untouched.
    """
    rng = random.Random(seed)
    lines: list[str] = []
    for oid in range(n_orders):
        if rng.random() >= 0.2:  # most orders never refund
            continue
        t0 = DAY0 + timedelta(days=rng.choice([0, 0, 1]), seconds=rng.randrange(80000))
        user = rng.randrange(400)
        prov = rng.randrange(1, 35)
        sku = rng.randrange(35)
        rid = 70000 + oid
        amount = f"{rng.randrange(100, 5000)}.00"
        lines.append(_env("order_refund_info", "insert", t0, {
            "id": rid, "user_id": user, "order_id": oid, "sku_id": sku,
            "refund_type": rng.choice(["1501", "1502"]),
            "refund_num": rng.randrange(1, 4), "refund_amount": amount,
            "refund_reason_type": rng.choice(["1301", "1302", "1303", "1304", "1305", "1306", "1307"]),
            "refund_reason_txt": "质量问题 not as described",
            "create_time": _fmt(t0), "refund_status": "0701",
        }))
        lines.append(_env("order_info", "update", t0,
                          {"id": oid, "user_id": user, "province_id": prov,
                           "order_status": "1005", "operate_time": _fmt(t0)},
                          {"order_status": "1002"}))
        if rng.random() < 0.1:  # near-miss: 1005 snapshot without old → must be rejected
            lines.append(_env("order_info", "update", t0,
                              {"id": 90000 + oid, "province_id": prov, "order_status": "1005"}))
        t1 = t0 + timedelta(seconds=rng.randrange(60, 3600))
        pay_type = rng.choice(["1101", "1102", "1103"])
        if rng.random() < 0.6:  # refund completes
            lines.append(_env("refund_payment", "update", t1, {
                "id": rid, "order_id": oid, "sku_id": sku, "payment_type": pay_type,
                "refund_status": "1602", "callback_time": _fmt(t1),
                "total_amount": amount,
            }, {"refund_status": "1601"}))
            lines.append(_env("order_refund_info", "update", t1,
                              {"id": rid, "order_id": oid, "sku_id": sku,
                               "refund_num": "1", "refund_status": "0705"},
                              {"refund_status": "0702"}))
            lines.append(_env("order_info", "update", t1,
                              {"id": oid, "user_id": user, "province_id": prov,
                               "order_status": "1006", "operate_time": _fmt(t1)},
                              {"order_status": "1005"}))
        else:  # refund stuck mid-flight — must not reach the success fact
            lines.append(_env("refund_payment", "update", t1, {
                "id": rid, "order_id": oid, "sku_id": sku, "payment_type": pay_type,
                "refund_status": "1601", "callback_time": _fmt(t1),
                "total_amount": amount,
            }, {"refund_status": "1601"}))
    return lines


#: refund-related base_dic rows (kept separate: goldens over
#: BASE_DIC_ROWS predate the refund chain)
REFUND_DIC_ROWS = [
    ("1501", "退货"), ("1502", "仅退款"),
    ("1301", "质量问题"), ("1302", "商品描述与实际描述不一致"), ("1303", "缺货"),
    ("1304", "号码不合适"), ("1305", "拍错"), ("1306", "不想买了"), ("1307", "其他"),
]


#: table_process_dim config rows (F3 — TableProcessDim.java:15-33)
TABLE_PROCESS_DIM_ROWS = [
    ("sku_info", "dim_sku_info", "id,spu_id,price,sku_name,tm_id,category3_id", "info", "id"),
    ("base_trademark", "dim_base_trademark", "id,tm_name", "info", "id"),
    ("base_province", "dim_base_province", "id,name,region_id,area_code,iso_code", "info", "id"),
    ("base_dic", "dim_base_dic", "dic_code,dic_name", "info", "dic_code"),
]

#: table_process_dwd config rows (F3 — DwdBaseDb.java:101)
TABLE_PROCESS_DWD_ROWS = [
    ("cart_info", "insert", "dwd_trade_cart_add", "id,user_id,sku_id,sku_num"),
    ("comment_info", "insert", "dwd_interaction_comment_info", "id,user_id,sku_id,appraise,comment_txt,create_time"),
    ("favor_info", "insert", "dwd_interaction_favor_add", "id,user_id,sku_id,create_time"),
]

BASE_DIC_ROWS = [
    ("1101", "支付宝"), ("1102", "微信"), ("1103", "银联"),
    ("1201", "好评"), ("1202", "中评"), ("1203", "差评"), ("1204", "自动"),
    ("2401", "用户查询"), ("2402", "商品推广"),
]
