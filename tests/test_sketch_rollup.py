"""Accuracy + mergeability contract for the HLL sketch rollup
(relational.approx_uv_sketch_rollup, declared rows-only): the weekly
estimate from MERGED daily sketches must (a) track the exact weekly
distinct count within HLL's error envelope and (b) equal sketching the
week directly — the re-aggregatability property that makes sketches
the 100 TB distinct-count answer."""

from __future__ import annotations

import pyspark.sql.functions as F

from gmall_realtime_ck_spark.catalog import load_tables
from gmall_realtime_ck_spark.operators.relational import approx_uv_sketch_rollup

SF = "/root/testdata/sf0.001"


def test_sketch_rollup_tracks_exact_and_merges_losslessly(spark):
    tables = load_tables(spark, SF)
    est = {r["week"]: r["uv_est"] for r in approx_uv_sketch_rollup(tables).collect()}

    ev = tables["events"].select(F.to_date("ts").alias("day"), "user_id")
    exact = {
        r["week"]: r["uv"]
        for r in ev.groupBy(
            F.date_format(F.date_trunc("week", F.col("day")), "yyyy-MM-dd").alias("week")
        )
        .agg(F.countDistinct("user_id").alias("uv"))
        .collect()
    }
    assert set(est) == set(exact)
    for wk, uv in exact.items():
        # default lgConfigK=12 → relative error ~1.6%; allow 5%
        assert abs(est[wk] - uv) <= max(3, 0.05 * uv), (wk, est[wk], uv)

    # mergeability: union of daily sketches == sketching the week directly
    direct = {
        r["week"]: r["uv_est"]
        for r in ev.groupBy(
            F.date_format(F.date_trunc("week", F.col("day")), "yyyy-MM-dd").alias("week")
        )
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("uv_est"))
        .collect()
    }
    assert est == direct
