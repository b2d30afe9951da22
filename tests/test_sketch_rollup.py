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


def test_quantile_rollup_bounds_exact_percentiles(spark):
    """ts_quantile_rollup's lower-edge estimates must bracket the exact
    weekly percentile within one bin width — the histogram-sketch error
    contract (and, unlike HLL, the merge itself is deterministic, which
    is why the query is fully hash-oracled)."""
    from gmall_realtime_ck_spark.operators.timeseries import (
        QH_BIN_CENTS,
        ts_quantile_rollup,
    )

    tables = load_tables(spark, SF)
    est = {r["week"]: r for r in ts_quantile_rollup(tables).collect()}
    assert est

    # the rollup's rank rule is nearest-rank (the smallest value whose
    # cumulative count clears ceil(q·n)) — compare against exactly that
    ev = tables["events"].select(
        F.date_format(F.date_trunc("week", F.to_date("ts")), "yyyy-MM-dd").alias("week"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    exact = {
        r["week"]: r
        for r in ev.groupBy("week")
        .agg(F.expr("sort_array(collect_list(cents))").alias("vals"))
        .select(
            "week",
            F.expr("element_at(vals, cast(ceil(size(vals) * 0.5) as int))").alias("p50"),
            F.expr("element_at(vals, cast(ceil(size(vals) * 0.9) as int))").alias("p90"),
            F.expr("element_at(vals, cast(ceil(size(vals) * 0.99) as int))").alias("p99"),
        )
        .collect()
    }
    assert set(est) == set(exact)
    for week, e in est.items():
        x = exact[week]
        for q in ("p50", "p90", "p99"):
            lb = e[f"{q}_cents_lb"]
            # the exact nearest-rank value lies INSIDE the estimate's
            # bin: [lower_edge, lower_edge + width)
            assert lb <= x[q] < lb + QH_BIN_CENTS, (week, q, lb, x[q])
