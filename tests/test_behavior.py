"""Structural invariants for the behavior-analytics operators —
properties that must hold at ANY scale factor, complementing the exact
oracle comparison in test_correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_realtime_ck_spark.operators import behavior


def test_funnel_is_monotone(tables):
    rows = {r["stage"]: r["users"] for r in behavior.funnel_conversion(tables).collect()}
    assert set(rows) == {"1_view", "2_click", "3_purchase"}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]
    n_viewers = (
        tables["events"].filter(F.col("event_type") == "view").select("user_id").distinct().count()
    )
    assert rows["1_view"] == n_viewers


def test_rfm_quartiles_are_bounded_and_cover(tables):
    out = behavior.user_rfm_segments(tables)
    rows = out.collect()
    n_buyers = (
        tables["events"].filter(F.col("event_type") == "purchase")
        .select("user_id").distinct().count()
    )
    assert len(rows) == n_buyers
    for r in rows:
        for q in (r["r_quartile"], r["f_quartile"], r["m_quartile"]):
            assert 1 <= q <= 4
        assert r["segment"] == f"{r['r_quartile']}-{r['f_quartile']}-{r['m_quartile']}"
    # value-boundary quartiles: equal metric values share a bucket
    by_freq = {}
    for r in rows:
        by_freq.setdefault(r["freq"], set()).add(r["f_quartile"])
    assert all(len(qs) == 1 for qs in by_freq.values())


def test_mad_outliers_are_a_small_tail(tables):
    ev_ct = tables["events"].count()
    out_ct = behavior.events_anomaly_mad(tables).count()
    assert 0 < out_ct < ev_ct * 0.5  # a screen, not a shredder


def test_funnel_stage_counts_respect_window(tables):
    """Tightening FUNNEL_WINDOW can only shrink stages 2/3."""
    import gmall_realtime_ck_spark.operators.behavior as b

    wide = {r["stage"]: r["users"] for r in b.funnel_conversion(tables).collect()}
    orig = b.FUNNEL_WINDOW
    try:
        b.FUNNEL_WINDOW = "1 HOURS"
        narrow = {r["stage"]: r["users"] for r in b.funnel_conversion(tables).collect()}
    finally:
        b.FUNNEL_WINDOW = orig
    assert narrow["1_view"] == wide["1_view"]
    assert narrow["2_click"] <= wide["2_click"]
    assert narrow["3_purchase"] <= wide["3_purchase"]
