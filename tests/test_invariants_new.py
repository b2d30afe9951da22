"""Scale-independent invariants for the round-3 operator additions —
properties that must hold at ANY data size (the sf0.001 runs here are
representative because nothing in the assertions depends on volume)."""

from __future__ import annotations

import pytest

from gmall_realtime_ck_spark import registry


def _run(tables, name):
    return registry.BUILDERS[name](tables).collect()


def test_markov_stationary_is_distribution(tables):
    rows = _run(tables, "graph_markov_stationary")
    assert rows, "empty stationary vector"
    total = sum(r["pi"] for r in rows)
    assert all(r["pi"] >= 0 for r in rows)
    # power iteration preserves probability mass up to rounding
    assert abs(total - 1.0) < 1e-6, total


def test_permille_scores_are_bounded(tables):
    for name, col in [
        ("text_containment_pairs", "contain_a_permille"),
        ("text_containment_pairs", "contain_b_permille"),
        ("text_ngram_novelty", "novelty_permille"),
        ("sample_dup_weights", "weight_permille"),
    ]:
        for r in _run(tables, name):
            assert 0 <= r[col] <= 1000, (name, col, r[col])


def test_e2e_verdict_keep_is_conjunction(tables):
    for r in _run(tables, "corpus_e2e_verdict"):
        reasons = (
            r["reason_quality"], r["reason_exact_dup"],
            r["reason_neardup"], r["reason_contaminated"],
        )
        assert r["keep"] == (1 if not any(reasons) else 0), r


def test_scd2_ranges_chain_and_one_current(tables):
    """Per key: validity ranges are disjoint and ordered, and at most
    one version is current (none iff a trailing delete closed it)."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in _run(tables, "table_scd2_history"):
        by_key[r["o_orderkey"]].append(r)
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r["valid_from"])
        assert sum(r["is_current"] for r in rows) <= 1, key
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] is not None and a["valid_to"] <= b["valid_from"], key


def test_quota_never_admits_more_than_cap(tables):
    from collections import Counter

    from gmall_realtime_ck_spark.operators.stateful import USER_DAY_QUOTA

    admitted = Counter()
    for r in _run(tables, "table_user_quota"):
        if r["admitted"] == 1:
            admitted[(r["user_id"], r["cur_date"])] += 1
    assert admitted and max(admitted.values()) <= USER_DAY_QUOTA


def test_temperature_weights_sum_to_one(tables):
    rows = _run(tables, "sample_temperature_mixture")
    assert rows
    assert abs(sum(r["temp_weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    # τ < 1 compresses: small sources gain weight relative to share
    smallest = min(rows, key=lambda r: r["n_docs"])
    largest = max(rows, key=lambda r: r["n_docs"])
    if smallest["n_docs"] < largest["n_docs"]:
        assert smallest["temp_weight"] >= smallest["share"]
        assert largest["temp_weight"] <= largest["share"]


def test_label_outliers_rate_and_nonnegativity(tables):
    from collections import Counter

    rows = _run(tables, "embedding_label_outliers")
    assert rows
    per_label = Counter()
    flagged = Counter()
    for r in rows:
        assert r["dist_micro2"] >= 0
        per_label[r["label"]] += 1
        flagged[r["label"]] += r["is_outlier"]
    for lbl, n in per_label.items():
        # p99 threshold admits at most ~1% + interpolation slack
        assert flagged[lbl] <= max(1, int(0.02 * n)), (lbl, flagged[lbl], n)
