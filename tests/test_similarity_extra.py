"""Cross-variant ANN consistency: the Arrow block-matmul path must
agree with the exact HOF path on non-degenerate data."""

from __future__ import annotations

from gmall_realtime_ck_spark.operators import similarity as sim


def test_pandas_topk_agrees_with_exact(tables):
    exact = {
        (r["q_id"], r["rank"]): r["neighbor_id"] for r in sim.cosine_topk(tables).collect()
    }
    fast = {
        (r["q_id"], r["rank"]): r["neighbor_id"]
        for r in sim.cosine_topk_pandas(tables).collect()
    }
    assert exact == fast


def test_ivf_is_subset_quality(tables):
    """Multi-probe IVF: ranks per query are contiguous from 1, at most
    TOP_K, deterministic across runs, and every neighbor is a real
    corpus vector distinct from its query."""
    out = sim.cosine_topk_ivf(tables).collect()
    per_q = {}
    for r in out:
        assert r["neighbor_id"] != r["q_id"]
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= sim.TOP_K
    again = {(r["q_id"], r["rank"]): r["neighbor_id"]
             for r in sim.cosine_topk_ivf(tables).collect()}
    assert again == {(r["q_id"], r["rank"]): r["neighbor_id"] for r in out}
