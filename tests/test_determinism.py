"""Cross-run determinism: queries whose plans involve
order-sensitive constructs (collect_list renders, driver-collected
centroid literals, hash-ordered sampling, iterative propagation) must
produce identical results on repeated execution — the property the
oracle gate checks only indirectly (one run vs DuckDB) and the one
nondeterministic Spark idioms (unsorted collect_list, first() without
ordering) silently break."""

from __future__ import annotations

import pytest

from gmall_realtime_ck_spark import registry

RISKY = [
    "behavior_top_paths",       # collect_list → array_sort render
    "embedding_kmeans_assign",  # driver-collected centroid literals
    "embedding_pq_codes",       # per-subspace argmin over literals
    "sample_weighted_priority", # TakeOrdered + hash priorities
    "text_neardup_clusters",    # iterative label propagation
    "corpus_bpe_pair_counts",   # vocab explode + global top-K
    "table_cdc_snapshot_merge", # max_by argmax over struct
    "diag_key_skew",            # top-N + broadcast stats
    "graph_markov_stationary",  # driver-scalar n + iterative joins
    "sample_temperature_mixture",  # two 1-row scalar broadcasts
    "simhash_pair_search",      # checkpointed fingerprint self-join
    "join_temporal_dim_version",  # window + residual-range join
    "ann_pq_adc_topk",          # driver-collected LUTs + per-batch top-k
    "ann_ivf_pq_topk",          # probe selection + per-batch top-k
    "sample_bloom_contamination",  # driver-collected filter words literal
    "text_dedup_keep_best",     # min(struct) argmin + join back
    "sample_dsir_weights",      # full-outer ratio join + rounded float sum
]


@pytest.mark.parametrize("name", RISKY)
def test_same_result_twice(tables, name):
    a = sorted(tuple(r) for r in registry.BUILDERS[name](tables).collect())
    b = sorted(tuple(r) for r in registry.BUILDERS[name](tables).collect())
    assert a == b, f"{name} is nondeterministic across runs"
