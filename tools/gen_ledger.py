#!/usr/bin/env python
"""Regenerate COVERAGE.md's cross-round driver-row ledger from the
CORRECTNESS_r0N.json files + the registry. Run after adding queries or
when a new CORRECTNESS file lands:

    python tools/gen_ledger.py

The queue sets below track each round's rotation; update them when the
window rotates (tests/test_correctness.py::test_ledger_queue_names_resolve
pins them to declared names).
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

#: r1-era re-certs deferred from the round-6 rotation (the 17 mandatory
#: names squeezed the 37-name r1-latest re-cert pool down to 33 slots;
#: these 4 lowest-risk map-only ops go first in the round-7 window).
R7_HEAD = {
    "repetition_ratio",
    "text_bigram_topk",
    "text_feature_hashing",
    "source_overlap",
}

#: declared queries RETIRED from the registry (their functions survive
#: as test-only law fixtures; historical driver rows stay in the
#: CORRECTNESS files). r10: the full-vocabulary Zipf pair — the one
#: plan whose per-source rank window sorted an entire vocabulary
#: through one reducer (VERDICT r9 "what's wrong" #1); superseded by
#: the declared head-slice pair text_zipf_topn_fit / flow_zipf_topn.
RETIRED = {
    "text_zipf_fit",
    "flow_zipf",
}

#: operators added DURING round 10 (after its window froze at rotation)
#: — the seed of the round-11 rotation; each ships with oracle +
#: invariant/stream tests + sf0.001/sf0.01/sf0.1 vanilla preflights in
#: its own commit.
R11_QUEUE = {
    "privacy_dp_counts",
    "flow_dp_counts",
    "events_retention_cohorts",
    "flow_retention_cohorts",
}

#: operators added DURING round 11 (after its window froze at rotation)
#: — the seed of the round-12 rotation; each ships with oracle +
#: invariant tests + sf0.001/sf0.01/sf0.1 vanilla preflights in its
#: own commit. The card pair is the publisher drill-through over the
#: DP release (r10 VERDICT #7): the /province-style per-day top-K card
#: rendered from RELEASED noisy counts only; flow_rfm_segments is the
#: live RFM twin whose poll derives quartile boundaries fully in-plan;
#: flow_dp_release_closed is the release-once (append-mode) DP twin.
R12_QUEUE = {
    "privacy_dp_release_card",
    "flow_dp_release_card",
    "flow_rfm_segments",
    "flow_dp_release_closed",
}

#: operators added DURING round 12 (after its window froze at rotation)
#: — the seed of the round-13 rotation; each ships with oracle +
#: invariant tests + sf0.001/sf0.01/sf0.1 vanilla preflights in its
#: own commit.
R13_QUEUE: set[str] = {
    "text_line_dedup",
    "flow_dup_lines",
    "sample_token_budget",
    "flow_token_budget",
    "events_decayed_engagement",
    "flow_decayed_engagement",
    "corpus_pack_efficiency",
}

#: operators added DURING round 13 (after its window froze at rotation)
#: — the seed of the round-14 rotation; each ships with oracle +
#: invariant tests + sf0.001/sf0.01/sf0.1 vanilla preflights in its
#: own commit. flow_dup_lines_snapshot is the VERDICT r12 #6 bounded-
#: serving blacklist changelog (upd = the monotone occurrence count,
#: compact_latest_snapshot serving view); the shuffle-order pair is
#: the deterministic global training-order manifest (no-key two-level
#: rank — no single-reducer ORDER BY window).
R14_QUEUE: set[str] = {
    "flow_dup_lines_snapshot",
    "corpus_shuffle_order",
    "flow_shuffle_order",
    "corpus_vocab_coverage",
    "corpus_truncation_waste",
}

#: queries REWIRED during round 12 AFTER their fresh r11 driver rows —
#: flow_repetition's ≥1-shingle row filter moved from the shingle
#: array to the equivalent token count (size(tk) >= 3): the sha-form
#: predicate was pushdown-substituted through both projections,
#: planting the tokenizer split inside the shingle lambda (per-element
#: re-evaluation; 5.8 → 1.3 s at sf0.1, hash-identical). Slotted into
#: the r12 window itself (the R11_REWIRED precedent — invalid evidence
#: outranks merely-stale evidence), evicting the last r7-era re-cert
#: (dws_user_register_window, which rotates r13 instead).
R12_REWIRED = {
    "flow_repetition",
}

#: queries REWIRED during round 11 AFTER their fresh r10 driver rows —
#: the MAD screen pair (histogram-state streaming twin, linearized
#: threshold tree, keyed in-plan percentile stats — r10 VERDICT #2)
#: and the RFM segmentation (one stacked (metric, value) histogram
#: pass with per-metric Column width/origin — r10 VERDICT #4 +
#: ADVICE #3); all three sit in the r11 window for re-certification.
R11_REWIRED = {
    "events_anomaly_mad",
    "flow_anomaly_mad",
    "user_rfm_segments",
}

#: the 19 r5-era re-certs the round-10 rotation deferred (its 33
#: re-cert slots ran out 19 short — r10 VERDICT "what's missing" #1);
#: mandatory in the round-11 window.
R11_RECERT_R5 = {
    "layout_compaction_bins",
    "privacy_l_diversity",
    "privacy_pseudonymize",
    "privacy_t_closeness",
    "sample_bloom_contamination",
    "sample_dsir_weights",
    "source_minhash_jaccard",
    "text_dedup_keep_best",
    "text_langid_ngram",
    "text_rake_keyphrases",
    "traffic_bounce_rate",
    "ts_cusum_changepoints",
    "ts_open_lines_daily",
    "ts_quantile_rollup",
    "ts_series_similarity",
    "win_wow_change",
    "xmodal_audio_windows",
    "xmodal_frame_sample",
    "xmodal_media_stats",
}

#: operators added DURING round 9 (after its window froze at rotation)
#: — the seed of the round-10 rotation; each ships with oracle +
#: invariant/stream tests + sf0.001/sf0.01/sf0.1 vanilla preflights in
#: its own commit.
R10_QUEUE = {
    "text_zipf_topn_fit",
    "flow_zipf_topn",
    "corpus_heaps_law",
    "corpus_pack_sequences",
}

#: queries REWIRED by the late-round-9 state-bounding sweep (head-
#: sliced collects, distributed histogram percentiles, closed-form
#: ntile/percent_rank/cume_dist over prefix-sum ranks) AFTER their
#: latest driver hash rows — results law-pinned identical and green in
#: the round's both-scale full-surface sweeps, but their standing
#: driver evidence predates the new code, so the round-10 rotation
#: should place these right after R10_QUEUE, ahead of the stalest
#: cohort. (Names already inside the r9 window — behavior_top_paths,
#: corpus_inverted_index, corpus_length_percentiles,
#: embedding_label_outliers, flow_percentiles — get fresh r9 rows and
#: are excluded.)
R10_RECERT_REWIRED = {
    "event_value_percentiles",
    "ship_latency_percentiles",
    "events_dwell_median",
    "events_anomaly_mad",
    "flow_anomaly_mad",
    "user_rfm_segments",
    "text_novelty_decay",
    "text_ccnet_buckets",
    "flow_ccnet_gate",
    "win_supplier_percentiles",
    "win_ntile_deciles",
}

#: operators added DURING round 8 (after its window froze at rotation)
#: — the head of the round-9 window; each shipped with oracle +
#: invariant/stream tests + sf0.001/sf0.01/sf0.1 vanilla preflights in
#: its own commit (and was independently re-driven by the r8 judge at
#: sf0.01 AND sf0.1: 8/8 hash-green).
R9_QUEUE = {
    "corpus_dup_inflation",
    "sample_epoch_schedule",
    "flow_domain_cap",
    "flow_epoch_schedule",
}

#: operators added AFTER the round-7 window froze — now the head of the
#: round-8 window (the r7 window was fully booked by R7_HEAD +
#: R7_QUEUE + the 39 r2-era re-certs; all 4 names preflighted
#: hash-green at sf0.001/sf0.01/sf0.1 on vanilla sessions, r7, and
#: independently re-verified by the r7 judge).
R8_QUEUE = {
    "approx_overlap_kmv",
    "approx_join_keys_kmv",
    "flow_overlap_kmv",
    "flow_simpson_diversity",
}

#: operators added AFTER the round-6 window froze — they queue behind
#: R7_HEAD in the round-7 rotation.
R7_QUEUE = {
    "text_readability",
    "corpus_simpson_diversity",
    "flow_readability",
    "corpus_leakage_safe_split",
    "approx_uv_kmv",
    "approx_uv_kmv_rollup",
    "flow_kmv",
}

R6_HEAD = {
    "corpus_token_gini",
    "text_zipf_fit",
    "flow_token_gini",
    "ship_latency_percentiles",
    "flow_zipf",
    "path_transition_entropy",
    "corpus_hapax_share",
}

#: operators added AFTER the round-5 window froze — seed of the round-6
#: rotation (behind the frozen R6_HEAD spillovers).
R6_QUEUE = {
    "text_ccnet_buckets",
    "corpus_tokenizer_fertility",
    "sample_contaminated_spans",
    "flow_tokenizer_fertility",
    "xmodal_phash_neardup",
    "embedding_recall_at_k",
    "flow_ccnet_gate",
    "flow_repetition",
}

R5_QUEUE = {
    "embedding_sq8_codes",
    "ann_label_precision",
    "text_rake_keyphrases",
    "privacy_l_diversity",
    "flow_sq8_encode",
    "ts_quantile_rollup",
    "embedding_centroid_drift",
    "text_langid_ngram",
    "ts_series_similarity",
    "source_minhash_jaccard",
    "embedding_dim_stats",
    "corpus_pmi_bigrams",
    "embedding_pca_project",
    "privacy_t_closeness",
    "ann_rrf_fusion",
    "flow_t_closeness",
    "text_dedup_keep_best",
    "xmodal_frame_sample",
    "ann_pq_adc_topk",
    "flow_anomaly_mad",
    "flow_heavy_tokens",
    "sample_bloom_contamination",
    "flow_bloom_contamination",
    "doc_perplexity_kneser_ney",
    "sample_dsir_weights",
    "flow_perplexity_gate",
    "flow_dsir_gate",
    "layout_compaction_bins",
    "xmodal_media_stats",
    "flow_frame_sample",
    "ann_ivf_pq_topk",
    "embedding_matryoshka_eval",
    "ts_cusum_changepoints",
    "embedding_hamming_topk",
    "flow_cusum",
    "xmodal_audio_windows",
    "privacy_pseudonymize",
    "behavior_basket_lift",
    "ts_open_lines_daily",
    "flow_pseudonymize",
    "corpus_chunk_sliding",
    "flow_chunking",
    "doc_perplexity_heldout",
    "graph_hits",
    "traffic_bounce_rate",
    "embedding_kcenter_init",
    "corpus_countmin_tokens",
    "flow_countmin",
    "win_wow_change",
    "events_dwell_median",
    "corpus_token_gini",
    "text_zipf_fit",
    "flow_token_gini",
    "ship_latency_percentiles",
    "flow_zipf",
    "path_transition_entropy",
    "corpus_hapax_share",
}

HEADER = [
    "## Cross-round driver-row ledger (r1–r13 recorded, r14 scheduled)",
    "",
    "Generated by `tools/gen_ledger.py` from `CORRECTNESS_r{01..13}.json`",
    "(r1 names mapped through the rename table above; `hash` = full",
    "value-hash green, `rows-only` = declared without an oracle by design,",
    "`FAIL` = a red row). Round 13 went 50/50 green (thirteenth consecutive",
    "zero-red round). The full-vocab Zipf pair `text_zipf_fit`/`flow_zipf`",
    "was RETIRED from the registry in r10 (VERDICT r9 #2 — superseded by",
    "the head-slice pair; their historical rows live in the CORRECTNESS",
    "files but no longer print here). `r14 window` = in the first 50",
    "positions of `queries()` this round, per the r13 verdict's rotation",
    "plan (#2): R14_QUEUE (5 pre-r13-session additions, never",
    "driver-checked — the only oracled names without a driver hash row)",
    "+ 45 slots for the stalest surviving green rows (the 30-name r8-era",
    "cohort remainder, flow_overlap_kmv .. win_rolling_revenue, then the",
    "r9-era cohort alphabetically through flow_gopher_rules — 15 of its",
    "47; the remainder rotates next round). The 5 permanently",
    "rows-only-by-design names are excluded from staleness rotation.",
    "",
    "| query | driver rows | r14 window |",
    "|---|---|---|",
]


def main() -> int:
    cov_path = os.path.join(ROOT, "COVERAGE.md")
    full = open(cov_path).read()
    head, _, _ = full.partition("\n## Cross-round driver-row ledger")

    rename: dict[str, str] = {}
    for line in full.split("## Round-2 query renames")[1].splitlines():
        m = re.match(r"\|\s*`?([a-z0-9_*() -]+?)`?\s*\|\s*`?([a-z0-9_*]+?)`?\s*\|$", line.strip())
        if m and "r1 name" not in line:
            rename[m.group(1).strip()] = m.group(2).strip()

    rows: dict[str, list[str]] = {}
    for r in range(1, 14):
        path = os.path.join(ROOT, f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(path):
            continue
        for k, v in json.load(open(path)).items():
            name = k
            if r == 1:
                if name.startswith("stream_"):
                    name = "flow_" + name[7:]
                name = rename.get(name, name)
            if v.get("hash_match"):
                kind = "hash"
            elif v.get("err") == "no_oracle" and v.get("spark_rows") is not None:
                kind = "rows-only"
            else:
                kind = "FAIL"
            rows.setdefault(name, []).append(f"r{r} {kind}")

    from gmall_realtime_ck_spark import registry

    declared = registry.all_query_names()
    window = set(declared[:50])
    out = list(HEADER)
    for n in sorted(declared):
        h = ", ".join(rows.get(n, [])) or (
            "— (r14 window)" if n in window
            else "— (r15 queue)" if n in R14_QUEUE
            else "—"
        )
        out.append(f"| `{n}` | {h} | {'yes' if n in window else ''} |")
    open(cov_path, "w").write(head + "\n" + "\n".join(out) + "\n")
    print(f"ledger regenerated: {len(declared)} declared queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
