#!/usr/bin/env python
"""Nonlinearity probe above sf0.1 (VERDICT r3 next-round #6).

Synthesizes ×2 / ×5 / ×10 scale-ups of the sf0.1 `documents` and
`embeddings` tables and times the five candidate-generation-heavy
queries at each scale, fitting the log-log growth exponent per query —
LSH/blocked candidate generation is the classic silent quadratic, and
this probe is the guard that the banded/bucketed designs actually grow
~linearly.

Scale-up construction (statistics-preserving, not dup-injecting):
naively concatenating the corpus K× would make every document an exact
near-duplicate of its K-1 copies — candidate pairs would grow O(K²) BY
CONSTRUCTION and measure the data, not the algorithm. Instead each copy
k gets (a) offset doc_ids/vec_ids, (b) a per-copy SUBSTITUTION CIPHER
over [a-z0-9] (alphabet rotated by k) so every token — and every
character n-gram, which a prefix scheme would NOT disjoin — maps 1:1
to a copy-unique twin: cross-copy shingle/minhash/simhash/byte-gram
similarity is zero while WITHIN-copy near-dup structure is exactly
isomorphic to the original, and (c) offset embedding labels so cluster
sizes stay constant and cluster count grows with the corpus (exactly
how IVF cell counts scale in production). Result: a K× corpus with the
same per-unit duplicate rate, so measured growth is the operator's,
not the generator's.

Outputs one JSON line per (query, scale) and a final summary with
fitted exponents. Scratch parquet lives under ./scale_data (gitignored).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time

import duckdb

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_data")
#: override e.g. SPARK_GRAFT_PROBE_SCALES=10,16 for a targeted tail
#: probe (r8: corpus_leakage_safe_split's ×5→×10 step doubled, so the
#: tail needed samples past ×10 to attribute the growth per stage)
SCALES = [
    int(s)
    for s in os.environ.get("SPARK_GRAFT_PROBE_SCALES", "1,2,5,10").split(",")
    if s.strip()  # tolerate whitespace / trailing commas ("10, 16,")
]
QUERIES = [
    "text_minhash_lsh_pairs",
    "text_neardup_clusters",
    "simhash_pair_search",
    "embedding_neardup_scoped",
    "corpus_heavy_tokens",
    # late-round-4 additions: vocab-keyed model fits + a literal-array
    # membership screen — each should hold ~linear like the rest
    "text_langid_ngram",
    "doc_perplexity_kneser_ney",
    "sample_bloom_contamination",
    # round-5 additions (VERDICT r4 #6): the newest join/iteration
    # shapes. ann_ivf_pq_topk should hold ~linear (cell count grows
    # with the corpus via the offset labels, per-cell size constant);
    # graph_hits is two keyed join+agg shuffles per iteration over an
    # edge list that grows linearly (copies are disconnected
    # components). topk_two_sided_exact is the known exception: its
    # query side grows with the corpus (every QUERY_MOD-th vector), so
    # exact Q×C scoring is ARITHMETICALLY quadratic — the probe
    # documents that lower bound; the scale path is the ANN variants.
    "ann_ivf_pq_topk",
    "graph_hits",
    "topk_two_sided_exact",
    # round-5 late additions: both banded/bounded by design —
    # contaminated spans is map + broadcast-join + hit-only windows;
    # phash near-dup is the simhash posture on byte 4-grams. The gram
    # operators are WHY the copy transform below is a substitution
    # cipher, not a token prefix: a prefix leaves interior character
    # grams identical across copies, so every copy-twin pair would
    # collide in fingerprint space and pair count would grow O(K²) BY
    # CONSTRUCTION — the exact generator artifact the docstring warns
    # about, just at gram rather than token granularity.
    "sample_contaminated_spans",
    "xmodal_phash_neardup",
    # round-6 additions: readability is three regexp counts (map-only,
    # should be ~linear in bytes); Simpson is the gini/hapax posture —
    # keyed (source, token) count then a per-source reduce.
    "text_readability",
    "corpus_simpson_diversity",
    # round-7 additions (VERDICT r6 #4): the KMV sketch pair — the
    # per-day rank window is the suspect stage (the documented
    # mitigation is KMV's partial-merge property: per-partition
    # K-smallest sets compose, so a map-side partial bounds the sorted
    # data); leakage-safe split composes neardup_clusters (probed
    # exponent ~0.54 in r5) with one map-side hash, so it should track
    # that cost.
    "approx_uv_kmv",
    "approx_uv_kmv_rollup",
    "corpus_leakage_safe_split",
    # the KMV set-operation sketches: same distinct+rank spine as
    # approx_uv_kmv keyed by event_type / by join-key column;
    # everything after the sketch materializes is |keys|²×K-sized
    "approx_overlap_kmv",
    "approx_join_keys_kmv",
    # round-8 additions: dup inflation is the dedup_exact posture (a
    # keyed (source, md5) agg, no rank window); the epoch planner is a
    # map-side-combined token sum + |sources|-row algebra — both
    # should track the scan
    "corpus_dup_inflation",
    "sample_epoch_schedule",
    # round-8 coarse-key window sweep re-probes: keep-first dedup as
    # min-agg+join, the two-level salted topk_per_key (lang vocab
    # rankings), the salted domain cap, and the count-of-counts Gini
    # — each rewired this round, so its growth curve is re-measured
    "text_dedup_exact",
    "text_bigram_topk",
    "text_langid_ngram",
    "sample_domain_cap",
    "corpus_token_gini",
    # round-9 additions: the head-slice Zipf fit (rank cost bounded at
    # 16·N rows/source regardless of vocabulary — the cipher's linear
    # vocab is exactly the regime it exists for) and the Heaps fit
    # (two keyed aggs + 16 conditional sums, no sort anywhere)
    "text_zipf_topn_fit",
    "corpus_heaps_law",
    # the packing manifest: tokenize scan + the density-scaled
    # two-level prefix sum — windows ~4096 rows by width construction,
    # offset pass |buckets| rows/source, so growth should track the
    # tokenizer scan like the other map-heavy text ops
    "corpus_pack_sequences",
    # round-9 state-bounding sweep re-probes: the head-sliced path
    # mining (topk_per_key before collect), the closed-form-NTILE
    # novelty deciles (prefix-sum rank, no global sort), and the
    # histogram percentiles (exact_percentiles_by_counts — the
    # continuous-double `value` column is the worst case: distinct
    # values ≈ rows, so these curves measure the distributed histogram
    # spine directly)
    "behavior_top_paths",
    "text_novelty_decay",
    "events_anomaly_mad",
    "event_value_percentiles",
    # the CCNet terciles after the ntile_expr rewire: LM fit (vocab-
    # keyed aggregate) + score join + the distributed rank — the curve
    # should track doc_perplexity_kneser_ney's fit cost, with the old
    # per-language corpus sort gone
    "text_ccnet_buckets",
    # the window-function rewires: spend deciles (global ntile →
    # ntile_expr over a prefix-sum rank of every customer) and
    # supplier percent_rank/cume_dist (per-nation windows → closed
    # forms over the distributed rank) — both previously funneled
    # their whole dimension through one/few reducers
    "win_ntile_deciles",
    "win_supplier_percentiles",
    # round-11 rewires: the MAD screen (linearized threshold tree +
    # keyed in-plan percentile stats — events_anomaly_mad above is
    # re-probed for the same reason) and the RFM segmentation's single
    # stacked (metric, value) histogram pass with per-metric Column
    # width/origin; plus the DP release card (keyed count + pure-map
    # noise + a WindowGroupLimit-bounded per-day top-K — should be
    # scan-bound like the other keyed-count shapes)
    "user_rfm_segments",
    "privacy_dp_release_card",
    # round-12 additions: repeated-line removal (block-md5 keyed count
    # + same-key verdict join + per-doc bounded collect — the cipher
    # keeps cross-copy blocks disjoint, so the blacklist grows
    # linearly and the curve measures the keyed-count spine) and the
    # token-budget selection (tokenize scan + within-level prefix scan
    # + ≤1001-row offsets — should track the tokenizer like
    # corpus_pack_sequences)
    "text_line_dedup",
    "sample_token_budget",
    # the decayed-engagement rollup: (user, day) keyed count + a 1-row
    # anchor broadcast — should track the keyed-count spine
    "events_decayed_engagement",
    # round-13 addition: the global training-order rank — no-key
    # two-level prefix scan (~4096-row bucket windows + |buckets|-row
    # offsets); the curve guards that the no-key form stays scan-bound
    # rather than collapsing into one reducer
    "corpus_shuffle_order",
    # round-13 addition: vocab-keyed count + WindowGroupLimit-pruned
    # 50k head slice (cipher grows the vocabulary linearly — the
    # worst case for the keyed count; the slice algebra is bounded)
    "corpus_vocab_coverage",
]

#: streaming builders (signature (spark, sf_dir)) probed on the synth dirs
#: (r8 additions: the KMV set-sketch twin — state O(types × K), emits
#: only on sketch change — and the poll-time Simpson algebra twin)
STREAM_QUERIES = [
    "flow_left_outer",
    "flow_kmv",
    "flow_overlap_kmv",
    "flow_simpson_diversity",
    # round-8 additions: bounded top-CAP pair state / O(sources) totals
    "flow_domain_cap",
    "flow_epoch_schedule",
    # round-9: poll cost of the head-slice fit is rank-bounded even as
    # the complete-mode vocab state grows linearly (cipher worst case)
    "flow_zipf_topn",
    # round-11: the MAD twin's poll now reads the streamed
    # (type, value)-count histogram state + one raw-log emit scan — the
    # continuous `value` column keeps distinct pairs ≈ rows, so this
    # curve measures the histogram-state spine at its worst case
    "flow_anomaly_mad",
    # round-11 addition: per-purchasing-user state + the fully in-plan
    # boundary poll (stacked histogram with keyed in-plan stats)
    "flow_rfm_segments",
    # round-11 addition: release-once DP — watermark-windowed keyed
    # count (state = open cells only) + pure-map noise over emissions
    "flow_dp_release_closed",
    # round-12 additions: the live blacklist (state = one row per
    # distinct block — the cipher makes this grow linearly, the worst
    # case) and the live token-budget slice (state = one row per doc;
    # poll re-runs the two-phase selection)
    "flow_dup_lines",
    "flow_token_budget",
    # live decayed leaderboard: state = (user, day) counts; poll
    # re-anchors the integer-dyadic decay at the current max day
    # (poll-time stale-day compaction added r13 — same state, the
    # curve now also covers the fold)
    "flow_decayed_engagement",
    # round-13 additions: the blacklist CHANGELOG twin (same keyed
    # count state as flow_dup_lines; update-mode emission + poll-time
    # max-upd compaction — the curve measures the changelog overhead)
    # and the live shuffle-order manifest (state = one row per doc;
    # poll re-runs the no-key two-level rank)
    "flow_dup_lines_snapshot",
    "flow_shuffle_order",
]
ID_OFF = 10_000_000
LABEL_OFF = 100_000


#: bump when synth()'s construction changes — stale dirs from an older
#: scheme would silently reintroduce the very generator artifacts the
#: current scheme exists to avoid (the prefix→cipher change is exactly
#: such a case), so the cache is keyed on this marker.
SCHEME = "cipher-v2-events"

#: vocab-keyed queries re-probed on the Heaps-law dirs (VERDICT r8 #6):
#: the cipher construction grows VOCABULARY linearly with the corpus
#: (every copy's tokens are a disjoint 1:1 twin set) — the honest
#: WORST CASE for anything keyed on (source, token), but natural web
#: text grows vocab ~n^0.5 (Heaps' law), so the cipher exponents for
#: this family overstate production growth. The heaps scheme below
#: synthesizes documents whose token ranks are Pareto draws (Zipf
#: frequencies, α=2 → Heaps β≈0.5), giving the natural-growth curve
#: next to the cipher's worst-case one in SCALE.md.
HEAPS_QUERIES = [
    "text_bigram_topk",
    "text_langid_ngram",
    "corpus_token_gini",
    # text_zipf_fit (full vocab) retired r10 — its growth curve vs the
    # declared top-N fit is recorded in SCALE.md; only the declared
    # head-slice fit is probed now
    "text_zipf_topn_fit",
    # r9 late: the CCNet terciles' bigram LM fit is vocab-keyed, so its
    # cipher exponent (0.69) overstates natural-corpus growth the same
    # way the rest of the vocab family's did
    "text_ccnet_buckets",
]
HEAPS_STREAM_QUERIES = [
    # the rank-bounded r9 twin; its full-vocab sibling flow_zipf —
    # whose divergence under real vocab growth motivated
    # zipf_topn_from_counts — was retired r10 (SCALE.md keeps the
    # measured comparison)
    "flow_zipf_topn",
]
HEAPS_SCHEME = "heaps-v1-pareto"
#: ×1 size of the heaps corpus: matches sf0.1 documents (5000 docs,
#: ~54 tokens/doc) so the two schemes' ×1 points are comparable.
HEAPS_DOCS = 5000


def synth_heaps(k: int) -> str:
    """Heaps-law documents dir: 5000·k docs whose tokens are
    ``'w' || ceil(1/u)`` for deterministic hash-uniform u — Pareto
    token ranks ⇒ Zipf(α≈2) frequencies ⇒ observed vocabulary grows
    ~n^0.5 (Heaps) while total tokens grow linearly. Doc lengths vary
    30–78 tokens. Only documents.parquet — every HEAPS_QUERIES builder
    reads just that table."""
    out = os.path.join(SCRATCH, f"heaps_x{k}")
    marker = os.path.join(out, f".scheme-{HEAPS_SCHEME}")
    if os.path.isdir(out) and not os.path.exists(marker):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    for leftover in os.listdir(out):
        if leftover.endswith(".tmp"):
            os.remove(os.path.join(out, leftover))
    if not os.path.exists(f"{out}/documents.parquet"):
        con = duckdb.connect()
        m = 1_000_000_007
        sel = f"""
            WITH toks AS (
                SELECT i // 128 AS doc_id, i % 128 AS p,
                       'w' || CAST(ceil({m}.0 / ((hash(i * 2654435761) % {m}) + 1))
                              AS BIGINT) AS tok
                FROM range({HEAPS_DOCS * k} * 128) t(i)
                WHERE i % 128 < 30 + hash((i // 128) * 7919) % 49
            ), body AS (
                SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text
                FROM toks GROUP BY doc_id
            )
            SELECT doc_id, text, 'en' AS lang,
                   'src' || CAST(doc_id % 20 AS VARCHAR) AS source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM body
        """
        _copy_atomic(con, sel, f"{out}/documents.parquet")
        con.close()
    open(marker, "w").close()
    return out


def _copy_atomic(con, sel: str, dest: str) -> None:
    """COPY to a temp name and rename into place: a run killed
    mid-COPY must never leave a truncated parquet that later probe
    runs silently reuse via the per-table exists-skip (ADVICE r7)."""
    tmp = dest + ".tmp"
    con.execute(f"COPY ({sel}) TO '{tmp}' (FORMAT parquet)")
    os.replace(tmp, dest)


def synth(k: int) -> str:
    out = os.path.join(SCRATCH, f"x{k}")
    marker = os.path.join(out, f".scheme-{SCHEME}")
    if os.path.isdir(out) and not os.path.exists(marker):
        shutil.rmtree(out)  # stale scheme — regenerate
    os.makedirs(out, exist_ok=True)
    for leftover in os.listdir(out):  # orphaned .tmp from a killed run
        if leftover.endswith(".tmp"):
            os.remove(os.path.join(out, leftover))
    con = duckdb.connect()
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"

    def rot(c: int) -> str:
        s = (c * 7) % len(alpha) or 1  # coprime stride; never identity for c>0
        return alpha[s:] + alpha[:s]

    docs_sel = " UNION ALL ".join(
        f"""SELECT doc_id + {c * ID_OFF} AS doc_id,
               {'text' if c == 0 else f"translate(text, '{alpha}', '{rot(c)}')"} AS text,
               lang, source, n_chars
            FROM read_parquet('{BASE}/documents.parquet')"""
        for c in range(k)
    )
    if not os.path.exists(f"{out}/documents.parquet"):
        _copy_atomic(con, docs_sel, f"{out}/documents.parquet")
    emb_sel = " UNION ALL ".join(
        f"""SELECT vec_id + {c * ID_OFF} AS vec_id, embedding,
               label + {c * LABEL_OFF} AS label
            FROM read_parquet('{BASE}/embeddings.parquet')"""
        for c in range(k)
    )
    if not os.path.exists(f"{out}/embeddings.parquet"):
        _copy_atomic(con, emb_sel, f"{out}/embeddings.parquet")
    # graph/stream probes: copies get offset keys, so each copy is a
    # disconnected component isomorphic to the original — node count
    # grows with the data, per-node degree distribution is constant
    # (the statistics-preserving construction, applied to graphs).
    for tbl, keys in (
        ("events", ("event_id", "user_id")),
        ("orders", ("o_orderkey", "o_custkey")),
        ("lineitem", ("l_orderkey", "l_suppkey")),
        # added r7 (approx_join_keys_kmv probes key overlap across
        # tables); generated additively so pre-r7 cached dirs upgrade
        # in place instead of regenerating the whole scheme
        ("customer", ("c_custkey", "c_nationkey")),
        # added r9 (win_supplier_percentiles probes the distributed
        # percent_rank): suppliers scale with the fact copies
        ("supplier", ("s_suppkey",)),
    ):
        if os.path.exists(f"{out}/{tbl}.parquet"):
            continue
        repl = ", ".join(f"{c} + {{off}} AS {c}" for c in keys)
        sel = " UNION ALL ".join(
            f"SELECT * REPLACE ({repl.format(off=c * ID_OFF)}) "
            f"FROM read_parquet('{BASE}/{tbl}.parquet')"
            for c in range(k)
        )
        _copy_atomic(con, sel, f"{out}/{tbl}.parquet")
    con.close()
    # pure dimensions copied ONCE (never unioned: k copies would
    # duplicate the primary keys) — nation doesn't grow with the data
    for dim in ("nation", "region"):
        if not os.path.exists(f"{out}/{dim}.parquet"):
            _copy_atomic(
                con2 := duckdb.connect(),
                f"SELECT * FROM read_parquet('{BASE}/{dim}.parquet')",
                f"{out}/{dim}.parquet",
            )
            con2.close()
    # marker LAST: its presence now certifies every table above exists
    # complete (atomic renames), so the exists-skips are trustworthy
    open(marker, "w").close()
    return out


def main() -> int:
    import sys

    from gmall_realtime_ck_spark import registry
    from gmall_realtime_ck_spark.session import get_spark

    # SPARK_GRAFT_PROBE_SCHEME=heaps probes the vocab-keyed family on
    # the natural-growth (Heaps-law) dirs instead of the worst-case
    # cipher dirs — see HEAPS_QUERIES.
    heaps = os.environ.get("SPARK_GRAFT_PROBE_SCHEME", "cipher") == "heaps"
    base_q = HEAPS_QUERIES if heaps else QUERIES
    base_sq = HEAPS_STREAM_QUERIES if heaps else STREAM_QUERIES
    make_dir = synth_heaps if heaps else synth

    # optional argv filter: probe only the named queries (used when a
    # round adds shapes — re-probing the whole set costs ~30 min and
    # the old exponents are already recorded in SCALE.md)
    wanted = set(sys.argv[1:])
    queries = [q for q in base_q if not wanted or q in wanted]
    stream_queries = [q for q in base_sq if not wanted or q in wanted]
    unknown = wanted - set(base_q) - set(base_sq)
    if unknown:
        raise SystemExit(f"unknown probe queries: {sorted(unknown)}")

    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        # noop DSv2 write, NOT count(): Catalyst collapses count() over
        # an unfiltered projection to a file-metadata count, so map-only
        # queries would be "timed" without their work running (the r6
        # bench-honesty fix; text_readability's count()-timed cost FELL
        # as data grew 10×). The noop sink evaluates every row at the
        # executors and discards it.
        df.write.mode("overwrite").format("noop").save()

    # warm the Arrow/python-worker + codegen paths once, untimed
    TBLS = (
        ["documents"]
        if heaps
        else [
            "documents", "embeddings", "events", "orders", "lineitem",
            "customer", "supplier", "nation", "region",
        ]
    )
    warm_dir = make_dir(1)
    warm = {t: spark.read.parquet(f"{warm_dir}/{t}.parquet") for t in TBLS}
    for q in queries:
        materialize(registry.BUILDERS[q](warm))
    for q in stream_queries:
        registry.STREAM_BUILDERS[q](spark, warm_dir).count()

    all_q = queries + stream_queries
    results: dict[str, dict[int, float]] = {q: {} for q in all_q}
    for k in SCALES:
        d = make_dir(k)
        tables = {t: spark.read.parquet(f"{d}/{t}.parquet") for t in TBLS}
        for q in all_q:
            t0 = time.perf_counter()
            if q in stream_queries:
                # the stream builder already materialized the bounded
                # run into a memory table; count() reads that table
                n = registry.STREAM_BUILDERS[q](spark, d).count()
            else:
                materialize(registry.BUILDERS[q](tables))
                n = None
            dt = round(time.perf_counter() - t0, 3)
            results[q][k] = dt
            print(json.dumps({"query": q, "scale": k, "sec": dt, "rows": n}))

    summary: dict[str, dict] = {}
    for q in all_q:
        xs = [math.log(k) for k in SCALES]
        ys = [math.log(max(results[q][k], 1e-3)) for k in SCALES]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        summary[q] = {
            "exponent": round(slope, 3),
            "sec": {str(k): results[q][k] for k in SCALES},
        }
    print(json.dumps({"summary": summary}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
