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


def test_bloom_never_misses(tables):
    """Bloom filters have false positives but NEVER false negatives:
    per doc, bloom_hits >= exact_hits and false_pos = the gap."""
    rows = _run(tables, "sample_bloom_contamination")
    assert rows
    assert any(r["exact_hits"] > 0 for r in rows)  # screen exercises hits
    for r in rows:
        assert r["bloom_hits"] >= r["exact_hits"], r
        assert r["false_pos"] == r["bloom_hits"] - r["exact_hits"]
        assert 0 <= r["bloom_hits"] <= r["n_shingles"]


def test_keep_best_exactly_one_keeper_per_group(tables):
    from collections import Counter

    rows = _run(tables, "text_dedup_keep_best")
    kept = Counter()
    size = Counter()
    for r in rows:
        size[r["h"]] += 1
        kept[r["h"]] += r["is_kept"]
        assert r["n_dups"] >= 1
    for h, n in size.items():
        assert kept[h] == 1, f"group {h}: {kept[h]} keepers of {n}"


def test_adc_ranks_contiguous_and_monotone(tables):
    from collections import defaultdict

    rows = _run(tables, "ann_pq_adc_topk")
    per_q = defaultdict(list)
    for r in rows:
        per_q[r["q_id"]].append((r["rank"], r["adc_d"], r["neighbor_id"]))
    for q, lst in per_q.items():
        lst.sort()
        assert [x[0] for x in lst] == list(range(1, len(lst) + 1)), q
        ds = [x[1] for x in lst]
        assert ds == sorted(ds), q  # distance non-decreasing with rank


def test_ivf_pq_prunes_but_never_beats_exhaustive(tables):
    """IVF probing can only LOSE candidates vs exhaustive ADC: at each
    rank, the pruned search's distance is >= the exhaustive one's, and
    any (q, neighbor) pair both return must carry the same adc_d."""
    from collections import defaultdict

    adc = {(r["q_id"], r["rank"]): r["adc_d"] for r in _run(tables, "ann_pq_adc_topk")}
    both = defaultdict(dict)
    for r in _run(tables, "ann_pq_adc_topk"):
        both[r["q_id"]][r["neighbor_id"]] = r["adc_d"]
    ivf_rows = _run(tables, "ann_ivf_pq_topk")
    assert ivf_rows
    for r in ivf_rows:
        key = (r["q_id"], r["rank"])
        if key in adc:
            assert r["adc_d"] >= adc[key], (key, r["adc_d"], adc[key])
        shared = both[r["q_id"]].get(r["neighbor_id"])
        if shared is not None:
            assert shared == r["adc_d"]


def test_frame_sample_geometry(tables):
    from gmall_realtime_ck_spark.operators.multimodal import FRAME_BYTES, FRAME_EVERY

    rows = _run(tables, "xmodal_frame_sample")
    assert rows
    for r in rows:
        assert r["frame_idx"] % FRAME_EVERY == 0
        assert 1 <= r["n_frame_bytes"] <= FRAME_BYTES
        assert r["frame_sum"] >= 0


def test_compaction_bins_monotone_and_filled(tables):
    """Within each month, bin ids start at 0, never decrease along the
    day order, and every bin except possibly the last holds >= target
    rows once closed."""
    from collections import defaultdict

    from gmall_realtime_ck_spark.operators.layout import COMPACT_TARGET_ROWS

    rows = _run(tables, "layout_compaction_bins")
    months = defaultdict(list)
    for r in rows:
        months[r["file_month"]].append((r["file_day"], r["n_rows"], r["bin_id"]))
    for m, lst in months.items():
        lst.sort()
        bins = [b for _, _, b in lst]
        assert bins[0] == 0
        assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:])), m
        from collections import Counter

        per_bin = Counter()
        for _, n, b in lst:
            per_bin[b] += n
        closed = [b for b in per_bin if b < max(bins)]
        for b in closed:
            assert per_bin[b] >= COMPACT_TARGET_ROWS, (m, b, per_bin[b])


def test_kneser_ney_nll_positive_and_doc_parity(tables):
    """KN probabilities are < 1 so avg NLL is positive; the scored doc
    set matches the Laplace scorer's (same >= 2-token gate)."""
    kn = {r["doc_id"]: r["avg_nll_kn"] for r in _run(tables, "doc_perplexity_kneser_ney")}
    lap = {r["doc_id"] for r in _run(tables, "doc_perplexity_bigram")}
    assert set(kn) == lap
    assert all(v > 0 for v in kn.values())


def test_kcenter_distances_monotone_nonincreasing(tables):
    """Greedy farthest-point selection distances can only shrink:
    each new centroid's selection distance is <= the previous one's
    (the 2-approximation argument's core invariant)."""
    rows = sorted(_run(tables, "embedding_kcenter_init"))
    assert len(rows) == 5
    ds = [r["d_micro2"] for r in rows]
    assert ds[0] == 0
    assert all(b <= a for a, b in zip(ds[1:], ds[2:])), ds


def test_countmin_never_underestimates(tables):
    rows = _run(tables, "corpus_countmin_tokens")
    assert rows
    for r in rows:
        assert r["est_ct"] >= r["true_ct"], r
        assert r["overestimate"] == r["est_ct"] - r["true_ct"]


def test_ccnet_buckets_are_balanced_terciles(tables):
    """ntile(3) law: within each language the three buckets differ in
    size by at most one, every scored doc lands in exactly one bucket,
    and bucket order follows perplexity order (max NLL in head <= min
    NLL in tail)."""
    from collections import defaultdict

    rows = _run(tables, "text_ccnet_buckets")
    assert rows
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    for lang, rs in by_lang.items():
        sizes = defaultdict(int)
        for r in rs:
            assert r["bucket"] in (1, 2, 3)
            assert r["bucket_label"] == {1: "head", 2: "middle", 3: "tail"}[r["bucket"]]
            sizes[r["bucket"]] += 1
        present = [sizes[b] for b in (1, 2, 3) if sizes[b]]
        assert max(present) - min(present) <= 1, (lang, dict(sizes))
        head_nll = [r["avg_nll"] for r in rs if r["bucket"] == 1]
        tail_nll = [r["avg_nll"] for r in rs if r["bucket"] == 3]
        if head_nll and tail_nll:
            assert max(head_nll) <= min(tail_nll), lang


def test_ccnet_covers_every_scored_doc(tables):
    """The bucketing partitions exactly the perplexity-scored doc set
    (docs with >= 2 tokens) — nothing dropped, nothing invented."""
    scored = {r["doc_id"] for r in _run(tables, "doc_perplexity_bigram")}
    bucketed = [r["doc_id"] for r in _run(tables, "text_ccnet_buckets")]
    assert len(bucketed) == len(set(bucketed))
    assert set(bucketed) == scored


def test_tokenizer_fertility_bounds(tables):
    """The BPE-ish regex splits at least as finely as whitespace
    tokenization on alphanumeric text (every ws token is >= 1 subtoken),
    so fertility >= 1000 permille; totals are positive."""
    rows = _run(tables, "corpus_tokenizer_fertility")
    assert rows
    for r in rows:
        assert r["n_words"] > 0 and r["n_subtokens"] > 0
        assert r["n_subtokens"] >= r["n_words"], r
        assert r["fertility_permille"] >= 1000, r


def test_neardup_clusters_closure_and_canonical_min(tables):
    """Connected-components laws on the fixpoint labels: the cluster id
    is a member of its own cluster (canonical representative), every
    verified near-dup edge joins two docs with the SAME label, and the
    label is the minimum doc_id of the cluster."""
    from collections import defaultdict

    from pyspark.sql import functions as F  # noqa: F401  (parity with module style)

    labels = {r["doc_id"]: r["cluster_id"] for r in _run(tables, "text_neardup_clusters")}
    clusters = defaultdict(set)
    for d, c in labels.items():
        clusters[c].add(d)
    for c, members in clusters.items():
        assert c in members, f"cluster id {c} not a member of its own cluster"
        assert c == min(members), f"label {c} is not the component min {min(members)}"
    pairs = (
        registry.BUILDERS["text_ngram_jaccard_pairs"](tables)
        .filter("jaccard_permille >= 300")
        .collect()
    )
    for p in pairs:
        assert labels[p["doc_a"]] == labels[p["doc_b"]], (p["doc_a"], p["doc_b"])


def test_contaminated_spans_bounds(tables):
    """Gaps-and-islands laws: the longest run is bounded by the hit
    count, hits by the shingle count; agreement with the fraction
    screen's per-doc totals (same 3-gram geometry, positional here vs
    distinct there: positional hits >= distinct hits only when shingles
    repeat, but a doc with zero distinct hits must have zero runs)."""
    spans = {r["doc_id"]: r for r in _run(tables, "sample_contaminated_spans")}
    assert spans
    for r in spans.values():
        assert 0 <= r["max_contaminated_run"] <= r["n_hits"] <= r["n_shingles"]
    frac = {r["doc_id"]: r for r in _run(tables, "sample_contamination")}
    for d, r in frac.items():
        if r["bench_hits"] == 0 and d in spans:
            assert spans[d]["n_hits"] == 0, d


def test_phash_neardup_laws(tables):
    """Banded Hamming pair search laws: ordered pairs, hamming within
    the declared radius, and exact payload duplicates (same bytes ⇒
    same fingerprint) appear with hamming 0."""
    from gmall_realtime_ck_spark.operators.dedup import SIMHASH_PAIR_HAMMING_MAX

    pairs = _run(tables, "xmodal_phash_neardup")
    assert pairs
    seen = set()
    for p in pairs:
        assert p["media_a"] < p["media_b"]
        assert 0 <= p["hamming"] <= SIMHASH_PAIR_HAMMING_MAX
        assert (p["media_a"], p["media_b"]) not in seen
        seen.add((p["media_a"], p["media_b"]))
    dup_pairs = {}
    for r in _run(tables, "xmodal_exact_dedup"):
        dup_pairs.setdefault(r["h"], []).append(r["media_id"])
    ham = {(p["media_a"], p["media_b"]): p["hamming"] for p in pairs}
    for ids in dup_pairs.values():
        ids = sorted(ids)
        for other in ids[1:]:
            # identical payloads: identical fingerprint -> every band
            # collides -> pair MUST be reported, at distance zero
            assert ham.get((ids[0], other)) == 0, (ids[0], other)


def test_recall_at_k_bounds_and_self_consistency(tables):
    """recall@k laws: one row per query of the IVF-PQ run, hits within
    [0, k], recall_e4 = hits * 10000 / k exactly."""
    from gmall_realtime_ck_spark.operators.similarity import TOP_K

    rows = _run(tables, "embedding_recall_at_k")
    assert rows
    q_ivf = {r["q_id"] for r in _run(tables, "ann_ivf_pq_topk")}
    assert {r["q_id"] for r in rows} == q_ivf
    for r in rows:
        assert 0 <= r["hits"] <= TOP_K
        assert r["recall_e4"] == r["hits"] * 10000 // TOP_K


def test_readability_exact_on_known_doc(spark):
    """Hand-computed Flesch / FK-grade on a fixed sentence pins the
    milli-point algebra (word, sentence and vowel-group counts are
    enumerable by eye, so a regression in any regexp or the DIV
    arithmetic flips an exact integer)."""
    from gmall_realtime_ck_spark.operators.text import text_readability

    # tokens: [the, cat, sat, 2, times] = 5 words; sentences: '.' and
    # '!' runs = 2; vowel groups: the(1) cat(1) sat(1) times(2) = 5
    docs = spark.createDataFrame(
        [(1, "The cat sat. 2 times!", "en", "s1", 21)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    row = text_readability({"documents": docs}).collect()[0]
    assert (row["n_words"], row["n_sentences"], row["n_syllables"]) == (5, 2, 5)
    assert row["flesch_e3"] == 206835 - (1015 * 5) // 2 - (84600 * 5) // 5
    assert row["fk_grade_e3"] == (390 * 5) // 2 + (11800 * 5) // 5 - 15590


def test_readability_algebra_consistency(tables):
    """On the real corpus every row must satisfy the published formulas
    exactly (and an empty doc must not divide by zero: sentences >= 1)."""
    rows = _run(tables, "text_readability")
    assert rows
    for r in rows:
        assert r["n_sentences"] >= 1
        w, s, y = r["n_words"], r["n_sentences"], r["n_syllables"]
        assert r["flesch_e3"] == 206835 - (1015 * w) // s - (84600 * y) // max(w, 1)
        assert r["fk_grade_e3"] == (390 * w) // s + (11800 * y) // max(w, 1) - 15590


def test_simpson_diversity_triangulates_pure_python(tables):
    """Third implementation: recount Simpson's D per source in plain
    Python with the same tokenizer regex — the Spark aggregation and
    the DuckDB oracle must both match this (the gaps-and-islands
    triangulation pattern from r5, applied to the diversity index)."""
    import re as _re
    from collections import Counter

    docs = tables["documents"].select("source", "text").collect()
    counts: dict[str, Counter] = {}
    for r in docs:
        toks = [x for x in _re.split(r"[^a-z0-9]+", r["text"].lower()) if x]
        counts.setdefault(r["source"], Counter()).update(toks)
    expect = {}
    for src, c in counts.items():
        n = sum(c.values())
        pairs = sum(ct * (ct - 1) for ct in c.values())
        d = 1000000 - (pairs * 1000000) // (n * (n - 1)) if n >= 2 else 0
        expect[src] = (len(c), n, d)
    got = {
        r["source"]: (r["vocab"], r["n_tokens"], r["simpson_ppm"])
        for r in _run(tables, "corpus_simpson_diversity")
    }
    assert got == expect
    for vocab, n_tokens, ppm in got.values():
        assert 0 <= ppm <= 1000000 and vocab <= n_tokens


def test_leakage_safe_split_keeps_clusters_together(tables):
    """The law that IS the operator: (a) all docs sharing a cluster_id
    share bucket and split — so no verified near-dup pair can straddle
    train/test; (b) the assignment agrees with the md5 bucket algebra
    on the cluster id; (c) every document is assigned exactly once."""
    from gmall_realtime_ck_spark.operators.sampling import (
        SPLIT_BUCKETS,
        TEST_PCT,
        VAL_PCT,
    )

    rows = _run(tables, "corpus_leakage_safe_split")
    n_docs = tables["documents"].count()
    assert len(rows) == n_docs and len({r["doc_id"] for r in rows}) == n_docs
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add((r["bucket"], r["split"]))
        want = (
            "test" if r["bucket"] < TEST_PCT
            else "val" if r["bucket"] < TEST_PCT + VAL_PCT
            else "train"
        )
        assert 0 <= r["bucket"] < SPLIT_BUCKETS and r["split"] == want
    assert all(len(v) == 1 for v in by_cluster.values())
    # and the clusters are the near-dup fixpoint, not something weaker
    cc = {(r["doc_id"], r["cluster_id"]) for r in _run(tables, "text_neardup_clusters")}
    assert {(r["doc_id"], r["cluster_id"]) for r in rows} == cc


def test_kmv_exact_below_k_and_bounded_above(tables):
    """KMV laws on the daily sketch: days with ≤ K distinct hashes are
    EXACT (the sketch holds the whole set); estimator days stay within
    4/√(K−1) relative error of the true distinct-hash count (≈4σ for
    the Bar-Yossef estimator — deterministic here, so a violation is a
    formula bug, not bad luck)."""
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.relational import _H44_SPARK, KMV_K

    exact = {
        r["day"]: r["n"]
        for r in tables["events"]
        .select(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
                F.expr(_H44_SPARK).alias("h"))
        .groupBy("day")
        .agg(F.countDistinct("h").alias("n"))
        .collect()
    }
    rows = _run(tables, "approx_uv_kmv")
    assert {r["day"] for r in rows} == set(exact)
    tol = 4.0 / (KMV_K - 1) ** 0.5
    for r in rows:
        assert r["n_hashes"] == exact[r["day"]]
        if r["n_hashes"] <= KMV_K:
            assert r["uv_kmv"] == r["n_hashes"], r
        else:
            assert abs(r["uv_kmv"] - r["n_hashes"]) <= tol * r["n_hashes"], r


def test_kmv_rollup_equals_direct_weekly_sketch(tables):
    """KMV's defining mergeability law: the weekly estimate from
    merged DAILY sketches must equal sketching the week's raw hashes
    directly — any hash among the week's K smallest is necessarily
    among its day's K smallest, so the merge loses nothing."""
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.relational import (
        _H44_SPARK,
        _kmv_estimate,
    )

    direct = (
        tables["events"]
        .select(F.date_trunc("week", F.to_date("ts")).alias("wk"),
                F.expr(_H44_SPARK).alias("h"))
        .distinct()
    )
    want = {
        (r["week"], r["n_hashes"], r["uv_kmv"])
        for r in _kmv_estimate(direct, "wk")
        .select(F.date_format("wk", "yyyy-MM-dd").alias("week"), "n_hashes", "uv_kmv")
        .collect()
    }
    got = {
        (r["week"], r["n_hashes"], r["uv_kmv"])
        for r in _run(tables, "approx_uv_kmv_rollup")
    }
    # n_hashes differs by design: the rollup only sees merged sketch
    # rows (≤ K per day), so compare (week, uv_kmv) — the estimates
    # must agree exactly.
    assert {(w, e) for w, _, e in got} == {(w, e) for w, _, e in want}


def test_kmv_overlap_exact_when_unsaturated(spark):
    """KMV set-operation law: when no side's sketch is truncated the
    pair "estimates" must be EXACT set arithmetic — the sketch holds
    both full sets, so union_est = |A∪B|, inter_est = |A∩B| and
    jaccard_ppm = ⌊10⁶·J⌋ with zero error."""
    from gmall_realtime_ck_spark.operators.relational import (
        KMV_K,
        approx_overlap_kmv,
    )

    # three types with known overlap structure, all below K — including
    # a pair whose UNION exceeds K (a↔d: 30+40−5=65 > 64), which must
    # STILL be exact because both whole sets are in hand
    rows = (
        [("a", u) for u in range(0, 30)]
        + [("b", u) for u in range(20, 50)]  # |a∩b|=10, |a∪b|=50
        + [("c", u) for u in range(100, 110)]  # disjoint from both
        + [("d", u) for u in range(25, 65)]  # |a∩d|=5, |a∪d|=65 > K
    )
    assert all(n <= KMV_K for n in (30, 30, 10, 40)) and 65 > KMV_K
    ev = spark.createDataFrame(
        [(t, u, 1) for t, u in rows], "event_type string, user_id long, x int"
    )
    got = {
        (r["type_a"], r["type_b"]): (r["union_est"], r["inter_est"], r["jaccard_ppm"])
        for r in approx_overlap_kmv({"events": ev}).collect()
    }
    assert got[("a", "b")] == (50, 10, 10 * 1_000_000 // 50)
    assert got[("a", "c")] == (40, 0, 0)
    assert got[("b", "c")] == (40, 0, 0)
    assert got[("a", "d")] == (65, 5, 5 * 1_000_000 // 65)
    assert got[("b", "d")] == (45, 25, 25 * 1_000_000 // 45)
    assert got[("c", "d")] == (50, 0, 0)


def test_kmv_overlap_bounded_error_when_saturated(tables):
    """Saturated pairs (sf0.001 event types share one global user pool,
    so every pair overlaps heavily): union_est within the 4σ KMV bound
    of the true union; jaccard within 4σ of ρ's binomial noise; and
    inter_est consistent with (jaccard × union) by construction."""
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.relational import KMV_K

    exact: dict[str, set] = {}
    for r in tables["events"].select("event_type", "user_id").distinct().collect():
        exact.setdefault(r["event_type"], set()).add(r["user_id"])
    rows = _run(tables, "approx_overlap_kmv")
    types = sorted(exact)
    assert {(r["type_a"], r["type_b"]) for r in rows} == {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    tol = 4.0 / (KMV_K - 1) ** 0.5
    for r in rows:
        ua = exact[r["type_a"]] | exact[r["type_b"]]
        ia = exact[r["type_a"]] & exact[r["type_b"]]
        true_j = len(ia) / len(ua)
        assert abs(r["union_est"] - len(ua)) <= tol * len(ua) + 1, r
        assert abs(r["jaccard_ppm"] / 1e6 - true_j) <= tol + 0.05, r
        # inter_est is defined as (rho·union_est) div k -- re-derivable
        assert r["inter_est"] == r["jaccard_ppm"] * r["union_est"] // 1_000_000 or (
            abs(r["inter_est"] - len(ia)) <= (tol + 0.05) * len(ua) + 1
        ), r


def test_kmv_join_keys_exact_when_unsaturated(spark):
    """The join-key sketch must hash EQUAL KEY VALUES identically
    across tables (else every overlap reads 0): with ≤K distinct keys
    per column, the pair estimates are exact set arithmetic on the
    actual key overlap."""
    from gmall_realtime_ck_spark.operators.relational import approx_join_keys_kmv

    customers = spark.createDataFrame(
        [(k, "x") for k in range(0, 50)], "c_custkey long, pad string"
    )
    orders = spark.createDataFrame(  # 30 customers have orders, dup rows
        [(k % 30, i) for i, k in enumerate(range(0, 60))], "o_custkey long, o_id long"
    )
    events = spark.createDataFrame(  # users 20..39 → overlaps both
        [(u, "click") for u in range(20, 40)], "user_id long, event_type string"
    )
    got = {
        (r["type_a"], r["type_b"]): (r["union_est"], r["inter_est"], r["jaccard_ppm"])
        for r in approx_join_keys_kmv(
            {"orders": orders, "customer": customers, "events": events}
        ).collect()
    }
    assert got[("customer.c_custkey", "orders.o_custkey")] == (50, 30, 30 * 10**6 // 50)
    assert got[("customer.c_custkey", "events.user_id")] == (50, 20, 20 * 10**6 // 50)
    assert got[("events.user_id", "orders.o_custkey")] == (40, 10, 10 * 10**6 // 40)


def test_kmv_two_level_rank_equals_global(spark):
    """kmv_topk_per_key's salted two-level rank (the hot-key sort
    mitigation) must return EXACTLY the global K smallest per key plus
    the exact distinct count — exercised on a skewed input where one
    key holds 80× the other's hashes."""
    from collections import defaultdict

    from gmall_realtime_ck_spark.operators.relational import (
        KMV_K,
        kmv_topk_per_key,
    )

    rows = [("hot", h * 7 + 1) for h in range(3200)] + [
        ("cold", h * 13 + 2) for h in range(40)
    ]
    df = spark.createDataFrame(rows, "k string, h long")
    per = defaultdict(dict)
    ns = {}
    for r in kmv_topk_per_key(df, "k").collect():
        per[r["k"]][r["rk"]] = r["h"]
        ns[r["k"]] = r["n"]
    truth = defaultdict(list)
    for k, h in rows:
        truth[k].append(h)
    for k, hs in truth.items():
        want = sorted(hs)[:KMV_K]
        assert [per[k][i] for i in range(1, len(per[k]) + 1)] == want, k
        assert ns[k] == len(hs), k


def test_domain_cap_two_level_equals_global(spark):
    """sample_domain_cap's salted two-level rank (the hot-domain sort
    mitigation, VERDICT r7 #2) must return EXACTLY the single-window
    result — same doc_ids, same ranks — on a skewed input where one
    domain holds 200× the other's documents, including duplicate
    texts (equal h, doc_id tie-break) straddling the CAP boundary."""
    import hashlib

    from gmall_realtime_ck_spark.operators.sampling import (
        DOMAIN_CAP,
        sample_domain_cap,
    )

    rows = (
        # hot domain: 4000 docs, only 9 distinct texts → massive h ties
        [(f"d{i:05d}", "hot.example", f"t{i % 9}") for i in range(4000)]
        # cold domain: fewer docs than the CAP (all kept, exact ranks)
        + [(f"c{i:02d}", "cold.example", f"u{i}") for i in range(DOMAIN_CAP - 3)]
    )
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = {
        (r["source"], r["doc_id"]): r["rank"]
        for r in sample_domain_cap({"documents": df}).collect()
    }

    def h28(text: str) -> int:
        return int(hashlib.md5(text.encode()).hexdigest()[:7], 16)

    want = {}
    by_src = {}
    for doc_id, source, text in rows:
        by_src.setdefault(source, []).append((h28(text), doc_id))
    for source, hs in by_src.items():
        for rank, (_, doc_id) in enumerate(sorted(hs)[:DOMAIN_CAP], start=1):
            want[(source, doc_id)] = rank
    assert got == want


def test_generic_topk_two_level_equals_global(spark):
    """topk_per_key (the generic two-level salted rank behind
    best_parts_per_region / bigram_topk / the langid profile fit —
    r8 coarse-key window sweep) must equal the single-window global
    top-K exactly on a skewed input: one key with 5000 rows including
    heavy ties in the leading order column, one key with fewer rows
    than K."""
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.relational import topk_per_key

    rows = [("hot", (i * 17) % 40, f"id{i:05d}") for i in range(5000)] + [
        ("cold", i, f"id{i:05d}") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "k string, ct long, name string")
    got = {
        (r["k"], r["rk"]): (r["ct"], r["name"])
        for r in topk_per_key(
            df, ["k"], [F.desc("ct"), F.asc("name")], 7, salt_on="name"
        ).collect()
    }
    want = {}
    by_key = {}
    for k, ct, name in rows:
        by_key.setdefault(k, []).append((-ct, name))
    for k, items in by_key.items():
        for rk, (nct, name) in enumerate(sorted(items)[:7], start=1):
            want[(k, rk)] = (-nct, name)
    assert got == want


def test_dup_inflation_exact_on_constructed_corpus(spark):
    """corpus_dup_inflation on a corpus with known copy counts: a
    source with a 3x-copied 4-token page plus a unique 2-token page
    must report exactly (4 docs, 2 unique, 14 total / 6 unique tokens,
    inflation 2333 permille); a fully-unique source reports 1000."""
    from gmall_realtime_ck_spark.operators.sampling import corpus_dup_inflation

    rows = (
        [(i, "spark shuffles keyed aggregates", "en", "src0", 30) for i in range(3)]
        + [(3, "broadcast joins", "en", "src0", 15)]
        + [(10, "one two three", "en", "src1", 13), (11, "four five", "en", "src1", 9)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    got = {r["source"]: r.asDict() for r in corpus_dup_inflation({"documents": df}).collect()}
    assert got["src0"] == {
        "source": "src0", "n_docs": 4, "n_unique": 2,
        "tokens_total": 14, "tokens_unique": 6, "inflation_permille": 2333,
    }
    assert got["src1"]["inflation_permille"] == 1000
    assert got["src1"]["n_docs"] == got["src1"]["n_unique"] == 2


def test_epoch_schedule_laws(spark, tables):
    """sample_epoch_schedule invariants on the real corpus: epochs in
    [1, MAX_EPOCHS]; epochs is the exact clamped ceiling of
    target/tokens; capped=1 iff the uncapped ceiling exceeds the cap,
    and then (and only then) achieved_tokens < target_tokens while
    epochs == MAX_EPOCHS."""
    from gmall_realtime_ck_spark.operators.sampling import (
        MAX_EPOCHS,
        sample_epoch_schedule,
    )

    rows = sample_epoch_schedule(tables).collect()
    assert len(rows) > 0
    for r in rows:
        need = -(-r["target_tokens"] // max(r["tokens"], 1))  # exact ceil
        assert r["epochs"] == max(1, min(MAX_EPOCHS, need)), r
        assert r["achieved_tokens"] == r["epochs"] * r["tokens"], r
        assert r["capped"] == (1 if need > MAX_EPOCHS else 0), r
        if r["capped"]:
            assert r["epochs"] == MAX_EPOCHS
            assert r["achieved_tokens"] < r["target_tokens"]
        else:
            assert r["achieved_tokens"] >= min(r["target_tokens"], r["tokens"])


def test_gini_histogram_form_equals_rank_form(spark):
    """gini_from_counts' count-of-counts closed form (r8) must equal
    the literal rank formula Σ(2·rank − vocab − 1)·ct on an input with
    heavy count ties — the histogram contribution ct·(m·c + m(m+1)/2)
    is exact because tokens of equal ct are rank-interchangeable."""
    from gmall_realtime_ck_spark.operators.text import gini_from_counts

    rows = (
        [("a", f"t{i:03d}", 1) for i in range(50)]      # 50-way tie at ct=1
        + [("a", f"u{i}", 7) for i in range(3)]          # 3-way tie at ct=7
        + [("a", "zz", 100)]
        + [("b", "x", 4), ("b", "y", 4), ("b", "z", 4)]  # all tied → gini 0
    )
    df = spark.createDataFrame(rows, "source string, token string, ct long")
    got = {r["source"]: r.asDict() for r in gini_from_counts(df).collect()}

    by_src = {}
    for s, _, ct in rows:
        by_src.setdefault(s, []).append(ct)
    for s, cts in by_src.items():
        cts.sort()
        n, tot = len(cts), sum(cts)
        s1 = sum(rk * ct for rk, ct in enumerate(cts, start=1))
        want = (1000 * (2 * s1 - (n + 1) * tot)) // (n * tot)
        assert got[s] == {
            "source": s, "vocab": n, "n_tokens": tot, "gini_permille": want,
        }, s
    assert got["b"]["gini_permille"] == 0


def test_zipf_topn_slope_converges(spark):
    """The at-scale head-slice Zipf fit (zipf_topn_from_counts, r9 —
    VERDICT r8 #2's convergence law): on a genuinely Zipfian input
    (ct = ⌊10⁶/rank⌋ over a 5000-token vocabulary) the top-N slope
    must converge to the full-vocab slope — within 0.02 at N=500 —
    because Zipf fits are head-driven. Also pins that the slice is
    real (n_top = N < vocab) and that vocab still reports the FULL
    vocabulary size."""
    from gmall_realtime_ck_spark.operators.text import (
        zipf_from_counts,
        zipf_topn_from_counts,
    )

    rows = [("w", f"t{rk:05d}", 10**6 // rk) for rk in range(1, 5001)]
    df = spark.createDataFrame(rows, "source string, token string, ct long")
    full = zipf_from_counts(df).collect()[0]
    head = zipf_topn_from_counts(df, n=500).collect()[0]
    assert head["vocab"] == 5000 and head["n_top"] == 500
    assert abs(head["zipf_slope"] - full["zipf_slope"]) < 0.02, (
        head["zipf_slope"],
        full["zipf_slope"],
    )
    assert head["fit_r2"] > 0.99


def test_zipf_topn_equals_full_when_unsliced(tables):
    """When N exceeds every source's vocabulary the head-slice fit must
    reproduce the full-vocab fit bit-for-bit (slope, r², vocab) with
    n_top = vocab — the sliced plan and the classic single-window plan
    are then the same regression over the same rows, so any divergence
    would mean the two-level rank re-ordered something."""
    from gmall_realtime_ck_spark.operators.text import (
        TOKENS_SPARK,
        text_zipf_fit,
        zipf_topn_from_counts,
    )
    from pyspark.sql import functions as F

    docs = tables["documents"]
    counts = (
        docs.select(
            "source", F.explode(F.expr(TOKENS_SPARK.format(c="text"))).alias("token")
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    full = {r["source"]: r.asDict() for r in text_zipf_fit(tables).collect()}
    head = {
        r["source"]: r.asDict()
        for r in zipf_topn_from_counts(counts, n=10_000).collect()
    }
    assert set(full) == set(head)
    for s, f in full.items():
        h = head[s]
        assert h["n_top"] == h["vocab"] == f["vocab"], s
        assert h["zipf_slope"] == f["zipf_slope"], s
        assert h["fit_r2"] == f["fit_r2"], s


def test_heaps_law_boundary_regimes(spark):
    """corpus_heaps_law (r9): the two analytic regimes pin the fit.
    (a) Every doc all-new tokens and equal length → cum_vocab ≡
    cum_tokens at every checkpoint → β = 1, r² = 1 exactly.
    (b) Every doc the same single token → cum_vocab ≡ 1 → ln V ≡ 0 →
    β = 0. Doc_ids are deliberately non-contiguous to pin that
    checkpoints follow the doc_id RANGE, not row counts."""
    from gmall_realtime_ck_spark.operators.text import corpus_heaps_law

    rows = []
    for d in range(32):
        did = d * 3 + 7  # non-contiguous ids
        rows.append((did, " ".join(f"new{d}w{j}" for j in range(5)), "en", "growA", 0))
        rows.append((did + 1, "same same same same same", "en", "flatB", 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["source"]: r.asDict() for r in corpus_heaps_law({"documents": docs}).collect()}
    assert got["growA"]["heaps_beta"] == 1.0 and got["growA"]["fit_r2"] == 1.0
    assert got["flatB"]["heaps_beta"] == 0.0


def test_heaps_law_triangulates_pure_python(tables):
    """The checkpoint conditional-sum form must equal a literal pure-
    python replay (tokenize, first-occurrence scan, 16 prefix
    evaluations, least-squares by hand) on the real sf0.001 corpus —
    the same triangulation discipline as Simpson/Gini."""
    import math
    import re as _re

    from gmall_realtime_ck_spark.operators.text import HEAPS_POINTS, corpus_heaps_law

    got = {r["source"]: r.asDict() for r in corpus_heaps_law(tables).collect()}

    docs = sorted(
        (r["source"], r["doc_id"], r["text"])
        for r in tables["documents"].select("source", "doc_id", "text").collect()
    )
    by_src: dict = {}
    for s, did, text in docs:
        toks = [w for w in _re.split(r"[^a-z0-9]+", text.lower()) if w]
        by_src.setdefault(s, []).append((did, toks))
    for s, dl in by_src.items():
        mxd = max(d for d, _ in dl)
        pts = []
        for i in range(1, HEAPS_POINTS + 1):
            vocab = len({t for d, toks in dl if d * HEAPS_POINTS <= mxd * i for t in toks})
            ntok = sum(len(toks) for d, toks in dl if d * HEAPS_POINTS <= mxd * i)
            if vocab > 0 and ntok > 0:
                pts.append((math.log(ntok), math.log(vocab)))
        n = len(pts)
        mx_ = sum(x for x, _ in pts) / n
        my_ = sum(y for _, y in pts) / n
        sxx = sum((x - mx_) ** 2 for x, _ in pts)
        sxy = sum((x - mx_) * (y - my_) for x, y in pts)
        syy = sum((y - my_) ** 2 for _, y in pts)
        beta = sxy / sxx
        # constant y ⇒ both engines define r² = 1 (a zero-slope line
        # fits perfectly); float noise in syy would make the naive
        # ratio meaningless, so branch on exact y-set size.
        r2 = 1.0 if len({y for _, y in pts}) == 1 else (sxy * sxy) / (sxx * syy)
        assert got[s]["n_points"] == n, s
        assert abs(got[s]["heaps_beta"] - round(beta, 6)) <= 1e-6, s
        assert abs(got[s]["fit_r2"] - round(r2, 6)) <= 1e-6, s


def test_prefix_sum_two_level_equals_window(spark):
    """prefix_sum_per_key (r9, the scan behind corpus_pack_sequences)
    must equal the naive single-window running sum row-for-row on a
    skewed input: one key with 10k rows spanning many buckets (with
    non-contiguous, non-aligned order values), one key smaller than a
    bucket, and a tiny bucket_size so the two-level path (within-bucket
    cumsum + offset pass + join) really exercises all three stages."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.relational import prefix_sum_per_key

    rows = [("hot", i * 7 + (i % 3), (i % 13) + 1) for i in range(10_000)] + [
        ("cold", i * 31, i + 1) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "k string, ord long, v long")
    got = {
        (r["k"], r["ord"]): r["run"]
        for r in prefix_sum_per_key(df, ["k"], "ord", "v", "run", bucket_size=64).collect()
    }
    w = Window.partitionBy("k").orderBy("ord").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["k"], r["ord"]): r["run"]
        for r in df.withColumn("run", F.sum("v").over(w)).collect()
    }
    assert got == want
    assert len(got) == 10_005


def test_prefix_sum_auto_width_on_sparse_ids(spark):
    """bucket_size=None (the sparse-id path): ids spread like content
    hashes — unique but covering a huge value range, where the dense
    4096 default would put ≤1 row per bucket and the offset pass
    degenerates into the full-key window. The auto width must (a) stay
    row-for-row equal to the naive window (any bucketing is exact —
    associativity) and (b) actually coarsen the buckets so the offset
    pass sees ~n/4096 rows, not n."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.relational import prefix_sum_per_key

    # odd multiplier → bijective mod 2^40: unique, uniformly spread ids
    rows = [("k", (i * 2654435761) % (1 << 40), (i % 7) + 1) for i in range(20_000)]
    df = spark.createDataFrame(rows, "k string, ord long, v long")
    out = prefix_sum_per_key(df, ["k"], "ord", "v", "run", bucket_size=None)
    got = {(r["k"], r["ord"]): r["run"] for r in out.collect()}
    w = Window.partitionBy("k").orderBy("ord").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["k"], r["ord"]): r["run"]
        for r in df.withColumn("run", F.sum("v").over(w)).collect()
    }
    assert got == want and len(got) == 20_000
    # the balance claim, with the impl's own formula on the actual
    # stats: auto width ≈ span·4096/n ⇒ ~n/4096 ≈ 5 buckets
    ids = [o for _, o, _ in rows]
    span = max(ids) - min(ids) + 1
    width = max(1, min(span, span * 4096 // 20_000))
    n_buckets = df.select(F.expr(f"ord div {width}").alias("b")).distinct().count()
    assert n_buckets <= 16, n_buckets  # vs ~20k with the dense default


def test_prefix_sum_inplan_width_equals_window(spark):
    """bucket_size="inplan" (r10, the streaming-safe auto width behind
    flow_anomaly_mad / flow_ccnet_gate): the width derives from a
    1-row broadcast stats aggregate INSIDE the plan, so each execution
    re-buckets against current stats instead of a build-time snapshot.
    Must stay row-for-row equal to the naive window on (a) sparse
    integer ids (the overflow-prone span·4096 path — computed in
    double in-plan), (b) continuous doubles incl. negatives (the
    min-anchored fractional path), and (c) an EMPTY input (the exact
    degenerate first-poll case the mode exists for — the eager None
    path would have frozen span=1 forever; in-plan just yields an
    empty frame and re-derives next poll)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.relational import prefix_sum_per_key

    w = Window.partitionBy("k").orderBy("ord").rowsBetween(Window.unboundedPreceding, 0)
    # (a) sparse ints, two keys of very different density — plus a key
    # whose values span nearly the FULL signed-64 range with few rows
    # (64-bit content hashes on a first poll): span·4096/n exceeds
    # 2^63 there, and the width cast must clamp instead of raising
    # CAST_OVERFLOW under ANSI (r10 review finding, verified)
    rows_i = [("hot", (i * 2654435761) % (1 << 40), (i % 7) + 1) for i in range(5_000)]
    rows_i += [("cold", i * 3, 1) for i in range(9)]
    rows_i += [("wide", (1 << 62) * s + i, 1) for s in (-1, 1) for i in range(3)]
    df_i = spark.createDataFrame(rows_i, "k string, ord long, v long")
    # (b) continuous doubles spanning negative values (unique per key —
    # the helper's contract requires (order_col, *tie_cols) unique)
    rows_d = [("a", i * 0.37 - 500.25, i % 5 + 1) for i in range(3_000)]
    df_d = spark.createDataFrame(rows_d, "k string, ord double, v long")
    for df, n_exp in ((df_i, 5_015), (df_d, 3_000)):
        got = {
            (r["k"], r["ord"]): r["run"]
            for r in prefix_sum_per_key(
                df, ["k"], "ord", "v", "run", bucket_size="inplan"
            ).collect()
        }
        want = {
            (r["k"], r["ord"]): r["run"]
            for r in df.withColumn("run", F.sum("v").over(w)).collect()
        }
        assert got == want and len(got) == n_exp, len(got)
    # (c) empty input: no rows, no error, schema intact
    empty = df_i.filter(F.lit(False))
    out = prefix_sum_per_key(empty, ["k"], "ord", "v", "run", bucket_size="inplan")
    assert out.collect() == [] and "run" in out.columns


def test_prefix_sum_column_width_and_origin(spark):
    """Column-valued bucket_size/origin (r11, the stacked-metric shape
    behind user_rfm_segments): each key row carries its own width and
    anchor, so ONE pass can histogram metrics of wildly different
    magnitudes. Exercised in the exact r10 ADVICE #3 regime — a
    'recency' key at epoch-microsecond magnitude (~1.7e15) with a
    DEGENERATE span (every value within 4 µs) and a tiny derived
    width, where an unanchored floor(mv/width) would blow past 2^63
    into the ANSI clamp and collapse every row into one bucket. Must
    (a) equal the naive per-key running sum row-for-row and (b) keep
    the anchored bucket grid small (ids ≤ ~n/4096-scale), i.e. the
    state-bounding the width exists for actually holds."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.relational import prefix_sum_per_key

    base = 1_700_000_000_000_000.0
    rows = [("recency", base + (i % 5), 1) for i in range(0, 4_000, 2)]
    rows += [("freq", float(i % 40), 1) for i in range(1, 4_000, 2)]
    df = (
        spark.createDataFrame(rows, "metric string, mv double, ct long")
        .groupBy("metric", "mv")
        .agg(F.sum("ct").alias("ct"))
    )
    stats = {
        r["metric"]: (r["lo"], r["hi"], r["n"])
        for r in df.groupBy("metric")
        .agg(F.min("mv").alias("lo"), F.max("mv").alias("hi"), F.sum("ct").alias("n"))
        .collect()
    }
    width_expr, origin_expr = None, None
    for m, (lo, hi, n) in stats.items():
        span = max(hi - lo, 1e-9)
        w = max(span * 4096.0 / n, 1e-9)
        cond = F.col("metric") == F.lit(m)
        width_expr = (F.when if width_expr is None else width_expr.when)(cond, F.lit(w))
        origin_expr = (F.when if origin_expr is None else origin_expr.when)(cond, F.lit(lo))
    out = prefix_sum_per_key(
        df,
        ["metric"],
        "mv",
        "ct",
        "cum",
        bucket_size=width_expr.otherwise(F.lit(1.0)),
        origin=origin_expr.otherwise(F.lit(0.0)),
    )
    got = {(r["metric"], r["mv"]): r["cum"] for r in out.collect()}
    w = Window.partitionBy("metric").orderBy("mv").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        (r["metric"], r["mv"]): r["cum"]
        for r in df.withColumn("cum", F.sum("ct").over(w)).collect()
    }
    assert got == want and len(got) == 25  # 5 recency + 20 freq values
    # (b) the anchored grid the helper builds must stay small — the
    # unanchored id for the recency key would be floor(1.7e15/w) ≫ 2^40
    grid = df.select(
        F.floor(
            (F.col("mv") - origin_expr.otherwise(F.lit(0.0)))
            / width_expr.otherwise(F.lit(1.0))
        ).alias("b")
    )
    assert grid.agg(F.max("b")).first()[0] <= 4096


def test_exact_percentiles_by_counts_equals_builtin(spark):
    """The distributed histogram percentile must equal Spark's built-in
    `percentile` BIT-FOR-BIT (same interpolation formula, same float
    op order) — on heavy integer ties, on continuous doubles, keyed and
    global, across the target range including the exact-index endpoints
    p=0 and p=1."""
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.relational import (
        exact_percentiles_by_counts,
    )

    targets = {"p0": 0.0, "p25": 0.25, "p50": 0.5, "p95": 0.95, "p100": 1.0}
    rows_int = [("a", (i * i) % 13) for i in range(501)] + [
        ("b", i * 7 % 97) for i in range(40)
    ] + [("c", 42)]
    rows_dbl = [("a", ((i * 2654435761) % 1_000_003) / 997.0) for i in range(501)] + [
        ("b", (i % 17) + 0.125) for i in range(40)
    ]
    for rows, typ in ((rows_int, "long"), (rows_dbl, "double")):
        df = spark.createDataFrame(rows, f"k string, v {typ}")
        want = {
            r["k"]: tuple(r[n] for n in targets)
            for r in df.groupBy("k")
            .agg(*[F.expr(f"percentile(v, {p})").alias(n) for n, p in targets.items()])
            .collect()
        }
        got = {
            r["k"]: tuple(r[n] for n in targets)
            for r in exact_percentiles_by_counts(df, ["k"], "v", targets).collect()
        }
        assert got == want, (typ, got, want)
        # keyed "inplan" (r11): ONE keyed stats aggregate feeds width,
        # lo anchor and N — must stay bit-identical to the built-in on
        # the same inputs (bucketing never affects results)
        got_ip = {
            r["k"]: tuple(r[n] for n in targets)
            for r in exact_percentiles_by_counts(
                df, ["k"], "v", targets, bucket_size="inplan"
            ).collect()
        }
        assert got_ip == want, (typ, got_ip, want)
        # global (keys=[]): the 1-row broadcast path
        w0 = df.agg(
            *[F.expr(f"percentile(v, {p})").alias(n) for n, p in targets.items()]
        ).first()
        g0 = exact_percentiles_by_counts(df, [], "v", targets).first()
        assert tuple(g0[n] for n in targets) == tuple(w0[n] for n in targets), typ


def test_ntile_closed_form_equals_window(spark):
    """ntile_expr over a distributed prefix-sum rank must match the
    window ntile bucket-for-bucket — at B=10 (novelty deciles) and B=3
    (CCNet terciles), on an N not divisible by B (the m extra-row
    buckets), on a tiny N < B (q = 0: every doc its own bucket), and
    on SPARSE non-contiguous ids (the rank must come from the bucketed
    scan, not id arithmetic)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.relational import (
        ntile_expr,
        prefix_sum_per_key,
    )

    for ids in ([i * 997 + (i % 7) for i in range(257)], [5, 900, 17]):
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long").withColumn(
            "_one", F.lit(1).cast("bigint")
        )
        n = len(ids)
        ranked = prefix_sum_per_key(
            df, [], "doc_id", "_one", "rank", bucket_size=64
        ).withColumn("n_total", F.lit(n).cast("bigint"))
        for b in (10, 3):
            got = {
                r["doc_id"]: r["t"]
                for r in ranked.withColumn(
                    "t", ntile_expr("rank", "n_total", b)
                ).collect()
            }
            want = {
                r["doc_id"]: r["d"]
                for r in df.withColumn(
                    "d", F.ntile(b).over(Window.orderBy("doc_id"))
                ).collect()
            }
            assert got == want, (n, b, got, want)


def test_prefix_sum_tie_cols_equals_window(spark):
    """tie_cols (the CCNet-tercile rank path): a NON-unique order
    column with a unique tie column must rank exactly like the naive
    window ordered by the composite — including heavy ties (one score
    shared by many rows) that span would-be bucket widths (ties share
    a bucket id, so they never straddle)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.relational import prefix_sum_per_key

    rows = [("k", float(i % 5) + 0.25, i) for i in range(2_000)] + [
        ("k2", 1.25, i) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "k string, score double, doc_id long").withColumn(
        "_one", F.lit(1).cast("bigint")
    )
    got = {
        (r["k"], r["doc_id"]): r["rk"]
        for r in prefix_sum_per_key(
            df, ["k"], "score", "_one", "rk", bucket_size=None, tie_cols=["doc_id"]
        ).collect()
    }
    w = Window.partitionBy("k").orderBy("score", "doc_id")
    want = {
        (r["k"], r["doc_id"]): r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w).cast("bigint")).collect()
    }
    assert got == want
    assert len(got) == 2_064


def test_pack_sequences_laws(tables):
    """corpus_pack_sequences packing laws on the real corpus: per
    source (docs in doc_id order) the token stream is gapless
    (start_tok of each doc == run end of the previous), offsets are
    in-range (off_in_seq = start_tok mod CTX < CTX), spans are
    consistent (seq_first ≤ seq_last, and seq_last is exactly the
    sequence holding the doc's final token), and the total sequence
    count per source is ⌈total_tokens / CTX⌉."""
    from gmall_realtime_ck_spark.operators.layout import PACK_CTX, corpus_pack_sequences

    rows = sorted(
        ((r["source"], r["doc_id"], r["ntok"], r["start_tok"], r["seq_first"],
          r["seq_last"], r["off_in_seq"]) for r in corpus_pack_sequences(tables).collect())
    )
    assert rows, "empty manifest"
    by_src: dict = {}
    for src, did, ntok, start, sf, sl, off in rows:
        assert ntok > 0
        assert off == start % PACK_CTX and 0 <= off < PACK_CTX, (src, did)
        assert sf == start // PACK_CTX, (src, did)
        assert sl == (start + ntok - 1) // PACK_CTX and sf <= sl, (src, did)
        by_src.setdefault(src, []).append((did, ntok, start))
    for src, dl in by_src.items():
        expect = 0
        for did, ntok, start in sorted(dl):
            assert start == expect, (src, did, start, expect)
            expect = start + ntok
        n_seqs = max(sl for s, d, n, st, sf, sl, o in rows if s == src) + 1
        assert n_seqs == (expect + PACK_CTX - 1) // PACK_CTX, src


def test_dp_counts_noise_bounds_and_determinism(tables):
    """privacy_dp_counts (r10): the release must (a) be deterministic
    across runs (a cell's noise is a peppered PRF of its key, so
    re-releases cannot be averaged away; the pepper is secret in
    production and a pinned literal only for test/oracle reproducibility),
    (b) keep every |noise| within the quantized-Laplace tail bound
    b·ln(LEVELS) ≈ 5.545, (c) clamp at 0, and (d) actually perturb —
    both noise signs must occur across the 150 release cells."""
    import math

    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.privacy import (
        DP_EPSILON,
        _DP_LEVELS,
        dp_count_release,
    )

    ev = tables["events"]
    truth = {
        (r["event_type"], r["day"]): r["n"]
        for r in ev.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rel1 = {
        (r["event_type"], r["day"]): r["noisy_count"]
        for r in dp_count_release(tables).collect()
    }
    rel2 = {
        (r["event_type"], r["day"]): r["noisy_count"]
        for r in dp_count_release(tables).collect()
    }
    assert rel1 == rel2 and set(rel1) == set(truth)
    bound = (1.0 / DP_EPSILON) * math.log(_DP_LEVELS)
    signs = set()
    for k, noisy in rel1.items():
        assert noisy >= 0.0
        noise = noisy - truth[k]
        assert abs(noise) <= bound + 1e-6, (k, noise)
        if noise > 0:
            signs.add("+")
        elif noise < 0:
            signs.add("-")
    assert signs == {"+", "-"}, signs


def test_dp_pepper_injection_seam():
    """r11 ADVICE #1 (medium): the pepper must have a REAL injection
    seam, not just docstring advertising. Pin: (a) env injection wins
    over the pinned literal, (b) strict mode refuses the silent
    fallback (the misconfigured-deploy failure the advisory names),
    (c) no env → the pinned test seam (what the driver's vanilla
    session relies on), (d) both engines' index expressions are built
    from the RESOLVED pepper — an injected value flows into the SQL
    text of Spark and DuckDB in lockstep, so oracle hash-parity
    survives injection."""
    import pytest as _pytest

    from gmall_realtime_ck_spark.operators import privacy as P

    env = {"GMALL_DP_PEPPER": "injected-s3cret"}
    with _pytest.MonkeyPatch.context() as mp:
        for k, v in env.items():
            mp.setenv(k, v)
        assert P._resolve_pepper("GMALL_DP_PEPPER", "dp-pepper-v1") == "injected-s3cret"
    with _pytest.MonkeyPatch.context() as mp:
        mp.setenv("GMALL_REQUIRE_PEPPER", "1")
        mp.delenv("GMALL_DP_PEPPER", raising=False)
        with _pytest.raises(RuntimeError, match="GMALL_DP_PEPPER"):
            P._resolve_pepper("GMALL_DP_PEPPER", "dp-pepper-v1")
    with _pytest.MonkeyPatch.context() as mp:
        mp.delenv("GMALL_DP_PEPPER", raising=False)
        mp.delenv("GMALL_REQUIRE_PEPPER", raising=False)
        assert P._resolve_pepper("GMALL_DP_PEPPER", "dp-pepper-v1") == "dp-pepper-v1"
    # (c') ADVICE r12 #2: present-but-EMPTY is an attempted injection
    # that delivered nothing — a configuration error in EVERY mode,
    # never a silent fallback to the public test pepper.
    with _pytest.MonkeyPatch.context() as mp:
        mp.setenv("GMALL_DP_PEPPER", "")
        mp.delenv("GMALL_REQUIRE_PEPPER", raising=False)
        with _pytest.raises(RuntimeError, match="EMPTY"):
            P._resolve_pepper("GMALL_DP_PEPPER", "dp-pepper-v1")
    with _pytest.MonkeyPatch.context() as mp:
        mp.setenv("GMALL_DP_PEPPER", "")
        mp.setenv("GMALL_REQUIRE_PEPPER", "1")
        with _pytest.raises(RuntimeError, match="EMPTY"):
            P._resolve_pepper("GMALL_DP_PEPPER", "dp-pepper-v1")
    # (d) expression builders track an arbitrary pepper in both engines
    assert "injected-s3cret:" in P.dp_idx_spark("injected-s3cret")
    assert "injected-s3cret:" in P.dp_idx_duck("injected-s3cret")
    assert P.dp_idx_spark(P.DP_PEPPER) == P._DP_IDX_SPARK
    assert P.dp_idx_duck(P.DP_PEPPER) == P._DP_IDX_DUCK


def test_retention_cohorts_triangle_laws(tables):
    """events_retention_cohorts (r10): day-0 retention is exactly 1000
    permille with n_users == cohort_size (everyone is active on their
    first-seen day), every cell satisfies 0 < n_users ≤ cohort_size
    with non-negative offsets, cohort sizes sum to the distinct-user
    count, and the permille column is the exact integer div."""
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.behavior import events_retention_cohorts

    rows = events_retention_cohorts(tables).collect()
    assert rows
    sizes = {}
    for r in rows:
        assert r["day_offset"] >= 0
        assert 0 < r["n_users"] <= r["cohort_size"], r
        assert r["retention_permille"] == (1000 * r["n_users"]) // r["cohort_size"]
        sizes[r["cohort_day"]] = r["cohort_size"]
        if r["day_offset"] == 0:
            assert r["n_users"] == r["cohort_size"], r
            assert r["retention_permille"] == 1000
    day0 = {r["cohort_day"] for r in rows if r["day_offset"] == 0}
    assert day0 == set(sizes), "every cohort must have its day-0 cell"
    n_users_total = tables["events"].select("user_id").distinct().count()
    assert sum(sizes.values()) == n_users_total


def test_dp_release_card_consistent_with_release(tables):
    """privacy_dp_release_card (r11): the dashboard card must be a pure
    function of the DP RELEASE — every card row's noisy_count equals
    the released value for its cell (the card never touches raw
    counts), ranks are 1..K dense per day ordered by (noisy desc,
    type), the day total is the exact integer-micros sum over the
    day's FULL release, and the permille share is floor(1000·nm/total)."""
    from gmall_realtime_ck_spark.operators.privacy import (
        DP_CARD_TOPK,
        dp_count_release,
        dp_release_card,
    )

    release = {
        (r["event_type"], r["day"]): r["noisy_count"]
        for r in dp_count_release(tables).collect()
    }
    micros = {k: round(v * 1e6) for k, v in release.items()}
    day_tot = {}
    for (et, d), nm in micros.items():
        day_tot[d] = day_tot.get(d, 0) + int(nm)
    card = dp_release_card(dp_count_release(tables)).collect()
    assert card, "empty card"
    by_day: dict[str, list] = {}
    for r in card:
        assert r["noisy_count"] == release[(r["event_type"], r["day"])]
        assert r["day_total_micros"] == day_tot[r["day"]]
        nm = int(round(r["noisy_count"] * 1e6))
        import math

        assert r["share_permille"] == math.floor(
            1000.0 * nm / max(day_tot[r["day"]], 1)
        )
        by_day.setdefault(r["day"], []).append(r)
    for d, rows in by_day.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= DP_CARD_TOPK
        keys = [(-r["noisy_count"], r["event_type"]) for r in rows]
        assert keys == sorted(keys), d


def test_line_dedup_laws(tables):
    """text_line_dedup (r12): (a) block accounting — n_blocks =
    ceil(n_tokens / LINE_TOKENS) and every doc with tokens appears;
    (b) clean token count = total tokens minus the dropped blocks'
    tokens; (c) a doc with nothing dropped reassembles to its own
    token join (clean_md5 = md5 of the space-joined token array) —
    the reassembly path is provably lossless; (d) every dropped
    block's text really does occur more than once corpus-wide."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.dedup import (
        LINE_TOKENS,
        line_blocks,
        line_dedup,
    )
    from gmall_realtime_ck_spark.operators.text import TOKENS_SPARK

    out = {r["doc_id"]: r for r in line_dedup(tables).collect()}
    toks = {
        r["doc_id"]: r["tk"]
        for r in tables["documents"]
        .select("doc_id", F.expr(TOKENS_SPARK.format(c="text")).alias("tk"))
        .collect()
        if r["tk"]
    }
    assert set(out) == set(toks)
    blocks = line_blocks(tables["documents"]).collect()
    occ: dict[str, int] = {}
    for b in blocks:
        occ[b["btxt"]] = occ.get(b["btxt"], 0) + 1
    doc_blocks: dict[int, list] = {}
    for b in blocks:
        doc_blocks.setdefault(b["doc_id"], []).append(b)
    n_docs_clean = 0
    for did, r in out.items():
        tk = toks[did]
        assert r["n_blocks"] == math.ceil(len(tk) / LINE_TOKENS)
        bs = sorted(doc_blocks[did], key=lambda b: b["pos"])
        dropped = [b for b in bs if occ[b["btxt"]] > 1]
        assert r["n_dropped"] == len(dropped)
        assert r["clean_n_tokens"] == len(tk) - sum(b["ntok"] for b in dropped)
        if not dropped:
            n_docs_clean += 1
            want = hashlib.md5(" ".join(tk).encode()).hexdigest()
            assert r["clean_md5"] == want, did
    assert n_docs_clean > 0 and any(r["n_dropped"] for r in out.values())


def test_token_budget_greedy_prefix(tables):
    """sample_token_budget (r12): the two-phase distributed selection
    must equal the straightforward greedy prefix — sort docs by
    (quality DESC, doc_id), admit while the running token total stays
    ≤ TOKEN_BUDGET — including exact cum_tokens values; and the first
    excluded doc would have pushed the total past the budget (the
    selection is maximal, not merely feasible)."""
    from gmall_realtime_ck_spark.operators.sampling import (
        TOKEN_BUDGET,
        doc_quality_tokens,
        sample_token_budget,
    )

    per_doc = sorted(
        (
            (r["stop_ratio_permille"], r["doc_id"], r["n_tokens"])
            for r in doc_quality_tokens(tables["documents"]).collect()
        ),
        key=lambda x: (-x[0], x[1]),
    )
    want, cum = {}, 0
    first_excluded_cum = None
    for q, did, nt in per_doc:
        cum += nt
        if cum <= TOKEN_BUDGET:
            want[did] = (q, nt, cum)
        else:
            first_excluded_cum = cum
            break
    got = {
        r["doc_id"]: (r["stop_ratio_permille"], r["n_tokens"], r["cum_tokens"])
        for r in sample_token_budget(tables).collect()
    }
    assert got == want and want
    assert first_excluded_cum is None or first_excluded_cum > TOKEN_BUDGET


def test_line_dedup_fully_dropped_doc(spark):
    """Edge the driver corpus never hits: a document whose EVERY block
    is corpus-duplicated must survive with an empty reassembly —
    clean_n_tokens = 0 and clean_md5 = md5('') — not vanish from the
    output (the doc row is the cleaning VERDICT; downstream joins rely
    on one row per input doc with tokens)."""
    import hashlib

    from gmall_realtime_ck_spark.operators.dedup import LINE_TOKENS, line_dedup

    blk = " ".join(f"w{i}" for i in range(LINE_TOKENS))
    rows = [
        # doc 0: two copies of the same block → entirely boilerplate
        (0, f"{blk} {blk}", "en", "s0", 10),
        # doc 1: one more copy (makes the block corpus-duplicated) plus
        # a unique tail that must survive
        (1, f"{blk} unique tail words here", "en", "s0", 10),
        # doc 2: fully unique → untouched
        (2, "totally fresh content nothing repeated at all", "en", "s1", 10),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    out = {r["doc_id"]: r for r in line_dedup({"documents": docs}).collect()}
    assert set(out) == {0, 1, 2}
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert out[0]["n_dropped"] == out[0]["n_blocks"] == 2
    assert out[0]["clean_n_tokens"] == 0 and out[0]["clean_md5"] == empty_md5
    assert out[1]["n_dropped"] == 1
    want1 = hashlib.md5(b"unique tail words here").hexdigest()
    assert out[1]["clean_md5"] == want1 and out[1]["clean_n_tokens"] == 4
    assert out[2]["n_dropped"] == 0 and out[2]["clean_n_tokens"] == 7


def test_decayed_engagement_laws(tables):
    """events_decayed_engagement (r12): (a) the score is exactly
    Σ_d n_d · (10⁶ div 2^d) with d anchored at the corpus max day —
    recomputed independently from a raw collect; (b) a user active
    ONLY on the max day scores exactly 10⁶ per event (no decay);
    (c) activity 20+ days old contributes exactly zero (the integer
    division vanishes before the shift guard is ever needed)."""
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.behavior import (
        events_decayed_engagement,
    )

    rows = tables["events"].select(
        "user_id", F.to_date("ts").alias("d")
    ).collect()
    mx = max(r["d"] for r in rows)
    want: dict[int, list[int]] = {}
    for r in rows:
        dd = (mx - r["d"]).days
        w = 0 if dd >= 20 else 1_000_000 // (1 << dd)
        n, s = want.get(r["user_id"], [0, 0])
        want[r["user_id"]] = [n + 1, s + w]
    got = {
        r["user_id"]: [r["n_events"], r["decayed_micros"]]
        for r in events_decayed_engagement(tables).collect()
    }
    assert got == want and want
    # (b)+(c) on a constructed frame: one fresh user, one stale user
    spark = tables["events"].sparkSession
    from gmall_realtime_ck_spark.operators.behavior import (
        decayed_engagement_from_day_counts,
    )

    dc = spark.createDataFrame(
        [(1, "2024-03-31", 3), (2, "2024-03-01", 5), (2, "2024-02-01", 7)],
        "user_id bigint, day string, n bigint",
    ).select("user_id", F.to_date("day").alias("day"), "n")
    out = {
        r["user_id"]: (r["n_events"], r["decayed_micros"])
        for r in decayed_engagement_from_day_counts(dc).collect()
    }
    assert out[1] == (3, 3_000_000)
    # user 2: 30 days old → 1e6//2^30 = 0 via the d>=20 guard; 59 days → 0
    assert out[2] == (12, 0)


def test_decayed_engagement_compaction_law(tables):
    """VERDICT r12 #5: ``compact_stale_day_counts`` bounds the
    decayed-engagement frame's calendar-time growth. Laws: (a) the
    decay output over the compacted frame is IDENTICAL to the output
    over the raw frame — on the real events table and on a constructed
    frame with deep stale history; (b) the compacted frame is flat
    across a widened day range — ≤ |users| × 21 rows however many
    calendar days the raw frame spans (the probe the verdict asks
    for); (c) the fold is idempotent (re-compacting is a no-op) and
    preserves every per-user ``n`` total and the frame max day."""
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.behavior import (
        compact_stale_day_counts,
        decayed_engagement_from_day_counts,
    )

    spark = tables["events"].sparkSession

    def score(df):
        return sorted(
            (r["user_id"], r["n_events"], r["decayed_micros"])
            for r in decayed_engagement_from_day_counts(df).collect()
        )

    # (a) on the real events table
    dc_real = tables["events"].groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    assert score(compact_stale_day_counts(dc_real)) == score(dc_real)

    # (a)+(b): widening day ranges, fixed 5 users, one row per
    # (user, day) — raw frame grows with the span, compacted stays
    # ≤ |users| × 21 and score-identical throughout.
    import datetime as _dt

    anchor = _dt.date(2024, 3, 31)
    sizes = {}
    for span in (30, 60, 120):
        rows = [
            (u, anchor - _dt.timedelta(days=d), (u + d) % 7 + 1)
            for u in range(5)
            for d in range(span)
        ]
        dc = spark.createDataFrame(rows, "user_id bigint, day date, n bigint")
        comp = compact_stale_day_counts(dc)
        sizes[span] = comp.count()
        assert sizes[span] <= 5 * 21
        assert score(comp) == score(dc)
        # (c) idempotent; n totals and the anchor day survive
        recomp = compact_stale_day_counts(comp)
        assert sorted(map(tuple, recomp.collect())) == sorted(
            map(tuple, comp.collect())
        )
        assert comp.agg(F.max("day")).first()[0] == anchor
        tot = {
            r["user_id"]: r["s"]
            for r in comp.groupBy("user_id").agg(F.sum("n").alias("s")).collect()
        }
        assert tot == {u: sum((u + d) % 7 + 1 for d in range(span)) for u in range(5)}
    # flat: the 120-day frame compacts to the same size as the 60-day
    assert sizes[30] == sizes[60] == sizes[120] == 5 * 21


def test_pack_efficiency_consistent_with_manifest(tables):
    """corpus_pack_efficiency (r12): the report must be a pure rollup
    of the packing manifest — per source, recompute docs/packs/tokens/
    capacity/fill from a collected sequence_pack_assign and require
    exact equality, including the documented may-exceed-1000 fill
    semantics (a doc belongs to the pack where its first token lands,
    so a shard's final pack can overflow PACK_BUDGET)."""
    from gmall_realtime_ck_spark.operators.sampling import (
        PACK_BUDGET,
        corpus_pack_efficiency,
        sequence_pack_assign,
    )

    manifest = sequence_pack_assign(tables).collect()
    want: dict[str, list[int]] = {}
    for r in manifest:
        n, packs, tok = want.get(r["source"], [0, 0, 0])
        want[r["source"]] = [n + 1, max(packs, r["pack_id"] + 1), tok + r["n_tokens"]]
    got = {r["source"]: r for r in corpus_pack_efficiency(tables).collect()}
    assert set(got) == set(want)
    for src, (n_docs, n_packs, total) in want.items():
        g = got[src]
        cap = n_packs * PACK_BUDGET
        assert (g["n_docs"], g["n_packs"], g["total_tokens"]) == (n_docs, n_packs, total)
        assert g["capacity_tokens"] == cap
        assert g["fill_permille"] == (total * 1000) // cap
        # a non-degenerate shard fills most of its capacity
        assert g["fill_permille"] > 500, src


def test_shuffle_order_laws(tables):
    """corpus_shuffle_order (r13): (a) positions are an exact
    permutation 0..n−1 of the documents; (b) the no-key two-level rank
    equals the naive global ``row_number() OVER (ORDER BY h, doc_id)``
    form row-for-row (the single-reducer plan the operator exists to
    avoid); (c) shard = pos div SHUF_SHARD_DOCS, contiguous slices of
    the shuffled order; (d) deterministic — a second build yields the
    identical manifest; (e) the order is genuinely shuffled relative
    to doc_id order (some inversion exists)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.layout import (
        SHUF_SHARD_DOCS,
        corpus_shuffle_order,
    )
    from gmall_realtime_ck_spark.operators.text import H60_SPARK

    out = corpus_shuffle_order(tables).collect()
    n = tables["documents"].count()
    assert sorted(r["pos"] for r in out) == list(range(n))
    for r in out:
        assert r["shard"] == r["pos"] // SHUF_SHARD_DOCS
    # (b) naive window form — fine at test scale, the scale-killer at 100 TB
    naive = {
        r["doc_id"]: r["pos"]
        for r in tables["documents"]
        .select(
            "doc_id",
            F.expr(
                H60_SPARK.format(c="concat('shuf:', cast(doc_id as string))")
            ).alias("h"),
        )
        .withColumn(
            "pos", F.row_number().over(Window.orderBy("h", "doc_id")) - 1
        )
        .collect()
    }
    got = {r["doc_id"]: r["pos"] for r in out}
    assert got == naive
    # (d) deterministic
    again = {r["doc_id"]: r["pos"] for r in corpus_shuffle_order(tables).collect()}
    assert again == got
    # (e) not the identity order on doc_id
    by_id = [p for _, p in sorted(got.items())]
    assert by_id != sorted(by_id)


def test_vocab_coverage_laws(tables):
    """corpus_vocab_coverage (r13): recompute coverage directly from a
    raw token-count collect — covered_tokens at each K must equal the
    sum over the K most frequent types under the (ct DESC, token) tie
    break; coverage is monotone nondecreasing in K, bounded by the
    corpus total, and reaches the full total once K ≥ |vocab|."""
    import re

    from gmall_realtime_ck_spark.operators.text import (
        VOCAB_COVERAGE_KS,
        corpus_vocab_coverage,
    )

    texts = [r["text"] for r in tables["documents"].select("text").collect()]
    counts: dict[str, int] = {}
    for s in texts:
        for tok in re.split(r"[^a-z0-9]+", s.lower()):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    got = {r["vocab_k"]: r for r in corpus_vocab_coverage(tables).collect()}
    assert set(got) == set(VOCAB_COVERAGE_KS)
    prev = -1
    for k in sorted(VOCAB_COVERAGE_KS):
        r = got[k]
        want_cov = sum(ct for _, ct in ordered[:k])
        assert r["covered_tokens"] == want_cov
        assert r["tokens_total"] == total
        assert r["vocab_total"] == len(counts)
        assert r["coverage_permille"] == (1000 * want_cov) // max(total, 1)
        assert r["covered_tokens"] >= prev  # monotone in K
        prev = r["covered_tokens"]
        if k >= len(counts):
            assert r["covered_tokens"] == total


def test_truncation_waste_laws(tables):
    """corpus_truncation_waste (r13): recompute the report from raw
    per-doc token counts — docs_truncated and tokens_lost must match
    exactly per context length, both monotone NONINCREASING in the
    context length, and the permille column is the exact integer
    division."""
    import re

    from gmall_realtime_ck_spark.operators.sampling import (
        CTX_CANDIDATES,
        corpus_truncation_waste,
    )

    lens = [
        len([w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if w])
        for r in tables["documents"].select("text").collect()
    ]
    total = sum(lens)
    got = {r["ctx_len"]: r for r in corpus_truncation_waste(tables).collect()}
    assert set(got) == set(CTX_CANDIDATES)
    prev_dt, prev_tl = float("inf"), float("inf")
    for ctx in sorted(CTX_CANDIDATES):
        r = got[ctx]
        want_dt = sum(1 for n in lens if n > ctx)
        want_tl = sum(max(n - ctx, 0) for n in lens)
        assert r["n_docs"] == len(lens)
        assert r["docs_truncated"] == want_dt
        assert r["tokens_total"] == total
        assert r["tokens_lost"] == want_tl
        assert r["loss_permille"] == (1000 * want_tl) // max(total, 1)
        assert want_dt <= prev_dt and want_tl <= prev_tl
        prev_dt, prev_tl = want_dt, want_tl
