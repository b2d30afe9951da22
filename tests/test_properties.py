"""Property-based tests (hypothesis): operator invariants on random
inputs — beyond the reference's zero-assertion test culture
(SURVEY §5)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gmall_realtime_ck_spark.operators import layout

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=10_000),  # ts seconds
        st.integers(min_value=0, max_value=99),  # payload
    ),
    min_size=1,
    max_size=40,
)


@settings(**SETTINGS)
@given(left=rows_strategy, right=rows_strategy)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    import pyspark.sql.functions as F

    ldf = spark.createDataFrame(left, "k int, t long, lv int").select(
        "k", F.timestamp_seconds("t").alias("t"), "lv"
    )
    rdf = spark.createDataFrame(right, "k int, t long, rv int").select(
        "k", F.timestamp_seconds("t").alias("t"), "rv"
    )
    # pandas asof on tied right-ts picks the LAST row of the sorted
    # frame, Spark's row_number tiebreak is arbitrary → dedup right to
    # one row per (k, t) to make the property well-defined
    rpd = (
        pd.DataFrame(right, columns=["k", "t", "rv"])
        .drop_duplicates(subset=["k", "t"], keep="first")
    )
    rdf = spark.createDataFrame(rpd, "k int, t long, rv int").select(
        "k", F.timestamp_seconds("t").alias("t"), "rv"
    )
    out = layout.asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t", right_cols=["rv"])
    got = sorted(
        (r["k"], int(r["t"].timestamp()), r["lv"], r["r_rv"]) for r in out.collect()
    )

    lpd = pd.DataFrame(left, columns=["k", "t", "lv"]).sort_values(["t", "k", "lv"])
    expected = pd.merge_asof(
        lpd,
        rpd.sort_values("t"),
        on="t",
        by="k",
        direction="backward",
    )
    exp = sorted(
        (int(r.k), int(r.t), int(r.lv), None if pd.isna(r.rv) else int(r.rv))
        for r in expected.itertuples()
    )
    assert got == exp


@settings(**SETTINGS)
@given(rows=rows_strategy, n_salts=st.integers(min_value=1, max_value=8))
def test_salted_sum_matches_plain(spark, rows, n_salts):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, "k int, t long, v int")
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {
        r["k"]: r["sum_v"]
        for r in layout.salted_aggregate(df, ["k"], {"v": "sum"}, n_salts=n_salts).collect()
    }
    assert plain == salted


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="abc XY12.,!", min_size=0, max_size=60), min_size=1, max_size=12
    )
)
def test_tokenizer_cross_engine(spark, duck, texts):
    """The shared tokenizer fragment must agree between Spark and DuckDB
    on arbitrary input, not just the fixture corpus."""
    import duckdb as dd
    import pyspark.sql.functions as F

    from gmall_realtime_ck_spark.operators.text import TOKENS_DUCK, TOKENS_SPARK

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    s_out = {
        r["i"]: list(r["tk"])
        for r in df.select("i", F.expr(TOKENS_SPARK.format(c="text")).alias("tk")).collect()
    }
    con = dd.connect()
    con.execute("CREATE TABLE tt (i int, text varchar)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)])
    d_out = {
        i: list(tk)
        for i, tk in con.execute(
            f"SELECT i, {TOKENS_DUCK.format(c='text')} FROM tt"
        ).fetchall()
    }
    assert s_out == d_out


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000), st.integers(0, 3)),
        min_size=1,
        max_size=30,
    )
)
def test_dedup_keeps_exactly_one_per_key(spark, rows):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "k int, ts long, x int")
    w = Window.partitionBy("k").orderBy("ts", "x")
    out = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    assert out.count() == df.select("k").distinct().count()
    # kept row is the true minimum per key
    kept = {(r["k"]): (r["ts"], r["x"]) for r in out.collect()}
    for k in kept:
        candidates = sorted((t, x) for kk, t, x in rows if kk == k)
        assert kept[k] == candidates[0]


docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=999),  # doc_id (deduped below)
        st.text(alphabet="ab c", min_size=0, max_size=60),  # text
        st.sampled_from(["src0", "src1", "src2"]),  # source
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: r[0],
)


@settings(**SETTINGS)
@given(rows=docs_strategy)
def test_sequence_packing_invariants(spark, rows):
    """Packing invariants on random corpora: (a) cum_tokens_before is
    the per-source running sum in doc_id order, (b) pack_id is its
    budget quotient, (c) within a source, pack_id is non-decreasing."""
    from gmall_realtime_ck_spark.operators.sampling import PACK_BUDGET, sequence_pack_assign

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sorted(
        sequence_pack_assign({"documents": df}).collect(),
        key=lambda r: (r["source"], r["doc_id"]),
    )
    by_source: dict[str, int] = {}
    last_pack: dict[str, int] = {}
    for r in got:
        cum = by_source.get(r["source"], 0)
        assert r["cum_tokens_before"] == cum
        assert r["pack_id"] == cum // PACK_BUDGET
        assert last_pack.get(r["source"], 0) <= r["pack_id"]
        by_source[r["source"]] = cum + r["n_tokens"]
        last_pack[r["source"]] = r["pack_id"]
    assert len(got) == len(rows)


@settings(**SETTINGS)
@given(rows=docs_strategy)
def test_stratified_sample_is_deterministic_pure_function(spark, rows):
    """keep is a pure function of (text, source): identical rows agree
    across runs, and the keep decision matches the declared rate rule."""
    from gmall_realtime_ck_spark.operators.sampling import (
        DEFAULT_RATE, STRATA_RATES, stratified_sample,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got1 = {r["doc_id"]: (r["bucket"], r["rate_permille"], r["keep"])
            for r in stratified_sample({"documents": df}).collect()}
    got2 = {r["doc_id"]: (r["bucket"], r["rate_permille"], r["keep"])
            for r in stratified_sample({"documents": df}).collect()}
    assert got1 == got2
    for doc_id, text, source in rows:
        bucket, rate, keep = got1[doc_id]
        assert rate == STRATA_RATES.get(source, DEFAULT_RATE)
        assert keep == (1 if bucket < rate else 0)


@settings(**SETTINGS)
@given(
    facts=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 99)),
                   min_size=1, max_size=40),
    dim=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 99)),
                 min_size=1, max_size=10, unique_by=lambda r: r[0]),
)
def test_salted_join_matches_plain_join(spark, facts, dim):
    """salted_join must be row-identical to the plain inner join on any
    input, including heavily skewed fact keys."""
    fdf = spark.createDataFrame(facts, "k int, fv int")
    ddf = spark.createDataFrame(dim, "k int, dv int")
    plain = sorted(tuple(r) for r in fdf.join(ddf, "k").collect())
    salted = sorted(tuple(r) for r in layout.salted_join(fdf, ddf, "k").collect())
    assert salted == plain


@settings(**SETTINGS)
@given(
    tokens=st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
                    min_size=1, max_size=200),
    capacity=st.integers(2, 6),
)
def test_space_saving_candidates_superset(spark, tokens, capacity):
    """Phase-1 sketch guarantee: every token with global count >
    n/capacity must appear among the per-partition space-saving
    survivors, for any input distribution and any capacity — the
    property the exact recount of corpus_heavy_tokens relies on."""
    from collections import Counter

    from gmall_realtime_ck_spark.operators.text import _space_saving_candidates

    df = spark.createDataFrame([(t,) for t in tokens], "token string").repartition(3)
    cands = {r[0] for r in _space_saving_candidates(df, capacity=capacity).collect()}
    n = len(tokens)
    heavy = {t for t, c in Counter(tokens).items() if c * capacity > n}
    assert heavy <= cands, f"missed heavy hitters: {heavy - cands}"


docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),  # doc_id (dups possible? no - see below)
        st.sampled_from(["alpha beta gamma", "alpha beta", "delta epsilon zeta",
                         "the quick brown fox", "the quick brown fox jumps"]),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(**SETTINGS)
@given(docs=docs_strategy)
def test_incremental_dedup_invariants(spark, docs):
    """Accepted docs have unique hashes, none of which appear in the
    existing-corpus slice; every incoming doc gets exactly one verdict."""
    from gmall_realtime_ck_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, txt, "en", "src0", len(txt)) for i, txt in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = dedup.incremental_dedup({"documents": df}).collect()
    incoming_ids = {i for i, _ in docs if i % dedup.INCR_MOD == 0}
    assert {r["doc_id"] for r in out} == incoming_ids
    accepted = [r for r in out if r["accept"] == 1]
    # unique hashes among accepted
    hs = [r["h"] for r in accepted]
    assert len(hs) == len(set(hs))
    # no accepted hash exists in the corpus slice
    import hashlib
    corpus_hashes = {
        hashlib.md5(txt.strip().lower().encode()).hexdigest()
        for i, txt in docs if i % dedup.INCR_MOD != 0
    }
    assert not (set(hs) & corpus_hashes)


@settings(**SETTINGS)
@given(
    vals=st.lists(st.floats(min_value=0.01, max_value=500, allow_nan=False),
                  min_size=1, max_size=40)
)
def test_value_tiers_partition_events(spark, vals):
    """The [lo, hi) bands tile [0, ∞): every event lands in exactly one
    tier, so tier counts sum to the event count."""
    from gmall_realtime_ck_spark.operators import relational

    df = spark.createDataFrame(
        [(i, "click", float(v)) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    out = relational.range_join_value_tiers({"events": df}).collect()
    assert sum(r["n_events"] for r in out) == len(vals)


@settings(**SETTINGS)
@given(
    counts=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=25)
)
def test_ewma_lies_within_data_range(spark, counts):
    """The EWMA is a convex combination of trailing observations, so it
    must lie within [min, max] of the series."""
    from gmall_realtime_ck_spark.operators import timeseries
    import pyspark.sql.functions as F

    rows = []
    eid = 0
    for day, ct in enumerate(counts):
        for _ in range(ct % 4):  # keep volumes small; ewma over daily counts
            rows.append((eid, day))
            eid += 1
    if not rows:
        rows = [(0, 0)]
    df = spark.createDataFrame(rows, "event_id long, d int").select(
        "event_id",
        F.lit("click").alias("event_type"),
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,d)").alias("ts"),
        F.lit(1.0).alias("value"),
        F.col("event_id").cast("long").alias("user_id"),
        F.lit("").alias("props"),
    )
    out = timeseries.ts_ewma_control({"events": df}).collect()
    by_type = [r["ct"] for r in out]
    lo, hi = min(by_type), max(by_type)
    for r in out:
        assert lo - 1e-6 <= r["ewma"] <= hi + 1e-6


@settings(**SETTINGS)
@given(
    spends=st.lists(st.integers(min_value=1, max_value=100_000), min_size=10, max_size=60)
)
def test_ntile_deciles_are_balanced(spark, spends):
    """NTILE bucket sizes differ by at most one customer and cover
    everyone exactly once."""
    from gmall_realtime_ck_spark.operators import relational

    df = spark.createDataFrame(
        [(i, i, "O", float(s) / 100.0, "1996-01-01", "1-URGENT")
         for i, s in enumerate(spends)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    out = relational.win_ntile_deciles({"orders": df}).collect()
    sizes = [r["n_customers"] for r in out]
    assert sum(sizes) == len(spends)
    assert max(sizes) - min(sizes) <= 1


# ---------------------------------------------------------------------------
# canon.canonicalize — the ONE driver-shaped canonicalizer behind both
# local gates (pytest + preflight); pure Python, so hypothesis can hit
# it hard without a SparkSession
# ---------------------------------------------------------------------------

_cell = st.one_of(
    st.none(),
    st.integers(min_value=-10**12, max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=12),
    st.booleans(),
)


@given(
    st.integers(min_value=1, max_value=5).flatmap(
        lambda ncols: st.tuples(
            st.lists(
                st.text(
                    alphabet="abcdefghij_", min_size=1, max_size=8
                ),
                min_size=ncols,
                max_size=ncols,
                unique=True,
            ),
            st.lists(
                st.lists(_cell, min_size=ncols, max_size=ncols).map(tuple),
                max_size=30,
            ),
        )
    ),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_canonicalize_invariant_under_row_and_column_permutation(data, rnd):
    """The driver compare is order-insensitive: permuting the rows AND
    consistently permuting the columns of a result must yield the
    identical canonical form — the property the whole oracle-hash gate
    rests on."""
    from gmall_realtime_ck_spark.canon import canonicalize

    columns, rows = data
    base = canonicalize(rows, columns)

    shuffled_rows = list(rows)
    rnd.shuffle(shuffled_rows)
    perm = list(range(len(columns)))
    rnd.shuffle(perm)
    perm_cols = [columns[i] for i in perm]
    perm_rows = [tuple(r[i] for i in perm) for r in shuffled_rows]

    assert canonicalize(perm_rows, perm_cols) == base


def test_canonicalize_mixed_type_str_collision_pinned():
    """Round-11 verdict's falsifying example, pinned as a plain
    regression test (no hypothesis rediscovery needed): int 0 and str
    '0' share `str()` so a sort key without a type discriminator left
    them in INPUT order — two permutations of the same result
    canonicalized differently (canon.py row-sort key)."""
    from gmall_realtime_ck_spark.canon import canonicalize

    rows = [(None,), (None,), (None,), (0,), ("0",)]
    base = canonicalize(rows, ["a"])
    assert canonicalize(list(reversed(rows)), ["a"]) == base
    # and the two str-colliding cells order by type name, deterministically
    assert base[1].index((0,)) < base[1].index(("0",))  # "int" < "str"


@given(st.sampled_from([[1, 2], (1,), {"k": 1}, {1, 2}, b"\x00", bytearray(b"x")]))
@settings(max_examples=6, deadline=None)
def test_canonicalize_rejects_every_nonscalar_kind(bad):
    """bytes/bytearray/list/tuple/dict/set cells must ALL raise — the
    r3 incident class (driver red, local green) and its binary cousin."""
    from gmall_realtime_ck_spark.canon import canonicalize

    with pytest.raises(TypeError):
        canonicalize([(1, bad)], ["a", "b"])


def test_canonicalize_float_rounding_and_none_sort():
    """round(9) unifies float noise below the driver's tolerance, and
    None sorts after every real value (None-aware key) instead of
    raising on the str comparison."""
    from gmall_realtime_ck_spark.canon import canonicalize

    a = canonicalize([(0.1 + 0.2,)], ["x"])
    b = canonicalize([(0.3 + 1e-15,)], ["x"])
    assert a == b
    cols, rows = canonicalize([(None,), (5,), (1,)], ["x"])
    assert rows == [(1,), (5,), (None,)]


@given(
    st.lists(st.booleans(), min_size=0, max_size=60),
)
@settings(max_examples=40, deadline=None)
def test_islands_idiom_matches_python_reference(hits):
    """Triangulate the gaps-and-islands longest-run idiom that both
    engines use for sample_contaminated_spans: Spark and DuckDB verify
    each other through the oracle gate, but they implement the SAME
    pos − row_number() trick — a shared misconception would pass both.
    A naive pure-Python scan is the independent third implementation.
    """
    import duckdb

    expected = 0
    run = 0
    for h in hits:
        run = run + 1 if h else 0
        expected = max(expected, run)

    con = duckdb.connect()
    rows = [(i + 1, h) for i, h in enumerate(hits)]
    if rows:
        con.execute("CREATE TABLE t(pos BIGINT, hit BOOLEAN)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    else:
        con.execute("CREATE TABLE t(pos BIGINT, hit BOOLEAN)")
    got = con.sql(
        """
        WITH h AS (
            SELECT pos, pos - row_number() OVER (ORDER BY pos) AS grp
            FROM t WHERE hit
        ), runs AS (
            SELECT grp, COUNT(*) AS runlen FROM h GROUP BY grp
        )
        SELECT coalesce(MAX(runlen), 0) FROM runs
        """
    ).fetchone()[0]
    assert got == expected, (hits, got, expected)


pct_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.one_of(
            st.integers(min_value=-50, max_value=50),  # heavy int ties
            st.integers(min_value=-(10**9), max_value=10**9),  # sparse
        ),
    ),
    min_size=1,
    max_size=60,
)


@settings(**SETTINGS)
@given(rows=pct_rows, p=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0]))
def test_exact_percentiles_property_vs_builtin(spark, rows, p):
    """exact_percentiles_by_counts ≡ the built-in percentile on random
    keyed integer data (heavy ties, sparse magnitudes, every target
    shape incl. the exact-index endpoints) — bit-for-bit, since the
    helper reproduces Spark's own interpolation float order."""
    import pyspark.sql.functions as F

    from gmall_realtime_ck_spark.operators.relational import (
        exact_percentiles_by_counts,
    )

    df = spark.createDataFrame(rows, "k int, v long")
    want = {
        r["k"]: r["q"]
        for r in df.groupBy("k").agg(F.expr(f"percentile(v, {p})").alias("q")).collect()
    }
    got = {
        r["k"]: r["q"]
        for r in exact_percentiles_by_counts(df, ["k"], "v", {"q": p}).collect()
    }
    assert got == want, (rows, p, got, want)


@settings(**SETTINGS)
@given(
    ids=st.lists(
        st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=50,
        unique=True,
    ),
    b=st.integers(min_value=1, max_value=12),
)
def test_ntile_expr_property_vs_window(spark, ids, b):
    """ntile_expr over a prefix-sum rank ≡ the ntile window for any
    bucket count and any unique id set (sparse, negative, tiny N)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from gmall_realtime_ck_spark.operators.relational import (
        ntile_expr,
        prefix_sum_per_key,
    )

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long").withColumn(
        "_one", F.lit(1).cast("bigint")
    )
    ranked = prefix_sum_per_key(
        df, [], "doc_id", "_one", "rank", bucket_size=None
    ).withColumn("n", F.lit(len(ids)).cast("bigint"))
    got = {
        r["doc_id"]: r["t"]
        for r in ranked.withColumn("t", ntile_expr("rank", "n", b)).collect()
    }
    want = {
        r["doc_id"]: r["d"]
        for r in df.withColumn("d", F.ntile(b).over(Window.orderBy("doc_id"))).collect()
    }
    assert got == want, (ids, b, got, want)


prefix_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),  # key
        st.integers(min_value=-(1 << 40), max_value=1 << 40),  # order value
        st.integers(min_value=-5, max_value=9),  # summed value
    ),
    min_size=0,
    max_size=60,
    unique_by=lambda r: (r[0], r[1]),  # (key, order) unique — the contract
)


@settings(**SETTINGS)
@given(
    rows=prefix_rows,
    mode=st.sampled_from(["lit4096", "lit7", "auto", "inplan"]),
    fractional=st.booleans(),
)
def test_prefix_sum_any_width_mode_equals_window(spark, rows, mode, fractional):
    """prefix_sum_per_key must equal the naive running-sum window
    row-for-row under EVERY width mode (explicit literal, tiny
    literal, eager auto, in-plan auto), on random keys/orders/values
    including negatives, huge sparse ids, and the empty frame — the
    associativity law the whole percentile/rank family rests on."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from gmall_realtime_ck_spark.operators.relational import prefix_sum_per_key

    typ = "double" if fractional else "long"
    data = [(k, float(o) / 3.0 if fractional else o, v) for k, o, v in rows]
    df = spark.createDataFrame(data, f"k string, ord {typ}, v long")
    bucket_size = {"lit4096": 4096, "lit7": 7, "auto": None, "inplan": "inplan"}[mode]
    if fractional and mode in ("lit4096", "lit7"):
        bucket_size = float(bucket_size)
    got = {
        (r["k"], r["ord"]): r["run"]
        for r in prefix_sum_per_key(
            df, ["k"], "ord", "v", "run", bucket_size=bucket_size
        ).collect()
    }
    w = Window.partitionBy("k").orderBy("ord").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        (r["k"], r["ord"]): r["run"]
        for r in df.withColumn("run", F.sum("v").over(w)).collect()
    }
    assert got == want
