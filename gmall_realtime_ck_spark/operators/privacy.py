"""PII detection / redaction operators (training-data pipeline).

Before corpus text is used for training, contact strings (emails, phone
numbers, ids) are detected and masked. Everything here is JVM-side
``regexp_count`` / ``regexp_replace`` — no Python in the loop, so the
scan parallelizes per input split and survives a 100× scale-up with no
shuffle at all (pure map).

The driver's synthetic documents contain no PII, so the operator first
derives a contact-annotated text column deterministically from
``doc_id`` (same derivation in the DuckDB oracle) — the regex pipeline
is exercised end-to-end on both engines with non-trivial hit counts.

Patterns are written in the common Java-regex ∩ RE2 dialect so Spark
and DuckDB compile them identically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _resolve_pepper(env_key: str, test_seam: str) -> str:
    """Resolve a secret pepper at module import: the injected value
    from ``env_key`` when present (production — KMS/launcher exports
    it; the literal never appears in the repo or the release), else
    the pinned ``test_seam`` literal so tests, the DuckDB oracle, and
    driver re-runs draw identical noise / pseudonyms with zero setup.

    The silent fallback is what r11 ADVICE #1 warns about — a deploy
    that forgets the export would ship publicly-recomputable noise —
    so ``GMALL_REQUIRE_PEPPER=1`` (set in production launchers) turns
    the fallback into a hard failure. A PRESENT-but-EMPTY env var is a
    configuration error in every mode (ADVICE r12 #2): the deploy
    attempted injection and something upstream truncated it — falling
    back silently would ship the public pepper while the operator
    believes a secret one is live. Resolution happens ONCE at import,
    before any SQL text is built, so the Spark expression, the batch
    oracle, and the streaming oracle all embed the SAME resolved value
    (a mid-session env change cannot desynchronize the engines).

    Exposure note (ADVICE r12 #2): the resolved pepper is embedded as
    an inline literal in the generated SQL/expression text, so it
    surfaces anywhere that text does — ``EXPLAIN`` output, the Spark
    UI's SQL tab, event logs, and DuckDB query logs. Deployments whose
    threat model includes plan/log readers must either restrict those
    surfaces (UI/event-log ACLs — the usual posture, since plans also
    leak table names and literals) or rotate the pepper on exposure;
    binding it as a session conf would still surface it in
    ``SET``/environment dumps, so ACLing the observability surface is
    the effective control, not literal-vs-parameter plumbing.
    """
    injected = os.environ.get(env_key)
    if injected:
        return injected
    if injected is not None:  # present but empty — attempted injection
        raise RuntimeError(
            f"{env_key} is set but EMPTY — the deploy attempted pepper "
            "injection and delivered no value; refusing to silently fall "
            "back to the public repo-pinned test pepper. Unset the "
            "variable to opt into the test pepper explicitly."
        )
    if os.environ.get("GMALL_REQUIRE_PEPPER") == "1":
        raise RuntimeError(
            f"GMALL_REQUIRE_PEPPER=1 but {env_key} is not set — refusing to "
            "fall back to the public repo-pinned test pepper (its noise "
            "would be recomputable by any observer)"
        )
    return test_seam

# common-dialect patterns (no lookarounds, no backrefs)
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

# deterministic contact annotation: every 3rd doc gets an email, every
# 4th a phone number — derived from doc_id only, so the oracle can
# reproduce it exactly.
_ANNOT_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', cast(doc_id AS string), '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN concat(' call +1-555-', lpad(cast(doc_id % 10000 AS string), 4, '0')) ELSE '' END)"
)
_ANNOT_DUCK = (
    "concat(text,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', doc_id::VARCHAR, '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN concat(' call +1-555-', lpad((doc_id % 10000)::VARCHAR, 4, '0')) ELSE '' END)"
)


def pii_redaction(t: dict[str, DataFrame]) -> DataFrame:
    """Detect and mask emails / phone numbers per document; emit the
    redacted text plus per-category hit counts (the audit columns a
    privacy pipeline logs). Map-only: no shuffle, full pushdown.
    """
    docs = t["documents"]
    annotated = docs.select("doc_id", F.expr(_ANNOT_SPARK).alias("raw"))
    return annotated.select(
        "doc_id",
        F.regexp_count("raw", F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count("raw", F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("raw", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )


#: k-anonymity threshold: quasi-identifier groups smaller than this are
#: re-identification risks
K_ANON = 5


def k_anonymity_audit(t: dict[str, DataFrame]) -> DataFrame:
    """k-anonymity audit over the events table: treat (event_type, day,
    value tier) as the quasi-identifier tuple a release would expose,
    and report each equivalence class with its size and a risk flag
    (size < k ⇒ the class's members are re-identifiable) — the
    structural-privacy complement of the regex PII scrub (Sweeney
    2002; Deequ has no analogue, every data-release checklist does).

    Scale: one keyed count over the quasi-identifier — map-side
    combinable; the audit output is |classes| rows, and the downstream
    suppress/generalize step is a broadcast-joinable filter on the
    same key.
    """
    ev = t["events"]
    qi = ev.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.expr(
            "CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid' ELSE 'high' END"
        ).alias("value_tier"),
    )
    return (
        qi.groupBy("event_type", "day", "value_tier")
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            "event_type",
            "day",
            "value_tier",
            "class_size",
            (F.col("class_size") < K_ANON).cast("bigint").alias("at_risk"),
        )
    )


#: l-diversity threshold: a QI class needs ≥ L distinct sensitive
#: values or membership still leaks the sensitive attribute
L_DIVERSE = 3


def l_diversity_audit(t: dict[str, DataFrame]) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the
    k-anonymity follow-up: a quasi-identifier class can be large (k-ok)
    yet still leak if every member shares the same SENSITIVE value, so
    each class must also carry ≥ L distinct sensitive values. Same QI
    tuple as :func:`k_anonymity_audit` with ``user_id`` (mod a cohort
    size) as the sensitive attribute; reports class size, distinct
    sensitive count, and the at-risk flag (distinct < L).

    Scale: one keyed aggregation with countDistinct — Spark expands it
    to a two-phase partial-distinct aggregate (map-side dedup first),
    so the shuffle carries (QI, sensitive)-distinct rows, not events.
    """
    ev = t["events"]
    qi = ev.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.expr(
            "CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid' ELSE 'high' END"
        ).alias("value_tier"),
        (F.col("user_id") % 50).alias("sensitive"),
    )
    return (
        qi.groupBy("event_type", "day", "value_tier")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct("sensitive").alias("n_sensitive"),
        )
        .select(
            "event_type",
            "day",
            "value_tier",
            "class_size",
            "n_sensitive",
            (F.col("n_sensitive") < L_DIVERSE).cast("bigint").alias("at_risk"),
        )
    )


#: t-closeness threshold in 1e-6 EMD units: classes whose sensitive
#: distribution sits further than this from the global one leak.
T_CLOSE_E6 = 200000


def t_closeness_audit(t: dict[str, DataFrame]) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    third leg of the release-privacy triad after
    :func:`k_anonymity_audit` / :func:`l_diversity_audit`: a class can
    be big (k-ok) and varied (l-ok) yet still leak if its sensitive
    distribution is far from the corpus-wide one (e.g. a class that is
    90% one cohort when the population is 2%). Distance is the earth
    mover's distance for an ordered attribute:
    EMD = (1/(m−1)) Σᵢ |Σ_{j≤i}(Pⱼ−Qⱼ)|.

    INTEGER-exact: both distributions quantize to 1e-6 units with
    truncating division (identical on both engines), so cumulative
    sums stay ≤ m·10⁶ at ANY corpus size — no N² products that would
    overflow int64 on a 10¹⁰-event table.

    Scale: three keyed aggregations (class×sensitive, class, global),
    then class-level algebra: the dense (class × sensitive-domain)
    grid joins each class to the m-row global distribution (broadcast
    — the domain is an aggregate, never event-sized) and the EMD
    window partitions by class over ≤ m rows.
    """
    ev = t["events"]
    qi = ev.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.expr(
            "CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid' ELSE 'high' END"
        ).alias("value_tier"),
        (F.col("user_id") % 50).alias("sensitive"),
    )
    cls_sens = qi.groupBy("event_type", "day", "value_tier", "sensitive").agg(
        F.count(F.lit(1)).alias("ct")
    )
    return t_closeness_from_class_counts(cls_sens)


def t_closeness_from_class_counts(cls_sens: DataFrame) -> DataFrame:
    """EMD audit algebra over pre-aggregated (QI, sensitive) counts —
    the shared spine of the batch audit and the streaming twin (which
    maintains ``cls_sens`` continuously and re-runs this class-level
    algebra per poll; only the first aggregation is event-sized)."""
    from pyspark.sql import Window

    cls = cls_sens.groupBy("event_type", "day", "value_tier").agg(
        F.sum("ct").alias("class_size")
    )
    glob = cls_sens.groupBy("sensitive").agg(F.sum("ct").alias("g_ct"))
    totals = glob.agg(
        F.sum("g_ct").alias("n_total"), F.count(F.lit(1)).alias("m_dom")
    )
    qdist = glob.crossJoin(F.broadcast(totals)).select(
        "sensitive",
        F.expr("(g_ct * 1000000) div n_total").alias("q_e6"),
        "m_dom",
    )
    # the grid and the probe side both descend from cls_sens; when
    # that shared parent is a named view (the streaming twin's memory
    # table) self-join alias resolution gets confused, so break the
    # lineage by renaming the probe side's columns before the join —
    # every join key then has a globally unique name
    probe = cls_sens.select(
        F.col("event_type").alias("s_event_type"),
        F.col("day").alias("s_day"),
        F.col("value_tier").alias("s_value_tier"),
        F.col("sensitive").alias("s_sensitive"),
        "ct",
    )
    grid = (
        cls.crossJoin(F.broadcast(qdist))
        .join(
            probe,
            (F.col("event_type") == F.col("s_event_type"))
            & (F.col("day") == F.col("s_day"))
            & (F.col("value_tier") == F.col("s_value_tier"))
            & (F.col("sensitive") == F.col("s_sensitive")),
            "left",
        )
        .select(
            "event_type",
            "day",
            "value_tier",
            "sensitive",
            "class_size",
            "m_dom",
            F.expr("(coalesce(ct, 0) * 1000000) div class_size").alias("p_e6"),
            "q_e6",
        )
    )
    w = (
        Window.partitionBy("event_type", "day", "value_tier")
        .orderBy("sensitive")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("event_type", "day", "value_tier").orderBy(
        F.desc("sensitive")
    )
    cum = grid.withColumn("cum_d", F.sum(F.col("p_e6") - F.col("q_e6")).over(w)).withColumn(
        "rn_last", F.row_number().over(wr)
    )
    return (
        cum.filter(F.col("rn_last") > 1)  # EMD sums the first m-1 cumulants
        .groupBy("event_type", "day", "value_tier")
        .agg(
            F.max("class_size").alias("class_size"),
            F.expr("sum(abs(cum_d)) div (max(m_dom) - 1)").alias("emd_e6"),
        )
        .select(
            "event_type",
            "day",
            "value_tier",
            "class_size",
            "emd_e6",
            (F.col("emd_e6") > T_CLOSE_E6).cast("bigint").alias("at_risk"),
        )
    )


#: deterministic pseudonymization pepper — injected via
#: ``GMALL_PSEUDO_PEPPER`` in production (KMS-backed), pinned literal
#: fallback as the test/oracle reproducibility seam (see
#: ``_resolve_pepper`` for the strict-mode contract)
PSEUDO_PEPPER = _resolve_pepper("GMALL_PSEUDO_PEPPER", "pepper-v1")


def pseudonymize_users(t: dict[str, DataFrame]) -> DataFrame:
    """Deterministic keyed pseudonymization (GDPR art. 4(5)): replace
    every user id with a keyed-hash pseudonym (md5 over a pepper ‖ id
    — production swaps in HMAC-SHA256 with a KMS secret, same shape)
    and emit the per-pseudonym activity profile. Deterministic keyed
    hashing preserves JOINABILITY across tables and days — the
    property that makes pseudonymized analytics work at all — while
    the audit columns prove the mapping stayed injective on this
    corpus (n_users = 1 per pseudonym; a collision would surface
    immediately as n_users > 1).

    Scale: a pure-map hash over the scan + one keyed rollup; no
    lookup table to distribute (that is the POINT of keyed hashing vs
    tokenization — stateless, shuffle-free pseudonym assignment).
    """
    ev = t["events"]
    pseudo = ev.select(
        F.substring(
            F.md5(F.concat(F.lit(PSEUDO_PEPPER + ":"), F.col("user_id").cast("string"))),
            1,
            16,
        ).alias("pseudonym"),
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    return (
        pseudo.groupBy("pseudonym")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("event_type").alias("n_types"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
    )


#: ε for the differential-privacy count release (Laplace b = Δf/ε = 1/ε
#: for a count query with sensitivity 1).
DP_EPSILON = 1.0
#: noise-quantization levels: the Laplace inverse CDF is precomputed in
#: Python at these u-levels and inlined as a 256-double LITERAL array
#: in both engines, so the release is bit-reproducible across
#: Spark/DuckDB with zero transcendental-ulp risk (ln in two libm
#: implementations may differ in the last ulp; a shared literal table
#: cannot). 256 levels quantize the noise CDF to ~0.4% — still a valid
#: noise mechanism, and the seam to swap is documented below.
_DP_LEVELS = 256


def _dp_noise_table() -> list[float]:
    import math

    b = 1.0 / DP_EPSILON
    out = []
    for h in range(_DP_LEVELS):
        u = (h + 0.5) / _DP_LEVELS  # (0,1), never exactly 0.5
        c = u - 0.5
        out.append(-b * math.copysign(1.0, c) * math.log(1.0 - 2.0 * abs(c)))
    return out


_DP_NOISE = _dp_noise_table()
_DP_NOISE_SPARK = "array(" + ", ".join(f"cast({v!r} as double)" for v in _DP_NOISE) + ")"
_DP_NOISE_DUCK = "[" + ", ".join(f"{v!r}::DOUBLE" for v in _DP_NOISE) + "]"
#: secret pepper mixed into the noise index — the PSEUDO_PEPPER
#: pattern. The draw must be a SECRET-KEYED PRF of the cell key: a
#: hash of the public key alone would let any observer recompute and
#: subtract the noise exactly (ε effectively ∞ — r10 ADVICE #1). In
#: production this value is a real secret (KMS / env injection, never
#: the release); THIS literal is the test-only reproducibility seam so
#: the DuckDB oracle and re-runs draw identical noise. Keying per cell
#: (pepper ‖ type ‖ day) keeps re-releases of the same cell identical,
#: so an observer cannot average fresh noise away either. Injected via
#: ``GMALL_DP_PEPPER`` in production (r11 ADVICE: the seam must exist,
#: not just be advertised); the pinned literal is the no-env fallback
#: unless ``GMALL_REQUIRE_PEPPER=1`` forbids it.
DP_PEPPER = _resolve_pepper("GMALL_DP_PEPPER", "dp-pepper-v1")


def dp_idx_spark(pepper: str) -> str:
    """Spark SQL text for the 1-based noise-table index: a peppered
    PRF of the (event_type, day) cell key. Kept as a builder (not a
    baked literal) so the expression provably derives from whatever
    pepper was RESOLVED — the injection seam's unit tests build it
    with a non-default pepper and assert the text tracks it."""
    return (
        "cast(conv(substring(md5(concat("
        f"'{pepper}:', event_type, '|', day)), 1, 2), 16, 10) as int) + 1"
    )


def dp_idx_duck(pepper: str) -> str:
    """DuckDB twin of :func:`dp_idx_spark` — same pepper, same md5
    input bytes, same 1-based index."""
    return f"('0x' || substr(md5('{pepper}:' || event_type || '|' || day), 1, 2))::INT + 1"


_DP_IDX_SPARK = dp_idx_spark(DP_PEPPER)
_DP_IDX_DUCK = dp_idx_duck(DP_PEPPER)


def dp_noisy_counts(counts: DataFrame) -> DataFrame:
    """The DP-release algebra over a pre-aggregated (event_type, day,
    n) counts frame — shared by the batch ``privacy_dp_counts`` and
    the ``flow_dp_counts`` streaming poll step. Pure map over the
    |cells| rows: noise lookup, clamp at 0 (counts are non-negative by
    postprocessing — free under DP), round 6 for cross-engine hashing.
    """
    return counts.select(
        "event_type",
        "day",
        F.round(
            F.greatest(
                F.col("n") + F.expr(f"element_at({_DP_NOISE_SPARK}, {_DP_IDX_SPARK})"),
                F.lit(0.0),
            ),
            6,
        ).alias("noisy_count"),
    )


#: top-K event types per day surfaced on the DP dashboard card
DP_CARD_TOPK = 5


def dp_release_card(noisy: DataFrame) -> DataFrame:
    """The dashboard drill-through over the DP release — the
    ``/province``-style per-dimension amount card the reference's
    publisher renders (PUB/controller/TradeStatsController.java:54-88
    builds mapData name/value rows per dimension member), re-pointed at
    the RELEASED noisy counts so the dashboard never touches raw
    counts: publisher parity for the privacy ladder's top rung. Per
    day: the top-``DP_CARD_TOPK`` event types by noisy count (ties by
    type), each with its rank, the day's released total and an exact
    permille share.

    Determinism across engines: the released values are already
    round-6 doubles, so totals are summed in exact integer MICROS
    (``round(x·1e6)`` of the same double is the same integer in both
    engines — the cents pattern) and the share is
    ``floor(1000·micros/total)`` (IEEE double division + floor,
    identical both sides); a parallel double SUM would be
    summation-order-dependent and hash-unstable.

    Scale: the rank partitions by day over |types|-row release cells
    and is filtered ``rk <= K``, so the optimizer plans a
    WindowGroupLimit (plan-visible bound — the rank sweep needs no
    allowlist entry); day totals are a keyed aggregate over the same
    release cells, broadcast back. Nothing here ever touches raw
    events — the card reads the |types|·|days| release table only.
    """
    from pyspark.sql import Window

    micros = F.expr("cast(round(noisy_count * 1e6) as bigint)")
    w = Window.partitionBy("day").orderBy(F.col("noisy_count").desc(), "event_type")
    tot = (
        noisy.select("day", micros.alias("nm"))
        .groupBy(F.col("day").alias("t_day"))
        .agg(F.sum("nm").alias("day_total_micros"))
    )
    ranked = (
        noisy.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DP_CARD_TOPK)
        .withColumn("nm", micros)
    )
    return (
        ranked.join(F.broadcast(tot), F.col("day") == F.col("t_day"))
        .select(
            "day",
            "event_type",
            "noisy_count",
            "rk",
            "day_total_micros",
            F.expr(
                "cast(floor(1000.0 * nm / greatest(day_total_micros, 1)) as bigint)"
            ).alias("share_permille"),
        )
    )


def dp_release_card_query(t: dict[str, DataFrame]) -> DataFrame:
    """``privacy_dp_release_card`` — the DP release card over the
    events table (dp_count_release → dp_release_card)."""
    return dp_release_card(dp_count_release(t))


def dp_count_release(t: dict[str, DataFrame]) -> DataFrame:
    """Differentially-private count release (Dwork et al. 2006): the
    per-(event_type, day) activity counts with Laplace(1/ε) noise —
    the publishable analytics card a privacy team releases instead of
    raw counts, and the fourth rung of this module's release ladder
    (redact → k-anon/l-div/t-close audits → pseudonymize → DP release).
    Noise draws are quantized-inverse-CDF Laplace indexed by a
    peppered PRF of the cell key (see ``DP_PEPPER`` — secret in
    production, a pinned literal here as the test/oracle
    reproducibility seam), clamped at 0.

    Scale: ONE keyed count with map-side partials over the event scan,
    then a pure-map noise lookup over the |types|·|days| release cells
    — nothing else shuffles, nothing sorts, no per-row Python.
    """
    ev = t["events"]
    counts = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return dp_noisy_counts(counts)


ORACLES: dict[str, str] = {
    "privacy_dp_counts": f"""
        WITH counts AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   COUNT(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, day,
               round(greatest(n + ({_DP_NOISE_DUCK})[{_DP_IDX_DUCK}], 0.0), 6)
                   AS noisy_count
        FROM counts
    """,
    "privacy_dp_release_card": f"""
        WITH counts AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   COUNT(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        ), release AS (
            SELECT event_type, day,
                   round(greatest(n + ({_DP_NOISE_DUCK})[{_DP_IDX_DUCK}], 0.0), 6)
                       AS noisy_count
            FROM counts
        ), m AS (
            SELECT *, CAST(round(noisy_count * 1e6) AS BIGINT) AS nm FROM release
        ), r AS (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY day
                       ORDER BY noisy_count DESC, event_type
                   ) AS rk,
                   CAST(SUM(nm) OVER (PARTITION BY day) AS BIGINT)
                       AS day_total_micros
            FROM m
        )
        SELECT day, event_type, noisy_count, rk, day_total_micros,
               CAST(floor(1000.0 * nm / greatest(day_total_micros, 1)) AS BIGINT)
                   AS share_permille
        FROM r WHERE rk <= {DP_CARD_TOPK}
    """,
    "privacy_pseudonymize": f"""
        SELECT substring(md5('{PSEUDO_PEPPER}:' || user_id::VARCHAR), 1, 16) AS pseudonym,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(DISTINCT event_type) AS n_types,
               MIN(strftime(ts, '%Y-%m-%d')) AS first_day,
               MAX(strftime(ts, '%Y-%m-%d')) AS last_day
        FROM events
        GROUP BY 1
    """,
    "privacy_l_diversity": f"""
        SELECT event_type,
               strftime(ts, '%Y-%m-%d') AS day,
               CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid' ELSE 'high' END AS value_tier,
               COUNT(*) AS class_size,
               COUNT(DISTINCT user_id % 50) AS n_sensitive,
               (COUNT(DISTINCT user_id % 50) < {L_DIVERSE})::BIGINT AS at_risk
        FROM events
        GROUP BY 1, 2, 3
    """,
    "privacy_t_closeness": f"""
        WITH qi AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid' ELSE 'high' END AS value_tier,
                   user_id % 50 AS sensitive
            FROM events
        ), cls_sens AS (
            SELECT event_type, day, value_tier, sensitive, COUNT(*) AS ct
            FROM qi GROUP BY 1, 2, 3, 4
        ), cls AS (
            SELECT event_type, day, value_tier, SUM(ct)::BIGINT AS class_size
            FROM cls_sens GROUP BY 1, 2, 3
        ), gdist AS (
            SELECT sensitive, COUNT(*) AS g_ct FROM qi GROUP BY sensitive
        ), totals AS (
            SELECT SUM(g_ct)::BIGINT AS n_total, COUNT(*)::BIGINT AS m_dom FROM gdist
        ), qdist AS (
            SELECT sensitive, ((g_ct * 1000000) // n_total)::BIGINT AS q_e6, m_dom
            FROM gdist, totals
        ), grid AS (
            SELECT c.event_type, c.day, c.value_tier, q.sensitive,
                   c.class_size, q.m_dom,
                   ((coalesce(s.ct, 0) * 1000000) // c.class_size)::BIGINT AS p_e6,
                   q.q_e6
            FROM cls c CROSS JOIN qdist q
            LEFT JOIN cls_sens s
              ON s.event_type = c.event_type AND s.day = c.day
             AND s.value_tier = c.value_tier AND s.sensitive = q.sensitive
        ), cum AS (
            SELECT event_type, day, value_tier, sensitive, class_size, m_dom,
                   SUM(p_e6 - q_e6) OVER (PARTITION BY event_type, day, value_tier
                                          ORDER BY sensitive
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_d,
                   row_number() OVER (PARTITION BY event_type, day, value_tier
                                      ORDER BY sensitive DESC) AS rn_last
            FROM grid
        )
        SELECT event_type, day, value_tier,
               MAX(class_size)::BIGINT AS class_size,
               (SUM(ABS(cum_d)) // (MAX(m_dom) - 1))::BIGINT AS emd_e6,
               ((SUM(ABS(cum_d)) // (MAX(m_dom) - 1)) > {T_CLOSE_E6})::BIGINT AS at_risk
        FROM cum WHERE rn_last > 1
        GROUP BY 1, 2, 3
    """,
    "privacy_k_anonymity": f"""
        SELECT event_type,
               strftime(ts, '%Y-%m-%d') AS day,
               CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid' ELSE 'high' END AS value_tier,
               COUNT(*) AS class_size,
               (COUNT(*) < {K_ANON})::BIGINT AS at_risk
        FROM events
        GROUP BY 1, 2, 3
    """,
    "text_pii_redaction": f"""
        WITH annotated AS (
            SELECT doc_id, {_ANNOT_DUCK} AS raw FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(raw, '{EMAIL_RE}'))::BIGINT AS n_emails,
               len(regexp_extract_all(raw, '{PHONE_RE}'))::BIGINT AS n_phones,
               regexp_replace(regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g') AS redacted
        FROM annotated
    """,
}

BUILDERS = {
    "text_pii_redaction": pii_redaction,
    "privacy_k_anonymity": k_anonymity_audit,
    "privacy_l_diversity": l_diversity_audit,
    "privacy_t_closeness": t_closeness_audit,
    "privacy_pseudonymize": pseudonymize_users,
    "privacy_dp_counts": dp_count_release,
    "privacy_dp_release_card": dp_release_card_query,
}
