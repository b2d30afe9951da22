"""Graph analytics on the relational tables.

Complements the iterative label propagation in `dedup.neardup_clusters`
(connected components) with PageRank — the canonical iterative
bulk-synchronous workload. Spark-first shape: each iteration is one
keyed join (edges ⋈ ranks on src) plus one keyed aggregation (sum of
contributions by dst) — the exact two shuffles GraphX/Pregel performs —
over DataFrames, so AQE/codegen apply and the oracle stays pure SQL.

At 100 TB: the edge list is the big side and its partitioning is the
whole game — `und` is built once and reused across iterations, so a
production run would persist it bucketed/pre-partitioned by ``src``
and every iteration's join becomes co-located (no edge re-shuffle;
only the |nodes|-sized rank frame moves). Ranks are O(|nodes|), never
broadcast. A fixed iteration count keeps it oracle-able in unrolled
SQL; convergence-looped variants follow `neardup_clusters`' probe +
localCheckpoint pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: damping factor and fixed iteration count (unrolled in the oracle)
PR_DAMPING = 0.85
PR_ITERS = 3
#: supplier node-id offset — custkey and suppkey ranges overlap
PR_SUPP_OFFSET = 1_000_000_000


def graph_pagerank(t: dict[str, DataFrame]) -> DataFrame:
    """PageRank (3 unrolled iterations, d=0.85) over the undirected
    customer–supplier trade graph: an edge for every distinct
    (customer, supplier) pair that traded (orders ⋈ lineitem).
    Undirected ⇒ no dangling nodes, so the classic update
    pr' = (1-d)/N + d·Σ pr(u)/deg(u) conserves mass without a
    redistribution term. Ranks rounded to 9 decimals (both engines sum
    doubles; agreement far beyond that)."""
    orders = t["orders"].select("o_orderkey", "o_custkey")
    li = t["lineitem"].select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (F.col("l_suppkey") + PR_SUPP_OFFSET).alias("b"),
        )
        .distinct()
    )
    und = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b"))).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    # materialize the edge build ONCE: without this, every unrolled
    # iteration re-executes the orders⋈lineitem + distinct + union
    # lineage (measured 6.2 s → 2.6 s at sf0.1). Production equivalent:
    # persist the edge list bucketed by src.
    # r13: und and deg go LAZY — deg.count() below is a single-
    # reference consumer that materializes both in one job chain,
    # where the eager forms ran a standalone checkpoint job each and
    # then re-ran the groupBy for every later deg reference (the
    # und_deg join and the pr seed both consumed the unpinned deg).
    # und_deg stays EAGER: the unrolled pr chain references it from 3
    # plan positions in ONE job, and a lazy checkpoint materializes
    # per-partition on first touch — concurrent same-job scans could
    # duplicate the join work instead of sharing it.
    und = und.localCheckpoint(eager=False)
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(eager=False)
    n = deg.count()  # O(1) driver scalar (the rel_q22 pattern)
    und_deg = und.join(deg, "src").localCheckpoint()

    pr = deg.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("pr"))
    for _ in range(PR_ITERS):
        contrib = (
            und_deg.join(pr, und_deg.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("mass"))
        )
        pr = contrib.select(
            F.col("dst").alias("node"),
            (F.lit((1.0 - PR_DAMPING) / n) + F.lit(PR_DAMPING) * F.col("mass")).alias("pr"),
        )
    return pr.select("node", F.round("pr", 9).alias("pr"))


def _pr_oracle() -> str:
    d, n_iters, off = PR_DAMPING, PR_ITERS, PR_SUPP_OFFSET
    sql = f"""
        WITH edges AS (
            SELECT DISTINCT o_custkey AS a, l_suppkey + {off} AS b
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ), und AS (
            SELECT a AS src, b AS dst FROM edges
            UNION
            SELECT b AS src, a AS dst FROM edges
        ), deg AS (
            SELECT src, COUNT(*) AS deg FROM und GROUP BY src
        ), nn AS (
            SELECT COUNT(*)::DOUBLE AS n FROM deg
        ), pr0 AS (
            SELECT src AS node, 1.0 / (SELECT n FROM nn) AS pr FROM deg
        )"""
    prev = "pr0"
    for i in range(1, n_iters + 1):
        sql += f""", pr{i} AS (
            SELECT u.dst AS node,
                   (1.0 - {d}) / (SELECT n FROM nn) +
                   {d} * SUM(p.pr / dg.deg) AS pr
            FROM und u
            JOIN {prev} p ON u.src = p.node
            JOIN deg dg ON u.src = dg.src
            GROUP BY u.dst
        )"""
        prev = f"pr{i}"
    sql += f"\n        SELECT node, round(pr, 9) AS pr FROM {prev}"
    return sql


#: Markov power-iteration count (unrolled in the oracle)
MK_ITERS = 4
#: session gap bounding a transition (same 30 min as path analysis)
MK_GAP_MINUTES = 30


def graph_markov_stationary(t: dict[str, DataFrame]) -> DataFrame:
    """Stationary distribution of the event-type Markov chain: build
    the row-stochastic transition matrix from within-session
    consecutive event pairs (the same steps ``path_transition_matrix``
    counts), then 4 unrolled power-iteration steps from the uniform
    vector — "where does a user journey settle", the equilibrium
    reading of the Sankey. Probabilities as exact rationals until the
    final iteration arithmetic (round 9).

    Scale: the transition matrix is |event types|² rows — broadcast-
    sized by construction at ANY event volume, so after the one
    sessionization window + keyed count over events, every iteration
    is arithmetic over a tiny frame. The heavy lifting (the per-user
    lag) is the canonical keyed-window sessionization shape.
    """
    ev = t["events"].select("user_id", "event_type", "ts", "event_id")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {MK_GAP_MINUTES} MINUTES")
    steps = ev.select(
        F.lag("event_type").over(w).alias("src"),
        F.col("event_type").alias("dst"),
        F.lag("ts").over(w).alias("prev_ts"),
        "ts",
    ).filter(F.col("prev_ts").isNotNull() & (F.col("ts") <= F.col("prev_ts") + gap))
    counts = steps.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("ct"))
    totals = counts.groupBy("src").agg(F.sum("ct").alias("tot"))
    P = counts.join(totals, "src").select(
        "src", "dst", (F.col("ct") / F.col("tot")).alias("p")
    )
    # r13: materialize the transition matrix ONCE. P is |event types|²
    # rows, but it was referenced from ~6 plan positions (once per
    # unrolled iteration, plus `states` and the count below) and
    # Catalyst inlines every reference as a plan-tree COPY — so the
    # per-user sessionization window over the FULL events table
    # re-executed ~6× per run (census: 29 Exchanges in the emit plan).
    # One pin runs it once; every power step is then algebra over the
    # tiny checkpointed frame.
    P = P.localCheckpoint()
    states = P.select(F.col("src").alias("state")).distinct()
    n = states.count()  # |event types| — O(1) driver scalar
    pi = states.select("state", F.lit(1.0 / n).alias("pi"))
    for _ in range(MK_ITERS):
        pi = (
            P.join(pi, P.src == pi.state)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("pi")).alias("pi"))
            .select(F.col("dst").alias("state"), "pi")
        )
    return pi.select("state", F.round("pi", 9).alias("pi"))


def _mk_oracle() -> str:
    sql = f"""
        WITH steps AS (
            SELECT lag(event_type) OVER w AS src,
                   event_type AS dst,
                   lag(ts) OVER w AS prev_ts,
                   ts
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), counts AS (
            SELECT src, dst, COUNT(*) AS ct FROM steps
            WHERE prev_ts IS NOT NULL AND ts <= prev_ts + INTERVAL {MK_GAP_MINUTES} MINUTES
            GROUP BY src, dst
        ), pm AS (
            SELECT src, dst, ct::DOUBLE / SUM(ct) OVER (PARTITION BY src) AS p
            FROM counts
        ), nn AS (
            SELECT COUNT(DISTINCT src)::DOUBLE AS n FROM pm
        ), pi0 AS (
            SELECT DISTINCT src AS state, 1.0 / (SELECT n FROM nn) AS pi FROM pm
        )"""
    prev = "pi0"
    for i in range(1, MK_ITERS + 1):
        sql += f""", pi{i} AS (
            SELECT pm.dst AS state, SUM(pm.p * p.pi) AS pi
            FROM pm JOIN {prev} p ON pm.src = p.state
            GROUP BY pm.dst
        )"""
        prev = f"pi{i}"
    sql += f"\n        SELECT state, round(pi, 9) AS pi FROM {prev}"
    return sql


HITS_ITERS = 2


def graph_hits(t: dict[str, DataFrame]) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    customer→supplier trade graph — which customers concentrate
    purchasing across the strongest suppliers, and which suppliers
    aggregate demand from the strongest customers. Two unrolled
    mutual-reinforcement iterations, L1-normalized ONCE at the end:
    the update is a linear map, so intermediate normalizations cancel
    out of the final L1-normalized scores — iterating on raw sums
    saves a driver-scalar job per half-step with mathematically
    identical output (no sqrt anywhere, so the unrolled SQL oracle is
    exact modulo 1e-9 rounding).

    Scale: the edge list materializes once (localCheckpoint, the
    pagerank lesson); each iteration is two keyed join+aggregate
    shuffles over edges; the two final normalizers are 1-row IN-PLAN
    aggregates riding broadcast nested loops (the rel_q22 pattern —
    r13: they were driver ``first()`` scalars, which cost two extra
    job round-trips per execution purely to fetch numbers the plan
    can divide by itself; both aggregate over already-checkpointed
    frames, so the in-plan copies re-read blocks, not the chain).
    Scores rounded to 9 decimals.
    """
    orders = t["orders"].select("o_orderkey", "o_custkey")
    li = t["lineitem"].select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint()
    )
    hub = edges.select("c").distinct().withColumn("h", F.lit(1.0))
    auth = None
    for i in range(HITS_ITERS):
        auth = edges.join(hub, "c").groupBy("s").agg(F.sum("h").alias("a"))
        if i == HITS_ITERS - 1:
            # materialize the chain ONCE at the last authority step so
            # the final hub step, both normalizer scalars, and the
            # returned projection all read the checkpoint instead of
            # re-running every join+aggregate (measured 3× chain cost)
            auth = auth.localCheckpoint()
        hub = edges.join(auth, "s").groupBy("c").agg(F.sum("a").alias("h"))
    hub = hub.localCheckpoint()
    z_a = auth.agg(F.sum("a").alias("_za"))
    z_h = hub.agg(F.sum("h").alias("_zh"))
    return (
        hub.crossJoin(F.broadcast(z_h))
        .select(
            F.col("c").alias("node"),
            F.lit("hub").alias("side"),
            F.round(F.col("h") / F.col("_zh"), 9).alias("score"),
        )
        .unionAll(
            auth.crossJoin(F.broadcast(z_a)).select(
                (F.col("s") + PR_SUPP_OFFSET).alias("node"),
                F.lit("authority").alias("side"),
                F.round(F.col("a") / F.col("_za"), 9).alias("score"),
            )
        )
    )


def _hits_oracle() -> str:
    off = PR_SUPP_OFFSET
    sql = f"""
        WITH e AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey AS s
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ), h0 AS (
            SELECT DISTINCT c, 1.0 AS h FROM e
        )"""
    hub_cte = "h0"
    for i in range(1, HITS_ITERS + 1):
        sql += f""", a{i} AS (
            SELECT e.s, SUM({hub_cte}.h) AS a
            FROM e JOIN {hub_cte} ON e.c = {hub_cte}.c GROUP BY e.s
        ), h{i} AS (
            SELECT e.c, SUM(a{i}.a) AS h
            FROM e JOIN a{i} ON e.s = a{i}.s GROUP BY e.c
        )"""
        hub_cte = f"h{i}"
    # intermediate L1 normalizations cancel out of the final
    # normalized scores (the update is linear) — normalize once here,
    # matching the Spark builder
    sql += f"""
        SELECT c AS node, 'hub' AS side,
               round(h / (SELECT SUM(h) FROM {hub_cte}), 9) AS score
        FROM {hub_cte}
        UNION ALL
        SELECT s + {off} AS node, 'authority' AS side,
               round(a / (SELECT SUM(a) FROM a{HITS_ITERS}), 9) AS score
        FROM a{HITS_ITERS}
    """
    return sql


ORACLES: dict[str, str] = {
    "graph_pagerank": _pr_oracle(),
    "graph_markov_stationary": _mk_oracle(),
    "graph_hits": _hits_oracle(),
}

BUILDERS = {
    "graph_pagerank": graph_pagerank,
    "graph_markov_stationary": graph_markov_stationary,
    "graph_hits": graph_hits,
}
