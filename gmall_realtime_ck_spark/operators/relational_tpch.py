"""Remaining TPC-H query shapes (q4, q9, q12, q15, q20, q21) — the
last six of the 22 classic shapes not yet covered by
``operators/relational.py`` (q1/2/3/5/6/7/8/10/11/13/14/16/17/18/19/22
live there under the names mapped in COVERAGE.md).

The testdata is TPC-H-ish but narrower than spec (no ``partsupp``, no
``l_commitdate``/``l_receiptdate``/``l_shipmode``), so each query keeps
the *shape* — the join topology, correlation pattern, and aggregation
structure that stress the planner — with predicates adapted to the
columns that exist. Lateness is expressed as ``l_shipdate`` overshooting
``o_orderdate`` by an interval; supply cost as ``p_retailprice``.

Reference parity: these extend the serving/DWS relational surface
(PUB/mapper/TradeStatsMapper.java:31, PUB/service/impl — multi-table
GROUP BY/HAVING endpoints) the same way relational.py's rel_q* family
does; the semi/anti correlation shapes mirror the reference's
existence-style filters (DWD:trade-order-refund/.../DwdTradeOrderRefund.java:47-55
filters on the presence of a prior state in the CDC envelope).

Determinism: all money/quantity sums go through integer cents
(``CAST(ROUND(x*100) AS BIGINT)``), oracles cast every aggregate to
``::BIGINT`` (DuckDB SUM(BIGINT) is HUGEINT otherwise — the r1 lesson),
and every LIMIT carries a full tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import cents


def ship_priority_semi(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H-Q4-shaped order-priority checking: count 1997 orders per
    priority that have at least one line shipped >30 days after the
    order date (EXISTS → left-semi join with a non-equi residual).

    Scale: the order-date range filter pushes to the orders scan; the
    semi join shuffles both sides on orderkey once and emits at most
    one row per order (no pair materialization); the final groupBy has
    five groups — map-side partials collapse it to one tiny shuffle.
    """
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def supplier_nation_profit(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H-Q9-shaped product-profit rollup: profit on widget parts by
    supplier nation × ship year, where profit = discounted revenue
    minus retail-priced cost (the testdata has no partsupp, so
    ``p_retailprice`` stands in for ``ps_supplycost``).

    Scale: part (name-filtered), supplier, and nation are broadcast —
    lineitem never shuffles for the joins; the only exchange is the
    final (nation, year) aggregate, pre-shrunk by map-side partials.
    """
    part = t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey", "p_retailprice")
    sup = t["supplier"].select("s_suppkey", "s_nationkey")
    nation = t["nation"].select("n_nationkey", "n_name")
    profit = cents("l_extendedprice * (1 - l_discount)") - cents("p_retailprice * l_quantity")
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).alias("profit_cents"))
    )


def ship_returnflag_priority(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H-Q12-shaped conditional priority counts: for 1997-shipped
    lines arriving >45 days after the order date, count high-priority
    vs low-priority orders per return flag (``l_returnflag`` stands in
    for the absent ``l_shipmode``).

    Scale: the shipdate range pushes to the lineitem scan before the
    join; orders and lineitem shuffle on orderkey once; the CASE
    counters fold into one 3-group aggregate with map-side partials.
    """
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def supplier_top_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H-Q15-shaped top supplier: suppliers whose 1996-Q1 shipped
    revenue equals the global maximum (equality with MAX, ties kept —
    the spec's REVENUE-view pattern).

    Scale: revenue aggregates lineitem down to one row per supplier;
    the 1-row MAX re-joins as a broadcast (no driver collect, no
    global sort); supplier attributes arrive via broadcast join.
    """
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(cents("l_extendedprice * (1 - l_discount)")).alias("total_revenue_cents"))
    )
    mx = rev.agg(F.max("total_revenue_cents").alias("max_revenue_cents"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue_cents") == F.col("max_revenue_cents"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_cents")
    )


def rel_q20_surplus_suppliers(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H-Q20-shaped surplus detection: suppliers having some widget
    part whose 1998 shipped quantity exceeds half that pair's all-time
    shipped quantity (no ``ps_availqty`` in the testdata, so the
    half-threshold correlates against the pair's own history), with
    nation attribution. Stated integer-exact as ``2*qty_1998 > qty_all``.

    Scale: widget parts broadcast into lineitem; one (suppkey, partkey)
    aggregate with map-side partials; the qualifying-pair set collapses
    to distinct suppkeys before a left-semi join against the (small)
    supplier table; nation is broadcast.
    """
    widget = t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey")
    pair = (
        t["lineitem"]
        .join(F.broadcast(widget), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("qty_cents", cents("l_quantity"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(F.year("l_shipdate") == 1998, F.col("qty_cents")).otherwise(F.lit(0))
            ).alias("qty_1998"),
            F.sum("qty_cents").alias("qty_all"),
        )
        .filter(F.col("qty_1998") * 2 > F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(pair, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


def rel_q21_waiting_suppliers(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H-Q21-shaped sole-late-supplier hunt: for finalized orders
    ('F') with lines from multiple suppliers, find the suppliers who
    were the *only* late shipper (late = shipped >60 days after the
    order date) — the double-correlation EXISTS(other supplier) AND
    NOT EXISTS(other late supplier), as one semi and one anti join.

    Scale: lines collapse to distinct (order, supplier, any-late)
    triples first, so the semi/anti joins run over one row per
    order-supplier pair, never per line; both correlate on orderkey
    (equi hash join) with the supplier inequality as a residual. The
    final per-supplier count is a tiny aggregate; the top-5 sort orders
    |supplier| rows with a full tie-break.
    """
    lines = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("is_late"),
        )
    )
    pairs = lines.groupBy("l_orderkey", "l_suppkey").agg(F.max("is_late").alias("is_late"))
    late = pairs.filter(F.col("is_late")).select("l_orderkey", "l_suppkey")
    other = pairs.select(F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key"))
    other_late = late.select(F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key"))
    sole = (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("o2_key")) & (F.col("l_suppkey") != F.col("s2_key")),
            "left_semi",
        ).join(
            other_late,
            (F.col("l_orderkey") == F.col("o3_key")) & (F.col("l_suppkey") != F.col("s3_key")),
            "left_anti",
        )
    )
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(5)
    )


ORACLES: dict[str, str] = {
    "ship_priority_semi": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority
    """,
    "supplier_nation_profit": """
        SELECT n_name AS nation,
               EXTRACT(year FROM l_shipdate)::BIGINT AS o_year,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                   - CAST(ROUND(p_retailprice * l_quantity * 100) AS BIGINT))::BIGINT
                   AS profit_cents
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
    """,
    "ship_returnflag_priority": """
        SELECT l_returnflag,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 45 DAY
        GROUP BY l_returnflag
    """,
    "supplier_top_revenue": """
        WITH rev AS (
            SELECT l_suppkey,
                   SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))::BIGINT
                       AS total_revenue_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue_cents
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM rev)
    """,
    "rel_q20_surplus_suppliers": """
        SELECT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%widget%'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CASE WHEN EXTRACT(year FROM l_shipdate) = 1998
                            THEN CAST(ROUND(l_quantity * 100) AS BIGINT)
                            ELSE 0 END) * 2
                 > SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
        )
    """,
    "rel_q21_waiting_suppliers": """
        WITH pairs AS (
            SELECT l_orderkey, l_suppkey,
                   MAX(l_shipdate > o_orderdate + INTERVAL 60 DAY) AS is_late
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY l_orderkey, l_suppkey
        ),
        late AS (SELECT l_orderkey, l_suppkey FROM pairs WHERE is_late)
        SELECT s_name, COUNT(*) AS numwait
        FROM late l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (SELECT 1 FROM pairs p2
                      WHERE p2.l_orderkey = l1.l_orderkey
                        AND p2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 5
    """,
}

BUILDERS = {
    "ship_priority_semi": ship_priority_semi,
    "supplier_nation_profit": supplier_nation_profit,
    "ship_returnflag_priority": ship_returnflag_priority,
    "supplier_top_revenue": supplier_top_revenue,
    "rel_q20_surplus_suppliers": rel_q20_surplus_suppliers,
    "rel_q21_waiting_suppliers": rel_q21_waiting_suppliers,
}
