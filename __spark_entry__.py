"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``gmall_realtime_ck_spark``; this module only
adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gmall_realtime_ck_spark import registry
from gmall_realtime_ck_spark.catalog import load_tables


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q5_region_revenue: the multi-way broadcast dim-enrichment join +
    aggregation — the Spark-first collapse of the reference's async
    Redis/HBase dimension enrichment (SURVEY.md §2.4 J6).
    """
    tables = load_tables(spark, "/root/testdata/sf0.001")
    from gmall_realtime_ck_spark.operators.relational import q5_region_revenue

    return q5_region_revenue(tables)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (keys without an entry get
    the driver's weaker rows-only check — approximate/streaming ops)."""
    return registry.oracle_sql()
