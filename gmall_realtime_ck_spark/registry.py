"""Declared query inventory — the single source of truth consumed by
``__spark_entry__.py`` and the tests.

Each entry pairs a Spark builder (dict-of-DataFrames → DataFrame) with
its DuckDB oracle SQL (None ⇒ non-SQL-expressible / approximate ⇒ the
driver records a rows-only check). Keys map to SURVEY.md §2 operator
rows via the builders' docstrings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .catalog import load_tables
from .operators import dedup, layout, privacy, relational, sampling, similarity, stateful, text

_MODULES = [relational, stateful, text, dedup, similarity, layout, sampling, privacy]


def _collect() -> tuple[dict[str, Callable], dict[str, str]]:
    builders: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        for name, fn in mod.BUILDERS.items():
            if name in builders:
                raise ValueError(f"duplicate query name: {name}")
            builders[name] = fn
        oracles.update(mod.ORACLES)
    return builders, oracles


#: batch builders: dict-of-tables → DataFrame
BUILDERS, ORACLES = _collect()


def _collect_streaming() -> tuple[dict[str, Callable], dict[str, str]]:
    from .streaming import pipelines

    return dict(pipelines.STREAM_BUILDERS), pipelines.stream_oracles()


#: streaming builders: (spark, sf_dir) → DataFrame (bounded run)
STREAM_BUILDERS, STREAM_ORACLES = _collect_streaming()
ORACLES = {**ORACLES, **STREAM_ORACLES}


def make_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    if name in STREAM_BUILDERS:
        return STREAM_BUILDERS[name]
    builder = BUILDERS[name]

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tables = load_tables(spark, sf_dir)
        return builder(tables)

    run.__name__ = name
    run.__doc__ = builder.__doc__
    return run


def all_query_names() -> list[str]:
    return sorted([*BUILDERS, *STREAM_BUILDERS])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: make_query(name) for name in all_query_names()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
