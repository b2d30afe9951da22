from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from gmall_realtime_ck_spark.session import get_spark
    from gmall_realtime_ck_spark.streaming.pipelines import _sweep_stale_temp_dirs

    _sweep_stale_temp_dirs()  # reap SIGKILL-orphaned ckpt/streamsrc dirs

    spark = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.streaming.schemaInference": "true"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tables(spark):
    from gmall_realtime_ck_spark.catalog import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con
