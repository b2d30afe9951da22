"""SCD2 dimension history: versioning, closes, deletes, as-of reads."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gmall_realtime_ck_spark.gmall import dim, dwd, fixtures


def _changes(spark, rows):
    lines = [
        json.dumps(
            {"database": "gmall", "table": "base_trademark", "type": typ, "ts": ts,
             "data": data}
        )
        for typ, ts, data in rows
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    db = dwd.parse_topic_db(raw)
    cfg = dim.dim_config(spark, fixtures.TABLE_PROCESS_DIM_ROWS)
    return dim.dim_changes(db, cfg).filter(F.col("sink_table") == "dim_base_trademark")


def test_scd2_versions_and_asof(spark, tmp_path):
    store = str(tmp_path / "scd2store")
    c1 = _changes(
        spark,
        [
            ("insert", 100, {"id": "1", "tm_name": "Redmi"}),
            ("insert", 100, {"id": "2", "tm_name": "Apple"}),
            ("update", 200, {"id": "1", "tm_name": "Redmi-Pro"}),
        ],
    )
    hist = dim.scd2_merge(spark, c1, store, "dim_base_trademark")
    rows = {(r["row_key"], r["valid_from"], r["valid_to"]) for r in hist.collect()}
    assert (("1", 100, 200)) in rows  # first version closed at the update
    assert (("1", 200, None)) in rows  # open current version
    assert (("2", 100, None)) in rows

    # as-of reads pick the right version
    v150 = {r["row_key"]: r["data"]["tm_name"] for r in
            dim.dim_as_of(spark, store, "dim_base_trademark", 150).collect()}
    assert v150["1"] == "Redmi"
    v250 = {r["row_key"]: r["data"]["tm_name"] for r in
            dim.dim_as_of(spark, store, "dim_base_trademark", 250).collect()}
    assert v250["1"] == "Redmi-Pro"

    # a later batch: update key 2, delete key 1
    c2 = _changes(
        spark,
        [
            ("update", 300, {"id": "2", "tm_name": "Apple-CN"}),
            ("delete", 350, {"id": "1", "tm_name": "Redmi-Pro"}),
        ],
    )
    hist2 = dim.scd2_merge(spark, c2, store, "dim_base_trademark")
    rows2 = {(r["row_key"], r["valid_from"], r["valid_to"]) for r in hist2.collect()}
    assert ("2", 100, 300) in rows2
    assert ("2", 300, None) in rows2
    assert ("1", 200, 350) in rows2  # closed by the delete
    # after the delete, key 1 has no open version
    v400 = {r["row_key"] for r in
            dim.dim_as_of(spark, store, "dim_base_trademark", 400).collect()}
    assert v400 == {"2"}
