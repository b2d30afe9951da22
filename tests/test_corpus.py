"""End-to-end corpus build: clean → dedup → split → shard."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from gmall_realtime_ck_spark import corpus
from tests.conftest import SF_DIR


def test_build_corpus_end_to_end(spark, tmp_path):
    out = str(tmp_path / "corpus")
    stats = corpus.build_corpus(spark, SF_DIR, out, n_shards=2)
    rows = {r["split"]: r for r in stats.collect()}
    assert set(rows) <= {"train", "val", "test"}
    assert sum(r["docs_total"] for r in rows.values()) == 500
    # quality + dedup gates actually dropped something, but kept most
    kept = sum(r["docs_kept"] for r in rows.values())
    assert 0 < kept <= 500

    # written shards reload to exactly the kept docs, disjoint by split
    seen = set()
    for s in corpus.SPLITS:
        p = pathlib.Path(out) / s
        if not p.exists():
            continue
        df = spark.read.parquet(str(p))
        ids = {r["doc_id"] for r in df.select("doc_id").collect()}
        assert not (ids & seen), "splits must be disjoint"
        seen |= ids
        # payload columns intact, bookkeeping columns dropped
        assert "text" in df.columns and "keep" not in df.columns
    assert len(seen) == kept
