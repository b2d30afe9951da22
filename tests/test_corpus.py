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


def test_chunk_dedup_bloom_compose(tables, spark):
    """The RAG-prep chain composes: sliding chunks -> chunk-level
    exact dedup on the emitted hashes -> every surviving chunk's
    doc passes through the Bloom contamination screen. Asserts the
    glue contracts: chunk hashes are md5-stable keys (dedup by them
    is exact), and the screen covers every scored doc that has
    chunks."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmall_realtime_ck_spark.operators.sampling import bloom_contamination
    from gmall_realtime_ck_spark.operators.text import corpus_chunk_sliding

    chunks = corpus_chunk_sliding(tables)
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    deduped = (
        chunks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    n_chunks = chunks.count()
    n_unique = deduped.count()
    n_hashes = chunks.select("chunk_hash").distinct().count()
    assert n_unique == n_hashes  # dedup-by-hash is exact
    assert n_unique <= n_chunks
    screened = bloom_contamination(tables)
    chunk_docs = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    screened_docs = {r["doc_id"] for r in screened.collect()}
    # the screen covers exactly the non-benchmark docs long enough to
    # shingle — all of which also chunked (chunking needs ≥1 token,
    # shingling ≥3)
    assert screened_docs, "screen produced no rows"
    assert screened_docs <= {d for d in chunk_docs if d >= 10}
