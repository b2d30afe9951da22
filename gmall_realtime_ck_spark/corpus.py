"""The end-to-end training-corpus build: one composed pipeline from
raw documents to sharded train/val/test output.

Stages (each individually oracled as a declared query):
  quality gates (text.text_quality_score) ∧ near-dup drop
  (dedup pipeline via text.corpus_clean_manifest)
  → deterministic split (sampling.corpus_train_test_split)
  → range-sharded parquet per split (layout.write_sharded)

The whole chain is lazy until the shard writes — Catalyst fuses the
manifest/split joins into the scan, so one pass over the corpus feeds
all three outputs at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_tables
from .operators.layout import write_sharded
from .operators.sampling import corpus_train_test_split
from .operators.text import corpus_clean_manifest

SPLITS = ("train", "val", "test")


def build_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str, n_shards: int = 8
) -> DataFrame:
    """Run the full corpus build; returns the per-split stats frame
    (docs kept/dropped, chars) and writes ``out_dir/<split>/``."""
    tables = load_tables(spark, sf_dir)
    docs = tables["documents"]

    manifest = corpus_clean_manifest(tables).select("doc_id", "keep")
    split = corpus_train_test_split(tables).select("doc_id", "split")
    annotated = docs.join(manifest, "doc_id").join(split, "doc_id")

    kept = annotated.filter(F.col("keep") == 1)
    for s in SPLITS:
        write_sharded(
            kept.filter(F.col("split") == s).drop("keep", "split"),
            os.path.join(out_dir, s),
            order_col="doc_id",
            n_shards=n_shards,
        )

    return (
        annotated.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs_total"),
            F.sum("keep").alias("docs_kept"),
            F.sum(F.when(F.col("keep") == 1, F.col("n_chars")).otherwise(0)).alias(
                "chars_kept"
            ),
        )
    )
