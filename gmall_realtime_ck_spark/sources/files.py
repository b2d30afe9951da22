"""File and socket sources (SURVEY.md §2.1 S5).

The reference uses socket streams only in join demos
(Test01_IntervalJoin.java:26,49); file streams are this repo's bounded
test carrier (every parquet/JSON fixture can play a stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_runtime


def socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S5 — line-delimited text stream (test-only, like the reference's
    demo sources)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def text_stream(spark: SparkSession, path: str) -> DataFrame:
    """Line stream over a directory of text/JSON-lines files."""
    configure_runtime(spark)
    return spark.readStream.format("text").load(path)


def parquet_stream(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-pinned parquet file stream (streaming needs an explicit
    schema; inference is a batch-only convenience)."""
    configure_runtime(spark)
    return spark.readStream.schema(schema).format("parquet").load(path)
