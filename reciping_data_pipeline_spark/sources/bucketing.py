"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-to-fact join (orders ⋈ lineitem,
events ⋈ events) is the exchange: both sides shuffle on the join key
every query. Writing the tables **bucketed on the join key with the
same bucket count** pre-materializes that partitioning once at write
time; Spark's scan then reports the bucket distribution and Catalyst
elides the exchange entirely (verified in tests/test_plans.py by
asserting zero Exchange nodes in the joined plan).

Bucketing uses the session catalog (``saveAsTable``; plain in-memory
catalog works — no Hive metastore needed) with an explicit ``path`` so
data stays in the caller's warehouse directory. ``sortBy`` within
buckets additionally enables merge-join without sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed table registered as ``name``.

    ``n_buckets`` should match across all tables joined on the key and
    be sized so one bucket of the largest table fits an executor's
    working memory (bucket_size ≈ table_size / n_buckets).
    """
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata only survives through the
    catalog — a plain parquet path read loses the distribution)."""
    return spark.table(name)
