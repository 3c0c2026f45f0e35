"""Idempotent partitioned-parquet sinks.

The reference's APPEND-only Iceberg writers are not re-run safe — a
replayed Airflow interval double-loads rows (admitted trade-off,
``docs/adr/002-apache-iceberg.md``). Here every layer write goes
through :func:`overwrite_partitions`, which relies on
``spark.sql.sources.partitionOverwriteMode=dynamic``: only the
partitions present in the incoming batch are replaced, everything
else is untouched. Re-running a batch converges to the same table
state (exactly-once per partition), and a full rebuild is just the
same call with the whole dataset.

Scale notes: dynamic overwrite commits per-partition, so concurrent
batches touching disjoint event-date partitions don't conflict; the
write itself is the same shuffle-free append path as ``mode=append``.

Table-format seam (SURVEY §1.4): every pipeline write/read routes
through the module-level functions below, which delegate to the
active :class:`TableFormat`. ``ParquetFormat`` is the default and the
only one shippable in this container; an Iceberg/Delta format drops
in by implementing the same four methods (``overwrite_partitions`` →
``MERGE``/dynamic overwrite, ``append`` → format-native append with
its own snapshot isolation) and calling :func:`set_table_format` —
zero changes to pipeline code, which never touches ``df.write``
directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class TableFormat:
    """Storage-format strategy: how a logical table at ``path`` is
    physically written and read. Implementations must keep the
    idempotency contract of each method's docstring."""

    name = "abstract"

    def overwrite_partitions(self, df: DataFrame, path: str, partition_cols: list[str]) -> None:
        raise NotImplementedError

    def overwrite_table(
        self, df: DataFrame, path: str, partition_cols: list[str] | None = None
    ) -> None:
        raise NotImplementedError

    def append(self, df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
        raise NotImplementedError

    def read_table(self, spark: SparkSession, path: str) -> DataFrame:
        raise NotImplementedError

    def table_exists(self, spark: SparkSession, path: str) -> bool:
        """Format-aware existence probe. Default: attempt the read and
        treat AnalysisException (missing path / no schema) as absent —
        works on any store Spark can address, unlike an os.path check
        which is always False for S3/HDFS paths."""
        from pyspark.errors import AnalysisException

        try:
            self.read_table(spark, path)
            return True
        except AnalysisException:
            return False


class ParquetFormat(TableFormat):
    """Path-addressed partitioned parquet (the default everywhere)."""

    name = "parquet"

    def overwrite_partitions(self, df: DataFrame, path: str, partition_cols: list[str]) -> None:
        spark = df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)

    def overwrite_table(
        self, df: DataFrame, path: str, partition_cols: list[str] | None = None
    ) -> None:
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(path)

    def append(self, df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
        w = df.write.mode("append")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(path)

    def read_table(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)


_ACTIVE_FORMAT: TableFormat = ParquetFormat()


def set_table_format(fmt: TableFormat) -> TableFormat:
    """Swap the active table format (e.g. for an Iceberg deployment);
    returns the previous one so callers can restore it."""
    global _ACTIVE_FORMAT
    prev = _ACTIVE_FORMAT
    _ACTIVE_FORMAT = fmt
    return prev


def get_table_format() -> TableFormat:
    return _ACTIVE_FORMAT


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Replace exactly the partitions present in ``df`` at ``path``."""
    _ACTIVE_FORMAT.overwrite_partitions(df, path, partition_cols)


def overwrite_table(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """Full-table rebuild (dimension tables, bulk backfill)."""
    _ACTIVE_FORMAT.overwrite_table(df, path, partition_cols)


def append_table(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """Format-native append; idempotency (anti-join on a key, file-level
    dedup) is the CALLER's contract — see pipeline/silver.py:146,
    gold.py:136, bronze.py:77."""
    _ACTIVE_FORMAT.append(df, path, partition_cols)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return _ACTIVE_FORMAT.read_table(spark, path)


def table_exists(spark: SparkSession, path: str) -> bool:
    """Does a committed table exist at ``path`` under the active format?
    Pipeline code probes through this (never os.path) so the answer is
    correct for snapshot tables and non-local stores alike."""
    return _ACTIVE_FORMAT.table_exists(spark, path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> None:
    """Small-file compaction: rewrite a partitioned table so files
    approach ``target_file_bytes`` (the reference runs Iceberg binpack
    to 128 MB after 2,880 append runs left 3.74 MB average files,
    README.md:222-237). Implementation: re-read, let AQE coalesce, and
    bound per-file rows via maxRecordsPerFile derived from observed
    bytes/row — pure Spark, no table format required."""
    df = spark.read.parquet(path)
    n_rows = df.count()
    if n_rows == 0:
        return
    import os

    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    rows_per_file = max(1, int(n_rows * target_file_bytes / max(total_bytes, 1)))
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
        .partitionBy(*partition_cols)
        .parquet(path + "._compacted")
    )
    # Atomic-ish swap: parquet overwrite-in-place of the path we are
    # reading is not safe, so write aside then rename.
    import shutil

    shutil.rmtree(path)
    shutil.move(path + "._compacted", path)


def write_sorted_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], sort_cols: list[str]
) -> None:
    """Partitioned + within-file sorted layout for data skipping: rows
    are clustered by ``sort_cols`` inside each partition directory, so
    parquet row-group min/max statistics become tight ranges and a
    pushed filter on a sort column skips whole row groups (the poor
    man's Z-order — the same reason the reference compacts with
    binpack). Directory partitioning handles the coarse predicate
    (PartitionFilters), the sort handles the fine one (PushedFilters
    against tight stats)."""
    (
        df.repartition(*[df[c] for c in partition_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
