"""Staging → Bronze: raw-line preservation (ELT).

Reference behavior (``spark/replay_jobs/replay_staging_to_bronze.py``):
text-scan the staging JSONL, preserve each raw line verbatim, stamp
lineage columns, append to an Iceberg table partitioned by
``ingestion_date``. Differences here, by design:

- sink is :func:`sources.writers.overwrite_partitions` (dynamic
  partition overwrite) → re-running a batch is idempotent, fixing the
  reference's open re-run gap;
- ``ingestion_timestamp`` comes from the caller's ``batch_ts`` (the
  logical batch time) instead of ``current_timestamp()`` so outputs
  are deterministic and replays are faithful.

At scale Bronze is append-heavy and query-light; partitioning by
ingestion date keeps per-batch writes single-partition (one commit),
and downstream Silver reads prune to exactly the batch's partition.
"""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.sources import jsonl, writers

BRONZE_TABLE = "bronze_events"


def bronze_path(warehouse: str) -> str:
    return os.path.join(warehouse, BRONZE_TABLE)


def to_bronze(raw: DataFrame, batch_ts: datetime) -> DataFrame:
    """Raw text lines → bronze rows (raw string preserved verbatim)."""
    return raw.select(
        F.col("value").alias("raw_event_string"),
        F.input_file_name().alias("source_file"),
        F.lit(batch_ts).cast("timestamp_ntz").alias("ingestion_timestamp"),
        F.lit(batch_ts.date().isoformat()).cast("date").alias("ingestion_date"),
    )


def ingest_bulk(spark: SparkSession, staging_dir: str, warehouse: str, batch_ts: datetime) -> int:
    """Bulk backfill: whole staging directory in one pass. Returns the
    ingested row count, observed on the write action itself (guide
    §1.2) — the bulk report previously re-counted the written table in
    a separate job."""
    from pyspark.sql import Observation

    raw = jsonl.read_lines(spark, _glob_all(staging_dir))
    df = to_bronze(raw, batch_ts)
    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    writers.overwrite_partitions(df, bronze_path(warehouse), ["ingestion_date"])
    return int(obs.get["rows"])


def ingest_interval(
    spark: SparkSession,
    staging_dir: str,
    warehouse: str,
    start: datetime,
    end: datetime,
) -> bool:
    """Incremental 15-min micro-batch; returns False on empty interval."""
    raw = jsonl.read_interval(spark, staging_dir, start, end)
    if raw is None:
        return False
    df = to_bronze(raw, start)
    # Idempotent append: union with existing same-partition rows from
    # OTHER intervals would be lost under naive dynamic overwrite (one
    # ingestion_date spans many intervals), so interval loads dedup at
    # the file level: drop rows whose source_file was already ingested.
    path = bronze_path(warehouse)
    if writers.table_exists(spark, path):
        existing = writers.read_table(spark, path).select("source_file").distinct()
        df = df.join(existing, on="source_file", how="left_anti")
        if df.isEmpty():
            return False
        writers.append_table(df, path, ["ingestion_date"])
    else:
        writers.overwrite_partitions(df, path, ["ingestion_date"])
    return True


def _glob_all(staging_dir: str) -> str:
    # Hive-style staging layout is 5 levels deep; a bulk file sits at
    # the root. Spark's recursive lookup covers both.
    return staging_dir


def read_bronze(spark: SparkSession, warehouse: str, ingestion_date: str | None = None) -> DataFrame:
    df = writers.read_table(spark, bronze_path(warehouse))
    if ingestion_date:
        df = df.where(F.col("ingestion_date") == ingestion_date)  # partition-pruned
    return df
