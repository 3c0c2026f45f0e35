"""JSONL staging readers.

The reference lands Kafka events as JSONL files under an
``year=/month=/day=/hour=/minute=`` directory layout and reads them
with a schema-free text scan (``spark/replay_jobs/
replay_staging_to_bronze.py:162-203``). We keep the same two entry
points but let Spark's file index do the листing:

- :func:`read_lines` — whole-directory (bulk backfill) text scan.
- :func:`read_interval` — 15-minute-interval scan: builds the path
  globs for the interval's minute buckets, which prunes at the file
  listing level (no data read outside the interval) — the same
  partition-path pruning the reference gets from its S3 key scheme.

At 100 TB the staging listing itself is the bottleneck if globs are
loose; per-interval globs keep each micro-batch's listing O(files in
interval), independent of history size.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

MINUTE_BUCKET = 15


def interval_paths(staging_dir: str, start: datetime, end: datetime) -> list[str]:
    """Directory paths covering [start, end) at 15-minute granularity,
    mirroring the reference's ``year=/month=/day=/hour=/minute=`` keys
    (``replay_staging_to_bronze.py:162-180``)."""
    paths = []
    t = start.replace(minute=(start.minute // MINUTE_BUCKET) * MINUTE_BUCKET, second=0, microsecond=0)
    while t < end:
        paths.append(
            os.path.join(
                staging_dir,
                f"year={t.year:04d}",
                f"month={t.month:02d}",
                f"day={t.day:02d}",
                f"hour={t.hour:02d}",
                f"minute={t.minute:02d}",
            )
        )
        t += timedelta(minutes=MINUTE_BUCKET)
    return paths


def read_lines(spark: SparkSession, path_or_paths: str | list[str]) -> DataFrame:
    """Schema-free text scan: one ``value`` column per raw line."""
    paths = [path_or_paths] if isinstance(path_or_paths, str) else path_or_paths
    return spark.read.text(paths)


def read_interval(spark: SparkSession, staging_dir: str, start: datetime, end: datetime) -> DataFrame | None:
    """Text scan restricted to the interval's minute buckets; returns
    None when no bucket directory exists yet (empty micro-batch)."""
    existing = [p for p in interval_paths(staging_dir, start, end) if os.path.isdir(p)]
    if not existing:
        return None
    return read_lines(spark, existing)
