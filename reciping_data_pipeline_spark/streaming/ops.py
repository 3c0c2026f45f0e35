"""Streaming operators: watermark dedup, windowed aggs, sessionization.

These cover the streaming-semantics column of SURVEY §2.9 — what the
reference emulates with scheduled batch (15-min windows, per-batch
dedup, no sessionization) expressed as real event-time operators.
Each takes a streaming OR batch DataFrame with an event-time column;
on a batch frame the same code degrades to normal aggregation, which
is how the unit tests pin the semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def dedup_within_watermark(
    events: DataFrame, id_col: str = "event_id", ts_col: str = "kst_timestamp", delay: str = "30 minutes"
) -> DataFrame:
    """Cross-micro-batch dedup bounded by a watermark: duplicates
    arriving within ``delay`` of the original are dropped; state is
    evicted beyond it (unbounded-state-safe, unlike a global
    dropDuplicates). Batch equivalent: plain dropDuplicates."""
    if not events.isStreaming:
        return events.dropDuplicates([id_col])
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark([id_col])


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "kst_timestamp",
    window: str = "15 minutes",
    delay: str = "30 minutes",
    by: tuple[str, ...] = ("event_name",),
) -> DataFrame:
    """Tumbling event-time window counts — the streaming form of the
    reference's 15-minute batch interval aggregation. The watermark
    lets late rows (bounded by ``delay``) still land in their window,
    mirroring the reference's event-date repartitioning of late data."""
    df = events.withWatermark(ts_col, delay) if events.isStreaming else events
    return df.groupBy(F.window(ts_col, window).alias("win"), *by).agg(
        F.count("*").alias("event_count"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )


def session_aggregate(
    events: DataFrame,
    ts_col: str = "kst_timestamp",
    gap: str = "30 minutes",
    delay: str = "30 minutes",
) -> DataFrame:
    """True event-time sessionization via ``session_window`` (gap
    timeout): the reference never computes sessions — session_id is
    assigned by the data generator (create_event_logs.py:885). Output:
    one row per (user, session window) with event count and duration."""
    df = events.withWatermark(ts_col, delay) if events.isStreaming else events
    return df.groupBy(F.session_window(ts_col, gap).alias("sess"), F.col("user_id")).agg(
        F.count("*").alias("n_events"),
        (
            F.unix_timestamp(F.col("sess.end")) - F.unix_timestamp(F.col("sess.start"))
        ).alias("session_span_sec"),
    )
