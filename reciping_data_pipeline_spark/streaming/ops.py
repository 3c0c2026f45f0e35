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
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


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


USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", StringType(), True),
        StructField("n_events", LongType(), True),
        StructField("first_seen", TimestampType(), True),
        StructField("last_seen", TimestampType(), True),
    ]
)

# State kept as epoch-microsecond longs: state round-trips through
# Arrow per micro-batch, and integer state is the cheapest stable
# encoding (no tz/ns ambiguity across the boundary).
_USER_STATS_STATE = StructType(
    [
        StructField("n", LongType(), True),
        StructField("first_us", LongType(), True),
        StructField("last_us", LongType(), True),
    ]
)


def running_user_stats(
    events: DataFrame, id_col: str = "user_id", ts_col: str = "kst_timestamp"
) -> DataFrame:
    """Custom stateful streaming operator: per-user lifetime event count
    and first/last-seen timestamps, maintained across micro-batches via
    ``applyInPandasWithState`` (the escape hatch for stateful semantics
    Spark's built-in streaming aggregations can't express — arbitrary
    per-key state + arbitrary per-batch Python logic, Arrow-batched).

    Emits one update row per active user per micro-batch (output mode
    ``update``). On a batch DataFrame the same semantics degrade to a
    plain groupBy aggregation — which is exactly how the tests pin
    stream/batch equivalence.

    Scale notes: state is partitioned by ``id_col`` across executors
    (HDFS/RocksDB-backed state store on a real cluster); per-batch work
    is one Arrow exchange per state partition, no global shuffle beyond
    the hash on the grouping key.
    """
    if not events.isStreaming:
        return events.groupBy(F.col(id_col).cast("string").alias("user_id")).agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("first_seen"),
            F.max(ts_col).alias("last_seen"),
        )

    import pandas as pd  # noqa: PLC0415 — worker-side import

    def update(key, pdfs, state):
        n, first_us, last_us = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col])
            n += len(pdf)
            lo = int(ts.min().value // 1_000)
            hi = int(ts.max().value // 1_000)
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, first_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [str(key[0])],
                "n_events": [n],
                "first_seen": [pd.Timestamp(first_us * 1_000)],
                "last_seen": [pd.Timestamp(last_us * 1_000)],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy(F.col(id_col).cast("string").alias("user_id")).applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
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


def attributed_clicks(
    impressions: DataFrame,
    clicks: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "kst_timestamp",
    id_col: str = "event_id",
    horizon_minutes: int = 60,
    delay: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: each ad click is attributed to the
    same user's impression at most ``horizon_minutes`` earlier (the
    click_ads <- view_ads attribution the reference computes offline
    with conditional aggregation; here as a real-time join).

    Both sides carry a watermark and the join condition bounds event
    time on BOTH ends — the two requirements for Spark to evict
    join state (without them, stream-stream join state grows forever).
    State per side is O(rows within horizon + delay), independent of
    stream length. On batch frames the identical join expression runs
    as a plain hash join with a post-filter, which is how the tests
    pin stream/batch equivalence.
    """
    imp = impressions.select(
        F.col(id_col).alias("imp_id"),
        F.col(user_col).alias("imp_user"),
        F.col(ts_col).alias("imp_ts"),
    )
    clk = clicks.select(
        F.col(id_col).alias("click_id"),
        F.col(user_col).alias("click_user"),
        F.col(ts_col).alias("click_ts"),
    )
    if imp.isStreaming:
        imp = imp.withWatermark("imp_ts", delay)
    if clk.isStreaming:
        clk = clk.withWatermark("click_ts", delay)
    cond = (
        (F.col("imp_user") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("imp_ts"))
        & (F.col("click_ts") <= F.col("imp_ts") + F.expr(f"INTERVAL {int(horizon_minutes)} MINUTES"))
    )
    return imp.join(clk, cond, "inner").select(
        "imp_id",
        "click_id",
        F.col("imp_user").alias("user_id"),
        (F.unix_timestamp("click_ts") - F.unix_timestamp("imp_ts")).alias("lag_seconds"),
    )
