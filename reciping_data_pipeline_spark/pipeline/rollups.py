"""Incremental rollup maintenance — materialized-view partials for the
distinct-user / count / sum analytics families.

At 100 TB the serving tier must not rescan the fact for every dashboard
refresh. DAU/WAU/engagement queries aggregate an APPEND-ONLY event
stream whose history never changes, so a ``(event_date, user_id,
event_type)`` partial-aggregate table — O(active users × days), usually
3–5 orders of magnitude smaller than events — serves those families
EXACTLY:

- ``count(DISTINCT user_id)`` per day/week/type is exact from
  user-grain partials (the partial keeps the user dimension, so the
  final distinct is a count of partial rows / a distinct over days).
- counts and value sums are additive; values are quantized to integer
  micro-units at the partial (BIGINT — order-invariant, the engine-wide
  sum-then-floor rule), so re-aggregation is exact under any merge
  order.

Maintenance is per incremental interval (the reference's 15-min unit,
cf. Airflow replay semantics in `dags/reciping_pipeline_dag.py`):
recompute ONLY the event-date partitions the interval touched and
dynamic-partition-overwrite them. Idempotent by construction —
re-running an interval rewrites the same partitions to the same
content — and cost ∝ the touched days' events, never table size (the
same discipline as `pipeline/silver.py`'s pruned anti-join).

Correctness contract: the serving queries are driver-hash-oracled
against the DIRECT computation over raw events in DuckDB
(`queries/rollupserve.py`) — the partial table is an invisible
optimization; results are exactly equal.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.sources import writers

#: micro-unit grid for the additive value sum (engine-wide rule: exact
#: BIGINT sums, order-invariant; 3+ decimal orders below reported 2 dp)
_VALUE_UNIT = 1_000_000


def user_day_rollup(events: DataFrame) -> DataFrame:
    """One partial row per (event_date, user_id, event_type): event
    count + integer-unit value sum. The finest grain any serving query
    below needs — user-level, so exact COUNT(DISTINCT) survives the
    rollup."""
    return events.groupBy(
        F.col("ts").cast("date").alias("event_date"),
        "user_id",
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.floor(F.col("value") * _VALUE_UNIT + F.lit(0.5)).cast("long")
        ).alias("value_u"),
    )


def maintain_user_day_rollup(
    spark: SparkSession, events: DataFrame, rollup_path: str
) -> list[str]:
    """Incrementally maintain the rollup at ``rollup_path`` from an
    interval's (already event-id-deduped) events: recompute the partial
    rows for exactly the event-dates present in the batch and
    dynamic-partition-overwrite those partitions.

    Recompute-and-replace (vs additive merge) is chosen deliberately:
    it is idempotent under re-delivery of the SAME interval without any
    read-side bookkeeping, and its cost is bounded by the touched days'
    events — on a date-partitioned warehouse that's one pruned scan.
    The day-partition recompute source is the events argument itself,
    so callers replaying history pass the union of the interval and
    any late events for its days (gold.run_incremental's pruned-read
    pattern). Returns the ISO dates rewritten (O(touched days))."""
    batch_rollup = user_day_rollup(events)
    touched = [
        r["event_date"].isoformat()
        for r in batch_rollup.select("event_date").distinct().collect()
    ]
    if not touched:
        return touched
    writers.overwrite_partitions(batch_rollup, rollup_path, ["event_date"])
    return touched


def read_user_day_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    return writers.read_table(spark, rollup_path)


def dau_from_rollup(rollup: DataFrame) -> DataFrame:
    """DAU.sql shape served from partials: one partial row per
    (day, user, type) means the exact distinct is a COUNT(*) and the
    event count a SUM — no touch of the fact."""
    return rollup.groupBy(
        F.col("event_date").cast("string").alias("event_date"), "event_type"
    ).agg(
        F.count("*").alias("dau"),
        F.sum("n_events").alias("event_count"),
    )


def wau_from_rollup(rollup: DataFrame) -> DataFrame:
    """Weekly active users from partials: distinct (week, user) over
    the O(users×days) rollup instead of the events fact."""
    wk = rollup.select(
        F.date_trunc("week", F.col("event_date")).cast("date").cast("string").alias(
            "week_start"
        ),
        "user_id",
    ).distinct()
    return wk.groupBy("week_start").agg(F.count("*").alias("wau"))


def daily_value_from_rollup(rollup: DataFrame) -> DataFrame:
    """Per-day/type event counts and exact value sums (2 dp via the
    floor form) — the engagement-score family, fact-free."""
    return rollup.groupBy(
        F.col("event_date").cast("string").alias("event_date"), "event_type"
    ).agg(
        F.sum("n_events").alias("event_count"),
        (
            F.floor(
                (F.sum("value_u") / F.lit(_VALUE_UNIT // 100)).cast("double") + 0.5
            ).cast("double")
            / 100.0
        ).alias("value_sum"),
    )
