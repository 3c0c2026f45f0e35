"""Serving queries over the incremental user-day rollup
(`pipeline/rollups.py`) — each driver-hash-oracled against the DIRECT
computation over raw events in DuckDB, proving the partial-aggregate
table is an invisible optimization (exactly equal results, including
exact COUNT(DISTINCT) and 2-dp value sums).

The catalog entries build the rollup inline from the ``events`` table
(so the oracle comparison covers rollup construction + serving in one
hash); the fact-free serving property and the incremental maintenance
semantics (touched-partition recompute, idempotent re-run) are pinned
by ``tests/test_rollups.py`` against a WRITTEN rollup table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.pipeline import rollups
from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table


@query(
    "rollup_dau_serving",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS STRING) AS event_date, event_type,
           count(DISTINCT user_id) AS dau,
           count(*) AS event_count
    FROM events
    GROUP BY 1, 2
    """,
    doc="DAU.sql served from the (event_date, user_id, event_type) "
    "partial rollup instead of the fact: exact distinct = COUNT(*) of "
    "user-grain partial rows. Oracle is the DIRECT events computation — "
    "the hash proves rollup construction + serving loses nothing.",
    tags=("agg", "rollup"),
)
def rollup_dau_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return rollups.dau_from_rollup(rollups.user_day_rollup(ev))


@query(
    "rollup_wau_serving",
    oracle="""
    SELECT CAST(CAST(date_trunc('week', ts) AS DATE) AS STRING) AS week_start,
           count(DISTINCT user_id) AS wau
    FROM events
    GROUP BY 1
    """,
    doc="WAU.sql's weekly uniques served from the user-day rollup: "
    "distinct (week, user) over O(users×days) partials, fact-free. "
    "Oracle is the direct events computation.",
    tags=("agg", "rollup"),
)
def rollup_wau_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return rollups.wau_from_rollup(rollups.user_day_rollup(ev))


@query(
    "rollup_daily_value_serving",
    oracle="""
    WITH partial AS (
        SELECT CAST(ts AS DATE) AS event_date, event_type,
               CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS value_u
        FROM events
    )
    SELECT CAST(event_date AS STRING) AS event_date, event_type,
           CAST(count(*) AS BIGINT) AS event_count,
           CAST(floor(sum(value_u) / 10000.0 + 0.5) AS DOUBLE) / 100.0
               AS value_sum
    FROM partial
    GROUP BY 1, 2
    """,
    doc="Per-day/type counts + exact 2-dp value sums (engagement "
    "family) served from the rollup's additive BIGINT micro-unit "
    "partials. Oracle computes directly from events with the identical "
    "quantize-sum-floor chain.",
    tags=("agg", "rollup"),
)
def rollup_daily_value_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return rollups.daily_value_from_rollup(rollups.user_day_rollup(ev))
