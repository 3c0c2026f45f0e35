"""Bronze → Silver: schema-on-read parse + typed event table.

Faithful to ``spark/replay_jobs/replay_bronze_to_silver.py:102-197``:
three-level ``from_json`` (envelope → context → event_properties),
KST wall-clock timestamp parsed from the ``+09:00`` ISO string, UTC
derived as ``kst - INTERVAL 9 HOURS``, nine derived date columns,
26-column projection, ``dropDuplicates(event_id)``.

Engine-side deltas (SURVEY §7.4):

- cross-batch idempotency: the writer uses dynamic partition
  overwrite on the event-date partitions the batch touches, so
  replays converge (reference dedups within-batch only);
- ``processed_at`` is the caller's ``batch_ts`` (determinism);
- partition layout ``year/month/day`` as in the reference — all
  date-predicate queries prune at the directory level.

Everything is built-in Column functions — zero UDFs — so the whole
transform stays inside Catalyst/whole-stage codegen (SURVEY §2.10).
"""

from __future__ import annotations

import os
from datetime import date as _date
from datetime import datetime

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.pipeline import schemas
from reciping_data_pipeline_spark.sources import writers

SILVER_TABLE = "user_events_silver"
PIPELINE_VERSION = "pyspark_engine_v1.0"


def silver_path(warehouse: str) -> str:
    return os.path.join(warehouse, SILVER_TABLE)


def transform(bronze_df: DataFrame, batch_ts: datetime) -> DataFrame:
    """Parse + type + dedup one batch of bronze rows."""
    parsed = (
        bronze_df.withColumn(
            "event_data", F.from_json(F.col("raw_event_string"), schemas.ENVELOPE_SCHEMA)
        )
        .withColumn("parsed_context", F.from_json(F.col("event_data.context"), schemas.CONTEXT_SCHEMA))
        .withColumn(
            "parsed_properties",
            F.from_json(F.col("event_data.event_properties"), schemas.EVENT_PROPERTIES_SCHEMA),
        )
        # timestamp_ntz: the parsed +09:00 instant is materialized as
        # KST *wall-clock* (requires session TZ Asia/Seoul at parse
        # time — runner sets it). NTZ round-trips bit-identically
        # through parquet to any reader regardless of its session TZ,
        # which the DuckDB golden tests depend on.
        .withColumn(
            "kst_timestamp",
            F.to_timestamp(F.col("event_data.timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").cast(
                "timestamp_ntz"
            ),
        )
        .withColumn("utc_timestamp", F.expr("kst_timestamp - INTERVAL 9 HOURS"))
        .withColumn("date", F.to_date("kst_timestamp"))
        .withColumn("year", F.year("kst_timestamp"))
        .withColumn("month", F.month("kst_timestamp"))
        .withColumn("day", F.dayofmonth("kst_timestamp"))
        .withColumn("hour", F.hour("kst_timestamp"))
        .withColumn("day_of_week", F.date_format("kst_timestamp", "E"))
    )
    return (
        parsed.select(
            F.col("event_data.event_id").alias("event_id"),
            F.col("event_data.event_name").alias("event_name"),
            F.col("event_data.user_id").alias("user_id"),
            F.col("event_data.anonymous_id").alias("anonymous_id"),
            F.col("event_data.session_id").alias("session_id"),
            "kst_timestamp",
            "utc_timestamp",
            "date",
            "year",
            "month",
            "day",
            "hour",
            "day_of_week",
            F.col("parsed_context.page.name").alias("page_name"),
            F.col("parsed_context.page.url").alias("page_url"),
            F.col("parsed_context.user_segment").alias("user_segment"),
            F.col("parsed_context.cooking_style").alias("cooking_style"),
            F.col("parsed_context.ab_test.group").alias("ab_test_group"),
            F.col("parsed_properties.recipe_id").cast("bigint").alias("prop_recipe_id"),
            F.col("parsed_properties.list_type").alias("prop_list_type"),
            F.col("parsed_properties.action").alias("prop_action"),
            F.col("parsed_properties.search_keyword").alias("prop_search_keyword"),
            F.col("parsed_properties.result_count").alias("prop_result_count"),
            F.col("source_file").alias("data_source"),
        )
        .withColumn("processed_at", F.lit(batch_ts).cast("timestamp_ntz"))
        .withColumn("pipeline_version", F.lit(PIPELINE_VERSION))
        # Quarantine malformed lines: from_json yields an all-null
        # struct for unparseable JSON, so a null event_id marks a
        # corrupt record. The reference's dropDuplicates would keep ONE
        # such row per batch (nulls compare equal) — a silent poison
        # row; dropping them is the intended retention-SLO "loss".
        .where(F.col("event_id").isNotNull())
        .dropDuplicates(["event_id"])
    )


def write_bulk(silver_df: DataFrame, warehouse: str) -> None:
    """Bulk backfill: replaces exactly the (year, month, day) event-date
    partitions present in the dataset. Late events land in their own
    (old) partitions naturally — same event-time repartitioning the
    reference relies on."""
    writers.overwrite_partitions(silver_df, silver_path(warehouse), ["year", "month", "day"])


def append_incremental(silver_df: DataFrame, warehouse: str) -> None:
    """Cross-batch-idempotent incremental append (SURVEY §2.9): a day
    partition spans many 15-min batches, so partition overwrite would
    drop earlier batches. Instead, anti-join the batch against the
    event_ids already present in exactly the partitions it touches
    (partition-pruned read — bounded by the batch's event-date span,
    not table history), then plain append. Replays converge: already-
    present events are filtered out, so re-running is a no-op."""
    spark = silver_df.sparkSession
    path = silver_path(warehouse)
    if not writers.table_exists(spark, path):
        write_bulk(silver_df, warehouse)
        return
    touched = silver_df.select("year", "month", "day").distinct().collect()
    # Predicate on the partition columns themselves → directory-level
    # pruning (a filter on the derived `date` data column would not
    # prune the year/month/day layout).
    pred = None
    for r in touched:
        clause = (
            (F.col("year") == r["year"]) & (F.col("month") == r["month"]) & (F.col("day") == r["day"])
        )
        pred = clause if pred is None else (pred | clause)
    existing_ids = writers.read_table(spark, path).where(pred).select("event_id")
    fresh = silver_df.join(existing_ids, on="event_id", how="left_anti")
    if fresh.isEmpty():
        return
    writers.append_table(fresh, path, ["year", "month", "day"])


def run_batch(
    spark: SparkSession,
    warehouse: str,
    batch_ts: datetime,
    ingestion_date: str | None = None,
    incremental: bool = False,
    metrics: dict | None = None,
) -> DataFrame:
    from reciping_data_pipeline_spark.pipeline import bronze as bronze_mod

    bronze_df = bronze_mod.read_bronze(spark, warehouse, ingestion_date)
    silver_df = transform(bronze_df, batch_ts)
    if incremental:
        # The batch's parse plan feeds MANY actions (touched-partition
        # collect + anti-join append here, then the caller's dim upsert
        # and fact build) and Spark has no DataFrame CSE — unpersisted,
        # the bronze JSON parse re-executes per action (guide §5;
        # measured 6-7 full re-parses per 15-min batch). A 15-min batch
        # is small by definition, so cache it; the CALLER owns the
        # lifetime and must unpersist once its gold work is done
        # (runner.incremental_run does, in a finally).
        silver_df = silver_df.persist()
        append_incremental(silver_df, warehouse)
    else:
        # Bulk: one write action, and bulk_backfill re-reads the
        # written table for everything downstream — nothing to cache.
        # With a ``metrics`` dict, the written row count rides the
        # write action as an observation metric (guide §1.2) instead
        # of the report's former separate count() job.
        if metrics is not None:
            from pyspark.sql import Observation

            obs = Observation()
            silver_df = silver_df.observe(obs, F.count(F.lit(1)).alias("silver_rows"))
            write_bulk(silver_df, warehouse)
            metrics["silver_rows"] = int(obs.get["silver_rows"])
        else:
            write_bulk(silver_df, warehouse)
    return silver_df


def read_silver(spark: SparkSession, warehouse: str, date: str | None = None) -> DataFrame:
    df = writers.read_table(spark, silver_path(warehouse))
    if date:
        # Predicate on the partition columns, not the derived `date`
        # data column: only partition-column predicates prune the
        # year=/month=/day= directory layout (reference SLO 3 — a
        # daily query must scan ~one day's partitions, not the table).
        d = _date.fromisoformat(date)
        df = df.where(
            (F.col("year") == d.year) & (F.col("month") == d.month) & (F.col("day") == d.day)
        )
    return df
