"""Incremental rollup maintenance (pipeline/rollups.py): partial-table
equivalence with a full rebuild, idempotent interval re-runs, exact
serving parity with direct computation, and the fact-free serving plan.
The cross-engine value-hash for the serving shapes is covered by the
catalog oracles (queries/rollupserve.py) via test_catalog_oracle."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from reciping_data_pipeline_spark.pipeline import rollups
from reciping_data_pipeline_spark.plans import inspect
from reciping_data_pipeline_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(map(str, df.collect()))


@pytest.fixture()
def events(spark):
    return load_table(spark, SF, "events")


def test_incremental_maintenance_equals_full_rebuild(spark, events, tmp_path):
    """Maintaining the rollup day-by-day (three interval batches split
    on event date) must produce exactly the table a one-shot rollup of
    all events builds."""
    path = os.path.join(tmp_path, "rollup")
    dates = sorted(
        r["d"].isoformat()
        for r in events.select(F.col("ts").cast("date").alias("d")).distinct().collect()
    )
    assert len(dates) >= 2, "fixture must span multiple days"
    # interval batches: first day, middle days, last day
    splits = [dates[:1], dates[1:-1], dates[-1:]]
    for ds in splits:
        if not ds:
            continue
        batch = events.where(F.col("ts").cast("date").cast("string").isin(ds))
        touched = rollups.maintain_user_day_rollup(spark, batch, path)
        assert sorted(touched) == sorted(ds)
    incremental = rollups.read_user_day_rollup(spark, path)
    full = rollups.user_day_rollup(events)
    assert _sorted_rows(incremental.select(*full.columns)) == _sorted_rows(full)


def test_interval_rerun_is_idempotent(spark, events, tmp_path):
    """Re-delivering an interval (same events) rewrites its partitions
    to identical content — no double counting, no residue."""
    path = os.path.join(tmp_path, "rollup")
    rollups.maintain_user_day_rollup(spark, events, path)
    first = _sorted_rows(rollups.read_user_day_rollup(spark, path))
    some_day = events.select(F.col("ts").cast("date").cast("string").alias("d")).first()["d"]
    replay = events.where(F.col("ts").cast("date").cast("string") == some_day)
    rollups.maintain_user_day_rollup(spark, replay, path)
    assert _sorted_rows(rollups.read_user_day_rollup(spark, path)) == first


def test_serving_matches_direct_computation(spark, events):
    """DAU / WAU / daily-value served from partials equal the direct
    aggregation over events (exact distinct, exact integer-unit sums)."""
    rollup = rollups.user_day_rollup(events)

    direct_dau = events.groupBy(
        F.col("ts").cast("date").cast("string").alias("event_date"), "event_type"
    ).agg(F.countDistinct("user_id").alias("dau"), F.count("*").alias("event_count"))
    assert _sorted_rows(rollups.dau_from_rollup(rollup)) == _sorted_rows(direct_dau)

    direct_wau = (
        events.select(
            F.date_trunc("week", F.col("ts")).cast("date").cast("string").alias("week_start"),
            "user_id",
        )
        .groupBy("week_start")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    assert _sorted_rows(rollups.wau_from_rollup(rollup)) == _sorted_rows(direct_wau)


def test_serving_plan_is_fact_free_and_partition_prunable(spark, events, tmp_path):
    """Served from the WRITTEN rollup, the DAU plan scans only the
    rollup parquet (zero events scans) and a date predicate prunes to
    the matching event_date partition directories — the O(partials)
    serving cost that makes dashboards safe at 100 TB."""
    path = os.path.join(tmp_path, "rollup")
    rollups.maintain_user_day_rollup(spark, events, path)
    rollup = rollups.read_user_day_rollup(spark, path)

    plan = inspect.simple_plan(rollups.dau_from_rollup(rollup))
    assert plan.count("Scan parquet") == 1, plan
    assert "events.parquet" not in plan, plan

    some_day = rollup.select(F.col("event_date").cast("string").alias("d")).first()["d"]
    pruned = rollups.dau_from_rollup(rollup.where(F.col("event_date") == some_day))
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in pplan and "event_date" in pplan, pplan
