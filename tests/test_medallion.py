"""End-to-end medallion golden tests.

Deterministic fixture (pipeline.datagen, seeded) → bronze → silver →
dims → gold, then:

- every one of the 21 analytics queries hash-matches DuckDB running
  the same (dialect-adjusted) SQL over the same gold parquet;
- Silver dedup property: event_id unique, injected duplicates removed;
- idempotency: re-running the bulk build and replaying an incremental
  interval leave table state unchanged (the reference's admitted gap);
- join success: every fact row resolves user/event FKs.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import duckdb
import pytest

import pyspark.sql.functions as F

from reciping_data_pipeline_spark.pipeline import analytics, bronze, datagen, gold, runner, silver
from reciping_data_pipeline_spark.pipeline.analytics import all_analytics

from .oracle_utils import compare_to_oracle

BATCH_TS = datetime(2025, 9, 4, 0, 0, 0)
START = datetime(2025, 9, 1, 0, 0, 0)
# Fixture-sized parameters (reference defaults of 100/50 users would
# return empty on a 60-user fixture; same values on both engines).
PARAMS = {
    "treatment_vs_control": {"min_users": 5},
    "lift": {"min_users": 5},
    "ab_test_heatmap": {"min_users": 5},
    "ab_test_kpi_metric": {"min_users": 5, "start": "2025-09-01", "end": "2025-09-03"},
}


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("medallion"))
    fix = datagen.generate_fixture(root, seed=7, n_users=60, n_days=3, start=START)
    wh = os.path.join(root, "warehouse")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        report = runner.bulk_backfill(
            spark,
            fix["staging_dir"],
            wh,
            fix["recipe_master"],
            BATCH_TS,
            time_dim_range=("2025-09-01 00:00:00", "2025-09-10 23:00:00"),
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    return {"root": root, "warehouse": wh, "fixture": fix, "report": report}


@pytest.fixture(scope="module")
def gold_duck(warehouse):
    con = duckdb.connect()
    wh = warehouse["warehouse"]
    con.execute(
        "CREATE VIEW fact_user_events AS SELECT * FROM read_parquet("
        f"'{wh}/fact_user_events/**/*.parquet', hive_partitioning=1)"
    )
    for d in ("dim_user", "dim_recipe", "dim_event", "dim_page", "dim_time"):
        con.execute(f"CREATE VIEW {d} AS SELECT * FROM read_parquet('{wh}/{d}/*.parquet')")
    yield con
    con.close()


def test_dedup_slo(spark, warehouse):
    """Injected exact duplicates are removed; event_id unique in Silver."""
    report = warehouse["report"]
    n_generated = warehouse["fixture"]["n_events"]
    assert report.bronze_rows == n_generated  # bronze preserves raw lines
    assert report.silver_rows < n_generated  # duplicates dropped
    s = silver.read_silver(spark, warehouse["warehouse"])
    assert s.count() == s.select("event_id").distinct().count()
    # corrupt staging lines (~0.2% injected) are quarantined, never
    # surfacing as null-key rows
    assert s.where(s.event_id.isNull()).count() == 0


def test_join_success(warehouse):
    rates = warehouse["report"].join_success
    # anonymous sessions (user_id null, ~5%) resolve to the reserved 0 key
    assert 0.85 < rates["user_dim_key"] < 1.0
    assert rates["event_dim_key"] == 1.0
    assert rates["page_dim_key"] == 1.0
    assert 0 < rates["recipe_dim_key"] < 1.0  # only recipe-prop events


def test_fact_matches_silver(warehouse):
    assert warehouse["report"].fact_rows == warehouse["report"].silver_rows


@pytest.mark.parametrize("name", sorted(all_analytics()))
def test_analytics_matches_duckdb(spark, warehouse, gold_duck, name):
    analytics.register_gold_views(spark, warehouse["warehouse"])
    params = PARAMS.get(name, {})
    got = spark.sql(analytics.sql_for(name, engine="spark", **params))
    compare_to_oracle(got, gold_duck, analytics.sql_for(name, engine="duck", **params), name)


def test_bulk_rerun_idempotent(spark, warehouse):
    """Re-running the whole bulk build converges to identical tables."""
    wh = warehouse["warehouse"]
    fix = warehouse["fixture"]
    before = sorted(
        str(r) for r in gold.read_fact(spark, wh).select("event_id", "user_dim_key", "time_dim_key").collect()
    )
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        runner.bulk_backfill(
            spark, fix["staging_dir"], wh, fix["recipe_master"], BATCH_TS,
            time_dim_range=("2025-09-01 00:00:00", "2025-09-10 23:00:00"),
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    after = sorted(
        str(r) for r in gold.read_fact(spark, wh).select("event_id", "user_dim_key", "time_dim_key").collect()
    )
    assert before == after


def test_incremental_replay_idempotent(spark, warehouse):
    """Replaying an already-loaded interval adds zero rows (cross-batch
    dedup via anti-join on event_id)."""
    wh = warehouse["warehouse"]
    staging = warehouse["fixture"]["staging_dir"]
    fact_before = gold.read_fact(spark, wh).count()
    silver_before = silver.read_silver(spark, wh).count()
    bronze_before = bronze.read_bronze(spark, wh).count()
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        runner.replay_loop(spark, staging, wh, START, START + timedelta(hours=1))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    assert bronze.read_bronze(spark, wh).count() == bronze_before
    assert silver.read_silver(spark, wh).count() == silver_before
    assert gold.read_fact(spark, wh).count() == fact_before


def test_retention_slo(warehouse):
    """Bronze→Silver retention ≥95% (reference SLO 2, achieved 99.31%);
    loss here is exactly the injected duplicates."""
    assert warehouse["report"].retention >= 0.95


def test_partition_scan_slo(spark, warehouse):
    """Reference SLO 3: a one-day query scans <=5% of the dataset
    (achieved 3.16% via date-partition pruning). Here: the plan carries
    PartitionFilters on year/month/day (directory-level pruning), and
    the pruned row fraction on the 3-day fixture is ~1/3 — at the
    reference's 30-day scale the same layout gives ~1/30.
    """
    from reciping_data_pipeline_spark.plans import inspect as plan_inspect

    wh = warehouse["warehouse"]
    day = silver.read_silver(spark, wh, date="2025-09-02")
    pf = " ".join(plan_inspect.partition_filters(day))
    assert "year" in pf and "month" in pf and "day" in pf, pf
    total = silver.read_silver(spark, wh).count()
    scanned = day.count()
    n_days = 3
    assert 0 < scanned <= total / n_days * 1.5
    # The same bound must hold for gold: fact reads prune event_date.
    fact_day = gold.read_fact(spark, wh).where(
        F.col("event_date") == "2025-09-02"
    )
    fpf = " ".join(plan_inspect.partition_filters(fact_day))
    assert "event_date" in fpf, fpf


def test_dau_4block_rollup_serving_matches_analytics(spark, warehouse):
    """VERDICT r10 #6: the reference's FULL 4-block DAU.sql stack
    (TOTAL / USER_SEGMENT / COOKING_STYLE / AB_TEST_GROUP) served from
    the (active_date, user_dim_key) presence partials + a serving-time
    dim_user join equals pipeline/analytics.py `dau` over the fact."""
    from reciping_data_pipeline_spark.pipeline import rollups

    wh = warehouse["warehouse"]
    analytics.register_gold_views(spark, wh)
    expected = analytics.run(spark, "dau")
    fact = gold.read_fact(spark, wh)
    dim_time = spark.read.parquet(os.path.join(wh, "dim_time"))
    dim_user = spark.read.parquet(os.path.join(wh, "dim_user"))
    presence = rollups.user_day_presence_rollup(fact, dim_time)
    served = rollups.dau_segments_from_presence(presence, dim_user)
    cols = sorted(expected.columns)
    assert sorted(map(str, served.select(*cols).collect())) == sorted(
        map(str, expected.select(*cols).collect())
    )


def test_wau_3block_rollup_serving_matches_analytics(spark, warehouse):
    """The reference's WAU.sql stack (uniques blocks + LAG growth
    ladder) served from the week-grain presence partials equals
    pipeline/analytics.py `wau` over the fact."""
    from reciping_data_pipeline_spark.pipeline import rollups

    wh = warehouse["warehouse"]
    analytics.register_gold_views(spark, wh)
    expected = analytics.run(spark, "wau")
    fact = gold.read_fact(spark, wh)
    dim_time = spark.read.parquet(os.path.join(wh, "dim_time"))
    dim_user = spark.read.parquet(os.path.join(wh, "dim_user"))
    week = rollups.user_week_presence_rollup(
        rollups.user_day_presence_rollup(fact, dim_time)
    )
    served = rollups.wau_segments_from_presence(week, dim_user)
    cols = sorted(expected.columns)
    assert sorted(map(str, served.select(*cols).collect())) == sorted(
        map(str, expected.select(*cols).collect())
    )


def test_presence_rollup_maintenance_and_fact_free_plan(spark, warehouse, tmp_path):
    """Incremental presence maintenance (per-day batches, dynamic
    partition overwrite) converges to the one-shot partial; the 4-block
    serving plan over the WRITTEN partial reads presence + dim_user
    parquet only — never fact_user_events (the fact-free gate)."""
    from reciping_data_pipeline_spark.pipeline import rollups
    from reciping_data_pipeline_spark.plans import inspect as plan_inspect

    wh = warehouse["warehouse"]
    fact = gold.read_fact(spark, wh)
    dim_time = spark.read.parquet(os.path.join(wh, "dim_time"))
    dim_user = spark.read.parquet(os.path.join(wh, "dim_user"))
    path = os.path.join(tmp_path, "presence")
    days = sorted(
        r["d"] for r in fact.select(
            F.col("event_date").cast("string").alias("d")
        ).distinct().collect()
    )
    assert len(days) >= 2
    for d in days:  # one interval per day, the incremental cadence
        batch = fact.where(F.col("event_date").cast("string") == d)
        assert rollups.maintain_user_day_presence_rollup(
            spark, batch, dim_time, path
        ) == [d]
    written = spark.read.parquet(path)
    one_shot = rollups.user_day_presence_rollup(fact, dim_time)
    cols = [F.col(c).cast("string") for c in sorted(one_shot.columns)]
    assert sorted(map(str, written.select(*cols).collect())) == sorted(
        map(str, one_shot.select(*cols).collect())
    )
    # idempotent re-run of one day's interval
    batch = fact.where(F.col("event_date").cast("string") == days[0])
    rollups.maintain_user_day_presence_rollup(spark, batch, dim_time, path)
    assert spark.read.parquet(path).count() == written.count()

    served = rollups.dau_segments_from_presence(
        spark.read.parquet(path), dim_user
    )
    plan = plan_inspect.simple_plan(served)
    assert "fact_user_events" not in plan, plan
    assert "dim_time" not in plan, plan  # date lives IN the partial
