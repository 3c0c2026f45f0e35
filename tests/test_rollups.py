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

    # the full DAU.sql segment stack is fact-free too: 3 blocks, all
    # reading the rollup parquet, zero events scans
    splan = inspect.simple_plan(rollups.dau_segments_from_rollup(rollup))
    assert splan.count("Scan parquet") == 3, splan
    assert "events.parquet" not in splan, splan


def test_late_data_closed_by_construction_with_events_path(spark, events, tmp_path):
    """ADVICE r09: a caller passing ONLY a late-arriving sliver of an
    old day must not shrink that day's partials when the committed
    events table is wired in via events_path — the recompute re-reads
    the full day history itself, no caller union required."""
    from reciping_data_pipeline_spark.sources import writers

    events_path = os.path.join(tmp_path, "events_tbl")
    rollup_path = os.path.join(tmp_path, "rollup")
    ev = events.withColumn("event_date", F.col("ts").cast("date").cast("string"))
    writers.append_table(ev, events_path, partition_cols=["event_date"])
    # initial full build
    rollups.maintain_user_day_rollup(spark, events, rollup_path, events_path=events_path)
    full = _sorted_rows(rollups.read_user_day_rollup(spark, rollup_path))
    # a late sliver: ONE event of some existing day, passed alone
    some_day = events.select(F.col("ts").cast("date").cast("string").alias("d")).first()["d"]
    sliver = events.where(F.col("ts").cast("date").cast("string") == some_day).limit(1)
    touched = rollups.maintain_user_day_rollup(
        spark, sliver, rollup_path, events_path=events_path
    )
    assert touched == [some_day]
    assert _sorted_rows(rollups.read_user_day_rollup(spark, rollup_path)) == full
    # the no-events_path contract (caller owns the union) would shrink:
    rollups.maintain_user_day_rollup(spark, sliver, rollup_path)
    shrunk = rollups.read_user_day_rollup(spark, rollup_path).where(
        F.col("event_date").cast("string") == some_day
    )
    assert shrunk.count() == 1  # documents why events_path exists
    # repair via the constructed path
    rollups.maintain_user_day_rollup(spark, sliver, rollup_path, events_path=events_path)
    assert _sorted_rows(rollups.read_user_day_rollup(spark, rollup_path)) == full


def test_dau_segment_stack_matches_direct(spark, events):
    """The reference DAU.sql stacked shape served from partials equals
    the direct stacked computation over events."""
    rollup = rollups.user_day_rollup(events)
    served = rollups.dau_segments_from_rollup(rollup)

    events.createOrReplaceTempView("ev_seg_test")
    direct = spark.sql(
        """
        WITH base AS (
            SELECT CAST(CAST(ts AS DATE) AS STRING) AS event_date, event_type,
                   user_id,
                   CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'control'
                        WHEN 1 THEN 'variant_a' ELSE 'variant_b' END AS seg
            FROM ev_seg_test
        )
        SELECT event_date, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
               count(DISTINCT user_id) AS dau
        FROM base GROUP BY event_date
        UNION ALL
        SELECT event_date, 'EVENT_TYPE', event_type, count(DISTINCT user_id)
        FROM base GROUP BY event_date, event_type
        UNION ALL
        SELECT event_date, 'AB_GROUP', seg, count(DISTINCT user_id)
        FROM base GROUP BY event_date, seg
        """
    )
    assert _sorted_rows(served) == _sorted_rows(direct)


def test_week_rollup_cascade_maintenance_and_serving(spark, events, tmp_path):
    """The week-grain partial maintained day-by-day through the cascade
    (day rollup → week rollup, touched-week recompute) equals a one-shot
    build, WAU served from it equals direct, and the serving plan is
    fact-free."""
    day_path = os.path.join(tmp_path, "day_rollup")
    week_path = os.path.join(tmp_path, "week_rollup")
    dates = sorted(
        r["d"]
        for r in events.select(
            F.col("ts").cast("date").cast("string").alias("d")
        ).distinct().collect()
    )
    for ds in [dates[:1], dates[1:]]:
        if not ds:
            continue
        batch = events.where(F.col("ts").cast("date").cast("string").isin(ds))
        touched = rollups.maintain_user_day_rollup(spark, batch, day_path)
        weeks = rollups.maintain_user_week_rollup(spark, day_path, week_path, touched)
        assert weeks  # every touched day maps to a touched week
    incremental = spark.read.parquet(week_path)
    one_shot = rollups.user_week_rollup(rollups.user_day_rollup(events))
    cols = [F.col(c).cast("string") for c in sorted(one_shot.columns)]
    assert _sorted_rows(incremental.select(*cols)) == _sorted_rows(
        one_shot.select(*cols)
    )

    direct_wau = (
        events.select(
            F.date_trunc("week", F.col("ts")).cast("date").cast("string").alias("week_start"),
            "user_id",
        )
        .groupBy("week_start")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    assert _sorted_rows(rollups.wau_from_week_rollup(incremental)) == _sorted_rows(direct_wau)

    plan = inspect.simple_plan(rollups.wau_from_week_rollup(incremental))
    assert plan.count("Scan parquet") == 1, plan
    assert "events.parquet" not in plan, plan


def test_wau_segment_stack_matches_direct(spark, events):
    """The reference WAU.sql stacked shape (uniques stack + LAG growth
    ladder) served from the week-grain partials equals the direct
    computation over events."""
    week = rollups.user_week_rollup(rollups.user_day_rollup(events))
    served = rollups.wau_segments_from_week_rollup(week)

    events.createOrReplaceTempView("ev_wau_seg_test")
    direct = spark.sql(
        """
        WITH base AS (
            SELECT CAST(CAST(date_trunc('week', ts) AS DATE) AS STRING) AS week_start,
                   event_type, user_id,
                   CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'control'
                        WHEN 1 THEN 'variant_a' ELSE 'variant_b' END AS seg
            FROM ev_wau_seg_test
        ), stacked AS (
            SELECT week_start, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
                   count(DISTINCT user_id) AS wau
            FROM base GROUP BY week_start
            UNION ALL
            SELECT week_start, 'EVENT_TYPE', event_type, count(DISTINCT user_id)
            FROM base GROUP BY week_start, event_type
            UNION ALL
            SELECT week_start, 'AB_GROUP', seg, count(DISTINCT user_id)
            FROM base GROUP BY week_start, seg
        )
        SELECT week_start,
               CAST(year(CAST(week_start AS DATE)) AS INT) AS year,
               CAST(weekofyear(CAST(week_start AS DATE)) AS INT) AS week_number,
               segment_type, segment_value, wau,
               CAST(LAG(wau) OVER (PARTITION BY segment_type, segment_value
                              ORDER BY week_start) AS DOUBLE) AS prev_week_wau,
               CASE WHEN LAG(wau) OVER (PARTITION BY segment_type, segment_value
                                        ORDER BY week_start) > 0
                    THEN CAST(floor((wau - LAG(wau) OVER (PARTITION BY segment_type,
                                                     segment_value
                                                     ORDER BY week_start)) * 10000.0
                               / LAG(wau) OVER (PARTITION BY segment_type,
                                                segment_value
                                                ORDER BY week_start) + 0.5) AS DOUBLE) / 100.0
                    ELSE NULL END AS week_over_week_growth_pct
        FROM stacked
        """
    )
    cols = [F.col(c).cast("string") for c in sorted(direct.columns)]
    assert _sorted_rows(served.select(*cols)) == _sorted_rows(direct.select(*cols))


def test_rollup_stream_matches_batch_and_survives_redelivery(spark, tmp_path):
    """Streaming rollup maintenance: same-day events split across
    micro-batches must MERGE into the day's partials (the bug an
    overwrite-from-batch-only design would have), and a second run that
    re-offers wave-1 files plus new events must converge to exactly the
    one-shot batch rollup over all unique events."""
    import json as _json

    from reciping_data_pipeline_spark.streaming import ingest

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    events_dir = str(tmp_path / "events_tbl")
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def write_wave(name, rows):
        with open(incoming / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    # two files, SAME day, forced into separate triggers
    write_wave(
        "w1.jsonl",
        [
            {"event_id": 1, "ts": "2025-09-01T10:00:00", "user_id": 7, "event_type": "click", "value": 1.25},
            {"event_id": 2, "ts": "2025-09-01T11:00:00", "user_id": 8, "event_type": "view", "value": 0.5},
        ],
    )
    write_wave(
        "w2.jsonl",
        [
            {"event_id": 3, "ts": "2025-09-01T12:00:00", "user_id": 7, "event_type": "click", "value": 2.0},
            {"event_id": 4, "ts": "2025-09-02T09:00:00", "user_id": 9, "event_type": "click", "value": 3.0},
        ],
    )
    q = ingest.start_user_day_rollup_stream(
        spark, str(incoming), events_dir, rollup_dir, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(120)

    # wave 3: re-offers event 1-3 content under a new file (redelivery)
    # plus one genuinely new event on day 1 AND a malformed row with no
    # event_id — the anti-join can never match NULL (SQL semantics), so
    # without the up-front isNotNull filter it would re-append on every
    # replay (ADVICE r09)
    write_wave(
        "w3.jsonl",
        [
            {"event_id": 1, "ts": "2025-09-01T10:00:00", "user_id": 7, "event_type": "click", "value": 1.25},
            {"event_id": 3, "ts": "2025-09-01T12:00:00", "user_id": 7, "event_type": "click", "value": 2.0},
            {"event_id": 5, "ts": "2025-09-01T23:00:00", "user_id": 8, "event_type": "click", "value": 0.75},
            {"ts": "2025-09-01T23:30:00", "user_id": 9, "event_type": "click", "value": 9.0},
        ],
    )
    q = ingest.start_user_day_rollup_stream(
        spark, str(incoming), events_dir, rollup_dir, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(120)

    streamed = rollups.read_user_day_rollup(spark, rollup_dir)
    # the malformed NULL-id row must be dropped, not committed (and not
    # re-appended per replay)
    committed = spark.read.parquet(events_dir)
    assert committed.where(F.col("event_id").isNull()).count() == 0
    assert committed.count() == 5
    # the batch truth: one-shot rollup over the 5 unique well-formed events
    all_events = (
        spark.read.format("json")
        .schema("event_id long, ts timestamp, user_id long, event_type string, value double")
        .option("pathGlobFilter", "*.jsonl")
        .load(str(incoming))
        .where(F.col("event_id").isNotNull())
        .dropDuplicates(["event_id"])
    )
    batch = rollups.user_day_rollup(all_events)
    cols = sorted(batch.columns)
    assert _sorted_rows(
        streamed.select(*[F.col(c).cast("string") for c in cols])
    ) == _sorted_rows(batch.select(*[F.col(c).cast("string") for c in cols]))
    # user 7 day-1 clicks merged across triggers AND not double-counted
    u7 = streamed.where(
        (F.col("user_id") == 7) & (F.col("event_type") == "click")
    ).collect()
    assert len(u7) == 1 and u7[0]["n_events"] == 2 and u7[0]["value_u"] == 3_250_000


def test_wau_lag_deterministic_across_iso_year_boundary(spark):
    """ADVICE r12 / VERDICT r13 #5 trigger fixture: an ISO week that
    straddles the year boundary. The reference groups WAU by
    year(t.date)/weekofyear(t.date), so the week starting Mon
    2025-12-29 splits into TWO rows per week_start — (year=2025,
    week=1) for the Dec 29–31 member dates and (year=2026, week=1)
    for Jan 1–4 — and a LAG ordered by week_start alone is
    nondeterministic on the tie. The r13 fix orders by the FULL
    (week_start, year, week_number) grain on both engines; this pins
    the unique chain that only the full grain produces (the two
    straddle rows carry distinct wau values, so a lost tie-break
    flips prev_week_wau)."""
    import datetime as dt

    rows = []

    def week(dates, users):
        for d in dates:
            for u in users:
                rows.append((dt.date.fromisoformat(d), u))

    week(["2025-12-22"], [1, 2, 3])              # (2025, 52) wau 3
    # deliberately append the LATER straddle half first: if the window
    # order degrades to week_start only, input order decides the tie
    week(["2026-01-01", "2026-01-02"], [1, 2])   # (2026, 1)  wau 2
    week(["2025-12-29", "2025-12-31"], [1])      # (2025, 1)  wau 1
    week(["2026-01-05"], [1, 2, 3, 4])           # (2026, 2)  wau 4
    presence = spark.createDataFrame(
        [(d, u) for d, u in rows], "active_date date, user_dim_key long"
    )
    dim = spark.createDataFrame(
        [(u, "seg_a", "grp_x") for u in (1, 2, 3, 4)],
        "user_sk long, user_segment string, ab_test_group string",
    )
    wk = rollups.user_week_presence_rollup(presence)
    # the straddle week keeps BOTH (year, week_number) rows at one
    # week_start — the reference's member-date grain, reproduced
    straddle = wk.where(F.col("week_start") == "2025-12-29")
    assert sorted(
        (r["year"], r["week_number"]) for r in straddle.select(
            "year", "week_number"
        ).distinct().collect()
    ) == [(2025, 1), (2026, 1)]
    got = {
        (r["week_start"], r["year"], r["week_number"]): (
            r["wau"], r["prev_week_wau"]
        )
        for r in rollups.wau_segments_from_presence(wk, dim)
        .where(F.col("segment_type") == "TOTAL")
        .collect()
    }
    assert got == {
        ("2025-12-22", 2025, 52): (3, None),
        ("2025-12-29", 2025, 1): (1, 3),
        ("2025-12-29", 2026, 1): (2, 1),
        ("2026-01-05", 2026, 2): (4, 2),
    }
