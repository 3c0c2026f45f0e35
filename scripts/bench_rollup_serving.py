"""Measure rollup serving vs direct fact aggregation at scale
(VERDICT r09 #3: make WAU serving win everywhere, not just on skewed
fixtures).

Three WAU forms over the same events fixture, median-of-3 each:
- direct: distinct (week, user) over the events fact
- day-partials: distinct (week, user) over the (event_date, user_id,
  event_type) rollup — r09's form, which only wins when users emit
  many events per (day, type) (compression ratio >> 1)
- week-partials: COUNT(DISTINCT user) over the (week_start, user_id,
  event_type) rollup — the cascaded second-level partial whose row
  count is O(users×weeks), independent of per-day multiplicity

plus DAU direct vs day-partials for the table's context columns.
Exact parity of all serving forms against the direct computation is
asserted before timing (a fast wrong answer is not a result).

Usage:
  python scripts/bench_rollup_serving.py \
      --events /tmp/spark_graft_gsets_x300/events.parquet \
      --day-rollup /tmp/spark_graft_rollup_x300 \
      --week-rollup /tmp/spark_graft_week_x300 \
      --label x300_uniform
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from reciping_data_pipeline_spark.pipeline import rollups  # noqa: E402
from reciping_data_pipeline_spark.session import get_spark  # noqa: E402
from reciping_data_pipeline_spark.sources import writers  # noqa: E402


def _median3(fn) -> float:
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True)
    ap.add_argument("--day-rollup", required=True)
    ap.add_argument("--week-rollup", required=True)
    ap.add_argument("--label", required=True)
    args = ap.parse_args()

    spark = get_spark(app_name="bench_rollup_serving")
    spark.sparkContext.setLogLevel("ERROR")
    events = spark.read.parquet(args.events)

    report: dict = {"label": args.label, "events": events.count()}

    if not os.path.isdir(args.day_rollup):
        t0 = time.perf_counter()
        rollups.maintain_user_day_rollup(spark, events, args.day_rollup)
        report["day_rollup_build_s"] = round(time.perf_counter() - t0, 2)
    day_rollup_path = args.day_rollup

    # cascade build of the week rollup through the maintenance path
    # (touched dates = every day present — a full backfill)
    day_tbl = writers.read_table(spark, day_rollup_path)
    t0 = time.perf_counter()
    dates = [
        str(r["d"])
        for r in day_tbl.select(F.col("event_date").cast("string").alias("d"))
        .distinct()
        .collect()
    ]
    rollups.maintain_user_week_rollup(spark, day_rollup_path, args.week_rollup, dates)
    report["week_rollup_build_s"] = round(time.perf_counter() - t0, 2)
    week_tbl = writers.read_table(spark, args.week_rollup)
    report["day_rollup_rows"] = day_tbl.count()
    report["week_rollup_rows"] = week_tbl.count()

    def wau_direct():
        return (
            events.select(
                F.date_trunc("week", F.col("ts")).cast("date").cast("string").alias(
                    "week_start"
                ),
                "user_id",
            )
            .groupBy("week_start")
            .agg(F.countDistinct("user_id").alias("wau"))
        )

    def dau_direct():
        return events.groupBy(
            F.col("ts").cast("date").cast("string").alias("event_date"), "event_type"
        ).agg(F.countDistinct("user_id").alias("dau"), F.count("*").alias("event_count"))

    # exact parity first — serving must lose nothing
    truth = sorted(map(str, wau_direct().collect()))
    assert sorted(map(str, rollups.wau_from_rollup(day_tbl).collect())) == truth
    assert sorted(map(str, rollups.wau_from_week_rollup(week_tbl).collect())) == truth
    report["wau_parity"] = "exact"

    report["wau_direct_s"] = round(_median3(lambda: wau_direct().count()), 2)
    report["wau_day_partials_s"] = round(
        _median3(lambda: rollups.wau_from_rollup(day_tbl).count()), 2
    )
    report["wau_week_partials_s"] = round(
        _median3(lambda: rollups.wau_from_week_rollup(week_tbl).count()), 2
    )
    report["dau_direct_s"] = round(_median3(lambda: dau_direct().count()), 2)
    report["dau_day_partials_s"] = round(
        _median3(lambda: rollups.dau_from_rollup(day_tbl).count()), 2
    )
    report["wau_week_speedup"] = round(
        report["wau_direct_s"] / report["wau_week_partials_s"], 2
    )
    # the stacked shapes, served
    report["dau_segment_stack_served_s"] = round(
        _median3(lambda: rollups.dau_segments_from_rollup(day_tbl).count()), 2
    )
    report["wau_segment_stack_served_s"] = round(
        _median3(lambda: rollups.wau_segments_from_week_rollup(week_tbl).count()), 2
    )

    # Incremental maintenance cost (VERDICT r10 #7): ONE touched week
    # re-cascaded (the 15-min-interval steady state — a late sliver of
    # one day triggers exactly one week partition recompute, pruned to
    # that week's 7 day-partitions) vs the full-history rebuild above.
    # Cost must be independent of how many OTHER weeks exist.
    one_day = min(dates)
    report["week_maintain_one_touched_s"] = round(
        _median3(
            lambda: rollups.maintain_user_week_rollup(
                spark, day_rollup_path, args.week_rollup, [one_day]
            )
        ),
        2,
    )
    report["week_maintain_full_rebuild_s"] = round(
        _median3(
            lambda: rollups.maintain_user_week_rollup(
                spark, day_rollup_path, args.week_rollup, dates
            )
        ),
        2,
    )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
