"""Measure the HLL sketch-partial serving tier at scale
(pipeline/sketch_rollups.py): rolling 28-day actives and ad-hoc
date-range uniques served from O(days×types) sketches vs the direct
exact computation over the events fact, plus touched-day maintenance
cost vs full rebuild. Accuracy (max relative error vs exact) is
reported next to every speedup — a fast wrong answer is not a result.

Usage:
  python scripts/bench_sketch_serving.py \
      --events /tmp/spark_graft_x300ev/events.parquet --label x300_uniform
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

from reciping_data_pipeline_spark.pipeline import sketch_rollups as sr  # noqa: E402
from reciping_data_pipeline_spark.session import get_spark  # noqa: E402


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
    ap.add_argument("--label", required=True)
    ap.add_argument("--rollup-dir", default="")
    ap.add_argument("--window", type=int, default=28)
    args = ap.parse_args()

    spark = get_spark(app_name="bench_sketch_serving")
    spark.sparkContext.setLogLevel("ERROR")
    events = spark.read.parquet(args.events)
    report: dict = {"label": args.label, "events": events.count(), "window": args.window}

    rollup_dir = args.rollup_dir or (args.events.rstrip("/") + "_sketch_rollup")
    if not os.path.isdir(rollup_dir):
        t0 = time.perf_counter()
        sr.maintain_day_sketch_rollup(spark, events, rollup_dir)
        report["sketch_build_s"] = round(time.perf_counter() - t0, 2)
    rollup = sr.read_day_sketch_rollup(spark, rollup_dir)
    report["sketch_rows"] = rollup.count()

    w = args.window

    def rolling_direct():
        du = events.select(F.to_date("ts").alias("d"), "user_id").distinct()
        days = du.select(F.col("d").alias("serve_date")).distinct()
        return (
            du.withColumn("offset", F.explode(F.sequence(F.lit(0), F.lit(w - 1))))
            .select(F.date_add("d", F.col("offset")).alias("serve_date"), "user_id")
            .join(F.broadcast(days), "serve_date", "left_semi")
            .groupBy("serve_date")
            .agg(F.count_distinct("user_id").alias("active"))
        )

    def rolling_served():
        return sr.rolling_actives_est(rollup, window_days=w)

    # accuracy before timing
    exact = {str(r["serve_date"]): r["active"] for r in rolling_direct().collect()}
    est = {r["serve_date"]: r["active_users_est"] for r in rolling_served().collect()}
    assert est.keys() == exact.keys()
    report["rolling_max_rel_err"] = round(
        max(abs(est[d] - exact[d]) / max(exact[d], 1) for d in exact), 5
    )
    report["rolling_direct_s"] = round(_median3(lambda: rolling_direct().count()), 2)
    report["rolling_served_s"] = round(_median3(lambda: rolling_served().count()), 2)
    report["rolling_speedup"] = round(
        report["rolling_direct_s"] / max(report["rolling_served_s"], 1e-9), 1
    )

    # ad-hoc date-range uniques (the shape exact partials cannot serve)
    dates = sorted(exact)
    start, end = dates[0], dates[len(dates) // 2]

    def range_direct():
        return (
            events.where(F.to_date("ts").between(F.lit(start), F.lit(end)))
            .agg(F.count_distinct("user_id").alias("u"))
        )

    def range_served():
        return sr.range_uniques_est(rollup, start, end)

    tru = range_direct().collect()[0]["u"]
    estv = range_served().collect()[0]["uniques_est"]
    report["range_rel_err"] = round(abs(estv - tru) / max(tru, 1), 5)
    report["range_direct_s"] = round(_median3(lambda: range_direct().count()), 2)
    report["range_served_s"] = round(_median3(lambda: range_served().count()), 2)

    # k-day retention (r12): |active(d) ∩ active(d+k)| — sketches
    # can't intersect, so serving goes through inclusion–exclusion;
    # the direct path is a user-keyed self-join of the day-distinct
    # set. Accuracy (max rel err over every (cohort, k) cell) printed
    # beside the speedup, as always.
    def retention_direct():
        du = events.select(F.to_date("ts").alias("d"), "user_id").distinct()
        a, b = du.alias("a"), du.alias("b")
        k = F.datediff(F.col("b.d"), F.col("a.d"))
        return (
            a.join(b, (F.col("a.user_id") == F.col("b.user_id")) & k.isin(1, 7))
            .groupBy(
                F.col("a.d").cast("string").alias("cohort_date"),
                k.cast("int").alias("offset_days"),
            )
            .agg(F.count("*").alias("retained"))
        )

    def retention_served():
        return sr.retention_est_from_sketch(rollup, offsets=(1, 7))

    rexact = {
        (r["cohort_date"], r["offset_days"]): r["retained"]
        for r in retention_direct().collect()
    }
    rest = {
        (r["cohort_date"], r["offset_days"]): r["retained_est"]
        for r in retention_served().collect()
    }
    # The served side emits a row for every (cohort, d+k) pair where
    # BOTH days have activity; the exact self-join emits one only when
    # the intersection is non-empty — a zero-overlap pair is a served
    # row with no exact twin, not a bug (ADVICE r12). Err measured over
    # the exact keys only.
    assert rexact.keys() <= rest.keys(), sorted(rexact.keys() - rest.keys())
    report["retention_max_rel_err"] = round(
        max(abs(rest[p] - rexact[p]) / max(rexact[p], 1) for p in rexact), 5
    )
    report["retention_direct_s"] = round(_median3(lambda: retention_direct().count()), 2)
    report["retention_served_s"] = round(_median3(lambda: retention_served().count()), 2)
    report["retention_speedup"] = round(
        report["retention_direct_s"] / max(report["retention_served_s"], 1e-9), 1
    )

    # maintenance: one touched day vs full rebuild
    one_day = dates[0]
    one_batch = events.where(F.to_date("ts").cast("string") == one_day)
    report["maintain_one_day_s"] = round(
        _median3(
            lambda: sr.maintain_day_sketch_rollup(
                spark, one_batch, rollup_dir, touched_dates=[one_day]
            )
        ),
        2,
    )
    report["maintain_full_rebuild_s"] = round(
        _median3(lambda: sr.maintain_day_sketch_rollup(spark, events, rollup_dir)), 2
    )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
