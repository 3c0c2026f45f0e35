"""Medallion build + 21-query analytics at a 3M-event fixture
(VERDICT r08 #6): 3× the reference's 1M-event bulk shape, extending the
measured 242k→1M throughput curve one more point.

The fixture is the same datagen shape bench.py uses (JSONL staging +
recipe master), just larger; generation is pure-Python and cached on
disk so it is never billed to pipeline timing. Per-stage seconds are
reported for BENCH_NOTES.md: bulk bronze→gold, the 21-query suite over
the built Gold layer (serving posture, views cached), and one ~10k
incremental interval against the big warehouse.

Usage: python scripts/bench_medallion_at_scale.py [--users 75000] [--days 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_FIXTURE_ROOT, _cached_fixture, run_noop  # noqa: E402
from reciping_data_pipeline_spark.pipeline import analytics, runner  # noqa: E402
from reciping_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=75_000)
    ap.add_argument("--days", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark(app_name="bench_medallion_at_scale")
    spark.sparkContext.setLogLevel("ERROR")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    out: dict = {"metric": "medallion_at_scale", "users": args.users, "days": args.days}
    wh_root = tempfile.mkdtemp(prefix="bench_medallion_scale_")
    try:
        bulk = _cached_fixture(
            f"bulk_u{args.users}_d{args.days}",
            seed=103,
            n_users=args.users,
            n_days=args.days,
            start=datetime(2025, 9, 1),
        )
        wh = os.path.join(wh_root, "wh_bulk")
        t0 = time.perf_counter()
        report = runner.bulk_backfill(
            spark, bulk["staging_dir"], wh, bulk["recipe_master"],
            datetime(2025, 9, 1) + timedelta(days=args.days),
            time_dim_range=(
                "2025-09-01 00:00:00",
                (datetime(2025, 9, 1) + timedelta(days=args.days + 1)).strftime(
                    "%Y-%m-%d %H:00:00"
                ),
            ),
        )
        out["bulk_sec"] = round(time.perf_counter() - t0, 1)
        out["bulk_events"] = report.bronze_rows
        out["bulk_events_per_sec"] = round(report.bronze_rows / out["bulk_sec"], 1)

        analytics.register_gold_views(spark, wh, cache=True)
        t0 = time.perf_counter()
        per_q = {}
        for name in analytics.all_analytics():
            tq = time.perf_counter()
            run_noop(
                spark.sql(
                    analytics.sql_for(
                        name, min_users=5, start="2025-09-01",
                        end=(datetime(2025, 9, 1) + timedelta(days=args.days - 1)).strftime("%Y-%m-%d"),
                    )
                )
            )
            per_q[name] = round(time.perf_counter() - tq, 2)
        out["analytics_21q_sec"] = round(time.perf_counter() - t0, 1)
        out["analytics_queries"] = per_q

        # incremental interval placed AFTER the bulk window (bench.py's
        # shape: disjoint staging days, one pruned-partition append)
        inc_start = datetime(2025, 9, 1) + timedelta(days=args.days + 2)
        inc = _cached_fixture(
            f"incr_d{args.days}", seed=102, n_users=2_600, n_days=1,
            start=inc_start, span_seconds=600,
        )
        t0 = time.perf_counter()
        runner.incremental_run(
            spark, inc["staging_dir"], wh, inc_start, inc_start + timedelta(hours=1),
        )
        out["incremental_sec"] = round(time.perf_counter() - t0, 1)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        shutil.rmtree(wh_root, ignore_errors=True)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
