"""Head-to-head: GROUPING SETS one-pass siblings vs their faithful
UNION ALL forms, both as Spark SQL at the bench scale factor.

The five segment-stack queries (SURVEY §2.7 U1 / §7.4 #6) were
rewritten from the reference's N-block UNION ALL (N fact scans) to one
GROUPING SETS pass (one scan + Expand). The rewrite is result-identical
(each sibling is driver-hash-oracled against its UNION ALL form in
DuckDB); this script measures the claimed speedup so BENCH_NOTES.md can
carry a number instead of an assertion.

Usage: python scripts/gsets_headtohead.py [--sf /root/testdata/sf0.1]
Prints per-query median-of-3 timings + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reciping_data_pipeline_spark.queries import all_queries  # noqa: E402
from reciping_data_pipeline_spark.session import get_spark  # noqa: E402
from reciping_data_pipeline_spark.tables import load_table  # noqa: E402

_AB_SEG = (
    "CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'control' "
    "WHEN 1 THEN 'variant_a' ELSE 'variant_b' END"
)
_WEEK = "CAST(CAST(date_trunc('week', ts) AS DATE) AS STRING)"

# Spark-dialect UNION ALL forms — the faithful N-scan shape the
# reference's SQL uses (its Trino queries re-scan the fact per block).
UNION_FORMS: dict[str, tuple[str, tuple[str, ...]]] = {
    "wau_grouping_sets": (
        f"""
        WITH base AS (
            SELECT {_WEEK} AS week_start, event_type, {_AB_SEG} AS seg, user_id
            FROM events
        )
        SELECT week_start, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
               count(DISTINCT user_id) AS wau
        FROM base GROUP BY week_start
        UNION ALL
        SELECT week_start, 'EVENT_TYPE', event_type, count(DISTINCT user_id)
        FROM base GROUP BY week_start, event_type
        UNION ALL
        SELECT week_start, 'AB_GROUP', seg, count(DISTINCT user_id)
        FROM base GROUP BY week_start, seg
        """,
        ("events",),
    ),
    "events_per_time_grouping_sets": (
        f"""
        WITH base AS (
            SELECT CAST(hour(ts) AS INT) AS hour, {_AB_SEG} AS seg, user_id
            FROM events
        )
        SELECT hour, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
               count(*) AS event_count, count(DISTINCT user_id) AS unique_users
        FROM base GROUP BY hour
        UNION ALL
        SELECT hour, 'AB_GROUP', seg, count(*), count(DISTINCT user_id)
        FROM base GROUP BY hour, seg
        """,
        ("events",),
    ),
    "daily_engagement_grouping_sets": (
        f"""
        WITH base AS (
            SELECT CAST(weekday(ts) + 1 AS INT) AS day_of_week, {_AB_SEG} AS seg,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS value_u
            FROM events
        )
        SELECT day_of_week, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
               CAST(floor(CAST(sum(value_u) AS DOUBLE) / (10000.0 * count(*)) + 0.5)
                    AS DOUBLE) / 100.0 AS avg_engagement,
               count(*) AS total_events
        FROM base GROUP BY day_of_week
        UNION ALL
        SELECT day_of_week, 'AB_GROUP', seg,
               CAST(floor(CAST(sum(value_u) AS DOUBLE) / (10000.0 * count(*)) + 0.5)
                    AS DOUBLE) / 100.0,
               count(*)
        FROM base GROUP BY day_of_week, seg
        """,
        ("events",),
    ),
    "pages_views_grouping_sets": (
        f"""
        WITH base AS (
            SELECT concat('page_', CAST(CAST(get_json_object(props, '$.k') AS INT) % 5
                                        AS STRING)) AS page_name,
                   {_AB_SEG} AS seg, user_id
            FROM events
        )
        SELECT page_name, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
               count(*) AS page_views, count(DISTINCT user_id) AS unique_visitors
        FROM base GROUP BY page_name
        UNION ALL
        SELECT page_name, 'AB_GROUP', seg, count(*), count(DISTINCT user_id)
        FROM base GROUP BY page_name, seg
        """,
        ("events",),
    ),
    "dish_interactions_grouping_sets": (
        """
        WITH base AS (
            SELECT p.p_type AS dish_type, o.o_orderpriority AS seg,
                   o.o_custkey, l.l_extendedprice
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        SELECT dish_type, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
               count(*) AS interactions,
               count(DISTINCT o_custkey) AS unique_customers,
               floor(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                          AS DOUBLE) / 100.0 + 0.5) AS revenue_whole
        FROM base GROUP BY dish_type
        UNION ALL
        SELECT dish_type, 'PRIORITY', seg, count(*),
               count(DISTINCT o_custkey),
               floor(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                          AS DOUBLE) / 100.0 + 0.5)
        FROM base GROUP BY dish_type, seg
        """,
        ("lineitem", "part", "orders"),
    ),
}


def _drop_page_cache() -> None:
    """Cold-scan mode: flush dirty pages and evict the OS page cache so
    every timed pass re-reads parquet from disk — the scan-bound regime
    the GROUPING SETS rewrite targets (N−1 avoided fact scans). Needs
    root; raises loudly rather than silently measuring hot."""
    import subprocess

    subprocess.run(["sync"], check=True)
    with open("/proc/sys/vm/drop_caches", "w") as f:
        f.write("3\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--cold", action="store_true",
        help="drop the OS page cache before every timed pass (scan-bound regime)",
    )
    ap.add_argument("--only", default="", help="comma-separated query subset")
    args = ap.parse_args()

    spark = get_spark(app_name="gsets_headtohead")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    def run_noop(df):
        df.write.format("noop").mode("overwrite").save()

    def med3(build) -> float:
        run_noop(build())  # warm-up (codegen/JIT/footers; footers re-read cold below)
        samples = []
        for _ in range(3):
            if args.cold:
                _drop_page_cache()
            t0 = time.perf_counter()
            run_noop(build())
            samples.append(time.perf_counter() - t0)
        return round(sorted(samples)[1], 3)

    rows = []
    selected = set(args.only.split(",")) if args.only else None
    for name, (union_sql, tables) in UNION_FORMS.items():
        if selected is not None and name not in selected:
            continue
        for t in tables:
            load_table(spark, args.sf, t).createOrReplaceTempView(t)
        gs_sec = med3(lambda: registry[name].fn(spark, args.sf))
        ua_sec = med3(lambda: spark.sql(union_sql))
        rows.append(
            {
                "query": name,
                "grouping_sets_sec": gs_sec,
                "union_all_sec": ua_sec,
                "speedup": round(ua_sec / gs_sec, 2) if gs_sec else None,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print("\n| query | GROUPING SETS s | UNION ALL s | speedup |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['grouping_sets_sec']} | {r['union_all_sec']} "
            f"| {r['speedup']}x |"
        )
    print(
        json.dumps(
            {"metric": "gsets_headtohead", "sf": args.sf, "cold": args.cold, "rows": rows}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
