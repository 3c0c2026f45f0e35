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

from reciping_data_pipeline_spark.queries import groupingsets  # noqa: E402
from reciping_data_pipeline_spark.session import get_spark  # noqa: E402

FAMILIES = list(groupingsets._FORMS)


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
    for name in FAMILIES:
        if selected is not None and name not in selected:
            continue
        gs_sec = med3(
            lambda: groupingsets.segment_stack(spark, args.sf, name, form="grouping_sets")
        )
        ua_sec = med3(
            lambda: groupingsets.segment_stack(spark, args.sf, name, form="union_all")
        )
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
