"""r14 optimization measurement loop: for each named catalog query,
capture `.explain("formatted")` into plans/r14/<name>_<tag>.txt and
time the noop-sink execution (guide §1.4) — warm-up + median of 3 —
printing one JSON line per query and a summary.

Usage:
    python scripts/opt_measure.py --tag before --queries a,b,c
    python scripts/opt_measure.py --tag after  --queries a,b,c [--no-plan]

Timing methodology matches bench.py (noop sink, warm-up pass, median
of 3, drain between queries) so numbers are comparable to BENCH_FULL.
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


def _drain(spark) -> None:
    import gc

    gc.collect()
    spark._jvm.System.gc()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", required=True, help="comma-separated catalog names")
    ap.add_argument("--no-plan", action="store_true", help="skip plan capture")
    ap.add_argument("--no-time", action="store_true", help="skip timing")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--round", default="r15", help="plans/<round>/ output dir")
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name=f"opt_measure_{args.tag}")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    names = [n for n in args.queries.split(",") if n]
    missing = [n for n in names if n not in registry]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2

    out: dict[str, float] = {}
    for name in names:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        df = q.fn(spark, args.sf)
        if not args.no_plan:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        if args.no_time:
            print(json.dumps({"query": name, "plan": "captured"}))
            continue
        # warm-up
        df.write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            # rebuild the DataFrame each rep: queries with eager
            # internals (persist/localCheckpoint) must not amortize
            # across reps in a way bench.py would not
            q.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        med = round(sorted(samples)[len(samples) // 2], 3)
        out[name] = med
        print(json.dumps({"query": name, "sec": med, "samples": [round(s, 3) for s in samples]}), flush=True)
        _drain(spark)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"tag": args.tag, "sf": args.sf, "timings": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
