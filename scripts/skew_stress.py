"""Skewed-key stress at scale (VERDICT r08 #5).

The uniform ``make_sf.py`` replication can't produce the reducer shape
that kills 100 TB joins — real clickstreams are zipfian, with rank-1
users carrying percent-level shares of ALL events. This script runs
against a ``make_sf.py --zipf-users N`` fixture and measures/asserts:

1. **Skew profile** of events.user_id — top-key share + max/avg ppm
   (the `join_key_skew_profile` diagnostic shape, on the skewed key).
2. **AQE skew-split engages** on a deliberately shuffle-forced
   events×customer join (autoBroadcast disabled so the dim can't hide
   the skew): the adaptive final plan must contain a skewed
   AQEShuffleRead, or the salted fallback must balance reducers.
3. **Salted join balances reducers**: rows-per-shuffle-partition
   max/avg measured for the plain vs salted plan with AQE skew split
   OFF — the salted plan's imbalance must drop toward 1.
4. **Result parity**: plain and salted joins agree on the aggregate.

Oracle-hash invariance at partitions ∈ {5, 64} is a separate
`driver_sim.py --sf <fixture> --partitions {5,64}` run (the summary
block this script prints shows the exact commands).

Usage:
  python scripts/make_sf.py --out /tmp/spark_graft_zipf_x30 --mult 30 \
      --tables events --zipf-users 15000
  python scripts/skew_stress.py --dir /tmp/spark_graft_zipf_x30
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from reciping_data_pipeline_spark.operators.skew import salted_inner_join  # noqa: E402
from reciping_data_pipeline_spark.session import get_spark  # noqa: E402
from reciping_data_pipeline_spark.tables import load_table  # noqa: E402


def _final_plan(df) -> str:
    # adaptive FINAL plan (valid only after an action has executed it)
    return df._jdf.queryExecution().executedPlan().toString()


def _partition_balance(df) -> tuple[int, float, float]:
    """(n nonempty partitions, max rows, max/avg ratio) of df's output
    partitioning — the reducer-straggler proxy."""
    rows = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in rows]
    mx = max(counts)
    avg = sum(counts) / len(counts)
    return len(counts), mx, round(mx / avg, 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="make_sf.py --zipf-users output")
    ap.add_argument("--salt", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark(app_name="skew_stress")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"dir": args.dir}

    events = load_table(spark, args.dir, "events")
    customer = load_table(spark, args.dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    out["n_events"] = events.count()

    # 1. skew profile on the SKEWED key (user_id)
    freq = events.groupBy("user_id").agg(F.count("*").alias("cnt"))
    prof = freq.agg(
        F.max("cnt").alias("max_cnt"),
        F.sum("cnt").alias("total"),
        F.count("*").alias("distinct_keys"),
    ).first()
    out["top_user_share_ppm"] = int(prof["max_cnt"] * 1_000_000 // prof["total"])
    out["max_over_avg"] = int(prof["max_cnt"] * prof["distinct_keys"] // prof["total"])
    print(json.dumps({k: out[k] for k in ("n_events", "top_user_share_ppm", "max_over_avg")}), flush=True)

    def seg_agg(join_fn):
        joined = join_fn()
        # parity must hold across DIFFERENT physical plans (plain vs
        # salted), so the value sum is quantized to an integer grid and
        # summed as BIGINT — exact and order-invariant, where a double
        # sum differs in the last ulps with partition order (the
        # sum-then-floor rule the oracle layer uses engine-wide).
        return joined.groupBy("c_mktsegment").agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")
            ).alias("sv"),
        )

    # 2. shuffle-forced join, AQE skew split ON: final plan must show a
    # skewed shuffle read
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # make the skew visible to AQE at this (local-bench) data size; on a
    # real cluster the 256 MB defaults fire on their own. A zipf(1)
    # population's rank-1 share is ~1/ln(U) (~7% here), so over 32 hash
    # partitions the hot partition is ~3x the median — above factor=2
    # but below the default factor=5, hence the factor override too.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    try:
        plain = events.join(customer, "user_id", "inner")
        t0 = time.perf_counter()
        agg_plain = seg_agg(lambda: plain)
        plain_rows = {r["c_mktsegment"]: (r["n"], r["sv"]) for r in agg_plain.collect()}
        out["plain_join_sec"] = round(time.perf_counter() - t0, 1)
        plan = _final_plan(agg_plain)
        out["aqe_skew_split_engaged"] = ("skewed" in plan) or ("isSkew=true" in plan)
        print(
            json.dumps(
                {
                    "plain_join_sec": out["plain_join_sec"],
                    "aqe_skew_split_engaged": out["aqe_skew_split_engaged"],
                }
            ),
            flush=True,
        )

        # 3. reducer balance, AQE fully OFF (not just skew split): AQE
        # coalesce merges toward byte-equal partitions and masks the
        # raw hash-partition imbalance this step exists to measure.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        n_p, max_p, ratio_plain = _partition_balance(
            events.join(customer, "user_id", "inner").select("user_id", "value")
        )
        n_s, max_s, ratio_salted = _partition_balance(
            salted_inner_join(
                events, customer, "user_id", salt_factor=args.salt
            ).select("user_id", "value")
        )
        out["plain_max_over_avg_partition"] = ratio_plain
        out["salted_max_over_avg_partition"] = ratio_salted
        print(
            json.dumps(
                {
                    "plain_partitions": n_p,
                    "plain_max_rows": max_p,
                    "plain_imbalance": ratio_plain,
                    "salted_partitions": n_s,
                    "salted_max_rows": max_s,
                    "salted_imbalance": ratio_salted,
                }
            ),
            flush=True,
        )

        # 4. parity: salted == plain on the aggregate
        t0 = time.perf_counter()
        salted_rows = {
            r["c_mktsegment"]: (r["n"], r["sv"])
            for r in seg_agg(
                lambda: salted_inner_join(
                    events, customer, "user_id", salt_factor=args.salt
                )
            ).collect()
        }
        out["salted_join_sec"] = round(time.perf_counter() - t0, 1)
        out["salted_matches_plain"] = salted_rows == plain_rows
        print(
            json.dumps(
                {
                    "salted_join_sec": out["salted_join_sec"],
                    "salted_matches_plain": out["salted_matches_plain"],
                }
            ),
            flush=True,
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    ok = (
        out["salted_matches_plain"]
        and (out["aqe_skew_split_engaged"] or out["salted_max_over_avg_partition"] < 2.0)
    )
    out["ok"] = ok
    print(json.dumps({"metric": "skew_stress", **out}), flush=True)
    print(
        "# oracle invariance: python scripts/driver_sim.py "
        f"--sf {args.dir} --partitions 5 --only <event queries> ; repeat --partitions 64",
        flush=True,
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
