"""Accuracy gates for the approximate-aggregate scale paths.

These queries have no DuckDB oracle (different estimators), so the
correctness contract is a bounded relative error vs the exact
computation on the same data.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from reciping_data_pipeline_spark.queries import all_queries
from reciping_data_pipeline_spark.tables import load_table

from .conftest import SF_SMOKE

REGISTRY = all_queries()


def test_dau_approx_within_5pct_of_exact(spark):
    approx = {
        r["event_date"]: r["dau_approx"]
        for r in REGISTRY["dau_approx"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        r["event_date"]: r["dau"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy(F.to_date("ts").alias("event_date"))
        .agg(F.countDistinct("user_id").alias("dau"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for day, est in approx.items():
        assert abs(est - exact[day]) <= max(0.05 * exact[day], 2), (day, est, exact[day])


def test_percentiles_approx_rank_accuracy(spark):
    """percentile_approx's contract is rank accuracy (the returned
    value's true rank is within eps of the target percentile), not
    value proximity — in a small group's tail the nearest data point
    can sit several percent away in value while being rank-exact."""
    rows = REGISTRY["event_value_percentiles_approx"].fn(spark, SF_SMOKE).collect()
    assert rows
    values = {
        r["event_type"]: sorted(r["_vals"])
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.collect_list("value").alias("_vals"))
        .collect()
    }
    for r in rows:
        vals = values[r["event_type"]]
        n = len(vals)
        for est, p in [(r["p50_approx"], 0.5), (r["p90_approx"], 0.9), (r["p99_approx"], 0.99)]:
            # rank interval covered by values equal-or-below the estimate
            lo = sum(1 for v in vals if v < est) / n
            hi = sum(1 for v in vals if v <= est) / n
            # rounding to 4 dp in the query can nudge the value past a
            # neighbor; allow one rank position of slack on each side
            slack = 1.5 / n
            assert lo - slack <= p <= hi + slack, (r["event_type"], p, est, lo, hi, n)


def test_wau_sketch_rollup_merge_accuracy(spark):
    """Weekly uniques from merged DAILY sketches must track the exact
    weekly COUNT(DISTINCT) — the merge step may not lose information
    beyond HLL's native error (the whole point of the mergeable
    pattern is answering range queries from pre-aggregated sketches)."""
    got = {
        r["week_start"]: r["wau_approx"]
        for r in REGISTRY["wau_sketch_rollup"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        r["week_start"]: r["wau"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy(F.date_trunc("week", F.to_date("ts")).cast("date").cast("string").alias("week_start"))
        .agg(F.countDistinct("user_id").alias("wau"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for week, est in got.items():
        assert abs(est - exact[week]) <= max(0.05 * exact[week], 2), (week, est, exact[week])
