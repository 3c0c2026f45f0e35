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
    rows = REGISTRY["wau_sketch_rollup"].fn(spark, SF_SMOKE).collect()
    got = {r["week_start"]: (r["wau_exact"], r["est_within_5pct"]) for r in rows}
    exact = {
        r["week_start"]: r["wau"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy(F.date_trunc("week", F.to_date("ts")).cast("date").cast("string").alias("week_start"))
        .agg(F.countDistinct("user_id").alias("wau"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for week, (wau_exact, within) in got.items():
        assert wau_exact == exact[week], (week, wau_exact, exact[week])
        assert within, (week, "sketch estimate drifted beyond 5% of exact")


def test_vocab_heavy_hitters_head_is_exact(spark):
    """approx_top_k's contract at 10x tracking headroom on a Zipfian
    token stream: the reported top-25 must BE the exact top-25 (same
    items, exact counts) — the sketch only degrades below the tracked
    horizon."""
    from reciping_data_pipeline_spark.queries import all_queries

    reg = all_queries()
    approx = {
        (r["token"], r["est_count"])
        for r in reg["doc_vocab_heavy_hitters_approx"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        (r["token"], r["n"])
        for r in reg["doc_vocab_topk"].fn(spark, SF_SMOKE).limit(25).collect()
    }
    # doc_vocab_topk returns top-50; sketch counts must be exact and
    # every item strictly above the boundary count must be present
    # (items TIED at the boundary may legitimately swap membership).
    boundary = min(c for _, c in exact)
    assert {e for e in exact if e[1] > boundary} <= approx
    assert sorted(c for _, c in approx) == sorted(c for _, c in approx)
    approx_items = {t for t, _ in approx}
    exact_counts = dict(exact)
    for tok, cnt in exact:
        if tok in approx_items:
            assert (tok, cnt) in approx  # counts exact where present
