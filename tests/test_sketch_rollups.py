"""HLL sketch partials (pipeline/sketch_rollups.py): merge exactness
(serving from per-day sketches == sketching the raw span), estimate
error within the configured sketch's published bound, idempotent
touched-day maintenance, and a fact-free serving plan. These serving
queries are approximate by design, so the contract is planted-property
(no cross-engine hash oracle — DuckDB's HLL is a different
implementation); see the module docstring for the regime they cover."""

from __future__ import annotations

import math
import os

import pyspark.sql.functions as F
import pytest

from reciping_data_pipeline_spark.pipeline import sketch_rollups as sr
from reciping_data_pipeline_spark.plans import inspect
from reciping_data_pipeline_spark.tables import load_table

SF = "/root/testdata/sf0.001"

#: 3σ of the DataSketches HLL relative standard error for lg_k.
def _tol(lg_k: int) -> float:
    return 3 * 1.04 / math.sqrt(2**lg_k)


@pytest.fixture()
def events(spark):
    return load_table(spark, SF, "events")


def _sorted_rows(df):
    return sorted(map(str, df.collect()))


def test_merge_exactness_week_union_equals_raw_sketch(spark, events):
    """The load-bearing property: unioning the week's per-day sketches
    yields the SAME estimate as one sketch over the week's raw users —
    partials lose nothing beyond the sketch's own error."""
    rollup = sr.day_sketch_rollup(events)
    served = {
        r["week_start"]: r["wau_est"]
        for r in sr.wau_est_from_sketch(rollup).collect()
    }
    # one-shot sketch over the raw week
    one_shot = {
        r["week_start"]: r["est"]
        for r in events.groupBy(
            F.date_trunc("week", F.col("ts")).cast("date").cast("string").alias(
                "week_start"
            )
        )
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(sr.DEFAULT_LG_K))
            ).alias("est")
        )
        .collect()
    }
    assert served.keys() == one_shot.keys()
    for wk, est in served.items():
        assert est == pytest.approx(one_shot[wk], rel=1e-9), wk


def test_estimates_within_sketch_error_of_exact(spark, events):
    rollup = sr.day_sketch_rollup(events)
    tol = _tol(sr.DEFAULT_LG_K)

    exact_dau = {
        (r["event_date"],): r["dau"]
        for r in events.groupBy(
            F.col("ts").cast("date").cast("string").alias("event_date")
        )
        .agg(F.countDistinct("user_id").alias("dau"))
        .collect()
    }
    for r in sr.dau_est_from_sketch(rollup).collect():
        exact = exact_dau[(r["event_date"],)]
        assert abs(r["dau_est"] - exact) <= max(1.0, tol * exact), r

    exact_wau = {
        r["week_start"]: r["wau"]
        for r in events.groupBy(
            F.date_trunc("week", F.col("ts")).cast("date").cast("string").alias(
                "week_start"
            )
        )
        .agg(F.countDistinct("user_id").alias("wau"))
        .collect()
    }
    for r in sr.wau_est_from_sketch(rollup).collect():
        exact = exact_wau[r["week_start"]]
        assert abs(r["wau_est"] - exact) <= max(1.0, tol * exact), r


def test_event_counts_are_exact_and_range_uniques_bounded(spark, events):
    rollup = sr.day_sketch_rollup(events)
    served = {
        r["event_date"]: r["event_count"]
        for r in sr.dau_est_from_sketch(rollup).collect()
    }
    exact = {
        r["event_date"]: r["n"]
        for r in events.groupBy(
            F.col("ts").cast("date").cast("string").alias("event_date")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert served == exact  # counts ride the sketch rollup exactly

    dates = sorted(exact)
    start, end = dates[0], dates[min(2, len(dates) - 1)]
    est = sr.range_uniques_est(rollup, start, end).collect()[0]["uniques_est"]
    truth = (
        events.where(F.col("ts").cast("date").cast("string").between(start, end))
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(est - truth) <= max(1.0, _tol(sr.DEFAULT_LG_K) * truth)


def test_rolling_actives_matches_direct_window_sketch(spark, events):
    """The rolling 28-day curve from fanout-union must equal, per
    serving day, a one-shot sketch over that day's raw trailing window
    (merge exactness again, now across overlapping windows), and track
    the exact rolling distinct within tolerance."""
    window = 7  # fixture spans few days; a 7-day window exercises overlap
    rollup = sr.day_sketch_rollup(events)
    served = {
        r["serve_date"]: r["active_users_est"]
        for r in sr.rolling_actives_est(rollup, window_days=window).collect()
    }
    days = [
        r["d"]
        for r in events.select(
            F.col("ts").cast("date").cast("string").alias("d")
        )
        .distinct()
        .collect()
    ]
    tol = _tol(sr.DEFAULT_LG_K)
    for d in days:
        lo = F.date_sub(F.lit(d).cast("date"), window - 1)
        in_win = events.where(
            (F.col("ts").cast("date") >= lo) & (F.col("ts").cast("date") <= F.lit(d))
        )
        one_shot = in_win.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(sr.DEFAULT_LG_K))
            ).alias("est")
        ).collect()[0]["est"]
        truth = in_win.select("user_id").distinct().count()
        assert served[d] == pytest.approx(one_shot, rel=1e-9), d
        assert abs(served[d] - truth) <= max(1.0, tol * truth), d


def test_segment_stack_merge_exactness_and_error(spark, events):
    """Segment-sliced tier (VERDICT r11 #5): every block of the
    TOTAL / EVENT_TYPE / AB_GROUP stack served from the
    (date, type, segment) partial must equal the one-shot sketch over
    that block's raw users (cross-segment union is lossless w.r.t.
    sketch state) and track the exact distinct within the bound."""
    from reciping_data_pipeline_spark.pipeline import rollups

    seg = rollups._ab_segment(F.col("user_id"))
    rollup = sr.day_segment_sketch_rollup(events.withColumn("segment", seg))
    served = {
        (r["event_date"], r["segment_type"], r["segment_value"]): r["dau_est"]
        for r in sr.dau_segments_est_from_sketch(rollup).collect()
    }
    day = F.col("ts").cast("date").cast("string").alias("event_date")
    one_sketch = F.hll_sketch_estimate(
        F.hll_sketch_agg(F.col("user_id"), F.lit(sr.DEFAULT_LG_K))
    ).alias("est")
    dx = F.count_distinct("user_id").alias("exact")
    blocks = {
        "TOTAL": events.groupBy(day).agg(one_sketch, dx).withColumn(
            "segment_value", F.lit("ALL")
        ),
        "EVENT_TYPE": events.groupBy(
            day, F.col("event_type").alias("segment_value")
        ).agg(one_sketch, dx),
        "AB_GROUP": events.groupBy(day, seg.alias("segment_value")).agg(
            one_sketch, dx
        ),
    }
    tol = _tol(sr.DEFAULT_LG_K)
    n_checked = 0
    for stype, df in blocks.items():
        for r in df.collect():
            key = (r["event_date"], stype, r["segment_value"])
            assert served[key] == pytest.approx(r["est"], rel=1e-9), key
            assert abs(served[key] - r["exact"]) <= max(1.0, tol * r["exact"]), key
            n_checked += 1
    assert n_checked == len(served)


def test_segment_sketch_maintenance_idempotent(spark, events, tmp_path):
    """Touched-day recompute for the segment-sliced partial: two-wave
    build == full build, and re-delivering a day changes nothing."""
    from reciping_data_pipeline_spark.pipeline import rollups

    seg = rollups._ab_segment(F.col("user_id"))
    ev = events.withColumn("segment", seg)
    path = os.path.join(tmp_path, "seg_sketch_rollup")
    dates = sorted(
        r["d"]
        for r in ev.select(F.col("ts").cast("date").cast("string").alias("d"))
        .distinct()
        .collect()
    )
    for ds in (dates[:1], dates[1:]):
        touched = sr.maintain_day_segment_sketch_rollup(
            spark, ev.where(F.col("ts").cast("date").cast("string").isin(ds)), path
        )
        assert sorted(touched) == sorted(ds)

    def _canon(df):
        return _sorted_rows(
            df.select(
                F.col("event_date").cast("string"),
                "event_type",
                "segment",
                F.hll_sketch_estimate("user_hll").alias("est"),
                "n_events",
            )
        )

    incremental = sr.read_day_sketch_rollup(spark, path)
    assert _canon(incremental) == _canon(
        sr.day_segment_sketch_rollup(ev)
    )
    before = _canon(incremental)
    sr.maintain_day_segment_sketch_rollup(
        spark,
        ev.where(F.col("ts").cast("date").cast("string") == dates[0]),
        path,
    )
    assert _canon(sr.read_day_sketch_rollup(spark, path)) == before


def test_retention_inclusion_exclusion_tracks_exact(spark, events):
    """k-day retention from sketches: inclusion–exclusion over day
    sketches must track the exact |active(d) ∩ active(d+k)| within the
    RSE-scaled bound (|A∪B| terms), and equal the same identity
    computed from one-shot sketches of the raw day sets (merge
    exactness through the type-slice collapse)."""
    rollup = sr.day_sketch_rollup(events)
    served = {
        (r["cohort_date"], r["offset_days"]): r["retained_est"]
        for r in sr.retention_est_from_sketch(rollup, offsets=(1, 2)).collect()
    }
    assert served, "fixture must span consecutive days"
    du = events.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    a = du.alias("a")
    b = du.alias("b")
    k = F.datediff(F.col("b.d"), F.col("a.d"))
    exact = {
        (r["cohort"], r["k"]): (r["inter"], r["union_n"])
        for r in a.join(
            b, (F.col("a.user_id") == F.col("b.user_id")) & k.isin(1, 2)
        )
        .groupBy(
            F.col("a.d").cast("string").alias("cohort"), k.cast("int").alias("k")
        )
        .agg(F.count("*").alias("inter"))
        .join(
            du.groupBy(F.col("d").cast("string").alias("cohort")).agg(
                F.count("*").alias("na")
            ),
            "cohort",
        )
        .withColumn("union_n", F.col("na") * 2 - F.col("inter"))  # upper-ish bound
        .collect()
    }
    tol = _tol(sr.DEFAULT_LG_K)
    for key, est in served.items():
        inter, union_ub = exact[key]
        # three estimate terms, each RSE-bounded on a set ≤ the union
        assert abs(est - inter) <= max(2.0, 3 * tol * union_ub), (key, est, inter)
    assert served.keys() == exact.keys()


def test_maintenance_incremental_equals_full_and_idempotent(spark, events, tmp_path):
    path = os.path.join(tmp_path, "sketch_rollup")
    dates = sorted(
        r["d"]
        for r in events.select(
            F.col("ts").cast("date").cast("string").alias("d")
        )
        .distinct()
        .collect()
    )
    assert len(dates) >= 2
    for ds in (dates[:1], dates[1:]):
        touched = sr.maintain_day_sketch_rollup(
            spark,
            events.where(F.col("ts").cast("date").cast("string").isin(ds)),
            path,
        )
        assert sorted(touched) == sorted(ds)
    incremental = sr.read_day_sketch_rollup(spark, path)
    full = sr.day_sketch_rollup(events)
    # sketch binaries for identical input sets are identical, so the
    # whole-table comparison can be exact — on ESTIMATES (the binary's
    # column order inside the row is stable but compare semantically)
    def _canon(df):
        return _sorted_rows(
            df.select(
                F.col("event_date").cast("string"),
                "event_type",
                F.hll_sketch_estimate("user_hll").alias("est"),
                "n_events",
            )
        )

    assert _canon(incremental) == _canon(full)

    # re-delivering one day's interval must change nothing
    replay_day = dates[0]
    before = _canon(incremental)
    sr.maintain_day_sketch_rollup(
        spark,
        events.where(F.col("ts").cast("date").cast("string") == replay_day),
        path,
    )
    assert _canon(sr.read_day_sketch_rollup(spark, path)) == before

    # late sliver repair: maintenance with events_path re-reads the
    # committed table for the touched day, not just the sliver
    sliver = events.where(
        F.col("ts").cast("date").cast("string") == replay_day
    ).limit(1)
    events_path = os.path.join(tmp_path, "events_committed")
    events.write.mode("overwrite").parquet(events_path)
    sr.maintain_day_sketch_rollup(spark, sliver, path, events_path=events_path)
    assert _canon(sr.read_day_sketch_rollup(spark, path)) == before


def test_serving_plan_is_fact_free_and_has_no_global_window(spark, events, tmp_path):
    from reciping_data_pipeline_spark.pipeline import rollups

    path = os.path.join(tmp_path, "sketch_rollup")
    sr.maintain_day_sketch_rollup(spark, events, path)
    rollup = sr.read_day_sketch_rollup(spark, path)
    seg_path = os.path.join(tmp_path, "seg_sketch_rollup")
    sr.maintain_day_segment_sketch_rollup(
        spark,
        events.withColumn("segment", rollups._ab_segment(F.col("user_id"))),
        seg_path,
    )
    seg_rollup = sr.read_day_sketch_rollup(spark, seg_path)
    for df in (
        sr.dau_est_from_sketch(rollup),
        sr.wau_est_from_sketch(rollup),
        sr.rolling_actives_est(rollup, window_days=7),
        sr.dau_segments_est_from_sketch(seg_rollup),
        sr.retention_est_from_sketch(rollup),
    ):
        plan = inspect.simple_plan(df)
        assert "events.parquet" not in plan, plan  # fact never scanned
        assert "Window" not in plan, plan  # fanout-union, not a global window
        inspect.assert_no_cartesian(df)


def test_sketch_rollup_stream_matches_batch_and_survives_redelivery(spark, tmp_path):
    """Streaming sketch maintenance piggybacks the exact-rollup stream's
    touched-dates recompute: same-day events split across micro-batches
    must merge into one day sketch, and a redelivery replay (including
    a NULL-id malformed row) must converge to exactly the one-shot
    batch sketch rollup over the unique events."""
    import json as _json

    from reciping_data_pipeline_spark.streaming import ingest

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    events_dir = str(tmp_path / "events_tbl")
    rollup_dir = str(tmp_path / "rollup")
    sketch_dir = str(tmp_path / "sketch_rollup")
    ckpt = str(tmp_path / "ckpt")

    def write_wave(name, rows):
        with open(incoming / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    write_wave(
        "w1.jsonl",
        [
            {"event_id": 1, "ts": "2025-09-01T10:00:00", "user_id": 7, "event_type": "click", "value": 1.25},
            {"event_id": 2, "ts": "2025-09-01T11:00:00", "user_id": 8, "event_type": "view", "value": 0.5},
        ],
    )
    write_wave(
        "w2.jsonl",
        [
            {"event_id": 3, "ts": "2025-09-01T12:00:00", "user_id": 7, "event_type": "click", "value": 2.0},
            {"event_id": 4, "ts": "2025-09-02T09:00:00", "user_id": 9, "event_type": "click", "value": 3.0},
        ],
    )
    q = ingest.start_user_day_rollup_stream(
        spark, str(incoming), events_dir, rollup_dir, ckpt,
        max_files_per_trigger=1, sketch_rollup_dir=sketch_dir,
    )
    q.awaitTermination(120)

    # redelivery of events 1+3 plus a new event and a NULL-id row
    write_wave(
        "w3.jsonl",
        [
            {"event_id": 1, "ts": "2025-09-01T10:00:00", "user_id": 7, "event_type": "click", "value": 1.25},
            {"event_id": 3, "ts": "2025-09-01T12:00:00", "user_id": 7, "event_type": "click", "value": 2.0},
            {"event_id": 5, "ts": "2025-09-01T23:00:00", "user_id": 8, "event_type": "click", "value": 0.75},
            {"ts": "2025-09-01T23:30:00", "user_id": 9, "event_type": "click", "value": 9.0},
        ],
    )
    q = ingest.start_user_day_rollup_stream(
        spark, str(incoming), events_dir, rollup_dir, ckpt,
        max_files_per_trigger=1, sketch_rollup_dir=sketch_dir,
    )
    q.awaitTermination(120)

    def _canon(df):
        return _sorted_rows(
            df.select(
                F.col("event_date").cast("string"),
                "event_type",
                F.hll_sketch_estimate("user_hll").alias("est"),
                "n_events",
            )
        )

    streamed = sr.read_day_sketch_rollup(spark, sketch_dir)
    all_events = (
        spark.read.format("json")
        .schema("event_id long, ts timestamp, user_id long, event_type string, value double")
        .option("pathGlobFilter", "*.jsonl")
        .load(str(incoming))
        .where(F.col("event_id").isNotNull())
        .dropDuplicates(["event_id"])
    )
    assert _canon(streamed) == _canon(sr.day_sketch_rollup(all_events))


def test_retention_err_bound_covers_low_overlap_zipf(spark):
    """VERDICT r12 #7: the retention flag derives from the OPERATOR'S
    own error model, not a fixed percentage. A zipf(1.1)-skewed,
    low-overlap cohort pair (the ×300-zipf bench measured 6.99 % vs
    the old fixed 5 % flag) pins three properties: (1) |est − exact|
    ≤ the emitted ``err_bound`` on every row — the model covers its
    own error; (2) err_bound EXCEEDS 5 % of exact on the low-overlap
    rows — the regime where the fixed flag was silently wrong is now
    flagged by construction; (3) the estimate is clamped ≥ 0 even for
    a near-disjoint day pair (ADVICE r12). Deterministic: fixed numpy
    seed + HLL sketches are order-insensitive functions of the set."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(13)
    day0 = np.unique(rng.zipf(1.1, 300_000))  # ~117k ids, heavy head
    day1 = np.unique(rng.zipf(1.1, 300_000))  # shares the zipf head only
    day2 = day1 + 10_000_000_000  # near-disjoint from day1
    frames = []
    for i, ids in enumerate((day0, day1, day2)):
        frames.append(
            pd.DataFrame(
                {
                    "ts": pd.Timestamp(f"2025-06-0{i + 1}"),
                    "user_id": ids.astype("int64"),
                    "event_type": "view",
                }
            )
        )
    events = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    rollup = sr.day_sketch_rollup(events)
    rows = {
        r["cohort_date"]: (r["retained_est"], r["err_bound"])
        for r in sr.retention_est_from_sketch(rollup, offsets=(1,)).collect()
    }
    exact = {
        "2025-06-01": len(np.intersect1d(day0, day1)),
        "2025-06-02": len(np.intersect1d(day1, day2)),
    }
    assert rows.keys() == exact.keys()
    for cohort, (est, bound) in rows.items():
        assert est >= 0.0, (cohort, est)  # clamp (ADVICE r12)
        assert abs(est - exact[cohort]) <= bound, (cohort, est, bound)
    # the operative regression: on the low-overlap zipf pair the model
    # bound is wider than the old fixed 5 % — a fixed flag here would
    # assert tightness the sketch never promised (union/inter ≈ 15).
    est01, bound01 = rows["2025-06-01"]
    assert bound01 > 0.05 * exact["2025-06-01"], (bound01, exact)
    # and the bound is the model's, not a vacuous infinity: within 3σ×√3
    # of RSE × the exact union
    union01 = len(np.union1d(day0, day1))
    model = sr.RETENTION_BOUND_SIGMAS * sr.retention_rse(sr.DEFAULT_LG_K)
    assert bound01 == pytest.approx(model * union01, rel=0.10)


def test_wau_segment_serving_fact_free_and_ladder_consistent(spark, events, tmp_path):
    """WAU segment-sketch serving (VERDICT r12 #2): (1) the serving
    plan reads only the persisted rollup — fact never scanned — and
    its LAG window is keyed (partitionBy present), never global;
    (2) the TOTAL block's week estimate equals a one-shot sketch of
    the raw week (merge exactness through the day×type×segment
    slicing); (3) the growth ladder is exactly the floor-form function
    of the emitted estimates."""
    from reciping_data_pipeline_spark.pipeline import rollups

    path = os.path.join(tmp_path, "seg_sketch_rollup")
    sr.maintain_day_segment_sketch_rollup(
        spark,
        events.withColumn("segment", rollups._ab_segment(F.col("user_id"))),
        path,
    )
    rollup = sr.read_day_sketch_rollup(spark, path)
    served = sr.wau_segments_est_from_sketch(rollup)
    plan = inspect.simple_plan(served)
    assert "events.parquet" not in plan, plan
    assert "windowspecdefinition(segment_type" in plan.lower(), plan
    inspect.assert_no_cartesian(served)

    rows = served.where(F.col("segment_type") == "TOTAL").collect()
    one_shot = {
        r["week_start"]: r["est"]
        for r in events.groupBy(
            F.date_trunc("week", F.col("ts"))
            .cast("date")
            .cast("string")
            .alias("week_start")
        )
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(sr.DEFAULT_LG_K))
            ).alias("est")
        )
        .collect()
    }
    assert {r["week_start"] for r in rows} == one_shot.keys()
    by_week = {}
    for r in sorted(rows, key=lambda r: r["week_start"]):
        assert r["wau_est"] == pytest.approx(one_shot[r["week_start"]], rel=1e-9)
        by_week[r["week_start"]] = r
    prev = None
    for wk in sorted(by_week):
        r = by_week[wk]
        if prev is None:
            assert r["prev_week_wau_est"] is None
            assert r["wow_growth_est_pct"] is None
        else:
            assert r["prev_week_wau_est"] == pytest.approx(prev, rel=1e-9)
            want = math.floor((r["wau_est"] - prev) * 10000.0 / prev + 0.5) / 100.0
            assert r["wow_growth_est_pct"] == pytest.approx(want, abs=1e-9)
        prev = r["wau_est"]
