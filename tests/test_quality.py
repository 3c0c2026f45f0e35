"""Data-quality expectation engine: one-pass evaluation semantics.

The contract layer the reference handles with ad-hoc Trino queries
and log lines (SURVEY §5) — here every check is declarative and the
whole set costs one aggregation job.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from reciping_data_pipeline_spark.pipeline import quality as Q


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        ("e1", "u1", 5, "Mon"),
        ("e2", "u2", 23, "Tue"),
        ("e3", None, 12, "Sun"),   # null user
        ("e3", "u4", 7, "Wed"),    # duplicate event_id
        ("e5", "u5", 99, "Xxx"),   # hour out of range + bad day name
    ]
    return spark.createDataFrame(rows, "event_id string, user_id string, hour int, day_of_week string")


def test_violations_counted_exactly(spark, frame):
    report = Q.check(
        frame,
        Q.non_null("user_id"),
        Q.unique("event_id"),
        Q.in_range("hour", 0, 23),
        Q.accepted_values("day_of_week", ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]),
        Q.satisfies("hour_even_or_small", (F.col("hour") < 50) | (F.col("hour") % 2 == 0)),
        Q.row_count_min(10),
    )
    assert report.total_rows == 5
    assert report.results["non_null(user_id)"] == (False, 1)
    assert report.results["unique(event_id)"] == (False, 1)   # one extra dup row
    assert report.results["in_range(hour,0,23)"] == (False, 1)
    assert report.results["accepted_values(day_of_week)"] == (False, 1)
    assert report.results["hour_even_or_small"] == (False, 1)  # 99 odd & >= 50
    assert report.results["row_count_min(10)"] == (False, 5)
    assert not report.passed
    with pytest.raises(AssertionError, match="data-quality failures"):
        report.raise_on_failure()


def test_clean_frame_passes(spark, frame):
    clean = frame.where(F.col("event_id") != "e3").where(F.col("hour") <= 23)
    report = Q.check(
        clean,
        Q.non_null("user_id"),
        Q.unique("event_id"),
        Q.in_range("hour", 0, 23),
        Q.row_count_min(1),
    )
    assert report.passed
    report.raise_on_failure()  # no raise


def test_one_job_for_many_checks(spark, frame):
    """All non-distinct checks ride a single aggregation (one collect).
    We assert plan shape: the compiled agg is one logical aggregate —
    adding checks must not add scans."""
    exps = [Q.non_null("user_id"), Q.in_range("hour", 0, 23),
            Q.accepted_values("day_of_week", ["Mon"]), Q.row_count_min(1)]
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        e.violations.alias(f"__v{i}") for i, e in enumerate(exps) if e.violations is not None
    ]
    plan = frame.agg(*aggs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1  # single scan of the source


def test_silver_contract_on_pipeline_output(spark, tmp_path):
    """The reference's SLO set passes on real Silver output."""
    from datetime import datetime

    from reciping_data_pipeline_spark.pipeline import bronze, datagen, silver

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        fix = datagen.generate_fixture(str(tmp_path / "fix"), seed=21, n_users=20, n_days=1,
                                       start=datetime(2025, 9, 1))
        wh = str(tmp_path / "wh")
        bronze.ingest_bulk(spark, fix["staging_dir"], wh, datetime(2025, 9, 1))
        silver.run_batch(spark, wh, batch_ts=datetime(2025, 9, 1))
        report = Q.silver_contract(silver.read_silver(spark, wh))
        assert report.passed, report.results
        assert report.total_rows > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_bulk_backfill_validate_attaches_contract(spark, tmp_path):
    """runner.bulk_backfill(validate=True) runs the Silver SLO contract
    and attaches passing results to the RunReport."""
    from datetime import datetime

    from reciping_data_pipeline_spark.pipeline import datagen, runner

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        fix = datagen.generate_fixture(str(tmp_path / "fix"), seed=31, n_users=15, n_days=1,
                                       start=datetime(2025, 9, 1))
        report = runner.bulk_backfill(
            spark, fix["staging_dir"], str(tmp_path / "wh"), fix["recipe_master"],
            datetime(2025, 9, 1),
            time_dim_range=("2025-09-01 00:00:00", "2025-09-02 23:00:00"),
            validate=True,
        )
        assert report.quality is not None
        assert all(ok for ok, _ in report.quality.values()), report.quality
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_key_injective_passes_and_detects_collisions(spark):
    """The surrogate-key collision audit: clean hash keys pass; two
    natural keys sharing one surrogate fail with the collision count."""
    from reciping_data_pipeline_spark.pipeline import quality as Q

    clean = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")], "sk INT, k1 STRING, k2 STRING"
    )
    assert Q.check(clean, Q.key_injective("sk", "k1", "k2")).passed

    collided = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x"), (3, "c", "y")], "sk INT, k1 STRING, k2 STRING"
    )
    report = Q.check(collided, Q.key_injective("sk", "k1", "k2"))
    assert not report.passed
    (ok, violations), = [v for n, v in report.results.items() if "key_injective" in n]
    assert not ok and violations == 1


def test_dim_build_runs_surrogate_key_audit(spark, tmp_path):
    """dims.build_all audits every surrogate-keyed dim at build time;
    a forced collision (monkeypatched constant key) aborts the build."""
    from datetime import datetime

    import pyspark.sql.functions as F
    import pytest

    from reciping_data_pipeline_spark.pipeline import datagen, dims, silver, bronze

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        fix = datagen.generate_fixture(str(tmp_path / "fix"), seed=37, n_users=12, n_days=1,
                                       start=datetime(2025, 9, 1))
        wh = str(tmp_path / "wh")
        bronze.ingest_bulk(spark, fix["staging_dir"], wh, datetime(2025, 9, 1))
        silver.run_batch(spark, wh, batch_ts=datetime(2025, 9, 1))
        sdf = silver.read_silver(spark, wh)
        # clean build passes the audit end to end
        dims.build_all(spark, sdf, wh, fix["recipe_master"],
                       "2025-09-01 00:00:00", "2025-09-02 23:00:00")
        # forced collision: every key hashes to the same constant
        orig = dims.surrogate_key
        dims.surrogate_key = lambda *cols: F.lit(42)
        try:
            with pytest.raises(AssertionError, match="key_injective"):
                dims.build_all(spark, sdf, str(tmp_path / "wh2"), fix["recipe_master"],
                               "2025-09-01 00:00:00", "2025-09-02 23:00:00")
        finally:
            dims.surrogate_key = orig
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
