"""Driver-visible medallion pipeline smoke.

The medallion engine's real verification lives in
``tests/test_medallion.py`` (21 analytics queries hash-matched against
DuckDB on the built Gold tables + idempotency properties). This
catalog entry makes the pipeline itself visible to the driver's
rows-only check: a seeded micro-fixture flows staging → bronze →
silver → dims → gold in a temp warehouse and the query returns the
per-layer row counts and join-success rates — deterministic for the
fixed seed, independent of ``sf_dir``.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.queries import query

_FIXTURE_DIR = os.path.join(tempfile.gettempdir(), "medallion_smoke_fixture_v1")


@query(
    "medallion_pipeline_smoke",
    oracle=None,  # end-to-end pipeline run; verified by tests/test_medallion.py
    doc="Full bronze→silver→gold build on a seeded micro-fixture; returns "
    "per-layer row counts + join success rates (pipeline/*; SURVEY §3 "
    "entry points A+B).",
    tags=("pipeline", "e2e"),
)
def medallion_pipeline_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reciping_data_pipeline_spark.pipeline import datagen, runner

    if not os.path.isdir(_FIXTURE_DIR):
        datagen.generate_fixture(_FIXTURE_DIR, seed=23, n_users=15, n_days=1)
    fix = {
        "staging_dir": os.path.join(_FIXTURE_DIR, "staging"),
        "recipe_master": os.path.join(_FIXTURE_DIR, "masters", "recipes.parquet"),
    }
    wh = tempfile.mkdtemp(prefix="medallion_smoke_wh_")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        report = runner.bulk_backfill(
            spark,
            fix["staging_dir"],
            wh,
            fix["recipe_master"],
            datetime(2025, 9, 2),
            time_dim_range=("2025-09-01 00:00:00", "2025-09-02 23:00:00"),
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        shutil.rmtree(wh, ignore_errors=True)
    rows = [
        ("bronze_rows", float(report.bronze_rows)),
        ("silver_rows", float(report.silver_rows)),
        ("fact_rows", float(report.fact_rows)),
        *[(f"join_success_{k}", round(v, 4)) for k, v in sorted(report.join_success.items())],
    ]
    return spark.createDataFrame(rows, "metric string, value double")
