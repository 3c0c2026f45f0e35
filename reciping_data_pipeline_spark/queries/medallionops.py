"""Driver-visible medallion pipeline end-to-end check, oracle-backed.

The medallion engine's deep verification lives in
``tests/test_medallion.py`` (21 analytics queries hash-matched against
DuckDB on the built Gold tables + idempotency properties). This
catalog entry makes the pipeline itself driver-checkable with a REAL
cross-engine oracle: the Spark side runs the full staging → bronze →
silver → dims → gold build (plus an idempotent incremental re-delivery
pass) on a seeded JSONL fixture and reports the end-state inventory;
the DuckDB side recomputes the same inventory INDEPENDENTLY from the
raw staging files — line counts via a raw text scan, silver rows via
parse + event_id dedup, and per-dimension join-success rates from the
parsed payloads and the recipe master parquet. A drift anywhere in
parse/dedup/dim-join semantics breaks the hash match.

The fixture is generated at import time (cheap, deterministic, ~1k
events) so the oracle SQL's embedded paths resolve no matter which
side the driver runs first.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.queries import query

_FIXTURE_DIR = os.path.join(tempfile.gettempdir(), "medallion_inventory_fixture_v1")
_STAGING = os.path.join(_FIXTURE_DIR, "staging")
_MASTER = os.path.join(_FIXTURE_DIR, "masters", "recipes.parquet")


_SENTINEL = "_FIXTURE_COMPLETE"


def _ensure_fixture() -> None:
    """Generate the fixture atomically: build into a scratch dir, mark
    it with a completion sentinel, then rename into place. A bare
    isdir check would let a crashed or concurrent first generation
    leave a partial dir that permanently poisons both the Spark query
    and the DuckDB oracle (silent hash mismatch)."""
    if os.path.isfile(os.path.join(_FIXTURE_DIR, _SENTINEL)):
        return
    from reciping_data_pipeline_spark.pipeline import datagen

    tmp = f"{_FIXTURE_DIR}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    datagen.generate_fixture(tmp, seed=23, n_users=200, n_days=2, start=datetime(2025, 9, 1))
    with open(os.path.join(tmp, _SENTINEL), "w", encoding="utf-8"):
        pass
    # Sweep any incomplete dir from a crashed run, then move the
    # complete build into place; os.rename is atomic on one filesystem.
    if os.path.isdir(_FIXTURE_DIR) and not os.path.isfile(os.path.join(_FIXTURE_DIR, _SENTINEL)):
        shutil.rmtree(_FIXTURE_DIR, ignore_errors=True)
    try:
        os.rename(tmp, _FIXTURE_DIR)
    except OSError:
        # A concurrent generator won the race; keep its complete copy.
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isfile(os.path.join(_FIXTURE_DIR, _SENTINEL)):
            raise


_ensure_fixture()

# DuckDB recomputes the pipeline's end-state inventory from the raw
# staging JSONL: bronze = raw line count (sep-less CSV scan so corrupt
# lines count too); silver = parseable lines (ignore_errors drops the
# injected garbage exactly like from_json -> null event_id does),
# deduped by event_id (injected duplicates are exact copies, so either
# engine's pick is payload-identical); join-success rates mirror the
# gold build's left-join + coalesce(sk, 0) semantics (pipeline/gold.py
# build_fact / dims.py null gates).
_ORACLE = f"""
WITH lines AS (
    SELECT count(*) AS n
    FROM read_csv('{_STAGING}/**/*.jsonl', sep='\x01', header=false,
                  columns={{'line': 'VARCHAR'}}, quote='')
),
raw AS (
    SELECT * FROM read_ndjson_auto('{_STAGING}/**/*.jsonl', ignore_errors=true)
),
silver AS (
    SELECT DISTINCT ON (event_id) * FROM raw WHERE event_id IS NOT NULL
),
master AS (
    SELECT recipe_id FROM read_parquet('{_MASTER}')
),
rates AS (
    SELECT
        count(*) AS silver_rows,
        round(avg(CASE WHEN user_id IS NOT NULL AND anonymous_id IS NOT NULL
                       THEN 1.0 ELSE 0.0 END), 4) AS rate_user,
        round(avg(CASE WHEN CAST(TRY_CAST(json_extract_string(event_properties, '$.recipe_id')
                                          AS BIGINT) AS VARCHAR)
                            IN (SELECT CAST(recipe_id AS VARCHAR) FROM master)
                       THEN 1.0 ELSE 0.0 END), 4) AS rate_recipe,
        round(avg(CASE WHEN json_extract_string(context, '$.page.name') IS NOT NULL
                         OR json_extract_string(context, '$.page.url') IS NOT NULL
                       THEN 1.0 ELSE 0.0 END), 4) AS rate_page,
        round(avg(CASE WHEN event_name IS NOT NULL THEN 1.0 ELSE 0.0 END), 4) AS rate_event
    FROM silver
)
SELECT 'bronze_rows' AS metric, CAST(n AS DOUBLE) AS value FROM lines
UNION ALL SELECT 'silver_rows', CAST(silver_rows AS DOUBLE) FROM rates
UNION ALL SELECT 'fact_rows', CAST(silver_rows AS DOUBLE) FROM rates
UNION ALL SELECT 'join_success_user_dim_key', rate_user FROM rates
UNION ALL SELECT 'join_success_recipe_dim_key', rate_recipe FROM rates
UNION ALL SELECT 'join_success_page_dim_key', rate_page FROM rates
UNION ALL SELECT 'join_success_event_dim_key', rate_event FROM rates
"""


@query(
    "medallion_e2e_inventory",
    oracle=_ORACLE,
    doc="Full bronze→silver→gold build + idempotent incremental "
    "re-delivery on a seeded 2-day fixture; returns the end-state "
    "per-layer row inventory and join-success rates, hash-matched "
    "against DuckDB's independent recomputation from the raw staging "
    "JSONL (pipeline/*; SURVEY §3 entry points A+B).",
    tags=("pipeline", "e2e"),
)
def medallion_e2e_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reciping_data_pipeline_spark.pipeline import gold, runner, silver

    _ensure_fixture()
    wh = tempfile.mkdtemp(prefix="medallion_inventory_wh_")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        runner.bulk_backfill(
            spark,
            _STAGING,
            wh,
            _MASTER,
            datetime(2025, 9, 3),
            time_dim_range=("2025-09-01 00:00:00", "2025-09-03 23:00:00"),
        )
        # Idempotent re-delivery: one interval spanning the whole fixture
        # re-offers every staging file; the bronze source_file anti-join
        # must make it a no-op, leaving end-state counts unchanged.
        runner.incremental_run(
            spark, _STAGING, wh, datetime(2025, 9, 1), datetime(2025, 9, 3)
        )
        from reciping_data_pipeline_spark.pipeline import bronze

        bronze_rows = bronze.read_bronze(spark, wh).count()
        silver_df = silver.read_silver(spark, wh)
        fact = gold.read_fact(spark, wh)
        silver_rows = silver_df.count()
        fact_rows = fact.count()
        join = gold.join_success_rates(fact)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        shutil.rmtree(wh, ignore_errors=True)
    rows = [
        ("bronze_rows", float(bronze_rows)),
        ("silver_rows", float(silver_rows)),
        ("fact_rows", float(fact_rows)),
        *[(f"join_success_{k}", v) for k, v in sorted(join.items())],
    ]
    # F.round (HALF_UP) on both engines — python round() is banker's.
    return spark.createDataFrame(rows, "metric string, value double").select(
        "metric", F.round("value", 4).alias("value")
    )
