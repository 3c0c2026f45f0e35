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

# v2 (r12): 9 days instead of 2 — two full ISO weeks plus the late-
# event tail, so the WAU presence-serving row exercises a REAL
# week-over-week LAG ladder (a single-week fixture makes every
# prev_week_wau NULL and the growth column untestable).
_FIXTURE_DIR = os.path.join(tempfile.gettempdir(), "medallion_inventory_fixture_v2")
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
    datagen.generate_fixture(tmp, seed=23, n_users=200, n_days=9, start=datetime(2025, 9, 1))
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
    "re-delivery on a seeded 9-day fixture; returns the end-state "
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
            datetime(2025, 9, 10),
            time_dim_range=("2025-09-01 00:00:00", "2025-09-10 23:00:00"),
        )
        # Idempotent re-delivery: one interval spanning the whole fixture
        # re-offers every staging file; the bronze source_file anti-join
        # must make it a no-op, leaving end-state counts unchanged.
        runner.incremental_run(
            spark, _STAGING, wh, datetime(2025, 9, 1), datetime(2025, 9, 10)
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


# Gold-shape presence serving (VERDICT r11 #6): the reference's FULL
# 4-block DAU.sql stack (sql_queries/DAU.sql:1-52) served FACT-FREE
# from the (active_date, user_dim_key) presence partial + broadcast
# dim_user (pipeline/rollups.py dau_segments_from_presence). The
# equality-vs-analytics and fact-free plan gates live in
# tests/test_medallion.py / test_rollups.py; this row adds DRIVER
# evidence with a genuinely independent oracle: DuckDB recomputes the
# stack straight from the raw staging JSONL — parse (ignore_errors ≡
# from_json→null), event_id dedup, presence = distinct (KST date,
# user_id, anonymous_id) over rows where BOTH ids are non-null (the
# fact's plain-equality dim_user join ⇒ user_dim_key != 0 exactly
# then), and the per-user segment attributes extracted from the
# context JSON. `attrs` uses DISTINCT, not latest-wins: the fixture
# generates attributes once per user (datagen.generate_users), so
# SCD1's pick is attribute-identical — and if that invariant ever
# breaks, DISTINCT fans the join out and the row-count check fails
# LOUDLY instead of silently diverging from latest-wins.
_DAU_PRESENCE_ORACLE = f"""
WITH raw AS (
    SELECT * FROM read_ndjson_auto('{_STAGING}/**/*.jsonl', ignore_errors=true)
),
silver AS (
    SELECT DISTINCT ON (event_id) * FROM raw WHERE event_id IS NOT NULL
),
pres AS (
    SELECT DISTINCT CAST("date" AS VARCHAR) AS event_date, user_id, anonymous_id
    FROM silver
    WHERE user_id IS NOT NULL AND anonymous_id IS NOT NULL
),
attrs AS (
    SELECT DISTINCT user_id, anonymous_id,
           json_extract_string(context, '$.user_segment')  AS user_segment,
           json_extract_string(context, '$.cooking_style') AS cooking_style,
           json_extract_string(context, '$.ab_test.group') AS ab_test_group
    FROM silver
    WHERE user_id IS NOT NULL AND anonymous_id IS NOT NULL
),
j AS (
    SELECT p.event_date, a.user_segment, a.cooking_style, a.ab_test_group
    FROM pres p JOIN attrs a USING (user_id, anonymous_id)
)
SELECT event_date, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
       count(*) AS dau
FROM j GROUP BY event_date
UNION ALL
SELECT event_date, 'USER_SEGMENT', coalesce(user_segment, 'UNKNOWN'), count(*)
FROM j GROUP BY 1, 3
UNION ALL
SELECT event_date, 'COOKING_STYLE', coalesce(cooking_style, 'UNKNOWN'), count(*)
FROM j GROUP BY 1, 3
UNION ALL
SELECT event_date, 'AB_TEST_GROUP', coalesce(ab_test_group, 'UNKNOWN'), count(*)
FROM j GROUP BY 1, 3
"""


@query(
    "medallion_dau_presence_serving",
    oracle=_DAU_PRESENCE_ORACLE,
    doc="The reference's FULL 4-block DAU.sql stack (TOTAL / "
    "USER_SEGMENT / COOKING_STYLE / AB_TEST_GROUP daily uniques over "
    "the Gold fact + dim_user) served from the (active_date, "
    "user_dim_key) presence partial — the fact is scanned once at "
    "partial build, never at serving (plan gate in tests/"
    "test_rollups.py). Spark runs the real medallion build on the "
    "seeded fixture, derives the presence rollup, and serves the "
    "stack; DuckDB recomputes it independently from the raw staging "
    "JSONL (sql_queries/DAU.sql; pipeline/rollups.py "
    "dau_segments_from_presence; VERDICT r11 #6).",
    tags=("pipeline", "rollup", "grouping-sets"),
)
def medallion_dau_presence_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reciping_data_pipeline_spark.pipeline import dims as dims_mod
    from reciping_data_pipeline_spark.pipeline import gold, rollups, runner

    _ensure_fixture()
    wh = tempfile.mkdtemp(prefix="medallion_presence_wh_")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        runner.bulk_backfill(
            spark,
            _STAGING,
            wh,
            _MASTER,
            datetime(2025, 9, 10),
            # starts a day EARLY: the fixture's late events (arrival
            # minus 26 h) date to 2025-08-31, and presence is dated
            # through the inner dim_time join — a calendar that starts
            # at the staging window start would silently drop them.
            time_dim_range=("2025-08-30 00:00:00", "2025-09-10 23:00:00"),
        )
        fact = gold.read_fact(spark, wh)
        dim_time = dims_mod.read_dim(spark, wh, "dim_time")
        dim_user = dims_mod.read_dim(spark, wh, "dim_user")
        presence = rollups.user_day_presence_rollup(fact, dim_time)
        served = rollups.dau_segments_from_presence(presence, dim_user).select(
            "event_date",
            "segment_type",
            "segment_value",
            F.col("dau").cast("long").alias("dau"),
        )
        # materialize before the warehouse is deleted (the driver
        # collects the returned frame after this function exits)
        served = served.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        shutil.rmtree(wh, ignore_errors=True)
    return served


# WAU.sql gold-shape serving: same independent-oracle discipline as the
# DAU row. year/week_number derive from the MEMBER date (not
# week_start) exactly as the reference groups by year(t.date) /
# weekofyear(t.date); prev/growth via LAG over (segment_type,
# segment_value) ordered by week_start. prev_week_wau is CAST AS
# DOUBLE on both engines (nullable BIGINT promotes to float on one
# side of the driver compare but not the other). round() (not the
# floor form) mirrors pipeline/rollups.wau_segments_from_presence,
# whose contract is equality with analytics.wau; at fixture
# cardinalities (counts <= 200) every 3-decimal tie is binary-exact,
# where Spark HALF_UP and DuckDB's binary rounding agree.
_WAU_PRESENCE_ORACLE = f"""
WITH raw AS (
    SELECT * FROM read_ndjson_auto('{_STAGING}/**/*.jsonl', ignore_errors=true)
),
silver AS (
    SELECT DISTINCT ON (event_id) * FROM raw WHERE event_id IS NOT NULL
),
pres AS (
    SELECT DISTINCT
           CAST(CAST(date_trunc('week', "date") AS DATE) AS VARCHAR) AS week_start,
           CAST(year("date") AS INT) AS year,
           CAST(weekofyear("date") AS INT) AS week_number,
           user_id, anonymous_id
    FROM silver
    WHERE user_id IS NOT NULL AND anonymous_id IS NOT NULL
),
attrs AS (
    SELECT DISTINCT user_id, anonymous_id,
           json_extract_string(context, '$.user_segment')  AS user_segment,
           json_extract_string(context, '$.ab_test.group') AS ab_test_group
    FROM silver
    WHERE user_id IS NOT NULL AND anonymous_id IS NOT NULL
),
j AS (
    SELECT p.week_start, p.year, p.week_number, a.user_segment, a.ab_test_group
    FROM pres p JOIN attrs a USING (user_id, anonymous_id)
),
stacked AS (
    SELECT week_start, year, week_number,
           'TOTAL' AS segment_type, 'ALL' AS segment_value, count(*) AS wau
    FROM j GROUP BY 1, 2, 3
    UNION ALL
    SELECT week_start, year, week_number,
           'USER_SEGMENT', coalesce(user_segment, 'UNKNOWN'), count(*)
    FROM j GROUP BY 1, 2, 3, 5
    UNION ALL
    SELECT week_start, year, week_number,
           'AB_TEST_GROUP', coalesce(ab_test_group, 'UNKNOWN'), count(*)
    FROM j GROUP BY 1, 2, 3, 5
)
SELECT week_start, year, week_number, segment_type, segment_value, wau,
       CAST(LAG(wau) OVER w AS DOUBLE) AS prev_week_wau,
       CASE WHEN LAG(wau) OVER w > 0
            THEN round((wau - LAG(wau) OVER w) * 100.0 / LAG(wau) OVER w, 2)
            ELSE NULL END AS week_over_week_growth_pct
FROM stacked
WINDOW w AS (PARTITION BY segment_type, segment_value
             ORDER BY week_start, year, week_number)
"""


@query(
    "medallion_wau_presence_serving",
    oracle=_WAU_PRESENCE_ORACLE,
    doc="The reference's FULL WAU.sql stack (TOTAL / USER_SEGMENT / "
    "AB_TEST_GROUP weekly uniques + the week-over-week LAG growth "
    "ladder over Gold fact + dim_user) served from the week-grain "
    "presence partials cascaded from the day presence "
    "(pipeline/rollups.py user_week_presence_rollup + "
    "wau_segments_from_presence) — O(users × weeks) rows, fact-free "
    "at serving. The 9-day fixture spans two full ISO weeks plus the "
    "late-event tail week, so prev/growth are real values, not all "
    "NULL. DuckDB recomputes independently from the raw staging JSONL "
    "(sql_queries/WAU.sql; VERDICT r11 #6).",
    tags=("pipeline", "rollup", "grouping-sets", "window"),
)
def medallion_wau_presence_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reciping_data_pipeline_spark.pipeline import dims as dims_mod
    from reciping_data_pipeline_spark.pipeline import gold, rollups, runner

    _ensure_fixture()
    wh = tempfile.mkdtemp(prefix="medallion_wau_presence_wh_")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        runner.bulk_backfill(
            spark,
            _STAGING,
            wh,
            _MASTER,
            datetime(2025, 9, 10),
            time_dim_range=("2025-08-30 00:00:00", "2025-09-10 23:00:00"),
        )
        fact = gold.read_fact(spark, wh)
        dim_time = dims_mod.read_dim(spark, wh, "dim_time")
        dim_user = dims_mod.read_dim(spark, wh, "dim_user")
        presence = rollups.user_day_presence_rollup(fact, dim_time)
        week = rollups.user_week_presence_rollup(presence)
        served = rollups.wau_segments_from_presence(week, dim_user).select(
            "week_start",
            "year",
            "week_number",
            "segment_type",
            "segment_value",
            F.col("wau").cast("long").alias("wau"),
            F.col("prev_week_wau").cast("double").alias("prev_week_wau"),
            "week_over_week_growth_pct",
        )
        served = served.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        shutil.rmtree(wh, ignore_errors=True)
    return served
