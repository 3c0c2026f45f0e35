"""Gold dimension builders — star schema with deterministic keys.

Reference: ``spark/bulk_insert_jobs/create_dims.py``. Five dims:
dim_user (SCD1 latest-wins), dim_recipe (from master parquet),
dim_event, dim_page, dim_time (hourly calendar 2025-2026 via
``explode(sequence(...))``, smart key ``yyyyMMddHH``).

Key strategy (SURVEY §7.4 #1): the reference's
``monotonically_increasing_id`` is partition-dependent and its
incremental path funnels every row through a single global-window
task. Here every surrogate key is a **deterministic function of the
natural key** — ``xxhash64`` for user/recipe/event/page, the
``yyyyMMddHH`` smart key for time — so dims are reproducible across
runs, shuffle-free to assign, and incremental upserts never race a
driver-side MAX(sk) read. 0 stays the reserved "unknown" FK; hash
outputs of exactly 0 are remapped.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from reciping_data_pipeline_spark.sources import writers

DIM_TABLES = ("dim_user", "dim_recipe", "dim_event", "dim_page", "dim_time")


def dim_path(warehouse: str, name: str) -> str:
    return os.path.join(warehouse, name)


def surrogate_key(*cols: str) -> F.Column:
    """Deterministic non-zero BIGINT key from the natural key columns."""
    h = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols])
    return F.when(h == 0, F.lit(1)).otherwise(h)


def build_dim_user(silver_df: DataFrame) -> DataFrame:
    """SCD Type 1: latest row per (user_id, anonymous_id) wins
    (create_dims.py:67-75 keys on user_id; we key on the compound the
    fact join uses, replay_silver_to_gold.py:323-329)."""
    w = Window.partitionBy("user_id", "anonymous_id").orderBy(F.desc("processed_at"), F.desc("kst_timestamp"))
    return (
        silver_df.where(F.col("user_id").isNotNull())
        .select("user_id", "anonymous_id", "user_segment", "cooking_style", "ab_test_group", "processed_at", "kst_timestamp")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            surrogate_key("user_id", "anonymous_id").alias("user_sk"),
            "user_id",
            "anonymous_id",
            "user_segment",
            "cooking_style",
            "ab_test_group",
        )
    )


def upsert_dim_user(spark: SparkSession, silver_df: DataFrame, warehouse: str) -> None:
    """Incremental SCD1: left-anti new users vs existing dim, append
    (replay_silver_to_gold.py:200-280). Hash keys make this safe to
    re-run and free of the reference's global-window SK assignment."""
    path = dim_path(warehouse, "dim_user")
    incoming = build_dim_user(silver_df)
    if not writers.table_exists(spark, path):
        writers.overwrite_table(incoming, path)
        return
    existing = writers.read_table(spark, path)
    new_users = incoming.join(
        existing.select("user_id", "anonymous_id"), on=["user_id", "anonymous_id"], how="left_anti"
    )
    if not new_users.isEmpty():
        writers.append_table(new_users, path)


def build_dim_recipe(spark: SparkSession, recipe_master_path: str) -> DataFrame:
    """From the recipe master parquet, not from events (create_dims.py:107-135)."""
    m = spark.read.parquet(recipe_master_path)
    return m.select(
        surrogate_key("recipe_id").alias("recipe_sk"),
        F.col("recipe_id").cast("string").alias("recipe_id"),
        "recipe_name",
        "dish_type",
        "ingredient_type",
        "method_type",
        "situation_type",
        "difficulty",
        "cooking_time",
    )


def build_dim_event(silver_df: DataFrame) -> DataFrame:
    return (
        silver_df.where(F.col("event_name").isNotNull())
        .select("event_name")
        .distinct()
        .select(surrogate_key("event_name").alias("event_sk"), "event_name")
    )


def build_dim_page(silver_df: DataFrame) -> DataFrame:
    return (
        silver_df.where(F.col("page_name").isNotNull() | F.col("page_url").isNotNull())
        .select("page_name", "page_url")
        .distinct()
        .select(surrogate_key("page_name", "page_url").alias("page_sk"), "page_name", "page_url")
    )


def build_dim_time(spark: SparkSession, start: str = "2025-01-01 00:00:00", end: str = "2026-12-31 23:00:00") -> DataFrame:
    """Hourly calendar via explode(sequence(...)) (create_dims.py:161-179);
    time_dim_key is the yyyyMMddHH smart key the fact computes directly
    from the event timestamp (no join needed to assign FKs)."""
    hours = spark.sql(
        "SELECT CAST(h AS timestamp_ntz) AS datetime_kst FROM (SELECT explode(sequence("
        f"to_timestamp('{start}'), to_timestamp('{end}'), interval 1 hour"
        ")) AS h)"
    )
    return hours.select(
        F.date_format("datetime_kst", "yyyyMMddHH").cast("bigint").alias("time_dim_key"),
        "datetime_kst",
        F.to_date("datetime_kst").alias("date"),
        F.year("datetime_kst").alias("year"),
        F.month("datetime_kst").alias("month"),
        F.dayofmonth("datetime_kst").alias("day"),
        F.hour("datetime_kst").alias("hour"),
        F.date_format("datetime_kst", "E").alias("day_of_week"),
        F.date_format("datetime_kst", "E").isin("Sat", "Sun").alias("is_weekend"),
    )


# Surrogate-key audit spec per dim: (key column, natural key columns).
# xxhash64 keys are collision-free at reference scale but a 64-bit
# birthday bound reaches ~50% at ~5e9 keys — a collision silently
# merges two natural keys into one dim row AND misroutes every fact
# join on the key, so the build must fail loudly instead (SURVEY
# §7.4#1 scale caveat; VERDICT r05 #5).
_SK_AUDITS = {
    "dim_user": ("user_sk", ("user_id", "anonymous_id")),
    "dim_event": ("event_sk", ("event_name",)),
    "dim_page": ("page_sk", ("page_name", "page_url")),
    "dim_recipe": ("recipe_sk", ("recipe_id",)),
}


def audit_surrogate_keys(dim_df: DataFrame, dim_name: str) -> None:
    """Raise if the dim's surrogate key is not injective over its
    natural key tuple. One tiny single-pass agg over the (small) dim —
    runs at build time, before the dim becomes joinable state."""
    from reciping_data_pipeline_spark.pipeline import quality

    key_col, natural = _SK_AUDITS[dim_name]
    quality.check(dim_df, quality.key_injective(key_col, *natural)).raise_on_failure()


def build_all(
    spark: SparkSession,
    silver_df: DataFrame,
    warehouse: str,
    recipe_master_path: str,
    time_start: str = "2025-01-01 00:00:00",
    time_end: str = "2026-12-31 23:00:00",
) -> None:
    """Full dim rebuild (bulk path, create_dims.py main). Silver is
    cached across the three event-derived dims then released. Every
    surrogate-keyed dim passes the key-collision audit before its
    write is allowed to land."""
    silver_df.cache()
    try:
        for name, build in (
            ("dim_user", build_dim_user(silver_df)),
            ("dim_event", build_dim_event(silver_df)),
            ("dim_page", build_dim_page(silver_df)),
        ):
            build = build.cache()
            try:
                audit_surrogate_keys(build, name)
                writers.overwrite_table(build, dim_path(warehouse, name))
            finally:
                build.unpersist()
    finally:
        silver_df.unpersist()
    recipe = build_dim_recipe(spark, recipe_master_path).cache()
    try:
        audit_surrogate_keys(recipe, "dim_recipe")
        writers.overwrite_table(recipe, dim_path(warehouse, "dim_recipe"))
    finally:
        recipe.unpersist()
    writers.overwrite_table(build_dim_time(spark, time_start, time_end), dim_path(warehouse, "dim_time"))


def read_dim(spark: SparkSession, warehouse: str, name: str) -> DataFrame:
    return writers.read_table(spark, dim_path(warehouse, name))
