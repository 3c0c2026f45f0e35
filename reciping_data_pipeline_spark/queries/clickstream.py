"""Clickstream analytics on the ``events`` testdata table.

These re-express the reference's 21-query analytics catalog
(``sql_queries/*.sql`` — DAU, WAU+WoW, funnel, CTR, A/B lift,
heatmaps, engagement scoring, sessionization) against the generic
``events(event_id, ts, user_id, event_type, value, props)`` table, so
the driver's DuckDB oracle can validate each shape end-to-end. The
reference-faithful versions over the medallion Gold star schema live
in ``reciping_data_pipeline_spark.pipeline.analytics``.

A/B group assignment is derived deterministically from ``user_id``
parity — mirroring the reference's MD5-parity assignment
(``create_data/create_event_logs.py:239-241``) with an
oracle-reproducible function.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table


@query(
    "dau",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS STRING) AS event_date, event_type,
           count(DISTINCT user_id) AS dau,
           count(*) AS event_count
    FROM events
    GROUP BY 1, 2
    """,
    doc="Daily active users per event type — DAU.sql shape (SURVEY §2.4 A1/A2).",
    tags=("agg", "bench"),
)
def dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # date emitted as ISO string: DATE round-trips ambiguously through
    # pandas (datetime.date vs datetime64) between Spark and DuckDB,
    # which breaks stringified value-hash comparison.
    return ev.groupBy(
        F.col("ts").cast("date").cast("string").alias("event_date"), "event_type"
    ).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count("*").alias("event_count"),
    )


@query(
    "dau_segment_breakdown",
    oracle="""
    SELECT CASE WHEN event_type IS NOT NULL THEN 'event_type' ELSE 'TOTAL' END AS segment_type,
           coalesce(event_type, 'TOTAL') AS segment_value,
           CAST(CAST(ts AS DATE) AS STRING) AS event_date,
           count(DISTINCT user_id) AS dau
    FROM events
    GROUP BY GROUPING SETS ((CAST(ts AS DATE), event_type), (CAST(ts AS DATE)))
    """,
    doc="DAU with TOTAL + per-segment rows in ONE pass via GROUPING SETS — "
    "replaces DAU.sql:15-52's 4x UNION ALL rescans (SURVEY §2.7 U1, §7.4 #6).",
    tags=("agg", "grouping-sets", "bench"),
)
def dau_segment_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT CASE WHEN event_type IS NOT NULL THEN 'event_type' ELSE 'TOTAL' END AS segment_type,
               coalesce(event_type, 'TOTAL') AS segment_value,
               CAST(CAST(ts AS DATE) AS STRING) AS event_date,
               count(DISTINCT user_id) AS dau
        FROM events
        GROUP BY GROUPING SETS ((CAST(ts AS DATE), event_type), (CAST(ts AS DATE)))
        """
    )


@query(
    "wau_growth",
    oracle="""
    WITH weekly AS (
        SELECT CAST(CAST(date_trunc('week', ts) AS DATE) AS STRING) AS week_start,
               count(DISTINCT user_id) AS wau
        FROM events GROUP BY 1
    )
    SELECT week_start, wau, prev_wau,
           round(100.0 * (wau - prev_wau) / nullif(prev_wau, 0), 4) AS wow_growth_pct
    FROM (
        SELECT week_start, wau, lag(wau) OVER (ORDER BY week_start) AS prev_wau
        FROM weekly
    )
    WHERE prev_wau IS NOT NULL
    """,
    doc="WAU + week-over-week growth via LAG (WAU.sql:56-61; SURVEY §2.5 W3).",
    tags=("window", "agg"),
)
def wau_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").cast("string").alias("week_start")
    ).agg(F.countDistinct("user_id").alias("wau"))
    w = Window.orderBy("week_start")
    prev = F.lag("wau").over(w)
    # First week dropped: no prior period means NULL-able int output,
    # which round-trips inconsistently through pandas (see SKILL.md).
    return (
        weekly.select("week_start", "wau", prev.alias("prev_wau"))
        .where(F.col("prev_wau").isNotNull())
        .select(
            "week_start",
            "wau",
            "prev_wau",
            F.round(
                100.0 * (F.col("wau") - F.col("prev_wau")) / F.nullif(F.col("prev_wau"), F.lit(0)), 4
            ).alias("wow_growth_pct"),
        )
    )


@query(
    "hourly_heatmap",
    oracle="""
    WITH cells AS (
        SELECT CAST(isodow(ts) AS INT) AS day_of_week,
               CAST(hour(ts) AS INT) AS hour_of_day,
               count(*) AS event_count
        FROM events GROUP BY 1, 2
    )
    SELECT day_of_week, hour_of_day, event_count,
           round((event_count - min(event_count) OVER ()) * 1.0
                 / nullif(max(event_count) OVER () - min(event_count) OVER (), 0), 4) AS intensity
    FROM cells
    """,
    doc="Hour x weekday heatmap with global min/max normalization "
    "(time_x_day_events_heatmap.sql:33-36; SURVEY §2.5 W5).",
    tags=("window", "agg"),
)
def hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.weekday("ts") + 1).cast("int").alias("day_of_week"),
        F.hour("ts").cast("int").alias("hour_of_day"),
    ).agg(F.count("*").alias("event_count"))
    w = Window.partitionBy()
    mn, mx = F.min("event_count").over(w), F.max("event_count").over(w)
    return cells.select(
        "day_of_week",
        "hour_of_day",
        "event_count",
        F.round((F.col("event_count") - mn) * 1.0 / F.nullif(mx - mn, F.lit(0)), 4).alias("intensity"),
    )


@query(
    "conversion_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS did_view,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS did_click,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS did_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(sum(did_view) AS BIGINT) AS step1_view_users,
           CAST(sum(did_view * did_click) AS BIGINT) AS step2_click_users,
           CAST(sum(did_view * did_click * did_purchase) AS BIGINT) AS step3_purchase_users,
           round(100.0 * sum(did_view * did_click) / nullif(sum(did_view), 0), 4) AS view_to_click_pct,
           round(100.0 * sum(did_view * did_click * did_purchase)
                 / nullif(sum(did_view * did_click), 0), 4) AS click_to_purchase_pct
    FROM per_user
    """,
    doc="Per-user step flags -> funnel counts (click_ads_funnel.sql:4-25; SURVEY §2.4 A4).",
    tags=("agg", "funnel", "bench"),
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    flag = lambda t: F.max(F.when(F.col("event_type") == t, 1).otherwise(0))  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        flag("view").alias("did_view"),
        flag("click").alias("did_click"),
        flag("purchase").alias("did_purchase"),
    )
    v = F.sum("did_view")
    vc = F.sum(F.col("did_view") * F.col("did_click"))
    vcp = F.sum(F.col("did_view") * F.col("did_click") * F.col("did_purchase"))
    return per_user.agg(
        v.cast("bigint").alias("step1_view_users"),
        vc.cast("bigint").alias("step2_click_users"),
        vcp.cast("bigint").alias("step3_purchase_users"),
        F.round(100.0 * vc / F.nullif(v, F.lit(0)), 4).alias("view_to_click_pct"),
        F.round(100.0 * vcp / F.nullif(vc, F.lit(0)), 4).alias("click_to_purchase_pct"),
    )


@query(
    "ab_test_ctr",
    oracle="""
    SELECT CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS ab_group,
           count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS viewers,
           count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS clickers,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS impressions,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           round(100.0 * sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 / nullif(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), 0), 4) AS ctr_pct
    FROM events
    GROUP BY 1
    """,
    doc="A/B CTR with conditional distinct counts (ctr_advertisement.sql:9-12, "
    "treatment_vs_control.sql:11; SURVEY §2.4 A3/A4).",
    tags=("agg", "ab-test"),
)
def ab_test_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ab_group",
        F.when(F.col("user_id") % 2 == 0, "control").otherwise("treatment"),
    )
    is_view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    is_click = F.when(F.col("event_type") == "click", 1).otherwise(0)
    return ev.groupBy("ab_group").agg(
        F.countDistinct(F.when(F.col("event_type") == "view", F.col("user_id"))).alias("viewers"),
        F.countDistinct(F.when(F.col("event_type") == "click", F.col("user_id"))).alias("clickers"),
        F.sum(is_view).cast("bigint").alias("impressions"),
        F.sum(is_click).cast("bigint").alias("clicks"),
        F.round(100.0 * F.sum(is_click) / F.nullif(F.sum(is_view), F.lit(0)), 4).alias("ctr_pct"),
    )


@query(
    "ab_test_lift",
    oracle="""
    WITH stats AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS ab_group,
               round(100.0 * sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                     / nullif(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), 0), 6) AS ctr_pct
        FROM events GROUP BY 1
    )
    SELECT t.ctr_pct AS treatment_ctr, c.ctr_pct AS control_ctr,
           round(100.0 * (t.ctr_pct - c.ctr_pct) / nullif(c.ctr_pct, 0), 4) AS lift_pct
    FROM stats t JOIN stats c ON t.ab_group = 'treatment' AND c.ab_group = 'control'
    """,
    doc="Treatment-vs-control lift via self-join pivot (lift.sql:55-57; SURVEY §2.3 J7).",
    tags=("join", "agg", "ab-test"),
)
def ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ab_group",
        F.when(F.col("user_id") % 2 == 0, "control").otherwise("treatment"),
    )
    is_view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    is_click = F.when(F.col("event_type") == "click", 1).otherwise(0)
    stats = ev.groupBy("ab_group").agg(
        F.round(100.0 * F.sum(is_click) / F.nullif(F.sum(is_view), F.lit(0)), 6).alias("ctr_pct")
    )
    t = stats.where("ab_group = 'treatment'").select(F.col("ctr_pct").alias("treatment_ctr"))
    c = stats.where("ab_group = 'control'").select(F.col("ctr_pct").alias("control_ctr"))
    return t.crossJoin(c).select(
        "treatment_ctr",
        "control_ctr",
        F.round(
            100.0 * (F.col("treatment_ctr") - F.col("control_ctr")) / F.nullif(F.col("control_ctr"), F.lit(0)),
            4,
        ).alias("lift_pct"),
    )


@query(
    "engagement_by_day",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS STRING) AS event_date,
           round(avg(CASE event_type WHEN 'purchase' THEN 10.0 WHEN 'signup' THEN 8.0
                     WHEN 'click' THEN 5.0 WHEN 'view' THEN 2.0 ELSE 1.0 END), 4) AS avg_engagement,
           CAST(sum(CASE event_type WHEN 'purchase' THEN 10 WHEN 'signup' THEN 8
                    WHEN 'click' THEN 5 WHEN 'view' THEN 2 ELSE 1 END) AS BIGINT) AS total_engagement,
           count(DISTINCT user_id) AS active_users
    FROM events
    GROUP BY 1
    """,
    doc="Engagement-score ladder via CASE (replay_silver_to_gold.py:371-378 "
    "8-branch ladder; daily_engagement_score.sql; SURVEY §2.8 conditional).",
    tags=("agg",),
)
def engagement_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    score = (
        F.when(F.col("event_type") == "purchase", 10)
        .when(F.col("event_type") == "signup", 8)
        .when(F.col("event_type") == "click", 5)
        .when(F.col("event_type") == "view", 2)
        .otherwise(1)
    )
    return ev.groupBy(F.col("ts").cast("date").cast("string").alias("event_date")).agg(
        F.round(F.avg(score.cast("double")), 4).alias("avg_engagement"),
        F.sum(score).cast("bigint").alias("total_engagement"),
        F.countDistinct("user_id").alias("active_users"),
    )


@query(
    "daily_type_pivot",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS STRING) AS event_date,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events GROUP BY 1
    """,
    doc="Daily event-type pivot with explicit value list (SURVEY §2.4 A8).",
    tags=("agg", "pivot"),
)
def daily_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    types = ["signup", "click", "view", "purchase", "error"]
    return (
        ev.groupBy(F.col("ts").cast("date").cast("string").alias("event_date"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .select("event_date", *[F.col(t).cast("bigint").alias(t) for t in types])
    )


@query(
    "sessionization",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, event_id,
               CAST(sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        FROM flagged
    )
    SELECT user_id, session_idx,
           count(*) AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec
    FROM sessions
    GROUP BY user_id, session_idx
    """,
    doc="Gap-based sessionization (30-min timeout) via lag + cumulative sum — "
    "the batch equivalent of session_window (SURVEY §2.9; reference has "
    "generator-assigned sessions only, create_event_logs.py:885).",
    tags=("window", "sessionize", "bench"),
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_sec = F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
    flagged = ev.withColumn(
        "is_new_session",
        F.when(prev_ts.isNull() | (gap_sec > 1800), 1).otherwise(0),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = flagged.withColumn("session_idx", F.sum("is_new_session").over(cum).cast("bigint"))
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).cast("bigint").alias("duration_sec"),
    )


@query(
    "props_json_extract",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS event_count,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
    doc="JSON payload extraction — the reference's from_json 3-schema parse "
    "(replay_bronze_to_silver.py:149-155; SURVEY §2.8 JSON).",
    tags=("json", "agg"),
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy((k % 10).alias("k_bucket")).agg(
        F.count("*").alias("event_count"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@query(
    "user_first_seen_cohort",
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY user_id
    )
    SELECT CAST(cohort_date AS STRING) AS cohort_date, count(*) AS new_users
    FROM firsts GROUP BY 1
    """,
    doc="First-seen cohort — incremental dim_user growth shape "
    "(replay_silver_to_gold.py:200-280; SURVEY §2.3 J5).",
    tags=("agg",),
)
def user_first_seen_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("cohort_date"))
    return firsts.groupBy(F.col("cohort_date").cast("string").alias("cohort_date")).agg(
        F.count("*").alias("new_users")
    )


@query(
    "event_value_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           round(avg(value), 4) AS avg_value,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value,
           round(stddev_samp(value), 4) AS stddev_value
    FROM events GROUP BY event_type
    """,
    doc="Numeric profile per type incl. stddev (SURVEY §2.4 A5/A6).",
    tags=("agg",),
)
def event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.stddev_samp("value"), 4).alias("stddev_value"),
    )


@query(
    "top20_users_by_value",
    oracle="""
    SELECT user_id, round(sum(value), 2) AS total_value, count(*) AS n_events
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY total_value DESC, user_id
    LIMIT 20
    """,
    doc="Filtered top-k users (top_10_clicked_recipe.sql shape; SURVEY §2.6 O2).",
    tags=("topk", "agg"),
)
def top20_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 2).alias("total_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(20)
    )


@query(
    "props_variant_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(count_if(json_extract(props, '$.k') IS NOT NULL) AS BIGINT) AS n_with_k,
           CAST(coalesce(sum(CAST(json_extract(props, '$.k') AS INT)), 0) AS BIGINT) AS sum_k,
           CAST(coalesce(min(CAST(json_extract(props, '$.k') AS INT)), 0) AS BIGINT) AS min_k,
           CAST(coalesce(max(CAST(json_extract(props, '$.k') AS INT)), 0) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured payload via the VARIANT type (Spark 4): "
    "parse_json once into Variant's shredded binary encoding, then "
    "typed try_variant_get extraction — the scale path for schemaless "
    "props (vs get_json_object, which re-parses the string per "
    "access; SURVEY §7.4 #7 schema drift). Nullable extracts are "
    "coalesced so output columns stay non-null BIGINT. Trade-off "
    "pinned in test_plans.py: variant expressions run interpreted "
    "(no whole-stage codegen in Spark 4.1) but keep partial "
    "aggregation and column-pruned scans — parse-once still wins "
    "when several fields are extracted per row.",
    tags=("json", "variant", "agg", "bench"),
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return ev.withColumn("k", k).groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count_if(F.col("k").isNotNull()).alias("n_with_k"),
        F.coalesce(F.sum("k"), F.lit(0)).cast("bigint").alias("sum_k"),
        F.coalesce(F.min("k"), F.lit(0)).cast("bigint").alias("min_k"),
        F.coalesce(F.max("k"), F.lit(0)).cast("bigint").alias("max_k"),
    )


@query(
    "wau_sketch_rollup",
    oracle="""
    SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS VARCHAR) AS week_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau_exact,
           CAST(count(*) AS BIGINT) AS n_events,
           true AS est_within_bound
    FROM events
    GROUP BY date_trunc('week', CAST(ts AS DATE))
    """,
    doc="Mergeable-sketch rollup: daily HLL user sketches "
    "(hll_sketch_agg, Apache DataSketches) unioned into weekly "
    "uniques (hll_union_agg) — the production incremental pattern for "
    "distinct counts at 100 TB: materialize one small sketch per "
    "day/partition ONCE, answer any date-range unique-user question "
    "by merging sketches without rescanning raw events (exact "
    "COUNT(DISTINCT) can't pre-aggregate: uniques don't sum). "
    "Driver-checkable contract (upgrades the r01-r05 rows-only "
    "check): the output carries the EXACT weekly uniques plus a flag "
    "that the merged-sketch estimate lands within the union error "
    "model's bound (unions drop the HIP accumulator, so the estimate "
    "carries the composite estimator's RSE and stack errors "
    "correlate — sketch_rollups.UNION_BOUND_SIGMAS × 1.04/√2^lgK; a "
    "fixed 5% flag went red at ×300-zipf, r13); the oracle recomputes "
    "the exact side and expects every flag true — a hash row that "
    "fails if the daily->weekly sketch merge ever drifts.",
    tags=("approx", "sketch", "agg"),
)
def wau_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.to_date("ts")).cast("date").cast("string")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg(F.col("user_id").cast("string")).alias("sk"),
        F.count("*").alias("n_events"),
    )
    rolled = daily.groupBy(
        F.date_trunc("week", "day").cast("date").cast("string").alias("week_start")
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_approx"),
        F.sum("n_events").alias("n_events"),
    )
    # the exact control: an ordinary distinct aggregate straight off the
    # fact (what the sketch replaces in the incremental pattern) — the
    # comparison is the estimator's accuracy contract, driver-hashed.
    exact = ev.groupBy(week.alias("week_start")).agg(
        F.count_distinct("user_id").cast("long").alias("wau_exact")
    )
    from reciping_data_pipeline_spark.pipeline import sketch_rollups as sr

    return rolled.join(exact, "week_start").select(
        "week_start",
        "wau_exact",
        "n_events",
        # the weekly estimate comes from a UNION of day sketches, so the
        # flag derives from the union (composite-estimator) error model,
        # not a fixed 5 % — see sketch_rollups.UNION_BOUND_SIGMAS
        (
            F.abs(F.col("wau_approx") - F.col("wau_exact"))
            <= F.lit(sr.UNION_BOUND_SIGMAS * sr.union_rse()) * F.col("wau_approx")
        ).alias("est_within_bound"),
    )


@query(
    "props_map_explode",
    oracle="""
    WITH kv AS (
        SELECT event_type, props, unnest(json_keys(props)) AS prop_key
        FROM events
    )
    SELECT event_type, prop_key,
           count(*) AS n_events,
           CAST(min(CAST(json_extract(props, '$.' || prop_key) AS INT)) AS BIGINT)
               AS min_value,
           CAST(max(CAST(json_extract(props, '$.' || prop_key) AS INT)) AS BIGINT)
               AS max_value
    FROM kv
    GROUP BY event_type, prop_key
    """,
    doc="Schema-drift-proof props handling: parse the payload to "
    "MAP<string,int> and explode to (key, value) rows — unknown keys "
    "survive without a declared StructType (the reference's Silver "
    "drops undeclared properties; SURVEY §1.2/§7.4 #7). MAP is absent "
    "from the reference's type system (§1.3) — covered here as an "
    "extension. Explode fan-out is per-key (bounded by payload size), "
    "then one partial-agg shuffle on (event_type, key).",
    tags=("json", "map", "agg"),
)
def props_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        "event_type",
        F.explode(F.from_json(F.col("props"), "map<string,int>")).alias("prop_key", "v"),
    )
    return kv.groupBy("event_type", "prop_key").agg(
        F.count("*").alias("n_events"),
        F.min("v").cast("bigint").alias("min_value"),
        F.max("v").cast("bigint").alias("max_value"),
    )


@query(
    "session_stats_daily",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM flagged
    ), per_session AS (
        SELECT user_id, session_idx,
               CAST(CAST(min(ts) AS DATE) AS STRING) AS session_day,
               count(*) AS n_events,
               date_diff('second', min(ts), max(ts)) AS duration_sec
        FROM sessions GROUP BY user_id, session_idx
    )
    SELECT session_day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           round(avg(CASE WHEN n_events = 1 THEN 1.0 ELSE 0.0 END), 4) AS bounce_rate,
           round(avg(n_events), 2) AS avg_events,
           round(quantile_cont(duration_sec, 0.5), 2) AS median_duration_sec
    FROM per_session GROUP BY session_day
    """,
    doc="Daily session-quality profile on top of the gap-based "
    "sessionization (30-min timeout): session count, bounce rate "
    "(1-event sessions), mean events, exact median duration — the "
    "serving-layer rollup of the sessionize operator. Same "
    "user-partitioned windows (never global), then a day-keyed "
    "aggregate over the per-session frame.",
    tags=("window", "sessionize", "agg"),
)
def session_stats_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_sec = F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
    flagged = ev.withColumn(
        "is_new_session",
        F.when(prev_ts.isNull() | (gap_sec > 1800), 1).otherwise(0),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    per_session = (
        flagged.withColumn("session_idx", F.sum("is_new_session").over(cum))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min(F.col("ts").cast("date")).cast("string").alias("session_day"),
            F.count("*").alias("n_events"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "duration_sec"
            ),
        )
    )
    return per_session.groupBy("session_day").agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg(F.when(F.col("n_events") == 1, 1.0).otherwise(0.0)), 4).alias(
            "bounce_rate"
        ),
        F.round(F.avg("n_events"), 2).alias("avg_events"),
        F.round(F.percentile("duration_sec", F.lit(0.5)), 2).alias("median_duration_sec"),
    )


@query(
    "purchase_multitouch_attribution",
    oracle="""
    WITH rel AS (
        SELECT user_id, ts, event_type, event_id, value FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    marks AS (
        -- touch rows carry (v, c) flags; each purchase contributes TWO
        -- marker rows reading the running touch counts at ts
        -- (sign +1) and ts - 7d (sign -1). kind=0 sorts markers BEFORE
        -- touches at equal t: the upper boundary is strict (tts < pts)
        -- and the lower is inclusive (tts >= pts-7d excluded from the
        -- subtracted prefix) on both ends.
        SELECT user_id, ts AS t, 1 AS kind,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS v,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS c,
               NULL AS event_id, NULL AS value, 0 AS sign
        FROM rel WHERE event_type != 'purchase'
        UNION ALL
        SELECT user_id, ts, 0, 0, 0, event_id, value, 1
        FROM rel WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts - INTERVAL 7 DAY, 0, 0, 0, event_id, NULL, -1
        FROM rel WHERE event_type = 'purchase'
    ),
    cum AS (
        SELECT *, sum(v) OVER w AS cumv, sum(c) OVER w AS cumc
        FROM marks
        WINDOW w AS (PARTITION BY user_id ORDER BY t, kind
                     ROWS UNBOUNDED PRECEDING)
    ),
    per AS (
        SELECT event_id, max(value) AS value,
               sum(sign * cumv) AS n_view, sum(sign * cumc) AS n_click
        FROM cum WHERE event_id IS NOT NULL
        GROUP BY event_id
    ),
    per2 AS (
        SELECT n_view, n_click,
               -- per-touch credits quantized to 1e-8 integer units and
               -- summed as integers (exact, order-invariant): a raw
               -- double sum accumulates in different orders on Spark
               -- partitions vs this scan and can flip the 4-dp floor.
               CAST(floor(value / (n_view + n_click) * 100000000.0 + 0.5)
                    AS BIGINT) AS credit_q
        FROM per WHERE n_view + n_click > 0
    ),
    stacked AS (
        SELECT 'view' AS touch_type, n_view AS k, credit_q
        FROM per2 WHERE n_view > 0
        UNION ALL
        SELECT 'click', n_click, credit_q FROM per2 WHERE n_click > 0
    )
    SELECT touch_type,
           CAST(sum(k) AS BIGINT) AS n_touches,
           floor(CAST(sum(CAST(k AS BIGINT) * credit_q) AS DOUBLE)
                 / 10000.0 + 0.5) / 10000.0 AS attributed_value
    FROM stacked
    GROUP BY touch_type
    """,
    doc="Multi-touch (linear) revenue attribution: every purchase's "
    "value splits equally across the user's view/click touches in the "
    "trailing 7 days — the complement of the as-of join's last-touch "
    "model (purchase_asof_last_view). NOT the naive purchases×touches "
    "user join: that shape is quadratic per user and died on the "
    "×300-zipf fixture (4.96e11 pairs, 2.4e11 from the single top "
    "user — r13 skew sweep). Instead each purchase reads running "
    "per-user touch counts at its two window boundaries (two marker "
    "rows through one user-keyed ORDER BY ts running sum — O(n log n) "
    "per user), then per-type credit totals are count×credit products "
    "— bit-identical to the pair form since every pair of one "
    "purchase carries the same quantized credit. Fractional credits "
    "quantized to 1e-8 integer units, floor-rounded at 4dp after the "
    "final aggregation.",
    tags=("clickstream", "attribution", "join", "window", "bench"),
)
def purchase_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rel = ev.where(F.col("event_type").isin("view", "click", "purchase"))
    touch = rel.where(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("c"),
        F.lit(None).cast("string").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("sign"),
    )
    p = rel.where(F.col("event_type") == "purchase")
    upper = p.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(0).alias("v"),
        F.lit(0).alias("c"),
        F.col("event_id").cast("string").alias("event_id"),
        F.col("value").cast("double").alias("value"),
        F.lit(1).alias("sign"),
    )
    lower = p.select(
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 7 DAYS")).alias("t"),
        F.lit(0).alias("kind"),
        F.lit(0).alias("v"),
        F.lit(0).alias("c"),
        F.col("event_id").cast("string").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.lit(-1).alias("sign"),
    )
    # one user-keyed running sum; markers (kind=0) sort before touches
    # at equal t so both window boundaries get the strict/inclusive
    # semantics of the pair form (tts < pts, tts >= pts - 7d). Linear
    # in per-user events — survives the zipf top user where the
    # purchases×touches join is quadratic.
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        touch.unionAll(upper)
        .unionAll(lower)
        .select(
            "*",
            F.sum("v").over(w).alias("cumv"),
            F.sum("c").over(w).alias("cumc"),
        )
        .where(F.col("event_id").isNotNull())
    )
    per = cum.groupBy("event_id").agg(
        F.max("value").alias("value"),
        F.sum(F.col("sign") * F.col("cumv")).alias("n_view"),
        F.sum(F.col("sign") * F.col("cumc")).alias("n_click"),
    )
    per = per.where((F.col("n_view") + F.col("n_click")) > 0).select(
        "n_view",
        "n_click",
        F.floor(
            F.col("value") / (F.col("n_view") + F.col("n_click")) * 100000000.0
            + 0.5
        )
        .cast("long")
        .alias("credit_q"),
    )
    stacked = per.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view").alias("touch_type"), F.col("n_view").alias("k")
                ),
                F.struct(
                    F.lit("click").alias("touch_type"), F.col("n_click").alias("k")
                ),
            )
        ).alias("s"),
        "credit_q",
    ).select("s.touch_type", "s.k", "credit_q")
    return (
        stacked.where(F.col("k") > 0)
        .groupBy("touch_type")
        .agg(
            F.sum("k").cast("long").alias("n_touches"),
            (
                F.floor(
                    F.sum(F.col("k") * F.col("credit_q")).cast("double") / 10000.0
                    + 0.5
                )
                / 10000.0
            ).alias("attributed_value"),
        )
    )


@query(
    "funnel_within_hour",
    oracle="""
    WITH rel AS (
        -- kind orders same-ts rows so every hop's strict > holds:
        -- purchases(0) before clicks(1) before views(2); a row's
        -- "following" frame then never contains an equal-ts event it
        -- must not match.
        SELECT user_id, ts AS t,
               CASE event_type WHEN 'purchase' THEN 0
                               WHEN 'click' THEN 1 ELSE 2 END AS kind,
               event_id
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    np AS (
        SELECT *,
               coalesce(
                   min(CASE WHEN kind = 0 THEN t END)
                       OVER (PARTITION BY user_id ORDER BY t, kind
                             ROWS BETWEEN 1 FOLLOWING
                                      AND UNBOUNDED FOLLOWING),
                   TIMESTAMP '9999-01-01') AS next_purchase
        FROM rel
    ),
    fc AS (
        SELECT *,
               min(CASE WHEN kind = 1
                        THEN struct_pack(ct := t, np := next_purchase) END)
                   OVER (PARTITION BY user_id ORDER BY t, kind
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS first_click
        FROM np
    )
    SELECT CAST(CAST(t AS DATE) AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n_views,
           CAST(count(*) FILTER (
               WHERE first_click.ct <= t + INTERVAL 1 HOUR
           ) AS BIGINT) AS n_clicked_1h,
           CAST(count(*) FILTER (
               WHERE first_click.ct <= t + INTERVAL 1 HOUR
                 AND first_click.np <= first_click.ct + INTERVAL 1 HOUR
           ) AS BIGINT) AS n_purchased_1h
    FROM fc
    WHERE kind = 2
    GROUP BY CAST(t AS DATE)
    """,
    doc="Time-constrained ordered funnel: view -> first click within "
    "1 hour -> purchase within 1 hour of THAT click, reported per "
    "view-day. NOT the naive per-hop user join (views×clicks then "
    "×purchases — quadratic per user; the shape that died on the "
    "×300-zipf fixture, r13 skew sweep). Instead one per-user ordered "
    "pass: every row carries its next-purchase time (min-over-"
    "following window), then every view picks its first following "
    "click WITH that click's next-purchase via a lexicographic "
    "struct-min over the same window — O(n log n) per user, "
    "same-timestamp strictness encoded in the sort kind. The time "
    "clock restarts at the matched step the way product analytics "
    "define conversion windows.",
    tags=("clickstream", "funnel", "asof", "window", "bench"),
)
def funnel_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rel = ev.where(F.col("event_type").isin("view", "click", "purchase")).select(
        "user_id",
        F.col("ts").alias("t"),
        F.when(F.col("event_type") == "purchase", 0)
        .when(F.col("event_type") == "click", 1)
        .otherwise(2)
        .alias("kind"),
    )
    # The "strictly after me in (t, kind) order" frame, expressed as a
    # GROWING frame over the REVERSED sort: Spark evaluates
    # UNBOUNDED FOLLOWING frames by rescanning the remainder of the
    # partition per row — O(n²), which hung for >13 min on the ×300
    # zipf top user (~2.5M rows) — while UNBOUNDED PRECEDING frames
    # accumulate incrementally in O(n).
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").desc(), F.col("kind").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # sentinel instead of NULL: struct comparison must stay total
    np = rel.withColumn(
        "next_purchase",
        F.coalesce(
            F.min(F.when(F.col("kind") == 0, F.col("t"))).over(wf),
            F.lit("9999-01-01").cast("timestamp"),
        ),
    )
    fc = np.withColumn(
        "first_click",
        F.min(
            F.when(
                F.col("kind") == 1,
                F.struct(F.col("t").alias("ct"), F.col("next_purchase").alias("np")),
            )
        ).over(wf),
    )
    clicked = F.col("first_click.ct") <= F.col("t") + F.expr("INTERVAL 1 HOUR")
    purchased = clicked & (
        F.col("first_click.np")
        <= F.col("first_click.ct") + F.expr("INTERVAL 1 HOUR")
    )
    return (
        fc.where(F.col("kind") == 2)
        .groupBy(F.col("t").cast("date").cast("string").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_views"),
            F.count_if(clicked).cast("long").alias("n_clicked_1h"),
            F.count_if(purchased).cast("long").alias("n_purchased_1h"),
        )
    )


@query(
    "user_longest_streak",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    g AS (
        SELECT user_id, day,
               day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                          AS INT) AS grp
        FROM d
    ),
    s AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS streak,
               CAST(min(day) AS VARCHAR) AS streak_start
        FROM g GROUP BY user_id, grp
    )
    SELECT user_id, streak, streak_start
    FROM (
        SELECT user_id, streak, streak_start,
               row_number() OVER (PARTITION BY user_id
                    ORDER BY streak DESC, streak_start ASC) AS rn
        FROM s
    )
    WHERE rn = 1
    """,
    doc="Longest consecutive-active-day streak per user via the "
    "date-minus-rank trick: within a user, consecutive days share "
    "day - row_number() (a constant per unbroken run), so streaks "
    "fall out of one GROUP BY with no self-join and no gap scan — "
    "user-partitioned windows only, exact date/integer arithmetic. "
    "Ties between equal-length streaks resolve to the earliest.",
    tags=("clickstream", "streak", "window", "bench"),
)
def user_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w).cast("int"))
    )
    s = g.groupBy("user_id", "grp").agg(
        F.count("*").cast("long").alias("streak"),
        F.min("day").cast("string").alias("streak_start"),
    )
    w_top = Window.partitionBy("user_id").orderBy(
        F.col("streak").desc(), F.col("streak_start").asc()
    )
    return (
        s.withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") == 1)
        .select("user_id", "streak", "streak_start")
    )
