"""The reference's 21 analytics queries over the Gold star schema.

Source: ``sql_queries/*.sql`` (Trino dialect) — translated to SQL that
runs identically on Spark SQL and DuckDB (the golden-test oracle),
with per-engine variants only where dialects genuinely diverge
(``format_number``, list aggregation). Each query is registered with
``spark_sql`` and ``duck_sql`` text plus the parameters the reference
hard-codes (sample-size gates, A/B window) so tests can shrink them
for small fixtures while production keeps reference defaults.

Deliberate deviations from the Trino originals, for determinism and
cross-engine hashability (each noted per query):
- date/timestamp output columns are CAST AS STRING;
- ``new_data_load_date``'s ``AT TIME ZONE 'Asia/Seoul'`` is dropped —
  this engine stores ``created_at`` as KST wall-clock NTZ already;
- chart-color columns (pure presentation constants) are kept verbatim;
- Korean result literals are kept verbatim.

Spark-scale note: every query here runs over ``fact_user_events``
joined to KB-sized dims; with the session's broadcast threshold all
dim joins plan as BroadcastHashJoin (no fact shuffle except the
aggregation itself). The 4-way UNION ALL segment stacks re-scan the
fact per block exactly like the reference; ``dau_grouping_sets`` in
``queries/clickstream.py`` shows the one-pass rewrite.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

GOLD_VIEWS = ("fact_user_events", "dim_user", "dim_recipe", "dim_event", "dim_page", "dim_time")


@dataclass(frozen=True)
class AnalyticsQuery:
    name: str
    spark_sql: str
    duck_sql: str  # identical unless dialects diverge
    doc: str = ""


_REGISTRY: dict[str, AnalyticsQuery] = {}


import re

_DECIMAL_LITERAL = re.compile(r"(?<![\w.])(\d+\.\d+)(?![\w.])")


def _doublify(sql: str) -> str:
    """Rewrite bare decimal literals (100.0, 0.0, 60.0 …) as DOUBLE
    casts: Spark types them as DECIMAL (surfacing as Python Decimal,
    breaking value comparison and changing arithmetic), DuckDB as
    DECIMAL too but with different promotion; CAST(x AS DOUBLE) pins
    both engines to the same double arithmetic the Trino originals
    perform. Format specs like %.1f / {:,} are untouched (no digits on
    both sides of the dot)."""
    return _DECIMAL_LITERAL.sub(r"CAST(\1 AS DOUBLE)", sql)


def _register(name: str, sql: str, duck_sql: str | None = None, doc: str = "") -> None:
    _REGISTRY[name] = AnalyticsQuery(
        name=name, spark_sql=_doublify(sql), duck_sql=_doublify(duck_sql or sql), doc=doc
    )


def all_analytics() -> dict[str, AnalyticsQuery]:
    return dict(_REGISTRY)


def register_gold_views(spark: SparkSession, warehouse: str, *, cache: bool = False) -> None:
    """Register the Gold tables as temp views.

    ``cache=True`` pins each view's scan in executor memory — the
    dashboard-serving posture: the 21-query suite re-reads the same
    fact + dims up to 7x each (UNION ALL segment blocks), so between
    pipeline refreshes the serving layer amortizes ONE parquet scan
    per table across every query (measured ~2x on the suite at
    sf0.1-shaped gold). A refresh re-registers the views, which drops
    the stale cache entries (unpersist on replace); the batch/
    incremental writers themselves never read through these views, so
    correctness never depends on cache invalidation.
    """
    import os

    for v in GOLD_VIEWS:
        df = spark.read.parquet(os.path.join(warehouse, v))
        if cache:
            df = df.cache()
        df.createOrReplaceTempView(v)


def run(spark: SparkSession, name: str, **params) -> DataFrame:
    return spark.sql(sql_for(name, engine="spark", **params))


# ---------------------------------------------------------------- DAU.sql
_SEG_BLOCK_DAU = """
SELECT CAST(t.date AS STRING) AS event_date, '{stype}' AS segment_type,
       {sval} AS segment_value,
       COUNT(DISTINCT f.user_dim_key) AS dau
FROM fact_user_events f
JOIN dim_time t ON f.time_dim_key = t.time_dim_key
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.user_dim_key != 0
GROUP BY t.date{extra_group}
"""

_register(
    "dau",
    sql=(
        _SEG_BLOCK_DAU.format(stype="TOTAL", sval="'ALL'", extra_group="")
        + " UNION ALL "
        + _SEG_BLOCK_DAU.format(
            stype="USER_SEGMENT", sval="COALESCE(u.user_segment, 'UNKNOWN')", extra_group=", u.user_segment"
        )
        + " UNION ALL "
        + _SEG_BLOCK_DAU.format(
            stype="COOKING_STYLE", sval="COALESCE(u.cooking_style, 'UNKNOWN')", extra_group=", u.cooking_style"
        )
        + " UNION ALL "
        + _SEG_BLOCK_DAU.format(
            stype="AB_TEST_GROUP", sval="COALESCE(u.ab_test_group, 'UNKNOWN')", extra_group=", u.ab_test_group"
        )
        + " ORDER BY event_date, segment_type, segment_value"
    ),
    doc="DAU by TOTAL/segment/style/ab-group (DAU.sql).",
)

# ---------------------------------------------------------------- WAU.sql
_SEG_BLOCK_WAU = """
SELECT CAST(CAST(date_trunc('week', t.date) AS DATE) AS STRING) AS week_start,
       year(t.date) AS year, weekofyear(t.date) AS week_number,
       '{stype}' AS segment_type, {sval} AS segment_value,
       COUNT(DISTINCT f.user_dim_key) AS wau
FROM fact_user_events f
JOIN dim_time t ON f.time_dim_key = t.time_dim_key
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.user_dim_key != 0
GROUP BY date_trunc('week', t.date), year(t.date), weekofyear(t.date){extra_group}
"""


def _wau_sql(weekfn: str) -> str:
    blocks = " UNION ALL ".join(
        [
            _SEG_BLOCK_WAU.format(stype="TOTAL", sval="'ALL'", extra_group=""),
            _SEG_BLOCK_WAU.format(
                stype="USER_SEGMENT", sval="COALESCE(u.user_segment, 'UNKNOWN')", extra_group=", u.user_segment"
            ),
            _SEG_BLOCK_WAU.format(
                stype="AB_TEST_GROUP", sval="COALESCE(u.ab_test_group, 'UNKNOWN')", extra_group=", u.ab_test_group"
            ),
        ]
    ).replace("weekofyear(", f"{weekfn}(")
    return f"""
WITH weekly_data AS ({blocks})
SELECT week_start, year, week_number, segment_type, segment_value, wau,
       LAG(wau) OVER (PARTITION BY segment_type, segment_value ORDER BY week_start) AS prev_week_wau,
       CASE WHEN LAG(wau) OVER (PARTITION BY segment_type, segment_value ORDER BY week_start) > 0
            THEN ROUND((wau - LAG(wau) OVER (PARTITION BY segment_type, segment_value ORDER BY week_start)) * 100.0
                       / LAG(wau) OVER (PARTITION BY segment_type, segment_value ORDER BY week_start), 2)
            ELSE NULL END AS week_over_week_growth_pct
FROM weekly_data
ORDER BY week_start DESC, segment_type, segment_value
"""


_register("wau", sql=_wau_sql("weekofyear"), duck_sql=_wau_sql("weekofyear"), doc="WAU + WoW growth (WAU.sql).")

# --------------------------------------------------------- daily_events.sql
_register(
    "daily_events",
    sql="""
SELECT CAST(t.date AS STRING) AS event_date, e.event_name,
       COUNT(*) AS event_count,
       COUNT(DISTINCT f.user_dim_key) AS unique_users,
       ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (PARTITION BY t.date), 2) AS daily_event_percentage
FROM fact_user_events f
JOIN dim_time t ON f.time_dim_key = t.time_dim_key
JOIN dim_event e ON f.event_dim_key = e.event_sk
WHERE f.user_dim_key != 0
GROUP BY t.date, e.event_name
ORDER BY event_date DESC, event_count DESC
""",
    doc="Daily event volume + share-of-day (daily_events.sql).",
)

# ------------------------------------------------ daily_engagement_score.sql
_DOW_CASE = """CASE t.day_of_week
    WHEN 'Mon' THEN '1-Mon' WHEN 'Tue' THEN '2-Tue' WHEN 'Wed' THEN '3-Wed'
    WHEN 'Thu' THEN '4-Thu' WHEN 'Fri' THEN '5-Fri' WHEN 'Sat' THEN '6-Sat'
    WHEN 'Sun' THEN '7-Sun' ELSE t.day_of_week END"""

_register(
    "daily_engagement_score",
    sql=f"""
SELECT {_DOW_CASE} AS day_of_week, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
       ROUND(AVG(f.engagement_score), 2) AS avg_engagement_score, COUNT(*) AS total_events
FROM fact_user_events f
JOIN dim_time t ON f.time_dim_key = t.time_dim_key
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.user_dim_key != 0
GROUP BY t.day_of_week
UNION ALL
SELECT {_DOW_CASE} AS day_of_week, 'USER_SEGMENT' AS segment_type,
       COALESCE(u.user_segment, 'UNKNOWN') AS segment_value,
       ROUND(AVG(f.engagement_score), 2) AS avg_engagement_score, COUNT(*) AS total_events
FROM fact_user_events f
JOIN dim_time t ON f.time_dim_key = t.time_dim_key
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.user_dim_key != 0
GROUP BY t.day_of_week, u.user_segment
ORDER BY day_of_week, segment_type, segment_value
""",
    doc="Weekday engagement ladder averages (daily_engagement_score.sql).",
)

# ----------------------------------------------------- events_per_time.sql
_register(
    "events_per_time",
    sql="""
SELECT t.hour, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
       COUNT(*) AS event_count, COUNT(DISTINCT f.user_dim_key) AS unique_users
FROM fact_user_events f
JOIN dim_time t ON f.time_dim_key = t.time_dim_key
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.user_dim_key != 0
GROUP BY t.hour
UNION ALL
SELECT t.hour, 'USER_SEGMENT' AS segment_type,
       COALESCE(u.user_segment, 'UNKNOWN') AS segment_value,
       COUNT(*) AS event_count, COUNT(DISTINCT f.user_dim_key) AS unique_users
FROM fact_user_events f
JOIN dim_time t ON f.time_dim_key = t.time_dim_key
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.user_dim_key != 0
GROUP BY t.hour, u.user_segment
ORDER BY hour, segment_type, segment_value
""",
    doc="Hourly event volume by segment (events_per_time.sql).",
)

# -------------------------------------------------- event_distribution.sql
_register(
    "event_distribution",
    sql="""
SELECT e.event_name, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
       COUNT(*) AS event_count, COUNT(DISTINCT f.user_dim_key) AS unique_users,
       ROUND(AVG(f.engagement_score), 2) AS avg_engagement_score
FROM fact_user_events f
JOIN dim_event e ON f.event_dim_key = e.event_sk
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.user_dim_key != 0
GROUP BY e.event_name
UNION ALL
SELECT e.event_name, 'USER_SEGMENT' AS segment_type,
       COALESCE(u.user_segment, 'UNKNOWN') AS segment_value,
       COUNT(*) AS event_count, COUNT(DISTINCT f.user_dim_key) AS unique_users,
       ROUND(AVG(f.engagement_score), 2) AS avg_engagement_score
FROM fact_user_events f
JOIN dim_event e ON f.event_dim_key = e.event_sk
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.user_dim_key != 0
GROUP BY e.event_name, u.user_segment
ORDER BY event_name, segment_type, event_count DESC, segment_value
""",
    doc="Event-type distribution by segment (event_distribution.sql).",
)

# ---------------------------------------- interactions_per_dish_type.sql
_register(
    "interactions_per_dish_type",
    sql="""
SELECT r.dish_type, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
       COUNT(*) AS total_interactions, COUNT(DISTINCT f.user_dim_key) AS unique_users,
       ROUND(AVG(f.engagement_score), 2) AS avg_engagement
FROM fact_user_events f
JOIN dim_recipe r ON f.recipe_dim_key = r.recipe_sk
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.recipe_dim_key != 0
GROUP BY r.dish_type
UNION ALL
SELECT r.dish_type, 'USER_SEGMENT' AS segment_type,
       COALESCE(u.user_segment, 'UNKNOWN') AS segment_value,
       COUNT(*) AS total_interactions, COUNT(DISTINCT f.user_dim_key) AS unique_users,
       ROUND(AVG(f.engagement_score), 2) AS avg_engagement
FROM fact_user_events f
JOIN dim_recipe r ON f.recipe_dim_key = r.recipe_sk
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.recipe_dim_key != 0
GROUP BY r.dish_type, u.user_segment
ORDER BY dish_type, segment_type, total_interactions DESC, segment_value
""",
    doc="Dish-type popularity by segment (interactions_per_dish_type.sql).",
)

# ---------------------------------------------------------- pages_views.sql
_register(
    "pages_views",
    sql="""
SELECT p.page_name, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
       COUNT(*) AS page_views, COUNT(DISTINCT f.user_dim_key) AS unique_visitors
FROM fact_user_events f
JOIN dim_page p ON f.page_dim_key = p.page_sk
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.page_dim_key != 0
GROUP BY p.page_name
UNION ALL
SELECT p.page_name, 'USER_SEGMENT' AS segment_type,
       COALESCE(u.user_segment, 'UNKNOWN') AS segment_value,
       COUNT(*) AS page_views, COUNT(DISTINCT f.user_dim_key) AS unique_visitors
FROM fact_user_events f
JOIN dim_page p ON f.page_dim_key = p.page_sk
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.page_dim_key != 0
GROUP BY p.page_name, u.user_segment
ORDER BY page_name, segment_type, page_views DESC, segment_value
""",
    doc="Page views by segment (pages_views.sql).",
)

# -------------------------------------- daily_search_to_recipe_click.sql
_register(
    "daily_search_to_recipe_click",
    sql="""
WITH daily_searches AS (
    SELECT t.date, u.user_segment, COUNT(*) AS search_count,
           COUNT(DISTINCT f.user_dim_key) AS search_users
    FROM fact_user_events f
    JOIN dim_time t ON f.time_dim_key = t.time_dim_key
    JOIN dim_event e ON f.event_dim_key = e.event_sk
    JOIN dim_user u ON f.user_dim_key = u.user_sk
    WHERE e.event_name = 'search_recipe'
    GROUP BY t.date, u.user_segment
),
daily_recipe_views AS (
    SELECT t.date, u.user_segment, COUNT(*) AS view_count,
           COUNT(DISTINCT f.user_dim_key) AS view_users
    FROM fact_user_events f
    JOIN dim_time t ON f.time_dim_key = t.time_dim_key
    JOIN dim_event e ON f.event_dim_key = e.event_sk
    JOIN dim_user u ON f.user_dim_key = u.user_sk
    WHERE e.event_name = 'click_recipe'
    GROUP BY t.date, u.user_segment
)
SELECT CAST(s.date AS STRING) AS date,
       COALESCE(s.user_segment, 'UNKNOWN') AS user_segment,
       s.search_count, COALESCE(v.view_count, 0) AS view_count,
       CASE WHEN s.search_count > 0
            THEN ROUND(COALESCE(v.view_count, 0) * 100.0 / s.search_count, 2)
            ELSE 0 END AS conversion_rate_pct
FROM daily_searches s
LEFT JOIN daily_recipe_views v ON s.date = v.date AND s.user_segment = v.user_segment
ORDER BY date, user_segment
""",
    doc="Search→click conversion, 2-key left join (daily_search_to_recipe_click.sql).",
)

# ------------------------------------------- time_x_day_events_heatmap.sql
_register(
    "time_x_day_events_heatmap",
    sql="""
WITH hourly_weekly_data AS (
    SELECT t.hour,
           CASE t.day_of_week
               WHEN 'Mon' THEN '1-Monday' WHEN 'Tue' THEN '2-Tuesday'
               WHEN 'Wed' THEN '3-Wednesday' WHEN 'Thu' THEN '4-Thursday'
               WHEN 'Fri' THEN '5-Friday' WHEN 'Sat' THEN '6-Saturday'
               WHEN 'Sun' THEN '7-Sunday' ELSE t.day_of_week END AS day_of_week_ordered,
           COUNT(*) AS event_count,
           COUNT(DISTINCT f.user_dim_key) AS unique_users,
           ROUND(AVG(f.engagement_score), 2) AS avg_engagement_score
    FROM fact_user_events f
    JOIN dim_time t ON f.time_dim_key = t.time_dim_key
    WHERE f.user_dim_key != 0
    GROUP BY t.hour, t.day_of_week
)
SELECT hour, day_of_week_ordered, event_count, unique_users, avg_engagement_score,
       ROUND((event_count - MIN(event_count) OVER()) * 100.0 /
             (MAX(event_count) OVER() - MIN(event_count) OVER()), 2) AS normalized_intensity
FROM hourly_weekly_data
ORDER BY day_of_week_ordered, hour
""",
    doc="Hour x weekday heatmap, global min/max normalization (time_x_day_events_heatmap.sql).",
)

# ------------------------------------------------- top_10_clicked_recipe.sql
_register(
    "top_10_clicked_recipe",
    sql="""
SELECT r.recipe_name, COUNT(*) AS view_count
FROM fact_user_events f
JOIN dim_recipe r ON f.recipe_dim_key = r.recipe_sk
JOIN dim_event e ON f.event_dim_key = e.event_sk
WHERE e.event_name = 'click_recipe'
GROUP BY r.recipe_name
ORDER BY view_count DESC, recipe_name
LIMIT 10
""",
    doc="Top-10 clicked recipes (top_10_clicked_recipe.sql; recipe_name tiebreak added for determinism).",
)

_register(
    "top_10_bookmarked_recipe",
    sql="""
SELECT r.recipe_name, COUNT(*) AS bookmark_count
FROM fact_user_events f
JOIN dim_recipe r ON f.recipe_dim_key = r.recipe_sk
JOIN dim_event e ON f.event_dim_key = e.event_sk
WHERE e.event_name = 'click_bookmark'
GROUP BY r.recipe_name
ORDER BY bookmark_count DESC, recipe_name
LIMIT 10
""",
    doc="Top-10 bookmarked recipes (top_10_bookmarked_recipe.sql; recipe_name tiebreak added).",
)

# -------------------------------------- top_10_interactions_per_events.sql
_register(
    "top_10_interactions_per_events",
    sql="""
SELECT COALESCE(r.recipe_name, 'Unknown Recipe') AS recipe_name,
       COALESCE(r.dish_type, 'Unknown') AS dish_type,
       COALESCE(e.event_name, 'Unknown Event') AS event_name,
       COUNT(*) AS interaction_count,
       COUNT(DISTINCT f.user_dim_key) AS unique_users
FROM fact_user_events f
LEFT JOIN dim_recipe r ON f.recipe_dim_key = r.recipe_sk
LEFT JOIN dim_event e ON f.event_dim_key = e.event_sk
WHERE f.recipe_dim_key != 0
  AND r.recipe_name IN (
    SELECT recipe_name FROM (
      SELECT r2.recipe_name, COUNT(*) AS total_interactions
      FROM fact_user_events f2
      LEFT JOIN dim_recipe r2 ON f2.recipe_dim_key = r2.recipe_sk
      WHERE f2.recipe_dim_key != 0
      GROUP BY r2.recipe_name
      ORDER BY total_interactions DESC, recipe_name
      LIMIT 10
    ) top_recipes
  )
GROUP BY r.recipe_name, r.dish_type, e.event_name
ORDER BY recipe_name, interaction_count DESC, event_name
""",
    doc="Per-event interactions for the top-10 recipes — IN-subquery semi join "
    "(top_10_interactions_per_events.sql; name tiebreaks added).",
)

# ------------------------------------------------------ click_ads_funnel.sql
_FUNNEL_STEP = """
SELECT '{label}' AS funnel_step, {users} AS users,
       CASE WHEN {base} > 0 THEN ROUND({users} * 100.0 / {base}, 2) ELSE 0.0 END AS conversion_rate_pct,
       CASE WHEN {base} > 0 THEN ROUND(({base} - {users}) * 100.0 / {base}, 2) ELSE 0.0 END AS drop_off_rate_pct
FROM funnel_counts
"""

_register(
    "click_ads_funnel",
    sql=(
        """
WITH extended_ads_funnel AS (
    SELECT f.user_dim_key,
           MAX(CASE WHEN e.event_name = 'view_page' THEN 1 ELSE 0 END) AS step_1_visit,
           MAX(CASE WHEN e.event_name = 'search_recipe' THEN 1 ELSE 0 END) AS step_2_search,
           MAX(CASE WHEN e.event_name = 'click_recipe' THEN 1 ELSE 0 END) AS step_3_click_recipe,
           MAX(CASE WHEN e.event_name = 'view_ads' THEN 1 ELSE 0 END) AS step_6_view_ads,
           MAX(CASE WHEN e.event_name = 'click_ads' THEN 1 ELSE 0 END) AS step_7_click_ads
    FROM fact_user_events f
    JOIN dim_event e ON f.event_dim_key = e.event_sk
    WHERE f.user_dim_key != 0
    GROUP BY f.user_dim_key
),
funnel_counts AS (
    -- CAST: DuckDB types SUM(int) as HUGEINT, Spark as BIGINT; the
    -- typed oracle hash needs the same family on both engines
    SELECT CAST(SUM(step_1_visit) AS BIGINT) AS users_visit,
           CAST(SUM(step_2_search) AS BIGINT) AS users_search,
           CAST(SUM(step_3_click_recipe) AS BIGINT) AS users_click_recipe,
           CAST(SUM(step_6_view_ads) AS BIGINT) AS users_view_ads,
           CAST(SUM(step_7_click_ads) AS BIGINT) AS users_click_ads
    FROM extended_ads_funnel
)
SELECT '1. Visit Site' AS funnel_step, users_visit AS users,
       100.0 AS conversion_rate_pct, 0.0 AS drop_off_rate_pct
FROM funnel_counts
UNION ALL
"""
        + _FUNNEL_STEP.format(label="2. Search Recipe", users="users_search", base="users_visit")
        + " UNION ALL "
        + _FUNNEL_STEP.format(label="3. Click Recipe", users="users_click_recipe", base="users_search")
        + " UNION ALL "
        + _FUNNEL_STEP.format(label="4. View Ads (Impression)", users="users_view_ads", base="users_click_recipe")
        + " UNION ALL "
        + _FUNNEL_STEP.format(label="5. Click Ads (Revenue)", users="users_click_ads", base="users_view_ads")
    ),
    doc="5-step ads funnel via per-user MAX(CASE) flags (click_ads_funnel.sql).",
)

# ---------------------------------------------------- ctr_advertisement.sql
_register(
    "ctr_advertisement",
    sql="""
WITH ads_performance AS (
    SELECT u.user_segment, u.ab_test_group,
           COUNT(DISTINCT f.user_dim_key) AS total_users,
           -- CAST: DuckDB SUM(int) is HUGEINT, Spark BIGINT — align families
           CAST(SUM(CASE WHEN e.event_name = 'view_ads' THEN 1 ELSE 0 END) AS BIGINT) AS total_ad_views,
           CAST(SUM(CASE WHEN e.event_name = 'click_ads' THEN 1 ELSE 0 END) AS BIGINT) AS total_ad_clicks,
           COUNT(DISTINCT CASE WHEN e.event_name = 'view_ads' THEN f.user_dim_key END) AS users_viewed_ads,
           COUNT(DISTINCT CASE WHEN e.event_name = 'click_ads' THEN f.user_dim_key END) AS users_clicked_ads
    FROM fact_user_events f
    JOIN dim_user u ON f.user_dim_key = u.user_sk
    JOIN dim_event e ON f.event_dim_key = e.event_sk
    WHERE f.user_dim_key != 0
    GROUP BY u.user_segment, u.ab_test_group
)
SELECT COALESCE(user_segment, 'UNKNOWN') AS user_segment,
       COALESCE(ab_test_group, 'UNKNOWN') AS ab_test_group,
       total_users, total_ad_views, total_ad_clicks, users_viewed_ads, users_clicked_ads,
       CASE WHEN total_ad_views > 0 THEN ROUND(total_ad_clicks * 100.0 / total_ad_views, 2)
            ELSE 0.0 END AS ctr_pct,
       ROUND(users_viewed_ads * 100.0 / total_users, 2) AS ad_exposure_rate_pct,
       CASE WHEN users_viewed_ads > 0 THEN ROUND(users_clicked_ads * 100.0 / users_viewed_ads, 2)
            ELSE 0.0 END AS ad_conversion_rate_pct
FROM ads_performance
WHERE total_ad_views > 0
ORDER BY ctr_pct DESC, user_segment, ab_test_group
""",
    doc="Ad CTR per segment x group (ctr_advertisement.sql; tiebreak added).",
)

# ------------------------------------------------- treatment_vs_control.sql
TREATMENT_VS_CONTROL_MIN_USERS = 100  # reference sample-size gate

_register(
    "treatment_vs_control",
    sql="""
WITH segment_performance AS (
    SELECT u.user_segment, u.ab_test_group,
           COUNT(DISTINCT f.user_dim_key) AS total_users,
           ROUND(COUNT(DISTINCT CASE WHEN e.event_name = 'click_ads' THEN f.user_dim_key END) * 100.0
                 / COUNT(DISTINCT f.user_dim_key), 2) AS ad_click_conversion_rate,
           ROUND(AVG(f.engagement_score), 2) AS avg_engagement_score
    FROM fact_user_events f
    JOIN dim_time t ON f.time_dim_key = t.time_dim_key
    JOIN dim_user u ON f.user_dim_key = u.user_sk
    JOIN dim_event e ON f.event_dim_key = e.event_sk
    WHERE f.user_dim_key != 0 AND u.ab_test_group IN ('treatment', 'control')
    GROUP BY u.user_segment, u.ab_test_group
    HAVING COUNT(DISTINCT f.user_dim_key) >= {min_users}
)
SELECT user_segment, ab_test_group, ad_click_conversion_rate, avg_engagement_score, total_users,
       CASE WHEN ab_test_group = 'treatment' THEN '#1f77b4'
            WHEN ab_test_group = 'control' THEN '#ff7f0e' END AS chart_color
FROM segment_performance
ORDER BY user_segment, ab_test_group
""",
    doc="A/B ad-click conversion per segment with sample-size HAVING gate "
    "(treatment_vs_control.sql; {min_users} parameterized, reference default 100).",
)

# ----------------------------------------------------------------- lift.sql
_register(
    "lift",
    sql="""
WITH segment_stats AS (
    SELECT u.user_segment, u.ab_test_group,
           COUNT(DISTINCT f.user_dim_key) AS total_users,
           ROUND(COUNT(DISTINCT CASE WHEN e.event_name = 'click_ads' THEN f.user_dim_key END) * 100.0
                 / COUNT(DISTINCT f.user_dim_key), 2) AS avg_conversion,
           ROUND(AVG(f.engagement_score), 2) AS avg_engagement
    FROM fact_user_events f
    JOIN dim_time t ON f.time_dim_key = t.time_dim_key
    JOIN dim_user u ON f.user_dim_key = u.user_sk
    JOIN dim_event e ON f.event_dim_key = e.event_sk
    WHERE f.user_dim_key != 0 AND u.ab_test_group IN ('treatment', 'control')
    GROUP BY u.user_segment, u.ab_test_group
    HAVING COUNT(DISTINCT f.user_dim_key) >= {min_users}
),
lift_calculation AS (
    SELECT t.user_segment,
           t.avg_conversion AS treatment_conversion, c.avg_conversion AS control_conversion,
           t.avg_engagement AS treatment_engagement, c.avg_engagement AS control_engagement,
           t.total_users AS treatment_users, c.total_users AS control_users,
           ROUND(t.avg_conversion - c.avg_conversion, 2) AS absolute_lift,
           ROUND((t.avg_conversion - c.avg_conversion) / NULLIF(c.avg_conversion, 0) * 100, 1) AS relative_lift_pct,
           ROUND(t.avg_engagement - c.avg_engagement, 3) AS engagement_diff,
           CASE WHEN ABS(t.avg_conversion - c.avg_conversion) < 0.1 THEN '무승부'
                WHEN t.avg_conversion > c.avg_conversion THEN 'Treatment 승리'
                ELSE 'Control 승리' END AS winner,
           CASE WHEN ABS(t.avg_conversion - c.avg_conversion) >= 0.3 THEN '매우 유의함'
                WHEN ABS(t.avg_conversion - c.avg_conversion) >= 0.1 THEN '유의함'
                ELSE '유의하지 않음' END AS significance_level
    FROM segment_stats t
    JOIN segment_stats c ON t.user_segment = c.user_segment
    WHERE t.ab_test_group = 'treatment' AND c.ab_test_group = 'control'
)
SELECT user_segment, treatment_conversion, control_conversion, absolute_lift,
       relative_lift_pct, engagement_diff, winner, significance_level,
       treatment_users, control_users,
       CASE WHEN winner = 'Treatment 승리' THEN '#2ca02c'
            WHEN winner = 'Control 승리' THEN '#d62728'
            ELSE '#7f7f7f' END AS result_color
FROM lift_calculation
ORDER BY relative_lift_pct DESC, user_segment
""",
    doc="Treatment-vs-control lift via self-join pivot (lift.sql; tiebreak added).",
)

# ------------------------------------------------------- ab_test_heatmap.sql
AB_HEATMAP_MIN_USERS = 50

_register(
    "ab_test_heatmap",
    sql="""
SELECT u.user_segment, u.ab_test_group,
       COUNT(DISTINCT f.user_dim_key) AS total_users,
       ROUND(COUNT(DISTINCT CASE WHEN f.is_conversion THEN f.user_dim_key END) * 100.0
             / COUNT(DISTINCT f.user_dim_key), 2) AS conversion_rate,
       ROUND(AVG(f.engagement_score), 2) AS engagement_score,
       COUNT(*) AS total_events,
       ROUND(AVG(f.session_duration_seconds) / 60.0, 2) AS avg_session_minutes,
       CASE WHEN COUNT(DISTINCT CASE WHEN f.is_conversion THEN f.user_dim_key END) * 100.0
                 / COUNT(DISTINCT f.user_dim_key) >= 10 THEN 'High'
            WHEN COUNT(DISTINCT CASE WHEN f.is_conversion THEN f.user_dim_key END) * 100.0
                 / COUNT(DISTINCT f.user_dim_key) >= 8 THEN 'Medium'
            ELSE 'Low' END AS performance_tier
FROM fact_user_events f
JOIN dim_time t ON f.time_dim_key = t.time_dim_key
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.user_dim_key != 0 AND u.ab_test_group IN ('treatment', 'control')
GROUP BY u.user_segment, u.ab_test_group
HAVING COUNT(DISTINCT f.user_dim_key) >= {min_users}
ORDER BY user_segment, ab_test_group
""",
    doc="Engagement-vs-conversion heatmap matrix (ab_test_heatmap.sql; "
    "{min_users} parameterized, reference default 50).",
)

# --------------------------------------------------------- daily_ab_test.sql
_register(
    "daily_ab_test",
    sql="""
SELECT CAST(t.date AS STRING) AS event_date,
       COALESCE(u.ab_test_group, 'UNKNOWN') AS ab_test_group,
       COUNT(DISTINCT f.user_dim_key) AS daily_active_users,
       COUNT(*) AS daily_events,
       ROUND(COUNT(DISTINCT CASE WHEN f.is_conversion THEN f.user_dim_key END) * 100.0
             / COUNT(DISTINCT f.user_dim_key), 2) AS daily_user_conversion_rate_pct,
       ROUND(AVG(f.engagement_score), 2) AS daily_avg_engagement_score,
       ROUND(AVG(f.session_duration_seconds) / 60.0, 2) AS daily_avg_session_minutes
FROM fact_user_events f
JOIN dim_time t ON f.time_dim_key = t.time_dim_key
JOIN dim_user u ON f.user_dim_key = u.user_sk
WHERE f.user_dim_key != 0
GROUP BY t.date, u.ab_test_group
ORDER BY event_date DESC, ab_test_group
""",
    doc="Daily A/B performance trend (daily_ab_test.sql).",
)

# --------------------------------------------------- ab_test_kpi_metric.sql
_KPI_BODY = """
WITH segment_ad_conversion AS (
    SELECT u.user_segment, u.ab_test_group,
           COUNT(DISTINCT CASE WHEN e.event_name = 'click_ads' THEN f.user_dim_key END) * 100.0
               / COUNT(DISTINCT f.user_dim_key) AS ad_click_conv_rate
    FROM fact_user_events f
    JOIN dim_user u ON f.user_dim_key = u.user_sk
    JOIN dim_event e ON f.event_dim_key = e.event_sk
    JOIN dim_time t ON f.time_dim_key = t.time_dim_key
    WHERE u.ab_test_group IN ('treatment', 'control')
      AND t.date BETWEEN DATE '{start}' AND DATE '{end}'
    GROUP BY u.user_segment, u.ab_test_group
    HAVING COUNT(DISTINCT f.user_dim_key) >= {min_users}
),
pivoted_rates AS (
    SELECT user_segment,
           MAX(CASE WHEN ab_test_group = 'treatment' THEN ad_click_conv_rate END) AS treatment_rate,
           MAX(CASE WHEN ab_test_group = 'control' THEN ad_click_conv_rate END) AS control_rate
    FROM segment_ad_conversion
    GROUP BY user_segment
),
segment_winners AS (
    SELECT user_segment,
           CASE WHEN ABS(treatment_rate - control_rate) < 0.1 THEN '무승부'
                WHEN treatment_rate > control_rate THEN 'Treatment'
                ELSE 'Control' END AS winner
    FROM pivoted_rates
)
SELECT 'Treatment 승률' AS metric_name,
       CAST(ROUND(COUNT(CASE WHEN winner = 'Treatment' THEN 1 END) * 100.0 / COUNT(*), 1) AS STRING) AS metric_value,
       '%' AS unit
FROM segment_winners
UNION ALL
SELECT '총 테스트 사용자' AS metric_name,
       {fmt_users} AS metric_value,
       '명' AS unit
FROM (
    SELECT CAST(COUNT(DISTINCT f.user_dim_key) AS DOUBLE) AS test_users,
           (SELECT CAST(COUNT(DISTINCT user_sk) AS DOUBLE) FROM dim_user) AS total_users
    FROM fact_user_events f
    JOIN dim_user u ON f.user_dim_key = u.user_sk
    JOIN dim_time t ON f.time_dim_key = t.time_dim_key
    WHERE u.ab_test_group IN ('treatment', 'control')
      AND t.date BETWEEN DATE '{start}' AND DATE '{end}'
) stats
UNION ALL
SELECT '유의한 세그먼트 수' AS metric_name,
       CAST(COUNT(*) AS STRING) AS metric_value,
       '개' AS unit
FROM (SELECT user_segment, ABS(treatment_rate - control_rate) AS conv_diff FROM pivoted_rates) segment_diffs
WHERE conv_diff >= 0.1
UNION ALL
SELECT '테스트 기간' AS metric_name,
       CAST(MIN(t.date) AS STRING) || ' ~ ' || CAST(MAX(t.date) AS STRING) AS metric_value,
       '' AS unit
FROM fact_user_events f
JOIN dim_user u ON f.user_dim_key = u.user_sk
JOIN dim_time t ON f.time_dim_key = t.time_dim_key
WHERE u.ab_test_group IN ('treatment', 'control')
  AND t.date BETWEEN DATE '{start}' AND DATE '{end}'
UNION ALL
SELECT 'Treatment 우세 세그먼트' AS metric_name,
       COALESCE({agg_list}, '없음') AS metric_value,
       '' AS unit
FROM segment_winners WHERE winner = 'Treatment'
UNION ALL
SELECT 'Control 우세 세그먼트' AS metric_name,
       COALESCE({agg_list}, '없음') AS metric_value,
       '' AS unit
FROM segment_winners WHERE winner = 'Control'
"""

KPI_DEFAULTS = {"start": "2025-08-08", "end": "2025-08-22", "min_users": 100}

# Spark-side body (r15): the Trino original's 7 UNION blocks re-derive
# `segment_winners` three times and scan the fact twice more for the
# user-stats and test-period blocks — and Spark inlines every CTE
# reference, so each block re-executed the whole chain (measured 39
# jobs / 2.1 s over the cached views; per-branch column pruning makes
# the subtrees non-identical, so exchange reuse cannot dedup them).
# This body computes each input ONCE through single-reference CTEs —
# one pass over pivoted_rates for the winner metrics (stack() unpivots
# the four strings), one fact pass for test-users + period, one
# dim_user count — and emits the identical 6 rows (the fixture
# comparison is row-sorted; the DuckDB oracle below keeps the
# reference's original shape, so equivalence stays continuously
# verified). Conditional collect_list skips NULLs, so the winner-side
# lists match the original's filtered aggregations; '무승부' segments
# appear in neither, exactly as before.
_KPI_SPARK_BODY = """
WITH segment_ad_conversion AS (
    SELECT u.user_segment, u.ab_test_group,
           COUNT(DISTINCT CASE WHEN e.event_name = 'click_ads' THEN f.user_dim_key END) * 100.0
               / COUNT(DISTINCT f.user_dim_key) AS ad_click_conv_rate
    FROM fact_user_events f
    JOIN dim_user u ON f.user_dim_key = u.user_sk
    JOIN dim_event e ON f.event_dim_key = e.event_sk
    JOIN dim_time t ON f.time_dim_key = t.time_dim_key
    WHERE u.ab_test_group IN ('treatment', 'control')
      AND t.date BETWEEN DATE '{start}' AND DATE '{end}'
    GROUP BY u.user_segment, u.ab_test_group
    HAVING COUNT(DISTINCT f.user_dim_key) >= {min_users}
),
pivoted_rates AS (
    SELECT user_segment,
           MAX(CASE WHEN ab_test_group = 'treatment' THEN ad_click_conv_rate END) AS treatment_rate,
           MAX(CASE WHEN ab_test_group = 'control' THEN ad_click_conv_rate END) AS control_rate
    FROM segment_ad_conversion
    GROUP BY user_segment
),
winner_stats AS (
    SELECT
        CAST(ROUND(COUNT(CASE WHEN winner = 'Treatment' THEN 1 END) * 100.0
                   / COUNT(*), 1) AS STRING) AS treat_rate,
        CAST(COUNT(CASE WHEN conv_diff >= 0.1 THEN 1 END) AS STRING) AS sig_count,
        COALESCE(nullif(array_join(sort_array(collect_list(
            CASE WHEN winner = 'Treatment' THEN user_segment END)), ', '), ''), '없음') AS treat_list,
        COALESCE(nullif(array_join(sort_array(collect_list(
            CASE WHEN winner = 'Control' THEN user_segment END)), ', '), ''), '없음') AS control_list
    FROM (
        SELECT user_segment,
               CASE WHEN ABS(treatment_rate - control_rate) < 0.1 THEN '무승부'
                    WHEN treatment_rate > control_rate THEN 'Treatment'
                    ELSE 'Control' END AS winner,
               ABS(treatment_rate - control_rate) AS conv_diff
        FROM pivoted_rates
    )
),
fact_stats AS (
    SELECT CAST(COUNT(DISTINCT f.user_dim_key) AS DOUBLE) AS test_users,
           (SELECT CAST(COUNT(DISTINCT user_sk) AS DOUBLE) FROM dim_user) AS total_users,
           CAST(MIN(t.date) AS STRING) || ' ~ ' || CAST(MAX(t.date) AS STRING) AS period
    FROM fact_user_events f
    JOIN dim_user u ON f.user_dim_key = u.user_sk
    JOIN dim_time t ON f.time_dim_key = t.time_dim_key
    WHERE u.ab_test_group IN ('treatment', 'control')
      AND t.date BETWEEN DATE '{start}' AND DATE '{end}'
)
SELECT metric_name, metric_value, unit FROM (
    SELECT stack(6,
        'Treatment 승률', w.treat_rate, '%',
        '총 테스트 사용자', {fmt_users}, '명',
        '유의한 세그먼트 수', w.sig_count, '개',
        '테스트 기간', s.period, '',
        'Treatment 우세 세그먼트', w.treat_list, '',
        'Control 우세 세그먼트', w.control_list, ''
    ) AS (metric_name, metric_value, unit)
    FROM winner_stats w CROSS JOIN fact_stats s
)
"""

_register(
    "ab_test_kpi_metric",
    # format_number / ordered list-agg are the two real dialect forks.
    # nullif(..., ''): collect_list on an empty group gives [] -> '' in
    # Spark, while DuckDB's string_agg gives NULL; both must fall
    # through COALESCE to the '없음' sentinel.
    sql=_KPI_SPARK_BODY.replace("{fmt_users}", "format_number(s.test_users, 0) || ' (' || format_string('%.1f', s.test_users * 100.0 / s.total_users) || '%)'"),
    duck_sql=_KPI_BODY.replace("{fmt_users}", "format('{:,}', CAST(test_users AS BIGINT)) || ' (' || format('{:.1f}', test_users * 100.0 / total_users) || '%)'").replace(
        "{agg_list}", "string_agg(user_segment, ', ' ORDER BY user_segment)"
    ),
    doc="7-block KPI summary (ab_test_kpi_metric.sql; {start}/{end}/{min_users} "
    "parameterized; list-agg made order-deterministic).",
)

# ------------------------------------------------------ new_data_load_date.sql
_register(
    "new_data_load_date",
    sql="""
SELECT CAST(MAX(created_at) AS STRING) AS kst_time
FROM fact_user_events
""",
    doc="Latest loaded event timestamp (new_data_load_date.sql; the Trino "
    "original is ORDER BY created_at DESC LIMIT 1 with AT TIME ZONE — "
    "created_at here is already KST wall-clock NTZ, and MAX() is the "
    "same row without the full sort).",
)


def sql_for(name: str, engine: str = "spark", **params) -> str:
    """Render a query's SQL with parameters (sample-size gates, A/B
    window) merged over reference defaults."""
    q = _REGISTRY[name]
    text = q.spark_sql if engine == "spark" else q.duck_sql
    defaults: dict = {}
    if name in ("treatment_vs_control", "lift"):
        defaults = {"min_users": TREATMENT_VS_CONTROL_MIN_USERS}
    elif name == "ab_test_heatmap":
        defaults = {"min_users": AB_HEATMAP_MIN_USERS}
    elif name == "ab_test_kpi_metric":
        defaults = dict(KPI_DEFAULTS)
    defaults.update(params)
    # Explicit {key} replacement, NOT str.format: the DuckDB variant of
    # ab_test_kpi_metric contains literal format specs like {:,}.
    for k, v in defaults.items():
        text = text.replace("{" + k + "}", str(v))
    return text
