"""One-pass GROUPING SETS siblings of the reference's UNION ALL stacks.

The reference's segment-breakdown queries (``WAU.sql``,
``events_per_time.sql``, ``pages_views.sql``,
``daily_engagement_score.sql``, ``interactions_per_dish_type.sql``)
each stack 2-4 ``UNION ALL`` blocks that RE-SCAN the fact per block —
at 100 TB that's 2-4 full fact scans for one dashboard tile. Spark's
GROUPING SETS plans the same result as ONE scan + one Expand feeding a
single aggregation (SURVEY §2.7 U1, §7.4 #6); ``dau_segment_breakdown``
proved the motif in r01, these five finish the family. The faithful
UNION ALL variants stay registered for reference parity
(``pipeline/analytics.py``); each sibling here is ORACLED AGAINST ITS
UNION ALL FORM in DuckDB, so the driver hash asserts the rewrite is
result-identical, and ``tests/test_plans.py`` gates the one-scan/no-
Union plan shape.

Segment derivations are deterministic column expressions both engines
compute identically (the sf ``events`` table has no user dim, so the
AB segment derives from ``user_id % 3`` — same integer arithmetic
everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table

_AB_SEG = (
    "CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'control' "
    "WHEN 1 THEN 'variant_a' ELSE 'variant_b' END"
)
_WEEK = "CAST(CAST(date_trunc('week', ts) AS DATE) AS STRING)"


def _run_sql(spark: SparkSession, sf_dir: str, sql: str, tables: tuple[str, ...] = ("events",)) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


@query(
    "wau_grouping_sets",
    oracle=f"""
    WITH base AS (
        SELECT {_WEEK} AS week_start, event_type, {_AB_SEG} AS seg, user_id
        FROM events
    )
    SELECT week_start, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
           count(DISTINCT user_id) AS wau
    FROM base GROUP BY week_start
    UNION ALL
    SELECT week_start, 'EVENT_TYPE', event_type, count(DISTINCT user_id)
    FROM base GROUP BY week_start, event_type
    UNION ALL
    SELECT week_start, 'AB_GROUP', seg, count(DISTINCT user_id)
    FROM base GROUP BY week_start, seg
    """,
    doc="WAU.sql's 3-block segment stack (TOTAL / per-event-type / "
    "per-AB-group weekly uniques) as ONE GROUPING SETS pass: one fact "
    "scan + Expand instead of three scans. Oracle = the faithful UNION "
    "ALL form, so the hash proves the rewrite result-identical.",
    tags=("agg", "grouping-sets", "bench"),
)
def wau_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_sql(
        spark,
        sf_dir,
        f"""
        SELECT week_start,
               CASE WHEN grouping(seg) = 0 THEN 'AB_GROUP'
                    WHEN grouping(event_type) = 0 THEN 'EVENT_TYPE'
                    ELSE 'TOTAL' END AS segment_type,
               CASE WHEN grouping(seg) = 0 THEN seg
                    WHEN grouping(event_type) = 0 THEN event_type
                    ELSE 'ALL' END AS segment_value,
               count(DISTINCT user_id) AS wau
        FROM (SELECT {_WEEK} AS week_start, event_type, {_AB_SEG} AS seg, user_id
              FROM events)
        GROUP BY GROUPING SETS ((week_start), (week_start, event_type),
                                (week_start, seg))
        """,
    )


@query(
    "events_per_time_grouping_sets",
    oracle=f"""
    WITH base AS (
        SELECT CAST(hour(ts) AS INT) AS hour, {_AB_SEG} AS seg, user_id
        FROM events
    )
    SELECT hour, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
           CAST(count(*) AS BIGINT) AS event_count,
           count(DISTINCT user_id) AS unique_users
    FROM base GROUP BY hour
    UNION ALL
    SELECT hour, 'AB_GROUP', seg, CAST(count(*) AS BIGINT),
           count(DISTINCT user_id)
    FROM base GROUP BY hour, seg
    """,
    doc="events_per_time.sql's hourly TOTAL + segment stack as one "
    "GROUPING SETS pass (count + distinct users per cell); oracle is "
    "the UNION ALL form.",
    tags=("agg", "grouping-sets"),
)
def events_per_time_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_sql(
        spark,
        sf_dir,
        f"""
        SELECT hour,
               CASE WHEN grouping(seg) = 0 THEN 'AB_GROUP' ELSE 'TOTAL' END AS segment_type,
               CASE WHEN grouping(seg) = 0 THEN seg ELSE 'ALL' END AS segment_value,
               count(*) AS event_count,
               count(DISTINCT user_id) AS unique_users
        FROM (SELECT CAST(hour(ts) AS INT) AS hour, {_AB_SEG} AS seg, user_id
              FROM events)
        GROUP BY GROUPING SETS ((hour), (hour, seg))
        """,
    )


@query(
    "daily_engagement_grouping_sets",
    oracle=f"""
    WITH base AS (
        SELECT CAST(isodow(ts) AS INT) AS day_of_week, {_AB_SEG} AS seg,
               -- quantize to integer micro-units so the sum is a BIGINT
               -- (order-invariant across partitions); double summation
               -- order + engine round() tie rules otherwise make the
               -- 2-dp hash flake with partition count.
               CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS value_u
        FROM events
    )
    SELECT day_of_week, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
           floor(CAST(sum(value_u) AS DOUBLE) / (10000.0 * count(*)) + 0.5)
               / 100.0 AS avg_engagement,
           CAST(count(*) AS BIGINT) AS total_events
    FROM base GROUP BY day_of_week
    UNION ALL
    SELECT day_of_week, 'AB_GROUP', seg,
           floor(CAST(sum(value_u) AS DOUBLE) / (10000.0 * count(*)) + 0.5)
               / 100.0,
           CAST(count(*) AS BIGINT)
    FROM base GROUP BY day_of_week, seg
    """,
    doc="daily_engagement_score.sql's weekday TOTAL + segment AVG "
    "ladder as one GROUPING SETS pass (AVG metric instead of counts); "
    "oracle is the UNION ALL form. The engagement average is computed "
    "from an exact BIGINT micro-unit sum (order-invariant) then "
    "coarsened to 2 dp via floor(x*100+0.5)/100 — identical IEEE ops "
    "in both engines, unlike round() whose tie rules differ.",
    tags=("agg", "grouping-sets"),
)
def daily_engagement_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_sql(
        spark,
        sf_dir,
        f"""
        SELECT day_of_week,
               CASE WHEN grouping(seg) = 0 THEN 'AB_GROUP' ELSE 'TOTAL' END AS segment_type,
               CASE WHEN grouping(seg) = 0 THEN seg ELSE 'ALL' END AS segment_value,
               -- CAST floor() to DOUBLE before /100.0: Spark types the
               -- 100.0 literal as DECIMAL, and BIGINT/DECIMAL yields a
               -- DECIMAL column ('45.920000') where DuckDB emits DOUBLE.
               CAST(floor(CAST(sum(value_u) AS DOUBLE) / (10000.0 * count(*)) + 0.5)
                    AS DOUBLE) / 100.0 AS avg_engagement,
               count(*) AS total_events
        FROM (SELECT CAST(weekday(ts) + 1 AS INT) AS day_of_week, {_AB_SEG} AS seg,
                     CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS value_u
              FROM events)
        GROUP BY GROUPING SETS ((day_of_week), (day_of_week, seg))
        """,
    )


@query(
    "pages_views_grouping_sets",
    oracle=f"""
    WITH base AS (
        SELECT 'page_' || CAST(CAST(json_extract(props, '$.k') AS INT) % 5
                               AS VARCHAR) AS page_name,
               {_AB_SEG} AS seg, user_id
        FROM events
    )
    SELECT page_name, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
           CAST(count(*) AS BIGINT) AS page_views,
           count(DISTINCT user_id) AS unique_visitors
    FROM base GROUP BY page_name
    UNION ALL
    SELECT page_name, 'AB_GROUP', seg, CAST(count(*) AS BIGINT),
           count(DISTINCT user_id)
    FROM base GROUP BY page_name, seg
    """,
    doc="pages_views.sql's page TOTAL + segment stack as one GROUPING "
    "SETS pass, with the page dimension derived from the JSON props "
    "payload (JSON-extracted dim + multi-set aggregation in one scan); "
    "oracle is the UNION ALL form.",
    tags=("agg", "grouping-sets", "json"),
)
def pages_views_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_sql(
        spark,
        sf_dir,
        f"""
        SELECT page_name,
               CASE WHEN grouping(seg) = 0 THEN 'AB_GROUP' ELSE 'TOTAL' END AS segment_type,
               CASE WHEN grouping(seg) = 0 THEN seg ELSE 'ALL' END AS segment_value,
               count(*) AS page_views,
               count(DISTINCT user_id) AS unique_visitors
        FROM (SELECT concat('page_', CAST(CAST(get_json_object(props, '$.k') AS INT) % 5 AS STRING)) AS page_name,
                     {_AB_SEG} AS seg, user_id
              FROM events)
        GROUP BY GROUPING SETS ((page_name), (page_name, seg))
        """,
    )


@query(
    "dish_interactions_grouping_sets",
    oracle="""
    WITH base AS (
        SELECT p.p_type AS dish_type, o.o_orderpriority AS seg,
               o.o_custkey, l.l_extendedprice
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT dish_type, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
           CAST(count(*) AS BIGINT) AS interactions,
           count(DISTINCT o_custkey) AS unique_customers,
           -- outer CAST to BIGINT: DuckDB floor() returns DOUBLE while
           -- Spark's floor() returns BIGINT; the driver's typed hash
           -- treats 85 vs 85.0 as a mismatch even when values agree
           -- (this was the r06 driver red — a type bug, not FP drift).
           CAST(floor(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100.0 + 0.5) AS BIGINT) AS revenue_whole
    FROM base GROUP BY dish_type
    UNION ALL
    SELECT dish_type, 'PRIORITY', seg, CAST(count(*) AS BIGINT),
           count(DISTINCT o_custkey),
           CAST(floor(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100.0 + 0.5) AS BIGINT)
    FROM base GROUP BY dish_type, seg
    """,
    doc="interactions_per_dish_type.sql's dim-join + segment stack as "
    "one GROUPING SETS pass: lineitem ⋈ part ⋈ orders joined ONCE, "
    "then (dish_type) and (dish_type, priority) aggregated from the "
    "single joined scan — the reference re-runs the whole 3-way join "
    "per UNION block. Revenue summed in exact cent units (BIGINT — "
    "order-invariant) then floored to whole currency. Oracle is the "
    "UNION ALL form.",
    tags=("agg", "grouping-sets", "join", "bench"),
)
def dish_interactions_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_sql(
        spark,
        sf_dir,
        """
        SELECT dish_type,
               CASE WHEN grouping(seg) = 0 THEN 'PRIORITY' ELSE 'TOTAL' END AS segment_type,
               CASE WHEN grouping(seg) = 0 THEN seg ELSE 'ALL' END AS segment_value,
               count(*) AS interactions,
               count(DISTINCT o_custkey) AS unique_customers,
               floor(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                          AS DOUBLE) / 100.0 + 0.5) AS revenue_whole
        FROM (
            SELECT p.p_type AS dish_type, o.o_orderpriority AS seg,
                   o.o_custkey, l.l_extendedprice
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        GROUP BY GROUPING SETS ((dish_type), (dish_type, seg))
        """,
        tables=("lineitem", "part", "orders"),
    )
