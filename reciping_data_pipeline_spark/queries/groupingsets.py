"""Segment-stack queries: UNION ALL (default) + GROUPING SETS sibling.

The reference's segment-breakdown queries (``WAU.sql``,
``events_per_time.sql``, ``pages_views.sql``,
``daily_engagement_score.sql``, ``interactions_per_dish_type.sql``)
each stack 2-4 ``UNION ALL`` blocks that re-scan the fact per block.
Spark's GROUPING SETS plans the same result as ONE scan + one Expand
feeding a single aggregation (SURVEY §2.7 U1, §7.4 #6) — but Expand
multiplies every input row by the number of grouping sets BEFORE the
exchange, so the rewrite's entire saving is the N−1 avoided scans,
which it buys with real per-row CPU.

**Measured, the scans never dominate on this engine's storage path**
(BENCH_NOTES.md): the UNION ALL forms win or tie at every point on the
grid {hot, cold-page-cache} × {sf0.1, ×30, ×300 = 30M events} —
0.48–1.08× for the one-pass forms, cold included (the regime the
rewrite targeted). So the DEFAULT form served by the catalog entries is
``union_all``; the GROUPING SETS siblings stay first-class behind
:func:`segment_stack`'s ``form`` parameter — result-identical (pinned
by ``tests/test_plans.py::test_segment_stack_default_form_is_union_all``
cross-form equivalence and by
the driver oracle history) and still the right shape where a scan is
genuinely expensive (remote object storage without page cache, far
wider stacks than these 2–3 blocks).

Catalog names keep their ``_grouping_sets`` suffix: the name identifies
the reference query family (and its correctness history), not the
physical form being served.

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

#: Serving default — the measured winner (see module docstring).
DEFAULT_FORM = "union_all"

# Shared per-family SELECT scaffolding. Both forms read the SAME base
# subquery and emit the SAME column names/types, so they are
# interchangeable to every consumer (and to the driver's hash oracle).
_WAU_BASE = (
    f"SELECT {_WEEK} AS week_start, event_type, {_AB_SEG} AS seg, user_id "
    "FROM events"
)
_EPT_BASE = (
    f"SELECT CAST(hour(ts) AS INT) AS hour, {_AB_SEG} AS seg, user_id "
    "FROM events"
)
_ENG_BASE = (
    f"SELECT CAST(weekday(ts) + 1 AS INT) AS day_of_week, {_AB_SEG} AS seg, "
    "CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS value_u FROM events"
)
# CAST floor() to DOUBLE before /100.0: Spark types the 100.0 literal
# as DECIMAL, and BIGINT/DECIMAL yields a DECIMAL column ('45.920000')
# where DuckDB emits DOUBLE.
_ENG_AVG = (
    "CAST(floor(CAST(sum(value_u) AS DOUBLE) / (10000.0 * count(*)) + 0.5) "
    "AS DOUBLE) / 100.0"
)
_PV_BASE = (
    "SELECT concat('page_', CAST(CAST(get_json_object(props, '$.k') AS INT) % 5 "
    f"AS STRING)) AS page_name, {_AB_SEG} AS seg, user_id FROM events"
)
_DISH_BASE = (
    "SELECT p.p_type AS dish_type, o.o_orderpriority AS seg, "
    "o.o_custkey, l.l_extendedprice FROM lineitem l "
    "JOIN part p ON l.l_partkey = p.p_partkey "
    "JOIN orders o ON l.l_orderkey = o.o_orderkey"
)
_DISH_REV = (
    "floor(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) "
    "AS DOUBLE) / 100.0 + 0.5)"
)

_FORMS: dict[str, dict] = {
    "wau_grouping_sets": {
        "tables": ("events",),
        "grouping_sets": f"""
            SELECT week_start,
                   CASE WHEN grouping(seg) = 0 THEN 'AB_GROUP'
                        WHEN grouping(event_type) = 0 THEN 'EVENT_TYPE'
                        ELSE 'TOTAL' END AS segment_type,
                   CASE WHEN grouping(seg) = 0 THEN seg
                        WHEN grouping(event_type) = 0 THEN event_type
                        ELSE 'ALL' END AS segment_value,
                   count(DISTINCT user_id) AS wau
            FROM ({_WAU_BASE})
            GROUP BY GROUPING SETS ((week_start), (week_start, event_type),
                                    (week_start, seg))
            """,
        "union_all": f"""
            WITH base AS ({_WAU_BASE})
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
    },
    "events_per_time_grouping_sets": {
        "tables": ("events",),
        "grouping_sets": f"""
            SELECT hour,
                   CASE WHEN grouping(seg) = 0 THEN 'AB_GROUP' ELSE 'TOTAL' END AS segment_type,
                   CASE WHEN grouping(seg) = 0 THEN seg ELSE 'ALL' END AS segment_value,
                   count(*) AS event_count,
                   count(DISTINCT user_id) AS unique_users
            FROM ({_EPT_BASE})
            GROUP BY GROUPING SETS ((hour), (hour, seg))
            """,
        "union_all": f"""
            WITH base AS ({_EPT_BASE})
            SELECT hour, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
                   count(*) AS event_count, count(DISTINCT user_id) AS unique_users
            FROM base GROUP BY hour
            UNION ALL
            SELECT hour, 'AB_GROUP', seg, count(*), count(DISTINCT user_id)
            FROM base GROUP BY hour, seg
            """,
    },
    "daily_engagement_grouping_sets": {
        "tables": ("events",),
        "grouping_sets": f"""
            SELECT day_of_week,
                   CASE WHEN grouping(seg) = 0 THEN 'AB_GROUP' ELSE 'TOTAL' END AS segment_type,
                   CASE WHEN grouping(seg) = 0 THEN seg ELSE 'ALL' END AS segment_value,
                   {_ENG_AVG} AS avg_engagement,
                   count(*) AS total_events
            FROM ({_ENG_BASE})
            GROUP BY GROUPING SETS ((day_of_week), (day_of_week, seg))
            """,
        "union_all": f"""
            WITH base AS ({_ENG_BASE})
            SELECT day_of_week, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
                   {_ENG_AVG} AS avg_engagement, count(*) AS total_events
            FROM base GROUP BY day_of_week
            UNION ALL
            SELECT day_of_week, 'AB_GROUP', seg, {_ENG_AVG}, count(*)
            FROM base GROUP BY day_of_week, seg
            """,
    },
    "pages_views_grouping_sets": {
        "tables": ("events",),
        "grouping_sets": f"""
            SELECT page_name,
                   CASE WHEN grouping(seg) = 0 THEN 'AB_GROUP' ELSE 'TOTAL' END AS segment_type,
                   CASE WHEN grouping(seg) = 0 THEN seg ELSE 'ALL' END AS segment_value,
                   count(*) AS page_views,
                   count(DISTINCT user_id) AS unique_visitors
            FROM ({_PV_BASE})
            GROUP BY GROUPING SETS ((page_name), (page_name, seg))
            """,
        "union_all": f"""
            WITH base AS ({_PV_BASE})
            SELECT page_name, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
                   count(*) AS page_views, count(DISTINCT user_id) AS unique_visitors
            FROM base GROUP BY page_name
            UNION ALL
            SELECT page_name, 'AB_GROUP', seg, count(*), count(DISTINCT user_id)
            FROM base GROUP BY page_name, seg
            """,
    },
    "dish_interactions_grouping_sets": {
        "tables": ("lineitem", "part", "orders"),
        "grouping_sets": f"""
            SELECT dish_type,
                   CASE WHEN grouping(seg) = 0 THEN 'PRIORITY' ELSE 'TOTAL' END AS segment_type,
                   CASE WHEN grouping(seg) = 0 THEN seg ELSE 'ALL' END AS segment_value,
                   count(*) AS interactions,
                   count(DISTINCT o_custkey) AS unique_customers,
                   {_DISH_REV} AS revenue_whole
            FROM ({_DISH_BASE})
            GROUP BY GROUPING SETS ((dish_type), (dish_type, seg))
            """,
        "union_all": f"""
            WITH base AS ({_DISH_BASE})
            SELECT dish_type, 'TOTAL' AS segment_type, 'ALL' AS segment_value,
                   count(*) AS interactions,
                   count(DISTINCT o_custkey) AS unique_customers,
                   {_DISH_REV} AS revenue_whole
            FROM base GROUP BY dish_type
            UNION ALL
            SELECT dish_type, 'PRIORITY', seg, count(*),
                   count(DISTINCT o_custkey), {_DISH_REV}
            FROM base GROUP BY dish_type, seg
            """,
    },
}


def segment_stack(
    spark: SparkSession, sf_dir: str, name: str, form: str | None = None
) -> DataFrame:
    """Build one segment-stack query in either physical form.

    ``form``: ``"union_all"`` (default — measured winner hot AND cold
    through ×300, see module docstring) or ``"grouping_sets"`` (one
    scan + Expand; prefer where fact scans are genuinely expensive).
    Both forms emit identical columns and results."""
    spec = _FORMS[name]
    sql = spec[form or DEFAULT_FORM]
    for t in spec["tables"]:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


def _register(name: str, oracle: str, doc: str, tags: tuple[str, ...]) -> None:
    @query(name, oracle=oracle, doc=doc, tags=tags)
    def _fn(spark: SparkSession, sf_dir: str, _name=name) -> DataFrame:
        return segment_stack(spark, sf_dir, _name)


_register(
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
    "per-AB-group weekly uniques). Served as UNION ALL (measured faster "
    "hot AND cold through x300 — BENCH_NOTES.md); the one-pass GROUPING "
    "SETS sibling stays available via segment_stack(form=...) and "
    "equivalence-pinned.",
    tags=("agg", "grouping-sets", "bench"),
)

_register(
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
    doc="events_per_time.sql's hourly TOTAL + segment stack (count + "
    "distinct users per cell). Served as UNION ALL (measured winner); "
    "GROUPING SETS sibling via segment_stack(form=...).",
    tags=("agg", "grouping-sets"),
)

_register(
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
    "ladder (AVG metric instead of counts). Served as UNION ALL "
    "(measured winner); GROUPING SETS sibling via segment_stack(). The "
    "engagement average is computed from an exact BIGINT micro-unit sum "
    "(order-invariant) then coarsened to 2 dp via floor(x*100+0.5)/100 "
    "— identical IEEE ops in both engines, unlike round() whose tie "
    "rules differ.",
    tags=("agg", "grouping-sets"),
)

_register(
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
    doc="pages_views.sql's page TOTAL + segment stack, with the page "
    "dimension derived from the JSON props payload (JSON-extracted dim "
    "+ multi-set aggregation). Served as UNION ALL (measured winner); "
    "GROUPING SETS sibling via segment_stack().",
    tags=("agg", "grouping-sets", "json"),
)

_register(
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
    doc="interactions_per_dish_type.sql's dim-join + segment stack: "
    "lineitem ⋈ part ⋈ orders with (dish_type) and (dish_type, "
    "priority) cells. Served as UNION ALL (measured winner; the CTE is "
    "still joined per block — at 100 TB prefer form='grouping_sets' if "
    "the 3-way join cost dominates the Expand). Revenue summed in "
    "exact cent units (BIGINT — order-invariant) then floored to whole "
    "currency.",
    tags=("agg", "grouping-sets", "join", "bench"),
)
