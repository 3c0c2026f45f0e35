"""Relational operator extensions beyond the reference surface.

The reference emulates multi-level breakdowns with UNION ALL rescans
and has no set ops, percentiles, range joins, or as-of joins
(SURVEY §2.4/§2.7 "not present" lists). These close that gap with the
idiomatic Spark formulation of each, DuckDB-oracled:

- ROLLUP / CUBE: one-pass hierarchical aggregates (vs N rescans);
- INTERSECT / EXCEPT: distinct-set semantics on user activity;
- exact interpolated percentiles (Spark ``percentile`` ==
  DuckDB ``quantile_cont``);
- range-predicate join (equi key + date band — the prunable band-join
  shape; a pure non-equi range join at scale gets binned first);
- as-of join via the union + last-ignoring-nulls window — the
  sort-once O(n log n) formulation that survives 100 TB, oracled
  against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table


@query(
    "lineitem_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Hierarchical totals in ONE pass via ROLLUP — the idiomatic "
    "replacement for the reference's UNION ALL segment stacking "
    "(SURVEY §2.4 'not present': grouping sets/cube/rollup).",
    tags=("agg", "rollup", "bench"),
)
def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        F.count("*").alias("n_rows"),
    ).select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
        "g_flag",
        "g_status",
        "sum_qty",
        "n_rows",
    )


@query(
    "order_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           count(*) AS order_count,
           floor(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                 / 100.0 + 0.5) / 100.0 AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="All 2^2 grouping combinations in one shuffle via CUBE. The "
    "money sum quantizes addends to the exact 1e-4 BIGINT grid "
    "(engine-wide sum-then-floor rule): at x100 (15M orders) the "
    "plain double sum's partition-order accumulation crossed a 2-dp "
    "rounding boundary vs DuckDB's scan order on the grand-total row.",
    tags=("agg", "cube"),
)
def order_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("order_count"),
        (
            F.floor(
                F.sum(
                    F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5)).cast("long")
                )
                / 100.0
                + F.lit(0.5)
            )
            / 100.0
        ).alias("revenue"),
    ).select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
        "order_count",
        "revenue",
    )


@query(
    "repeat_users_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    doc="Set INTERSECT (distinct semantics) — users who both signed up "
    "and purchased (SURVEY §2.7: no INTERSECT in reference).",
    tags=("setop",),
)
def repeat_users_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "purchase").select("user_id")
    b = ev.where(F.col("event_type") == "signup").select("user_id")
    return a.intersect(b)


@query(
    "window_shoppers_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="Set EXCEPT — viewers who never purchased (SURVEY §2.7 U2: the "
    "reference only has the left_anti equivalent).",
    tags=("setop",),
)
def window_shoppers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    viewers = ev.where(F.col("event_type") == "view").select("user_id")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id")
    return viewers.subtract(buyers)  # EXCEPT DISTINCT semantics


@query(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.50), 4) AS p50,
           round(quantile_cont(value, 0.90), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group — Spark `percentile` "
    "== DuckDB quantile_cont (SURVEY §2.4: no percentiles in reference). "
    "At 100 TB swap to approx_percentile with documented error bound.",
    tags=("agg", "percentile", "bench"),
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.90)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@query(
    "order_ship_latency_band",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS lines_in_band,
           round(avg(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))), 4) AS avg_latency_days
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
     AND CAST(l.l_shipdate AS DATE) <= CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY
    GROUP BY o.o_orderpriority
    """,
    doc="Range-predicate (band) join: equi key + date band, the shape "
    "Catalyst plans as a hash join with a post-filter — the band "
    "predicate prunes at the parquet level on the sorted ship date. "
    "(SURVEY §2.3: no range joins in reference.)",
    tags=("join", "range"),
)
def order_ship_latency_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", F.col("o_orderdate").cast("date").alias("odate"))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", F.col("l_shipdate").cast("date").alias("sdate"))
    joined = li.join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("sdate") >= F.col("odate"))
        & (F.col("sdate") <= F.date_add(F.col("odate"), 30)),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("lines_in_band"),
        F.round(F.avg(F.datediff("sdate", "odate").cast("double")), 4).alias("avg_latency_days"),
    )


@query(
    "purchase_asof_last_view",
    oracle="""
    WITH rel AS (
        SELECT user_id, ts,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS is_purchase,
               CASE WHEN event_type = 'view' THEN ts END AS view_ts,
               event_id
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    c AS (
        -- views sort before purchases at equal ts (<= semantics);
        -- max() skips NULLs, carrying the latest view time forward
        SELECT *, max(view_ts) OVER (PARTITION BY user_id
                       ORDER BY ts, is_purchase
                       ROWS UNBOUNDED PRECEDING) AS last_view_ts
        FROM rel
    )
    SELECT event_id, user_id, CAST(last_view_ts AS STRING) AS last_view_ts
    FROM c WHERE is_purchase = 1
    """,
    doc="As-of (backward) join: each purchase paired with the user's "
    "latest preceding view. Spark formulation is the union + "
    "last(ignoreNulls) window — ONE sort per user partition, no "
    "pair-wise join blowup; the oracle uses the same carried-forward "
    "window form (its old purchases×views LEFT JOIN was quadratic per "
    "user and ground to a halt on the ×300-zipf fixture — r13 skew "
    "sweep; old-vs-new oracle equivalence verified value-for-value at "
    "sf0.01). (SURVEY §2.3: no as-of joins in reference.)",
    tags=("join", "asof", "window", "bench"),
)
def purchase_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    id_type = ev.schema["event_id"].dataType
    ts_type = ev.schema["ts"].dataType
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("ts"), F.col("ts").alias("view_ts"),
        F.lit(None).cast(id_type).alias("event_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast(ts_type).alias("view_ts"), "event_id"
    )
    # Union both streams, sort once per user by (ts, is_view-first) and
    # carry the last non-null view_ts forward — views at the exact
    # purchase timestamp count as preceding (<=), so views sort first.
    unioned = views.unionByName(purchases).withColumn(
        "is_purchase", F.col("event_id").isNotNull().cast("int")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("last_view_ts", F.last("view_ts", ignorenulls=True).over(w))
    return carried.where(F.col("is_purchase") == 1).select(
        "event_id",
        "user_id",
        F.col("last_view_ts").cast("string").alias("last_view_ts"),
    )


@query(
    "daily_events_rolling",
    oracle="""
    SELECT CAST(event_date AS STRING) AS event_date,
           n_events,
           round(avg(n_events) OVER (
               ORDER BY event_date
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS avg_7d,
           CAST(sum(n_events) OVER (
               ORDER BY event_date
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_events
    FROM (
        SELECT CAST(ts AS DATE) AS event_date, CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    )
    """,
    doc="Explicit window frames (the one spec family the reference never "
    "uses — SURVEY §2.5 'defaults only'): 7-day moving average via ROWS "
    "BETWEEN, running total via RANGE UNBOUNDED. The global window runs "
    "over the already-aggregated daily series (365 rows/yr), so the "
    "single-task window stage is trivially small at any input scale.",
    tags=("window", "frames"),
)
def daily_events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count("*").alias("n_events")
    )
    w_rows = Window.orderBy("event_date").rowsBetween(-6, Window.currentRow)
    w_range = Window.orderBy("event_date").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        # ISO string on both sides: DATE round-trips ambiguously
        # through pandas in the value-hash comparison (see dau).
        F.col("event_date").cast("string").alias("event_date"),
        "n_events",
        F.round(F.avg("n_events").over(w_rows), 2).alias("avg_7d"),
        F.sum("n_events").over(w_range).alias("cum_events"),
    )


@query(
    "orders_events_full_outer",
    oracle="""
    WITH o AS (
        SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
        FROM orders GROUP BY 1
    ), e AS (
        SELECT CAST(ts AS DATE) AS d, count(*) AS n
        FROM events GROUP BY 1
    )
    SELECT CAST(coalesce(o.d, e.d) AS STRING) AS day,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(e.n, 0) AS BIGINT) AS n_events
    FROM o FULL OUTER JOIN e ON o.d = e.d
    """,
    doc="FULL OUTER reconciliation of two daily series (orders vs "
    "events) with zero-fill on both unmatched sides — the missing "
    "outer-join flavor from SURVEY §2.3's 'not present' list. Both "
    "inputs are pre-aggregated to one row per day BEFORE the join, so "
    "the full-outer shuffle is O(days), not O(rows), at any scale.",
    tags=("join", "fullouter"),
)
def orders_events_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count("*").alias("n_orders"))
    )
    e = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n_events"))
    )
    return o.join(e, on="day", how="full_outer").select(
        F.col("day").cast("string").alias("day"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


@query(
    "customer_balance_deciles",
    oracle="""
    SELECT decile,
           count(*) AS n_customers,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM (
        SELECT c_acctbal,
               ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
        FROM customer
    )
    GROUP BY decile
    """,
    doc="NTILE decile segmentation of customers by account balance "
    "with per-decile stats (deterministic tie-break on c_custkey). "
    "The global NTILE is a single-task sort — fine for dimension-sized "
    "inputs; a 100 TB fact-side version computes approx-quantile cut "
    "points first and broadcasts them instead.",
    tags=("window", "ntile"),
)
def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        c.select("c_acctbal", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


@query(
    "nation_metrics_unpivot",
    oracle="""
    WITH base AS (
        SELECT n.n_name,
               count(*) AS n_customers,
               round(sum(c.c_acctbal), 2) AS total_acctbal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    SELECT n_name, 'n_customers' AS metric, CAST(n_customers AS DOUBLE) AS value
    FROM base
    UNION ALL
    SELECT n_name, 'total_acctbal' AS metric, total_acctbal AS value
    FROM base
    """,
    doc="UNPIVOT via stack(): wide per-nation metrics melted to long "
    "(nation, metric, value) rows in one generator projection — no "
    "rescan per metric (the oracle states it as the UNION ALL it "
    "replaces). The inverse of the reference's MAX(CASE) pivots.",
    tags=("unpivot", "setop"),
)
def nation_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    base = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )
    return base.selectExpr(
        "n_name",
        "stack(2, 'n_customers', CAST(n_customers AS DOUBLE), "
        "'total_acctbal', total_acctbal) AS (metric, value)",
    )


@query(
    "order_priority_profile",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           bool_or(o_totalprice > 400000) AS any_jumbo,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Boolean-aggregate profile per order priority: COUNT_IF and "
    "BOOL_OR (aggregates absent from the reference, which emulates "
    "them with SUM(CASE)) plus plain avg — one map-side-combinable "
    "shuffle.",
    tags=("agg", "countif"),
)
def order_priority_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


@query(
    "user_event_span",
    oracle="""
    SELECT user_id, first_et, last_et, n_events, span_seconds
    FROM (
        SELECT user_id,
               first_value(event_type) OVER w AS first_et,
               last_value(event_type) OVER w AS last_et,
               CAST(count(*) OVER w AS BIGINT) AS n_events,
               CAST(date_diff('second',
                   first_value(ts) OVER w, last_value(ts) OVER w) AS BIGINT)
                   AS span_seconds,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    WHERE rn = 1
    """,
    doc="FIRST_VALUE / LAST_VALUE over an explicit full-partition frame "
    "(the default frame stops at CURRENT ROW, a classic silent-wrong "
    "trap): each user's first and last event type plus activity span. "
    "One user-keyed sort services all four window functions.",
    tags=("window", "frames"),
)
def user_event_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    rn_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    span = (
        F.unix_timestamp(F.last("ts").over(full)) - F.unix_timestamp(F.first("ts").over(full))
    ).cast("bigint")
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(full).alias("first_et"),
            F.last("event_type").over(full).alias("last_et"),
            F.count("*").over(full).alias("n_events"),
            span.alias("span_seconds"),
            F.row_number().over(rn_w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "event_type_date_grid",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
        SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT CAST(d.day AS STRING) AS day, t.event_type,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
    FROM days d
    CROSS JOIN types t
    LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
    """,
    doc="CROSS JOIN densification: the full day x event-type grid with "
    "zero-filled counts — the gap-free series every dashboard needs "
    "(SURVEY §2.3 'not present': cross joins). Both cross-join inputs "
    "are tiny distinct sets, so Catalyst broadcasts; the fact table is "
    "reduced before the left join.",
    tags=("join", "cross"),
)
def event_type_date_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    types = ev.select("event_type").distinct()
    counts = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count("*").alias("n")
    )
    return (
        days.crossJoin(F.broadcast(types))
        .join(counts, on=["day", "event_type"], how="left")
        .select(
            F.col("day").cast("string").alias("day"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


@query(
    "order_value_percentile_rank",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0 AS pct_rank,
           floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000.0 AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    doc="PERCENT_RANK + CUME_DIST: each order's value percentile within "
    "its priority class (unique o_orderkey tie-break makes ranks "
    "deterministic). One sort per priority partition services both "
    "functions; at 100 TB the partition key keeps window state "
    "executor-local. 6-dp coarsening uses floor(x*1e6+0.5) on both "
    "engines: k/n ratios at x100 partition sizes produce systematic "
    ".xxxxxx5 ties where Spark's decimal HALF_UP and DuckDB's "
    "binary-value round() disagree on identical doubles.",
    tags=("window", "rank"),
)
def order_value_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        (F.floor(F.percent_rank().over(w) * 1000000 + F.lit(0.5)) / 1000000.0).alias(
            "pct_rank"
        ),
        (F.floor(F.cume_dist().over(w) * 1000000 + F.lit(0.5)) / 1000000.0).alias(
            "cume"
        ),
    )


@query(
    "top2_lineitems_lateral",
    oracle="""
    SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
    FROM orders o,
    LATERAL (
        SELECT l_linenumber, l_extendedprice
        FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
        ORDER BY l_extendedprice DESC, l_linenumber
        LIMIT 2
    ) t
    WHERE o.o_orderkey % 100 = 0
    """,
    doc="LATERAL correlated subquery: the two priciest lineitems per "
    "order (deterministic price-desc/linenumber tie-break) over a "
    "keyed order subset. Catalyst decorrelates the lateral into a "
    "ranked join, so the per-order LIMIT never executes row-at-a-time; "
    "same SQL runs verbatim on DuckDB.",
    tags=("join", "lateral"),
)
def top2_lineitems_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_lat_lineitem")
    return spark.sql("""
        SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
        FROM _lat_orders o,
        LATERAL (
            SELECT l_linenumber, l_extendedprice
            FROM _lat_lineitem l
            WHERE l.l_orderkey = o.o_orderkey
            ORDER BY l_extendedprice DESC, l_linenumber
            LIMIT 2
        ) t
        WHERE o.o_orderkey % 100 = 0
    """)


# ---------------------------------------------------------------------------
# One-pass table profiling (operators/profiling.py)

_PROFILE_SPECS: list[tuple[str, str]] = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "varchar"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp"),
    ("o_orderpriority", "varchar"),
]


def _profile_repr_sql(name: str, kind: str) -> str:
    if kind == "double":
        return f"CAST(floor({name} * 100 + 0.5) AS BIGINT)"
    if kind == "timestamp":
        return f"CAST({name} AS DATE)"
    return name


_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS col_name,
           COUNT(*) AS n_rows,
           COUNT({_profile_repr_sql(name, kind)}) AS non_null,
           COUNT(DISTINCT {_profile_repr_sql(name, kind)}) AS ndv,
           CAST(MIN({_profile_repr_sql(name, kind)}) AS VARCHAR) AS min_repr,
           CAST(MAX({_profile_repr_sql(name, kind)}) AS VARCHAR) AS max_repr
    FROM orders"""
    for name, kind in _PROFILE_SPECS
)


@query(
    "orders_profile",
    oracle=_PROFILE_ORACLE,
    doc="One-pass data-quality profile of the orders table: rows, "
    "non-null count, EXACT distinct count, min and max for every "
    "column from a SINGLE scan — Spark plans the six distinct "
    "aggregates with one Expand over one pass, where the naive "
    "profiler (and the oracle, for contrast) scans once per column. "
    "At 100 TB that is the difference between 1 scan and N scans of "
    "the fact table (same economics as the GROUPING SETS rewrite, "
    "BENCH_NOTES.md). Representation contract: doubles are profiled "
    "on the integer-cents grid and date-stamped timestamps on the "
    "DATE grid, because those casts are byte-identical across "
    "engines while raw float/timestamp formatting is not "
    "(operators/profiling.py). The oracle is GENERATED from the same "
    "column-spec table the Spark side consumes.",
    tags=("relational", "quality", "profiling"),
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reciping_data_pipeline_spark.operators.profiling import profile_columns

    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(orders, _PROFILE_SPECS)
