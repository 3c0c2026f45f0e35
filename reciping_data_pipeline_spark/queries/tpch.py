"""Relational operator coverage on the TPC-H-ish testdata tables.

Each query exercises a block of the SURVEY.md §2 operator inventory
(aggregations A1-A8, joins J1-J9, windows W1-W5, set ops U1-U2, sorts
O1-O3) re-expressed as idiomatic DataFrame plans. Reference citations
point at the behavior being covered (e.g. ``sql_queries/DAU.sql``),
not code being copied.

Scale notes: dimension tables (region/nation/customer/part/supplier)
are broadcast explicitly so fact-side scans never shuffle for star
joins; aggregations rely on partial (map-side) aggregation + AQE
coalescing; top-k compiles to TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0
                                                                       AS sum_base_price,
           floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                          AS BIGINT)) / 100.0 + 0.5) / 100.0           AS sum_disc_price,
           floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                                * 1000000 + 0.5) AS BIGINT)) / 10000.0 + 0.5) / 100.0
                                                                       AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped scan+filter+agg (SURVEY §2.4 A1/A5; pushdown P5/P6). "
    "Money sums use the engine-wide exact-grid BIGINT form (1e-2 for the "
    "2-dp base price, 1e-4 for disc_price, 1e-6 for charge — each grid "
    "captures its expression's full decimal width exactly): at ~10M "
    "addends per group the double sum's magnitude (~4e11) has ulp "
    "comparable to the cent boundary, so partition-order vs scan-order "
    "accumulation is a coin flip away from a 2-dp mismatch. Quantity "
    "sums are integer-valued doubles (exact to 2^53) and averages stay "
    "at addend magnitude — both safe as-is.",
    tags=("agg", "filter", "bench"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            (
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
                )
                / 100.0
            ).alias("sum_base_price"),
            (
                F.floor(
                    F.sum(F.floor(disc_price * 10000 + F.lit(0.5)).cast("long"))
                    / 100.0
                    + F.lit(0.5)
                )
                / 100.0
            ).alias("sum_disc_price"),
            (
                # decimal(38,0) sum, not long: the 1e-6-grid addends are
                # ~1e11 units each, so a group's int64 sum has only ~20x
                # headroom past x100 (6e18 max vs ~4e17 measured) and
                # Spark's non-ANSI long SUM would WRAP silently where
                # DuckDB promotes to HUGEINT — a silent cross-engine
                # divergence on the stated >x100 trajectory (ADVICE
                # r11). decimal(38,0) sums exactly to 1e38; the final
                # /1e4 division casts to double on both engines from
                # the SAME exact integer. The 1e-2/1e-4 grids keep long
                # sums: their addends are 1e4x smaller (>=2000x
                # headroom at x100, overflow at ~x200k).
                F.floor(
                    F.sum(
                        F.floor(
                            disc_price * (1 + F.col("l_tax")) * 1000000 + F.lit(0.5)
                        ).cast("decimal(38,0)")
                    ).cast("double")
                    / 10000.0
                    + F.lit(0.5)
                )
                / 100.0
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "revenue_by_nation",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           floor(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5)
               / 100.0 AS revenue,
           count(DISTINCT o.o_custkey) AS unique_customers
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="Star join fact->4 dims w/ broadcast (SURVEY §2.3 J6, §2.4 A2).",
    tags=("join", "agg", "bench"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            (
                F.floor(
                    F.sum(
                        F.floor(
                            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                            + F.lit(0.5)
                        ).cast("long")
                    )
                    / 100.0
                    + F.lit(0.5)
                )
                / 100.0
            ).alias("revenue"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="LEFT ANTI join — the reference's new-user detection pattern "
    "(replay_silver_to_gold.py:226-231; SURVEY §2.3 J5, §2.7 U2).",
    tags=("join",),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "priority_with_late_lines",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderpriority
    """,
    doc="EXISTS semi join + agg (TPC-H Q4 shape; SURVEY §2.3 J9 IN-subquery semi).",
    tags=("join", "agg"),
)
def priority_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late_orders = orders.join(
        li.where(F.col("l_shipdate").isNotNull()),
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late_orders.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "top_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, part_rank
    FROM (
        SELECT p_brand, p_partkey, p_name, p_retailprice,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS part_rank
        FROM part
    )
    WHERE part_rank <= 3
    """,
    doc="row_number ranking per group — SCD1 latest-wins shape "
    "(create_dims.py:67-74; SURVEY §2.5 W1).",
    tags=("window",),
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("part_rank", F.row_number().over(w))
        .where(F.col("part_rank") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "part_rank")
    )


@query(
    "monthly_revenue_growth",
    oracle="""
    WITH monthly AS (
        SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS STRING) AS order_month,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
        FROM orders GROUP BY 1
    )
    SELECT order_month, revenue,
           prev_revenue,
           floor(100.0 * (revenue - prev_revenue) / nullif(prev_revenue, 0)
                 * 10000 + 0.5) / 10000.0 AS growth_pct
    FROM (
        SELECT order_month, revenue,
               lag(revenue) OVER (ORDER BY order_month) AS prev_revenue
        FROM monthly
    )
    WHERE prev_revenue IS NOT NULL
    """,
    doc="LAG window over time series — WoW growth shape (WAU.sql:56-61; SURVEY §2.5 W3).",
    tags=("window", "agg"),
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # ISO-string month key: DATE round-trips ambiguously through pandas
    # between Spark and DuckDB, breaking stringified value-hash compare.
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("order_month")
    ).agg(
        (
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            / 100.0
        ).alias("revenue")
    )
    w = Window.orderBy("order_month")
    prev = F.lag("revenue").over(w)
    # First month dropped: no prior period means NULL outputs, which
    # round-trip inconsistently through pandas (see SKILL.md).
    return (
        monthly.select("order_month", "revenue", prev.alias("_prev"))
        .where(F.col("_prev").isNotNull())
        .select(
            "order_month",
            "revenue",
            F.col("_prev").alias("prev_revenue"),
            (
                F.floor(
                    100.0
                    * (F.col("revenue") - F.col("_prev"))
                    / F.nullif(F.col("_prev"), F.lit(0))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("growth_pct"),
        )
    )


@query(
    "priority_share_by_month",
    oracle="""
    SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS STRING) AS order_month,
           o_orderpriority,
           count(*) AS order_count,
           round(count(*) * 100.0 / sum(count(*)) OVER (PARTITION BY date_trunc('month', o_orderdate)), 4)
               AS share_pct
    FROM orders
    GROUP BY date_trunc('month', o_orderdate), o_orderpriority
    """,
    doc="Aggregate-over-window share-of-total (daily_events.sql:9; SURVEY §2.5 W4).",
    tags=("window", "agg"),
)
def priority_share_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("order_month"),
        "o_orderpriority",
    ).agg(F.count("*").alias("order_count"))
    w = Window.partitionBy("order_month")
    return agg.select(
        "order_month",
        "o_orderpriority",
        "order_count",
        F.round(F.col("order_count") * 100.0 / F.sum("order_count").over(w), 4).alias("share_pct"),
    )


@query(
    "order_segment_breakdown",
    oracle="""
    SELECT CASE WHEN o_orderstatus IS NOT NULL THEN 'status'
                WHEN o_orderpriority IS NOT NULL THEN 'priority'
                ELSE 'TOTAL' END AS segment_type,
           coalesce(o_orderstatus, o_orderpriority, 'TOTAL') AS segment_value,
           count(*) AS order_count,
           floor(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                 / 100.0 + 0.5) / 100.0 AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="GROUPING SETS — one-shuffle replacement for the reference's "
    "4-block UNION ALL segment stacking (DAU.sql:15-52; SURVEY §2.7 U1).",
    tags=("agg", "grouping-sets"),
)
def order_segment_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT CASE WHEN o_orderstatus IS NOT NULL THEN 'status'
                    WHEN o_orderpriority IS NOT NULL THEN 'priority'
                    ELSE 'TOTAL' END AS segment_type,
               coalesce(o_orderstatus, o_orderpriority, 'TOTAL') AS segment_value,
               count(*) AS order_count,
               floor(sum(CAST(floor(o_totalprice * 10000 + 0.5D) AS BIGINT))
                 / 100.0D + 0.5D) / 100.0D AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    doc="Latest-row-per-key dedup — SCD Type 1 upsert semantics "
    "(create_dims.py:67-75; SURVEY §2.2 P7).",
    tags=("window", "dedup"),
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "nation_balance_heatmap",
    oracle="""
    WITH per_nation AS (
        SELECT n.n_name AS nation_name, round(sum(c.c_acctbal), 2) AS total_balance
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    SELECT nation_name, total_balance,
           round((total_balance - min(total_balance) OVER ())
                 / nullif(max(total_balance) OVER () - min(total_balance) OVER (), 0), 4)
               AS intensity
    FROM per_nation
    """,
    doc="Global min/max normalization over empty window frame "
    "(time_x_day_events_heatmap.sql:33-36; SURVEY §2.5 W5).",
    tags=("window",),
)
def nation_balance_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    per_nation = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("total_balance"))
    )
    w = Window.partitionBy()
    mn, mx = F.min("total_balance").over(w), F.max("total_balance").over(w)
    return per_nation.select(
        "nation_name",
        "total_balance",
        F.round((F.col("total_balance") - mn) / F.nullif(mx - mn, F.lit(0)), 4).alias("intensity"),
    )


@query(
    "top10_parts_by_revenue",
    oracle="""
    SELECT p.p_partkey, p.p_name, p.p_brand,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name, p.p_brand
    ORDER BY revenue DESC, p.p_partkey
    LIMIT 10
    """,
    doc="Top-K: agg then TakeOrderedAndProject — no global sort "
    "(top_10_clicked_recipe.sql; SURVEY §2.6 O2).",
    tags=("topk", "join", "agg", "bench"),
)
def top10_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "p_brand")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(10)
    )


@query(
    "market_segment_pivot",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(sum(CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS automobile,
           CAST(sum(CASE WHEN c.c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END) AS BIGINT) AS building,
           CAST(sum(CASE WHEN c.c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END) AS BIGINT) AS furniture,
           CAST(sum(CASE WHEN c.c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END) AS BIGINT) AS household,
           CAST(sum(CASE WHEN c.c_mktsegment = 'MACHINERY'  THEN 1 ELSE 0 END) AS BIGINT) AS machinery
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Pivot via fixed value list (ab_test_kpi_metric.sql:22-29 MAX(CASE) "
    "pivot; SURVEY §2.4 A8). Explicit values keep the plan single-pass.",
    tags=("agg", "pivot"),
)
def market_segment_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    pivoted = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .pivot("c_mktsegment", segments)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [s for s in segments])
    )
    return pivoted.select(
        "nation_name", *[F.col(s).alias(s.lower()) for s in segments]
    )


@query(
    "small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part_avg p ON l.l_partkey = p.l_partkey
    WHERE l.l_quantity < p.half_avg_qty
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery decorrelated into a "
    "per-key aggregate + join — the formulation Catalyst needs (a true "
    "correlated subquery re-executes per row on engines without "
    "decorrelation). SURVEY §2.4 A10.",
    tags=("join", "agg", "subquery"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    joined = li.join(part_avg, on="l_partkey").where(F.col("l_quantity") < F.col("half_avg_qty"))
    return joined.agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))


@query(
    "promo_revenue_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    """,
    doc="TPC-H Q14 shape: conditional-aggregate share with LIKE-prefix "
    "predicate inside the aggregate (SURVEY §2.4 A4).",
    tags=("join", "agg"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct"))
    )


@query(
    "top_returning_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
           floor(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5)
               / 100.0 AS revenue_lost
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_lost DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: 3-way fact join + filtered top-k by aggregated "
    "measure (SURVEY §2.3 J6, §2.6 O2; custkey tiebreak for determinism). "
    "The money sum quantizes addends to the exact 1e-4 grid and sums "
    "BIGINT (order-invariant): at x30 the plain double sum landed on a "
    "cent boundary and Spark's partition-order accumulation rounded a "
    "different way than DuckDB's scan order.",
    tags=("join", "agg", "topk", "bench"),
)
def top_returning_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(
            (
                F.floor(
                    F.sum(F.floor(rev * 10000 + F.lit(0.5)).cast("long")) / 100.0
                    + F.lit(0.5)
                )
                / 100.0
            ).alias("revenue_lost")
        )
        .orderBy(F.desc("revenue_lost"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "nation_pair_trade_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name <> sn.n_name
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (volume shipping): bilateral trade between two "
    "nations by year — a 5-dim star join where every dim side "
    "broadcasts and the nation predicates prune before aggregation "
    "(/root/reference has no multi-nation join query; SURVEY §2.3 J6 "
    "extension).",
    tags=("join", "agg", "tpch"),
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nations = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    cn = F.broadcast(
        nations.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    )
    sn = F.broadcast(
        nations.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cnk"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("snk"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(rev), 2).alias("revenue"),
        )
    )


@query(
    "region_market_share_by_year",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue,
           round(sum(CASE WHEN sr.r_name = 'ASIA'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS local_supplier_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region cr  ON cn.n_regionkey = cr.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN region sr  ON sn.n_regionkey = sr.r_regionkey
    WHERE cr.r_name = 'ASIA'
    GROUP BY 1
    """,
    doc="TPC-H Q8 shape (market share): for ASIA customers, the share of "
    "spend fulfilled by ASIA suppliers per year — conditional share "
    "inside ONE aggregation (no self-join / rescan), snowflake dims "
    "(nation→region) all broadcast.",
    tags=("join", "agg", "tpch"),
)
def region_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # snowflake: resolve nation -> region name once, broadcast both maps
    nr = n.join(r, n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", F.col("r_name").alias("region_name")
    )
    cnr = F.broadcast(
        nr.select(F.col("n_nationkey").alias("cnk"), F.col("region_name").alias("cust_region"))
    )
    snr = F.broadcast(
        nr.select(F.col("n_nationkey").alias("snk"), F.col("region_name").alias("supp_region"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    local = F.when(F.col("supp_region") == "ASIA", rev).otherwise(F.lit(0.0))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(cnr, F.col("c_nationkey") == F.col("cnk"))
        .where(F.col("cust_region") == "ASIA")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(snr, F.col("s_nationkey") == F.col("snk"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.round(F.sum(local) / F.sum(rev), 4).alias("local_supplier_share"),
        )
    )


@query(
    "part_type_margin_by_year",
    oracle="""
    SELECT p.p_type AS part_type,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_lines,
           floor(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)
                                 - p.p_retailprice * l.l_quantity * 0.8)
                                * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5)
               / 100.0 AS margin_proxy
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p   ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product profit by year): discounted revenue minus "
    "a retail-price-derived cost proxy (the schema carries no "
    "ps_supplycost), grouped by part type and order year — fact-to-fact "
    "join on orderkey plus a broadcast part dim. The margin sum uses the "
    "engine-wide 1e-4 exact-grid BIGINT form (per-row margin doubles are "
    "bit-identical across engines; only the SUM's accumulation order "
    "differs — x100 landed a group on a cent boundary).",
    tags=("join", "agg", "tpch"),
)
def part_type_margin_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    margin = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.8
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("part_type"), F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count("*").alias("n_lines"),
            (
                F.floor(
                    F.sum(F.floor(margin * 10000 + F.lit(0.5)).cast("long")) / 100.0
                    + F.lit(0.5)
                )
                / 100.0
            ).alias("margin_proxy"),
        )
    )
