"""Subquery-heavy relational shapes (TPC-H Q13/Q15/Q16/Q18/Q22-like)
plus approximate-aggregate scale paths.

The reference's analytics layer uses scalar subqueries, IN-subqueries
and HAVING gates (SURVEY §2.4 A7/A10, §2.3 J9 — e.g.
``sql_queries/ab_test_kpi_metric.sql:70``, ``top_10_interactions_
per_events.sql:11-23``); these queries exercise the remaining classic
decision-support subquery shapes the reference doesn't reach:
agg-of-agg over an outer join, scalar-max selection over a derived
aggregate, NOT-IN exclusion, HAVING-gated semi join, and
scalar-average + anti-join composition.

Scale notes:
- scalar subqueries are computed as 1-row DataFrames and broadcast
  into a cross join — never ``.collect()``-ed to the driver, so the
  plan stays whole-cluster and re-optimizable by AQE;
- NOT IN / NOT EXISTS become ``left_anti`` joins with broadcast of the
  (small) exclusion side;
- the approximate variants (HyperLogLog++ distinct, t-digest-style
  percentiles) are the 100 TB path where exact distinct/percentile
  shuffles all keys: one pass, mergeable partial sketches, no
  key-explosion shuffle. They carry no DuckDB oracle (different
  estimators); accuracy vs exact is pinned by tests/test_approx.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table


@query(
    "custdist_by_order_count",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13-shaped agg-of-agg over an outer join with a predicate "
    "inside the join condition (customers by order count, incl. zero).",
    tags=("join", "agg", "subquery"),
)
def custdist_by_order_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left_outer",
        )
        .groupBy(cust["c_custkey"])
        .agg(F.count(orders["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "top_supplier_revenue",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15-shaped: derived per-supplier revenue, scalar-max "
    "selection kept distributed (broadcast 1-row max, no collect).",
    tags=("join", "agg", "subquery"),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "parts_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    """,
    doc="TPC-H Q16-shaped: NOT-IN supplier exclusion (left_anti vs "
    "broadcast exclusion set) + distinct-count by part attributes.",
    tags=("join", "agg", "subquery"),
)
def parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    excluded = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(excluded), li["l_suppkey"] == excluded["s_suppkey"], "left_anti")
        .join(F.broadcast(part.where(F.col("p_size") <= 10)), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "big_order_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey
    """,
    doc="TPC-H Q18-shaped: HAVING-gated IN-subquery (semi join on an "
    "aggregated key set) feeding a 3-way star agg.",
    tags=("join", "agg", "subquery", "bench"),
)
def big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big_keys = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("_qty")).where(F.col("_qty") > 250)
    ).select("l_orderkey")
    return (
        orders.join(big_keys, orders["o_orderkey"] == big_keys["l_orderkey"], "left_semi")
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@query(
    "high_balance_no_urgent_orders",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY n.n_name
    """,
    doc="TPC-H Q22-shaped: scalar-average subquery (broadcast 1-row "
    "cross join) + NOT EXISTS anti join, grouped by nation.",
    tags=("join", "agg", "subquery"),
)
def high_balance_no_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg_bal"))
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(urgent, cust["c_custkey"] == urgent["o_custkey"], "left_anti")
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "dau_approx",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS STRING) AS event_date,
           CAST(count(DISTINCT user_id) AS BIGINT) AS dau_exact,
           true AS est_within_5pct
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
    doc="HyperLogLog++ daily active users (approx_count_distinct, "
    "rsd=0.01). The 100 TB path for SURVEY §2.4 A2: one pass, mergeable "
    "partial sketches, no per-key shuffle of user ids. Driver-hashed "
    "accuracy contract (upgrades the r01-r05 rows-only check): exact "
    "DAU plus a within-5% estimator flag the oracle recomputes — at "
    "rsd=0.01 the flag is deterministically true unless the sketch "
    "path breaks.",
    tags=("agg", "approx", "scale"),
)
def dau_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").cast("string").alias("event_date"))
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("_approx"),
            F.count_distinct("user_id").cast("long").alias("dau_exact"),
        )
        .select(
            "event_date",
            "dau_exact",
            (
                F.abs(F.col("_approx") - F.col("dau_exact"))
                <= 0.05 * F.col("dau_exact")
            ).alias("est_within_5pct"),
        )
    )


@query(
    "event_value_percentiles_approx",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           true AS p50_rank_ok, true AS p90_rank_ok, true AS p99_rank_ok
    FROM events
    GROUP BY event_type
    """,
    doc="approx_percentile(value, [p50 p90 p99], accuracy 10k) per "
    "event type — the scale path for exact percentile sorts (SURVEY "
    "§2.4 'no percentiles' gap). Driver-hashed RANK-ERROR contract "
    "(the estimator's actual guarantee — upgrades the r01-r05 "
    "rows-only check): for each reported percentile the fraction of "
    "values <= it must sit within 0.01 of the target rank (the sketch "
    "guarantees 1e-4); the flags are recomputed Spark-side from one "
    "extra aggregation and the oracle expects all true.",
    tags=("agg", "approx", "percentile", "scale"),
)
def event_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pcts = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("_p")
    )
    ranked = ev.join(F.broadcast(pcts), "event_type").groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        *[
            (
                F.abs(
                    F.avg(
                        F.when(F.col("value") <= F.col("_p")[i], 1.0).otherwise(0.0)
                    )
                    - F.lit(p)
                )
                <= 0.01
            ).alias(name)
            for i, (p, name) in enumerate(
                [(0.5, "p50_rank_ok"), (0.9, "p90_rank_ok"), (0.99, "p99_rank_ok")]
            )
        ],
    )
    return ranked.select("event_type", "n_events", "p50_rank_ok", "p90_rank_ok", "p99_rank_ok")
