"""Pipeline-health operators: DQ expectations, join-key skew
profiling, and blocked fuzzy entity resolution.

The operational layer a production warehouse runs BEFORE trusting a
table enough to join it:

- **dq_expectations** — a Great-Expectations-style constraint audit
  (referential integrity, key uniqueness, domain ranges, date sanity)
  expressed as pure aggregations: per-table checks collapse into ONE
  scan per table, FK checks are broadcast anti-joins. Every check
  emits (check, violations, pass) so the result doubles as a
  circuit-breaker input.
- **join_key_skew_profile** — the pre-join diagnostic for shuffle
  skew: heaviest keys, their traffic share, and max/avg ratio, all in
  exact integer arithmetic (ppm via integer division, identical in
  both engines). At 100 TB you run THIS before choosing between a
  plain shuffle join, AQE skew split, or salting.
- **part_name_near_duplicates** — entity resolution with blocking:
  candidate pairs only WITHIN a cheap deterministic block (first two
  name tokens), then exact Levenshtein on the survivors — the
  classic blocked record-linkage shape that replaces the O(n²)
  all-pairs with per-block quadratic cost, plan-wise an equi-join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table


@query(
    "dq_expectations",
    oracle="""
    WITH o AS (
        SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_pk,
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS bad_price,
               CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1992-01-01'
                               OR CAST(o_orderdate AS DATE) > DATE '1998-12-31'
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_date
        FROM orders
    ),
    l AS (
        SELECT CAST(count(*) - count(DISTINCT l_orderkey * 10 + l_linenumber)
                    AS BIGINT) AS dup_pk,
               CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty
        FROM lineitem
    ),
    ship AS (
        SELECT CAST(sum(CASE WHEN CAST(li.l_shipdate AS DATE)
                                  < CAST(ord.o_orderdate AS DATE)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n
        FROM lineitem li JOIN orders ord ON li.l_orderkey = ord.o_orderkey
    ),
    fk_o AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    ),
    fk_l AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    )
    SELECT 'orders_pk_unique' AS check_name, dup_pk AS violations,
           dup_pk = 0 AS pass FROM o
    UNION ALL SELECT 'orders_price_positive', bad_price, bad_price = 0 FROM o
    UNION ALL SELECT 'orders_date_in_range', bad_date, bad_date = 0 FROM o
    UNION ALL SELECT 'lineitem_pk_unique', dup_pk, dup_pk = 0 FROM l
    UNION ALL SELECT 'lineitem_qty_in_1_50', bad_qty, bad_qty = 0 FROM l
    UNION ALL SELECT 'lineitem_ship_after_order', n, n = 0 FROM ship
    UNION ALL SELECT 'orders_custkey_fk', n, n = 0 FROM fk_o
    UNION ALL SELECT 'lineitem_orderkey_fk', n, n = 0 FROM fk_l
    """,
    doc="Constraint audit over the order pipeline (expectations-style "
    "circuit-breaker input): PK uniqueness, domain ranges, date "
    "sanity, and two referential-integrity checks. All per-table "
    "checks fold into ONE aggregation pass per table (conditional "
    "sums, map-side partials); FK orphan counts are left-anti joins "
    "with the dimension side broadcast. Composite lineitem PK checked "
    "as l_orderkey*10+l_linenumber (linenumber is 1..7, so the "
    "encoding is injective). Exact integer/boolean output.",
    tags=("quality", "audit", "anti-join", "bench"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")

    # Three passes total (was eight subtree executions: Spark has no
    # DataFrame CSE, so a one-row aggregate referenced per output row
    # re-scans its table per row — guide §1.2 "don't compute things you
    # throw away"). Each pass computes every metric it can in ONE
    # aggregation and fans the metrics out to report rows with a
    # generator. Semantics are preserved for arbitrary inputs:
    # the fk_o probe joins the DISTINCT broadcast key set (1:1, row
    # count preserved — orphan rows are exactly the former anti-join
    # set), and the ship/fk_l pass left-joins the same non-distinct
    # orders projection the inner join used (matched rows fan out
    # identically; unmatched rows — the anti set — count once each).
    def report(src: DataFrame, checks: list[tuple[str, str]]) -> DataFrame:
        entries = F.array(
            *[
                F.struct(F.lit(name).alias("check_name"), F.col(col).alias("violations"))
                for name, col in checks
            ]
        )
        return src.select(F.explode(entries).alias("c")).select(
            F.col("c.check_name").alias("check_name"),
            F.col("c.violations").alias("violations"),
            (F.col("c.violations") == 0).alias("pass"),
        )

    o = report(
        orders.join(
            F.broadcast(
                cust.select(F.col("c_custkey").alias("o_custkey"))
                .distinct()
                .withColumn("_cust_ok", F.lit(1))
            ),
            "o_custkey",
            "left",
        ).agg(
            (F.count("*") - F.countDistinct("o_orderkey")).cast("long").alias("dup_pk"),
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).cast("long").alias("bad_price"),
            F.sum(
                F.when(
                    (F.col("o_orderdate").cast("date") < F.lit("1992-01-01").cast("date"))
                    | (F.col("o_orderdate").cast("date") > F.lit("1998-12-31").cast("date")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("bad_date"),
            F.sum(F.when(F.col("_cust_ok").isNull(), 1).otherwise(0)).cast("long").alias("fk_orphans"),
        ),
        [
            ("orders_pk_unique", "dup_pk"),
            ("orders_price_positive", "bad_price"),
            ("orders_date_in_range", "bad_date"),
            ("orders_custkey_fk", "fk_orphans"),
        ],
    )
    l = report(
        li.agg(
            (
                F.count("*")
                - F.countDistinct(F.col("l_orderkey") * 10 + F.col("l_linenumber"))
            ).cast("long").alias("dup_pk"),
            F.sum(
                F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)
            ).cast("long").alias("bad_qty"),
        ),
        [("lineitem_pk_unique", "dup_pk"), ("lineitem_qty_in_1_50", "bad_qty")],
    )
    ship = report(
        li.select("l_orderkey", F.col("l_shipdate").cast("date").alias("shipday"))
        .join(
            orders.select("o_orderkey", F.col("o_orderdate").cast("date").alias("oday"))
            .withColumnRenamed("o_orderkey", "l_orderkey"),
            "l_orderkey",
            "left",
        )
        .agg(
            F.sum(F.when(F.col("shipday") < F.col("oday"), 1).otherwise(0))
            .cast("long")
            .alias("ship_after"),
            F.sum(F.when(F.col("oday").isNull(), 1).otherwise(0)).cast("long").alias("fk_orphans"),
        ),
        [
            ("lineitem_ship_after_order", "ship_after"),
            ("lineitem_orderkey_fk", "fk_orphans"),
        ],
    )
    return o.unionAll(l).unionAll(ship)


@query(
    "join_key_skew_profile",
    oracle="""
    WITH freq AS (
        SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY o_custkey
    ),
    tot AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS distinct_keys,
               CAST(max(cnt) AS BIGINT) AS max_cnt
        FROM freq
    )
    SELECT key, cnt,
           CAST((cnt * 1000000) // total AS BIGINT) AS share_ppm,
           total AS total_rows, distinct_keys,
           CAST((max_cnt * 1000000 * distinct_keys) // total AS BIGINT)
               AS max_over_avg_ppm
    FROM freq CROSS JOIN tot
    ORDER BY cnt DESC, key ASC
    LIMIT 10
    """,
    doc="Shuffle-skew diagnostic for a join key (orders.o_custkey): "
    "the 10 heaviest keys with their traffic share and the global "
    "max/avg frequency ratio — the number that decides plain shuffle "
    "vs AQE skew split vs salting before a 100 TB join. One key-"
    "keyed aggregation (map-side partials) + a broadcast 1-row total; "
    "shares in exact integer ppm (BIGINT division, bit-identical "
    "across engines — no FP).",
    tags=("quality", "skew", "diagnostic", "bench"),
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    freq = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    tot = F.broadcast(
        freq.agg(
            F.sum("cnt").cast("long").alias("total"),
            F.count("*").cast("long").alias("distinct_keys"),
            F.max("cnt").cast("long").alias("max_cnt"),
        )
    )
    return (
        freq.crossJoin(tot)
        .select(
            "key",
            "cnt",
            F.expr("CAST(cnt * 1000000 div total AS BIGINT)").alias("share_ppm"),
            F.col("total").alias("total_rows"),
            "distinct_keys",
            F.expr(
                "CAST(max_cnt * 1000000 * distinct_keys div total AS BIGINT)"
            ).alias("max_over_avg_ppm"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(10)
    )


@query(
    "part_name_near_duplicates",
    oracle="""
    WITH n AS (SELECT DISTINCT p_name FROM part),
    p AS (
        SELECT p_name, string_split(p_name, ' ')[1] AS block FROM n
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_distance
    FROM p a JOIN p b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 12
    ORDER BY edit_distance ASC, name_a ASC, name_b ASC
    LIMIT 50
    """,
    doc="Blocked fuzzy entity resolution on part names, canonicalize-"
    "FIRST: exact duplicates collapse via DISTINCT before any "
    "expensive matching (the catalog's exact-dedup operator handles "
    "those), then candidate pairs form only within a deterministic "
    "first-token block — plan-wise an equi-join, never a cartesian — "
    "and exact Levenshtein keeps genuine near-misses (1..12 edits). "
    "Canonicalizing first is the scale move: blocked matching on raw "
    "rows is quadratic in DUPLICATION (3.1M candidate pairs on this "
    "table), on canonical entities it is quadratic only in distinct "
    "values per block. Levenshtein is integer and identical across "
    "engines, so the oracle replays the exact pair set.",
    tags=("quality", "fuzzy", "dedup", "join", "bench"),
)
def part_name_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    p = names.withColumn("block", F.split(F.col("p_name"), " ").getItem(0))
    a = p.select("block", F.col("p_name").alias("name_a"))
    b = p.select("block", F.col("p_name").alias("name_b"))
    return (
        a.join(b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("edit_distance").between(1, 12))
        .select("name_a", "name_b", "edit_distance")
        .orderBy(
            F.col("edit_distance").asc(), F.col("name_a").asc(), F.col("name_b").asc()
        )
        .limit(50)
    )
