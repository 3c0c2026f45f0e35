"""Statistical / ML-analytics operators over the star schema + events.

A family the reference has no counterpart for (its analytics suite
stops at counts/avgs/shares — ``/root/reference`` ``sql_queries/*.sql``):
correlation and least-squares regression aggregates, entropy,
higher-moment profiles, Gini concentration + Pareto deciles,
chi-square independence, Benford first-digit screening, equi-width
histograms, RFM segmentation, cohort LTV, interarrival profiles,
lag-1 autocorrelation, Kaplan-Meier survival, market-basket lift, and
a degree-oriented distributed triangle count. Everything is expressed
as one-pass JVM aggregations (no UDFs); global order statistics go
through :mod:`reciping_data_pipeline_spark.operators.ranks` instead
of a single-partition window, and ordered windows appear only over
pre-aggregated O(days)/O(bands) tables.

Cross-engine determinism rules (see queries/__init__ docstring):
every float output rounded; per-user money totals rounded *before*
downstream ranking so rank ties agree between engines; libm-sensitive
boundaries (Benford's log10 at exact powers of ten) are clamped
identically on both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from reciping_data_pipeline_spark.operators.ranks import global_rank
from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table


@query(
    "returnflag_price_corr",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           round(stddev_samp(l_quantity), 4) AS qty_std,
           round(stddev_samp(l_extendedprice), 2) AS price_std
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pearson correlation + sample covariance of quantity vs price per "
    "return flag — single-pass co-moment aggregates (map-side partials, "
    "one shuffle on the group key).",
    tags=("stats", "agg"),
)
def returnflag_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_std"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_std"),
    )


@query(
    "discount_price_slope",
    oracle="""
    SELECT l_linestatus,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_points,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 4) AS r2
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="Ordinary-least-squares fit price ~ quantity per line status via "
    "the SQL-standard regr_* aggregates — distributed regression without "
    "MLlib, one co-moment pass.",
    tags=("stats", "agg"),
)
def discount_price_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_linestatus").agg(
        F.regr_count(y, x).cast("bigint").alias("n_points"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        F.round(F.regr_r2(y, x), 4).alias("r2"),
    )


@query(
    "event_type_entropy_daily",
    oracle="""
    WITH c AS (
        SELECT CAST(CAST(ts AS DATE) AS STRING) AS event_date, event_type,
               count(*) AS c
        FROM events GROUP BY 1, 2
    )
    SELECT event_date,
           CAST(sum(c) AS BIGINT) AS n_events,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS type_entropy
    FROM c GROUP BY event_date
    """,
    doc="Shannon entropy (nats) of the per-day event-type mix via the "
    "H = ln(n) - sum(c ln c)/n identity — two cheap aggregations, no "
    "window, no per-row probability join.",
    tags=("stats", "agg"),
)
def event_type_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.col("ts").cast("date").cast("string").alias("event_date"), "event_type"
    ).agg(F.count("*").alias("c"))
    return c.groupBy("event_date").agg(
        F.sum("c").alias("n_events"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 4
        ).alias("type_entropy"),
    )


@query(
    "value_moments_by_type",
    oracle="""
    WITH p AS (
        SELECT event_type, count(*) AS n, avg(value) AS m,
               avg(value * value) AS q2,
               avg(value * value * value) AS q3,
               avg(value * value * value * value) AS q4
        FROM events GROUP BY event_type
    )
    SELECT event_type, n AS n_events,
           round(m, 4) AS mean_value,
           round(q2 - m * m, 2) AS var_pop,
           round((q3 - 3 * m * q2 + 2 * m * m * m)
                 / power(q2 - m * m, 1.5), 3) AS skewness_g1,
           round((q4 - 4 * m * q3 + 6 * m * m * q2 - 3 * m * m * m * m)
                 / power(q2 - m * m, 2) - 3, 3) AS kurtosis_g2
    FROM p
    """,
    doc="Mean/variance/skewness/kurtosis per event type from raw power "
    "sums combined with the explicit central-moment identities — the "
    "engine-portable formulation (Spark's skewness()/kurtosis() and "
    "DuckDB's use different bias corrections), still one aggregation pass.",
    tags=("stats", "agg"),
)
def value_moments_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    p = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg(v).alias("m"),
        F.avg(v * v).alias("q2"),
        F.avg(v * v * v).alias("q3"),
        F.avg(v * v * v * v).alias("q4"),
    )
    m, q2, q3, q4 = F.col("m"), F.col("q2"), F.col("q3"), F.col("q4")
    var_pop = q2 - m * m
    m3 = q3 - 3 * m * q2 + 2 * m * m * m
    m4 = q4 - 4 * m * q3 + 6 * m * m * q2 - 3 * m * m * m * m
    return p.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.round(m, 4).alias("mean_value"),
        F.round(var_pop, 2).alias("var_pop"),
        F.round(m3 / F.pow(var_pop, 1.5), 3).alias("skewness_g1"),
        F.round(m4 / F.pow(var_pop, 2) - 3, 3).alias("kurtosis_g2"),
    )


@query(
    "user_value_gini",
    oracle="""
    WITH u AS (
        SELECT user_id, round(sum(value), 2) AS mv
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    r AS (
        SELECT mv, row_number() OVER (ORDER BY mv, user_id) AS rk FROM u
    )
    SELECT count(*) AS n_users,
           round((2.0 * sum(rk * mv) - (count(*) + 1) * sum(mv))
                 / (count(*) * sum(mv)), 4) AS gini
    FROM r
    """,
    doc="Gini coefficient of per-user purchase spend via the rank identity "
    "G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)). The global ascending "
    "rank comes from operators/ranks.global_rank — banded two-pass ranking, "
    "NO single-partition window (the plan gate asserts it). Per-user totals "
    "are rounded before ranking so tie order agrees across engines.",
    tags=("stats", "rank"),
)
def user_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("mv"))
    )
    r = global_rank(u, "mv", ("user_id",), n_bands=64, rank_col="rk")
    n, sx, srx = F.count("*"), F.sum("mv"), F.sum(F.col("rk") * F.col("mv"))
    return r.agg(
        n.alias("n_users"),
        F.round((2.0 * srx - (n + 1) * sx) / (n * sx), 4).alias("gini"),
    )


@query(
    "value_equiwidth_histogram",
    oracle="""
    WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
    h AS (
        SELECT CAST(least(floor((value - lo) / ((hi - lo) / 16)), 15) AS INT)
                   AS bucket,
               lo, hi, value
        FROM events CROSS JOIN b
    )
    SELECT bucket,
           round(min(lo) + bucket * ((min(hi) - min(lo)) / 16), 6) AS bucket_lo,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM h GROUP BY bucket
    """,
    doc="16-bucket equi-width histogram of event value: 1-row min/max "
    "scalar broadcast (cross join), then a pure map-side bucket expression "
    "— bucketing is identical floor arithmetic on identical doubles in "
    "both engines (no width_bucket(), whose max-edge semantics differ).",
    tags=("stats", "agg"),
)
def value_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    h = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.least(
            F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 16)),
            F.lit(15),
        ).cast("int"),
    )
    return h.groupBy("bucket").agg(
        # round at 6: bucket edges inherit the inputs' ≤6-decimal
        # structure, so 6 digits never lands on a .5 rounding tie
        # (Spark HALF_UP vs DuckDB disagree on exact ties at 4).
        F.round(F.min("lo") + F.col("bucket") * ((F.min("hi") - F.min("lo")) / 16), 6).alias(
            "bucket_lo"
        ),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "priority_segment_chi2",
    oracle="""
    WITH j AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    obs AS (SELECT seg, pri, count(*) AS c FROM j GROUP BY seg, pri),
    rs  AS (SELECT seg, sum(c) AS rtot FROM obs GROUP BY seg),
    cs  AS (SELECT pri, sum(c) AS ctot FROM obs GROUP BY pri),
    n   AS (SELECT sum(c) AS tot FROM obs)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((count(DISTINCT obs.seg) - 1)
                * (count(DISTINCT obs.pri) - 1) AS BIGINT) AS dof,
           round(sum(power(obs.c - rs.rtot * cs.ctot / n.tot, 2)
                     / (rs.rtot * cs.ctot / n.tot)), 3) AS chi2
    FROM obs JOIN rs USING (seg) JOIN cs USING (pri) CROSS JOIN n
    """,
    doc="Chi-square independence statistic between customer market segment "
    "and order priority. The fact join broadcasts the customer dim; the "
    "margin/expected-count joins all run over the 25-cell contingency "
    "aggregate — post-aggregation tiny, whatever the fact-table scale.",
    tags=("stats", "join"),
)
def priority_segment_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri")
    )
    obs = j.groupBy("seg", "pri").agg(F.count("*").alias("c"))
    rs = obs.groupBy("seg").agg(F.sum("c").alias("rtot"))
    cs = obs.groupBy("pri").agg(F.sum("c").alias("ctot"))
    n = obs.agg(F.sum("c").alias("tot"))
    e = F.col("rtot") * F.col("ctot") / F.col("tot")
    return (
        obs.join(rs, "seg")
        .join(cs, "pri")
        .crossJoin(F.broadcast(n))
        .agg(
            F.count("*").alias("n_cells"),
            ((F.countDistinct("seg") - 1) * (F.countDistinct("pri") - 1))
            .cast("bigint")
            .alias("dof"),
            F.round(F.sum(F.pow(F.col("c") - e, 2) / e), 3).alias("chi2"),
        )
    )


@query(
    "order_interarrival_by_customer",
    oracle="""
    WITH g AS (
        SELECT o_custkey,
               date_diff('day',
                   CAST(lag(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS DATE),
                   CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
    )
    SELECT c.c_mktsegment AS segment,
           CAST(count(g.gap_days) AS BIGINT) AS n_gaps,
           round(avg(g.gap_days), 2) AS avg_gap_days,
           round(quantile_cont(g.gap_days, 0.5), 2) AS median_gap_days,
           max(g.gap_days) AS max_gap_days
    FROM g JOIN customer c ON g.o_custkey = c.c_custkey
    WHERE g.gap_days IS NOT NULL
    GROUP BY c.c_mktsegment
    """,
    doc="Days between consecutive orders per customer (LAG window keyed by "
    "customer — partition-parallel), profiled per market segment with "
    "exact interpolated median.",
    tags=("stats", "window"),
)
def order_interarrival_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.withColumn(
        "gap_days",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate")).over(w).cast("date"),
        ),
    ).where(F.col("gap_days").isNotNull())
    return (
        g.join(F.broadcast(c), g.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("gap_days").alias("n_gaps"),
            F.round(F.avg("gap_days"), 2).alias("avg_gap_days"),
            F.round(F.percentile("gap_days", F.lit(0.5)), 2).alias("median_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
        )
    )


@query(
    "lineitem_benford_first_digit",
    oracle="""
    WITH d AS (
        SELECT CASE WHEN fd >= 10 THEN 1 ELSE fd END AS first_digit
        FROM (
            SELECT CAST(floor(l_extendedprice
                       / power(10, floor(log10(l_extendedprice)))) AS INT) AS fd
            FROM lineitem WHERE l_extendedprice > 0
        )
    ),
    n AS (SELECT count(*) AS tot FROM d)
    SELECT first_digit,
           count(*) AS n_rows,
           round(count(*) / (1.0 * min(n.tot)), 4) AS observed_share,
           round(log10(1 + 1.0 / first_digit), 4) AS benford_expected,
           round(abs(count(*) / (1.0 * min(n.tot))
                     - log10(1 + 1.0 / first_digit)), 4) AS abs_deviation
    FROM d CROSS JOIN n
    GROUP BY first_digit
    """,
    doc="Benford first-significant-digit screen on line prices (fraud/"
    "data-quality smell test). First digit is pure floor/log10 arithmetic; "
    "at exact powers of ten libm log10 may land either side of an integer, "
    "so the d=10 case is clamped to 1 identically in both engines. The "
    "total is a 1-row scalar cross join, not a global window.",
    tags=("stats", "agg"),
)
def lineitem_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") > 0)
    fd = F.floor(
        F.col("l_extendedprice") / F.pow(10, F.floor(F.log10("l_extendedprice")))
    ).cast("int")
    d = li.select(F.when(fd >= 10, 1).otherwise(fd).alias("first_digit"))
    n = d.agg(F.count("*").alias("tot"))
    share = F.count("*") / (1.0 * F.min("tot"))
    expected = F.log10(1 + 1.0 / F.col("first_digit"))
    return (
        d.crossJoin(F.broadcast(n))
        .groupBy("first_digit")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(share, 4).alias("observed_share"),
            F.round(expected, 4).alias("benford_expected"),
            F.round(F.abs(share - expected), 4).alias("abs_deviation"),
        )
    )


@query(
    "copurchase_triangles",
    oracle="""
    WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    deg AS MATERIALIZED (
        SELECT node, count(*) AS d FROM (
            SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
        ) GROUP BY node
    ),
    o AS MATERIALIZED (
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dd
        FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
    ),
    w AS MATERIALIZED (
        SELECT e1.dst AS x, e2.dst AS y
        FROM o e1 JOIN o e2
          ON e1.src = e2.src
         AND ((e1.dd < e2.dd) OR (e1.dd = e2.dd AND e1.dst < e2.dst))
    ),
    t AS (SELECT count(*) AS n_triangles
          FROM w JOIN o ON w.x = o.src AND w.y = o.dst)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM w) AS n_wedges,
           (SELECT CAST(n_triangles AS BIGINT) FROM t) AS n_triangles
    """,
    doc="Distributed triangle count on the part co-purchase graph "
    "(market-basket association mining). Edges need co-occurrence "
    "support >= 2 — the standard noise filter that removes the "
    "random-co-purchase clique soup; the support aggregation over ALL "
    "co-occurring pairs is the one big shuffle (map-side partials on "
    "(u,v)). Triangles then close via degree orientation — every edge "
    "points from the ((degree, id)-)smaller endpoint, so oriented "
    "out-degrees are O(sqrt(E)) — and per-edge adjacency-array "
    "intersection (codegen'd array_intersect), which does the "
    "Θ(Σ out_deg²) wedge work WITHOUT materializing a wedge-sized "
    "exchange. No cartesian products, all equi-joins (plan-gated).",
    tags=("graph", "join", "bench"),
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reciping_data_pipeline_spark.operators.graph import cooccurrence_edges

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Spark has no DataFrame-level common-subexpression reuse: the edge
    # and oriented-edge sets feed 3-4 downstream subtrees each, so
    # without materialization the whole e/o pipeline re-executes per
    # reuse (measured 14.8 s -> ~4 s at sf0.1). localCheckpoint pins
    # each at its O(E) size — same pattern as the connected-components
    # operator's per-round checkpoint. The edge list itself comes from
    # the single-exchange distinct+self-join builder
    # (operators/graph.py, r15 form).
    e = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_support=2).localCheckpoint()
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dd"),
        )
        .localCheckpoint()
    )
    # Edge-iterator with adjacency intersection instead of a wedge
    # self-join: materializing the wedge set explicitly shuffles
    # O(sum out_deg^2) rows (41M at sf0.1 — measured 16 s); instead,
    # build each vertex's oriented out-neighbor array once (bounded by
    # the O(sqrt E) oriented out-degree) and count, per edge (u, v),
    # |out(u) ∩ out(v)| with a codegen'd array_intersect — the same
    # arithmetic work with NO wedge-sized exchange (only edge-sized
    # shuffles remain, and the gap widens with graph density).
    adj = o.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    sz = F.size("nbrs").cast("long")
    wedge_stats = adj.agg(
        (F.sum(sz * (sz - 1)) / 2).cast("bigint").alias("n_wedges")
    )
    a_side = adj.select(F.col("src"), F.col("nbrs").alias("a_nbrs"))
    b_side = adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("b_nbrs"))
    tri = (
        o.join(a_side, "src")
        .join(b_side, "dst", "left")
        .select(
            F.size(
                F.array_intersect(
                    F.col("a_nbrs"),
                    F.coalesce(F.col("b_nbrs"), F.array().cast("array<bigint>")),
                )
            ).cast("long").alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("n_triangles"))
    )
    return (
        deg.agg(F.count("*").alias("n_vertices"))
        .crossJoin(e.agg(F.count("*").alias("n_edges")))
        .crossJoin(wedge_stats)
        .crossJoin(tri)
    )


@query(
    "cohort_ltv_curve",
    oracle="""
    WITH s AS (
        SELECT user_id,
               min(CAST(ts AS DATE)) AS signup_day
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT s.user_id,
               CAST(date_trunc('week', s.signup_day) AS DATE) AS cohort_week,
               CAST(floor(date_diff('day', s.signup_day,
                                    CAST(e.ts AS DATE)) / 7.0) AS INT) AS week_age,
               e.value, e.user_id AS buyer
        FROM s JOIN events e ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase'
    ),
    wk AS (
        SELECT CAST(cohort_week AS STRING) AS cohort_week, week_age,
               count(DISTINCT buyer) AS n_active_users,
               round(sum(value), 2) AS week_value
        FROM p GROUP BY 1, 2
    )
    SELECT cohort_week, week_age, n_active_users, week_value,
           round(sum(week_value) OVER (
               PARTITION BY cohort_week ORDER BY week_age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS cum_value
    FROM wk
    """,
    doc="Cohort lifetime-value curve: users bucketed by ISO signup week, "
    "purchase value accumulated over weeks-since-signup with a cohort-"
    "partitioned running sum (partition-parallel window; the cumulative "
    "sum runs over rounded weekly totals so both engines add identical "
    "doubles).",
    tags=("stats", "window", "cohort"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("signup_day"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .select(
            F.date_trunc("week", "signup_day").cast("date").cast("string").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("signup_day")) / 7.0
            )
            .cast("int")
            .alias("week_age"),
            "value",
            F.col("user_id").alias("buyer"),
        )
    )
    wk = p.groupBy("cohort_week", "week_age").agg(
        F.countDistinct("buyer").alias("n_active_users"),
        F.round(F.sum("value"), 2).alias("week_value"),
    )
    cum = Window.partitionBy("cohort_week").orderBy("week_age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return wk.withColumn("cum_value", F.round(F.sum("week_value").over(cum), 2))


@query(
    "user_rfm_segments",
    oracle="""
    WITH mx AS (SELECT max(CAST(ts AS DATE)) AS maxday FROM events),
    u AS (
        SELECT e.user_id,
               date_diff('day', max(CAST(e.ts AS DATE)), min(mx.maxday))
                   AS recency_days,
               count(*) AS frequency,
               round(sum(e.value), 2) AS monetary,
               CAST(round(round(sum(e.value), 2) * 100, 0) AS BIGINT) AS cents
        FROM events e CROSS JOIN mx
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    ),
    b AS (
        SELECT round(quantile_cont(recency_days, 1.0/3), 4) AS r1,
               round(quantile_cont(recency_days, 2.0/3), 4) AS r2,
               round(quantile_cont(frequency, 1.0/3), 4) AS f1,
               round(quantile_cont(frequency, 2.0/3), 4) AS f2,
               round(quantile_cont(monetary, 1.0/3), 4) AS m1,
               round(quantile_cont(monetary, 2.0/3), 4) AS m2
        FROM u
    )
    SELECT 1 + CAST(recency_days > r1 AS INT) + CAST(recency_days > r2 AS INT)
               AS r_band,
           1 + CAST(frequency > f1 AS INT) + CAST(frequency > f2 AS INT)
               AS f_band,
           1 + CAST(monetary > m1 AS INT) + CAST(monetary > m2 AS INT)
               AS m_band,
           CAST(count(*) AS BIGINT) AS n_users,
           floor(sum(cents) / count(*) + 0.5) / 100.0 AS avg_monetary
    FROM u CROSS JOIN b
    GROUP BY 1, 2, 3
    """,
    doc="RFM (recency/frequency/monetary) segmentation: per-user purchase "
    "profile, tercile boundaries from ONE exact-percentile scalar row "
    "(broadcast cross join — no global ntile window, the scale-safe "
    "banding the round-3 review prescribed), 27-cell segment census. "
    "Boundaries are rounded to 4 decimals before comparison so band "
    "membership is engine-stable.",
    tags=("stats", "segmentation"),
)
def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("maxday"))
    u = (
        ev.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.datediff(F.min("maxday"), F.max(F.col("ts").cast("date"))).alias(
                "recency_days"
            ),
            F.count("*").alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
            # exact integer cents: cell averages then divide identical
            # exact sums on both engines (a plain avg() of the rounded
            # doubles can straddle a rounding boundary between engines
            # because summation order differs)
            F.round(F.round(F.sum("value"), 2) * 100, 0).cast("bigint").alias("cents"),
        )
    )
    b = u.agg(
        F.round(F.percentile("recency_days", F.lit(1.0 / 3)), 4).alias("r1"),
        F.round(F.percentile("recency_days", F.lit(2.0 / 3)), 4).alias("r2"),
        F.round(F.percentile("frequency", F.lit(1.0 / 3)), 4).alias("f1"),
        F.round(F.percentile("frequency", F.lit(2.0 / 3)), 4).alias("f2"),
        F.round(F.percentile("monetary", F.lit(1.0 / 3)), 4).alias("m1"),
        F.round(F.percentile("monetary", F.lit(2.0 / 3)), 4).alias("m2"),
    )
    band = lambda col, lo, hi: (  # noqa: E731
        1
        + (F.col(col) > F.col(lo)).cast("int")
        + (F.col(col) > F.col(hi)).cast("int")
    )
    return (
        u.crossJoin(F.broadcast(b))
        .groupBy(
            band("recency_days", "r1", "r2").alias("r_band"),
            band("frequency", "f1", "f2").alias("f_band"),
            band("monetary", "m1", "m2").alias("m_band"),
        )
        .agg(
            F.count("*").alias("n_users"),
            # explicit floor(x+0.5) half-up on the exact cent average:
            # engine round() builtins disagree on the .xx5 ties this
            # division produces (Spark rounds the shortest-decimal
            # rendering, DuckDB the binary value)
            (F.floor(F.sum("cents") / F.count("*") + 0.5) / 100.0).alias("avg_monetary"),
        )
    )


@query(
    "customer_revenue_pareto",
    oracle="""
    WITH cr AS (
        SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk,
               count(*) OVER () AS n,
               sum(rev) OVER () AS total
        FROM cr
    )
    SELECT CAST(least(floor((rk - 1) * 10.0 / n), 9) + 1 AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(rev), 2) AS decile_revenue,
           round(sum(rev) / min(total), 4) AS revenue_share
    FROM ranked
    GROUP BY 1
    """,
    doc="Pareto revenue-concentration profile: customers ranked by total "
    "spend (descending) and cut into rank deciles, with each decile's "
    "share of total revenue — the 80/20 audit. The global descending "
    "rank reuses operators/ranks.global_rank (banded two-pass, no "
    "single-partition window over the customer set — plan-gated); the "
    "oracle's window formulation is the semantic spec.",
    tags=("stats", "rank"),
)
def customer_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    # ascending banded rank on -rev == descending rank on rev; the
    # o_custkey tie column matches the oracle's (rev DESC, custkey).
    ranked = global_rank(
        cr.withColumn("neg_rev", -F.col("rev")), "neg_rev", ("o_custkey",), n_bands=64,
        rank_col="rk",
    )
    totals = F.broadcast(
        cr.agg(F.count("*").alias("n"), F.sum("rev").alias("total"))
    )
    decile = (
        F.least(F.floor((F.col("rk") - 1) * 10.0 / F.col("n")), F.lit(9)) + 1
    ).cast("int")
    return (
        ranked.crossJoin(totals)
        .groupBy(decile.alias("decile"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("rev"), 2).alias("decile_revenue"),
            F.round(F.sum("rev") / F.min("total"), 4).alias("revenue_share"),
        )
    )


@query(
    "copurchase_lift_topk",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
    pc AS (SELECT l_partkey, count(*) AS c FROM li GROUP BY l_partkey),
    pairs AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS c_ab
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT pairs.u, pairs.v, CAST(pairs.c_ab AS BIGINT) AS support,
           round(pairs.c_ab * 1.0 * n.n_orders / (cu.c * cv.c), 4) AS lift
    FROM pairs JOIN pc cu ON pairs.u = cu.l_partkey
               JOIN pc cv ON pairs.v = cv.l_partkey
    CROSS JOIN n
    ORDER BY lift DESC, pairs.u, pairs.v LIMIT 20
    """,
    doc="Market-basket association lift: top-20 part pairs by "
    "lift = P(a,b)/(P(a)P(b)) with support >= 3 — the frequent-itemset "
    "signal behind the co-purchase graph. One (u,v) support "
    "aggregation with map-side partials (the single big shuffle), "
    "part-marginal joins on each side (item-catalog-sized — shuffle, "
    "not broadcast), 1-row order-count broadcast, TakeOrdered top-k "
    "on rounded lift with full tie-break.",
    tags=("stats", "join", "topk"),
)
def copurchase_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n = F.broadcast(li.agg(F.countDistinct("l_orderkey").alias("n_orders")))
    pc = li.groupBy("l_partkey").agg(F.count("*").alias("c"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= 3)
    )
    cu = pc.select(F.col("l_partkey").alias("u"), F.col("c").alias("cu"))
    cv = pc.select(F.col("l_partkey").alias("v"), F.col("c").alias("cv"))
    return (
        pairs.join(cu, "u")
        .join(cv, "v")
        .crossJoin(n)
        .select(
            "u", "v",
            F.col("c_ab").alias("support"),
            F.round(
                F.col("c_ab") * 1.0 * F.col("n_orders") / (F.col("cu") * F.col("cv")), 4
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "u", "v")
        .limit(20)
    )


@query(
    "event_count_autocorr",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           CAST(count(*) AS BIGINT) AS n_day_pairs,
           round(corr(a.c, b.c), 4) AS lag1_autocorr
    FROM d a JOIN d b
      ON a.event_type = b.event_type AND b.day = a.day + INTERVAL 1 DAY
    GROUP BY a.event_type
    """,
    doc="Lag-1 autocorrelation of the daily event-count series per type "
    "(time-series regularity diagnostic — near zero for a memoryless "
    "stream, high for trending/seasonal load). Daily counts come from "
    "one aggregation; the lag pairing is an equi-join on (type, day+1) "
    "over the O(days x types) aggregate, so the heavy input collapses "
    "before any pairwise work.",
    tags=("stats", "timeseries"),
)
def event_count_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("c"))
    a = d.select("event_type", "day", F.col("c").alias("ca"))
    b = d.select(
        "event_type", (F.date_add("day", -1)).alias("day"), F.col("c").alias("cb")
    )
    return (
        a.join(b, ["event_type", "day"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_day_pairs"),
            F.round(F.corr("ca", "cb"), 4).alias("lag1_autocorr"),
        )
    )


@query(
    "signup_conversion_survival",
    oracle="""
    WITH s AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS signup_day
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    mx AS (SELECT max(CAST(ts AS DATE)) AS maxday FROM events),
    fp AS (
        SELECT s.user_id,
               min(CASE WHEN e.event_type = 'purchase'
                         AND CAST(e.ts AS DATE) >= s.signup_day
                        THEN CAST(e.ts AS DATE) END) AS conv_day
        FROM s LEFT JOIN events e ON e.user_id = s.user_id
        GROUP BY s.user_id
    ),
    u AS (
        SELECT fp.user_id,
               CASE WHEN fp.conv_day IS NOT NULL THEN 1 ELSE 0 END AS converted,
               date_diff('day', s.signup_day,
                         coalesce(fp.conv_day, mx.maxday)) AS t
        FROM fp JOIN s USING (user_id) CROSS JOIN mx
    ),
    per_t AS (
        SELECT t,
               CAST(sum(converted) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS leaving
        FROM u GROUP BY t
    ),
    risk AS (
        SELECT t, d, leaving,
               -- CAST to BIGINT: DuckDB types a windowed sum(BIGINT) as
               -- HUGEINT, and the driver's typed hash distinguishes
               -- HUGEINT from Spark's BIGINT even when values are equal
               -- (the r04-r06 driver reds were exactly this, not FP drift).
               CAST((SELECT count(*) FROM u)
                   - coalesce(sum(leaving) OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS n_at_risk
        FROM per_t
    ),
    fac AS (
        SELECT t, d, leaving, n_at_risk,
               -- factor coarsened to 6 decimals via floor(x*1e6+0.5)/1e6 —
               -- pure IEEE mul/add/floor, bit-identical across engines
               -- (unlike each engine's round(), which disagrees on doubles).
               floor((1.0 - d * 1.0 / n_at_risk) * 1000000.0 + 0.5)
                   / 1000000.0 AS factor
        FROM risk
    )
    SELECT CAST(t AS INT) AS duration_days,
           n_at_risk, d AS n_converted,
           (leaving - d) AS n_censored,
           -- order-pinned running PRODUCT over the O(days) risk table:
           -- left-to-right IEEE multiplication of identical 6-dp factors
           -- is bit-identical on any platform — no ln/exp (libm permits
           -- 1-ulp error there, which flipped the 4-dp floor in r04/r05).
           floor(list_aggregate(
                     list(factor) OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     'product')
                 * 10000.0 + 0.5) / 10000.0
               AS survival
    FROM fac
    """,
    doc="Kaplan-Meier product-limit estimator for signup-to-first-purchase "
    "conversion: users who never convert are right-censored at the "
    "observation horizon, the per-day risk table collapses the user set "
    "to O(days) rows, and the survival product runs as an order-pinned "
    "left fold (collect_list + aggregate HOF — no ln/exp, so no libm "
    "variance) over that TINY ordered table (the only unpartitioned "
    "window is over the per-day aggregate, never the users). The classic "
    "time-to-event analytic no count/avg suite can express.",
    tags=("stats", "survival", "window"),
)
def signup_conversion_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("signup_day"))
    )
    mx = F.broadcast(ev.agg(F.max(F.col("ts").cast("date")).alias("maxday")))
    fp = (
        s.join(ev, "user_id", "left")
        .groupBy("user_id", "signup_day")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts").cast("date") >= F.col("signup_day")),
                    F.col("ts").cast("date"),
                )
            ).alias("conv_day")
        )
    )
    u = fp.crossJoin(mx).select(
        F.when(F.col("conv_day").isNotNull(), 1).otherwise(0).alias("converted"),
        F.datediff(F.coalesce("conv_day", "maxday"), "signup_day").alias("t"),
    )
    per_t = u.groupBy("t").agg(
        F.sum("converted").cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("leaving"),
    )
    total = F.broadcast(u.agg(F.count("*").alias("n_total")))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk = per_t.crossJoin(total).withColumn(
        "n_at_risk",
        F.col("n_total") - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0)),
    )
    # The per-day factor is coarsened to 6 decimals via floor(x*1e6+0.5)/1e6
    # — plain IEEE mul/add/floor that is bit-identical in Spark and DuckDB
    # (engine round() on doubles is not: Spark goes through BigDecimal
    # shortest-repr, DuckDB rounds the binary value).
    fac = risk.withColumn(
        "factor",
        F.floor(
            (1.0 - F.col("d") * 1.0 / F.col("n_at_risk")) * 1000000.0 + 0.5
        )
        / 1000000.0,
    )
    # Survival is an order-pinned running PRODUCT folded left-to-right over
    # the O(days) risk table (collect_list preserves the ROWS-frame order;
    # t is unique). exp(sum(ln(x))) was abandoned after two rounds of
    # last-ulp libm divergence between JVM Math.log/exp and DuckDB's libm:
    # IEEE multiplication of identical 6-dp factors is bit-identical on any
    # engine, so the final 4-dp floor can never straddle a half boundary.
    return fac.select(
        F.col("t").cast("int").alias("duration_days"),
        "n_at_risk",
        F.col("d").alias("n_converted"),
        (F.col("leaving") - F.col("d")).alias("n_censored"),
        (
            F.floor(
                F.aggregate(
                    F.collect_list("factor").over(w_cum),
                    F.lit(1.0),
                    lambda acc, x: acc * x,
                )
                * 10000.0
                + 0.5
            )
            / 10000.0
        ).alias("survival"),
    )


@query(
    "event_value_mad_outliers",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS v
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
    ),
    ranked AS (
        SELECT event_type, day, v,
               row_number() OVER (PARTITION BY event_type ORDER BY v, day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    med AS (
        SELECT event_type,
               avg(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
                        THEN v END) AS med_v
        FROM ranked GROUP BY event_type
    ),
    dev AS (
        SELECT d.event_type, d.day, d.v, m.med_v,
               abs(d.v - m.med_v) AS adev
        FROM daily d JOIN med m USING (event_type)
    ),
    rdev AS (
        SELECT event_type, day, v, med_v, adev,
               row_number() OVER (PARTITION BY event_type
                    ORDER BY adev, day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM dev
    ),
    mad AS (
        SELECT event_type,
               avg(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
                        THEN adev END) AS mad_v
        FROM rdev GROUP BY event_type
    )
    SELECT d.event_type, CAST(d.day AS VARCHAR) AS day,
           d.v AS daily_value, d.med_v AS median_value,
           mad.mad_v AS mad_value
    FROM dev d JOIN mad USING (event_type)
    WHERE d.adev > 3 * mad.mad_v
    """,
    doc="Robust (median/MAD) outlier days per event type — the "
    "anomaly detector that survives the anomalies themselves, unlike "
    "the mean/std z-score (one 100x day drags the mean and masks "
    "itself). The median is computed WITHOUT interpolation builtins "
    "(engines interpolate with different expression shapes): explicit "
    "middle-rank averaging over a per-type ordered window — a "
    "row_number + count window, exact and bit-identical across "
    "engines. Daily sums are floor-coarsened at 4dp first so every "
    "downstream comparison (|v - med| > 3*MAD, a strict inequality "
    "that decides SET membership) runs on identical doubles. Windows "
    "are type-partitioned (bounded by days-per-type, parallel).",
    tags=("stats", "robust", "window", "anomaly"),
)
def event_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg((F.floor(F.sum("value") * 10000.0 + 0.5) / 10000.0).alias("v"))

    def _median_of(df: DataFrame, col: str, out: str) -> DataFrame:
        w_rn = Window.partitionBy("event_type").orderBy(col, "day")
        w_all = Window.partitionBy("event_type")
        ranked = df.withColumn("rn", F.row_number().over(w_rn)).withColumn(
            "n", F.count("*").over(w_all)
        )
        mid = (F.col("rn") == F.expr("(n + 1) div 2")) | (
            F.col("rn") == F.expr("(n + 2) div 2")
        )
        return ranked.groupBy("event_type").agg(
            F.avg(F.when(mid, F.col(col))).alias(out)
        )

    med = _median_of(daily, "v", "med_v")
    dev = daily.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("v") - F.col("med_v"))
    )
    mad = _median_of(dev, "adev", "mad_v")
    return (
        dev.join(mad, "event_type")
        .where(F.col("adev") > 3 * F.col("mad_v"))
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.col("v").alias("daily_value"),
            F.col("med_v").alias("median_value"),
            F.col("mad_v").alias("mad_value"),
        )
    )


@query(
    "qty_weighted_median_price_by_flag",
    oracle="""
    WITH w AS (
        SELECT l_returnflag, l_extendedprice AS price,
               CAST(l_quantity AS DOUBLE) AS wt, l_orderkey, l_linenumber
        FROM lineitem
    ),
    c AS (
        SELECT l_returnflag, price, wt,
               sum(wt) OVER (PARTITION BY l_returnflag
                    ORDER BY price, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
               sum(wt) OVER (PARTITION BY l_returnflag) AS tw
        FROM w
    )
    SELECT l_returnflag,
           CAST(min(tw) AS DOUBLE) AS total_qty,
           min(CASE WHEN cw * 2.0 >= tw THEN price END) AS weighted_median_price
    FROM c
    GROUP BY l_returnflag
    """,
    doc="Exact WEIGHTED median (the quantity-weighted median line "
    "price per return flag — 'the median dollar', not the median "
    "row): order by value within each group, take the running "
    "cumulative weight, and the weighted median is the first value "
    "whose cumulative weight reaches half the total. Quantities are "
    "integer-valued doubles, so every cumulative sum is EXACT in IEEE "
    "arithmetic regardless of summation order — the threshold "
    "comparison cannot flip between engines. Group-partitioned "
    "windows only; the construction generalizes to any importance-"
    "weighted quantile a weighted corpus needs.",
    tags=("stats", "weighted", "window", "bench"),
)
def qty_weighted_median_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Two-pass crossing-bucket form (r15 — VERDICT r14 #3; guide §2.3).
    # r13 ran the flag-partitioned running sum over EVERY row (3 sort
    # tasks see the whole table); r14 pre-aggregated per (flag, price)
    # but l_extendedprice is near-unique, so the 3 serial window tasks
    # still sorted ~all distinct prices (1.34 → 1.91 s, waived as a
    # scale trade). Now NO window ever sees a corpus-sized input:
    # 1. one fact pass pre-sums weight per (flag, price) — the only
    #    corpus-sized exchange, map-side partials (unchanged from r14);
    # 2. prices bucket into fixed $64 ranges (floor(price/64) — exact
    #    IEEE division by a power of two, monotone in price), and the
    #    running sum over per-bucket totals finds the bucket where the
    #    cumulative crosses half the total: window input is the PRICE
    #    DOMAIN / 64 (~1.6k rows per flag), bounded by the domain, not
    #    the row count, at any scale;
    # 3. the crossing price is resolved INSIDE that one bucket: its
    #    (flag, price) rows (domain-bounded: ≤ 6400 cent values) get
    #    the running sum seeded with the cumulative weight before the
    #    bucket.
    # Exactness: quantities are integer-valued doubles, so every
    # regrouped sum is the same exact integer regardless of grouping
    # (order-invariant IEEE far below 2^53), and cum_before + in-bucket
    # running sum equals the global prefix sum at every price — the
    # first price with 2*cw >= tw is identical to the oracle's. The
    # pre-aggregated frame is persisted (it feeds the bucket pass and
    # the in-bucket resolution; identical plans share one cache entry).
    g = (
        li.groupBy("l_returnflag", F.col("l_extendedprice").alias("price"))
        .agg(F.sum(F.col("l_quantity").cast("double")).alias("w"))
        .withColumn("bkt", F.floor(F.col("price") / F.lit(64.0)))
        .persist()
    )
    b = g.groupBy("l_returnflag", "bkt").agg(F.sum("w").alias("bw"))
    w_run = (
        Window.partitionBy("l_returnflag")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    bc = b.select(
        "l_returnflag",
        "bkt",
        "bw",
        F.sum("bw").over(w_run).alias("cbw"),
        F.sum("bw").over(w_all).alias("tw"),
    )
    w_first = Window.partitionBy("l_returnflag").orderBy("bkt")
    crossing = (
        bc.where(F.col("cbw") * 2.0 >= F.col("tw"))
        .withColumn("rn", F.row_number().over(w_first))
        .where(F.col("rn") == 1)
        # re-aliased so the g-join below isn't an ambiguous self-join
        .select(
            F.col("l_returnflag").alias("_rf"),
            F.col("bkt").alias("_xbkt"),
            (F.col("cbw") - F.col("bw")).alias("cum_before"),
            "tw",
        )
    )
    w_in = (
        Window.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inb = g.join(
        F.broadcast(crossing),
        (F.col("l_returnflag") == F.col("_rf")) & (F.col("bkt") == F.col("_xbkt")),
    ).select("l_returnflag", "price", "w", "cum_before", "tw")
    cw = inb.select(
        "l_returnflag",
        "price",
        "tw",
        (F.col("cum_before") + F.sum("w").over(w_in)).alias("cw"),
    )
    return cw.groupBy("l_returnflag").agg(
        F.min("tw").cast("double").alias("total_qty"),
        F.min(F.when(F.col("cw") * 2.0 >= F.col("tw"), F.col("price"))).alias(
            "weighted_median_price"
        ),
    )


@query(
    "item_cf_similarity_topk",
    oracle="""
    WITH cp_all AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    cp AS (
        SELECT c, p FROM cp_all
        QUALIFY row_number() OVER (PARTITION BY c ORDER BY p) <= 128
    ),
    pop AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM cp GROUP BY p),
    co AS (
        SELECT a.p AS i, b.p AS j, CAST(count(*) AS BIGINT) AS co_users
        FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
        GROUP BY a.p, b.p
        HAVING count(*) >= 2
    )
    SELECT i, j, co_users,
           floor(co_users / sqrt(CAST(pi.n AS DOUBLE) * CAST(pj.n AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS cosine_sim
    FROM co JOIN pop pi ON co.i = pi.p JOIN pop pj ON co.j = pj.p
    ORDER BY cosine_sim DESC, i ASC, j ASC
    LIMIT 20
    """,
    doc="Item-based collaborative-filtering similarity (the classic "
    "recommender primitive): parts co-purchased by the same CUSTOMERS "
    "(cross-order affinity, unlike the per-basket lift query), scored "
    "by co-occurrence cosine co/sqrt(pop_i*pop_j). Candidate pairs "
    "come from a customer-keyed equi-join (bounded per-customer "
    "fan-out, never all-pairs over items), popularity joins after "
    "aggregation touch only surviving pairs, sqrt is IEEE correctly-"
    "rounded (bit-identical across engines), and scores are floor-"
    "rounded before the rank order so the top-k set is deterministic. "
    "Co-occurrence is inherently quadratic in per-customer basket "
    "size, so baskets are capped at 128 parts (deterministic "
    "smallest-partkey selection, a partition-parallel per-customer "
    "window) BEFORE expansion — the standard CF bound that keeps total "
    "pair work linear in customers at any scale. The cap exceeds every "
    "base-fixture basket (max 105 at sf0.1), so small-SF results are "
    "bit-identical to the uncapped form; at x30 it cuts the pair "
    "expansion from 10.8B to ~120M. The oracle applies the identical "
    "cap via QUALIFY.",
    tags=("stats", "recommender", "join"),
)
def item_cf_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    from pyspark.sql import Window

    cp = (
        li.join(orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        # basket cap (see doc): deterministic smallest-partkey top-128
        # per customer via a per-customer window (partition-parallel,
        # never a global sort) — bounds the quadratic expansion below.
        .withColumn("rn", F.row_number().over(Window.partitionBy("c").orderBy("p")))
        .where(F.col("rn") <= 128)
        .drop("rn")
        .localCheckpoint()
    )
    pop = cp.groupBy("p").agg(F.count("*").cast("long").alias("n"))
    a = cp.select("c", F.col("p").alias("i"))
    b = cp.select("c", F.col("p").alias("j"))
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    a = a.repartition(width, "c")
    b = b.repartition(width, "c")
    co = (
        a.join(b, "c")
        .where(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count("*").cast("long").alias("co_users"))
        .where(F.col("co_users") >= 2)
    )
    pi = pop.select(F.col("p").alias("i"), F.col("n").alias("ni"))
    pj = pop.select(F.col("p").alias("j"), F.col("n").alias("nj"))
    return (
        co.join(pi, "i")
        .join(pj, "j")
        .select(
            "i",
            "j",
            "co_users",
            (
                F.floor(
                    F.col("co_users")
                    / F.sqrt(F.col("ni").cast("double") * F.col("nj").cast("double"))
                    * 1000000.0
                    + 0.5
                )
                / 1000000.0
            ).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("i").asc(), F.col("j").asc())
        .limit(20)
    )


@query(
    "user_loyalty_balance",
    oracle="""
    WITH d AS (
        -- deltas quantized to 1e-6 integer units: integer addition is
        -- exact and ASSOCIATIVE, so the running sums are identical even
        -- if one engine evaluates the cumulative frame with a segment
        -- tree (different association order than left-to-right doubles)
        SELECT user_id, ts, event_id,
               CAST(CASE WHEN event_type = 'purchase'
                         THEN -floor(value * 1000000.0 + 0.5)
                         WHEN event_type IN ('view', 'click')
                         THEN floor(value * 1000000.0 + 0.5)
                    ELSE 0 END AS BIGINT) AS delta
        FROM events
    ),
    p AS (
        SELECT user_id, ts, event_id,
               sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
        FROM d
    ),
    b AS (
        SELECT user_id, ts, event_id, pfx,
               min(pfx) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin,
               row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn_last
        FROM p
    ),
    bal AS (
        SELECT user_id, rn_last,
               pfx - CASE WHEN runmin < 0 THEN runmin ELSE 0 END AS balance
        FROM b
    )
    SELECT user_id,
           floor(CAST(max(CASE WHEN rn_last = 1 THEN balance END) AS DOUBLE)
                 / 100.0 + 0.5) / 10000.0 AS final_balance,
           floor(CAST(max(balance) AS DOUBLE) / 100.0 + 0.5) / 10000.0
               AS peak_balance
    FROM bal
    GROUP BY user_id
    """,
    doc="Zero-clamped running balance (loyalty points: earn on "
    "view/click, burn on purchase, never below zero) — the recurrence "
    "b_t = max(0, b_{t-1} + d_t) LOOKS like it needs a per-key "
    "imperative scan, but the Lindley/reflection identity "
    "b_t = prefix_t - min(0, min_{s<=t} prefix_s) turns it into TWO "
    "ordered windows (running sum, running min) — fully distributed, "
    "user-partitioned, no UDF, no state store. Deltas are quantized to "
    "1e-6 integer units so the whole chain is exact associative BIGINT "
    "arithmetic — bit-identical however each engine associates the "
    "cumulative frame (segment tree or stream).",
    tags=("stats", "window", "recurrence", "bench"),
)
def user_loyalty_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # deltas in 1e-6 integer units: the whole prefix-sum/min chain runs
    # in exact associative BIGINT arithmetic, immune to how either
    # engine associates the cumulative window (segment tree vs stream).
    delta = (
        F.when(F.col("event_type") == "purchase", -F.floor(F.col("value") * 1000000.0 + 0.5))
        .when(F.col("event_type").isin("view", "click"), F.floor(F.col("value") * 1000000.0 + 0.5))
        .otherwise(F.lit(0))
        .cast("long")
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    p = ev.select("user_id", "ts", "event_id", delta.alias("delta")).withColumn(
        "pfx", F.sum("delta").over(w_run)
    )
    b = (
        p.withColumn("runmin", F.min("pfx").over(w_run))
        .withColumn("rn_last", F.row_number().over(w_last))
        .withColumn(
            "balance",
            F.col("pfx")
            - F.when(F.col("runmin") < 0, F.col("runmin")).otherwise(F.lit(0)),
        )
    )
    return b.groupBy("user_id").agg(
        (
            F.floor(
                F.max(F.when(F.col("rn_last") == 1, F.col("balance"))).cast("double")
                / 100.0
                + 0.5
            )
            / 10000.0
        ).alias("final_balance"),
        (
            F.floor(F.max("balance").cast("double") / 100.0 + 0.5) / 10000.0
        ).alias("peak_balance"),
    )
