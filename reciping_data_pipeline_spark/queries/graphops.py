"""Iterative graph analytics on the part co-purchase graph.

Builds on ``operators/graph.pagerank`` (bulk-synchronous power
iteration: one equi-join + one keyed aggregation per round, O(V)
state, O(E) shuffles — the Pregel lowering) the same way the triangle
and connected-components queries build on their operators. The DuckDB
oracle UNROLLS the three iterations as chained CTEs computing the
identical double arithmetic, so the driver hash checks the full
iterative computation, not just its shape.

The edge-construction CTEs carry ``AS MATERIALIZED``: DuckDB inlines
multiply-referenced CTEs by default, and the unrolled iterations
reference ``ed``/``deg`` once per round — at the ×30 scaled fixture the
inlined plan recomputed the 18M-row DISTINCT + pair join ~8×
concurrently and spilled 67 GB of hash tables to temp before dying
(r08 finding). Materialization pins each stage to one execution; the
hint is oracle-side only and invisible to the small-SF gates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.operators.graph import cooccurrence_edges, pagerank
from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table

# One PageRank iteration as a DuckDB CTE body: rank flows from {prev}
# over the symmetric edge list. Per-edge contributions are quantized
# to integer units of 1e-12 (floor form — identical IEEE ops on both
# engines) and summed as integers: integer addition is exact and
# order-invariant, so the round's mass is bit-identical regardless of
# summation order — a raw double sum(pr/deg) accumulates in partition
# order on Spark but scan order in DuckDB and can differ by an ulp,
# flipping the final 6-dp floor when a value sits on a half boundary.
# (1 - d) is computed in doubles so the constant folds identically.
_ITER = """
{name} AS (
    SELECT ed.dst AS node,
           (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n.n
             + CAST(0.85 AS DOUBLE)
               * (CAST(sum(CAST(floor({prev}.pr / deg.deg * 1000000000000.0
                                      + 0.5) AS BIGINT)) AS DOUBLE)
                  / 1000000000000.0) AS pr
    FROM ed
    JOIN deg ON ed.src = deg.src
    JOIN {prev} ON ed.src = {prev}.node
    CROSS JOIN n
    GROUP BY ed.dst, n.n
)"""


@query(
    "copurchase_pagerank",
    oracle=f"""
    WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    ed AS MATERIALIZED (SELECT u AS src, v AS dst FROM e
           UNION ALL SELECT v AS src, u AS dst FROM e),
    deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM ed GROUP BY src),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
    r0 AS (SELECT deg.src AS node, CAST(1 AS DOUBLE) / n.n AS pr
           FROM deg CROSS JOIN n),
    {_ITER.format(name="r1", prev="r0")},
    {_ITER.format(name="r2", prev="r1")},
    {_ITER.format(name="r3", prev="r2")}
    SELECT node AS l_partkey,
           floor(pr * 1000000.0 + 0.5) / 1000000.0 AS pagerank
    FROM r3
    ORDER BY pagerank DESC, node ASC
    LIMIT 20
    """,
    doc="PageRank centrality of parts in the co-purchase graph "
    "(support >= 2 edges, symmetrized): 3 power iterations from the "
    "uniform vector, damping 0.85 — 'which products anchor the "
    "co-purchase network' rather than raw degree. Each iteration is "
    "one rank->edge equi-join plus one dst-keyed aggregation "
    "(map-side partials absorb celebrity-node in-degree skew); the "
    "rank vector is localCheckpoint-pinned so iteration t never "
    "re-executes t-1 (no DataFrame CSE in Spark). Per-round mass sums "
    "are quantized to 1e-12 integer units and summed as BIGINT — "
    "exact, order-invariant, bit-identical across engines and "
    "partitionings. Scores floor-rounded at 6dp; the oracle unrolls "
    "the identical arithmetic.",
    tags=("graph", "iterative", "join", "bench"),
)
def copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Symmetrized support>=2 edges via the single-exchange
    # distinct+self-join builder (operators/graph.py, r15 form); the
    # symmetric pagerank path then skips the node-set union-distinct,
    # the dangling probe, and the per-round teleport backfill join.
    ed = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", min_support=2, symmetric=True
    ).select(F.col("u").alias("src"), F.col("v").alias("dst"))
    ranks = pagerank(ed, damping=0.85, iterations=3, symmetric=True)
    return (
        ranks.select(
            F.col("node").alias("l_partkey"),
            (F.floor(F.col("rank") * 1000000.0 + 0.5) / 1000000.0).alias("pagerank"),
        )
        .orderBy(F.col("pagerank").desc(), F.col("l_partkey").asc())
        .limit(20)
    )


# One synchronous LPA round as a DuckDB CTE pair: every node adopts
# the MODE of its neighbours' labels, ties broken by the SMALLEST
# label — fully deterministic, so the oracle replays it exactly.
_LPA_ITER = """
c{i} AS (
    SELECT ed.dst AS node, {prev}.lbl, count(*) AS cnt
    FROM ed JOIN {prev} ON ed.src = {prev}.node
    GROUP BY ed.dst, {prev}.lbl
),
l{i} AS (
    SELECT node, lbl
    FROM (SELECT node, lbl,
                 row_number() OVER (PARTITION BY node
                      ORDER BY cnt DESC, lbl ASC) AS rn
          FROM c{i})
    WHERE rn = 1
)"""


@query(
    "copurchase_label_propagation",
    oracle=f"""
    WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    ed AS MATERIALIZED (SELECT u AS src, v AS dst FROM e
           UNION ALL SELECT v AS src, u AS dst FROM e),
    l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM ed),
    {_LPA_ITER.format(i=1, prev="l0")},
    {_LPA_ITER.format(i=2, prev="l1")}
    SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members
    FROM l2
    GROUP BY lbl
    HAVING count(*) >= 2
    ORDER BY n_members DESC, community ASC
    LIMIT 30
    """,
    doc="Community detection by synchronous label propagation on the "
    "co-purchase graph: 2 rounds where every node adopts its "
    "neighbourhood's MODE label (ties -> smallest label, so the "
    "computation is fully deterministic — async LPA is not). Each "
    "round is one equi-join + one node-keyed exchange shared by the "
    "(node,label) count and the top-1 window (rank-limit pushdown); "
    "O(E) shuffles, O(V) state, same Pregel lowering as PageRank but "
    "with an argmax combiner instead of a sum. Output: communities of "
    "size >= 2. Exact integer arithmetic end to end; the oracle "
    "unrolls both rounds.",
    tags=("graph", "iterative", "community", "bench"),
)
def copurchase_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Support>=2 symmetrized edges via the single-exchange builder
    # (operators/graph.py — repartition(_k) shared by distinct + join).
    ed = (
        cooccurrence_edges(li, "l_orderkey", "l_partkey", min_support=2, symmetric=True)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .localCheckpoint()
    )
    lbl = ed.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    # Per-round shape (r15, guide §2.4 — remeasured): ONE explicit
    # node-keyed exchange that both the (node, lbl) count and the top-1
    # window reuse (hash(node) satisfies the count's (node, lbl)
    # clustering; the window is node-partitioned). r13 paid two
    # exchanges here (count on (node,lbl), window on node); r14's
    # max(struct) argmax was MEASURED WORSE than both — a struct
    # aggregation buffer is not hash-aggregable, so it planned as
    # SortAggregate and ADDED a map-side and a reduce-side sort per
    # round (5.90 vs 5.06 vs 4.20 s full-query medians on one host;
    # the r14 "hash aggregation with map-side partials" rationale was
    # wrong about the physical plan). The window's rank-limit pushdown
    # (WindowGroupLimit) keeps per-task state at one row per node, and
    # the count is a hash aggregation, so a celebrity node costs one
    # task a hash pass over its degree — no per-round full sort
    # anywhere. Counts are exact integers; ties break (cnt DESC,
    # lbl ASC) — deterministic, same result on every path.
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(), F.col("lbl").asc())
    for _ in range(2):
        lbl = (
            ed.join(lbl.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), "lbl")
            .repartition(F.col("node"))
            .groupBy("node", "lbl")
            .agg(F.count("*").alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "lbl")
            .localCheckpoint()
        )
    return (
        lbl.groupBy(F.col("lbl").alias("community"))
        .agg(F.count("*").cast("long").alias("n_members"))
        .where(F.col("n_members") >= 2)
        .orderBy(F.col("n_members").desc(), F.col("community").asc())
        .limit(30)
    )
