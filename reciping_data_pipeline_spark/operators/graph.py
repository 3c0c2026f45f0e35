"""Distributed PageRank over an edge DataFrame.

Complements the pointer-doubling connected-components operator
(``operators/dedup.py``) with the other canonical iterative graph
computation. Power iteration in pure DataFrame ops:

    r_{t+1}(v) = (1-d)/N + d * (sum_{u -> v} r_t(u) / out_deg(u)
                                + dangling_mass_t / N)

Each iteration is ONE equi-join (ranks onto edge sources, shuffle
keyed on the join column) plus ONE aggregation (shuffle keyed on the
destination) — the textbook bulk-synchronous formulation every
distributed graph engine lowers to. No driver-side loops over data:
the Python ``for`` drives plan construction only, and per-iteration
``localCheckpoint`` pins the O(V) rank vector so lineage doesn't
re-execute earlier rounds (Spark has no DataFrame-level
common-subexpression reuse across iterations).

General directed graphs are handled fully: the node set is
src ∪ dst, nodes without in-edges keep receiving the teleport term
(left join + coalesce, never silently dropped), and dangling nodes
(out-degree 0) redistribute their rank mass uniformly each round — a
1-row broadcast aggregate, exactly Brin/Page's correction. For
symmetric edge sets (undirected graphs fed as both directions) there
are no dangling nodes and the correction short-circuits to zero.

Scale: state is O(V) rows and each round's shuffles are O(E) — the
same asymptotics as GraphX/Pregel. Skewed in-degree (celebrity
nodes) is absorbed by map-side partial aggregation on the dst key;
AQE handles residual reducer skew.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    symmetric: bool = False,
) -> DataFrame:
    """Support-filtered co-occurrence edges from ``(group, item)`` rows:
    distinct ``(group, item)`` → group-keyed self-join (``u < v``) →
    pair-keyed support count.

    The self-join shape is deliberate (r14 re-measurement). An earlier
    r14 draft expanded pairs in-task from a per-group
    ``sort_array(collect_set(...))`` with nested array lambdas to "save
    the join's second shuffle" — but Spark plans the self-join's two
    sides as ONE exchange plus a ``ReusedExchange`` (identical
    subplans), so the claimed extra network pass never existed, while
    the array form paid interpreted higher-order-function evaluation
    per emitted pair (HOFs don't participate in whole-stage codegen;
    measured 4.9 s vs 3.1 s for the sf0.1 co-purchase edge list) AND
    concentrated each group's O(k²) expansion in the single task
    holding the group's array — the hub-group skew hazard AQE's
    skew-join splitting exists to absorb, which only applies to joins.
    Pair multiset is identical either way.

    ``symmetric=True`` appends the reversed orientation of the
    support-filtered edges — an edge-sized union AFTER the count, not a
    second pass over the fact rows. Output columns: ``(u, v)`` each
    with support >= ``min_support``.

    One fact-sized exchange, not two (r15, guide §2.4): the explicit
    ``repartition(_k)`` establishes the partitioning BOTH the distinct
    (hash(_k) co-locates every (_k, _i)) and the group-keyed self-join
    need, so neither adds its own exchange — previously the distinct
    exchanged on (_k, _i) and the join re-exchanged its output on _k.
    The distinct aggregation now runs once per join side (it sits
    above the reused exchange instead of below it); an in-memory hash
    pass costs less than a fact-sized network+disk exchange (measured
    3.95 → 3.48 s on the sf0.1 edge list; the r14 note about the agg
    being computed once below the reused exchange described the OLD
    shape). The join stays sort-merge: forcing a shuffled-hash join
    measured another ~4% here, but its per-partition build map on a
    100 TB distinct table is an OOM class the 8-row-sort SMJ is not —
    deployments that size partitions properly get SHJ via
    ``spark.sql.join.preferSortMergeJoin=false`` without code changes.
    """
    d = (
        df.select(F.col(group_col).alias("_k"), F.col(item_col).alias("_i"))
        .repartition(F.col("_k"))
        .distinct()
    )
    pairs = (
        d.select("_k", F.col("_i").alias("u"))
        .join(d.select("_k", F.col("_i").alias("v")), on="_k")
        .where(F.col("u") < F.col("v"))
    )
    e = (
        pairs.groupBy("u", "v")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
        .select("u", "v")
    )
    if symmetric:
        e = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return e


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    grid: float | None = 1e12,
    symmetric: bool = False,
) -> DataFrame:
    """Ranks after ``iterations`` rounds of power iteration from the
    uniform vector over the DIRECTED edge list ``edges`` (feed both
    directions for an undirected graph). Nodes = src ∪ dst; dangling
    mass is redistributed uniformly. Returns ``(node, rank)``.

    With the default ``grid``, each round's per-edge contribution
    ``r/deg`` is quantized to integer units of ``1/grid`` (floor form
    — identical IEEE ops everywhere) and summed as BIGINT: integer
    addition is exact and ORDER-INVARIANT, so the result is
    bit-identical regardless of partition count, engine, or shuffle
    order — double summation order varies between Spark partitions and
    a SQL oracle and can flip the last ulp near a rounding boundary.
    The quantization error (≤ in_deg/2 units ≈ 1e-10 at the default)
    sits far below any reported precision. ``grid=None`` restores pure
    double accumulation (deterministic only up to summation order).

    ``symmetric=True`` asserts every node appears as BOTH src and dst
    (an undirected graph fed as two directed copies). That collapses
    three whole shuffles the general path must pay: the node set IS the
    out-degree key set (no src ∪ dst union-distinct), there are no
    dangling nodes (no anti-join probe, no per-round dangling-mass
    aggregate), and every node receives contributions each round so the
    per-iteration nodes-left-join teleport backfill disappears — each
    round is exactly one equi-join plus one keyed aggregation, the
    Pregel floor. The arithmetic is bit-identical to the general path
    on such graphs (``coalesce(mass, 0.0)`` on non-null mass and
    ``mass + 0.0`` on positive doubles are both exact identities)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    if symmetric:
        # O(V) and reused for nodes + the per-round contribution join.
        deg = deg.localCheckpoint()
        nodes = deg.select(F.col("src").alias("node"))
        has_dangling = False
        dangling = None
    else:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionAll(e.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint()
        )
        dangling = nodes.join(
            deg.withColumnRenamed("src", "node"), "node", "left_anti"
        ).localCheckpoint()
        has_dangling = not dangling.isEmpty()
    n_total = F.broadcast(nodes.agg(F.count("*").alias("n")))
    ranks = nodes.crossJoin(n_total).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    ).localCheckpoint()
    contrib_edges = e.join(deg, "src").localCheckpoint()  # (src, dst, deg), reused per round
    for _ in range(iterations):
        term = F.col("rank") / F.col("deg")
        if grid is not None:
            mass_sum = (
                F.sum(F.floor(term * F.lit(float(grid)) + 0.5)).cast("double")
                / F.lit(float(grid))
            ).alias("mass")
        else:
            mass_sum = F.sum(term).alias("mass")
        contribs = (
            contrib_edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(mass_sum)
        )
        if has_dangling:
            if grid is not None:
                dsum = (
                    F.coalesce(
                        F.sum(F.floor(F.col("rank") * F.lit(float(grid)) + 0.5)),
                        F.lit(0).cast("long"),
                    ).cast("double")
                    / F.lit(float(grid))
                ).alias("dmass")
            else:
                dsum = F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
            dmass = F.broadcast(dangling.join(ranks, "node").agg(dsum))
        else:
            # No dangling nodes: the correction is EXACTLY zero and
            # `mass + 0.0` is bit-identical to `mass` (mass > 0), so
            # symmetric-graph results match the correction-free
            # arithmetic an unrolled SQL oracle computes.
            dmass = None
        if symmetric:
            # Every node has in-edges, so `contribs` already covers the
            # full node set and mass is never null: the nodes-left-join
            # backfill is the identity. `mass` (non-null, positive)
            # equals coalesce(mass, 0.0) + 0.0 bit-for-bit.
            ranks = contribs.crossJoin(n_total)
            mass = F.col("mass")
        else:
            ranks = nodes.join(contribs, "node", "left").crossJoin(n_total)
            if dmass is not None:
                ranks = ranks.crossJoin(dmass)
            mass = F.coalesce(F.col("mass"), F.lit(0.0)) + (
                F.col("dmass") / F.col("n") if dmass is not None else F.lit(0.0)
            )
        ranks = ranks.select(
            "node",
            # (1 - d) computed IN DOUBLES (not folded to a decimal
            # constant) so an oracle doing CAST(1 AS DOUBLE) -
            # CAST(0.85 AS DOUBLE) lands on the identical bits.
            (
                (F.lit(1.0) - F.lit(damping)) / F.col("n")
                + F.lit(damping) * mass
            ).alias("rank"),
        ).localCheckpoint()
    return ranks
