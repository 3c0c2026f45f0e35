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


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    grid: float | None = 1e12,
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
    double accumulation (deterministic only up to summation order)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_total = F.broadcast(nodes.agg(F.count("*").alias("n")))
    ranks = nodes.crossJoin(n_total).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    ).localCheckpoint()
    contrib_edges = e.join(deg, "src").localCheckpoint()  # (src, dst, deg), reused per round
    dangling = nodes.join(
        deg.withColumnRenamed("src", "node"), "node", "left_anti"
    ).localCheckpoint()
    has_dangling = not dangling.isEmpty()
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
