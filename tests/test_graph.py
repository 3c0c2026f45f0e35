"""PageRank operator: general directed graphs — dangling-mass
redistribution, no-in-edge nodes kept, probability conservation —
validated against an independent numpy power iteration."""

from __future__ import annotations

import numpy as np
import pytest


def _numpy_pagerank(n, edges, damping, iterations):
    out_deg = np.zeros(n)
    for u, _ in edges:
        out_deg[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.zeros(n)
        for u, v in edges:
            nxt[v] += r[u] / out_deg[u]
        dmass = r[out_deg == 0].sum()
        r = (1 - damping) / n + damping * (nxt + dmass / n)
    return r


@pytest.mark.parametrize("iterations", [1, 3])
def test_pagerank_directed_with_dangling_matches_reference(spark, iterations):
    from reciping_data_pipeline_spark.operators.graph import pagerank

    # A->B, A->C, B->C, D->A ; C is dangling (no out-edges),
    # D has no in-edges (must still receive teleport + dangling share)
    edges = [(0, 1), (0, 2), (1, 2), (3, 0)]
    e = spark.createDataFrame(edges, "src INT, dst INT")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, damping=0.85, iterations=iterations).collect()
    }
    want = _numpy_pagerank(4, edges, 0.85, iterations)
    assert set(got) == {0, 1, 2, 3}
    for node, rank in got.items():
        assert rank == pytest.approx(want[node], rel=1e-12), (node, rank, want[node])
    # probability mass conserved (teleport + dangling redistribution)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-12)


def test_pagerank_symmetric_graph_has_no_dangling_correction(spark):
    """Symmetric edges: every node has out-degree >= 1, the dangling
    term short-circuits, and ranks still sum to 1."""
    from reciping_data_pipeline_spark.operators.graph import pagerank

    und = [(0, 1), (1, 2)]
    sym = und + [(v, u) for u, v in und]
    e = spark.createDataFrame(sym, "src INT, dst INT")
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=3).collect()}
    want = _numpy_pagerank(3, sym, 0.85, 3)
    for node, rank in got.items():
        assert rank == pytest.approx(want[node], rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-12)
