"""Salted-join equivalence + skew distribution."""

from __future__ import annotations

import pyspark.sql.functions as F

from reciping_data_pipeline_spark.operators.skew import salted_inner_join


def test_salted_join_matches_plain_join(spark):
    # 90% of left rows share one hot key
    left = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("rval"))
    plain = left.join(right, on="k")
    salted = salted_inner_join(left, right, on="k", salt_factor=8)
    assert salted.count() == plain.count()
    a = plain.agg(F.sum(F.col("lval") + F.col("rval"))).collect()[0][0]
    b = salted.agg(F.sum(F.col("lval") + F.col("rval"))).collect()[0][0]
    assert a == b


def test_sequence_packing_shard_fans_out_single_source(spark):
    """A corpus that is 100% one source must fan the packing window out
    across n_buckets groups (per-bucket packing, not one serial task),
    and sharding must preserve the doc/token totals exactly."""
    from reciping_data_pipeline_spark.queries.corpusops import pack_sequences

    docs = spark.range(0, 5_000).select(
        F.lit("webcrawl").alias("source"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 300 + 1).alias("n_tok"),
    )
    packed = pack_sequences(docs, n_buckets=8)
    # window partition key includes the bucket: >= 8 distinct groups
    assert packed.select("bucket").distinct().count() == 8
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan and "Window" in plan
    # sharding redistributes docs among bins; totals are invariant
    unsharded = pack_sequences(docs)
    row = lambda df: df.agg(  # noqa: E731
        F.sum("n_docs").alias("docs"), F.sum("bin_tokens").alias("toks")
    ).collect()[0]
    assert tuple(row(packed)) == tuple(row(unsharded))


def test_connected_components_chain_converges_in_log_rounds(spark):
    """A 512-vertex path graph (diameter 511) must converge via pointer
    doubling in ~log2(n) rounds, not O(n), and label every vertex with
    the global min."""
    from reciping_data_pipeline_spark.operators.dedup import connected_components

    edges = spark.range(0, 511).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    stats: dict = {}
    comp = connected_components(edges, max_iter=15, stats=stats)
    rows = comp.collect()
    assert len(rows) == 512
    assert {r["component"] for r in rows} == {0}
    assert stats["converged"] and stats["rounds"] <= 12


def test_connected_components_raises_without_convergence(spark):
    from reciping_data_pipeline_spark.operators.dedup import connected_components

    import pytest as _pytest

    edges = spark.range(0, 200).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2).collect()
