"""operators/sampling.weighted_sample: determinism, the exact k=1
weighted-draw law (within sampling error over many independent
seeds), without-replacement semantics, and the top-k plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from reciping_data_pipeline_spark.operators.sampling import weighted_sample
from reciping_data_pipeline_spark.plans import inspect


def _items(spark):
    return spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 2.0), (4, 4.0)], "doc_id INT, w DOUBLE"
    )


def test_weighted_sample_deterministic_and_partition_invariant(spark):
    df = _items(spark)
    a = sorted(r["doc_id"] for r in weighted_sample(df, 2, "w", seed=7).collect())
    b = sorted(
        r["doc_id"]
        for r in weighted_sample(df.repartition(16), 2, "w", seed=7).collect()
    )
    assert a == b and len(a) == 2


def test_weighted_sample_k1_matches_weight_law(spark):
    """With weights [1, 1, 2, 4] the k=1 inclusion probabilities are
    exactly [1/8, 1/8, 1/4, 1/2] (exponential races). 400 independent
    seeds give a binomial CI comfortably inside ±0.09."""
    df = _items(spark).cache()
    counts = {1: 0, 2: 0, 3: 0, 4: 0}
    for seed in range(400):
        winner = weighted_sample(df, 1, "w", seed=seed).collect()[0]["doc_id"]
        counts[winner] += 1
    freq = {k: v / 400 for k, v in counts.items()}
    assert abs(freq[4] - 0.5) < 0.09, freq
    assert abs(freq[3] - 0.25) < 0.09, freq
    assert abs(freq[1] - 0.125) < 0.09 and abs(freq[2] - 0.125) < 0.09, freq


def test_weighted_sample_without_replacement_and_zero_weights(spark):
    df = spark.createDataFrame(
        [(i, 0.0 if i % 2 == 0 else 1.0) for i in range(20)], "doc_id INT, w DOUBLE"
    )
    got = [r["doc_id"] for r in weighted_sample(df, 5, "w", seed=3).collect()]
    assert len(got) == len(set(got)) == 5
    assert all(i % 2 == 1 for i in got)  # zero-weight rows never win


def test_weighted_sample_plans_as_take_ordered(spark):
    df = _items(spark)
    plan = inspect.simple_plan(weighted_sample(df, 2, "w"))
    assert "TakeOrderedAndProject" in plan, plan


def test_stratified_weighted_sample_quota_and_law(spark):
    """Exactly k winners per stratum, drawn by the same exponential-key
    law within each stratum (heavy item wins its stratum's k=1 draw
    about w/(sum w) of the time), deterministic per seed."""
    from reciping_data_pipeline_spark.operators.sampling import (
        stratified_weighted_sample,
    )

    rows = [(s * 100 + i, f"s{s}", 9.0 if i == 0 else 1.0) for s in range(3) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id INT, src STRING, w DOUBLE").cache()
    out = stratified_weighted_sample(df, 2, "w", "src", seed=5)
    got = [(r["src"], r["doc_id"]) for r in out.collect()]
    per = {}
    for s, d in got:
        per.setdefault(s, []).append(d)
    assert all(len(v) == 2 for v in per.values()) and len(per) == 3
    # same seed, different partitioning -> identical draw
    again = stratified_weighted_sample(df.repartition(16), 2, "w", "src", seed=5)
    assert sorted(got) == sorted((r["src"], r["doc_id"]) for r in again.collect())
    # law: the weight-9 item (P = 9/18 = 0.5 for its stratum's first
    # pick) should lead stratum s0's draw roughly half of 120 seeds
    wins = 0
    for seed in range(120):
        top = (
            stratified_weighted_sample(df.where("src = 's0'"), 1, "w", "src", seed=seed)
            .collect()[0]["doc_id"]
        )
        wins += top == 0
    assert 0.3 < wins / 120 < 0.7, wins
