"""operators/ranks.global_rank: exact equivalence with a plain global
row_number window, plus the plan property that motivates it (the data
never funnels through a single-partition window)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from reciping_data_pipeline_spark.operators.ranks import global_rank
from reciping_data_pipeline_spark.plans import inspect


def _fixture(spark, n=500):
    # Adversarial value distribution: heavy ties (mod 7), clustered
    # bands, plus an outlier spike at one end.
    return spark.range(n).select(
        F.col("id").alias("k"),
        (
            F.when(F.col("id") % 50 == 0, 1e6).otherwise((F.col("id") * 37 % 7).cast("double"))
        ).alias("v"),
    )


def test_global_rank_matches_window_row_number(spark):
    df = _fixture(spark)
    got = {
        r["k"]: r["rk"]
        for r in global_rank(df, "v", ("k",), n_bands=16, rank_col="rk").collect()
    }
    w = Window.orderBy(F.col("v").asc(), F.col("k").asc())
    want = {
        r["k"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_rank_constant_column(spark):
    """Degenerate min==max input: single band, still a correct total
    order by the tie columns."""
    df = spark.range(20).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    rows = global_rank(df, "v", ("k",), n_bands=8, rank_col="rk").collect()
    assert sorted((r["k"], r["rk"]) for r in rows) == [(i, i + 1) for i in range(20)]


def test_global_rank_data_window_is_band_partitioned(spark):
    """The row_number window over the DATA must be partitioned by the
    band key; only the tiny band-offset table may see an
    unpartitioned window."""
    df = global_rank(_fixture(spark), "v", ("k",), n_bands=16, rank_col="rk")
    plan = inspect.simple_plan(df)
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "__band" in line, line


@pytest.mark.parametrize("bands", ["quantile", "width"])
@pytest.mark.parametrize("n_bands", [1, 2, 16, 1024])
@pytest.mark.parametrize("dist", ["negatives", "skewed", "two_values"])
def test_global_rank_adversarial_distributions(spark, dist, n_bands, bands):
    """Exactness must hold for any band count (bands affect only the
    plan, never the result): negative ranges, heavy exponential skew
    (nearly everything lands in band 0), and a two-value column where
    most bands are empty."""
    base = spark.range(300).selectExpr("id AS k")
    if dist == "negatives":
        df = base.selectExpr("k", "CAST(-(k % 13) * 7.5 AS DOUBLE) AS v")
    elif dist == "skewed":
        df = base.selectExpr("k", "CAST(exp(k % 40) AS DOUBLE) AS v")
    else:
        df = base.selectExpr("k", "CAST(CASE WHEN k % 97 = 0 THEN 1e9 ELSE 1.0 END AS DOUBLE) AS v")
    got = {
        r["k"]: r["rk"]
        for r in global_rank(
            df, "v", ("k",), n_bands=n_bands, rank_col="rk", bands=bands
        ).collect()
    }
    w = Window.orderBy(F.col("v").asc(), F.col("k").asc())
    want = {
        r["k"]: r["rk"] for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want
