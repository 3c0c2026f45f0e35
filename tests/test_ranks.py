"""operators/ranks.global_rank: exact equivalence with a plain global
row_number window, plus the plan property that motivates it (the data
never funnels through a single-partition window)."""

from __future__ import annotations

import pyspark.sql.functions as F
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
