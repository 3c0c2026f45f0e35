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
