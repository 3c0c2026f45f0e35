"""Distributed global ranking without a single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` funnels the entire
input through ONE task — the classic Spark scale trap (and the
anti-pattern the round-3 review flagged in an earlier operator).
Global order statistics (dense ranks, Gini, exact quantile indexes)
still need a total order, so this module provides the standard
two-pass banded formulation that keeps every stage partitioned:

1. one aggregate pass computes the band boundaries (a 1-row scalar,
   broadcast via cross join);
2. rows are bucketed into ``n_bands`` value bands — equi-depth
   boundaries from an approx-percentile sketch by default (skew-proof
   balance), or fixed-width [min, max] slices — either way a pure
   function of the value, so results never depend on the choice;
3. per-band counts (≤ ``n_bands`` rows) get prefix-sum offsets with a
   window over the *aggregated* band table (tiny by construction —
   this is the only unpartitioned window, over at most ``n_bands``
   rows, never over the data);
4. each row's global rank = its band's offset + its row_number
   *within* the band (window partitioned by band).

Exact (ties broken by caller-supplied tie columns, identical to a
plain ``row_number() OVER (ORDER BY ...)``) and shuffle-bounded: the
widest exchange is hash-partitioned by band. Equivalent distributed
sort-rank is what Spark's own ``sortBy``/range partitioner does
internally; expressing it in the DataFrame API keeps Catalyst in
charge of the physical plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def global_rank(
    df: DataFrame,
    value_col: str,
    tie_cols: tuple[str, ...] = (),
    n_bands: int = 256,
    rank_col: str = "global_rank",
    bands: str = "quantile",
) -> DataFrame:
    """Append 1-based ascending ``rank_col`` ordered by
    ``(value_col, *tie_cols)`` without a global single-partition
    window. ``value_col`` must be numeric and non-null.

    ``bands="quantile"`` (default) draws band boundaries from
    ``percentile_approx`` — equi-DEPTH bands, so a skewed value
    distribution (exponential tails, outlier spikes) still spreads
    rows evenly across band partitions. ``bands="width"`` uses
    fixed-width [min, max] slices — cheaper bounds pass, fine for
    near-uniform values. The choice affects ONLY plan balance: band
    assignment is a pure function of the value, so the computed ranks
    are identical either way (approx-sketch nondeterminism in the
    boundary placement is therefore harmless). The irreducible case
    is a single value dominating the column: ties must share a band
    (rank order inside a tie run still comes from ``tie_cols``), so
    duplicates of one value always land in one partition — that is a
    property of order statistics, not of the banding."""
    v = F.col(value_col)
    if n_bands <= 1:
        banded = df.withColumn("__band", F.lit(0))
    elif bands == "quantile":
        probs = [i / n_bands for i in range(1, n_bands)]
        bounds = df.agg(
            F.percentile_approx(v, F.array(*[F.lit(p) for p in probs]), F.lit(2000)).alias(
                "__bs"
            )
        )
        banded = (
            df.crossJoin(F.broadcast(bounds))
            .withColumn(
                "__band",
                F.size(F.filter(F.col("__bs"), lambda b: b < v)).cast("int"),
            )
            .drop("__bs")
        )
    elif bands == "width":
        bounds = df.agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))
        banded = df.crossJoin(F.broadcast(bounds)).withColumn(
            "__band",
            F.when(
                F.col("__hi") > F.col("__lo"),
                F.least(
                    F.floor((v - F.col("__lo")) / ((F.col("__hi") - F.col("__lo")) / n_bands)),
                    F.lit(n_bands - 1),
                ),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        ).drop("__lo", "__hi")
    else:
        raise ValueError(f"bands must be 'quantile' or 'width', got {bands!r}")

    # Band offsets: prefix sum over the aggregated (≤ n_bands rows)
    # band-count table. The unpartitioned window here is safe — it
    # runs over the tiny aggregate, not the data.
    counts = banded.groupBy("__band").agg(F.count("*").alias("__n"))
    offsets = counts.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy("__band").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("__band", "__offset")

    within = Window.partitionBy("__band").orderBy(
        v.asc(), *[F.col(c).asc() for c in tie_cols]
    )
    return (
        banded.join(F.broadcast(offsets), "__band")
        .withColumn(rank_col, (F.col("__offset") + F.row_number().over(within)).cast("bigint"))
        .drop("__band", "__offset")
    )
