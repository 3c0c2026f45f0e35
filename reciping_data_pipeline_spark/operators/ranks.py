"""Distributed global ranking without a single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` funnels the entire
input through ONE task — the classic Spark scale trap (and the
anti-pattern the round-3 review flagged in an earlier operator).
Global order statistics (dense ranks, Gini, exact quantile indexes)
still need a total order, so this module provides the standard
two-pass banded formulation that keeps every stage partitioned:

1. one aggregate pass computes the value range (a 1-row scalar,
   broadcast via cross join);
2. rows are bucketed into ``n_bands`` fixed-width value bands — a
   deterministic, data-independent partitioning key;
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
from pyspark.sql import Column, DataFrame, Window


def global_rank(
    df: DataFrame,
    value_col: str,
    tie_cols: tuple[str, ...] = (),
    n_bands: int = 256,
    rank_col: str = "global_rank",
) -> DataFrame:
    """Append 1-based ascending ``rank_col`` ordered by
    ``(value_col, *tie_cols)`` without a global single-partition
    window. ``value_col`` must be numeric and non-null."""
    v = F.col(value_col)
    bounds = df.agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi")
    )
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
