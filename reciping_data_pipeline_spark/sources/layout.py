"""Multi-dimensional file layout (Z-order) for stats-based skipping.

A table sorted lexicographically on ``(a, b)`` gives tight per-file
min/max bounds on ``a`` only — every file spans the full ``b`` range,
so a ``b`` predicate prunes nothing. Interleaving the bits of the
columns' quantile-bucket indexes (a Z-/Morton curve) makes files cover
small HYPER-RECTANGLES of the value space instead, so manifest-level
min/max skipping (``snapshots.collect_stats`` + ``read_where``) and
parquet row-group skipping both engage on EVERY layout column — the
mechanism behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything is expression-level (quantile bounds broadcast as a 1-row
scalar, bit interleave via shiftleft/or) and the clustering itself is
one ``repartitionByRange`` on the Z-value — a single range shuffle,
exactly what a plain sort costs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_BITS = 4  # quantile buckets per dimension = 2^_BITS


def _interleave(buckets: list[Column]) -> Column:
    """Morton code: bit i of dimension j lands at position
    ``i * ndims + j``. Bucket indexes are < 2^_BITS, so the code fits
    comfortably in a long for any sane dimension count."""
    ndims = len(buckets)
    z = F.lit(0).cast("long")
    for j, b in enumerate(buckets):
        for i in range(_BITS):
            # plain div/mod bit extraction — arithmetic Columns only
            # (the shiftleft/shiftright builtins trip py4j argument
            # conversion in this pyspark build)
            bit = F.floor(b / F.lit(1 << i)) % 2
            z = z + bit * F.lit(1 << (i * ndims + j))
    return z


def zorder_frame(df: DataFrame, cols: list[str], n_files: int = 8) -> DataFrame:
    """Return ``df`` clustered on the Z-value of ``cols``: rows whose
    column values are close in EVERY dimension land in the same file.
    Bucket boundaries come from one ``percentile_approx`` pass
    (broadcast 1-row scalar — boundary nondeterminism only moves file
    boundaries, never rows' values), the Morton code is pure JVM bit
    arithmetic, and the clustering is a single range repartition."""
    probs = [i / (1 << _BITS) for i in range(1, 1 << _BITS)]
    bounds = df.agg(
        *[
            F.percentile_approx(F.col(c), F.array(*[F.lit(p) for p in probs]), F.lit(2000)).alias(
                f"__bs_{c}"
            )
            for c in cols
        ]
    )
    with_buckets = df.crossJoin(F.broadcast(bounds))

    def _bucket(c: str) -> Column:
        # closure, NOT a default-arg lambda: pyspark's higher-order
        # functions introspect the lambda arity, and a (b, c=c)
        # signature is misread as the (element, index) form
        return F.size(F.filter(F.col(f"__bs_{c}"), lambda b: b < F.col(c))).cast("long")

    buckets = [_bucket(c) for c in cols]
    return (
        with_buckets.withColumn("__z", _interleave(buckets))
        .drop(*[f"__bs_{c}" for c in cols])
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
