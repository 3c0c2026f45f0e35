"""Distributed weighted sampling without replacement (exponential keys).

Sampling k items with probability proportional to a weight column —
quality-weighted corpus subset selection, importance-weighted eval
sets — via the A-ES / exponential-races construction: give every row
the key ``-ln(u) / w`` with ``u`` uniform in (0,1) and keep the k
SMALLEST keys. For k=1 this is exactly weighted sampling
(P(argmin = i) = w_i / Σw — competing exponential clocks); for k>1 it
is successive without-replacement draws (Efraimidis-Spirakis A-ES,
the ``u^(1/w)`` formulation under a monotone transform).

Spark shape: one map-side key expression + ``TakeOrderedAndProject``
(per-partition bounded heaps, single k-row merge) — no shuffle of the
data, no RNG state. ``u`` derives from ``xxhash64(id, seed)``, so the
draw is reproducible across runs, executors, and partitionings, and a
new ``seed`` is a fresh independent draw.

Catalog entries ``doc_weighted_sample`` / ``doc_stratified_weighted_
sample`` (``queries/samplingops.py``) drive this operator with an
engine-portable LCG uniform so a DuckDB oracle replays the exact
winner set; the statistical contract (frequency ∝ weight) is
test-gated in ``tests/test_sampling.py``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# xxhash64 output spans the full signed-64 range; fold to (0, 1)
# exclusive: (h mod M + M) mod M maps to [0, M), then +0.5 shifts off
# the endpoints. M = 2^53 keeps every value exactly representable.
_M = 1 << 53


def _uniform(id_col: Column, seed: int) -> Column:
    h = F.xxhash64(id_col, F.lit(seed))
    folded = ((h % _M) + _M) % _M
    return (folded.cast("double") + 0.5) / _M


def _exp_key(u: Column, w: Column, key_grid: float | None) -> Column:
    """The A-ES exponential key, optionally floor-coarsened to a fixed
    grid. ln() is NOT IEEE correctly-rounded (JVM Math.log permits
    1-ulp error; DuckDB uses platform libm), so raw keys can differ by
    an ulp across platforms and flip the winner at the k-th boundary.
    Coarsening to integer grid units (floor form — identical IEEE
    mul/add/floor everywhere) absorbs the ulp; sub-grid ties fall to
    the deterministic id tie-break."""
    key = -F.log(u) / w
    if key_grid is not None:
        key = F.floor(key * F.lit(float(key_grid)) + 0.5)
    return F.when(w > 0, key)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    uniform: Column | None = None,
    key_grid: float | None = None,
) -> DataFrame:
    """k rows drawn without replacement with probability ∝
    ``weight_col`` (must be > 0; non-positive weights never win).
    Deterministic in (data, seed); independent across seeds.
    ``uniform`` overrides the per-row u in (0,1) — e.g. an
    engine-portable hash when the draw must be replayable outside
    Spark; the default xxhash64 derivation is the production path.
    ``key_grid`` floor-coarsens the key (see :func:`_exp_key`) —
    set it whenever the draw must replay EXACTLY on another engine."""
    w = F.col(weight_col).cast("double")
    u = _uniform(F.col(id_col), seed) if uniform is None else uniform
    key = _exp_key(u, w, key_grid)
    return (
        df.withColumn("_sample_key", key)
        .where(F.col("_sample_key").isNotNull())
        .orderBy(F.col("_sample_key").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("_sample_key")
    )


def stratified_weighted_sample(
    df: DataFrame,
    k_per_stratum: int,
    weight_col: str,
    stratum_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    uniform: Column | None = None,
    key_grid: float | None = None,
) -> DataFrame:
    """Per-stratum weighted sampling without replacement: the same
    exponential keys, ranked within each stratum — k winners per
    group in ONE window pass partitioned by the stratum (parallel
    across strata; Spark runs the rank filter with per-partition
    heaps). The per-source quota draw for corpus mixing when quotas
    must respect a quality weight rather than a plain hash order."""
    from pyspark.sql import Window

    w = F.col(weight_col).cast("double")
    u = _uniform(F.col(id_col), seed) if uniform is None else uniform
    key = _exp_key(u, w, key_grid)
    win = Window.partitionBy(stratum_col).orderBy(
        F.col("_sample_key").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_sample_key", key)
        .where(F.col("_sample_key").isNotNull())
        .withColumn("_rk", F.row_number().over(win))
        .where(F.col("_rk") <= k_per_stratum)
        .drop("_sample_key", "_rk")
    )
