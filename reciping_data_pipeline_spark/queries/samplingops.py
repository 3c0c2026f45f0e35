"""Driver-checkable catalog entries for the weighted-sampling operators.

``operators/sampling.py`` implements Efraimidis-Spirakis A-ES draws
(key = -ln(u)/w, keep the k smallest) with xxhash64-derived uniforms.
xxhash64 has no DuckDB twin, so these catalog queries feed the SAME
operator an engine-portable Lehmer/LCG uniform built from pure integer
arithmetic both engines evaluate exactly:

    u = (((doc_id % P) * 48271 + 12345) % P + 0.5) / P,  P = 2^31 - 1

Every intermediate stays below 2^63 (no overflow semantics in play),
the final division is IEEE double on exactly representable integers,
and ln() runs on bit-identical inputs in both engines — so the DuckDB
oracle replays the exact winner set, giving the operator a real
cross-engine correctness row rather than a rows-only check. The
statistical contract (selection frequency ∝ weight) is separately
gated in ``tests/test_sampling.py``; the production path keeps
xxhash64 (better mixing, seed-independent draws).

Scale: identical to the operator itself — a map-side key expression
plus ``TakeOrderedAndProject`` (global draw) or a per-stratum
``row_number`` window (quota draw); no shuffle of the data for the
global draw, one stratum-keyed shuffle for the quota draw.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from reciping_data_pipeline_spark.operators import sampling
from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table

_P = 2147483647  # 2^31 - 1 (Mersenne prime; classic MINSTD modulus)
_A = 48271
_B = 12345

# DuckDB twin of _portable_uniform: CASTs pin every step to the same
# IEEE double ops Spark performs (bare 0.5 / P literals would be
# DECIMAL-typed in DuckDB and divide exactly, not in binary FP).
_UNIFORM_SQL = (
    f"((CAST(((doc_id % {_P}) * {_A} + {_B}) % {_P} AS DOUBLE) + 0.5)"
    f" / CAST({_P} AS DOUBLE))"
)


def _portable_uniform(id_col: Column) -> Column:
    x = ((id_col % _P) * _A + _B) % _P
    return (x.cast("double") + F.lit(0.5)) / F.lit(float(_P))


@query(
    "doc_weighted_sample",
    oracle=f"""
    SELECT doc_id, source, n_chars
    FROM (
        SELECT doc_id, source, n_chars,
               -- key floor-coarsened to 1e-9 grid units: ln() is not
               -- correctly-rounded (JVM vs libm can differ by 1 ulp),
               -- so raw keys are a latent cross-platform flake at the
               -- k-th winner boundary; sub-grid ties fall to doc_id
               floor(-ln({_UNIFORM_SQL}) / CAST(n_chars AS DOUBLE)
                     * 1000000000.0 + 0.5) AS k
        FROM documents
        WHERE n_chars > 0
    )
    ORDER BY k ASC, doc_id ASC
    LIMIT 200
    """,
    doc="Length-weighted corpus sample without replacement (200 docs, "
    "P(select) ∝ n_chars) via exponential keys over a portable hash "
    "uniform: the whole draw is one map-side key expression plus "
    "TakeOrderedAndProject (per-partition bounded heaps, single "
    "k-row merge) — no data shuffle, no RNG state, reproducible "
    "across runs and partitionings. The DuckDB oracle replays the "
    "identical keys and must produce the identical winner set.",
    tags=("sampling", "corpus", "topk", "bench"),
)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sampling.weighted_sample(
        docs.select("doc_id", "source", "n_chars"),
        k=200,
        weight_col="n_chars",
        id_col="doc_id",
        uniform=_portable_uniform(F.col("doc_id")),
        key_grid=1e9,
    )


@query(
    "doc_stratified_weighted_sample",
    oracle=f"""
    SELECT doc_id, source, n_chars
    FROM (
        SELECT doc_id, source, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY floor(-ln({_UNIFORM_SQL})
                                  / CAST(n_chars AS DOUBLE)
                                  * 1000000000.0 + 0.5) ASC,
                            doc_id ASC
               ) AS rk
        FROM documents
        WHERE n_chars > 0
    )
    WHERE rk <= 25
    """,
    doc="Per-source quota draw: 25 docs per source, within-source "
    "probability ∝ n_chars — the corpus-mixing primitive when quotas "
    "must respect a quality weight rather than plain hash order. One "
    "stratum-partitioned row_number window (rank filters run with "
    "per-partition heaps, parallel across sources); same portable "
    "uniform, so the oracle replays every stratum's winners exactly.",
    tags=("sampling", "corpus", "window", "bench"),
)
def doc_stratified_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sampling.stratified_weighted_sample(
        docs.select("doc_id", "source", "n_chars"),
        k_per_stratum=25,
        weight_col="n_chars",
        stratum_col="source",
        id_col="doc_id",
        uniform=_portable_uniform(F.col("doc_id")),
        key_grid=1e9,
    )
