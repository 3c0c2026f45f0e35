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


# ---------------------------------------------------------------------------
# Token-budget water-filling (epoch planning)

# TRY_CAST, not CAST: sources are not guaranteed "src<int>"-shaped —
# the docszipf sweep's 'clone_farm' label crashed the strict ANSI cast
# on both engines (r14). Unparsable sources weight 1 (the floor of the
# parsed range), deterministically on both engines.
_WF_W_SQL = "CAST(COALESCE(TRY_CAST(substr(source, 4) AS INT) % 5, 0) + 1 AS DOUBLE)"
_WF_HASH_SQL = "((doc_id * 2654435761) % 4294967296)"


@query(
    "doc_token_budget_waterfill",
    oracle=f"""
    WITH per_src AS (
        SELECT source,
               {_WF_W_SQL} AS w,
               CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
                   AS avail
        FROM documents
        GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(avail) AS BIGINT) AS total_avail,
               CAST(sum(w) AS DOUBLE) AS total_w,
               floor(0.55 * CAST(sum(avail) AS BIGINT)) AS budget
        FROM per_src
    ),
    ranked AS (
        SELECT p.*, t.total_w, t.budget,
               CAST(p.avail AS DOUBLE) / p.w AS r,
               CAST(coalesce(sum(p.avail) OVER (
                   ORDER BY CAST(p.avail AS DOUBLE) / p.w, p.source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS DOUBLE) AS cum_avail_prev,
               CAST(coalesce(sum(p.w) OVER (
                   ORDER BY CAST(p.avail AS DOUBLE) / p.w, p.source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS DOUBLE) AS cum_w_prev
        FROM per_src p, tot t
    ),
    flagged AS (
        SELECT *,
               (CAST(avail AS DOUBLE) * (total_w - cum_w_prev)
                <= (budget - cum_avail_prev) * w) AS flag
        FROM ranked
    ),
    sat AS (
        SELECT *,
               (min(CASE WHEN flag THEN 1 ELSE 0 END) OVER (
                   ORDER BY r, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1)
                   AS saturated
        FROM flagged
    ),
    lvl AS (
        SELECT CAST(sum(CASE WHEN saturated THEN avail ELSE 0 END) AS DOUBLE)
                   AS sat_avail,
               CAST(sum(CASE WHEN saturated THEN w ELSE 0.0 END) AS DOUBLE)
                   AS sat_w
        FROM sat
    ),
    alloc AS (
        SELECT s.source, s.avail, s.w, s.saturated,
               CASE WHEN s.saturated THEN CAST(s.avail AS DOUBLE)
                    ELSE (s.budget - l.sat_avail) / (s.total_w - l.sat_w) * s.w
               END AS alloc_tok
        FROM sat s, lvl l
    ),
    thresh AS (
        SELECT source, avail, w, saturated,
               CAST(floor(alloc_tok) AS BIGINT) AS alloc_tokens,
               CAST(floor(alloc_tok * 4294967296.0 / CAST(avail AS DOUBLE))
                   AS BIGINT) AS keep_units
        FROM alloc
    ),
    kept AS (
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(len(regexp_split_to_array(d.text, '\\s+'))) AS BIGINT)
                   AS kept_tokens
        FROM documents d
        JOIN thresh t ON t.source = d.source
        WHERE {_WF_HASH_SQL} < t.keep_units
        GROUP BY d.source
    )
    SELECT t.source,
           t.avail AS avail_tokens,
           t.w AS weight,
           t.saturated,
           t.alloc_tokens,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
    FROM thresh t LEFT JOIN kept k ON k.source = t.source
    """,
    doc="Token-budget epoch planning via EXACT water-filling, fully "
    "relational: given per-source target weights (derived "
    "deterministically from the source name) and a total token budget "
    "(55% of the corpus), allocate budget proportional to weight, "
    "saturating any source whose supply runs out and re-spreading the "
    "residual over the rest — the LLaMA-style 'how many tokens of "
    "each source fit the training budget' computation. The classic "
    "iterative algorithm collapses to ONE window pass over the "
    "O(sources) aggregate: sort by avail/weight, prefix-cumsum, a "
    "multiplication-form saturation test (no division, so exhausted "
    "budgets can't divide by zero), prefix-AND via a running min, and "
    "a closed-form water level from the saturated mass. Selection is "
    "then a deterministic per-doc hash threshold (floor-quantized to "
    "integer units of 2^-32), so the chosen documents — not just the "
    "allocation — replay exactly in the oracle. Scale: one "
    "source-keyed aggregation + an O(sources) window + a broadcast "
    "threshold join back to the corpus scan; nothing data-sized "
    "moves except the one aggregation.",
    tags=("text", "sampling", "curation", "planning"),
)
def doc_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    from reciping_data_pipeline_spark.functions import text as T

    n_tok = T.token_count(F.col("text")).cast("long")
    # try_cast mirrors _WF_W_SQL: non-"src<int>" labels weight 1
    w = (
        F.coalesce(
            F.expr("try_cast(substr(source, 4) as int)") % 5, F.lit(0)
        )
        + 1
    ).cast("double")
    per_src = docs.select("source", w.alias("w"), n_tok.alias("nt")).groupBy(
        "source"
    ).agg(F.first("w").alias("w"), F.sum("nt").cast("long").alias("avail"))
    tot = per_src.agg(
        F.sum("avail").cast("long").alias("total_avail"),
        F.sum("w").cast("double").alias("total_w"),
        F.floor(F.lit(0.55) * F.sum("avail").cast("long")).cast("double").alias("budget"),
    )
    r = F.col("avail").cast("double") / F.col("w")
    w_prev = Window.orderBy(r, F.col("source")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = per_src.crossJoin(F.broadcast(tot)).select(
        "*",
        r.alias("r"),
        F.coalesce(F.sum("avail").over(w_prev), F.lit(0)).cast("double").alias("cum_avail_prev"),
        F.coalesce(F.sum("w").over(w_prev), F.lit(0.0)).cast("double").alias("cum_w_prev"),
    )
    flag = (
        F.col("avail").cast("double") * (F.col("total_w") - F.col("cum_w_prev"))
        <= (F.col("budget") - F.col("cum_avail_prev")) * F.col("w")
    )
    w_run = Window.orderBy("r", "source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sat = ranked.withColumn("flag", flag).withColumn(
        "saturated",
        F.min(F.when(F.col("flag"), 1).otherwise(0)).over(w_run) == 1,
    )
    lvl = sat.agg(
        F.sum(F.when(F.col("saturated"), F.col("avail")).otherwise(0))
        .cast("double")
        .alias("sat_avail"),
        F.sum(F.when(F.col("saturated"), F.col("w")).otherwise(0.0))
        .cast("double")
        .alias("sat_w"),
    )
    alloc_tok = F.when(F.col("saturated"), F.col("avail").cast("double")).otherwise(
        (F.col("budget") - F.col("sat_avail"))
        / (F.col("total_w") - F.col("sat_w"))
        * F.col("w")
    )
    thresh = sat.crossJoin(F.broadcast(lvl)).select(
        "source", "avail", "w", "saturated",
        F.floor(alloc_tok).cast("long").alias("alloc_tokens"),
        F.floor(alloc_tok * F.lit(4294967296.0) / F.col("avail").cast("double"))
        .cast("long")
        .alias("keep_units"),
    )
    hash_units = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    kept = (
        docs.select("source", "doc_id", n_tok.alias("nt"))
        .join(F.broadcast(thresh.select("source", "keep_units")), on="source")
        .where(hash_units < F.col("keep_units"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.sum("nt").cast("long").alias("kept_tokens"),
        )
    )
    return (
        thresh.join(kept, on="source", how="left")
        .select(
            "source",
            F.col("avail").alias("avail_tokens"),
            F.col("w").alias("weight"),
            "saturated",
            "alloc_tokens",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
        )
    )
