"""Embedding similarity-search catalog queries on ``embeddings``.

``embeddings(vec_id, embedding array<float>, label int)``. The brute
force / blocked-exact operators carry full DuckDB oracles (dot and
norm mirrored index-by-index so double summation matches); the LSH
ANN path is sketch-based -> rows-only check + recall unit test.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.functions import vectors as V
from reciping_data_pipeline_spark.operators import similarity
from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table, table_row_count

_DIM = 64

# DuckDB fragments: dot product and norm over FLOAT[] cast to double,
# summed in index order — byte-compatible with functions/vectors.py.
_DOT = (
    f"list_sum(list_transform(generate_series(1, {_DIM}), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _dot(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


def _norm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


@query(
    "embed_label_stats",
    oracle=f"""
    SELECT label,
           count(*) AS n_vectors,
           round(avg({_norm('embedding')}), 4) AS avg_norm,
           round(min({_norm('embedding')}), 4) AS min_norm,
           round(max({_norm('embedding')}), 4) AS max_norm
    FROM embeddings
    GROUP BY label
    """,
    doc="Vector-norm profile per label — JVM-side aggregate() over array<float> "
    "(SURVEY §7.2-8 similarity search plumbing).",
    tags=("vector", "agg"),
)
def embed_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    n = V.norm(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg(n), 4).alias("avg_norm"),
        F.round(F.min(n), 4).alias("min_norm"),
        F.round(F.max(n), 4).alias("max_norm"),
    )


@query(
    "embed_knn_brute",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    pairs AS (
        SELECT query_id, neighbor_id,
               round({_dot('qv', 'cv')} / nullif({_norm('qv')} * {_norm('cv')}, 0), 4) AS cosine_sim
        FROM c CROSS JOIN q
        WHERE neighbor_id != query_id
    )
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS sim_rank
    FROM pairs
    QUALIFY sim_rank <= 5
    """,
    doc="Exact brute-force cosine top-5 for 10 query vectors: broadcast "
    "queries x corpus scan, rank on rounded sim + id tie-break.",
    tags=("vector", "topk", "bench"),
)
def embed_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return similarity.brute_force_topk(emb, queries, k=5, round_dp=4)


@query(
    "embed_near_dup_blocked",
    # Oracle restructured for the ×100 sweep (VERDICT r11 #1): the old
    # form recomputed norm(a), norm(b) and dot(a,b) per PAIR through
    # the interpreted list_transform lambda — 5 lambda evaluations ×
    # ~2B within-label pairs blew the sweep budget (engine side done in
    # minutes, oracle pending). This form computes each vector's norm
    # ONCE in a CTE and uses DuckDB's NATIVE list_dot_product for the
    # per-pair dot — verified bit-identical to the index-order lambda
    # sum on DOUBLE[] (sequential accumulation, same IEEE ops as
    # functions/vectors.py's aggregate fold). Rounding is the same
    # floor(x*1e4+0.5) grid as BOTH engine paths (ADVICE r11).
    oracle="""
    WITH v AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS e,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS nrm
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               floor(list_dot_product(a.e, b.e)
                     / nullif(a.nrm * b.nrm, 0) * 10000 + 0.5) / 10000
                   AS cosine_sim
        FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= 0.25
    """,
    doc="Blocked cosine near-dup pairs (block = label): the partition-confined "
    "self-join that scales — shuffle on block key only. Threshold 0.25 sits "
    "above the random-fixture p99 so output is small but non-trivial. "
    "Labels are a FIXED 10-value set, so block size grows linearly with "
    "the corpus and the per-block pair work quadratically while hash "
    "partitioning caps parallelism at 10 tasks (x100 measured 5/32 cores "
    "for >50 min at 200k vectors): the entry derives a triangular "
    "sub-bucket grid G from committed footer stats (G=1 below 40k rows — "
    "small fixtures keep the ungridded plan; output set is G-invariant "
    "by construction — every path coarsens on the identical "
    "floor(x*1e4+0.5) grid, see the operator's rounding contract).",
    tags=("vector", "dedup", "bench"),
)
def embed_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    n = table_row_count(spark, sf_dir, "embeddings")
    sub = max(1, -(-n // 40_000))  # ceil; 200k vectors -> G=5
    return similarity.cosine_near_dup_pairs(
        emb, partition_col="label", threshold=0.25, round_dp=4, sub_buckets=sub
    )


# Shared needle contract for the ANN family: feed each index an EXACT
# COPY of a corpus vector (planted at id + 1e9 so the self-exclusion
# filter doesn't hide it) and require the original back at rank 1 with
# cosine 1.0. Identical vectors land in identical buckets/cells/codes
# by construction, so the contract is deterministic — verified at
# sf0.001/0.01/0.1 for all three index types — and SQL-enumerable,
# upgrading the r01-r05 rows-only checks to driver hash rows. Organic
# (non-needle) recall stays gated by the planted-fixture tests in
# tests/test_sketch_ops.py — random-corpus organic recall is genuinely
# approximate and belongs to the estimator tests, not a hash oracle.
_NEEDLE_ORACLE = """
    SELECT vec_id AS query_id, true AS found_self,
           CAST(1.0 AS DOUBLE) AS self_sim
    FROM embeddings WHERE vec_id < 10
"""


def _needle_offset(emb: DataFrame):
    """Plant offset DERIVED from the corpus (max id + 1): a fixed 1e9
    collides with real ids once a scaled fixture's ids pass 1e9 —
    the docszipf sweep's mult-300 ids reach 2.99e9 (r14)."""
    return F.broadcast(emb.agg((F.max("vec_id") + 1).alias("_off")))


def _needle_contract(topk: DataFrame, off: DataFrame) -> DataFrame:
    top1 = topk.where(F.col("sim_rank") == 1)
    return top1.crossJoin(off).select(
        (F.col("query_id") - F.col("_off")).alias("query_id"),
        (F.col("neighbor_id") == F.col("query_id") - F.col("_off")).alias(
            "found_self"
        ),
        (F.floor(F.col("cosine_sim") * 10000.0 + 0.5) / 10000.0).alias("self_sim"),
    )


def _needle_queries(emb: DataFrame, off: DataFrame) -> DataFrame:
    return emb.where(F.col("vec_id") < 10).crossJoin(off).select(
        (F.col("vec_id") + F.col("_off")).alias("vec_id"), "embedding", "label"
    )


@query(
    "embed_lsh_ann",
    oracle=_NEEDLE_ORACLE,
    doc="Hyperplane-LSH ANN (6 tables x 12 bits, exact re-rank of "
    "bucket candidates) under the planted-needle contract: an exact "
    "copy of each query-region corpus vector must come back as its own "
    "rank-1 neighbor at cosine 1.0 through the full hash/bucket/"
    "re-rank pipeline.",
    tags=("vector", "topk"),
)
def embed_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    off = _needle_offset(emb)
    # broadcast_queries pinned True: the needle set is 10 rows by
    # construction, so the size-aware bounded-count probe job is a
    # wasted action here (r14 — one fewer job per run).
    return _needle_contract(
        similarity.lsh_ann_topk(
            emb, _needle_queries(emb, off), dim=_DIM, k=5, broadcast_queries=True
        ),
        off,
    )


@query(
    "embed_ivf_ann",
    oracle=_NEEDLE_ORACLE,
    doc="IVF ANN (spherical k-means cells fit on a seeded bounded "
    "sample, nprobe=3, exact cosine re-rank — the partition-pruned ANN "
    "scale path) under the planted-needle contract: identical vectors "
    "share a nearest cell, so every needle must surface its original "
    "at rank 1, cosine 1.0.",
    tags=("vector", "topk", "bench"),
)
def embed_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    off = _needle_offset(emb)
    # broadcast_queries pinned True — see embed_lsh_ann (r14).
    return _needle_contract(
        similarity.ivf_topk(
            emb, _needle_queries(emb, off), k=5, n_cells=16, nprobe=3,
            broadcast_queries=True,
        ),
        off,
    )


@query(
    "embed_quantize_int8",
    oracle=f"""
    WITH q AS (
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
                   AS scale
        FROM embeddings
    )
    SELECT e.vec_id,
           round(q.scale, 6) AS scale,
           CAST(list_sum(list_transform(generate_series(1, {_DIM}),
               i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) / q.scale + 0.5) AS BIGINT)))
               AS BIGINT) AS code_sum,
           round(list_max(list_transform(generate_series(1, {_DIM}),
               i -> abs(floor(CAST(e.embedding[i] AS DOUBLE) / q.scale + 0.5) * q.scale
                        - CAST(e.embedding[i] AS DOUBLE)))), 6) AS max_abs_err
    FROM embeddings e JOIN q USING (vec_id)
    """,
    doc="Symmetric int8 quantization of embeddings (per-vector absmax "
    "scale, the storage/bandwidth reduction step before ANN indexing "
    "at 100 TB): integer codes via floor(v+0.5) (engine-portable "
    "rounding) in [-127, 127], reconstruction error "
    "bounded by scale/2 per component. Entirely row-local JVM array "
    "lambdas — zero shuffle; codes summed + max reconstruction error "
    "reported per vector so the oracle pins exact integer agreement "
    "(identical IEEE double ops on both engines).",
    tags=("vector", "quantize"),
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    as_dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(as_dbl, F.abs)) / F.lit(127.0)
    # floor(v + 0.5) instead of round(): identical IEEE semantics on
    # every engine (round()'s tie behavior differs Spark vs DuckDB).
    # The full-precision scale column must NOT share a name with the
    # rounded output alias: lateral column alias resolution would bind
    # the lambda's reference to the rounded sibling (off-by-one codes).
    sc = F.col("_scale_full")
    codes = F.transform(as_dbl, lambda x: F.floor(x / sc + 0.5).cast("bigint"))
    err = F.transform(
        as_dbl,
        lambda x: F.abs(F.floor(x / sc + 0.5) * sc - x),
    )
    return (
        emb.withColumn("_scale_full", scale)
        .select(
            "vec_id",
            F.round("_scale_full", 6).alias("scale"),
            F.aggregate(codes, F.lit(0).cast("bigint"), lambda acc, c: acc + c).alias(
                "code_sum"
            ),
            F.round(F.array_max(err), 6).alias("max_abs_err"),
        )
    )


@query(
    "embed_pq_ann",
    oracle=_NEEDLE_ORACLE,
    doc="Product-quantization ANN (Jégou 2011): unit vectors split into "
    "8 subspaces x 16-code codebooks (fit on a bounded deterministic "
    "sample), ADC scan via per-query lookup tables (m lookups per "
    "candidate instead of dim multiplies over 4*dim bytes), exact "
    "re-rank of survivors. The memory-bandwidth scale path for vector "
    "search — codes are 8 bytes/vector vs 256. Driver-hashed under the "
    "planted-needle contract: an exact-copy query shares its "
    "original's codes, tops the ADC shortlist, and the exact re-rank "
    "must return the original at rank 1, cosine 1.0.",
    tags=("vector", "ann", "quantize"),
)
def embed_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    off = _needle_offset(emb)
    return _needle_contract(
        similarity.pq_topk(emb, _needle_queries(emb, off), dim=_DIM, m=8, k_codes=16, k=5),
        off,
    )


@query(
    "embed_semantic_dedup",
    oracle="""
    SELECT CAST(2 * count(*) AS BIGINT) AS n_vectors,
           CAST(count(*) AS BIGINT) AS n_dropped,
           CAST(count(*) AS BIGINT) AS n_groups
    FROM embeddings
    """,
    doc="SemDeDup: k-means cells confine the cosine>=0.97 pair search "
    "to within-cluster self-joins (sum(|cell|^2), never |corpus|^2), "
    "then connected components + canonical keep "
    "(operators/similarity.py semantic_dedup_pairs). Driver-hashed "
    "under the planted-duplicate contract (r06, the catalog's last "
    "rows-only row): every corpus vector gets an exact copy planted at "
    "vec_id + 1e9; identical vectors share a nearest cell, the "
    "within-cell scan must pair each with its plant at cosine 1.0, and "
    "components must collapse each pair to its original — so exactly "
    "half the union survives. The organic corpus contributes no pairs "
    "(max organic cosine < 0.9 at every SF, verified), so the oracle's "
    "expected counts are exact: (2c, c, c).",
    tags=("vector", "dedup", "bench"),
)
def embed_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reciping_data_pipeline_spark.operators import dedup as D

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    # derived plant offset — see _needle_offset (r14)
    plants = emb.crossJoin(
        F.broadcast(emb.agg((F.max("vec_id") + 1).alias("_off")))
    ).select((F.col("vec_id") + F.col("_off")).alias("vec_id"), "embedding", "label")
    both = emb.unionAll(plants)
    # n_cells deliberately NOT pinned: ceil(n/1024) cells keep the
    # within-cell pair work linear in the corpus. The r09 x100 sweep
    # showed why — a fixed 16 cells puts 25k vectors per cell at 400k
    # rows and the within-cell self-join goes quadratic (sum(|cell|^2)
    # ~ 1e10 pairs). The planted-count contract is cell-count-invariant
    # (identical vectors always share a nearest centroid). n comes from
    # committed parquet footer stats (|both| = exactly 2x the table),
    # not a count() job — VERDICT r10 #2.
    n_cells = similarity.derive_n_cells(
        2 * table_row_count(spark, sf_dir, "embeddings")
    )
    pairs = similarity.semantic_dedup_pairs(
        both, id_col="vec_id", vec_col="embedding", threshold=0.97,
        n_cells=n_cells, sample=max(2048, 4 * n_cells),
    )
    groups = D.dedup_groups(both, "vec_id", pairs, "id_a", "id_b")
    return groups.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.sum(F.when(~F.col("is_canonical"), 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
        F.count_distinct("component").cast("long").alias("n_groups"),
    )


@query(
    "embed_incremental_semantic_dedup",
    oracle="""
    SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings) AS vec_id,
           TRUE AS is_dup,
           vec_id AS matched_id, CAST(1.0 AS DOUBLE) AS cosine
    FROM embeddings WHERE vec_id % 2 = 0
    UNION ALL
    SELECT vec_id, FALSE, CAST(-1 AS BIGINT), CAST(0.0 AS DOUBLE)
    FROM embeddings WHERE vec_id % 2 = 1
    """,
    doc="Incremental SemDeDup: a delta batch probed against a CELLED "
    "corpus through its persisted centroid codebook "
    "(operators/similarity.py incremental_semantic_dedup) — the "
    "embedding sibling of doc_incremental_minhash_dedup: the corpus is "
    "never re-clustered or cross-joined, only the delta is assigned "
    "and compared within its cell. Planted-contract oracle: corpus = "
    "even-id vectors, delta = every odd-id vector (novel — max organic "
    "cosine < 0.9 < the 0.95 threshold at every SF, verified) plus an "
    "exact copy of every corpus vector at vec_id + 1e9 (same cell by "
    "construction, must match its original at cosine 1.0), so every "
    "output row is exactly predictable.",
    tags=("vector", "dedup", "incremental"),
)
def embed_incremental_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus_raw = emb.where(F.col("vec_id") % 2 == 0)
    delta = emb.where(F.col("vec_id") % 2 == 1).unionAll(
        corpus_raw.crossJoin(
            F.broadcast(emb.agg((F.max("vec_id") + 1).alias("_off")))
        ).select((F.col("vec_id") + F.col("_off")).alias("vec_id"), "embedding")
    )
    # scale-adaptive cells (ceil(|corpus|/1024)): the probe join's
    # per-cell work is |delta_cell| x |corpus_cell|, so cells must grow
    # with the corpus for the probe to stay linear (same rationale as
    # embed_semantic_dedup; the exact-copy contract is cell-invariant).
    # |corpus| = the even-id half of the table, derived from committed
    # footer stats (ceil(n/2) — exact on these fixtures whose ids are
    # 0..n-1 per copy block) instead of a filtered count() job.
    n_emb = table_row_count(spark, sf_dir, "embeddings")
    n_cells = similarity.derive_n_cells(-(-n_emb // 2))
    cent = similarity.fit_spherical_centroids(
        corpus_raw, vec_col="embedding", id_col="vec_id", n_cells=n_cells,
        sample=max(2048, 4 * n_cells), seed=17,
    )
    corpus = similarity.assign_cells(corpus_raw, cent, vec_col="embedding")
    return similarity.incremental_semantic_dedup(
        delta, corpus, cent, id_col="vec_id", vec_col="embedding", threshold=0.95
    )


@query(
    "embed_dim_variance_topk",
    oracle="""
    SELECT i AS dim,
           round(avg(v), 4) + 0.0 AS mean_v,
           round(var_samp(v), 4) AS var_v
    FROM (SELECT unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)
    GROUP BY i
    ORDER BY var_v DESC, dim LIMIT 10
    """,
    doc="Top-10 highest-variance embedding dimensions (feature-selection "
    "/ dead-dimension diagnostics). posexplode keys the shuffle on the "
    "dimension index — row AND width parallelism, never a whole-vector "
    "reduce — then TakeOrderedAndProject picks the top-k of the 64-row "
    "aggregate. Means carry the +0.0 negative-zero canonicalization.",
    tags=("vector", "stats", "topk"),
)
def embed_dim_variance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    per_dim = (
        emb.select(F.posexplode("embedding").alias("i", "v"))
        .groupBy((F.col("i") + 1).alias("dim"))
        .agg(
            (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("mean_v"),
            F.round(F.var_samp("v"), 4).alias("var_v"),
        )
    )
    return per_dim.orderBy(F.desc("var_v"), "dim").limit(10)


@query(
    "embed_centroid_pair_distances",
    oracle="""
    WITH per_pos AS (
        SELECT label, i, round(avg(v), 4) + 0.0 AS rv
        FROM (SELECT label, unnest(embedding) AS v,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
        GROUP BY label, i
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(sqrt(sum(power(a.rv - b.rv, 2))), 4) AS l2_dist,
           round(sum(a.rv * b.rv)
                 / sqrt(sum(a.rv * a.rv) * sum(b.rv * b.rv)), 4) AS cos_sim
    FROM per_pos a JOIN per_pos b ON a.i = b.i AND a.label < b.label
    GROUP BY a.label, b.label
    """,
    doc="Pairwise L2 + cosine between the per-label mean embeddings "
    "(cluster-separation audit). Centroid components are rounded "
    "BEFORE the distance sums so both engines add identical doubles; "
    "the pair join is keyed on the dimension index (equi-join), "
    "label-count-bounded — 45 pairs whatever the corpus size.",
    tags=("vector", "stats", "join"),
)
def embed_centroid_pair_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    per_pos = (
        emb.select("label", F.posexplode("embedding").alias("i", "v"))
        .groupBy("label", "i")
        .agg((F.round(F.avg("v"), 4) + F.lit(0.0)).alias("rv"))
    )
    a = per_pos.select(
        F.col("label").alias("label_a"), "i", F.col("rv").alias("ra")
    )
    b = per_pos.select(
        F.col("label").alias("label_b"), "i", F.col("rv").alias("rb")
    )
    return (
        a.join(b, "i")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.round(F.sqrt(F.sum(F.pow(F.col("ra") - F.col("rb"), 2))), 4).alias("l2_dist"),
            F.round(
                F.sum(F.col("ra") * F.col("rb"))
                / F.sqrt(F.sum(F.col("ra") * F.col("ra")) * F.sum(F.col("rb") * F.col("rb"))),
                4,
            ).alias("cos_sim"),
        )
    )


@query(
    "embed_intra_label_cohesion",
    oracle=f"""
    WITH cent AS (
        SELECT label, list(rv ORDER BY i) AS c
        FROM (
            SELECT label, i, round(avg(v), 4) + 0.0 AS rv
            FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings)
            GROUP BY label, i
        )
        GROUP BY label
    ),
    sims AS (
        SELECT e.label,
               {_dot('e.embedding', 'cent.c')}
               / nullif({_norm('e.embedding')} * {_norm('cent.c')}, 0) AS cos_c
        FROM embeddings e JOIN cent USING (label)
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg(cos_c), 4) AS avg_cohesion,
           round(min(cos_c), 4) AS min_cohesion
    FROM sims GROUP BY label
    """,
    doc="Intra-cluster cohesion: cosine of every vector to its own label "
    "centroid, averaged per label (the within-class compactness signal "
    "for label-quality audits). Centroids are a label-bounded broadcast "
    "(10 rows); the member-to-centroid dot runs JVM-side in index order "
    "via zip_with/aggregate so it matches the double-precision oracle "
    "bit-for-bit.",
    tags=("vector", "stats"),
)
def embed_intra_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent = (
        emb.select("label", F.posexplode("embedding").alias("i", "v"))
        .groupBy("label", "i")
        .agg((F.round(F.avg("v"), 4) + F.lit(0.0)).alias("rv"))
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("i", "rv"))).getField("rv").alias("c")
        )
    )
    joined = emb.join(F.broadcast(cent), "label")
    cos_c = V.dot(F.col("embedding"), F.col("c")) / F.nullif(
        V.norm(F.col("embedding")) * V.norm(F.col("c")), F.lit(0.0)
    )
    return (
        joined.select("label", cos_c.alias("cos_c"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("cos_c"), 4).alias("avg_cohesion"),
            F.round(F.min("cos_c"), 4).alias("min_cohesion"),
        )
    )


@query(
    "embed_norm_quantiles_by_label",
    oracle=f"""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(quantile_cont({_norm('embedding')}, 0.25), 4) AS p25_norm,
           round(quantile_cont({_norm('embedding')}, 0.5), 4) AS p50_norm,
           round(quantile_cont({_norm('embedding')}, 0.75), 4) AS p75_norm
    FROM embeddings
    GROUP BY label
    """,
    doc="Exact interpolated norm quartiles per label — the distributional "
    "check behind norm-clipping / re-normalization decisions. Group-keyed "
    "exact percentiles (Spark percentile == DuckDB quantile_cont).",
    tags=("vector", "stats"),
)
def embed_norm_quantiles_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    n = V.norm(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.percentile(n, F.lit(0.25)), 4).alias("p25_norm"),
        F.round(F.percentile(n, F.lit(0.5)), 4).alias("p50_norm"),
        F.round(F.percentile(n, F.lit(0.75)), 4).alias("p75_norm"),
    )
