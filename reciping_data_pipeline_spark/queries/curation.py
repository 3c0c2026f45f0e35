"""Corpus-curation hygiene queries: distribution-based outlier
trimming and split-leakage detection.

Registered LAST in the catalog import order so they join the driver's
rotating verification window after the current backlog clears; the
repo's own oracle gate (tests/test_catalog_oracle.py) verifies them
every run regardless.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.functions import text as T
from reciping_data_pipeline_spark.operators import dedup
from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.queries.textops import _SPLIT_HASH_SQL, _TOKENS_SQL
from reciping_data_pipeline_spark.tables import load_table

_TRIM_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"


@query(
    "doc_length_winsorize",
    oracle=f"""
    WITH tok AS (
        SELECT source, len({_TRIM_TOKENS_SQL}) AS n_tok FROM documents
    ),
    bounds AS (
        SELECT quantile_cont(n_tok, 0.05) AS lo, quantile_cont(n_tok, 0.95) AS hi
        FROM tok
    )
    SELECT t.source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN t.n_tok >= b.lo AND t.n_tok <= b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN t.n_tok >= b.lo AND t.n_tok <= b.hi
                         THEN t.n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
           round(b.lo, 4) AS p05,
           round(b.hi, 4) AS p95
    FROM tok t, bounds b
    GROUP BY t.source, b.lo, b.hi
    """,
    doc="Distribution-based outlier trim (winsorize gate): per-source "
    "keep counts for docs inside the corpus-global [p05, p95] token "
    "band — the step that drops truncated fragments and concatenation "
    "artifacts before training. Exact interpolated percentiles "
    "(Spark percentile == DuckDB quantile_cont) computed once and "
    "broadcast as a scalar onto the scan; one full scan + one "
    "O(sources) aggregate.",
    tags=("text", "quality", "curation"),
)
def doc_length_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", T.token_count(F.trim(F.col("text"))).alias("n_tok"))
    bounds = tok.agg(
        F.expr("percentile(n_tok, 0.05)").alias("lo"),
        F.expr("percentile(n_tok, 0.95)").alias("hi"),
    )
    keep = (F.col("n_tok") >= F.col("lo")) & (F.col("n_tok") <= F.col("hi"))
    return (
        tok.crossJoin(F.broadcast(bounds))
        .groupBy("source", "lo", "hi")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(keep, F.col("n_tok")).otherwise(0)).alias("kept_tokens"),
        )
        .select(
            "source",
            "n_total",
            "n_kept",
            "kept_tokens",
            F.round("lo", 4).alias("p05"),
            F.round("hi", 4).alias("p95"),
        )
    )


@query(
    "doc_split_leakage",
    oracle=f"""
    WITH splits AS (
        SELECT doc_id,
               CASE WHEN {_SPLIT_HASH_SQL} < 0.9 * 4294967296 THEN 'train'
                    WHEN {_SPLIT_HASH_SQL} < 0.95 * 4294967296 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    docs AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len({_TOKENS_SQL}) - 4),
                   i -> {_TOKENS_SQL}[i] || ' ' || {_TOKENS_SQL}[i+1] || ' ' || {_TOKENS_SQL}[i+2]
                        || ' ' || {_TOKENS_SQL}[i+3] || ' ' || {_TOKENS_SQL}[i+4])) AS sh
        FROM documents
    ),
    postings AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
    sizes AS (SELECT doc_id, len(sh) AS sz FROM docs),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM postings a JOIN postings b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b,
               round(c * 1.0 / (sa.sz + sb.sz - c), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.001
    )
    SELECT p.id_a, p.id_b, p.jaccard, s1.split AS split_a, s2.split AS split_b
    FROM pairs p
    JOIN splits s1 ON s1.doc_id = p.id_a
    JOIN splits s2 ON s2.doc_id = p.id_b
    WHERE s1.split <> s2.split
    """,
    doc="Split-leakage audit: near-duplicate pairs (exact 5-gram "
    "Jaccard, recall-1 shingle inversion) that STRADDLE the "
    "train/val/test boundary of the deterministic hash split — the "
    "eval-hygiene check that catches a val answer hiding in train. "
    "Reuses the inverted-index pair search (no doc x doc join); split "
    "labels broadcast onto the tiny pair set.",
    tags=("text", "dedup", "curation"),
)
def doc_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    splits = docs.select(
        "doc_id",
        F.when(h < 0.9 * 4294967296, "train")
        .when(h < 0.95 * 4294967296, "val")
        .otherwise("test")
        .alias("split"),
    )
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=5, threshold=0.001)
    sa = F.broadcast(splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")))
    sb = F.broadcast(splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")))
    return (
        pairs.join(sa, on="id_a")
        .join(sb, on="id_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "jaccard", "split_a", "split_b")
    )
