"""Corpus-construction operators for LLM training-data pipelines.

Beyond the per-document filters in ``textops.py``, these cover the
corpus-level steps of a pretraining data build: vocabulary building,
n-gram statistics, Gopher-style repetition signals, length
profiling, deterministic sequence packing, and PII-style masking
audits. Everything is built from native ``pyspark.sql.functions``
(whole-stage codegen, map-side partial aggregation), with the exact
formulas mirrored in the DuckDB oracle SQL.

Scale notes are attached per query: each one's shuffle keys and
top-k strategy are chosen so the plan survives a 100 TB corpus
(token-keyed aggregation with partial combine, TakeOrderedAndProject
for top-k instead of a global sort, per-source windows only over
pre-aggregated or naturally-bounded partitions).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from reciping_data_pipeline_spark.functions import text as T
from reciping_data_pipeline_spark.operators import dedup
from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table

# DuckDB fragment equal to T.tokens(F.trim(text)) on the Spark side.
_TRIM_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

# RE2-safe BPE-ish pre-tokenizer regex, shared with textops.
from reciping_data_pipeline_spark.queries.textops import _BPE_SQL  # noqa: E402


@query(
    "doc_vocab_topk",
    oracle=f"""
    SELECT token, count(*) AS n
    FROM (SELECT unnest({_TRIM_TOKENS_SQL}) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 100
    """,
    doc="Vocabulary building: corpus-wide token frequencies, top 100 "
    "with deterministic (count desc, token asc) tie-break. One "
    "token-keyed shuffle with map-side partial counts; the top-k is "
    "TakeOrderedAndProject, not a global sort — at 100 TB the shuffle "
    "carries one row per distinct token, not per occurrence.",
    tags=("text", "vocab", "topk", "bench"),
)
def doc_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.trim(F.col("text")))
    return (
        docs.select(F.explode(toks).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(100)
    )


@query(
    "doc_bigram_topk",
    oracle=f"""
    WITH arr AS (SELECT {_TRIM_TOKENS_SQL} AS a FROM documents),
    grams AS (
        SELECT unnest(list_transform(
            generate_series(1, len(a) - 1),
            i -> a[i] || ' ' || a[i + 1])) AS bigram
        FROM arr WHERE len(a) >= 2
    )
    SELECT bigram, count(*) AS n
    FROM grams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 50
    """,
    doc="N-gram statistics: top-50 corpus bigrams. Bigrams are built "
    "JVM-side with transform() over an index sequence (no UDF, no "
    "self-join); same shuffle shape as the vocabulary build.",
    tags=("text", "vocab", "topk"),
)
def doc_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.trim(F.col("text")))
    n = F.size(toks)
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


@query(
    "doc_repetition_stats",
    oracle=f"""
    WITH per_tok AS (
        SELECT doc_id, token, count(*) AS c
        FROM (SELECT doc_id, unnest({_TRIM_TOKENS_SQL}) AS token FROM documents)
        GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           round(1.0 - count(*) / sum(c), 4) AS dup_word_ratio,
           round(max(c) / sum(c), 4) AS top_token_frac
    FROM per_tok
    GROUP BY doc_id
    """,
    doc="Gopher-style repetition signals per document: duplicate-word "
    "fraction and most-frequent-token share — the filters that drop "
    "boilerplate/spam pages from pretraining corpora. Two shuffles "
    "keyed by (doc_id, token) then doc_id, both with map-side combine; "
    "documents never need to be co-resident, so this is "
    "embarrassingly scalable.",
    tags=("text", "quality", "bench"),
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.trim(F.col("text")))
    per_tok = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    return per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.round(F.lit(1.0) - F.count("*") / F.sum("c"), 4).alias("dup_word_ratio"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_token_frac"),
    )


@query(
    "doc_length_histogram",
    oracle="""
    SELECT CAST(floor(n_chars / 100) * 100 AS BIGINT) AS bucket,
           count(*) AS n_docs,
           round(100.0 * count(*) / sum(count(*)) OVER (), 4) AS pct
    FROM documents
    GROUP BY bucket
    """,
    doc="Corpus length profile: 100-char histogram buckets with "
    "share-of-corpus percentages (agg-over-empty-frame window on the "
    "already-reduced bucket rows — the window input is O(buckets), "
    "not O(documents), so the single-task window stage stays tiny at "
    "any corpus size).",
    tags=("text", "histogram"),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / 100) * 100).cast("bigint")
    hist = docs.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n_docs"))
    return hist.select(
        "bucket",
        "n_docs",
        F.round(100.0 * F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy()), 4).alias(
            "pct"
        ),
    )


@query(
    "doc_sequence_packing",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id,
               len({_TRIM_TOKENS_SQL}) AS n_tok
        FROM documents
    ),
    binned AS (
        SELECT source, n_tok,
               CAST(floor((sum(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tok) / 4096.0) AS BIGINT) AS bin
        FROM t
    )
    SELECT source, bin,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
           round(sum(n_tok) / 4096.0, 4) AS fill_ratio
    FROM binned
    GROUP BY source, bin
    """,
    doc="Deterministic sequence packing for training shards: documents "
    "are laid into ~4096-token bins per source in doc_id order via a "
    "running-token-total window (bin = exclusive-cumsum div 4096), "
    "then summarized per bin. No RNG, no partition-order dependence — "
    "the same docs land in the same shard on every run and engine. At "
    "100 TB use the n_buckets skew shard (pack_sequences / the "
    "doc_sequence_packing_sharded variant) so each window partition "
    "stays executor-sized even under a single dominant source.",
    tags=("text", "packing", "window", "bench"),
)
def doc_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = T.token_count(F.trim(F.col("text")))
    return pack_sequences(docs.select("source", "doc_id", n_tok.alias("n_tok")))


def pack_sequences(
    docs: DataFrame, *, bin_tokens: float = 4096.0, n_buckets: int | None = None
) -> DataFrame:
    """Deterministic sequence packing (exclusive-cumsum bin assignment)
    over ``(source, doc_id, n_tok)`` rows.

    ``n_buckets`` is the skew knob for corpora dominated by one giant
    source (the common case — a web crawl dwarfing everything else):
    the running-total window partitions on ``(source, doc_id %
    n_buckets)`` instead of ``source`` alone, so a single-source corpus
    still fans out across >= n_buckets window tasks. Sharding only
    REDISTRIBUTES docs among (smaller) bins; each bin's contents remain
    a deterministic pure function of (source, bucket, doc_id order) —
    no RNG, no partition-order dependence. The bucket key is plain
    modulo (not xxhash64) so any engine reproduces the layout.
    """
    parts = ["source"] if n_buckets is None else ["source", "bucket"]
    if n_buckets is not None:
        docs = docs.withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("bigint"))
    w = (
        Window.partitionBy(*parts)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = docs.withColumn(
        "bin",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(bin_tokens)).cast("bigint"),
    )
    return binned.groupBy(*parts, "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("bin_tokens"),
        F.round(F.sum("n_tok") / F.lit(bin_tokens), 4).alias("fill_ratio"),
    )


@query(
    "doc_sequence_packing_sharded",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id, doc_id % 8 AS bucket,
               len({_TRIM_TOKENS_SQL}) AS n_tok
        FROM documents
    ),
    binned AS (
        SELECT source, bucket, n_tok,
               CAST(floor((sum(n_tok) OVER (
                   PARTITION BY source, bucket ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tok) / 4096.0) AS BIGINT) AS bin
        FROM t
    )
    SELECT source, bucket, bin,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
           round(sum(n_tok) / 4096.0, 4) AS fill_ratio
    FROM binned
    GROUP BY source, bucket, bin
    """,
    doc="Skew-sharded sequence packing: the running-total window "
    "partitions on (source, doc_id % 8) so a corpus dominated by one "
    "giant source still spreads across >= 8 window tasks instead of "
    "serializing onto one. Bin contents stay a deterministic pure "
    "function of (source, bucket, doc_id order).",
    tags=("text", "packing", "window", "skew"),
)
def doc_sequence_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = T.token_count(F.trim(F.col("text")))
    return pack_sequences(docs.select("source", "doc_id", n_tok.alias("n_tok")), n_buckets=8)


@query(
    "event_props_pii_scrub",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS digit_runs,
           CAST(sum(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')))
               AS BIGINT) AS digits_masked
    FROM events
    GROUP BY event_type
    """,
    doc="PII-style masking audit: count and measure numeric tokens that "
    "a scrubber would redact from the raw event payload (digit-run "
    "detection via regexp_count, masked-character accounting via "
    "regexp_replace delta) — all JVM-side regex inside codegen, "
    "aggregated per event type with map-side combine.",
    tags=("text", "scrub"),
)
def event_props_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    props = F.col("props")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.regexp_count(props, F.lit(r"[0-9]+"))).alias("digit_runs"),
        F.sum(F.length(props) - F.length(F.regexp_replace(props, r"[0-9]", ""))).alias(
            "digits_masked"
        ),
    )


@query(
    "doc_chunking",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, len({_TRIM_TOKENS_SQL}) AS n_tok FROM documents
    )
    SELECT doc_id,
           CAST(floor((start - 1) / 48.0) AS INT) AS chunk_idx,
           CAST(least(64, n_tok - start + 1) AS INT) AS chunk_tokens
    FROM t, unnest(generate_series(1, n_tok, 48)) AS u(start)
    """,
    doc="Document chunking for RAG / training-sequence prep: 64-token "
    "windows with stride 48 (16-token overlap), derived purely from "
    "an index sequence + explode — no string re-slicing, no UDF. "
    "Row-local generation (no shuffle at all): each document expands "
    "to its own chunk rows wherever it already lives.",
    tags=("text", "chunking"),
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = T.token_count(F.trim(F.col("text")))
    starts = F.explode(F.sequence(F.lit(1), n_tok, F.lit(48))).alias("start")
    return docs.select("doc_id", n_tok.alias("n_tok"), starts).select(
        "doc_id",
        F.floor((F.col("start") - 1) / F.lit(48.0)).cast("int").alias("chunk_idx"),
        F.least(F.lit(64), F.col("n_tok") - F.col("start") + 1).cast("int").alias("chunk_tokens"),
    )


@query(
    "doc_tfidf_topk",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, token, count(*) AS tf
        FROM (SELECT doc_id, unnest({_TRIM_TOKENS_SQL}) AS token FROM documents)
        GROUP BY doc_id, token
    ),
    idf AS (
        SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               tf.tf * ln(n.n_docs * 1.0 / idf.df_t) AS tfidf
        FROM tf JOIN idf USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, round(tfidf, 4) AS tfidf, rank
    FROM (
        SELECT doc_id, token, tfidf,
               CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INT) AS rank
        FROM scored
    )
    WHERE rank <= 3
    """,
    doc="TF-IDF top-3 terms per document: term frequency from one "
    "(doc, token) aggregation, document frequency from a token-keyed "
    "reduction of the SAME intermediate (no second corpus scan), "
    "ln(N/df) weighting, per-doc top-k via window rank with "
    "deterministic tie-break. The idf side is one row per distinct "
    "token — vocabulary-sized, which at web scale is far too large to "
    "broadcast — so the tf-idf join is left to Catalyst/AQE (a shuffle "
    "hash join on token; the tf side is already shuffled by its "
    "groupBy). Only the 1-row corpus count broadcasts.",
    tags=("text", "vocab", "window"),
)
def doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.trim(F.col("text")))
    tf = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    idf = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df_t"))
    # Corpus size joins in as a broadcast 1-row aggregate: the whole
    # query stays one lazy plan (no eager driver-side count action).
    n = F.broadcast(docs.agg(F.count("*").cast("double").alias("n_docs")))
    scored = (
        tf.join(idf, on="token")
        .crossJoin(n)
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df_t")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "token", F.round("tfidf", 4).alias("tfidf"), "rank")
    )


# Same engine-portable multiplicative hash as textops._SPLIT_HASH_SQL.
_SHUF_HASH_SQL = "((doc_id * 2654435761) % 4294967296)"


@query(
    "doc_shuffle_shards",
    oracle=f"""
    SELECT doc_id,
           CAST({_SHUF_HASH_SQL} % 8 AS INT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY {_SHUF_HASH_SQL} % 8
               ORDER BY {_SHUF_HASH_SQL}, doc_id) AS INT) AS pos
    FROM documents
    """,
    doc="Deterministic global corpus shuffle into training shards: "
    "multiplicative-hash order assigns every document a shard and an "
    "intra-shard position — the epoch-shuffle a trainer needs, "
    "reproducible across engines/runs/cluster sizes with zero RNG "
    "state (vs orderBy(rand()), which differs per partitioning). At "
    "100 TB this is one hash-partitioned exchange + per-shard sort; "
    "shard count scales with the cluster, never a global sort.",
    tags=("text", "sampling", "window"),
)
def doc_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    shard = (h % 8).cast("int")
    w = Window.partitionBy(shard).orderBy(h, F.col("doc_id"))
    return docs.select(
        "doc_id",
        shard.alias("shard"),
        F.row_number().over(w).cast("int").alias("pos"),
    )


# Reuse the exact oracle fragments of the funnel/split queries so the
# composite stays formula-identical with its parts (textops.py).
from reciping_data_pipeline_spark.queries.textops import (  # noqa: E402
    _EN_STOP,
    _SPLIT_HASH_SQL,
    _TOKENS_SQL,
)


@query(
    "doc_corpus_manifest",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, lang, text,
               CAST(len({_TOKENS_SQL}) AS DOUBLE) AS n_tok,
               CAST(len(list_filter({_TOKENS_SQL}, x -> x IN {_EN_STOP})) AS DOUBLE) AS n_stop,
               CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                   / nullif(length(text), 0) AS p_ratio,
               md5(text) AS fp
        FROM documents
    ),
    gated AS (
        SELECT doc_id, n_tok
        FROM (
            SELECT doc_id, lang, n_tok,
                   round(1.0 / (1.0 + exp(-(0.01 * n_tok + 2.0 * (n_stop / nullif(n_tok, 0))
                                            - 5.0 * p_ratio - 1.0))), 4) AS quality,
                   (doc_id = min(doc_id) OVER (PARTITION BY fp)) AS keep_first
            FROM feat
        )
        WHERE lang IN ('en', 'es') AND n_tok BETWEEN 20 AND 5000
          AND quality >= 0.5 AND keep_first
    )
    SELECT CASE WHEN {_SPLIT_HASH_SQL} < 0.9 * 4294967296 THEN 'train'
                WHEN {_SPLIT_HASH_SQL} < 0.95 * 4294967296 THEN 'val'
                ELSE 'test' END AS split,
           CAST({_SPLIT_HASH_SQL} % 4 AS INT) AS shard,
           count(*) AS n_docs,
           CAST(sum(CAST(n_tok AS BIGINT)) AS BIGINT) AS total_tokens
    FROM gated
    GROUP BY split, shard
    """,
    doc="End-to-end corpus-build manifest in ONE lazy plan: language / "
    "length / quality gates -> exact-dup keep-first (window-min over "
    "content hash, no join) -> deterministic 90/5/5 split -> 4-way "
    "shard assignment -> per-(split, shard) doc and token totals. "
    "Composes the funnel, split, and shard operators formula-for-"
    "formula (same oracle fragments); Catalyst fuses the gates into "
    "the scan, so the whole build costs one pass over the corpus plus "
    "the dedup window and final aggregation shuffles.",
    tags=("text", "quality", "sampling", "bench"),
)
def doc_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    txt = F.col("text")
    n_tok = T.token_count(txt).cast("double")
    quality = F.round(T.quality_score(txt), 4)
    keep_first = F.col("doc_id") == F.min("doc_id").over(Window.partitionBy(F.md5(txt)))
    gated = (
        docs.withColumn("n_tok", n_tok)
        .withColumn("quality", quality)
        .withColumn("keep_first", keep_first)
        .where(
            F.col("lang").isin("en", "es")
            & F.col("n_tok").between(20, 5000)
            & (F.col("quality") >= 0.5)
            & F.col("keep_first")
        )
    )
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    split = (
        F.when(h < 0.9 * 4294967296, "train")
        .when(h < 0.95 * 4294967296, "val")
        .otherwise("test")
    )
    return (
        gated.select(
            split.alias("split"),
            (h % 4).cast("int").alias("shard"),
            F.col("n_tok").cast("bigint").alias("n_tok_l"),
        )
        .groupBy("split", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok_l").alias("total_tokens"),
        )
    )


@query(
    "doc_temperature_mixture",
    oracle=f"""
    WITH tok AS (
        SELECT source, doc_id, len({_TRIM_TOKENS_SQL}) AS n_tok FROM documents
    ),
    totals AS (
        SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM tok GROUP BY source
    ),
    rates AS (
        SELECT source, n_docs, n_tokens,
               sqrt((SELECT min(n_tokens) FROM totals) * 1.0 / n_tokens) AS rate
        FROM totals
    )
    SELECT r.source, r.n_docs, r.n_tokens,
           round(r.rate, 4) AS sample_rate,
           CAST(sum(CASE WHEN (t.doc_id * 2654435761) % 4294967296
                              < r.rate * 4294967296
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM tok t JOIN rates r USING (source)
    GROUP BY r.source, r.n_docs, r.n_tokens, r.rate
    """,
    doc="Temperature-flattened source mixture (alpha=0.5, the XLM-R "
    "style rebalance): each source's keep-rate is sqrt(min_tokens / "
    "source_tokens), anchored at the smallest source so proportions "
    "flatten toward uniform without upsampling. Anchors are exact "
    "integer MIN/SUM aggregates, so the float math is bit-identical "
    "across engines; doc selection is the same multiplicative-hash "
    "threshold as doc_source_mixture (deterministic, partition-"
    "independent, no RNG state).",
    tags=("text", "sampling", "mixture"),
)
def doc_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = T.token_count(F.trim(F.col("text")))
    tok = docs.select("source", "doc_id", n_tok.alias("n_tok"))
    totals = tok.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    min_tokens = F.min("n_tokens").over(Window.partitionBy())
    rates = totals.withColumn(
        "rate", F.sqrt(min_tokens * F.lit(1.0) / F.col("n_tokens"))
    )
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    keep = h < F.col("rate") * F.lit(4294967296)
    return (
        tok.join(F.broadcast(rates), on="source")
        .groupBy("source", "n_docs", "n_tokens", "rate")
        .agg(F.sum(F.when(keep, 1).otherwise(0)).alias("n_sampled"))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("rate", 4).alias("sample_rate"),
            "n_sampled",
        )
    )


@query(
    "doc_bm25_topk",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, token, count(*) AS tf
        FROM (SELECT doc_id, unnest({_TRIM_TOKENS_SQL}) AS token FROM documents)
        WHERE token IN ('spark', 'table', 'join')
        GROUP BY doc_id, token
    ),
    dl AS (SELECT doc_id, len({_TRIM_TOKENS_SQL}) AS dl FROM documents),
    s AS (SELECT count(*) AS n_docs,
                 avg(len({_TRIM_TOKENS_SQL})) AS avgdl FROM documents),
    df AS (SELECT token, count(*) AS df_t FROM tf GROUP BY token),
    scored AS (
        SELECT tf.doc_id,
               round(sum(
                   ln(1 + (s.n_docs - df.df_t + 0.5) / (df.df_t + 0.5))
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4) AS bm25
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN s
        GROUP BY tf.doc_id
    )
    SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
    doc="BM25 (k1=1.2, b=0.75) retrieval scoring for a fixed 3-term "
    "query. The posting list is filtered to the query terms BEFORE any "
    "aggregation — the scan reduces to |terms| postings regardless of "
    "corpus size; document length and avgdl come from one stats pass "
    "(1-row scalar broadcast), per-term df is a |terms|-row broadcast. "
    "Top-k by score via TakeOrderedAndProject with doc_id tie-break.",
    tags=("text", "retrieval", "topk"),
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    terms = ("spark", "table", "join")
    toks = T.tokens(F.trim(F.col("text")))
    tf = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .where(F.col("token").isin(*terms))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dl = docs.select("doc_id", F.size(toks).alias("dl"))
    s = F.broadcast(
        docs.agg(
            F.count("*").alias("n_docs"), F.avg(F.size(toks)).alias("avgdl")
        )
    )
    df = F.broadcast(tf.groupBy("token").agg(F.count("*").alias("df_t")))
    idf = F.log(1 + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5))
    denom = F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
    return (
        tf.join(df, "token")
        .join(dl, "doc_id")
        .crossJoin(s)
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * F.col("tf") * 2.2 / denom), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@query(
    "doc_kl_source_divergence",
    oracle=f"""
    WITH st AS (
        SELECT source, token, count(*) AS c_s
        FROM (SELECT source, unnest({_TRIM_TOKENS_SQL}) AS token FROM documents)
        GROUP BY source, token
    ),
    ct AS (SELECT token, sum(c_s) AS c_t FROM st GROUP BY token),
    ns AS (SELECT source, sum(c_s) AS n_s FROM st GROUP BY source),
    nc AS (SELECT sum(c_s) AS n_c FROM st)
    SELECT st.source,
           CAST(min(ns.n_s) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS distinct_tokens,
           round(sum((st.c_s * 1.0 / ns.n_s)
                     * ln((st.c_s * 1.0 / ns.n_s) / (ct.c_t * 1.0 / nc.n_c))), 4)
               AS kl_vs_corpus
    FROM st JOIN ct USING (token) JOIN ns USING (source) CROSS JOIN nc
    GROUP BY st.source
    """,
    doc="Per-source KL divergence of the token distribution against the "
    "whole corpus — the quantitative 'is this source drifting from the "
    "mix' signal behind source reweighting. Both distributions come "
    "from ONE (source, token) aggregation (corpus counts are a token-"
    "keyed re-reduction of it, no second scan); the token join is "
    "vocabulary-sized so it is left to Catalyst/AQE as a shuffle join "
    "— never broadcast (the doc_tfidf_topk lesson); only the 1-row "
    "corpus total broadcasts.",
    tags=("text", "stats", "curation", "bench"),
)
def doc_kl_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.trim(F.col("text")))
    st = (
        docs.select("source", F.explode(toks).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("c_s"))
    )
    ct = st.groupBy("token").agg(F.sum("c_s").alias("c_t"))
    ns = st.groupBy("source").agg(F.sum("c_s").alias("n_s"))
    nc = F.broadcast(st.agg(F.sum("c_s").alias("n_c")))
    p_s = F.col("c_s") * 1.0 / F.col("n_s")
    p_c = F.col("c_t") * 1.0 / F.col("n_c")
    return (
        st.join(ct, "token")
        .join(ns, "source")
        .crossJoin(nc)
        .groupBy("source")
        .agg(
            F.min("n_s").cast("bigint").alias("n_tokens"),
            F.count("*").alias("distinct_tokens"),
            F.round(F.sum(p_s * F.log(p_s / p_c)), 4).alias("kl_vs_corpus"),
        )
    )


@query(
    "doc_zipf_slope",
    oracle=f"""
    WITH freq AS (
        SELECT token, count(*) AS n
        FROM (SELECT unnest({_TRIM_TOKENS_SQL}) AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT 500
    ),
    ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, token) AS r FROM freq
    )
    SELECT CAST(count(*) AS BIGINT) AS n_ranks,
           round(regr_slope(ln(n), ln(r)), 4) AS zipf_slope,
           round(regr_r2(ln(n), ln(r)), 4) AS fit_r2
    FROM ranked
    """,
    doc="Zipf's-law exponent of the corpus: OLS slope of ln(freq) over "
    "ln(rank) for the top-500 vocabulary. The token aggregation + "
    "TakeOrderedAndProject top-k are fully distributed; the ranking "
    "window runs over the ALREADY-LIMITED 500-row set (bounded by "
    "construction, not by data volume).",
    tags=("text", "stats", "curation"),
)
def doc_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.trim(F.col("text")))
    freq = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(500)
    )
    ranked = freq.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token")))
    )
    ln_n, ln_r = F.log("n"), F.log("r")
    return ranked.agg(
        F.count("*").alias("n_ranks"),
        F.round(F.regr_slope(ln_n, ln_r), 4).alias("zipf_slope"),
        F.round(F.regr_r2(ln_n, ln_r), 4).alias("fit_r2"),
    )


@query(
    "doc_source_cap_sample",
    oracle="""
    SELECT doc_id, source, CAST(rn AS INT) AS sample_rank
    FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY ((doc_id * 2654435761) % 4294967296), doc_id) AS rn
        FROM documents
    )
    WHERE rn <= 15
    """,
    doc="Per-source document cap (epoch capping / quota sampling): keep "
    "at most 15 docs per source, chosen by smallest multiplicative hash "
    "— deterministic uniform-without-replacement, zero RNG state, "
    "reproducible across engines/cluster sizes. The window partitions "
    "by source (parallel across sources); the top-k-per-partition shape "
    "is rank-filter, which Spark executes with a per-partition heap.",
    tags=("text", "sampling", "window"),
)
def doc_source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", F.row_number().over(w).cast("int").alias("sample_rank"))
        .where(F.col("sample_rank") <= 15)
    )


@query(
    "doc_token_pmi_topk",
    oracle=f"""
    WITH arr AS (SELECT {_TRIM_TOKENS_SQL} AS a FROM documents),
    pr AS (
        SELECT a[i] AS w1, a[i + 1] AS w2
        FROM arr, unnest(generate_series(1, len(a) - 1)) AS u(i)
        WHERE len(a) >= 2
    ),
    bg AS (SELECT w1, w2, count(*) AS c_ab FROM pr GROUP BY w1, w2),
    uni AS (
        SELECT token, count(*) AS c
        FROM (SELECT unnest({_TRIM_TOKENS_SQL}) AS token FROM documents)
        GROUP BY token
    ),
    nb AS (SELECT sum(c_ab) AS n_b FROM bg),
    nu AS (SELECT sum(c) AS n_u FROM uni)
    SELECT bg.w1, bg.w2, CAST(bg.c_ab AS BIGINT) AS pair_count,
           round(ln((bg.c_ab * 1.0 / nb.n_b)
                    / ((u1.c * 1.0 / nu.n_u) * (u2.c * 1.0 / nu.n_u))), 4) AS pmi
    FROM bg JOIN uni u1 ON bg.w1 = u1.token
            JOIN uni u2 ON bg.w2 = u2.token
    CROSS JOIN nb CROSS JOIN nu
    WHERE bg.c_ab >= 5
    ORDER BY pmi DESC, bg.w1, bg.w2 LIMIT 30
    """,
    doc="Pointwise mutual information of adjacent token pairs (collocation "
    "mining, min support 5): bigram counts via position-explode (the "
    "Generate-inlining-safe shape — the token array stays a bound column, "
    "O(1) work per emitted pair), unigram marginals joined on each side "
    "as vocabulary-sized SHUFFLE joins (never broadcast), scalar totals "
    "broadcast, top-30 by rounded PMI with full lexical tie-break.",
    tags=("text", "stats", "topk", "bench"),
)
def doc_token_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.withColumn("_toks", T.tokens(F.trim(F.col("text")))).where(
        F.size("_toks") >= 2
    )
    posted = w.select(
        F.col("_toks"),
        F.explode(F.sequence(F.lit(1), F.size("_toks") - 1)).alias("_pos"),
    )
    pairs = posted.select(
        F.element_at("_toks", F.col("_pos")).alias("w1"),
        F.element_at("_toks", F.col("_pos") + 1).alias("w2"),
    )
    bg = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_ab"))
    uni = (
        docs.select(F.explode(T.tokens(F.trim(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    nb = F.broadcast(bg.agg(F.sum("c_ab").alias("n_b")))
    nu = F.broadcast(uni.agg(F.sum("c").alias("n_u")))
    u1 = uni.select(F.col("token").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log(
        (F.col("c_ab") * 1.0 / F.col("n_b"))
        / ((F.col("c1") * 1.0 / F.col("n_u")) * (F.col("c2") * 1.0 / F.col("n_u")))
    )
    return (
        bg.where(F.col("c_ab") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(nb)
        .crossJoin(nu)
        .select(
            "w1", "w2",
            F.col("c_ab").alias("pair_count"),
            F.round(pmi, 4).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(30)
    )


@query(
    "doc_ttr_fertility_by_source",
    oracle=f"""
    WITH st AS (
        SELECT source,
               count(*) AS total_tokens,
               count(DISTINCT token) AS distinct_tokens
        FROM (SELECT source, unnest({_TRIM_TOKENS_SQL}) AS token FROM documents)
        GROUP BY source
    ),
    fert AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(len(regexp_extract_all(text, '{_BPE_SQL}')) * 1.0
                         / len({_TRIM_TOKENS_SQL})), 4) AS avg_fertility
        FROM documents GROUP BY source
    )
    SELECT st.source,
           CAST(st.total_tokens AS BIGINT) AS total_tokens,
           CAST(st.distinct_tokens AS BIGINT) AS distinct_tokens,
           round(st.distinct_tokens * 1.0 / st.total_tokens, 4) AS ttr,
           fert.n_docs, fert.avg_fertility
    FROM st JOIN fert USING (source)
    """,
    doc="Type-token ratio + BPE fertility (subword/word expansion factor) "
    "per source — the tokenizer-budget diagnostics for corpus mixing. "
    "Distinct-token counting shuffles on (source, token) with partial "
    "aggregation; fertility is a per-doc map-side expression averaged "
    "per source; the two source-keyed aggregates join post-aggregation.",
    tags=("text", "stats", "curation"),
)
def doc_ttr_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.trim(F.col("text")))
    st = (
        docs.select("source", F.explode(toks).alias("token"))
        .groupBy("source")
        .agg(
            F.count("*").alias("total_tokens"),
            F.countDistinct("token").alias("distinct_tokens"),
        )
    )
    fert = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(
            F.avg(T.bpe_token_count(F.col("text")) * 1.0 / F.size(toks)), 4
        ).alias("avg_fertility"),
    )
    return st.join(fert, "source").select(
        "source",
        "total_tokens",
        "distinct_tokens",
        F.round(F.col("distinct_tokens") * 1.0 / F.col("total_tokens"), 4).alias("ttr"),
        "n_docs",
        "avg_fertility",
    )


@query(
    "doc_vocab_heavy_hitters_approx",
    oracle="""
    SELECT token, CAST(c AS BIGINT) AS est_count
    FROM (
        SELECT token, count(*) AS c
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
              FROM documents)
        GROUP BY token
        ORDER BY c DESC, token ASC
        LIMIT 25
    )
    """,
    doc="Approximate heavy hitters over the token stream via "
    "approx_top_k (Spark's bounded-memory frequent-items sketch): "
    "top-25 tokens with estimated counts from ONE pass with O(tracked) "
    "state per partition and mergeable partials — the scale path when "
    "the vocabulary no longer fits a token-keyed exact aggregation "
    "(the exact twin is doc_vocab_topk). This build's approx_top_k is "
    "FAIL-LOUD on overflow: once distinct items exceed maxItemsTracked "
    "it returns an empty result rather than silently approximating "
    "(observed at x30 when the Heaps-law fixture pushed 930 distinct "
    "tokens past the old 250), so tracked state is 1M — tens of MB per "
    "partition sketch, head-EXACT for any vocabulary under it (the "
    "Heaps-law x100 fixture's ~106k forms included), and an empty "
    "result (not wrong counts) beyond it, where the exact twin is the "
    "right tool. The k-cut is made TIE-DETERMINISTIC (VERDICT r10 #4) "
    "by over-fetching the sketch head (2048 >> 25) and applying the "
    "oracle's own total order (count DESC, token ASC) before the LIMIT "
    "— the replicated scale fixtures tie every per-copy word form "
    "(mult equal-count tokens per base word) across the 25-cut, where "
    "the sketch's internal tie order is unspecified; the over-fetch "
    "covers the boundary tie group as long as < ~20 base-word groups "
    "straddle the cut (mult <= ~2000 on these fixtures).",
    tags=("text", "vocab", "approx"),
)
def doc_vocab_heavy_hitters_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.trim(F.col("text")))
    return (
        docs.select(F.explode(toks).alias("token"))
        .agg(F.expr("approx_top_k(token, 2048, 1000000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("token"),
            F.col("e.count").cast("bigint").alias("est_count"),
        )
        .orderBy(F.desc("est_count"), F.asc("token"))
        .limit(25)
    )


@query(
    "doc_unigram_logprob_quality",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, token
        FROM (SELECT doc_id, unnest({_TRIM_TOKENS_SQL}) AS token FROM documents)
    ),
    uni AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    n AS (SELECT sum(c) AS total FROM uni)
    SELECT tok.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(-sum(ln(uni.c * 1.0 / n.total)) / count(*), 4) AS avg_nll
    FROM tok JOIN uni USING (token) CROSS JOIN n
    GROUP BY tok.doc_id
    """,
    doc="Perplexity-proxy quality scoring (CCNet-style LM filtering with "
    "the corpus's own unigram model): per-document mean negative "
    "log-likelihood under token unigram probabilities. The LM 'training' "
    "is the token aggregation itself; scoring joins the token stream "
    "back to the vocabulary-sized model as a SHUFFLE join (a real LM "
    "table is far too large to broadcast — the TF-IDF lesson); only the "
    "1-row token total broadcasts. Low avg_nll = high-probability "
    "(stereotypical) text, high = rare-token text; both tails get "
    "dropped in pretraining curation.",
    tags=("text", "quality", "curation"),
)
def doc_unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens(F.trim(F.col("text")))).alias("token"))
    uni = tok.groupBy("token").agg(F.count("*").alias("c"))
    n = F.broadcast(uni.agg(F.sum("c").alias("total")))
    return (
        tok.join(uni, "token")
        .crossJoin(n)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                -F.sum(F.log(F.col("c") * 1.0 / F.col("total"))) / F.count("*"), 4
            ).alias("avg_nll"),
        )
    )


# The planted-PII suffix appended to every 7th document, expressed
# once per engine with identical output bytes (md5-compared): emails,
# a card, an SSN, a phone and a dotted quad, all derived from doc_id
# so the oracle can reconstruct the exact same corpus.
_PII_PLANT_SQL = (
    "' Contact user' || CAST(doc_id AS VARCHAR) || "
    "'@corp.example.com, card 4111-1111-1111-2222, ssn 987-65-4320, "
    "tel +1 202-555-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || "
    "', ip 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || "
    "CAST(doc_id % 250 AS VARCHAR) || ' end.'"
)

# Build the DuckDB side from the SAME pattern table the Spark side
# uses (functions/text.py PII_PATTERNS) — a pattern edit cannot drift
# the oracle.
def _pii_redact_sql(expr: str) -> str:
    out = expr
    for _, pat, tok in T.PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{tok}', 'g')"
    return out


_PII_REDACT_SQL = _pii_redact_sql("t2")
_PII_COUNT_SQL = ",\n           ".join(
    f"CAST(len(regexp_extract_all(t2, '{_ppat}')) AS BIGINT) AS {_pname}"
    for _pname, _ppat, _ptok in T.PII_PATTERNS
)


@query(
    "doc_pii_redaction",
    oracle=f"""
    WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || {_PII_PLANT_SQL}
                    ELSE text END AS t2
        FROM documents
    )
    SELECT doc_id,
           {_PII_COUNT_SQL},
           md5({_PII_REDACT_SQL}) AS redacted_md5
    FROM planted
    """,
    doc="Typed PII redaction over the corpus — the scrub step a "
    "training-data pipeline runs before anything else ships: emails, "
    "card numbers, SSNs, phone numbers and IPv4 quads replaced by "
    "typed tokens via chained native regexp_replace (whole-stage "
    "codegen, zero Python in the row loop, embarrassingly parallel — "
    "no shuffle at all). Every 7th doc gets a planted PII suffix "
    "derived from doc_id; the oracle rebuilds the identical corpus "
    "and applies the identical (pattern, token) sequence — generated "
    "from the SAME functions/text.py PII_PATTERNS table — so the "
    "md5 of the redacted text proves byte-exact Java-vs-RE2 regex "
    "agreement, and the per-type counts prove match parity on both "
    "planted and organic text. Patterns use only the regex subset "
    "the two engines share (no lookaround, no unicode classes).",
    tags=("text", "scrub", "curation"),
)
def doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    plant = F.concat(
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit(
            "@corp.example.com, card 4111-1111-1111-2222, ssn 987-65-4320, "
            "tel +1 202-555-"
        ),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        F.lit(", ip 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" end."),
    )
    planted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), plant))
        .otherwise(F.col("text"))
        .alias("t2"),
    )
    counts = T.pii_counts(F.col("t2"))
    return planted.select(
        "doc_id",
        *[counts[name].alias(name) for name, _, _ in T.PII_PATTERNS],
        F.md5(T.redact_pii(F.col("t2"))).alias("redacted_md5"),
    )


# 5-gram shingle list over an arbitrary DuckDB token-array expression
# (mirrors dedup.with_shingles / _TOKENS_SQL-based fragments in
# textops, parameterized on the text expression).
def _shingles_sql(tok_expr: str) -> str:
    return (
        "list_distinct(list_transform("
        f"generate_series(1, len({tok_expr}) - 4), "
        f"i -> {tok_expr}[i] || ' ' || {tok_expr}[i+1] || ' ' || "
        f"{tok_expr}[i+2] || ' ' || {tok_expr}[i+3] || ' ' || {tok_expr}[i+4]))"
    )


_RT_TOKS = "regexp_split_to_array(rt, '\\s+')"


@query(
    "doc_curation_pipeline_e2e",
    oracle=f"""
    WITH RECURSIVE corp AS (
        SELECT doc_id, lang, {_pii_redact_sql("text")} AS rt
        FROM documents WHERE doc_id % 101 <> 0
    ),
    feat AS (
        SELECT doc_id, lang, rt,
               CAST(len({_RT_TOKS}) AS DOUBLE) AS n_tok,
               CAST(len({_RT_TOKS}) AS BIGINT) AS n_tok_l,
               CAST(len(list_filter({_RT_TOKS}, x -> x IN {_EN_STOP})) AS DOUBLE) AS n_stop,
               CAST(length(regexp_replace(rt, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                   / nullif(length(rt), 0) AS p_ratio,
               md5(rt) AS fp
        FROM corp
    ),
    q AS (
        SELECT doc_id, lang, rt, n_tok, n_tok_l, fp,
               (lang IN ('en', 'es') AND n_tok BETWEEN 20 AND 5000
                AND round(1.0 / (1.0 + exp(-(0.01 * n_tok
                        + 2.0 * (n_stop / nullif(n_tok, 0))
                        - 5.0 * p_ratio - 1.0))), 4) >= 0.5) AS c_q
        FROM feat
    ),
    ex AS (
        SELECT *,
               (c_q AND doc_id = min(CASE WHEN c_q THEN doc_id END)
                    OVER (PARTITION BY fp)) AS c_ex
        FROM q
    ),
    sh AS (
        SELECT doc_id, length(rt) AS n_chars_rt, {_shingles_sql(_RT_TOKS)} AS sh
        FROM ex WHERE c_ex
    ),
    postings AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(sh) AS sz FROM sh),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM postings a JOIN postings b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    prs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM prs
        UNION SELECT id_b, id_a FROM prs
    ),
    reach(v, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    comp AS (SELECT v AS id, min(r) AS component FROM reach GROUP BY v),
    members AS (
        SELECT c.component, c.id AS doc_id, s.n_chars_rt
        FROM comp c JOIN sh s ON s.doc_id = c.id
    ),
    drops AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   row_number() OVER (PARTITION BY component
                       ORDER BY n_chars_rt DESC, doc_id ASC) AS rn
            FROM members)
        WHERE rn > 1
    ),
    esh AS (
        SELECT {_shingles_sql(_RT_TOKS)} AS sh
        FROM (SELECT {_pii_redact_sql("text")} AS rt
              FROM documents WHERE doc_id % 101 = 0)
    ),
    epost AS (SELECT DISTINCT unnest(sh) AS g FROM esh),
    cpost AS (SELECT doc_id, unnest(sh2) AS g
              FROM (SELECT doc_id, {_shingles_sql(_RT_TOKS)} AS sh2 FROM corp)),
    cont AS (SELECT DISTINCT c.doc_id FROM cpost c JOIN epost e USING (g)),
    flags AS (
        SELECT e.doc_id, e.n_tok_l, e.c_q, e.c_ex,
               (e.c_ex AND e.doc_id NOT IN (SELECT doc_id FROM drops)) AS c_fz,
               (e.c_ex AND e.doc_id NOT IN (SELECT doc_id FROM drops)
                AND e.doc_id NOT IN (SELECT doc_id FROM cont)) AS c_fin
        FROM ex e
    )
    SELECT 0 AS stage_idx, 'input' AS stage,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok_l) AS BIGINT) AS n_tokens FROM flags
    UNION ALL
    SELECT 1, 'quality', CAST(sum(CASE WHEN c_q THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN c_q THEN n_tok_l ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL
    SELECT 2, 'exact_dedup', CAST(sum(CASE WHEN c_ex THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN c_ex THEN n_tok_l ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL
    SELECT 3, 'fuzzy_dedup', CAST(sum(CASE WHEN c_fz THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN c_fz THEN n_tok_l ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL
    SELECT 4, 'decontaminated', CAST(sum(CASE WHEN c_fin THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN c_fin THEN n_tok_l ELSE 0 END) AS BIGINT) FROM flags
    """,
    doc="The FLAGSHIP curation composite: the full pretraining-corpus "
    "pipeline a data team actually ships, as ONE lazy Spark plan — "
    "(1) typed PII redaction (functions/text.py PII_PATTERNS), "
    "(2) language/length/quality gate on the REDACTED text (same "
    "logistic as doc_pretrain_filter_funnel), (3) exact dedup "
    "(min-id per md5 fingerprint, window — no join), (4) fuzzy dedup "
    "among exact survivors (MinHash-LSH candidates, exact-Jaccard "
    ">= 0.5 verify, connected components, keep-LONGEST canonical), "
    "(5) 5-gram decontamination against the deterministic doc_id%101 "
    "eval split. Output: the per-stage funnel report (docs + tokens "
    "surviving each cumulative gate) — 5 rows from one conditional "
    "aggregation over flag columns; the join-derived stages attach as "
    "broadcast flags (drop-list and contamination sets are "
    "LSH-/overlap-bounded). The oracle rebuilds all five stages in "
    "SQL, reusing the verified fragments of doc_pii_redaction, "
    "doc_pretrain_filter_funnel, doc_fuzzy_dedup_e2e (recursive-CTE "
    "closure) and doc_decontaminate, so hash equality asserts the "
    "COMPOSITION is right — stage order, cumulative gating, and each "
    "stage's set — not just each stage in isolation. Scale: one "
    "corpus scan feeds the flag columns; the fuzzy stage shuffles "
    "O(survivors x bands) postings and O(pairs) candidates; nothing "
    "doc x doc (catalog-wide no-cartesian sweep covers it).",
    tags=("text", "curation", "dedup", "pipeline", "bench"),
)
def doc_curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corp = docs.where(F.pmod(F.col("doc_id"), F.lit(101)) != 0)
    ev = docs.where(F.pmod(F.col("doc_id"), F.lit(101)) == 0)
    base = corp.select("doc_id", "lang", T.redact_pii("text").alias("rt"))
    n_tok = T.token_count(F.col("rt")).cast("double")
    feats = base.select(
        "doc_id",
        "lang",
        "rt",
        n_tok.alias("n_tok"),
        T.token_count(F.col("rt")).cast("long").alias("n_tok_l"),
        F.round(T.quality_score(F.col("rt")), 4).alias("quality"),
        F.md5("rt").alias("fp"),
    )
    c_q = (
        F.col("lang").isin("en", "es")
        & F.col("n_tok").between(20, 5000)
        & (F.col("quality") >= 0.5)
    )
    flagged = feats.withColumn("c_q", c_q).withColumn(
        "c_ex",
        F.col("c_q")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("c_q"), F.col("doc_id"))).over(
                Window.partitionBy("fp")
            )
        ),
    )
    # The redaction + tokenization + quality + fingerprint-window pass
    # is the pipeline's expensive common subexpression, and it feeds
    # THREE independent subtrees (the final flag aggregation, the
    # fuzzy-dedup stage via s2, and the decontamination corpus side).
    # Spark has no DataFrame-level CSE, so without materialization the
    # full-corpus regex pass re-executes once per subtree (guide §5:
    # cache exactly when recomputation beats memory pressure — it does
    # here, 3 corpus-wide regex passes -> 1).
    flagged = flagged.persist()
    # fuzzy stage runs ONLY on exact-dedup survivors: candidates via
    # banded LSH, exact-verified, grouped, keep-longest canonical
    s2 = flagged.where(F.col("c_ex")).select(
        "doc_id", F.col("rt").alias("text"), F.length("rt").alias("n_chars_rt")
    )
    # collapse_exact OFF (r14): s2 is already exact-deduped on md5(rt)
    # — the c_ex window keeps one doc per fingerprint and fp IS
    # F.md5("rt"), the identical key the collapse would group on — so
    # every collapse group is a singleton by construction and the
    # pre-collapse would only add a corpus-wide md5 grouping shuffle +
    # persist for a guaranteed no-op (singleton groups expand to
    # themselves; see minhash_lsh_pairs docstring).
    pairs = dedup.minhash_lsh_pairs(
        s2.select("doc_id", "text"), "doc_id", "text",
        shingle_k=5, num_perm=64, num_bands=16, threshold=0.5,
        collapse_exact=False,
    )
    comp = dedup.connected_components(pairs)
    members = comp.join(
        s2.select(F.col("doc_id").alias("id"), "n_chars_rt"), on="id"
    )
    w_best = Window.partitionBy("component").orderBy(
        F.col("n_chars_rt").desc(), F.col("id").asc()
    )
    drops = (
        members.withColumn("rn", F.row_number().over(w_best))
        .where(F.col("rn") > 1)
        .select(F.col("id").alias("doc_id"), F.lit(True).alias("_fz_drop"))
    )
    # decontamination is a per-doc property — computed once over the
    # whole corpus, gated later (broadcast eval shingles inside); the
    # corpus side reads the PERSISTED flagged frame (redaction already
    # computed) instead of re-deriving `base` from the raw scan
    cont = dedup.contamination(
        flagged.select("doc_id", F.col("rt").alias("text")),
        ev.select("doc_id", T.redact_pii("text").alias("text")),
        "doc_id", "text", n_gram=5,
    ).select("doc_id", "contaminated")
    flagged2 = (
        flagged.join(F.broadcast(drops), on="doc_id", how="left")
        .join(cont, on="doc_id", how="left")
        .withColumn("c_fz", F.col("c_ex") & F.col("_fz_drop").isNull())
        .withColumn(
            "c_fin",
            F.col("c_fz") & ~F.coalesce(F.col("contaminated"), F.lit(False)),
        )
    )
    stages = [
        ("input", F.lit(True)),
        ("quality", F.col("c_q")),
        ("exact_dedup", F.col("c_ex")),
        ("fuzzy_dedup", F.col("c_fz")),
        ("decontaminated", F.col("c_fin")),
    ]
    aggs = []
    for i, (name, cond) in enumerate(stages):
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_d{i}")
        )
        aggs.append(
            F.sum(F.when(cond, F.col("n_tok_l")).otherwise(0))
            .cast("long")
            .alias(f"_t{i}")
        )
    row = flagged2.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.col(f"_d{i}").alias("n_docs"),
                F.col(f"_t{i}").alias("n_tokens"),
            )
            for i, (name, _) in enumerate(stages)
        ]
    )
    return row.select(F.explode(report).alias("s")).select("s.*")
