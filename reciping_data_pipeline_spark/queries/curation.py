"""Corpus-curation hygiene queries: distribution-based outlier
trimming and split-leakage detection.

Registered LAST in the catalog import order so they join the driver's
rotating verification window after the current backlog clears; the
repo's own oracle gate (tests/test_catalog_oracle.py) verifies them
every run regardless.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from reciping_data_pipeline_spark.functions import text as T
from reciping_data_pipeline_spark.operators import dedup
from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.queries.textops import _SPLIT_HASH_SQL, _TOKENS_SQL
from reciping_data_pipeline_spark.tables import load_table, table_row_count

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


@query(
    "doc_ngram_novelty",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len({_TOKENS_SQL}) - 4),
                   i -> {_TOKENS_SQL}[i] || ' ' || {_TOKENS_SQL}[i+1] || ' ' || {_TOKENS_SQL}[i+2]
                        || ' ' || {_TOKENS_SQL}[i+3] || ' ' || {_TOKENS_SQL}[i+4])) AS sh
        FROM documents
    ),
    postings AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
    firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM postings GROUP BY shingle),
    novel AS (
        SELECT first_doc AS doc_id, count(*) AS novel_ngrams FROM firsts GROUP BY first_doc
    ),
    sizes AS (SELECT doc_id, len(sh) AS n_ngrams FROM docs WHERE len(sh) > 0)
    SELECT s.doc_id,
           CAST(s.n_ngrams AS BIGINT) AS n_ngrams,
           CAST(coalesce(n.novel_ngrams, 0) AS BIGINT) AS novel_ngrams,
           round(coalesce(n.novel_ngrams, 0) * 1.0 / s.n_ngrams, 4) AS novelty
    FROM sizes s LEFT JOIN novel n USING (doc_id)
    """,
    doc="Corpus-diversity contribution: per doc, the fraction of its "
    "distinct 5-grams FIRST introduced by it (min-doc_id owner per "
    "shingle in doc_id order) — low novelty marks recombined/templated "
    "content even when no single pair crosses a dedup threshold. One "
    "inverted-index aggregation (map-side partial min per shingle); "
    "never doc x doc.",
    tags=("text", "quality", "curation", "bench"),
)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = dedup.spread(load_table(spark, sf_dir, "documents"))
    # ONE tokenization pass (guide §1.2/§5): the postings frame feeds
    # two differently-keyed aggregations (min-per-shingle and
    # per-doc size), and without materialization the regex
    # tokenize+shingle pass re-executes per subtree (no DataFrame
    # CSE). The per-doc DISTINCT shingle array is built once
    # (with_shingles, bound column), so `size(shingles)` IS the
    # oracle's len(list_distinct(...)) — the former doc_id-keyed
    # count_distinct over duplicate-bearing postings collapses to a
    # plain min of a constant — and the persisted postings rows are
    # narrow (doc_id, n_ngrams, 64-bit shingle fingerprint): the
    # min-per-shingle exchange still moves fingerprints, never
    # ~30-byte shingle strings.
    sh = dedup.with_shingles(docs, "text", 5).where(F.size("shingles") > 0)
    postings = sh.select(
        "doc_id",
        F.size("shingles").alias("n_ngrams"),
        F.explode("shingles").alias("shingle"),
    ).select("doc_id", "n_ngrams", F.xxhash64("shingle").alias("shfp")).persist()
    firsts = postings.groupBy("shfp").agg(F.min("doc_id").alias("first_doc"))
    novel = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("novel_ngrams")
    )
    sizes = postings.groupBy("doc_id").agg(F.min("n_ngrams").alias("n_ngrams"))
    return (
        sizes.join(novel, on="doc_id", how="left")
        .select(
            "doc_id",
            F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
            F.coalesce("novel_ngrams", F.lit(0)).alias("novel_ngrams"),
            F.round(F.coalesce("novel_ngrams", F.lit(0)) / F.col("n_ngrams"), 4).alias("novelty"),
        )
    )


@query(
    "doc_dup_cluster_histogram",
    oracle=f"""
    WITH clusters AS (
        SELECT md5({{norm}}) AS fp, count(*) AS cluster_size
        FROM documents GROUP BY fp
    )
    SELECT cluster_size,
           count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM clusters GROUP BY cluster_size
    """.format(norm="trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"),
    doc="Duplicate-cluster size spectrum: how many exact-dup clusters "
    "of each size the corpus contains (size 1 = unique docs) — the "
    "shape of this histogram decides whether dedup is worth a full "
    "near-dup pass. Two aggregations, both map-side combinable.",
    tags=("text", "dedup", "curation"),
)
def doc_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clusters = docs.groupBy(T.fingerprint(F.col("text")).alias("fp")).agg(
        F.count("*").alias("cluster_size")
    )
    return clusters.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        (F.col("cluster_size") * F.count("*")).alias("n_docs"),
    )


@query(
    "doc_boilerplate_prefix",
    oracle=f"""
    WITH pfx AS (
        SELECT doc_id,
               array_to_string(list_slice({_TRIM_TOKENS_SQL}, 1, 5), ' ') AS prefix,
               len({_TRIM_TOKENS_SQL}) AS n_tok
        FROM documents
        WHERE len({_TRIM_TOKENS_SQL}) >= 5
    )
    SELECT prefix,
           count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM pfx
    GROUP BY prefix
    HAVING count(*) > 1
    """,
    doc="Boilerplate detection: shared 5-token document prefixes "
    "(headers, licenses, templated openings) appearing on more than "
    "one doc — the cheap precursor to targeted boilerplate stripping. "
    "One aggregation on a derived prefix key.",
    tags=("text", "quality", "curation"),
)
def doc_boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.trim(F.col("text")))
    return (
        docs.where(F.size(toks) >= 5)
        .select("doc_id", F.concat_ws(" ", F.slice(toks, 1, 5)).alias("prefix"))
        .groupBy("prefix")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .where(F.col("n_docs") > 1)
    )


@query(
    "doc_token_frequency_spectrum",
    oracle=f"""
    WITH counts AS (
        SELECT token, count(*) AS freq
        FROM (SELECT unnest({_TRIM_TOKENS_SQL}) AS token FROM documents)
        WHERE token <> ''
        GROUP BY token
    )
    SELECT freq,
           count(*) AS n_tokens_with_freq,
           CAST(freq * count(*) AS BIGINT) AS occurrences
    FROM counts GROUP BY freq
    """,
    doc="Token frequency-of-frequencies (Zipf spectrum): how many "
    "distinct tokens occur exactly k times — hapax share and spectrum "
    "slope are the standard tokenizer/corpus-health diagnostics. Two "
    "token-keyed aggregations with map-side combine; shuffle carries "
    "one row per distinct token then one per distinct frequency.",
    tags=("text", "vocab", "curation"),
)
def doc_token_frequency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.trim(F.col("text")))
    counts = (
        docs.select(F.explode(toks).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    return counts.groupBy("freq").agg(
        F.count("*").alias("n_tokens_with_freq"),
        (F.col("freq") * F.count("*")).alias("occurrences"),
    )


_DOT = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
_NRM = "sqrt(list_dot_product(CAST({v} AS DOUBLE[]), CAST({v} AS DOUBLE[])))"


@query(
    "embed_filtered_knn",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    keep AS (SELECT doc_id FROM documents WHERE lang = 'en'),
    c AS (
        SELECT e.vec_id AS neighbor_id, e.embedding AS cv
        FROM embeddings e JOIN keep k ON e.vec_id = k.doc_id
    ),
    pairs AS (
        SELECT query_id, neighbor_id,
               round({_DOT.format(a='qv', b='cv')}
                     / nullif({_NRM.format(v='qv')} * {_NRM.format(v='cv')}, 0), 4) AS cosine_sim
        FROM c CROSS JOIN q
        WHERE neighbor_id != query_id
    )
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS sim_rank
    FROM pairs
    QUALIFY sim_rank <= 5
    """,
    doc="Filtered vector search (the production retrieval shape): the "
    "corpus is PRE-filtered by a relational predicate (here: the "
    "joined document's language) before the exact cosine top-k, so "
    "ranks are computed over the eligible set — post-filtering an "
    "unfiltered top-k silently returns < k rows. The metadata "
    "semi-join prunes the corpus scan before any vector math; queries "
    "stay broadcast.",
    tags=("vector", "topk", "filter", "curation"),
)
def embed_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reciping_data_pipeline_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    keep = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("lang") == "en")
        .select(F.col("doc_id").alias("vec_id"))
    )
    corpus = emb.join(keep, on="vec_id", how="left_semi")
    queries = emb.where(F.col("vec_id") < 10)
    return similarity.brute_force_topk(corpus, queries, k=5, round_dp=4)


@query(
    "embed_label_centroids",
    oracle="""
    SELECT label,
           array_to_string(list(printf('%.4f', rv) ORDER BY i), ',')
               AS centroid
    FROM (
        -- + 0.0 normalizes IEEE negative zero: round() of a tiny
        -- negative mean yields -0.0 in DuckDB but 0.0 in Spark
        SELECT label, i, round(avg(v), 4) + 0.0 AS rv
        FROM (SELECT label, unnest(embedding) AS v,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
        GROUP BY label, i
    )
    GROUP BY label
    """,
    doc="Distributed element-wise vector aggregation: per-label mean "
    "embedding (class centroids for labeling/clustering workflows). "
    "posexplode keys the shuffle on (label, position) with map-side "
    "partial sums — 64 narrow rows per vector, never a whole-vector "
    "reduce on one node — then the centroid is reassembled with an "
    "order-pinned array_agg and serialized to a fixed-decimal CSV "
    "string (array-typed result columns are not sortable by a generic "
    "pandas-based comparison harness). At 100 TB this is the only "
    "shape that scales: vector width parallelism AND row parallelism.",
    tags=("vector", "agg", "curation"),
)
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    per_pos = (
        emb.select("label", F.posexplode("embedding").alias("i", "v"))
        .groupBy("label", "i")
        .agg((F.round(F.avg("v"), 4) + F.lit(0.0)).alias("rv"))
    )
    return per_pos.groupBy("label").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "rv"))).getField("rv"),
                lambda v: F.format_string("%.4f", v),
            ),
            ",",
        ).alias("centroid")
    )


@query(
    "doc_repeated_passages",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TRIM_TOKENS_SQL} AS toks, len({_TRIM_TOKENS_SQL}) AS n_tok
        FROM documents
    ),
    windows AS (
        SELECT doc_id,
               md5(array_to_string(list_slice(toks, start, start + 19), ' ')) AS wfp
        FROM t, unnest(generate_series(1, n_tok - 19, 10)) AS u(start)
        WHERE n_tok >= 20
    ),
    dwin AS (SELECT DISTINCT doc_id, wfp FROM windows),
    shared AS (
        SELECT wfp FROM dwin GROUP BY wfp HAVING count(*) > 1
    ),
    per_doc AS (
        SELECT d.doc_id,
               count(*) AS n_windows,
               CAST(sum(CASE WHEN s.wfp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS shared_windows
        FROM dwin d LEFT JOIN shared s USING (wfp)
        GROUP BY d.doc_id
    )
    SELECT doc_id, n_windows, shared_windows,
           round(shared_windows * 1.0 / n_windows, 4) AS shared_frac
    FROM per_doc
    """,
    doc="Repeated-passage detection (the exact-substring dedup "
    "approximation of Lee et al. 2022): fingerprint 20-token windows "
    "at stride 10 per doc, mark windows whose fingerprint recurs in "
    "ANY other doc, report each doc's shared-window fraction — "
    "catches long verbatim passages that 5-gram Jaccard dilutes away "
    "in long documents. Window explode is index-arithmetic (zero "
    "shuffle); the only exchanges are the fingerprint-keyed "
    "aggregation and the per-doc rollup, both map-side combinable.",
    tags=("text", "dedup", "curation", "bench"),
)
def doc_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = dedup.spread(load_table(spark, sf_dir, "documents"))
    # Position-explode the window starts with the token array bound as
    # a multi-referenced column: exploding a constructed md5 array
    # would re-evaluate the whole transform per emitted element (the
    # Generate-inlining trap documented at dedup.exploded_shingles).
    w = docs.withColumn("_toks", T.tokens(F.trim(F.col("text")))).where(F.size("_toks") >= 20)
    posted = w.select(
        "doc_id",
        "_toks",
        F.explode(F.sequence(F.lit(1), F.size("_toks") - 19, F.lit(10))).alias("s"),
    )
    win = posted.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), F.col("s"), 20))).alias("wfp"),
    ).distinct()
    # ONE pass (r14): the shared-window flag is a count over the wfp
    # partition of the already-distinct (doc, wfp) rows — the former
    # aggregate-then-left-join shape consumed `win` twice, and with no
    # DataFrame CSE the whole tokenize+md5+distinct subtree executed
    # once per consumer (two full corpus passes) plus a join whose
    # stats-blind build side could demote to a sort-merge re-shuffle.
    per_doc = (
        win.withColumn("_cnt", F.count("*").over(Window.partitionBy("wfp")))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("_cnt") > 1, 1).otherwise(0)).alias("shared_windows"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_windows",
        "shared_windows",
        F.round(F.col("shared_windows") / F.col("n_windows"), 4).alias("shared_frac"),
    )


@query(
    "user_day_transcripts",
    oracle="""
    SELECT user_id,
           CAST(CAST(ts AS DATE) AS STRING) AS event_date,
           count(*) AS n_events,
           string_agg(event_type || ':' || printf('%.2f', round(coalesce(value, 0), 2)),
                      ' | ' ORDER BY ts, event_id) AS transcript
    FROM events
    GROUP BY user_id, CAST(ts AS DATE)
    """,
    doc="Structured-logs-to-training-text serialization: each user-day "
    "becomes one ordered transcript line (event_type:value joined in "
    "timestamp order with an event_id tie-break) — the step that turns "
    "behavioral logs into sequence-model training records. One shuffle "
    "keyed (user, day); ordering is enforced per group by an "
    "array_sort over (ts, event_id) structs, deterministic on any "
    "partitioning — never a global sort.",
    tags=("text", "serialization", "curation"),
)
def user_day_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # printf-style fixed-decimal render on BOTH engines: a bare
    # double->string cast diverges at >=1e7 (Spark renders Java
    # scientific notation '1.23E8', DuckDB '123000000.0').
    line = F.concat_ws(
        ":",
        F.col("event_type"),
        F.format_string("%.2f", F.round(F.coalesce(F.col("value"), F.lit(0)), 2)),
    )
    rows = ev.select(
        "user_id",
        F.to_date("ts").cast("string").alias("event_date"),
        F.struct(F.col("ts"), F.col("event_id"), line.alias("line")).alias("entry"),
    )
    return rows.groupBy("user_id", "event_date").agg(
        F.count("*").alias("n_events"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list("entry")), lambda s: s["line"]), " | "
        ).alias("transcript"),
    )


@query(
    "user_trailing_7d_value",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               round(sum(coalesce(value, 0)), 4) AS day_value
        FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(d AS STRING) AS event_date,
           round(sum(day_value) OVER (
               PARTITION BY user_id ORDER BY d
               RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW), 4)
               AS trailing_7d
    FROM daily
    """,
    doc="Time-based sliding window: per-user trailing-7-day value via a "
    "RANGE INTERVAL frame (calendar-aware — gaps in activity shrink "
    "the frame, unlike a ROWS frame which would reach back across "
    "them). Pre-aggregated to user-day rows first, so the window "
    "input is O(users x days), and the partition key keeps frame "
    "state executor-local at any scale.",
    tags=("window", "range-frame", "curation"),
)
def user_trailing_7d_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_r7_events")
    return spark.sql("""
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS d,
                   round(sum(coalesce(value, 0)), 4) AS day_value
            FROM _r7_events GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(d AS STRING) AS event_date,
               round(sum(day_value) OVER (
                   PARTITION BY user_id ORDER BY d
                   RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW), 4)
                   AS trailing_7d
        FROM daily
    """)


@query(
    "user_timeseries_similarity",
    oracle="""
    WITH daily AS MATERIALIZED (
        SELECT user_id, CAST(ts AS DATE) AS d,
               round(sum(coalesce(value, 0)), 4) AS day_value
        FROM events GROUP BY 1, 2
    ),
    ufp AS MATERIALIZED (
        -- per-engine order-independent multiset fingerprint of the
        -- day series (never compared across engines — DuckDB's hash
        -- differs from Spark's xxhash64; an ORDERED string_agg is not
        -- an option: DuckDB ordered aggregates allocate sort blocks
        -- per group and 450k groups OOM'd a 20 GB limit)
        SELECT user_id,
               count(*) || '/' ||
               bit_xor(hash(d || ':' || day_value)) || '/' ||
               sum(hash(d || ':' || day_value) % 2147483647) || '/' ||
               round(sum(day_value), 4) AS fp,
               round(sum(day_value * day_value), 4) AS norm2,
               CAST(floor(round(sum(day_value), 4)
                    / (256.0 / GREATEST(1, LEAST(64,
                         (SELECT count(*) FROM events) // 250000))))
                    AS BIGINT) AS block
        FROM daily GROUP BY user_id
    ),
    grp AS MATERIALIZED (
        SELECT fp, min(norm2) AS norm2, min(block) AS block,
               count(*) AS m,
               (list_sort(list(user_id)))[1:21] AS heads,
               min(user_id) AS rep
        FROM ufp GROUP BY fp
    ),
    rep_daily AS (
        SELECT g.fp, g.block, d.d, d.day_value
        FROM grp g JOIN daily d ON d.user_id = g.rep
    ),
    dots AS (
        SELECT a.fp AS fpa, b.fp AS fpb,
               round(sum(a.day_value * b.day_value), 4) AS dot
        FROM rep_daily a JOIN rep_daily b
          ON a.d = b.d AND a.block = b.block AND a.fp < b.fp
        GROUP BY 1, 2
    ),
    hx AS MATERIALIZED (SELECT fp, unnest(heads) AS x FROM grp),
    cross_pairs AS (
        SELECT a.fp AS fpa, b.fp AS fpb,
               round(sqrt(greatest(
                   a.norm2 + b.norm2 - 2 * coalesce(t.dot, 0), 0)), 4) AS dist
        FROM grp a JOIN grp b
          ON a.block = b.block AND a.fp < b.fp
        LEFT JOIN dots t ON t.fpa = a.fp AND t.fpb = b.fp
    ),
    cross_exp AS (
        SELECT least(ha.x, hb.x) AS user_a,
               greatest(ha.x, hb.x) AS user_b, cp.dist
        FROM cross_pairs cp
        JOIN hx ha ON ha.fp = cp.fpa
        JOIN hx hb ON hb.fp = cp.fpb
    ),
    self_exp AS (
        -- identical series: distance 0 by definition
        SELECT a.x AS user_a, b.x AS user_b, CAST(0.0 AS DOUBLE) AS dist
        FROM hx a JOIN hx b ON a.fp = b.fp AND a.x < b.x
    )
    SELECT user_a, user_b, dist
    FROM (SELECT * FROM cross_exp UNION ALL SELECT * FROM self_exp)
    ORDER BY dist, user_a, user_b
    LIMIT 20
    """,
    doc="Distributed time-series similarity search (EDBT'19/REPOSE "
    "family), per-block exact: users are blocked into deterministic "
    "bands of total activity whose width scale-adapts from the event "
    "count (identical IEEE arithmetic on both engines, so banding "
    "agrees exactly; occupancy stays ~constant so pair work stays "
    "linear in the corpus), and Euclidean distance over the zero-"
    "filled daily "
    "series is computed SPARSELY as sqrt(|a|^2 + |b|^2 - 2ab): "
    "per-user norms from one aggregation, cross terms from a "
    "day-keyed equi-join on active days only. No global ntile window "
    "(nothing funnels through one task), no users x days "
    "densification; total work is the sum of per-band pair counts, "
    "controlled by the band width. Since r13 all pair math runs "
    "between DISTINCT series (order-independent multiset fingerprint "
    "dedup): a clone-heavy corpus — the ×300-uniform fixture held 300 "
    "identical users per band and the per-user pair join exhausted "
    "executor disk — collapses to one representative per series, with "
    "user pairs re-expanded from each group's k+1 smallest ids "
    "(provably contains every top-k pair; brute-force-pinned in "
    "tests/test_skew.py). Top-20 closest pairs via "
    "TakeOrderedAndProject with full tie-breaks.",
    tags=("timeseries", "similarity", "curation", "bench"),
)
def user_timeseries_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _user_timeseries_similarity(spark, sf_dir, band_width=256.0)


def _user_timeseries_similarity(
    spark: SparkSession, sf_dir: str, band_width: float = 256.0, k: int = 20,
    pair_buckets: int | None = None, dedup_series: bool | None = None,
) -> DataFrame:
    """Blocked time-series similarity.  ``band_width`` trades recall
    (pairs straddling a band boundary are never compared — the
    "per-block exact" contract) against the per-band pair budget;
    use a power-of-two width so banding arithmetic is exact FP on
    every engine.

    Within-band pair enumeration goes through a ``pair_buckets``²
    bucket GRID rather than a bare self-equi-join on the band key:
    each user gets a deterministic bucket g = xxhash64(user_id) mod B,
    side A fans out over the partner's bucket and side B over its own
    partner slot, so every unordered pair meets in exactly ONE of the
    B² (g_a, g_b) cells and the a<b filter keeps one orientation. A
    bare band-key join puts a whole band's pair work on ONE shuffle
    key — at ×30 the fixture concentrates 8.5k users (36M pairs, ~1B
    day-dot terms) in a single band, and the stage runs 1 task for 10+
    minutes while 31 cores idle; a same-key self-join is the one skew
    shape AQE cannot split. The grid multiplies shuffle rows by B but
    divides the largest cell by B² — the triangles wedge-join
    discipline applied to pair similarity. Results are identical (the
    grid only re-keys the same pairs). The fanout is an
    ``explode(sequence(0, B-1))`` — a generator inside codegen, not a
    join — so the plan has no nested-loop node at all
    (``tests/test_plans.py::test_timeseries_similarity_no_global_window``
    keeps the no-cartesian gate strict).

    Both the band width and B scale-adapt from one event-table row
    count read from committed parquet footer stats (no Spark job —
    ``tables.table_row_count``), deterministically reproducible in the
    SQL oracle
    (``scale = clamp(n_events // 250k, 1, 64)``): fixed-width value
    bands collapse at scale — band occupancy grows linearly with the
    data, so within-band pair work grows QUADRATICALLY (at ×30 the
    256-wide bands held 129M pairs / 3.07B day-dot terms; width/12
    holds 11.6M / ~0.3B). Dividing the width by ``scale`` keeps expected
    band occupancy roughly constant, which keeps total pair work linear
    in the corpus — the same discipline as derive_n_cells for semantic
    dedup. The divided width is no longer a power of two, but both
    engines compute ``floor(round(s,4) / (256.0/scale))`` over identical
    doubles with identical IEEE ops, so banding still agrees exactly.
    The grid's B× shuffle fanout only pays once a band can stall a task,
    so small fixtures get scale=1 — width 256, B=1, the bare band join —
    and stress shapes get the full split (measured: B=32 at sf0.1 costs
    2.2× for nothing; B=1 at ×30 stalls one task for 10+ minutes)."""
    ev = load_table(spark, sf_dir, "events")
    # committed-stats derivation, not a per-execution count() job: the
    # parquet footers record exact row counts at write time, so the
    # scale parameter costs O(files) driver-side metadata reads — no
    # Spark job, nothing scheduled on the cluster, and plan-only
    # builds (tests, EXPLAIN) stay scan-free (VERDICT r10 #2 /
    # ADVICE r10). The oracle's count(*) sees the identical n.
    scale = max(1, min(64, table_row_count(spark, sf_dir, "events") // 250_000))
    B = scale if pair_buckets is None else int(pair_buckets)
    width = float(band_width) / scale
    fan = F.explode(F.sequence(F.lit(0), F.lit(B - 1)))
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(F.round(F.sum(F.coalesce(F.col("value"), F.lit(0))), 4).alias("day_value"))
    # Series-fingerprint dedup (r13, ×300-uniform sweep): users with
    # IDENTICAL day series are pairwise distance-0 clones, and a
    # replicated/bot-heavy corpus can hold hundreds per band — the
    # within-band pair join then grows quadratically in the clone
    # multiplicity (the ×300 fixture put 300 clones of every base user
    # in one band: 271M user pairs → 8.1B day-dot rows → executor disk
    # exhaustion). All pair MATH therefore runs between DISTINCT
    # series (one representative per fingerprint); user-level pairs
    # are re-expanded only from each group's k+1 smallest member ids,
    # which provably contain every top-k pair: a pair using a group's
    # 22nd-smallest member is beaten by ≥ k+1 same-distance pairs
    # using smaller ids (pinned in tests/test_skew.py). The
    # fingerprint is a per-engine ORDER-INDEPENDENT multiset hash of
    # the (day, value) series — xor and wrap-sum of per-day hashes
    # plus cardinality and the exact grid sums (collision odds
    # ~2^-128; a per-group ORDERED serialization is not an option at
    # scale: DuckDB's ordered aggregates allocate fixed-size sort
    # blocks per group, and 450k groups OOM'd a 20 GB limit). The fp
    # never crosses engines, so Spark and DuckDB hash differently.
    day_h = F.xxhash64(
        F.concat_ws(":", F.col("d").cast("string"), F.col("day_value").cast("string"))
    )
    if dedup_series is None:
        dedup_series = scale > 1
    # Explicit full-width repartition before both pair joins: their
    # cost is CPU-dense pair expansion on narrow shuffle bytes, so
    # AQE's byte-based coalescing collapses them to one task (measured
    # at ×30: a single task ground for 18+ minutes on ~1B day-dot
    # terms while 31 cores idled). A user-specified partition count is
    # exempt from coalescing and the joins reuse the exchange — the
    # cosine_near_dup_pairs discipline (operators/similarity.py).
    # Gated on scale > 1 exactly like B: at scale 1 a band holds too
    # few pairs to stall a task, and the forced exchange only DEFEATS
    # AQE coalescing where it's the right call — measured 1.4–1.8× on
    # the sf0.1 bench for nothing (the r10 regression flag).
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _spread(df: DataFrame, keys: list[str]) -> DataFrame:
        return df.repartition(n_part, *keys) if scale > 1 else df

    if not dedup_series:
        # Plain per-user pair form — the pre-r13 plan restored verbatim
        # as the small-scale branch (VERDICT r13 #1). With no series
        # dedup every fingerprint group is a singleton, so the
        # fingerprint aggregation, group persist, representative
        # re-join, heads explosion, and self-pair union are five
        # stages of pure overhead: the r13 `fp := user_id` routing
        # still compiled them and cost +1.5 s at sf0.1 (the red driver
        # bench artifact). Output is identical either way —
        # brute-force- and cross-form-pinned in tests/test_skew.py.
        users = (
            daily.groupBy("user_id")
            .agg(
                F.round(F.sum(F.col("day_value") * F.col("day_value")), 4).alias(
                    "norm2"
                ),
                F.floor(F.round(F.sum("day_value"), 4) / F.lit(width))
                .cast("bigint")
                .alias("block"),
            )
            .withColumn(
                "g", F.pmod(F.xxhash64(F.col("user_id")), F.lit(B)).cast("int")
            )
        )
        dd = daily.join(users.select("user_id", "block", "g"), on="user_id")
        a = dd.select(
            F.col("user_id").alias("user_a"),
            "block",
            "d",
            F.col("day_value").alias("va"),
            F.col("g").alias("ga"),
        ).withColumn("gb", fan)
        b = dd.select(
            F.col("user_id").alias("user_b"),
            "block",
            "d",
            F.col("day_value").alias("vb"),
            F.col("g").alias("gb"),
        ).withColumn("ga", fan)
        jk = ["d", "block", "ga", "gb"]
        dots = (
            _spread(a, jk)
            .join(_spread(b, jk), on=jk)
            .where(F.col("user_a") < F.col("user_b"))
            .groupBy("user_a", "user_b")
            .agg(F.round(F.sum(F.col("va") * F.col("vb")), 4).alias("dot"))
        )
        ua = users.select(
            F.col("user_id").alias("user_a"),
            "block",
            F.col("norm2").alias("na2"),
            F.col("g").alias("ga"),
        ).withColumn("gb", fan)
        ub = users.select(
            F.col("user_id").alias("user_b"),
            "block",
            F.col("norm2").alias("nb2"),
            F.col("g").alias("gb"),
        ).withColumn("ga", fan)
        pk = ["block", "ga", "gb"]
        pairs = (
            _spread(ua, pk)
            .join(_spread(ub, pk), on=pk)
            .where(F.col("user_a") < F.col("user_b"))
            .select("user_a", "user_b", "na2", "nb2")
        )
        dists = pairs.join(dots, on=["user_a", "user_b"], how="left").select(
            "user_a",
            "user_b",
            F.round(
                F.sqrt(
                    F.greatest(
                        F.col("na2")
                        + F.col("nb2")
                        - 2 * F.coalesce(F.col("dot"), F.lit(0.0)),
                        F.lit(0.0),
                    )
                ),
                4,
            ).alias("dist"),
        )
        return dists.orderBy("dist", "user_a", "user_b").limit(k)

    fp_agg = F.concat_ws(
        "/",
        F.count("*"),
        F.expr(
            "bit_xor(xxhash64(concat(cast(d as string), ':',"
            " cast(day_value as string))))"
        ),
        # sum of 31-bit-masked hashes: exact in a long at any
        # realistic per-user day count (ANSI sum must not overflow)
        F.sum(F.pmod(day_h, F.lit(2147483647))),
        F.round(F.sum("day_value"), 4).cast("string"),
    )
    ufp = daily.groupBy("user_id").agg(
        fp_agg.alias("fp"),
        F.round(F.sum(F.col("day_value") * F.col("day_value")), 4).alias("norm2"),
        F.floor(F.round(F.sum("day_value"), 4) / F.lit(width))
        .cast("bigint")
        .alias("block"),
    )
    groups = ufp.groupBy("fp").agg(
        F.min("norm2").alias("norm2"),
        F.min("block").alias("block"),
        F.count("*").alias("m"),
        F.slice(F.array_sort(F.collect_list("user_id")), 1, k + 1).alias("heads"),
        F.min("user_id").alias("rep"),
    )
    # four consumers (rep_daily, both pair sides, self_exp) and Spark
    # has no common-subexpression reuse — persist the O(distinct
    # series) frame once (the persist-shared-candidates discipline
    # from doc_fuzzy_dedup_e2e; identical plans dedup to one cache
    # entry across driver re-runs)
    groups = groups.persist()
    rep_daily = daily.join(
        groups.select(F.col("rep").alias("user_id"), "fp", "block"), on="user_id"
    )
    bucket = F.pmod(F.xxhash64(F.col("fp")), F.lit(B)).cast("int")
    a = rep_daily.select(
        F.col("fp").alias("fpa"), F.col("block"),
        F.col("d"), F.col("day_value").alias("va"),
        bucket.alias("ga"),
    ).withColumn("gb", fan)
    b = rep_daily.select(
        F.col("fp").alias("fpb"), F.col("block"),
        F.col("d"), F.col("day_value").alias("vb"),
        bucket.alias("gb"),
    ).withColumn("ga", fan)
    jk = ["d", "block", "ga", "gb"]
    dots = (
        _spread(a, jk).join(_spread(b, jk), on=jk)
        .where(F.col("fpa") < F.col("fpb"))
        .groupBy("fpa", "fpb")
        .agg(F.round(F.sum(F.col("va") * F.col("vb")), 4).alias("dot"))
    )
    ga_ = groups.select(
        F.col("fp").alias("fpa"), F.col("block"),
        F.col("norm2").alias("na2"), F.col("heads").alias("heads_a"),
        F.pmod(F.xxhash64(F.col("fp")), F.lit(B)).cast("int").alias("ga"),
    ).withColumn("gb", fan)
    gb_ = groups.select(
        F.col("fp").alias("fpb"), F.col("block"),
        F.col("norm2").alias("nb2"), F.col("heads").alias("heads_b"),
        F.pmod(F.xxhash64(F.col("fp")), F.lit(B)).cast("int").alias("gb"),
    ).withColumn("ga", fan)
    pk = ["block", "ga", "gb"]
    cross = (
        _spread(ga_, pk).join(_spread(gb_, pk), on=pk)
        .where(F.col("fpa") < F.col("fpb"))
        .join(dots, on=["fpa", "fpb"], how="left")
        .select(
            "heads_a",
            "heads_b",
            F.round(
                F.sqrt(
                    F.greatest(
                        F.col("na2")
                        + F.col("nb2")
                        - 2 * F.coalesce(F.col("dot"), F.lit(0.0)),
                        F.lit(0.0),
                    )
                ),
                4,
            ).alias("dist"),
        )
    )
    # expansion is bounded: |heads| = min(m, k+1), and singleton groups
    # (the common case on real data) expand 1×1 — the plan degrades to
    # exactly the old per-user pair join when no series repeats.
    cross_exp = (
        cross.select("dist", F.explode("heads_a").alias("x"), "heads_b")
        .select("dist", "x", F.explode("heads_b").alias("y"))
        .select(
            F.least("x", "y").alias("user_a"),
            F.greatest("x", "y").alias("user_b"),
            "dist",
        )
    )
    # identical series are distance 0 by definition — exact, not the
    # float path (sqrt of an ulp-sized residual could round to 1e-4)
    self_exp = (
        groups.where(F.col("m") >= 2)
        .select(F.explode("heads").alias("x"), "heads")
        .select("x", F.explode("heads").alias("y"))
        .where(F.col("x") < F.col("y"))
        .select(
            F.col("x").alias("user_a"),
            F.col("y").alias("user_b"),
            F.lit(0.0).alias("dist"),
        )
    )
    return cross_exp.unionAll(self_exp).orderBy("dist", "user_a", "user_b").limit(k)


@query(
    "behavior_path_bigrams",
    oracle="""
    WITH seqs AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               list(event_type ORDER BY ts, event_id) AS path
        FROM events GROUP BY 1, 2
    ),
    grams AS (
        SELECT unnest(list_transform(
            generate_series(1, len(path) - 1),
            i -> path[i] || ' -> ' || path[i + 1])) AS transition
        FROM seqs WHERE len(path) >= 2
    )
    SELECT transition, count(*) AS n
    FROM grams GROUP BY transition
    ORDER BY n DESC, transition
    LIMIT 50
    """,
    doc="Behavioral path analysis: the top-50 event-to-event "
    "transitions across per-user-day ordered journeys — the "
    "product-analytics path/funnel-discovery primitive. The sequence "
    "is assembled per (user, day) with an order-pinned array_sort "
    "(deterministic on any partitioning), transitions explode via "
    "index arithmetic, and the count rolls up with map-side combine + "
    "TakeOrderedAndProject.",
    tags=("clickstream", "path", "curation"),
)
def behavior_path_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("d"),
            F.struct("ts", "event_id", "event_type").alias("entry"),
        )
        .groupBy("user_id", "d")
        .agg(
            F.transform(F.array_sort(F.collect_list("entry")), lambda s: s["event_type"]).alias(
                "path"
            )
        )
        .where(F.size("path") >= 2)
    )
    n = F.size(F.col("path"))
    grams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(
            " -> ", F.element_at(F.col("path"), i), F.element_at(F.col("path"), i + 1)
        ),
    )
    return (
        seqs.select(F.explode(grams).alias("transition"))
        .groupBy("transition")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "transition")
        .limit(50)
    )


@query(
    "cohort_retention_matrix",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(min(CAST(ts AS DATE)) AS DATE) AS first_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT CAST(date_trunc('week', f.first_day) AS STRING) AS cohort_week,
           CAST((date_trunc('week', a.d) - date_trunc('week', f.first_day)) / 7 AS BIGINT)
               AS week_offset,
           count(DISTINCT a.user_id) AS active_users
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: users grouped by first-seen week, "
    "distinct actives counted per week offset — the standard "
    "retention triangle. The first-seen aggregate is a broadcast "
    "(O(users) rows); the matrix itself is one distinct-count keyed "
    "(cohort, offset) with partial aggregation.",
    tags=("clickstream", "retention", "curation"),
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    activity = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    joined = activity.join(F.broadcast(firsts), on="user_id")
    cohort = F.date_trunc("week", F.col("first_day")).cast("date")
    week = F.date_trunc("week", F.col("d")).cast("date")
    return joined.groupBy(
        cohort.cast("string").alias("cohort_week"),
        (F.datediff(week, cohort) / 7).cast("bigint").alias("week_offset"),
    ).agg(F.count_distinct("user_id").alias("active_users"))


@query(
    "strict_funnel_per_user_day",
    oracle="""
    WITH steps AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY 1, 2
    )
    SELECT
        count(*) AS user_days,
        CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
        CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      THEN 1 ELSE 0 END) AS BIGINT) AS step_click_after_view,
        CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
                      THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase_after_click
    FROM steps
    """,
    doc="Strictly-ordered funnel: a user-day converts a step only if "
    "its first occurrence happens AFTER the previous step's first "
    "occurrence (view < click < purchase in time) — the ordering "
    "semantics that unordered existence funnels overcount. One "
    "conditional-min aggregation per user-day, then one scalar "
    "rollup; no joins, no windows.",
    tags=("clickstream", "funnel", "curation"),
)
def strict_funnel_per_user_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    steps = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    after = lambda a, b: a.isNotNull() & (b > a)  # noqa: E731
    return steps.agg(
        F.count("*").alias("user_days"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("step_view"),
        F.sum(F.when(after(F.col("t_view"), F.col("t_click")), 1).otherwise(0)).alias(
            "step_click_after_view"
        ),
        F.sum(
            F.when(
                after(F.col("t_view"), F.col("t_click"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            ).otherwise(0)
        ).alias("step_purchase_after_click"),
    )


@query(
    "event_volume_anomaly_days",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, quantile_cont(n, 0.5) AS med_n
        FROM daily GROUP BY event_type
    ),
    mad AS (
        SELECT d.event_type, m.med_n,
               quantile_cont(abs(d.n - m.med_n), 0.5) AS mad_n
        FROM daily d JOIN med m USING (event_type)
        GROUP BY d.event_type, m.med_n
    )
    SELECT d.event_type,
           CAST(d.d AS STRING) AS event_date,
           d.n,
           round(m.med_n, 4) AS med_n,
           round(abs(d.n - m.med_n) / nullif(m.mad_n, 0), 4) AS robust_z
    FROM daily d JOIN mad m USING (event_type)
    WHERE abs(d.n - m.med_n) > 3 * m.mad_n AND m.mad_n > 0
    """,
    doc="Robust volume-anomaly detection: days whose per-type event "
    "count deviates more than 3 MADs from the per-type median "
    "(median absolute deviation — outlier-immune, unlike mean/stddev "
    "z-scores which the anomaly itself inflates). Exact interpolated "
    "medians on the pre-aggregated O(types x days) frame, broadcast "
    "back — the ops/monitoring primitive for ingest-volume regressions.",
    tags=("quality", "anomaly", "curation"),
)
def event_volume_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(F.count("*").alias("n"))
    med = daily.groupBy("event_type").agg(F.expr("percentile(n, 0.5)").alias("med_n"))
    with_med = daily.join(F.broadcast(med), on="event_type")
    mad = with_med.groupBy("event_type", "med_n").agg(
        F.expr("percentile(abs(n - med_n), 0.5)").alias("mad_n")
    )
    return (
        daily.join(F.broadcast(mad), on="event_type")
        .where((F.abs(F.col("n") - F.col("med_n")) > 3 * F.col("mad_n")) & (F.col("mad_n") > 0))
        .select(
            "event_type",
            F.col("d").cast("string").alias("event_date"),
            "n",
            F.round("med_n", 4).alias("med_n"),
            F.round(
                F.abs(F.col("n") - F.col("med_n")) / F.nullif(F.col("mad_n"), F.lit(0.0)), 4
            ).alias("robust_z"),
        )
    )


@query(
    "source_vocab_drift",
    oracle="""
    WITH toks AS (
        SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
        FROM documents
    ),
    clean AS (SELECT source, token FROM toks WHERE token <> ''),
    global_top AS (
        SELECT token FROM (
            SELECT token, count(*) AS n FROM clean GROUP BY token
            ORDER BY n DESC, token LIMIT 50
        )
    ),
    source_top AS (
        SELECT source, token FROM (
            SELECT source, token, count(*) AS n,
                   row_number() OVER (PARTITION BY source
                       ORDER BY count(*) DESC, token) AS r
            FROM clean GROUP BY source, token
        ) WHERE r <= 50
    )
    SELECT s.source,
           CAST(sum(CASE WHEN g.token IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS overlap_50,
           round(sum(CASE WHEN g.token IS NOT NULL THEN 1 ELSE 0 END) / 50.0, 4)
               AS overlap_frac
    FROM source_top s LEFT JOIN global_top g USING (token)
    GROUP BY s.source
    """,
    doc="Source vocabulary drift: for each source, how much of its "
    "top-50 token list overlaps the corpus-global top-50 (deterministic "
    "count-desc/token tie-break) — a set-overlap drift signal with no "
    "floating-point divergence hazards. Token counts shuffle once per "
    "keying; the two top-50 lists are O(sources x 50) rows, broadcast "
    "for the overlap join.",
    tags=("text", "drift", "curation"),
)
def source_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.trim(F.col("text")))
    clean = docs.select("source", F.explode(toks).alias("token")).where(F.col("token") != "")
    global_top = (
        clean.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(50)
        .select("token")
    )
    per_source = clean.groupBy("source", "token").agg(F.count("*").alias("n"))
    source_top = (
        per_source.withColumn(
            "r", F.row_number().over(W.partitionBy("source").orderBy(F.desc("n"), "token"))
        )
        .where(F.col("r") <= 50)
        .select("source", "token")
    )
    return (
        source_top.join(
            F.broadcast(global_top.withColumn("g", F.lit(1))), on="token", how="left"
        )
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("g").isNotNull(), 1).otherwise(0)).alias("overlap_50"),
            F.round(
                F.sum(F.when(F.col("g").isNotNull(), 1).otherwise(0)) / F.lit(50.0), 4
            ).alias("overlap_frac"),
        )
    )
