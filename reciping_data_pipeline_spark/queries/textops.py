"""Text-analysis + dedup catalog queries on the ``documents`` table.

The SQL-expressible operators carry a DuckDB oracle that mirrors the
Spark column expressions formula-for-formula (same tokenizer regex,
same stopword lists, same logistic score). The sketch-based operators
(MinHash-LSH, SimHash) are not reasonably SQL-expressible — they get
rows-only driver checks plus planted-duplicate unit tests in
``tests/test_dedup.py``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from reciping_data_pipeline_spark.functions import text as T
from reciping_data_pipeline_spark.operators import dedup
from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table

# DuckDB fragment equal to T.normalized_text
_NORM_SQL = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
_TOKENS_SQL = "regexp_split_to_array(text, '\\s+')"
_EN_STOP = "('the','a','and','of','to','in','is','that','it','for')"


@query(
    "doc_stats_by_lang",
    oracle=f"""
    SELECT lang, source,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(len({_TOKENS_SQL})), 4) AS avg_tokens
    FROM documents
    GROUP BY lang, source
    """,
    doc="Corpus profile: token counting via whitespace split (SURVEY §7.2-8 text analysis).",
    tags=("text", "agg"),
)
def doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(T.token_count(F.col("text"))), 4).alias("avg_tokens"),
    )


@query(
    "doc_exact_dedup",
    oracle=f"""
    SELECT min(doc_id) AS doc_id
    FROM documents
    GROUP BY md5({_NORM_SQL})
    """,
    doc="Exact dedup on normalized-content fingerprint; keeps lowest doc_id "
    "per group (one hash shuffle — the 100 TB-safe exact dedup).",
    tags=("text", "dedup", "bench"),
)
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "doc_id", "text").select("doc_id")


@query(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id, md5({_NORM_SQL}) AS fingerprint
    FROM documents
    """,
    doc="Content fingerprinting: md5 over case/whitespace/punct-normalized text.",
    tags=("text",),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint"))


@query(
    "doc_quality",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id,
               CAST(len({_TOKENS_SQL}) AS DOUBLE) AS n_tok,
               CAST(len(list_filter({_TOKENS_SQL}, x -> x IN {_EN_STOP})) AS DOUBLE) AS n_stop,
               CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                   / nullif(length(text), 0) AS p_ratio
        FROM documents
    )
    SELECT doc_id,
           CAST(n_tok AS INT) AS n_tokens,
           round(n_stop / nullif(n_tok, 0), 4) AS stopword_ratio,
           round(1.0 / (1.0 + exp(-(0.01 * n_tok + 2.0 * (n_stop / nullif(n_tok, 0))
                                    - 5.0 * p_ratio - 1.0))), 4) AS quality
    FROM feat
    """,
    doc="Quality scoring: logistic over length/stopword/punctuation features "
    "(Gopher/C4-style heuristics, simplified; SURVEY §7.2-8).",
    tags=("text",),
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    txt = F.col("text")
    n_tok = T.token_count(txt).cast("double")
    sw_ratio = T.stopword_count(txt, "en").cast("double") / F.nullif(n_tok, F.lit(0.0))
    return docs.select(
        "doc_id",
        n_tok.cast("int").alias("n_tokens"),
        F.round(sw_ratio, 4).alias("stopword_ratio"),
        F.round(T.quality_score(txt), 4).alias("quality"),
    )


@query(
    "doc_langid",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, lang,
               CAST(len({_TOKENS_SQL}) AS DOUBLE) AS n_tok,
               CAST(len(list_filter({_TOKENS_SQL}, x -> x IN {_EN_STOP})) AS DOUBLE) AS h_en,
               CAST(len(list_filter({_TOKENS_SQL}, x -> x IN ('el','la','de','que','y','en','un','por','con','los'))) AS DOUBLE) AS h_es,
               CAST(len(list_filter({_TOKENS_SQL}, x -> x IN ('le','la','et','les','des','en','un','du','que','pour'))) AS DOUBLE) AS h_fr,
               CAST(len(list_filter({_TOKENS_SQL}, x -> x IN ('der','die','und','das','den','von','zu','mit','ist','des'))) AS DOUBLE) AS h_de
        FROM documents
    ), ratios AS (
        SELECT doc_id, lang,
               h_en / nullif(n_tok, 0) AS r_en, h_es / nullif(n_tok, 0) AS r_es,
               h_fr / nullif(n_tok, 0) AS r_fr, h_de / nullif(n_tok, 0) AS r_de
        FROM feat
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN r_en > 0.02 AND r_en >= r_es AND r_en >= r_fr AND r_en >= r_de THEN 'en'
                WHEN r_es > 0.02 AND r_es >= r_fr AND r_es >= r_de THEN 'es'
                WHEN r_fr > 0.02 AND r_fr >= r_de THEN 'fr'
                WHEN r_de > 0.02 THEN 'de'
                ELSE 'und' END AS predicted_lang
    FROM ratios
    """,
    doc="Heuristic language ID: argmax of per-language stopword-hit ratios "
    "with deterministic tie-break (SURVEY §7.2-8 language-ID).",
    tags=("text",),
)
def doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.detect_lang(F.col("text")).alias("predicted_lang"),
    )


@query(
    "doc_ngram_jaccard_pairs",
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
    sizes AS (SELECT doc_id, len(sh) AS sz FROM docs),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM postings a JOIN postings b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor(c * 1.0 / (sa.sz + sb.sz - c) * 10000.0 + 0.5) / 10000.0
               AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.001
    """,
    doc="Exact 5-gram Jaccard pairs via shingle inversion — recall-1 near-dup "
    "baseline; threshold set low (0.001) so the random-text fixture yields "
    "verifiable rows (real dedup runs use >= 0.8).",
    tags=("text", "dedup"),
)
def doc_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=5, threshold=0.001)


@query(
    "doc_minhash_lsh_pairs",
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
    sizes AS (SELECT doc_id, len(sh) AS sz FROM docs),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM postings a JOIN postings b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor(c * 1.0 / (sa.sz + sb.sz - c) * 10000.0 + 0.5) / 10000.0
               AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
    """,
    doc="MinHash-LSH near-dup candidates verified to exact Jaccard >= 0.5 "
    "(64 perms, 16 bands x 4 rows; SURVEY §7.2-8 MinHash+LSH). The "
    "oracle is the full EXACT J >= 0.5 pair set (shingle inversion): "
    "hash equality asserts LSH recall = 1 on this corpus's planted "
    "duplicates (all J >= 0.8, where the 16x4 s-curve miss probability "
    "is < 1e-3 per pair and the seeded sketch is deterministic — "
    "verified stable at sf0.001/0.01/0.1) AND zero false positives "
    "(candidates are exact-verified). An upgrade from the rows-only "
    "check this sketch query carried through r01-r05. Recall contract "
    "caveat: band buckets over max_bucket (1000) are dropped before "
    "pair expansion; since r07 that drop is REPORTED, not silent — "
    "minhash_lsh_pairs(overflow_report=...) fills (bucket_count, "
    "overflow_buckets, overflow_member_mass) and warns on overflow "
    "(zero on this corpus, asserted by the planted telemetry test).",
    tags=("text", "dedup", "bench"),
)
def doc_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_k=5, num_perm=64, num_bands=16, threshold=0.5
    )


@query(
    "doc_simhash_pairs",
    oracle="""
    SELECT doc_id AS id_a,
           doc_id + (SELECT max(doc_id) + 1 FROM documents) AS id_b,
           0 AS hamming
    FROM documents
    """,
    doc="SimHash near-dup detection at Hamming distance <= 3 via "
    "pigeonhole block join (SURVEY §7.2-8 SimHash), driver-checked on "
    "a planted recall set: every document is paired with an exact copy "
    "planted at doc_id + max(doc_id) + 1 — the offset DERIVED from "
    "the corpus, not a 1e9 literal: the docszipf sweep's mult-300 ids "
    "reach 2.99e9, so a fixed offset both collided plant ids with "
    "real documents and silently filtered 2/3 of the corpus out of "
    "the check (r14; ×100's max id of 990M passed only by luck) — "
    "the full corpus ∪ plants runs through the real pipeline (tokens "
    "-> simhash64 -> 4-block pigeonhole -> bucket join -> Hamming "
    "verify), and the output is restricted to the planted pairings — "
    "which MUST all surface at Hamming 0 (identical text ⇒ identical "
    "signature; the pigeonhole guarantees a shared block). The oracle "
    "enumerates the expected pair set in pure SQL. Organic near-dup "
    "behavior stays covered by the planted-fixture recall/precision "
    "gates in tests/test_sketch_ops.py.",
    tags=("text", "dedup"),
)
def doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    off = F.broadcast(docs.agg((F.max("doc_id") + 1).alias("_off")))
    plants = docs.crossJoin(off).select(
        (F.col("doc_id") + F.col("_off")).alias("doc_id"), "text"
    )
    detected = dedup.simhash_pairs(
        docs.unionAll(plants), "doc_id", "text", max_hamming=3
    )
    return (
        detected.crossJoin(off)
        .where(
            (F.col("id_a") < F.col("_off"))
            & (F.col("id_b") == F.col("id_a") + F.col("_off"))
        )
        .select("id_a", "id_b", "hamming")
    )


_BPE_SQL = T.BPE_ISH_PATTERN.replace("'", "''")  # escape the contraction quote


@query(
    "doc_token_counts",
    oracle=f"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '{_BPE_SQL}')) AS bpe_ish_tokens
    FROM documents
    """,
    doc="Token counting two ways: whitespace split and the BPE-ish "
    "pre-tokenizer regex (LLM token budgeting) — both pure JVM regex, "
    "mirrored in RE2 for the oracle.",
    tags=("text", "tokens", "bench"),
)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.trim(F.col("text"))).alias("ws_tokens"),
        T.bpe_token_count(F.col("text")).alias("bpe_ish_tokens"),
    )


# Merge budget for the catalog query: the synthetic corpus vocabulary
# exhausts its pair supply at ~127 merges; 60 keeps a non-trivial
# subword distribution (~2.6 tokens/word) so the oracle exercises real
# merge behavior, not whole-word lookup. MUST match between the Spark
# fn and the SQL (both interpolate this constant).
_BPE_NUM_MERGES = 60

# DuckDB replay of the full BPE pipeline (train + encode), so the
# oracle is corpus-derived like every other catalog entry — no
# precomputed fixture to go stale. Words are delimiter-wrapped
# ('\x1f' || sym || '\x1f' per symbol) so a literal replace() of
# '\x1fA\x1f\x1fB\x1f' → '\x1fAB\x1f' is exactly one left-to-right
# non-overlapping merge pass over exact symbol pairs (the wrap means a
# match can never span symbol boundaries, and adjacent matches don't
# share consumed characters). The recursive CTE's working table is one
# training iteration's word states; the aggregate subquery picks the
# next merge with the same (count DESC, a, b) tie-break as
# functions/bpe.train_bpe. Encoding needs no second phase: training
# runs over EVERY distinct corpus word, so the final iteration's symbol
# count per word IS its encoded length.
_BPE_ORACLE = f"""
    WITH RECURSIVE
    train AS (
        SELECT 0 AS iter, word, cnt,
               chr(31) || array_to_string(string_split(word, ''), chr(31) || chr(31)) || chr(31) AS repr
        FROM (
            SELECT word, count(*) AS cnt FROM (
                SELECT replace(unnest(regexp_extract_all(text, '{_BPE_SQL}')), chr(31), '') AS word
                FROM documents
            ) WHERE word <> '' GROUP BY word
        )
        UNION ALL
        SELECT iter + 1, word, cnt,
               replace(repr, chr(31) || best.a || chr(31) || chr(31) || best.b || chr(31),
                              chr(31) || best.a || best.b || chr(31))
        FROM train CROSS JOIN (
            SELECT p.a AS a, p.b AS b FROM (
                SELECT unnest(list_transform(
                           generate_series(1, len(syms) - 1),
                           i -> struct_pack(a := syms[i], b := syms[i + 1]))) AS p,
                       cnt
                FROM (SELECT cnt, string_split(trim(repr, chr(31)), chr(31) || chr(31)) AS syms
                      FROM train)
            )
            GROUP BY p.a, p.b
            ORDER BY sum(cnt) DESC, p.a, p.b
            LIMIT 1
        ) best
        WHERE iter < {_BPE_NUM_MERGES}
    ),
    final AS (
        SELECT word, len(string_split(trim(repr, chr(31)), chr(31) || chr(31))) AS ntok
        FROM train WHERE iter = (SELECT max(iter) FROM train)
    ),
    doc_words AS (
        SELECT doc_id, replace(unnest(regexp_extract_all(text, '{_BPE_SQL}')), chr(31), '') AS word
        FROM documents
    )
    SELECT d.doc_id,
           CAST(coalesce(sum(f.ntok), 0) AS BIGINT) AS bpe_tokens
    FROM documents d
    LEFT JOIN (SELECT dw.doc_id, f.ntok FROM doc_words dw JOIN final f USING (word)
               WHERE dw.word <> '') f USING (doc_id)
    GROUP BY d.doc_id
"""


@query(
    "doc_token_counts_bpe",
    oracle=_BPE_ORACLE,
    doc="REAL learned BPE token budgeting: merge table fit on the "
    "corpus's pre-token word counts (distributed count, O(vocab) "
    "driver fit — the codebook pattern), encoding in a memoized Arrow "
    "kernel. The oracle replays training AND encoding in one DuckDB "
    "recursive CTE over the same corpus.",
    tags=("text", "tokens", "bpe", "bench"),
)
def doc_token_counts_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reciping_data_pipeline_spark.functions import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.fit_bpe_merges(docs, "text", num_merges=_BPE_NUM_MERGES)
    return docs.select(
        "doc_id", bpe.bpe_token_count_udf(merges)(F.col("text")).alias("bpe_tokens")
    )


@query(
    "doc_dedup_groups",
    oracle=f"""
    WITH RECURSIVE docs AS (
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
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.001
    ),
    -- MATERIALIZED: the recursive term below references edges every
    -- round, and DuckDB inlines plain CTEs — re-running the shingle
    -- self-join 24 times (measured ~67 s/round at x30). Materializing
    -- pins the pair computation to once.
    edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    -- Round-indexed neighbor-min label propagation, O(V) rows per
    -- round, NOT the full transitive closure: at this query's loose
    -- 0.001 threshold components are huge and closure state is
    -- sum(|component|^2) — the x30 sweep ground for 25+ minutes on
    -- billions of (v, reachable) rows. l_i(v) = min vertex within i+1
    -- hops; 24 rounds cover eccentricity <= 25 (measured fixpoint at
    -- x30: 7 rounds), and the final min over rounds is the component
    -- min by monotonicity. Round 25 exists ONLY as a convergence
    -- sentinel (ADVICE r10): l_i is pointwise nonincreasing in i, so
    -- per-vertex min(l | i<=24) = l_24 and min(l) = l_25; if they
    -- differ anywhere the bound was too small for this data and the
    -- oracle FAILS LOUD via error() instead of silently emitting a
    -- non-converged component id (l_25 = l_24 everywhere implies
    -- l_26 = f(l_25) = f(l_24) = l_25 — a true fixpoint).
    lab(i, v, l) AS (
        SELECT 0, src, least(src, min(dst)) FROM edges GROUP BY src
        UNION ALL
        SELECT i + 1, v, l FROM (
            SELECT lab.i AS i, e.dst AS v, min(least(lab.l, e.dst)) AS l
            FROM lab JOIN edges e ON lab.v = e.src
            GROUP BY lab.i, e.dst
        ) WHERE i < 25
    ),
    comp AS (
        SELECT v AS id,
               CASE WHEN min(l) FILTER (WHERE i <= 24) = min(l) THEN min(l)
                    ELSE error('doc_dedup_groups oracle: min-label propagation not converged within 25 rounds — raise the round cap')
               END AS component
        FROM lab GROUP BY v
    )
    SELECT d.doc_id AS id,
           coalesce(c.component, d.doc_id) AS component,
           (coalesce(c.component, d.doc_id) = d.doc_id) AS is_canonical
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """,
    doc="Pairs -> transitive closure -> dedup groups: every document "
    "assigned a canonical component id (min member), singletons kept. "
    "Spark side is iterative hash-min label propagation "
    "(operators/dedup.py connected_components); DuckDB oracle is a "
    "recursive-CTE transitive closure over the same exact-Jaccard "
    "pair set — an end-to-end oracle for an iterative algorithm.",
    tags=("text", "dedup", "components"),
)
def doc_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=5, threshold=0.001)
    return dedup.dedup_groups(docs, "doc_id", pairs)


# Engine-portable deterministic hash (Knuth multiplicative on the id):
# identical integer arithmetic in Spark and DuckDB, so split
# assignment is reproducible across engines and cluster sizes — the
# property a training pipeline needs from a split (no RNG state, no
# partition-order dependence). 2654435761 = floor(2^32/phi).
_SPLIT_HASH_SQL = "((doc_id * 2654435761) % 4294967296)"


@query(
    "doc_train_val_split",
    oracle=f"""
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT lang, n_chars,
               CASE WHEN {_SPLIT_HASH_SQL} < 0.9 * 4294967296 THEN 'train'
                    WHEN {_SPLIT_HASH_SQL} < 0.95 * 4294967296 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY split, lang
    """,
    doc="Deterministic 90/5/5 train/val/test assignment by multiplicative "
    "hash of doc_id — reproducible across engines/runs/cluster sizes "
    "(no RNG, no partition-order dependence), summarized per split+lang.",
    tags=("text", "sampling"),
)
def doc_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    split = (
        F.when(h < 0.9 * 4294967296, "train")
        .when(h < 0.95 * 4294967296, "val")
        .otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "doc_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {_SPLIT_HASH_SQL}, doc_id) AS rn
        FROM documents
    )
    WHERE rn <= 10
    """,
    doc="Deterministic stratified sample: 10 docs per language, chosen "
    "by smallest multiplicative hash (uniform-without-replacement with "
    "zero RNG state; rank window per stratum, ties broken by id).",
    tags=("text", "sampling", "window"),
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    w = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("doc_id", "lang")
    )


@query(
    "doc_pretrain_filter_funnel",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, source, lang, text,
               CAST(len({_TOKENS_SQL}) AS DOUBLE) AS n_tok,
               CAST(len(list_filter({_TOKENS_SQL}, x -> x IN {_EN_STOP})) AS DOUBLE) AS n_stop,
               CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                   / nullif(length(text), 0) AS p_ratio,
               md5(text) AS fp
        FROM documents
    ),
    scored AS (
        SELECT doc_id, source, lang, n_tok, fp,
               round(1.0 / (1.0 + exp(-(0.01 * n_tok + 2.0 * (n_stop / nullif(n_tok, 0))
                                        - 5.0 * p_ratio - 1.0))), 4) AS quality,
               (doc_id = min(doc_id) OVER (PARTITION BY fp)) AS keep_first
        FROM feat
    ),
    gated AS (
        SELECT source,
               (lang IN ('en', 'es')) AS c_lang,
               (lang IN ('en', 'es') AND n_tok BETWEEN 20 AND 5000) AS c_len,
               (lang IN ('en', 'es') AND n_tok BETWEEN 20 AND 5000
                AND quality >= 0.5) AS c_quality,
               (lang IN ('en', 'es') AND n_tok BETWEEN 20 AND 5000
                AND quality >= 0.5 AND keep_first) AS c_unique
        FROM scored
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN c_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
           CAST(sum(CASE WHEN c_len THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
           CAST(sum(CASE WHEN c_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN c_unique THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
    FROM gated
    GROUP BY source
    """,
    doc="Pretraining data filter funnel: per-source survivor counts "
    "through cumulative language / length / quality / exact-dup gates "
    "— the composite every corpus-curation pipeline reports. One scan, "
    "conditional aggregation (SURVEY §2.4 A4 at corpus scale); the "
    "exact-dup gate is a window-min over md5(text) (same function both "
    "engines), no join.",
    tags=("text", "quality", "dedup", "bench"),
)
def doc_pretrain_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    txt = F.col("text")
    n_tok = T.token_count(txt).cast("double")
    quality = F.round(T.quality_score(txt), 4)
    keep_first = F.col("doc_id") == F.min("doc_id").over(
        Window.partitionBy(F.md5(txt))
    )
    c_lang = F.col("lang").isin("en", "es")
    c_len = c_lang & n_tok.between(20, 5000)
    c_quality = c_len & (quality >= 0.5)
    c_unique = c_quality & keep_first
    as_int = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return (
        docs.select("source", c_lang.alias("c_lang"), c_len.alias("c_len"),
                    c_quality.alias("c_quality"), c_unique.alias("c_unique"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            as_int(F.col("c_lang")).alias("n_lang"),
            as_int(F.col("c_len")).alias("n_len"),
            as_int(F.col("c_quality")).alias("n_quality"),
            as_int(F.col("c_unique")).alias("n_unique"),
        )
    )


@query(
    "doc_source_mixture",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN {_SPLIT_HASH_SQL} <
               CASE source
                   WHEN 'src0' THEN 1.00 * 4294967296
                   WHEN 'src1' THEN 0.80 * 4294967296
                   WHEN 'src2' THEN 0.50 * 4294967296
                   ELSE 0.25 * 4294967296 END
               THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents
    GROUP BY source
    """,
    doc="Deterministic pretraining source mixing: per-source keep rates "
    "(src0 100%, src1 80%, src2 50%, tail 25%) applied by hash "
    "threshold — the reweighting step of corpus curation, reproducible "
    "across engines/runs, one scan, no RNG state (vs sampleBy, whose "
    "Bernoulli draws differ per partitioning).",
    tags=("text", "sampling"),
)
def doc_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    rate = (
        F.when(F.col("source") == "src0", 1.00)
        .when(F.col("source") == "src1", 0.80)
        .when(F.col("source") == "src2", 0.50)
        .otherwise(0.25)
    )
    keep = h < rate * F.lit(4294967296)
    return docs.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_sampled"),
    )


@query(
    "doc_cc_chain_stress",
    oracle="""
    SELECT doc_id AS id,
           (SELECT MIN(doc_id) FROM documents) AS component
    FROM documents
    """,
    doc="Adversarial connected-components stress: every document is "
    "chained to the next doc_id, producing ONE component whose "
    "diameter equals the corpus size — the worst case for label "
    "propagation. Pointer doubling closes a 5000-doc chain in "
    "O(log n) (~13) rounds where plain hash-min needs 5000; the "
    "oracle (every doc labeled with the global min id) fails unless "
    "the closure actually completed.",
    tags=("dedup", "cc", "skew", "bench"),
)
def doc_cc_chain_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # Chain-edge fixture build (lead over a global window) is the test
    # harness, not the operator under stress; it is O(corpus) rows
    # through one sort, fine at fixture scale.
    nxt = F.lead("doc_id").over(Window.orderBy("doc_id"))
    edges = docs.select(F.col("doc_id").alias("id_a"), nxt.alias("id_b")).where(
        F.col("id_b").isNotNull()
    )
    return dedup.connected_components(edges, max_iter=25)


@query(
    "doc_decontaminate",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len({_TOKENS_SQL}) - 4),
                   i -> {_TOKENS_SQL}[i] || ' ' || {_TOKENS_SQL}[i+1] || ' ' || {_TOKENS_SQL}[i+2]
                        || ' ' || {_TOKENS_SQL}[i+3] || ' ' || {_TOKENS_SQL}[i+4])) AS sh
        FROM documents
    ),
    epost AS (
        SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 101 = 0
    ),
    cpost AS (
        SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 101 <> 0
    ),
    hits AS (
        SELECT c.doc_id, count(DISTINCT c.g) AS shared
        FROM cpost c JOIN epost e USING (g)
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(h.shared, 0) AS BIGINT) AS shared_ngrams,
           coalesce(h.shared, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 101 <> 0) d
    LEFT JOIN hits h USING (doc_id)
    """,
    doc="Benchmark decontamination: flag training docs sharing any "
    "distinct 5-gram with the (deterministic doc_id%101) eval subset — "
    "broadcast eval-shingle semi-count, no corpus self-join "
    "(operators/dedup.py contamination).",
    tags=("text", "dedup", "decontam"),
)
def doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.pmod(F.col("doc_id"), F.lit(101)) == 0)
    corpus = docs.where(F.pmod(F.col("doc_id"), F.lit(101)) != 0)
    return dedup.contamination(corpus, ev, "doc_id", "text", n_gram=5)


@query(
    "doc_incremental_dedup",
    oracle=f"""
    WITH delta AS (
        SELECT doc_id, md5({_NORM_SQL}) AS fingerprint
        FROM documents WHERE doc_id % 2 = 1
    ),
    existing AS (
        SELECT DISTINCT md5({_NORM_SQL}) AS fingerprint
        FROM documents WHERE doc_id % 2 = 0
    ),
    in_batch AS (
        SELECT fingerprint, min(doc_id) AS doc_id FROM delta GROUP BY fingerprint
    )
    SELECT doc_id, fingerprint
    FROM in_batch
    WHERE fingerprint NOT IN (SELECT fingerprint FROM existing)
    """,
    doc="Incremental (delta-vs-index) exact dedup: odd doc_ids arrive "
    "as the new batch, even doc_ids' fingerprints are the persisted "
    "corpus index; in-batch keep-min-id then anti-join — the corpus "
    "text is never re-read (operators/dedup.py "
    "incremental_exact_dedup).",
    tags=("text", "dedup", "incremental"),
)
def doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    new_batch = docs.where(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    existing = docs.where(F.pmod(F.col("doc_id"), F.lit(2)) == 0).select(
        T.fingerprint(F.col("text")).alias("fingerprint")
    )
    return dedup.incremental_exact_dedup(new_batch, existing, "doc_id", "text")


@query(
    "langid_confusion_matrix",
    oracle=f"""
    WITH feat AS (
        SELECT lang,
               CAST(len({_TOKENS_SQL}) AS DOUBLE) AS n_tok,
               CAST(len(list_filter({_TOKENS_SQL}, x -> x IN {_EN_STOP})) AS DOUBLE) AS h_en,
               CAST(len(list_filter({_TOKENS_SQL}, x -> x IN ('el','la','de','que','y','en','un','por','con','los'))) AS DOUBLE) AS h_es,
               CAST(len(list_filter({_TOKENS_SQL}, x -> x IN ('le','la','et','les','des','en','un','du','que','pour'))) AS DOUBLE) AS h_fr,
               CAST(len(list_filter({_TOKENS_SQL}, x -> x IN ('der','die','und','das','den','von','zu','mit','ist','des'))) AS DOUBLE) AS h_de
        FROM documents
    ), pred AS (
        SELECT lang AS labeled_lang,
               CASE WHEN h_en / nullif(n_tok, 0) > 0.02
                         AND h_en >= h_es AND h_en >= h_fr AND h_en >= h_de THEN 'en'
                    WHEN h_es / nullif(n_tok, 0) > 0.02
                         AND h_es >= h_fr AND h_es >= h_de THEN 'es'
                    WHEN h_fr / nullif(n_tok, 0) > 0.02 AND h_fr >= h_de THEN 'fr'
                    WHEN h_de / nullif(n_tok, 0) > 0.02 THEN 'de'
                    ELSE 'und' END AS predicted_lang
        FROM feat
    ), tot AS (SELECT labeled_lang, count(*) AS n_label FROM pred GROUP BY 1)
    SELECT p.labeled_lang, p.predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) * 1.0 / min(tot.n_label), 4) AS label_share
    FROM pred p JOIN tot USING (labeled_lang)
    GROUP BY 1, 2
    """,
    doc="Classifier evaluation harness: confusion matrix of the heuristic "
    "language detector against the labeled lang column, with per-label "
    "recall shares — the quality-audit loop every corpus labeling step "
    "needs. One detector pass (JVM lambda filters, no UDF), one "
    "(label, prediction) aggregation, label-marginal join over the "
    "label-bounded aggregate. NOTE: ratio comparisons reduce to hit-"
    "count comparisons within a doc (same denominator), mirrored "
    "identically in the oracle.",
    tags=("text", "eval"),
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("labeled_lang"),
        T.detect_lang(F.col("text")).alias("predicted_lang"),
    )
    tot = pred.groupBy("labeled_lang").agg(F.count("*").alias("n_label"))
    return (
        pred.groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
        .join(tot, "labeled_lang")
        .select(
            "labeled_lang",
            "predicted_lang",
            "n_docs",
            F.round(F.col("n_docs") * 1.0 / F.col("n_label"), 4).alias("label_share"),
        )
    )


@query(
    "doc_dedup_keep_best",
    oracle=f"""
    SELECT doc_id, n_dups
    FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY fp
                    ORDER BY n_chars DESC, doc_id ASC) AS rn,
               CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_dups
        FROM (SELECT doc_id, n_chars, md5({_NORM_SQL}) AS fp FROM documents)
    )
    WHERE rn = 1
    """,
    doc="Canonical-copy selection: exact dedup that keeps the BEST "
    "duplicate (longest text, then lowest id) instead of an arbitrary "
    "one — what production curation actually wants, since near-"
    "identical copies differ in truncation/mojibake and min(doc_id) "
    "throws the best copy away. One fingerprint-partitioned window "
    "(bounded dup groups), deterministic argmax ordering; reports the "
    "group size beaten so downstream weighting can de-bias duplicated "
    "content.",
    tags=("text", "dedup", "window", "bench"),
)
def doc_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("fp").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    wc = Window.partitionBy("fp")
    return (
        docs.select("doc_id", "n_chars", T.fingerprint(F.col("text")).alias("fp"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_dups", F.count("*").over(wc).cast("long"))
        .where(F.col("rn") == 1)
        .select("doc_id", "n_dups")
    )


@query(
    "doc_incremental_minhash_dedup",
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
    sizes AS (SELECT doc_id, len(sh) AS sz FROM docs),
    inter AS (
        SELECT s.doc_id AS src_id, p.doc_id AS corpus_id, count(*) AS c
        FROM postings s JOIN postings p USING (shingle)
        WHERE s.doc_id % 10 = 0
        GROUP BY 1, 2
    ),
    j AS (
        SELECT src_id, corpus_id,
               floor(c * 1.0 / (sa.sz + sb.sz - c) * 10000.0 + 0.5) / 10000.0 AS j4
        FROM inter
        JOIN sizes sa ON sa.doc_id = src_id
        JOIN sizes sb ON sb.doc_id = corpus_id
        WHERE floor(c * 1.0 / (sa.sz + sb.sz - c) * 10000.0 + 0.5) / 10000.0 >= 0.5
    ),
    best AS (
        SELECT src_id,
               first(corpus_id ORDER BY j4 DESC, corpus_id ASC) AS matched_id,
               first(j4 ORDER BY j4 DESC, corpus_id ASC) AS j4
        FROM j GROUP BY src_id
    )
    SELECT src_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id,
           true AS is_dup,
           CAST(matched_id AS BIGINT) AS matched_id, CAST(j4 AS DOUBLE) AS jaccard
    FROM best
    UNION ALL
    SELECT doc_id + 2 * (SELECT max(doc_id) + 1 FROM documents),
           false, CAST(-1 AS BIGINT), CAST(0.0 AS DOUBLE)
    FROM documents WHERE doc_id % 10 = 5
    """,
    doc="Incremental near-dup dedup of a delta batch against a "
    "PERSISTED corpus band index (operators/dedup.py "
    "build_minhash_index + incremental_minhash_dedup) — the daily-"
    "crawl operation: the corpus text is touched only for the "
    "candidate set, never rescanned; probe cost is O(delta x bands) "
    "against the (bucketable) index. Driver-hashed on a planted "
    "delta: exact copies of every 10th doc (id + max(doc_id)+1 — the "
    "plant offset is DERIVED from the corpus since r14; a fixed 1e9 "
    "collided with real ids once scaled fixtures passed 1e9 docs-ids "
    "— must match their "
    "source — or its lowest-id exact twin — at jaccard 1.0, plus any "
    "stronger organic near-dup by the (jaccard desc, id asc) argmax) "
    "and token-REVERSED versions of others (id+2*offset, must NOT match: "
    "reversal destroys every 5-gram shingle, and the exact-Jaccard "
    "verification kills band-collision false positives "
    "deterministically). The oracle recomputes each copy's best "
    "corpus match from the exact J >= 0.5 pair set.",
    tags=("text", "dedup", "incremental", "bench"),
)
def doc_incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index = dedup.build_minhash_index(docs, "doc_id", "text")
    off = F.broadcast(docs.agg((F.max("doc_id") + 1).alias("_off")))
    # Planted delta built in ONE corpus scan (r14, guide §2.4): the
    # copy and reversed branches were two scans + two 1-row cross
    # joins + a union; a conditional projection over the %10∈{0,5}
    # slice emits the identical rows. The operator references the
    # delta three times (sketch pass, candidate-side semi join, final
    # left join) and Spark has no DataFrame CSE, so persist it — the
    # previous shape re-executed the two-scan union per reference.
    # The persist is deliberately session-lifetime (ADVICE r14): the
    # query fn returns a LAZY frame, so there is no post-materialize
    # hook to unpersist from; identical plans dedup to ONE CacheManager
    # entry, so repeated runs never accumulate blocks, and the bench's
    # inter-query drain releases it once handles drop.
    m = F.pmod(F.col("doc_id"), F.lit(10))
    delta = (
        docs.where((m == 0) | (m == 5))
        .crossJoin(off)
        .select(
            F.when(m == 0, F.col("doc_id") + F.col("_off"))
            .otherwise(F.col("doc_id") + 2 * F.col("_off"))
            .alias("doc_id"),
            F.when(m == 0, F.col("text"))
            .otherwise(
                F.concat_ws(" ", F.reverse(F.split(F.trim(F.col("text")), r"\s+")))
            )
            .alias("text"),
        )
        .persist()
    )
    return dedup.incremental_minhash_dedup(delta, docs, index, "doc_id", "text")


@query(
    "doc_fuzzy_dedup_e2e",
    oracle=f"""
    WITH RECURSIVE docs AS (
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
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    reach(v, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    comp AS (SELECT v AS id, min(r) AS component FROM reach GROUP BY v),
    members AS (
        SELECT c.component, d.doc_id, d.n_chars
        FROM comp c JOIN documents d ON d.doc_id = c.id
    )
    SELECT component,
           CAST(count(*) AS BIGINT) AS n_members,
           first(doc_id ORDER BY n_chars DESC, doc_id ASC) AS keep_id
    FROM members
    GROUP BY component
    HAVING count(*) > 1
    """,
    doc="Fuzzy dedup as ONE operator, the unit a corpus-curation user "
    "actually runs (VERDICT r05 #4; SURVEY §7.2-8): MinHash sketch -> "
    "banded LSH candidate pairs -> exact-Jaccard verify (>= 0.5) -> "
    "connected components (pointer doubling) -> keep-BEST canonical "
    "per group (longest text, then lowest id), all in one lazy plan. "
    "Output: every multi-member duplicate group with its size and the "
    "surviving doc. Shuffle volume is O(docs x bands) + O(pairs) — "
    "never doc x doc (covered by the catalog-wide no-cartesian plan "
    "sweep). The oracle recomputes the groups from the EXACT J >= 0.5 "
    "pair set via a recursive-CTE closure + per-group argmax, so hash "
    "equality asserts end-to-end recall = 1 on this corpus's planted "
    "duplicates AND correct canonical selection.",
    tags=("text", "dedup", "components", "bench"),
)
def doc_fuzzy_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_k=5, num_perm=64, num_bands=16, threshold=0.5
    )
    groups = dedup.dedup_groups(docs, "doc_id", pairs)
    members = groups.join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), on="id"
    )
    # Deterministic per-group argmax as ONE hash aggregation with
    # map-side partials (guide §2.3) — max(struct(n_chars, -id))
    # implements (n_chars DESC, id ASC) exactly like the former
    # row_number window but without the component-partitioned sort
    # (the same rewrite as label propagation's mode argmax, r14).
    return (
        members.groupBy("component")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.max(F.struct(F.col("n_chars"), (-F.col("id")).alias("_neg"))).alias("_m"),
        )
        .where(F.col("n_members") > 1)
        .select("component", "n_members", (-F.col("_m._neg")).alias("keep_id"))
    )
