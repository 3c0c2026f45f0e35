"""Deduplication operators for web-scale corpora.

Five families, all partition-parallel:

- exact:        hash-groupBy on a content fingerprint (one shuffle)
- minhash_lsh:  shingle -> MinHash signature -> banded LSH bucketing
                -> exact-Jaccard verification of candidates
- simhash:      64-bit SimHash -> pigeonhole block bucketing -> Hamming filter
- ngram_jaccard: exact shingle-inversion (the quadratic-safe
                inverted-index formulation, not doc x doc cross join)
- embedding:    cosine near-dup over embedding vectors (operators/similarity.py)

Scale notes: nothing here materializes a doc x doc cross product.
Candidate pairs come from ONE aggregation per bucketing key
(collect_list + in-bucket pair expansion) rather than a self-join:
a self-join re-executes the whole shingle/sketch subtree for both
sides (measured 2x at sf0.1) and shuffles it twice. Bucket fan-out is
bounded: LSH bands and SimHash blocks only group near-identical
sketches, so in-bucket expansion is quadratic only in the number of
actual near-duplicates sharing a bucket (cap with ``max_bucket`` for
adversarial corpora). The shingle-inversion path's buckets are
per-5-gram postings lists — tiny unless the corpus repeats long
phrases pathologically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from reciping_data_pipeline_spark.functions import hashing, sketches, text

# In-bucket candidate cap: a bucket with B members yields B*(B-1)/2
# pairs; beyond this cap the bucket is almost certainly a degenerate
# key (empty docs, boilerplate) and is dropped with a lineage-visible
# filter rather than silently exploding the stage.
DEFAULT_MAX_BUCKET = 1000


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id row per normalized-content fingerprint.

    One hash shuffle on the 128-bit fingerprint; at 100 TB this is the
    cheapest possible exact dedup (no sort, map-side partial min).
    """
    fp = text.fingerprint(F.col(text_col)).alias("fp")
    keep = df.select(fp, F.col(id_col)).groupBy("fp").agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the
    input arrives in fewer partitions (a single small parquet file
    serializes every downstream per-row kernel onto one core — the
    sf0.1 documents table ran 1-partition without this). On a real
    cluster large inputs already carry >= parallelism splits and this
    is a no-op. The "arrived narrow" probe is ``inputFiles()`` (public
    API, plan metadata only — no ``df.rdd``, which would force the
    whole physical RDD DAG to materialize just to read a count): a
    scan backed by fewer files than cores is the exact case where the
    parquet reader under-splits small fixtures. Large single files are
    already split by ``spark.sql.files.maxPartitionBytes``, and on a
    real cluster multi-file inputs carry enough splits."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) < target:
        return df.repartition(target)
    return df


def with_shingles(df: DataFrame, text_col: str, k: int = 5) -> DataFrame:
    """Append distinct k-word shingle array + its base hashes.

    Tokens are materialized as a real column first: a lambda body that
    references the raw ``split(text)`` EXPRESSION re-evaluates the
    regex split once per shingle (O(tokens^2) — measured 3-4x slower
    at sf0.1). As a bound attribute it's computed once per row, and
    CollapseProject won't inline a non-cheap multi-referenced alias.
    """
    return (
        df.withColumn("_toks", text.tokens(F.col(text_col)))
        .withColumn("shingles", hashing.word_shingles(F.col("_toks"), k))
        .withColumn("shingle_hashes", hashing.shingle_hashes(F.col("shingles")))
        .drop("_toks")
    )


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """Per-row ``(id, shingle)`` postings via position explode.

    ``explode(word_shingles(...))`` lets CollapseProject inline the
    whole shingle-construction expression into the Generate node,
    which re-evaluates it once per EMITTED element — O(tokens) evals
    of an O(tokens) expression per doc (measured ~7x wall-clock on the
    sf0.1 documents table, growing with doc length). Exploding the
    position sequence instead keeps the token array a bound,
    multi-referenced column (evaluated once per input row) and builds
    each k-word shingle per OUTPUT row: O(k) work per shingle, linear
    overall, no extra shuffle and no materialization barrier.

    Emits duplicates when a shingle repeats within a doc
    (``word_shingles`` is per-doc distinct): callers must aggregate
    with min / count_distinct semantics that absorb them.
    """
    w = df.withColumn("_toks", text.tokens(F.col(text_col))).where(F.size("_toks") >= k)
    posted = w.select(
        F.col(id_col),
        F.col("_toks"),
        F.explode(F.sequence(F.lit(1), F.size("_toks") - (k - 1))).alias("_pos"),
    )
    return posted.select(
        F.col(id_col),
        F.concat_ws(" ", F.slice(F.col("_toks"), F.col("_pos"), k)).alias("shingle"),
    )


def _pair_jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / F.nullif(union, F.lit(0.0))


def bucket_overflow_stats(
    keyed: DataFrame, key_cols: list[str], max_bucket: int
) -> DataFrame:
    """One-row diagnostic for the ``max_bucket`` cap ``_bucket_pairs``
    applies: ``(bucket_count, overflow_buckets, overflow_member_mass)``.

    The cap protects the pair-expansion stage from degenerate buckets
    (B members -> B*(B-1)/2 pairs), but on a boilerplate-heavy corpus
    dropping those buckets is a RECALL loss and must never be silent:
    callers surface this count (``minhash_lsh_pairs(overflow_report=...)``
    fills it eagerly and warns) so a production run knows when the cap
    bit. The index-probe paths (``incremental_minhash_dedup``, the
    streaming ingest) have no such cap — candidates come from an
    equi-join, not in-bucket expansion — so this applies to the batch
    pair-enumeration family only. One lightweight count-per-key
    aggregation over the (id, key) rows — no member payloads are
    collected.
    """
    sizes = keyed.groupBy(*key_cols).agg(F.count("*").alias("n")).where(F.col("n") > 1)
    return sizes.agg(
        F.count("*").cast("bigint").alias("bucket_count"),
        F.coalesce(
            F.sum(F.when(F.col("n") > max_bucket, 1)), F.lit(0)
        ).cast("bigint").alias("overflow_buckets"),
        F.coalesce(
            F.sum(F.when(F.col("n") > max_bucket, F.col("n"))), F.lit(0)
        ).cast("bigint").alias("overflow_member_mass"),
    )


def _report_overflow(
    keyed: DataFrame, key_cols: list[str], max_bucket: int,
    overflow_report: dict, op: str,
) -> None:
    """Fill ``overflow_report`` from :func:`bucket_overflow_stats` (one
    eager O(1) control-plane collect of a one-row aggregate) and warn
    when the ``max_bucket`` cap dropped anything."""
    stats = bucket_overflow_stats(keyed, key_cols, max_bucket).first()
    overflow_report.update(stats.asDict())
    if overflow_report["overflow_buckets"]:
        import warnings

        warnings.warn(
            f"{op}: {overflow_report['overflow_buckets']} bucket(s) over "
            f"max_bucket={max_bucket} dropped "
            f"({overflow_report['overflow_member_mass']} member postings) — "
            "candidate recall is reduced; raise max_bucket or pre-filter "
            "boilerplate",
            stacklevel=3,
        )


def _bucket_pairs(
    keyed: DataFrame, key_cols: list[str], payload: Column, max_bucket: int
) -> DataFrame:
    """Distinct candidate pairs from bucketed rows, in ONE aggregation.

    ``payload`` is the struct carried per member (at least an ``id``
    field). groupBy(bucket) -> collect_list -> expand member pairs
    in-bucket with array lambdas -> explode -> distinct on id pair.
    Replaces the classic bucket self-join, which recomputes and
    re-shuffles the upstream sketch pipeline for both join sides.

    Buckets larger than ``max_bucket`` are dropped (degenerate keys —
    empty docs, boilerplate). That drop loses candidate recall, so it
    must not be silent: callers that care pass the same ``keyed`` frame
    to :func:`bucket_overflow_stats` and report the overflow count.
    """
    buckets = (
        keyed.groupBy(*key_cols)
        .agg(F.collect_list(payload).alias("members"))
        .where((F.size("members") > 1) & (F.size("members") <= max_bucket))
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                lambda y: F.when(x["id"] < y["id"], F.struct(x.alias("a"), y.alias("b"))).otherwise(
                    F.struct(y.alias("a"), x.alias("b"))
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select(
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
            # dropDuplicates needs top-level columns, not struct fields
            F.col("p.a.id").alias("_ka"),
            F.col("p.b.id").alias("_kb"),
        )
        .dropDuplicates(["_ka", "_kb"])
        .drop("_ka", "_kb")
    )


# Clone-cluster re-expansion chunk (r15): a group's O(k²) member-pair
# generation is confined to the ONE task holding its row when done with
# nested array transforms. Groups above this size switch to a chunked
# form that spreads the expansion over ~(k/chunk)²/2 tasks of ≤ chunk²
# emitted pairs each (guide §2.5 — AQE skew splitting only applies to
# joins, so the spread must be explicit). 4096² ≈ 16.8M pairs per task
# is comparable to a normal task's row throughput; a 100k-clone
# cluster (5·10⁹ pairs) spreads over ~300 tasks instead of one.
CLONE_EXPAND_CHUNK = 4096


def _chunk_slices(arr: Column, chunk: int) -> Column:
    """Array of ≤chunk-sized contiguous slices of a non-empty array."""
    return F.transform(
        F.sequence(
            F.lit(0), F.floor((F.size(arr) - F.lit(1)) / F.lit(chunk)).cast("int")
        ),
        lambda i: F.slice(arr, i * chunk + 1, chunk),
    )


def _tri_pairs(arr: Column) -> Column:
    """All (arr[i], arr[j]) i<j combination structs of one array —
    pairs come out ordered when ``arr`` is sorted ascending."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


def _cross_chunk_pairs(aa: Column, bb: Column) -> Column:
    """Full aa × bb cross-product structs (two distinct chunks of one
    sorted array: every aa element precedes every bb element)."""
    return F.flatten(
        F.transform(
            aa, lambda x: F.transform(bb, lambda y: F.struct(x.alias("a"), y.alias("b")))
        )
    )


def _within_group_pairs(groups: DataFrame, chunk: int = CLONE_EXPAND_CHUNK) -> DataFrame:
    """``(id_a, id_b)`` for every 2-combination of each group's sorted
    ``_members`` array (sorted ⇒ id_a < id_b on every path).

    Groups at or below ``chunk`` members expand in-task via one nested
    transform — no shuffle, the overwhelmingly common case at any
    scale. A bigger group's expansion would otherwise pin O(k²) struct
    emissions on the one task holding its row (VERDICT r14 #7: a
    100k-clone cluster = 5·10⁹ allocations in one task): those rows
    chunk the member array into ≤chunk-sized slices, emit one row per
    (i ≤ j) chunk pair, hash-repartition on (_fp, i, j) — corpus-many
    distinct keys, guide §2.5 — and expand ≤ chunk² pairs per task.
    The output SET is identical: the chunk grid partitions the index
    space, each unordered member pair lands in exactly one (i ≤ j)
    cell (diagonal cells expand triangularly, off-diagonal cells as a
    full cross of two disjoint sorted ranges).

    Whether any oversized group EXISTS is decided by a one-row probe
    of the (caller-persisted) group table — the same cache-warming
    control-plane pattern as minhash's candidate-count probe. Without
    it the distributed branch would sit in every plan as a full-width
    exchange of zero rows (32 scheduled-empty tasks per call at the
    bench's width; AQE cannot coalesce it away because the width must
    be user-pinned — the chunk rows are tiny ON THE WIRE while the
    downstream explode is the actual work, so byte-based coalescing
    would fold a real mega-cluster's expansion back into one task,
    which is exactly the regression this helper exists to prevent)."""
    small = groups.where(
        (F.size("_members") >= 2) & (F.size("_members") <= chunk)
    ).select(F.explode(_tri_pairs(F.col("_members"))).alias("p"))
    max_size = groups.agg(F.max(F.size("_members"))).first()[0] or 0
    if max_size <= chunk:
        return small.select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
    ch = _chunk_slices(F.col("_members"), chunk)
    chunk_pairs = F.flatten(
        F.transform(
            ch,
            lambda a, i: F.transform(
                F.slice(ch, i + 1, F.size(ch) - i),
                lambda b, j: F.struct(
                    a.alias("ca"), b.alias("cb"), i.alias("ci"), (i + j).alias("cj")
                ),
            ),
        )
    )
    # Explicit full-width repartition (same rationale as the cosine
    # kernel's grid): the chunk-pair rows are tiny ON THE WIRE (ids
    # only) while the downstream explode is where the quadratic work
    # happens, so AQE's byte-based coalescing would fold the exchange
    # back to one task and re-serialize the expansion.
    width = int(groups.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    big = (
        groups.where(F.size("_members") > chunk)
        .select("_fp", F.explode(chunk_pairs).alias("c"))
        .repartition(width, F.col("_fp"), F.col("c.ci"), F.col("c.cj"))
        .select(
            F.explode(
                F.when(
                    F.col("c.ci") == F.col("c.cj"), _tri_pairs(F.col("c.ca"))
                ).otherwise(_cross_chunk_pairs(F.col("c.ca"), F.col("c.cb")))
            ).alias("p")
        )
    )
    return small.unionAll(big).select(
        F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    num_perm: int = 64,
    num_bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    overflow_report: dict | None = None,
    max_broadcast_ids: int = 2_000_000,
    collapse_exact: bool = True,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact Jaccard >= threshold,
    candidates generated by banded MinHash-LSH.

    16 bands x 4 rows targets the s-curve knee near J ~ (1/16)^(1/4) ~ 0.5,
    i.e. high recall at the 0.8 threshold. Candidates are verified with
    exact Jaccard over the (distinct) shingle sets re-attached to the
    surviving pairs, so the output has no false positives. The band
    exchange carries only (id, band_idx, band_hash) — the shingle
    arrays never ride through the explode.

    Buckets over ``max_bucket`` members are dropped before pair
    expansion — a RECALL loss on boilerplate-heavy corpora. Pass a
    dict as ``overflow_report`` to have it filled (eagerly — one O(1)
    control-plane collect of a one-row aggregate) with
    ``{bucket_count, overflow_buckets, overflow_member_mass}``; a
    non-zero overflow also logs a warning. With ``overflow_report=None``
    the plan is unchanged and fully lazy.

    ``collapse_exact`` (default on, r14): EXACT-clone pre-collapse —
    docs grouped by raw-text md5, ONE representative per group runs
    the sketch/band/verify pipeline, and member pairs are re-expanded
    afterward (cross-group pairs inherit the representatives' exact
    Jaccard — identical text means identical shingle sets — and
    within-group pairs are J = 1.0 by definition). A replicated or
    bot-heavy corpus concentrates hundreds-to-thousands of EXACT
    clones per cluster; every band of such a cluster is one bucket of
    cluster size, so a 1.5k-clone cluster overflows max_bucket in ALL
    16 bands and the uncollapsed pipeline loses the whole cluster —
    measured recall 0.40 at ×300-docszipf vs 1.0 collapsed
    (BENCH_NOTES r14; the same fingerprint-dedup discipline as the
    r13 timeseries-similarity rewrite). On a clone-free corpus every
    group is a singleton and the output is identical by construction
    (groups of one expand to the representative itself; short docs
    that cannot form a k-shingle are excluded from grouping exactly as
    the uncollapsed path never emits them). Collapse uses the RAW
    text hash, not functions.text.fingerprint's normalized form:
    normalization-equal-but-raw-different docs do NOT share shingle
    sets, so claiming J = 1.0 for them would diverge from the exact
    verification contract.
    """
    rows_per_band = num_perm // num_bands
    groups = None
    if collapse_exact:
        # ONE corpus pass (r14.2): the representative's text rides the
        # grouping aggregation (every member's text is identical by
        # construction, so first() is deterministic), and the rep set
        # is served straight from the persisted group table. The
        # previous shape paid a second parquet scan + a corpus-wide
        # semi join to re-attach text to the min-id rep, and a THIRD
        # scan for candidate verification; all three now read the one
        # cached pass (guide §2.3/§2.4). Map-side partial aggregation
        # keeps one text per (map partition, fingerprint), so a clone
        # cluster's text crosses the exchange once per map partition,
        # not once per member.
        elig = df.where(
            F.size(text.tokens(F.col(text_col))) >= F.lit(shingle_k)
        )
        groups = (
            elig.select(F.md5(F.col(text_col)).alias("_fp"), F.col(id_col), F.col(text_col))
            .groupBy("_fp")
            .agg(
                F.min(id_col).alias("_rep"),
                F.sort_array(F.collect_list(id_col)).alias("_members"),
                F.first(text_col).alias("_text"),
            )
            # consumed by the rep projection (pipeline + verification
            # branches) and both expansion sides — same persist
            # discipline as `cand` below
            .persist()
        )
        df = groups.select(
            F.col("_rep").alias(id_col), F.col("_text").alias(text_col)
        )
    docs = with_shingles(spread(df), text_col, shingle_k).select(
        F.col(id_col), "shingles", "shingle_hashes"
    )
    minhash = sketches.minhash_signature_udf(num_perm, seed)
    sig = minhash(F.col("shingle_hashes"))
    banded = docs.withColumn("bands", hashing.lsh_bands(sig, num_bands, rows_per_band)).select(
        F.col(id_col), F.explode("bands").alias("band")
    )
    keyed = banded.select(
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_hash").alias("band_hash"),
        F.col(id_col).alias("id"),
    )
    if overflow_report is not None:
        _report_overflow(
            keyed, ["band_idx", "band_hash"], max_bucket, overflow_report,
            "minhash_lsh_pairs",
        )
    cand = _bucket_pairs(
        keyed, ["band_idx", "band_hash"], F.struct(F.col("id")), max_bucket
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    # The candidate subplan embeds the full shingle+MinHash pass and is
    # referenced three times below (two id projections + the pair
    # join); without persist Spark re-executes that pass per branch
    # (measured 2-3x wall). Candidate pairs are tiny at any corpus
    # scale — LSH exists to make them so — hence safe to cache.
    # persist(), NOT localCheckpoint(eager=False): with AQE enabled a
    # "lazy" localCheckpoint is eager anyway — Dataset.checkpoint calls
    # physicalPlan.execute(), and AdaptiveSparkPlanExec runs every
    # query stage to produce the final plan, so the whole candidate
    # pipeline executes at PLAN-BUILD time; worse, the resulting
    # LogicalRDD never registers with the CacheManager, so repeated
    # builds of the identical plan (benchmarks, retried jobs, notebook
    # re-runs) recompute from scratch instead of hitting the cache
    # (measured 10x wall in BENCH r07). persist() dedups identical
    # plans to ONE cache entry, so repeated same-input calls do not
    # accumulate blocks.
    cand = cand.persist()
    # Verification re-tokenizes ONLY candidate docs: semi-join the raw
    # corpus down to candidate ids first, then recompute shingles on
    # that (tiny) subset — not two more full-corpus shingle passes.
    # The id set is explicitly broadcast WHEN SMALL: after the persist
    # Catalyst has no stats for it, and a stats-blind planner falls
    # back to a sort-merge semi join that SHUFFLES THE WHOLE CORPUS —
    # measured growing linearly with corpus size in scale_curve.py.
    # LSH bounds pairs PER BUCKET, not the total: on a dup-heavy
    # corpus candidate-id mass grows with the duplicate mass, and an
    # unconditional broadcast hint would blow the 8 GB broadcast limit
    # with no planner fallback. The persist above makes the size check
    # a cheap cache-warming count (the three downstream references hit
    # the cache either way); past ``max_broadcast_ids`` distinct ids
    # (~2M ids ≈ tens of MB broadcast) the hint is dropped and the
    # planner chooses — slower, never fatal.
    n_pairs = cand.count()
    raw = df.select(F.col(id_col), F.col(text_col))
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    if 2 * n_pairs <= max_broadcast_ids:
        cand_ids = F.broadcast(cand_ids)
    cand_docs = with_shingles(raw.join(cand_ids, on=id_col, how="left_semi"), text_col, shingle_k)
    sets_a = cand_docs.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("shingles_a"))
    sets_b = cand_docs.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("shingles_b"))
    pairs = cand.join(sets_a, on="id_a").join(sets_b, on="id_b")
    verified = (
        pairs.withColumn("jaccard", _pair_jaccard(F.col("shingles_a"), F.col("shingles_b")))
        .where(F.col("jaccard") >= threshold)
        # floor form, not round(): engine round() ties differ (Spark
        # HALF_UP on shortest-decimal vs DuckDB binary rounding) and
        # J = c/u CAN land exactly on the 4-dp half grid (e.g. 324/640)
        .select(
            "id_a",
            "id_b",
            (F.floor(F.col("jaccard") * 10000.0 + 0.5) / 10000.0).alias("jaccard"),
        )
    )
    if groups is None:
        return verified
    # Re-expand representative pairs to member pairs. Cross-group:
    # every (x in G_a, y in G_b) inherits the representatives' exact
    # Jaccard (identical text ⇒ identical shingle sets). Within-group:
    # J = 1.0 exactly (the float path could round an ulp-sized sqrt
    # residual — definitionally exact here, matching what verification
    # computes for identical shingle arrays). Expansion size equals
    # the true pair-output size — the quadratic lives in the OUTPUT
    # contract, not the join graph (the group list is bounded by the
    # corpus's largest exact-clone cluster; cluster-level consumers
    # like fuzzy_dedup_groups should prefer the collapsed form).
    cross = (
        verified.join(
            groups.select(F.col("_rep").alias("id_a"), F.col("_members").alias("_ma")),
            on="id_a",
        )
        .join(
            groups.select(F.col("_rep").alias("id_b"), F.col("_members").alias("_mb")),
            on="id_b",
        )
        .select("jaccard", F.explode("_ma").alias("_x"), "_mb")
        .select("jaccard", "_x", F.explode("_mb").alias("_y"))
        .select(
            F.least("_x", "_y").alias("id_a"),
            F.greatest("_x", "_y").alias("id_b"),
            "jaccard",
        )
    )
    within = _within_group_pairs(groups).withColumn("jaccard", F.lit(1.0))
    return cross.unionAll(within)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    overflow_report: dict | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= max_hamming.

    Pigeonhole candidate generation: split the 64-bit signature into
    max_hamming+1 blocks; any pair within distance d must agree on at
    least one block (exact recall). Each block bucket carries
    (id, simhash) structs so the Hamming verification happens on the
    pair row without another corpus pass. ``overflow_report`` (optional
    dict) reports the ``max_bucket`` cap's dropped buckets — the same
    no-silent-recall-loss contract as ``minhash_lsh_pairs``.

    ``collapse_exact`` (default on, r14): the same exact-clone
    pre-collapse as ``minhash_lsh_pairs`` — identical raw text means
    an identical signature, so a clone cluster larger than
    ``max_bucket`` lands whole in every one of its block buckets and
    the uncollapsed pipeline drops it entirely (the docszipf fixture's
    1.2k-member rank-1 cluster). One representative per raw-text md5
    runs the pigeonhole; cross-group pairs inherit the reps' Hamming
    distance, within-group pairs are Hamming 0 by definition.
    Clone-free corpora produce the identical output (singleton groups
    expand to themselves).
    """
    n_blocks = max_hamming + 1
    block_bits = 64 // n_blocks
    groups = None
    if collapse_exact:
        # rep text rides the grouping pass — see minhash_lsh_pairs
        # (r14.2): one corpus scan, no semi join, no re-scan. No
        # shingle-eligibility filter here: identical text gives an
        # identical signature at ANY length, so within-group Hamming-0
        # pairs are correct even for empty/short docs.
        groups = (
            df.select(F.md5(F.col(text_col)).alias("_fp"), F.col(id_col), F.col(text_col))
            .groupBy("_fp")
            .agg(
                F.min(id_col).alias("_rep"),
                F.sort_array(F.collect_list(id_col)).alias("_members"),
                F.first(text_col).alias("_text"),
            )
            .persist()
        )
        df = groups.select(
            F.col("_rep").alias(id_col), F.col("_text").alias(text_col)
        )
    simhash = sketches.simhash64_udf()
    token_hashes = F.transform(text.tokens(F.col(text_col)), lambda t: F.xxhash64(t))
    docs = spread(df).select(F.col(id_col), simhash(token_hashes).alias("simhash"))
    keyed = docs.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_idx"),
                        F.shiftright(F.col("simhash"), b * block_bits)
                        .bitwiseAND(F.lit((1 << block_bits) - 1))
                        .alias("block_val"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("blk"),
    ).select("blk.block_idx", "blk.block_val", "id", "simhash")
    if overflow_report is not None:
        _report_overflow(
            keyed, ["block_idx", "block_val"], max_bucket, overflow_report,
            "simhash_pairs",
        )
    pairs = _bucket_pairs(
        keyed,
        ["block_idx", "block_val"],
        F.struct(F.col("id"), F.col("simhash")),
        max_bucket,
    )
    verified = (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hashing.hamming64(F.col("a.simhash"), F.col("b.simhash")).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
    if groups is None:
        return verified
    # member re-expansion — same contract as minhash_lsh_pairs
    cross = (
        verified.join(
            groups.select(F.col("_rep").alias("id_a"), F.col("_members").alias("_ma")),
            on="id_a",
        )
        .join(
            groups.select(F.col("_rep").alias("id_b"), F.col("_members").alias("_mb")),
            on="id_b",
        )
        .select("hamming", F.explode("_ma").alias("_x"), "_mb")
        .select("hamming", "_x", F.explode("_mb").alias("_y"))
        .select(
            F.least("_x", "_y").alias("id_a"),
            F.greatest("_x", "_y").alias("id_b"),
            "hamming",
        )
    )
    within = _within_group_pairs(groups).withColumn("hamming", F.lit(0).cast("int"))
    return cross.unionAll(within)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    threshold: float = 0.8,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    overflow_report: dict | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via shingle inversion (recall = 1*).

    explode(shingles) -> per-shingle postings bucket -> in-bucket pair
    expansion -> count shared shingles per pair -> re-attach per-doc
    set sizes -> Jaccard. Shuffle volume is the postings list, not
    doc x doc. A length-ratio prefilter (min/max set size >= threshold
    is necessary for J >= threshold) prunes before the division.

    *The recall-1 claim holds only while no shingle's postings list
    exceeds ``max_bucket`` (a 5-gram shared by >1000 docs is corpus
    boilerplate; dropping it undercounts intersections for pairs that
    share it). ``overflow_report`` (optional dict) reports that drop —
    zero overflow certifies the exact-recall contract for the run.

    ``collapse_exact`` (default on, r14): the minhash/simhash
    exact-clone pre-collapse applied to the inversion — a clone
    cluster above ``max_bucket`` pushes every one of ITS OWN shingles'
    postings lists over the cap (the docszipf 1.2k-member cluster cost
    doc_split_leakage 2.2% of its pair set), while one representative
    per raw text keeps postings DF at the distinct-text count. Member
    pairs re-expand with the representatives' Jaccard; within-group
    pairs are exactly 1.0.
    """
    groups = None
    if collapse_exact:
        # rep text rides the grouping pass — see minhash_lsh_pairs
        # (r14.2): one corpus scan, no semi join, no re-scan.
        elig = df.where(
            F.size(text.tokens(F.col(text_col))) >= F.lit(shingle_k)
        )
        groups = (
            elig.select(F.md5(F.col(text_col)).alias("_fp"), F.col(id_col), F.col(text_col))
            .groupBy("_fp")
            .agg(
                F.min(id_col).alias("_rep"),
                F.sort_array(F.collect_list(id_col)).alias("_members"),
                F.first(text_col).alias("_text"),
            )
            .persist()
        )
        df = groups.select(
            F.col("_rep").alias(id_col), F.col("_text").alias(text_col)
        )
    docs = with_shingles(spread(df), text_col, shingle_k).select(
        F.col(id_col).alias("doc"), "shingles", F.size("shingles").alias("set_size")
    )
    postings = docs.select(
        F.explode("shingles").alias("shingle"),
        F.struct(F.col("doc").alias("id"), F.col("set_size")).alias("member"),
    )
    if overflow_report is not None:
        _report_overflow(
            postings, ["shingle"], max_bucket, overflow_report, "ngram_jaccard_pairs"
        )
    # Per-shingle buckets; every co-occurrence of a pair contributes
    # one row, so counting rows per pair == |A intersect B|.
    buckets = (
        postings.groupBy("shingle")
        .agg(F.collect_list("member").alias("members"))
        .where((F.size("members") > 1) & (F.size("members") <= max_bucket))
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                lambda y: F.when(x["id"] < y["id"], F.struct(x.alias("a"), y.alias("b"))).otherwise(
                    F.struct(y.alias("a"), x.alias("b"))
                ),
            ),
        )
    )
    inter = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            F.col("p.a.set_size").alias("size_a"),
            F.col("p.b.set_size").alias("size_b"),
        )
        .agg(F.count("*").alias("inter_size"))
    )
    jac = F.col("inter_size") / (F.col("size_a") + F.col("size_b") - F.col("inter_size"))
    verified = (
        inter.where(
            F.least("size_a", "size_b") * F.lit(1.0) / F.greatest("size_a", "size_b")
            >= threshold
        )
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        # floor form, not round(): engine round() ties differ (Spark
        # HALF_UP on shortest-decimal vs DuckDB binary rounding) and
        # J = c/u CAN land exactly on the 4-dp half grid (e.g. 324/640)
        .select(
            "id_a",
            "id_b",
            (F.floor(F.col("jaccard") * 10000.0 + 0.5) / 10000.0).alias("jaccard"),
        )
    )
    if groups is None:
        return verified
    # member re-expansion — same contract as minhash_lsh_pairs
    cross = (
        verified.join(
            groups.select(F.col("_rep").alias("id_a"), F.col("_members").alias("_ma")),
            on="id_a",
        )
        .join(
            groups.select(F.col("_rep").alias("id_b"), F.col("_members").alias("_mb")),
            on="id_b",
        )
        .select("jaccard", F.explode("_ma").alias("_x"), "_mb")
        .select("jaccard", "_x", F.explode("_mb").alias("_y"))
        .select(
            F.least("_x", "_y").alias("id_a"),
            F.greatest("_x", "_y").alias("id_b"),
            "jaccard",
        )
    )
    within = _within_group_pairs(groups).withColumn("jaccard", F.lit(1.0))
    return cross.unionAll(within)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Union near-duplicate pairs into components: ``(id, component)``
    with ``component`` = the minimum member id (a deterministic
    canonical representative).

    The step after any pair-producing dedup (MinHash-LSH, SimHash,
    exact Jaccard): pairs only say "a~b"; keep/drop decisions need the
    transitive closure (a~b, b~c => one group).

    Hash-min label propagation WITH pointer doubling: every vertex
    starts labeled with itself; each round it takes the min over (its
    label, its neighbors' labels, its label's label). The neighbor
    term floods locally; the label-of-label hop halves the remaining
    pointer chains, so an adversarial path/chain component converges
    in O(log diameter) rounds instead of O(diameter) — the difference
    between 13 and 5000 rounds on a 5000-doc chain (tests/test_skew.py
    pins this). Plain DataFrame loop: ONE shuffle join per round (the
    neighbor flood and the pointer hop are the same "send label(u) to
    w" message over different edge sets, so they share a single join
    on the unioned edges — r14, was two joins), ``localCheckpoint``
    per round to truncate lineage (an iterative plan otherwise grows
    exponentially), early exit on a fixed point.
    Raises if ``max_iter`` rounds pass without convergence — a silent
    partial closure would merge dedup groups nondeterministically.

    ``stats`` (optional dict) receives {"rounds", "converged"} for
    round-count assertions and ops visibility.
    """
    # Materialize the edge list ONCE: without this every iteration's
    # join would re-execute the whole upstream pair-generation subtree
    # (shingle inversion / sketch verification — far more expensive
    # than the propagation itself) through lineage.
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("v")).distinct().withColumn("label", F.col("v"))
    ).localCheckpoint(eager=True)
    converged = False
    rounds = 0
    # Fixed-point detection: labels are MONOTONE non-increasing (every
    # update is a min), so the label sum strictly decreases until the
    # fixed point — a scalar aggregate per round replaces the naive
    # new-vs-old join + isEmpty (which costs a shuffle join per round
    # at scale). decimal(38,0) keeps the sum exact for 64-bit ids.
    label_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
    for _ in range(max_iter):
        rounds += 1
        # ONE join per round (r14, guide §2.4): the neighbor flood and
        # the pointer-doubling hop are the same message shape — "send
        # label(u) to w" — differing only in the edge set (graph edges
        # (u, w) vs pointer edges (label_t(w), w), where label(w)'s
        # label reaching w is exactly label(label(w))). Union the two
        # edge sets BEFORE the join instead of running two shuffle
        # joins per round: saves a join stage and two V-sized
        # exchanges every iteration (pointer-edge construction is a
        # projection of the checkpointed label table, no shuffle).
        # Every label value is itself a vertex with a labels row, so
        # the inner join loses nothing (same as the old hop join).
        msg_edges = edges.unionAll(
            labels.select(F.col("label").alias("src"), F.col("v").alias("dst"))
        )
        incoming = msg_edges.join(labels, msg_edges["src"] == labels["v"]).select(
            F.col("dst").alias("v"), F.col("label")
        )
        new_labels = (
            labels.union(incoming).groupBy("v").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        new_sum = new_labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        labels = new_labels
        if new_sum == label_sum:
            converged = True
            break
        label_sum = new_sum
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "component diameter exceeds 2^max_iter; raise max_iter"
        )
    return labels.select(F.col("v").alias("id"), F.col("label").alias("component"))


def dedup_groups(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Assign every row of ``df`` to a dedup group: rows appearing in
    ``pairs`` get their component's canonical (min) id, untouched rows
    are singletons (component = own id). Output: ``(id, component,
    is_canonical)`` — filtering ``is_canonical`` yields the keep-list.
    """
    comp = connected_components(pairs, id_a, id_b)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, on="id", how="left")
        .select(
            "id",
            F.coalesce("component", F.col("id")).alias("component"),
        )
        .withColumn("is_canonical", F.col("id") == F.col("component"))
    )


def contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_gram: int = 5,
) -> DataFrame:
    """Benchmark decontamination: for every corpus doc, the number of
    distinct word n-grams it shares with ANY eval-set doc, plus a
    ``contaminated`` flag — the standard pre-training hygiene step
    (drop or flag training docs that leak evaluation data).

    Scale shape: the eval side is deduped to a distinct-shingle set and
    broadcast (eval benchmarks are thousands-to-millions of n-grams —
    megabytes, not the corpus's scale); the corpus side explodes its
    distinct shingles map-side and the broadcast hash join + partial
    count means the only shuffle is the final per-doc aggregation of
    ALREADY-MATCHED rows (hits are rare by construction, so the
    exchange is tiny). Nothing quadratic, no corpus self-join.
    """
    # Position-explode postings (see exploded_shingles): duplicates a
    # repeated in-doc shingle, which count_distinct below absorbs.
    c = exploded_shingles(spread(corpus), id_col, text_col, n_gram).withColumnRenamed(
        "shingle", "g"
    )
    e = (
        exploded_shingles(eval_docs, id_col, text_col, n_gram)
        .select(F.col("shingle").alias("g"))
        .distinct()
    )
    hits = (
        c.join(F.broadcast(e), on="g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("shared_ngrams"))
    )
    return (
        corpus.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("shared_ngrams", F.lit(0)).alias("shared_ngrams"),
            (F.coalesce("shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    existing_fingerprints: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Dedup a delta batch against a persisted corpus fingerprint
    index — the daily-ingest operation: new crawl arrives, the corpus
    itself is NOT re-read.

    Two steps, both delta-sized on the text side: in-batch keep-min-id
    per fingerprint (same semantics as ``exact_dedup``), then a
    left-anti join against the index. The index is O(corpus) rows but
    only 16 bytes wide; at 100 TB keep it bucketed on the fingerprint
    (sources/bucketing.py) so the anti-join shuffles ONLY the delta
    batch, or broadcast it while it fits — and Spark's runtime Bloom
    filter injection (spark.sql.optimizer.runtime.bloomFilter.enabled,
    on by default here) builds a Bloom of the small delta side and
    prunes the index scan before its shuffle. Returns the surviving
    new rows with their fingerprint attached — append them to the
    index to complete the ingest cycle.
    """
    fp = text.fingerprint(F.col(text_col)).alias(fp_col)
    batch = new_docs.select(F.col(id_col), fp)
    in_batch = batch.groupBy(fp_col).agg(F.min(id_col).alias(id_col))
    idx = existing_fingerprints.select(F.col(fp_col)).distinct()
    return in_batch.join(idx, on=fp_col, how="left_anti").select(id_col, fp_col)


def build_minhash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_k: int = 5,
    num_perm: int = 64,
    num_bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """The persistable NEAR-dup index: one ``(id, band_idx, band_hash)``
    posting row per LSH band per document — O(docs × bands) rows, ~20
    bytes wide. The incremental complement of the fingerprint index
    ``incremental_exact_dedup`` probes: build once over the corpus,
    append each ingested batch's postings, and every future delta
    dedups against the WHOLE corpus without re-reading its text. At
    100 TB persist it bucketed on (band_idx, band_hash)
    (sources/bucketing.py) so delta probes shuffle only the delta."""
    rows_per_band = num_perm // num_bands
    docs = with_shingles(spread(df), text_col, shingle_k).select(
        F.col(id_col), "shingle_hashes"
    )
    minhash = sketches.minhash_signature_udf(num_perm, seed)
    sig = minhash(F.col("shingle_hashes"))
    return (
        docs.withColumn("bands", hashing.lsh_bands(sig, num_bands, rows_per_band))
        .select(F.col(id_col).alias("id"), F.explode("bands").alias("band"))
        .select(
            "id",
            F.col("band.band_idx").alias("band_idx"),
            F.col("band.band_hash").alias("band_hash"),
        )
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_k: int = 5,
    num_perm: int = 64,
    num_bands: int = 16,
    seed: int = 42,
    threshold: float = 0.5,
    cache_registry: list | None = None,
) -> DataFrame:
    """Near-duplicate check of a delta batch against a persisted
    corpus band index (``build_minhash_index``) — the daily-crawl
    operation fuzzy dedup needs at scale: the corpus TEXT is touched
    only for the (tiny) candidate set, never rescanned.

    Delta docs are sketched with the index's parameters, candidates
    come from an equi-join on (band_idx, band_hash), and every
    candidate is verified with EXACT Jaccard over shingles recomputed
    for just the candidate ids on both sides — so the output has no
    false positives regardless of band collisions. Returns one row per
    delta doc: ``(id, is_dup, matched_id, jaccard)`` with the best
    match chosen by (jaccard desc, matched id asc) on the floor-4dp
    grid; non-duplicates carry (-1, 0.0) so no nullable columns leak
    into cross-engine comparisons.

    Scale: sketching is map-side over the delta; the probe join
    shuffles O(delta × bands) postings against the (bucketed) index;
    verification is bounded by the candidate count.

    ``cache_registry``: the candidate set is ``persist()``-ed (it is
    referenced three times). Repeated calls with an identical plan
    share one CacheManager entry, but a long-lived caller that issues
    a DIFFERENT plan per call (a streaming micro-batch loop) would
    accumulate entries — pass a list here to receive the persisted
    handle(s) and ``unpersist()`` them once the batch's outputs are
    materialized.
    """
    delta_bands = build_minhash_index(
        new_docs,
        id_col,
        text_col,
        shingle_k=shingle_k,
        num_perm=num_perm,
        num_bands=num_bands,
        seed=seed,
    )
    # persist(), NOT localCheckpoint(eager=False): the candidate
    # subplan is referenced three times below and must not re-execute
    # per branch. A lazy localCheckpoint is NOT a leak-free substitute:
    # under AQE it executes the whole probe pipeline eagerly at
    # plan-build time (AdaptiveSparkPlanExec materializes every query
    # stage inside Dataset.checkpoint's execute()) and bypasses the
    # CacheManager, so identical re-builds recompute from scratch
    # (measured 10x wall in BENCH r07). The per-micro-batch cache-leak
    # concern (each batch's plan differs, so entries would accumulate
    # for the life of a stream) is handled explicitly instead: pass
    # ``cache_registry`` and unpersist after the batch's writes, as
    # start_near_dup_corpus_stream does.
    cand = (
        delta_bands.alias("d")
        .join(index.alias("i"), ["band_idx", "band_hash"])
        .select(F.col("d.id").alias("new_id"), F.col("i.id").alias("corpus_id"))
        .distinct()
    ).persist()
    if cache_registry is not None:
        cache_registry.append(cand)
    # Candidate-id sets are explicitly broadcast: the checkpoint strips
    # stats, and a stats-blind planner turns the corpus-side semi join
    # into a sort-merge join that shuffles the WHOLE corpus (measured
    # linear in corpus size in scale_curve.py — the exact rescan this
    # operator exists to avoid). Candidates are probe-bounded, so the
    # broadcast is small at any corpus scale.
    new_sets = with_shingles(
        new_docs.join(
            F.broadcast(cand.select(F.col("new_id").alias(id_col)).distinct()),
            on=id_col,
            how="left_semi",
        ),
        text_col,
        shingle_k,
    ).select(F.col(id_col).alias("new_id"), F.col("shingles").alias("sh_new"))
    corp_sets = with_shingles(
        corpus.join(
            F.broadcast(cand.select(F.col("corpus_id").alias(id_col)).distinct()),
            on=id_col,
            how="left_semi",
        ),
        text_col,
        shingle_k,
    ).select(F.col(id_col).alias("corpus_id"), F.col("shingles").alias("sh_corp"))
    verified = (
        cand.join(new_sets, "new_id")
        .join(corp_sets, "corpus_id")
        .withColumn(
            "jaccard",
            F.floor(_pair_jaccard(F.col("sh_new"), F.col("sh_corp")) * 10000.0 + 0.5)
            / 10000.0,
        )
        .where(F.col("jaccard") >= threshold)
    )
    from pyspark.sql import Window

    w_best = Window.partitionBy("new_id").orderBy(
        F.col("jaccard").desc(), F.col("corpus_id").asc()
    )
    best = (
        verified.withColumn("_rn", F.row_number().over(w_best))
        .where(F.col("_rn") == 1)
        .select("new_id", F.col("corpus_id").alias("matched_id"), "jaccard")
    )
    return (
        new_docs.select(F.col(id_col))
        .join(best.withColumnRenamed("new_id", id_col), on=id_col, how="left")
        .select(
            id_col,
            F.col("matched_id").isNotNull().alias("is_dup"),
            F.coalesce("matched_id", F.lit(-1)).alias("matched_id"),
            F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"),
        )
    )
