"""Planted-fixture validation of the sketch-based (no-SQL-oracle)
operators: MinHash-LSH, SimHash, hyperplane-LSH ANN, IVF ANN.

Construction: a seeded corpus of distinct random-word documents, plus
planted near-duplicate pairs at controlled edit rates. The exact
shingle-inversion Jaccard operator (recall = 1 by construction) is the
ground truth for the text sketches; brute-force cosine is the ground
truth for the ANN paths. Each sketch must (a) find ≥90% of planted
pairs / true neighbors, (b) emit nothing below its threshold — the
exact verification step makes false positives structurally impossible,
and the test pins that.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

import pyspark.sql.functions as F

from reciping_data_pipeline_spark.operators import dedup, similarity

WORDS = [f"w{i:03d}" for i in range(400)]


def _doc(rng: random.Random, n: int = 60) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _perturb(rng: random.Random, text: str, edits: int) -> str:
    toks = text.split()
    for _ in range(edits):
        toks[rng.randrange(len(toks))] = rng.choice(WORDS)
    return " ".join(toks)


@pytest.fixture(scope="module")
def planted_docs(spark):
    """200 base docs; docs 0-19 each get a near-duplicate (2 token
    edits of 60 → Jaccard well above 0.8 on 5-gram shingles is NOT
    guaranteed per-pair, so ground truth is computed exactly)."""
    rng = random.Random(99)
    rows = []
    for i in range(200):
        rows.append((i, _doc(rng)))
    for i in range(20):  # planted near-dups with ids 1000+i
        rows.append((1000 + i, _perturb(rng, rows[i][1], edits=1)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def exact_pairs(planted_docs):
    """Ground truth: exact n-gram Jaccard ≥ 0.8 (recall-1 operator)."""
    got = dedup.ngram_jaccard_pairs(planted_docs, "doc_id", "text", threshold=0.8).collect()
    return {(r["id_a"], r["id_b"]) for r in got}


def test_planted_pairs_exist(exact_pairs):
    # sanity: most 1-edit copies survive the 0.8 threshold
    assert len(exact_pairs) >= 15


def test_minhash_lsh_recall_and_precision(planted_docs, exact_pairs):
    got = dedup.minhash_lsh_pairs(planted_docs, "doc_id", "text", threshold=0.8).collect()
    found = {(r["id_a"], r["id_b"]) for r in got}
    # no false positives: exact-Jaccard verification bounds every pair
    assert found <= exact_pairs
    # recall: banded 16x4 LSH at J>=0.8 must catch nearly everything
    assert len(found) >= 0.9 * len(exact_pairs)
    for r in got:
        assert r["jaccard"] >= 0.8


def test_simhash_finds_planted_dups(planted_docs, spark):
    got = dedup.simhash_pairs(planted_docs, "doc_id", "text", max_hamming=6).collect()
    found = {(r["id_a"], r["id_b"]) for r in got}
    planted = {(i, 1000 + i) for i in range(20)}
    assert len(found & planted) >= 0.9 * len(planted)
    for r in got:
        assert r["hamming"] <= 6


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zeta eta theta iota")],
        "doc_id long, text string",
    )
    got = dedup.simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in got} == {(1, 2, 0)}


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    """5 well-separated unit clusters x 40 members, dim 64."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((5, 64)) * 4.0
    rows = []
    vid = 0
    for c in centers:
        for _ in range(40):
            v = c + rng.standard_normal(64) * 0.15
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _recall_vs_brute(ann_df, brute_df) -> float:
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute_df.collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in ann_df.collect()}
    return len(got & truth) / len(truth)


def test_lsh_ann_recall(clustered_vectors):
    queries = clustered_vectors.where(F.col("vec_id") % 40 == 0)
    brute = similarity.brute_force_topk(clustered_vectors, queries, k=5)
    ann = similarity.lsh_ann_topk(clustered_vectors, queries, dim=64, k=5)
    assert _recall_vs_brute(ann, brute) >= 0.9


def test_ivf_ann_recall(clustered_vectors):
    queries = clustered_vectors.where(F.col("vec_id") % 40 == 0)
    brute = similarity.brute_force_topk(clustered_vectors, queries, k=5)
    ann = similarity.ivf_topk(clustered_vectors, queries, k=5, n_cells=8, nprobe=2)
    assert _recall_vs_brute(ann, brute) >= 0.9


def test_connected_components_match_union_find(planted_docs, exact_pairs, spark):
    """Hash-min label propagation == driver-side union-find on the same
    pair set (including a chained a~b~c component if present)."""
    comp = {
        r["id"]: r["component"]
        for r in dedup.connected_components(
            spark.createDataFrame(
                sorted(exact_pairs), "id_a long, id_b long"
            )
        ).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in sorted(exact_pairs):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in parent}
    assert comp == expected


def test_dedup_groups_singletons_and_canonicals(planted_docs, exact_pairs):
    pairs_df = dedup.ngram_jaccard_pairs(planted_docs, "doc_id", "text", threshold=0.8)
    groups = dedup.dedup_groups(planted_docs, "doc_id", pairs_df).collect()
    assert len(groups) == planted_docs.count()  # every doc assigned
    by_comp: dict[int, list] = {}
    for r in groups:
        by_comp.setdefault(r["component"], []).append(r)
    for comp_id, members in by_comp.items():
        assert comp_id == min(m["id"] for m in members)  # canonical = min id
        canon = [m for m in members if m["is_canonical"]]
        assert len(canon) == 1 and canon[0]["id"] == comp_id


def test_pq_ann_recall(clustered_vectors):
    """Product-quantization ADC + exact re-rank: recall@5 >= 0.9 vs
    brute force on clustered embeddings (8 subspaces x 16 codes)."""
    queries = clustered_vectors.where(F.col("vec_id") % 40 == 0)
    brute = similarity.brute_force_topk(clustered_vectors, queries, k=5)
    ann = similarity.pq_topk(clustered_vectors, queries, dim=64, m=8, k_codes=16, k=5)
    assert _recall_vs_brute(ann, brute) >= 0.9


def test_degenerate_bucket_capped_not_exploded(spark):
    """An adversarial corpus (many identical docs -> one giant LSH
    bucket) must NOT generate O(B^2) candidate pairs: buckets over
    max_bucket are dropped by the lineage-visible cap filter, so the
    operator returns quickly with zero pairs instead of exploding the
    stage. Distinct docs in normal-sized buckets are unaffected."""
    boiler = "lorem ipsum dolor sit amet " * 10
    rows = [(i, boiler) for i in range(50)]  # 50 identical docs
    rows += [(100 + i, f"unique text {i} " + " ".join(f"w{i}x{j}" for j in range(30)))
             for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", shingle_k=5, num_perm=64, num_bands=16,
        threshold=0.5, max_bucket=10, collapse_exact=False,
    )
    assert capped.count() == 0  # the 50-dup bucket exceeded the cap
    uncapped = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", shingle_k=5, num_perm=64, num_bands=16,
        threshold=0.5, max_bucket=1000, collapse_exact=False,
    )
    assert uncapped.count() == 50 * 49 // 2  # all identical pairs found
    # r14 default: exact-clone pre-collapse turns the 50-dup cluster
    # into ONE representative, so even the tight cap keeps recall 1
    collapsed = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", shingle_k=5, num_perm=64, num_bands=16,
        threshold=0.5, max_bucket=10,
    )
    assert collapsed.count() == 50 * 49 // 2


def test_bucket_overflow_is_reported_not_silent(spark, planted_docs):
    """The max_bucket cap loses candidate recall on degenerate corpora,
    so it must be REPORTED: overflow_report fills with the dropped
    bucket count + member mass (and a warning fires). On a clean
    fixture the same telemetry reports zero overflow — the no-silent-
    caps contract in both directions."""
    import warnings

    boiler = "lorem ipsum dolor sit amet " * 10
    rows = [(i, boiler) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    report: dict = {}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        dedup.minhash_lsh_pairs(
            df, "doc_id", "text", threshold=0.5, max_bucket=10,
            overflow_report=report, collapse_exact=False,
        ).count()
    # 50 identical docs share every band bucket: all 16 overflow
    assert report["overflow_buckets"] == 16
    assert report["overflow_member_mass"] == 16 * 50
    assert report["bucket_count"] == 16
    assert any("recall" in str(w.message) for w in caught)

    # r14 default: the collapse removes the degenerate buckets at the
    # source, so the same corpus reports zero overflow (and no warning)
    collapsed_report: dict = {}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        dedup.minhash_lsh_pairs(
            df, "doc_id", "text", threshold=0.5, max_bucket=10,
            overflow_report=collapsed_report,
        ).count()
    assert collapsed_report["overflow_buckets"] == 0
    assert not any("recall" in str(w.message) for w in caught)

    clean: dict = {}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        dedup.minhash_lsh_pairs(
            planted_docs, "doc_id", "text", threshold=0.8, overflow_report=clean
        ).count()
    assert clean["overflow_buckets"] == 0
    assert clean["overflow_member_mass"] == 0
    assert clean["bucket_count"] > 0  # the planted dups do share buckets
    assert not any("recall" in str(w.message) for w in caught)

    # the same hook on the simhash and exact-ngram families: the
    # boilerplate corpus overflows both bucketing schemes, and the
    # report certifies (or refutes) each operator's recall contract
    # collapse_exact=False: the r14 default pre-collapses the 50
    # identical docs to one representative, removing the overflow this
    # telemetry assertion exists to observe
    sim_report: dict = {}
    dedup.simhash_pairs(
        df, "doc_id", "text", max_hamming=3, max_bucket=10,
        overflow_report=sim_report, collapse_exact=False,
    ).count()
    assert sim_report["overflow_buckets"] >= 4  # all 4 pigeonhole blocks
    ngram_report: dict = {}
    dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.5, max_bucket=10,
        overflow_report=ngram_report, collapse_exact=False,
    ).count()
    assert ngram_report["overflow_buckets"] > 0  # shared boilerplate shingles

def test_fit_sample_deterministic_across_partitionings(clustered_vectors):
    """The bottom-k-by-hash codebook fit sample is content-addressed:
    identical vectors (and order) regardless of how the corpus is
    partitioned — the property df.sample lacks."""
    a = similarity.fit_sample_vectors(
        clustered_vectors.repartition(3), vec_col="embedding", id_col="vec_id", sample=64, seed=11
    )
    b = similarity.fit_sample_vectors(
        clustered_vectors.repartition(17, "vec_id"), vec_col="embedding", id_col="vec_id", sample=64, seed=11
    )
    assert len(a) == 64
    assert [list(v) for v in a] == [list(v) for v in b]


def test_pq_multiblock_matches_single_block(clustered_vectors):
    """pq_topk's (shard x chunk) block grid is a pure parallelization:
    forcing 3 query chunks x 5 code shards yields exactly the same
    neighbors as the single-block layout."""
    queries = clustered_vectors.where(F.col("vec_id") % 40 == 0)
    one = similarity.pq_topk(
        clustered_vectors, queries, dim=64, m=8, k_codes=16, k=5, query_chunk=1024, n_shards=1
    )
    many = similarity.pq_topk(
        clustered_vectors, queries, dim=64, m=8, k_codes=16, k=5, query_chunk=2, n_shards=5
    )
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert rows(one) == rows(many)


def test_cosine_near_dup_sub_buckets_invariant(clustered_vectors, spark):
    """The triangular G×G sub-bucket grid (the low-cardinality-block
    parallelism fix) is a pure re-enumeration: for G in {2, 5} the
    Arrow-matmul kernel must return EXACTLY the G=1 JVM plan's row set
    — same pairs, same floor-grid cosines — on a fixture that exercises
    same-cell and cross-cell pairs plus a zero-norm vector per block
    (ADVICE r11: the grid path previously had no committed test)."""
    zeros = spark.createDataFrame(
        [(9000, [0.0] * 64), (9001, [0.0] * 64)],
        "vec_id long, embedding array<float>",
    )
    df = clustered_vectors.union(zeros).withColumn(
        "label", (F.col("vec_id") % 2).cast("int")
    )
    kw = dict(
        id_col="vec_id", vec_col="embedding", partition_col="label", threshold=0.9
    )
    rows = lambda d: {(r["id_a"], r["id_b"], r["cosine_sim"]) for r in d.collect()}  # noqa: E731
    base = rows(similarity.cosine_near_dup_pairs(df, sub_buckets=1, **kw))
    assert len(base) > 50  # dense enough to populate every grid cell class
    assert not any(9000 in p[:2] or 9001 in p[:2] for p in base)  # zero-norm dropped
    for g in (2, 5):
        got = rows(similarity.cosine_near_dup_pairs(df, sub_buckets=g, **kw))
        # the fixture must exercise BOTH kernel branches: pairs whose
        # ids hash to the same sub-bucket (the (g,g) diagonal dedup)
        # and pairs straddling two sub-buckets (the (i<j) cells)
        cell = {
            r["vec_id"]: r["c"]
            for r in df.select(
                "vec_id", F.pmod(F.xxhash64("vec_id"), F.lit(g)).cast("int").alias("c")
            ).collect()
        }
        same = {p for p in got if cell[p[0]] == cell[p[1]]}
        assert same and (got - same), f"G={g} fixture missed a cell class"
        assert got == base, f"G={g} diverged from G=1"
    # r14: the blocked Arrow matmul kernel at G=1 (arrow_kernel=True —
    # one BLAS matmul per block, no grid fanout; what semantic dedup's
    # many-small-cells path uses) is the same re-enumeration and must
    # return exactly the JVM plan's row set, zero-norm drops included.
    got = rows(
        similarity.cosine_near_dup_pairs(df, sub_buckets=1, arrow_kernel=True, **kw)
    )
    assert got == base, "arrow_kernel G=1 diverged from JVM G=1"


def test_cosine_near_dup_sub_buckets_rejects_non_integral_id(clustered_vectors):
    """sub_buckets>1 hardcodes an int64 kernel schema; a string id must
    fail fast instead of silently changing the output contract with G
    (ADVICE r11)."""
    df = clustered_vectors.select(
        F.col("vec_id").cast("string").alias("vec_id"),
        "embedding",
        F.lit(0).alias("label"),
    )
    with pytest.raises(ValueError, match="integral id column"):
        similarity.cosine_near_dup_pairs(
            df, id_col="vec_id", vec_col="embedding",
            partition_col="label", sub_buckets=2,
        )


def test_semantic_dedup_finds_planted_dups(clustered_vectors, spark):
    """SemDeDup: exact planted duplicates (identical vectors, new ids)
    always share a k-means cell, so recall on them is 1; nothing below
    the cosine threshold is emitted."""
    dups = clustered_vectors.where(F.col("vec_id") % 40 == 3).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    df = clustered_vectors.union(dups)
    pairs = similarity.semantic_dedup_pairs(
        df, id_col="vec_id", vec_col="embedding", n_cells=8, threshold=0.99
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted = {(i, i + 10_000) for i in range(3, 200, 40)}
    assert planted <= got  # every planted dup found
    for r in pairs.collect():
        assert r["cosine_sim"] >= 0.99


def test_contamination_flags_eval_copies(spark):
    """A corpus doc that copies an eval doc's text is flagged with the
    full shared-shingle count; clean docs report zero."""
    from reciping_data_pipeline_spark.operators.dedup import contamination

    ev = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),  # full copy
            (2, "xx alpha beta gamma delta epsilon yy"),     # one shared 5-gram
            (3, "totally different words here no overlap at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["shared_ngrams"], r["contaminated"])
           for r in contamination(corpus, ev, n_gram=5).collect()}
    assert got[1] == (3, True)   # 7 tokens -> 3 distinct 5-grams, all shared
    assert got[2] == (1, True)
    assert got[3] == (0, False)


def test_incremental_dedup_against_index(spark):
    """Delta-batch dedup: drops new docs whose fingerprint is already
    in the corpus index, keeps min-id within the batch, never re-reads
    corpus text."""
    from reciping_data_pipeline_spark.functions import text as T
    from reciping_data_pipeline_spark.operators.dedup import incremental_exact_dedup

    existing = spark.createDataFrame(
        [(1, "Already in the corpus!")], "doc_id long, text string"
    ).select(T.fingerprint(F.col("text")).alias("fingerprint"))
    new_batch = spark.createDataFrame(
        [
            (10, "already in the corpus"),   # dup of index (normalized)
            (11, "brand new document"),
            (12, "brand new document"),      # in-batch dup of 11
            (13, "another fresh one"),
        ],
        "doc_id long, text string",
    )
    kept = incremental_exact_dedup(new_batch, existing)
    assert sorted(r["doc_id"] for r in kept.collect()) == [11, 13]


def test_contamination_empty_eval_set(spark):
    """An empty eval set flags nothing — every corpus doc reports zero
    shared n-grams (left-join null path)."""
    from reciping_data_pipeline_spark.operators.dedup import contamination

    ev = spark.createDataFrame([], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "some words here for the corpus doc")], "doc_id long, text string"
    )
    got = contamination(corpus, ev, n_gram=5).collect()
    assert [(r["doc_id"], r["shared_ngrams"], r["contaminated"]) for r in got] == [(1, 0, False)]


def test_incremental_dedup_empty_index(spark):
    """First-ever ingest: an empty index keeps every in-batch-unique doc."""
    from reciping_data_pipeline_spark.operators.dedup import incremental_exact_dedup

    idx = spark.createDataFrame([], "fingerprint string")
    batch = spark.createDataFrame(
        [(1, "first doc"), (2, "second doc"), (3, "first doc")], "doc_id long, text string"
    )
    kept = sorted(r["doc_id"] for r in incremental_exact_dedup(batch, idx).collect())
    assert kept == [1, 2]


def test_incremental_minhash_dedup_delta_vs_index(spark, planted_docs):
    """The incremental near-dup path: a delta probed against the
    persisted band index must flag exact copies and perturbed
    near-dups of indexed docs as duplicates (matched to the right
    corpus doc), and pass token-reversed / novel docs through as
    non-duplicates with the (-1, 0.0) sentinel."""
    import pyspark.sql.functions as F

    corpus = planted_docs.where(F.col("doc_id") < 1000)
    index = dedup.build_minhash_index(corpus, "doc_id", "text")
    base = {r["doc_id"]: r["text"] for r in corpus.collect()}
    rng = random.Random(7)
    delta_rows = [
        (5000, base[3]),                       # exact copy of doc 3
        (5001, _perturb(rng, base[7], edits=1)),  # near-dup of doc 7
        (5002, " ".join(reversed(base[11].split()))),  # reversed: novel
        (5003, _doc(rng)),                     # brand-new doc
    ]
    delta = spark.createDataFrame(delta_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["is_dup"], r["matched_id"], r["jaccard"])
        for r in dedup.incremental_minhash_dedup(
            delta, corpus, index, "doc_id", "text"
        ).collect()
    }
    assert got[5000] == (True, 3, 1.0)
    is_dup, matched, j = got[5001]
    assert is_dup and matched == 7 and 0.5 <= j < 1.0
    assert got[5002] == (False, -1, 0.0)
    assert got[5003] == (False, -1, 0.0)


def test_bucketed_band_index_probe_shuffles_only_delta(spark, planted_docs, tmp_path):
    """The 100 TB posture of incremental near-dup dedup: with the band
    index persisted BUCKETED on (band_idx, band_hash), the delta probe
    join must not exchange the index side — only the (small) delta's
    postings shuffle. The index-side scan reports its bucket
    distribution and Catalyst elides that exchange."""
    import pyspark.sql.functions as F

    from reciping_data_pipeline_spark.sources import bucketing

    corpus = planted_docs.where(F.col("doc_id") < 1000)
    idx = dedup.build_minhash_index(corpus, "doc_id", "text")
    bucketing.write_bucketed(
        idx, "band_index_bucketed", str(tmp_path / "band_index"),
        ["band_idx", "band_hash"], n_buckets=8,
    )
    index = bucketing.read_bucketed(spark, "band_index_bucketed")
    delta = planted_docs.where(F.col("doc_id") >= 1000)
    delta_bands = dedup.build_minhash_index(delta, "doc_id", "text")
    # at test scale the index would be broadcast (also exchange-free);
    # disable broadcast to exercise the big-index regime the bucketed
    # layout exists for
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        probe = delta_bands.alias("d").join(index.alias("i"), ["band_idx", "band_hash"])
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # the index side reads its buckets directly: exactly ONE exchange
    # in the join (the delta side), and the index scan advertises its
    # bucketed output partitioning
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Bucketed: true" in plan, plan


def test_incremental_semantic_dedup_delta_vs_celled_corpus(spark, clustered_vectors):
    """The embedding sibling of the incremental minhash probe: a delta
    checked against a CELLED corpus through the persisted codebook must
    flag exact copies (matched to the right vector at cosine 1.0) and
    near-copies, and pass far vectors through with the (-1, 0.0)
    sentinel."""
    corpus_raw = clustered_vectors.where(F.col("vec_id") < 100)
    cent = similarity.fit_spherical_centroids(
        corpus_raw, vec_col="embedding", id_col="vec_id", n_cells=4, sample=64, seed=11
    )
    corpus = similarity.assign_cells(corpus_raw, cent, vec_col="embedding")
    base = {r["vec_id"]: r["embedding"] for r in corpus_raw.where(F.col("vec_id").isin(3, 7)).collect()}
    near7 = [float(x) + 0.001 for x in base[7]]
    far = [float(-x) * 3.0 for x in base[3]]
    delta = spark.createDataFrame(
        [(5000, base[3]), (5001, near7), (5002, far)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["is_dup"], r["matched_id"], r["cosine"])
        for r in similarity.incremental_semantic_dedup(
            delta, corpus, cent, threshold=0.95
        ).collect()
    }
    assert got[5000] == (True, 3, 1.0)
    is_dup, matched, cos = got[5001]
    assert is_dup and matched == 7 and cos >= 0.95
    assert got[5002] == (False, -1, 0.0)


def test_cell_bucketed_semantic_probe_shuffles_only_delta(spark, clustered_vectors, tmp_path):
    """100 TB posture of incremental semantic dedup: with the celled
    corpus persisted BUCKETED on cell, the delta probe join must not
    exchange the corpus side — only the delta shuffles."""
    from reciping_data_pipeline_spark.sources import bucketing

    corpus_raw = clustered_vectors.where(F.col("vec_id") < 100)
    cent = similarity.fit_spherical_centroids(
        corpus_raw, vec_col="embedding", id_col="vec_id", n_cells=4, sample=64, seed=11
    )
    celled = similarity.assign_cells(corpus_raw, cent, vec_col="embedding")
    bucketing.write_bucketed(
        celled, "semantic_corpus_bucketed", str(tmp_path / "sem_corpus"),
        ["cell"], n_buckets=4,
    )
    corpus = bucketing.read_bucketed(spark, "semantic_corpus_bucketed")
    delta = similarity.assign_cells(
        clustered_vectors.where(F.col("vec_id") >= 100), cent, vec_col="embedding"
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        probe = delta.alias("d").join(corpus.alias("c"), on="cell")
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Bucketed: true" in plan, plan
