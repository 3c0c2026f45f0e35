"""Streaming-surface tests.

- availableNow file-source stream drains the staging fixture into the
  same silver table the batch path builds, row-for-row (shared
  transform ⇒ no batch/stream drift), and a second run from the same
  checkpoint adds nothing (exactly-once via checkpoint + idempotent
  apply).
- dropDuplicatesWithinWatermark drops duplicates inside the watermark
  on a real stream (memory sink).
- session_window gap semantics pinned on a batch frame against the
  lag-based batch sessionization.
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from reciping_data_pipeline_spark.pipeline import datagen, silver
from reciping_data_pipeline_spark.streaming import ingest, ops

START = datetime(2025, 9, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def stream_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("streamfix"))
    fix = datagen.generate_fixture(root, seed=11, n_users=25, n_days=2, start=START)
    return {"root": root, **fix}


def _drain(query):
    query.awaitTermination(120)
    assert not query.isActive


def test_stream_matches_batch_silver(spark, stream_fixture, tmp_path):
    wh_stream = str(tmp_path / "wh_stream")
    ckpt = str(tmp_path / "ckpt")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        q = ingest.start_silver_stream(
            spark, stream_fixture["staging_dir"], wh_stream, ckpt, available_now=True
        )
        _drain(q)
        got = silver.read_silver(spark, wh_stream)
        n_stream = got.count()
        assert n_stream > 0
        assert got.select("event_id").distinct().count() == n_stream

        # Batch path over the same staging files → identical event set.
        from reciping_data_pipeline_spark.pipeline import bronze

        wh_batch = str(tmp_path / "wh_batch")
        bronze.ingest_bulk(spark, stream_fixture["staging_dir"], wh_batch, START)
        batch_silver = silver.run_batch(spark, wh_batch, batch_ts=START)
        assert batch_silver.count() == n_stream

        # Restart from the same checkpoint: nothing new to process.
        q2 = ingest.start_silver_stream(
            spark, stream_fixture["staging_dir"], wh_stream, ckpt, available_now=True
        )
        _drain(q2)
        assert silver.read_silver(spark, wh_stream).count() == n_stream
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_dedup_within_watermark_stream(spark, tmp_path):
    """Feed duplicate event_ids through a rate-limited file stream and
    assert the stateful dedup emits each id once."""
    import json

    import pyspark.sql.functions as F

    src = tmp_path / "src"
    src.mkdir()
    rows = []
    for i in range(20):
        rows.append({"event_id": f"e{i:03d}", "user_id": "u1", "ts": f"2025-09-01 10:{i:02d}:00"})
        rows.append({"event_id": f"e{i:03d}", "user_id": "u1", "ts": f"2025-09-01 10:{i:02d}:30"})  # dup
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.format("json")
        .schema("event_id string, user_id string, ts string")
        .load(str(src))
        .withColumn("kst_timestamp", F.to_timestamp("ts"))
    )
    deduped = ops.dedup_within_watermark(stream, delay="2 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_sink").collect()[0]
    assert got["n"] == 20 and got["d"] == 20


def test_session_window_matches_gap_sessionization(spark):
    """session_window(30 min) session count per user == lag-based
    cumulative-sum sessionization on the same batch data."""
    import pyspark.sql.functions as F

    rows = [
        ("u1", "2025-09-01 10:00:00"),
        ("u1", "2025-09-01 10:10:00"),  # same session
        ("u1", "2025-09-01 11:30:00"),  # new session (>30 min gap)
        ("u2", "2025-09-01 09:00:00"),
        ("u2", "2025-09-01 09:29:59"),  # same session
        ("u2", "2025-09-01 23:00:00"),  # new session
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string").withColumn(
        "kst_timestamp", F.to_timestamp("ts")
    )
    sessions = ops.session_aggregate(df, gap="30 minutes")
    per_user = {r["user_id"]: r["n"] for r in sessions.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert per_user == {"u1": 2, "u2": 2}
    total_events = sessions.agg(F.sum("n_events")).collect()[0][0]
    assert total_events == 6


def test_windowed_counts_batch_semantics(spark):
    import pyspark.sql.functions as F

    rows = [("e1", "u1", "view", "2025-09-01 10:01:00"), ("e2", "u1", "view", "2025-09-01 10:14:59"),
            ("e3", "u2", "click", "2025-09-01 10:16:00")]
    df = spark.createDataFrame(rows, "event_id string, user_id string, event_name string, ts string").withColumn(
        "kst_timestamp", F.to_timestamp("ts")
    )
    out = ops.windowed_event_counts(df, window="15 minutes")
    got = {(r["win"]["start"].minute, r["event_name"]): r["event_count"] for r in out.collect()}
    assert got == {(0, "view"): 2, (15, "click"): 1}


def test_stream_to_gold_end_to_end(spark, tmp_path):
    """Full streaming medallion: bulk bootstrap (day 1) then stream day
    2 with also_gold=True — fact grows by exactly the streamed silver
    rows, and new users are upserted into dim_user."""
    from reciping_data_pipeline_spark.pipeline import datagen, dims, gold, runner

    fix_a = datagen.generate_fixture(str(tmp_path / "a"), seed=31, n_users=20, n_days=1, start=datetime(2025, 9, 1))
    fix_b = datagen.generate_fixture(str(tmp_path / "b"), seed=32, n_users=25, n_days=1, start=datetime(2025, 9, 2))
    wh = str(tmp_path / "wh")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        runner.bulk_backfill(
            spark, fix_a["staging_dir"], wh, fix_a["recipe_master"], datetime(2025, 9, 2),
            time_dim_range=("2025-09-01 00:00:00", "2025-09-03 23:00:00"),
        )
        fact_before = gold.read_fact(spark, wh).count()
        users_before = dims.read_dim(spark, wh, "dim_user").count()
        q = ingest.start_silver_stream(
            spark, fix_b["staging_dir"], wh, str(tmp_path / "ck"), available_now=True, also_gold=True
        )
        _drain(q)
        streamed_silver = (
            silver.read_silver(spark, wh).count()
            - fact_before  # day-1 silver == day-1 fact rows
        )
        fact_after = gold.read_fact(spark, wh)
        assert fact_after.count() == fact_before + streamed_silver
        assert dims.read_dim(spark, wh, "dim_user").count() > users_before
        # streamed rows resolve FKs like batch rows; event types unseen
        # on day 1 legitimately miss dim_event (only dim_user upserts
        # incrementally — reference behavior), so near-1 not exactly 1.
        assert gold.join_success_rates(fact_after)["event_dim_key"] >= 0.95
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_running_user_stats_stateful_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    two files forced into separate triggers (maxFilesPerTrigger=1) must
    yield final cumulative counts equal to the batch groupBy over the
    union — and the second batch's update rows must continue (not
    restart) the counts."""
    import json

    import pyspark.sql.functions as F

    src = tmp_path / "src"
    src.mkdir()
    batch1 = [
        {"user_id": f"u{i % 3}", "ts": f"2025-09-01 10:0{i}:00"} for i in range(6)
    ]
    batch2 = [
        {"user_id": f"u{i % 2}", "ts": f"2025-09-01 11:0{i}:00"} for i in range(6)
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in batch1))
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in batch2))

    stream = (
        spark.readStream.format("json")
        .schema("user_id string, ts string")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
        .withColumn("kst_timestamp", F.to_timestamp("ts"))
    )
    q = (
        ops.running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)

    # Update-mode sink holds one row per (user, micro-batch); the row
    # with the max count per user is the final state.
    final = {
        r["user_id"]: (r["n_events"], r["first_seen"], r["last_seen"])
        for r in spark.sql(
            """SELECT user_id, n_events, first_seen, last_seen FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) AS rn
                 FROM user_stats_sink) WHERE rn = 1"""
        ).collect()
    }

    batch_df = (
        spark.read.format("json")
        .schema("user_id string, ts string")
        .load(str(src))
        .withColumn("kst_timestamp", F.to_timestamp("ts"))
    )
    expected = {
        r["user_id"]: (r["n_events"], r["first_seen"], r["last_seen"])
        for r in ops.running_user_stats(batch_df).collect()
    }
    assert final == expected

    # State really crossed batches: u0/u1 appear in both files, so the
    # sink must hold two distinct cumulative counts for each.
    per_user_updates = {
        r["user_id"]: r["n"]
        for r in spark.sql(
            "SELECT user_id, count(*) AS n FROM user_stats_sink GROUP BY user_id"
        ).collect()
    }
    assert per_user_updates["u0"] == 2 and per_user_updates["u1"] == 2


def test_stream_stream_attribution_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (impressions x clicks, 60-min
    horizon, watermarks both sides) emits exactly the pairs the
    identical batch join produces."""
    import json

    import pyspark.sql.functions as F

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir()
    clk_dir.mkdir()
    imps, clks = [], []
    for i in range(12):
        imps.append(
            {"event_id": f"i{i:02d}", "user_id": f"u{i % 4}", "ts": f"2025-09-01 10:{i * 4:02d}:00"}
        )
    # clicks: some inside the horizon, one before any impression, one
    # >60 min after its user's impressions, one for an unknown user
    clks = [
        {"event_id": "c00", "user_id": "u0", "ts": "2025-09-01 10:05:00"},
        {"event_id": "c01", "user_id": "u1", "ts": "2025-09-01 10:30:00"},
        {"event_id": "c02", "user_id": "u2", "ts": "2025-09-01 09:00:00"},
        {"event_id": "c03", "user_id": "u3", "ts": "2025-09-01 13:00:00"},
        {"event_id": "c04", "user_id": "u9", "ts": "2025-09-01 10:10:00"},
    ]
    (imp_dir / "a.json").write_text("\n".join(json.dumps(r) for r in imps))
    (clk_dir / "a.json").write_text("\n".join(json.dumps(r) for r in clks))

    schema = "event_id string, user_id string, ts string"

    def load(path, streaming):
        reader = (
            spark.readStream.format("json").schema(schema).load(str(path))
            if streaming
            else spark.read.format("json").schema(schema).load(str(path))
        )
        return reader.withColumn("kst_timestamp", F.to_timestamp("ts"))

    joined = ops.attributed_clicks(load(imp_dir, True), load(clk_dir, True))
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["imp_id"], r["click_id"], r["lag_seconds"])
        for r in spark.sql("SELECT * FROM attr_sink").collect()
    }
    want = {
        (r["imp_id"], r["click_id"], r["lag_seconds"])
        for r in ops.attributed_clicks(load(imp_dir, False), load(clk_dir, False)).collect()
    }
    assert got == want
    assert len(want) > 0
    # the out-of-horizon / unknown-user clicks never appear
    assert not any(c in ("c02", "c04") for _, c, _ in want)


def test_corpus_stream_dedups_across_batches(spark, tmp_path):
    """Streaming corpus ingest: two delivery waves (the second re-offers
    wave-1 files plus new docs with duplicate text) must converge to the
    same corpus as a single-pass batch exact dedup over all unique
    lines — state lives in the corpus fingerprint index, not a state
    store."""
    import json

    from reciping_data_pipeline_spark.operators import dedup as D
    from reciping_data_pipeline_spark.streaming import ingest

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    def write_wave(name, docs):
        with open(incoming / name, "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")

    write_wave(
        "wave1.jsonl",
        [
            {"doc_id": 1, "source": "web", "text": "the quick brown fox"},
            {"doc_id": 2, "source": "web", "text": "jumps over the lazy dog"},
            {"doc_id": 3, "source": "web", "text": "The quick brown fox!"},  # dup of 1
        ],
    )
    q = ingest.start_corpus_stream(spark, str(incoming), corpus_dir, ckpt)
    q.awaitTermination(60)

    write_wave(
        "wave2.jsonl",
        [
            {"doc_id": 4, "source": "books", "text": "jumps over the lazy dog"},  # dup of 2
            {"doc_id": 5, "source": "books", "text": "an entirely new document"},
        ],
    )
    q = ingest.start_corpus_stream(spark, str(incoming), corpus_dir, ckpt)
    q.awaitTermination(60)

    corpus = spark.read.parquet(corpus_dir)
    kept = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    assert kept == [1, 2, 5]
    # equivalence with the one-shot batch dedup over all delivered docs
    all_docs = spark.read.format("json").schema("doc_id long, source string, text string") \
        .option("pathGlobFilter", "*.jsonl").load(str(incoming))
    batch_kept = sorted(
        r["doc_id"] for r in D.exact_dedup(all_docs, "doc_id", "text").select("doc_id").collect()
    )
    assert kept == batch_kept


def test_near_dup_corpus_stream_across_batches(spark, tmp_path):
    """Streaming NEAR-dup corpus ingest: survivors append to both the
    corpus and its band index, so later batches drop exact copies AND
    near-duplicates of earlier batches' docs without rescanning the
    corpus; novel docs pass through."""
    import json
    import random

    from reciping_data_pipeline_spark.streaming import ingest

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    n_persistent_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    rng = random.Random(42)
    words = [f"w{i}" for i in range(300)]
    doc_a = " ".join(rng.choice(words) for _ in range(60))
    doc_b = " ".join(rng.choice(words) for _ in range(60))
    doc_c = " ".join(rng.choice(words) for _ in range(60))
    near_a = doc_a.split()
    near_a[10] = "zzz"  # one token edit: J >= 51/61 on 5-gram shingles
    near_a = " ".join(near_a)

    def write_wave(name, docs):
        with open(incoming / name, "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")

    write_wave(
        "wave1.jsonl",
        [
            {"doc_id": 1, "source": "web", "text": doc_a},
            {"doc_id": 2, "source": "web", "text": doc_b},
        ],
    )
    q = ingest.start_near_dup_corpus_stream(
        spark, str(incoming), corpus_dir, index_dir, ckpt
    )
    q.awaitTermination(60)

    write_wave(
        "wave2.jsonl",
        [
            {"doc_id": 3, "source": "web", "text": near_a},  # near-dup of 1
            {"doc_id": 4, "source": "books", "text": doc_b},  # exact copy of 2
            {"doc_id": 5, "source": "books", "text": doc_c},  # novel
            {"doc_id": 6, "source": "books", "text": doc_c},  # in-batch copy of 5
        ],
    )
    q = ingest.start_near_dup_corpus_stream(
        spark, str(incoming), corpus_dir, index_dir, ckpt
    )
    q.awaitTermination(60)

    corpus = spark.read.parquet(corpus_dir)
    kept = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    assert kept == [1, 2, 5]
    # the index grew with exactly the survivors' postings
    index = spark.read.parquet(index_dir)
    assert sorted(r["id"] for r in index.select("id").distinct().collect()) == [1, 2, 5]
    # cache-leak regression (r07): each micro-batch's candidate persist
    # must be RELEASED after the batch's writes (cache_registry
    # unpersist in process_batch) — a long-lived stream must not
    # accumulate one CacheManager entry per batch. Two batches ran, so
    # a leak would show as >= 2 extra persistent RDDs vs the session's
    # pre-existing ones (captured at test start below).
    n_persistent_after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert n_persistent_after - n_persistent_before == 0, (
        n_persistent_before,
        n_persistent_after,
    )


def test_near_dup_corpus_stream_redelivery_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a fully-committed doc re-offered
    in a later batch (same bytes, new file) must not re-commit. The
    short doc (< shingle_k tokens) is the hard case — the Jaccard
    verifier can never flag it, so only the exact-fingerprint guard
    against the corpus catches its redelivery."""
    import json

    from reciping_data_pipeline_spark.streaming import ingest

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    docs = [
        {"doc_id": 1, "source": "web", "text": "tiny doc"},  # too short to shingle
        {"doc_id": 2, "source": "web", "text": " ".join(f"w{i}" for i in range(40))},
    ]
    with open(incoming / "wave1.jsonl", "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    q = ingest.start_near_dup_corpus_stream(spark, str(incoming), corpus_dir, index_dir, ckpt)
    q.awaitTermination(60)

    # redelivery: identical docs arrive again as a NEW file (fresh ids
    # model an upstream producer re-emitting with new surrogate keys;
    # same ids would also be caught — fingerprints match either way)
    with open(incoming / "wave1_replayed.jsonl", "w") as f:
        for d in docs:
            f.write(json.dumps({**d, "doc_id": d["doc_id"] + 100}) + "\n")
    q = ingest.start_near_dup_corpus_stream(spark, str(incoming), corpus_dir, index_dir, ckpt)
    q.awaitTermination(60)

    corpus = spark.read.parquet(corpus_dir)
    assert sorted(r["doc_id"] for r in corpus.select("doc_id").collect()) == [1, 2]


def test_semantic_dedup_corpus_stream_across_batches(spark, tmp_path):
    """Streaming SEMANTIC (embedding-cosine) corpus ingest: the first
    batch bootstraps the centroid codebook and seeds the corpus; later
    batches drop exact copies AND near-duplicates (cosine >= threshold,
    within-cell) of earlier batches' vectors without re-clustering;
    novel vectors pass; zero-norm vectors (cosine undefined) survive
    once and their redelivery is caught by the fingerprint guard —
    stream outcome == the one-shot incremental_semantic_dedup batch
    verdicts over the same deltas."""
    import json

    import numpy as np

    import pyspark.sql.functions as F
    from reciping_data_pipeline_spark.operators import similarity
    from reciping_data_pipeline_spark.sources import writers
    from reciping_data_pipeline_spark.streaming import ingest

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    centroids_dir = str(tmp_path / "centroids")
    ckpt = str(tmp_path / "ckpt")

    rng = np.random.default_rng(3)
    base = rng.standard_normal((3, 16)) * 3.0  # well-separated
    near_0 = base[0] + rng.standard_normal(16) * 0.01  # cosine ~ 1 vs base[0]
    novel = -base[1] * 2.0  # cosine -1 vs base[1], far from all

    def write_wave(name, rows):
        with open(incoming / name, "w") as f:
            for vid, v in rows:
                f.write(json.dumps({"vec_id": vid, "embedding": [float(x) for x in v]}) + "\n")

    write_wave("wave1.jsonl", [(1, base[0]), (2, base[1]), (3, base[2])])
    q = ingest.start_semantic_dedup_corpus_stream(
        spark, str(incoming), corpus_dir, centroids_dir, ckpt, n_cells=3
    )
    q.awaitTermination(60)

    wave2 = [
        (4, near_0),          # near-dup of 1
        (5, base[1]),         # exact copy of 2
        (6, novel),           # novel
        (7, novel),           # in-batch copy of 6
        (8, np.zeros(16)),    # zero-norm: cosine undefined, survives
    ]
    write_wave("wave2.jsonl", wave2)
    q = ingest.start_semantic_dedup_corpus_stream(
        spark, str(incoming), corpus_dir, centroids_dir, ckpt, n_cells=3
    )
    q.awaitTermination(60)

    corpus = spark.read.parquet(corpus_dir)
    kept = sorted(r["vec_id"] for r in corpus.select("vec_id").collect())
    assert kept == [1, 2, 3, 6, 8]

    # redelivery: wave2 re-offered byte-identical as a new file — the
    # fingerprint guard must drop everything, including the zero vector
    write_wave("wave2_replayed.jsonl", wave2)
    q = ingest.start_semantic_dedup_corpus_stream(
        spark, str(incoming), corpus_dir, centroids_dir, ckpt, n_cells=3
    )
    q.awaitTermination(60)
    corpus = spark.read.parquet(corpus_dir)
    assert sorted(r["vec_id"] for r in corpus.select("vec_id").collect()) == [1, 2, 3, 6, 8]

    # stream == batch: the committed codebook + celled wave-1 corpus fed
    # to the one-shot operator reproduces the wave-2 verdicts
    cent = similarity.centroids_from_df(writers.read_table(spark, centroids_dir))
    wave1_corpus = corpus.where(F.col("vec_id") <= 3).select("vec_id", "embedding", "cell")
    delta = spark.createDataFrame(
        [(vid, [float(x) for x in v]) for vid, v in wave2 if vid != 7],  # post in-batch dedup
        "vec_id long, embedding array<double>",
    )
    verdicts = {
        r["vec_id"]: (r["is_dup"], r["matched_id"])
        for r in similarity.incremental_semantic_dedup(
            delta, wave1_corpus, cent, threshold=0.95
        ).collect()
    }
    assert verdicts[4] == (True, 1)
    assert verdicts[5] == (True, 2)
    assert verdicts[6] == (False, -1)
    assert verdicts[8] == (False, -1)


def test_near_dup_corpus_stream_orphan_postings_window(spark, tmp_path):
    """Crash-window semantics: the index is committed BEFORE the corpus,
    so the reachable inconsistent state is orphan index postings with no
    corpus row. A doc delivered into that state must still commit
    exactly one corpus row (the orphan candidate match is dropped by the
    corpus-text semi-join, the orphan postings stay harmless)."""
    import json

    from reciping_data_pipeline_spark.operators import dedup as D
    from reciping_data_pipeline_spark.sources import writers
    from reciping_data_pipeline_spark.streaming import ingest

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    text = " ".join(f"w{i}" for i in range(40))
    doc = spark.createDataFrame(
        [(1, "web", text)], "doc_id long, source string, text string"
    )
    # simulate the crash: postings committed, corpus row lost
    writers.append_table(D.build_minhash_index(doc, "doc_id", "text"), index_dir)
    # bootstrap an EMPTY corpus table with the stream's schema so the
    # replayed batch reads it (a missing table would also work — this
    # pins the harder path where the table exists but lacks the doc)
    writers.overwrite_table(
        spark.createDataFrame(
            [], "doc_id long, source string, text string, fingerprint string"
        ),
        corpus_dir,
    )
    with open(incoming / "wave1.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 1, "source": "web", "text": text}) + "\n")
    q = ingest.start_near_dup_corpus_stream(spark, str(incoming), corpus_dir, index_dir, ckpt)
    q.awaitTermination(60)

    corpus = spark.read.parquet(corpus_dir)
    assert [r["doc_id"] for r in corpus.select("doc_id").collect()] == [1]
    # duplicate postings for doc 1 exist (orphans + the replay's) — they
    # are tolerated by DISTINCT candidate generation, never deduped away
    index = spark.read.parquet(index_dir)
    assert index.select("id").distinct().count() == 1


def test_near_dup_corpus_stream_migrates_legacy_corpus(spark, tmp_path):
    """Resume against a pre-fingerprint corpus (written before r07 added
    the column): the stream must backfill the fingerprint column by a
    one-time rewrite — not fail on corpus.select("fingerprint"), and
    not append mixed-schema parquet — and the backfilled fingerprints
    must still drop an exact redelivery of a legacy doc."""
    import json
    import random

    from reciping_data_pipeline_spark.operators import dedup as dedup_ops
    from reciping_data_pipeline_spark.sources import writers
    from reciping_data_pipeline_spark.streaming import ingest

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    rng = random.Random(7)
    words = [f"w{i}" for i in range(300)]
    doc_a = " ".join(rng.choice(words) for _ in range(60))
    doc_c = " ".join(rng.choice(words) for _ in range(60))

    # Legacy state: corpus WITHOUT the fingerprint column + its index.
    legacy = spark.createDataFrame(
        [(1, "web", doc_a)], "doc_id long, source string, text string"
    )
    writers.overwrite_table(legacy, corpus_dir)
    writers.overwrite_table(
        dedup_ops.build_minhash_index(legacy, "doc_id", "text"), index_dir
    )

    with open(incoming / "wave.jsonl", "w") as f:
        # doc 2: exact copy of legacy doc 1 (must be dropped by the
        # BACKFILLED fingerprint guard); doc 3: novel (must survive).
        f.write(json.dumps({"doc_id": 2, "source": "web", "text": doc_a}) + "\n")
        f.write(json.dumps({"doc_id": 3, "source": "web", "text": doc_c}) + "\n")
    q = ingest.start_near_dup_corpus_stream(
        spark, str(incoming), corpus_dir, index_dir, ckpt
    )
    q.awaitTermination(60)

    corpus = spark.read.parquet(corpus_dir)
    assert "fingerprint" in corpus.columns
    rows = {r["doc_id"]: r["fingerprint"] for r in corpus.collect()}
    assert sorted(rows) == [1, 3]
    assert all(fp is not None for fp in rows.values())
    # the migration commit leaves no orphaned stage dir behind
    assert not (tmp_path / "corpus.__migrate__").exists()


def test_near_dup_corpus_stream_recovers_crashed_migration(spark, tmp_path):
    """Crash-window recovery for the legacy-corpus migration (ADVICE
    r08): simulate a migration that died AFTER the backfilled table
    landed in the ``.__migrate__`` stage dir and AFTER corpus_dir was
    cleared, but BEFORE the rename committed. On restart the stream
    must restore the stage dir — not fall through to an empty corpus,
    which would silently drop the legacy docs and their fingerprint
    redelivery guard."""
    import json
    import random
    import shutil

    import pyspark.sql.functions as F

    from reciping_data_pipeline_spark.functions import text as text_fns
    from reciping_data_pipeline_spark.operators import dedup as dedup_ops
    from reciping_data_pipeline_spark.sources import writers
    from reciping_data_pipeline_spark.streaming import ingest

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    stage_dir = str(tmp_path / "corpus.__migrate__")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    rng = random.Random(11)
    words = [f"w{i}" for i in range(300)]
    doc_a = " ".join(rng.choice(words) for _ in range(60))
    doc_c = " ".join(rng.choice(words) for _ in range(60))

    legacy = spark.createDataFrame(
        [(1, "web", doc_a)], "doc_id long, source string, text string"
    )
    writers.overwrite_table(
        legacy.withColumn("fingerprint", text_fns.fingerprint(F.col("text"))),
        stage_dir,
    )
    writers.overwrite_table(
        dedup_ops.build_minhash_index(legacy, "doc_id", "text"), index_dir
    )
    # corpus_dir cleared mid-migration; the stage dir is the only copy
    shutil.rmtree(corpus_dir, ignore_errors=True)

    with open(incoming / "wave.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 2, "source": "web", "text": doc_a}) + "\n")
        f.write(json.dumps({"doc_id": 3, "source": "web", "text": doc_c}) + "\n")
    q = ingest.start_near_dup_corpus_stream(
        spark, str(incoming), corpus_dir, index_dir, ckpt
    )
    q.awaitTermination(60)

    corpus = spark.read.parquet(corpus_dir)
    rows = {r["doc_id"]: r["fingerprint"] for r in corpus.collect()}
    # doc 2 (exact redelivery of legacy doc 1) dropped by the RESTORED
    # fingerprint guard; doc 3 novel and committed
    assert sorted(rows) == [1, 3]
    assert all(fp is not None for fp in rows.values())
    assert not (tmp_path / "corpus.__migrate__").exists()


# ---------------------------------------------------------------------------
# Common crash-window harness (VERDICT r07 #8): both corpus-ingest
# streams run the SAME adversarial scenario — phase-1 side state
# committed but the corpus append lost (kill between foreachBatch
# phases), then delivery, then byte-identical redelivery. The adapter
# pins each stream's claimed inconsistent-state contract:
#   near-dup:  (index postings BEFORE corpus) → orphan postings only
#   semantic:  (centroid codebook BEFORE corpus, bootstrap batch only)
#              → orphan codebook; replay must REUSE it, never refit
# A stream whose commit ordering regresses (corpus first) would commit
# duplicate corpus rows here and fail the exactly-once assertion.


class _NearDupAdapter:
    name = "near_dup"
    expected_ids = [1, 2]

    def wave(self):
        text_a = " ".join(f"w{i}" for i in range(40))
        text_b = " ".join(f"v{i}" for i in range(40))
        return [
            {"doc_id": 1, "source": "web", "text": text_a},
            {"doc_id": 2, "source": "web", "text": text_b},
        ]

    def write_wave(self, incoming, fname, rows):
        import json

        with open(incoming / fname, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def seed_phase1_only(self, spark, tmp):
        from reciping_data_pipeline_spark.operators import dedup as D
        from reciping_data_pipeline_spark.sources import writers

        rows = self.wave()
        df = spark.createDataFrame(
            [(r["doc_id"], r["source"], r["text"]) for r in rows],
            "doc_id long, source string, text string",
        )
        writers.append_table(
            D.build_minhash_index(df, "doc_id", "text"), str(tmp / "index")
        )

    def start(self, spark, incoming, tmp):
        from reciping_data_pipeline_spark.streaming import ingest

        return ingest.start_near_dup_corpus_stream(
            spark, str(incoming), str(tmp / "corpus"), str(tmp / "index"),
            str(tmp / "ckpt"),
        )

    def committed_ids(self, spark, tmp):
        return sorted(
            r["doc_id"]
            for r in spark.read.parquet(str(tmp / "corpus")).select("doc_id").collect()
        )

    def orphan_state_still_consistent(self, spark, tmp):
        # orphan + replayed postings are tolerated duplicates, never a
        # second distinct id
        idx = spark.read.parquet(str(tmp / "index"))
        assert sorted(
            r["id"] for r in idx.select("id").distinct().collect()
        ) == self.expected_ids


class _SemanticAdapter:
    name = "semantic"
    expected_ids = [1, 2, 3]
    N_CELLS = 3

    def wave(self):
        import numpy as np

        rng = np.random.default_rng(11)
        base = rng.standard_normal((3, 16)) * 3.0
        return [
            {"vec_id": i + 1, "embedding": [float(x) for x in base[i]]}
            for i in range(3)
        ]

    def write_wave(self, incoming, fname, rows):
        import json

        with open(incoming / fname, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def seed_phase1_only(self, spark, tmp):
        from reciping_data_pipeline_spark.operators import similarity
        from reciping_data_pipeline_spark.sources import writers

        rows = self.wave()
        df = spark.createDataFrame(
            [(r["vec_id"], r["embedding"]) for r in rows],
            "vec_id long, embedding array<double>",
        )
        # exactly the stream's bootstrap fit (same params/seed), as if
        # the codebook commit landed and the corpus append did not
        cent = similarity.fit_spherical_centroids(
            df, vec_col="embedding", id_col="vec_id",
            n_cells=self.N_CELLS, sample=4 * self.N_CELLS, seed=17,
        )
        writers.overwrite_table(
            similarity.centroids_to_df(spark, cent), str(tmp / "centroids")
        )

    def start(self, spark, incoming, tmp):
        from reciping_data_pipeline_spark.streaming import ingest

        return ingest.start_semantic_dedup_corpus_stream(
            spark, str(incoming), str(tmp / "corpus"), str(tmp / "centroids"),
            str(tmp / "ckpt"), n_cells=self.N_CELLS,
        )

    def committed_ids(self, spark, tmp):
        return sorted(
            r["vec_id"]
            for r in spark.read.parquet(str(tmp / "corpus")).select("vec_id").collect()
        )

    def orphan_state_still_consistent(self, spark, tmp):
        # replay must have REUSED the committed codebook, not refit it:
        # corpus cells agree with assignment under the pre-crash codebook
        import pyspark.sql.functions as F

        from reciping_data_pipeline_spark.operators import similarity
        from reciping_data_pipeline_spark.sources import writers

        cent = similarity.centroids_from_df(
            writers.read_table(spark, str(tmp / "centroids"))
        )
        assert cent.shape[0] <= self.N_CELLS
        corpus = spark.read.parquet(str(tmp / "corpus"))
        recelled = similarity.assign_cells(
            corpus.select("vec_id", "embedding"), cent, vec_col="embedding"
        ).select("vec_id", F.col("cell").alias("cell2"))
        mismatches = (
            corpus.select("vec_id", "cell")
            .join(recelled, on="vec_id")
            .where(F.col("cell") != F.col("cell2"))
            .count()
        )
        assert mismatches == 0


@pytest.mark.parametrize(
    "adapter", [_NearDupAdapter(), _SemanticAdapter()], ids=lambda a: a.name
)
def test_crash_window_phase1_orphan_then_redelivery(spark, adapter, tmp_path):
    """Kill-between-phases parity: phase-1 state committed, corpus row
    lost, then (1) delivery commits each doc exactly once, (2) a
    byte-identical redelivery commits nothing, (3) the orphaned
    phase-1 state stays harmless under its stream's documented
    contract."""
    incoming = tmp_path / "incoming"
    incoming.mkdir()

    adapter.seed_phase1_only(spark, tmp_path)
    adapter.write_wave(incoming, "wave1.jsonl", adapter.wave())
    q = adapter.start(spark, incoming, tmp_path)
    q.awaitTermination(60)
    assert adapter.committed_ids(spark, tmp_path) == adapter.expected_ids

    adapter.write_wave(incoming, "wave1_replay.jsonl", adapter.wave())
    q = adapter.start(spark, incoming, tmp_path)
    q.awaitTermination(60)
    assert adapter.committed_ids(spark, tmp_path) == adapter.expected_ids
    adapter.orphan_state_still_consistent(spark, tmp_path)
