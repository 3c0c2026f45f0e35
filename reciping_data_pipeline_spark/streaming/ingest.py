"""Streaming staging → silver ingestion.

``readStream`` file source over the JSONL staging tree +
``foreachBatch`` that calls the *batch* silver transform and
idempotent writer — micro-batch and streaming share one code path, so
semantics can't drift between the two (the reference maintains two
parallel job families, replay_* and bulk_*, with copy-drift risk).

Scale notes:
- the file source tracks processed files in the checkpoint, so each
  micro-batch lists only new files (``maxFilesPerTrigger`` bounds
  batch size under backlog);
- ``Trigger.AvailableNow`` drains the backlog in bounded batches and
  stops — the streaming equivalent of the reference's catchup replay;
- exactly-once to the silver table = checkpoint (at-least-once
  delivery) + the writer's event_id anti-join (idempotent apply).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from reciping_data_pipeline_spark.pipeline import silver


def read_staging_stream(
    spark: SparkSession, staging_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = (
        spark.readStream.format("text")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.jsonl")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(staging_dir)


def start_silver_stream(
    spark: SparkSession,
    staging_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    also_gold: bool = False,
) -> StreamingQuery:
    """Stream staging JSONL into the silver table via foreachBatch;
    with ``also_gold=True`` each micro-batch continues into the
    incremental gold build (dim_user upsert + fact append) — the full
    streaming medallion. Non-user dims must exist (bulk bootstrap)."""
    raw = read_staging_stream(spark, staging_dir, max_files_per_trigger)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        import pyspark.sql.functions as F

        bronze_like = batch_df.select(
            F.col("value").alias("raw_event_string"),
            F.input_file_name().alias("source_file"),
        )
        silver_df = silver.transform(bronze_like, batch_ts=datetime(1970, 1, 1))
        # batch time is the only nondeterministic column; stamp it from
        # the micro-batch id so replays from the same checkpoint are
        # byte-stable.
        silver_df = silver_df.withColumn(
            "processed_at", F.timestamp_seconds(F.lit(batch_id)).cast("timestamp_ntz")
        )
        # Per-batch persist with a deterministic release (the same
        # leak-free pattern as the near-dup stream's cache_registry):
        # the batch plan feeds append_incremental's two actions plus,
        # with also_gold, the dim upsert and fact build — unpersisted,
        # the micro-batch JSON parse re-executes per action. Each
        # batch's plan is unique, so without the finally the entries
        # would accumulate for the stream's lifetime.
        silver_df = silver_df.persist()
        try:
            silver.append_incremental(silver_df, warehouse)
            if also_gold:
                from reciping_data_pipeline_spark.pipeline import gold

                gold.run_incremental(spark, silver_df, warehouse)
        finally:
            silver_df.unpersist()

    writer = raw.writeStream.foreachBatch(process_batch).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_corpus_stream(
    spark: SparkSession,
    incoming_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming corpus ingest with cross-batch exact dedup: new
    document JSONL files land in ``incoming_dir``; each micro-batch is
    deduped against the corpus's persisted fingerprint index
    (``operators.dedup.incremental_exact_dedup`` — the corpus text is
    never re-read) and survivors append to ``corpus_dir`` via the
    table-format seam.

    Exactly-once corpus growth = file-source checkpoint (at-least-once
    batches) + the fingerprint anti-join (idempotent apply): re-offered
    docs hit their own already-committed fingerprints and drop out.
    Scale: state lives in the corpus table itself (fingerprint column),
    not in streaming state — no unbounded state store, and a bulk
    engine restart resumes from the checkpoint + index alone.
    """
    import pyspark.sql.functions as F
    from pyspark.errors import AnalysisException

    from reciping_data_pipeline_spark.operators import dedup as dedup_ops
    from reciping_data_pipeline_spark.sources import writers

    schema = "doc_id long, source string, text string"
    raw = (
        spark.readStream.format("json")
        .schema(schema)
        .option("pathGlobFilter", "*.jsonl")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        raw = raw.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = raw.load(incoming_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Probe the corpus index THROUGH Spark, not the driver's local
        # filesystem: os.path.isdir is always False for S3/HDFS paths,
        # which would silently disable cross-batch dedup on any
        # non-local store. A missing/empty table raises
        # AnalysisException (PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA)
        # at read time — that IS the "first batch, no corpus yet" case.
        try:
            index = writers.read_table(batch_df.sparkSession, corpus_dir).select("fingerprint")
        except AnalysisException:
            index = batch_df.sparkSession.createDataFrame([], "fingerprint string")
        kept = dedup_ops.incremental_exact_dedup(batch_df, index, "doc_id", "text")
        rows = batch_df.join(kept.select("doc_id", "fingerprint"), on="doc_id", how="inner")
        if not rows.isEmpty():
            writers.append_table(
                rows.select("doc_id", "source", "text", "fingerprint"), corpus_dir
            )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_semantic_dedup_corpus_stream(
    spark: SparkSession,
    incoming_dir: str,
    corpus_dir: str,
    centroids_dir: str,
    checkpoint_dir: str,
    *,
    threshold: float = 0.95,
    n_cells: int = 8,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming vector-corpus ingest with cross-batch SEMANTIC
    (embedding-cosine) dedup — the SemDeDup sibling of
    ``start_near_dup_corpus_stream``: each micro-batch of vectors is
    exact-deduped in-batch, assigned to cells under the persisted
    centroid codebook, compared within-cell against the celled corpus
    (``operators.similarity.incremental_semantic_dedup``), and
    survivors append to the corpus WITH their cell assignment — the
    corpus table doubles as the cell index, so the next batch probes
    the grown corpus without re-clustering or rescanning it.

    Bootstrap: the first non-empty batch fits the codebook
    (spherical k-means on its own vectors) and commits it to
    ``centroids_dir``; every later batch loads it unchanged — cell ids
    stay stable for the life of the corpus (re-fit = rebuild, exactly
    like re-sharding the MinHash band index).

    Redelivery safety: unlike the text stream there is only ONE
    data-table commit per batch (corpus+cells together), so no
    inter-append crash window exists; a re-offered vector whose batch
    committed is dropped by an exact-fingerprint anti-join
    (sha256 of the JSON-serialized vector, stored in the corpus —
    catches even zero-norm vectors cosine can't flag) and, independently,
    by cosine 1.0 ≥ threshold within its own cell. The centroids commit
    can crash before the corpus commit on the bootstrap batch only —
    replay then reuses the committed codebook (same fit, same batch)
    and commits the corpus.

    Scale: state lives in the corpus table + O(cells × dim) codebook;
    assignment is a narrow Arrow pass over the delta; the probe join
    shuffles only the delta against a cell-bucketed corpus."""
    import pyspark.sql.functions as F
    from pyspark.errors import AnalysisException

    from reciping_data_pipeline_spark.operators import similarity
    from reciping_data_pipeline_spark.sources import writers

    schema = "vec_id long, embedding array<double>"
    raw = (
        spark.readStream.format("json")
        .schema(schema)
        .option("pathGlobFilter", "*.jsonl")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        raw = raw.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = raw.load(incoming_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        from pyspark.sql import Window

        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        in_batch = (
            batch_df.withColumn(
                "fingerprint", F.sha2(F.to_json(F.col("embedding")), 256)
            )
            .withColumn(
                "_rn",
                F.row_number().over(Window.partitionBy("fingerprint").orderBy("vec_id")),
            )
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        try:
            cent = similarity.centroids_from_df(writers.read_table(sess, centroids_dir))
        except AnalysisException:
            cent = similarity.fit_spherical_centroids(
                in_batch, vec_col="embedding", id_col="vec_id",
                n_cells=n_cells, sample=4 * n_cells, seed=17,
            )
            writers.overwrite_table(similarity.centroids_to_df(sess, cent), centroids_dir)
        try:
            corpus = writers.read_table(sess, corpus_dir)
        except AnalysisException:
            corpus = sess.createDataFrame(
                [], schema + ", cell int, fingerprint string"
            )
        fresh = in_batch.join(
            corpus.select("fingerprint"), on="fingerprint", how="left_anti"
        )
        verdicts = similarity.incremental_semantic_dedup(
            fresh, corpus, cent, id_col="vec_id", vec_col="embedding",
            threshold=threshold,
        )
        survivors = fresh.join(
            verdicts.where(~F.col("is_dup")).select("vec_id"), on="vec_id", how="left_semi"
        )
        celled = similarity.assign_cells(survivors, cent, vec_col="embedding")
        # persist before isEmpty: without it the whole per-batch plan
        # (fingerprint dedup + incremental probe + cell assignment)
        # executes TWICE — once for the emptiness check, once for the
        # append — mirroring the near-dup stream's batch_caches
        # handling; released deterministically below.
        out = celled.select("vec_id", "embedding", "cell", "fingerprint").persist()
        try:
            if not out.isEmpty():
                writers.append_table(out, corpus_dir)
        finally:
            out.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_near_dup_corpus_stream(
    spark: SparkSession,
    incoming_dir: str,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    *,
    threshold: float = 0.5,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming corpus ingest with cross-batch NEAR-dup dedup: each
    micro-batch is exact-deduped in-batch (fingerprint keep-min), then
    probed against the corpus's persisted MinHash band index
    (``operators.dedup.incremental_minhash_dedup`` — candidates from an
    equi-join on the index, exact-Jaccard verified, so band collisions
    never drop a genuinely novel doc). Survivors append to the corpus
    table AND their band postings append to the index table, so the
    next batch probes the grown corpus without rescanning it.

    Redelivery safety (foreachBatch is at-least-once, and the two
    appends are separate non-atomic commits):

    - A re-offered doc whose batch fully committed is dropped by TWO
      independent guards: an exact-fingerprint anti-join against the
      corpus (the corpus table stores each doc's fingerprint; catches
      even docs too short to shingle), and the MinHash path (exact
      copy → Jaccard 1.0 ≥ threshold → dup).
    - The index postings are committed BEFORE the corpus rows. A crash
      between the two appends therefore leaves orphan index postings,
      never orphan corpus docs: on replay the fingerprint guard passes
      (doc not in corpus), the candidate's corpus-text semi-join drops
      the orphan match, and the doc commits exactly one corpus row plus
      duplicate postings — which are harmless (candidate generation is
      DISTINCT on the id pair) and only cost index bytes. The reverse
      order would commit duplicate corpus DOCS on replay, a correctness
      loss for a dedup engine.

    State lives in the two tables (corpus + index), not the state
    store — a restart resumes from checkpoint + tables alone. Scale:
    probe shuffles O(batch × bands) vs the (bucketable) index;
    verification reads corpus text only for candidate ids (bucket the
    corpus on doc_id to make that read partition-pruned)."""
    import pyspark.sql.functions as F
    from pyspark.errors import AnalysisException

    from reciping_data_pipeline_spark.functions import text as text_fns
    from reciping_data_pipeline_spark.operators import dedup as dedup_ops
    from reciping_data_pipeline_spark.sources import writers

    schema = "doc_id long, source string, text string"
    raw = (
        spark.readStream.format("json")
        .schema(schema)
        .option("pathGlobFilter", "*.jsonl")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        raw = raw.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = raw.load(incoming_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        # in-batch exact dedup first (cheap): keep the min id per
        # fingerprint so a batch carrying its own copies can't commit
        # two. The fingerprint is kept — it is stored in the corpus and
        # doubles as the redelivery guard below.
        in_batch = (
            batch_df.withColumn("fingerprint", text_fns.fingerprint(F.col("text")))
            .withColumn(
                "_rn",
                F.row_number().over(Window.partitionBy("fingerprint").orderBy("doc_id")),
            )
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        stage_dir = corpus_dir.rstrip("/") + ".__migrate__"
        try:
            corpus = writers.read_table(sess, corpus_dir)
            index = writers.read_table(sess, index_dir)
            if "fingerprint" not in corpus.columns:
                # Migration: a corpus written before the fingerprint
                # column existed (pre-r07) would fail the select below
                # and, worse, later appends would create a mixed-schema
                # parquet directory. One-time backfill: recompute the
                # fingerprint from text and rewrite the table, then
                # re-read so this batch (and all future ones) sees the
                # current schema. Staged through a sibling dir — a
                # direct self-overwrite deletes the input files under
                # the lazy scan (FAILED_READ_FILE). Single-writer per
                # stream, so the rewrite races nothing.
                import os as _os
                import shutil

                writers.overwrite_table(
                    corpus.withColumn(
                        "fingerprint", text_fns.fingerprint(F.col("text"))
                    ),
                    stage_dir,
                )
                # Commit via directory rename, not a second rewrite: a
                # crash after Spark clears corpus_dir but before the
                # rewrite lands would leave the ONLY copy of the legacy
                # corpus in the stage dir (ADVICE r08). rmtree+rename
                # shrinks the window to the gap between the two syscalls,
                # and a crash inside it leaves the intact stage dir for
                # the recovery path below.
                shutil.rmtree(corpus_dir)
                _os.rename(stage_dir, corpus_dir)
                corpus = writers.read_table(sess, corpus_dir)
        except AnalysisException:
            import os as _os

            if _os.path.isdir(stage_dir):
                # Crash-recovery: a migration that died after clearing
                # corpus_dir left the fully-written backfill in the
                # stage dir. Restore it instead of falling through to
                # an empty corpus — that fallback would silently drop
                # the legacy docs AND their fingerprint redelivery
                # guard.
                import shutil

                shutil.rmtree(corpus_dir, ignore_errors=True)
                _os.rename(stage_dir, corpus_dir)
                try:
                    corpus = writers.read_table(sess, corpus_dir)
                    index = writers.read_table(sess, index_dir)
                except AnalysisException:
                    corpus = writers.read_table(sess, corpus_dir)
                    index = sess.createDataFrame(
                        [], "id long, band_idx int, band_hash long"
                    )
            else:
                corpus = sess.createDataFrame([], schema + ", fingerprint string")
                index = sess.createDataFrame(
                    [], "id long, band_idx int, band_hash long"
                )
        # Redelivery guard: a doc whose earlier delivery fully committed
        # is dropped here by exact fingerprint — independent of the
        # MinHash path, so even docs too short to shingle (which the
        # Jaccard verifier can never flag) are replay-idempotent.
        fresh = in_batch.join(
            corpus.select("fingerprint"), on="fingerprint", how="left_anti"
        )
        # Each micro-batch's candidate plan is unique, so the persist
        # inside incremental_minhash_dedup would accumulate one
        # CacheManager entry per batch for the life of the stream (the
        # session-pollution effect BENCH_NOTES.md measured at 1.4x) —
        # collect the handles and release them after the writes.
        batch_caches: list = []
        verdicts = dedup_ops.incremental_minhash_dedup(
            fresh, corpus, index, "doc_id", "text", threshold=threshold,
            cache_registry=batch_caches,
        )
        # persist, not localCheckpoint: both pin the survivor set so the
        # two appends commit the same snapshot, but checkpoint blocks
        # are only reclaimed whenever the ContextCleaner notices the
        # handle is gone (measured lingering across batches), while a
        # registered persist is released deterministically below.
        survivors = fresh.join(
            verdicts.where(~F.col("is_dup")).select("doc_id"), on="doc_id", how="left_semi"
        ).persist()
        batch_caches.append(survivors)
        try:
            if not survivors.isEmpty():
                # Index FIRST: a crash between these two appends must leave
                # orphan postings (harmless — candidates are DISTINCT and the
                # corpus-text semi-join drops orphan matches), never an
                # unindexed corpus doc, whose future near-dups would probe
                # past it forever and whose replay would commit a duplicate.
                writers.append_table(
                    dedup_ops.build_minhash_index(survivors, "doc_id", "text"), index_dir
                )
                writers.append_table(
                    survivors.select("doc_id", "source", "text", "fingerprint"), corpus_dir
                )
        finally:
            for cached in batch_caches:
                cached.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_user_day_rollup_stream(
    spark: SparkSession,
    incoming_dir: str,
    events_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    sketch_rollup_dir: str | None = None,
) -> StreamingQuery:
    """Events JSONL stream → idempotent date-partitioned events table →
    incremental user-day rollup (`pipeline/rollups.py`), per micro-batch.
    ``sketch_rollup_dir`` additionally maintains the HLL sketch partial
    (`pipeline/sketch_rollups.py`) from the same touched-dates set —
    sketches are NOT additive under replay, so the recompute-from-
    committed-events discipline below is exactly what makes the
    streaming flavor convergent for them too.

    Exactly-once WITHOUT a commit marker: the events append is an
    event_id anti-join against the already-committed rows of exactly
    the partitions the batch touches (the `silver.append_incremental`
    discipline — re-offered events drop out), and the rollup update is
    a deterministic RECOMPUTE of the touched date partitions from the
    events table (not an additive merge, which would double-count on
    replay). Every crash window replays convergently: append crashed →
    re-append is a no-op via the anti-join; rollup overwrite crashed →
    the replayed batch recomputes the same partitions from the same
    committed events. Touched dates are derived from the BATCH (before
    the anti-join), so a replay whose events all drop out still repairs
    a rollup overwrite that never landed. Cost per batch ∝ the touched
    days' events — never table size."""
    import pyspark.sql.functions as F
    from pyspark.errors import AnalysisException

    from reciping_data_pipeline_spark.pipeline import rollups
    from reciping_data_pipeline_spark.sources import writers

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    raw = (
        spark.readStream.format("json")
        .schema(schema)
        .option("pathGlobFilter", "*.jsonl")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        raw = raw.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = raw.load(incoming_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # NULL event_id rows can never match the left-anti redelivery
        # guard below (SQL NULL semantics), so they would re-append on
        # EVERY replay — silently breaking convergence. Drop them up
        # front, the same malformed-row discipline as
        # pipeline/silver.py:106 (a null id marks an unusable record).
        batch_df = batch_df.where(F.col("event_id").isNotNull())
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        batch = batch_df.withColumn(
            "event_date", F.col("ts").cast("date").cast("string")
        )
        touched = [r["event_date"] for r in batch.select("event_date").distinct().collect()]
        # idempotent append: anti-join on event_id within ONLY the
        # touched partitions (directory-pruned read)
        try:
            existing = (
                writers.read_table(sess, events_dir)
                .where(F.col("event_date").isin(touched))
                .select("event_id")
            )
        except AnalysisException:
            existing = sess.createDataFrame([], "event_id long")
        new_rows = batch.join(existing, on="event_id", how="left_anti")
        if not new_rows.isEmpty():
            writers.append_table(new_rows, events_dir, partition_cols=["event_date"])
        # recompute the touched rollup partitions from the committed
        # events history of those days (pruned scan) — replay-safe.
        # touched is derived from the BATCH pre-anti-join so a replay
        # whose rows all drop out still repairs a crashed overwrite.
        rollups.maintain_user_day_rollup(
            sess, batch, rollup_dir, events_path=events_dir, touched_dates=touched
        )
        if sketch_rollup_dir is not None:
            from reciping_data_pipeline_spark.pipeline import sketch_rollups

            sketch_rollups.maintain_day_sketch_rollup(
                sess,
                batch,
                sketch_rollup_dir,
                events_path=events_dir,
                touched_dates=touched,
            )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
