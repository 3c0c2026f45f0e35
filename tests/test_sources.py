"""Source/sink layer tests: bucketed co-located joins (zero-exchange
plan), small-file compaction, interval path pruning."""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F

from reciping_data_pipeline_spark.plans import inspect
from reciping_data_pipeline_spark.sources import bucketing, jsonl, writers
from reciping_data_pipeline_spark.tables import load_table

from .conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """orders ⋈ lineitem bucketed on the key: the join plans with ZERO
    shuffle exchanges — the 100 TB fact-to-fact join path."""
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    bucketing.write_bucketed(
        orders, "b_orders", str(tmp_path / "b_orders"), ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"]
    )
    bucketing.write_bucketed(
        li, "b_lineitem", str(tmp_path / "b_lineitem"), ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"]
    )
    try:
        # Disable broadcast so the join would otherwise need a shuffle;
        # bucket co-location must eliminate it.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketing.read_bucketed(spark, "b_orders").join(
            bucketing.read_bucketed(spark, "b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert inspect.count_exchanges(joined) == 0, inspect.simple_plan(joined)
        # and it still computes the right thing
        plain = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("part", (F.col("id") % 2).cast("int"))
    # Fragment: many tiny files per partition.
    df.repartition(40).write.partitionBy("part").parquet(path)
    before_files = sum(1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet"))
    before_rows = spark.read.parquet(path).count()
    writers.compact_partitions(spark, path, ["part"])
    after_files = sum(1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet"))
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert after_files < before_files
    assert after.agg(F.sum("id")).collect()[0][0] == sum(range(10_000))


def test_interval_paths_cover_exactly():
    paths = jsonl.interval_paths(
        "/staging", datetime(2025, 9, 1, 10, 0), datetime(2025, 9, 1, 10, 30)
    )
    assert paths == [
        "/staging/year=2025/month=09/day=01/hour=10/minute=00",
        "/staging/year=2025/month=09/day=01/hour=10/minute=15",
    ]
    # interval starts mid-bucket → snaps to the containing bucket
    paths = jsonl.interval_paths(
        "/staging", datetime(2025, 9, 1, 10, 7), datetime(2025, 9, 1, 10, 16)
    )
    assert paths == [
        "/staging/year=2025/month=09/day=01/hour=10/minute=00",
        "/staging/year=2025/month=09/day=01/hour=10/minute=15",
    ]


def test_python_datasource_deterministic_and_partitioned(spark):
    """Spark-4 Python Data Source: executor-side generation is
    partition-parallel and bit-deterministic across reads."""
    import pyspark.sql.functions as F

    from reciping_data_pipeline_spark.sources import pydatasource

    pydatasource.register(spark)
    reader = (
        spark.read.format("synthetic_events")
        .option("rows_per_partition", 500)
        .option("num_partitions", 4)
        .option("seed", 7)
    )
    df = reader.load()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 2000
    # event_id is globally unique by construction (partition-offset ids)
    assert df.select("event_id").distinct().count() == 2000
    # deterministic: re-read produces the identical row set
    again = reader.load()
    assert df.exceptAll(again).isEmpty() and again.exceptAll(df).isEmpty()
    # a different seed produces different data
    other = reader.option("seed", 8).load()
    assert not df.exceptAll(other).isEmpty()
    # the source composes with normal relational ops downstream
    agg = df.groupBy("event_type").agg(F.count("*").alias("n"))
    assert agg.count() == 5


def test_corpus_partition_pruning_and_sorted_skipping(spark, tmp_path):
    """A lang-partitioned, length-sorted corpus layout gives (a)
    directory-level PartitionFilters for the lang predicate and (b)
    pushed n_chars filters against row groups sorted on that column —
    the two-level data-skipping story for 100 TB corpus tables."""
    import pyspark.sql.functions as F

    from reciping_data_pipeline_spark.plans import inspect
    from reciping_data_pipeline_spark.sources import writers
    from reciping_data_pipeline_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "docs_by_lang")
    writers.write_sorted_partitioned(docs, path, ["lang"], ["n_chars"])

    pruned = (
        spark.read.parquet(path)
        .where((F.col("lang") == "en") & (F.col("n_chars") > 200))
        .select("doc_id")
    )
    assert inspect.partition_filters(pruned), inspect.formatted_plan(pruned)
    assert any("n_chars" in f for f in inspect.pushed_filters(pruned)), (
        inspect.pushed_filters(pruned)
    )
    # correctness: pruned read returns exactly the filtered rows
    want = docs.where((F.col("lang") == "en") & (F.col("n_chars") > 200)).count()
    assert pruned.count() == want


class TestKafkaOfflineContract:
    """S10: the broker is absent in this container, so the contract is
    pinned offline — exact reader/writer option maps, payload
    serialization round-trip, and source-agnostic equivalence of the
    Kafka value path with the file-staging path through the same
    silver transform."""

    def test_reader_writer_option_maps(self):
        from reciping_data_pipeline_spark.sources import kafka

        assert kafka.reader_options("b:9092", "events", "earliest", 5000) == {
            "kafka.bootstrap.servers": "b:9092",
            "subscribe": "events",
            "startingOffsets": "earliest",
            "maxOffsetsPerTrigger": "5000",
        }
        assert "maxOffsetsPerTrigger" not in kafka.reader_options("b:9092", "events")
        assert kafka.writer_options("b:9092", "events", "/ckpt") == {
            "kafka.bootstrap.servers": "b:9092",
            "topic": "events",
            "checkpointLocation": "/ckpt",
        }

    def test_payload_round_trip(self, spark):
        from reciping_data_pipeline_spark.sources import kafka

        df = spark.createDataFrame(
            [(1, "view", 2.5), (2, "purchase", None)],
            "event_id long, event_type string, value double",
        )
        parsed = (
            kafka.to_payload(df)
            .select(F.from_json("value", df.schema).alias("r"))
            .select("r.*")
        )
        assert sorted(map(tuple, parsed.collect())) == sorted(map(tuple, df.collect()))

    def test_value_path_matches_file_path_through_silver(self, spark, tmp_path):
        """The same raw JSONL lines produce byte-identical silver rows
        whether they arrive via the file staging scan or as Kafka
        values (to_payload/from_payload plumbing)."""
        from reciping_data_pipeline_spark.pipeline import datagen, silver
        from reciping_data_pipeline_spark.sources import kafka

        fix = datagen.generate_fixture(
            str(tmp_path), seed=3, n_users=10, n_days=1, start=datetime(2025, 5, 1)
        )
        ts = datetime(2025, 5, 2)
        raw = (
            spark.read.format("text")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.jsonl")
            .load(fix["staging_dir"])
        )
        file_side = silver.transform(
            raw.select(
                F.col("value").alias("raw_event_string"),
                F.input_file_name().alias("source_file"),
            ),
            batch_ts=ts,
        ).drop("data_source", "processed_at")
        kafka_side = silver.transform(
            kafka.from_payload(raw.select("value"), source_label="topic:events"),
            batch_ts=ts,
        ).drop("data_source", "processed_at")
        assert file_side.schema == kafka_side.schema
        assert sorted(map(tuple, file_side.collect())) == sorted(
            map(tuple, kafka_side.collect())
        )


def test_table_format_seam_routes_all_writes(spark, tmp_path):
    """Every pipeline write goes through the active TableFormat: a
    recording wrapper sees overwrite/append calls for bronze, silver,
    dims, and gold during a bulk backfill + incremental re-delivery,
    and swapping the format back restores the default."""
    from datetime import datetime

    from reciping_data_pipeline_spark.pipeline import datagen, runner

    calls: list[tuple[str, str]] = []

    class Recording(writers.ParquetFormat):
        name = "recording-parquet"

        def overwrite_partitions(self, df, path, partition_cols):
            calls.append(("overwrite_partitions", os.path.basename(path)))
            super().overwrite_partitions(df, path, partition_cols)

        def overwrite_table(self, df, path, partition_cols=None):
            calls.append(("overwrite_table", os.path.basename(path)))
            super().overwrite_table(df, path, partition_cols)

        def append(self, df, path, partition_cols=None):
            calls.append(("append", os.path.basename(path)))
            super().append(df, path, partition_cols)

    fix = datagen.generate_fixture(
        str(tmp_path / "fx"), seed=5, n_users=12, n_days=1, start=datetime(2025, 6, 1)
    )
    wh = str(tmp_path / "wh")
    prev_fmt = writers.set_table_format(Recording())
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        runner.bulk_backfill(
            spark, fix["staging_dir"], wh, fix["recipe_master"], datetime(2025, 6, 2),
            time_dim_range=("2025-06-01 00:00:00", "2025-06-02 23:00:00"),
        )
        runner.incremental_run(
            spark, fix["staging_dir"], wh, datetime(2025, 6, 1), datetime(2025, 6, 2)
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        restored = writers.set_table_format(prev_fmt)
        assert restored.name == "recording-parquet"
    written = {t for _, t in calls}
    assert {"bronze_events", "silver_events", "fact_user_events"} <= written or len(written) >= 3
    assert any(op == "overwrite_partitions" for op, _ in calls)
    assert writers.get_table_format().name == "parquet"


def test_python_stream_source_offsets_and_replay_determinism(spark):
    """The streaming flavor of the Python data source: offset ranges
    split across partitions without gaps/overlap, and a REPLAYED range
    (same start/end offsets) regenerates byte-identical rows — the
    property crash-recovery exactly-once rests on."""
    from reciping_data_pipeline_spark.sources.pydatasource import (
        SyntheticEventsStreamReader,
    )

    r = SyntheticEventsStreamReader({"rows_per_batch": "64", "num_partitions": "4"})
    assert r.initialOffset() == {"index": 0}
    o1 = r.latestOffset()
    o2 = r.latestOffset()
    assert (o1["index"], o2["index"]) == (64, 128)
    parts = r.partitions({"index": 0}, o1)
    spans = sorted(p.value for p in parts)
    assert spans[0][0] == 0 and spans[-1][1] == 64
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c  # contiguous, no gap/overlap
    batch1 = [row for p in parts for row in r.read(p)]
    replay = [row for p in r.partitions({"index": 0}, {"index": 64}) for row in r.read(p)]
    assert batch1 == replay
    assert [row[0] for row in batch1] == list(range(64))


def test_python_stream_source_offset_recovers_after_restart(spark):
    """Restart recovery (ADVICE r04): a FRESH reader instance starts
    its counter at 0 while the engine replans from the checkpointed
    offset. Planning any batch clamps the counter to the engine range,
    so latestOffset never regresses below the checkpoint and no global
    index is ever regenerated as a duplicate."""
    from reciping_data_pipeline_spark.sources.pydatasource import (
        SyntheticEventsStreamReader,
    )

    r = SyntheticEventsStreamReader({"rows_per_batch": "64", "num_partitions": "4"})
    # pre-crash stream had committed up to index 1024 (checkpoint)
    stale_latest = r.latestOffset()  # fresh instance: 64, BELOW checkpoint
    assert stale_latest["index"] < 1024
    # engine replans from the checkpoint; hi<=lo yields an empty batch
    parts = r.partitions({"index": 1024}, stale_latest)
    assert [row for p in parts for row in r.read(p)] == []
    # after planning, the counter is clamped: offsets only move forward
    nxt = r.latestOffset()
    assert nxt["index"] >= 1024 + 64
    spans = [p.value for p in r.partitions({"index": 1024}, nxt)]
    assert spans[0][0] == 1024 and spans[-1][1] == nxt["index"]


def test_python_stream_source_end_to_end_micro_batches(spark, tmp_path):
    """spark.readStream over the registered source: micro-batches land
    in a memory sink with exactly the deterministic rows for the
    consumed offset range."""
    import time as _time

    from reciping_data_pipeline_spark.sources import pydatasource

    pydatasource.register(spark)
    q = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 50)
        .option("num_partitions", 2)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM synth_stream").collect()[0]["c"] >= 50:
                break
            _time.sleep(1)
        rows = spark.sql(
            "SELECT event_id, user_id, event_type, value FROM synth_stream ORDER BY event_id LIMIT 50"
        ).collect()
    finally:
        q.stop()
    assert len(rows) == 50
    expected = list(
        pydatasource._rows_for_range(
            0, 50, 42, 100, __import__("datetime").datetime(2025, 9, 1,
            tzinfo=__import__("datetime").timezone.utc)
        )
    )
    got = [(r["event_id"], r["user_id"], r["event_type"], r["value"]) for r in rows]
    want = [(e[0], e[2], e[3], e[4]) for e in expected]
    assert got == want


def test_python_stream_source_restart_from_checkpoint_no_duplicates(spark, tmp_path):
    """Full-engine restart proof of the offset-clamp fix: run a few
    micro-batches to a parquet sink, STOP the query (reader instance
    dies), start a new query on the SAME checkpoint, run more batches.
    The written global event_ids must be duplicate-free and contiguous
    from 0 — a regressed offset would re-deliver old indices, a
    skipped range would leave gaps."""
    import time as _time

    from reciping_data_pipeline_spark.sources import pydatasource

    pydatasource.register(spark)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")

    def run_batches(min_rows: int) -> None:
        q = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", 128)
            .option("num_partitions", 2)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        try:
            deadline = _time.time() + 90
            while _time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= min_rows:
                        break
                except Exception:  # noqa: BLE001 - sink dir not created yet
                    pass
                _time.sleep(0.3)
        finally:
            q.stop()
            q.awaitTermination(30)

    run_batches(128 * 2)
    n1 = spark.read.parquet(out).count()
    assert n1 >= 128 * 2
    run_batches(n1 + 128 * 2)  # RESTART on the same checkpoint
    ids = [r["event_id"] for r in spark.read.parquet(out).select("event_id").collect()]
    assert len(ids) > n1
    assert len(ids) == len(set(ids)), "restart re-delivered global indices"
    assert sorted(ids) == list(range(len(ids))), "offset regression or gap"
