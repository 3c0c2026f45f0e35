"""SparkSession factory tuned for this engine.

Design notes (100 TB posture, tested on local[*]):

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  dynamic join-strategy demotion replace hand-tuned partition counts
  (the reference hard-codes ``shuffle.partitions`` 2/100 per job mode;
  AQE subsumes both — SURVEY.md §4).
- ``spark.sql.session.timeZone=UTC``: the driver's DuckDB oracle reads
  the same parquet files with naive timestamps; pinning Spark to UTC
  makes hour()/date() extractions agree byte-for-byte. The medallion
  pipeline overrides to Asia/Seoul per the reference semantics
  (``spark/replay_jobs/replay_staging_to_bronze.py:40``).
- Dynamic partition overwrite: idempotent re-runs of any partitioned
  writer (fixes the reference's admitted re-run gap,
  ``docs/adr/002-apache-iceberg.md``).
- Arrow enabled for the few Pandas-UDF operators (multimodal decode,
  embedding kernels); everything else stays JVM-side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _default_driver_memory() -> str:
    """min(48g, ~70% of physical RAM): local[N] puts every executor
    thread in the driver JVM, so the heap wants ~1.5 GB/core (48g at
    32 cores — the shape a production executor actually gets), but on
    a smaller dev/CI host an unconditional 48g -Xmx would push a heavy
    run into swap or an OOM-kill instead of a clear Java heap error
    (ADVICE r10). SPARK_DRIVER_MEMORY still overrides outright."""
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        return f"{max(2, min(48, int(total * 0.7 / (1 << 30))))}g"
    except (ValueError, OSError, AttributeError):
        return "8g"


def _default_max_result_size(driver_memory: str) -> str:
    """min(8g, half the resolved driver heap): a fixed 8g default can
    EXCEED the heap on a small host (the memory derivation floors at
    2g), turning an oversized collect into a driver OOM that kills the
    whole sweep instead of the clean maxResultSize abort (ADVICE r11).
    Halving keeps headroom for the collect's deserialized copy.
    Accepts any JVM memory suffix (k/m/g/t) — a user-supplied
    SPARK_DRIVER_MEMORY=4096m must not fall back to the fixed 8g this
    derivation exists to avoid (ADVICE r12)."""
    _scale = {"k": 1 / (1 << 20), "m": 1 / 1024, "g": 1.0, "t": 1024.0}
    s = driver_memory.strip().lower()
    try:
        if s and s[-1] in _scale:
            gb = float(s[:-1]) * _scale[s[-1]]
        else:  # bare number = bytes, per JVM -Xmx semantics
            gb = float(s) / (1 << 30)
    except ValueError:
        return "8g"
    return f"{max(1, min(8, int(gb) // 2))}g"


def get_spark(
    app_name: str = "reciping-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    timezone: str = "UTC",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster, ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Respect the 64 MB advisory size when coalescing instead of
        # splitting every shuffle to defaultParallelism tiny tasks
        # (the Spark-docs-recommended production setting; measured
        # ~20% off the 21-query suite, and at real scale it sizes
        # reducers by data volume, which is what survives 100 TB).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", timezone)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # MIN/MAX/COUNT without row filters answered from parquet
        # footer statistics instead of scanning pages (exact; free).
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 8g was 250 MB/core — far under any real executor's per-core
        # memory — and 32 concurrent partial-agg hash maps OOMed the
        # ×30 pair sweeps; see _default_driver_memory for the
        # RAM-capped derivation (lazily committed via -Xmx).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()),
        )
        .config("spark.ui.enabled", "false")
        # oracle comparisons collect full result sets; scaled-fixture
        # sweeps legitimately produce multi-GB results (x100
        # embed_near_dup_blocked: ~20M pairs = 1.07 GB serialized hit
        # the 1g default mid-sweep). Derived from the resolved driver
        # memory so it stays under the heap on small hosts too.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get(
                "SPARK_DRIVER_MAX_RESULT_SIZE",
                _default_max_result_size(
                    os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory())
                ),
            ),
        )
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # The testdata events table stores TIMESTAMP(NANOS) parquet,
        # which Spark refuses by default; read as long and convert in
        # tables.load_table (ns -> us truncation, matching DuckDB).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate() may return a pre-existing session whose timezone
    # differs from what this caller needs — timezone is runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", timezone)

    from reciping_data_pipeline_spark.tables import ship_package

    ship_package(spark)
    return spark
