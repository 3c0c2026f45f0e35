"""Kafka source/sink wrappers (gated: broker + spark-sql-kafka package
required at runtime, neither present in the test container).

The reference's ingestion edge is Kafka → Kafka Connect → S3 JSONL
(SURVEY §2.1 S10); inside this engine the equivalent is a direct
Structured Streaming Kafka source feeding the same silver transform
the file source uses (streaming/ingest.py).

Offline contract (tests/test_sources.py): the broker itself is the
only untestable piece here, so everything around it is factored into
pure, batch-testable functions —

- ``reader_options`` / ``writer_options``: the exact option maps the
  reader/writer builders pass to Spark (asserted literally);
- ``to_payload``: row → JSON ``value`` serialization the sink
  publishes (the shape a producer mirrors);
- ``from_payload``: the ``value``-string frame the source emits →
  the staging-scan shape (``raw_event_string``/``source_file``) that
  ``pipeline.silver.transform`` consumes — proven equivalent to the
  file-source path on identical lines, and round-trippable
  (``to_payload`` then ``from_json`` reproduces the input rows).

When a broker exists, ``read_events_stream``/``write_events_stream``
are these same contracts wired to ``readStream``/``writeStream``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def reader_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Option map for the Kafka source — the offline-testable half of
    ``read_events_stream``."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def writer_options(bootstrap_servers: str, topic: str, checkpoint_dir: str) -> dict[str, str]:
    """Option map for the Kafka sink — the offline-testable half of
    ``write_events_stream``."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }


def to_payload(df: DataFrame) -> DataFrame:
    """JSON-serialize rows into the single ``value`` string column the
    Kafka sink publishes. Pure column transform — identical for batch
    fixtures and the streaming writer."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def from_payload(values: DataFrame, source_label: str = "kafka") -> DataFrame:
    """Map the Kafka source's ``value``-string frame onto the staging
    scan's shape so bronze/silver code is source-agnostic: one raw
    JSONL line per row + a source marker (the file path slot carries
    the topic label — downstream only uses it for lineage)."""
    return values.select(
        F.col("value").cast("string").alias("raw_event_string"),
        F.lit(source_label).alias("source_file"),
    )


def read_events_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka topic → raw-line frame with the same shape the file-source
    staging scan produces (``value`` string), so downstream bronze/
    silver code is source-agnostic."""
    reader = spark.readStream.format("kafka").options(
        **reader_options(bootstrap_servers, topic, starting_offsets, max_offsets_per_trigger)
    )
    return reader.load().select(F.col("value").cast("string").alias("value"))


def write_events_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """JSON-serialize rows and publish to a topic (generator replay /
    downstream fan-out). Returns the started StreamingQuery."""
    opts = writer_options(bootstrap_servers, topic, checkpoint_dir)
    return to_payload(df).writeStream.format("kafka").options(**opts).start()
