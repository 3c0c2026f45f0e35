"""Kafka source/sink wrappers (gated: broker + spark-sql-kafka package
required at runtime, neither present in the test container).

The reference's ingestion edge is Kafka → Kafka Connect → S3 JSONL
(SURVEY §2.1 S10); inside this engine the equivalent is a direct
Structured Streaming Kafka source feeding the same silver transform
the file source uses (streaming/ingest.py). These helpers only build
the reader/writer configuration — they fail with a clear error when
the Kafka integration jar is absent, and are exercised in tests only
up to plan construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


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
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load().select(F.col("value").cast("string").alias("value"))


def write_events_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """JSON-serialize rows and publish to a topic (generator replay /
    downstream fan-out). Returns the started StreamingQuery."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
