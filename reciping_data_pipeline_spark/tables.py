"""Loading and view registration for the driver testdata tables.

``/root/testdata/sf*/`` holds one parquet per table:
``region nation customer supplier part orders lineitem events
documents embeddings`` (see TESTDATA.md). Every query in the catalog
takes ``(spark, sf_dir)`` and resolves tables through here, so the
physical layout (plain parquet now; a real deployment would use a
catalog of partitioned/bucketed tables) is isolated to this module.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension-sized tables we always want broadcast in star joins.
SMALL_TABLES = frozenset({"region", "nation", "supplier", "customer", "part"})


def _ensure_session_conf(spark: SparkSession) -> None:
    """Confs the catalog queries depend on, set defensively because the
    harness may hand us a vanilla session (not our session.get_spark):
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which Spark
      otherwise refuses to read;
    - UTC session timezone: hour()/date() extraction must agree with
      the DuckDB oracle's naive-timestamp semantics.
    Both are runtime-settable SQL confs.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    _ensure_session_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts arrives as raw nanoseconds (spark.sql.legacy.parquet.nanosAsLong);
        # integer-divide to microseconds — same floor conversion DuckDB
        # applies when reading TIMESTAMP(NANOS).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so catalog queries can use
    ``spark.sql`` with bare table names."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
