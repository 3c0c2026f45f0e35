"""Custom Python Data Source (Spark 4 API): deterministic event generator.

The reference's event generator is a driver-side Dask/Kafka producer
(`create_data/create_event_logs.py:1132-1362` — ~15k events/sec on one
machine). This re-expresses it as a *pluggable Spark batch source*
(`spark.read.format("synthetic_events")`): generation happens inside
executor tasks, one seeded RNG stream per input partition, so
throughput scales with the cluster instead of the driver. The same
shape serves as the template for any external-system reader (the
Python Data Source API is the sanctioned Spark-4 extension point when
there is no built-in/JVM connector).

Determinism contract: partition ``p`` of a source configured with
``seed=s`` always yields the same rows — across runs, executors, and
cluster sizes — because each partition derives its RNG as
``default_rng((s, p))`` and row ids are computed from (p, row index),
never from global state.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` options:

    - ``rows_per_partition`` (default 1000)
    - ``num_partitions`` (default 8)
    - ``seed`` (default 42)
    - ``n_users`` (default 100)
    - ``start`` ISO date (default 2025-09-01), events spread over 24h
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows_per_partition = int(options.get("rows_per_partition", 1000))
        self.num_partitions = int(options.get("num_partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("n_users", 100))
        self.start = datetime.fromisoformat(options.get("start", "2025-09-01")).replace(
            tzinfo=timezone.utc
        )

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        # Executor-side: import numpy lazily so the class pickles light.
        import numpy as np

        p = partition.value
        rng = np.random.default_rng((self.seed, p))
        n = self.rows_per_partition
        users = rng.integers(0, self.n_users, size=n)
        types = rng.integers(0, len(EVENT_TYPES), size=n)
        values = np.round(rng.exponential(scale=20.0, size=n), 2)
        offsets = np.sort(rng.integers(0, 24 * 3600 * 1000, size=n))  # ms within the day
        base_id = p * self.rows_per_partition
        for i in range(n):
            yield (
                base_id + i,
                self.start + timedelta(milliseconds=int(offsets[i])),
                int(users[i]),
                EVENT_TYPES[types[i]],
                float(values[i]),
            )


def register(spark) -> None:
    """Idempotently register the source with the session."""
    spark.dataSource.register(SyntheticEventsDataSource)
