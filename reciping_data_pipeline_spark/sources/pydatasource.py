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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

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

    def streamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


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


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch stream flavor of the same source
    (``spark.readStream.format("synthetic_events")``): every trigger
    advances the offset by ``rows_per_batch`` GLOBAL row indices, the
    index range splits evenly across ``num_partitions`` executor
    tasks, and row content is a pure function of (seed, global index)
    — so a replayed batch (same [start, end) offsets after a crash)
    regenerates byte-identical rows: exactly-once end-to-end when
    paired with an idempotent or transactional sink. Offsets are plain
    JSON dicts, checkpointed by the engine like any built-in source."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 512))
        self.num_partitions = int(options.get("num_partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("n_users", 100))
        self.start = datetime.fromisoformat(options.get("start", "2025-09-01")).replace(
            tzinfo=timezone.utc
        )
        self._current = 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        self._current += self.rows_per_batch
        return {"index": self._current}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["index"], end["index"]
        # Restart recovery: a fresh reader instance starts _current at 0
        # while the engine replans from its CHECKPOINTED offset. Clamp
        # the counter to the engine-reported range so latestOffset()
        # never again returns a value below the checkpoint — without
        # this, the engine would commit the regressed offset and later
        # batches would regenerate already-delivered global indices.
        self._current = max(self._current, lo, hi)
        if hi <= lo:
            return [InputPartition((lo, lo))]
        step = -(-(hi - lo) // self.num_partitions)
        return [
            InputPartition((i, min(i + step, hi))) for i in range(lo, hi, step)
        ]

    def read(self, partition: InputPartition):
        for row in _rows_for_range(
            partition.value[0], partition.value[1], self.seed, self.n_users, self.start
        ):
            yield row

    def commit(self, end: dict) -> None:
        pass


def _rows_for_range(lo: int, hi: int, seed: int, n_users: int, start: datetime):
    """Deterministic rows for global indices [lo, hi): content derives
    from (seed, index) alone — shared by the stream reader and tests
    (the replay-equality oracle)."""
    import numpy as np

    for idx in range(lo, hi):
        rng = np.random.default_rng((seed, idx))
        yield (
            idx,
            start + timedelta(seconds=idx),
            int(rng.integers(0, n_users)),
            EVENT_TYPES[int(rng.integers(0, len(EVENT_TYPES)))],
            round(float(rng.exponential(scale=20.0)), 2),
        )
