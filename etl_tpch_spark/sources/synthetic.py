"""Custom Python DataSource (Spark 4 API): deterministic synthetic
event generator.

The reference generates load with an external DuckDB dbgen call writing
JSON files that a second stage re-reads (data.py:37-52, 110-121).  With
the Python DataSource API the generator IS a table: ``spark.read
.format("synthetic_events")`` plans one InputPartition per requested
partition, each executor synthesizes its own split — no staging files,
no driver bottleneck, load scales with the cluster exactly like a scan.

Determinism: every row is a pure function of (seed, partition, i) via a
splitmix64-style hash — same options ⇒ identical data on any cluster
layout, so tests and benchmarks are reproducible (the reference's
unseeded uuid4/np.random regeneration is not, SURVEY.md §7 risk a).

This is also the template for the multimodal side: a production
variant would yield pyarrow RecordBatches of (binary payload, metadata)
straight from object storage.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("view", "click", "purchase", "error")

_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer — cheap stateless per-row randomness."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


class _Split(InputPartition):
    def __init__(self, index: int):
        self.index = index


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_partitions = int(options.get("partitions", 4))
        self.rows = int(options.get("rowsperpartition", 1000))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("users", 100))
        start = options.get("start", "2024-01-01T00:00:00")
        self.start = datetime.fromisoformat(start).replace(
            tzinfo=timezone.utc
        )

    def partitions(self):
        return [_Split(i) for i in range(self.n_partitions)]

    def read(self, partition: _Split):
        base = partition.index * self.rows
        for i in range(self.rows):
            event_id = base + i
            h = _mix((self.seed << 32) ^ event_id)
            ts = self.start + timedelta(seconds=event_id)
            user_id = h % self.n_users
            event_type = EVENT_TYPES[(h >> 8) % len(EVENT_TYPES)]
            value = round(((h >> 16) % 100_000) / 100.0, 2)
            yield (event_id, ts, user_id, event_type, value)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("partitions", 8)
    .option("rowsPerPartition", 10000).option("seed", 7).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration of the data source with a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
