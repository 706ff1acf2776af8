"""Custom Python DataSource (Spark 4 DataSource V2 API): a deterministic
synthetic-events generator.

This is the engine's EXTENSION POINT demo — the idiomatic way to bolt a
new source format/system onto Spark without JVM code: subclass
``pyspark.sql.datasource.DataSource``, plan ``InputPartition``s on the
driver, and let every executor generate/fetch its own partition in
parallel (``spark.read.format("synthetic_events")`` after
``register_synthetic_events``).  The same API shape serves real
connectors (REST cursors, message queues, proprietary file formats);
generation here is a pure function of the row index so correctness is
checkable against a SQL oracle, and tests can mint arbitrary-size event
tables without shipping data.

100 TB posture: the driver only plans ``num_partitions`` lightweight
partition objects; row production happens executor-side with no driver
materialization, so scale-out is by partition count exactly like a file
scan (plan shows ``BatchScanExec`` with a Python data source).  Filters
are NOT pushed (pushFilters is left default) — a real connector should
implement it; for generated rows Spark's post-scan filter is already
parallel.

Row formulas (bit-exact in any engine, DuckDB twin in queries):
    event_id  = i
    user_id   = (i * 2654435761) % 9973          (Knuth multiplicative)
    event_type= ['view','click','purchase'][ (i * 48271) % 31 % 3 ]
    value     = ((i * 16807) % 100000) / 100.0
    ts        = epoch 2024-01-01 00:00:00 UTC + i seconds
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("view", "click", "purchase")
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, "
    "value double, ts timestamp"
)


def _row(i: int) -> tuple:
    return (
        i,
        (i * 2654435761) % 9973,
        EVENT_TYPES[(i * 48271) % 31 % 3],
        ((i * 16807) % 100000) / 100.0,
        (_EPOCH + timedelta(seconds=i)).replace(tzinfo=None),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self) -> list[InputPartition]:
        n, parts = self.n_rows, max(1, self.num_partitions)
        if n <= 0:
            return []  # empty source plans an empty scan, not a crash
        step = (n + parts - 1) // parts
        return [
            _RangePartition(lo, min(lo + step, n))
            for lo in range(0, n, step)
        ]

    def read(self, partition: _RangePartition | None) -> Iterator[tuple]:
        if partition is None:  # empty plan: Spark still issues one read
            return
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register_synthetic_events(spark: SparkSession) -> None:
    """Idempotent registration of the custom format on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
