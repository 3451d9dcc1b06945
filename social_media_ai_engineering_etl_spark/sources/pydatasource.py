"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic-events generator, batch AND streaming.

Why it exists: load/soak testing and streaming demos need an input
that (a) needs no files, (b) parallelizes across executors, and
(c) is bit-reproducible so results are oracle-checkable.  The Spark 4
Python DataSource API (`spark.dataSource.register` +
``format("synthetic_events")``) is the engine-native way to add such a
source — this module exercises the full surface: batch
``DataSourceReader`` with range-split ``partitions()``, and a
``DataSourceStreamReader`` with real offset bookkeeping
(initialOffset/latestOffset/partitions/read/commit), so micro-batches
replay identically after a restart from the checkpointed offset.

Determinism contract: row ``i`` (a global index) is a pure function of
``i`` via two MINSTD LCG rounds — ``h = 48271*(i+1) mod (2^31-1)``,
``h2 = 69621*h mod (2^31-1)`` — all intermediates < 2^47, so the same
arithmetic runs exactly in DuckDB SQL (``generate_series`` oracle in
queries/pydatasource_queries.py) and in any other engine with 64-bit
integers.  No numpy, no RNG state: partition boundaries cannot change
values, only who computes them (input-layout invariance by
construction).

At scale: the generator is embarrassingly parallel (one range per
partition, zero shuffle, zero driver data), so a 1000-executor cluster
generates 10^12 rows with the same code path local[32] tests.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_M = 2147483647  # 2^31 - 1 (MINSTD modulus)
_EVENT_TYPES = ("view", "click", "cart", "purchase", "share")
_BASE_TS = _dt.datetime(2024, 1, 1, 0, 0, 0)

SCHEMA = ("event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
          "event_type STRING, value DOUBLE")


def gen_row(i: int) -> tuple:
    """Row ``i`` of the synthetic stream — pure, engine-portable."""
    h = (48271 * (i + 1)) % _M
    h2 = (69621 * h) % _M
    return (
        i,
        _BASE_TS + _dt.timedelta(seconds=i),
        h % 1000,
        _EVENT_TYPES[h % 5],
        (h2 % 50000) / 100.0,
    )


def _gen_range(start: int, end: int) -> Iterator[tuple]:
    for i in range(start, end):
        yield gen_row(i)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _SyntheticBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 100_000))
        self.parts = max(1, int(options.get("numpartitions", 8)))

    def partitions(self):
        step = -(-self.rows // self.parts)
        return [_RangePartition(lo, min(lo + step, self.rows))
                for lo in range(0, self.rows, step)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _gen_range(partition.start, partition.end)


class _SyntheticStreamReader(DataSourceStreamReader):
    """Micro-batched view of the same row space.  The offset is the
    global row index (a dict, checkpoint-JSON-serializable); each
    ``latestOffset`` call advances by ``rowsPerBatch`` up to
    ``maxRows``, and ``partitions(start, end)`` re-derives the SAME
    rows for any (start, end) — replay after failure is identical by
    construction, which is exactly the contract Structured Streaming
    needs from a source for exactly-once sinks."""

    def __init__(self, options: dict):
        self.per_batch = int(options.get("rowsperbatch", 1000))
        self.max_rows = int(options.get("maxrows", 10_000))
        self.parts = max(1, int(options.get("numpartitions", 4)))
        self._cursor = 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        self._cursor = min(self._cursor + self.per_batch, self.max_rows)
        return {"index": self._cursor}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["index"]), int(end["index"])
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = -(-(hi - lo) // self.parts)
        return [_RangePartition(a, min(a + step, hi))
                for a in range(lo, hi, step)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _gen_range(partition.start, partition.end)

    def commit(self, end: dict) -> None:  # offsets need no cleanup
        pass


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` — options: rows (batch),
    numPartitions, rowsPerBatch / maxRows (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _SyntheticBatchReader:
        return _SyntheticBatchReader(self.options)

    def streamReader(self, schema) -> _SyntheticStreamReader:
        return _SyntheticStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(SyntheticEventsDataSource)
