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
        # Restart fast-forward: after checkpoint recovery Spark replays
        # the last uncommitted offset range on a FRESH reader whose
        # cursor is 0 — without this, latestOffset() would hand out
        # offsets BEHIND the committed one for ceil(committed/batch)
        # no-op cycles before catching up.  The planned range is the
        # engine's own committed truth, so adopting its high end is
        # always safe (and read() stays pure either way).
        self._cursor = max(self._cursor, hi)
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


# ---------------------------------------------------------------------------
# writer half of the API: an atomic JSONL sink with task-commit messages
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, temp_path: str, rows: int):
        self.temp_path, self.rows = temp_path, rows


class _AtomicJsonlWriter(DataSourceWriter):
    """Two-phase commit at the Python layer: each task writes to a
    ``_tmp-*`` file and returns its path as the commit message; the
    DRIVER's ``commit()`` renames all temp files into place in one
    pass and writes a ``_SUCCESS`` manifest listing them, so a reader
    that honors the manifest never sees a torn write.  ``abort()``
    deletes every temp file — a failed job leaves the directory
    byte-identical to before.  Speculative/retried tasks are safe:
    each attempt writes its own uuid temp file, and only the attempt
    whose message reaches commit() is renamed (losers are swept by
    the temp-prefix cleanup).  This is the same stage-then-publish
    contract as plans/pipeline.py's write-audit-publish, pushed down
    into a reusable ``format("atomic_jsonl")`` sink.

    Filesystem contract: commit() renames files the executors wrote,
    so the path must be a filesystem shared by executors and driver
    (local/NFS/HDFS-fuse — the FileOutputCommitter-v1 assumption).
    On rename-less object stores the protocol still holds but the
    rename step would become a manifest pointer swap."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.overwrite = options.get("__overwrite__", False)
        _os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> _JsonlCommit:
        tmp = _os.path.join(self.path, f"_tmp-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(recursive=True),
                                    default=str, sort_keys=True))
                f.write("\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages) -> None:
        if self.overwrite:  # publish time, after every task succeeded
            for f in _os.listdir(self.path):
                if f.startswith("part-") or f == "_SUCCESS":
                    _os.unlink(_os.path.join(self.path, f))
        finals, total = [], 0
        for i, m in enumerate(m for m in messages if m is not None):
            final = _os.path.join(self.path, f"part-{i:05d}.jsonl")
            _os.replace(m.temp_path, final)
            finals.append(_os.path.basename(final))
            total += m.rows
        for f in _os.listdir(self.path):  # sweep lost speculative tmps
            if f.startswith("_tmp-"):
                _os.unlink(_os.path.join(self.path, f))
        with open(_os.path.join(self.path, "_SUCCESS"), "w") as f:
            _json.dump({"files": finals, "rows": total}, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and _os.path.exists(m.temp_path):
                _os.unlink(m.temp_path)


class AtomicJsonlDataSource(DataSource):
    """``df.write.format("atomic_jsonl").save(path)``."""

    @classmethod
    def name(cls) -> str:
        return "atomic_jsonl"

    def writer(self, schema, overwrite: bool) -> _AtomicJsonlWriter:
        return _AtomicJsonlWriter(
            dict(self.options, __overwrite__=overwrite))


def register_atomic_jsonl(spark) -> None:
    spark.dataSource.register(AtomicJsonlDataSource)
