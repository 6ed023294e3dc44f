"""The reference's file queue as a NATIVE Spark 4 Python DataSource.

``sources/filequeue.py`` maps the 2-line-per-event format (line 1 = event
ID, line 2 = raw JSON body — filepublisher.go:102-104) onto wholetext
reads and an RDD writer. This module goes one step further and registers
the format as a first-class connector:

    spark.dataSource.register(FileQueueDataSource)
    spark.read.format("pleiades_filequeue").load(path)          # S8 batch
    df.write.format("pleiades_filequeue").mode(...).save(path)  # S7 sink
    spark.readStream.format("pleiades_filequeue")               # S8 poll
         .option("cleanSource", "delete").load(path)

The streaming reader reproduces the aggregator's poll-then-DELETE
semantics (file/aggregator.go:115-217) natively: the offset is the
number of files consumed in sorted order (the reference names files with
a monotonically increasing ordinal, so sorted order IS arrival order),
and ``commit`` unlinks consumed files when ``cleanSource=delete``.

Scale honesty: one file per event is the reference's debugging path and
stays pathological at scale regardless of connector plumbing (module
note in filequeue.py). The value here is the connector surface itself —
partition planning, executor-side reads, commit-time cleanup — on the
public Python DataSource API, no JVM code.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    StringStartsWith,
    WriterCommitMessage,
)

SCHEMA = "id string, value string"
GLOB = "*-event-*.dat"


def _list_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, GLOB)))


def _parse(fname: str) -> tuple[str, str]:
    with open(fname) as f:
        text = f.read()
    first_nl = text.find("\n")
    # Strip a CRLF file's trailing '\r' from the id so this path agrees
    # with the pushdown reader (which uses readline().rstrip()) — the
    # same query must yield the same ids whether or not a predicate was
    # pushed.
    return text[:first_nl].rstrip("\r"), text[first_nl + 1 :].rstrip("\r\n")


class _FilesPartition(InputPartition):
    def __init__(self, files: list[str]):
        self.files = files


class FileQueueBatchReader(DataSourceReader):
    """Batch reader with ``id``-filter pushdown (Spark 4.1 pushFilters).

    The queue format puts the event ID on line 1 and the (much larger)
    body on line 2+ — so EqualTo / In / StringStartsWith predicates on
    ``id`` evaluate after reading ONLY the first line, and rejected
    files never have their bodies materialized. That is the native
    pushdown this source can honestly offer (file names carry arrival
    ordinals, not IDs, so listing-level pruning isn't possible);
    everything else stays a residual filter for Spark.
    """

    def __init__(self, options):
        self.path = options.get("path")
        self.n = int(options.get("numPartitions", "8"))
        self.pushed: list = []

    def pushFilters(self, filters):
        for f in filters:
            if (
                isinstance(f, (EqualTo, In, StringStartsWith))
                and tuple(f.attribute) == ("id",)
            ):
                self.pushed.append(f)
            else:
                yield f

    def _id_ok(self, event_id: str) -> bool:
        for f in self.pushed:
            if isinstance(f, EqualTo) and event_id != f.value:
                return False
            if isinstance(f, In) and event_id not in f.value:
                return False
            if isinstance(f, StringStartsWith) and not event_id.startswith(
                f.value
            ):
                return False
        return True

    def partitions(self) -> Sequence[InputPartition]:
        files = _list_files(self.path)
        chunks = [files[i :: self.n] for i in range(self.n)]
        return [_FilesPartition(c) for c in chunks if c]

    def read(self, partition: _FilesPartition) -> Iterator[tuple]:
        if not self.pushed:
            for fname in partition.files:
                yield _parse(fname)
            return
        for fname in partition.files:
            with open(fname) as f:
                event_id = f.readline().rstrip("\r\n")
                if not self._id_ok(event_id):
                    continue  # body never read
                yield event_id, f.read().rstrip("\r\n")


class FileQueueStreamReader(SimpleDataSourceStreamReader):
    """Offset = cumulative count of consumed files.

    Without ``cleanSource=delete`` the queue dir is append-only and the
    offset indexes the sorted listing directly (the reference's ordinal
    file names make sorted order = arrival order). With delete, consumed
    files vanish at commit, so everything currently listed is by
    definition unconsumed — the offset stays a monotone consumed-count
    and each read drains the current listing. Replay
    (readBetweenOffsets) is impossible for a destructive queue, exactly
    like the reference's consume-then-delete aggregator — it raises
    rather than silently returning nothing.
    """

    def __init__(self, options):
        self.path = options.get("path")
        self.clean = options.get("cleanSource", "").lower() == "delete"
        self._pending: dict[int, list[str]] = {}  # end offset -> files
        # read-but-not-yet-deleted files: Spark prefetches the next batch
        # BEFORE committing the previous one, so "everything currently
        # listed" would double-read; the reader (driver-side, like every
        # SimpleDataSourceStreamReader) remembers what it already handed
        # out. After a restart the set is empty and so are the committed
        # files — consistent.
        self._seen: set[str] = set()

    def initialOffset(self) -> dict:
        return {"n": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        files = _list_files(self.path)
        if self.clean:
            batch = [f for f in files if f not in self._seen]
            self._seen.update(batch)
        else:
            batch = files[start["n"] :]
        end = start["n"] + len(batch)
        if self.clean and batch:
            self._pending[end] = batch
        return iter([_parse(f) for f in batch]), {"n": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        if self.clean:
            raise RuntimeError(
                "pleiades_filequeue with cleanSource=delete is a destructive "
                "queue: consumed files are gone, offsets cannot be replayed "
                "(reference parity: file/aggregator.go deletes after read)"
            )
        files = _list_files(self.path)
        return iter([_parse(f) for f in files[start["n"] : end["n"]]])

    def commit(self, end: dict) -> None:
        # poll-then-delete (file/aggregator.go:151-217): committed files
        # are consumed exactly once, then removed from the queue dir.
        for key in sorted(k for k in self._pending if k <= end["n"]):
            for f in self._pending.pop(key):
                try:
                    os.unlink(f)
                except FileNotFoundError:
                    pass
                self._seen.discard(f)


class _WrittenFiles(WriterCommitMessage):
    def __init__(self, n: int):
        self.n = n


class FileQueueWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        self.prefix = options.get("prefix", "0")
        self.overwrite = overwrite

    def write(self, iterator) -> _WrittenFiles:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        n = 0
        for row in iterator:
            fname = os.path.join(
                self.path, f"{self.prefix}-event-{pid}-{n}.dat"
            )
            with open(fname, "w") as f:
                f.write(f"{row['id']}\n{row['value']}\n")
            n += 1
        return _WrittenFiles(n)

    def commit(self, messages) -> None:
        pass

    def abort(self, messages) -> None:
        pass


class FileQueueDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pleiades_filequeue"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return FileQueueBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return FileQueueStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return FileQueueWriter(self.options, overwrite)
