"""File-queue source/sink — reference parity for S7/S8.

The reference's file publisher writes ONE FILE PER EVENT: line 1 = event
ID, line 2 = raw JSON body, named ``<unixprefix>-event-<n>.dat``
(/root/reference/pkg/ingester/publisher/file/filepublisher.go:76-111); the
file aggregator polls a directory, parses the two lines, and deletes each
file after processing (pkg/aggregator/file/aggregator.go:115-217).

Spark-first mapping: ``wholetext`` read → split first line vs rest →
(id, value) rows — the same shape the Kafka source yields, so every
downstream plan is source-agnostic. Resume (`.pleiades_resumeID`) is
subsumed by checkpointing; delete-after-processing is the streaming file
source's ``cleanSource=delete`` option.

Scale note: one-file-per-event is pathological for any engine at 100 TB
(the reference documents it as a debugging path). The reader exists for
parity and migration; real deployments land events in Kafka or batched
parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pleiades_spark.session import apply_runtime_confs


def read_filequeue(spark: SparkSession, path: str) -> DataFrame:
    """Directory of 2-line event files → (id STRING, value STRING)."""
    apply_runtime_confs(spark)
    raw = spark.read.text(os.path.join(path, "*-event-*.dat"), wholetext=True)
    first_nl = F.instr(F.col("value"), "\n")
    return raw.select(
        F.substring(F.col("value"), 1, first_nl - 1).alias("id"),
        # rtrim() strips spaces only — trailing newline needs the regexp form
        F.regexp_replace(
            F.expr("substring(value, instr(value, '\\n') + 1)"), "[\\r\\n]+$", ""
        ).alias("value"),
    )


def write_filequeue(df: DataFrame, path: str, prefix: str = "0") -> int:
    """(id, value) rows → one ``<prefix>-event-<n>.dat`` file each.

    Distributed writer: each partition writes its own files from the
    executor (``mapPartitionsWithIndex``), so nothing funnels through the
    driver. File names carry (partition id, in-partition ordinal) —
    globally unique without any cross-partition coordination, and still
    matched by ``read_filequeue``'s ``*-event-*.dat`` glob. The format
    itself (one file per event, filepublisher.go:76-111) remains
    pathological at scale — see module note; the writer just stops being
    the extra bottleneck.

    ``path`` must be a filesystem every executor can see (NFS or a shared
    mount) for multi-node use — plain ``open()`` writes to the executor's
    local view of the path. Each partition task makedirs on its own node
    so the job doesn't depend on the driver sharing a disk with executors.
    """
    os.makedirs(path, exist_ok=True)

    def _write_partition(pid: int, rows) -> "list[int]":
        # runs on the executor — the driver-side makedirs above does not
        # exist on this node unless path is a shared filesystem
        os.makedirs(path, exist_ok=True)
        n = 0
        for row in rows:
            fname = os.path.join(path, f"{prefix}-event-{pid}-{n}.dat")
            with open(fname, "w") as f:
                f.write(f"{row['id']}\n{row['value']}\n")
            n += 1
        return [n]

    counts = (
        df.select("id", "value").rdd.mapPartitionsWithIndex(_write_partition).collect()
    )
    return sum(counts)
