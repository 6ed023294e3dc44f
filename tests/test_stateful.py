"""Tests for the custom stateful streaming operators.

Each drives a real streaming query over a rate-limited file source so
MULTIPLE micro-batches exercise cross-batch state (maxFilesPerTrigger
can't split one file, so inputs are written as several files).
"""

import datetime
import importlib.util

import pytest
from pyspark.sql import functions as F

from pleiades_spark.streaming.stateful import (
    running_user_totals,
    running_user_totals_tws,
    streaming_dedup,
)

# transformWithState's Python worker speaks protobuf to the JVM state
# server; without the protobuf package the stream crashes at init. Gate
# like the Kafka tests: assert the wiring imports, run e2e only when the
# dependency exists (stateful.py _RunningTotalsProcessor docstring).
HAS_PROTOBUF = (
    importlib.util.find_spec("google") is not None
    and importlib.util.find_spec("google.protobuf") is not None
)

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _write_event_files(spark, base, batches):
    """Each element of ``batches`` becomes one file → one micro-batch."""
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        df.coalesce(1).write.parquet(f"{base}/b{i}")
    return [f"{base}/b{i}" for i in range(len(batches))]


def _stream(spark, glob_path):
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob_path)
    )


def test_running_user_totals_across_batches(spark, tmp_path):
    base = str(tmp_path / "in")
    _write_event_files(
        spark,
        base,
        [
            [(1, TS, 7, "click", 10.0), (2, TS, 7, "view", 5.0)],
            [(3, TS, 7, "click", 1.0), (4, TS, 9, "view", 2.0)],
        ],
    )
    out = running_user_totals(_stream(spark, base + "/b*"))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    # update mode: take the LAST emission per user
    rows = spark.sql(
        "SELECT user_id, n_events, total_value FROM running_totals"
    ).collect()
    latest = {}
    for r in rows:  # memory sink appends update rows in order
        latest[r.user_id] = (r.n_events, r.total_value)
    assert latest[7] == (3, 16.0)
    assert latest[9] == (1, 2.0)


def test_tws_plan_builds_without_protobuf(spark, tmp_path):
    """The transformWithState plan must CONSTRUCT everywhere (API wiring,
    schemas, output mode) — only execution needs protobuf."""
    base = str(tmp_path / "in")
    _write_event_files(spark, base, [[(1, TS, 7, "click", 10.0)]])
    out = running_user_totals_tws(_stream(spark, base + "/b*"))
    assert [f.name for f in out.schema.fields] == ["user_id", "n_events", "total_value"]


@pytest.mark.skipif(not HAS_PROTOBUF, reason="transformWithState needs protobuf")
def test_tws_running_totals_across_batches(spark, tmp_path):
    base = str(tmp_path / "in")
    _write_event_files(
        spark,
        base,
        [
            [(1, TS, 7, "click", 10.0), (2, TS, 7, "view", 5.0)],
            [(3, TS, 7, "click", 1.0), (4, TS, 9, "view", 2.0)],
        ],
    )
    out = running_user_totals_tws(_stream(spark, base + "/b*"))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_totals")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    rows = spark.sql("SELECT user_id, n_events, total_value FROM tws_totals").collect()
    latest = {}
    for r in rows:
        latest[r.user_id] = (r.n_events, r.total_value)
    assert latest[7] == (3, 16.0)
    assert latest[9] == (1, 2.0)


def test_streaming_dedup_across_batches(spark, tmp_path):
    base = str(tmp_path / "in")
    _write_event_files(
        spark,
        base,
        [
            [(1, TS, 7, "click", 10.0), (1, TS, 7, "click", 10.0)],  # in-batch dup
            [(1, TS, 7, "click", 10.0), (2, TS, 7, "view", 5.0)],  # cross-batch dup
        ],
    )
    out = streaming_dedup(_stream(spark, base + "/b*"))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("deduped")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    rows = spark.sql("SELECT event_id FROM deduped").collect()
    assert sorted(r.event_id for r in rows) == [1, 2]
