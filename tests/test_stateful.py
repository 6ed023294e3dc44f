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


def test_sharded_state_variants_match_per_key_grain(spark, tmp_path):
    """State sharding (round 11) must be invisible in the output: the
    bucket-keyed running totals / dedup emit exactly the per-user
    variants' rows — same users, same all-time totals per batch, same
    surviving events — across multi-batch state. n_shards=2 forces
    several users to SHARE a bucket, exercising the in-bucket per-user
    bookkeeping."""
    from pleiades_spark.streaming.stateful import (
        running_user_totals_sharded,
        streaming_dedup_sharded,
    )

    base = str(tmp_path / "in")
    _write_event_files(
        spark,
        base,
        [
            [
                (1, TS, 7, "click", 10.25),
                (2, TS, 8, "view", 5.5),
                (3, TS, 9, "click", 1.0),
                (3, TS, 9, "click", 1.0),  # in-batch dup
            ],
            [
                (3, TS, 9, "click", 1.0),  # cross-batch dup
                (4, TS, 7, "view", 2.75),
                (5, TS, 11, "click", 4.0),
            ],
        ],
    )

    def drain(df, mode, name):
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
        return spark.table(name)

    tot_user = drain(
        running_user_totals(_stream(spark, base + "/b*")), "update", "rt_user"
    ).collect()
    tot_shard = drain(
        running_user_totals_sharded(_stream(spark, base + "/b*"), n_shards=2),
        "update",
        "rt_shard",
    ).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r.user_id, r.n_events, r.total_value) for r in rows
    )
    assert key(tot_user) == key(tot_shard)

    ded_user = drain(
        streaming_dedup(_stream(spark, base + "/b*")), "append", "dd_user"
    ).collect()
    ded_shard = drain(
        streaming_dedup_sharded(_stream(spark, base + "/b*"), n_shards=2),
        "append",
        "dd_shard",
    ).collect()
    dkey = lambda rows: sorted(  # noqa: E731
        (r.event_id, r.user_id, r.event_type, r.value) for r in rows
    )
    assert dkey(ded_user) == dkey(ded_shard)
