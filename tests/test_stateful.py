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


class _StubState:
    """Minimal GroupState stand-in for unit-testing state functions."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_dedup_bounded_prunes_state_and_keeps_floor_monotone():
    """Horizon-bounded dedup state (round 12): ids below
    max_day − horizon are pruned on every update (state size bounded by
    the horizon window, not history), re-deliveries within the horizon
    drop, and max_day stays monotone even when every stored id ages out."""
    import pandas as pd

    from pleiades_spark.streaming.stateful import _dedup_bounded

    fn = _dedup_bounded(5)
    state = _StubState()

    def batch(rows):  # rows: (event_id, day)
        return pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.Timestamp("2024-01-01"),
                "user_id": 7,
                "event_type": "click",
                "value": 1.0,
                "_day": [r[1] for r in rows],
            }
        )

    out = list(fn((0,), [batch([(1, 0), (2, 0)])], state))
    assert sorted(out[0]["event_id"]) == [1, 2]
    assert state.get == ([1, 2], [0, 0], 0)

    # within horizon: re-delivery of 2 drops; id 3 fresh at day 1
    out = list(fn((0,), [batch([(2, 1), (3, 1)])], state))
    assert sorted(out[0]["event_id"]) == [3]
    # a dropped re-delivery does NOT refresh its day: lifetime anchors
    # to first sighting (dropDuplicatesWithinWatermark semantics)
    assert state.get == ([1, 2, 3], [0, 0, 1], 1)

    # day 10: the floor is LAGGED (Spark watermark semantics — lateness
    # judged against PREVIOUS batches' max): floor = 1 − 5, so nothing
    # is pruned yet and the re-delivery of id 1 still drops; the fresh
    # id 4 passes and max_day advances to 10 for the NEXT batch
    out = list(fn((0,), [batch([(1, 10), (4, 10)])], state))
    assert sorted(out[0]["event_id"]) == [4]
    assert state.get == ([1, 2, 3, 4], [0, 0, 1, 10], 10)

    # next batch: floor = 10 − 5 prunes the day-0/1 ids, so a too-late
    # event passes through; max_day must not move backwards
    out = list(fn((0,), [batch([(9, 2)])], state))
    assert sorted(out[0]["event_id"]) == [9]  # too late to dedup: passes
    assert state.get == ([4, 9], [10, 2], 10)  # bounded + monotone floor
    # ...and 9 (day 2 < 10−5) is pruned on the NEXT update
    list(fn((0,), [batch([(11, 10)])], state))
    assert 9 not in state.get[0]


def test_streaming_dedup_sharded_horizon_e2e(spark, tmp_path):
    """The bounded variant on a real stream: within-horizon re-delivery
    drops, beyond-horizon re-delivery passes through (its original was
    pruned), fresh ids always pass. horizon_days=None (the gate path)
    keeps the exact unbounded semantics."""
    import datetime

    from pleiades_spark.streaming.stateful import streaming_dedup_sharded

    def day(d):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)

    base = str(tmp_path / "in")
    _write_event_files(
        spark,
        base,
        [
            [(1, day(0), 7, "click", 1.0), (2, day(0), 7, "view", 2.0)],
            [(2, day(1), 7, "view", 2.0), (3, day(1), 7, "click", 3.0)],
            [(1, day(10), 7, "click", 1.0), (4, day(10), 7, "view", 4.0)],
            [(1, day(10), 7, "click", 1.0), (3, day(10), 7, "click", 3.0)],
        ],
    )
    out = streaming_dedup_sharded(
        _stream(spark, base + "/b*"), n_shards=2, horizon_days=5
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dd_bounded")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    rows = spark.sql("SELECT event_id, ts FROM dd_bounded").collect()
    got = sorted((r.event_id, r.ts.day) for r in rows)
    # batch1: 1,2 fresh; batch2: 2 dropped (within horizon), 3 fresh;
    # batch3 at day 10: LAGGED floor = 1−5 → re-delivery of 1 still
    # drops, fresh 4 passes, max_day advances to 10; batch4: floor =
    # 10−5 = 5 prunes the day-0/1 originals → both re-deliveries pass
    assert got == [(1, 1), (1, 11), (2, 1), (3, 2), (3, 11), (4, 11)]
