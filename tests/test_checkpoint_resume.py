"""Exactly-once across restart: stop a streaming query mid-input, resume
from its checkpoint, and verify no event is lost or double-counted.

This is the engine replacement for the reference's hand-rolled resume-ID
recovery (kafkapublisher.go:133-239) and its at-least-once overcounting
(SURVEY.md §2.5): the checkpoint's offset log + idempotent dynamic-
partition foreachBatch gives exactly-once end-to-end.
"""

import datetime
import time

from pyspark.sql import functions as F

from pleiades_spark.streaming.pipeline import start_counters_to_parquet

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _write_batches(spark, base, n_files, rows_per_file):
    eid = 0
    for i in range(n_files):
        rows = []
        for _ in range(rows_per_file):
            rows.append((eid, TS, eid % 5, "click", 1.0, '{"k": 1}'))
            eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.parquet(f"{base}/f{i}")
    return eid


def _stream(spark, glob_path):
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob_path)
    )


def test_exactly_once_across_restart(spark, tmp_path):
    base = str(tmp_path / "in")
    out = str(tmp_path / "counters")
    ckpt = str(tmp_path / "ckpt")
    total_rows = _write_batches(spark, base, n_files=4, rows_per_file=25)

    # phase 1: process at least one micro-batch, then stop mid-input
    q = start_counters_to_parquet(spark, _stream(spark, base + "/f*"), out, ckpt)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if any(p["numInputRows"] > 0 for p in q.recentProgress):
                break
            time.sleep(0.2)
        else:
            raise AssertionError("stream made no progress before stop")
    finally:
        q.stop()
        q.awaitTermination()

    # phase 2: resume from the SAME checkpoint; replay must be idempotent
    q2 = start_counters_to_parquet(spark, _stream(spark, base + "/f*"), out, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
        q2.awaitTermination()

    counters = spark.read.parquet(out)
    total = (
        counters.filter(F.col("counter") == "pleiades_total")
        .agg(F.sum("events"))
        .collect()[0][0]
    )
    assert total == total_rows  # nothing lost, nothing double-counted


def test_partial_batch_preserves_sibling_counters(spark, tmp_path):
    """A micro-batch that updates a SUBSET of a day's counters must not
    delete that day's other counter rows.

    Update-mode batches carry only changed (window, counter) keys; if the
    sink overwrote whole day=X partitions, a later subset batch would
    silently drop the untouched counters. Batch 1 fires four counters;
    batch 2 (same day) fires only pleiades_total — the other three must
    survive.
    """
    base = str(tmp_path / "in")
    out = str(tmp_path / "counters")
    ckpt = str(tmp_path / "ckpt")

    # user_id=0 → bot; event_type=click → type; k=1 vs value=1.0 → value_dec
    spark.createDataFrame(
        [(0, TS, 0, "click", 1.0, '{"k": 1}')],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{base}/f0")

    q = start_counters_to_parquet(spark, _stream(spark, base + "/f*"), out, ckpt)
    try:
        q.processAllAvailable()
        # batch 2: odd user, empty type, malformed props → ONLY pleiades_total
        spark.createDataFrame(
            [(1, TS, 1, "", 2.0, "not json")],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.parquet(f"{base}/f1")
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()

    got = {
        r["counter"]: r["events"]
        for r in spark.read.parquet(out).select("counter", "events").collect()
    }
    assert got == {
        "pleiades_total": 2,
        "pleiades_type_click": 1,
        "pleiades_bot": 1,
        "pleiades_value_dec": 1,
    }


def test_available_now_drain_catches_up_then_exits(spark, tmp_path):
    """drain_counters_to_parquet: a scheduled catch-up run drains the
    whole backlog and returns; a second drain after new files arrive
    resumes from the shared checkpoint and folds them in — same counters
    as one continuous stream (the nightly-cron twin of the online query).
    """
    from pleiades_spark.streaming.pipeline import drain_counters_to_parquet

    base = str(tmp_path / "in")
    out = str(tmp_path / "counters")
    ckpt = str(tmp_path / "ckpt")
    _write_batches(spark, base, n_files=2, rows_per_file=20)

    drain_counters_to_parquet(spark, _stream(spark, base + "/f*"), out, ckpt)
    first = {
        (r.counter, r.events)
        for r in spark.read.parquet(out).select("counter", "events").collect()
    }
    assert ("pleiades_total", 40) in first

    # backlog grows while no job is running; next drain catches up
    _write_batches_offset(spark, base, start_file=2, n_files=2, rows_per_file=20)
    drain_counters_to_parquet(spark, _stream(spark, base + "/f*"), out, ckpt)
    final = {
        (r.counter, r.events)
        for r in spark.read.parquet(out).select("counter", "events").collect()
    }
    assert ("pleiades_total", 80) in final


def _write_batches_offset(spark, base, start_file, n_files, rows_per_file):
    eid = 100000 * start_file
    for i in range(start_file, start_file + n_files):
        rows = []
        for _ in range(rows_per_file):
            rows.append((eid, TS, eid % 5, "click", 1.0, '{"k": 1}'))
            eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.parquet(f"{base}/f{i}")
