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
