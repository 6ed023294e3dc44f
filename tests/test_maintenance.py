"""Small-file compaction: fewer files, identical data, atomic swap."""

import glob
import os

from pyspark.sql import functions as F

from pleiades_spark.maintenance import compact_days


def _parquet_files(path):
    return glob.glob(os.path.join(path, "day=*", "*.parquet"))


def test_compact_days_reduces_files_preserves_data(spark, tmp_path):
    out = str(tmp_path / "table")
    df = spark.range(0, 2000).select(
        (F.col("id") % 3 + 19700).alias("day"),
        F.col("id").alias("k"),
        (F.col("id") * 2.5).alias("v"),
    )
    # simulate a chatty streaming sink: many tiny files per day
    df.repartition(24).write.partitionBy("day").parquet(out)
    before = len(_parquet_files(out))
    assert before >= 60  # 3 days x up to 24 files
    expect = sorted((r.day, r.k, float(r.v)) for r in spark.read.parquet(out).collect())

    written = compact_days(spark, out)
    assert set(written) == {19700, 19701, 19702}
    assert all(n == 1 for n in written.values())  # tiny days -> 1 file each
    after = _parquet_files(out)
    assert len(after) <= 6  # few files per day (shuffle may split buckets)
    assert len(after) < before
    got = sorted((r.day, r.k, float(r.v)) for r in spark.read.parquet(out).collect())
    assert got == expect
    assert not [d for d in os.listdir(out) if d.startswith(".staging")]


def test_compact_cli(spark, tmp_path, capsys):
    import json

    from pleiades_spark.cli import build_parser

    out = str(tmp_path / "table")
    spark.range(0, 600).select(
        (F.col("id") % 2 + 19700).alias("day"), F.col("id").alias("k")
    ).repartition(12).write.partitionBy("day").parquet(out)
    parser = build_parser()
    args = parser.parse_args(["compact", "--table", out, "--days", "19700"])
    assert args.fn(args) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got == {"19700": 1}
    assert len(_parquet_files(out)) < 24


def test_archive_lifecycle_backfill_compact_forget(spark, tmp_path):
    """The whole day-partitioned table lifecycle composes: land events in
    the archive, derive counters (backfill), compact the chatty files,
    then forget a user — counters stay consistent with the archive at
    every step."""
    import datetime

    from pleiades_spark.streaming.pipeline import (
        backfill_counters,
        forget_user,
        write_events_archive,
    )

    archive = str(tmp_path / "archive")
    counters = str(tmp_path / "counters")
    t0 = datetime.datetime(2024, 1, 5, 12, 0, 0)
    rows = [
        (i, t0 + datetime.timedelta(days=i % 3), 7 if i % 4 == 0 else 8,
         "click", float(i), '{"k": 1}')
        for i in range(60)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    # land with many small files to give compaction something to do
    write_events_archive(events.repartition(12), archive)
    days = backfill_counters(
        spark, spark.read.parquet(archive).drop("day"), counters
    )
    assert len(days) == 3
    before = {
        (r.day, r.counter): (r.events, float(r.growth))
        for r in spark.read.parquet(counters).collect()
    }

    compacted = compact_days(spark, archive)
    assert set(compacted) == set(days)
    # compaction must not change derived results
    backfill_counters(spark, spark.read.parquet(archive).drop("day"), counters)
    after = {
        (r.day, r.counter): (r.events, float(r.growth))
        for r in spark.read.parquet(counters).collect()
    }
    assert after == before

    touched = forget_user(spark, archive, counters, user_id=7)
    assert touched == days  # user 7 appears on every day
    left = spark.read.parquet(archive)
    assert left.filter(F.col("user_id") == 7).count() == 0
    total = spark.read.parquet(counters).filter(
        F.col("counter") == "pleiades_total"
    )
    assert {r.events for r in total.collect()} == {
        r["count"] for r in left.groupBy("day").count().collect()
    }


def test_compact_days_targets_only_requested_days(spark, tmp_path):
    out = str(tmp_path / "table")
    df = spark.range(0, 300).select(
        (F.col("id") % 2 + 19700).alias("day"), F.col("id").alias("k")
    )
    df.repartition(10).write.partitionBy("day").parquet(out)
    files_day1 = len(glob.glob(os.path.join(out, "day=19701", "*.parquet")))
    compact_days(spark, out, days=[19700])
    assert len(glob.glob(os.path.join(out, "day=19700", "*.parquet"))) < 10
    # untouched day keeps its original files
    assert len(glob.glob(os.path.join(out, "day=19701", "*.parquet"))) == files_day1
