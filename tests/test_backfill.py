"""Late-data backfill: the batch-recompute path that reconciles the
streaming counters table with events the watermark dropped.

The reference tolerates infinite lateness (every arriving event just
increments Redis); Spark bounds streaming state with a watermark, so
beyond-watermark stragglers are reconciled by backfill_counters — feed a
too-late event, prove the stream dropped it, prove backfill restores the
batch-oracle truth.
"""

import datetime

from pyspark.sql import functions as F

from pleiades_spark.functions.counters import derive_counters
from pleiades_spark.streaming.pipeline import (
    backfill_counters,
    start_counters_to_parquet,
)

EVT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
ON_TIME = datetime.datetime(2024, 2, 1, 12, 0, 0)  # day 19754
LATE = datetime.datetime(2024, 1, 1, 12, 0, 0)  # day 19723, ≫ 7d older


def _stream(spark, glob_path):
    return (
        spark.readStream.schema(EVT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob_path)
    )


def _batch_truth(spark, base):
    events = spark.read.schema(EVT_SCHEMA).parquet(f"{base}/f*")
    return {
        (r.day, r.counter): (r.events, r.growth)
        for r in derive_counters(events)
        .groupBy("day", "counter")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.round(F.sum("lendiff"), 4).alias("growth"),
        )
        .collect()
    }


def test_backfill_reconciles_dropped_late_event(spark, tmp_path):
    base = str(tmp_path / "archive")
    out = str(tmp_path / "counters")
    ckpt = str(tmp_path / "ckpt")

    on_time = [(i, ON_TIME, i, "click", 2.0, '{"k": 1}') for i in range(3)]
    spark.createDataFrame(on_time, EVT_SCHEMA).coalesce(1).write.parquet(f"{base}/f0")

    q = start_counters_to_parquet(spark, _stream(spark, base + "/f*"), out, ckpt)
    try:
        q.processAllAvailable()
        # a straggler a month older than the watermark (7d behind max ts)
        spark.createDataFrame(
            [(99, LATE, 1, "view", 5.0, '{"k": 2}')], EVT_SCHEMA
        ).coalesce(1).write.parquet(f"{base}/f1")
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()

    streamed = spark.read.parquet(out)
    late_day = 19723
    assert streamed.filter(F.col("day") == late_day).count() == 0  # dropped

    # plant a stale counter the authoritative recompute does not contain —
    # backfill must remove it, not just add the missing rows
    spark.createDataFrame(
        [(19754, "pleiades_stale", 7, 0.0)],
        "day long, counter string, events long, growth double",
    ).write.mode("append").partitionBy("day", "counter").parquet(out)

    archive = spark.read.schema(EVT_SCHEMA).parquet(f"{base}/f*")
    recomputed_days = backfill_counters(spark, archive, out)
    assert recomputed_days == [19723, 19754]

    got = {
        (r.day, r.counter): (r.events, float(r.growth))
        for r in spark.read.parquet(out).collect()
    }
    truth = {k: (v[0], float(v[1])) for k, v in _batch_truth(spark, base).items()}
    assert got == truth  # late day restored, stale counter gone, on-time intact
    assert (late_day, "pleiades_total") in got
    # stage-and-swap leaves no staging residue behind
    import os

    assert not [d for d in os.listdir(out) if d.startswith(".staging")]


def test_forget_user_purges_archive_and_reconciles_counters(spark, tmp_path):
    """Right-to-be-forgotten: the user's events leave the archive, the
    derived counters re-aggregate without them, untouched days stay."""
    from pleiades_spark.streaming.pipeline import forget_user, write_events_archive

    archive = str(tmp_path / "archive")
    out = str(tmp_path / "counters")
    day3 = datetime.datetime(2024, 2, 3, 9, 0, 0)  # day 19756
    rows = [
        (1, ON_TIME, 7, "click", 2.0, '{"k": 1}'),   # user 7, day 19754
        (2, ON_TIME, 8, "view", 1.0, '{"k": 1}'),    # user 8, day 19754
        (3, LATE, 7, "click", 3.0, '{"k": 1}'),      # user 7 ALONE on day 19723
        (4, day3, 8, "view", 4.0, '{"k": 2}'),       # user 8, day 19756 (untouched)
    ]
    events = spark.createDataFrame(rows, EVT_SCHEMA)
    write_events_archive(events, archive)
    backfill_counters(spark, spark.read.parquet(archive).drop("day"), out)

    touched = forget_user(spark, archive, out, user_id=7)
    assert touched == [19723, 19754]

    left = spark.read.parquet(archive)
    assert left.filter(F.col("user_id") == 7).count() == 0
    assert left.count() == 2
    # the user-7-only day is gone entirely from archive AND counters
    assert left.filter(F.col("day") == 19723).count() == 0
    counters = spark.read.parquet(out)
    assert counters.filter(F.col("day") == 19723).count() == 0
    # reconciled table equals a fresh batch aggregate over the clean archive
    got = {
        (r.day, r.counter): (r.events, float(r.growth))
        for r in counters.collect()
    }
    truth = {
        (r.day, r.counter): (r.events, float(r.growth))
        for r in derive_counters(left.drop("day"))
        .groupBy("day", "counter")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.round(F.sum("lendiff"), 4).alias("growth"),
        )
        .collect()
    }
    assert got == truth
    # idempotent: forgetting again is a no-op
    assert forget_user(spark, archive, out, user_id=7) == []


def test_backfill_targeted_days_leaves_other_days_alone(spark, tmp_path):
    base = str(tmp_path / "archive")
    out = str(tmp_path / "counters")

    rows = [(1, ON_TIME, 2, "click", 2.0, '{"k": 1}'), (2, LATE, 4, "view", 1.0, "x")]
    spark.createDataFrame(rows, EVT_SCHEMA).coalesce(1).write.parquet(f"{base}/f0")
    archive = spark.read.schema(EVT_SCHEMA).parquet(f"{base}/f*")

    # seed the table with BOTH days, then corrupt day 19754 and backfill
    # only the late day — the corrupted day must remain untouched
    backfill_counters(spark, archive, out)
    spark.createDataFrame(
        [(19754, "pleiades_planted", 1, 0.0)],
        "day long, counter string, events long, growth double",
    ).write.mode("append").partitionBy("day", "counter").parquet(out)

    assert backfill_counters(spark, archive, out, days=[19723]) == [19723]
    remaining = {
        r.counter for r in spark.read.parquet(out).filter(F.col("day") == 19754).collect()
    }
    assert "pleiades_planted" in remaining  # untouched day kept as-is


def test_reconcile_counters_flags_staged_drift(spark):
    """The exactly-once audit must FIRE, not just read zero: stage a
    counters table with one mutated growth, one missing counter, and one
    phantom extra row against the batch truth — each lands in its day's
    n_drift; untouched days reconcile to 0."""
    from pleiades_spark.streaming.pipeline import reconcile_counters

    schema = "day long, counter string, events long, growth double"
    batch = spark.createDataFrame(
        [
            (100, "pleiades_total", 10, 1.5),
            (100, "pleiades_bot", 4, 0.0),
            (101, "pleiades_total", 7, -2.0),
            (102, "pleiades_total", 3, 0.25),
        ],
        schema,
    )
    streamed = spark.createDataFrame(
        [
            (100, "pleiades_total", 10, 1.5),     # clean
            (100, "pleiades_bot", 4, 0.5),        # growth drifted
            (101, "pleiades_total", 7, -2.0),     # clean
            (101, "pleiades_phantom", 1, 0.0),    # sink-only extra
            # (102, pleiades_total) missing from the sink entirely
        ],
        schema,
    )
    got = {
        r["day"]: (r["n_counters"], r["events_total"], r["n_drift"])
        for r in reconcile_counters(streamed, batch).collect()
    }
    assert got[100] == (2, 14, 1)   # the mutated-growth row drifts
    assert got[101] == (2, 8, 1)    # phantom counts once, sums its events
    assert got[102] == (1, 3, 1)    # missing side is drift, not NULL==NULL


def test_reconcile_counters_tolerates_ulp_growth_difference(spark):
    """Order-dependent summation ULPs must NOT read as drift: the two
    sides sum lendiff in different orders (state-arrival vs shuffle), so
    pre-round doubles can differ in the last bits and round(,4) can flip
    the 4th decimal at an exact .xxxx5 boundary. Events still compare
    exactly — an events mismatch with equal growth IS drift."""
    from pleiades_spark.streaming.pipeline import reconcile_counters

    schema = "day long, counter string, events long, growth double"
    # 0.00005 below/above an exact representable: |Δ| = 1e-9 ≪ 5e-5 quantum
    batch = spark.createDataFrame(
        [(100, "pleiades_total", 10, 1.23450000), (101, "pleiades_total", 3, 2.0)],
        schema,
    )
    streamed = spark.createDataFrame(
        [(100, "pleiades_total", 10, 1.23450000 + 1e-9), (101, "pleiades_total", 4, 2.0)],
        schema,
    )
    got = {
        r["day"]: r["n_drift"]
        for r in reconcile_counters(streamed, batch).collect()
    }
    assert got[100] == 0   # ULP growth difference is not drift
    assert got[101] == 1   # exact events mismatch still fires
