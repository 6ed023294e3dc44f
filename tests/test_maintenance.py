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


def test_compact_corpus_shards_roundtrip(spark, tmp_path):
    """Shard compaction: many per-micro-batch JSONL files per split →
    size-targeted file count, rename-atomic, content identical; a split
    already at its target is left untouched."""
    from pyspark.sql import functions as F

    from pleiades_spark.maintenance import compact_corpus_shards

    df = spark.createDataFrame(
        [(i, "en", "src0", f"text {i} " + "x" * 50, 0.9) for i in range(400)],
        "doc_id long, lang string, source string, text string, q double",
    ).withColumn(
        "split", F.when(F.col("doc_id") % 2 == 0, "train").otherwise("val")
    )
    shards = tmp_path / "shards"
    # simulate 8 micro-batch epochs -> 8+ files nested per split dir
    # (split=<name>/epoch=<id>/ — the idempotent-replay shard layout)
    for k in range(8):
        df.filter(F.col("doc_id") % 8 == k).withColumn(
            "epoch", F.lit(k)
        ).repartition(2).write.partitionBy("split", "epoch").mode(
            "append"
        ).json(str(shards))

    def files(split):
        d = shards / f"split={split}"
        return [p for p in d.rglob("*.json")
                if not p.name.startswith(("_", "."))]

    before = {
        s: sorted(
            r.doc_id
            for r in spark.read.schema(
                "doc_id long, lang string, source string, text string, q double"
            ).json(str(shards / f"split={s}")).collect()
        )
        for s in ("train", "val")
    }
    assert len(files("train")) > 1

    written = compact_corpus_shards(spark, str(shards))
    assert written == {"train": 1, "val": 1}
    for s in ("train", "val"):
        assert len(files(s)) == 1
        after = sorted(
            r.doc_id
            for r in spark.read.schema(
                "doc_id long, lang string, source string, text string, q double"
            ).json(str(shards / f"split={s}")).collect()
        )
        assert after == before[s]
    # second pass: already at target -> untouched (no rewrite entries)
    assert compact_corpus_shards(spark, str(shards)) == {}
    # the partition-discovering root read still sees both splits
    back = spark.read.schema(
        "doc_id long, lang string, source string, text string, q double"
    ).json(str(shards))
    assert back.count() == 400 and set(
        r.split for r in back.select("split").distinct().collect()
    ) == {"train", "val"}


def test_compact_corpus_shards_repairs_torn_swap(spark, tmp_path):
    """Crash-window repair: a previous run that died between the two
    swap renames leaves `.old_split=X` (and possibly `.compact_split=X`)
    with `split=X` missing — the next run must restore the split before
    compacting, in BOTH crash variants."""
    import shutil

    from pyspark.sql import functions as F

    from pleiades_spark.maintenance import compact_corpus_shards

    df = spark.createDataFrame(
        [(i, "en", "s", f"text {i} " + "x" * 50, 0.9) for i in range(100)],
        "doc_id long, lang string, source string, text string, q double",
    ).withColumn(
        "split", F.when(F.col("doc_id") % 2 == 0, "train").otherwise("val")
    )
    shards = tmp_path / "shards"
    for k in range(4):
        df.filter(F.col("doc_id") % 4 == k).withColumn(
            "epoch", F.lit(k)
        ).repartition(2).write.partitionBy("split", "epoch").mode(
            "append"
        ).json(str(shards))

    def split_ids(split):
        return sorted(
            r.doc_id
            for r in spark.read.schema(
                "doc_id long, lang string, source string, text string, q double"
            ).json(str(shards / f"split={split}")).collect()
        )

    want = {s: split_ids(s) for s in ("train", "val")}

    # variant 1: died after renaming part away, staged fully written ->
    # the staged dir must be promoted
    staged = shards / ".compact_split=train"
    shutil.copytree(shards / "split=train", staged)
    (shards / "split=train").rename(shards / ".old_split=train")
    compact_corpus_shards(spark, str(shards))
    assert split_ids("train") == want["train"]
    assert not (shards / ".old_split=train").exists()
    assert not (shards / ".compact_split=train").exists()

    # variant 2: died after renaming part away, no staged dir -> the old
    # dir must be restored
    (shards / "split=val").rename(shards / ".old_split=val")
    compact_corpus_shards(spark, str(shards))
    assert split_ids("val") == want["val"]
    assert not (shards / ".old_split=val").exists()
