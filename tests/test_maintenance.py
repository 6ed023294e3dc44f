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
