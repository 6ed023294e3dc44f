"""Structured Streaming pipeline tests (memory sink + parquet foreachBatch)."""

from pyspark.sql import functions as F

from pleiades_spark.streaming.pipeline import (
    events_file_stream,
    run_counters_to_memory,
    start_counters_to_parquet,
)


def test_memory_sink_matches_batch(spark, sf_dir):
    from pleiades_spark import catalog
    from pleiades_spark.functions.counters import derive_counters

    mem = run_counters_to_memory(
        spark, f"{sf_dir}/events.parquet", query_name="counters_mem_test"
    )
    got_total = {
        r["d"]: r["events"]
        for r in mem.filter(F.col("counter") == "pleiades_total")
        .select(F.date_format("win.start", "yyyy-MM-dd").alias("d"), "events")
        .collect()
    }
    batch = (
        derive_counters(catalog.load(spark, sf_dir, "events"))
        .filter(F.col("counter") == "pleiades_total")
        .groupBy("day")
        .count()
    )
    want_total = {
        r["d"]: r["count"]
        for r in batch.select(
            F.date_format(F.timestamp_seconds(F.col("day") * 86400), "yyyy-MM-dd").alias("d"),
            "count",
        ).collect()
    }
    assert got_total == want_total


def test_foreachbatch_parquet_sink(spark, sf_dir, tmp_path):
    out = str(tmp_path / "counters")
    ckpt = str(tmp_path / "ckpt")
    q = start_counters_to_parquet(
        spark, events_file_stream(spark, f"{sf_dir}/events.parquet"), out, ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    counters = spark.read.parquet(out)
    assert set(counters.columns) == {"counter", "events", "growth", "day"}
    total = (
        counters.filter(F.col("counter") == "pleiades_total")
        .agg(F.sum("events").alias("n"))
        .collect()[0]["n"]
    )
    assert total == 1000  # sf0.001 events rows
