"""RocksDB state store + observe() metrics on the streaming pipeline."""

from pyspark.sql import functions as F

from pleiades_spark.streaming.pipeline import (
    ROCKSDB_PROVIDER,
    counters_stream,
    events_file_stream,
    use_rocksdb_state,
)


def test_rocksdb_state_store_runs_and_observes(spark, sf_dir, tmp_path):
    use_rocksdb_state(spark)
    try:
        agg = counters_stream(events_file_stream(spark, f"{sf_dir}/events.parquet"))
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocksdb_counters")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            progress = q.recentProgress
        finally:
            q.stop()
            q.awaitTermination()
        # provider conf is authoritative (progress JSON doesn't name it)
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        # observe() metrics surfaced per batch: all 1000 sf0.001 rows seen,
        # none malformed (every fixture payload has k)
        observed = [
            p["observedMetrics"]["ingest"]
            for p in progress
            if "observedMetrics" in p and "ingest" in p["observedMetrics"]
        ]
        assert sum(m["rows"] for m in observed) == 1000
        assert all(m["malformed"] == 0 for m in observed)
        # and the aggregation result is intact under RocksDB state
        total = (
            spark.table("rocksdb_counters")
            .filter(F.col("counter") == "pleiades_total")
            .agg(F.sum("events"))
            .collect()[0][0]
        )
        assert total == 1000
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_choose_state_store_both_sides_of_threshold(spark):
    """Round-13 auto-selection guard: estimated state volume vs heap —
    under the fraction stays on the measured-faster HDFS provider, over
    it flips to RocksDB (the regime where HDFS fails outright at sf100,
    BENCH_SF100.md)."""
    from pleiades_spark.streaming.pipeline import (
        HEAP_STATE_FRACTION,
        choose_state_store,
    )

    heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
    assert choose_state_store(spark, 0.5 * HEAP_STATE_FRACTION * heap) == "hdfs"
    assert choose_state_store(spark, 2.0 * HEAP_STATE_FRACTION * heap) == "rocksdb"


def test_auto_state_store_wiring_and_env_precedence(spark, monkeypatch):
    from pleiades_spark.plans.streaming_batch import _rocksdb_state

    key = "spark.sql.streaming.stateStore.providerClass"
    heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())

    monkeypatch.delenv("PLEIADES_STATE_STORE", raising=False)
    with _rocksdb_state(spark, est_state_bytes=heap):  # way over threshold
        assert "RocksDB" in spark.conf.get(key)
    assert spark.conf.get(key, None) is None  # restored after the scope
    with _rocksdb_state(spark, est_state_bytes=1.0):  # way under
        assert "RocksDB" not in (spark.conf.get(key, "") or "")

    # the explicit knob overrides the estimate in BOTH directions
    monkeypatch.setenv("PLEIADES_STATE_STORE", "hdfs")
    with _rocksdb_state(spark, est_state_bytes=heap):
        assert "RocksDB" not in (spark.conf.get(key, "") or "")
    monkeypatch.setenv("PLEIADES_STATE_STORE", "rocksdb")
    with _rocksdb_state(spark, est_state_bytes=1.0):
        assert "RocksDB" in spark.conf.get(key)
