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
