"""Kafka sink helpers (S4) — reference parity for the ingest publisher.

The reference's producer (pkg/ingester/publisher/kafka/kafkapublisher.go:
51-58) writes key=event ID, value=raw body with BatchSize=100 / async /
acks=0. Spark's Kafka sink takes the same shape: a (key, value) frame plus
producer configs. Requires the spark-sql-kafka package on the classpath —
absent in this image, so these builders are exercised only up to plan
construction in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def as_kafka_records(df: DataFrame, key_col: str = "id", value_col: str = "value") -> DataFrame:
    """Project any (id, value) frame into the Kafka sink's expected schema."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    )


def write_kafka_batch(
    df: DataFrame, bootstrap: str, topic: str, acks: str = "0", batch_size: int = 100
) -> None:
    """Batch write to Kafka with the reference's throughput posture
    (acks=0, batched) — exposed as plain producer options."""
    (
        as_kafka_records(df)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("kafka.acks", acks)
        .option("kafka.batch.size", str(batch_size))
        .save()
    )


def start_kafka_stream(
    df: DataFrame, bootstrap: str, topic: str, checkpoint: str
) -> StreamingQuery:
    """Streaming write; checkpoint replaces the reference's resume-ID dance
    (kafkapublisher.go:133-239)."""
    return (
        as_kafka_records(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
