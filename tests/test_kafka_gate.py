"""Kafka path: what is executable WITHOUT the spark-sql-kafka package.

This image has no network and no Kafka jars (verified: Maven Central
unresolvable, no kafka jar anywhere on disk), so the S4/S9 connector
cannot run end-to-end here. These tests pin everything short of the
socket:

  * the record projection the producer path feeds to the sink (pure
    DataFrame, fully testable);
  * that the source builder fails FAST and NAMES the missing package
    when the connector isn't on the classpath — the operational failure
    mode a user actually hits — rather than dying mid-stream.

The e2e recipe once jars exist (spark-sql-kafka-0-10_2.13,
kafka-clients, spark-token-provider-kafka-0-10, commons-pool2 +a running
broker): publish N fixture events via write_kafka_batch, run
kafka_raw_stream → counters_stream → start_counters_to_parquet with a
checkpoint kill/resume, and hash-compare the table against
q_counters_rollup over the same events (VERDICT r01 next-round #1).
"""

import pytest

from pleiades_spark.streaming.kafka_sink import as_kafka_records
from pleiades_spark.streaming.pipeline import kafka_raw_stream


def test_as_kafka_records_projection(spark):
    df = spark.createDataFrame(
        [(7, '{"wiki":"x"}'), (None, "body")], "id int, value string"
    )
    rec = as_kafka_records(df)
    assert [(f.name, f.dataType.simpleString()) for f in rec.schema.fields] == [
        ("key", "string"),
        ("value", "string"),
    ]
    got = sorted(((r.key, r.value) for r in rec.collect()), key=str)
    assert got == [("7", '{"wiki":"x"}'), (None, "body")]


def test_kafka_source_fails_fast_naming_missing_package(spark):
    with pytest.raises(Exception) as ei:
        kafka_raw_stream(spark, "localhost:9092", "events")
    msg = str(ei.value)
    # Spark's DATA_SOURCE_NOT_FOUND names the source and the fix; if this
    # ever starts succeeding, the jars arrived — wire the real e2e then.
    assert "kafka" in msg.lower()
    assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg
