"""Explicit schemas (streaming sources must never infer).

``RECENTCHANGE_SCHEMA`` mirrors the reference's event struct
(/root/reference/schema.json:1-196, pkg/aggregator/types.go:20-63; field
inventory documented in FIXTURES.md §A.1): the WMF mediawiki/recentchange
stream. ``log_params`` is a union type upstream — kept as raw JSON string,
parsed on demand with get_json_object.

``EVENTS_SCHEMA`` is the driver fixture's events table (used by the
streaming file source, which requires a declared schema).
"""

from __future__ import annotations

from pyspark.sql import types as T

RECENTCHANGE_SCHEMA = T.StructType(
    [
        T.StructField("$schema", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("uri", T.StringType()),
                    T.StructField("request_id", T.StringType()),
                    T.StructField("id", T.StringType()),
                    T.StructField("dt", T.StringType()),
                    T.StructField("domain", T.StringType()),
                    T.StructField("stream", T.StringType()),
                ]
            ),
        ),
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("namespace", T.IntegerType()),
        T.StructField("comment", T.StringType()),
        T.StructField("parsedcomment", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("user", T.StringType()),
        T.StructField("bot", T.BooleanType()),
        T.StructField("minor", T.BooleanType()),
        T.StructField("patrolled", T.BooleanType()),
        T.StructField("server_url", T.StringType()),
        T.StructField("server_name", T.StringType()),
        T.StructField("server_script_path", T.StringType()),
        T.StructField("wiki", T.StringType()),
        T.StructField(
            "length",
            T.StructType(
                [
                    T.StructField("old", T.LongType()),
                    T.StructField("new", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "revision",
            T.StructType(
                [
                    T.StructField("old", T.LongType()),
                    T.StructField("new", T.LongType()),
                ]
            ),
        ),
        T.StructField("log_id", T.LongType()),
        T.StructField("log_type", T.StringType()),
        T.StructField("log_action", T.StringType()),
        T.StructField("log_params", T.StringType()),
        T.StructField("log_action_comment", T.StringType()),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# events schema with the fixture's raw nanosecond timestamps (see
# catalog._NANOS_TS_COLS — streaming reads get the same conversion).
EVENTS_SCHEMA_NANOS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)
