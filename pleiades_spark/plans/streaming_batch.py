"""Streaming execution inside the correctness gate (SURVEY.md §7 M3).

``streaming_counters`` actually RUNS a Structured Streaming query — file
source → watermark → 1-day tumbling window aggregation → memory sink,
driven to completion with processAllAvailable — then returns the sink
contents as a batch DataFrame. The oracle recomputes the same result in
SQL, so the gate covers the streaming execution path end-to-end, not just
a batch re-statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pleiades_spark.plans import Query
from pleiades_spark.streaming.pipeline import run_counters_to_memory


def q_streaming_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    mem = run_counters_to_memory(
        spark, f"{sf_dir}/events.parquet", query_name="counters_mem_gate"
    )
    return mem.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day_date"),
        "counter",
        "events",
        "growth",
    )


ORACLE_STREAMING_COUNTERS = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_date, counter,
       count(*) AS events, round(sum(lendiff), 4) AS growth
FROM (
  SELECT ts,
         unnest(list_filter([
            'pleiades_total',
            CASE WHEN event_type IS NOT NULL AND event_type <> ''
                 THEN 'pleiades_type_' || event_type END,
            CASE WHEN user_id % 2 = 0 THEN 'pleiades_bot' END,
            CASE WHEN k IS NOT NULL THEN
              (CASE WHEN value > k THEN 'pleiades_value_inc'
                    ELSE 'pleiades_value_dec' END) END
         ], x -> x IS NOT NULL)) AS counter,
         coalesce(value - k, 0) AS lendiff
  FROM (SELECT *, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
) GROUP BY day_date, counter
"""


QUERIES = [
    Query("streaming_counters", q_streaming_counters, ORACLE_STREAMING_COUNTERS,
          "real Structured Streaming run: file source → window agg → memory sink"),
]
