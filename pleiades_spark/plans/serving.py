"""Serving-layer queries (SURVEY.md §3.3, M4) — the REST API re-expressed
server-side over the materialized counters.

The reference serves three endpoints from Redis (pkg/web/handler.go):
``/api/stats`` (today), ``/api/stats/{day}``, ``/api/days`` — plus the
SPA's client-side getters (top-k, joins) already covered in
plans/pleiades.py F1-F7. Here each endpoint is a DataFrame query over the
per-day counter grain. "Today" is the max day present in the data (the
wall-clock of handler.go:61 would be non-deterministic against fixtures).

Scale: these are point/partition lookups — on a day-partitioned counters
table they prune to a single partition (the Redis KEYS day_<d>_* scan,
handler.go:126-135, becomes partition pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pleiades_spark import catalog
from pleiades_spark.functions.counters import derive_counters
from pleiades_spark.plans import Query
from pleiades_spark.session import apply_runtime_confs

# Shared day-grain counters CTE (DuckDB side) — the materialized table the
# API would read; recomputed inline here so the oracle stays self-contained.
_DAY_COUNTERS_SQL = """
  SELECT day, counter AS name, count(*) AS value,
         round(sum(lendiff), 4) AS growth
  FROM (
    SELECT CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
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
  ) GROUP BY day, counter
"""


def _day_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    events = catalog.load(spark, sf_dir, "events")
    return (
        derive_counters(events)
        .groupBy("day", F.col("counter").alias("name"))
        .agg(
            F.count(F.lit(1)).alias("value"),
            F.round(F.sum("lendiff"), 4).alias("growth"),
        )
    )


def q_api_stats_today(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /api/stats — counters for the latest day, with the epoch-seconds
    ``since`` the API returns (handler.go:55-85; Since = day·86400)."""
    counters = _day_counters(spark, sf_dir)
    latest = counters.agg(F.max("day").alias("latest_day"))
    return (
        counters.join(F.broadcast(latest), F.col("day") == F.col("latest_day"))
        .select(
            "name",
            "value",
            "growth",
            (F.col("day") * 86400).alias("since"),
        )
    )


ORACLE_API_STATS_TODAY = f"""
WITH dc AS ({_DAY_COUNTERS_SQL})
SELECT name, value, growth, day * 86400 AS since
FROM dc WHERE day = (SELECT max(day) FROM dc)
"""


STATS_DAY = 19730  # fixed fixture day for the /api/stats/{day} path query


def q_api_stats_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /api/stats/{day} — point lookup of one day's counters
    (handler.go:87-124). On a day-partitioned store this prunes to one
    partition."""
    counters = _day_counters(spark, sf_dir)
    return counters.filter(F.col("day") == STATS_DAY).select(
        "name", "value", "growth", (F.col("day") * 86400).alias("since")
    )


ORACLE_API_STATS_DAY = f"""
WITH dc AS ({_DAY_COUNTERS_SQL})
SELECT name, value, growth, day * 86400 AS since FROM dc WHERE day = {STATS_DAY}
"""


def q_api_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /api/days — distinct days (guarded, sorted desc) as ISO dates
    (handler.go:178-205 + store.js:186-193 presentation)."""
    counters = _day_counters(spark, sf_dir)
    return (
        counters.select("day")
        .distinct()
        .filter(F.col("day") > 19723)
        .select(
            "day",
            F.date_format(
                F.timestamp_seconds(F.col("day") * 86400), "yyyy-MM-dd"
            ).alias("iso_date"),
        )
        .orderBy(F.col("day").desc())
    )


ORACLE_API_DAYS = f"""
WITH dc AS ({_DAY_COUNTERS_SQL})
SELECT day, strftime(make_timestamp(day * 86400 * 1000000), '%Y-%m-%d') AS iso_date
FROM (SELECT DISTINCT day FROM dc) WHERE day > 19723 ORDER BY day DESC
"""


QUERIES = [
    Query("api_stats_today", q_api_stats_today, ORACLE_API_STATS_TODAY,
          "/api/stats — latest-day counters + since"),
    Query("api_stats_day", q_api_stats_day, ORACLE_API_STATS_DAY,
          "/api/stats/{day} — single-day point lookup"),
    Query("api_days", q_api_days, ORACLE_API_DAYS,
          "/api/days — guarded distinct day list, ISO, desc"),
]
