"""Pleiades-parity queries (SURVEY.md §2.2-2.4, §7 M1).

Every operator the reference applies to data, re-expressed as a declarative
Spark plan over the ``events`` fixture, each paired with its DuckDB oracle.

Reference anchors: counter derivation /root/reference/pkg/aggregator/
aggregator.go:32-66; dual-grain aggregation pkg/aggregator/kafka/
aggregator.go:174-199; serving ops pkg/web/handler.go + web/src/script/
store.js.

Scale notes: all plans are pure built-in expressions (whole-stage codegen);
the only shuffles are the final hash aggregations on low-cardinality keys
(day × counter), with map-side partial aggregation, so they scale to
arbitrary event volume. The dimension join is explicitly broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pleiades_spark import catalog
from pleiades_spark.functions.counters import (
    aggregate_counters,
    day_number,
    derive_counters,
    props_k,
)
from pleiades_spark.plans import Query
from pleiades_spark.session import apply_runtime_confs


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return catalog.load(spark, sf_dir, "events")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    return catalog.load(spark, sf_dir, name)


_MAX_TS_CACHE: dict = {}


def _events_max_ts(spark: SparkSession, sf_dir: str) -> int:
    """Memoized corpus max timestamp in epoch seconds — the plan-time
    scalar anchor the recency-anchored queries (trending, RFM) share.
    Each ``.collect()`` is a real extra Spark job (scalar-agg-sized,
    but a full stage at 100 TB); the anchor is a pure function of the
    fixture, so ONE job serves every anchored query in the process
    (round-8 verdict What's-wrong #4 shared-anchor helper)."""
    key = os.path.abspath(sf_dir)
    v = _MAX_TS_CACHE.get(key)
    if v is None:
        ev = _events(spark, sf_dir)
        v = int(
            ev.agg(F.max(F.unix_timestamp("ts")).alias("m")).collect()[0]["m"]
        )
        _MAX_TS_CACHE[key] = v
    return v


# DuckDB twin of functions/counters.py::derive_counters (P1-P9).
_DERIVED_SQL = """
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
"""

# All-time grain of the counters table (A1/A2, FIXTURES.md §A.4).
_COUNTERS_SQL = f"""
  SELECT counter AS name, count(*) AS value, round(sum(lendiff), 4) AS growth
  FROM ({_DERIVED_SQL}) GROUP BY counter
"""


def _counters_alltime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-time counters (name, value, growth) — the serving-layer input."""
    return (
        derive_counters(_events(spark, sf_dir))
        .groupBy(F.col("counter").alias("name"))
        .agg(
            F.count(F.lit(1)).alias("value"),
            F.round(F.sum("lendiff"), 4).alias("growth"),
        )
    )


# --- A1/A2: the flagship dual-grain aggregation ---------------------------


def q_counters_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregate_counters(_events(spark, sf_dir))


ORACLE_COUNTERS_ROLLUP = f"""
SELECT day, counter, count(*) AS events, round(sum(lendiff), 4) AS growth
FROM ({_DERIVED_SQL})
GROUP BY GROUPING SETS ((counter), (day, counter))
"""


# --- P9 window variant: per-day grain via tumbling event-time window ------


def q_counters_window_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling window on event time (the streaming-shaped grouping).

    window(ts, '1 day') ≡ the reference's ms/86400000 day bucketing
    (kafka/aggregator.go:174-175); the window start is surfaced as an ISO
    date string so the oracle compares on a timezone-free value.
    """
    ev = _events(spark, sf_dir)
    derived = ev.select(
        F.window(F.col("ts"), "1 day").alias("win"),
        F.explode(
            F.array_compact(
                F.array(
                    F.lit("pleiades_total"),
                    F.when(
                        F.col("event_type").isNotNull() & (F.col("event_type") != ""),
                        F.concat(F.lit("pleiades_type_"), F.col("event_type")),
                    ),
                )
            )
        ).alias("counter"),
        F.col("value"),
    )
    return derived.groupBy(
        F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day_date"),
        F.col("counter"),
    ).agg(
        F.count(F.lit(1)).alias("events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


ORACLE_COUNTERS_WINDOW_DAY = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_date,
       unnest(list_filter([
          'pleiades_total',
          CASE WHEN event_type IS NOT NULL AND event_type <> ''
               THEN 'pleiades_type_' || event_type END
       ], x -> x IS NOT NULL)) AS counter,
       value
FROM events
"""
ORACLE_COUNTERS_WINDOW_DAY = f"""
SELECT day_date, counter, count(*) AS events, round(sum(value), 4) AS total_value
FROM ({ORACLE_COUNTERS_WINDOW_DAY}) GROUP BY day_date, counter
"""


# --- P1: JSON payload parsing ----------------------------------------------


def q_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json / get_json_object on the raw payload column (P1)."""
    ev = _events(spark, sf_dir)
    k = props_k(F.col("props"))
    return ev.select(
        F.col("event_id"), k.alias("k"), F.col("event_type")
    ).filter(k.isNotNull() & (k > 80))


ORACLE_PROPS_JSON = """
SELECT event_id, k, event_type
FROM (SELECT event_id, event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
WHERE k IS NOT NULL AND k > 80
"""


# --- P1 variant: schemaless JSON → map type ---------------------------------


def q_props_map_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload parsed as MAP<STRING,STRING> (the schemaless path for
    tolerated-extras payloads, §1.3) → key frequency."""
    ev = _events(spark, sf_dir)
    return (
        ev.select(
            F.explode(
                F.map_keys(F.from_json(F.col("props"), "map<string,string>"))
            ).alias("prop_key")
        )
        .groupBy("prop_key")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_PROPS_MAP_KEYS = """
SELECT prop_key, count(*) AS n
FROM (SELECT unnest(json_keys(props)) AS prop_key FROM events)
GROUP BY prop_key
"""


# --- P8: regex field extraction from a raw string --------------------------


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex numeric extraction — the reference's event-ID timestamp parse
    (aggregator.go:20,79-89: `"timestamp":([0-9]+)` on a JSON-array string)
    transposed to the props payload. try_cast keeps no-match rows NULL.
    """
    ev = _events(spark, sf_dir)
    return ev.select(
        F.col("event_id"),
        F.expr(
            "try_cast(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS bigint)"
        ).alias("k_regex"),
    )


ORACLE_REGEX_EXTRACT = """
SELECT event_id,
       TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_regex
FROM events
"""


# --- A4: distinct days + guard filter + sort -------------------------------


def q_day_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct day numbers, spurious-data guard, sorted (handler.go:178-205).

    The reference filters `day > 18488`; here the guard drops the first day
    present in the fixture (same shape: constant predicate on the grouping
    key — Catalyst folds it into the aggregate's pre-shuffle filter).
    """
    ev = _events(spark, sf_dir)
    days = ev.select(day_number(F.col("ts")).alias("day")).distinct()
    first_day = 19723  # fixture epoch start (2024-01-01) — constant guard
    return days.filter(F.col("day") > first_day).orderBy("day")


ORACLE_DAY_LIST = """
SELECT DISTINCT CAST(floor(epoch(ts)/86400) AS BIGINT) AS day
FROM events WHERE CAST(floor(epoch(ts)/86400) AS BIGINT) > 19723
ORDER BY day
"""


# --- F1: prefix/suffix LIKE filtering on counter names ---------------------


def q_counter_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """startswith + exclusion + endswith (store.js:21-23 semantics)."""
    counters = _counters_alltime(spark, sf_dir)
    return counters.filter(
        F.col("name").startswith("pleiades_type_")
        & (F.col("name") != "pleiades_type_error")
        & F.col("name").endswith("e")
    ).select("name", "value")


ORACLE_COUNTER_LIKE_FILTER = f"""
SELECT name, value FROM ({_COUNTERS_SQL})
WHERE name LIKE 'pleiades_type_%' AND name <> 'pleiades_type_error'
  AND name LIKE '%e'
"""


# --- F2: top-k by value desc ------------------------------------------------


def q_top_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 type counters by count (store.js:23-27 top-14 wikis pattern).

    Deterministic total order (value DESC, name ASC); global_topk plans
    it as TakeOrderedAndProject (per-partition heaps), not a
    single-partition rank window — see functions/ranking.py.
    """
    from pleiades_spark.functions.ranking import global_topk

    counters = _counters_alltime(spark, sf_dir).filter(
        F.col("name").startswith("pleiades_type_")
    )
    return global_topk(
        counters, 3, F.col("value").desc(), F.col("name").asc()
    ).select("rank", "name", "value")


ORACLE_TOP_TYPES = f"""
SELECT rank, name, value FROM (
  SELECT row_number() OVER (ORDER BY value DESC, name ASC) AS rank, name, value
  FROM ({_COUNTERS_SQL}) WHERE name LIKE 'pleiades\\_type\\_%' ESCAPE '\\'
) WHERE rank <= 3
"""


# --- F3: string surgery to a join key ---------------------------------------


def q_strip_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip counter prefix → dimension code (store.js:30,67)."""
    counters = _counters_alltime(spark, sf_dir)
    return counters.filter(F.col("name").startswith("pleiades_type_")).select(
        F.regexp_replace(F.col("name"), "^pleiades_type_", "").alias("code"),
        F.col("value"),
    )


ORACLE_STRIP_PREFIX = f"""
SELECT regexp_replace(name, '^pleiades_type_', '') AS code, value
FROM ({_COUNTERS_SQL}) WHERE name LIKE 'pleiades\\_type\\_%' ESCAPE '\\'
"""


# --- F4: broadcast dimension join with coalesce fallback chain --------------

# The reference enriches language codes against ISO-639-1/2B/3 lists with a
# fallback chain (store.js:31-53). Same shape: two small dims, left joins,
# coalesce. Both dims are literal VALUES — broadcast by construction.
_TYPE_DIM_PRIMARY = [
    ("click", "Click Event"),
    ("view", "Page View"),
    ("purchase", "Purchase"),
]
_TYPE_DIM_FALLBACK = [
    ("signup", "Sign-up (fallback)"),
    ("click", "SHOULD NOT WIN"),  # primary must shadow the fallback
]


def q_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = q_strip_prefix(spark, sf_dir)
    dim1 = spark.createDataFrame(_TYPE_DIM_PRIMARY, "code string, label string")
    dim2 = spark.createDataFrame(_TYPE_DIM_FALLBACK, "code string, label string")
    return (
        codes.join(F.broadcast(dim1.withColumnRenamed("label", "l1")), "code", "left")
        .join(F.broadcast(dim2.withColumnRenamed("label", "l2")), "code", "left")
        .select(
            "code",
            F.coalesce(F.col("l1"), F.col("l2"), F.concat(F.lit("unknown:"), F.col("code"))).alias(
                "label"
            ),
            "value",
        )
    )


ORACLE_DIM_JOIN = f"""
WITH codes AS (
  SELECT regexp_replace(name, '^pleiades_type_', '') AS code, value
  FROM ({_COUNTERS_SQL}) WHERE name LIKE 'pleiades\\_type\\_%' ESCAPE '\\'
),
dim1(code, l1) AS (VALUES ('click','Click Event'),('view','Page View'),('purchase','Purchase')),
dim2(code, l2) AS (VALUES ('signup','Sign-up (fallback)'),('click','SHOULD NOT WIN'))
SELECT codes.code, coalesce(l1, l2, 'unknown:' || codes.code) AS label, value
FROM codes LEFT JOIN dim1 USING (code) LEFT JOIN dim2 USING (code)
"""


# --- F5: big-number projection with unit conversion -------------------------


def q_big_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-dimensional counters with descriptions + unit conversion
    (store.js:94-132: growth/1048576 MiB)."""
    counters = _counters_alltime(spark, sf_dir)
    return counters.filter(~F.col("name").startswith("pleiades_type_")).select(
        "name",
        F.when(F.col("name") == "pleiades_total", F.lit("Total events"))
        .when(F.col("name") == "pleiades_bot", F.lit("Bot events"))
        .when(F.col("name") == "pleiades_value_inc", F.lit("Value increased"))
        .when(F.col("name") == "pleiades_value_dec", F.lit("Value decreased"))
        .otherwise(F.lit("Other"))
        .alias("description"),
        "value",
        F.round(F.col("growth") / 1048576, 8).alias("growth_mib"),
    )


ORACLE_BIG_NUMBERS = f"""
SELECT name,
       CASE name WHEN 'pleiades_total' THEN 'Total events'
                 WHEN 'pleiades_bot' THEN 'Bot events'
                 WHEN 'pleiades_value_inc' THEN 'Value increased'
                 WHEN 'pleiades_value_dec' THEN 'Value decreased'
                 ELSE 'Other' END AS description,
       value,
       round(growth / 1048576, 8) AS growth_mib
FROM ({_COUNTERS_SQL}) WHERE name NOT LIKE 'pleiades\\_type\\_%' ESCAPE '\\'
"""


# --- F6: point lookup + number formatting ------------------------------------


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """find(name == 'pleiades_total') + thousands separator (store.js:169-170)."""
    counters = _counters_alltime(spark, sf_dir)
    return counters.filter(F.col("name") == "pleiades_total").select(
        "name", "value", F.format_number(F.col("value"), 0).alias("pretty")
    )


ORACLE_POINT_LOOKUP = f"""
SELECT name, value, format('{{:,}}', value) AS pretty
FROM ({_COUNTERS_SQL}) WHERE name = 'pleiades_total'
"""


# --- F7/F8: julian day → ISO date presentation -------------------------------


def q_days_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day list as ISO dates, newest first (store.js:186-193)."""
    ev = _events(spark, sf_dir)
    days = ev.select(day_number(F.col("ts")).alias("day")).distinct()
    return days.select(
        "day",
        F.date_format(F.timestamp_seconds(F.col("day") * 86400), "yyyy-MM-dd").alias(
            "iso_date"
        ),
    ).orderBy(F.col("day").desc())


ORACLE_DAYS_ISO = """
SELECT day, strftime(make_timestamp(day * 86400 * 1000000), '%Y-%m-%d') AS iso_date
FROM (SELECT DISTINCT CAST(floor(epoch(ts)/86400) AS BIGINT) AS day FROM events)
ORDER BY day DESC
"""


# --- A5: min/max/avg gauges --------------------------------------------------


def q_gauges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer-stats gauges (prometheus.go:71-79) as grouped min/max/avg."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_GAUGES = """
SELECT event_type, round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value, round(avg(value), 4) AS avg_value,
       count(*) AS n
FROM events GROUP BY event_type
"""


# --- A6: histogram bucketing -------------------------------------------------

# Bucket upper bounds, mirroring the reference's lag histogram shape
# (aggregator.go:22-28: fixed cumulative buckets {1s,5s,15s,1m,10m,2h}).
HISTOGRAM_EDGES = (10.0, 50.0, 100.0, 250.0, 500.0)


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bucket histogram of event values per type — a width_bucket-
    style when-chain (codegen'd; one shuffle on the tiny group key)."""
    ev = _events(spark, sf_dir)
    bucket = F.lit(f"gt_{HISTOGRAM_EDGES[-1]:g}")
    for edge in reversed(HISTOGRAM_EDGES):
        bucket = F.when(F.col("value") <= edge, F.lit(f"le_{edge:g}")).otherwise(bucket)
    return (
        ev.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_BUCKET_CASE = "CASE " + " ".join(
    f"WHEN value <= {e:g} THEN 'le_{e:g}'" for e in HISTOGRAM_EDGES
) + f" ELSE 'gt_{HISTOGRAM_EDGES[-1]:g}' END"

ORACLE_VALUE_HISTOGRAM = f"""
SELECT event_type, {_BUCKET_CASE} AS bucket, count(*) AS n
FROM events GROUP BY event_type, {_BUCKET_CASE}
"""


# --- P10-adjacent: sessionization over the event stream ----------------------

SESSION_GAP_MIN = 30

HOUR_SECS = 3600


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions: a gap > 30 min starts a new session (lag +
    running sum of boundary flags — one shuffle on user_id serves both
    window functions). Returns per-session summaries."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


ORACLE_SESSIONIZATION = f"""
WITH flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                  OR floor(epoch(ts)) - floor(epoch(prev_ts)) > {SESSION_GAP_MIN * 60}
             THEN 1 ELSE 0 END AS new_session
  FROM (SELECT *, lag(ts, 1) OVER w AS prev_ts FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
), numbered AS (
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
            ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       round(sum(value), 4) AS session_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM numbered GROUP BY user_id, session_id
"""


# --- SCD2 state history (gaps-and-islands → versioned dimension) -------------


def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: each user's event_type
    run becomes a VERSION row with [valid_from, valid_to) interval,
    valid_to NULL marking the current version — the warehouse pattern for
    tracking attribute history from an event log (CDC → dimension).

    One shuffle total: the lag/run-numbering windows partition by
    user_id; the (user_id, version) group-by and the valid_to lead window
    are satisfied by the same hash partitioning (ClusteredDistribution on
    a superset of the partition key), so Catalyst plans no further
    exchange. Timestamps are emitted as formatted strings (cross-engine
    hash stability).
    """
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    changed = F.when(
        F.lag("event_type", 1).over(w).isNull()
        | (F.col("event_type") != F.lag("event_type", 1).over(w)),
        1,
    ).otherwise(0)
    versioned = ev.withColumn("chg", changed).withColumn(
        "version", F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    runs = versioned.groupBy("user_id", "version").agg(
        F.first("event_type").alias("state"),
        F.min("ts").alias("from_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = W.partitionBy("user_id").orderBy(F.col("version").asc())
    return runs.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "state",
        F.date_format("from_ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead("from_ts", 1).over(wv), "yyyy-MM-dd HH:mm:ss").alias(
            "valid_to"
        ),
        F.lead("from_ts", 1).over(wv).isNull().alias("is_current"),
        "n_events",
    )


ORACLE_SCD2_USER_STATE = """
WITH flagged AS (
  SELECT *, CASE WHEN prev_type IS NULL OR event_type <> prev_type
             THEN 1 ELSE 0 END AS chg
  FROM (SELECT *, lag(event_type, 1) OVER w AS prev_type FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
), versioned AS (
  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
            ORDER BY ts ASC, event_id ASC
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
  FROM flagged
), runs AS (
  SELECT user_id, version, min(event_type) AS state, min(ts) AS from_ts,
         CAST(count(*) AS BIGINT) AS n_events
  FROM versioned GROUP BY user_id, version
)
SELECT user_id, version, state,
       strftime(from_ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(from_ts, 1) OVER wv, '%Y-%m-%d %H:%M:%S') AS valid_to,
       (lead(from_ts, 1) OVER wv) IS NULL AS is_current,
       n_events
FROM runs
WINDOW wv AS (PARTITION BY user_id ORDER BY version ASC)
"""


# --- sliding (hopping) window aggregation ------------------------------------


def q_counters_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows hopping every hour — each event lands in exactly two
    windows. The streaming-capable form of overlapping-window analytics;
    the oracle unnests the two hour-truncated starts per event."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window(F.col("ts"), "2 hours", "1 hour").alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm").alias("win_start"),
            "event_type",
            "events",
            "total_value",
        )
    )


ORACLE_COUNTERS_SLIDING_WINDOW = """
SELECT strftime(win_start, '%Y-%m-%d %H:%M') AS win_start, event_type,
       count(*) AS events, round(sum(value), 4) AS total_value
FROM (
  SELECT unnest([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start,
         event_type, value
  FROM events
) GROUP BY win_start, event_type
"""


# --- range join (bucketized strategy demo) ------------------------------------

PRICE_TIERS: tuple[tuple[float, float, str], ...] = (
    (0.0, 100000.0, "small"),
    (100000.0, 300000.0, "medium"),
    (300000.0, 1e12, "large"),
)


def q_price_tier_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: orders → price tier where lo ≤ price < hi.

    With a literal dim the join broadcasts and the range predicate is a
    filter inside the broadcast nested loop — fine at any fact size. For
    big-big range joins the strategy is bucketization: equi-join on
    floor(value/step) with the interval table exploded per overlapped
    bucket, turning the range predicate into a hash join (same pattern as
    the length-banded dedup block in operators/dedup.py).
    """
    orders = _t(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(
        list(PRICE_TIERS), "lo double, hi double, tier string"
    )
    return (
        orders.join(
            F.broadcast(tiers),
            (orders.o_totalprice >= tiers.lo) & (orders.o_totalprice < tiers.hi),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


_TIER_VALUES = ", ".join(f"({lo}, {hi}, '{t}')" for lo, hi, t in PRICE_TIERS)

ORACLE_PRICE_TIER_RANGE_JOIN = f"""
WITH tiers(lo, hi, tier) AS (VALUES {_TIER_VALUES})
SELECT tier, count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_price
FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY tier
"""


# --- big-big interval join (bucketized, no broadcast side) --------------------


def q_interval_join_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact temporal interval join: for every event, how many
    events the same user fired in the NEXT hour (and the largest value
    among them) — the "what happened right after" join that powers
    attribution and burst analysis.

    The broadcast range join above (q_price_tier_range_join) only works
    when one side is dim-sized; with BOTH sides fact-sized the scale
    strategy is bucketization: band time into interval-length buckets,
    explode each probe interval over the (at most two) buckets it can
    touch, and equi-join on (user_id, bucket) so Catalyst plans a plain
    shuffled hash/sort-merge join — the exact range predicate rides along
    as a post-join filter. No broadcast-nested-loop, no theta join: the
    shuffle key is (user, hour), work per bucket is |probe|×|build| WITHIN
    that user-hour only, and skew folds into AQE's skew-join splitting.
    A matching build row lives in exactly one bucket, so the explode
    can't double-count. Same banding pattern as the length-blocked dedup
    join (operators/dedup.py) applied to time.
    """
    ev = _events(spark, sf_dir)
    b0 = F.floor(F.unix_timestamp("ts") / HOUR_SECS).cast("long")
    probe = ev.select("event_id", "user_id", "ts").withColumn(
        "bucket", F.explode(F.array(b0, b0 + 1))
    )
    build = ev.select(
        F.col("user_id").alias("f_user"),
        F.col("ts").alias("f_ts"),
        F.col("value").alias("f_value"),
    ).withColumn("f_bucket", F.floor(F.unix_timestamp("f_ts") / HOUR_SECS).cast("long"))
    joined = probe.join(
        build,
        (probe.user_id == build.f_user)
        & (probe.bucket == build.f_bucket)
        & (build.f_ts > probe.ts)
        & (build.f_ts <= probe.ts + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("f_ts").alias("n_next_hour"),
        F.round(F.coalesce(F.max("f_value"), F.lit(0.0)), 4).alias("max_next_value"),
    )


ORACLE_INTERVAL_JOIN_BUCKETIZED = """
SELECT e.event_id, e.user_id,
       count(f.ts) AS n_next_hour,
       round(coalesce(max(f.value), 0.0), 4) AS max_next_value
FROM events e
LEFT JOIN events f ON f.user_id = e.user_id
  AND f.ts > e.ts AND f.ts <= e.ts + INTERVAL 1 HOUR
GROUP BY e.event_id, e.user_id
"""


# --- min_by / max_by (argmin/argmax aggregates) -------------------------------


def q_extreme_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status argmax/argmin: which order hit the extreme price."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


ORACLE_EXTREME_ORDERS = """
SELECT o_orderstatus,
       arg_max(o_orderkey, o_totalprice) AS priciest_order,
       arg_min(o_orderkey, o_totalprice) AS cheapest_order,
       round(max(o_totalprice), 4) AS max_price
FROM orders GROUP BY o_orderstatus
"""


# --- global sort + limit (TakeOrderedAndProject) ------------------------------


def q_top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 by price — plans as TakeOrderedAndProject (per-
    partition heaps + driver merge), NOT a full range-partitioned sort."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


ORACLE_TOP_ORDERS_GLOBAL = """
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


# --- native session_window aggregation ---------------------------------------


def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN session_window (gap-merged event-time sessions) — the
    streaming-capable twin of q_sessionization. Session end = last event
    + gap, so the oracle derives it as max(ts) + 30 min over the same
    lag/cumsum session numbering."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), f"{SESSION_GAP_MIN} minutes").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


ORACLE_SESSION_WINDOW_AGG = f"""
WITH flagged AS (
  -- full-precision epoch + >= : Spark's session end is EXCLUSIVE (an event
  -- exactly gap after the last one starts a NEW session)
  SELECT *, CASE WHEN prev_ts IS NULL
                  OR epoch(ts) - epoch(prev_ts) >= {SESSION_GAP_MIN * 60}
             THEN 1 ELSE 0 END AS new_session
  FROM (SELECT *, lag(ts, 1) OVER w AS prev_ts FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id
            ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE,
                '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events, round(sum(value), 4) AS session_value
FROM numbered GROUP BY user_id, session_id
"""


# --- as-of join (Spark lacks a native one) -----------------------------------


def q_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent signup at
    or before it.

    Spark has no ASOF JOIN; the scalable single-shuffle formulation is a
    conditional marker + last(ignorenulls) running window — no self-join,
    no range explosion, partition-pruned by user_id at scale. (DuckDB's
    native ASOF JOIN would be the oracle, but the window form is expressed
    identically there.)
    """
    ev = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    marker = F.when(F.col("event_type") == "signup", F.col("ts"))
    return (
        ev.withColumn(
            "last_signup_ts", F.last(marker, ignorenulls=True).over(w)
        )
        .filter(F.col("event_type") != "signup")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
            F.date_format("last_signup_ts", "yyyy-MM-dd HH:mm:ss").alias(
                "asof_signup_ts"
            ),
            F.round(
                (
                    F.unix_timestamp("ts") - F.unix_timestamp("last_signup_ts")
                ) / 3600.0,
                4,
            ).alias("hours_since_signup"),
        )
    )


ORACLE_ASOF_SIGNUP = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
       strftime(last_signup_ts, '%Y-%m-%d %H:%M:%S') AS asof_signup_ts,
       round((floor(epoch(ts)) - floor(epoch(last_signup_ts))) / 3600.0, 4)
         AS hours_since_signup
FROM (
  SELECT *, last(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
  FROM events
) WHERE event_type <> 'signup'
"""


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: each non-purchase event matched
    to the user's NEXT purchase within 2 hours (attribution window).

    The O(n) formulation (per the gapfill invariant, CLAUDE.md): a
    [current, unboundedFollowing] ignorenulls frame re-scans the
    partition remainder per row — quadratic per key. "Next non-null" is
    instead a running last() over the DESCENDING order, an incremental
    O(n) frame; the tolerance then filters matches past 2h to null.
    """
    ev = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    marker = F.when(F.col("event_type") == "purchase", F.col("ts"))
    nxt = F.last(marker, ignorenulls=True).over(w)
    within = (F.unix_timestamp(nxt) - F.unix_timestamp(F.col("ts"))) <= 7200
    return (
        ev.withColumn("next_purchase_ts", F.when(within, nxt))
        .filter(F.col("event_type") != "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
            F.date_format("next_purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
                "next_purchase_at"
            ),
            F.round(
                (
                    F.unix_timestamp("next_purchase_ts")
                    - F.unix_timestamp("ts")
                )
                / 60.0,
                4,
            ).alias("minutes_until_purchase"),
        )
    )


ORACLE_ASOF_FORWARD = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
       strftime(np, '%Y-%m-%d %H:%M:%S') AS next_purchase_at,
       round((floor(epoch(np)) - floor(epoch(ts))) / 60.0, 4)
         AS minutes_until_purchase
FROM (
  SELECT *, CASE WHEN floor(epoch(nxt)) - floor(epoch(ts)) <= 7200 THEN nxt END AS np
  FROM (
    SELECT *, last(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nxt
    FROM events
  )
) WHERE event_type <> 'purchase'
"""


def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality constraint report over the events table:
    uniqueness, completeness, domain membership, and range checks as one
    aggregation pass — the verification step a production pipeline runs
    before publishing a dataset version.

    All metrics reduce in a SINGLE wide aggregate over one scan (count,
    count-distinct, conditional counts): no per-constraint passes. The
    constraint table is unpivoted from that one row via stack(), so
    adding a constraint is one (name, metric, threshold) line, not a new
    job. At 100 TB approx_count_distinct would replace the exact
    distinct (documented swap; exact kept here for the oracle twin).
    """
    ev = _events(spark, sf_dir)
    known = ("view", "click", "signup", "purchase", "error")
    agg = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_distinct_id"),
        F.count("value").alias("n_value"),
        F.count("user_id").alias("n_user"),
        F.sum(F.when(F.col("event_type").isin(*known), 1).otherwise(0)).alias(
            "n_known_type"
        ),
        F.sum(
            F.when((F.col("value") >= -1000.0) & (F.col("value") <= 1000.0), 1)
            .otherwise(0)
        ).alias("n_value_in_range"),
    )
    n = F.col("n_rows").cast("double")
    checks = agg.select(
        F.expr(
            "stack(5, "
            "'event_id_unique', n_distinct_id / CAST(n_rows AS DOUBLE), 1.0D, "
            "'value_complete', n_value / CAST(n_rows AS DOUBLE), 0.95D, "
            "'user_id_complete', n_user / CAST(n_rows AS DOUBLE), 1.0D, "
            "'event_type_in_domain', n_known_type / CAST(n_rows AS DOUBLE), 1.0D, "
            "'value_in_range', n_value_in_range / CAST(n_rows AS DOUBLE), 0.99D"
            ") AS (check_name, metric, threshold)"
        )
    )
    return checks.select(
        "check_name",
        F.round("metric", 6).alias("metric"),
        "threshold",
        (F.col("metric") >= F.col("threshold")).alias("passed"),
    )


ORACLE_DATA_QUALITY = """
WITH m AS (
  SELECT count(*) AS n_rows,
         count(DISTINCT event_id) AS n_distinct_id,
         count(value) AS n_value,
         count(user_id) AS n_user,
         sum(CASE WHEN event_type IN ('view','click','signup','purchase','error')
                  THEN 1 ELSE 0 END) AS n_known_type,
         sum(CASE WHEN value BETWEEN -1000.0 AND 1000.0 THEN 1 ELSE 0 END)
           AS n_value_in_range
  FROM events
)
SELECT check_name, round(metric, 6) AS metric, threshold,
       metric >= threshold AS passed
FROM (
  SELECT 'event_id_unique' AS check_name,
         CAST(n_distinct_id AS DOUBLE) / n_rows AS metric,
         CAST(1.0 AS DOUBLE) AS threshold FROM m
  UNION ALL
  SELECT 'value_complete', CAST(n_value AS DOUBLE) / n_rows,
         CAST(0.95 AS DOUBLE) FROM m
  UNION ALL
  SELECT 'user_id_complete', CAST(n_user AS DOUBLE) / n_rows,
         CAST(1.0 AS DOUBLE) FROM m
  UNION ALL
  SELECT 'event_type_in_domain', CAST(n_known_type AS DOUBLE) / n_rows,
         CAST(1.0 AS DOUBLE) FROM m
  UNION ALL
  SELECT 'value_in_range', CAST(n_value_in_range AS DOUBLE) / n_rows,
         CAST(0.99 AS DOUBLE) FROM m
)
"""


def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC/VWAP bars per (event_type, hour)
    (operators/timeseries.ohlc_hourly): min_by/max_by open-close in one
    aggregation pass."""
    from pleiades_spark.operators.timeseries import ohlc_hourly

    return ohlc_hourly(_events(spark, sf_dir))


ORACLE_OHLC_HOURLY = """
WITH h AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour, value,
         row_number() OVER (PARTITION BY event_type,
                            CAST(floor(epoch(ts) / 3600) AS BIGINT)
                            ORDER BY ts ASC, event_id ASC) AS ra,
         row_number() OVER (PARTITION BY event_type,
                            CAST(floor(epoch(ts) / 3600) AS BIGINT)
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM events
)
SELECT event_type, hour,
       CAST(count(*) AS BIGINT) AS n,
       round(max(CASE WHEN ra = 1 THEN value END), 4) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       round(max(CASE WHEN rd = 1 THEN value END), 4) AS close,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0 / count(*), 4)
         AS vwap
FROM h
GROUP BY event_type, hour
"""


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user estimate per event_type
    (operators/sketch.kmv_distinct) — the cardinality sketch whose
    estimate (error included) replays bit-for-bit in the oracle, the
    hash-strength counterpart to the rows-only HLL gate."""
    from pleiades_spark.operators.sketch import kmv_distinct

    ev = _events(spark, sf_dir)
    return kmv_distinct(
        ev, "event_type", F.col("user_id").cast("string")
    ).select(
        F.col("grp").alias("event_type"), "est_distinct", "n_min"
    )


ORACLE_KMV_DISTINCT = """
WITH hashed AS (
  SELECT DISTINCT event_type AS grp,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
  FROM events
), topk AS (
  SELECT grp, h,
         row_number() OVER (PARTITION BY grp ORDER BY h ASC) AS rn
  FROM hashed
), agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_min, max(h) AS h_k
  FROM topk WHERE rn <= 64 GROUP BY grp
)
SELECT grp AS event_type,
       round(CASE WHEN n_min < 64 THEN CAST(n_min AS DOUBLE)
                  ELSE 63.0 * 4294967296.0 / h_k END, 4) AS est_distinct,
       n_min
FROM agg
"""


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured payloads: parse_json →
    binary variant column → typed try_variant_get extraction — the
    schema-on-read form that keeps unknown payload shapes queryable
    without a fixed struct (vs q_props_json's schema'd from_json and
    q_props_map_keys' map form). The oracle is plain JSON extraction:
    VARIANT is an encoding choice, not a semantics change.
    """
    ev = _events(spark, sf_dir)
    v = F.parse_json(F.col("props"))
    out = ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.tag", "string").alias("tag"),
    )
    return out.filter(F.col("k").isNotNull()).select(
        "event_id", "k", F.coalesce("tag", F.lit("")).alias("tag")
    )


ORACLE_VARIANT_EXTRACT = """
SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k,
       coalesce(props->>'$.tag', '') AS tag
FROM events
WHERE CAST(props->>'$.k' AS BIGINT) IS NOT NULL
"""


def q_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event-time statistics per user: mean gap, gap stddev, and
    the burstiness coefficient CV = σ/μ (CV ≈ 1 Poisson, > 1 bursty,
    < 1 regular) — the temporal fingerprint that separates organic users
    from schedulers/bots. One lag window + one aggregation; gaps in
    integer seconds so only the final moments are float."""
    ev = _events(spark, sf_dir)
    wu = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gaps = ev.select(
        "user_id",
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts", 1).over(wu))
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap_s"), 4).alias("mean_gap_s"),
            F.round(F.stddev_samp("gap_s"), 4).alias("sd_gap_s"),
        )
        .filter(F.col("n_gaps") >= 2)
        .withColumn(
            "burstiness",
            F.round(F.col("sd_gap_s") / F.col("mean_gap_s"), 4),
        )
    )


ORACLE_USER_BURSTINESS = """
WITH gaps AS (
  SELECT user_id,
         floor(epoch(ts)) - floor(epoch(lag(ts, 1) OVER
           (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))) AS gap_s
  FROM events
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       round(avg(gap_s), 4) AS mean_gap_s,
       round(stddev_samp(gap_s), 4) AS sd_gap_s,
       round(round(stddev_samp(gap_s), 4) / round(avg(gap_s), 4), 4)
         AS burstiness
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY user_id
HAVING count(*) >= 2
"""


def q_trending_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted (exponentially decayed) event counts per type:
    Σ exp(−Δt/τ) with τ = 7 days, Δt measured from the corpus max
    timestamp — the "trending now" score a serving layer ranks by,
    where plain counts can't distinguish last week from last year.
    Map-stage exp + one low-cardinality aggregation; exp/ln parity per
    the tfidf/KL precedent, round(4) on the sum."""
    ev = _events(spark, sf_dir)
    max_ts = _events_max_ts(spark, sf_dir)
    decay = F.exp(
        -(F.lit(int(max_ts)) - F.unix_timestamp("ts")) / F.lit(604800.0)
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(decay), 4).alias("trend_score"),
        )
    )


ORACLE_TRENDING_COUNTERS = """
WITH m AS (SELECT max(floor(epoch(ts))) AS mx FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(exp(-((SELECT mx FROM m) - floor(epoch(ts))) / 604800.0)), 4)
         AS trend_score
FROM events
GROUP BY event_type
"""


RFM_SAMPLE_K = 256


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user Recency (days since last event),
    Frequency (event count), Monetary (value sum), each scored into
    quintiles, plus the classic segment label — the behavioral-cohort
    primitive.

    Scale shape (replacing three global ntile(5) windows, which were
    three single-partition sorts of every user): quintile CUT KEYS come
    from a deterministic bottom-k hash sample (h32 of user_id, same
    engine-stable draw as sampled_percentiles) — orderBy(h).limit(k)
    compiles to TakeOrderedAndProject (per-partition heaps, no global
    sort). The 4 cut keys per metric are composite (metric, user_id)
    order statistics of the sample, so ties on a constant-ish metric
    still split into ~equal buckets; the 1-row cut table broadcasts and
    scoring is a map-side comparison count. At the fixture SFs <=
    RFM_SAMPLE_K users the sample IS the population (exact quintiles);
    at 100 TB the boundaries carry O(1/sqrt k) rank error, which is the
    correct trade for segment labels. Oracle replays the identical
    sample, cut ranks, and comparison order."""
    from pleiades_spark.functions.hashing import h32

    ev = _events(spark, sf_dir)
    anchor = _events_max_ts(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.floor(
            (F.lit(int(anchor)) - F.max(F.unix_timestamp("ts"))) / 86400
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("value"), 4).alias("monetary"),
    )
    sample = (
        per_user.withColumn("h", h32(F.col("user_id").cast("string")))
        .orderBy(F.col("h").asc(), F.col("user_id").asc())
        .limit(RFM_SAMPLE_K)
    )
    # Cut key j (1..4) = the ceil(j*c/5)-th composite (metric, user_id)
    # order statistic of the sample; DESC metrics are negated so every
    # comparison is ASC-lexicographic on both engines.
    metrics = {
        "r": F.col("recency_days"),
        "f": -F.col("frequency"),
        "m": -F.col("monetary"),
    }
    cut_cols = []
    for tag, mcol in metrics.items():
        arr = F.sort_array(
            F.collect_list(F.struct(mcol.alias("mv"), F.col("user_id").alias("u")))
        )
        for j in range(1, 5):
            cut_cols.append(
                F.element_at(
                    arr, F.expr(f"cast((({j} * count(1) + 4) div 5) as int)")
                ).alias(f"c{tag}{j}")
            )
    cuts = sample.agg(*cut_cols)
    scored = per_user.crossJoin(F.broadcast(cuts))
    score_exprs = {}
    for tag, mcol in metrics.items():
        above = [
            F.when(
                (mcol > F.col(f"c{tag}{j}.mv"))
                | (
                    (mcol == F.col(f"c{tag}{j}.mv"))
                    & (F.col("user_id") > F.col(f"c{tag}{j}.u"))
                ),
                1,
            ).otherwise(0)
            for j in range(1, 5)
        ]
        score_exprs[tag] = (F.lit(1) + sum(above[1:], above[0])).cast("int")
    scored = scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        score_exprs["r"].alias("r_score"),
        score_exprs["f"].alias("f_score"),
        score_exprs["m"].alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when(F.col("r_score") <= 2, "recent")
        .when(F.col("f_score") <= 2, "loyal_lapsing")
        .otherwise("hibernating")
    )
    return scored.withColumn("segment", seg)


def _rfm_oracle() -> str:
    k = RFM_SAMPLE_K
    metric_sql = {"r": "recency_days", "f": "-frequency", "m": "-monetary"}
    cut_lists = ",\n    ".join(
        f"list({{'mv': {m}, 'u': user_id}} ORDER BY {m} ASC, user_id ASC) AS a{t}"
        for t, m in metric_sql.items()
    )
    score_terms = {
        t: " + ".join(
            f"(CASE WHEN {m} > (a{t}[CAST((({j} * c + 4) // 5) AS INT)]).mv"
            f" OR ({m} = (a{t}[CAST((({j} * c + 4) // 5) AS INT)]).mv"
            f" AND user_id > (a{t}[CAST((({j} * c + 4) // 5) AS INT)]).u)"
            f" THEN 1 ELSE 0 END)"
            for j in range(1, 5)
        )
        for t, m in metric_sql.items()
    }
    return f"""
WITH anchor AS (SELECT max(floor(epoch(ts))) AS mx FROM events),
per_user AS (
  SELECT user_id,
         CAST(floor(((SELECT mx FROM anchor) - max(floor(epoch(ts)))) / 86400)
              AS BIGINT) AS recency_days,
         count(*) AS frequency,
         round(sum(value), 4) AS monetary
  FROM events GROUP BY user_id
),
samp AS (
  SELECT user_id, recency_days, frequency, monetary
  FROM (
    SELECT pu.*,
           CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)
                AS BIGINT) AS h
    FROM per_user pu
  )
  ORDER BY h ASC, user_id ASC
  LIMIT {k}
),
cuts AS (
  SELECT count(*) AS c,
    {cut_lists}
  FROM samp
),
scored AS (
  SELECT user_id, recency_days, CAST(frequency AS BIGINT) AS frequency,
         monetary,
         CAST(1 + {score_terms['r']} AS INT) AS r_score,
         CAST(1 + {score_terms['f']} AS INT) AS f_score,
         CAST(1 + {score_terms['m']} AS INT) AS m_score
  FROM per_user, cuts
)
SELECT *,
       CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
            WHEN r_score <= 2 THEN 'recent'
            WHEN f_score <= 2 THEN 'loyal_lapsing'
            ELSE 'hibernating' END AS segment
FROM scored
"""


ORACLE_RFM_SEGMENTS = _rfm_oracle()


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: per-user
    consecutive event pairs → P(next = b | current = a) — the behavioral
    model behind next-action prediction and anomaly scoring. One lag
    window + one (from, to) count; probabilities are exact integer
    ratios of those counts, rounded."""
    ev = _events(spark, sf_dir)
    wu = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = ev.select(
        F.lag("event_type", 1).over(wu).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = W.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
    )


ORACLE_EVENT_TRANSITIONS = """
WITH pairs AS (
  SELECT lag(event_type, 1) OVER
           (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS from_type,
         event_type AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
FROM counts
"""


def q_hourly_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend of the hourly value series: slope and intercept
    from the closed-form normal equations — is each event type's volume
    drifting up or down, in value units per hour?

    Float parity by construction (the built-in regr_slope would float-sum
    in engine order): hours are origin-shifted per type (x' = hour −
    min hour, ≤ series length), values held as integer centi-units, so
    Σx, Σy, Σxy, Σx² are EXACT 64-bit integers; the normal-equation
    determinants combine them in decimal(38,0)/HUGEINT (their products
    square past int64 at large SF — the ab_welch overflow class); the
    only float ops are the two final divisions, identical on both
    engines. One (type, hour) aggregation (map-side
    combined), a broadcast per-type min, and a 5-row output."""
    ev = _events(spark, sf_dir)
    hourly = (
        ev.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
            "value",
        )
        .groupBy("event_type", "h")
        .agg(F.round(F.sum("value") * 100, 0).cast("long").alias("yu"))
    )
    x0 = hourly.groupBy("event_type").agg(F.min("h").alias("h0"))
    pts = hourly.join(F.broadcast(x0), "event_type").withColumn(
        "x", F.col("h") - F.col("h0")
    )
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yu").alias("sy"),
        F.sum(F.col("x") * F.col("yu")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.min("h0").alias("h0"),
    )
    # The normal-equation COMBOS (sx·sy, sy·sxx …) square past int64 at
    # large SF even though the sums themselves fit — compute them
    # decimal(38,0)/HUGEINT (exact both engines, CLAUDE.md invariant),
    # divide as double at the end in identical textual order.
    sxd = F.col("sx").cast("decimal(38,0)")
    syd = F.col("sy").cast("decimal(38,0)")
    det = F.col("n") * F.col("sxx").cast("decimal(38,0)") - sxd * F.col("sx")
    slope_num = F.col("n") * F.col("sxy").cast("decimal(38,0)") - sxd * F.col("sy")
    icept_num = syd * F.col("sxx") - sxd * F.col("sxy")
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return sums.select(
        "event_type",
        F.col("n").alias("n_hours"),
        q4(slope_num / (det * 100.0)).alias("slope_per_hour"),
        q4(icept_num / (det * 100.0)).alias("intercept_value"),
    )


ORACLE_HOURLY_TREND_OLS = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(round(sum(value) * 100, 0) AS BIGINT) AS yu
  FROM events GROUP BY event_type, h
), pts AS (
  SELECT hourly.*, h - min(h) OVER (PARTITION BY event_type) AS x FROM hourly
), sums AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yu) AS BIGINT) AS sy,
         CAST(sum(x * yu) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM pts GROUP BY event_type
)
SELECT event_type, n AS n_hours,
       floor(((n * CAST(sxy AS HUGEINT) - CAST(sx AS HUGEINT) * sy)
              / ((n * CAST(sxx AS HUGEINT) - CAST(sx AS HUGEINT) * sx) * 100.0))
             * 10000 + 0.5) / 10000 AS slope_per_hour,
       floor(((CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy)
              / ((n * CAST(sxx AS HUGEINT) - CAST(sx AS HUGEINT) * sx) * 100.0))
             * 10000 + 0.5) / 10000 AS intercept_value
FROM sums
"""


def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per first-view-day cohort: how long users take from their first
    view to their first subsequent purchase — exact p50/p90 lag seconds
    plus cohort size. The time-to-convert statistic funnel_conversion's
    counts don't give.

    Percentiles come from operators/robust.grouped_exact_percentiles:
    min{v : 100·W(v) ≥ p·W_tot} in pure integer comparisons, located via
    a bucket-grain cumulative window (value-range/4096 rows per cohort
    at ANY user count) and finished inside the one matching bucket —
    never a per-row sort. Lags are integer seconds, so every quantity
    both engines compare is exact."""
    from pleiades_spark.operators.robust import grouped_exact_percentiles

    ev = _events(spark, sf_dir)
    v0 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_timestamp("ts")).alias("v0"))
    )
    lags = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_timestamp("ts").alias("pt"))
        .join(v0, "user_id")
        .filter(F.col("pt") > F.col("v0"))
        .groupBy("user_id")
        .agg(
            F.min(F.col("pt") - F.col("v0")).alias("lag_s"),
            F.min(F.floor(F.col("v0") / 86400).cast("long")).alias("cohort_day"),
        )
    )
    # localCheckpoint: per_v feeds the percentile machinery (which fans
    # out into several branches) AND the cohort-size agg — lazily every
    # branch re-ran the two event scans + user-grain join above (the
    # r12 plan: 16 parquet scans, 50 exchanges). The (cohort_day,
    # lag_s) grain is value-range-bounded, far below event volume.
    per_v = (
        lags.groupBy("cohort_day", "lag_s")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    pct = grouped_exact_percentiles(per_v, ["cohort_day"], "lag_s", "c", [50, 90])
    wide = pct.groupBy("cohort_day").agg(
        F.min(F.when(F.col("p") == 50, F.col("pv"))).alias("p50_lag_s"),
        F.min(F.when(F.col("p") == 90, F.col("pv"))).alias("p90_lag_s"),
    )
    sizes = per_v.groupBy("cohort_day").agg(F.sum("c").alias("n_converted"))
    return sizes.join(wide, "cohort_day").select(
        "cohort_day", "n_converted", "p50_lag_s", "p90_lag_s"
    )


ORACLE_CONVERSION_LAG = """
WITH v0 AS (
  SELECT user_id, CAST(min(floor(epoch(ts))) AS BIGINT) AS v0
  FROM events WHERE event_type = 'view' GROUP BY user_id
), lags AS (
  SELECT e.user_id,
         CAST(min(floor(epoch(e.ts)) - v.v0) AS BIGINT) AS lag_s,
         CAST(min(floor(v.v0 / 86400)) AS BIGINT) AS cohort_day
  FROM events e JOIN v0 v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND floor(epoch(e.ts)) > v.v0
  GROUP BY e.user_id
), per_v AS (
  SELECT cohort_day, lag_s, count(*) AS c FROM lags
  GROUP BY cohort_day, lag_s
), cum AS (
  SELECT cohort_day, lag_s, c,
         sum(c) OVER (PARTITION BY cohort_day ORDER BY lag_s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY cohort_day) AS tot
  FROM per_v
)
SELECT c1.cohort_day,
       CAST(min(c1.tot) AS BIGINT) AS n_converted,
       CAST(min(CASE WHEN 100 * c1.cum >= 50 * c1.tot THEN c1.lag_s END)
            AS BIGINT) AS p50_lag_s,
       CAST(min(CASE WHEN 100 * c1.cum >= 90 * c1.tot THEN c1.lag_s END)
            AS BIGINT) AS p90_lag_s
FROM cum c1 GROUP BY c1.cohort_day
"""


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type time-weighted average value (TWAP): each observation
    holds until the type's next event, so its value is weighted by that
    holding duration — the standard correction when sampling is
    irregular (a plain avg over-weights bursty periods).

    The holding interval is "time to the type's next event" — but a
    lead() window partitioned by event_type alone would sort each of the
    5 type partitions in ONE task (the constant-cardinality window trap
    this repo keeps killing). Segmented-window decomposition instead:
    lead() runs inside (type, hour) buckets — partition count grows with
    the time axis, per-partition rows are bounded by the type's hourly
    arrival rate — and each hour's LAST event takes its successor from
    the next event-bearing hour's first timestamp, computed on the
    HOURLY aggregate: running min over descending hours with a
    [unboundedPreceding, -1] frame (the gapfill "next non-null" trick),
    a window over aggregate-grain rows only. Identical successor, no
    raw-row type-wide sort.

    Parity: weights are integer SECONDS × integer centi-units — every
    per-row product (≤ 2.6e10) and every group sum fits a 64-bit long
    exactly, so the only float op is the single final division, computed
    identically on both engines."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.col("ts"),
        F.col("event_id"),
        F.unix_timestamp("ts").alias("t"),
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        F.round(F.col("value") * 100, 0).cast("long").alias("vu"),
    )
    wlead = W.partitionBy("event_type", "h").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    hourly = base.groupBy("event_type", "h").agg(F.min("t").alias("first_t"))
    wnext = (
        W.partitionBy("event_type")
        .orderBy(F.col("h").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    with_next = hourly.withColumn("next_first_t", F.min("first_t").over(wnext))
    rows = (
        base.withColumn("intra_next", F.lead("t", 1).over(wlead))
        .join(with_next.select("event_type", "h", "next_first_t"),
              ["event_type", "h"])
        .withColumn("t_next", F.coalesce("intra_next", "next_first_t"))
        .filter(F.col("t_next").isNotNull())
    )
    dur = F.col("t_next") - F.col("t")
    return (
        rows.groupBy("event_type")
        .agg(
            F.sum(dur * F.col("vu")).alias("wsum"),
            F.sum(dur).alias("dsum"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .select(
            "event_type",
            (F.floor((F.col("wsum") / (F.col("dsum") * 100.0)) * 10000
                     + F.lit(0.5)) / 10000).alias("twap"),
            F.col("dsum").alias("total_seconds"),
            "n_intervals",
        )
    )


ORACLE_TIME_WEIGHTED_AVG = """
WITH rows_t AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         CAST(round(value * 100, 0) AS BIGINT) AS vu,
         lead(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER
           (PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS t_next
  FROM events
)
SELECT event_type,
       floor((CAST(sum((t_next - t) * vu) AS DOUBLE)
              / (sum(t_next - t) * 100.0)) * 10000 + 0.5) / 10000 AS twap,
       CAST(sum(t_next - t) AS BIGINT) AS total_seconds,
       count(*) AS n_intervals
FROM rows_t WHERE t_next IS NOT NULL
GROUP BY event_type
"""


MAD_K_X10000 = 44478  # 3 · 1.4826 (normal-consistency) · 10⁴, exact integer


def q_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier statistics: median, MAD (median absolute
    deviation), and the count of events beyond 3·1.4826·MAD — the
    standard robust z-score rule that, unlike the mean/stddev form
    (value_anomalies), a few extreme values cannot drag.

    Everything is EXACT integer arithmetic on centi-units (fixture
    values carry 2 decimals): medians are min{v : 2·W(v) ≥ W_tot} over
    per-(type, value) counts, the deviation pass reruns the same rule on
    |v − med|, and the outlier rule compares dv·10⁴ > 44478·mad — no
    float ever crosses an engine boundary except the final /100.0
    projections, computed identically on both sides.

    Scale shape: the only corpus-sized stages are the two
    map-side-combined (type, units) aggregations; every window runs over
    DISTINCT 2-decimal values of a bounded domain (≤ ~10k rows per type
    at ANY corpus size), so there is no per-row sort anywhere."""
    ev = _events(spark, sf_dir)
    units = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("u"),
    )
    # localCheckpoint both reduced grains (r13): per_v feeds three
    # branches (totals, median, deviation) and dev two (MAD, final agg)
    # — lazily each branch re-ran the corpus-sized events aggregation
    # (12 parquet scans / 38 exchanges in the r12 plan). Both frames
    # are DISTINCT-value grains, bounded by the 2-decimal value domain
    # (≤ ~10k rows per type at any corpus size).
    per_v = (
        units.groupBy("event_type", "u")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = per_v.groupBy("event_type").agg(F.sum("c").alias("tot"))
    wv = (
        W.partitionBy("event_type").orderBy("u").rowsBetween(W.unboundedPreceding, 0)
    )
    med = (
        per_v.join(tot, "event_type")
        .withColumn("cum", F.sum("c").over(wv))
        .filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("event_type")
        .agg(F.min("u").alias("med_u"), F.min("tot").alias("tot"))
    )
    dev = (
        per_v.join(F.broadcast(med), "event_type")
        .withColumn("dv", F.abs(F.col("u") - F.col("med_u")))
        .groupBy("event_type", "dv")
        .agg(F.sum("c").alias("c"), F.min("med_u").alias("med_u"),
             F.min("tot").alias("tot"))
        .localCheckpoint(eager=False)
    )
    wd = (
        W.partitionBy("event_type").orderBy("dv").rowsBetween(W.unboundedPreceding, 0)
    )
    mad = (
        dev.withColumn("cum", F.sum("c").over(wd))
        .filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("event_type")
        .agg(F.min("dv").alias("mad_u"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med_u").alias("med_u"),
            F.min("mad_u").alias("mad_u"),
            F.min("tot").alias("n_events"),
            F.sum(
                F.when(
                    F.col("dv") * 10000 > MAD_K_X10000 * F.col("mad_u"),
                    F.col("c"),
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            (F.col("med_u") / 100.0).alias("median_value"),
            (F.col("mad_u") / 100.0).alias("mad"),
            "n_events",
            "n_outliers",
        )
    )


ORACLE_VALUE_MAD_OUTLIERS = """
WITH units AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS u FROM events
), per_v AS (
  SELECT event_type, u, count(*) AS c FROM units GROUP BY event_type, u
), tot AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS tot FROM per_v GROUP BY event_type
), med AS (
  SELECT event_type, min(u) AS med_u, min(tot) AS tot FROM (
    SELECT p.event_type, p.u, t.tot,
           sum(p.c) OVER (PARTITION BY p.event_type ORDER BY p.u
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM per_v p JOIN tot t ON p.event_type = t.event_type
  ) WHERE 2 * cum >= tot GROUP BY event_type
), dev AS (
  SELECT p.event_type, abs(p.u - m.med_u) AS dv, CAST(sum(p.c) AS BIGINT) AS c,
         min(m.med_u) AS med_u, min(m.tot) AS tot
  FROM per_v p JOIN med m ON p.event_type = m.event_type
  GROUP BY p.event_type, abs(p.u - m.med_u)
), mad AS (
  SELECT event_type, min(dv) AS mad_u FROM (
    SELECT event_type, dv, tot,
           sum(c) OVER (PARTITION BY event_type ORDER BY dv
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM dev
  ) WHERE 2 * cum >= tot GROUP BY event_type
)
SELECT d.event_type,
       min(d.med_u) / 100.0 AS median_value,
       min(a.mad_u) / 100.0 AS mad,
       CAST(min(d.tot) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN d.dv * 10000 > 44478 * a.mad_u THEN d.c ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad a ON d.event_type = a.event_type
GROUP BY d.event_type
"""


def q_type_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure with path length over the most-likely-next-type
    graph, via Spark 4's native WITH RECURSIVE — the first-class
    recursive-query feature the engine gained in 4.0, exercised
    end-to-end against DuckDB's recursive CTE semantics.

    Edges: for each event type, its single most frequent successor
    (ties break lexicographically) — a functional graph, so closure is
    genuinely multi-hop (chains and cycles), not the trivial dense
    closure the full 5×5 transition matrix would give. The corpus-sized
    work (per-user lag + pair counts) happens ONCE in DataFrame land;
    the recursion then iterates on a ≤|types|-row edge list, bounded at
    6 hops (> graph diameter, cycles cut by the bound). min(hops) makes
    the result path-order independent."""
    ev = _events(spark, sf_dir)
    wu = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = ev.select(
        F.lag("event_type", 1).over(wu).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wr = W.partitionBy("from_type").orderBy(F.col("n").desc(), F.col("to_type").asc())
    top = (
        counts.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select("from_type", "to_type")
        # localCheckpoint truncates lineage BEFORE the recursion: the
        # recursive join otherwise re-derives the corpus-sized lag+agg
        # under the view at every iteration (6.4 s → 2.1 s at sf0.1;
        # at 100 TB it is the difference between 1 and 6 corpus passes).
        # eager=False (round-6 advice): materialization happens on the
        # FIRST ACTION, not at plan construction, so plan-only paths
        # (explain CLI, dump_plans) stay job-free; the recursion still
        # reuses the one materialized copy. Trade-off: localCheckpoint
        # is non-reliable — executor loss during the query loses the
        # blocks instead of recomputing; a long-lived production job
        # would use checkpoint() to reliable storage here.
        .localCheckpoint(eager=False)
    )
    top.createOrReplaceTempView("rcte_type_edges")
    return spark.sql("""
      WITH RECURSIVE reach(src, dst, hops) AS (
        SELECT from_type, to_type, 1 FROM rcte_type_edges
        UNION ALL
        SELECT r.src, e.to_type, r.hops + 1
        FROM reach r JOIN rcte_type_edges e ON e.from_type = r.dst
        WHERE r.hops < 6
      )
      SELECT src, dst, CAST(min(hops) AS BIGINT) AS min_hops
      FROM reach GROUP BY src, dst
    """)


ORACLE_TYPE_REACHABILITY = """
WITH RECURSIVE pairs AS (
  SELECT lag(event_type, 1) OVER
           (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS from_type,
         event_type AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
), edges AS (
  SELECT from_type, to_type FROM (
    SELECT *, row_number() OVER (PARTITION BY from_type
                                 ORDER BY n DESC, to_type ASC) AS rk
    FROM counts
  ) WHERE rk = 1
), reach(src, dst, hops) AS (
  SELECT from_type, to_type, 1 FROM edges
  UNION ALL
  SELECT r.src, e.to_type, r.hops + 1
  FROM reach r JOIN edges e ON e.from_type = r.dst
  WHERE r.hops < 6
)
SELECT src, dst, CAST(min(hops) AS BIGINT) AS min_hops
FROM reach GROUP BY src, dst
"""


def q_chi_square_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² independence test for lang × source on the documents
    table (is the language mix uniform across sources?): χ² =
    Σ (O − E)²/E over the dense contingency grid, E = row·col/total.
    Expected counts are exact integer ratios; the 100-term float sum
    follows the KL precedent, round(4). One count + two marginals, all
    broadcastable."""
    docs = _t(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    row = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("r"))
    col = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    n = docs.count()
    grid = (
        row.crossJoin(col)
        .join(obs, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            F.coalesce("o", F.lit(0)).alias("o"),
            (F.col("r") * F.col("c") / F.lit(float(n))).alias("e"),
        )
    )
    term = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    return grid.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum(term), 4).alias("chi2"),
    )


ORACLE_CHI_SQUARE = """
WITH obs AS (
  SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source
), r AS (SELECT lang, count(*) AS r FROM documents GROUP BY lang),
c AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
n AS (SELECT count(*) * 1.0 AS n FROM documents),
grid AS (
  SELECT r.lang, c.source, coalesce(o, 0) AS o,
         r.r * c.c / (SELECT n FROM n) AS e
  FROM r CROSS JOIN c
  LEFT JOIN obs ON obs.lang = r.lang AND obs.source = c.source
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       round(sum((o - e) * (o - e) / e), 4) AS chi2
FROM grid
"""


# --- event analytics: funnel + retention ---------------------------------


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase, strictly increasing event
    times per user.

    ONE user_id shuffle total (round-6 rework; was three chained
    per-stage groupBys, each re-scanning + re-shuffling events — 4.8 s at
    sf1): the "first X after Y" chain becomes two running-min windows
    over the same (user_id, ts) sort — running first-view ts marks
    qualifying clicks (strictly after a view), running first-QUALIFYING-
    click ts marks qualifying purchases — then the per-user flags
    aggregate on the partitioning the window already established (no
    second Exchange; the final 1-row rollup moves three ints).
    Equivalence to the min-chained oracle: a purchase at t qualifies iff
    the first qualifying click ct < t, and the running min of qualifying
    click ts at row t is < t exactly when ct < t (the first qualifying
    click precedes t in ts order). Tie-safe under the strict >: a
    same-ts view/click never qualifies whichever side of the ROWS frame
    boundary it lands on. The growing [unboundedPreceding, current]
    frame is the incremental O(n) one (CLAUDE.md window invariant).
    """
    ev = _events(spark, sf_dir)
    ev3 = ev.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", "ts", "event_id")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run_vt = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev3.withColumn("_vt", run_vt)
    qclick = (
        (F.col("event_type") == "click")
        & F.col("_vt").isNotNull()
        & (F.col("ts") > F.col("_vt"))
    )
    staged = staged.withColumn(
        "_qct", F.min(F.when(qclick, F.col("ts"))).over(w)
    )
    qbuy = (
        (F.col("event_type") == "purchase")
        & F.col("_qct").isNotNull()
        & (F.col("ts") > F.col("_qct"))
    )
    per_user = staged.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("has_view"),
        F.max(qclick.cast("int")).alias("has_click"),
        F.max(qbuy.cast("int")).alias("has_buy"),
    )
    return per_user.agg(
        F.sum("has_view").alias("n_view_users"),
        F.sum("has_click").alias("n_click_after_view"),
        F.sum("has_buy").alias("n_full_funnel"),
    )


ORACLE_FUNNEL_CONVERSION = """
WITH v AS (
  SELECT user_id, min(ts) AS vt FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(ts) AS ct
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE event_type = 'click' AND ts > vt GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(ts) AS pt
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE event_type = 'purchase' AND ts > ct GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view_users,
       (SELECT count(*) FROM c) AS n_click_after_view,
       (SELECT count(*) FROM p) AS n_full_funnel
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day,
    counted on each later active day (day_offset).

    Two aggs on the same user_id shuffle key (first-day, distinct
    activity) + a broadcast of the user→cohort map. The result is
    (cohorts × offsets) — thousands of rows regardless of event volume.
    """
    ev = _events(spark, sf_dir)
    days = ev.select("user_id", day_number(F.col("ts")).alias("day")).distinct()
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(F.broadcast(cohort), "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


ORACLE_RETENTION_COHORTS = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day
  FROM events
), cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
)
SELECT cohort_day, day - cohort_day AS day_offset, CAST(count(*) AS BIGINT) AS n_users
FROM days JOIN cohort USING (user_id)
GROUP BY cohort_day, day - cohort_day
"""


# --- robust anomaly detection (median / MAD) --------------------------------


def q_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates from the per-type median by more than
    3 robust sigmas (1.4826·MAD) — outlier flagging that, unlike
    mean/stddev z-scores, isn't dragged by the outliers themselves.

    Two grouped exact percentiles (type-cardinality results, broadcast
    back) + one filter scan: the fact table never shuffles. abs_dev is
    emitted through the floor quantizer — medians of even groups average
    two 4-decimal values, landing deviations exactly on round-half
    boundaries (timeseries._quantize4 rationale)."""
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type").filter(
        F.col("absdev") > 3 * 1.4826 * F.col("mad")
    )
    return flagged.select(
        "event_id",
        "event_type",
        "value",
        (F.floor(F.col("absdev") * 10000 + F.lit(0.5)) / 10000).alias("abs_dev"),
    )


ORACLE_VALUE_ANOMALIES = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_id, e.event_type, e.value, abs(e.value - m.med) AS absdev
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, median(absdev) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type AS event_type, d.value,
       floor(d.absdev * 10000 + 0.5) / 10000 AS abs_dev
FROM dev d JOIN mad m ON d.event_type = m.event_type
WHERE d.absdev > 3 * 1.4826 * m.mad
"""


# --- rolling time window (RANGE frame) ---------------------------------------


def q_rolling_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 7-day rolling revenue over the daily series — a RANGE
    frame ([day-6, day] on the ORDER value, not row offsets), the frame
    family none of the other window queries exercise: gaps in the daily
    series shrink the frame, so a rowsBetween(-6, 0) would be wrong
    whenever a type skips a day.

    Scale shape: the heavy reduction events→daily is a map-side-combined
    groupBy on (day, type); the window then runs over the TYPE-count×days
    result — tiny — partitioned by type (no global sort, no single
    partition). Rolling sums are floor-quantized on both engines."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.withColumn(
            "day", F.floor(F.unix_timestamp("ts") / 86400).cast("long")
        )
        .groupBy("day", "event_type")
        .agg(
            F.round(F.sum("value"), 4).alias("day_value"),
            F.count(F.lit(1)).alias("day_events"),
        )
    )
    w = W.partitionBy("event_type").orderBy("day").rangeBetween(-6, 0)
    roll_sum = F.sum("day_value").over(w)
    roll_days = F.count(F.lit(1)).over(w)
    return daily.select(
        "day",
        "event_type",
        "day_value",
        "day_events",
        roll_days.alias("window_days"),
        (F.floor(roll_sum * 10000 + F.lit(0.5)) / 10000).alias("roll_value"),
        (F.floor((roll_sum / roll_days) * 10000 + F.lit(0.5)) / 10000).alias(
            "roll_avg"
        ),
    )


ORACLE_ROLLING_7DAY = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, event_type,
         round(sum(value), 4) AS day_value,
         CAST(count(*) AS BIGINT) AS day_events
  FROM events GROUP BY 1, 2
)
SELECT day, event_type, day_value, day_events,
       CAST(count(*) OVER w AS BIGINT) AS window_days,
       floor(sum(day_value) OVER w * 10000 + 0.5) / 10000 AS roll_value,
       floor((sum(day_value) OVER w / count(*) OVER w) * 10000 + 0.5) / 10000
         AS roll_avg
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# --- time series: gap-fill + interpolation, EWMA ----------------------------


def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user grid with LOCF + linear interpolation
    (operators/timeseries.py): resampling an irregular event stream."""
    from pleiades_spark.operators.timeseries import gapfill_hourly

    return gapfill_hourly(_events(spark, sf_dir))


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/residual decomposition of the per-type
    hourly series (operators/timeseries.seasonal_decompose_hourly) —
    integer-unit arithmetic end-to-end so both engines derive identical
    doubles; see the operator docstring for the parity argument."""
    from pleiades_spark.operators.timeseries import seasonal_decompose_hourly

    return seasonal_decompose_hourly(_events(spark, sf_dir))


ORACLE_SEASONAL_DECOMPOSE = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
         CAST(round(sum(value) * 100, 0) AS BIGINT) AS hv
  FROM events GROUP BY event_type, hour
), framed AS (
  SELECT event_type, hour, hv,
         CAST(sum(hv) OVER w AS BIGINT) AS num,
         count(*) OVER w AS den
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), interior AS (
  SELECT event_type, hour, hv, num, hour % 24 AS hod,
         hv * 25 - num AS det_units
  FROM framed WHERE den = 25
), seasonal AS (
  SELECT event_type, hod, CAST(sum(det_units) AS BIGINT) AS s_units,
         count(*) AS s_n
  FROM interior GROUP BY event_type, hod
)
SELECT i.event_type, i.hour,
       floor((i.hv / 100.0) * 10000 + 0.5) / 10000 AS hour_value,
       floor((i.num / 2500.0) * 10000 + 0.5) / 10000 AS trend,
       floor((CAST(s.s_units AS DOUBLE) / (s.s_n * 2500.0)) * 10000 + 0.5)
         / 10000 AS seasonal,
       floor((i.det_units / 2500.0
              - CAST(s.s_units AS DOUBLE) / (s.s_n * 2500.0)) * 10000 + 0.5)
         / 10000 AS resid
FROM interior i JOIN seasonal s
  ON i.event_type = s.event_type AND i.hod = s.hod
"""


ORACLE_TIMESERIES_GAPFILL = """
WITH hourly AS (
  SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 4) AS val
  FROM events GROUP BY user_id, hour
), bounds AS (
  SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(range(h0, h1 + 1)) AS hour FROM bounds
), joined AS (
  SELECT g.user_id, g.hour, h.n_events, h.val
  FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
), win AS (
  SELECT user_id, hour, n_events, val,
    last_value(val IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hour
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    first_value(val IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hour
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    last_value(CASE WHEN val IS NOT NULL THEN hour END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hour
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    first_value(CASE WHEN val IS NOT NULL THEN hour END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hour
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM joined
)
SELECT user_id, hour, coalesce(n_events, 0) AS n_events, val,
       round(pv, 4) AS val_ffill,
       floor((CASE WHEN val IS NOT NULL THEN val
                   ELSE pv + (nv - pv) * (hour - ph) / (nh - ph) END)
             * 10000 + 0.5) / 10000
         AS val_interp
FROM win
"""


def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (sequential recurrence; vectorized
    pandas ewm per key, recursive-CTE oracle)."""
    from pleiades_spark.operators.timeseries import ewma_user_value

    return ewma_user_value(_events(spark, sf_dir))


ORACLE_EWMA_USER_VALUE = """
WITH RECURSIVE ordered AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), rec AS (
  SELECT user_id, event_id, rn, value AS y FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_id, o.rn, 0.5 * r.y + 0.5 * o.value
  FROM rec r JOIN ordered o ON o.user_id = r.user_id AND o.rn = r.rn + 1
)
SELECT user_id, event_id, floor(y * 10000 + 0.5) / 10000 AS ewma FROM rec
"""


QUERIES = [
    Query("counters_rollup", q_counters_rollup, ORACLE_COUNTERS_ROLLUP,
          "A1+A2 dual-grain conditional count + signed sum (flagship)"),
    Query("counters_window_day", q_counters_window_day, ORACLE_COUNTERS_WINDOW_DAY,
          "P9 tumbling 1-day event-time window grouping"),
    Query("props_json", q_props_json, ORACLE_PROPS_JSON,
          "P1 JSON payload parse + predicate"),
    Query("props_map_keys", q_props_map_keys, ORACLE_PROPS_MAP_KEYS,
          "P1 schemaless map-type JSON parse + key frequency"),
    Query("regex_extract", q_regex_extract, ORACLE_REGEX_EXTRACT,
          "P8 regex numeric extraction with null-on-no-match"),
    Query("day_list", q_day_list, ORACLE_DAY_LIST,
          "A4 distinct + guard filter + sort"),
    Query("counter_like_filter", q_counter_like_filter, ORACLE_COUNTER_LIKE_FILTER,
          "F1 prefix/suffix LIKE filters"),
    Query("top_types", q_top_types, ORACLE_TOP_TYPES,
          "F2 deterministic top-k by value"),
    Query("strip_prefix", q_strip_prefix, ORACLE_STRIP_PREFIX,
          "F3 string surgery to join key"),
    Query("dim_join", q_dim_join, ORACLE_DIM_JOIN,
          "F4 broadcast dim join + coalesce fallback chain"),
    Query("big_numbers", q_big_numbers, ORACLE_BIG_NUMBERS,
          "F5 description mapping + unit conversion"),
    Query("point_lookup", q_point_lookup, ORACLE_POINT_LOOKUP,
          "F6 point lookup + format_number"),
    Query("days_iso", q_days_iso, ORACLE_DAYS_ISO,
          "F7/F8 julian day → ISO date"),
    Query("gauges_min_max_avg", q_gauges, ORACLE_GAUGES,
          "A5 min/max/avg gauges per dimension"),
    Query("value_histogram", q_value_histogram, ORACLE_VALUE_HISTOGRAM,
          "A6 fixed-bucket histogram (width_bucket-style when chain)"),
    Query("sessionization", q_sessionization, ORACLE_SESSIONIZATION,
          "gap-based sessionization via lag + running sum"),
    Query("scd2_user_state", q_scd2_user_state, ORACLE_SCD2_USER_STATE,
          "SCD2 versioned state history from the event log (CDC pattern)"),
    Query("session_window_agg", q_session_window_agg, ORACLE_SESSION_WINDOW_AGG,
          "native session_window gap-merged aggregation"),
    Query("counters_sliding_window", q_counters_sliding_window,
          ORACLE_COUNTERS_SLIDING_WINDOW, "2h/1h hopping window aggregation"),
    Query("price_tier_range_join", q_price_tier_range_join,
          ORACLE_PRICE_TIER_RANGE_JOIN, "interval/range join (broadcast form)"),
    Query("interval_join_bucketized", q_interval_join_bucketized,
          ORACLE_INTERVAL_JOIN_BUCKETIZED,
          "big-big temporal interval join via time-bucket banding"),
    Query("extreme_orders", q_extreme_orders, ORACLE_EXTREME_ORDERS,
          "min_by/max_by argmin-argmax aggregates"),
    Query("top_orders_global", q_top_orders_global, ORACLE_TOP_ORDERS_GLOBAL,
          "global sort+limit (TakeOrderedAndProject)"),
    Query("rfm_segments", q_rfm_segments, ORACLE_RFM_SEGMENTS,
          "RFM quintile scoring + behavioral segment labels per user"),
    Query("event_transitions", q_event_transitions, ORACLE_EVENT_TRANSITIONS,
          "first-order Markov transition matrix over event types"),
    Query("type_reachability", q_type_reachability, ORACLE_TYPE_REACHABILITY,
          "native WITH RECURSIVE transitive closure (Spark 4 recursive CTE)"),
    Query("value_mad_outliers", q_value_mad_outliers, ORACLE_VALUE_MAD_OUTLIERS,
          "robust median/MAD outlier stats, exact integer units"),
    Query("time_weighted_avg", q_time_weighted_avg, ORACLE_TIME_WEIGHTED_AVG,
          "duration-weighted TWAP per type (integer-exact accumulation)"),
    Query("conversion_lag", q_conversion_lag, ORACLE_CONVERSION_LAG,
          "exact p50/p90 view→purchase lag per cohort (bucketed percentiles)"),
    Query("hourly_trend_ols", q_hourly_trend_ols, ORACLE_HOURLY_TREND_OLS,
          "integer-exact OLS slope/intercept of each type's hourly series"),
    Query("chi_square_lang_source", q_chi_square_lang_source, ORACLE_CHI_SQUARE,
          "Pearson chi-square independence test (lang x source grid)"),
    Query("user_burstiness", q_user_burstiness, ORACLE_USER_BURSTINESS,
          "inter-event gap CV per user (bot/organic temporal fingerprint)"),
    Query("trending_counters", q_trending_counters, ORACLE_TRENDING_COUNTERS,
          "exponentially decayed trending score per event type"),
    Query("variant_extract", q_variant_extract, ORACLE_VARIANT_EXTRACT,
          "Spark 4 VARIANT parse + typed extraction (schema-on-read payloads)"),
    Query("ohlc_hourly", q_ohlc_hourly, ORACLE_OHLC_HOURLY,
          "OHLC/VWAP bars per (type, hour): min_by/max_by single-pass agg"),
    Query("kmv_distinct", q_kmv_distinct, ORACLE_KMV_DISTINCT,
          "KMV cardinality sketch: deterministic cross-engine distinct estimate"),
    Query("data_quality_report", q_data_quality_report, ORACLE_DATA_QUALITY,
          "Deequ-style constraint report: one wide aggregate, stacked checks"),
    Query("asof_join_forward", q_asof_forward, ORACLE_ASOF_FORWARD,
          "forward as-of join with 2h tolerance (next purchase attribution)"),
    Query("asof_join_signup", q_asof_signup, ORACLE_ASOF_SIGNUP,
          "as-of join via conditional last(ignorenulls) window"),
    Query("funnel_conversion", q_funnel_conversion, ORACLE_FUNNEL_CONVERSION,
          "ordered view→click→purchase funnel, decorrelated per-user mins"),
    Query("retention_cohorts", q_retention_cohorts, ORACLE_RETENTION_COHORTS,
          "cohort retention triangle (first-day cohort × day offset)"),
    Query("rolling_7day", q_rolling_7day, ORACLE_ROLLING_7DAY,
          "7-day rolling sum/avg per type via RANGE frame (gap-correct)"),
    Query("value_anomalies", q_value_anomalies, ORACLE_VALUE_ANOMALIES,
          "median/MAD robust outlier flags per event type"),
    Query("seasonal_decompose", q_seasonal_decompose, ORACLE_SEASONAL_DECOMPOSE,
          "additive trend/seasonal/residual split of the hourly series"),
    Query("timeseries_gapfill", q_timeseries_gapfill, ORACLE_TIMESERIES_GAPFILL,
          "hourly resample: grid explode + LOCF + linear interpolation"),
    Query("ewma_user_value", q_ewma_user_value, ORACLE_EWMA_USER_VALUE,
          "per-user EWMA recurrence (pandas ewm / recursive-CTE oracle)"),
]
