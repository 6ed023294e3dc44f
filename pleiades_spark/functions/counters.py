"""Counter derivation — the analytical heart of pleiades, Spark-first.

Reference: ``CountersFromEventData`` (/root/reference/pkg/aggregator/
aggregator.go:32-66) maps one event to a *set* of counter names plus one
signed delta (``lendiff``); the aggregator then increments each counter at
two grains (all-time + per-day, kafka/aggregator.go:174-199).

Here the per-event imperative fan-out becomes a declarative
``explode(array_compact(array(when(...), ...)))`` over the ``events``
fixture, and the 2(N+1) per-event Redis round-trips become ONE shuffled
hash aggregation with map-side partial aggregation — the single biggest
architectural win of the rebuild (see SURVEY.md §3.2).

Semantics preserved from the reference (SURVEY.md §7 "quirks"):
  * the inc/dec comparison counts *equality as dec* (aggregator.go:58-62);
  * the signed delta is 0 when the compared field is absent
    (aggregator.go:63).

DELIBERATE DEVIATION — malformed payloads: ``CountersFromEventData``
itself appends the total counter before parsing can fail
(aggregator.go:34-40), but both reference callers bail on its error
return BEFORE any Redis increment (kafka/aggregator.go:159-204,
file/aggregator.go:151-217), so in the reference a malformed event
increments *nothing* — it is retried forever (kafka) or the file is left
in place (file). Here malformed events count once toward the total:
at-most-once visibility of bad input beats the reference's
poison-pill retry loop, and the malformed count is surfaced as an
observed metric (streaming/pipeline.py ``observe``).

Fixture mapping (FIXTURES.md §B): ``event_type`` ↔ wiki/type dimension,
``ts`` ↔ event time, ``value`` vs JSON ``props.k`` ↔ length.old/new,
``user_id % 2 == 0`` ↔ the ``bot`` boolean.

Scale: everything below is built-in JVM expressions inside whole-stage
codegen — no Python in the hot path. The explode multiplies rows ~4× before
the aggregation, but map-side combine collapses them to (day × counter)
cardinality before the shuffle, so shuffle volume is O(distinct keys), not
O(events), at any data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86400


def day_number(ts: Column) -> Column:
    """Event-time day bucketing (P9): julian-style day = epoch_secs // 86400.

    Mirrors kafka/aggregator.go:174-175 (``ts_ms / 86400000``) on a
    TIMESTAMP column. Equivalent to a 1-day tumbling window keyed on event
    time.
    """
    return F.floor(F.unix_timestamp(ts) / SECONDS_PER_DAY).cast("long")


def props_k(props: Column) -> Column:
    """P1: parse the raw JSON payload's ``k`` field (null on malformed)."""
    return F.get_json_object(props, "$.k").cast("long")


def counter_array(df: DataFrame, k: Column | None = None) -> Column:
    """P2-P6: the per-event set of counter names, as a null-compacted array.

    One slot per conditional; ``array_compact`` drops the conditions that
    didn't fire, exactly like the reference appending to a Go slice.

    Pass a pre-projected ``k`` column to avoid re-running the JSON path
    (derive_counters does; see its plan note).
    """
    if k is None:
        k = props_k(F.col("props"))
    return F.array_compact(
        F.array(
            # P2 — unconditional total (malformed payloads still count).
            F.lit("pleiades_total"),
            # P3/P4 — non-empty string dimension → prefixed counter.
            F.when(
                F.col("event_type").isNotNull() & (F.col("event_type") != ""),
                F.concat(F.lit("pleiades_type_"), F.col("event_type")),
            ),
            # P5 — boolean predicate counter.
            F.when(F.col("user_id") % 2 == 0, F.lit("pleiades_bot")),
            # P6 — null-check + comparison; equality counts as DEC
            # (aggregator.go:58-62).
            F.when(
                k.isNotNull(),
                F.when(F.col("value") > k, F.lit("pleiades_value_inc")).otherwise(
                    F.lit("pleiades_value_dec")
                ),
            ),
        )
    )


def lendiff(df: DataFrame, k: Column | None = None) -> Column:
    """P7: signed growth delta; 0 when the payload field is absent."""
    if k is None:
        k = props_k(F.col("props"))
    return F.coalesce(F.col("value") - k, F.lit(0.0))


def derive_counters(events: DataFrame) -> DataFrame:
    """events → (day, counter, lendiff) — one row per fired counter.

    The JSON payload field is projected ONCE before the explode — the
    inline form would run the JsonPath three times per row (null check,
    comparison, lendiff), visible in the physical plan's Generate args.
    """
    with_k = events.select(
        "ts", "user_id", "event_type", "value", props_k(F.col("props")).alias("k")
    )
    k = F.col("k")
    return with_k.select(
        day_number(F.col("ts")).alias("day"),
        F.explode(counter_array(with_k, k)).alias("counter"),
        lendiff(with_k, k).alias("lendiff"),
    )


def aggregate_counters(events: DataFrame) -> DataFrame:
    """A1+A2: dual-grain (all-time + per-day) conditional count and signed sum.

    The reference maintains two Redis key families (``pleiades_*`` and
    ``day_<d>_pleiades_*``); here that is a single ``GROUPING SETS
    ((counter), (day, counter))`` aggregation — day IS NULL rows are the
    all-time grain. Spark plans this as one hash-aggregate with a single
    shuffle on (day, counter, grouping-id).
    """
    derived = derive_counters(events)
    return (
        derived.groupingSets(
            [[F.col("counter")], [F.col("day"), F.col("counter")]],
            F.col("day"),
            F.col("counter"),
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.round(F.sum("lendiff"), 4).alias("growth"),
        )
    )
