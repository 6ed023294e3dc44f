"""Counter derivation for REAL mediawiki/recentchange events.

This is the exact-parity twin of ``CountersFromEventData``
(/root/reference/pkg/aggregator/aggregator.go:32-66) on the reference's
native schema, preserving its quirks:

  * every *processed* event → ``pleiades_total``. DELIBERATE DEVIATION
    for malformed JSON: the reference's callers return on the
    CountersFromEventData error before any increment
    (kafka/aggregator.go:159-204, file/aggregator.go:151-217), so a
    malformed event increments nothing there (and poisons the partition —
    kafka retries it forever). Here parse failures null every field but
    the unconditional total slot still fires: counted once, never
    retried, surfaced via the ``malformed`` observed metric;
  * ``wiki != ""`` → ``pleiades_wiki_<wiki>`` (go treats missing string
    fields as "", so NULL and "" both skip — aggregator.go:41-45);
  * ``type != ""`` → ``pleiades_type_<type>`` (aggregator.go:46-50);
  * ``bot`` → ``pleiades_bot``; ``minor`` → ``pleiades_minor``
    (aggregator.go:51-56);
  * ``length`` present → ``old < new ? length_inc : length_dec`` —
    equality counts as DEC (aggregator.go:57-62);
  * ``lendiff = new - old``, 0 when length absent (aggregator.go:63);
  * event-time ms comes from the Kafka key / SSE event ID (a JSON array),
    regex-extracted as '"timestamp":([0-9]+)' rather than parsed —
    tolerant of field order (aggregator.go:20,79-89);
  * day bucket = ms / 86400000 (kafka/aggregator.go:174-175).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pleiades_spark.schemas import RECENTCHANGE_SCHEMA

MS_PER_DAY = 86_400_000

TS_REGEX = '"timestamp":\\s*([0-9]+)'


def event_id_timestamp_ms(event_id: Column) -> Column:
    """ms timestamp regex-extracted from the event-ID JSON array (P8);
    NULL when absent (the reference returns an error there — its caller
    then skips day bucketing)."""
    return F.regexp_extract(event_id, TS_REGEX, 1).try_cast("long")


def recentchange_counter_array(rc: Column) -> Column:
    """Per-event counter set from a parsed recentchange struct column."""
    nonempty = lambda c: c.isNotNull() & (c != "")  # noqa: E731
    return F.array_compact(
        F.array(
            F.lit("pleiades_total"),
            F.when(
                nonempty(rc.getField("wiki")),
                F.concat(F.lit("pleiades_wiki_"), rc.getField("wiki")),
            ),
            F.when(
                nonempty(rc.getField("type")),
                F.concat(F.lit("pleiades_type_"), rc.getField("type")),
            ),
            F.when(rc.getField("bot"), F.lit("pleiades_bot")),
            F.when(rc.getField("minor"), F.lit("pleiades_minor")),
            # Go unmarshals absent numeric fields to 0 (page creations carry
            # only length.new) — coalesce BOTH sides to 0 before comparing,
            # or a NULL comparison would fall to the dec branch and diverge
            # from the reference on real streams.
            F.when(
                rc.getField("length").isNotNull(),
                F.when(
                    F.coalesce(rc.getField("length").getField("old"), F.lit(0))
                    < F.coalesce(rc.getField("length").getField("new"), F.lit(0)),
                    F.lit("pleiades_length_inc"),
                ).otherwise(F.lit("pleiades_length_dec")),
            ),
        )
    )


def derive_recentchange_counters(raw: DataFrame) -> DataFrame:
    """(id STRING, value STRING) raw events → (day, counter, lendiff).

    ``id`` is the SSE/Kafka event ID (JSON array string), ``value`` the raw
    event body. Malformed bodies produce a NULL struct → only
    ``pleiades_total`` fires, matching the reference's error path.
    """
    rc = F.from_json(F.col("value"), RECENTCHANGE_SCHEMA)
    # Zero-value semantics (Go): an absent old/new inside a present length
    # struct reads as 0, so a creation event's lendiff is +new, not 0.
    # Length absent entirely → 0 (aggregator.go:63).
    lendiff = F.when(
        rc.getField("length").isNotNull(),
        F.coalesce(rc.getField("length").getField("new"), F.lit(0).cast("long"))
        - F.coalesce(rc.getField("length").getField("old"), F.lit(0).cast("long")),
    ).otherwise(F.lit(0).cast("long"))
    ts_ms = event_id_timestamp_ms(F.col("id"))
    return raw.select(
        F.floor(ts_ms / MS_PER_DAY).cast("long").alias("day"),
        F.explode(recentchange_counter_array(rc)).alias("counter"),
        lendiff.alias("lendiff"),
    )


def aggregate_recentchange(raw: DataFrame) -> DataFrame:
    """Dual-grain (all-time + per-day) counters over raw recentchange events."""
    derived = derive_recentchange_counters(raw)
    return derived.groupingSets(
        [[F.col("counter")], [F.col("day"), F.col("counter")]],
        F.col("day"),
        F.col("counter"),
    ).agg(
        F.count(F.lit(1)).alias("events"),
        F.sum("lendiff").alias("growth"),
    )
