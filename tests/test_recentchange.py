"""Exact-parity tests for the native recentchange counter derivation.

Golden expectations mirror the reference's captured-event semantics
(FIXTURES.md §A.1): a hewiki bot minor edit with length.old == length.new
== 4905 at ts 1596207527001 ms must derive exactly
{total, wiki_hewiki, type_edit, bot, minor, length_dec}, lendiff 0,
day 18474 — equality counting as DEC per aggregator.go:58-62.
"""

import json

from pleiades_spark.functions.recentchange import (
    aggregate_recentchange,
    derive_recentchange_counters,
    event_id_timestamp_ms,
)

from pyspark.sql import functions as F

GOLDEN_ID = (
    '[{"topic":"eqiad.mediawiki.recentchange","partition":0,'
    '"timestamp":1596207527001},{"topic":"codfw.mediawiki.recentchange",'
    '"partition":0,"offset":-1}]'
)

GOLDEN_EVENT = {
    "$schema": "/mediawiki/recentchange/1.0.0",
    "meta": {"dt": "2020-07-31T14:58:47Z", "id": "x", "stream": "mediawiki.recentchange"},
    "type": "edit",
    "title": "Example page",
    "timestamp": 1596207527,
    "user": "ExampleBot",
    "bot": True,
    "minor": True,
    "wiki": "hewiki",
    "server_name": "he.wikipedia.org",
    "length": {"old": 4905, "new": 4905},
    "revision": {"old": 1, "new": 2},
}


def _raw(spark, rows):
    return spark.createDataFrame(rows, "id string, value string")


def test_golden_event_counters(spark):
    raw = _raw(spark, [(GOLDEN_ID, json.dumps(GOLDEN_EVENT))])
    rows = derive_recentchange_counters(raw).collect()
    got = sorted(r.counter for r in rows)
    assert got == [
        "pleiades_bot",
        "pleiades_length_dec",
        "pleiades_minor",
        "pleiades_total",
        "pleiades_type_edit",
        "pleiades_wiki_hewiki",
    ]
    assert {r.day for r in rows} == {18474}
    assert all(r.lendiff == 0 for r in rows)


def test_malformed_json_still_counts_total(spark):
    raw = _raw(spark, [(GOLDEN_ID, "this is not json {")])
    rows = derive_recentchange_counters(raw).collect()
    assert [r.counter for r in rows] == ["pleiades_total"]
    assert rows[0].lendiff == 0


def test_length_inc_and_lendiff(spark):
    ev = dict(GOLDEN_EVENT, length={"old": 100, "new": 150})
    raw = _raw(spark, [(GOLDEN_ID, json.dumps(ev))])
    rows = derive_recentchange_counters(raw).collect()
    assert "pleiades_length_inc" in {r.counter for r in rows}
    assert all(r.lendiff == 50 for r in rows)


def test_missing_length_no_inc_dec(spark):
    ev = {k: v for k, v in GOLDEN_EVENT.items() if k != "length"}
    raw = _raw(spark, [(GOLDEN_ID, json.dumps(ev))])
    got = {r.counter for r in rows} if (rows := derive_recentchange_counters(raw).collect()) else set()
    assert "pleiades_length_inc" not in got and "pleiades_length_dec" not in got


def test_page_creation_zero_value_semantics(spark):
    """length present with only .new (page creation): Go zero-values the
    absent old → 0 < new → length_inc, lendiff = +new (not dec/0)."""
    ev = dict(GOLDEN_EVENT, length={"new": 250})
    raw = _raw(spark, [(GOLDEN_ID, json.dumps(ev))])
    rows = derive_recentchange_counters(raw).collect()
    got = {r.counter for r in rows}
    assert "pleiades_length_inc" in got and "pleiades_length_dec" not in got
    assert all(r.lendiff == 250 for r in rows)


def test_page_blank_only_old_zero_value_semantics(spark):
    """length with only .old: new reads as 0 → old < 0 false → length_dec,
    lendiff = -old."""
    ev = dict(GOLDEN_EVENT, length={"old": 40})
    raw = _raw(spark, [(GOLDEN_ID, json.dumps(ev))])
    rows = derive_recentchange_counters(raw).collect()
    got = {r.counter for r in rows}
    assert "pleiades_length_dec" in got and "pleiades_length_inc" not in got
    assert all(r.lendiff == -40 for r in rows)


def test_event_id_timestamp_field_order_tolerant(spark):
    # field-order permutation, as in the reference's table test
    flipped = '[{"timestamp":1596207527001,"topic":"x","partition":0}]'
    df = spark.createDataFrame([(flipped,), ("no timestamp here",)], "id string")
    rows = df.select(event_id_timestamp_ms(F.col("id")).alias("ms")).collect()
    assert rows[0].ms == 1596207527001
    assert rows[1].ms is None


def test_dual_grain_aggregate(spark):
    day2 = GOLDEN_ID.replace("1596207527001", "1596293927001")  # +1 day
    raw = _raw(
        spark,
        [
            (GOLDEN_ID, json.dumps(GOLDEN_EVENT)),
            (day2, json.dumps(dict(GOLDEN_EVENT, length={"old": 1, "new": 11}))),
        ],
    )
    out = {(r.day, r.counter): (r.events, r.growth) for r in aggregate_recentchange(raw).collect()}
    assert out[(None, "pleiades_total")] == (2, 10)
    assert out[(18474, "pleiades_total")] == (1, 0)
    assert out[(18475, "pleiades_length_inc")] == (1, 10)
