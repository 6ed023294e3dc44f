"""Golden tests for the counter-derivation semantics.

The quirks preserved from the reference (SURVEY.md §7) are asserted on
hand-built rows: equality counts as DEC (aggregator.go:58-62), missing
payload field → lendiff 0 (aggregator.go:63), every event counts toward
total (aggregator.go:34-40).
"""

import datetime

from pyspark.sql import Row

from pleiades_spark.functions.counters import aggregate_counters, derive_counters

TS = datetime.datetime(2020, 7, 31, 14, 58, 47)  # day 18474 (the reference's
# golden recentchange event lands on this day: 1596207527 // 86400)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )


def test_every_event_counts_toward_total(spark):
    ev = _events(spark, [Row(1, TS, 1, None, 1.0, "not json at all")])
    got = {r.counter for r in derive_counters(ev).collect()}
    assert "pleiades_total" in got


def test_equality_counts_as_dec(spark):
    # value == k → DEC, mirroring old == new → length_dec (aggregator.go:58-62)
    ev = _events(spark, [Row(1, TS, 1, "edit", 5.0, '{"k": 5}')])
    got = {r.counter for r in derive_counters(ev).collect()}
    assert "pleiades_value_dec" in got and "pleiades_value_inc" not in got


def test_missing_payload_field_zero_lendiff(spark):
    ev = _events(spark, [Row(1, TS, 1, "edit", 5.0, "{}")])
    rows = derive_counters(ev).collect()
    assert all(r.lendiff == 0.0 for r in rows)
    got = {r.counter for r in rows}
    assert "pleiades_value_inc" not in got and "pleiades_value_dec" not in got


def test_golden_event_counter_set(spark):
    # Analog of the reference's captured hewiki bot/minor edit (sse_test.go:15):
    # even user_id plays 'bot', equal value/k plays old==new.
    ev = _events(spark, [Row(1, TS, 2, "edit", 4905.0, '{"k": 4905}')])
    rows = derive_counters(ev).collect()
    got = sorted(r.counter for r in rows)
    assert got == [
        "pleiades_bot",
        "pleiades_total",
        "pleiades_type_edit",
        "pleiades_value_dec",
    ]
    assert {r.day for r in rows} == {18474}
    assert all(r.lendiff == 0.0 for r in rows)


def test_dual_grain_rollup(spark):
    ev = _events(
        spark,
        [
            Row(1, TS, 1, "edit", 10.0, '{"k": 3}'),
            Row(2, TS + datetime.timedelta(days=1), 1, "edit", 1.0, '{"k": 3}'),
        ],
    )
    out = aggregate_counters(ev)
    rows = {(r.day, r.counter): (r.events, r.growth) for r in out.collect()}
    # all-time grain (day NULL) aggregates both days
    assert rows[(None, "pleiades_total")] == (2, 5.0)
    assert rows[(18474, "pleiades_total")] == (1, 7.0)
    assert rows[(18475, "pleiades_total")] == (1, -2.0)


def test_entry_survives_hostile_timezone(spark, duck, sf_dir):
    """The driver builds its own session; a non-UTC session timezone
    must not skew day bucketing — apply_runtime_confs (called by every
    query fn) re-pins UTC. Probe: flip the tz, run the flagship entry
    query, compare against the DuckDB oracle's day counts."""
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        import __spark_entry__ as entrymod

        rows = entrymod.queries()["counters_rollup"](spark, sf_dir).collect()
        got = {
            (r["day"], r["counter"]): r["events"]
            for r in rows
            if r["day"] is not None
        }
        want = {
            (d, c): n
            for d, c, n in duck.execute(
                """
                SELECT CAST(floor(epoch(ts)/86400) AS BIGINT) AS day, counter,
                       count(*) FROM (
                  SELECT ts, unnest(list_filter([
                    'pleiades_total',
                    CASE WHEN event_type IS NOT NULL AND event_type <> ''
                         THEN 'pleiades_type_' || event_type END,
                    CASE WHEN user_id % 2 = 0 THEN 'pleiades_bot' END,
                    CASE WHEN k IS NOT NULL THEN
                      (CASE WHEN value > k THEN 'pleiades_value_inc'
                            ELSE 'pleiades_value_dec' END) END
                  ], x -> x IS NOT NULL)) AS counter
                  FROM (SELECT *, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
                ) GROUP BY day, counter
                """
            ).fetchall()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
