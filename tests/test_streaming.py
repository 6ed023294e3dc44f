"""Structured Streaming pipeline tests (memory sink + parquet foreachBatch)."""

import datetime

from pyspark.sql import functions as F

from pleiades_spark.streaming.pipeline import (
    dedup_events_stream,
    events_file_stream,
    run_counters_to_memory,
    start_counters_to_parquet,
)

EVT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def test_memory_sink_matches_batch(spark, sf_dir):
    from pleiades_spark import catalog
    from pleiades_spark.functions.counters import derive_counters

    mem = run_counters_to_memory(
        spark, f"{sf_dir}/events.parquet", query_name="counters_mem_test"
    )
    got_total = {
        r["d"]: r["events"]
        for r in mem.filter(F.col("counter") == "pleiades_total")
        .select(F.date_format("win.start", "yyyy-MM-dd").alias("d"), "events")
        .collect()
    }
    batch = (
        derive_counters(catalog.load(spark, sf_dir, "events"))
        .filter(F.col("counter") == "pleiades_total")
        .groupBy("day")
        .count()
    )
    want_total = {
        r["d"]: r["count"]
        for r in batch.select(
            F.date_format(F.timestamp_seconds(F.col("day") * 86400), "yyyy-MM-dd").alias("d"),
            "count",
        ).collect()
    }
    assert got_total == want_total


def test_foreachbatch_parquet_sink(spark, sf_dir, tmp_path):
    out = str(tmp_path / "counters")
    ckpt = str(tmp_path / "ckpt")
    q = start_counters_to_parquet(
        spark, events_file_stream(spark, f"{sf_dir}/events.parquet"), out, ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    counters = spark.read.parquet(out)
    assert set(counters.columns) == {"counter", "events", "growth", "day"}
    total = (
        counters.filter(F.col("counter") == "pleiades_total")
        .agg(F.sum("events").alias("n"))
        .collect()[0]["n"]
    )
    assert total == 1000  # sf0.001 events rows


def _rows(ids):
    return [(i, T0, i % 5, "click", 1.0, "{}") for i in ids]


def test_stream_dedup_drops_replayed_events(spark, tmp_path):
    """An at-least-once source replays events across micro-batches;
    dropDuplicatesWithinWatermark must emit each event_id exactly once."""
    base = tmp_path / "in"
    base.mkdir()
    spark.createDataFrame(_rows(range(10)), EVT_SCHEMA).coalesce(1).write.parquet(
        str(base / "f0")
    )
    # replay of 5..9 (duplicate ids, same payload) + fresh 10..14
    spark.createDataFrame(
        _rows(list(range(5, 10)) + list(range(10, 15))), EVT_SCHEMA
    ).coalesce(1).write.parquet(str(base / "f1"))

    stream = (
        spark.readStream.schema(EVT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(base / "f*"))
    )
    q = (
        dedup_events_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_mem")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got = [r.event_id for r in spark.table("dedup_mem").collect()]
    assert sorted(got) == list(range(15))  # every id exactly once


def test_stream_static_join_matches_batch(spark, tmp_path):
    """Stream-static join: enrich a stream with a dimension frame; the
    static side is re-broadcast per micro-batch (no state), so the
    result must equal the batch join exactly."""
    base = tmp_path / "in"
    base.mkdir()
    events = _rows(range(40))
    spark.createDataFrame(events[:20], EVT_SCHEMA).coalesce(1).write.parquet(
        str(base / "f0")
    )
    spark.createDataFrame(events[20:], EVT_SCHEMA).coalesce(1).write.parquet(
        str(base / "f1")
    )
    tiers = spark.createDataFrame(
        [(u, f"tier{u % 3}") for u in range(5)], "user_id long, tier string"
    )

    stream = (
        spark.readStream.schema(EVT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(base / "f*"))
    )
    agg = (
        stream.join(F.broadcast(tiers), "user_id")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tier_mem")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got = {r.tier: r.n for r in spark.table("tier_mem").collect()}
    batch = (
        spark.createDataFrame(events, EVT_SCHEMA)
        .join(tiers, "user_id")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert got == {r.tier: r.n for r in batch.collect()}


def test_stream_stream_left_outer_join(spark, sf_dir, tmp_path):
    """Left-outer interval join: matched pairs equal the batch inner
    join; unmatched left rows whose window the final watermark closed
    emit exactly one NULL row; no row gets both verdicts."""
    from pleiades_spark import catalog
    from pleiades_spark.plans.streaming_batch import (
        EVENTS_STAGE_SCHEMA,
        _stage_event_files,
    )
    from pleiades_spark.streaming.pipeline import stream_stream_user_join

    src = str(tmp_path / "ssloj")
    import os

    os.makedirs(src)
    _stage_event_files(spark, sf_dir, src, split=True)

    def _stream():
        return (
            spark.readStream.schema(EVENTS_STAGE_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    wm = "1 hour"
    out = stream_stream_user_join(
        _stream(), _stream(), watermark=wm, join_type="leftOuter"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssloj_gate")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got = spark.table("ssloj_gate").collect()

    ev = catalog.load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    a, b = ev.alias("a"), ev.alias("b")
    inner = {
        (r["evt_a"], r["evt_b"])
        for r in a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 hour")),
        )
        .select(F.col("a.event_id").alias("evt_a"), F.col("b.event_id").alias("evt_b"))
        .collect()
    }
    matched = {(r["evt_a"], r["evt_b"]) for r in got if r["evt_b"] is not None}
    assert matched == inner

    nulls = [r["evt_a"] for r in got if r["evt_b"] is None]
    assert len(nulls) == len(set(nulls)), "outer verdict emitted twice"
    matched_a = {p[0] for p in inner}
    assert not (set(nulls) & matched_a), "matched row also got a NULL verdict"

    # Expected NULL set: unmatched left rows whose join window closed
    # before the final watermark (max ts - wm); the trailing horizon's
    # verdicts legitimately stay pending.
    import datetime

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    wm_final = max_ts - datetime.timedelta(hours=1)
    expected_nulls = {
        r["event_id"]
        for r in ev.collect()
        if r["event_id"] not in matched_a
        and r["ts"] + datetime.timedelta(hours=1) < wm_final
    }
    assert expected_nulls <= set(nulls)
    # and nothing outside (unmatched ∪ pending) appeared as NULL
    unmatched_all = {r["event_id"] for r in ev.collect()} - matched_a
    assert set(nulls) <= unmatched_all


def test_streaming_session_window_matches_batch(spark, sf_dir, tmp_path):
    """Native session_window under a streaming watermark: sessions the
    final watermark closed must equal the batch session aggregation
    restricted to the same horizon (append mode = finalize-once)."""
    import os

    from pleiades_spark import catalog
    from pleiades_spark.plans.streaming_batch import (
        EVENTS_STAGE_SCHEMA,
        _stage_event_files,
    )

    src = str(tmp_path / "sessw")
    os.makedirs(src)
    _stage_event_files(spark, sf_dir, src, split=True)

    gap = "30 minutes"
    stream = (
        spark.readStream.schema(EVENTS_STAGE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    agg = (
        stream.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("s"),
            F.col("sw.end").alias("e"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessw_gate")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got = {
        (r["user_id"], r["s"], r["e"], r["n_events"])
        for r in spark.table("sessw_gate").collect()
    }

    import datetime

    ev = catalog.load(spark, sf_dir, "events")
    batch = (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("s"),
            F.col("sw.end").alias("e"),
            "n_events",
        )
        .collect()
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    wm_final = max_ts - datetime.timedelta(hours=1)
    want = {
        (r["user_id"], r["s"], r["e"], r["n_events"])
        for r in batch
        if r["e"] <= wm_final
    }
    # every watermark-closed batch session appears in the stream output,
    # and nothing in the stream output contradicts the batch sessions
    assert want <= got
    all_batch = {(r["user_id"], r["s"], r["e"], r["n_events"]) for r in batch}
    assert got <= all_batch


def test_events_file_stream_probe_survives_fresh_session(spark, sf_dir):
    """events_file_stream must set the nanos conf itself: on the INT64
    TIMESTAMP(NANOS) fixture vintage the schema probe throws
    PARQUET_TYPE_ILLEGAL when only catalog.load had set it earlier in
    the session. Unset it to simulate a session with no prior
    catalog.load, then require the probe + schema to come back."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = events_file_stream(spark, f"{sf_dir}/events.parquet")
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_events_file_stream_reads_directory_shaped_fixture(spark, sf_dir, tmp_path):
    """A Spark-written events table is a DIRECTORY named events.parquet
    (multi part-file) — the stream must read it as-is. Regression: the
    single-file glob path treated any *.parquet path as a file, so a
    directory fixture streamed ZERO rows silently (found via the sf1
    scaling bench, where streaming_counters returned an empty frame)."""
    from pleiades_spark import catalog
    from pleiades_spark.streaming.pipeline import run_counters_to_memory

    events = catalog.load(spark, sf_dir, "events")
    d = str(tmp_path / "events.parquet")
    events.repartition(3).write.mode("overwrite").parquet(d)
    mem = run_counters_to_memory(spark, d, query_name="dirshape_gate")
    n = mem.count()
    single = run_counters_to_memory(
        spark, f"{sf_dir}/events.parquet", query_name="dirshape_ref"
    ).count()
    assert n == single and n > 0


def test_streaming_lsh_dedup_finds_cross_batch_pairs(spark, tmp_path):
    """lsh_dedup_stream must find a near-dup pair whose two docs arrive
    in DIFFERENT micro-batches (the static index carries the other
    side), emit each pair exactly once despite multi-band collisions
    (stateful pair dedup), and match the batch minhash_lsh_pairs rows
    bit-for-bit on the same corpus."""
    from pleiades_spark.operators.dedup import minhash_lsh_pairs
    from pleiades_spark.streaming.pipeline import lsh_dedup_stream

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (2, "one two three four five six seven eight nine ten"),
        (3, "one two three four five six seven eight nine eleven"),
        (4, "completely different text with no overlap whatsoever at all"),
    ]
    schema = "doc_id long, text string"
    docs = spark.createDataFrame(rows, schema)
    base = tmp_path / "docs"
    base.mkdir()
    # split so both near-dup pairs straddle the batch boundary
    spark.createDataFrame(rows[0::2], schema).coalesce(1).write.parquet(
        str(base / "f0")
    )
    spark.createDataFrame(rows[1::2], schema).coalesce(1).write.parquet(
        str(base / "f1")
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(base / "f*"))
    )
    q = (
        lsh_dedup_stream(stream, docs, 0.6)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("lsh_stream_mem")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in spark.table("lsh_stream_mem").collect()
    }
    batch = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(docs, 0.6).collect()
    }
    assert got == batch
    assert (0, 1) in got and (2, 3) in got


def test_streaming_ab_welch_converges_to_batch(spark, sf_dir):
    """The update-mode moment stream must (a) accumulate state ACROSS
    micro-batches — some type emits more than one update row — and
    (b) converge to EXACTLY the batch readout."""
    from pleiades_spark.plans.analytics import q_ab_welch
    from pleiades_spark.plans.streaming_batch import q_streaming_ab_welch

    got = {r["event_type"]: r.asDict()
           for r in q_streaming_ab_welch(spark, sf_dir).collect()}
    want = {r["event_type"]: r.asDict()
            for r in q_ab_welch(spark, sf_dir).collect()}
    assert got == want
    # the raw update sink holds the per-batch emissions: with two staged
    # micro-batches every active type should have emitted twice
    mem = spark.table("sab_welch_gate")
    per_type = mem.groupBy("event_type").count().collect()
    assert max(r["count"] for r in per_type) >= 2


def test_stream_doc_reps_cross_batch(spark, tmp_path):
    """Round-13 streaming reps contract, cross-batch:
    (a) the stream-staged inbox + pre_staged finalize is BIT-IDENTICAL
        to the batch nightly (doc_dedup_reps_from_index on the raw
        slice) — staging in foreachBatch loses nothing;
    (b) the per-arrival probe assigns each new doc to a VERIFIED
        persisted bucket-rep (group members land on the old group min)
        and defers new-new merges — docs 777/778 are near-dups of each
        other only, arrive in DIFFERENT micro-batches, probe to
        themselves, and the finalize's CC merges them."""
    import os

    from pleiades_spark.operators.dedup import (
        doc_dedup_reps_from_index,
        write_reps_index,
    )
    from pleiades_spark.plans.streaming_batch import _stage_parts
    from pleiades_spark.streaming.pipeline import run_doc_reps_stream

    rows = []
    for g in range(4):
        base = " ".join(f"g{g}w{i}" for i in range(80))
        for c in range(8):
            text = f"{base} t{g}x{c}"
            rows.append((g * 100 + c, text))
    for i in range(40):
        rows.append((10_000 + i, " ".join(f"u{i}v{j}" for j in range(60))))
    nn = " ".join(f"nn{j}" for j in range(80))
    rows.append((777, nn + " a1"))
    rows.append((778, nn + " a2"))
    docs = spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows],
        "doc_id long, text string, n_chars long",
    )
    is_new = (F.col("doc_id") % 2 == 0) | (F.col("doc_id") == 777)
    old = docs.filter(~is_new)
    new_raw = docs.filter(is_new)

    idx = str(tmp_path / "idx")
    write_reps_index(old, idx, 0.6)

    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1 = odd ids (777 alone), batch 2 = even ids (778 among them)
    _stage_parts(
        [new_raw.filter(F.col("doc_id") % 2 == 1),
         new_raw.filter(F.col("doc_id") % 2 == 0)],
        src,
    )
    stream = (
        spark.readStream.schema(new_raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    inbox, assign = run_doc_reps_stream(
        spark, stream, idx, 0.6, work_dir=str(tmp_path / "work")
    )

    probe = {r.doc_id: r.rep_id
             for r in spark.read.parquet(assign).collect()}
    n_new = new_raw.count()
    assert len(probe) == n_new  # one provisional row per arriving doc
    # group members probe to the OLD group min (odd ids: g*100+1)
    for g in range(4):
        for c in range(0, 8, 2):
            assert probe[g * 100 + c] == g * 100 + 1
    # the cross-batch new-new pair probes to SELF (no persisted partner)
    assert probe[777] == 777 and probe[778] == 778

    final = {
        r.doc_id: r.rep_id
        for r in doc_dedup_reps_from_index(
            spark.read.parquet(inbox), idx, 0.6, pre_staged=True
        ).collect()
    }
    expected = {
        r.doc_id: r.rep_id
        for r in doc_dedup_reps_from_index(new_raw, idx, 0.6).collect()
    }
    assert final == expected  # stream-staged == batch nightly, bit-equal
    assert final[777] == final[778]  # deferred merge happened in finalize


def test_stream_emb_reps_cross_batch(spark, tmp_path):
    """Embedding twin of the streaming reps cross-batch test: probe
    assigns arriving vectors to verified persisted reps (geometry from
    index meta), inbox finalize is bit-identical to the batch nightly,
    and a new-new near-dup pair straddling the batch boundary merges
    only in the finalize."""
    import os

    from pleiades_spark.operators.dedup import (
        embedding_dedup_reps_from_index,
        write_emb_reps_index,
    )
    from pleiades_spark.plans.streaming_batch import _stage_parts
    from pleiades_spark.streaming.pipeline import run_emb_reps_stream

    rows = []
    # copies are SCALED versions of the base — direction-identical, so
    # SRP sign bits match exactly and cosine ≈ 1 (an additive
    # perturbation can flip a marginal plane bit and split a band)
    for g in range(4):
        base = [((g * 37 + j * 5) % 17) - 8.0 for j in range(64)]
        for c in range(8):
            rows.append((g * 100 + c, [x * (1 + 0.01 * c) for x in base]))
    for i in range(40):
        rows.append(
            (10_000 + i, [((i * 13 + j * 7) % 19) - 9.0 for j in range(64)])
        )
    # new-new pair, unlike anything old: 777 (odd batch), 778 (even batch)
    nn = [((j * 11) % 23) - 11.0 for j in range(64)]
    rows.append((777, [x * 1.001 for x in nn]))
    rows.append((778, [x * 0.999 for x in nn]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    is_new = (F.col("vec_id") % 2 == 0) | (F.col("vec_id") == 777)
    old = emb.filter(~is_new)
    new_raw = emb.filter(is_new)

    idx = str(tmp_path / "idx")
    write_emb_reps_index(old, idx, 0.9, rows_bits=8)

    src = str(tmp_path / "src")
    os.makedirs(src)
    _stage_parts(
        [new_raw.filter(F.col("vec_id") % 2 == 1),
         new_raw.filter(F.col("vec_id") % 2 == 0)],
        src,
    )
    stream = (
        spark.readStream.schema(new_raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    inbox, assign = run_emb_reps_stream(
        spark, stream, idx, 0.9, work_dir=str(tmp_path / "work")
    )

    probe = {r.vec_id: r.rep_id
             for r in spark.read.parquet(assign).collect()}
    assert len(probe) == new_raw.count()
    assert probe[777] == 777 and probe[778] == 778  # no persisted partner
    for g in range(4):  # group members land on the OLD group min
        for c in range(0, 8, 2):
            assert probe[g * 100 + c] == g * 100 + 1

    final = {
        r.vec_id: r.rep_id
        for r in embedding_dedup_reps_from_index(
            spark.read.parquet(inbox), idx, 0.9
        ).collect()
    }
    expected = {
        r.vec_id: r.rep_id
        for r in embedding_dedup_reps_from_index(new_raw, idx, 0.9).collect()
    }
    assert final == expected
    assert final[777] == final[778]  # deferred merge in the finalize


def test_stream_corpus_cross_batch(spark, tmp_path):
    """Round-13 continuous corpus ingest, cross-batch:
    (a) low-quality docs are rejected in-stream and never reach the
        inbox OR the shards;
    (b) near-dups of the INDEXED corpus are dropped from the shards at
        arrival (probe-verified against the persisted rep);
    (c) a new-new near-dup pair arriving in DIFFERENT micro-batches is
        kept twice (keep-first contract), and the finalize emits
        exactly the later doc as a tombstone pointing at the cluster
        rep;
    (d) shard rows carry the deterministic split_expr assignment."""
    import os

    from pleiades_spark.operators.corpus import split_expr
    from pleiades_spark.operators.dedup import write_reps_index
    from pleiades_spark.plans.streaming_batch import _stage_parts
    from pleiades_spark.streaming.pipeline import (
        run_corpus_stream,
        stream_corpus_finalize,
    )

    rows = []
    for g in range(2):
        base = " ".join(f"g{g}w{i}" for i in range(80))
        for c in range(8):
            rows.append((g * 100 + c, f"{base} t{g}x{c}"))
    for i in range(20):
        rows.append((10_000 + i, " ".join(f"u{i}v{j}" for j in range(60))))
    nn = " ".join(f"nn{j}" for j in range(80))
    rows.append((777, nn + " a1"))
    rows.append((778, nn + " a2"))
    rows.append((555, "the " * 79 + "the"))  # all-stopword: q ≈ 0.165
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    is_new = (
        (F.col("doc_id") % 2 == 0)
        | (F.col("doc_id") == 777)
        | (F.col("doc_id") == 555)
    )
    old = docs.filter(~is_new)
    new_raw = docs.filter(is_new)

    idx = str(tmp_path / "idx")
    write_reps_index(old, idx, 0.6)

    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1 = odd ids (777 alone), batch 2 = even ids (778, 555 among them)
    _stage_parts(
        [new_raw.filter(F.col("doc_id") % 2 == 1),
         new_raw.filter(F.col("doc_id") % 2 == 0)],
        src,
    )
    stream = (
        spark.readStream.schema(new_raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    inbox, assign, shards = run_corpus_stream(
        spark, stream, idx, 0.6, work_dir=str(tmp_path / "work")
    )

    # (a) the quality reject reached nothing; everyone else reached the inbox
    inbox_ids = {r.doc_id for r in spark.read.parquet(inbox).collect()}
    assert 555 not in inbox_ids
    assert inbox_ids == {r.doc_id for r in new_raw.collect()} - {555}

    shard_rows = (
        spark.read.schema(
            "doc_id long, lang string, source string, text string, q double"
        )
        .json(shards)
        .collect()
    )
    got = {r.doc_id: r for r in shard_rows}
    # (b) indexed-group members dropped, uniques + both new-new docs kept
    expected_keep = {10_000 + i for i in range(0, 20, 2)} | {777, 778}
    assert set(got) == expected_keep
    # (d) split matches the deterministic expression
    splits = {
        r.doc_id: r.split
        for r in new_raw.select(
            "doc_id", split_expr(F.col("doc_id")).alias("split")
        ).collect()
    }
    for doc_id, row in got.items():
        assert row.split == splits[doc_id]
        assert row.q >= 0.5 and row.text  # scrub is a no-op on clean text

    # (c) finalize tombstones exactly the later-arriving new-new doc
    from pleiades_spark.streaming.pipeline import apply_tombstones

    tomb_df = stream_corpus_finalize(spark, inbox, assign, idx, 0.6)
    tomb = {r.doc_id: r.rep_id for r in tomb_df.collect()}
    assert tomb == {778: 777}

    # (e) the served view: shards minus tombstones == docs whose final
    # rep is themselves
    shard_df = spark.read.schema(
        "doc_id long, lang string, source string, text string, q double"
    ).json(shards)
    final_ids = {r.doc_id for r in apply_tombstones(shard_df, tomb_df).collect()}
    assert final_ids == expected_keep - {778}


def test_stream_corpus_same_workdir_resumes(spark, tmp_path):
    """The corpus-stream work dir is a resumable unit: re-running the
    ingest over the same source with the same work dir must process
    ZERO new files (checkpoint offsets), leaving inbox/assign/shards
    byte-identical — the no-reprocessing contract the CLI docstring
    promises."""
    import os

    from pleiades_spark.operators.dedup import write_reps_index
    from pleiades_spark.plans.streaming_batch import _stage_parts
    from pleiades_spark.streaming.pipeline import run_corpus_stream

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"u{i}v{j}" for j in range(60)), "en", "s", 400)
            for i in range(12)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    idx = str(tmp_path / "idx")
    write_reps_index(docs.filter(F.col("doc_id") >= 8), idx, 0.6)
    new_raw = docs.filter(F.col("doc_id") < 8)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _stage_parts(
        [new_raw.filter(F.col("doc_id") < 4),
         new_raw.filter(F.col("doc_id") >= 4)],
        src,
    )

    def listing(root):
        out = {}
        for dirpath, _dirs, names in os.walk(root):
            for n in names:
                if n.startswith(("_", ".")) or "ckpt" in dirpath:
                    continue
                p = os.path.join(dirpath, n)
                out[os.path.relpath(p, root)] = os.path.getsize(p)
        return out

    work = str(tmp_path / "work")
    for run in range(2):
        stream = (
            spark.readStream.schema(new_raw.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        inbox, assign, shards = run_corpus_stream(
            spark, stream, idx, 0.6, work_dir=work
        )
        if run == 0:
            first = listing(work)
            assert spark.read.parquet(inbox).count() == 8
    assert listing(work) == first  # nothing re-processed or re-appended
    assert spark.read.parquet(assign).count() == 8


def test_stream_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is AT-LEAST-ONCE: a crash between a sink write and
    the checkpoint commit replays the whole micro-batch. Re-running the
    SAME epoch must leave inbox/assign/shards with exactly one copy of
    every row (epoch-dir overwrite, not blind append) — the failure mode
    the blind-append version duplicated."""
    from pleiades_spark.operators.dedup import write_reps_index
    from pleiades_spark.streaming.pipeline import (
        release_static_index,
        stream_corpus_batch,
        stream_doc_reps_batch,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"u{i}v{j}" for j in range(60)), "en", "s", 400)
            for i in range(10)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    idx = str(tmp_path / "idx")
    write_reps_index(docs.filter(F.col("doc_id") >= 6), idx, 0.6)
    batch = docs.filter(F.col("doc_id") < 6)

    work = tmp_path / "corpus"
    for _replay in range(2):  # second call = the replayed epoch
        stream_corpus_batch(
            batch, 0, idx, str(work / "inbox"), str(work / "assign"),
            str(work / "shards"), 0.6,
        )
    assert spark.read.parquet(str(work / "inbox")).count() == 6
    assert spark.read.parquet(str(work / "assign")).count() == 6
    shard_ids = [
        r.doc_id
        for r in spark.read.schema(
            "doc_id long, lang string, source string, text string, q double"
        ).json(str(work / "shards")).collect()
    ]
    assert sorted(shard_ids) == list(range(6))  # one copy each, no dups

    work2 = tmp_path / "reps"
    for _replay in range(2):
        stream_doc_reps_batch(
            batch, 3, idx, str(work2 / "inbox"), str(work2 / "assign"), 0.6
        )
    assert spark.read.parquet(str(work2 / "inbox")).count() == 6
    assigns = spark.read.parquet(str(work2 / "assign"))
    assert assigns.count() == 6  # one provisional row per doc, once
    assert assigns.select("doc_id").distinct().count() == 6
    release_static_index(idx)


def test_sweep_reaps_recycled_pid_sink_by_age(tmp_path, monkeypatch):
    """A sink dir whose embedded owner PID was recycled by an unrelated
    live process must still fall to the 7×max_age fallback; a fresh
    live-owner sink and a dead-owner sink behave as before."""
    import os
    import tempfile
    import time

    from pleiades_spark.plans.streaming_batch import _sweep_stale_tmp_dirs

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    live = os.getpid()  # stands in for a recycled PID: alive, unrelated
    old_live = tmp_path / f"pleiades_sink_a_p{live}_x"
    fresh_live = tmp_path / f"pleiades_sink_b_p{live}_y"
    dead = tmp_path / "pleiades_sink_c_p999999999_z"
    for d in (old_live, fresh_live, dead):
        d.mkdir()
    stale = time.time() - 8 * 86400
    os.utime(old_live, (stale, stale))

    _sweep_stale_tmp_dirs(max_age_s=86400.0)
    assert not old_live.exists()   # alive owner but a week stale -> reaped
    assert fresh_live.exists()     # alive owner, fresh -> kept
    assert not dead.exists()       # dead owner -> reaped immediately
