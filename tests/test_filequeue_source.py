"""Spark 4 Python DataSource connector for the 2-line file queue:
batch read/write, streaming poll, delete-after-commit."""

import glob
import os

from pyspark.sql import functions as F

from pleiades_spark.sources.filequeue import read_filequeue, write_filequeue
from pleiades_spark.sources.filequeue_source import FileQueueDataSource


def _register(spark):
    # registration is idempotent per session; re-register defensively
    spark.dataSource.register(FileQueueDataSource)


def test_batch_roundtrip_matches_legacy_reader(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "queue")
    df = spark.createDataFrame(
        [(str(i), f'{{"n": {i}}}') for i in range(37)], "id string, value string"
    ).repartition(4)
    df.write.format("pleiades_filequeue").mode("append").save(out)
    assert len(glob.glob(f"{out}/*-event-*.dat")) == 37

    back = spark.read.format("pleiades_filequeue").load(out)
    got = sorted((r.id, r.value) for r in back.collect())
    assert got == sorted((str(i), f'{{"n": {i}}}') for i in range(37))
    # the connector and the legacy wholetext reader agree exactly
    legacy = sorted((r.id, r.value) for r in read_filequeue(spark, out).collect())
    assert got == legacy


def test_batch_reader_partitions_the_file_list(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "queue")
    write_filequeue(
        spark.createDataFrame(
            [(str(i), "x") for i in range(20)], "id string, value string"
        ),
        out,
    )
    df = spark.read.format("pleiades_filequeue").option("numPartitions", "5").load(out)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 20


def test_stream_polls_and_deletes_after_commit(spark, tmp_path):
    _register(spark)
    src = str(tmp_path / "queue")
    os.makedirs(src)

    def publish(lo, hi):
        for i in range(lo, hi):
            with open(f"{src}/0-event-{i:04d}.dat", "w") as f:
                f.write(f"{i}\nbody-{i}\n")

    publish(0, 5)
    stream = (
        spark.readStream.format("pleiades_filequeue")
        .option("cleanSource", "delete")
        .load(src)
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("fq_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("fq_stream").count() == 5
        # a second wave of files is picked up by the running stream,
        # never re-emitting the first wave
        publish(5, 8)
        q.processAllAvailable()
        got = sorted(r.id for r in spark.table("fq_stream").collect())
        assert got == sorted(str(i) for i in range(8))
        # poll-then-delete: the engine calls commit() as later batches
        # progress, so by now the FIRST wave must be unlinked (the last
        # batch's files may linger until the next commit tick — same
        # at-least-once window the reference's delete-after-process has)
        remaining = {os.path.basename(f) for f in glob.glob(f"{src}/*.dat")}
        assert not {f"0-event-{i:04d}.dat" for i in range(5)} & remaining
    finally:
        q.stop()
        q.awaitTermination()


def test_stream_without_clean_keeps_files_and_tracks_offset(spark, tmp_path):
    _register(spark)
    src = str(tmp_path / "queue")
    os.makedirs(src)
    for i in range(4):
        with open(f"{src}/0-event-{i:04d}.dat", "w") as f:
            f.write(f"{i}\nbody\n")
    stream = spark.readStream.format("pleiades_filequeue").load(src)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("fq_keep")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("fq_keep").count() == 4
        assert len(glob.glob(f"{src}/*.dat")) == 4  # nothing deleted
        # no duplicate emission on an idle trigger
        q.processAllAvailable()
        assert spark.table("fq_keep").count() == 4
    finally:
        q.stop()
        q.awaitTermination()


def test_connector_feeds_counter_derivation(spark, tmp_path):
    """The connector output plugs straight into the recentchange
    aggregation path — same shape the Kafka source would deliver."""
    from pleiades_spark.functions.recentchange import aggregate_recentchange

    _register(spark)
    out = str(tmp_path / "queue")
    ev = '{"wiki": "enwiki", "type": "edit", "bot": false, "minor": false}'
    ident = '[{"topic": "t", "timestamp": 1596207527001}]'
    spark.createDataFrame([(ident, ev)], "id string, value string").coalesce(
        1
    ).write.format("pleiades_filequeue").mode("append").save(out)
    raw = spark.read.format("pleiades_filequeue").load(out)
    agg = aggregate_recentchange(raw)
    counters = {r.counter for r in agg.select("counter").distinct().collect()}
    assert "pleiades_total" in counters
    assert "pleiades_wiki_enwiki" in counters


def test_streaming_connector_drives_counter_aggregation(spark, tmp_path):
    """S8 end-to-end on the native connector: streaming file-queue →
    recentchange counter derivation → windowed aggregation equals the
    batch result over the same events (groupingSets is batch-only, so
    the streaming side runs the per-day grain)."""
    from pleiades_spark.functions.recentchange import derive_recentchange_counters

    _register(spark)
    src = str(tmp_path / "queue")
    os.makedirs(src)
    ev = '{{"wiki": "{w}", "type": "edit", "bot": {b}, "minor": false}}'
    ident = '[{{"topic": "t", "timestamp": {ts}}}]'
    for i in range(12):
        with open(f"{src}/0-event-{i:04d}.dat", "w") as f:
            f.write(
                ident.format(ts=1596207527001 + i * 86_400_000 // 4)
                + "\n"
                + ev.format(w="enwiki" if i % 2 else "dewiki",
                            b="true" if i % 3 == 0 else "false")
                + "\n"
            )
    stream = spark.readStream.format("pleiades_filequeue").load(src)
    agg = (
        derive_recentchange_counters(stream)
        .groupBy("day", "counter")
        .count()
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("fq_counters")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.day, r.counter): r["count"]
            for r in spark.table("fq_counters").collect()
        }
    finally:
        q.stop()
        q.awaitTermination()
    batch = spark.read.format("pleiades_filequeue").load(src)
    want = {
        (r.day, r.counter): r["count"]
        for r in derive_recentchange_counters(batch)
        .groupBy("day", "counter")
        .count()
        .collect()
    }
    assert got == want and len(got) > 4


def test_batch_reader_filter_pushdown(spark, tmp_path):
    """EqualTo/In/StringStartsWith on id push into the reader (bodies of
    rejected files are never read); other filters stay residual."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from pleiades_spark.sources.filequeue_source import FileQueueBatchReader

    qdir = str(tmp_path / "fq")
    import os

    os.makedirs(qdir)
    for i in range(6):
        with open(os.path.join(qdir, f"t-event-0-{i}.dat"), "w") as f:
            f.write(f"id{i}\n{{\"n\": {i}}}\n")

    r = FileQueueBatchReader({"path": qdir})
    residual = list(
        r.pushFilters(
            [In(("id",), ("id1", "id3")), GreaterThan(("value",), "x")]
        )
    )
    # the In on id was consumed; the GreaterThan on value is residual
    assert len(residual) == 1 and isinstance(residual[0], GreaterThan)
    got = sorted(
        row for p in r.partitions() for row in r.read(p)
    )
    assert got == [("id1", '{"n": 1}'), ("id3", '{"n": 3}')]

    # e2e through the registered format: result correctness under filter
    _register(spark)
    df = (
        spark.read.format("pleiades_filequeue")
        .load(qdir)
        .filter("id = 'id4'")
    )
    assert [(r["id"], r["value"]) for r in df.collect()] == [
        ("id4", '{"n": 4}')
    ]


def test_crlf_file_same_id_with_and_without_pushdown(spark, tmp_path):
    """A CRLF-written queue file must yield the same id whether Spark
    pushed an id predicate (readline path) or not (_parse path) —
    a trailing '\\r' on the unfiltered scan would make the same query's
    results depend on predicate pushdown."""
    _register(spark)
    out = tmp_path / "queue"
    out.mkdir()
    (out / "0-event-1.dat").write_bytes(b"ev-1\r\n{\"n\": 1}\r\n")
    df = spark.read.format("pleiades_filequeue").load(str(out))
    assert [(r.id, r.value) for r in df.collect()] == [("ev-1", '{"n": 1}')]
    pushed = df.filter(F.col("id") == "ev-1")
    assert [(r.id, r.value) for r in pushed.collect()] == [("ev-1", '{"n": 1}')]
