"""Streaming execution inside the correctness gate (SURVEY.md §7 M3).

``streaming_counters`` actually RUNS a Structured Streaming query — file
source → watermark → 1-day tumbling window aggregation → memory sink,
driven to completion with processAllAvailable — then returns the sink
contents as a batch DataFrame. The oracle recomputes the same result in
SQL, so the gate covers the streaming execution path end-to-end, not just
a batch re-statement.

``stateful_running_totals`` / ``stateful_stream_dedup`` do the same for
the applyInPandasWithState custom operators (streaming/stateful.py): the
fixture events are staged as TWO source files and streamed with
maxFilesPerTrigger=1, so state provably carries across micro-batches —
the oracle is the plain batch SQL the stateful run must converge to.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pleiades_spark import catalog
from pleiades_spark.plans import Query
from pleiades_spark.session import apply_runtime_confs
from pleiades_spark.streaming.pipeline import (
    run_counters_to_memory,
    stream_stream_user_join,
)
from pleiades_spark.streaming.stateful import (
    N_STATE_SHARDS,
    running_user_totals_sharded,
    streaming_dedup_sharded,
)

EVENTS_MICROS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

# Staged stateful/join gates never touch props (every consumer dropped
# it right after the scan) — so the staging writes exclude it: props is
# the widest column by far (JSON string), and both the one-file-per-
# micro-batch staging write AND the single-task batch scan are sized by
# bytes. Counters gates (_stage_day_split) DO parse props and keep it.
EVENTS_STAGE_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)


def _fixture_identity(src: str) -> str:
    """Content identity of a fixture dir: every file's (relpath, size,
    mtime) under it, recursively. The round-10 scheme keyed on the
    TOP-LEVEL dir mtime, which does not change when a table
    subdirectory's files are rewritten in place — a regenerated fixture
    could silently reuse stale staged streaming files (ADVICE r10).
    os.walk over a fixture is a few hundred stat calls — noise next to
    one Spark job."""
    parts = []
    for root, dirs, files in os.walk(src):
        dirs.sort()
        for f in sorted(files):
            p = os.path.join(root, f)
            try:
                st = os.stat(p)
                # mtime_ns, not int(mtime): a fixture regenerated within
                # the same second with identical sizes must not hash to
                # the same tag (ADVICE r11)
                parts.append(
                    f"{os.path.relpath(p, src)}|{st.st_size}|{st.st_mtime_ns}"
                )
            except OSError:
                continue
    return "\n".join(parts)


def _staged_src(sf_dir: str, key: str, stage_fn) -> str:
    """One staged streaming-source dir per (fixture identity, staging
    recipe) — shared ACROSS processes (round-10, ADVICE r9): staged
    files are a pure function of the fixture, so the dir lives at a
    deterministic path keyed by (abs fixture path, per-file
    sizes+mtimes, recipe). Re-runs — same process or not — reuse it
    instead of accumulating fresh mkdtemp dirs (the 65 GB /tmp failure
    mode CLAUDE.md records); a regenerated fixture changes the file
    stats and gets a fresh dir.

    Publication is ATOMIC (ADVICE r10): each run stages into its own
    ``<dir>.tmp<pid>`` and os.rename()s it into place — the final path
    either doesn't exist or is complete, so no reader can observe a
    half-written dir and no run ever rmtree()s a dir another process is
    reading. A lost rename race just discards the loser's tmp dir. The
    ``_STAGED_OK`` marker (written before the rename) survives as a
    belt-and-suspenders check and rejects legacy-scheme leftovers.
    Checkpoints and sink outputs stay per-run: a file source with a
    fresh checkpoint re-reads the shared files from scratch, so gate
    semantics are bit-identical; only the measurement overhead
    changes."""
    import hashlib

    _sweep_stale_tmp_dirs()
    src = os.path.abspath(sf_dir)
    tag = hashlib.md5(
        f"{src}|{_fixture_identity(src)}|{key}".encode()
    ).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"pleiades_stage_{key}_{tag}")
    marker = os.path.join(d, "_STAGED_OK")
    if os.path.isfile(marker):
        # refresh the marker so the published-dir sweep's age gate
        # means "unused for N days", not "staged N days ago" — a hot
        # cache reused across rounds must never be reaped mid-read
        try:
            os.utime(marker)
        except OSError:
            pass
        return d
    tmp = f"{d}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    # a killed mid-stage run must not leak its tmp dir (ADVICE r11 —
    # the same /tmp-growth failure mode this code exists to prevent);
    # cleanup is idempotent and a successful rename makes it a no-op
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    stage_fn(tmp)
    with open(os.path.join(tmp, "_STAGED_OK"), "w") as fh:
        fh.write("ok\n")
    try:
        os.rename(tmp, d)
    except OSError:
        # Another process published first (or a legacy marker-less dir
        # squats on the path). Prefer the published copy when complete;
        # otherwise fall back to this run's private tmp dir — never
        # delete a dir a concurrent reader may hold open (the atexit
        # hook reclaims it when THIS process, its only reader, exits).
        if os.path.isfile(marker):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            return tmp
    return d


def _sweep_stale_tmp_dirs(
    max_age_s: float = 86400.0, max_published_age_s: float = 7 * 86400.0
) -> None:
    """Reap stale staging residue (round 12, both leak classes):

    - ``pleiades_stage_*.tmp*`` siblings older than a day — runs killed
      before their atexit hook (SIGKILL, OOM). A live concurrent
      stager's tmp dir is minutes old; a day-old one has no reader.
    - PUBLISHED ``pleiades_stage_*`` dirs whose ``_STAGED_OK`` marker is
      older than a week — orphans left behind when the identity scheme
      or a recipe key changes retags every fixture (the mtime→mtime_ns
      fix did exactly that). The marker's mtime is refreshed on every
      cache hit, so the age gate means "unused for a week", keeping a
      hot cross-round cache safe from mid-read deletion.

    Sink dirs carry their owner PID in the name (``_p<pid>_``) since
    round 13 (ADVICE r12: the pure age gate could reap a >24h-old sink a
    live process still lazily reads): a sink whose owner is ALIVE is
    never touched regardless of age; one whose owner is dead is reaped
    immediately (its atexit hook never ran — SIGKILL/OOM). Legacy
    pid-less names keep the age gate."""
    import glob
    import re
    import time

    def _pid_alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return False
        except PermissionError:
            return True
        return True

    now = time.time()
    for p in glob.glob(os.path.join(tempfile.gettempdir(), "pleiades_stage_*.tmp*")):
        try:
            if now - os.stat(p).st_mtime > max_age_s:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            continue
    for p in glob.glob(os.path.join(tempfile.gettempdir(), "pleiades_sink_*")):
        m = re.search(r"_p(\d+)_", os.path.basename(p))
        try:
            if m is not None:
                # dead owner → reap now; alive owner → 7-day fallback.
                # The fallback covers a recycled PID held by an unrelated
                # long-lived process (which would otherwise keep a dead
                # session's sink alive forever) while still not touching
                # a legitimately long-running stream's day-old sink.
                if not _pid_alive(int(m.group(1))) or (
                    now - os.stat(p).st_mtime > 7 * max_age_s
                ):
                    shutil.rmtree(p, ignore_errors=True)
            elif now - os.stat(p).st_mtime > max_age_s:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            continue
    for p in glob.glob(
        os.path.join(tempfile.gettempdir(), "pleiades_stage_*")
    ):
        if ".tmp" in os.path.basename(p):
            continue
        marker = os.path.join(p, "_STAGED_OK")
        try:
            if (
                os.path.isfile(marker)
                and now - os.stat(marker).st_mtime > max_published_age_s
            ):
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            continue


def _stage_parts(parts, src: str) -> None:
    """Write each frame as exactly one parquet FILE (``NN.parquet``) in
    ``src`` — one file = one micro-batch under maxFilesPerTrigger=1.
    repartition(1), NOT coalesce(1): coalesce collapses the whole
    scan+filter into one task; repartition keeps them parallel and only
    the final write is single-task (3.3 s → 1.75 s per staging at sf1)."""
    for i, part in enumerate(parts):
        tmp = f"{src}/_stage{i}"
        part.repartition(1).write.mode("overwrite").parquet(tmp)
        pf = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.copyfile(f"{tmp}/{pf}", f"{src}/{i:02d}.parquet")
        shutil.rmtree(tmp)


def _stage_event_files(spark: SparkSession, sf_dir: str, out_dir: str, *, split: bool) -> None:
    """Write fixture events into ``out_dir`` as two parquet files.

    split=True  → disjoint halves (even/odd event_id): each key's state
                  accumulates across batches.
    split=False → the full table twice: batch 2 is 100 % re-delivery, the
                  dedup operator must emit nothing for it.
    """
    events = catalog.load(spark, sf_dir, "events").drop("props")
    halves = (
        [events.filter(F.col("event_id") % 2 == 0), events.filter(F.col("event_id") % 2 == 1)]
        if split
        else [events]  # re-delivery: write ONCE, copy the file per batch
    )
    _stage_parts(halves, out_dir)
    if not split:
        shutil.copyfile(f"{out_dir}/00.parquet", f"{out_dir}/01.parquet")


def _stage_day_split(spark: SparkSession, sf_dir: str, src: str) -> None:
    """Stage fixture events as two files split at the LAST day (all-but-
    last, then last): batch 2 carries only the newest day, so it can
    never fall behind the watermark batch 1 establishes — the ordering
    that makes multi-batch update/append gates watermark-safe however
    long the fixture's time span is."""
    events = catalog.load(spark, sf_dir, "events")
    max_day = events.agg(
        F.max(F.date_trunc("day", F.col("ts"))).alias("m")
    ).collect()[0]["m"]
    early = events.filter(F.date_trunc("day", F.col("ts")) < F.lit(max_day))
    late = events.filter(F.date_trunc("day", F.col("ts")) >= F.lit(max_day))
    _stage_parts([early, late], src)


@contextmanager
def _rocksdb_state(spark: SparkSession, est_state_bytes: float | None = None):
    """Scope the streaming state-store provider choice to one run.

    ``PLEIADES_STATE_STORE=rocksdb|hdfs`` selects explicitly; results
    are storage-identical either way (gates re-verified green on both).
    When the env var is UNSET and the caller passes an
    ``est_state_bytes`` estimate, the provider auto-selects from the
    measured volume-vs-heap crossover
    (streaming/pipeline.choose_state_store — round 13: streaming_sessions
    at sf100 previously FAILED on the default HDFS provider unless the
    operator knew to export the knob). The conf is read at query START,
    so set-before/restore-after bounds the effect to the gate run.

    MEASURED (round 6, local[32], stream_stream_join min-of-2): HDFS
    10.6 s / 13.1 s / 144 s at sf0.01/sf1/sf10 vs RocksDB 10.8 / 17.5 /
    380 — the HDFS provider's in-memory versioned maps win at EVERY
    scale that fits the heap; RocksDB's per-batch instance churn (32
    partitions × 4 join state stores × open/commit/close) dominates
    before its off-heap advantage can matter. Default is therefore
    ``hdfs``; flip to rocksdb only for production long-running streams
    whose accumulated state exceeds executor memory — exactly the
    regime a 2-file availableNow gate can never reach.
    """
    choice = os.environ.get("PLEIADES_STATE_STORE")
    if choice is None:
        if est_state_bytes is not None:
            from pleiades_spark.streaming.pipeline import choose_state_store

            choice = choose_state_store(spark, est_state_bytes)
        else:
            choice = "hdfs"
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    if choice == "rocksdb":
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    try:
        yield
    finally:
        if prev is None:
            try:
                spark.conf.unset(key)
            except Exception:
                pass
        else:
            spark.conf.set(key, prev)


def _run_stateful(
    spark: SparkSession,
    src_dir: str,
    op,
    output_mode: str,
    query_name: str,
    sink: str = "memory",
) -> DataFrame:
    """Drive ``op`` over the staged files to completion, return the sink.

    ``sink="parquet"`` (append mode only — Spark's file sink contract)
    keeps the output EXECUTOR-side and reads it back as a batch frame:
    the memory sink materializes every output row on the driver, which
    for the dedup/join gates means millions of rows of pure driver
    transfer at sf1 (measured: the dominant cost, not the stateful
    work). Update-mode gates (running totals: one row per user per
    batch) stay on the memory sink — the file sink cannot express
    update semantics, and the foreachBatch-append workaround was
    MEASURED AND REJECTED (round 8, sf10): 40.1 s memory-sink vs
    79.2 s foreachBatch — here the cost is the applyInPandasWithState
    work over ~1M user groups, not driver transfer of the 3-column
    update rows, and foreachBatch adds a per-batch plan + commit.
    """
    stream = (
        spark.readStream.schema(EVENTS_STAGE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    with _rocksdb_state(spark):
        writer = op(stream).writeStream.outputMode(output_mode)
        if sink == "parquet":
            # sweepable prefix + atexit cleanup (round 12): these sink
            # dirs are 3+ GB each at sf100 and accumulated one per rep
            # forever (110 leaked dirs / 6.2 GB found when the sf100
            # probe hit ENOSPC); the frame returned below lazily READS
            # the dir, so reclamation is deferred to process exit and a
            # day-old sweep catches kills
            out = tempfile.mkdtemp(
                prefix=f"pleiades_sink_{query_name}_p{os.getpid()}_"
            )
            atexit.register(shutil.rmtree, out, ignore_errors=True)
            q = (
                writer.format("parquet")
                .option("path", out)
                .option("checkpointLocation", f"{out}/_checkpoint")
                .start()
            )
        else:
            q = writer.format("memory").queryName(query_name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    if sink == "parquet":
        return spark.read.parquet(out)
    return spark.table(query_name)


def q_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user all-time running (count, sum) via explicit GroupState,
    driven across two micro-batches; the LAST update per user must equal
    the batch aggregate. Since round 11 the gate runs the SHARDED-state
    operator (streaming/stateful.py running_user_totals_sharded): same
    per-user rows and values, per-bucket dispatch — at sf100's 1.5M
    users the per-GROUP applyInPandasWithState overhead was the cell's
    wall (measured 291.3 s per-user vs 35.8 s sharded, staging hot,
    identical 3M output rows)."""
    apply_runtime_confs(spark)
    src = _staged_src(sf_dir, "ev_split",
                      lambda d: _stage_event_files(spark, sf_dir, d, split=True))
    mem = _run_stateful(
        spark, src, running_user_totals_sharded, "update",
        "stateful_totals_gate",
    )
    # update mode emits one row per (user, batch-with-activity); the final
    # state is the row with the largest n_events (strictly increasing).
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        mem.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", F.round("total_value", 4).alias("total_value"))
    )


ORACLE_STATEFUL_RUNNING_TOTALS = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS total_value
FROM events GROUP BY user_id
"""


def q_stateful_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch exactly-once repair: the full events table re-delivered
    as a second micro-batch must contribute zero output rows. Runs the
    SHARDED-state operator since round 11 (streaming/stateful.py
    streaming_dedup_sharded — same rows; 388.5 → 204.8 s at sf100,
    staging hot; the residual is the 200M-row Arrow round-trip plus the
    parquet sink, not group dispatch)."""
    apply_runtime_confs(spark)
    src = _staged_src(sf_dir, "ev_redeliver",
                      lambda d: _stage_event_files(spark, sf_dir, d, split=False))
    mem = _run_stateful(
        spark, src, streaming_dedup_sharded, "append", "stateful_dedup_gate",
        sink="parquet",  # ~3M output rows at sf1 — keep them off the driver
    )
    return mem.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "user_id",
        "event_type",
        "value",
    )


ORACLE_STATEFUL_STREAM_DEDUP = """
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       user_id, event_type, value
FROM events
"""

DEDUP_HORIZON_DAYS = 7


def q_stateful_dedup_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HORIZON-BOUNDED production dedup (round 12): same re-delivered
    second batch as stateful_stream_dedup, but state stores (event_id,
    day-bucket) and prunes below each bucket's max_day − 7 on every
    update (streaming/stateful.streaming_dedup_sharded(horizon_days=7)).
    Re-deliveries within the horizon are dropped; older ones PASS
    THROUGH — their originals were pruned, the
    dropDuplicatesWithinWatermark lateness contract. The floor is
    per-SHARD (a bucket's max day is the max over ITS users' events),
    which the oracle replays with a user_id % N_STATE_SHARDS group max.
    Deterministic despite Arrow chunking: batch 1 starts from the
    persisted max_day, so every chunk sees the same floor."""
    apply_runtime_confs(spark)
    from pleiades_spark.streaming.stateful import streaming_dedup_sharded

    src = _staged_src(sf_dir, "ev_redeliver",
                      lambda d: _stage_event_files(spark, sf_dir, d, split=False))
    mem = _run_stateful(
        spark,
        src,
        lambda s: streaming_dedup_sharded(
            s, horizon_days=DEDUP_HORIZON_DAYS
        ),
        "append",
        "stateful_dedup_horizon_gate",
        sink="parquet",
    )
    return mem.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "user_id",
        "event_type",
        "value",
    )


ORACLE_STATEFUL_DEDUP_HORIZON = f"""
WITH e AS (
  SELECT event_id, ts, user_id, event_type, value,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         user_id % {N_STATE_SHARDS} AS shard
  FROM events
), m AS (
  SELECT shard, max(day) AS max_day FROM e GROUP BY shard
)
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       user_id, event_type, value
FROM events
UNION ALL
SELECT e.event_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       e.user_id, e.event_type, e.value
FROM e JOIN m USING (shard)
WHERE e.day < m.max_day - {DEDUP_HORIZON_DAYS}
"""


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval self-join driven to completion: each event
    paired with the same user's events in the following hour. Both sides
    are real streams; state is bounded by watermark + time range."""
    apply_runtime_confs(spark)
    src = _staged_src(sf_dir, "ev_split",
                      lambda d: _stage_event_files(spark, sf_dir, d, split=True))

    def _op(stream: DataFrame) -> DataFrame:
        other = (
            stream.sparkSession.readStream.schema(EVENTS_STAGE_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return stream_stream_user_join(stream, other)

    return _run_stateful(
        spark, src, _op, "append", "ssjoin_gate",
        sink="parquet",  # join output is event×event scale — executor-side
    )


ORACLE_STREAM_STREAM_JOIN = """
SELECT a.event_id AS evt_a, b.event_id AS evt_b, a.user_id AS user_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
"""


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


def q_streaming_counters_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND output mode: only windows the watermark has closed emit —
    the finalize-once semantics downstream consumers (e.g. a Kafka sink)
    need, vs complete/update's reemission. Events are staged as two
    batches (all-but-last day, then the last day) so the watermark
    provably advances between micro-batches; the final watermark is
    max(ts) − 7d, and exactly the day windows ending at or before it
    appear in the sink. The oracle computes that same closed-window set
    from the batch side."""
    from pleiades_spark.streaming.pipeline import counters_stream

    apply_runtime_confs(spark)
    src = _staged_src(sf_dir, "day_full",
                      lambda d: _stage_day_split(spark, sf_dir, d))

    # repartition BEFORE the counter derivation: a staged file-source
    # micro-batch is ONE file = ONE task (CLAUDE.md invariant), so the
    # JSON parse + counter explode + partial agg would run
    # single-threaded per batch — measured 54.3 → 27.4 s at sf10 on the
    # reconcile twin; the aggregation is commutative, so round-robin
    # redistribution cannot change the result.
    stream = (
        spark.readStream.schema(EVENTS_MICROS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    )
    q = (
        counters_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("counters_append_gate")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table("counters_append_gate").select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day_date"),
        "counter",
        "events",
        "growth",
    )


ORACLE_STREAMING_COUNTERS_APPEND = """
WITH wm AS (SELECT max(ts) - INTERVAL 7 DAY AS w FROM events)
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
), wm
WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= w
GROUP BY day_date, counter
"""


def q_counters_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing exactly-once audit (round-8 verdict #8): drive the
    PRODUCTION counters sink — two staged micro-batches through the
    idempotent foreachBatch (day, counter) dynamic-partition merge
    (streaming/pipeline.drain_counters_to_parquet, the S10 path) — then
    reconcile the materialized table against the batch recompute over
    the archive (the backfill_counters aggregation) with
    reconcile_counters. Output is the per-day alarm grain; the oracle
    hard-codes n_drift = 0, so ANY divergence between the streaming
    sink and the batch truth (dropped update, non-idempotent replay,
    partial partition overwrite) fails the hash gate.

    The two-batch staging matters: batch 2 UPDATES day windows batch 1
    already wrote, so the dynamic-partition overwrite's
    replace-at-update-grain contract is what's being audited, not a
    single-shot write."""
    from pleiades_spark.functions.counters import derive_counters
    from pleiades_spark.streaming.pipeline import (
        drain_counters_to_parquet,
        reconcile_counters,
    )

    apply_runtime_confs(spark)
    src = _staged_src(sf_dir, "day_full",
                      lambda d: _stage_day_split(spark, sf_dir, d))
    out = tempfile.mkdtemp(prefix=f"pleiades_sink_ctr_reconcile_p{os.getpid()}_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    # repartition before the parse/explode — single-file micro-batch
    # would otherwise run it single-threaded (54.3 → 27.4 s at sf10;
    # see q_streaming_counters_append's note)
    stream = (
        spark.readStream.schema(EVENTS_MICROS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    )
    drain_counters_to_parquet(
        spark, stream, f"{out}/counters", f"{out}/ckpt"
    )
    streamed = spark.read.parquet(f"{out}/counters").select(
        F.col("day").cast("long").alias("day"),
        F.col("counter").cast("string").alias("counter"),
        "events",
        "growth",
    )
    events = catalog.load(spark, sf_dir, "events")
    batch = derive_counters(events).groupBy("day", "counter").agg(
        F.count(F.lit(1)).alias("events"),
        F.round(F.sum("lendiff"), 4).alias("growth"),
    )
    return reconcile_counters(streamed, batch)


ORACLE_COUNTERS_RECONCILE = """
WITH der AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         unnest(list_filter([
            'pleiades_total',
            CASE WHEN event_type IS NOT NULL AND event_type <> ''
                 THEN 'pleiades_type_' || event_type END,
            CASE WHEN user_id % 2 = 0 THEN 'pleiades_bot' END,
            CASE WHEN k IS NOT NULL THEN
              (CASE WHEN value > k THEN 'pleiades_value_inc'
                    ELSE 'pleiades_value_dec' END) END
         ], x -> x IS NOT NULL)) AS counter
  FROM (SELECT *, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
), agg AS (
  SELECT day, counter, count(*) AS e FROM der GROUP BY day, counter
)
SELECT day, CAST(count(*) AS BIGINT) AS n_counters,
       CAST(sum(e) AS BIGINT) AS events_total,
       CAST(0 AS BIGINT) AS n_drift
FROM agg GROUP BY day
"""


def q_streaming_dedup_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILT-IN exactly-once repair in the gate: the full events table
    delivered TWICE (two micro-batches) through
    dropDuplicatesWithinWatermark — the output must be each event
    exactly once (streaming/pipeline.dedup_events_stream; the custom
    applyInPandasWithState twin is stateful_stream_dedup).

    Round-9 sf100 fix: the output is EVERY event (100 M rows at sf100),
    so the memory sink's driver materialization is the thing that OOMs
    — exactly the _run_stateful parquet-sink rationale; routing through
    it keeps the rows executor-side AND puts the gate under the
    PLEIADES_STATE_STORE knob like its stateful twins."""
    from pleiades_spark.streaming.pipeline import dedup_events_stream

    apply_runtime_confs(spark)
    src = _staged_src(sf_dir, "ev_redeliver",
                      lambda d: _stage_event_files(spark, sf_dir, d, split=False))
    out = _run_stateful(
        spark, src, dedup_events_stream, "append", "builtin_dedup_gate",
        sink="parquet",
    )
    return out.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "user_id",
        "event_type",
        "value",
    )


ORACLE_STREAMING_DEDUP_BUILTIN = """
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       user_id, event_type, value
FROM events
"""


def q_streaming_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful streaming operators (Spark 4 multi-stateful
    support): dropDuplicatesWithinWatermark on (user_id, day) feeding a
    windowed count — exact distinct-users-per-day (DAU) computed
    incrementally, each user counted once per day no matter how often
    they appear. Append mode: exactly the watermark-closed day windows
    emit (events staged as two micro-batches so the watermark provably
    advances); the oracle computes the same closed-window distinct
    count."""
    apply_runtime_confs(spark)

    def _stage_dau(d: str) -> None:
        events = catalog.load(spark, sf_dir, "events")
        max_day = events.agg(
            F.max(F.date_trunc("day", F.col("ts"))).alias("m")
        ).collect()[0]["m"]
        # stage only the two columns the DAU op reads (see
        # EVENTS_STAGE_SCHEMA rationale — staging write + one-task
        # micro-batch scan are byte-bound)
        slim = events.select("ts", "user_id")
        early = slim.filter(F.date_trunc("day", F.col("ts")) < F.lit(max_day))
        late = slim.filter(F.date_trunc("day", F.col("ts")) >= F.lit(max_day))
        _stage_parts([early, late], d)

    src = _staged_src(sf_dir, "day_ts_user", _stage_dau)

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "7 days")
        .withColumn("day", F.date_trunc("day", F.col("ts")))
    )
    deduped = stream.dropDuplicatesWithinWatermark(["user_id", "day"])
    agg = deduped.groupBy(F.window("ts", "1 day").alias("win")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    with _rocksdb_state(spark):
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("dau_gate")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    return spark.table("dau_gate").select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day_date"),
        "dau",
    )


ORACLE_STREAMING_DAU = """
WITH wm AS (SELECT max(ts) - INTERVAL 7 DAY AS w FROM events)
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_date,
       count(DISTINCT user_id) AS dau
FROM events, wm
WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= w
GROUP BY day_date
"""


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGING event-time windows under streaming: session_window +
    watermark in append mode — the one stateful-window semantic the other
    streaming gates don't touch (sessions have no fixed boundaries; the
    state store must merge windows as late events bridge gaps, and a
    session may only finalize once the watermark passes its gap-extended
    end). Events staged as two time-ordered micro-batches so the
    watermark provably advances mid-stream; only watermark-closed
    sessions emit, and the oracle replays exactly those via the batch
    gaps-and-islands numbering + the same end <= max(ts) - 7d cutoff."""
    apply_runtime_confs(spark)

    def _stage_sess(d: str) -> None:
        events = catalog.load(spark, sf_dir, "events")
        max_day = events.agg(
            F.max(F.date_trunc("day", F.col("ts"))).alias("m")
        ).collect()[0]["m"]
        # stage only the three columns the session op reads — staging
        # write and the one-task micro-batch scan are both sized by bytes
        slim = events.select("ts", "user_id", "value")
        early = slim.filter(F.date_trunc("day", F.col("ts")) < F.lit(max_day))
        late = slim.filter(F.date_trunc("day", F.col("ts")) >= F.lit(max_day))
        _stage_parts([early, late], d)

    src = _staged_src(sf_dir, "day_ts_user_value", _stage_sess)

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "7 days")
    )
    sess = stream.groupBy(
        F.col("user_id"),
        F.session_window(F.col("ts"), "30 minutes").alias("sw"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )
    # parquet sink, NOT memory (round-9 sf100 fix): session count scales
    # with events (~0.7/event), so the memory sink's driver
    # materialization is tens of millions of rows at sf100 — the same
    # OOM class _run_stateful's parquet-sink rationale documents
    out_dir = tempfile.mkdtemp(
        prefix=f"pleiades_sink_sessions_p{os.getpid()}_"
    )
    atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    # auto state-store selection from estimated session-state volume
    # (~0.7 sessions/event measured on the fixture; the staged count is
    # one metadata-cheap job) — at sf100 this flips to RocksDB, which
    # previously required the operator to know the env knob or fail
    from pleiades_spark.streaming.pipeline import SESSION_STATE_ROW_BYTES

    n_events = spark.read.parquet(src).count()
    est_state_bytes = 0.7 * n_events * SESSION_STATE_ROW_BYTES
    with _rocksdb_state(spark, est_state_bytes=est_state_bytes):
        q = (
            sess.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", f"{out_dir}/_checkpoint")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    return spark.read.parquet(out_dir).select(
        "user_id",
        F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        "session_value",
    )


ORACLE_STREAMING_SESSIONS = """
WITH wm AS (SELECT max(ts) - INTERVAL 7 DAY AS w FROM events),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                  OR epoch(ts) - epoch(prev_ts) >= 1800
             THEN 1 ELSE 0 END AS new_session
  FROM (SELECT *, lag(ts, 1) OVER ww AS prev_ts FROM events
        WINDOW ww AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id
            ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), sessions AS (
  SELECT user_id,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         strftime(max(ts) + INTERVAL 30 MINUTE,
                  '%Y-%m-%d %H:%M:%S') AS session_end,
         count(*) AS n_events, round(sum(value), 4) AS session_value,
         max(ts) + INTERVAL 30 MINUTE AS end_ts
  FROM numbered GROUP BY user_id, session_id
)
SELECT user_id, session_start, session_end, n_events, session_value
FROM sessions, wm WHERE end_ts <= w
"""


def q_streaming_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dedup vs the static LSH band index
    (streaming/pipeline.lsh_dedup_stream): the corpus arrives as two
    micro-batches (even/odd doc_id halves — pairs deliberately straddle
    the batch boundary) and must emit EXACTLY the batch
    minhash_lsh_pairs rows, which ORACLE_DEDUP_MINHASH hash-checks."""
    from pleiades_spark.plans.llm import JACCARD_THRESHOLD
    from pleiades_spark.streaming.pipeline import lsh_dedup_stream

    apply_runtime_confs(spark)
    docs = catalog.load(spark, sf_dir, "documents")
    src = _staged_src(
        sf_dir,
        "docs_split",
        lambda d: _stage_parts(
            [docs.filter(F.col("doc_id") % 2 == 0),
             docs.filter(F.col("doc_id") % 2 == 1)],
            d,
        ),
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        lsh_dedup_stream(stream, docs, JACCARD_THRESHOLD)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("lsh_dedup_gate")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table("lsh_dedup_gate").select("doc_a", "doc_b", "jaccard")


def _oracle_streaming_lsh_dedup() -> str:
    from pleiades_spark.plans.llm import ORACLE_DEDUP_MINHASH

    return ORACLE_DEDUP_MINHASH


def _doc_reps_stream_setup(spark: SparkSession, sf_dir: str):
    """Shared setup for the streaming-reps gates (round 13): the
    persisted star index bootstrapped over the OLD slice (the SAME
    cached artifact doc_dedup_reps_persisted uses — one bootstrap
    serves all three gates) and the NEW slice staged as two micro-batch
    files split even/odd by doc_id, so near-dup partners deliberately
    straddle the batch boundary."""
    from pleiades_spark.plans.llm import INCR_PCT, _incr_docs, staged_doc_reps_index

    apply_runtime_confs(spark)
    idx = staged_doc_reps_index(spark, sf_dir)
    new = _incr_docs(spark, sf_dir).filter(F.col("is_new")).drop("is_new")
    src = _staged_src(
        sf_dir,
        # the key carries INCR_PCT: retuning the increment slice must
        # restage, not silently replay the old slice (the same stale-
        # artifact class the r12 index-key fix closed)
        f"docs_new_split_p{INCR_PCT}",
        lambda d: _stage_parts(
            [new.filter(F.col("doc_id") % 2 == 0),
             new.filter(F.col("doc_id") % 2 == 1)],
            d,
        ),
    )
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    return idx, stream


def q_streaming_doc_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming reps contract (round 13, closing the round-12
    verdict's top item): arriving docs are STAGED INSIDE THE STREAM
    (foreachBatch — shingle/minhash/hset computed once per doc, landed
    in the inbox), then the nightly finalize consumes the inbox with
    ``pre_staged=True`` and runs the O(increment) persisted-index
    protocol. Because staging is a pure function of the text, the final
    (doc_id, rep_id) output is BIT-IDENTICAL to
    doc_dedup_reps_from_index on the raw slice — this gate shares
    ORACLE_DOC_DEDUP_REPS_INCR with the batch nightly, and what it adds
    is end-to-end coverage of the streaming ingest path: two real
    micro-batches, cross-batch inbox accumulation, per-arrival probe
    output exercised by the twin probe gate."""
    from pleiades_spark.operators.dedup import doc_dedup_reps_from_index
    from pleiades_spark.plans.llm import JACCARD_THRESHOLD
    from pleiades_spark.streaming.pipeline import run_doc_reps_stream

    idx, stream = _doc_reps_stream_setup(spark, sf_dir)
    inbox, _assign = run_doc_reps_stream(spark, stream, idx, JACCARD_THRESHOLD)
    return doc_dedup_reps_from_index(
        spark.read.parquet(inbox), idx, JACCARD_THRESHOLD, pre_staged=True
    )


def _oracle_streaming_doc_reps() -> str:
    from pleiades_spark.plans.llm import ORACLE_DOC_DEDUP_REPS_INCR

    return ORACLE_DOC_DEDUP_REPS_INCR


def q_streaming_doc_reps_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PER-ARRIVAL serving contract of the streaming reps pipeline:
    one provisional (doc_id, rep_id) per streamed doc, emitted by the
    stream-static probe of the persisted band_index + rep_hsets
    (streaming/pipeline.stream_doc_reps_batch steps 3-5). Assignment =
    min VERIFIED persisted bucket-rep, else self — a pure per-doc
    function of (text, static index), so it is independent of
    micro-batch boundaries and the oracle replays it exactly. New-new
    merges are deferred to the nightly finalize (the streaming_doc_reps
    gate); this grain is what an online ingest consumer sees between
    nightlies."""
    from pleiades_spark.plans.llm import JACCARD_THRESHOLD
    from pleiades_spark.streaming.pipeline import run_doc_reps_stream

    idx, stream = _doc_reps_stream_setup(spark, sf_dir)
    _inbox, assign = run_doc_reps_stream(spark, stream, idx, JACCARD_THRESHOLD)
    return spark.read.parquet(assign).select("doc_id", "rep_id")


def _oracle_streaming_doc_reps_probe() -> str:
    from pleiades_spark.functions.hashing import LSH_ROWS, h32_sql
    from pleiades_spark.functions.text import word_shingles_sql
    from pleiades_spark.plans.llm import (
        _BANDS_RANGE_SQL,
        _SIG_SQL,
        INCR_PCT,
        JACCARD_THRESHOLD,
    )

    return f"""
WITH sh AS (
  SELECT doc_id,
         {h32_sql("concat('incr:', CAST(doc_id AS VARCHAR))")} % 100
           < {INCR_PCT} AS is_new,
         {word_shingles_sql('text')} AS sh
  FROM documents
), hashed AS (
  SELECT doc_id, is_new, list_transform(sh, s -> {h32_sql('s')}) AS hs FROM sh
), sig AS (
  SELECT doc_id, is_new, {_SIG_SQL} AS sig,
         list_distinct(list_transform(hs, h -> CAST(h - 2147483648 AS INTEGER)))
           AS hset
  FROM hashed
), bands AS (
  SELECT doc_id, is_new, band_idx,
         array_to_string(sig[band_idx*{LSH_ROWS}+1 : band_idx*{LSH_ROWS}+{LSH_ROWS}], '-') AS band_key
  FROM sig, {_BANDS_RANGE_SQL}
), oreps AS (
  SELECT band_idx, band_key, min(doc_id) AS orep
  FROM bands WHERE NOT is_new GROUP BY band_idx, band_key
), cand AS (
  SELECT DISTINCT b.doc_id, o.orep
  FROM bands b JOIN oreps o
    ON b.band_idx = o.band_idx AND b.band_key = o.band_key
  WHERE b.is_new
), ver AS (
  SELECT doc_id, orep FROM (
    SELECT c.doc_id, c.orep,
           round(len(list_intersect(a.hset, b.hset)) * 1.0
                 / (len(a.hset) + len(b.hset)
                    - len(list_intersect(a.hset, b.hset))), 6) AS jaccard
    FROM cand c JOIN sig a ON a.doc_id = c.doc_id
                JOIN sig b ON b.doc_id = c.orep
  ) WHERE jaccard >= {JACCARD_THRESHOLD}
)
SELECT s.doc_id, CAST(coalesce(min(v.orep), s.doc_id) AS BIGINT) AS rep_id
FROM sig s LEFT JOIN ver v ON v.doc_id = s.doc_id
WHERE s.is_new GROUP BY s.doc_id
"""


def _emb_reps_stream_setup(spark: SparkSession, sf_dir: str):
    """Embedding twin of _doc_reps_stream_setup: the persisted SRP index
    over the old slice (shared artifact with
    dedup_embedding_reps_persisted) + the new slice staged as two
    even/odd micro-batch files."""
    from pleiades_spark.plans.llm import INCR_PCT, _incr_emb, staged_emb_reps_index

    apply_runtime_confs(spark)
    idx = staged_emb_reps_index(spark, sf_dir)
    new = _incr_emb(spark, sf_dir).filter(F.col("is_new")).drop("is_new")
    src = _staged_src(
        sf_dir,
        f"emb_new_split_p{INCR_PCT}",
        lambda d: _stage_parts(
            [new.filter(F.col("vec_id") % 2 == 0),
             new.filter(F.col("vec_id") % 2 == 1)],
            d,
        ),
    )
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    return idx, stream


def q_streaming_emb_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding twin of streaming_doc_reps: vectors arrive as two real
    micro-batches, are probed/assigned per arrival, and land in an inbox
    the nightly embedding_dedup_reps_from_index consumes DIRECTLY
    (vectors are their own staged form). Final output is bit-identical
    to the batch nightly, so this gate shares
    ORACLE_DEDUP_EMBEDDING_REPS_INCR — what it adds is the streaming
    ingest path coverage for the embedding modality."""
    from pleiades_spark.operators.dedup import embedding_dedup_reps_from_index
    from pleiades_spark.plans.llm import COSINE_DUP_THRESHOLD
    from pleiades_spark.streaming.pipeline import run_emb_reps_stream

    idx, stream = _emb_reps_stream_setup(spark, sf_dir)
    inbox, _assign = run_emb_reps_stream(
        spark, stream, idx, COSINE_DUP_THRESHOLD
    )
    return embedding_dedup_reps_from_index(
        spark.read.parquet(inbox), idx, COSINE_DUP_THRESHOLD
    )


def _oracle_streaming_emb_reps() -> str:
    from pleiades_spark.plans.llm import ORACLE_DEDUP_EMBEDDING_REPS_INCR

    return ORACLE_DEDUP_EMBEDDING_REPS_INCR


def q_streaming_emb_reps_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arrival provisional rep for streamed EMBEDDINGS: min
    cosine-VERIFIED persisted bucket-rep across the vector's SRP bands,
    else self — banding geometry pinned from the index meta. Pure
    per-vector function of (vector, static index): batch-boundary
    independent, replayed exactly by the oracle."""
    from pleiades_spark.plans.llm import COSINE_DUP_THRESHOLD
    from pleiades_spark.streaming.pipeline import run_emb_reps_stream

    idx, stream = _emb_reps_stream_setup(spark, sf_dir)
    _inbox, assign = run_emb_reps_stream(
        spark, stream, idx, COSINE_DUP_THRESHOLD
    )
    return spark.read.parquet(assign).select("vec_id", "rep_id")


def _oracle_streaming_emb_reps_probe() -> str:
    from pleiades_spark.functions.hashing import h32_sql
    from pleiades_spark.plans.llm import (
        _COS_SQL,
        _SRP_BAND_VAL_SQL,
        _SRP_BITS_SQL,
        COSINE_DUP_THRESHOLD,
        INCR_PCT,
    )
    from pleiades_spark.functions.hashing import SRP_BANDS

    return f"""
WITH v AS (
  SELECT vec_id,
         {h32_sql("concat('incr:', CAST(vec_id AS VARCHAR))")} % 100
           < {INCR_PCT} AS is_new,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
bits AS (SELECT vec_id, is_new, {_SRP_BITS_SQL} AS bits FROM v),
bands AS (
  SELECT vec_id, is_new, band_idx, {_SRP_BAND_VAL_SQL} AS band_val
  FROM bits, (SELECT unnest(range(0, {SRP_BANDS})) AS band_idx)
),
oreps AS (
  SELECT band_idx, band_val, min(vec_id) AS orep
  FROM bands WHERE NOT is_new GROUP BY band_idx, band_val
),
cand AS (
  SELECT DISTINCT b.vec_id, o.orep
  FROM bands b JOIN oreps o
    ON b.band_idx = o.band_idx AND b.band_val = o.band_val
  WHERE b.is_new
),
ver AS (
  SELECT vec_id, orep FROM (
    SELECT c.vec_id, c.orep, {_COS_SQL} AS cos
    FROM cand c JOIN v a ON a.vec_id = c.vec_id
                JOIN v b ON b.vec_id = c.orep
  ) WHERE cos >= {COSINE_DUP_THRESHOLD}
)
SELECT s.vec_id, CAST(coalesce(min(ver.orep), s.vec_id) AS BIGINT) AS rep_id
FROM v s LEFT JOIN ver ON ver.vec_id = s.vec_id
WHERE s.is_new GROUP BY s.vec_id
"""


def q_streaming_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS corpus ingestion end-to-end (round 13): the new slice
    arrives as two real micro-batches and flows through
    streaming/pipeline.stream_corpus_batch — quality gate → in-stream
    staging → persisted-index near-dup probe (drop if assigned to an
    indexed rep) → PII scrub → split-partitioned JSONL shard append.
    This gate reads the SHARDS back and returns (doc_id, split, q) per
    surviving doc. Every decision is a pure per-doc function of (text,
    static index), so the oracle replays quality + probe + split in one
    SQL statement; scrub is a fixture no-op (0 PII spans) and is
    covered by its own unit tests."""
    from pleiades_spark.plans.llm import JACCARD_THRESHOLD
    from pleiades_spark.streaming.pipeline import run_corpus_stream

    idx, stream = _doc_reps_stream_setup(spark, sf_dir)
    _inbox, _assign, shards = run_corpus_stream(
        spark, stream, idx, JACCARD_THRESHOLD
    )
    return (
        spark.read.schema(
            "doc_id long, lang string, source string, text string, q double"
        )
        .json(shards)
        .select("doc_id", "split", "q")
    )


def _oracle_streaming_corpus() -> str:
    from pleiades_spark.functions.hashing import h32_sql
    from pleiades_spark.functions.text import stopword_count_sql, word_shingles_sql
    from pleiades_spark.plans.corpus import SPLIT_TRAIN, SPLIT_VAL
    from pleiades_spark.plans.llm import (
        _BANDS_RANGE_SQL,
        _SIG_SQL,
        _TOKS,
        INCR_PCT,
        JACCARD_THRESHOLD,
    )
    from pleiades_spark.functions.hashing import LSH_ROWS

    q_sql = f"""round(
      0.4 * (len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}))
    + 0.4 * (1 - {stopword_count_sql(_TOKS)} * 1.0 / len({_TOKS}))
    + 0.2 * least(len({_TOKS}) / 100.0, 1.0), 6)"""
    split_bucket = (
        h32_sql("concat('split:', CAST(k.doc_id AS VARCHAR))") + " % 100"
    )
    return f"""
WITH scored AS (
  SELECT doc_id, text, n_chars,
         {h32_sql("concat('incr:', CAST(doc_id AS VARCHAR))")} % 100
           < {INCR_PCT} AS is_new,
         {q_sql} AS q
  FROM documents
), corpus AS (
  SELECT doc_id, text, is_new, q FROM scored
  WHERE NOT is_new OR (q >= 0.5 AND n_chars >= 60)
), sh AS (
  SELECT doc_id, is_new, {word_shingles_sql('text')} AS sh FROM corpus
), hashed AS (
  SELECT doc_id, is_new, list_transform(sh, s -> {h32_sql('s')}) AS hs FROM sh
), sig AS (
  SELECT doc_id, is_new, {_SIG_SQL} AS sig,
         list_distinct(list_transform(hs, h -> CAST(h - 2147483648 AS INTEGER)))
           AS hset
  FROM hashed
), bands AS (
  SELECT doc_id, is_new, band_idx,
         array_to_string(sig[band_idx*{LSH_ROWS}+1 : band_idx*{LSH_ROWS}+{LSH_ROWS}], '-') AS band_key
  FROM sig, {_BANDS_RANGE_SQL}
), oreps AS (
  SELECT band_idx, band_key, min(doc_id) AS orep
  FROM bands WHERE NOT is_new GROUP BY band_idx, band_key
), cand AS (
  SELECT DISTINCT b.doc_id, o.orep
  FROM bands b JOIN oreps o
    ON b.band_idx = o.band_idx AND b.band_key = o.band_key
  WHERE b.is_new
), ver AS (
  SELECT doc_id, orep FROM (
    SELECT c.doc_id, c.orep,
           round(len(list_intersect(a.hset, b.hset)) * 1.0
                 / (len(a.hset) + len(b.hset)
                    - len(list_intersect(a.hset, b.hset))), 6) AS jaccard
    FROM cand c JOIN sig a ON a.doc_id = c.doc_id
                JOIN sig b ON b.doc_id = c.orep
  ) WHERE jaccard >= {JACCARD_THRESHOLD}
), keeps AS (
  SELECT s.doc_id
  FROM sig s LEFT JOIN ver v ON v.doc_id = s.doc_id
  WHERE s.is_new
  GROUP BY s.doc_id
  HAVING coalesce(min(v.orep), s.doc_id) = s.doc_id
)
SELECT k.doc_id,
       CASE WHEN {split_bucket} < {SPLIT_TRAIN} THEN 'train'
            WHEN {split_bucket} < {SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split,
       c.q
FROM keeps k JOIN corpus c ON c.doc_id = k.doc_id
"""


def q_streaming_corpus_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly reconcile of the streaming corpus: after the same
    two-micro-batch ingest as streaming_corpus, stream_corpus_finalize
    runs the O(increment) persisted-index finalize over the inbox and
    diffs it against the provisional keep log — returning the
    TOMBSTONES (docs appended to the shards in-stream that the finalize
    merged into another representative; downstream consumers anti-join
    them away). This is the deferred-merge half of the keep-first
    contract: new-new near-dup pairs are invisible to the per-arrival
    probe by design and MUST surface here."""
    from pleiades_spark.plans.llm import JACCARD_THRESHOLD
    from pleiades_spark.streaming.pipeline import (
        run_corpus_stream,
        stream_corpus_finalize,
    )

    idx, stream = _doc_reps_stream_setup(spark, sf_dir)
    inbox, assign, _shards = run_corpus_stream(
        spark, stream, idx, JACCARD_THRESHOLD
    )
    return stream_corpus_finalize(
        spark, inbox, assign, idx, JACCARD_THRESHOLD
    ).select("doc_id", "rep_id")


def _oracle_streaming_corpus_tombstones() -> str:
    from pleiades_spark.functions.hashing import h32_sql
    from pleiades_spark.functions.text import stopword_count_sql, word_shingles_sql
    from pleiades_spark.plans.llm import (
        _BANDS_RANGE_SQL,
        _SIG_SQL,
        _TOKS,
        INCR_PCT,
        JACCARD_THRESHOLD,
    )
    from pleiades_spark.functions.hashing import LSH_ROWS

    q_sql = f"""round(
      0.4 * (len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}))
    + 0.4 * (1 - {stopword_count_sql(_TOKS)} * 1.0 / len({_TOKS}))
    + 0.2 * least(len({_TOKS}) / 100.0, 1.0), 6)"""
    verify = """
    SELECT e.doc_id, e.rep,
           round(len(list_intersect(a.hset, b.hset)) * 1.0
                 / (len(a.hset) + len(b.hset)
                    - len(list_intersect(a.hset, b.hset))), 6) AS jaccard
    FROM {src} e JOIN sig a ON a.doc_id = e.doc_id
                 JOIN sig b ON b.doc_id = e.rep"""
    return f"""
WITH RECURSIVE scored AS (
  SELECT doc_id, text, n_chars,
         {h32_sql("concat('incr:', CAST(doc_id AS VARCHAR))")} % 100
           < {INCR_PCT} AS is_new,
         {q_sql} AS q
  FROM documents
), corpus AS (
  SELECT doc_id, text, is_new FROM scored
  WHERE NOT is_new OR (q >= 0.5 AND n_chars >= 60)
), sh AS (
  SELECT doc_id, is_new, {word_shingles_sql('text')} AS sh FROM corpus
), hashed AS (
  SELECT doc_id, is_new, list_transform(sh, s -> {h32_sql('s')}) AS hs FROM sh
), sig AS (
  SELECT doc_id, is_new, {_SIG_SQL} AS sig,
         list_distinct(list_transform(hs, h -> CAST(h - 2147483648 AS INTEGER)))
           AS hset
  FROM hashed
), bands AS (
  SELECT doc_id, is_new, band_idx,
         array_to_string(sig[band_idx*{LSH_ROWS}+1 : band_idx*{LSH_ROWS}+{LSH_ROWS}], '-') AS band_key
  FROM sig, {_BANDS_RANGE_SQL}
), oreps AS (
  SELECT band_idx, band_key, min(doc_id) AS orep
  FROM bands WHERE NOT is_new GROUP BY band_idx, band_key
), oe AS (
  SELECT DISTINCT b.doc_id, o.orep AS rep
  FROM bands b JOIN oreps o
    ON b.band_idx = o.band_idx AND b.band_key = o.band_key
  WHERE NOT b.is_new AND b.doc_id != o.orep
), freps AS (
  SELECT band_idx, band_key, min(doc_id) AS frep,
         max(CASE WHEN is_new THEN 1 ELSE 0 END) AS has_new
  FROM bands GROUP BY band_idx, band_key
), ne AS (
  SELECT DISTINCT b.doc_id, f.frep AS rep
  FROM bands b
  JOIN freps f
    ON b.band_idx = f.band_idx AND b.band_key = f.band_key AND f.has_new = 1
  LEFT JOIN oreps o
    ON b.band_idx = o.band_idx AND b.band_key = o.band_key
  WHERE b.doc_id != f.frep AND (b.is_new OR b.doc_id = o.orep)
), e0 AS (
  SELECT doc_id, rep FROM oe UNION SELECT doc_id, rep FROM ne
), ver AS (
  SELECT doc_id, rep FROM ({verify.format(src='e0')})
  WHERE jaccard >= {JACCARD_THRESHOLD}
), edges AS (
  SELECT doc_id AS u, rep AS w FROM ver
  UNION SELECT rep, doc_id FROM ver
), reach(node, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.w, reach.r FROM reach JOIN edges e ON e.u = reach.node
), cl AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node),
final AS (
  SELECT d.doc_id, CAST(coalesce(cl.cluster, d.doc_id) AS BIGINT) AS rep_id
  FROM corpus d LEFT JOIN cl ON cl.node = d.doc_id
), pcand AS (
  SELECT DISTINCT b.doc_id, o.orep AS rep
  FROM bands b JOIN oreps o
    ON b.band_idx = o.band_idx AND b.band_key = o.band_key
  WHERE b.is_new
), pver AS (
  SELECT doc_id, rep FROM ({verify.format(src='pcand')})
  WHERE jaccard >= {JACCARD_THRESHOLD}
), keeps AS (
  SELECT s.doc_id
  FROM sig s LEFT JOIN pver pv ON pv.doc_id = s.doc_id
  WHERE s.is_new
  GROUP BY s.doc_id
  HAVING coalesce(min(pv.rep), s.doc_id) = s.doc_id
)
SELECT f.doc_id, f.rep_id
FROM final f JOIN keeps k ON k.doc_id = f.doc_id
WHERE f.rep_id != f.doc_id
"""


def q_streaming_corpus_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE streaming-corpus lifecycle end-to-end (round 13): the
    two-micro-batch ingest (streaming_corpus), the nightly finalize
    (streaming_corpus_tombstones), and then the downstream serving step
    — apply_tombstones anti-joins the reconcile's tombstones off the
    appended shards to produce the final training-corpus view. This is
    the frame a training job actually reads; gating it pins the
    keep-first contract's END state: provisional keeps minus deferred
    new-new merges == docs whose FINAL two-phase rep is themselves."""
    from pleiades_spark.plans.llm import JACCARD_THRESHOLD
    from pleiades_spark.streaming.pipeline import (
        apply_tombstones,
        run_corpus_stream,
        stream_corpus_finalize,
    )

    idx, stream = _doc_reps_stream_setup(spark, sf_dir)
    inbox, assign, shards = run_corpus_stream(
        spark, stream, idx, JACCARD_THRESHOLD
    )
    tomb = stream_corpus_finalize(spark, inbox, assign, idx, JACCARD_THRESHOLD)
    shard_df = spark.read.schema(
        "doc_id long, lang string, source string, text string, q double"
    ).json(shards)
    return apply_tombstones(shard_df, tomb).select("doc_id", "split", "q")


def _oracle_streaming_corpus_final() -> str:
    """Same CTE chain as the tombstones oracle (two-phase final + the
    provisional keeps), different tail: the docs BOTH grains keep, with
    their split and quality — the served corpus."""
    from pleiades_spark.functions.hashing import h32_sql
    from pleiades_spark.plans.corpus import SPLIT_TRAIN, SPLIT_VAL

    base = _oracle_streaming_corpus_tombstones()
    tail_from = base.rindex("SELECT f.doc_id, f.rep_id")
    split_bucket = (
        h32_sql("concat('split:', CAST(k.doc_id AS VARCHAR))") + " % 100"
    )
    return base[:tail_from] + f"""
SELECT k.doc_id,
       CASE WHEN {split_bucket} < {SPLIT_TRAIN} THEN 'train'
            WHEN {split_bucket} < {SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split,
       sc.q
FROM final f
JOIN keeps k ON k.doc_id = f.doc_id
JOIN scored sc ON sc.doc_id = k.doc_id
WHERE f.rep_id = f.doc_id
"""


def q_streaming_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A/B readout as a CONTINUOUS pipeline: the six Welch arm
    moments (counts, Σcents, Σcents² per arm) are a commutative monoid,
    so the exact batch aggregation runs as an update-mode streaming
    aggregate — per-type moment state accumulates across micro-batches
    and the t/df derive from the FINAL state. This is how an experiment
    dashboard actually consumes the stream: moments update per batch,
    statistics are a pure projection of state.

    Gate: events staged as two disjoint micro-batches
    (maxFilesPerTrigger=1), so the state provably merges across
    batches; the final emitted update per event_type must equal the
    batch moments exactly — the oracle IS ab_welch's
    (plans/analytics._welch_oracle). Statistics reuse the shared
    welch_stats tail, so batch and streaming cannot drift.

    Scale: update-mode sums keyed by event_type — state is |types| × 6
    longs per state-store partition; output per batch is |types| rows.
    No watermark needed (global lifetime aggregate, keys never expire).
    """
    from pleiades_spark.plans.analytics import (
        ab_arm_col,
        ab_cents_col,
        welch_moment_aggs,
        welch_stats,
    )

    apply_runtime_confs(spark)
    src = _staged_src(sf_dir, "ev_split",
                      lambda d: _stage_event_files(spark, sf_dir, d, split=True))

    def op(stream: DataFrame) -> DataFrame:
        c = ab_cents_col()
        base = stream.select(
            "event_type",
            ab_arm_col().alias("arm"),
            c.alias("c"),
            (c * c).alias("c2"),
        )
        return base.groupBy("event_type").agg(*welch_moment_aggs())

    mem = _run_stateful(spark, src, op, "update", "sab_welch_gate")
    # update mode re-emits a type's row each batch it changes; the final
    # state is the row with the largest total n (strictly increasing).
    w = Window.partitionBy("event_type").orderBy(
        (F.col("n_c") + F.col("n_t")).desc()
    )
    final = (
        mem.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return welch_stats(final)


def _oracle_streaming_ab_welch() -> str:
    from pleiades_spark.plans.analytics import ORACLE_AB_WELCH

    return ORACLE_AB_WELCH


QUERIES = [
    Query("streaming_lsh_dedup", q_streaming_lsh_dedup,
          _oracle_streaming_lsh_dedup(),
          "streaming near-dedup vs static LSH index = batch pairs (2 batches)"),
    Query("streaming_doc_reps", q_streaming_doc_reps,
          _oracle_streaming_doc_reps(),
          "stream-staged inbox + persisted-index finalize == batch nightly"),
    Query("streaming_doc_reps_probe", q_streaming_doc_reps_probe,
          _oracle_streaming_doc_reps_probe(),
          "per-arrival provisional rep via stream-static band_index probe"),
    Query("streaming_corpus", q_streaming_corpus,
          _oracle_streaming_corpus(),
          "continuous corpus ingest: quality + index probe + split shards"),
    Query("streaming_corpus_tombstones", q_streaming_corpus_tombstones,
          _oracle_streaming_corpus_tombstones(),
          "nightly finalize diff: keep-first tombstones for deferred merges"),
    Query("streaming_corpus_final", q_streaming_corpus_final,
          _oracle_streaming_corpus_final(),
          "served corpus view: shards anti-join tombstones (full lifecycle)"),
    Query("streaming_emb_reps", q_streaming_emb_reps,
          _oracle_streaming_emb_reps(),
          "embedding stream inbox + persisted-index finalize == batch nightly"),
    Query("streaming_emb_reps_probe", q_streaming_emb_reps_probe,
          _oracle_streaming_emb_reps_probe(),
          "per-arrival provisional rep via SRP band_index probe (meta geometry)"),
    Query("streaming_counters", q_streaming_counters, ORACLE_STREAMING_COUNTERS,
          "real Structured Streaming run: file source → window agg → memory sink"),
    Query("streaming_counters_append", q_streaming_counters_append,
          ORACLE_STREAMING_COUNTERS_APPEND,
          "append mode: only watermark-closed windows emit (finalize-once)"),
    Query("counters_reconcile", q_counters_reconcile,
          ORACLE_COUNTERS_RECONCILE,
          "exactly-once audit: streaming counters table vs batch recompute"),
    Query("stateful_running_totals", q_stateful_running_totals,
          ORACLE_STATEFUL_RUNNING_TOTALS,
          "applyInPandasWithState running totals across 2 micro-batches"),
    Query("stateful_stream_dedup", q_stateful_stream_dedup,
          ORACLE_STATEFUL_STREAM_DEDUP,
          "applyInPandasWithState cross-batch dedup: replayed batch emits 0 rows"),
    Query("stateful_dedup_horizon", q_stateful_dedup_horizon,
          ORACLE_STATEFUL_DEDUP_HORIZON,
          "horizon-bounded dedup state: old re-deliveries pass, recent drop"),
    Query("streaming_sessions", q_streaming_sessions, ORACLE_STREAMING_SESSIONS,
          "streaming session_window (merging windows) in append mode"),
    Query("streaming_dau", q_streaming_dau, ORACLE_STREAMING_DAU,
          "chained stateful ops: streaming dedup -> windowed exact DAU"),
    Query("streaming_dedup_builtin", q_streaming_dedup_builtin,
          ORACLE_STREAMING_DEDUP_BUILTIN,
          "dropDuplicatesWithinWatermark: double-delivered stream -> each event once"),
    Query("stream_stream_join", q_stream_stream_join, ORACLE_STREAM_STREAM_JOIN,
          "watermarked stream-stream interval self-join (1h follow-on window)"),
    Query("streaming_ab_welch", q_streaming_ab_welch,
          _oracle_streaming_ab_welch(),
          "update-mode incremental Welch moments; final state == batch"),
]
