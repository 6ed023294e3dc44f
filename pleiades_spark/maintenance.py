"""Table maintenance: small-file compaction for day-partitioned parquet.

A streaming foreachBatch sink (streaming/pipeline.py) writes one file
per (micro-batch × shuffle partition) — after a week a hot day holds
thousands of KB-sized files, and at 100 TB the NameNode/listing cost and
per-file open overhead dominate scan time (the classic small-file
problem; the reference never hits it because Redis is its store, but any
parquet-backed deployment of this engine does).

compact_days rewrites each target day's subtree into ~size-targeted
files and swaps it in atomically via the same stage-and-swap primitive
the backfill/forget jobs use — readers never see a partially compacted
day, and a crash mid-swap leaves the staged files for the rerun.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pleiades_spark.session import apply_runtime_confs
from pleiades_spark.streaming.pipeline import _swap_day_partitions

TARGET_FILE_BYTES = 128 * 1024 * 1024  # the usual HDFS-block-ish target


def _day_sizes(spark: SparkSession, table_path: str) -> dict[int, int]:
    """day → total bytes, from one filesystem listing (no data read)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = root.getFileSystem(hconf)
    sizes: dict[int, int] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("day="):
            continue
        day = int(name.split("=", 1)[1])
        sizes[day] = fs.getContentSummary(st.getPath()).getLength()
    return sizes


def compact_days(
    spark: SparkSession,
    table_path: str,
    days: list[int] | None = None,
    target_bytes: int = TARGET_FILE_BYTES,
) -> dict[int, int]:
    """Rewrite each target day into ``ceil(day_bytes / target_bytes)``
    files. Returns {day: n_files_written}.

    File-count control is a repartition on (day, bucket) where bucket =
    pmod(xxhash64(row), n_files(day)) — n_files comes from the
    filesystem listing, shipped as a broadcast when-chain (day
    cardinality is small by construction). One shuffle of exactly the
    compacted days' data; untouched days are never read. The swap is
    day-atomic (stage-and-swap), safe while readers are live.
    """
    apply_runtime_confs(spark)
    sizes = _day_sizes(spark, table_path)
    target_days = sorted(sizes) if days is None else sorted(int(d) for d in days)
    target_days = [d for d in target_days if d in sizes]
    if not target_days:
        return {}
    n_files = {
        d: max(1, -(-sizes[d] // target_bytes)) for d in target_days
    }
    df = spark.read.parquet(table_path).filter(F.col("day").isin(target_days))
    nf = F.lit(1)
    for d, n in n_files.items():
        nf = F.when(F.col("day") == d, F.lit(n)).otherwise(nf)
    data_cols = [c for c in df.columns if c != "day"]
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]), nf)
    staged = (
        df.withColumn("_bucket", bucket)
        .repartition(F.col("day"), F.col("_bucket"))
        .drop("_bucket")
    )
    _swap_day_partitions(spark, staged, table_path, ["day"], target_days)
    return n_files


# The streaming corpus personality's shard schema (streaming/pipeline.
# stream_corpus_batch) — JSONL must be read back with an explicit schema
# (inference would re-scan every file and can widen types per batch).
CORPUS_SHARD_SCHEMA = (
    "doc_id long, lang string, source string, text string, q double"
)


def compact_corpus_shards(
    spark: SparkSession,
    shards_dir: str,
    target_bytes: int = TARGET_FILE_BYTES,
    schema: str = CORPUS_SHARD_SCHEMA,
) -> dict[str, int]:
    """Small-file compaction for the streaming corpus shards: each
    micro-batch of stream_corpus_batch appends one JSONL file per
    (batch × shuffle partition) under ``split=<name>/`` — the same
    accretion compact_days exists for on the counters table, so the
    same maintenance window fixes both. Per split dir: one filesystem
    listing sizes it, the rewrite reads ONLY that split into
    ``ceil(bytes / target_bytes)`` files under a single ``epoch=-1``
    leaf (the shards are ``split=<name>/epoch=<id>/`` since the
    idempotent-replay fix — partition discovery needs uniform depth, so
    the compacted form keeps the nesting; -1 can never collide with a
    real micro-batch id), and the swap is rename-atomic (stage hidden
    beside it, rename old away, rename staged in, delete old). A crash
    anywhere in the window is repaired on the next run: a leftover
    ``.old_split=X`` whose ``split=X`` is missing means the process died
    between the two renames — the staged dir (fully written before the
    swap began) is promoted if present, else the old dir is restored.
    Splits already at (or under) their target file count are skipped
    without reading data. Returns {split: n_files_written} for the
    splits actually rewritten."""
    apply_runtime_confs(spark)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(shards_dir)
    fs = root.getFileSystem(hconf)

    def _p(path: str):
        return jvm.org.apache.hadoop.fs.Path(path)

    def _n_data_files(path) -> int:
        n = 0
        for f in fs.listStatus(path):
            nm = f.getPath().getName()
            if nm.startswith(("_", ".")):
                continue
            n += _n_data_files(f.getPath()) if f.isDirectory() else 1
        return n

    # Repair a torn swap from a previous crashed run BEFORE compacting.
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith(".old_split="):
            continue
        split_name = name[len(".old_"):]
        part = _p(f"{shards_dir}/{split_name}")
        staged = _p(f"{shards_dir}/.compact_{split_name}")
        if not fs.exists(part):
            if fs.exists(staged):
                fs.rename(staged, part)  # finish the interrupted swap
            else:
                fs.rename(st.getPath(), part)  # restore the original
        fs.delete(_p(f"{shards_dir}/{name}"), True)

    written: dict[str, int] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("split="):
            continue
        part = st.getPath()
        size = fs.getContentSummary(part).getLength()
        n = max(1, -(-size // target_bytes))
        if _n_data_files(part) <= n:
            continue
        df = spark.read.schema(schema).json(f"{shards_dir}/{name}")
        staged = f"{shards_dir}/.compact_{name}"
        (
            df.drop("epoch")
            .withColumn("epoch", F.lit(-1))
            .repartition(n)
            .write.partitionBy("epoch")
            .mode("overwrite")
            .json(staged)
        )
        old = _p(f"{shards_dir}/.old_{name}")
        fs.delete(old, True)
        fs.rename(part, old)
        fs.rename(_p(staged), part)
        fs.delete(old, True)
        written[name.split("=", 1)[1]] = n
    return written
