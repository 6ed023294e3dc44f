"""WebDataset-style tar-shard sink for multimodal training samples.

The de-facto interchange for image/audio/video training corpora
(Breuel's WebDataset: POSIX tar shards, one sample = adjacent entries
``<key>.<ext>`` sharing a basename) — what a 100 TB multimodal pipeline
writes at its downstream edge so trainers stream shards sequentially.

Spark-first shape: shard assignment is a DETERMINISTIC hash of the
sample key (same md5-derived bucketing as the corpus shuffle — stable
across runs/retries, replayable), `repartition(shard_id)` co-locates
each shard's samples on one task, and the tar files are written
EXECUTOR-SIDE via foreachPartition + stdlib ``tarfile`` — the driver
never sees a sample. Entries within a shard are written in sorted key
order so a shard's bytes are reproducible run-to-run.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pleiades_spark.functions.hashing import h32

N_WDS_SHARDS = 8


def write_webdataset(
    samples: DataFrame,
    out_dir: str,
    n_shards: int = N_WDS_SHARDS,
    key_col: str = "key",
) -> None:
    """Write (key, <component columns>) rows as WebDataset tar shards.

    String columns become ``<key>.<name>.txt`` entries (UTF-8); binary
    columns become ``<key>.<name>.bin``. Shard id = h32(key) % n_shards.
    Deterministic: re-running produces byte-identical shards (fixed
    mtime/uid so tar metadata doesn't smuggle wall-clock in).
    """
    os.makedirs(out_dir, exist_ok=True)
    # A re-run with a smaller n_shards must not leave stale high-numbered
    # shards behind for read_webdataset_index to pick up.
    for fname in os.listdir(out_dir):
        if fname.startswith("shard-") and fname.endswith(".tar"):
            os.remove(os.path.join(out_dir, fname))
    comp_cols = [c for c in samples.columns if c != key_col]
    schema = dict(samples.dtypes)
    sharded = samples.withColumn(
        "_shard", (h32(F.col(key_col).cast("string")) % n_shards).cast("int")
    ).repartition(n_shards, F.col("_shard"))

    def _write_partition(rows) -> None:
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r["_shard"], []).append(r)
        for shard_id, members in by_shard.items():
            members.sort(key=lambda r: str(r[key_col]))
            path = os.path.join(out_dir, f"shard-{shard_id:05d}.tar")
            # Write-then-rename: a speculative/retried attempt may run
            # concurrently with another attempt on the same shard, and
            # in-place tarfile.open(path, 'w') would interleave corrupt
            # bytes. os.replace is atomic, and because shard content is
            # deterministic both attempts publish identical files.
            tmp = f"{path}.tmp.{os.getpid()}"
            with tarfile.open(tmp, "w") as tar:
                for r in members:
                    for c in comp_cols:
                        v = r[c]
                        if v is None:
                            continue
                        if schema[c] == "binary":
                            data, ext = bytes(v), "bin"
                        else:
                            data, ext = str(v).encode("utf-8"), "txt"
                        info = tarfile.TarInfo(f"{r[key_col]}.{c}.{ext}")
                        info.size = len(data)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        tar.addfile(info, io.BytesIO(data))
            os.replace(tmp, path)

    sharded.foreachPartition(_write_partition)


def read_webdataset_index(out_dir: str) -> list[dict]:
    """Driver-side shard index (name, entries, bytes) — the manifest a
    trainer's dataloader consumes; also the test hook."""
    index = []
    for fname in sorted(os.listdir(out_dir)):
        if not fname.endswith(".tar"):
            continue
        path = os.path.join(out_dir, fname)
        with tarfile.open(path) as tar:
            names = tar.getnames()
        index.append(
            {"shard": fname, "entries": names, "bytes": os.path.getsize(path)}
        )
    return index
