"""JSONL (JSON-lines) source/sink — the training-data interchange format.

Every LLM-data pipeline speaks JSONL at its edges (crawl dumps in,
tokenizer shards out). Spark's native json writer IS JSONL — one object
per line, one file per partition — so both directions stay fully
distributed and the format is directly readable by DuckDB
(read_json_auto), pandas, and every tokenizer toolchain.

Scale notes: write parallelism = input partitions (repartition first to
set shard count/size); compression via the standard codec option
(zstd/gzip) — at 100 TB always compress, JSONL is ~3× parquet on disk.
An explicit read schema skips the inference scan AND pins types against
drifting input (schema inference over 100 TB is itself a full read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from pleiades_spark.session import apply_runtime_confs


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compression: str | None = None,
) -> None:
    """Write a frame as JSONL shards (one JSON object per line)."""
    if n_shards is not None:
        df = df.repartition(n_shards)
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read JSONL; pass a schema in production (see module note).

    PERMISSIVE mode is the default: malformed lines null out, and adding
    a ``columnNameOfCorruptRecord`` option surfaces them for the
    malformed-counter path (same posture as the SSE/Kafka parsers).
    """
    apply_runtime_confs(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
