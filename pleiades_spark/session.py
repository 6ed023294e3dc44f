"""SparkSession construction tuned for both local testing and cluster scale.

Local testing runs on local[N] (single JVM); at production scale the same
plans run on a 1000-executor cluster against ~100 TB. Everything that
matters for that transition is declarative (AQE, shuffle partitions,
broadcast thresholds) — no code change needed, only config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs we re-assert on any session handed to us (the
# driver harness builds its own session; these keep semantics stable).
RUNTIME_CONFS = {
    # DuckDB oracle comparison: duckdb timestamps are UTC-naive; pin UTC so
    # unix_timestamp()/date arithmetic agree bit-for-bit.
    "spark.sql.session.timeZone": "UTC",
    # AQE re-plans at runtime: coalesces tiny shuffle partitions at small SF,
    # splits skewed ones at large SF. Always on.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python DataSource filter pushdown (Spark 4.1, off by default) — the
    # pleiades_filequeue connector pushes id predicates so rejected
    # queue files never materialize their bodies.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Assert runtime-settable confs on an externally-built session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be static in exotic deployments; never fail a
            # query over a tuning knob.
            pass
    return spark


def get_spark(app_name: str = "pleiades_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a tuned local session.

    At cluster scale the master/memory settings come from spark-submit; the
    declarative confs below are the ones that travel.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or min(os.cpu_count() or 4, 32)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # ~cores for local; on a real cluster this scales with executor count
        # (or is left to AQE's initialPartitionNum).
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.driver.memory", os.environ.get("PLEIADES_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # static conf: bucketed-table tests use saveAsTable; keep the
        # warehouse out of the repo tree
        .config("spark.sql.warehouse.dir", "/tmp/pleiades_warehouse")
        .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
