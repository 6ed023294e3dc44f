"""Table catalog over the driver-generated parquet fixtures.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under a scale-factor
directory.

Scale notes: `spark.read.parquet` gives vectorized columnar scans with
predicate pushdown and column pruning for free. At 100 TB each "table"
becomes a directory of many files (ideally partitioned by a date/key
column); nothing here changes — the loader takes any path glob.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# region/nation are fixed-size; supplier/part/customer grow with SF but stay
# broadcastable into the low SFs — joins hint them explicitly per-query).
ALWAYS_BROADCAST = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The fixture parquet stores timestamps as INT64 TIMESTAMP(NANOS), which
# vanilla Spark rejects (PARQUET_TYPE_ILLEGAL). We read nanos as long
# (legacy conf, runtime-settable) and convert to TimestampType by integer-
# dividing to micros — the same truncation DuckDB applies, so oracle
# comparisons agree exactly.
_NANOS_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy scan)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for ts_col in _NANOS_TS_COLS.get(name, ()):
        # Only convert when the file actually carried nanos (future-proof
        # against regenerated fixtures with micro timestamps).
        if dict(df.dtypes).get(ts_col) == "bigint":
            df = df.withColumn(
                ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
