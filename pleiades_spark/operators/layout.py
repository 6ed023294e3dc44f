"""Z-order data layout — multi-column clustering for scan pruning.

Parquet scans prune row groups / files from column min-max statistics, but
statistics only help if the data is CLUSTERED on the filter column. A sort
on one column destroys locality on every other; interleaving the bits of
two columns into one Morton (Z-order) key gives each column ~half the
locality, so point/range filters on EITHER column skip most files — the
same trick behind Delta Lake's ``OPTIMIZE ZORDER BY`` and the classic
UB-tree layout.

At 100 TB this is a maintenance job, not a query: ``zorder_write``
range-partitions the table on the Z-value (a single shuffle whose
partitioner is sampled by Spark's RangePartitioner) and sorts within each
partition, so every output file owns a compact Z-range ⇒ a compact
rectangle in (x, y) space ⇒ tight per-file min-max stats on BOTH columns.
tests/test_layout.py measures the realized span shrink vs an unclustered
write.

The Z-value itself is a pure codegen expression (unrolled shift/mask sum —
no Python, no HOF), oracle-replayed bit-for-bit in plans/relational.py's
``zorder_rank`` gate query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per-column bits interleaved into a 32-bit Z-value


def zvalue(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: bit i of x lands at position 2i, bit i of y at 2i+1.

    Unrolled into ``2·bits`` shift/mask terms (shiftleft/shiftright need
    literal distances) — one whole-stage-codegen expression, exact integer
    arithmetic, no overflow below bits=31.
    """
    xl = x.cast("long")
    yl = y.cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zvalue_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB twin of :func:`zvalue` (exact integer ops — order-free)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({x} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({y} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Rewrite ``df`` clustered by the Z-order of (x_col, y_col).

    Each column is min-max scaled to the FULL ``bits`` width before
    interleaving — without this, the column with the wider raw range owns
    all the high Z bits and the narrow column gets no locality at all
    (interleaving partkey 0–200k with suppkey 0–10k raw would cluster on
    partkey alone). Normalizing by rank-range is what Delta's OPTIMIZE
    ZORDER does with its range-partition ids; min-max is the one-agg
    approximation that suffices for roughly uniform keys.

    Fully distributed: the min/max stats row is broadcast-joined (no
    driver collect), then one range-partitioning shuffle on the Z-value +
    an in-partition sort. The Z column is dropped before the write (it is
    derivable, and an unchanged schema lets readers swap paths
    transparently).
    """
    stats = df.agg(
        F.min(x_col).alias("__xmin"),
        F.max(x_col).alias("__xmax"),
        F.min(y_col).alias("__ymin"),
        F.max(y_col).alias("__ymax"),
    )
    top = (1 << bits) - 1

    def scale(col, lo, hi):
        span = F.greatest(hi - lo, F.lit(1)).cast("long")
        return ((col - lo).cast("long") * top / span).cast("long")

    xs = scale(F.col(x_col), F.col("__xmin"), F.col("__xmax"))
    ys = scale(F.col(y_col), F.col("__ymin"), F.col("__ymax"))
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__z", zvalue(xs, ys, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__xmin", "__xmax", "__ymin", "__ymax")
        .write.mode("overwrite")
        .parquet(path)
    )
