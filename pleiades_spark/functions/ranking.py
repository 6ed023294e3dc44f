"""Scale-safe global top-k with a rank column.

Spark's InferWindowGroupLimit rewrite (filter(rank <= k) over a Window)
only fires when the window HAS a partitionSpec — measured on Spark 4.1,
an unpartitioned row_number rank window + rank filter plans as a real
single-partition sort of the whole input. The
scale-safe global form is ``orderBy(...).limit(k)``, which compiles to
TakeOrderedAndProject: per-partition k-row heaps merged on the driver —
no global sort, no single-task shuffle.

``global_topk`` wraps that and then assigns the rank column with a
row_number window over the ALREADY k-row result (maxRows = k, so the
single-partition window is bounded by construction). Results are
identical to the filter form whenever the ordering is a deterministic
total order — which every gate query's ordering is, by repo convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def global_topk(df: DataFrame, k: int, *order: Column, rank_col: str = "rank") -> DataFrame:
    """Top-k of ``df`` under the total order ``order``, plus a 1-based
    rank column — planned as TakeOrderedAndProject + a k-row window."""
    topk = df.orderBy(*order).limit(k)
    return topk.withColumn(rank_col, F.row_number().over(W.orderBy(*order)))
