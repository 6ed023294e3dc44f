"""Skew-management operators: salted two-phase aggregation.

A hot grouping key (one language holding half the corpus, one boilerplate
dedup bucket) concentrates a shuffle partition on one task. The classic
fix: split each key into S salted sub-keys, partially aggregate on
(key, salt), then combine on the key — the hot key's work spreads over S
tasks and the second shuffle moves only S rows per key.

The salt must be DETERMINISTIC here (oracle reproducibility), derived
from a high-cardinality companion column; production code can use
``F.rand`` when results are salting-invariant (they are — the combine is
exact). AQE's skew-join handling covers the join case; this covers the
aggregation case AQE does not rebalance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_count_sum(
    df: DataFrame,
    keys: Sequence[str],
    salt_source: Column,
    sum_col: str | None = None,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Exact grouped count (and optional sum) via salted two-phase agg.

    Phase 1 shuffles on (keys…, salt) — hot keys spread across n_salts
    partitions; phase 2 shuffles n_salts rows per key. Results are
    identical to the direct groupBy (the oracle checks exactly that).
    """
    salt = F.pmod(salt_source, F.lit(n_salts)).alias("_salt")
    aggs = [F.count(F.lit(1)).alias("_pc")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("_ps"))
    partial = df.groupBy(*keys, salt).agg(*aggs)
    final_aggs = [F.sum("_pc").alias("n")]
    if sum_col is not None:
        final_aggs.append(F.sum("_ps").alias("total"))
    return partial.groupBy(*keys).agg(*final_aggs)
