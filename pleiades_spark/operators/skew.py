"""Skew-management operators: salted two-phase aggregation + salted join.

A hot grouping key (one language holding half the corpus, one boilerplate
dedup bucket) concentrates a shuffle partition on one task. The classic
fix: split each key into S salted sub-keys, partially aggregate on
(key, salt), then combine on the key — the hot key's work spreads over S
tasks and the second shuffle moves only S rows per key.

The salt must be DETERMINISTIC here (oracle reproducibility), derived
from a high-cardinality companion column; production code can use
``F.rand`` when results are salting-invariant (they are — the combine is
exact). AQE's skew-join splitting covers materialized sort-merge joins;
salted_count_sum covers the aggregation case AQE does not rebalance, and
salted_equi_join pre-spreads join skew before the hot partition exists.
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


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_source: Column,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-spread equi-join: the join-side analog of salted_count_sum.

    The fact side gets a deterministic salt in [0, S); the dim side
    replicates each row S times (one Generate, S× the dim size — the
    trade: S·|dim| extra shuffle bytes buy a hot key S-way task
    parallelism); the join key becomes (key, salt), so a hot fact key's
    rows hash to S different shuffle partitions instead of piling onto
    one straggler task.

    Use when the dim is too big to broadcast AND the fact key is skewed
    beyond what AQE's skew-join splitting handles (AQE splits oversized
    partitions of sort-merge joins, but only after a first materialized
    shuffle; pre-salting never builds the hot partition at all). Results
    are salting-invariant for inner/left joins on unique dim keys — the
    gate oracle checks exactly that by replaying a plain join.
    """
    f = fact.withColumn("_salt", F.pmod(salt_source, F.lit(n_salts)))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")
