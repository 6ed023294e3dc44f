"""Exact order statistics at scale: grouped percentiles over integer
values without ever sorting raw rows.

``percentile_cont``/``ntile`` forms sort each group's rows — a
single-task wall when group cardinality is small and groups are huge
(the constant-cardinality window trap; see the weighted-median and RFM
rewrites). The two-phase bucket refinement here needs only:

  phase A  per-(key, value) weights  →  per-(key, value>>bits) bucket
           weights  →  ONE bounded cumulative window per key over
           bucket-grain rows (value-range/2^bits rows, data-size
           independent)  →  the bucket containing each requested
           percentile + the weight of everything before it
  phase B  the cumulative rule rerun INSIDE that single bucket per
           (key, percentile), offset by the prior weight

The percentile rule is pure integer comparison — pv(p) = min{v :
100·W(v) ≥ p·W_tot} — so two engines can never disagree on a boundary.
p=50 degenerates to the lower weighted median.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def grouped_exact_percentiles(
    per_v: DataFrame,
    key_cols: list[str],
    val_col: str,
    weight_col: str,
    ps: list[int],
    bucket_bits: int = 12,
) -> DataFrame:
    """per_v: pre-aggregated (keys..., val, weight) with a NON-NEGATIVE
    integer val. Returns (keys..., p, pv) — one row per requested
    integer percentile p in (0, 100]."""
    keys = list(key_cols)
    v, w = F.col(val_col), F.col(weight_col)

    tot = per_v.groupBy(keys).agg(F.sum(w).alias("tot"))
    bucketed = per_v.withColumn("b", F.shiftright(v, bucket_bits))
    per_b = bucketed.groupBy(keys + ["b"]).agg(F.sum(w).alias("wb"))
    bwin = W.partitionBy(keys).orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    cum_b = (
        per_b.join(tot, keys)
        .withColumn("cum_b", F.sum("wb").over(bwin))
        .withColumn("p", F.explode(F.array(*[F.lit(int(p)) for p in ps])))
    )
    targets = (
        cum_b.filter(100 * F.col("cum_b") >= F.col("p") * F.col("tot"))
        .groupBy(keys + ["p"])
        .agg(
            F.min("b").alias("b_star"),
            F.min_by(F.col("cum_b") - F.col("wb"), F.col("b")).alias("prior"),
            F.min("tot").alias("tot"),
        )
    )
    vwin = (
        W.partitionBy(keys + ["p"]).orderBy(val_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        bucketed.join(F.broadcast(targets), keys)
        .filter(F.col("b") == F.col("b_star"))
        .withColumn("cum_v", F.sum(w).over(vwin))
        .filter(100 * (F.col("prior") + F.col("cum_v")) >= F.col("p") * F.col("tot"))
        .groupBy(keys + ["p"])
        .agg(F.min(val_col).alias("pv"))
    )
