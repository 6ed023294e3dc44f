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


# --- report → knobs wiring (round-8 verdict #7) ----------------------------

SKEW_RATIO_BAR = 4.0  # below this AQE's default splitting copes; salting
#                       would only add a Generate + a wider shuffle key
MAX_SALTS = 64


def salting_plan(
    report: DataFrame,
    n_shuffle_partitions: int = 32,
    bytes_per_row: int = 128,
    skew_bar: float = SKEW_RATIO_BAR,
    max_salts: int = MAX_SALTS,
) -> DataFrame:
    """Derive actionable knobs from a q_skew_report frame — the wiring
    between the observability query (which keys are hot) and the fixes
    (salted_count_sum / salted_equi_join / AQE skew-join), so a 100 TB
    run tunes itself from measurements instead of UI archaeology.

    Input: the skew_report schema (key_name, n_rows, n_keys, max_cnt,
    avg_cnt, p50_cnt, p99_cnt, skew_ratio, …). Output adds per key:

    - needs_salting: skew_ratio > skew_bar. Below the bar the hot key is
      within a small factor of the mean — AQE's sort-merge splitting (or
      nothing) is cheaper than salting's dim replication.
    - n_salts: the factor for salted_count_sum/salted_equi_join — the
      smallest power of two S with max_cnt/S ≤ p99_cnt (spread the hot
      key down to the p99 key's per-task load; pow2 keeps pmod salts
      balanced), clamped to [2, max_salts]; 1 when not needed.
    - aqe_skewed_partition_factor: AQE flags a partition at
      factor × median partition size. The hot key alone makes its
      partition ≈ skew_partition_ratio = max_cnt·P/n_rows × the median —
      recommend half that (so AQE fires with margin), clamped to [2, 5]
      (5 = Spark's default; going above would only make AQE blinder).
    - aqe_skewed_partition_threshold_bytes: AQE also requires an
      absolute floor; 2 × the estimated median partition bytes
      (n_rows·bytes_per_row/P), clamped to [16 MiB, 256 MiB (the
      default)] so tiny test runs don't flap and huge runs keep the
      stock ceiling.

    All arithmetic runs on the report's reduced grain (rows = audited
    keys) — attach to the same job, no extra scan. ``bytes_per_row`` is
    an estimate knob; feed the real avg row size from table stats (or
    q_table_profile + schema widths) when you have it.
    """
    mib = 1024 * 1024
    # S = next pow2 ≥ max_cnt / max(p99, avg, 1). Derived via a
    # when-chain over the ≤ log2(max_salts) candidate powers rather
    # than pow(2, ceil(log2(x))): libm log2 differs by ULPs across
    # engines/platforms exactly at the pow2 boundaries this quantizes
    # to, which would flip the ceil — plain double comparisons are
    # IEEE-exact everywhere (and let the DuckDB gate oracle replay the
    # choice bit-for-bit).
    if max_salts < 2 or (max_salts & (max_salts - 1)) != 0:
        raise ValueError(
            f"max_salts must be a power of two >= 2, got {max_salts}: the "
            "when-chain clamp emits max_salts itself when raw_s exceeds "
            "every candidate, and a non-pow2 salt count breaks pmod balance"
        )
    # candidates derived FROM max_salts (doubling), so the clamp value is
    # always the last chain candidate — never an uncovered fallback
    candidates = []
    s_ = 2
    while s_ <= max_salts:
        candidates.append(s_)
        s_ *= 2
    spread_target = F.greatest(F.col("p99_cnt"), F.col("avg_cnt"), F.lit(1.0))
    raw_s = F.col("max_cnt").cast("double") / spread_target
    pow2_s = F.lit(max_salts)
    for s_ in reversed(candidates):
        pow2_s = F.when(raw_s <= F.lit(float(s_)), F.lit(s_)).otherwise(
            pow2_s
        )
    need = F.col("skew_ratio") > F.lit(skew_bar)
    # explicit double casts + floor-before-cast: Spark truncates
    # double→long, DuckDB rounds — floor on both sides keeps the gate
    # oracle bit-identical (CLAUDE.md quantize invariant)
    part_ratio = (
        F.col("max_cnt").cast("double")
        * F.lit(float(n_shuffle_partitions))
        / F.col("n_rows").cast("double")
    )
    median_part_bytes = (
        F.col("n_rows").cast("double")
        * F.lit(float(bytes_per_row))
        / F.lit(float(n_shuffle_partitions))
    )
    return report.select(
        "*",
        need.alias("needs_salting"),
        F.when(need, pow2_s.cast("int")).otherwise(F.lit(1)).alias("n_salts"),
        F.greatest(
            F.lit(2),
            F.least(
                F.lit(5), F.floor(part_ratio / F.lit(2.0)).cast("int")
            ),
        ).alias("aqe_skewed_partition_factor"),
        F.greatest(
            F.lit(16 * mib).cast("long"),
            F.least(
                F.lit(256 * mib).cast("long"),
                F.floor(F.lit(2.0) * median_part_bytes),
            ),
        ).alias("aqe_skewed_partition_threshold_bytes"),
    )


def apply_skew_confs(spark, plan: DataFrame) -> dict[str, str]:
    """Set session AQE skew-join confs from a salting_plan frame, tuned
    to the WORST audited key (min factor, min threshold — the most
    sensitive setting that still only affects genuinely skewed
    partitions). Driver-side collect is the plan's audited-key grain
    (≤ a handful of rows — bounded by construction). Returns the confs
    it set, for logging/tests."""
    worst = (
        plan.agg(
            F.min("aqe_skewed_partition_factor").alias("f"),
            F.min("aqe_skewed_partition_threshold_bytes").alias("t"),
        ).collect()[0]
    )
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": str(worst["f"]),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
            worst["t"]
        ),
    }
    for k, v in confs.items():
        spark.conf.set(k, v)
    return confs
