"""Time-series operators over the events table: gap-fill + interpolation
and exponentially-weighted moving averages.

Irregular event streams need a regular grid before most downstream
analytics (rate charts, seasonality, model features). Spark has no
native gap-fill/resample — the classic "operator the engine lacks" —
but the semantics decompose cleanly into built-ins:

  grid     = per-key explode(sequence(min_bucket, max_bucket))
  fill     = left join actual aggregates onto the grid
  locf     = last(value, ignorenulls) over preceding rows
  interp   = prev + (next - prev) * (t - t_prev) / (t_next - t_prev)
             with prev/next from ignorenulls window endpoints

Everything stays in whole-stage codegen: Generate + one shuffle onto the
key for the windows. At 100 TB the grid explode is bounded by
(keys x buckets-per-key), not events, and each key's range is processed
independently — no global sort.

EWMA is genuinely sequential (y_i depends on y_{i-1}), so it runs as
vectorized pandas ``ewm`` per key partition via applyInPandas — the
same "sequential within key, parallel across keys" contract as
sequence packing. The oracle replays the recurrence with a recursive
CTE, value-hash-matched after ROUND(4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

HOUR = 3600

EWMA_ALPHA = 0.5

EWMA_SCHEMA = "user_id long, event_id long, ewma double"


def _quantize4(x):
    """floor(x·10⁴ + 0.5)/10⁴ — deterministic 4-decimal quantizer.

    Interp/EWMA values land EXACTLY on .xxxx5 boundaries (hour fractions
    and α=0.5 powers terminate in decimal), where Spark's round
    (BigDecimal shortest-repr, HALF_UP) and DuckDB's float round
    disagree on the same double. This floor form is primitive IEEE ops
    only, so both engines compute it bit-identically; the oracle uses
    the literal same formula."""
    return F.floor(x * 10000 + F.lit(0.5)) / 10000


QUANTIZE4_SQL = "floor(({x}) * 10000 + 0.5) / 10000"


def gapfill_hourly(events: DataFrame) -> DataFrame:
    """Per-user hourly grid between the user's first and last event, with
    observed hourly sums, last-observation-carried-forward, and linear
    interpolation across gaps.

    r13 restructure (guide §2.1/§2.4): each gap row's LOCF/interp inputs
    are fully determined by its two ENCLOSING observed hours, so instead
    of materializing the grid (bounds agg + sequence explode + left join
    back onto hourly) and running four ignorenulls window fills over the
    GRID-sized stream, a single lead() window over the OBSERVED rows
    carries (next hour, next val), and the gap rows explode straight out
    of each observed row with their fill inputs already in hand. That
    removes one corpus aggregation, the grid⋈hourly shuffle join, and
    the descending second window sort — and the one remaining window
    runs on observed rows only, not the (much larger) filled grid. The
    r12 shape's plan: 6 exchanges, 4 windows over grid rows; now 3
    exchanges, 1 window over hourly rows (plans/r13/timeseries_gapfill_*).

    Grid endpoints always carry observations (they're the user's own
    min/max hours), so interp's prev/next are never both null; leading/
    trailing edges therefore need no special casing. Assumes observed
    hourly sums are non-null (an all-null-value hour would previously
    have been LOCF'd over); event `value` is non-null across every
    fixture and the oracle replays identically.
    """
    hourly = (
        events.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / HOUR).cast("long").alias("hour"),
            "value",
        )
        .groupBy("user_id", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("val"),
        )
    )
    w = W.partitionBy("user_id").orderBy("hour")
    led = hourly.select(
        "user_id",
        F.col("hour").alias("ph"),
        "n_events",
        "val",
        F.lead("hour").over(w).alias("nh"),
        F.lead("val").over(w).alias("nv"),
    )
    # each observed hour emits itself plus the empty hours up to (not
    # including) the next observed hour; the last observed hour emits
    # only itself — the union is exactly the r12 grid [h0, h1]
    filled = led.select(
        "user_id",
        "ph",
        "n_events",
        "val",
        "nh",
        "nv",
        F.explode(
            F.sequence(
                F.col("ph"), F.coalesce(F.col("nh") - 1, F.col("ph"))
            )
        ).alias("hour"),
    )
    obs = F.col("hour") == F.col("ph")
    # origin val IS the running-last fill for every row this observed
    # hour emits; (nh, nv) are the backward fill — same operands, same
    # op order as the r12 window form, so identical doubles.
    interp = F.when(obs, F.col("val")).otherwise(
        F.col("val")
        + (F.col("nv") - F.col("val"))
        * (F.col("hour") - F.col("ph"))
        / (F.col("nh") - F.col("ph"))
    )
    return filled.select(
        "user_id",
        "hour",
        F.when(obs, F.col("n_events")).otherwise(F.lit(0)).alias("n_events"),
        F.when(obs, F.col("val")).alias("val"),
        # carried-forward values are already rounded (no new arithmetic),
        # so plain round is boundary-safe there; interp needs the quantizer.
        F.round(F.col("val"), 4).alias("val_ffill"),
        _quantize4(interp).alias("val_interp"),
    )


def ewma_user_value(events: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """Per-user EWMA of event values in (ts, event_id) order:
    y_i = (1 - alpha) * y_{i-1} + alpha * x_i, y_0 = x_0 (adjust=False).

    The recurrence is written as an explicit loop with EXACTLY the
    oracle's operation order ((1-a)·y + a·x, then the floor quantizer),
    so the doubles match bit-for-bit across engines. ``pandas.ewm``
    computes the same recurrence faster but through a different fp
    factorization — the production swap once cross-engine parity isn't
    being proven.

    SHARDED dispatch (round 11): grouping by user_id paid the ~1 ms
    per-group applyInPandas tax once per USER (the stateful-operator
    lesson, CLAUDE.md); instead the group key is pmod(user_id, 1024)
    and the shard's frame is sorted by (user_id, ts, event_id) with the
    recurrence resetting on user change — per-user iteration order and
    op order are IDENTICAL (verified by the unchanged oracle hash), but
    the dispatch count drops from n_users to 1024 (and the row loop
    iterates numpy arrays, not pandas Series). Measured 17.6 → 2.1 s
    at sf10 (min-of-2, hash gate green).
    """
    import math

    from pyspark.sql import functions as F

    def _ewma(pdf):
        pdf = pdf.sort_values(["user_id", "ts", "event_id"]).reset_index(
            drop=True
        )
        out, y, last_u = [], 0.0, None
        one_m_a = 1.0 - alpha
        for u, x in zip(pdf["user_id"].to_numpy(), pdf["value"].to_numpy()):
            x = float(x)
            y = x if u != last_u else one_m_a * y + alpha * x
            last_u = u
            out.append(math.floor(y * 10000 + 0.5) / 10000)
        pdf["ewma"] = out
        return pdf[["user_id", "event_id", "ewma"]]

    return (
        events.select("user_id", "event_id", "ts", "value")
        .withColumn("_shard", F.pmod(F.col("user_id"), F.lit(1024)))
        .groupBy("_shard")
        .applyInPandas(_ewma, EWMA_SCHEMA)
    )


TREND_HALF_WINDOW = 12  # hours each side → 25-hour centered frame


def seasonal_decompose_hourly(events: DataFrame) -> DataFrame:
    """Classic additive seasonal decomposition of the per-type hourly
    series: value = trend + seasonal + residual — the moving-average STL
    shape (centered 25 h mean for trend, hour-of-day means of the
    detrended series for the seasonal profile).

    Cross-engine float parity by construction: fixture values carry two
    decimals, so the hourly sum is held as INTEGER centi-units
    (hv = round(100·Σv)), the trend numerator is an integer window sum
    over a FIXED 25-row interior frame (edge hours where the frame is
    short are excluded, the standard MA-decomposition edge rule — the
    den=25 filter also enforces series contiguity), and the detrended
    series stays integer as hv·25 − Σframe. Every double is then derived
    from integers by the same expression on both engines, so the
    floor-quantizer can never straddle an engine-dependent ulp.

    Scale shape: the only corpus-sized stage is the map-side-combined
    (type, hour) aggregation; the trend window runs over the per-type
    HOURLY series (bounded by the collection window, not by rows), the
    seasonal profile is a ≤ types×24-row broadcast, and everything else
    is a projection.
    """
    hourly = (
        events.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / HOUR).cast("long").alias("hour"),
            "value",
        )
        .groupBy("event_type", "hour")
        .agg(F.round(F.sum("value") * 100, 0).cast("long").alias("hv"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rangeBetween(-TREND_HALF_WINDOW, TREND_HALF_WINDOW)
    )
    interior = (
        hourly.withColumn("num", F.sum("hv").over(w))
        .withColumn("den", F.count(F.lit(1)).over(w))
        .filter(F.col("den") == 2 * TREND_HALF_WINDOW + 1)
        .withColumn("hod", F.col("hour") % 24)
        .withColumn("det_units", F.col("hv") * 25 - F.col("num"))
    )
    seasonal = interior.groupBy("event_type", "hod").agg(
        F.sum("det_units").alias("s_units"), F.count(F.lit(1)).alias("s_n")
    )
    seas = F.col("s_units").cast("double") / (F.col("s_n") * 2500.0)
    return (
        interior.join(F.broadcast(seasonal), ["event_type", "hod"])
        .select(
            "event_type",
            "hour",
            _quantize4(F.col("hv") / 100.0).alias("hour_value"),
            _quantize4(F.col("num") / 2500.0).alias("trend"),
            _quantize4(seas).alias("seasonal"),
            _quantize4(F.col("det_units") / 2500.0 - seas).alias("resid"),
        )
    )


def ohlc_hourly(events: DataFrame) -> DataFrame:
    """Per (event_type, hour) OHLC + VWAP-style bars over event values —
    the standard downsampling that turns a tick stream into fixed-grain
    bars.

    open/close are min_by/max_by on (ts, event_id) — single aggregation
    pass, no window, no self-join; ties inside an hour break on event_id
    so the bar is total-order deterministic. One shuffle on the
    low-cardinality (type, hour) key with map-side combine.
    """
    hour = F.floor(F.unix_timestamp("ts") / HOUR).cast("long")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.select(
            "event_type", hour.alias("hour"), "value", "ts", "event_id"
        )
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", key), 4).alias("close"),
            # mean via exact integer cents: a float SUM is order-dependent
            # across engines and round(avg, 4) flips at ulp boundaries
            # (measured: 5 of ~3.5k bars) — fixture values are 2-decimal,
            # so cents are exact and the integer sum is associative.
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long"))
                / 100.0
                / F.count(F.lit(1)),
                4,
            ).alias("vwap"),
        )
    )


HOLT_ALPHA = 0.5  # level smoothing — binary-exact
HOLT_BETA = 0.5   # trend smoothing — binary-exact
HOLT_HORIZON = 24  # forecast this many hours past the series end

HOLT_SCHEMA = (
    "event_type string, n_hours long, level double, trend double,"
    " forecast_24h double"
)


def holt_linear_hourly(events: DataFrame) -> DataFrame:
    """Holt's linear (double-exponential) smoothing of each type's hourly
    value series, plus the 24h-ahead forecast l_n + 24·b_n — the
    trend-aware upgrade of ewma_user_value, and the model-based
    counterpart of hourly_trend_ols' global OLS line.

        l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},   l_1 = y_1, b_1 = 0

    Cross-engine parity: the hourly series is integer centi-units
    (hv = round(100·Σv), like seasonal_decompose), y = hv/100.0 is an
    exact double, α = β = 1/2 are binary-exact, and the recurrence is an
    explicit Python loop in EXACTLY the oracle CTE's operation order —
    0.5·y + 0.5·(l + b), then 0.5·(l_new − l) + 0.5·b — so every
    intermediate double matches DuckDB's bit-for-bit; only the final
    three outputs are quantized.

    Scale: the recurrence is genuinely sequential per key (this is the
    one shape where applyInPandas is the right tool — repo invariant);
    the corpus collapses to |types|·|hours| rows BEFORE the pandas
    stage, keys run in parallel, and the per-key series length is
    bounded by the time axis, not the event volume."""
    import math

    hourly = (
        events.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
            "value",
        )
        .groupBy("event_type", "h")
        .agg(F.round(F.sum("value") * 100, 0).cast("long").alias("hv"))
    )

    def _holt(pdf):
        pdf = pdf.sort_values("h").reset_index(drop=True)
        l = b = None
        for hv in pdf["hv"]:
            y = float(hv) / 100.0
            if l is None:
                l, b = y, 0.0
            else:
                l_new = 0.5 * y + 0.5 * (l + b)
                b = 0.5 * (l_new - l) + 0.5 * b
                l = l_new
        q4 = lambda v: math.floor(v * 10000 + 0.5) / 10000  # noqa: E731
        import pandas as pd

        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_hours": [len(pdf)],
                "level": [q4(l)],
                "trend": [q4(b)],
                "forecast_24h": [q4(l + 24.0 * b)],
            }
        )

    return hourly.groupBy("event_type").applyInPandas(_holt, HOLT_SCHEMA)
