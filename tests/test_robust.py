"""grouped_exact_percentiles vs the naive cumulative definition."""

import random

from pyspark.sql import functions as F

from pleiades_spark.operators.robust import grouped_exact_percentiles


def _naive(rows, ps):
    # rows: (key, v, w) → {(key, p): pv} with pv = min{v: 100·cum >= p·tot}
    out = {}
    keys = {k for k, _, _ in rows}
    for k in keys:
        vs = sorted((v, w) for kk, v, w in rows if kk == k)
        tot = sum(w for _, w in vs)
        for p in ps:
            cum = 0
            for v, w in vs:
                cum += w
                if 100 * cum >= p * tot:
                    out[(k, p)] = v
                    break
    return out


def test_percentiles_match_naive_definition(spark):
    rng = random.Random(7)
    rows = []
    for k in range(3):
        # values spanning multiple 4096-buckets, duplicates, zeros
        for _ in range(200):
            rows.append((k, rng.randrange(0, 50_000), rng.randrange(1, 5)))
    rows.append((9, 0, 1))  # single-value group: every percentile = 0
    per_v = (
        spark.createDataFrame(rows, "k int, v long, w long")
        .groupBy("k", "v")
        .agg(F.sum("w").alias("w"))
    )
    ps = [1, 25, 50, 90, 99, 100]
    got = {
        (r["k"], r["p"]): r["pv"]
        for r in grouped_exact_percentiles(per_v, ["k"], "v", "w", ps).collect()
    }
    assert got == _naive(rows, ps)


def test_percentile_windows_are_bucket_grain(spark):
    """Both windows must sit above aggregations (bucket grain / single
    in-bucket slice), and the per-(key,p) target row must broadcast."""
    import io
    from contextlib import redirect_stdout

    per_v = (
        spark.createDataFrame([(1, i, 1) for i in range(100)], "k int, v long, w long")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        grouped_exact_percentiles(per_v, ["k"], "v", "w", [50]).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
