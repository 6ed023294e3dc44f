"""Accuracy bound for the approximate-distinct sketch (rows-only query)."""

from pleiades_spark.plans.relational import q_approx_distinct, q_distinct_counts


def test_approx_distinct_within_5pct_of_exact(spark, sf_dir):
    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in q_distinct_counts(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in q_approx_distinct(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, n in exact.items():
        assert abs(approx[flag] - n) / n < 0.05, (flag, approx[flag], n)


def test_sampled_percentiles_error_bound(spark, sf_dir):
    """Bottom-k hash-sample quantiles track the exact percentiles: the
    sample p50 must sit within the exact p40-p60 band (rank error well
    inside O(1/sqrt(k)) for k=500)."""
    from pyspark.sql import functions as F

    from pleiades_spark import catalog
    from pleiades_spark.plans.relational import q_sampled_percentiles

    got = q_sampled_percentiles(spark, sf_dir).collect()[0]
    li = catalog.load(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.expr("percentile(l_extendedprice, array(0.40, 0.60, 0.05, 0.15, 0.85, 0.95))").alias("p")
    ).collect()[0]["p"]
    p40, p60, p05, p15, p85, p95 = exact
    assert p40 <= got["p50"] <= p60
    assert p05 <= got["p10"] <= p15
    assert p85 <= got["p90"] <= p95
