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
