"""Contracts of the CMS / Bloom sketches (operators/sketch.py).

The gate proves cross-engine determinism; these prove the sketches'
mathematical guarantees hold — CMS never underestimates, Bloom never
false-negatives — which determinism alone wouldn't catch.
"""

from pyspark.sql import functions as F

from pleiades_spark.operators.sketch import (
    bloom_build,
    bloom_prune,
    cms_build,
    cms_estimate,
)


def test_cms_estimate_never_below_true_count(spark, sf_dir):
    """CMS is one-sided: collisions only ADD, so est >= exact for every
    key — and est == exact for most keys at this width/cardinality."""
    from pleiades_spark import catalog

    li = catalog.load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("k")
    )
    sketch = cms_build(li, F.col("k"))
    est = cms_estimate(li.distinct(), "k", sketch)
    exact = li.groupBy("k").agg(F.count(F.lit(1)).alias("true_cnt"))
    joined = est.join(exact, "k").collect()
    assert joined, "no keys estimated"
    assert all(r.est >= r.true_cnt for r in joined)
    # total sketch mass equals total rows (nothing lost, only smeared)
    depth = 4
    total = sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    n = li.count()
    assert len(total) == depth and all(r.s == n for r in total)


def test_bloom_prune_no_false_negatives(spark, sf_dir):
    """Every fact row whose key IS in the dim set must survive the prune."""
    from pleiades_spark import catalog

    orders = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    dim = (
        orders.filter(F.col("o_totalprice") > 300_000)
        .select(F.col("o_orderkey").cast("string").alias("k"))
        .distinct()
    )
    fact = li.select(F.col("l_orderkey").cast("string").alias("k"))
    bloom = bloom_build(dim, F.col("k"))
    pruned = bloom_prune(fact, F.col("k"), bloom)
    true_matches = fact.join(dim, "k", "left_semi").count()
    surviving_true = pruned.join(dim, "k", "left_semi").count()
    assert surviving_true == true_matches
    # and the prune is a subset of the fact side
    assert pruned.count() <= fact.count()
