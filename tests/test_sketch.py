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


def test_bloom_prod_hash_family_no_false_negatives(spark, sf_dir):
    """The xxhash64 production family keeps Bloom's one-sided guarantee:
    build + probe with h32_prod (not oracle-replayable) must still pass
    every true match — which is exactly why bloom_semi_prune_prod can
    carry a FULL value gate (the exact verify join removes the only
    hash-family-dependent rows, the false positives)."""
    from pleiades_spark import catalog
    from pleiades_spark.functions.hashing import h32_prod
    from pleiades_spark.operators.sketch import (
        bloom_bits_for,
        bloom_prune_words,
        bloom_words_from_hashes,
    )

    orders = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    dim = (
        orders.filter(F.col("o_totalprice") > 300_000)
        .select(F.col("o_orderkey").cast("string").alias("k"))
        .distinct()
    )
    hashes = [r["h"] for r in dim.select(h32_prod(F.col("k")).alias("h")).collect()]
    assert all(0 <= h < 2**32 for h in hashes)  # h32 range contract
    bits = bloom_bits_for(len(hashes))
    words = bloom_words_from_hashes(hashes, bits)
    fact = li.select(F.col("l_orderkey").cast("string").alias("k"))
    pruned = bloom_prune_words(fact, F.col("k"), words, bits, hfn=h32_prod)
    true_matches = fact.join(dim, "k", "left_semi").count()
    surviving_true = pruned.join(dim, "k", "left_semi").count()
    assert surviving_true == true_matches
    assert pruned.count() <= fact.count()


def test_kmv_sketch_is_mergeable(spark, sf_dir):
    """The property that makes KMV a real distributed sketch: merging
    per-partition sketches (union hashes, keep k smallest) yields the
    same estimate as sketching the whole group."""
    from pyspark.sql import functions as F

    from pleiades_spark import catalog
    from pleiades_spark.operators.sketch import KMV_K, kmv_distinct

    ev = catalog.load(spark, sf_dir, "events")
    whole = {
        r["grp"]: (r["est_distinct"], r["n_min"])
        for r in kmv_distinct(ev, "event_type", F.col("user_id").cast("string")).collect()
    }
    # split into two halves, sketch each, merge driver-side
    h1 = ev.filter(F.col("event_id") % 2 == 0)
    h2 = ev.filter(F.col("event_id") % 2 == 1)
    from pleiades_spark.functions.hashing import h32

    def hashes(df):
        out = {}
        for r in (
            df.select(F.col("event_type").alias("g"), h32(F.col("user_id").cast("string")).alias("h"))
            .distinct()
            .collect()
        ):
            out.setdefault(r["g"], set()).add(r["h"])
        return out

    a, b = hashes(h1), hashes(h2)
    for g in whole:
        merged = sorted(a.get(g, set()) | b.get(g, set()))[:KMV_K]
        n_min = len(merged)
        if n_min < KMV_K:
            est = float(n_min)
        else:
            est = 63.0 * 2.0 ** 32 / merged[-1]
        assert round(est, 4) == whole[g][0]
        assert n_min == whole[g][1]


def test_kmv_group_sketch_salted_equals_global_kmin(spark, sf_dir):
    """The salted two-stage k-min (scale path: no single task sorts a
    whole group's hash stream) must return EXACTLY the global k
    smallest distinct hashes per group."""
    from pyspark.sql import functions as F

    from pleiades_spark import catalog
    from pleiades_spark.functions.hashing import h32
    from pleiades_spark.operators.sketch import KMV_K, kmv_group_sketch

    docs = catalog.load(spark, sf_dir, "documents")
    got = {}
    for r in kmv_group_sketch(docs, "lang", F.col("text")).collect():
        got.setdefault(r["grp"], []).append(r["h"])
    exact = {}
    for r in (
        docs.select(F.col("lang").alias("g"), h32(F.col("text")).alias("h"))
        .distinct()
        .collect()
    ):
        exact.setdefault(r["g"], set()).add(r["h"])
    assert set(got) == set(exact)
    for g, hs in got.items():
        assert sorted(hs) == sorted(exact[g])[: KMV_K]


def test_kmv_pair_set_ops_tracks_exact_cardinalities(spark, sf_dir):
    """Union/intersection ESTIMATES from the pair set-ops must land
    within KMV's ~1/sqrt(k) error envelope of the exact distinct
    counts (checked driver-side on the small fixture)."""
    from pyspark.sql import functions as F

    from pleiades_spark import catalog
    from pleiades_spark.functions.hashing import h32
    from pleiades_spark.functions.text import word_shingles
    from pleiades_spark.operators.sketch import (
        kmv_group_sketch,
        kmv_pair_set_ops,
    )

    docs = catalog.load(spark, sf_dir, "documents")
    shingled = docs.select(
        "source", F.explode(word_shingles(F.col("text"))).alias("t")
    )
    est = {
        (r["ga"], r["gb"]): (r["est_union"], r["est_inter"], r["est_jaccard"])
        for r in kmv_pair_set_ops(kmv_group_sketch(shingled, "source", F.col("t"))).collect()
    }
    assert len(est) > 0
    exact = {}
    for r in (
        shingled.select(F.col("source").alias("g"), h32(F.col("t")).alias("h"))
        .distinct()
        .collect()
    ):
        exact.setdefault(r["g"], set()).add(r["h"])
    # Spot-check every pair: union within 40% rel, jaccard within 0.25 abs
    # (k=64 -> sigma ~ 12.5%; generous bounds keep the test deterministic-
    # robust across fixture vintages).
    for (ga, gb), (eu, ei, ej) in est.items():
        u = len(exact[ga] | exact[gb])
        i = len(exact[ga] & exact[gb])
        j = i / u if u else 0.0
        assert abs(eu - u) <= max(0.4 * u, 2.0), (ga, gb, eu, u)
        assert abs(ej - j) <= 0.25, (ga, gb, ej, j)
        assert abs(ei - i) <= max(0.4 * u, 2.0), (ga, gb, ei, i)
