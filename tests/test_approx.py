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


def test_containment_lsh_recall_vs_exact(spark, sf_dir):
    """The bottom-k containment estimator must recover ≥90 % of the
    exact join's high-confidence pairs (true C ≥ 0.9 — where the
    hypergeometric tail gives ≥95 % per-pair survival at k=32), and any
    extra pair it emits must be a genuine near-threshold case (true
    containment ≥ 0.7), not an artifact."""
    from pleiades_spark import catalog
    from pleiades_spark.operators.dedup import (
        containment_lsh_pairs,
        prefix_containment_pairs,
    )

    docs = catalog.load(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b): r.containment
        for r in prefix_containment_pairs(docs).collect()
    }
    approx = {(r.doc_a, r.doc_b) for r in containment_lsh_pairs(docs).collect()}
    hi = {p for p, c in exact.items() if c >= 0.9}
    assert hi, "fixture should contain high-containment pairs"
    recall_hi = len(hi & approx) / len(hi)
    assert recall_hi >= 0.9, (recall_hi, len(hi), len(approx))

    extras = approx - set(exact)
    if extras:
        # brute-verify the estimator's extra pairs: true containment of
        # doc_a's shingle set in doc_b must be near the threshold
        from pleiades_spark.functions.text import word_shingles
        from pyspark.sql import functions as F

        sh = {
            r.doc_id: set(r.sh)
            for r in docs.select(
                "doc_id", word_shingles(F.col("text")).alias("sh")
            ).collect()
        }
        for a, b in extras:
            true_c = len(sh[a] & sh[b]) / len(sh[a])
            assert true_c >= 0.7, (a, b, true_c)


def test_containment_candidate_observation_fires(spark, sf_dir):
    """Both containment joins must report raw candidate volume through
    an attached Observation — the production alarm for the
    Zipfian-pruning assumption (round-6 sf10 lesson)."""
    from pyspark.sql import Observation

    from pleiades_spark import catalog
    from pleiades_spark.operators.dedup import (
        containment_lsh_pairs,
        minhash_lsh_pairs,
        prefix_containment_pairs,
        prefix_jaccard_pairs,
    )

    docs = catalog.load(spark, sf_dir, "documents")
    for op in (containment_lsh_pairs, prefix_containment_pairs,
               prefix_jaccard_pairs, minhash_lsh_pairs):
        obs = Observation(f"cand_{op.__name__}")
        op(docs, candidate_observation=obs).collect()
        assert obs.get["candidate_rows"] > 0, op.__name__


def test_prefix_containment_quadratic_guard(spark, sf_dir):
    """The exact containment join is demoted to a bounded ground truth:
    corpora above the guard must raise unless explicitly allowed."""
    import pytest
    from pleiades_spark import catalog
    from pleiades_spark.operators import dedup as D

    docs = catalog.load(spark, sf_dir, "documents")
    orig = D.QUADRATIC_GUARD_ROWS
    D.QUADRATIC_GUARD_ROWS = 10  # fixture has ~50 docs
    try:
        with pytest.raises(ValueError, match="prefix_containment_pairs"):
            D.prefix_containment_pairs(docs).collect()
        # explicit override still works
        assert D.prefix_containment_pairs(docs, allow_quadratic=True) is not None
    finally:
        D.QUADRATIC_GUARD_ROWS = orig


def test_containment_probe_df_cap_drops_hot_keeps_rare(spark):
    """Round-10 hot-hash guard (verdict r9 #1): with max_probe_df set,
    a document whose m rarest sample hashes are ALL corpus-hot
    (boilerplate shared by > cap docs) loses its candidates, while
    pairs found through rarer probes are untouched — and the uncapped
    run still finds both."""
    from pleiades_spark.operators.dedup import containment_lsh_pairs

    boiler = " ".join(f"tpl{i} tpl{i} common" for i in range(30))
    rare_a = " ".join(f"raretok{i} x{i} y{i}" for i in range(30))
    rows = [(i, boiler, len(boiler)) for i in range(12)]  # hot templates
    rows += [(100, rare_a, len(rare_a)), (101, rare_a + " tail0 tail1 tail2", 1)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")

    uncapped = {
        (r.doc_a, r.doc_b)
        for r in containment_lsh_pairs(docs, max_probe_df=None).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in containment_lsh_pairs(docs, max_probe_df=8).collect()
    }
    # uncapped finds boilerplate-pair candidates AND the rare pair
    assert (100, 101) in uncapped
    assert any(a < 12 and b < 12 for a, b in uncapped)
    # the cap (8 < 12 boilerplate docs) removes every boilerplate-probe
    # candidate but keeps the rare-probe pair
    assert (100, 101) in capped
    assert not any(a < 12 and b < 12 for a, b in capped)


def test_containment_cap_c_eff_recomputed_from_survivors(spark):
    """ADVICE r10 regression pin: when the df cap drops SOME of a doc's
    rarest probes, c_eff must be recomputed from the SURVIVING count.
    Construction: doc 100 = 20-word template (hot: shared by 32 docs,
    df ≫ cap) + 'ua ub uc'; doc 101 shares the template and ONLY the
    'tmpl19 ua'-boundary shingle of the unique tail. 100's p = 6 rarest
    sample probes = its 3 unique-tail shingles + 3 hot ones; the cap
    drops the hot 3, and exactly ONE survivor hits 101. The round-10
    logic kept c_eff at the pre-cap value max(1, p − (m−1)) = 2 > 1 hit
    and silently dropped the pair; the fix (c_eff = max(1, surv −
    (m−1)) = 1) keeps it, and the verify stage confirms true
    containment ≈ 0.83 ≥ 0.8. Capped output stays a subset of the
    uncapped one."""
    from pleiades_spark.operators.dedup import containment_lsh_pairs

    template = " ".join(f"tmpl{i}" for i in range(20))
    rows = [(i, f"{template} filler{i}a filler{i}b", 0) for i in range(30)]
    rows.append((100, template + " ua ub uc", 0))
    rows.append((101, template + " ua vb vc", 0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in containment_lsh_pairs(docs, max_probe_df=None).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in containment_lsh_pairs(docs, max_probe_df=8).collect()
    }
    assert (100, 101) in uncapped
    assert (100, 101) in capped, "partially-hot probes zeroed the doc's candidates"
    assert capped <= uncapped
