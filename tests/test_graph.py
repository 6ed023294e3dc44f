"""Connected-components unit tests on hand-built graphs."""

from pleiades_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r.doc_id: r.cluster for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_propagates_past_one_hop(spark):
    # a 6-node path: min label must travel the full diameter
    got = _cc(spark, [(6, 5), (5, 4), (4, 3), (3, 2), (2, 1)])
    assert set(got.values()) == {1}


def test_cycle_terminates(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_nonconvergence_warns(spark):
    """Exhausting max_iter before fixpoint must warn, not silently return
    split clusters (a long path needs ~diameter iterations)."""
    import warnings

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(df, max_iter=2)
        assert any("did not converge" in str(w.message) for w in caught)

    # and with enough iterations, no warning
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = {r.doc_id: r.cluster for r in connected_components(df).collect()}
        assert not any("did not converge" in str(w.message) for w in caught)
    assert set(got.values()) == {1}
