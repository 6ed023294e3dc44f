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
