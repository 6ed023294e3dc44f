"""Large-star/small-star connected components vs union-find ground truth.

The star algorithm exists for the case min-label propagation cannot
handle: component diameter beyond its round budget. So the fixtures
include exactly that — a 300-node path (diameter 299, converges in
O(log² n) star rounds) — plus cliques, stars, parallel/duplicate and
self edges, and isolated pairs.
"""

import warnings

from pleiades_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return sorted((n, find(n)) for n in parent)


def _check(spark, edges, max_iter=30):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = sorted(
        (r["doc_id"], r["cluster"])
        for r in connected_components_star(df, max_iter=max_iter).collect()
    )
    want = _union_find([e for e in edges if e[0] != e[1]])
    assert got == want
    return got


def test_star_cc_long_path(spark):
    """Diameter 299: min-label's default 20 rounds cannot finish this;
    the star contraction must (and in far fewer than 30 rounds)."""
    edges = [(i, i + 1) for i in range(300)]
    got = _check(spark, edges)
    assert got[0] == (0, 0) and got[-1] == (300, 0)


def test_star_cc_mixed_components(spark):
    edges = (
        # clique on 0..4
        [(i, j) for i in range(5) for j in range(i + 1, 5)]
        # star centered high (tests min != center)
        + [(100, 90 + k) for k in range(5)]
        # duplicate + reversed + self edges
        + [(200, 201), (201, 200), (200, 201), (7, 7)]
        # isolated pair
        + [(300, 301)]
    )
    _check(spark, edges)


def test_star_cc_matches_min_label(spark):
    """On a small-diameter graph both algorithms must emit identical
    (doc_id, cluster) rows — the recursive-CTE oracle can't tell them
    apart."""
    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # neither may hit its round budget
        star = sorted(map(tuple, connected_components_star(df).collect()))
        label = sorted(map(tuple, connected_components(df).collect()))
    assert star == label
