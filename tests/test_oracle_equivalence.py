"""Every declared query hash-matches its DuckDB oracle at sf0.001.

This is a fast local replica of the driver's t2 gate (which runs at
sf0.01); tools/check_oracle.py runs the same comparison at any SF.
"""

import pytest

from pleiades_spark.plans import collect_queries
from tests.util import assert_oracle_match

QUERIES = collect_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    if q.oracle is None:
        assert sdf.count() >= 0  # rows-only contract
        return
    assert_oracle_match(sdf, duck, q.oracle)
