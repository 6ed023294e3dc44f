"""Skew-report and join-size-estimate diagnostics: the estimates must
track ground truth computed the expensive way on the small fixture."""

from pyspark.sql import functions as F

from pleiades_spark import catalog


def test_skew_report_matches_exact_distribution(spark, sf_dir):
    from pleiades_spark.plans.relational import q_skew_report

    rows = {r["key_name"]: r for r in q_skew_report(spark, sf_dir).collect()}
    assert set(rows) == {
        "lineitem.l_partkey", "lineitem.l_suppkey", "orders.o_custkey",
        "events.user_id", "events.event_type",
    }
    # Cross-check one audit against a direct computation.
    ev = catalog.load(spark, sf_dir, "events")
    counts = [
        r["cnt"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    ]
    r = rows["events.event_type"]
    assert r["n_rows"] == sum(counts)
    assert r["n_keys"] == len(counts)
    assert r["max_cnt"] == max(counts)
    avg = sum(counts) / len(counts)
    assert abs(r["skew_ratio"] - max(counts) / avg) < 1e-3
    assert r["n_hot_10x"] == sum(1 for c in counts if c > 10.0 * avg)
    # event_type is the low-cardinality key: its mean count dwarfs the
    # high-cardinality keys' (sanity that the report orders keys usefully)
    assert r["avg_cnt"] > rows["events.user_id"]["avg_cnt"]


def test_join_size_estimate_tracks_exact_cardinality(spark, sf_dir):
    from pleiades_spark.plans.relational import q_join_size_estimate

    est = {
        r["join_name"]: r["est_rows"]
        for r in q_join_size_estimate(spark, sf_dir).collect()
    }
    li = catalog.load(spark, sf_dir, "lineitem")
    orders = catalog.load(spark, sf_dir, "orders")
    ev = catalog.load(spark, sf_dir, "events")
    exact = {
        "lineitem*orders@orderkey": li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"]
        ).count(),
        "lineitem*lineitem@partkey": li.alias("a")
        .join(li.alias("b"), F.col("a.l_partkey") == F.col("b.l_partkey"))
        .count(),
        "events*events@user_id": ev.alias("a")
        .join(ev.alias("b"), F.col("a.user_id") == F.col("b.user_id"))
        .count(),
    }
    # 1/16 key sample -> generous 60% relative envelope; the point of the
    # gate hash is determinism, the point HERE is that the estimator is
    # actually wired to the join it claims to price.
    for name, ex in exact.items():
        assert ex > 0
        assert abs(est[name] - ex) <= 0.6 * ex, (name, est[name], ex)
