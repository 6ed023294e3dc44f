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


def test_salting_plan_wires_report_to_knobs(spark):
    """Round-8 verdict #7: the skew report must FEED the fixes. Staged
    fixture: one key holding 900 of 1000 rows (skew_ratio ≈ 91) next to
    a uniform control. The plan must flag only the hot key, derive a
    salt factor that spreads it to the p99 key's load, clamp the AQE
    knobs into their sane ranges, and the recommended n_salts must leave
    salted_equi_join's result identical to the plain join (the whole
    point: knobs change the schedule, never the answer)."""
    from pleiades_spark.operators.skew import (
        apply_skew_confs,
        salted_equi_join,
        salting_plan,
    )
    from pleiades_spark.plans.relational import _skew_profile

    fact = spark.createDataFrame(
        [(0, i) for i in range(900)] + [(k, k) for k in range(1, 101)],
        "k long, payload long",
    )
    uniform = spark.createDataFrame(
        [(k, k) for k in range(100)], "k long, payload long"
    )
    report = _skew_profile(fact, "k", "staged.hot").unionByName(
        _skew_profile(uniform, "k", "staged.uniform")
    )
    plan_df = salting_plan(report, n_shuffle_partitions=8)
    plan = {r["key_name"]: r for r in plan_df.collect()}

    hot = plan["staged.hot"]
    assert hot["needs_salting"]
    # max_cnt 900 vs p99≈1 → pow2 spread 1024, clamped to MAX_SALTS
    assert hot["n_salts"] == 64
    # hot partition ≈ 900·8/1000 = 7.2× median → recommend ~half, in [2,5]
    assert hot["aqe_skewed_partition_factor"] == 3
    assert hot["aqe_skewed_partition_threshold_bytes"] == 16 * 1024 * 1024

    uni = plan["staged.uniform"]
    assert not uni["needs_salting"]
    assert uni["n_salts"] == 1
    assert 2 <= uni["aqe_skewed_partition_factor"] <= 5

    # apply + restore: worst-key (most sensitive) confs land on the session
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        )
    }
    try:
        confs = apply_skew_confs(spark, plan_df)
        assert confs["spark.sql.adaptive.skewJoin.enabled"] == "true"
        assert confs["spark.sql.adaptive.skewJoin.skewedPartitionFactor"] == "2"
        assert spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        ) == "2"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # wiring: recommended factor keeps the join EXACT
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(101)], "k long, dname string"
    )
    plain = fact.join(dim, "k").count()
    salted = salted_equi_join(
        fact, dim, "k", F.col("payload"), n_salts=int(hot["n_salts"])
    ).count()
    assert salted == plain == 1000


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


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_table_profile_counts_nulls_and_distincts(spark, tmp_path):
    """Stage events with known nulls/duplicates: the profile must count
    them exactly and keep numeric min/max only for numeric columns."""
    import datetime as dt

    from pleiades_spark.plans.relational import q_table_profile

    d = str(tmp_path / "fx")
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 5, "click", 1.5, None),
        (1, t0, 5, None, 2.5, "{}"),
        (2, t0, None, "view", None, "{}"),
        (3, t0, 7, "click", 2.5, "{}"),
    ]
    _write(spark, f"{d}/events.parquet", rows,
           "event_id long, ts timestamp_ntz, user_id long,"
           " event_type string, value double, props string")
    prof = {r["col_name"]: r for r in q_table_profile(spark, d).collect()}
    assert set(prof) == {"event_id", "ts", "user_id", "event_type",
                         "value", "props"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert prof["user_id"]["n_null"] == 1
    assert prof["event_type"]["n_null"] == 1
    assert prof["value"]["n_null"] == 1
    assert prof["props"]["n_null"] == 1
    assert prof["ts"]["n_distinct"] == 1
    assert prof["event_type"]["n_distinct"] == 2  # click, view
    assert prof["value"]["n_distinct"] == 2  # 1.5, 2.5
    assert prof["value"]["min_num"] == 1.5 and prof["value"]["max_num"] == 2.5
    assert prof["user_id"]["min_num"] == 5.0 and prof["user_id"]["max_num"] == 7.0
    assert prof["event_type"]["min_num"] is None  # strings: no numeric stats


def test_fk_integrity_flags_staged_orphans(spark, tmp_path):
    """A child table with keys missing from its parent must show up with
    the right orphan count and basis-point rate."""
    from pleiades_spark.plans.relational import q_fk_integrity

    d = str(tmp_path / "fx")
    # 3 orders reference customers {1, 2, 99}; customer table has {1, 2}.
    _write(spark, f"{d}/customer.parquet",
           [(1, "a"), (2, "b")], "c_custkey long, c_name string")
    _write(spark, f"{d}/orders.parquet",
           [(10, 1), (11, 2), (12, 99), (13, 99)],
           "o_orderkey long, o_custkey long")
    # minimal other tables so the remaining edges evaluate
    _write(spark, f"{d}/part.parquet", [(1, "p")],
           "p_partkey long, p_name string")
    _write(spark, f"{d}/supplier.parquet", [(1, "s")],
           "s_suppkey long, s_name string")
    _write(spark, f"{d}/lineitem.parquet", [(10, 1, 1), (12, 1, 1)],
           "l_orderkey long, l_partkey long, l_suppkey long")
    got = {r["relation"]: r for r in q_fk_integrity(spark, d).collect()}
    oc = got["orders.custkey->customer"]
    assert (oc["n_child"], oc["n_orphans"]) == (4, 2)
    assert oc["orphan_bp"] == 5000.0  # 2/4 in basis points
    lo = got["lineitem.orderkey->orders"]
    assert (lo["n_child"], lo["n_orphans"]) == (2, 0)


def test_salting_plan_rejects_non_pow2_max_salts(spark):
    """A non-power-of-two max_salts would fall through the when-chain to
    a raw literal, breaking the pmod-balance contract — fail fast, and
    accept any pow2 (candidates derive from max_salts by doubling, so
    values above the old hard-coded 64 work too)."""
    import pytest

    from pleiades_spark.operators.skew import salting_plan
    from pleiades_spark.plans.relational import _skew_profile

    fact = spark.createDataFrame(
        [(0, i) for i in range(900)] + [(k, k) for k in range(1, 101)],
        "k long, payload long",
    )
    report = _skew_profile(fact, "k", "staged.hot")
    for bad in (0, 1, 3, 100, 127):
        with pytest.raises(ValueError, match="power of two"):
            salting_plan(report, max_salts=bad)
    # pow2 above the old 64 cap: raw spread ≈ 900/9.9 ≈ 91 → 128, which
    # the old chain clamped to 64 — now reachable
    row = salting_plan(report, n_shuffle_partitions=8, max_salts=1024).collect()[0]
    assert row["n_salts"] == 128


def test_blocking_audit_counts_staged_collisions(spark):
    """The audit must price a staged blocking collapse exactly: 4 docs
    with identical text land in ONE bucket per chunk (C(4,2)=6 candidate
    pairs, max_bucket 4); 3 unrelated docs stay singletons. Computed off
    injected signatures via the same groupBy shape the gate uses."""
    from pyspark.sql import functions as F

    from pleiades_spark.operators.dedup import simhash128_signature

    same = "alpha beta gamma delta " * 10
    docs = spark.createDataFrame(
        [(i, same) for i in range(4)]
        + [(10 + j, f"unrelated{j} " + " ".join(f"w{j}x{t}" for t in range(30)))
           for j in range(3)],
        "doc_id long, text string",
    )
    sigs = simhash128_signature(docs)
    chunks = sigs.select(
        F.posexplode(
            F.array(F.col("h0"), F.col("h1"), F.col("h2"), F.col("h3"))
        ).alias("chunk_idx", "chunk_val")
    )
    audit = (
        chunks.groupBy("chunk_idx", "chunk_val")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("chunk_idx")
        .agg(
            F.max("cnt").alias("max_bucket"),
            F.sum(F.shiftright(F.col("cnt") * (F.col("cnt") - F.lit(1)), 1))
            .alias("candidate_pairs"),
        )
    )
    for r in audit.collect():
        assert r["max_bucket"] == 4          # the 4 identical docs
        assert r["candidate_pairs"] == 6     # C(4,2); singletons add 0
