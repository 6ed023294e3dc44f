"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints FOUR JSON lines: a compact summary {"metric": ..., "value":
total_sec, "unit": "sec", "sf": ..., "n_queries": N}, then the full line
{"metric": ..., "value": ..., "unit": "sec", "queries": {name: sec},
"sf": ...} for humans and tools/scale_report.py, then the compact
summary again as a fallback, then a FINAL line = compact summary + a
"queries" subset of the slowest queries packed into 1800 bytes. The
driver keeps a 2000-byte TAIL of stdout and parses the last JSON line
it sees — round 6's summary-first change still left the truncated
105-entry map as the tail, so BENCH_r07.json recorded parsed=null, and
rounds 12-13 ended with the compact line so PERF got no per-query map
at all (per_query: {}). The 152 query names alone are 2501 bytes, so a
complete full-map final line can never fit that window; the slowest-N
subset is the largest per-query view the driver can physically parse.
Full per-query timings AND medians also go to the sidecar
$PLEIADES_BENCH_DETAIL (default bench_detail.json).

Each query executes end-to-end via the noop sink (full plan runs, no
driver-side result transfer skewing the number). A warmup query first
absorbs JVM/codegen startup.

Protocol since round 13 (measurement fixes of the optimization round,
documented with their A/B evidence in OPTIMIZATION_r13.md):

1. Every query gets ONE untimed warm-up rep (plan compilation, codegen
   cache, once-per-fixture staged artifacts) before its timed reps —
   the round-12 verdict's own recommendation; the r12 headline "+23 %"
   decomposed entirely into cold-state drift.
2. Per-query hygiene AFTER each query, outside every timed region —
   clearCache() + one explicit JVM GC, the same discipline
   bench_full.py has carried since round 10. Without it the run
   accumulates operator-internal persisted frames, unreaped shuffle
   files and retired streaming state-store providers across 152
   queries × ~3 executions in one JVM; an A/B on this box measured the
   SAME code at 383.9 s contaminated vs 336 s with hygiene, with
   individual mid-list queries inflated up to 17×. The hygiene
   releases finished queries' state only — it never pre-computes or
   caches anything a later timed rep could reuse.
3. Reported value = MIN of the timed reps (2; 3 for the MIN_OF_3
   staging/iterative set); the per-query MEDIANS ride along in the
   full JSON line as "queries_median". Min, not median: this box
   suffers rare external stalls (isolated 8-rep runs of the same query
   recorded [3.9, 4.0, 7.3, 60.9, 2.3, 2.4] — a 25× single-rep spike
   with no code or data change; the r11 and r12 verdicts hit the same
   ~60 s artifact and called it run-context inflation). A median of 2
   eats a stall with probability ~2p, the min with ~p²; min is also
   the statistic every pre-r13 BENCH_rN.json used, so the
   round-over-round series stays comparable. The GC share that min
   hides is visible in queries_median.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pleiades_spark.plans import collect_queries  # noqa: E402
from pleiades_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship streaming-analog aggregation, the heavy
# relational joins/aggs/windows, and the LLM-pipeline extensions.
HEADLINE = [
    "counters_rollup",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "order_fill_rate",
    "customer_running_total",
    "above_avg_lineitems",
    "distinct_counts",
    # TPC-H completion (round 2)
    "forecast_revenue",
    "product_type_profit",
    "returned_item_revenue",
    "large_volume_customers",
    "waiting_suppliers",
    # LLM-pipeline extensions (present from M5 on; skipped if absent)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_cosine_brute",
    "ivf_knn",
    "text_quality_scores",
    "word_frequency_topk",
    "word_frequency_salted",
    "sessionization",
    "asof_join_signup",
    "multimodal_features",
    # training-corpus operators (round 2)
    "doc_chunks",
    "tfidf_top_terms",
    "bigram_counts",
    "benchmark_decontam",
    "sequence_packing",
    "corpus_shuffle_shards",
    # sketch family (round 2)
    "heavy_hitters_cms",
    "bloom_semi_prune",
    # round 6: production xxhash64 hash family + exact verify
    "bloom_semi_prune_prod",
    # time series + model-based scoring + incremental dedup (round 2)
    "timeseries_gapfill",
    "value_anomalies",
    "bigram_lm_scores",
    "dedup_incremental",
    "pq_quantization",
    "lineitem_cube",
    # round 3: TPC-H completion + repetition filters + mixture/windows
    "market_share",
    "parts_supplier_counts",
    "dominant_suppliers",
    "gopher_repetition",
    "mixture_sample",
    "rolling_7day",
    "quality_deciles",
    "salted_supplier_join",
    "snapshot_diff",
    "bpe_pair_counts",
    "hard_negatives",
    "eval_sample",
    # round 3 (cont.): cosine-LSH dedup, learned-filter shape, layout key
    "dedup_embedding_srp",
    "quality_classifier",
    "zorder_rank",
    # round 4: corpus balancing/sampling + span dedup + forward as-of
    "domain_cap",
    "weighted_sample",
    "dup_span_stats",
    "asof_join_forward",
    "textrank_keywords",
    "source_divergence",
    "inverted_index",
    "data_quality_report",
    "jl_projection",
    "dup_span_removal",
    "vocab_encode",
    "ohlc_hourly",
    "kmv_distinct",
    "zipf_fit",
    "dedup_jaccard_prefix",
    "bootstrap_mean_chars",
    "psi_drift",
    "variant_extract",
    "collection_functions",
    "window_function_breadth",
    "weighted_median",
    "user_burstiness",
    "trending_counters",
    "rfm_segments",
    "event_transitions",
    "chi_square_lang_source",
    "dataset_fingerprint",
    "higher_moments",
    "sampled_percentiles",
    "grouped_sampled_quantiles",
    # round 5: fact-to-fact temporal join + star-contraction components
    # + seasonal decomposition
    "interval_join_bucketized",
    "dedup_clusters_star",
    "seasonal_decompose",
    "streaming_sessions",
    "type_reachability",
    "value_mad_outliers",
    "time_weighted_avg",
    "conversion_lag",
    "hourly_trend_ols",
    # round 5 (cont.): retrieval + series diagnostics + graph centrality
    "bm25_retrieval",
    "hourly_autocorr",
    "cusum_changepoint",
    "pagerank_types",
    "token_triangles",
    "holt_linear",
    "type_crosscorr",
    "cdc_apply",
    "seasonal_anomalies",
    "rolling_kmv_users",
    "lsh_recall_audit",
    "token_communities",
    "kfold_splits",
    # round 6: containment dedup + novelty + source overlap + attribution
    "dedup_containment",
    "doc_novelty",
    "source_overlap_minhash",
    "attribution_last_touch",
    "split_leakage_audit",
    "langid_confusion",
    # round 7: approximate containment dedup (the 100 TB scale path)
    "dedup_containment_lsh",
    # round 7: two-level IVF embedding dedup (coarse quantizer)
    "dedup_embedding_ivf2",
    # round 7: IVFADC search (coarse probe + PQ-coded ADC ranking)
    "ivf_adc_knn",
    # round 7: hybrid retrieval (RRF fusion of BM25 + quality prior)
    "hybrid_rrf_retrieval",
    # round 7: streaming near-dedup vs the static LSH index
    "streaming_lsh_dedup",
    # round 7: 64-bit simhash twin (16-bit chunk blocking)
    "dedup_simhash_wide",
    # round 7: shuffle diagnostics (skew profile + sampled join sizing)
    "skew_report",
    "join_size_estimate",
    # round 7: KMV set algebra (cross-source cardinality overlap)
    "kmv_source_set_ops",
    # round 7: MMR diversified rerank (post-ANN diversification)
    "mmr_rerank",
    # round 7: experimentation suite (hash-split A/B readouts)
    "ab_welch",
    "ab_cuped",
    "ab_srm",
    "ab_mannwhitney",
    "ab_winsorized",
    "ab_proportion",
    "ab_quantile_effect",
    "streaming_ab_welch",
    # round 7: data-quality layer (profile + referential audit)
    "table_profile",
    "fk_integrity",
    # round 8: exactly-once audit (streaming sink vs batch recompute)
    "counters_reconcile",
    # round 8: exact-recall simhash (1-bit-flip multi-probe, brute oracle)
    "dedup_simhash_wide_exact",
    # round 8: skew report wired to salting/AQE knobs
    "salting_plan",
    # round 8: deterministic Lloyd's k-means fit (hash-gated codebook)
    "kmeans_lloyd",
    # round 9: production fuzzy-match grain (grouped name pairs + counts;
    # the row-expanded fuzzy_name_pairs is quadratic-guarded now)
    "fuzzy_name_groups",
    # round 9: blocking-index occupancy audit (pre-join candidate alarm)
    "blocking_audit",
    # round 10: linear-output embedding dedup — the (vec_id, rep_id)
    # contract for high-multiplicity corpora where pair output is
    # quadratic in duplicate multiplicity
    "dedup_embedding_reps",
    # round 11: text-side linear-output dedup (doc reps grain) + the
    # keep-best corpus keep-list over it
    "doc_dedup_reps",
    "dedup_keep_best_reps",
    # round 12: the production nightly (persisted parquet star index,
    # O(increment) run), its embedding-modality twin, and the
    # horizon-bounded streaming dedup (O(window) state)
    "doc_dedup_reps_persisted",
    "dedup_embedding_reps_incr",
    "dedup_embedding_reps_persisted",
    "stateful_dedup_horizon",
    # round 13: streaming reps assignment against the persisted star
    # index (linear-in-stream-volume twin of the batch nightly) + the
    # per-arrival probe grain
    "streaming_doc_reps",
    "streaming_doc_reps_probe",
    "streaming_emb_reps",
    "streaming_emb_reps_probe",
    # round 13 (cont.): continuous corpus ingestion + nightly tombstone
    # reconcile — the e2e streaming twin of the corpus personality
    "streaming_corpus",
    "streaming_corpus_tombstones",
    "streaming_corpus_final",
]

# Queries that get a THIRD timed rep (iterative driver-loop and
# staged-micro-batch classes — higher per-rep variance even after the
# round-13 untimed warmup absorbs staging/bootstrap). History:
# (a) iterative driver-loop queries — many small jobs, per-job GC/compile
# jitter compounds; (b) staged-micro-batch streaming gates — run 1 pays
# temp-dir staging + checkpoint bootstrap (round-8 idle re-measure:
# streaming_sessions rep sequence 6.7 → 3.76 → 3.70; the r07 "+14%
# regression" was exactly this); (c) the two small grouped-percentile
# queries whose r07 drift (+26%/+15%) replayed as warmup jitter at idle
# (steady state within 6%/2% of r06 — see PLANS.md round-8 note).
MIN_OF_3 = {
    "token_triangles",
    "pagerank_types",
    "type_reachability",
    "token_communities",
    "dedup_clusters_star",
    "streaming_sessions",
    "streaming_lsh_dedup",
    "streaming_ab_welch",
    "counters_reconcile",
    "grouped_sampled_quantiles",
    "weighted_median",
    # round 12: first rep pays the once-per-fixture staged artifact
    # (event staging for the horizon gate; star-index bootstrap for the
    # persisted nightlies) — min-of-3 reads the steady state
    "stateful_dedup_horizon",
    "doc_dedup_reps_persisted",
    "dedup_embedding_reps_persisted",
    # round 13: first rep pays doc staging + index bootstrap
    "streaming_doc_reps",
    "streaming_doc_reps_probe",
    "streaming_emb_reps",
    "streaming_emb_reps_probe",
    "streaming_corpus",
    "streaming_corpus_tombstones",
    "streaming_corpus_final",
}


TAIL_LINE_BUDGET = 1800  # driver tail window is 2000 bytes; leave room
# for the preceding compact fallback line so BOTH parse from the tail.


def tail_line(timings: dict[str, float], total: float, sf: float) -> str:
    """The driver-facing final stdout line: compact summary + a
    "queries" subset of the slowest queries packed into
    TAIL_LINE_BUDGET bytes (all 152 names alone exceed the driver's
    2000-byte tail window, so this is the largest per-query view it
    can physically parse). Values rounded to 2 decimals."""
    tail_obj = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": {},
    }
    budget = TAIL_LINE_BUDGET - len(json.dumps(tail_obj, separators=(",", ":")))
    shown: dict[str, float] = {}
    for k, v in sorted(timings.items(), key=lambda kv: -kv[1]):
        v2 = round(v, 2)
        # per-entry cost: '"name":val' plus a separating comma
        cost = len(json.dumps({k: v2}, separators=(",", ":"))) - 1
        if cost > budget:
            continue
        shown[k] = v2
        budget -= cost
    tail_obj["queries"] = shown
    return json.dumps(tail_obj, separators=(",", ":"))


def main() -> None:
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("pleiades_bench")
    registry = collect_queries()

    # Warmup: JVM + codegen + parquet footer caches.
    registry["counters_rollup"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in HEADLINE:
        q = registry.get(name)
        if q is None:
            continue
        # warmup + MIN of the timed reps (round 13, see module
        # docstring): rep 0 is untimed — it absorbs plan compilation,
        # codegen cache misses, and any once-per-fixture staged
        # artifacts (the MIN_OF_3 class). The per-query median rides
        # along in the full JSON line for steady-state-GC transparency.
        runs = 3 if name in MIN_OF_3 else 2
        try:
            q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timed = []
            for _ in range(runs):
                t0 = time.time()
                q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                timed.append(time.time() - t0)
            timings[name] = round(min(timed), 3)
            medians[name] = round(statistics.median(timed), 3)
        finally:
            # Release the finished query's state OUTSIDE the timed region
            # (bench_full.py's round-10 hygiene, see module docstring):
            # clearCache drops operator-internal persisted frames; the
            # explicit GC lets ContextCleaner reap now-unreferenced
            # shuffle files and lets retired streaming state-store
            # providers unload, so query N+1 is measured on a clean JVM
            # instead of inheriting query N's heap.
            try:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass

    total = round(sum(timings.values()), 3)
    compact = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "n_queries": len(timings),
        }
    )
    # Round-14 stdout protocol (VERDICT r13 item 1: restore
    # driver-parseable per-query output). The driver captures a
    # 2000-byte TAIL ring buffer and json-parses the LAST line
    # (BENCH_r07.json parsed=null: a map-final line whose start fell
    # outside the window is unparseable; BENCH_r08+ parsed the short
    # final line). The 152 query names alone are 2501 bytes, so NO
    # complete full-map line can ever end the stdout and still parse —
    # instead the FINAL line is the compact summary plus a "queries"
    # subset of the SLOWEST queries packed into a hard 1800-byte line
    # budget (the perf-relevant cells; ~55-70 queries, everything
    # cheaper is sub-second at sf0.1). The full map still goes out on
    # line 2 (all queries, 2 decimals) and, with 3-decimal values and
    # per-query medians, to the sidecar JSON $PLEIADES_BENCH_DETAIL
    # (default bench_detail.json) per the same verdict item. Nothing is
    # removed or renamed: line 2 carries every entry; the final line is
    # a driver-window-sized view of it.
    print(compact, flush=True)
    full_line = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in timings.items()},
            "sf": sf,
        },
        separators=(",", ":"),
    )
    print(full_line, flush=True)

    detail_path = os.environ.get("PLEIADES_BENCH_DETAIL", "bench_detail.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(
                {
                    "metric": "headline_queries_total_runtime",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "queries_median": medians,
                    "sf": sf,
                    "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
                },
                f,
                indent=1,
            )
    except OSError:
        pass  # read-only CWD: stdout lines still carry everything but medians

    # Compact fallback immediately before the final line (both fit the
    # 2000-byte window together: <=1800 + ~115 + newlines), then the
    # subset-map FINAL line the driver parses.
    print(compact, flush=True)
    print(tail_line(timings, total, sf), flush=True)


if __name__ == "__main__":
    main()
