"""Recall audits for the approximate operators against their exact ground
truths (VERDICT r01 next-round items 3 and 4).

The approximate paths (KMeans-fit IVF ANN, MinHash LSH) are the 100 TB
designs; these tests pin their quality so a tuning change that silently
destroys recall fails CI, not production.
"""

import pytest

from pleiades_spark import catalog
from pleiades_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from pleiades_spark.operators.similarity import (
    fit_ivf_codebook,
    ivf_assign_with_codebook,
    ivf_knn_fitted,
    knn_brute,
)

SF_DIR = "/root/testdata/sf0.01"  # per-VERDICT: audit at sf0.01


@pytest.fixture(scope="module")
def embeddings(spark):
    return catalog.load(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def documents(spark):
    return catalog.load(spark, SF_DIR, "documents").cache()


def _pair_set(df):
    return {(r[0], r[1]) for r in df.collect()}


def test_fitted_ivf_recall_at_k(embeddings, spark):
    """KMeans-fit IVF must reach recall@8 ≥ 0.9 vs brute.

    nprobe calibration note: the fixture embeddings are near-uniform
    random (brute top-8 cosines are 0.24–0.49 — noise level), so there is
    no cluster structure for the codebook to exploit and recall@8 needs
    nprobe=12 of 16 buckets. On real embedding corpora (which cluster
    hard) the same 0.9 arrives at nprobe≈2-4; this test pins the
    WORST-CASE data shape, so a regression can only be the operator.
    """
    n_queries, k = 20, 8
    brute = {
        (r.query_id, r.vec_id)
        for r in knn_brute(embeddings, n_queries, k).collect()
    }
    fitted = {
        (r.query_id, r.vec_id)
        for r in ivf_knn_fitted(
            embeddings, n_queries, k, n_centroids=16, nprobe=12
        ).collect()
    }
    recall = len(brute & fitted) / len(brute)
    assert recall >= 0.9, f"fitted IVF recall@{k} = {recall:.3f}"


def test_fitted_codebook_buckets_are_balanced(embeddings):
    """KMeans buckets must actually partition the corpus (no empty/all-in-one
    degeneracy), or the IVF cost model is fiction."""
    codebook = fit_ivf_codebook(embeddings, n_centroids=16)
    assigned = ivf_assign_with_codebook(embeddings, codebook)
    sizes = [r["cnt"] for r in assigned.groupBy("centroid_id").count().withColumnRenamed("count", "cnt").collect()]
    total = sum(sizes)
    assert total == embeddings.count()
    assert len(sizes) >= 8  # most centroids own vectors
    assert max(sizes) < total * 0.5  # no single bucket dominates


def test_minhash_lsh_recall_vs_exact_jaccard(documents):
    """LSH candidate generation must not lose verified-true pairs: recall
    vs the exact (quadratic) n-gram Jaccard ground truth ≥ 0.9."""
    gt = _pair_set(ngram_jaccard_pairs(documents, 0.6).select("doc_a", "doc_b"))
    lsh = _pair_set(minhash_lsh_pairs(documents, 0.6).select("doc_a", "doc_b"))
    assert gt, "ground truth unexpectedly empty — test is vacuous"
    recall = len(gt & lsh) / len(gt)
    assert recall >= 0.9, f"LSH recall = {recall:.3f} over {len(gt)} true pairs"
    # and LSH must not invent pairs the exact verifier would reject
    assert lsh <= gt


def _boilerplate_corpus(spark, n_boiler=40):
    """A corpus dominated by one exact-duplicate template (the hot-bucket
    skew case) plus two genuine near-dup pairs and one unrelated doc.

    Near-dup docs use distinct word streams (repeated phrases would
    collapse to a handful of distinct shingles and sink below the Jaccard
    threshold); one appended word ⇒ J ≈ 57/60 ≈ 0.95.
    """
    template = "terms of service boilerplate " * 20
    near_a = " ".join(f"alpha{i}" for i in range(60))
    near_b = near_a + " omega"
    near_c = " ".join(f"beta{i}" for i in range(60))
    near_d = near_c + " sigma"
    rows = [(i, template, len(template)) for i in range(n_boiler)]
    rows += [
        (100, near_a, len(near_a)),
        (101, near_b, len(near_b)),
        (200, near_c, len(near_c)),
        (201, near_d, len(near_d)),
        (300, "an entirely unrelated short document about spark", 48),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


def test_hot_bucket_cap_drops_boilerplate_keeps_near_dups(spark):
    docs = _boilerplate_corpus(spark)
    capped = _pair_set(
        minhash_lsh_pairs(docs, 0.6, max_bucket_size=10).select("doc_a", "doc_b")
    )
    # the 40-doc template bucket blows the cap in every band → none of its
    # 780 pairs emitted; the per-pair buckets (size 2) survive
    assert (100, 101) in capped and (200, 201) in capped
    assert not any(a < 40 and b < 40 for a, b in capped)


def test_uncapped_lsh_still_lossless_on_boilerplate(spark):
    docs = _boilerplate_corpus(spark)
    pairs = _pair_set(minhash_lsh_pairs(docs, 0.6).select("doc_a", "doc_b"))
    assert (0, 1) in pairs  # identical template docs are pairs when uncapped
    assert (100, 101) in pairs and (200, 201) in pairs


def test_ivf_hot_bucket_cap_drops_degenerate_cell_keeps_rest(spark):
    """embedding_near_dup_ivf's max_bucket_size (round 6): a degenerate
    embedding mode that collapses many vectors into one Voronoi cell is
    dropped from pair generation; pairs in healthy buckets survive, and
    the capped output is exactly the uncapped output minus the hot
    bucket's pairs (subset, never new pairs)."""
    from pleiades_spark.operators.dedup import embedding_near_dup_ivf

    # 2 far-apart codebook anchors (vec_id 0,1) + 30 vectors piled onto
    # anchor 0's direction (the degenerate mode) + one near-dup pair at
    # anchor 1.
    dim = 8
    rows = [(0, [1.0] + [0.0] * (dim - 1)), (1, [0.0] * (dim - 1) + [1.0])]
    rows += [
        (10 + i, [1.0, 0.001 * i] + [0.0] * (dim - 2)) for i in range(30)
    ]
    rows += [(100, [0.0] * (dim - 1) + [0.9]), (101, [0.01] * (dim - 1) + [0.95])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    uncapped = _pair_set(
        embedding_near_dup_ivf(emb, 0.9, n_centroids=2).select("vec_a", "vec_b")
    )
    capped = _pair_set(
        embedding_near_dup_ivf(
            emb, 0.9, n_centroids=2, max_bucket_size=8
        ).select("vec_a", "vec_b")
    )
    assert (100, 101) in uncapped and (100, 101) in capped  # healthy bucket
    assert any(a >= 10 and b < 100 for a, b in uncapped)  # hot-cell pairs exist
    assert not any(a >= 10 and b < 100 for a, b in capped)  # ...and are capped
    assert capped <= uncapped


def test_quadratic_ground_truth_ops_guard_rail(spark):
    """The O(n^2) ground-truth operators refuse oversized inputs unless
    explicitly overridden — the fence that keeps them out of scale
    paths."""
    import pytest
    from pyspark.sql import functions as F

    from pleiades_spark.operators import dedup

    big = spark.range(0, 150_000).select(
        F.col("id").alias("doc_id"),
        F.lit("words here").alias("text"),
        F.lit(10).alias("n_chars"),
    )
    orig = dedup.QUADRATIC_GUARD_ROWS
    with pytest.raises(ValueError, match="O\\(n²\\)|O\\(n"):
        dedup.ngram_jaccard_pairs(big)
    vecs = spark.range(0, 150_000).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError):
        dedup.embedding_near_dup_pairs(vecs)
    # round-8 demotions: 8-bit-chunk simhash (n²/256 candidate volume,
    # 26.4× at sf10) and single-level IVF (Θ(n^1.5), 21.8×) joined the
    # guarded ground-truth tier — their twins simhash_pairs_wide / ivf2
    # are the scale paths.
    with pytest.raises(ValueError, match="simhash_pairs"):
        dedup.simhash_pairs(big)
    with pytest.raises(ValueError, match="ivf2"):
        dedup.embedding_near_dup_ivf(vecs)
    # explicit override still works (plan construction only)
    dedup.ngram_jaccard_pairs(big, allow_quadratic=True)
    assert dedup.QUADRATIC_GUARD_ROWS == orig


def test_srp_lsh_embedding_dedup_vs_brute(embeddings):
    """SRP (cosine-LSH) near-dup: every emitted pair must be a true pair
    (verification is exact cosine), and recall vs the brute all-pairs
    ground truth must clear the analytic floor.

    The fixture near-dup pairs sit just above the 0.45 threshold (noise-
    level cosines), which is the WORST case for SRP — collision
    probability at θ ≈ 63° with 4 bands × 4 bits is only ≈ 0.54; true
    near-dups (θ → 0) collide w.p. → 1. Asserting ≥ 0.4 pins candidate
    generation without flaking on the threshold-straddling tail.
    """
    from pleiades_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_srp,
    )

    gt = _pair_set(embedding_near_dup_pairs(embeddings, 0.45).select("vec_a", "vec_b"))
    srp = _pair_set(embedding_near_dup_srp(embeddings, 0.45).select("vec_a", "vec_b"))
    assert gt, "ground truth unexpectedly empty — test is vacuous"
    assert srp <= gt  # exact verification ⇒ no false positives
    recall = len(gt & srp) / len(gt)
    assert recall >= 0.4, f"SRP recall = {recall:.3f} over {len(gt)} true pairs"


def test_jl_projection_norm_concentration(embeddings):
    """JL property: projected norms concentrate around the √(k/3) scaling
    implied by uniform [-1,1) components — every vector within ±50%, the
    mean within ±10%. (Empirical min at the 500-vector fixture is ≈0.496
    — k=16 is a coarse projection; the bound is the concentration shape,
    not a tight JL ε.)"""
    import math

    from pleiades_spark.operators.similarity import JL_K, jl_project

    rows = jl_project(embeddings).collect()
    expected = math.sqrt(JL_K / 3.0)
    ratios = [r["norm_ratio_r"] / expected for r in rows]
    assert all(0.4 < x < 1.6 for x in ratios)
    mean = sum(ratios) / len(ratios)
    assert 0.9 < mean < 1.1, mean


def test_prefix_jaccard_join_is_exact(documents):
    """Prefix filtering guarantees recall 1: every ground-truth pair
    (quadratic exact join) appears in the prefix-join output with the
    same jaccard; any extra pairs are ones the ground truth's 20%
    length band excluded, and they genuinely clear the threshold."""
    from pleiades_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    gt = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(documents, 0.6).collect()
    }
    px = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(documents).collect()
    }
    assert set(gt) <= set(px), "prefix join missed a true pair"
    for pair, j in gt.items():
        assert px[pair] == j
    chars = {
        r["doc_id"]: r["n_chars"] for r in documents.select("doc_id", "n_chars").collect()
    }
    for a, b in set(px) - set(gt):
        assert abs(chars[a] - chars[b]) > 0.2 * max(chars[a], chars[b])
        assert px[(a, b)] >= 0.6


def test_two_level_ivf_assignment_structure(embeddings):
    """ivf_assign_2level invariants: every vector lands in a coarse cell
    owned by its assigned fine centroid, ids stay inside the codebooks,
    and the assignment covers the whole corpus (no dropped rows)."""
    from pleiades_spark.operators.similarity import ivf_assign_2level

    assigned = ivf_assign_2level(embeddings, 16, 4).cache()
    n = embeddings.count()
    assert assigned.count() == n
    rows = assigned.select("vec_id", "coarse_id", "centroid_id").collect()
    assert all(0 <= r.coarse_id < 4 for r in rows)
    assert all(0 <= r.centroid_id < 16 for r in rows)
    # the fine centroid a vector got must belong to the vector's coarse
    # cell — recompute the fine→coarse map independently and cross-check
    cells = {
        r.vec_id: r.centroid_id
        for r in ivf_assign_2level(
            embeddings.filter("vec_id < 16"), 16, 4
        ).select("vec_id", "centroid_id").collect()
    }
    from pleiades_spark.operators.similarity import ivf_assign

    fine_cell = {
        r.vec_id: r.centroid_id
        for r in ivf_assign(
            embeddings.filter("vec_id < 16"), 4
        ).collect()
    }
    for r in rows:
        assert fine_cell[r.centroid_id] == r.coarse_id, (
            f"vec {r.vec_id}: fine centroid {r.centroid_id} lives in cell "
            f"{fine_cell[r.centroid_id]}, vector assigned to {r.coarse_id}"
        )
    assigned.unpersist()


def test_two_level_ivf_dedup_recall_vs_single_level(spark):
    """The Θ(n^(4/3)) two-level path must keep a useful fraction of the
    single-level join's pairs in the LIVE adaptive-K region (sf0.1's
    2000 vectors: K=144/K1=12 vs single-level K=44). Measured 19 of the
    single level's 28 pairs (68%) — the bound is 50% so fixture
    regeneration noise can't flap it. Precision is 1 by construction
    (verify computes the exact cosine), so only recall is at stake;
    absolute recall vs brute is intrinsically low for BOTH paths on
    these near-uniform fixtures (0.19 single / 0.13 two-level — see
    test_fitted_ivf_recall_at_k's calibration note)."""
    from pleiades_spark.operators.dedup import (
        embedding_near_dup_ivf,
        embedding_near_dup_ivf2,
    )

    emb = catalog.load(spark, "/root/testdata/sf0.1", "embeddings")
    ivf1 = _pair_set(embedding_near_dup_ivf(emb, 0.45).select("vec_a", "vec_b"))
    ivf2 = _pair_set(embedding_near_dup_ivf2(emb, 0.45).select("vec_a", "vec_b"))
    assert len(ivf2) >= 0.5 * len(ivf1), (len(ivf2), len(ivf1))


def test_two_level_ivf_multi_probe_recall_knob(spark):
    """n_probe_cells is the recall lever: each extra probed coarse cell
    recovers straddling pairs at ~P× assignment/verify cost. Measured at
    sf0.1 (2000 vectors): P=1 → 19 pairs, P=2 → 38 (1.36× the
    single-level join's 28), P=3 → 52 — all with zero false pairs
    (precision 1 by construction). Bounds are loose (monotonicity + the
    single-level crossover at P=2) so fixture regeneration can't flap
    them."""
    from pleiades_spark.operators.dedup import (
        embedding_near_dup_ivf,
        embedding_near_dup_ivf2,
    )

    emb = catalog.load(spark, "/root/testdata/sf0.1", "embeddings")
    n1 = embedding_near_dup_ivf2(emb, 0.45, n_probe_cells=1).count()
    n2 = embedding_near_dup_ivf2(emb, 0.45, n_probe_cells=2).count()
    single = embedding_near_dup_ivf(emb, 0.45).count()
    assert n2 > n1
    assert n2 >= single


def test_two_level_ivf_degenerates_to_exact_argmax_at_one_cell(embeddings):
    """With a single coarse cell (K1=1) every fine centroid lives in
    cell 0 and stage 2 scans the whole codebook — the two-level
    assignment must equal the exact single-level argmax bit-for-bit
    (same cosines, same tie rule). Links the approximate path's
    correctness to the oracle-gated exact one."""
    from pleiades_spark.operators.similarity import ivf_assign, ivf_assign_2level

    exact = {r.vec_id: r.centroid_id for r in ivf_assign(embeddings, 16).collect()}
    two = {
        r.vec_id: r.centroid_id
        for r in ivf_assign_2level(embeddings, 16, 1).collect()
    }
    assert exact == two


def test_simhash_wide_catches_near_dups_rejects_unrelated(spark):
    """The 64-bit twin must behave like a simhash: identical docs at
    hamming 0, a one-token edit of a 40-token doc within the threshold,
    unrelated docs rejected. (Pair-set equality with the 32-bit gate is
    NOT expected — different projections; on the word-soup fixtures the
    measured overlap is ~55%.) The blocking motivation is the round-7
    sf10 finding: 8-bit chunks are n²/256 candidate volume — 46.7 s at
    500k docs — vs 16-bit chunks' n²/16k (17.6 s)."""
    from pleiades_spark.operators.dedup import simhash_pairs_wide

    base = " ".join(f"tok{i}" for i in range(40))
    edited = " ".join(f"tok{i}" for i in range(39)) + " zzz"
    other = " ".join(f"other{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, edited), (3, other)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_pairs_wide(docs, 6).collect()
    }
    assert got.get((0, 1)) == 0          # identical → hamming 0
    assert (0, 2) in got                 # one-token edit → near-dup
    assert (0, 3) not in got and (1, 3) not in got and (2, 3) not in got


def test_simhash_wide_pigeonhole_bounds(spark):
    """Quantifies the documented recall bounds of the 16-bit chunk
    blocking (round-8 ADVICE): with 4 chunks, pigeonhole guarantees a
    shared intact chunk only for Hamming ≤ 3; at Hamming 4–6 a pair
    whose flips corrupt ALL four chunks is missed BY DESIGN (on both
    engines identically — the oracle replicates the blocking).

    Signatures are injected directly via simhash_wide_pairs_from_sigs so
    the bit patterns are exact:
      base           hi=0, lo=0
      h3_one_chunk   3 flips in one chunk  → hamming 3, must be FOUND
      h4_spread      1 flip per chunk      → hamming 4, MUST be missed
                     (no chunk intact ⇒ no blocking bucket shared)
      h4_one_chunk   4 flips in one chunk  → hamming 4, found (3 intact)
      h6_two_chunks  3+3 flips in 2 chunks → hamming 6, found (2 intact)
    """
    from pleiades_spark.operators.dedup import simhash_wide_pairs_from_sigs

    rows = [
        (0, 0, 0),                                  # base
        (1, 0b111, 0),                              # h3 in hi-low chunk
        (2, (1 << 16) | 1, (1 << 16) | 1),          # h4 spread over all 4
        (3, 0b1111, 0),                             # h4 in one chunk
        (4, (0b111 << 16) | 0b111, 0),              # h6 in two hi chunks
    ]
    sigs = spark.createDataFrame(rows, "doc_id long, hi long, lo long")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_wide_pairs_from_sigs(sigs, 6).collect()
    }
    assert got.get((0, 1)) == 3      # pigeonhole-guaranteed hit
    assert (0, 2) not in got         # all-chunks-corrupted miss
    assert got.get((0, 3)) == 4      # errors concentrated → found
    assert got.get((0, 4)) == 6      # two corrupt, two intact → found

    # exact_recall multi-probing (1-bit-flip variants) must recover the
    # adversarial spread pair — and every other qualifying pair
    exact = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_wide_pairs_from_sigs(
            sigs, 6, exact_recall=True
        ).collect()
    }
    assert exact.get((0, 2)) == 4    # the miss, recovered
    assert set(got) <= set(exact)    # strictly more recall, same precision
    assert all(v <= 6 for v in exact.values())


def test_mmr_rerank_prefers_diverse_over_redundant(spark):
    """Constructed case: the query's two most-relevant candidates are
    near-copies of each other; a slightly less relevant but orthogonal
    candidate exists. Pure top-2 keeps both near-copies; MMR's second
    pick must be the diverse one."""
    from pleiades_spark.operators.similarity import mmr_rerank

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),          # the query
        (10, [0.99, 0.12, 0.0, 0.0]),       # most relevant
        (11, [0.99, 0.121, 0.001, 0.0]),    # its near-copy
        (12, [0.80, 0.0, 0.59, 0.0]),       # less relevant, diverse
        (13, [0.10, 0.0, 0.0, 0.99]),       # filler
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )
    sel = {
        r["sel_rank"]: r["vec_id"]
        for r in mmr_rerank(emb, n_queries=1, n_candidates=4, k=3).collect()
    }
    assert sel[1] == 10            # relevance still wins the first slot
    assert sel[2] == 12            # diversity beats the near-copy
    assert sel[3] == 13            # the near-copy is pushed out entirely


def test_mmr_rerank_first_pick_matches_knn_top1(spark, embeddings):
    """On the real fixture the first MMR pick per query must equal the
    brute top-1 neighbor (lambda only affects later picks)."""
    from pleiades_spark.operators.similarity import mmr_rerank

    top1 = {
        r["query_id"]: r["vec_id"]
        for r in knn_brute(embeddings, 5, 1).collect()
    }
    first = {
        r["query_id"]: r["vec_id"]
        for r in mmr_rerank(embeddings, 5).filter("sel_rank = 1").collect()
    }
    assert first == top1


def test_kmeans_lloyd_deterministic_semantics(spark):
    """Independent checks (not oracle replay) on a constructed fixture:
    two tight clusters → centroids land on the quantized cluster means
    and the census matches cluster sizes; a duplicated seed leaves its
    cell empty (round-6 cosine ties break to the lower id) and the
    empty cell must RETAIN its init centroid."""
    import math

    from pleiades_spark.operators.similarity import kmeans_fit_deterministic

    # cluster A around (1, 0), cluster B around (0, 1); seeds = rows 0, 1
    rows = [
        (0, [1.0, 0.01]),
        (1, [0.02, 1.0]),
        (2, [1.0, 0.03]),
        (3, [1.0, 0.05]),
        (4, [0.04, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.centroid_id, r.pos): (r.val, r.n_members)
        for r in kmeans_fit_deterministic(emb, k=2, iters=2).collect()
    }
    assert len(got) == 4  # 2 centroids × 2 dims

    def micro_mean(vals):
        s = sum(math.floor(x * 1000000 + 0.5) for x in vals)
        return math.floor(s / len(vals) + 0.5) / 1000000

    # assignment by cosine puts {0,2,3} with seed 0 and {1,4} with seed 1
    assert got[(0, 0)][0] == micro_mean([1.0, 1.0, 1.0])
    assert got[(0, 1)][0] == micro_mean([0.01, 0.03, 0.05])
    assert got[(1, 0)][0] == micro_mean([0.02, 0.04])
    assert got[(1, 1)][0] == micro_mean([1.0, 1.0])
    assert got[(0, 0)][1] == 3 and got[(1, 0)][1] == 2

    # duplicated seed: cell 2 ties every would-be member to cell 1 →
    # empty; it must keep its INIT vector (row 2 = [1.0, 0.03]) — and
    # k-means still converges for the live cells
    dup = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 1.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got2 = {
        (r.centroid_id, r.pos): (r.val, r.n_members)
        for r in kmeans_fit_deterministic(dup, k=3, iters=2).collect()
    }
    assert got2[(2, 0)][0] == 0.0 and got2[(2, 1)][0] == 1.0  # retained init
    assert got2[(2, 0)][1] == 0  # empty census
    assert got2[(1, 0)][1] == 3  # rows 1,2,3 all tie → lowest id wins


def test_simhash128_catches_near_dups_rejects_unrelated(spark):
    """Round-9 knob behavior: identical docs at hamming 0; a one-token
    edit of a 400-token doc sits at hamming 6 = exactly the default
    threshold (6/128 ≈ 95% agreement is STRICTER than the 64-bit twin's
    6/64 — a 1-in-40-token edit lands at ~9 and is no longer a near-dup
    under this contract); unrelated docs rejected. exact_recall because
    a ~6-bit perturbation usually touches all four 32-bit halves, which
    plain blocking only catches when a half survives intact."""
    from pleiades_spark.operators.dedup import simhash_pairs_wide128

    base = " ".join(f"tok{i}" for i in range(400))
    edited = " ".join(f"tok{i}" for i in range(399)) + " zzz"
    other = " ".join(f"other{i}" for i in range(400))
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, edited), (3, other)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_pairs_wide128(docs, 6, exact_recall=True).collect()
    }
    assert got.get((0, 1)) == 0          # identical → hamming 0
    assert got.get((0, 2)) == 6          # one-token edit → threshold hit
    assert (0, 3) not in got and (1, 3) not in got and (2, 3) not in got


def test_simhash128_pigeonhole_bounds(spark):
    """The 64-bit pigeonhole algebra one level up: 4×32-bit chunks
    guarantee a shared intact chunk only for Hamming ≤ 3; a Hamming-4
    pair whose flips corrupt ALL four halves is missed by plain blocking
    BY DESIGN (the gate oracle replicates the blocking); the 33-mask
    1-bit-flip multi-probe recovers every pair at Hamming ≤ 7 — some
    chunk must hold ≤ 1 of ≤ 7 flips."""
    from pleiades_spark.operators.dedup import simhash_wide128_pairs_from_sigs

    rows = [
        (0, 0, 0, 0, 0),                  # base
        (1, 0b111, 0, 0, 0),              # hamming 3 in one chunk → FOUND
        (2, 1, 1, 1, 1),                  # hamming 4 spread → plain MISS
        (3, 0b1111, 0, 0, 0),             # hamming 4 concentrated → found
        (4, 0b111, 0b111, 0, 0),          # hamming 6, two chunks → found
        (5, 0b11, 0b11, 0b11, 1),         # hamming 7 spread, one chunk
    ]                                     #   with 1 flip → exact@7 finds
    sigs = spark.createDataFrame(
        rows, "doc_id long, h0 long, h1 long, h2 long, h3 long"
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_wide128_pairs_from_sigs(sigs, 6).collect()
    }
    assert got.get((0, 1)) == 3      # pigeonhole-guaranteed hit
    assert (0, 2) not in got         # all-chunks-corrupted miss
    assert got.get((0, 3)) == 4      # errors concentrated → found
    assert got.get((0, 4)) == 6      # two corrupt, two intact → found

    exact = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_wide128_pairs_from_sigs(
            sigs, 6, exact_recall=True
        ).collect()
    }
    assert exact.get((0, 2)) == 4    # the adversarial miss, recovered
    assert set(got) <= set(exact)    # strictly more recall, same precision
    assert all(v <= 6 for v in exact.values())

    # the provable bound extends to Hamming 7 (max for 1-bit probes)
    exact7 = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_wide128_pairs_from_sigs(
            sigs, 7, exact_recall=True
        ).collect()
    }
    assert exact7.get((0, 5)) == 7


def test_srp_first_shared_band_emits_each_pair_once(spark):
    """Round-10 rewrite: the SRP candidate join emits a colliding pair
    from its FIRST shared band only, replacing the post-join distinct
    (the shuffle that DNF'd the sf100 probe on a high-duplication
    corpus). Exact copies of one vector collide in EVERY band — the
    worst case for the old 4×-duplicated candidate stream — so the
    output must contain exactly C(n_copies, 2) rows for the copy
    group, with no duplicate (vec_a, vec_b) rows anywhere."""
    from pleiades_spark.operators.dedup import embedding_near_dup_srp

    base = [0.9, -0.4, 0.2] + [0.05 * ((i % 7) - 3) for i in range(61)]
    rows = [(i, base) for i in range(6)] + [
        (10 + i, [((i * 31 + j * 17) % 19 - 9) / 9.0 for j in range(64)])
        for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_near_dup_srp(emb, 0.45).collect()
    pairs = [(r.vec_a, r.vec_b) for r in out]
    assert len(pairs) == len(set(pairs)), "duplicate pair rows emitted"
    copy_pairs = {(a, b) for a, b in pairs if a < 6 and b < 6}
    assert copy_pairs == {(a, b) for a in range(6) for b in range(6) if a < b}


def test_blocked_bucket_pairs_invariant_to_block_size(spark):
    """Round-10 block-split salting (verdict r9 #3): the in-bucket pair
    join decomposed over (block, block) tasks must return the exact
    same pair set for ANY block size — including 1 (every row its own
    block) and one larger than every bucket (degenerates to the plain
    join). Exercised on a skewed layout: one 9-row bucket, one 3-row
    bucket, two singletons."""
    from pleiades_spark.functions.vectors import as_double, norm
    from pleiades_spark.operators.dedup import _blocked_bucket_pairs
    from pyspark.sql import functions as F

    rows = []
    vid = 0
    for cid, n in ((0, 9), (1, 3), (2, 1), (3, 1)):
        for _ in range(n):
            rows.append((vid, [float((vid * 7 + j) % 5) for j in range(4)], cid))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, centroid_id long"
    )
    assigned = emb.select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        "centroid_id",
    ).withColumn("nrm", norm(F.col("v")))

    def pair_set(bs):
        joined = _blocked_bucket_pairs(assigned, bs)
        return {
            (r[0], r[1])
            for r in joined.select(
                F.col("a.vec_id"), F.col("b.vec_id")
            ).collect()
        }

    expected = pair_set(10**6)  # plain-join degenerate case
    # sanity: C(9,2) + C(3,2) = 39 pairs, every pair ordered
    assert len(expected) == 39
    assert all(a < b for a, b in expected)
    for bs in (1, 2, 4):
        assert pair_set(bs) == expected, f"block_size={bs} diverged"


def test_embedding_dedup_reps_precision_vs_brute_pair_graph(embeddings):
    """The linear-output cluster contract (round 10), precision side:
    every edge is cosine-verified, so each rep cluster must be a SUBSET
    of a true pair-graph component — co-clustering two vectors that are
    not connected in the brute near-dup graph is impossible by
    construction. (Recall on the fixture's scattered borderline pairs
    is NOT the contract — see the copy-group test below; at gate SF the
    frozen r=4 banding makes bucket-mins near-random, and the operator's
    docstring documents that trade.)"""
    from pleiades_spark.operators.dedup import (
        embedding_dedup_reps,
        embedding_near_dup_pairs,
    )
    from pleiades_spark.operators.graph import connected_components_star

    gt_pairs = _pair_set(
        embedding_near_dup_pairs(embeddings, 0.45).select("vec_a", "vec_b")
    )
    assert gt_pairs, "vacuous"
    true_cc = {
        r.doc_id: r.cluster
        for r in connected_components_star(
            embeddings.sparkSession.createDataFrame(
                [(a, b) for a, b in gt_pairs], "doc_a long, doc_b long"
            )
        ).collect()
    }
    reps = {
        r.vec_id: r.rep_id
        for r in embedding_dedup_reps(embeddings, 0.45).collect()
    }
    assert len(reps) == embeddings.count()  # one decision per vector
    by_rep: dict = {}
    for vid, rep in reps.items():
        by_rep.setdefault(rep, []).append(vid)
    for members in by_rep.values():
        comps = {true_cc.get(m, m) for m in members}
        assert len(comps) == 1, f"cluster spans true components: {members}"


def test_embedding_dedup_reps_recovers_copy_groups(spark):
    """The cluster contract's recall claim: DUPLICATE-GROUP capture on a
    high-multiplicity corpus (the sf100 shape — copy groups at cosine
    ≈ 1 — where pair enumeration's output is quadratic). 12 groups × 60
    exact copies + 1280 scattered random vectors (> 1024, so the
    adaptive fine-bucket rule is exercised): pairwise recall within
    copy groups must be ≥ 0.9, precision exact (clusters never mix
    groups or absorb randoms at threshold 0.9)."""
    from pleiades_spark.operators.dedup import embedding_dedup_reps

    dim, rows = 64, []
    for g in range(12):
        base = [(((g * 37 + j * 13) % 23) - 11) / 11.0 for j in range(dim)]
        for c in range(60):
            rows.append((g * 100 + c, base))
    for i in range(1280):
        rows.append(
            (
                10_000 + i,
                [
                    (((i * 2654435761 + j * 40503 + i * i * 97) % 8191) - 4095)
                    / 4095.0
                    for j in range(dim)
                ],
            )
        )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    reps = {
        r.vec_id: r.rep_id
        for r in embedding_dedup_reps(emb, 0.9).collect()
    }
    assert len(reps) == len(rows)
    hit = total = 0
    for g in range(12):
        ids = [g * 100 + c for c in range(60)]
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                total += 1
                hit += reps[a] == reps[b]
    assert hit / total >= 0.9, f"copy-group recall = {hit / total:.3f}"
    # precision: no cluster mixes two copy GROUPS, or a group with any
    # random vector (random-random merges are allowed only in principle
    # — edges are cosine-verified — and don't touch the group claim)
    by_rep: dict = {}
    for vid, rep in reps.items():
        by_rep.setdefault(rep, []).append(vid)
    for members in by_rep.values():
        groups = {m // 100 for m in members if m < 10_000}
        assert len(groups) <= 1, f"cluster mixes groups: {sorted(groups)}"
        if groups:
            assert all(m < 10_000 for m in members), "group absorbed randoms"


def test_doc_dedup_reps_precision_vs_exact_pair_graph(documents):
    """The text-side linear cluster contract (round 11), precision side:
    every star edge is Jaccard-verified at the same threshold, so each
    rep cluster must be a SUBSET of a true pair-graph component of the
    exact n-gram Jaccard ground truth — co-clustering two docs that are
    not connected in the brute near-dup graph is impossible by
    construction (modulo an in-pair h32 collision, ≈4e-5 per pair and
    absent at this corpus size)."""
    from pleiades_spark.operators.dedup import doc_dedup_reps
    from pleiades_spark.operators.graph import connected_components_star

    gt_pairs = _pair_set(
        ngram_jaccard_pairs(documents, 0.6).select("doc_a", "doc_b")
    )
    assert gt_pairs, "vacuous"
    true_cc = {
        r.doc_id: r.cluster
        for r in connected_components_star(
            documents.sparkSession.createDataFrame(
                [(a, b) for a, b in gt_pairs], "doc_a long, doc_b long"
            )
        ).collect()
    }
    reps = {
        r.doc_id: r.rep_id for r in doc_dedup_reps(documents, 0.6).collect()
    }
    assert len(reps) == documents.count()  # one decision per document
    by_rep: dict = {}
    for did, rep in reps.items():
        by_rep.setdefault(rep, []).append(did)
    for members in by_rep.values():
        comps = {true_cc.get(m, m) for m in members}
        assert len(comps) == 1, f"cluster spans true components: {members}"


def test_doc_dedup_reps_recovers_copy_groups(spark):
    """The text cluster contract's recall claim: DUPLICATE-GROUP capture
    on a high-multiplicity corpus (the sf100 shape — template groups
    whose members differ by one trailing word, J ≈ 0.96 pairwise — where
    pair enumeration's output is quadratic). 8 groups × 25 near-copies +
    150 unique word-soup docs: pairwise recall within copy groups ≥ 0.9,
    precision exact (clusters never mix groups or absorb randoms)."""
    from pleiades_spark.operators.dedup import doc_dedup_reps

    rows = []
    for g in range(8):
        base = " ".join(f"w{g}x{i}" for i in range(80))
        for c in range(25):
            text = f"{base} tail{g}x{c}"
            rows.append((g * 100 + c, text, len(text)))
    for i in range(150):
        text = " ".join(f"r{i}y{j}" for j in range(60))
        rows.append((10_000 + i, text, len(text)))
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    reps = {r.doc_id: r.rep_id for r in doc_dedup_reps(docs, 0.6).collect()}
    assert len(reps) == len(rows)
    hit = total = 0
    for g in range(8):
        ids = [g * 100 + c for c in range(25)]
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                total += 1
                hit += reps[a] == reps[b]
    assert hit / total >= 0.9, f"copy-group recall = {hit / total:.3f}"
    by_rep: dict = {}
    for did, rep in reps.items():
        by_rep.setdefault(rep, []).append(did)
    for members in by_rep.values():
        groups = {m // 100 for m in members if m < 10_000}
        assert len(groups) <= 1, f"cluster mixes groups: {sorted(groups)}"
        if groups:
            assert all(m < 10_000 for m in members), "group absorbed randoms"


def test_doc_dedup_reps_incremental_clusters_across_slices(spark):
    """Incremental reps maintenance (round 11): copy groups SPLIT across
    the old/new slices must still cluster — including the undercut case
    where a NEW doc has the smallest id in a bucket, so the old
    bucket-rep must bridge to it (even ids are new, so every group's
    global min id is new while the old phase clustered around the odd
    min). Precision stays exact: clusters never mix groups or absorb
    the unique word-soup docs."""
    from pyspark.sql import functions as F

    from pleiades_spark.operators.dedup import doc_dedup_reps_incremental

    rows = []
    for g in range(6):
        base = " ".join(f"g{g}w{i}" for i in range(80))
        for c in range(20):
            text = f"{base} t{g}x{c}"
            rows.append((g * 100 + c, text, len(text)))
    for i in range(120):
        text = " ".join(f"u{i}v{j}" for j in range(60))
        rows.append((10_000 + i, text, len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long"
    ).withColumn("is_new", F.col("doc_id") % 2 == 0)
    reps = {
        r.doc_id: r.rep_id
        for r in doc_dedup_reps_incremental(docs, "is_new", 0.6).collect()
    }
    assert len(reps) == len(rows)
    hit = total = 0
    for g in range(6):
        ids = [g * 100 + c for c in range(20)]
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                total += 1
                hit += reps[a] == reps[b]
    assert hit / total >= 0.9, f"cross-slice recall = {hit / total:.3f}"
    by_rep: dict = {}
    for did, rep in reps.items():
        by_rep.setdefault(rep, []).append(did)
    for members in by_rep.values():
        groups = {m // 100 for m in members if m < 10_000}
        assert len(groups) <= 1, f"cluster mixes groups: {sorted(groups)}"
        if groups:
            assert all(m < 10_000 for m in members), "group absorbed randoms"


def test_simhash128_prune_path_output_invariant(spark):
    """The size-gated probe prune (round 10) must be a pure optimizer
    choice: forcing probe_prune on/off over the same signatures yields
    the identical pair set — including the crafted Hamming-7 boundary
    patterns of the pigeonhole test."""
    from pleiades_spark.operators.dedup import simhash_wide128_pairs_from_sigs

    def flip(sig, bits):
        for b in bits:
            sig ^= 1 << b
        return sig

    base = 0xDEADBEEF
    rows = [
        (0, base, base, base, base),
        (1, flip(base, [1, 2, 3]), base, base, base),        # H3
        (2, flip(base, [0]), flip(base, [5]), flip(base, [9]), flip(base, [13])),  # H4, all chunks hit
        (3, flip(base, [0, 1]), flip(base, [2, 3]), flip(base, [4]), flip(base, [6, 7])),  # H7
        (9, 0x12345678, 0x0F0F0F0F, 0x13572468, 0x2468ACE0),  # unrelated
    ]
    sigs = spark.createDataFrame(
        rows, "doc_id long, h0 long, h1 long, h2 long, h3 long"
    )
    out = {}
    for pp in (False, True):
        out[pp] = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in simhash_wide128_pairs_from_sigs(
                sigs, 7, exact_recall=True, probe_prune=pp
            ).collect()
        }
    assert out[True] == out[False]
    assert (0, 1, 3) in out[True] and (0, 2, 4) in out[True]
    assert (0, 3, 7) in out[True]


def test_output_volume_preflight_guard_trips_on_high_multiplicity(spark):
    """Round-12 pre-flight (_guard_expected_pairs): a pair contract must
    refuse to START enumerating when the band index says the candidate
    volume Σ C(bucket, 2) blows the caller's budget — the sf100 lesson
    that pair operators die by OUTPUT volume, which input-row guards
    never see. The error must point at the linear reps contract."""
    import pytest

    from pleiades_spark.operators.dedup import minhash_lsh_pairs

    rows = []
    for g in range(4):
        base = " ".join(f"w{g}x{i}" for i in range(80))
        rows += [
            (g * 100 + c, f"{base} tail{g}x{c}", 0) for c in range(30)
        ]
    hot = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    with pytest.raises(ValueError, match="doc_dedup_reps"):
        minhash_lsh_pairs(hot, 0.6, max_expected_pairs=500)


def test_output_volume_preflight_guard_passes_normal_corpus(spark):
    """The same budget that trips the template corpus lets a normal
    (unique-docs) corpus run: band buckets are singletons, so the
    estimate is ~0 and the operator proceeds to an empty pair set."""
    from pleiades_spark.operators.dedup import minhash_lsh_pairs

    uniq = spark.createDataFrame(
        [
            (i, " ".join(f"r{i}y{j}" for j in range(60)), 0)
            for i in range(120)
        ],
        "doc_id long, text string, n_chars long",
    )
    out = minhash_lsh_pairs(uniq, 0.6, max_expected_pairs=500)
    assert out.count() == 0


def test_output_volume_preflight_guard_embedding_twins(embeddings):
    """SRP and two-level IVF carry the same pre-flight: a zero budget
    trips on the fixture's near-dup copies (pointing at
    embedding_dedup_reps); a generous budget lets the same corpus
    through unchanged."""
    import pytest

    from pleiades_spark.operators.dedup import (
        embedding_near_dup_ivf2,
        embedding_near_dup_srp,
    )

    with pytest.raises(ValueError, match="embedding_dedup_reps"):
        embedding_near_dup_srp(embeddings, 0.45, max_expected_pairs=0)
    with pytest.raises(ValueError, match="embedding_dedup_reps"):
        embedding_near_dup_ivf2(embeddings, 0.45, max_expected_pairs=0)
    assert (
        embedding_near_dup_srp(
            embeddings, 0.45, max_expected_pairs=10**9
        ).count()
        > 0
    )


def test_persisted_reps_index_matches_in_gate_incremental(spark, tmp_path):
    """Round-12 persisted star index: write_reps_index on the old slice
    + doc_dedup_reps_from_index on the new slice must produce EXACTLY
    the assignments of doc_dedup_reps_incremental on the combined frame
    — the gate's deterministic old-phase recompute and the production
    parquet round-trip are the same protocol. Includes the undercut case
    (every group's global min id is new)."""
    from pyspark.sql import functions as F

    from pleiades_spark.operators.dedup import (
        doc_dedup_reps_from_index,
        doc_dedup_reps_incremental,
        write_reps_index,
    )

    rows = []
    for g in range(6):
        base = " ".join(f"g{g}w{i}" for i in range(80))
        for c in range(20):
            text = f"{base} t{g}x{c}"
            rows.append((g * 100 + c, text, len(text)))
    for i in range(120):
        text = " ".join(f"u{i}v{j}" for j in range(60))
        rows.append((10_000 + i, text, len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long"
    ).withColumn("is_new", F.col("doc_id") % 2 == 0)

    expected = {
        r.doc_id: r.rep_id
        for r in doc_dedup_reps_incremental(docs, "is_new", 0.6).collect()
    }

    idx = str(tmp_path / "idx0")
    idx2 = str(tmp_path / "idx1")
    old = docs.filter(~F.col("is_new")).drop("is_new")
    new = docs.filter(F.col("is_new")).drop("is_new")
    write_reps_index(old, idx, 0.6)
    got_df = doc_dedup_reps_from_index(new, idx, 0.6, out_index_path=idx2)
    got = {r.doc_id: r.rep_id for r in got_df.collect()}
    assert got == expected

    # the ROLLED index is a valid starting point for night 2: a further
    # increment assigns every id exactly once and still clusters a copy
    # group split across ALL THREE slices (bit-equality is not the
    # contract across nights — bucket reps seen by night 1 differ from a
    # two-slice recompute — but group capture and precision are)
    night2 = [
        (g * 100 + 50 + c, " ".join(f"g{g}w{i}" for i in range(80)) + f" n2x{c}")
        for g in range(6)
        for c in range(3)
    ]
    new2 = spark.createDataFrame(
        [(i, t, len(t)) for i, t in night2],
        "doc_id long, text string, n_chars long",
    )
    got2 = {
        r.doc_id: r.rep_id
        for r in doc_dedup_reps_from_index(new2, idx2, 0.6).collect()
    }
    assert len(got2) == len(rows) + len(night2)
    for g in range(6):
        members = [d for d in (g * 100 + 50 + c for c in range(3))]
        reps_of_group = {got2[m] for m in members} | {got2[g * 100]}
        assert len(reps_of_group) == 1, f"group {g} split: {reps_of_group}"
    by_rep: dict = {}
    for did, rep in got2.items():
        by_rep.setdefault(rep, []).append(did)
    for members in by_rep.values():
        groups = {m // 100 for m in members if m < 10_000}
        assert len(groups) <= 1, f"cluster mixes groups: {sorted(groups)}"


def test_embedding_dedup_reps_incremental_clusters_across_slices(spark):
    """Embedding incremental reps (round 12 — the modality twin of the
    doc version): copy groups SPLIT across old/new slices must still
    cluster, including the undercut case (even ids are new, so every
    group's global min id is new while the old phase clustered around
    the odd min). Precision stays exact at threshold 0.9."""
    from pyspark.sql import functions as F

    from pleiades_spark.operators.dedup import (
        embedding_dedup_reps_incremental,
    )

    dim, rows = 64, []
    for g in range(8):
        base = [(((g * 37 + j * 13) % 23) - 11) / 11.0 for j in range(dim)]
        for c in range(40):
            rows.append((g * 100 + c, base))
    for i in range(900):
        rows.append(
            (
                10_000 + i,
                [
                    (((i * 2654435761 + j * 40503 + i * i * 97) % 8191) - 4095)
                    / 4095.0
                    for j in range(dim)
                ],
            )
        )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).withColumn("is_new", F.col("vec_id") % 2 == 0)
    reps = {
        r.vec_id: r.rep_id
        for r in embedding_dedup_reps_incremental(emb, "is_new", 0.9).collect()
    }
    assert len(reps) == len(rows)
    hit = total = 0
    for g in range(8):
        ids = [g * 100 + c for c in range(40)]
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                total += 1
                hit += reps[a] == reps[b]
    assert hit / total >= 0.9, f"cross-slice recall = {hit / total:.3f}"
    by_rep: dict = {}
    for vid, rep in reps.items():
        by_rep.setdefault(rep, []).append(vid)
    for members in by_rep.values():
        groups = {m // 100 for m in members if m < 10_000}
        assert len(groups) <= 1, f"cluster mixes groups: {sorted(groups)}"
        if groups:
            assert all(m < 10_000 for m in members), "group absorbed randoms"


def test_persisted_emb_reps_index_matches_in_gate_incremental(spark, tmp_path):
    """Round-12 embedding persisted index: write_emb_reps_index on the
    old slice + embedding_dedup_reps_from_index on the new slice must
    produce EXACTLY the assignments of embedding_dedup_reps_incremental
    on the combined frame (corpus kept ≤1024 vectors so both paths band
    in the frozen rows_bits region). Rolled index is a valid night-2
    start: a further increment assigns every id once and extends the
    copy groups."""
    from pyspark.sql import functions as F

    from pleiades_spark.operators.dedup import (
        embedding_dedup_reps_from_index,
        embedding_dedup_reps_incremental,
        write_emb_reps_index,
    )

    dim, rows = 64, []
    for g in range(8):
        base = [(((g * 37 + j * 13) % 23) - 11) / 11.0 for j in range(dim)]
        for c in range(40):
            rows.append((g * 100 + c, base))
    for i in range(600):
        rows.append(
            (
                10_000 + i,
                [
                    (((i * 2654435761 + j * 40503 + i * i * 97) % 8191) - 4095)
                    / 4095.0
                    for j in range(dim)
                ],
            )
        )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).withColumn("is_new", F.col("vec_id") % 2 == 0)

    # rows_bits pinned to 8 on BOTH paths: the equivalence claim needs
    # identical banding geometry, and 8 bits (256 bucket values/band)
    # keeps the night-2 triplet's buckets from colliding with OTHER
    # groups' mins — at the frozen r=4 all four band draws can land on
    # cross-group mins that cosine-verify correctly rejects (LSH
    # physics, observed in round 12, not an index defect)
    expected = {
        r.vec_id: r.rep_id
        for r in embedding_dedup_reps_incremental(
            emb, "is_new", 0.9, rows_bits=8
        ).collect()
    }

    idx = str(tmp_path / "eidx0")
    idx2 = str(tmp_path / "eidx1")
    old = emb.filter(~F.col("is_new")).drop("is_new")
    new = emb.filter(F.col("is_new")).drop("is_new")
    write_emb_reps_index(old, idx, 0.9, rows_bits=8)
    got = {
        r.vec_id: r.rep_id
        for r in embedding_dedup_reps_from_index(
            new, idx, 0.9, out_index_path=idx2
        ).collect()
    }
    assert got == expected

    n2 = []
    for g in range(8):
        base = [(((g * 37 + j * 13) % 23) - 11) / 11.0 for j in range(dim)]
        for c in range(3):
            n2.append((g * 100 + 50 + c, base))
    new2 = spark.createDataFrame(n2, "vec_id long, embedding array<float>")
    got2 = {
        r.vec_id: r.rep_id
        for r in embedding_dedup_reps_from_index(new2, idx2, 0.9).collect()
    }
    assert len(got2) == len(rows) + len(n2)
    for g in range(8):
        members = [g * 100 + 50 + c for c in range(3)]
        reps_of_group = {got2[m] for m in members} | {got2[g * 100]}
        assert len(reps_of_group) == 1, f"group {g} split: {reps_of_group}"


def test_from_index_refuses_in_place_roll(spark, tmp_path):
    """Rolling the index onto its own path would overwrite parquet the
    same job is lazily reading (torn artifact) — both from_index
    functions must refuse before any work runs."""
    import pytest

    from pleiades_spark.operators.dedup import (
        doc_dedup_reps_from_index,
        embedding_dedup_reps_from_index,
    )

    docs = spark.createDataFrame(
        [(1, "a b c", 5)], "doc_id long, text string, n_chars long"
    )
    emb = spark.createDataFrame(
        [(1, [0.1] * 4)], "vec_id long, embedding array<float>"
    )
    idx = str(tmp_path / "same")
    with pytest.raises(ValueError, match="in place"):
        doc_dedup_reps_from_index(docs, idx, out_index_path=idx)
    with pytest.raises(ValueError, match="in place"):
        embedding_dedup_reps_from_index(emb, idx, out_index_path=idx)
