"""Similarity search over the ``embeddings`` table.

Two paths:
  knn_brute   exact top-k cosine — broadcast the (small) query set against
              a single scan of the corpus; per-query top-k via window
              row_number. The baseline and the recall ground truth.
  ivf_knn     IVF-style approximate search — vectors are assigned to the
              nearest centroid of a fixed codebook; a query probes only its
              own centroid's bucket (nprobe=1).

Scale design: knn_brute is one corpus scan per query batch — O(N·Q·d)
compute, no shuffle except the final top-k (which AQE executes as partial
top-k per partition). ivf_knn turns that into O(N/K·Q·d) by bucketing: at
100 TB the bucket table is written partitioned by centroid_id so a query
touches only its probe partitions (partition pruning — PLAN-ASSERTED by
tests/test_scale_plans.py::test_ivf_bucket_table_partition_prunes: the
probed cells appear in the scan's PartitionFilters, round-9 verdict #3),
and the codebook comes from a k-means fit (pyspark.ml.clustering.KMeans)
instead of the deterministic fixture codebook used here for oracle
reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pleiades_spark.functions.vectors import as_double, cosine, dot, norm


def knn_brute(
    emb: DataFrame, n_queries: int = 5, k: int = 8
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (vec_id < n_queries).

    Deterministic ranking: (cosine rounded to 6 DESC, vec_id ASC).
    """
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    queries = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        v.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("v")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def hard_negatives(
    emb: DataFrame, n_queries: int = 5, k: int = 3
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most similar vectors with a DIFFERENT label — the
    near-misses that make useful negatives (random negatives are too
    easy; same-label near neighbors are positives).

    Same broadcast-queries × one-corpus-scan shape as knn_brute with the
    label inequality folded into the join condition, so mismatched pairs
    are dropped before scoring. At corpus scale the scan side would be
    the IVF-bucketed path instead of the full corpus.
    """
    v = emb.select(
        "vec_id", F.col("label"), as_double(F.col("embedding")).alias("v")
    )
    queries = v.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("v").alias("qv"),
    ).filter(F.col("query_id") < n_queries)
    scored = v.join(
        F.broadcast(queries), F.col("label") != F.col("query_label")
    ).withColumn("cos", F.round(cosine(F.col("qv"), F.col("v")), 6))
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "query_label", "rank", "vec_id", "label", "cos")
    )


def ivf_assign(emb: DataFrame, n_centroids: int = 16) -> DataFrame:
    """Assign every vector to its nearest centroid (argmax cosine).

    Codebook = the first n_centroids vectors (deterministic stand-in for a
    k-means fit, so the DuckDB oracle reproduces the assignment exactly).
    Ties break toward the lowest centroid_id.
    """
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    centroids = v.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    return _assign_nearest(v, centroids)


def _assign_nearest(v: DataFrame, codebook: DataFrame) -> DataFrame:
    """Map-only nearest-centroid assignment (round-6 rework).

    The old shape — crossJoin(broadcast(centroids)) → n·K rows each
    carrying TWO d-dim arrays → row_number window over vec_id — pushed
    ~6.4 GB (20k vectors × 312 centroids × 128 doubles at sf1) through a
    shuffle + sort just to pick a per-row argmax. Now the codebook
    collapses to ONE row (collect_list of (centroid_id, cv, nrm) structs,
    array_sorted by centroid_id), broadcast-attaches to the scan, and a
    single F.aggregate fold finds the argmax — each centroid's cosine is
    computed EXACTLY once per row (no duplicate-expression risk, cf. the
    CLAUDE.md HOF-CSE invariant), and nothing but (vec_id, v,
    centroid_id) ever leaves the map stage. Zero shuffles.

    Oracle parity: the cosine keeps the exact op order of cosine() —
    round(dot(v,cv) / (norm(v) * norm(cv)), 6) with norm(v) computed
    once per row (a deterministic function of the vector, so the double
    is unchanged) — and the strict > in the fold keeps the first (=
    lowest, the array is sorted) centroid_id on ties, identical to the
    old (ccos DESC, centroid_id ASC) row_number ordering.

    Scale note: K rides a broadcast, so this holds while the codebook
    fits an executor (~10⁵·d — far past the adaptive K = n/64 rule's
    gate range); a 10⁷-centroid regime would shard the codebook and
    take a per-shard argmax first.
    """
    cb = (
        codebook.withColumn("nrm", norm(F.col("cv")))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("centroid_id").cast("bigint").alias("centroid_id"),
                        "cv",
                        "nrm",
                    )
                )
            ).alias("_cb")
        )
    )
    vv = v.withColumn("_nv", norm(F.col("v"))).crossJoin(F.broadcast(cb))
    # transform → each centroid's cosine computed EXACTLY once (the fold
    # compares only struct fields); a compare-and-recompute fold would
    # double the dot products, a separate argmax over a ccos column would
    # re-evaluate the transform under project collapse.
    scored_arr = F.transform(
        F.col("_cb"),
        lambda c: F.struct(
            F.round(
                dot(F.col("v"), c["cv"]) / (F.col("_nv") * c["nrm"]), 6
            ).alias("cc"),
            c["centroid_id"].alias("cid"),
        ),
    )
    best = F.aggregate(
        scored_arr,
        F.struct(
            F.lit(float("-inf")).alias("cc"),
            F.lit(-1).cast("bigint").alias("cid"),
        ),
        lambda acc, x: F.when(x["cc"] > acc["cc"], x).otherwise(acc),
        lambda acc: acc["cid"],
    )
    return vv.select("vec_id", "v", best.alias("centroid_id"))


def ivf_assign_2level(
    emb: DataFrame, n_centroids: int, n_coarse: int, n_probe_cells: int = 1
) -> DataFrame:
    """Two-level (coarse-quantizer) nearest-centroid assignment.

    The single-level argmax (_assign_nearest) costs n·K cosines; with
    K = √n that assignment stage is Θ(n^1.5·d) — the documented limit of
    exact-nearest IVF ("cannot beat n^1.5 without a coarse quantizer in
    front"). This IS that coarse quantizer: the K fine centroids (first
    ``n_centroids`` vectors, deterministic as everywhere) are themselves
    bucketed under K1 = ``n_coarse`` coarse centroids (the first
    ``n_coarse`` vectors — a subset of the fine codebook, so a coarse
    cell normally owns at least itself; the duplicate-vector edge case
    where round-6 cosine ties divert even that is handled by the
    left-join below). A vector
    then takes ONE argmax over the K1 coarse cells and ONE argmax over
    that cell's fine members: K1 + K/K1 cosines instead of K. With
    K ≈ n^(2/3), K1 ≈ n^(1/3) the whole assignment is Θ(n^(4/3)·d).

    Approximate by construction (the true nearest fine centroid may live
    in a losing coarse cell — the standard IMI/IVF-HNSW trade); both
    argmax stages keep the exact cosine op order and lowest-id tie rule
    of _assign_nearest so a SQL oracle replays the bucketing
    bit-for-bit.

    ``n_probe_cells`` > 1 is the recall knob (multi-assignment, the
    IVF nprobe analog on the INDEX side): each vector lands in its
    top-P coarse cells — P rows out per vector, P× assignment and
    verify volume, straddling pairs recovered when any probed cell is
    shared. The gate stays P=1 (identical plan); the recall test
    measures the trade.

    Plan shape: the nested codebook collapses to ONE broadcast row of
    (coarse_id, gv, gnrm, members) structs — the whole assignment is a
    map-only scan, zero shuffles, every cosine computed exactly once.
    The stage-1 winner is emitted as a real output column (coarse_id),
    which also keeps it multiply-referenced so CollapseProject leaves it
    an attribute instead of inlining the fold into the stage-2 filter
    lambda (the HOF-CSE invariant: lambda bodies re-evaluate inlined
    outer EXPRESSIONS per element; attribute references are free).
    """
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    fine = v.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("vec_id"), F.col("v").alias("v")
    )
    coarse = v.filter(F.col("vec_id") < n_coarse).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    # fine centroid -> coarse cell (K×K1 work, tiny): same argmax fold,
    # same tie rule as the per-vector stages below and the oracle.
    fine_cells = _assign_nearest(fine, coarse).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("v").alias("cv"),
        F.col("centroid_id").alias("coarse_id"),
    )
    members = (
        fine_cells.withColumn("cnrm", norm(F.col("cv")))
        .groupBy("coarse_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("centroid_id").cast("bigint").alias("cid"),
                        "cv",
                        "cnrm",
                    )
                )
            ).alias("members")
        )
    )
    # LEFT join + empty-member default: a coarse cell CAN end up with no
    # fine members when vectors among the first K1 are parallel or
    # duplicated — cosine(f, g_i) round-ties cosine(f, g_j) exactly and
    # the lowest-id rule diverts every would-be member (including g_i
    # itself, whose self-cosine 1.0 ties its twin's). An inner join here
    # dropped that cell from _gb, breaking the positional invariant
    # below (_gb[_cell+1].coarse_id == _cell) for every higher id. The
    # empty cell itself is never SELECTED as _cell (a parallel twin at a
    # lower id always ties it and wins), so the empty-array fine stage
    # is unreachable — but every other cell's lookup must stay aligned.
    empty_members = F.array().cast(
        "array<struct<cid:bigint,cv:array<double>,cnrm:double>>"
    )
    cb = (
        coarse.withColumnRenamed("centroid_id", "coarse_id")
        .withColumn("gnrm", norm(F.col("cv")))
        .join(members, "coarse_id", "left")
        .withColumn("members", F.coalesce(F.col("members"), empty_members))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("coarse_id").cast("bigint").alias("coarse_id"),
                        F.col("cv").alias("gv"),
                        "gnrm",
                        "members",
                    )
                )
            ).alias("_gb")
        )
    )
    vv = v.withColumn("_nv", norm(F.col("v"))).crossJoin(F.broadcast(cb))
    coarse_scored = F.transform(
        F.col("_gb"),
        lambda g: F.struct(
            F.round(
                dot(F.col("v"), g["gv"]) / (F.col("_nv") * g["gnrm"]), 6
            ).alias("cc"),
            g["coarse_id"].alias("gid"),
        ),
    )
    coarse_win = F.aggregate(
        coarse_scored,
        F.struct(
            F.lit(float("-inf")).alias("cc"),
            F.lit(-1).cast("bigint").alias("gid"),
        ),
        lambda acc, x: F.when(x["cc"] > acc["cc"], x).otherwise(acc),
        lambda acc: acc["gid"],
    )
    if n_probe_cells > 1:
        p = min(n_probe_cells, n_coarse)
        ranked = F.slice(
            F.array_sort(
                coarse_scored,
                lambda l, r: F.when(l["cc"] > r["cc"], F.lit(-1))
                .when(l["cc"] < r["cc"], F.lit(1))
                .when(l["gid"] < r["gid"], F.lit(-1))
                .when(l["gid"] > r["gid"], F.lit(1))
                .otherwise(F.lit(0)),
            ),
            1,
            p,
        )
        staged = vv.select(
            "vec_id",
            "v",
            "_nv",
            "_gb",
            F.posexplode(ranked).alias("_pr", "_pc"),
        ).select(
            "vec_id", "v", "_nv", "_gb", F.col("_pc")["gid"].alias("_cell")
        )
    else:
        staged = vv.select(
            "vec_id", "v", "_nv", "_gb", coarse_win.alias("_cell")
        )
    # The winning cell's member list is at ARRAY INDEX _cell + 1: coarse
    # ids are exactly 0..K1-1 by construction (the first K1 vectors) and
    # _gb is array_sorted by coarse_id. A filter(...) lambda here would
    # reference _cell from inside a HOF body — Catalyst inlines the
    # whole stage-1 fold into the lambda and re-evaluates it PER ELEMENT
    # (measured: K1² cosines/row, 13.7 s vs 2.9 s at sf1's 20k vectors —
    # the single-level cost all over again). element_at keeps _cell in
    # plain expression position: worst case the fold evaluates twice per
    # row (members index + coarse_id output), never per element.
    mem = F.element_at(
        F.col("_gb"), (F.col("_cell") + F.lit(1)).cast("int")
    )["members"]
    fine_scored = F.transform(
        mem,
        lambda c: F.struct(
            F.round(
                dot(F.col("v"), c["cv"]) / (F.col("_nv") * c["cnrm"]), 6
            ).alias("cc"),
            c["cid"].alias("cid"),
        ),
    )
    fine_win = F.aggregate(
        fine_scored,
        F.struct(
            F.lit(float("-inf")).alias("cc"),
            F.lit(-1).cast("bigint").alias("cid"),
        ),
        lambda acc, x: F.when(x["cc"] > acc["cc"], x).otherwise(acc),
        lambda acc: acc["cid"],
    )
    return staged.select(
        "vec_id",
        "v",
        F.col("_cell").alias("coarse_id"),
        fine_win.alias("centroid_id"),
    )


def fit_ivf_codebook(
    emb: DataFrame, n_centroids: int = 16, seed: int = 7, max_iter: int = 20
) -> DataFrame:
    """Production codebook: KMeans-fit centroids (cosine distance).

    Returns (centroid_id, cv array<double>) — a tiny frame, always
    broadcast. The fit is one pass over a sample-able corpus; at 100 TB
    fit on a ~1M-vector sample (KMeans cost is O(n·k·d·iter), and
    centroid quality saturates long before the full corpus).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = emb.select(as_double(F.col("embedding")).alias("v"))
    feats = v.select(array_to_vector(F.col("v")).alias("features"))
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, distanceMeasure="cosine"
    ).fit(feats)
    rows = [
        (i, [float(x) for x in center])
        for i, center in enumerate(model.clusterCenters())
    ]
    return emb.sparkSession.createDataFrame(
        rows, "centroid_id int, cv array<double>"
    )


def ivf_assign_with_codebook(emb: DataFrame, codebook: DataFrame) -> DataFrame:
    """Nearest-centroid assignment against an arbitrary codebook frame.

    Same shape as ivf_assign but the codebook is an input (KMeans-fit in
    production, deterministic fixture for the oracle gate). One-row
    broadcast × corpus scan (map-only argmax — see _assign_nearest); at
    scale the output is written partitioned by centroid_id so probes
    prune partitions.
    """
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    return _assign_nearest(v, codebook)


def ivf_knn_fitted(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 8,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 7,
) -> DataFrame:
    """ANN with a KMeans-fit codebook and multi-probe search.

    Each query searches its nprobe nearest centroid buckets (nprobe=1 is
    the fastest/least-recall corner; nprobe=n_centroids degenerates to
    brute force). Plan: tiny probe table broadcast against the assigned
    corpus — the scan touches only probed buckets, which at scale is
    partition pruning on centroid_id.
    """
    codebook = fit_ivf_codebook(emb, n_centroids, seed=seed)
    assigned = ivf_assign_with_codebook(emb, codebook)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv"),
    )
    qscore = queries.crossJoin(F.broadcast(codebook)).withColumn(
        "qcos", F.round(cosine(F.col("qv"), F.col("cv")), 6)
    )
    wq = W.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qscore.withColumn("prk", F.row_number().over(wq))
        .filter(F.col("prk") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    a = assigned.alias("a")
    p = probes.alias("p")
    scored = a.join(
        F.broadcast(p),
        (F.col("a.centroid_id") == F.col("p.centroid_id"))
        & (F.col("a.vec_id") != F.col("p.query_id")),
    ).select(
        F.col("p.query_id").alias("query_id"),
        F.col("a.vec_id").alias("vec_id"),
        F.round(cosine(F.col("p.qv"), F.col("a.v")), 6).alias("cos"),
    )
    # no dedup needed: each vector lives in exactly one bucket, and a
    # query's probe list has distinct centroids → at most one match per pair
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


PQ_M = 4  # subspaces
PQ_K = 8  # sub-centroids per subspace


def pq_codes(emb: DataFrame, m: int = PQ_M, k: int = PQ_K) -> DataFrame:
    """Product quantization: split each vector into ``m`` subvectors,
    code each by its nearest sub-centroid (L2) — the compression layer
    under ADC-based ANN (Jégou et al. 2011): a d-dim float vector
    becomes m small ints, and distances against the codes need only
    m table lookups.

    Sub-codebooks = the first ``k`` vectors' subvectors (deterministic
    stand-in for the per-subspace k-means fit, same convention as
    ivf_assign so the oracle replays the coding exactly). Per-vector
    output: one code column per subspace (no array-typed outputs) plus
    the total quantization error.

    Plan: explode each vector into m (vec_id, sub) rows — a Generate,
    no shuffle — broadcast-join the (m·k)-row codebook, one window
    argmin per (vec_id, subspace), one final groupBy back to vectors.
    """
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    sub_len = (F.size("v") / m).cast("int")
    subs = v.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.slice("v", i * sub_len + 1, sub_len) for i in range(m)])
        ).alias("sub_m", "subv"),
    )
    cb = subs.filter(F.col("vec_id") < k).select(
        F.col("sub_m").alias("cb_m"),
        F.col("vec_id").alias("cid"),
        F.col("subv").alias("cv"),
    )
    l2sq = F.aggregate(
        F.zip_with(F.col("subv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = subs.join(
        F.broadcast(cb), F.col("sub_m") == F.col("cb_m")
    ).withColumn("d", F.round(l2sq, 6))
    w = W.partitionBy("vec_id", "sub_m").orderBy(F.col("d").asc(), F.col("cid").asc())
    best = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return best.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("sub_m") == i, F.col("cid"))).alias(f"c{i}")
            for i in range(m)
        ],
        F.round(F.sum("d"), 6).alias("qerr"),
    )


def pq_adc_knn(
    emb: DataFrame, n_queries: int = 5, k: int = 8, m: int = PQ_M, n_cb: int = PQ_K
) -> DataFrame:
    """Approximate top-k via Asymmetric Distance Computation over PQ
    codes: the query stays full-precision, the corpus is its m sub-
    centroid ids, and each query builds an (m × k)-entry lookup table of
    sub-distances — corpus distance = sum of m table lookups.

    This is the memory-bound ANN regime PQ exists for: at 100 TB the
    coded corpus is ~d·4/m× smaller than the vectors (64 floats → 4
    bytes here), the LUT is broadcast-sized, and the scan does integer
    joins instead of float vector math. Ranking is on quantized
    distances, so recall < 1 by construction — and the oracle reproduces
    the same approximation, error included.
    """
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    sub_len = (F.size("v") / m).cast("int")

    def exploded(df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id",
            F.posexplode(
                F.array(*[F.slice("v", i * sub_len + 1, sub_len) for i in range(m)])
            ).alias("sub_m", "subv"),
        )

    codes_long = (
        pq_codes(emb, m, n_cb)
        .select(
            "vec_id",
            F.posexplode(F.array(*[F.col(f"c{i}") for i in range(m)])).alias(
                "sub_m", "cid"
            ),
        )
    )
    cb = exploded(v.filter(F.col("vec_id") < n_cb)).select(
        F.col("sub_m").alias("cb_m"),
        F.col("vec_id").alias("cid"),
        F.col("subv").alias("cv"),
    )
    queries = exploded(v.filter(F.col("vec_id") < n_queries)).select(
        F.col("vec_id").alias("query_id"),
        F.col("sub_m").alias("q_m"),
        F.col("subv").alias("qv"),
    )
    l2sq = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = queries.join(
        F.broadcast(cb), F.col("q_m") == F.col("cb_m")
    ).select("query_id", F.col("q_m").alias("sub_m"), "cid", F.round(l2sq, 6).alias("d"))
    adc = (
        codes_long.join(F.broadcast(lut), ["sub_m", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("d"), 6).alias("adc_d"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("adc_d").asc(), F.col("vec_id").asc())
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "adc_d")
    )


def ivf_adc_knn(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 8,
    n_centroids: int = 16,
    m: int = PQ_M,
    n_cb: int = PQ_K,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011, §IV): the inverted-file coarse
    quantizer IN FRONT OF the PQ-coded scan — the architecture behind
    FAISS's IndexIVFPQ. A query probes only its own centroid's bucket
    (ivf_knn's restriction) and ranks those candidates by Asymmetric
    Distance Computation over their PQ codes (pq_adc_knn's LUT trick):
    per candidate, m integer table lookups instead of a d-dim float
    fold.

    Both approximations compose — bucket recall (nprobe=1) × code
    quantization error — and the oracle replays both, so the gate
    hash-checks the composed approximation, not an idealized answer.
    Production differences (documented, not implemented): codebooks are
    KMeans-fit, codes store RESIDUALS v − centroid (deterministic too,
    but the direct coding keeps the oracle shared with pq_adc_knn),
    and nprobe > 1 trades scan volume for bucket recall.

    Scale shape: coding is the one shuffle (pq_codes' per-(vec, sub)
    argmin — an offline pass in production, the codes table is what's
    stored); search itself is candidate ⋈ codes ⋈ broadcast LUT — the
    candidate list is bounded by n_queries·max_bucket and broadcast,
    the LUT is n_queries·m·k rows, and at 100 TB the codes table is
    partitioned by centroid_id so the probe is partition pruning over
    integers (d·4/m× smaller than the vectors)."""
    assigned = ivf_assign(emb, n_centroids)
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("centroid_id").alias("qc"),
    )
    cand = (
        assigned.select("vec_id", "centroid_id")
        .join(
            F.broadcast(queries),
            (F.col("centroid_id") == F.col("qc"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id")
    )
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    sub_len = (F.size("v") / m).cast("int")

    def exploded(df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id",
            F.posexplode(
                F.array(*[F.slice("v", i * sub_len + 1, sub_len) for i in range(m)])
            ).alias("sub_m", "subv"),
        )

    codes_long = pq_codes(emb, m, n_cb).select(
        "vec_id",
        F.posexplode(F.array(*[F.col(f"c{i}") for i in range(m)])).alias(
            "sub_m", "cid"
        ),
    )
    cb = exploded(v.filter(F.col("vec_id") < n_cb)).select(
        F.col("sub_m").alias("cb_m"),
        F.col("vec_id").alias("cid"),
        F.col("subv").alias("cv"),
    )
    q_subs = exploded(v.filter(F.col("vec_id") < n_queries)).select(
        F.col("vec_id").alias("query_id"),
        F.col("sub_m").alias("q_m"),
        F.col("subv").alias("qv"),
    )
    l2sq = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = q_subs.join(
        F.broadcast(cb), F.col("q_m") == F.col("cb_m")
    ).select(
        "query_id", F.col("q_m").alias("sub_m"), "cid", F.round(l2sq, 6).alias("d")
    )
    adc = (
        codes_long.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(lut), ["query_id", "sub_m", "cid"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("d"), 6).alias("adc_d"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("adc_d").asc(), F.col("vec_id").asc())
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "adc_d")
    )


def ivf_knn(
    emb: DataFrame, n_queries: int = 5, k: int = 5, n_centroids: int = 16
) -> DataFrame:
    """Approximate top-k: search only the query's own centroid bucket.

    nprobe=1 — recall < 1 by design; the operator contract is the bucketed
    plan shape, and the oracle reproduces the same approximation.
    """
    assigned = ivf_assign(emb, n_centroids).cache()
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("centroid_id").alias("qc"),
    )
    scored = (
        assigned.join(
            F.broadcast(queries),
            (F.col("centroid_id") == F.col("qc"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("v")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


# --- Johnson-Lindenstrauss random projection ------------------------------

JL_K = 16  # target dimensionality for the gate configuration


def jl_project(emb: DataFrame, k: int = JL_K) -> DataFrame:
    """Random-projection dimensionality reduction (Johnson-Lindenstrauss):
    64-d embeddings → k-d via the frozen hyperplane matrix
    (functions/hashing.srp_planes — the same engine-stable doubles the
    SRP dedup uses), reported as the first two coordinates plus the
    norm-preservation ratio.

    JL guarantee: pairwise distances survive the projection to within
    1±ε for k = O(ln n / ε²) — the cheap precursor that shrinks vectors
    before an expensive index build (IVF/PQ) or a brute top-k pass.
    Components are uniform [-1,1) (E[c²]=1/3), so norms scale by
    ≈ √(k/3) in expectation; tests assert the concentration.

    Scale: one map stage — the k dot products run inside the scan, the
    projection matrix is one nested-array literal (k·64 doubles), no
    shuffle anywhere. Folds are left-to-right so the oracle's
    list_inner_product replays bit-for-bit.
    """
    from pleiades_spark.functions.hashing import srp_planes
    from pleiades_spark.functions.vectors import attach_matrix

    planes = srp_planes(k)
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    # broadcast one-row matrix, not a nested literal — see attach_matrix
    proj = attach_matrix(v, planes).select(
        "vec_id",
        "v",
        F.transform(F.col("_planes"), lambda p: dot(F.col("v"), p)).alias("proj"),
    )
    norm16 = F.sqrt(
        F.aggregate(
            F.col("proj"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return proj.select(
        "vec_id",
        F.round(F.element_at("proj", 1), 6).alias("p0_r"),
        F.round(F.element_at("proj", 2), 6).alias("p1_r"),
        F.round(norm16 / norm(F.col("v")), 6).alias("norm_ratio_r"),
    )


# --- MMR diversified rerank ------------------------------------------------

MMR_LAMBDA = 0.5  # 1/2 — exact in binary, so both engines compute the
MMR_CANDIDATES = 12  # same doubles (CLAUDE.md frozen-float-constant rule)
MMR_K = 5


def mmr_rerank(
    emb: DataFrame,
    n_queries: int = 5,
    n_candidates: int = MMR_CANDIDATES,
    k: int = MMR_K,
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998):
    greedily pick k results per query maximizing
    ``λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`` — the diversified-retrieval
    step a RAG / training-data-selection pipeline runs AFTER ANN, so the
    k context passages aren't five near-copies of the same paragraph.

    Scale shape: candidate generation (the broadcast-queries brute scan
    here; the IVF path at corpus scale) is the only stage that touches
    the corpus. Everything after runs on Q·c candidate rows and the
    Q·c² candidate-pair sims, both computed JVM-side. The greedy
    selection itself is inherently SEQUENTIAL in k but INDEPENDENT
    across queries — so it runs as a cogrouped ``applyInPandas`` over
    ``query_id`` (candidates ⋈ sims per group, ≤ c + c² tiny rows per
    group): one shuffle, parallel in Q. The previous formulation — a
    (k−1)-step driver loop of global joins — was parallel in the wrong
    axis: k−1 sequential Spark jobs whose scheduling overhead dominates
    (4.8 s at sf0.1, flat 1.4× to sf10) and whose wall-clock can never
    go below k jobs no matter how many executors exist. Measured swap:
    4.84 → ~1.3 s at sf0.1, same hash.

    Determinism: rel and pairwise sims round to 6 JVM-side before the
    greedy stage (ties broken by vec_id), λ = MMR_LAMBDA = 0.5 is exact
    in binary, and the pandas greedy replays the exact double ops
    (0.5·rel − 0.5·maxsim, floor-quantize ×1e6) — Arrow moves doubles
    bit-exactly, so the oracle's unrolled CTEs match hash-for-hash.
    """
    import math

    import pandas as pd
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    queries = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = v.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).withColumn("rel", F.round(cosine(F.col("qv"), F.col("v")), 6))
    w = W.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("vec_id").asc()
    )
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_candidates)
        .select("query_id", "vec_id", "rel", "v")
        .localCheckpoint(eager=True)
    )
    a = cand.select(
        "query_id", F.col("vec_id").alias("va"), F.col("v").alias("xa")
    )
    b = cand.select(
        "query_id", F.col("vec_id").alias("vb"), F.col("v").alias("xb")
    )
    sims = (
        a.join(b, ["query_id"])
        .filter(F.col("va") != F.col("vb"))
        .select(
            "query_id",
            "va",
            "vb",
            F.round(cosine(F.col("xa"), F.col("xb")), 6).alias("s"),
        )
        # tiny Q·c² frame; the checkpoint also severs the shared-lineage
        # ambiguity between the cogroup's two sides (both trace to cand)
        .localCheckpoint(eager=True)
    )
    cand = cand.drop("v")
    lam = MMR_LAMBDA
    inv = 1.0 - MMR_LAMBDA

    def greedy(cand_pdf: "pd.DataFrame", sims_pdf: "pd.DataFrame"):
        # One query's candidates (≤ c rows) + pairwise sims (≤ c² rows).
        # Pure-Python doubles replay the JVM expression exactly: inputs
        # are already rounded to 6, λ is binary-exact, and *, -, floor,
        # / are the same IEEE-754 ops in both engines.
        if cand_pdf.empty:
            return pd.DataFrame(
                {"query_id": [], "sel_rank": [], "vec_id": [], "score": []}
            )
        qid = cand_pdf["query_id"].iloc[0]
        order = cand_pdf.sort_values(
            ["rel", "vec_id"], ascending=[False, True]
        )
        ids = [int(x) for x in order["vec_id"]]
        if len(set(ids)) != len(ids):
            # PK violation upstream: two candidate rows share a vec_id
            # (how round 8 caught the scale-fixture stride collision).
            # Surface it now — a silent dedupe here would hide data
            # corruption behind a plausible-looking rerank.
            raise ValueError(
                f"mmr_rerank: duplicate vec_id among candidates for "
                f"query {qid} — vec_id must be unique in the corpus"
            )
        rel = dict(zip(ids, (float(x) for x in order["rel"])))
        sim = {
            (int(a_), int(b_)): float(s_)
            for a_, b_, s_ in zip(
                sims_pdf["va"], sims_pdf["vb"], sims_pdf["s"]
            )
        }
        selected = [ids[0]]
        rows = [(qid, 1, ids[0], rel[ids[0]])]
        remaining = ids[1:]
        for rank in range(2, k + 1):
            if not remaining:
                break
            best_mmr, best_id = None, None
            for c in remaining:
                maxsim = max(sim[(c, s_)] for s_ in selected)
                mmr = lam * rel[c] - inv * maxsim
                if best_mmr is None or mmr > best_mmr or (
                    mmr == best_mmr and c < best_id
                ):
                    best_mmr, best_id = mmr, c
            score = math.floor(best_mmr * 1000000 + 0.5) / 1000000
            rows.append((qid, rank, best_id, score))
            selected.append(best_id)
            remaining.remove(best_id)
        return pd.DataFrame(
            rows, columns=["query_id", "sel_rank", "vec_id", "score"]
        )

    return (
        cand.groupBy("query_id")
        .cogroup(sims.groupBy("query_id"))
        .applyInPandas(
            greedy,
            schema="query_id long, sel_rank int, vec_id long, score double",
        )
    )


# --- deterministic Lloyd's k-means (hash-gatable codebook fit) -------------

KMEANS_K = 8
KMEANS_ITERS = 3


def kmeans_fit_deterministic(
    emb: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> DataFrame:
    """Lloyd's k-means with every nondeterminism removed, so the FITTED
    codebook itself hash-matches a DuckDB replay — closing the "a
    fitted codebook can't be oracle-gated" gap for the deterministic
    case (MLlib's randomized kmeans|| fit, fit_ivf_codebook, stays
    recall-tested: its seeds live engine-side by nature).

    Determinism ledger, iteration by iteration:
    - init: centroids = the first k vectors (same rule as every IVF
      operator here; /root/reference has no kmeans — this extends the
      deterministic-codebook family).
    - assignment: the _assign_nearest map-only argmax fold — cosines
      rounded to 6 BEFORE comparison, ties to the lowest centroid_id;
      the oracle replays it as the (cos DESC, cid ASC) row_number.
    - update: per-dimension MEAN as integer micro-units — each member
      coordinate quantizes to floor(x·1e6 + 0.5) BIGINT, the per-cell
      sum is EXACT (order-independent, unlike double summation, which
      diverges between Spark's partition order and DuckDB's scan
      order), and the mean re-quantizes to one micro integer via
      floor(s/n + 0.5) before the single /1e6 division. Every arriving
      double is therefore bit-identical across engines.
    - empty cells keep their previous centroid (left join + coalesce,
      replayed by the oracle).

    Scale shape per iteration: assignment is the zero-shuffle broadcast
    fold (n·k cosines in the scan); the update is one posexplode →
    groupBy(cell, pos) with map-side combine onto a k·d-row grain; the
    centroid rebuild is a k-row collect. The k-row frame
    localCheckpoints between iterations — bounded, and it severs the
    iteration-to-iteration lineage (plan depth stays O(1), not
    O(iters)).

    Output: (centroid_id, pos, val, n_members) — the codebook exploded
    to hashable scalars plus the final-assignment member census.
    """
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    cents = v.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    for _ in range(iters):
        assigned = _assign_nearest(
            v, cents.select(F.col("centroid_id"), F.col("cv"))
        )
        dims = assigned.select(
            F.col("centroid_id").alias("cell"),
            F.posexplode("v").alias("pos", "x"),
        )
        upd = (
            dims.groupBy("cell", "pos")
            .agg(
                F.sum(
                    F.floor(F.col("x") * 1000000 + F.lit(0.5)).cast("long")
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cell",
                "pos",
                (
                    F.floor(
                        F.col("s").cast("double") / F.col("n") + F.lit(0.5)
                    )
                    / F.lit(1000000.0)
                ).alias("val"),
            )
        )
        newc = (
            upd.groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "val"))
                ).alias("pv")
            )
            .select(
                F.col("cell").alias("centroid_id"),
                F.transform(F.col("pv"), lambda s: s["val"]).alias("cv_new"),
            )
        )
        cents = (
            cents.join(newc, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("cv_new"), F.col("cv")).alias("cv"),
            )
            .localCheckpoint(eager=True)
        )
    final = _assign_nearest(v, cents)
    census = final.groupBy(F.col("centroid_id").alias("cid")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        cents.select(
            "centroid_id", F.posexplode("cv").alias("pos", "val")
        )
        .join(census, F.col("centroid_id") == F.col("cid"), "left")
        .select(
            "centroid_id",
            "pos",
            "val",
            F.coalesce(F.col("n_members"), F.lit(0).cast("long")).alias(
                "n_members"
            ),
        )
    )
