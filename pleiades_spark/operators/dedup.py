"""Deduplication operators over the ``documents`` table.

Strategies, all Spark-built-in (no Python UDFs anywhere):

  exact            hash-groupBy on the full text (canonical rep = min id)
  minhash_lsh      shingle → minhash signature → banded LSH → candidate
                   pairs → exact-Jaccard verification
  simhash          32-bit simhash → byte-chunk blocking → Hamming ≤ r pairs
  ngram_jaccard    exact blocked all-pairs shingle Jaccard (ground truth)
  prefix_jaccard   EXACT Jaccard join via prefix filtering (AllPairs /
                   PPJoin) — recall-1 scale path, no all-pairs block
  embedding_pairs  cosine near-dup pairs on the embeddings table
                   (brute ground truth + IVF-bucketed + SRP cosine-LSH)

Scale design (the reason each shape was chosen):
  * exact: one shuffle on the text hash; at 100 TB hash first (md5) so the
    shuffle key is 16 bytes, not the document body.
  * minhash_lsh: cost is O(docs × bands) explode + a shuffle on band keys;
    candidate verification touches only colliding pairs. This is THE scale
    path — never all-pairs. Hot band buckets (boilerplate docs) are the
    skew risk: cap bucket size or salt in production.
  * simhash: signature is one long; blocking on 4 byte-chunks bounds the
    self-join. Hamming check is bit_count(xor) — codegen'd.
  * ngram_jaccard: all-pairs with a length-band block — quadratic, kept as
    the small-SF ground truth the LSH variants are judged against.
  * embedding_pairs: brute at fixture scale; the ANN path for 100 TB is in
    operators/similarity.py (IVF bucketing).

All sketches use the md5-derived h32 (functions/hashing.py) so the DuckDB
oracle reproduces signatures bit-for-bit (see plans/llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pleiades_spark.functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_P,
    MINHASH_PERMS,
    NUM_PERM,
    SRP_BANDS,
    SRP_PLANES,
    SRP_ROWS,
    h32,
    perm_hash,
    srp_planes,
)
from pleiades_spark.functions.text import (
    tokens,
    word_shingles,
    word_shingles_from_tokens,
)
from pleiades_spark.functions.vectors import as_double, cosine, dot, norm

# MEASURED DEAD END (round 10): unrolling the pair-verify dot to a
# fixed-width element_at chain — hoping to trade the interpreted HOF
# fold for whole-stage codegen — ran 15× SLOWER (4.6 s vs 74.9 s on
# 2M×64-dim rows): 128 independent element_at trees each re-touch the
# array with null/bounds checks, while the fold materializes the
# zip_with product array once and loops. The interpreted fold IS the
# fast exact-order dot; the remaining per-pair verify cost at 10⁹-pair
# scale is the floor of the exact-fold contract, not an expression
# problem. (A BLAS/applyInPandas verify would be ~100× faster but sums
# in a different float order — it would break the bit-exact oracle.)


# --- exact ---------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """(text_md5, rep_doc_id, n_copies) per distinct text.

    Deterministic canonical representative (min doc_id) — NOT
    dropDuplicates, whose survivor is partition-order-dependent.
    """
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --- minhash + LSH -------------------------------------------------------


def minhash_sig_from_hashes(hashed: Column) -> Column:
    """MinHash signature fold over a PRECOMPUTED h32 array: array of
    NUM_PERM minima over the permuted hashes. Split out so callers that
    also need the hash array for other purposes (doc_dedup_reps' int32
    verify sets) can stage it as a real column and hash exactly once —
    the no-CSE-across-HOF-arguments invariant."""
    start = F.array_repeat(F.lit(MINHASH_P + 1).cast("long"), NUM_PERM)

    def _step(acc: Column, h: Column) -> Column:
        perms = F.array(*[perm_hash(h, a, b) for a, b in MINHASH_PERMS])
        return F.zip_with(acc, perms, lambda x, y: F.least(x, y))

    return F.aggregate(hashed, start, _step)


def minhash_signature(shingles: Column) -> Column:
    """Array of NUM_PERM minima over the shingle set's permuted hashes.

    ONE left fold computes everything: the md5-derived h32 is evaluated
    exactly once per shingle (as the fold's transformed input), and the
    accumulator is the running element-wise minimum of the NUM_PERM affine
    permutations. (The naive "NUM_PERM × transform(hashed, …)" form
    re-evaluates the md5 array once per permutation — Catalyst does not CSE
    across higher-order-function arguments.)
    """
    return minhash_sig_from_hashes(F.transform(shingles, h32))


def with_signature(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    # Fixture tables arrive as one parquet file → one partition; hashing is
    # the CPU hot spot, so spread it before computing signatures. (At real
    # scale the scan already has many splits and this shuffle is a no-op to
    # keep — it also pre-partitions by doc_id for the verification joins.)
    # Tokens staged as a real column (round 13): the inline shingle form
    # re-splits the text per reference — see word_shingles_from_tokens.
    from pleiades_spark.functions.text import tokens, word_shingles_from_tokens

    return (
        docs.repartition(F.col("doc_id"))
        .select("doc_id", *keep, "text", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            *keep,
            word_shingles_from_tokens(F.col("toks"), F.col("text")).alias("sh"),
        )
        .withColumn("sig", minhash_signature(F.col("sh")))
    )


def band_keys(sig: Column) -> Column:
    """Array of LSH_BANDS strings, each joining LSH_ROWS signature slots."""
    return F.array(
        *[
            F.array_join(
                F.transform(
                    F.slice(sig, j * LSH_ROWS + 1, LSH_ROWS),
                    lambda x: x.cast("string"),
                ),
                "-",
            )
            for j in range(LSH_BANDS)
        ]
    )


def _guard_expected_pairs(
    keyed: DataFrame,
    key_cols: tuple[str, ...],
    op: str,
    max_expected_pairs: int | None,
    reps_alternative: str,
) -> None:
    """Output-volume pre-flight for pair-emitting contracts (round 12).

    The input-row quadratic guards (_guard_quadratic) miss how pair
    operators actually die at scale: by OUTPUT volume. A corpus of n docs
    in 1000-copy groups has only n input rows but Σ C(mult, 2) ≈ 500·n
    true pairs — the sf100 lesson (BENCH_SF100.md: pair enumerators
    bounded below by their own ~10⁹-row output). The exact raw candidate
    count is already computable from the band/bucket index in hand before
    the self-join runs: Σ over buckets of C(bucket_size, 2) — ONE
    aggregation (map-side combined groupBy count, then a global sum of
    b·(b−1) DIV 2, exact in int64 up to 3·10⁹-row buckets). When the
    estimate blows the caller's budget, raise BEFORE enumerating, with a
    pointer to the linear reps contract that sidesteps the pair grain.

    The estimate counts bucket co-occupancy per band, so it upper-bounds
    distinct pairs (a pair sharing k bands counts k times) and — for
    incremental (``new_col``) runs — also counts old×old pairs the join
    itself would skip; both biases are toward raising early, the safe
    direction for a pre-flight. None (the default, and the gate path)
    skips the extra job entirely.
    """
    if max_expected_pairs is None:
        return
    # SECOND-order moment: b·(b−1) overflows int64 exactly on the
    # pathological corpora this guard targets (CLAUDE.md exact-integer
    # rule) — compute decimal(38,0), exact and ANSI-safe at any bucket
    est = (
        keyed.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("b"))
        .agg(
            F.sum(
                F.col("b").cast("decimal(38,0)") * (F.col("b") - 1) / 2
            ).alias("pairs")
        )
        .collect()[0]["pairs"]
    )
    est = int(est or 0)
    if est > max_expected_pairs:
        raise ValueError(
            f"{op}: expected candidate-pair volume ≈{est:,} exceeds "
            f"max_expected_pairs={max_expected_pairs:,}. Pair-emitting "
            f"dedup is Θ(Σ multiplicity²) in its own output on "
            f"high-multiplicity corpora; use the linear-output reps "
            f"contract ({reps_alternative}) instead, or raise the budget "
            f"if you really want the pairs."
        )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    max_bucket_size: int | None = None,
    new_col: str | None = None,
    candidate_observation=None,
    max_expected_pairs: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified by exact Jaccard.

    Plan: docs → (doc_id, shingles, sig) → posexplode(bands) → self-join on
    (band_idx, band_key) → distinct candidate pairs → re-join shingle sets
    → exact Jaccard filter. Signatures are computed once and reused via the
    banded explode; the self-join shuffles on the band key.

    ``max_bucket_size`` is the hot-bucket guard for boilerplate-heavy
    corpora: a band bucket shared by B docs yields B² candidate pairs in
    ONE task (the join key is the bucket), so a template shared by 10⁶
    docs is both a skew straggler and a quadratic blowup. Buckets larger
    than the cap are dropped from candidate generation — near-identical
    boilerplate docs collide in *every* band, so recall for true
    near-dups survives unless all LSH_BANDS buckets blow the cap at once;
    exact-identical docs are exact_dedup_groups' job anyway. None (the
    default, used by the oracle gate) keeps candidate generation
    lossless.

    ``new_col`` names a boolean column marking this run's INCREMENT: when
    set, only pairs touching at least one new doc are generated/verified —
    old×old pairs were found by previous runs, so the nightly job's work
    is O(new-side bucket occupancy), not O(corpus²) re-done every run.
    The bands/signatures of old docs would come from the previous run's
    persisted index in production; here they recompute from the same
    deterministic hashes, which is bit-identical.

    ``candidate_observation``: optional ``pyspark.sql.Observation`` —
    raw pre-distinct candidate volume (the quantity hot band buckets
    blow up), same production-alarm contract as the prefix joins'
    (_observe_candidates). ``max_expected_pairs`` is the PRE-flight twin
    (round 12): the exact Σ C(bucket, 2) candidate volume is one
    aggregation over the band index, checked BEFORE the self-join runs
    (_guard_expected_pairs) — the observation alarms after the fact, the
    guard refuses to start a ~10⁹-row enumeration at all.
    """
    sel = ["doc_id"] + ([new_col] if new_col else [])
    signed = with_signature(docs, keep=tuple(sel[1:])).cache()
    bands = signed.select(
        *sel, F.posexplode(band_keys(F.col("sig"))).alias("band_idx", "band_key")
    )
    if max_bucket_size is not None:
        # windowed count shuffles on the same (band_idx, band_key) the
        # self-join needs — co-located, no extra exchange in the joined plan
        wb = W.partitionBy("band_idx", "band_key")
        bands = (
            bands.withColumn("bucket_size", F.count(F.lit(1)).over(wb))
            .filter(F.col("bucket_size") <= max_bucket_size)
            .drop("bucket_size")
        )
    _guard_expected_pairs(
        bands.select("band_idx", "band_key"),
        ("band_idx", "band_key"),
        "minhash_lsh_pairs",
        max_expected_pairs,
        "doc_dedup_reps / q_dedup_keep_best_reps",
    )
    left = bands.alias("l")
    right = bands.alias("r")
    cond = (
        (F.col("l.band_idx") == F.col("r.band_idx"))
        & (F.col("l.band_key") == F.col("r.band_key"))
        & (F.col("l.doc_id") < F.col("r.doc_id"))
    )
    if new_col:
        cond = cond & (F.col(f"l.{new_col}") | F.col(f"r.{new_col}"))
    cand = _observe_candidates(
        left.join(right, cond).select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        ),
        candidate_observation,
    ).distinct()
    sh = signed.select("doc_id", "sh")
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def _staged_minhash(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *keep, sig, hset): the h32 shingle-hash array staged as a
    real column feeds BOTH the MinHash signature fold and the distinct
    int32 verify set (h − 2³¹ — the lossless 4-byte bijection
    prefix_jaccard_pairs introduced; the verify arrays are the bytes
    that ride the edge joins). hs is multi-referenced and non-cheap, so
    CollapseProject leaves the staging projection intact (the
    _with_dtoks precedent). Tokens staged as a real column too (round
    13, −8.6 % on the sf100 staging scan): see
    word_shingles_from_tokens."""
    from pleiades_spark.functions.text import tokens, word_shingles_from_tokens

    return (
        docs.repartition(F.col("doc_id"))
        .select("doc_id", *keep, "text", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            *keep,
            word_shingles_from_tokens(F.col("toks"), F.col("text")).alias("sh"),
        )
        .select("doc_id", *keep, F.transform("sh", h32).alias("hs"))
        .select(
            "doc_id",
            *keep,
            minhash_sig_from_hashes(F.col("hs")).alias("sig"),
            F.array_distinct(
                F.transform("hs", lambda h: (h - F.lit(2**31)).cast("int"))
            ).alias("hset"),
        )
    )


def _verify_hashed_edges(
    edges: DataFrame, staged: DataFrame, threshold: float
) -> DataFrame:
    """Exact hashed-shingle Jaccard verification of (doc_id, rep) star
    edges against the staged (doc_id, hset) sets: |∩| / (n_a + n_b −
    |∩|) ≥ threshold, rounded to 6 — shared by the full and incremental
    reps builders so both phases verify identically (and identically to
    the oracle)."""
    hn = staged.select("doc_id", "hset", F.size("hset").alias("n"))
    ha = hn.select(
        F.col("doc_id"), F.col("hset").alias("ha"), F.col("n").alias("na")
    )
    hb = hn.select(
        F.col("doc_id").alias("rep"), F.col("hset").alias("hb"),
        F.col("n").alias("nb"),
    )
    inter = F.size(F.array_intersect("ha", "hb"))
    return (
        edges.join(ha, "doc_id")
        .join(hb, "rep")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "rep")
    )


def doc_dedup_reps(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """Linear-output DOCUMENT dedup: (doc_id, rep_id) via MinHash band
    bucket-min star edges + connected components — the text-side twin of
    :func:`embedding_dedup_reps` (round 11, closing the round-10
    asymmetry: ANY pair contract is Θ(Σ multiplicity²), and template /
    boilerplate text corpora have exactly the multiplicity shape that
    lower-bounds pair enumeration at ~10⁹ rows at sf100 — yet text dedup
    previously ended at pair emission + CC).

    Plan (every stage linear in n·LSH_BANDS):
      1. one corpus scan stages the h32 shingle-hash array as a REAL
         column (minhash_sig_from_hashes — hashing runs once, not once
         per HOF argument), yielding both the MinHash signature and the
         distinct int32 verify set (h − 2³¹: the lossless 4-byte
         bijection prefix_jaccard_pairs introduced — the verify arrays
         are the bytes that ride the edge join, and 6 KB string arrays
         at ~10⁸ edges were the sf100 DNF mechanism there);
      2. per (band_idx, band_key) bucket, candidate rep = min doc_id —
         a groupBy (map-side partial min, no single-task window sort
         even on a 10⁶-doc boilerplate bucket) joined back on the band
         key; star edges (member → bucket-min), distinct over bands —
         at most LSH_BANDS edges per doc, NEVER B² per bucket, so hot
         buckets cost bucket-size, not bucket-size²;
      3. each edge verified by exact hashed-shingle Jaccard ≥ t —
         |∩| / (n_a + n_b − |∩|) over the int32 sets. Jaccard over h32
         sets differs from string-shingle Jaccard only on an in-pair
         h32 collision (≈600²/2³³ ≈ 4e-5 per pair) and the DuckDB
         oracle hashes identically, so the gate stays exact — the
         prefix_jaccard_pairs precedent;
      4. large-star/small-star CC over verified edges; singletons keep
         themselves (rep_id = doc_id).

    Cluster semantics: two docs share a rep iff they connect through
    verified member→bucket-min edges. Relative to pairs+CC, an edge is
    missed when a member's Jaccard to its bucket's MIN fails t even
    though some other in-bucket pair passes — so recall rides bucket
    PURITY. The recall target is DUPLICATE-GROUP capture (copies share
    band keys in every band, so each of the LSH_BANDS bands gives an
    independent rep draw that transitive closure merges);
    tests/test_ann_recall.py audits copy-group recovery on a
    high-multiplicity corpus and component-granularity precision (every
    edge Jaccard-verified ⇒ a cluster can never span two true
    pair-graph components).
    """
    staged = _staged_minhash(docs).cache()
    bands = staged.select(
        "doc_id", F.posexplode(band_keys(F.col("sig"))).alias("band_idx", "band_key")
    )
    reps = bands.groupBy("band_idx", "band_key").agg(F.min("doc_id").alias("rep"))
    edges = (
        bands.join(reps, ["band_idx", "band_key"])
        .filter(F.col("doc_id") != F.col("rep"))
        .select("doc_id", "rep")
        .distinct()
    )
    verified = _verify_hashed_edges(edges, staged, threshold)
    from pleiades_spark.operators.graph import connected_components_star

    cc = connected_components_star(verified, src="doc_id", dst="rep")
    return (
        staged.select("doc_id")
        .join(cc.withColumnRenamed("cluster", "rep_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("rep_id"), F.col("doc_id")).alias("rep_id"),
        )
    )


def doc_dedup_reps_incremental(
    docs: DataFrame, new_col: str, threshold: float = 0.6
) -> DataFrame:
    """Nightly-increment maintenance of the linear reps contract: tonight's
    work is O(increment), not a full-corpus recompute — the reps twin of
    minhash_lsh_pairs' ``new_col`` mode (round 11).

    Two phases, both replayed by the oracle:
      OLD (last night's run, recomputed here deterministically — in
      production it is the persisted band index + edge set): star edges
      and bucket-mins over the NOT-new slice only, verified;
      NEW (tonight): only band buckets CONTAINING a new doc participate.
      The bucket's candidate rep is the min over old ∪ new members
      (= min(stored old bucket-rep, new members) — the old bucket-min IS
      the min of the old members, so the index needs only the rep, not
      the members). Edges: every new member, plus the old bucket-rep
      when a new doc undercuts it (the bridge that lets tonight's doc
      merge two existing clusters), each to the bucket's full min.
      Per-bucket work is O(new members + 1) — old×old pairs never
      regenerate.

    Both phases verify edges with the same hashed-shingle Jaccard and
    the final assignment is one connected-components pass over the UNION
    of verified edges. The result is the incremental-protocol contract,
    not necessarily bit-equal to a full doc_dedup_reps recompute (bucket
    mins seen by last night's run differ from full-corpus mins) — the
    recall test pins that copy groups SPLIT across the old/new slices
    still cluster; the oracle pins every step bit-for-bit.
    """
    staged = _staged_minhash(docs, keep=(new_col,)).cache()
    bands = staged.select(
        "doc_id",
        F.col(new_col).alias("_new"),
        F.posexplode(band_keys(F.col("sig"))).alias("band_idx", "band_key"),
    )
    # One window pass over the band keys replaces the r12 shape's two
    # bucket aggregations + three joins (5 shuffles → 2): per bucket,
    # the old rep (min over the not-new slice; null when the bucket is
    # all-new, matching the old left join), the full rep, and whether
    # any member is new. Each band row then emits its old-phase and/or
    # new-phase star edge inline; the edge SET (post-distinct) is
    # identical to the r12 plan's, so the Jaccard verify, the CC pass,
    # and the oracle replay are unchanged.
    wb = W.partitionBy("band_idx", "band_key")
    ann = bands.select(
        "doc_id",
        "_new",
        F.min(F.when(~F.col("_new"), F.col("doc_id"))).over(wb).alias("orep"),
        F.min("doc_id").over(wb).alias("frep"),
        F.max(F.col("_new").cast("int")).over(wb).alias("has_new"),
    )
    edges = (
        ann.select(
            F.explode(
                F.array_compact(
                    F.array(
                        F.when(
                            (~F.col("_new"))
                            & (F.col("doc_id") != F.col("orep")),
                            F.struct(
                                F.col("doc_id"), F.col("orep").alias("rep")
                            ),
                        ),
                        F.when(
                            (F.col("has_new") == 1)
                            & (F.col("doc_id") != F.col("frep"))
                            & (F.col("_new") | (F.col("doc_id") == F.col("orep"))),
                            F.struct(
                                F.col("doc_id"), F.col("frep").alias("rep")
                            ),
                        ),
                    )
                )
            ).alias("e")
        )
        .select("e.doc_id", "e.rep")
        .distinct()
    )
    verified = _verify_hashed_edges(edges, staged, threshold)
    from pleiades_spark.operators.graph import connected_components_star

    cc = connected_components_star(verified, src="doc_id", dst="rep")
    return (
        staged.select("doc_id")
        .join(cc.withColumnRenamed("cluster", "rep_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("rep_id"), F.col("doc_id")).alias("rep_id"),
        )
    )


# --- persisted star index (round 12) --------------------------------------
#
# doc_dedup_reps_incremental's gate recomputes the OLD phase
# deterministically (the oracle must replay it); a real nightly pays
# O(increment) only if last night's run PERSISTED its state. The index
# is four parquet tables, all linear in corpus size:
#
#   band_index  (band_idx, band_key, orep)   each bucket's min doc_id
#   edges       (doc_id, rep)                verified star edges so far
#   rep_hsets   (doc_id, hset)               int32 verify sets for docs
#                                            that are some bucket's rep —
#                                            the only old hsets a new
#                                            edge can need (edge targets
#                                            are bucket mins; the only
#                                            old edge SOURCE is an
#                                            undercut rep)
#   doc_ids     (doc_id)                     for singleton assignment
#
# The nightly then: stages ONLY the new docs, joins their bands against
# band_index (bucket min = min(orep, new members)), verifies new edges
# against (new hsets ∪ rep_hsets), unions the persisted edges, and runs
# one CC — per-bucket work O(new members + 1), identical semantics to
# the in-gate recompute (equivalence-tested).


def _mark_index_ok(spark, path: str) -> None:
    """Write the ``_INDEX_OK`` completion marker as the LAST step of an
    index bootstrap/roll (ADVICE r12): the 4-5 index tables are written
    sequentially, so a crash mid-write leaves a partial artifact (e.g.
    band_index present, rep_hsets missing) that a later nightly would
    only discover via a confusing read error. The marker makes torn
    indexes an explicit, early rejection — the same ``_STAGED_OK``
    discipline plans/streaming_batch._staged_src uses. Hadoop FS API so
    it works on HDFS/S3A, not just local paths."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_INDEX_OK")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.create(p, True).close()


def _check_index_ok(spark, path: str, op: str) -> None:
    """Reject an index dir without the completion marker before any table
    is read — torn (crashed mid-roll) and pre-marker-vintage artifacts
    fail fast with the rebuild instruction instead of a missing-path
    error halfway through the nightly."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_INDEX_OK")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        raise ValueError(
            f"{op}: no _INDEX_OK marker under {path!r} — the index "
            "bootstrap/roll that wrote it did not complete (torn "
            "artifact), or it predates the marker discipline. Rebuild "
            "with write_reps_index / write_emb_reps_index, or re-roll "
            "from the last good index."
        )


def _guard_inplace_roll(index_path: str, out_index_path: str | None) -> None:
    """Refuse out_index_path == index_path: mode('overwrite') on a path
    the same plan lazily READS either throws mid-job or tears the
    artifact (writes run sequentially, so a failure between tables
    leaves tonight's band_index next to last night's edges — an
    inconsistent index with no marker protection). The nightly writes a
    fresh dir and swaps pointers afterwards."""
    import os

    if out_index_path is not None and os.path.abspath(
        out_index_path
    ) == os.path.abspath(index_path):
        raise ValueError(
            "out_index_path must differ from index_path: rolling the "
            "index in place overwrites parquet the same job is reading "
            "— write a new dir and rename/swap after the job commits"
        )


def write_reps_index(docs: DataFrame, path: str, threshold: float = 0.6) -> None:
    """Bootstrap the persisted star index from a full corpus — one
    doc_dedup_reps-shaped pass whose intermediates land in parquet
    instead of being discarded."""
    staged = _staged_minhash(docs).cache()
    bands = staged.select(
        "doc_id",
        F.posexplode(band_keys(F.col("sig"))).alias("band_idx", "band_key"),
    )
    reps = bands.groupBy("band_idx", "band_key").agg(
        F.min("doc_id").alias("orep")
    )
    edges = (
        bands.join(reps, ["band_idx", "band_key"])
        .filter(F.col("doc_id") != F.col("orep"))
        .select("doc_id", F.col("orep").alias("rep"))
        .distinct()
    )
    verified = _verify_hashed_edges(edges, staged, threshold)
    reps.write.mode("overwrite").parquet(f"{path}/band_index")
    verified.write.mode("overwrite").parquet(f"{path}/edges")
    rep_ids = reps.select(F.col("orep").alias("doc_id")).distinct()
    (
        staged.join(rep_ids, "doc_id", "left_semi")
        .select("doc_id", "hset")
        .write.mode("overwrite")
        .parquet(f"{path}/rep_hsets")
    )
    staged.select("doc_id").write.mode("overwrite").parquet(f"{path}/doc_ids")
    staged.unpersist()
    _mark_index_ok(docs.sparkSession, path)


def doc_dedup_reps_from_index(
    new_docs: DataFrame,
    index_path: str,
    threshold: float = 0.6,
    out_index_path: str | None = None,
    pre_staged: bool = False,
) -> DataFrame:
    """The production nightly: (doc_id, rep_id) for old ∪ new docs, where
    tonight's work is O(increment) — old docs are never re-staged,
    re-banded, or re-verified; their contribution arrives via the
    persisted index. Semantics identical to
    :func:`doc_dedup_reps_incremental` on the same split (the
    equivalence test pins it): bucket min over old ∪ new =
    min(stored orep, new members); edges = every new member → full min,
    plus the undercut orep → full min bridge; old×old pairs never
    regenerate. ``out_index_path`` additionally ROLLS the index forward
    (tomorrow's band_index/edges/rep_hsets/doc_ids), itself O(increment)
    plus a rewrite of the index tables — each linear in corpus size,
    never in pairs.

    ``pre_staged=True`` means ``new_docs`` is ALREADY the staged
    (doc_id, sig, hset) frame — the streaming-ingest contract (round
    13): a continuous stream stages arriving docs inside foreachBatch
    (stream_doc_reps_batch) and lands them in an inbox; the nightly
    finalize consumes the inbox without re-shingling. Staging is a pure
    deterministic function of the text, so the result is bit-identical
    to staging here.
    """
    _guard_inplace_roll(index_path, out_index_path)
    spark = new_docs.sparkSession
    _check_index_ok(spark, index_path, "doc_dedup_reps_from_index")
    band_index = spark.read.parquet(f"{index_path}/band_index")
    old_edges = spark.read.parquet(f"{index_path}/edges")
    rep_hsets = spark.read.parquet(f"{index_path}/rep_hsets")
    old_ids = spark.read.parquet(f"{index_path}/doc_ids")

    # localCheckpoint, not cache (ADVICE r12): the staged blocks free
    # when the returned frame is GC'd instead of accumulating executor
    # storage across a long-lived session's nightly invocations
    staged = (
        new_docs.select("doc_id", "sig", "hset")
        if pre_staged
        else _staged_minhash(new_docs)
    ).localCheckpoint()
    nbands = staged.select(
        "doc_id",
        F.posexplode(band_keys(F.col("sig"))).alias("band_idx", "band_key"),
    )
    bkeys = ["band_idx", "band_key"]
    new_mins = nbands.groupBy(*bkeys).agg(F.min("doc_id").alias("nmin"))
    touched = new_mins.join(band_index, bkeys, "left").select(
        *bkeys,
        F.least(
            F.col("nmin"), F.coalesce(F.col("orep"), F.col("nmin"))
        ).alias("frep"),
        "orep",
    )
    member_edges = (
        nbands.join(touched, bkeys)
        .filter(F.col("doc_id") != F.col("frep"))
        .select("doc_id", F.col("frep").alias("rep"))
    )
    undercut_edges = touched.filter(
        F.col("orep").isNotNull() & (F.col("orep") != F.col("frep"))
    ).select(F.col("orep").alias("doc_id"), F.col("frep").alias("rep"))
    new_edges = member_edges.unionAll(undercut_edges).distinct()
    # no distinct: new ids and old rep ids are disjoint by contract
    # (a distinct here would shuffle the int32 arrays for nothing)
    hsets = staged.select("doc_id", "hset").unionAll(rep_hsets)
    verified_new = _verify_hashed_edges(new_edges, hsets, threshold)
    # in roll mode all_edges feeds BOTH the CC and the parquet write —
    # localCheckpoint so the verify join executes once
    all_edges = old_edges.unionAll(verified_new).distinct()
    if out_index_path is not None:
        all_edges = all_edges.localCheckpoint()
    from pleiades_spark.operators.graph import connected_components_star

    cc = connected_components_star(all_edges, src="doc_id", dst="rep")
    all_ids = old_ids.unionAll(staged.select("doc_id"))
    result = (
        all_ids.join(cc.withColumnRenamed("cluster", "rep_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("rep_id"), F.col("doc_id")).alias("rep_id"),
        )
    )
    if out_index_path is not None:
        # roll forward: untouched buckets keep their orep; touched
        # buckets take frep; new-only buckets enter with frep
        rolled = (
            band_index.join(touched.select(*bkeys), bkeys, "left_anti")
            .unionAll(
                touched.select(*bkeys, F.col("frep").alias("orep"))
            )
        )
        rolled.write.mode("overwrite").parquet(f"{out_index_path}/band_index")
        all_edges.write.mode("overwrite").parquet(f"{out_index_path}/edges")
        rep_ids = rolled.select(F.col("orep").alias("doc_id")).distinct()
        (
            hsets.join(rep_ids, "doc_id", "left_semi")
            .write.mode("overwrite")
            .parquet(f"{out_index_path}/rep_hsets")
        )
        all_ids.write.mode("overwrite").parquet(f"{out_index_path}/doc_ids")
        _mark_index_ok(spark, out_index_path)
    return result


def compact_reps_index(
    spark,
    index_path: str,
    out_index_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Small-file maintenance for the persisted star indices (round 13 —
    the N-night lifecycle item): every nightly roll rewrites each index
    table through its final shuffle, so a table lands as
    ``spark.sql.shuffle.partitions`` files no matter how few megabytes
    it holds — a month of nightlies on a 32-partition session keeps
    re-publishing 32 KB-sized files per table, the same small-file
    class ``maintenance.compact_days`` exists for on the counters table
    (listing + per-file-open cost dominates the scan at 100 TB).

    Rewrites every table directory under ``index_path`` into
    ``ceil(table_bytes / target_bytes)`` files (size from one
    filesystem listing, no data read), writes the ``_INDEX_OK`` marker
    LAST, and returns {table: n_files}. Content is untouched —
    repartition(n) only re-buckets rows, and every consumer of the
    artifact is order-insensitive (equality-tested). Same
    new-dir-then-swap-pointers discipline as the roll: compacting in
    place is refused (_guard_inplace_roll), because a reader holding
    last night's index must never observe a half-rewritten table.

    Works for BOTH modalities — the doc index's 4 tables and the
    embedding index's 5 (meta included: 1 row → 1 file) are just the
    subdirectories present.
    """
    _guard_inplace_roll(index_path, out_index_path)
    _check_index_ok(spark, index_path, "compact_reps_index")
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    written: dict[str, int] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not st.isDirectory() or name.startswith(("_", ".")):
            continue
        size = fs.getContentSummary(st.getPath()).getLength()
        n = max(1, -(-int(size) // int(target_bytes)))
        (
            spark.read.parquet(f"{index_path}/{name}")
            .repartition(n)
            .write.mode("overwrite")
            .parquet(f"{out_index_path}/{name}")
        )
        written[name] = n
    _mark_index_ok(spark, out_index_path)
    return written


# --- simhash -------------------------------------------------------------

SIMHASH_BITS = 32


def _simhash_of(hashed: Column, n: Column) -> Column:
    """Majority-vote SimHash fold over a precomputed 32-bit hash array.

    Bit k is set when more than half the hashes have bit k set (ties →
    0, the classic >0 threshold on ±1 sums: 2·cnt > n ⇔ Σ(2b−1) > 0).
    One fold accumulates all 32 per-bit counts (each hash evaluated
    once; the naive 32×aggregate form would re-hash per bit — no CSE
    across HOF arguments), and the counts array is referenced exactly
    ONCE (element_at per bit would re-run the fold 32×).
    """
    start = F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS)

    def _step(acc: Column, h: Column) -> Column:
        bits = F.array(
            *[F.shiftright(h, k).bitwiseAND(1) for k in range(SIMHASH_BITS)]
        )
        return F.zip_with(acc, bits, lambda x, y: x + y)

    counts = F.aggregate(hashed, start, _step)
    powers = F.array(*[F.lit(2**k).cast("long") for k in range(SIMHASH_BITS)])
    contrib = F.zip_with(
        counts,
        powers,
        lambda c, p: F.when(F.lit(2) * c > n, p).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(contrib, F.lit(0).cast("long"), lambda acc, x: acc + x)


def simhash(toks: Column) -> Column:
    """32-bit SimHash over the distinct token set.

    NOTE (HOF-CSE invariant): ``dtoks``/``n`` here are inline
    EXPRESSIONS — fine only because this helper is applied to a staged
    column (see _with_dtoks callers) or tiny inputs; the production
    signature paths (simhash_pairs_wide / simhash128_signature)
    materialize dtoks and n as real columns first so tokenization runs
    once per row, not once per transform argument."""
    dtoks = F.array_distinct(toks)
    hashed = F.transform(dtoks, h32)
    n = F.size(dtoks)  # NOT size(hashed): that would re-run the md5 transform
    return _simhash_of(hashed, n)


def _with_dtoks(docs: DataFrame) -> DataFrame:
    """(doc_id, dtoks, n): distinct-token array + its size as REAL
    COLUMNS. The signature builders reference these as attributes —
    per the no-CSE-across-HOF-arguments invariant, an inline
    array_distinct(tokens(text)) fed to four transform() arguments
    re-tokenizes per argument, and an inline size(...) referenced from
    a lambda BODY re-derives the whole chain per element (ADVICE r9).
    Two separate selects: dtoks is multi-referenced and non-cheap in
    each, so CollapseProject leaves both projections intact."""
    from pleiades_spark.functions.text import tokens

    return (
        docs.repartition(F.col("doc_id"))  # parallelize hashing (see with_signature)
        .select(
            "doc_id",
            F.array_distinct(tokens(F.col("text"))).alias("dtoks"),
        )
        .select("doc_id", "dtoks", F.size("dtoks").alias("n"))
    )


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, allow_quadratic: bool = False
) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) ≤ max_hamming.

    Blocking: the 32-bit signature splits into 4 byte chunks; by pigeonhole
    any pair within Hamming ≤ 3 shares at least one chunk, so the self-join
    on (chunk_idx, chunk_value) is lossless while bounding the pair space.

    GROUND-TRUTH-ADJACENT, not the scale path: 8-bit chunks mean only 256
    values per chunk, so bucket size grows as n/256 and candidate volume
    as n²/256 — a quadratic cliff disguised as blocking (measured 49.8 s /
    26.4× at sf10's 500k docs, the worst cell of the round-7 sweep).
    :func:`simhash_pairs_wide` (16-bit chunks, n²/16k) is the production
    operator; this one is guard-railed like ngram_jaccard_pairs (>100k
    docs raises unless allow_quadratic=True).
    """
    _guard_quadratic(docs, "simhash_pairs", allow_quadratic)

    staged = _with_dtoks(docs)
    sigs = staged.select(
        "doc_id",
        _simhash_of(F.transform(F.col("dtoks"), h32), F.col("n")).alias("sig"),
    ).cache()
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), 8 * i).bitwiseAND(255)
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    left = chunks.alias("l")
    right = chunks.alias("r")
    return (
        left.join(
            right,
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("l.sig").bitwiseXOR(F.col("r.sig"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs_wide(
    docs: DataFrame, max_hamming: int = 6, exact_recall: bool = False
) -> DataFrame:
    """64-bit SimHash near-dup — the corpus-scale twin of simhash_pairs.

    The 32-bit signature's 8-bit chunk blocking is the round-7 sf10
    lesson: 256 values per chunk means bucket size grows as n/256 and
    candidate volume as n²/256 — 46.7 s / 23.5× at 500k docs, a
    quadratic cliff disguised as blocking. Doubling the signature to 64
    bits (two independent salted 32-bit halves, so the md5-h32 oracle
    replays both) makes the chunks 16-bit: 65 536 values per chunk,
    buckets of ~n/65k, candidate volume n²/16k — 256× less.

    RECALL: with 4 chunks, pigeonhole guarantees an intact shared chunk
    only for Hamming ≤ 3 (max_hamming < n_chunks). For Hamming 4–6 a
    pair is found iff at least one chunk escaped corruption — which
    holds unless the ≥4 flipped bits land in ≥1 bit of EVERY chunk, so
    recall is high but NOT 1 (at Hamming 4, the 16⁴/C(64,4) ≈ 10.3 % of
    flip patterns that hit all four chunks are missed — uniformly over
    flip positions; real near-dup bit flips are not adversarial;
    tests/test_ann_recall.py::test_simhash_wide_pigeonhole_bounds
    constructs both a guaranteed hit at Hamming 3 and an adversarial
    all-chunks-corrupted miss at Hamming 4). Guaranteeing recall 1 at
    Hamming 6 via plain blocking needs ≥7 chunks of ≤9 bits —
    n²/512-class candidate volume, the same cliff the 16-bit chunks
    exist to avoid; ``exact_recall=True`` buys the guarantee the cheap
    way instead (1-bit-flip multi-probing, 17× candidates — see
    simhash_wide_pairs_from_sigs; its gate oracle is brute force). The
    plain-blocking oracle replicates the blocking, so both engines miss
    identically and the hash gate stays exact w.r.t. the OPERATOR's
    contract.

    ``max_hamming`` defaults to 6 — the same 3/32 corruption FRACTION
    as the narrow gate, so both flag comparable similarity levels; the
    two fingerprints are different projections, so pair sets are not
    expected to be identical (the test quantifies the overlap).
    Hamming distance is bit_count over each half, summed — all signed
    32-bit-safe arithmetic on both engines.
    """
    staged = _with_dtoks(docs)  # dtoks/n as attributes, tokenize ONCE
    hi = _simhash_of(
        F.transform(F.col("dtoks"), lambda t: h32(F.concat(F.lit("wh:"), t))),
        F.col("n"),
    )
    lo = _simhash_of(
        F.transform(F.col("dtoks"), lambda t: h32(F.concat(F.lit("wl:"), t))),
        F.col("n"),
    )
    sigs = staged.select("doc_id", hi.alias("hi"), lo.alias("lo")).cache()
    return simhash_wide_pairs_from_sigs(sigs, max_hamming, exact_recall)


def simhash_wide_pairs_from_sigs(
    sigs: DataFrame, max_hamming: int = 6, exact_recall: bool = False
) -> DataFrame:
    """Chunk-blocked pair join over precomputed (doc_id, hi, lo) 64-bit
    signatures — split out so tests can inject exact bit patterns and
    verify the pigeonhole bounds documented on simhash_pairs_wide
    (guaranteed hit at Hamming ≤ 3; possible miss at Hamming ≥ 4 when
    flips corrupt all four 16-bit chunks).

    ``exact_recall=True`` turns on 1-bit-flip multi-probing (the Manku
    et al., WWW'07 probe idea recast as blocking): the PROBE side emits,
    per chunk, the chunk value plus its 16 one-bit-flip variants (17
    rows), joined against the other side's exact chunk values. A pair at
    Hamming ≤ 7 has, by pigeonhole over 4 chunks, some chunk with ≤ 1
    differing bit — matched by the exact value (0 errors) or the
    matching flip variant (1 error) — so recall is exactly 1 for every
    ``max_hamming`` ≤ 7, covering the default 6 the plain blocking only
    approximates. Cost: 17× the probe rows and ≈17× the candidate
    volume of the plain blocking (still n²/964-class, far under the
    8-bit chunks' n²/256) — the knob trades one measured constant for a
    provable guarantee, and the gate oracle for this path is BRUTE
    FORCE, which is what proves it."""
    chunks = sigs.select(
        "doc_id",
        "hi",
        "lo",
        F.posexplode(
            F.array(
                F.shiftright(F.col("hi"), 16).bitwiseAND(65535),
                F.col("hi").bitwiseAND(65535),
                F.shiftright(F.col("lo"), 16).bitwiseAND(65535),
                F.col("lo").bitwiseAND(65535),
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    if exact_recall:
        # probe side: value itself + its 16 one-bit flips, as XOR against
        # a 17-mask literal array (mask 0 = identity). The mask array is
        # an array ARGUMENT of the HOF — evaluated once per row — and
        # the lambda body touches only the element + the chunk_val
        # column (attribute reference, free under the HOF-CSE
        # invariant). 17 literals is far under the F.lit(list) ~100-
        # element broadcast bar.
        masks = F.array(F.lit(0), *[F.lit(1 << b) for b in range(16)])
        probe = chunks.select(
            "doc_id",
            "hi",
            "lo",
            "chunk_idx",
            F.explode(
                F.transform(masks, lambda m: F.col("chunk_val").bitwiseXOR(m))
            ).alias("chunk_val"),
        )
        left = probe.alias("l")
    else:
        left = chunks.alias("l")
    right = chunks.alias("r")
    return (
        left.join(
            right,
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            (
                F.bit_count(F.col("l.hi").bitwiseXOR(F.col("r.hi")))
                + F.bit_count(F.col("l.lo").bitwiseXOR(F.col("r.lo")))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash128_signature(docs: DataFrame) -> DataFrame:
    """(doc_id, h0, h1, h2, h3) — a 128-bit SimHash as four independent
    salted 32-bit halves (salts 'w0:'..'w3:' over md5-h32, so the DuckDB
    oracle replays every half bit-for-bit). Tokenization is staged as a
    real column (_with_dtoks): inlined, the four transform() arguments
    would each re-tokenize and the majority threshold would re-derive
    size(array_distinct(tokens(text))) per fold ELEMENT (ADVICE r9)."""

    # real closure, NOT `lambda t, i=i:` — PySpark counts lambda default
    # args as HOF params, turning the salt into the array-index column
    # (the CLAUDE.md HOF-params invariant, re-learned here the hard way)
    def _salted_hash(i: int):
        salt = F.lit(f"w{i}:")
        return lambda t: h32(F.concat(salt, t))

    staged = _with_dtoks(docs)
    halves = [
        _simhash_of(
            F.transform(F.col("dtoks"), _salted_hash(i)), F.col("n")
        ).alias(f"h{i}")
        for i in range(4)
    ]
    return staged.select("doc_id", *halves)


def simhash128_signature_prod(docs: DataFrame) -> DataFrame:
    """Production twin of :func:`simhash128_signature`: same 128-bit
    majority-vote construction, but each salted half hashes with
    h32_prod (xxhash64 — JVM intrinsic, whole-stage codegen) instead of
    the md5-derived h32 the oracle gates replay. Same signature QUALITY
    (both are uniform 32-bit families); what changes is per-token
    hashing cost — md5 hex-parses through strings, xxhash64 does not —
    which at 5 M docs × ~300 tokens × 4 halves dominated the round-9
    blocking_audit sf100 cell (201 s). Bench-only: DuckDB has no
    xxhash64, so the audit over this signature is a rows-only gate."""
    from pleiades_spark.functions.hashing import h32_prod

    def _salted_hash(i: int):
        salt = F.lit(f"w{i}:")
        return lambda t: h32_prod(F.concat(salt, t))

    staged = _with_dtoks(docs)
    halves = [
        _simhash_of(
            F.transform(F.col("dtoks"), _salted_hash(i)), F.col("n")
        ).alias(f"h{i}")
        for i in range(4)
    ]
    return staged.select("doc_id", *halves)


def simhash_pairs_wide128(
    docs: DataFrame, max_hamming: int = 6, exact_recall: bool = False
) -> DataFrame:
    """128-bit SimHash near-dup with 32-bit chunk blocking — the round-9
    bucket-count knob (round-8 verdict #1) that retires the 16-bit-chunk
    candidate cliff.

    WHY 128 BITS: simhash_pairs_wide's 64-bit signature blocks on 4×16-bit
    chunks — 65 536 buckets per chunk index, so bucket occupancy grows as
    n/65k and candidate volume as n²/16k: measured 10.2×/11.2× at sf10's
    500k docs, the next >20× cells one decade out. Blocking on 32-bit
    chunks gives 2³² buckets per index — occupancy stays ~1 until corpus
    size approaches 4 B docs, so candidate volume is driven by TRUE
    near-dup collisions, not birthday crowding. A 32-bit intact chunk
    with provable recall needs 4 chunks × 32 bits = a 128-bit signature
    (four independently salted 32-bit halves; Hamming distance = Σ
    bit_count over the four XORs, all signed-32-safe).

    RECALL (same pigeonhole algebra as the 64-bit twin, one level up):
    plain blocking guarantees an intact shared chunk for Hamming ≤ 3;
    ``exact_recall=True`` multi-probes each chunk with its 32 one-bit
    flips (33 probe rows per chunk), guaranteeing some chunk with ≤ 1
    differing bit for every Hamming ≤ 7 — recall provably 1 at the
    default threshold 6. Probe cost is 33× rows vs the 64-bit probe's
    17×, but each bucket is ~singleton, so candidates ≈ true near-dups
    × 132, independent of n — the constant the guarantee costs.

    THRESHOLD SEMANTICS: ``max_hamming`` stays 6, now out of 128 bits
    (~95% bit agreement) instead of 64 (~91%) — a stricter similarity
    bar. The fingerprints are different projections; pair sets are not
    expected to match the 64-bit twin's (tests quantify overlap), and
    the gate oracle replays THIS operator's contract exactly.
    """
    # cache: the signature projection (4 md5 transforms + 4 majority
    # folds per doc) feeds BOTH sides of the self-join — uncached it
    # runs twice (the 64-bit twin caches for the same reason)
    sigs = simhash128_signature(docs).cache()
    return simhash_wide128_pairs_from_sigs(sigs, max_hamming, exact_recall)


def simhash_wide128_pairs_from_sigs(
    sigs: DataFrame,
    max_hamming: int = 6,
    exact_recall: bool = False,
    probe_prune: bool = False,
) -> DataFrame:
    """Chunk-blocked pair join over precomputed (doc_id, h0..h3) 128-bit
    signatures — split out so tests inject exact bit patterns (guaranteed
    hit at Hamming ≤ 3 plain / ≤ 7 multi-probe; adversarial
    all-chunks-corrupted miss at Hamming 4 plain). Each 32-bit half IS a
    chunk — no sub-word slicing, the blocking key is the half itself.

    ``exact_recall=True``: probe side emits the chunk value + its 32
    one-bit-flip variants via XOR against a 33-mask literal array (mask
    0 = identity; array ARGUMENT of the HOF ⇒ evaluated once per row,
    lambda touches only element + column — the HOF-CSE invariant). The
    gate oracle for this path is BRUTE FORCE, which is what PROVES the
    recall-1 claim on real signatures.

    ``probe_prune`` is a MEASURED DEAD END, kept (default OFF) as the
    recorded experiment for the round-9 verdict's #5 knob ("bloom/
    semi-prune the probe stream"): an output-invariant bitmap semi-prune
    — a 2²⁸-bit one-hash Bloom of the build side's (chunk_idx,
    chunk_val) keys as a broadcast ≤4.2M-row word table, filtering the
    33× probe stream before the exchange, plus slim join rows with the
    Hamming re-joined from ``sigs`` over the tiny candidate set. On
    paper it cuts the 660 M-row/40 GB sf100 probe shuffle ~10×; in
    measurement it LOST at both decades — +126 % at sf10 (500 k docs:
    the bitmap build/broadcast and candidate re-join cost more than the
    1–4 GB shuffle they replace) and 4.4× at sf100 (584 s vs the plain
    path's 134 s: the ~100 MB broadcast hash relation plus 32-way sort
    pressure thrashed TaskMemoryManager into 1 GB page-allocation
    retries). On a real cluster the un-pruned shuffle distributes
    anyway, so there is no regime where the single-box prune wins. The
    invariance test (crafted Hamming-boundary patterns) proves both
    plans emit the identical pair set."""
    chunk_arr = F.array(F.col("h0"), F.col("h1"), F.col("h2"), F.col("h3"))
    if not exact_recall:
        chunks = sigs.select(
            "doc_id",
            "h0",
            "h1",
            "h2",
            "h3",
            F.posexplode(chunk_arr).alias("chunk_idx", "chunk_val"),
        )
        left = chunks.alias("l")
        right = chunks.alias("r")
        hamming = sum(
            F.bit_count(F.col(f"l.h{i}").bitwiseXOR(F.col(f"r.h{i}")))
            for i in range(4)
        )
        return (
            left.join(
                right,
                (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
                & (F.col("l.chunk_val") == F.col("r.chunk_val"))
                & (F.col("l.doc_id") < F.col("r.doc_id")),
            )
            .select(
                F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"),
                hamming.alias("hamming"),
            )
            .distinct()
            .filter(F.col("hamming") <= max_hamming)
        )

    masks33 = F.array(F.lit(0), *[F.lit(1 << b) for b in range(32)])
    if not probe_prune:
        # small-corpus exact path (the round-9 shape): both sides carry
        # the halves, Hamming is inline, one distinct — cheapest while
        # the probe shuffle is small
        chunks = sigs.select(
            "doc_id",
            "h0",
            "h1",
            "h2",
            "h3",
            F.posexplode(chunk_arr).alias("chunk_idx", "chunk_val"),
        )
        probe = chunks.select(
            "doc_id",
            "h0",
            "h1",
            "h2",
            "h3",
            "chunk_idx",
            F.explode(
                F.transform(masks33, lambda m: F.col("chunk_val").bitwiseXOR(m))
            ).alias("chunk_val"),
        )
        hamming = sum(
            F.bit_count(F.col(f"l.h{i}").bitwiseXOR(F.col(f"r.h{i}")))
            for i in range(4)
        )
        return (
            probe.alias("l")
            .join(
                chunks.alias("r"),
                (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
                & (F.col("l.chunk_val") == F.col("r.chunk_val"))
                & (F.col("l.doc_id") < F.col("r.doc_id")),
            )
            .select(
                F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"),
                hamming.alias("hamming"),
            )
            .distinct()
            .filter(F.col("hamming") <= max_hamming)
        )

    bloom_bits = 1 << 28
    chunks = sigs.select(
        "doc_id", F.posexplode(chunk_arr).alias("chunk_idx", "chunk_val")
    )

    def _slot(key: Column) -> Column:
        # xxhash64 is fine here: the prune is output-invariant (same
        # hash both sides ⇒ no false negatives), so the md5-oracle rule
        # for gate-visible hashes does not apply
        return F.pmod(F.xxhash64(key), F.lit(bloom_bits))

    bkey = F.col("chunk_idx").cast("long") * F.lit(2**32) + F.col("chunk_val")
    words = (
        chunks.select(_slot(bkey).alias("s"))
        .select(
            F.expr("int(s div 64)").alias("word_idx"),
            F.expr("cast(s % 64 as int)").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(shiftleft(1L, bit))").alias("w"))
    )
    probe = (
        chunks.select(
            "doc_id",
            "chunk_idx",
            F.explode(
                F.transform(masks33, lambda m: F.col("chunk_val").bitwiseXOR(m))
            ).alias("chunk_val"),
        )
        .withColumn("s", _slot(bkey))
        .withColumn("word_idx", F.expr("int(s div 64)"))
        .join(F.broadcast(words), "word_idx")
        .filter(F.expr("(shiftright(w, cast(s % 64 as int)) & 1) = 1"))
        .select("doc_id", "chunk_idx", "chunk_val")
    )
    cand = (
        probe.alias("l")
        .join(
            chunks.alias("r"),
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(4)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(4)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}")))
        for i in range(4)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# --- exact n-gram jaccard (ground truth) ---------------------------------


QUADRATIC_GUARD_ROWS = 100_000


def _guard_quadratic(df: DataFrame, op: str, allow_quadratic: bool) -> None:
    """Fail fast if a deliberately-quadratic ground-truth operator is
    pointed at a corpus it was never meant for. One cheap count-agg job
    buys protection from an O(n²) self-join that would otherwise run for
    days at scale; pass allow_quadratic=True to override knowingly."""
    if allow_quadratic:
        return
    n = df.count()
    if n > QUADRATIC_GUARD_ROWS:
        raise ValueError(
            f"{op} is an O(n²) ground-truth operator and got {n} rows "
            f"(> {QUADRATIC_GUARD_ROWS}); use the LSH/IVF scale path, or "
            "pass allow_quadratic=True if you really mean it"
        )


def _observe_candidates(cand: DataFrame, observation) -> DataFrame:
    """Attach a raw-candidate-row metric to a prefix join's candidate
    frame (pre-distinct, so skew shows up undeduplicated). Candidate
    volume — not doc count — is what explodes when the Zipfian-pruning
    assumption behind prefix filtering fails (the sf10 containment
    lesson, BENCH_SF10.md): a production run passes an
    ``pyspark.sql.Observation`` here and alarms when
    ``observation.get["candidate_rows"]`` blows its budget. Piggybacks
    on the job (CollectMetrics node) — zero extra scans or shuffles."""
    if observation is None:
        return cand
    return cand.observe(
        observation, F.count(F.lit(1)).alias("candidate_rows")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.6, allow_quadratic: bool = False
) -> DataFrame:
    """Exact all-pairs shingle Jaccard with a length-band block.

    Near-dups have near-equal length, so requiring
    |len_a − len_b| ≤ 20 % · max(len) prunes the quadratic space without
    losing pairs above any reasonable threshold. Quadratic — ground truth
    for small SF; the LSH operators are the scale path (guard-railed:
    >100k rows raises unless allow_quadratic=True).
    """
    _guard_quadratic(docs, "ngram_jaccard_pairs", allow_quadratic)
    sh = docs.select(
        "doc_id", F.col("n_chars"), word_shingles(F.col("text")).alias("sh")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.abs(F.col("a.n_chars") - F.col("b.n_chars"))
                <= 0.2 * F.greatest(F.col("a.n_chars"), F.col("b.n_chars"))
            ),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "jaccard",
        )
    )


# --- embedding cosine near-dup -------------------------------------------


def embedding_near_dup_ivf(
    emb: DataFrame,
    threshold: float = 0.45,
    n_centroids: int | None = None,
    max_bucket_size: int | None = None,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Single-level IVF embedding near-dup: self-join WITHIN IVF buckets.

    GROUND-TRUTH-ADJACENT since round 8: Θ(n^1.5·d) by design (the
    adaptive-K balance below), measured 124 s / 21.8× at sf10's 200k
    vectors. :func:`embedding_near_dup_ivf2` (two-level coarse quantizer,
    Θ(n^(4/3)·d), 5.0× at sf10) supersedes it as the scale path; this one
    stays as the audited intermediate whose recall test anchors ivf2.
    Guard-railed like ngram_jaccard_pairs (>100k vectors raises unless
    allow_quadratic=True).

    Vectors are assigned to their nearest codebook centroid
    (similarity.ivf_assign — deterministic codebook so the DuckDB oracle
    replays the bucketing exactly); pair search then shuffles on
    centroid_id and compares only intra-bucket pairs. Cost drops from
    O(N²) to O(Σ bucket²) ≈ O(N²/K) — and the bucket self-join
    parallelizes per centroid instead of one giant cartesian task.
    Approximate by construction: a near-dup pair straddling two buckets
    is missed (mitigate with more/better centroids or multi-assignment);
    the brute variant is the ground truth that quantifies that recall.

    K must TRACK the corpus or O(N²/K) is still quadratic (a fixed K=16
    measured 73s at the sf1 bench's 20k vectors vs ~7s adaptive) — but K
    must not track it LINEARLY either: assignment costs n·K·d, so
    K = n/64 made the assignment stage Θ(n²·d/64) (measured 320 s at
    sf10's 200k vectors, 38× for 10× data). When ``n_centroids`` is None
    it follows the two-region rule: K=16 for every corpus up to 1024
    vectors (the documented <=1k gate-fixture range, so regeneration
    can't change the codebook the frozen oracle replays), then
    K = max(16, isqrt(n)) — the balance point of assignment (n·K·d) vs
    in-bucket verify (n²·d/K), total Θ(n^1.5·d). The gate oracle
    computes the identical rule from count(*). Sub-n^1.5 embedding dedup
    is the SRP path's job (O(n·planes) banding) — exact-nearest-centroid
    IVF cannot beat n^1.5 without a coarse quantizer in front.

    ``max_bucket_size`` is the hot-bucket guard, same contract as
    minhash_lsh_pairs': a centroid claiming B vectors costs B² pairs in
    ONE task, so a degenerate embedding space (zero vectors, a mode the
    encoder collapses to) turns the Voronoi cell into both a straggler
    and a quadratic blowup. Buckets over the cap are dropped from pair
    generation — a recall trade the recall-audit machinery
    (tests/test_ann_recall.py) quantifies. None (the gate default) is
    lossless; measured sf1 buckets are BALANCED under the adaptive-K
    rule (max 131 vs mean 64), so the cap is the insurance policy, not
    the sf1 lever — the round-6 levers were the map-only assignment
    (similarity._assign_nearest) and precomputed verify norms (15.4 s →
    8.3 s together).
    """
    from pleiades_spark.operators.similarity import ivf_assign

    if n_centroids is None or not allow_quadratic:
        import math

        # one count serves both the guard and the adaptive-K rule
        n = emb.count()
        if not allow_quadratic and n > QUADRATIC_GUARD_ROWS:
            raise ValueError(
                f"embedding_near_dup_ivf is Θ(n^1.5) and got {n} vectors "
                f"(> {QUADRATIC_GUARD_ROWS}); use embedding_near_dup_ivf2 "
                "(the Θ(n^4/3) scale path), or pass allow_quadratic=True "
                "if you really mean it"
            )
        if n_centroids is None:
            n_centroids = 16 if n <= 1024 else max(16, math.isqrt(n))
    # Per-VECTOR norms once before the self-join (same trick as the SRP
    # verify): cosine() inline re-folds both norms for every PAIR —
    # 3 array folds per candidate; with norms precomputed the per-pair
    # cost is 1 fold + a divide. norm(v) is a deterministic function of
    # the vector, so dot/(n_a*n_b) is the same double as cosine() and the
    # oracle replays unchanged. (sf1: 9.4 s → with this 3-fold cut the
    # verify stage stops dominating.)
    assigned = ivf_assign(emb, n_centroids).withColumn("nrm", norm(F.col("v")))
    if max_bucket_size is not None:
        # windowed count shuffles on the same centroid_id the self-join
        # needs — co-located, no extra exchange in the joined plan
        wb = W.partitionBy("centroid_id")
        assigned = (
            assigned.withColumn("bucket_size", F.count(F.lit(1)).over(wb))
            .filter(F.col("bucket_size") <= max_bucket_size)
            .drop("bucket_size")
        )
    a = assigned.alias("a")
    b = assigned.alias("b")
    return (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn(
            "cos",
            F.round(
                dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cos",
        )
    )


def _icbrt(n: int) -> int:
    """Integer cube root, exact: float estimate ± integer adjustment.

    Both engines derive it the same way (round(cbrt(n)) then two integer
    CASE corrections), so any libm jitter in cbrt cancels — the SQL twin
    is frozen in plans/llm._IVF2_PRM_SQL."""
    t = round(n ** (1.0 / 3.0))
    if (t + 1) ** 3 <= n:
        t += 1
    elif t**3 > n:
        t -= 1
    return t


def _blocked_bucket_pairs(
    assigned: DataFrame, block_size: int
) -> DataFrame:
    """Exact block-decomposed in-bucket pair join — the CPU-skew salting
    for quadratic-output buckets (round-10, verdict r9 #3).

    A plain self-join on centroid_id puts a bucket of B rows' entire
    C(B,2) verify work in ONE task (the join key is the bucket): the
    sf100 probe measured minutes-long 2-task straggling because the
    scale fixture's near-identical embedding copies concentrate ~1000
    rows per bucket. AQE's skew-join can't help — the skew is CPU
    (pair count), not bytes, and a single join key can't be split by
    partition anyway.

    Decomposition: rows are numbered within their bucket (ordered by
    vec_id), grouped into blocks of ``block_size``; the left side
    explodes to every target block ≥ its own, and the join key becomes
    (centroid_id, block) — so a B-row bucket's work spreads over
    C(nblk+1, 2) independent tasks of ≤ block_size² pairs each.
    Ordering by vec_id makes blk_a < blk_b imply vec_id_a < vec_id_b,
    so the pair predicate degrades to the classic vec_id_a < vec_id_b
    only WITHIN a block — every unordered pair is emitted exactly once
    and the output is bit-identical to the plain join (the oracle is
    untouched). Left-side row duplication is ~nblk/2 per bucket —
    negligible for buckets ≤ block_size (nblk = 1 degenerates to the
    plain join plus a cheap window).

    Returns the joined frame with ``a``/``b`` aliases intact so callers
    keep their verify expressions unchanged.
    """
    wo = W.partitionBy("centroid_id").orderBy("vec_id")
    wp = W.partitionBy("centroid_id")
    blocked = (
        assigned.withColumn("rn", F.row_number().over(wo))
        .withColumn("cnt", F.count(F.lit(1)).over(wp))
        .select(
            *assigned.columns,
            F.expr(f"int((rn - 1) div {block_size})").alias("blk"),
            F.expr(f"int((cnt + {block_size - 1}) div {block_size})").alias("nblk"),
        )
    )
    a = blocked.select(
        "*", F.explode(F.sequence(F.col("blk"), F.col("nblk") - 1)).alias("tgt")
    ).alias("a")
    b = blocked.alias("b")
    return a.join(
        b,
        (F.col("a.centroid_id") == F.col("b.centroid_id"))
        & (F.col("a.tgt") == F.col("b.blk"))
        & (
            (F.col("a.blk") != F.col("b.blk"))
            | (F.col("a.vec_id") < F.col("b.vec_id"))
        ),
    )


def embedding_near_dup_ivf2(
    emb: DataFrame,
    threshold: float = 0.45,
    max_bucket_size: int | None = None,
    n_probe_cells: int = 1,
    block_size: int = 512,
    max_expected_pairs: int | None = None,
) -> DataFrame:
    """Two-level IVF embedding near-dup — the sub-n^1.5 scale path.

    Same contract as embedding_near_dup_ivf, but assignment goes through
    the coarse quantizer (similarity.ivf_assign_2level): K1 + K/K1
    cosines per vector instead of K. With the K = ⌊n^(2/3)⌋,
    K1 = ⌊n^(1/3)⌋ rule below, assignment costs n·2·n^(1/3)·d and
    in-bucket verify n²·d/K = n^(4/3)·d — total Θ(n^(4/3)·d), vs the
    single-level balance Θ(n^1.5·d). At 10× data that is 21.5× work in
    theory; the single-level rule is 31.6× (measured 17.1× at sf10).

    The frozen gate region stays K=16 (K1=4) for n ≤ 1024 so fixture
    regeneration cannot change the codebook the oracle replays; above it
    both K and K1 derive integer-exactly from count(*) on both engines
    (_icbrt). Smaller Voronoi cells mean strictly lower recall than the
    single-level join at equal n — the recall test quantifies it against
    embedding_near_dup_ivf; SRP banding remains the O(n) recall-tunable
    alternative. Bucket self-join + verify identical to the single-level
    path (precomputed per-vector norms, one fold per pair)."""
    from pleiades_spark.operators.similarity import ivf_assign_2level

    n = emb.count()
    if n <= 1024:
        kk, k1 = 16, 4
    else:
        t = _icbrt(n)
        kk, k1 = max(16, t * t), max(4, t)
    assigned = ivf_assign_2level(emb, kk, k1, n_probe_cells).withColumn(
        "nrm", norm(F.col("v"))
    )
    if max_bucket_size is not None:
        wb = W.partitionBy("centroid_id")
        assigned = (
            assigned.withColumn("bucket_size", F.count(F.lit(1)).over(wb))
            .filter(F.col("bucket_size") <= max_bucket_size)
            .drop("bucket_size")
        )
    _guard_expected_pairs(
        assigned.select("centroid_id"),
        ("centroid_id",),
        "embedding_near_dup_ivf2",
        max_expected_pairs,
        "embedding_dedup_reps",
    )
    pairs = (
        _blocked_bucket_pairs(
            assigned.select("vec_id", "v", "centroid_id", "nrm"), block_size
        )
        .withColumn(
            "cos",
            F.round(
                dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cos",
        )
    )
    if n_probe_cells > 1:
        # multi-assignment can find the same pair in several shared
        # buckets (same cos either way) — dedup on the pair key; the
        # P=1 gate path stays plan-identical with no extra exchange.
        pairs = pairs.dropDuplicates(["vec_a", "vec_b"])
    return pairs


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.45, allow_quadratic: bool = False
) -> DataFrame:
    """Vector pairs with cosine ≥ threshold (brute-force at fixture scale).

    At 100 TB: embedding_near_dup_ivf — same contract, bucketed plan.
    Guard-railed like ngram_jaccard_pairs: >100k vectors raises unless
    allow_quadratic=True.
    """
    _guard_quadratic(emb, "embedding_near_dup_pairs", allow_quadratic)
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cos", F.round(cosine(F.col("a.v"), F.col("b.v")), 6))
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cos",
        )
    )


# --- embedding near-dup: signed-random-projection LSH (cosine LSH) ---------


def _srp_banded(
    emb: DataFrame, rows_bits: int | None, keep: tuple[str, ...] = ()
) -> tuple[DataFrame, DataFrame]:
    """Shared SRP banding stage: returns ``(v, banded)`` where ``v`` is
    the (vec_id, v double[]) frame and ``banded`` the exploded band rows
    (vec_id, bands, band_idx, band_val).

    ``rows_bits=None`` derives bits-per-band from a corpus count with
    the r=SRP_ROWS frozen-oracle region widened to n ≤ 1024 (the
    documented gate-fixture range), then the B=32 target-bucket rule —
    see embedding_near_dup_srp's docstring for the measured rationale.

    The plane matrix arrives as a broadcast one-row array column
    (attach_matrix): per-component F.lit nodes were thousands of
    expression nodes (analysis + codegen dwarfed the scan), and even
    the single nested-array literal burned ~1 s of driver-side py4j
    conversion per call and re-shipped in every task binary. The fold
    inside the lambda is the same left-to-right dot the oracle replays;
    only the delivery of the constants changes, not a single double.

    Each exploded row carries the FULL band array (SRP_BANDS ints —
    bytes, next to the vectors) so consumers can reason about all of a
    vector's bands at once: the pair join emits each colliding pair
    from its first shared band only (no post-join distinct — the
    shuffle that spilled ~70 GB and DNF'd the sf100 probe on the
    high-duplication copy corpus)."""
    if rows_bits is None:
        # r=4 through n=1024 (oracle-replay region with regen margin);
        # then B=32 target bucket size: 2000 → r=6, 1M → r=15, ...
        n = emb.count()
        rows_bits = SRP_ROWS if n <= 1024 else max(
            SRP_ROWS, (n // 32).bit_length()
        )
    planes = SRP_PLANES if rows_bits == SRP_ROWS else srp_planes(SRP_BANDS * rows_bits)
    v = emb.select("vec_id", *keep, as_double(F.col("embedding")).alias("v"))
    from pleiades_spark.functions.vectors import attach_matrix

    bits = attach_matrix(v, planes).select(
        "vec_id",
        *keep,
        "v",
        F.transform(
            F.col("_planes"), lambda p: (dot(F.col("v"), p) >= 0).cast("int")
        ).alias("bits"),
    )
    band_arr = F.array(
        *[
            sum(
                (
                    F.col("bits")[b * rows_bits + r] * (2 ** (rows_bits - 1 - r))
                    for r in range(rows_bits)
                ),
                start=F.lit(0),
            )
            for b in range(SRP_BANDS)
        ]
    )
    banded = bits.select(
        "vec_id",
        *keep,
        "v",
        norm(F.col("v")).alias("nrm"),
        band_arr.alias("bands"),
        F.posexplode(band_arr).alias("band_idx", "band_val"),
    )
    return v, banded


def embedding_dedup_reps(
    emb: DataFrame,
    threshold: float = 0.45,
    rows_bits: int | None = None,
    target_bucket: int = 4,
) -> DataFrame:
    """Linear-output embedding dedup: (vec_id, rep_id) via SRP bucket-rep
    star edges + connected components — the contract a 100 TB pipeline
    actually runs (round 10).

    WHY NOT PAIRS: pair enumeration's output is Θ(Σ multiplicity²) — a
    group of m near-identical vectors is C(m,2) rows. The sf100 probe's
    embedding table (1000 copies per base vector at cosine ≈ 0.993, a
    realistic shape for template/boilerplate embeddings) lower-bounds
    ANY pair-emitting operator at ~10⁹ output rows; no blocking fix can
    beat its own output. Production dedup needs one decision per vector
    — keep or fold into a representative — which is this operator's
    (vec_id, rep_id) contract, linear in n by construction.

    Plan (every stage linear in n·SRP_BANDS):
      1. SRP banding (_srp_banded — same planes/rows rule and frozen
         n ≤ 1024 oracle region as the pair path);
      2. per band bucket, candidate rep = min vec_id in the bucket;
         star edges (member → bucket-min), distinct over bands;
      3. each edge verified by exact cosine ≥ threshold — n·bands
         cosines, vs the pair path's per-candidate-PAIR verify;
      4. large-star/small-star connected components over verified edges
         (graph.connected_components_star — the diameter-independent
         CC); singletons keep themselves (rep_id = vec_id).

    Cluster semantics: two vectors share a rep iff they connect through
    verified member→bucket-min edges — LSH star-edge clustering.
    Relative to pairs+CC, an edge is missed when a member's cosine to
    its bucket's MIN fails the threshold even though some other
    in-bucket pair passes — so edge quality rides bucket PURITY, not
    pair-collision probability. Hence ``target_bucket=4`` (vs the pair
    path's B=32): finer buckets make the bucket-min a same-group member
    with high probability, and each of the SRP_BANDS bands gives an
    independent rep draw that transitive closure merges. The recall
    target is DUPLICATE-GROUP capture (copies share band patterns at
    any width); scattered borderline pairs (θ near the threshold) are
    the pair path's job — tests/test_ann_recall.py audits both claims:
    copy-group recovery on a high-multiplicity corpus, and
    component-granularity precision (every edge cosine-verified, so a
    cluster can never span two true pair-graph components).

    The gate fixture (n ≤ 1024) stays in the frozen r=SRP_ROWS oracle
    region like every SRP operator; there the audit pins CORRECTNESS
    (bit-identical closure vs the recursive-CTE oracle), not recall.
    """
    if rows_bits is None:
        n = emb.count()
        rows_bits = SRP_ROWS if n <= 1024 else max(
            SRP_ROWS, (n // target_bucket).bit_length()
        )
    v, banded = _srp_banded(emb, rows_bits)
    wb = W.partitionBy("band_idx", "band_val")
    edges = (
        banded.withColumn("rep", F.min("vec_id").over(wb))
        .filter(F.col("vec_id") != F.col("rep"))
        .select("vec_id", "rep")
        .distinct()
    )
    verified = _verify_cosine_edges(edges, v, threshold)
    from pleiades_spark.operators.graph import connected_components_star

    cc = connected_components_star(verified, src="vec_id", dst="rep")
    return (
        v.select("vec_id")
        .join(
            cc.withColumnRenamed("doc_id", "vec_id").withColumnRenamed(
                "cluster", "rep_id"
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce(F.col("rep_id"), F.col("vec_id")).alias("rep_id"),
        )
    )


def embedding_dedup_reps_incremental(
    emb: DataFrame,
    new_col: str,
    threshold: float = 0.45,
    rows_bits: int | None = None,
    target_bucket: int = 4,
) -> DataFrame:
    """Nightly-increment maintenance of the EMBEDDING reps contract —
    the modality twin of :func:`doc_dedup_reps_incremental` (round 12,
    closing the symmetry gap the other way: round 11 gave text the
    incremental path it lacked; embeddings had none at all).

    Identical protocol, SRP band domain instead of MinHash: OLD phase =
    bucket-min star edges over the not-new slice (in production, the
    persisted index); NEW phase = only buckets containing a new vector,
    candidate rep = min(old bucket-rep, new members), edges from every
    new member plus the undercut old rep, each O(new members + 1) per
    bucket. Both phases verify by exact cosine ≥ t and one star-CC pass
    runs over the union. ``rows_bits`` derives from the FULL corpus
    count with the same target_bucket=4 purity rule as
    embedding_dedup_reps, so tonight's banding is the one the full
    rebuild would use (and the n ≤ 1024 gate region stays in the frozen
    r=SRP_ROWS oracle planes)."""
    if rows_bits is None:
        n = emb.count()
        rows_bits = SRP_ROWS if n <= 1024 else max(
            SRP_ROWS, (n // target_bucket).bit_length()
        )
    v, banded = _srp_banded(emb, rows_bits, keep=(new_col,))
    # One window pass over the band keys replaces the r12 shape's two
    # bucket aggregations + three joins (which re-derived the SRP bits
    # from parquet FOUR times — `banded` is lazy): per bucket, the old
    # rep (min over the not-new slice; null when the bucket is all-new,
    # matching the old left join), the full rep, and whether any member
    # is new, all from a single exchange of (vec_id, flag, band) rows —
    # the vectors themselves never enter the shuffle. Each row then
    # emits its old-phase and/or new-phase star edge inline; the edge
    # SET (post-distinct) is identical to the r12 plan's, so the cosine
    # verify, the CC pass, and the oracle replay are unchanged.
    wb = W.partitionBy("band_idx", "band_val")
    ann = banded.select(
        "vec_id", F.col(new_col).alias("_new"), "band_idx", "band_val"
    ).select(
        "vec_id",
        "_new",
        F.min(F.when(~F.col("_new"), F.col("vec_id"))).over(wb).alias("orep"),
        F.min("vec_id").over(wb).alias("frep"),
        F.max(F.col("_new").cast("int")).over(wb).alias("has_new"),
    )
    edges = (
        ann.select(
            F.explode(
                F.array_compact(
                    F.array(
                        F.when(
                            (~F.col("_new"))
                            & (F.col("vec_id") != F.col("orep")),
                            F.struct(
                                F.col("vec_id"), F.col("orep").alias("rep")
                            ),
                        ),
                        F.when(
                            (F.col("has_new") == 1)
                            & (F.col("vec_id") != F.col("frep"))
                            & (F.col("_new") | (F.col("vec_id") == F.col("orep"))),
                            F.struct(
                                F.col("vec_id"), F.col("frep").alias("rep")
                            ),
                        ),
                    )
                )
            ).alias("e")
        )
        .select("e.vec_id", "e.rep")
        .distinct()
    )
    verified = _verify_cosine_edges(edges, v, threshold)
    from pleiades_spark.operators.graph import connected_components_star

    cc = connected_components_star(verified, src="vec_id", dst="rep")
    return (
        v.select("vec_id")
        .join(
            cc.withColumnRenamed("doc_id", "vec_id").withColumnRenamed(
                "cluster", "rep_id"
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce(F.col("rep_id"), F.col("vec_id")).alias("rep_id"),
        )
    )


def write_emb_reps_index(
    emb: DataFrame,
    path: str,
    threshold: float = 0.45,
    rows_bits: int | None = None,
    target_bucket: int = 4,
) -> None:
    """Bootstrap the persisted EMBEDDING star index — the SRP twin of
    :func:`write_reps_index` (round 12). Five parquet tables, all linear:
    meta (rows_bits — the banding GEOMETRY is part of the artifact: the
    nightly must band tonight's vectors with the bootstrap's bits, not
    re-derive from tonight's count), band_index (band_idx, band_val,
    orep), edges (verified star edges), rep_vecs (vec_id, v — the only
    old vectors a new edge can need as verify partners), vec_ids."""
    if rows_bits is None:
        n = emb.count()
        rows_bits = SRP_ROWS if n <= 1024 else max(
            SRP_ROWS, (n // target_bucket).bit_length()
        )
    v, banded = _srp_banded(emb, rows_bits)
    spark = emb.sparkSession
    spark.createDataFrame(
        [(rows_bits,)], "rows_bits int"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    bkeys = ["band_idx", "band_val"]
    reps = banded.groupBy(*bkeys).agg(F.min("vec_id").alias("orep"))
    edges = (
        banded.join(reps, bkeys)
        .filter(F.col("vec_id") != F.col("orep"))
        .select("vec_id", F.col("orep").alias("rep"))
        .distinct()
    )
    verified = _verify_cosine_edges(edges, v, threshold)
    reps.write.mode("overwrite").parquet(f"{path}/band_index")
    verified.write.mode("overwrite").parquet(f"{path}/edges")
    rep_ids = reps.select(F.col("orep").alias("vec_id")).distinct()
    (
        v.join(rep_ids, "vec_id", "left_semi")
        .select("vec_id", "v")
        .write.mode("overwrite")
        .parquet(f"{path}/rep_vecs")
    )
    v.select("vec_id").write.mode("overwrite").parquet(f"{path}/vec_ids")
    _mark_index_ok(emb.sparkSession, path)


def _verify_cosine_edges(
    edges: DataFrame, v: DataFrame, threshold: float
) -> DataFrame:
    """Exact-cosine verification of (vec_id, rep) star edges against a
    (vec_id, v) vector frame — shared by the batch, incremental, and
    persisted-index embedding reps builders (per-row norms computed once
    per side, one dot per edge)."""
    vn = v.select("vec_id", "v").withColumn("nrm", norm(F.col("v")))
    va = vn.select(
        F.col("vec_id"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a")
    )
    vb = vn.select(
        F.col("vec_id").alias("rep"), F.col("v").alias("v_b"),
        F.col("nrm").alias("n_b"),
    )
    return (
        edges.join(va, "vec_id")
        .join(vb, "rep")
        .withColumn(
            "cos",
            F.round(
                dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")),
                6,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select("vec_id", "rep")
    )


def embedding_dedup_reps_from_index(
    new_emb: DataFrame,
    index_path: str,
    threshold: float = 0.45,
    out_index_path: str | None = None,
) -> DataFrame:
    """The embedding nightly over the persisted SRP star index — twin of
    :func:`doc_dedup_reps_from_index`: (vec_id, rep_id) for old ∪ new
    vectors, tonight's work O(increment). Banding geometry (rows_bits)
    comes from the index meta, so tonight's band values live in the same
    key space the bootstrap wrote. Semantics identical to
    :func:`embedding_dedup_reps_incremental` at the same rows_bits
    (equivalence-tested); ``out_index_path`` rolls the artifact forward.
    """
    _guard_inplace_roll(index_path, out_index_path)
    spark = new_emb.sparkSession
    _check_index_ok(spark, index_path, "embedding_dedup_reps_from_index")
    rows_bits = int(
        spark.read.parquet(f"{index_path}/meta").collect()[0]["rows_bits"]
    )
    band_index = spark.read.parquet(f"{index_path}/band_index")
    old_edges = spark.read.parquet(f"{index_path}/edges")
    rep_vecs = spark.read.parquet(f"{index_path}/rep_vecs")
    old_ids = spark.read.parquet(f"{index_path}/vec_ids")

    # localCheckpoint the banded frame (ADVICE r12 — was cache with no
    # unpersist): the SRP plane projection is the expensive per-vector
    # work and both new_mins and member_edges consume it; checkpoint
    # blocks free when the result frame is GC'd instead of accumulating
    # executor storage across a long session's nightlies
    v, banded = _srp_banded(new_emb, rows_bits)
    banded = banded.localCheckpoint()
    bkeys = ["band_idx", "band_val"]
    new_mins = banded.groupBy(*bkeys).agg(F.min("vec_id").alias("nmin"))
    touched = new_mins.join(band_index, bkeys, "left").select(
        *bkeys,
        F.least(
            F.col("nmin"), F.coalesce(F.col("orep"), F.col("nmin"))
        ).alias("frep"),
        "orep",
    )
    member_edges = (
        banded.join(touched, bkeys)
        .filter(F.col("vec_id") != F.col("frep"))
        .select("vec_id", F.col("frep").alias("rep"))
    )
    undercut_edges = touched.filter(
        F.col("orep").isNotNull() & (F.col("orep") != F.col("frep"))
    ).select(F.col("orep").alias("vec_id"), F.col("frep").alias("rep"))
    new_edges = member_edges.unionAll(undercut_edges).distinct()
    # new ids and old rep ids are disjoint by contract — no distinct
    vecs = v.select("vec_id", "v").unionAll(rep_vecs)
    verified_new = _verify_cosine_edges(new_edges, vecs, threshold)
    # in roll mode all_edges feeds BOTH the CC and the parquet write —
    # localCheckpoint so the verify join executes once
    all_edges = old_edges.unionAll(verified_new).distinct()
    if out_index_path is not None:
        all_edges = all_edges.localCheckpoint()
    from pleiades_spark.operators.graph import connected_components_star

    cc = connected_components_star(all_edges, src="vec_id", dst="rep")
    all_ids = old_ids.unionAll(v.select("vec_id"))
    result = (
        all_ids.join(
            cc.withColumnRenamed("doc_id", "vec_id").withColumnRenamed(
                "cluster", "rep_id"
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce(F.col("rep_id"), F.col("vec_id")).alias("rep_id"),
        )
    )
    if out_index_path is not None:
        spark.createDataFrame(
            [(rows_bits,)], "rows_bits int"
        ).write.mode("overwrite").parquet(f"{out_index_path}/meta")
        rolled = (
            band_index.join(touched.select(*bkeys), bkeys, "left_anti")
            .unionAll(touched.select(*bkeys, F.col("frep").alias("orep")))
        )
        rolled.write.mode("overwrite").parquet(f"{out_index_path}/band_index")
        all_edges.write.mode("overwrite").parquet(f"{out_index_path}/edges")
        rep_ids = rolled.select(F.col("orep").alias("vec_id")).distinct()
        (
            vecs.join(rep_ids, "vec_id", "left_semi")
            .write.mode("overwrite")
            .parquet(f"{out_index_path}/rep_vecs")
        )
        all_ids.write.mode("overwrite").parquet(f"{out_index_path}/vec_ids")
        _mark_index_ok(spark, out_index_path)
    return result


def embedding_near_dup_srp(
    emb: DataFrame,
    threshold: float = 0.45,
    rows_bits: int | None = None,
    max_expected_pairs: int | None = None,
) -> DataFrame:
    """Cosine near-dup pairs via signed-random-projection LSH — the scale
    path for embedding dedup that, unlike ``embedding_near_dup_ivf``, has
    no blind spots at Voronoi-cell borders (a pair split across two IVF
    centroids can never collide there; SRP buckets are direction-local, so
    every band gives such a pair an independent chance to meet).

    Plan (mirrors minhash_lsh_pairs — never all-pairs):
      1. one corpus scan computes SRP_PLANES_N hyperplane sign bits per
         vector (dot products against frozen literal planes, codegen'd);
      2. bits pack into SRP_BANDS keys of SRP_ROWS bits; posexplode;
      3. self-join on (band_idx, band_val) → distinct candidate pairs —
         a bucketed equi-join that shuffles 16-byte keys, not vectors;
      4. candidates re-join the vectors and are verified by exact cosine.

    Collision model: P(two vectors agree on one plane) = 1 − θ/π; a pair
    at the 0.45-cosine threshold (θ ≈ 63°) collides in ≥1 of the 4 bands
    w.p. ≈ 0.54, rising steeply toward 1 for true near-dups (θ → 0) —
    tests/test_ann_recall.py measures realized recall against the brute
    ground truth. More bands buy recall linearly in scan cost.

    Skew note: unlike text LSH (boilerplate → hot band buckets), SRP keys
    over continuous embeddings spread by direction; a cap/salt is only
    needed if the embedding space itself is degenerate (e.g. zero
    vectors), which the bucket-size guard in production would catch.

    ``rows_bits`` (bits per band, r) follows the SCALING RULE in
    functions/hashing.py: candidate volume grows as n²/2^r, so r must
    track the corpus — r ≈ log2(n / B) for target bucket size B. When
    None it is derived from a corpus count, with the r=4 frozen-oracle
    region deliberately WIDENED to every corpus up to 1024 vectors: the
    gate fixtures are documented as "<=1k vectors", so any fixture
    regeneration in that range keeps replaying the frozen r=4 DuckDB
    planes (a bare max() would flip to r=5 at n=512 and silently drop
    candidate pairs vs the oracle — round-4 advice). Above 1024 the
    B=32 rule takes over and buckets stay bounded at any scale; pinning
    r=4 there instead would leave only 16 row-buckets per band — a
    measured 28.9s quadratic blowup at sf1's 20k vectors vs ~5s scaled.
    Passing an explicit value skips the count job.
    """
    v, banded = _srp_banded(emb, rows_bits)
    # pre-flight on the banded index (column-pruned: the sign bits
    # recompute, the 64-double vectors never move) — see _guard_expected_pairs
    _guard_expected_pairs(
        banded.select("band_idx", "band_val"),
        ("band_idx", "band_val"),
        "embedding_near_dup_srp",
        max_expected_pairs,
        "embedding_dedup_reps",
    )
    left = banded.alias("l")
    right = banded.alias("r")
    first_shared = [
        (F.col("l.band_idx") <= F.lit(j))
        | (
            F.element_at(F.col("l.bands"), j + 1)
            != F.element_at(F.col("r.bands"), j + 1)
        )
        for j in range(SRP_BANDS)
    ]
    cond = (
        (F.col("l.band_idx") == F.col("r.band_idx"))
        & (F.col("l.band_val") == F.col("r.band_val"))
        & (F.col("l.vec_id") < F.col("r.vec_id"))
    )
    for term in first_shared:
        cond = cond & term
    # VERIFY INSIDE THE BAND JOIN (round 10): with first-shared-band
    # emission there is no post-join distinct, so nothing forces the
    # candidate pairs through another shuffle — the vectors (and their
    # per-row norms, computed once in _srp_banded) ride the LINEAR
    # n×bands banded shuffle, and the cosine streams out of the
    # sort-merge match with only (vec_a, vec_b, cos) ever emitted. The
    # old shape (re-joining v by vec_a then vec_b) shuffled candidate
    # rows CARRYING a 64-double vector by vec_b — Θ(pairs × dim) bytes,
    # ~500 GB at sf100's ~1e9-pair output-bound corpus, the half of the
    # DNF the first-band fix alone didn't cover. Same doubles: the same
    # left-to-right fold, and norms are per-vector either way.
    return (
        left.join(right, cond)
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(
                dot(F.col("l.v"), F.col("r.v"))
                / (F.col("l.nrm") * F.col("r.nrm")),
                6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# --- exact set-similarity join via prefix filtering (AllPairs/PPJoin) ------


def prefix_jaccard_pairs(
    docs: DataFrame,
    t_num: int = 3,
    t_den: int = 5,
    candidate_observation=None,
) -> DataFrame:
    """EXACT Jaccard similarity join by prefix filtering (Bayardo et al.
    2007 "Scaling Up All Pairs Similarity Search" / PPJoin): guaranteed
    recall 1 at threshold t = t_num/t_den, without the quadratic
    all-pairs block ngram_jaccard_pairs needs and without the
    probabilistic recall loss of the LSH paths.

    Principle: order every shingle set by global rarity (df ASC, shingle
    ASC); if J(a,b) ≥ t then |a∩b| ≥ ⌈t·|a|⌉, so a and b MUST share a
    token inside their first |s| − ⌈t·|s|⌉ + 1 rarest tokens. Candidates
    come from an equi-join on those prefix tokens only — rare tokens, so
    bucket sizes stay small exactly where boilerplate would explode a
    naive token join.

    ⌈t·n⌉ is computed in INTEGER arithmetic ((t_num·n + t_den−1) div
    t_den): the float form ceil(0.6·n) overshoots on exact multiples
    (0.6·5 = 3.0000000000000004 → 4), silently shortening the prefix
    and voiding the recall guarantee.

    Scale shape: the algorithm only needs a TOTAL ORDER on tokens, not
    a dense integer rank — so there is no vocabulary-wide window and no
    rank-table broadcast anywhere. The df table is a plain distributed
    aggregation joined back on the token (AQE broadcasts it when it
    happens to be small, shuffles it when the vocabulary is billions of
    rows); per-document rarity ordering is a local array_sort over
    (df, token) structs. Candidate generation shuffles prefix tokens (a
    t-dependent fraction of the corpus); verification joins shingle
    sets only for candidate pairs. Candidate volume tracks how RARE
    prefix tokens actually are: on natural text (Zipfian, huge tails of
    df=1 shingles) the prefixes prune aggressively; the synthetic
    fixture's word-soup reuses 3-word shingles heavily (see
    dup_span_stats), so its candidate set is denser than a real corpus
    would produce.

    HASHED-TOKEN DOMAIN (round 10, verdict r9 #4): the whole join —
    df, rarity order, prefix equi-join, verification — runs over
    md5-h32 shingle hashes shifted into signed 32-bit ints, not shingle
    strings. The sf100 probe measured candidate volume perfectly LINEAR
    (72.7k → 727k for 10× docs) yet the run DNF'd on disk: the verify
    stage was shipping ~6 KB string arrays per candidate through the
    doc_b shuffle (~500 GB at the extrapolated 73 M candidates). Int
    tokens cut prefix-join rows ~12× and verify arrays ~6× in bytes.
    The operator is still EXACT — recall 1 and bit-replayable — w.r.t.
    Jaccard over HASHED shingle sets; that differs from string-shingle
    Jaccard only when h32 collides inside a compared pair (≈ 600²/2³³
    ≈ 4e-5 per pair), and the DuckDB oracle hashes identically, so the
    gate stays exact. The same trade containment_lsh_pairs already
    made for its hash sets.
    """
    # Spread the shingle explode across the cluster up front: a small-SF
    # corpus arrives as one input split, which would leave the explode +
    # token hashing single-task (AQE would coalesce a column-only
    # repartition right back to one partition, so pin the count to the
    # executor-core total). At 100 TB the scan already has thousands of
    # splits wider than core count, and the no-op repartition guard
    # below skips the extra text shuffle entirely.
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism, F.col("doc_id"))
    # distinct hashed shingles, shifted to signed int (h - 2^31 is a
    # lossless bijection of [0, 2^32) onto the int range — 4-byte rows
    # both in the prefix shuffle and the verify arrays)
    sh_tbl = (
        docs.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    # staged tokens (r14): one split/row instead of ~6
                    word_shingles_from_tokens(F.col("toks"), F.col("text")),
                    lambda s: (h32(s) - F.lit(2**31)).cast("int"),
                )
            ).alias("hs"),
        )
    )
    # explode_OUTER (r14): plain explode makes InferFiltersFromGenerate
    # add Filter(size(hs)>0) which pushes below the projection by alias
    # substitution and re-evaluates the ENTIRE shingle+md5 chain per row
    # (CASE WHEN branches are excluded from codegen CSE). hs is never
    # null/empty by construction (word_shingles falls back to
    # array(text)), so outer is row-identical and skips the inferred
    # filter: paired in-session A/B at sf10 measured the rule exclusion
    # at 0.69x on this query (28.2 -> 19.4 s).
    tok = sh_tbl.select("doc_id", F.explode_outer("hs").alias("t"))
    df_tbl = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    # Rarity order WITHOUT a global rank: sort each document's hashed
    # shingle array by the (df, token) struct — array_sort on structs
    # compares fields left-to-right, giving exactly the (df ASC, token
    # ASC) total order the prefix-filtering proof needs — then project
    # back to plain int tokens. Set intersections over hashed-token
    # arrays ARE hashed-shingle-set intersections.
    ordered = (
        tok.join(df_tbl, "t")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "t"))),
                lambda x: x["t"],
            ).alias("ot")
        )
        .withColumn("n", F.size("ot"))
    )
    # L = n - ceil(t*n) + 1, integer-exact
    L = (
        F.col("n")
        - F.expr(f"({t_num} * n + {t_den} - 1) div {t_den}")
        + F.lit(1)
    ).cast("int")
    pref = ordered.select(
        "doc_id", "n",
        F.posexplode(F.slice(F.col("ot"), 1, L)).alias("p", "rk"),
    )
    pa, pb = pref.alias("pa"), pref.alias("pb")
    # AllPairs length filter: J ≥ t forces |a∩b| ≥ t·max(n_a, n_b) ≤
    # min(n_a, n_b), i.e. t_num·max ≤ t_den·min — integer-exact, prunes
    # candidates inside the join before the distinct/verify stages.
    #
    # PPJoin POSITIONAL filter (round 6): both docs order tokens by the
    # same global (df, token) total order, so for the FIRST common
    # prefix token — at 0-based positions p_a, p_b — every common token
    # sits at p_a.. / p_b.. onward, giving overlap ≤ min(n_a−p_a,
    # n_b−p_b). J ≥ t needs overlap ≥ α = ⌈t(n_a+n_b)/(1+t)⌉
    # (J = O/(n_a+n_b−O)), so any pair whose first match fails
    # min(n_a−p_a, n_b−p_b) ≥ α cannot qualify — and a qualifying
    # pair's first match always passes, so recall stays 1 and the
    # brute-side oracle is untouched. Integer-exact α. On shingle-reuse-
    # heavy corpora this is the filter that keeps hot prefix buckets
    # from emitting B² candidates the verify stage then discards.
    alpha = F.expr(
        f"({t_num} * (pa.n + pb.n) + {t_num + t_den} - 1)"
        f" div {t_num + t_den}"
    )
    cand = (
        pa.join(
            pb,
            (F.col("pa.rk") == F.col("pb.rk"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id"))
            & (F.lit(t_num) * F.col("pa.n") <= F.lit(t_den) * F.col("pb.n"))
            & (F.lit(t_num) * F.col("pb.n") <= F.lit(t_den) * F.col("pa.n"))
            & (
                F.least(
                    F.col("pa.n") - F.col("pa.p"),
                    F.col("pb.n") - F.col("pb.p"),
                )
                >= alpha
            ),
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b")
        )
    )
    cand = _observe_candidates(cand, candidate_observation).distinct()
    oa = ordered.select(
        F.col("doc_id").alias("doc_a"), F.col("ot").alias("ra"),
        F.col("n").alias("na"),
    )
    ob = ordered.select(
        F.col("doc_id").alias("doc_b"), F.col("ot").alias("rb"),
        F.col("n").alias("nb"),
    )
    thr = t_num / t_den
    inter = F.size(F.array_intersect("ra", "rb"))
    return (
        cand.join(oa, "doc_a")
        .join(ob, "doc_b")
        .withColumn(
            "jaccard",
            F.round(inter / (F.col("na") + F.col("nb") - inter), 6),
        )
        .filter(F.col("jaccard") >= thr)
        .select("doc_a", "doc_b", "jaccard")
    )


def prefix_containment_pairs(
    docs: DataFrame,
    t_num: int = 4,
    t_den: int = 5,
    allow_quadratic: bool = False,
    candidate_observation=None,
) -> DataFrame:
    """EXACT Jaccard-CONTAINMENT join: directional pairs (a → b) with
    C(a→b) = |A∩B| / |A| ≥ t — the asymmetric twin of
    prefix_jaccard_pairs that symmetric Jaccard misses by construction:
    a paragraph quoted inside a much longer document scores near-zero
    Jaccard (the union is huge) but containment ≈ 1. This is the
    sub-document-duplication detector (quotes, embedded boilerplate,
    near-superset re-crawls) a training-corpus pipeline runs alongside
    the symmetric dedup.

    Prefix principle adapts (Chaudhuri et al. SSJoin 2006): if
    |A∩B| ≥ ⌈t·|A|⌉ then A must hit B inside A's first
    |A| − ⌈t·|A|⌉ + 1 rarest tokens — but only the PROBE side (A) gets a
    prefix; the indexed side (B) contributes every token, because
    containment puts no lower bound on which of B's tokens the overlap
    uses. Candidates = equi-join of A-prefixes against the full token
    table, pre-pruned by the length filter t·|A| ≤ |B| (an overlap can
    never exceed |B|). Still recall 1 — the oracle verifies with a
    BRUTE containment join, valid precisely because this path is exact.

    Scale: the B side is the plain (doc, token) explode the df table
    already consumed — one extra shuffle of corpus tokens, no window, no
    rank broadcast; rarity ordering is the same local array_sort over
    (df, token) structs as the symmetric path. ⌈t·n⌉ in integer
    arithmetic (see prefix_jaccard_pairs — float ceil voids recall).

    DEMOTED TO BOUNDED GROUND TRUTH (round 7): candidate volume grows
    ~quadratically on shingle-reuse-heavy corpora (22.2× for 10× data at
    sf10, the one cell over the 20× bar in BENCH_SF10.md) — exactness is
    the wrong default at 100 TB. This now carries the same guard as the
    O(n²) ground truths (raises above QUADRATIC_GUARD_ROWS docs unless
    ``allow_quadratic=True``); :func:`containment_lsh_pairs` is the
    scale path, and this join is what its recall is audited against.

    ``candidate_observation``: optional ``pyspark.sql.Observation``;
    when given, the RAW (pre-distinct) candidate row count is recorded
    under ``candidate_rows`` on the first action — the production alarm
    for the corpus-shape assumption behind prefix pruning (the sf10
    lesson: candidate volume, not doc count, is what explodes).
    """
    _guard_quadratic(docs, "prefix_containment_pairs", allow_quadratic)
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism, F.col("doc_id"))
    # staged tokens (r14): one split per row instead of ~6 inline
    sh_tbl = docs.select(
        "doc_id", "text", tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        word_shingles_from_tokens(F.col("toks"), F.col("text")).alias("sh"),
    )
    tok = sh_tbl.select("doc_id", F.explode("sh").alias("t"))
    df_tbl = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        tok.join(df_tbl, "t")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "t"))),
                lambda x: x["t"],
            ).alias("ot")
        )
        .withColumn("n", F.size("ot"))
    )
    L = (
        F.col("n")
        - F.expr(f"({t_num} * n + {t_den} - 1) div {t_den}")
        + F.lit(1)
    ).cast("int")
    pref = ordered.select(
        "doc_id", "n",
        F.posexplode(F.slice(F.col("ot"), 1, L)).alias("p", "rk"),
    )
    full = ordered.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"),
        F.posexplode("ot").alias("pb", "rkb"),
    )
    # Positional filter (same first-common-token argument as
    # prefix_jaccard_pairs): overlap ≤ min(n_a−p_a, n_b−p_b), and
    # containment ≥ t needs overlap ≥ ⌈t·n_a⌉ — recall-1 preserving.
    alpha = F.expr(f"({t_num} * pa.n + {t_den} - 1) div {t_den}")
    # (A PPJoin-style overlap upper bound — c matched prefix tokens +
    # positional tails — was measured here and filtered ZERO of 1.74M
    # sf1 candidates: word-soup matches sit early in ~300-token lists,
    # so the positional tail always covers the requirement. Kept as the
    # simpler distinct; the bound only bites on corpora with long
    # rarity-sorted lists matching near the tail.)
    cand = (
        pref.alias("pa")
        .join(
            full,
            (F.col("pa.rk") == F.col("rkb"))
            & (F.col("pa.doc_id") != F.col("doc_b"))
            # |A∩B| ≤ |B|, so containment ≥ t needs t_num·|A| ≤ t_den·|B|
            & (F.lit(t_num) * F.col("pa.n") <= F.lit(t_den) * F.col("nb"))
            & (
                F.least(
                    F.col("pa.n") - F.col("pa.p"), F.col("nb") - F.col("pb")
                )
                >= alpha
            ),
        )
        .select(F.col("pa.doc_id").alias("doc_a"), "doc_b")
    )
    cand = _observe_candidates(cand, candidate_observation).distinct()
    oa = ordered.select(
        F.col("doc_id").alias("doc_a"), F.col("ot").alias("ra"),
        F.col("n").alias("na"),
    )
    ob = ordered.select(
        F.col("doc_id").alias("doc_b"), F.col("ot").alias("rb")
    )
    thr = t_num / t_den
    return (
        cand.join(oa, "doc_a")
        .join(ob, "doc_b")
        .withColumn(
            "containment",
            F.round(
                F.size(F.array_intersect("ra", "rb")) / F.col("na"), 6
            ),
        )
        .filter(F.col("containment") >= thr)
        .select("doc_a", "doc_b", "containment")
    )


# --- approximate containment join (bottom-k MinHash sample) ----------------

CONTAINMENT_SAMPLE_K = 32


def containment_lsh_pairs(
    docs: DataFrame,
    t_num: int = 4,
    t_den: int = 5,
    k: int = CONTAINMENT_SAMPLE_K,
    max_probe_df: int | None = None,
    min_probe_hits: int = 2,
    candidate_observation=None,
) -> DataFrame:
    """APPROXIMATE directional containment join — the 100 TB scale path
    that :func:`prefix_containment_pairs` (now a bounded ground truth)
    is audited against.

    Estimator (bottom-k MinHash / Broder-style sampling): hash every
    distinct shingle with the deterministic 32-bit h32; a document's
    SAMPLE is its k smallest distinct hash values. Under a random hash
    the k minima are a uniform size-k subset of A's shingle set, so with
    cnt = |sample_A ∩ h(B)| the statistic cnt/k_eff (k_eff = min(k,
    |h(A)|)) is hypergeometric with mean EXACTLY |h(A)∩h(B)|/|h(A)| —
    an unbiased estimate of containment C(A→B), collapsing to the exact
    value whenever |A| ≤ k. Std ≈ √(C(1−C)/k) ≈ 0.07 at C = 0.8,
    k = 32: borderline pairs flip, clear pairs (C ≥ 0.9) survive with
    ≥ 95 % probability — the recall audit in tests/test_approx.py
    measures this against the exact join.

    Candidate generation (why this scales where exact cannot): a pair
    can pass only with cnt ≥ ⌈t·k_eff⌉, i.e. at most k_eff − ⌈t·k_eff⌉
    sample misses — so by pigeonhole ANY fixed m = k_eff − ⌈t·k_eff⌉ + 1
    sample elements must contain a hit. The m probes are chosen as the
    sample's globally RAREST hashes (order by (df, h) — pigeonhole is
    order-free, so this is recall-preserving FOR THE ESTIMATOR), giving
    the same rare-token pruning as the exact prefix join but with the
    probe side bounded at m ≈ k(1−t)+1 rows per document (7 at k=32,
    t=0.8) instead of (1−t)·|A|+1 ≈ 61 growing with document length.
    Verification is one array_intersect of the k-element sample against
    B's hash set per candidate — no re-join of full shingle arrays.
    The exact length filter t·|A| ≤ |B| (overlap cannot exceed |B|)
    pre-prunes pairs whose TRUE containment cannot reach t; it only
    removes estimator false-positives, and the oracle replicates it.

    Every ingredient is deterministic md5-h32 + integer arithmetic, so
    the DuckDB oracle reproduces the output bit-for-bit. With
    ``max_probe_df=None`` the pigeonhole probe selection is lossless
    w.r.t. the estimator's own threshold, so a brute oracle suffices;
    with a cap the oracle must replay the probe selection itself
    (ORACLE_DEDUP_CONTAINMENT_LSH does).

    ``min_probe_hits`` (c, round 10) is a LOSSLESS candidate cut — the
    generalized pigeonhole: a qualifying pair misses at most
    m − 1 = k_eff − ⌈t·k_eff⌉ sample elements, so among the p =
    min(m + c − 1, k_eff) RAREST sample hashes it must hit B at least
    c_eff = max(1, p − (m − 1)) times. Emitting c − 1 extra probe rows
    per doc (~14 % at c=2, k=32) and grouping the probe join by
    (doc_a, doc_b) with a HAVING count ≥ c_eff drops every candidate
    that matched only once by chance — the bulk, on corpora whose
    shingle df is O(corpus/vocab) — BEFORE the verify joins ship the
    k-element samples. Recall w.r.t. the estimator is exactly 1; the
    oracle replays the same count threshold. (The sf100 probe measured
    the verify-input shuffle, not probe volume, as this operator's
    wall: ~212 M candidates × the 260 B sample payload.)

    ``max_probe_df`` is the hot-hash guard (round-10, verdict r9 #1) —
    the containment twin of minhash_lsh_pairs' max_bucket_size: a probe
    hash whose document frequency is df joins df index rows, so on a
    FIXED-vocabulary corpus (real text — Zipfian, df ∝ corpus size)
    candidate volume grows superlinearly even though probes per doc are
    bounded. Probes with df > cap are dropped after rarity selection
    and ``c_eff`` is recomputed from the SURVIVING probe count
    (round 11, ADVICE r10 — the pre-cap c_eff could exceed what the
    survivors could supply and silently zeroed such docs' candidates),
    so with a cap a document loses a qualifying candidate only when
    every probe it shares with that candidate is corpus-hot
    (boilerplate) — the same recall trade, and the same alarm path
    (candidate_observation), as the minhash cap. Capped candidate
    volume is ≤ n·p·cap — linear in the corpus by construction.

    ``candidate_observation``: see :func:`_observe_candidates`.

    Reference parity: the sub-document twin of the dedup mandated by
    SURVEY.md §2.6; same role as prefix_containment_pairs but with
    LSH-grade economics (cf. minhash_lsh_pairs vs ngram_jaccard_pairs).
    """
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism, F.col("doc_id"))
    # Sorted distinct hash set per doc; the sample is a prefix slice.
    # Cached: referenced by four branches (df table, probes, B index,
    # verify sides) — without the cache each branch re-runs the md5
    # hashing of every shingle from the text scan (6 scans observed in
    # the uncached plan). Same precedent as minhash_lsh_pairs' signed
    # cache; MEMORY_AND_DISK, ~n_docs × |shingles| × 8 B.
    hs_tbl = (
        docs.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        # staged tokens (r14): one split/row, not ~6
                        word_shingles_from_tokens(
                            F.col("toks"), F.col("text")
                        ),
                        h32,
                    )
                )
            ).alias("hs"),
        )
        .withColumn("n", F.size("hs"))
        .withColumn("samp", F.slice(F.col("hs"), 1, k))
        .withColumn("k_eff", F.least(F.lit(k), F.col("n")))
        .cache()
    )
    # Global document frequency of each hash (for rarity-ordered probes).
    tok = hs_tbl.select("doc_id", F.explode("hs").alias("h"))
    df_tbl = tok.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    # m rarest sample hashes per doc: explode the k-bounded sample, join
    # df, re-collect sorted by (df, h), slice m. All joins are equi-joins
    # on the 8-byte hash; the per-doc arrays are ≤ k elements.
    m = (
        F.col("k_eff")
        - F.expr(f"({t_num} * k_eff + {t_den} - 1) div {t_den}")
        + F.lit(1)
    ).cast("int")
    c = max(1, min_probe_hits)
    # p rarest probes; a qualifying pair must hit >= c_eff of them.
    # The df cap drops hot probes INSIDE the sliced array, and c_eff is
    # computed from the SURVIVING count (ADVICE r10): the pigeonhole
    # bound holds for any chosen subset — a qualifying pair misses at
    # most m−1 sample elements, so among surv survivors it hits
    # ≥ surv − (m−1) — whereas the round-10 form kept c_eff at the
    # pre-cap p and could demand more hits than the survivors could
    # ever supply (a doc with SOME hot rarest probes lost all
    # candidates even when a surviving rare probe hit). Residual loss
    # with a cap is now exactly: docs whose matching probes are ALL
    # corpus-hot (when surv − (m−1) ≤ 0 the clamp to 1 still requires
    # one surviving hit) — boilerplate, the documented trade.
    p_cnt = F.least(m + F.lit(c - 1), F.col("k_eff")).cast("int")
    sel = F.slice(F.col("rare"), 1, p_cnt)
    if max_probe_df is not None:
        sel = F.filter(sel, lambda x: x["df"] <= F.lit(max_probe_df))
    probes = (
        hs_tbl.select("doc_id", "n", "k_eff", F.explode("samp").alias("h"))
        .join(df_tbl, "h")
        .groupBy("doc_id", "n", "k_eff")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "h"))).alias("rare")
        )
        .withColumn("sel", sel)
        .select(
            "doc_id", "n",
            F.greatest(F.lit(1), F.size("sel") - (m - F.lit(1)))
            .cast("int").alias("c_eff"),
            F.explode("sel").alias("p"),
        )
        .select("doc_id", "n", "c_eff", F.col("p.h").alias("h"))
    )
    index = tok.select(
        F.col("doc_id").alias("doc_b"), F.col("h").alias("hb")
    ).join(
        hs_tbl.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
        "doc_b",
    )
    cand = (
        probes.alias("pa")
        .join(
            index,
            (F.col("pa.h") == F.col("hb"))
            & (F.col("pa.doc_id") != F.col("doc_b"))
            & (F.lit(t_num) * F.col("pa.n") <= F.lit(t_den) * F.col("nb")),
        )
        .select(F.col("pa.doc_id").alias("doc_a"), "doc_b", "c_eff")
    )
    # multi-hit requirement replaces the plain distinct: one groupBy
    # over SLIM (doc_a, doc_b) rows, before any sample payload is joined
    cand = (
        _observe_candidates(cand, candidate_observation)
        .groupBy("doc_a", "doc_b", "c_eff")
        .agg(F.count(F.lit(1)).alias("probe_hits"))
        .filter(F.col("probe_hits") >= F.col("c_eff"))
        .select("doc_a", "doc_b")
    )
    a_side = hs_tbl.select(
        F.col("doc_id").alias("doc_a"), F.col("samp").alias("samp_a"),
        F.col("k_eff").alias("ka"),
    )
    b_side = hs_tbl.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")
    )
    cnt = F.size(F.array_intersect("samp_a", "hs_b"))
    return (
        cand.join(a_side, "doc_a")
        .join(b_side, "doc_b")
        .withColumn("hits", cnt)
        .filter(F.lit(t_den) * F.col("hits") >= F.lit(t_num) * F.col("ka"))
        .withColumn(
            "containment_est",
            F.round(F.col("hits") / F.col("ka"), 6),
        )
        .select("doc_a", "doc_b", "containment_est")
    )
