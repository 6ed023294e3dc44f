"""Count-Min Sketch frequency estimation + Bloom-filter join pruning.

Completes the hash-matched sketch family (MinHash/SimHash in dedup.py,
HLL++ in relational): both sketches here are built from the md5-derived
h32 (functions/hashing.py) so the DuckDB oracle replays them bit-for-bit
— estimation ERROR included — giving approximate operators the same
full-strength gate as exact queries.

Count-Min Sketch (Cormode & Muthukrishnan 2005): d independent hash rows
of w counters; estimate(key) = min over rows of the counter at
h_i(key) mod w. Overestimates only (collisions add), error ≤ 2N/w with
probability 1 - (1/2)^d.

Scale shape: the sketch is a (d × w) table — O(1) in the data size, the
entire point. Building it is ONE map-side-combinable aggregation (every
row contributes d cells); querying broadcasts the sketch. At 100 TB the
sketch is still 4 KB while an exact groupBy would shuffle billions of
keys. The top-k step here re-derives candidate keys from a distinct scan
(cheap at gate SF); a production heavy-hitter pass instead keeps the
CMS + a per-partition candidate heap (space-saving style) so no global
distinct is needed.

Bloom filter (Bloom 1970): k bit positions per key in an m-bit array;
membership = all k bits set. False positives at rate ≈ (1 - e^{-kn/m})^k,
never false negatives. Used here as join pruning: build from the DIM
side's join keys, pre-filter the FACT side before the real join — the
pattern Spark's own runtime row-level filtering (bloom join) applies,
made explicit and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pleiades_spark.functions.hashing import MINHASH_P, MINHASH_PERMS, h32, perm_hash

CMS_DEPTH = 4
CMS_WIDTH = 256

BLOOM_BITS = 4096
BLOOM_HASHES = 3


def _cms_buckets_from_h(h: Column, depth: int, width: int) -> Column:
    """All d bucket ids from ONE pre-computed h32 value (md5 is the
    expensive part — evaluate it once per row, derive every row's bucket
    by cheap integer perm hashes)."""
    return F.array(
        *[perm_hash(h, *MINHASH_PERMS[r]) % width for r in range(depth)]
    )


def cms_build(
    df: DataFrame, key: Column, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt) cells, depth × width max rows.

    One Generate (d cells per input row) into a partial-aggregated
    groupBy — the shuffle moves at most d·w pre-combined cells per task,
    never the data.
    """
    cells = df.select(h32(key).alias("_h")).select(
        F.posexplode(_cms_buckets_from_h(F.col("_h"), depth, width)).alias(
            "row", "bucket"
        )
    )
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    keys: DataFrame,
    key_col: str,
    sketch: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimate each key's frequency: min over rows of its bucket count.

    The sketch side is tiny (≤ d·w cells) — broadcast it; the join never
    shuffles the key side.
    """
    probes = keys.select(key_col, h32(F.col(key_col)).alias("_h")).select(
        key_col,
        F.posexplode(_cms_buckets_from_h(F.col("_h"), depth, width)).alias(
            "row", "bucket"
        ),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"])
    return joined.groupBy(key_col).agg(F.min("cnt").alias("est"))


def cms_heavy_hitters(
    df: DataFrame,
    key: Column,
    key_name: str,
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Top-k keys by CMS-estimated frequency (est DESC, key ASC).

    The reported ``est`` carries the sketch's collision overestimate —
    deterministically, so the oracle reproduces the exact same numbers.

    r13 restructure (guide §4-adjacent: do the expensive hash once):
    the r12 shape hashed EVERY ROW for the build (md5 ×N) and scanned
    the fact again for a distinct + second md5 pass for the probes. Now
    ONE map-combined groupBy reduces the stream to per-key counts, the
    md5 runs once per DISTINCT key, and the sketch cell counts come
    from summing key counts into buckets — identical integers (a
    cell's count is the number of rows hashing there, however summed).
    The (key, cnt, h) frame is localCheckpoint'ed: it feeds both the
    build and the probe sides, is distinct-key-sized, and lazily each
    branch would re-run the groupBy + md5.
    """
    from pyspark.sql.window import Window as W

    named = df.select(key.alias(key_name))
    hashed = (
        named.groupBy(key_name)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(key_name, "_cnt", h32(F.col(key_name)).alias("_h"))
        .localCheckpoint(eager=False)
    )
    exploded = hashed.select(
        key_name,
        "_cnt",
        F.posexplode(_cms_buckets_from_h(F.col("_h"), depth, width)).alias(
            "row", "bucket"
        ),
    )
    sketch = exploded.groupBy("row", "bucket").agg(
        F.sum("_cnt").alias("cnt")
    )
    est = (
        exploded.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key_name)
        .agg(F.min("cnt").alias("est"))
    )
    # orderBy + limit compiles to TakeOrderedAndProject (per-partition
    # heaps, no global sort); the row_number window then ranks only the
    # already-tiny top-k result.
    topk = est.orderBy(F.col("est").desc(), F.col(key_name).asc()).limit(k)
    w = W.orderBy(F.col("est").desc(), F.col(key_name).asc())
    return topk.withColumn("rk", F.row_number().over(w)).select(
        key_name, "est", "rk"
    )


def _bloom_positions_from_h(h: Column, n_hashes: int, bits: int) -> list[Column]:
    # Offset the perm index so the Bloom hashes are independent of the
    # CMS rows even when both sketches run in one query. ``h`` is the
    # pre-computed h32 — one md5 per row, k cheap integer perms.
    return [
        perm_hash(h, *MINHASH_PERMS[CMS_DEPTH + i]) % bits for i in range(n_hashes)
    ]


def bloom_bits_for(n_keys: int, bits_per_key: int = 10) -> int:
    """Power-of-two filter size for ``n_keys`` (~10 bits/key ≈ 1% fp with
    k=3), floored at the frozen gate size BLOOM_BITS — the DuckDB oracle
    replays % BLOOM_BITS, and the ≤400-key gate fixtures land exactly
    there. A fixed m saturates the moment the dim outgrows it (measured
    at sf0.1: 4k keys in 4096 bits → 86% false-pass, the "prune" passed
    571k of 600k rows); sizing from the build-side count is what Spark's
    own InjectRuntimeFilter does with its ndv estimate."""
    m = BLOOM_BITS
    while m < n_keys * bits_per_key:
        m *= 2
    return m


def bloom_words_from_hashes(hashes: list[int], bits: int) -> list[int]:
    """Driver-side bitmap from already-computed h32 draws. The bitmap
    must reach the driver either way (it ships into the fact scan as a
    literal), but the md5 work should NOT: hash keys executor-side
    (``dim.select(h32(key))``) and collect one bigint per key, so the
    driver's remaining cost is k integer perms per key — at a
    multi-million-row dim the Python md5 loop was the driver-CPU
    bottleneck, the perms are not."""
    words = [0] * (bits // 32)
    for h in hashes:
        for i in range(BLOOM_HASHES):
            a, b = MINHASH_PERMS[CMS_DEPTH + i]
            p = (a * h + b) % MINHASH_P % bits
            words[p // 32] |= 1 << (p % 32)
    return words


def bloom_words_from_keys(keys: list[str], bits: int) -> list[int]:
    """Driver-side bitmap from a raw key list — the Python-md5 twin of
    (bloom_build → collect): h32 is the first 8 hex chars of md5, so
    hashlib reproduces the JVM column bit-for-bit. Prefer
    ``bloom_words_from_hashes`` + an executor-side h32 when the keys
    come from a DataFrame anyway; this form remains for already-local
    key lists (tests, serving-layer probes)."""
    import hashlib

    return bloom_words_from_hashes(
        [int(hashlib.md5(k.encode()).hexdigest()[:8], 16) for k in keys], bits
    )


def bloom_build(dim: DataFrame, key: Column, bits: int = BLOOM_BITS) -> DataFrame:
    """Distinct set bit positions from the dim side's keys (≤ m rows)."""
    return (
        dim.select(h32(key).alias("_h"))
        .select(
            F.explode(
                F.array(*_bloom_positions_from_h(F.col("_h"), BLOOM_HASHES, bits))
            ).alias("pos")
        )
        .distinct()
    )


def bloom_prune(
    fact: DataFrame, key: Column, bloom: DataFrame, bits: int = BLOOM_BITS
) -> DataFrame:
    """Keep fact rows whose key passes the Bloom membership test.

    The position set is materialized ONCE into an m-bit bitmap packed as
    a literal array of 32-bit words (m = BLOOM_BITS → 512 bytes — bounded
    by the sketch size, not the data; the collect here ships a sketch,
    same as any broadcast), then membership is k O(1) word-index +
    bit-AND probes compiled into the fact scan — a pure map-side prune,
    zero joins, exactly how Spark's own InjectRuntimeFilter ships its
    bloom to the fact side. The previous form (k broadcast semi joins)
    re-derived the dim distinct k times and put 3 joins where a filter
    belongs. (Not a '0'/'1' string + substr probe: UTF8String substring
    with a dynamic offset is O(offset) codepoint counting — measured 6×
    slower than element_at on the word array.)
    """
    words = [0] * (bits // 32)
    for r in bloom.collect():
        p = int(r["pos"])
        words[p // 32] |= 1 << (p % 32)
    return bloom_prune_words(fact, key, words, bits)


def bloom_prune_words(
    fact: DataFrame, key: Column, words: list[int], bits: int, hfn=h32
) -> DataFrame:
    """Map-side Bloom prune against a driver-resident bitmap (see
    bloom_prune; words from bloom_words_from_keys or a collected build).

    ``hfn`` selects the 32-bit hash family: md5-derived ``h32`` (default,
    oracle-replayable) or ``h32_prod`` (xxhash64, JVM-intrinsic — the
    production path; the build side must use the SAME family).

    The bitmap ships as a BROADCAST one-row DataFrame crossJoined in —
    not a literal array. Two measured reasons (sf1, 32k-word bitmap):
    (1) ``F.lit(list)`` converts element-by-element over py4j — 14-18 s
    of pure DRIVER time at plan construction, dwarfing the 2 s scan it
    feeds; createDataFrame ships the same words in one Arrow batch
    (0.1 s). (2) a literal is baked into the task binary and re-shipped
    with EVERY task (1.4 MB observed), a broadcast goes once per
    executor — the difference compounds with dim size at 100 TB. The
    probe stays O(1) per row: element_at on the single shared array +
    bit-AND; the crossJoin's build side is one row, so the "join" is a
    no-shuffle pointer attach (BroadcastNestedLoopJoin, 1-row build)."""
    spark = fact.sparkSession
    wdf = spark.createDataFrame([(words,)], "_bloom_words array<bigint>")
    pow2 = F.lit([1 << i for i in range(32)])
    pruned = fact.withColumn("_h", hfn(key)).crossJoin(F.broadcast(wdf))
    warr = F.col("_bloom_words")
    cond = F.lit(True)
    for pos in _bloom_positions_from_h(F.col("_h"), BLOOM_HASHES, bits):
        # pos ∈ [0, bits): word index via integer shift — floor(pos/32)
        # would detour through a double division.
        word = F.element_at(warr, F.shiftright(pos, 5).cast("int") + F.lit(1))
        bit = F.element_at(pow2, pos.bitwiseAND(F.lit(31)).cast("int") + F.lit(1))
        cond = cond & (word.bitwiseAND(bit) != 0)
    return pruned.filter(cond).drop("_h", "_bloom_words")


# --- KMV (k minimum values) cardinality sketch ----------------------------

KMV_K = 64


def kmv_distinct(df: DataFrame, group: str, key: Column, k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate per group via the KMV sketch — the
    cardinality sketch that, built on the md5-derived h32, is
    DETERMINISTIC across engines: unlike HLL (approx_count_distinct,
    whose register layout is engine-private, hence the rows-only
    approx_distinct gate), every intermediate here replays in DuckDB
    bit-for-bit.

    Estimator: with h = h32/2³² uniform on [0,1), the k-th smallest
    distinct hash h_(k) estimates |S| ≈ (k-1)/h_(k); groups with fewer
    than k distinct values report exactly |S|. Error ~ 1/√k. Sketch
    state is k 8-byte values per group — mergeable (union = merge-sort,
    keep k smallest), which is what makes it a real distributed sketch:
    partial sketches combine associatively on the map side.
    """
    from pyspark.sql.window import Window as W

    hashed = (
        df.select(F.col(group).alias("grp"), h32(key).alias("h"))
        .distinct()
    )
    w = W.partitionBy("grp").orderBy(F.col("h").asc())
    topk = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    agg = topk.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_min"),
        F.max("h").alias("h_k"),
    )
    est = F.when(
        F.col("n_min") < k, F.col("n_min").cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(2.0 ** 32)) / F.col("h_k"))
    return agg.select(
        F.col("grp"),
        F.round(est, 4).alias("est_distinct"),
        F.col("n_min"),
    )


# --- KMV set operations (union / intersection / Jaccard estimates) --------

KMV_SET_SALT = 32


def kmv_group_sketch(
    df: DataFrame, group: str, key: Column, k: int = KMV_K,
    salt: int = KMV_SET_SALT,
) -> DataFrame:
    """Per-group KMV sketch as ROWS (grp, h): the k smallest DISTINCT
    h32 values of `key` per group. Unlike kmv_distinct (which reduces
    straight to the estimate), the sketch rows themselves are returned
    so downstream set algebra (union/intersection across groups) can
    operate on them relationally.

    Scale shape: the k-min is computed in TWO salted stages. A plain
    `row_number() OVER (PARTITION BY grp ORDER BY h)` makes one task
    sort one group's ENTIRE distinct-hash stream — with few groups
    (sources, languages) that is a handful of tasks sorting millions of
    rows each at 100 TB. Stage 1 instead partitions by (grp, h mod S)
    and keeps k per salt class — S-way parallel, and correct because
    every member of the global k-min is also within the k-min of its
    own salt class. Stage 2 re-ranks the ≤ S·k survivors per group —
    |groups|·S·k rows, driver-trivial at any corpus size.
    """
    from pyspark.sql.window import Window as W

    hashed = (
        df.select(F.col(group).alias("grp"), h32(key).alias("h"))
        .distinct()
    )
    w1 = W.partitionBy("grp", "s").orderBy(F.col("h").asc())
    part = (
        hashed.withColumn("s", F.pmod(F.col("h"), F.lit(salt)))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .drop("rn", "s")
    )
    w2 = W.partitionBy("grp").orderBy(F.col("h").asc())
    return (
        part.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_pair_set_ops(sk: DataFrame, k: int = KMV_K) -> DataFrame:
    """Distinct-set algebra over every PAIR of groups from their KMV
    sketches (Beyer et al., SIGMOD 2007): for groups A and B with
    k-min sketches K_A and K_B,

        L        = k smallest of K_A ∪ K_B       (the union's own sketch)
        est_union = (k-1) / h_(k)(L)  (scaled by 2³²; exact |L| if < k)
        ρ        = |{h ∈ L : h ∈ K_A and h ∈ K_B}| / |L|
        est_inter = ρ · est_union,   est_jaccard = ρ

    ρ is a hypergeometric sample proportion over the union sketch, so
    est_inter/est_jaccard inherit KMV's ~1/√k error. This yields actual
    CARDINALITIES (how many distinct shingles do two crawl feeds
    share), which the MinHash signature overlap (source_overlap_
    minhash) cannot — signatures estimate only the ratio.

    Everything here runs on |groups|·k sketch ROWS — after the one big
    scan inside kmv_group_sketch, the pair matrix is driver-trivial
    (two broadcast equi-joins; no OR-condition nested-loop join).

    The sketch is localCheckpoint'ed first: ``sk`` is consumed THREE
    times below (the group list and both join sides), and a lazily
    built sketch re-runs its whole upstream — for the source-overlap
    gate that is the corpus-wide shingle scan ×3 (the plan showed 12
    parquet scans; runtime ReuseExchange does not merge the branches
    because each re-reference re-expands the shingle HOF differently).
    Materializing |groups|·k rows is driver-trivial at any corpus size.
    """
    from pyspark.sql.window import Window as W

    sk = sk.localCheckpoint()
    groups = sk.select(F.col("grp")).distinct()
    pairs = (
        groups.alias("x")
        .join(groups.alias("y"), F.col("x.grp") < F.col("y.grp"))
        .select(F.col("x.grp").alias("ga"), F.col("y.grp").alias("gb"))
    )
    ma = (
        F.broadcast(pairs)
        .join(sk, sk["grp"] == F.col("ga"))
        .select("ga", "gb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    )
    mb = (
        F.broadcast(pairs)
        .join(sk, sk["grp"] == F.col("gb"))
        .select("ga", "gb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    )
    merged = (
        ma.unionByName(mb)
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = W.partitionBy("ga", "gb").orderBy(F.col("h").asc())
    union_sketch = (
        merged.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    )
    agg = union_sketch.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("n_l"),
        F.max("h").alias("h_k"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    est_union = F.when(
        F.col("n_l") < k, F.col("n_l").cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(2.0 ** 32)) / F.col("h_k"))
    rho = F.col("n_both").cast("double") / F.col("n_l")
    return agg.select(
        F.col("ga"),
        F.col("gb"),
        est_union.alias("_u"),
        rho.alias("_rho"),
    ).select(
        "ga",
        "gb",
        (F.floor(F.col("_u") * 10000 + F.lit(0.5)) / 10000).alias("est_union"),
        (F.floor(F.col("_rho") * F.col("_u") * 10000 + F.lit(0.5)) / 10000)
        .alias("est_inter"),
        (F.floor(F.col("_rho") * 10000 + F.lit(0.5)) / 10000)
        .alias("est_jaccard"),
    )
