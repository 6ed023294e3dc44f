"""LLM-data-pipeline queries (SURVEY.md §7 M5 + driver contract).

Dedup (exact / MinHash-LSH / SimHash / exact n-gram Jaccard / embedding
cosine), similarity search (brute top-k + IVF bucketed), and text analysis
(quality scoring, n-gram language ID, token counting, fingerprinting,
word frequencies) over the ``documents`` / ``embeddings`` fixtures.

Every sketch uses the md5-derived h32 hash (functions/hashing.py), so the
DuckDB oracles reproduce signatures, bands, candidate pairs, and verdicts
BIT-FOR-BIT — the dedup operators get the same full-strength hash-match
gate as plain SQL queries, not a weak rows-only check.

The oracle SQL strings are generated from the same frozen constants
(MINHASH_PERMS, STOPWORDS, band/chunk layout) as the Spark plans — one
source of truth, two dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pleiades_spark import catalog
from pleiades_spark.functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_P,
    MINHASH_PERMS,
    SRP_BANDS,
    SRP_PLANES,
    SRP_ROWS,
    h32,
    h32_sql,
)
from pleiades_spark.functions.text import (
    BPE_PATTERN,
    char_shingles,
    char_shingles_sql,
    stopword_count,
    stopword_count_sql,
    tokens,
    word_shingles_sql,
)
from pleiades_spark.operators.dedup import (
    SIMHASH_BITS,
    embedding_near_dup_ivf,
    embedding_near_dup_ivf2,
    embedding_near_dup_pairs,
    embedding_near_dup_srp,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from pleiades_spark.operators.similarity import ivf_knn, knn_brute
from pleiades_spark.plans import Query
from pleiades_spark.session import apply_runtime_confs


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    return catalog.load(spark, sf_dir, name)


# =========================== dedup =======================================


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(_t(spark, sf_dir, "documents"))


ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS text_md5, min(doc_id) AS rep_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# --- minhash LSH ----------------------------------------------------------

JACCARD_THRESHOLD = 0.6

_SIG_SQL = "[" + ", ".join(
    f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_P}))"
    for a, b in MINHASH_PERMS
) + "]"

_BANDS_RANGE_SQL = f"(SELECT unnest(range(0, {LSH_BANDS})) AS band_idx)"


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"), JACCARD_THRESHOLD)


ORACLE_DEDUP_MINHASH = f"""
WITH sh AS (
  SELECT doc_id, {word_shingles_sql('text')} AS sh FROM documents
), hashed AS (
  SELECT doc_id, sh, list_transform(sh, s -> {h32_sql('s')}) AS hs FROM sh
), sig AS (
  SELECT doc_id, {_SIG_SQL} AS sig FROM hashed
), bands AS (
  SELECT doc_id, band_idx,
         array_to_string(sig[band_idx*{LSH_ROWS}+1 : band_idx*{LSH_ROWS}+{LSH_ROWS}], '-') AS band_key
  FROM sig, {_BANDS_RANGE_SQL}
), cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key AND l.doc_id < r.doc_id
), verified AS (
  SELECT doc_a, doc_b,
         round(len(list_intersect(a.sh, b.sh)) * 1.0
               / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
  FROM cand JOIN sh a ON a.doc_id = cand.doc_a JOIN sh b ON b.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
"""


# --- linear-output document dedup (reps grain) ------------------------------


def q_doc_dedup_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-output DOCUMENT dedup (round 11): (doc_id, rep_id) via
    MinHash band bucket-min star edges, exact hashed-shingle Jaccard
    edge verification, and large-star/small-star connected components
    (operators/dedup.doc_dedup_reps) — the text-side twin of
    dedup_embedding_reps. The production contract for template-heavy
    corpora, where any pair-emitting operator's OUTPUT is
    Θ(Σ multiplicity²); this stays at n·LSH_BANDS by construction. The
    oracle replays banding, bucket-min rep selection, the int32
    hashed-set Jaccard verification, and the transitive closure
    (recursive CTE)."""
    from pleiades_spark.operators.dedup import doc_dedup_reps

    return doc_dedup_reps(_t(spark, sf_dir, "documents"), JACCARD_THRESHOLD)


ORACLE_DOC_DEDUP_REPS = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, {word_shingles_sql('text')} AS sh FROM documents
), hashed AS (
  SELECT doc_id, list_transform(sh, s -> {h32_sql('s')}) AS hs FROM sh
), sig AS (
  SELECT doc_id, {_SIG_SQL} AS sig,
         list_distinct(list_transform(hs, h -> CAST(h - 2147483648 AS INTEGER)))
           AS hset
  FROM hashed
), bands AS (
  SELECT doc_id, band_idx,
         array_to_string(sig[band_idx*{LSH_ROWS}+1 : band_idx*{LSH_ROWS}+{LSH_ROWS}], '-') AS band_key
  FROM sig, {_BANDS_RANGE_SQL}
), reps AS (
  SELECT band_idx, band_key, min(doc_id) AS rep
  FROM bands GROUP BY band_idx, band_key
), e0 AS (
  SELECT DISTINCT b.doc_id, r.rep
  FROM bands b JOIN reps r
    ON b.band_idx = r.band_idx AND b.band_key = r.band_key
  WHERE b.doc_id != r.rep
), ver AS (
  SELECT doc_id, rep FROM (
    SELECT e0.doc_id, e0.rep,
           round(len(list_intersect(a.hset, b.hset)) * 1.0
                 / (len(a.hset) + len(b.hset)
                    - len(list_intersect(a.hset, b.hset))), 6) AS jaccard
    FROM e0 JOIN sig a ON a.doc_id = e0.doc_id
            JOIN sig b ON b.doc_id = e0.rep
  ) WHERE jaccard >= {JACCARD_THRESHOLD}
), edges AS (
  SELECT doc_id AS u, rep AS w FROM ver
  UNION SELECT rep, doc_id FROM ver
), reach(node, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.w, reach.r FROM reach JOIN edges e ON e.u = reach.node
), cl AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
SELECT d.doc_id, CAST(coalesce(cl.cluster, d.doc_id) AS BIGINT) AS rep_id
FROM documents d LEFT JOIN cl ON cl.node = d.doc_id
"""


INCR_PCT = 20  # this run's "new" slice of the corpus


def q_doc_dedup_reps_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the linear reps contract (round 11):
    last night's reps (star edges over the old slice) + tonight's
    O(increment) bucket work (only buckets containing a new doc; edges
    from new members and undercut old bucket-reps to the bucket's full
    min) → one CC pass over the union of verified edges
    (operators/dedup.doc_dedup_reps_incremental). Same deterministic
    20 % hash slice as dedup_incremental stands in for tonight's crawl.
    The oracle replays both phases and the closure bit-for-bit."""
    from pleiades_spark.functions.hashing import h32
    from pleiades_spark.operators.dedup import doc_dedup_reps_incremental

    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_new",
        h32(F.concat(F.lit("incr:"), F.col("doc_id").cast("string"))) % 100
        < INCR_PCT,
    )
    return doc_dedup_reps_incremental(docs, "is_new", JACCARD_THRESHOLD)


ORACLE_DOC_DEDUP_REPS_INCR = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         {h32_sql("concat('incr:', CAST(doc_id AS VARCHAR))")} % 100
           < {INCR_PCT} AS is_new,
         {word_shingles_sql('text')} AS sh
  FROM documents
), hashed AS (
  SELECT doc_id, is_new, list_transform(sh, s -> {h32_sql('s')}) AS hs FROM sh
), sig AS (
  SELECT doc_id, is_new, {_SIG_SQL} AS sig,
         list_distinct(list_transform(hs, h -> CAST(h - 2147483648 AS INTEGER)))
           AS hset
  FROM hashed
), bands AS (
  SELECT doc_id, is_new, band_idx,
         array_to_string(sig[band_idx*{LSH_ROWS}+1 : band_idx*{LSH_ROWS}+{LSH_ROWS}], '-') AS band_key
  FROM sig, {_BANDS_RANGE_SQL}
), oreps AS (
  SELECT band_idx, band_key, min(doc_id) AS orep
  FROM bands WHERE NOT is_new GROUP BY band_idx, band_key
), oe AS (
  SELECT DISTINCT b.doc_id, o.orep AS rep
  FROM bands b JOIN oreps o
    ON b.band_idx = o.band_idx AND b.band_key = o.band_key
  WHERE NOT b.is_new AND b.doc_id != o.orep
), freps AS (
  SELECT band_idx, band_key, min(doc_id) AS frep,
         max(CASE WHEN is_new THEN 1 ELSE 0 END) AS has_new
  FROM bands GROUP BY band_idx, band_key
), ne AS (
  SELECT DISTINCT b.doc_id, f.frep AS rep
  FROM bands b
  JOIN freps f
    ON b.band_idx = f.band_idx AND b.band_key = f.band_key AND f.has_new = 1
  LEFT JOIN oreps o
    ON b.band_idx = o.band_idx AND b.band_key = o.band_key
  WHERE b.doc_id != f.frep AND (b.is_new OR b.doc_id = o.orep)
), e0 AS (
  SELECT doc_id, rep FROM oe UNION SELECT doc_id, rep FROM ne
), ver AS (
  SELECT doc_id, rep FROM (
    SELECT e0.doc_id, e0.rep,
           round(len(list_intersect(a.hset, b.hset)) * 1.0
                 / (len(a.hset) + len(b.hset)
                    - len(list_intersect(a.hset, b.hset))), 6) AS jaccard
    FROM e0 JOIN sig a ON a.doc_id = e0.doc_id
            JOIN sig b ON b.doc_id = e0.rep
  ) WHERE jaccard >= {JACCARD_THRESHOLD}
), edges AS (
  SELECT doc_id AS u, rep AS w FROM ver
  UNION SELECT rep, doc_id FROM ver
), reach(node, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.w, reach.r FROM reach JOIN edges e ON e.u = reach.node
), cl AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
SELECT d.doc_id, CAST(coalesce(cl.cluster, d.doc_id) AS BIGINT) AS rep_id
FROM documents d LEFT JOIN cl ON cl.node = d.doc_id
"""


def _incr_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture documents + the deterministic is_new increment slice —
    shared by the persisted-index and streaming-reps gates so both see
    the identical old/new split."""
    from pleiades_spark.functions.hashing import h32

    return _t(spark, sf_dir, "documents").withColumn(
        "is_new",
        h32(F.concat(F.lit("incr:"), F.col("doc_id").cast("string"))) % 100
        < INCR_PCT,
    )


def staged_doc_reps_index(spark: SparkSession, sf_dir: str) -> str:
    """Bootstrap (or reuse) the persisted doc star index over the OLD
    slice, cached per fixture identity via the shared staging helper —
    one artifact serves the persisted nightly gate AND the streaming
    reps gates. The staging key carries every constant the index CONTENT
    depends on (slice pct, threshold, band geometry, shingle width,
    hash-domain version — ADVICE r12: the earlier key named only the
    first two, so retuning LSH_BANDS/LSH_ROWS would have silently reused
    a stale artifact and surfaced as an oracle mismatch, not a rebuild).
    """
    from pleiades_spark.operators.dedup import write_reps_index
    from pleiades_spark.plans.streaming_batch import _staged_src

    docs = _incr_docs(spark, sf_dir)
    return _staged_src(
        sf_dir,
        f"reps_idx_p{INCR_PCT}_t{JACCARD_THRESHOLD}"
        f"_b{LSH_BANDS}x{LSH_ROWS}s3h1",
        lambda tmp: write_reps_index(
            docs.filter(~F.col("is_new")).drop("is_new"),
            tmp,
            JACCARD_THRESHOLD,
        ),
    )


def q_doc_dedup_reps_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION nightly path (round 12): last night's star index —
    band-bucket mins, verified edges, rep hsets, doc ids — persisted as
    parquet (operators/dedup.write_reps_index), tonight's run staging
    ONLY the new slice against it (doc_dedup_reps_from_index). Output is
    provably identical to the in-gate two-phase recompute
    (tests/test_ann_recall.py equivalence test), so this gate shares
    ORACLE_DOC_DEDUP_REPS_INCR verbatim — what it adds over
    doc_dedup_reps_incr is end-to-end coverage of the parquet
    round-trip, i.e. the artifact a real nightly actually reads.

    The index bootstrap is cached per fixture identity via the shared
    staging helper (same /tmp-reuse + atomic-publish discipline as the
    streaming gates), so benchmark reps measure the INCREMENT — the
    nightly economics — not a nightly plus a rebuild."""
    from pleiades_spark.operators.dedup import doc_dedup_reps_from_index

    docs = _incr_docs(spark, sf_dir)
    idx = staged_doc_reps_index(spark, sf_dir)
    return doc_dedup_reps_from_index(
        docs.filter(F.col("is_new")).drop("is_new"), idx, JACCARD_THRESHOLD
    )


# --- incremental near-dedup (nightly-increment economics) -------------------
# (INCR_PCT defined above q_doc_dedup_reps_incr — shared by both
# incremental gates)


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs touching at least one NEW doc (a deterministic 20%
    hash slice stands in for tonight's crawl increment). Old×old pairs —
    found by previous runs — are excluded inside candidate generation,
    so per-run cost tracks the increment, not the whole corpus."""
    from pleiades_spark.functions.hashing import h32

    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_new",
        h32(F.concat(F.lit("incr:"), F.col("doc_id").cast("string"))) % 100
        < INCR_PCT,
    )
    return minhash_lsh_pairs(docs, JACCARD_THRESHOLD, new_col="is_new")


ORACLE_DEDUP_INCREMENTAL = f"""
WITH sh AS (
  SELECT doc_id,
         {h32_sql("concat('incr:', CAST(doc_id AS VARCHAR))")} % 100 < {INCR_PCT}
           AS is_new,
         {word_shingles_sql('text')} AS sh
  FROM documents
), hashed AS (
  SELECT doc_id, is_new, sh, list_transform(sh, s -> {h32_sql('s')}) AS hs FROM sh
), sig AS (
  SELECT doc_id, is_new, {_SIG_SQL} AS sig FROM hashed
), bands AS (
  SELECT doc_id, is_new, band_idx,
         array_to_string(sig[band_idx*{LSH_ROWS}+1 : band_idx*{LSH_ROWS}+{LSH_ROWS}], '-') AS band_key
  FROM sig, {_BANDS_RANGE_SQL}
), cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id AND (l.is_new OR r.is_new)
), verified AS (
  SELECT doc_a, doc_b,
         round(len(list_intersect(a.sh, b.sh)) * 1.0
               / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
  FROM cand JOIN sh a ON a.doc_id = cand.doc_a JOIN sh b ON b.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
"""


# --- product quantization ----------------------------------------------------


def q_pq_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codes + quantization error per vector (operators/similarity.py
    pq_codes): 64 floats → 4 sub-centroid ids."""
    from pleiades_spark.operators.similarity import pq_codes

    return pq_codes(_t(spark, sf_dir, "embeddings"))


def q_pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k over PQ codes: full-precision query vs coded corpus
    via per-query (m×k) distance lookup tables."""
    from pleiades_spark.operators.similarity import pq_adc_knn

    return pq_adc_knn(_t(spark, sf_dir, "embeddings"))


ORACLE_PQ_ADC_KNN = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         len(embedding) // 4 AS sl
  FROM embeddings
), subs AS (
  SELECT vec_id, m, v[m * sl + 1 : (m + 1) * sl] AS subv, sl
  FROM v, (SELECT unnest(range(0, 4)) AS m)
), cb AS (
  SELECT m, vec_id AS cid, subv AS cv FROM subs WHERE vec_id < 8
), scored AS (
  SELECT s.vec_id, s.m, c.cid,
         round(list_sum(list_transform(range(1, s.sl + 1),
               i -> (s.subv[i] - c.cv[i]) * (s.subv[i] - c.cv[i]))), 6) AS d
  FROM subs s JOIN cb c ON s.m = c.m
), codes AS (
  SELECT vec_id, m, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m
              ORDER BY d ASC, cid ASC) AS rk
    FROM scored
  ) WHERE rk = 1
), lut AS (
  SELECT s.vec_id AS query_id, s.m, c.cid,
         round(list_sum(list_transform(range(1, s.sl + 1),
               i -> (s.subv[i] - c.cv[i]) * (s.subv[i] - c.cv[i]))), 6) AS d
  FROM subs s JOIN cb c ON s.m = c.m
  WHERE s.vec_id < 5
), adc AS (
  SELECT l.query_id, co.vec_id, round(sum(l.d), 6) AS adc_d
  FROM codes co JOIN lut l ON co.m = l.m AND co.cid = l.cid
  WHERE co.vec_id <> l.query_id
  GROUP BY l.query_id, co.vec_id
)
SELECT query_id, rank, vec_id, adc_d FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adc_d ASC, vec_id ASC) AS rank
  FROM adc
) WHERE rank <= 8
"""


ORACLE_PQ_QUANTIZATION = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         len(embedding) // 4 AS sl
  FROM embeddings
), subs AS (
  SELECT vec_id, m, v[m * sl + 1 : (m + 1) * sl] AS subv, sl
  FROM v, (SELECT unnest(range(0, 4)) AS m)
), cb AS (
  SELECT m, vec_id AS cid, subv AS cv FROM subs WHERE vec_id < 8
), scored AS (
  SELECT s.vec_id, s.m, c.cid,
         round(list_sum(list_transform(range(1, s.sl + 1),
               i -> (s.subv[i] - c.cv[i]) * (s.subv[i] - c.cv[i]))), 6) AS d
  FROM subs s JOIN cb c ON s.m = c.m
), best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m
              ORDER BY d ASC, cid ASC) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT vec_id,
       max(CASE WHEN m = 0 THEN cid END) AS c0,
       max(CASE WHEN m = 1 THEN cid END) AS c1,
       max(CASE WHEN m = 2 THEN cid END) AS c2,
       max(CASE WHEN m = 3 THEN cid END) AS c3,
       round(sum(d), 6) AS qerr
FROM best GROUP BY vec_id
"""


# --- simhash --------------------------------------------------------------

MAX_HAMMING = 3

def _simhash_sql(arr: str, n: str) -> str:
    """Majority-vote 32-bit SimHash over a hash-array SQL expression —
    ``n`` is the distinct-token count (NOT len(arr): the Spark fold's
    tie rule compares against the token count)."""
    return "CAST(" + " + ".join(
        f"(CASE WHEN 2 * list_sum(list_transform({arr}, x -> (x >> {k}) & 1)) > {n} "
        f"THEN {2**k} ELSE 0 END)"
        for k in range(SIMHASH_BITS)
    ) + " AS BIGINT)"


_SIMHASH_SQL = _simhash_sql("hs", "len(hs)")


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = simhash_pairs(_t(spark, sf_dir, "documents"), MAX_HAMMING)
    return out.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


ORACLE_DEDUP_SIMHASH = f"""
WITH t AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
), h AS (
  SELECT doc_id, list_transform(toks, tk -> {h32_sql('tk')}) AS hs FROM t
), s AS (
  SELECT doc_id, {_SIMHASH_SQL} AS sig FROM h
), chunks AS (
  SELECT doc_id, sig, chunk_idx, (sig >> (8 * chunk_idx)) & 255 AS chunk_val
  FROM s, (SELECT unnest(range(0, 4)) AS chunk_idx)
), pairs AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         CAST(bit_count(xor(l.sig, r.sig)) AS INT) AS hamming
  FROM chunks l JOIN chunks r
    ON l.chunk_idx = r.chunk_idx AND l.chunk_val = r.chunk_val AND l.doc_id < r.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= {MAX_HAMMING}
"""


MAX_HAMMING_WIDE = 6  # now out of 128 bits (~95% agreement) — within the
#                       1-bit-multi-probe provable-recall bound of 7


# the 128-bit signature: four independently salted 32-bit SimHash halves
def _simhash128_sig_sql() -> str:
    hashed = ",\n".join(
        "         list_transform(toks, tk -> "
        + h32_sql(f"concat('w{i}:', tk)")
        + f") AS a{i}"
        for i in range(4)
    )
    halves = ",\n         ".join(
        _simhash_sql(f"a{i}", f"len(a{i})") + f" AS h{i}" for i in range(4)
    )
    return (
        "WITH t AS (\n"
        "  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks"
        " FROM documents\n), h AS (\n  SELECT doc_id,\n"
        f"{hashed}\n  FROM t\n), s AS (\n  SELECT doc_id, {halves}\n  FROM h\n)"
    )


_SIMHASH128_SIG_SQL = _simhash128_sig_sql()

_HAMMING128_SQL = " + ".join(
    f"bit_count(xor(l.h{i}, r.h{i}))" for i in range(4)
)


def q_dedup_simhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-bit SimHash with 32-bit chunk blocking (round-9 knob) — the
    corpus-scale twin of dedup_simhash. The 64-bit/16-bit-chunk form
    (operators/dedup.simhash_pairs_wide, the round-8 gate) has n²/16k
    candidate volume — 10.2× at sf10, the next decade's >20× cell; the
    32-bit chunks keep buckets ~singleton until ~4B docs, so candidates
    track true near-dups, not birthday collisions."""
    from pleiades_spark.operators.dedup import simhash_pairs_wide128

    out = simhash_pairs_wide128(_t(spark, sf_dir, "documents"), MAX_HAMMING_WIDE)
    return out.select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


ORACLE_DEDUP_SIMHASH_WIDE = f"""
{_SIMHASH128_SIG_SQL}, chunks AS (
  SELECT doc_id, h0, h1, h2, h3, chunk_idx,
         CASE chunk_idx WHEN 0 THEN h0 WHEN 1 THEN h1
                        WHEN 2 THEN h2 ELSE h3 END AS chunk_val
  FROM s, (SELECT unnest(range(0, 4)) AS chunk_idx)
), pairs AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         CAST({_HAMMING128_SQL} AS INT) AS hamming
  FROM chunks l JOIN chunks r
    ON l.chunk_idx = r.chunk_idx AND l.chunk_val = r.chunk_val
   AND l.doc_id < r.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= {MAX_HAMMING_WIDE}
"""


def q_dedup_simhash_wide_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-recall 128-bit SimHash: 1-bit-flip multi-probe blocking
    (operators/dedup.simhash_wide128_pairs_from_sigs exact_recall=True)
    — recall provably 1 for Hamming ≤ 6 with 4×32-bit chunks
    (pigeonhole: ≤7 flips leave some chunk with ≤1 error, covered by the
    33 probe variants). The oracle is BRUTE FORCE over all doc pairs —
    no blocking replication — so the hash gate PROVES the recall-1 claim
    on real signatures, unlike dedup_simhash_wide whose oracle mirrors
    the blocking and its documented Hamming-4-6 misses."""
    from pleiades_spark.operators.dedup import simhash_pairs_wide128

    out = simhash_pairs_wide128(
        _t(spark, sf_dir, "documents"), MAX_HAMMING_WIDE, exact_recall=True
    )
    return out.select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


def q_blocking_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-occupancy audit of the SimHash blocking index — the
    skew_report analog for dedup blocking (round-9 addition; the alarm
    the 16-bit-chunk candidate cliff needed BEFORE it showed up as a
    10× bench cell). Per chunk index: bucket count, colliding-bucket
    count, max occupancy, and the EXACT candidate-pair volume the
    blocking self-join will generate (Σ C(bucket,2)) — one aggregation
    over the signature projection, no join. A production run gates the
    pair join on candidate_pairs staying within budget; when buckets
    crowd (n approaching bucket-space size), this is the number that
    blows up first, quadratically.

    avg_bucket is floor-quantized to 4 decimals (CLAUDE.md .xxxx5
    invariant); candidate_pairs uses shiftright for the /2 (integer op
    on both engines, no double round-trip)."""
    from pleiades_spark.operators.dedup import simhash128_signature

    return _blocking_audit_frame(
        simhash128_signature(_t(spark, sf_dir, "documents"))
    )


def _blocking_audit_frame(sigs: DataFrame) -> DataFrame:
    chunks = sigs.select(
        F.posexplode(
            F.array(F.col("h0"), F.col("h1"), F.col("h2"), F.col("h3"))
        ).alias("chunk_idx", "chunk_val")
    )
    buckets = chunks.groupBy("chunk_idx", "chunk_val").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return buckets.groupBy("chunk_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum((F.col("cnt") >= 2).cast("int")).cast("bigint").alias("n_colliding"),
        F.max("cnt").cast("bigint").alias("max_bucket"),
        (F.floor(F.avg("cnt") * 10000 + F.lit(0.5)) / 10000).alias("avg_bucket"),
        F.sum(
            F.shiftright(F.col("cnt") * (F.col("cnt") - F.lit(1)), 1)
        ).cast("bigint").alias("candidate_pairs"),
    )


def q_blocking_audit_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit PRODUCTION would run (round-10, verdict r9 #7): same
    bucket-occupancy aggregation as blocking_audit, but over the
    xxhash64-based signature (dedup.simhash128_signature_prod) instead
    of the md5-derived oracle-replayable one — the md5 projection was
    201 s of the round-9 sf100 audit cell, a price only the GATE needs
    to pay. Rows-only gate: DuckDB cannot replay xxhash64, and the
    audit's values are hash-family-dependent by construction; the
    hash-gated blocking_audit pins the aggregation logic itself."""
    from pleiades_spark.operators.dedup import simhash128_signature_prod

    return _blocking_audit_frame(
        simhash128_signature_prod(_t(spark, sf_dir, "documents"))
    ).orderBy("chunk_idx")


ORACLE_BLOCKING_AUDIT = f"""
{_SIMHASH128_SIG_SQL}, chunks AS (
  SELECT chunk_idx,
         CASE chunk_idx WHEN 0 THEN h0 WHEN 1 THEN h1
                        WHEN 2 THEN h2 ELSE h3 END AS chunk_val
  FROM s, (SELECT unnest(range(0, 4)) AS chunk_idx)
), buckets AS (
  SELECT chunk_idx, chunk_val, count(*) AS cnt
  FROM chunks GROUP BY chunk_idx, chunk_val
)
SELECT chunk_idx,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_colliding,
       CAST(max(cnt) AS BIGINT) AS max_bucket,
       floor(avg(cnt) * 10000 + 0.5) / 10000 AS avg_bucket,
       CAST(sum((cnt * (cnt - 1)) // 2) AS BIGINT) AS candidate_pairs
FROM buckets GROUP BY chunk_idx
"""


# Brute-force pair join (O(n²) in the ORACLE only — DuckDB at gate SF's
# 500 docs = 125k signature pairs, trivial): deliberately does NOT
# replicate the probe blocking, which is exactly what makes the gate a
# recall proof rather than a consistency check.
ORACLE_DEDUP_SIMHASH_WIDE_EXACT = f"""
{_SIMHASH128_SIG_SQL}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST({_HAMMING128_SQL.replace('l.', 'a.').replace('r.', 'b.')} AS INT)
         AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE {_HAMMING128_SQL.replace('l.', 'a.').replace('r.', 'b.')}
      <= {MAX_HAMMING_WIDE}
"""


# --- exact n-gram jaccard (ground truth for the LSH recall) ----------------


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), JACCARD_THRESHOLD)


ORACLE_DEDUP_NGRAM_JACCARD = f"""
WITH sh AS (
  SELECT doc_id, n_chars, {word_shingles_sql('text')} AS sh FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(len(list_intersect(a.sh, b.sh)) * 1.0
               / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
  FROM sh a JOIN sh b
    ON a.doc_id < b.doc_id
   AND abs(a.n_chars - b.n_chars) <= 0.2 * greatest(a.n_chars, b.n_chars)
)
SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= {JACCARD_THRESHOLD}
"""


# --- dedup clusters: iterative connected components -------------------------


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS → CLUSTERS via iterative min-label propagation
    (operators/graph.py): each doc in a near-dup component mapped to the
    component's min doc_id (the canonical keeper). The oracle replays the
    same reachability with a recursive CTE — full hash-match for an
    iterative algorithm."""
    from pleiades_spark.operators.graph import connected_components

    pairs = minhash_lsh_pairs(_t(spark, sf_dir, "documents"), JACCARD_THRESHOLD)
    return connected_components(pairs.select("doc_a", "doc_b"))


def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clusters via large-star/small-star contraction
    (operators/graph.connected_components_star) — the O(log² n)-round
    algorithm for components whose DIAMETER exceeds min-label's round
    budget (a million-node chain at 100 TB). Shares
    ORACLE_DEDUP_CLUSTERS verbatim: both algorithms must produce
    byte-identical (doc_id, cluster) rows, and the hash gate proves it
    on real near-dup components."""
    from pleiades_spark.operators.graph import connected_components_star

    pairs = minhash_lsh_pairs(_t(spark, sf_dir, "documents"), JACCARD_THRESHOLD)
    return connected_components_star(pairs.select("doc_a", "doc_b"))


# reuse the minhash pair pipeline, then a recursive reachability closure
ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, {word_shingles_sql('text')} AS sh FROM documents
), hashed AS (
  SELECT doc_id, sh, list_transform(sh, s -> {h32_sql('s')}) AS hs FROM sh
), sig AS (
  SELECT doc_id, {_SIG_SQL} AS sig FROM hashed
), bands AS (
  SELECT doc_id, band_idx,
         array_to_string(sig[band_idx*{LSH_ROWS}+1 : band_idx*{LSH_ROWS}+{LSH_ROWS}], '-') AS band_key
  FROM sig, {_BANDS_RANGE_SQL}
), cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key AND l.doc_id < r.doc_id
), pairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           round(len(list_intersect(a.sh, b.sh)) * 1.0
                 / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
    FROM cand JOIN sh a ON a.doc_id = cand.doc_a JOIN sh b ON b.doc_id = cand.doc_b
  ) WHERE jaccard >= {JACCARD_THRESHOLD}
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach(node, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node
)
SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster
FROM reach GROUP BY node
"""


# --- keep-best representative dedup ----------------------------------------


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters keep their highest-QUALITY member, not the min-id
    one — the selection rule real corpus builds use (RefinedWeb/FineWeb
    keep the longest/best copy; min-id is only canonical, not optimal).

    Composition of three prior operators, one declarative DAG: LSH pairs →
    connected components → join the per-doc quality score → per-cluster
    argmax (quality DESC, doc_id ASC tiebreak for determinism). The only
    new work over dedup_clusters is a broadcast-size join with the quality
    map stage and a partitioned row_number — no extra all-pairs anything.
    """
    from pleiades_spark.operators.graph import connected_components

    pairs = minhash_lsh_pairs(_t(spark, sf_dir, "documents"), JACCARD_THRESHOLD)
    cc = connected_components(pairs.select("doc_a", "doc_b"))
    quality = q_text_quality(spark, sf_dir).select("doc_id", "quality")
    return _keep_best(cc, quality)


def _keep_best(cc: DataFrame, quality: DataFrame) -> DataFrame:
    """Per-cluster argmax over a (doc_id, cluster) grain — shared by the
    pair-CC and reps-grain keep-best plans. quality DESC, doc_id ASC
    tiebreak for determinism."""
    joined = cc.join(quality, "doc_id")
    w = W.partitionBy("cluster").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    sizes = cc.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .join(sizes, "cluster")
        .select(
            "cluster",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("quality").alias("kept_quality"),
            "n_members",
        )
    )


def q_dedup_keep_best_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best over the LINEAR reps grain (round 11): doc_dedup_reps'
    (doc_id, rep_id) already carries one decision per document —
    singletons included — so this emits the full deduplicated KEEP-LIST
    (one kept doc per cluster, n_clusters rows), not just the clusters
    that happened to surface as pairs. At 100 TB this is the corpus
    build's actual deliverable, and the upstream stays linear where the
    pair-grain twin pays Θ(Σ mult²) before it even reaches the argmax."""
    from pleiades_spark.operators.dedup import doc_dedup_reps

    reps = doc_dedup_reps(_t(spark, sf_dir, "documents"), JACCARD_THRESHOLD)
    cc = reps.select("doc_id", F.col("rep_id").alias("cluster"))
    quality = q_text_quality(spark, sf_dir).select("doc_id", "quality")
    return _keep_best(cc, quality)


# --- embedding cosine near-dup --------------------------------------------

COSINE_DUP_THRESHOLD = 0.45

_COS_SQL = (
    "round(list_inner_product(a.v, b.v) / "
    "(sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6)"
)


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), COSINE_DUP_THRESHOLD
    )


ORACLE_DEDUP_EMBEDDING = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT vec_a, vec_b, cos FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_COS_SQL} AS cos
  FROM v a JOIN v b ON a.vec_id < b.vec_id
) WHERE cos >= {COSINE_DUP_THRESHOLD}
"""


# =========================== similarity search ============================

KNN_QUERIES = 5
KNN_K = 8
IVF_CENTROIDS = 16
IVF_K = 5


def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn_brute(_t(spark, sf_dir, "embeddings"), KNN_QUERIES, KNN_K)


_QCOS_SQL = (
    "round(list_inner_product(q.qv, v.v) / "
    "(sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(v.v, v.v))), 6)"
)

ORACLE_KNN_BRUTE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < {KNN_QUERIES}),
scored AS (
  SELECT query_id, vec_id, {_QCOS_SQL} AS cos
  FROM v JOIN q ON vec_id <> query_id
)
SELECT query_id, rank, vec_id, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {KNN_K}
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training data prep: top-3 nearest DIFFERENT-label
    vectors per query (operators/similarity.hard_negatives)."""
    from pleiades_spark.operators.similarity import hard_negatives

    return hard_negatives(_t(spark, sf_dir, "embeddings"), KNN_QUERIES, 3)


ORACLE_HARD_NEGATIVES = f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv
      FROM v WHERE vec_id < {KNN_QUERIES}),
scored AS (
  SELECT query_id, query_label, vec_id, label, {_QCOS_SQL} AS cos
  FROM v JOIN q ON label <> query_label
)
SELECT query_id, query_label, rank, vec_id, label, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified top-k per query (operators/similarity.mmr_rerank):
    greedy λ·relevance − (1−λ)·max-sim-to-selected over the brute top-12
    candidates — the post-ANN diversification step. Oracle unrolls the
    k-step greedy selection as chained CTEs; every pick and score
    replays bit-for-bit (round-6 sims, binary-exact λ=0.5,
    floor-quantized scores)."""
    from pleiades_spark.operators.similarity import mmr_rerank

    return mmr_rerank(_t(spark, sf_dir, "embeddings"), KNN_QUERIES)


def _mmr_oracle(n_queries: int = KNN_QUERIES, n_cand: int = 12, k: int = 5) -> str:
    pair_cos = (
        "round(list_inner_product(a.vv, b.vv) / "
        "(sqrt(list_inner_product(a.vv, a.vv)) * "
        "sqrt(list_inner_product(b.vv, b.vv))), 6)"
    )
    parts = [f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < {n_queries}),
scored AS (
  SELECT query_id, vec_id, {_QCOS_SQL} AS rel, v.v AS vv
  FROM v JOIN q ON vec_id <> query_id
),
cand AS (
  SELECT query_id, vec_id, rel, vv FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY rel DESC, vec_id ASC) AS rn
    FROM scored) WHERE rn <= {n_cand}
),
sims AS (
  SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb, {pair_cos} AS s
  FROM cand a JOIN cand b
    ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
),
acc1 AS (
  SELECT query_id, 1 AS sel_rank, vec_id, rel AS score FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY rel DESC, vec_id ASC) AS rn
    FROM cand) WHERE rn = 1
)"""]
    for i in range(2, k + 1):
        parts.append(f""",
pen{i} AS (
  SELECT s.query_id, s.va, max(s.s) AS maxsim
  FROM sims s JOIN acc{i - 1} p
    ON s.query_id = p.query_id AND s.vb = p.vec_id
  GROUP BY s.query_id, s.va
),
sel{i} AS (
  SELECT query_id, {i} AS sel_rank, vec_id,
         floor(mmr * 1000000 + 0.5) / 1000000 AS score FROM (
    SELECT c.query_id, c.vec_id,
           0.5 * c.rel - 0.5 * p.maxsim AS mmr,
           row_number() OVER (PARTITION BY c.query_id
             ORDER BY (0.5 * c.rel - 0.5 * p.maxsim) DESC,
                      c.vec_id ASC) AS rn
    FROM cand c
    JOIN pen{i} p ON p.query_id = c.query_id AND p.va = c.vec_id
    LEFT JOIN acc{i - 1} x
      ON x.query_id = c.query_id AND x.vec_id = c.vec_id
    WHERE x.vec_id IS NULL) WHERE rn = 1
),
acc{i} AS (SELECT * FROM acc{i - 1} UNION ALL SELECT * FROM sel{i})""")
    parts.append(f"""
SELECT query_id, sel_rank, vec_id, score FROM acc{k}""")
    return "".join(parts)


ORACLE_MMR_RERANK = _mmr_oracle()


def q_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_knn(_t(spark, sf_dir, "embeddings"), KNN_QUERIES, IVF_K, IVF_CENTROIDS)


_CCOS_SQL = (
    "round(list_inner_product(v.v, c.cv) / "
    "(sqrt(list_inner_product(v.v, v.v)) * sqrt(list_inner_product(c.cv, c.cv))), 6)"
)

ORACLE_IVF_KNN = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM v WHERE vec_id < {IVF_CENTROIDS}),
assigned AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT v.vec_id, v.v, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {_CCOS_SQL} DESC, c.centroid_id ASC) AS rk
    FROM v CROSS JOIN c
  ) WHERE rk = 1
),
q AS (SELECT vec_id AS query_id, v AS qv, centroid_id AS qc
      FROM assigned WHERE vec_id < {KNN_QUERIES}),
scored AS (
  SELECT q.query_id, a.vec_id,
         round(list_inner_product(q.qv, a.v) /
               (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(a.v, a.v))), 6) AS cos
  FROM assigned a JOIN q ON a.centroid_id = q.qc AND a.vec_id <> q.query_id
)
SELECT query_id, rank, vec_id, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {IVF_K}
"""


# --- deterministic Lloyd's k-means (hash-gated codebook FIT) ---------------


def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means fit, gate-checked END TO END
    (operators/similarity.kmeans_fit_deterministic): first-k init,
    round-6 argmax-cosine assignment, integer-micro-unit exact centroid
    means, empty cells hold their previous centroid. The oracle unrolls
    all three iterations as chained CTEs and replays every centroid
    coordinate and the final member census bit-for-bit — demonstrating
    that a FITTED codebook is hash-gatable whenever the fit itself is
    deterministic (the randomized MLlib kmeans|| path, fit_ivf_codebook,
    stays recall-audited: its seeds are engine-internal by nature)."""
    from pleiades_spark.operators.similarity import kmeans_fit_deterministic

    out = kmeans_fit_deterministic(_t(spark, sf_dir, "embeddings"))
    return out.select(
        "centroid_id", F.col("pos").cast("int").alias("pos"), "val",
        "n_members",
    )


def _kmeans_oracle(k: int = 8, iters: int = 3) -> str:
    assign = """
a{i} AS (
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {ccos} DESC, c.centroid_id ASC) AS rk
    FROM v CROSS JOIN (SELECT cid AS centroid_id, cv FROM c{p}) c
  ) WHERE rk = 1
)"""
    # mean as exact integer micro-units: sum(BIGINT) is order-independent
    # (double summation is not); floor(s/n + 0.5) re-quantizes to one
    # micro integer before the single /1e6 — identical textual op order
    # to the Spark side (operators/similarity.kmeans_fit_deterministic)
    update = """
u{i} AS (
  SELECT a.centroid_id AS cid, d.pos,
         floor(CAST(sum(CAST(floor(d.x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
               / count(*) + 0.5) / 1000000.0 AS val
  FROM a{i} a JOIN d ON d.vec_id = a.vec_id
  GROUP BY a.centroid_id, d.pos
),
c{i} AS (
  SELECT p.cid, coalesce(l.cv, p.cv) AS cv
  FROM c{p} p LEFT JOIN (
    SELECT cid, list(val ORDER BY pos) AS cv FROM u{i} GROUP BY cid
  ) l USING (cid)
)"""
    ccos = (
        "round(list_inner_product(v.v, c.cv) / "
        "(sqrt(list_inner_product(v.v, v.v)) * "
        "sqrt(list_inner_product(c.cv, c.cv))), 6)"
    )
    parts = [f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
d AS (SELECT vec_id, CAST(unnest(range(0, len(v))) AS INT) AS pos,
             unnest(v) AS x FROM v),
c0 AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id < {k})"""]
    for i in range(1, iters + 1):
        parts.append("," + assign.format(i=i, p=i - 1, ccos=ccos))
        parts.append("," + update.format(i=i, p=i - 1))
    parts.append(f""",
afinal AS (
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {ccos} DESC, c.centroid_id ASC) AS rk
    FROM v CROSS JOIN (SELECT cid AS centroid_id, cv FROM c{iters}) c
  ) WHERE rk = 1
),
census AS (SELECT centroid_id, count(*) AS n_members FROM afinal GROUP BY 1),
exploded AS (
  SELECT cid, CAST(unnest(range(0, len(cv))) AS INT) AS pos,
         unnest(cv) AS val
  FROM c{iters}
)
SELECT e.cid AS centroid_id, e.pos, e.val,
       coalesce(n.n_members, 0) AS n_members
FROM exploded e LEFT JOIN census n ON n.centroid_id = e.cid""")
    return "".join(parts)


ORACLE_KMEANS_LLOYD = _kmeans_oracle()


# --- IVFADC: coarse quantizer + PQ-coded ADC scan -------------------------


def q_ivf_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS-IndexIVFPQ-shaped search: probe the query's IVF bucket,
    rank its candidates by ADC over their PQ codes
    (operators/similarity.ivf_adc_knn). The oracle composes the
    ORACLE_IVF_KNN bucket restriction with ORACLE_PQ_ADC_KNN's
    code/LUT pipeline — both approximations replayed bit-for-bit."""
    from pleiades_spark.operators.similarity import ivf_adc_knn

    return ivf_adc_knn(_t(spark, sf_dir, "embeddings"), KNN_QUERIES, KNN_K)


ORACLE_IVF_ADC_KNN = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         len(embedding) // 4 AS sl
  FROM embeddings
), c AS (SELECT vec_id AS centroid_id, v AS cv FROM v WHERE vec_id < {IVF_CENTROIDS}),
assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {_CCOS_SQL} DESC, c.centroid_id ASC) AS rk
    FROM v CROSS JOIN c
  ) WHERE rk = 1
),
cand AS (
  SELECT q.vec_id AS query_id, a.vec_id
  FROM assigned q JOIN assigned a
    ON a.centroid_id = q.centroid_id AND a.vec_id <> q.vec_id
  WHERE q.vec_id < {KNN_QUERIES}
),
subs AS (
  SELECT vec_id, m, v[m * sl + 1 : (m + 1) * sl] AS subv, sl
  FROM v, (SELECT unnest(range(0, 4)) AS m)
), cb AS (
  SELECT m, vec_id AS cid, subv AS cv FROM subs WHERE vec_id < 8
), scored AS (
  SELECT s.vec_id, s.m, c.cid,
         round(list_sum(list_transform(range(1, s.sl + 1),
               i -> (s.subv[i] - c.cv[i]) * (s.subv[i] - c.cv[i]))), 6) AS d
  FROM subs s JOIN cb c ON s.m = c.m
), codes AS (
  SELECT vec_id, m, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m
              ORDER BY d ASC, cid ASC) AS rk
    FROM scored
  ) WHERE rk = 1
), lut AS (
  SELECT s.vec_id AS query_id, s.m, c.cid,
         round(list_sum(list_transform(range(1, s.sl + 1),
               i -> (s.subv[i] - c.cv[i]) * (s.subv[i] - c.cv[i]))), 6) AS d
  FROM subs s JOIN cb c ON s.m = c.m
  WHERE s.vec_id < {KNN_QUERIES}
), adc AS (
  SELECT cand.query_id, cand.vec_id, round(sum(l.d), 6) AS adc_d
  FROM cand JOIN codes co ON co.vec_id = cand.vec_id
  JOIN lut l ON l.query_id = cand.query_id AND l.m = co.m AND l.cid = co.cid
  GROUP BY cand.query_id, cand.vec_id
)
SELECT query_id, rank, vec_id, adc_d FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adc_d ASC, vec_id ASC) AS rank
  FROM adc
) WHERE rank <= {KNN_K}
"""


# --- label-centroid classification (embedding analytics) ------------------


def q_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-label-centroid classification confusion matrix.

    Everything runs in LONG form — (vec_id, pos, x) rows — so no
    array-typed output and every step is a plain join/agg: per-label
    element-wise centroid means, vector/centroid norms, dot products via
    a join on the dimension index, argmax by rounded cosine
    (deterministic ties → lowest label). The centroid table is
    (labels × dims) rows — broadcast at any corpus size; the wide work
    shuffles once on vec_id.
    """
    from pleiades_spark.functions.vectors import as_double

    emb = _t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(as_double(F.col("embedding"))).alias("pos", "x"),
    )
    cent = dims.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.avg("x").alias("c")
    )
    vnorm = dims.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nv"))
    cnorm = cent.groupBy("clabel").agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nc"))
    dots = (
        dims.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum(F.col("x") * F.col("c")).alias("dot"))
    )
    scored = (
        dots.join(vnorm, "vec_id")
        .join(F.broadcast(cnorm), "clabel")
        .withColumn("cos", F.round(F.col("dot") / (F.col("nv") * F.col("nc")), 6))
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("clabel").asc())
    pred = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "label", "clabel")
    )
    return pred.groupBy("label", F.col("clabel").alias("pred_label")).agg(
        F.count(F.lit(1)).alias("n")
    )


ORACLE_CENTROID_CONFUSION = """
WITH dims AS (
  SELECT vec_id, label,
         unnest(range(0, len(embedding))) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), cent AS (
  SELECT label AS clabel, pos, avg(x) AS c FROM dims GROUP BY label, pos
), vnorm AS (
  SELECT vec_id, sqrt(sum(x * x)) AS nv FROM dims GROUP BY vec_id
), cnorm AS (
  SELECT clabel, sqrt(sum(c * c)) AS nc FROM cent GROUP BY clabel
), dots AS (
  SELECT d.vec_id, d.label, c.clabel, sum(d.x * c.c) AS dot
  FROM dims d JOIN cent c ON d.pos = c.pos
  GROUP BY d.vec_id, d.label, c.clabel
), scored AS (
  SELECT dots.vec_id, label, dots.clabel,
         round(dot / (nv * nc), 6) AS cos
  FROM dots JOIN vnorm ON dots.vec_id = vnorm.vec_id
            JOIN cnorm ON dots.clabel = cnorm.clabel
), pred AS (
  SELECT vec_id, label, clabel FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, clabel ASC) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT label, clabel AS pred_label, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY label, clabel
"""


# --- IVF-bucketed embedding near-dup (the 100 TB dedup path) --------------


def q_dedup_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # n_centroids auto-derives (operators/dedup.py): K=16 through the
    # documented <=1k-vector gate range — the region the frozen oracle's
    # identical CASE rule below replays — then K = max(16, n//64) so
    # buckets stay ~64 vectors and total work is linear (fixed K=16
    # measured 73s at sf1's 20k vectors; adaptive ~7s).
    return embedding_near_dup_ivf(
        _t(spark, sf_dir, "embeddings"), COSINE_DUP_THRESHOLD
    )


# K replays the Spark-side two-region rule from count(*): both engines
# see the same table, so the codebooks agree at any fixture size.
# K = isqrt(n) above the frozen gate region (round-6 fix; was n//64):
# assignment costs n·K·d and in-bucket verify n²·d/K, so K = √n balances
# both at Θ(n^1.5·d) — K = n/64 made ASSIGNMENT quadratic (measured
# 320 s at sf10's 200k vectors vs 8 s at sf1). See
# operators/dedup.embedding_near_dup_ivf.
_IVF_K_SQL = (
    "(SELECT CASE WHEN count(*) <= 1024 THEN 16"
    " ELSE greatest(16, CAST(floor(sqrt(count(*))) AS BIGINT)) END"
    " FROM embeddings)"
)

ORACLE_DEDUP_EMBEDDING_IVF = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM v WHERE vec_id < {_IVF_K_SQL}),
assigned AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT v.vec_id, v.v, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {_CCOS_SQL} DESC, c.centroid_id ASC) AS rk
    FROM v CROSS JOIN c
  ) WHERE rk = 1
)
SELECT vec_a, vec_b, cos FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_COS_SQL} AS cos
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
) WHERE cos >= {COSINE_DUP_THRESHOLD}
"""


# --- two-level (coarse-quantizer) IVF embedding near-dup ------------------


def q_dedup_embedding_ivf2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-n^1.5 IVF dedup: a coarse quantizer (K1 = ⌊n^(1/3)⌋ cells)
    in front of K = ⌊n^(2/3)⌋ fine centroids — K1 + K/K1 cosines per
    vector instead of K, total Θ(n^(4/3)·d)
    (operators/dedup.embedding_near_dup_ivf2)."""
    return embedding_near_dup_ivf2(
        _t(spark, sf_dir, "embeddings"), COSINE_DUP_THRESHOLD
    )


# K/K1 replay the Spark-side rule from count(*): frozen K=16/K1=4 through
# the ≤1k gate region, else K = t², K1 = t with t = icbrt(n) — the float
# cbrt estimate is corrected to the exact integer cube root by the two
# CASE adjustments, so libm differences between engines cancel
# (operators/dedup._icbrt is the Python twin).
_IVF2_PRM_SQL = (
    "(SELECT CASE WHEN n <= 1024 THEN 16 ELSE greatest(16, t * t) END"
    " FROM (SELECT n, CASE WHEN (t0+1)*(t0+1)*(t0+1) <= n THEN t0 + 1"
    "              WHEN t0*t0*t0 > n THEN t0 - 1 ELSE t0 END AS t"
    "       FROM (SELECT count(*) AS n,"
    "                    CAST(round(cbrt(CAST(count(*) AS DOUBLE)))"
    "                         AS BIGINT) AS t0"
    "             FROM embeddings)))"
)

_IVF2_K1_SQL = (
    "(SELECT CASE WHEN n <= 1024 THEN 4 ELSE greatest(4, t) END"
    " FROM (SELECT n, CASE WHEN (t0+1)*(t0+1)*(t0+1) <= n THEN t0 + 1"
    "              WHEN t0*t0*t0 > n THEN t0 - 1 ELSE t0 END AS t"
    "       FROM (SELECT count(*) AS n,"
    "                    CAST(round(cbrt(CAST(count(*) AS DOUBLE)))"
    "                         AS BIGINT) AS t0"
    "             FROM embeddings)))"
)

# cosine between a fine centroid (c.cv) and a coarse centroid (g.gv) —
# same op order as _assign_nearest's fold (norms as sqrt(ip), round 6).
_GCOS_C_SQL = (
    "round(list_inner_product(c.cv, g.gv) / "
    "(sqrt(list_inner_product(c.cv, c.cv)) * sqrt(list_inner_product(g.gv, g.gv))), 6)"
)
_GCOS_V_SQL = (
    "round(list_inner_product(v.v, g.gv) / "
    "(sqrt(list_inner_product(v.v, v.v)) * sqrt(list_inner_product(g.gv, g.gv))), 6)"
)
_FCOS_SQL = (
    "round(list_inner_product(vg.v, ca.cv) / "
    "(sqrt(list_inner_product(vg.v, vg.v)) * sqrt(list_inner_product(ca.cv, ca.cv))), 6)"
)

ORACLE_DEDUP_EMBEDDING_IVF2 = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM v WHERE vec_id < {_IVF2_PRM_SQL}),
g AS (SELECT vec_id AS coarse_id, v AS gv FROM v WHERE vec_id < {_IVF2_K1_SQL}),
ca AS (
  SELECT centroid_id, cv, coarse_id FROM (
    SELECT c.centroid_id, c.cv, g.coarse_id,
           row_number() OVER (PARTITION BY c.centroid_id
             ORDER BY {_GCOS_C_SQL} DESC, g.coarse_id ASC) AS rk
    FROM c CROSS JOIN g
  ) WHERE rk = 1
),
vg AS (
  SELECT vec_id, v, coarse_id FROM (
    SELECT v.vec_id, v.v, g.coarse_id,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {_GCOS_V_SQL} DESC, g.coarse_id ASC) AS rk
    FROM v CROSS JOIN g
  ) WHERE rk = 1
),
assigned AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT vg.vec_id, vg.v, ca.centroid_id,
           row_number() OVER (PARTITION BY vg.vec_id
             ORDER BY {_FCOS_SQL} DESC, ca.centroid_id ASC) AS rk
    FROM vg JOIN ca ON ca.coarse_id = vg.coarse_id
  ) WHERE rk = 1
)
SELECT vec_a, vec_b, cos FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_COS_SQL} AS cos
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
) WHERE cos >= {COSINE_DUP_THRESHOLD}
"""


# --- embedding near-dup via signed-random-projection LSH -------------------


def q_dedup_embedding_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows_bits auto-derives with the r=4 frozen-oracle region widened to
    # n<=1024 (operators/dedup.py): the oracle-checked fixtures are
    # "<=1k vectors" so regeneration can't flip the plane set, while big
    # corpora (the sf1 scaling bench's 20k vectors) still get
    # bucket-bounded wider bands — pinning r=4 here cost a measured
    # 28.9s-vs-5s quadratic blowup at sf1.
    return embedding_near_dup_srp(
        _t(spark, sf_dir, "embeddings"), COSINE_DUP_THRESHOLD
    )


def _srp_plane_sql(plane: tuple[float, ...]) -> str:
    return "[" + ", ".join(repr(c) for c in plane) + "]"


# sign bit per frozen hyperplane — the literal doubles are generated from
# the same SRP_PLANES constants the Spark plan uses (hashing.py), so both
# engines take the exact same dot products.
_SRP_BITS_SQL = "[" + ",\n   ".join(
    f"CASE WHEN list_inner_product(v, {_srp_plane_sql(p)}) >= 0 "
    "THEN 1 ELSE 0 END"
    for p in SRP_PLANES
) + "]"

_SRP_BAND_VAL_SQL = " + ".join(
    f"bits[band_idx*{SRP_ROWS}+{r + 1}]*{2 ** (SRP_ROWS - 1 - r)}"
    for r in range(SRP_ROWS)
)

ORACLE_DEDUP_EMBEDDING_SRP = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
bits AS (SELECT vec_id, {_SRP_BITS_SQL} AS bits FROM v),
bands AS (
  SELECT vec_id, band_idx, {_SRP_BAND_VAL_SQL} AS band_val
  FROM bits, (SELECT unnest(range(0, {SRP_BANDS})) AS band_idx)
),
cand AS (
  SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
   AND l.vec_id < r.vec_id
)
SELECT vec_a, vec_b, cos FROM (
  SELECT cand.vec_a, cand.vec_b, {_COS_SQL} AS cos
  FROM cand JOIN v a ON a.vec_id = cand.vec_a
            JOIN v b ON b.vec_id = cand.vec_b
) WHERE cos >= {COSINE_DUP_THRESHOLD}
"""


def q_dedup_embedding_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-output embedding dedup (round 10): (vec_id, rep_id) via SRP
    bucket-rep star edges, exact-cosine edge verification, and
    large-star/small-star connected components
    (operators/dedup.embedding_dedup_reps). The production contract for
    high-multiplicity corpora, where any pair-emitting operator's OUTPUT
    is Θ(Σ multiplicity²) — the sf100 probe's 1000-copy embedding groups
    lower-bound pair enumeration at ~10⁹ rows while this stays at n. The
    oracle replays banding, bucket-min rep selection, the cosine
    verification, and the transitive closure (recursive CTE)."""
    from pleiades_spark.operators.dedup import embedding_dedup_reps

    return embedding_dedup_reps(
        _t(spark, sf_dir, "embeddings"), COSINE_DUP_THRESHOLD
    )


ORACLE_DEDUP_EMBEDDING_REPS = f"""
WITH RECURSIVE v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
bits AS (SELECT vec_id, {_SRP_BITS_SQL} AS bits FROM v),
bands AS (
  SELECT vec_id, band_idx, {_SRP_BAND_VAL_SQL} AS band_val
  FROM bits, (SELECT unnest(range(0, {SRP_BANDS})) AS band_idx)
),
reps AS (
  SELECT band_idx, band_val, min(vec_id) AS rep
  FROM bands GROUP BY band_idx, band_val
),
e0 AS (
  SELECT DISTINCT b.vec_id, r.rep
  FROM bands b JOIN reps r
    ON b.band_idx = r.band_idx AND b.band_val = r.band_val
  WHERE b.vec_id != r.rep
),
ver AS (
  SELECT vec_id, rep FROM (
    SELECT e0.vec_id, e0.rep, {_COS_SQL} AS cos
    FROM e0 JOIN v a ON a.vec_id = e0.vec_id
            JOIN v b ON b.vec_id = e0.rep
  ) WHERE cos >= {COSINE_DUP_THRESHOLD}
),
edges AS (
  SELECT vec_id AS u, rep AS w FROM ver
  UNION SELECT rep, vec_id FROM ver
),
reach(node, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.w, reach.r FROM reach JOIN edges e ON e.u = reach.node
),
cl AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
SELECT vv.vec_id, CAST(coalesce(cl.cluster, vv.vec_id) AS BIGINT) AS rep_id
FROM v vv LEFT JOIN cl ON cl.node = vv.vec_id
"""


def q_dedup_embedding_reps_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the EMBEDDING reps contract (round 12)
    — the modality twin of doc_dedup_reps_incr: old-slice SRP bucket-min
    star edges + tonight's O(increment) bucket work (new members and
    undercut old reps to the full bucket min) + one CC pass
    (operators/dedup.embedding_dedup_reps_incremental). Same
    deterministic 20 % hash slice; the oracle replays both phases and
    the closure bit-for-bit."""
    from pleiades_spark.functions.hashing import h32
    from pleiades_spark.operators.dedup import (
        embedding_dedup_reps_incremental,
    )

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "is_new",
        h32(F.concat(F.lit("incr:"), F.col("vec_id").cast("string"))) % 100
        < INCR_PCT,
    )
    return embedding_dedup_reps_incremental(emb, "is_new", COSINE_DUP_THRESHOLD)


ORACLE_DEDUP_EMBEDDING_REPS_INCR = f"""
WITH RECURSIVE v AS (
  SELECT vec_id,
         {h32_sql("concat('incr:', CAST(vec_id AS VARCHAR))")} % 100
           < {INCR_PCT} AS is_new,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
bits AS (SELECT vec_id, is_new, {_SRP_BITS_SQL} AS bits FROM v),
bands AS (
  SELECT vec_id, is_new, band_idx, {_SRP_BAND_VAL_SQL} AS band_val
  FROM bits, (SELECT unnest(range(0, {SRP_BANDS})) AS band_idx)
),
oreps AS (
  SELECT band_idx, band_val, min(vec_id) AS orep
  FROM bands WHERE NOT is_new GROUP BY band_idx, band_val
),
oe AS (
  SELECT DISTINCT b.vec_id, o.orep AS rep
  FROM bands b JOIN oreps o
    ON b.band_idx = o.band_idx AND b.band_val = o.band_val
  WHERE NOT b.is_new AND b.vec_id != o.orep
),
freps AS (
  SELECT band_idx, band_val, min(vec_id) AS frep,
         max(CASE WHEN is_new THEN 1 ELSE 0 END) AS has_new
  FROM bands GROUP BY band_idx, band_val
),
ne AS (
  SELECT DISTINCT b.vec_id, f.frep AS rep
  FROM bands b
  JOIN freps f
    ON b.band_idx = f.band_idx AND b.band_val = f.band_val AND f.has_new = 1
  LEFT JOIN oreps o
    ON b.band_idx = o.band_idx AND b.band_val = o.band_val
  WHERE b.vec_id != f.frep AND (b.is_new OR b.vec_id = o.orep)
),
e0 AS (
  SELECT vec_id, rep FROM oe UNION SELECT vec_id, rep FROM ne
),
ver AS (
  SELECT vec_id, rep FROM (
    SELECT e0.vec_id, e0.rep, {_COS_SQL} AS cos
    FROM e0 JOIN v a ON a.vec_id = e0.vec_id
            JOIN v b ON b.vec_id = e0.rep
  ) WHERE cos >= {COSINE_DUP_THRESHOLD}
),
edges AS (
  SELECT vec_id AS u, rep AS w FROM ver
  UNION SELECT rep, vec_id FROM ver
),
reach(node, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.w, reach.r FROM reach JOIN edges e ON e.u = reach.node
),
cl AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
SELECT vv.vec_id, CAST(coalesce(cl.cluster, vv.vec_id) AS BIGINT) AS rep_id
FROM v vv LEFT JOIN cl ON cl.node = vv.vec_id
"""


def _incr_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture embeddings + the deterministic is_new increment slice —
    shared by the persisted-index and streaming-reps embedding gates."""
    from pleiades_spark.functions.hashing import h32

    return _t(spark, sf_dir, "embeddings").withColumn(
        "is_new",
        h32(F.concat(F.lit("incr:"), F.col("vec_id").cast("string"))) % 100
        < INCR_PCT,
    )


def staged_emb_reps_index(spark: SparkSession, sf_dir: str) -> str:
    """Bootstrap (or reuse) the persisted SRP star index over the OLD
    embedding slice — one cached artifact serves the persisted nightly
    gate AND the streaming reps gates. rows_bits pins from the FULL
    corpus count (geometry is part of the artifact); the staging key
    carries every recipe constant."""
    from pleiades_spark.functions.hashing import SRP_ROWS
    from pleiades_spark.operators.dedup import write_emb_reps_index
    from pleiades_spark.plans.streaming_batch import _staged_src

    emb = _incr_emb(spark, sf_dir)
    n = emb.count()
    rows_bits = SRP_ROWS if n <= 1024 else max(SRP_ROWS, (n // 4).bit_length())
    return _staged_src(
        sf_dir,
        f"emb_reps_idx_p{INCR_PCT}_t{COSINE_DUP_THRESHOLD}_r{rows_bits}"
        f"_b{SRP_BANDS}p1",
        lambda tmp: write_emb_reps_index(
            emb.filter(~F.col("is_new")).drop("is_new"),
            tmp,
            COSINE_DUP_THRESHOLD,
            rows_bits=rows_bits,
        ),
    )


def q_dedup_embedding_reps_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding nightly over the PERSISTED SRP star index
    (round 12): write_emb_reps_index on the old slice (bootstrap, cached
    per fixture identity), embedding_dedup_reps_from_index on tonight's
    vectors. rows_bits is pinned from the FULL corpus count — the
    production discipline (geometry is chosen for the corpus the index
    will grow into, and it is part of the artifact) — which also makes
    the run bit-identical to dedup_embedding_reps_incr, whose oracle it
    shares (the equivalence is separately pytest-pinned)."""
    from pleiades_spark.operators.dedup import embedding_dedup_reps_from_index

    emb = _incr_emb(spark, sf_dir)
    idx = staged_emb_reps_index(spark, sf_dir)
    return embedding_dedup_reps_from_index(
        emb.filter(F.col("is_new")).drop("is_new"), idx, COSINE_DUP_THRESHOLD
    )


# =========================== text analysis ================================


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: type-token ratio, stopword ratio,
    average token length, digit count → composite score + low flag.

    All codegen'd expressions; at 100 TB this is a pure map stage.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    ttr = n_distinct / n_tok
    sw_ratio = stopword_count(toks) / n_tok
    avg_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / n_tok
    quality = F.round(
        0.4 * ttr + 0.4 * (1 - sw_ratio) + 0.2 * F.least(n_tok / 100, F.lit(1.0)), 6
    )
    return docs.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        F.round(ttr, 6).alias("ttr"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.regexp_count(F.col("text"), F.lit("[0-9]")).alias("n_digits"),
        quality.alias("quality"),
        (quality < 0.5).alias("low_quality"),
    )


_TOKS = "string_split(text, ' ')"

ORACLE_TEXT_QUALITY = f"""
SELECT doc_id, lang,
       CAST(n_tokens AS INT) AS n_tokens,
       CAST(n_distinct AS INT) AS n_distinct,
       round(ttr, 6) AS ttr,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(avg_token_len, 6) AS avg_token_len,
       CAST(n_digits AS INT) AS n_digits,
       round(0.4 * ttr + 0.4 * (1 - stopword_ratio)
             + 0.2 * least(n_tokens / 100.0, 1.0), 6) AS quality,
       (round(0.4 * ttr + 0.4 * (1 - stopword_ratio)
             + 0.2 * least(n_tokens / 100.0, 1.0), 6) < 0.5) AS low_quality
FROM (
  SELECT doc_id, lang,
         len({_TOKS}) AS n_tokens,
         len(list_distinct({_TOKS})) AS n_distinct,
         len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}) AS ttr,
         {stopword_count_sql(_TOKS)} * 1.0 / len({_TOKS}) AS stopword_ratio,
         list_sum(list_transform({_TOKS}, t -> length(t))) * 1.0
           / len({_TOKS}) AS avg_token_len,
         len(regexp_extract_all(text, '[0-9]')) AS n_digits
  FROM documents
)
"""


# --- quality decile stratification (ntile) -----------------------------------


def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality deciles: ntile(10) over the composite quality
    score (total order: score, doc_id), then per-(lang, decile) stats —
    the stratification step before decile-targeted filtering or
    curriculum sampling.

    ntile needs a per-partition sort; partitioning by lang keeps it off
    the single-partition global-window path. Exact deciles of a truly
    huge single language would instead use approx_percentile boundaries
    + a width-bucket join (sketch-sized, no sort) — exactness here is
    what makes the cross-engine oracle possible."""
    scored = q_text_quality(spark, sf_dir).select(
        "doc_id", "lang", "n_tokens", "quality"
    )
    w = W.partitionBy("lang").orderBy(F.col("quality").asc(), F.col("doc_id").asc())
    return (
        scored.withColumn("decile", F.ntile(10).over(w))
        .groupBy("lang", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("quality").alias("min_quality"),
            F.max("quality").alias("max_quality"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
    )


ORACLE_QUALITY_DECILES = f"""
WITH scored AS (
  SELECT doc_id, lang, n_tokens, quality FROM ({ORACLE_TEXT_QUALITY}) tq
)
SELECT lang, CAST(decile AS INT) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(quality) AS min_quality,
       max(quality) AS max_quality,
       round(avg(n_tokens), 4) AS avg_tokens
FROM (SELECT *, ntile(10) OVER (PARTITION BY lang
                                ORDER BY quality ASC, doc_id ASC) AS decile
      FROM scored)
GROUP BY lang, decile
"""


# --- Johnson-Lindenstrauss projection --------------------------------------


def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64-d → 16-d (operators/similarity.jl_project):
    frozen-matrix dot products, first two coordinates + norm ratio."""
    from pleiades_spark.operators.similarity import jl_project

    return jl_project(_t(spark, sf_dir, "embeddings"))


def _jl_planes_sql() -> str:
    from pleiades_spark.functions.hashing import srp_planes

    return "[" + ",\n ".join(
        "[" + ", ".join(repr(c) for c in p) + "]" for p in srp_planes(16)
    ) + "]"


ORACLE_JL_PROJECTION = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), proj AS (
  SELECT vec_id, v,
         list_transform({_jl_planes_sql()},
                        p -> list_inner_product(v, p)) AS proj
  FROM v
)
SELECT vec_id,
       round(proj[1], 6) AS p0_r,
       round(proj[2], 6) AS p1_r,
       round(sqrt(list_inner_product(proj, proj))
             / sqrt(list_inner_product(v, v)), 6) AS norm_ratio_r
FROM proj
"""


# --- train/eval split leakage audit ----------------------------------------

LEAK_EVAL_PCT = 10  # deterministic 10% eval slice for the audit


def _leak_eval_flag(doc_id: F.Column) -> F.Column:
    """Deterministic train/eval split flag — a pure function of doc_id
    (h32-salted 10 % slice), recomputable anywhere a doc_id column
    exists. Keeping it a function of the key is what lets the audit
    avoid joining a per-doc flags frame back onto the pair table."""
    from pleiades_spark.functions.hashing import h32

    return (
        h32(F.concat(F.lit("leak:"), doc_id.cast("string"))) % 100
        < LEAK_EVAL_PCT
    )


def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-decontamination report: near-duplicate pairs CROSSING a
    train/eval split — the contamination an external-benchmark decontam
    pass (benchmark_decontam) cannot see, because the leak is between a
    corpus and its own held-out slice. Every eval doc with a
    near-duplicate in train inflates eval scores.

    Split = deterministic 10 % hash slice (h32-salted, engine-stable);
    candidates ride minhash_lsh_pairs' incremental machinery
    (new_col="is_eval": only pairs touching >=1 eval doc are generated —
    train×train, the bulk, is excluded INSIDE candidate generation), and
    eval×eval pairs drop in a post-filter. Output: one report row —
    leaky pair count, distinct leaked eval docs, eval-set size, worst
    jaccard. Scale: the audit costs O(eval-side bucket occupancy), not
    O(corpus²) — the same economics as the nightly incremental dedup.
    """
    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_eval", _leak_eval_flag(F.col("doc_id"))
    )
    pairs = minhash_lsh_pairs(docs, JACCARD_THRESHOLD, new_col="is_eval")
    # The eval flag is a deterministic pure function of doc_id, so the
    # per-pair flags are RECOMPUTED inline from doc_a/doc_b — no join, no
    # broadcast of a per-doc flags frame (which at 100 TB is a
    # billions-row broadcast and a driver OOM; round-6 verdict finding).
    # Bit-identical to the joined form: same h32 on the same cast.
    cross = (
        pairs.withColumn("ev_a", _leak_eval_flag(F.col("doc_a")))
        .withColumn("ev_b", _leak_eval_flag(F.col("doc_b")))
        .filter(F.col("ev_a") != F.col("ev_b"))
        .withColumn(
            "eval_doc",
            F.when(F.col("ev_a"), F.col("doc_a")).otherwise(F.col("doc_b")),
        )
    )
    report = cross.agg(
        F.count(F.lit(1)).alias("n_leaky_pairs"),
        F.countDistinct("eval_doc").alias("n_eval_docs_leaked"),
        F.round(F.coalesce(F.max("jaccard"), F.lit(0.0)), 6).alias(
            "max_jaccard"
        ),
    )
    n_eval = docs.filter(F.col("is_eval")).agg(
        F.count(F.lit(1)).alias("n_eval_docs")
    )
    return report.crossJoin(n_eval)


_LEAK_SPLIT_SQL = (
    h32_sql("concat('leak:', CAST(doc_id AS VARCHAR))") + f" % 100 < {LEAK_EVAL_PCT}"
)

ORACLE_SPLIT_LEAKAGE_AUDIT = f"""
WITH sh AS (
  SELECT doc_id, {_LEAK_SPLIT_SQL} AS is_eval,
         {word_shingles_sql('text')} AS sh
  FROM documents
), hashed AS (
  SELECT doc_id, is_eval, sh, list_transform(sh, s -> {h32_sql('s')}) AS hs FROM sh
), sig AS (
  SELECT doc_id, is_eval, {_SIG_SQL} AS sig FROM hashed
), bands AS (
  SELECT doc_id, is_eval, band_idx,
         array_to_string(sig[band_idx*{LSH_ROWS}+1 : band_idx*{LSH_ROWS}+{LSH_ROWS}], '-') AS band_key
  FROM sig, {_BANDS_RANGE_SQL}
), cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         l.is_eval AS ev_a, r.is_eval AS ev_b
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id AND (l.is_eval OR r.is_eval)
), verified AS (
  SELECT doc_a, doc_b, ev_a, ev_b,
         CASE WHEN ev_a THEN doc_a ELSE doc_b END AS eval_doc,
         round(len(list_intersect(a.sh, b.sh)) * 1.0
               / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
  FROM cand JOIN sh a ON a.doc_id = cand.doc_a JOIN sh b ON b.doc_id = cand.doc_b
  WHERE ev_a <> ev_b
), leaks AS (
  SELECT * FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
)
SELECT CAST((SELECT count(*) FROM leaks) AS BIGINT) AS n_leaky_pairs,
       CAST((SELECT count(DISTINCT eval_doc) FROM leaks) AS BIGINT)
         AS n_eval_docs_leaked,
       round(coalesce((SELECT max(jaccard) FROM leaks), 0.0), 6)
         AS max_jaccard,
       CAST((SELECT count(*) FROM sh WHERE is_eval) AS BIGINT) AS n_eval_docs
"""


# --- exact prefix-filter similarity join -----------------------------------


def q_dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard join at t=0.6 via prefix filtering
    (operators/dedup.prefix_jaccard_pairs) — recall-1 scale path between
    the quadratic ground truth and the probabilistic LSH gates."""
    from pleiades_spark.operators.dedup import prefix_jaccard_pairs

    return prefix_jaccard_pairs(_t(spark, sf_dir, "documents"))


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional Jaccard-CONTAINMENT join at t=0.8
    (operators/dedup.prefix_containment_pairs): sub-document duplication
    — a doc near-contained in another — that symmetric Jaccard cannot
    see. Exact (recall 1), so the oracle verifies with a brute
    containment join."""
    from pleiades_spark.operators.dedup import prefix_containment_pairs

    return prefix_containment_pairs(_t(spark, sf_dir, "documents"))


# Brute-force oracle — valid because the Spark path is EXACT (prefix
# filtering is recall-1); 500² list intersections at gate SF.
ORACLE_DEDUP_CONTAINMENT = """
WITH sh AS (
  SELECT doc_id, CASE WHEN len(string_split(text,' ')) >= 3 THEN list_distinct(list_transform(range(0, len(string_split(text,' ')) - 2), i -> array_to_string(string_split(text,' ')[i+1:i+3], ' '))) ELSE [text] END AS sh FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh), 6)
         AS containment
FROM sh a JOIN sh b ON a.doc_id != b.doc_id
WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh), 6) >= 0.8
"""


_CLSH_K = 32
_CLSH_MAX_PROBE_DF = 256  # hot-hash cap (round 10): candidates ≤ n·m·cap


def q_dedup_containment_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate directional containment at t=0.8 via bottom-k MinHash
    sampling (operators/dedup.containment_lsh_pairs) — the 100 TB scale
    path whose candidate volume rides rarity-ordered k-bounded probes
    instead of the exact join's per-length prefixes, now df-capped at
    {cap} (verdict r9 #1: on a fixed-vocabulary corpus probe-hash df
    grows with the corpus, so uncapped candidate volume is superlinear;
    the cap bounds it at n·m·cap). Deterministic md5-h32 end-to-end;
    because the cap makes probe selection LOSSY for corpus-hot hashes,
    the oracle replays the probe selection itself — rarity order
    (df ASC, h ASC), the m-slice, and the df filter — bit-for-bit
    rather than the old brute form."""
    from pleiades_spark.operators.dedup import containment_lsh_pairs

    return containment_lsh_pairs(
        _t(spark, sf_dir, "documents"), max_probe_df=_CLSH_MAX_PROBE_DF
    )


ORACLE_DEDUP_CONTAINMENT_LSH = f"""
WITH sh AS (
  SELECT doc_id, {word_shingles_sql('text')} AS sh FROM documents
), hs AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform(sh, s -> {h32_sql('s')}))) AS hs
  FROM sh
), samp AS (
  SELECT doc_id, hs, hs[1:{_CLSH_K}] AS samp, len(hs) AS n,
         least({_CLSH_K}, len(hs)) AS k_eff
  FROM hs
), tok AS (
  SELECT doc_id, unnest(hs) AS h FROM hs
), df AS (
  SELECT h, count(*) AS df FROM tok GROUP BY h
), sprobe AS (
  SELECT doc_id, n, k_eff, unnest(samp) AS h FROM samp
), ranked AS (
  SELECT s.doc_id, s.n, s.h, d.df, s.k_eff,
         row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.h) AS r,
         s.k_eff - ((4 * s.k_eff + 4) // 5) + 1 AS m
  FROM sprobe s JOIN df d ON s.h = d.h
), pr0 AS (
  -- p = min(m+1, k_eff) rarest probes, hot ones (df > cap) dropped
  SELECT doc_id, n, h, m
  FROM ranked
  WHERE r <= least(m + 1, k_eff) AND df <= {_CLSH_MAX_PROBE_DF}
), pr AS (
  -- c_eff from the SURVIVING probe count (round 11, ADVICE r10): a
  -- qualifying pair misses at most m-1 sample elements, so among the
  -- surv survivors it must hit >= max(1, surv - (m-1))
  SELECT doc_id, n, h,
         greatest(1, count(*) OVER (PARTITION BY doc_id) - (m - 1)) AS c_eff
  FROM pr0
), cand AS (
  SELECT doc_a, doc_b FROM (
    SELECT p.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS hits, max(p.c_eff) AS c_eff
    FROM pr p
    JOIN tok b ON p.h = b.h AND p.doc_id != b.doc_id
    JOIN samp sb ON sb.doc_id = b.doc_id AND 4 * p.n <= 5 * sb.n
    GROUP BY p.doc_id, b.doc_id
  ) WHERE hits >= c_eff
)
SELECT c.doc_a, c.doc_b,
       round(len(list_intersect(a.samp, b.hs)) * 1.0 / a.k_eff, 6)
         AS containment_est
FROM cand c
JOIN samp a ON a.doc_id = c.doc_a
JOIN samp b ON b.doc_id = c.doc_b
WHERE 5 * len(list_intersect(a.samp, b.hs)) >= 4 * a.k_eff
"""


# Hashed-token domain (round 10): df, rarity order, prefix join and the
# verification all run over md5-h32 shingle hashes shifted into signed
# 32-bit ints — exactly what the Spark plan does, so the gate stays
# bit-exact w.r.t. the hashed-shingle Jaccard contract.
ORACLE_DEDUP_JACCARD_PREFIX = f"""
WITH sh AS (
  SELECT doc_id, {word_shingles_sql('text')} AS sh FROM documents
), hsd AS (
  SELECT doc_id,
         list_distinct(list_transform(sh,
           s -> CAST({h32_sql('s')} - 2147483648 AS INTEGER))) AS hs
  FROM sh
), tok AS (
  SELECT doc_id, unnest(hs) AS t FROM hsd
), rk AS (
  SELECT t, row_number() OVER (ORDER BY count(*) ASC, t ASC) AS rk
  FROM tok GROUP BY t
), ot AS (
  SELECT doc_id, list(tok.t ORDER BY rk.rk ASC) AS ot
  FROM tok JOIN rk ON tok.t = rk.t
  GROUP BY doc_id
), pref AS (
  SELECT doc_id, len(ot) AS n,
         unnest(ot[1 : len(ot) - ((3 * len(ot) + 4) // 5) + 1]) AS t
  FROM ot
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pref a JOIN pref b
    ON a.t = b.t AND a.doc_id < b.doc_id
   AND 3 * a.n <= 5 * b.n AND 3 * b.n <= 5 * a.n
)
SELECT doc_a, doc_b,
       round(len(list_intersect(sa.hs, sb.hs)) * 1.0
             / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))),
             6) AS jaccard
FROM cand
JOIN hsd sa ON sa.doc_id = doc_a
JOIN hsd sb ON sb.doc_id = doc_b
WHERE round(len(list_intersect(sa.hs, sb.hs)) * 1.0
            / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))),
            6) >= 0.6
"""


# --- higher-order collection functions --------------------------------------


def q_collection_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order / collection function breadth in one gate:
    transform, filter, exists, forall, aggregate (fold), slice, reverse,
    array_distinct, flatten via nested transform — the array-programming
    surface a payload-heavy pipeline leans on, each with a DuckDB list_*
    twin. The token array lands in a real column once; every HOF reads
    the column (HOF-CSE rule)."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", F.split("text", " ").alias("w"))
    return toked.select(
        "doc_id",
        F.size(F.filter("w", lambda x: F.length(x) > 4)).alias("n_long"),
        F.exists("w", lambda x: x == F.lit("the")).alias("has_the"),
        F.forall("w", lambda x: F.length(x) < 12).alias("all_short"),
        F.aggregate(
            "w", F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("sum_len"),
        F.array_join(F.reverse(F.slice("w", 1, 3)), "-").alias("first3_rev"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        F.array_join(
            F.flatten(
                F.transform("w", lambda x: F.array(F.substring(x, 1, 1)))
            ),
            "",
        ).alias("initials"),
    )


ORACLE_COLLECTION_FUNCTIONS = """
WITH toked AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       CAST(len(list_filter(w, x -> length(x) > 4)) AS INT) AS n_long,
       len(list_filter(w, x -> x = 'the')) > 0 AS has_the,
       len(list_filter(w, x -> NOT length(x) < 12)) = 0 AS all_short,
       CAST(list_sum(list_transform(w, x -> length(x))) AS INT) AS sum_len,
       array_to_string(list_reverse(w[1:3]), '-') AS first3_rev,
       CAST(len(list_distinct(w)) AS INT) AS n_distinct,
       array_to_string(list_transform(w, x -> substring(x, 1, 1)), '')
         AS initials
FROM toked
"""


# --- TextRank keyword extraction -----------------------------------------


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus keyword ranking via integer-exact TextRank
    (operators/graph.textrank_keywords): 5 damped PageRank iterations
    over the symmetric adjacent-word co-occurrence graph, all arithmetic
    in 64-bit integer floor-division form so the oracle's unrolled
    iteration chain reproduces every rank bit-for-bit."""
    from pleiades_spark.operators.graph import textrank_keywords

    return textrank_keywords(_t(spark, sf_dir, "documents"))


ORACLE_TEXTRANK_KEYWORDS = f"""
WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
adj AS (
  SELECT unnest(list_transform(range(1, len(w)),
                i -> {{'src': w[i], 'dst': w[i + 1]}})) AS e
  FROM toks
),
a2 AS (SELECT e.src AS src, e.dst AS dst FROM adj),
edges AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM (
    SELECT src, dst FROM a2
    UNION ALL
    SELECT dst AS src, src AS dst FROM a2
  ) GROUP BY src, dst
),
wdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wdeg FROM edges GROUP BY src),
ew AS (SELECT e.src, e.dst, e.w, d.wdeg FROM edges e JOIN wdeg d USING (src)),
nn AS (SELECT count(DISTINCT src) AS n FROM ew),
it0 AS (
  SELECT DISTINCT src AS word,
         CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS r
  FROM ew
),
it1 AS (
  SELECT e.dst AS word,
         CAST((15 * 1000000000000) // (100 * (SELECT n FROM nn))
              + (85 * sum((r.r * e.w) // e.wdeg)) // 100 AS BIGINT) AS r
  FROM ew e JOIN it0 r ON r.word = e.src
  GROUP BY e.dst
),
it2 AS (
  SELECT e.dst AS word,
         CAST((15 * 1000000000000) // (100 * (SELECT n FROM nn))
              + (85 * sum((r.r * e.w) // e.wdeg)) // 100 AS BIGINT) AS r
  FROM ew e JOIN it1 r ON r.word = e.src
  GROUP BY e.dst
),
it3 AS (
  SELECT e.dst AS word,
         CAST((15 * 1000000000000) // (100 * (SELECT n FROM nn))
              + (85 * sum((r.r * e.w) // e.wdeg)) // 100 AS BIGINT) AS r
  FROM ew e JOIN it2 r ON r.word = e.src
  GROUP BY e.dst
),
it4 AS (
  SELECT e.dst AS word,
         CAST((15 * 1000000000000) // (100 * (SELECT n FROM nn))
              + (85 * sum((r.r * e.w) // e.wdeg)) // 100 AS BIGINT) AS r
  FROM ew e JOIN it3 r ON r.word = e.src
  GROUP BY e.dst
),
it5 AS (
  SELECT e.dst AS word,
         CAST((15 * 1000000000000) // (100 * (SELECT n FROM nn))
              + (85 * sum((r.r * e.w) // e.wdeg)) // 100 AS BIGINT) AS r
  FROM ew e JOIN it4 r ON r.word = e.src
  GROUP BY e.dst
)
SELECT word, r AS rank_units
FROM it5
ORDER BY r DESC, word ASC
LIMIT 50
"""


# --- repetition quality filters (Gopher-style) -------------------------------

# Thresholds in the spirit of the published Gopher/MassiveText repetition
# rules (Rae et al. 2021, table A1): docs dominated by one bigram or by
# repeated 5-grams are boilerplate/spam. Exact values are corpus-tunable.
TOP_BIGRAM_CHAR_MAX = 0.20
DUP_5GRAM_CHAR_MAX = 0.15


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters per document: duplicate-word
    fraction, most-frequent-bigram character fraction, duplicated-5-gram
    character fraction, and the keep/drop flag. Complements
    plans/corpus.q_repetition_scores (the cheap repeated-trigram map
    stage) with the full per-gram accounting.

    The fixture corpus has no newlines, so the paper's line-level rules
    are expressed at the word level. Char attribution counts every
    occurrence's characters (count × gram length) rather than the union
    of covered spans — simpler, deterministic, and monotone in the same
    boilerplate signal.

    Scale shape: every statistic is PER DOCUMENT, so nothing needs a
    shuffle — gram counting happens inside the row: sort the gram array,
    fold over runs of equal grams (array_sort + aggregate, both
    codegen-stage HOFs). The previous form exploded grams into
    groupBy(doc_id, gram) + window — three exchanges of corpus×gram rows
    to compute row-local facts; this is a single map stage at any corpus
    size. Ties for the top bigram break toward the lexically smallest
    gram in both forms (strict > against the sorted order). Each gram
    array is materialized into a real column before its fold (HOF
    re-evaluation trap). Ratios divide exact integers so both engines
    quantize identical doubles (floor(x·10⁴+0.5)/10⁴)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", F.split("text", " ").alias("words")
    )
    base = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size("words").alias("n_words"),
        F.size(F.array_distinct("words")).alias("n_distinct_words"),
        "words",
    )

    grams = base.select(
        "doc_id",
        "n_chars",
        "n_words",
        "n_distinct_words",
        F.array_sort(
            F.expr(
                "zip_with(slice(words, 1, greatest(size(words) - 1, 0)),"
                " slice(words, 2, greatest(size(words) - 1, 0)),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("bg_sorted"),
        F.array_sort(
            F.expr(
                "CASE WHEN size(words) >= 5 THEN"
                " transform(sequence(1, size(words) - 4),"
                " i -> concat_ws(' ', slice(words, i, 5)))"
                " ELSE array() END"
            )
        ).alias("g5_sorted"),
    )

    # Top-bigram run fold: (prev, run, best_cnt, best_gram); strict >
    # keeps the first (= smallest, array is sorted) gram on count ties.
    top2 = F.aggregate(
        F.col("bg_sorted"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best_cnt"),
            F.lit(None).cast("string").alias("best_gram"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.when(
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(1)
                > acc["best_cnt"],
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(1),
            )
            .otherwise(acc["best_cnt"])
            .alias("best_cnt"),
            F.when(
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(1)
                > acc["best_cnt"],
                x,
            )
            .otherwise(acc["best_gram"])
            .alias("best_gram"),
        ),
    )

    # Duplicated-5-gram chars: runs of length r ≥ 2 contribute r·len —
    # incrementally, +2·len when the run reaches 2, +len for each step
    # past 2.
    dup5 = F.aggregate(
        F.col("g5_sorted"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).cast("long").alias("chars"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            (
                acc["chars"]
                + F.when(
                    x.eqNullSafe(acc["prev"]) & (acc["run"] == 1),
                    2 * F.length(x),
                )
                .when(x.eqNullSafe(acc["prev"]) & (acc["run"] >= 2), F.length(x))
                .otherwise(F.lit(0))
            ).alias("chars"),
        ),
    )

    folded = grams.select(
        "doc_id",
        "n_chars",
        "n_words",
        "n_distinct_words",
        top2.alias("t2"),
        dup5.alias("d5"),
    )

    q4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    dup_word_frac = q4(
        (F.col("n_words") - F.col("n_distinct_words")) / F.col("n_words")
    )
    top2_chars = F.col("t2")["best_cnt"] * F.length(F.col("t2")["best_gram"])
    top2_frac = q4(F.coalesce(top2_chars, F.lit(0)) / F.col("n_chars"))
    dup5_frac = q4(F.col("d5")["chars"] / F.col("n_chars"))
    return folded.select(
        "doc_id",
        "n_words",
        dup_word_frac.alias("dup_word_frac"),
        F.coalesce(F.col("t2")["best_gram"], F.lit("")).alias("top_bigram"),
        F.coalesce(F.col("t2")["best_cnt"], F.lit(0))
        .cast("long")
        .alias("top_bigram_count"),
        top2_frac.alias("top_bigram_char_frac"),
        dup5_frac.alias("dup_5gram_char_frac"),
        (
            (top2_frac > TOP_BIGRAM_CHAR_MAX) | (dup5_frac > DUP_5GRAM_CHAR_MAX)
        ).alias("repetitive"),
    )


ORACLE_GOPHER_REPETITION = f"""
WITH base AS (
  SELECT doc_id, length(text) AS n_chars, {_TOKS} AS words,
         len({_TOKS}) AS n_words,
         len(list_distinct({_TOKS})) AS n_distinct_words
  FROM documents
), g2 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(words)),
                        i -> words[i] || ' ' || words[i + 1])) AS gram
  FROM base WHERE n_words >= 2
), c2 AS (
  SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY doc_id, gram
), top2 AS (
  SELECT doc_id, gram AS top_bigram, cnt AS top_bigram_count,
         cnt * length(gram) AS top2_chars
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY cnt DESC, gram ASC) AS rn
        FROM c2)
  WHERE rn = 1
), g5 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(words) - 3),
                        i -> concat_ws(' ', words[i], words[i + 1], words[i + 2],
                                       words[i + 3], words[i + 4]))) AS gram
  FROM base WHERE n_words >= 5
), dup5 AS (
  SELECT doc_id,
         sum(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END) AS dup5_chars
  FROM (SELECT doc_id, gram, count(*) AS cnt FROM g5 GROUP BY doc_id, gram)
  GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(n_words AS INT) AS n_words,
       floor((n_words - n_distinct_words) * 1.0 / n_words * 1e4 + 0.5) / 1e4
         AS dup_word_frac,
       coalesce(top_bigram, '') AS top_bigram,
       CAST(coalesce(top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
       floor(coalesce(top2_chars, 0) * 1.0 / n_chars * 1e4 + 0.5) / 1e4
         AS top_bigram_char_frac,
       floor(coalesce(dup5_chars, 0) * 1.0 / n_chars * 1e4 + 0.5) / 1e4
         AS dup_5gram_char_frac,
       (floor(coalesce(top2_chars, 0) * 1.0 / n_chars * 1e4 + 0.5) / 1e4
          > {TOP_BIGRAM_CHAR_MAX}
        OR floor(coalesce(dup5_chars, 0) * 1.0 / n_chars * 1e4 + 0.5) / 1e4
          > {DUP_5GRAM_CHAR_MAX}) AS repetitive
FROM base b
LEFT JOIN top2 USING (doc_id)
LEFT JOIN dup5 USING (doc_id)
"""


# --- n-gram language ID -----------------------------------------------------

# Character-trigram profiles (tiny frozen codebook). The classifier shape is
# the real thing — extract trigrams, score against profiles, argmax — even
# though the synthetic corpus is English-ish for every label.
LANG_PROFILES: tuple[tuple[str, str], ...] = (
    ("en", "the"), ("en", "ing"), ("en", "er "), ("en", " th"),
    ("es", "que"), ("es", " de"), ("es", "los"), ("es", "ión"),
    ("de", "der"), ("de", "sch"), ("de", "ein"), ("de", "ich"),
    ("fr", "les"), ("fr", "ent"), ("fr", "eau"), ("fr", " la"),
    ("zh", "shi"), ("zh", "zho"), ("zh", "ng "), ("zh", "ian"),
)

_PROFILE_VALUES = ", ".join(f"('{lang}', '{tg}')" for lang, tg in LANG_PROFILES)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram language ID: doc trigrams ⋈ profile codebook → per-lang match
    count → argmax (ties → lang ASC). Docs matching no profile trigram drop
    out (same semantics in the oracle)."""
    docs = _t(spark, sf_dir, "documents")
    profiles = F.broadcast(
        spark.createDataFrame(list(LANG_PROFILES), "cand_lang string, trigram string")
    )
    doc_tg = docs.select(
        "doc_id", F.explode(char_shingles(F.col("text"), 3)).alias("trigram")
    )
    scores = (
        doc_tg.join(profiles, "trigram")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("matches").desc(), F.col("cand_lang").asc())
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("cand_lang").alias("predicted_lang"), "matches")
    )


ORACLE_LANG_ID = f"""
WITH profiles(cand_lang, trigram) AS (VALUES {_PROFILE_VALUES}),
doc_tg AS (
  SELECT doc_id, unnest({char_shingles_sql('text', 3)}) AS trigram FROM documents
),
scores AS (
  SELECT doc_id, cand_lang, count(*) AS matches
  FROM doc_tg JOIN profiles USING (trigram)
  GROUP BY doc_id, cand_lang
)
SELECT doc_id, cand_lang AS predicted_lang, matches FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY matches DESC, cand_lang ASC) AS rk
  FROM scores
) WHERE rk = 1
"""


# --- language-ID confusion matrix -------------------------------------------


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of n-gram language-ID predictions vs the stored
    ``lang`` label — the calibration table a corpus pipeline checks
    before trusting the classifier as a filter (per-cell counts +
    per-true-lang recall). Rides q_lang_id's argmax output; one extra
    |langs|²-bounded aggregation on top, so the cost is the langid pass
    itself.
    """
    docs = _t(spark, sf_dir, "documents")
    pred = q_lang_id(spark, sf_dir).select("doc_id", "predicted_lang")
    joined = docs.select("doc_id", F.col("lang").alias("true_lang")).join(
        pred, "doc_id"
    )
    cells = joined.groupBy("true_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    wt = W.partitionBy("true_lang")
    return cells.select(
        "true_lang",
        "predicted_lang",
        "n_docs",
        (
            F.floor(
                F.col("n_docs")
                / F.sum("n_docs").over(wt)
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("row_frac"),
    )


ORACLE_LANGID_CONFUSION = f"""
WITH profiles(cand_lang, trigram) AS (VALUES {_PROFILE_VALUES}),
doc_tg AS (
  SELECT doc_id, unnest({char_shingles_sql('text', 3)}) AS trigram FROM documents
),
scores AS (
  SELECT doc_id, cand_lang, count(*) AS matches
  FROM doc_tg JOIN profiles USING (trigram)
  GROUP BY doc_id, cand_lang
),
pred AS (
  SELECT doc_id, cand_lang AS predicted_lang FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY matches DESC, cand_lang ASC) AS rk
    FROM scores
  ) WHERE rk = 1
),
cells AS (
  SELECT d.lang AS true_lang, p.predicted_lang,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents d JOIN pred p USING (doc_id)
  GROUP BY 1, 2
)
SELECT true_lang, predicted_lang, n_docs,
       floor(n_docs * 1.0
             / sum(n_docs) OVER (PARTITION BY true_lang) * 10000 + 0.5)
         / 10000 AS row_frac
FROM cells
"""


# --- language-ID confidence margin ------------------------------------------


def q_lang_id_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confidence: top-1 vs top-2 profile match margin per doc.

    Ambiguous documents (code, tables, mixed-language boilerplate) are
    where naive langid silently mislabels a corpus — the standard filter
    keeps only docs whose best language BEATS the runner-up by a margin.
    Same exploded-trigram ⋈ broadcast-profile aggregation as q_lang_id
    (one shuffle on (doc_id, cand_lang)); the margin adds nothing but a
    second row_number rank inside the SAME window — no extra exchange.
    Docs matching one profile only get margin = matches (runner-up 0).
    """
    docs = _t(spark, sf_dir, "documents")
    profiles = F.broadcast(
        spark.createDataFrame(list(LANG_PROFILES), "cand_lang string, trigram string")
    )
    doc_tg = docs.select(
        "doc_id", F.explode(char_shingles(F.col("text"), 3)).alias("trigram")
    )
    scores = (
        doc_tg.join(profiles, "trigram")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("matches").desc(), F.col("cand_lang").asc()
    )
    ranked = scores.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 2
    )
    top = ranked.filter(F.col("rk") == 1).select(
        "doc_id",
        F.col("cand_lang").alias("predicted_lang"),
        F.col("matches").alias("top_matches"),
    )
    second = ranked.filter(F.col("rk") == 2).select(
        "doc_id", F.col("matches").alias("second_matches")
    )
    joined = top.join(second, "doc_id", "left").withColumn(
        "second_matches", F.coalesce(F.col("second_matches"), F.lit(0))
    )
    margin = F.col("top_matches") - F.col("second_matches")
    return joined.select(
        "doc_id",
        "predicted_lang",
        "top_matches",
        margin.alias("margin"),
        (margin >= F.lit(LANGID_MARGIN_MIN)).alias("confident"),
    )


LANGID_MARGIN_MIN = 3

ORACLE_LANG_ID_MARGIN = f"""
WITH profiles(cand_lang, trigram) AS (VALUES {_PROFILE_VALUES}),
doc_tg AS (
  SELECT doc_id, unnest({char_shingles_sql('text', 3)}) AS trigram FROM documents
),
scores AS (
  SELECT doc_id, cand_lang, count(*) AS matches
  FROM doc_tg JOIN profiles USING (trigram)
  GROUP BY doc_id, cand_lang
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY matches DESC, cand_lang ASC) AS rk
  FROM scores
)
SELECT t.doc_id, t.cand_lang AS predicted_lang,
       t.matches AS top_matches,
       t.matches - coalesce(s.matches, 0) AS margin,
       (t.matches - coalesce(s.matches, 0)) >= {LANGID_MARGIN_MIN} AS confident
FROM (SELECT * FROM ranked WHERE rk = 1) t
LEFT JOIN (SELECT doc_id, matches FROM ranked WHERE rk = 2) s
  ON t.doc_id = s.doc_id
"""


# --- token counting ---------------------------------------------------------


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens vs BPE-ish regex tokens + chars-per-token ratio."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.size(tokens(F.col("text")))
    bpe = F.regexp_count(F.col("text"), F.lit(BPE_PATTERN))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(F.col("n_chars") / bpe, 6).alias("chars_per_token"),
    )


ORACLE_TOKEN_COUNTS = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS INT) AS bpe_tokens,
       round(n_chars * 1.0 / len(regexp_extract_all(text, '{BPE_PATTERN}')), 6)
         AS chars_per_token
FROM documents
"""


# --- hashed linear quality classifier ---------------------------------------

QC_BUCKETS = 256  # hashing-trick feature buckets
QC_UNIT = 1000  # integer weight resolution: w ∈ [-1000, 1000] / 1000


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText/CCNet-style linear quality classifier via the hashing
    trick: token → h32 feature bucket (QC_BUCKETS), bucket → weight,
    logit = mean token weight, keep = logit > 0.

    The weight table here is a frozen md5-derived stand-in so the DuckDB
    oracle replays it bit-for-bit; a real deployment broadcasts a TRAINED
    weight vector instead — the plan is identical (the weights are just a
    different 256-entry constant) and stays a pure codegen map stage: no
    shuffle, no Python, embarrassingly parallel at 100 TB.

    Float-parity design: weights are INTEGERS in [-QC_UNIT, QC_UNIT], so
    the per-doc sum is exact and summation-order-free; the single final
    division and the _quantize4 floor-quantizer are the only float ops,
    mirrored operation-for-operation in the oracle.

    Cf. reference text-analysis surface (SURVEY §2 extension set); the
    classifier complements q_text_quality's hand-written heuristics with
    the learned-filter shape used by CCNet/fastText quality filtering.
    """
    from pleiades_spark.operators.timeseries import _quantize4

    docs = _t(spark, sf_dir, "documents")
    d = docs.select("doc_id", "lang", tokens(F.col("text")).alias("toks"))
    units = F.transform(
        F.col("toks"),
        lambda t: (
            h32(F.concat(F.lit("w-"), (h32(t) % QC_BUCKETS).cast("string")))
            % (2 * QC_UNIT + 1)
        )
        - QC_UNIT,
    )
    n_tok = F.size(F.col("toks"))
    summed = d.select(
        "doc_id",
        "lang",
        n_tok.alias("n_toks"),
        F.aggregate(units, F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "su"
        ),
    )
    logit = _quantize4(
        F.col("su").cast("double") / (F.lit(float(QC_UNIT)) * F.col("n_toks"))
    )
    return summed.select(
        "doc_id",
        "lang",
        "n_toks",
        logit.alias("logit"),
        (logit > 0).alias("keep"),
    )


_QC_UNIT_SQL = (
    f"(({h32_sql('tk')}) % {QC_BUCKETS})"
)

ORACLE_QUALITY_CLASSIFIER = f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), u AS (
  SELECT doc_id, lang, CAST(len(toks) AS INT) AS n_toks,
         list_sum(list_transform(toks, tk ->
           ({h32_sql(f"'w-' || CAST({_QC_UNIT_SQL} AS VARCHAR)")}
            % {2 * QC_UNIT + 1}) - {QC_UNIT}
         )) AS su
  FROM t
)
SELECT doc_id, lang, n_toks,
       floor((CAST(su AS DOUBLE) / ({QC_UNIT}.0 * n_toks)) * 10000 + 0.5) / 10000
         AS logit,
       (floor((CAST(su AS DOUBLE) / ({QC_UNIT}.0 * n_toks)) * 10000 + 0.5) / 10000) > 0
         AS keep
FROM u
"""


# --- fingerprinting ----------------------------------------------------------


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: min-hash over character 5-gram shingles (one
    64-bit-safe value per doc) + shingle cardinality — the building block
    for shingle-level containment checks."""
    docs = _t(spark, sf_dir, "documents")
    # Two-step projection: referencing the shingle expression from both
    # array_min(transform(...)) and size(...) re-evaluates the whole
    # char-5-gram build per reference (no CSE across projections of the
    # same expression tree — measured 3.8 s vs 2.3 s at sf0.1).
    # Materialize it as a column once, then derive both outputs.
    base = docs.select("doc_id", char_shingles(F.col("text"), 5).alias("sh"))
    return base.select(
        "doc_id",
        F.array_min(F.transform("sh", h32)).alias("fingerprint"),
        F.size("sh").alias("n_shingles"),
    )


ORACLE_FINGERPRINTS = f"""
SELECT doc_id,
       list_min(list_transform(sh, s -> {h32_sql('s')})) AS fingerprint,
       CAST(len(sh) AS INT) AS n_shingles
FROM (SELECT doc_id, {char_shingles_sql('text', 5)} AS sh FROM documents)
"""


# Round-7 sf10 measurement (doc_fingerprints, 500k docs × ~2k char
# shingles): the hash FAMILY is not the cost — swapping the lambda's
# md5-h32 for the xxhash64 intrinsic moved 30.0 → 27.2 s (HOF lambda
# bodies are interpreted per element, so the intrinsic never codegens),
# and the codegen'd explode → min-agg alternative LOST outright (54-57 s
# either family: the 1 B-row Generate + partial agg dwarfs any hash).
# The array_min(transform(...)) single-pass form above is the measured
# optimum; its sf10 cost is the per-element walk over ~1 B shingles, a
# map-only scan with no shuffle — a production run shards it linearly.


# --- word frequencies ---------------------------------------------------------


def q_word_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 tokens per language (explode → count → partitioned top-k).

    The scale shape: one shuffle on (lang, token) with map-side combine,
    then the k-row window per lang — no global sort.
    """
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("lang", "rank", "token", "n")
    )


ORACLE_WORD_FREQ_TOPK = """
WITH counts AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
), agg AS (
  SELECT lang, token, count(*) AS n FROM counts GROUP BY lang, token
)
SELECT lang, rank, token, n FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
            ORDER BY n DESC, token ASC) AS rank
  FROM agg
) WHERE rank <= 10
"""


# --- salted aggregation (skew path) -----------------------------------------


def q_word_freq_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 tokens per language computed through the SALTED two-phase
    aggregation (operators/skew.py) — same result as word_frequency_topk,
    proving salting-invariance, while the plan spreads hot (lang, token)
    keys over 16 sub-partitions. Salt derives from doc_id (deterministic).
    """
    from pyspark.sql.window import Window as W

    from pleiades_spark.operators.skew import salted_count_sum

    docs = _t(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("token")
    )
    counts = salted_count_sum(
        exploded, ["lang", "token"], salt_source=F.col("doc_id")
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("lang", "rank", "token", "n")
    )


# identical result to the unsalted oracle — salting is plan-internal
ORACLE_WORD_FREQ_SALTED = """
WITH counts AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
), agg AS (
  SELECT lang, token, count(*) AS n FROM counts GROUP BY lang, token
)
SELECT lang, rank, token, n FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
            ORDER BY n DESC, token ASC) AS rank
  FROM agg
) WHERE rank <= 10
"""


# --- language dimension enrichment (FIXTURES.md §A.5 langdim) --------------

# ISO-639-ish two-standard dim with a coalesce fallback chain, mirroring
# the frontend's 639-1 → 639-2B → 639-3 lookup (store.js:31-53).
LANGDIM_PRIMARY: tuple[tuple[str, str], ...] = (
    ("en", "English"), ("es", "Spanish"), ("fr", "French"),
)
LANGDIM_FALLBACK: tuple[tuple[str, str], ...] = (
    ("de", "German"), ("zh", "Chinese"), ("en", "SHOULD NOT WIN"),
)


def q_doc_lang_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc stats enriched via broadcast dim join with a
    coalesce fallback chain (the serving layer's language lookup,
    engine-side)."""
    docs = _t(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )
    d1 = spark.createDataFrame(list(LANGDIM_PRIMARY), "lang string, l1 string")
    d2 = spark.createDataFrame(list(LANGDIM_FALLBACK), "lang string, l2 string")
    return (
        stats.join(F.broadcast(d1), "lang", "left")
        .join(F.broadcast(d2), "lang", "left")
        .select(
            "lang",
            F.coalesce(
                F.col("l1"), F.col("l2"), F.concat(F.lit("unknown:"), F.col("lang"))
            ).alias("language"),
            "n_docs",
            "avg_chars",
        )
    )


_D1_VALUES = ", ".join(f"('{c}', '{n}')" for c, n in LANGDIM_PRIMARY)
_D2_VALUES = ", ".join(f"('{c}', '{n}')" for c, n in LANGDIM_FALLBACK)

ORACLE_DOC_LANG_ENRICHMENT = f"""
WITH stats AS (
  SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
  FROM documents GROUP BY lang
),
d1(lang, l1) AS (VALUES {_D1_VALUES}),
d2(lang, l2) AS (VALUES {_D2_VALUES})
SELECT stats.lang, coalesce(l1, l2, 'unknown:' || stats.lang) AS language,
       n_docs, avg_chars
FROM stats LEFT JOIN d1 USING (lang) LEFT JOIN d2 USING (lang)
"""


# --- UDF / UDAF surface ------------------------------------------------------
# The reference exposes no UDF surface (§2.6); the engine's contract for
# user extensions is: vectorized @pandas_udf for scalar work, grouped
# applyInPandas for UDAF-shaped work — never row-at-a-time Python UDFs.


def q_quality_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar extension point: an Arrow-vectorized @pandas_udf computing a
    log-scaled length score. (Deliberately simple — the point is the
    batch-vectorized plumbing; anything expressible as builtins should BE
    builtins, per the hot-path rule.)"""
    from pyspark.sql import types as T

    # no pd.Series type hints: this module's `from __future__ import
    # annotations` stringifies them and pyspark can't resolve the names;
    # the explicit returnType makes hints redundant
    @F.pandas_udf(T.DoubleType())
    def length_score(n_chars):
        import numpy as np

        return (np.log1p(n_chars) / 10.0).round(6)

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", length_score(F.col("n_chars")).alias("len_score"))


ORACLE_QUALITY_PANDAS_UDF = """
SELECT doc_id, round(ln(1 + n_chars) / 10.0, 6) AS len_score FROM documents
"""


def q_lang_stats_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF shape: applyInPandas emitting ONE summary row per language
    group (mean/std over n_chars) — the grouped-map extension point."""
    import pandas as pd

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "mean_chars": [round(float(pdf["n_chars"].mean()), 4)],
                "std_chars": [round(float(pdf["n_chars"].std(ddof=1)), 4)],
            }
        )

    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").applyInPandas(
        summarize, schema="lang string, n_docs long, mean_chars double, std_chars double"
    )


ORACLE_LANG_STATS_UDAF = """
SELECT lang, count(*) AS n_docs,
       round(avg(n_chars), 4) AS mean_chars,
       round(stddev_samp(n_chars), 4) AS std_chars
FROM documents GROUP BY lang
"""


def q_token_runs_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF extension point (Spark 4 Python table functions): run-length
    encode each document's token stream — one input row expands to a
    variable number of (start_pos, token, run_len) rows, the shape that
    motivates a TABLE function over a scalar one.

    This is the LAST resort tier of the extension contract (row-at-a-time
    Python below pandas_udf/applyInPandas); it exists to complete and
    test the surface. The docstring-documented scale path for this exact
    computation is the JVM-side gaps-and-islands form — which is what the
    DuckDB oracle runs, so the gate also proves the UDTF agrees with the
    declarative formulation. Runs (len > 1) only, keeping output sparse."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="start_pos int, token string, run_len int")
    class TokenRuns:
        def eval(self, doc_id: int, text: str):  # noqa: ARG002
            toks = text.split(" ")
            i = 0
            while i < len(toks):
                j = i
                while j < len(toks) and toks[j] == toks[i]:
                    j += 1
                if j - i > 1:
                    yield i + 1, toks[i], j - i
                i = j

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.lateralJoin(
        TokenRuns(F.col("doc_id").outer(), F.col("text").outer())
    ).select("doc_id", "start_pos", "token", "run_len")


# Oracle: the declarative gaps-and-islands form — position minus
# run_number over equal tokens is constant within a run.
ORACLE_TOKEN_RUNS_UDTF = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), grp AS (
  SELECT doc_id, token, pos,
         pos - row_number() OVER (PARTITION BY doc_id, token ORDER BY pos)
           AS island
  FROM toks
)
SELECT doc_id, CAST(min(pos) AS INT) AS start_pos, token,
       CAST(count(*) AS INT) AS run_len
FROM grp GROUP BY doc_id, token, island
HAVING count(*) > 1
"""


# --- composed training-data pipeline ----------------------------------------


def q_clean_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data flow as ONE declarative DAG:
    quality-filter → exact-dedup (keep canonical rep) → tokenize →
    per-language corpus stats. Catalyst pipelines the filter into the
    scan and fuses the projections; the only shuffles are the dedup
    groupBy and the final per-lang aggregation.
    """
    from pleiades_spark.operators.corpus import quality_expr

    docs = _t(spark, sf_dir, "documents")
    # the ONE quality composite definition (shared with the batch corpus
    # builder, the streaming ingest, and their oracles) — an inline copy
    # here would silently diverge on a retune
    scored = docs.withColumn("q", quality_expr()).filter(
        (F.col("q") >= 0.5) & (F.col("n_chars") >= 60)
    )
    # exact dedup: canonical representative = min doc_id per text
    canonical = scored.groupBy("text", "lang").agg(
        F.min("doc_id").alias("doc_id")
    )
    return canonical.select(
        "lang", F.explode(tokens(F.col("text"))).alias("token")
    ).groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("token").alias("vocab"),
    )


ORACLE_CLEAN_CORPUS_PIPELINE = f"""
WITH scored AS (
  SELECT *, round(
      0.4 * (len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}))
    + 0.4 * (1 - {stopword_count_sql(_TOKS)} * 1.0 / len({_TOKS}))
    + 0.2 * least(len({_TOKS}) / 100.0, 1.0), 6) AS q
  FROM documents
), kept AS (
  SELECT * FROM scored WHERE q >= 0.5 AND n_chars >= 60
), canonical AS (
  SELECT text, lang, min(doc_id) AS doc_id FROM kept GROUP BY text, lang
)
SELECT lang, count(*) AS total_tokens, count(DISTINCT token) AS vocab
FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM canonical)
GROUP BY lang
"""


# =========================== multimodal ===================================


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via Arrow-batched mapInPandas
    (operators/multimodal.py). The oracle recomputes the byte-level
    features in SQL — identical because the fixture payload is the
    ASCII text's utf-8 bytes."""
    from pleiades_spark.operators.multimodal import extract_features

    feats = extract_features(_t(spark, sf_dir, "documents"))
    # array column serialized for the gate: engines stringify lists
    # differently, a scalar column hashes identically everywhere
    return feats.withColumn(
        "sample_frame_offsets",
        F.array_join(F.col("sample_frame_offsets"), "-"),
    )


ORACLE_MULTIMODAL_FEATURES = """
SELECT doc_id,
       CAST(n_bytes AS INT) AS n_bytes,
       hex(encode(substring(text, 1, 4))) AS header_hex,
       CAST(n_frames AS INT) AS n_frames,
       concat('0-', (n_frames // 2) * 256, '-', (n_frames - 1) * 256)
         AS sample_frame_offsets
FROM (
  SELECT doc_id, text, octet_length(encode(text)) AS n_bytes,
         greatest(1, CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT)) AS n_frames
  FROM documents
)
"""


def q_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding frame sampling (1→N mapInPandas): every 2nd 64-byte
    frame of each blob as its own row. The binary frame itself is
    projected to a hex prefix for the gate (engines hash binary columns
    differently; an 8-byte hex scalar is engine-neutral); the oracle
    replays the chunking with BLOB substring arithmetic."""
    from pleiades_spark.operators.multimodal import attach_blob, sample_frames

    frames = sample_frames(attach_blob(_t(spark, sf_dir, "documents")))
    return frames.select(
        "doc_id",
        "frame_idx",
        "n_bytes",
        F.upper(F.hex(F.expr("substring(frame, 1, 8)"))).alias("frame_head_hex"),
    )


# DuckDB has no BLOB substring; the fixture text is pure ASCII, so char
# slicing on the VARCHAR == byte slicing on its utf-8 encoding (the same
# equivalence ORACLE_MULTIMODAL_FEATURES relies on).
ORACLE_FRAME_SAMPLES = """
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
), idx AS (
  SELECT doc_id, text, n,
         unnest(range(0, CAST(ceil(n / 64.0) AS BIGINT), 2)) AS frame_idx
  FROM b
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(octet_length(encode(substring(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64))) AS INT)
         AS n_bytes,
       hex(encode(substring(text, CAST(frame_idx * 64 + 1 AS BIGINT), 8))) AS frame_head_hex
FROM idx
"""


ORACLE_DEDUP_KEEP_BEST = f"""
WITH cc AS ({ORACLE_DEDUP_CLUSTERS}),
q AS (SELECT doc_id, quality FROM ({ORACLE_TEXT_QUALITY}) tq),
j AS (SELECT cc.doc_id, cc.cluster, q.quality FROM cc JOIN q USING (doc_id)),
sizes AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n_members FROM cc GROUP BY cluster
)
SELECT r.cluster, r.doc_id AS kept_doc_id, r.quality AS kept_quality, s.n_members
FROM (
  SELECT *, row_number() OVER (PARTITION BY cluster
            ORDER BY quality DESC, doc_id ASC) AS rk
  FROM j
) r JOIN sizes s USING (cluster)
WHERE r.rk = 1
"""


ORACLE_DEDUP_KEEP_BEST_REPS = f"""
WITH cc AS (
  SELECT doc_id, rep_id AS cluster FROM ({ORACLE_DOC_DEDUP_REPS}) rr
),
q AS (SELECT doc_id, quality FROM ({ORACLE_TEXT_QUALITY}) tq),
j AS (SELECT cc.doc_id, cc.cluster, q.quality FROM cc JOIN q USING (doc_id)),
sizes AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n_members FROM cc GROUP BY cluster
)
SELECT r.cluster, r.doc_id AS kept_doc_id, r.quality AS kept_quality, s.n_members
FROM (
  SELECT *, row_number() OVER (PARTITION BY cluster
            ORDER BY quality DESC, doc_id ASC) AS rk
  FROM j
) r JOIN sizes s USING (cluster)
WHERE r.rk = 1
"""


QUERIES = [
    Query("dedup_exact", q_dedup_exact, ORACLE_DEDUP_EXACT,
          "exact dedup via text-hash groupBy, deterministic representative"),
    Query("pq_quantization", q_pq_quantization, ORACLE_PQ_QUANTIZATION,
          "product quantization: 4 sub-centroid codes + error per vector"),
    Query("ivf_adc_knn", q_ivf_adc_knn, ORACLE_IVF_ADC_KNN,
          "IVFADC: coarse-quantizer bucket probe + PQ-coded ADC ranking"),
    Query("pq_adc_knn", q_pq_adc_knn, ORACLE_PQ_ADC_KNN,
          "ADC top-k over PQ codes (per-query LUT, integer-join scan)"),
    Query("dedup_incremental", q_dedup_incremental, ORACLE_DEDUP_INCREMENTAL,
          "LSH near-dup pairs touching the new increment only (nightly job)"),
    Query("dedup_minhash_lsh", q_dedup_minhash, ORACLE_DEDUP_MINHASH,
          "MinHash signatures → banded LSH → verified Jaccard pairs"),
    Query("dedup_simhash", q_dedup_simhash, ORACLE_DEDUP_SIMHASH,
          "32-bit SimHash, chunk blocking, Hamming ≤ 3 pairs"),
    Query("blocking_audit", q_blocking_audit, ORACLE_BLOCKING_AUDIT,
          "bucket-occupancy + exact candidate-volume audit of the blocking index"),
    Query("blocking_audit_prod", q_blocking_audit_prod, None,
          "the same audit over the xxhash64 production signature (bench twin)"),
    Query("dedup_simhash_wide", q_dedup_simhash_wide, ORACLE_DEDUP_SIMHASH_WIDE,
          "64-bit SimHash, 16-bit chunk blocking (corpus-scale twin)"),
    Query("dedup_simhash_wide_exact", q_dedup_simhash_wide_exact,
          ORACLE_DEDUP_SIMHASH_WIDE_EXACT,
          "64-bit SimHash, 1-bit-flip multi-probe: recall 1 vs BRUTE oracle"),
    Query("dedup_ngram_jaccard", q_dedup_ngram_jaccard, ORACLE_DEDUP_NGRAM_JACCARD,
          "exact blocked all-pairs shingle Jaccard (LSH ground truth)"),
    Query("dedup_embedding_cosine", q_dedup_embedding, ORACLE_DEDUP_EMBEDDING,
          "embedding cosine near-dup pairs (brute ground truth)"),
    Query("dedup_embedding_ivf", q_dedup_embedding_ivf, ORACLE_DEDUP_EMBEDDING_IVF,
          "embedding near-dup within IVF buckets (scale path, O(N²/K))"),
    Query("dedup_embedding_ivf2", q_dedup_embedding_ivf2,
          ORACLE_DEDUP_EMBEDDING_IVF2,
          "two-level IVF near-dup (coarse quantizer, Θ(n^(4/3)·d))"),
    Query("dedup_embedding_srp", q_dedup_embedding_srp, ORACLE_DEDUP_EMBEDDING_SRP,
          "cosine-LSH (signed random projections) near-dup, banded bucket join"),
    Query("dedup_embedding_reps", q_dedup_embedding_reps,
          ORACLE_DEDUP_EMBEDDING_REPS,
          "linear-output embedding dedup: SRP star edges + CC → (vec, rep)"),
    Query("dedup_embedding_reps_incr", q_dedup_embedding_reps_incr,
          ORACLE_DEDUP_EMBEDDING_REPS_INCR,
          "incremental embedding reps: O(increment) SRP bucket work + one CC"),
    Query("dedup_embedding_reps_persisted", q_dedup_embedding_reps_persisted,
          ORACLE_DEDUP_EMBEDDING_REPS_INCR,
          "embedding nightly over the PERSISTED SRP star index (round 12)"),
    Query("doc_dedup_reps", q_doc_dedup_reps, ORACLE_DOC_DEDUP_REPS,
          "linear-output document dedup: MinHash star edges + CC → (doc, rep)"),
    Query("doc_dedup_reps_incr", q_doc_dedup_reps_incr,
          ORACLE_DOC_DEDUP_REPS_INCR,
          "incremental reps maintenance: O(increment) bucket work + one CC"),
    Query("doc_dedup_reps_persisted", q_doc_dedup_reps_persisted,
          ORACLE_DOC_DEDUP_REPS_INCR,
          "nightly reps over the PERSISTED parquet star index (round 12)"),
    Query("dedup_jaccard_prefix", q_dedup_jaccard_prefix,
          ORACLE_DEDUP_JACCARD_PREFIX,
          "exact Jaccard join via prefix filtering (recall-1 scale path)"),
    Query("dedup_containment", q_dedup_containment, ORACLE_DEDUP_CONTAINMENT,
          "exact directional containment join (sub-document duplication)"),
    Query("dedup_containment_lsh", q_dedup_containment_lsh,
          ORACLE_DEDUP_CONTAINMENT_LSH,
          "approximate containment via bottom-k MinHash sampling (scale path)"),
    Query("split_leakage_audit", q_split_leakage_audit,
          ORACLE_SPLIT_LEAKAGE_AUDIT,
          "near-dup pairs crossing the train/eval split (self-decontam)"),
    Query("langid_confusion", q_langid_confusion, ORACLE_LANGID_CONFUSION,
          "langid confusion matrix vs stored labels (classifier calibration)"),
    Query("jl_projection", q_jl_projection, ORACLE_JL_PROJECTION,
          "Johnson-Lindenstrauss 64d->16d frozen random projection (map-only)"),
    Query("collection_functions", q_collection_functions,
          ORACLE_COLLECTION_FUNCTIONS,
          "higher-order collection function breadth (transform/filter/exists/...)"),
    Query("textrank_keywords", q_textrank_keywords, ORACLE_TEXTRANK_KEYWORDS,
          "integer-exact TextRank keywords (5 PageRank iters, co-occurrence graph)"),
    Query("dedup_clusters", q_dedup_clusters, ORACLE_DEDUP_CLUSTERS,
          "iterative connected components over near-dup pairs (recursive CTE oracle)"),
    Query("dedup_clusters_star", q_dedup_clusters_star, ORACLE_DEDUP_CLUSTERS,
          "large-star/small-star connected components (diameter-independent rounds)"),
    Query("dedup_keep_best_reps", q_dedup_keep_best_reps,
          ORACLE_DEDUP_KEEP_BEST_REPS,
          "keep-best over the linear reps grain: full deduplicated keep-list"),
    Query("dedup_keep_best", q_dedup_keep_best, ORACLE_DEDUP_KEEP_BEST,
          "near-dup clusters keep the argmax-quality member (RefinedWeb rule)"),
    Query("knn_cosine_brute", q_knn_brute, ORACLE_KNN_BRUTE,
          "exact top-k cosine neighbors (broadcast queries × corpus scan)"),
    Query("hard_negatives", q_hard_negatives, ORACLE_HARD_NEGATIVES,
          "hard-negative mining: top-k similar with a different label"),
    Query("mmr_rerank", q_mmr_rerank, ORACLE_MMR_RERANK,
          "MMR diversified top-k: greedy relevance-vs-redundancy rerank "
          "over bounded candidate sets (unrolled-greedy oracle)"),
    Query("centroid_confusion", q_centroid_confusion, ORACLE_CENTROID_CONFUSION,
          "nearest-label-centroid classification confusion matrix (long form)"),
    Query("ivf_knn", q_ivf_knn, ORACLE_IVF_KNN,
          "IVF-bucketed approximate top-k (nprobe=1)"),
    Query("kmeans_lloyd", q_kmeans_lloyd, ORACLE_KMEANS_LLOYD,
          "deterministic Lloyd's k-means FIT: codebook + census, every "
          "iteration replayed (integer-exact centroid means)"),
    Query("text_quality_scores", q_text_quality, ORACLE_TEXT_QUALITY,
          "per-doc quality: TTR, stopword/digit ratios, composite score"),
    Query("gopher_repetition", q_gopher_repetition, ORACLE_GOPHER_REPETITION,
          "Gopher-style repetition filters: dup words, top bigram, dup 5-grams"),
    Query("quality_deciles", q_quality_deciles, ORACLE_QUALITY_DECILES,
          "per-language quality deciles via partitioned ntile + stats"),
    Query("lang_id_ngram", q_lang_id, ORACLE_LANG_ID,
          "character-trigram language ID vs profile codebook"),
    Query("lang_id_margin", q_lang_id_margin, ORACLE_LANG_ID_MARGIN,
          "langid top1-vs-top2 confidence margin + ambiguity flag"),
    Query("token_counts", q_token_counts, ORACLE_TOKEN_COUNTS,
          "whitespace + BPE-ish regex token counting"),
    Query("quality_classifier", q_quality_classifier, ORACLE_QUALITY_CLASSIFIER,
          "hashed linear quality classifier (hashing trick, frozen weights)"),
    Query("doc_fingerprints", q_fingerprints, ORACLE_FINGERPRINTS,
          "min-hash char-shingle fingerprint per doc"),
    Query("word_frequency_topk", q_word_freq_topk, ORACLE_WORD_FREQ_TOPK,
          "top-10 tokens per language"),
    Query("multimodal_features", q_multimodal_features, ORACLE_MULTIMODAL_FEATURES,
          "binary-column feature extraction via Arrow mapInPandas"),
    Query("frame_samples", q_frame_samples, ORACLE_FRAME_SAMPLES,
          "1-to-N frame sampling via row-expanding mapInPandas"),
    Query("doc_lang_enrichment", q_doc_lang_enrichment, ORACLE_DOC_LANG_ENRICHMENT,
          "langdim broadcast join with coalesce fallback chain"),
    Query("word_frequency_salted", q_word_freq_salted, ORACLE_WORD_FREQ_SALTED,
          "salted two-phase aggregation (skew path), salting-invariant result"),
    Query("clean_corpus_pipeline", q_clean_corpus_pipeline,
          ORACLE_CLEAN_CORPUS_PIPELINE,
          "composed flow: quality filter → dedup → tokenize → corpus stats"),
    Query("quality_pandas_udf", q_quality_pandas_udf, ORACLE_QUALITY_PANDAS_UDF,
          "Arrow-vectorized @pandas_udf scalar extension point"),
    Query("lang_stats_udaf", q_lang_stats_udaf, ORACLE_LANG_STATS_UDAF,
          "UDAF via grouped applyInPandas (one row per group)"),
    Query("token_runs_udtf", q_token_runs_udtf, ORACLE_TOKEN_RUNS_UDTF,
          "Python UDTF (lateral table function) vs gaps-and-islands oracle"),
]
