"""Gate queries for the training-corpus operators (operators/corpus.py).

Every query has a DuckDB oracle twin; the hash-based sampling/splitting
oracles replay the md5-derived h32 (functions/hashing.py) so membership
matches bit-for-bit — determinism is the point of those operators, and
the gate proves it across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pleiades_spark import catalog
from pleiades_spark.functions.hashing import h32, h32_sql
from pleiades_spark.functions.text import tokens, word_shingles_sql
from pleiades_spark.operators.corpus import (
    CHUNK_SIZE,
    MIX_BUDGET,
    CHUNK_STRIDE,
    DECONTAM_MAX_DF,
    DEFAULT_RATE,
    N_SHARDS,
    PACK_BUDGET,
    SAMPLE_RATES,
    SPLIT_TRAIN,
    SPLIT_VAL,
    chunk_documents,
    decontaminate,
    hash_split,
    pack_sequences,
    sample_bucket,
    shuffle_shards,
    stratified_sample,
    tfidf_top_terms,
)
from pleiades_spark.operators.corpus import (
    DOMAIN_CAP,
    UNK_ID,
    VOCAB_SIZE,
    WEIGHTED_SAMPLE_K,
    domain_cap,
    dup_span_stats,
    bootstrap_mean_chars,
    remove_dup_spans,
    vocab_encode,
    weighted_sample_topk,
)
from pleiades_spark.plans import Query
from pleiades_spark.session import apply_runtime_confs


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    return catalog.load(spark, sf_dir, name)


# --- chunking ------------------------------------------------------------


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(_t(spark, sf_dir, "documents"))


ORACLE_DOC_CHUNKS = f"""
WITH toked AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
), chunked AS (
  SELECT doc_id, lang, toks, n_tok,
         unnest(range(0, greatest(1,
           CAST(floor((n_tok - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1) / {CHUNK_STRIDE}) AS INT) + 1
         ))) AS chunk_idx
  FROM toked
)
SELECT doc_id, lang, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(len(toks[chunk_idx * {CHUNK_STRIDE} + 1 : chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}]) AS INT)
         AS n_chunk_tokens,
       array_to_string(toks[chunk_idx * {CHUNK_STRIDE} + 1 : chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}], ' ')
         AS chunk_text
FROM chunked
"""


# --- TF-IDF --------------------------------------------------------------

TFIDF_K = 5


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(_t(spark, sf_dir, "documents"), TFIDF_K)


ORACLE_TFIDF_TOP_TERMS = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.term AS term, tf, df.df AS df,
         round(tf * ln((n_docs + 1) * 1.0 / (df.df + 1)), 6) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tf, df, score, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term ASC) AS rk
  FROM scored
) WHERE rk <= {TFIDF_K}
"""


# --- stratified sampling --------------------------------------------------

_RATE_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN lang = '{lang}' THEN {rate}" for lang, rate in sorted(SAMPLE_RATES.items())
    )
    + f" ELSE {DEFAULT_RATE} END"
)

_SAMPLE_BUCKET_SQL = (
    h32_sql("concat('sample:', CAST(doc_id AS VARCHAR))") + " % 100"
)
_SPLIT_BUCKET_SQL = h32_sql("concat('split:', CAST(doc_id AS VARCHAR))") + " % 100"


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(_t(spark, sf_dir, "documents"))


ORACLE_CORPUS_SAMPLE = f"""
SELECT doc_id, lang, source FROM documents
WHERE {_SAMPLE_BUCKET_SQL} < {_RATE_CASE_SQL}
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture (α = 0.5) per-language accounting: natural
    count, weight, target for the doc budget, sampling threshold, and
    the realized sampled count."""
    from pleiades_spark.operators.corpus import temperature_mixture

    sampled, lut = temperature_mixture(_t(spark, sf_dir, "documents"))
    n_sampled = sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))
    return (
        lut.join(n_sampled, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.round(F.col("weight"), 6).alias("weight"),
            F.round(F.col("target"), 4).alias("target"),
            "n_epochs",
            "r10k",
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
        )
    )


_MIX_BUCKET_SQL = h32_sql("concat('mix:', CAST(doc_id AS VARCHAR))") + " % 10000"

ORACLE_MIXTURE_SAMPLE = f"""
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT sum(n_docs) AS n_total FROM c),
s AS (SELECT lang, n_docs, sqrt(n_docs * 1.0 / n_total) AS sq FROM c, t),
ss AS (SELECT sum(sq) AS sq_sum FROM s),
lut AS (
  SELECT lang, n_docs, sq / sq_sum AS weight,
         sq / sq_sum * {float(MIX_BUDGET)} AS target,
         CAST(floor(sq / sq_sum * {float(MIX_BUDGET)} / n_docs) AS INT)
           AS n_epochs,
         CAST(floor((sq / sq_sum * {float(MIX_BUDGET)} / n_docs
                     - floor(sq / sq_sum * {float(MIX_BUDGET)} / n_docs))
                    * 10000) AS INT) AS r10k
  FROM s, ss
), samp AS (
  SELECT d.lang, count(*) AS n_frac
  FROM documents d JOIN lut USING (lang)
  WHERE {_MIX_BUCKET_SQL} < r10k
  GROUP BY d.lang
)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, round(weight, 6) AS weight,
       round(target, 4) AS target, n_epochs, r10k,
       CAST(n_docs * n_epochs + coalesce(n_frac, 0) AS BIGINT) AS n_sampled
FROM lut LEFT JOIN samp USING (lang)
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff gate: v2 is derived deterministically from
    the fixture (drop a 10% hash slice, append-modify a 10% slice, add a
    5% slice under shifted ids), then snapshot_diff classifies every id.
    Both engines rebuild the identical v2, so the per-doc statuses
    hash-match."""
    from pleiades_spark.functions.hashing import h32
    from pleiades_spark.operators.corpus import snapshot_diff

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def bucket(salt: str) -> F.Column:
        return h32(
            F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string"))
        ) % 100

    v2base = docs.filter(bucket("v2drop") >= 10).select(
        "doc_id",
        F.when(
            bucket("v2mod") < 10, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    v2new = docs.filter(bucket("v2add") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return snapshot_diff(docs, v2base.unionAll(v2new))


def _v2_bucket_sql(salt: str) -> str:
    return h32_sql(f"concat('{salt}:', CAST(doc_id AS VARCHAR))") + " % 100"


ORACLE_SNAPSHOT_DIFF = f"""
WITH v2base AS (
  SELECT doc_id,
         CASE WHEN {_v2_bucket_sql("v2mod")} < 10 THEN text || ' v2'
              ELSE text END AS text
  FROM documents WHERE {_v2_bucket_sql("v2drop")} >= 10
), v2new AS (
  SELECT doc_id + 100000 AS doc_id, text FROM documents
  WHERE {_v2_bucket_sql("v2add")} < 5
), v2 AS (SELECT * FROM v2base UNION ALL SELECT * FROM v2new),
a AS (SELECT doc_id, md5(text) AS ha FROM documents),
b AS (SELECT doc_id, md5(text) AS hb FROM v2)
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN ha IS NULL THEN 'added'
            WHEN hb IS NULL THEN 'removed'
            WHEN ha <> hb THEN 'changed'
            ELSE 'unchanged' END AS status
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
"""


EVAL_K = 10


def q_eval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-language deterministic sample — the eval-set builder
    (rate-based sampling gives a BINOMIAL count; an eval set needs an
    exact one). Ranking by the salted hash makes it a uniform sample
    that is stable under corpus growth *for the retained prefix*, and
    the per-lang row_number window is a partial top-k under AQE
    (WindowGroupLimit), never a global sort."""
    docs = _t(spark, sf_dir, "documents")
    full = h32(F.concat(F.lit("eval:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("lang").orderBy(full.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= EVAL_K)
        .select("doc_id", "lang", "rk")
    )


_EVAL_HASH_SQL = h32_sql("concat('eval:', CAST(doc_id AS VARCHAR))")

ORACLE_EVAL_SAMPLE = f"""
SELECT doc_id, lang, rk FROM (
  SELECT doc_id, lang,
         CAST(row_number() OVER (PARTITION BY lang
              ORDER BY {_EVAL_HASH_SQL} ASC, doc_id ASC) AS INT) AS rk
  FROM documents
) WHERE rk <= {EVAL_K}
"""


BPE_TOPK = 20


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE-training iteration: corpus-wide adjacent character
    pair frequencies, weighted by word frequency — the merge-candidate
    table a tokenizer trainer ranks each round.

    Scale shape: the corpus collapses to the VOCABULARY first (groupBy
    token with map-side combine — pair extraction then runs once per
    distinct word, not once per occurrence), pairs explode from each
    word's char sequence, and the final count is vocabulary-bounded.
    Top-k totally ordered (count DESC, pair ASC)."""
    docs = _t(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # length guard matters: sequence(1, 0) is DESCENDING [1, 0] in Spark
    # (range(1, 1) is empty in DuckDB) — 1-char tokens would fabricate
    # junk pairs without it
    pairs = wc.filter(F.length("token") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(token) - 1),"
                " i -> substring(token, i, 2))"
            )
        ).alias("pair"),
        "n",
    )
    from pleiades_spark.functions.ranking import global_topk

    counted = pairs.groupBy("pair").agg(F.sum("n").alias("n_occurrences"))
    return global_topk(
        counted, BPE_TOPK, F.col("n_occurrences").desc(), F.col("pair").asc(),
        rank_col="rk",
    ).select("pair", "n_occurrences", "rk")


ORACLE_BPE_PAIR_COUNTS = f"""
WITH wc AS (
  SELECT token, count(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
), pairs AS (
  SELECT unnest(list_transform(range(1, length(token)),
                i -> token[i : i + 1])) AS pair, n
  FROM wc
), counted AS (
  SELECT pair, CAST(sum(n) AS BIGINT) AS n_occurrences
  FROM pairs GROUP BY pair
)
SELECT pair, n_occurrences, rk FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair ASC)
                 AS INT) AS rk
  FROM counted
) WHERE rk <= {BPE_TOPK}
"""


def q_corpus_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        hash_split(_t(spark, sf_dir, "documents"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


ORACLE_CORPUS_SPLIT_COUNTS = f"""
SELECT CASE WHEN {_SPLIT_BUCKET_SQL} < {SPLIT_TRAIN} THEN 'train'
            WHEN {_SPLIT_BUCKET_SQL} < {SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split,
       lang, CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1, 2
"""


# --- bigram language-model counts ----------------------------------------

BIGRAM_K = 10


def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k bigrams per language — the n-gram LM counting stage.

    Bigrams come from zipping the token array with its shift — the array
    is computed once per row (HOF-CSE rule); the count is a map-side-
    combined agg on (lang, bigram), then a partitioned top-k.
    """
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("lang", tokens(F.col("text")).alias("toks")).withColumn(
        "n", F.size("toks")
    )
    bigrams = toked.select(
        "lang",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.col("n") - 1),
                F.slice(F.col("toks"), 2, F.col("n") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bigram"),
    )
    counted = bigrams.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BIGRAM_K)
        .select("lang", "bigram", "n", "rk")
    )


ORACLE_BIGRAM_COUNTS = f"""
WITH toked AS (
  SELECT lang, string_split(text, ' ') AS toks FROM documents
), bigrams AS (
  SELECT lang, unnest(list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM toked
), counted AS (
  SELECT lang, bigram, CAST(count(*) AS BIGINT) AS n
  FROM bigrams GROUP BY lang, bigram
)
SELECT lang, bigram, n, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
            ORDER BY n DESC, bigram ASC) AS rk
  FROM counted
) WHERE rk <= {BIGRAM_K}
"""


# --- corpus composition ---------------------------------------------------


def q_corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, lang) corpus accounting with share-of-total — the
    dataset-card table every training corpus ships with."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
        F.sum("n_chars").alias("sum_chars"),
    )
    total = docs.agg(F.count(F.lit(1)).alias("total_docs"))
    return (
        per.join(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_docs") / F.col("total_docs"), 6))
        .select("source", "lang", "n_docs", "n_tokens", "sum_chars", "share")
    )


ORACLE_CORPUS_COMPOSITION = """
WITH per AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY source, lang
), tot AS (SELECT count(*) AS total_docs FROM documents)
SELECT source, lang, n_docs, n_tokens, sum_chars,
       round(n_docs * 1.0 / total_docs, 6) AS share
FROM per, tot
"""


# --- quality percentile cut -----------------------------------------------


def q_quality_percentile_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality gate: keep docs above the 25th percentile of
    a quality proxy (type-token ratio) WITHIN their language.

    percent_rank over a per-language window — the idiomatic distributed
    quantile filter (no global sort, one shuffle on lang). Emits the
    survivors with their rank for auditability.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
    )
    w = W.partitionBy("lang").orderBy(F.col("ttr").asc(), F.col("doc_id").asc())
    return (
        scored.withColumn("pr", F.round(F.percent_rank().over(w), 6))
        .filter(F.col("pr") >= 0.25)
        .select("doc_id", "lang", "ttr", "pr")
    )


ORACLE_QUALITY_PERCENTILE_CUT = """
WITH scored AS (
  SELECT doc_id, lang,
         round(len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')), 6) AS ttr
  FROM documents
)
SELECT doc_id, lang, ttr, pr FROM (
  SELECT *, round(percent_rank() OVER (PARTITION BY lang
            ORDER BY ttr ASC, doc_id ASC), 6) AS pr
  FROM scored
) WHERE pr >= 0.25
"""


# --- repetition (boilerplate) metric ---------------------------------------


def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-trigram fraction per doc — the cheap boilerplate/spam
    signal (high repetition ⇒ templated or degenerate text). Pure map
    stage: 1 − distinct_shingles/total_shingles on the once-materialized
    shingle array."""
    from pleiades_spark.functions.text import word_shingles_from_tokens

    docs = _t(spark, sf_dir, "documents")
    # staged tokens (r14): one split per row feeds both the shingle
    # builder (~6 refs) and n_tok — was 7 splits per row inline
    toked = docs.select(
        "doc_id", "lang", "text", tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        "lang",
        word_shingles_from_tokens(F.col("toks"), F.col("text")).alias("sh"),
        F.size("toks").alias("n_tok"),
    )
    n_sh = F.greatest(F.col("n_tok") - 2, F.lit(1))  # total trigram windows
    return toked.select(
        "doc_id",
        "lang",
        F.round(1 - F.size("sh") / n_sh, 6).alias("repetition"),
    )


ORACLE_REPETITION_SCORES = """
SELECT doc_id, lang,
       round(1 - len(sh) * 1.0 / greatest(n_tok - 2, 1), 6) AS repetition
FROM (
  SELECT doc_id, lang,
         {shingles} AS sh,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
)
""".format(shingles=word_shingles_sql("text"))


# --- vocabulary statistics -------------------------------------------------


def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary accounting: vocab size, hapax count
    (tokens seen once — the Zipf tail that dominates tokenizer training
    decisions), and token totals. Two stacked aggs on the same lang key."""
    docs = _t(spark, sf_dir, "documents")
    terms = docs.select("lang", F.explode(tokens(F.col("text"))).alias("term"))
    per_term = terms.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    return per_term.groupBy("lang").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("hapax_count"),
        F.sum("n").alias("total_tokens"),
        F.max("n").alias("max_token_freq"),
    )


ORACLE_VOCAB_STATS = """
SELECT lang, CAST(count(*) AS BIGINT) AS vocab_size,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(max(n) AS BIGINT) AS max_token_freq
FROM (
  SELECT lang, term, count(*) AS n
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY lang, term
) GROUP BY lang
"""


# --- bigram-LM quality scoring (model-based filter) -------------------------


def q_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: per-language add-one-smoothed bigram
    LM fitted on the TRAIN split only, every doc scored by average
    negative log-likelihood — the CCNet-style filter where heuristic
    scores (text_quality_scores) stop working.

    Plan shape: the LM tables are vocabulary-bounded (unigram + bigram
    counts per language), NOT corpus-bounded — fit is two map-side-
    combined aggs over the train split; scoring explodes each doc's
    bigrams and joins the vocab-sized tables (broadcast at any corpus
    size where the vocab fits an executor, shuffle-join otherwise).
    Held-out split separation reuses the stable hash split, so the
    score is honest (no doc scores under a model trained on itself in
    val/test)."""
    docs = _t(spark, sf_dir, "documents")
    bucket = sample_bucket(F.col("doc_id"), salt="split")
    toked = docs.select(
        "doc_id",
        "lang",
        (bucket < SPLIT_TRAIN).alias("is_train"),
        tokens(F.col("text")).alias("toks"),
    ).withColumn("n", F.size("toks"))
    bigrams = toked.select(
        "doc_id",
        "lang",
        "is_train",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.col("n") - 1),
                F.slice(F.col("toks"), 2, F.col("n") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bigram"),
    ).withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))

    # The bigram table is vocabulary-bounded; localCheckpoint it so the
    # unigram table derives from the MATERIALIZED counts (Σ n_bg over
    # bigrams sharing a first word = that word's bigram-occurrence count,
    # by definition) instead of re-running the corpus scan + explode —
    # the r12 shape paid four full corpus passes (train_bg, train_ug,
    # vocab, scored); this is three, and the fourth's replacement groups
    # a vocab-sized table (guide §2.4).
    train_bg = (
        bigrams.filter("is_train")
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n_bg"))
        .localCheckpoint()
    )
    train_ug = (
        train_bg.groupBy(
            "lang", F.split(F.col("bigram"), " ").getItem(0).alias("w1")
        )
        .agg(F.sum("n_bg").alias("n_ug"))
    )
    vocab = (
        toked.filter("is_train")
        .select("lang", F.explode("toks").alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("v"))
    )
    scored = (
        # LM tables are vocabulary-bounded → broadcast explicitly; the
        # doc-bigram stream (corpus-bounded) must never shuffle to meet
        # them. Swap to plain joins only if the vocab outgrows executors.
        bigrams.join(F.broadcast(train_bg), ["lang", "bigram"], "left")
        .join(F.broadcast(train_ug), ["lang", "w1"], "left")
        .join(F.broadcast(vocab), "lang")
        .select(
            "doc_id",
            "lang",
            (
                -F.log(
                    (F.coalesce("n_bg", F.lit(0)) + 1)
                    / (F.coalesce("n_ug", F.lit(0)) + F.col("v"))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
    )


ORACLE_BIGRAM_LM_SCORES = f"""
WITH toked AS (
  SELECT doc_id, lang, {_SPLIT_BUCKET_SQL} < {SPLIT_TRAIN} AS is_train,
         string_split(text, ' ') AS toks
  FROM documents
), bigrams AS (
  SELECT doc_id, lang, is_train,
         unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM toked
), bg2 AS (
  SELECT *, string_split(bigram, ' ')[1] AS w1 FROM bigrams
), train_bg AS (
  SELECT lang, bigram, count(*) AS n_bg FROM bg2 WHERE is_train
  GROUP BY lang, bigram
), train_ug AS (
  SELECT lang, w1, count(*) AS n_ug FROM bg2 WHERE is_train GROUP BY lang, w1
), vocab AS (
  SELECT lang, count(DISTINCT tok) AS v
  FROM (SELECT lang, unnest(toks) AS tok FROM toked WHERE is_train)
  GROUP BY lang
)
SELECT b.doc_id AS doc_id, b.lang AS lang,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln((coalesce(n_bg, 0) + 1) * 1.0
                     / (coalesce(n_ug, 0) + v))), 6) AS avg_nll
FROM bg2 b
LEFT JOIN train_bg tb ON b.lang = tb.lang AND b.bigram = tb.bigram
LEFT JOIN train_ug tu ON b.lang = tu.lang AND b.w1 = tu.w1
JOIN vocab vv ON b.lang = vv.lang
GROUP BY b.doc_id, b.lang
"""


# --- benchmark decontamination ---------------------------------------------


def q_benchmark_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate(_t(spark, sf_dir, "documents"))


ORACLE_BENCHMARK_DECONTAM = f"""
WITH sp AS (
  SELECT doc_id, text,
         CASE WHEN {_SPLIT_BUCKET_SQL} < {SPLIT_TRAIN} THEN 'train'
              WHEN {_SPLIT_BUCKET_SQL} < {SPLIT_VAL} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), eval_sh AS (
  SELECT doc_id, unnest({word_shingles_sql('text')}) AS sh
  FROM sp WHERE split = 'test'
), rare AS (
  SELECT sh FROM eval_sh GROUP BY sh HAVING count(*) <= {DECONTAM_MAX_DF}
), train_sh AS (
  SELECT doc_id, unnest({word_shingles_sql('text')}) AS sh
  FROM sp WHERE split = 'train'
)
SELECT t.doc_id AS doc_id,
       CAST(count(DISTINCT t.sh) AS BIGINT) AS n_hit_shingles,
       CAST(count(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs
FROM train_sh t
JOIN rare r ON t.sh = r.sh
JOIN eval_sh e ON t.sh = e.sh
GROUP BY t.doc_id
"""


# --- sequence packing ------------------------------------------------------


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(_t(spark, sf_dir, "documents"))


# The oracle replays the greedy fold row-by-row with a recursive CTE —
# the SQL-expressible statement of "seq_id of doc i depends on all docs
# before it". Recursion depth = docs per group (bounded at gate SF).
ORACLE_SEQUENCE_PACKING = f"""
WITH RECURSIVE toked AS (
  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
), packed AS (
  SELECT lang, rn, doc_id, n_tok, CAST(0 AS BIGINT) AS seq_id, n_tok AS acc
  FROM toked WHERE rn = 1
  UNION ALL
  SELECT t.lang, t.rn, t.doc_id, t.n_tok,
         CASE WHEN p.acc + t.n_tok > {PACK_BUDGET}
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.acc + t.n_tok > {PACK_BUDGET}
              THEN t.n_tok ELSE p.acc + t.n_tok END
  FROM packed p JOIN toked t ON t.lang = p.lang AND t.rn = p.rn + 1
)
SELECT doc_id, lang, seq_id, n_tok FROM packed
"""


def q_sequence_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed assignments → concatenated training sequences (one row per
    (lang, seq_id) with the <|eod|>-joined member texts)."""
    from pleiades_spark.operators.corpus import materialize_sequences

    docs = _t(spark, sf_dir, "documents")
    return materialize_sequences(docs, pack_sequences(docs))


ORACLE_SEQUENCE_MATERIALIZE = f"""
SELECT p.lang AS lang, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS seq_tokens,
       string_agg(text, '<|eod|>' ORDER BY doc_id) AS seq_text
FROM ({ORACLE_SEQUENCE_PACKING.strip()}) p
JOIN documents USING (doc_id)
GROUP BY p.lang, seq_id
"""


# --- deterministic corpus shuffle into shards -------------------------------

_SHARD_SQL = h32_sql("concat('shard:', CAST(doc_id AS VARCHAR))") + f" % {N_SHARDS}"
_SHUFFLE_ORD_SQL = h32_sql("concat('shuffle:', CAST(doc_id AS VARCHAR))")


def q_corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shuffle_shards(_t(spark, sf_dir, "documents"))


ORACLE_CORPUS_SHUFFLE_SHARDS = f"""
SELECT doc_id, {_SHARD_SQL} AS shard_id,
       CAST(row_number() OVER (PARTITION BY {_SHARD_SQL}
            ORDER BY {_SHUFFLE_ORD_SQL}, doc_id) AS INT) AS pos,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tok
FROM documents
"""


# --- domain cap -----------------------------------------------------------


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (operators/corpus.domain_cap): keep at most
    DOMAIN_CAP docs per source by deterministic hash rank — the crawl-mix
    balancing step."""
    return domain_cap(_t(spark, sf_dir, "documents"))


ORACLE_DOMAIN_CAP = f"""
SELECT doc_id, source, keep_rank FROM (
  SELECT doc_id, source,
         CAST(row_number() OVER (
            PARTITION BY source
            ORDER BY {h32_sql("CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC
         ) AS INT) AS keep_rank
  FROM documents
) WHERE keep_rank <= {DOMAIN_CAP}
"""


# --- weighted sampling without replacement --------------------------------


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted top-k sample, weight = n_chars
    (operators/corpus.weighted_sample_topk): token-budget-proportional
    inclusion, reproducible across engines and retries."""
    return weighted_sample_topk(_t(spark, sf_dir, "documents"))


ORACLE_WEIGHTED_SAMPLE = f"""
SELECT doc_id, lang, n_chars,
       round(ln((h + 1) / 4294967296.0) / n_chars, 6) AS es_key_r
FROM (
  SELECT doc_id, lang, n_chars,
         {h32_sql("CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
)
ORDER BY ln((h + 1) / 4294967296.0) / n_chars DESC, doc_id ASC
LIMIT {WEIGHTED_SAMPLE_K}
"""


# --- duplicated spans -----------------------------------------------------


def q_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span fractions
    (operators/corpus.dup_span_stats): per-doc share of 3-word shingles
    that appear in other docs — the doc-level signal for substring-level
    dedup."""
    return dup_span_stats(_t(spark, sf_dir, "documents"))


ORACLE_DUP_SPAN_STATS = f"""
WITH sh AS (
  SELECT doc_id, unnest({word_shingles_sql("text")}) AS sh FROM documents
), dft AS (
  SELECT sh, count(*) AS df FROM sh GROUP BY sh
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN dft.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       floor((sum(CASE WHEN dft.df >= 2 THEN 1 ELSE 0 END)
              / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
FROM sh JOIN dft USING (sh)
GROUP BY doc_id
"""


# --- source-mixture divergence --------------------------------------------


def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's unigram distribution from the
    corpus distribution — the mixture-design diagnostic (which domains
    are lexically idiosyncratic vs redundant with the blend?).

    KL(P_s || Q) = sum_w P_s(w) * ln(P_s(w)/Q(w)); Q is the full-corpus
    distribution, so Q(w) > 0 wherever P_s(w) > 0 and the sum is always
    finite. Plan: one (source, word) count (map-side combined), one word
    count, one broadcast of the vocabulary-sized word table; the
    per-source sum shuffles vocabulary-sized rows. round(sum, 4) follows
    the house float-sum pattern (growth/tfidf gates).
    """
    docs = _t(spark, sf_dir, "documents")
    w = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    sw = w.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c_sw"))
    s_tot = sw.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    cw = w.groupBy("word").agg(F.count(F.lit(1)).alias("c_w"))
    n_tot = w.count()
    term = (
        sw.join(F.broadcast(cw), "word")
        .join(F.broadcast(s_tot), "source")
        .select(
            "source",
            "n_s",
            (
                (F.col("c_sw") / F.col("n_s"))
                * F.log(
                    (F.col("c_sw") / F.col("n_s"))
                    / (F.col("c_w") / F.lit(float(n_tot)))
                )
            ).alias("t"),
        )
    )
    return (
        term.groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.round(F.sum("t"), 4).alias("kl_nats"),
        )
    )


ORACLE_SOURCE_DIVERGENCE = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
), sw AS (
  SELECT source, word, count(*) AS c_sw FROM w GROUP BY source, word
), st AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM sw GROUP BY source),
cw AS (SELECT word, count(*) AS c_w FROM w GROUP BY word),
nt AS (SELECT count(*) * 1.0 AS n FROM w)
SELECT source,
       CAST(max(n_s) AS BIGINT) AS n_tokens,
       round(sum((c_sw * 1.0 / n_s)
                 * ln((c_sw * 1.0 / n_s) / (c_w / (SELECT n FROM nt)))), 4)
         AS kl_nats
FROM sw JOIN cw USING (word) JOIN st USING (source)
GROUP BY source
"""


# --- inverted index build -------------------------------------------------


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted-index postings: (word, doc_id, tf, first_pos)
    — the search-side index build over the corpus.

    Plan: ONE posexplode of the token array (positions are born in the
    scan stage, no join against a numbered copy), one
    groupBy(word, doc_id) with map-side combine. At scale the output is
    written bucketed/partitioned by word so term lookups prune to one
    bucket; posting rows, not arrays, keep the gate's no-array-columns
    rule and let downstream query engines page long posting lists.
    first_pos is 0-based token position.
    """
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", F.split("text", " ").alias("toks"))
    posts = toked.select(
        "doc_id", F.posexplode("toks").alias("pos", "word")
    )
    return posts.groupBy("word", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.min("pos").alias("first_pos"),
    )


ORACLE_INVERTED_INDEX = """
SELECT word, doc_id, CAST(count(*) AS BIGINT) AS tf,
       CAST(min(pos) AS INT) AS first_pos
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         unnest(range(0, len(string_split(text, ' ')))) AS pos
  FROM documents
)
GROUP BY word, doc_id
"""


# --- duplicated-span removal ----------------------------------------------


def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus duplicated-span removal
    (operators/corpus.remove_dup_spans): every 3-word span keeps only its
    first occurrence (min (doc_id, pos)); covered tokens strip out and
    documents reassemble deterministically."""
    return remove_dup_spans(_t(spark, sf_dir, "documents"))


ORACLE_DUP_SPAN_REMOVAL = """
WITH toked AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), occ AS (
  SELECT doc_id,
         unnest(list_transform(range(0, n_tokens - 2),
                i -> {'p': i,
                      'sh': array_to_string(toks[i + 1:i + 3], ' ')})) AS o
  FROM toked WHERE n_tokens >= 3
), marked AS (
  SELECT doc_id, o.p AS p, o.sh AS sh,
         count(*) OVER (PARTITION BY o.sh) AS cnt,
         row_number() OVER (PARTITION BY o.sh
                            ORDER BY doc_id ASC, o.p ASC) AS rk
  FROM occ
), covered AS (
  SELECT DISTINCT doc_id, unnest(range(p, p + 3)) AS pos
  FROM marked WHERE cnt > 1 AND rk > 1
), toks_pos AS (
  SELECT doc_id, n_tokens,
         unnest(toks) AS tok,
         unnest(range(0, n_tokens)) AS pos
  FROM toked
), kept AS (
  SELECT t.* FROM toks_pos t
  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.pos IS NULL
)
SELECT doc_id,
       CAST(max(n_tokens) AS INT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(max(n_tokens) - count(*) AS BIGINT) AS n_removed,
       string_agg(tok, ' ' ORDER BY pos ASC) AS kept_text
FROM kept
GROUP BY doc_id
"""


# --- vocabulary encoding --------------------------------------------------


def q_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen top-k frequency vocab, token→id encoding with OOV
    accounting (operators/corpus.vocab_encode)."""
    return vocab_encode(_t(spark, sf_dir, "documents"))


ORACLE_VOCAB_ENCODE = f"""
WITH tp AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         unnest(range(0, len(string_split(text, ' ')))) AS pos
  FROM documents
), vocab AS (
  SELECT tok, token_id FROM (
    SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS token_id
    FROM tp GROUP BY tok
  ) WHERE token_id <= {VOCAB_SIZE}
), enc AS (
  SELECT doc_id, pos, coalesce(token_id, {UNK_ID}) AS tid
  FROM tp LEFT JOIN vocab USING (tok)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_ids,
       CAST(sum(CASE WHEN tid = {UNK_ID} THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
       string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos ASC) AS ids_text
FROM enc
GROUP BY doc_id
"""


# --- Zipf rank-frequency fit ----------------------------------------------


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf fit: least-squares slope/intercept of
    ln(freq) ~ ln(rank) over the word frequency table — the sanity
    statistic that tells natural text (slope ≈ −1) from template spam
    before any model-based scoring.

    Closed-form OLS from five aggregate sums — one vocabulary-sized
    aggregation after the (lang, word) count; no iteration. Ranks are
    total-ordered (count DESC, word ASC) so both engines rank
    identically; ln-sum parity follows the KL/tfidf precedent, final
    round(4).
    """
    docs = _t(spark, sf_dir, "documents")
    wc = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wr = W.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("word").asc())
    xy = wc.withColumn("rk", F.row_number().over(wr)).select(
        "lang",
        F.log(F.col("rk").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    agg = xy.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return agg.select(
        "lang",
        F.col("n").alias("n_vocab"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round(intercept, 4).alias("zipf_intercept"),
    )


ORACLE_ZIPF_FIT = """
WITH wc AS (
  SELECT lang, word, count(*) AS cnt
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY lang, word
), xy AS (
  SELECT lang,
         ln(CAST(row_number() OVER (PARTITION BY lang
                 ORDER BY cnt DESC, word ASC) AS DOUBLE)) AS x,
         ln(CAST(cnt AS DOUBLE)) AS y
  FROM wc
), agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM xy GROUP BY lang
)
SELECT lang, n AS n_vocab,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4)
         AS zipf_intercept
FROM agg
"""


# --- Poisson bootstrap ----------------------------------------------------


def q_bootstrap_mean_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap band for per-language mean doc
    length (operators/corpus.bootstrap_mean_chars)."""
    return bootstrap_mean_chars(_t(spark, sf_dir, "documents"))


ORACLE_BOOTSTRAP_MEAN_CHARS = """
WITH rep AS (
  SELECT lang, b, n_chars,
         ((CASE WHEN u >= 1580030168 THEN 1 ELSE 0 END) + (CASE WHEN u >= 3160060337 THEN 1 ELSE 0 END) + (CASE WHEN u >= 3950075421 THEN 1 ELSE 0 END) + (CASE WHEN u >= 4213413783 THEN 1 ELSE 0 END) + (CASE WHEN u >= 4279248373 THEN 1 ELSE 0 END)) AS k
  FROM (
    SELECT lang, n_chars, doc_id, unnest(range(0, 20)) AS b,
           NULL AS _pad
    FROM documents
  ), LATERAL (SELECT CAST('0x' || substring(md5(concat('boot', CAST(b AS VARCHAR), ':', CAST(doc_id AS VARCHAR))), 1, 8) AS BIGINT) AS u)
), means AS (
  SELECT lang, b,
         floor((sum(k * n_chars) * 1.0 / sum(k)) * 10000.0 + 0.5) AS m4
  FROM rep GROUP BY lang, b
), ranked AS (
  SELECT lang, m4,
         row_number() OVER (PARTITION BY lang ORDER BY m4 ASC, b ASC) AS rn
  FROM means
), base AS (
  SELECT lang,
         floor((sum(n_chars) * 1.0 / count(*)) * 10000.0 + 0.5) AS mean4
  FROM documents GROUP BY lang
)
SELECT lang,
       mean4 / 10000.0 AS mean_chars,
       (SELECT m4 FROM ranked r WHERE r.lang = base.lang AND rn = 2)
         / 10000.0 AS boot_lo,
       (SELECT m4 FROM ranked r WHERE r.lang = base.lang AND rn = 20 - 1)
         / 10000.0 AS boot_hi
FROM base
"""


# --- distribution drift (PSI) ---------------------------------------------


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per language between dataset versions
    v1 (fixture) and v2 (the same deterministic derivation as
    snapshot_diff: drop a 10% hash slice, ' v2'-modify a 10% slice, add
    a 5% slice) — the monitoring gate a production pipeline runs before
    promoting a new corpus version: PSI < 0.1 stable, > 0.25 drifted.

    PSI = Σ_buckets (p − q)·ln(p/q) over frozen length-bucket edges.
    Counts land on a dense (lang × bucket) grid first, THEN shares get
    add-one smoothing (c+1)/(t+5) — always positive, so the log is
    always finite. Shares are exact integer ratios; the 5-term ln sum
    follows the KL/tfidf float precedent, round(4).
    """
    from pleiades_spark.functions.hashing import h32

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")

    def bucket(salt: str) -> F.Column:
        return h32(
            F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string"))
        ) % 100

    v2base = docs.filter(bucket("v2drop") >= 10).select(
        "doc_id",
        "lang",
        F.when(
            bucket("v2mod") < 10, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    v2new = docs.filter(bucket("v2add") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "lang", "text"
    )
    v2 = v2base.unionAll(v2new)

    # NOTE (r13 measured dead end): localCheckpoint'ing grid/dense to
    # collapse the repeated branches LOST in a paired A/B (1.20× at
    # sf0.1, 1.09× at sf1) — four checkpoint job barriers cost more
    # than re-running the cheap lang-grain counts. Left lazy.
    grid = (
        docs.select("lang").distinct()
        .crossJoin(spark.range(5).select(F.col("id").cast("int").alias("bucket")))
    )

    def shares(frame: DataFrame, name: str) -> DataFrame:
        b = F.least(F.floor(F.length("text") / 100), F.lit(4)).cast("int")
        cnt = (
            frame.select("lang", b.alias("bucket"))
            .groupBy("lang", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        dense = grid.join(cnt, ["lang", "bucket"], "left").select(
            "lang", "bucket", F.coalesce("c", F.lit(0)).alias("c")
        )
        tot = dense.groupBy("lang").agg(F.sum("c").alias("t"))
        return dense.join(tot, "lang").select(
            "lang", "bucket", ((F.col("c") + 1) / (F.col("t") + 5)).alias(name)
        )

    return (
        shares(docs, "p")
        .join(shares(v2, "q"), ["lang", "bucket"])
        .groupBy("lang")
        .agg(
            F.round(
                F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
                4,
            ).alias("psi")
        )
    )


ORACLE_PSI_DRIFT = """
WITH v1 AS (SELECT doc_id, lang, text FROM documents),
v2 AS (
  SELECT doc_id, lang,
         CASE WHEN CAST('0x' || substring(md5(concat('v2mod:', CAST(doc_id AS VARCHAR))), 1, 8) AS BIGINT) % 100 < 10 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE CAST('0x' || substring(md5(concat('v2drop:', CAST(doc_id AS VARCHAR))), 1, 8) AS BIGINT) % 100 >= 10
  UNION ALL
  SELECT doc_id + 100000, lang, text FROM documents WHERE CAST('0x' || substring(md5(concat('v2add:', CAST(doc_id AS VARCHAR))), 1, 8) AS BIGINT) % 100 < 5
),
grid AS (
  SELECT lang, bucket
  FROM (SELECT DISTINCT lang FROM documents),
       (SELECT unnest(range(0, 5)) AS bucket)
),
c1 AS (
  SELECT lang, least(CAST(floor(length(text) / 100) AS INT), 4) AS bucket,
         count(*) AS c
  FROM v1 GROUP BY 1, 2
),
c2 AS (
  SELECT lang, least(CAST(floor(length(text) / 100) AS INT), 4) AS bucket,
         count(*) AS c
  FROM v2 GROUP BY 1, 2
),
d1 AS (
  SELECT g.lang, g.bucket, coalesce(c, 0) AS c
  FROM grid g LEFT JOIN c1 ON g.lang = c1.lang AND g.bucket = c1.bucket
),
d2 AS (
  SELECT g.lang, g.bucket, coalesce(c, 0) AS c
  FROM grid g LEFT JOIN c2 ON g.lang = c2.lang AND g.bucket = c2.bucket
),
p AS (
  SELECT lang, bucket, (c + 1) * 1.0 / (sum(c) OVER (PARTITION BY lang) + 5) AS p
  FROM d1
),
q AS (
  SELECT lang, bucket, (c + 1) * 1.0 / (sum(c) OVER (PARTITION BY lang) + 5) AS q
  FROM d2
)
SELECT lang, round(sum((p - q) * ln(p / q)), 4) AS psi
FROM p JOIN q USING (lang, bucket)
GROUP BY lang
"""


# --- dataset fingerprint --------------------------------------------------


def q_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed dataset version id: md5 over the SORTED per-doc
    digests — the pin a dataset registry stores so "which corpus did
    this model train on?" has a one-line answer, and any mutation
    (doc added/dropped/edited) changes the id. Sorting makes the id
    partition- and order-independent. At 100 TB this becomes
    hierarchical (md5 of sorted per-shard md5s, shards reduced
    tree-wise); the single reduce here is the gate-scale form of the
    same contract."""
    docs = _t(spark, sf_dir, "documents")
    per_doc = docs.select(
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))
        ).alias("h")
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list("h")), "")
        ).alias("dataset_md5"),
    )


ORACLE_DATASET_FINGERPRINT = """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       md5(string_agg(h, '' ORDER BY h ASC)) AS dataset_md5
FROM (
  SELECT md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h FROM documents
)
"""


# --- per-document n-gram novelty -------------------------------------------


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's shingles
    first introduced by that doc (first = smallest doc_id carrying the
    shingle) — the cheap streaming-corpus proxy for "how much genuinely
    new text does this document add", used to rank crawl increments
    before expensive pairwise dedup.

    Plan (r13 restructure, guide §2.3): one shingle explode →
    min(doc_id) per shingle (map-side combined, shuffles 16-byte-ish
    shingle keys). Because word_shingles is DISTINCT per doc, a doc's
    novel-shingle count is exactly the number of first-seen entries that
    name it — so n_novel comes from grouping the |vocab|-row first-seen
    table by first_doc, and n_shingles is a map-only size() projection.
    The r12 shape instead equi-joined the first-seen table back onto the
    full OCCURRENCE stream and re-shuffled every occurrence by doc_id;
    now nothing occurrence-grained is ever shuffled twice. At 100 TB the
    shingle-min table is the same first-seen index an incremental dedup
    pipeline maintains anyway.
    """
    docs = _t(spark, sf_dir, "documents")
    from pleiades_spark.functions.text import word_shingles_from_tokens

    # tokens staged as a real column (r14, verdict item 4): the inline
    # word_shingles(text) form re-splits the text ~6x per row (no CSE
    # across HOF arguments); same expression tree, bit-identical output
    tok = (
        docs.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.explode(
                word_shingles_from_tokens(F.col("toks"), F.col("text"))
            ).alias("t"),
        )
    )
    first = tok.groupBy("t").agg(F.min("doc_id").alias("first_doc"))
    novel = first.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    # every doc emits ≥1 shingle (word_shingles falls back to the whole
    # text below n words), so the doc set matches the r12 join's exactly
    sizes = (
        docs.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.size(
                word_shingles_from_tokens(F.col("toks"), F.col("text"))
            ).cast("long").alias("n_shingles"),
        )
    )
    per = sizes.join(novel, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias("n_novel"),
    )
    nov = F.col("n_novel") / F.col("n_shingles")
    return per.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        (F.floor(nov * 10000 + F.lit(0.5)) / 10000).alias("novelty_r"),
    )


ORACLE_DOC_NOVELTY = f"""
WITH sh AS (
  SELECT doc_id, {word_shingles_sql("text")} AS sh FROM documents
), tok AS (
  SELECT doc_id, unnest(sh) AS t FROM sh
), first AS (
  SELECT t, min(doc_id) AS first_doc FROM tok GROUP BY t
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       floor(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1.0
             / count(*) * 10000 + 0.5) / 10000 AS novelty_r
FROM tok JOIN first USING (t)
GROUP BY doc_id
"""


# --- cross-source overlap (per-source MinHash) ------------------------------


def q_source_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated shingle-set Jaccard between every SOURCE pair from
    per-source MinHash signatures — the corpus-level contamination
    audit (which crawl feeds re-serve each other's content) that at
    100 TB must NOT be a cross-source shingle join: a shingle shared by
    k sources costs k² join rows, and boilerplate shared by all feeds
    makes that quadratic in practice.

    Sketch path instead: ONE scan folds every source's shingles into a
    NUM_PERM-slot signature (per-slot MIN is associative/commutative —
    map-side combined, duplicates irrelevant, so no distinct anywhere);
    the pair matrix is |sources|² over 12-long arrays — driver-trivial
    at any corpus size. md5-h32 permutations, so the oracle replays the
    signatures (and therefore the ESTIMATES, error included)
    bit-for-bit. Estimator: P(min slots agree) = J, so est =
    matching-slot fraction; ±1/√12 — a ranking signal, not a measure.
    """
    from pleiades_spark.functions.hashing import (
        MINHASH_PERMS,
        h32,
        perm_hash,
    )
    from pleiades_spark.functions.text import word_shingles_from_tokens

    docs = _t(spark, sf_dir, "documents")
    # staged tokens (r14): one split per row instead of ~6 inline
    tokh = (
        docs.select("source", "text", tokens(F.col("text")).alias("toks"))
        .select(
            "source",
            F.explode(
                word_shingles_from_tokens(F.col("toks"), F.col("text"))
            ).alias("t"),
        )
        .select("source", h32(F.col("t")).alias("h"))
    )
    sig = tokh.groupBy("source").agg(
        *[
            F.min(perm_hash(F.col("h"), a, b)).alias(f"m{i}")
            for i, (a, b) in enumerate(MINHASH_PERMS)
        ]
    )
    a = sig.alias("a")
    b = sig.alias("b")
    matches = sum(
        (F.col(f"a.m{i}") == F.col(f"b.m{i}")).cast("int")
        for i in range(len(MINHASH_PERMS))
    )
    est = matches / F.lit(float(len(MINHASH_PERMS)))
    return (
        a.join(b, F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            (F.floor(est * 10000 + F.lit(0.5)) / 10000).alias("est_jaccard"),
        )
    )


def _source_sig_sql() -> str:
    from pleiades_spark.functions.hashing import MINHASH_PERMS, perm_hash_sql

    mins = ", ".join(
        f"min({perm_hash_sql('h', a, b)}) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_PERMS)
    )
    return mins


def _source_match_sql() -> str:
    from pleiades_spark.functions.hashing import MINHASH_PERMS

    n = len(MINHASH_PERMS)
    terms = " + ".join(
        f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(n)
    )
    return f"({terms}) * 1.0 / {n}"


ORACLE_SOURCE_OVERLAP_MINHASH = f"""
WITH sh AS (
  SELECT source, {word_shingles_sql("text")} AS sh FROM documents
), tokh AS (
  SELECT source, {h32_sql("unnest(sh)")} AS h FROM sh
), sig AS (
  SELECT source, {_source_sig_sql()} FROM tokh GROUP BY source
)
SELECT a.source AS source_a, b.source AS source_b,
       floor({_source_match_sql()} * 10000 + 0.5) / 10000 AS est_jaccard
FROM sig a JOIN sig b ON a.source < b.source
"""


# --- cross-source KMV set operations ---------------------------------------


def q_kmv_source_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-shingle UNION / INTERSECTION / Jaccard estimates for
    every source pair from per-source KMV sketches
    (operators/sketch.kmv_group_sketch + kmv_pair_set_ops) — the
    cardinality twin of source_overlap_minhash: that query ranks pairs
    by estimated Jaccard; this one answers "how MANY distinct shingles
    do two crawl feeds share", the number a dedup budget actually
    needs. One scan builds |sources|·k sketch rows (salted two-stage
    k-min, no single-task-per-source sort); all pair algebra runs on
    those rows. md5-h32 hashing, so the oracle replays the estimates —
    error included — bit-for-bit.
    """
    from pleiades_spark.operators.sketch import (
        kmv_group_sketch,
        kmv_pair_set_ops,
    )
    from pleiades_spark.functions.text import word_shingles_from_tokens

    docs = _t(spark, sf_dir, "documents")
    # staged tokens (r14): one split per row instead of ~6 inline
    shingled = (
        docs.select("source", "text", tokens(F.col("text")).alias("toks"))
        .select(
            "source",
            F.explode(
                word_shingles_from_tokens(F.col("toks"), F.col("text"))
            ).alias("t"),
        )
    )
    sk = kmv_group_sketch(shingled, "source", F.col("t"))
    return kmv_pair_set_ops(sk).select(
        F.col("ga").alias("source_a"),
        F.col("gb").alias("source_b"),
        "est_union",
        "est_inter",
        "est_jaccard",
    )


ORACLE_KMV_SOURCE_SET_OPS = f"""
WITH sh AS (
  SELECT source, {word_shingles_sql("text")} AS sh FROM documents
), tokh0 AS (
  SELECT source, {h32_sql("unnest(sh)")} AS h FROM sh
), tokh AS (
  SELECT DISTINCT source, h FROM tokh0
), sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rn
    FROM tokh)
  WHERE rn <= 64
), pairs AS (
  SELECT a.source AS ga, b.source AS gb
  FROM (SELECT DISTINCT source FROM sk) a
  JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
), m AS (
  SELECT ga, gb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
    SELECT ga, gb, s.h, 1 AS in_a, 0 AS in_b
    FROM pairs JOIN sk s ON s.source = pairs.ga
    UNION ALL
    SELECT ga, gb, s.h, 0 AS in_a, 1 AS in_b
    FROM pairs JOIN sk s ON s.source = pairs.gb
  ) GROUP BY ga, gb, h
), l AS (
  SELECT * FROM (
    SELECT m.*, row_number() OVER (PARTITION BY ga, gb ORDER BY h ASC) AS rn
    FROM m)
  WHERE rn <= 64
), agg AS (
  SELECT ga, gb, count(*) AS n_l, max(h) AS h_k,
         sum(in_a * in_b) AS n_both
  FROM l GROUP BY ga, gb
), est AS (
  SELECT ga, gb,
         CASE WHEN n_l < 64 THEN CAST(n_l AS DOUBLE)
              ELSE (63.0 * 4294967296.0) / h_k END AS u,
         CAST(n_both AS DOUBLE) / n_l AS rho
  FROM agg
)
SELECT ga AS source_a, gb AS source_b,
       floor(u * 10000 + 0.5) / 10000 AS est_union,
       floor(rho * u * 10000 + 0.5) / 10000 AS est_inter,
       floor(rho * 10000 + 0.5) / 10000 AS est_jaccard
FROM est
"""


# --- DSIR importance resampling --------------------------------------------

# Hashed-feature bucket count for the DSIR importance estimator. Fixed
# regardless of corpus size — that bound is the whole point: the bucket
# n-gram models stay broadcast-sized at 100 TB.
DSIR_BUCKETS = 1024
# The "target distribution" slice the selector steers toward. A real
# deployment passes a curated high-quality corpus; the gate uses the
# English slice of the fixture so the oracle can replay membership.
DSIR_TARGET_LANG = "en"


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.,
    NeurIPS 2023, "Data Selection for Language Models via Importance
    Resampling"): score every raw document by how much more likely its
    hashed-unigram bag is under a TARGET distribution than under the raw
    pool, then keep the positively-weighted docs.

    Model: tokens hash into DSIR_BUCKETS buckets (hashing trick); both
    the target slice (lang = 'en' here; a curated corpus in production)
    and the raw pool get add-one-smoothed bucket unigram models; a doc's
    log importance weight is Σ_tok [ln p_target(b(tok)) − ln p_raw(b(tok))],
    summed with multiplicity (bag semantics, as in the paper).

    Scale shape: token explode → TWO bucket-count aggregations, each
    shuffling at most DSIR_BUCKETS=1024 rows (map-side combined — the
    key space is fixed by construction, not by corpus size); the λ
    lookup table is a ≤1024-row broadcast; per-doc scoring is the
    codegen'd explode ⋈ broadcast ⋈ groupBy(doc_id) shape (the langid
    lesson: beats a per-element HOF fold), and the doc_id shuffle moves
    ~1 partially-aggregated row per doc. Nothing here grows faster than
    the corpus scan at 100 TB. The paper's Gumbel-noise resampling step
    is a trivial extra column (h32-seeded) — the gate keeps the
    deterministic weight so the oracle replays it.

    Float parity: λ_b mirrors ln((c+1)·1.0/(T+B)) op-for-op in the
    oracle; the per-doc Σλ follows the house round(sum, 4) pattern
    (source_divergence/psi_drift precedent); `keep` compares the ROUNDED
    weight on both sides so the boolean can't diverge.
    """
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tk")
    ).select("doc_id", "lang", (h32(F.col("tk")) % DSIR_BUCKETS).alias("b"))
    raw = tok.groupBy("b").agg(F.count(F.lit(1)).alias("c_r"))
    tgt = (
        tok.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    tot = raw.agg(F.sum("c_r").alias("n_r")).crossJoin(
        tgt.agg(F.sum("c_t").alias("n_t"))
    )
    lam = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                    * 1.0
                    / (F.col("n_t") + DSIR_BUCKETS)
                )
                - F.log(
                    (F.col("c_r") + 1) * 1.0 / (F.col("n_r") + DSIR_BUCKETS)
                )
            ).alias("lam"),
        )
    )
    scored = (
        tok.join(F.broadcast(lam), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(F.sum("lam"), 4).alias("logw"),
        )
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_toks",
        "logw",
        (F.col("logw") > 0).alias("keep"),
    )


ORACLE_DSIR_IMPORTANCE = f"""
WITH tok AS (
  SELECT doc_id, lang,
         ({h32_sql('tk')}) % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tk
    FROM documents
  )
), raw AS (
  SELECT b, count(*) AS c_r FROM tok GROUP BY b
), tgt AS (
  SELECT b, count(*) AS c_t FROM tok
  WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
), tot AS (
  SELECT (SELECT sum(c_r) FROM raw) AS n_r,
         (SELECT sum(c_t) FROM tgt) AS n_t
), lam AS (
  SELECT raw.b,
         ln((coalesce(c_t, 0) + 1) * 1.0 / (n_t + {DSIR_BUCKETS}))
         - ln((c_r + 1) * 1.0 / (n_r + {DSIR_BUCKETS})) AS lam
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot
), scored AS (
  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_toks,
         round(sum(lam), 4) AS logw
  FROM tok JOIN lam ON tok.b = lam.b
  GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_toks, logw, (logw > 0) AS keep FROM scored
"""


QUERIES = [
    Query("doc_chunks", q_doc_chunks, ORACLE_DOC_CHUNKS,
          "overlapping token-window chunking (Generate, no shuffle)"),
    Query("doc_novelty", q_doc_novelty, ORACLE_DOC_NOVELTY,
          "per-doc first-seen n-gram novelty fraction (crawl-increment rank)"),
    Query("source_overlap_minhash", q_source_overlap_minhash,
          ORACLE_SOURCE_OVERLAP_MINHASH,
          "per-source MinHash signatures -> cross-source overlap matrix"),
    Query("kmv_source_set_ops", q_kmv_source_set_ops,
          ORACLE_KMV_SOURCE_SET_OPS,
          "per-source KMV sketches -> union/intersection cardinality "
          "estimates per source pair (salted two-stage k-min)"),
    Query("tfidf_top_terms", q_tfidf_top_terms, ORACLE_TFIDF_TOP_TERMS,
          "smoothed TF-IDF top-k distinctive terms per doc"),
    Query("corpus_sample", q_corpus_sample, ORACLE_CORPUS_SAMPLE,
          "deterministic hash-bucket stratified sampling per language"),
    Query("mixture_sample", q_mixture_sample, ORACLE_MIXTURE_SAMPLE,
          "temperature-weighted (α=0.5) language mixture sampling + lut"),
    Query("snapshot_diff", q_snapshot_diff, ORACLE_SNAPSHOT_DIFF,
          "dataset-version diff: added/removed/changed/unchanged per doc"),
    Query("bpe_pair_counts", q_bpe_pair_counts, ORACLE_BPE_PAIR_COUNTS,
          "BPE merge candidates: weighted char-pair counts over the vocab"),
    Query("eval_sample", q_eval_sample, ORACLE_EVAL_SAMPLE,
          "exactly-k-per-language deterministic sample (eval-set builder)"),
    Query("sequence_materialize", q_sequence_materialize,
          ORACLE_SEQUENCE_MATERIALIZE,
          "packed assignments -> <|eod|>-joined training sequences"),
    Query("corpus_split_counts", q_corpus_split_counts, ORACLE_CORPUS_SPLIT_COUNTS,
          "stable train/val/test hash split (contamination-proof)"),
    Query("bigram_counts", q_bigram_counts, ORACLE_BIGRAM_COUNTS,
          "bigram LM counts, top-k per language"),
    Query("corpus_composition", q_corpus_composition, ORACLE_CORPUS_COMPOSITION,
          "dataset-card accounting per (source, lang) with share-of-total"),
    Query("quality_percentile_cut", q_quality_percentile_cut,
          ORACLE_QUALITY_PERCENTILE_CUT,
          "per-language quantile quality gate via percent_rank"),
    Query("repetition_scores", q_repetition_scores, ORACLE_REPETITION_SCORES,
          "repeated-trigram boilerplate signal (pure map stage)"),
    Query("vocab_stats", q_vocab_stats, ORACLE_VOCAB_STATS,
          "per-language vocab size / hapax count / token totals"),
    Query("benchmark_decontam", q_benchmark_decontam, ORACLE_BENCHMARK_DECONTAM,
          "train docs leaking rare shingles from the held-out test split"),
    Query("sequence_packing", q_sequence_packing, ORACLE_SEQUENCE_PACKING,
          "greedy token-budget sequence packing (recursive-CTE oracle)"),
    Query("corpus_shuffle_shards", q_corpus_shuffle_shards,
          ORACLE_CORPUS_SHUFFLE_SHARDS,
          "deterministic hash shuffle into balanced training shards"),
    Query("bigram_lm_scores", q_bigram_lm_scores, ORACLE_BIGRAM_LM_SCORES,
          "per-doc avg NLL under train-split bigram LM (model-based filter)"),
    Query("domain_cap", q_domain_cap, ORACLE_DOMAIN_CAP,
          "per-source doc cap by deterministic hash rank (domain balancing)"),
    Query("weighted_sample", q_weighted_sample, ORACLE_WEIGHTED_SAMPLE,
          "Efraimidis-Spirakis weighted top-k sample (weight = n_chars)"),
    Query("dup_span_stats", q_dup_span_stats, ORACLE_DUP_SPAN_STATS,
          "per-doc duplicated 3-word-span fraction across the corpus"),
    Query("source_divergence", q_source_divergence, ORACLE_SOURCE_DIVERGENCE,
          "per-source unigram KL divergence from the corpus mixture"),
    Query("inverted_index", q_inverted_index, ORACLE_INVERTED_INDEX,
          "positional inverted-index postings (word, doc, tf, first_pos)"),
    Query("dup_span_removal", q_dup_span_removal, ORACLE_DUP_SPAN_REMOVAL,
          "duplicated 3-word spans stripped, first occurrence kept corpus-wide"),
    Query("vocab_encode", q_vocab_encode, ORACLE_VOCAB_ENCODE,
          "frozen top-k vocab token->id encoding with OOV accounting"),
    Query("zipf_fit", q_zipf_fit, ORACLE_ZIPF_FIT,
          "per-language Zipf slope/intercept (closed-form OLS on log-log)"),
    Query("bootstrap_mean_chars", q_bootstrap_mean_chars,
          ORACLE_BOOTSTRAP_MEAN_CHARS,
          "deterministic Poisson-bootstrap band (integer-exact means)"),
    Query("psi_drift", q_psi_drift, ORACLE_PSI_DRIFT,
          "PSI distribution drift between dataset versions (per language)"),
    Query("dataset_fingerprint", q_dataset_fingerprint,
          ORACLE_DATASET_FINGERPRINT,
          "content-addressed dataset version id (order-independent md5)"),
    Query("dsir_importance", q_dsir_importance, ORACLE_DSIR_IMPORTANCE,
          "DSIR hashed-ngram importance weights (bounded bucket models)"),
]
