"""Training-corpus preparation operators over the ``documents`` table.

The operators a large-scale LLM-data pipeline runs between raw crawl and
tokenized shards: chunking, TF-IDF term scoring, stratified sampling,
deterministic train/val/test splitting, and PII scrubbing. All are pure
built-in-expression map/agg stages (no Python in the hot path); the
sampling/split operators use the md5-derived h32 (functions/hashing.py)
so membership is (a) stable across runs/engines — re-running the
pipeline on a grown corpus keeps prior assignments — and (b) replayable
by the DuckDB oracle bit-for-bit.

Scale notes:
  * chunking multiplies rows by ~docs×chunks_per_doc before any shuffle —
    it is a Generate inside the scan stage, no exchange at all;
  * TF-IDF is two shuffles (doc-term tf, term df) + one broadcast of the
    1-row corpus size — the df table is vocabulary-sized, NOT corpus-sized;
  * sampling/splitting are stateless filters on a hash — embarrassingly
    parallel, no shuffle, no RNG state to coordinate across executors
    (rand() would be non-reproducible across retries; a seeded hash is
    the only correct distributed sampler);
  * PII scrubbing is a regex map stage; patterns compile once per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pleiades_spark.functions.hashing import h32
from pleiades_spark.functions.text import (
    tokens,
    word_shingles,
    word_shingles_from_tokens,
)

CHUNK_SIZE = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def chunk_documents(
    docs: DataFrame, chunk_size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    chunk i covers tokens [i·stride, i·stride + chunk_size); the last
    chunk may be short. n_chunks = 1 + ceil((n_tok − chunk_size)/stride)
    for long docs, 1 otherwise — every token is covered, consecutive
    chunks overlap by (chunk_size − stride) tokens (context continuity
    for training windows).

    The token array is materialized ONCE per row before the explode
    (HOF-CSE rule, CLAUDE.md): posexplode over a sequence of chunk
    indices, then slice the pre-computed array.
    """
    toked = docs.select(
        "doc_id", "lang", "source", tokens(F.col("text")).alias("toks")
    ).withColumn("n_tok", F.size("toks"))
    n_chunks = F.greatest(
        F.lit(1),
        (
            F.floor(
                (F.col("n_tok") - chunk_size + stride - 1) / F.lit(stride)
            ).cast("int")
            + 1
        ),
    )
    return (
        toked.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn(
            "chunk", F.slice(F.col("toks"), F.col("chunk_idx") * stride + 1, chunk_size)
        )
        .select(
            "doc_id",
            "lang",
            "chunk_idx",
            F.size("chunk").alias("n_chunk_tokens"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k distinctive terms per document by smoothed TF-IDF.

    tf = term count within the doc; df = number of docs containing the
    term; idf = ln((N+1)/(df+1)) (add-one smoothing keeps corpus-wide
    terms finite). Plan: one explode → (doc, term) agg → term-level df
    agg (vocabulary-sized) joined back, corpus size N broadcast as a
    1-row frame. Ties break (score DESC, term ASC) for determinism.
    """
    terms = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # NOTE (r13, measured dead end): deriving df from tf
    # (tf.groupBy("term").count() — same rows by tf's distinct grain)
    # looked like it should drop one tokenize pass, but the tf subtree is
    # NOT exchange-reused at runtime and the paired A/B regressed 1.48×
    # at sf10 (neutral at sf0.1/sf1). Keep the direct distinct form.
    df_ = terms.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
                6,
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


# per-language keep-rate (percent): downsample the high-resource head,
# keep the low-resource tail — the standard corpus-balancing move.
SAMPLE_RATES = {"en": 20, "de": 60, "es": 60, "fr": 60, "zh": 100}
DEFAULT_RATE = 50


def sample_bucket(doc_id: Column, salt: str = "sample") -> Column:
    """Deterministic [0, 100) bucket for a document (md5-derived h32)."""
    return h32(F.concat(F.lit(salt + ":"), doc_id.cast("string"))) % 100


def stratified_sample(docs: DataFrame, rates: dict[str, int] | None = None) -> DataFrame:
    """Per-language deterministic downsampling.

    Membership depends only on (salt, doc_id) — NOT on partitioning, task
    retries, or corpus growth — so incremental pipeline runs keep their
    previous sample and the oracle can replay selection exactly.
    rand()-based sampling has none of these properties.
    """
    rates = SAMPLE_RATES if rates is None else rates
    rate = F.lit(DEFAULT_RATE)
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return docs.filter(sample_bucket(F.col("doc_id")) < rate).select(
        "doc_id", "lang", "source"
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Dataset-version diff: classify every doc_id across two corpus
    snapshots as added / removed / changed / unchanged — the audit step
    between training-set versions (what changed since the mix we trained
    on?).

    Full outer join on doc_id comparing md5(text) — the comparison ships
    a 32-char digest per row instead of the text itself, so the shuffle
    is key+digest-sized regardless of document length. At 100 TB both
    sides would pre-bucket on doc_id to make this a zipper join."""
    a = old.select("doc_id", F.md5(F.col("text")).alias("_ha"))
    b = new.select("doc_id", F.md5(F.col("text")).alias("_hb"))
    joined = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("_ha").isNull(), F.lit("added"))
        .when(F.col("_hb").isNull(), F.lit("removed"))
        .when(F.col("_ha") != F.col("_hb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select("doc_id", status.alias("status"))


MIX_BUDGET = 300  # document budget for the temperature mixture


def temperature_mixture(
    docs: DataFrame, budget: int = MIX_BUDGET
) -> tuple[DataFrame, DataFrame]:
    """Temperature-weighted language mixture sampling (T = 2, i.e.
    α = 1/T = 0.5): w_l ∝ p_l^0.5 — the standard rebalancing that
    up-samples tail languages relative to their natural share (used by
    every multilingual pretraining mixture since XLM-R).

    Returns (sampled_docs, lut). The lut is one row per language:
    natural count, mixture weight, target doc count for ``budget``,
    whole-epoch repeat count, and the 1/10000 fractional-epoch
    threshold. sampled_docs carries an ``epoch`` column: a doc selected
    for k full epochs plus the fractional pass appears k(+1) times —
    real up-sampling, not a rate capped at one pass. Selection is the
    deterministic (salt, doc_id) hash bucket — replayable,
    growth-stable, and partition-independent, like stratified_sample.

    α = 0.5 is computed via sqrt(), which IEEE-754 requires to be
    correctly rounded — both engines derive bit-identical weights from
    identical counts (pow() has no such guarantee across libms).

    Scale shape: two tiny aggs (per-lang counts, their sq-sum), one
    broadcast of the lang-cardinality lut, one map-side hash filter over
    the corpus. Nothing shuffles the documents themselves."""
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    c = counts.join(F.broadcast(total)).withColumn(
        "sq", F.sqrt(F.col("n_docs") / F.col("n_total"))
    )
    sq_sum = c.agg(F.sum("sq").alias("sq_sum"))
    # Up-sampling semantics: a tail language whose target exceeds its
    # natural count repeats whole epochs (n_epochs) plus a hash-sampled
    # fraction of one more — the way real mixtures oversample, rather
    # than silently capping at one pass.
    lut = (
        c.join(F.broadcast(sq_sum))
        .withColumn("weight", F.col("sq") / F.col("sq_sum"))
        .withColumn("target", F.col("weight") * F.lit(float(budget)))
        .withColumn(
            "n_epochs", F.floor(F.col("target") / F.col("n_docs")).cast("int")
        )
        .withColumn(
            "rate",
            F.col("target") / F.col("n_docs") - F.col("n_epochs"),
        )
        .withColumn("r10k", F.floor(F.col("rate") * 10000).cast("int"))
        .select("lang", "n_docs", "weight", "target", "n_epochs", "r10k")
    )
    bucket = (
        h32(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 10000
    )
    sampled = (
        docs.join(F.broadcast(lut.select("lang", "n_epochs", "r10k")), "lang")
        .withColumn(
            "_copies",
            F.col("n_epochs") + (bucket < F.col("r10k")).cast("int"),
        )
        .filter(F.col("_copies") > 0)  # BEFORE sequence: seq(0,-1) descends
        .withColumn("epoch", F.explode(F.expr("sequence(0, _copies - 1)")))
        .drop("_copies", "n_epochs", "r10k")
    )
    return sampled, lut


def quality_expr(text_col: str = "text") -> Column:
    """The corpus quality composite (type-token ratio + stopword ratio +
    length saturation), rounded to 6 — the single definition the batch
    builder, the streaming corpus ingest, and their oracles share. The
    keep rule everywhere is ``quality_expr() >= 0.5 AND n_chars >= 60``."""
    from pleiades_spark.functions.text import stopword_count

    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tok
    return F.round(
        0.4 * ttr
        + 0.4 * (1 - stopword_count(toks) / n_tok)
        + 0.2 * F.least(n_tok / 100, F.lit(1.0)),
        6,
    )


SPLIT_TRAIN, SPLIT_VAL = 80, 90  # train <80, val 80-89, test 90-99


def split_expr(doc_id: Column) -> Column:
    """The train/val/test bucket expression (80/10/10, salt='split') —
    the single definition every split consumer derives from, so the
    assignment can never drift between hash_split, decontaminate and
    the corpus builder."""
    bucket = sample_bucket(doc_id, salt="split")
    return (
        F.when(bucket < SPLIT_TRAIN, F.lit("train"))
        .when(bucket < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def hash_split(docs: DataFrame) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10).

    Same hash-bucket idea as sampling with an independent salt — a doc's
    split never changes as the corpus grows, the property that prevents
    silent train/test contamination across dataset versions.
    """
    return docs.select(
        "doc_id",
        "lang",
        split_expr(F.col("doc_id")).alias("split"),
    )


# Decontamination: a shingle present in more than this many eval docs is
# boilerplate, not leaked benchmark content — excluding it is both the
# standard false-positive filter AND the skew guard (ubiquitous shingles
# are exactly the hot join keys that would blow up the shuffle at scale).
DECONTAM_MAX_DF = 10


def decontaminate(docs: DataFrame, max_df: int = DECONTAM_MAX_DF) -> DataFrame:
    """Benchmark decontamination: flag train-split docs sharing any RARE
    word shingle with a test-split (held-out benchmark) document.

    The pipeline-critical cousin of near-dedup: before training, every
    doc that textually overlaps the eval set must be found and dropped,
    or the benchmark is compromised. Same split salt as hash_split, so
    membership is stable as the corpus grows.

    Plan shape at 100 TB: shingle the (small) eval side once, filter to
    rare shingles (df ≤ max_df within the eval set), then ONE equi-join
    on the shingle string against the train side's shingles — never an
    all-pairs comparison, and the df cutoff removes the skewed keys
    before they reach the exchange. Shingles are distinct per doc
    (word_shingles array_distincts), so no pre-join dedup pass.

    Returns one row per contaminated train doc: how many distinct rare
    shingles hit, across how many distinct eval docs.
    """
    split_docs = docs.withColumn("split", split_expr(F.col("doc_id")))

    def shingled(side: DataFrame) -> DataFrame:
        # staged tokens (r14): one split per row instead of ~6 inline
        return (
            side.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
            .select(
                "doc_id",
                F.explode(
                    word_shingles_from_tokens(F.col("toks"), F.col("text"))
                ).alias("sh"),
            )
        )

    eval_sh = shingled(split_docs.filter(F.col("split") == "test"))
    # df-filter via ONE window pass over the shingle key (r13): the r12
    # groupBy + self-join consumed eval_sh twice — each reference
    # re-scanned the full documents table (the split predicate is an
    # md5 expression, nothing pushes down) and re-exploded the eval
    # shingles. Same (sh, doc_id) row set, one exchange instead of two,
    # one scan instead of two; the eval side is benchmark-sized, so the
    # window sort is trivial.
    eval_rare = (
        eval_sh.withColumn(
            "df", F.count(F.lit(1)).over(W.partitionBy("sh"))
        )
        .filter(F.col("df") <= max_df)
        .select("sh", "doc_id")
    )
    train_sh = shingled(split_docs.filter(F.col("split") == "train"))
    # The eval side is a benchmark suite — tiny by definition — so it
    # BROADCASTS into the train scan: the train corpus's shingles never
    # shuffle (a sort-merge join here would exchange the full 100 TB
    # side to meet kilobytes of eval shingles).
    hits = train_sh.join(
        F.broadcast(eval_rare.withColumnRenamed("doc_id", "eval_doc_id")), "sh"
    )
    return hits.groupBy("doc_id").agg(
        F.countDistinct("sh").alias("n_hit_shingles"),
        F.countDistinct("eval_doc_id").alias("n_eval_docs"),
    )


# Token budget per packed training sequence (greedy first-fit-in-order).
PACK_BUDGET = 256

PACK_SCHEMA = "doc_id long, lang string, seq_id long, n_tok long"


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Greedy sequence packing: concatenate docs (in doc_id order, per
    language group) into training sequences of at most ``budget`` tokens;
    a doc that would overflow the open sequence starts a new one, and an
    oversized doc gets a sequence to itself.

    Packing is inherently sequential WITHIN a group — the seq_id of doc i
    depends on every doc before it — so the distributed contract is
    "sequential per group, parallel across groups": exactly what
    applyInPandas gives (one Arrow batch stream per group, groups spread
    over executors). At 100 TB the group key is the shard (thousands of
    groups), not the language; the algorithm is the same. Token counts
    are computed JVM-side before the Python stage so the pandas loop
    touches two int columns, never the text.
    """
    toked = docs.select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tok")
    )

    def _pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq, acc, ids = 0, 0, []
        for t in pdf["n_tok"]:
            t = int(t)
            if acc > 0 and acc + t > budget:
                seq += 1
                acc = 0
            acc += t
            ids.append(seq)
        pdf["seq_id"] = ids
        return pdf[["doc_id", "lang", "seq_id", "n_tok"]]

    return toked.groupBy("lang").applyInPandas(_pack, PACK_SCHEMA)


EOD_SEP = "<|eod|>"


def materialize_sequences(
    docs: DataFrame, packed: DataFrame, sep: str = EOD_SEP
) -> DataFrame:
    """Turn pack_sequences assignments into actual training sequences:
    one row per (lang, seq_id) with the member docs' texts concatenated
    in doc_id order around an end-of-document separator — what actually
    gets tokenized and written to shards.

    collect_list order is nondeterministic under parallel aggregation;
    sorting the collected (doc_id, text) structs (array_sort orders by
    the leading field) restores the packing order deterministically.
    One shuffle on (lang, seq_id); sequence size is budget-bounded by
    construction, so the collected arrays can't blow an executor."""
    joined = packed.join(docs.select("doc_id", "text"), "doc_id")
    return (
        joined.groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("seq_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s["text"],
                ),
                sep,
            ).alias("seq_text"),
        )
    )


# Shard count for the deterministic corpus shuffle (2^k so the hash mod
# is uniform); at 100 TB this is the training-shard count (thousands).
N_SHARDS = 16


def shuffle_shards(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """Deterministic global corpus shuffle into balanced shards.

    Training wants documents in a reproducible pseudo-random order,
    decorrelated from crawl/source order. shard = h32(doc_id) mod N is a
    stateless filter (no shuffle to ASSIGN); the within-shard position is
    a window ordered by an independent hash — so the sort is per-shard
    (each a 1/N slice), never a single global order. Both hashes are
    salt-derived from doc_id alone: the same doc lands in the same shard
    at the same relative position on every run and engine.
    """
    shard = h32(
        F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))
    ) % n_shards
    order = h32(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("shard_id").orderBy(F.col("ord"), F.col("doc_id"))
    return (
        docs.select(
            "doc_id",
            F.size(tokens(F.col("text"))).alias("n_tok"),
            shard.alias("shard_id"),
            order.alias("ord"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard_id", "pos", "n_tok")
    )


def build_training_corpus(
    docs: DataFrame, out_dir: str, n_shards: int = 4
) -> dict[str, int]:
    """The whole raw-crawl → training-shards flow as one job: quality
    gate → exact dedup → linear-output reps near-dedup (doc_dedup_reps,
    keep the best-quality member per cluster) → PII scrub → stable split
    → JSONL shards per split.

    Composes the already-gate-checked operators; this function only
    sequences them and writes. Returns per-stage survivor counts (the
    dataset-card numbers). Counts are driver-side aggregates (one number
    per stage), not data collection — the data path stays distributed
    end-to-end, and the JSONL write parallelism is n_shards per split.

    ONE-PASS stats (round 13): every per-stage dataset-card number rides
    the single materializing job as a CollectMetrics observation
    (``DataFrame.observe`` — accumulator-side, zero extra passes),
    instead of a ``.count()`` per stage that re-runs the whole upstream
    lineage. The survivors frame is persisted once after the split
    column, so the three per-split JSONL writes replay the cached rows,
    not the dedup pipeline. The old laps-per-stage protocol materialized
    the lineage ~11× (5 stage counts + 3 × (count + write)); at sf10
    this restructure took the personality from 75.8 s of stage walls to
    the single-pass number recorded in BENCH_SF100.md. Identical plans
    appearing twice under one action dedup their CollectMetrics node
    (verified — the observation fires once with the correct value even
    when the observed frame is both grouped and semi-joined against
    itself).
    """
    import time

    from pyspark.sql import Observation

    from pleiades_spark.operators.dedup import doc_dedup_reps
    from pleiades_spark.sources.jsonl import write_jsonl

    t_prev = time.time()

    def _lap(key: str) -> None:
        nonlocal t_prev
        now = time.time()
        stats[f"wall_{key}"] = round(now - t_prev, 1)
        t_prev = now

    stats: dict = {}
    n = F.count(F.lit(1)).alias("n")
    obs_input = Observation("corpus_input")
    obs_quality = Observation("corpus_quality")
    obs_exact = Observation("corpus_exact")
    obs_near = Observation("corpus_near")
    obs_pii = Observation("corpus_pii")

    docs = docs.observe(obs_input, n)

    # 1. quality gate (same composite as clean_corpus_pipeline, llm.py)
    kept = docs.withColumn("q", quality_expr()).filter(
        (F.col("q") >= 0.5) & (F.col("n_chars") >= 60)
    )
    kept = kept.observe(obs_quality, n)

    # 2. exact dedup: canonical representative = min doc_id per text
    reps = kept.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    kept = kept.join(reps.select("doc_id"), "doc_id", "left_semi")
    kept = kept.observe(obs_exact, n)

    # 3. near-dedup on the LINEAR reps contract (round 12): doc_dedup_reps
    # — band bucket-MIN star edges, Jaccard-verified, star CC — emits one
    # (doc_id, rep_id) decision per document with every stage linear in
    # n·bands. The pair grain this replaced (minhash_lsh_pairs →
    # iterative connected_components → keep min id) is Θ(Σ multiplicity²)
    # in its own output plus diameter-dependent CC: on a template-heavy
    # 100 TB crawl — exactly the multiplicity shape BENCH_SF100.md's
    # headline discovery documents — pair enumeration alone is ~10⁹ rows
    # at sf100, while the reps grain stays n. The kept representative is
    # the QUALITY argmax per cluster (q desc, doc_id asc tiebreak), not
    # min id: real corpus builds keep the best copy, and the quality
    # score is already in hand from stage 1.
    reps = doc_dedup_reps(kept)
    w = W.partitionBy("rep_id").orderBy(F.col("q").desc(), F.col("doc_id").asc())
    keepers = (
        reps.join(kept.select("doc_id", "q"), "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id")
    )
    kept = kept.join(keepers, "doc_id", "left_semi")
    kept = kept.observe(obs_near, n)

    # 4. PII scrub (audit counts folded into the stats)
    scrubbed = pii_scrub(kept)
    scrubbed = scrubbed.observe(
        obs_pii,
        F.sum(
            sum(F.col(f"n_{kind}") for kind, _, _ in PII_PATTERNS)
        ).alias("n"),
    )

    # 5. stable split column (inline expression — no self-join needed,
    # split_expr is the same single definition hash_split serves), then
    # persist + count: the ONE job that runs the whole pipeline. Every
    # observation above resolves during it; the split writes below read
    # the cache.
    final = scrubbed.select(
        "doc_id",
        "lang",
        "source",
        F.col("scrubbed_text").alias("text"),
    ).withColumn("split", split_expr(F.col("doc_id")))
    final = final.persist()
    final.count()
    _lap("pipeline")

    stats["input"] = int(obs_input.get["n"])
    stats["after_quality"] = int(obs_quality.get["n"])
    stats["after_exact_dedup"] = int(obs_exact.get["n"])
    stats["after_near_dedup"] = int(obs_near.get["n"])
    stats["pii_spans_scrubbed"] = int(obs_pii.get["n"] or 0)

    split_counts = {
        r["split"]: r["n"] for r in final.groupBy("split").agg(n).collect()
    }
    for split in ("train", "val", "test"):
        stats[f"{split}_docs"] = int(split_counts.get(split, 0))
        part = final.filter(F.col("split") == split).drop("split")
        write_jsonl(part, f"{out_dir}/{split}", n_shards=n_shards)
    _lap("split_write")
    final.unpersist()
    return stats


# PII patterns: pragmatic scrub set (emails, international-ish phone
# numbers, US SSNs, 16-digit card numbers). Order matters: cards before
# phones so a 16-digit run isn't half-eaten as a phone number.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b(?:\d[ -]?){15}\d\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}\b", "<PHONE>"),
)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII spans, keeping per-kind counts for audit.

    Each kind's count is taken on the text AFTER the previous kinds were
    replaced, so the counts partition the matched spans: a 16-digit card
    number that would also match the phone regex is counted once (as a
    card), not twice. Each intermediate stage lands in a real column
    (withColumn), so it's evaluated once per row and both the next count
    and the next replace read it — no re-derivation of the whole chain
    per stage.
    """
    out = docs
    prev = text_col
    stage_cols = []
    for kind, pattern, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(prev), F.lit(pattern))
        )
        stage = f"_pii_stage_{kind}"
        out = out.withColumn(stage, F.regexp_replace(F.col(prev), pattern, token))
        stage_cols.append(stage)
        prev = stage
    out = out.withColumn("scrubbed_text", F.col(prev))
    return out.drop(*stage_cols)


# --- per-domain caps (domain balancing) ----------------------------------

DOMAIN_CAP = 15  # gate configuration: max docs kept per source


def domain_cap(docs: DataFrame, cap: int = DOMAIN_CAP, key: str = "source") -> DataFrame:
    """Cap the number of documents kept per domain/source — the crawl-mix
    balancing step (a handful of boilerplate-heavy domains otherwise
    dominate the token budget).

    Selection is a deterministic per-domain rank on (h32(doc_id), doc_id)
    — replayable by the oracle and independent of partitioning/retries
    (rand()/limit is neither). Note the EXACT cap is rank-based, so a
    domain gaining a low-hash doc can rotate one previously-kept doc
    out; the hash-THRESHOLD variant below is the growth-stable one
    (membership depends only on the doc's own hash once a domain is at
    cap).

    Scale: ONE shuffle on the domain key; row_number sorts each domain's
    partition. A monster domain (10⁸ docs) makes that sort a straggler —
    there the two-phase form applies: aggregate per-domain counts
    (map-side combined), broadcast them, and filter on
    h32(doc_id) < 2³²·cap/n ≈ cap docs without any per-domain sort, at
    the cost of binomial noise around the cap. The exact windowed form
    here is the gate path; both select by the same hash so the
    approximate form converges on the exact one as cap/n → 1.
    """
    w = W.partitionBy(key).orderBy(
        h32(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("keep_rank", F.row_number().over(w))
        .filter(F.col("keep_rank") <= cap)
        .select("doc_id", F.col(key), "keep_rank")
    )


# --- weighted sampling without replacement -------------------------------

WEIGHTED_SAMPLE_K = 120  # gate configuration


def weighted_sample_topk(docs: DataFrame, k: int = WEIGHTED_SAMPLE_K) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    rank by key = ln(u)/w with u ∈ (0,1] deterministic per doc and
    w = n_chars, take the global top-k — each doc's inclusion probability
    is proportional to its weight, exactly the "sample by token count"
    step that turns a document corpus into a token-budgeted one.

    u comes from the md5-derived h32 (never 0: +1 shifts into (0, 2³²]),
    so the draw is reproducible across runs, engines, and retries — the
    distributed-sampler property rand() lacks; ln(u)/w is monotone in
    u^(1/w), avoiding a pow whose extreme exponents would underflow.

    Scale: the ranking key is a map-stage expression; top-k compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge of k), so
    no global sort and no shuffle of the corpus. ln/division parity with
    the oracle is ulp-exact (both engines' libm; precedent: the tf-idf
    and bigram-LM gates), and exact key ties are broken by doc_id
    identically on both sides.
    """
    u = (h32(F.col("doc_id").cast("string")) + 1) / F.lit(2.0 ** 32)
    key = F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(key, 6).alias("es_key_r"),
            key.alias("_key"),
        )
        .orderBy(F.col("_key").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "lang", "n_chars", "es_key_r")
    )


# --- cross-document duplicated spans -------------------------------------


def dup_span_stats(docs: DataFrame) -> DataFrame:
    """Per-document duplicated-span statistics: the fraction of a doc's
    distinct 3-word shingles that occur in other documents — the
    document-level signal behind substring-level corpus dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): docs past a threshold go to span-removal or drop.

    Plan: explode distinct shingles ONCE; document frequency is a window
    count over the shingle key (shingles are distinct within a doc, so
    per-shingle row count = df) — two exchanges total (shingle, then
    doc_id), where the groupBy-df + join-back form would re-run the
    explode for both join sides. At 100 TB the shuffle key is the
    shingle (hash it to 16 bytes if spans grow), and hot boilerplate
    shingles are exactly the rows this op exists to find — a window
    partition holds one shingle's postings, bounded by that shingle's
    df, not the corpus.
    """
    # staged tokens (r14): one split per row instead of ~6 inline
    sh = (
        docs.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.explode(
                word_shingles_from_tokens(F.col("toks"), F.col("text"))
            ).alias("sh"),
        )
    )
    return (
        sh.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("sh")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
        .withColumn(
            # small-denominator rational: x·10⁶ can land EXACTLY on .5
            # (e.g. n_shingles a power of two), where round() diverges
            # across engines — quantize with the floor form, identical
            # op order on the oracle side (CLAUDE.md / timeseries).
            "dup_frac",
            F.floor(
                (F.col("n_dup") / F.col("n_shingles")) * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0),
        )
    )


def remove_dup_spans(docs: DataFrame) -> DataFrame:
    """Corpus-level duplicated-span REMOVAL (the transformation behind
    dup_span_stats' diagnostic; Lee et al. 2022): every 3-word span that
    occurs more than once corpus-wide keeps its FIRST occurrence (min
    (doc_id, pos)) and loses the rest — covered tokens are stripped and
    the document reassembled.

    Plan: positional shingle occurrences (NOT distinct — removal needs
    every occurrence) explode in the scan; ownership is a window over the
    shingle key (count + first-occurrence rank in one shuffle); removed
    occurrences re-explode to covered token positions; a left-anti join
    drops them from the token stream; per-doc reassembly sorts the
    surviving (pos, token) pairs inside the row (sort_array on structs —
    collect_list order is partition-nondeterministic, the sort makes it
    total). Shuffle keys: shingle, then (doc_id, pos), then doc_id —
    never text blobs beyond the shingle string itself.

    r13 MEASURED DEAD END, kept as the codegen'd shape above: a
    row-local rewrite (covered positions aggregated to one array per
    doc, strip via array_except + transform/element_at rebuild — no
    token-stream shuffles after the ownership window) won 0.80×/0.78×
    at sf0.1/sf1 but REGRESSED 2.88× at sf10 (paired A/B: 24.0 s →
    69.3 s min) — the per-element INTERPRETED HOF rebuild over every
    kept token dwarfs the saved exchanges once docs×tokens grow, the
    exact trade CLAUDE.md's HOF invariant documents (HOFs only pay for
    avoided shuffles until the element count catches up). The anti-join
    + collect_list tail stays whole-stage-codegen'd at every scale.
    """
    toked = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).withColumn("n_tokens", F.size("toks"))
    occ = toked.filter(F.col("n_tokens") >= 3).select(
        "doc_id",
        # explode_OUTER (r14): the inferred Filter(size(transform(...))>0)
        # re-evaluated the whole positional-shingle construction per row
        # below this projection; n_tokens >= 3 guarantees a non-empty
        # array, so outer is row-identical. Paired A/B at sf10: 0.91x.
        F.explode_outer(
            F.expr(
                "transform(sequence(0, size(toks) - 3),"
                " i -> struct(i AS p, concat_ws(' ', slice(toks, i + 1, 3)) AS sh))"
            )
        ).alias("o"),
    ).select("doc_id", "o.p", "o.sh")
    wsh = W.partitionBy("sh")
    wrank = W.partitionBy("sh").orderBy(F.col("doc_id").asc(), F.col("p").asc())
    marked = occ.withColumn("cnt", F.count(F.lit(1)).over(wsh)).withColumn(
        "rk", F.row_number().over(wrank)
    )
    removed = marked.filter((F.col("cnt") > 1) & (F.col("rk") > 1))
    covered = (
        removed.select(
            "doc_id", F.explode(F.expr("sequence(p, p + 2)")).alias("pos")
        )
        .distinct()
    )
    # posexplode_OUTER (r14): plain posexplode infers
    # Filter(size(split(text))>0) which re-splits the text per row below
    # the toks projection; split() never yields an empty array and text
    # is non-null, so outer is row-identical. This filter was the 0.91x
    # the rule-exclusion A/B measured on this query at sf10.
    toks_pos = toked.select(
        "doc_id", "n_tokens", F.posexplode_outer("toks").alias("pos", "tok")
    )
    kept = toks_pos.join(covered, ["doc_id", "pos"], "left_anti")
    return (
        kept.groupBy("doc_id")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("kept_text"),
        )
        .withColumn("n_removed", F.col("n_tokens") - F.col("n_kept"))
        .select("doc_id", "n_tokens", "n_kept", "n_removed", "kept_text")
    )


VOCAB_SIZE = 256  # gate configuration
UNK_ID = 0


def vocab_encode(docs: DataFrame, vocab_size: int = VOCAB_SIZE) -> DataFrame:
    """Token→id encoding against a frozen frequency vocabulary — the last
    hop before integer training shards.

    The vocab is the corpus top-``vocab_size`` tokens by (count DESC,
    token ASC); ids are 1-based in that order, with 0 = <unk>. Encoding
    joins the BROADCAST vocab into the token stream (the corpus never
    shuffles to meet a lookup table), re-assembles per doc by row-local
    (pos, id) sort, and reports OOV accounting — the coverage metric that
    decides whether the vocab is big enough.

    Output: doc_id, n_ids, n_unk, ids_text (space-joined id string — the
    JSONL-shard-friendly serialization; an array column would also be
    banned by the gate contract).
    """
    toks_pos = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    )
    wv = W.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    vocab = (
        toks_pos.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("token_id", F.row_number().over(wv))
        .filter(F.col("token_id") <= vocab_size)
        .select("tok", "token_id")
    )
    enc = toks_pos.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("token_id"), F.lit(UNK_ID)).alias("tid"),
    )
    return (
        enc.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ids"),
            F.sum(F.when(F.col("tid") == UNK_ID, 1).otherwise(0)).alias("n_unk"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tid")))
                    ),
                    lambda s: s["tid"].cast("string"),
                ),
                " ",
            ).alias("ids_text"),
        )
    )


# Frozen Poisson(1) CDF thresholds on the h32 range [0, 2^32): k = number
# of thresholds below u. int(cdf(k)*2^32) for k=0..4; tail mass → k=5.
POISSON1_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373)
BOOT_B = 20


def bootstrap_mean_chars(docs: DataFrame, n_boot: int = BOOT_B) -> DataFrame:
    """Per-language Poisson-bootstrap confidence band for mean document
    length — the eval-tooling primitive (is lang A's mean REALLY above
    lang B's, or within resampling noise?).

    The classical distributed bootstrap (Chamandy et al., "Estimating
    Uncertainty for Massive Data Streams"): instead of drawing B
    resamples (impossible shuffles), each row gets an independent
    Poisson(1) replicate count per resample b — here DETERMINISTIC, from
    frozen integer CDF thresholds on h32('boot<b>:' + doc_id), so every
    engine, run, and retry draws the same resamples.

    Replicate means are exact integer ratios (Σk·n_chars / Σk) — no
    float summation order anywhere — and the band is ORDER STATISTICS of
    the B quantized means (2nd smallest / 2nd largest ≈ 90% for B=20),
    which are order-free. Plan: one Generate (×B), one agg on
    (lang, b), one vocabulary-sized window.
    """
    b_ids = F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("b")
    rows = docs.select("lang", "n_chars", "doc_id", b_ids)
    u = h32(
        F.concat(
            F.lit("boot"), F.col("b").cast("string"), F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    k = sum((u >= F.lit(t)).cast("int") for t in POISSON1_T)
    rep = rows.select("lang", "b", "n_chars", k.alias("k"))
    means = (
        rep.groupBy("lang", "b")
        .agg(
            F.sum(F.col("k") * F.col("n_chars")).alias("skc"),
            F.sum("k").alias("sk"),
        )
        .select(
            "lang",
            "b",
            F.floor(
                (F.col("skc") / F.col("sk")) * F.lit(10000.0) + F.lit(0.5)
            ).alias("m4"),
        )
    )
    wlo = W.partitionBy("lang").orderBy(F.col("m4").asc(), F.col("b").asc())
    ranked = means.withColumn("rn", F.row_number().over(wlo))
    base = docs.groupBy("lang").agg(
        F.floor(
            (F.sum("n_chars") / F.count(F.lit(1))) * F.lit(10000.0) + F.lit(0.5)
        ).alias("mean4")
    )
    lo = ranked.filter(F.col("rn") == 2).select("lang", F.col("m4").alias("lo4"))
    hi = ranked.filter(F.col("rn") == n_boot - 1).select(
        "lang", F.col("m4").alias("hi4")
    )
    return (
        base.join(lo, "lang")
        .join(hi, "lang")
        .select(
            "lang",
            (F.col("mean4") / 10000.0).alias("mean_chars"),
            (F.col("lo4") / 10000.0).alias("boot_lo"),
            (F.col("hi4") / 10000.0).alias("boot_hi"),
        )
    )
