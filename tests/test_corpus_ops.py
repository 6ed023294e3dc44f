"""Unit tests for the training-corpus operators: chunk coverage/overlap
invariants, split stability under corpus growth, PII scrubbing on a
synthetic corpus (the fixture text has no PII by construction), and the
JSONL interchange roundtrip including DuckDB readability."""

import duckdb

from pyspark.sql import functions as F

from pleiades_spark.operators.corpus import (
    chunk_documents,
    hash_split,
    pii_scrub,
    stratified_sample,
)
from pleiades_spark.sources.jsonl import read_jsonl, write_jsonl


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_chunking_covers_every_token_with_overlap(spark):
    words = [f"w{i}" for i in range(100)]
    docs = _docs(spark, [" ".join(words), "short doc"])
    chunks = chunk_documents(docs, chunk_size=32, stride=24).collect()
    long_chunks = sorted(
        (r.chunk_idx, r.chunk_text.split(" ")) for r in chunks if r.doc_id == 0
    )
    # 100 tokens, size 32, stride 24 → ceil((100-32)/24)+1 = 4 chunks
    assert [i for i, _ in long_chunks] == [0, 1, 2, 3]
    covered = set()
    for _, toks in long_chunks:
        covered.update(toks)
    assert covered == set(words)  # nothing dropped
    # consecutive chunks overlap by size - stride = 8 tokens
    assert set(long_chunks[0][1]) & set(long_chunks[1][1]) == set(words[24:32])
    # short doc → exactly one chunk, whole text
    (short,) = [r for r in chunks if r.doc_id == 1]
    assert short.chunk_idx == 0 and short.chunk_text == "short doc"


def test_hash_split_stable_under_corpus_growth(spark):
    small = _docs(spark, [f"doc number {i}" for i in range(50)])
    grown = _docs(spark, [f"doc number {i}" for i in range(200)])
    assign_small = {r.doc_id: r.split for r in hash_split(small).collect()}
    assign_grown = {r.doc_id: r.split for r in hash_split(grown).collect()}
    # the first 50 docs keep their assignment exactly — no contamination
    assert all(assign_grown[d] == s for d, s in assign_small.items())
    # all three splits are populated at n=200
    assert set(assign_grown.values()) == {"train", "val", "test"}


def test_stratified_sample_deterministic_and_stratified(spark):
    rows = [
        (i, f"text {i}", lang, "s", 10)
        for i, lang in enumerate(["en", "zh"] * 200)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    s1 = {r.doc_id for r in stratified_sample(docs).collect()}
    s2 = {r.doc_id for r in stratified_sample(docs).collect()}
    assert s1 == s2  # rerun-identical
    en = sum(1 for d in s1 if d % 2 == 0)
    zh = sum(1 for d in s1 if d % 2 == 1)
    assert zh == 200  # zh rate = 100%
    assert 0 < en < 100  # en rate = 20% of 200, hash noise allowed


def test_pii_scrub_synthetic(spark):
    docs = _docs(
        spark,
        [
            "contact alice@example.com or +1 555-123-4567 today",
            "ssn 123-45-6789 card 4111 1111 1111 1111 end",
            "clean document with no pii at all",
        ],
    )
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert got[0].n_email == 1 and got[0].n_phone == 1
    assert "<EMAIL>" in got[0].scrubbed_text and "<PHONE>" in got[0].scrubbed_text
    assert "alice@example.com" not in got[0].scrubbed_text
    assert got[1].n_ssn == 1 and got[1].n_card == 1
    # counts partition the spans: the 16-digit card also matches the phone
    # regex but must be counted once (card), not again as a phone
    assert got[1].n_phone == 0
    assert "<SSN>" in got[1].scrubbed_text and "<CARD>" in got[1].scrubbed_text
    assert "4111" not in got[1].scrubbed_text
    assert got[2].scrubbed_text == "clean document with no pii at all"
    assert got[2].n_email == got[2].n_phone == got[2].n_ssn == got[2].n_card == 0


def test_gopher_repetition_flags_boilerplate(spark, tmp_path, sf_dir):
    """Semantics, not just oracle parity: a template-dominated doc trips
    the repetitive flag; diverse text does not."""
    import pleiades_spark.catalog as catalog
    from pleiades_spark.plans.llm import q_gopher_repetition

    spam = "click here to win " * 40  # one 4-gram dominates everything
    clean = " ".join(f"w{i}" for i in range(160))  # all-distinct words
    docs = spark.createDataFrame(
        [(0, spam.strip(), "en", "t", len(spam)), (1, clean, "en", "t", len(clean))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(out)
    # route the query at the synthetic table via a fixture-shaped dir
    orig = catalog.load
    try:
        catalog.load = lambda spark, d, name, _o=orig: (
            spark.read.parquet(out) if name == "documents" else _o(spark, d, name)
        )
        got = {r.doc_id: r for r in q_gopher_repetition(spark, sf_dir).collect()}
    finally:
        catalog.load = orig
    assert got[0].repetitive and not got[1].repetitive
    assert got[0].dup_word_frac > 0.9 and got[1].dup_word_frac == 0.0
    assert got[0].top_bigram_count >= 39
    assert got[0].dup_5gram_char_frac > 0.5 and got[1].dup_5gram_char_frac == 0.0


def test_jsonl_roundtrip_and_duckdb_interchange(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs = _docs(spark, [f"jsonl doc {i}" for i in range(20)])
    write_jsonl(docs, out, n_shards=4)
    back = read_jsonl(
        spark, out, "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert sorted((r.doc_id, r.text) for r in back.collect()) == sorted(
        (r.doc_id, r.text) for r in docs.collect()
    )
    # shard count = requested parallelism
    import glob

    assert len(glob.glob(f"{out}/part-*")) == 4
    # the files are plain JSONL: DuckDB reads them directly
    n = duckdb.sql(f"SELECT count(*), min(doc_id) FROM read_json_auto('{out}/part-*')").fetchone()
    assert n == (20, 0)


def test_jsonl_malformed_line_permissive(spark, tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\nthis is not json\n{"doc_id": 2, "text": "ok2"}\n'
    )
    df = read_jsonl(spark, str(p), "doc_id long, text string")
    rows = df.collect()
    assert len(rows) == 3  # malformed row survives as nulls, not a crash
    assert sorted(r.doc_id for r in rows if r.doc_id is not None) == [1, 2]


def test_remove_dup_spans_semantics(spark):
    """A span duplicated across docs survives only in its first
    occurrence; unique text is untouched."""
    from pleiades_spark.operators.corpus import remove_dup_spans

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),
            (3, "zeta eta theta iota"),
            (4, "zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in remove_dup_spans(docs).collect()}
    # doc 1 owns "alpha beta gamma": keeps everything
    assert got[1]["kept_text"] == "alpha beta gamma delta"
    assert got[1]["n_removed"] == 0
    # doc 2 loses the duplicated span's coverage (tokens 0-2), keeps the rest
    assert got[2]["kept_text"] == "epsilon"
    assert got[2]["n_removed"] == 3
    # doc 3 is unique-first: untouched
    assert got[3]["kept_text"] == "zeta eta theta iota"
    # doc 4 is an exact copy — every token covered — and DROPS from the
    # output entirely (the r12 groupBy over an empty kept stream did
    # this implicitly; the r13 row-local rewrite must keep the contract)
    assert 4 not in got


def test_dsir_importance_separates_target_language(spark, sf_dir):
    """DSIR semantic invariant: docs from the TARGET slice (lang='en')
    must score higher on average than the rest — their hashed-unigram
    bags are, by construction, more likely under the target model. Also
    checks the weights are finite and per-doc token counts are real."""
    from pleiades_spark.plans.corpus import q_dsir_importance

    rows = q_dsir_importance(spark, sf_dir).collect()
    assert len(rows) == 500 or len(rows) > 0
    by_lang: dict[str, list[float]] = {}
    for r in rows:
        assert r["n_toks"] > 0
        assert r["logw"] == r["logw"]  # not NaN
        by_lang.setdefault(r["lang"], []).append(r["logw"])
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    en = mean(by_lang["en"])
    others = [mean(v) for k, v in by_lang.items() if k != "en"]
    assert all(en > o for o in others), (en, others)
    # and the keep flag is exactly the positive-weight rule
    for r in rows:
        assert r["keep"] == (r["logw"] > 0)


def test_build_training_corpus_keeps_best_quality_member(spark, tmp_path):
    """The e2e builder's near-dedup stage (round 12: doc_dedup_reps +
    quality argmax, replacing pair-grain LSH + keep-min-id) must keep the
    HIGHEST-quality member of a near-dup cluster — here the higher
    doc_id, which the old min-id rule would have discarded."""
    from pleiades_spark.operators.corpus import build_training_corpus

    body = " ".join(f"word{i:03d}" for i in range(200))
    # doc 0: 4 repeats of one extra token -> lower type-token ratio
    # doc 1: 4 distinct extra tokens -> higher quality, same shingle body
    rows = [
        (0, body + " alpha alpha alpha alpha"),
        (1, body + " beta gamma delta epsilon"),
        (2, " ".join(f"other{i:03d}" for i in range(150))),  # singleton
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tmp_path / "corpus_best"
    stats = build_training_corpus(docs, str(out), n_shards=1)
    assert stats["after_near_dedup"] == 2  # cluster collapsed + singleton
    kept_ids = set()
    for split in ("train", "val", "test"):
        if stats[f"{split}_docs"] > 0:  # empty split dir has no schema
            kept_ids |= {
                r.doc_id
                for r in spark.read.json(str(out / split))
                .select("doc_id")
                .collect()
            }
    assert 1 in kept_ids and 0 not in kept_ids and 2 in kept_ids
