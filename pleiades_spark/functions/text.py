"""Text-analysis column functions for the LLM-data-pipeline operators.

All pure built-in expressions (split/transform/aggregate/regexp_*) —
JVM-side, whole-stage-codegen'd, no Python in the hot path. Each has a
DuckDB twin (the *_sql constants/functions) used by the oracle harness.

Scale: per-row expression work parallelizes embarrassingly; the only
shuffles downstream are the aggregations/joins declared by the plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword list shared by quality scoring (frozen; must match _SQL twin).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
STOPWORDS_SQL = "['the','a','of','and','to','in','is','it']"

# BPE-ish token pattern: word pieces, digit runs, single punctuation.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (fixture text is lowercased single-spaced)."""
    return F.split(text, " ")


TOKENS_SQL = "string_split({t}, ' ')"


def word_shingles_from_tokens(toks: Column, text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles over a PRE-STAGED token-array column
    (round 13): the inline ``word_shingles(text)`` form references the
    split SIX times (two slice args, three size gates, the zip_with
    input) and Catalyst does not CSE across higher-order-function
    arguments, so a 600-token doc was re-split per reference in the
    staging scan — the single hottest stage of the doc dedup family
    (56 % of the sf100 cell). Hot paths stage ``tokens(text)`` as a
    real multi-referenced column (CollapseProject leaves it intact, the
    _with_dtoks precedent) and pass it here: measured 36.1 → 33.0 s
    median (−8.6 %) on the sf100 staging materialization, interleaved
    warmup+3-rep A/B, every rep ordered.

    Formulated as zip_with over shifted slices rather than
    ``transform(sequence, i -> slice(toks, i, n))``: a lambda body
    re-evaluates outer expressions PER ELEMENT, which would re-split the
    text O(tokens²) times. Here each slice is evaluated once per row;
    zip_with pads the shorter side with null and concat propagates it, so
    the trailing partial windows drop out in the filter. ``text`` is
    only the short-doc (< n tokens) fallback value.
    """
    assert n == 3, "shingle builder is specialized for n=3"
    pairs = F.zip_with(
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    tri = F.zip_with(toks, pairs, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.filter(tri, lambda x: x.isNotNull())),
    ).otherwise(F.array(text))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles; short docs fall back to the whole text.

    The shingle set is the dedup unit for MinHash / Jaccard — 3-word
    shingles are discriminative where raw token sets saturate (small
    vocabulary ⇒ most docs share most tokens).

    Convenience inline form — the token split re-evaluates per
    reference inside the builder (no CSE across HOF arguments), which
    is fine for one-shot callers; per-corpus staging scans use
    :func:`word_shingles_from_tokens` over a staged token column
    instead (same expression tree, bit-identical output).
    """
    return word_shingles_from_tokens(tokens(text), text, n)


def word_shingles_sql(t: str, n: int = 3) -> str:
    return (
        f"CASE WHEN len(string_split({t},' ')) >= {n} THEN "
        f"list_distinct(list_transform(range(0, len(string_split({t},' ')) - {n - 1}), "
        f"i -> array_to_string(string_split({t},' ')[i+1:i+{n}], ' '))) "
        f"ELSE [{t}] END"
    )


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams (fingerprinting / langid unit).

    ONE codegen'd regex pass (round 11): ``(?s)(?=(.{n}))`` captures the
    n chars at every position — java.util.regex advances one CODE POINT
    on an empty match, so this is exactly the old per-position substring
    walk. The previous form — ``transform(sequence, i -> substring(text,
    i, n))`` — was O(len²) per document (dynamic-position substring
    re-counts codepoints from the start, the CLAUDE.md substr invariant)
    PLUS an interpreted lambda per position; measured 4.5× slower than
    the regex at sf1 (2.17 s vs 0.48 s over 500k docs, identical output
    on every doc). Short docs (< n chars) fall back to the whole text;
    null stays null — both matching the old expression and the SQL twin.
    """
    return F.when(
        F.length(text) >= n,
        F.array_distinct(
            F.regexp_extract_all(text, F.lit(f"(?s)(?=(.{{{n}}}))"), 1)
        ),
    ).when(text.isNotNull(), F.array(text))


def char_shingles_sql(t: str, n: int = 5) -> str:
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(length({t}) - {n - 1}, 1) + 1), "
        f"i -> substring({t}, i, {n})))"
    )


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def stopword_count_sql(toks: str) -> str:
    return f"len(list_filter({toks}, t -> list_contains({STOPWORDS_SQL}, t)))"
