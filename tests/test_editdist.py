"""PassJoin segment-signature edit-distance join vs the naive truth.

The pigeonhole argument (edit <= d => one of the d+1 index segments
matches verbatim at a nearby position) is easy to get subtly wrong at
the boundaries — remainder distribution in the split, window clipping,
strings shorter than d+1 chars. So: exhaustive equality against the
naive all-pairs join on a corpus built to hit those boundaries.
"""

import pytest
from pyspark.sql import functions as F

from pleiades_spark.operators.editdist import edit_distance_pairs


def _naive(df, d):
    a, b = df.alias("a"), df.alias("b")
    lev = F.levenshtein(F.col("a.txt"), F.col("b.txt"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.sid") < F.col("b.sid"))
            & (lev <= d),
        )
        .select(
            F.col("a.blk").alias("blk"),
            F.col("a.sid").alias("id_a"),
            F.col("b.sid").alias("id_b"),
            lev.cast("int").alias("dist"),
        )
    )


CORPUS = [
    # planted near-dup family (1-3 edits apart)
    "the quick brown fox jumps",
    "the quick brown fox jumps",      # 1 substitution
    "the quick brown fox jump",       # 1 deletion
    "thee quick brown fox jumps!",    # 2 edits
    "the quick brown cat jumps",      # 3 substitutions
    # identical texts under different ids
    "red bolt", "red bolt", "red rod", "tan rod",
    # lengths straddling the 4-way split remainder boundaries
    "abcd", "abce", "abcde", "abcdef", "abcdefg", "abcdefgh",
    # short strings (< d+1 chars): the dedicated short-short path
    "ab", "ac", "b", "xyz", "xy",
    # far-apart strings that must NOT pair
    "completely different sentence here",
    "zzzzzzzzzzzzzzzzzzzzzzzz",
]


@pytest.mark.parametrize("d", [1, 2, 3])
def test_passjoin_equals_naive(spark, d):
    rows = [(i, t, 1 if i % 2 == 0 else 2) for i, t in enumerate(CORPUS)]
    df = spark.createDataFrame(rows, "sid int, txt string, blk int")
    got = (
        edit_distance_pairs(df, "sid", "txt", "blk", d)
        .select("blk", "id_a", "id_b", "dist")
        .collect()
    )
    want = _naive(df, d).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 0  # the corpus must actually exercise matches


def test_passjoin_candidate_join_is_equi(spark):
    """The candidate stage must reach Catalyst as a hash-joinable
    equi-join on (block, length, segment index, segment text) — the whole
    point is never enumerating in-block pairs."""
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame(
        [(i, t, 1) for i, t in enumerate(CORPUS)], "sid int, txt string, blk int"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        edit_distance_pairs(df, "sid", "txt", "blk", 3).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    # the only nested-loop tolerated is none at all: the short-short
    # fallback joins on the block key, so it hashes too
    assert "BroadcastNestedLoopJoin" not in plan
