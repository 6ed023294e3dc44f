"""Edit-distance similarity join via segment-signature blocking (PassJoin).

The naive exact fuzzy join enumerates every in-block pair and runs
Levenshtein on each — quadratic within a block, which is the wall when
block cardinality is constant while the table grows (TPC-H p_brand has a
FIXED 25 values at every SF, so blocks grow linearly and pairs
quadratically). PassJoin (Li, Deng, Feng, "PassJoin: A Partition-based
Method for Similarity Joins", VLDB 2011 — public algorithm) replaces the
pair enumeration with an equi-join:

  pigeonhole  edit(a, b) <= d and b split into d+1 contiguous segments
              => >= 1 segment of b appears VERBATIM in a, at a start
              position within +-d of its position in b (a, b ASCII here;
              segments are substrings, so this holds per character edits)
  index       every string contributes its d+1 (j, segment) rows
  probe       every string emits, for each candidate partner length
              lb in [la-d, la+d] and each j, the substrings of a at the
              (at most 2d+1) window positions — O(1) rows per string,
              ~(2d+1)^2 * (d+1) worst case, independent of table size
  join        equi on (block, partner-length, j, segment text): candidate
              pairs only where a segment matches exactly
  verify      thresholded levenshtein(a, b, d) on the candidates

Every phase is linear in rows (the probe fan-out is a constant), the join
is hash-joinable, and the verify runs on near-output-sized candidates —
the same "band to an equi-join" move as the MinHash/SRP dedup operators,
applied to edit distance. False negatives are impossible (pigeonhole);
false positives die in the verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_bounds(length_col, j, d: int):
    """Start (0-based) and length of segment j of a string of the given
    length, split into d+1 contiguous segments, remainder spread over the
    FIRST (length % (d+1)) segments — the deterministic even split both
    the index and probe sides must agree on."""
    k = d + 1
    base = F.floor(length_col / k).cast("int")
    rem = (length_col % k).cast("int")
    start = (j * base + F.least(j, rem)).cast("int")
    seg_len = (base + F.when(j < rem, 1).otherwise(0)).cast("int")
    return start, seg_len


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    max_dist: int = 3,
) -> DataFrame:
    """All pairs within a block at Levenshtein distance <= max_dist.

    Returns (block, id_a, id_b, text_a, text_b, dist) with id_a < id_b —
    byte-identical to the quadratic blocked nested-loop form, without the
    quadratic pair enumeration.
    """
    d = max_dist
    k = d + 1
    base = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("sid"),
        F.col(text_col).alias("txt"),
        F.length(text_col).alias("slen"),
    )

    # --- index side: the d+1 segments of every string -------------------
    jdf = base.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(d))))
    b_start, b_len = _seg_bounds(F.col("slen"), F.col("j"), d)
    index = jdf.select(
        "blk",
        F.col("sid").alias("b_id"),
        F.col("txt").alias("b_txt"),
        F.col("slen").alias("lb"),
        "j",
        F.substring(F.col("txt"), b_start + 1, b_len).alias("seg"),
    ).filter(F.col("slen") >= k)

    # --- probe side: window substrings for every partner length --------
    probe = (
        base.withColumn(
            "lb",
            F.explode(F.sequence(F.col("slen") - d, F.col("slen") + d)),
        )
        .filter(F.col("lb") >= k)
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(d))))
    )
    p_start, p_len = _seg_bounds(F.col("lb"), F.col("j"), d)
    lo = F.greatest(p_start - d, F.lit(0))
    hi = F.least(p_start + d, F.col("slen") - p_len)
    probe = (
        probe.withColumn(
            # sequence(lo, hi) runs DESCENDING when lo > hi (it would
            # resurrect out-of-range positions) — emit an empty array so
            # explode drops the row instead.
            "pos",
            F.explode(
                F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
                    F.array().cast("array<int>")
                )
            ),
        )
        .select(
            "blk",
            F.col("sid").alias("a_id"),
            F.col("txt").alias("a_txt"),
            "lb",
            "j",
            F.substring(F.col("txt"), F.col("pos") + 1, p_len).alias("seg"),
        )
    )

    # --- candidate equi-join + exact verify -----------------------------
    cand = (
        probe.join(index, ["blk", "lb", "j", "seg"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "blk",
            F.least(
                F.struct(F.col("a_id").alias("pid"), F.col("a_txt").alias("ptxt")),
                F.struct(F.col("b_id").alias("pid"), F.col("b_txt").alias("ptxt")),
            ).alias("lo"),
            F.greatest(
                F.struct(F.col("a_id").alias("pid"), F.col("a_txt").alias("ptxt")),
                F.struct(F.col("b_id").alias("pid"), F.col("b_txt").alias("ptxt")),
            ).alias("hi"),
        )
        .distinct()
    )
    dist = F.levenshtein(F.col("lo.ptxt"), F.col("hi.ptxt"), d)
    verified = cand.filter(dist >= 0).select(
        F.col("blk").alias(block_col),
        F.col("lo.pid").alias("id_a"),
        F.col("hi.pid").alias("id_b"),
        F.col("lo.ptxt").alias("text_a"),
        F.col("hi.ptxt").alias("text_b"),
        dist.alias("dist"),
    )

    # Strings shorter than d+1 chars can't contribute k non-empty
    # segments, so the index drops them; short-vs-LONG pairs are still
    # found (the short side probes the long side's index), but
    # short-vs-short pairs would be silently missed. The short population
    # is bounded (< d+1 chars over the alphabet), so a naive in-block
    # join over just those rows is O(tiny²) and restores exactness.
    shorts = base.filter(F.col("slen") < k)
    sa, sb = shorts.alias("sa"), shorts.alias("sb")
    sdist = F.levenshtein(F.col("sa.txt"), F.col("sb.txt"), d)
    short_pairs = (
        sa.join(
            sb,
            (F.col("sa.blk") == F.col("sb.blk"))
            & (F.col("sa.sid") < F.col("sb.sid"))
            & (sdist >= 0),
        )
        .select(
            F.col("sa.blk").alias(block_col),
            F.col("sa.sid").alias("id_a"),
            F.col("sb.sid").alias("id_b"),
            F.col("sa.txt").alias("text_a"),
            F.col("sb.txt").alias("text_b"),
            sdist.alias("dist"),
        )
    )
    return verified.unionAll(short_pairs)
