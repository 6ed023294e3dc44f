"""Iterative graph operators: connected components for dedup clustering.

Near-dup detection yields PAIRS; pipeline consumers need CLUSTERS with a
canonical representative per cluster (keep one, drop the rest). That is
connected components — an inherently iterative algorithm, implemented as
driver-looped min-label propagation:

    label(v) ← min(label(v), min over neighbors' labels)   until fixpoint

Each iteration is one join + one aggregation (both shuffle on the node
id); convergence takes O(component diameter) iterations — near-dup
components are tiny (dozens of docs), so 3-5 iterations in practice.
``localCheckpoint`` truncates the lineage each round, or the plan tree
grows exponentially (the classic iterative-Spark trap); at cluster scale
use reliable ``checkpoint`` with a checkpoint dir instead. The
large-graph alternative (large-star/small-star, GraphX/GraphFrames) is
only needed when components span millions of nodes — not the dedup case.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 20
) -> DataFrame:
    """(src, dst) undirected edges → (doc_id, cluster) with cluster = min
    node id in the component. Nodes = every id appearing in an edge.
    """
    bi = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .cache()
    )
    labels = (
        bi.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            bi.join(labels, bi.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)  # truncate lineage per iteration
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # Exiting via exhaustion means some component has diameter >
        # max_iter and its labels are split across multiple clusters —
        # silently returning them would under-merge dedup groups.
        warnings.warn(
            f"connected_components did not converge in {max_iter} iterations; "
            "labels are partial (some components split). Raise max_iter or "
            "switch to a large-star/small-star implementation.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster"))


def connected_components_star(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 30
) -> DataFrame:
    """Large-star / small-star connected components (Kiveris, Lattanzi,
    Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
    and Beyond", SoCC 2014 — public algorithm): the escape hatch the
    min-label propagation docstring above promises for LARGE-DIAMETER
    components. Min-label needs O(diameter) rounds — a million-node chain
    at 100 TB never converges — while the alternating star operations
    contract every component to a star in O(log² n) rounds regardless of
    diameter (a 300-node path converges in ~6 rounds vs 299).

      large-star(u): connect every neighbor LARGER than u to the
                     minimum of u's neighborhood (including u)
      small-star(u): connect every neighbor not larger than u (and u)
                     to that minimum

    Each half-round is one groupBy(min) + one join — same shuffle grammar
    as everything else here, ``localCheckpoint`` per round to keep the
    lineage flat. Returns (doc_id, cluster) with cluster = min node id in
    the component — identical output contract (and values) to
    ``connected_components``; the recursive-CTE oracle can't tell them
    apart, which is exactly the point.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # large-star: group by u over BIDIRECTIONAL neighbors
        bi = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = bi.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            bi.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: group by the LARGER endpoint only
        smins = large.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        joined = large.join(smins, "u")
        small = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(joined.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # fixpoint: the canonical (hi, lo) edge sets are equal
        if (
            small.count() == e.count()
            and small.exceptAll(e).limit(1).count() == 0
        ):
            e = small
            break
        e = small
    else:
        warnings.warn(
            f"connected_components_star did not converge in {max_iter} "
            "rounds; labels may be partial.",
            RuntimeWarning,
            stacklevel=2,
        )
    # converged edge set is a star forest: (node, root) + the roots
    return (
        e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster"))
        .unionAll(
            e.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster"))
        )
        .groupBy("doc_id")
        .agg(F.min("cluster").alias("cluster"))
    )


# --- TextRank: PageRank over the word co-occurrence graph -----------------

TEXTRANK_SCALE = 10**12   # per-node rank in integer micro-units
TEXTRANK_DAMPING = 85     # d = 0.85 as integer percent
TEXTRANK_ITERS = 5
TEXTRANK_TOPK = 50


def textrank_keywords(
    docs: DataFrame,
    iters: int = TEXTRANK_ITERS,
    topk: int = TEXTRANK_TOPK,
) -> DataFrame:
    """Corpus keywords by TextRank (Mihalcea & Tarau 2004): weighted
    PageRank over the word co-occurrence graph (adjacent-word edges,
    symmetric, weight = co-occurrence count).

    ALL arithmetic is 64-bit integer — rank in TEXTRANK_SCALE units,
    damping as a percent, every division a floor `div`:

        r'_v = (15·S) div (100·N) + (85 · Σ_u (r_u · w_uv) div wdeg_u) div 100

    so the fixpoint iteration is bit-exact across engines (float PageRank
    sums in engine-dependent order would drift ulps per iteration and
    compound). Bounds: r ≤ S = 10¹², w ≤ 10⁶ fits r·w < 2⁶³ under ANSI.

    Scale shape: the rank table is vocabulary-sized; each iteration is
    one join (edges ⨝ ranks on src — AQE broadcasts the rank side when
    small) + one groupBy(dst) with map-side combine. A fixed iteration
    count keeps the lineage shallow (no checkpoint needed); corpus-sized
    data appears only in the one-off edge-building aggregation.
    """
    toks = docs.select(F.split("text", " ").alias("w"))
    adj = toks.select(
        F.explode(
            F.expr(
                "zip_with(slice(w, 1, greatest(size(w) - 1, 0)),"
                " slice(w, 2, greatest(size(w) - 1, 0)),"
                " (a, b) -> struct(a AS src, b AS dst))"
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    edges = (
        adj.unionAll(adj.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wdeg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"))
    ew = edges.join(wdeg, "src").cache()

    nodes = ew.select(F.col("src").alias("word")).distinct().cache()
    n = nodes.count()
    base = (15 * TEXTRANK_SCALE) // (100 * n)
    r0 = TEXTRANK_SCALE // n
    ranks = nodes.withColumn("r", F.lit(r0).cast("long"))
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew.src == ranks.word)
            .select(
                F.col("dst"),
                F.expr("(r * w) div wdeg").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("insum"))
        )
        ranks = contrib.select(
            F.col("dst").alias("word"),
            (F.lit(base) + F.expr(f"({TEXTRANK_DAMPING} * insum) div 100"))
            .cast("long")
            .alias("r"),
        )
    return (
        ranks.orderBy(F.col("r").desc(), F.col("word").asc())
        .limit(topk)
        .select("word", F.col("r").alias("rank_units"))
    )
