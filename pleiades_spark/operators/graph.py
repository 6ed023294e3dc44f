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
