"""Vector (embedding) column functions — built-in higher-order functions.

The fixture `embeddings.embedding` is ARRAY<FLOAT>; everything is cast to
double before arithmetic so Spark and the DuckDB oracle fold in the same
precision, and folds are left-to-right in both engines (bit-stable).

Scale: dot products over array columns run inside codegen — at 100 TB the
pattern is broadcast-the-queries × scan-the-corpus with per-partition
top-k; see operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + left fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


# MEASURED DEAD END (round 10): a fixed-width unrolled dot —
# Σ element_at(a,i)·element_at(b,i) as a flat expression, hoping to
# trade the interpreted HOF fold for whole-stage codegen — ran 15×
# SLOWER than the fold (74.9 s vs 4.6 s over 2M×64-dim rows): 128
# independent element_at trees each re-touch the array with null/
# bounds handling, while the fold materializes the zip_with product
# array once and loops tightly. The fold above IS the fast exact-order
# dot; at 10⁹-pair verify scale its cost is the floor of the bit-exact
# oracle contract (a BLAS/applyInPandas verify would be ~100× faster
# but sums in a different float order).


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB twins (list_inner_product folds left-to-right like F.aggregate).
def dot_sql(a: str, b: str) -> str:
    return f"list_inner_product({a}, {b})"


def cosine_sql(a: str, b: str) -> str:
    return (
        f"(list_inner_product({a}, {b}) / "
        f"(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b}))))"
    )


def attach_matrix(df, matrix, name: str = "_planes"):
    """Attach a constant double matrix as a broadcast one-row array column.

    Replaces ``F.lit(nested_list)`` for anything beyond a few hundred
    elements: the literal path converts ELEMENT-BY-ELEMENT over py4j at
    plan-construction time (measured 0.6-1.2 s of pure driver time for a
    16-40×64 plane matrix, 14 s for a 32k-word bitmap) and then re-ships
    inside every task binary; createDataFrame moves the same doubles in
    one Arrow batch and the broadcast goes once per executor. The
    crossJoin's build side is one row — a pointer attach
    (BroadcastNestedLoopJoin, no shuffle), and every value is the same
    Python float the literal would carry, so oracle parity is unchanged.

    Returns ``df`` with column ``name: array<array<double>>``.
    """
    spark = df.sparkSession
    mdf = spark.createDataFrame(
        [([list(r) for r in matrix],)], f"{name} array<array<double>>"
    )
    return df.crossJoin(F.broadcast(mdf))
