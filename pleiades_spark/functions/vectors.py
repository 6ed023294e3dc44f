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


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Σ aᵢ·bᵢ unrolled to a codegen'd fixed-width expression.

    Bit-identical to :func:`dot` — the sum associates left-to-right
    ((0.0 + a₁b₁) + a₂b₂) + … exactly like the fold, so every double
    (and the DuckDB list_inner_product twin) is unchanged — but with NO
    higher-order function: HOF lambdas are interpreted per element
    (CLAUDE.md invariant), which left 10⁹-pair verify joins
    compute-bound at ~2·dim interpreted lambda steps per pair at sf100.
    element_at chains stay inside whole-stage codegen. Requires every
    row's arrays to hold exactly ``dim`` elements — ANSI element_at
    raises past the end, a deliberate fail-fast on ragged embeddings
    (the fixed-dim contract every embedding operator already assumes).
    """
    out: Column = F.lit(0.0)
    for i in range(dim):
        out = out + F.element_at(a, i + 1) * F.element_at(b, i + 1)
    return out


def norm_fixed(a: Column, dim: int) -> Column:
    return F.sqrt(dot_fixed(a, a, dim))


def infer_dim(df, col: str = "v") -> int | None:
    """Static embedding width from the first row (one 1-row job); None
    on an empty frame — callers fall back to the interpreted fold."""
    rows = df.select(F.size(F.col(col)).alias("d")).limit(1).collect()
    return int(rows[0]["d"]) if rows else None


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
