"""Similarity search over the ``embeddings`` table.

Two paths:
  knn_brute   exact top-k cosine — broadcast the (small) query set against
              a single scan of the corpus; per-query top-k via window
              row_number. The baseline and the recall ground truth.
  ivf_knn     IVF-style approximate search — vectors are assigned to the
              nearest centroid of a fixed codebook; a query probes only its
              own centroid's bucket (nprobe=1).

Scale design: knn_brute is one corpus scan per query batch — O(N·Q·d)
compute, no shuffle except the final top-k (which AQE executes as partial
top-k per partition). ivf_knn turns that into O(N/K·Q·d) by bucketing: at
100 TB the bucket table is written partitioned by centroid_id so a query
touches only its probe partitions (partition pruning), and the codebook
comes from a k-means fit (pyspark.ml.clustering.KMeans) instead of the
deterministic fixture codebook used here for oracle reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pleiades_spark.functions.vectors import as_double, cosine


def knn_brute(
    emb: DataFrame, n_queries: int = 5, k: int = 8
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (vec_id < n_queries).

    Deterministic ranking: (cosine rounded to 6 DESC, vec_id ASC).
    """
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    queries = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        v.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("v")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def ivf_assign(emb: DataFrame, n_centroids: int = 16) -> DataFrame:
    """Assign every vector to its nearest centroid (argmax cosine).

    Codebook = the first n_centroids vectors (deterministic stand-in for a
    k-means fit, so the DuckDB oracle reproduces the assignment exactly).
    Ties break toward the lowest centroid_id.
    """
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    centroids = v.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    scored = v.crossJoin(F.broadcast(centroids)).withColumn(
        "ccos", F.round(cosine(F.col("v"), F.col("cv")), 6)
    )
    w = W.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "v", "centroid_id")
    )


def ivf_knn(
    emb: DataFrame, n_queries: int = 5, k: int = 5, n_centroids: int = 16
) -> DataFrame:
    """Approximate top-k: search only the query's own centroid bucket.

    nprobe=1 — recall < 1 by design; the operator contract is the bucketed
    plan shape, and the oracle reproduces the same approximation.
    """
    assigned = ivf_assign(emb, n_centroids).cache()
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("centroid_id").alias("qc"),
    )
    scored = (
        assigned.join(
            F.broadcast(queries),
            (F.col("centroid_id") == F.col("qc"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("v")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )
