"""pleiades_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of gargath/pleiades, rebuilt Spark-first.

The reference (/root/reference, Go) is a three-personality streaming
aggregation pipeline (ingest → aggregate → serve) over the Wikimedia
recentchange stream. This package re-expresses that whole surface — plus
the LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) — as declarative Spark DataFrame / SQL / Structured
Streaming plans, letting Catalyst + Tungsten pick the physical strategy.

Layout:
  session        — tuned SparkSession builder
  catalog        — parquet table loaders for the driver fixtures
  functions/     — column-level derivations (counters, text, vectors)
  operators/     — composite operators (dedup, similarity, topk)
  plans/         — named end-to-end queries (pleiades parity, relational, llm)
  streaming/     — Structured Streaming pipelines (the reference's true shape)
"""

__version__ = "0.1.0"
