"""Named query registry.

Each plan module contributes ``Query`` objects: a Spark DataFrame builder
plus (when SQL-expressible) the equivalent DuckDB oracle SQL. The driver
harness (``__spark_entry__.py``) flattens these into its ``queries()`` /
``oracle_sql()`` contract.

Conventions (driver contract, __spark_entry__.py docstring):
  * every computed column is aliased IDENTICALLY in the Spark plan and the
    oracle SQL — the hash compare sorts columns by name;
  * double-typed aggregates are rounded (ROUND(x, 4)) on BOTH sides so
    summation-order float noise can't flip the value hash;
  * integer sums are cast to BIGINT in the oracle (DuckDB widens integer
    SUM to HUGEINT, Spark keeps LONG);
  * any top-k uses a deterministic total order (measure DESC, key ASC).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One named, driver-checkable query."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


def collect_queries() -> dict[str, Query]:
    """Flatten all plan modules' registries into one dict (name → Query)."""
    from pleiades_spark.plans import (
        analytics,
        corpus,
        llm,
        pleiades,
        relational,
        serving,
        streaming_batch,
    )

    out: dict[str, Query] = {}
    for mod in (pleiades, relational, llm, corpus, serving, streaming_batch,
                analytics):
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name {q.name!r}")
            out[q.name] = q
    return out
