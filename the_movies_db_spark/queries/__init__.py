"""Query registry: every operator exposed to the driver harness.

Each entry pairs a PySpark implementation with a DuckDB-runnable
ANSI-SQL oracle (or ``None`` for genuinely non-SQL-expressible ops —
the driver then records a weaker rows-only check).

Contract (see /root/repo/__spark_entry__.py):
- the Spark callable takes ``(spark, sf_dir)`` and returns a lazy
  DataFrame;
- the oracle SQL runs against DuckDB views named after the test
  tables;
- column NAMES and VALUES must match — every computed column is
  aliased identically on both sides, and floating-point aggregates
  are rounded identically on both sides so the driver's value-hash is
  deterministic across engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module so their registrations run, then
    return the registry."""
    from the_movies_db_spark.queries import (  # noqa: F401
        dedup_queries,
        multimodal_queries,
        relational,
        similarity_queries,
        streaming_queries,
        surface_extra,
        text_queries,
        tpch_extra,
        udf_queries,
        upsert_queries,
    )

    return REGISTRY
