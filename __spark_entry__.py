"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real implementations live in ``the_movies_db_spark``; this module
is a thin adapter over its query registry
(``the_movies_db_spark.queries.load_all``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from the_movies_db_spark.queries import load_all  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q5-style star join (lineitem ⋈ orders ⋈ customer ⋈ supplier
    ⋈ nation ⋈ region) with broadcast dimensions — exercises scan,
    filter pushdown, broadcast hash joins, and hash aggregation in one
    plan.
    """
    return load_all()["q05_local_supplier"].spark(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
