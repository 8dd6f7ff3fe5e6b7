"""Structure + correctness smoke for the query registry.

- every registered query builds a valid lazy plan (Spark analog of the
  reference's DagBag import tests, SURVEY §5) and executes at sf0.001;
- a representative subset is value-compared against DuckDB here (the
  FULL sweep runs via scripts/check_oracle.py at sf0.01 — the driver's
  own gate).
"""

from __future__ import annotations

import pytest

from the_movies_db_spark.queries import load_all
from the_movies_db_spark.testing import compare_query, duckdb_connection

REGISTRY = load_all()

ORACLE_SAMPLE = [
    "q01_pricing_summary",
    "q05_local_supplier",
    "upsert_merge",
    "events_sessionize",
    "window_topk_per_group",
    "set_except",
]


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_builds_and_runs(spark, sf_dir, name):
    df = REGISTRY[name].spark(spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_SAMPLE)
def test_oracle_sample_matches(spark, sf_dir, name, duck):
    res = compare_query(spark, sf_dir, name, duck)
    assert res.ok, f"{name}: {res.detail} mismatches={res.mismatches[:2]}"


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() >= 0
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) == len(REGISTRY)
