"""Simulate the external driver against `__spark_entry__` exactly as it
runs: a STOCK SparkSession (default-config `local[8]` builder — no
engine session factory, so none of our heap/shuffle/AQE defaults are
assumed), `entry()` smoke-checked, then a sample of DRIVER_WINDOW
queries value-compared against their DuckDB oracles at sf0.01.

Usage: python scripts/driver_sim.py [query ...]   (default: 5-query
representative sample of the current window)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

# representative window sample: relational DQ, binned non-equi join,
# ANN eval, windowed funnel, pipeline governance, plus two heavy graph/
# text shapes (graph_adamic_adar is in the round-9 window;
# text_coverage_curve went green in CORRECTNESS_r08) so the contract
# pytest exercises the heaviest registered shapes under the stock
# session every run
DEFAULT_SAMPLE = [
    "dq_benford_digits",
    "join_interval_overlap",
    "sim_bucket_purity",
    "events_funnel_windowed",
    "pipeline_dataset_card",
    "graph_adamic_adar",
    "text_coverage_curve",
]


def main() -> int:
    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or DEFAULT_SAMPLE
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    # entry smoke: runs, >= 0 rows, stable non-empty schema
    df = E.entry(spark)
    rows = df.collect()
    assert df.schema.fields, "entry() returned an empty schema"
    print(f"entry(): {len(rows)} rows, schema {df.schema.simpleString()}")

    qs, osql = E.queries(), E.oracle_sql()
    from the_movies_db_spark.queries import DRIVER_WINDOW

    assert list(qs)[:50] == list(DRIVER_WINDOW), "window ordering broken"
    missing = [n for n in names if n not in qs]
    assert not missing, f"not registered: {missing}"

    from the_movies_db_spark.testing import compare_query, duckdb_connection

    con = duckdb_connection(sf_dir)
    fails = 0
    for name in names:
        r = compare_query(spark, sf_dir, name, con)
        status = "OK " if r.ok else "FAIL"
        print(
            f"{status} {name:28s} spark={r.spark_rows} "
            f"oracle={r.oracle_rows} {r.detail}"
        )
        fails += 0 if r.ok else 1
    print(f"{len(names) - fails}/{len(names)} OK (stock session, {sf_dir})")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
