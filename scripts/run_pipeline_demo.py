"""End-to-end reference-pipeline demo (themovies.py parity, offline):

    fetch (paginated DataSource, synthetic transport)
      → clean (typed schema, native arrays, audit column)
      → upsert (null-safe MERGE into a parquet table)
      → drift (second load with an extra column + a type change)
      → query (top movies by vote average)

Runs fully offline in ~30 s: python scripts/run_pipeline_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from the_movies_db_spark.schema_evolution import check_schema_drift
from the_movies_db_spark.session import get_spark
from the_movies_db_spark.sources.rest_api import clean_movies
from the_movies_db_spark.sources.rest_datasource import PaginatedRestDataSource
from the_movies_db_spark.upsert import read_table, write_upsert


def main() -> None:
    spark = get_spark("pipeline_demo")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(PaginatedRestDataSource)
    target = tempfile.mkdtemp(prefix="movies_demo_") + "/movies"

    # 1. extract: every endpoint through the custom DataSource (D1 fan-out)
    frames = []
    for endpoint in ("popular", "top_rated", "now_playing", "upcoming"):
        df = (
            spark.read.format("paginated_rest")
            .option("url", f"https://api.example.test/3/movie/{endpoint}")
            .option("transport", "synthetic")
            .option("num_pages", 5)
            .option("pages_per_partition", 2)
            .load()
            .withColumn("endpoint", F.lit(endpoint))
        )
        frames.append(df)
    raw = frames[0]
    for f in frames[1:]:
        raw = raw.unionByName(f)
    print(f"extracted: {raw.count()} rows across 4 endpoints")

    # 2. transform + 3. load (MERGE keyed on id — re-runs never duplicate)
    cleaned = clean_movies(raw)
    write_upsert(spark, target, cleaned, pk="id")
    write_upsert(spark, target, cleaned, pk="id")  # idempotence
    print(f"loaded (2× upsert, idempotent): {read_table(spark, target).count()} rows")

    # 4. schema drift: new column + vote_count type change
    drifted = cleaned.withColumn("revenue", F.lit(1000000)).withColumn(
        "vote_count", F.col("vote_count").cast("double")
    )
    drift = check_schema_drift(drifted.schema, read_table(spark, target).schema)
    print(
        f"drift detected: +{[f.name for f in drift.columns_to_add]} "
        f"retyped {[(m.name, m.renamed_to) for m in drift.modified_cols]}"
    )
    write_upsert(spark, target, drifted, pk="id")

    # 5. query the evolved table
    final = read_table(spark, target)
    print("final schema:", [f.name for f in final.schema.fields])
    top = (
        final.groupBy("original_language")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("vote_average"), 2).alias("avg_vote"))
        .orderBy(F.desc("n"))
    )
    top.show(5, truncate=False)


if __name__ == "__main__":
    main()
