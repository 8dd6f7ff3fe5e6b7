"""Round-14 solo bench: time named queries with bench.py's exact
protocol (table warmup + codegen/pandas warmup, 3 collect-timed runs,
median) in a fresh session — the anchor-first discipline for A/B
adjudication. Usage:

    python scripts/solo_bench_r14.py name [name...]

Prints one JSON line {name: {"runs": [...], "median": s}, ...}.
Run strictly solo (no concurrent Spark work).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from the_movies_db_spark.io import TABLES, load_table
from the_movies_db_spark.queries import load_all
from the_movies_db_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("solo_bench_r14")
spark.sparkContext.setLogLevel("ERROR")
registry = load_all()
for t in TABLES:
    load_table(spark, sf_dir, t).count()

from pyspark.sql import functions as F

from the_movies_db_spark.operators.similarity import cosine_from_parts, norm

e1 = (
    load_table(spark, sf_dir, "embeddings")
    .limit(1)
    .select(F.col("embedding").alias("__a"), F.col("embedding").alias("__b"))
    .select("__a", "__b", norm("__a", 64).alias("__na"), norm("__b", 64).alias("__nb"))
)
e1.select(cosine_from_parts("__a", "__b", "__na", "__nb", dim=64)).collect()


def _identity(batches):
    yield from batches


spark.range(2).mapInPandas(_identity, "id long").count()

out = {}
for name in sys.argv[1:]:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        registry[name].spark(spark, sf_dir).collect()
        runs.append(round(time.perf_counter() - t0, 3))
    runs.sort()
    out[name] = {"runs": runs, "median": runs[1]}
    print(f"# {name}: {out[name]}", file=sys.stderr)
print(json.dumps(out))
