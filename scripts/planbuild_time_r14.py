"""Time PLAN BUILD ONLY (registry[name].spark() — includes any
centroid-collect jobs that run at plan build) for named queries.
5 reps after one warmup build; prints medians. The ANN single-collect
fix lives entirely in plan build, so this isolates it from exec noise.
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
spark = get_spark("planbuild_r14")
spark.sparkContext.setLogLevel("ERROR")
registry = load_all()
for t in TABLES:
    load_table(spark, sf_dir, t).count()

out = {}
for name in sys.argv[1:]:
    registry[name].spark(spark, sf_dir)  # warm build
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        registry[name].spark(spark, sf_dir)
        runs.append(round(time.perf_counter() - t0, 3))
    runs.sort()
    out[name] = {"runs": runs, "median": runs[2]}
    print(f"# {name}: {out[name]}", file=sys.stderr)
print(json.dumps(out))
