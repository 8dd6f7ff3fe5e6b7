"""Cold single-query timing (driver methodology): fresh JVM, warmup
tables, time ONE query end-to-end once, print seconds. Run the whole
script per measurement.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from the_movies_db_spark.io import TABLES, load_table
from the_movies_db_spark.queries import load_all
from the_movies_db_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("cold_one_r14")
spark.sparkContext.setLogLevel("ERROR")
registry = load_all()
for t in TABLES:
    load_table(spark, sf_dir, t).count()

name = sys.argv[1]
t0 = time.perf_counter()
registry[name].spark(spark, sf_dir).collect()
print(f"{name} {time.perf_counter() - t0:.3f}")
