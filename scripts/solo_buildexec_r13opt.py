"""Split plan-BUILD time (query function call: collects, literal
construction, analysis) from EXECUTION time (.collect() on the built
frame) for named queries — pinpoints whether a regression is plan-build
or data-plane. Protocol otherwise matches bench.py (warmups, 3 runs).
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from the_movies_db_spark.io import TABLES, load_table
from the_movies_db_spark.queries import load_all
from the_movies_db_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("solo_buildexec_r13opt")
spark.sparkContext.setLogLevel("ERROR")
registry = load_all()
for t in TABLES:
    load_table(spark, sf_dir, t).count()
from pyspark.sql import functions as F
from the_movies_db_spark.operators.similarity import cosine_from_parts, norm
e1 = (
    load_table(spark, sf_dir, "embeddings").limit(1)
    .select(F.col("embedding").alias("__a"), F.col("embedding").alias("__b"))
    .select("__a", "__b", norm("__a", 64).alias("__na"), norm("__b", 64).alias("__nb"))
)
e1.select(cosine_from_parts("__a", "__b", "__na", "__nb", dim=64)).collect()

out = {}
for name in sys.argv[1:]:
    builds, execs = [], []
    for _ in range(3):
        t0 = time.monotonic()
        df = registry[name].spark(spark, sf_dir)
        t1 = time.monotonic()
        df.collect()
        t2 = time.monotonic()
        builds.append(round(t1 - t0, 3))
        execs.append(round(t2 - t1, 3))
    out[name] = {"build": builds, "exec": execs}
print(json.dumps(out))
