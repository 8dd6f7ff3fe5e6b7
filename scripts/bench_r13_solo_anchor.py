"""Round-13 solo anchor (VERDICT r12 directive 7): dedup_minhash_lsh
and sim_topk_lsh showed >1.3x in-sweep ratios in BENCH_r12; solo
evidence said noise. Confirm on a quiet epoch BEFORE any other Spark
work this session. Protocol = bench.py's: table warmup + codegen/
pandas warmup, then 3 collect-timed runs per query, median recorded.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from the_movies_db_spark.io import TABLES, load_table
from the_movies_db_spark.queries import load_all
from the_movies_db_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("bench_r13_solo_anchor")
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
def _identity(batches):
    yield from batches
spark.range(2).mapInPandas(_identity, "id long").count()

out = {}
for name in ["dedup_minhash_lsh", "sim_topk_lsh"]:
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        registry[name].spark(spark, sf_dir).collect()
        runs.append(round(time.monotonic() - t0, 3))
    out[name] = {"runs": runs, "median": sorted(runs)[1]}
print(json.dumps(out))
