"""Solo A/B for the mid-bench suspects (search_ltr_blend 3.1x in-sweep,
sim_recall_ivfpq/nprobe/residual ~1.4-1.5x, pipeline_curation_funnel 1.3x):
adjudicate noise vs a real regression from the batch-1 session default
(preferSortMergeJoin=false + SHJ local-map threshold).

Run twice, strictly solo:
  python scripts/solo_ab_r13opt_suspects.py                    # SHJ default (current)
  SPARK_GRAFT_PREFER_SMJ=true SPARK_GRAFT_SHJ_LOCAL_MAP_THRESHOLD=0 \
      python scripts/solo_ab_r13opt_suspects.py                # old behavior
Protocol = bench.py's (warmup, 3 collect-timed runs, median).
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from the_movies_db_spark.io import TABLES, load_table
from the_movies_db_spark.queries import load_all
from the_movies_db_spark.session import get_spark

QUERIES = sys.argv[1:] or [
    "search_ltr_blend",
    "sim_recall_ivfpq",
    "sim_recall_nprobe_curve",
    "sim_topk_ivfpq_residual",
    "pipeline_curation_funnel",
]

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("solo_ab_r13opt_suspects")
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

mode = "SMJ" if os.environ.get("SPARK_GRAFT_PREFER_SMJ") == "true" else "SHJ"
out = {"mode": mode}
for name in QUERIES:
    spark.sparkContext.setJobDescription(f"solo_ab:{name}")
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        registry[name].spark(spark, sf_dir).collect()
        runs.append(round(time.monotonic() - t0, 3))
    out[name] = {"runs": runs, "median": sorted(runs)[1]}
print(json.dumps(out))
