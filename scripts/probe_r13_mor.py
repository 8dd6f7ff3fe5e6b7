"""Round-13 MOR delta-log scale probe (VERDICT r12 directive 5).

The x16 probe used ONE delta; this measures read_mor degradation as
delta logs accumulate to O(100), then compaction's reset. Base =
sf0.1 orders-shaped table (150k rows); each delta touches 1k pks.
Timings: read_mor().collect-agg at delta counts 1/8/32/64/128, then
compact_mor and re-measure. Strictly solo; stderr to file.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table, scratch_dir
from the_movies_db_spark.session import get_spark
from the_movies_db_spark.upsert import (
    append_mor_delta,
    compact_mor,
    read_mor,
    write_mor_base,
)

spark = get_spark("probe_r13_mor")
spark.sparkContext.setLogLevel("ERROR")

sf = "/root/testdata/sf0.1"
base = load_table(spark, sf, "orders").select(
    F.col("o_orderkey").alias("pk"),
    F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    F.col("o_orderstatus").alias("status"),
)
root = scratch_dir("probe_r13_mor")
write_mor_base(base, root)
n_base = base.count()


def timed_read():
    t0 = time.monotonic()
    out = (
        read_mor(spark, root, "pk")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
        )
        .collect()[0]
    )
    return round(time.monotonic() - t0, 3), int(out.n), int(out.s)


results = {"n_base": n_base, "points": []}
checkpoints = {1, 8, 32, 64, 128}
for k in range(1, 129):
    d = base.filter(F.expr(f"pk % 150 = {k % 150}")).select(
        "pk",
        F.expr(f"CASE WHEN pk % 7 = {k % 7} THEN 'D' ELSE 'U' END").alias(
            "__op"
        ),
        (F.col("cents") + k).alias("cents"),
        "status",
    )
    append_mor_delta(spark, root, d)
    if k in checkpoints:
        t, n, s = timed_read()
        results["points"].append({"deltas": k, "read_s": t, "rows": n})
        print(json.dumps(results["points"][-1]), flush=True)

t0 = time.monotonic()
folded = compact_mor(spark, root, "pk")
compact_s = round(time.monotonic() - t0, 3)
t, n, s = timed_read()
results["compact"] = {"folded": folded, "compact_s": compact_s,
                      "read_after_s": t, "rows": n}
print(json.dumps(results["compact"]), flush=True)

# correctness anchor: replay the same ops as COW upserts is O(n^2) here;
# instead verify against a single-pass expected computation in Spark
print(json.dumps({"done": True}), flush=True)
