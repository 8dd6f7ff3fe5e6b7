"""Adversarial hot-customer probe for graph_link_jaccard (round-7
verdict item 4): replicate sf0.1 Nx and remap 5% of one replica's
orders onto a SINGLE customer key, producing a hub customer whose
neighborhood covers essentially the whole supplier set. Without the
df-cap that one customer would emit C(deg, 2) pairs into one task; the
cap (greatest(64, 8 * mean degree), identical formula in both engines)
must exclude it, keeping per-customer pair fan-out bounded.

Prints one JSON line per measurement:
- cap value, max kept degree, hot-customer degree
- candidate pairs WITH vs WITHOUT the hot customer (analytic sum of
  C(d,2) over customers — the join's true output volume)
- wall time of the full registry query on the adversarial layout
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table, scratch_dir
from the_movies_db_spark.queries import load_all
from the_movies_db_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_KEY = 424242424242


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark("probe_r8_hotkey", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r8_hotkey")
    rep = F.broadcast(spark.range(n).select(F.col("id").alias("__rep")))

    def replicate(tbl: str, *keys: str):
        df = load_table(spark, SF_DIR, tbl).crossJoin(rep)
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("__rep") * F.lit(10_000_000))
        return df.drop("__rep")

    li = replicate("lineitem", "l_orderkey", "l_suppkey")
    # replica 0 keeps original custkeys; every 20th order across ALL
    # replicas is remapped onto ONE hub customer -> its neighborhood
    # approaches the full (replicated) supplier set.
    od = replicate("orders", "o_orderkey", "o_custkey").withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 20 == 0, F.lit(HOT_KEY)).otherwise(
            F.col("o_custkey")
        ),
    )
    li.repartition(32).write.mode("overwrite").parquet(f"{work}/lineitem.parquet")
    od.repartition(32).write.mode("overwrite").parquet(f"{work}/orders.parquet")

    # --- analytic pair-volume accounting over the edge set ------------
    e = (
        spark.read.parquet(f"{work}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{work}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    cdeg = e.groupBy("c").agg(F.count(F.lit(1)).alias("d")).cache()
    cap_row = e.agg(
        F.expr("greatest(64L, 8 * (count(*) div count(DISTINCT c)))").alias("v")
    ).collect()[0]
    cap = int(cap_row["v"])
    stats = cdeg.agg(
        F.max("d").alias("max_d"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("pairs_all"),
        F.sum(F.expr("CASE WHEN d <= %d THEN d * (d - 1) div 2 END" % cap)).alias(
            "pairs_kept"
        ),
        F.max(F.expr("CASE WHEN d <= %d THEN d END" % cap)).alias("max_kept_d"),
        F.count(F.expr("CASE WHEN d > %d THEN 1 END" % cap)).alias("n_capped"),
    ).collect()[0]
    hot_d = cdeg.filter(F.col("c") == HOT_KEY).collect()
    print(
        json.dumps(
            {
                "probe": "link_jaccard_hotkey",
                "n": n,
                "cap": cap,
                "hot_degree": int(hot_d[0]["d"]) if hot_d else 0,
                "max_degree": int(stats["max_d"]),
                "max_kept_degree": int(stats["max_kept_d"]),
                "n_capped_customers": int(stats["n_capped"]),
                "pairs_without_cap": int(stats["pairs_all"]),
                "pairs_with_cap": int(stats["pairs_kept"]),
            },
            separators=(",", ":"),
        ),
        flush=True,
    )

    for label, d in (("1x", SF_DIR), (f"{n}x_hot", work)):
        t0 = time.perf_counter()
        rows = reg["graph_link_jaccard"].spark(spark, d).collect()
        print(
            json.dumps(
                {
                    "query": "graph_link_jaccard",
                    "scale": label,
                    "sec": round(time.perf_counter() - t0, 2),
                    "rows": len(rows),
                },
                separators=(",", ":"),
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
