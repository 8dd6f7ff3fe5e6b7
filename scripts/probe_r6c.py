"""x16 probe for the round-6 additions: replicate sf0.1 into a
repo-local scratch dir (key-remapped so cardinalities scale) and run
the REAL registry queries at 1x and 16x. Prints one JSON line per
timing. Replicates EVERY table the probed queries load (round-4
lesson: a query joining an unreplicated dim dies mid-sweep).

Reading guide (session-3 additions): everything here is
aggregate- or panel-shaped and should be flat-to-linear — MMR's
greedy stage is bounded (12-row pool), only its shortlist scan
tracks the corpus; DSIR re-tokenizes twice so expect ~2x the
token-stream cost; table profile carries the exact-distinct Expand
multiplier (6x rows into partial agg)."""

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
QUERIES = [
    "sim_mmr_diversify",
    "search_ndcg_eval",
    "pipeline_importance_dsir",
    "events_seasonal_anomaly",
    "orders_price_elasticity",
    "sim_embedding_drift",
    "dq_table_profile",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or QUERIES
    spark = get_spark("probe_r6c", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r6c")
    rep = F.broadcast(spark.range(n).select(F.col("id").alias("__rep")))

    def replicate(tbl: str, *keys: str) -> None:
        df = load_table(spark, SF_DIR, tbl).crossJoin(rep)
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("__rep") * F.lit(10_000_000))
        df.drop("__rep").repartition(32).write.mode("overwrite").parquet(
            f"{work}/{tbl}.parquet"
        )

    replicate("documents", "doc_id")
    replicate("embeddings", "vec_id")
    replicate("events", "event_id", "user_id")
    replicate("orders", "o_orderkey", "o_custkey")
    replicate("customer", "c_custkey")
    replicate("lineitem", "l_orderkey", "l_partkey", "l_suppkey")
    replicate("part", "p_partkey")
    replicate("supplier", "s_suppkey")
    replicate("nation")
    replicate("region")

    for name in names:
        for label, d in (("1x", SF_DIR), (f"{n}x", work)):
            t0 = time.perf_counter()
            rows = reg[name].spark(spark, d).collect()
            print(
                json.dumps(
                    {
                        "probe": f"{name}@{label}",
                        "sec": round(time.perf_counter() - t0, 2),
                        "rows": len(rows),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
