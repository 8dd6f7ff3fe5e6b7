"""x16 probe for the round-9 additions. Replicates sf0.1 16x with key
remapping and runs the REAL registry queries at 1x and 16x; one JSON
line per timing.

Reading guide: candidate_keys/quantile-sketch/seasonal/ltv/uplift/cfd/
survivor-stats/fertility collapse to bounded domains after one scan
(linear expected); holt_damped is a |days|-bounded fold (flat);
query-likelihood tracks matching docs (vocab-pruned before shuffle);
bridges/CC track the customer-bounded edge list; minhash calibration
tracks h0 bucket structure — replicated docs are byte-identical, so
bucket sizes grow 16x and the pair pool ~256x BY CONSTRUCTION (read as
output-tracking, like the r8 lsh_cost_model note)."""

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
    "dq_candidate_keys3",
    "agg_quantile_sketch_merge",
    "orders_seasonal_decompose",
    "orders_cohort_ltv_curve",
    "pipeline_dedup_survivor_stats",
    "events_counterfactual_uplift",
    "dq_rule_mining_cfd",
    "search_query_likelihood_lm",
    "graph_bridge_edges",
    "graph_connected_components",
    "dedup_minhash_calibration",
    "events_forecast_holt_damped",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or QUERIES
    spark = get_spark("probe_r9", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r9")
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
