"""x16 probe for the round-8 wave D/E additions. Replicates sf0.1 16x
with key remapping (same machinery as probe_r8) and runs the REAL
registry queries at 1x and 16x; one JSON line per timing.

Reading guide: gopher/gini/cramers/lm_heldout collapse to bounded
domains after one scan (linear expected); retention_bitmap's word
table grows with distinct (day, user-word) pairs — user ids are
remapped per replica so words grow 16x (linear); LPA/HITS iterate over
customer-bounded / distinct-edge lists (linear); rank_volatility is a
supplier x month aggregate; hubness is |panel| x corpus (linear —
and at 16x each query's top-5 collapses onto its byte-identical
replicas, so the k-occurrence histogram narrowing to 1 row is an
output-tracking artifact of replication, not a defect); vacuum
writes 3 real versions of an orders-sized table, so its cost is
dominated by write IO (linear by construction). Wave F: moments
audit and span corruption are map-only + bounded aggregates; the
IVF cost model is one signature pass into <=1024 cells; rolling WAU
is a wid-keyed frame over the reduced word table; filter_lm_impact
is the lm_heldout shape with two vocab-scale count tables."""

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
    "pipeline_gopher_rules",
    "events_retention_bitmap",
    "agg_gini_split_stump",
    "graph_label_propagation",
    "agg_cramers_v",
    "upsert_vacuum_versions",
    "text_lm_heldout_eval",
    "sim_hubness_audit",
    "graph_hits_bipartite",
    "orders_rank_volatility",
    "agg_moments_merge_audit",
    "sim_ivf_cost_model",
    "pipeline_span_corruption",
    "events_rolling_wau_bitmap",
    "pipeline_filter_lm_impact",
    # wave G: streaming bitmap DAU is 4 foreachBatch merges over the
    # word table (write-IO bound, linear); preference pairs are
    # combining aggregates + broadcast join-backs (no rank windows); rolling regression is a frame window
    # over |types| x |days| daily cells (flat).
    "streaming_bitmap_dau",
    "pipeline_preference_pairs",
    "window_rolling_regression",
    # wave H: shapley collapses to (user, day) then 16 lattice cells;
    # modularity reuses the checkpointed LPA edge list (linear rounds);
    # candidate keys are two distinct-aggregate passes (Expand is the
    # cost knob — level-2 only over surviving pairs); SRP balance is
    # one signature pass with a 120-cell map-side collapse.
    "events_attribution_shapley",
    "graph_modularity_score",
    "dq_candidate_keys",
    "sim_srp_bit_balance",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or QUERIES
    spark = get_spark("probe_r8b", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r8b")
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
