"""x16 scaling probe for every query whose CODE PATH changed in the
round-13 optimization batches 1-5 (plus the session-wide shuffled-hash
preference, which all of them exercise). The round's A/Bs were sf0.1
solo medians; this run checks none of the changes trades local seconds
for super-linear growth.

Replica models (r10/r12b/r13 rules):
- orders/customer key-offset on orderkey/custkey; lineitem offsets
  l_orderkey ONLY (16x customers over a fixed supplier catalog — the
  r13b/graph64x model: supplier degree grows 16x, per-customer degree
  and the pair-cap structure stay put, so capped pair joins should be
  ~linear); nation/region/part/supplier copied 1x (keyless-dim rule).
- documents offset doc_id + per-replica text perturbation token
  (byte-identical replicas stress dedup caps, not scaling).
- embeddings offset vec_id, vectors byte-identical (r12 lesson: ratios
  for embedding ops are partly output-tracking; the probed ANN ops are
  per-query top-k, linear either way; centroids stay the replica-0
  vec_id < cells slice so the fixed-cell-count model applies: per-cell
  candidate lists grow 16x by construction).
- events key-offset event_id and EXTEND THE TIME AXIS per replica
  (16x-longer per-user sequences — the adversarial direction for the
  batch-1 sharded token-bucket kernel, which replays per user).
- strictly solo; stderr to a file; one timed run per leg (reading
  ratios >= 3-4x as signal, not sub-2x wobble).

Usage: python scripts/probe_r13opt_16x.py [N] [names...]
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
QUERIES = [
    # batch 1: sharded kernel / spread / SHJ hints / partitioned write
    "udf_token_bucket",
    "sim_hubness_audit",
    "dedup_sketch_merge_audit",
    "dedup_minhash_calibration",
    "graph_link_jaccard",
    "graph_adamic_adar",
    "upsert_partitioned",
    # batch 2: |Q|-row probe-side ANN derivation
    "sim_topk_ivfpq",
    "sim_topk_ivfpq_residual",
    "sim_topk_kmeans_int",
    "sim_topk_ivf_adaptive",
    "sim_recall_ivfpq",
    "sim_recall_nprobe_curve",
    # batch 3: CC convergence fold + consumers, LM-impact single pass
    "graph_connected_components",
    "pipeline_dedup_reweight",
    "pipeline_curation_funnel",
    "pipeline_filter_lm_impact",
    # batch 4: broadcast bounded sides in search eval joins
    "search_ndcg_eval",
    "search_hard_negatives",
    "search_ltr_blend",
    # batch 5: text LM family corpus-pass elimination
    "text_bigram_logprob",
    "text_tfidf_topk",
    "text_unigram_logprob",
    "text_ccnet_buckets",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or QUERIES
    spark = get_spark(
        "probe_r13opt", **{"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r13opt_16x")
    rep = F.broadcast(spark.range(n).select(F.col("id").alias("__rep")))

    def replicate(tbl: str, *keys: str) -> None:
        df = load_table(spark, SF_DIR, tbl).crossJoin(rep)
        for k in keys:
            df = df.withColumn(
                k, F.col(k) + F.col("__rep") * F.lit(10_000_000)
            )
        df.drop("__rep").repartition(64).write.mode("overwrite").parquet(
            f"{work}/{tbl}.parquet"
        )

    replicate("orders", "o_orderkey", "o_custkey")
    replicate("lineitem", "l_orderkey")
    replicate("customer", "c_custkey")
    replicate("embeddings", "vec_id")
    for t in ("nation", "region", "supplier", "part"):
        load_table(spark, SF_DIR, t).write.mode("overwrite").parquet(
            f"{work}/{t}.parquet"
        )
    (
        load_table(spark, SF_DIR, "documents")
        .crossJoin(rep)
        .withColumn(
            "doc_id", F.col("doc_id") + F.col("__rep") * F.lit(10_000_000)
        )
        .withColumn(
            "text", F.expr("concat(text, ' rep', CAST(__rep AS STRING))")
        )
        .drop("__rep")
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{work}/documents.parquet")
    )
    ev = load_table(spark, SF_DIR, "events")
    span = ev.agg(
        F.expr("CAST(datediff(max(ts), min(ts)) + 1 AS INT)").alias("d")
    ).collect()[0]["d"]
    (
        ev.crossJoin(rep)
        .withColumn(
            "event_id", F.col("event_id") + F.col("__rep") * F.lit(10_000_000)
        )
        .withColumn(
            "ts", F.expr(f"timestampadd(DAY, CAST(__rep AS INT) * {span}, ts)")
        )
        .drop("__rep")
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{work}/events.parquet")
    )

    for name in names:
        for label, d in (("1x", SF_DIR), (f"{n}x", work)):
            spark.sparkContext.setJobDescription(f"{name}@{label}")
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
