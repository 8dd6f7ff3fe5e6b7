"""x16 probe for the round-10 additions. Replicates sf0.1 16x with key
remapping for every table; documents additionally get the PER-REPLICA
token salt from probe_r10_perturbed.py so pair-substrate ops
(edit-distance verify, substring dedup, reweight) see ~linear near-dup
growth instead of byte-identical quadratic blowup.

Reading guide: substring dedup / quality RRF / compression proxy /
ahash are per-row projections + key-grain shuffles (expect ~linear);
edit-distance verify tracks h0-bucket pair volume (linear under the
perturbed replicas); PPR runs on the nation graph (dims NOT
replicated -> flat); triangle-sample / diameter / textrank iterate
over checkpointed bounded artifacts (expect sublinear in corpus);
markov attribution / uplift / permutation collapse to bounded censuses
after one scan (linear scan term only).
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
    "dedup_substring_exact",
    "dedup_edit_distance_verify",
    "sim_topk_ivf_adaptive",
    "sim_cell_medoid",
    "sim_recall_adaptive",
    "graph_personalized_pagerank",
    "graph_triangle_sample_estimate",
    "graph_diameter_estimate",
    "events_attribution_markov",
    "events_ab_permutation",
    "events_uplift_stump",
    "events_decayed_engagement",
    "agg_bitmap_hierarchy",
    "orders_newsvendor_quantile",
    "orders_xyz_variability",
    "text_textrank_keywords",
    "text_ngram_compression_proxy",
    "pipeline_quality_rrf",
    "pipeline_shard_token_balance",
    "pipeline_dedup_reweight",
    "dq_pattern_signature",
    "multimodal_ahash_dedup",
    "search_ltr_blend",
    "agg_log_histogram_quantiles",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or QUERIES
    spark = get_spark("probe_r10", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r10")
    rep = F.broadcast(spark.range(n).select(F.col("id").alias("__rep")))

    def replicate(tbl: str, *keys: str) -> None:
        df = load_table(spark, SF_DIR, tbl).crossJoin(rep)
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("__rep") * F.lit(10_000_000))
        df.drop("__rep").repartition(32).write.mode("overwrite").parquet(
            f"{work}/{tbl}.parquet"
        )

    docs = (
        load_table(spark, SF_DIR, "documents")
        .crossJoin(rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * F.lit(10_000_000))
        .withColumn(
            "text",
            F.expr(
                "array_join(transform(split(text, '\\\\s+'), t ->"
                " CASE WHEN conv(substring(md5(concat(CAST(__rep AS STRING),"
                " ':', t)), 1, 4), 16, 10) % 5 < 2"
                " THEN concat(t, '_', CAST(__rep AS STRING)) ELSE t END), ' ')"
            ),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("__rep")
    )
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{work}/documents.parquet"
    )
    replicate("embeddings", "vec_id")
    replicate("events", "event_id", "user_id")
    replicate("orders", "o_orderkey", "o_custkey")
    replicate("customer", "c_custkey")
    replicate("lineitem", "l_orderkey", "l_partkey", "l_suppkey")
    replicate("part", "p_partkey")
    replicate("supplier", "s_suppkey")
    # dims with NO remappable key are COPIED 1x, never replicated:
    # duplicate dim rows would explode every dim join 16x (the r10 PPR
    # probe artifact: 25 output rows became 5.2M via 16x16 dup joins)
    for t in ("nation", "region"):
        load_table(spark, SF_DIR, t).write.mode("overwrite").parquet(
            f"{work}/{t}.parquet"
        )

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
