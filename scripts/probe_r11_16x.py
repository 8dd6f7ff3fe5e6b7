"""x16 probe for the round-11 session additions. Replicates sf0.1 16x
(key remapping; documents PERTURBED per replica so near-dup/vocab
structure stays realistic; keyless dims copied 1x) and times the REAL
registry queries at 1x and 16x; one JSON line per timing.

Reading guide: wilson/readability/interrupted_ts/fano-class ops
collapse to bounded power sums after one scan (linear expected);
bpe_merges/tokenize track the VOCAB (perturbation grows it ~2x, so
round cost grows mildly superlinear vs corpus but stays vocab-bounded);
viterbi/harmonic/ss_policy fold bounded state per key (flat-to-linear);
interleaving tracks matching docs (vocab-pruned); range_search is
panel x corpus (linear audit by design); knn_binned tracks probe-panel
x bucket population (probe count scales with orders via the modulus);
reach_sketch joins adjacency x k-sketches (linear in adjacency);
merkle/selectivity are one-scan aggregates (linear)."""

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
    "agg_wilson_lower_bound",
    "text_readability_ari",
    "text_bpe_merges",
    "text_bpe_tokenize_stats",
    "events_hmm_viterbi",
    "graph_harmonic_centrality",
    "sim_range_search",
    "search_interleaving_eval",
    "multimodal_shot_boundaries",
    "join_knn_binned",
    "dq_selectivity_histogram",
    "orders_ss_policy_sim",
    "events_interrupted_ts",
    "dq_checksum_merkle_partitions",
    "events_attribution_time_decay",
    "graph_reach_sketch",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or QUERIES
    spark = get_spark("probe_r11", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r11")
    rep = F.broadcast(spark.range(n).select(F.col("id").alias("__rep")))

    def replicate(tbl: str, *keys: str) -> None:
        df = load_table(spark, SF_DIR, tbl).crossJoin(rep)
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("__rep") * F.lit(10_000_000))
        df.drop("__rep").repartition(32).write.mode("overwrite").parquet(
            f"{work}/{tbl}.parquet"
        )

    # documents: perturb ~40% of tokens per replica so vocab and
    # near-dup structure grow realistically instead of byte-identically
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
