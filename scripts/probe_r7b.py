"""x16 probe for the round-7 wave-4..8 additions. Replicates sf0.1
16x with key remapping and runs the REAL registry queries at 1x and
16x; one JSON line per timing.

Reading guide: everything here is bounded-domain after the first
aggregate (one-row moment reduces, day domains, nation x month,
|types|^2 cells, fixed 128-vector panel, block-grain zone maps), so
every query should be flat-to-linear. orders_theilsen_trend's pair set
is nation x C(|months|,2) — replication multiplies neither, so flat.
text_postings_compress tracks postings (linear); its gap window is
(source, term)-keyed so no single-partition hotspot."""

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
    "search_rank_agreement",
    "pipeline_ngram_novelty",
    "graph_clustering_coefficient",
    "io_schema_merge_scan",
    "text_sentence_stats",
    "dq_table_checksum",
    "fn_decimal_exact_money",
    "window_running_distinct",
    "fn_listagg_ordered",
    "events_ab_cuped",
    "orders_croston_intermittent",
    "events_forecast_holt_winters",
    "upsert_delete_purge",
    "pipeline_feature_hashing",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or QUERIES
    spark = get_spark("probe_r7b", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r7b")
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
