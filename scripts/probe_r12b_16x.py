"""x16 probe for the round-12 registrations. Replicates sf0.1 16x with
key remapping (documents token-perturbed; keyless dims copied 1x) and
times the REAL registry queries at 1x and 16x, solo (no concurrent
Spark — the round-12 rule).

Reading guide: skyline reduces to distinct points then bucket windows
(linear scan + point-grain work); delta-encoding is one window pass
(linear); temporal reachability's contact volume is cell-capped (cells
grow with the time span x types — replication multiplies users per
cell, capped at 20, so contacts track cells); tar shards scale with
bytes/shard-count; hilbert is a 16-projection scan; MOR read is one
delta window + anti-join; stream ops replay 16x state.
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
    "orders_skyline_pareto",
    "events_delta_encoding_audit",
    "graph_temporal_reachability",
    "multimodal_tar_shards",
    "multimodal_tar_datasource",
    "layout_hilbert",
    "upsert_merge_on_read",
    "streaming_update_mode_emissions",
    "streaming_join_full_outer",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or QUERIES
    spark = get_spark("probe_r12b", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r12b")
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
    replicate("events", "event_id", "user_id")
    replicate("orders", "o_orderkey", "o_custkey")
    replicate("lineitem", "l_orderkey", "l_partkey", "l_suppkey")
    replicate("customer", "c_custkey")
    replicate("supplier", "s_suppkey")
    replicate("part", "p_partkey")
    replicate("embeddings", "vec_id")
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
