"""x16 probe for the round-13 continuation-session registrations:
graph_ktruss (pair/triangle joins), search_prf_rm3 / search_bm25f
(token-stream retrieval), events_slice_finder (GROUPING SETS expand),
pipeline_active_learning / pipeline_conformal_threshold /
pipeline_isotonic_calibration (classifier family),
orders_jackknife_ratio (cluster windows),
events_regression_discontinuity (combining aggregate),
upsert_equality_deletes (delete-application joins).

Replica models (r10/r12b/r13 rules):
- orders/lineitem/customer key-offset on custkey/orderkey; supplier
  and other dims copied 1x (the co-purchase graph grows by customers,
  per-customer degree constant).
- documents replicate with doc_id offsets and a per-replica text
  PERTURBATION token appended (r12 lesson: byte-identical replicas
  make near-dup cliques, which stress caps rather than scaling; the
  retrieval ops here score per-doc so either way is linear, but the
  perturbation keeps vocabulary growth realistic).
- events extend the TIME axis (same users, rep eras).
- strictly solo; stderr to a file; batch queries only.

Usage: python scripts/probe_r13b_16x.py [N] [names...]
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
    "graph_ktruss",
    "search_prf_rm3",
    "search_bm25f",
    "events_slice_finder",
    "pipeline_active_learning",
    "pipeline_conformal_threshold",
    "pipeline_isotonic_calibration",
    "orders_jackknife_ratio",
    "events_regression_discontinuity",
    "upsert_equality_deletes",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or QUERIES
    spark = get_spark(
        "probe_r13b", **{"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r13b_16x")
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
    for t in ("nation", "region", "supplier", "part"):
        load_table(spark, SF_DIR, t).write.mode("overwrite").parquet(
            f"{work}/{t}.parquet"
        )
    (
        load_table(spark, SF_DIR, "documents")
        .crossJoin(rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * F.lit(10_000_000))
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
