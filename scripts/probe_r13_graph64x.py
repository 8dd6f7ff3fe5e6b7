"""x64 probe for the graph pair-join family (VERDICT r12 directive 4):
graph_adamic_adar, graph_link_jaccard, graph_random_walks,
graph_temporal_reachability. Their degree/cell caps were only measured
at <=x16, and round 12 proved x16 misses real quadratic blowups.

Replica models (the r10/r12b rules):
- orders/lineitem/customer replicate with KEY OFFSETS on custkey/
  orderkey only — the supplier catalog is SHARED, so per-customer
  degree stays constant and the co-purchase graph grows by customers
  (the realistic corpus-growth model for the bipartite pair joins;
  offsetting suppkey too would make 64 disjoint graphs and prove
  nothing about hub-pair growth).
- events extend the TIME axis (rep * (span+1) days shift, same users)
  — the r12b lesson: density replication drives every contact cell
  over its mass-gathering cap; a longer history is the real scaling
  axis for temporal-graph ops.
- keyless dims (nation/region) and supplier copied 1x (r10 rule).
- strictly solo, stderr to a file, batch (non-streaming) queries only
  so directory parquet is fine.

Usage: python scripts/probe_r13_graph64x.py [N] [names...]
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
    "graph_adamic_adar",
    "graph_link_jaccard",
    "graph_random_walks",
    "graph_temporal_reachability",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    names = sys.argv[2:] or QUERIES
    spark = get_spark(
        "probe_r13_graph", **{"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r13_graph64x")
    rep = F.broadcast(spark.range(n).select(F.col("id").alias("__rep")))

    def replicate(tbl: str, *keys: str) -> None:
        df = load_table(spark, SF_DIR, tbl).crossJoin(rep)
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("__rep") * F.lit(10_000_000))
        df.drop("__rep").repartition(64).write.mode("overwrite").parquet(
            f"{work}/{tbl}.parquet"
        )

    replicate("orders", "o_orderkey", "o_custkey")
    replicate("lineitem", "l_orderkey")  # suppliers SHARED by design
    replicate("customer", "c_custkey")
    for t in ("nation", "region", "supplier", "part"):
        load_table(spark, SF_DIR, t).write.mode("overwrite").parquet(
            f"{work}/{t}.parquet"
        )

    # events: extend the time axis — rep eras of (span+1) days each
    ev = load_table(spark, SF_DIR, "events")
    span = ev.agg(
        F.expr("CAST(datediff(max(ts), min(ts)) + 1 AS INT)").alias("d")
    ).collect()[0]["d"]
    print(json.dumps({"events_span_days": span}), flush=True)
    (
        ev.crossJoin(rep)
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * F.lit(10_000_000))
        .withColumn("ts", F.expr(f"timestampadd(DAY, CAST(__rep AS INT) * {span}, ts)"))
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
