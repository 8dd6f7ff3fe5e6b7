"""x16 probe for the round-7 wave-9/10 additions. Replicates sf0.1
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
    "io_dynamic_partition_overwrite",
    "orders_double_charge_audit",
    "events_ab_sprt",
    "agg_rollup_share_of_parent",
    "orders_price_volume_mix",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or QUERIES
    spark = get_spark("probe_r7c", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r7c")
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
    # dims keep ONE copy: replicating them without a PK remap makes
    # every dim join fan out n-fold (cents inflate n^2 per dim hop —
    # the x16 probe overflowed int64 through nation x region copies),
    # which no real scale-up produces.
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
