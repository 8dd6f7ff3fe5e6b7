"""Adjudication follow-up for the x16 probe's one flag:
pipeline_dedup_reweight ran 10.8x at 16x corpus while its sibling CC
consumers stayed <= 4.1x. Hypothesis (r9/r12 replicated-corpus rule):
the replicas differ from their originals by ONE trailing token, so
every document gains 15 near-dup siblings — the LSH pair OUTPUT grows
quadratically in clique size by construction, and the runtime tracks
that output, not an operator regression.

This script counts the pair volume and the cluster-size census at 1x
and 16x over the same replica model as probe_r13opt_16x.py.

Usage: python scripts/probe_r13opt_reweight.py [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table, scratch_dir, spread
from the_movies_db_spark.operators import dedup as D
from the_movies_db_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# mirror the registered query's parameters
from the_movies_db_spark.queries.dedup_queries import (  # noqa: E402
    _NUM_BANDS,
    _NUM_HASHES,
)


def census(spark, d, label: str) -> None:
    t0 = time.perf_counter()
    pairs = D.minhash_lsh_dedup_pairs(
        d, "doc_id", "text", threshold=0.2,
        num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=3,
    ).localCheckpoint(eager=False)
    n_pairs = pairs.count()
    cl = D.connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    sizes = (
        cl.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("k")
        .collect()
    )
    print(
        json.dumps(
            {
                "leg": label,
                "lsh_pairs": n_pairs,
                "cluster_size_census": {int(r["k"]): int(r["n_clusters"])
                                        for r in sizes},
                "sec": round(time.perf_counter() - t0, 2),
            }
        ),
        flush=True,
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(
        "probe_r13opt_rw", **{"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = scratch_dir("probe_r13opt_rw")
    rep = F.broadcast(spark.range(n).select(F.col("id").alias("__rep")))
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
    census(spark, spread(load_table(spark, SF_DIR, "documents")), "1x")
    census(
        spark,
        spread(
            spark.read.parquet(f"{work}/documents.parquet")
        ),
        f"{n}x",
    )


if __name__ == "__main__":
    main()
