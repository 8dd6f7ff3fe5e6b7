"""Perturbed-replica x16 probe for the pair-substrate dedup family
(VERDICT r9 directive 3).

The plain replicate-keys probe makes every copy BYTE-IDENTICAL to its
15 siblings, so near-dup pair volume grows quadratically BY
CONSTRUCTION and the x16 ratio measures output growth, not operator
scaling. This probe instead applies a PER-REPLICA deterministic token
salt: for replica r, token t gains a ``_r`` suffix whenever
md5(r:t) % 5 < 2 (~40% of tokens). The same map f_r applies to every
doc inside replica r, so WITHIN-replica Jaccard/shingle structure is
preserved exactly (f_r is injective on whitespace tokens); ACROSS
replicas the expected 3-gram shingle survival is (0.6*0.6)^3 ~ 4.7%,
far below every dedup threshold in the family. Near-dup pair volume
therefore grows ~LINEARLY (16 independent shards with the original
internal structure), making operator cost separable from output
growth for the first time.
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
    "pipeline_cluster_purity",
    "dedup_clusters",
    "pipeline_dedup_survivorship",
    "pipeline_dedup_survivor_stats",
    "dedup_minhash_calibration",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or QUERIES
    spark = get_spark("probe_r10p", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r10p")
    rep = F.broadcast(spark.range(n).select(F.col("id").alias("__rep")))

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
    docs.repartition(32).write.mode("overwrite").parquet(f"{work}/documents.parquet")

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
