"""x64 probe for the quadratic-risk families (VERDICT r11 directive 3):
banded-LSH bucket caps, semantic-dedup cell auto-sizing, substring
dedup, the minhash calibration pool join, plus the aHash cap and the
edit-distance verify stage. The cap/auto-sizing rules were only ever
measured at x16 — this probe replicates sf0.1 64x and times the REAL
registry queries at 1x and 64x.

Replica realism: documents are token-perturbed per replica (~40% of
tokens suffixed) so vocab and near-dup structure grow instead of
byte-identical clones; embeddings get a small deterministic per-replica
component offset so cosine near-dup cliques don't grow quadratically
BY CONSTRUCTION (the round-5 replicated-corpus trap). Keyless dims are
not needed (all probed queries load only documents/embeddings).

Usage: python scripts/probe_r12_64x.py [N] [names...]; stderr -> file
(round-9 rule), one JSON line per timing.
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
    "dedup_minhash_lsh",          # banded LSH (bucket join)
    "dedup_minhash_calibration",  # h0-bucketed signature pool join
    "dedup_semantic",             # IVF cells track corpus (n//64)
    "dedup_semantic_lsh",         # planes track log2(corpus)
    "dedup_substring_exact",      # stride-1 gram join (df-capped)
    "dedup_edit_distance_verify", # candidate-capped verify stage
    "multimodal_ahash_dedup",     # aHash bands, bucket cap 64
    "dedup_ngram_jaccard",        # df-25 capped gram join
    "dedup_embedding_lsh",        # hyperplane LSH buckets
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    names = sys.argv[2:] or QUERIES
    spark = get_spark("probe_r12", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    work = scratch_dir("probe_r12_64x")
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
    docs.repartition(64).write.mode("overwrite").parquet(
        f"{work}/documents.parquet"
    )
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .crossJoin(rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * F.lit(10_000_000))
        .withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (v, i) -> v + CAST((((__rep * 31 + i)"
                " % 7) - 3) AS FLOAT) * CAST(0.01 AS FLOAT))"
            ),
        )
        .drop("__rep")
    )
    emb.repartition(64).write.mode("overwrite").parquet(
        f"{work}/embeddings.parquet"
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
