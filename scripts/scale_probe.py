"""Empirical scaling probe: replicate the sf0.1 tables N× (with key
remapping so cardinalities scale realistically) and time the heaviest
operator families. The point is to verify the *shape* of the scaling
curve — linear for scans/aggs/LSH, near-linear for shuffled joins —
before trusting the 100 TB design claims.

Usage: python scripts/scale_probe.py [N]   (default 8)
Writes nothing outside /tmp; prints one JSON line per timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from the_movies_db_spark.io import load_table, spread
from the_movies_db_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df: DataFrame, n: int, *key_cols: str) -> DataFrame:
    """n copies with keys offset per replica so key cardinality scales
    with volume (a plain union would just create n-way duplicates)."""
    rep = df.crossJoin(F.broadcast(
        df.sparkSession.range(n).select(F.col("id").alias("__rep"))
    ))
    for k in key_cols:
        rep = rep.withColumn(k, F.col(k) + F.col("__rep") * F.lit(10_000_000))
    return rep.drop("__rep")


def timed(label: str, df: DataFrame) -> None:
    t0 = time.perf_counter()
    n = df.count()
    print(json.dumps({"probe": label, "sec": round(time.perf_counter() - t0, 2),
                      "rows": n}))


def timed_scalar(label: str, df: DataFrame) -> None:
    """collect(), not count() — count() over an Aggregate prunes the
    aggregate expressions themselves and times nothing."""
    t0 = time.perf_counter()
    rows = df.collect()
    print(json.dumps({"probe": label, "sec": round(time.perf_counter() - t0, 2),
                      "rows": len(rows)}))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("scale_probe", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    li1 = load_table(spark, SF_DIR, "lineitem")
    lin = replicate(li1, n, "l_orderkey")
    o1 = load_table(spark, SF_DIR, "orders")
    on = replicate(o1, n, "o_orderkey")
    docs1 = spread(load_table(spark, SF_DIR, "documents"))
    docsn = replicate(docs1, n, "doc_id")

    # scan + filter + hash agg (q01 shape), 1× then n×
    def q01(df):
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return (df.groupBy("l_returnflag", "l_linestatus")
                  .agg(F.sum("l_quantity"), F.sum(disc), F.count(F.lit(1))))
    timed_scalar("agg_1x", q01(li1))
    timed_scalar(f"agg_{n}x", q01(lin))

    # fact-fact shuffled join, 1× then n×
    timed("join_1x", li1.join(o1, F.col("l_orderkey") == F.col("o_orderkey")))
    timed(f"join_{n}x", lin.join(on, F.col("l_orderkey") == F.col("o_orderkey")))

    # MinHash-LSH dedup, 1× then n× (replicas are near-dups of each
    # other by construction → candidate volume scales too)
    from the_movies_db_spark.operators.dedup import minhash_signature
    def sigs(df):
        # aggregate over the signature so column pruning can't skip it
        return (df.select(minhash_signature("text").alias("s"))
                  .agg(F.sum(F.length(F.concat_ws("", "s"))).alias("sig_bytes")))
    timed_scalar("minhash_1x", sigs(docs1))
    timed_scalar(f"minhash_{n}x", sigs(docsn))

    # n-gram Jaccard with df-cap: replication multiplies every shingle's
    # document frequency by n, so without the cap the posting-list
    # self-join grows quadratically (n² pair rows per shingle); with the
    # cap the hot shingles fall out and growth stays near-linear.
    from the_movies_db_spark.operators.dedup import ngram_jaccard_pairs

    timed(
        "ngram_capped_1x",
        ngram_jaccard_pairs(docs1, "doc_id", "text", threshold=0.2, max_df=25),
    )
    timed(
        f"ngram_capped_{n}x",
        ngram_jaccard_pairs(docsn, "doc_id", "text", threshold=0.2, max_df=25),
    )

    # banded embedding LSH: at n× corpus the SAME plane count means n²×
    # candidate pairs (buckets fill up); raising planes_per_band restores
    # bucket selectivity — this probe prints the candidate counts that
    # justify the "planes track log2(corpus)" sizing rule.
    from the_movies_db_spark.operators.dedup import embedding_near_dup_pairs_lsh

    emb1 = spread(load_table(spark, SF_DIR, "embeddings"))
    embn = replicate(emb1, n, "vec_id")
    timed(
        "emb_lsh_1x_p4",
        embedding_near_dup_pairs_lsh(emb1, "vec_id", "embedding",
                                     threshold=-1.0, planes_per_band=4),
    )
    timed(
        f"emb_lsh_{n}x_p4",
        embedding_near_dup_pairs_lsh(embn, "vec_id", "embedding",
                                     threshold=-1.0, planes_per_band=4),
    )
    timed(
        f"emb_lsh_{n}x_p8",
        embedding_near_dup_pairs_lsh(embn, "vec_id", "embedding",
                                     threshold=-1.0, planes_per_band=8),
    )

    # semantic dedup: cells fill n× fuller under replication, so the
    # within-cell pair stage grows n²× at FIXED n_cells — and returns to
    # near-linear when cells scale with the corpus (the "cells track
    # corpus size" rule the operator docstring states).
    from the_movies_db_spark.operators.similarity import semantic_dedup

    timed(
        "semantic_1x_c32",
        semantic_dedup(emb1, "vec_id", "embedding", n_cells=32,
                       threshold=0.3, dim=64),
    )
    timed(
        f"semantic_{n}x_c32",
        semantic_dedup(embn, "vec_id", "embedding", n_cells=32,
                       threshold=0.3, dim=64),
    )
    timed(
        f"semantic_{n}x_c{32 * n}",
        semantic_dedup(embn, "vec_id", "embedding", n_cells=32 * n,
                       threshold=0.3, dim=64),
    )
    # default auto-sizing (n_cells=None → cells track the corpus count)
    # must land on the near-linear curve without a manual override
    timed(
        f"semantic_{n}x_auto",
        semantic_dedup(embn, "vec_id", "embedding", threshold=0.3, dim=64),
    )

    # LSH-bucketed semantic dedup: per-row assignment cost is
    # O(planes × dim) with planes ~ log2(corpus) — expect growth far
    # below the IVF-cell variant whose assignment is O(n_cells) per row
    from the_movies_db_spark.operators.similarity import semantic_dedup_lsh

    timed(
        "semantic_lsh_1x",
        semantic_dedup_lsh(emb1, "vec_id", "embedding", threshold=0.3, dim=64),
    )
    timed(
        f"semantic_lsh_{n}x",
        semantic_dedup_lsh(embn, "vec_id", "embedding", threshold=0.3, dim=64),
    )

    # composed IVF x PQ: per-query ADC work is bounded by the probed
    # cell (~corpus/n_cells code rows), so growth should track the
    # probed-cell population, and the PQ encode pass is linear per row
    from the_movies_db_spark.operators.similarity import cosine_topk_ivfpq

    q1 = emb1.filter(F.col("vec_id") < 5)
    timed(
        "ivfpq_1x",
        cosine_topk_ivfpq(emb1, q1, "vec_id", "embedding",
                          k=5, shortlist_factor=4, n_cells=8, dim=64),
    )
    timed(
        f"ivfpq_{n}x",
        cosine_topk_ivfpq(embn, q1, "vec_id", "embedding",
                          k=5, shortlist_factor=4, n_cells=8, dim=64),
    )

    # incremental admission: batch-vs-corpus pair cost should track the
    # BATCH size — replicating the corpus n× with a fixed batch must not
    # grow n²×.
    from the_movies_db_spark.operators.dedup import minhash_lsh_incremental_pairs

    batch1 = docs1.filter(F.col("doc_id") % 10 == 7)
    corp1 = docs1.filter(F.col("doc_id") % 10 != 7)
    corpn = docsn.filter(F.col("doc_id") % 10 != 7)
    timed(
        "incremental_1x",
        minhash_lsh_incremental_pairs(batch1, corp1, "doc_id", "text",
                                      threshold=0.2),
    )
    timed(
        f"incremental_{n}x_corpus",
        minhash_lsh_incremental_pairs(batch1, corpn, "doc_id", "text",
                                      threshold=0.2),
    )

    # BM25 search: cost is dominated by the token explode + vocab-pruned
    # tf aggregation, both linear in corpus tokens; the top-k window is
    # bounded by matching docs. Expect near-linear growth.
    from the_movies_db_spark.queries.search_queries import bm25_topk

    timed("bm25_1x", bm25_topk(spark, docs1))
    timed(f"bm25_{n}x", bm25_topk(spark, docsn))

    skew_probe(spark, n)




def skew_probe(spark, n: int) -> None:
    """Hot-key join: 90% of fact rows share one key. Times the plain
    join vs the salted rewrite (operators.joins.salted_join)."""
    from pyspark.sql import functions as F

    from the_movies_db_spark.operators.joins import salted_join

    rows = 1_000_000 * max(1, n // 8)
    big = spark.range(rows).select(
        F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
    try:
        timed("skew_plain", big.join(small, "k"))
        timed("skew_salted", salted_join(big, small, "k", salt=32))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


if __name__ == "__main__":
    main()
