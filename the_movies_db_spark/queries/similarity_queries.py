"""Oracle-checked similarity-search queries over ``embeddings``
(north-star: ANN over an embedding column — brute-force baseline +
LSH-bucketed scale path).

The LSH oracle SQL is *generated* to replicate the exact md5-derived
hyperplanes of ``operators.similarity.hyperplane_signature``, so even
the approximate index is value-hash-verified against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table, spread
from the_movies_db_spark.operators import similarity as S
from the_movies_db_spark.queries import register

_N_QUERIES = 5  # query set: vec_id < 5
_K = 10
_COS = (
    "round(list_inner_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /"
    " (sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *"
    "  sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 4)"
)


@register(
    "sim_topk_bruteforce",
    f"""
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS} AS cosine_sim,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_COS} DESC, c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    ) t WHERE rank <= {_K}
    """,
    doc=(
        "Exact cosine top-k: broadcast query set × corpus scan, ranked on "
        "rounded similarity with id tie-break."
    ),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk(e, q, "vec_id", "embedding", k=_K)


_PLANES, _DIM = 8, 64
_SIGN = (
    "CASE WHEN substr(md5({p} || ':' || i), 1, 1) IN "
    "('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END"
)
_SIG_EXPR = " || ".join(
    "(CASE WHEN round(list_aggregate(list_transform(range(0, " + str(_DIM) + "), "
    "i -> {v}[i + 1]::DOUBLE * " + _SIGN.format(p=p) + "), 'sum'), 6) >= 0 "
    "THEN '1' ELSE '0' END)"
    for p in range(_PLANES)
)


@register(
    "sim_topk_lsh",
    f"""
    WITH sigs AS (
      SELECT vec_id, embedding,
             {_SIG_EXPR.format(v="embedding")} AS sig
      FROM embeddings
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS} AS cosine_sim,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_COS} DESC, c.vec_id) AS rank
      FROM sigs q JOIN sigs c ON q.sig = c.sig AND q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    ) t WHERE rank <= 5
    """,
    doc=(
        "LSH-bucketed approximate top-k: md5-derived ±1 hyperplane "
        "signatures (8 planes), search only within the query's bucket. "
        "At scale the corpus is partitioned by signature → a query reads "
        "one bucket."
    ),
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_lsh(e, q, "vec_id", "embedding", k=5, num_planes=_PLANES, dim=_DIM)


@register(
    "sim_lsh_bucket_stats",
    f"""
    WITH sigs AS (
      SELECT vec_id, {_SIG_EXPR.format(v="embedding")} AS sig
      FROM embeddings
    )
    SELECT sig AS bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM sigs GROUP BY sig
    """,
    doc=(
        "LSH bucket occupancy — the skew diagnostic for the ANN index "
        "(hot buckets → add planes or salt)."
    ),
)
def sim_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    sig = S.hyperplane_signature(F.col("embedding"), _PLANES, _DIM)
    return (
        e.select(sig.alias("bucket"), "vec_id")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


@register(
    "sim_topk_vectorized",
    None,  # numpy SIMD sum order ≠ sequential sum — benchmarked, not hashed
    doc=(
        "Arrow/numpy vectorized brute-force top-k (mapInPandas matmul) — "
        "the throughput path; same semantics as sim_topk_bruteforce."
    ),
)
def sim_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_pandas(e, q, "vec_id", "embedding", k=_K)
