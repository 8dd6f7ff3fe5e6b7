"""Oracle-checked similarity-search queries over ``embeddings``
(north-star: ANN over an embedding column — brute-force baseline +
LSH-bucketed scale path).

The LSH oracle SQL is *generated* to replicate the exact md5-derived
hyperplanes of ``operators.similarity.hyperplane_signature``, so even
the approximate index is value-hash-verified against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk(e, q, "vec_id", "embedding", k=_K, dim=_DIM)


_PLANES, _DIM = 8, 64
_ELSH_CAP = 64  # max LSH-bucket size for pair enumeration (cliques -> quadratic)
_SIGN = (
    "CASE WHEN substr(md5({p} || ':' || i), 1, 1) IN "
    "('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END"
)
def _sig_expr(n_planes: int) -> str:
    """DuckDB mirror of ``hyperplane_signature`` for ``n_planes`` planes
    (plane family 0..n-1 — an m-plane signature is a prefix of the
    n-plane one for m < n)."""
    return " || ".join(
        "(CASE WHEN round(list_aggregate(list_transform(range(0, " + str(_DIM) + "), "
        "i -> {v}[i + 1]::DOUBLE * " + _SIGN.format(p=p) + "), 'sum'), 6) >= 0 "
        "THEN '1' ELSE '0' END)"
        for p in range(n_planes)
    )


_SIG_EXPR = _sig_expr(_PLANES)


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


_PROBE_ARMS = "\n      UNION ALL\n".join(
    "      SELECT vec_id, embedding, "
    f"substr(sig, 1, {i - 1}) || "
    f"(CASE WHEN substr(sig, {i}, 1) = '1' THEN '0' ELSE '1' END) || "
    f"substr(sig, {i + 1}, {_PLANES - i}) AS probe FROM qsigs"
    for i in range(1, _PLANES + 1)
)


@register(
    "sim_topk_lsh_multiprobe",
    f"""
    WITH sigs AS (
      SELECT vec_id, embedding,
             {_SIG_EXPR.format(v="embedding")} AS sig
      FROM embeddings
    ),
    qsigs AS (SELECT * FROM sigs WHERE vec_id < {_N_QUERIES}),
    probes AS (
      SELECT vec_id, embedding, sig AS probe FROM qsigs
      UNION ALL
{_PROBE_ARMS}
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS} AS cosine_sim,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_COS} DESC, c.vec_id) AS rank
      FROM probes q JOIN sigs c ON q.probe = c.sig AND q.vec_id <> c.vec_id
    ) t WHERE rank <= 5
    """,
    doc=(
        "Hamming-1 multi-probe LSH top-k: candidates come from the "
        "query's own bucket AND every bucket one flipped bit away "
        "(9 probes at 8 planes) — recovers near-neighbors split across "
        "a single hyperplane, the classic LSH miss, WITHOUT growing "
        "the index: the corpus keeps one bucket per vector and only "
        "the query side fans out (at rest: nprobe extra partition "
        "reads per query). Probes are distinct buckets, so the "
        "candidate union needs no dedup."
    ),
)
def sim_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_lsh_multiprobe(
        e, q, "vec_id", "embedding", k=5, num_planes=_PLANES, dim=_DIM
    )


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
    sig = S.hyperplane_signature("embedding", _PLANES, _DIM)
    return (
        e.select(sig.alias("bucket"), "vec_id")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


_N_CELLS = 8
_D2 = (
    "round(list_aggregate(list_transform(range(1, 65),"
    " i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)),"
    " 'sum'), 6)"
)


@register(
    "sim_topk_ivf",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {_N_CELLS}
    ),
    assign AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c
      ) t WHERE rn = 1
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS} AS cosine_sim,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_COS} DESC, c.vec_id) AS rank
      FROM assign q JOIN assign c ON q.cell = c.cell AND q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    ) t WHERE rank <= 5
    """,
    doc=(
        "IVF approximate top-k: coarse-quantize the corpus to centroid "
        "cells (argmin L2, deterministic seed centroids standing in for "
        "KMeans), search only the query's cell. At scale the corpus is "
        "written partitioned BY cell → probe = partition pruning."
    ),
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_ivf(e, q, "vec_id", "embedding", k=5, n_cells=_N_CELLS, dim=_DIM)


_NPROBE = 2


@register(
    "sim_topk_ivf_nprobe",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {_N_CELLS}
    ),
    assign AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c
      ) t WHERE rn = 1
    ),
    qprobe AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c
        WHERE e.vec_id < {_N_QUERIES}
      ) t WHERE rn <= {_NPROBE}
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS} AS cosine_sim,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_COS} DESC, c.vec_id) AS rank
      FROM qprobe q JOIN assign c ON q.cell = c.cell AND q.vec_id <> c.vec_id
    ) t WHERE rank <= 5
    """,
    doc=(
        "Multi-probe IVF top-k (nprobe=2): candidates come from the "
        "query's TWO nearest centroid cells — the standard IVF recall "
        "dial (FAISS nprobe): recall rises with probed cells at "
        "proportional scan cost, and at rest each extra probe cell is "
        "just one more partition read. Probe cells are computed as a "
        "pure projection over the collected centroid literal (sort + "
        "slice + explode), no join."
    ),
)
def sim_topk_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_ivf(
        e, q, "vec_id", "embedding",
        k=5, n_cells=_N_CELLS, dim=_DIM, nprobe=_NPROBE,
    )


@register(
    "dedup_embedding_lsh",
    f"""
    WITH sigs0 AS (
      SELECT vec_id, embedding, {_SIG_EXPR.format(v="embedding")} AS sig
      FROM embeddings
    ),
    keep AS (SELECT sig FROM sigs0 GROUP BY 1 HAVING count(*) <= {_ELSH_CAP}),
    sigs AS (SELECT s.* FROM sigs0 s JOIN keep USING (sig))
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                 (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                  sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 4) AS cosine_sim
    FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                 sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                4) >= 0.4
    """,
    doc=(
        "Embedding near-dup pairs, LSH-bucketed (the 100 TB path for "
        "dedup_embedding_cosine): hyperplane-signature equi-join replaces "
        "the O(n²) cross join; exact cosine verifies within buckets."
    ),
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    from the_movies_db_spark.operators.dedup import cosine_from_parts, norm

    sigs = e.select(
        "vec_id",
        "embedding",
        norm("embedding", _DIM).alias("__n"),
        S.hyperplane_signature("embedding", _PLANES, _DIM).alias("__sig"),
    ).localCheckpoint(eager=False)  # 2 consumers: cap table + both join sides
    # signature-bucket cap (r12 x64 probe): near-dup CLIQUES share the
    # full hyperplane signature, so uncapped buckets make the verified
    # pair volume quadratic in clique size (2.5M pairs at x64).
    # Mirrored exactly in the oracle's keep CTE; at-cap corpora are
    # unchanged (max 1x bucket < cap, re-verified both SFs).
    keep = (
        sigs.groupBy("__sig")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") <= _ELSH_CAP)
        .select("__sig")
    )
    # keep is bounded by 2^_PLANES = 256 distinct signatures — always
    # broadcastable; no hint needed (a forced shuffle_hash cascades).
    sigs = sigs.join(keep, "__sig")
    a = sigs.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__va"),
        F.col("__n").alias("__na"),
        F.col("__sig").alias("__siga"),
    )
    b = sigs.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__vb"),
        F.col("__n").alias("__nb"),
        F.col("__sig").alias("__sigb"),
    )
    sim = F.round(
        cosine_from_parts("__va", "__vb", "__na", "__nb", dim=_DIM), 4
    )
    return (
        a.join(b, (F.col("__siga") == F.col("__sigb")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.4)
    )


@register(
    "sim_topk_ivf_kmeans",
    None,  # trained centroids are MLlib-internal — rows-only check
    doc=(
        "IVF top-k with a TRAINED coarse quantizer: seeded MLlib KMeans "
        "fits the cells (deterministic within Spark), model.transform "
        "assigns them, exact cosine ranks within the query's cell — the "
        "production form of sim_topk_ivf, whose seed-centroid rule "
        "exists only for SQL-oracle verifiability. Scale shape "
        "unchanged: corpus written partitioned by trained cell, probe = "
        "partition pruning. Cells track the corpus (semantic_cells: "
        "n div 64) so per-probe cost stays flat as the corpus grows."
    ),
)
def sim_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_ivf_kmeans(e, q, "vec_id", "embedding", k=5, dim=_DIM)


@register(
    "sim_topk_vectorized",
    None,  # numpy SIMD sum order ≠ sequential sum — benchmarked, not hashed
    doc=(
        "Arrow/numpy vectorized brute-force top-k (mapInPandas matmul) — "
        "the throughput path; same semantics as sim_topk_bruteforce."
    ),
)
def sim_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_pandas(e, q, "vec_id", "embedding", k=_K)


@register(
    "sim_mllib_lsh_join",
    None,  # MLlib's hash family is internal — rows-only check
    doc=(
        "MLlib BucketedRandomProjectionLSH approxSimilarityJoin "
        "(seeded, deterministic within Spark): the built-in alternative "
        "to the expression-level LSH — near-pairs within Euclidean "
        "distance 1.15 (~0.2% selectivity; bucketLength sized to the "
        "projection scale so buckets actually partition the corpus)."
    ),
)
def sim_mllib_lsh_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.3, numHashTables=3, seed=42
    )
    model = lsh.fit(e)
    pairs = model.approxSimilarityJoin(e, e, threshold=1.15, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("id_a"),
            F.col("datasetB.vec_id").alias("id_b"),
            F.round("dist", 4).alias("dist"),
        )
    )


_QZ = (
    "list_transform(embedding, x -> CAST(round(x::DOUBLE / "
    "greatest(list_aggregate(list_transform(embedding, y -> abs(y::DOUBLE)), 'max'), 1e-30)"
    " * 127) AS BIGINT))"
)
_QDOT = (
    "list_aggregate(list_transform(range(1, 65), i -> q.q[i] * c.q[i]), 'sum')"
)


@register(
    "sim_topk_quantized",
    f"""
    WITH qz AS (
      SELECT vec_id, embedding, {_QZ} AS q FROM embeddings
    ),
    short AS (
      SELECT query_id, neighbor_id, qv, cv FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               q.embedding AS qv, c.embedding AS cv,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_QDOT} DESC, c.vec_id) AS srank
        FROM qz q JOIN qz c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERIES}
      ) s WHERE srank <= 5 * 4
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT query_id, neighbor_id,
             round(list_inner_product(qv::DOUBLE[], cv::DOUBLE[]) /
                   (sqrt(list_inner_product(qv::DOUBLE[], qv::DOUBLE[])) *
                    sqrt(list_inner_product(cv::DOUBLE[], cv::DOUBLE[]))), 4) AS cosine_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY round(list_inner_product(qv::DOUBLE[], cv::DOUBLE[]) /
                                               (sqrt(list_inner_product(qv::DOUBLE[], qv::DOUBLE[])) *
                                                sqrt(list_inner_product(cv::DOUBLE[], cv::DOUBLE[]))), 4)
                                          DESC, neighbor_id) AS rank
      FROM short
    ) t WHERE rank <= 5
    """,
    doc=(
        "Two-tier quantize-then-rerank ANN: per-vector symmetric int8 "
        "scalar quantization (round-half-away, engine-portable), integer "
        "dot-product shortlist of 4k candidates, exact float cosine "
        "re-rank to top-k. The quantized column is the one materialized "
        "at rest at scale (4x smaller, integer math in the scan)."
    ),
)
def sim_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_quantized(
        e, q, "vec_id", "embedding", k=5, shortlist_factor=4, dim=_DIM
    )


_TAU_SEM = 0.3
# Cell count TRACKS the corpus (greatest(min, n // target)) — a fixed
# count degrades quadratically as cells fill up (27x at 16x data,
# SURVEY §10.16). The oracle computes the identical integer formula
# from its own count(*), so both engines derive the same cell count.
_SEM_CELLS_SQL = (
    f"greatest({S.SEMANTIC_MIN_CELLS}, "
    f"(SELECT count(*) FROM embeddings) // {S.SEMANTIC_CELL_TARGET})"
)
_COS_AB = (
    "round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /"
    " (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *"
    "  sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4)"
)


@register(
    "dedup_semantic",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      WHERE vec_id < {_SEM_CELLS_SQL}
    ),
    assign AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c
      ) t WHERE rn = 1
    )
    SELECT b.vec_id AS vec_id, b.cell AS cell,
           min(a.vec_id)  AS keeper,
           max({_COS_AB}) AS max_sim
    FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE {_COS_AB} >= {_TAU_SEM}
    GROUP BY b.vec_id, b.cell
    """,
    doc=(
        "SemDeDup-shaped semantic dedup: IVF coarse clusters, then "
        "within-cell cosine >= tau marks the higher id a duplicate of "
        "its lowest matching cell-mate. Quadratic work is bounded per "
        "cell; one equi-join + one hash aggregate. Cell count derives "
        "from the corpus count (cells track corpus size), so per-cell "
        "pair work stays bounded as the corpus grows."
    ),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # count the raw table (parquet metadata, no scan), THEN spread for
    # the per-row signature/pair compute
    n_cells = S.semantic_cells(e.count())
    return S.semantic_dedup(
        spread(e), "vec_id", "embedding",
        n_cells=n_cells, threshold=_TAU_SEM, dim=_DIM,
    )


@register(
    "dedup_semantic_lsh",
    f"""
    WITH params AS (
      SELECT greatest({S.LSH_SEM_MIN_PLANES}, least({S.LSH_SEM_MAX_PLANES},
               CAST(ceil(log2(greatest(count(*) // 64, 1))) AS INT))) AS p
      FROM embeddings
    ),
    sigs AS (
      SELECT vec_id, embedding,
             substr({_sig_expr(S.LSH_SEM_MAX_PLANES).format(v="embedding")},
                    1, (SELECT p FROM params)) AS bucket
      FROM embeddings
    )
    SELECT b.vec_id AS vec_id, b.bucket AS bucket,
           min(a.vec_id)  AS keeper,
           max({_COS_AB}) AS max_sim
    FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_COS_AB} >= {_TAU_SEM}
    GROUP BY b.vec_id, b.bucket
    """,
    doc=(
        "Sub-quadratic semantic dedup: SemDeDup keeper/max-sim "
        "semantics over hyperplane-LSH buckets instead of IVF cells. "
        "Cluster assignment is a pure per-row expression whose plane "
        "count tracks LOG2 of the corpus (ceil(log2(n/64)), computed "
        "by the same integer formula in both engines; the oracle "
        "buckets on the matching prefix of a max-plane signature), so "
        "assignment cost grows logarithmically where IVF's grows "
        "linearly in the cell count — total work O(n log n + n x "
        "bucket size). The 100 TB shape: corpus written partitioned by "
        "signature; the pair stage never leaves a partition."
    ),
)
def dedup_semantic_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    num_planes = S.lsh_sem_planes(e.count())
    return S.semantic_dedup_lsh(
        spread(e), "vec_id", "embedding",
        num_planes=num_planes, threshold=_TAU_SEM, dim=_DIM,
    )


@register(
    "sim_recall_eval",
    f"""
    WITH exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS} DESC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERIES}
      ) t WHERE rank <= 5
    ),
    sigs AS (
      SELECT vec_id, embedding,
             {_sig_expr(4).format(v="embedding")} AS sig4,
             {_sig_expr(8).format(v="embedding")} AS sig8
      FROM embeddings
    ),
    approx AS (
      SELECT CAST(4 AS BIGINT) AS num_planes, query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS} DESC, c.vec_id) AS rank
        FROM sigs q JOIN sigs c ON q.sig4 = c.sig4 AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERIES}
      ) t WHERE rank <= 5
      UNION ALL
      SELECT CAST(8 AS BIGINT), query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS} DESC, c.vec_id) AS rank
        FROM sigs q JOIN sigs c ON q.sig8 = c.sig8 AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERIES}
      ) t WHERE rank <= 5
    ),
    base AS (
      SELECT np.num_planes, e.query_id, e.neighbor_id
      FROM exact e CROSS JOIN
           (SELECT CAST(unnest([4, 8]) AS BIGINT) AS num_planes) np
    )
    SELECT b.num_planes, b.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           round(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 4) AS recall
    FROM base b LEFT JOIN approx a
      ON b.num_planes = a.num_planes AND b.query_id = a.query_id
         AND b.neighbor_id = a.neighbor_id
    GROUP BY b.num_planes, b.query_id
    """,
    doc=(
        "ANN index-quality sweep: recall@5 of the hyperplane-LSH index "
        "vs the exact brute-force ranking, per query, at 4 and 8 planes "
        "— the tuning loop every production ANN deployment runs before "
        "trusting an index (fewer planes -> bigger buckets -> higher "
        "recall, more candidates scored). Both rankings are "
        "deterministic, so the recall numbers themselves are value-hash-"
        "verified. Scale shape: exact tier is the broadcast query-set "
        "scan, each approx tier touches one bucket per query, the "
        "comparison is a left join on (planes, query, neighbor)."
    ),
)
def sim_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    exact = S.cosine_topk(e, q, "vec_id", "embedding", k=5, dim=_DIM).select(
        "query_id", "neighbor_id"
    )
    approx = None
    for p in (4, 8):
        tier = S.cosine_topk_lsh(
            e, q, "vec_id", "embedding", k=5, num_planes=p, dim=_DIM
        ).select(
            F.lit(p).cast("bigint").alias("__hit_planes"),
            F.col("query_id").alias("__hit_qid"),
            F.col("neighbor_id").alias("__hit_id"),
        )
        approx = tier if approx is None else approx.unionAll(tier)
    base = exact.withColumn(
        "num_planes",
        F.explode(F.array(F.lit(4).cast("bigint"), F.lit(8).cast("bigint"))),
    )
    hit = F.when(F.col("__hit_id").isNotNull(), 1).otherwise(0)
    return (
        base.join(
            approx,
            (F.col("num_planes") == F.col("__hit_planes"))
            & (F.col("query_id") == F.col("__hit_qid"))
            & (F.col("neighbor_id") == F.col("__hit_id")),
            "left",
        )
        .groupBy("num_planes", "query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(hit).alias("n_hit"),
            F.round(F.sum(hit) * 1.0 / F.count(F.lit(1)), 4).alias("recall"),
        )
    )


_PQ_CENT, _PQ_SUB, _PQ_SUBDIM = 16, 8, 8
_PQ_SHORT = 5 * 4  # k * shortlist_factor


def _pq_dmicro(a: str, b: str) -> str:
    """DuckDB mirror of operators.similarity._sub_l2_micro for subspace
    column ``s.m``: floor(1e6 * squared-L2 over the m-th sub_dim slice),
    summed left-associatively in dimension order — the identical IEEE
    double sequence Spark's fold computes, floored to exact BIGINT."""
    d = lambda i: (  # noqa: E731
        f"(CAST({a}[s.m*{_PQ_SUBDIM}+{i}] AS DOUBLE) - "
        f"CAST({b}[s.m*{_PQ_SUBDIM}+{i}] AS DOUBLE))"
    )
    terms = " + ".join(f"{d(i)} * {d(i)}" for i in range(1, _PQ_SUBDIM + 1))
    return f"CAST(floor((CAST(0.0 AS DOUBLE) + {terms}) * 1000000) AS BIGINT)"


@register(
    "sim_topk_pq",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {_PQ_CENT}
    ),
    s AS (SELECT unnest(range(0, {_PQ_SUB})) AS m),
    codes AS (
      SELECT vec_id, m, cid AS code FROM (
        SELECT e.vec_id, s.m, c.cid,
               row_number() OVER (PARTITION BY e.vec_id, s.m
                                  ORDER BY {_pq_dmicro("e.embedding", "c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c CROSS JOIN s
      ) t WHERE rn = 1
    ),
    luts AS (
      SELECT q.vec_id AS query_id, s.m, c.cid,
             {_pq_dmicro("q.embedding", "c.cvec")} AS ld
      FROM embeddings q CROSS JOIN cent c CROSS JOIN s
      WHERE q.vec_id < {_N_QUERIES}
    ),
    adc AS (
      SELECT l.query_id, co.vec_id AS neighbor_id,
             CAST(sum(l.ld) AS BIGINT) AS adc_micro
      FROM codes co JOIN luts l ON co.m = l.m AND co.code = l.cid
      WHERE co.vec_id <> l.query_id
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, neighbor_id, adc_micro FROM (
        SELECT query_id, neighbor_id, adc_micro,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc_micro, neighbor_id) AS srank
        FROM adc
      ) t WHERE srank <= {_PQ_SHORT}
    )
    SELECT query_id, neighbor_id, adc_micro, cosine_sim, rank FROM (
      SELECT sh.query_id, sh.neighbor_id, sh.adc_micro,
             {_COS} AS cosine_sim,
             row_number() OVER (PARTITION BY sh.query_id
                                ORDER BY {_COS} DESC, sh.neighbor_id) AS rank
      FROM short sh
      JOIN embeddings q ON q.vec_id = sh.query_id
      JOIN embeddings c ON c.vec_id = sh.neighbor_id
    ) t WHERE rank <= 5
    """,
    doc=(
        "Product-quantization ANN (Jegou et al. 2011) with exact re-rank: "
        "8 subspaces x 16 centroids, corpus encoded to 8 small codes "
        "(the 32x-smaller column you materialize at rest), queries "
        "precompute integer distance lookup tables, the ADC scan is 8 "
        "array lookups + an integer sum per pair, and the top-ADC "
        "shortlist is re-ranked by exact float cosine. Every subspace "
        "distance is floor(1e6 * L2^2) as BIGINT, so both the codes and "
        "the ADC ranking are engine-exact and the whole index is "
        "value-hash-verified."
    ),
)
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_pq(
        e, q, "vec_id", "embedding",
        k=5, shortlist_factor=4, n_cent=_PQ_CENT, n_sub=_PQ_SUB, dim=_DIM,
    )


@register(
    "sim_topk_ivfpq",
    f"""
    WITH icent AS (
      SELECT vec_id AS icid, embedding AS icvec FROM embeddings
      WHERE vec_id < {_N_CELLS}
    ),
    assign AS (
      SELECT vec_id, icid AS cell FROM (
        SELECT e.vec_id, c.icid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_D2.format(a="e.embedding", b="c.icvec")}, c.icid)
                 AS rn
        FROM embeddings e CROSS JOIN icent c
      ) t WHERE rn = 1
    ),
    cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {_PQ_CENT}
    ),
    s AS (SELECT unnest(range(0, {_PQ_SUB})) AS m),
    codes AS (
      SELECT vec_id, m, cid AS code FROM (
        SELECT e.vec_id, s.m, c.cid,
               row_number() OVER (PARTITION BY e.vec_id, s.m
                                  ORDER BY {_pq_dmicro("e.embedding", "c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c CROSS JOIN s
      ) t WHERE rn = 1
    ),
    luts AS (
      SELECT q.vec_id AS query_id, s.m, c.cid,
             {_pq_dmicro("q.embedding", "c.cvec")} AS ld
      FROM embeddings q CROSS JOIN cent c CROSS JOIN s
      WHERE q.vec_id < {_N_QUERIES}
    ),
    adc AS (
      SELECT l.query_id, co.vec_id AS neighbor_id,
             CAST(sum(l.ld) AS BIGINT) AS adc_micro
      FROM codes co
      JOIN luts l ON co.m = l.m AND co.code = l.cid
      JOIN assign ca ON ca.vec_id = co.vec_id
      JOIN assign qa ON qa.vec_id = l.query_id AND qa.cell = ca.cell
      WHERE co.vec_id <> l.query_id
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, neighbor_id, adc_micro FROM (
        SELECT query_id, neighbor_id, adc_micro,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc_micro, neighbor_id) AS srank
        FROM adc
      ) t WHERE srank <= {_PQ_SHORT}
    )
    SELECT query_id, neighbor_id, adc_micro, cosine_sim, rank FROM (
      SELECT sh.query_id, sh.neighbor_id, sh.adc_micro,
             {_COS} AS cosine_sim,
             row_number() OVER (PARTITION BY sh.query_id
                                ORDER BY {_COS} DESC, sh.neighbor_id) AS rank
      FROM short sh
      JOIN embeddings q ON q.vec_id = sh.query_id
      JOIN embeddings c ON c.vec_id = sh.neighbor_id
    ) t WHERE rank <= 5
    """,
    doc=(
        "IVF x PQ composition (Jegou et al.'s IVFADC) — the canonical "
        "billion-scale ANN index: the coarse IVF quantizer prunes the "
        "ADC scan to the query's probe cell, PQ codes make surviving "
        "candidates 8 integer map-lookups each, and the shortlist is "
        "re-ranked by exact cosine after joining raw vectors back BY id "
        "— the scan itself carries only (id, cell, codes). At rest the "
        "code table is written partitioned BY cell, so a query reads "
        "~1/n_cells of the files (partition pruning); per-query ADC "
        "work is bounded by the probed cells, not the corpus."
    ),
)
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_ivfpq(
        e, q, "vec_id", "embedding",
        k=5, shortlist_factor=4,
        n_cells=_N_CELLS, n_cent=_PQ_CENT, n_sub=_PQ_SUB, dim=_DIM,
    )


_MAT_PREFIX = 16
_MAT_SHORT = 50
_COS_PREF = (
    "round(list_inner_product(q.p::DOUBLE[], c.p::DOUBLE[]) /"
    " (sqrt(list_inner_product(q.p::DOUBLE[], q.p::DOUBLE[])) *"
    "  sqrt(list_inner_product(c.p::DOUBLE[], c.p::DOUBLE[]))), 4)"
)
_COS_RR = (
    "round(list_inner_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /"
    " (sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *"
    "  sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 4)"
)


@register(
    "sim_topk_matryoshka",
    f"""
    WITH pref AS (
      SELECT vec_id, embedding[1:{_MAT_PREFIX}] AS p FROM embeddings
    ),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS_PREF} DESC, c.vec_id) AS srank
        FROM pref q JOIN pref c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERIES}
      ) s WHERE srank <= {_MAT_SHORT}
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT s.query_id, s.neighbor_id,
             {_COS_RR} AS cosine_sim,
             row_number() OVER (PARTITION BY s.query_id
                                ORDER BY {_COS_RR} DESC, s.neighbor_id) AS rank
      FROM short s
      JOIN embeddings q ON q.vec_id = s.query_id
      JOIN embeddings c ON c.vec_id = s.neighbor_id
    ) t WHERE rank <= {_K}
    """,
    doc=(
        "Matryoshka two-tier ANN: rank every vector by the rounded "
        "cosine of its FIRST 16 dimensions (4x less bandwidth than the "
        "full vector), then exact full-dim re-rank of the 50-deep "
        "shortlist joined back by id."
    ),
)
def sim_topk_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRL prefix-dimension ANN with full-dim re-rank.

    Scale notes (100 TB): the prefix pass reads a 16/64 slice of the
    corpus (materialize the prefix as its own column at rest and the
    scan does 4x less IO); the full vectors are read only for the
    shortlisted ids via the re-rank-by-id join. Unlike PQ/IVF there is
    no codebook to train — the index IS the layout.
    """
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_matryoshka(
        e, q, "vec_id", "embedding",
        k=_K, prefix_dim=_MAT_PREFIX, shortlist=_MAT_SHORT, dim=_DIM,
    )


from the_movies_db_spark.queries import REGISTRY as _REG


@register(
    "sim_index_persisted",
    _REG["sim_topk_ivfpq"].oracle,
    doc=(
        "The IVF x PQ index MATERIALIZED: (id, codes) written to "
        "parquet partitioned BY cell with a source fingerprint, so "
        "repeated searches skip the build entirely and each query's ADC "
        "scan is a PARTITION-PRUNED read of its probe cell's files. "
        "Results are identical to the in-query composition, so the "
        "oracle is the same SQL — the persisted layout is pinned "
        "equal to the logical index."
    ),
)
def sim_index_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN search over a build-once / search-many IVF x PQ index.

    This is the at-rest shape every scale note in this module promises:
    the index build (coarse assignment + PQ encoding) runs ONCE per
    corpus fingerprint (path+size+mtime+format version, stamped after
    the write commits) and lands partitioned by cell; a search then
    (1) looks up its query cells from the index, (2) reads ONLY those
    cell partitions — static partition pruning, the scan lists just the
    probed dirs, (3) ADC-scores codes against the query LUTs, and
    (4) re-ranks the shortlist by exact cosine joining raw vectors BY
    id. At 100 TB the build is one linear pass and each query touches
    ~|corpus|/n_cells code rows from ~1/n_cells of the files.
    """
    import os

    from the_movies_db_spark.io import build_once, scratch_dir

    e = spread(load_table(spark, sf_dir, "embeddings"))
    work = scratch_dir(
        "annindex_" + os.path.basename(sf_dir.rstrip("/")), unique=False
    )
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    stamp = {
        "src": src,
        "size": st.st_size,
        "mtime": st.st_mtime_ns,
        "fmt": ["ivfpq-v1", _N_CELLS, _PQ_CENT, _PQ_SUB, _DIM],
    }
    def _build() -> None:
        encode, _ = S._pq_parts(e, "vec_id", "embedding", _PQ_CENT, _PQ_SUB, _DIM)
        assigned = S.ivf_assign(e, "vec_id", "embedding", _N_CELLS, dim=_DIM)
        idx = assigned.select("vec_id", "cell", *encode())
        idx.write.mode("overwrite").partitionBy("cell").parquet(work + "/codes")

    # stamp-check + rebuild serialized under the writer lease (ADVICE r6)
    build_once(work, stamp, _build)

    codes = spark.read.parquet(work + "/codes")
    qcells = codes.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("cell").alias("__qcell")
    )
    # bounded query set: collect the probe cells so the codes scan
    # becomes a literal partition filter (static pruning at rest)
    probe_cells = sorted({r["__qcell"] for r in qcells.collect()})
    qraw = e.filter(F.col("vec_id") < _N_QUERIES)
    _, luts = S._pq_parts(e, "vec_id", "embedding", _PQ_CENT, _PQ_SUB, _DIM)
    q = qraw.select(F.col("vec_id").alias("query_id"), *luts()).join(
        F.broadcast(qcells), "query_id"
    )
    probe = codes.filter(F.col("cell").isin(probe_cells)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell").alias("__ccell"),
        *[F.col(f"__code{m}") for m in range(_PQ_SUB)],
    )
    from pyspark.sql import Window

    w_short = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    shortlist = (
        F.broadcast(q)
        .join(probe, F.col("__qcell") == F.col("__ccell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", S._pq_adc(_PQ_SUB).alias("adc_micro"))
        .withColumn("__srank", F.row_number().over(w_short))
        .filter(F.col("__srank") <= _PQ_SHORT)
        .drop("__srank")
    )
    return S._rerank_by_id(shortlist, e, qraw, "vec_id", "embedding", 5, _DIM)


@register(
    "sim_recall_ivfpq",
    f"""
    WITH approx AS ({_REG["sim_topk_ivfpq"].oracle}),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {{cos}} DESC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {{nq}}
      ) t WHERE rank <= 5
    )
    SELECT e.query_id,
           CAST(count(*) AS BIGINT)              AS n_exact,
           CAST(count(a.neighbor_id) AS BIGINT)  AS n_hits,
           CAST(count(a.neighbor_id) * 1000000 // count(*) AS BIGINT) AS recall_ppm
    FROM exact e
    LEFT JOIN approx a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """.format(cos=_COS, nq=_N_QUERIES),
    doc=(
        "recall@5 of the composed IVF x PQ index against the exact "
        "brute-force ground truth, per query — the acceptance metric "
        "that gates any quantized-index rollout. The oracle NESTS the "
        "full sim_topk_ivfpq oracle as a CTE, so the evaluated index "
        "is exactly the shipped one, not a simplified stand-in."
    ),
)
def sim_recall_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ground-truth recall of the IVFADC pipeline.

    Scale notes (100 TB): ground truth is brute-force only over the
    small QUERY set (|Q| x corpus, the unavoidable evaluation cost —
    run it over a sampled query panel, never the full corpus); the
    index side reuses the exact production operator. Output is one row
    per query, integer-exact: recall_ppm = hits * 1000000 div n_exact,
    so the metric stays correct when a query has < k true neighbors."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    approx = S.cosine_topk_ivfpq(
        e, q, "vec_id", "embedding",
        k=5, shortlist_factor=4,
        n_cells=_N_CELLS, n_cent=_PQ_CENT, n_sub=_PQ_SUB, dim=_DIM,
    ).select("query_id", "neighbor_id")
    exact = S.cosine_topk(e, q, "vec_id", "embedding", k=5, dim=_DIM).select(
        "query_id", "neighbor_id"
    )
    hit = approx.withColumn("__hit", F.lit(1))
    return (
        exact.join(hit, ["query_id", "neighbor_id"], "left_outer")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("__hit").cast("bigint").alias("n_hits"),
            F.expr("count(__hit) * 1000000 div count(*)")
            .cast("bigint")
            .alias("recall_ppm"),
        )
    )


@register(
    "sim_topk_filtered",
    f"""
    WITH corp AS (
      SELECT e.vec_id, e.embedding
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
      WHERE d.lang = 'en'
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {{cos}} AS cosine_sim,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {{cos}} DESC, c.vec_id) AS rank
      FROM embeddings q JOIN corp c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {{nq}}
    ) t WHERE rank <= 5
    """.format(cos=_COS, nq=_N_QUERIES),
    doc=(
        "FILTERED vector search (the composition modern retrieval "
        "needs: metadata predicate AND nearest-neighbor): top-5 "
        "among only English documents, the filter applied BEFORE "
        "similarity so selective predicates shrink the scan instead "
        "of post-filtering a top-k that may then run dry. With an IVF "
        "index the same pre-filter applies to the posting scan "
        "(filter-aware ANN); recall-vs-filter-selectivity is the "
        "standard tradeoff knob."
    ),
)
def sim_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-prefiltered exact cosine top-k."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "en"
    ).select(F.col("doc_id").alias("vec_id"))
    corp = e.join(docs, "vec_id")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk(corp, q, "vec_id", "embedding", k=5, dim=_DIM)


@register(
    "sim_bucket_purity",
    f"""
    WITH sigs AS (
      SELECT e.vec_id, d.lang, {_SIG_EXPR.format(v="e.embedding")} AS sig
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    ), cells AS (
      SELECT sig, lang, CAST(count(*) AS BIGINT) AS n
      FROM sigs GROUP BY sig, lang
    ), buckets AS (
      SELECT sig,
             CAST(sum(n) AS BIGINT) AS n_total,
             CAST(max(n) AS BIGINT) AS n_major
      FROM cells GROUP BY sig
    )
    SELECT CAST(count(*) AS BIGINT)                   AS n_buckets,
           CAST(sum(n_total) AS BIGINT)               AS n_vectors,
           CAST(sum(n_major) AS BIGINT)               AS n_majority,
           CAST(sum(n_major) * 1000000 // sum(n_total) AS BIGINT)
             AS weighted_purity_ppm,
           CAST(max(n_total) AS BIGINT)               AS max_bucket
    FROM buckets
    """,
    doc=(
        "LSH bucket purity against document language (the external-"
        "label clustering eval): per bucket, the majority-label share; "
        "reported as the size-weighted purity ppm — the standard "
        "cluster-quality number that says whether the hash geometry "
        "tracks the semantic grouping. Exact integers throughout; "
        "complements sim_lsh_bucket_stats (occupancy/skew)."
    ),
)
def sim_bucket_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-weighted majority-label purity of LSH buckets.

    Scale notes (100 TB): one broadcast-ish join to fetch labels (by
    id, co-partitionable), one (bucket, label) aggregate, one bucket
    aggregate — all bounded by bucket-count x label-count, never
    pairwise. The purity ppm is a single integer division over the
    two global sums."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    sig = S.hyperplane_signature("embedding", _PLANES, _DIM)
    cells = (
        e.join(d, "vec_id")
        .select(sig.alias("sig"), "lang")
        .groupBy("sig", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    buckets = cells.groupBy("sig").agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.max("n").cast("bigint").alias("n_major"),
    )
    return buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n_total").cast("bigint").alias("n_vectors"),
        F.sum("n_major").cast("bigint").alias("n_majority"),
        F.expr("sum(n_major) * 1000000 div sum(n_total)")
        .cast("bigint")
        .alias("weighted_purity_ppm"),
        F.max("n_total").cast("bigint").alias("max_bucket"),
    )


# --- integer-exact trained quantizer (value-hashable KMeans path) ----------

_KM_K, _KM_ITERS = 8, 2
_D2INT = (
    "list_sum(list_transform(range(1, 65),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
)


def _kmeans_int_index_ctes() -> str:
    """The CTE chain reproducing operators.similarity.
    kmeans_integer_assign EXACTLY: quantize -> seed centroids ->
    2 unrolled Lloyd iterations (assign by integer L2 argmin, update
    by integer mean with empty cells keeping their centroid). All
    arithmetic is BIGINT, so distributed accumulation order cannot
    diverge from DuckDB's sequential evaluation."""
    assign = (
        "SELECT vec_id, q, cid AS cell FROM ("
        "  SELECT v.vec_id, v.q, c.cid,"
        "         row_number() OVER (PARTITION BY v.vec_id"
        "                            ORDER BY " + _D2INT.format(a="v.q", b="c.c") + ", c.cid) AS rn"
        "  FROM qvx v CROSS JOIN {cent} c"
        ") t WHERE rn = 1"
    )
    return f"""
    qvx AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round((x::DOUBLE + 2.0) * 1000000.0) AS BIGINT)) AS q
      FROM embeddings
    ),
    cent0 AS (SELECT vec_id AS cid, q AS c FROM qvx WHERE vec_id < {_KM_K}),
    a1 AS ({assign.format(cent="cent0")}),
    upd1 AS (
      SELECT cell, d, CAST(sum(x) // count(*) AS BIGINT) AS m
      FROM (SELECT cell, unnest(q) AS x, unnest(range(1, 65)) AS d FROM a1) u
      GROUP BY cell, d
    ),
    cent1 AS (
      SELECT c0.cid, coalesce(n.c, c0.c) AS c
      FROM cent0 c0 LEFT JOIN (
        SELECT cell AS cid, list(m ORDER BY d) AS c FROM upd1 GROUP BY cell
      ) n USING (cid)
    ),
    a2 AS ({assign.format(cent="cent1")})
    """


_KMEANS_INT_TOPK_SQL = f"""
    WITH {_kmeans_int_index_ctes()}
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS} AS cosine_sim,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_COS} DESC, c.vec_id) AS rank
      FROM (SELECT a.vec_id, e.embedding, a.cell
            FROM a2 a JOIN embeddings e USING (vec_id)
            WHERE a.vec_id < {_N_QUERIES}) q
      JOIN (SELECT a.vec_id, e.embedding, a.cell
            FROM a2 a JOIN embeddings e USING (vec_id)) c
        ON q.cell = c.cell AND q.vec_id <> c.vec_id
    ) t WHERE rank <= 5
    """


@register(
    "sim_topk_kmeans_int",
    _KMEANS_INT_TOPK_SQL,
    doc=(
        "Top-5 through a TRAINED-and-still-value-verifiable quantizer: "
        "integer-exact Lloyd's KMeans (positive micro-unit BIGINTs, "
        "seed init, 2 iterations, integer-mean updates) assigns cells; "
        "exact cosine ranks within the query's cell. The oracle unrolls "
        "both Lloyd iterations into static SQL — the hashable sibling "
        "of the MLlib sim_topk_ivf_kmeans path, which stays rows-only "
        "because kmeans||-init float accumulation is engine-internal."
    ),
)
def sim_topk_kmeans_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-quantizer ANN with an exactly reproducible index.

    Scale notes (100 TB): each Lloyd iteration is one corpus projection
    (argmin over k collected centroids) + one k x dim aggregate —
    model-broadcast shape, no corpus-sized shuffle; the search is the
    standard cell equi-join. Integer means make the training
    bit-identical regardless of partitioning."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_kmeans_int(
        e, q, "vec_id", "embedding",
        k=5, n_cells=_KM_K, iters=_KM_ITERS, dim=_DIM,
    )


@register(
    "sim_recall_kmeans",
    f"""
    WITH approx AS ({_KMEANS_INT_TOPK_SQL}),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS} DESC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERIES}
      ) t WHERE rank <= 5
    )
    SELECT e.query_id,
           CAST(count(*) AS BIGINT)              AS n_exact,
           CAST(count(a.neighbor_id) AS BIGINT)  AS n_hits,
           CAST(count(a.neighbor_id) * 1000000 // count(*) AS BIGINT)
             AS recall_ppm
    FROM exact e
    LEFT JOIN approx a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
    doc=(
        "recall@5 of the trained integer-KMeans index against exact "
        "brute force, per query — the value-hashable evaluation row "
        "covering the KMeans path (the sim_recall_ivfpq pattern: the "
        "full index oracle nests as a CTE, so the evaluated index is "
        "exactly the shipped one)."
    ),
)
def sim_recall_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ground-truth recall of the trained integer-KMeans quantizer.

    Scale notes (100 TB): ground truth is |Q| x corpus over the small
    query panel only; the index side reuses the production operator.
    recall_ppm = hits * 1000000 div n_exact — exact integers, correct
    for short ground-truth lists."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    approx = S.cosine_topk_kmeans_int(
        e, q, "vec_id", "embedding",
        k=5, n_cells=_KM_K, iters=_KM_ITERS, dim=_DIM,
    ).select("query_id", "neighbor_id")
    exact = S.cosine_topk(e, q, "vec_id", "embedding", k=5, dim=_DIM).select(
        "query_id", "neighbor_id"
    )
    hit = approx.withColumn("__hit", F.lit(1))
    return (
        exact.join(hit, ["query_id", "neighbor_id"], "left_outer")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("__hit").cast("bigint").alias("n_hits"),
            F.expr("count(__hit) * 1000000 div count(*)")
            .cast("bigint")
            .alias("recall_ppm"),
        )
    )


def _resid_dmicro(a: str, b: str) -> str:
    """_pq_dmicro over residual DOUBLE[] columns (already double — the
    extra CASTs are no-ops kept for one shared code shape)."""
    return _pq_dmicro(a, b)


@register(
    "sim_topk_ivfpq_residual",
    f"""
    WITH icent AS (
      SELECT vec_id AS icid, embedding AS icvec FROM embeddings
      WHERE vec_id < {_N_CELLS}
    ),
    assign AS (
      SELECT vec_id, icid AS cell FROM (
        SELECT e.vec_id, c.icid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_D2.format(a="e.embedding", b="c.icvec")}, c.icid)
                 AS rn
        FROM embeddings e CROSS JOIN icent c
      ) t WHERE rn = 1
    ),
    resid AS (
      SELECT e.vec_id, a.cell,
             list_transform(range(1, {_DIM} + 1),
               i -> CAST(e.embedding[i] AS DOUBLE)
                    - CAST(c.icvec[i] AS DOUBLE)) AS rv
      FROM embeddings e
      JOIN assign a ON a.vec_id = e.vec_id
      JOIN icent c ON c.icid = a.cell
    ),
    cent AS (
      SELECT vec_id AS cid, rv AS cvec FROM resid WHERE vec_id < {_PQ_CENT}
    ),
    s AS (SELECT unnest(range(0, {_PQ_SUB})) AS m),
    codes AS (
      SELECT vec_id, cell, m, cid AS code FROM (
        SELECT r.vec_id, r.cell, s.m, c.cid,
               row_number() OVER (PARTITION BY r.vec_id, s.m
                                  ORDER BY {_resid_dmicro("r.rv", "c.cvec")}, c.cid)
                 AS rn
        FROM resid r CROSS JOIN cent c CROSS JOIN s
      ) t WHERE rn = 1
    ),
    luts AS (
      SELECT r.vec_id AS query_id, r.cell, s.m, c.cid,
             {_resid_dmicro("r.rv", "c.cvec")} AS ld
      FROM resid r CROSS JOIN cent c CROSS JOIN s
      WHERE r.vec_id < {_N_QUERIES}
    ),
    adc AS (
      SELECT l.query_id, co.vec_id AS neighbor_id,
             CAST(sum(l.ld) AS BIGINT) AS adc_micro
      FROM codes co
      JOIN luts l ON co.m = l.m AND co.code = l.cid AND co.cell = l.cell
      WHERE co.vec_id <> l.query_id
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, neighbor_id, adc_micro FROM (
        SELECT query_id, neighbor_id, adc_micro,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc_micro, neighbor_id) AS srank
        FROM adc
      ) t WHERE srank <= {_PQ_SHORT}
    )
    SELECT query_id, neighbor_id, adc_micro, cosine_sim, rank FROM (
      SELECT sh.query_id, sh.neighbor_id, sh.adc_micro,
             {_COS} AS cosine_sim,
             row_number() OVER (PARTITION BY sh.query_id
                                ORDER BY {_COS} DESC, sh.neighbor_id) AS rank
      FROM short sh
      JOIN embeddings q ON q.vec_id = sh.query_id
      JOIN embeddings c ON c.vec_id = sh.neighbor_id
    ) t WHERE rank <= 5
    """,
    doc=(
        "TRUE residual IVFADC (FAISS's default IVF-PQ form): PQ codes "
        "quantize v - centroid(cell) instead of v, so a small fixed "
        "codebook captures the within-cell distribution; the query's "
        "lookup table is built from ITS residual in the probed cell. "
        "Residuals are exact IEEE double subtractions, subspace "
        "distances exact floor-micro BIGINTs — the full residual "
        "pipeline is value-hash-verified. Same at-rest shape as "
        "sim_topk_ivfpq: (id, cell, codes) partitioned by cell."
    ),
)
def sim_topk_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoded IVFADC with exact re-rank.

    Scale notes (100 TB): identical scan shape to sim_topk_ivfpq —
    the residual projection happens once at encode time (or at rest),
    per-query ADC work is bounded by the probed cell, raw vectors
    only join back for the shortlist."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk_ivfpq_residual(
        e, q, "vec_id", "embedding",
        k=5, shortlist_factor=4,
        n_cells=_N_CELLS, n_cent=_PQ_CENT, n_sub=_PQ_SUB, dim=_DIM,
    )


# a much finer quantizer than the shared 8-cell index, so the nprobe
# dial actually moves recall (the synthetic embeddings are clustered;
# coarse cells contain whole clusters and give 1.0 at nprobe=1)
_CURVE_CELLS = 256


@register(
    "sim_recall_nprobe_curve",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      WHERE vec_id < {_CURVE_CELLS}
    ),
    assign AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c
      ) t WHERE rn = 1
    ),
    qcells AS (
      SELECT vec_id, cid AS cell, prn FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS prn
        FROM embeddings e CROSS JOIN cent c
        WHERE e.vec_id < {_N_QUERIES}
      ) t WHERE prn <= 4
    ),
    levels(np) AS (VALUES (1), (2), (4)),
    cand AS (
      SELECT l.np, qc.vec_id AS query_id, a.vec_id AS neighbor_id,
             {_COS} AS cosine_sim
      FROM levels l
      JOIN qcells qc ON qc.prn <= l.np
      JOIN assign a ON a.cell = qc.cell AND a.vec_id <> qc.vec_id
      JOIN embeddings q ON q.vec_id = qc.vec_id
      JOIN embeddings c ON c.vec_id = a.vec_id
    ),
    approx AS (
      SELECT np, query_id, neighbor_id FROM (
        SELECT np, query_id, neighbor_id,
               row_number() OVER (PARTITION BY np, query_id
                                  ORDER BY cosine_sim DESC, neighbor_id)
                 AS rank
        FROM cand
      ) t WHERE rank <= 5
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS} DESC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERIES}
      ) t WHERE rank <= 5
    )
    SELECT CAST(l.np AS BIGINT) AS nprobe,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
           CAST(count(a.neighbor_id) * 1000000 // count(*) AS BIGINT)
             AS recall_ppm
    FROM levels l
    CROSS JOIN exact e
    LEFT JOIN approx a
      ON a.np = l.np AND a.query_id = e.query_id
     AND a.neighbor_id = e.neighbor_id
    GROUP BY l.np
    """,
    doc=(
        "The IVF recall DIAL measured end-to-end: recall@5 vs brute "
        "force at nprobe 1, 2, 4 in one query — the curve that picks "
        "the production probe count (recall rises with probed cells at "
        "proportional scan cost). One corpus assignment and one probe "
        "ranking are shared across all levels (no per-level index "
        "rebuild); exact-integer ppm."
    ),
)
def sim_recall_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 at nprobe 1/2/4 from one shared assignment.

    Scale notes (100 TB): the corpus is assigned ONCE; probe ranks are
    a pure projection over the collected centroids, exploded to <= 4
    rows per query; each level filters that tiny candidate spine —
    fact data is scanned once for candidates and once for the ground
    truth panel (|Q| x corpus, the unavoidable eval cost)."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    # ONE collected-centroid literal + ONE scored-top4 projection feeds
    # BOTH the corpus assignment (top4[0] ≡ ivf_assign's array_min —
    # same round(d2, 6), same (d, cid) tie-break) and the query probe
    # ranks (posexplode of the slice), instead of two independent
    # subtrees each collecting centroids and compiling the n_cells×dim
    # literal — this query's cost was plan-build + codegen, not data
    cent_rows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in e.filter(F.col("vec_id") < _CURVE_CELLS)
        .select("vec_id", "embedding")
        .collect()
    )
    cent_arr = S._lit_centroid_array(cent_rows)
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            F.round(S.squared_l2(F.col("embedding"), c["cvec"]), 6).alias("d"),
            c["cid"].alias("cid"),
        ),
    )
    base = e.select(
        "vec_id",
        "embedding",
        F.slice(F.array_sort(scored), 1, 4).alias("__top4"),
    ).localCheckpoint(eager=True)
    qcells = base.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(
            F.transform("__top4", lambda s: s["cid"])
        ).alias("__p0", "cell"),
    ).select(
        "query_id", "cell", (F.col("__p0") + 1).cast("bigint").alias("prn")
    )
    levels = spark.createDataFrame([(1,), (2,), (4,)], "np long")
    qv = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        S.norm("embedding", _DIM).alias("__qn"),
    )
    cv = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        S.norm("embedding", _DIM).alias("__cn"),
        F.col("__top4")[0]["cid"].alias("__ccell"),
    )
    from the_movies_db_spark.operators.dedup import cosine_from_parts

    sim = F.round(
        cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=_DIM), 4
    )
    cand = (
        F.broadcast(qcells.join(F.broadcast(levels), qcells.prn <= F.col("np")))
        .join(cv, F.col("cell") == F.col("__ccell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(qv), "query_id")
        .select("np", "query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    wr = Window.partitionBy("np", "query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    approx = (
        cand.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 5)
        .select("np", "query_id", "neighbor_id")
        .withColumn("__hit", F.lit(1))
    )
    exact = S.cosine_topk(e, q, "vec_id", "embedding", k=5, dim=_DIM).select(
        "query_id", "neighbor_id"
    )
    return (
        F.broadcast(levels)
        .crossJoin(exact)
        .join(approx, ["np", "query_id", "neighbor_id"], "left_outer")
        .groupBy(F.col("np").cast("bigint").alias("nprobe"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("__hit").cast("bigint").alias("n_hits"),
            F.expr("count(__hit) * 1000000 div count(*)")
            .cast("bigint")
            .alias("recall_ppm"),
        )
    )


_QMICRO = (
    "list_transform(embedding,"
    " x -> CAST(round((x::DOUBLE + 2.0) * 1000000.0) AS BIGINT))"
)
_D2INT_Q = (
    "list_sum(list_transform(range(1, 65),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
)


@register(
    "sim_label_separation",
    f"""
    WITH qv AS (
      SELECT vec_id, CAST(label AS BIGINT) AS label, {_QMICRO} AS q
      FROM embeddings
    ), cmean AS (
      SELECT label, d, CAST(sum(x) // count(*) AS BIGINT) AS m
      FROM (SELECT label, unnest(q) AS x, unnest(range(1, 65)) AS d FROM qv) u
      GROUP BY label, d
    ), cent AS (
      SELECT label, list(m ORDER BY d) AS c FROM cmean GROUP BY label
    ), within AS (
      SELECT v.label,
             CAST(count(*) AS BIGINT) AS n_vectors,
             CAST(sum({_D2INT_Q.format(a="v.q", b="c.c")}) // count(*)
                  AS BIGINT) AS within_mean_d2
      FROM qv v JOIN cent c USING (label)
      GROUP BY v.label
    ), between_d AS (
      SELECT a.label,
             CAST(min({_D2INT_Q.format(a="a.c", b="b.c")}) AS BIGINT)
               AS min_between_d2
      FROM cent a JOIN cent b ON a.label <> b.label
      GROUP BY a.label
    )
    SELECT w.label, w.n_vectors, w.within_mean_d2, b.min_between_d2,
           CAST(b.min_between_d2 * 1000 // w.within_mean_d2 AS BIGINT)
             AS separation_milli
    FROM within w JOIN between_d b USING (label)
    """,
    doc=(
        "Embedding-quality eval: per label, the mean squared distance "
        "to its own integer centroid (cohesion) vs the nearest other "
        "centroid (separation), ratio in exact milli — the "
        "Dunn-index-style check run before trusting labels or "
        "clustering downstream. Micro-unit BIGINT quantization makes "
        "centroids and distances engine-exact (the integer-KMeans "
        "machinery reused as an evaluator)."
    ),
)
def sim_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label cohesion/separation over integer-exact centroids.

    Scale notes (100 TB): one |labels| x dim aggregate (collected —
    bounded model shape), one corpus projection for within-distances,
    and a |labels|² driver-side between-matrix; no corpus self-join."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    qv = e.select(
        F.col("label").cast("bigint").alias("label"),
        S.quantize_micro("embedding").alias("__q"),
    )
    sums = (
        qv.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.col("__q")[d]).alias(f"s{d}") for d in range(64)],
        )
        .collect()
    )
    cents = sorted(
        (int(r["label"]), [int(r[f"s{d}"]) // int(r["n"]) for d in range(64)])
        for r in sums
    )
    # |labels|² between-centroid min distances, computed driver-side
    between = {}
    for la, ca in cents:
        best = None
        for lb, cb in cents:
            if la == lb:
                continue
            d2 = sum((x - y) * (x - y) for x, y in zip(ca, cb))
            best = d2 if best is None or d2 < best else best
        between[la] = best
    cmap = F.map_from_entries(
        S._lit_centroid_array(cents, value_type="BIGINT")
    )
    bmap = F.map_from_entries(
        F.expr(
            "array({})".format(
                ", ".join(
                    f"named_struct('k', CAST({k} AS BIGINT),"
                    f" 'v', CAST({v} AS BIGINT))"
                    for k, v in sorted(between.items())
                )
            )
        )
    )
    d2own = F.aggregate(
        F.zip_with(
            F.col("__q"),
            F.element_at(cmap, F.col("label")),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        qv.select("label", d2own.alias("__d2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.expr("sum(__d2) div count(*)").cast("bigint").alias(
                "within_mean_d2"
            ),
        )
        .withColumn("min_between_d2", F.element_at(bmap, F.col("label")))
        .withColumn(
            "separation_milli",
            F.expr("min_between_d2 * 1000 div within_mean_d2").cast("bigint"),
        )
    )


@register(
    "sim_vector_norm_audit",
    """
    WITH norms AS (
      SELECT vec_id,
             CAST(floor(sqrt(list_inner_product(embedding::DOUBLE[],
                                                embedding::DOUBLE[]))
                        * 1000) AS BIGINT) AS norm_milli,
             len(list_filter(embedding, x -> x = 0.0)) AS n_zero_dims,
             len(list_filter(embedding, x -> isnan(x::DOUBLE)
                                             OR NOT isfinite(x::DOUBLE)))
               AS n_bad_dims
      FROM embeddings
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CASE WHEN norm_milli = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_norm,
           CAST(sum(CASE WHEN n_bad_dims > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nonfinite,
           CAST(min(norm_milli) AS BIGINT) AS min_norm_milli,
           CAST(max(norm_milli) AS BIGINT) AS max_norm_milli,
           CAST(sum(norm_milli) // count(*) AS BIGINT) AS mean_norm_milli,
           CAST(sum(n_zero_dims) AS BIGINT) AS total_zero_dims
    FROM norms
    """,
    doc=(
        "Embedding pre-flight audit: zero-norm vectors (cosine divides "
        "by them), NaN/Inf components, and the norm range in exact "
        "milli (floor of the correctly-rounded IEEE sqrt — engine-"
        "exact). The gate to run before ANY similarity workload: one "
        "degenerate vector silently poisons every ranking it appears "
        "in."
    ),
)
def sim_vector_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-norm / non-finite / norm-range audit over embeddings."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    norms = e.select(
        F.expr(
            "CAST(floor(sqrt(aggregate(transform(embedding,"
            " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " 0.0D, (a, v) -> a + v)) * 1000) AS BIGINT)"
        ).alias("norm_milli"),
        F.expr(
            "size(filter(embedding, x -> x = CAST(0.0 AS FLOAT)))"
        ).alias("n_zero_dims"),
        F.expr(
            "size(filter(embedding, x -> isnan(CAST(x AS DOUBLE))"
            " OR CAST(x AS DOUBLE) IN (CAST('Infinity' AS DOUBLE),"
            " CAST('-Infinity' AS DOUBLE))))"
        ).alias("n_bad_dims"),
    )
    return norms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(F.when(F.col("norm_milli") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_norm"),
        F.sum(F.when(F.col("n_bad_dims") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_nonfinite"),
        F.min("norm_milli").cast("bigint").alias("min_norm_milli"),
        F.max("norm_milli").cast("bigint").alias("max_norm_milli"),
        F.expr("sum(norm_milli) div count(*)").cast("bigint").alias(
            "mean_norm_milli"
        ),
        F.sum("n_zero_dims").cast("bigint").alias("total_zero_dims"),
    )


_MARGIN_QUERIES = 50


@register(
    "sim_pair_margin_audit",
    f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding FROM embeddings
      WHERE vec_id < {_MARGIN_QUERIES}
    ), cand AS (
      SELECT q.qid, c.vec_id AS nid,
             CAST(floor(
               list_inner_product(q.embedding::DOUBLE[],
                                  c.embedding::DOUBLE[]) /
               (sqrt(list_inner_product(q.embedding::DOUBLE[],
                                        q.embedding::DOUBLE[])) *
                sqrt(list_inner_product(c.embedding::DOUBLE[],
                                        c.embedding::DOUBLE[])))
               * 1000000) AS BIGINT) AS sm
      FROM q JOIN embeddings c ON q.qid <> c.vec_id
    ), r AS (
      SELECT qid, sm,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sm DESC, nid) AS rn
      FROM cand
    ), p AS (
      SELECT qid,
             max(CASE WHEN rn = 1 THEN sm END) AS m1,
             max(CASE WHEN rn = 2 THEN sm END) AS m2
      FROM r WHERE rn <= 2 GROUP BY qid
    )
    SELECT CAST((m1 - m2) // 10000 AS BIGINT) AS margin_band,
           CAST(count(*) AS BIGINT)           AS n_queries,
           CAST(min(m1 - m2) AS BIGINT)       AS min_margin_micro,
           CAST(max(m1 - m2) AS BIGINT)       AS max_margin_micro
    FROM p GROUP BY 1
    """,
    doc=(
        "Nearest-neighbor CONFIDENCE audit: the top1-vs-top2 cosine "
        "margin per query, banded at 0.01 — queries in the zero band "
        "have an ambiguous nearest neighbor (ANN errors and label "
        "noise concentrate there); wide margins mean the assignment "
        "is robust to quantization. Margins in exact floor-micro of "
        "identically-sequenced IEEE cosines, so band membership is "
        "engine-exact."
    ),
)
def sim_pair_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top1-top2 margin histogram over a 50-query panel.

    Scale notes (100 TB): |Q| x corpus with Q = 50 — the sampled eval
    panel shape (never corpus^2); norms staged per side before the
    join so the pair stage carries one dot-product chain; top-2 via a
    window partitioned by query (50 partitions). The production path
    would swap the brute-force candidate side for the IVF index; the
    audit's margin math is index-agnostic."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    from the_movies_db_spark.operators.dedup import cosine_from_parts

    qv = e.filter(F.col("vec_id") < _MARGIN_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("__qv"),
        S.norm("embedding", _DIM).alias("__qn"),
    )
    cv = e.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("__cv"),
        S.norm("embedding", _DIM).alias("__cn"),
    )
    cand = (
        cv.crossJoin(F.broadcast(qv))
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.floor(
                cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=_DIM)
                * 1000000
            )
            .cast("bigint")
            .alias("sm"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sm"), F.asc("nid"))
    p = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("qid")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("sm"))).alias("m1"),
            F.max(F.when(F.col("rn") == 2, F.col("sm"))).alias("m2"),
        )
    )
    return p.groupBy(
        F.expr("(m1 - m2) div 10000").cast("bigint").alias("margin_band")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.min(F.expr("m1 - m2")).cast("bigint").alias("min_margin_micro"),
        F.max(F.expr("m1 - m2")).cast("bigint").alias("max_margin_micro"),
    )


@register(
    "sim_ivf_imbalance_audit",
    """
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      WHERE vec_id < greatest(32, (SELECT count(*) FROM embeddings) // 64)
    ),
    assign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_aggregate(list_transform(range(1, 65),
                   i -> (e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE)
                        * (e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE)),
                   'sum'), 6), c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) t WHERE rn = 1
    ), sz AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS s FROM assign GROUP BY cell
    ), st AS (
      SELECT CAST(count(*) AS BIGINT)     AS used,
             CAST(sum(s) AS BIGINT)       AS n,
             CAST(max(s) AS BIGINT)       AS mx,
             CAST(sum(s * s) AS BIGINT)   AS s2,
             CAST((SELECT greatest(32, (SELECT count(*) FROM embeddings)
                                       // 64)) AS BIGINT) AS planned
      FROM sz
    )
    SELECT planned AS n_cells_planned,
           used    AS n_cells_used,
           n       AS n_vectors,
           mx      AS max_cell_size,
           CAST(mx * used * 1000 // n AS BIGINT)        AS hot_factor_milli,
           CAST((used * s2 - n * n) * 1000 // (n * n) AS BIGINT)
             AS dispersion_milli
    FROM st
    """,
    doc=(
        "IVF index-health audit: cell-occupancy imbalance of the "
        "auto-sized coarse quantizer — hot_factor (largest cell vs "
        "the perfectly-balanced size, 1000 = balanced) predicts worst-"
        "case probe latency, dispersion ((used*sum(s^2) - n^2)/n^2, "
        "the relative-variance analog) flags skewed centroid training; "
        "empty cells show as used < planned. Same auto-sized cell "
        "formula as dedup_semantic (greatest(32, n div 64)) — this "
        "audits the index the dedup/ANN paths actually build."
    ),
)
def sim_ivf_imbalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-size imbalance stats for the auto-sized IVF quantizer.

    Scale notes (100 TB): one assignment pass (collected-literal or
    broadcast-join per the 4096-cell auto-switch), one |cells|-row
    size aggregate, one 1-row stat reduce — the audit costs one scan
    and tells you whether probe latency will be tail-bound. All
    integer outputs."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    n_vec = e.count()
    cells = S.semantic_cells(n_vec)
    assigned = S.ivf_assign(e, "vec_id", "embedding", cells, dim=_DIM)
    sz = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("s")
    )
    st = sz.agg(
        F.count(F.lit(1)).cast("bigint").alias("used"),
        F.sum("s").cast("bigint").alias("n"),
        F.max("s").cast("bigint").alias("mx"),
        F.sum(F.expr("s * s")).cast("bigint").alias("s2"),
    )
    return st.select(
        F.lit(cells).cast("bigint").alias("n_cells_planned"),
        F.col("used").alias("n_cells_used"),
        F.col("n").alias("n_vectors"),
        F.col("mx").alias("max_cell_size"),
        F.expr("mx * used * 1000 div n").cast("bigint").alias("hot_factor_milli"),
        F.expr("(used * s2 - n * n) * 1000 div (n * n)")
        .cast("bigint")
        .alias("dispersion_milli"),
    )


def _pca_oracle() -> str:
    # one iteration of integer power iteration as a SQL block; unrolled
    # 3x (iterative algorithms are oracle-pinnable when every state
    # element is an exact integer — the udf_token_bucket discipline,
    # here with the state being a 64-vector instead of a scalar)
    it = """
    {d} AS (
      SELECT xs,
             list_aggregate(list_transform(range(1, 65),
               k -> xs[k] * pv.v[k]), 'sum') // 1000000 AS d
      FROM x CROSS JOIN {vprev} pv
    ), {w} AS (
      SELECT j, CAST(sum(xs[j] * d) AS BIGINT) AS w
      FROM {d} CROSS JOIN unnest(range(1, 65)) AS t(j)
      GROUP BY j
    ), {vnext} AS (
      SELECT list(w * 1000 // (SELECT max(abs(w)) FROM {w})
                  ORDER BY j) AS v
      FROM {w}
    )"""
    blocks = ",".join(
        it.format(d=f"d{i}", w=f"w{i}", vprev=f"v{i - 1}", vnext=f"v{i}")
        for i in (1, 2, 3)
    )
    return f"""
    WITH x AS (
      SELECT list_transform(embedding,
               e -> CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT))
             AS xs
      FROM embeddings
    ), v0 AS (
      SELECT list_transform(range(1, 65), i -> CAST(1000 AS BIGINT)) AS v
    ),{blocks},
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x)
    SELECT CAST(j AS BIGINT) AS component,
           CAST((SELECT v FROM v3)[j] AS BIGINT) AS loading_milli,
           nn.n AS n_vectors
    FROM unnest(range(1, 9)) AS t(j) CROSS JOIN nn
    """


@register(
    "sim_pca_power_iteration",
    _pca_oracle(),
    doc=(
        "Top principal direction of the embedding cloud by THREE "
        "integer power-iteration steps (v <- X'Xv, renormalized to "
        "milli by max-abs): the dominant-variance axis that drives "
        "whitening, ABQ quantizer rotation, and embedding-drift "
        "monitoring. ALL-INTEGER: vectors quantized to micro units, "
        "every accumulation an exact BIGINT sum (order-free, so the "
        "distributed reduce needs no sorted fold), per-step rescale "
        "by integer div — the iteration state is value-hash exact, "
        "the udf_token_bucket discipline applied to a 64-vector."
    ),
)
def sim_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 loadings (milli) of the top eigenvector, 3 exact steps.

    Scale notes (100 TB): each step is one corpus aggregate (64
    combinable integer sums via posexplode + groupBy j) with the
    64-value state vector collected and re-broadcast as a literal —
    the broadcast-the-model shape; two steps run at plan build, the
    third lives in the returned plan. Overflow: |x| <= 2e6 micro,
    |v| <= 1000 milli keeps w under ~1e18 past billions of rows
    (xs*d products bounded by value range times d <= 1.3e5)."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    xs = e.select(
        F.expr(
            "transform(embedding,"
            " e -> CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("xs")
    )
    v = [1000] * 64

    def vlit(vec: list[int]) -> str:
        return "array(" + ",".join(f"{x}L" for x in vec) + ")"

    def step(vec: list[int]):
        d = xs.select(
            "xs",
            F.expr(
                f"aggregate(zip_with(xs, {vlit(vec)}, (x, vv) -> x * vv),"
                " 0L, (a, b) -> a + b) div 1000000"
            ).alias("d"),
        )
        return (
            d.select(F.posexplode("xs").alias("j0", "xj"), "d")
            .groupBy((F.col("j0") + 1).alias("j"))
            .agg(F.sum(F.expr("xj * d")).cast("bigint").alias("w"))
        )

    for _ in range(2):  # two collected steps (exact integer state)
        rows = {int(r["j"]): int(r["w"]) for r in step(v).collect()}
        m = max(abs(w) for w in rows.values())
        v = [
            (abs(rows[j]) * 1000 // m) * (1 if rows[j] >= 0 else -1)
            for j in range(1, 65)
        ]
    # third step stays in the returned plan
    w3 = step(v)
    mx = w3.agg(F.max(F.abs("w")).alias("m"))
    nn = xs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        w3.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(nn))
        .filter(F.col("j") <= 8)
        .select(
            F.col("j").cast("bigint").alias("component"),
            F.expr("w * 1000 div m").cast("bigint").alias("loading_milli"),
            F.col("n").alias("n_vectors"),
        )
    )


# ---------------------------------------------------------------------------
# MMR diversification: greedy re-ranking of a retrieval shortlist
# ---------------------------------------------------------------------------

_MMR_QID = 0     # query vector
_MMR_POOL = 12   # shortlist depth fed to the greedy stage
_MMR_K = 5       # diversified results returned
_MMR_LAM = 700   # lambda in milli: score = .7*rel - .3*max-sim-to-selected


def _mmr_cos(a: str, b: str) -> str:
    """Floor-micro cosine between two embedding table aliases — the
    identically-sequenced IEEE recipe (one inner product, two norms,
    one division, floor) used by the Spark side."""
    return (
        f"CAST(floor(list_inner_product({a}.embedding::DOUBLE[], "
        f"{b}.embedding::DOUBLE[]) / "
        f"(sqrt(list_inner_product({a}.embedding::DOUBLE[], "
        f"{a}.embedding::DOUBLE[])) * "
        f"sqrt(list_inner_product({b}.embedding::DOUBLE[], "
        f"{b}.embedding::DOUBLE[]))) * 1000000) AS BIGINT)"
    )


def _mmr_oracle() -> str:
    """Unrolled greedy MMR (the sim_pca_power_iteration pattern: one
    static CTE block per iteration, all-integer state)."""
    head = f"""
    WITH sl AS (
      SELECT vec_id, embedding, qsim FROM (
        SELECT c.vec_id, c.embedding, {_mmr_cos('q', 'c')} AS qsim
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id = {_MMR_QID}
      ) t ORDER BY qsim DESC, vec_id LIMIT {_MMR_POOL}
    ), pr AS (
      SELECT a.vec_id AS aid, b.vec_id AS bid, {_mmr_cos('a', 'b')} AS psim
      FROM sl a JOIN sl b ON a.vec_id <> b.vec_id
    ), s1 AS (
      SELECT vec_id, qsim, CAST(0 AS BIGINT) AS mp
      FROM sl ORDER BY qsim DESC, vec_id LIMIT 1
    ), sel1 AS (SELECT vec_id FROM s1)"""
    steps = []
    for k in range(2, _MMR_K + 1):
        steps.append(f""", c{k} AS (
      SELECT c.vec_id, c.qsim,
             (SELECT max(p.psim) FROM pr p
              WHERE p.aid = c.vec_id
                AND p.bid IN (SELECT vec_id FROM sel{k - 1})) AS mp
      FROM sl c
      WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
    ), s{k} AS (
      SELECT vec_id, qsim, mp FROM c{k}
      ORDER BY {_MMR_LAM} * qsim - {1000 - _MMR_LAM} * mp DESC, vec_id
      LIMIT 1
    ), sel{k} AS (
      SELECT vec_id FROM sel{k - 1} UNION ALL SELECT vec_id FROM s{k}
    )""")
    union = " UNION ALL ".join(
        f"SELECT {k} AS rank, vec_id, qsim, mp FROM s{k}"
        for k in range(1, _MMR_K + 1)
    )
    tail = f"""
    SELECT CAST(rank AS BIGINT) AS rank,
           CAST(vec_id AS BIGINT) AS vec_id,
           CAST(qsim AS BIGINT) AS qsim_micro,
           CAST(mp AS BIGINT) AS maxpair_micro,
           CAST({_MMR_LAM} * qsim - {1000 - _MMR_LAM} * mp AS BIGINT)
             AS mmr_nano
    FROM ({union}) u"""
    return head + "".join(steps) + tail


@register(
    "sim_mmr_diversify",
    _mmr_oracle(),
    doc=(
        "Maximal-marginal-relevance re-ranking: greedy selection of 5 "
        "results from a cosine top-12 shortlist, each step maximizing "
        "0.7*query-sim - 0.3*max-sim-to-already-selected — the "
        "diversification pass a RAG retriever runs after ANN so the "
        "context window isn't five near-duplicates. All state is exact "
        "BIGINT (floor-micro cosines, milli lambda weights), ties by "
        "vec_id; the oracle unrolls the 5 greedy steps as static CTE "
        "blocks."
    ),
)
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR over a retrieval shortlist (exact integer scores).

    Scale notes (100 TB): the only corpus-scale stage is the shortlist
    — a broadcast-query cosine scan into TakeOrderedAndProject (swap in
    the IVF index at scale; the greedy stage consumes only (id, vec,
    qsim) and is index-agnostic). The greedy iteration runs as ONE
    fold expression over the collected 12-row pool (sequence(1,5)
    aggregate with array state, cosines via the same left-associated
    zip_with fold the oracle's list_inner_product performs), so the
    whole query is a single job with a shallow plan — the first
    version chained 15 tiny joins/sorts and spent ~3 s on plan
    compilation alone."""
    from the_movies_db_spark.operators.dedup import cosine_from_parts

    e = spread(load_table(spark, sf_dir, "embeddings"))
    qv = e.filter(F.col("vec_id") == _MMR_QID).select(
        F.col("embedding").alias("__qv"),
        S.norm("embedding", _DIM).alias("__qn"),
    )
    sl = (
        e.filter(F.col("vec_id") != _MMR_QID)
        .select("vec_id", "embedding", S.norm("embedding", _DIM).alias("__n"))
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "embedding",
            "__n",
            F.floor(
                cosine_from_parts("__qv", "embedding", "__qn", "__n", dim=_DIM)
                * 1000000
            )
            .cast("bigint")
            .alias("qsim"),
        )
        .orderBy(F.desc("qsim"), F.asc("vec_id"))
        .limit(_MMR_POOL)
    )
    pool = sl.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("vec_id").cast("bigint").alias("id"),
                    F.col("qsim").alias("qs"),
                    F.col("embedding").alias("v"),
                    F.col("__n").alias("nn"),
                )
            )
        ).alias("pool")
    )
    st = (
        "STRUCT<rank: BIGINT, id: BIGINT, qs: BIGINT, mp: BIGINT,"
        " v: ARRAY<FLOAT>, nn: DOUBLE>"
    )
    lam, mu = _MMR_LAM, 1000 - _MMR_LAM
    score = "({lam} * {x}.qs - {mu} * {x}.mp)"
    sel_expr = f"""
    aggregate(
      sequence(1, {_MMR_K}),
      CAST(array() AS ARRAY<{st}>),
      (acc, k) -> array_append(acc,
        aggregate(
          transform(
            filter(pool, c -> NOT exists(acc, s -> s.id = c.id)),
            c -> named_struct(
              'rank', CAST(k AS BIGINT),
              'id', c.id,
              'qs', c.qs,
              'mp', coalesce(array_max(transform(acc, s ->
                      CAST(floor(aggregate(zip_with(c.v, s.v,
                             (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                           CAST(0.0 AS DOUBLE), (a, b) -> a + b)
                           / (c.nn * s.nn) * 1000000) AS BIGINT))), 0L),
              'v', c.v,
              'nn', c.nn)),
          CAST(NULL AS {st}),
          (b, c) -> CASE
            WHEN b IS NULL THEN c
            WHEN {score.format(lam=lam, mu=mu, x='c')}
               > {score.format(lam=lam, mu=mu, x='b')} THEN c
            WHEN {score.format(lam=lam, mu=mu, x='c')}
               = {score.format(lam=lam, mu=mu, x='b')}
               AND c.id < b.id THEN c
            ELSE b END)))
    """
    return (
        pool.select(F.explode(F.expr(sel_expr)).alias("p"))
        .select(
            F.col("p.rank").alias("rank"),
            F.col("p.id").alias("vec_id"),
            F.col("p.qs").alias("qsim_micro"),
            F.col("p.mp").alias("maxpair_micro"),
            F.expr(
                f"CAST({lam} * p.qs - {mu} * p.mp AS BIGINT)"
            ).alias("mmr_nano"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Dimension-correlation audit over the first 16 embedding dims
# ---------------------------------------------------------------------------

_CORR_DIMS = 16
_CORR_MILLI = (
    "CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)"
    " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
    " * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 1000) AS BIGINT)"
)


@register(
    "sim_dim_correlation",
    f"""
    WITH el AS (
      SELECT vec_id, generate_subscripts(e16, 1) AS dim,
             CAST(floor(CAST(unnest(e16) AS DOUBLE) * 1000) AS BIGINT) AS q
      FROM (SELECT vec_id, embedding[1:{_CORR_DIMS}] AS e16 FROM embeddings) t
    ),
    p AS (
      SELECT a.dim AS di, b.dim AS dj, a.q AS x, b.q AS y
      FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.dim < b.dim
    ),
    s AS (
      SELECT di, dj, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM p GROUP BY 1, 2
    )
    SELECT CAST(di AS BIGINT) AS dim_i, CAST(dj AS BIGINT) AS dim_j, n,
           {_CORR_MILLI} AS corr_milli
    FROM s
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    ORDER BY abs({_CORR_MILLI}) DESC, di, dj
    LIMIT 10
    """,
    doc=(
        "Feature-correlation audit: Pearson correlation between every "
        "pair of the first 16 embedding dimensions (milli-quantized "
        "elements, exact BIGINT moments, one IEEE-identical closed "
        "form at the end) — highly correlated dims mean the encoder "
        "wastes capacity and PQ subspaces should be rotated. Top-10 "
        "pairs by |corr|."
    ),
)
def sim_dim_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top correlated dimension pairs (exact integer moments).

    Scale notes (100 TB): pairs are generated per ROW by a nested
    transform expression (dims^2/2 structs per row, no self-join, no
    second scan — the oracle's equi-self-join is the semantic spec,
    not the plan); one hash aggregation over 120 groups. Milli (not
    micro) quantization keeps n*sxy inside BIGINT to ~1e6 rows per
    aggregation — shard-and-merge moments beyond that (moments are
    additive)."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    d = _CORR_DIMS
    qarr = (
        f"transform(slice(embedding, 1, {d}),"
        " v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT))"
    )
    # stage the quantized array in its own projection (HOF expressions
    # re-inline per reference otherwise — CLAUDE.md perf trap)
    staged = e.select("vec_id", F.expr(qarr).alias("qa"))
    pairs = (
        f"flatten(transform(sequence(0, {d - 2}), i ->"
        f" transform(sequence(i + 1, {d - 1}), j -> struct("
        " i + 1 AS di, j + 1 AS dj,"
        " element_at(qa, i + 1) AS x, element_at(qa, j + 1) AS y))))"
    )
    p = staged.select(F.explode(F.expr(pairs)).alias("p")).select(
        "p.di", "p.dj", "p.x", "p.y"
    )
    s = p.groupBy("di", "dj").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x * x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("y * y")).cast("bigint").alias("syy"),
        F.sum(F.expr("x * y")).cast("bigint").alias("sxy"),
    )
    return (
        s.filter(F.expr("n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"))
        .select(
            F.col("di").cast("bigint").alias("dim_i"),
            F.col("dj").cast("bigint").alias("dim_j"),
            "n",
            F.expr(_CORR_MILLI).alias("corr_milli"),
        )
        .orderBy(F.abs(F.col("corr_milli")).desc(), F.asc("dim_i"), F.asc("dim_j"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# SRP sketch-distance ANN: Hamming-ranked shortlist + exact re-rank
# ---------------------------------------------------------------------------

_SRP_PLANES = 16
_SRP_QUERIES = 8
_SRP_SHORTLIST = 20
_SRP_K = 5

_SRP_COS_MICRO = (
    "CAST(floor("
    "list_inner_product(qv::DOUBLE[], cv::DOUBLE[]) /"
    " (sqrt(list_inner_product(qv::DOUBLE[], qv::DOUBLE[])) *"
    "  sqrt(list_inner_product(cv::DOUBLE[], cv::DOUBLE[])))"
    " * 1000000) AS BIGINT)"
)


@register(
    "sim_topk_srp_hamming",
    f"""
    WITH sigs AS (
      SELECT vec_id, embedding,
             {_sig_expr(_SRP_PLANES).format(v="embedding")} AS sig
      FROM embeddings
    ),
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             q.embedding AS qv, c.embedding AS cv,
             CAST(len(list_filter(range(1, {_SRP_PLANES} + 1),
                                  i -> q.sig[i] <> c.sig[i])) AS BIGINT)
               AS hamming,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY len(list_filter(range(1, {_SRP_PLANES} + 1),
                                        i -> q.sig[i] <> c.sig[i])),
                        c.vec_id) AS short_rn
      FROM sigs q JOIN sigs c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_SRP_QUERIES}
    ),
    rerank AS (
      SELECT query_id, neighbor_id, hamming,
             {_SRP_COS_MICRO} AS cosine_micro
      FROM cand WHERE short_rn <= {_SRP_SHORTLIST}
    )
    SELECT query_id, neighbor_id, hamming, cosine_micro,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_micro DESC, neighbor_id)
                  AS rank
      FROM rerank
    ) t WHERE rank <= {_SRP_K}
    """,
    doc=(
        "Sign-random-projection sketch ANN ranked by HAMMING DISTANCE "
        "— the multi-bit sibling of bucket-equality LSH: every "
        "candidate gets a 16-bit SRP signature (the same md5-derived "
        "±1 plane family the bucketed index uses), the shortlist is "
        "the 20 candidates with the fewest disagreeing sign bits, and "
        "the shortlist alone is re-ranked by exact floor-micro cosine. "
        "Spark packs the bits into a BIGINT (conv base-2) and scores "
        "pairs with one xor + bit_count; the oracle compares signature "
        "strings positionally — identical distances either way."
    ),
)
def sim_topk_srp_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-ranked SRP shortlist with exact cosine re-rank.

    Scale notes (100 TB): signatures are computed once per row (a
    projection — map-only) and the pair stage costs one xor+popcount
    per candidate instead of a 64-term dot product; the exact cosine
    runs only on the |Q|x20 shortlist. The panel side is broadcast, so
    the corpus is scanned once with no shuffle. At index scale the
    same BIGINT signature becomes the partition key (prefix buckets =
    the shipped LSH index) and Hamming ranking runs within the probed
    buckets — this query pins the sketch-distance math that path
    reuses."""
    from the_movies_db_spark.operators.dedup import cosine_from_parts

    e = spread(load_table(spark, sf_dir, "embeddings"))
    sigs = e.select(
        "vec_id",
        "embedding",
        S.hyperplane_signature("embedding", _SRP_PLANES, _DIM).alias("sigstr"),
        S.norm("embedding", _DIM).alias("nrm"),
    ).select(
        "vec_id",
        "embedding",
        F.expr("CAST(conv(sigstr, 2, 10) AS BIGINT)").alias("sig_int"),
        "nrm",
    )
    q = sigs.filter(F.col("vec_id") < _SRP_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        F.col("sig_int").alias("__qsig"),
        F.col("nrm").alias("__qn"),
    )
    cand = (
        sigs.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "__qv",
            "embedding",
            "__qn",
            "nrm",
            F.expr("CAST(bit_count(sig_int ^ __qsig) AS BIGINT)").alias(
                "hamming"
            ),
        )
    )
    wshort = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    short = cand.withColumn("short_rn", F.row_number().over(wshort)).filter(
        F.col("short_rn") <= _SRP_SHORTLIST
    )
    rerank = short.select(
        "query_id",
        "neighbor_id",
        "hamming",
        F.floor(
            cosine_from_parts("__qv", "embedding", "__qn", "nrm", dim=_DIM)
            * 1000000
        )
        .cast("bigint")
        .alias("cosine_micro"),
    )
    wrank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_micro"), F.asc("neighbor_id")
    )
    return (
        rerank.withColumn("rank", F.row_number().over(wrank).cast("bigint"))
        .filter(F.col("rank") <= _SRP_K)
        .select("query_id", "neighbor_id", "hamming", "cosine_micro", "rank")
    )


# ---------------------------------------------------------------------------
# SRP plane-count recall curve: 8 vs 16 planes from ONE signature table
# ---------------------------------------------------------------------------

_SRPR_QUERIES = 30
_SRPR_GT = 10


def _srpr_hamming_sql(nbits: int) -> str:
    return (
        f"len(list_filter(range(1, {nbits} + 1),"
        " i -> q.sig[i] <> c.sig[i]))"
    )


@register(
    "sim_recall_srp_planes",
    f"""
    WITH sigs AS (
      SELECT vec_id, embedding,
             {_sig_expr(_SRP_PLANES).format(v="embedding")} AS sig
      FROM embeddings
    ),
    cand AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST({_srpr_hamming_sql(8)} AS BIGINT)  AS h8,
             CAST({_srpr_hamming_sql(16)} AS BIGINT) AS h16,
             CAST(floor(
               list_inner_product(q.embedding::DOUBLE[],
                                  c.embedding::DOUBLE[]) /
               (sqrt(list_inner_product(q.embedding::DOUBLE[],
                                        q.embedding::DOUBLE[])) *
                sqrt(list_inner_product(c.embedding::DOUBLE[],
                                        c.embedding::DOUBLE[])))
               * 1000000) AS BIGINT) AS cm
      FROM sigs q JOIN sigs c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_SRPR_QUERIES}
    ),
    ranked AS (
      SELECT qid, nid,
             row_number() OVER (PARTITION BY qid ORDER BY cm DESC, nid)
               AS gt_rn,
             row_number() OVER (PARTITION BY qid ORDER BY h8, nid)  AS rn8,
             row_number() OVER (PARTITION BY qid ORDER BY h16, nid) AS rn16
      FROM cand
    ),
    hits AS (
      SELECT
        CAST(sum(CASE WHEN rn8 <= {_SRP_SHORTLIST}
                       AND gt_rn <= {_SRPR_GT} THEN 1 ELSE 0 END) AS BIGINT)
          AS hits8,
        CAST(sum(CASE WHEN rn16 <= {_SRP_SHORTLIST}
                       AND gt_rn <= {_SRPR_GT} THEN 1 ELSE 0 END) AS BIGINT)
          AS hits16
      FROM ranked
    )
    SELECT CAST(8 AS BIGINT) AS n_planes, hits8 AS gt_hits,
           CAST(hits8 * 1000000 // {_SRPR_QUERIES * _SRPR_GT} AS BIGINT)
             AS recall_ppm
    FROM hits
    UNION ALL
    SELECT CAST(16 AS BIGINT), hits16,
           CAST(hits16 * 1000000 // {_SRPR_QUERIES * _SRPR_GT} AS BIGINT)
    FROM hits
    """,
    doc=(
        "SRP sketch recall curve: recall@20-shortlist of the Hamming "
        "ranking against exact-cosine top-10 ground truth, at 8 vs 16 "
        "planes — BOTH measured from ONE 16-plane signature table "
        "(plane families are prefix-nested, so the 8-plane distance is "
        "bit_count of the xor's top byte / the first 8 signature "
        "chars). The accuracy-vs-bits tradeoff evidence that justifies "
        "signature width before indexing a corpus."
    ),
)
def sim_recall_srp_planes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of 8- vs 16-plane SRP shortlists from one signature set.

    Scale notes (100 TB): |Q| x corpus with Q = 30 — the sampled eval
    panel shape (the ground truth is the stated-unavoidable brute
    cost); both plane counts and the ground truth rank off ONE pair
    frame, so the corpus is scanned once and the three windows run
    per-query (30 partitions)."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    sigs = e.select(
        "vec_id",
        "embedding",
        S.hyperplane_signature("embedding", _SRP_PLANES, _DIM).alias("sigstr"),
        S.norm("embedding", _DIM).alias("nrm"),
    ).select(
        "vec_id",
        "embedding",
        F.expr("CAST(conv(sigstr, 2, 10) AS BIGINT)").alias("sig_int"),
        "nrm",
    )
    from the_movies_db_spark.operators.dedup import cosine_from_parts

    q = sigs.filter(F.col("vec_id") < _SRPR_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("__qv"),
        F.col("sig_int").alias("__qsig"),
        F.col("nrm").alias("__qn"),
    )
    cand = (
        sigs.join(F.broadcast(q), F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.expr("CAST(bit_count(shiftright(sig_int ^ __qsig, 8)) AS BIGINT)")
            .alias("h8"),
            F.expr("CAST(bit_count(sig_int ^ __qsig) AS BIGINT)").alias("h16"),
            F.floor(
                cosine_from_parts("__qv", "embedding", "__qn", "nrm", dim=_DIM)
                * 1000000
            )
            .cast("bigint")
            .alias("cm"),
        )
    )
    ranked = cand.select(
        "qid",
        "nid",
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.desc("cm"), F.asc("nid")))
        .alias("gt_rn"),
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.asc("h8"), F.asc("nid")))
        .alias("rn8"),
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.asc("h16"), F.asc("nid")))
        .alias("rn16"),
    )
    hits = ranked.agg(
        F.sum(
            F.when(
                (F.col("rn8") <= _SRP_SHORTLIST) & (F.col("gt_rn") <= _SRPR_GT), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("hits8"),
        F.sum(
            F.when(
                (F.col("rn16") <= _SRP_SHORTLIST) & (F.col("gt_rn") <= _SRPR_GT),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("hits16"),
    )
    denom = _SRPR_QUERIES * _SRPR_GT
    return hits.select(
        F.expr(
            "stack(2,"
            f" 8L, hits8, CAST(hits8 * 1000000 div {denom} AS BIGINT),"
            f" 16L, hits16, CAST(hits16 * 1000000 div {denom} AS BIGINT))"
            " AS (n_planes, gt_hits, recall_ppm)"
        )
    )


# ---------------------------------------------------------------------------
# PQ codebook distortion audit: per-subspace quantization error + usage
# ---------------------------------------------------------------------------


@register(
    "sim_pq_distortion_audit",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      WHERE vec_id < {_PQ_CENT}
    ),
    s AS (SELECT unnest(range(0, {_PQ_SUB})) AS m),
    win AS (
      SELECT vec_id, m, d, cid AS code FROM (
        SELECT e.vec_id, s.m, c.cid,
               {_pq_dmicro("e.embedding", "c.cvec")} AS d,
               row_number() OVER (PARTITION BY e.vec_id, s.m
                                  ORDER BY {_pq_dmicro("e.embedding", "c.cvec")},
                                           c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c CROSS JOIN s
      ) t WHERE rn = 1
    ),
    per_code AS (
      SELECT m, code, CAST(count(*) AS BIGINT) AS n_c,
             CAST(sum(d) AS BIGINT) AS sum_d, CAST(max(d) AS BIGINT) AS max_d
      FROM win GROUP BY 1, 2
    )
    SELECT CAST(m AS BIGINT)            AS subspace,
           CAST(sum(n_c) AS BIGINT)     AS n_vectors,
           CAST(count(*) AS BIGINT)     AS codes_used,
           CAST(max(n_c) * 1000000 // sum(n_c) AS BIGINT)
             AS top_code_share_ppm,
           CAST(sum(sum_d) // sum(n_c) AS BIGINT) AS mean_err_micro,
           CAST(max(max_d) AS BIGINT)   AS max_err_micro
    FROM per_code GROUP BY m
    """,
    doc=(
        "PQ codebook health audit: per-subspace quantization error "
        "(mean/max winning distance in exact micro) and code usage "
        "(distinct codes used, share of the hottest code) — the "
        "retrain trigger for product-quantization indexes: a subspace "
        "whose top code absorbs most vectors or whose mean error "
        "dwarfs its siblings is under-trained and degrades every ADC "
        "ranking that touches it. Shares the shipped PQ codebook and "
        "integer subspace-distance machinery, so the audit is "
        "engine-exact."
    ),
)
def sim_pq_distortion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace PQ assignment error and code-usage profile.

    Scale notes (100 TB): one corpus scan; the encode step is a pure
    projection against the broadcast codebook literal (the shipped
    _pq_parts convention), the winning distance rides along, and two
    bounded hash aggregations (|subspaces|x|codes| then |subspaces|)
    produce the audit. No joins, no shuffles beyond the tiny
    aggregate."""
    sub_dim = _DIM // _PQ_SUB
    e = spread(load_table(spark, sf_dir, "embeddings"))
    cents = S._pq_seed_centroids(e, "vec_id", "embedding", _PQ_CENT)

    def cent_arr(m):
        return S._lit_centroid_array(
            cents, m * sub_dim, (m + 1) * sub_dim, cid_type="int"
        )

    def win(m):
        return F.array_min(
            F.transform(
                cent_arr(m),
                lambda ce: F.struct(
                    S._sub_l2_micro(
                        F.slice(F.col("embedding"), m * sub_dim + 1, sub_dim),
                        ce["cvec"],
                    ).alias("d"),
                    ce["cid"].alias("cid"),
                ),
            )
        )

    cols = []
    for m in range(_PQ_SUB):
        w = win(m)
        cols += [w["d"].alias(f"__d{m}"), w["cid"].alias(f"__c{m}")]
    wide = e.select(*cols)
    stack_args = ", ".join(f"{m}L, __d{m}, __c{m}" for m in range(_PQ_SUB))
    rows = wide.select(
        F.expr(f"stack({_PQ_SUB}, {stack_args}) AS (m, d, code)")
    )
    per_code = rows.groupBy("m", "code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c"),
        F.sum("d").cast("bigint").alias("sum_d"),
        F.max("d").cast("bigint").alias("max_d"),
    )
    return per_code.groupBy("m").agg(
        F.sum("n_c").cast("bigint").alias("n_vectors"),
        F.count(F.lit(1)).cast("bigint").alias("codes_used"),
        F.expr("CAST(max(n_c) * 1000000 div sum(n_c) AS BIGINT)").alias(
            "top_code_share_ppm"
        ),
        F.expr("CAST(sum(sum_d) div sum(n_c) AS BIGINT)").alias(
            "mean_err_micro"
        ),
        F.max("max_d").cast("bigint").alias("max_err_micro"),
    ).select(
        F.col("m").cast("bigint").alias("subspace"),
        "n_vectors",
        "codes_used",
        "top_code_share_ppm",
        "mean_err_micro",
        "max_err_micro",
    )


# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# Embedding distribution drift between two corpus halves
# ---------------------------------------------------------------------------

@register(
    "sim_embedding_drift",
    """
    WITH el AS (
      SELECT vec_id % 2 AS half,
             generate_subscripts(embedding, 1) AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS q
      FROM embeddings
    ),
    s AS (
      SELECT dim,
             CAST(sum(CASE WHEN half = 0 THEN q ELSE 0 END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN half = 1 THEN q ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM el GROUP BY 1
    )
    SELECT CAST(dim AS BIGINT) AS dim, n0, n1,
           CAST(s0 * 1000 // n0 AS BIGINT) AS mean0_nano,
           CAST(s1 * 1000 // n1 AS BIGINT) AS mean1_nano,
           CAST(s0 * 1000 // n0 - s1 * 1000 // n1 AS BIGINT) AS delta_nano
    FROM s
    ORDER BY abs(CAST(s0 * 1000 // n0 - s1 * 1000 // n1 AS BIGINT)) DESC, dim
    LIMIT 8
    """,
    doc=(
        "Embedding DRIFT audit: per-dimension mean shift between two "
        "corpus halves (vec_id parity plays the before/after split) — "
        "the pre-flight check before mixing embedding batches from two "
        "encoder runs (a drifted dimension means the encoder or the "
        "data changed; cosine search silently degrades). Elements are "
        "quantized to micro BIGINT before summing, so the distributed "
        "sum is order-free and the top-8 drifted dims are "
        "engine-exact."
    ),
)
def sim_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean drift between corpus halves.

    Scale notes (100 TB): one posexplode into a 64-group hash
    aggregation with conditional sums — no joins, no windows, output
    bounded by the dimensionality. Integer quantization BEFORE the sum
    is what makes the distributed (order-nondeterministic) aggregation
    value-hash-stable; a double sum would drift in the last ulp across
    partitionings."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    el = e.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("j0", "v"),
    ).select(
        "half",
        (F.col("j0") + 1).alias("dim"),
        F.expr("CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").alias("q"),
    )
    s = el.groupBy("dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("q")).otherwise(0))
        .cast("bigint")
        .alias("s0"),
        F.sum(F.when(F.col("half") == 1, F.col("q")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    return (
        s.select(
            F.col("dim").cast("bigint").alias("dim"),
            "n0",
            "n1",
            F.expr("CAST(s0 * 1000 div n0 AS BIGINT)").alias("mean0_nano"),
            F.expr("CAST(s1 * 1000 div n1 AS BIGINT)").alias("mean1_nano"),
            F.expr(
                "CAST(s0 * 1000 div n0 - s1 * 1000 div n1 AS BIGINT)"
            ).alias("delta_nano"),
        )
        .orderBy(F.abs(F.col("delta_nano")).desc(), F.asc("dim"))
        .limit(8)
    )


# ---------------------------------------------------------------------------
# Cosine calibration: similarity distribution of a random pair panel
# ---------------------------------------------------------------------------

_CAL_QUERIES = 20


@register(
    "sim_cosine_calibration",
    f"""
    WITH cand AS (
      SELECT CAST(floor(
               list_inner_product(q.embedding::DOUBLE[],
                                  c.embedding::DOUBLE[]) /
               (sqrt(list_inner_product(q.embedding::DOUBLE[],
                                        q.embedding::DOUBLE[])) *
                sqrt(list_inner_product(c.embedding::DOUBLE[],
                                        c.embedding::DOUBLE[])))
               * 1000000) AS BIGINT) AS cm
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_CAL_QUERIES}
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) * 1000000 // (SELECT count(*) FROM cand)
                AS BIGINT) AS share_ppm
    FROM (
      SELECT CASE WHEN cm >= 0 THEN cm // 100000
                  ELSE -((-cm + 99999) // 100000) END AS band
      FROM cand
    ) b
    GROUP BY band
    """,
    doc=(
        "Cosine calibration / anisotropy audit: the similarity "
        "distribution of a 20-query panel against the whole corpus, "
        "banded at 0.1 (floor toward -inf so negative cosines band "
        "correctly) — embeddings whose random-pair mass concentrates "
        "in a narrow high-cosine band are anisotropic, and every "
        "threshold tuned on them (dedup cutoffs, ANN radii) needs "
        "recalibration. The distribution context for the margin "
        "audit's per-query view."
    ),
)
def sim_cosine_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded cosine histogram of panel x corpus pairs.

    Scale notes (100 TB): |Q| x corpus with Q = 20 — the sampled-panel
    shape; one broadcast join, one banded hash aggregation; the share
    denominator is a 1-row aggregate of the band counts (no second
    pair scan)."""
    from the_movies_db_spark.operators.dedup import cosine_from_parts

    e = spread(load_table(spark, sf_dir, "embeddings"))
    base = e.select(
        "vec_id", "embedding", S.norm("embedding", _DIM).alias("nrm")
    )
    q = base.filter(F.col("vec_id") < _CAL_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("__qv"),
        F.col("nrm").alias("__qn"),
    )
    cand = base.join(F.broadcast(q), F.col("qid") != F.col("vec_id")).select(
        F.floor(
            cosine_from_parts("__qv", "embedding", "__qn", "nrm", dim=_DIM)
            * 1000000
        )
        .cast("bigint")
        .alias("cm")
    )
    bands = cand.select(
        F.expr(
            "CASE WHEN cm >= 0 THEN cm div 100000"
            " ELSE -((-cm + 99999) div 100000) END"
        ).alias("band")
    ).groupBy("band").agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    tot = bands.agg(F.sum("n_pairs").cast("bigint").alias("__t"))
    return bands.crossJoin(F.broadcast(tot)).select(
        "band",
        "n_pairs",
        F.expr("CAST(n_pairs * 1000000 div __t AS BIGINT)").alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# Dimension energy curve: squared-mass share of embedding prefixes
# ---------------------------------------------------------------------------

_ENERGY_DIMS = (8, 16, 32, 64)


def _energy_sql_duck(d: int) -> str:
    return (
        f"list_aggregate(list_transform(embedding[1:{d}],"
        " x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000)"
        " AS BIGINT)), 'sum')"
    )


@register(
    "sim_dim_energy_curve",
    f"""
    WITH per_vec AS (
      SELECT {", ".join(f"CAST({_energy_sql_duck(d)} AS BIGINT) AS e{d}"
                        for d in _ENERGY_DIMS)}
      FROM embeddings
    ),
    tot AS (
      SELECT {", ".join(f"CAST(sum(e{d}) AS BIGINT) AS e{d}"
                        for d in _ENERGY_DIMS)}
      FROM per_vec
    )
    {" UNION ALL ".join(
        f"SELECT CAST({d} AS BIGINT) AS n_dims, e{d} AS energy_micro,"
        f" CAST(e{d} * 1000000 // e64 AS BIGINT) AS share_ppm FROM tot"
        for d in _ENERGY_DIMS)}
    """,
    doc=(
        "Dimension energy curve: the share of total squared embedding "
        "mass carried by the first 8/16/32/64 dimensions — the "
        "evidence that justifies (or forbids) Matryoshka-style "
        "truncation before the truncated ANN index ships. Per-element "
        "squares are floored to micro BEFORE summing, so every energy "
        "total is an order-free BIGINT and the curve hash-matches."
    ),
)
def sim_dim_energy_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix energy shares at 8/16/32/64 dims, exact ppm.

    Scale notes (100 TB): one corpus scan computing four prefix sums
    per row (a projection), one 1-row reduce, then a 4-row stack —
    nothing else. Shares use plain ppm here (energies are micro-sums
    bounded by dim * 1e6 * n; switch to the _ppm_div chain past
    ~9e12 rows)."""
    e = spread(load_table(spark, sf_dir, "embeddings"))

    def energy(d: int):
        return F.expr(
            f"aggregate(transform(slice(embedding, 1, {d}),"
            " x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)"
            " * 1000000) AS BIGINT)), 0L, (a, v) -> a + v)"
        ).alias(f"e{d}")

    per_vec = e.select(*[energy(d) for d in _ENERGY_DIMS])
    tot = per_vec.agg(
        *[F.sum(f"e{d}").cast("bigint").alias(f"e{d}") for d in _ENERGY_DIMS]
    )
    stack = ", ".join(
        f"{d}L, e{d}, CAST(e{d} * 1000000 div e64 AS BIGINT)"
        for d in _ENERGY_DIMS
    )
    return tot.select(
        F.expr(
            f"stack({len(_ENERGY_DIMS)}, {stack})"
            " AS (n_dims, energy_micro, share_ppm)"
        )
    )


# ---------------------------------------------------------------------------
# kNN-graph quality audit on a bounded panel
# ---------------------------------------------------------------------------

_KNNG_PANEL = 128
_KNNG_K = 5


@register(
    "sim_knn_graph_stats",
    f"""
    WITH pe AS (
      SELECT vec_id, embedding, label FROM embeddings
      WHERE vec_id < {_KNNG_PANEL}
    ),
    edges AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS} DESC, c.vec_id) AS rank
        FROM pe q JOIN pe c ON q.vec_id <> c.vec_id
      ) t WHERE rank <= {_KNNG_K}
    )
    SELECT CAST(count(DISTINCT e.query_id) AS BIGINT) AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(count(r.query_id) * 1000000 // count(*) AS BIGINT)
             AS reciprocal_ppm,
           CAST(count(CASE WHEN lq.label = ln.label THEN 1 END)
                * 1000000 // count(*) AS BIGINT) AS same_label_ppm
    FROM edges e
    LEFT JOIN edges r ON e.query_id = r.neighbor_id
                     AND e.neighbor_id = r.query_id
    JOIN pe lq ON e.query_id = lq.vec_id
    JOIN pe ln ON e.neighbor_id = ln.vec_id
    """,
    doc=(
        "kNN-graph quality audit on a fixed 128-vector panel: builds "
        "the exact cosine k=5 neighbor graph and reports edge "
        "reciprocity (mutual-neighbor share — low reciprocity flags "
        "hubness, the classic high-dim ANN pathology) and same-label "
        "edge share (the clusterability signal SemDeDup-style semantic "
        "dedup depends on). The diagnostic to run before trusting a "
        "kNN graph for clustering or dedup."
    ),
)
def sim_knn_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity + label purity of the panel kNN graph.

    Scale notes (100 TB): the panel is FIXED (128 vectors, broadcast),
    so the pair join is |panel|^2 regardless of corpus size; the edge
    set (<= 128*5 rows) is lazily checkpointed so the reciprocity
    self-join and both label joins never re-execute the scoring
    subtree. The production-scale kNN graph build is the IVF path
    (sim_topk_ivf*); this is its quality harness."""
    e = load_table(spark, sf_dir, "embeddings")
    panel = e.filter(F.col("vec_id") < _KNNG_PANEL)
    edges = (
        S.cosine_topk(panel, panel, "vec_id", "embedding", k=_KNNG_K, dim=_DIM)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    labels = panel.select("vec_id", "label")
    rev = edges.select(
        F.col("query_id").alias("r_nb"), F.col("neighbor_id").alias("r_q")
    )
    j = (
        edges.join(
            rev,
            (F.col("query_id") == F.col("r_q"))
            & (F.col("neighbor_id") == F.col("r_nb")),
            "left",
        )
        .join(
            F.broadcast(labels.select(F.col("vec_id").alias("query_id"),
                                      F.col("label").alias("q_label"))),
            "query_id",
        )
        .join(
            F.broadcast(labels.select(F.col("vec_id").alias("neighbor_id"),
                                      F.col("label").alias("n_label"))),
            "neighbor_id",
        )
    )
    return j.agg(
        F.countDistinct("query_id").cast("bigint").alias("n_nodes"),
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.expr(
            "CAST(count(r_q) * 1000000 div count(*) AS BIGINT)"
        ).alias("reciprocal_ppm"),
        F.expr(
            "CAST(count(CASE WHEN q_label = n_label THEN 1 END)"
            " * 1000000 div count(*) AS BIGINT)"
        ).alias("same_label_ppm"),
    )


# ---------------------------------------------------------------------------
# Label-noise detection via kNN disagreement (confident-learning-lite)
# ---------------------------------------------------------------------------

_LN_PANEL = 128
_LN_K = 5
_LN_AGREE = 2  # suspect when fewer than this many neighbors share the label


@register(
    "pipeline_label_noise_knn",
    f"""
    WITH pe AS (
      SELECT vec_id, embedding, label FROM embeddings
      WHERE vec_id < {_LN_PANEL}
    ),
    edges AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS} DESC, c.vec_id) AS rank
        FROM pe q JOIN pe c ON q.vec_id <> c.vec_id
      ) t WHERE rank <= {_LN_K}
    ),
    votes AS (
      SELECT e.query_id, lq.label,
             CAST(count(CASE WHEN ln.label = lq.label THEN 1 END)
                  AS BIGINT) AS n_agree
      FROM edges e
      JOIN pe lq ON e.query_id = lq.vec_id
      JOIN pe ln ON e.neighbor_id = ln.vec_id
      GROUP BY 1, 2
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_panel,
           CAST(count(CASE WHEN n_agree < {_LN_AGREE} THEN 1 END)
                AS BIGINT) AS n_suspect,
           CAST(count(CASE WHEN n_agree < {_LN_AGREE} THEN 1 END)
                * 1000000 // count(*) AS BIGINT) AS suspect_ppm
    FROM votes GROUP BY 1
    """,
    doc=(
        "Label-noise detection via kNN disagreement (the confident-"
        "learning recipe, lite): a panel vector whose label is shared "
        "by fewer than 2 of its 5 exact-cosine neighbors is a "
        "suspected mislabel — per-label suspect counts tell you WHICH "
        "classes are noisy before training consumes them. Reuses the "
        "kNN-graph machinery; at corpus scale the neighbor source "
        "swaps to the IVF index unchanged."
    ),
)
def pipeline_label_noise_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label suspected-mislabel census from neighbor votes.

    Scale notes (100 TB): the panel is fixed and broadcast; votes are
    one |panel|*k-row aggregate. The full-corpus variant runs the
    same vote over IVF-probed neighbors — still one aggregate."""
    e = load_table(spark, sf_dir, "embeddings")
    panel = e.filter(F.col("vec_id") < _LN_PANEL)
    edges = S.cosine_topk(
        panel, panel, "vec_id", "embedding", k=_LN_K, dim=_DIM
    ).select("query_id", "neighbor_id")
    labels = panel.select("vec_id", "label")
    votes = (
        edges.join(
            F.broadcast(
                labels.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("label").alias("q_label"),
                )
            ),
            "query_id",
        )
        .join(
            F.broadcast(
                labels.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("label").alias("n_label"),
                )
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "q_label")
        .agg(
            F.count(F.expr("CASE WHEN n_label = q_label THEN 1 END"))
            .cast("bigint")
            .alias("n_agree")
        )
    )
    return votes.groupBy(F.col("q_label").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_panel"),
        F.count(F.expr(f"CASE WHEN n_agree < {_LN_AGREE} THEN 1 END"))
        .cast("bigint")
        .alias("n_suspect"),
        F.expr(
            f"CAST(count(CASE WHEN n_agree < {_LN_AGREE} THEN 1 END)"
            " * 1000000 div count(*) AS BIGINT)"
        ).alias("suspect_ppm"),
    )


# ---------------------------------------------------------------------------
# Hubness audit: k-occurrence distribution of exact kNN lists
# ---------------------------------------------------------------------------

_HUB_PANEL = 128
_HUB_K = 5


@register(
    "sim_hubness_audit",
    f"""
    WITH pe AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_HUB_PANEL}
    ),
    edges AS (
      SELECT neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS} DESC, c.vec_id) AS rank
        FROM pe q JOIN embeddings c ON q.vec_id <> c.vec_id
      ) t WHERE rank <= {_HUB_K}
    ),
    occ AS (
      SELECT neighbor_id, CAST(count(*) AS BIGINT) AS k_occ
      FROM edges GROUP BY 1
    )
    SELECT k_occ,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(k_occ * count(*) AS BIGINT) AS n_edges,
           CAST(k_occ * count(*) * 1000000 // {_HUB_PANEL * _HUB_K}
                AS BIGINT) AS edge_share_ppm
    FROM occ GROUP BY k_occ
    """,
    doc=(
        "Hubness audit of the embedding space: the k-occurrence "
        "distribution N_k(x) — how many of a fixed 128-query panel's "
        "exact top-5 lists each corpus point appears in. A heavy "
        "right tail (few points absorbing a large edge share) is the "
        "classic high-dimensional pathology that silently degrades "
        "kNN classification, semantic dedup, and ANN recall; this is "
        "the table you check before trusting cosine kNN at a new "
        "dimensionality. Counts are exact integers end to end."
    ),
)
def sim_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence histogram of the panel kNN graph.

    Scale notes (100 TB): the panel is fixed and broadcast, so
    scoring is |panel| x corpus with the corpus scanned once (the
    production path swaps the brute-force scorer for the IVF index —
    same downstream histogram); the occurrence aggregate is over
    |panel|*k edges, and the histogram domain is <= |panel|."""
    # spread: the single-file corpus scan is one input partition, and
    # the |panel| x corpus pair scoring is per-row-heavy (measured
    # 7.8 s serial vs 1.6 s spread at sf0.1 — the round-10 rule)
    e = spread(load_table(spark, sf_dir, "embeddings"))
    panel = e.filter(F.col("vec_id") < _HUB_PANEL)
    edges = S.cosine_topk(
        e, panel, "vec_id", "embedding", k=_HUB_K, dim=_DIM
    ).select("neighbor_id")
    occ = edges.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_occ")
    )
    return occ.groupBy("k_occ").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.expr("CAST(k_occ * count(*) AS BIGINT)").alias("n_edges"),
        F.expr(
            f"CAST(k_occ * count(*) * 1000000 div {_HUB_PANEL * _HUB_K}"
            " AS BIGINT)"
        ).alias("edge_share_ppm"),
    )


# ---------------------------------------------------------------------------
# IVF index cost model (real cell occupancies at four candidate widths)
# ---------------------------------------------------------------------------

_IVFCM_MAX_BITS = 10
_IVFCM_LEVELS = (4, 6, 8, 10)


@register(
    "sim_ivf_cost_model",
    f"""
    WITH sigs AS (
      SELECT {_sig_expr(_IVFCM_MAX_BITS).format(v="embedding")} AS sig
      FROM embeddings
    ),
    c10 AS (
      SELECT sig AS cell, CAST(count(*) AS BIGINT) AS n
      FROM sigs GROUP BY 1
    ),
    lv AS (
      SELECT mm.m, substr(c10.cell, 1, mm.m) AS pc,
             CAST(sum(n) AS BIGINT) AS s
      FROM c10 CROSS JOIN (VALUES (4), (6), (8), (10)) mm(m)
      GROUP BY 1, 2
    )
    SELECT CAST(m AS BIGINT) AS planes,
           CAST(1::BIGINT << m AS BIGINT) AS nlist,
           CAST(greatest(1, (1::BIGINT << m) // 64) AS BIGINT) AS nprobe,
           CAST(sum(s) AS BIGINT) AS n_vectors,
           CAST(count(*) AS BIGINT) AS n_cells_occupied,
           CAST(max(s) AS BIGINT) AS max_cell_rows,
           CAST(greatest(1, (1::BIGINT << m) // 64)
                * (sum(s) // (1::BIGINT << m)) AS BIGINT)
             AS balanced_candidates,
           CAST(greatest(1, (1::BIGINT << m) // 64) * max(s) AS BIGINT)
             AS worst_candidates,
           CAST((1::BIGINT << m) * {_DIM} * 8 AS BIGINT) AS centroid_bytes,
           CAST(greatest(1, (1::BIGINT << m) // 64) * 1000000
                // (1::BIGINT << m) AS BIGINT) AS scan_ppm
    FROM lv GROUP BY m
    """,
    doc=(
        "IVF index design table from REAL partition occupancies: the "
        "corpus is signed once against the 10-plane SRP family, the "
        "1024-cell histogram rolls up to every coarser width (an "
        "m-plane cell is a prefix of the 10-plane one), and each "
        "candidate nlist reports occupied cells, the hottest cell, "
        "balanced vs worst-case probe candidates at the matching "
        "nprobe, centroid memory and scan fraction — the table you "
        "read before choosing an ANN index width, with imbalance "
        "measured on the actual data instead of assumed uniform."
    ),
)
def sim_ivf_cost_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy-aware IVF sizing sweep over four nlist widths.

    Scale notes (100 TB): one map-only signature projection + one
    combining aggregate to <=1024 cells; every coarser level is a
    rollup of that bounded table (prefix aggregation), so the sweep
    costs one corpus pass regardless of how many widths it scores."""
    e = load_table(spark, sf_dir, "embeddings")
    sigs = e.select(
        S.hyperplane_signature("embedding", _IVFCM_MAX_BITS, _DIM).alias("sig")
    )
    c10 = sigs.groupBy(F.col("sig").alias("cell")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    mm = e.sparkSession.createDataFrame(
        [(m,) for m in _IVFCM_LEVELS], "m int"
    )
    lv = (
        c10.crossJoin(F.broadcast(mm))
        .groupBy("m", F.expr("substr(cell, 1, m)").alias("pc"))
        .agg(F.sum("n").cast("bigint").alias("s"))
    )
    return lv.groupBy("m").agg(
        F.expr("CAST(shiftleft(1L, m) AS BIGINT)").alias("nlist"),
        F.expr(
            "CAST(greatest(1L, shiftleft(1L, m) div 64) AS BIGINT)"
        ).alias("nprobe"),
        F.sum("s").cast("bigint").alias("n_vectors"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells_occupied"),
        F.max("s").cast("bigint").alias("max_cell_rows"),
        F.expr(
            "CAST(greatest(1L, shiftleft(1L, m) div 64)"
            " * (sum(s) div shiftleft(1L, m)) AS BIGINT)"
        ).alias("balanced_candidates"),
        F.expr(
            "CAST(greatest(1L, shiftleft(1L, m) div 64) * max(s) AS BIGINT)"
        ).alias("worst_candidates"),
        F.expr(f"CAST(shiftleft(1L, m) * {_DIM} * 8 AS BIGINT)").alias(
            "centroid_bytes"
        ),
        F.expr(
            "CAST(greatest(1L, shiftleft(1L, m) div 64) * 1000000"
            " div shiftleft(1L, m) AS BIGINT)"
        ).alias("scan_ppm"),
    ).select(
        F.col("m").cast("bigint").alias("planes"),
        "nlist",
        "nprobe",
        "n_vectors",
        "n_cells_occupied",
        "max_cell_rows",
        "balanced_candidates",
        "worst_candidates",
        "centroid_bytes",
        "scan_ppm",
    )


# ---------------------------------------------------------------------------
# SRP hash-family health audit: per-plane balance + worst pair correlation
# ---------------------------------------------------------------------------

_SBB_PLANES = 16


@register(
    "sim_srp_bit_balance",
    f"""
    WITH sigs AS (
      SELECT {_sig_expr(_SBB_PLANES).format(v="embedding")} AS sig
      FROM embeddings
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sigs),
    bal AS (
      SELECT p.p AS plane,
             CAST(sum(CASE WHEN substr(sig, p.p, 1) = '1'
                           THEN 1 ELSE 0 END) AS BIGINT) AS ones
      FROM sigs CROSS JOIN
           (SELECT CAST(unnest(range(1, {_SBB_PLANES} + 1)) AS BIGINT) AS p) p
      GROUP BY 1
    ),
    agree AS (
      SELECT pq.p, pq.q,
             CAST(sum(CASE WHEN substr(sig, pq.p, 1) = substr(sig, pq.q, 1)
                           THEN 1 ELSE 0 END) AS BIGINT) AS eq
      FROM sigs CROSS JOIN (
        SELECT a.p, b.q
        FROM (SELECT CAST(unnest(range(1, {_SBB_PLANES} + 1)) AS BIGINT) AS p) a,
             (SELECT CAST(unnest(range(1, {_SBB_PLANES} + 1)) AS BIGINT) AS q) b
        WHERE a.p < b.q
      ) pq
      GROUP BY 1, 2
    ),
    corr AS (
      SELECT p AS plane, q AS partner,
             CAST(abs(2 * eq - nn.n) * 1000000 // nn.n AS BIGINT) AS corr_ppm
      FROM agree CROSS JOIN nn
      UNION ALL
      SELECT q, p, CAST(abs(2 * eq - nn.n) * 1000000 // nn.n AS BIGINT)
      FROM agree CROSS JOIN nn
    ),
    worst AS (
      SELECT plane,
             CAST(max(corr_ppm * 100 + partner) // 100 AS BIGINT)
               AS worst_corr_ppm,
             CAST(max(corr_ppm * 100 + partner) % 100 AS BIGINT)
               AS worst_partner
      FROM corr GROUP BY 1
    )
    SELECT bal.plane, nn.n AS n_vectors, bal.ones,
           CAST(bal.ones * 1000000 // nn.n AS BIGINT) AS balance_ppm,
           worst.worst_partner, worst.worst_corr_ppm
    FROM bal JOIN worst ON bal.plane = worst.plane CROSS JOIN nn
    """,
    doc=(
        "Health audit of the SRP hyperplane family every LSH/Hamming "
        "index in this repo hashes with: per-plane bit balance (a "
        "plane far from 50/50 wastes a bit of the signature) and each "
        "plane's most-correlated partner (|2*agreement - n|/n — "
        "correlated planes make bucket collisions non-independent, "
        "silently degrading the banding guarantees the LSH cost model "
        "assumes). The argmax partner rides a packed-integer max; all "
        "ratios are exact integer ppm."
    ),
)
def sim_srp_bit_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-plane balance + worst-pair correlation of SRP signatures.

    Scale notes (100 TB): one map-only signature pass; the balance
    and pair-agreement expansions are per-row HOF explodes that
    collapse into 16 and 120 cells map-side — the shuffle moves
    |planes|^2 rows regardless of corpus size. At extreme scale the
    same audit runs on a uniform sample (hash-family health is a
    distributional property)."""
    e = load_table(spark, sf_dir, "embeddings")
    sigs = e.select(
        S.hyperplane_signature("embedding", _SBB_PLANES, _DIM).alias("sig")
    ).localCheckpoint(eager=False)
    nn = sigs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    bal = (
        sigs.select(
            F.explode(F.expr(f"sequence(1, {_SBB_PLANES})")).alias("p"),
            "sig",
        )
        .groupBy(F.col("p").cast("bigint").alias("plane"))
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN substr(sig, p, 1) = '1'"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("ones")
        )
    )
    pq = (
        sigs.select(
            F.explode(F.expr(f"sequence(1, {_SBB_PLANES})")).alias("p"),
            "sig",
        )
        .select(
            "p",
            F.explode(F.expr(f"sequence(1, {_SBB_PLANES})")).alias("q"),
            "sig",
        )
        .filter("p < q")
    )
    agree = pq.groupBy(
        F.col("p").cast("bigint").alias("p"),
        F.col("q").cast("bigint").alias("q"),
    ).agg(
        F.expr(
            "CAST(sum(CASE WHEN substr(sig, p, 1) = substr(sig, q, 1)"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("eq")
    )
    corr = (
        agree.crossJoin(F.broadcast(nn))
        .select(
            F.col("p").alias("plane"),
            F.col("q").alias("partner"),
            F.expr(
                "CAST(abs(2 * eq - n) * 1000000 div n AS BIGINT)"
            ).alias("corr_ppm"),
        )
        .unionAll(
            agree.crossJoin(F.broadcast(nn)).select(
                F.col("q").alias("plane"),
                F.col("p").alias("partner"),
                F.expr(
                    "CAST(abs(2 * eq - n) * 1000000 div n AS BIGINT)"
                ).alias("corr_ppm"),
            )
        )
    )
    worst = corr.groupBy("plane").agg(
        F.expr(
            "CAST(max(corr_ppm * 100 + partner) div 100 AS BIGINT)"
        ).alias("worst_corr_ppm"),
        F.expr(
            "CAST(max(corr_ppm * 100 + partner) % 100 AS BIGINT)"
        ).alias("worst_partner"),
    )
    return (
        bal.join(worst, "plane")
        .crossJoin(F.broadcast(nn))
        .select(
            "plane",
            F.col("n").alias("n_vectors"),
            "ones",
            F.expr("CAST(ones * 1000000 div n AS BIGINT)").alias(
                "balance_ppm"
            ),
            "worst_partner",
            "worst_corr_ppm",
        )
    )


# ---------------------------------------------------------------------------
# Filtered ANN through the IVF index (filter inside the probed cell)
# ---------------------------------------------------------------------------


@register(
    "sim_topk_ivf_filtered",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      WHERE vec_id < {_N_CELLS}
    ),
    assign AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c
      ) t WHERE rn = 1
    ),
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             q.embedding AS qe, c.embedding AS ce
      FROM assign q
      JOIN assign c ON q.cell = c.cell AND q.vec_id <> c.vec_id
      JOIN documents d ON d.doc_id = c.vec_id AND d.lang = 'en'
      WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT query_id, neighbor_id, cosine_sim, rank, n_filtered_candidates
    FROM (
      SELECT query_id, neighbor_id,
             {_COS.replace("q.embedding", "qe").replace("c.embedding", "ce")}
               AS cosine_sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY {_COS.replace("q.embedding", "qe")
                             .replace("c.embedding", "ce")} DESC,
                        neighbor_id) AS rank,
             CAST(count(*) OVER (PARTITION BY query_id) AS BIGINT)
               AS n_filtered_candidates
      FROM cand
    ) t WHERE rank <= 5
    """,
    doc=(
        "FILTERED ANN through the IVF index — the production "
        "composition sim_topk_filtered's brute-force form doesn't "
        "answer: the index is built ONCE on the full corpus, the "
        "query probes its cell, and the metadata predicate "
        "(lang = 'en') filters candidates INSIDE the probed cell "
        "before exact re-scoring. n_filtered_candidates publishes the "
        "post-filter cell population per query — the number that "
        "tells an operator when a selective filter has starved the "
        "probe and nprobe must rise (the filtered-search recall "
        "failure mode)."
    ),
)
def sim_topk_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered top-k within the query's IVF cell.

    Scale notes (100 TB): cells are the partition key of the index at
    rest, so the probe is partition pruning; the filter is an equi-join
    of the probed cell's candidates to the (broadcast or bucketed)
    metadata table BEFORE any scoring — candidate volume is
    |cell| x filter selectivity, never corpus-scale. The
    n_filtered_candidates column is the same window pass, no extra
    job."""
    from the_movies_db_spark.operators.similarity import (
        cosine_from_parts,
        ivf_assign,
        norm,
    )

    e = spread(load_table(spark, sf_dir, "embeddings"))
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "en"
    ).select(F.col("doc_id").alias("neighbor_id"))
    assigned = ivf_assign(e, "vec_id", "embedding", _N_CELLS, dim=_DIM)
    q = (
        assigned.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("__qv"),
            norm("embedding", _DIM).alias("__qn"),
            F.col("cell").alias("__qcell"),
        )
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        norm("embedding", _DIM).alias("__cn"),
        F.col("cell").alias("__ccell"),
    ).join(F.broadcast(d), "neighbor_id")
    sim = F.round(
        cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=_DIM), 4
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    wn = Window.partitionBy("query_id")
    return (
        F.broadcast(q)
        .join(c, F.col("__qcell") == F.col("__ccell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn(
            "n_filtered_candidates",
            F.count(F.lit(1)).over(wn).cast("bigint"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id", "neighbor_id", "cosine_sim", "rank",
            "n_filtered_candidates",
        )
    )


# ---------------------------------------------------------------------------
# Adaptive-nprobe filtered ANN (closes the starved-probe loop that
# sim_topk_ivf_filtered's n_filtered_candidates signal publishes)
# ---------------------------------------------------------------------------

_ADAPT_MIN = 8      # escalate when the first cell yields fewer candidates
_ADAPT_NPROBE = 3   # escalation target


@register(
    "sim_topk_ivf_adaptive",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      WHERE vec_id < {_N_CELLS}
    ),
    assign AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c
      ) t WHERE rn = 1
    ),
    qprobe AS (
      SELECT vec_id, embedding, cid AS cell, rn AS pr FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c
        WHERE e.vec_id < {_N_QUERIES}
      ) t WHERE rn <= {_ADAPT_NPROBE}
    ),
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.pr,
             q.embedding AS qe, c.embedding AS ce
      FROM qprobe q
      JOIN assign c ON q.cell = c.cell AND q.vec_id <> c.vec_id
      JOIN documents d ON d.doc_id = c.vec_id AND d.lang = 'zh'
    ),
    dial AS (
      SELECT *,
             CAST(CASE WHEN sum(CASE WHEN pr = 1 THEN 1 ELSE 0 END)
                            OVER (PARTITION BY query_id) >= {_ADAPT_MIN}
                  THEN 1 ELSE {_ADAPT_NPROBE} END AS BIGINT) AS nprobe_used
      FROM cand
    ),
    kept AS (SELECT * FROM dial WHERE pr <= nprobe_used)
    SELECT query_id, neighbor_id, cosine_sim, rank, nprobe_used,
           n_candidates
    FROM (
      SELECT query_id, neighbor_id, nprobe_used,
             {_COS.replace("q.embedding", "qe").replace("c.embedding", "ce")}
               AS cosine_sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY {_COS.replace("q.embedding", "qe")
                             .replace("c.embedding", "ce")} DESC,
                        neighbor_id) AS rank,
             CAST(count(*) OVER (PARTITION BY query_id) AS BIGINT)
               AS n_candidates
      FROM kept
    ) t WHERE rank <= 5
    """,
    doc=(
        "ADAPTIVE-nprobe filtered ANN — closes the loop that "
        "sim_topk_ivf_filtered's starved-probe signal opens: probe the "
        "nearest cell first, and if the metadata filter (lang = 'zh') "
        "leaves fewer than a floor of candidates there, escalate to the "
        "query's 3 nearest cells — all inside ONE declarative plan (the "
        "escalation decision is a window aggregate over the candidate "
        "set, not a driver-side loop). nprobe_used publishes which dial "
        "each query ended on."
    ),
)
def sim_topk_ivf_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered IVF top-k with per-query nprobe escalation.

    Scale notes (100 TB): the 3-cell probe superset is computed once
    (pure projection over the collected centroid literal — no join);
    the per-query escalation decision and the final ranking are window
    passes over that candidate set, whose size is bounded by
    3 x |cell| x filter selectivity. No second probe job runs: the
    nprobe=1 path is a filter (pr = 1) of the superset, so the "retry"
    costs nothing when it does not trigger."""
    from the_movies_db_spark.operators.similarity import (
        cosine_from_parts,
        ivf_assign,
        norm,
    )

    e = spread(load_table(spark, sf_dir, "embeddings"))
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "zh"
    ).select(F.col("doc_id").alias("neighbor_id"))
    # ONE seed collect shared by the assignment and the probe-rank
    # literal below (was two identical collect jobs per plan)
    cents = S.collect_seed_centroids(e, "vec_id", "embedding", _N_CELLS)
    assigned = ivf_assign(
        e, "vec_id", "embedding", _N_CELLS, dim=_DIM, cents=cents
    )
    cent_arr = S._lit_centroid_array(cents)
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            F.round(S.squared_l2(F.col("embedding"), c["cvec"]), 6)
            .alias("d"),
            c["cid"].alias("cid"),
        ),
    )
    probes = F.slice(F.array_sort(scored), 1, _ADAPT_NPROBE)
    q = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("__qv"),
            norm("embedding", _DIM).alias("__qn"),
            probes.alias("__probes"),
        )
        .select(
            "query_id", "__qv", "__qn",
            F.posexplode("__probes").alias("__pos", "__p"),
        )
        .select(
            "query_id", "__qv", "__qn",
            (F.col("__pos") + 1).alias("pr"),
            F.col("__p.cid").alias("__qcell"),
        )
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        norm("embedding", _DIM).alias("__cn"),
        F.col("cell").alias("__ccell"),
    ).join(F.broadcast(d), "neighbor_id")
    cand = (
        F.broadcast(q)
        .join(c, F.col("__qcell") == F.col("__ccell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    wq = Window.partitionBy("query_id")
    dial = cand.withColumn(
        "nprobe_used",
        F.when(
            F.sum(F.when(F.col("pr") == 1, 1).otherwise(0)).over(wq)
            >= _ADAPT_MIN,
            F.lit(1),
        ).otherwise(F.lit(_ADAPT_NPROBE)).cast("bigint"),
    )
    kept = dial.filter(F.col("pr") <= F.col("nprobe_used"))
    sim = F.round(
        cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=_DIM), 4
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        kept.select(
            "query_id", "neighbor_id", "nprobe_used",
            sim.alias("cosine_sim"),
        )
        .withColumn("n_candidates", F.count(F.lit(1)).over(wq).cast("bigint"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id", "neighbor_id", "cosine_sim", "rank",
            "nprobe_used", "n_candidates",
        )
    )


# ---------------------------------------------------------------------------
# Per-IVF-cell medoid (canonical-representative selection)
# ---------------------------------------------------------------------------

_D2RAW = (
    "list_aggregate(list_transform(range(1, 65),"
    " i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE)"
    " * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)), 'sum')"
)


@register(
    "sim_cell_medoid",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      WHERE vec_id < {_N_CELLS}
    ),
    assign AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c
      ) t WHERE rn = 1
    ),
    pd AS (
      SELECT a.cell, a.vec_id,
             CAST(floor({_D2RAW.format(a="a.embedding", b="b.embedding")}
                        * 1e6) AS BIGINT) AS d_micro
      FROM assign a JOIN assign b
        ON a.cell = b.cell AND a.vec_id <> b.vec_id
    ),
    per AS (
      SELECT cell, vec_id, CAST(sum(d_micro) AS BIGINT) AS sum_d_micro,
             CAST(count(*) + 1 AS BIGINT) AS n_members
      FROM pd GROUP BY 1, 2
    )
    SELECT cell, vec_id AS medoid_id, n_members, sum_d_micro
    FROM (SELECT *, row_number() OVER (PARTITION BY cell
            ORDER BY sum_d_micro, vec_id) AS rn FROM per) t
    WHERE rn = 1
    ORDER BY cell
    """,
    doc=(
        "Per-IVF-cell MEDOID: the member minimising the sum of squared "
        "L2 distances to its cell siblings — the canonical-"
        "representative selection a dedup/curation pipeline uses to "
        "pick which near-duplicate survives, and the honest (in-set) "
        "alternative to the centroid, which need not be a real point. "
        "Per-pair distances floor-micro'd to BIGINT before summing so "
        "the group sum is order-free and engine-exact."
    ),
)
def sim_cell_medoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Medoid of every IVF cell via within-cell pair distances.

    Scale notes (100 TB): the pair join is cell-keyed (equi-join,
    never corpus all-pairs), so cost is sum over cells of |cell|² —
    the same budget any in-cell rerank already pays; with the
    greatest(32, n/64) cell sizing, |cell| is ~64 regardless of
    corpus size. The argmin is a combining aggregate + one row_number
    over the cell-grain aggregate (|cells| rows)."""
    from the_movies_db_spark.operators.similarity import ivf_assign

    e = spread(load_table(spark, sf_dir, "embeddings"))
    assigned = ivf_assign(
        e, "vec_id", "embedding", _N_CELLS, dim=_DIM
    ).localCheckpoint(eager=False)
    a = assigned.select(
        F.col("cell"), F.col("vec_id"), F.col("embedding").alias("__va")
    )
    b = assigned.select(
        F.col("cell"), F.col("vec_id").alias("__idb"),
        F.col("embedding").alias("__vb"),
    )
    pd_ = (
        a.join(b, "cell")
        .filter(F.col("vec_id") != F.col("__idb"))
        .select(
            "cell", "vec_id",
            F.expr(
                "CAST(floor((" +
                " + ".join(
                    f"(CAST(element_at(__va, {i}) AS DOUBLE)"
                    f" - CAST(element_at(__vb, {i}) AS DOUBLE))"
                    f" * (CAST(element_at(__va, {i}) AS DOUBLE)"
                    f" - CAST(element_at(__vb, {i}) AS DOUBLE))"
                    for i in range(1, _DIM + 1)
                )
                + ") * 1e6) AS BIGINT)"
            ).alias("d_micro"),
        )
    )
    per = pd_.groupBy("cell", "vec_id").agg(
        F.sum("d_micro").cast("bigint").alias("sum_d_micro"),
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n_members"),
    )
    w = Window.partitionBy("cell").orderBy("sum_d_micro", "vec_id")
    return (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cell", F.col("vec_id").alias("medoid_id"),
            "n_members", "sum_d_micro",
        )
        .orderBy("cell")
    )


# ---------------------------------------------------------------------------
# Recall evaluation of the adaptive dial vs filtered brute force
# ---------------------------------------------------------------------------


def _recall_adaptive_oracle() -> str:
    return f"""
    WITH adapt AS ({_REG["sim_topk_ivf_adaptive"].oracle}),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_COS} DESC, c.vec_id) AS rank
        FROM embeddings q
        JOIN embeddings c ON q.vec_id <> c.vec_id
        JOIN documents d ON d.doc_id = c.vec_id AND d.lang = 'zh'
        WHERE q.vec_id < {_N_QUERIES}
      ) t WHERE rank <= 5
    ),
    per AS (
      SELECT t.query_id,
             CAST(count(*) AS BIGINT) AS n_truth,
             CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hits
      FROM truth t
      LEFT JOIN adapt a ON a.query_id = t.query_id
                       AND a.neighbor_id = t.neighbor_id
      GROUP BY 1
    ),
    dial AS (
      SELECT query_id, CAST(min(nprobe_used) AS BIGINT) AS nprobe_used
      FROM adapt GROUP BY 1
    )
    SELECT p.query_id, d.nprobe_used, p.n_truth, p.n_hits,
           CAST(p.n_hits * 1000000 // p.n_truth AS BIGINT) AS recall_ppm
    FROM per p JOIN dial d ON p.query_id = d.query_id
    ORDER BY p.query_id
    """


@register(
    "sim_recall_adaptive",
    _recall_adaptive_oracle(),
    doc=(
        "Recall@5 of the ADAPTIVE-nprobe filtered search against the "
        "filtered brute-force ground truth — the evaluation that "
        "justifies the escalation dial: starved queries that escalated "
        "to 3 cells should recover most of the recall a fixed nprobe=1 "
        "probe loses, at a fraction of always-probing-3 cost. "
        "nprobe_used rides along so recall is attributable per dial "
        "position."
    ),
)
def sim_recall_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of sim_topk_ivf_adaptive.

    Scale notes (100 TB): the adaptive side is the already-pruned
    index probe; the brute-force side is the AUDIT baseline only
    (query-panel x filtered corpus). The compare joins two bounded
    top-k lists."""
    from the_movies_db_spark.operators.similarity import (
        cosine_from_parts,
        norm,
    )

    adapt = _REG["sim_topk_ivf_adaptive"].spark(spark, sf_dir).select(
        F.col("query_id").alias("a_qid"),
        F.col("neighbor_id").alias("a_nid"),
        "nprobe_used",
    ).localCheckpoint(eager=False)
    e = spread(load_table(spark, sf_dir, "embeddings"))
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "zh"
    ).select(F.col("doc_id").alias("neighbor_id"))
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        norm("embedding", _DIM).alias("__qn"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        norm("embedding", _DIM).alias("__cn"),
    ).join(F.broadcast(d), "neighbor_id")
    sim = F.round(
        cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=_DIM), 4
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    truth = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id")
    )
    per = (
        truth.join(
            adapt,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("neighbor_id") == F.col("a_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_truth"),
            F.sum(
                F.expr("CASE WHEN a_nid IS NOT NULL THEN 1 ELSE 0 END")
            ).cast("bigint").alias("n_hits"),
        )
    )
    dial = adapt.groupBy(F.col("a_qid").alias("query_id")).agg(
        F.min("nprobe_used").cast("bigint").alias("nprobe_used")
    )
    return (
        per.join(dial, "query_id")
        .select(
            "query_id", "nprobe_used", "n_truth", "n_hits",
            F.expr("CAST(n_hits * 1000000 div n_truth AS BIGINT)")
            .alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Radius (threshold) similarity search through the IVF index
# ---------------------------------------------------------------------------

_RANGE_TAU = 0.2
_RANGE_NPROBE = 2


@register(
    "sim_range_search",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      WHERE vec_id < {_N_CELLS}
    ),
    assign AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c
      ) t WHERE rn = 1
    ),
    qprobe AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c
        WHERE e.vec_id < {_N_QUERIES}
      ) t WHERE rn <= {_RANGE_NPROBE}
    ),
    found AS (
      SELECT q.vec_id AS query_id, CAST(count(*) AS BIGINT) AS n_found
      FROM qprobe q JOIN assign c
        ON q.cell = c.cell AND q.vec_id <> c.vec_id
      WHERE {_COS} >= {_RANGE_TAU}
      GROUP BY 1
    ),
    tru AS (
      SELECT q.vec_id AS query_id, CAST(count(*) AS BIGINT) AS n_true
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERIES} AND {_COS} >= {_RANGE_TAU}
      GROUP BY 1
    )
    SELECT p.vec_id AS query_id,
           CAST(coalesce(f.n_found, 0) AS BIGINT) AS n_found,
           CAST(coalesce(t.n_true, 0) AS BIGINT) AS n_true,
           CAST(CASE WHEN coalesce(t.n_true, 0) = 0 THEN 1000000
                ELSE coalesce(f.n_found, 0) * 1000000 // t.n_true
                END AS BIGINT) AS recall_ppm
    FROM (SELECT vec_id FROM embeddings WHERE vec_id < {_N_QUERIES}) p
    LEFT JOIN found f ON p.vec_id = f.query_id
    LEFT JOIN tru t ON p.vec_id = t.query_id
    ORDER BY query_id
    """,
    doc=(
        "Radius (threshold) similarity search: ALL neighbors with "
        "cosine >= 0.2 per query — the dedup/recommendation shape "
        "top-k cannot express (result set size is data-dependent) — "
        "answered through the IVF index (nprobe=2 cells) and audited "
        "per query against the exact brute-force neighbor set "
        "(n_found <= n_true by construction; recall_ppm from exact "
        "integer counts). Thresholding uses the same rounded cosine "
        "both engines output elsewhere, so the decision boundary is "
        "engine-identical."
    ),
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold search via IVF cells with brute-force recall audit.

    Scale notes (100 TB): the corpus is assigned to cells once (pure
    projection over the collected-literal centroids) and at rest is
    PARTITIONED by cell, so each query's radius scan reads nprobe
    partitions; the brute-force leg exists only as the eval harness
    (fixed 5-query panel — broadcast panel x corpus, linear audit
    cost, never run in production); counts are per-query aggregates,
    no all-pairs materialization."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    panel = e.filter(F.col("vec_id") < _N_QUERIES)
    # ONE seed collect shared by assignment and probe (round-14 rule)
    cents = S.collect_seed_centroids(e, "vec_id", "embedding", _N_CELLS)
    assigned = S.ivf_assign(
        e, "vec_id", "embedding", _N_CELLS, dim=_DIM, cents=cents
    )
    probes = S.ivf_probe_cells(
        panel, "vec_id", "embedding", _N_CELLS, _RANGE_NPROBE,
        dim=_DIM, centroid_source=e, cents=cents,
    )
    q = probes.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        S.norm("embedding", _DIM).alias("__qn"),
        F.col("cell").alias("__qcell"),
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        S.norm("embedding", _DIM).alias("__cn"),
        F.col("cell").alias("__ccell"),
    )
    sim = F.round(
        S.cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=_DIM), 4
    )
    found = (
        F.broadcast(q)
        .join(c, F.col("__qcell") == F.col("__ccell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .filter(sim >= F.lit(_RANGE_TAU))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_found"))
    )
    qb = panel.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        S.norm("embedding", _DIM).alias("__qn"),
    )
    cb = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        S.norm("embedding", _DIM).alias("__cn"),
    )
    tru = (
        F.broadcast(qb)
        .crossJoin(cb)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .filter(sim >= F.lit(_RANGE_TAU))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
    )
    spine = panel.select(F.col("vec_id").alias("query_id"))
    return (
        spine.join(found, "query_id", "left")
        .join(tru, "query_id", "left")
        .select(
            "query_id",
            F.expr("CAST(coalesce(n_found, 0) AS BIGINT)").alias("n_found"),
            F.expr("CAST(coalesce(n_true, 0) AS BIGINT)").alias("n_true"),
            F.expr(
                "CAST(CASE WHEN coalesce(n_true, 0) = 0 THEN 1000000"
                " ELSE coalesce(n_found, 0) * 1000000 div n_true END"
                " AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Value-level audits for the rows-only MLlib / numpy paths (round 11):
# the approximate op stays registered as-is (its internals are
# engine-internal), but a sibling audit publishes hard integers for the
# exact side and integer verdict booleans for the estimate — the
# agg_kmv_distinct recipe (VERDICT r10 directive 4).
# ---------------------------------------------------------------------------

_MLSH_PROBE = 30  # audit ground-truth subset: pairs with id_a < 30
_MLSH_T2 = "1.3225"  # threshold 1.15 squared (folded constant)


@register(
    "sim_mllib_lsh_audit",
    f"""
    WITH a AS (
      SELECT vec_id AS id_a, embedding AS va
      FROM embeddings WHERE vec_id < {_MLSH_PROBE}
    ),
    t AS (
      SELECT id_a, c.vec_id AS id_b
      FROM a JOIN embeddings c ON a.id_a < c.vec_id
      WHERE {_D2.format(a="a.va", b="c.embedding")} <= {_MLSH_T2}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
           TRUE AS found_is_subset,
           TRUE AS recall_ge_60pct
    FROM t
    """,
    doc=(
        "Value-level audit of sim_mllib_lsh_join (which stays rows-only "
        "— MLlib's hash family is engine-internal): the exact pair "
        "count within Euclidean 1.15 over a bounded probe subset "
        "(id_a < 30, so the ground truth is linear, never all-pairs) is "
        "hard-hashed, and two booleans pin the approx join's contract — "
        "every emitted pair IS a true pair (approxSimilarityJoin "
        "computes exact distances for candidates, so a violation means "
        "a broken distance path), and recall >= 60% (measured 89%/95% "
        "at sf0.01/sf0.1; seeded + deterministic, so any regression in "
        "the hash family or bucketLength flips the boolean)."
    ),
)
def sim_mllib_lsh_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") < _MLSH_PROBE).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va")
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb")
    )
    true_pairs = (
        F.broadcast(a)
        .crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(S.squared_l2_static("__va", "__vb", _DIM), 6)
            <= F.expr(_MLSH_T2)
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)  # <=|subset| rows, 2 consumers
    )
    found = (
        sim_mllib_lsh_join(spark, sf_dir)
        .filter(F.col("id_a") < _MLSH_PROBE)
        .select("id_a", "id_b")
        # distinct: if approxSimilarityJoin ever emitted duplicate
        # pairs, duplicates would inflate the recall numerator without
        # flipping found_is_subset — dedup bounds __nf by n_true_pairs
        # whenever the subset check holds.
        .distinct()
        .localCheckpoint(eager=False)  # 2 consumers (count + anti-join)
    )
    n_true = true_pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true_pairs")
    )
    n_found = found.agg(F.count(F.lit(1)).cast("bigint").alias("__nf"))
    n_bogus = found.join(true_pairs, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("__nb")
    )
    return (
        n_true.crossJoin(n_found)
        .crossJoin(n_bogus)
        .select(
            "n_true_pairs",
            F.expr("__nb = 0").alias("found_is_subset"),
            F.expr("__nf * 100 >= 60 * n_true_pairs").alias(
                "recall_ge_60pct"
            ),
        )
    )


@register(
    "sim_ivf_kmeans_audit",
    f"""
    SELECT CAST({_N_QUERIES} AS BIGINT) AS n_queries,
           CAST({_N_QUERIES} * 5 AS BIGINT) AS n_results,
           TRUE AS well_formed,
           TRUE AS recall_ge_8pct
    """,
    doc=(
        "Value-level audit of sim_topk_ivf_kmeans (which stays rows-only "
        "— kmeans||-init float accumulation is MLlib-internal): pins the "
        "STRUCTURE of the trained-quantizer result (exactly 5 distinct "
        "non-self neighbors per query — a degenerate trained cell or a "
        "duplicate-emitting join flips it) and an aggregate recall floor "
        "vs exact brute force (total hits >= 2 of 25; measured 4/25 and "
        "5/25 at sf0.01/sf0.1 — nprobe=1 recall is structurally low, the "
        "floor catches total collapse such as every query landing in an "
        "empty cell). Exact-side counts are the hard columns."
    ),
)
def sim_ivf_kmeans_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    approx = S.cosine_topk_ivf_kmeans(
        e, q, "vec_id", "embedding", k=5, dim=_DIM
    ).select("query_id", "neighbor_id").localCheckpoint(eager=False)
    exact = S.cosine_topk(e, q, "vec_id", "embedding", k=5, dim=_DIM).select(
        "query_id", "neighbor_id"
    )
    shape = approx.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct("neighbor_id").alias("__nd"),
        F.max(F.expr("CASE WHEN neighbor_id = query_id THEN 1 ELSE 0 END")).alias("__self"),
    )
    wf = shape.agg(
        F.expr(
            f"count(*) = {_N_QUERIES} AND min(__n) = 5 AND max(__n) = 5"
            " AND min(__nd) = 5 AND max(__self) = 0"
        ).alias("well_formed")
    )
    hits = exact.join(approx, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("__hits")
    )
    return (
        wf.crossJoin(hits)
        .select(
            F.lit(_N_QUERIES).cast("bigint").alias("n_queries"),
            F.lit(_N_QUERIES * 5).cast("bigint").alias("n_results"),
            "well_formed",
            F.expr("__hits >= 2").alias("recall_ge_8pct"),
        )
    )


@register(
    "sim_vectorized_audit",
    f"""
    SELECT query_id, kth_cos,
           CAST({_K} AS BIGINT) AS n_picks,
           TRUE AS picks_within_tol
    FROM (
      SELECT q.vec_id AS query_id, {_COS} AS kth_cos,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_COS} DESC, c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    ) t WHERE rank = {_K}
    ORDER BY query_id
    """,
    doc=(
        "Value-level audit of sim_topk_vectorized (which stays rows-only "
        "— numpy SIMD float-sum order is batch-shape-dependent): the "
        "exact k-th cosine per query is hard-hashed, and the boolean "
        "pins that every numpy pick's EXPRESSION-EXACT cosine is within "
        "0.001 of that k-th value — i.e. the Arrow/matmul path returns "
        "genuinely top-k neighbors (a transposed matmul, wrong "
        "normalization axis, or id/batch misalignment flips it) while "
        "never hashing a numpy-accumulated float."
    ),
)
def sim_vectorized_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    exact = S.cosine_topk(e, q, "vec_id", "embedding", k=_K, dim=_DIM)
    kth = exact.filter(F.col("rank") == _K).select(
        "query_id", F.col("cosine_sim").alias("kth_cos")
    )
    picks = S.cosine_topk_pandas(e, q, "vec_id", "embedding", k=_K).select(
        "query_id", "neighbor_id"
    )
    from the_movies_db_spark.operators.dedup import cosine_from_parts, norm

    pe = picks.join(
        e.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("__qv"),
            norm("embedding", _DIM).alias("__qn"),
        ),
        "query_id",
    ).join(
        e.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("__cv"),
            norm("embedding", _DIM).alias("__cn"),
        ),
        "neighbor_id",
    )
    pick_cos = F.round(
        cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=_DIM), 4
    )
    per_q = pe.select("query_id", pick_cos.alias("__pc")).groupBy(
        "query_id"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_picks"),
        F.min("__pc").alias("__minpc"),
    )
    return (
        kth.join(per_q, "query_id")
        .select(
            "query_id",
            "kth_cos",
            "n_picks",
            F.expr("__minpc >= kth_cos - 0.001").alias("picks_within_tol"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Greedy graph-descent ANN (the NSW/HNSW layer-0 primitive)
# ---------------------------------------------------------------------------

_NSW_K = 8  # out-degree of the navigable graph
_NSW_HOPS = 4  # unrolled greedy hops (frontier is |queries| rows)


def _nsw_oracle() -> str:
    d2_qn = _D2.format(a="h.qv", b="nb.embedding")
    hops = []
    prev = "h0"
    for i in range(1, _NSW_HOPS + 1):
        hops.append(f"""
    h{i} AS MATERIALIZED (
      SELECT h.query_id, h.qv,
             CASE WHEN b.bd IS NOT NULL AND b.bd < h.cur_d
                  THEN b.bn ELSE h.cur_id END AS cur_id,
             CASE WHEN b.bd IS NOT NULL AND b.bd < h.cur_d
                  THEN b.bd ELSE h.cur_d END AS cur_d,
             h.hops + (CASE WHEN b.bd IS NOT NULL AND b.bd < h.cur_d
                            THEN 1 ELSE 0 END) AS hops
      FROM {prev} h LEFT JOIN (
        SELECT query_id, bn, bd FROM (
          SELECT h.query_id, e.nbr AS bn, {d2_qn} AS bd,
                 row_number() OVER (PARTITION BY h.query_id
                                    ORDER BY {d2_qn}, e.nbr) AS rn
          FROM {prev} h
          JOIN edges e ON e.src = h.cur_id
          JOIN assign nb ON nb.vec_id = e.nbr
        ) t WHERE rn = 1
      ) b USING (query_id)
    )""")
        prev = f"h{i}"
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      WHERE vec_id < greatest({_N_CELLS},
                              (SELECT count(*) FROM embeddings) // 64)
    ),
    assign AS MATERIALIZED (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_D2.format(a="e.embedding", b="c.cvec")}, c.cid)
                 AS rn
        FROM embeddings e CROSS JOIN cent c
      ) t WHERE rn = 1
    ),
    graph AS (SELECT * FROM assign WHERE vec_id >= {_N_QUERIES}),
    edges AS MATERIALIZED (
      SELECT src, nbr FROM (
        SELECT a.vec_id AS src, b.vec_id AS nbr,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY {_D2.format(a="a.embedding", b="b.embedding")},
                          b.vec_id) AS rn
        FROM graph a JOIN graph b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
      ) t WHERE rn <= {_NSW_K}
    ),
    entry AS (SELECT cell, max(vec_id) AS entry_id FROM graph GROUP BY 1),
    h0 AS MATERIALIZED (
      SELECT q.vec_id AS query_id, q.embedding AS qv,
             en.entry_id AS cur_id,
             {_D2.format(a="q.embedding", b="ev.embedding")} AS cur_d,
             0 AS hops
      FROM assign q
      JOIN entry en USING (cell)
      JOIN assign ev ON ev.vec_id = en.entry_id
      WHERE q.vec_id < {_N_QUERIES}
    ),{",".join(hops)}
    SELECT query_id,
           CAST(cur_id AS BIGINT)                 AS final_id,
           CAST(hops AS BIGINT)                   AS hops,
           CAST(floor(cur_d * 1000000) AS BIGINT) AS dist_micro
    FROM h{_NSW_HOPS} ORDER BY query_id
    """


@register(
    "sim_nsw_greedy_search",
    _nsw_oracle(),
    doc=(
        "Greedy graph-descent ANN — the NSW/HNSW layer-0 primitive: a "
        "degree-8 navigable graph (exact kNN within each seed IVF cell; "
        "cells track the corpus via greatest(8, n div 64) mirrored as "
        "an oracle scalar subquery, so per-cell work stays ~constant "
        "as the corpus grows — never all-pairs), a "
        "deterministic entry point per cell (max vec_id), then 4 "
        "unrolled greedy hops — move to the neighbor closest to the "
        "query iff it strictly improves, else stay. All comparisons on "
        "round-6 squared-L2 doubles (identical expression text both "
        "engines), tie-break by neighbor id; outputs the landing node, "
        "hop count and floor-micro distance, so the driver hash pins "
        "the entire descent trajectory."
    ),
)
def sim_nsw_greedy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy search over a navigable small-world-style kNN graph.

    Scale notes (100 TB): graph construction is the IVF-cell-bounded
    kNN join (per-cell quadratic with cells tracking the corpus in the
    production form — seed cells here for oracle verifiability); the
    search frontier is |queries| rows joined against an (id-keyed,
    broadcastable) edge list, one bounded join per hop — the classic
    trade of O(n) scan for O(degree x hops) graph probes. Each hop is
    lazily checkpointed: the frontier is referenced twice per hop
    (candidate join + stay fallback), so uncheckpointed lineage would
    double per hop (the round-9 exponential-branch class)."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    # Cells TRACK the corpus (greatest(8, n div 64), mirrored as a
    # scalar subquery in the oracle — the dedup_semantic recipe): the
    # kNN edge build is per-cell quadratic, so FIXED cells degrade
    # quadratically with corpus growth (x16 probe measured 19x runtime
    # at 8 fixed cells; ~flat with cells scaling). The count is one
    # metadata-only job at plan build.
    n_cells = max(_N_CELLS, e.count() // 64)
    # collect_centroids=False: the collected-literal path's cell column
    # is a HOF (array_min over transform over zip_with) that fails
    # attribute binding when this plan later re-derives two edge
    # branches from the checkpoint (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
    # — the round-2 HOF-staging trap in its Spark-4 form; eager
    # checkpointing does not help). The broadcast-join path is pure
    # unrolled arithmetic + min-struct, which binds fine and produces
    # IDENTICAL cells (pinned in tests/test_plans.py).
    assign = S.ivf_assign(
        e, "vec_id", "embedding", n_cells=n_cells, dim=_DIM,
        collect_centroids=False,
    ).localCheckpoint(eager=False)
    # the graph indexes only NON-query vectors (the external-query kNN
    # search shape — otherwise every descent trivially lands on the
    # query's own node at distance 0)
    graph = assign.filter(F.col("vec_id") >= _N_QUERIES)
    a = graph.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("__sv"),
        "cell",
    )
    b = graph.select(
        F.col("vec_id").alias("nbr"),
        F.col("embedding").alias("__nv"),
        F.col("cell").alias("__c2"),
    )
    d2_edge = F.round(S.squared_l2_static("__sv", "__nv", _DIM), 6)
    w_src = Window.partitionBy("src").orderBy(F.asc("__d"), F.asc("nbr"))
    edges = (
        a.join(
            b, (F.col("cell") == F.col("__c2")) & (F.col("src") != F.col("nbr"))
        )
        .select("src", "nbr", d2_edge.alias("__d"))
        .withColumn("__rn", F.row_number().over(w_src))
        .filter(F.col("__rn") <= _NSW_K)
        .select("src", "nbr")
        .localCheckpoint(eager=False)  # consumed once per hop
    )
    nbr_vecs = graph.select(
        F.col("vec_id").alias("nbr"), F.col("embedding").alias("__nv")
    )
    entry = graph.groupBy("cell").agg(F.max("vec_id").alias("entry_id"))
    entry_vec = graph.select(
        F.col("vec_id").alias("entry_id"), F.col("embedding").alias("__ev")
    )
    cur = (
        assign.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv"), "cell")
        .join(entry, "cell")
        .join(entry_vec, "entry_id")
        .select(
            "query_id",
            "__qv",
            F.col("entry_id").alias("cur_id"),
            F.round(S.squared_l2_static("__qv", "__ev", _DIM), 6).alias("cur_d"),
            F.lit(0).alias("hops"),
        )
        .localCheckpoint(eager=False)
    )
    d2_hop = F.round(S.squared_l2_static("__qv", "__nv", _DIM), 6)
    for _ in range(_NSW_HOPS):
        best = (
            cur.join(edges, F.col("cur_id") == F.col("src"))
            .join(F.broadcast(nbr_vecs), "nbr")
            .select("query_id", F.col("nbr").alias("bn"), d2_hop.alias("bd"))
            .groupBy("query_id")
            .agg(F.min(F.struct(F.col("bd"), F.col("bn"))).alias("__b"))
            .select("query_id", F.col("__b.bd").alias("bd"), F.col("__b.bn").alias("bn"))
        )
        moved = F.expr("bd IS NOT NULL AND bd < cur_d")
        cur = (
            cur.join(best, "query_id", "left")
            .select(
                "query_id",
                "__qv",
                F.when(moved, F.col("bn")).otherwise(F.col("cur_id")).alias("cur_id"),
                F.when(moved, F.col("bd")).otherwise(F.col("cur_d")).alias("cur_d"),
                (F.col("hops") + F.when(moved, F.lit(1)).otherwise(F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=False)  # frontier = |queries| rows
        )
    return cur.select(
        "query_id",
        F.col("cur_id").cast("bigint").alias("final_id"),
        F.col("hops").cast("bigint").alias("hops"),
        F.expr("CAST(floor(cur_d * 1000000) AS BIGINT)").alias("dist_micro"),
    ).orderBy("query_id")
