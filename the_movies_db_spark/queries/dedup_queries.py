"""Oracle-checked deduplication queries over ``documents`` /
``embeddings`` (north-star: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup).

The DuckDB oracles replicate each pipeline end-to-end — md5-seeded
minhashes, banding, bucket joins, Jaccard verification, simhash bit
votes — so the fuzzy-dedup logic itself is value-hash-verified, not
just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table, spread
from the_movies_db_spark.operators import dedup as D
from the_movies_db_spark.queries import register

_TOKENS = "regexp_split_to_array(text, '\\s+')"
# distinct 3-word shingles per document (slice [i:i+2] is 1-based inclusive)
_SHINGLES = (
    f"list_distinct(list_transform(range(1, greatest(len({_TOKENS}) - 2, 1) + 1),"
    f" i -> array_to_string(({_TOKENS})[i:i+2], ' ')))"
)
_NUM_HASHES, _NUM_BANDS, _ROWS = 8, 4, 2
_MAX_DF = 25  # n-gram Jaccard: drop shingles in more docs than this
# minhash_i = min over shingles of md5('{i}:' || shingle)
_SIG = ", ".join(
    f"list_aggregate(list_transform(sh, s -> md5('{i}:' || s)), 'min') AS h{i}"
    for i in range(_NUM_HASHES)
)
_BANDS = ", ".join(
    f"md5(h{j * _ROWS} || '|' || h{j * _ROWS + 1}) AS b{j}" for j in range(_NUM_BANDS)
)


@register(
    "dedup_exact",
    """
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash,
           min(doc_id) AS canonical_id,
           count(*)    AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc=(
        "Exact dedup by normalized-content digest: hash-groupBy, min-id "
        "canonical representative (scale path: one shuffle on a 128-bit key)."
    ),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.content_hash_groups(d, "doc_id", "text")


@register(
    "dedup_minhash_lsh",
    f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    sig AS (SELECT doc_id, sh, {_SIG} FROM sh),
    banded AS (SELECT doc_id, sh, {_BANDS} FROM sig),
    pairs AS (
      {" UNION ".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sha, b.sh AS shb "
        f"FROM banded a JOIN banded b ON a.b{j} = b.b{j} AND a.doc_id < b.doc_id"
        for j in range(_NUM_BANDS)
      )}
    )
    SELECT id_a, id_b,
           round(len(list_intersect(sha, shb)) * 1.0 /
                 (len(sha) + len(shb) - len(list_intersect(sha, shb))), 6) AS jaccard
    FROM pairs
    WHERE round(len(list_intersect(sha, shb)) * 1.0 /
                (len(sha) + len(shb) - len(list_intersect(sha, shb))), 6) >= 0.2
    """,
    doc=(
        "MinHash-LSH near-dup detection: 8 md5-seeded minhashes over 3-word "
        "shingles → 4 bands of 2 → bucket-join candidates → exact-Jaccard "
        "verification at ≥0.2. Candidate generation is an equi-join, never O(n²)."
    ),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return D.minhash_lsh_dedup_pairs(
        d, "doc_id", "text", threshold=0.2,
        num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=3,
    )


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH sh0 AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents),
    hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > {_MAX_DF}),
    sh AS (SELECT doc_id, s FROM sh0 ANTI JOIN hot USING (s)),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(n_shared * 1.0 / (sa.n + sb.n - n_shared), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE round(n_shared * 1.0 / (sa.n + sb.n - n_shared), 6) >= 0.2
    """,
    doc=(
        "Exact n-gram Jaccard pairs via posting-list self-join (inverted "
        "index shape) with a document-frequency cap: shingles with "
        f"df > {_MAX_DF} are dropped before the join, bounding the "
        "per-shingle join cost at max_df² (hot shingles carry no "
        "near-dup signal)."
    ),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return D.ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=0.2, shingle_n=3, max_df=_MAX_DF
    )


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    sig AS (SELECT doc_id, sh, {_SIG} FROM sh),
    banded AS (SELECT doc_id, sh, {_BANDS} FROM sig),
    pairs AS (
      SELECT id_a, id_b FROM (
        {" UNION ".join(
          f"SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sha, b.sh AS shb "
          f"FROM banded a JOIN banded b ON a.b{j} = b.b{j} AND a.doc_id < b.doc_id"
          for j in range(_NUM_BANDS)
        )}
      ) p
      WHERE round(len(list_intersect(sha, shb)) * 1.0 /
                  (len(sha) + len(shb) - len(list_intersect(sha, shb))), 6) >= 0.2
    ),
    und AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT src, src FROM und
      UNION
      SELECT u.src, r.lbl FROM reach r JOIN und u ON u.dst = r.id
    )
    SELECT id AS doc_id, min(lbl) AS cluster_id
    FROM reach GROUP BY id
    """,
    doc=(
        "Near-dup clustering: MinHash-LSH pairs → connected components "
        "via iterative min-label propagation (the per-document canonical "
        "assignment; oracle = recursive-CTE reachability)."
    ),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_dedup_pairs(
        d, "doc_id", "text", threshold=0.2,
        num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=3,
    )
    return D.connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


_HASH32 = "CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)"
_BITVOTE = " + ".join(
    f"CASE WHEN list_aggregate(list_transform(toks, t -> "
    f"(({_HASH32}) // {2**b}) % 2 * 2 - 1), 'sum') > 0 THEN {2**b} ELSE 0 END"
    for b in range(32)
)


@register(
    "dedup_simhash",
    f"""
    WITH tok AS (SELECT doc_id, list_distinct({_TOKENS}) AS toks FROM documents)
    SELECT doc_id, CAST({_BITVOTE} AS BIGINT) AS simhash
    FROM tok
    """,
    doc=(
        "32-bit SimHash signatures: md5-derived token hashes, per-bit ±1 "
        "votes, sign → bit. Pure expression, verified bit-for-bit."
    ),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return D.with_simhash32(d, "text").select("doc_id", "simhash")


@register(
    "dedup_simhash_pairs",
    f"""
    WITH tok AS (SELECT doc_id, list_distinct({_TOKENS}) AS toks FROM documents),
    sigs AS (SELECT doc_id, CAST({_BITVOTE} AS BIGINT) AS sig FROM tok),
    b AS (SELECT doc_id, sig,
                 (sig // 1) % 256        AS blk0,
                 (sig // 256) % 256      AS blk1,
                 (sig // 65536) % 256    AS blk2,
                 (sig // 16777216) % 256 AS blk3
          FROM sigs)
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           bit_count(xor(a.sig, c.sig)) AS hamming
    FROM b a JOIN b c
      ON a.doc_id < c.doc_id
     AND (a.blk0 = c.blk0 OR a.blk1 = c.blk1 OR a.blk2 = c.blk2 OR a.blk3 = c.blk3)
    WHERE bit_count(xor(a.sig, c.sig)) <= 3
    """,
    doc=(
        "SimHash near-dup pairs (Hamming ≤ 3), multi-block blocked: 4 "
        "disjoint 8-bit blocks unioned, so every pair at distance ≤ 3 "
        "collides in ≥1 block (pigeonhole) — recall is provably exact — signature, "
        "blocking, and xor/bit_count distance all value-verified."
    ),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return D.simhash_pairs(d, "doc_id", "text", max_hamming=3, num_blocks=4)


# multi-band hyperplane LSH for embedding near-dup: band b uses the
# disjoint md5-derived plane family [b*planes_per_band, ...) — the oracle
# reproduces the exact signatures, so the approximate index itself is
# value-hash-verified.
_EMB_BANDS, _EMB_PLANES, _EMB_DIM = 4, 4, 64
_EMB_SIGN = (
    "CASE WHEN substr(md5({p} || ':' || i), 1, 1) IN "
    "('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END"
)


def _emb_band_sig(band: int) -> str:
    return " || ".join(
        "(CASE WHEN round(list_aggregate(list_transform(range(0, "
        + str(_EMB_DIM)
        + "), i -> embedding[i + 1]::DOUBLE * "
        + _EMB_SIGN.format(p=band * _EMB_PLANES + p)
        + "), 'sum'), 6) >= 0 THEN '1' ELSE '0' END)"
        for p in range(_EMB_PLANES)
    )


_EMB_SIG_COLS = ", ".join(
    f"({_emb_band_sig(b)}) AS s{b}" for b in range(_EMB_BANDS)
)
_EMB_COLLIDE = " OR ".join(f"a.s{b} = b.s{b}" for b in range(_EMB_BANDS))


@register(
    "dedup_embedding_cosine",
    f"""
    WITH sigs AS (
      SELECT vec_id, embedding, {_EMB_SIG_COLS} FROM embeddings
    ),
    cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             a.embedding AS ea, b.embedding AS eb
      FROM sigs a JOIN sigs b
        ON a.vec_id < b.vec_id AND ({_EMB_COLLIDE})
    )
    SELECT id_a, id_b,
           round(list_inner_product(ea::DOUBLE[], eb::DOUBLE[]) /
                 (sqrt(list_inner_product(ea::DOUBLE[], ea::DOUBLE[])) *
                  sqrt(list_inner_product(eb::DOUBLE[], eb::DOUBLE[]))),
                 4) AS cosine_sim
    FROM cand
    WHERE round(list_inner_product(ea::DOUBLE[], eb::DOUBLE[]) /
                (sqrt(list_inner_product(ea::DOUBLE[], ea::DOUBLE[])) *
                 sqrt(list_inner_product(eb::DOUBLE[], eb::DOUBLE[]))),
                4) >= 0.4
    """,
    doc=(
        "Embedding-cosine near-dup pairs via multi-band hyperplane LSH — "
        "banded equi-join candidate generation (O(Σ bucket²), no all-pairs "
        "join), exact cosine verification on collisions. The brute-force "
        "baseline lives in operators.dedup and is pytest-only."
    ),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    return D.embedding_near_dup_pairs_lsh(
        e,
        "vec_id",
        "embedding",
        threshold=0.4,
        num_bands=_EMB_BANDS,
        planes_per_band=_EMB_PLANES,
        dim=_EMB_DIM,
    )


@register(
    "dedup_incremental",
    f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    sig AS (SELECT doc_id, sh, {_SIG} FROM sh),
    banded AS (SELECT doc_id, sh, {_BANDS} FROM sig),
    pairs AS (
      {" UNION ".join(
        f"SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,"
        f" a.sh AS shn, b.sh AS shc "
        f"FROM banded a JOIN banded b ON a.b{j} = b.b{j}"
        f" AND a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7"
        for j in range(_NUM_BANDS)
      )}
    )
    SELECT new_id, corpus_id,
           round(len(list_intersect(shn, shc)) * 1.0 /
                 (len(shn) + len(shc) - len(list_intersect(shn, shc))), 6) AS jaccard
    FROM pairs
    WHERE round(len(list_intersect(shn, shc)) * 1.0 /
                (len(shn) + len(shc) - len(list_intersect(shn, shc))), 6) >= 0.2
    """,
    doc=(
        "Incremental near-dup admission: MinHash-LSH pairs between a "
        "new document batch (doc_id % 10 = 7, standing in for a daily "
        "ingest) and the existing corpus ONLY — the broadcast-batch "
        "shape that answers an O(batch) question without re-pairing "
        "the O(corpus) index. At scale the corpus side is the "
        "materialized banded-signature table scanned in place."
    ),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    batch = d.filter(F.col("doc_id") % 10 == 7)
    corpus = d.filter(F.col("doc_id") % 10 != 7)
    return D.minhash_lsh_incremental_pairs(
        batch, corpus, "doc_id", "text", threshold=0.2,
        num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=3,
    )


_CONT_PPM = 500000  # containment >= 0.5 of the smaller doc's shingles


@register(
    "dedup_containment",
    f"""
    WITH sh0 AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents),
    hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > {_MAX_DF}),
    sh AS (SELECT doc_id, s FROM sh0 ANTI JOIN hot USING (s)),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
           CAST(n_shared * 1000000 // least(sa.n, sb.n) AS BIGINT) AS containment_ppm
    FROM shared
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE n_shared * 1000000 // least(sa.n, sb.n) >= {_CONT_PPM}
    """,
    doc=(
        "Asymmetric n-gram containment pairs (|A∩B| / min(|A|,|B|)) — "
        "the doc-in-doc / quotation detector Jaccard misses when the "
        "union is dominated by the longer side. Same posting-list "
        "inverted-index skeleton and df-cap bound as dedup_ngram_jaccard; "
        "the measure is exact integer ppm so the hash is engine-stable."
    ),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return D.containment_pairs(
        d, "doc_id", "text", threshold_ppm=_CONT_PPM, shingle_n=3, max_df=_MAX_DF
    )


_XS_HASHES = 16
_XS_SIG = ", ".join(
    f"list_aggregate(list_transform(sh, s -> md5('{i}:' || s)), 'min') AS h{i}"
    for i in range(_XS_HASHES)
)
_XS_MINS = ", ".join(f"min(h{i}) AS h{i}" for i in range(_XS_HASHES))
_XS_AGREE = " + ".join(
    f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(_XS_HASHES)
)


@register(
    "dedup_source_overlap",
    f"""
    WITH sh AS (SELECT source, {{shingles}} AS sh FROM documents),
    sigs AS (SELECT source, {_XS_SIG} FROM sh),
    per AS (SELECT source, {_XS_MINS} FROM sigs GROUP BY source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             {_XS_AGREE} AS n_agree
      FROM per a JOIN per b ON a.source < b.source
    )
    SELECT source_a, source_b,
           CAST(n_agree AS BIGINT)                        AS n_agree,
           (CAST(n_agree AS BIGINT) * 1000000) // {_XS_HASHES} AS jaccard_est_ppm
    FROM pairs
    """.format(shingles=_SHINGLES),
    doc=(
        "Cross-source content-overlap matrix: per-source MinHash sketch "
        "(elementwise min of the per-doc 16-seed signatures == the "
        "MinHash of the source's shingle-set UNION — mergeability is "
        "the point), then every source pair's Jaccard estimate is the "
        "fraction of agreeing seeds, as exact integer ppm. The corpus-"
        "mixing diagnostic a training pipeline runs before weighting "
        "sources: near-duplicate sources show up as high-overlap pairs "
        "without any cross-source doc join. Scale shape: one scan + one "
        "16-row-per-source aggregate; the pair comparison is "
        "|sources|^2 over sketches, independent of corpus size."
    ),
)
def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    sig = D.minhash_signature("text", num_hashes=_XS_HASHES, shingle_n=3)
    pos = d.select("source", F.posexplode(sig).alias("pos", "h"))
    per_src = pos.groupBy("source", "pos").agg(F.min("h").alias("h"))
    a = per_src.select(
        F.col("source").alias("source_a"), "pos", F.col("h").alias("__ha")
    )
    b = per_src.select(
        F.col("source").alias("source_b"), "pos", F.col("h").alias("__hb")
    )
    agree = F.sum(
        F.when(F.col("__ha") == F.col("__hb"), 1).otherwise(0)
    ).cast("bigint")
    return (
        a.join(b, "pos")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(agree.alias("n_agree"))
        .select(
            "source_a",
            "source_b",
            "n_agree",
            F.expr(f"(n_agree * 1000000) div {_XS_HASHES}").alias(
                "jaccard_est_ppm"
            ),
        )
    )


@register(
    "dedup_recall_eval",
    f"""
    WITH sh0 AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh0 GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      FROM sh0 a JOIN sh0 b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT id_a, id_b FROM shared
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
      WHERE round(n_shared * 1.0 / (sa.n + sb.n - n_shared), 6) >= 0.2
    ),
    sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    sig AS (SELECT doc_id, {_SIG} FROM sh),
    banded AS (SELECT doc_id, {_BANDS} FROM sig),
    cand AS (
      {" UNION ".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b "
        f"FROM banded a JOIN banded b ON a.b{j} = b.b{j} AND a.doc_id < b.doc_id"
        for j in range(_NUM_BANDS)
      )}
    ),
    hit AS (SELECT id_a, id_b FROM cand INTERSECT SELECT id_a, id_b FROM truth)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(count(*) AS BIGINT) FROM cand)  AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT) FROM hit)   AS n_hit,
           (SELECT count(*) FROM hit) * 1000000
             // greatest((SELECT count(*) FROM cand), 1)  AS precision_ppm,
           (SELECT count(*) FROM hit) * 1000000
             // greatest((SELECT count(*) FROM truth), 1) AS recall_ppm
    """,
    doc=(
        "Dedup index-quality evaluation (the dedup-side sibling of "
        "sim_recall_eval): banded MinHash-LSH CANDIDATE pairs scored "
        "against exact uncapped n-gram-Jaccard ground truth at the "
        "same threshold — candidate precision bounds wasted exact-"
        "verification work, recall is the fraction of true near-dup "
        "pairs the bands surface (8 hashes / 4 bands here; more bands "
        "raise recall, fewer raise precision — the S-curve every LSH "
        "deployment tunes). All counts exact BIGINTs, ratios exact "
        "integer ppm, so the evaluation itself value-hashes."
    ),
)
def dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    # truth and cand each feed TWO branches (the intersect + their own
    # count) — checkpoint the pair lists so neither pipeline re-runs
    truth = D.ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=0.2, shingle_n=3, max_df=None
    ).select("id_a", "id_b").localCheckpoint(eager=False)
    cand = D.minhash_lsh_candidates(
        d, "doc_id", "text",
        num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=3,
    ).localCheckpoint(eager=False)
    hit = cand.intersect(truth)
    one = (
        truth.agg(F.count(F.lit(1)).alias("n_truth"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
    )
    return one.select(
        "n_truth",
        "n_candidates",
        "n_hit",
        F.expr("(n_hit * 1000000) div greatest(n_candidates, 1)").alias(
            "precision_ppm"
        ),
        F.expr("(n_hit * 1000000) div greatest(n_truth, 1)").alias(
            "recall_ppm"
        ),
    )


@register(
    "dedup_prefix_filter",
    f"""
    WITH sh AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS ns
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(ns * 1000000 // (sa.n + sb.n - ns) AS BIGINT) AS jaccard_ppm
    FROM shared
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE ns * 1000000 // (sa.n + sb.n - ns) >= 500000
    """,
    doc=(
        "PPJoin-style prefix filtering (operators.dedup."
        "prefix_filter_pairs): each document indexes only the "
        "|x|-ceil(t|x|)+1 globally-RAREST of its shingles, any "
        "J>=t pair provably collides in that prefix, and the exact "
        "intersection verifies candidates. The oracle is the PLAIN "
        "quadratic posting join, so driver equality pins that the "
        "pruning is LOSSLESS — unlike the df-cap variant "
        "(dedup_ngram_jaccard), which trades recall on hot shingles."
    ),
)
def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return D.prefix_filter_pairs(
        d, "doc_id", "text", threshold_ppm=500_000, shingle_n=3
    )


from the_movies_db_spark.queries import REGISTRY as _REG  # noqa: E402


@register(
    "dedup_threshold_histogram",
    f"""
    WITH pairs AS ({_REG["dedup_ngram_jaccard"].oracle})
    SELECT CAST(floor(jaccard * 10) AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT)            AS n_pairs,
           CAST(min(round(jaccard * 1000000)) AS BIGINT) AS min_ppm,
           CAST(max(round(jaccard * 1000000)) AS BIGINT) AS max_ppm
    FROM pairs
    GROUP BY 1
    """,
    doc=(
        "Similarity-threshold tuning histogram: candidate-pair counts "
        "per Jaccard decile (>= 0.2) — the distribution an engineer "
        "reads BEFORE fixing the dedup threshold (a cliff between "
        "deciles marks the near-dup/unrelated boundary; a smooth slope "
        "means the threshold trades real pairs). Nests the exact "
        "ngram-Jaccard oracle as a CTE, so the histogram is over "
        "exactly the production pair set."
    ),
)
def dedup_threshold_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-count distribution across similarity deciles.

    Scale notes (100 TB): same df-capped posting-list join as
    dedup_ngram_jaccard (its cost bounds apply unchanged); the
    histogram adds one bounded aggregate. Deciles come from the
    already-rounded 6-dp Jaccard, so bucket boundaries are
    engine-stable by construction."""
    d = spread(load_table(spark, sf_dir, "documents"))
    pairs = D.ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=0.2, shingle_n=3, max_df=_MAX_DF
    )
    return pairs.groupBy(
        F.floor(F.col("jaccard") * 10).cast("bigint").alias("decile")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min(F.round(F.col("jaccard") * 1000000)).cast("bigint").alias("min_ppm"),
        F.max(F.round(F.col("jaccard") * 1000000)).cast("bigint").alias("max_ppm"),
    )


@register(
    "pipeline_dedup_survivorship",
    f"""
    WITH clusters AS ({_REG["dedup_clusters"].oracle}),
    m AS (
      SELECT c.cluster_id, c.doc_id, d.n_chars
      FROM clusters c JOIN documents d USING (doc_id)
    ),
    canon AS (
      SELECT cluster_id, doc_id AS canonical_doc FROM (
        SELECT cluster_id, doc_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM m
      ) t WHERE rn = 1
    )
    SELECT m.cluster_id, canon.canonical_doc,
           CAST(count(*) AS BIGINT)     AS n_members,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped,
           CAST(max(m.n_chars) AS BIGINT) AS canonical_chars
    FROM m JOIN canon USING (cluster_id)
    GROUP BY m.cluster_id, canon.canonical_doc
    """,
    doc=(
        "Survivorship after near-dup clustering: each MinHash-LSH "
        "cluster keeps ONE canonical document (longest, tie lowest id) "
        "and maps the rest to it — the canonicalization step between "
        "dedup detection and corpus rewrite. The oracle NESTS the full "
        "dedup_clusters recursive-CTE oracle, so the evaluated "
        "clustering is exactly the shipped one."
    ),
)
def pipeline_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-doc election per near-dup cluster.

    Scale notes (100 TB): clusters come from the banded equi-join +
    min-label propagation (never all-pairs); the election is one
    window over cluster members; output is |clusters| rows."""
    d = spread(load_table(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_dedup_pairs(
        d, "doc_id", "text", threshold=0.2,
        num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=3,
    )
    clusters = D.connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    m = clusters.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    canon = (
        m.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("canonical_doc"))
    )
    return (
        m.join(canon, "cluster_id")
        .groupBy("cluster_id", "canonical_doc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_dropped"),
            F.max("n_chars").cast("bigint").alias("canonical_chars"),
        )
    )


_MATCHES = " + ".join(
    f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(_NUM_HASHES)
)
_HCOLS_A = ", ".join(f"a.h{i}" for i in range(_NUM_HASHES))


@register(
    "dedup_minhash_error_audit",
    f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    sig AS (SELECT doc_id, sh, {_SIG} FROM sh),
    banded AS (SELECT doc_id, sh,
                      {", ".join(f"h{i}" for i in range(_NUM_HASHES))},
                      {_BANDS} FROM sig),
    cand AS (
      SELECT DISTINCT id_a, id_b, matches, ni, na, nb FROM (
        {" UNION ALL ".join(
          f"SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
          f" {_MATCHES} AS matches,"
          f" len(list_intersect(a.sh, b.sh)) AS ni,"
          f" len(a.sh) AS na, len(b.sh) AS nb"
          f" FROM banded a JOIN banded b"
          f" ON a.b{j} = b.b{j} AND a.doc_id < b.doc_id"
          for j in range(_NUM_BANDS)
        )}
      ) u
    ), scored AS (
      SELECT CAST(matches * 1000 // {_NUM_HASHES} AS BIGINT) AS est_milli,
             CAST(ni * 1000 // (na + nb - ni) AS BIGINT) AS exact_milli
      FROM cand
    )
    SELECT CAST(abs(est_milli - exact_milli) // 100 AS BIGINT) AS err_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(abs(est_milli - exact_milli)) AS BIGINT) AS sum_err_milli
    FROM scored
    GROUP BY 1
    """,
    doc=(
        "Sketch-accuracy audit: for every LSH candidate pair, the "
        "MinHash-ESTIMATED Jaccard (matching components / 8, exact "
        "milli) against the TRUE Jaccard, bucketed by absolute error — "
        "the calibration table that says whether 8 hashes are enough "
        "before trusting the sketch at corpus scale. Signatures and "
        "shingles ride through the band join (no corpus join-backs)."
    ),
)
def dedup_minhash_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimate-vs-exact error distribution over candidates.

    Scale notes (100 TB): same banded equi-join as the dedup path —
    never all-pairs; the audit adds one integer comparison per
    signature component and a |buckets|-row aggregate."""
    d = spread(load_table(spark, sf_dir, "documents"))
    banded = D.banded_minhash_signatures(
        d, "doc_id", "text", _NUM_HASHES, _NUM_BANDS, 3, keep_sig=True
    )
    a = banded.select(
        F.col("__id").alias("id_a"),
        F.col("__sh").alias("__sha"),
        F.col("__sig").alias("__siga"),
        F.col("band_idx").alias("__bi"),
        F.col("band_hash").alias("__bh"),
    )
    b = banded.select(
        F.col("__id").alias("id_b"),
        F.col("__sh").alias("__shb"),
        F.col("__sig").alias("__sigb"),
        "band_idx",
        "band_hash",
    )
    cand = (
        a.join(
            b,
            (F.col("__bi") == F.col("band_idx"))
            & (F.col("__bh") == F.col("band_hash"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .dropDuplicates(["id_a", "id_b"])
        .select(
            F.expr(
                "aggregate(zip_with(__siga, __sigb,"
                " (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
                " 0, (acc, v) -> acc + v)"
            ).alias("matches"),
            F.size(F.array_intersect("__sha", "__shb")).alias("ni"),
            F.size("__sha").alias("na"),
            F.size("__shb").alias("nb"),
        )
    )
    scored = cand.select(
        F.expr(f"CAST(matches * 1000 div {_NUM_HASHES} AS BIGINT)").alias(
            "est_milli"
        ),
        F.expr("CAST(ni * 1000 div (na + nb - ni) AS BIGINT)").alias(
            "exact_milli"
        ),
    )
    return scored.groupBy(
        F.expr("CAST(abs(est_milli - exact_milli) div 100 AS BIGINT)").alias(
            "err_bucket"
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.expr("abs(est_milli - exact_milli)"))
        .cast("bigint")
        .alias("sum_err_milli"),
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup: rolling-hash boundaries
# ---------------------------------------------------------------------------

_CDC_PREFIX = 400   # chunk the first N chars (bounds per-row work)
_CDC_MOD = 16       # boundary when the 4-gram hash % 16 == 0

#: polynomial 4-gram hash at position i (31-base, pure integer — both
#: engines' ascii() agree on every character).
_CDC_HASH = (
    "(ascii(substr(t, i, 1)) * 29791 + ascii(substr(t, i + 1, 1)) * 961"
    " + ascii(substr(t, i + 2, 1)) * 31 + ascii(substr(t, i + 3, 1)))"
)


@register(
    "dedup_cdc_chunks",
    f"""
    WITH d AS (
      SELECT doc_id, substr(text, 1, {_CDC_PREFIX}) AS t
      FROM documents
    ),
    marks AS (
      SELECT doc_id, t, len(t) AS n,
             list_concat(
               [1],
               list_filter(range(2, greatest(len(t) - 2, 2)),
                 i -> {_CDC_HASH} % {_CDC_MOD} = 0)
             ) AS ss
      FROM d
    ),
    chunks AS (
      SELECT doc_id, md5(chunk) AS h, len(chunk) AS b
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ss) + 1),
                 k -> substr(t, ss[k],
                             coalesce(ss[k + 1], n + 1) - ss[k]))) AS chunk
        FROM marks
      ) u WHERE chunk <> ''
    ),
    per_chunk AS (
      SELECT h, CAST(count(*) AS BIGINT) AS n_occ,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(min(b) AS BIGINT) AS b
      FROM chunks GROUP BY h
    )
    SELECT CAST(sum(n_occ) AS BIGINT)          AS total_chunks,
           CAST(count(*) AS BIGINT)            AS unique_chunks,
           CAST(sum(n_occ * b) AS BIGINT)      AS total_bytes,
           CAST(sum(b) AS BIGINT)              AS unique_bytes,
           CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS chunks_in_multiple_docs,
           CAST((sum(n_occ * b) - sum(b)) * 1000000 // sum(n_occ * b)
                AS BIGINT) AS dedup_savings_ppm
    FROM per_chunk
    """,
    doc=(
        "Content-defined chunking dedup (the restic/borgbackup/rsync "
        "primitive): chunk boundaries fall where a rolling 4-gram "
        "polynomial hash hits 0 mod 16, so an insertion early in a "
        "document only reshapes chunks near the edit — unlike "
        "fixed-size blocks, where one shifted byte breaks every "
        "following block (multimodal_block_dedup is exactly that "
        "fixed-block sibling). Chunks are content-addressed by md5; "
        "the census reports storage-level dedup savings in exact ppm."
    ),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC chunk census + storage savings, engine-exact.

    Scale notes (100 TB): boundary detection and chunk slicing are
    per-row HOF projections (no shuffle); the content-addressed census
    is one hash aggregation keyed on the chunk digest — the shape of
    every dedup store's ingestion path. The 4-gram hash uses pure
    integer ascii arithmetic, so boundaries are engine-exact.
    spread() guards the single-file local layout: the per-character
    rolling-hash filter is per-row-heavy (the round-10 1-partition
    trap)."""
    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.expr(f"substring(text, 1, {_CDC_PREFIX})").alias("t")
    )
    marks = d.select(
        "doc_id",
        "t",
        F.length("t").alias("n"),
        F.expr(
            "concat(array(1), CASE WHEN length(t) >= 5 THEN"
            f" filter(sequence(2, length(t) - 3),"
            f" i -> {_CDC_HASH} % {_CDC_MOD} = 0)"
            " ELSE CAST(array() AS ARRAY<INT>) END)"
        ).alias("ss"),
    )
    chunks = (
        marks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ss)),"
                    " k -> substring(t, element_at(ss, k),"
                    " (CASE WHEN k = size(ss) THEN n + 1"
                    " ELSE element_at(ss, k + 1) END) - element_at(ss, k)))"
                )
            ).alias("chunk"),
        )
        .filter(F.col("chunk") != "")
        .select("doc_id", F.md5("chunk").alias("h"), F.length("chunk").alias("b"))
    )
    per_chunk = chunks.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.min("b").cast("bigint").alias("b"),
    )
    return per_chunk.agg(
        F.sum("n_occ").cast("bigint").alias("total_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("unique_chunks"),
        F.sum(F.expr("n_occ * b")).cast("bigint").alias("total_bytes"),
        F.sum("b").cast("bigint").alias("unique_bytes"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("chunks_in_multiple_docs"),
        F.expr(
            "CAST((sum(n_occ * b) - sum(b)) * 1000000"
            " div sum(n_occ * b) AS BIGINT)"
        ).alias("dedup_savings_ppm"),
    )


# ---------------------------------------------------------------------------
# MinHash sketch mergeability audit (the distributed-sketch foundation)
# ---------------------------------------------------------------------------

_SMA_SRC_SIG = ", ".join(
    f"min(h{i}) AS h{i}" for i in range(_NUM_HASHES)
)
_SMA_EQ_GLOBAL = " + ".join(
    f"CASE WHEN s.h{i} = g.h{i} THEN 1 ELSE 0 END" for i in range(_NUM_HASHES)
)
_SMA_MERGE_EQ = " AND ".join(
    f"m.h{i} = g.h{i}" for i in range(_NUM_HASHES)
)


@register(
    "dedup_sketch_merge_audit",
    f"""
    WITH docs AS (
      SELECT doc_id, source, {_SHINGLES} AS sh FROM documents
    ),
    per_doc AS MATERIALIZED (
      SELECT doc_id, source, {_SIG} FROM docs
    ),
    per_source AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs, {_SMA_SRC_SIG}
      FROM per_doc GROUP BY source
    ),
    global_direct AS (
      SELECT {_SMA_SRC_SIG} FROM per_doc
    ),
    merged AS (
      SELECT {_SMA_SRC_SIG} FROM per_source
    )
    SELECT s.source, s.n_docs,
           CAST(({_SMA_EQ_GLOBAL}) * 1000000 // {_NUM_HASHES} AS BIGINT)
             AS est_containment_ppm,
           CAST(CASE WHEN {_SMA_MERGE_EQ} THEN 1 ELSE 0 END AS BIGINT)
             AS merge_equals_direct
    FROM per_source s CROSS JOIN global_direct g CROSS JOIN merged m
    """,
    doc=(
        "MinHash sketch MERGEABILITY audit — the property every "
        "distributed sketch pipeline stands on: per-source sketches "
        "(elementwise min over each shard's docs) merged by another "
        "elementwise min must EQUAL the sketch computed directly over "
        "the whole corpus. merge_equals_direct pins it per row; the "
        "per-source slot-match rate against the global sketch is the "
        "standard containment estimate (which shard dominates the "
        "corpus's minima). Shard-map + tiny merge = one combining "
        "aggregate per level, which is why sketches scale where exact "
        "dedup state does not."
    ),
)
def dedup_sketch_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-merge == direct-global, pinned per source.

    Scale notes (100 TB): per-source sketches are ONE map-side
    combinable aggregate (k min columns); the merge is an aggregate
    over |sources| rows. The direct-global recompute here is the
    audit's witness — production merges shard sketches and never
    re-reads the corpus."""
    # spread: per-doc shingling + 8-hash minhash is per-row-heavy and
    # the single-file scan is one partition (round-10 rule)
    d = spread(load_table(spark, sf_dir, "documents"))
    # checkpoint the per-doc signatures: the 8 element extractions
    # would otherwise re-inline the whole HOF fold 8x (the round-2
    # staging lesson — projection collapse undoes a bare .select),
    # and the direct-global branch would recompute the corpus
    # signatures a second time. Production runs this audit on a
    # sample, where the materialization is equally bounded.
    per_doc = (
        d.select(
            "source", D.minhash_signature("text", _NUM_HASHES).alias("sig")
        )
        .localCheckpoint(eager=False)
        .select(
            "source",
            *[F.expr(f"sig[{i}]").alias(f"h{i}") for i in range(_NUM_HASHES)],
        )
    )
    mins = [F.min(f"h{i}").alias(f"h{i}") for i in range(_NUM_HASHES)]
    per_source = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"), *mins
    )
    global_direct = per_doc.agg(*mins).select(
        *[F.col(f"h{i}").alias(f"g{i}") for i in range(_NUM_HASHES)]
    )
    merged = per_source.agg(*mins).select(
        *[F.col(f"h{i}").alias(f"m{i}") for i in range(_NUM_HASHES)]
    )
    eq_global = " + ".join(
        f"CASE WHEN h{i} = g{i} THEN 1 ELSE 0 END"
        for i in range(_NUM_HASHES)
    )
    merge_eq = " AND ".join(f"m{i} = g{i}" for i in range(_NUM_HASHES))
    return (
        per_source.crossJoin(F.broadcast(global_direct))
        .crossJoin(F.broadcast(merged))
        .select(
            "source",
            "n_docs",
            F.expr(
                f"CAST(({eq_global}) * 1000000 div {_NUM_HASHES} AS BIGINT)"
            ).alias("est_containment_ppm"),
            F.expr(
                f"CAST(CASE WHEN {merge_eq} THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("merge_equals_direct"),
        )
    )


# ---------------------------------------------------------------------------
# LSH band cost model: predicted candidate volume per band vs distinct pairs
# ---------------------------------------------------------------------------


@register(
    "dedup_lsh_cost_model",
    f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    sig AS (SELECT doc_id, {_SIG} FROM sh),
    bands AS (SELECT doc_id, {_BANDS} FROM sig),
    long AS (
      SELECT doc_id, 0 AS band, b0 AS k FROM bands
      UNION ALL SELECT doc_id, 1, b1 FROM bands
      UNION ALL SELECT doc_id, 2, b2 FROM bands
      UNION ALL SELECT doc_id, 3, b3 FROM bands
    ),
    buckets AS (
      SELECT band, k, CAST(count(*) AS BIGINT) AS sz
      FROM long GROUP BY 1, 2
    ),
    per_band AS (
      SELECT CAST(band AS BIGINT) AS band_id,
             CAST(sum(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_multi_buckets,
             CAST(max(sz) AS BIGINT) AS max_bucket_size,
             CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS gen_pairs
      FROM buckets GROUP BY band
    ),
    uniq AS (
      SELECT CAST(count(*) AS BIGINT) AS u FROM (
        SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
        FROM long a JOIN long b
          ON a.band = b.band AND a.k = b.k AND a.doc_id < b.doc_id
      ) t
    )
    SELECT band_id, n_multi_buckets, max_bucket_size, gen_pairs,
           gen_pairs AS uniq_pairs, CAST(0 AS BIGINT) AS overhead_ppm
    FROM per_band
    UNION ALL
    SELECT CAST(-1 AS BIGINT),
           CAST(sum(n_multi_buckets) AS BIGINT),
           CAST(max(max_bucket_size) AS BIGINT),
           CAST(sum(gen_pairs) AS BIGINT),
           (SELECT u FROM uniq),
           CAST((sum(gen_pairs) - (SELECT u FROM uniq)) * 1000000
                // greatest(sum(gen_pairs), 1) AS BIGINT)
    FROM per_band
    """,
    doc=(
        "LSH band cost model: per band, the bucket-size profile and "
        "the candidate-pair volume it will generate (sum of C(sz,2) — "
        "the join's true output size), plus a TOTAL row (band_id -1) "
        "comparing generated vs DISTINCT candidate pairs: the overhead "
        "ppm is the fraction of verification work wasted on pairs "
        "found by multiple bands. This is the planning query you run "
        "BEFORE a corpus-scale dedup to size the band count and spot "
        "a degenerate hot bucket."
    ),
)
def dedup_lsh_cost_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band candidate volume + cross-band dedup overhead.

    Scale notes (100 TB): the banded signature table (4 rows/doc, ids
    and hashes only — the shingle payload is dropped BEFORE the lazy
    checkpoint) feeds all three consumers without re-tokenizing; the
    cost prediction itself is bucket-grain (sum C(sz,2) over bucket
    sizes — no pair join needed), and only the distinct-pair audit
    pays the banded equi-join, exactly the join being modeled."""
    d = spread(load_table(spark, sf_dir, "documents"))
    banded = (
        D.banded_minhash_signatures(
            d, "doc_id", "text",
            num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=3,
        )
        .select(
            F.col("__id").alias("doc_id"),
            F.col("band_idx").cast("bigint").alias("band"),
            F.col("band_hash").alias("k"),
        )
        .localCheckpoint(eager=False)
    )
    buckets = banded.groupBy("band", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    per_band = buckets.groupBy(F.col("band").alias("band_id")).agg(
        F.expr(
            "CAST(sum(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_multi_buckets"),
        F.max("sz").cast("bigint").alias("max_bucket_size"),
        F.expr("CAST(sum(sz * (sz - 1) div 2) AS BIGINT)").alias("gen_pairs"),
    )
    a = banded.select("band", "k", F.col("doc_id").alias("ia"))
    b = banded.select(
        F.col("band").alias("b2"), F.col("k").alias("k2"),
        F.col("doc_id").alias("ib"),
    )
    uniq = (
        a.join(
            b,
            (a.band == b.b2) & (a.k == b.k2) & (F.col("ia") < F.col("ib")),
        )
        .select("ia", "ib")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("u"))
    )
    band_rows = per_band.select(
        "band_id",
        "n_multi_buckets",
        "max_bucket_size",
        "gen_pairs",
        F.col("gen_pairs").alias("uniq_pairs"),
        F.lit(0).cast("bigint").alias("overhead_ppm"),
    )
    total = (
        per_band.agg(
            F.expr("CAST(sum(n_multi_buckets) AS BIGINT)").alias(
                "n_multi_buckets"
            ),
            F.expr("CAST(max(max_bucket_size) AS BIGINT)").alias(
                "max_bucket_size"
            ),
            F.expr("CAST(sum(gen_pairs) AS BIGINT)").alias("gen_pairs"),
        )
        .crossJoin(F.broadcast(uniq))
        .select(
            F.lit(-1).cast("bigint").alias("band_id"),
            "n_multi_buckets",
            "max_bucket_size",
            "gen_pairs",
            F.col("u").alias("uniq_pairs"),
            F.expr(
                "CAST((gen_pairs - u) * 1000000"
                " div greatest(gen_pairs, 1L) AS BIGINT)"
            ).alias("overhead_ppm"),
        )
    )
    return band_rows.unionByName(total)


# ---------------------------------------------------------------------------
# MinHash banding S-curve calibration (theory vs empirical, integer)
# ---------------------------------------------------------------------------

_CAL_BANDS_HIT = " OR ".join(
    f"(a.h{j * _ROWS} = b.h{j * _ROWS} AND a.h{j * _ROWS + 1} = b.h{j * _ROWS + 1})"
    for j in range(_NUM_BANDS)
)
_CAL_K = " + ".join(
    f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(_NUM_HASHES)
)


@register(
    "dedup_minhash_calibration",
    f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    sig AS MATERIALIZED (SELECT doc_id, {_SIG} FROM sh),
    pool AS (
      SELECT CAST({_CAL_K} AS BIGINT) AS n_matching,
             CASE WHEN {_CAL_BANDS_HIT} THEN 1 ELSE 0 END AS band_hit
      FROM sig a JOIN sig b ON a.h0 = b.h0 AND a.doc_id < b.doc_id
    )
    SELECT n_matching,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(band_hit) AS BIGINT) AS n_band_hits,
           CAST(sum(band_hit) * 1000000 // count(*) AS BIGINT)
             AS empirical_hit_ppm,
           CAST(1000000 - (64 - n_matching * n_matching)
                * (64 - n_matching * n_matching)
                * (64 - n_matching * n_matching)
                * (64 - n_matching * n_matching) * 1000000 // 16777216
                AS BIGINT) AS predicted_hit_ppm
    FROM pool GROUP BY 1
    ORDER BY n_matching
    """,
    doc=(
        "LSH banding S-curve calibration: over the pool of pairs "
        "colliding on minhash h0 (a one-row LSH — the cheapest "
        "deterministic pair sampler the signature table affords), "
        "compare the EMPIRICAL >=1-band collision rate per "
        "signature-agreement level k/8 against the textbook "
        "prediction 1-(1-s^2)^4 at s=k/8 — evaluated as the exact "
        "integer 1e6 - (64-k^2)^4*1e6/64^4, no pow(), no doubles. "
        "Divergence between the two columns is the design signal "
        "(the h0-conditioning shows up at low k exactly where banding "
        "theory's independence assumption bends)."
    ),
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical vs predicted band-collision rate by agreement level.

    Scale notes (100 TB): the pool join is bucketed on h0 — the same
    equi-join shape as the production LSH candidate join, never
    all-pairs; agreement counting and the band test are pure
    projections over the joined signature pairs, and the output is
    <= 9 rows. The signature table is computed once (staged select,
    materialized on both engines)."""
    from the_movies_db_spark.operators.dedup import minhash_signature

    # spread: per-doc shingling + 8-hash minhash on a one-partition
    # single-file scan otherwise runs serial (round-10 rule)
    d = spread(load_table(spark, sf_dir, "documents"))
    sig = d.select(
        "doc_id", minhash_signature("text", _NUM_HASHES).alias("sig")
    ).localCheckpoint(eager=False)
    a = sig.select(F.col("doc_id").alias("ida"), F.col("sig").alias("sa"))
    b = sig.select(F.col("doc_id").alias("idb"), F.col("sig").alias("sb"))
    band_hit = " OR ".join(
        f"(element_at(sa, {j * _ROWS + 1}) = element_at(sb, {j * _ROWS + 1})"
        f" AND element_at(sa, {j * _ROWS + 2}) = element_at(sb, {j * _ROWS + 2}))"
        for j in range(_NUM_BANDS)
    )
    pool = (
        a.join(
            b,
            (F.expr("element_at(sa, 1) = element_at(sb, 1)"))
            & (F.col("ida") < F.col("idb")),
        )
        .select(
            F.expr(
                "CAST(aggregate(zip_with(sa, sb,"
                " (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
                " 0, (acc, v) -> acc + v) AS BIGINT)"
            ).alias("n_matching"),
            F.expr(
                f"CASE WHEN {band_hit} THEN 1 ELSE 0 END"
            ).alias("band_hit"),
        )
    )
    return (
        pool.groupBy("n_matching")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("band_hit").cast("bigint").alias("n_band_hits"),
            F.expr(
                "CAST(sum(band_hit) * 1000000 div count(*) AS BIGINT)"
            ).alias("empirical_hit_ppm"),
            F.expr(
                "CAST(1000000 - (64 - n_matching * n_matching)"
                " * (64 - n_matching * n_matching)"
                " * (64 - n_matching * n_matching)"
                " * (64 - n_matching * n_matching) * 1000000 div 16777216"
                " AS BIGINT)"
            ).alias("predicted_hit_ppm"),
        )
        .orderBy("n_matching")
    )


# ---------------------------------------------------------------------------
# Near-dup cluster label purity (does clustering respect provenance?)
# ---------------------------------------------------------------------------


@register(
    "pipeline_cluster_purity",
    f"""
    WITH clusters AS ({_REG["dedup_clusters"].oracle}),
    m AS (
      SELECT c.cluster_id, c.doc_id, d.source
      FROM clusters c JOIN documents d USING (doc_id)
    ),
    per_src AS (
      SELECT cluster_id, source, CAST(count(*) AS BIGINT) AS cnt
      FROM m GROUP BY 1, 2
    ),
    best AS (
      SELECT cluster_id, source AS majority_source, cnt FROM (
        SELECT cluster_id, source, cnt,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY cnt DESC, source) AS rn
        FROM per_src
      ) t WHERE rn = 1
    ),
    sizes AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM m GROUP BY 1
    )
    SELECT s.cluster_id, s.n_members, s.n_sources, b.majority_source,
           CAST(b.cnt * 1000000 // s.n_members AS BIGINT) AS purity_ppm
    FROM sizes s JOIN best b USING (cluster_id)
    ORDER BY s.n_members DESC, s.cluster_id
    """,
    doc=(
        "Provenance purity of the near-dup clusters: per MinHash-LSH "
        "cluster, how concentrated its members are in one source — "
        "high purity means the dedup mostly collapses within-source "
        "re-crawls (cheap to drop); low purity flags cross-source "
        "contamination (syndicated/mirrored content), which changes "
        "how survivorship should attribute the canonical doc. Nests "
        "the dedup_clusters oracle so the evaluated clustering is "
        "exactly the shipped one (the survivorship precedent)."
    ),
)
def pipeline_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-source share per near-dup cluster.

    Scale notes (100 TB): clusters come from the banded equi-join +
    min-label propagation (never all-pairs); membership joins the
    |clustered-docs| table to sources by id; the majority election is
    a rank window over the (cluster x source) aggregate — bounded by
    cluster fan-out, never corpus-scale."""
    d = spread(load_table(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_dedup_pairs(
        d, "doc_id", "text", threshold=0.2,
        num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=3,
    )
    clusters = D.connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    m = clusters.join(
        d.select("doc_id", "source"), "doc_id"
    ).localCheckpoint(eager=False)  # membership feeds 2 aggregates
    per_src = m.groupBy("cluster_id", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wb = Window.partitionBy("cluster_id").orderBy(
        F.desc("cnt"), F.asc("source")
    )
    best = (
        per_src.withColumn("rn", F.row_number().over(wb))
        .filter("rn = 1")
        .select(
            "cluster_id", F.col("source").alias("majority_source"), "cnt"
        )
    )
    sizes = m.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    return (
        sizes.join(best, "cluster_id")
        .select(
            "cluster_id", "n_members", "n_sources", "majority_source",
            F.expr("CAST(cnt * 1000000 div n_members AS BIGINT)").alias(
                "purity_ppm"
            ),
        )
        .orderBy(F.desc("n_members"), F.asc("cluster_id"))
    )


# ---------------------------------------------------------------------------
# Dedup threshold sensitivity (what each threshold choice costs)
# ---------------------------------------------------------------------------

_THRESH_PPMS = tuple(range(200_000, 1_000_001, 100_000))


@register(
    "pipeline_dedup_threshold_sensitivity",
    f"""
    WITH pairs AS ({_REG["dedup_ngram_jaccard"].oracle}),
    p AS (
      SELECT id_a, id_b, CAST(round(jaccard * 1000000) AS BIGINT) AS ppm
      FROM pairs
    ),
    spine AS (SELECT unnest([{", ".join(str(t) for t in _THRESH_PPMS)}])
              AS t_ppm),
    hit AS (
      SELECT s.t_ppm, p.id_a, p.id_b
      FROM p JOIN spine s ON p.ppm >= s.t_ppm
    ),
    np AS (
      SELECT t_ppm, CAST(count(*) AS BIGINT) AS n_pairs
      FROM hit GROUP BY 1
    ),
    docs AS (
      SELECT t_ppm, CAST(count(DISTINCT d) AS BIGINT) AS n_docs_affected
      FROM (
        SELECT t_ppm, id_a AS d FROM hit
        UNION ALL SELECT t_ppm, id_b FROM hit
      ) u GROUP BY 1
    )
    SELECT CAST(np.t_ppm AS BIGINT) AS t_ppm, np.n_pairs,
           docs.n_docs_affected
    FROM np JOIN docs USING (t_ppm)
    ORDER BY t_ppm
    """,
    doc=(
        "Threshold sensitivity table for near-dup pruning: for each "
        "candidate Jaccard threshold, the surviving pair count and "
        "the number of documents any pair touches — the marginal-cost "
        "curve an engineer reads next to the decile histogram before "
        "fixing the production threshold. One pair computation serves "
        "every threshold (a broadcast spine join, never a re-scan per "
        "threshold)."
    ),
)
def pipeline_dedup_threshold_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairs + affected docs per candidate dedup threshold.

    Scale notes (100 TB): the df-capped posting join runs ONCE; the
    threshold spine multiplies only the resulting pair list (bounded
    by near-dup pairs, broadcast non-equi join against 9 rows); both
    outputs are aggregates over that widened pair list."""
    d = spread(load_table(spark, sf_dir, "documents"))
    pairs = D.ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=0.2, shingle_n=3, max_df=_MAX_DF
    ).select(
        "id_a", "id_b",
        F.expr("CAST(round(jaccard * 1000000) AS BIGINT)").alias("ppm"),
    ).localCheckpoint(eager=False)
    spine = spark.range(1).selectExpr(
        f"explode(array({', '.join(str(t) + 'L' for t in _THRESH_PPMS)}))"
        " AS t_ppm"
    )
    hit = pairs.join(
        F.broadcast(spine), pairs.ppm >= F.col("t_ppm")
    ).localCheckpoint(eager=False)
    n_pairs = hit.groupBy("t_ppm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    docs = (
        hit.selectExpr("t_ppm", "stack(2, id_a, id_b) AS (d)")
        .groupBy("t_ppm")
        .agg(F.countDistinct("d").cast("bigint").alias("n_docs_affected"))
    )
    return (
        n_pairs.join(docs, "t_ppm")
        .select(
            F.col("t_ppm").cast("bigint"), "n_pairs", "n_docs_affected"
        )
        .orderBy("t_ppm")
    )


# ---------------------------------------------------------------------------
# Exact substring-level dedup (Lee et al. 2022 class, suffix-gram form)
# ---------------------------------------------------------------------------

_SS_L, _SS_S = 32, 1  # gram length / stride (stride 1 = alignment-free)


@register(
    "dedup_substring_exact",
    f"""
    WITH d AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents
    ),
    g AS (
      SELECT doc_id, CAST(i * {_SS_S} AS BIGINT) AS pos,
             substr(text, CAST(i * {_SS_S} + 1 AS INT), {_SS_L}) AS gram
      FROM d, unnest(range(0, (n - {_SS_L}) // {_SS_S} + 1)) AS t(i)
      WHERE n >= {_SS_L}
    ),
    occ AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) >= 2),
    dp AS (SELECT g.doc_id, g.pos FROM g JOIN occ USING (gram)),
    isl AS (
      SELECT doc_id, pos,
             pos - {_SS_S} * row_number()
                   OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM dp
    ),
    runs AS (
      SELECT doc_id, grp,
             CAST((count(*) - 1) * {_SS_S} + {_SS_L} AS BIGINT) AS span
      FROM isl GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
             CAST(max(span) AS BIGINT) AS max_run_chars,
             CAST(sum(span) AS BIGINT) AS dup_chars_ub
      FROM runs GROUP BY 1
    ),
    gtot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs_with_dups,
             CAST(sum(n_runs) AS BIGINT) AS total_dup_runs
      FROM per_doc
    )
    SELECT doc_id, n_runs, max_run_chars, dup_chars_ub, rank,
           n_docs_with_dups, total_dup_runs
    FROM (SELECT *, CAST(row_number() OVER (
            ORDER BY dup_chars_ub DESC, doc_id) AS BIGINT) AS rank
          FROM per_doc) p
    CROSS JOIN gtot
    WHERE rank <= 20
    ORDER BY rank
    """,
    doc=(
        "Exact substring-level dedup (the Lee-et-al-2022 modality): "
        "fixed-length character grams at EVERY position (stride 1 — "
        "alignment-free, the property stride sampling lacks), grams occurring "
        ">=2 times anywhere in the corpus are 'duplicated', and adjacent "
        "duplicated grams within a document merge into maximal duplicated "
        "RUNS (sorted-run detection). Per-doc run stats + corpus totals "
        "— the signal that finds boilerplate/licence blocks repeated "
        "verbatim across documents, which shingle-Jaccard (whole-doc "
        "grain) cannot localise."
    ),
)
def dedup_substring_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus exact duplicated substring runs via stride grams.

    Scale notes (100 TB): gram extraction is a per-row projection
    (~len/stride grams per doc); the only corpus-scale shuffle is the
    groupBy(gram) occurrence count and the gram-key equi-join back —
    both key-partitioned, never all-pairs. Run merging is a per-doc
    window (doc-partitioned). Top-20 uses orderBy+limit
    (TakeOrderedAndProject), never a global row_number sort."""
    L, S = _SS_L, _SS_S
    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", F.length("text").cast("bigint").alias("n")
    )
    staged = d.filter(F.col("n") >= L).select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, CAST((n - {L}) div {S} AS INT)),"
            f" i -> struct(CAST(i * {S} AS BIGINT) AS pos,"
            f" substring(text, i * {S} + 1, {L}) AS gram))"
        ).alias("pg"),
    )
    # g feeds two consumers (the occurrence count and the probe join):
    # checkpoint so gram extraction runs once, not per branch
    g = staged.select("doc_id", F.explode("pg").alias("p")).select(
        "doc_id", F.col("p.pos").alias("pos"), F.col("p.gram").alias("gram")
    ).localCheckpoint(eager=False)
    occ = (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("gram")
    )
    # occ GROWS WITH THE CORPUS (shared grams across near-dup docs):
    # Catalyst's post-aggregate size estimate auto-broadcast it at the
    # x64 probe scale and blew spark.driver.maxResultSize — pin a
    # shuffle join so the build side never ships through the driver.
    dp = g.join(occ.hint("shuffle_hash"), "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dp.withColumn("grp", F.col("pos") - S * F.row_number().over(w))
    runs = isl.groupBy("doc_id", "grp").agg(
        ((F.count(F.lit(1)) - 1) * S + L).cast("bigint").alias("span")
    )
    per_doc = runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.max("span").cast("bigint").alias("max_run_chars"),
        F.sum("span").cast("bigint").alias("dup_chars_ub"),
    ).localCheckpoint(eager=False)
    glob = per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_with_dups"),
        F.sum("n_runs").cast("bigint").alias("total_dup_runs"),
    )
    top = per_doc.orderBy(F.desc("dup_chars_ub"), F.asc("doc_id")).limit(20)
    wr = Window.orderBy(F.desc("dup_chars_ub"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .crossJoin(F.broadcast(glob))
        .select("doc_id", "n_runs", "max_run_chars", "dup_chars_ub",
                "rank", "n_docs_with_dups", "total_dup_runs")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Edit-distance verification of blocked candidate pairs
# ---------------------------------------------------------------------------

_EDV_TOP = 30
_EDV_CAP = 64  # max h0-bucket size: near-dup cliques make pairs quadratic


@register(
    "dedup_edit_distance_verify",
    f"""
    WITH sh AS (
      SELECT doc_id, text, {_SHINGLES} AS sh FROM documents
    ),
    sig AS (
      SELECT doc_id, text,
             list_aggregate(list_transform(sh, s -> md5('0:' || s)), 'min')
               AS h0
      FROM sh WHERE len(sh) > 0
    ),
    keep AS (
      SELECT h0 FROM sig GROUP BY 1 HAVING count(*) <= {_EDV_CAP}
    ),
    capped AS (SELECT s.* FROM sig s JOIN keep USING (h0)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
             CAST(length(a.text) AS BIGINT) AS len_a,
             CAST(length(b.text) AS BIGINT) AS len_b
      FROM capped a JOIN capped b ON a.h0 = b.h0 AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT *,
             CAST(lev * 1000000 // greatest(len_a, len_b) AS BIGINT)
               AS dist_ppm
      FROM pairs
    )
    SELECT doc_a, doc_b, lev, len_a, len_b, dist_ppm,
           CAST(CASE WHEN dist_ppm <= 400000 THEN 1 ELSE 0 END AS BIGINT)
             AS verified
    FROM scored
    ORDER BY dist_ppm, doc_a, doc_b
    LIMIT {_EDV_TOP}
    """,
    doc=(
        "Candidate-verification stage of a dedup cascade: block on the "
        "first MinHash component (h0 equality — the cheapest LSH bucket), "
        "then verify each candidate pair with EXACT Levenshtein distance "
        "and a length-normalised ppm score. The standard two-phase "
        "near-dup pipeline: cheap recall-oriented blocking, expensive "
        "precision-oriented verification on the candidate set only."
    ),
)
def dedup_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein verification of MinHash-h0-blocked candidates.

    Scale notes (100 TB): the quadratic edit-distance kernel runs ONLY
    on bucket-join candidates (equi-join on h0, never all-pairs); the
    join is key-partitioned and the per-pair kernel is JVM-side
    `levenshtein`. Top-k via orderBy+limit."""
    d = spread(load_table(spark, sf_dir, "documents"))
    # checkpoint: the aliased self-join below would otherwise re-run
    # the minhash HOF lineage once PER BRANCH (ReuseExchange never
    # fires across branches — the round-4 basket lesson); the sig
    # table is doc-grain and tiny
    sig = d.select(
        "doc_id", "text",
        D.minhash_signature(F.col("text"), num_hashes=1, shingle_n=3)[0]
        .alias("h0"),
    ).localCheckpoint(eager=False)
    # h0-bucket size cap (r12 x64 probe: near-dup CLIQUES share h0, so
    # uncapped buckets make the levenshtein pair volume quadratic in
    # clique size — 105x runtime at 64x corpus; same class as the r10
    # aHash cap). Mirrored exactly in the oracle's keep/capped CTEs.
    keep = (
        sig.groupBy("h0")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= _EDV_CAP)
        .select("h0")
    )
    # No join hint: keep is built THROUGH a shuffle, so AQE sizes the
    # join from real stats — broadcast while it fits, shuffle when the
    # bucket table outgrows the threshold (A/B: a forced shuffle_hash
    # hint cascaded into the pair join and tripled 1x runtime).
    # Checkpoint: capped feeds BOTH pair-join sides.
    capped = sig.join(keep, "h0").localCheckpoint(eager=False)
    a = capped.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"), "h0"
    )
    b = capped.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"), "h0"
    )
    pairs = a.join(b, "h0").filter(F.col("doc_a") < F.col("doc_b"))
    scored = pairs.select(
        "doc_a", "doc_b",
        F.levenshtein("ta", "tb").cast("bigint").alias("lev"),
        F.length("ta").cast("bigint").alias("len_a"),
        F.length("tb").cast("bigint").alias("len_b"),
    ).withColumn(
        "dist_ppm",
        F.expr("lev * 1000000 div greatest(len_a, len_b)").cast("bigint"),
    )
    return (
        scored.withColumn(
            "verified",
            F.expr("CASE WHEN dist_ppm <= 400000 THEN 1 ELSE 0 END")
            .cast("bigint"),
        )
        .orderBy("dist_ppm", "doc_a", "doc_b")
        .limit(_EDV_TOP)
    )


# ---------------------------------------------------------------------------
# Soft dedup: reweight instead of drop (SemDeDup-style 1/cluster-size)
# ---------------------------------------------------------------------------


@register(
    "pipeline_dedup_reweight",
    f"""
    WITH RECURSIVE clusters AS ({{CLUSTERS}}),
    sizes AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS k
      FROM clusters GROUP BY 1
    ),
    perdoc AS (
      SELECT d.doc_id, coalesce(s.k, 1) AS k
      FROM documents d
      LEFT JOIN clusters c ON d.doc_id = c.doc_id
      LEFT JOIN sizes s ON c.cluster_id = s.cluster_id
    )
    SELECT CAST(k AS BIGINT) AS cluster_size,
           CAST(count(DISTINCT CASE WHEN k > 1 THEN NULL ELSE doc_id END)
                AS BIGINT) * 0
             + CAST(count(*) / k AS BIGINT) AS n_clusters,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(1000000 // k AS BIGINT) AS weight_per_doc_micro,
           CAST(count(*) * (1000000 // k) AS BIGINT)
             AS effective_docs_micro
    FROM perdoc
    GROUP BY k
    ORDER BY cluster_size
    """.replace("{CLUSTERS}", _REG["dedup_clusters"].oracle).replace(
        "WITH RECURSIVE clusters AS", "WITH clusters AS", 1),
    doc=(
        "Soft dedup by REWEIGHTING instead of dropping (the "
        "SemDeDup/data-mixing recipe): every document keeps weight "
        "1e6 / near-dup-cluster-size, so each duplicate FAMILY "
        "contributes one effective document to the training mix while "
        "no text is discarded. Per-cluster-size census with the "
        "effective-corpus-size contribution of each bucket; clusters "
        "come from the same MinHash-LSH + connected-components "
        "machinery as dedup_clusters (never all-pairs)."
    ),
)
def pipeline_dedup_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1/cluster-size document weights, cluster-size census.

    Scale notes (100 TB): pairs via banded equi-join, components via
    min-label propagation over the pair list, sizes via one
    cluster-grain aggregate; the weight is a projection. The census
    output is bounded by the largest cluster size."""
    d = spread(load_table(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_dedup_pairs(
        d, "doc_id", "text", threshold=0.2,
        num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=3,
    )
    clusters = D.connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    ).localCheckpoint(eager=False)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    perdoc = (
        d.select("doc_id")
        .join(clusters, "doc_id", "left")
        .join(sizes, "cluster_id", "left")
        .select("doc_id", F.coalesce("k", F.lit(1)).alias("k"))
    )
    return (
        perdoc.groupBy(F.col("k").cast("bigint").alias("cluster_size"))
        .agg(
            F.expr("CAST(count(*) / cluster_size AS BIGINT)")
            .alias("n_clusters"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("CAST(1000000 div cluster_size AS BIGINT)")
            .alias("weight_per_doc_micro"),
            F.expr(
                "CAST(count(*) * (1000000 div cluster_size) AS BIGINT)"
            ).alias("effective_docs_micro"),
        )
        .orderBy("cluster_size")
    )
