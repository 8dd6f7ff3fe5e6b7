"""Oracle-checked deduplication queries over ``documents`` /
``embeddings`` (north-star: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup).

The DuckDB oracles replicate each pipeline end-to-end — md5-seeded
minhashes, banding, bucket joins, Jaccard verification, simhash bit
votes — so the fuzzy-dedup logic itself is value-hash-verified, not
just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    WITH sh AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents),
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
        "index shape): explode shingles → equi-join → shared counts."
    ),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return D.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.2, shingle_n=3)


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
    b AS (SELECT doc_id, sig, sig // 65536 AS block FROM sigs)
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           bit_count(xor(a.sig, c.sig)) AS hamming
    FROM b a JOIN b c ON a.block = c.block AND a.doc_id < c.doc_id
    WHERE bit_count(xor(a.sig, c.sig)) <= 6
    """,
    doc=(
        "SimHash near-dup pairs (Hamming ≤ 6) blocked on the high 16 "
        "bits — signature, blocking, and xor/bit_count distance all "
        "value-verified."
    ),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return D.simhash_pairs(d, "doc_id", "text", max_hamming=6)


@register(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                 (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                  sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 4) AS cosine_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                 sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                4) >= 0.4
    """,
    doc=(
        "Embedding-cosine near-dup pairs (brute-force verification "
        "baseline; the scale path buckets by hyperplane signature first)."
    ),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load_table(spark, sf_dir, "embeddings"))
    return D.embedding_near_dup_pairs(e, "vec_id", "embedding", threshold=0.4)
