"""Inverted-index text search over the ``documents`` table.

``search_bm25_topk`` is the keyword-retrieval primitive a corpus
curation / RAG-prep stack needs next to ANN: top-k documents per query
under BM25 (k1=1.2, b=0.75, Lucene's always-positive idf).

Exactness strategy — the whole score is integer arithmetic so the
value-hash is engine-stable:

- With ``avgdl = T/N`` (T = total tokens, N = docs), the BM25 term
  contribution ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
  is the rational ``idf * 44*tf*T / (20*tf*T + 6*T + 18*dl*N)``
  (multiply num/den by ``20*T``; k1=6/5, b=3/4).
- ``idf`` is the only transcendental; it is floored to integer millis
  once per *distinct query term* (~10 values), so a 1-ulp ``ln``
  divergence could only flip a handful of boundary cases, not a
  per-row float — and every downstream op is exact BIGINT.
- Per-term contributions use integer floor division, summed as BIGINT;
  ties broken by doc_id. Deterministic across Spark and DuckDB.

Scale notes (100 TB): the query vocabulary is broadcast and filters
the exploded token stream *before* the tf aggregation, so shuffle
volume is O(docs containing a query term), not O(total tokens); df
and corpus stats are tiny aggregates broadcast back. Top-k per query
is a rank over the scored set (bounded by matching docs). At extreme
corpus sizes the ``tf*T`` products approach int64 — downscale T to
kilotokens there (the rational form is scale-invariant).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table
from the_movies_db_spark.queries import register

#: (query_id, term) — the benchmark query set, embedded identically in
#: the Spark plan and the DuckDB oracle.
QUERIES: tuple[tuple[int, str], ...] = (
    (1, "hash"),
    (1, "join"),
    (1, "spark"),
    (2, "window"),
    (2, "stream"),
    (2, "batch"),
    (3, "merge"),
    (3, "sort"),
    (3, "key"),
)

TOP_K = 5

_IDF_MILLI = (
    "CAST(floor(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
    " / (CAST(df AS DOUBLE) + 0.5)) * 1000) AS BIGINT)"
)

_SCORE_TERM = (
    "(idf_milli * 44 * tf * total_len)"
    " {div} (20 * tf * total_len + 6 * total_len + 18 * dl * n_docs)"
)

_QUERY_VALUES = ", ".join(f"({q}, '{t}')" for q, t in QUERIES)

_ORACLE_TEMPLATE = """
WITH q(query_id, term) AS (VALUES {_QUERY_VALUES}),
docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
dld AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM docs),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT)  AS total_len
  FROM dld
),
tokens AS (SELECT doc_id, dl, unnest(toks) AS term FROM dld),
tf AS (
  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM tokens
  WHERE term IN (SELECT DISTINCT term FROM q)
  GROUP BY 1, 2, 3
),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT t.doc_id, t.term,
         {_IDF_MILLI} AS idf_milli,
         t.tf, t.dl, s.n_docs, s.total_len
  FROM tf t JOIN dfs d USING (term) CROSS JOIN stats s
),
contrib AS (
  SELECT doc_id, term,
         {_SCORE_TERM} AS score_term
  FROM scored
),
per_query AS (
  SELECT q.query_id, c.doc_id,
         CAST(sum(c.score_term) AS BIGINT) AS score_milli
  FROM contrib c JOIN q ON c.term = q.term
  GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score_milli
FROM (
  SELECT query_id, doc_id, score_milli,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank
  FROM per_query
)
WHERE rank <= {top_k}
"""


def _bm25_oracle(top_k: int) -> str:
    """The BM25 oracle SQL, parameterized by the per-query cutoff so
    composed queries (hybrid fusion) can reuse it at a deeper pool."""
    return _ORACLE_TEMPLATE.format(
        _QUERY_VALUES=_QUERY_VALUES,
        _IDF_MILLI=_IDF_MILLI,
        _SCORE_TERM=_SCORE_TERM.format(div="//"),
        top_k=top_k,
    )


_ORACLE = _bm25_oracle(TOP_K)


@register(
    "search_bm25_topk",
    _ORACLE,
    doc=(
        "BM25 top-k keyword search via an on-the-fly inverted index: "
        "broadcast query vocabulary prunes the exploded token stream, "
        "tf/df/corpus stats are one aggregation pass each, and the whole "
        "score is exact BIGINT arithmetic (idf floored to millis per "
        "distinct term; the tf saturation is a rational in tf, dl, N, T)."
    ),
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(spark, load_table(spark, sf_dir, "documents"))


#: (phrase_id, phrase) — exact-phrase benchmark queries (2- and 3-word).
PHRASES: tuple[tuple[int, str], ...] = (
    (1, "table hash"),
    (2, "customer join"),
    (3, "slow hash batch"),
)

_PHRASE_TERM_VALUES = ", ".join(
    f"({pid}, {off}, '{term}')"
    for pid, phrase in PHRASES
    for off, term in enumerate(phrase.split())
)

_PHRASE_ORACLE = f"""
WITH p(phrase_id, off, term) AS (VALUES {_PHRASE_TERM_VALUES}),
plen AS (SELECT phrase_id, count(*) AS plen FROM p GROUP BY 1),
d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
t AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) AS pos
  FROM d
),
cand AS (
  SELECT p.phrase_id, t.doc_id, t.pos - p.off AS start_pos, p.off
  FROM t JOIN p USING (term)
),
occ AS (
  -- (phrase_id, doc_id, start_pos, off) is unique by construction
  -- (one posting row x one phrase-term row), so count(*) == the
  -- number of distinct offsets matched at this start.
  SELECT phrase_id, doc_id, start_pos, count(*) AS hits
  FROM cand GROUP BY 1, 2, 3
),
m AS (
  SELECT o.phrase_id, o.doc_id
  FROM occ o JOIN plen l USING (phrase_id)
  WHERE o.hits = l.plen
)
SELECT phrase_id, doc_id, CAST(count(*) AS BIGINT) AS n_matches
FROM m GROUP BY 1, 2
"""


@register(
    "search_phrase",
    _PHRASE_ORACLE,
    doc=(
        "Exact-phrase search via a positional inverted index: posexplode "
        "gives (doc, pos, term) postings, the broadcast phrase vocabulary "
        "prunes them, and a phrase occurs at start s iff every offset o of "
        "the phrase matched at pos s+o — one groupBy counting distinct "
        "matched offsets, no positional self-join."
    ),
)
def search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document occurrence counts for exact multi-word phrases.

    Scale notes (100 TB): postings are pruned by the broadcast phrase
    vocabulary BEFORE any shuffle, so the groupBy keys are bounded by
    occurrences of phrase words, not corpus tokens. The classic
    alternative — a positional self-join per adjacent word pair — costs
    one shuffle join per phrase word; this formulation is a single
    aggregation regardless of phrase length.
    """
    return phrase_counts(spark, load_table(spark, sf_dir, "documents"), PHRASES)


def phrase_counts(
    spark: SparkSession,
    documents: DataFrame,
    phrases: tuple[tuple[int, str], ...],
) -> DataFrame:
    """Core positional-index phrase-match plan over any (doc_id, text)
    DataFrame — split out so tests can drive crafted corpora."""
    pterms = spark.createDataFrame(
        [
            (pid, off, term)
            for pid, phrase in phrases
            for off, term in enumerate(phrase.split())
        ],
        "phrase_id int, off int, term string",
    )
    plen = pterms.groupBy("phrase_id").agg(F.count(F.lit(1)).alias("plen"))
    tokens = (
        documents
        .select(
            "doc_id",
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "").alias("toks"),
        )
        .select("doc_id", F.posexplode("toks").alias("pos", "term"))
    )
    cand = tokens.join(F.broadcast(pterms), "term").select(
        "phrase_id", "doc_id", (F.col("pos") - F.col("off")).alias("start_pos"), "off"
    )
    # candidates are unique on (phrase_id, doc_id, start_pos, off), so a
    # plain count equals count(distinct off) without the extra dedup
    # exchange a count_distinct plan pays.
    occ = cand.groupBy("phrase_id", "doc_id", "start_pos").agg(
        F.count(F.lit(1)).alias("hits")
    )
    matched = occ.join(F.broadcast(plen), "phrase_id").filter(F.col("hits") == F.col("plen"))
    return matched.groupBy("phrase_id", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches")
    )


def bm25_topk(
    spark: SparkSession, documents: DataFrame, top_k: int = TOP_K
) -> DataFrame:
    """Core BM25 plan over any (doc_id, text) DataFrame — split out so
    the scale probe can run it on replicated corpora."""
    per_query = bm25_scores(spark, documents)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_milli"), F.asc("doc_id")
    )
    return (
        per_query.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "rank", "doc_id", "score_milli")
    )


def bm25_scores(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """Exact-BIGINT BM25 scores for EVERY matching (query, doc) pair —
    the unranked table bm25_topk ranks, exposed for composed retrieval
    ops (RM3 feedback needs scores below the top-k cut)."""
    d = (
        documents
        .select(
            "doc_id",
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "").alias("toks"),
        )
        .select("doc_id", "toks", F.size("toks").cast("bigint").alias("dl"))
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    qterms = spark.createDataFrame(list(QUERIES), "query_id int, term string")
    vocab = qterms.select("term").distinct()
    tokens = d.select("doc_id", "dl", F.explode("toks").alias("term"))
    tf = (
        tokens.join(F.broadcast(vocab), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df as a window count keeps `tf` a SINGLE subtree in the plan — a
    # groupBy-then-join-back would recompute the whole explode+agg twice
    # (measured 2x the query runtime at sf0.1).
    df_w = F.count(F.lit(1)).over(Window.partitionBy("term")).cast("bigint")
    scored = (
        tf.withColumn("df", df_w)
        .join(F.broadcast(stats))
        .withColumn("idf_milli", F.expr(_IDF_MILLI))
        .withColumn("score_term", F.expr(_SCORE_TERM.format(div="div")))
    )
    return (
        scored.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score_term").alias("score_milli"))
    )


_N_TERM_BUCKETS = 16


@register(
    "search_index_persisted",
    _ORACLE,
    doc=(
        "BM25 over a MATERIALIZED inverted index: postings "
        "(doc_id, term, tf, dl) written to parquet partitioned by "
        "crc32(term) bucket + a tiny corpus-stats table, then the query "
        "reads ONLY its vocabulary's partitions (partition pruning at "
        "rest — the scan lists just the matching term-bucket dirs) and "
        "scores with the same exact-BIGINT BM25. Result is identical to "
        "the on-the-fly index, so the oracle is the same SQL; what this "
        "query adds is the build-once/search-many shape: at 100 TB the "
        "index build is one explode+agg pass, and each query touches "
        "O(vocab buckets / total buckets) of the files."
    ),
)
def search_index_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from the_movies_db_spark.io import build_once, scratch_dir

    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "").alias("toks"),
        )
        .select("doc_id", "toks", F.size("toks").cast("bigint").alias("dl"))
    )
    # One FIXED repo-local dir per sf (build contract: no writes outside
    # the repo). Build-once/search-many for real: a fingerprint of the
    # SOURCE file (path + size + mtime) is stamped next to the index;
    # when it matches, the build is skipped entirely and the call is
    # search-only — repeated driver sweeps and bench runs pay one build.

    work = scratch_dir(
        "invindex_" + os.path.basename(sf_dir.rstrip("/")), unique=False
    )
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    stamp = {
        "src": src,
        "size": st.st_size,
        "mtime": st.st_mtime_ns,
        # index-format version: bump when tokenization / bucketing /
        # schema changes so an old on-disk index can never be served
        "fmt": ["ws-lower-v1", _N_TERM_BUCKETS],
    }
    def _build() -> None:
        # Build: one explode + one combining agg → postings at rest,
        # partitioned by a stable hash bucket of the term.
        postings = (
            d.select("doc_id", "dl", F.explode("toks").alias("term"))
            .groupBy("doc_id", "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn(
                "term_bucket", F.crc32(F.col("term")) % _N_TERM_BUCKETS
            )
        )
        postings.write.mode("overwrite").partitionBy("term_bucket").parquet(
            work + "/postings"
        )
        d.agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
        ).write.mode("overwrite").parquet(work + "/stats")

    # stamp-check + rebuild serialized under the writer lease so two
    # concurrent processes never overwrite the same fixed dir (ADVICE r6)
    build_once(work, stamp, _build)

    # Search: prune to the query vocabulary's buckets (partition
    # pruning), then exact filter, df via window, BIGINT BM25 scoring.
    import zlib

    vocab = sorted({t for _, t in QUERIES})
    buckets = sorted({zlib.crc32(t.encode()) % _N_TERM_BUCKETS for t in vocab})
    idx = (
        spark.read.parquet(work + "/postings")
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(vocab))
    )
    stats = spark.read.parquet(work + "/stats")
    qterms = spark.createDataFrame(list(QUERIES), "query_id int, term string")
    df_w = F.count(F.lit(1)).over(Window.partitionBy("term")).cast("bigint")
    scored = (
        idx.withColumn("df", df_w)
        .join(F.broadcast(stats))
        .withColumn("idf_milli", F.expr(_IDF_MILLI))
        .withColumn("score_term", F.expr(_SCORE_TERM.format(div="div")))
    )
    per_query = (
        scored.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score_term").alias("score_milli"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_milli"), F.asc("doc_id"))
    return (
        per_query.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "doc_id", "score_milli")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and embedding ANN
# ---------------------------------------------------------------------------
#
# The standard RAG-prep retrieval stack runs BOTH a keyword ranker and a
# vector ranker and fuses them; RRF (Cormack et al., SIGIR'09) is the
# fusion every production system reaches for because it needs no score
# calibration — only ranks. Query q's fused score for doc d is
# sum over systems s of 1/(k0 + rank_s(d)), k0 = 60.
#
# Exactness: each contribution is the exact integer 1000000 div (60 +
# rank) — BIGINT on both engines — so fused scores value-hash. Query
# ids are shared across systems: text query i uses the QUERIES terms
# with query_id == i AND the embedding of vector i (a "more like this
# seed doc + keywords" query, the common hybrid shape). Missing ranks
# contribute 0 via the full-outer join.

_POOL = 20       # per-system candidate pool depth
_RRF_K0 = 60     # rank damping (the SIGIR'09 constant)
_HYBRID_K = 10   # fused results per query
_HYBRID_QIDS = (1, 2, 3)


def _hybrid_oracle() -> str:
    from the_movies_db_spark.queries.similarity_queries import _COS

    qids = ", ".join(str(q) for q in _HYBRID_QIDS)
    return f"""
    WITH bm AS ({_bm25_oracle(_POOL)}),
    ann AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS} DESC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id IN ({qids})
      ) t WHERE rank <= {_POOL}
    ),
    fused AS (
      SELECT CAST(coalesce(b.query_id, a.query_id) AS BIGINT) AS query_id,
             CAST(coalesce(b.doc_id, a.neighbor_id) AS BIGINT) AS doc_id,
             CAST(coalesce(1000000 // ({_RRF_K0} + b.rank), 0)
                + coalesce(1000000 // ({_RRF_K0} + a.rank), 0) AS BIGINT)
               AS rrf_ppm,
             CAST(coalesce(b.rank, 0) AS BIGINT) AS bm25_rank,
             CAST(coalesce(a.rank, 0) AS BIGINT) AS ann_rank
      FROM bm b FULL OUTER JOIN ann a
        ON b.query_id = a.query_id AND b.doc_id = a.neighbor_id
      WHERE coalesce(b.query_id, a.query_id) IN ({qids})
    )
    SELECT query_id, rank, doc_id, rrf_ppm, bm25_rank, ann_rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY rrf_ppm DESC, doc_id) AS BIGINT) AS rank
      FROM fused
    ) WHERE rank <= {_HYBRID_K}
    """


@register(
    "search_hybrid_rrf",
    _hybrid_oracle(),
    doc=(
        "Hybrid retrieval: BM25 top-20 and exact-cosine ANN top-20 per "
        "query fused by reciprocal-rank fusion (1/(60+rank), exact "
        "integer ppm). Docs surfaced by either system rank; ranks fuse "
        "without score calibration."
    ),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of keyword and vector retrieval.

    Scale notes (100 TB): each side's pool is a bounded top-k per query
    (BM25's shuffle is pruned by the broadcast query vocabulary; the
    ANN side here is the exact brute-force ranker but any indexed
    variant — IVF x PQ, LSH — slots in unchanged because fusion only
    consumes (query_id, doc_id, rank)). The fusion join itself touches
    2 * POOL rows per query — negligible at any corpus size; the full
    outer join keys on (query_id, doc_id) so a doc surfaced by one
    system only still ranks with the other contribution at 0.
    """
    from the_movies_db_spark.operators import similarity as S

    bm = bm25_topk(
        spark, load_table(spark, sf_dir, "documents"), top_k=_POOL
    ).select("query_id", "doc_id", F.col("rank").alias("bm25_rank"))
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(list(_HYBRID_QIDS)))
    ann = (
        S.cosine_topk(e, q, "vec_id", "embedding", k=_POOL, dim=64)
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("ann_rank"),
        )
    )
    contrib = "coalesce(1000000 div (%d + %s), 0)" % (_RRF_K0, "%s")
    fused = (
        bm.join(ann, ["query_id", "doc_id"], "full_outer")
        .filter(F.col("query_id").isin(list(_HYBRID_QIDS)))
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.expr(
                f"CAST({contrib % 'bm25_rank'} + {contrib % 'ann_rank'} AS BIGINT)"
            ).alias("rrf_ppm"),
            F.coalesce(F.col("bm25_rank"), F.lit(0)).cast("bigint").alias("bm25_rank"),
            F.coalesce(F.col("ann_rank"), F.lit(0)).cast("bigint").alias("ann_rank"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_ppm"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _HYBRID_K)
        .select("query_id", "rank", "doc_id", "rrf_ppm", "bm25_rank", "ann_rank")
    )


# ---------------------------------------------------------------------------
# Incremental index maintenance: merge a document batch into base postings
# ---------------------------------------------------------------------------

_BATCH_MOD = 7  # doc_id % 7 == 0 plays the "newly arrived" batch


@register(
    "search_index_incremental",
    _ORACLE,
    doc=(
        "Incremental inverted-index maintenance: base postings (the "
        "at-rest index) and a new-document batch each produce "
        "(doc, term, tf, dl) postings independently; the index UNION "
        "and additive corpus stats (n_docs, total_len sum across "
        "parts) score identically to a full rebuild — the oracle is "
        "the plain full-corpus BM25 SQL, so equality IS the gate."
    ),
)
def search_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over base-index + batch-delta postings.

    The production shape this pins: a persisted postings index absorbs
    a daily document batch by APPENDING the batch's postings and adding
    its (n_docs, total_len) to the stats table — no rebuild, no touch
    of historical postings, because tf and dl are per-document and the
    corpus-level pieces (df, N, T) are additive across parts. Scale
    notes (100 TB): the batch pass explodes ONLY the new documents
    (O(batch)); df comes from a window over the unioned, vocabulary-
    pruned postings, which at rest is the partition-pruned read the
    persisted-index query demonstrates.
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "").alias("toks"),
        )
        .select("doc_id", "toks", F.size("toks").cast("bigint").alias("dl"))
    )
    base = d.filter(F.col("doc_id") % _BATCH_MOD != 0)
    batch = d.filter(F.col("doc_id") % _BATCH_MOD == 0)

    qterms = spark.createDataFrame(list(QUERIES), "query_id int, term string")
    vocab = qterms.select("term").distinct()

    def postings(part: DataFrame) -> DataFrame:
        return (
            part.select("doc_id", "dl", F.explode("toks").alias("term"))
            .join(F.broadcast(vocab), "term")
            .groupBy("doc_id", "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )

    def part_stats(part: DataFrame) -> DataFrame:
        return part.agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
        )

    idx = postings(base).unionByName(postings(batch))
    stats = (
        part_stats(base)
        .unionByName(part_stats(batch))
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("total_len").cast("bigint").alias("total_len"),
        )
    )
    df_w = F.count(F.lit(1)).over(Window.partitionBy("term")).cast("bigint")
    scored = (
        idx.withColumn("df", df_w)
        .join(F.broadcast(stats))
        .withColumn("idf_milli", F.expr(_IDF_MILLI))
        .withColumn("score_term", F.expr(_SCORE_TERM.format(div="div")))
    )
    per_query = (
        scored.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score_term").alias("score_milli"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_milli"), F.asc("doc_id"))
    return (
        per_query.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "doc_id", "score_milli")
    )


# proximity query pairs: (query_id, term_a, term_b)
PROX_PAIRS = ((1, "spark", "table"), (2, "query", "join"), (3, "batch", "stream"))
_PROX_VALUES = ", ".join(
    f"({qid}, '{a}', 'a'), ({qid}, '{b}', 'b')" for qid, a, b in PROX_PAIRS
)


@register(
    "search_phrase_proximity",
    f"""
    WITH qt AS (
      SELECT * FROM (VALUES {_PROX_VALUES}) AS t(query_id, term, role)
    ), tok AS (
      SELECT doc_id, unnest(toks) AS term, unnest(range(len(toks))) AS pos
      FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           t -> t <> '') AS toks
        FROM documents
      ) d
    ), post AS (
      SELECT q.query_id, t.doc_id, t.pos, t.term
      FROM tok t JOIN qt q USING (term)
    ), adj AS (
      SELECT query_id, doc_id, pos, term,
             lag(term) OVER (PARTITION BY query_id, doc_id ORDER BY pos)
               AS pterm,
             lag(pos) OVER (PARTITION BY query_id, doc_id ORDER BY pos)
               AS ppos
      FROM post
    ), gaps AS (
      SELECT query_id, doc_id, CAST(min(pos - ppos) AS BIGINT) AS min_gap
      FROM adj WHERE pterm IS NOT NULL AND term <> pterm
      GROUP BY query_id, doc_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, min_gap, rank
    FROM (
      SELECT query_id, doc_id, min_gap,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY min_gap, doc_id) AS rank
      FROM gaps
    ) t WHERE rank <= 5
    """,
    doc=(
        "Proximity search: per (query, doc) the MINIMUM token distance "
        "between the two query terms, top-5 closest docs per query. "
        "Linear in postings — the min over ADJACENT different-term "
        "postings in position order equals the global pairwise min "
        "(two-pointer identity), so there is NO per-doc positional "
        "self-join; postings are pruned by the broadcast query "
        "vocabulary before the only shuffle."
    ),
)
def search_phrase_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-token-distance proximity ranking via adjacent postings.

    Scale notes (100 TB): tokens are pruned to query-term postings
    map-side (broadcast vocab join), the lag window partitions on
    (query, doc) — millions of tiny partitions, fully parallel — and
    the candidate set never multiplies tf(a) x tf(b)."""
    from pyspark.sql import Window

    qt = spark.createDataFrame(
        [(qid, t, role) for qid, a, b in PROX_PAIRS
         for t, role in ((a, "a"), (b, "b"))],
        "query_id long, term string, role string",
    )
    tokens = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.filter(
                F.split(F.lower("text"), r"\s+"), lambda t: t != ""
            ).alias("toks"),
        )
        .select("doc_id", F.posexplode("toks").alias("pos", "term"))
    )
    post = tokens.join(F.broadcast(qt.select("query_id", "term")), "term")
    w = Window.partitionBy("query_id", "doc_id").orderBy("pos")
    adj = post.select(
        "query_id", "doc_id", "pos", "term",
        F.lag("term").over(w).alias("pterm"),
        F.lag("pos").over(w).alias("ppos"),
    )
    gaps = (
        adj.filter(F.col("pterm").isNotNull() & (F.col("term") != F.col("pterm")))
        .groupBy("query_id", "doc_id")
        .agg((F.min(F.col("pos") - F.col("ppos"))).cast("bigint").alias("min_gap"))
    )
    wr = Window.partitionBy("query_id").orderBy("min_gap", "doc_id")
    return (
        gaps.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 5)
        .select("query_id", "doc_id", "min_gap", "rank")
    )


SNIPPET_TERMS = ("spark", "query", "table")
_SNIP_IN = ", ".join(f"'{t}'" for t in SNIPPET_TERMS)


@register(
    "search_snippet_extraction",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(toks) AS term, unnest(range(len(toks))) AS pos
      FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           t -> t <> '') AS toks
        FROM documents
      ) d
    ), post AS (
      SELECT doc_id, pos FROM tok WHERE term IN ({_SNIP_IN})
    ), windows AS (
      SELECT doc_id, pos AS snippet_start,
             count(*) OVER (PARTITION BY doc_id ORDER BY pos
                            RANGE BETWEEN CURRENT ROW AND 9 FOLLOWING)
               AS n_hits
      FROM post
    ), best AS (
      SELECT doc_id, snippet_start, n_hits FROM (
        SELECT doc_id, snippet_start, n_hits,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY n_hits DESC, snippet_start)
                 AS rn
        FROM windows
      ) t WHERE rn = 1
    )
    SELECT doc_id, snippet_start,
           CAST(n_hits AS BIGINT) AS n_hits,
           rank
    FROM (
      SELECT doc_id, snippet_start, n_hits,
             row_number() OVER (ORDER BY n_hits DESC, doc_id) AS rank
      FROM best
    ) t WHERE rank <= 10
    """,
    doc=(
        "Snippet extraction: the best 10-token window per document "
        "(most query-term hits, earliest on ties) found with a "
        "VALUE-RANGE window frame over pruned postings — anchors are "
        "only term positions, so cost tracks postings, not document "
        "length, and there is no per-window re-scan. Corpus top-10 "
        "snippet-dense docs."
    ),
)
def search_snippet_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best snippet window per doc via a RANGE frame over postings.

    Scale notes (100 TB): postings pruned by the term filter map-side;
    the RANGE frame runs per doc over matching positions only; the
    final top-10 is a TakeOrdered over one row per doc."""
    from pyspark.sql import Window

    tokens = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.filter(
                F.split(F.lower("text"), r"\s+"), lambda t: t != ""
            ).alias("toks"),
        )
        .select("doc_id", F.posexplode("toks").alias("pos", "term"))
    )
    post = tokens.filter(F.col("term").isin(*SNIPPET_TERMS)).select(
        "doc_id", "pos"
    )
    w_rng = (
        Window.partitionBy("doc_id").orderBy("pos").rangeBetween(0, 9)
    )
    windows = post.select(
        "doc_id",
        F.col("pos").alias("snippet_start"),
        F.count(F.lit(1)).over(w_rng).alias("n_hits"),
    )
    w_best = Window.partitionBy("doc_id").orderBy(
        F.desc("n_hits"), F.asc("snippet_start")
    )
    best = (
        windows.withColumn("__rn", F.row_number().over(w_best))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # top-10 via TakeOrderedAndProject FIRST, then rank the 10 survivors
    # (a pre-limit global row_number would single-partition every
    # matching doc at scale)
    top = best.orderBy(F.desc("n_hits"), F.asc("doc_id")).limit(10)
    w_rank = Window.orderBy(F.desc("n_hits"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w_rank)).select(
        "doc_id", "snippet_start",
        F.col("n_hits").cast("bigint").alias("n_hits"), "rank",
    )


@register(
    "search_query_expansion",
    """
    WITH pres AS (
      SELECT DISTINCT doc_id, t AS term
      FROM (SELECT doc_id,
                   unnest(list_filter(
                     regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '')) AS t
            FROM documents) u
    ), seed AS (
      SELECT doc_id FROM pres WHERE term = 'join'
    ), joint AS (
      SELECT p.term, CAST(count(*) AS BIGINT) AS n_joint
      FROM pres p JOIN seed s ON p.doc_id = s.doc_id
      WHERE p.term <> 'join'
      GROUP BY p.term
    ), df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM pres GROUP BY term
    ), nn2 AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
             (SELECT CAST(count(*) AS BIGINT) FROM seed) AS dfs
    )
    SELECT j.term, j.n_joint, d.df,
           CAST(floor(ln(CAST(nn2.n * j.n_joint AS DOUBLE)
                         / CAST(nn2.dfs * d.df AS DOUBLE)) * 1000000)
                AS BIGINT) AS pmi_micro
    FROM joint j JOIN df d ON j.term = d.term CROSS JOIN nn2
    WHERE j.n_joint >= 5
    ORDER BY pmi_micro DESC, j.term
    LIMIT 10
    """,
    doc=(
        "Query expansion by pointwise mutual information: terms that "
        "co-occur with the seed term ('join') more than chance — "
        "PMI(s,t) = ln(N*joint/(df_s*df_t)) over document presence, "
        "min support 5 — the thesaurus-free relevance-feedback step a "
        "search pipeline runs offline. pmi in floor-micro of an "
        "identically-computed IEEE double (exact integer ratio into "
        "one double division, then ln — the engine-exact recipe)."
    ),
)
def search_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI co-occurrence expansion for a seed term, top-10.

    Scale notes (100 TB): per-doc DISTINCT terms come from
    array_distinct inside the row (no dedup shuffle); seed's doc list
    is a broadcast semi-side; df is the vocab-bounded aggregate; the
    final top-10 is TakeOrderedAndProject. One fact scan feeds pres
    twice (seed filter + df) — both aggregate to vocab/doc-list scale
    immediately."""
    d = load_table(spark, sf_dir, "documents")
    pres = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr("filter(split(lower(text), '\\\\s+'), x -> x != '')")
            )
        ).alias("term"),
    )
    seed = pres.filter(F.col("term") == "join").select("doc_id")
    joint = (
        pres.join(F.broadcast(seed), "doc_id")
        .filter(F.col("term") != "join")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_joint"))
    )
    df = pres.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    nn = d.agg(F.count(F.lit(1)).cast("bigint").alias("n")).crossJoin(
        seed.agg(F.count(F.lit(1)).cast("bigint").alias("dfs"))
    )
    return (
        joint.filter(F.col("n_joint") >= 5)
        .join(df, "term")
        .crossJoin(F.broadcast(nn))
        .select(
            "term",
            "n_joint",
            "df",
            F.floor(
                F.log(
                    F.expr("CAST(n * n_joint AS DOUBLE)")
                    / F.expr("CAST(dfs * df AS DOUBLE)")
                )
                * 1000000
            )
            .cast("bigint")
            .alias("pmi_micro"),
        )
        .orderBy(F.desc("pmi_micro"), F.asc("term"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Graded-relevance retrieval evaluation: nDCG@10 of the BM25 ranker
# ---------------------------------------------------------------------------

_NDCG_K = 10

#: rel = number of distinct query terms present in the doc (0..3);
#: gain = 2^rel - 1, written as a CASE so both engines fold it exactly.
_NDCG_GAIN = (
    "CASE WHEN rel >= 3 THEN 7 WHEN rel = 2 THEN 3 "
    "WHEN rel = 1 THEN 1 ELSE 0 END"
)


def _dcg_contrib(rank_col: str) -> str:
    """Floor-micro DCG contribution gain/log2(rank+1) — identical
    expression text on both engines (ln of small-integer doubles, one
    division chain, floor)."""
    return (
        f"CAST(floor(CAST({_NDCG_GAIN} AS DOUBLE) / "
        f"(ln(CAST({rank_col} + 1 AS DOUBLE)) / ln(CAST(2 AS DOUBLE))) "
        f"* 1000000) AS BIGINT)"
    )


_NDCG_ORACLE = f"""
WITH bm AS ({{bm}}),
q(query_id, term) AS (VALUES {_QUERY_VALUES}),
pres AS (
  SELECT DISTINCT doc_id, t AS term
  FROM (SELECT doc_id,
               unnest(list_filter(
                 regexp_split_to_array(lower(text), '\\s+'),
                 x -> x <> '')) AS t
        FROM documents) u
),
rel AS (
  SELECT q.query_id, p.doc_id, CAST(count(*) AS BIGINT) AS rel
  FROM pres p JOIN q ON p.term = q.term
  GROUP BY 1, 2
),
sys AS (
  SELECT b.query_id, CAST(sum({_dcg_contrib('b.rank')}) AS BIGINT) AS dcg_micro
  FROM bm b JOIN rel ON b.query_id = rel.query_id AND b.doc_id = rel.doc_id
  GROUP BY 1
),
ideal AS (
  SELECT query_id, CAST(sum({_dcg_contrib('irank')}) AS BIGINT) AS idcg_micro
  FROM (
    SELECT query_id, rel,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, doc_id) AS irank
    FROM rel
  ) t WHERE irank <= {_NDCG_K}
  GROUP BY 1
)
SELECT CAST(s.query_id AS BIGINT) AS query_id,
       s.dcg_micro, i.idcg_micro,
       CAST(s.dcg_micro * 1000000 // i.idcg_micro AS BIGINT) AS ndcg_ppm
FROM sys s JOIN ideal i ON s.query_id = i.query_id
""".format(bm=_bm25_oracle(_NDCG_K))


@register(
    "search_ndcg_eval",
    _NDCG_ORACLE,
    doc=(
        "Retrieval quality eval: nDCG@10 of the BM25 ranker against "
        "graded relevance (rel = distinct query terms present, gain = "
        "2^rel - 1). DCG and ideal-DCG accumulate exact floor-micro "
        "contributions (ln of small-integer ranks only), nDCG in exact "
        "ppm — the offline eval loop a search team runs per index "
        "build, value-hash-stable across engines."
    ),
)
def search_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of BM25 vs term-overlap graded relevance.

    Scale notes (100 TB): rel is computed once over the
    vocabulary-pruned presence stream (broadcast query terms filter
    BEFORE any shuffle) and lazily checkpointed — the system-DCG and
    ideal-DCG branches would otherwise each re-execute the corpus
    tokenization (ReuseExchange does not fire across branches). The
    ideal ranking is a per-query window over the bounded relevant set;
    BM25's plan is the shipped vocabulary-pruned index build."""
    d = load_table(spark, sf_dir, "documents")
    bm = bm25_topk(spark, d, top_k=_NDCG_K)
    qterms = spark.createDataFrame(list(QUERIES), "query_id int, term string")
    pres = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr("filter(split(lower(text), '\\\\s+'), x -> x != '')")
            )
        ).alias("term"),
    )
    rel = (
        pres.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rel"))
        .localCheckpoint(eager=False)
    )
    sys_dcg = (
        # bm is bounded (top-k per query x |Q| queries) but stats-less
        # after the index-build lineage -> broadcast, never SortMergeJoin
        F.broadcast(bm).join(rel, ["query_id", "doc_id"])
        .select("query_id", F.expr(_dcg_contrib("rank")).alias("c"))
        .groupBy("query_id")
        .agg(F.sum("c").cast("bigint").alias("dcg_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (
        rel.withColumn("irank", F.row_number().over(w))
        .filter(F.col("irank") <= _NDCG_K)
        .select("query_id", F.expr(_dcg_contrib("irank")).alias("c"))
        .groupBy("query_id")
        .agg(F.sum("c").cast("bigint").alias("idcg_micro"))
    )
    return (
        sys_dcg.join(F.broadcast(ideal), "query_id")
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            "dcg_micro",
            "idcg_micro",
            F.expr("CAST(dcg_micro * 1000000 div idcg_micro AS BIGINT)").alias(
                "ndcg_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Hard-negative mining: lexically retrieved, semantically distant
# ---------------------------------------------------------------------------

_HN_POOL = 20  # per-system candidate pool per query
_HN_K = 5      # hard negatives kept per query


def _hn_oracle() -> str:
    from the_movies_db_spark.queries.similarity_queries import _COS

    qids = ", ".join(str(q) for q in _HYBRID_QIDS)
    return f"""
    WITH bm AS ({_bm25_oracle(_HN_POOL)}),
    ann AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS} DESC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id IN ({qids})
      ) t WHERE rank <= {_HN_POOL}
    ),
    neg AS (
      SELECT b.query_id, b.doc_id, b.score_milli,
             row_number() OVER (PARTITION BY b.query_id
                                ORDER BY b.rank) AS neg_rank
      FROM bm b
      WHERE b.query_id IN ({qids})
        AND NOT EXISTS (SELECT 1 FROM ann a
                        WHERE a.query_id = b.query_id
                          AND a.neighbor_id = b.doc_id)
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neg_rank AS BIGINT) AS neg_rank,
           doc_id, score_milli
    FROM neg WHERE neg_rank <= {_HN_K}
    """


@register(
    "search_hard_negatives",
    _hn_oracle(),
    doc=(
        "Hard-negative mining for dual-encoder training: documents "
        "the BM25 ranker retrieves (top-20 pool) that the embedding "
        "side does NOT place in its exact-cosine top-20 — lexically "
        "confusable but semantically distant, exactly the negatives "
        "contrastive retrieval training needs (random negatives are "
        "too easy; BM25 negatives are the standard recipe). Top-5 per "
        "query in BM25 order, all-integer scores."
    ),
)
def search_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine BM25-retrieved docs outside the semantic top-20.

    Scale notes (100 TB): both pools are bounded top-k per query (the
    BM25 side is the vocabulary-pruned index build; the ANN side here
    is the exact ranker, but any indexed variant slots in unchanged —
    the anti-join consumes only (query_id, id) pairs). The anti-join
    and ranking window touch <= 20 rows per query."""
    from the_movies_db_spark.operators import similarity as S

    bm = bm25_topk(
        spark, load_table(spark, sf_dir, "documents"), top_k=_HN_POOL
    ).filter(F.col("query_id").isin(list(_HYBRID_QIDS)))
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(list(_HYBRID_QIDS)))
    ann = S.cosine_topk(e, q, "vec_id", "embedding", k=_HN_POOL, dim=64).select(
        "query_id", F.col("neighbor_id").alias("doc_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    return (
        # ann is bounded by construction (|Q| x pool rows) but its
        # corpus-scale lineage has no stats -> planned SortMergeJoin;
        # broadcast is safe at any scale
        bm.join(F.broadcast(ann), ["query_id", "doc_id"], "left_anti")
        .withColumn("neg_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("neg_rank") <= _HN_K)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            "neg_rank",
            "doc_id",
            "score_milli",
        )
    )


# ---------------------------------------------------------------------------
# MRR / hit-rate retrieval eval: first relevant rank per query
# ---------------------------------------------------------------------------

_MRR_K = 10
_MRR_MIN_REL = 2  # relevant = at least 2 distinct query terms present

_MRR_ORACLE = f"""
WITH bm AS ({{bm}}),
q(query_id, term) AS (VALUES {_QUERY_VALUES}),
pres AS (
  SELECT DISTINCT doc_id, t AS term
  FROM (SELECT doc_id,
               unnest(list_filter(
                 regexp_split_to_array(lower(text), '\\s+'),
                 x -> x <> '')) AS t
        FROM documents) u
),
rel AS (
  SELECT q.query_id, p.doc_id
  FROM pres p JOIN q ON p.term = q.term
  GROUP BY 1, 2
  HAVING count(*) >= {_MRR_MIN_REL}
),
hits AS (
  SELECT b.query_id,
         CAST(min(b.rank) AS BIGINT) AS first_rank,
         CAST(count(*) AS BIGINT)    AS n_hits
  FROM bm b JOIN rel r ON b.query_id = r.query_id AND b.doc_id = r.doc_id
  GROUP BY 1
)
SELECT CAST(qs.query_id AS BIGINT)          AS query_id,
       CAST(COALESCE(h.first_rank, 0) AS BIGINT) AS first_relevant_rank,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT)     AS n_relevant_topk,
       CAST(CASE WHEN h.first_rank IS NULL THEN 0
                 ELSE 1000000 // h.first_rank END AS BIGINT) AS rr_ppm
FROM (SELECT DISTINCT query_id FROM q) qs
LEFT JOIN hits h ON qs.query_id = h.query_id
""".format(bm=_bm25_oracle(_MRR_K))


@register(
    "search_mrr_eval",
    _MRR_ORACLE,
    doc=(
        "Retrieval eval #2: reciprocal rank of the FIRST relevant "
        "result (relevant = >= 2 distinct query terms present) in the "
        "BM25 top-10, plus the hit count — MRR is the navigational "
        "metric search teams track next to nDCG's graded view. "
        "RR is 1e6 div first_rank, an exact integer: the whole eval is "
        "BIGINT end to end with zero float risk."
    ),
)
def search_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 + hit count of BM25 vs term-overlap relevance.

    Scale notes (100 TB): the relevance table is vocabulary-pruned
    BEFORE any shuffle (broadcast query terms into the token stream)
    and grouped to |Q|x|relevant| rows; the join to the top-k table is
    |Q|x10. One corpus tokenization for relevance, BM25's own passes
    for the ranking — nothing else touches the corpus."""
    d = load_table(spark, sf_dir, "documents")
    bm = bm25_topk(spark, d, top_k=_MRR_K)
    qterms = spark.createDataFrame(list(QUERIES), "query_id int, term string")
    pres = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr("filter(split(lower(text), '\\\\s+'), x -> x != '')")
            )
        ).alias("term"),
    )
    rel = (
        pres.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("nt"))
        .filter(F.col("nt") >= _MRR_MIN_REL)
        .select("query_id", "doc_id")
    )
    hits = (
        bm.join(rel, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(
            F.min("rank").cast("bigint").alias("first_rank"),
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        )
    )
    qs = qterms.select("query_id").distinct()
    return (
        qs.join(hits, "query_id", "left")
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.coalesce("first_rank", F.lit(0)).cast("bigint").alias(
                "first_relevant_rank"
            ),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias(
                "n_relevant_topk"
            ),
            F.expr(
                "CAST(CASE WHEN first_rank IS NULL THEN 0"
                " ELSE 1000000 div first_rank END AS BIGINT)"
            ).alias("rr_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# SymSpell spell correction: deletion-neighborhood equi-join
# ---------------------------------------------------------------------------

_SPELL_MIN_LEN = 3   # vocabulary floor (drops bare articles)
_SPELL_Q_LEN = 5     # misspelling sources must be at least this long
_SPELL_QUERIES = 8
_SPELL_TOP = 3

_SPELL_ORACLE = f"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS t
  FROM documents
),
vocab AS (
  SELECT t AS term, CAST(count(*) AS BIGINT) AS n
  FROM toks WHERE len(t) >= {_SPELL_MIN_LEN} GROUP BY 1
),
qsel AS (
  SELECT substr(term, 1, 2) || substr(term, 4, 100) AS query_term
  FROM (
    SELECT term, row_number() OVER (ORDER BY n DESC, term) AS rk
    FROM vocab WHERE len(term) >= {_SPELL_Q_LEN}
  ) t WHERE rk <= {_SPELL_QUERIES}
),
vkeys AS (
  SELECT term,
         unnest(list_append(
           list_transform(range(1, len(term) + 1),
                          i -> substr(term, 1, i - 1)
                               || substr(term, i + 1, 100)),
           term)) AS k
  FROM vocab
),
qkeys AS (
  SELECT query_term,
         unnest(list_append(
           list_transform(range(1, len(query_term) + 1),
                          i -> substr(query_term, 1, i - 1)
                               || substr(query_term, i + 1, 100)),
           query_term)) AS k
  FROM qsel
),
cand AS (
  SELECT DISTINCT q.query_term, v.term
  FROM qkeys q JOIN vkeys v ON q.k = v.k
),
scored AS (
  SELECT c.query_term, c.term AS suggestion,
         CAST(levenshtein(c.query_term, c.term) AS BIGINT) AS distance,
         v.n AS n_occurrences
  FROM cand c JOIN vocab v ON c.term = v.term
  WHERE levenshtein(c.query_term, c.term) <= 1
)
SELECT query_term, suggestion, distance, n_occurrences,
       CAST(rk AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_term
                               ORDER BY distance, n_occurrences DESC,
                                        suggestion) AS rk
  FROM scored
) t WHERE rk <= {_SPELL_TOP}
"""


@register(
    "search_spell_symspell",
    _SPELL_ORACLE,
    doc=(
        "SymSpell spell correction: candidate pairs come from an "
        "EQUI-JOIN on single-deletion keys (term plus every "
        "one-character deletion, both sides), then only the tiny "
        "candidate set pays a levenshtein verification (<= 1) and a "
        "frequency-ranked top-3. The deletion-neighborhood trick "
        "turns fuzzy matching into hash-joinable exact keys — no "
        "cross join, no per-pair edit distance over the vocabulary. "
        "Misspelled queries are derived deterministically from the "
        "corpus itself (3rd character deleted from the top frequent "
        "long terms)."
    ),
)
def search_spell_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-key spell correction over the corpus vocabulary.

    Scale notes (100 TB): one corpus tokenization collapses to the
    vocabulary aggregate (lazily checkpointed — every later branch is
    vocab-grain, zero corpus re-scans in the returned plan); deletion
    keys multiply the vocab by ~term length, stay hash-partitionable,
    and the expensive verification runs only on key-collision pairs.
    This is how spell indexes scale to billion-term vocabularies —
    the key space is the index, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.expr("filter(split(lower(text), '\\\\s+'), x -> x != '')")
        ).alias("t")
    )
    vocab = (
        toks.filter(F.length("t") >= _SPELL_MIN_LEN)
        .groupBy(F.col("t").alias("term"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    # Panel selection is limit-then-rank: orderBy().limit() compiles to
    # TakeOrderedAndProject (distributed partial top-k) — never a
    # row_number window over the full vocabulary (round-7 weak item;
    # same pattern as search_phrase's pool cut below).
    qsel = (
        vocab.filter(F.length("term") >= _SPELL_Q_LEN)
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(_SPELL_QUERIES)
        .select(
            F.expr("concat(substring(term, 1, 2), substring(term, 4, 100))")
            .alias("query_term")
        )
    )
    del_keys = (
        "explode(concat(transform(sequence(1, length({c})),"
        " i -> concat(substring({c}, 1, i - 1), substring({c}, i + 1, 100))),"
        " array({c})))"
    )
    vkeys = vocab.select("term", F.expr(del_keys.format(c="term")).alias("k"))
    qkeys = qsel.select(
        "query_term", F.expr(del_keys.format(c="query_term")).alias("k")
    )
    cand = (
        qkeys.join(vkeys, "k")
        .select("query_term", "term")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(vocab), "term")
        .withColumn(
            "distance", F.levenshtein("query_term", "term").cast("bigint")
        )
        .filter(F.col("distance") <= 1)
        .select(
            "query_term",
            F.col("term").alias("suggestion"),
            "distance",
            F.col("n").alias("n_occurrences"),
        )
    )
    w = Window.partitionBy("query_term").orderBy(
        F.asc("distance"), F.desc("n_occurrences"), F.asc("suggestion")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _SPELL_TOP)
    )


# ---------------------------------------------------------------------------
# Cross-system rank agreement: BM25 vs embedding retrieval (Spearman)
# ---------------------------------------------------------------------------

_RA_POOL = 20


def _ra_oracle() -> str:
    from the_movies_db_spark.queries.similarity_queries import _COS

    qids = ", ".join(str(q) for q in _HYBRID_QIDS)
    qid_rows = ", ".join(f"({q})" for q in _HYBRID_QIDS)
    return f"""
    WITH bm AS ({_bm25_oracle(_RA_POOL)}),
    ann AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS} DESC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id IN ({qids})
      ) t WHERE rank <= {_RA_POOL}
    ),
    common AS (
      SELECT b.query_id,
             row_number() OVER (PARTITION BY b.query_id
                                ORDER BY b.rank) AS r1,
             row_number() OVER (PARTITION BY b.query_id
                                ORDER BY a.rank) AS r2
      FROM bm b JOIN ann a ON a.query_id = b.query_id
                          AND a.neighbor_id = b.doc_id
      WHERE b.query_id IN ({qids})
    ),
    agg AS (
      SELECT query_id,
             CAST(count(*) AS BIGINT) AS n_common,
             CAST(count(*) * 1000000 // {_RA_POOL} AS BIGINT) AS overlap_ppm,
             CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2,
             CASE WHEN count(*) >= 2
                  THEN CAST(1000000
                            - (6 * sum((r1 - r2) * (r1 - r2)) * 1000000)
                            // (count(*) * (count(*) * count(*) - 1))
                            AS BIGINT)
                  ELSE NULL END AS spearman_micro
      FROM common GROUP BY 1
    ),
    spine(query_id) AS (VALUES {qid_rows})
    SELECT CAST(s.query_id AS BIGINT) AS query_id,
           CAST(coalesce(a.n_common, 0) AS BIGINT) AS n_common,
           CAST(coalesce(a.overlap_ppm, 0) AS BIGINT) AS overlap_ppm,
           CAST(coalesce(a.sum_d2, 0) AS BIGINT) AS sum_d2,
           a.spearman_micro
    FROM spine s LEFT JOIN agg a ON a.query_id = s.query_id
    """


@register(
    "search_rank_agreement",
    _ra_oracle(),
    doc=(
        "Cross-system retrieval agreement per query: the top-20 BM25 "
        "pool is intersected with the top-20 embedding pool, both "
        "rankings are re-ranked within the intersection, and Spearman "
        "rho comes out as EXACT integer micros (1 - 6*sum d^2 / "
        "n(n^2-1) needs no floats for integer ranks). Low overlap + "
        "high rho = the systems agree where they overlap (fusion adds "
        "recall); high overlap + low rho = they disagree on order "
        "(fusion adds ranking signal). The diagnostic that tells you "
        "WHY hybrid RRF wins."
    ),
)
def search_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank agreement between lexical and semantic retrieval.

    Scale notes (100 TB): both pools are bounded top-k per query; the
    join, re-rank windows and aggregate touch <= 20 rows per query.
    Either ranker swaps for its indexed variant unchanged — the
    agreement math consumes only (query_id, id, rank) triples."""
    from the_movies_db_spark.operators import similarity as S

    bm = bm25_topk(
        spark, load_table(spark, sf_dir, "documents"), top_k=_RA_POOL
    ).filter(F.col("query_id").isin(list(_HYBRID_QIDS)))
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(list(_HYBRID_QIDS)))
    ann = S.cosine_topk(e, q, "vec_id", "embedding", k=_RA_POOL, dim=64).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("ann_rank"),
    )
    wq = Window.partitionBy("query_id")
    common = bm.join(ann, ["query_id", "doc_id"]).select(
        "query_id",
        F.row_number().over(wq.orderBy("rank")).alias("r1"),
        F.row_number().over(wq.orderBy("ann_rank")).alias("r2"),
    )
    agg = common.groupBy(
        F.col("query_id").cast("bigint").alias("query_id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common"),
        F.expr(
            f"CAST(count(*) * 1000000 div {_RA_POOL} AS BIGINT)"
        ).alias("overlap_ppm"),
        F.expr("CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT)").alias("sum_d2"),
        F.expr(
            "CASE WHEN count(*) >= 2"
            " THEN CAST(1000000 - (6 * sum((r1 - r2) * (r1 - r2)) * 1000000)"
            " div (count(*) * (count(*) * count(*) - 1)) AS BIGINT)"
            " ELSE NULL END"
        ).alias("spearman_micro"),
    )
    spine = spark.createDataFrame(
        [(q,) for q in _HYBRID_QIDS], "query_id bigint"
    )
    return F.broadcast(spine).join(agg, "query_id", "left").select(
        "query_id",
        F.coalesce("n_common", F.lit(0)).cast("bigint").alias("n_common"),
        F.coalesce("overlap_ppm", F.lit(0))
        .cast("bigint")
        .alias("overlap_ppm"),
        F.coalesce("sum_d2", F.lit(0)).cast("bigint").alias("sum_d2"),
        "spearman_micro",
    )


# ---------------------------------------------------------------------------
# IDF drift between corpus halves (index-staleness audit)
# ---------------------------------------------------------------------------

_IDF_MIN_DF = 3
_IDF_TOP = 20

#: BM25-style idf from integer (N, df) — identical text both engines,
#: floored to micro as ONE expression (ln is correctly rounded on this
#: host; the difference of the two already-floored integers is exact).
_IDF_MICRO = (
    "CAST(floor(ln((CAST({n} AS DOUBLE) - CAST({df} AS DOUBLE) + 0.5)"
    " / (CAST({df} AS DOUBLE) + 0.5)) * 1000000) AS BIGINT)"
)


@register(
    "search_idf_drift",
    f"""
    WITH d AS (
      SELECT doc_id, doc_id % 2 AS half,
             unnest(list_distinct(list_filter(
               regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')))
               AS t
      FROM documents
    ),
    nh AS (
      SELECT CAST(count(DISTINCT CASE WHEN doc_id % 2 = 0
                                      THEN doc_id END) AS BIGINT) AS na,
             CAST(count(DISTINCT CASE WHEN doc_id % 2 = 1
                                      THEN doc_id END) AS BIGINT) AS nb
      FROM documents
    ),
    df AS (
      SELECT t,
             CAST(count(CASE WHEN half = 0 THEN 1 END) AS BIGINT) AS dfa,
             CAST(count(CASE WHEN half = 1 THEN 1 END) AS BIGINT) AS dfb
      FROM d GROUP BY 1
    ),
    scored AS (
      SELECT t AS term, dfa, dfb,
             {_IDF_MICRO.format(n="na", df="dfa")} AS idf_a_micro,
             {_IDF_MICRO.format(n="nb", df="dfb")} AS idf_b_micro
      FROM df CROSS JOIN nh
      WHERE dfa >= {_IDF_MIN_DF} AND dfb >= {_IDF_MIN_DF}
    )
    SELECT term, dfa AS df_a, dfb AS df_b, idf_a_micro, idf_b_micro,
           idf_b_micro - idf_a_micro AS drift_micro
    FROM scored
    ORDER BY abs(idf_b_micro - idf_a_micro) DESC, term
    LIMIT {_IDF_TOP}
    """,
    doc=(
        "IDF drift between the two corpus halves (doc_id parity as "
        "the generation split): per-term BM25 idf in each half from "
        "exact (N, df) integers, top movers by absolute drift. The "
        "index-staleness audit — terms whose rarity shifted most are "
        "exactly where a stale IDF table misranks, and the signal "
        "that schedules a relevance-index rebuild."
    ),
)
def search_idf_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top IDF movers between corpus halves.

    Scale notes (100 TB): one tokenization collapses to the vocab-
    bounded (term, df_a, df_b) table; half sizes are a 1-row broadcast
    aggregate; the top-20 is orderBy+limit -> TakeOrderedAndProject
    (distributed partial top-k), never a global rank window."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.expr("doc_id % 2").alias("half"),
        F.explode(
            F.expr(
                "array_distinct(filter(split(lower(text), '\\\\s+'),"
                " x -> x != ''))"
            )
        ).alias("t"),
    )
    nh = docs.agg(
        F.expr(
            "CAST(count(DISTINCT CASE WHEN doc_id % 2 = 0"
            " THEN doc_id END) AS BIGINT)"
        ).alias("na"),
        F.expr(
            "CAST(count(DISTINCT CASE WHEN doc_id % 2 = 1"
            " THEN doc_id END) AS BIGINT)"
        ).alias("nb"),
    )
    df = d.groupBy("t").agg(
        F.expr("CAST(count(CASE WHEN half = 0 THEN 1 END) AS BIGINT)").alias(
            "dfa"
        ),
        F.expr("CAST(count(CASE WHEN half = 1 THEN 1 END) AS BIGINT)").alias(
            "dfb"
        ),
    )
    scored = (
        df.filter(
            (F.col("dfa") >= _IDF_MIN_DF) & (F.col("dfb") >= _IDF_MIN_DF)
        )
        .crossJoin(F.broadcast(nh))
        .select(
            F.col("t").alias("term"),
            F.col("dfa").alias("df_a"),
            F.col("dfb").alias("df_b"),
            F.expr(_IDF_MICRO.format(n="na", df="dfa")).alias("idf_a_micro"),
            F.expr(_IDF_MICRO.format(n="nb", df="dfb")).alias("idf_b_micro"),
        )
        .withColumn(
            "drift_micro", F.col("idf_b_micro") - F.col("idf_a_micro")
        )
    )
    return scored.orderBy(
        F.abs(F.col("drift_micro")).desc(), F.asc("term")
    ).limit(_IDF_TOP)


# ---------------------------------------------------------------------------
# Query-likelihood language-model retrieval (Dirichlet smoothing)
# ---------------------------------------------------------------------------

_QL_MU = 2000
#: per-term Dirichlet log-likelihood, floored to integer micros.
#: (tf + mu*cf/C) / (dl + mu) == (tf*C + mu*cf) / (C*(dl + mu)) — a
#: rational of exact BIGINTs, so the single ln() sees the identical
#: IEEE double in both engines (shared expression text; casts of
#: >2^53 integers round half-even identically).
_QL_TERM_MICRO = (
    "CAST(floor(ln(CAST(tf * total_len + {mu} * cf AS DOUBLE)"
    " / CAST(total_len * (dl + {mu}) AS DOUBLE)) * 1000000) AS BIGINT)"
).format(mu=_QL_MU)


@register(
    "search_query_likelihood_lm",
    f"""
    WITH q(query_id, term) AS (VALUES {_QUERY_VALUES}),
    docs AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    dld AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM docs),
    stats AS (SELECT CAST(sum(dl) AS BIGINT) AS total_len FROM dld),
    tokens AS (SELECT doc_id, dl, unnest(toks) AS term FROM dld),
    tf AS (
      SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
      FROM tokens
      WHERE term IN (SELECT DISTINCT term FROM q)
      GROUP BY 1, 2, 3
    ),
    cfs AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
    cand AS (
      SELECT DISTINCT q.query_id, t.doc_id, t.dl
      FROM tf t JOIN q ON t.term = q.term
    ),
    grid AS (
      SELECT c.query_id, c.doc_id, c.dl, q.term
      FROM cand c JOIN q ON q.query_id = c.query_id
    ),
    scored AS (
      SELECT g.query_id, g.doc_id,
             CAST(coalesce(t.tf, 0) AS BIGINT) AS tf, g.dl,
             f.cf, s.total_len
      FROM grid g
      LEFT JOIN tf t ON t.doc_id = g.doc_id AND t.term = g.term
      JOIN cfs f ON f.term = g.term
      CROSS JOIN stats s
    ),
    per_query AS (
      SELECT query_id, doc_id,
             CAST(sum({_QL_TERM_MICRO}) AS BIGINT) AS score_micro
      FROM scored GROUP BY 1, 2
    )
    SELECT query_id, rank, doc_id, score_micro
    FROM (
      SELECT query_id, doc_id, score_micro,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
      FROM per_query
    )
    WHERE rank <= {TOP_K}
    """,
    doc=(
        "Query-likelihood retrieval under a Dirichlet-smoothed unigram "
        f"LM (mu={_QL_MU}) — the probabilistic-ranking complement to "
        "BM25 over the same query panel: candidates are docs matching "
        ">=1 query term, but every query term contributes its "
        "background-smoothed log-probability (absent terms score the "
        "collection model), so long documents aren't rewarded for "
        "partial matches the way tf-only scoring would. Each term "
        "log is ln() of a rational of exact integers, floored to "
        "micros — the engine-exact ln recipe shared with the "
        "Kneser-Ney and bigram-LM queries."
    ),
)
def search_query_likelihood_lm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-k docs per query by Dirichlet query-likelihood (micros).

    Scale notes (100 TB): the broadcast query vocabulary prunes the
    exploded token stream BEFORE any shuffle (same as BM25), so tf,
    cf and the candidate set are all bounded by matching docs; the
    candidate x query-term grid multiplies candidates by ~3 terms,
    never the corpus. Corpus stats are a 1-row broadcast. Top-k is a
    rank window partitioned by query over matching docs only."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.expr(
            "filter(split(lower(text), '\\\\s+'), t -> t <> '')"
        ).alias("toks"),
    )
    dld = toks.select(
        "doc_id", F.expr("CAST(size(toks) AS BIGINT)").alias("dl"), "toks"
    )
    stats = dld.agg(F.sum("dl").cast("bigint").alias("total_len"))
    qterms = spark.range(1).selectExpr(
        f"stack({len(QUERIES)}, "
        + ", ".join(f"{q}, '{t}'" for q, t in QUERIES)
        + ") AS (query_id, term)"
    )
    qvocab = qterms.select("term").distinct()
    tf = (
        dld.select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(qvocab), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .localCheckpoint(eager=False)  # matching-docs grain, 3 consumers
    )
    cfs = tf.groupBy("term").agg(F.sum("tf").cast("bigint").alias("cf"))
    cand = (
        tf.join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id", "dl")
        .distinct()
    )
    grid = cand.join(F.broadcast(qterms), "query_id")
    scored = (
        grid.join(
            tf.select("doc_id", "term", "tf"), ["doc_id", "term"], "left"
        )
        .withColumn("tf", F.expr("CAST(coalesce(tf, 0) AS BIGINT)"))
        .join(F.broadcast(cfs), "term")
        .crossJoin(F.broadcast(stats))
    )
    per_query = scored.groupBy("query_id", "doc_id").agg(
        F.expr(f"CAST(sum({_QL_TERM_MICRO}) AS BIGINT)").alias("score_micro")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        per_query.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "doc_id", "score_micro")
    )


# ---------------------------------------------------------------------------
# Linear learning-to-rank blend (pointwise LTR over integer features)
# ---------------------------------------------------------------------------

_LTR_POOL = 10
_LTR_TOP = 10
_LTR_QL_ABSENT = -100_000_000  # sentinel micro log-prob for non-pool docs

from the_movies_db_spark.queries import REGISTRY as _REG  # noqa: E402


def _ltr_oracle() -> str:
    return f"""
    WITH bm AS ({_bm25_oracle(_LTR_POOL)}),
    ql AS ({_REG["search_query_likelihood_lm"].oracle}),
    dld AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                  t -> t <> '')) AS BIGINT) AS dl
      FROM documents
    ),
    pool AS (
      SELECT coalesce(b.query_id, q.query_id) AS query_id,
             coalesce(b.doc_id, q.doc_id) AS doc_id,
             CAST(coalesce(b.score_milli, 0) AS BIGINT) AS bm25_milli,
             CAST(coalesce(q.score_micro, {_LTR_QL_ABSENT}) AS BIGINT)
               AS ql_micro
      FROM bm b FULL OUTER JOIN ql q
        ON b.query_id = q.query_id AND b.doc_id = q.doc_id
    ),
    feat AS (
      SELECT p.query_id, p.doc_id, p.bm25_milli, p.ql_micro, d.dl,
             CAST(5 * p.bm25_milli + p.ql_micro // 1000 - d.dl AS BIGINT)
               AS blend_score
      FROM pool p JOIN dld d ON p.doc_id = d.doc_id
    )
    SELECT query_id, rank, doc_id, bm25_milli, ql_micro, dl, blend_score
    FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY blend_score DESC, doc_id) AS BIGINT) AS rank
      FROM feat
    ) t WHERE rank <= {_LTR_TOP}
    ORDER BY query_id, rank
    """


@register(
    "search_ltr_blend",
    _ltr_oracle(),
    doc=(
        "Pointwise linear learning-to-rank: per (query, doc) candidate "
        "an integer feature vector — BM25 milli score, Dirichlet "
        "query-likelihood micro score (sentinel for non-pool docs), "
        "document length — scored by a fixed linear model "
        "(5*bm25 + ql/1000 - dl) and re-ranked. The candidate pool is "
        "the UNION of both retrievers' top-k (full outer join), the "
        "production LTR shape: cheap retrievers generate, one linear "
        "pass re-scores; every feature and the blend are exact BIGINTs."
    ),
)
def search_ltr_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear blend re-ranking over the union candidate pool.

    Scale notes (100 TB): both pools are bounded top-k per query (the
    expensive parts are each retriever's already-pruned plan); the
    fusion join and re-rank touch 2 x POOL rows per query. dl joins
    from the doc-grain projection (broadcast at dim scale, shuffled
    equi-join past it)."""
    d = load_table(spark, sf_dir, "documents")
    bm = bm25_topk(spark, d, top_k=_LTR_POOL).select(
        "query_id", "doc_id", F.col("score_milli").alias("bm25_milli")
    )
    ql = _REG["search_query_likelihood_lm"].spark(spark, sf_dir).select(
        F.col("query_id").alias("ql_query_id"),
        F.col("doc_id").alias("ql_doc_id"),
        F.col("score_micro").alias("ql_micro"),
    )
    pool = (
        bm.join(
            ql,
            (F.col("query_id") == F.col("ql_query_id"))
            & (F.col("doc_id") == F.col("ql_doc_id")),
            "full_outer",
        )
        .select(
            F.coalesce("query_id", "ql_query_id").alias("query_id"),
            F.coalesce("doc_id", "ql_doc_id").alias("doc_id"),
            F.coalesce("bm25_milli", F.lit(0)).cast("bigint")
            .alias("bm25_milli"),
            F.coalesce("ql_micro", F.lit(_LTR_QL_ABSENT)).cast("bigint")
            .alias("ql_micro"),
        )
    )
    dld = d.select(
        "doc_id",
        F.expr(
            "CAST(size(filter(split(lower(text), '\\\\s+'),"
            " t -> t <> '')) AS BIGINT)"
        ).alias("dl"),
    )
    feat = pool.join(dld, "doc_id").withColumn(
        "blend_score",
        F.expr("CAST(5 * bm25_milli + ql_micro div 1000 - dl AS BIGINT)"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("blend_score"), F.asc("doc_id")
    )
    return (
        feat.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _LTR_TOP)
        .select(
            F.col("query_id").cast("bigint"), "rank",
            F.col("doc_id").cast("bigint"),
            "bm25_milli", "ql_micro", "dl", "blend_score",
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Team-draft interleaving evaluation: BM25 vs query-likelihood
# ---------------------------------------------------------------------------

_TDI_ROUNDS = 5

#: One draft round as a fold step: the md5-derandomized coin picks the
#: first drafter; each team then drafts its highest-ranked doc not yet
#: interleaved. State = (interleaved list, per-team credited docs).
_TDI_FOLD = f"""aggregate(
  sequence(1, {_TDI_ROUNDS}),
  struct(CAST(array() AS ARRAY<BIGINT>) AS L,
         CAST(array() AS ARRAY<BIGINT>) AS ca,
         CAST(array() AS ARRAY<BIGINT>) AS cb),
  (st, r) -> CASE WHEN (CAST(conv(substr(md5(concat(CAST(query_id AS STRING), ':', CAST(r AS STRING))), 1, 1), 16, 10) AS BIGINT) % 2) = 1
    THEN struct((CASE WHEN try_element_at(filter(b, x -> NOT array_contains((CASE WHEN try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.L, array(try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1))) ELSE st.L END), x)), 1) IS NOT NULL THEN concat((CASE WHEN try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.L, array(try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1))) ELSE st.L END), array(try_element_at(filter(b, x -> NOT array_contains((CASE WHEN try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.L, array(try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1))) ELSE st.L END), x)), 1))) ELSE (CASE WHEN try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.L, array(try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1))) ELSE st.L END) END) AS L, (CASE WHEN try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.ca, array(try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1))) ELSE st.ca END) AS ca, (CASE WHEN try_element_at(filter(b, x -> NOT array_contains((CASE WHEN try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.L, array(try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1))) ELSE st.L END), x)), 1) IS NOT NULL THEN concat(st.cb, array(try_element_at(filter(b, x -> NOT array_contains((CASE WHEN try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.L, array(try_element_at(filter(a, x -> NOT array_contains(st.L, x)), 1))) ELSE st.L END), x)), 1))) ELSE st.cb END) AS cb)
    ELSE struct((CASE WHEN try_element_at(filter(a, x -> NOT array_contains((CASE WHEN try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.L, array(try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1))) ELSE st.L END), x)), 1) IS NOT NULL THEN concat((CASE WHEN try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.L, array(try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1))) ELSE st.L END), array(try_element_at(filter(a, x -> NOT array_contains((CASE WHEN try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.L, array(try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1))) ELSE st.L END), x)), 1))) ELSE (CASE WHEN try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.L, array(try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1))) ELSE st.L END) END) AS L, (CASE WHEN try_element_at(filter(a, x -> NOT array_contains((CASE WHEN try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.L, array(try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1))) ELSE st.L END), x)), 1) IS NOT NULL THEN concat(st.ca, array(try_element_at(filter(a, x -> NOT array_contains((CASE WHEN try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.L, array(try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1))) ELSE st.L END), x)), 1))) ELSE st.ca END) AS ca, (CASE WHEN try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1) IS NOT NULL THEN concat(st.cb, array(try_element_at(filter(b, x -> NOT array_contains(st.L, x)), 1))) ELSE st.cb END) AS cb) END,
  st -> st)"""


def _tdi_oracle() -> str:
    return """
    WITH RECURSIVE bm AS ({bm}),
    ql AS ({ql}),
    q(query_id, term) AS (VALUES {qv}),
    qa AS (SELECT query_id, list(doc_id ORDER BY rank) AS a
           FROM bm GROUP BY 1),
    qb AS (SELECT query_id, list(doc_id ORDER BY rank) AS b
           FROM ql GROUP BY 1),
    qq AS (SELECT qa.query_id, a, b FROM qa JOIN qb USING (query_id)),
    dr AS (
      SELECT query_id, 0 AS r,
             []::BIGINT[] AS L, []::BIGINT[] AS ca, []::BIGINT[] AS cb,
             a, b
      FROM qq
      UNION ALL
      SELECT query_id, r + 1 AS r,
             CASE WHEN d2 IS NOT NULL THEN list_append(L1, d2)
                  ELSE L1 END AS L,
             CASE WHEN afirst THEN
                    CASE WHEN d1 IS NOT NULL THEN list_append(ca, d1)
                         ELSE ca END
                  ELSE
                    CASE WHEN d2 IS NOT NULL THEN list_append(ca, d2)
                         ELSE ca END END AS ca,
             CASE WHEN afirst THEN
                    CASE WHEN d2 IS NOT NULL THEN list_append(cb, d2)
                         ELSE cb END
                  ELSE
                    CASE WHEN d1 IS NOT NULL THEN list_append(cb, d1)
                         ELSE cb END END AS cb,
             a, b
      FROM (
        SELECT *,
               CASE WHEN afirst THEN
                      list_filter(b, x -> NOT list_contains(L1, x))[1]
                    ELSE
                      list_filter(a, x -> NOT list_contains(L1, x))[1]
                    END AS d2
        FROM (
          SELECT *,
                 CASE WHEN d1 IS NOT NULL THEN list_append(L, d1)
                      ELSE L END AS L1
          FROM (
            SELECT *,
                   CASE WHEN afirst THEN
                          list_filter(a, x -> NOT list_contains(L, x))[1]
                        ELSE
                          list_filter(b, x -> NOT list_contains(L, x))[1]
                        END AS d1
            FROM (SELECT dr.*, (CAST('0x' || substr(md5(query_id || ':' || (r + 1)), 1, 1) AS BIGINT) % 2) = 1 AS afirst FROM dr)
          )
        )
      ) t
      WHERE r < {rounds}
    ),
    fin AS (SELECT query_id, L, ca, cb FROM dr WHERE r = {rounds}),
    pres AS (
      SELECT DISTINCT doc_id, t AS term
      FROM (SELECT doc_id,
                   unnest(list_filter(
                     regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '')) AS t
            FROM documents) u
    ),
    rel AS (
      SELECT q.query_id, p.doc_id, CAST(count(*) AS BIGINT) AS rel
      FROM pres p JOIN q ON p.term = q.term
      GROUP BY 1, 2
    ),
    att AS (
      SELECT query_id, unnest(ca) AS doc_id, 'bm25' AS team FROM fin
      UNION ALL
      SELECT query_id, unnest(cb) AS doc_id, 'ql' AS team FROM fin
    ),
    j AS (
      SELECT a.query_id, a.team, coalesce(r.rel, 0) AS rel
      FROM att a LEFT JOIN rel r
        ON a.query_id = r.query_id AND a.doc_id = r.doc_id
    ),
    agg AS (
      SELECT query_id,
             CAST(count(*) FILTER (WHERE team = 'bm25' AND rel >= 2)
               AS BIGINT) AS clicks_bm25,
             CAST(count(*) FILTER (WHERE team = 'ql' AND rel >= 2)
               AS BIGINT) AS clicks_ql,
             CAST(sum(rel) FILTER (WHERE team = 'bm25')
               AS BIGINT) AS rel_bm25,
             CAST(sum(rel) FILTER (WHERE team = 'ql')
               AS BIGINT) AS rel_ql
      FROM j GROUP BY 1
    )
    SELECT CAST(f.query_id AS BIGINT) AS query_id,
           CAST(len(f.L) AS BIGINT) AS n_interleaved,
           g.clicks_bm25, g.clicks_ql, g.rel_bm25, g.rel_ql,
           CASE WHEN g.clicks_bm25 > g.clicks_ql THEN 'bm25'
                WHEN g.clicks_bm25 < g.clicks_ql THEN 'ql'
                WHEN g.rel_bm25 > g.rel_ql THEN 'bm25'
                WHEN g.rel_bm25 < g.rel_ql THEN 'ql'
                ELSE 'tie' END AS winner
    FROM fin f JOIN agg g ON f.query_id = g.query_id
    ORDER BY query_id
""".format(
        bm=_bm25_oracle(_TDI_ROUNDS),
        ql=_REG["search_query_likelihood_lm"].oracle,
        qv=_QUERY_VALUES,
        rounds=_TDI_ROUNDS,
    )


@register(
    "search_interleaving_eval",
    _tdi_oracle(),
    doc=(
        "Team-draft interleaving between the BM25 and query-likelihood "
        "rankers: per round an md5-derandomized coin picks the first "
        "drafter, each team drafts its best not-yet-interleaved doc "
        "from its top-5, and a graded-relevance click model (click iff "
        ">= 2 query terms present) credits each team's drafts — the "
        "online-evaluation protocol that decides ranker rollouts from "
        "interleaved SERP clicks, made deterministic so both engines "
        "replay the identical draft."
    ),
)
def search_interleaving_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic team-draft interleaving + click-credit eval.

    Scale notes (100 TB): both rankers already prune to the broadcast
    query vocabulary before any shuffle; their top-5 lists collapse to
    |Q| rows, so the draft fold runs on a |Q|-row frame (per-query
    arrays of <= 10 ids) — the sequential protocol costs nothing at
    scale because it runs AFTER retrieval, on list-grain state. The
    relevance table is the vocab-pruned presence stream, lazily
    checkpointed across its two consumers."""
    d = load_table(spark, sf_dir, "documents")
    bm = bm25_topk(spark, d, top_k=_TDI_ROUNDS)
    ql = _REG["search_query_likelihood_lm"].spark(spark, sf_dir)
    qa = bm.groupBy("query_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(rank, doc_id)))"
            ", e -> CAST(e.doc_id AS BIGINT))"
        ).alias("a")
    )
    qb = ql.groupBy("query_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(rank, doc_id)))"
            ", e -> CAST(e.doc_id AS BIGINT))"
        ).alias("b")
    )
    fin = (
        qa.join(qb, "query_id")
        .select("query_id", F.expr(_TDI_FOLD).alias("st"))
        .select(
            "query_id",
            F.col("st.L").alias("L"),
            F.col("st.ca").alias("ca"),
            F.col("st.cb").alias("cb"),
        )
        .localCheckpoint(eager=False)  # |Q| rows, 2 consumers
    )
    qterms = spark.createDataFrame(
        list(QUERIES), "query_id int, term string"
    )
    pres = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr("filter(split(lower(text), '\\\\s+'), x -> x != '')")
            )
        ).alias("term"),
    )
    rel = (
        pres.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rel"))
    )
    att = fin.select(
        "query_id", F.explode("ca").alias("doc_id"),
        F.lit("bm25").alias("team"),
    ).unionByName(
        fin.select(
            "query_id", F.explode("cb").alias("doc_id"),
            F.lit("ql").alias("team"),
        )
    )
    j = att.join(rel, ["query_id", "doc_id"], "left").select(
        "query_id", "team",
        F.expr("CAST(coalesce(rel, 0) AS BIGINT)").alias("rel"),
    )
    agg = j.groupBy("query_id").agg(
        F.expr(
            "CAST(count_if(team = 'bm25' AND rel >= 2) AS BIGINT)"
        ).alias("clicks_bm25"),
        F.expr(
            "CAST(count_if(team = 'ql' AND rel >= 2) AS BIGINT)"
        ).alias("clicks_ql"),
        F.expr(
            "CAST(sum(CASE WHEN team = 'bm25' THEN rel END) AS BIGINT)"
        ).alias("rel_bm25"),
        F.expr(
            "CAST(sum(CASE WHEN team = 'ql' THEN rel END) AS BIGINT)"
        ).alias("rel_ql"),
    )
    return (
        fin.join(agg, "query_id")
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.expr("CAST(size(L) AS BIGINT)").alias("n_interleaved"),
            "clicks_bm25", "clicks_ql", "rel_bm25", "rel_ql",
            F.expr(
                "CASE WHEN clicks_bm25 > clicks_ql THEN 'bm25'"
                " WHEN clicks_bm25 < clicks_ql THEN 'ql'"
                " WHEN rel_bm25 > rel_ql THEN 'bm25'"
                " WHEN rel_bm25 < rel_ql THEN 'ql'"
                " ELSE 'tie' END"
            ).alias("winner"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Pre-retrieval query-difficulty prediction vs realized nDCG
# ---------------------------------------------------------------------------


@register(
    "search_difficulty_prediction",
    f"""
    WITH q(query_id, term) AS (VALUES {_QUERY_VALUES}),
    docs AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs),
    tokens AS (SELECT doc_id, unnest(toks) AS term FROM docs),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tokens WHERE term IN (SELECT DISTINCT term FROM q)
      GROUP BY 1, 2
    ),
    termstats AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS cf
      FROM tf GROUP BY 1
    ),
    pred AS (
      SELECT qq.query_id,
             CAST(count(*) AS BIGINT) AS n_terms,
             CAST(sum({_IDF_MILLI}) // count(*) AS BIGINT)
               AS avg_idf_milli,
             CAST(sum(df) AS BIGINT) AS sum_df,
             CAST(sum(cf) AS BIGINT) AS sum_cf
      FROM q qq JOIN termstats t ON qq.term = t.term CROSS JOIN stats
      GROUP BY 1
    ),
    nd AS ({_NDCG_ORACLE}),
    ranked AS (
      SELECT p.query_id, p.n_terms, p.avg_idf_milli, p.sum_df, p.sum_cf,
             n.ndcg_ppm,
             CAST(row_number() OVER (ORDER BY p.avg_idf_milli DESC,
               p.query_id) AS BIGINT) AS predicted_rank,
             CAST(row_number() OVER (ORDER BY n.ndcg_ppm DESC,
               p.query_id) AS BIGINT) AS actual_rank
      FROM pred p JOIN nd n ON p.query_id = n.query_id
    )
    SELECT query_id, n_terms, avg_idf_milli, sum_df, sum_cf, ndcg_ppm,
           predicted_rank, actual_rank,
           CASE WHEN predicted_rank = actual_rank THEN 1 ELSE 0 END
             AS rank_agrees
    FROM ranked ORDER BY query_id
    """,
    doc=(
        "Pre-retrieval query-difficulty prediction: per query the IDF "
        "profile of its terms (avg IDF, document and collection "
        "frequencies — the SCQ/IDF predictor family that needs NO "
        "retrieval run) joined against the realized nDCG@10, with the "
        "predicted vs actual difficulty ranking side by side — the "
        "signal a search service uses to route hard queries to deeper "
        "pools or re-ranking BEFORE spending retrieval cost on them. "
        "IDF reuses the BM25 milli formula, so every number is "
        "engine-exact."
    ),
)
def search_difficulty_prediction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IDF-profile difficulty predictors vs realized nDCG (3 rows).

    Scale notes (100 TB): the predictor side is the vocab-pruned term
    census (broadcast query terms filter the token stream BEFORE any
    shuffle) — |terms| rows; the nDCG leg is the existing eval
    pipeline; the comparison is a 3-row window."""
    d = load_table(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(list(QUERIES), "query_id int, term string")
    qvocab = qterms.select("term").distinct()
    toks = d.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')")
        ).alias("term"),
    )
    tf = (
        toks.join(F.broadcast(qvocab), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    termstats = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("cf"),
    )
    stats = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    pred = (
        F.broadcast(qterms)
        .join(termstats, "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.expr(
                f"CAST(sum({_IDF_MILLI}) div count(*) AS BIGINT)"
            ).alias("avg_idf_milli"),
            F.sum("df").cast("bigint").alias("sum_df"),
            F.sum("cf").cast("bigint").alias("sum_cf"),
        )
    )
    nd = _REG["search_ndcg_eval"].spark(spark, sf_dir).select(
        "query_id", "ndcg_ppm"
    )
    joined = pred.join(nd, "query_id")
    wp = Window.orderBy(F.desc("avg_idf_milli"), F.asc("query_id"))
    wa = Window.orderBy(F.desc("ndcg_ppm"), F.asc("query_id"))
    return (
        joined.withColumn(
            "predicted_rank", F.row_number().over(wp).cast("bigint")
        )
        .withColumn("actual_rank", F.row_number().over(wa).cast("bigint"))
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            "n_terms", "avg_idf_milli", "sum_df", "sum_cf", "ndcg_ppm",
            "predicted_rank", "actual_rank",
            F.expr(
                "CASE WHEN predicted_rank = actual_rank THEN 1 ELSE 0 END"
            ).alias("rank_agrees"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback (RM3) — round 13
# ---------------------------------------------------------------------------

_RM3_FB = 10    # feedback pool depth
_RM3_EXP = 5    # expansion terms per query
_RM3_TOPK = 5   # final cutoff; interpolation = (6*orig + 4*exp) / 10

_RM3_ORACLE = f"""
WITH orig AS MATERIALIZED ({_bm25_oracle(1099511627776)}),
fb AS (SELECT query_id, doc_id, score_milli FROM orig WHERE rank <= {_RM3_FB}),
q(query_id, term) AS (VALUES {_QUERY_VALUES}),
docs2 AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
dld2 AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM docs2),
stats2 AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT)  AS total_len
  FROM dld2
),
tokens2 AS (SELECT doc_id, dl, unnest(toks) AS term FROM dld2),
fbtf AS (
  SELECT b.query_id, t.term, t.doc_id, t.dl, b.score_milli,
         CAST(count(*) AS BIGINT) AS tf
  FROM tokens2 t JOIN fb b ON t.doc_id = b.doc_id
  GROUP BY 1, 2, 3, 4, 5
),
rw AS (
  SELECT query_id, term,
         CAST(sum(tf * 1000 * score_milli // dl) AS BIGINT) AS rw_milli
  FROM fbtf f
  WHERE length(term) >= 3
    AND NOT EXISTS (SELECT 1 FROM q
                    WHERE q.query_id = f.query_id AND q.term = f.term)
  GROUP BY 1, 2
),
expn AS MATERIALIZED (
  SELECT query_id, term, rw_milli FROM (
    SELECT query_id, term, rw_milli,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rw_milli DESC, term) AS rn
    FROM rw
  ) WHERE rn <= {_RM3_EXP}
),
tf2 AS (
  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM tokens2
  WHERE term IN (SELECT DISTINCT term FROM expn)
  GROUP BY 1, 2, 3
),
dfs2 AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf2 GROUP BY 1),
scored2 AS (
  SELECT t.doc_id, t.term,
         {_IDF_MILLI} AS idf_milli,
         t.tf, t.dl, s.n_docs, s.total_len
  FROM tf2 t JOIN dfs2 d USING (term) CROSS JOIN stats2 s
),
contrib2 AS (
  SELECT doc_id, term,
         {_SCORE_TERM.format(div='//')} AS score_term
  FROM scored2
),
expscore AS (
  SELECT e.query_id, c.doc_id,
         CAST(sum(c.score_term) AS BIGINT) AS exp_milli
  FROM contrib2 c JOIN expn e ON c.term = e.term
  GROUP BY 1, 2
),
fused AS (
  SELECT coalesce(o.query_id, e.query_id) AS query_id,
         coalesce(o.doc_id, e.doc_id) AS doc_id,
         CAST(coalesce(o.score_milli, 0) AS BIGINT) AS orig_milli,
         CAST(coalesce(e.exp_milli, 0) AS BIGINT) AS exp_milli
  FROM orig o FULL JOIN expscore e
    ON o.query_id = e.query_id AND o.doc_id = e.doc_id
)
SELECT query_id, rank, doc_id, final_milli, orig_milli, exp_milli
FROM (
  SELECT query_id, doc_id, orig_milli, exp_milli,
         CAST((6 * orig_milli + 4 * exp_milli) // 10 AS BIGINT)
           AS final_milli,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY (6 * orig_milli + 4 * exp_milli) // 10 DESC, doc_id
         ) AS BIGINT) AS rank
  FROM fused
) WHERE rank <= {_RM3_TOPK}
"""


@register(
    "search_prf_rm3",
    _RM3_ORACLE,
    doc=(
        "RM3 pseudo-relevance feedback: the BM25 top-10 per query "
        "becomes the feedback set; each feedback-doc term earns the "
        "relevance-model weight sum(tf*1000*score/dl) (per-doc floor, "
        "exact BIGINT), original query terms and <3-char tokens are "
        "excluded, the top-5 expansion terms are re-scored against "
        "the corpus with the same exact-integer BM25, and the final "
        "ranking interpolates (6*orig + 4*exp)/10 — the classic "
        "two-pass query-expansion retrieval loop, fully oracle-exact."
    ),
)
def search_prf_rm3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass RM3 retrieval: feedback -> expansion -> re-retrieval.

    Scale notes (100 TB): pass 1 is the pruned BM25 plan (broadcast
    query vocab filters the token stream pre-shuffle); the feedback
    table (30 rows) and expansion table (15 rows) are lazily
    checkpointed so downstream branches never re-run pass 1; pass 2
    joins the token stream against the BROADCAST expansion vocabulary
    — shuffle volume stays O(docs containing any expansion term). The
    orig score table is re-derived once for the final fusion (two
    corpus passes total, both vocab-pruned); the full-outer fusion
    join is keyed on (query, doc) over vocab-bounded score tables."""
    d0 = load_table(spark, sf_dir, "documents")
    orig = bm25_scores(spark, d0)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_milli"), F.asc("doc_id")
    )
    fb = (
        orig.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _RM3_FB)
        .select("query_id", "doc_id", "score_milli")
        .localCheckpoint(eager=False)
    )
    d = d0.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "").alias(
            "toks"
        ),
    ).select("doc_id", "toks", F.size("toks").cast("bigint").alias("dl"))
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    tokens = d.select("doc_id", "dl", F.explode("toks").alias("term"))
    qterms = spark.createDataFrame(list(QUERIES), "query_id int, term string")
    fbtf = (
        tokens.join(F.broadcast(fb), "doc_id")
        .groupBy("query_id", "term", "doc_id", "dl", "score_milli")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    rw = (
        fbtf.filter(F.length("term") >= 3)
        .join(F.broadcast(qterms), ["query_id", "term"], "left_anti")
        .groupBy("query_id", "term")
        .agg(
            F.sum(F.expr("tf * 1000 * score_milli div dl"))
            .cast("bigint")
            .alias("rw_milli")
        )
    )
    we = Window.partitionBy("query_id").orderBy(
        F.desc("rw_milli"), F.asc("term")
    )
    expn = (
        rw.withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= _RM3_EXP)
        .select("query_id", "term", "rw_milli")
        .localCheckpoint(eager=False)
    )
    vocab2 = expn.select("term").distinct()
    tf2 = (
        tokens.join(F.broadcast(vocab2), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_w = F.count(F.lit(1)).over(Window.partitionBy("term")).cast("bigint")
    scored2 = (
        tf2.withColumn("df", df_w)
        .join(F.broadcast(stats))
        .withColumn("idf_milli", F.expr(_IDF_MILLI))
        .withColumn("score_term", F.expr(_SCORE_TERM.format(div="div")))
    )
    expscore = (
        scored2.join(F.broadcast(expn.select("query_id", "term")), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score_term").cast("bigint").alias("exp_milli"))
    )
    fused = (
        orig.select(
            "query_id", "doc_id", F.col("score_milli").alias("orig_milli")
        )
        .join(expscore, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce("orig_milli", F.lit(0)).cast("bigint").alias(
                "orig_milli"
            ),
            F.coalesce("exp_milli", F.lit(0)).cast("bigint").alias(
                "exp_milli"
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("final_milli"), F.asc("doc_id")
    )
    return (
        fused.withColumn(
            "final_milli",
            F.expr("(6 * orig_milli + 4 * exp_milli) div 10").cast("bigint"),
        )
        .withColumn("rank", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("rank") <= _RM3_TOPK)
        .select(
            "query_id", "rank", "doc_id", "final_milli",
            "orig_milli", "exp_milli",
        )
    )


# ---------------------------------------------------------------------------
# BM25F field-weighted retrieval — round 13
# ---------------------------------------------------------------------------

_F_TITLE_LEN = 10   # pseudo-title = first 10 tokens
_F_W_TITLE = 2      # title weight (body weight 1)
_BM25F_TOPK = 5

_BM25F_ORACLE = f"""
WITH q(query_id, term) AS (VALUES {_QUERY_VALUES}),
docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
tokens AS (
  SELECT doc_id, unnest(toks) AS term,
         CASE WHEN generate_subscripts(toks, 1) <= {_F_TITLE_LEN}
              THEN {_F_W_TITLE} ELSE 1 END AS w
  FROM docs
),
dld AS (
  SELECT doc_id, CAST(sum(w) AS BIGINT) AS dl FROM tokens GROUP BY 1
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT)  AS total_len
  FROM dld
),
tf AS (
  SELECT t.doc_id, d.dl, t.term, CAST(sum(t.w) AS BIGINT) AS tf
  FROM tokens t JOIN dld d ON t.doc_id = d.doc_id
  WHERE t.term IN (SELECT DISTINCT term FROM q)
  GROUP BY 1, 2, 3
),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT t.doc_id, t.term,
         {_IDF_MILLI} AS idf_milli,
         t.tf, t.dl, s.n_docs, s.total_len
  FROM tf t JOIN dfs d USING (term) CROSS JOIN stats s
),
contrib AS (
  SELECT doc_id, term,
         {_SCORE_TERM.format(div='//')} AS score_term
  FROM scored
),
per_query AS (
  SELECT q.query_id, c.doc_id,
         CAST(sum(c.score_term) AS BIGINT) AS score_milli
  FROM contrib c JOIN q ON c.term = q.term
  GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score_milli
FROM (
  SELECT query_id, doc_id, score_milli,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_milli DESC, doc_id)
              AS BIGINT) AS rank
  FROM per_query
)
WHERE rank <= {_BM25F_TOPK}
"""


@register(
    "search_bm25f",
    _BM25F_ORACLE,
    doc=(
        "BM25F field-weighted retrieval (Robertson's simple BM25F = "
        "BM25 over the virtual document with fields repeated by "
        "weight): the pseudo-title (first 10 tokens) carries weight "
        "2, the body 1 — tf and document length become WEIGHTED sums "
        "while df stays presence-based, and the identical exact-"
        "BIGINT rational scores the result. The virtual-document "
        "equivalence is pinned in pytest by literally duplicating "
        "title tokens and running plain BM25."
    ),
)
def search_bm25f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-weighted BM25 via weighted token stream, top-5.

    Scale notes (100 TB): same shape as search_bm25_topk — the
    broadcast query vocabulary prunes the posexploded token stream
    before the tf shuffle; weights ride the rows as a projection, so
    field weighting costs nothing over plain BM25."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.filter(
                F.split(F.lower("text"), r"\s+"), lambda t: t != ""
            ).alias("toks"),
        )
    )
    tokens = d.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).select(
        "doc_id",
        "term",
        F.expr(
            f"CASE WHEN pos < {_F_TITLE_LEN} THEN {_F_W_TITLE}"
            " ELSE 1 END"
        ).alias("w"),
    )
    dld = tokens.groupBy("doc_id").agg(
        F.sum("w").cast("bigint").alias("dl")
    )
    stats = dld.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    qterms = spark.createDataFrame(list(QUERIES), "query_id int, term string")
    vocab = qterms.select("term").distinct()
    tf = (
        tokens.join(F.broadcast(vocab), "term")
        .join(dld, "doc_id")
        .groupBy("doc_id", "dl", "term")
        .agg(F.sum("w").cast("bigint").alias("tf"))
    )
    df_w = F.count(F.lit(1)).over(Window.partitionBy("term")).cast("bigint")
    scored = (
        tf.withColumn("df", df_w)
        .join(F.broadcast(stats))
        .withColumn("idf_milli", F.expr(_IDF_MILLI))
        .withColumn("score_term", F.expr(_SCORE_TERM.format(div="div")))
    )
    per_query = (
        scored.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score_term").cast("bigint").alias("score_milli"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_milli"), F.asc("doc_id")
    )
    return (
        per_query.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _BM25F_TOPK)
        .select("query_id", "rank", "doc_id", "score_milli")
    )
