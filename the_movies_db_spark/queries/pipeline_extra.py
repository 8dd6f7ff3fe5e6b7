"""Pipeline-operator surface a production loader needs beyond MERGE:
CDC changelog application, data-quality expectation checks, and
winnowing document fingerprints (MOSS-style k-gram selection).

All three are pure-expression plans with exact DuckDB oracle mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table, spread
from the_movies_db_spark.queries import register


@register(
    "cdc_apply",
    """
    WITH log AS (
      SELECT o_orderkey AS key, 1 AS seq, 'I' AS op,
             round(o_totalprice, 2) AS price, o_orderstatus AS status
      FROM orders
      UNION ALL
      SELECT o_orderkey, 2,
             CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END,
             ((CAST(round(o_totalprice * 100) AS BIGINT) * 110) // 100) / 100.0,
             o_orderstatus
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    latest AS (
      SELECT key, seq, op, price, status,
             row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
      FROM log
    )
    SELECT key, op AS last_op, price, status
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
    doc=(
        "CDC changelog application (Debezium-shaped I/U/D ops with a "
        "sequence number): latest op per key wins, deletes drop the row "
        "— one shuffle on key, the op every lakehouse ingest runs. The "
        "changelog here is synthesized deterministically from orders so "
        "the apply semantics are value-hash-verified."
    ),
)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    snap = o.select(
        F.col("o_orderkey").alias("key"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.round("o_totalprice", 2).alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    # +10% computed in integer cents (floor division), never float*1.1 —
    # rounding a float product to 2 decimals diverges between engines at
    # representation boundaries; integer arithmetic cannot
    bumped = (
        F.expr("(CAST(round(o_totalprice * 100) AS BIGINT) * 110) div 100")
        / F.lit(100.0)
    ).alias("price")
    changes = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.lit(2).alias("seq"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        bumped,
        F.col("o_orderstatus").alias("status"),
    )
    log = snap.unionByName(changes)
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("key", F.col("op").alias("last_op"), "price", "status")
    )


@register(
    "dq_checks",
    """
    SELECT 'orders_orphan_custkey' AS check_name,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
             AS violations
    UNION ALL
    SELECT 'orders_pk_duplicates',
           (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
    UNION ALL
    SELECT 'lineitem_nonpositive_qty',
           (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
    UNION ALL
    SELECT 'orders_null_price',
           (SELECT count(*) FROM orders WHERE o_totalprice IS NULL)
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    """,
    doc=(
        "Data-quality expectation suite as one plan: referential "
        "integrity (anti-join counts), primary-key uniqueness, domain "
        "and null checks — the pre-publish gate of a pipeline. Each "
        "check is an independent aggregate; Spark runs them as parallel "
        "jobs over pruned scans."
    ),
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def one(name, df):
        return df.select(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).cast("bigint").alias("violations"),
        )

    orphan_orders = one(
        "orders_orphan_custkey",
        o.join(c, o.o_custkey == c.c_custkey, "left_anti"),
    )
    pk_dup = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("violations")
    ).select(F.lit("orders_pk_duplicates").alias("check_name"), "violations")
    bad_qty = one("lineitem_nonpositive_qty", li.filter(F.col("l_quantity") <= 0))
    null_price = one("orders_null_price", o.filter(F.col("o_totalprice").isNull()))
    orphan_li = one(
        "lineitem_orphan_orderkey",
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
    )
    return (
        orphan_orders.unionByName(pk_dup)
        .unionByName(bad_qty)
        .unionByName(null_price)
        .unionByName(orphan_li)
    )


@register(
    "pipeline_bloom_decontaminate",
    """
    WITH contam AS (
      SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 37 = 0
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT)      AS kept_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS kept_chars
    FROM documents d
    WHERE md5(d.text) NOT IN (SELECT digest FROM contam)
    GROUP BY d.lang
    """,
    doc=(
        "Exact-match decontamination with a Bloom prefilter (operators."
        "bloom.bloom_anti_join): the contamination set's content digests "
        "build an m-bit bitmap (distributed bit_or, 2 MiB-bounded driver "
        "collect); corpus rows test k bits as a pure scan expression, and "
        "only Bloom survivors reach the exact join. Two-phase plan: "
        "column-pruned key scan finds true hits, then ONE full-width scan "
        "broadcast-anti-joins the tiny hit set. Result is exactly the "
        "plain anti-join's, so the oracle is ordinary SQL."
    ),
)
def pipeline_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from the_movies_db_spark.operators.bloom import bloom_anti_join

    d = load_table(spark, sf_dir, "documents").withColumn(
        "digest", F.md5(F.col("text"))
    )
    contam = d.filter(F.col("doc_id") % 37 == 0).select("digest")
    clean = bloom_anti_join(d, contam, "digest")
    return clean.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("kept_docs"),
        F.sum("n_chars").cast("bigint").alias("kept_chars"),
    )


_K, _W = 4, 5  # k-gram size, winnow window


@register(
    "text_winnow",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(t) - {_K} + 1, 1) + 1),
               i -> CAST(concat('0x', substr(md5(array_to_string(t[i:i+{_K - 1}], ' ')), 1, 8)) AS BIGINT)
             ) AS hs
      FROM toks
    ),
    winnowed AS (
      SELECT doc_id,
             list_distinct(
               list_transform(range(1, greatest(len(hs) - {_W} + 1, 1) + 1),
                 i -> list_aggregate(hs[i:i+{_W - 1}], 'min'))
             ) AS fps
      FROM grams
    )
    SELECT doc_id,
           len(fps)                       AS n_fingerprints,
           list_aggregate(fps, 'min')     AS min_fp,
           list_aggregate(fps, 'max')     AS max_fp
    FROM winnowed
    """,
    doc=(
        "Winnowing fingerprints (the MOSS k-gram selection): md5-derived "
        "k-gram hashes, minimum per sliding window, distinct minima. "
        "Guarantees every shared substring of length >= w+k-1 yields a "
        "shared fingerprint, at ~2/(w+1) sampling density — the standard "
        "near-copy detector for code/text corpora. Pure expressions, "
        "value-hash-verified."
    ),
)
def text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(spread(load_table(spark, sf_dir, "documents")))
    t = F.split(F.col("text"), r"\s+")
    n_grams = F.greatest(F.size(t) - F.lit(_K - 1), F.lit(1))
    gram = lambda i: F.concat_ws(" ", F.slice(t, i, _K))  # noqa: E731
    hs = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(F.substring(F.md5(gram(i)), 1, 8), 16, 10).cast("bigint"),
    )
    staged = d.select("doc_id", hs.alias("hs"))
    n_wins = F.greatest(F.size("hs") - F.lit(_W - 1), F.lit(1))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_wins),
            lambda i: F.array_min(F.slice("hs", i, _W)),
        )
    )
    return (
        staged.select("doc_id", fps.alias("fps"))
        .select(
            "doc_id",
            F.size("fps").alias("n_fingerprints"),
            F.array_min("fps").alias("min_fp"),
            F.array_max("fps").alias("max_fp"),
        )
    )


@register(
    "events_retention_cohorts",
    """
    WITH d AS (
      SELECT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk
      FROM events
    ),
    cohort AS (SELECT user_id, min(wk) AS cohort_week FROM d GROUP BY user_id)
    SELECT c.cohort_week,
           d.wk - c.cohort_week AS week_offset,
           count(DISTINCT d.user_id) AS n_users
    FROM d JOIN cohort c ON d.user_id = c.user_id
    GROUP BY 1, 2
    """,
    doc=(
        "Retention cohort matrix: users grouped by first-activity week, "
        "distinct actives counted at each week offset. Two shuffles "
        "(cohort agg on user_id, matrix agg on cohort/offset) — the "
        "cohort side re-joins on the same user_id key, so at scale the "
        "exchange is reused rather than repeated. Week indexes are "
        "integer day arithmetic from a fixed epoch, exact in both "
        "engines."
    ),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7
        ).alias("wk"),
    )
    cohort = d.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        d.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "pipeline_snapshot_diff",
    """
    WITH a AS (
      SELECT o_orderkey AS key, round(o_totalprice, 2) AS price, o_orderstatus AS status
      FROM orders WHERE o_orderkey % 5 <> 0
    ),
    b AS (
      SELECT o_orderkey AS key,
             CASE WHEN o_orderkey % 3 = 0
                  THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 105) // 100) / 100.0
                  ELSE round(o_totalprice, 2) END AS price,
             o_orderstatus AS status
      FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT CASE WHEN a.key IS NULL THEN 'added'
                WHEN b.key IS NULL THEN 'removed'
                WHEN a.price <> b.price OR a.status <> b.status THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM a FULL OUTER JOIN b ON a.key = b.key
    GROUP BY 1
    """,
    doc=(
        "Snapshot diff (table-level CDC derivation): two versions of a "
        "table full-outer-joined on the key, every row classified as "
        "added / removed / changed / unchanged — how you derive a "
        "changelog when the source can't emit one. One co-partitioned "
        "shuffle join; the +5% price drift is computed in integer "
        "cents so both engines agree bit-for-bit."
    ),
)
def pipeline_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("key"),
        F.round("o_totalprice", 2).alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    bumped = (
        F.expr("(CAST(round(o_totalprice * 100) AS BIGINT) * 105) div 100")
        / F.lit(100.0)
    )
    b = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("key"),
        F.when(F.col("o_orderkey") % 3 == 0, bumped)
        .otherwise(F.round("o_totalprice", 2))
        .alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    j = a.alias("a").join(b.alias("b"), F.col("a.key") == F.col("b.key"), "full_outer")
    change = (
        F.when(F.col("a.key").isNull(), "added")
        .when(F.col("b.key").isNull(), "removed")
        .when(
            (F.col("a.price") != F.col("b.price"))
            | (F.col("a.status") != F.col("b.status")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        j.groupBy(change.alias("change_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )


@register(
    "cdc_scd2",
    """
    WITH v1 AS (
      SELECT o_orderkey AS key, 1 AS seq, round(o_totalprice, 2) AS price
      FROM orders
    ),
    v2 AS (
      SELECT o_orderkey, 2,
             ((CAST(round(o_totalprice * 100) AS BIGINT) * 110) // 100) / 100.0
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    v3 AS (
      SELECT o_orderkey, 3,
             ((CAST(round(o_totalprice * 100) AS BIGINT) * 120) // 100) / 100.0
      FROM orders WHERE o_orderkey % 9 = 0
    ),
    log AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3)
    SELECT key, price,
           seq AS valid_from_seq,
           CAST(coalesce(lead(seq) OVER w, 0) AS BIGINT) AS valid_to_seq,
           CAST(lead(seq) OVER w IS NULL AS BOOLEAN)     AS is_current
    FROM log
    WINDOW w AS (PARTITION BY key ORDER BY seq)
    """,
    doc=(
        "SCD-2 history derivation from a versioned changelog: one window "
        "pass (lead over the per-key version sequence) closes each row's "
        "validity interval and flags the current version — the "
        "changelog-to-history operator that complements cdc_apply "
        "(latest-wins) and upsert_scd2 (two-table merge). One shuffle on "
        "key; version bumps are integer-cents exact."
    ),
)
def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def bump(pct: int):
        # integer div of integer cents — exact by construction (never
        # floor of a double quotient), mirroring the oracle's `//`
        return F.expr(
            f"(CAST(round(o_totalprice * 100) AS BIGINT) * {100 + pct}) div 100"
        ) / F.lit(100.0)

    v1 = o.select(
        F.col("o_orderkey").alias("key"),
        F.lit(1).alias("seq"),
        F.round("o_totalprice", 2).alias("price"),
    )
    v2 = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("key"), F.lit(2).alias("seq"), bump(10).alias("price")
    )
    v3 = o.filter(F.col("o_orderkey") % 9 == 0).select(
        F.col("o_orderkey").alias("key"), F.lit(3).alias("seq"), bump(20).alias("price")
    )
    log = v1.unionByName(v2).unionByName(v3)
    w = Window.partitionBy("key").orderBy("seq")
    nxt = F.lead("seq").over(w)
    return log.select(
        "key",
        "price",
        F.col("seq").alias("valid_from_seq"),
        F.coalesce(nxt, F.lit(0)).cast("bigint").alias("valid_to_seq"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "pipeline_winsorize",
    """
    WITH ranked AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             count(*)    OVER (PARTITION BY lang) AS n
      FROM documents
    ),
    cuts AS (
      SELECT lang,
             max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT) THEN n_chars END) AS p05,
             max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN n_chars END) AS p95
      FROM ranked GROUP BY lang
    )
    SELECT d.lang,
           CAST(c.p05 AS BIGINT) AS p05,
           CAST(c.p95 AS BIGINT) AS p95,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(least(greatest(d.n_chars, c.p05), c.p95)) AS BIGINT) AS clipped_sum,
           CAST(sum(least(greatest(d.n_chars, c.p05), c.p95)) * 1000
                // count(*) AS BIGINT) AS clipped_mean_milli
    FROM documents d JOIN cuts c ON d.lang = c.lang
    GROUP BY d.lang, c.p05, c.p95
    """,
    doc=(
        "Winsorized (clipped) statistics per group: exact rank-based "
        "p05/p95 cutpoints (percentile_disc semantics — value at "
        "ceil(q*n), doc_id tie-break), outliers clipped to the cut, mean "
        "reported in exact integer millis. The cut table is |groups| "
        "rows and broadcasts back into the scan — the fact side is "
        "sorted only within the rank window, never globally. The "
        "outlier-robust length profile a curation pipeline gates on."
    ),
)
def pipeline_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    ranked = d.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    cuts = ranked.groupBy("lang").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.05 * F.col("n")), F.col("n_chars"))
        ).alias("p05"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.95 * F.col("n")), F.col("n_chars"))
        ).alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("n_chars"), F.col("p05")), F.col("p95"))
    return (
        d.join(F.broadcast(cuts), "lang")
        .groupBy("lang", "p05", "p95")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(clipped).cast("bigint").alias("clipped_sum"),
        )
        .select(
            "lang",
            F.col("p05").cast("bigint").alias("p05"),
            F.col("p95").cast("bigint").alias("p95"),
            "n_docs",
            "clipped_sum",
            F.expr("(clipped_sum * 1000) div n_docs").alias(
                "clipped_mean_milli"
            ),
        )
    )


_CHUNK_W, _CHUNK_S = 32, 24  # window / stride (8-token overlap)


@register(
    "pipeline_chunk_overlap",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t,
             len(regexp_split_to_array(text, '\\s+')) AS n
      FROM documents
    ),
    p AS (
      SELECT doc_id, t, n,
             CASE WHEN n > {_CHUNK_W}
                  THEN (n - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S} + 1
                  ELSE 1 END AS n_chunks
      FROM toks
    ),
    ex AS (
      SELECT doc_id, t, n, unnest(range(0, n_chunks)) AS chunk_id FROM p
    )
    SELECT doc_id,
           CAST(chunk_id AS BIGINT)                       AS chunk_id,
           CAST(chunk_id * {_CHUNK_S} + 1 AS BIGINT)      AS start_tok,
           CAST(least({_CHUNK_W}, n - chunk_id * {_CHUNK_S}) AS BIGINT) AS n_tok,
           md5(array_to_string(
             t[chunk_id * {_CHUNK_S} + 1 : chunk_id * {_CHUNK_S} + {_CHUNK_W}],
             ' '))                                        AS chunk_md5
    FROM ex
    """,
    doc=(
        "Overlapping fixed-window chunking (window 32 tokens, stride "
        "24): the context-window prep step of a pretraining / RAG "
        "pipeline — each document explodes into its sliding token "
        "windows, with deterministic ids and an md5 of the chunk text. "
        "Pure projection + explode (no shuffle at all: chunk count and "
        "boundaries are integer arithmetic on the token array); at "
        "100 TB this runs map-side at scan speed, and the md5 column "
        "feeds exact chunk-level dedup downstream."
    ),
)
def pipeline_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), r"\s+")
    staged = d.select("doc_id", t.alias("__t"), F.size(t).alias("__n"))
    n_chunks = F.when(
        F.col("__n") > _CHUNK_W,
        F.expr(f"(__n - {_CHUNK_W} + {_CHUNK_S} - 1) div {_CHUNK_S}") + 1,
    ).otherwise(F.lit(1))
    ex = staged.withColumn("__nch", n_chunks.cast("int")).select(
        "doc_id",
        "__t",
        "__n",
        F.explode(F.sequence(F.lit(0), F.col("__nch") - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * _CHUNK_S + 1
    return ex.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        start.cast("bigint").alias("start_tok"),
        F.least(F.lit(_CHUNK_W), F.col("__n") - F.col("chunk_id") * _CHUNK_S)
        .cast("bigint")
        .alias("n_tok"),
        F.md5(F.concat_ws(" ", F.slice("__t", start, _CHUNK_W))).alias(
            "chunk_md5"
        ),
    )


_APPORTION_BUDGET = 1_000_000


@register(
    "pipeline_token_apportion",
    f"""
    WITH dom AS (
      SELECT lang, source,
             CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS tokens
      FROM documents GROUP BY lang, source
    ),
    base AS (
      SELECT lang, source, tokens,
             ({_APPORTION_BUDGET} * tokens) // (SELECT sum(tokens) FROM dom)  AS base_alloc,
             ({_APPORTION_BUDGET} * tokens) %  (SELECT sum(tokens) FROM dom)  AS remainder
      FROM dom
    ),
    ranked AS (
      SELECT lang, source, tokens, base_alloc,
             row_number() OVER (ORDER BY remainder DESC, lang, source) AS rr,
             {_APPORTION_BUDGET} - sum(base_alloc) OVER ()             AS leftover
      FROM base
    )
    SELECT lang, source, tokens,
           CAST(base_alloc + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens
    FROM ranked
    """,
    doc=(
        "Largest-remainder apportionment of a global token budget "
        "across (lang, source) domains — the exact-allocation step "
        "after domain-mixture weighting: floor shares by integer "
        "division, then the domains with the largest remainders absorb "
        "the leftover so allocations SUM EXACTLY to the budget (a "
        "training dataloader can't consume 999,997.3 tokens). Every "
        "number is BIGINT arithmetic — deterministic tie-break on "
        "(remainder, lang, source) — so the allocation value-hashes. "
        "Windows run over the ~#domains aggregate, driver-cheap at any "
        "corpus scale."
    ),
)
def pipeline_token_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from the_movies_db_spark.operators import text as T

    d = load_table(spark, sf_dir, "documents")
    dom = d.groupBy("lang", "source").agg(
        F.sum(T.token_count("text")).cast("bigint").alias("tokens")
    )
    wall = Window.partitionBy()
    base = dom.select(
        "lang",
        "source",
        "tokens",
        F.expr(
            f"({_APPORTION_BUDGET} * tokens) div sum(tokens) OVER ()"
        ).alias("base_alloc"),
        F.expr(
            f"({_APPORTION_BUDGET} * tokens) % sum(tokens) OVER ()"
        ).alias("remainder"),
    )
    ranked = base.select(
        "lang",
        "source",
        "tokens",
        "base_alloc",
        F.row_number()
        .over(Window.orderBy(F.desc("remainder"), F.asc("lang"), F.asc("source")))
        .alias("rr"),
        (F.lit(_APPORTION_BUDGET) - F.sum("base_alloc").over(wall)).alias(
            "leftover"
        ),
    )
    return ranked.select(
        "lang",
        "source",
        "tokens",
        (
            F.col("base_alloc")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_tokens"),
    )


def _curriculum_oracle() -> str:
    from the_movies_db_spark.queries.text_queries import _TOKENS, _ratio_sql

    return f"""
    WITH q AS (
      SELECT doc_id,
             len({_TOKENS}) AS n_tok,
             {_ratio_sql("en")} AS stop_r,
             list_aggregate(list_transform({_TOKENS}, t -> length(t)), 'sum')
               * 1.0 / len({_TOKENS}) AS awl,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
               * 1.0 / length(text) AS punct_r
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST((CASE WHEN n_tok BETWEEN 5 AND 5000 THEN 0.25 ELSE 0.0 END
                 + CASE WHEN stop_r >= 0.02 THEN 0.25 ELSE 0.0 END
                 + CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END
                 + CASE WHEN punct_r <= 0.2 THEN 0.25 ELSE 0.0 END) * 4
                  AS INT) AS bucket,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS skey
      FROM q
    )
    SELECT doc_id, bucket,
           CAST(row_number() OVER (ORDER BY bucket DESC, skey, doc_id)
                AS BIGINT) AS global_rank
    FROM scored
    """


@register(
    "pipeline_curriculum_order",
    _curriculum_oracle(),
    doc=(
        "Curriculum training order: quality-quartile buckets descending "
        "(cleanest data first), md5-hash shuffle within each bucket, and "
        "a GLOBAL rank assembled as broadcast bucket offsets + per-"
        "bucket row_number — never a single-partition global sort."
    ),
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order assignment.

    Curriculum learning wants high-quality documents first but shuffled
    within each quality band. The naive global
    ``row_number() OVER (ORDER BY ...)`` collapses to ONE partition at
    any scale; here the rank is two-level: per-bucket ``row_number``
    (distributed window, 5 buckets) plus each bucket's starting offset
    from a 5-row size aggregate joined back by broadcast — the same
    values, fully parallel. The shuffle key is an md5 hash, so the
    order is reproducible run-to-run and engine-to-engine (no RNG).

    Scale notes (100 TB): one projection pass to score, one windowed
    pass per bucket partition for the rank, one tiny aggregate for the
    offsets. The quality score is pure column arithmetic (exact 0.25
    steps, so bucket boundaries are engine-stable).
    """
    from the_movies_db_spark.operators import text as T

    d = spread(load_table(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id",
        (T.quality_score("text") * 4).cast("int").alias("bucket"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("skey"),
    )
    sizes = scored.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    w_off = (
        Window.orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        "bucket",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).cast("bigint").alias("off"),
    )
    w_rank = Window.partitionBy("bucket").orderBy("skey", "doc_id")
    return (
        scored.withColumn("r", F.row_number().over(w_rank).cast("bigint"))
        .join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "bucket",
            (F.col("off") + F.col("r")).cast("bigint").alias("global_rank"),
        )
    )


@register(
    "pipeline_shard_shuffle",
    """
    WITH hashed AS (
      SELECT doc_id, n_chars,
             CAST(concat('0x', substr(md5('shuffle1:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM documents
    ),
    placed AS (
      SELECT doc_id, n_chars, h % 64 AS shard,
             row_number() OVER (PARTITION BY h % 64 ORDER BY h, doc_id) AS pos
      FROM hashed
    )
    SELECT CAST(shard AS BIGINT)                        AS shard,
           CAST(count(*) AS BIGINT)                     AS n_docs,
           CAST(sum(n_chars) AS BIGINT)                 AS total_chars,
           CAST(sum(pos * doc_id) AS BIGINT)            AS order_checksum,
           CAST(min(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS first_doc
    FROM placed
    GROUP BY shard
    """,
    doc=(
        "Deterministic global corpus shuffle (the pre-training reshard): every "
        "doc hashes to a shard via seeded md5 and gets a dense intra-shard "
        "position by hash order — a reproducible random permutation with NO "
        "RNG state, so any worker can recompute any shard independently. "
        "order_checksum = sum(pos * doc_id) pins the full permutation, not "
        "just the partition sizes. Scale notes: one shuffle on the shard key; "
        "the intra-shard row_number is a per-shard window (shard count "
        "scales with the corpus, e.g. corpus_bytes / 1 GiB, so no window "
        "partition outgrows an executor; re-seeding the md5 gives epoch N's "
        "distinct permutation at identical cost)."
    ),
)
def pipeline_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("shuffle1:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    placed = (
        d.select("doc_id", "n_chars", h.alias("h"))
        .withColumn("shard", F.expr("h % 64"))
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("shard").orderBy("h", "doc_id")),
        )
    )
    return placed.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.col("pos") * F.col("doc_id")).cast("bigint").alias("order_checksum"),
        F.min(F.when(F.col("pos") == 1, F.col("doc_id"))).cast("bigint").alias("first_doc"),
    )


from the_movies_db_spark.queries import REGISTRY as _REG2  # noqa: E402


@register(
    "pipeline_chunk_dedup",
    f"""
    WITH chunks AS ({_REG2["pipeline_chunk_overlap"].oracle})
    SELECT CAST(count(*) AS BIGINT)                    AS n_chunks,
           CAST(count(DISTINCT chunk_md5) AS BIGINT)   AS n_unique,
           CAST((count(*) - count(DISTINCT chunk_md5)) * 1000000 // count(*)
                AS BIGINT)                             AS dup_ppm,
           CAST(sum(n_tok) AS BIGINT)                  AS total_tokens,
           CAST(count(DISTINCT CASE WHEN n_tok = {_CHUNK_W} THEN chunk_md5 END)
                AS BIGINT)                             AS n_unique_full
    FROM chunks
    """,
    doc=(
        "Chunk-level exact-dedup accounting over the sliding-window "
        "chunk stream: total vs distinct chunk hashes, the duplicate "
        "ppm a chunk-dedup pass would remove, and the distinct count "
        "among FULL-width chunks (tail fragments excluded — their "
        "collisions are length artifacts, not redundancy). Nests the "
        "chunker's oracle as a CTE so the accounting covers exactly "
        "the production chunk stream."
    ),
)
def pipeline_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield estimate at chunk granularity.

    Scale notes (100 TB): the chunk stream is the map-side explode of
    pipeline_chunk_overlap; the distinct-hash counts are one shuffle
    on the 16-byte md5 (partial aggregation collapses repeats
    map-side). This is the measurement that decides whether a
    chunk-grain dedup pass pays for itself before training."""
    chunks = _REG2["pipeline_chunk_overlap"].spark(spark, sf_dir)
    return chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("chunk_md5").cast("bigint").alias("n_unique"),
        F.expr(
            "(count(1) - count(DISTINCT chunk_md5)) * 1000000 div count(1)"
        )
        .cast("bigint")
        .alias("dup_ppm"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.countDistinct(
            F.when(F.col("n_tok") == _CHUNK_W, F.col("chunk_md5"))
        )
        .cast("bigint")
        .alias("n_unique_full"),
    )


@register(
    "cdc_net_changes",
    """
    WITH log AS (
      -- log window starts mid-stream: keys %4=0 have no initial insert
      SELECT o_orderkey AS key, 1 AS seq, 'I' AS op
      FROM orders WHERE o_orderkey % 4 != 0
      UNION ALL
      SELECT o_orderkey, 2, 'U' FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, 3,
             CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END
      FROM orders WHERE o_orderkey % 7 = 0 OR o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, 4, 'I' FROM orders WHERE o_orderkey % 21 = 0
    ), ends AS (
      SELECT key,
             min_by(op, seq) AS first_op,
             max_by(op, seq) AS last_op,
             CAST(count(*) AS BIGINT) AS n_ops
      FROM log GROUP BY key
    ), net AS (
      SELECT key, n_ops,
             CASE
               WHEN first_op = 'I' AND last_op = 'D' THEN 'NONE'
               WHEN first_op = 'I'                   THEN 'I'
               WHEN last_op  = 'D'                   THEN 'D'
               ELSE 'U'
             END AS net_op
      FROM ends
    )
    SELECT net_op,
           CAST(count(*) AS BIGINT)  AS n_keys,
           CAST(sum(n_ops) AS BIGINT) AS n_ops_compressed,
           CAST(sum(n_ops) - count(*) AS BIGINT) AS ops_saved
    FROM net
    WHERE net_op IS NOT NULL
    GROUP BY net_op
    """,
    doc=(
        "CDC net-changes compression (the Debezium/Delta CDF "
        "'net effect per key' rewrite): a multi-op changelog collapses "
        "to at most ONE op per key — I+...+D cancels to nothing, "
        "I+...+U nets to I with final values, U-only chains net to one "
        "U, trailing D nets to D. min_by/max_by over the sequence pick "
        "the endpoint ops in one aggregate; the report shows ops saved "
        "by net-effect batching (what a downstream MERGE actually "
        "needs to apply)."
    ),
)
def cdc_net_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-effect compression report over a synthesized changelog.

    Scale notes (100 TB): one shuffle on key with min_by/max_by
    endpoint aggregation — no per-key sort, no window; the MERGE
    downstream then applies one op per key instead of the full log."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    log = (
        o.filter(k % 4 != 0)
        .select(k.alias("key"), F.lit(1).alias("seq"), F.lit("I").alias("op"))
        .unionAll(
            o.filter(k % 3 == 0).select(
                k.alias("key"), F.lit(2).alias("seq"), F.lit("U").alias("op")
            )
        )
        .unionAll(
            o.filter((k % 7 == 0) | (k % 5 == 0)).select(
                k.alias("key"),
                F.lit(3).alias("seq"),
                F.when(k % 7 == 0, "D").otherwise("U").alias("op"),
            )
        )
        .unionAll(
            o.filter(k % 21 == 0).select(
                k.alias("key"), F.lit(4).alias("seq"), F.lit("I").alias("op")
            )
        )
    )
    ends = log.groupBy("key").agg(
        F.expr("min_by(op, seq)").alias("first_op"),
        F.expr("max_by(op, seq)").alias("last_op"),
        F.count(F.lit(1)).cast("bigint").alias("n_ops"),
    )
    net = ends.select(
        "n_ops",
        F.when(
            (F.col("first_op") == "I") & (F.col("last_op") == "D"), "NONE"
        )
        .when(F.col("first_op") == "I", "I")
        .when(F.col("last_op") == "D", "D")
        .otherwise("U")
        .alias("net_op"),
    )
    return net.groupBy("net_op").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n_ops").cast("bigint").alias("n_ops_compressed"),
        (F.sum("n_ops") - F.count(F.lit(1))).cast("bigint").alias("ops_saved"),
    )


# ---------------------------------------------------------------------------
# Shuffle-quality audit: does the reshard actually decorrelate sources?
# ---------------------------------------------------------------------------


@register(
    "pipeline_shuffle_quality",
    """
    WITH hashed AS (
      SELECT doc_id, source,
             CAST(concat('0x', substr(md5('shuffle1:'
                  || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
      FROM documents
    ),
    placed AS (
      SELECT source, h % 64 AS shard,
             lag(source) OVER (PARTITION BY h % 64
                               ORDER BY h, doc_id) AS prev_source
      FROM hashed
    ),
    adj AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN source = prev_source THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_same
      FROM placed WHERE prev_source IS NOT NULL
    ),
    shares AS (
      SELECT CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT)
               AS expected_ppm
      FROM (
        SELECT CAST(count(*) * 1000000
                    // (SELECT count(*) FROM documents) AS BIGINT)
                 AS share_ppm
        FROM documents GROUP BY source
      ) s
    )
    SELECT a.n_pairs,
           a.n_same,
           CAST(a.n_same * 1000000 // a.n_pairs AS BIGINT) AS observed_ppm,
           s.expected_ppm,
           CAST(a.n_same * 1000000 // a.n_pairs * 1000 // s.expected_ppm
                AS BIGINT) AS ratio_milli
    FROM adj a CROSS JOIN shares s
    """,
    doc=(
        "Shuffle-quality audit over the shipped deterministic reshard "
        "(pipeline_shard_shuffle's exact placement): the rate of "
        "ADJACENT training positions sharing a source, vs the "
        "independence expectation sum(share²) — ratio_milli ~ 1000 "
        "means the permutation decorrelates sources as well as true "
        "random; materially above means source-clumped batches and "
        "correlated gradients. Exact integer ppm end to end."
    ),
)
def pipeline_shuffle_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent same-source rate vs independence expectation.

    Scale notes (100 TB): reuses the reshard's one shard-keyed
    shuffle; adjacency is a lag window per shard partition; the
    expectation is a |sources|-bounded aggregate. The audit costs one
    pass over the placement it validates."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("shuffle1:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    placed = d.select("doc_id", "source", h.alias("h")).select(
        "source",
        F.lag("source")
        .over(Window.partitionBy(F.expr("h % 64")).orderBy("h", "doc_id"))
        .alias("prev_source"),
    )
    adj = placed.filter(F.col("prev_source").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("source") == F.col("prev_source"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_same"),
    )
    n = d.agg(F.count(F.lit(1)).alias("__n"))
    shares = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .crossJoin(F.broadcast(n))
        .select(F.expr("CAST(c * 1000000 div __n AS BIGINT)").alias("share_ppm"))
        .agg(
            F.expr(
                "CAST(sum(share_ppm * share_ppm) div 1000000 AS BIGINT)"
            ).alias("expected_ppm")
        )
    )
    return adj.crossJoin(F.broadcast(shares)).select(
        "n_pairs",
        "n_same",
        F.expr("CAST(n_same * 1000000 div n_pairs AS BIGINT)").alias(
            "observed_ppm"
        ),
        "expected_ppm",
        F.expr(
            "CAST(n_same * 1000000 div n_pairs * 1000 div expected_ppm"
            " AS BIGINT)"
        ).alias("ratio_milli"),
    )


# ---------------------------------------------------------------------------
# Dedup survivorship accounting (what exact dedup actually buys)
# ---------------------------------------------------------------------------


@register(
    "pipeline_dedup_survivor_stats",
    """
    WITH h AS (
      SELECT doc_id, source, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS content_hash
      FROM documents
    ),
    surv AS (
      SELECT content_hash, CAST(min(doc_id) AS BIGINT) AS canonical_id
      FROM h GROUP BY 1
    ),
    per_src AS (
      SELECT h.source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN h.doc_id = s.canonical_id
                           THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
             CAST(sum(CASE WHEN h.doc_id = s.canonical_id
                           THEN 0 ELSE h.n_chars END) AS BIGINT)
               AS bytes_saved
      FROM h JOIN surv s ON h.content_hash = s.content_hash
      GROUP BY 1
    )
    SELECT source, n_docs, n_dropped, bytes_saved,
           CAST(n_dropped * 1000000 // n_docs AS BIGINT) AS drop_ppm
    FROM per_src
    UNION ALL
    SELECT 'TOTAL', CAST(sum(n_docs) AS BIGINT),
           CAST(sum(n_dropped) AS BIGINT), CAST(sum(bytes_saved) AS BIGINT),
           CAST(sum(n_dropped) * 1000000 // sum(n_docs) AS BIGINT)
    FROM per_src
    ORDER BY source
    """,
    doc=(
        "Survivorship accounting for exact dedup — the governance "
        "report every corpus curation run ships: per source, how many "
        "documents the min-id canonical policy drops and how many "
        "bytes that saves (duplicate clusters may span sources, so "
        "the canonical doc is chosen GLOBALLY and losses attribute to "
        "the source whose copies lose). Same content-normalization "
        "digest as dedup_exact, so the two reports reconcile."
    ),
)
def pipeline_dedup_survivor_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source rows dropped + bytes saved by exact dedup, with total.

    Scale notes (100 TB): one digest shuffle to find per-cluster
    canonicals (same cost as dedup_exact), one hash-equi-join back,
    one source-grain aggregate. No windows, no collects; the TOTAL
    row is a second pass over the |sources|-bounded per-source frame."""
    from the_movies_db_spark.operators.text import fingerprint_md5

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars",
        fingerprint_md5("text").alias("content_hash"),
    )
    surv = d.groupBy("content_hash").agg(
        F.min("doc_id").cast("bigint").alias("canonical_id")
    )
    per_src = (
        d.join(surv, "content_hash")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.expr("CASE WHEN doc_id = canonical_id THEN 0 ELSE 1 END")
            ).cast("bigint").alias("n_dropped"),
            F.sum(
                F.expr(
                    "CASE WHEN doc_id = canonical_id THEN 0 ELSE n_chars END"
                )
            ).cast("bigint").alias("bytes_saved"),
        )
        .localCheckpoint(eager=False)  # |sources| rows, 2 consumers
    )
    with_ppm = per_src.withColumn(
        "drop_ppm", F.expr("CAST(n_dropped * 1000000 div n_docs AS BIGINT)")
    )
    total = per_src.agg(
        F.lit("TOTAL").alias("source"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_dropped").cast("bigint").alias("n_dropped"),
        F.sum("bytes_saved").cast("bigint").alias("bytes_saved"),
        F.expr(
            "CAST(sum(n_dropped) * 1000000 div sum(n_docs) AS BIGINT)"
        ).alias("drop_ppm"),
    )
    return with_ppm.unionByName(total).orderBy("source")


# ---------------------------------------------------------------------------
# Quality-signal rank fusion (RRF over independent integer quality signals)
# ---------------------------------------------------------------------------

_QRRF_K = 60
_QRRF_TOP = 20
_QRRF_STOPS = "('the','a','of','and','to','in','is','on','for','with')"
_QRRF_TOKS = "regexp_split_to_array(text, '\\s+')"


@register(
    "pipeline_quality_rrf",
    f"""
    WITH sig AS (
      SELECT doc_id,
             CAST(len(list_distinct(list_transform(
                    range(1, length(text) - 2),
                    i -> substr(text, i, 4)))) * 1000000
                  // (length(text) - 3) AS BIGINT) AS s_gram_ppm,
             CAST(list_aggregate(list_transform({_QRRF_TOKS},
                    t -> CASE WHEN lower(t) IN {_QRRF_STOPS}
                         THEN 1 ELSE 0 END), 'sum') * 1000000
                  // len({_QRRF_TOKS}) AS BIGINT) AS s_stop_ppm,
             CAST(len(list_distinct({_QRRF_TOKS})) * 1000000
                  // len({_QRRF_TOKS}) AS BIGINT) AS s_uniq_ppm
      FROM documents WHERE length(text) >= 4
    ),
    ranked AS (
      SELECT doc_id, s_gram_ppm, s_stop_ppm, s_uniq_ppm,
             CAST(row_number() OVER (ORDER BY s_gram_ppm DESC, doc_id)
                  AS BIGINT) AS r_gram,
             CAST(row_number() OVER (ORDER BY s_stop_ppm DESC, doc_id)
                  AS BIGINT) AS r_stop,
             CAST(row_number() OVER (ORDER BY s_uniq_ppm DESC, doc_id)
                  AS BIGINT) AS r_uniq
      FROM sig
    )
    SELECT doc_id, r_gram, r_stop, r_uniq,
           CAST(1000000 // ({_QRRF_K} + r_gram)
                + 1000000 // ({_QRRF_K} + r_stop)
                + 1000000 // ({_QRRF_K} + r_uniq) AS BIGINT) AS rrf_micro,
           CAST(row_number() OVER (
             ORDER BY 1000000 // ({_QRRF_K} + r_gram)
                    + 1000000 // ({_QRRF_K} + r_stop)
                    + 1000000 // ({_QRRF_K} + r_uniq) DESC, doc_id)
             AS BIGINT) AS rank
    FROM ranked
    ORDER BY rank
    LIMIT {_QRRF_TOP}
    """,
    doc=(
        "Quality-signal ENSEMBLE via reciprocal-rank fusion: three "
        "independent integer quality signals (distinct-4-gram share, "
        "stopword ratio, unique-token share) each rank the corpus, and "
        "RRF (sum of 1e6/(60+rank)) fuses them — the "
        "combine-weak-signals recipe production curation uses instead "
        "of trusting any single heuristic. Every rank is a distributed "
        "two-level row_number (no global sort); all scores are "
        "floor-division integers."
    ),
)
def pipeline_quality_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of three integer quality signals, top-20 docs.

    Scale notes (100 TB): the signal projection is per-row; the three
    global ranks run through operators.ranks.global_row_number
    (bucketed two-level rank, static ppm bounds — no extra bounds
    job, no single-partition sort), chained off ONE checkpointed
    signal base (the rfm discipline)."""
    from the_movies_db_spark.operators.ranks import global_row_number

    d = spread(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") >= 4
    )
    stops = "'the','a','of','and','to','in','is','on','for','with'"
    base = d.select(
        "doc_id",
        F.expr(
            "CAST(size(array_distinct(transform("
            " sequence(1, length(text) - 3),"
            " i -> substring(text, i, 4)))) * 1000000"
            " div (length(text) - 3) AS BIGINT)"
        ).alias("s_gram_ppm"),
        F.expr(
            "CAST(aggregate(transform(split(text, '\\\\s+'),"
            f" t -> CASE WHEN lower(t) IN ({stops}) THEN 1 ELSE 0 END),"
            " 0, (acc, x) -> acc + x) * 1000000"
            " div size(split(text, '\\\\s+')) AS BIGINT)"
        ).alias("s_stop_ppm"),
        F.expr(
            "CAST(size(array_distinct(split(text, '\\\\s+'))) * 1000000"
            " div size(split(text, '\\\\s+')) AS BIGINT)"
        ).alias("s_uniq_ppm"),
    ).localCheckpoint(eager=False)
    df = base
    for sig, out in (
        ("s_gram_ppm", "r_gram"),
        ("s_stop_ppm", "r_stop"),
        ("s_uniq_ppm", "r_uniq"),
    ):
        df = global_row_number(
            df.withColumn("__neg", -F.col(sig)),
            "__neg", ["doc_id"], out=out,
            bounds=(-1_000_000, 0),
        ).drop("__neg")
    k = _QRRF_K
    rrf = (
        f"CAST(1000000 div ({k} + r_gram) + 1000000 div ({k} + r_stop)"
        f" + 1000000 div ({k} + r_uniq) AS BIGINT)"
    )
    scored = df.withColumn("rrf_micro", F.expr(rrf))
    top = scored.orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(
        _QRRF_TOP
    )
    return (
        top.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
            ).cast("bigint"),
        )
        .select("doc_id", "r_gram", "r_stop", "r_uniq", "rrf_micro", "rank")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Token-balanced sharding (round-robin-by-rank vs hash sharding)
# ---------------------------------------------------------------------------

_SHARD_N = 8


@register(
    "pipeline_shard_token_balance",
    f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
               AS n_tok
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_tok,
             row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rk
      FROM base
    ),
    assigned AS (
      SELECT doc_id, n_tok,
             CAST('rank_rr' AS VARCHAR) AS strategy,
             CAST((rk - 1) % {_SHARD_N} AS BIGINT) AS shard
      FROM ranked
      UNION ALL
      SELECT doc_id, n_tok, 'hash',
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4)) AS BIGINT) % {_SHARD_N} AS BIGINT)
      FROM base
    ),
    per AS (
      SELECT strategy, shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS shard_tokens
      FROM assigned GROUP BY 1, 2
    )
    SELECT strategy, shard, n_docs, shard_tokens,
           CAST(shard_tokens * 1000000
                // sum(shard_tokens) OVER (PARTITION BY strategy)
                AS BIGINT) AS share_ppm,
           CAST((max(shard_tokens) OVER (PARTITION BY strategy)
                 - min(shard_tokens) OVER (PARTITION BY strategy)) * 1000000
                // sum(shard_tokens) OVER (PARTITION BY strategy)
                AS BIGINT) AS strategy_spread_ppm
    FROM per
    ORDER BY strategy, shard
    """,
    doc=(
        "Token-balanced training-shard assignment: round-robin over "
        "the token-count rank (longest-first snake deal — the "
        "deterministic cousin of LPT scheduling) vs naive md5-hash "
        "sharding, with per-shard token loads and the max-min spread "
        "per strategy — the number that decides whether stragglers eat "
        "your epoch time. The rank is a distributed two-level "
        "row_number, never a global sort."
    ),
)
def pipeline_shard_token_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rank-round-robin vs hash sharding token balance.

    Scale notes (100 TB): one per-row token count, one bucketed
    global rank, one shard-grain aggregate per strategy; the spread
    windows run over |strategies| x |shards| rows."""
    from the_movies_db_spark.operators.ranks import global_row_number

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.expr("CAST(size(split(text, '\\\\s+')) AS BIGINT)").alias("n_tok"),
    ).localCheckpoint(eager=False)
    ranked = global_row_number(
        base.withColumn("__neg", -F.col("n_tok")),
        "__neg", ["doc_id"], out="rk",
    ).drop("__neg")
    rr = ranked.select(
        "doc_id", "n_tok",
        F.lit("rank_rr").alias("strategy"),
        F.expr(f"CAST((rk - 1) % {_SHARD_N} AS BIGINT)").alias("shard"),
    )
    hs = base.select(
        "doc_id", "n_tok",
        F.lit("hash").alias("strategy"),
        F.expr(
            "CAST(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4),"
            f" 16, 10) AS BIGINT) % {_SHARD_N} AS BIGINT)"
        ).alias("shard"),
    )
    per = (
        rr.unionByName(hs)
        .groupBy("strategy", "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("shard_tokens"),
        )
    )
    ws = Window.partitionBy("strategy")
    return per.select(
        "strategy", "shard", "n_docs", "shard_tokens",
        F.expr("shard_tokens * 1000000").cast("bigint").alias("__num"),
        F.sum("shard_tokens").over(ws).alias("__tot"),
        F.max("shard_tokens").over(ws).alias("__mx"),
        F.min("shard_tokens").over(ws).alias("__mn"),
    ).select(
        "strategy", "shard", "n_docs", "shard_tokens",
        F.expr("CAST(__num div __tot AS BIGINT)").alias("share_ppm"),
        F.expr(
            "CAST((__mx - __mn) * 1000000 div __tot AS BIGINT)"
        ).alias("strategy_spread_ppm"),
    ).orderBy("strategy", "shard")
