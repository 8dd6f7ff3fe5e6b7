"""Training-data curation operators a large-scale LLM pipeline runs
between raw corpus and tokenizer: benchmark decontamination, PII
redaction, deterministic stratified sampling, sequence packing, and
domain-mixture budgeting.

All five are pure-expression plans (no Python UDFs) with exact DuckDB
oracle mirrors. Determinism rules (cross-engine value-hash):
- every sampling/ordering decision derives from md5(doc_id) — no RNG;
- every integer aggregate is cast to BIGINT in the oracle (DuckDB
  sum(BIGINT) -> HUGEINT -> float64 otherwise);
- every float output is rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table, spread
from the_movies_db_spark.operators import text as T
from the_movies_db_spark.queries import register

# ---------------------------------------------------------------- helpers

#: deterministic 32-bit doc hash: first 8 md5 hex digits as a bigint.
#: Spark and DuckDB md5 agree byte-for-byte, so every decision derived
#: from this value (sample buckets, shard ids, pack order) matches.
_H_SQL = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"


def _doc_hash() -> F.Column:
    return F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


def _gram_hash(col: F.Column) -> F.Column:
    """md5-prefix bigint of an n-gram string (same trick as text_winnow)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


# ------------------------------------------------------- decontamination

# Contamination n-gram length. Production runs use 8-13 word grams;
# the synthetic corpus draws from a ~30-word vocabulary, so 4 is the
# length at which genuine cross-document overlap exists to verify.
_NGRAM = 4


@register(
    "pipeline_decontaminate",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct(
               list_transform(range(1, greatest(len(t) - {_NGRAM} + 1, 1) + 1),
                 i -> CAST(concat('0x', substr(md5(array_to_string(t[i:i+{_NGRAM - 1}], ' ')), 1, 8)) AS BIGINT))
             )) AS g
      FROM toks
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_grams
    FROM grams c JOIN bench b ON c.g = b.g
    WHERE c.doc_id % 97 <> 0
    GROUP BY c.doc_id
    """,
    doc=(
        "Benchmark decontamination: flag training documents sharing any "
        f"{_NGRAM}-word gram with a held-out benchmark set (the "
        "deterministic slice doc_id % 97 = 0; the gram length fits the "
        "synthetic vocabulary — production uses 8-13). The gram set is "
        "tiny relative to the corpus, so the overlap join broadcasts — "
        "at 100 TB this is one corpus scan plus a broadcast semi-join, "
        "the standard pre-training hygiene step (GPT-3 §C / PaLM style)."
    ),
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", T.tokens("text").alias("toks"))
    grams = (
        T.shingle_explode(toks, "toks", _NGRAM, out_col="s")
        .select("doc_id", _gram_hash(F.col("s")).alias("g"))
        .dropDuplicates(["doc_id", "g"])
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminated_grams"))
    )


# --------------------------------------------------------- PII redaction

# Patterns kept to the Java-regex ∩ RE2 common subset so Spark and
# DuckDB compile them identically.
_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_IPV4 = r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+"
_DIGITS = r"[0-9]{6,}"


@register(
    "pipeline_pii_redact",
    f"""
    WITH seeded AS (
      SELECT doc_id,
             concat(text, ' contact user', doc_id, '@example.com via 10.',
                    doc_id % 256, '.0.', doc_id % 100, ' ref ',
                    1000000 + doc_id * doc_id) AS t
      FROM documents
    ),
    red AS (
      SELECT doc_id, t,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '{_EMAIL}', '<EMAIL>', 'g'),
                 '{_IPV4}', '<IP>', 'g'),
               '{_DIGITS}', '<NUM>', 'g') AS r
      FROM seeded
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_IPV4}'))  AS BIGINT) AS n_ips,
           length(r)                                              AS redacted_len,
           md5(r)                                                 AS redacted_md5
    FROM red
    """,
    doc=(
        "PII detection + redaction as one expression pass: emails, IPv4 "
        "addresses, and long digit runs are counted and replaced with "
        "typed placeholders. PII is seeded deterministically from doc_id "
        "(the synthetic corpus has none), and the md5 of the redacted "
        "text is value-hash-verified — proving byte-identical redaction, "
        "not just matching counts. Replacement order (email -> IP -> "
        "digits) prevents partial matches inside already-redacted spans."
    ),
)
def pipeline_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" ref "),
        (F.lit(1000000) + F.col("doc_id") * F.col("doc_id")).cast("string"),
    )
    staged = d.select("doc_id", seeded.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL, "<EMAIL>"), _IPV4, "<IP>"
        ),
        _DIGITS,
        "<NUM>",
    )
    staged2 = staged.select("doc_id", "t", redacted.alias("r"))
    return staged2.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_EMAIL), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_IPV4), 0))
        .cast("bigint")
        .alias("n_ips"),
        F.length("r").alias("redacted_len"),
        F.md5("r").alias("redacted_md5"),
    )


# ------------------------------------------------- stratified sampling

#: per-language keep-rate (percent of hash buckets kept). Down-samples
#: the over-represented language, keeps the rest — a fixed, documented
#: policy so the op is deterministic.
_RATES = {"en": 40, "de": 80, "es": 80, "fr": 80, "zh": 80}
_DEFAULT_RATE = 50

_RATE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_RATES.items()))
    + f" ELSE {_DEFAULT_RATE} END"
)


@register(
    "pipeline_sample_stratified",
    f"""
    WITH s AS (
      SELECT lang,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok,
             CASE WHEN {_H_SQL} % 100 < {_RATE_SQL} THEN 1 ELSE 0 END AS keep
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)                    AS n_total,
           CAST(sum(keep) AS BIGINT)                   AS n_sampled,
           CAST(sum(keep * n_tok) AS BIGINT)           AS sampled_tokens,
           round(sum(keep) * 1.0 / count(*), 4)        AS achieved_rate
    FROM s GROUP BY lang
    """,
    doc=(
        "Deterministic stratified sampling for corpus mixture control: "
        "each document's md5-derived hash bucket decides inclusion at a "
        "per-language keep-rate (en down-sampled to 40%). Hash-based "
        "sampling is reproducible across runs/engines and, unlike "
        "df.sample(), stable under repartitioning — at 100 TB the "
        "decision is a per-row expression with one aggregating shuffle."
    ),
)
def pipeline_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in sorted(_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    keep = F.when(_doc_hash() % 100 < rate, 1).otherwise(0)
    s = d.select(
        "lang", T.token_count("text").alias("n_tok"), keep.alias("keep")
    )
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("keep").cast("bigint").alias("n_sampled"),
        F.sum(F.col("keep") * F.col("n_tok")).cast("bigint").alias("sampled_tokens"),
        F.round(F.sum("keep") / F.count(F.lit(1)), 4).alias("achieved_rate"),
    )


# --------------------------------------------------- sequence packing

_N_SHARDS = 8
_PACK_BUDGET = 2048  # tokens per packed training sequence


@register(
    "pipeline_pack_sequences",
    f"""
    WITH s AS (
      SELECT doc_id,
             {_H_SQL} AS h,
             len(regexp_extract_all(text, '{T.TOKEN_PATTERN}')) AS n_tok
      FROM documents
    ),
    ordered AS (
      SELECT doc_id, h % {_N_SHARDS} AS shard, n_tok,
             sum(n_tok) OVER (PARTITION BY h % {_N_SHARDS}
                              ORDER BY h, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM s
    )
    SELECT shard,
           CAST((cum - n_tok) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT)                        AS n_docs,
           CAST(sum(n_tok) AS BIGINT)                      AS pack_tokens
    FROM ordered
    GROUP BY shard, pack_id
    """,
    doc=(
        "Sequence packing (concat-and-chunk): documents are hash-ordered "
        f"inside {_N_SHARDS} hash shards, token counts accumulate, and a "
        f"document joins the pack its start offset falls in (budget "
        f"{_PACK_BUDGET} tokens). Shard-local running sums keep the "
        "window parallel — a single global ORDER BY would serialize the "
        "whole corpus through one partition at 100 TB, so the shard "
        "count, not the corpus size, bounds per-task state."
    ),
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = d.select(
        "doc_id",
        _doc_hash().alias("h"),
        T.regex_token_count("text").alias("n_tok"),
    ).withColumn("shard", F.col("h") % _N_SHARDS)
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = s.withColumn("cum", F.sum("n_tok").over(w))
    return (
        ordered.withColumn(
            "pack_id",
            F.floor((F.col("cum") - F.col("n_tok")) / _PACK_BUDGET).cast("bigint"),
        )
        .groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("pack_tokens"),
        )
    )


# ------------------------------------------------- domain-mix budgeting


@register(
    "pipeline_domain_mix",
    """
    WITH dom AS (
      SELECT lang, source,
             CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS tokens
      FROM documents GROUP BY lang, source
    ),
    tot AS (
      SELECT lang, source, tokens,
             sum(tokens) OVER ()  AS all_tokens,
             count(*)   OVER ()  AS n_domains
      FROM dom
    )
    SELECT lang, source, tokens,
           round(tokens * 1.0 / all_tokens, 6) AS share,
           round(least(1.0, (all_tokens * 1.0 / n_domains) / tokens), 6)
             AS sample_weight
    FROM tot
    """,
    doc=(
        "Domain-mixture budgeting: token totals per (lang, source) "
        "domain, each domain's share of the corpus, and the sampling "
        "weight that would flatten the mixture to uniform (capped at 1 "
        "— never up-sample). The global window runs over the already- "
        "aggregated domain table (~#domains rows), so it is driver-cheap "
        "at any corpus scale; this is the DoReMi/data-mixture bookkeeping "
        "step before weighted draws."
    ),
)
def pipeline_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    dom = d.groupBy("lang", "source").agg(
        F.sum(T.token_count("text")).cast("bigint").alias("tokens")
    )
    w = Window.partitionBy()
    tot = dom.select(
        "lang",
        "source",
        "tokens",
        F.sum("tokens").over(w).alias("all_tokens"),
        F.count(F.lit(1)).over(w).alias("n_domains"),
    )
    return tot.select(
        "lang",
        "source",
        "tokens",
        F.round(F.col("tokens") / F.col("all_tokens"), 6).alias("share"),
        F.round(
            F.least(
                F.lit(1.0),
                (F.col("all_tokens") / F.col("n_domains")) / F.col("tokens"),
            ),
            6,
        ).alias("sample_weight"),
    )


# ---------------------------------------------- fuzzy entity resolution


@register(
    "pipeline_fuzzy_match",
    """
    WITH names AS (
      SELECT p_name, CAST(count(*) AS BIGINT) AS n_rows,
             split_part(p_name, ' ', 1) AS blk
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.n_rows AS n_a, b.n_rows AS n_b
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    doc=(
        "Fuzzy entity resolution over the *name dictionary*: distinct "
        "names (64 here, always orders of magnitude below row count) "
        "are blocked on their first token, candidate pairs scored with "
        "Levenshtein, matches kept at distance <= 3. Resolving on the "
        "aggregated dictionary instead of raw rows is what makes edit- "
        "distance matching viable at 100 TB — the quadratic step runs "
        "on thousands of names, not billions of rows, and the result "
        "broadcasts back as a canonicalization map."
    ),
)
def pipeline_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    ).withColumn("blk", F.split(F.col("p_name"), " ").getItem(0))
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("dist"),
            F.col("a.n_rows").alias("n_a"),
            F.col("b.n_rows").alias("n_b"),
        )
    )


_BP_C, _BP_T = 2, 20  # chunk width (tokens), max document frequency to keep


@register(
    "pipeline_boilerplate_removal",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents
    ),
    chunked AS (
      SELECT doc_id,
             list_transform(range(1, CAST(ceil(len(t) / {_BP_C}.0) AS BIGINT) + 1),
               i -> struct_pack(pos := i,
                    c := array_to_string(t[(i-1)*{_BP_C}+1:(i-1)*{_BP_C}+{_BP_C}], ' '))
             ) AS cs
      FROM toks
    ),
    ex AS (SELECT doc_id, unnest(cs, recursive := true) FROM chunked),
    df AS (SELECT c, count(DISTINCT doc_id) AS df FROM ex GROUP BY 1),
    kept AS (
      SELECT e.doc_id, e.pos, e.c FROM ex e JOIN df ON e.c = df.c
      WHERE df.df <= {_BP_T}
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_kept,
             md5(string_agg(c, ' ' ORDER BY pos)) AS clean_md5
      FROM kept GROUP BY doc_id
    )
    SELECT ch.doc_id,
           CAST(len(ch.cs) AS BIGINT)      AS n_chunks,
           COALESCE(a.n_kept, 0)           AS n_kept,
           COALESCE(a.clean_md5, md5(''))  AS clean_md5
    FROM chunked ch LEFT JOIN agg a ON ch.doc_id = a.doc_id
    """,
    doc=(
        "Boilerplate removal (CCNet/RefinedWeb paragraph-dedup analog on "
        "the single-line corpus): split documents into fixed-width token "
        "chunks, compute each chunk's document frequency, drop chunks "
        "shared by more than df_max documents, reassemble the survivors "
        "in order. One explode + one df aggregate + one join back — all "
        "keyed on chunk content, shuffle-partitionable at any corpus "
        "size; the cleaned text is verified via md5 so the oracle "
        "compares full reassembly without hashing megabytes of text "
        "through pandas."
    ),
)
def pipeline_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    t = F.split(F.col("text"), r"\s+")
    n_chunks = F.ceil(F.size(t) / float(_BP_C)).cast("bigint")
    cs = F.transform(
        F.sequence(F.lit(1), n_chunks.cast("int")),
        lambda i: F.concat_ws(" ", F.slice(t, (i - 1) * _BP_C + 1, _BP_C)),
    )
    chunked = d.select("doc_id", cs.alias("cs"))
    ex = chunked.select(
        "doc_id", F.posexplode("cs").alias("pos0", "c")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "c")
    df_counts = ex.groupBy("c").agg(F.countDistinct("doc_id").alias("df"))
    kept = ex.join(df_counts, "c").filter(F.col("df") <= _BP_T)
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda x: x["c"],
                ),
            )
        ).alias("clean_md5"),
    )
    base = chunked.select("doc_id", F.size("cs").cast("bigint").alias("n_chunks"))
    return (
        base.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
            F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
        )
    )


_TOKENS = "regexp_split_to_array(text, '\\s+')"


@register(
    "pipeline_quality_filter",
    f"""
    WITH m AS (
      SELECT doc_id,
             len({_TOKENS}) AS n_tok,
             list_aggregate(list_transform({_TOKENS},
               t -> CASE WHEN lower(t) IN ('the','a','of','and','to','in','is',
                                           'on','for','with') THEN 1 ELSE 0 END),
               'sum') * 1.0 / len({_TOKENS}) AS stop_r,
             list_aggregate(list_transform({_TOKENS}, t -> length(t)), 'sum')
               * 1.0 / len({_TOKENS}) AS awl,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
               * 1.0 / length(text) AS punct_r,
             list_transform(range(1, greatest(len({_TOKENS}) - 2, 1) + 1),
                            i -> array_to_string(({_TOKENS})[i:i+2], ' ')) AS tri
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_tok,
             CASE WHEN n_tok BETWEEN 5 AND 5000 THEN 0.25 ELSE 0.0 END
           + CASE WHEN stop_r >= 0.02 THEN 0.25 ELSE 0.0 END
           + CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END
           + CASE WHEN punct_r <= 0.2 THEN 0.25 ELSE 0.0 END AS quality,
             (len(tri) - len(list_distinct(tri))) * 1.0 / len(tri) AS dup_tri
      FROM m
    )
    SELECT doc_id,
           CAST(n_tok AS BIGINT)  AS n_tokens,
           round(quality, 2)      AS quality,
           round(dup_tri, 4)      AS dup_trigram_frac,
           CASE WHEN n_tok < 10          THEN 'too_short'
                WHEN n_tok > 5000        THEN 'too_long'
                WHEN quality < 0.5       THEN 'low_quality'
                WHEN dup_tri > 0.6       THEN 'repetitive'
                ELSE 'ok' END      AS verdict,
           CAST(n_tok >= 10 AND n_tok <= 5000 AND quality >= 0.5
                AND dup_tri <= 0.6 AS BOOLEAN) AS keep
    FROM s
    """,
    doc=(
        "C4/Gopher-style document gate: length band, composite quality "
        "heuristic, trigram-repetition ceiling — each document tagged "
        "keep/drop with the FIRST failing rule as the verdict (the "
        "audit trail a curation pipeline ships alongside the filtered "
        "corpus). One scan, pure expressions, zero shuffles."
    ),
)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    staged = d.select(
        "doc_id",
        T.token_count("text").cast("bigint").alias("n_tok"),
        T.quality_score("text").alias("__q"),
        T.word_shingles(T.tokens("text"), 3).alias("__tri"),
    )
    staged = staged.select(
        "doc_id",
        "n_tok",
        "__q",
        (
            (F.size("__tri") - F.size(F.array_distinct("__tri")))
            * F.lit(1.0)
            / F.size("__tri")
        ).alias("__dup_tri"),
    )
    keep = (
        (F.col("n_tok") >= 10)
        & (F.col("n_tok") <= 5000)
        & (F.col("__q") >= 0.5)
        & (F.col("__dup_tri") <= 0.6)
    )
    verdict = (
        F.when(F.col("n_tok") < 10, "too_short")
        .when(F.col("n_tok") > 5000, "too_long")
        .when(F.col("__q") < 0.5, "low_quality")
        .when(F.col("__dup_tri") > 0.6, "repetitive")
        .otherwise("ok")
    )
    return staged.select(
        "doc_id",
        F.col("n_tok").alias("n_tokens"),
        F.round("__q", 2).alias("quality"),
        F.round("__dup_tri", 4).alias("dup_trigram_frac"),
        verdict.alias("verdict"),
        keep.alias("keep"),
    )


@register(
    "pipeline_sample_weighted",
    f"""
    WITH w AS (
      SELECT doc_id, lang,
             len({_TOKENS}) AS n_tok,
             ({_H_SQL} % 1000000 + 0.5) / 1000000.0 AS u,
             ln(1.0 + len({_TOKENS}))               AS wt
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(floor(-ln(u) / wt * 1000000000) AS BIGINT) AS key_ppb
    FROM w
    ORDER BY CAST(floor(-ln(u) / wt * 1000000000) AS BIGINT), doc_id
    LIMIT 100
    """,
    doc=(
        "Deterministic weighted sampling (Efraimidis-Spirakis A-ES): "
        "per-document exponential key -ln(u)/w with u derived from "
        "md5(doc_id) and weight w = ln(1+tokens) — the "
        "token-proportional sample a mixture builder draws. Keys are "
        "ranked as exact integers (floor(key*1e9) of the identical "
        "IEEE double in both engines), so even the sample MEMBERSHIP "
        "is value-hash-verified. Plan shape: one scan + "
        "TakeOrderedAndProject (top-k never sorts the full corpus); "
        "reproducible under any partitioning, unlike df.sample()."
    ),
)
def pipeline_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        "lang",
        T.token_count("text").alias("n_tok"),
        ((_doc_hash() % 1000000 + 0.5) / 1000000.0).alias("__u"),
    ).select(
        "doc_id",
        "lang",
        "n_tok",
        "__u",
        F.log(1.0 + F.col("n_tok")).alias("__wt"),
    )
    key = F.floor(-F.log("__u") / F.col("__wt") * 1000000000).cast("bigint")
    return (
        staged.select(
            "doc_id",
            "lang",
            F.col("n_tok").cast("bigint").alias("n_tokens"),
            key.alias("key_ppb"),
        )
        .orderBy("key_ppb", "doc_id")
        .limit(100)
    )


@register(
    "pipeline_curate_e2e",
    f"""
    WITH m AS (
      SELECT doc_id, lang,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS chash,
             len({_TOKENS}) AS n_tok,
             list_aggregate(list_transform({_TOKENS},
               t -> CASE WHEN lower(t) IN ('the','a','of','and','to','in','is',
                                           'on','for','with') THEN 1 ELSE 0 END),
               'sum') * 1.0 / len({_TOKENS}) AS stop_r,
             list_aggregate(list_transform({_TOKENS}, t -> length(t)), 'sum')
               * 1.0 / len({_TOKENS}) AS awl,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
               * 1.0 / length(text) AS punct_r,
             list_transform(range(1, greatest(len({_TOKENS}) - 2, 1) + 1),
                            i -> array_to_string(({_TOKENS})[i:i+2], ' ')) AS tri,
             CASE WHEN {_H_SQL} % 100 < {_RATE_SQL} THEN 1 ELSE 0 END AS samp
      FROM documents
    ),
    s AS (
      SELECT doc_id, lang, n_tok, samp,
             CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY chash)
                  THEN 1 ELSE 0 END AS canon,
             CASE WHEN n_tok BETWEEN 10 AND 5000
                   AND (CASE WHEN n_tok BETWEEN 5 AND 5000 THEN 0.25 ELSE 0.0 END
                      + CASE WHEN stop_r >= 0.02 THEN 0.25 ELSE 0.0 END
                      + CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END
                      + CASE WHEN punct_r <= 0.2 THEN 0.25 ELSE 0.0 END) >= 0.5
                   AND (len(tri) - len(list_distinct(tri))) * 1.0 / len(tri) <= 0.6
                  THEN 1 ELSE 0 END AS qual
      FROM m
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)                         AS docs_in,
           CAST(sum(canon) AS BIGINT)                       AS after_dedup,
           CAST(sum(canon * qual) AS BIGINT)                AS after_quality,
           CAST(sum(canon * qual * samp) AS BIGINT)         AS after_sample,
           CAST(sum(canon * qual * samp * n_tok) AS BIGINT) AS tokens_out
    FROM s GROUP BY lang
    """,
    doc=(
        "End-to-end curation funnel — the operators composed the way a "
        "real corpus run chains them: exact dedup (min-id canonical per "
        "content hash) -> composite quality gate -> deterministic "
        "stratified sample -> per-language funnel counts and surviving "
        "token budget. One scan, one window over the content hash, one "
        "final aggregate; every stage's attrition is visible in the "
        "output (the report a curation pipeline publishes per batch)."
    ),
)
def pipeline_curate_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in sorted(_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    staged = d.select(
        "doc_id",
        "lang",
        T.fingerprint_md5("text").alias("__chash"),
        T.token_count("text").alias("n_tok"),
        T.quality_score("text").alias("__q"),
        T.word_shingles(T.tokens("text"), 3).alias("__tri"),
        F.when(_doc_hash() % 100 < rate, 1).otherwise(0).alias("samp"),
    )
    dup_tri = (
        (F.size("__tri") - F.size(F.array_distinct("__tri")))
        * F.lit(1.0)
        / F.size("__tri")
    )
    w = Window.partitionBy("__chash")
    s = staged.select(
        "doc_id",
        "lang",
        "n_tok",
        "samp",
        F.when(F.col("doc_id") == F.min("doc_id").over(w), 1)
        .otherwise(0)
        .alias("canon"),
        F.when(
            (F.col("n_tok") >= 10)
            & (F.col("n_tok") <= 5000)
            & (F.col("__q") >= 0.5)
            & (dup_tri <= 0.6),
            1,
        )
        .otherwise(0)
        .alias("qual"),
    )
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_in"),
        F.sum("canon").cast("bigint").alias("after_dedup"),
        F.sum(F.col("canon") * F.col("qual")).cast("bigint").alias("after_quality"),
        F.sum(F.col("canon") * F.col("qual") * F.col("samp"))
        .cast("bigint")
        .alias("after_sample"),
        F.sum(F.col("canon") * F.col("qual") * F.col("samp") * F.col("n_tok"))
        .cast("bigint")
        .alias("tokens_out"),
    )


# ----------------------------------------------------- train/test split

#: hash buckets 0-7 -> train, 8 -> valid, 9 -> test (80/10/10).
_SRC_H_SQL = "CAST(concat('0x', substr(md5(source), 1, 8)) AS BIGINT) % 10"


@register(
    "pipeline_split_by_source",
    f"""
    WITH assigned AS (
      SELECT CASE WHEN {_SRC_H_SQL} <= 7 THEN 'train'
                  WHEN {_SRC_H_SQL} = 8  THEN 'valid'
                  ELSE 'test' END AS split,
             source,
             len({_TOKENS}) AS n_tok
      FROM documents
    )
    SELECT split,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(*) AS BIGINT)               AS n_docs,
           CAST(sum(n_tok) AS BIGINT)             AS n_tokens
    FROM assigned GROUP BY split
    """,
    doc=(
        "Leakage-free train/valid/test split: the hash bucket is computed "
        "on the SOURCE (site/domain), not the document, so near-duplicate "
        "documents from one origin can never straddle the held-out "
        "boundary — the standard guard against eval contamination when "
        "splitting a crawled corpus. Deterministic md5 bucketing (no RNG), "
        "80/10/10."
    ),
)
def pipeline_split_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split document / source / token counts.

    Scale notes (100 TB): the assignment is a pure projection (hash of
    an existing column — no join against a membership table, no RNG
    state), so a writer partitioned by `split` streams each document to
    its shard in the same pass; the summary here is one tiny aggregate.
    The split stays stable as the corpus grows: new documents from a
    known source land in the source's existing split.
    """
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("source")), 1, 8), 16, 10).cast("bigint") % 10
    split = (
        F.when(h <= 7, F.lit("train")).when(h == 8, F.lit("valid")).otherwise(F.lit("test"))
    )
    return (
        d.select(
            split.alias("split"),
            "source",
            T.token_count("text").cast("bigint").alias("n_tok"),
        )
        .groupBy("split")
        .agg(
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )


# ------------------------------------------- semantic (in-context) packing

_SEMPACK_PLANES = 6  # 64 semantic buckets


def _sempack_oracle() -> str:
    from the_movies_db_spark.queries.similarity_queries import _sig_expr

    sig = _sig_expr(_SEMPACK_PLANES).format(v="c.embedding")
    return f"""
    WITH s AS (
      SELECT d.doc_id, d.source,
             {_H_SQL} AS h,
             len(regexp_extract_all(d.text, '{T.TOKEN_PATTERN}')) AS n_tok,
             {sig} AS bucket
      FROM documents d JOIN embeddings c ON c.vec_id = d.doc_id
    ),
    ordered AS (
      SELECT doc_id, source, bucket, n_tok,
             sum(n_tok) OVER (PARTITION BY bucket
                              ORDER BY h, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM s
    )
    SELECT bucket,
           CAST((cum - n_tok) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT)                        AS n_docs,
           CAST(sum(n_tok) AS BIGINT)                      AS pack_tokens,
           CAST(count(DISTINCT source) AS BIGINT)          AS n_sources
    FROM ordered
    GROUP BY bucket, pack_id
    """


@register(
    "pipeline_semantic_pack",
    _sempack_oracle(),
    doc=(
        "Semantic sequence packing (in-context-pretraining order): "
        "documents are grouped by a 6-plane hyperplane-LSH bucket of "
        "their embedding, so RELATED documents become adjacent and land "
        "in the same packed training sequence; within a bucket the "
        "pack assignment is the same shard-local running-sum chunking "
        "as pipeline_pack_sequences."
    ),
)
def pipeline_semantic_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack training sequences so each pack is topically coherent.

    In-context pretraining (Shi et al. 2023-style) orders the corpus so
    that documents sharing context are concatenated into the same
    training sequence instead of random neighbors. Here the semantic
    order is the hyperplane-LSH bucket of the document embedding (64
    buckets; the same md5-derived planes every LSH operator in this
    repo uses, so the DuckDB oracle reproduces the bucketing bit-for-
    bit), and packing within a bucket is the deterministic running-sum
    chunking of pipeline_pack_sequences.

    Scale notes (100 TB): the signature is a per-row projection; the
    running sum partitions by bucket, so per-task window state is
    bounded by the largest bucket, not the corpus — with planes scaled
    to log2(corpus/target) (the dedup_semantic_lsh rule) bucket sizes
    track the target. Embeddings join by id (co-partitioned at rest in
    production). The n_sources column is the cohesion signal: packs
    drawing from few sources indicate the bucketing is grouping
    related material.
    """
    from the_movies_db_spark.operators import similarity as S

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    s = (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            "source",
            _doc_hash().alias("h"),
            T.regex_token_count("text").alias("n_tok"),
            S.hyperplane_signature("embedding", _SEMPACK_PLANES, 64).alias(
                "bucket"
            ),
        )
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = s.withColumn("cum", F.sum("n_tok").over(w))
    return (
        ordered.withColumn(
            "pack_id",
            F.expr(f"CAST((cum - n_tok) div {_PACK_BUDGET} AS BIGINT)"),
        )
        .groupBy("bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("pack_tokens"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
        )
    )


@register(
    "pipeline_padding_waste",
    f"""
    WITH s AS (
      SELECT CAST(len(regexp_extract_all(text, '{T.TOKEN_PATTERN}'))
                  AS BIGINT) AS n_tok
      FROM documents
    ),
    agg AS (
      SELECT CAST(sum(n_tok) AS BIGINT) AS actual,
             CAST(sum(((n_tok + 31) // 32) * 32) AS BIGINT)   AS pad32,
             CAST(sum(((n_tok + 63) // 64) * 64) AS BIGINT)   AS pad64,
             CAST(sum(((n_tok + 127) // 128) * 128) AS BIGINT) AS pad128,
             CAST(count(*) * max(n_tok) AS BIGINT)            AS padmax
      FROM s
    )
    SELECT * FROM (
      SELECT 'bucket32' AS strategy, actual, pad32 AS padded,
             CAST((pad32 - actual) * 1000000 // pad32 AS BIGINT) AS waste_ppm
      FROM agg
      UNION ALL
      SELECT 'bucket64', actual, pad64,
             CAST((pad64 - actual) * 1000000 // pad64 AS BIGINT) FROM agg
      UNION ALL
      SELECT 'bucket128', actual, pad128,
             CAST((pad128 - actual) * 1000000 // pad128 AS BIGINT) FROM agg
      UNION ALL
      SELECT 'pad_to_max', actual, padmax,
             CAST((padmax - actual) * 1000000 // padmax AS BIGINT) FROM agg
    ) u
    """,
    doc=(
        "Batch padding-efficiency audit: total padded tokens and exact "
        "waste_ppm under length-bucketing at granularity 32/64/128 "
        "versus pad-to-corpus-max — the measurement behind choosing "
        "sequence buckets (or sequence packing, whose waste "
        "pipeline_pack_sequences bounds by construction). One "
        "aggregation pass computes every strategy; rows unpivot from "
        "the single result."
    ),
)
def pipeline_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding waste per length-bucketing strategy, exact integers.

    Scale notes (100 TB): one map-side-combinable aggregation over the
    token counts — every strategy is an arithmetic projection of the
    same row, so adding strategies is free; the unpivot runs on a
    1-row aggregate."""
    d = load_table(spark, sf_dir, "documents")
    s = d.select(T.regex_token_count("text").cast("bigint").alias("n_tok"))
    agg = s.agg(
        F.sum("n_tok").cast("bigint").alias("actual"),
        F.sum(F.expr("((n_tok + 31) div 32) * 32")).cast("bigint").alias("pad32"),
        F.sum(F.expr("((n_tok + 63) div 64) * 64")).cast("bigint").alias("pad64"),
        F.sum(F.expr("((n_tok + 127) div 128) * 128"))
        .cast("bigint")
        .alias("pad128"),
        (F.count(F.lit(1)) * F.max("n_tok")).cast("bigint").alias("padmax"),
    )
    return agg.selectExpr(
        "stack(4,"
        " 'bucket32', actual, pad32,"
        "   CAST((pad32 - actual) * 1000000 div pad32 AS BIGINT),"
        " 'bucket64', actual, pad64,"
        "   CAST((pad64 - actual) * 1000000 div pad64 AS BIGINT),"
        " 'bucket128', actual, pad128,"
        "   CAST((pad128 - actual) * 1000000 div pad128 AS BIGINT),"
        " 'pad_to_max', actual, padmax,"
        "   CAST((padmax - actual) * 1000000 div padmax AS BIGINT)"
        ") AS (strategy, actual, padded, waste_ppm)"
    )


@register(
    "pipeline_epoch_repeat",
    """
    WITH planned AS (
      SELECT doc_id, source, n_chars,
             250000 + (CAST(substr(source, 4) AS BIGINT) % 5) * 500000 AS f_ppm,
             CAST(concat('0x', substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1000000 AS h
      FROM documents
    ), copies AS (
      SELECT doc_id, source, n_chars,
             f_ppm // 1000000
               + CASE WHEN h < f_ppm % 1000000 THEN 1 ELSE 0 END AS n_copies
      FROM planned
    )
    SELECT source,
           CAST(count(*) AS BIGINT)                 AS n_docs,
           CAST(sum(n_copies) AS BIGINT)            AS n_instances,
           CAST(sum(n_chars * n_copies) AS BIGINT)  AS out_chars,
           CAST(sum(doc_id * n_copies) AS BIGINT)   AS copies_checksum
    FROM copies
    GROUP BY source
    """,
    doc=(
        "Epoch-repeat data mixing (the materialization side of "
        "pipeline_domain_mix's bookkeeping): each source gets a repeat "
        "factor (0.25-2.25 here), every doc yields floor(f) copies plus "
        "one more when its seeded md5 fraction falls below frac(f) — "
        "the deterministic analog of sampling-with-replacement that "
        "multi-epoch pretraining mixes use. The Spark side REALLY "
        "explodes the copies (the materialization path); the oracle "
        "mirrors the aggregate algebraically. copies_checksum pins the "
        "per-doc copy counts, not just totals."
    ),
)
def pipeline_epoch_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize per-source epoch repeats and account for the output.

    Scale notes (100 TB): copies is a pure projection (no shuffle);
    the explode multiplies rows by the mixture's expansion factor only
    — skew-free because the repeat decision is per-doc hash, not
    per-source batching. Downstream shuffles (the final per-source agg
    here; in production the pack/shard stage) see the already-mixed
    stream. Fractional repeats never cluster: every doc keeps an
    independent hash draw, so a 0.25-factor source thins uniformly."""
    d = load_table(spark, sf_dir, "documents")
    f_ppm = (
        F.lit(250000)
        + (F.expr("CAST(substr(source, 4) AS BIGINT)") % 5) * F.lit(500000)
    )
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("epoch1:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    # stage f_ppm/h as real columns so the copy expression reads staged
    # values (the HOF re-inlining trap from CLAUDE.md)
    copies = (
        d.withColumn("f_ppm", f_ppm)
        .withColumn("h", h)
        .select(
            "doc_id",
            "source",
            "n_chars",
            (
                F.expr("f_ppm div 1000000")
                + F.when(F.col("h") < F.col("f_ppm") % 1000000, 1).otherwise(0)
            ).cast("bigint").alias("n_copies"),
        )
    )
    exploded = copies.filter(F.col("n_copies") > 0).withColumn(
        "copy_idx", F.explode(F.expr("sequence(1, n_copies)"))
    )
    per_doc = exploded.groupBy("doc_id", "source", "n_chars").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies")
    )
    # docs with zero copies still count toward n_docs
    zero = copies.filter(F.col("n_copies") == 0)
    return (
        per_doc.unionByName(zero)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_copies").cast("bigint").alias("n_instances"),
            F.sum(F.col("n_chars") * F.col("n_copies")).cast("bigint").alias("out_chars"),
            F.sum(F.col("doc_id") * F.col("n_copies")).cast("bigint").alias("copies_checksum"),
        )
    )


@register(
    "pipeline_intradoc_dedup",
    """
    WITH s AS (
      SELECT doc_id, source, string_split(text, '. ') AS sents
      FROM documents
    ), pos AS (
      SELECT doc_id, source,
             len(sents) AS n_sent,
             list_aggregate(list_transform(range(1, len(sents) + 1), i ->
               CASE WHEN list_position(sents, sents[i]) = i THEN 1 ELSE 0 END),
               'sum') AS kept,
             list_aggregate(list_transform(range(1, len(sents) + 1), i ->
               CASE WHEN list_position(sents, sents[i]) = i
                    THEN length(sents[i]) ELSE 0 END),
               'sum') AS kept_chars
      FROM s
    )
    SELECT source,
           CAST(count(*) AS BIGINT)           AS n_docs,
           CAST(sum(n_sent) AS BIGINT)        AS total_sentences,
           CAST(sum(kept) AS BIGINT)          AS kept_sentences,
           CAST(sum(kept_chars) AS BIGINT)    AS kept_chars
    FROM pos GROUP BY source
    """,
    doc=(
        "Intra-document exact sentence dedup (the within-doc half of "
        "Lee et al.'s training-data dedup): split on '. ', keep only "
        "each sentence's FIRST occurrence (array_position == own "
        "index), account kept sentences/chars per source. Pure "
        "projection + one bounded aggregate — no shuffle touches the "
        "sentence grain."
    ),
)
def pipeline_intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first sentence dedup inside each document.

    Scale notes (100 TB): the dedup decision is per-row array algebra
    (O(s^2) in a doc's sentence count, bounded by doc length caps) in
    whole-stage codegen — zero shuffles before the per-source rollup.
    The cross-doc complement is dedup_exact/minhash on chunk hashes
    (pipeline_chunk_overlap feeds those); this operator removes the
    boilerplate repetition INSIDE a page that survives cross-doc
    passes. The sentence array is staged through a select so the
    higher-order expressions are not re-inlined per reference."""
    d = load_table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", "source", F.split(F.col("text"), "\\. ", -1).alias("sents")
    )
    kept = (
        "aggregate(transform(sequence(1, size(sents)), i -> "
        "CASE WHEN array_position(sents, element_at(sents, i)) = i "
        "THEN {v} ELSE 0L END), 0L, (a, x) -> a + x)"
    )
    per_doc = staged.select(
        "source",
        F.expr("CAST(size(sents) AS BIGINT)").alias("n_sent"),
        F.expr(kept.format(v="1L")).alias("kept"),
        F.expr(
            kept.format(v="CAST(length(element_at(sents, i)) AS BIGINT)")
        ).alias("kept_chars"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_sent").cast("bigint").alias("total_sentences"),
        F.sum("kept").cast("bigint").alias("kept_sentences"),
        F.sum("kept_chars").cast("bigint").alias("kept_chars"),
    )


@register(
    "pipeline_dataset_card",
    """
    WITH base AS (
      SELECT source, lang, n_chars, md5(text) AS digest,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok
      FROM documents
    ), uniq AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_unique
      FROM (SELECT DISTINCT source, digest FROM base) GROUP BY source
    )
    SELECT b.source,
           CAST(count(*) AS BIGINT)                      AS n_docs,
           CAST(sum(b.n_chars) AS BIGINT)                AS total_chars,
           CAST(sum(b.n_tok) AS BIGINT)                  AS total_tokens,
           CAST(count(CASE WHEN b.lang = 'en' THEN 1 END) AS BIGINT) AS n_en,
           CAST(count(DISTINCT b.lang) AS BIGINT)        AS n_langs,
           CAST(min(u.n_unique) AS BIGINT)               AS n_unique,
           CAST((count(*) - min(u.n_unique)) * 1000000 // count(*) AS BIGINT)
             AS dup_ppm,
           CAST(sum(b.n_tok) // count(*) AS BIGINT)      AS avg_tokens
    FROM base b JOIN uniq u ON u.source = b.source
    GROUP BY b.source
    """,
    doc=(
        "Per-source dataset card — the one-pass report a dataset "
        "release ships: volume (docs/chars/tokens), language spread, "
        "exact-duplicate rate (md5-digest distinct), average length. "
        "Composes the engine's profiling + dedup accounting into one "
        "bounded output; every ratio is integer ppm/div."
    ),
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-readiness summary per corpus source.

    Scale notes (100 TB): one scan computes digests + token counts
    map-side; the distinct-digest count is the dedup_exact shuffle
    scoped per source; everything else folds into the same per-source
    aggregate. Output is |sources| rows regardless of corpus size —
    the shape a data-release pipeline materializes nightly."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "lang",
        "n_chars",
        F.md5("text").alias("digest"),
        F.expr("size(split(text, '\\\\s+'))").cast("bigint").alias("n_tok"),
    )
    uniq = (
        base.select("source", "digest")
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_unique"))
    )
    return (
        base.join(uniq, "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.count(F.when(F.col("lang") == "en", 1)).cast("bigint").alias("n_en"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.min("n_unique").cast("bigint").alias("n_unique"),
            F.expr("(count(1) - min(n_unique)) * 1000000 div count(1)")
            .cast("bigint")
            .alias("dup_ppm"),
            F.expr("sum(n_tok) div count(1)").cast("bigint").alias("avg_tokens"),
        )
    )


@register(
    "pipeline_gate_ablation",
    f"""
    WITH m AS (
      SELECT doc_id, lang,
             len({_TOKENS}) AS n_tok,
             list_aggregate(list_transform({_TOKENS},
               t -> CASE WHEN lower(t) IN ('the','a','of','and','to','in','is',
                                           'on','for','with') THEN 1 ELSE 0 END),
               'sum') * 1.0 / len({_TOKENS}) AS stop_r,
             list_aggregate(list_transform({_TOKENS}, t -> length(t)), 'sum')
               * 1.0 / len({_TOKENS}) AS awl,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
               * 1.0 / length(text) AS punct_r
      FROM documents
    ), g AS (
      SELECT lang,
             CASE WHEN n_tok BETWEEN 5 AND 5000 THEN 1 ELSE 0 END AS g_len,
             CASE WHEN stop_r >= 0.02 THEN 1 ELSE 0 END            AS g_stop,
             CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END  AS g_awl,
             CASE WHEN punct_r <= 0.2 THEN 1 ELSE 0 END            AS g_punct
      FROM m
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)                      AS n_docs,
           CAST(sum(g_len) AS BIGINT)                    AS pass_len,
           CAST(sum(g_stop) AS BIGINT)                   AS pass_stop,
           CAST(sum(g_awl) AS BIGINT)                    AS pass_awl,
           CAST(sum(g_punct) AS BIGINT)                  AS pass_punct,
           CAST(sum(g_len * g_stop) AS BIGINT)           AS cum_2,
           CAST(sum(g_len * g_stop * g_awl) AS BIGINT)   AS cum_3,
           CAST(sum(g_len * g_stop * g_awl * g_punct) AS BIGINT) AS survivors
    FROM g GROUP BY lang
    """,
    doc=(
        "Quality-gate ablation report: per language, each gate's solo "
        "pass count AND the cumulative survivorship as gates stack in "
        "pipeline order — the tuning artifact that shows WHICH rule "
        "eats the corpus (pipeline_quality_filter only shows the "
        "survivors). Same gate expressions as the filter, so the "
        "ablation is exactly the production gates, one scan, "
        "|langs|-bounded output."
    ),
)
def pipeline_gate_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-gate rejection accounting for the quality pipeline."""
    from the_movies_db_spark.operators import text as T

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    staged = d.select(
        "lang",
        F.size(toks).alias("n_tok"),
        T.stopword_ratio("text").alias("stop_r"),
        T.avg_token_length("text").alias("awl"),
        T.punct_ratio("text").alias("punct_r"),
    )
    g = staged.select(
        "lang",
        F.when(F.col("n_tok").between(5, 5000), 1).otherwise(0).alias("g_len"),
        F.when(F.col("stop_r") >= 0.02, 1).otherwise(0).alias("g_stop"),
        F.when(F.col("awl").between(2.0, 12.0), 1).otherwise(0).alias("g_awl"),
        F.when(F.col("punct_r") <= 0.2, 1).otherwise(0).alias("g_punct"),
    )
    return g.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("g_len").cast("bigint").alias("pass_len"),
        F.sum("g_stop").cast("bigint").alias("pass_stop"),
        F.sum("g_awl").cast("bigint").alias("pass_awl"),
        F.sum("g_punct").cast("bigint").alias("pass_punct"),
        F.sum(F.col("g_len") * F.col("g_stop")).cast("bigint").alias("cum_2"),
        F.sum(F.col("g_len") * F.col("g_stop") * F.col("g_awl"))
        .cast("bigint")
        .alias("cum_3"),
        F.sum(
            F.col("g_len") * F.col("g_stop") * F.col("g_awl") * F.col("g_punct")
        )
        .cast("bigint")
        .alias("survivors"),
    )


# integer linear quality classifier: fixed weights over exact integer
# features — the deterministic stand-in for a fastText-style quality
# model, with the same batch-scoring plan shape (per-row projection,
# no UDF, no shuffle until the report aggregate)
_CLS_STOPS = ",".join(f"'{w}'" for w in T.STOPWORDS["en"])
_CLS_THRESHOLD = 900


@register(
    "pipeline_classifier_gate",
    f"""
    WITH feats AS (
      SELECT doc_id, lang,
             len(toks) AS n_tok,
             list_aggregate(list_transform(toks,
               t -> CASE WHEN t IN ({_CLS_STOPS}) THEN 1 ELSE 0 END),
               'sum') AS stop_hits,
             len(list_distinct(toks)) AS n_distinct
      FROM (
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           t -> t <> '') AS toks
        FROM documents
      ) d
    ), scored AS (
      SELECT doc_id, lang,
             CAST(2 * stop_hits * 1000 // n_tok
                  + n_distinct * 1000 // n_tok
                  + least(n_tok, 500) AS BIGINT) AS score
      FROM feats WHERE n_tok > 0
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN score >= {_CLS_THRESHOLD} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pass,
           CAST(sum(CASE WHEN score >= {_CLS_THRESHOLD} THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS pass_ppm,
           CAST(sum(score) AS BIGINT) AS sum_score
    FROM scored GROUP BY lang
    """,
    doc=(
        "Model-based quality gate: a fixed-weight integer linear "
        "classifier (stopword density, type-token ratio, capped "
        "length — the features of a fastText quality model, scored "
        "without a UDF) gates each doc at a threshold; report = "
        "per-lang pass rates in exact ppm. The batch-inference plan "
        "shape every learned quality filter runs at corpus scale: "
        "pure projection scoring, one small report aggregate."
    ),
)
def pipeline_classifier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer linear quality-classifier gate with per-lang pass rates.

    Scale notes (100 TB): scoring is per-row expression arithmetic
    inside whole-stage codegen (a real model swaps in ONNX/pandas-UDF
    batches at the same seam); the only shuffle carries |langs| rows.
    All features and the score are exact BIGINTs, so the gate decision
    is bit-stable across engines and partitionings."""
    d = spread(load_table(spark, sf_dir, "documents"))
    feats = d.select(
        "doc_id",
        "lang",
        F.expr(
            "filter(split(lower(text), '\\\\s+'), t -> t != '')"
        ).alias("toks"),
    ).select(
        "doc_id",
        "lang",
        F.size("toks").cast("bigint").alias("n_tok"),
        F.expr(
            f"aggregate(transform(toks, t -> CASE WHEN t IN ({_CLS_STOPS})"
            " THEN 1 ELSE 0 END), 0L, (a, x) -> a + x)"
        ).alias("stop_hits"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
    )
    scored = feats.filter(F.col("n_tok") > 0).select(
        "lang",
        F.expr(
            "CAST(2 * stop_hits * 1000 div n_tok"
            " + n_distinct * 1000 div n_tok"
            " + least(n_tok, 500L) AS BIGINT)"
        ).alias("score"),
    )
    passed = F.sum(
        F.when(F.col("score") >= _CLS_THRESHOLD, 1).otherwise(0)
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        passed.cast("bigint").alias("n_pass"),
        F.expr(
            f"sum(CASE WHEN score >= {_CLS_THRESHOLD} THEN 1 ELSE 0 END)"
            " * 1000000 div count(*)"
        )
        .cast("bigint")
        .alias("pass_ppm"),
        F.sum("score").cast("bigint").alias("sum_score"),
    )


@register(
    "pipeline_tokenizer_fertility",
    f"""
    SELECT lang,
           CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                    t -> t <> ''))) AS BIGINT) AS n_words,
           CAST(sum(len(regexp_extract_all(text, '{T.TOKEN_PATTERN}')))
                AS BIGINT) AS n_pieces,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           CAST(sum(len(regexp_extract_all(text, '{T.TOKEN_PATTERN}')))
                * 1000000
                // sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                       t -> t <> ''))) AS BIGINT)
             AS fertility_ppm,
           CAST(sum(length(text)) * 1000
                // sum(len(regexp_extract_all(text, '{T.TOKEN_PATTERN}')))
                AS BIGINT) AS chars_per_piece_milli
    FROM documents
    GROUP BY lang
    """,
    doc=(
        "Tokenizer fertility per language: BPE-ish pieces per "
        "whitespace word (ppm) and chars per piece (milli) — the "
        "metric that decides how a tokenizer taxes each language's "
        "training budget. Pure per-row regex counts reduced map-side "
        "to |langs| rows; exact integer ratios."
    ),
)
def pipeline_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer cost profile (pieces/word, chars/piece).

    Scale notes (100 TB): both token counts are single-pass row
    expressions in whole-stage codegen; the aggregate carries 5
    BIGINTs per language. Swapping in a real BPE means one pandas-UDF
    count column at the same seam."""
    d = spread(load_table(spark, sf_dir, "documents"))
    per_row = d.select(
        "lang",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).cast("bigint").alias("__w"),
        T.regex_token_count("text").cast("bigint").alias("__p"),
        F.length("text").cast("bigint").alias("__c"),
    )
    return per_row.groupBy("lang").agg(
        F.sum("__w").cast("bigint").alias("n_words"),
        F.sum("__p").cast("bigint").alias("n_pieces"),
        F.sum("__c").cast("bigint").alias("n_chars"),
        F.expr("sum(__p) * 1000000 div sum(__w)").cast("bigint").alias(
            "fertility_ppm"
        ),
        F.expr("sum(__c) * 1000 div sum(__p)").cast("bigint").alias(
            "chars_per_piece_milli"
        ),
    )


@register(
    "pipeline_domain_temperature",
    """
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), w AS (
      SELECT source, n_docs,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
               AS weight_micro
      FROM counts
    )
    SELECT source, n_docs, weight_micro,
           CAST(weight_micro * 1000000 // sum(weight_micro) OVER ()
                AS BIGINT) AS share_ppm,
           CAST(weight_micro * 1000000000 // sum(weight_micro) OVER ()
                AS BIGINT) AS alloc_tokens
    FROM w
    """,
    doc=(
        "Temperature-scaled domain mixture (T=2: weights proportional "
        "to sqrt(n), the standard multilingual/domain rebalancing that "
        "upsamples small domains): per-source sampling share in exact "
        "ppm and a 1e9-token budget allocation. sqrt of an integer is "
        "correctly rounded IEEE in every engine, so floor(sqrt(n)*1e6) "
        "is engine-exact — the whole schedule is value-hash-verified."
    ),
)
def pipeline_domain_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T=2 temperature resampling weights + token budget per source.

    Scale notes (100 TB): one |sources|-row aggregate; the windows run
    over those few rows. Downstream, the per-source weights drive the
    deterministic hash sampler (pipeline_sample_weighted)."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    w = counts.withColumn(
        "weight_micro",
        F.expr(
            "CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)"
        ),
    )
    return w.select(
        "source",
        "n_docs",
        "weight_micro",
        F.expr("weight_micro * 1000000 div sum(weight_micro) OVER ()")
        .cast("bigint")
        .alias("share_ppm"),
        F.expr("weight_micro * 1000000000 div sum(weight_micro) OVER ()")
        .cast("bigint")
        .alias("alloc_tokens"),
    )


def _funnel_oracle() -> str:
    # import the MODULE (not just the registry) so the clustering
    # oracle is registered even when this module is imported directly,
    # outside load_all's ordering (dedup_queries has no import back
    # into this module, so the edge is acyclic)
    from the_movies_db_spark.queries import REGISTRY
    from the_movies_db_spark.queries import dedup_queries  # noqa: F401

    return _FUNNEL_SQL_TEMPLATE.replace(
        "{CLUSTERS}", REGISTRY["dedup_clusters"].oracle
    )


_FUNNEL_SQL_TEMPLATE = f"""
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             t -> t <> '')) AS n_tok,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         t -> t <> '') AS tl
      FROM documents
    ), scored AS (
      SELECT doc_id, n_tok,
             CAST(2 * list_aggregate(list_transform(tl,
                    t -> CASE WHEN t IN ({_CLS_STOPS}) THEN 1 ELSE 0 END),
                    'sum') * 1000 // n_tok
                  + len(list_distinct(tl)) * 1000 // n_tok
                  + least(n_tok, 500) AS BIGINT) AS score
      FROM toks WHERE n_tok > 0
    ), gated AS (
      SELECT doc_id, n_tok FROM scored WHERE score >= {_CLS_THRESHOLD}
    ), clusters AS ({{CLUSTERS}}),
    canon AS (
      SELECT cluster_id, doc_id AS canonical_doc FROM (
        SELECT c.cluster_id, c.doc_id,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY d.n_chars DESC, c.doc_id) AS rn
        FROM clusters c JOIN documents d USING (doc_id)
      ) t WHERE rn = 1
    ), dropped AS (
      SELECT doc_id FROM clusters
      WHERE doc_id NOT IN (SELECT canonical_doc FROM canon)
    ), deduped AS (
      SELECT g.doc_id, g.n_tok FROM gated g
      WHERE g.doc_id NOT IN (SELECT doc_id FROM dropped)
    ), chunks AS (
      SELECT doc_id,
             CASE WHEN n_tok <= 128 THEN 1
                  ELSE 1 + (n_tok - 128 + 95) // 96 END AS n_chunks
      FROM deduped
    )
    SELECT stage, n_units, n_tokens FROM (
      SELECT 'a_raw' AS stage, CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM toks
      UNION ALL
      SELECT 'b_gated', CAST(count(*) AS BIGINT),
             CAST(sum(n_tok) AS BIGINT) FROM gated
      UNION ALL
      SELECT 'c_deduped', CAST(count(*) AS BIGINT),
             CAST(sum(n_tok) AS BIGINT) FROM deduped
      UNION ALL
      SELECT 'd_chunks', CAST(sum(n_chunks) AS BIGINT),
             CAST(sum(n_chunks) * 128 AS BIGINT) FROM chunks
    ) t
    """


@register(
    "pipeline_curation_funnel",
    _funnel_oracle(),
    doc=(
        "The curation FUNNEL: raw -> classifier gate -> near-dup "
        "survivorship (non-canonical cluster members dropped) -> "
        "128-token/96-stride chunks, with doc and token yield at every "
        "stage — the one-glance report that says what each stage costs "
        "the training set. Every stage NESTS its shipped oracle "
        "(classifier formula, recursive-CTE clustering, canonical "
        "election), so the funnel verifies the composed pipeline, not "
        "per-stage stand-ins."
    ),
)
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage doc/token yield of the composed curation path.

    Scale notes (100 TB): ONE tokenize/gate pass — every doc row
    carries its stage flags (gated, dropped-by-dedup) and chunk count,
    and all four stage yields come from a single conditional aggregate
    unpivoted with ``stack`` (the round-4 basket-mining lesson: stage
    branches over a shared subtree re-execute it per branch — r5 shape
    tokenized the corpus 4x and ran the gate 3x). The LSH clustering
    subtree executes once regardless (connected_components
    localCheckpoints), and the non-canonical 'dropped' set comes from
    one window over the checkpointed clusters (rn > 1), not a
    canon-vs-clusters anti-join that would read clusters twice. Final
    plan reads documents twice (tokenize pass + the n_chars canon
    ranking) — pinned in tests/test_plans.py."""
    from the_movies_db_spark.operators import dedup as DD

    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").alias(
            "tl"
        ),
    ).select("doc_id", "tl", F.size("tl").cast("bigint").alias("n_tok"))
    # score only defined for n_tok > 0 (the CASE guards the div); the
    # gate flag is therefore false for empty docs, matching the r5
    # filter-then-score shape
    scored = toks.select(
        "doc_id",
        "n_tok",
        F.expr(
            "CASE WHEN n_tok > 0 THEN"
            f" CAST(2 * aggregate(transform(tl, t -> CASE WHEN t IN"
            f" ({_CLS_STOPS}) THEN 1 ELSE 0 END), 0L, (a, x) -> a + x)"
            " * 1000 div n_tok"
            " + size(array_distinct(tl)) * 1000 div n_tok"
            " + least(n_tok, 500L) AS BIGINT) END"
        ).alias("score"),
    )
    from the_movies_db_spark.queries.dedup_queries import (
        _NUM_BANDS,
        _NUM_HASHES,
    )

    pairs = DD.minhash_lsh_dedup_pairs(
        d, "doc_id", "text", threshold=0.2,
        num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=3,
    )
    clusters = DD.connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    wc = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    dropped = (
        clusters.join(d.select("doc_id", "n_chars"), "doc_id")
        .withColumn("__rn", F.row_number().over(wc))
        .filter(F.col("__rn") > 1)
        .select("doc_id", F.lit(True).alias("__dropped"))
    )
    flagged = scored.join(dropped, "doc_id", "left").select(
        "n_tok",
        (F.col("score") >= _CLS_THRESHOLD).alias("__g"),
        (
            (F.col("score") >= _CLS_THRESHOLD)
            & F.col("__dropped").isNull()
        ).alias("__k"),
        F.expr(
            "CASE WHEN n_tok <= 128 THEN 1"
            " ELSE 1 + (n_tok - 128 + 95) div 96 END"
        ).alias("__chunks"),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("a_u"),
        F.sum("n_tok").cast("bigint").alias("a_t"),
        F.count_if("__g").cast("bigint").alias("b_u"),
        F.sum(F.when(F.col("__g"), F.col("n_tok"))).cast("bigint").alias("b_t"),
        F.count_if("__k").cast("bigint").alias("c_u"),
        F.sum(F.when(F.col("__k"), F.col("n_tok"))).cast("bigint").alias("c_t"),
        F.sum(F.when(F.col("__k"), F.col("__chunks")))
        .cast("bigint")
        .alias("d_u"),
    )
    return agg.select(
        F.expr(
            "stack(4,"
            " 'a_raw', a_u, a_t,"
            " 'b_gated', b_u, b_t,"
            " 'c_deduped', c_u, c_t,"
            " 'd_chunks', d_u, CAST(d_u * 128 AS BIGINT)"
            ") AS (stage, n_units, n_tokens)"
        )
    )


@register(
    "pipeline_mixture_greedy",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         t -> t <> '') AS tl
      FROM documents
    ), scored AS (
      SELECT doc_id, source,
             CAST(len(tl) AS BIGINT) AS n_tok,
             CAST(2 * list_aggregate(list_transform(tl,
                    t -> CASE WHEN t IN ({_CLS_STOPS}) THEN 1 ELSE 0 END),
                    'sum') * 1000 // len(tl)
                  + len(list_distinct(tl)) * 1000 // len(tl)
                  + least(len(tl), 500) AS BIGINT) AS score
      FROM toks WHERE len(tl) > 0
    ), c AS (
      SELECT source, n_tok,
             CAST(sum(n_tok) OVER (ORDER BY score DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
             CAST(sum(n_tok) OVER () AS BIGINT) AS tot
      FROM scored
    )
    SELECT source,
           CAST(count(*) AS BIGINT)  AS docs_total,
           CAST(sum(n_tok) AS BIGINT) AS tokens_total,
           CAST(count(*) FILTER (WHERE cum <= tot // 2) AS BIGINT)
             AS docs_taken,
           CAST(coalesce(sum(n_tok) FILTER (WHERE cum <= tot // 2), 0)
                AS BIGINT) AS tokens_taken,
           CAST(coalesce(sum(n_tok) FILTER (WHERE cum <= tot // 2), 0)
                * 1000000 // sum(n_tok) AS BIGINT) AS take_ppm
    FROM c
    GROUP BY source
    """,
    doc=(
        "Greedy mixture fill: rank the whole corpus by classifier "
        "quality score (best first), take documents until HALF the "
        "corpus token budget is spent (budget = tot div 2, the same "
        "integer formula on both sides), report per-source yield — "
        "the budgeted-mixture selection step that decides what each "
        "source contributes to a fixed-size training run. The greedy "
        "prefix is defined by the INCLUSIVE running token count over "
        "(score DESC, doc_id), computed distributed."
    ),
)
def pipeline_mixture_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-capped greedy quality mixture, per-source yield.

    Scale notes (100 TB): one tokenize/score pass; the corpus-grain
    running token sum is operators/ranks.py:global_cumsum (per-bucket
    windows + 64-row broadcast offsets — never a single-partition
    sort), with STATIC score bounds (the classifier score lies in
    [0, 3500] by construction) so no lineage re-execution for a
    (min, max) job; the grand total rides the same broadcast. Final
    rollup is one |sources|-row aggregate."""
    from the_movies_db_spark.operators.ranks import global_cumsum

    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        "source",
        F.expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").alias(
            "tl"
        ),
    )
    scored = toks.filter(F.size("tl") > 0).select(
        "doc_id",
        "source",
        F.size("tl").cast("bigint").alias("n_tok"),
        F.expr(
            f"CAST(2 * aggregate(transform(tl, t -> CASE WHEN t IN"
            f" ({_CLS_STOPS}) THEN 1 ELSE 0 END), 0L, (a, x) -> a + x)"
            " * 1000 div size(tl)"
            " + size(array_distinct(tl)) * 1000 div size(tl)"
            " + least(size(tl), 500L) AS BIGINT)"
        ).alias("score"),
    )
    keyed = scored.withColumn("__ord", (-F.col("score")).cast("bigint"))
    c = global_cumsum(
        keyed, "__ord", ["doc_id"], "n_tok", out="cum",
        bounds=(-3500, 0), total_out="tot", materialize=True,
    )
    taken = F.col("cum") <= F.expr("tot div 2")
    return c.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_total"),
        F.sum("n_tok").cast("bigint").alias("tokens_total"),
        F.count_if(taken).cast("bigint").alias("docs_taken"),
        F.coalesce(F.sum(F.when(taken, F.col("n_tok"))), F.lit(0))
        .cast("bigint")
        .alias("tokens_taken"),
        F.expr(
            "coalesce(sum(CASE WHEN cum <= tot div 2 THEN n_tok END), 0)"
            " * 1000000 div sum(n_tok)"
        )
        .cast("bigint")
        .alias("take_ppm"),
    )


_DOC_H_SQL = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
    " AS BIGINT) % 10"
)


def _split_leakage_oracle() -> str:
    from the_movies_db_spark.queries import REGISTRY
    from the_movies_db_spark.queries import dedup_queries  # noqa: F401

    return f"""
    WITH pairs AS ({REGISTRY["dedup_minhash_lsh"].oracle}),
    s AS (
      SELECT doc_id,
             CASE WHEN {_DOC_H_SQL} <= 7 THEN 'train'
                  WHEN {_DOC_H_SQL} = 8  THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT least(sa.split, sb.split)    AS split_lo,
           greatest(sa.split, sb.split) AS split_hi,
           CASE WHEN sa.split = sb.split THEN 0 ELSE 1 END AS leaked,
           CAST(count(*) AS BIGINT)     AS n_pairs
    FROM pairs p
    JOIN s sa ON p.id_a = sa.doc_id
    JOIN s sb ON p.id_b = sb.doc_id
    GROUP BY 1, 2, 3
    """


@register(
    "pipeline_split_leakage",
    _split_leakage_oracle(),
    doc=(
        "Split-contamination audit: assign the NAIVE per-document "
        "80/10/10 hash split, then count how many LSH near-dup pairs "
        "straddle split boundaries (leaked=1 rows) — the measurement "
        "that justifies pipeline_split_by_source's source-level "
        "bucketing (under which near-dups from one origin can never "
        "leak). Nests the SHIPPED minhash-LSH pair oracle, so the "
        "audit verifies the composed pipeline, not a stand-in."
    ),
)
def pipeline_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs crossing naive train/valid/test boundaries.

    Scale notes (100 TB): candidate pairs come from the banded LSH
    equi-join (never all-pairs); split assignment is a pure hash
    projection joined to each pair side — at scale it rides the same
    scan that produced the shingles. Output is a bounded 3x3 split
    matrix."""
    from the_movies_db_spark.operators import dedup as DD
    from the_movies_db_spark.queries.dedup_queries import (
        _NUM_BANDS,
        _NUM_HASHES,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    pairs = DD.minhash_lsh_dedup_pairs(
        d, "doc_id", "text", threshold=0.2,
        num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=3,
    )
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10
    )
    split = (
        F.when(h <= 7, F.lit("train"))
        .when(h == 8, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    s = d.select("doc_id", split.alias("split"))
    sa = s.select(F.col("doc_id").alias("id_a"), F.col("split").alias("__sa"))
    sb = s.select(F.col("doc_id").alias("id_b"), F.col("split").alias("__sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("__sa", "__sb").alias("split_lo"),
            F.greatest("__sa", "__sb").alias("split_hi"),
            F.expr("CASE WHEN __sa = __sb THEN 0 ELSE 1 END").alias("leaked"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


def _quality_calibration_oracle() -> str:
    from the_movies_db_spark.queries import REGISTRY
    from the_movies_db_spark.queries import dedup_queries  # noqa: F401

    return f"""
    WITH pairs AS ({REGISTRY["dedup_minhash_lsh"].oracle}),
    dup AS (
      SELECT DISTINCT doc_id FROM (
        SELECT id_a AS doc_id FROM pairs
        UNION ALL SELECT id_b FROM pairs
      ) u
    ), toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         t -> t <> '') AS tl
      FROM documents
    ), scored AS (
      SELECT doc_id,
             CAST(2 * list_aggregate(list_transform(tl,
                    t -> CASE WHEN t IN ({_CLS_STOPS}) THEN 1 ELSE 0 END),
                    'sum') * 1000 // len(tl)
                  + len(list_distinct(tl)) * 1000 // len(tl)
                  + least(len(tl), 500) AS BIGINT) AS score
      FROM toks WHERE len(tl) > 0
    ), decs AS (
      SELECT s.doc_id, s.score,
             ntile(10) OVER (ORDER BY s.score, s.doc_id) AS decile,
             CASE WHEN d.doc_id IS NULL THEN 0 ELSE 1 END AS is_dup
      FROM scored s LEFT JOIN dup d ON s.doc_id = d.doc_id
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_dup) AS BIGINT) AS n_dup,
           CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT) AS dup_ppm,
           CAST(min(score) AS BIGINT) AS min_score,
           CAST(max(score) AS BIGINT) AS max_score
    FROM decs GROUP BY decile
    """


@register(
    "pipeline_quality_calibration",
    _quality_calibration_oracle(),
    doc=(
        "Quality-score CALIBRATION against duplication: corpus split "
        "into classifier-score deciles (decile 1 = worst), each "
        "decile's near-dup membership rate in exact ppm — the check "
        "that tells you whether the quality gate and the dedup stage "
        "are redundant or complementary (dup mass concentrated in low "
        "deciles = the gate already removes it). Nests BOTH shipped "
        "oracles (classifier formula, banded minhash pairs); the "
        "decile is the distributed two-level rank with the exact "
        "ntile identity."
    ),
)
def pipeline_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score deciles x LSH dup density — calibration of gate vs dedup.

    Scale notes (100 TB): one tokenize/score pass feeding the
    materialized two-level rank (no single-partition ntile); dup
    membership is the banded LSH pair set reduced to a distinct-id
    table joined back by id; output is 10 rows."""
    from the_movies_db_spark.operators import dedup as DD
    from the_movies_db_spark.operators.ranks import global_row_number
    from the_movies_db_spark.queries.dedup_queries import (
        _NUM_BANDS,
        _NUM_HASHES,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").alias(
            "tl"
        ),
    )
    scored = toks.filter(F.size("tl") > 0).select(
        "doc_id",
        F.expr(
            f"CAST(2 * aggregate(transform(tl, t -> CASE WHEN t IN"
            f" ({_CLS_STOPS}) THEN 1 ELSE 0 END), 0L, (a, x) -> a + x)"
            " * 1000 div size(tl)"
            " + size(array_distinct(tl)) * 1000 div size(tl)"
            " + least(size(tl), 500L) AS BIGINT)"
        ).alias("score"),
    )
    ranked = global_row_number(
        scored, "score", ["doc_id"], out="__rnk",
        bounds=(0, 3500), total_out="__n", materialize=True,
    )
    pairs = DD.minhash_lsh_dedup_pairs(
        d, "doc_id", "text", threshold=0.2,
        num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=3,
    )
    dup = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("__d", F.lit(1))
    )
    from the_movies_db_spark.operators.ranks import ntile_expr

    decs = ranked.join(dup, "doc_id", "left").select(
        "score",
        F.expr(ntile_expr("__rnk", "__n", 10)).alias("decile"),
        F.coalesce("__d", F.lit(0)).alias("is_dup"),
    )
    return decs.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("is_dup").cast("bigint").alias("n_dup"),
        F.expr("sum(is_dup) * 1000000 div count(*)")
        .cast("bigint")
        .alias("dup_ppm"),
        F.min("score").cast("bigint").alias("min_score"),
        F.max("score").cast("bigint").alias("max_score"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting: target-domain resampling scores
# ---------------------------------------------------------------------------

_DSIR_TOP = 15
_DSIR_W = (
    "CAST(floor(ln(CAST((c_tgt + 1) * (t_raw + v) AS DOUBLE)"
    " / CAST((c_raw + 1) * (t_tgt + v) AS DOUBLE)) * 1000000) AS BIGINT)"
)


@register(
    "pipeline_importance_dsir",
    f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    stats AS (
      SELECT term, CAST(count(*) AS BIGINT) AS c_raw,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS c_tgt
      FROM tok GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(c_raw) AS BIGINT) AS t_raw,
             CAST(sum(c_tgt) AS BIGINT) AS t_tgt,
             CAST(count(*) AS BIGINT) AS v
      FROM stats
    ),
    wt AS (
      SELECT term, {_DSIR_W} AS w_micro
      FROM stats CROSS JOIN tot
    ),
    doc AS (
      SELECT t.doc_id, t.lang, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(x.w_micro) AS BIGINT) AS s
      FROM tok t JOIN wt x ON t.term = x.term
      GROUP BY 1, 2
    )
    SELECT doc_id, lang, n_tokens, CAST(s // n_tokens AS BIGINT) AS dsir_micro
    FROM doc
    ORDER BY dsir_micro DESC, doc_id
    LIMIT {_DSIR_TOP}
    """,
    doc=(
        "DSIR-style importance weighting (Xie et al. 2023): per-token "
        "log-ratio of target-domain (lang='en') vs raw unigram "
        "probabilities with add-1 smoothing, averaged per document — "
        "the importance-resampling score that up-weights raw docs "
        "distributionally closest to the target domain. Per-term "
        "weights are floored to micro BEFORE the per-doc sum, so the "
        "accumulation is exact BIGINT and the top-15 is engine-exact."
    ),
)
def pipeline_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-resampling scores against a target domain.

    Scale notes (100 TB): one shuffle builds the vocab-bounded term
    table (c_raw + c_tgt as conditional sums in the SAME aggregation —
    no second stats pass); smoothing totals are a 1-row aggregate OF
    that table, broadcast back. Scoring re-shuffles the token stream
    once on term against the weight table, then reduces per doc. The
    corpus is tokenized twice (stats pass + scoring pass) — at 100 TB
    persist the weight table instead of the token stream (vocab-sized,
    not corpus-sized). The (count+1)*(total+V) products approach int64
    around 1e18 joint token counts — downscale totals to kilotokens
    there (the ratio is scale-invariant)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("filter(split(lower(text), '\\\\s+'), x -> x != '')")
        ).alias("term"),
    )
    stats = (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c_raw"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("bigint")
            .alias("c_tgt"),
        )
        # vocab-bounded; checkpointed so the totals branch and the
        # weight projection don't each re-run the corpus tokenization
        .localCheckpoint(eager=False)
    )
    tot = stats.agg(
        F.sum("c_raw").cast("bigint").alias("t_raw"),
        F.sum("c_tgt").cast("bigint").alias("t_tgt"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    wt = stats.crossJoin(F.broadcast(tot)).select(
        "term", F.expr(_DSIR_W).alias("w_micro")
    )
    doc = (
        tok.join(wt, "term")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("w_micro").cast("bigint").alias("s"),
        )
    )
    return (
        doc.select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr("CAST(s div n_tokens AS BIGINT)").alias("dsir_micro"),
        )
        .orderBy(F.desc("dsir_micro"), F.asc("doc_id"))
        .limit(_DSIR_TOP)
    )


# ---------------------------------------------------------------------------
# Marginal n-gram novelty over corpus order (diminishing-returns curve)
# ---------------------------------------------------------------------------


@register(
    "pipeline_ngram_novelty",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    big AS (
      SELECT DISTINCT doc_id,
             p[1] || ' ' || p[2] AS bg
      FROM (
        SELECT doc_id, unnest(list_zip(t[:len(t)-1], t[2:])) AS p
        FROM toks WHERE len(t) >= 2
      )
    ),
    firsts AS (SELECT bg, CAST(min(doc_id) AS BIGINT) AS first_doc
               FROM big GROUP BY 1),
    mx AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS n_ids FROM documents),
    marked AS (
      SELECT b.doc_id * 10 // m.n_ids AS decile,
             b.doc_id,
             CASE WHEN f.first_doc = b.doc_id THEN 1 ELSE 0 END AS novel
      FROM big b JOIN firsts f ON b.bg = f.bg CROSS JOIN mx m
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(novel) AS BIGINT) AS n_novel,
           CAST((sum(novel) // count(*)) * 1000000
                + ((sum(novel) % count(*)) * 1000 // count(*)) * 1000
                + (((sum(novel) % count(*)) * 1000 % count(*)) * 1000
                   // count(*)) AS BIGINT) AS novel_ppm
    FROM marked GROUP BY 1
    """,
    doc=(
        "Marginal bigram novelty by corpus-order decile: a bigram is "
        "novel in the doc where it FIRST appears (min doc_id over the "
        "corpus), so the per-decile novel share is the "
        "diminishing-returns curve of adding more data — the "
        "quantitative case for dedup + curation over raw volume "
        "(novelty collapsing toward zero = the corpus is repeating "
        "itself). Uses the first-appearance trick from the Heaps "
        "curve: ONE vocab-bounded min aggregate, never re-tokenize "
        "per prefix."
    ),
)
def pipeline_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile share of first-appearance bigrams.

    Scale notes (100 TB): one explode to distinct (doc, bigram), one
    vocab-bounded min-reduce for first appearances, one equi-join back
    on the bigram key, one decile aggregate — all combining hash
    aggregates; the decile cut is integer arithmetic on doc_id with a
    single broadcast scalar (max id), no sort and no window."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "").alias("t"),
    )
    big = (
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.expr("slice(t, 1, size(t) - 1)"),
                    F.expr("slice(t, 2, size(t) - 1)"),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("bg"),
        )
        .distinct()
    )
    firsts = big.groupBy("bg").agg(
        F.min("doc_id").cast("bigint").alias("first_doc")
    )
    mx = d.agg(F.expr("CAST(max(doc_id) + 1 AS BIGINT)").alias("n_ids"))
    marked = (
        big.join(firsts, "bg")
        .crossJoin(F.broadcast(mx))
        .select(
            F.expr("doc_id * 10 div n_ids").alias("decile"),
            "doc_id",
            F.expr(
                "CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END"
            ).alias("novel"),
        )
    )
    return marked.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("novel").cast("bigint").alias("n_novel"),
        # overflow-free ppm (bigram counts can exceed ~9.2e12 at scale)
        F.expr(
            "CAST((sum(novel) div count(*)) * 1000000"
            " + ((sum(novel) % count(*)) * 1000 div count(*)) * 1000"
            " + (((sum(novel) % count(*)) * 1000 % count(*)) * 1000"
            " div count(*)) AS BIGINT)"
        ).alias("novel_ppm"),
    )


# ---------------------------------------------------------------------------
# Feature-hashing (hashing trick) collision design table
# ---------------------------------------------------------------------------


@register(
    "pipeline_feature_hashing",
    """
    WITH vals AS (
      SELECT DISTINCT event_type || ':' || CAST(user_id % 1000 AS VARCHAR)
               AS fv
      FROM events
    ),
    h AS (
      SELECT fv, CAST(('0x' || substr(md5(fv), 1, 8)) AS BIGINT) AS h32
      FROM vals
    ),
    b(n_buckets) AS (VALUES (64), (256), (1024)),
    loads AS (
      SELECT b.n_buckets, h.h32 % b.n_buckets AS bkt,
             CAST(count(*) AS BIGINT) AS ld
      FROM h CROSS JOIN b GROUP BY 1, 2
    )
    SELECT CAST(n_buckets AS BIGINT) AS n_buckets,
           CAST(sum(ld) AS BIGINT) AS n_values,
           CAST(count(*) AS BIGINT) AS n_occupied,
           CAST(coalesce(sum(CASE WHEN ld > 1 THEN ld END), 0) AS BIGINT)
             AS n_colliding_values,
           CAST(coalesce(sum(CASE WHEN ld > 1 THEN ld END), 0) * 1000000
                // sum(ld) AS BIGINT) AS collision_ppm,
           CAST(max(ld) AS BIGINT) AS max_bucket_load
    FROM loads GROUP BY 1
    """,
    doc=(
        "Feature-hashing design table: the (event_type x user-bucket) "
        "cross feature is hashed into 64/256/1024 buckets via a 32-bit "
        "md5 prefix, reporting occupied buckets, the share of feature "
        "values that collide, and the max bucket load — exactly the "
        "table you consult before choosing the hashing-trick width for "
        "a model's categorical crosses (collisions alias gradients; "
        "too wide wastes parameters). Per-engine hex extraction, "
        "shared integer arithmetic."
    ),
)
def pipeline_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collision profile of the hashing trick at three widths.

    Scale notes (100 TB): the value domain is deduped FIRST (one
    combining distinct), so the 3-width cross join touches |values|
    rows, never events; everything after is bucket-grain."""
    ev = load_table(spark, sf_dir, "events")
    vals = ev.select(
        F.expr(
            "event_type || ':' || CAST(user_id % 1000 AS STRING)"
        ).alias("fv")
    ).distinct()
    h = vals.select(
        F.expr(
            "CAST(conv(substring(md5(fv), 1, 8), 16, 10) AS BIGINT)"
        ).alias("h32")
    )
    b = spark.createDataFrame([(64,), (256,), (1024,)], "n_buckets int")
    loads = (
        h.crossJoin(F.broadcast(b))
        .groupBy("n_buckets", F.expr("h32 % n_buckets").alias("bkt"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("ld"))
    )
    return loads.groupBy(
        F.col("n_buckets").cast("bigint").alias("n_buckets")
    ).agg(
        F.sum("ld").cast("bigint").alias("n_values"),
        F.count(F.lit(1)).cast("bigint").alias("n_occupied"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN ld > 1 THEN ld END), 0) AS BIGINT)"
        ).alias("n_colliding_values"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN ld > 1 THEN ld END), 0) * 1000000"
            " div sum(ld) AS BIGINT)"
        ).alias("collision_ppm"),
        F.max("ld").cast("bigint").alias("max_bucket_load"),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rule bundle (repetition / length / symbol heuristics)
# ---------------------------------------------------------------------------

#: stopword membership count as an explicit indicator sum — both
#: engines' set-intersection helpers differ on dedup semantics, so the
#: rule is written as ten exact `contains` indicators instead.
_GOPHER_STOP = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

#: (rule name, shared predicate over the integer doc metrics). Every
#: predicate is pure integer cross-multiplication — no float ratios —
#: so the per-doc booleans are engine-exact by construction.
_GOPHER_RULES = (
    ("min_words", "n_tok >= 20"),
    ("max_words", "n_tok <= 80"),
    ("mean_word_len", "3 * n_tok <= sum_len AND sum_len <= 8 * n_tok"),
    ("distinct_fraction", "2 * n_dist >= n_tok"),
    ("alpha_fraction", "5 * n_alpha >= 4 * n_tok"),
    ("stopword_count", "n_stop >= 2"),
)


def _gopher_flag(pred: str) -> str:
    return f"CAST(CASE WHEN {pred} THEN 1 ELSE 0 END AS BIGINT)"


@register(
    "pipeline_gopher_rules",
    f"""
    WITH tk AS (
      SELECT regexp_split_to_array(text, '\\s+') AS tk FROM documents
    ), m AS (
      SELECT CAST(len(tk) AS BIGINT) AS n_tok,
             CAST(list_aggregate(list_transform(tk, t -> length(t)), 'sum')
                  AS BIGINT) AS sum_len,
             CAST(len(list_distinct(tk)) AS BIGINT) AS n_dist,
             CAST(list_aggregate(list_transform(tk,
                    t -> CASE WHEN regexp_matches(t, '^[a-zA-Z]+$')
                              THEN 1 ELSE 0 END), 'sum') AS BIGINT)
               AS n_alpha,
             CAST({' + '.join(f"(CASE WHEN list_contains(tk, '{w}') THEN 1 ELSE 0 END)" for w in _GOPHER_STOP)}
                  AS BIGINT) AS n_stop
      FROM tk
    ), f AS (
      SELECT {', '.join(f'{_gopher_flag(p)} AS r_{n}' for n, p in _GOPHER_RULES)},
             {_gopher_flag(' AND '.join(p for _, p in _GOPHER_RULES))} AS r_all
      FROM m
    ), a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             {', '.join(f'CAST(sum(r_{n}) AS BIGINT) AS p_{n}' for n, _ in _GOPHER_RULES)},
             CAST(sum(r_all) AS BIGINT) AS p_all
      FROM f
    )
    {' UNION ALL '.join(
        f"SELECT '{n}' AS rule, n_docs, p_{n} AS n_pass, "
        f"CAST(p_{n} * 1000000 // n_docs AS BIGINT) AS pass_ppm FROM a"
        for n, _ in _GOPHER_RULES
    )}
    UNION ALL
    SELECT 'all_rules' AS rule, n_docs, p_all AS n_pass,
           CAST(p_all * 1000000 // n_docs AS BIGINT) AS pass_ppm FROM a
    """,
    doc=(
        "Gopher-style quality rule bundle (Rae et al. 2021 heuristics "
        "re-expressed over the documents table): word-count bounds, "
        "mean-word-length band, distinct-token fraction, alphabetic-"
        "word fraction, and minimum stopword hits, each reported as a "
        "per-rule pass rate plus the all-rules survivor rate — the "
        "first screening stage of every large-scale pretraining "
        "curation pipeline. All predicates are integer cross-"
        "multiplications over per-doc token metrics (no float "
        "ratios), so both engines agree bit-for-bit."
    ),
)
def pipeline_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule pass rates for the Gopher quality heuristics.

    Scale notes (100 TB): one corpus scan projects five integer
    metrics per doc (the token array is staged once in its own select
    so each higher-order expression is compiled once, not re-inlined);
    the rule booleans collapse map-side into a single 1-row aggregate,
    and the 7-row output is a driver-side explode of that row."""
    d = load_table(spark, sf_dir, "documents")
    tk = d.select(F.expr("split(text, '\\\\s+')").alias("tk"))
    contains = " + ".join(
        f"(CASE WHEN array_contains(tk, '{w}') THEN 1 ELSE 0 END)"
        for w in _GOPHER_STOP
    )
    m = tk.select(
        F.expr("CAST(size(tk) AS BIGINT)").alias("n_tok"),
        F.expr(
            "aggregate(transform(tk, t -> CAST(length(t) AS BIGINT)),"
            " 0L, (a, x) -> a + x)"
        ).alias("sum_len"),
        F.expr("CAST(size(array_distinct(tk)) AS BIGINT)").alias("n_dist"),
        F.expr(
            "aggregate(transform(tk, t -> CASE WHEN t RLIKE '^[a-zA-Z]+$'"
            " THEN 1L ELSE 0L END), 0L, (a, x) -> a + x)"
        ).alias("n_alpha"),
        F.expr(f"CAST({contains} AS BIGINT)").alias("n_stop"),
    )
    f = m.select(
        *[
            F.expr(_gopher_flag(p)).alias(f"r_{n}")
            for n, p in _GOPHER_RULES
        ],
        F.expr(
            _gopher_flag(" AND ".join(p for _, p in _GOPHER_RULES))
        ).alias("r_all"),
    )
    a = f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        *[
            F.sum(f"r_{n}").cast("bigint").alias(f"p_{n}")
            for n, _ in _GOPHER_RULES
        ],
        F.sum("r_all").cast("bigint").alias("p_all"),
    )
    structs = ", ".join(
        f"named_struct('rule', '{n}', 'n_docs', n_docs, 'n_pass', p_{n},"
        f" 'pass_ppm', CAST(p_{n} * 1000000 div n_docs AS BIGINT))"
        for n, _ in _GOPHER_RULES
    )
    structs += (
        ", named_struct('rule', 'all_rules', 'n_docs', n_docs,"
        " 'n_pass', p_all,"
        " 'pass_ppm', CAST(p_all * 1000000 div n_docs AS BIGINT))"
    )
    return a.select(
        F.explode(F.expr(f"array({structs})")).alias("p")
    ).select("p.*")


# ---------------------------------------------------------------------------
# Span-corruption mask planning (T5 objective, deterministic seeded layout)
# ---------------------------------------------------------------------------

#: ~15% corruption at mean span length 3 => one span per 20 tokens.
_SPANC_TOKENS_PER_SPAN = 20
_SPANC_SPAN_LEN = 3


def _spanc_doc_sql(h_expr: str, div: str) -> str:
    """Per-doc span plan (shared between engines up to the md5-integer
    extraction ``h_expr`` and the integer-division token): n_spans
    segments, one span per segment, seeded start offset inside each
    segment — non-overlapping by construction."""
    return f"""
      SELECT lang, n_tok,
             n_spans,
             n_spans * least({_SPANC_SPAN_LEN}, n_tok {div} n_spans)
               AS masked,
             sl - least({_SPANC_SPAN_LEN}, sl) + 1 AS slots,
             {h_expr}
      FROM (
        SELECT lang, n_tok,
               greatest(1, n_tok {div} {_SPANC_TOKENS_PER_SPAN}) AS n_spans,
               n_tok {div} greatest(1, n_tok {div} {_SPANC_TOKENS_PER_SPAN})
                 AS sl,
               doc_id
        FROM toks WHERE n_tok >= {_SPANC_SPAN_LEN + 1}
      ) base
    """


@register(
    "pipeline_span_corruption",
    f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
               AS n_tok
      FROM documents
    ),
    plan AS (
      {_spanc_doc_sql(
          "list_transform(range(1, n_spans + 1), k -> "
          "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' "
          "|| CAST(k AS VARCHAR)), 1, 8))::BIGINT) AS hs", "//")}
    ),
    spans AS (
      SELECT lang, n_tok, n_spans, masked,
             list_aggregate(list_transform(hs, h -> h % slots), 'sum')
               AS start_sum
      FROM plan
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(n_spans) AS BIGINT) AS n_spans,
           CAST(sum(masked) AS BIGINT) AS masked_tokens,
           CAST(sum(masked) * 1000000 // sum(n_tok) AS BIGINT)
             AS mask_ratio_ppm,
           CAST(sum(start_sum) AS BIGINT) AS start_checksum
    FROM spans GROUP BY lang
    """,
    doc=(
        "T5-style span-corruption planning: each document gets "
        "ceil-free deterministic spans (one per 20-token segment, "
        "span length 3 capped by the segment) whose start offsets "
        "are seeded by md5(doc_id, span_idx) — the reproducible mask "
        "layout a denoising-pretraining pipeline materializes ahead "
        "of training so every epoch and every worker agrees. "
        "Per-language mask ratios verify the target corruption rate; "
        "the start checksum pins the seeded layout itself. md5-to-"
        "integer extraction is per-engine, everything after is shared "
        "integer arithmetic."
    ),
)
def pipeline_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language span-corruption mask plan + layout checksum.

    Scale notes (100 TB): map-only — token counts and span plans are
    per-row projections (the seeded offsets are a bounded HOF over
    n_spans <= n_tok/20 elements), collapsing into one |languages|-row
    aggregate; no shuffle except the final tiny groupBy."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.expr("CAST(size(split(text, '\\\\s+')) AS BIGINT)").alias("n_tok"),
    )
    base = toks.filter(F.col("n_tok") >= _SPANC_SPAN_LEN + 1).select(
        "lang",
        "n_tok",
        "doc_id",
        F.expr(
            f"greatest(1L, n_tok div {_SPANC_TOKENS_PER_SPAN})"
        ).alias("n_spans"),
        F.expr(
            f"n_tok div greatest(1L, n_tok div {_SPANC_TOKENS_PER_SPAN})"
        ).alias("sl"),
    )
    plan = base.select(
        "lang",
        "n_tok",
        "n_spans",
        F.expr(
            f"n_spans * least({_SPANC_SPAN_LEN}L, n_tok div n_spans)"
        ).alias("masked"),
        F.expr(f"sl - least({_SPANC_SPAN_LEN}L, sl) + 1").alias("slots"),
        F.expr(
            "transform(sequence(1, CAST(n_spans AS INT)), k ->"
            " CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':',"
            " CAST(k AS STRING))), 1, 8), 16, 10) AS BIGINT))"
        ).alias("hs"),
    )
    spans = plan.select(
        "lang",
        "n_tok",
        "n_spans",
        "masked",
        F.expr(
            "aggregate(transform(hs, h -> h % slots), 0L, (a, x) -> a + x)"
        ).alias("start_sum"),
    )
    return spans.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum("n_spans").cast("bigint").alias("n_spans"),
        F.sum("masked").cast("bigint").alias("masked_tokens"),
        F.expr(
            "CAST(sum(masked) * 1000000 div sum(n_tok) AS BIGINT)"
        ).alias("mask_ratio_ppm"),
        F.sum("start_sum").cast("bigint").alias("start_checksum"),
    )


# ---------------------------------------------------------------------------
# Quality-filter impact on LM cross-entropy (curation loop closer)
# ---------------------------------------------------------------------------

#: identical IEEE text per model; only the count-column prefix differs.
def _lmfi_w(pfx: str) -> str:
    return (
        f"CAST(floor(ln((CAST(c_bi_{pfx} AS DOUBLE) + 1.0)"
        f" / (CAST(c_w1_{pfx} AS DOUBLE) + CAST(v_{pfx} AS DOUBLE)))"
        " * 1000000) AS BIGINT)"
    )


def _lmfi_metric_sql() -> str:
    """Per-doc quality metrics over the SAME lowercased token stream
    the LM uses, so keep/drop is a pure function of the tokens."""
    return """
      SELECT doc_id, lang, grp, t,
             CAST(len(t) AS BIGINT) AS n_tok,
             CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum')
                  AS BIGINT) AS sum_len,
             CAST(len(list_distinct(t)) AS BIGINT) AS n_dist
      FROM d
    """


_LMFI_KEEP = (
    "n_tok >= 20 AND n_tok <= 80"
    " AND 3 * n_tok <= sum_len AND sum_len <= 8 * n_tok"
    " AND 2 * n_dist >= n_tok"
)


def _lmfi_model_sql(pfx: str, train_pred: str) -> str:
    return f"""
    cb_{pfx} AS (
      SELECT bigram, CAST(count(*) AS BIGINT) AS c
      FROM bi WHERE grp = 0 AND {train_pred} GROUP BY 1
    ),
    cu_{pfx} AS (
      SELECT term, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(t) AS term, keep FROM m WHERE grp = 0) u
      WHERE {train_pred} GROUP BY 1
    ),
    vv_{pfx} AS (SELECT CAST(count(*) AS BIGINT) AS v FROM cu_{pfx}),
    agg_{pfx} AS (
      SELECT lang,
             CAST(sum(cnt) AS BIGINT) AS n_bigrams,
             CAST((-sum(cnt * w_micro)) // sum(cnt) AS BIGINT) AS xent
      FROM (
        SELECT lang, cnt, {_lmfi_w(pfx)} AS w_micro
        FROM (
          SELECT ev.lang, ev.cnt,
                 coalesce(b.c, 0) AS c_bi_{pfx},
                 coalesce(u.c, 0) AS c_w1_{pfx},
                 vv_{pfx}.v AS v_{pfx}
          FROM ev
          LEFT JOIN cb_{pfx} b ON ev.bigram = b.bigram
          LEFT JOIN cu_{pfx} u ON ev.w1 = u.term
          CROSS JOIN vv_{pfx}
        ) j
      ) s GROUP BY lang
    )"""


@register(
    "pipeline_filter_lm_impact",
    f"""
    WITH d AS (
      SELECT doc_id, lang, doc_id % 2 AS grp,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    m AS (
      SELECT *, CASE WHEN {_LMFI_KEEP} THEN 1 ELSE 0 END AS keep
      FROM ({_lmfi_metric_sql()}) mm
    ),
    bi AS (
      SELECT lang, grp, keep, p[1] || ' ' || p[2] AS bigram, p[1] AS w1
      FROM (SELECT lang, grp, keep,
                   unnest(list_zip(t[:len(t) - 1], t[2:])) AS p
            FROM m WHERE len(t) >= 2) u
    ),
    ev AS (
      SELECT lang, bigram, w1, CAST(count(*) AS BIGINT) AS cnt
      FROM bi WHERE grp = 1 GROUP BY 1, 2, 3
    ),
    {_lmfi_model_sql('raw', '1 = 1')},
    {_lmfi_model_sql('flt', 'keep = 1')},
    tr AS (
      SELECT CAST(count(*) AS BIGINT) AS n_train_docs,
             CAST(sum(keep) AS BIGINT) AS n_kept_docs
      FROM m WHERE grp = 0
    )
    SELECT r.lang, r.n_bigrams,
           r.xent AS xent_raw_micro,
           f.xent AS xent_filtered_micro,
           f.xent - r.xent AS delta_micro,
           tr.n_train_docs, tr.n_kept_docs
    FROM agg_raw r JOIN agg_flt f ON r.lang = f.lang CROSS JOIN tr
    """,
    doc=(
        "The curation loop closed: fit the SAME add-V bigram LM on "
        "the raw training half and on its quality-filtered subset "
        "(length / mean-word-length / distinct-fraction rules over "
        "the LM's own token stream), score both on the SAME held-out "
        "half, and report the per-language cross-entropy shift — the "
        "ablation table that justifies (or rejects) a filter before "
        "it burns compute at pretraining scale. Both models share one "
        "tokenization and one eval join; only the count tables differ."
    ),
)
def pipeline_filter_lm_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language held-out xent: raw-trained vs filter-trained LM.

    Scale notes (100 TB): the corpus tokenizes once into a doc-grain
    frame carrying the keep flag; each model's count tables are
    vocab-bounded aggregates of that stream (checkpointed), and the
    eval side reduces to (lang, bigram type) before the two count
    joins — so the second model costs two more vocab-scale joins, not
    a second corpus pass."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("doc_id") % 2).alias("grp"),
        F.expr("filter(split(lower(text), '\\\\s+'), x -> x != '')").alias("t"),
    )
    m = d.select(
        "doc_id",
        "lang",
        "grp",
        "t",
        F.expr("CAST(size(t) AS BIGINT)").alias("n_tok"),
        F.expr(
            "aggregate(transform(t, x -> CAST(length(x) AS BIGINT)),"
            " 0L, (a, x) -> a + x)"
        ).alias("sum_len"),
        F.expr("CAST(size(array_distinct(t)) AS BIGINT)").alias("n_dist"),
    ).select(
        "lang",
        "grp",
        "t",
        F.expr(f"CASE WHEN {_LMFI_KEEP} THEN 1 ELSE 0 END").alias("keep"),
    )
    # ONE corpus pass for every count table (the round-4 one-token-
    # stream fold): bigram rows (all docs), unigram rows and a doc
    # marker (train split only) ride one explode into one fine-grain
    # aggregate bounded by vocab x lang x 4 flags — ev, both models'
    # bigram/unigram tables, both vocab sizes AND the doc census are
    # re-aggregations of the single checkpointed artifact. The old
    # shape planned + executed the corpus tokenization 6x (ev, 2x cb,
    # 2x cu, tr).
    stream = m.select(
        "lang",
        "grp",
        "keep",
        F.explode(
            F.expr(
                "concat("
                " CASE WHEN size(t) >= 2 THEN"
                "   transform(sequence(1, size(t) - 1),"
                "     i -> struct('b' AS kind,"
                "                 concat(t[i - 1], ' ', t[i]) AS k1,"
                "                 t[i - 1] AS k2))"
                "   ELSE array() END,"
                " CASE WHEN grp = 0 THEN"
                "   transform(t, x -> struct('u' AS kind, x AS k1,"
                "                            CAST(NULL AS STRING) AS k2))"
                "   ELSE array() END,"
                " CASE WHEN grp = 0 THEN"
                "   array(struct('d' AS kind, CAST(NULL AS STRING) AS k1,"
                "                CAST(NULL AS STRING) AS k2))"
                "   ELSE array() END)"
            )
        ).alias("tok"),
    ).select("lang", "grp", "keep", "tok.kind", "tok.k1", "tok.k2")
    fine = (
        stream.groupBy("kind", "grp", "keep", "lang", "k1", "k2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    ev = (
        fine.filter("kind = 'b' AND grp = 1")
        .groupBy(
            "lang", F.col("k1").alias("bigram"), F.col("k2").alias("w1")
        )
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )

    def model(pfx: str, pred: str):
        cb = (
            fine.filter(f"kind = 'b' AND grp = 0 AND {pred}")
            .groupBy(F.col("k1").alias("bigram"))
            .agg(F.sum("cnt").cast("bigint").alias("c"))
        )
        cu = (
            fine.filter(f"kind = 'u' AND {pred}")
            .groupBy(F.col("k1").alias("term"))
            .agg(F.sum("cnt").cast("bigint").alias("c"))
        )
        vv = cu.agg(F.count(F.lit(1)).cast("bigint").alias(f"v_{pfx}"))
        joined = (
            ev.join(cb.withColumnRenamed("c", f"__cb_{pfx}"), "bigram", "left_outer")
            .join(
                cu.withColumnRenamed("term", "w1").withColumnRenamed(
                    "c", f"__cu_{pfx}"
                ),
                "w1",
                "left_outer",
            )
            .crossJoin(F.broadcast(vv))
            .select(
                "lang",
                "cnt",
                F.expr(f"coalesce(__cb_{pfx}, 0)").alias(f"c_bi_{pfx}"),
                F.expr(f"coalesce(__cu_{pfx}, 0)").alias(f"c_w1_{pfx}"),
                f"v_{pfx}",
            )
            .select("lang", "cnt", F.expr(_lmfi_w(pfx)).alias("w_micro"))
        )
        return joined.groupBy("lang").agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.expr(
                "CAST((-sum(cnt * w_micro)) div sum(cnt) AS BIGINT)"
            ).alias(f"xent_{pfx}"),
        )
    raw = model("raw", "1 = 1")
    flt = model("flt", "keep = 1").withColumnRenamed("n_bigrams", "__nb2")
    tr = fine.filter("kind = 'd'").agg(
        F.sum("cnt").cast("bigint").alias("n_train_docs"),
        F.sum(F.when(F.col("keep") == 1, F.col("cnt")))
        .cast("bigint")
        .alias("n_kept_docs"),
    )
    return (
        raw.join(flt, "lang")
        .crossJoin(F.broadcast(tr))
        .select(
            "lang",
            "n_bigrams",
            F.col("xent_raw").alias("xent_raw_micro"),
            F.col("xent_flt").alias("xent_filtered_micro"),
            F.expr("xent_flt - xent_raw").alias("delta_micro"),
            "n_train_docs",
            "n_kept_docs",
        )
    )


# ---------------------------------------------------------------------------
# Preference-pair mining (DPO/RLHF data prep: chosen vs rejected per group)
# ---------------------------------------------------------------------------

_PREF_BUCKET_TOKENS = 25
_PREF_MIN_GAP_PPM = 100000  # demand a 10-point quality gap


@register(
    "pipeline_preference_pairs",
    f"""
    WITH m AS (
      SELECT doc_id, lang,
             CAST(len(t) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(t)) * 1000000 // len(t) AS BIGINT)
               AS score_ppm
      FROM (SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(lower(text), '\\s+'),
                               x -> x <> '') AS t
            FROM documents) d
    ),
    g AS (
      SELECT lang, n_tok // {_PREF_BUCKET_TOKENS} AS len_bucket,
             doc_id, score_ppm,
             row_number() OVER (PARTITION BY lang, n_tok // {_PREF_BUCKET_TOKENS}
                                ORDER BY score_ppm DESC, doc_id) AS rn_hi,
             row_number() OVER (PARTITION BY lang, n_tok // {_PREF_BUCKET_TOKENS}
                                ORDER BY score_ppm ASC, doc_id) AS rn_lo,
             CAST(count(*) OVER (PARTITION BY lang,
                                 n_tok // {_PREF_BUCKET_TOKENS}) AS BIGINT)
               AS n_docs
      FROM m
    )
    SELECT hi.lang, CAST(hi.len_bucket AS BIGINT) AS len_bucket, hi.n_docs,
           hi.doc_id AS chosen_doc, lo.doc_id AS rejected_doc,
           hi.score_ppm AS chosen_score_ppm,
           lo.score_ppm AS rejected_score_ppm,
           hi.score_ppm - lo.score_ppm AS gap_ppm
    FROM (SELECT * FROM g WHERE rn_hi = 1) hi
    JOIN (SELECT * FROM g WHERE rn_lo = 1) lo
      ON hi.lang = lo.lang AND hi.len_bucket = lo.len_bucket
    WHERE hi.n_docs >= 2
      AND hi.score_ppm - lo.score_ppm >= {_PREF_MIN_GAP_PPM}
    """,
    doc=(
        "Preference-pair mining for DPO/reward-model data prep: within "
        "each (language, length-bucket) group the highest- and lowest-"
        "quality documents (lexical-diversity score, deterministic "
        "doc_id tie-break) become the chosen/rejected pair, emitted "
        "only when the quality gap clears a margin — pairs with tiny "
        "gaps teach a preference model noise. Grouping by length "
        "bucket keeps the contrast about QUALITY rather than length, "
        "the classic confounder in preference data."
    ),
)
def pipeline_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chosen/rejected doc pairs per (lang, length-bucket).

    Scale notes (100 TB): a rank window partitioned by ~|langs x
    buckets| groups would cap parallelism at the group count and push
    corpus/|groups| rows through single tasks — so the rn=1 endpoints
    are computed as COMBINING AGGREGATES instead: one groupBy for the
    per-group score extrema (map-side partial), broadcast back onto
    the checkpointed doc stream, and a min(doc_id) aggregate over the
    (rare) extremum achievers resolves the deterministic tie-break.
    Every stage is map-side-combining; nothing is ever single-task.
    The oracle keeps the equivalent window formulation (same values
    by the shared tie-break)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.expr("filter(split(lower(text), '\\\\s+'), x -> x != '')").alias("t"),
    )
    m = d.select(
        "doc_id",
        "lang",
        F.expr("CAST(size(t) AS BIGINT)").alias("n_tok"),
        F.expr(
            "CAST(size(array_distinct(t)) * 1000000 div size(t) AS BIGINT)"
        ).alias("score_ppm"),
    ).withColumn(
        "len_bucket", F.expr(f"n_tok div {_PREF_BUCKET_TOKENS}")
    ).localCheckpoint(eager=False)
    ext = m.groupBy("lang", "len_bucket").agg(
        F.max("score_ppm").alias("hi_s"),
        F.min("score_ppm").alias("lo_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )

    def endpoint(bound_col: str, doc_out: str, score_out: str):
        return (
            m.join(
                F.broadcast(ext.select("lang", "len_bucket", bound_col)),
                ["lang", "len_bucket"],
            )
            .filter(F.col("score_ppm") == F.col(bound_col))
            .groupBy("lang", "len_bucket")
            .agg(
                F.min("doc_id").alias(doc_out),
                F.first(bound_col).alias(score_out),
            )
        )

    hi = endpoint("hi_s", "chosen_doc", "chosen_score_ppm")
    lo = endpoint("lo_s", "rejected_doc", "rejected_score_ppm")
    return (
        hi.join(lo, ["lang", "len_bucket"])
        .join(
            F.broadcast(ext.select("lang", "len_bucket", "n_docs")),
            ["lang", "len_bucket"],
        )
        .filter(
            (F.col("n_docs") >= 2)
            & (
                F.col("chosen_score_ppm") - F.col("rejected_score_ppm")
                >= _PREF_MIN_GAP_PPM
            )
        )
        .select(
            "lang",
            F.col("len_bucket").cast("bigint").alias("len_bucket"),
            "n_docs",
            "chosen_doc",
            "rejected_doc",
            "chosen_score_ppm",
            "rejected_score_ppm",
            (F.col("chosen_score_ppm") - F.col("rejected_score_ppm")).alias(
                "gap_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget water-filling across domains (round 13)
# ---------------------------------------------------------------------------


@register(
    "pipeline_token_budget_waterfill",
    """
    WITH caps AS (
      SELECT source, lang,
             CAST(sum(len(regexp_split_to_array(text, '\\s+')))
                  AS BIGINT) AS cap
      FROM documents WHERE text IS NOT NULL GROUP BY 1, 2
    ), win AS (
      SELECT source, lang, cap,
             CAST(sum(cap) OVER () AS BIGINT) AS total,
             CAST(count(*) OVER () AS BIGINT) AS n,
             CAST(row_number() OVER (ORDER BY cap, source, lang)
                  AS BIGINT) AS i,
             CAST(coalesce(sum(cap) OVER (ORDER BY cap, source, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS p
      FROM caps
    ), lvl AS (
      SELECT *, (total * 3) // 5 AS budget,
             CAST(max(least(((total * 3) // 5 - p) // (n - i + 1), cap))
                  OVER () AS BIGINT) AS water_level
      FROM win
    ), alloc AS (
      SELECT *, least(cap, water_level) AS a FROM lvl
    )
    SELECT source, lang,
           cap AS capacity_tokens,
           CAST(a AS BIGINT) AS alloc_tokens,
           cap > water_level AS saturated,
           water_level,
           CAST(budget AS BIGINT) AS budget_tokens,
           CAST(budget - sum(a) OVER () AS BIGINT) AS leftover_tokens
    FROM alloc
    ORDER BY source, lang
    """,
    doc=(
        "Token-budget water-filling across (source, lang) domains — "
        "the mixture-rebalancing step of corpus curation: a global "
        "budget (60% of total tokens, same integer formula both "
        "engines) is spread evenly, small domains keep everything "
        "(cap <= level), large domains are clipped at the water "
        "level. The level uses the exact closed form over "
        "ascending-capacity prefix sums — L = max_i min((B - P_{i-1}) "
        "div (n-i+1), c_i) — proven equal to the binary-search "
        "definition by a 20k-case property test "
        "(tests/test_round13_ops.py). All-integer arithmetic, "
        "engine-exact; leftover = budget minus total allocation "
        "(sub-level integer crumbs stay unallocated, deterministic)."
    ),
)
def pipeline_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filled token allocation per (source, lang) domain.

    Scale notes (100 TB): token counts collapse map-side into one
    |domains|-row aggregate; every window below runs over that bounded
    domain table (never the corpus), so the whole allocator costs one
    corpus scan + one tiny shuffle regardless of scale."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    caps = d.groupBy("source", "lang").agg(
        F.expr("CAST(sum(size(split(text, '\\\\s+'))) AS BIGINT)").alias(
            "cap"
        )
    )
    wt = Window.partitionBy(F.lit(1))
    ws = Window.orderBy("cap", "source", "lang")
    win = caps.select(
        "source",
        "lang",
        "cap",
        F.sum("cap").over(wt).cast("bigint").alias("total"),
        F.count(F.lit(1)).over(wt).cast("bigint").alias("n"),
        F.row_number().over(ws).cast("bigint").alias("i"),
        F.coalesce(
            F.sum("cap").over(
                ws.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("p"),
    )
    lvl = win.select(
        "*",
        F.expr("(total * 3) div 5").alias("budget"),
        F.max(
            F.expr("least(((total * 3) div 5 - p) div (n - i + 1), cap)")
        )
        .over(wt)
        .cast("bigint")
        .alias("water_level"),
    )
    alloc = lvl.select("*", F.expr("least(cap, water_level)").alias("a"))
    return alloc.select(
        "source",
        "lang",
        F.col("cap").alias("capacity_tokens"),
        F.col("a").cast("bigint").alias("alloc_tokens"),
        F.expr("cap > water_level").alias("saturated"),
        "water_level",
        F.col("budget").cast("bigint").alias("budget_tokens"),
        (F.col("budget") - F.sum("a").over(wt))
        .cast("bigint")
        .alias("leftover_tokens"),
    ).orderBy("source", "lang")


# ---------------------------------------------------------------------------
# Consistent-hash ring shard assignment (round 13)
# ---------------------------------------------------------------------------

_CHR_NODES = 4   # physical writer nodes
_CHR_VNODES = 8  # virtual points per node (variance smoothing)


@register(
    "pipeline_consistent_hash_ring",
    f"""
    WITH ring AS (
      SELECT 'n' || CAST(p AS VARCHAR) AS node,
             CAST(('0x' || substr(md5('ring:' || CAST(p AS VARCHAR) || ':'
               || CAST(v AS VARCHAR)), 1, 12)) AS BIGINT) AS pos
      FROM unnest(range(0, {_CHR_NODES})) t(p),
           unnest(range(0, {_CHR_VNODES})) u(v)
    ), dp AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('doc:' || CAST(doc_id AS VARCHAR)),
               1, 12)) AS BIGINT) AS d
      FROM documents
    ), assign_full AS (
      SELECT doc_id,
             coalesce(min(CASE WHEN r.pos >= d THEN r.pos END), min(r.pos))
               AS succ
      FROM dp CROSS JOIN ring r GROUP BY doc_id
    ), assign_drop AS (
      SELECT doc_id,
             coalesce(min(CASE WHEN r.pos >= d THEN r.pos END), min(r.pos))
               AS succ
      FROM dp CROSS JOIN ring r
      WHERE r.node != 'n{_CHR_NODES - 1}' GROUP BY doc_id
    ), f AS (
      SELECT r.node, count(*) AS n_docs
      FROM assign_full a JOIN ring r ON a.succ = r.pos GROUP BY 1
    ), g AS (
      SELECT r.node, count(*) AS n_after
      FROM assign_drop a JOIN ring r ON a.succ = r.pos GROUP BY 1
    )
    SELECT f.node,
           CAST({_CHR_VNODES} AS BIGINT) AS n_vnodes,
           CAST(f.n_docs AS BIGINT) AS n_docs,
           CAST(f.n_docs * 1000000 // (SELECT sum(n_docs) FROM f)
                AS BIGINT) AS share_ppm,
           CAST(coalesce(g.n_after, 0) AS BIGINT)
             AS n_docs_after_last_node_removed
    FROM f LEFT JOIN g ON f.node = g.node
    ORDER BY f.node
    """,
    doc=(
        "Consistent-hash ring shard assignment — the stable-placement "
        "primitive of distributed writers/caches: 4 physical nodes x "
        "8 virtual points hashed onto a 48-bit md5 ring, every doc "
        "routed to its clockwise successor. The removal scenario "
        "re-routes ONLY the lost node's docs (the consistent-hashing "
        "contract: survivors' counts never decrease — pinned in "
        "pytest), measuring where its load lands. 48-bit integer "
        "extraction is per-engine (conv vs 0x-cast, round-6 lesson); "
        "all downstream arithmetic is shared integer expression text."
    ),
)
def pipeline_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ring assignment census + node-loss redistribution.

    Scale notes (100 TB): the ring is 32 broadcast rows; assignment is
    a map-side cross join + per-doc min aggregate (no corpus shuffle
    beyond the doc-grain groupBy, which AQE coalesces); the census is
    a |nodes|-row aggregate. Node count changes never re-shuffle the
    corpus — that is the point of the ring."""
    ring = spark.range(_CHR_NODES * _CHR_VNODES).select(
        F.expr(f"concat('n', CAST(id div {_CHR_VNODES} AS STRING))").alias(
            "node"
        ),
        F.expr(
            f"CAST(conv(substring(md5(concat('ring:',"
            f" CAST(id div {_CHR_VNODES} AS STRING), ':',"
            f" CAST(id % {_CHR_VNODES} AS STRING))), 1, 12), 16, 10)"
            " AS BIGINT)"
        ).alias("pos"),
    )
    dp = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "CAST(conv(substring(md5(concat('doc:',"
            " CAST(doc_id AS STRING))), 1, 12), 16, 10) AS BIGINT)"
        ).alias("d"),
    )

    def assign(r):
        return (
            dp.join(F.broadcast(r), F.lit(True))
            .groupBy("doc_id")
            .agg(
                F.expr(
                    "coalesce(min(CASE WHEN pos >= d THEN pos END),"
                    " min(pos))"
                ).alias("succ")
            )
        )

    full = (
        assign(ring)
        .join(F.broadcast(ring), F.col("succ") == F.col("pos"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    dropped_ring = ring.filter(F.col("node") != f"n{_CHR_NODES - 1}")
    after = (
        assign(dropped_ring)
        .join(F.broadcast(dropped_ring), F.col("succ") == F.col("pos"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_after"))
    )
    wt = Window.partitionBy(F.lit(1))
    return (
        full.join(after, "node", "left_outer")
        .select(
            "node",
            F.lit(_CHR_VNODES).cast("bigint").alias("n_vnodes"),
            "n_docs",
            F.expr("n_docs * 1000000")
            .cast("bigint")
            .alias("__num"),
            F.sum("n_docs").over(wt).cast("bigint").alias("__tot"),
            F.coalesce(F.col("n_after"), F.lit(0))
            .cast("bigint")
            .alias("n_docs_after_last_node_removed"),
        )
        .select(
            "node",
            "n_vnodes",
            "n_docs",
            F.expr("__num div __tot").cast("bigint").alias("share_ppm"),
            "n_docs_after_last_node_removed",
        )
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# Classifier calibration audit: reliability bins + ECE (round 13)
# ---------------------------------------------------------------------------

#: confidence = score normalized by the DATA max score (same integer
#: formula both engines — the round-4 data-derived-parameter rule), so
#: the reliability bins span the observed score range at any SF


@register(
    "pipeline_classifier_ece",
    f"""
    WITH feats AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             list_aggregate(list_transform(toks,
               t -> CASE WHEN t IN ({_CLS_STOPS}) THEN 1 ELSE 0 END),
               'sum') AS stop_hits,
             len(list_distinct(toks)) AS n_distinct,
             list_aggregate(list_transform(toks, t -> length(t)), 'sum')
               AS sum_len
      FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           t -> t <> '') AS toks
        FROM documents
      ) d
    ), raw AS (
      SELECT doc_id,
             2 * stop_hits * 1000 // n_tok
               + n_distinct * 1000 // n_tok
               + least(n_tok, 500) AS score,
             CASE WHEN n_tok >= 30 AND 3 * n_tok <= sum_len
                       AND sum_len <= 10 * n_tok
                  THEN 1 ELSE 0 END AS label
      FROM feats WHERE n_tok > 0
    ), scored AS (
      SELECT doc_id, label,
             score * 1000000 // (SELECT max(score) FROM raw) AS p_ppm
      FROM raw
    ), b AS (
      SELECT least(p_ppm // 100000, 9) AS bin,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(p_ppm) // count(*) AS BIGINT) AS conf_ppm,
             CAST(sum(label) * 1000000 // count(*) AS BIGINT) AS acc_ppm
      FROM scored GROUP BY 1
    )
    SELECT CAST(bin AS BIGINT) AS bin, n_docs, conf_ppm, acc_ppm,
           CAST(abs(conf_ppm - acc_ppm) AS BIGINT) AS gap_ppm,
           CAST(sum(n_docs * abs(conf_ppm - acc_ppm)) OVER ()
                // sum(n_docs) OVER () AS BIGINT) AS ece_ppm
    FROM b ORDER BY bin
    """,
    doc=(
        "Expected-calibration-error audit of the quality classifier "
        "(reliability diagram as data): the integer linear score is "
        "mapped to a pseudo-probability by max-score normalization "
        "(data-derived, shared formula), docs fall into 10 equal-width "
        "confidence bins, and each bin compares mean confidence "
        "against the OBSERVED rate of the independent Gopher-style "
        "quality label (mean word length in [3,10], >=30 tokens). "
        "ECE = weighted mean |confidence - accuracy| in exact ppm — "
        "the standard check before trusting classifier scores as "
        "sampling weights. All-integer arithmetic (cross-multiplied "
        "rules, ppm divmod), engine-exact."
    ),
)
def pipeline_classifier_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability bins + ECE for the integer quality classifier.

    Scale notes (100 TB): scoring and labeling are per-row codegen
    projections; the only shuffle carries 10 bins; ECE is a window
    over those 10 rows."""
    d = spread(load_table(spark, sf_dir, "documents"))
    feats = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").alias(
            "toks"
        ),
    ).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tok"),
        F.expr(
            f"aggregate(transform(toks, t -> CASE WHEN t IN ({_CLS_STOPS})"
            " THEN 1 ELSE 0 END), 0L, (a, x) -> a + x)"
        ).alias("stop_hits"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
        F.expr(
            "aggregate(transform(toks, t -> CAST(length(t) AS BIGINT)),"
            " 0L, (a, x) -> a + x)"
        ).alias("sum_len"),
    )
    raw = feats.filter(F.col("n_tok") > 0).select(
        F.expr(
            "2 * stop_hits * 1000 div n_tok"
            " + n_distinct * 1000 div n_tok"
            " + least(n_tok, 500)"
        ).alias("score"),
        F.expr(
            "CASE WHEN n_tok >= 30 AND 3 * n_tok <= sum_len"
            " AND sum_len <= 10 * n_tok THEN 1 ELSE 0 END"
        ).alias("label"),
    )
    wt = Window.partitionBy(F.lit(1))
    scored = raw.select(
        "label",
        F.expr("score * 1000000").alias("__num"),
        F.max("score").over(wt).alias("__mx"),
    ).select("label", F.expr("__num div __mx").alias("p_ppm"))
    b = scored.groupBy(
        F.expr("least(p_ppm div 100000, 9)").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("sum(p_ppm) div count(*)").cast("bigint").alias("conf_ppm"),
        F.expr("sum(label) * 1000000 div count(*)")
        .cast("bigint")
        .alias("acc_ppm"),
    )
    return b.select(
        F.col("bin").cast("bigint").alias("bin"),
        "n_docs",
        "conf_ppm",
        "acc_ppm",
        F.expr("CAST(abs(conf_ppm - acc_ppm) AS BIGINT)").alias("gap_ppm"),
        F.expr(
            "sum(n_docs * abs(conf_ppm - acc_ppm)) OVER"
            " (PARTITION BY 1) div sum(n_docs) OVER (PARTITION BY 1)"
        )
        .cast("bigint")
        .alias("ece_ppm"),
    ).select(
        "bin", "n_docs", "conf_ppm", "acc_ppm", "gap_ppm", "ece_ppm"
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# Isotonic calibration (PAVA) of the quality classifier — round 13
# ---------------------------------------------------------------------------


@register(
    "pipeline_isotonic_calibration",
    f"""
    WITH feats AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             list_aggregate(list_transform(toks,
               t -> CASE WHEN t IN ({_CLS_STOPS}) THEN 1 ELSE 0 END),
               'sum') AS stop_hits,
             len(list_distinct(toks)) AS n_distinct,
             list_aggregate(list_transform(toks, t -> length(t)), 'sum')
               AS sum_len
      FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           t -> t <> '') AS toks
        FROM documents
      ) d
    ), raw AS (
      SELECT doc_id,
             2 * stop_hits * 1000 // n_tok
               + n_distinct * 1000 // n_tok
               + least(n_tok, 500) AS score,
             CASE WHEN n_tok >= 30 AND 3 * n_tok <= sum_len
                       AND sum_len <= 10 * n_tok
                  THEN 1 ELSE 0 END AS label
      FROM feats WHERE n_tok > 0
    ), scored AS (
      SELECT label,
             score * 1000000 // (SELECT max(score) FROM raw) AS p_ppm
      FROM raw
    ), bins AS MATERIALIZED (
      SELECT least(p_ppm // 100000, 9) AS bin,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(label) AS BIGINT) AS s,
             CAST(sum(p_ppm) // count(*) AS BIGINT) AS conf_ppm,
             CAST(sum(label) * 1000000 // count(*) AS BIGINT) AS acc_ppm
      FROM scored GROUP BY 1
    ), pre AS (
      SELECT bin, n_docs, s, conf_ppm, acc_ppm,
             row_number() OVER (ORDER BY bin) AS rn,
             sum(n_docs) OVER (ORDER BY bin) AS cn,
             sum(s) OVER (ORDER BY bin) AS cs
      FROM bins
    ), iv AS (
      SELECT j.rn AS jrn, k.rn AS krn,
             (k.cs - j.cs + j.s) * 1000000
               // (k.cn - j.cn + j.n_docs) AS a_ppm
      FROM pre j JOIN pre k ON j.rn <= k.rn
    ), m AS (
      SELECT i.rn AS irn, iv.jrn AS jrn, min(iv.a_ppm) AS m_ppm
      FROM pre i JOIN iv ON iv.jrn <= i.rn AND iv.krn >= i.rn
      GROUP BY 1, 2
    ), iso AS (
      SELECT irn, max(m_ppm) AS iso_ppm FROM m GROUP BY 1
    )
    SELECT CAST(p.bin AS BIGINT) AS bin, p.n_docs, p.conf_ppm, p.acc_ppm,
           CAST(i.iso_ppm AS BIGINT) AS iso_ppm
    FROM pre p JOIN iso i ON i.irn = p.rn
    ORDER BY bin
    """,
    doc=(
        "Isotonic (monotone non-decreasing) calibration of the quality "
        "classifier via the exact minimax characterization of PAVA: "
        "iso(i) = max over j<=i of min over k>=i of the interval label "
        "rate avg(y[j..k]) — computed over the 10 reliability bins of "
        "pipeline_classifier_ece. Interval rates are ppm-floored "
        "BEFORE the minimax (identical integer encoding both engines; "
        "within 1 micro-unit of exact PAVA, pinned by pytest against "
        "a Fraction-exact reference), so the fitted curve is the "
        "calibration mapping a sampler would apply to classifier "
        "scores. Monotone by construction for ANY bin table."
    ),
)
def pipeline_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAVA-fitted reliability curve over the classifier score bins.

    Scale notes (100 TB): scoring is per-row codegen; the only
    corpus-scale shuffle carries 10 bin rows. The minimax triple
    expansion is O(B^3) = 1000 rows over a lazily-checkpointed
    10-row aggregate (vocab-bounded — the sanctioned checkpoint
    class), so every downstream branch reads the tiny artifact, not
    the corpus. The bounded nested-loop joins never touch fact data."""
    d = spread(load_table(spark, sf_dir, "documents"))
    feats = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").alias(
            "toks"
        ),
    ).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tok"),
        F.expr(
            f"aggregate(transform(toks, t -> CASE WHEN t IN ({_CLS_STOPS})"
            " THEN 1 ELSE 0 END), 0L, (a, x) -> a + x)"
        ).alias("stop_hits"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
        F.expr(
            "aggregate(transform(toks, t -> CAST(length(t) AS BIGINT)),"
            " 0L, (a, x) -> a + x)"
        ).alias("sum_len"),
    )
    raw = feats.filter(F.col("n_tok") > 0).select(
        F.expr(
            "2 * stop_hits * 1000 div n_tok"
            " + n_distinct * 1000 div n_tok"
            " + least(n_tok, 500)"
        ).alias("score"),
        F.expr(
            "CASE WHEN n_tok >= 30 AND 3 * n_tok <= sum_len"
            " AND sum_len <= 10 * n_tok THEN 1 ELSE 0 END"
        ).alias("label"),
    )
    wt = Window.partitionBy(F.lit(1))
    scored = raw.select(
        "label",
        F.expr("score * 1000000").alias("__num"),
        F.max("score").over(wt).alias("__mx"),
    ).select("label", F.expr("__num div __mx").alias("p_ppm"))
    bins = (
        scored.groupBy(F.expr("least(p_ppm div 100000, 9)").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("label").cast("bigint").alias("s"),
            F.expr("sum(p_ppm) div count(*)").cast("bigint").alias("conf_ppm"),
            F.expr("sum(label) * 1000000 div count(*)")
            .cast("bigint")
            .alias("acc_ppm"),
        )
        .localCheckpoint(eager=False)
    )
    wb = Window.partitionBy(F.lit(1)).orderBy("bin")
    pre = bins.select(
        "bin",
        "n_docs",
        "s",
        "conf_ppm",
        "acc_ppm",
        F.row_number().over(wb).alias("rn"),
        F.sum("n_docs").over(wb).alias("cn"),
        F.sum("s").over(wb).alias("cs"),
    )
    iv = (
        pre.alias("j")
        .join(pre.alias("k"), F.expr("j.rn <= k.rn"))
        .select(
            F.expr("j.rn").alias("jrn"),
            F.expr("k.rn").alias("krn"),
            F.expr(
                "(k.cs - j.cs + j.s) * 1000000"
                " div (k.cn - j.cn + j.n_docs)"
            ).alias("a_ppm"),
        )
    )
    m = (
        pre.alias("i")
        .join(iv.alias("iv"), F.expr("iv.jrn <= i.rn AND iv.krn >= i.rn"))
        .groupBy(F.expr("i.rn").alias("irn"), F.col("jrn"))
        .agg(F.min("a_ppm").alias("m_ppm"))
    )
    iso = m.groupBy("irn").agg(F.max("m_ppm").alias("iso_ppm"))
    return (
        pre.join(iso, pre["rn"] == iso["irn"])
        .select(
            "bin",
            "n_docs",
            "conf_ppm",
            "acc_ppm",
            F.col("iso_ppm").cast("bigint").alias("iso_ppm"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Split-conformal coverage audit (Mondrian, per-lang) — round 13
# ---------------------------------------------------------------------------


@register(
    "pipeline_conformal_threshold",
    f"""
    WITH feats AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             list_aggregate(list_transform(toks,
               t -> CASE WHEN t IN ({_CLS_STOPS}) THEN 1 ELSE 0 END),
               'sum') AS stop_hits,
             len(list_distinct(toks)) AS n_distinct,
             list_aggregate(list_transform(toks, t -> length(t)), 'sum')
               AS sum_len
      FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           t -> t <> '') AS toks
        FROM documents
      ) d
    ), raw AS (
      SELECT doc_id,
             2 * stop_hits * 1000 // n_tok
               + n_distinct * 1000 // n_tok
               + least(n_tok, 500) AS score,
             CASE WHEN n_tok >= 30 AND 3 * n_tok <= sum_len
                       AND sum_len <= 10 * n_tok
                  THEN 1 ELSE 0 END AS label
      FROM feats WHERE n_tok > 0
    ), scored AS MATERIALIZED (
      SELECT r.doc_id, d.lang, r.doc_id % 2 AS half,
             abs(r.label * 1000000
                 - r.score * 1000000 // (SELECT max(score) FROM raw))
               AS alpha
      FROM raw r JOIN documents d ON r.doc_id = d.doc_id
    ), cal_tot AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_cal,
             (9 * (count(*) + 1) + 9) // 10 AS k
      FROM scored WHERE half = 0 GROUP BY 1
    ), cal_cum AS (
      SELECT lang, alpha,
             sum(cnt) OVER (PARTITION BY lang ORDER BY alpha) AS cum
      FROM (
        SELECT lang, alpha, count(*) AS cnt
        FROM scored WHERE half = 0 GROUP BY 1, 2
      ) h
    ), q AS (
      SELECT t.lang, t.n_cal, CAST(t.k AS BIGINT) AS k,
             CAST(coalesce(min(CASE WHEN c.cum >= t.k THEN c.alpha END),
                           1000000) AS BIGINT) AS q_ppm
      FROM cal_tot t LEFT JOIN cal_cum c ON c.lang = t.lang
      GROUP BY 1, 2, 3
    )
    SELECT q.lang, q.n_cal, q.k, q.q_ppm,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN s.alpha <= q.q_ppm THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           CAST(sum(CASE WHEN s.alpha <= q.q_ppm THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS cov_ppm
    FROM q JOIN scored s ON s.lang = q.lang AND s.half = 1
    GROUP BY 1, 2, 3, 4 ORDER BY 1
    """,
    doc=(
        "Mondrian split-conformal audit of the quality classifier: "
        "docs split into calibration/test halves by doc_id parity, "
        "nonconformity alpha = |label*1e6 - confidence_ppm|, and per "
        "LANG the calibration threshold q = the k-th smallest alpha "
        "with k = ceil(0.9*(n_cal+1)) (exact integer ceil; q found "
        "tie-safely as the least alpha whose cumulative count reaches "
        "k — the bounded-integer-domain order-statistic recipe). The "
        "test half then reports observed coverage, the finite-sample "
        "validity check before shipping classifier-gated prediction "
        "sets. All-integer, engine-exact."
    ),
)
def pipeline_conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang split-conformal threshold + held-out coverage.

    Scale notes (100 TB): scoring is per-row codegen over one corpus
    scan per half (two scans total, no checkpoint of a corpus-scale
    stream); the calibration histogram groups by (lang, alpha) — the
    cumulative window partitions by lang over a value-bounded alpha
    domain (<=1e6 distinct), never a global positional sort; the
    per-lang q table is a handful of rows, broadcast onto the test
    half."""
    d = spread(load_table(spark, sf_dir, "documents"))
    feats = d.select(
        "doc_id",
        "lang",
        F.expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").alias(
            "toks"
        ),
    ).select(
        "doc_id",
        "lang",
        F.size("toks").cast("bigint").alias("n_tok"),
        F.expr(
            f"aggregate(transform(toks, t -> CASE WHEN t IN ({_CLS_STOPS})"
            " THEN 1 ELSE 0 END), 0L, (a, x) -> a + x)"
        ).alias("stop_hits"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
        F.expr(
            "aggregate(transform(toks, t -> CAST(length(t) AS BIGINT)),"
            " 0L, (a, x) -> a + x)"
        ).alias("sum_len"),
    )
    raw = feats.filter(F.col("n_tok") > 0).select(
        "doc_id",
        "lang",
        F.expr(
            "2 * stop_hits * 1000 div n_tok"
            " + n_distinct * 1000 div n_tok"
            " + least(n_tok, 500)"
        ).alias("score"),
        F.expr(
            "CASE WHEN n_tok >= 30 AND 3 * n_tok <= sum_len"
            " AND sum_len <= 10 * n_tok THEN 1 ELSE 0 END"
        ).alias("label"),
    )
    wt = Window.partitionBy(F.lit(1))
    scored = raw.select(
        "doc_id",
        "lang",
        F.expr("doc_id % 2").alias("half"),
        F.expr("label * 1000000").alias("__lab"),
        F.expr("score * 1000000").alias("__num"),
        F.max("score").over(wt).alias("__mx"),
    ).select(
        "doc_id",
        "lang",
        "half",
        F.expr("abs(__lab - __num div __mx)").alias("alpha"),
    )
    cal = scored.filter(F.col("half") == 0)
    cal_tot = cal.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal"),
        F.expr("(9 * (count(*) + 1) + 9) div 10").cast("bigint").alias("k"),
    )
    wl = Window.partitionBy("lang").orderBy("alpha")
    cal_cum = (
        cal.groupBy("lang", "alpha")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("lang", "alpha", F.sum("cnt").over(wl).alias("cum"))
    )
    q = (
        cal_tot.alias("t")
        .join(cal_cum.alias("c"), F.expr("c.lang = t.lang"), "left_outer")
        .groupBy(F.expr("t.lang").alias("lang"), F.col("n_cal"), F.col("k"))
        .agg(
            F.expr(
                "CAST(coalesce(min(CASE WHEN c.cum >= t.k THEN c.alpha END),"
                " 1000000) AS BIGINT)"
            ).alias("q_ppm")
        )
    )
    test = scored.filter(F.col("half") == 1)
    return (
        F.broadcast(q)
        .join(test.alias("s"), "lang")
        .groupBy("lang", "n_cal", "k", "q_ppm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.expr("sum(CASE WHEN s.alpha <= q_ppm THEN 1 ELSE 0 END)")
            .cast("bigint")
            .alias("n_covered"),
            F.expr(
                "sum(CASE WHEN s.alpha <= q_ppm THEN 1 ELSE 0 END)"
                " * 1000000 div count(*)"
            )
            .cast("bigint")
            .alias("cov_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Semantic decontamination (embedding-based, cross-set) — round 13
# ---------------------------------------------------------------------------

_SDC_PANEL = 16    # benchmark panel = first 16 vectors
_SDC_THRESH = 0.4  # contamination cosine threshold (round-4 convention)


@register(
    "pipeline_semantic_decontaminate",
    f"""
    WITH bench AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_SDC_PANEL}
    ), corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {_SDC_PANEL}
    ), scored AS (
      SELECT c.vec_id,
             max(round(list_inner_product(c.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[])
                 / (sqrt(list_inner_product(c.embedding::DOUBLE[],
                                            c.embedding::DOUBLE[]))
                  * sqrt(list_inner_product(b.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]))), 4)
                 + 0.0) AS max_cos
      FROM corpus c CROSS JOIN bench b
      GROUP BY 1
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN s.max_cos >= {_SDC_THRESH} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(sum(CASE WHEN s.max_cos >= {_SDC_THRESH} THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS cont_ppm,
           round(max(s.max_cos), 4) + 0.0 AS top_cos
    FROM scored s JOIN documents d ON s.vec_id = d.doc_id
    GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "SEMANTIC decontamination — the embedding-space complement of "
        "the n-gram and Bloom decontaminators already registered: a "
        "benchmark panel is broadcast against the corpus embeddings, "
        "each doc keeps its max panel cosine (round-4, IEEE-exact "
        "per-element DOUBLE products), and docs above the threshold "
        "are flagged as contaminated — catching paraphrased benchmark "
        "leakage that exact n-gram overlap misses. Per-language "
        "census in exact ppm."
    ),
)
def pipeline_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang contamination census vs a broadcast benchmark panel.

    Scale notes (100 TB): panel x corpus is a broadcast nested
    product bounded by |panel| (16) per row — linear in corpus, no
    shuffle until the doc-grain max (map-side combinable) and the
    |langs|-row census; the production swap-in is the IVF/LSH probe
    feeding the same threshold."""
    from the_movies_db_spark.operators.dedup import cosine

    e = load_table(spark, sf_dir, "embeddings")
    bench = F.broadcast(
        e.filter(F.col("vec_id") < _SDC_PANEL).select(
            F.col("embedding").alias("__bv")
        )
    )
    corpus = e.filter(F.col("vec_id") >= _SDC_PANEL)
    scored = (
        corpus.join(bench, F.lit(True))
        .select(
            "vec_id",
            (F.round(cosine(F.col("embedding"), F.col("__bv")), 4) + F.lit(0.0)).alias(
                "__cos"
            ),
        )
        .groupBy("vec_id")
        .agg(F.max("__cos").alias("max_cos"))
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        scored.join(d, scored.vec_id == d.doc_id)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr(
                f"CAST(sum(CASE WHEN max_cos >= {_SDC_THRESH} THEN 1"
                " ELSE 0 END) AS BIGINT)"
            ).alias("n_contaminated"),
            F.expr(
                f"CAST(sum(CASE WHEN max_cos >= {_SDC_THRESH} THEN 1"
                " ELSE 0 END) * 1000000 div count(*) AS BIGINT)"
            ).alias("cont_ppm"),
            (F.round(F.max("max_cos"), 4) + F.lit(0.0)).alias("top_cos"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Active-learning batch selection (stratified margin sampling) — round 13
# ---------------------------------------------------------------------------

_AL_BUDGET = 20        # labeling budget per acquisition round
_AL_PREFILTER = 250000  # only docs within 0.25 of the decision boundary


@register(
    "pipeline_active_learning",
    f"""
    WITH feats AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             list_aggregate(list_transform(toks,
               t -> CASE WHEN t IN ({_CLS_STOPS}) THEN 1 ELSE 0 END),
               'sum') AS stop_hits,
             len(list_distinct(toks)) AS n_distinct
      FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           t -> t <> '') AS toks
        FROM documents
      ) d
    ), raw AS (
      SELECT doc_id,
             2 * stop_hits * 1000 // n_tok
               + n_distinct * 1000 // n_tok
               + least(n_tok, 500) AS score
      FROM feats WHERE n_tok > 0
    ), scored AS (
      SELECT r.doc_id, d.lang,
             abs(r.score * 1000000 // (SELECT max(score) FROM raw)
                 - 500000) AS margin_ppm,
             r.score * 1000000 // (SELECT max(score) FROM raw) AS p_ppm
      FROM raw r JOIN documents d ON r.doc_id = d.doc_id
    ), pool AS (
      SELECT * FROM scored WHERE margin_ppm <= {_AL_PREFILTER}
    ), quota AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_lang,
             CAST(greatest(1, {_AL_BUDGET} * count(*)
                  // (SELECT count(*) FROM pool)) AS BIGINT) AS quota
      FROM pool GROUP BY 1
    )
    SELECT p.lang, CAST(p.doc_id AS BIGINT) AS doc_id,
           CAST(p.p_ppm AS BIGINT) AS p_ppm,
           CAST(p.margin_ppm AS BIGINT) AS margin_ppm,
           q.quota
    FROM (
      SELECT lang, doc_id, p_ppm, margin_ppm,
             row_number() OVER (PARTITION BY lang
                                ORDER BY margin_ppm, doc_id) AS rn
      FROM pool
    ) p JOIN quota q ON p.lang = q.lang
    WHERE p.rn <= q.quota
    ORDER BY p.lang, p.margin_ppm, p.doc_id
    """,
    doc=(
        "Active-learning acquisition: stratified margin (uncertainty) "
        "sampling of the next labeling batch — docs closest to the "
        "classifier's decision boundary (|confidence - 0.5|, exact "
        "ppm), pre-filtered to the uncertain band BEFORE any window "
        "(the corpus-scale guard), with per-lang quotas proportional "
        "to each lang's share of the uncertain pool (integer "
        "greatest(1, B*n_lang/n_pool) — same formula both engines). "
        "The label-efficiency loop every classifier-curated corpus "
        "runs between annotation rounds."
    ),
)
def pipeline_active_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang uncertainty-ranked labeling batch under quota.

    Scale notes (100 TB): scoring is per-row codegen; the margin
    pre-filter prunes the corpus to the uncertain band before the
    per-lang rank window (without it the window would sort whole-lang
    partitions); the quota table is lang-grain and broadcast."""
    d = spread(load_table(spark, sf_dir, "documents"))
    feats = d.select(
        "doc_id",
        "lang",
        F.expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").alias(
            "toks"
        ),
    ).select(
        "doc_id",
        "lang",
        F.size("toks").cast("bigint").alias("n_tok"),
        F.expr(
            f"aggregate(transform(toks, t -> CASE WHEN t IN ({_CLS_STOPS})"
            " THEN 1 ELSE 0 END), 0L, (a, x) -> a + x)"
        ).alias("stop_hits"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
    )
    raw = feats.filter(F.col("n_tok") > 0).select(
        "doc_id",
        "lang",
        F.expr(
            "2 * stop_hits * 1000 div n_tok"
            " + n_distinct * 1000 div n_tok"
            " + least(n_tok, 500)"
        ).alias("score"),
    )
    wt = Window.partitionBy(F.lit(1))
    pool = (
        raw.select(
            "doc_id",
            "lang",
            F.expr("score * 1000000").alias("__num"),
            F.max("score").over(wt).alias("__mx"),
        )
        .select(
            "doc_id",
            "lang",
            F.expr("__num div __mx").alias("p_ppm"),
            F.expr("abs(__num div __mx - 500000)").alias("margin_ppm"),
        )
        .filter(F.col("margin_ppm") <= _AL_PREFILTER)
    )
    n_pool = pool.agg(F.count(F.lit(1)).alias("__np"))
    quota = (
        pool.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lang"))
        .crossJoin(F.broadcast(n_pool))
        .select(
            "lang",
            F.expr(
                f"CAST(greatest(1, {_AL_BUDGET} * n_lang div __np)"
                " AS BIGINT)"
            ).alias("quota"),
        )
    )
    wl = Window.partitionBy("lang").orderBy("margin_ppm", "doc_id")
    return (
        pool.withColumn("rn", F.row_number().over(wl))
        .join(F.broadcast(quota), "lang")
        .filter(F.col("rn") <= F.col("quota"))
        .select(
            "lang",
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("p_ppm").cast("bigint").alias("p_ppm"),
            F.col("margin_ppm").cast("bigint").alias("margin_ppm"),
            "quota",
        )
        .orderBy("lang", "margin_ppm", "doc_id")
    )
