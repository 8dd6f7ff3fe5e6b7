"""Oracle-checked UDF/UDAF/UDTF queries (SURVEY §2.11) — the Python
kernels use exact integer arithmetic, so even the UDF surface is
value-hash-verified against DuckDB, not just executed."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table
from the_movies_db_spark.queries import register


@register(
    "udf_pandas_scalar",
    """
    SELECT CAST(floor(l_extendedprice / 1000) AS BIGINT) AS bucket,
           count(*)                  AS n,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY 1
    """,
    doc=(
        "Scalar pandas UDF (Arrow-vectorized): integer price banding "
        "feeding a hash aggregate — the column crosses to Python once "
        "per Arrow batch, not once per row."
    ),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from the_movies_db_spark.functions.udfs import price_bucket

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(price_bucket("l_extendedprice").alias("bucket"), "l_quantity")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@register(
    "udf_pandas_grouped_agg",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "Grouped-aggregate pandas UDF (custom UDAF): per-group exact "
        "distinct count computed in a single Arrow batch per group."
    ),
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from the_movies_db_spark.functions.udfs import distinct_count_agg

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        distinct_count_agg("l_partkey").alias("n_parts")
    )


@register(
    "udtf_split_words",
    """
    SELECT piece_idx, piece, count(*) AS n
    FROM (
      SELECT CAST(i - 1 AS INT)            AS piece_idx,
             toks[i]                       AS piece
      FROM (SELECT string_split(text, ' ') AS toks FROM documents WHERE doc_id < 50),
           unnest(range(1, len(toks) + 1)) AS t(i)
    ) s
    WHERE piece_idx < 5
    GROUP BY piece_idx, piece
    """,
    doc=(
        "Python UDTF (Spark 4): one document row explodes into "
        "(index, word, length) rows via a declared-schema table "
        "function; aggregated over the first 5 positions."
    ),
)
def udtf_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from the_movies_db_spark.functions.udfs import SplitWords

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    pieces = d.lateralJoin(SplitWords(F.col("text").outer()))
    return (
        pieces.filter(F.col("piece_idx") < 5)
        .groupBy("piece_idx", "piece")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "udf_grouped_map_demean",
    """
    WITH c AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             min(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_orderpriority) AS minc
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)        AS n_orders,
           CAST(sum(cents - minc) AS BIGINT) AS sum_dev_cents,
           CAST(max(cents - minc) AS BIGINT) AS max_dev_cents
    FROM c GROUP BY o_orderpriority
    """,
    doc=(
        "Grouped-map applyInPandas (the §2.11 shape missing beside "
        "scalar/grouped-agg/UDTF): each priority group arrives as one "
        "pandas frame, the kernel demeans prices against the group "
        "minimum in integer cents (exact — so even this Python path is "
        "value-hash-verified), and a JVM-side aggregate collapses the "
        "result. Grouped-map parallelism is bounded by group count; "
        "fine for per-entity normalization, wrong for 3-group tables — "
        "the doc says so because that IS the 100 TB design decision."
    ),
)
def udf_grouped_map_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def demean(pdf: "pd.DataFrame") -> "pd.DataFrame":
        cents = (pdf["o_totalprice"] * 100).round().astype("int64")
        out = pd.DataFrame(
            {
                "o_orderpriority": pdf["o_orderpriority"],
                "dev_cents": cents - cents.min(),
            }
        )
        return out

    o = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    devs = o.groupBy("o_orderpriority").applyInPandas(
        demean, "o_orderpriority string, dev_cents long"
    )
    return devs.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("dev_cents").cast("bigint").alias("sum_dev_cents"),
        F.max("dev_cents").cast("bigint").alias("max_dev_cents"),
    )


@register(
    "udf_cogrouped_reconcile",
    """
    WITH l AS (
      SELECT l_orderkey,
             count(*) AS n_lines,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS line_cents
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)                        AS n_orders,
           CAST(sum(coalesce(l.n_lines, 0)) AS BIGINT)     AS n_lines,
           CAST(sum(coalesce(l.line_cents, 0)) AS BIGINT)  AS line_cents,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                                                           AS order_cents
    FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey
    GROUP BY o_orderpriority
    """,
    doc=(
        "Cogrouped applyInPandas (the two-table §2.11 shape): orders and "
        "lineitem cogroup on a SHARD of the order key (pmod 64), one "
        "Python kernel sees BOTH frames per shard and reconciles every "
        "order header against its lines in integer cents (exact -> "
        "value-hash-verified); a JVM-side aggregate collapses per-order "
        "rows to priority buckets. Scale shape: cogroup is one "
        "co-partitioned shuffle of each side — the same exchange a join "
        "would do — but the kernel is invoked per SHARD, not per order: "
        "cogrouping 100 TB on a unique key means one Python call per "
        "key (measured 44 s vs 4 s at sf0.01 right here); sharding "
        "amortizes the invocation and lets pandas vectorize the "
        "per-order rollup inside."
    ),
)
def udf_cogrouped_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def reconcile(orders_pdf: "pd.DataFrame", lines_pdf: "pd.DataFrame") -> "pd.DataFrame":
        if orders_pdf.empty:  # lines whose order is absent: emit nothing
            return pd.DataFrame(
                columns=["o_orderpriority", "n_lines", "line_cents", "order_cents"]
            )
        if lines_pdf.empty:
            per_line = pd.DataFrame({"l_orderkey": [], "n_lines": [], "line_cents": []})
        else:
            cents = (lines_pdf["l_extendedprice"] * 100).round().astype("int64")
            per_line = (
                pd.DataFrame({"l_orderkey": lines_pdf["l_orderkey"], "c": cents})
                .groupby("l_orderkey", sort=False)
                .agg(n_lines=("c", "size"), line_cents=("c", "sum"))
                .reset_index()
            )
        out = orders_pdf.merge(
            per_line, left_on="o_orderkey", right_on="l_orderkey", how="left"
        )
        return pd.DataFrame(
            {
                "o_orderpriority": out["o_orderpriority"],
                "n_lines": out["n_lines"].fillna(0).astype("int64"),
                "line_cents": out["line_cents"].fillna(0).astype("int64"),
                "order_cents": (out["o_totalprice"] * 100).round().astype("int64"),
            }
        )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    per_order = (
        o.groupBy(F.pmod("o_orderkey", F.lit(64)).alias("__shard"))
        .cogroup(li.groupBy(F.pmod("l_orderkey", F.lit(64)).alias("__shard")))
        .applyInPandas(
            reconcile,
            "o_orderpriority string, n_lines long, line_cents long, order_cents long",
        )
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("n_lines").cast("bigint").alias("n_lines"),
        F.sum("line_cents").cast("bigint").alias("line_cents"),
        F.sum("order_cents").cast("bigint").alias("order_cents"),
    )


@register(
    "udtf_json_props_dynamic",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           CAST(count(*) AS BIGINT)                        AS n,
           CAST(count(missing) AS BIGINT)                  AS n_missing
    FROM (
      SELECT props, CAST(NULL AS BIGINT) AS missing
      FROM events WHERE event_id < 2000
    )
    GROUP BY 1
    """,
    doc=(
        "Polymorphic Python UDTF: the output schema (one BIGINT column "
        "per requested JSON key) is resolved at PLAN time by the "
        "UDTF's analyze() from a constant key list — a key absent from "
        "the data still yields a real, typed, all-NULL column. "
        "Aggregated mod-10 so the driver row set is bounded."
    ),
)
def udtf_json_props_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from the_movies_db_spark.functions.udfs import ExtractJsonProps

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    cols = e.lateralJoin(
        ExtractJsonProps(
            F.col("props").outer(), F.array(F.lit("k"), F.lit("missing"))
        )
    )
    return cols.groupBy((F.col("k") % 10).alias("k_mod")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count("missing").cast("bigint").alias("n_missing"),
    )


@register(
    "udf_token_bucket",
    """
    WITH RECURSIVE clicks AS (
      SELECT user_id, event_id,
             datediff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
               AS ts_us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'click'
    ), sim AS (
      SELECT user_id, rn, ts_us,
             3 - 1 AS tokens_after, 1 AS admitted
      FROM clicks WHERE rn = 1
      UNION ALL
      SELECT c.user_id, c.rn, c.ts_us,
             CASE WHEN least(3, s.tokens_after
                               + (c.ts_us - s.ts_us) // 120000000) >= 1
                  THEN least(3, s.tokens_after
                                + (c.ts_us - s.ts_us) // 120000000) - 1
                  ELSE least(3, s.tokens_after
                                + (c.ts_us - s.ts_us) // 120000000) END,
             CASE WHEN least(3, s.tokens_after
                               + (c.ts_us - s.ts_us) // 120000000) >= 1
                  THEN 1 ELSE 0 END
      FROM sim s JOIN clicks c ON c.user_id = s.user_id AND c.rn = s.rn + 1
    ), per_user AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT)       AS n_clicks,
             CAST(sum(admitted) AS BIGINT)  AS n_admitted,
             CAST(count(*) - sum(admitted) AS BIGINT) AS n_rejected
      FROM sim GROUP BY user_id
    )
    SELECT user_id, n_clicks, n_admitted, n_rejected
    FROM per_user
    ORDER BY n_rejected DESC, user_id
    LIMIT 10
    """,
    doc=(
        "Token-bucket rate-limit simulation (cap 3, one token per 2 min "
        "of gap): an inherently SEQUENTIAL per-user state machine run as "
        "a grouped-map pandas UDF — the §2.11 shape for state that "
        "windows cannot express (the refill CLAMP makes prefix-sum "
        "rewrites impossible). All-integer state; the oracle replays "
        "the identical machine with a recursive CTE, so even this "
        "stateful UDF path is value-hash-verified. Top-10 throttled "
        "users."
    ),
)
def udf_token_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user token-bucket admission via grouped applyInPandas.

    Scale notes (100 TB): state is per user, so the shuffle key is
    user_id and each group replays only its own clicks — a billion
    users parallelize perfectly; the Python kernel is one pass over
    each group's rows. The streaming twin is
    applyInPandasWithState with the same integer state."""
    from the_movies_db_spark.functions.udfs import token_bucket_shard_kernel

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
    )
    # group on a SHARD of the key, not the key: one Python call per
    # shard replays every user in it (identical per-user values; the
    # round-2 cogroup lesson — per-user grouping was 1,500 Arrow
    # round-trips and 4.3 s at sf0.1, sharded is ~32 calls / 1.1 s).
    # The shard key is deterministic (user_id % shards), so state for
    # one user never splits across calls.
    shards = spark.sparkContext.defaultParallelism
    per_user = (
        clicks.groupBy((F.col("user_id") % shards).alias("__shard"))
        .applyInPandas(
            token_bucket_shard_kernel,
            "user_id long, n_clicks long, n_admitted long, n_rejected long",
        )
    )
    return per_user.orderBy(F.desc("n_rejected"), F.asc("user_id")).limit(10)


# ---------------------------------------------------------------------------
# mapInArrow: zero-copy Arrow batch kernel (Spark-4 API surface)
# ---------------------------------------------------------------------------

_ARROW_Q = (
    "CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)"
)


@register(
    "udf_mapinarrow_norm",
    f"""
    WITH q AS (
      SELECT label,
             CAST(list_aggregate(list_transform(embedding,
                    v -> {_ARROW_Q} * {_ARROW_Q}), 'sum') AS BIGINT) AS qn
      FROM embeddings
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(min(qn) AS BIGINT) AS min_qnorm2,
           CAST(max(qn) AS BIGINT) AS max_qnorm2,
           CAST(sum(qn) AS BIGINT) AS sum_qnorm2
    FROM q GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "mapInArrow kernel: per-vector squared norm in micro-quantized "
        "BIGINT computed on raw Arrow batches (zero-copy flatten to a "
        "numpy int64 matrix — no pandas conversion), then a JVM-side "
        "per-label aggregation on top. The kernel is ORDER-FREE "
        "integer arithmetic (floor-micro per element, then integer "
        "squares/sums), so arbitrary Arrow batch boundaries and "
        "summation orders cannot change the value-hash — the design "
        "rule that makes a python-kernel op oracle-pinnable at all."
    ),
)
def udf_mapinarrow_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native batch kernel + JVM aggregation.

    Scale notes (100 TB): the kernel is embarrassingly parallel per
    Arrow batch (vectorized int64 ops over a zero-copy flatten;
    ~10-100x a row-at-a-time Python UDF); the reduction after it is an
    ordinary label-keyed hash aggregate. Fixed dim = 64 is asserted
    against the flattened length, so a ragged batch fails loudly
    rather than mis-reshaping."""
    import pyarrow as pa

    def kernel(batches):
        import numpy as np

        for b in batches:
            emb = b.column(b.schema.get_field_index("embedding"))
            v = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            assert v.size == b.num_rows * 64, (v.size, b.num_rows)
            q = np.floor(v * 1000000.0).astype(np.int64)
            s = (q * q).reshape(-1, 64).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("label")),
                    pa.array(s, type=pa.int64()),
                ],
                ["label", "qn"],
            )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.select("label", "embedding").mapInArrow(kernel, "label int, qn long")
    return (
        q.groupBy(F.col("label").cast("bigint").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.min("qn").cast("bigint").alias("min_qnorm2"),
            F.max("qn").cast("bigint").alias("max_qnorm2"),
            F.sum("qn").cast("bigint").alias("sum_qnorm2"),
        )
        .orderBy("label")
    )


@register(
    "udtf_char_ngrams",
    """
    SELECT gram, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM (
      SELECT doc_id, substr(text, CAST(i AS INT), 3) AS gram
      FROM (SELECT doc_id, text FROM documents WHERE doc_id < 50) d,
           unnest(range(1, length(text) - 1)) AS t(i)
    ) s
    GROUP BY gram
    ORDER BY n DESC, gram
    LIMIT 15
    """,
    doc=(
        "Declared-schema Python UDTF as an n-gram tokenizer: lateral "
        "join explodes each doc into (index, char-trigram) rows, then "
        "a JVM-side aggregate ranks the top trigrams with document "
        "frequency — the UDTF surface (§2.11) doing real tokenizer "
        "work, value-hash-verified against a pure-SQL replay."
    ),
)
def udtf_char_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top char-trigrams via the CharTrigrams UDTF.

    Scale notes (100 TB): the UDTF runs per input row (Arrow-batched
    process pool); everything after the lateral join is a standard
    gram-keyed combining aggregate. Top-k via orderBy+limit."""
    from the_movies_db_spark.functions.udfs import CharTrigrams

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    grams = d.lateralJoin(CharTrigrams(F.col("text").outer()))
    return (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("doc_id").cast("bigint").alias("df"),
        )
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Arrow-optimized scalar Python UDF (useArrow=True — the Spark 4 fast
# path for row-at-a-time Python, distinct from pandas_udf)
# ---------------------------------------------------------------------------


@register(
    "udf_arrow_scalar",
    """
    SELECT source,
           CAST(sum(CASE WHEN len(regexp_replace(lang || ':' || source,
                                                 '[aeiou]', '', 'g'))
                          % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bucket0,
           CAST(sum(len(regexp_replace(lang || ':' || source,
                                       '[aeiou]', '', 'g'))) AS BIGINT)
             AS total_len
    FROM documents GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "Arrow-optimized scalar Python UDF (useArrow=True): the Spark 4 "
        "fast path for row-at-a-time Python — Arrow batches replace "
        "pickled rows, ~2-10x over the legacy pickle UDF while keeping "
        "the simple one-value-at-a-time authoring model (pandas_udf "
        "remains the vectorized tier; both are registered). The kernel "
        "is deterministic string surgery (strip vowels, length, mod "
        "bucket) the oracle replays in SQL, so the Arrow serialization "
        "path itself is value-hash-verified."
    ),
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized (non-pandas) Python UDF, oracle-verified.

    Scale notes (100 TB): still a Python-worker roundtrip per batch —
    use for logic that genuinely can't be expressed in SQL/pandas; the
    point of this entry is pinning that the useArrow path yields
    byte-identical semantics to the SQL spelling."""

    def devowel_len(s: str) -> int:
        return len("".join(ch for ch in s if ch not in "aeiou"))

    f = F.udf(devowel_len, "int", useArrow=True)
    d = load_table(spark, sf_dir, "documents").select(
        "source", f(F.expr("lang || ':' || source")).alias("__l")
    )
    return (
        d.groupBy("source")
        .agg(
            F.sum(F.expr("CASE WHEN __l % 7 = 0 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_bucket0"),
            F.sum("__l").cast("bigint").alias("total_len"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Polymorphic UDTF over a TABLE argument (PARTITION BY / ORDER BY input)
# ---------------------------------------------------------------------------

_SESS_GAP_US = 1_800_000_000  # 30 minutes


@register(
    "udtf_table_argument",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id FROM events
    ),
    g AS (
      SELECT user_id,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id
                    ORDER BY us, event_id) > {_SESS_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM e
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(1 + sum(brk) AS BIGINT) AS n_sessions
    FROM g GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "Python UDTF over a TABLE ARGUMENT — the Spark 4 polymorphic "
        "table-function surface: the UDTF consumes "
        "TABLE(...) PARTITION BY user_id ORDER BY (us, event_id), so "
        "the ENGINE delivers each user's ordered event stream to one "
        "UDTF instance and the function just folds integer state "
        "(session counter over 30-minute gaps). The oracle replays the "
        "same sessionization with a lag window — driver equality pins "
        "both the partition/order delivery contract and the state "
        "machine."
    ),
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionizing UDTF fed by a partitioned, ordered TABLE argument.

    Scale notes (100 TB): PARTITION BY shuffles once on user_id and
    ORDER BY sorts within partitions — the engine owns the data
    movement; the Python side is a per-group integer fold over Arrow
    batches, the cheapest custom-logic shape above mapInPandas."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, n_sessions bigint")
    class SessionCounter:
        def __init__(self) -> None:
            self.user = None
            self.prev_us = None
            self.n = 0
            self.sessions = 0

        def eval(self, row) -> None:
            self.user = row["user_id"]
            us = row["us"]
            if self.prev_us is None or us - self.prev_us > 1_800_000_000:
                self.sessions += 1
            self.prev_us = us
            self.n += 1

        def terminate(self):
            if self.user is not None:
                yield self.user, self.n, self.sessions

    spark.udtf.register("_session_counter", SessionCounter)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01', ts)"
        ).alias("us"),
        "event_id",
    )
    ev.createOrReplaceTempView("_sess_events")
    return spark.sql(
        """
        SELECT * FROM _session_counter(
          TABLE(_sess_events)
          PARTITION BY user_id ORDER BY (us, event_id)
        ) ORDER BY user_id
        """
    )
