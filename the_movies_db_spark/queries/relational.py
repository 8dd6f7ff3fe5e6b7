"""Relational operator coverage (SURVEY §2.4–§2.9, §2.7, §2.8).

The reference delegates all relational execution to PostgreSQL (its
only join-shaped op is the MERGE, /root/reference/utilities/queries.py:35-48);
this module provides the full declarative surface on Spark, each query
oracle-checked against DuckDB.

Conventions (driver correctness gate):
- every computed column is aliased identically in Spark and SQL;
- floating-point aggregates are ``round``-ed identically on both
  sides so cross-engine summation-order differences cannot flip the
  value hash;
- every LIMIT/top-k query orders by the *rounded* measure plus a
  unique key, so the selected row set is engine-independent.

Scale notes (100 TB design stance):
- dimension tables (region/nation/supplier/part/customer) are
  explicitly ``F.broadcast`` in star joins — no shuffle of the fact
  table for dim joins at any scale;
- aggregations are expressed as single ``groupBy.agg`` so Catalyst
  plans partial (map-side) + final aggregation;
- top-k is ``orderBy().limit()`` which Spark executes as
  TakeOrderedAndProject (no global sort materialization);
- window functions partition by high-cardinality keys (custkey,
  user_id) — no single-partition global windows on fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table
from the_movies_db_spark.queries import register


def _tlit(df: DataFrame, column: str, value: str):
    """Literal cast to the column's own (timestamp) type, so filters
    behave identically whether the file was read as NTZ or LTZ."""
    return F.lit(value).cast(df.schema[column].dataType)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.5 — absent in reference, required surface)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: filtered scan → partial+final hash agg.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= _tlit(li, "l_shipdate", "1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q06_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6-style: selective filter fully pushed to parquet scan → global agg.",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _tlit(li, "l_shipdate", "1996-01-01"))
            & (F.col("l_shipdate") < _tlit(li, "l_shipdate", "1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "agg_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey)  AS n_supp,
           count(DISTINCT l_partkey)  AS n_part,
           count(*)                   AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="COUNT(DISTINCT) — Spark plans expand + two-phase distinct aggregation.",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "agg_stats",
    """
    SELECT o_orderstatus,
           round(stddev_samp(o_totalprice), 4)               AS sd_price,
           round(var_samp(o_totalprice), 2)                  AS var_price,
           round(min(o_totalprice), 2)                       AS min_price,
           round(max(o_totalprice), 2)                       AS max_price,
           round(quantile_cont(o_totalprice, 0.5), 4)        AS median_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Statistical aggregates incl. exact interpolated median.",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
            F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        )
    )


@register(
    "agg_corr",
    """
    SELECT round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           round(avg(l_quantity), 6)                         AS mean_qty
    FROM lineitem
    """,
    doc="Bivariate statistics over the fact table (single-pass agg).",
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.avg("l_quantity"), 6).alias("mean_qty"),
    )


@register(
    "agg_rollup",
    """
    SELECT coalesce(c_mktsegment, 'ALL')        AS segment,
           coalesce(o_orderstatus, 'ALL')       AS status,
           cast(grouping(c_mktsegment) AS INT)  AS g_seg,
           cast(grouping(o_orderstatus) AS INT) AS g_status,
           count(*)                             AS n_orders,
           round(sum(o_totalprice), 2)          AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
    """,
    doc="ROLLUP with GROUPING() disambiguation (broadcast dim join feeding it).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .rollup("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.grouping("c_mktsegment").cast("int").alias("g_seg"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "g_seg",
            "g_status",
            "n_orders",
            "total_price",
        )
    )


@register(
    "agg_cube",
    """
    SELECT coalesce(l_returnflag, 'ALL')  AS rflag,
           coalesce(l_linestatus, 'ALL')  AS lstatus,
           count(*)                       AS n,
           round(sum(l_quantity), 2)      AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over the fact table.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n",
            "qty",
        )
    )


@register(
    "agg_grouping_sets",
    """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL')   AS status,
           count(*)                         AS n,
           round(avg(o_totalprice), 4)      AS avg_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
    doc="Explicit GROUPING SETS (disjoint single-column sets).",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL')   AS status,
               count(*)                         AS n,
               round(avg(o_totalprice), 4)      AS avg_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


@register(
    "agg_collect_set",
    """
    SELECT r_name,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Set-collection aggregate, canonicalized to a sorted joined string.",
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"))
    )


@register(
    "agg_approx_distinct",
    None,  # HLL sketches are engine-specific — rows-only check
    doc="approx_count_distinct (HyperLogLog++) — the 100 TB path for distinct counts.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        )
    )


@register(
    "agg_approx_distinct_audit",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS parts_within_3pct,
           TRUE AS orders_within_3pct
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "Value-level audit of agg_approx_distinct (which stays rows-only "
        "— HLL++ sketches are engine-internal): the exact distinct "
        "counts are hard-hashed, and the HLL++ estimates (rsd=0.01, "
        "deterministic for fixed data) are pinned by a 3-sigma integer "
        "error-bound verdict — `abs(est - exact) * 100 <= 3 * exact`. "
        "A Spark-side estimator drift or sketch regression flips the "
        "boolean and the driver's value-hash catches it; the "
        "agg_kmv_distinct recipe applied to the builtin estimator."
    ),
)
def agg_approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Exact distincts and HLL++ estimates in SEPARATE aggregations,
    # joined on the 3-row group key: mixing count_distinct with
    # approx_count_distinct in ONE agg triggers the Expand
    # multi-distinct rewrite with the HLL++ buffers dragged through it
    # — measured 129 s vs 2+2 s split at sf0.1 (x16 probe finding).
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").cast("bigint").alias("exact_parts"),
        F.count_distinct("l_orderkey").cast("bigint").alias("exact_orders"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("__ap"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("__ao"),
    )
    return (
        exact.join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            "exact_orders",
            F.expr("abs(__ap - exact_parts) * 100 <= 3 * exact_parts").alias(
                "parts_within_3pct"
            ),
            F.expr(
                "abs(__ao - exact_orders) * 100 <= 3 * exact_orders"
            ).alias("orders_within_3pct"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4 — reference has only the MERGE equi-join)
# ---------------------------------------------------------------------------


@register(
    "q03_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style: selective dim filter → fact joins → top-k by revenue.",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = o.filter(F.col("o_orderdate") < _tlit(o, "o_orderdate", "1998-03-15"))
    li = li.filter(F.col("l_shipdate") > _tlit(li, "l_shipdate", "1998-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_local_supplier",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-style star join; all dims broadcast — fact table never shuffles for the joins.",
)
def q05_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    o = o.filter(
        (F.col("o_orderdate") >= _tlit(o, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _tlit(o, "o_orderdate", "1997-01-01"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(max(c_acctbal), 2) AS c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10-style returned-item revenue: filter → joins → agg → top-k.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.round(F.max("c_acctbal"), 2).alias("c_acctbal"),
        )
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "join_left_outer",
    """
    SELECT c_custkey, c_mktsegment,
           count(o_orderkey)                         AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2)  AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
    doc="LEFT OUTER join preserving customers with zero orders.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    doc="LEFT SEMI join (EXISTS) — no duplication of the left side.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="LEFT ANTI join (NOT EXISTS) — customers with no orders at all.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_full_outer",
    """
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cn.nk, sn.nk)    AS nationkey,
           coalesce(n_cust, 0)       AS n_cust,
           coalesce(n_supp, 0)       AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    doc="FULL OUTER join of two aggregates with coalesced keys.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, cn.nk == sn.nk, "full_outer").select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_cross",
    """
    SELECT r_name, s.status, count(*) AS n
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
    GROUP BY r_name, s.status
    """,
    doc="CROSS join of two tiny relations (only place a cartesian product is acceptable).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status")
    ).distinct()
    return r.crossJoin(s).groupBy("r_name", "status").agg(F.count(F.lit(1)).alias("n"))


@register(
    "join_range",
    """
    SELECT b.band, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
    FROM orders
    JOIN (VALUES ('low', 0.0, 100000.0),
                 ('mid', 100000.0, 300000.0),
                 ('high', 300000.0, 1000000.0)) AS b(band, lo, hi)
      ON o_totalprice >= b.lo AND o_totalprice < b.hi
    GROUP BY b.band
    """,
    doc="Range (theta) join against a broadcast band dimension — banded non-equi join.",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "join_interval_overlap",
    """
    WITH a AS (
      SELECT event_id AS a_id,
             datediff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS a_start,
             datediff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
               + 600 + (event_id % 10) * 60 AS a_end
      FROM events WHERE event_type = 'purchase'
    ), b AS (
      SELECT event_id AS b_id,
             datediff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS b_start,
             datediff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
               + 300 + (event_id % 20) * 30 AS b_end
      FROM events WHERE event_type = 'error'
    )
    SELECT CAST((a_start // 3600) % 24 AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT a_id) AS BIGINT) AS n_purchases,
           CAST(sum(least(a_end, b_end) - greatest(a_start, b_start)) AS BIGINT)
             AS overlap_seconds
    FROM a JOIN b ON a_start <= b_end AND b_start <= a_end
    GROUP BY 1
    """,
    doc=(
        "Interval-overlap join (purchase windows x error windows) via the binned "
        "equi-join rewrite — the oracle runs the plain non-equi join; the Spark plan "
        "shuffles on time buckets instead of degenerating to a nested-loop cross "
        "product. Each pair is attributed to the bucket of greatest(starts), so the "
        "rewrite is exactly lossless and duplicate-free by construction."
    ),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from the_movies_db_spark.operators.joins import interval_overlap_join

    epoch = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("a_id"),
        F.expr(epoch).alias("a_start"),
        F.expr(f"{epoch} + 600 + (event_id % 10) * 60").alias("a_end"),
    )
    b = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("b_id"),
        F.expr(epoch).alias("b_start"),
        F.expr(f"{epoch} + 300 + (event_id % 20) * 30").alias("b_end"),
    )
    # bucket_width ~ the median interval length (a: 600-1140 s, b:
    # 300-870 s) — an oversized bucket degrades toward per-bucket cross
    # products; 900 keeps candidate sets near the true-pair count.
    pairs = interval_overlap_join(a, b, "a_start", "a_end", "b_start", "b_end", 900)
    return pairs.groupBy(
        F.expr("(a_start div 3600) % 24").cast("bigint").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("a_id").alias("n_purchases"),
        F.sum(
            F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
        ).cast("bigint").alias("overlap_seconds"),
    )


@register(
    "join_spatial_radius",
    """
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             CAST(concat('0x', substr(md5('cx:' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS cx,
             CAST(concat('0x', substr(md5('cy:' || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS cy
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             CAST(concat('0x', substr(md5('sx:' || CAST(s_suppkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS sx,
             CAST(concat('0x', substr(md5('sy:' || CAST(s_suppkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS sy
      FROM supplier
    ), pairs AS (
      SELECT c_nationkey, c_custkey,
             (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS d2
      FROM c JOIN s ON (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 150 * 150
    )
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT)                 AS n_pairs,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
           CAST(min(d2) AS BIGINT)                  AS min_dist2
    FROM pairs JOIN nation n ON pairs.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc=(
        "Radius (distance) join via grid binning — the 2D sibling of "
        "join_interval_overlap: side A probes its 3x3 cell neighborhood, "
        "side B keeps one home cell, the exact integer squared-distance "
        "predicate prunes corner candidates. The oracle runs the plain "
        "quadratic theta-join, so the driver pins losslessness. "
        "Coordinates are md5-derived integers, exact in both engines."
    ),
)
def join_spatial_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    from the_movies_db_spark.operators.joins import grid_radius_join

    def coord(seed: str, key: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(seed + ":"), F.col(key).cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % 10000
        )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        coord("cx", "c_custkey").alias("cx"),
        coord("cy", "c_custkey").alias("cy"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        coord("sx", "s_suppkey").alias("sx"),
        coord("sy", "s_suppkey").alias("sy"),
    )
    n = load_table(spark, sf_dir, "nation")
    pairs = grid_radius_join(c, s, "cx", "cy", "sx", "sy", 150)
    return (
        pairs.withColumn(
            "d2",
            F.expr("(cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)"),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.min("d2").cast("bigint").alias("min_dist2"),
        )
    )


@register(
    "join_asof",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_type,
             max(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS signup_ts
      FROM events
    )
    SELECT user_id, ts AS purchase_ts, signup_ts
    FROM tagged
    WHERE event_type = 'purchase' AND signup_ts IS NOT NULL
    """,
    doc=(
        "As-of join expressed as union+ordered window (the scalable pattern: one shuffle "
        "on user_id, no pairwise blow-up), matching each purchase with the latest prior signup."
    ),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    signup_ts = F.max(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("signup_ts", signup_ts)
        .filter((F.col("event_type") == "purchase") & F.col("signup_ts").isNotNull())
        .select("user_id", F.col("ts").alias("purchase_ts"), "signup_ts")
    )


@register(
    "join_asof_forward",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase_ts
      FROM events
    )
    SELECT user_id, ts AS click_ts, next_purchase_ts,
           CAST(date_diff('microsecond', ts, next_purchase_ts) AS BIGINT)
             // 1000000 AS latency_s
    FROM tagged
    WHERE event_type = 'click' AND next_purchase_ts IS NOT NULL
      AND next_purchase_ts <= ts + INTERVAL 30 MINUTE
    """,
    doc=(
        "FORWARD as-of join with tolerance (the complement of join_asof's "
        "latest-prior direction): each click matched to the EARLIEST "
        "following purchase within 30 minutes, via a 1-FOLLOWING window "
        "over the unioned event stream — one shuffle on user_id, no "
        "pairwise interval join. Latency is an exact integer: "
        "microsecond diff (both engines exact at that grain) integer-"
        "divided to seconds — never a truncating SECOND-diff."
    ),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("next_purchase_ts", nxt)
        .filter(
            (F.col("event_type") == "click")
            & F.col("next_purchase_ts").isNotNull()
            & (
                F.col("next_purchase_ts")
                <= F.col("ts") + F.expr("INTERVAL 30 MINUTES")
            )
        )
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            "next_purchase_ts",
            F.expr(
                "timestampdiff(MICROSECOND, ts, next_purchase_ts) div 1000000"
            ).alias("latency_s"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price, rn
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
    WHERE rn <= 3
    """,
    doc="Per-group top-k via row_number — the pattern the upsert engine's keep-latest uses.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            "rn",
        )
    )


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 2) AS running_total
    FROM orders
    """,
    doc="Running sum with an explicit ROWS frame, partitioned by a high-cardinality key.",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "window_lag_lead",
    """
    SELECT user_id, event_id,
           round(value, 2)                                                          AS value,
           round(lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)  AS prev_value,
           round(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)  AS next_value
    FROM events
    """,
    doc="lag/lead analytics over the event stream.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
    )


@register(
    "window_rank_ntile",
    """
    SELECT c_nationkey, c_custkey,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal,2) DESC, c_custkey) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal,2) DESC, c_custkey) AS drnk,
           ntile(4)     OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal,2) DESC, c_custkey) AS quartile
    FROM customer
    """,
    doc="rank / dense_rank / ntile ranking family.",
)
def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc(F.round("c_acctbal", 2)), F.asc("c_custkey")
    )
    return load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_moving_avg",
    """
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS ma5,
           round(first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS first_v,
           round(last_value(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS last_v
    FROM events
    """,
    doc="Sliding ROWS frames: moving average, first_value/last_value.",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(base.rowsBetween(-4, 0)), 4).alias("ma5"),
        F.round(
            F.first("value").over(base.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("first_v"),
        F.round(F.last("value").over(base.rowsBetween(-2, 0)), 2).alias("last_v"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (SURVEY §2.7)
# ---------------------------------------------------------------------------


@register(
    "sort_topk",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS price, o_orderpriority
    FROM orders
    ORDER BY round(o_totalprice, 2) DESC, o_orderpriority ASC, o_orderkey ASC
    LIMIT 25
    """,
    doc="Multi-column global top-k — Spark plans TakeOrderedAndProject, no full sort.",
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(
            F.desc(F.round("o_totalprice", 2)),
            F.asc("o_orderpriority"),
            F.asc("o_orderkey"),
        )
        .limit(25)
        .select(
            "o_orderkey", F.round("o_totalprice", 2).alias("price"), "o_orderpriority"
        )
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.8)
# ---------------------------------------------------------------------------


@register(
    "set_union",
    """
    SELECT nationkey, count(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) u GROUP BY nationkey
    """,
    doc="UNION ALL + re-aggregation.",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    doc="INTERSECT (distinct) of two key projections.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    doc="EXCEPT (distinct): nations with customers but no suppliers.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT DISTINCT (exceptAll would keep multiset leftovers)


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.9)
# ---------------------------------------------------------------------------


@register(
    "fn_string",
    """
    SELECT p_partkey,
           upper(p_brand)                                   AS brand_up,
           lower(p_type)                                    AS type_lo,
           substr(p_name, 1, 8)                             AS name_prefix,
           length(p_name)                                   AS name_len,
           concat_ws('|', p_brand, p_type)                  AS brand_type,
           replace(p_type, ' ', '_')                        AS type_snake,
           trim(p_name)                                     AS name_trim,
           lpad(cast(p_size AS VARCHAR), 4, '0')            AS size_pad,
           regexp_extract(p_name, '([a-z]+)', 1)            AS first_word,
           regexp_replace(p_type, '[aeiou]', '')            AS type_novowel,
           CASE WHEN p_name LIKE '%al%' THEN 1 ELSE 0 END   AS has_al
    FROM part
    """,
    doc="String function battery (reference F7 parity + full surface).",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", "[aeiou]", "").alias("type_novowel"),
        F.when(F.col("p_name").like("%al%"), 1).otherwise(0).alias("has_al"),
    )


@register(
    "fn_datetime",
    """
    SELECT o_orderkey,
           cast(year(o_orderdate) AS INT)     AS yr,
           cast(quarter(o_orderdate) AS INT)  AS qtr,
           cast(month(o_orderdate) AS INT)    AS mo,
           cast(day(o_orderdate) AS INT)      AS dom,
           date_trunc('month', o_orderdate)   AS month_start,
           strftime(o_orderdate, '%Y-%m-%d')  AS odate,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95
    FROM orders
    """,
    doc="Datetime extraction/truncation/arithmetic (reference F5/F6 parity).",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        # string, not DATE: date-typed cells convert inconsistently to
        # pandas across engines (date vs midnight-datetime)
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            _tlit(o, "o_orderdate", "1995-01-01").cast("date"),
        ).cast("bigint").alias("days_since_95"),
    )


@register(
    "fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 30000), 2)      AS abs_dev,
           cast(ceil(l_quantity / 7) AS BIGINT)        AS qty_ceil,
           cast(floor(l_quantity / 7) AS BIGINT)       AS qty_floor,
           round(sqrt(l_extendedprice), 4)             AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)           AS price_ln,
           round(log10(l_extendedprice + 1), 6)        AS price_log10,
           round(pow(l_discount, 2), 6)                AS disc_sq,
           cast(mod(cast(l_quantity AS BIGINT), 5) AS BIGINT) AS qty_mod5,
           cast(sign(l_extendedprice - 30000) AS INT)  AS dev_sign,
           round(greatest(l_discount, l_tax), 2)       AS max_rate,
           round(least(l_discount, l_tax), 2)          AS min_rate
    FROM lineitem
    """,
    doc="Math function battery, all inside whole-stage codegen.",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 2).alias("abs_dev"),
        F.ceil(F.col("l_quantity") / 7).cast("bigint").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).cast("bigint").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        (F.col("l_quantity").cast("bigint") % 5).cast("bigint").alias("qty_mod5"),
        F.signum(F.col("l_extendedprice") - 30000).cast("int").alias("dev_sign"),
        F.round(F.greatest("l_discount", "l_tax"), 2).alias("max_rate"),
        F.round(F.least("l_discount", "l_tax"), 2).alias("min_rate"),
    )


@register(
    "fn_conditional",
    """
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END                       AS bucket,
           coalesce(nullif(o_orderstatus, 'P'), '_P_') AS status_masked,
           count(*)                                    AS n
    FROM orders
    GROUP BY 1, 2
    """,
    doc="CASE WHEN / coalesce / nullif conditional logic.",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    masked = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("_P_"))
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(bucket.alias("bucket"), masked.alias("status_masked"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "fn_json",
    """
    SELECT event_type,
           count(*)                                                   AS n,
           cast(sum(cast(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(cast(json_extract_string(props, '$.k') AS BIGINT))     AS min_k,
           max(cast(json_extract_string(props, '$.k') AS BIGINT))     AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON extraction from a string payload column (reference F1-F3 parity).",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )


@register(
    "fn_array",
    """
    SELECT vec_id,
           len(embedding)                                   AS dim,
           round(cast(embedding[1] AS DOUBLE), 4) + 0.0     AS first_elem,
           round(cast(embedding[64] AS DOUBLE), 4) + 0.0    AS last_elem,
           round(list_aggregate(list_transform(embedding, x -> x::DOUBLE), 'sum'), 3)
             + 0.0 AS vec_sum
    FROM embeddings
    """,
    doc="Array ops on the embedding column: size, 1-indexed element access, fold.",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    # `+ 0.0` normalizes IEEE negative zero after rounding: DuckDB's
    # round keeps -0.0 where Spark returns 0.0, and -0.0 vs 0.0 breaks
    # the order-insensitive row sort even though the values are equal
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").alias("dim"),
        (F.round(F.element_at("embedding", 1).cast("double"), 4) + 0.0).alias(
            "first_elem"
        ),
        (F.round(F.element_at("embedding", 64).cast("double"), 4) + 0.0).alias(
            "last_elem"
        ),
        (
            F.round(
                F.aggregate(
                    "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
                ),
                3,
            )
            + 0.0
        ).alias("vec_sum"),
    )


# ---------------------------------------------------------------------------
# Event-stream analytics in batch (SURVEY §2.10's semantics, batch analog)
# ---------------------------------------------------------------------------


@register(
    "events_tumbling",
    """
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           count(*)               AS n_events,
           round(sum(value), 2)   AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling-window aggregation (batch analog of streaming F.window).",
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "events_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             cast(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id,
           count(*)                                        AS n_events,
           round(sum(value), 2)                            AS session_value,
           cast(datediff('microsecond', min(ts), max(ts)) // 1000000 AS BIGINT) AS duration_sec
    FROM sess
    GROUP BY user_id, session_id
    """,
    doc=(
        "Sessionization with a 30-min inactivity gap: lag → new-session flag → "
        "running sum as session id → per-session agg. Batch analog of "
        "F.session_window; scales as two shuffles on user_id."
    ),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # compare gaps at microsecond precision: SECOND-granularity diffs
    # truncate and would disagree with an exact INTERVAL comparison
    gap_us = F.expr("timestampdiff(MICROSECOND, _prev_ts, ts)")
    return (
        ev.withColumn("_prev_ts", prev_ts)
        .withColumn(
            "is_new",
            (F.col("_prev_ts").isNull() | (gap_us > 1800 * 1_000_000)).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
            F.expr(
                "timestampdiff(MICROSECOND, min(ts), max(ts)) DIV 1000000"
            ).alias("duration_sec"),
        )
    )


@register(
    "events_funnel",
    """
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup'   THEN ts END) AS first_signup,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*)                                         AS n_users,
           count(first_signup)                              AS n_signed_up,
           count(CASE WHEN first_purchase > first_signup
                      THEN 1 END)                           AS n_converted
    FROM per_user
    """,
    doc="Signup→purchase conversion funnel via conditional aggregation.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
                "first_signup"
            ),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "first_purchase"
            ),
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_signup").alias("n_signed_up"),
        F.count(
            F.when(F.col("first_purchase") > F.col("first_signup"), 1)
        ).alias("n_converted"),
    )


@register(
    "join_salted_skew",
    """
    SELECT s.s_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1
    """,
    doc=(
        "Skew-resistant salted equi-join (operators.joins.salted_join), "
        "value-verified equal to the plain join: the small side is "
        "replicated salt x and the fact side sprays rows across replicas "
        "by a deterministic hash of its non-key columns, so one hot key "
        "lands in salt partitions instead of one. The x16 skew probe "
        "(90% of rows on one key) measures the salted form faster than "
        "the plain shuffle join; AQE's skew-join split is the automatic "
        "alternative, this is the explicit one."
    ),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from the_movies_db_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    j = salted_join(
        li, s, on="l_suppkey", salt=8,
        spray_cols=["l_orderkey", "l_linenumber"],
    )
    return j.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@register(
    "join_bloom_prefilter",
    """
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1
    """,
    doc=(
        "Runtime-filter join (operators.joins.bloom_prefilter_join): a "
        "Bloom filter of the filtered dim's keys — one inlined "
        "8192-bit mask, two codegen bit-tests per fact row — prunes "
        "the fact BEFORE its shuffle; the exact join then removes the "
        "Bloom's false positives. The oracle is the PLAIN join, so "
        "driver equality pins no-false-negatives. The explicit form of "
        "spark.sql.optimizer.runtime.bloomFilter's injected filter."
    ),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from the_movies_db_spark.operators.joins import bloom_prefilter_join

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderpriority", "o_totalprice"
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    j = bloom_prefilter_join(o, c, on="c_custkey")
    return j.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "join_asof_tolerance",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_type,
             max(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS signup_ts
      FROM events
    )
    SELECT user_id, ts AS purchase_ts, signup_ts
    FROM tagged
    WHERE event_type = 'purchase' AND signup_ts IS NOT NULL
      AND datediff('microsecond', signup_ts, ts) <= 2592000000000
    """,
    doc=(
        "As-of join with a staleness tolerance (pandas merge_asof "
        "tolerance= parity, the feature-store freshness rule): same "
        "union+ordered-window rewrite as join_asof, but matches whose "
        "looked-up value is older than 30 days are DROPPED rather than "
        "served stale. The bound compares at microsecond precision; "
        "the 30-day constant is pre-folded (int32 literal products "
        "overflow in both engines' checked arithmetic)."
    ),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    signup_ts = F.max(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("signup_ts", signup_ts)
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("signup_ts").isNotNull()
            & F.expr(
                "timestampdiff(MICROSECOND, signup_ts, ts) <= 2592000000000L"
            )
        )
        .select("user_id", F.col("ts").alias("purchase_ts"), "signup_ts")
    )


@register(
    "join_asof_nearest",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_type, event_id,
             max(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_click,
             min(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_click
      FROM events
    )
    SELECT user_id, ts AS error_ts,
           CASE WHEN next_click IS NULL THEN prev_click
                WHEN prev_click IS NULL THEN next_click
                WHEN date_diff('microsecond', prev_click, ts)
                     <= date_diff('microsecond', ts, next_click)
                THEN prev_click ELSE next_click END AS nearest_click_ts,
           CAST(least(
                  coalesce(date_diff('microsecond', prev_click, ts),
                           9223372036854775807),
                  coalesce(date_diff('microsecond', ts, next_click),
                           9223372036854775807)
                ) // 1000000 AS BIGINT) AS abs_gap_s
    FROM tagged
    WHERE event_type = 'error'
      AND (prev_click IS NOT NULL OR next_click IS NOT NULL)
    """,
    doc=(
        "NEAREST-direction as-of join (completing the asof family: "
        "backward, forward, tolerance, nearest): each error matched to "
        "the click minimizing |delta t| in either direction, ties to "
        "the earlier click — two complementary ordered windows over one "
        "user_id shuffle, no pairwise interval join. Gaps compared at "
        "MICROSECOND precision; output gap integer-divided to seconds."
    ),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nearest as-of match via two ordered windows.

    Scale notes (100 TB): identical shape to join_asof — one shuffle
    on the entity key, per-row min/max windows, zero candidate
    blow-up regardless of click density."""
    ev = load_table(spark, sf_dir, "events")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    click = F.when(F.col("event_type") == "click", F.col("ts"))
    tagged = ev.withColumn("prev_click", F.max(click).over(wp)).withColumn(
        "next_click", F.min(click).over(wn)
    )
    back_us = F.expr("timestampdiff(MICROSECOND, prev_click, ts)")
    fwd_us = F.expr("timestampdiff(MICROSECOND, ts, next_click)")
    return (
        tagged.filter(
            (F.col("event_type") == "error")
            & (F.col("prev_click").isNotNull() | F.col("next_click").isNotNull())
        )
        .select(
            "user_id",
            F.col("ts").alias("error_ts"),
            F.when(F.col("next_click").isNull(), F.col("prev_click"))
            .when(F.col("prev_click").isNull(), F.col("next_click"))
            .when(back_us <= fwd_us, F.col("prev_click"))
            .otherwise(F.col("next_click"))
            .alias("nearest_click_ts"),
            F.least(
                F.coalesce(back_us, F.lit(9223372036854775807)),
                F.coalesce(fwd_us, F.lit(9223372036854775807)),
            )
            .cast("bigint")
            .alias("__gap_us"),
        )
        .select(
            "user_id",
            "error_ts",
            "nearest_click_ts",
            F.expr("__gap_us div 1000000").cast("bigint").alias("abs_gap_s"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling OLS regression slope inside a window frame (trend per group)
# ---------------------------------------------------------------------------

_RREG_DAYS = 7

#: OLS slope over the frame's (day, daily-cents) points, milli-cents
#: per day — pure integer arithmetic over frame sums, so the window
#: never touches floats. Day indexes are rebased to the table minimum,
#: keeping every cross-product term tiny at any epoch.
_RREG_SLOPE = (
    "CAST((n * sxy - sx * sy) * 1000 {d} (n * sxx - sx * sx) AS BIGINT)"
)


@register(
    "window_rolling_regression",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_idx,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ),
    rebased AS (
      SELECT event_type,
             day_idx - (SELECT min(day_idx) FROM daily) AS d,
             day_idx, cents
      FROM daily
    ),
    frames AS (
      SELECT event_type, day_idx,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(d) OVER w AS BIGINT) AS sx,
             CAST(sum(cents) OVER w AS BIGINT) AS sy,
             CAST(sum(d * cents) OVER w AS BIGINT) AS sxy,
             CAST(sum(d * d) OVER w AS BIGINT) AS sxx
      FROM rebased
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   RANGE BETWEEN {_RREG_DAYS - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day_idx, n AS n_days,
           {_RREG_SLOPE.format(d='//')} AS slope_milli
    FROM frames WHERE n >= 3 AND n * sxx - sx * sx > 0
    """,
    doc=(
        "Rolling ordinary-least-squares trend inside a real window "
        "frame: per event type, the revenue slope (milli-cents/day) "
        "over each trailing 7-day RANGE window, computed from five "
        "integer frame sums — the regression never leaves the window "
        "operator, so there is no self-join, no explode, and no float "
        "drift. The day axis is rebased to the table minimum so the "
        "cross products stay small at any epoch; frames with fewer "
        "than 3 days or zero x-variance are suppressed on both sides."
    ),
)
def window_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day OLS slope per event type from frame sums.

    Scale notes (100 TB): the fact collapses to |types| x |days| daily
    cells first; the frame windows run over that bounded table keyed
    per type. The same five-sum trick gives rolling slope over ANY
    grain — swap the partition and frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
        ).alias("day_idx"),
    ).agg(
        F.expr(
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
        ).alias("cents")
    )
    dmin = daily.agg(F.min("day_idx").alias("d0"))
    rebased = daily.crossJoin(F.broadcast(dmin)).select(
        "event_type",
        "day_idx",
        "cents",
        F.expr("day_idx - d0").alias("d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rangeBetween(-(_RREG_DAYS - 1), 0)
    )
    frames = rebased.select(
        "event_type",
        "day_idx",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("d").over(w).cast("bigint").alias("sx"),
        F.sum("cents").over(w).cast("bigint").alias("sy"),
        F.sum(F.expr("d * cents")).over(w).cast("bigint").alias("sxy"),
        F.sum(F.expr("d * d")).over(w).cast("bigint").alias("sxx"),
    )
    return frames.filter("n >= 3 AND n * sxx - sx * sx > 0").select(
        "event_type",
        "day_idx",
        F.col("n").alias("n_days"),
        F.expr(_RREG_SLOPE.format(d="div")).alias("slope_milli"),
    )


# ---------------------------------------------------------------------------
# k-nearest-neighbor join on a 1-D key (binned equi-join + exact fallback)
# ---------------------------------------------------------------------------

_KNN_K = 5
_KNN_WIDTH = 10_000  # cents (= 100 price units)
_KNN_PROBE_MOD = "o_orderkey % 1500 = 7"


@register(
    "join_knn_binned",
    f"""
    WITH probes AS (
      SELECT o_orderkey AS pid,
             CAST(round(o_totalprice * 100) AS BIGINT) AS pk
      FROM orders WHERE {_KNN_PROBE_MOD}
    ),
    r AS (
      SELECT o_orderkey AS rid,
             CAST(round(o_totalprice * 100) AS BIGINT) AS rk
      FROM orders
    )
    SELECT pid AS probe_id, rid AS neighbor_id, rank,
           dist AS dist_cents
    FROM (
      SELECT p.pid, r.rid,
             CAST(abs(p.pk - r.rk) AS BIGINT) AS dist,
             CAST(row_number() OVER (PARTITION BY p.pid
               ORDER BY abs(p.pk - r.rk), r.rid) AS BIGINT) AS rank
      FROM probes p JOIN r ON p.pid <> r.rid
    ) t WHERE rank <= {_KNN_K}
    ORDER BY probe_id, rank
    """,
    doc=(
        "Exact k-NN join on order value (k=5 nearest-priced orders "
        "per probe) — the k>1 generalization of the as-of/nearest "
        "join, rewritten from its theta form (BroadcastNestedLoopJoin) "
        "into a binned equi-join on price div width: home bucket +-1 "
        "provably contains every neighbor within one width, probes "
        "whose k-th close neighbor isn't guaranteed fall back to a "
        "broadcast brute pass (starved minority only), so the result "
        "is exact everywhere. The oracle is the plain quadratic "
        "definition."
    ),
)
def join_knn_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest join via bucketed candidates + exact starved fallback.

    Scale notes (100 TB): candidate generation shuffles on the price
    bucket (per-task work = bucket population, never corpus^2); the
    rank window is per-probe; only starved probes (sparse price
    regions) hit the broadcast brute pass — their share is the
    operator's published health signal. The oracle runs the quadratic
    definition over a modulus-sampled probe panel, which is what makes
    the exactness claim value-hash-checked rather than asserted."""
    from the_movies_db_spark.operators.joins import knn_join_1d

    o = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    probes = o.filter(F.expr(_KNN_PROBE_MOD)).select(
        F.col("o_orderkey").alias("pid"), cents.alias("pk")
    )
    corpus = o.select(F.col("o_orderkey").alias("rid"), cents.alias("rk"))
    out = knn_join_1d(
        probes, corpus, "pid", "pk", "rid", "rk",
        k=_KNN_K, width=_KNN_WIDTH,
    )
    return out.select(
        "probe_id", "neighbor_id", "rank",
        F.col("dist").alias("dist_cents"),
    ).orderBy("probe_id", "rank")


# ---------------------------------------------------------------------------
# LATERAL join (correlated per-row subquery — Spark 4 native surface)
# ---------------------------------------------------------------------------


@register(
    "join_lateral_topn",
    """
    SELECT n.n_name AS nation, l.o_orderkey, l.cents
    FROM nation n,
    LATERAL (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY cents DESC, o.o_orderkey LIMIT 2
    ) l
    ORDER BY nation, cents DESC, o_orderkey
    """,
    doc=(
        "Correlated LATERAL join — the per-row-subquery SQL surface "
        "Spark 4 supports natively: for every nation, a correlated "
        "ORDER BY ... LIMIT 2 subquery returns its two largest orders. "
        "The IDENTICAL SQL text runs on both engines (DuckDB LATERAL "
        "has the same semantics), so this pins Spark's "
        "DecorrelateInnerQuery rewrite of lateral limits end to end. "
        "The classic alternative spelling is the top-k window "
        "(window_topk_per_group) — this entry verifies the LATERAL "
        "spelling specifically."
    ),
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-n via a correlated LATERAL subquery.

    Scale notes (100 TB): Catalyst decorrelates the lateral limit into
    a ranked window over the join — the same physical shape as the
    window spelling, no per-row subquery execution; the lateral form
    is the SQL-surface contract being verified."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "_lat_nation"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_lat_orders"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "_lat_customer"
    )
    return spark.sql(
        """
        SELECT n.n_name AS nation, l.o_orderkey, l.cents
        FROM _lat_nation n,
        LATERAL (
          SELECT o.o_orderkey,
                 CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
          FROM _lat_orders o
          JOIN _lat_customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY cents DESC, o.o_orderkey LIMIT 2
        ) l
        ORDER BY nation, cents DESC, o_orderkey
        """
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4 |> operators)
# ---------------------------------------------------------------------------


@register(
    "fn_sql_pipe_syntax",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS cents
    FROM lineitem
    WHERE l_quantity < 25
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc=(
        "SQL pipe syntax (Spark 4's |> operator chain — FROM t |> WHERE "
        "|> AGGREGATE ... GROUP BY |> ORDER BY): the linear-dataflow "
        "spelling of the classic SELECT, executed through the exact "
        "same Catalyst plan. The oracle is the classic spelling, so "
        "driver equality pins that the pipe parser produces identical "
        "semantics — the surface a reference user migrating hand-built "
        "pipelines would reach for first."
    ),
)
def fn_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipe-syntax aggregate, classic-SQL oracle.

    Scale notes (100 TB): syntax only — the pipe chain lowers to the
    same pushed-filter + partial-agg plan as the classic spelling."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "_pipe_lineitem"
    )
    return spark.sql(
        """
        FROM _pipe_lineitem
        |> WHERE l_quantity < 25
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_items,
                     CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                          AS BIGINT) AS cents
           GROUP BY l_returnflag
        |> ORDER BY l_returnflag
        """
    )
