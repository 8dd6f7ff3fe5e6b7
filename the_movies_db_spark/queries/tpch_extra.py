"""Extended TPC-H-shape relational coverage (SURVEY §2.4–§2.8).

The driver's star schema is a reduced TPC-H (no ``partsupp``, no
commit/receipt dates, no ship modes), so each classic query is
adapted to the available columns while keeping its *operator shape* —
the point of this module is breadth of plan shapes, each verified
against the DuckDB oracle:

- Q4  → EXISTS (left-semi join with a compound, cross-table predicate)
- Q7  → two-sided dimension join with a disjunctive nation-pair filter
- Q8  → market share: conditional aggregation over a 6-table star join
- Q12 → conditional (CASE) aggregation after fact-fact join
- Q13 → left outer join → count → distribution of counts (agg of agg)
- Q14 → promo revenue: CASE-sum ratio over part join
- Q17 → correlated scalar subquery, decorrelated to an agg-join
- Q18 → HAVING on a fact rollup joined back to dims
- Q19 → disjunction of conjunctive predicates (OR-of-ANDs pushdown)
- Q21 → EXISTS + NOT EXISTS with inequality correlation (semi + anti)
- Q22 → scalar-subquery threshold + anti join
- pivot / unpivot and exact percentiles round out the agg surface.

Scale notes: every dim join broadcasts the dim side; semi/anti joins
keyed on ``l_orderkey`` shuffle the fact once and AQE coalesces; the
Q17/Q21 self-referential shapes avoid per-row subquery execution
entirely (they are windows / agg-joins, the decorrelated plan Spark
would otherwise have to synthesize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table
from the_movies_db_spark.queries import register


def _ppm_div(a: str, b: str, div: str) -> str:
    """floor(a * 1e6 / b) as exact BIGINT without overflow: quotient
    term + two-stage remainder divmod chain — every intermediate is
    bounded by b*1000, so the expression survives cents-scale sums
    whose *1e6 product exceeds int64 (the x16 probe caught exactly
    that in the Theil revenue share). Identical text both engines
    modulo the floor-division spelling."""
    return (
        f"((({a}) {div} ({b})) * 1000000"
        f" + ((({a}) % ({b})) * 1000 {div} ({b})) * 1000"
        f" + (((({a}) % ({b})) * 1000 % ({b})) * 1000 {div} ({b})))"
    )




def _t(df: DataFrame, column: str, value: str):
    return F.lit(value).cast(df.schema[column].dataType)


@register(
    "q04_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape: EXISTS with a cross-table inequality → left-semi "
        "join on the order key, then hash agg on priority."
    ),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = o.filter(
        (F.col("o_orderdate") >= _t(o, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _t(o, "o_orderdate", "1997-01-01"))
    )
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q07_volume_shipping",
    """
    SELECT supp_nation, cust_nation, yr, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             cast(year(l.l_shipdate) AS INT) AS yr,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) t
    GROUP BY supp_nation, cust_nation, yr
    """,
    doc=(
        "TPC-H Q7 shape: fact-fact join + four broadcast dims, disjunctive "
        "nation-pair predicate, agg by (nation pair, year)."
    ),
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q08_market_share",
    """
    SELECT yr,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT cast(year(o.o_orderdate) AS INT) AS yr,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS nation
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
    ) t
    GROUP BY yr
    """,
    doc=(
        "TPC-H Q8 shape: 7-table star join (all dims broadcast), national "
        "market share as a conditional-sum ratio per year."
    ),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rk"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_rk") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q12_priority_class",
    """
    SELECT cast(year(l_shipdate) AS INT) AS yr,
           cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY 1
    """,
    doc=(
        "TPC-H Q12 shape (ship modes → ship years): fact-fact join with "
        "pushed range filter, CASE-sum priority split."
    ),
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= _t(li, "l_shipdate", "1997-01-01"))
        & (F.col("l_shipdate") < _t(li, "l_shipdate", "1999-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.year("l_shipdate").cast("int").alias("yr"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
    doc=(
        "TPC-H Q13: left outer join → per-customer order count → "
        "distribution of counts (two-level aggregation)."
    ),
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    doc="TPC-H Q14: broadcast part join, CASE-sum percentage in one agg.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    li = li.filter(
        (F.col("l_shipdate") >= _t(li, "l_shipdate", "1997-03-01"))
        & (F.col("l_shipdate") < _t(li, "l_shipdate", "1997-04-01"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))
    return li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(F.lit(100.0) * F.sum(promo) / F.sum(vol), 4).alias("promo_revenue")
    )


@register(
    "q17_small_quantity",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    doc=(
        "TPC-H Q17: correlated scalar subquery decorrelated to a per-part "
        "avg join — no per-row subquery execution at any scale."
    ),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    part_avg = li.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("l_partkey") == F.col("avg_pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_orders",
    """
    SELECT c_name, c_custkey, o_orderkey,
           round(o_totalprice, 2) AS total_price, round(sum_qty, 2) AS sum_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    ) big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY total_price DESC, o_orderkey
    LIMIT 20
    """,
    doc=(
        "TPC-H Q18: fact rollup + HAVING, joined back to orders/customer, "
        "deterministic top-20 (TakeOrderedAndProject)."
    ),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sum_qty"))
        .filter(F.col("__sum_qty") > 150)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("__sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_filter",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    doc=(
        "TPC-H Q19: OR-of-ANDs across both join sides — Catalyst pushes "
        "the per-side residuals below the join."
    ),
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    clause = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return j.filter(
        clause("Brand#1", 15, 1, 21)
        | clause("Brand#2", 25, 10, 30)
        | clause("Brand#3", 35, 20, 40)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@register(
    "q21_latest_shipper",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
    doc=(
        "TPC-H Q21 shape: EXISTS (left-semi) + NOT EXISTS with inequality "
        "correlation (left-anti), counting the strictly-latest shipper in "
        "multi-supplier finished orders."
    ),
)
def q21_latest_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_ok"),
        F.col("l_suppkey").alias("l3_sk"),
        F.col("l_shipdate").alias("l3_sd"),
    )
    semi = l1.join(
        l2,
        (F.col("l2_ok") == F.col("l_orderkey")) & (F.col("l2_sk") != F.col("l_suppkey")),
        "left_semi",
    )
    anti = semi.join(
        l3,
        (F.col("l3_ok") == F.col("l_orderkey"))
        & (F.col("l3_sk") != F.col("l_suppkey"))
        & (F.col("l3_sd") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        anti.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_inactive_customers",
    """
    SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment
    """,
    doc=(
        "TPC-H Q22 shape: scalar-subquery threshold (broadcast single-row "
        "cross join) + NOT EXISTS anti join on recent orders."
    ),
)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    recent = o.filter(F.col("o_orderdate") >= _t(o, "o_orderdate", "1999-01-01"))
    threshold = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# pivot / unpivot / percentiles
# ---------------------------------------------------------------------------


@register(
    "pivot_returnflag",
    """
    SELECT l_linestatus,
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_A,
           round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_N,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_R
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc=(
        "PIVOT: wide conditional aggregation — Spark's groupBy().pivot() "
        "with explicit value list (one pass, no per-value scans)."
    ),
)
def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return piv.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


@register(
    "unpivot_measures",
    """
    WITH agg AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2)      AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price,
             round(sum(l_discount), 2)      AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, value FROM (
      SELECT l_returnflag, 'sum_qty'  AS measure, sum_qty  AS value FROM agg
      UNION ALL
      SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM agg
      UNION ALL
      SELECT l_returnflag, 'sum_disc' AS measure, sum_disc AS value FROM agg
    ) t
    """,
    doc="UNPIVOT (melt): wide aggregate → long (measure, value) rows.",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return agg.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "measure", "value"
    )


@register(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           round(median(l_extendedprice), 4)                 AS median_price,
           round(quantile_cont(l_extendedprice, 0.25), 4)    AS p25,
           round(quantile_cont(l_extendedprice, 0.75), 4)    AS p75,
           round(quantile_cont(l_extendedprice, 0.95), 4)    AS p95
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "Exact percentiles (median / p25 / p75 / p95) with linear "
        "interpolation — ONE grouped percentile(array(...)) aggregate: "
        "Spark's exact Percentile buffers the full per-group value "
        "multiset, so four separate calls build four such buffers and "
        "merge each across partitions; the array form computes all four "
        "ranks from a single buffer (measured 2.4x at sf0.1)."
    ),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile(
        "l_extendedprice",
        F.array(*[F.lit(x) for x in (0.5, 0.25, 0.75, 0.95)]),
    )
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("__p"))
        .select(
            "l_returnflag",
            F.round(F.col("__p")[0], 4).alias("median_price"),
            F.round(F.col("__p")[1], 4).alias("p25"),
            F.round(F.col("__p")[2], 4).alias("p75"),
            F.round(F.col("__p")[3], 4).alias("p95"),
        )
    )


@register(
    "q09_profit_by_nation",
    """
    SELECT nation, yr, round(sum(amount_cents) / 100.0, 2) AS profit
    FROM (
      SELECT n.n_name AS nation,
             cast(year(o.o_orderdate) AS INT) AS yr,
             CAST(round((l.l_extendedprice * (1 - l.l_discount)
                   - p.p_retailprice * l.l_quantity * 0.1) * 100) AS BIGINT)
               AS amount_cents
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) t
    GROUP BY nation, yr
    """,
    doc=(
        "TPC-H Q9 shape (supply cost → 10% of retail price, no partsupp "
        "in the test schema): profit per supplier-nation per year over a "
        "5-table star join with a LIKE filter on part name."
    ),
)
def q09_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    # exact integer-cents accumulation: profit terms cancel, so a double
    # sum is order-sensitive at the final cent — integers are not
    amount_cents = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
        )
        * 100,
        0,
    ).cast("bigint")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(F.round(F.sum(amount_cents) / 100.0, 2).alias("profit"))
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc=(
        "TPC-H Q15: revenue 'view' (CTE agg) + scalar-subquery max filter "
        "(broadcast single-row join) — the classic view-then-argmax shape."
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= _t(li, "l_shipdate", "1998-01-01"))
            & (F.col("l_shipdate") < _t(li, "l_shipdate", "1998-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        s.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_count",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc=(
        "TPC-H Q16 shape (negative-balance suppliers standing in for the "
        "complaints filter): NOT IN anti join + distinct-count rollup over "
        "part attributes."
    ),
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_promo_volume_suppliers",
    """
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO'
        AND l.l_shipdate >= TIMESTAMP '1998-01-01'
        AND l.l_shipdate <  TIMESTAMP '1999-01-01'
      GROUP BY l.l_suppkey
      HAVING sum(l.l_quantity) > 100
    )
    """,
    doc=(
        "TPC-H Q20 shape: nested IN over an aggregated-with-HAVING "
        "subquery → left-semi join against a derived table; dim join for "
        "the nation name."
    ),
)
def q20_promo_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= _t(li, "l_shipdate", "1998-01-01"))
            & (F.col("l_shipdate") < _t(li, "l_shipdate", "1999-01-01"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 100)
    )
    return (
        s.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
    )


@register(
    "q02_min_cost_supplier",
    """
    WITH offer AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(CAST(round(l_extendedprice * 100) AS BIGINT)
                 // CAST(l_quantity AS BIGINT)) AS unit_cents
      FROM lineitem
      GROUP BY 1, 2
    ),
    eu AS (
      SELECT o.partkey, o.suppkey, o.unit_cents
      FROM offer o
      JOIN supplier s ON o.suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    best AS (
      SELECT *, min(unit_cents) OVER (PARTITION BY partkey) AS best_cents
      FROM eu
    )
    SELECT round(s.s_acctbal, 2) AS s_acctbal, s.s_name, n.n_name AS nation,
           p.p_partkey, p.p_type,
           best_cents / 100.0 AS min_unit_cost
    FROM best b
    JOIN supplier s ON b.suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN part p     ON b.partkey = p.p_partkey
    WHERE b.unit_cents = b.best_cents AND p.p_size = 15
    """,
    doc=(
        "TPC-H Q2 shape adapted to the reduced schema (no partsupp — the "
        "offer table is derived as min unit price per (part, supplier) "
        "from lineitem, in integer cents so the min and the equality "
        "predicate are engine-exact): min-cost-per-part via a window over "
        "the region-filtered offers, suppliers achieving the min joined "
        "back to dims. Dim joins broadcast; the window partitions by "
        "partkey — same key as the offer aggregate, so AQE reuses the "
        "exchange."
    ),
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    unit_cents = F.expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) DIV CAST(l_quantity AS BIGINT)"
    )
    offer = (
        li.select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            unit_cents.alias("__uc"),
        )
        .groupBy("partkey", "suppkey")
        .agg(F.min("__uc").alias("unit_cents"))
    )
    eu_supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
    )
    eu = offer.join(
        eu_supp.select(F.col("s_suppkey").alias("suppkey")), "suppkey", "left_semi"
    )
    w = Window.partitionBy("partkey")
    best = eu.withColumn("best_cents", F.min("unit_cents").over(w)).filter(
        F.col("unit_cents") == F.col("best_cents")
    )
    return (
        best.join(s, best.suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(p.filter(F.col("p_size") == 15), best.partkey == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_type",
            (F.col("best_cents") / F.lit(100.0)).alias("min_unit_cost"),
        )
    )


@register(
    "q11_important_parts",
    """
    WITH de AS (
      SELECT l.l_partkey AS partkey,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS value_cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY 1
    ),
    t AS (SELECT sum(value_cents) AS total, count(*) AS np FROM de)
    SELECT partkey, value_cents / 100.0 AS part_value
    FROM de, t
    WHERE value_cents * np > 2 * total
    """,
    doc=(
        "TPC-H Q11 shape (important stock) adapted to the reduced schema: "
        "per-part shipped value from one nation's suppliers, kept where "
        "the part's share exceeds 2x the average share — an SF-invariant "
        "threshold (TPC-H's fixed fraction degenerates as part count "
        "grows). Value accumulates in integer cents and the predicate is "
        "the integer comparison value*n_parts > 2*total — no float "
        "ratio, engine-exact. The global total is a broadcast scalar; "
        "the per-part aggregate shuffles once on partkey."
    ),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    de_supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_7")
        .select("s_suppkey")
    )
    de = (
        li.join(F.broadcast(de_supp), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .select(
            F.col("l_partkey").alias("partkey"),
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("__cents"),
        )
        .groupBy("partkey")
        .agg(F.sum("__cents").alias("value_cents"))
    )
    total = de.agg(
        F.sum("value_cents").alias("__total"), F.count(F.lit(1)).alias("__np")
    )
    return (
        de.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * F.col("__np") > 2 * F.col("__total"))
        .select("partkey", (F.col("value_cents") / F.lit(100.0)).alias("part_value"))
    )


@register(
    "orders_open_backlog",
    """
    WITH iv AS (
      SELECT o.o_orderkey,
             date_diff('day', DATE '1995-01-01', o.o_orderdate) AS sd,
             max(date_diff('day', DATE '1995-01-01', l.l_shipdate)) AS ed
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    ev AS (
      SELECT sd AS day, 1 AS delta, 1 AS op, 0 AS cl FROM iv
      UNION ALL SELECT ed + 1, -1, 0, 0 FROM iv
      UNION ALL SELECT ed, 0, 0, 1 FROM iv
    ),
    agg AS (
      SELECT day, sum(delta) AS d, sum(op) AS n_opened, sum(cl) AS n_closed
      FROM ev GROUP BY day
    )
    SELECT CAST(day AS BIGINT)      AS day_idx,
           CAST(n_opened AS BIGINT) AS n_opened,
           CAST(n_closed AS BIGINT) AS n_closed,
           CAST(sum(d) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT)          AS open_orders
    FROM agg
    """,
    doc=(
        "Sweep-line interval concurrency: how many orders are OPEN "
        "(placed, not yet fully shipped) on each active day — +1/-1 "
        "boundary deltas aggregated per day, then one running sum over "
        "the bounded day domain. The classic alternative (join every "
        "day against every order interval) is O(days x orders); this "
        "is O(orders) + a window over |days| rows."
    ),
)
def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent open-order count per day via boundary deltas.

    Scale notes (100 TB): per-order interval extraction is one join +
    groupBy(orderkey); the delta stream aggregates map-side to at most
    |day-domain| rows, so the final running sum — though a global
    window — runs over a few thousand rows regardless of order volume.
    That bounded-domain collapse is what makes sweep-line the right
    shape for interval concurrency at any scale.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)").alias(
            "sd"
        ),
    )
    e = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.expr(
                "CAST(max(datediff(l_shipdate, DATE '1995-01-01')) AS BIGINT)"
            ).alias("ed")
        )
    )
    iv = o.join(e, o.o_orderkey == e.l_orderkey).select("sd", "ed")
    ev = (
        iv.select(F.col("sd").alias("day"), F.lit(1).alias("delta"),
                  F.lit(1).alias("op"), F.lit(0).alias("cl"))
        .unionAll(
            iv.select((F.col("ed") + 1).alias("day"), F.lit(-1).alias("delta"),
                      F.lit(0).alias("op"), F.lit(0).alias("cl"))
        )
        .unionAll(
            iv.select(F.col("ed").alias("day"), F.lit(0).alias("delta"),
                      F.lit(0).alias("op"), F.lit(1).alias("cl"))
        )
    )
    agg = ev.groupBy("day").agg(
        F.sum("delta").alias("d"),
        F.sum("op").cast("bigint").alias("n_opened"),
        F.sum("cl").cast("bigint").alias("n_closed"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return agg.select(
        F.col("day").cast("bigint").alias("day_idx"),
        "n_opened",
        "n_closed",
        F.sum("d").over(w).cast("bigint").alias("open_orders"),
    )


@register(
    "orders_rfm_segments",
    """
    WITH base AS (
      SELECT o_custkey AS custkey,
             CAST(max(datediff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate))
                  AS BIGINT) AS last_day,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), p AS (
      SELECT (SELECT max(last_day) FROM base) AS gday,
             (SELECT count(*) FROM base)      AS n
    ), ranked AS (
      SELECT custkey, p.gday - last_day AS r_days, freq, cents, p.n,
             row_number() OVER (ORDER BY p.gday - last_day, custkey) AS rr,
             row_number() OVER (ORDER BY freq, custkey)              AS rf,
             row_number() OVER (ORDER BY cents, custkey)             AS rm
      FROM base, p
    )
    SELECT concat('R', CAST((rr - 1) * 4 // n + 1 AS VARCHAR),
                  'F', CAST((rf - 1) * 4 // n + 1 AS VARCHAR),
                  'M', CAST((rm - 1) * 4 // n + 1 AS VARCHAR)) AS segment,
           CAST(count(*) AS BIGINT)           AS n_customers,
           CAST(sum(cents) AS BIGINT)         AS total_cents,
           CAST(sum(r_days) // count(*) AS BIGINT) AS avg_recency_days,
           CAST(sum(freq) AS BIGINT)          AS total_orders
    FROM ranked
    GROUP BY segment
    """,
    doc=(
        "RFM customer segmentation (recency/frequency/monetary "
        "quartiles): each metric's global rank is assembled by the "
        "two-level bucket-offset rewrite (operators/ranks.py) — NEVER "
        "a single-partition ORDER BY window — and the quartile is the "
        "integer formula (rank-1)*4 div n + 1 mirrored exactly in the "
        "oracle, so segment boundaries are engine-stable."
    ),
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile-coded RFM segments with distributed global ranks.

    Scale notes (100 TB): the per-customer rollup is one shuffle on
    custkey; each of the three ranks is a per-bucket window plus a
    64-row broadcast offset join (operators/ranks.py:global_row_number)
    — the same values a global ORDER BY window would give, fully
    parallel. The (min,max)/count collects are metadata-scale plan
    parameters (the dedup_semantic precedent), identical integer
    formulas on the oracle side via scalar subqueries."""
    from the_movies_db_spark.operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(
            F.expr(
                "datediff(o_orderdate, TIMESTAMP '1970-01-01 00:00:00')"
            )
        )
        .cast("bigint")
        .alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("cents"),
    )
    # ONE agg job yields every plan parameter (global max day, corpus
    # count, and each metric's min/max for the rank bucketing) — three
    # separate collects would recompute base's lineage three times.
    p = base.agg(
        F.max("last_day").alias("gday"),
        F.count(F.lit(1)).alias("n"),
        F.min("last_day").alias("mn_day"),
        F.min("freq").alias("mn_f"),
        F.max("freq").alias("mx_f"),
        F.min("cents").alias("mn_c"),
        F.max("cents").alias("mx_c"),
    ).first()
    gday, n = int(p["gday"]), int(p["n"])
    # ONE lazy checkpoint of the rollup kills every fact re-scan (the
    # three ranks' offsets branches otherwise re-executed the orders
    # scan 8x total); the per-rank window re-executions then run over
    # the in-memory RDD — cheaper than three chained checkpoints
    base = base.withColumn(
        "r_days", F.lit(gday) - F.col("last_day")
    ).localCheckpoint(eager=False)
    ranked = global_row_number(
        base, "r_days", ["custkey"], out="rr",
        bounds=(0, gday - int(p["mn_day"])),
    )
    ranked = global_row_number(
        ranked, "freq", ["custkey"], out="rf",
        bounds=(int(p["mn_f"]), int(p["mx_f"])),
    )
    ranked = global_row_number(
        ranked, "cents", ["custkey"], out="rm",
        bounds=(int(p["mn_c"]), int(p["mx_c"])),
    )
    seg = F.concat(
        F.lit("R"), F.expr(f"CAST((rr - 1) * 4 div {n} + 1 AS STRING)"),
        F.lit("F"), F.expr(f"CAST((rf - 1) * 4 div {n} + 1 AS STRING)"),
        F.lit("M"), F.expr(f"CAST((rm - 1) * 4 div {n} + 1 AS STRING)"),
    )
    return (
        ranked.withColumn("segment", seg)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.expr("sum(r_days) div count(*)").cast("bigint").alias("avg_recency_days"),
            F.sum("freq").cast("bigint").alias("total_orders"),
        )
    )


@register(
    "orders_cohort_ltv",
    """
    WITH firsts AS (
      SELECT o_custkey,
             min(year(o_orderdate) * 12 + month(o_orderdate)) AS cohort_m
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(f.cohort_m AS BIGINT) AS cohort_month,
           CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - f.cohort_m
                AS BIGINT) AS months_since,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
    """,
    doc=(
        "Customer-cohort LTV triangle: acquisition month x months-"
        "since-acquisition -> active customers, orders, revenue cents "
        "— the retention-revenue matrix every growth dashboard draws. "
        "Month arithmetic is pure integers (year*12+month), identical "
        "in both engines for midnight-aligned dates."
    ),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-cohort revenue triangle.

    Scale notes (100 TB): firsts is one shuffle on custkey; the fact
    join is co-partitioned on the same key (AQE reuses the exchange);
    the output is |cohort months| x |offsets| — bounded by the square
    of the data's month span, independent of row count."""
    o = load_table(spark, sf_dir, "orders")
    m = F.expr("year(o_orderdate) * 12 + month(o_orderdate)")
    firsts = o.groupBy("o_custkey").agg(F.min(m).alias("cohort_m"))
    return (
        o.join(firsts, "o_custkey")
        .groupBy(
            F.col("cohort_m").cast("bigint").alias("cohort_month"),
            (m - F.col("cohort_m")).cast("bigint").alias("months_since"),
        )
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


@register(
    "orders_abc_analysis",
    """
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(cents) OVER () AS tot
      FROM rev
    )
    SELECT CASE WHEN (cum - cents) * 100 < tot * 80 THEN 'A'
                WHEN (cum - cents) * 100 < tot * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(count(*) AS BIGINT)   AS n_parts,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM ranked
    GROUP BY 1
    """,
    doc=(
        "ABC / Pareto analysis: parts classified by cumulative revenue "
        "share (A holds the first 80%, B to 95%, C the tail). The "
        "class test uses the PRIOR cumulative (cum - own) ALL-INTEGER "
        "cross-multiplied ((cum-c)*100 < tot*80) — no percentage "
        "doubles, no boundary flips. The cumulative is DISTRIBUTED "
        "(operators/ranks.py:global_cumsum — per-bucket running sums "
        "over the NEGATED cents key + 64-row broadcast prior-bucket "
        "offsets; the grand total rides the same broadcast), so no "
        "part-grain single-partition window survives in the plan."
    ),
)
def orders_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto revenue classification over part-level rollups.

    Scale notes (100 TB): one partkey rollup shuffle; the descending
    cumulative revenue comes from global_cumsum on ``-cents`` (integer
    ascending = cents DESC; BIGINT-exact sums commute across the
    bucket rewrite), with the (min, max) bounds batched into one
    1-row collect — the same shape orders_pareto_gini pins in
    tests/test_plans.py."""
    from the_movies_db_spark.operators.ranks import global_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("cents")
    )
    keyed = rev.withColumn("__ord", (-F.col("cents")).cast("bigint"))
    b = keyed.agg(
        F.min("__ord").alias("mn"), F.max("__ord").alias("mx")
    ).collect()[0]
    ranked = global_cumsum(
        keyed, "__ord", ["l_partkey"], "cents", out="cum",
        bounds=(int(b["mn"]), int(b["mx"])), total_out="tot",
        materialize=True,
    )
    cls = (
        F.when((F.col("cum") - F.col("cents")) * 100 < F.col("tot") * 80, "A")
        .when((F.col("cum") - F.col("cents")) * 100 < F.col("tot") * 95, "B")
        .otherwise("C")
    )
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )


@register(
    "orders_seasonality_index",
    """
    WITH m AS (
      SELECT month(o_orderdate) AS mon,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT CAST(mon AS BIGINT) AS mon, n_orders, cents,
           CAST(cents * 12000 // sum(cents) OVER () AS BIGINT)
             AS seasonality_milli
    FROM m
    """,
    doc=(
        "Monthly seasonality index: each calendar month's revenue vs "
        "the uniform 1/12 baseline, in exact milli (1000 = exactly "
        "average; cents*12000 div total). One bounded aggregate + a "
        "12-row window — the retail demand-planning staple."
    ),
)
def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month revenue index against the uniform baseline."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.month("o_orderdate").alias("mon")).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return m.select(
        F.col("mon").cast("bigint").alias("mon"),
        "n_orders",
        "cents",
        F.expr("cents * 12000 div sum(cents) OVER ()")
        .cast("bigint")
        .alias("seasonality_milli"),
    )


@register(
    "orders_pareto_gini",
    """
    WITH rev AS (
      SELECT o_custkey AS custkey,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
               AS dollars
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT dollars,
             row_number() OVER (ORDER BY dollars, custkey) AS rnk
      FROM rev
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT)           AS n,
             CAST(sum(dollars) AS BIGINT)       AS s,
             CAST(sum(rnk * dollars) AS BIGINT) AS s1
      FROM ranked
    ), st0 AS (
      SELECT n, s, CAST(2 * s1 - (n + 1) * s AS BIGINT) AS r0,
             CAST(n * s AS BIGINT) AS den
      FROM agg
    ),
    st1 AS (SELECT n, s, den, r0 * 10 // den AS q1, r0 * 10 % den AS r1 FROM st0),
    st2 AS (SELECT *, r1 * 10 // den AS q2, r1 * 10 % den AS r2 FROM st1),
    st3 AS (SELECT *, r2 * 10 // den AS q3, r2 * 10 % den AS r3 FROM st2),
    st4 AS (SELECT *, r3 * 10 // den AS q4, r3 * 10 % den AS r4 FROM st3),
    st5 AS (SELECT *, r4 * 10 // den AS q5, r4 * 10 % den AS r5 FROM st4),
    st6 AS (SELECT *, r5 * 10 // den AS q6 FROM st5)
    SELECT n AS n_customers,
           s AS total_dollars,
           CAST(q1 * 100000 + q2 * 10000 + q3 * 1000 + q4 * 100
                + q5 * 10 + q6 AS BIGINT) AS gini_ppm
    FROM st6
    """,
    doc=(
        "Exact Gini concentration of customer revenue in ppm — the "
        "whale-dependence audit. Whole-dollar revenue (cent precision "
        "adds nothing to a ppm ratio and its n*S denominator overflows "
        "BIGINT at 16x sf0.1 — caught by the x16 probe), ascending "
        "global rank from the two-level bucket rewrite (never a "
        "single-partition sort), and the 2*sum(i*x_i) formula scaled "
        "to ppm through SIX chained *10 divmod stages — linear CTE "
        "chain, exact while 10*n*S fits BIGINT."
    ),
)
def orders_pareto_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-ppm Gini coefficient over per-customer revenue.

    Scale notes (100 TB): one custkey rollup shuffle; the ascending
    rank is operators/ranks.py:global_row_number (per-bucket window +
    64-row broadcast offsets); the Gini reduces to three BIGINT sums.
    gini_ppm = (2*S1 - (n+1)*S) * 1e6 / (n*S) evaluated as six *10
    divmod stages over chained selects (each stage multiplies a
    remainder < n*S by only 10), exact while 10*n*S fits BIGINT —
    dollars keep that true through ~1e17 total revenue x customers;
    beyond, move the sums to DECIMAL(38)."""
    from the_movies_db_spark.operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.expr("CAST(round(o_totalprice) AS BIGINT)"))
        .cast("bigint")
        .alias("dollars")
    )
    b = rev.agg(
        F.min("dollars").alias("mn"), F.max("dollars").alias("mx")
    ).collect()[0]
    ranked = global_row_number(
        rev, "dollars", ["custkey"], out="rnk",
        bounds=(int(b["mn"]), int(b["mx"])), materialize=True,
    )
    cur = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dollars").cast("bigint").alias("s"),
        F.sum(F.col("rnk") * F.col("dollars")).cast("bigint").alias("s1"),
    ).select(
        "n", "s",
        F.expr("CAST(2 * s1 - (n + 1) * s AS BIGINT)").alias("r0"),
        F.expr("CAST(n * s AS BIGINT)").alias("den"),
    )
    for i in range(1, 7):
        prev = f"r{i - 1}"
        cur = cur.select(
            "*",
            F.expr(f"{prev} * 10 div den").alias(f"q{i}"),
            F.expr(f"{prev} * 10 % den").alias(f"r{i}"),
        )
    return cur.select(
        F.col("n").alias("n_customers"),
        F.col("s").alias("total_dollars"),
        F.expr(
            "CAST(q1 * 100000 + q2 * 10000 + q3 * 1000 + q4 * 100"
            " + q5 * 10 + q6 AS BIGINT)"
        ).alias("gini_ppm"),
    )


@register(
    "orders_segment_migration",
    """
    WITH days AS (
      SELECT (SELECT min(datediff('day', TIMESTAMP '1970-01-01 00:00:00',
                                  o_orderdate)) FROM orders) AS mn,
             (SELECT max(datediff('day', TIMESTAMP '1970-01-01 00:00:00',
                                  o_orderdate)) FROM orders) AS mx
    ), rev AS (
      SELECT o_custkey AS custkey,
             CASE WHEN datediff('day', TIMESTAMP '1970-01-01 00:00:00',
                                o_orderdate)
                       < (SELECT (mn + mx + 1) // 2 FROM days)
                  THEN 1 ELSE 2 END AS half,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2
    ), ranked AS (
      SELECT custkey, half, cents,
             row_number() OVER (PARTITION BY half
                                ORDER BY cents, custkey) AS rnk,
             count(*) OVER (PARTITION BY half) AS n_h
      FROM rev
    ), seg AS (
      SELECT custkey, half,
             CAST((rnk - 1) * 3 // n_h + 1 AS BIGINT) AS seg
      FROM ranked
    )
    SELECT coalesce(a.seg, 0) AS seg_h1,
           coalesce(b.seg, 0) AS seg_h2,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(min(coalesce(a.custkey, b.custkey)) AS BIGINT)
             AS sample_custkey
    FROM (SELECT custkey, seg FROM seg WHERE half = 1) a
    FULL OUTER JOIN (SELECT custkey, seg FROM seg WHERE half = 2) b
      ON a.custkey = b.custkey
    GROUP BY 1, 2
    """,
    doc=(
        "Customer value-segment migration matrix: revenue terciles in "
        "the first vs second half of the order-date range (halves and "
        "tercile boundaries from identical integer formulas on both "
        "engines; rank-based terciles so buckets are exactly "
        "equal-sized), with 0 = absent that half. The churn/upgrade "
        "flow behind every retention dashboard."
    ),
)
def orders_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tercile-migration matrix across the two halves of the date range.

    Scale notes (100 TB): one rollup shuffle on (custkey, half); each
    half's ascending rank is the two-level bucket rewrite (per-bucket
    windows + broadcast offsets) — no single-partition sort; the
    matrix join is per-customer (co-partitioned on custkey) and the
    output is at most 4x4 rows. Plan parameters (date bounds, per-half
    cents bounds) are two bounded agg collects mirrored as scalar
    subqueries in the oracle."""
    from the_movies_db_spark.operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders").withColumn(
        "__day",
        F.expr(
            "datediff(o_orderdate, TIMESTAMP '1970-01-01 00:00:00')"
        ).cast("bigint"),
    )
    d = o.agg(F.min("__day").alias("mn"), F.max("__day").alias("mx")).collect()[0]
    mid = (int(d["mn"]) + int(d["mx"]) + 1) // 2
    rev = (
        o.withColumn("half", F.when(F.col("__day") < mid, 1).otherwise(2))
        .groupBy(F.col("o_custkey").alias("custkey"), "half")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    bounds = {
        int(r["half"]): (int(r["mn"]), int(r["mx"]), int(r["n"]))
        for r in rev.groupBy("half")
        .agg(
            F.min("cents").alias("mn"),
            F.max("cents").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }

    def seg_half(h: int) -> DataFrame:
        mn, mx, n_h = bounds[h]
        ranked = global_row_number(
            rev.filter(F.col("half") == h), "cents", ["custkey"],
            out="rnk", bounds=(mn, mx),
        )
        return ranked.select(
            "custkey",
            F.expr(f"CAST((rnk - 1) * 3 div {n_h} + 1 AS BIGINT)").alias(
                f"seg_h{h}"
            ),
        )

    a, b = seg_half(1), seg_half(2)
    return (
        a.join(b, "custkey", "full_outer")
        .groupBy(
            F.coalesce("seg_h1", F.lit(0)).cast("bigint").alias("seg_h1"),
            F.coalesce("seg_h2", F.lit(0)).cast("bigint").alias("seg_h2"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.min("custkey").cast("bigint").alias("sample_custkey"),
        )
    )


@register(
    "orders_decile_lift",
    """
    WITH cust AS (
      SELECT o_custkey AS custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS score_cents,
             max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS is_pos
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT custkey, score_cents, is_pos,
             row_number() OVER (ORDER BY score_cents DESC, custkey) AS rnk,
             count(*) OVER () AS n
      FROM cust
    ), dec AS (
      SELECT CAST((rnk - 1) * 10 // n + 1 AS BIGINT) AS decile,
             is_pos
      FROM ranked
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(is_pos) AS BIGINT) AS pos_all
      FROM dec
    )
    SELECT decile,
           CAST(count(*) AS BIGINT)      AS n_customers,
           CAST(sum(is_pos) AS BIGINT)   AS n_positives,
           CAST(sum(is_pos) * 1000000 // count(*) AS BIGINT) AS rate_ppm,
           CAST(sum(is_pos) * t.n_all * 1000 // (count(*) * t.pos_all)
                AS BIGINT) AS lift_milli
    FROM dec CROSS JOIN tot t
    GROUP BY decile, t.n_all, t.pos_all
    """,
    doc=(
        "Decile lift table — the standard propensity-model evaluation: "
        "customers ranked by a score (here monetary value), cut into "
        "exact-equal deciles by the rank formula, each decile's "
        "positive rate (bought URGENT) compared to base rate as exact "
        "integer lift_milli. Rank comes from the two-level distributed "
        "rewrite, deciles from (rank-1)*10 div n — engine-stable cuts."
    ),
)
def orders_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-decile lift/capture table with distributed ranking.

    Scale notes (100 TB): one custkey rollup; the descending global
    rank is global_row_number on the NEGATED score (per-bucket window
    + broadcast offsets); the lift math is a 10-row aggregate join
    against one global total row."""
    from the_movies_db_spark.operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("score_cents"),
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("is_pos"),
    ).withColumn("neg_score", -F.col("score_cents"))
    stats = cust.agg(
        F.min("neg_score").alias("mn"),
        F.max("neg_score").alias("mx"),
        F.count(F.lit(1)).alias("n"),
        F.sum("is_pos").alias("pos"),
    ).collect()[0]
    n_all, pos_all = int(stats["n"]), int(stats["pos"])
    ranked = global_row_number(
        cust, "neg_score", ["custkey"], out="rnk",
        bounds=(int(stats["mn"]), int(stats["mx"])),
    )
    dec = ranked.select(
        F.expr(f"CAST((rnk - 1) * 10 div {n_all} + 1 AS BIGINT)").alias(
            "decile"
        ),
        "is_pos",
    )
    return dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("is_pos").cast("bigint").alias("n_positives"),
        F.expr("sum(is_pos) * 1000000 div count(*)")
        .cast("bigint")
        .alias("rate_ppm"),
        F.expr(
            f"sum(is_pos) * {n_all}L * 1000 div (count(*) * {pos_all}L)"
        )
        .cast("bigint")
        .alias("lift_milli"),
    )


@register(
    "orders_supplier_herfindahl",
    """
    WITH rev AS (
      SELECT n.n_name AS nation, l.l_suppkey AS suppkey,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT nation, CAST(sum(cents) AS BIGINT) AS tot_cents,
             CAST(count(*) AS BIGINT) AS n_suppliers
      FROM rev GROUP BY nation
    )
    SELECT r.nation,
           min(t.n_suppliers)                AS n_suppliers,
           min(t.tot_cents)                  AS revenue_cents,
           CAST(sum( (r.cents * 1000000 // t.tot_cents)
                   * (r.cents * 1000000 // t.tot_cents) ) // 1000000
                AS BIGINT)                   AS hhi_micro
    FROM rev r JOIN tot t ON r.nation = t.nation
    GROUP BY r.nation
    """,
    doc=(
        "Herfindahl-Hirschman supplier-concentration index per nation "
        "— the antitrust / supply-risk audit (10000-point scale would "
        "be hhi_micro/100): each supplier's revenue share in exact "
        "ppm (integer div of cents), HHI = sum of squared shares "
        "scaled back to micro. A monopoly nation scores 1e6; perfectly "
        "split N ways scores ~1e6/N."
    ),
)
def orders_supplier_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration (HHI) per nation, exact integers.

    Scale notes (100 TB): one fact shuffle to (nation, suppkey) —
    supplier and nation dims are broadcast; the share normalization
    joins a |nations|-row broadcast total back, so no second fact
    scan and no window over the fact. Shares in ppm via integer div;
    sum of squares <= 1e12 before the final micro rescale — BIGINT
    safe for any supplier count."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    na = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    rev = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    tot = rev.groupBy("nation").agg(
        F.sum("cents").cast("bigint").alias("tot_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
    )
    return (
        rev.join(F.broadcast(tot), "nation")
        .groupBy("nation")
        .agg(
            F.min("n_suppliers").alias("n_suppliers"),
            F.min("tot_cents").alias("revenue_cents"),
            F.sum(
                F.expr(
                    "(cents * 1000000 div tot_cents)"
                    " * (cents * 1000000 div tot_cents)"
                )
            )
            .cast("bigint")
            .alias("__sq"),
        )
        .select(
            "nation",
            "n_suppliers",
            "revenue_cents",
            F.expr("__sq div 1000000").cast("bigint").alias("hhi_micro"),
        )
    )


@register(
    "orders_cohort_survival",
    """
    WITH cust AS (
      SELECT o_custkey,
             min(year(o_orderdate) * 12 + month(o_orderdate)) AS m0,
             max(year(o_orderdate) * 12 + month(o_orderdate)) AS m1
      FROM orders GROUP BY o_custkey
    ), mx AS (SELECT max(m1) AS m FROM cust),
    subj AS (
      SELECT CAST(c.m1 - c.m0 AS BIGINT) AS t,
             CASE WHEN c.m1 >= x.m - 2 THEN 1 ELSE 0 END AS cens
      FROM cust c CROSS JOIN mx x
    ), cnt AS (
      SELECT t,
             CAST(count(*) FILTER (WHERE cens = 0) AS BIGINT) AS d,
             CAST(count(*) FILTER (WHERE cens = 1) AS BIGINT) AS c
      FROM subj GROUP BY t
    ), risk AS (
      SELECT t, d,
             CAST((SELECT count(*) FROM subj)
                  - coalesce(sum(d + c) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n
      FROM cnt
    ), ev AS (SELECT t, d, n FROM risk WHERE d > 0),
    arr AS (
      SELECT list(struct_pack(t := t, d := d, n := n) ORDER BY t) AS a
      FROM ev
    ), idx AS (
      SELECT a, unnest(range(1, len(a) + 1)) AS i FROM arr
    )
    SELECT CAST(a[i].t AS BIGINT) AS t_months,
           CAST(a[i].n AS BIGINT) AS n_risk,
           CAST(a[i].d AS BIGINT) AS d_events,
           CAST(floor(exp(list_aggregate(list_transform(a[1:i],
                  x -> ln(1.0 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))),
                  'sum')) * 1000000) AS BIGINT) AS surv_micro
    FROM idx
    """,
    doc=(
        "Kaplan-Meier customer survival: lifetime = months between "
        "first and last order, right-censored for customers still "
        "active in the final 3 months; S(t) = prod(1 - d_i/n_i) over "
        "event times — the churn curve a retention team actually "
        "publishes (censoring is what plain retention tables get "
        "wrong). S is computed as exp(sum(ln(1 - d/n))) with the SAME "
        "sequential fold over the SAME month-sorted array on both "
        "engines, so surv_micro is engine-exact floor-micro."
    ),
)
def orders_cohort_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-censored KM estimator over customer lifetimes.

    Scale notes (100 TB): one custkey rollup shuffle; everything after
    is a |months|-bounded table (windows over <= ~100 rows), one
    collect_list into a bounded sorted array, and an O(|months|^2)
    prefix fold inside a single projection. The global max month is a
    1-row broadcast crossJoin, not a second fact scan."""
    o = load_table(spark, sf_dir, "orders")
    m = F.expr("year(o_orderdate) * 12 + month(o_orderdate)")
    cust = o.groupBy("o_custkey").agg(
        F.min(m).alias("m0"), F.max(m).alias("m1")
    )
    mx = cust.agg(F.max("m1").alias("m"))
    subj = cust.crossJoin(F.broadcast(mx)).select(
        (F.col("m1") - F.col("m0")).cast("bigint").alias("t"),
        F.expr("CASE WHEN m1 >= m - 2 THEN 1 ELSE 0 END").alias("cens"),
    )
    cnt = subj.groupBy("t").agg(
        F.count_if(F.col("cens") == 0).cast("bigint").alias("d"),
        F.count_if(F.col("cens") == 1).cast("bigint").alias("c"),
    )
    tot = subj.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        cnt.crossJoin(F.broadcast(tot))
        .withColumn(
            "n",
            (
                F.col("nn")
                - F.coalesce(F.sum(F.expr("d + c")).over(w), F.lit(0))
            ).cast("bigint"),
        )
        .filter(F.col("d") > 0)
        .select("t", "d", "n")
    )
    arr = risk.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("t").alias("t"),
                    F.col("d").alias("d"),
                    F.col("n").alias("n"),
                )
            )
        ).alias("a")
    )
    idx = arr.select(
        "a", F.posexplode(F.expr("sequence(1, size(a))")).alias("__p", "i")
    )
    return idx.select(
        F.expr("a[i - 1].t").cast("bigint").alias("t_months"),
        F.expr("a[i - 1].n").cast("bigint").alias("n_risk"),
        F.expr("a[i - 1].d").cast("bigint").alias("d_events"),
        F.expr(
            "CAST(floor(exp(aggregate(slice(a, 1, i),"
            " CAST(0 AS DOUBLE),"
            " (acc, x) -> acc + ln(1.0 - CAST(x.d AS DOUBLE)"
            " / CAST(x.n AS DOUBLE)))) * 1000000) AS BIGINT)"
        ).alias("surv_micro"),
    )


# ---------------------------------------------------------------------------
# Log-log price elasticity of demand per brand (OLS over monthly points)
# ---------------------------------------------------------------------------

_ELAST_X = "CAST(floor(ln(CAST(price_c AS DOUBLE)) * 1000) AS BIGINT)"
_ELAST_Y = "CAST(floor(ln(CAST(qty AS DOUBLE)) * 1000) AS BIGINT)"


@register(
    "orders_price_elasticity",
    f"""
    WITH pts AS (
      SELECT p.p_brand AS brand, strftime(o.o_orderdate, '%Y-%m') AS mon,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    xy AS (
      SELECT brand,
             {_ELAST_X.replace('price_c', '(cents // qty)')} AS x,
             {_ELAST_Y} AS y
      FROM pts
    ),
    s AS (
      SELECT brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM xy GROUP BY 1
    )
    SELECT brand, n AS n_months,
           CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
                AS BIGINT) AS elasticity_micro
    FROM s
    WHERE n * sxx - sx * sx <> 0
    ORDER BY brand
    """,
    doc=(
        "Price elasticity of demand: per brand, OLS slope of "
        "ln(monthly quantity) on ln(monthly avg unit price) — the "
        "log-log regression whose slope IS the elasticity estimate a "
        "pricing team reads. Points are (brand, month) aggregates "
        "(integer cents / integer quantity), ln values floored to "
        "milli BEFORE the OLS sums, so every moment is exact BIGINT "
        "and the closed-form slope is an exact integer division; "
        "bounded by months^2 * milli^2 — scale-independent of row "
        "count (the Welch-t lesson)."
    ),
)
def orders_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log OLS elasticity per brand over monthly demand points.

    Scale notes (100 TB): the fact scan reduces to |brands| x |months|
    points in one hash aggregation (the join to orders is the usual
    orderkey equi-join; part is broadcast); all OLS moments are a
    second tiny aggregation over those points. No windows, no
    corpus-grain state — the plan is two hash aggregates regardless of
    fact size."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    pts = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_format("o_orderdate", "yyyy-MM").alias("mon"),
        )
        .agg(
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents"),
            F.sum(F.expr("CAST(l_quantity AS BIGINT)"))
            .cast("bigint")
            .alias("qty"),
        )
    )
    xy = pts.select(
        "brand",
        F.expr(_ELAST_X.replace("price_c", "(cents div qty)")).alias("x"),
        F.expr(_ELAST_Y).alias("y"),
    )
    s = xy.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x * x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("x * y")).cast("bigint").alias("sxy"),
    )
    return (
        s.filter(F.expr("n * sxx - sx * sx != 0"))
        .select(
            "brand",
            F.col("n").alias("n_months"),
            F.expr(
                "CAST((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)"
                " AS BIGINT)"
            ).alias("elasticity_micro"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# Difference-in-differences: promo-part revenue uplift
# ---------------------------------------------------------------------------

_DID_CUT = "1998-01-01"
_DID_CENTS = (
    "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
)


@register(
    "orders_promo_did",
    f"""
    WITH x AS (
      SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS treat,
             CASE WHEN o.o_orderdate >= TIMESTAMP '{_DID_CUT} 00:00:00'
                  THEN 1 ELSE 0 END AS post,
             {_DID_CENTS} AS cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
    ),
    g AS (
      SELECT treat, post, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM x GROUP BY 1, 2
    ),
    w AS (
      SELECT
        CAST(max(CASE WHEN treat = 1 AND post = 0 THEN s * 1000 // n END)
             AS BIGINT) AS tr_before_milli,
        CAST(max(CASE WHEN treat = 1 AND post = 1 THEN s * 1000 // n END)
             AS BIGINT) AS tr_after_milli,
        CAST(max(CASE WHEN treat = 0 AND post = 0 THEN s * 1000 // n END)
             AS BIGINT) AS ct_before_milli,
        CAST(max(CASE WHEN treat = 0 AND post = 1 THEN s * 1000 // n END)
             AS BIGINT) AS ct_after_milli,
        CAST(sum(n) AS BIGINT) AS n_total
      FROM g
    )
    SELECT tr_before_milli, tr_after_milli, ct_before_milli, ct_after_milli,
           n_total,
           CAST((tr_after_milli - tr_before_milli)
              - (ct_after_milli - ct_before_milli) AS BIGINT) AS did_milli
    FROM w
    """,
    doc=(
        "Difference-in-differences: promo-part revenue per line item, "
        "treatment (PROMO parts) vs control, before/after a fixed "
        "cutoff — the causal-inference shape behind every 'did the "
        "promotion work' question, where the control group's drift "
        "nets out the seasonal trend a naive before/after would "
        "swallow. Means in exact milli-cents (integer-cents sums, one "
        "truncated division per cell), DiD as their exact difference."
    ),
)
def orders_promo_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 DiD table + estimate from one conditional aggregation.

    Scale notes (100 TB): one pass — the fact joins orders on the
    orderkey equi-join and broadcasts part, reduces to a 4-cell
    aggregate; the pivot runs on those 4 rows. No windows, no
    re-scans."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    x = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0).alias("treat"),
            F.when(
                F.col("o_orderdate") >= F.lit(f"{_DID_CUT} 00:00:00").cast("timestamp"),
                1,
            )
            .otherwise(0)
            .alias("post"),
            F.expr(_DID_CENTS).alias("cents"),
        )
    )
    g = x.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    cell = "max(CASE WHEN treat = {t} AND post = {p} THEN s * 1000 div n END)"
    w = g.agg(
        F.expr(f"CAST({cell.format(t=1, p=0)} AS BIGINT)").alias("tr_before_milli"),
        F.expr(f"CAST({cell.format(t=1, p=1)} AS BIGINT)").alias("tr_after_milli"),
        F.expr(f"CAST({cell.format(t=0, p=0)} AS BIGINT)").alias("ct_before_milli"),
        F.expr(f"CAST({cell.format(t=0, p=1)} AS BIGINT)").alias("ct_after_milli"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    return w.select(
        "tr_before_milli",
        "tr_after_milli",
        "ct_before_milli",
        "ct_after_milli",
        "n_total",
        F.expr(
            "CAST((tr_after_milli - tr_before_milli)"
            " - (ct_after_milli - ct_before_milli) AS BIGINT)"
        ).alias("did_milli"),
    )


# ---------------------------------------------------------------------------
# Fulfillment lag: exact bounded-domain quantiles from a value histogram
# ---------------------------------------------------------------------------


@register(
    "orders_fulfillment_lag",
    """
    WITH lag AS (
      SELECT n.n_name AS nation,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
               AS lag_days
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
    ),
    hist AS (
      SELECT nation, lag_days, CAST(count(*) AS BIGINT) AS c
      FROM lag GROUP BY 1, 2
    ),
    cum AS (
      SELECT nation, lag_days, c,
             CAST(sum(c) OVER (PARTITION BY nation ORDER BY lag_days)
                  AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY nation) AS BIGINT) AS n
      FROM hist
    )
    SELECT nation,
           CAST(max(n) AS BIGINT) AS n_lineitems,
           CAST(sum(lag_days * c) * 1000 // max(n) AS BIGINT)
             AS mean_lag_milli,
           CAST(min(CASE WHEN cum * 2 >= n THEN lag_days END) AS BIGINT)
             AS p50_lag_days,
           CAST(min(CASE WHEN cum * 10 >= n * 9 THEN lag_days END) AS BIGINT)
             AS p90_lag_days,
           CAST(sum(CASE WHEN lag_days < 0 THEN c ELSE 0 END) AS BIGINT)
             AS n_negative
    FROM cum GROUP BY nation
    """,
    doc=(
        "Order-to-ship fulfillment lag per supplier nation: mean in "
        "exact milli-days plus EXACT p50/p90 — not approximations — "
        "computed from the value-domain histogram (lag in whole days "
        "is a bounded integer domain, so the cumulative window runs "
        "over |nations|x|days| histogram rows, never over lineitems; "
        "the ceil-free order-stat predicate cum*k >= n*q is pure "
        "integer). Negative lags (ship before order) are surfaced as "
        "the data-quality counter instead of being silently folded in."
    ),
)
def orders_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact histogram-based lag quantiles per nation.

    Scale notes (100 TB): one fact-fact equi-join on orderkey (the
    necessary shuffle), dims broadcast; then ONE hash aggregation to
    the (nation, lag_day) histogram — everything after is histogram
    grain. This is the scalable exact-quantile pattern for bounded
    integer measures: no global sort, no positional windows over the
    fact, and it beats approx_percentile by being exact at the same
    cost profile."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    lag = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias(
                "lag_days"
            ),
        )
    )
    hist = lag.groupBy("nation", "lag_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = Window.partitionBy("nation").orderBy("lag_days")
    wall = Window.partitionBy("nation")
    cum = hist.select(
        "nation",
        "lag_days",
        "c",
        F.sum("c").over(wcum).cast("bigint").alias("cum"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    return cum.groupBy("nation").agg(
        F.max("n").cast("bigint").alias("n_lineitems"),
        F.expr("CAST(sum(lag_days * c) * 1000 div max(n) AS BIGINT)").alias(
            "mean_lag_milli"
        ),
        F.min(F.when(F.expr("cum * 2 >= n"), F.col("lag_days")))
        .cast("bigint")
        .alias("p50_lag_days"),
        F.min(F.when(F.expr("cum * 10 >= n * 9"), F.col("lag_days")))
        .cast("bigint")
        .alias("p90_lag_days"),
        F.sum(F.when(F.col("lag_days") < 0, F.col("c")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_negative"),
    )


# ---------------------------------------------------------------------------
# Reorder cadence: per-segment exact gap quantiles via the same
# bounded-domain histogram machinery as orders_fulfillment_lag
# ---------------------------------------------------------------------------


@register(
    "orders_reorder_interval",
    """
    WITH seq AS (
      SELECT c.c_mktsegment AS segment,
             CAST(date_diff('day',
                  lag(o.o_orderdate) OVER (PARTITION BY o.o_custkey
                                           ORDER BY o.o_orderdate,
                                                    o.o_orderkey),
                  o.o_orderdate) AS BIGINT) AS gap_days
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    hist AS (
      SELECT segment, gap_days, CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE gap_days IS NOT NULL
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT segment, gap_days, c,
             CAST(sum(c) OVER (PARTITION BY segment ORDER BY gap_days)
                  AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY segment) AS BIGINT) AS n
      FROM hist
    )
    SELECT segment,
           CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(sum(gap_days * c) * 1000 // max(n) AS BIGINT)
             AS mean_gap_milli,
           CAST(min(CASE WHEN cum * 4 >= n THEN gap_days END) AS BIGINT)
             AS p25_gap_days,
           CAST(min(CASE WHEN cum * 2 >= n THEN gap_days END) AS BIGINT)
             AS p50_gap_days,
           CAST(min(CASE WHEN cum * 4 >= n * 3 THEN gap_days END) AS BIGINT)
             AS p75_gap_days
    FROM cum GROUP BY segment
    """,
    doc=(
        "Customer reorder cadence per market segment: consecutive "
        "order gaps from a per-customer lag window, then EXACT "
        "p25/p50/p75 from the (segment, gap_day) value-domain "
        "histogram — the bounded-domain exact-quantile pattern again "
        "(windows run over histogram rows, never orders; order-stat "
        "predicates cum*k >= n*q are pure integer). The replenishment "
        "statistic behind inventory and churn-risk models."
    ),
)
def orders_reorder_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact reorder-gap quantiles per market segment.

    Scale notes (100 TB): one shuffle on custkey for the lag window
    (per-customer state = one previous row), the dim broadcast, ONE
    hash aggregation to the bounded histogram; everything after is
    histogram grain."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(
                "o_orderdate", F.lag("o_orderdate").over(w)
            )
            .cast("bigint")
            .alias("gap_days"),
        )
    )
    hist = (
        seq.filter(F.col("gap_days").isNotNull())
        .groupBy("segment", "gap_days")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wcum = Window.partitionBy("segment").orderBy("gap_days")
    wall = Window.partitionBy("segment")
    cum = hist.select(
        "segment",
        "gap_days",
        "c",
        F.sum("c").over(wcum).cast("bigint").alias("cum"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    return cum.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        F.expr("CAST(sum(gap_days * c) * 1000 div max(n) AS BIGINT)").alias(
            "mean_gap_milli"
        ),
        F.min(F.when(F.expr("cum * 4 >= n"), F.col("gap_days")))
        .cast("bigint")
        .alias("p25_gap_days"),
        F.min(F.when(F.expr("cum * 2 >= n"), F.col("gap_days")))
        .cast("bigint")
        .alias("p50_gap_days"),
        F.min(F.when(F.expr("cum * 4 >= n * 3"), F.col("gap_days")))
        .cast("bigint")
        .alias("p75_gap_days"),
    )


# ---------------------------------------------------------------------------
# Laspeyres price index: base-quantity-weighted monthly price level
# ---------------------------------------------------------------------------


@register(
    "orders_price_index_laspeyres",
    f"""
    WITH monthly AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS ym, l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    base AS (
      SELECT l_partkey, qty AS w, cents AS base_cents, qty AS base_qty
      FROM monthly WHERE ym = (SELECT min(ym) FROM monthly)
    ),
    matched AS (
      SELECT m.ym,
             b.w * m.cents // m.qty  AS num_part,
             b.w * b.base_cents // b.base_qty AS den_part
      FROM monthly m JOIN base b ON m.l_partkey = b.l_partkey
      WHERE m.qty > 0
    )
    SELECT ym,
           CAST(count(*) AS BIGINT) AS n_parts_matched,
           CAST({_ppm_div("sum(num_part)", "sum(den_part)", "//")} AS BIGINT)
             AS index_ppm
    FROM matched GROUP BY ym
    """,
    doc=(
        "Laspeyres price index by ship month: base-month quantities "
        "weight each part's current average unit price, so the index "
        "tracks pure price movement on a fixed basket. Every per-part "
        "contribution is an exact integer (w * cents div qty — the "
        "weighted unit price in base-quantity units), so the "
        "distributed sums are order-free and the ppm index "
        "hash-matches. The pricing-analytics classic that separates "
        "price effects from mix effects (the elasticity query's "
        "complement)."
    ),
)
def orders_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-basket monthly price index in exact ppm.

    Scale notes (100 TB): one hash aggregation to (month, part) grain
    — everything after runs on the bounded aggregate, which is lazily
    checkpointed because BOTH the base-month extraction and the
    per-month join consume it (two branches would otherwise re-scan
    the fact). The base basket is broadcast back; output |months|
    rows."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = (
        li.groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("ym"),
            "l_partkey",
        )
        .agg(
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
        )
        .localCheckpoint(eager=False)
    )
    base_ym = monthly.agg(F.min("ym").alias("__b"))
    base = (
        monthly.join(F.broadcast(base_ym), monthly.ym == F.col("__b"))
        .select(
            F.col("l_partkey").alias("bp"),
            F.col("qty").alias("w"),
            F.col("cents").alias("base_cents"),
            F.col("qty").alias("base_qty"),
        )
    )
    matched = (
        monthly.filter(F.col("qty") > 0)
        .join(F.broadcast(base), monthly.l_partkey == F.col("bp"))
        .select(
            "ym",
            F.expr("w * cents div qty").alias("num_part"),
            F.expr("w * base_cents div base_qty").alias("den_part"),
        )
    )
    return matched.groupBy("ym").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts_matched"),
        F.expr(
            f"CAST({_ppm_div('sum(num_part)', 'sum(den_part)', 'div')}"
            " AS BIGINT)"
        ).alias("index_ppm"),
    )


# ---------------------------------------------------------------------------
# Theil index decomposition: within/between-nation revenue inequality
# ---------------------------------------------------------------------------

#: per-customer Theil term (x/mu)ln(x/mu) with r built as deterministic
#: doubles from exact integers (x*n can overflow BIGINT at scale; the
#: correctly-rounded double product is the same in both engines),
#: floored to micro BEFORE the distributed sum.
_THEIL_TERM = (
    "CAST(floor((CAST(cents AS DOUBLE) * CAST({n} AS DOUBLE)"
    " / CAST({s} AS DOUBLE))"
    " * ln(CAST(cents AS DOUBLE) * CAST({n} AS DOUBLE)"
    " / CAST({s} AS DOUBLE)) * 1000000) AS BIGINT)"
)

_THEIL_BETWEEN = (
    "CAST(floor((CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))"
    " * ln(CAST(sg AS DOUBLE) * CAST(n AS DOUBLE)"
    " / (CAST(s AS DOUBLE) * CAST(ng AS DOUBLE))) * 1000000) AS BIGINT)"
)


@register(
    "agg_theil_index",
    f"""
    WITH cust AS (
      SELECT n.n_name AS nation, o.o_custkey,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    g AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(cents) AS BIGINT) AS sg
      FROM cust GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s
      FROM g
    ),
    terms AS (
      SELECT c.nation,
             {_THEIL_TERM.format(n="g.ng", s="g.sg")} AS within_term
      FROM cust c JOIN g ON c.nation = g.nation
    )
    SELECT g.nation,
           g.ng AS n_customers,
           CAST({_ppm_div("g.ng", "t.n", "//")} AS BIGINT) AS cust_share_ppm,
           CAST({_ppm_div("g.sg", "t.s", "//")} AS BIGINT) AS revenue_share_ppm,
           CAST(w.sum_term // g.ng AS BIGINT)    AS theil_within_micro,
           {_THEIL_BETWEEN} AS between_term_micro
    FROM g
    CROSS JOIN tot t
    JOIN (SELECT nation, CAST(sum(within_term) AS BIGINT) AS sum_term
          FROM terms GROUP BY 1) w ON g.nation = w.nation
    """,
    doc=(
        "Theil-T inequality decomposition of customer revenue by "
        "nation: each nation's internal Theil index (how concentrated "
        "revenue is among its customers) plus its between-nations "
        "term — unlike Gini, Theil decomposes exactly into "
        "within + between, which is why inequality audits of "
        "hierarchical populations use it. Per-customer terms are "
        "floored to micro before the distributed sum; ratios that "
        "could overflow BIGINT at scale are built as "
        "correctly-rounded doubles from exact integers."
    ),
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within/between Theil terms per nation, engine-exact micro.

    Scale notes (100 TB): one shuffle to customer grain, one ln per
    CUSTOMER (projection — no window over the fact), then
    nation-bounded aggregates; the customer frame is lazily
    checkpointed because both the nation stats and the term projection
    consume it."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "o_custkey")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint(eager=False)
    )
    g = cust.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("cents").cast("bigint").alias("sg"),
    )
    tot = g.agg(
        F.sum("ng").cast("bigint").alias("n"), F.sum("sg").cast("bigint").alias("s")
    )
    terms = cust.join(
        F.broadcast(g.select(F.col("nation"), F.col("ng"), F.col("sg"))),
        "nation",
    ).select(
        "nation",
        F.expr(_THEIL_TERM.format(n="ng", s="sg")).alias("within_term"),
    )
    w = terms.groupBy("nation").agg(
        F.sum("within_term").cast("bigint").alias("sum_term")
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .join(w, "nation")
        .select(
            "nation",
            F.col("ng").alias("n_customers"),
            F.expr(
                f"CAST({_ppm_div('ng', 'n', 'div')} AS BIGINT)"
            ).alias("cust_share_ppm"),
            F.expr(
                f"CAST({_ppm_div('sg', 's', 'div')} AS BIGINT)"
            ).alias("revenue_share_ppm"),
            F.expr("CAST(sum_term div ng AS BIGINT)").alias(
                "theil_within_micro"
            ),
            F.expr(_THEIL_BETWEEN).alias("between_term_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Growth reporting: month-over-month and year-over-year revenue deltas
# ---------------------------------------------------------------------------


@register(
    "orders_growth_yoy",
    f"""
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT ym, cents, n_orders,
             lag(cents, 1)  OVER (ORDER BY ym) AS prev_m,
             lag(cents, 12) OVER (ORDER BY ym) AS prev_y
      FROM m
    )
    SELECT ym, n_orders, cents,
           CAST(CASE WHEN prev_m IS NULL THEN NULL
                ELSE {{d}} END AS BIGINT) AS mom_ppm,
           CAST(CASE WHEN prev_y IS NULL THEN NULL
                ELSE {{y}} END AS BIGINT) AS yoy_ppm
    FROM lagged
    """.format(
        d=_ppm_div("cents - prev_m", "prev_m", "//"),
        y=_ppm_div("cents - prev_y", "prev_y", "//"),
    ),
    doc=(
        "Month-over-month and year-over-year revenue growth in exact "
        "ppm (the overflow-free divmod chain — cents-scale sums again) "
        "— the reporting backbone every finance dashboard opens with, "
        "with lag(1) and lag(12) over the bounded month list. First "
        "month / first year rows carry NULL rather than a fake zero."
    ),
)
def orders_growth_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MoM / YoY growth over the month-bounded revenue series.

    Scale notes (100 TB): one hash aggregation to |months| rows; the
    lags are a window over that bounded list. Negative growth divides
    a negative numerator by a positive base — truncation toward zero
    is identical in both engines (documented invariant)."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym")).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    w = Window.orderBy("ym")
    lagged = m.select(
        "ym",
        "cents",
        "n_orders",
        F.lag("cents", 1).over(w).alias("prev_m"),
        F.lag("cents", 12).over(w).alias("prev_y"),
    )
    return lagged.select(
        "ym",
        "n_orders",
        "cents",
        F.expr(
            "CAST(CASE WHEN prev_m IS NULL THEN NULL ELSE "
            + _ppm_div("cents - prev_m", "prev_m", "div")
            + " END AS BIGINT)"
        ).alias("mom_ppm"),
        F.expr(
            "CAST(CASE WHEN prev_y IS NULL THEN NULL ELSE "
            + _ppm_div("cents - prev_y", "prev_y", "div")
            + " END AS BIGINT)"
        ).alias("yoy_ppm"),
    )


# ---------------------------------------------------------------------------
# Concentration ratio: revenue share of the top-10 customers
# ---------------------------------------------------------------------------

_CR_TOP = 10


@register(
    "orders_customer_concentration",
    f"""
    WITH cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS s FROM cust),
    top AS (
      SELECT o_custkey, cents,
             row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk
      FROM cust
    )
    SELECT CAST(rk AS BIGINT) AS rank,
           CAST(o_custkey AS BIGINT) AS custkey,
           cents,
           CAST({{share}} AS BIGINT) AS share_ppm,
           CAST({{cum}} AS BIGINT) AS cum_share_ppm
    FROM (
      SELECT rk, o_custkey, cents, t.s,
             CAST(sum(cents) OVER (ORDER BY rk) AS BIGINT) AS cum_cents
      FROM top CROSS JOIN tot t WHERE rk <= {_CR_TOP}
    ) x
    """.format(
        share=_ppm_div("cents", "s", "//"),
        cum=_ppm_div("cum_cents", "s", "//"),
    ),
    doc=(
        "Customer concentration ratio: the top-10 customers by exact "
        "revenue cents with individual and cumulative shares in "
        "overflow-free ppm — the CR-k revenue-risk statistic "
        "(complementing HHI's squared-share view and Gini's full-curve "
        "view). A CR-10 above a few percent of total is key-account "
        "dependency; a trend in it is churn exposure."
    ),
)
def orders_customer_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customer revenue shares, exact ppm.

    Scale notes (100 TB): one hash aggregation to customer grain
    (checkpointed for its two consumers), total as a 1-row reduce, the
    top-10 via orderBy+limit -> TakeOrderedAndProject (distributed
    partial top-k), and the cumulative window runs over 10 rows."""
    o = load_table(spark, sf_dir, "orders")
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint(eager=False)
    )
    tot = cust.agg(F.sum("cents").cast("bigint").alias("s"))
    top = cust.orderBy(F.desc("cents"), F.asc("o_custkey")).limit(_CR_TOP)
    w = Window.orderBy(F.desc("cents"), F.asc("o_custkey"))
    ranked = (
        top.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(tot))
        .withColumn("cum_cents", F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("bigint"))
    )
    return ranked.select(
        F.col("rk").cast("bigint").alias("rank"),
        F.col("o_custkey").cast("bigint").alias("custkey"),
        "cents",
        F.expr(f"CAST({_ppm_div('cents', 's', 'div')} AS BIGINT)").alias(
            "share_ppm"
        ),
        F.expr(f"CAST({_ppm_div('cum_cents', 's', 'div')} AS BIGINT)").alias(
            "cum_share_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend of monthly national revenue
# ---------------------------------------------------------------------------

#: exact truncating micro-slope of a (month, cents) pair — divmod chain
#: so no intermediate exceeds |diff| * 1e6 / dm stage bounds.
_TS_SLOPE = (
    "(((c2 - c1) {div} (m2 - m1)) * 1000000"
    " + (((c2 - c1) % (m2 - m1)) * 1000000) {div} (m2 - m1))"
)


@register(
    "orders_theilsen_trend",
    f"""
    WITH m AS (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                  AS BIGINT) AS m_idx,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    p AS (
      SELECT a.nation, a.m_idx AS m1, b.m_idx AS m2,
             a.cents AS c1, b.cents AS c2
      FROM m a JOIN m b ON a.nation = b.nation AND b.m_idx > a.m_idx
    ),
    s AS (
      SELECT nation, {_TS_SLOPE.format(div="//")} AS slope_micro, m1, m2
      FROM p
    ),
    r AS (
      SELECT nation, slope_micro,
             row_number() OVER (PARTITION BY nation
                                ORDER BY slope_micro, m1, m2) AS rn,
             count(*) OVER (PARTITION BY nation) AS n_pairs
      FROM s
    )
    SELECT nation,
           CAST((SELECT count(*) FROM m mm WHERE mm.nation = r.nation)
                AS BIGINT) AS n_months,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(slope_micro AS BIGINT) AS slope_med_micro
    FROM r WHERE rn = (n_pairs + 1) // 2
    """,
    doc=(
        "Theil-Sen robust trend of monthly revenue per nation: the "
        "median of all pairwise month-to-month slopes — immune to the "
        "outlier months that wreck an OLS fit. Slopes are exact "
        "truncating integer micro-cents/month via a divmod chain; the "
        "median is the lower order statistic over the nation-bounded "
        "pair set (|months|^2 per nation, ~300 rows)."
    ),
)
def orders_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median pairwise slope per nation (Theil-Sen estimator).

    Scale notes (100 TB): the fact reduces to a nation x month
    aggregate (bounded: 25 x |months|) which is lazily checkpointed so
    the pair self-join does not re-execute the corpus scan per branch;
    every subsequent op is pair-grain (<= 25 * C(|months|,2) rows).
    The rank window is nation-keyed — no global sort."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    m = (
        o.join(F.broadcast(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)),
               o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.expr(
                "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
            ).alias("m_idx"),
        )
        .agg(
            F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)")
            .alias("cents")
        )
        .localCheckpoint(eager=False)
    )
    a = m.select(
        "nation",
        F.col("m_idx").alias("m1"),
        F.col("cents").alias("c1"),
    )
    b = m.select(
        F.col("nation").alias("nation_b"),
        F.col("m_idx").alias("m2"),
        F.col("cents").alias("c2"),
    )
    p = a.join(b, (a.nation == b.nation_b) & (F.col("m2") > F.col("m1")))
    s = p.select(
        "nation",
        F.expr(_TS_SLOPE.format(div="div")).alias("slope_micro"),
        "m1",
        "m2",
    )
    wn = Window.partitionBy("nation")
    r = s.select(
        "nation",
        "slope_micro",
        F.row_number()
        .over(wn.orderBy("slope_micro", "m1", "m2"))
        .alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_pairs"),
    )
    months = m.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months")
    )
    return (
        r.filter(F.expr("rn = (n_pairs + 1) div 2"))
        .join(F.broadcast(months), "nation")
        .select(
            "nation",
            "n_months",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.col("slope_micro").cast("bigint").alias("slope_med_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier time-to-reorder survival with right-censoring
# ---------------------------------------------------------------------------

_KM_HORIZONS = (30, 90, 180, 365)
#: per-event-day log survival factor, floored to micro IMMEDIATELY so
#: the cross-day accumulation is order-free integer addition (the same
#: per-distinct-value floor(ln)*1e6 discipline as the entropy queries).
_KM_LNF = (
    "CAST(floor(ln(CAST(n_risk - d_n AS DOUBLE) / CAST(n_risk AS DOUBLE))"
    " * 1000000) AS BIGINT)"
)


@register(
    "orders_survival_km",
    f"""
    WITH ord AS (
      SELECT o_custkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    cust AS (
      SELECT o_custkey,
             max(CASE WHEN rn = 1 THEN o_orderdate END) AS dfirst,
             max(CASE WHEN rn = 2 THEN o_orderdate END) AS dsecond
      FROM ord WHERE rn <= 2 GROUP BY 1
    ),
    mx AS (SELECT max(o_orderdate) AS dmax FROM orders),
    tt AS (
      SELECT CASE WHEN dsecond IS NOT NULL
                  THEN date_diff('day', dfirst, dsecond)
                  ELSE date_diff('day', dfirst, dmax) END AS day,
             CASE WHEN dsecond IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM cust CROSS JOIN mx
    ),
    days AS (
      SELECT day, CAST(sum(ev) AS BIGINT) AS d_n,
             CAST(count(*) - sum(ev) AS BIGINT) AS c_n
      FROM tt GROUP BY 1
    ),
    rsk AS (
      SELECT day, d_n, c_n,
             CAST(sum(d_n + c_n) OVER ()
                  - coalesce(sum(d_n + c_n) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM days
    ),
    f AS (
      SELECT day, d_n, c_n, n_risk,
             CASE WHEN d_n > 0 AND d_n < n_risk THEN {_KM_LNF}
                  ELSE CAST(0 AS BIGINT) END AS lnf_micro,
             CASE WHEN d_n > 0 AND d_n >= n_risk THEN 1 ELSE 0 END
               AS absorbed
      FROM rsk
    ),
    h(horizon_days) AS (VALUES (30), (90), (180), (365))
    SELECT CAST(h.horizon_days AS BIGINT) AS horizon_days,
           CAST(coalesce(sum(CASE WHEN day <= horizon_days THEN d_n END), 0)
                AS BIGINT) AS n_reordered,
           CAST(coalesce(sum(CASE WHEN day <= horizon_days THEN c_n END), 0)
                AS BIGINT) AS n_censored,
           CASE WHEN coalesce(max(CASE WHEN day <= horizon_days
                                       THEN absorbed END), 0) = 1
                THEN NULL
                ELSE CAST(coalesce(sum(CASE WHEN day <= horizon_days
                                            THEN lnf_micro END), 0)
                          AS BIGINT) END AS km_logsurv_micro
    FROM h CROSS JOIN f
    GROUP BY 1
    """,
    doc=(
        "Kaplan-Meier survival of time-to-second-order with "
        "right-censoring at the corpus horizon: per-day risk sets from "
        "a cumulative window over the DAY DOMAIN (bounded, never "
        "customer-grain), per-event-day log factors floored to micro "
        "immediately so accumulation is order-free BIGINT addition, "
        "and log-survival read out at 30/90/180/365-day horizons. The "
        "censoring-aware retention curve that naive 'reordered within "
        "N days' rates get wrong for recent cohorts."
    ),
)
def orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM log-survival at fixed horizons, censoring-aware.

    Scale notes (100 TB): one user-keyed rank window (the sessionize
    shuffle shape) reduces orders to one row per customer; the max
    order date is a separate single-column scan (column-pruned, cheap)
    broadcast back; everything after the day-grain aggregate runs over
    the bounded lag-day domain (~|days| rows)."""
    o = load_table(spark, sf_dir, "orders")
    ordw = o.select(
        "o_custkey",
        "o_orderdate",
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("rn"),
    )
    cust = (
        ordw.filter(F.col("rn") <= 2)
        .groupBy("o_custkey")
        .agg(
            F.max(F.expr("CASE WHEN rn = 1 THEN o_orderdate END")).alias("dfirst"),
            F.max(F.expr("CASE WHEN rn = 2 THEN o_orderdate END")).alias("dsecond"),
        )
    )
    mx = load_table(spark, sf_dir, "orders").agg(
        F.max("o_orderdate").alias("dmax")
    )
    tt = cust.join(F.broadcast(mx)).select(
        F.expr(
            "CASE WHEN dsecond IS NOT NULL THEN datediff(dsecond, dfirst)"
            " ELSE datediff(dmax, dfirst) END"
        ).alias("day"),
        F.expr("CASE WHEN dsecond IS NOT NULL THEN 1 ELSE 0 END").alias("ev"),
    )
    days = tt.groupBy("day").agg(
        F.sum("ev").cast("bigint").alias("d_n"),
        F.expr("CAST(count(*) - sum(ev) AS BIGINT)").alias("c_n"),
    )
    w_all = Window.partitionBy(F.lit(1))
    w_cum = (
        Window.partitionBy(F.lit(1))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rsk = days.select(
        "day",
        "d_n",
        "c_n",
        (
            F.sum(F.expr("d_n + c_n")).over(w_all)
            - F.coalesce(F.sum(F.expr("d_n + c_n")).over(w_cum), F.lit(0))
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    f = rsk.select(
        "day",
        "d_n",
        "c_n",
        F.expr(
            f"CASE WHEN d_n > 0 AND d_n < n_risk THEN {_KM_LNF}"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("lnf_micro"),
        F.expr(
            "CASE WHEN d_n > 0 AND d_n >= n_risk THEN 1 ELSE 0 END"
        ).alias("absorbed"),
    )
    h = spark.createDataFrame(
        [(x,) for x in _KM_HORIZONS], "horizon_days int"
    )
    return (
        F.broadcast(h)
        .crossJoin(f)
        .groupBy(F.col("horizon_days").cast("bigint").alias("horizon_days"))
        .agg(
            F.expr(
                "CAST(coalesce(sum(CASE WHEN day <= horizon_days THEN d_n END), 0)"
                " AS BIGINT)"
            ).alias("n_reordered"),
            F.expr(
                "CAST(coalesce(sum(CASE WHEN day <= horizon_days THEN c_n END), 0)"
                " AS BIGINT)"
            ).alias("n_censored"),
            F.expr(
                "CASE WHEN coalesce(max(CASE WHEN day <= horizon_days"
                " THEN absorbed END), 0) = 1 THEN NULL"
                " ELSE CAST(coalesce(sum(CASE WHEN day <= horizon_days"
                " THEN lnf_micro END), 0) AS BIGINT) END"
            ).alias("km_logsurv_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Croston intermittent-demand forecast (panel parts)
# ---------------------------------------------------------------------------

_CROSTON_PARTS = 20  # panel: p_partkey < 20


@register(
    "orders_croston_intermittent",
    f"""
    WITH RECURSIVE dem AS (
      SELECT l_partkey AS g,
             datediff('day', TIMESTAMP '1970-01-01 00:00:00', l_shipdate)
               // 7 AS w,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x
      FROM lineitem WHERE l_partkey < {_CROSTON_PARTS}
      GROUP BY 1, 2
    ),
    ser AS (
      SELECT g, w, x,
             row_number() OVER (PARTITION BY g ORDER BY w) AS rn
      FROM dem
    ),
    st AS (
      SELECT g, CAST(1 AS BIGINT) AS rn,
             x * 1000 AS z, CAST(1000 AS BIGINT) AS p, w
      FROM ser WHERE rn = 1
      UNION ALL
      SELECT d.g, d.rn,
             (200 * d.x * 1000 + 800 * s.z) // 1000,
             (200 * (d.w - s.w) * 1000 + 800 * s.p) // 1000,
             d.w
      FROM st s JOIN ser d ON d.g = s.g AND d.rn = s.rn + 1
    ),
    last_rn AS (SELECT g, max(rn) AS mx FROM ser GROUP BY g)
    SELECT st.g AS partkey,
           CAST(l.mx AS BIGINT) AS n_demand_weeks,
           CAST(st.z AS BIGINT) AS size_milli,
           CAST(st.p AS BIGINT) AS interval_milli,
           CAST(st.z * 1000 // st.p AS BIGINT) AS forecast_per_week_milli
    FROM st JOIN last_rn l ON st.g = l.g AND st.rn = l.mx
    """,
    doc=(
        "Croston's method for intermittent demand on a fixed part "
        "panel: separate exponential smoothing (alpha=.2, exact milli "
        "integers) of demand SIZES and inter-demand INTERVALS — the "
        "estimator that replaces plain SES when most periods are zero "
        "(SES over intermittent series chases zeros; Croston's "
        "size/interval ratio does not). Forecast = size/interval per "
        "week. Spark folds one struct accumulator per part; the "
        "oracle replays every part with one group-keyed RECURSIVE "
        "CTE."
    ),
)
def orders_croston_intermittent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-part Croston size/interval states + forecast.

    Scale notes (100 TB): the fact reduces to (part, week) demand
    points for the panel (filter pushed to the scan); folds
    parallelize across parts — a million-part panel runs the same
    plan. Intervals come from the fold's carried previous week, so
    the series never needs densifying."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < _CROSTON_PARTS
    )
    dem = li.groupBy(
        F.col("l_partkey").alias("g"),
        F.expr(
            "timestampdiff(DAY, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            " l_shipdate) div 7"
        ).alias("w"),
    ).agg(F.expr("CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)").alias("x"))
    arr = dem.groupBy("g").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("w").alias("w"), F.col("x").alias("x")))
        ).alias("a")
    )
    fold = (
        "aggregate(slice(a, 2, size(a) - 1),"
        " named_struct('z', a[0].x * 1000L, 'p', 1000L, 'w', a[0].w),"
        " (s, e) -> named_struct("
        "   'z', (200L * e.x * 1000L + 800L * s.z) div 1000L,"
        "   'p', (200L * (e.w - s.w) * 1000L + 800L * s.p) div 1000L,"
        "   'w', e.w))"
    )
    st = arr.select(
        F.col("g").alias("partkey"),
        F.size("a").cast("bigint").alias("n_demand_weeks"),
        F.expr(fold).alias("s"),
    )
    return st.select(
        "partkey",
        "n_demand_weeks",
        F.expr("s.z").cast("bigint").alias("size_milli"),
        F.expr("s.p").cast("bigint").alias("interval_milli"),
        F.expr("s.z * 1000 div s.p").cast("bigint").alias(
            "forecast_per_week_milli"
        ),
    )


# ---------------------------------------------------------------------------
# Double-charge audit: same customer, same amount, within 7 days
# ---------------------------------------------------------------------------


@register(
    "orders_double_charge_audit",
    """
    WITH o AS (
      SELECT o_orderkey AS okey, o_custkey AS ck,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             datediff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
               AS d
      FROM orders
    ),
    pairs AS (
      SELECT a.ck, a.cents
      FROM o a JOIN o b
        ON a.ck = b.ck AND a.cents = b.cents AND a.okey < b.okey
       AND abs(a.d - b.d) <= 7
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT ck) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS flagged_cents
    FROM pairs
    """,
    doc=(
        "Double-charge audit: order pairs by the same customer for the "
        "IDENTICAL amount within 7 days — the classic duplicate-"
        "payment fraud/DQ rule. The Spark plan is a binned equi-join "
        "on (customer, cents, week-bucket) with a +-1 bucket delta "
        "explode, so each qualifying pair matches EXACTLY once (the "
        "bucket delta of a real pair is a single value) and the "
        "theta predicate never becomes a nested-loop join; the oracle "
        "runs the plain theta join."
    ),
)
def orders_double_charge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once binned pair detection for near-duplicate charges.

    Scale notes (100 TB): the join key (customer, cents, bucket) is
    selective — candidates are only same-amount same-customer orders
    in adjacent weeks; a plain |orders|^2 date-window theta join would
    plan as BroadcastNestedLoop (the round-4 lesson the interval
    operators exist to avoid)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("ck"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.expr(
            "timestampdiff(DAY, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            " o_orderdate)"
        ).alias("d"),
    )
    a = o.select(
        "okey", "ck", "cents", "d", F.expr("d div 7").alias("bkt")
    ).select(
        "*", F.explode(F.expr("array(-1, 0, 1)")).alias("delta")
    )
    b = o.select(
        F.col("okey").alias("okey_b"),
        F.col("ck").alias("ck_b"),
        F.col("cents").alias("cents_b"),
        F.col("d").alias("d_b"),
        F.expr("d div 7").alias("bkt_b"),
    )
    pairs = a.join(
        b,
        (F.col("ck") == F.col("ck_b"))
        & (F.col("cents") == F.col("cents_b"))
        & (F.col("bkt_b") == F.col("bkt") + F.col("delta"))
        & (F.col("okey") < F.col("okey_b"))
        & (F.expr("abs(d - d_b)") <= 7),
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("ck").cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("flagged_cents"),
    )


# ---------------------------------------------------------------------------
# Price-volume-mix bridge (revenue change decomposition)
# ---------------------------------------------------------------------------

_PVM_Y0, _PVM_Y1 = 1996, 1997


@register(
    "orders_price_volume_mix",
    f"""
    WITH pl AS (
      SELECT n.n_name AS nation, l.l_partkey AS pk,
             CAST(sum(CASE WHEN year(o.o_orderdate) = {_PVM_Y0}
                           THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS q0,
             CAST(sum(CASE WHEN year(o.o_orderdate) = {_PVM_Y0}
                           THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS r0,
             CAST(sum(CASE WHEN year(o.o_orderdate) = {_PVM_Y1}
                           THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS q1,
             CAST(sum(CASE WHEN year(o.o_orderdate) = {_PVM_Y1}
                           THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS r1
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE year(o.o_orderdate) IN ({_PVM_Y0}, {_PVM_Y1})
      GROUP BY 1, 2
    ),
    eff AS (
      SELECT nation, r0, r1,
             CASE WHEN q0 > 0 AND q1 > 0
                  THEN (q1 - q0) * r0 // q0 ELSE 0 END AS vol,
             CASE WHEN q0 > 0 AND q1 > 0
                  THEN r1 - r0 - ((q1 - q0) * r0 // q0) ELSE 0 END AS prc,
             CASE WHEN q0 = 0 THEN r1 ELSE 0 END AS newp,
             CASE WHEN q1 = 0 THEN -r0 ELSE 0 END AS exitp
      FROM pl
    )
    SELECT nation,
           CAST(sum(r0) AS BIGINT) AS cents_y0,
           CAST(sum(r1) AS BIGINT) AS cents_y1,
           CAST(sum(r1) - sum(r0) AS BIGINT) AS delta_cents,
           CAST(sum(vol) AS BIGINT) AS volume_effect_cents,
           CAST(sum(prc) AS BIGINT) AS price_effect_cents,
           CAST(sum(newp) AS BIGINT) AS new_product_cents,
           CAST(sum(exitp) AS BIGINT) AS exited_product_cents
    FROM eff GROUP BY 1
    """,
    doc=(
        "Price-volume-mix bridge per nation between two years: each "
        "part's revenue change splits into a volume effect at "
        "base-year unit price ((q1-q0)*r0//q0, exact truncating "
        "integer), a price effect (the per-part residual, so the "
        "bridge closes by construction: delta = volume + price + new "
        "+ exited), and new/exited product effects. The standard "
        "finance revenue-bridge decomposition, computed in ONE "
        "conditional-aggregation pass — no per-year self-join."
    ),
)
def orders_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge: volume/price/new/exit effects per nation.

    Scale notes (100 TB): the year pivot is conditional aggregation
    inside one (nation, part) groupBy — one shuffle, no full-outer
    join of year snapshots; everything after is part-grain then
    nation-grain. The year filter prunes the scan via the orders
    join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.expr("year(o_orderdate)").alias("yr")
    ).filter(F.col("yr").isin(_PVM_Y0, _PVM_Y1))
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    pl = j.groupBy(F.col("n_name").alias("nation"), F.col("l_partkey")).agg(
        F.expr(
            f"CAST(sum(CASE WHEN yr = {_PVM_Y0}"
            " THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)"
        ).alias("q0"),
        F.expr(
            f"CAST(sum(CASE WHEN yr = {_PVM_Y0}"
            " THEN CAST(round(l_extendedprice * 100) AS BIGINT)"
            " ELSE 0 END) AS BIGINT)"
        ).alias("r0"),
        F.expr(
            f"CAST(sum(CASE WHEN yr = {_PVM_Y1}"
            " THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)"
        ).alias("q1"),
        F.expr(
            f"CAST(sum(CASE WHEN yr = {_PVM_Y1}"
            " THEN CAST(round(l_extendedprice * 100) AS BIGINT)"
            " ELSE 0 END) AS BIGINT)"
        ).alias("r1"),
    )
    eff = pl.select(
        "nation",
        "r0",
        "r1",
        F.expr(
            "CASE WHEN q0 > 0 AND q1 > 0"
            " THEN (q1 - q0) * r0 div q0 ELSE 0 END"
        ).alias("vol"),
        F.expr(
            "CASE WHEN q0 > 0 AND q1 > 0"
            " THEN r1 - r0 - ((q1 - q0) * r0 div q0) ELSE 0 END"
        ).alias("prc"),
        F.expr("CASE WHEN q0 = 0 THEN r1 ELSE 0 END").alias("newp"),
        F.expr("CASE WHEN q1 = 0 THEN -r0 ELSE 0 END").alias("exitp"),
    )
    return eff.groupBy("nation").agg(
        F.sum("r0").cast("bigint").alias("cents_y0"),
        F.sum("r1").cast("bigint").alias("cents_y1"),
        F.expr("CAST(sum(r1) - sum(r0) AS BIGINT)").alias("delta_cents"),
        F.sum("vol").cast("bigint").alias("volume_effect_cents"),
        F.sum("prc").cast("bigint").alias("price_effect_cents"),
        F.sum("newp").cast("bigint").alias("new_product_cents"),
        F.sum("exitp").cast("bigint").alias("exited_product_cents"),
    )


# ---------------------------------------------------------------------------
# Margin waterfall: gross -> discount -> tax decomposition by ship year
# ---------------------------------------------------------------------------

#: all-integer charge decomposition: cents / pct come from round() of
#: 2-decimal SOURCE columns (the only safe round), every derived step
#: is integer div — no float .5 boundary can diverge across engines.
_MW_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_MW_DISC = "CAST(round(l_discount * 100) AS BIGINT)"
_MW_TAX = "CAST(round(l_tax * 100) AS BIGINT)"


@register(
    "orders_margin_waterfall",
    f"""
    SELECT order_year,
           CAST(sum(cents) AS BIGINT) AS gross_cents,
           CAST(sum(disc_cents) AS BIGINT) AS discount_cents,
           CAST(sum((cents - disc_cents) * taxpct // 100) AS BIGINT)
             AS tax_cents,
           CAST(sum(cents - disc_cents
                    + (cents - disc_cents) * taxpct // 100) AS BIGINT)
             AS net_cents,
           CAST(sum(disc_cents) * 1000000 // sum(cents) AS BIGINT)
             AS discount_ppm
    FROM (SELECT year(l_shipdate) AS order_year,
                 {_MW_CENTS} AS cents,
                 {_MW_CENTS} * {_MW_DISC} // 100 AS disc_cents,
                 {_MW_TAX} AS taxpct
          FROM lineitem) r
    GROUP BY 1
    """,
    doc=(
        "Revenue waterfall by ship year: gross charge, discount given, "
        "tax collected and net receivable, decomposed per line item in "
        "EXACT integer arithmetic (cents x integer pct div 100 — the "
        "fn_decimal discipline; round() touches only 2-decimal source "
        "columns, so no float .5 boundary exists). The margin-bridge "
        "report a finance team reads before pricing changes."
    ),
)
def orders_margin_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gross -> discount -> tax -> net charge decomposition by year.

    Scale notes (100 TB): one projection + one map-side-combinable
    aggregation to the |years| domain; every component is an integer
    sum, so partial aggregation is exact and the final reduce is
    |years| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.select(
        F.expr("year(l_shipdate)").alias("order_year"),
        F.expr(_MW_CENTS).alias("cents"),
        F.expr(f"{_MW_CENTS} * {_MW_DISC} div 100").alias("disc_cents"),
        F.expr(_MW_TAX).alias("taxpct"),
    )
    return r.groupBy("order_year").agg(
        F.sum("cents").cast("bigint").alias("gross_cents"),
        F.sum("disc_cents").cast("bigint").alias("discount_cents"),
        F.expr(
            "CAST(sum((cents - disc_cents) * taxpct div 100) AS BIGINT)"
        ).alias("tax_cents"),
        F.expr(
            "CAST(sum(cents - disc_cents"
            " + (cents - disc_cents) * taxpct div 100) AS BIGINT)"
        ).alias("net_cents"),
        F.expr(
            "CAST(sum(disc_cents) * 1000000 div sum(cents) AS BIGINT)"
        ).alias("discount_ppm"),
    )


# ---------------------------------------------------------------------------
# Basket size distribution: lines per order, share and value by size
# ---------------------------------------------------------------------------


@register(
    "orders_basket_size_dist",
    """
    WITH b AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS basket_size,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    )
    SELECT basket_size,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) * basket_size AS BIGINT) AS n_lines,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(count(*) * 1000000 // sum(count(*)) OVER () AS BIGINT)
             AS share_ppm,
           CAST(sum(count(*)) OVER (ORDER BY basket_size
                                    ROWS UNBOUNDED PRECEDING)
                * 1000000 // sum(count(*)) OVER () AS BIGINT) AS cum_ppm,
           CAST(sum(cents) // count(*) AS BIGINT) AS avg_order_cents
    FROM b GROUP BY basket_size
    """,
    doc=(
        "Basket-size distribution: orders bucketed by line count with "
        "order share, cumulative share and average order value per "
        "size — the order-profile statistic behind picking/packing "
        "capacity models and basket-growth experiments. Exact integer "
        "cents and ppm."
    ),
)
def orders_basket_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines-per-order distribution with value per basket size.

    Scale notes (100 TB): one groupBy(l_orderkey) rollup (map-side
    combinable), then a second aggregation to the BOUNDED basket-size
    domain (TPC-H: 1-7); the share/cumulative windows run over those
    few rows only — the classic bounded-domain collapse."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("basket_size"),
        F.expr(
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
            " AS BIGINT)"
        ).alias("cents"),
    )
    g = b.groupBy("basket_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.expr("CAST(count(*) * basket_size AS BIGINT)").alias("n_lines"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
        F.expr("CAST(sum(cents) div count(*) AS BIGINT)").alias(
            "avg_order_cents"
        ),
    )
    w_all = Window.partitionBy(F.lit(1))
    w_cum = Window.orderBy("basket_size").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return g.select(
        "basket_size",
        "n_orders",
        "n_lines",
        "revenue_cents",
        F.expr("n_orders * 1000000").alias("__num"),
        F.sum("n_orders").over(w_all).alias("__tot"),
        F.sum("n_orders").over(w_cum).alias("__cum"),
        "avg_order_cents",
    ).select(
        "basket_size",
        "n_orders",
        "n_lines",
        "revenue_cents",
        F.expr("CAST(__num div __tot AS BIGINT)").alias("share_ppm"),
        F.expr("CAST(__cum * 1000000 div __tot AS BIGINT)").alias("cum_ppm"),
        "avg_order_cents",
    )


# ---------------------------------------------------------------------------
# Supplier revenue-rank volatility (market-position churn across months)
# ---------------------------------------------------------------------------

_RV_TOP = 20


@register(
    "orders_rank_volatility",
    f"""
    WITH rev AS (
      SELECT l.l_suppkey AS supplier,
             CAST((year(o.o_orderdate) - 1990) * 12
                  + month(o.o_orderdate) AS BIGINT) AS m_idx,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), rk AS (
      SELECT supplier, m_idx,
             CAST(rank() OVER (PARTITION BY m_idx
                               ORDER BY cents DESC, supplier) AS BIGINT)
               AS r
      FROM rev
    ), d AS (
      SELECT supplier,
             abs(r - lag(r) OVER (PARTITION BY supplier ORDER BY m_idx))
               AS dr,
             m_idx - lag(m_idx) OVER (PARTITION BY supplier ORDER BY m_idx)
               AS dm
      FROM rk
    ), vol AS (
      SELECT supplier, CAST(count(*) AS BIGINT) AS n_transitions,
             CAST(sum(dr) * 1000 // count(*) AS BIGINT)
               AS avg_abs_shift_milli,
             CAST(max(dr) AS BIGINT) AS max_shift
      FROM d WHERE dm = 1 GROUP BY 1
    ), top AS (
      SELECT * FROM vol
      ORDER BY avg_abs_shift_milli DESC, supplier LIMIT {_RV_TOP}
    )
    SELECT supplier, n_transitions, avg_abs_shift_milli, max_shift,
           CAST(row_number() OVER (ORDER BY avg_abs_shift_milli DESC,
                                   supplier) AS BIGINT) AS rank
    FROM top
    """,
    doc=(
        "Revenue-rank volatility per supplier: monthly revenue ranks "
        "(dense months only — consecutive-month transitions) and the "
        "mean absolute rank shift in milli-positions, surfacing the "
        "suppliers whose market position churns most — the stability "
        "screen behind vendor-consolidation and market-dynamics "
        "dashboards. Integer cents, integer ranks, integer shifts."
    ),
)
def orders_rank_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top suppliers by month-over-month revenue-rank churn.

    Scale notes (100 TB): the fact reduces to |suppliers| x |months|
    revenue cells in one combining aggregate; the per-month rank
    window is supplier-grain within each month (switch to the
    two-level rank helper if the supplier dimension itself reaches
    fact scale), the lag window is keyed per supplier, and the final
    top-k is orderBy+limit (TakeOrderedAndProject)."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_suppkey").alias("supplier"),
            F.expr(
                "CAST((year(o_orderdate) - 1990) * 12"
                " + month(o_orderdate) AS BIGINT)"
            ).alias("m_idx"),
        )
        .agg(
            F.sum(
                F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            ).cast("bigint").alias("cents")
        )
    )
    rk = rev.select(
        "supplier",
        "m_idx",
        F.rank()
        .over(Window.partitionBy("m_idx").orderBy(F.desc("cents"), F.asc("supplier")))
        .cast("bigint")
        .alias("r"),
    )
    ws = Window.partitionBy("supplier").orderBy("m_idx")
    d = rk.select(
        "supplier",
        F.abs(F.col("r") - F.lag("r").over(ws)).alias("dr"),
        (F.col("m_idx") - F.lag("m_idx").over(ws)).alias("dm"),
    )
    vol = (
        d.filter("dm = 1")
        .groupBy("supplier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.expr(
                "CAST(sum(dr) * 1000 div count(*) AS BIGINT)"
            ).alias("avg_abs_shift_milli"),
            F.max("dr").cast("bigint").alias("max_shift"),
        )
    )
    top = vol.orderBy(
        F.desc("avg_abs_shift_milli"), F.asc("supplier")
    ).limit(_RV_TOP)
    wr = Window.orderBy(F.desc("avg_abs_shift_milli"), F.asc("supplier"))
    return top.withColumn("rank", F.row_number().over(wr).cast("bigint"))


# ---------------------------------------------------------------------------
# Classical seasonal decomposition (additive, integer-exact x24 scale)
# ---------------------------------------------------------------------------


@register(
    "orders_seasonal_decompose",
    """
    WITH m AS (
      SELECT (CAST(date_part('year', o_orderdate) AS BIGINT) - 1995) * 12
             + CAST(date_part('month', o_orderdate) AS BIGINT) - 1 AS mi,
             min(strftime(o_orderdate, '%Y-%m')) AS month,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    ),
    tr AS (
      SELECT a.mi, a.month, a.rev_cents,
             CAST(sum(CASE WHEN abs(o.off) = 6 THEN b.rev_cents
                           ELSE 2 * b.rev_cents END) AS BIGINT) AS trend_x24,
             count(*) AS n_nbr
      FROM m a
      CROSS JOIN (SELECT unnest(range(-6, 7)) AS off) o
      JOIN m b ON b.mi = a.mi + o.off
      GROUP BY 1, 2, 3
    ),
    dt AS (
      SELECT mi, month, rev_cents, trend_x24,
             rev_cents * 24 - trend_x24 AS det_x24
      FROM tr WHERE n_nbr = 13
    ),
    seas AS (
      SELECT mi % 12 AS moy,
             CAST(sum(det_x24) AS BIGINT) AS s_sum,
             CAST(count(*) AS BIGINT) AS s_n
      FROM dt GROUP BY 1
    )
    SELECT d.month, d.rev_cents, d.trend_x24,
           CAST(s.s_sum // s.s_n AS BIGINT) AS seasonal_x24,
           CAST(d.det_x24 - s.s_sum // s.s_n AS BIGINT) AS residual_x24
    FROM dt d JOIN seas s ON d.mi % 12 = s.moy
    ORDER BY d.month
    """,
    doc=(
        "Classical additive seasonal decomposition of monthly revenue "
        "— trend from the standard centered 2x12 moving average "
        "(kept exact by carrying x24-scaled integer cents: endpoint "
        "months weigh 1, interior months 2), monthly seasonal indices "
        "as integer means of the detrended series, residual as the "
        "remainder. The neighbor expansion is an EQUI-join of the "
        "month aggregate against an offset spine (never a non-equi "
        "range probe), and months missing either +-6 neighbor are "
        "excluded by the n=13 guard rather than silently averaging a "
        "shorter window."
    ),
)
def orders_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue = trend + seasonal + residual, x24 integer scale.

    Scale notes (100 TB): one fact pass reduces to the ~80-row month
    aggregate; everything after (offset self-join, month-of-year
    means) is metadata-scale. The decomposition grain is the CALENDAR,
    so the operator's cost is the initial groupBy no matter how large
    the fact grows."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.expr(
                "(CAST(year(o_orderdate) AS BIGINT) - 1995) * 12"
                " + CAST(month(o_orderdate) AS BIGINT) - 1"
            ).alias("mi")
        )
        .agg(
            F.min(F.date_format("o_orderdate", "yyyy-MM")).alias("month"),
            F.sum(
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            ).cast("bigint").alias("rev_cents"),
        )
        .localCheckpoint(eager=False)  # ~80 rows, consumed by 2 branches
    )
    off = spark.range(-6, 7).select(F.col("id").alias("off"))
    b = m.select(
        F.col("mi").alias("mj"), F.col("rev_cents").alias("rev_b")
    )
    tr = (
        m.crossJoin(F.broadcast(off))
        .withColumn("mj", F.expr("mi + off"))
        .join(b, "mj")
        .groupBy("mi", "month", "rev_cents")
        .agg(
            F.sum(
                F.expr("CASE WHEN abs(off) = 6 THEN rev_b ELSE 2 * rev_b END")
            ).cast("bigint").alias("trend_x24"),
            F.count(F.lit(1)).alias("n_nbr"),
        )
    )
    dt = tr.filter("n_nbr = 13").withColumn(
        "det_x24", F.expr("rev_cents * 24 - trend_x24")
    )
    seas = dt.groupBy(F.expr("mi % 12").alias("moy")).agg(
        F.sum("det_x24").cast("bigint").alias("s_sum"),
        F.count(F.lit(1)).cast("bigint").alias("s_n"),
    )
    return (
        dt.join(F.broadcast(seas), F.expr("mi % 12") == F.col("moy"))
        .select(
            "month",
            "rev_cents",
            "trend_x24",
            F.expr("CAST(s_sum div s_n AS BIGINT)").alias("seasonal_x24"),
            F.expr(
                "CAST(det_x24 - s_sum div s_n AS BIGINT)"
            ).alias("residual_x24"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve (acquisition-month cohorts x account age)
# ---------------------------------------------------------------------------

_LTV_MAX_AGE = 12


@register(
    "orders_cohort_ltv_curve",
    f"""
    WITH om AS (
      SELECT o_custkey,
             (CAST(date_part('year', o_orderdate) AS BIGINT) - 1995) * 12
             + CAST(date_part('month', o_orderdate) AS BIGINT) - 1 AS mi,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    first AS (
      SELECT o_custkey, CAST(min(mi) AS BIGINT) AS mi_c FROM om GROUP BY 1
    ),
    sizes AS (
      SELECT mi_c, CAST(count(*) AS BIGINT) AS cohort_size
      FROM first GROUP BY 1
    ),
    rev AS (
      SELECT f.mi_c, om.mi - f.mi_c AS age_months,
             CAST(sum(om.cents) AS BIGINT) AS rev_cents
      FROM om JOIN first f ON om.o_custkey = f.o_custkey
      WHERE om.mi - f.mi_c <= {_LTV_MAX_AGE}
      GROUP BY 1, 2
    )
    SELECT strftime(make_date(1995 + CAST(r.mi_c // 12 AS INT),
                              CAST(r.mi_c % 12 AS INT) + 1, 1),
                    '%Y-%m') AS cohort,
           s.cohort_size,
           CAST(r.age_months AS BIGINT) AS age_months,
           CAST(sum(r.rev_cents) OVER (PARTITION BY r.mi_c
                ORDER BY r.age_months ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_rev_cents,
           CAST(sum(r.rev_cents) OVER (PARTITION BY r.mi_c
                ORDER BY r.age_months ROWS UNBOUNDED PRECEDING)
                // s.cohort_size AS BIGINT) AS ltv_cents_per_cust
    FROM rev r JOIN sizes s ON r.mi_c = s.mi_c
    ORDER BY cohort, age_months
    """,
    doc=(
        "Customer-lifetime-value curve by acquisition cohort: each "
        "customer joins the cohort of their first order month; "
        "per-cohort cumulative revenue through account age "
        f"0..{_LTV_MAX_AGE} months, normalized to integer cents per "
        "cohort member. The cumulative window runs over the "
        "(cohort x age) aggregate — a calendar-bounded grid — never "
        "the fact."
    ),
)
def orders_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative LTV (cents/customer) by cohort and account age.

    Scale notes (100 TB): two fact-grain aggregates (first-order month
    per customer; cohort x age revenue roll-up) joined on customer —
    a broadcast at dim scale, an equi-shuffle at fact scale. The
    cumulative window is partitioned by cohort over <= 13 age rows
    each, i.e. metadata-scale."""
    o = load_table(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        F.expr(
            "(CAST(year(o_orderdate) AS BIGINT) - 1995) * 12"
            " + CAST(month(o_orderdate) AS BIGINT) - 1"
        ).alias("mi"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    first = om.groupBy("o_custkey").agg(
        F.min("mi").cast("bigint").alias("mi_c")
    )
    sizes = first.groupBy("mi_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    rev = (
        om.join(first, "o_custkey")
        .withColumn("age_months", F.expr("mi - mi_c"))
        .filter(F.col("age_months") <= _LTV_MAX_AGE)
        .groupBy("mi_c", "age_months")
        .agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    )
    w = (
        Window.partitionBy("mi_c")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(F.broadcast(sizes), "mi_c")
        .withColumn("cum_rev_cents", F.sum("rev_cents").over(w).cast("bigint"))
        .select(
            F.expr(
                "date_format(make_date(1995 + CAST(mi_c div 12 AS INT),"
                " CAST(mi_c % 12 AS INT) + 1, 1), 'yyyy-MM')"
            ).alias("cohort"),
            "cohort_size",
            F.col("age_months").cast("bigint"),
            "cum_rev_cents",
            F.expr(
                "CAST(cum_rev_cents div cohort_size AS BIGINT)"
            ).alias("ltv_cents_per_cust"),
        )
        .orderBy("cohort", "age_months")
    )


# ---------------------------------------------------------------------------
# Newsvendor stocking quantile (critical-ratio order sizing)
# ---------------------------------------------------------------------------

_NV_CU, _NV_CO = 9, 1  # underage : overage cost -> critical ratio 0.9


@register(
    "orders_newsvendor_quantile",
    f"""
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             datediff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
               AS d,
             CAST(count(*) AS BIGINT) AS demand
      FROM orders GROUP BY 1, 2
    ),
    hist AS (
      SELECT priority, demand, CAST(count(*) AS BIGINT) AS nd
      FROM daily GROUP BY 1, 2
    ),
    cum AS (
      SELECT priority, demand, nd,
             CAST(sum(nd) OVER (PARTITION BY priority ORDER BY demand
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumd,
             CAST(sum(nd) OVER (PARTITION BY priority) AS BIGINT) AS n_days,
             CAST(sum(demand * nd) OVER (PARTITION BY priority)
               AS BIGINT) AS total_demand
      FROM hist
    )
    SELECT priority,
           n_days,
           total_demand,
           CAST(total_demand * 1000 // n_days AS BIGINT) AS mean_demand_milli,
           CAST(min(CASE WHEN cumd * {_NV_CU + _NV_CO} >= n_days * {_NV_CU}
                    THEN demand END) AS BIGINT) AS stock_level,
           CAST(min(CASE WHEN cumd * {_NV_CU + _NV_CO} >= n_days * {_NV_CU}
                    THEN demand END) * 1000
                - total_demand * 1000 // n_days AS BIGINT)
             AS safety_stock_milli
    FROM cum
    GROUP BY 1, 2, 3
    ORDER BY priority
    """,
    doc=(
        "Newsvendor critical-ratio stocking: per order priority, the "
        "stock level is the cu/(cu+co) = 0.9 quantile of the daily "
        "demand distribution — the classic single-period inventory "
        "optimum. The quantile is an EXACT order statistic from a "
        "cumulative window over the bounded demand-value domain "
        "(cum * (cu+co) >= n * cu cross-multiplication — no ratio, no "
        "interpolation), never a positional sort of the daily series."
    ),
)
def orders_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Critical-ratile stocking levels per order priority.

    Scale notes (100 TB): facts collapse to (priority, day) then to a
    (priority, demand-value) histogram; the quantile predicate runs
    over that bounded domain. Windows are priority-partitioned."""
    o = load_table(spark, sf_dir, "orders")
    epoch = "TIMESTAMP '1970-01-01 00:00:00'"
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.expr(f"datediff(o_orderdate, {epoch})").alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("demand"))
    hist = daily.groupBy("priority", "demand").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    wc = Window.partitionBy("priority").orderBy("demand").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("priority")
    cum = hist.select(
        "priority", "demand", "nd",
        F.sum("nd").over(wc).cast("bigint").alias("cumd"),
        F.sum("nd").over(wt).cast("bigint").alias("n_days"),
        F.sum(F.expr("demand * nd")).over(wt).cast("bigint")
        .alias("total_demand"),
    )
    r = _NV_CU + _NV_CO
    return (
        cum.groupBy("priority", "n_days", "total_demand")
        .agg(
            F.min(
                F.expr(
                    f"CASE WHEN cumd * {r} >= n_days * {_NV_CU}"
                    " THEN demand END"
                )
            ).cast("bigint").alias("stock_level")
        )
        .select(
            "priority", "n_days", "total_demand",
            F.expr("total_demand * 1000 div n_days").cast("bigint")
            .alias("mean_demand_milli"),
            "stock_level",
            F.expr(
                "stock_level * 1000 - total_demand * 1000 div n_days"
            ).cast("bigint").alias("safety_stock_milli"),
        )
        .select(
            "priority", "n_days", "total_demand", "mean_demand_milli",
            "stock_level", "safety_stock_milli",
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# EOQ (economic order quantity) policy per brand
# ---------------------------------------------------------------------------

_EOQ_ORDER_COST_CENTS = 10_000      # fixed cost per replenishment ($100)
_EOQ_CARRY_PCT = 20                  # holding cost = 20% of unit price/yr


@register(
    "orders_eoq_policy",
    f"""
    WITH d AS (
      SELECT p.p_brand AS brand,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS demand,
             CAST(sum(CAST(round(p.p_retailprice * 100) AS BIGINT)
                      * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS px_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    h AS (
      SELECT brand, demand,
             CAST((px_cents // demand) * {_EOQ_CARRY_PCT} // 100 AS BIGINT)
               AS hold_cents
      FROM d
    )
    SELECT brand, demand, hold_cents,
           CAST(floor(sqrt(CAST((2 * demand * {_EOQ_ORDER_COST_CENTS})
                // nullif(hold_cents, 0) AS DOUBLE))) AS BIGINT) AS eoq_units,
           CAST(demand // nullif(CAST(floor(sqrt(CAST(
                (2 * demand * {_EOQ_ORDER_COST_CENTS})
                // nullif(hold_cents, 0) AS DOUBLE))) AS BIGINT), 0)
                AS BIGINT) AS cycles_per_horizon
    FROM h
    ORDER BY brand
    """,
    doc=(
        "EOQ replenishment policy per part brand: "
        "sqrt(2 x demand x order_cost / holding_cost) with holding "
        "cost = 20% of the demand-weighted mean unit price — the "
        "textbook inventory cycle sizing. The radicand is an exact "
        "BIGINT (divmod before sqrt), and floor(sqrt(integer)) is "
        "engine-exact because IEEE sqrt is correctly rounded and no "
        "integer lies in (floor(x), x]."
    ),
)
def orders_eoq_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EOQ units + replenishment cycles per brand.

    Scale notes (100 TB): one fact-dim broadcast join, one brand-grain
    combining aggregate; everything after is projection over 25 rows.
    The radicand 2*D*S stays under 2^53 for brand demand up to ~5e8
    units at S = $100 (document and re-split the horizon if a brand
    exceeds it)."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    p = load_table(spark, sf_dir, "part")
    d = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.expr("CAST(l_quantity AS BIGINT)")).cast("bigint")
            .alias("demand"),
            F.sum(
                F.expr(
                    "CAST(round(p_retailprice * 100) AS BIGINT)"
                    " * CAST(l_quantity AS BIGINT)"
                )
            ).cast("bigint").alias("px_cents"),
        )
    )
    h = d.select(
        "brand", "demand",
        F.expr(
            f"CAST((px_cents div demand) * {_EOQ_CARRY_PCT} div 100"
            " AS BIGINT)"
        ).alias("hold_cents"),
    )
    eoq = (
        f"CAST(floor(sqrt(CAST((2 * demand * {_EOQ_ORDER_COST_CENTS})"
        " div nullif(hold_cents, 0) AS DOUBLE))) AS BIGINT)"
    )
    return h.select(
        "brand", "demand", "hold_cents",
        F.expr(eoq).alias("eoq_units"),
        F.expr(f"CAST(demand div nullif({eoq}, 0) AS BIGINT)")
        .alias("cycles_per_horizon"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# XYZ demand-variability classification (ABC's variability sibling)
# ---------------------------------------------------------------------------


@register(
    "orders_xyz_variability",
    """
    WITH m AS (
      SELECT p.p_brand AS brand,
             datediff('month', TIMESTAMP '1970-01-01 00:00:00',
                      o.o_orderdate) AS mth,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    s AS (
      SELECT brand,
             CAST(count(*) AS BIGINT) AS n_months,
             CAST(sum(qty) AS BIGINT) AS sx,
             CAST(sum(qty * qty) AS BIGINT) AS sxx
      FROM m GROUP BY 1
    ),
    cv AS (
      SELECT brand, n_months, sx,
             CAST(floor(sqrt(CAST(n_months * sxx - sx * sx AS DOUBLE))
                        * 1000000.0 / CAST(sx AS DOUBLE)) AS BIGINT)
               AS cv_micro
      FROM s WHERE sx > 0
    )
    SELECT brand, n_months, sx AS total_qty, cv_micro,
           CASE WHEN cv_micro < 200000 THEN 'X'
                WHEN cv_micro < 400000 THEN 'Y'
                ELSE 'Z' END AS xyz_class
    FROM cv
    ORDER BY brand
    """,
    doc=(
        "XYZ classification (demand-variability sibling of "
        "orders_abc_analysis): per brand, the coefficient of variation "
        "of MONTHLY demand — cv = sqrt(n*Σx² - (Σx)²)/Σx, computed "
        "from exact integer power sums so the only float ops are one "
        "correctly-rounded sqrt, one multiply, one divide over "
        "identical expression text (bit-identical cross-engine), then "
        "floor-micro. X (steady) / Y / Z (erratic) buckets drive "
        "forecastability-aware stocking policy."
    ),
)
def orders_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly-demand CV per brand with XYZ buckets.

    Scale notes (100 TB): facts collapse to (brand, month) then to
    brand-grain integer power sums — two combining aggregates, no
    window over the fact. n*Σx² stays under 2^53 for ~1e6 units/month
    per brand over a century; re-scale qty to thousands past that."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    epoch = "TIMESTAMP '1970-01-01 00:00:00'"
    m = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.expr(
                f"(year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1"
            ).alias("mth"),
        )
        .agg(
            F.sum(F.expr("CAST(l_quantity AS BIGINT)")).cast("bigint")
            .alias("qty")
        )
    )
    s = m.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum("qty").cast("bigint").alias("sx"),
        F.sum(F.expr("qty * qty")).cast("bigint").alias("sxx"),
    )
    cv = s.filter(F.col("sx") > 0).select(
        "brand", "n_months", "sx",
        F.expr(
            "CAST(floor(sqrt(CAST(n_months * sxx - sx * sx AS DOUBLE))"
            " * 1000000.0 / CAST(sx AS DOUBLE)) AS BIGINT)"
        ).alias("cv_micro"),
    )
    return cv.select(
        "brand", "n_months", F.col("sx").alias("total_qty"), "cv_micro",
        F.expr(
            "CASE WHEN cv_micro < 200000 THEN 'X'"
            " WHEN cv_micro < 400000 THEN 'Y' ELSE 'Z' END"
        ).alias("xyz_class"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# (s, S) inventory policy simulation per brand (order-up-to replay)
# ---------------------------------------------------------------------------


@register(
    "orders_ss_policy_sim",
    """
    WITH RECURSIVE weekly AS (
      SELECT p.p_brand AS brand,
             CAST(datediff('day', DATE '1992-01-01', l.l_shipdate) // 7
               AS BIGINT) AS wk,
             CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS d
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    params AS (
      SELECT brand,
             CAST(count(*) AS BIGINT) AS n_weeks,
             CAST(sum(d) // count(*) AS BIGINT) AS s_lo
      FROM weekly GROUP BY 1
    ),
    obs AS (
      SELECT w.brand,
             row_number() OVER (PARTITION BY w.brand ORDER BY w.wk)
               AS rn,
             w.d, p.s_lo, 2 * p.s_lo AS s_hi, p.n_weeks
      FROM weekly w JOIN params p USING (brand)
    ),
    sim AS (
      SELECT brand, rn, d, s_lo, s_hi, n_weeks,
             CAST(CASE WHEN s_hi - d < s_lo THEN s_hi
                  ELSE s_hi - d END AS BIGINT) AS inv,
             CAST(CASE WHEN s_hi - d < s_lo THEN 1 ELSE 0 END
               AS BIGINT) AS n_orders,
             CAST(CASE WHEN s_hi - d < s_lo THEN d ELSE 0 END
               AS BIGINT) AS total_ordered,
             CAST(CASE WHEN s_hi - d < 0 THEN 1 ELSE 0 END
               AS BIGINT) AS n_stockouts,
             CAST(least(s_hi, s_hi - d) AS BIGINT) AS min_inv
      FROM obs WHERE rn = 1
      UNION ALL
      SELECT o.brand, o.rn, o.d, o.s_lo, o.s_hi, o.n_weeks,
             CAST(CASE WHEN s.inv - o.d < o.s_lo THEN o.s_hi
                  ELSE s.inv - o.d END AS BIGINT),
             CAST(s.n_orders + CASE WHEN s.inv - o.d < o.s_lo
               THEN 1 ELSE 0 END AS BIGINT),
             CAST(s.total_ordered + CASE WHEN s.inv - o.d < o.s_lo
               THEN o.s_hi - (s.inv - o.d) ELSE 0 END AS BIGINT),
             CAST(s.n_stockouts + CASE WHEN s.inv - o.d < 0
               THEN 1 ELSE 0 END AS BIGINT),
             CAST(least(s.min_inv, s.inv - o.d) AS BIGINT)
      FROM sim s JOIN obs o ON o.brand = s.brand AND o.rn = s.rn + 1
    )
    SELECT s.brand, s.n_weeks, s.s_lo AS s_param, s.s_hi AS cap_param,
           s.n_orders, s.total_ordered, s.n_stockouts, s.min_inv,
           s.inv AS end_inventory
    FROM sim s JOIN params p
      ON s.brand = p.brand AND s.rn = p.n_weeks
    ORDER BY s.brand
    """,
    doc=(
        "(s, S) order-up-to inventory policy replayed over the weekly "
        "demand series per brand: start at S = 2*mean weekly demand, "
        "subtract demand, reorder up to S whenever inventory falls "
        "below s = mean (zero lead time). Publishes orders placed, "
        "units ordered, stockout weeks and the minimum inventory "
        "excursion — the policy-evaluation loop behind the EOQ/"
        "newsvendor parameters, as an exact integer state machine "
        "(first step of the seed week folds the same formulas as the "
        "recursive step, so both engines replay identically)."
    ),
)
def orders_ss_policy_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential (s,S) policy replay per brand (integer fold).

    Scale notes (100 TB): the fact collapses to (brand, week) demand
    in one hash aggregate; the simulation folds a ~370-element
    integer array per brand (25 rows) — sequential state never
    touches row grain. The oracle replays the identical integer
    machine as a recursive CTE keyed on row number."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    p = load_table(spark, sf_dir, "part")
    weekly = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.expr(
                "CAST(datediff(l_shipdate, DATE '1992-01-01') div 7"
                " AS BIGINT)"
            ).alias("wk"),
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)"
            ).alias("d")
        )
    )
    g = weekly.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_weeks"),
        F.expr("CAST(sum(d) div count(*) AS BIGINT)").alias("s_lo"),
        F.expr(
            "transform(array_sort(collect_list(struct(wk, d))), e -> e.d)"
        ).alias("ds"),
    )
    fold = """
    aggregate(
      ds,
      struct(CAST(2 * s_lo AS BIGINT) AS inv,
             CAST(0 AS BIGINT) AS n_orders,
             CAST(0 AS BIGINT) AS total_ordered,
             CAST(0 AS BIGINT) AS n_stockouts,
             CAST(2 * s_lo AS BIGINT) AS min_inv),
      (st, d) -> struct(
        CAST(CASE WHEN st.inv - d < s_lo THEN 2 * s_lo
             ELSE st.inv - d END AS BIGINT) AS inv,
        CAST(st.n_orders + CASE WHEN st.inv - d < s_lo THEN 1 ELSE 0
          END AS BIGINT) AS n_orders,
        CAST(st.total_ordered + CASE WHEN st.inv - d < s_lo
          THEN 2 * s_lo - (st.inv - d) ELSE 0 END AS BIGINT)
          AS total_ordered,
        CAST(st.n_stockouts + CASE WHEN st.inv - d < 0 THEN 1 ELSE 0
          END AS BIGINT) AS n_stockouts,
        CAST(least(st.min_inv, st.inv - d) AS BIGINT) AS min_inv),
      st -> st)
    """
    sim = g.select(
        "brand", "n_weeks", "s_lo", F.expr(fold).alias("st")
    )
    return sim.select(
        "brand",
        "n_weeks",
        F.col("s_lo").alias("s_param"),
        F.expr("CAST(2 * s_lo AS BIGINT)").alias("cap_param"),
        F.col("st.n_orders").alias("n_orders"),
        F.col("st.total_ordered").alias("total_ordered"),
        F.col("st.n_stockouts").alias("n_stockouts"),
        F.col("st.min_inv").alias("min_inv"),
        F.col("st.inv").alias("end_inventory"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# Chain-ladder development triangle (cohort ultimates + reserve)
# ---------------------------------------------------------------------------

#: volume-weighted development factor in milli, divmod-chained so the
#: *1000 never overflows at any cum magnitude.
_CL_F = "((sn div sc) * 1000 + (sn % sc) * 1000 div sc)"


@register(
    "orders_chain_ladder",
    f"""
    WITH om AS (
      SELECT o_custkey,
             CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    coh AS (
      SELECT o_custkey, CAST(min(yr) AS BIGINT) AS c FROM om GROUP BY 1
    ),
    cell AS (
      SELECT f.c, CAST(o.yr - f.c AS BIGINT) AS age,
             CAST(sum(o.cents) AS BIGINT) AS inc
      FROM om o JOIN coh f USING (o_custkey)
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT c, age,
             CAST(sum(inc) OVER (PARTITION BY c ORDER BY age) AS BIGINT)
               AS cum
      FROM cell
    ),
    factors AS (
      SELECT a.age,
             CAST({_CL_F.replace(' div ', ' // ')} AS BIGINT) AS f_milli
      FROM (
        SELECT cur.age,
               CAST(sum(cur.cum) AS BIGINT) AS sc,
               CAST(sum(nxt.cum) AS BIGINT) AS sn
        FROM cum cur JOIN cum nxt
          ON nxt.c = cur.c AND nxt.age = cur.age + 1
        GROUP BY 1
      ) a
    ),
    latest AS (
      SELECT c, max(age) AS l FROM cum GROUP BY 1
    ),
    chains AS (
      SELECT lt.c, lt.l, cm.cum,
             coalesce((
               SELECT list(f.f_milli ORDER BY f.age)
               FROM factors f WHERE f.age >= lt.l
             ), []) AS fl
      FROM latest lt JOIN cum cm ON cm.c = lt.c AND cm.age = lt.l
    )
    SELECT c AS cohort_year,
           CAST(l AS BIGINT) AS latest_age,
           cum AS cum_latest_cents,
           CAST(list_reduce(list_prepend(cum, fl),
                (x, y) -> x * y // 1000) AS BIGINT) AS ultimate_cents,
           CAST(list_reduce(list_prepend(cum, fl),
                (x, y) -> x * y // 1000) - cum AS BIGINT)
             AS reserve_cents
    FROM chains ORDER BY cohort_year
    """,
    doc=(
        "Chain-ladder development triangle over customer cohorts: "
        "cumulative revenue by (first-order-year cohort, development "
        "age), volume-weighted development factors in exact milli "
        "(divmod chain), and each cohort's ULTIMATE projected by "
        "folding its remaining factor chain onto the latest observed "
        "cumulative (sequential milli products, floored per step "
        "identically in both engines) — the actuarial reserving "
        "method, pointed at revenue development: reserve = ultimate - "
        "observed is the young-cohort revenue still to come."
    ),
)
def orders_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Development factors + cohort ultimates (exact integer milli).

    Scale notes (100 TB): the fact collapses to |cohorts| x |ages| "
    "cells in one aggregate after the cohort-assignment join; factors "
    "and the fold run on that bounded triangle; the per-cohort factor "
    "chain is a <=7-element fold."""
    o = load_table(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("yr"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    coh = om.groupBy("o_custkey").agg(
        F.min("yr").cast("bigint").alias("c")
    )
    cell = (
        om.join(coh, "o_custkey")
        .groupBy("c", F.expr("CAST(yr - c AS BIGINT)").alias("age"))
        .agg(F.sum("cents").cast("bigint").alias("inc"))
    )
    wc = (
        Window.partitionBy("c")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cell.select(
        "c", "age", F.sum("inc").over(wc).cast("bigint").alias("cum")
    ).localCheckpoint(eager=False)  # triangle: factors + latest + chains
    nxt = cum.select(
        F.col("c").alias("c2"),
        (F.col("age") - 1).alias("age"),
        F.col("cum").alias("cum_next"),
    )
    factors = (
        cum.join(nxt, (cum.c == nxt.c2) & (cum.age == nxt.age))
        .groupBy(cum.age.alias("age"))
        .agg(
            F.sum("cum").cast("bigint").alias("sc"),
            F.sum("cum_next").cast("bigint").alias("sn"),
        )
        .select("age", F.expr(f"CAST({_CL_F} AS BIGINT)").alias("f_milli"))
    )
    latest = cum.groupBy("c").agg(F.max("age").alias("l"))
    base = latest.join(
        cum, (latest.c == cum.c) & (latest.l == cum.age)
    ).select(latest.c.alias("c"), "l", "cum")
    fl = (
        base.join(F.broadcast(factors), F.col("age") >= F.col("l"), "left")
        .groupBy("c", "l", "cum")
        .agg(
            F.expr(
                "coalesce(transform(array_sort(collect_list("
                "CASE WHEN f_milli IS NOT NULL"
                " THEN struct(age, f_milli) END)), e -> e.f_milli),"
                " CAST(array() AS ARRAY<BIGINT>))"
            ).alias("fl")
        )
    )
    ult = (
        "aggregate(fl, cum, (x, y) -> CAST(x * y div 1000 AS BIGINT))"
    )
    return fl.select(
        F.col("c").alias("cohort_year"),
        F.col("l").cast("bigint").alias("latest_age"),
        F.col("cum").alias("cum_latest_cents"),
        F.expr(f"CAST({ult} AS BIGINT)").alias("ultimate_cents"),
        F.expr(f"CAST({ult} - cum AS BIGINT)").alias("reserve_cents"),
    ).orderBy("cohort_year")


# ---------------------------------------------------------------------------
# Dynamic event-study DiD (leads/lags around the promo cutoff)
# ---------------------------------------------------------------------------


@register(
    "orders_promo_event_study",
    f"""
    WITH x AS (
      SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS treat,
             CAST(date_part('year', o.o_orderdate) AS BIGINT)
               - {_DID_CUT[:4]} AS r,
             {_DID_CENTS} AS cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
    ),
    g AS (
      SELECT r, treat, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM x GROUP BY 1, 2
    ),
    cells AS (
      SELECT r,
             CAST(max(CASE WHEN treat = 1 THEN n END) AS BIGINT) AS n_tr,
             CAST(max(CASE WHEN treat = 0 THEN n END) AS BIGINT) AS n_ct,
             CAST(max(CASE WHEN treat = 1 THEN s * 1000 // n END)
               AS BIGINT) AS m_tr_milli,
             CAST(max(CASE WHEN treat = 0 THEN s * 1000 // n END)
               AS BIGINT) AS m_ct_milli
      FROM g GROUP BY 1
    ),
    gaps AS (
      SELECT r, n_tr, n_ct, m_tr_milli, m_ct_milli,
             CAST(m_tr_milli - m_ct_milli AS BIGINT) AS gap_milli
      FROM cells
    ),
    base AS (SELECT gap_milli AS base_gap FROM gaps WHERE r = -1)
    SELECT g.r AS rel_year, g.n_tr, g.n_ct,
           g.m_tr_milli, g.m_ct_milli, g.gap_milli,
           CAST(g.gap_milli - b.base_gap AS BIGINT) AS coef_milli
    FROM gaps g CROSS JOIN base b
    ORDER BY rel_year
    """,
    doc=(
        "Dynamic event-study difference-in-differences around the "
        "promo cutoff: per relative year, the treated-vs-control mean "
        "revenue gap normalized to the r = -1 baseline — lead "
        "coefficients (r < -1) test PARALLEL TRENDS (should be ~0 if "
        "the static DiD is credible), lag coefficients trace the "
        "effect's dynamics. Exact integer milli means per cell; the "
        "graduate-level complement to orders_promo_did's single 2x2."
    ),
)
def orders_promo_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-relative-year DiD coefficients vs the r=-1 baseline.

    Scale notes (100 TB): one fact pass collapses to |years| x 2 "
    "cells; the baseline is a 1-row broadcast; everything after is "
    "projection."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    cut_year = int(_DID_CUT[:4])
    x = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .select(
            F.expr(
                "CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END"
            ).alias("treat"),
            F.expr(
                f"CAST(year(o_orderdate) AS BIGINT) - {cut_year}"
            ).alias("r"),
            F.expr(_DID_CENTS).alias("cents"),
        )
    )
    g = x.groupBy("r", "treat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    cells = g.groupBy("r").agg(
        F.expr("CAST(max(CASE WHEN treat = 1 THEN n END) AS BIGINT)").alias(
            "n_tr"
        ),
        F.expr("CAST(max(CASE WHEN treat = 0 THEN n END) AS BIGINT)").alias(
            "n_ct"
        ),
        F.expr(
            "CAST(max(CASE WHEN treat = 1 THEN s * 1000 div n END)"
            " AS BIGINT)"
        ).alias("m_tr_milli"),
        F.expr(
            "CAST(max(CASE WHEN treat = 0 THEN s * 1000 div n END)"
            " AS BIGINT)"
        ).alias("m_ct_milli"),
    )
    gaps = cells.select(
        "r", "n_tr", "n_ct", "m_tr_milli", "m_ct_milli",
        F.expr("CAST(m_tr_milli - m_ct_milli AS BIGINT)").alias("gap_milli"),
    ).localCheckpoint(eager=False)  # |years| rows, base + output branches
    base = gaps.filter(F.col("r") == -1).select(
        F.col("gap_milli").alias("base_gap")
    )
    return (
        gaps.crossJoin(F.broadcast(base))
        .select(
            F.col("r").alias("rel_year"),
            "n_tr", "n_ct", "m_tr_milli", "m_ct_milli", "gap_milli",
            F.expr("CAST(gap_milli - base_gap AS BIGINT)").alias(
                "coef_milli"
            ),
        )
        .orderBy("rel_year")
    )


_SKY_BUCKETS = 64


@register(
    "orders_skyline_pareto",
    """
    WITH lags AS (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents,
             CAST(date_diff('day', o.o_orderdate, max(l.l_shipdate))
                  AS BIGINT) AS lag_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, o.o_orderdate
    ),
    pts AS (
      SELECT price_cents, lag_days, CAST(count(*) AS BIGINT) AS n_orders
      FROM lags GROUP BY 1, 2
    ),
    cand AS (
      SELECT price_cents, lag_days, n_orders FROM (
        SELECT *, row_number() OVER (PARTITION BY price_cents
                    ORDER BY lag_days) AS rn
        FROM pts
      ) WHERE rn = 1
    ),
    sky AS (
      SELECT *, min(lag_days) OVER (ORDER BY price_cents DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS hi_min
      FROM cand
    )
    SELECT price_cents, lag_days, n_orders
    FROM sky WHERE hi_min IS NULL OR lag_days < hi_min
    ORDER BY price_cents DESC
    """,
    doc=(
        "Skyline (Pareto-front) query — orders not dominated on "
        "(maximize total price, minimize fulfillment lag), the classic "
        "multi-criteria operator (Borzsony/Kossmann/Stocker, ICDE'01). "
        "A point survives iff no other point has >= price AND <= lag "
        "with one strict. The oracle uses the textbook sort-sweep "
        "window; the Spark side gets identical values from a TWO-LEVEL "
        "sweep with no global sort: per-price-bucket running lag "
        "minima (distributed window) + a broadcast 64-row higher-"
        "bucket prefix-min table — the global_row_number rewrite "
        "applied to a running MIN."
    ),
)
def orders_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed 2-D skyline via bucketed sweep.

    Scale notes (100 TB): one orderkey-partitioned join+agg to order
    grain, one hash agg to distinct points, a per-price window (keyed
    on price — high cardinality, distributed), then the two-level
    prefix-min: per-bucket windows partition by the price bucket and
    the cross-bucket carry rides a broadcast 64-row table. No stage
    sorts more than one bucket's points on one task. The point-grain
    reduction also bounds the final filter's input at |distinct
    prices|, never order count."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lags = (
        li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
                "price_cents"
            ),
            F.datediff("last_ship", "o_orderdate").cast("bigint").alias(
                "lag_days"
            ),
        )
    )
    pts = lags.groupBy("price_cents", "lag_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    wp = Window.partitionBy("price_cents").orderBy("lag_days")
    cand = (
        pts.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .drop("rn")
        # two consumers below (bucket extrema + the sweep itself)
        .localCheckpoint(eager=False)
    )
    b = cand.agg(
        F.min("price_cents").alias("lo"), F.max("price_cents").alias("hi")
    ).collect()[0]
    lo, hi = int(b.lo), int(b.hi)
    span = max(hi - lo + 1, 1)
    bucketed = cand.withColumn(
        "bkt",
        F.expr(f"CAST((price_cents - {lo}) * {_SKY_BUCKETS} div {span}"
               " AS BIGINT)"),
    )
    # cross-bucket carry: min lag of every STRICTLY HIGHER bucket
    per_bucket = bucketed.groupBy("bkt").agg(
        F.min("lag_days").alias("bmin")
    )
    wb = Window.orderBy(F.desc("bkt")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = per_bucket.select(
        "bkt", F.min("bmin").over(wb).alias("hi_bucket_min")
    )
    win = Window.partitionBy("bkt").orderBy(F.desc("price_cents")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    swept = (
        bucketed.join(F.broadcast(carry), "bkt")
        .withColumn("in_bucket_min", F.min("lag_days").over(win))
        # Spark least() skips NULLs (returns NULL only when both are),
        # exactly the +inf-identity the sweep needs at bucket edges
        .withColumn("hi_min", F.least("in_bucket_min", "hi_bucket_min"))
    )
    return (
        swept.filter("hi_min IS NULL OR lag_days < hi_min")
        .select("price_cents", "lag_days", "n_orders")
        .orderBy(F.desc("price_cents"))
    )


# ---------------------------------------------------------------------------
# Delete-one jackknife variance of the ratio estimator — round 13
# ---------------------------------------------------------------------------


@register(
    "orders_jackknife_ratio",
    """
    WITH cl AS (
      SELECT o.o_custkey,
             c.c_mktsegment AS segment,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y,
             CAST(count(*) AS BIGINT) AS x
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), seg AS (
      SELECT segment, y, x,
             sum(y) OVER (PARTITION BY segment) AS sy,
             sum(x) OVER (PARTITION BY segment) AS sx,
             count(*) OVER (PARTITION BY segment) AS n
      FROM cl
    ), rep AS (
      SELECT segment, n,
             sy * 1000 // sx AS r_milli,
             (sy - y) * 1000 // (sx - x) - sy * 1000 // sx AS d
      FROM seg
    )
    SELECT segment,
           CAST(n AS BIGINT) AS n_clusters,
           CAST(r_milli AS BIGINT) AS ratio_milli,
           CAST(floor(sqrt(CAST(sum(d * d)
                - (sum(d * d) + n - 1) // n AS BIGINT)))
                AS BIGINT) AS se_jack_milli,
           CAST(CAST(floor(sqrt(CAST(sum(d * d)
                - (sum(d * d) + n - 1) // n AS BIGINT)))
                AS BIGINT) * 1000000 // r_milli AS BIGINT) AS rel_se_ppm
    FROM rep GROUP BY segment, n, r_milli ORDER BY 1
    """,
    doc=(
        "Delete-one (delete-a-cluster) jackknife standard error of the "
        "ratio estimator R = total revenue / total orders, clusters = "
        "customers, strata = market segments. Replicates R_(i) = "
        "(Sy-y_i)/(Sx-x_i) are exact integer milli-cent quotients; the "
        "variance uses the R-hat-centered jackknife form (Shao & Tu "
        "variant) so every deviation d_i is a SMALL bounded integer — "
        "sum(d^2) stays far inside BIGINT at any SF (value-range-"
        "bounded, not row-count-bounded). (n-1)/n * s is computed as "
        "s - ceil(s/n) — never a product with the row count — and "
        "se = floor(sqrt(.)) is engine-exact (floor-sqrt-floor). The "
        "uncertainty audit behind any 'revenue per order' KPI."
    ),
)
def orders_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jackknife SE of revenue-per-order by segment, all-integer.

    Scale notes (100 TB): one orders scan, one shuffle to customer
    grain, one broadcast-sized dim join; per-segment totals ride a
    5-partition window over customer-grain rows (trivial per-group
    work), so no branch re-executes the fact scan; the final
    aggregate carries 5 rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    cl = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("o_custkey", "segment")
        .agg(
            F.sum("cents").cast("bigint").alias("y"),
            F.count(F.lit(1)).cast("bigint").alias("x"),
        )
    )
    ws = Window.partitionBy("segment")
    seg = cl.select(
        "segment",
        "y",
        "x",
        F.sum("y").over(ws).alias("sy"),
        F.sum("x").over(ws).alias("sx"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    rep = seg.select(
        "segment",
        "n",
        F.expr("sy * 1000 div sx").alias("r_milli"),
        F.expr(
            "(sy - y) * 1000 div (sx - x) - sy * 1000 div sx"
        ).alias("d"),
    )
    return (
        rep.groupBy("segment", "n", "r_milli")
        .agg(
            F.expr(
                "CAST(floor(sqrt(CAST(sum(d * d)"
                " - (sum(d * d) + n - 1) div n AS BIGINT))) AS BIGINT)"
            ).alias("se_jack_milli")
        )
        .select(
            "segment",
            F.col("n").cast("bigint").alias("n_clusters"),
            F.col("r_milli").cast("bigint").alias("ratio_milli"),
            "se_jack_milli",
            F.expr("se_jack_milli * 1000000 div r_milli")
            .cast("bigint")
            .alias("rel_se_ppm"),
        )
        .orderBy("segment")
    )
