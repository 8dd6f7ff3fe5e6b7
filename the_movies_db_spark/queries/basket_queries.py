"""Market-basket co-occurrence mining over orders.

``basket_brand_pairs`` computes, for every pair of part brands bought
together in at least one order, the co-occurrence count, support, and
lift — the first pass of any frequent-itemset / association-rule
pipeline (and of "products bought together" recommenders).

Exactness: support and lift are exact integer ppm (``a div b``), so the
value-hash is engine-stable; counts are BIGINT throughout.

Scale notes (100 TB): the item dimension (part → brand) is broadcast;
the distinct (order, brand) aggregation collapses the fact table with
map-side combine BEFORE the pair join, so the self-join input is
bounded by |orders| x |brands-per-order| (≤ 25 here) — and the join is
per-order-key, so pair generation never crosses orders. Brand counts
and the order total are tiny broadcast aggregates. At 1e9+ orders the
single lift product ``pair*n_orders*1e6`` approaches int64 — split the
division (``(pair*1e6 div cnt_a) * n_orders div cnt_b``) or compute
lift in milli instead of ppm there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table
from the_movies_db_spark.queries import register

_ORACLE = """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM ob),
bc AS (SELECT brand, CAST(count(*) AS BIGINT) AS cnt FROM ob GROUP BY 1),
pr AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(count(*) AS BIGINT) AS pair_count
  FROM ob a JOIN ob b ON a.o = b.o AND a.brand < b.brand
  GROUP BY 1, 2
)
SELECT pr.brand_a, pr.brand_b, pr.pair_count,
       CAST(pr.pair_count * 1000000 // n.n_orders AS BIGINT) AS support_ppm,
       CAST((pr.pair_count * n.n_orders * 1000000) // (ca.cnt * cb.cnt)
            AS BIGINT) AS lift_ppm
FROM pr
CROSS JOIN n
JOIN bc ca ON pr.brand_a = ca.brand
JOIN bc cb ON pr.brand_b = cb.brand
"""


@register(
    "basket_brand_pairs",
    _ORACLE,
    doc=(
        "Market-basket brand co-occurrence: distinct (order, brand) "
        "baskets self-joined per order with ordered endpoints, support "
        "and lift as exact integer ppm against broadcast brand counts."
    ),
)
def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n = ob.agg(F.count_distinct("o").cast("bigint").alias("n_orders"))
    bc = ob.groupBy("brand").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.brand") < F.col("b.brand")))
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
    )
    ca = bc.select(F.col("brand").alias("brand_a"), F.col("cnt").alias("cnt_a"))
    cb = bc.select(F.col("brand").alias("brand_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(F.broadcast(n))
        .join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "pair_count",
            F.expr("CAST(pair_count * 1000000 div n_orders AS BIGINT)").alias(
                "support_ppm"
            ),
            F.expr(
                "CAST((pair_count * n_orders * 1000000) div (cnt_a * cnt_b)"
                " AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
