"""Graph analytics over a trade graph derived from the relational
tables: supplier-nation → customer-nation edges (who ships to whom),
built once with broadcast dimension joins, then iterated on.

Two classic distributed-graph operators, both oracle-checked:

- ``graph_pagerank``: fixed-iteration PageRank in integer micro-units.
  Float PageRank cannot hash-match across engines (summation order),
  so ranks are BIGINT trillionths: init = SCALE // n, each step
  rank' = (15*init)//100 + (85 * Σ rank_src//outdeg_src)//100 — all
  floor divisions on positive integers, bit-exact in any engine. The
  oracle unrolls the three iterations as chained CTEs.
- ``graph_triangles``: triangle count per nation on the undirected
  edge set — the standard two-hop self-join with ordered endpoints
  (a < b < c) so each triangle counts once.

Scale design: the edge list is the aggregate artifact (|nations|² at
most — tiny); iterating joins rank-vs-edges is a broadcast join per
step with no growing lineage problem at 3 fixed steps. For billions of
NODES the same loop holds with shuffle joins partitioned by node id +
periodic localCheckpoint — the plan shape is the GraphX/Pregel one,
declared in DataFrames.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table
from the_movies_db_spark.queries import register

_SCALE = 1_000_000_000_000  # ranks in trillionths
_ITERS = 3

_EDGES_SQL = """
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l
      JOIN orders o    ON l.l_orderkey = o.o_orderkey
      JOIN customer c  ON o.o_custkey = c.c_custkey
      JOIN supplier s  ON l.l_suppkey = s.s_suppkey
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .distinct()
    )


def _pagerank_oracle() -> str:
    ranks = "r0"
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg"
        " FROM edges GROUP BY src)",
        "n AS (SELECT count(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({_SCALE} // n.n AS BIGINT) AS rank"
        " FROM nodes, n)",
    ]
    for i in range(1, _ITERS + 1):
        ctes.append(
            f"""r{i} AS (
              SELECT b.node,
                     CAST((15 * ({_SCALE} // b.n)) // 100
                          + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS rank
              FROM (SELECT nodes.node, n.n FROM nodes, n) b
              LEFT JOIN (
                SELECT e.dst AS node, sum(r.rank // d.outdeg) AS contrib
                FROM edges e
                JOIN {ranks} r ON e.src = r.node
                JOIN deg d     ON e.src = d.node
                GROUP BY e.dst
              ) c ON b.node = c.node
            )"""
        )
        ranks = f"r{i}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT nat.n_name AS nation,
               r.rank AS rank_micro,
               round(r.rank / {_SCALE}.0, 8) AS pagerank
        FROM {ranks} r JOIN nation nat ON r.node = nat.n_nationkey
        """
    )


@register(
    "graph_pagerank",
    _pagerank_oracle(),
    doc=(
        "Fixed-iteration PageRank on the supplier→customer nation trade "
        "graph, computed in BIGINT micro-units (floor divisions on "
        "positive integers) so three iterations hash-match the oracle's "
        "unrolled CTEs exactly — float PageRank never can (summation "
        "order). Dangling mass is dropped, matching the oracle. Edge "
        "build = broadcast star joins; each step is one aggregate over "
        "the edge list joined to the current ranks."
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # checkpoints, not cache(): every per-round frame below references
    # edges/nodes/base from several branches, and cache keeps the full
    # lineage in the plan (22 fact scans in plan text pre-round-9)
    # while still re-running everything ABOVE the cached scan per
    # reference. The node-grain artifacts are tiny.
    edges = _edges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    ).localCheckpoint(eager=False)
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = nodes.crossJoin(F.broadcast(n_df)).localCheckpoint(eager=False)
    ranks = base.select(
        "node", F.expr(f"CAST({_SCALE} DIV n AS BIGINT)").alias("rank")
    )
    for _ in range(_ITERS):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("rank DIV outdeg")).alias("contrib"))
        )
        ranks = (
            base
            .join(contrib, "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST((15 * ({_SCALE} DIV n)) DIV 100"
                    " + (85 * COALESCE(contrib, 0)) DIV 100 AS BIGINT)"
                ).alias("rank"),
            )
        )
    nat = load_table(spark, sf_dir, "nation")
    return ranks.join(nat, ranks.node == nat.n_nationkey).select(
        F.col("n_name").alias("nation"),
        F.col("rank").alias("rank_micro"),
        F.round(F.col("rank") / F.lit(float(_SCALE)), 8).alias("pagerank"),
    )


@register(
    "graph_triangles",
    f"""
    WITH dir_edges AS ({_EDGES_SQL}),
    und AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM dir_edges WHERE src <> dst
    ),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM und e1
      JOIN und e2 ON e1.b = e2.a
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT nat.n_name AS nation, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ) t JOIN nation nat ON t.node = nat.n_nationkey
    GROUP BY nat.n_name
    """,
    doc=(
        "Per-nation triangle count on the undirected trade graph: "
        "canonicalize edges to (min,max), two-hop self-join with ordered "
        "endpoints a<b<c so each triangle is generated once, then unpivot "
        "corners to credit each participant. The self-join is an "
        "equi-join on node id — shuffle-partitionable at any node count "
        "(the standard node-iterator algorithm)."
    ),
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    dir_edges = _edges(spark, sf_dir)
    und = (
        dir_edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    e1 = und.select(F.col("a").alias("a"), F.col("b").alias("b"))
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = e1.join(e2, "b").join(
        e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3"))
    ).localCheckpoint(eager=False)  # three corner projections share
    # one execution of the two-hop join
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b")))
        .unionAll(tri.select(F.col("c")))
    )
    nat = load_table(spark, sf_dir, "nation")
    return (
        corners.join(nat, corners.node == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


_BFS_SOURCE = 0
_BFS_MAX_HOPS = 10


@register(
    "graph_bfs_hops",
    f"""
    WITH RECURSIVE e AS ({_EDGES_SQL}),
    r(node, dist) AS (
      SELECT CAST({_BFS_SOURCE} AS BIGINT), CAST(0 AS BIGINT)
      UNION
      SELECT CAST(e.dst AS BIGINT), CAST(r.dist + 1 AS BIGINT)
      FROM r JOIN e ON e.src = r.node
      WHERE r.dist < {_BFS_MAX_HOPS}
    )
    SELECT nat.n_name AS nation, CAST(min(r.dist) AS BIGINT) AS hops
    FROM r JOIN nation nat ON r.node = nat.n_nationkey
    GROUP BY nat.n_name
    """,
    doc=(
        "Single-source shortest hop count (BFS) on the directed trade "
        "graph, iterated TO CONVERGENCE — the complement of "
        "graph_pagerank's fixed iteration count: the loop stops when "
        "(reached count, total distance) is a fixpoint, which the "
        "oracle's recursive CTE reaches by construction. Unreachable "
        "nations are absent on both sides."
    ),
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier-style BFS distances via iterative min-plus relaxation.

    Each round joins the current distance table to the edge list,
    relaxes dist+1 into neighbors, and re-aggregates the min — the
    Pregel step declared in DataFrames. Convergence is detected from
    one tiny driver-side aggregate (reached-count + distance-sum: the
    pair is monotone, so equality == fixpoint); ``localCheckpoint``
    truncates the growing lineage each round, exactly as
    ``dedup.connected_components`` does.

    Scale notes (100 TB / billions of nodes): every round is one
    shuffled equi-join on node id + one aggregate; rounds = graph
    diameter (small-world graphs: <15). The convergence aggregate is
    2 BIGINTs to the driver per round, never the frontier itself. A
    delta-frontier optimization (join only nodes whose dist changed)
    drops per-round cost from |V| to |frontier| when diameters grow."""
    edges = _edges(spark, sf_dir).cache()
    dist = (
        edges.sparkSession.range(1)
        .select(
            F.lit(_BFS_SOURCE).cast("bigint").alias("node"),
            F.lit(0).cast("bigint").alias("dist"),
        )
        .localCheckpoint(eager=True)
    )
    state = (1, 0)  # (reached nodes, sum of distances)
    for _ in range(_BFS_MAX_HOPS):
        relaxed = (
            dist.join(edges, dist.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            .localCheckpoint(eager=True)
        )
        row = dist.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist").alias("s")
        ).collect()[0]
        new_state = (row["n"], row["s"])
        if new_state == state:
            break
        state = new_state
    nat = load_table(spark, sf_dir, "nation")
    return (
        dist.join(nat, dist.node == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.min("dist").cast("bigint").alias("hops"))
    )


@register(
    "graph_degree_hist",
    """
    WITH deg AS (
      SELECT l.l_suppkey AS supp,
             CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY l.l_suppkey
    )
    SELECT CAST(length(bin(d)) AS BIGINT) AS degree_bits,
           CAST(count(*) AS BIGINT)       AS n_suppliers,
           CAST(min(d) AS BIGINT)         AS min_degree,
           CAST(max(d) AS BIGINT)         AS max_degree,
           CAST(sum(d) AS BIGINT)         AS total_edges
    FROM deg GROUP BY 1
    """,
    doc=(
        "Degree distribution of the customer-supplier trade graph in "
        "power-of-two buckets — the heavy-tail check that decides "
        "whether graph joins need skew handling (a supplier whose "
        "bucket sits orders of magnitude above the median is the "
        "salting candidate). The log2 bucket is length(bin(d)) — "
        "pure integer in both engines, no float log boundary risk."
    ),
)
def graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two degree histogram over the bipartite trade graph.

    Scale notes (100 TB): degrees are one distinct-count aggregate
    keyed on the supplier (the fact shuffles once); the histogram is a
    second aggregate over |suppliers| rows into ~64 buckets max. This
    is the profile_skew companion for graph workloads — run it BEFORE
    choosing between plain, salted, or vertex-cut joins."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    deg = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_suppkey").alias("supp"))
        .agg(F.countDistinct("o_custkey").cast("bigint").alias("d"))
    )
    return deg.groupBy(
        F.length(F.bin("d")).cast("bigint").alias("degree_bits")
    ).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.min("d").cast("bigint").alias("min_degree"),
        F.max("d").cast("bigint").alias("max_degree"),
        F.sum("d").cast("bigint").alias("total_edges"),
    )


# ---------------------------------------------------------------------------
# Link prediction: common-neighbor Jaccard over the bipartite trade graph
# ---------------------------------------------------------------------------

_LINK_TOP = 20


#: broadcast the kept-customer filter when the customer dimension is
#: bounded (one hash table per executor beats re-shuffling the edge
#: list); past this, fall back to the shuffle join — the pair join
#: shuffles on the same key, so the exchange aligns either way.
_KEEP_BCAST_MAX = 4_000_000


def _edge_cap(e):
    """One scalar agg over the checkpointed edges: (df-cap, n_customers).

    The cap uses the identical integer formula as the oracles
    (greatest(64, 8 * mean degree)); n_customers drives the
    broadcast-vs-shuffle switch for the keep filter."""
    row = e.agg(
        F.expr(
            "greatest(64L, 8 * (count(*) div count(DISTINCT c)))"
        ).alias("v"),
        F.expr("count(DISTINCT c)").alias("nc"),
    ).collect()[0]
    return int(row["v"]), int(row["nc"])



@register(
    "graph_link_jaccard",
    f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    cap AS (
      SELECT greatest(64, 8 * (count(*) // count(DISTINCT c))) AS v FROM e
    ),
    keep AS (
      SELECT c FROM e GROUP BY c HAVING count(*) <= (SELECT v FROM cap)
    ),
    deg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
    com AS (
      SELECT a.s AS supp_a, b.s AS supp_b, CAST(count(*) AS BIGINT) AS common
      FROM e a JOIN keep k ON a.c = k.c
                JOIN e b ON a.c = b.c AND a.s < b.s
      GROUP BY 1, 2
    )
    SELECT supp_a, supp_b, common, jaccard_ppm, CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT supp_a, supp_b, common,
             CAST(common * 1000000 // (d1.d + d2.d - common) AS BIGINT)
               AS jaccard_ppm,
             row_number() OVER (
               ORDER BY common * 1000000 // (d1.d + d2.d - common) DESC,
                        supp_a, supp_b) AS rk
      FROM com JOIN deg d1 ON com.supp_a = d1.s
               JOIN deg d2 ON com.supp_b = d2.s
    ) t WHERE rk <= {_LINK_TOP}
    """,
    doc=(
        "Link prediction on the bipartite customer-supplier graph: "
        "Jaccard similarity of customer neighborhoods for every "
        "supplier pair sharing at least one customer (common neighbors "
        "via an equi-join on the shared customer — never an all-pairs "
        "product), exact integer ppm, top-20. Hub customers above a "
        "data-derived degree cap (8x the mean, floor 64 — the same "
        "integer formula in both engines) are excluded from pair "
        "generation, bounding per-customer pair fan-out. The "
        "collaborative-filtering / 'suppliers like this one' "
        "primitive."
    ),
)
def graph_link_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 supplier pairs by customer-neighborhood Jaccard.

    Scale notes (100 TB): the distinct edge list is checkpointed once
    (degree table, cap scalar, keep filter and both self-join sides
    would otherwise each re-execute the fact join); pair generation is
    an equi-join keyed on the shared customer, so cost tracks sum of
    per-customer degree². That sum is BOUNDED by the df-cap: customers
    with degree > greatest(64, 8 * mean_degree) are dropped from pair
    generation (the `dedup_ngram_jaccard` max_df recipe — a hub
    customer connected to everything carries no similarity signal and
    would emit deg² pairs into one task). The cap is computed with the
    identical integer formula in Spark (one scalar agg over the
    checkpointed edges) and the DuckDB oracle (scalar subquery), so
    values still hash. Degrees join back broadcast; the top-20 is
    orderBy+limit → TakeOrderedAndProject (distributed partial top-k,
    no global sort), ranked after the cut over 20 rows."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cap, n_cust = _edge_cap(e)
    keep = (
        e.groupBy("c")
        .agg(F.count(F.lit(1)).alias("cd"))
        .filter(F.col("cd") <= F.lit(cap))
        .select("c")
    )
    if n_cust <= _KEEP_BCAST_MAX:
        keep = F.broadcast(keep)
    deg = e.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    a = e.join(keep, "c").select("c", F.col("s").alias("supp_a"))
    # shuffle-hash the pair self-join: the checkpointed edge list has
    # no stats, so the planner falls back to SortMergeJoin and pays
    # two full sorts of the edge list (guide §3.1). The build side is
    # one hash partition of (c, s) pairs — narrow rows, degree-capped
    # fan-out — so the per-partition hash table is bounded at any
    # scale (A/B at sf0.1: 2.4 s -> 1.5 s for the pair stage).
    b = e.select(F.col("c").alias("c2"), F.col("s").alias("supp_b")).hint(
        "shuffle_hash"
    )
    com = (
        a.join(b, (a.c == b.c2) & (F.col("supp_a") < F.col("supp_b")))
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    j = (
        com.join(
            F.broadcast(deg.select(F.col("s"), F.col("d").alias("d1"))),
            F.col("supp_a") == F.col("s"),
        )
        .drop("s")
        .join(
            F.broadcast(deg.select(F.col("s"), F.col("d").alias("d2"))),
            F.col("supp_b") == F.col("s"),
        )
        .drop("s")
        .select(
            "supp_a",
            "supp_b",
            "common",
            F.expr(
                "CAST(common * 1000000 div (d1 + d2 - common) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )
    top = j.orderBy(
        F.desc("jaccard_ppm"), F.asc("supp_a"), F.asc("supp_b")
    ).limit(_LINK_TOP)
    w = Window.orderBy(F.desc("jaccard_ppm"), F.asc("supp_a"), F.asc("supp_b"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


# ---------------------------------------------------------------------------
# k-core peeling on the bipartite trade graph (unrolled rounds)
# ---------------------------------------------------------------------------

_KCORE_ROUNDS = 3

_KCORE_E0 = """
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


def _kcore_oracle() -> str:
    ctes = [
        f"e0 AS ({_KCORE_E0})",
        "th AS (SELECT CAST(count(*) // count(DISTINCT s) AS BIGINT) AS ks,"
        " CAST(count(*) // count(DISTINCT c) AS BIGINT) AS kc FROM e0)",
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        prev = f"e{r - 1}"
        ctes.append(
            f"""s{r} AS (
              SELECT e.* FROM {prev} e
              JOIN (SELECT s FROM {prev} GROUP BY s
                    HAVING count(*) >= (SELECT ks FROM th)) g ON e.s = g.s
            )"""
        )
        ctes.append(
            f"""e{r} AS (
              SELECT e.* FROM s{r} e
              JOIN (SELECT c FROM s{r} GROUP BY c
                    HAVING count(*) >= (SELECT kc FROM th)) g ON e.c = g.c
            )"""
        )
    stats = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round,"
        f" CAST(count(*) AS BIGINT) AS n_edges,"
        f" CAST(count(DISTINCT s) AS BIGINT) AS n_suppliers,"
        f" CAST(count(DISTINCT c) AS BIGINT) AS n_customers FROM e{r}"
        for r in range(_KCORE_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + stats


@register(
    "graph_kcore_peel",
    _kcore_oracle(),
    doc=(
        "Bipartite (ks, kc)-core peeling: suppliers below the mean "
        "supplier degree and customers below the mean customer degree "
        "(both computed once, integer division — the data-derived "
        "fixed k) are alternately removed for three unrolled rounds; "
        "each removal cascades into the next round's degrees. The "
        "dense-core extraction behind spam/bot detection and "
        "engagement tiering, reported as the shrinking "
        "(edges, suppliers, customers) profile per round."
    ),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative degree-threshold peeling with per-round census.

    Scale notes (100 TB): each round is two degree aggregations + two
    semi-joins keyed on the node id — the Pregel peeling step declared
    in DataFrames; per-round ``localCheckpoint`` truncates the growing
    lineage exactly as graph_bfs_hops does (each round's edge set is
    consumed by BOTH the next round and its census row). Rounds are a
    fixed unroll here; production runs to fixpoint with the BFS-style
    2-scalar convergence probe."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    th = e.agg(
        F.expr("CAST(count(*) div count(DISTINCT s) AS BIGINT)").alias("ks"),
        F.expr("CAST(count(*) div count(DISTINCT c) AS BIGINT)").alias("kc"),
    ).collect()[0]
    ks, kc = th["ks"], th["kc"]

    def census(df: DataFrame, r: int) -> DataFrame:
        return df.agg(
            F.lit(r).cast("bigint").alias("round"),
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.countDistinct("s").cast("bigint").alias("n_suppliers"),
            F.countDistinct("c").cast("bigint").alias("n_customers"),
        )

    out = census(e, 0)
    cur = e
    for r in range(1, _KCORE_ROUNDS + 1):
        good_s = cur.groupBy("s").agg(F.count(F.lit(1)).alias("__d")).filter(
            F.col("__d") >= ks
        ).select("s")
        cur = cur.join(good_s, "s")
        good_c = cur.groupBy("c").agg(F.count(F.lit(1)).alias("__d")).filter(
            F.col("__d") >= kc
        ).select("c")
        cur = cur.join(good_c, "c").localCheckpoint(eager=False)
        out = out.unionByName(census(cur, r))
    return out


# ---------------------------------------------------------------------------
# Deterministic random walks: node2vec-style walk corpus generation
# ---------------------------------------------------------------------------

_WALK_STEPS = 3

#: walk-step choice: md5 of "start:step:cur" -> integer -> mod outdeg.
#: Spark extracts the integer with conv(); DuckDB casts the 0x prefix —
#: same BIGINT, so both engines pick the identical neighbor index.
_WALK_SEED_SPARK = (
    "CAST(conv(substr(md5(concat(CAST(start AS STRING), ':', "
    "CAST({step} AS STRING), ':', CAST(cur AS STRING))), 1, 8), 16, 10)"
    " AS BIGINT)"
)
_WALK_SEED_DUCK = (
    "CAST(concat('0x', substr(md5(CAST(start AS VARCHAR) || ':' || "
    "CAST({step} AS VARCHAR) || ':' || CAST(cur AS VARCHAR)), 1, 8))"
    " AS BIGINT)"
)


def _walks_oracle() -> str:
    ctes = [
        f"e AS ({_EDGES_SQL})",
        "nbrs AS (SELECT src, list(dst ORDER BY dst) AS nb,"
        " CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src)",
        "w0 AS (SELECT src AS start, src AS cur,"
        " CAST(src AS VARCHAR) AS path FROM nbrs)",
    ]
    for i in range(1, _WALK_STEPS + 1):
        seed = _WALK_SEED_DUCK.format(step=i)
        ctes.append(
            f"""w{i} AS (
              SELECT w.start,
                     n.nb[CAST({seed} % n.deg AS INT) + 1] AS cur,
                     w.path || '>' ||
                       CAST(n.nb[CAST({seed} % n.deg AS INT) + 1]
                            AS VARCHAR) AS path
              FROM w{i - 1} w JOIN nbrs n ON w.cur = n.src
            )"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT nat.n_name AS start_nation, w.path AS walk_path,
               CAST(w.cur AS BIGINT) AS end_node
        FROM w{_WALK_STEPS} w JOIN nation nat ON w.start = nat.n_nationkey
        """
    )


@register(
    "graph_random_walks",
    _walks_oracle(),
    doc=(
        "Deterministic random-walk corpus over the trade graph: one "
        "3-step walk per start node, each step choosing among the "
        "sorted neighbors by an md5-seeded index (seed = start:step:"
        "current, so the walk corpus is reproducible and value-hash "
        "verifiable — swap the seed for a real RNG in production). "
        "This is the node2vec/DeepWalk sampling stage that turns a "
        "graph into skip-gram training data."
    ),
)
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded 3-step walks from every node, reproducible across engines.

    Scale notes (100 TB / billions of nodes): the neighbor table is
    the adjacency list keyed by node (one shuffle to build, bounded
    per-node by the sorted neighbor array — cap or sample hub fanouts
    upstream); every step is one equi-join walks-vs-adjacency on the
    current node, so W walks of L steps cost L joins at |W| rows each.
    Walk state carries only (start, cur, path)."""
    edges = _edges(spark, sf_dir)
    nbrs = (
        edges.groupBy("src")
        .agg(
            F.sort_array(F.collect_set("dst")).alias("nb"),
            F.countDistinct("dst").cast("bigint").alias("deg"),
        )
        .localCheckpoint(eager=False)
    )
    walks = nbrs.select(
        F.col("src").alias("start"),
        F.col("src").alias("cur"),
        F.col("src").cast("string").alias("path"),
    )
    for i in range(1, _WALK_STEPS + 1):
        seed = _WALK_SEED_SPARK.format(step=i)
        walks = (
            walks.join(F.broadcast(nbrs), walks.cur == nbrs.src)
            .select(
                "start",
                F.expr(f"nb[CAST({seed} % deg AS INT)]").alias("__next"),
                F.concat(
                    "path", F.lit(">"), F.expr(
                        f"CAST(nb[CAST({seed} % deg AS INT)] AS STRING)"
                    )
                ).alias("path"),
            )
            .withColumnRenamed("__next", "cur")
        )
    nat = load_table(spark, sf_dir, "nation")
    return walks.join(nat, walks.start == nat.n_nationkey).select(
        F.col("n_name").alias("start_nation"),
        F.col("path").alias("walk_path"),
        F.col("cur").cast("bigint").alias("end_node"),
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the bipartite customer-supplier graph
# ---------------------------------------------------------------------------

_ASSORT_MU_X = "(CAST(s_x AS DOUBLE) / CAST(n AS DOUBLE))"
_ASSORT_MU_Y = "(CAST(s_y AS DOUBLE) / CAST(n AS DOUBLE))"
_ASSORT_COV = (
    f"(CAST(s_xy AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - {_ASSORT_MU_X} * {_ASSORT_MU_Y})"
)
_ASSORT_VX = (
    f"(CAST(s_xx AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - {_ASSORT_MU_X} * {_ASSORT_MU_X})"
)
_ASSORT_VY = (
    f"(CAST(s_yy AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - {_ASSORT_MU_Y} * {_ASSORT_MU_Y})"
)
_ASSORT_R = f"({_ASSORT_COV} / sqrt({_ASSORT_VX} * {_ASSORT_VY}))"


@register(
    "graph_degree_assortativity",
    f"""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), d AS (
      SELECT CAST(count(*) OVER (PARTITION BY c) AS BIGINT) AS x,
             CAST(count(*) OVER (PARTITION BY s) AS BIGINT) AS y
      FROM e
    ), g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s_x, CAST(sum(y) AS BIGINT) AS s_y,
             CAST(sum(x * x) AS BIGINT) AS s_xx,
             CAST(sum(y * y) AS BIGINT) AS s_yy,
             CAST(sum(x * y) AS BIGINT) AS s_xy
      FROM d
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           CAST(s_x * 1000000 // n AS BIGINT) AS mean_cust_deg_micro,
           CAST(s_y * 1000000 // n AS BIGINT) AS mean_supp_deg_micro,
           CAST(floor({_ASSORT_R} * 1000000) AS BIGINT)
             AS assortativity_micro
    FROM g
    """,
    doc=(
        "Degree assortativity of the customer-supplier purchase graph: "
        "Pearson correlation of endpoint degrees across edges — "
        "positive means hub customers concentrate on hub suppliers "
        "(fragile supply topology), negative means hubs spread across "
        "the tail. One distinct-edge aggregate, two edge-keyed count "
        "windows, one one-row moment reduce; the correlation is "
        "assembled from exact integer sums via IEEE-identical double "
        "text, floored to micro."
    ),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-endpoint degree correlation on the bipartite graph.

    Scale notes (100 TB): degrees come from count windows OVER THE EDGE
    TABLE (no join back, no second fact scan); everything after the
    distinct-edge aggregate is edge-grain with a single-row reduce.
    Degree products fit BIGINT while max_degree^2 x n_edges < 9e18 —
    at larger scale anchor degrees by their integer means first."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    d = e.select(
        F.count(F.lit(1))
        .over(Window.partitionBy("c"))
        .cast("bigint")
        .alias("x"),
        F.count(F.lit(1))
        .over(Window.partitionBy("s"))
        .cast("bigint")
        .alias("y"),
    )
    g = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s_x"),
        F.sum("y").cast("bigint").alias("s_y"),
        F.sum(F.expr("x * x")).cast("bigint").alias("s_xx"),
        F.sum(F.expr("y * y")).cast("bigint").alias("s_yy"),
        F.sum(F.expr("x * y")).cast("bigint").alias("s_xy"),
    )
    return g.select(
        F.col("n").alias("n_edges"),
        F.expr("CAST(s_x * 1000000 div n AS BIGINT)").alias(
            "mean_cust_deg_micro"
        ),
        F.expr("CAST(s_y * 1000000 div n AS BIGINT)").alias(
            "mean_supp_deg_micro"
        ),
        F.expr(f"CAST(floor({_ASSORT_R} * 1000000) AS BIGINT)").alias(
            "assortativity_micro"
        ),
    )


# ---------------------------------------------------------------------------
# Global clustering coefficient (triangles / wedges)
# ---------------------------------------------------------------------------


@register(
    "graph_clustering_coefficient",
    f"""
    WITH dir_edges AS ({_EDGES_SQL}),
    und AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM dir_edges WHERE src <> dst
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und
      ) t GROUP BY 1
    ),
    tri AS (
      SELECT count(*) AS n_tri
      FROM und e1
      JOIN und e2 ON e1.b = e2.a
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    wed AS (
      SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges,
             CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d) // 2 AS BIGINT) AS n_edges
      FROM deg
    )
    SELECT w.n_nodes, w.n_edges, w.n_wedges,
           CAST(t.n_tri AS BIGINT) AS n_triangles,
           CAST(3 * t.n_tri * 1000000 // w.n_wedges AS BIGINT)
             AS global_cc_ppm
    FROM wed w CROSS JOIN tri t
    """,
    doc=(
        "Global clustering coefficient of the undirected nation trade "
        "graph: 3 x triangles / wedges, where wedges are sum C(deg,2) "
        "over the degree table and triangles come from the oriented "
        "(a<b) edge-join — each triangle counted exactly once, no "
        "direction double-count. The one-number transitivity summary "
        "that separates hub-and-spoke topologies (low cc) from "
        "clique-y ones (high cc); exact integer ppm."
    ),
)
def graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Transitivity = 3*triangles/wedges, all integer.

    Scale notes (100 TB): edges dedupe to the oriented (a<b) set once
    (checkpointed — the triangle join and degree aggregate reuse it,
    zero fact re-reads); the triangle join is the standard oriented
    wedge-close equi-join, never an all-pairs product."""
    und = (
        _edges(spark, sf_dir)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    e2 = und.select(F.col("a").alias("b2a"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("t_a"), F.col("b").alias("t_c"))
    tri = (
        und.join(e2, und.b == e2.b2a)
        .join(e3, (e3.t_a == und.a) & (e3.t_c == e2.c))
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    wed = deg.agg(
        F.expr("CAST(sum(d * (d - 1) div 2) AS BIGINT)").alias("n_wedges"),
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.expr("CAST(sum(d) div 2 AS BIGINT)").alias("n_edges"),
    )
    return wed.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        F.col("n_tri").cast("bigint").alias("n_triangles"),
        F.expr(
            "CAST(3 * n_tri * 1000000 div n_wedges AS BIGINT)"
        ).alias("global_cc_ppm"),
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction (inverse-log-degree weighted common neighbors)
# ---------------------------------------------------------------------------

_AA_TOP = 20

#: per-customer Adamic-Adar weight floor(1e6 / ln(degree)) — floored to
#: an INTEGER at the shared-neighbor grain, so the pair score is an
#: exact integer SUM (a double sum would be aggregation-order
#: dependent); degree >= 2 by construction (a pair needs 2 suppliers).
_AA_W = "CAST(floor(1000000 / ln(CAST(cd AS DOUBLE))) AS BIGINT)"


@register(
    "graph_adamic_adar",
    f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    cap AS (
      SELECT greatest(64, 8 * (count(*) // count(DISTINCT c))) AS v FROM e
    ),
    cdeg AS (SELECT c, CAST(count(*) AS BIGINT) AS cd FROM e GROUP BY 1),
    keep AS (
      SELECT c, {_AA_W} AS w FROM cdeg
      WHERE cd >= 2 AND cd <= (SELECT v FROM cap)
    )
    SELECT supp_a, supp_b, common, score_micro,
           CAST(row_number() OVER (ORDER BY score_micro DESC, supp_a, supp_b)
                AS BIGINT) AS rank
    FROM (
      SELECT a.s AS supp_a, b.s AS supp_b,
             CAST(count(*) AS BIGINT) AS common,
             CAST(sum(k.w) AS BIGINT) AS score_micro
      FROM e a JOIN keep k ON a.c = k.c
               JOIN e b ON a.c = b.c AND a.s < b.s
      GROUP BY 1, 2
    ) t
    ORDER BY score_micro DESC, supp_a, supp_b
    LIMIT {_AA_TOP}
    """,
    doc=(
        "Adamic-Adar link prediction on the bipartite trade graph: "
        "supplier pairs scored by the sum of 1/ln(degree) over shared "
        "customers — rare shared neighbors count more than hubs, the "
        "refinement that beats raw common-neighbor counts on every "
        "link-prediction benchmark. Per-neighbor weights are floored "
        "to integer micro BEFORE the sum (order-free exact "
        "aggregation); hub customers above the data-derived degree "
        "cap are excluded (same formula both engines)."
    ),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 supplier pairs by Adamic-Adar score.

    Scale notes (100 TB): identical shape to graph_link_jaccard — one
    checkpointed distinct edge list, customer-keyed pair equi-join
    bounded by the df-cap, integer weights riding the same shuffle;
    top-20 via orderBy+limit (TakeOrderedAndProject), rank applied to
    the 20 survivors."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cap, n_cust = _edge_cap(e)
    keep = (
        e.groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cd"))
        .filter((F.col("cd") >= 2) & (F.col("cd") <= F.lit(cap)))
        .select("c", F.expr(_AA_W).alias("w"))
    )
    if n_cust <= _KEEP_BCAST_MAX:
        keep = F.broadcast(keep)
    a = e.join(keep, "c").select("c", "w", F.col("s").alias("supp_a"))
    # shuffle-hash for the stats-less pair self-join — same rationale
    # and A/B evidence as graph_link_jaccard
    b = e.select(F.col("c").alias("c2"), F.col("s").alias("supp_b")).hint(
        "shuffle_hash"
    )
    pairs = (
        a.join(b, (a.c == b.c2) & (F.col("supp_a") < F.col("supp_b")))
        .groupBy("supp_a", "supp_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common"),
            F.sum("w").cast("bigint").alias("score_micro"),
        )
    )
    top = pairs.orderBy(
        F.desc("score_micro"), F.asc("supp_a"), F.asc("supp_b")
    ).limit(_AA_TOP)
    w = Window.orderBy(
        F.desc("score_micro"), F.asc("supp_a"), F.asc("supp_b")
    )
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


# ---------------------------------------------------------------------------
# Label propagation communities (synchronous LPA, fixed rounds)
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3
_LPA_TOP = 20
#: label packing base for the argmax-with-min-tie-break trick: the
#: (count, label) argmax becomes max(cnt * M + (M-1-label)) over a
#: single BIGINT — cnt <= degree and labels are supplier keys, so the
#: product is far inside BIGINT here; at id spaces >= 1e9 widen M or
#: switch to a struct max (same semantics, two code points).
_LPA_M = 1000000000


def _lpa_round_sql(prev: str, out: str) -> str:
    """One synchronous LPA update as two shared-shape aggregates."""
    return f"""
    c_{out} AS (
      SELECT u.src, l.lbl, CAST(count(*) AS BIGINT) AS cnt
      FROM und u JOIN {prev} l ON u.dst = l.id GROUP BY 1, 2
    ), {out} AS (
      SELECT src AS id,
             CAST({_LPA_M} - 1 - (max(cnt * {_LPA_M}
                  + ({_LPA_M} - 1 - lbl)) % {_LPA_M}) AS BIGINT) AS lbl
      FROM c_{out} GROUP BY src
    )"""


def _lpa_labels(spark: SparkSession, sf_dir: str):
    """Shared LPA state: (edges, und, labels-after-_LPA_ROUNDS).

    The edge list is customer-bounded (top-2 pivot over a
    customer-keyed window) and eagerly checkpointed once, so the
    rounds iterate over the supplier-grain edge table — never the
    fact. Used by graph_label_propagation (community sizes) and
    graph_modularity_score (partition quality)."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    spend = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"), o.o_custkey == F.col("c_custkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), l.l_suppkey == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(
            F.sum(
                F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            ).cast("bigint").alias("sp")
        )
    )
    rk = spend.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("c").orderBy(F.desc("sp"), F.asc("s"))
        ),
    )
    a = rk.filter("rn = 1").select("c", F.col("s").alias("s1"))
    b = rk.filter("rn = 2").select(F.col("c").alias("c2"), F.col("s").alias("s2"))
    # edges is checkpointed in its own right (not just und):
    # graph_modularity_score consumes edges directly from two branches
    # (edge count, intra-edge join) and without this each branch
    # re-executed the whole 4-table fact subtree. Lazy, not eager —
    # und's eager materialization below computes it, and per-call
    # eager barriers cost ~0.5 s each at sf0.1 (CLAUDE.md lesson).
    edges = (
        a.join(b, a.c == b.c2)
        .select(
            F.least("s1", "s2").alias("sa"),
            F.greatest("s1", "s2").alias("sb"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    und = (
        edges.select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
        .unionAll(edges.select(F.col("sb").alias("src"), F.col("sa").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = und.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").cast("bigint").alias("lbl")
    )
    for r in range(_LPA_ROUNDS):
        cnt = (
            und.join(labels, und.dst == labels.id)
            .groupBy("src", "lbl")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        labels = cnt.groupBy(F.col("src").alias("id")).agg(
            F.expr(
                f"CAST({_LPA_M} - 1 - (max(cnt * {_LPA_M}"
                f" + ({_LPA_M} - 1 - lbl)) % {_LPA_M}) AS BIGINT)"
            ).alias("lbl")
        )
    # The final labels are node-grain and consumed from THREE branches
    # by graph_modularity_score (community sizes + both intra-edge
    # endpoints) — without this (lazy) checkpoint each branch
    # re-executed the whole fixed-round LPA chain (caught by the
    # round-9 scan-budget pin).
    return edges, und, labels.localCheckpoint(eager=False)


@register(
    "graph_label_propagation",
    f"""
    WITH spend AS (
      SELECT o.o_custkey AS c, l.l_suppkey AS s,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sp
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey = s.s_nationkey
      GROUP BY 1, 2
    ), rk AS (
      SELECT c, s,
             row_number() OVER (PARTITION BY c ORDER BY sp DESC, s) AS rn
      FROM spend
    ), edges AS (
      SELECT DISTINCT least(a.s, b.s) AS sa, greatest(a.s, b.s) AS sb
      FROM rk a JOIN rk b ON a.c = b.c AND a.rn = 1 AND b.rn = 2
    ), und AS MATERIALIZED (
      SELECT sa AS src, sb AS dst FROM edges
      UNION ALL
      SELECT sb AS src, sa AS dst FROM edges
    ), l0 AS (
      SELECT DISTINCT src AS id, CAST(src AS BIGINT) AS lbl FROM und
    ), {', '.join(_lpa_round_sql(f'l{i}', f'l{i + 1}') for i in range(_LPA_ROUNDS))},
    sizes AS (
      SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members
      FROM l{_LPA_ROUNDS} GROUP BY 1
      ORDER BY n_members DESC, community LIMIT {_LPA_TOP}
    )
    SELECT community, n_members,
           CAST(row_number() OVER (ORDER BY n_members DESC, community)
                AS BIGINT) AS rank
    FROM sizes
    """,
    doc=(
        "Community detection by synchronous label propagation over the "
        "supplier co-preference graph (each customer contributes one "
        "edge between its top-2 same-nation suppliers by spend, so "
        "|E| <= |customers| by construction — no quadratic pair "
        "stream — and the nation restriction gives the graph real "
        "community structure to recover). "
        f"{_LPA_ROUNDS} fixed synchronous rounds with the deterministic "
        "most-frequent-then-min-label update make both engines "
        "bit-identical; the argmax is a packed-integer max, so every "
        "round is two hash aggregates and one equi-join."
    ),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top communities after fixed-round synchronous LPA.

    Scale notes (100 TB): see _lpa_labels — each round is one
    equi-join on node id plus two combining aggregates over the
    customer-bounded edge list; rounds are fixed (no convergence
    collect). At billion-node scale the same loop holds with the
    packed-label base widened or swapped for a struct max."""
    _, _, labels = _lpa_labels(spark, sf_dir)
    sizes = (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("community"))
        .limit(_LPA_TOP)
    )
    wr = Window.orderBy(F.desc("n_members"), F.asc("community"))
    return sizes.withColumn(
        "rank", F.row_number().over(wr).cast("bigint")
    )


# ---------------------------------------------------------------------------
# HITS hubs/authorities on the bipartite trade graph (integer-exact)
# ---------------------------------------------------------------------------

_HITS_ROUNDS = 2
_HITS_TOP = 20


def _hits_norm(x: str, d: str, div: str) -> str:
    """L1-normalize ``x`` to ppm of ``d`` through three *100 divmod
    stages — every remainder-stage intermediate is <= x*100, so the
    chain never overflows BIGINT no matter how large the raw score
    sums grow (the orders_pareto_gini recipe). Contract: the RESULT
    x*1e6/d must itself fit BIGINT (x/d <= ~9.2e12) — trivially true
    here, where x is a component of its own normalization sum d.
    Pinned exact (== floor(x*1e6/d)) by tests/test_integer_scaling."""
    return (
        f"(({x}) {div} ({d})) * 1000000"
        f" + ((({x}) % ({d})) * 100 {div} ({d})) * 10000"
        f" + (((({x}) % ({d})) * 100 % ({d})) * 100 {div} ({d})) * 100"
        f" + ((((({x}) % ({d})) * 100 % ({d})) * 100 % ({d})) * 100 {div} ({d}))"
    )


def _hits_oracle() -> str:
    half = []
    prev_h = "h0"
    for i in range(1, _HITS_ROUNDS + 1):
        half.append(f"""
    a{i}_raw AS (
      SELECT e.s AS id, CAST(sum(h.score) AS BIGINT) AS raw
      FROM e JOIN {prev_h} h ON e.c = h.id GROUP BY 1
    ), a{i}_tot AS (SELECT CAST(sum(raw) AS BIGINT) AS t FROM a{i}_raw),
    a{i} AS (
      SELECT id, CAST({_hits_norm('raw', 't', '//')} AS BIGINT) AS score
      FROM a{i}_raw CROSS JOIN a{i}_tot
    ),
    h{i}_raw AS (
      SELECT e.c AS id, CAST(sum(a.score) AS BIGINT) AS raw
      FROM e JOIN a{i} a ON e.s = a.id GROUP BY 1
    ), h{i}_tot AS (SELECT CAST(sum(raw) AS BIGINT) AS t FROM h{i}_raw),
    h{i} AS (
      SELECT id, CAST({_hits_norm('raw', 't', '//')} AS BIGINT) AS score
      FROM h{i}_raw CROSS JOIN h{i}_tot
    )""")
        prev_h = f"h{i}"
    return f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    h0 AS (
      SELECT DISTINCT c AS id, CAST(1000000 AS BIGINT) AS score FROM e
    ),{','.join(half)},
    top AS (
      SELECT id AS supplier, score AS authority_ppm
      FROM a{_HITS_ROUNDS}
      ORDER BY score DESC, id LIMIT {_HITS_TOP}
    )
    SELECT supplier, authority_ppm,
           CAST(row_number() OVER (ORDER BY authority_ppm DESC, supplier)
                AS BIGINT) AS rank
    FROM top
    """


@register(
    "graph_hits_bipartite",
    _hits_oracle(),
    doc=(
        "HITS hubs-and-authorities on the bipartite customer-supplier "
        "trade graph: customers are hubs, suppliers authorities, and "
        f"{_HITS_ROUNDS} mutual-reinforcement rounds run entirely in "
        "BIGINT ppm (each L1 normalization is a three-stage *100 "
        "divmod chain, so no intermediate can overflow at any graph "
        "size and both engines' integer arithmetic is identical). "
        "The ranking complement to graph_pagerank: authority scores "
        "weight endorsements by the endorser's hub quality instead "
        "of flattening every edge equally."
    ),
)
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top suppliers by HITS authority after fixed integer rounds.

    Scale notes (100 TB): the distinct edge list is built once and
    eagerly checkpointed; every half-round is one equi-join of the
    edge list to the current score table plus one combining aggregate,
    and each normalization total is a 1-row aggregate joined back by
    broadcast. Rounds are fixed — no driver-side convergence loop."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    h = e.select(F.col("c").alias("id")).distinct().select(
        "id", F.lit(1000000).cast("bigint").alias("score")
    )
    a = None
    # Each half-round's raw score table is checkpointed BEFORE the
    # normalization: the ppm total rides a crossJoin branch whose
    # subtree would otherwise duplicate the raw lineage, DOUBLING the
    # edge-scan count per half-round (22 edge scans at 2 rounds,
    # exponential in rounds — caught by the round-9 scan-budget pin).
    # Lazy (both branches then share ONE runtime artifact, no per-call
    # eager job barrier); the table is id-grain, node-bounded.
    for r in range(_HITS_ROUNDS):
        a_raw = (
            e.join(h.withColumnRenamed("id", "c"), "c")
            .groupBy(F.col("s").alias("id"))
            .agg(F.sum("score").cast("bigint").alias("raw"))
            .localCheckpoint(eager=False)
        )
        a_tot = a_raw.agg(F.sum("raw").cast("bigint").alias("t"))
        a = a_raw.crossJoin(F.broadcast(a_tot)).select(
            "id",
            F.expr(
                f"CAST({_hits_norm('raw', 't', 'div')} AS BIGINT)"
            ).alias("score"),
        )
        if r == _HITS_ROUNDS - 1:
            break  # the final hub half-round is not consumed
        h_raw = (
            e.join(a.withColumnRenamed("id", "s"), "s")
            .groupBy(F.col("c").alias("id"))
            .agg(F.sum("score").cast("bigint").alias("raw"))
            .localCheckpoint(eager=False)
        )
        h_tot = h_raw.agg(F.sum("raw").cast("bigint").alias("t"))
        h = h_raw.crossJoin(F.broadcast(h_tot)).select(
            "id",
            F.expr(
                f"CAST({_hits_norm('raw', 't', 'div')} AS BIGINT)"
            ).alias("score"),
        )
    top = (
        a.select(F.col("id").alias("supplier"), F.col("score").alias("authority_ppm"))
        .orderBy(F.desc("authority_ppm"), F.asc("supplier"))
        .limit(_HITS_TOP)
    )
    wr = Window.orderBy(F.desc("authority_ppm"), F.asc("supplier"))
    return top.withColumn("rank", F.row_number().over(wr).cast("bigint"))


# ---------------------------------------------------------------------------
# Modularity of the LPA partition (community quality, integer-exact)
# ---------------------------------------------------------------------------

_MOD_TOP = 10


@register(
    "graph_modularity_score",
    f"""
    WITH spend AS (
      SELECT o.o_custkey AS c, l.l_suppkey AS s,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sp
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey = s.s_nationkey
      GROUP BY 1, 2
    ), rk AS (
      SELECT c, s,
             row_number() OVER (PARTITION BY c ORDER BY sp DESC, s) AS rn
      FROM spend
    ), edges AS MATERIALIZED (
      SELECT DISTINCT least(a.s, b.s) AS sa, greatest(a.s, b.s) AS sb
      FROM rk a JOIN rk b ON a.c = b.c AND a.rn = 1 AND b.rn = 2
    ), und AS MATERIALIZED (
      SELECT sa AS src, sb AS dst FROM edges
      UNION ALL
      SELECT sb AS src, sa AS dst FROM edges
    ), l0 AS (
      SELECT DISTINCT src AS id, CAST(src AS BIGINT) AS lbl FROM und
    ), {', '.join(_lpa_round_sql(f'l{i}', f'l{i + 1}') for i in range(_LPA_ROUNDS))},
    deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d
            FROM und GROUP BY 1),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
    comm AS (
      SELECT l.lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d.d) AS BIGINT) AS degree_sum
      FROM l{_LPA_ROUNDS} l JOIN deg d ON l.id = d.id GROUP BY 1
    ),
    intra AS (
      SELECT la.lbl AS community, CAST(count(*) AS BIGINT) AS e_c
      FROM edges e
      JOIN l{_LPA_ROUNDS} la ON e.sa = la.id
      JOIN l{_LPA_ROUNDS} lb ON e.sb = lb.id
      WHERE la.lbl = lb.lbl GROUP BY 1
    ),
    contrib AS (
      SELECT c.community, c.n_nodes,
             CAST(coalesce(i.e_c, 0) AS BIGINT) AS intra_edges,
             c.degree_sum,
             CAST(coalesce(i.e_c, 0) * 1000000 // mm.m
                  - (c.degree_sum * 1000 // (2 * mm.m))
                    * (c.degree_sum * 1000 // (2 * mm.m)) AS BIGINT)
               AS contribution_ppm
      FROM comm c LEFT JOIN intra i ON c.community = i.community
      CROSS JOIN mm
    ),
    top AS (
      SELECT * FROM contrib
      ORDER BY contribution_ppm DESC, community LIMIT {_MOD_TOP}
    )
    SELECT community, n_nodes, intra_edges, degree_sum, contribution_ppm
    FROM top
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(coalesce(sum(n_nodes), 0) AS BIGINT),
           CAST(coalesce(sum(intra_edges), 0) AS BIGINT),
           CAST(coalesce(sum(degree_sum), 0) AS BIGINT),
           CAST(coalesce(sum(contribution_ppm), 0) AS BIGINT)
    FROM contrib
    """,
    doc=(
        "Newman modularity of the LPA partition — the quality metric "
        "that closes the community-detection loop: per community, "
        "intra-edge share minus the squared degree fraction (degree "
        "fractions truncated to milli so the squares are exact ppm "
        "integers in both engines), top-10 contributors plus the "
        "community=-1 total row whose contribution_ppm IS the graph's "
        "modularity Q. Positive Q validates the partition; Q near 0 "
        "says the labels are no better than random wiring."
    ),
)
def graph_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community modularity contributions + the Q total row.

    Scale notes (100 TB): reuses _lpa_labels' checkpointed edge list
    (zero fact scans in the returned plan); degrees, community sums
    and intra-edge counts are node/edge-grain equi-joins, and the
    modularity arithmetic runs over |communities| rows."""
    edges, und, labels = _lpa_labels(spark, sf_dir)
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    mm = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    comm = (
        labels.join(deg, "id")
        .groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("d").cast("bigint").alias("degree_sum"),
        )
    )
    la = labels.select(F.col("id").alias("sa"), F.col("lbl").alias("la"))
    lb = labels.select(F.col("id").alias("sb"), F.col("lbl").alias("lb"))
    intra = (
        edges.join(la, "sa")
        .join(lb, "sb")
        .filter("la = lb")
        .groupBy(F.col("la").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    contrib = (
        comm.join(intra, "community", "left_outer")
        .crossJoin(F.broadcast(mm))
        .select(
            "community",
            "n_nodes",
            F.expr("CAST(coalesce(e_c, 0) AS BIGINT)").alias("intra_edges"),
            "degree_sum",
            F.expr(
                "CAST(coalesce(e_c, 0) * 1000000 div m"
                " - (degree_sum * 1000 div (2 * m))"
                "   * (degree_sum * 1000 div (2 * m)) AS BIGINT)"
            ).alias("contribution_ppm"),
        )
        .localCheckpoint(eager=False)
    )
    top = contrib.orderBy(
        F.desc("contribution_ppm"), F.asc("community")
    ).limit(_MOD_TOP)
    total = contrib.agg(
        F.lit(-1).cast("bigint").alias("community"),
        F.expr("CAST(coalesce(sum(n_nodes), 0) AS BIGINT)").alias("n_nodes"),
        F.expr(
            "CAST(coalesce(sum(intra_edges), 0) AS BIGINT)"
        ).alias("intra_edges"),
        F.expr(
            "CAST(coalesce(sum(degree_sum), 0) AS BIGINT)"
        ).alias("degree_sum"),
        F.expr(
            "CAST(coalesce(sum(contribution_ppm), 0) AS BIGINT)"
        ).alias("contribution_ppm"),
    )
    return top.unionByName(total)


# ---------------------------------------------------------------------------
# Local bridges (edges in no triangle) over the co-preference graph
# ---------------------------------------------------------------------------

_BR_TOP = 20
_GRAPH_EDGE_SQL = """
    spend AS (
      SELECT o.o_custkey AS c, l.l_suppkey AS s,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sp
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey = s.s_nationkey
      GROUP BY 1, 2
    ), rk AS (
      SELECT c, s,
             row_number() OVER (PARTITION BY c ORDER BY sp DESC, s) AS rn
      FROM spend
    ), edges AS MATERIALIZED (
      SELECT DISTINCT least(a.s, b.s) AS sa, greatest(a.s, b.s) AS sb
      FROM rk a JOIN rk b ON a.c = b.c AND a.rn = 1 AND b.rn = 2
    ), und AS MATERIALIZED (
      SELECT sa AS src, sb AS dst FROM edges
      UNION ALL
      SELECT sb AS src, sa AS dst FROM edges
    )"""


@register(
    "graph_bridge_edges",
    f"""
    WITH {_GRAPH_EDGE_SQL},
    deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d
            FROM und GROUP BY 1),
    tri AS (
      SELECT e.sa, e.sb
      FROM edges e
      JOIN und u1 ON u1.src = e.sa
      JOIN und u2 ON u2.src = e.sb AND u2.dst = u1.dst
      GROUP BY 1, 2
    ),
    br AS (
      SELECT e.sa, e.sb FROM edges e
      LEFT JOIN tri t ON e.sa = t.sa AND e.sb = t.sb
      WHERE t.sa IS NULL
    ),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bridges FROM br),
    top AS (
      SELECT b.sa, b.sb, da.d AS deg_a, db.d AS deg_b
      FROM br b JOIN deg da ON b.sa = da.id JOIN deg db ON b.sb = db.id
      ORDER BY da.d + db.d DESC, b.sa, b.sb LIMIT {_BR_TOP}
    )
    SELECT sa, sb, deg_a, deg_b,
           CAST(row_number() OVER (ORDER BY deg_a + deg_b DESC, sa, sb)
                AS BIGINT) AS rank,
           nb.n_bridges
    FROM top CROSS JOIN nb
    """,
    doc=(
        "Local bridges — edges whose endpoints share NO common "
        "neighbor (participate in no triangle), i.e. the links whose "
        "removal locally disconnects their neighborhoods; the "
        "classic weak-tie detector (a true-bridge DFS doesn't "
        "distribute, the triangle-free test is the standard scalable "
        "relaxation). Top-20 by combined endpoint degree, plus the "
        "global bridge count on every row."
    ),
)
def graph_bridge_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle-free (local bridge) edges, ranked by endpoint degree.

    Scale notes (100 TB): the triangle probe joins the checkpointed
    edge list to the undirected adjacency twice on node keys — the
    standard per-edge triangle shape (cost ~ sum over edges of
    min endpoint degree, same as graph_clustering_coefficient);
    bridges fall out as an anti-join, degrees as a node-grain
    aggregate, and the bridge count is a 1-row broadcast."""
    edges, und, _ = _lpa_labels(spark, sf_dir)
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    u1 = und.select(F.col("src").alias("sa"), F.col("dst").alias("n"))
    u2 = und.select(F.col("src").alias("sb"), F.col("dst").alias("n"))
    tri = (
        edges.join(u1, "sa").join(u2, ["sb", "n"]).groupBy("sa", "sb").agg(
            F.count(F.lit(1)).alias("cn")
        )
    )
    # the triangle probe is the expensive part — checkpoint its result
    # so the bridge-count and top-k branches don't each re-run it
    br = edges.join(tri, ["sa", "sb"], "left_anti").localCheckpoint(
        eager=False
    )
    nb = br.agg(F.count(F.lit(1)).cast("bigint").alias("n_bridges"))
    da = deg.select(F.col("id").alias("sa"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("id").alias("sb"), F.col("d").alias("deg_b"))
    top = (
        br.join(da, "sa")
        .join(db, "sb")
        .orderBy(
            F.expr("deg_a + deg_b").desc(), F.asc("sa"), F.asc("sb")
        )
        .limit(_BR_TOP)
    )
    w = Window.orderBy(F.expr("deg_a + deg_b").desc(), "sa", "sb")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .crossJoin(F.broadcast(nb))
        .select("sa", "sb", "deg_a", "deg_b", "rank", "n_bridges")
    )


# ---------------------------------------------------------------------------
# Connected components by fixed-round min-label propagation
# ---------------------------------------------------------------------------

_CC_ROUNDS = 6
_CC_TOP = 20


def _cc_round_sql(prev: str, out: str) -> str:
    return f"""
    n_{out} AS (
      SELECT u.src AS id, CAST(min(l.lbl) AS BIGINT) AS m
      FROM und u JOIN {prev} l ON u.dst = l.id GROUP BY 1
    ), {out} AS (
      SELECT l.id, CAST(least(l.lbl, n.m) AS BIGINT) AS lbl
      FROM {prev} l JOIN n_{out} n ON n.id = l.id
    )"""


@register(
    "graph_connected_components",
    f"""
    WITH {_GRAPH_EDGE_SQL},
    l0 AS (
      SELECT DISTINCT src AS id, CAST(src AS BIGINT) AS lbl FROM und
    ), {', '.join(_cc_round_sql(f'l{i}', f'l{i + 1}') for i in range(_CC_ROUNDS))},
    chg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_changed_last
      FROM l{_CC_ROUNDS} a JOIN l{_CC_ROUNDS - 1} b ON a.id = b.id
      WHERE a.lbl <> b.lbl
    ),
    census AS (
      SELECT lbl AS component, CAST(count(*) AS BIGINT) AS n_nodes
      FROM l{_CC_ROUNDS} GROUP BY 1
    ),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_components FROM census),
    top AS (
      SELECT component, n_nodes FROM census
      ORDER BY n_nodes DESC, component LIMIT {_CC_TOP}
    )
    SELECT component, n_nodes,
           CAST(row_number() OVER (ORDER BY n_nodes DESC, component)
                AS BIGINT) AS rank,
           nc.n_components, chg.n_changed_last
    FROM top CROSS JOIN nc CROSS JOIN chg
    """,
    doc=(
        "Connected components by synchronous min-label propagation, "
        f"{_CC_ROUNDS} fixed rounds (each node takes the least of its "
        "own and its neighbors' labels — converges in graph-diameter "
        "rounds). Fixed rounds keep both engines bit-identical with "
        "no driver-side convergence loop; n_changed_last is the "
        "published fixed-point audit (0 = fully converged), so an "
        "unconverged run is VISIBLE in the result, never silent."
    ),
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component census after fixed min-label rounds + convergence audit.

    Scale notes (100 TB): identical per-round shape to LPA — one
    equi-join of the checkpointed adjacency to the node-grain label
    table plus one combining min-aggregate; rounds are fixed. For
    billion-node graphs swap in the standard large-star/small-star
    alternation at the same seam; the census and audit are unchanged."""
    _, und, _ = _lpa_labels(spark, sf_dir)
    l = und.select(F.col("src").alias("id")).distinct().select(  # noqa: E741
        "id", F.col("id").cast("bigint").alias("lbl")
    )
    prev = None
    for _ in range(_CC_ROUNDS):
        nbr = (
            und.join(l.withColumnRenamed("id", "nid"), und.dst == F.col("nid"))
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("lbl").cast("bigint").alias("m"))
        )
        prev = l
        l = (  # noqa: E741
            l.join(nbr, "id")
            .select("id", F.expr("CAST(least(lbl, m) AS BIGINT)").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    chg = (
        l.join(prev.withColumnRenamed("lbl", "lbl_prev"), "id")
        .filter("lbl <> lbl_prev")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_changed_last"))
    )
    census = l.groupBy(F.col("lbl").alias("component")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    ).localCheckpoint(eager=False)
    nc = census.agg(F.count(F.lit(1)).cast("bigint").alias("n_components"))
    top = census.orderBy(F.desc("n_nodes"), F.asc("component")).limit(_CC_TOP)
    w = Window.orderBy(F.desc("n_nodes"), F.asc("component"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(chg))
        .select("component", "n_nodes", "rank", "n_components",
                "n_changed_last")
    )


# ---------------------------------------------------------------------------
# Degree-distribution power-law fit (is the trade graph scale-free?)
# ---------------------------------------------------------------------------


@register(
    "graph_degree_powerlaw_fit",
    """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    deg AS (SELECT c, CAST(count(*) AS BIGINT) AS k FROM e GROUP BY 1),
    hist AS (SELECT k, CAST(count(*) AS BIGINT) AS nk FROM deg GROUP BY 1),
    arr AS (
      SELECT list(struct_pack(k := k, nk := nk) ORDER BY k) AS a FROM hist
    ),
    s AS (
      SELECT CAST(len(a) AS BIGINT) AS n,
             list_aggregate(list_transform(a,
               p -> ln(CAST(p.k AS DOUBLE))), 'sum') AS sx,
             list_aggregate(list_transform(a,
               p -> ln(CAST(p.nk AS DOUBLE))), 'sum') AS sy,
             list_aggregate(list_transform(a,
               p -> ln(CAST(p.k AS DOUBLE)) * ln(CAST(p.nk AS DOUBLE))),
               'sum') AS sxy,
             list_aggregate(list_transform(a,
               p -> ln(CAST(p.k AS DOUBLE)) * ln(CAST(p.k AS DOUBLE))),
               'sum') AS sxx,
             list_aggregate(list_transform(a, p -> p.nk), 'sum') AS nn,
             list_aggregate(list_transform(a, p -> p.k * p.nk), 'sum') AS ne
      FROM arr
    )
    SELECT n AS n_degree_values,
           CAST(nn AS BIGINT) AS n_nodes,
           CAST(ne AS BIGINT) AS sum_degrees,
           CAST(floor((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0)
                      * 1e6) AS BIGINT) AS slope_micro,
           CAST(floor((sy - (n * sxy - sx * sy)
                            / nullif(n * sxx - sx * sx, 0)
                  * sx) / n * 1e6) AS BIGINT) AS intercept_micro
    FROM s
    """,
    doc=(
        "Power-law fit of the customer-side degree distribution on the "
        "bipartite trade graph: OLS slope of ln(count) on ln(degree) "
        "over the degree histogram — the scale-free diagnostic that "
        "decides whether hub-capping (graph_link_jaccard's recipe) is "
        "needed at all (a steep negative slope means heavy hubs are "
        "rare; a flat one means the cap will bite constantly). Every "
        "float sum is a left-to-right fold over the SAME degree-sorted "
        "array on both engines (the text_zipf_slope determinism "
        "discipline)."
    ),
)
def graph_degree_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS log-log fit of the degree histogram.

    Scale notes (100 TB): two combining aggregates (degrees, then the
    degree histogram) reduce the graph to a degree-domain-bounded
    array; the fold runs over that bounded array in one projection.
    The fact is scanned once."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg = e.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    hist = deg.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("nk")
    )
    arr = hist.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("k").alias("k"), F.col("nk").alias("nk"))
            )
        ).alias("a")
    )
    s = arr.select(
        F.size("a").cast("bigint").alias("n"),
        F.expr(
            "aggregate(a, CAST(0 AS DOUBLE),"
            " (acc, p) -> acc + ln(CAST(p.k AS DOUBLE)))"
        ).alias("sx"),
        F.expr(
            "aggregate(a, CAST(0 AS DOUBLE),"
            " (acc, p) -> acc + ln(CAST(p.nk AS DOUBLE)))"
        ).alias("sy"),
        F.expr(
            "aggregate(a, CAST(0 AS DOUBLE),"
            " (acc, p) -> acc + ln(CAST(p.k AS DOUBLE))"
            " * ln(CAST(p.nk AS DOUBLE)))"
        ).alias("sxy"),
        F.expr(
            "aggregate(a, CAST(0 AS DOUBLE),"
            " (acc, p) -> acc + ln(CAST(p.k AS DOUBLE))"
            " * ln(CAST(p.k AS DOUBLE)))"
        ).alias("sxx"),
        F.expr("aggregate(a, 0L, (acc, p) -> acc + p.nk)").alias("nn"),
        F.expr("aggregate(a, 0L, (acc, p) -> acc + p.k * p.nk)").alias("ne"),
    )
    return s.select(
        F.col("n").alias("n_degree_values"),
        F.col("nn").cast("bigint").alias("n_nodes"),
        F.col("ne").cast("bigint").alias("sum_degrees"),
        F.expr(
            "CAST(floor((n * sxy - sx * sy)"
            " / nullif(n * sxx - sx * sx, 0) * 1e6) AS BIGINT)"
        ).alias("slope_micro"),
        F.expr(
            "CAST(floor((sy - (n * sxy - sx * sy)"
            " / nullif(n * sxx - sx * sx, 0) * sx) / n * 1e6) AS BIGINT)"
        ).alias("intercept_micro"),
    )


# ---------------------------------------------------------------------------
# Personalized PageRank (seed-restart random walk with teleport to seeds)
# ---------------------------------------------------------------------------

_PPR_REGION = "ASIA"


def _ppr_oracle() -> str:
    ranks = "r0"
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg"
        " FROM edges GROUP BY src)",
        f"""seeds AS (
          SELECT n_nationkey AS node FROM nation
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = '{_PPR_REGION}'
        )""",
        "s AS (SELECT count(*) AS s FROM seeds)",
        f"""r0 AS (
          SELECT nodes.node,
                 CAST(CASE WHEN seeds.node IS NOT NULL
                      THEN {_SCALE} // s.s ELSE 0 END AS BIGINT) AS rank
          FROM nodes LEFT JOIN seeds ON nodes.node = seeds.node, s
        )""",
    ]
    for i in range(1, _ITERS + 1):
        ctes.append(
            f"""r{i} AS (
              SELECT b.node,
                     CAST(CASE WHEN b.is_seed = 1
                          THEN (15 * ({_SCALE} // b.s)) // 100 ELSE 0 END
                          + (85 * COALESCE(c.contrib, 0)) // 100
                          AS BIGINT) AS rank
              FROM (SELECT nodes.node,
                           CASE WHEN seeds.node IS NOT NULL THEN 1 ELSE 0 END
                             AS is_seed, s.s
                    FROM nodes LEFT JOIN seeds ON nodes.node = seeds.node,
                         s) b
              LEFT JOIN (
                SELECT e.dst AS node, sum(r.rank // d.outdeg) AS contrib
                FROM edges e
                JOIN {ranks} r ON e.src = r.node
                JOIN deg d     ON e.src = d.node
                GROUP BY e.dst
              ) c ON b.node = c.node
            )"""
        )
        ranks = f"r{i}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT nat.n_name AS nation,
               CAST(CASE WHEN sd.node IS NOT NULL THEN 1 ELSE 0 END
                    AS BIGINT) AS is_seed,
               r.rank AS ppr_micro
        FROM {ranks} r
        JOIN nation nat ON r.node = nat.n_nationkey
        LEFT JOIN seeds sd ON r.node = sd.node
        ORDER BY ppr_micro DESC, nation
        """
    )


@register(
    "graph_personalized_pagerank",
    _ppr_oracle(),
    doc=(
        "Personalized PageRank on the trade graph: the teleport vector "
        "is concentrated on a SEED set (nations of one region) instead "
        "of uniform — the recommendation/affinity primitive ('which "
        "nations does ASIA's trade gravity pull hardest'). Same "
        "integer-trillionths arithmetic as graph_pagerank (floor "
        "divisions on non-negative integers, bit-exact cross-engine); "
        "the oracle unrolls the iterations as chained CTEs with the "
        "seed-conditional restart term."
    ),
)
def graph_personalized_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seed-restart PageRank in integer micro-units.

    Scale notes (100 TB): identical plan shape to graph_pagerank —
    per-iteration one edge-keyed join + one aggregate over the
    node-grain rank table, with every shared artifact (edges, nodes,
    deg, seed flags) lazily checkpointed ONCE so no branch re-derives
    the 4-table fact subtree (the round-9 census class). Seeds are a
    broadcast dimension join."""
    edges = _edges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    ).localCheckpoint(eager=False)
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    seeds = (
        nat.join(
            F.broadcast(reg.filter(F.col("r_name") == _PPR_REGION)),
            nat.n_regionkey == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("node"))
    )
    s_df = seeds.agg(F.count(F.lit(1)).alias("s"))
    base = (
        nodes.join(
            F.broadcast(seeds.withColumn("is_seed", F.lit(1))),
            "node", "left",
        )
        .select("node", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
        .crossJoin(F.broadcast(s_df))
        .localCheckpoint(eager=False)
    )
    ranks = base.select(
        "node",
        F.expr(
            f"CAST(CASE WHEN is_seed = 1 THEN {_SCALE} DIV s"
            " ELSE 0 END AS BIGINT)"
        ).alias("rank"),
    )
    for _ in range(_ITERS):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("rank DIV outdeg")).alias("contrib"))
        )
        ranks = (
            base.join(contrib, "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST(CASE WHEN is_seed = 1"
                    f" THEN (15 * ({_SCALE} DIV s)) DIV 100 ELSE 0 END"
                    " + (85 * COALESCE(contrib, 0)) DIV 100 AS BIGINT)"
                ).alias("rank"),
            )
        )
    return (
        ranks.join(base.select("node", "is_seed"), "node")
        .join(nat, ranks.node == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("is_seed").cast("bigint"),
            F.col("rank").alias("ppr_micro"),
        )
        .orderBy(F.desc("ppr_micro"), F.asc("nation"))
    )


# ---------------------------------------------------------------------------
# Sampled triangle counting (the estimator that replaces exact counting
# when the edge list itself is too large to self-join three ways)
# ---------------------------------------------------------------------------

_TRI_SAMPLE_K = 2  # keep each edge with probability 1/K (md5-derived)
_TRI_EDGE_BIT = (
    "conv(substr(md5(concat(CAST(sa AS STRING), ':', CAST(sb AS STRING))),"
    " 1, 4), 16, 10)"
)
_TRI_EDGE_BIT_DUCK = (
    "CAST(concat('0x', substr(md5(CAST(sa AS VARCHAR) || ':' ||"
    " CAST(sb AS VARCHAR)), 1, 4)) AS BIGINT)"
)


@register(
    "graph_triangle_sample_estimate",
    f"""
    WITH spend AS (
      SELECT o.o_custkey AS c, l.l_suppkey AS s,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sp
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey = s.s_nationkey
      GROUP BY 1, 2
    ), rk AS (
      SELECT c, s,
             row_number() OVER (PARTITION BY c ORDER BY sp DESC, s) AS rn
      FROM spend
    ), edges AS MATERIALIZED (
      SELECT DISTINCT least(a.s, b.s) AS sa, greatest(a.s, b.s) AS sb
      FROM rk a JOIN rk b ON a.c = b.c AND a.rn = 1 AND b.rn = 2
    ), samp AS MATERIALIZED (
      SELECT sa, sb FROM edges
      WHERE {_TRI_EDGE_BIT_DUCK} % {_TRI_SAMPLE_K} = 0
    ), tri AS (
      SELECT count(*) AS t FROM edges e1
      JOIN edges e2 ON e1.sb = e2.sa
      JOIN edges e3 ON e3.sa = e1.sa AND e3.sb = e2.sb
    ), tris AS (
      SELECT count(*) AS ts FROM samp e1
      JOIN samp e2 ON e1.sb = e2.sa
      JOIN samp e3 ON e3.sa = e1.sa AND e3.sb = e2.sb
    ), ne AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
             (SELECT CAST(count(*) AS BIGINT) FROM samp) AS n_sampled_edges
    )
    SELECT n_edges, n_sampled_edges,
           CAST(t AS BIGINT) AS exact_triangles,
           CAST(ts AS BIGINT) AS sampled_triangles,
           CAST(ts * {_TRI_SAMPLE_K ** 3} AS BIGINT) AS estimate_triangles,
           CAST(CASE WHEN t = 0 THEN NULL ELSE
                (abs(ts * {_TRI_SAMPLE_K ** 3} - t) // t) * 1000
                + (abs(ts * {_TRI_SAMPLE_K ** 3} - t) % t) * 1000 // t
                END AS BIGINT) AS err_milli
    FROM ne, tri, tris
    """,
    doc=(
        "Edge-sampled triangle-count estimator on the supplier "
        "co-preference graph: keep each undirected edge with "
        "probability 1/k (deterministic md5 coin on the edge key), "
        "count triangles in the sampled subgraph, scale by k^3 — the "
        "estimator that replaces the exact three-way self-join when "
        "the edge list is petabyte-scale — next to the EXACT count and "
        "the realised error, so the estimator's variance is observable "
        "rather than assumed."
    ),
)
def graph_triangle_sample_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact vs k^3-scaled sampled triangle counts.

    Scale notes (100 TB): the sampled self-join touches (1/k)^2 of
    the edge-pair space and (1/k)^3 of the triangle space — the knob
    that keeps wedge checking feasible on petabyte edge lists; both
    counts here share ONE checkpointed edge artifact so the fact
    subtree executes once (round-9 census discipline)."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    spend = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"),
              o.o_custkey == F.col("c_custkey"))
        .join(supp.select("s_suppkey", "s_nationkey"),
              l.l_suppkey == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(
            F.sum(
                F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            ).cast("bigint").alias("sp")
        )
    )
    rk = spend.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("c").orderBy(F.desc("sp"), F.asc("s"))
        ),
    )
    a = rk.filter("rn = 1").select("c", F.col("s").alias("s1"))
    b = rk.filter("rn = 2").select(F.col("c").alias("c2"), F.col("s").alias("s2"))
    edges = (
        a.join(b, a.c == b.c2)
        .select(
            F.least("s1", "s2").alias("sa"),
            F.greatest("s1", "s2").alias("sb"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    samp = edges.filter(
        F.expr(f"{_TRI_EDGE_BIT} % {_TRI_SAMPLE_K} = 0")
    ).localCheckpoint(eager=False)

    def tri_count(e: DataFrame, out: str) -> DataFrame:
        e1 = e.select(F.col("sa").alias("a"), F.col("sb").alias("b"))
        e2 = e.select(F.col("sa").alias("b2"), F.col("sb").alias("c"))
        e3 = e.select(F.col("sa").alias("a3"), F.col("sb").alias("c3"))
        return (
            e1.join(e2, F.col("b") == F.col("b2"))
            .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    t = tri_count(edges, "exact_triangles")
    ts = tri_count(samp, "sampled_triangles")
    ne = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    ns = samp.agg(F.count(F.lit(1)).cast("bigint").alias("n_sampled_edges"))
    k3 = _TRI_SAMPLE_K ** 3
    return (
        ne.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(ts))
        .select(
            "n_edges", "n_sampled_edges", "exact_triangles",
            "sampled_triangles",
            F.expr(f"CAST(sampled_triangles * {k3} AS BIGINT)")
            .alias("estimate_triangles"),
            F.expr(
                f"CAST(CASE WHEN exact_triangles = 0 THEN NULL ELSE"
                f" (abs(sampled_triangles * {k3} - exact_triangles)"
                f" DIV exact_triangles) * 1000"
                f" + (abs(sampled_triangles * {k3} - exact_triangles)"
                f" % exact_triangles) * 1000 DIV exact_triangles"
                " END AS BIGINT)"
            ).alias("err_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-seed BFS eccentricity (diameter lower bound by sampling sources)
# ---------------------------------------------------------------------------

_DIAM_SEEDS = 4
_DIAM_ROUNDS = 6
_DIAM_EDGES_SQL = """
      SELECT o.o_custkey AS c, l.l_suppkey AS s,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sp
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey = s.s_nationkey
      GROUP BY 1, 2
"""


def _diam_oracle() -> str:
    ctes = [
        f"spend AS ({_DIAM_EDGES_SQL})",
        """rk AS (
          SELECT c, s,
                 row_number() OVER (PARTITION BY c ORDER BY sp DESC, s) AS rn
          FROM spend
        )""",
        """edges AS MATERIALIZED (
          SELECT DISTINCT least(a.s, b.s) AS sa, greatest(a.s, b.s) AS sb
          FROM rk a JOIN rk b ON a.c = b.c AND a.rn = 1 AND b.rn = 2
        )""",
        """und AS MATERIALIZED (
          SELECT sa AS src, sb AS dst FROM edges
          UNION ALL SELECT sb, sa FROM edges
        )""",
        f"""seeds AS MATERIALIZED (
          SELECT DISTINCT src AS seed FROM und ORDER BY 1
          LIMIT {_DIAM_SEEDS}
        )""",
        "d0 AS MATERIALIZED (SELECT seed, seed AS node,"
        " CAST(0 AS BIGINT) AS dist FROM seeds)",
    ]
    prev = "d0"
    for k in range(1, _DIAM_ROUNDS + 1):
        ctes.append(
            f"""d{k} AS MATERIALIZED (
              SELECT seed, node, CAST(min(dist) AS BIGINT) AS dist FROM (
                SELECT seed, node, dist FROM {prev}
                UNION ALL
                SELECT d.seed, u.dst AS node, d.dist + 1
                FROM {prev} d JOIN und u ON d.node = u.src
              ) x GROUP BY 1, 2
            )"""
        )
        prev = f"d{k}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
        , per AS (
          SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
                 CAST(max(dist) AS BIGINT) AS eccentricity
          FROM {prev} GROUP BY 1
        )
        SELECT seed, n_reached, eccentricity,
               CAST(max(eccentricity) OVER () AS BIGINT) AS diameter_lb
        FROM per
        ORDER BY seed
        """
    )


@register(
    "graph_diameter_estimate",
    _diam_oracle(),
    doc=(
        "Diameter lower bound by multi-seed BFS: eccentricities of 4 "
        "sampled sources on the supplier co-preference graph (6 "
        "min-plus relaxation rounds, all seeds advanced in ONE "
        "(seed, node)-keyed distance table — a single join per round "
        "for the whole seed set, not per seed). max(eccentricity) is "
        "the standard sampled diameter lower bound used when the exact "
        "all-pairs diameter is infeasible."
    ),
)
def graph_diameter_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-seed BFS eccentricity + sampled diameter lower bound.

    Scale notes (100 TB): per round ONE equi-join of the (seed,
    node)-keyed frontier against the checkpointed edge artifact + one
    min-aggregate; state size is |seeds| x |reached|. Rounds are
    fixed; each round's table is lazily checkpointed so no branch
    re-derives the fact subtree (round-9 census class)."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    spend = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"),
              o.o_custkey == F.col("c_custkey"))
        .join(supp.select("s_suppkey", "s_nationkey"),
              l.l_suppkey == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(
            F.sum(
                F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            ).cast("bigint").alias("sp")
        )
    )
    rk = spend.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("c").orderBy(F.desc("sp"), F.asc("s"))
        ),
    )
    a = rk.filter("rn = 1").select("c", F.col("s").alias("s1"))
    b = rk.filter("rn = 2").select(F.col("c").alias("c2"), F.col("s").alias("s2"))
    edges = (
        a.join(b, a.c == b.c2)
        .select(F.least("s1", "s2").alias("sa"),
                F.greatest("s1", "s2").alias("sb"))
        .distinct()
    )
    und = (
        edges.select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
        .unionAll(edges.select(F.col("sb").alias("src"),
                               F.col("sa").alias("dst")))
        .localCheckpoint(eager=False)
    )
    seeds = (
        und.select(F.col("src").alias("seed")).distinct()
        .orderBy("seed").limit(_DIAM_SEEDS)
    )
    dist = seeds.select(
        "seed", F.col("seed").alias("node"),
        F.lit(0).cast("bigint").alias("dist"),
    ).localCheckpoint(eager=False)
    for _ in range(_DIAM_ROUNDS):
        relaxed = dist.join(und, dist.node == und.src).select(
            "seed", F.col("dst").alias("node"),
            (F.col("dist") + 1).alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("seed", "node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            .localCheckpoint(eager=False)
        )
    per = dist.groupBy("seed").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reached"),
        F.max("dist").cast("bigint").alias("eccentricity"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "seed", "n_reached", "eccentricity",
        F.max("eccentricity").over(w).cast("bigint").alias("diameter_lb"),
    ).orderBy("seed")


# ---------------------------------------------------------------------------
# Rich-club coefficient (do high-degree nodes preferentially interlink?)
# ---------------------------------------------------------------------------


@register(
    "graph_richclub_coefficient",
    f"""
    WITH spend AS ({_DIAM_EDGES_SQL}),
    rk AS (
      SELECT c, s,
             row_number() OVER (PARTITION BY c ORDER BY sp DESC, s) AS rn
      FROM spend
    ),
    edges AS MATERIALIZED (
      SELECT DISTINCT least(a.s, b.s) AS sa, greatest(a.s, b.s) AS sb
      FROM rk a JOIN rk b ON a.c = b.c AND a.rn = 1 AND b.rn = 2
    ),
    deg AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT sa AS node FROM edges UNION ALL SELECT sb FROM edges
      ) GROUP BY 1
    ),
    dh AS (
      SELECT d, CAST(count(*) AS BIGINT) AS nd FROM deg GROUP BY 1
    ),
    em AS (
      SELECT least(da.d, db.d) AS m, CAST(count(*) AS BIGINT) AS ne
      FROM edges e
      JOIN deg da ON e.sa = da.node
      JOIN deg db ON e.sb = db.node
      GROUP BY 1
    ),
    ks AS (SELECT DISTINCT d AS k FROM deg),
    per AS (
      SELECT k.k,
             (SELECT CAST(coalesce(sum(nd), 0) AS BIGINT) FROM dh
              WHERE d > k.k) AS n_k,
             (SELECT CAST(coalesce(sum(ne), 0) AS BIGINT) FROM em
              WHERE m > k.k) AS e_k
      FROM ks k
    )
    SELECT CAST(k AS BIGINT) AS degree_threshold, n_k, e_k,
           CAST(CASE WHEN n_k >= 2
                THEN 2 * e_k * 1000000 // (n_k * (n_k - 1)) END AS BIGINT)
             AS density_ppm
    FROM per
    WHERE n_k >= 2
    ORDER BY degree_threshold
    """,
    doc=(
        "Rich-club coefficient on the supplier co-preference graph: "
        "for every degree threshold k, the edge density among nodes "
        "with degree > k — rising density with k means hubs "
        "preferentially interlink (the rich-club effect), the "
        "structural signal behind hub-capping decisions. Computed "
        "WITHOUT per-threshold passes: each edge is attributed to its "
        "min-endpoint-degree once, then every threshold reads a "
        "suffix sum over the bounded degree domain."
    ),
)
def graph_richclub_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-threshold sweep of hub-subgraph density.

    Scale notes (100 TB): one edge pass for degrees, one for
    min-endpoint-degree attribution; the sweep is a suffix-cumsum
    window over the DEGREE DOMAIN (bounded), never |thresholds| x
    |edges| work."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    spend = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"),
              o.o_custkey == F.col("c_custkey"))
        .join(supp.select("s_suppkey", "s_nationkey"),
              l.l_suppkey == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(
            F.sum(
                F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            ).cast("bigint").alias("sp")
        )
    )
    rk = spend.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("c").orderBy(F.desc("sp"), F.asc("s"))
        ),
    )
    a = rk.filter("rn = 1").select("c", F.col("s").alias("s1"))
    b = rk.filter("rn = 2").select(F.col("c").alias("c2"), F.col("s").alias("s2"))
    edges = (
        a.join(b, a.c == b.c2)
        .select(F.least("s1", "s2").alias("sa"),
                F.greatest("s1", "s2").alias("sb"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("sa").alias("node"))
        .unionAll(edges.select(F.col("sb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .localCheckpoint(eager=False)
    )
    dh = deg.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    em = (
        edges.join(deg.withColumnRenamed("node", "sa")
                   .withColumnRenamed("d", "da"), "sa")
        .join(deg.withColumnRenamed("node", "sb")
              .withColumnRenamed("d", "db"), "sb")
        .groupBy(F.least("da", "db").alias("m"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("ne"))
    )
    # suffix sums over the bounded degree domain: full outer join the
    # two histograms on the domain value, then a DESC cumulative window
    dom = dh.select(F.col("d").alias("v"), "nd").join(
        em.select(F.col("m").alias("v"), "ne"), "v", "full_outer"
    ).select(
        "v",
        F.coalesce("nd", F.lit(0)).alias("nd"),
        F.coalesce("ne", F.lit(0)).alias("ne"),
    )
    wdesc = Window.orderBy(F.desc("v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dom.select(
        "v",
        (F.sum("nd").over(wdesc) - F.col("nd")).cast("bigint").alias("n_gt"),
        (F.sum("ne").over(wdesc) - F.col("ne")).cast("bigint").alias("e_gt"),
    )
    ks = deg.select(F.col("d").alias("k")).distinct()
    per = ks.join(cum, ks.k == cum.v).select(
        F.col("k").cast("bigint").alias("degree_threshold"),
        F.col("n_gt").alias("n_k"),
        F.col("e_gt").alias("e_k"),
    )
    return (
        per.filter(F.col("n_k") >= 2)
        .select(
            "degree_threshold", "n_k", "e_k",
            F.expr(
                "CAST(2 * e_k * 1000000 div (n_k * (n_k - 1)) AS BIGINT)"
            ).alias("density_ppm"),
        )
        .orderBy("degree_threshold")
    )


# ---------------------------------------------------------------------------
# Harmonic centrality (all-pairs BFS, exact integer reciprocal distances)
# ---------------------------------------------------------------------------

_HC_MAX_HOPS = 12


@register(
    "graph_harmonic_centrality",
    f"""
    WITH RECURSIVE e AS ({_EDGES_SQL}),
    nodes AS (
      SELECT DISTINCT src AS node FROM e
      UNION SELECT DISTINCT dst FROM e
    ),
    r(src, node, dist) AS (
      SELECT CAST(node AS BIGINT), CAST(node AS BIGINT),
             CAST(0 AS BIGINT)
      FROM nodes
      UNION
      SELECT r.src, CAST(e.dst AS BIGINT), CAST(r.dist + 1 AS BIGINT)
      FROM r JOIN e ON e.src = r.node
      WHERE r.dist < {_HC_MAX_HOPS}
    ),
    d AS (
      SELECT src, node, CAST(min(dist) AS BIGINT) AS dist
      FROM r GROUP BY 1, 2
    ),
    h AS (
      SELECT node,
             CAST(count(*) AS BIGINT) AS n_sources,
             CAST(sum(1000000 // dist) AS BIGINT) AS harmonic_micro
      FROM d WHERE src <> node GROUP BY 1
    )
    SELECT nat.n_name AS nation, h.n_sources, h.harmonic_micro
    FROM h JOIN nation nat ON h.node = nat.n_nationkey
    ORDER BY harmonic_micro DESC, nation
    """,
    doc=(
        "Harmonic centrality on the directed trade graph: h(v) = "
        "sum over sources u of 1/d(u, v), the centrality that stays "
        "well-defined on DISCONNECTED graphs (unreachable pairs "
        "contribute 0 instead of breaking the closeness average). "
        "Distances from an all-pairs min-plus BFS fixpoint; "
        "reciprocals as exact floor(1e6/d) integers."
    ),
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs BFS harmonic centrality via multi-source relaxation.

    Scale notes (100 TB): the edge list is the nation-grain DISTINCT
    of the fact join (25 nodes here) — the all-pairs state is
    |V|^2-bounded and this formulation is for analytics graphs whose
    VERTEX set is aggregated (nation/brand/segment grain). For
    billion-node graphs swap the all-pairs seed for a sampled source
    panel (the graph_diameter_estimate shape: same loop, k seeds).
    Every round is one equi-join + one min-aggregate off an
    eagerly-checkpointed state (lineage stays flat); the fixpoint
    audit is 2 scalars to the driver per round."""
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    dist = nodes.select(
        F.col("node").cast("bigint").alias("src"),
        F.col("node").cast("bigint").alias("node"),
        F.lit(0).cast("bigint").alias("dist"),
    ).localCheckpoint(eager=True)
    state = (-1, -1)
    for _ in range(_HC_MAX_HOPS):
        relaxed = dist.join(edges, dist.node == edges.src).select(
            dist.src.alias("src"),
            F.col("dst").cast("bigint").alias("node"),
            (F.col("dist") + 1).cast("bigint").alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("src", "node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            .localCheckpoint(eager=True)
        )
        row = dist.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist").alias("s")
        ).collect()[0]
        new_state = (row["n"], row["s"])
        if new_state == state:
            break
        state = new_state
    nat = load_table(spark, sf_dir, "nation")
    h = (
        dist.filter(F.col("src") != F.col("node"))
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sources"),
            F.expr("CAST(sum(1000000 div dist) AS BIGINT)").alias(
                "harmonic_micro"
            ),
        )
    )
    return (
        h.join(nat, h.node == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"), "n_sources", "harmonic_micro"
        )
        .orderBy(F.desc("harmonic_micro"), "nation")
    )


# ---------------------------------------------------------------------------
# Mergeable 2-hop reach sketch (bottom-k / ADS-HyperANF pattern)
# ---------------------------------------------------------------------------

_RS_K = 64
_RS_SCALE = float(16 ** 15)  # 2^60, exactly representable as a double
_RS_PANEL = "c_custkey % 150 = 7"


@register(
    "graph_reach_sketch",
    f"""
    WITH cs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sk AS (
      SELECT s, h FROM (
        SELECT s, md5(CAST(c AS VARCHAR)) AS h,
               row_number() OVER (PARTITION BY s
                 ORDER BY md5(CAST(c AS VARCHAR))) AS rn
        FROM cs
      ) t WHERE rn <= {_RS_K}
    ),
    panel AS (
      SELECT c_custkey AS pc FROM customer WHERE {_RS_PANEL}
    ),
    merged AS (
      SELECT pc, h,
             row_number() OVER (PARTITION BY pc ORDER BY h) AS rn
      FROM (
        SELECT DISTINCT p.pc, k.h
        FROM panel p
        JOIN cs ON cs.c = p.pc
        JOIN sk k ON k.s = cs.s
      ) u
    ),
    est AS (
      SELECT pc,
             CAST(count(*) AS BIGINT) AS m,
             max(h) FILTER (WHERE rn <= {_RS_K}) AS kth
      FROM merged WHERE rn <= {_RS_K} GROUP BY 1
    ),
    deg AS (
      SELECT p.pc, CAST(count(*) AS BIGINT) AS n_suppliers
      FROM panel p JOIN cs ON cs.c = p.pc GROUP BY 1
    ),
    exact AS (
      SELECT p.pc, CAST(count(DISTINCT c2.c) AS BIGINT) AS exact_reach
      FROM panel p
      JOIN cs c1 ON c1.c = p.pc
      JOIN cs c2 ON c2.s = c1.s
      GROUP BY 1
    )
    SELECT d.pc AS cust_id, d.n_suppliers, x.exact_reach,
           CASE WHEN e.m >= {_RS_K}
                THEN round(CAST({_RS_K} - 1 AS DOUBLE) * {_RS_SCALE!r}
                     / CAST(('0x' || substr(e.kth, 1, 15)) AS BIGINT), 2)
                ELSE CAST(e.m AS DOUBLE) END AS est_reach
    FROM deg d JOIN est e ON d.pc = e.pc JOIN exact x ON d.pc = x.pc
    ORDER BY cust_id
    """,
    doc=(
        "Mergeable 2-hop reach estimation (the ADS/HyperANF pattern "
        "with a bottom-k sketch): each supplier keeps the k minimum "
        "customer hashes; a customer's co-purchase audience is "
        "estimated by MERGING its suppliers' sketches (union + "
        "re-truncate — bottom-k merges losslessly, which is the whole "
        "point) and reading the k-th order statistic. The exact "
        "distinct audience joined alongside shows estimator error "
        "in-query. md5-derived order statistics make even the "
        "estimate value-hash-exact across engines."
    ),
)
def graph_reach_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k merged 2-hop reach vs exact audit (panel-scoped).

    Scale notes (100 TB / billions of nodes): supplier sketches are
    |suppliers| x k rows built in one pass; estimating EVERY node's
    reach costs one equi-join of the adjacency against the sketch
    table plus a per-node top-k — never the quadratic co-customer
    expansion the exact audit runs (panel-only here, dropped in
    production; that asymmetry is precisely what neighborhood
    sketches buy)."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)  # adjacency: 4 consumers
    )
    wsk = Window.partitionBy("s").orderBy("h")
    sk = (
        cs.select("s", F.md5(F.col("c").cast("string")).alias("h"))
        .withColumn("rn", F.row_number().over(wsk))
        .filter(F.col("rn") <= _RS_K)
        .select("s", "h")
    )
    panel = (
        c.filter(F.expr(_RS_PANEL))
        .select(F.col("c_custkey").alias("pc"))
        .localCheckpoint(eager=False)  # tiny panel, 3 consumers
    )
    u = (
        F.broadcast(panel)
        .join(cs, cs.c == F.col("pc"))
        .join(sk, "s")
        .select("pc", "h")
        .distinct()
    )
    wm = Window.partitionBy("pc").orderBy("h")
    est = (
        u.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= _RS_K)
        .groupBy("pc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m"),
            F.max("h").alias("kth"),
        )
    )
    deg = (
        F.broadcast(panel)
        .join(cs, cs.c == F.col("pc"))
        .groupBy("pc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_suppliers"))
    )
    exact = (
        F.broadcast(panel)
        .join(cs.select(F.col("c").alias("c1"), "s"), F.col("c1") == F.col("pc"))
        .join(cs.select(F.col("c").alias("c2"), F.col("s").alias("s2")),
              F.col("s2") == F.col("s"))
        .groupBy("pc")
        .agg(F.countDistinct("c2").cast("bigint").alias("exact_reach"))
    )
    return (
        deg.join(est, "pc")
        .join(exact, "pc")
        .select(
            F.col("pc").alias("cust_id"),
            "n_suppliers",
            "exact_reach",
            F.expr(
                f"CASE WHEN m >= {_RS_K}"
                f" THEN round(CAST({_RS_K} - 1 AS DOUBLE) * {_RS_SCALE!r}"
                " / CAST(conv(substr(kth, 1, 15), 16, 10) AS BIGINT), 2)"
                " ELSE CAST(m AS DOUBLE) END"
            ).alias("est_reach"),
        )
        .orderBy("cust_id")
    )


# ---------------------------------------------------------------------------
# 4-cycle (C4) motif counting via codegree wedge pairs
# ---------------------------------------------------------------------------


@register(
    "graph_four_cycles",
    f"""
    WITH dir_edges AS ({_EDGES_SQL}),
    und AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM dir_edges WHERE src <> dst
    ),
    adj AS (
      SELECT a AS v, b AS n FROM und
      UNION ALL
      SELECT b AS v, a AS n FROM und
    ),
    codeg AS (
      SELECT e1.n AS u, e2.n AS w, CAST(count(*) AS BIGINT) AS c
      FROM adj e1 JOIN adj e2 ON e1.v = e2.v AND e1.n < e2.n
      GROUP BY 1, 2
    )
    SELECT CAST((SELECT count(DISTINCT v) FROM adj) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
           CAST(count(*) AS BIGINT) AS n_endpoint_pairs,
           CAST(max(c) AS BIGINT) AS max_codegree,
           CAST((sum(c * (c - 1)) // 2) // 2 AS BIGINT) AS n_four_cycles
    FROM codeg
    """,
    doc=(
        "4-cycle (C4) motif count on the undirected trade graph via "
        "the codegree identity: every unordered endpoint pair (u, w) "
        "with c common neighbors contributes C(c, 2) wedge pairs, and "
        "each 4-cycle is counted once per diagonal (twice total), so "
        "#C4 = sum C(c,2) / 2 — one self-join on the shared middle + "
        "one aggregate, never an explicit 4-path enumeration. The "
        "bipartite-community motif complement to the triangle count; "
        "max codegree is the hub-pair diagnostic."
    ),
)
def graph_four_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact C4 count from codegree pair sums.

    Scale notes (100 TB / big graphs): the middle-join costs sum of
    squared degrees (the same budget as triangle counting) and
    shuffles on the middle vertex; codegree aggregation shuffles on
    the endpoint pair. Degree-cap the adjacency first on power-law
    graphs (the graph_triangles _edge_cap discipline applies
    unchanged)."""
    und = (
        _edges(spark, sf_dir)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # adj both directions + edge count
    )
    adj = und.select(F.col("a").alias("v"), F.col("b").alias("n")).unionByName(
        und.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    e1 = adj.select(F.col("v"), F.col("n").alias("u"))
    e2 = adj.select(F.col("v"), F.col("n").alias("w"))
    codeg = (
        e1.join(e2, "v")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    nodes = adj.agg(
        F.countDistinct("v").cast("bigint").alias("n_nodes")
    )
    edges_n = und.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        codeg.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_endpoint_pairs"),
            F.max("c").cast("bigint").alias("max_codegree"),
            F.expr(
                "CAST((sum(c * (c - 1)) div 2) div 2 AS BIGINT)"
            ).alias("n_four_cycles"),
        )
        .crossJoin(F.broadcast(nodes))
        .crossJoin(F.broadcast(edges_n))
        .select(
            "n_nodes", "n_edges", "n_endpoint_pairs",
            "max_codegree", "n_four_cycles",
        )
    )


# ---------------------------------------------------------------------------
# Seed-sampled truncated Brandes betweenness (k-betweenness, horizon 3)
# ---------------------------------------------------------------------------

_BC_SEEDS = 3
_BC_TOP = 15


@register(
    "graph_betweenness_seeds",
    f"""
    WITH {_GRAPH_EDGE_SQL},
    seeds AS (SELECT src AS seed FROM und GROUP BY 1 ORDER BY 1
              LIMIT {_BC_SEEDS}),
    b0 AS (SELECT seed, seed AS node, CAST(1 AS BIGINT) AS sigma
           FROM seeds),
    l1 AS MATERIALIZED (
      SELECT b.seed, u.dst AS node, CAST(sum(b.sigma) AS BIGINT) AS sigma
      FROM b0 b JOIN und u ON u.src = b.node
      WHERE u.dst <> b.seed
      GROUP BY 1, 2
    ),
    l2 AS MATERIALIZED (
      SELECT t.seed, t.node, CAST(sum(t.sigma) AS BIGINT) AS sigma FROM (
        SELECT l.seed, u.dst AS node, l.sigma
        FROM l1 l JOIN und u ON u.src = l.node
      ) t
      LEFT JOIN l1 p ON p.seed = t.seed AND p.node = t.node
      WHERE t.node <> t.seed AND p.node IS NULL
      GROUP BY 1, 2
    ),
    l3 AS MATERIALIZED (
      SELECT t.seed, t.node, CAST(sum(t.sigma) AS BIGINT) AS sigma FROM (
        SELECT l.seed, u.dst AS node, l.sigma
        FROM l2 l JOIN und u ON u.src = l.node
      ) t
      LEFT JOIN l1 p1 ON p1.seed = t.seed AND p1.node = t.node
      LEFT JOIN l2 p2 ON p2.seed = t.seed AND p2.node = t.node
      WHERE t.node <> t.seed AND p1.node IS NULL AND p2.node IS NULL
      GROUP BY 1, 2
    ),
    d2 AS MATERIALIZED (
      SELECT v.seed, v.node, v.sigma,
             CAST(coalesce(sum(CASE WHEN w.node IS NOT NULL
               THEN v.sigma * 1000 // w.sigma ELSE 0 END), 0) AS BIGINT)
               AS delta
      FROM l2 v
      LEFT JOIN und u ON u.src = v.node
      LEFT JOIN l3 w ON w.seed = v.seed AND w.node = u.dst
      GROUP BY 1, 2, 3
    ),
    d1 AS (
      SELECT v.seed, v.node,
             CAST(coalesce(sum(CASE WHEN w.node IS NOT NULL
               THEN v.sigma * (1000 + w.delta) // w.sigma ELSE 0 END), 0)
               AS BIGINT) AS delta
      FROM l1 v
      LEFT JOIN und u ON u.src = v.node
      LEFT JOIN d2 w ON w.seed = v.seed AND w.node = u.dst
      GROUP BY 1, 2
    ),
    bc AS (
      SELECT node, CAST(sum(delta) AS BIGINT) AS bc_milli FROM (
        SELECT node, delta FROM d1
        UNION ALL
        SELECT node, delta FROM d2
      ) GROUP BY 1
    )
    SELECT node, bc_milli,
           CAST(row_number() OVER (ORDER BY bc_milli DESC, node)
                AS BIGINT) AS rank
    FROM bc ORDER BY bc_milli DESC, node LIMIT {_BC_TOP}
    """,
    doc=(
        "Seed-sampled betweenness centrality (truncated Brandes, the "
        "standard approximation for graphs where all-pairs BFS is "
        f"impossible): BFS shortest-path DAGs from the {_BC_SEEDS} "
        "smallest nodes out to horizon 3 with integer path counts "
        "(sigma), then the Brandes backward dependency accumulation in "
        "milli-integers — each per-successor term sigma_v * (1000 + "
        "delta_w) div sigma_w is an exact integer division, so the "
        "whole accumulation hash-matches the oracle's unrolled layer "
        "CTEs (float Brandes never could). Top-15 nodes by accumulated "
        "dependency."
    ),
)
def graph_betweenness_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Brandes from a fixed seed set.

    Scale notes (100 TB): each forward layer is one edge-list join +
    aggregate keyed by (seed, node); the backward pass is two more of
    the same shape — per-seed cost ~ edges within the horizon, the
    standard seed-sampling trade. Layer frames are lazily checkpointed:
    l1 feeds l2, l3, the exclusion anti-joins AND the backward pass, so
    uncheckpointed lineage would re-run the fact-scan edge build per
    branch (the round-9 class)."""
    _, und, _ = _lpa_labels(spark, sf_dir)
    seeds = (
        und.select("src").distinct().orderBy("src").limit(_BC_SEEDS)
        .select(F.col("src").alias("seed"))
    )
    b0 = seeds.select(
        "seed", F.col("seed").alias("node"), F.lit(1).cast("bigint").alias("sigma")
    )
    u = und  # (src, dst), already eagerly checkpointed by _lpa_labels

    def _next_layer(prev: DataFrame, *excl: DataFrame) -> DataFrame:
        t = (
            prev.join(u, prev.node == u.src)
            .select("seed", F.col("dst").alias("node"), "sigma")
            .filter(F.col("node") != F.col("seed"))
        )
        for ex in excl:
            t = t.join(
                ex.select("seed", "node"), ["seed", "node"], "left_anti"
            )
        return (
            t.groupBy("seed", "node")
            .agg(F.sum("sigma").cast("bigint").alias("sigma"))
            .localCheckpoint(eager=False)
        )

    l1 = _next_layer(b0)
    l2 = _next_layer(l1, l1)
    l3 = _next_layer(l2, l1, l2)

    def _backward(v: DataFrame, succ: DataFrame, succ_delta: bool) -> DataFrame:
        w = succ.select(
            F.col("seed").alias("__ws"),
            F.col("node").alias("__wn"),
            F.col("sigma").alias("__wsig"),
            *([F.col("delta").alias("__wd")] if succ_delta else []),
        )
        term = (
            "CASE WHEN __wn IS NOT NULL THEN sigma * (1000 + "
            + ("__wd" if succ_delta else "0")
            + ") div __wsig ELSE 0 END"
        )
        return (
            v.join(u, v.node == u.src, "left")
            .join(
                w,
                (F.col("seed") == F.col("__ws"))
                & (F.col("dst") == F.col("__wn")),
                "left",
            )
            .groupBy("seed", "node", "sigma")
            .agg(
                F.coalesce(F.sum(F.expr(term)), F.lit(0))
                .cast("bigint")
                .alias("delta")
            )
            .localCheckpoint(eager=False)
        )

    d2 = _backward(l2, l3.withColumn("delta", F.lit(0)), False)
    d1 = _backward(l1, d2, True)
    bc = (
        d1.select("node", "delta")
        .unionAll(d2.select("node", "delta"))
        .groupBy("node")
        .agg(F.sum("delta").cast("bigint").alias("bc_milli"))
    )
    w_rank = Window.orderBy(F.desc("bc_milli"), F.asc("node"))
    return (
        bc.orderBy(F.desc("bc_milli"), F.asc("node"))
        .limit(_BC_TOP)
        .withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
    )


# ---------------------------------------------------------------------------
# Boruvka minimum spanning forest (2 rounds, min-label contraction)
# ---------------------------------------------------------------------------

_MSF_ROUNDS = 2
_MSF_CC = 4  # min-label propagation rounds per contraction


def _msf_oracle() -> str:
    """Unrolled Boruvka: per round, every component picks its minimum
    outgoing edge by (w, sa, sb); picked edges hook components, and
    4 rounds of min-label propagation over the (tiny, component-grain)
    merge graph contract them."""
    ctes = [
        f"""wedges AS MATERIALIZED (
      SELECT least(a.s, b.s) AS sa, greatest(a.s, b.s) AS sb,
             CAST(count(*) AS BIGINT) AS w
      FROM rk a JOIN rk b ON a.c = b.c AND a.rn = 1 AND b.rn = 2
      GROUP BY 1, 2
    )""",
        "verts AS (SELECT sa AS v FROM wedges UNION SELECT sb FROM wedges)",
        "lab0 AS (SELECT v, v AS c FROM verts)",
    ]
    lab = "lab0"
    stats = []
    for r in range(1, _MSF_ROUNDS + 1):
        ctes.append(f"""ce{r} AS MATERIALIZED (
      SELECT e.sa, e.sb, e.w, la.c AS ca, lb.c AS cb
      FROM wedges e
      JOIN {lab} la ON la.v = e.sa
      JOIN {lab} lb ON lb.v = e.sb
      WHERE la.c <> lb.c
    )""")
        ctes.append(f"""pick{r} AS MATERIALIZED (
      SELECT DISTINCT sa, sb, w, ca, cb FROM (
        SELECT t.*, row_number() OVER (PARTITION BY comp
                 ORDER BY w, sa, sb) AS rn
        FROM (
          SELECT ca AS comp, sa, sb, w, ca, cb FROM ce{r}
          UNION ALL
          SELECT cb AS comp, sa, sb, w, ca, cb FROM ce{r}
        ) t
      ) p WHERE rn = 1
    )""")
        ctes.append(f"""mg{r} AS (
      SELECT ca AS x, cb AS y FROM pick{r}
      UNION
      SELECT cb, ca FROM pick{r}
    )""")
        ml = f"ml{r}_0"
        ctes.append(
            f"{ml} AS (SELECT c AS comp, c AS lbl FROM {lab} GROUP BY 1, 2)"
        )
        for j in range(1, _MSF_CC + 1):
            nxt = f"ml{r}_{j}"
            ctes.append(f"""{nxt} AS MATERIALIZED (
      SELECT l.comp,
             CAST(least(l.lbl, coalesce(n.m, l.lbl)) AS BIGINT) AS lbl
      FROM ml{r}_{j - 1} l LEFT JOIN (
        SELECT g.x AS comp, min(l2.lbl) AS m
        FROM mg{r} g JOIN ml{r}_{j - 1} l2 ON l2.comp = g.y
        GROUP BY 1
      ) n ON n.comp = l.comp
    )""")
            ml = nxt
        ctes.append(f"""lab{r} AS MATERIALIZED (
      SELECT l.v, m.lbl AS c
      FROM {lab} l JOIN {ml} m ON m.comp = l.c
    )""")
        stats.append(
            f"""SELECT {r} AS round,
             (SELECT CAST(count(*) AS BIGINT) FROM pick{r}) AS n_edges_added,
             (SELECT CAST(coalesce(sum(w), 0) AS BIGINT) FROM pick{r})
               AS total_weight,
             (SELECT CAST(count(DISTINCT c) AS BIGINT) FROM lab{r})
               AS n_components"""
        )
        lab = f"lab{r}"
    return (
        "WITH spend AS ("
        + _GRAPH_EDGE_SQL.split("spend AS (", 1)[1].split("), rk AS (")[0]
        + "), rk AS ("
        + _GRAPH_EDGE_SQL.split("), rk AS (", 1)[1].split("), edges AS")[0]
        + "),\n"
        + ",\n".join(ctes)
        + "\nSELECT * FROM ("
        + " UNION ALL ".join(stats)
        + ") ORDER BY round"
    )


@register(
    "graph_boruvka_msf",
    _msf_oracle(),
    doc=(
        "Boruvka minimum spanning forest — THE distributed MST "
        "algorithm (each round every component picks its minimum "
        "outgoing edge, components contract, edge count halves): 2 "
        "rounds over the customer co-preference supplier graph with "
        "shared-customer counts as weights, tie-break (w, sa, sb) so "
        "picks are deterministic; contraction = 4 rounds of min-label "
        "propagation over the component-grain merge graph (a 2-cycle-"
        "only pseudo-forest, so 4 rounds converge). Per-round edge "
        "count, total weight and surviving component count are "
        "hard-hashed against the fully unrolled oracle."
    ),
)
def graph_boruvka_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-round Boruvka MSF with min-label contraction.

    Scale notes (100 TB): every step is edge-grain — the per-component
    argmin is one combining aggregate (min of (w, sa, sb) structs),
    hooking is a join on component ids, and contraction iterates over
    the MERGE graph (|components| rows, shrinking geometrically), never
    the vertex set. Labels and picks are lazily checkpointed per round:
    each is consumed by 3+ branches (stats + next round), the round-9
    exponential-lineage class."""
    _, und, _ = _lpa_labels(spark, sf_dir)
    # weighted edges: shared-customer count per undirected pair — re-
    # derive from the und build's grain by counting directed halves
    # (und = both directions of the distinct pair set, so recount from
    # the pair itself is not possible there; recompute from spend rank)
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    spend = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"), o.o_custkey == F.col("c_custkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), l.l_suppkey == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).alias("sp"))
    )
    rk = spend.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("c").orderBy(F.desc("sp"), F.asc("s"))
        ),
    )
    a = rk.filter("rn = 1").select("c", F.col("s").alias("s1"))
    b = rk.filter("rn = 2").select(F.col("c").alias("c2"), F.col("s").alias("s2"))
    wedges = (
        a.join(b, a.c == b.c2)
        .groupBy(
            F.least("s1", "s2").alias("sa"),
            F.greatest("s1", "s2").alias("sb"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .localCheckpoint(eager=True)  # supplier-grain, consumed per round
    )
    lab = (
        wedges.select(F.col("sa").alias("v"))
        .union(wedges.select("sb"))
        .distinct()
        .select("v", F.col("v").alias("c"))
    )
    out_rows = []
    for r in range(1, _MSF_ROUNDS + 1):
        la = lab.select(F.col("v").alias("__va"), F.col("c").alias("ca"))
        lb = lab.select(F.col("v").alias("__vb"), F.col("c").alias("cb"))
        ce = (
            wedges.join(la, F.col("sa") == F.col("__va"))
            .join(lb, F.col("sb") == F.col("__vb"))
            .filter(F.col("ca") != F.col("cb"))
            .select("sa", "sb", "w", "ca", "cb")
            .localCheckpoint(eager=False)
        )
        both = ce.select(F.col("ca").alias("comp"), "sa", "sb", "w", "ca", "cb").unionAll(
            ce.select(F.col("cb").alias("comp"), "sa", "sb", "w", "ca", "cb")
        )
        pick = (
            both.groupBy("comp")
            .agg(F.min(F.struct("w", "sa", "sb", "ca", "cb")).alias("__p"))
            .select(
                F.col("__p.sa").alias("sa"), F.col("__p.sb").alias("sb"),
                F.col("__p.w").alias("w"), F.col("__p.ca").alias("ca"),
                F.col("__p.cb").alias("cb"),
            )
            .distinct()
            .localCheckpoint(eager=False)  # stats x2 + merge graph
        )
        comps = lab.select(F.col("c").alias("comp")).distinct()
        # merge graph with SELF-LOOPS (the SCC fold): the propagation
        # step is then min over (self ∪ neighbors) — one reference to
        # the label table per iteration, so two iterations share each
        # lazy checkpoint instead of checkpointing every one
        mg = (
            pick.select(F.col("ca").alias("x"), F.col("cb").alias("y"))
            .union(pick.select(F.col("cb").alias("x"), F.col("ca").alias("y")))
            .union(comps.select(F.col("comp").alias("x"), F.col("comp").alias("y")))
            .localCheckpoint(eager=False)
        )
        ml = comps.select("comp", F.col("comp").alias("lbl"))
        for k in range(1, _MSF_CC + 1):
            ml = (
                mg.join(
                    ml.select(F.col("comp").alias("y"), F.col("lbl").alias("__l")),
                    "y",
                )
                .groupBy(F.col("x").alias("comp"))
                .agg(F.min("__l").cast("bigint").alias("lbl"))
            )
            if k % 2 == 0 or k == _MSF_CC:
                ml = ml.localCheckpoint(eager=False)
        lab = (
            lab.join(ml.select(F.col("comp").alias("c"), "lbl"), "c")
            .select("v", F.col("lbl").alias("c"))
            .localCheckpoint(eager=False)
        )
        st = (
            pick.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_edges_added"),
                F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("total_weight"),
            )
            .crossJoin(
                lab.agg(F.count_distinct("c").cast("bigint").alias("n_components"))
            )
            .select(
                F.lit(r).cast("bigint").alias("round"),
                "n_edges_added", "total_weight", "n_components",
            )
        )
        out_rows.append(st)
    res = out_rows[0]
    for st in out_rows[1:]:
        res = res.unionAll(st)
    return res.orderBy("round")


# ---------------------------------------------------------------------------
# Native recursive-CTE BFS (Spark 4 WITH RECURSIVE — same SQL, both engines)
# ---------------------------------------------------------------------------

_RBFS_SQL = f"""
    WITH RECURSIVE e AS ({_EDGES_SQL}),
    r(node, hops) AS (
      SELECT CAST(0 AS BIGINT) AS node, 0 AS hops
      UNION ALL
      SELECT CAST(e.dst AS BIGINT), r.hops + 1
      FROM r JOIN e ON e.src = r.node
      WHERE r.hops < 3
    )
    SELECT node, CAST(min(hops) AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n_walks
    FROM r GROUP BY node ORDER BY node
    """


@register(
    "graph_bfs_recursive_cte",
    _RBFS_SQL,
    doc=(
        "Native WITH RECURSIVE breadth-first reachability — Spark 4 "
        "executes the recursive CTE itself (UnionLoop), so the "
        "IDENTICAL SQL text runs on both engines with zero manual "
        "unrolling: hops-bounded walk enumeration from nation 0 over "
        "the directed trade graph, reduced to min-hop distance and "
        "walk counts. The sibling graph_bfs_hops pins the hand-unrolled "
        "formulation; this entry pins the engine's own recursion "
        "operator against DuckDB's."
    ),
)
def graph_bfs_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE BFS run natively by the engine.

    Scale notes (100 TB): each recursion step is one join of the
    frontier against the (broadcastable) edge list — the same
    per-round shape as the unrolled variant, but the iteration count
    is driven by the engine's loop operator instead of plan text; the
    hops guard bounds both state and the dense-graph walk explosion."""
    for t in ("lineitem", "orders", "customer", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"_rbfs_{t}")
    # Word-boundary rewrite (not a space-delimited .replace): survives
    # reformatting where a table token abuts a newline, ')' or EOS, and
    # asserts every table was actually remapped so the rewrite can't
    # silently no-op.
    sql = _RBFS_SQL
    for t in ("lineitem", "orders", "customer", "supplier"):
        sql, n = re.subn(rf"\b{t}\b", f"_rbfs_{t}", sql)
        assert n > 0, f"table {t} not found in _RBFS_SQL"
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# Strongly connected components — FW-BW min-label coloring (first peel)
# ---------------------------------------------------------------------------

_SCC_ROUNDS = 6
_SCC_TOP = 10


def _scc_oracle() -> str:
    spend_rk = (
        "spend AS ("
        + _GRAPH_EDGE_SQL.split("spend AS (", 1)[1].split("), rk AS (")[0]
        + "), rk AS ("
        + _GRAPH_EDGE_SQL.split("), rk AS (", 1)[1].split("), edges AS")[0]
        + ")"
    )
    ctes = [
        spend_rk,
        """dedges AS MATERIALIZED (
      SELECT DISTINCT a.s AS src, b.s AS dst
      FROM rk a JOIN rk b ON a.c = b.c AND a.rn = 1 AND b.rn = 2
      WHERE a.s <> b.s
    )""",
        "nodes AS (SELECT src AS v FROM dedges UNION SELECT dst FROM dedges)",
        "f0 AS (SELECT v, v AS lbl FROM nodes)",
        "b0 AS (SELECT v, v AS lbl FROM nodes)",
    ]
    for i in range(1, _SCC_ROUNDS + 1):
        ctes.append(f"""f{i} AS MATERIALIZED (
      SELECT l.v, CAST(least(l.lbl, coalesce(n.m, l.lbl)) AS BIGINT) AS lbl
      FROM f{i - 1} l LEFT JOIN (
        SELECT e.dst AS v, min(l2.lbl) AS m
        FROM dedges e JOIN f{i - 1} l2 ON l2.v = e.src GROUP BY 1
      ) n USING (v)
    )""")
        ctes.append(f"""b{i} AS MATERIALIZED (
      SELECT l.v, CAST(least(l.lbl, coalesce(n.m, l.lbl)) AS BIGINT) AS lbl
      FROM b{i - 1} l LEFT JOIN (
        SELECT e.src AS v, min(l2.lbl) AS m
        FROM dedges e JOIN b{i - 1} l2 ON l2.v = e.dst GROUP BY 1
      ) n USING (v)
    )""")
    r = _SCC_ROUNDS
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    res AS (
      SELECT f.v, f.lbl AS scc_id
      FROM f{r} f JOIN b{r} b ON b.v = f.v AND b.lbl = f.lbl
    ),
    tot AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
             (SELECT CAST(count(*) AS BIGINT) FROM res) AS n_resolved
    )
    SELECT s.scc_id, s.size, tot.n_nodes, tot.n_resolved,
           CAST(row_number() OVER (ORDER BY s.size DESC, s.scc_id)
                AS BIGINT) AS rank
    FROM (
      SELECT scc_id, CAST(count(*) AS BIGINT) AS size
      FROM res GROUP BY 1
    ) s CROSS JOIN tot
    ORDER BY s.size DESC, s.scc_id LIMIT {_SCC_TOP}
    """
    )


@register(
    "graph_scc_directed",
    _scc_oracle(),
    doc=(
        "Strongly connected components by FW-BW min-label coloring "
        "(the first peel of the distributed ColorCC/FW-BW algorithm): "
        "over the DIRECTED preference graph (each customer's top "
        "supplier -> its second), propagate min labels 6 fixed rounds "
        "FORWARD (along edges) and 6 BACKWARD (against them); a node "
        "whose forward label equals its backward label m is reachable "
        "from m AND reaches m, i.e. provably inside SCC(m). Resolved "
        "SCC sizes plus node/resolution totals are hard-hashed against "
        "the fully unrolled oracle; fixed rounds keep both engines "
        "bit-identical even where labels haven't globally converged."
    ),
)
def graph_scc_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FW-BW min-label SCC coloring, 6+6 unrolled rounds.

    Scale notes (100 TB): each round is one edge-list join + min
    aggregate keyed by node (forward and backward run on the same
    checkpointed edge table with src/dst swapped). The edge table
    carries SELF-LOOPS so a round is min over (self ∪ in-neighbors)
    — identical to least(own, min in-neighbors) but referencing the
    label table ONCE, which keeps per-round lineage single-branch
    (round-9 class) and lets two rounds share each lazy checkpoint
    (half the sequential label jobs of the checkpoint-per-round
    form)."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    spend = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"), o.o_custkey == F.col("c_custkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), l.l_suppkey == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).alias("sp"))
    )
    rk = spend.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("c").orderBy(F.desc("sp"), F.asc("s"))
        ),
    )
    a = rk.filter("rn = 1").select("c", F.col("s").alias("src"))
    b = rk.filter("rn = 2").select(F.col("c").alias("c2"), F.col("s").alias("dst"))
    dedges = (
        a.join(b, a.c == b.c2)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)  # supplier-grain; 12 round joins
    )
    nodes = (
        dedges.select(F.col("src").alias("v"))
        .union(dedges.select("dst"))
        .distinct()
    )
    # self-loop augmentation: every node is its own in-neighbor in
    # BOTH directions, so the round update needs no retain-own-label
    # left join (checkpointed once, consumed by all 12 round joins)
    eself = dedges.unionByName(
        nodes.select(F.col("v").alias("src"), F.col("v").alias("dst"))
    ).localCheckpoint(eager=False)
    fwd = nodes.select("v", F.col("v").alias("lbl"))
    bwd = nodes.select("v", F.col("v").alias("lbl"))

    def _round(lab: DataFrame, key_in: str, key_out: str, chk: bool) -> DataFrame:
        out = (
            eself.join(
                lab.select(F.col("v").alias(key_in), F.col("lbl").alias("__l")),
                key_in,
            )
            .groupBy(F.col(key_out).alias("v"))
            .agg(F.min("__l").cast("bigint").alias("lbl"))
        )
        return out.localCheckpoint(eager=False) if chk else out

    for i in range(1, _SCC_ROUNDS + 1):
        chk = i % 2 == 0 or i == _SCC_ROUNDS
        fwd = _round(fwd, "src", "dst", chk)
        bwd = _round(bwd, "dst", "src", chk)
    res = fwd.join(
        bwd.select(F.col("v").alias("__bv"), F.col("lbl").alias("__bl")),
        (F.col("v") == F.col("__bv")) & (F.col("lbl") == F.col("__bl")),
    ).select("v", F.col("lbl").alias("scc_id")).localCheckpoint(eager=False)
    tot = (
        nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .crossJoin(res.agg(F.count(F.lit(1)).cast("bigint").alias("n_resolved")))
    )
    sizes = res.groupBy("scc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    w = Window.orderBy(F.desc("size"), F.asc("scc_id"))
    return (
        sizes.crossJoin(F.broadcast(tot))
        .orderBy(F.desc("size"), F.asc("scc_id"))
        .limit(_SCC_TOP)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("scc_id", "size", "n_nodes", "n_resolved", "rank")
    )


_TR_ROUNDS = 3
_TR_SEEDS = 3
_TR_GCAP = 20  # contact-group size cap (mass gatherings excluded)


def _temporal_reach_oracle() -> str:
    ctes = [
        """ev AS MATERIALIZED (
      SELECT DISTINCT user_id, event_type,
             epoch_us(ts) // 3600000000 AS h
      FROM events
    )""",
        f"""gsz AS (
      SELECT event_type, h FROM ev GROUP BY 1, 2
      HAVING count(*) BETWEEN 2 AND {_TR_GCAP}
    )""",
        """contacts AS MATERIALIZED (
      SELECT a.user_id AS src, b.user_id AS dst, a.h
      FROM ev a
      JOIN ev b ON a.event_type = b.event_type AND a.h = b.h
      JOIN gsz g ON g.event_type = a.event_type AND g.h = a.h
      WHERE a.user_id <> b.user_id
    )""",
        f"""i0 AS (
      SELECT user_id, CAST(0 AS BIGINT) AS t
      FROM (SELECT DISTINCT user_id FROM ev ORDER BY user_id
            LIMIT {_TR_SEEDS})
    )""",
    ]
    for k in range(1, _TR_ROUNDS + 1):
        ctes.append(f"""i{k} AS MATERIALIZED (
      SELECT user_id, CAST(min(t) AS BIGINT) AS t FROM (
        SELECT user_id, t FROM i{k-1}
        UNION ALL
        SELECT c.dst AS user_id, c.h AS t
        FROM contacts c JOIN i{k-1} p ON c.src = p.user_id
        WHERE c.h >= p.t
      ) GROUP BY 1
    )""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT user_id, t AS infected_hour
    FROM i{_TR_ROUNDS} ORDER BY user_id
    """
    )


@register(
    "graph_temporal_reachability",
    _temporal_reach_oracle(),
    doc=(
        "Time-respecting reachability on a temporal contact graph (the "
        "epidemic/influence primitive static BFS cannot express: a "
        "path is valid only if contact times are non-decreasing along "
        "it). Contacts = users sharing an (event_type, hour) cell, "
        f"cell size capped at {_TR_GCAP} (mass gatherings excluded — "
        "the group-size cap that keeps contact volume linear); "
        f"{_TR_SEEDS} seed users spread over {_TR_ROUNDS} rounds, each "
        "round one equi-join of the frontier against the contact list "
        "with the h >= t_infection time guard + a min-time merge. "
        "All-integer epoch hours, so the infection table hashes "
        "exactly against the oracle's unrolled MATERIALIZED rounds."
    ),
)
def graph_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal BFS with per-round min-infection-time state.

    Scale notes (100 TB): the contact list is built once and lazily
    checkpointed (every round consumes it — the round-9 multi-branch
    class); each round is one key-partitioned join + one min-merge
    aggregate, the Pregel shape; the group-size cap bounds contact
    pairs at |cells| * cap² regardless of skew. Infection state is one
    row per reached user."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.expr(
                "CAST(timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS BIGINT)"
                " div 3600000000"
            ).alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # feeds gsz + both contact sides + seeds
    )
    gsz = (
        ev.groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter((F.col("__c") >= 2) & (F.col("__c") <= _TR_GCAP))
        .select("event_type", "h")
    )
    a = ev.select("user_id", "event_type", "h")
    b = ev.select(F.col("user_id").alias("dst"), "event_type", "h")
    contacts = (
        a.join(gsz, ["event_type", "h"])
        .join(b, ["event_type", "h"])
        .filter(F.col("user_id") != F.col("dst"))
        .select(F.col("user_id").alias("src"), "dst", "h")
        .localCheckpoint(eager=False)  # consumed once per round
    )
    infected = (
        ev.select("user_id")
        .distinct()
        .orderBy("user_id")
        .limit(_TR_SEEDS)
        .select("user_id", F.lit(0).cast("bigint").alias("t"))
    )
    for _ in range(_TR_ROUNDS):
        cand = (
            contacts.join(
                infected.select(
                    F.col("user_id").alias("src"), F.col("t").alias("__pt")
                ),
                "src",
            )
            .filter(F.col("h") >= F.col("__pt"))
            .select(F.col("dst").alias("user_id"), F.col("h").alias("t"))
        )
        infected = (
            infected.unionByName(cand)
            .groupBy("user_id")
            .agg(F.min("t").cast("bigint").alias("t"))
            .localCheckpoint(eager=False)  # next round + final output
        )
    return infected.select(
        "user_id", F.col("t").alias("infected_hour")
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Temporal motif counting: time-respecting 2-paths (round 13)
# ---------------------------------------------------------------------------

_T2P_TOP = 20


@register(
    "graph_temporal_two_paths",
    f"""
    WITH ev AS MATERIALIZED (
      SELECT DISTINCT user_id, event_type,
             epoch_us(ts) // 3600000000 AS h
      FROM events
    ), gsz AS (
      SELECT event_type, h FROM ev GROUP BY 1, 2
      HAVING count(*) BETWEEN 2 AND {_TR_GCAP}
    ), contacts AS MATERIALIZED (
      SELECT a.user_id AS src, b.user_id AS dst, a.h
      FROM ev a
      JOIN ev b ON a.event_type = b.event_type AND a.h = b.h
      JOIN gsz g ON g.event_type = a.event_type AND g.h = a.h
      WHERE a.user_id <> b.user_id
    ), paths AS (
      SELECT c1.dst AS broker,
             CAST(count(*) AS BIGINT) AS n_two_paths,
             CAST(sum(CASE WHEN c2.h = c1.h THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_same_hour,
             CAST(count(DISTINCT c1.src) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT c2.dst) AS BIGINT) AS n_sinks
      FROM contacts c1
      JOIN contacts c2 ON c1.dst = c2.src AND c2.h >= c1.h
                       AND c1.src <> c2.dst
      GROUP BY 1
    )
    SELECT broker, n_two_paths, n_same_hour, n_sources, n_sinks
    FROM paths
    ORDER BY n_two_paths DESC, broker
    LIMIT {_T2P_TOP}
    """,
    doc=(
        f"Temporal motif counting — time-respecting 2-paths u -> v -> "
        f"w (contact times non-decreasing through the middle user): "
        f"the broker/superspreader census that static triangle counts "
        f"cannot express. Shares the capped contact-cell construction "
        f"with graph_temporal_reachability (mass gatherings excluded, "
        f"cell size <= {_TR_GCAP}); the motif join is keyed on the "
        f"middle user, so per-broker work is bounded by the square of "
        f"a capped contact degree. Reports the top-{_T2P_TOP} brokers "
        f"with path, same-hour, source- and sink-diversity counts."
    ),
)
def graph_temporal_two_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top brokers by time-respecting 2-path count.

    Scale notes (100 TB): contacts are built once from capped cells
    (volume <= |cells| * cap^2) and lazily checkpointed for the two
    join sides; the self-join is a middle-user equi-join whose output
    is bounded per user by in-degree x out-degree of CAPPED contacts;
    TakeOrderedAndProject keeps only the top rows."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.expr(
                "CAST(timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS BIGINT)"
                " div 3600000000"
            ).alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # gsz + both contact sides
    )
    gsz = (
        ev.groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter((F.col("__c") >= 2) & (F.col("__c") <= _TR_GCAP))
        .select("event_type", "h")
    )
    a = ev.select("user_id", "event_type", "h")
    b = ev.select(F.col("user_id").alias("dst"), "event_type", "h")
    contacts = (
        a.join(gsz, ["event_type", "h"])
        .join(b, ["event_type", "h"])
        .filter(F.col("user_id") != F.col("dst"))
        .select(F.col("user_id").alias("src"), "dst", "h")
        .localCheckpoint(eager=False)  # both sides of the motif join
    )
    c2 = contacts.select(
        F.col("src").alias("mid"),
        F.col("dst").alias("sink"),
        F.col("h").alias("h2"),
    )
    paths = (
        contacts.join(c2, (F.col("dst") == F.col("mid")) & (F.col("h2") >= F.col("h")))
        .filter(F.col("src") != F.col("sink"))
        .groupBy(F.col("dst").alias("broker"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_two_paths"),
            F.expr(
                "CAST(sum(CASE WHEN h2 = h THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_same_hour"),
            F.countDistinct("src").cast("bigint").alias("n_sources"),
            F.countDistinct("sink").cast("bigint").alias("n_sinks"),
        )
    )
    return paths.orderBy(F.desc("n_two_paths"), F.asc("broker")).limit(
        _T2P_TOP
    )


# ---------------------------------------------------------------------------
# k-truss decomposition on the supplier co-purchase graph — round 13
# ---------------------------------------------------------------------------

_KT_ROUNDS = 3   # unrolled peel rounds
_KT_K = 4        # k-truss: every surviving edge sits in >= k-2 triangles
_KT_NN = 4       # kNN-graph symmetrization: keep edges in either
#                  endpoint's top-4 by shared-customer count


def _ktruss_oracle() -> str:
    ctes = [
        """e AS MATERIALIZED (
          SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s,
                 sp.s_nationkey AS n
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                          JOIN supplier sp ON l.l_suppkey = sp.s_suppkey
        )""",
        """cap AS (
          SELECT greatest(64, 8 * (count(*) // count(DISTINCT c))) AS v
          FROM e
        )""",
        """keep AS (
          SELECT c FROM e GROUP BY c
          HAVING count(*) <= (SELECT v FROM cap)
        )""",
        """com AS (
          SELECT a.s AS u, b.s AS v, CAST(count(*) AS BIGINT) AS common
          FROM e a JOIN keep k ON a.c = k.c
                   JOIN e b ON a.c = b.c AND a.n = b.n AND a.s < b.s
          GROUP BY 1, 2
        )""",
        f"""g0 AS MATERIALIZED (
          SELECT u, v FROM (
            SELECT u, v,
                   row_number() OVER (PARTITION BY u
                                      ORDER BY common DESC, v) AS ru,
                   row_number() OVER (PARTITION BY v
                                      ORDER BY common DESC, u) AS rv
            FROM com
          ) WHERE ru <= {_KT_NN} OR rv <= {_KT_NN}
        )""",
    ]
    for r in range(_KT_ROUNDS):
        ctes.append(
            f"""tri{r} AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM g{r} e1
              JOIN g{r} e2 ON e2.u = e1.v
              JOIN g{r} e3 ON e3.u = e1.u AND e3.v = e2.v
            )"""
        )
        ctes.append(
            f"""supp{r} AS (
              SELECT u, v, count(*) AS sup FROM (
                SELECT a AS u, b AS v FROM tri{r}
                UNION ALL SELECT b, c FROM tri{r}
                UNION ALL SELECT a, c FROM tri{r}
              ) p GROUP BY 1, 2
            )"""
        )
        ctes.append(
            f"""g{r + 1} AS MATERIALIZED (
              SELECT g.u, g.v FROM g{r} g
              JOIN supp{r} s ON g.u = s.u AND g.v = s.v
              WHERE s.sup >= {_KT_K - 2}
            )"""
        )
    ctes.append(
        f"""tri{_KT_ROUNDS} AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM g{_KT_ROUNDS} e1
          JOIN g{_KT_ROUNDS} e2 ON e2.u = e1.v
          JOIN g{_KT_ROUNDS} e3 ON e3.u = e1.u AND e3.v = e2.v
        )"""
    )
    stats = " UNION ALL ".join(
        f"""SELECT CAST({r} AS BIGINT) AS round,
          CAST((SELECT count(*) FROM g{r}) AS BIGINT) AS n_edges,
          CAST((SELECT count(*) FROM
                (SELECT u FROM g{r} UNION SELECT v FROM g{r}) n)
               AS BIGINT) AS n_nodes,
          CAST((SELECT count(*) FROM tri{r}) AS BIGINT) AS n_triangles"""
        for r in range(_KT_ROUNDS + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT * FROM (\n"
        + stats
        + "\n) z ORDER BY round"
    )


@register(
    "graph_ktruss",
    _ktruss_oracle(),
    doc=(
        "k-truss decomposition (k=4) of the supplier co-purchase "
        "graph: SAME-NATION co-purchase pairs (shared-customer counts "
        "under the df-capped equi-join — the nation equality bounds "
        "pair fan-out per customer the way the LPA edges do), "
        "symmetrized to a bounded-degree kNN "
        "graph (edges in either endpoint's top-4 by common count — "
        "degree <= 8 caps triangle fan-out BY CONSTRUCTION), then "
        "three unrolled peel rounds: ordered triangles enumerated "
        "once (u<v<w via the oriented 3-way self-join), per-edge "
        "support = appearances across the three pair projections, "
        "edges below k-2 triangles dropped; the cascade census "
        "(edges, nodes, triangles per round) is the output. The "
        "community-core extraction a fraud/cohesion pipeline runs "
        "where k-core is too permissive."
    ),
)
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative triangle-support peeling with per-round census.

    Scale notes (100 TB): the expensive stage (pair generation) is the
    same df-capped shared-key equi-join as graph_link_jaccard; the kNN
    symmetrization bounds every node's degree at 2*top-4, so each
    round's ordered-triangle join costs at most n_nodes * 8^2 rows no
    matter how skewed co-purchase counts get. Every g{r} is lazily
    checkpointed — it feeds three self-join branches, the support
    join AND the census row, which would otherwise re-execute the
    whole upstream chain exponentially (the round-9 HITS lesson); the
    census scan budget is pinned in tests/test_round13_ops.py."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    sp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sp), l.l_suppkey == sp.s_suppkey)
        .select(
            F.col("o_custkey").alias("c"),
            F.col("l_suppkey").alias("s"),
            F.col("s_nationkey").alias("n"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    row = e.agg(
        F.expr(
            "greatest(64L, 8 * (count(*) div count(DISTINCT c)))"
        ).alias("v"),
        F.expr("count(DISTINCT c)").alias("nc"),
        F.expr("count(DISTINCT s)").alias("ns"),
    ).collect()[0]
    cap, n_cust, n_supp = int(row["v"]), int(row["nc"]), int(row["ns"])
    # the kNN graph holds <= 8 edges per node: broadcast the per-round
    # join sides while the node count keeps that under the broadcast
    # budget (the _KEEP_BCAST_MAX auto-switch); above it, the joins
    # fall back to shuffles sized by AQE.
    bc = (
        F.broadcast
        if n_supp * 8 <= _KEEP_BCAST_MAX
        else (lambda df: df)
    )
    keep = (
        e.groupBy("c")
        .agg(F.count(F.lit(1)).alias("cd"))
        .filter(F.col("cd") <= F.lit(cap))
        .select("c")
    )
    if n_cust <= _KEEP_BCAST_MAX:
        keep = F.broadcast(keep)
    a = e.join(keep, "c").select("c", "n", F.col("s").alias("u"))
    b = e.select(
        F.col("c").alias("c2"), F.col("n").alias("n2"), F.col("s").alias("v")
    )
    com = (
        a.join(
            b,
            (a.c == b.c2)
            & (F.col("n") == F.col("n2"))
            & (F.col("u") < F.col("v")),
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    wu = Window.partitionBy("u").orderBy(F.desc("common"), F.asc("v"))
    wv = Window.partitionBy("v").orderBy(F.desc("common"), F.asc("u"))
    g = (
        com.withColumn("ru", F.row_number().over(wu))
        .withColumn("rv", F.row_number().over(wv))
        .filter((F.col("ru") <= _KT_NN) | (F.col("rv") <= _KT_NN))
        .select("u", "v")
        .localCheckpoint(eager=False)
    )

    def triangles(gr: DataFrame) -> DataFrame:
        e1 = gr.select(F.col("u").alias("a"), F.col("v").alias("b"))
        e2 = gr.select(F.col("u").alias("b2"), F.col("v").alias("c"))
        e3 = gr.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
        return (
            e1.join(bc(e2), F.col("b") == F.col("b2"))
            .join(
                bc(e3),
                (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
            )
            .select("a", "b", "c")
        )

    def census(gr: DataFrame, tri: DataFrame, r: int) -> DataFrame:
        edges = gr.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        nodes = (
            gr.select(F.col("u").alias("n"))
            .unionByName(gr.select(F.col("v").alias("n")))
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        )
        tris = tri.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_triangles")
        )
        return (
            edges.crossJoin(nodes)
            .crossJoin(tris)
            .select(
                F.lit(r).cast("bigint").alias("round"),
                "n_edges",
                "n_nodes",
                "n_triangles",
            )
        )

    out = None
    cur = g
    for r in range(_KT_ROUNDS):
        tri = triangles(cur)
        row = census(cur, tri, r)
        out = row if out is None else out.unionByName(row)
        supp = (
            tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionByName(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
            .unionByName(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("sup"))
            .filter(F.col("sup") >= _KT_K - 2)
            .select("u", "v")
        )
        cur = cur.join(bc(supp), ["u", "v"]).localCheckpoint(eager=False)
    final = census(cur, triangles(cur), _KT_ROUNDS)
    return out.unionByName(final).orderBy("round")
