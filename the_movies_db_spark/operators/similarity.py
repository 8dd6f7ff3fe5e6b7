"""Similarity search over embedding columns (``array<float>``).

Two tiers, same cosine semantics:

- **Brute-force top-k** (`cosine_topk`): broadcast the (small) query
  set against the corpus; exact, deterministic, expression-only. This
  is the correctness baseline AND the right plan whenever
  |queries| × |corpus| work fits the cluster — the corpus is scanned
  once, no index build.
- **Hyperplane-LSH buckets** (`hyperplane_signature`,
  `cosine_topk_lsh`): sign-random-projection signatures computed as a
  pure expression from md5-derived ±1 hyperplanes (no stored model, no
  randomness at runtime — the "index" is a deterministic function of
  the vector). Search touches only the query's bucket: at 100 TB the
  corpus is written partitioned/bucketed BY the signature, so a query
  reads exactly one bucket's files (partition pruning does the work).
  Recall < 1.0 by construction; raise num_planes → smaller buckets,
  or probe neighboring buckets (Hamming-1) for higher recall.

A vectorized Arrow/numpy path (`cosine_topk_pandas`) is provided for
throughput comparison: same result set, float summation order differs
(SIMD), so it is benchmarked but not oracle-hashed.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from the_movies_db_spark.operators.dedup import cosine, cosine_from_parts, norm

HEX_EVEN = ("0", "2", "4", "6", "8", "a", "c", "e")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Result:
    (query_id, neighbor_id, cosine_sim, rank) — rank over the ROUNDED
    similarity with id tie-break, so the row set is deterministic.
    Pass ``dim`` for fixed-width embeddings to keep the per-pair cosine
    in codegen (bit-identical results)."""
    qid = query_id_col or id_col
    qvec = query_vec_col or vec_col
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(qvec).alias("__qv"),
        norm(qvec if dim else F.col(qvec), dim).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(vec_col if dim else F.col(vec_col), dim).alias("__cn"),
    )
    sim = F.round(
        cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=dim), 4
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_signs(plane: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane: parity of the first md5 hex digit
    of '{plane}:{d}' per dimension — the exact values any engine's
    md5() reproduces, precomputed driver-side so the Spark expression
    is a small literal array instead of dim× inline md5 CASEs."""
    import hashlib

    return [
        1.0
        if hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[0] in HEX_EVEN
        else -1.0
        for d in range(dim)
    ]


_UNROLL_BUDGET = 128  # max unrolled multiply-add terms per signature call.
# Two ceilings: janino rejects methods past 64 KB of bytecode (a stage that
# fails to compile silently falls back to interpreted for ALL its operators),
# and janino COMPILE time for a many-hundred-term method is ~seconds per JVM —
# measured +3 s cold-run on the 512-term signature. Signatures are per-ROW
# work (cheap either way), so past this budget the compact HOF fold wins;
# the per-PAIR dot products stay unrolled (64 terms compiles fast and the
# pair side is where interpreted evaluation actually hurts).


def hyperplane_signature(
    vec: Column | str,
    num_planes: int,
    dim: int,
    plane_offset: int = 0,
    unroll: bool | None = None,
) -> Column:
    """Sign-random-projection signature as a '0101...' string. Bit p =
    1 iff round(dot(v, plane_p), 6) >= 0 (rounded so the sign is stable
    across engines). Dot products fold left in dimension order — the
    same double-arithmetic sequence the SQL oracle computes, whether
    unrolled (codegen, small plane counts) or folded via HOF
    (interpreted, used past ``_UNROLL_BUDGET`` terms where the unroll
    would blow janino's 64 KB method limit) — results are bit-identical
    either way. The unrolled form requires ``vec`` to be a column NAME:
    the whole signature is generated as one SQL string and parsed
    JVM-side in a single ``F.expr`` call (building 512-term trees
    through the Column API costs seconds of py4j round trips).

    ``plane_offset`` selects a disjoint plane family, so multi-band LSH
    (band b → offset b*planes_per_band) uses independent hyperplanes
    per band."""
    if unroll is None:
        unroll = num_planes * dim <= _UNROLL_BUDGET and isinstance(vec, str)
    if unroll:
        cases = []
        for p in range(plane_offset, plane_offset + num_planes):
            terms = " + ".join(
                f"CAST(element_at({vec}, {i}) AS DOUBLE) * CAST({s} AS DOUBLE)"
                for i, s in enumerate(_plane_signs(p, dim), start=1)
            )
            cases.append(
                f"CASE WHEN round(CAST(0.0 AS DOUBLE) + {terms}, 6) >= 0 "
                "THEN '1' ELSE '0' END"
            )
        return F.expr("concat(" + ", ".join(cases) + ")")
    vec = F.col(vec) if isinstance(vec, str) else vec
    bits = []
    for p in range(plane_offset, plane_offset + num_planes):
        plane = F.array(*[F.lit(s) for s in _plane_signs(p, dim)])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        bits.append(F.when(F.round(dot, 6) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine ranking within it."""
    sig = lambda df, out: df.select(  # noqa: E731
        F.col(id_col).alias(out),
        F.col(vec_col).alias(f"__{out}_v"),
        norm(vec_col, dim).alias(f"__{out}_n"),
        hyperplane_signature(vec_col, num_planes, dim).alias(f"__{out}_sig"),
    )
    q = sig(queries, "query_id")
    c = sig(corpus, "neighbor_id")
    simcol = F.round(
        cosine_from_parts(
            "__query_id_v", "__neighbor_id_v", "__query_id_n", "__neighbor_id_n",
            dim=dim,
        ),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("__query_id_sig") == F.col("__neighbor_id_sig"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", simcol.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hamming1_probes(sig: Column, num_planes: int) -> Column:
    """Multi-probe LSH probe set: the signature itself plus every
    Hamming-distance-1 variant (one bit flipped) — ``num_planes + 1``
    bucket strings. The standard recall dial that does NOT grow the
    index: the corpus keeps ONE bucket per vector; only the query side
    fans out, so at rest this is ``nprobe`` extra partition reads, not
    a bigger index. Probes are distinct strings, so candidates need no
    dedup."""
    def flip(i: int) -> Column:
        bit = F.substring(sig, i, 1)
        return F.concat(
            F.substring(sig, 1, i - 1),
            F.when(bit == "1", F.lit("0")).otherwise(F.lit("1")),
            F.substring(sig, i + 1, num_planes - i),
        )

    return F.array(sig, *[flip(i) for i in range(1, num_planes + 1)])


def cosine_topk_lsh_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k with Hamming-1 multi-probe: candidates come
    from the query's own LSH bucket AND every bucket one flipped bit
    away (:func:`hamming1_probes`) — near-neighbors split across a
    single hyperplane are recovered, the classic LSH miss mode. Exact
    cosine ranks the candidate union."""
    sig = hyperplane_signature(vec_col, num_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(vec_col, dim).alias("__cn"),
        sig.alias("__csig"),
    )
    # stage the signature BEFORE building the probe set: each Hamming-1
    # flip references the signature 3x, so exploding probes over the raw
    # expression would re-inline the num_planes*dim-term signature ~28x
    # into one projection (megabyte task binaries + seconds of codegen —
    # the HOF re-inlining trap). Staged, the probes reference a column.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(vec_col, dim).alias("__qn"),
        sig.alias("__qsig"),
    ).select(
        "query_id",
        "__qv",
        "__qn",
        F.explode(hamming1_probes(F.col("__qsig"), num_planes)).alias("__probe"),
    )
    simcol = F.round(
        cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=dim), 4
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(q)
        .join(c, F.col("__probe") == F.col("__csig"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", simcol.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def squared_l2(a: Column, b: Column) -> Column:
    """Sequential-order double-precision squared L2 distance
    (expression-only, deterministic across engines; uses x*x, never
    pow, so both engines produce bit-identical doubles)."""
    diff2 = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diff2, F.lit(0.0), lambda acc, t: acc + t)


def squared_l2_static(a: str, b: str, dim: int) -> Column:
    """Codegen unroll of :func:`squared_l2` for known dimension and
    column NAMES — same left-fold summation order, bit-identical
    doubles, one ``F.expr`` parse instead of py4j tree-building."""
    def d(i: int) -> str:
        return (
            f"(CAST(element_at({a}, {i}) AS DOUBLE) - "
            f"CAST(element_at({b}, {i}) AS DOUBLE))"
        )

    terms = " + ".join(f"{d(i)} * {d(i)}" for i in range(1, dim + 1))
    return F.expr(f"CAST(0.0 AS DOUBLE) + {terms}")


def _lit_centroid_array(
    cents: list[tuple[int, list[float]]],
    lo: int | None = None,
    hi: int | None = None,
    cid_type: str = "bigint",
    value_type: str = "DOUBLE",
) -> Column:
    """Literal array<struct<cid, cvec>> of collected centroids as ONE
    parsed SQL expression. Building it through nested ``F.lit`` calls
    costs one py4j round trip per float — thousands per plan (16
    centroids × 64 dims × 8 subspaces ≈ 8k calls ≈ seconds of DRIVER
    time per query build, measured in the bench medians); a single
    ``F.expr`` parse is milliseconds. DOUBLE values go through ``repr``
    → ``CAST(string AS DOUBLE)`` (Java parseDouble), which round-trips
    every IEEE double exactly, so the plan is bit-identical to the
    ``F.lit`` form; ``value_type="BIGINT"`` emits exact integer
    literals (the integer-KMeans path)."""

    def fmt(x) -> str:
        if value_type == "BIGINT":
            return f"CAST({int(x)} AS BIGINT)"
        return f"CAST('{x!r}' AS DOUBLE)"

    elems = ", ".join(
        "named_struct('cid', CAST({} AS {}), 'cvec', array({}))".format(
            cid,
            cid_type,
            ", ".join(fmt(x) for x in (v[lo:hi] if lo is not None else v)),
        )
        for cid, v in cents
    )
    return F.expr(f"array({elems})")


# Above this many cells the collected-centroid literal stops being a
# win: the plan carries n_cells × dim double literals (≈ 2 MB of plan
# text at 4k cells × 64 dims) and the per-row argmin is O(n_cells)
# inside one projection — both grow linearly with the corpus when cells
# are auto-sized (n/64). Past the threshold ivf_assign switches to the
# broadcast-join + min-of-struct form whose plan size is O(1).
IVF_COLLECT_MAX_CELLS = 4096


def collect_seed_centroids(
    src: DataFrame, id_col: str, vec_col: str, n_cells: int
) -> list[tuple[int, list[float]]]:
    """Collect the deterministic seed centroid rows (id < n_cells)
    ONCE. Operators that call both :func:`ivf_assign` and
    :func:`ivf_probe_cells` must collect here and pass ``cents=`` to
    both — otherwise every query plan pays two driver collect jobs and
    compiles the n_cells×dim literal twice (the round-13 driver
    regression on the ivfpq pair)."""
    rows = (
        src.filter(F.col(id_col) < n_cells)
        .select(id_col, vec_col)
        .collect()
    )
    return sorted((int(r[0]), [float(x) for x in r[1]]) for r in rows)


def ivf_assign(
    corpus: DataFrame, id_col: str, vec_col: str, n_cells: int = 8,
    dim: int | None = None, collect_centroids: bool | None = None,
    cents: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid cell. Centroids here are the deterministic seed set
    (vectors with id < n_cells) so the index is value-verifiable; in
    production you'd train them with MLlib KMeans and broadcast the
    model.

    ``collect_centroids=None`` (default) auto-selects:
    ``n_cells <= IVF_COLLECT_MAX_CELLS`` → collected-literal path,
    else the broadcast-join form. Both paths produce IDENTICAL cells
    (same rounded distance, same (d, cid) tie-break) — pinned by
    ``tests/test_plans.py``.

    Collected path: the ≤ n_cells centroid rows are collected once at
    plan-build (bounded — this IS the broadcast-the-model shape) and
    inlined as a literal array, so assignment is a pure per-row
    projection: argmin over the centroid array via ``array_min`` of
    (distance, cid) structs — NO crossJoin, NO aggregate, NO exchange.

    Broadcast-join path (auto above the threshold): corpus ⨯
    broadcast(centroids) → min-of-struct groupBy — two extra
    Exchanges over the corpus, but plan size and driver build time
    stay O(1) as auto-sized cell counts (``semantic_cells``: n/64)
    grow with the corpus.

    Returns (id, vec, cell). At 100 TB the corpus is *written*
    partitioned by cell, so a query scans only its probe cells'
    files — the IVF analog of partition pruning.
    """
    if collect_centroids is None:
        collect_centroids = n_cells <= IVF_COLLECT_MAX_CELLS
    if collect_centroids:
        if cents is None:
            cents = collect_seed_centroids(corpus, id_col, vec_col, n_cells)
        cent_arr = _lit_centroid_array(cents)
        scored = F.transform(
            cent_arr,
            lambda c: F.struct(
                F.round(squared_l2(F.col(vec_col), c["cvec"]), 6).alias("d"),
                c["cid"].alias("cid"),
            ),
        )
        return corpus.select(
            id_col, vec_col, F.array_min(scored)["cid"].alias("cell")
        )
    cent = corpus.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cvec")
    )
    l2 = squared_l2_static(vec_col, "__cvec", dim) if dim else squared_l2(
        F.col(vec_col), F.col("__cvec")
    )
    d2 = F.round(l2, 6)
    return (
        corpus.select(id_col, vec_col)
        .crossJoin(F.broadcast(cent))
        .groupBy(id_col)
        .agg(
            F.min(F.struct(d2.alias("d"), F.col("__cid").alias("cid"))).alias("__best"),
            F.first(vec_col).alias(vec_col),
        )
        .select(id_col, vec_col, F.col("__best.cid").alias("cell"))
    )


def ivf_probe_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    nprobe: int,
    dim: int | None = None,
    centroid_source: DataFrame | None = None,
    collect_centroids: bool | None = None,
    cents: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Per-vector probe set: the ``nprobe`` nearest centroid cells in
    distance order (tie-break lowest cid), one output row per (id,
    probe cell). ``nprobe=1`` reduces to the cell assignment.
    Centroid seeds come from ``centroid_source`` (the CORPUS — pass it
    whenever ``df`` is a query subset that may not span the seed ids).

    Same auto-switch as :func:`ivf_assign`: below
    ``IVF_COLLECT_MAX_CELLS`` the centroids are a collected literal and
    probing is a pure projection + explode (no join, no shuffle);
    above it, ``df`` (the small query panel) joins
    broadcast(centroids) and ranks the ``nprobe`` nearest per vector —
    |df| × n_cells distributed work, O(1) plan size."""
    src = centroid_source if centroid_source is not None else df
    if collect_centroids is None:
        collect_centroids = n_cells <= IVF_COLLECT_MAX_CELLS
    if collect_centroids:
        if cents is None:
            cents = collect_seed_centroids(src, id_col, vec_col, n_cells)
        cent_arr = _lit_centroid_array(cents)
        scored = F.transform(
            cent_arr,
            lambda c: F.struct(
                F.round(squared_l2(F.col(vec_col), c["cvec"]), 6).alias("d"),
                c["cid"].alias("cid"),
            ),
        )
        probes = F.transform(
            F.slice(F.array_sort(scored), 1, nprobe), lambda s: s["cid"]
        )
        return df.select(
            id_col, vec_col, F.explode(probes).alias("cell")
        )
    cent = src.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cvec")
    )
    l2 = squared_l2_static(vec_col, "__cvec", dim) if dim else squared_l2(
        F.col(vec_col), F.col("__cvec")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round(l2, 6).asc(), F.col("__cid").asc()
    )
    return (
        df.select(id_col, vec_col)
        .crossJoin(F.broadcast(cent))
        .withColumn("__prank", F.row_number().over(w))
        .filter(F.col("__prank") <= nprobe)
        .select(id_col, vec_col, F.col("__cid").alias("cell"))
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 8,
    dim: int | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k through the IVF index: candidates are the
    query's ``nprobe`` nearest cells (nprobe=1 → just its own cell;
    more probe cells raise recall at proportional scan cost — the
    standard IVF recall dial), ranked by exact cosine within them.
    Probe cells are disjoint, so the candidate union needs no dedup."""
    cents = (
        collect_seed_centroids(corpus, id_col, vec_col, n_cells)
        if n_cells <= IVF_COLLECT_MAX_CELLS
        else None
    )
    assigned = ivf_assign(
        corpus, id_col, vec_col, n_cells, dim=dim, cents=cents
    )
    # query cells come from the |Q|-row probe projection, never from
    # assigned.join(queries): the join form scores the ENTIRE corpus
    # against the centroids just to fetch the query rows' cells
    # (nprobe=1 probe == assignment: array_sort-first == array_min,
    # same rounded distance, same (d, cid) tie-break)
    qsrc = ivf_probe_cells(
        queries, id_col, vec_col, n_cells, nprobe, dim=dim,
        centroid_source=corpus, cents=cents,
    )
    q = qsrc.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(vec_col if dim else F.col(vec_col), dim).alias("__qn"),
        F.col("cell").alias("__qcell"),
    )
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(vec_col if dim else F.col(vec_col), dim).alias("__cn"),
        F.col("cell").alias("__ccell"),
    )
    sim = F.round(
        cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=dim), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("__qcell") == F.col("__ccell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_ivf_kmeans(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int | None = None,
    dim: int = 64,
    seed: int = 42,
    max_iter: int = 5,
) -> DataFrame:
    """IVF top-k with a TRAINED coarse quantizer: MLlib KMeans fits the
    cell centroids (seeded → deterministic within Spark), the fitted
    model assigns cells as a model transform, and search ranks exact
    cosine within the query's cell — the production form of
    :func:`cosine_topk_ivf`, whose deterministic seed-centroid rule
    exists only to make the index value-verifiable against a SQL
    oracle. Balanced KMeans cells beat seed cells on recall-per-probe
    because cell populations track the data distribution. Rows-only
    in the oracle gate: the trained centroids are MLlib-internal.

    ``n_cells=None`` (default) tracks the corpus like
    :func:`semantic_dedup` does — ``semantic_cells(count)`` keeps the
    average cell near SEMANTIC_CELL_TARGET vectors, so per-probe scan
    cost stays flat as the corpus grows instead of degrading
    quadratically at a fixed cell count."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if n_cells is None:
        n_cells = semantic_cells(corpus.count())
    feat = corpus.select(
        id_col,
        vec_col,
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "__features"
        ),
    )
    km = KMeans(
        k=n_cells,
        seed=seed,
        maxIter=max_iter,
        featuresCol="__features",
        predictionCol="cell",
    )
    model = km.fit(feat)
    assigned = model.transform(feat).select(id_col, vec_col, "cell")
    # per-row model.transform over the |Q|-row query frame — the old
    # assigned.join(queries) re-ran the corpus-wide transform + join
    # just to fetch the query rows' cells
    qfeat = queries.select(
        id_col,
        vec_col,
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "__features"
        ),
    )
    q = model.transform(qfeat).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(vec_col, dim).alias("__qn"),
        F.col("cell").alias("__qcell"),
    )
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(vec_col, dim).alias("__cn"),
        F.col("cell").alias("__ccell"),
    )
    sim = F.round(cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=dim), 4)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(q)
        .join(c, F.col("__qcell") == F.col("__ccell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --- integer-exact deterministic KMeans ------------------------------------
#
# MLlib KMeans is rows-only in the oracle gate (kmeans|| init + float
# accumulation order are engine-internal). This variant makes the WHOLE
# trained index value-verifiable: vectors are quantized to positive
# BIGINT micro-units, init is the deterministic seed set (id < k), each
# Lloyd iteration assigns by exact integer L2 argmin (tie-break lowest
# cid) and updates centroids as exact integer means (sum // count —
# order-independent, so distributed accumulation cannot diverge from a
# sequential SQL engine). A fixed small iteration count unrolls into
# static oracle SQL.

KMEANS_INT_SHIFT = "2.0"  # embeddings live in (-0.6, 0.6); +2 > 0 strictly
KMEANS_INT_SCALE = "1000000.0"  # micro-units


def quantize_micro(vec_col: str) -> Column:
    """array<bigint> of positive micro-units:
    round((CAST(x AS DOUBLE) + 2.0) * 1e6). float→double widening is
    exact and both engines round positive halves away from zero, so
    the quantization is engine-identical."""
    return F.expr(
        f"transform({vec_col}, x -> CAST(round((CAST(x AS DOUBLE)"
        f" + {KMEANS_INT_SHIFT}D) * {KMEANS_INT_SCALE}D) AS BIGINT))"
    )


def _int_l2(qv: Column, cvec: Column) -> Column:
    """Exact integer squared L2 (micro-unit diffs ≤ 4e12/dim, ×64 dims
    ≈ 2.6e14 — far inside BIGINT)."""
    return F.aggregate(
        F.zip_with(qv, cvec, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def kmeans_integer_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
) -> list[tuple[int, list[int]]]:
    """Train the deterministic integer Lloyd's KMeans and return the
    final centroid list (``iters - 1`` update passes — the last
    assignment pass never updates centroids, mirroring the unrolled
    oracle SQL exactly). Split out of :func:`kmeans_integer_assign`
    so one training run can assign MULTIPLE frames (corpus and query
    panel) without re-running the per-iteration corpus aggregates."""
    base = corpus.select(F.col(id_col), quantize_micro(vec_col).alias("__qv"))
    cents = sorted(
        (int(r[0]), [int(x) for x in r[1]])
        for r in base.filter(F.col(id_col) < k).collect()
    )
    for _ in range(iters - 1):
        assigned = kmeans_integer_cells(corpus, id_col, vec_col, cents)
        sums = (
            assigned.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col("__qv")[d]).alias(f"s{d}") for d in range(dim)],
            )
            .collect()
        )
        means = {
            int(r["cell"]): [int(r[f"s{d}"]) // int(r["n"]) for d in range(dim)]
            for r in sums
        }
        cents = [(cid, means.get(cid, prev)) for cid, prev in cents]
    return cents


def kmeans_integer_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: list[tuple[int, list[int]]],
) -> DataFrame:
    """Assign ``df`` rows to trained integer-KMeans cells: pure per-row
    argmin projection over the collected centroid literal (exact
    integer L2, lowest-cid tie-break). Returns (id, __qv, cell)."""
    base = df.select(F.col(id_col), quantize_micro(vec_col).alias("__qv"))
    cent_arr = _lit_centroid_array(cents, value_type="BIGINT")
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            _int_l2(F.col("__qv"), c["cvec"]).alias("d"),
            c["cid"].alias("cid"),
        ),
    )
    return base.withColumn("cell", F.array_min(scored)["cid"])


def kmeans_integer_assign(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Deterministic integer Lloyd's KMeans; returns (id, cell) after
    ``iters`` assignment passes (the last pass does not update
    centroids — mirroring the unrolled oracle SQL exactly).

    Scale notes (100 TB): per iteration, one corpus-wide projection
    (argmin over k collected centroids — the broadcast-the-model
    shape) plus one k×dim-cell aggregate collected to the driver
    (bounded by k·dim, never corpus size). Empty cells keep their
    previous centroid on both engines."""
    if iters < 1:
        raise AssertionError("iters must be >= 1")
    cents = kmeans_integer_train(corpus, id_col, vec_col, k, iters, dim)
    return kmeans_integer_cells(corpus, id_col, vec_col, cents).select(
        id_col, "cell"
    )


def cosine_topk_kmeans_int(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 8,
    iters: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k through the integer-KMeans index: exact cosine
    within the query's trained cell — same search shape as
    :func:`cosine_topk_ivf`, but the quantizer is TRAINED (2 Lloyd
    iterations) and still value-verifiable against static SQL."""
    # train ONCE, assign corpus and query panel separately — the old
    # assigned.join(queries) query side re-ran the corpus-wide argmin
    # projection + join just to fetch the |Q| query cells
    cents = kmeans_integer_train(corpus, id_col, vec_col, n_cells, iters, dim)
    assigned = corpus.join(
        kmeans_integer_cells(corpus, id_col, vec_col, cents).select(
            id_col, "cell"
        ),
        id_col,
    )
    q = queries.join(
        kmeans_integer_cells(queries, id_col, vec_col, cents).select(
            id_col, "cell"
        ),
        id_col,
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(vec_col, dim).alias("__qn"),
        F.col("cell").alias("__qcell"),
    )
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(vec_col, dim).alias("__cn"),
        F.col("cell").alias("__ccell"),
    )
    sim = F.round(cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=dim), 4)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(q)
        .join(c, F.col("__qcell") == F.col("__ccell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def quantize_int8(vec: Column) -> tuple[Column, Column]:
    """Per-vector symmetric int8 scalar quantization: ``scale`` is the
    max |x| (guarded against zero vectors), ``q_i = round(x_i / scale *
    127)`` as BIGINT. Deterministic across engines: both Spark and
    DuckDB round half away from zero, and the int arithmetic that
    follows is exact. At 100 TB this is the column you materialize —
    4× smaller than float32 at rest and integer dot products in the
    scan."""
    absmax = F.aggregate(
        F.transform(vec, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = F.greatest(absmax, F.lit(1e-30))
    q = F.transform(
        vec, lambda x: F.round(x.cast("double") / scale * 127).cast("bigint")
    )
    return scale, q


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product (order-independent, engine-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, z: acc + z,
    )


def int_dot_static(a: str, b: str, dim: int) -> Column:
    """Codegen unroll of :func:`int_dot` for column NAMES (integer
    addition is order-independent, so any order is exact)."""
    terms = " + ".join(
        f"element_at({a}, {i}) * element_at({b}, {i})" for i in range(1, dim + 1)
    )
    return F.expr(f"CAST(0 AS BIGINT) + {terms}")


def cosine_topk_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    shortlist_factor: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Two-tier ANN: int8-quantized integer dot product shortlists
    ``k * shortlist_factor`` candidates per query (the cheap pass that
    at scale runs over the 4×-smaller quantized column), then exact
    float cosine re-ranks the shortlist to the final top-k — the
    standard quantize-then-rerank production shape.

    Ranking keys are exact integers (shortlist) and rounded doubles
    (re-rank), both tie-broken by neighbor id, so the result set is
    deterministic and oracle-verifiable."""
    def prep(df, role):
        scale, q = quantize_int8(F.col(vec_col))
        return df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"__{role}_v"),
            norm(vec_col if dim else F.col(vec_col), dim).alias(f"__{role}_n"),
            q.alias(f"__{role}_q"),
        )

    q = prep(queries, "query")
    c = prep(corpus, "neighbor")
    qsim = (
        int_dot_static("__query_q", "__neighbor_q", dim)
        if dim
        else int_dot(F.col("__query_q"), F.col("__neighbor_q"))
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.desc("qdot"), F.asc("neighbor_id")
    )
    shortlist = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.col("__query_v").alias("__qv"),
            F.col("__neighbor_v").alias("__cv"),
            F.col("__query_n").alias("__qn"),
            F.col("__neighbor_n").alias("__cn"),
            qsim.alias("qdot"),
        )
        .withColumn("__srank", F.row_number().over(w_short))
        .filter(F.col("__srank") <= k * shortlist_factor)
    )
    sim = F.round(
        cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=dim), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        shortlist.select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Arrow-vectorized brute force: queries broadcast to every
    partition, numpy matmul per Arrow batch via mapInPandas. Same
    result set as `cosine_topk` up to float-sum ordering; ~10-100×
    the throughput of the expression path on wide vectors."""
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ q_norm.T  # (batch, nq)
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, len(ids)),
                    "neighbor_id": np.tile(ids, len(q_ids)),
                    "cosine_sim": np.round(sims.T.ravel(), 4),
                }
            )
            yield out[out.query_id != out.neighbor_id]

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cosine_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


#: Cells are sized so the average cell holds ~this many vectors: the
#: within-cell pair stage costs Σ|cell|², so FIXED cell counts degrade
#: quadratically as the corpus grows (measured: 27× runtime at 16× data
#: with 32 fixed cells vs ~3× when cells track the corpus — SURVEY
#: §10.16). 64 is the measured sf0.1 sweet spot (finer cells = more
#: parallelism AND less pair work, until cells get too small to catch
#: near-neighbors split across cells).
SEMANTIC_CELL_TARGET = 64
SEMANTIC_MIN_CELLS = 32


def semantic_cells(n_vectors: int) -> int:
    """Cell count that keeps average cell size ~SEMANTIC_CELL_TARGET
    (integer arithmetic so any SQL engine reproduces it exactly)."""
    return max(SEMANTIC_MIN_CELLS, n_vectors // SEMANTIC_CELL_TARGET)


def semantic_dedup(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int | None = None,
    threshold: float = 0.3,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (cluster-then-prune, per
    Abbas et al. 2023, arXiv:2303.09540): coarse-cluster the corpus
    into IVF cells (:func:`ivf_assign` — deterministic seed centroids
    standing in for KMeans), then inside each cell mark every vector
    whose cosine similarity to a LOWER-id cell-mate reaches
    ``threshold`` as a semantic duplicate of that mate.

    Scale shape: the quadratic step is per-cell (Σ|cell|², never
    |corpus|²) and runs as one equi-join on ``cell``. ``n_cells``
    defaults to :func:`semantic_cells` of the corpus count (one cheap
    count at plan build — parquet row-group metadata, no scan), so the
    cell count TRACKS the corpus and per-cell pair work stays bounded
    as data grows — a fixed count degrades quadratically (SURVEY
    §10.16). Pass an explicit ``n_cells`` only to probe other sizings.
    No window function: the keeper/max-sim rollup is a single hash
    aggregate on the dropped id.

    Returns one row per DROPPED vector:
    (id, cell, keeper = lowest matching cell-mate id, max_sim).
    """
    if n_cells is None:
        n_cells = semantic_cells(corpus.count())
    assigned = ivf_assign(corpus, id_col, vec_col, n_cells, dim=dim)
    a = assigned.select(
        F.col(id_col).alias("__id_a"),
        F.col(vec_col).alias("__va"),
        norm(vec_col if dim else F.col(vec_col), dim).alias("__na"),
        F.col("cell").alias("__cell_a"),
    )
    b = assigned.select(
        F.col(id_col),
        F.col(vec_col).alias("__vb"),
        norm(vec_col if dim else F.col(vec_col), dim).alias("__nb"),
        F.col("cell"),
    )
    sim = F.round(cosine_from_parts("__va", "__vb", "__na", "__nb", dim=dim), 4)
    pairs = (
        a.join(b, F.col("__cell_a") == F.col("cell"))
        .filter(F.col("__id_a") < F.col(id_col))
        .select(id_col, "cell", F.col("__id_a"), sim.alias("__sim"))
        .filter(F.col("__sim") >= threshold)
    )
    return pairs.groupBy(id_col, "cell").agg(
        F.min("__id_a").alias("keeper"), F.max("__sim").alias("max_sim")
    )


#: LSH-bucketed semantic dedup: planes per signature track log2 of the
#: corpus (target ~64 vectors/bucket), clamped to [4, 12]. The 12-plane
#: ceiling exists because the SQL oracle materializes a 12-plane
#: signature and buckets on its prefix — raise both together past
#: ~262k vectors (64 * 2^12).
LSH_SEM_MIN_PLANES, LSH_SEM_MAX_PLANES = 4, 12


def lsh_sem_planes(n_vectors: int, target_bucket: int = 64) -> int:
    """Plane count for ~``target_bucket`` vectors per bucket:
    ceil(log2(n / target)) as exact integer arithmetic
    (``(x-1).bit_length() == ceil(log2(x))`` for x >= 1), so any SQL
    engine's ``ceil(log2(...))`` reproduces it."""
    x = max(n_vectors // target_bucket, 1)
    return max(
        LSH_SEM_MIN_PLANES, min(LSH_SEM_MAX_PLANES, (x - 1).bit_length())
    )


def semantic_dedup_lsh(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    num_planes: int | None = None,
    threshold: float = 0.3,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup semantics over hyperplane-LSH buckets instead of IVF
    cells — the sub-quadratic scale path for semantic dedup.

    :func:`semantic_dedup`'s IVF assignment costs O(n_cells) distance
    evaluations PER ROW; with cells tracking the corpus (the sizing its
    pair stage needs) the assignment stage alone grows ~n²/target.
    Here the cluster id is the sign-random-projection signature — a
    pure per-row expression whose cost is O(num_planes × dim), and
    ``num_planes`` tracks **log2** of the corpus (:func:`lsh_sem_planes`),
    so per-row assignment cost grows logarithmically and bucket sizes
    stay ~constant: total work is O(n log n + n × bucket). At 100 TB
    the corpus is written partitioned by the signature and the pair
    stage is per-partition-local. Trade-off vs IVF cells: near-
    neighbors split across a hyperplane are missed (LSH recall < 1),
    exactly as in :func:`cosine_topk_lsh`; recall is raised by
    Hamming-1 probing or repeated bands.

    Returns one row per DROPPED vector:
    (id, bucket, keeper = lowest matching bucket-mate id, max_sim).
    """
    if num_planes is None:
        num_planes = lsh_sem_planes(corpus.count())
    sigs = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        norm(vec_col if dim else F.col(vec_col), dim).alias("__n"),
        hyperplane_signature(vec_col, num_planes, dim or 64).alias("bucket"),
    )
    a = sigs.select(
        F.col(id_col).alias("__id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"),
        F.col("bucket").alias("__bucket_a"),
    )
    b = sigs.select(
        F.col(id_col),
        F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"),
        F.col("bucket"),
    )
    sim = F.round(cosine_from_parts("__va", "__vb", "__na", "__nb", dim=dim), 4)
    pairs = (
        a.join(b, F.col("__bucket_a") == F.col("bucket"))
        .filter(F.col("__id_a") < F.col(id_col))
        .select(id_col, "bucket", F.col("__id_a"), sim.alias("__sim"))
        .filter(F.col("__sim") >= threshold)
    )
    return pairs.groupBy(id_col, "bucket").agg(
        F.min("__id_a").alias("keeper"), F.max("__sim").alias("max_sim")
    )


def _pq_seed_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_cent: int
) -> list[tuple[int, list[float]]]:
    """Deterministic PQ codebook seeds: the vectors with id < n_cent,
    collected once at plan build (bounded — the broadcast-the-model
    shape, same convention as :func:`ivf_assign`). In production the
    codebooks come from per-subspace KMeans; the seed rule keeps the
    index value-verifiable against a SQL oracle."""
    rows = (
        corpus.filter(F.col(id_col) < n_cent).select(id_col, vec_col).collect()
    )
    return sorted((r[0], [float(x) for x in r[1]]) for r in rows)


def _sub_l2_micro(sub_vec: Column, cent_sub: Column) -> Column:
    """Exact-integer subspace distance: floor(1e6 * squared-L2) as
    BIGINT. The double arithmetic folds left in dimension order (the
    same sequence the SQL oracle's unrolled sum computes) and the floor
    of the identical IEEE double is engine-exact — integer lookup-table
    entries can then be SUMMED in any order without float divergence."""
    d2 = F.aggregate(
        F.zip_with(
            sub_vec,
            cent_sub,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return F.floor(d2 * F.lit(1000000.0))


def _pq_parts(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cent: int,
    n_sub: int,
    dim: int,
):
    """Shared PQ machinery for :func:`cosine_topk_pq` and
    :func:`cosine_topk_ivfpq`: returns ``(encode, luts)`` column-list
    builders.

    - ``encode()`` → per-subspace code columns ``__code{m}`` (argmin
      subspace distance over the codebook, lowest-centroid tie-break);
    - ``luts()`` → per-subspace MAP columns ``__lut{m}`` keyed by
      centroid id (``map_from_entries``, NOT positional ``element_at``
      on an array — positional lookup silently mis-indexes if centroid
      ids ever start above 0 or have gaps; a key-addressed map is
      correct for any id set, matching the oracle's ``code = cid``
      join).
    """
    cents = _pq_seed_centroids(corpus, id_col, vec_col, n_cent)
    return _pq_parts_from_cents(cents, vec_col, n_sub, dim)


def _pq_parts_from_cents(
    cents: list[tuple[int, list[float]]],
    vec_col: str,
    n_sub: int,
    dim: int,
):
    """:func:`_pq_parts` with an explicit codebook — the seam the
    residual-PQ variant uses (its codebook lives in residual space, so
    the seed rule cannot run on the raw corpus column)."""
    sub_dim = dim // n_sub

    def cent_arr(m: int) -> Column:
        return _lit_centroid_array(
            cents, m * sub_dim, (m + 1) * sub_dim, cid_type="int"
        )

    def sub(col: Column, m: int) -> Column:
        return F.slice(col, m * sub_dim + 1, sub_dim)

    vec = F.col(vec_col)

    # NB: the closures MUST be single-argument lambdas — a second
    # parameter (even a defaulted `m=m`) makes pyspark pass the array
    # INDEX as that argument, silently shadowing the subspace id.
    def scorer(m: int):
        return lambda ce: F.struct(
            _sub_l2_micro(sub(vec, m), ce["cvec"]).alias("d"),
            ce["cid"].alias("cid"),
        )

    def lut_entry(m: int):
        return lambda ce: F.struct(
            ce["cid"].alias("key"),
            _sub_l2_micro(sub(vec, m), ce["cvec"]).alias("value"),
        )

    def encode() -> list[Column]:
        return [
            F.array_min(F.transform(cent_arr(m), scorer(m)))["cid"].alias(
                f"__code{m}"
            )
            for m in range(n_sub)
        ]

    def luts() -> list[Column]:
        return [
            F.map_from_entries(F.transform(cent_arr(m), lut_entry(m))).alias(
                f"__lut{m}"
            )
            for m in range(n_sub)
        ]

    return encode, luts


def _pq_adc(n_sub: int) -> Column:
    """ADC distance: n_sub map lookups + an exact-integer sum."""
    adc = None
    for m in range(n_sub):
        term = F.element_at(F.col(f"__lut{m}"), F.col(f"__code{m}"))
        adc = term if adc is None else adc + term
    return adc.cast("bigint")


def _rerank_by_id(
    shortlist: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    dim: int,
    carry: tuple[str, ...] = ("adc_micro",),
) -> DataFrame:
    """Exact-cosine re-rank of an id-only shortlist: join the (small,
    broadcast) shortlist back to the raw vectors BY ID — the approximate
    scan itself never carries the raw vector columns, which is the whole
    point of a compressed index (at rest only the code column is read;
    the re-rank reads the raw vectors for shortlisted ids only)."""
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(vec_col, dim).alias("__qn"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(vec_col, dim).alias("__cn"),
    )
    sim = F.round(cosine_from_parts("__qv", "__cv", "__qn", "__cn", dim=dim), 4)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        cv.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", *carry, sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    shortlist_factor: int = 4,
    n_cent: int = 16,
    n_sub: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al., TPAMI 2011) with exact
    re-rank — the memory-bound billion-scale shape (IVFPQ's PQ half):

    - **Codebooks**: the vector space is split into ``n_sub`` subspaces
      of ``dim/n_sub`` dims; each subspace gets ``n_cent`` centroids
      (deterministic seed rule, see :func:`_pq_seed_centroids`).
    - **Encode**: every corpus vector becomes ``n_sub`` small codes
      (argmin subspace distance, lowest-centroid tie-break) — at 100 TB
      this 8-byte code column is what you materialize at rest: 32×
      smaller than float32, and the ADC scan projects ONLY (id, codes)
      — the raw vector column never enters the scan.
    - **ADC scan**: each query precomputes a lookup table of exact-
      integer subspace distances to every centroid (n_sub × n_cent
      BIGINTs as a cid-keyed map, staged in the broadcast query
      projection); a candidate's approximate distance is n_sub map
      lookups + an integer sum — no float math per pair at all.
    - **Re-rank**: the ``k * shortlist_factor`` best ADC candidates are
      joined BACK to the raw vectors by id (:func:`_rerank_by_id`) and
      re-scored with exact float cosine (rounded, id tie-break).

    All ranking keys are exact integers or rounded doubles, so the
    result set is deterministic and oracle-verifiable."""
    encode, luts = _pq_parts(corpus, id_col, vec_col, n_cent, n_sub, dim)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), *encode())
    q = queries.select(F.col(id_col).alias("query_id"), *luts())
    w_short = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    shortlist = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _pq_adc(n_sub).alias("adc_micro"))
        .withColumn("__srank", F.row_number().over(w_short))
        .filter(F.col("__srank") <= k * shortlist_factor)
        .drop("__srank")
    )
    return _rerank_by_id(
        shortlist, corpus, queries, id_col, vec_col, k, dim
    )


def cosine_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    shortlist_factor: int = 4,
    n_cells: int = 8,
    n_cent: int = 16,
    n_sub: int = 8,
    dim: int = 64,
    nprobe: int = 1,
) -> DataFrame:
    """IVF×PQ composition — the canonical billion-scale ANN index
    (Jégou et al.'s IVFADC): the coarse IVF quantizer prunes the scan
    to the query's probe cell(s), and PQ codes make the surviving
    candidates cheap to score.

    Plan shape: corpus rows carry (id, cell, codes) — at 100 TB that IS
    the index at rest, written partitioned BY cell, so a query's ADC
    scan reads only its probe cells' files (partition pruning) and
    touches ~|corpus|/n_cells code rows instead of the whole corpus —
    the per-query ADC work is bounded by the probed cells, not the
    corpus. Raw vectors appear only in the final re-rank, joined back
    by shortlisted id. ``nprobe`` unions the query's nearest cells in
    centroid-distance order — the FAISS recall dial; probe cells are
    disjoint, so the ADC candidate union needs no dedup."""
    encode, luts = _pq_parts(corpus, id_col, vec_col, n_cent, n_sub, dim)
    cents = (
        collect_seed_centroids(corpus, id_col, vec_col, n_cells)
        if n_cells <= IVF_COLLECT_MAX_CELLS
        else None
    )
    assigned = ivf_assign(
        corpus, id_col, vec_col, n_cells, dim=dim, cents=cents
    )
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("cell").alias("__ccell"),
        *encode(),
    )
    # |Q|-row probe projection instead of assigned.join(queries) — the
    # join form scored the ENTIRE corpus to fetch the query cells
    # (nprobe=1 probe == assignment, same distance + tie-break)
    qsrc = ivf_probe_cells(
        queries, id_col, vec_col, n_cells, nprobe, dim=dim,
        centroid_source=corpus, cents=cents,
    )
    q = qsrc.select(
        F.col(id_col).alias("query_id"),
        F.col("cell").alias("__qcell"),
        *luts(),
    )
    w_short = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    shortlist = (
        F.broadcast(q)
        .join(c, F.col("__qcell") == F.col("__ccell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _pq_adc(n_sub).alias("adc_micro"))
        .withColumn("__srank", F.row_number().over(w_short))
        .filter(F.col("__srank") <= k * shortlist_factor)
        .drop("__srank")
    )
    return _rerank_by_id(
        shortlist, corpus, queries, id_col, vec_col, k, dim
    )


def cosine_topk_ivfpq_residual(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    shortlist_factor: int = 4,
    n_cells: int = 8,
    n_cent: int = 16,
    n_sub: int = 8,
    dim: int = 64,
) -> DataFrame:
    """TRUE IVFADC (Jégou et al. 2011 §IV): PQ encodes the RESIDUAL
    ``v - centroid(cell(v))`` rather than the raw vector. Residuals
    concentrate near zero, so a fixed codebook quantizes them with far
    less error than the raw space — the reason FAISS's IVF-PQ defaults
    to residual encoding. Each query builds its lookup table from its
    OWN residual in its probe cell, so ADC compares residual-to-
    residual within the cell.

    Exactness: residuals are per-element IEEE double subtractions
    (identical in any engine), subspace distances are
    floor(1e6 * L2²) BIGINTs, and the codebook is the residuals of the
    seed vectors (id < n_cent) — collected AFTER assignment so both
    engines derive the same codebook. Plan shape is identical to
    :func:`cosine_topk_ivfpq`: the scan carries (id, cell, codes);
    raw vectors only re-enter at the by-id re-rank."""
    # ONE seed collect feeds the assignment, the residual centroid map
    # AND the query probe below (was three identical collect jobs +
    # three compiled n_cells×dim literals per plan — the round-13
    # driver regression)
    icents = collect_seed_centroids(corpus, id_col, vec_col, n_cells)
    assigned = ivf_assign(
        corpus, id_col, vec_col, n_cells, dim=dim, cents=icents
    )
    cmap = F.map_from_entries(_lit_centroid_array(icents))
    resid = assigned.withColumn(
        "__rv",
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.element_at(cmap, F.col("cell").cast("bigint")),
            lambda a, b: a - b,
        ),
    )
    seeds = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in resid.filter(F.col(id_col) < n_cent)
        .select(id_col, "__rv")
        .collect()
    )
    encode, luts = _pq_parts_from_cents(seeds, "__rv", n_sub, dim)
    c = resid.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("cell").alias("__ccell"),
        *encode(),
    )
    # |Q|-row query side: probe cell (nprobe=1 probe == assignment) +
    # the SAME residual expression over the query rows only, instead
    # of resid.join(queries) which re-ran the corpus-wide assignment
    # and residual projection just to fetch the query rows
    qres = ivf_probe_cells(
        queries, id_col, vec_col, n_cells, 1, dim=dim,
        centroid_source=corpus, cents=icents,
    ).withColumn(
        "__rv",
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.element_at(cmap, F.col("cell").cast("bigint")),
            lambda a, b: a - b,
        ),
    )
    q = qres.select(
        F.col(id_col).alias("query_id"),
        F.col("cell").alias("__qcell"),
        *luts(),
    )
    w_short = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    shortlist = (
        F.broadcast(q)
        .join(c, F.col("__qcell") == F.col("__ccell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _pq_adc(n_sub).alias("adc_micro"))
        .withColumn("__srank", F.row_number().over(w_short))
        .filter(F.col("__srank") <= k * shortlist_factor)
        .drop("__srank")
    )
    return _rerank_by_id(
        shortlist, corpus, queries, id_col, vec_col, k, dim
    )


def cosine_topk_matryoshka(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    prefix_dim: int = 16,
    shortlist: int = 50,
    dim: int = 64,
) -> DataFrame:
    """Matryoshka (MRL) two-tier ANN: rank with a PREFIX of the
    embedding dimensions, re-rank the shortlist with the full vector.

    Matryoshka-trained embeddings pack most of the signal into the
    leading dimensions, so the cheap pass reads a ``prefix_dim/dim``
    slice of every vector (4x less memory bandwidth at 16/64 — at rest
    the prefix is the column you materialize hot) and the exact pass
    touches only ``shortlist`` rows per query, joined back BY ID so the
    scan never carries full vectors.

    Both passes rank on ROUNDED cosine with id tie-break, so the result
    set is deterministic and oracle-verifiable."""

    def pref(df: DataFrame, out: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out),
            F.slice(F.col(vec_col), 1, prefix_dim).alias(f"__{out}_p"),
        ).select(
            out,
            f"__{out}_p",
            norm(f"__{out}_p", prefix_dim).alias(f"__{out}_n"),
        )

    q = pref(queries, "query_id")
    c = pref(corpus, "neighbor_id")
    psim = F.round(
        cosine_from_parts(
            "__query_id_p", "__neighbor_id_p", "__query_id_n", "__neighbor_id_n",
            dim=prefix_dim,
        ),
        4,
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.desc("__psim"), F.asc("neighbor_id")
    )
    ids = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", psim.alias("__psim"))
        .withColumn("__srank", F.row_number().over(w_short))
        .filter(F.col("__srank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _rerank_by_id(ids, corpus, queries, id_col, vec_col, k, dim, carry=())
