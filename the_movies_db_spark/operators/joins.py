"""Join strategy utilities for the 100 TB path (SURVEY §2.4).

Catalyst already picks broadcast vs shuffled-hash vs sort-merge and
AQE splits skewed partitions at runtime; these helpers cover the two
levers that must be *designed in*, not picked at runtime:

- **Bucketed co-located joins** (`bucketed_write` + plain ``join``):
  both fact tables pre-bucketed on the join key → the sort-merge join
  reads bucket i against bucket i with NO Exchange on either side.
  That is the difference between re-shuffling 100 TB per query and
  shuffling once at write time. Verified by ``tests/test_joins.py``
  asserting the physical plan contains no shuffle.
- **Salted joins** (`salted_join`): when one side's key distribution
  has heavy hitters beyond what AQE's skew splitting handles (e.g. a
  single key holding >1 executor's memory), the small side is
  replicated ``salt``× and the big side's rows are deterministically
  sprayed across the replicas — the classic salting rewrite, exposed
  as one call. Salt derives from ``xxhash64`` of caller-named columns,
  never ``rand()``, so task retries are idempotent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SALT_COL = "__salt"


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_cols: str | Sequence[str],
    num_buckets: int = 32,
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key.

    Downstream equi-joins and aggregations on ``bucket_cols`` between
    tables bucketed with the SAME bucket count read co-located buckets
    and skip the Exchange entirely (and the Sort, if ``sort_cols``
    matches). Bucketing metadata lives in the session catalog
    (``saveAsTable`` — path-based ``parquet(path)`` writes cannot carry
    it)."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols is not None:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    shuffle-free by construction (assert via ``has_shuffle``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (broadcast
    exchanges don't count — they move dims, not facts)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        line.lstrip("+-: *(0123456789) ").startswith("Exchange")
        for line in plan.splitlines()
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    salt: int = 8,
    spray_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate ``small`` ``salt``× and
    spray ``big``'s rows across the replicas.

    ``spray_cols`` are the columns hashed to pick a replica (default:
    all of ``big``'s non-key columns) — deterministic per row, so a
    retried task sprays identically. Result is exactly
    ``big.join(small, on, how)`` for inner/left joins; the only change
    is that one hot key's rows now land in ``salt`` partitions instead
    of one."""
    keys = [on] if isinstance(on, str) else list(on)
    spray = list(spray_cols) if spray_cols else [c for c in big.columns if c not in keys]
    big_s = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in spray]), F.lit(salt))
    )
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    return big_s.join(small_s, [*keys, SALT_COL], how).drop(SALT_COL)


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_width: int,
) -> DataFrame:
    """Interval-overlap join as a binned EQUI-join (closed intervals:
    ``a_start <= b_end AND b_start <= a_end``).

    A naive overlap join has no equi-key, so Spark plans it as a
    BroadcastNestedLoopJoin — a cross product that is quadratic in the
    fact size. The standard scale rewrite (DuckDB's IEJoin papers, the
    GenomicsDB/AsterixDB interval-join literature) turns it into an
    equi-join: explode each interval onto the fixed-width time buckets
    it covers, join on bucket equality plus the exact overlap
    predicate, and attribute each matched pair to EXACTLY ONE bucket —
    the bucket containing ``greatest(a_start, b_start)`` (which lies
    inside both intervals whenever they overlap) — so no dedup pass is
    needed afterwards.

    Scale notes (100 TB): work per row is O(len/bucket_width + 1)
    replicas; the join shuffles on ``__bucket``, so co-temporal rows
    co-locate and the per-task candidate set is bounded by bucket
    population, not corpus size. Pick ``bucket_width`` near the median
    interval length: too small multiplies replicas, too large degrades
    toward per-bucket cross products. Column names must be disjoint
    between ``a`` and ``b`` (pre-alias them).

    Exactness: bucket ids are integer floor-division of the start/end
    coordinates; the attribution equality uses the same integers, so
    every overlapping pair appears exactly once and no pair is lost.
    """
    a_b = a.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{a_start} div {bucket_width}"),
                F.expr(f"{a_end} div {bucket_width}"),
            )
        ),
    )
    b_b = b.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{b_start} div {bucket_width}"),
                F.expr(f"{b_end} div {bucket_width}"),
            )
        ),
    )
    cond = (
        (a_b["__bucket"] == b_b["__bucket"])
        & (F.col(a_start) <= F.col(b_end))
        & (F.col(b_start) <= F.col(a_end))
        & (
            F.expr(f"greatest({a_start}, {b_start}) div {bucket_width}")
            == a_b["__bucket"]
        )
    )
    return a_b.join(b_b, cond, "inner").drop("__bucket")


def grid_radius_join(
    a: DataFrame,
    b: DataFrame,
    a_x: str,
    a_y: str,
    b_x: str,
    b_y: str,
    radius: int,
) -> DataFrame:
    """Radius join on integer planar coordinates as a grid-binned
    EQUI-join: pairs with ``(ax-bx)^2 + (ay-by)^2 <= radius^2``.

    The 2D sibling of :func:`interval_overlap_join` (same family as
    H3/S2 geo joins and the cell lists of molecular dynamics): with a
    cell width equal to ``radius``, every qualifying pair lies in the
    same or an adjacent cell, so side ``a`` probes its 3x3 cell
    neighborhood while side ``b`` keeps its single home cell — each
    pair meets on exactly one (b-home) cell, so the rewrite is
    duplicate-free with no dedup pass. The exact integer distance
    predicate then removes the corner candidates.

    Scale notes (100 TB): the shuffle key is the cell id; per-task
    work is bounded by 9x the densest cell's population, not the
    corpus — for heavily skewed point sets shrink the cell width
    below ``radius`` and widen the probe window accordingly (denser
    binning trades probe fan-out for smaller cells). Column names
    must be disjoint between ``a`` and ``b``."""
    w = radius
    a_probe = a.withColumn(
        "__cell",
        F.explode(
            F.flatten(
                F.expr(
                    f"transform(sequence(-1, 1), dx -> transform(sequence(-1, 1),"
                    f" dy -> struct(({a_x} div {w}) + dx AS cx,"
                    f" ({a_y} div {w}) + dy AS cy)))"
                )
            )
        ),
    )
    b_home = b.withColumn(
        "__cell",
        F.struct(
            F.expr(f"{b_x} div {w}").alias("cx"), F.expr(f"{b_y} div {w}").alias("cy")
        ),
    )
    dist2 = f"({a_x} - {b_x}) * ({a_x} - {b_x}) + ({a_y} - {b_y}) * ({a_y} - {b_y})"
    return (
        a_probe.join(
            b_home,
            (a_probe["__cell"] == b_home["__cell"])
            & (F.expr(dist2) <= F.lit(radius * radius)),
            "inner",
        )
        .drop("__cell")
    )


def _bloom_pos_sql(key: str, i: int, bits: int) -> str:
    """SQL for the i-th Bloom position of ``key`` — the SAME text is
    used on the build side and the probe side, so the two can never
    disagree (a build/probe hash mismatch would create false
    negatives, i.e. silently dropped rows)."""
    return f"pmod(xxhash64({key}, {i}), {bits})"


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    bits: int = 8192,
    num_hashes: int = 2,
) -> DataFrame:
    """Runtime-filter (semi-join-reduction) inner join: build a Bloom
    filter over ``small``'s join keys, prefilter ``big`` with it BEFORE
    the shuffle, then run the exact join.

    The filter is a 64-bit-word bitmask inlined as ONE parsed literal
    array (bits/64 BIGINTs — never per-element ``F.lit``), so the
    probe is two O(1) bit tests per row inside whole-stage codegen.
    False positives are removed by the exact join that follows; false
    negatives are impossible because both sides evaluate the identical
    position expressions. Inner joins only — a prefilter would change
    outer-join semantics.

    Scale notes (100 TB): this is what Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter`` injects adaptively;
    the explicit form works when the build side is the OUTPUT of an
    earlier stage the optimizer can't see through (a filtered dim, a
    dedup survivor set). Shuffling only pre-filtered fact rows is the
    win: at 1% dim selectivity the exchange moves ~1% of the fact.
    The build-side collect is one distinct over at most ``bits``
    positions — bounded by the mask size, not the dim cardinality."""
    positions = [F.expr(_bloom_pos_sql(on, i, bits)) for i in range(num_hashes)]
    rows = (
        small.select(F.explode(F.array(*positions)).alias("p"))
        .distinct()
        .collect()
    )
    mask = [0] * ((bits + 63) // 64)
    for r in rows:
        p = int(r["p"])
        mask[p // 64] |= 1 << (p % 64)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in mask]
    mask_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"
    terms = []
    for i in range(num_hashes):
        p = _bloom_pos_sql(on, i, bits)
        terms.append(
            f"(element_at({mask_sql}, CAST(({p}) DIV 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(({p}) % 64 AS INT))) != 0"
        )
    return big.filter(F.expr(" AND ".join(terms))).join(small, on, "inner")


def knn_join_1d(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_key: str,
    right_id: str,
    right_key: str,
    k: int,
    width: int,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact k-nearest-neighbor join on a 1-D integer key (the k > 1
    generalization of the as-of/nearest join) as a binned EQUI-join
    with a guaranteed-exact fallback.

    A naive k-NN join has no equi-key (Spark plans the theta form as a
    BroadcastNestedLoopJoin). Rewrite: bucket the right side on
    ``key div width``; each probe joins its home bucket +-1 — that
    candidate set provably contains EVERY row within distance
    ``width`` (a row two buckets away is strictly farther than
    ``width``). If a probe has >= k candidates within ``width``, its
    top-k by (distance, id) over the candidates IS the exact top-k.
    The (rare) starved probes — sparse-region probes with < k
    neighbors inside ``width`` — are re-run via a broadcast
    brute-force pass, so the result is exact for every probe while
    the quadratic path only ever sees the starved minority.

    Scale notes (100 TB): the candidate join shuffles on the bucket id
    (bounded per-task candidates = bucket population); the rank window
    is partitioned per probe; the brute pass broadcasts ONLY starved
    probes (monitor their count — a high starved share means ``width``
    is too small for the key density). Returns (probe_id, neighbor_id,
    rank, dist).
    """
    # NULL-key probes are DROPPED, not emitted: a NULL key generates no
    # binned candidates (sequence over NULL) and would otherwise fall
    # through to the brute pass where abs(NULL - rk) yields k rows of
    # NULL dist in arbitrary neighbor order. NULL right keys likewise
    # can never be anyone's nearest neighbor, so both sides filter.
    l = left.filter(F.col(left_key).isNotNull()).select(  # noqa: E741
        F.col(left_id).alias("__lid"),
        F.col(left_key).cast("bigint").alias("__lk"),
    )
    right = right.filter(F.col(right_key).isNotNull())
    r = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_key).cast("bigint").alias("__rk"),
        F.expr(f"CAST(({right_key}) div {width} AS BIGINT)").alias("__bin"),
    )
    probes = l.select(
        "__lid",
        "__lk",
        F.explode(
            F.expr(f"sequence(__lk div {width} - 1, __lk div {width} + 1)")
        ).alias("__bin"),
    )
    cand = probes.join(r, "__bin")
    if exclude_self:
        cand = cand.filter(F.col("__lid") != F.col("__rid"))
    cand = cand.select(
        "__lid", "__rid", F.expr("abs(__lk - __rk)").alias("__dist")
    )
    w = Window.partitionBy("__lid").orderBy(F.asc("__dist"), F.asc("__rid"))
    cw = Window.partitionBy("__lid")
    ranked = (
        cand.withColumn("__rank", F.row_number().over(w))
        .withColumn(
            "__n_close",
            F.sum(
                F.expr(f"CASE WHEN __dist <= {width} THEN 1 ELSE 0 END")
            ).over(cw),
        )
        .localCheckpoint(eager=False)  # consumed by ok + starved branches
    )
    ok = ranked.filter(
        (F.col("__n_close") >= k) & (F.col("__rank") <= k)
    ).select("__lid", "__rid", "__dist", "__rank")
    sat = ranked.filter(F.col("__n_close") >= k).select("__lid").distinct()
    starved = l.join(sat, "__lid", "left_anti")
    brute = F.broadcast(starved).crossJoin(
        r.select("__rid", "__rk")
    )
    if exclude_self:
        brute = brute.filter(F.col("__lid") != F.col("__rid"))
    brute = (
        brute.select(
            "__lid", "__rid", F.expr("abs(__lk - __rk)").alias("__dist")
        )
        .withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
    )
    return ok.unionByName(brute).select(
        F.col("__lid").alias("probe_id"),
        F.col("__rid").alias("neighbor_id"),
        F.col("__rank").cast("bigint").alias("rank"),
        F.col("__dist").alias("dist"),
    )
