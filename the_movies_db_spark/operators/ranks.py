"""Distributed global ranking (the anti-single-partition-sort operator).

``row_number() OVER (ORDER BY v)`` with no PARTITION BY collapses to
ONE partition — a non-starter on a 1000-executor cluster. The standard
rewrite is two-level: bucket rows by a MONOTONE function of the order
key, rank within each bucket (a distributed window), and add each
bucket's global starting offset (a tiny cumulative aggregate joined
back by broadcast). The values are identical to the single-partition
form because bucket order refines value order.

`pipeline_curriculum_order` hand-rolls this for its 5 quality buckets;
``global_row_number`` generalizes it to arbitrary integer order keys by
deriving equal-width buckets from a one-row (min, max) aggregate
collected at plan-build time (the broadcast-the-model shape used by
dedup_semantic's cell sizing — a metadata-scale action, not a data
collect).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_col: str,
    tiebreak: Sequence[str],
    out: str = "rank",
    buckets: int = 64,
    bounds: tuple[int, int] | None = None,
    total_out: str | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Append a gap-free 1-based global row number (``row_number``
    semantics — NOT ``dense_rank`` tie behavior) ordered by
    ``(order_col, *tiebreak)`` without a single-partition sort.

    ``order_col`` must be integer-typed (BIGINT-safe arithmetic); ties
    beyond ``tiebreak`` must not exist (use a unique key as the last
    tiebreak) or ranks would be nondeterministic.

    Scale notes (100 TB): the (min, max) agg is one metadata-cheap
    scan reduced to a single row; bucket sizes/offsets are ``buckets``
    rows broadcast back; the only full-data shuffle is the per-bucket
    window. Equal-width bucketing keeps the rewrite exact for ANY
    distribution (monotone map); for heavily skewed keys raise
    ``buckets`` so the largest bucket still fits an executor — the
    offsets stay tiny either way.

    Pass ``bounds=(min, max)`` when the caller already knows them (or
    batches several metrics' bounds into one collect — rfm does 3 ranks
    off a single agg job): it skips this function's own (min, max) job,
    which would otherwise recompute ``df``'s whole lineage per call.
    Bounds only TUNE bucket widths — values outside them still bucket
    correctly (the bucket map stays monotone for any input), so static
    domain-knowledge bounds are always safe and avoid the extra job
    entirely (text_ccnet_buckets does this for its score domain).

    ``total_out`` additionally appends the TOTAL row count of ``df`` as
    a BIGINT column of that name — it falls out of the already-computed
    per-bucket sizes for free (a ``buckets``-row window), sparing
    callers that need n (ntile-style formulas) a separate global agg
    that would re-execute the lineage.

    ``materialize=True`` localCheckpoints the bucketed input so the
    offsets aggregate and the per-bucket window share ONE execution of
    ``df``'s lineage. ReuseExchange does not fire across the two
    branches (CLAUDE.md round-4 lesson), so without it the lineage
    runs twice — and if ``df`` itself fans out over several scans
    (text_ccnet_buckets' term join: 3 corpus scans per evaluation),
    the blowup multiplies. Turn it on whenever the input lineage
    includes a fact scan; leave it off for already-tiny inputs where
    a re-scan is cheaper than a materialization.
    """
    if bounds is None:
        row = df.agg(
            F.min(order_col).alias("mn"), F.max(order_col).alias("mx")
        ).first()
        bounds = (int(row["mn"]), int(row["mx"]))
    mn, mx = bounds
    width = (mx - mn) // buckets + 1
    bucket: Column = F.expr(f"({order_col} - {mn}L) div {width}L").cast("bigint")
    bucketed = df.withColumn("__rb", bucket)
    if materialize:
        # lazy: the offsets-broadcast job computes (and checkpoints)
        # the RDD first, the window stage then reuses it — one lineage
        # execution with no extra scheduling job (eager=True cost ~1 s
        # of pure job overhead at sf0.1 on the 3-rank rfm chain)
        bucketed = bucketed.localCheckpoint(eager=False)
    sizes = bucketed.groupBy("__rb").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__rb").rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        F.col("__rb"),
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).cast("bigint").alias("__off"),
    ]
    if total_out is not None:
        w_all = Window.orderBy("__rb").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("__n").over(w_all).cast("bigint").alias(total_out))
    offsets = sizes.select(*off_cols)
    w_rank = Window.partitionBy("__rb").orderBy(order_col, *tiebreak)
    return (
        bucketed.withColumn("__r", F.row_number().over(w_rank).cast("bigint"))
        .join(F.broadcast(offsets), "__rb")
        .withColumn(out, (F.col("__off") + F.col("__r")).cast("bigint"))
        .drop("__rb", "__r", "__off")
    )


def global_cumsum(
    df: DataFrame,
    order_col: str,
    tiebreak: Sequence[str],
    val_col: str | Sequence[str],
    out: str | Sequence[str] = "cum",
    buckets: int = 64,
    bounds: tuple[int, int] | None = None,
    total_out: str | Sequence[str] | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Append the running ``sum(val_col) OVER (ORDER BY order_col,
    *tiebreak ROWS UNBOUNDED PRECEDING)`` — inclusive of the current
    row — without a single-partition sort, via the same two-level
    bucket rewrite as :func:`global_row_number`: per-bucket running
    sums (a distributed window partitioned by bucket) plus each
    bucket's broadcast prior-bucket total.

    ``order_col`` must be integer-typed; ``(order_col, *tiebreak)``
    must be unique. ``val_col`` must be integer-typed (BIGINT sums —
    exact, no float accumulation-order divergence across the rewrite).
    Pass SEQUENCES for ``val_col``/``out`` (same length) to accumulate
    several measures in ONE bucket pass — the window functions share a
    single WindowSpec, so N measures cost one sort, not N (the KS
    statistic runs both samples' CDFs this way). ``total_out`` appends
    the grand total(s) as column(s) for free (the Pareto/ABC share
    test needs it); with multiple measures it must be a sequence
    aligned with ``val_col``. ``materialize`` as in
    :func:`global_row_number` — one lineage execution instead of two.

    Scale notes (100 TB): identical profile to global_row_number — one
    (min, max) job (skippable via ``bounds``), one ``buckets``-row
    aggregate broadcast back, one per-bucket window over the data.
    """
    vals = [val_col] if isinstance(val_col, str) else list(val_col)
    outs = [out] if isinstance(out, str) else list(out)
    if total_out is None:
        tots: list[str | None] = [None] * len(vals)
    elif isinstance(total_out, str):
        tots = [total_out]
    else:
        tots = list(total_out)
    if not (len(vals) == len(outs) == len(tots)):
        raise ValueError("val_col, out, total_out lengths must match")
    if bounds is None:
        row = df.agg(
            F.min(order_col).alias("mn"), F.max(order_col).alias("mx")
        ).first()
        bounds = (int(row["mn"]), int(row["mx"]))
    mn, mx = bounds
    width = (mx - mn) // buckets + 1
    bucket: Column = F.expr(f"({order_col} - {mn}L) div {width}L").cast("bigint")
    bucketed = df.withColumn("__rb", bucket)
    if materialize:
        bucketed = bucketed.localCheckpoint(eager=False)  # see above
    sums = bucketed.groupBy("__rb").agg(
        *[F.sum(v).cast("bigint").alias(f"__s{i}") for i, v in enumerate(vals)]
    )
    w_off = Window.orderBy("__rb").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("__rb").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [F.col("__rb")]
    for i, tot in enumerate(tots):
        off_cols.append(
            F.coalesce(F.sum(f"__s{i}").over(w_off), F.lit(0))
            .cast("bigint")
            .alias(f"__off{i}")
        )
        if tot is not None:
            off_cols.append(
                F.sum(f"__s{i}").over(w_all).cast("bigint").alias(tot)
            )
    offsets = sums.select(*off_cols)
    w_cum = Window.partitionBy("__rb").orderBy(order_col, *tiebreak).rowsBetween(
        Window.unboundedPreceding, 0
    )
    res = bucketed
    for i, v in enumerate(vals):
        res = res.withColumn(f"__c{i}", F.sum(v).over(w_cum).cast("bigint"))
    res = res.join(F.broadcast(offsets), "__rb")
    for i, o in enumerate(outs):
        res = res.withColumn(
            o, (F.col(f"__off{i}") + F.col(f"__c{i}")).cast("bigint")
        )
    return res.drop(
        "__rb", *[f"__c{i}" for i in range(len(vals))],
        *[f"__off{i}" for i in range(len(vals))],
    )


def ntile_expr(rank_col: str, n_col: str, k: int) -> str:
    """SQL expression computing EXACT ``ntile(k)`` from a 1-based
    gap-free global rank and the total row count — for use on top of
    :func:`global_row_number` so quantile bucketing never needs a
    single-partition ntile window.

    The naive identity ``(rank-1)*k div n + 1`` distributes the
    oversized buckets evenly across the range (Bresenham), while SQL
    ntile front-loads them: the two agree only when ``n % k`` is in
    {0, 1, k-1} (always true for k=3 — hypothesis found the k=4
    divergence at n=10: formula 3,2,3,2 vs ntile 3,3,2,2). This
    closed form reproduces ntile for EVERY n, k: with q = n div k and
    s = n % k, the first s buckets hold q+1 rows, so
    rank <= (q+1)*s  ->  bucket = ceil(rank / (q+1)),
    otherwise           bucket = s + ceil((rank - (q+1)*s) / q).
    The else branch only evaluates when n >= k (q >= 1) — for n < k
    every rank satisfies the first branch since (q+1)*s = n.
    """
    q = f"({n_col} div {k})"
    s = f"({n_col} % {k})"
    big = f"(({q} + 1) * {s})"
    return (
        f"CASE WHEN {rank_col} <= {big}"
        f" THEN ({rank_col} + {q}) div ({q} + 1)"
        f" ELSE {s} + ({rank_col} - {big} + {q} - 1) div {q} END"
    )
