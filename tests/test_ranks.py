"""global_row_number must equal the single-partition global window for
any integer distribution — including skew, negatives, and ties broken
by the unique key — while never planning a partitionless window over
the data itself (only over the tiny bucket-offset table)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from the_movies_db_spark.operators.ranks import global_cumsum, global_row_number


def _check(spark, values):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id bigint, v bigint"
    )
    got = global_row_number(df, "v", ["id"], out="rank", buckets=8)
    expect = df.withColumn(
        "rank", F.row_number().over(Window.orderBy("v", "id")).cast("bigint")
    )
    lhs = {(r.id, r.rank) for r in got.collect()}
    rhs = {(r.id, r.rank) for r in expect.collect()}
    assert lhs == rhs


def test_uniform(spark):
    _check(spark, [((i * 2654435761) % 1000) - 500 for i in range(300)])


def test_skewed_with_ties(spark):
    # 90% of rows share one hot value; ties resolved by id
    _check(spark, [7 if i % 10 else i * 1000 for i in range(200)])


def test_constant_column(spark):
    _check(spark, [42] * 50)


def test_rank_window_is_bucket_partitioned(spark):
    df = spark.createDataFrame(
        [(i, i * 37 % 1009) for i in range(500)], "id bigint, v bigint"
    )
    plan = (
        global_row_number(df, "v", ["id"], buckets=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the data-side row_number must be partitioned by the bucket column
    assert "windowspecdefinition(__rb" in plan


# -- property tests -------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    values=st.lists(st.integers(-(10**12), 10**12), min_size=1, max_size=60),
    buckets=st.sampled_from([1, 2, 7, 64]),
)
@_SET
def test_matches_global_window_property(spark, values, buckets):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id bigint, v bigint"
    )
    got = {
        (r.id, r.rank)
        for r in global_row_number(df, "v", ["id"], buckets=buckets).collect()
    }
    want = {
        (r.id, r.rank)
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("v", "id")).cast("bigint")
        ).collect()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(-(10**9), 10**9),   # order key (dup-able)
            st.integers(-(10**6), 10**6),   # value to accumulate
        ),
        min_size=1,
        max_size=60,
    ),
    buckets=st.sampled_from([1, 2, 7, 64]),
    out_of_range_bounds=st.booleans(),
)
@_SET
def test_cumsum_matches_global_window_property(spark, rows, buckets, out_of_range_bounds):
    """global_cumsum == the single-partition running sum for any integer
    distribution (ties by id, negatives, skew) — including when the
    supplied bounds don't cover the data (bounds only tune widths)."""
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "id bigint, k bigint, v bigint",
    )
    bounds = (0, 10) if out_of_range_bounds else None
    got = {
        (r.id, r.cum, r.tot)
        for r in global_cumsum(
            df, "k", ["id"], "v", buckets=buckets, bounds=bounds,
            total_out="tot",
        ).collect()
    }
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.id, r.cum, r.tot)
        for r in df.withColumn("cum", F.sum("v").over(w).cast("bigint"))
        .withColumn(
            "tot", F.sum("v").over(Window.partitionBy()).cast("bigint")
        )
        .collect()
    }
    assert got == want


@given(
    n=st.integers(1, 200),
    k=st.sampled_from([2, 3, 4, 7, 10]),
)
@_SET
def test_ntile_expr_matches_ntile(spark, n, k):
    """ntile_expr reproduces SQL ntile(k) for EVERY n and k — the
    closed form ccnet/quality-calibration use on top of the two-level
    rank. (The naive (rank-1)*k div n + 1 identity distributes
    oversized buckets Bresenham-style and diverges from ntile's
    front-loading whenever n % k is outside {0, 1, k-1} — hypothesis
    falsified it at n=10, k=4: 3,2,3,2 vs 3,3,2,2.)"""
    from the_movies_db_spark.operators.ranks import ntile_expr

    df = spark.range(1, n + 1).select(F.col("id").alias("r"))
    got = df.select(
        "r", F.expr(ntile_expr("r", str(n), k)).cast("bigint").alias("t")
    )
    want = df.select(
        "r",
        F.ntile(k).over(Window.orderBy("r")).cast("bigint").alias("t"),
    )
    assert {(x.r, x.t) for x in got.collect()} == {
        (x.r, x.t) for x in want.collect()
    }


def test_row_number_total_out(spark):
    df = spark.createDataFrame(
        [(i, i * 37 % 1009) for i in range(500)], "id bigint, v bigint"
    )
    got = global_row_number(df, "v", ["id"], buckets=8, total_out="n")
    assert {r.n for r in got.collect()} == {500}
